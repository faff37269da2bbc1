"""Statistical hypothesis-test batch: rank-based two-sample comparison
(Mann-Whitney U), categorical independence (chi-square + Cramér's V),
and deterministic per-group sampling.

Scale notes (the 100 TB story per query):
- ``mann_whitney_value_shift``: the raw log collapses to the DISTINCT
  VALUE relation first (``GROUP BY value`` with per-side counts) — the
  rank walk (cumulative counts -> average ranks) runs over that
  value-sized relation, never row grain, and tie correction falls out
  of the same per-value counts.  For genuinely continuous measures
  bucket/round the value first; the U statistic then needs one
  value-ordered prefix sum, exactly like an equi-depth histogram.
- ``chi_square_priority_status``: the contingency table is
  |priorities| x |statuses| cells — everything after the first linear
  aggregation is arithmetic over a broadcast-sized relation.
- ``group_sample_deterministic``: md5 of the key is the sampling
  coordinate — reproducible across engines, partitionings and reruns
  (no rand()); the per-group top-k is one keyed window at group grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .catalog import register


@register(
    "mann_whitney_value_shift",
    sql="""
    WITH vals AS (
        SELECT value,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a
        FROM events WHERE event_type IN ('purchase', 'click')),
    by_value AS (
        SELECT value,
               CAST(sum(a) AS DOUBLE) AS ca,
               CAST(count(*) - sum(a) AS DOUBLE) AS cb,
               CAST(count(*) AS DOUBLE) AS c
        FROM vals GROUP BY value),
    walked AS (
        SELECT ca, cb, c,
               sum(c) OVER (ORDER BY value
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum
        FROM by_value),
    stats AS (
        SELECT sum(ca) AS na, sum(cb) AS nb,
               sum(ca * (cum - c + (c + 1) / 2)) AS ra,
               sum(c * c * c - c) AS tie3
        FROM walked)
    SELECT CAST(na AS BIGINT) AS n_purchase,
           CAST(nb AS BIGINT) AS n_click,
           round(ra - na * (na + 1) / 2, 2) AS u_stat,
           round((ra - na * (na + 1) / 2 - na * nb / 2)
                 / sqrt(na * nb / 12
                        * ((na + nb + 1)
                           - tie3 / ((na + nb) * (na + nb - 1)))),
                 4) AS z_score
    FROM stats
    """,
    doc="Mann-Whitney U rank-sum test: do purchase event values "
    "stochastically dominate click values?  Average ranks come from "
    "cumulative counts over the DISTINCT-value relation (rank of a "
    "tie group = cum - cnt + (cnt+1)/2), so no row-grain global "
    "window exists; the normal approximation applies the standard "
    "tie correction sum(t^3-t).  One linear agg + one value-sized "
    "prefix-sum window + a 1-row reduce.",
)
def mann_whitney_value_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    vals = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("a"),
    )
    by_value = vals.groupBy("value").agg(
        F.sum("a").cast("double").alias("ca"),
        (F.count("*") - F.sum("a")).cast("double").alias("cb"),
        F.count("*").cast("double").alias("c"),
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    walked = by_value.withColumn("cum", F.sum("c").over(w))
    stats = walked.agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.sum(
            F.col("ca") * (F.col("cum") - F.col("c") + (F.col("c") + 1) / 2)
        ).alias("ra"),
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c")).alias("tie3"),
    )
    na, nb, ra, tie3 = F.col("na"), F.col("nb"), F.col("ra"), F.col("tie3")
    u = ra - na * (na + 1) / 2
    mu = na * nb / 2
    sigma = F.sqrt(
        na * nb / 12 * ((na + nb + 1) - tie3 / ((na + nb) * (na + nb - 1)))
    )
    return stats.select(
        na.cast("long").alias("n_purchase"),
        nb.cast("long").alias("n_click"),
        F.round(u, 2).alias("u_stat"),
        F.round((u - mu) / sigma, 4).alias("z_score"),
    )


@register(
    "chi_square_priority_status",
    sql="""
    WITH cells AS (
        SELECT o_orderpriority AS p, o_orderstatus AS s,
               CAST(count(*) AS DOUBLE) AS o
        FROM orders GROUP BY p, s),
    tot AS (
        SELECT p, s, o,
               sum(o) OVER (PARTITION BY p) AS row_tot,
               sum(o) OVER (PARTITION BY s) AS col_tot,
               sum(o) OVER () AS n
        FROM cells),
    dims AS (
        SELECT count(DISTINCT p) AS r, count(DISTINCT s) AS c FROM cells)
    SELECT CAST(max(n) AS BIGINT) AS n_orders,
           round(sum((o - row_tot * col_tot / n)
                     * (o - row_tot * col_tot / n)
                     / (row_tot * col_tot / n)), 4) AS chi2,
           CAST((max(d.r) - 1) * (max(d.c) - 1) AS BIGINT) AS dof,
           round(sqrt(sum((o - row_tot * col_tot / n)
                          * (o - row_tot * col_tot / n)
                          / (row_tot * col_tot / n))
                      / (max(n) * least(max(d.r) - 1, max(d.c) - 1))),
                 6) AS cramers_v
    FROM tot CROSS JOIN dims d
    """,
    doc="chi-square test of independence between order priority and "
    "order status, plus Cramér's V effect size.  The contingency "
    "table is priorities x statuses cells (tiny); expected counts "
    "come from marginal-sum windows over the cell relation, so after "
    "the single linear groupBy everything is broadcast-scale "
    "arithmetic.",
)
def chi_square_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cells = o.groupBy(
        F.col("o_orderpriority").alias("p"), F.col("o_orderstatus").alias("s")
    ).agg(F.count("*").cast("double").alias("o"))
    tot = (
        cells.withColumn("row_tot", F.sum("o").over(Window.partitionBy("p")))
        .withColumn("col_tot", F.sum("o").over(Window.partitionBy("s")))
        .withColumn("n", F.sum("o").over(Window.partitionBy()))
    )
    dims = cells.agg(
        F.countDistinct("p").alias("r"), F.countDistinct("s").alias("c")
    )
    e = F.col("row_tot") * F.col("col_tot") / F.col("n")
    chi2 = F.sum((F.col("o") - e) * (F.col("o") - e) / e)
    return (
        tot.crossJoin(F.broadcast(dims))
        .agg(
            F.max("n").cast("long").alias("n_orders"),
            F.round(chi2, 4).alias("chi2"),
            ((F.max("r") - 1) * (F.max("c") - 1)).cast("long").alias("dof"),
            F.round(
                F.sqrt(
                    chi2
                    / (F.max("n") * F.least(F.max("r") - 1, F.max("c") - 1))
                ),
                6,
            ).alias("cramers_v"),
        )
    )


@register(
    "group_sample_deterministic",
    sql="""
    WITH hashed AS (
        SELECT source, doc_id,
               md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents),
    ranked AS (
        SELECT source, doc_id, h,
               row_number() OVER (PARTITION BY source
                                  ORDER BY h, doc_id) AS pick
        FROM hashed)
    SELECT source, doc_id, CAST(pick AS INT) AS pick
    FROM ranked WHERE pick <= 5
    ORDER BY source, pick
    """,
    doc="deterministic per-group sampling: 5 documents per source "
    "chosen by md5(doc_id) order — a portable sampling coordinate "
    "that is identical across engines, partition layouts and reruns "
    "(rand()/TABLESAMPLE are neither).  One keyed window at group "
    "grain; at 100 TB this is how you carve reproducible eval slices "
    "out of a corpus.",
)
def group_sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    hashed = docs.select(
        "source", "doc_id", F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    return (
        hashed.withColumn("pick", F.row_number().over(w))
        .filter(F.col("pick") <= 5)
        .select("source", "doc_id", F.col("pick").cast("int").alias("pick"))
        .orderBy("source", "pick")
    )
