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

from ..functions.text import TOKS_SQL as TOKS
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


@register(
    "sorted_neighborhood_pairs",
    sql="""
    WITH ranked AS (
        SELECT left(p_name, 1) AS blk, p_name, p_partkey,
               lead(p_name, 1) OVER w AS next1,
               lead(p_name, 2) OVER w AS next2
        FROM part
        WINDOW w AS (PARTITION BY left(p_name, 1)
                     ORDER BY p_name, p_partkey)),
    cand AS (
        SELECT blk, p_name, next1 AS neighbor FROM ranked
        WHERE next1 IS NOT NULL
        UNION ALL
        SELECT blk, p_name, next2 FROM ranked WHERE next2 IS NOT NULL)
    SELECT blk,
           CAST(count(*) AS BIGINT) AS n_candidates,
           CAST(sum(CASE WHEN levenshtein(p_name, neighbor) <= 10
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_matches,
           round(avg(levenshtein(p_name, neighbor)), 4) AS avg_lev
    FROM cand GROUP BY blk ORDER BY blk
    """,
    doc="sorted-neighborhood entity-resolution blocking (Hernandez & "
    "Stolfo 1995): records sorted by the blocking key compare only "
    "against their w-1 successors (w=3 here via lead(1)/lead(2)) — "
    "candidate pairs are O(w n) instead of O(n^2).  Windows are keyed "
    "by the first letter so no single-task global sort exists; the "
    "letter-boundary pairs this misses are what the method's "
    "multi-pass variant (re-run with a rotated key) recovers.  "
    "Complements fuzzy_match_part_names (vocabulary-blocked ER) with "
    "order-based blocking.",
)
def sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy(F.substring("p_name", 1, 1)).orderBy(
        "p_name", "p_partkey"
    )
    ranked = p.select(
        F.substring("p_name", 1, 1).alias("blk"),
        "p_name",
        F.lead("p_name", 1).over(w).alias("next1"),
        F.lead("p_name", 2).over(w).alias("next2"),
    )
    cand = ranked.filter(F.col("next1").isNotNull()).select(
        "blk", "p_name", F.col("next1").alias("neighbor")
    ).unionAll(
        ranked.filter(F.col("next2").isNotNull()).select(
            "blk", "p_name", F.col("next2").alias("neighbor")
        )
    )
    lev = F.levenshtein("p_name", "neighbor")
    return (
        cand.groupBy("blk")
        .agg(
            F.count("*").alias("n_candidates"),
            F.sum((lev <= 10).cast("int")).cast("long").alias("n_matches"),
            F.round(F.avg(lev), 4).alias("avg_lev"),
        )
        .orderBy("blk")
    )


@register(
    "weighted_sample_topk",
    sql="""
    WITH keyed AS (
        SELECT doc_id, source, n_chars,
               ln(((doc_id * 2654435761) % 4294967296 + 1)
                  / 4294967297.0) / n_chars AS r
        FROM documents WHERE n_chars > 0)
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
           round(r, 9) AS priority
    FROM keyed
    ORDER BY round(r, 9) DESC, doc_id
    LIMIT 20
    """,
    doc="weighted sampling without replacement (Efraimidis-Spirakis "
    "2006): each item gets priority u^(1/w) — ranked here via the "
    "monotone-equivalent ln(u)/w — and the top-k by priority IS a "
    "w-weighted sample.  u comes from a Knuth multiplicative hash of "
    "the key (pure integer arithmetic, identical across engines), not "
    "rand(), so the sample is reproducible under any partitioning and "
    "a DuckDB oracle can re-derive it.  One map pass + TakeOrdered: "
    "the 100 TB shape for 'give me 10k docs sampled by token count'.",
)
def weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = ((F.col("doc_id") * 2654435761) % 4294967296 + 1) / 4294967297.0
    r = F.round(F.log(u) / F.col("n_chars"), 9)
    return (
        docs.select(
            "doc_id",
            "source",
            F.col("n_chars").cast("long").alias("n_chars"),
            r.alias("priority"),
        )
        .orderBy(F.desc("priority"), F.asc("doc_id"))
        .limit(20)
    )


@register(
    "target_encode_loo",
    sql="""
    WITH enc AS (
        SELECT o_orderpriority AS priority, o_totalprice AS y,
               (sum(o_totalprice) OVER (PARTITION BY o_orderpriority)
                - o_totalprice)
               / (count(*) OVER (PARTITION BY o_orderpriority) - 1)
                   AS enc
        FROM orders)
    SELECT priority,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(enc), 2) AS avg_enc,
           round(covar_pop(enc, y), 2) AS enc_y_cov
    FROM enc GROUP BY priority ORDER BY priority
    """,
    doc="leave-one-out target encoding (the leakage-safe categorical "
    "encoder): each row's category becomes the mean target of the "
    "OTHER rows in its group, (group_sum - y)/(group_n - 1) — two "
    "marginals from one keyed window, no self-join.  Output pins the "
    "per-group encoding mean (= group mean, an identity LOO must "
    "satisfy) and the enc-target covariance, which is NEGATIVE under "
    "LOO (each row's own y is excluded, anti-correlating the "
    "encoding) — the tell that distinguishes a leaky implementation "
    "from a correct one.",
)
def target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    wp = Window.partitionBy("o_orderpriority")
    enc = o.select(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").alias("y"),
        (
            (F.sum("o_totalprice").over(wp) - F.col("o_totalprice"))
            / (F.count("*").over(wp) - 1)
        ).alias("enc"),
    )
    return (
        enc.groupBy("priority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("enc"), 2).alias("avg_enc"),
            F.round(F.covar_pop("enc", "y"), 2).alias("enc_y_cov"),
        )
        .orderBy("priority")
    )


_CMS_BUCKET = (
    "CAST('0x' || substr(md5('cms{i}|' || token), 1, 15) AS BIGINT) % 64"
)


def _cms_cells(src: str) -> str:
    return "\n        UNION ALL\n".join(
        f"        SELECT {i} AS row, {_CMS_BUCKET.format(i=i)} AS bucket,"
        f" token FROM {src}"
        for i in range(4)
    )


@register(
    "cms_token_accuracy",
    sql=f"""
    WITH toks AS (
        SELECT unnest({TOKS}) AS token FROM documents),
    entries AS (
{_cms_cells("toks")}),
    sketch AS (
        SELECT row, bucket, CAST(count(*) AS BIGINT) AS n
        FROM entries GROUP BY row, bucket),
    exact AS (
        SELECT token, CAST(count(*) AS BIGINT) AS exact_n
        FROM toks GROUP BY token
        ORDER BY exact_n DESC, token LIMIT 20),
    probe_cells AS (
{_cms_cells("exact")}),
    est AS (
        SELECT p.token, min(s.n) AS cms_est
        FROM (SELECT row, bucket, token FROM probe_cells) p
        JOIN sketch s ON s.row = p.row AND s.bucket = p.bucket
        GROUP BY p.token)
    SELECT e.token, x.exact_n, e.cms_est,
           CAST(e.cms_est - x.exact_n AS BIGINT) AS overestimate
    FROM est e JOIN exact x ON x.token = e.token
    ORDER BY x.exact_n DESC, e.token
    """,
    doc="Count-Min sketch accuracy, itself oracle-checked: a 4x64 "
    "portable-hash CMS built over the token stream, probed at the "
    "exact top-20 tokens; overestimate = est - exact is >= 0 by the "
    "CMS one-sided guarantee.  Both engines rebuild the identical "
    "sketch (md5-derived bucket hashes), so the ESTIMATES are "
    "differential-tested, not just the exact side — the same "
    "treatment minhash_estimate_accuracy gives MinHash.  Build is "
    "one explode + a 256-cell groupBy; the probe join broadcasts the "
    "sketch.",
)
def cms_token_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import text as TX
    from ..operators.sketches import cms_build, cms_estimate

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(TX.tokens("text")).alias("token"))
    sketch = cms_build(toks, "token")
    exact = (
        toks.groupBy("token")
        .agg(F.count("*").alias("exact_n"))
        .orderBy(F.desc("exact_n"), F.asc("token"))
        .limit(20)
    )
    est = cms_estimate(exact.select("token"), sketch, "token")
    return (
        est.join(exact, "token")
        .select(
            "token",
            "exact_n",
            "cms_est",
            (F.col("cms_est") - F.col("exact_n")).cast("long").alias(
                "overestimate"
            ),
        )
        .orderBy(F.desc("exact_n"), F.asc("token"))
    )


@register(
    "exact_median_refinement",
    sql="""
    WITH v AS (SELECT l_extendedprice AS x FROM lineitem
               WHERE l_extendedprice IS NOT NULL),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
    med AS (
        SELECT x AS median FROM v ORDER BY x
        LIMIT 1 OFFSET (SELECT (n + 1) // 2 - 1 FROM n)),
    p90 AS (
        SELECT x AS p90 FROM v ORDER BY x
        LIMIT 1 OFFSET (SELECT CAST(ceil(n * 0.9) AS BIGINT) - 1 FROM n))
    SELECT n.n, round(med.median, 2) AS median, round(p90.p90, 2) AS p90
    FROM n, med, p90
    """,
    doc="EXACT median + p90 of lineitem price via iterative histogram "
    "refinement (operators/order_stats, Munro-Paterson-style "
    "selection): each round is one scan producing a 256-row histogram, "
    "the candidate range shrinks 256x, and only the final tie-group "
    "is ever sorted — 3-4 scans for an exact order statistic at any "
    "scale, vs percentile_approx's error or a single-partition sort's "
    "OOM.  The oracle computes the same k-th smallest "
    "(lower-median k = (n+1)/2, p90 k = ceil(0.9 n)) by brute sort.",
)
def exact_median_refinement(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from ..operators.order_stats import exact_kth_smallest

    li = load_table(spark, sf_dir, "lineitem")
    vals = li.filter(F.col("l_extendedprice").isNotNull())
    n = vals.count()
    med = exact_kth_smallest(vals, "l_extendedprice", (n + 1) // 2)
    p90 = exact_kth_smallest(vals, "l_extendedprice", math.ceil(n * 0.9))
    return spark.createDataFrame(
        [(n, round(med, 2), round(p90, 2))], "n bigint, median double, p90 double"
    )


_PCTL_BLOCKS = """    k05 AS (SELECT CAST(ceil(n * 0.5) AS BIGINT) AS k FROM st),
    pick05 AS (SELECT bkt, cnt, cum_prev FROM cum, k05
                WHERE cum >= k ORDER BY bkt LIMIT 1),
    ex05 AS (SELECT x AS exact FROM v ORDER BY x
              LIMIT 1 OFFSET (SELECT k - 1 FROM k05)),
    a05 AS (SELECT mn + w * (bkt + (k - cum_prev) / cnt) AS approx
             FROM pick05, st, k05),
    r05 AS (SELECT CAST(count(*) AS BIGINT) AS rk FROM v, a05
             WHERE x <= approx),
    row05 AS (SELECT 0.5 AS p, CAST(n AS DOUBLE) AS n,
                      round(approx, 2) AS approx, round(exact, 2) AS exact,
                      round(abs(approx - exact), 2) AS value_err,
                      CAST(abs(rk - k) AS BIGINT) AS rank_err
               FROM st, k05, a05, ex05, r05),
    k90 AS (SELECT CAST(ceil(n * 0.9) AS BIGINT) AS k FROM st),
    pick90 AS (SELECT bkt, cnt, cum_prev FROM cum, k90
                WHERE cum >= k ORDER BY bkt LIMIT 1),
    ex90 AS (SELECT x AS exact FROM v ORDER BY x
              LIMIT 1 OFFSET (SELECT k - 1 FROM k90)),
    a90 AS (SELECT mn + w * (bkt + (k - cum_prev) / cnt) AS approx
             FROM pick90, st, k90),
    r90 AS (SELECT CAST(count(*) AS BIGINT) AS rk FROM v, a90
             WHERE x <= approx),
    row90 AS (SELECT 0.9 AS p, CAST(n AS DOUBLE) AS n,
                      round(approx, 2) AS approx, round(exact, 2) AS exact,
                      round(abs(approx - exact), 2) AS value_err,
                      CAST(abs(rk - k) AS BIGINT) AS rank_err
               FROM st, k90, a90, ex90, r90)"""


@register(
    "percentile_approx_error_report",
    sql=f"""
    WITH v AS (SELECT l_extendedprice AS x FROM lineitem
               WHERE l_extendedprice IS NOT NULL),
    st AS (SELECT min(x) AS mn, max(x) AS mx,
                  CAST(count(*) AS BIGINT) AS n,
                  (max(x) - min(x)) / 256.0 AS w FROM v),
    hist AS (SELECT least(CAST(floor((x - mn) / w) AS BIGINT), 255) AS bkt,
                    CAST(count(*) AS BIGINT) AS cnt
             FROM v, st GROUP BY bkt),
    cum AS (SELECT bkt, cnt,
                   sum(cnt) OVER (ORDER BY bkt) AS cum,
                   coalesce(sum(cnt) OVER (ORDER BY bkt
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS cum_prev
            FROM hist),
{_PCTL_BLOCKS}
    SELECT * FROM row05 UNION ALL SELECT * FROM row90 ORDER BY p
    """,
    doc="quantile-sketch accuracy audit, now with the APPROXIMATION "
    "itself oracle-checked (r7): a portable 256-bin equi-width "
    "histogram quantile (min/max + one bucket groupBy + linear "
    "interpolation inside the hit bucket — the classic scalable "
    "approximate quantile; constant 256-row state, mergeable, one "
    "scan) vs the EXACT order statistics from operators/order_stats "
    "(histogram-refinement selection), with observed value and rank "
    "error.  Every arithmetic step (bucket floor, cumulative pick, "
    "interpolation) is the same IEEE double expression in both "
    "engines, so approx, value_err and rank_err all hash-match.  "
    "Spark's native percentile_approx (engine-internal GK sketch) "
    "keeps its rank-error-bound audit in the unit tests.  This is "
    "the audit you run before trusting approx quantiles for SLA "
    "cutoffs at 100 TB.",
)
def percentile_approx_error_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from ..operators.order_stats import exact_kth_smallest

    li = load_table(spark, sf_dir, "lineitem")
    # ~a dozen driver-synchronous jobs (count, min/max, 256-bin
    # histogram, 2 refinement loops, 2 rank probes) over ONE projected
    # column — persist it once so each job reads the cached column
    # instead of rescanning the parquet.  Released before returning.
    vals = (
        li.select("l_extendedprice")
        .filter(F.col("l_extendedprice").isNotNull())
        .persist()
    )
    try:
        n = vals.count()
        st = vals.agg(
            F.min("l_extendedprice").alias("mn"),
            F.max("l_extendedprice").alias("mx"),
        ).first()
        mn, mx = st["mn"], st["mx"]
        w = (mx - mn) / 256.0
        # 256-row histogram, cumulated driver-side (bounded by
        # construction — the bin count, not the data, sizes this)
        hist = (
            vals.select(
                F.least(
                    F.floor((F.col("l_extendedprice") - F.lit(mn)) / F.lit(w)),
                    F.lit(255),
                ).alias("bkt")
            )
            .groupBy("bkt")
            .agg(F.count("*").alias("cnt"))
            .orderBy("bkt")
            .collect()
        )
        rows = []
        for p in (0.5, 0.9):
            k = math.ceil(n * p)  # >= 1 since n >= 1
            cum_prev = 0
            for r in hist:
                if cum_prev + r["cnt"] >= k:
                    # same expression, same order as the SQL twin
                    approx = mn + w * (r["bkt"] + (k - cum_prev) / r["cnt"])
                    break
                cum_prev += r["cnt"]
            exact = exact_kth_smallest(vals, "l_extendedprice", k)
            # observed rank of the approx answer (how many rows <= it)
            rank_of_approx = vals.filter(
                F.col("l_extendedprice") <= F.lit(approx)
            ).count()
            rows.append((p, float(n), approx, exact, abs(rank_of_approx - k)))
    finally:
        vals.unpersist()
    # round in Spark SQL (HALF_UP, matching DuckDB's half-away-from-zero
    # on positives) — Python's round() is banker's and could diverge
    return (
        spark.createDataFrame(
            rows, "p double, n double, approx_raw double, exact_raw double, rank_err long"
        )
        .select(
            "p",
            "n",
            F.round("approx_raw", 2).alias("approx"),
            F.round("exact_raw", 2).alias("exact"),
            F.round(F.abs(F.col("approx_raw") - F.col("exact_raw")), 2).alias(
                "value_err"
            ),
            F.col("rank_err").cast("bigint").alias("rank_err"),
        )
        .select("p", "n", "approx", "exact", "value_err", "rank_err")
        .orderBy("p")
    )


@register(
    "negative_sampling_pairs",
    sql="""
    WITH ranked AS (
        SELECT doc_id, source,
               row_number() OVER (
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS r,
               count(*) OVER () AS n
        FROM documents),
    paired AS (
        SELECT a.doc_id AS anchor_id, a.source AS anchor_source,
               b.doc_id AS negative_id, b.source AS negative_source
        FROM ranked a
        JOIN ranked b ON b.r = (a.r % a.n) + 1)
    SELECT anchor_source, negative_source,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN anchor_id = negative_id
                         THEN 1 ELSE 0 END) AS BIGINT) AS self_pairs
    FROM paired
    GROUP BY anchor_source, negative_source
    ORDER BY anchor_source, negative_source
    """,
    doc="deterministic negative sampling for contrastive training: "
    "docs ranked by md5(doc_id) (a reproducible shuffle), each anchor "
    "paired with the NEXT doc in shuffled order (rank rotation r -> "
    "r%n+1 — a derangement for n>1, so self_pairs pins 0).  The md5 "
    "shuffle decorrelates neighbors from any natural ordering; output "
    "folds every pair into source-by-source counts so the oracle "
    "checks the entire assignment.  Spark side uses "
    "operators/ranking.global_rank (data-derived buckets) instead of "
    "the oracle's single-task window — same rank values, scalable "
    "plan; the rotation join is a self equi-join on rank.",
)
def negative_sampling_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranking import global_rank

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    # numeric primary for the bucketed rank: first 15 hex chars of the
    # md5 shuffle key (order-preserving prefix of the hex string ONLY
    # works because md5 hex is fixed-width lowercase — document trick)
    keyed = d.withColumn(
        "hnum", F.conv(F.substring("h", 1, 15), 16, 10).cast("double")
    )
    ranked = global_rank(
        keyed, "hnum", [F.asc("h"), F.asc("doc_id")], rank_col="r"
    )
    # total count as a 1-row broadcast — NOT a partition-less window,
    # which would single-task the whole ranked relation
    total = ranked.agg(F.count("*").alias("n"))
    ranked = ranked.crossJoin(F.broadcast(total))
    a = ranked.select(
        F.col("doc_id").alias("anchor_id"),
        F.col("source").alias("anchor_source"),
        ((F.col("r") % F.col("n")) + 1).alias("want"),
    )
    b = ranked.select(
        F.col("doc_id").alias("negative_id"),
        F.col("source").alias("negative_source"),
        F.col("r").alias("want"),
    )
    paired = a.join(b, "want")
    return (
        paired.groupBy("anchor_source", "negative_source")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(
                (F.col("anchor_id") == F.col("negative_id")).cast("int")
            ).cast("long").alias("self_pairs"),
        )
        .orderBy("anchor_source", "negative_source")
    )


@register(
    "lang_source_independence",
    sql="""
    WITH cells AS (
        SELECT lang AS l, source AS s, CAST(count(*) AS DOUBLE) AS o
        FROM documents GROUP BY l, s),
    tot AS (
        SELECT l, s, o,
               sum(o) OVER (PARTITION BY l) AS row_tot,
               sum(o) OVER (PARTITION BY s) AS col_tot,
               sum(o) OVER () AS n
        FROM cells),
    dims AS (
        SELECT count(DISTINCT l) AS r, count(DISTINCT s) AS c FROM cells)
    SELECT CAST(max(n) AS BIGINT) AS n_docs,
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
    doc="is the language mix independent of the crawl source?  The "
    "corpus-composition counterpart of chi_square_priority_status "
    "(same contingency/marginal-window shape over the documents "
    "table): a large Cramér's V means per-source language skew — the "
    "thing a naive uniform source mix silently bakes into training "
    "data.",
)
def lang_source_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    cells = d.groupBy(
        F.col("lang").alias("l"), F.col("source").alias("s")
    ).agg(F.count("*").cast("double").alias("o"))
    tot = (
        cells.withColumn("row_tot", F.sum("o").over(Window.partitionBy("l")))
        .withColumn("col_tot", F.sum("o").over(Window.partitionBy("s")))
        .withColumn("n", F.sum("o").over(Window.partitionBy()))
    )
    dims = cells.agg(
        F.countDistinct("l").alias("r"), F.countDistinct("s").alias("c")
    )
    e = F.col("row_tot") * F.col("col_tot") / F.col("n")
    chi2 = F.sum((F.col("o") - e) * (F.col("o") - e) / e)
    return (
        tot.crossJoin(F.broadcast(dims))
        .agg(
            F.max("n").cast("long").alias("n_docs"),
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
    "activity_heatmap",
    sql="""
    WITH base AS (
        SELECT dayofweek(CAST(ts AS DATE)) AS dow,
               CAST(hour(ts) AS INT) AS hod,
               count(*) AS n
        FROM events GROUP BY dow, hod),
    tot AS (SELECT sum(n) AS total FROM base)
    SELECT CAST(dow AS INT) AS dow, hod,
           CAST(n AS BIGINT) AS n_events,
           round(CAST(n AS DOUBLE) / (SELECT total FROM tot), 6) AS share
    FROM base ORDER BY dow, hod
    """,
    doc="day-of-week x hour-of-day activity heatmap with corpus "
    "shares — the load-profile/staleness-window primer read before "
    "scheduling compactions or batch windows.  Cell grain is 7x24; "
    "NOTE the cross-engine dow alignment: Spark dayofweek() is "
    "1=Sunday..7, DuckDB dayofweek() is 0=Sunday..6 — output is "
    "normalized to DuckDB's 0-based convention (Spark side emits "
    "dayofweek - 1).",
)
def activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    base = e.groupBy(
        (F.dayofweek(F.col("ts").cast("date")) - 1).alias("dow"),
        F.hour("ts").alias("hod"),
    ).agg(F.count("*").alias("n"))
    tot = base.agg(F.sum("n").alias("total"))
    return (
        base.crossJoin(F.broadcast(tot))
        .select(
            F.col("dow").cast("int").alias("dow"),
            F.col("hod").cast("int").alias("hod"),
            F.col("n").alias("n_events"),
            F.round(F.col("n").cast("double") / F.col("total"), 6).alias(
                "share"
            ),
        )
        .orderBy("dow", "hod")
    )
