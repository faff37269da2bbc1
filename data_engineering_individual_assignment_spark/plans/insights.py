"""Warehouse-insights batch: market-basket affinity, RFM segmentation,
CUSUM change-point scan, lag-1 autocorrelation, duplicate-multiplicity
accounting, and the vocabulary coverage curve.

Scale notes (the 100 TB story per query):
- ``market_basket_lift``: the pair space is TYPE-pair sized (vocabulary
  x vocabulary), never row-sized — the per-order self-join fans out by
  (distinct types per order)^2, bounded by basket width, and all
  support totals are tiny broadcasts.
- ``rfm_segments``: one linear agg to customer grain, then three
  ntile windows over the (already customer-sized) relation; ties
  broken on the key so the quartile edges are deterministic.
- ``cusum_changepoint`` / ``autocorr_daily``: events collapse to
  (type, day) grain first — windows and correlations run over the
  day-sized relation, never the raw log.
- ``dup_multiplicity_histogram``: two cascaded count aggregations over
  16-byte digests; output is histogram-sized.
- ``vocab_coverage_curve``: one token agg (vocabulary-sized), one
  global-order window over the vocabulary relation — acceptable
  because vocabularies are millions, not corpus-scale; the output is
  three rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..sources.readers import load_table
from .catalog import register

from ..functions.text import TOKS_SQL as _TOKS  # noqa: E402


@register(
    "market_basket_lift",
    sql="""
    WITH basket AS (
        SELECT DISTINCT l.l_orderkey AS okey, p.p_type AS t
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
    n_orders AS (
        SELECT CAST(count(DISTINCT okey) AS BIGINT) AS n FROM basket),
    singles AS (
        SELECT t, CAST(count(*) AS BIGINT) AS c FROM basket GROUP BY t),
    pairs AS (
        SELECT a.t AS type_a, b.t AS type_b,
               CAST(count(*) AS BIGINT) AS n_both
        FROM basket a JOIN basket b
          ON a.okey = b.okey AND a.t < b.t
        GROUP BY a.t, b.t)
    SELECT p.type_a, p.type_b, p.n_both,
           sa.c AS n_a, sb.c AS n_b,
           round(p.n_both * 1.0 * n.n / (sa.c * sb.c), 6) AS lift
    FROM pairs p
    JOIN singles sa ON sa.t = p.type_a
    JOIN singles sb ON sb.t = p.type_b
    CROSS JOIN n_orders n
    ORDER BY type_a, type_b
    """,
    doc="market-basket affinity: for each pair of part types co-ordered "
    "in one order, support and lift = P(ab)/(P(a)P(b)).  The pair "
    "relation is type-pair sized; per-order fan-out is basket-width "
    "squared; singles and the order total broadcast back.",
)
def market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    basket = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .select(F.col("l_orderkey").alias("okey"), F.col("p_type").alias("t"))
        .distinct()
    )
    n_orders = basket.select(
        F.countDistinct("okey").cast("long").alias("n")
    )
    singles = basket.groupBy("t").agg(F.count("*").alias("c"))
    a = basket.select("okey", F.col("t").alias("type_a"))
    b = basket.select("okey", F.col("t").alias("type_b"))
    pairs = (
        a.join(b, "okey")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_both"))
    )
    sa = singles.select(F.col("t").alias("type_a"), F.col("c").alias("n_a"))
    sb = singles.select(F.col("t").alias("type_b"), F.col("c").alias("n_b"))
    return (
        # bounded: sa/sb are one row per part *type* (fixed enum, not
        # part grain); n_orders is a 1-row global countDistinct
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            F.round(
                F.col("n_both") * F.col("n") / (F.col("n_a") * F.col("n_b")), 6
            ).alias("lift"),
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "rfm_segments",
    sql="""
    WITH cust AS (
        SELECT o_custkey,
               max(o_orderdate) AS last_order,
               CAST(count(*) AS BIGINT) AS freq,
               sum(o_totalprice) AS monetary
        FROM orders GROUP BY o_custkey),
    scored AS (
        SELECT o_custkey,
               ntile(4) OVER (ORDER BY last_order, o_custkey) AS r,
               ntile(4) OVER (ORDER BY freq, o_custkey) AS f,
               ntile(4) OVER (ORDER BY monetary, o_custkey) AS m
        FROM cust)
    SELECT CAST(r AS INT) AS r, CAST(f AS INT) AS f, CAST(m AS INT) AS m,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM scored GROUP BY r, f, m ORDER BY r, f, m
    """,
    doc="RFM customer segmentation: recency/frequency/monetary quartiles "
    "(ntile with key tie-break for determinism), segment cell counts.  "
    "One linear agg to customer grain; the three global ntile windows "
    "run over the customer-sized relation — at 100 TB replace with "
    "percentile-bucket joins to avoid the single-partition sort.",
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("freq"),
        F.sum("o_totalprice").alias("monetary"),
    )
    scored = cust.select(
        "o_custkey",
        F.ntile(4).over(Window.orderBy("last_order", "o_custkey")).alias("r"),
        F.ntile(4).over(Window.orderBy("freq", "o_custkey")).alias("f"),
        F.ntile(4).over(Window.orderBy("monetary", "o_custkey")).alias("m"),
    )
    return (
        scored.groupBy("r", "f", "m")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("r", "f", "m")
    )


@register(
    "cusum_changepoint",
    sql="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY event_type, day),
    stats AS (
        SELECT event_type, avg(cnt) AS mean_cnt FROM daily
        GROUP BY event_type),
    walk AS (
        SELECT d.event_type, d.day,
               sum(d.cnt - s.mean_cnt) OVER (
                   PARTITION BY d.event_type ORDER BY d.day) AS cusum
        FROM daily d JOIN stats s USING (event_type)),
    ranked AS (
        SELECT event_type, day, cusum,
               row_number() OVER (PARTITION BY event_type
                   ORDER BY abs(cusum) DESC, day) AS rn
        FROM walk)
    SELECT event_type,
           strftime(day, '%Y-%m-%d') AS changepoint_day,
           round(cusum, 4) AS cusum_at_peak
    FROM ranked WHERE rn = 1 ORDER BY event_type
    """,
    doc="CUSUM change-point scan: per event type, the cumulative sum of "
    "daily-count deviations from the mean; the |CUSUM| peak marks the "
    "most likely level-shift day (Page 1954).  Events collapse to day "
    "grain before any window — the walk runs over ~30 rows per type.",
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").alias("cnt"))
    stats = daily.groupBy("event_type").agg(F.avg("cnt").alias("mean_cnt"))
    # bounded: one row per event_type (fixed enum)
    walk = daily.join(F.broadcast(stats), "event_type").withColumn(
        "cusum",
        F.sum(F.col("cnt") - F.col("mean_cnt")).over(
            Window.partitionBy("event_type")
            .orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    ranked = walk.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(
                F.abs("cusum").desc(), F.col("day")
            )
        ),
    )
    return (
        ranked.where(F.col("rn") == 1)
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("changepoint_day"),
            F.round("cusum", 4).alias("cusum_at_peak"),
        )
        .orderBy("event_type")
    )


@register(
    "autocorr_daily",
    sql="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY event_type, day),
    lagged AS (
        SELECT event_type, cnt,
               lag(cnt) OVER (PARTITION BY event_type ORDER BY day) AS prev
        FROM daily)
    SELECT event_type,
           CAST(count(prev) AS BIGINT) AS n_days,
           round(corr(cnt, prev), 6) AS lag1_autocorr
    FROM lagged WHERE prev IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
    doc="lag-1 autocorrelation of daily event counts per type — the "
    "burstiness / weekly-pattern screen.  Day-grain first; corr is one "
    "aggregation over the day-sized relation (both engines use sample "
    "correlation).",
)
def autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").alias("cnt"))
    lagged = daily.withColumn(
        "prev",
        F.lag("cnt").over(Window.partitionBy("event_type").orderBy("day")),
    ).where(F.col("prev").isNotNull())
    return (
        lagged.groupBy("event_type")
        .agg(
            F.count("prev").alias("n_days"),
            F.round(F.corr("cnt", "prev"), 6).alias("lag1_autocorr"),
        )
        .orderBy("event_type")
    )


@register(
    "dup_multiplicity_histogram",
    sql="""
    WITH digests AS (
        SELECT md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS d
        FROM documents),
    clusters AS (
        SELECT d, CAST(count(*) AS BIGINT) AS multiplicity
        FROM digests GROUP BY d)
    SELECT multiplicity,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(multiplicity) AS BIGINT) AS n_docs
    FROM clusters GROUP BY multiplicity ORDER BY multiplicity
    """,
    doc="duplicate-multiplicity accounting: the cluster-size histogram "
    "of exact-dup groups (how much of the corpus is 1x, 2x, 10x "
    "duplicated) — the number that decides whether dedup is worth a "
    "full pass.  Two cascaded digest aggregations; output is "
    "histogram-sized.",
)
def dup_multiplicity_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    digests = docs.select(
        F.md5(F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ")).alias("d")
    )
    clusters = digests.groupBy("d").agg(F.count("*").alias("multiplicity"))
    return (
        clusters.groupBy("multiplicity")
        .agg(
            F.count("*").alias("n_clusters"),
            F.sum("multiplicity").alias("n_docs"),
        )
        .orderBy("multiplicity")
    )


@register(
    "vocab_coverage_curve",
    sql=f"""
    WITH toks AS (SELECT unnest({_TOKS}) AS tok FROM documents),
    cnts AS (SELECT tok, CAST(count(*) AS BIGINT) AS c
             FROM toks GROUP BY tok),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cnts),
    ranked AS (
        SELECT c,
               row_number() OVER (ORDER BY c DESC, tok) AS rn,
               sum(c) OVER (ORDER BY c DESC, tok) AS cum
        FROM cnts),
    thresholds AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
                                  CAST(0.99 AS DOUBLE)]) AS threshold)
    SELECT t.threshold,
           CAST(min(CASE WHEN r.cum >= t.threshold * x.n THEN r.rn END)
                AS BIGINT) AS k_tokens,
           round(min(CASE WHEN r.cum >= t.threshold * x.n THEN r.cum END)
                 * 1.0 / max(x.n), 6) AS share_at_k
    FROM thresholds t CROSS JOIN ranked r CROSS JOIN tot x
    GROUP BY t.threshold ORDER BY t.threshold
    """,
    doc="vocabulary coverage curve: the smallest top-k token set covering "
    "50/90/99% of corpus tokens (tokenizer sizing / OOV budgeting).  "
    "One vocabulary-sized agg, one global-order window over the "
    "vocabulary relation, three output rows.",
)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cnts = (
        docs.select(
            F.explode(TX.tokens("text")).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    tot = cnts.agg(F.sum("c").alias("n"))
    w = Window.orderBy(F.desc("c"), F.asc("tok"))
    ranked = cnts.select(
        "c",
        F.row_number().over(w).alias("rn"),
        F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
    )
    thresholds = spark.range(1).select(
        F.explode(F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))).alias("threshold")
    )
    return (
        # bounded: thresholds is a 3-row literal; broadcast it so the
        # static planner never emits a CartesianProduct against the
        # vocabulary-sized ranked relation
        F.broadcast(thresholds).crossJoin(ranked)
        .crossJoin(F.broadcast(tot))
        .groupBy("threshold")
        .agg(
            F.min(
                F.when(F.col("cum") >= F.col("threshold") * F.col("n"), F.col("rn"))
            ).alias("k_tokens"),
            F.round(
                F.min(
                    F.when(
                        F.col("cum") >= F.col("threshold") * F.col("n"),
                        F.col("cum"),
                    )
                )
                / F.max("n").cast("double"),
                6,
            ).alias("share_at_k"),
        )
        .orderBy("threshold")
    )


@register(
    "trimmed_mean_values",
    sql="""
    WITH ranked AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                   ORDER BY value, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events)
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n_events,
           round(avg(value), 4) AS mean_value,
           round(avg(value) FILTER (WHERE rn > n // 10
                                      AND rn <= n - n // 10), 4)
               AS trimmed_mean
    FROM ranked GROUP BY event_type ORDER BY event_type
    """,
    doc="GROUPED_AGG pandas UDF (UDAF API surface, functions/stats."
    "trimmed_mean_udaf): per-type 10%-trimmed mean of event values next "
    "to the plain mean.  Order-statistic aggregates have no mergeable "
    "partials, so the whole group ships to one task — fine for "
    "well-distributed keys, never for skew keys.  The oracle slices by "
    "RANK (count-based trim), which matches the numpy sort-and-slice "
    "exactly even with ties at the trim boundary.",
)
def trimmed_mean_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.stats import trimmed_mean_udaf

    events = load_table(spark, sf_dir, "events")
    tm = trimmed_mean_udaf(0.1)
    # Spark refuses to mix a GROUPED_AGG pandas UDF with JVM aggregates
    # in one agg (INVALID_PANDAS_UDF_PLACEMENT): run the JVM aggregates
    # and the UDAF as two aggregations over the same grouping and join
    # the (group-key-sized) results
    jvm = events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.avg("value"), 4).alias("mean_value"),
    )
    udaf = events.groupBy("event_type").agg(
        F.round(tm(F.col("value")), 4).alias("trimmed_mean")
    )
    return jvm.join(udaf, "event_type").select(
        "event_type", "n_events", "mean_value", "trimmed_mean"
    ).orderBy("event_type")


@register(
    "embedding_pca_variance",
    sql=None,  # eigendecomposition is not SQL-expressible; invariants
    # (eigenvalue ordering, orthonormality, variance-match, reconstruction
    # bound) are pinned in tests/test_insights.py against numpy ground truth
    doc="distributed PCA (operators/pca.py): the 64x64 Gram matrix is "
    "reduced from partition-wise numpy partials (d^2-sized, independent "
    "of row count), eigendecomposed on the driver, and the corpus is "
    "projected with JVM zip_with/aggregate expressions — no Python in "
    "the scoring pass.  Output: per-component explained-variance shares "
    "+ per-label PC centroids (labels separate along the top "
    "components if the embedding space is label-structured).",
)
def embedding_pca_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import pca

    emb = load_table(spark, sf_dir, "embeddings")
    dim = 64
    vals, comps, mean, trace = pca.fit_pca(emb, "embedding", dim=dim, k=4)
    total_var = trace or 1.0  # trace = TOTAL variance, not the top-k sum
    projected = pca.project(emb, "embedding", comps, mean)
    per_label = projected.groupBy("label").agg(
        F.count("*").alias("n"),
        *[F.round(F.avg(f"pc{i}"), 4).alias(f"centroid_pc{i}") for i in range(2)],
    )
    shares = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "component int, eigenvalue double"
    ).select(
        "component",
        F.round("eigenvalue", 6).alias("eigenvalue"),
        F.round(F.col("eigenvalue") / F.lit(total_var), 6).alias("var_share"),
    )
    # one result relation: component rows then per-label centroid rows
    comp_rows = shares.select(
        F.concat(F.lit("component_"), F.col("component")).alias("entity"),
        F.col("eigenvalue").alias("metric_a"),
        F.col("var_share").alias("metric_b"),
    )
    label_rows = per_label.select(
        F.concat(F.lit("label_"), F.col("label")).alias("entity"),
        F.col("centroid_pc0").alias("metric_a"),
        F.col("centroid_pc1").alias("metric_b"),
    )
    return comp_rows.unionByName(label_rows).orderBy("entity")


# the covariance cells the gram differential spot-checks (plus the full
# diagonal via the trace row) — fixed so both engines emit the same set
_PCA_COV_CELLS = [(0, 0), (0, 1), (1, 1), (1, 2), (2, 3), (3, 3)]


@register(
    "pca_gram_check",
    sql="SELECT -1 AS di, -1 AS dj, round("
    + " + ".join(f"var_pop(embedding[{d + 1}])" for d in range(64))
    + ", 6) AS cov FROM embeddings\n"
    + "".join(
        f"UNION ALL SELECT {i}, {j}, "
        f"round(covar_pop(embedding[{i + 1}], embedding[{j + 1}]), 6) "
        "FROM embeddings\n"
        for i, j in _PCA_COV_CELLS
    )
    + "ORDER BY di, dj",
    doc="differential check of the distributed PCA's gram path "
    "(operators/pca.py cov_matrix): every covariance entry the numpy "
    "partial-reduce produces equals covar_pop of the two coordinate "
    "columns, which IS SQL-expressible even though the downstream "
    "eigendecomposition isn't — so the mapInPandas partials, the "
    "driver reduce, and the mean-centering are all hash-compared "
    "against DuckDB (spot-checked cells plus the trace row, di=dj=-1, "
    "which covers the whole diagonal).  The eigen half of "
    "embedding_pca_variance stays pinned by numpy-ground-truth "
    "invariant tests.  Eager by nature (the reduce collects d^2-sized "
    "partials at build time — the same contract as fit_pca).",
)
def pca_gram_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from ..operators import pca

    emb = load_table(spark, sf_dir, "embeddings")
    cov, _mean, _n = pca.cov_matrix(emb, "embedding", dim=64)
    rows = [(-1, -1, float(np.trace(cov)))] + [
        (i, j, float(cov[i, j])) for i, j in _PCA_COV_CELLS
    ]
    return (
        spark.createDataFrame(rows, "di int, dj int, cov double")
        # round Spark-side: F.round is half-up like DuckDB's, Python
        # round is banker's
        .select("di", "dj", F.round("cov", 6).alias("cov"))
        .orderBy("di", "dj")
    )


@register(
    "km_survival_signup_to_error",
    sql="""
    WITH signups AS (
        SELECT user_id, min(ts) AS s_ts FROM events
        WHERE event_type = 'signup' GROUP BY user_id),
    horizon AS (SELECT max(ts) AS h FROM events),
    first_err AS (
        SELECT s.user_id, min(e.ts) AS e_ts
        FROM signups s JOIN events e
          ON e.user_id = s.user_id
         AND e.event_type = 'error' AND e.ts >= s.s_ts
        GROUP BY s.user_id),
    obs AS (
        SELECT s.user_id,
               CAST(date_diff('day', s.s_ts,
                              coalesce(f.e_ts, h.h)) AS BIGINT) AS dur,
               (f.e_ts IS NOT NULL) AS evented
        FROM signups s
        LEFT JOIN first_err f USING (user_id)
        CROSS JOIN horizon h),
    per_day AS (
        SELECT dur AS day,
               CAST(sum(CASE WHEN evented THEN 1 ELSE 0 END) AS BIGINT) AS d,
               CAST(count(*) AS BIGINT) AS leaving
        FROM obs GROUP BY dur),
    spine AS (
        SELECT unnest(range(0, (SELECT max(dur) FROM obs) + 1)) AS day),
    risk AS (
        SELECT sp.day,
               coalesce(p.d, 0) AS d,
               (SELECT CAST(count(*) AS BIGINT) FROM obs) -
               coalesce(sum(p2.leaving), 0) AS n_at_risk
        FROM spine sp
        LEFT JOIN per_day p ON p.day = sp.day
        LEFT JOIN per_day p2 ON p2.day < sp.day
        GROUP BY sp.day, p.d),
    km AS (
        SELECT day, d, n_at_risk,
               exp(sum(ln(greatest(1.0 - d * 1.0 / n_at_risk, 1e-12)))
                   OVER (ORDER BY day)) AS survival
        FROM risk WHERE n_at_risk > 0)
    SELECT CAST(day AS BIGINT) AS day, d AS n_events, n_at_risk,
           round(survival, 6) AS survival
    FROM km WHERE d > 0 OR day = 0
    ORDER BY day
    """,
    doc="Kaplan-Meier survival of signup -> first error (right-censored "
    "at the corpus horizon): per-day event and at-risk counts, survival "
    "as the running product of (1 - d/n) computed with the exp-sum-ln "
    "window trick (SQL has no product aggregate).  Day-grain relation "
    "throughout (<= corpus-span rows), deterministic float order "
    "(sequential frame), ln clamped at 1e-12 so a total-event day "
    "degrades to S=0 instead of engine-divergent ln(0).",
)
def km_survival_signup_to_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    signups = (
        events.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    horizon = events.agg(F.max("ts").alias("h"))
    errs = (
        signups.join(
            events.where(F.col("event_type") == "error").select(
                F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts")
            ),
            (F.col("e_user") == F.col("user_id")) & (F.col("e_ts") >= F.col("s_ts")),
        )
        .groupBy("user_id")
        .agg(F.min("e_ts").alias("e_ts"))
    )
    obs = (
        signups.join(errs, "user_id", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            "user_id",
            F.datediff(
                F.coalesce("e_ts", "h").cast("date"), F.col("s_ts").cast("date")
            )
            .cast("long")
            .alias("dur"),
            F.col("e_ts").isNotNull().alias("evented"),
        )
    )
    per_day = obs.groupBy(F.col("dur").alias("day")).agg(
        F.sum(F.col("evented").cast("long")).alias("d"),
        F.count("*").alias("leaving"),
    )
    total = obs.agg(F.count("*").alias("n_total"), F.max("dur").alias("max_d"))
    spine = (
        total.select(
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("max_d"))).alias(
                "day"
            )
        )
    )
    w_prev = (
        Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    )
    risk = (
        spine.join(per_day, "day", "left")
        .na.fill({"d": 0, "leaving": 0})
        # bounded: total is a 1-row global count
        .crossJoin(F.broadcast(total.select("n_total")))
        .withColumn(
            "n_at_risk",
            F.col("n_total") - F.coalesce(F.sum("leaving").over(w_prev), F.lit(0)),
        )
        .where(F.col("n_at_risk") > 0)
    )
    w_run = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    term = F.log(
        F.greatest(
            F.lit(1.0) - F.col("d") / F.col("n_at_risk"), F.lit(1e-12)
        )
    )
    km = risk.withColumn("survival", F.exp(F.sum(term).over(w_run)))
    return (
        km.where((F.col("d") > 0) | (F.col("day") == 0))
        .select(
            "day",
            F.col("d").alias("n_events"),
            "n_at_risk",
            F.round("survival", 6).alias("survival"),
        )
        .orderBy("day")
    )


@register(
    "moments_profile",
    sql="""
    WITH means AS (
        SELECT event_type, avg(value) AS mu FROM events GROUP BY event_type),
    cm AS (
        SELECT e.event_type,
               CAST(count(*) AS BIGINT) AS n,
               avg((e.value - m.mu) * (e.value - m.mu)) AS m2,
               avg(pow(e.value - m.mu, 3)) AS m3,
               avg(pow(e.value - m.mu, 4)) AS m4
        FROM events e JOIN means m USING (event_type)
        GROUP BY e.event_type)
    SELECT event_type, n,
           round(m2, 5) AS variance,
           round(m3 / pow(nullif(m2, 0), 1.5), 5) AS skewness,
           round(m4 / (nullif(m2, 0) * m2) - 3, 5) AS excess_kurtosis
    FROM cm ORDER BY event_type
    """,
    doc="central-moment distribution profile per event type: variance, "
    "skewness, excess kurtosis from explicit two-pass moments (mean "
    "broadcast back, then one aggregation of centered powers) — NOT the "
    "built-in skewness()/kurtosis(), whose population-vs-sample "
    "conventions differ between engines; explicit moments make the "
    "definition the same everywhere.  Flags heavy tails / asymmetry "
    "before a mean-based gate gets fooled by them.",
)
def moments_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    means = events.groupBy("event_type").agg(F.avg("value").alias("mu"))
    c = F.col("value") - F.col("mu")
    cm = (
        # bounded: one row per event_type (fixed enum)
        events.join(F.broadcast(means), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.avg(c * c).alias("m2"),
            F.avg(F.pow(c, 3)).alias("m3"),
            F.avg(F.pow(c, 4)).alias("m4"),
        )
    )
    # nullif guards a constant column (m2 = 0): both engines then yield
    # NULL instead of Spark-NULL-vs-DuckDB-inf divergence
    m2nz = F.nullif(F.col("m2"), F.lit(0.0))
    return cm.select(
        "event_type",
        "n",
        F.round("m2", 5).alias("variance"),
        F.round(F.col("m3") / F.pow(m2nz, 1.5), 5).alias("skewness"),
        F.round(F.col("m4") / (m2nz * F.col("m2")) - 3, 5).alias(
            "excess_kurtosis"
        ),
    ).orderBy("event_type")


@register(
    "token_pmi_collocations",
    sql=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOKS}) AS tok,
               generate_subscripts({_TOKS}, 1) AS pos
        FROM documents),
    bigrams AS (
        SELECT a.tok AS w1, b.tok AS w2,
               CAST(count(*) AS BIGINT) AS c_ab
        FROM toks a JOIN toks b
          ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        GROUP BY a.tok, b.tok),
    uni AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY tok),
    tot AS (
        SELECT CAST(sum(c_ab) AS BIGINT) AS n_bi FROM bigrams),
    utot AS (SELECT CAST(sum(c) AS BIGINT) AS n_uni FROM uni)
    SELECT bg.w1, bg.w2, bg.c_ab,
           round(ln((bg.c_ab * 1.0 / t.n_bi)
                    / ((u1.c * 1.0 / ut.n_uni) * (u2.c * 1.0 / ut.n_uni))),
                 6) AS pmi
    FROM bigrams bg
    JOIN uni u1 ON u1.tok = bg.w1
    JOIN uni u2 ON u2.tok = bg.w2
    CROSS JOIN tot t CROSS JOIN utot ut
    WHERE bg.c_ab >= 50
    ORDER BY pmi DESC, w1, w2 LIMIT 20
    """,
    doc="PMI collocations: adjacent-token bigram counts vs independent "
    "unigram expectation, ln(p(ab)/(p(a)p(b))), top-20 by PMI with a "
    "min-support floor (rare bigrams have unstable PMI).  The bigram "
    "join is positional WITHIN each document (posexplode pairs), so "
    "the pair relation is corpus-token-sized, then everything reduces "
    "to vocabulary-pair grain; unigram totals broadcast back.",
)
def token_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(TX.tokens("text")).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    a = toks.select("doc_id", "pos", F.col("tok").alias("w1"))
    b = toks.select(
        "doc_id", (F.col("pos") - 1).alias("pos"), F.col("tok").alias("w2")
    )
    bigrams = (
        a.join(b, ["doc_id", "pos"])
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c_ab"))
    )
    uni = toks.groupBy("tok").agg(F.count("*").alias("c"))
    tot = bigrams.agg(F.sum("c_ab").alias("n_bi"))
    utot = uni.agg(F.sum("c").alias("n_uni"))
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))
    p_ab = F.col("c_ab") / F.col("n_bi")
    p_a = F.col("c1") / F.col("n_uni")
    p_b = F.col("c2") / F.col("n_uni")
    return (
        bigrams.where(F.col("c_ab") >= 50)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(utot))
        .select(
            "w1",
            "w2",
            "c_ab",
            F.round(F.log(p_ab / (p_a * p_b)), 6).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(20)
    )


@register(
    "source_token_entropy",
    sql=f"""
    WITH toks AS (
        SELECT source, unnest({_TOKS}) AS tok FROM documents),
    cnts AS (
        SELECT source, tok, CAST(count(*) AS BIGINT) AS c
        FROM toks GROUP BY source, tok),
    tots AS (
        SELECT source, CAST(sum(c) AS BIGINT) AS n
        FROM cnts GROUP BY source)
    SELECT c.source, t.n AS n_tokens,
           round(-sum((c.c * 1.0 / t.n) * ln(c.c * 1.0 / t.n)), 6)
               AS entropy_nats,
           round(-sum((c.c * 1.0 / t.n) * ln(c.c * 1.0 / t.n))
                 / ln((SELECT count(*) FROM (SELECT DISTINCT tok FROM toks))),
                 6) AS normalized_entropy
    FROM cnts c JOIN tots t USING (source)
    GROUP BY c.source, t.n ORDER BY c.source
    """,
    doc="per-source unigram Shannon entropy (nats) + entropy normalized "
    "by ln(vocabulary): the diversity complement of the KL drift query "
    "— a source whose entropy collapses went templated/repetitive even "
    "if its KL vs the corpus stays small.  One token agg, per-source "
    "totals broadcast, a 1-row vocabulary constant.",
)
def source_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(TX.tokens("text")).alias("tok"))
    cnts = toks.groupBy("source", "tok").agg(F.count("*").alias("c"))
    tots = cnts.groupBy("source").agg(F.sum("c").alias("n"))
    vocab = toks.select("tok").distinct().agg(F.count("*").alias("v"))
    p = F.col("c") / F.col("n")
    ent = -F.sum(p * F.log(p))
    return (
        # bounded: tots is one row per source (fixed handful of labels)
        cnts.join(F.broadcast(tots), "source")
        .crossJoin(F.broadcast(vocab))
        .groupBy("source", "n", "v")
        .agg(F.round(ent, 6).alias("entropy_nats"),
             F.round(ent / F.log(F.max("v").cast("double")), 6).alias(
                 "normalized_entropy"))
        .select(
            "source",
            F.col("n").alias("n_tokens"),
            "entropy_nats",
            "normalized_entropy",
        )
        .orderBy("source")
    )


@register(
    "gini_revenue_concentration",
    sql="""
    WITH cust AS (
        SELECT o_custkey, sum(o_totalprice) AS rev
        FROM orders GROUP BY o_custkey),
    ranked AS (
        SELECT rev,
               row_number() OVER (ORDER BY rev, o_custkey) AS i,
               count(*) OVER () AS n,
               sum(rev) OVER () AS tot
        FROM cust)
    SELECT CAST(max(n) AS BIGINT) AS n_customers,
           round(max(tot), 2) AS total_revenue,
           round(2.0 * sum(i * rev) / (max(n) * max(tot))
                 - (max(n) + 1.0) / max(n), 6) AS gini
    FROM ranked
    """,
    doc="Gini coefficient of revenue concentration across customers "
    "(the whale-dependence metric): rank-weighted formula "
    "G = 2*sum(i*x_i)/(n*sum x) - (n+1)/n over ascending revenue with "
    "a key tie-break.  One customer-grain agg + one global-order "
    "window over the customer-sized relation.",
)
def gini_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("rev"))
    w = Window.orderBy("rev", "o_custkey")
    ranked = cust.select(
        "rev",
        F.row_number().over(w).cast("long").alias("i"),
    )
    return ranked.agg(
        F.count("*").alias("n_customers"),
        F.round(F.sum("rev"), 2).alias("total_revenue"),
        F.round(
            2.0 * F.sum(F.col("i") * F.col("rev"))
            / (F.count("*") * F.sum("rev"))
            - (F.count("*") + 1.0) / F.count("*"),
            6,
        ).alias("gini"),
    )


# The anchor's single-task ntile window is bounded by a deterministic
# md5 sample above this many rows (the model fit and global mean stay
# full-table — they are linear aggregates that scale fine).  Never
# bites at oracle scales (sf0.01: ~60k lineitem rows), so the DuckDB
# differential and the three-way anchor==scalable agreement still
# check the FULL exact chart; a lift chart from a >=100k-row
# deterministic sample carries the same diagnostic power, and the
# single-task sort can no longer grow with the corpus.
_DLC_CAP = 100_000


@register(
    "decile_lift_chart",
    sql=f"""
    WITH pts AS (
        SELECT l_orderkey, l_linenumber, l_quantity AS x,
               l_extendedprice AS y
        FROM lineitem),
    k AS (
        SELECT greatest(1, CAST(ceil(count(*) / {_DLC_CAP}.0) AS BIGINT)) AS k
        FROM pts),
    spts AS (
        SELECT * FROM pts
        WHERE CAST('0x' || substr(md5('declift|' || CAST(l_orderkey AS VARCHAR)
                                      || ':' || CAST(l_linenumber AS VARCHAR)),
                                  1, 15) AS BIGINT)
              % (SELECT k FROM k) = 0),
    coef AS (
        SELECT covar_pop(x, y) / var_pop(x) AS b1,
               avg(y) - covar_pop(x, y) / var_pop(x) * avg(x) AS b0
        FROM pts),
    scored AS (
        SELECT p.y, c.b0 + c.b1 * p.x AS yhat,
               ntile(10) OVER (ORDER BY c.b0 + c.b1 * p.x DESC,
                               p.l_orderkey, p.l_linenumber) AS decile
        FROM spts p CROSS JOIN coef c),
    overall AS (SELECT avg(y) AS mu FROM pts)
    SELECT CAST(decile AS INT) AS decile,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(y), 2) AS actual_mean,
           round(avg(yhat), 2) AS predicted_mean,
           round(avg(y) / (SELECT mu FROM overall), 6) AS lift
    FROM scored GROUP BY decile ORDER BY decile
    """,
    doc="decile lift chart (ranking-power diagnostic): rows ranked by "
    "the OLS prediction, split into deciles (key tie-break), each "
    "decile's actual mean vs the global mean = lift.  A model with "
    "ranking power shows monotone-ish lift from decile 1 down; a flat "
    "chart means the model orders nothing.  Coefficients are a 1-row "
    f"broadcast.  Above {_DLC_CAP} rows the single-task decile window's "
    "input is md5-sample-capped (deterministic, engine-portable, never "
    "bites at oracle scales — the fit and the global mean stay "
    "full-table); decile_lift_scalable is the uncapped 100 TB form "
    "(global_rank + ntile_from_rank, no single-task window).",
)
def decile_lift_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import _md5_hash60

    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        "l_orderkey", "l_linenumber", F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"),
    )
    # the sample modulus is part of the PLAN (a 1-row count aggregate
    # crossJoined in, exactly like the DuckDB twin's scalar subquery),
    # not a driver-side count() — building this query triggers no jobs
    # and costs no extra table pass
    # bounded: cap_k is a 1-row global aggregate
    kdf = pts.agg(
        F.greatest(
            F.lit(1).cast("bigint"), F.ceil(F.count("*") / F.lit(float(_DLC_CAP)))
        ).alias("cap_k")
    )
    spts = (
        pts.crossJoin(F.broadcast(kdf))
        .filter(
            _md5_hash60(
                F.concat(
                    F.col("l_orderkey").cast("string"),
                    F.lit(":"),
                    F.col("l_linenumber").cast("string"),
                ),
                "declift",
            )
            % F.col("cap_k")
            == 0
        )
        .drop("cap_k")
    )
    b1 = F.covar_pop("x", "y") / F.var_pop("x")
    coef = pts.agg(b1.alias("b1"), (F.avg("y") - b1 * F.avg("x")).alias("b0"))
    scored = spts.crossJoin(F.broadcast(coef)).withColumn(
        "yhat", F.col("b0") + F.col("b1") * F.col("x")
    )
    w = Window.orderBy(
        F.desc("yhat"), F.asc("l_orderkey"), F.asc("l_linenumber")
    )
    overall = pts.agg(F.avg("y").alias("mu"))
    return (
        scored.withColumn("decile", F.ntile(10).over(w))
        .crossJoin(F.broadcast(overall))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("y"), 2).alias("actual_mean"),
            F.round(F.avg("yhat"), 2).alias("predicted_mean"),
            F.round(F.avg("y") / F.max("mu"), 6).alias("lift"),
        )
        .orderBy("decile")
    )


@register(
    "percent_of_parent_rollup",
    sql="""
    WITH rev AS (
        SELECT r.r_name AS region, n.n_name AS nation,
               sum(o.o_totalprice) AS revenue
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        GROUP BY r.r_name, n.n_name)
    SELECT region, nation,
           round(revenue, 2) AS revenue,
           round(revenue / sum(revenue) OVER (PARTITION BY region), 6)
               AS share_of_region,
           round(sum(revenue) OVER (PARTITION BY region)
                 / sum(revenue) OVER (), 6) AS region_share_of_total
    FROM rev ORDER BY region, nation
    """,
    doc="percent-of-parent hierarchy rollup (the BI ratio-to-parent "
    "pattern): nation revenue share within its region and region share "
    "of the grand total, from ONE leaf-grain aggregate — the two "
    "parent levels are windows over the already nation-sized relation, "
    "so the fact table is scanned once regardless of hierarchy depth.  "
    "Dimensions broadcast into the fact scan.",
)
def percent_of_parent_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    rev = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum("o_totalprice").alias("revenue"))
    )
    w_region = Window.partitionBy("region")
    w_all = Window.partitionBy()
    return rev.select(
        "region",
        "nation",
        F.round("revenue", 2).alias("revenue"),
        F.round(F.col("revenue") / F.sum("revenue").over(w_region), 6).alias(
            "share_of_region"
        ),
        F.round(
            F.sum("revenue").over(w_region) / F.sum("revenue").over(w_all), 6
        ).alias("region_share_of_total"),
    ).orderBy("region", "nation")


@register(
    "global_rank_scalable",
    sql="""
    WITH ranked AS (
        SELECT o_orderpriority,
               row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey)
                   AS rnk
        FROM orders)
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(rnk) AS BIGINT) AS rank_sum,
           CAST(min(rnk) AS BIGINT) AS best_rank,
           CAST(max(rnk) AS BIGINT) AS worst_rank
    FROM ranked GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="distributed global ranking (operators/ranking.global_rank): "
    "orders ranked by totalprice via data-derived equal-width buckets "
    "(broadcast min/max boundaries — a pure function of the row, "
    "stable across plan branches, unlike repartitionByRange + "
    "spark_partition_id which AQE can coalesce differently per "
    "branch) + per-bucket row_number + tiny prefix-sum offset join "
    "— NO single-task global "
    "window (`Window.orderBy` with no partitionBy moves every row to "
    "one task; this shape survives 100 TB).  Output folds every rank "
    "into per-priority sum/min/max so the oracle checks the entire "
    "rank assignment, not a sample.",
)
def global_rank_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranking import global_rank

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice", "o_orderkey"
    )
    ranked = global_rank(
        o, "o_totalprice", [F.asc("o_orderkey")], ascending=False,
        rank_col="rnk",
    )
    return (
        ranked.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum("rnk").alias("rank_sum"),
            F.min("rnk").alias("best_rank"),
            F.max("rnk").alias("worst_rank"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "decile_lift_scalable",
    sql="""
    WITH pts AS (
        SELECT l_orderkey, l_linenumber, l_quantity AS x,
               l_extendedprice AS y
        FROM lineitem),
    coef AS (
        SELECT covar_pop(x, y) / var_pop(x) AS b1,
               avg(y) - covar_pop(x, y) / var_pop(x) * avg(x) AS b0
        FROM pts),
    scored AS (
        SELECT p.y, c.b0 + c.b1 * p.x AS yhat,
               ntile(10) OVER (ORDER BY c.b0 + c.b1 * p.x DESC,
                               p.l_orderkey, p.l_linenumber) AS decile
        FROM pts p CROSS JOIN coef c),
    overall AS (SELECT avg(y) AS mu FROM pts)
    SELECT CAST(decile AS INT) AS decile,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(y), 2) AS actual_mean,
           round(avg(yhat), 2) AS predicted_mean,
           round(avg(y) / (SELECT mu FROM overall), 6) AS lift
    FROM scored GROUP BY decile ORDER BY decile
    """,
    doc="decile_lift_chart's 100 TB twin: identical ntile(10) "
    "semantics (same oracle SQL) but the decile comes from "
    "operators/ranking.global_rank + ntile_from_rank — a range "
    "exchange and column arithmetic instead of the single-task "
    "Window.orderBy ntile.  The exact SQL-standard bucket split "
    "(first n%k buckets one row larger) is reproduced from "
    "(rank, total) so both plans hash identically.",
)
def decile_lift_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranking import global_rank, ntile_from_rank

    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        "l_orderkey", "l_linenumber", F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"),
    )
    b1 = F.covar_pop("x", "y") / F.var_pop("x")
    coef = pts.agg(
        b1.alias("b1"),
        (F.avg("y") - b1 * F.avg("x")).alias("b0"),
        F.avg("y").alias("mu"),
        F.count("*").alias("total"),
    )
    scored = pts.crossJoin(F.broadcast(coef)).withColumn(
        "yhat", F.col("b0") + F.col("b1") * F.col("x")
    )
    ranked = global_rank(
        scored,
        "yhat",
        [F.asc("l_orderkey"), F.asc("l_linenumber")],
        ascending=False,
        rank_col="rnk",
    )
    return (
        ranked.withColumn(
            "decile", ntile_from_rank(F.col("rnk"), F.col("total"), 10)
        )
        .groupBy("decile")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("y"), 2).alias("actual_mean"),
            F.round(F.avg("yhat"), 2).alias("predicted_mean"),
            F.round(F.avg("y") / F.max("mu"), 6).alias("lift"),
        )
        .orderBy("decile")
    )


@register(
    "segment_overlap_jaccard",
    sql="""
    WITH tu AS (
        SELECT DISTINCT event_type AS seg, user_id FROM events),
    sizes AS (SELECT seg, CAST(count(*) AS DOUBLE) AS n
              FROM tu GROUP BY seg),
    inter AS (
        SELECT a.seg AS seg_a, b.seg AS seg_b,
               CAST(count(*) AS DOUBLE) AS n_both
        FROM tu a JOIN tu b
          ON a.user_id = b.user_id AND a.seg < b.seg
        GROUP BY a.seg, b.seg)
    SELECT i.seg_a, i.seg_b,
           CAST(i.n_both AS BIGINT) AS n_both,
           round(i.n_both / (sa.n + sb.n - i.n_both), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.seg = i.seg_a
    JOIN sizes sb ON sb.seg = i.seg_b
    ORDER BY seg_a, seg_b
    """,
    doc="audience-overlap matrix: Jaccard similarity between the USER "
    "SETS of every event-type pair.  The raw log collapses to the "
    "DISTINCT (segment, user) relation first; the pairwise "
    "intersection is a user-keyed self-join whose fan-out per user is "
    "bounded by |segments|^2 (a constant), never corpus-sized; union "
    "sizes come from inclusion-exclusion, not a second join.  The "
    "same shape computes audience overlap for billions of users.",
)
def segment_overlap_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    tu = e.select(F.col("event_type").alias("seg"), "user_id").distinct()
    sizes = tu.groupBy("seg").agg(F.count("*").cast("double").alias("n"))
    a = tu.select(F.col("seg").alias("seg_a"), "user_id")
    b = tu.select(F.col("seg").alias("seg_b"), "user_id")
    inter = (
        a.join(b, "user_id")
        .filter(F.col("seg_a") < F.col("seg_b"))
        .groupBy("seg_a", "seg_b")
        .agg(F.count("*").cast("double").alias("n_both"))
    )
    sa = sizes.select(F.col("seg").alias("seg_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("seg").alias("seg_b"), F.col("n").alias("nb"))
    return (
        # bounded: sa/sb are one row per segment bucket (fixed enum)
        inter.join(F.broadcast(sa), "seg_a")
        .join(F.broadcast(sb), "seg_b")
        .select(
            "seg_a",
            "seg_b",
            F.col("n_both").cast("long").alias("n_both"),
            F.round(
                F.col("n_both") / (F.col("na") + F.col("nb") - F.col("n_both")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("seg_a", "seg_b")
    )


@register(
    "pareto_revenue_share",
    sql="""
    WITH cust AS (
        SELECT o_custkey, sum(o_totalprice) AS rev
        FROM orders GROUP BY o_custkey),
    ranked AS (
        SELECT rev,
               row_number() OVER (ORDER BY rev DESC, o_custkey) AS r,
               count(*) OVER () AS n,
               sum(rev) OVER () AS total
        FROM cust)
    SELECT CAST(count(*) AS BIGINT) AS top_customers,
           CAST(max(n) AS BIGINT) AS all_customers,
           round(sum(rev), 2) AS top_revenue,
           round(sum(rev) / max(total), 6) AS revenue_share
    FROM ranked WHERE r * 5 <= n
    """,
    doc="Pareto 80/20 check: what revenue share do the top 20% of "
    "customers carry?  Customer grain first (one linear agg), then "
    "the top-quintile cut via operators/ranking.global_rank (the "
    "oracle's row_number window, made scalable) and a 1-row broadcast "
    "total — the whale-dependence number next to "
    "gini_revenue_concentration's full curve.",
)
def pareto_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranking import global_rank

    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("rev"))
    ranked = global_rank(
        cust, "rev", [F.asc("o_custkey")], ascending=False, rank_col="r"
    )
    totals = cust.agg(
        F.count("*").alias("n"), F.sum("rev").alias("total")
    )
    return (
        ranked.crossJoin(F.broadcast(totals))
        .filter(F.col("r") * 5 <= F.col("n"))
        .agg(
            F.count("*").alias("top_customers"),
            F.max("n").cast("long").alias("all_customers"),
            F.round(F.sum("rev"), 2).alias("top_revenue"),
            F.round(F.sum("rev") / F.max("total"), 6).alias("revenue_share"),
        )
    )


def _pcproj_consts() -> tuple[list[float], list[float], list[float]]:
    """md5-derived frozen unit vectors (+ a pseudo-mean) for the
    projection differential: entries are ±0.125 / ±0.05 with sign from
    the parity of md5("pcproj|<c>|<d>"), so ANY engine with md5
    rebuilds the identical constants.  Cross-engine equality holds
    because both engines parse the same decimal literals to the same
    nearest IEEE double (0.125 is exact; 0.05 relies on identical
    round-to-nearest parsing, which IEEE 754 guarantees), and outputs
    are rounded to 6 places besides."""
    import hashlib

    def par(salt: str, i: int) -> float:
        h = int(hashlib.md5(f"{salt}|{i}".encode()).hexdigest()[:15], 16)
        return 1.0 if h & 1 else -1.0

    c0 = [0.125 * par("pcproj|0", d) for d in range(64)]
    c1 = [0.125 * par("pcproj|1", d) for d in range(64)]
    m = [0.05 * par("pcproj|m", d) for d in range(64)]
    return c0, c1, m


_PCPROJ_C0, _PCPROJ_C1, _PCPROJ_M = _pcproj_consts()


def _sql_arr(xs: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in xs) + "]"


@register(
    "pca_projection_check",
    sql=f"""
    WITH consts AS (
        SELECT CAST({_sql_arr(_PCPROJ_M)} AS DOUBLE[]) AS m,
               CAST({_sql_arr(_PCPROJ_C0)} AS DOUBLE[]) AS c0,
               CAST({_sql_arr(_PCPROJ_C1)} AS DOUBLE[]) AS c1)
    SELECT vec_id, label,
           round(list_reduce(list_transform(range(1, 65),
                 i -> (embedding[i] - m[i]) * c0[i]), (a, b) -> a + b), 6)
               AS pc0,
           round(list_reduce(list_transform(range(1, 65),
                 i -> (embedding[i] - m[i]) * c1[i]), (a, b) -> a + b), 6)
               AS pc1
    FROM embeddings, consts
    ORDER BY vec_id
    """,
    doc="differential check of the distributed PCA's PROJECTION path "
    "(operators/pca.py project): the per-row zip_with mean-centering "
    "and dot-product fold — the exact JVM expressions "
    "embedding_pca_variance scores the corpus with — replayed by "
    "DuckDB over the same embeddings against frozen md5-derived unit "
    "vectors (data-INDEPENDENT, so the oracle string stays static "
    "across scale factors; true eigenvectors are data-derived and "
    "cannot appear in a static oracle).  Together with pca_gram_check "
    "(covariance entries == covar_pop) this pins both SQL-expressible "
    "halves of the PCA pipeline; only the 64x64 driver "
    "eigendecomposition itself remains on numpy-invariant tests.  "
    "Scale: map-only pass, no shuffle, no Python.",
)
def pca_projection_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import pca

    emb = load_table(spark, sf_dir, "embeddings")
    projected = pca.project(
        emb, "embedding", [_PCPROJ_C0, _PCPROJ_C1], _PCPROJ_M
    )
    return projected.select(
        "vec_id",
        "label",
        F.round("pc0", 6).alias("pc0"),
        F.round("pc1", 6).alias("pc1"),
    ).orderBy("vec_id")
