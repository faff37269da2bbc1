"""Data-profiling and statistical-analysis queries: distribution ranks,
gaps-and-islands, one-pass column profiling, fuzzy string matching, and
outlier detection.

These are the table-health / exploratory shapes an analyst runs before
trusting a dataset (the reference's notebooks eyeball Test_Run CSVs by
hand — ref F:680+ prints head()s; this is that workflow made set-wise
and repeatable). Every query here is oracle-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .catalog import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "percent_rank_cume_dist",
    sql="""
    WITH ranked AS (
        SELECT c_acctbal,
               percent_rank() OVER (ORDER BY c_acctbal) AS pr,
               cume_dist()    OVER (ORDER BY c_acctbal) AS cd
        FROM customer)
    SELECT c_acctbal,
           CAST(count(*) AS BIGINT) AS n,
           round(min(pr), 6) AS pct_rank,
           round(min(cd), 6) AS cum_dist
    FROM ranked
    GROUP BY c_acctbal
    ORDER BY c_acctbal
    """,
    doc="percent_rank + cume_dist, computed scale-aware: instead of a "
    "single-partition window over every row (what percent_rank() OVER "
    "(ORDER BY ...) compiles to), aggregate to distinct values first, "
    "then run the cumulative window over the |distinct| rows only — "
    "identical results under tie semantics (tied rows share the min-rank "
    "percent_rank and the max cume_dist), but the global window sees "
    "thousands of rows, not billions. The oracle runs the textbook "
    "per-row window and collapses; both must agree per value.",
)
def percent_rank_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    counts = c.groupBy("c_acctbal").agg(F.count("*").alias("n"))
    total = counts.agg(
        F.sum("n").alias("total_n")
    )  # 1 row -> broadcast cross join
    w = Window.orderBy("c_acctbal").rowsBetween(Window.unboundedPreceding, -1)
    return (
        counts.withColumn(
            "cum_before", F.coalesce(F.sum("n").over(w), F.lit(0))
        )
        .crossJoin(F.broadcast(total))
        .select(
            "c_acctbal",
            F.col("n").cast("bigint").alias("n"),
            F.round(F.col("cum_before") / (F.col("total_n") - 1), 6).alias(
                "pct_rank"
            ),
            F.round(
                (F.col("cum_before") + F.col("n")) / F.col("total_n"), 6
            ).alias("cum_dist"),
        )
        .orderBy("c_acctbal")
    )


@register(
    "order_streak_islands",
    sql="""
    WITH days AS (
        SELECT DISTINCT o_custkey,
               CAST(o_orderdate AS DATE) AS d
        FROM orders),
    islands AS (
        SELECT o_custkey,
               date_diff('day', DATE '1990-01-01', d)
                 - row_number() OVER (PARTITION BY o_custkey ORDER BY d)
                 AS grp
        FROM days),
    streaks AS (
        SELECT o_custkey, grp, count(*) AS streak_len
        FROM islands GROUP BY o_custkey, grp)
    SELECT CAST(streak_len AS BIGINT) AS streak_len,
           CAST(count(*) AS BIGINT)   AS n_streaks
    FROM streaks
    GROUP BY streak_len
    ORDER BY streak_len
    """,
    doc="gaps-and-islands: per customer, runs of consecutive order days "
    "(day_no minus row_number is constant within a run), histogrammed "
    "by streak length. All windows partitioned by customer key — no "
    "global sort anywhere, so the plan scales with the key cardinality.",
)
def order_streak_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    days = o.select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("d")
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("d")
    islands = days.select(
        "o_custkey",
        (
            F.datediff(F.col("d"), F.lit("1990-01-01").cast("date"))
            - F.row_number().over(w)
        ).alias("grp"),
    )
    streaks = islands.groupBy("o_custkey", "grp").agg(
        F.count("*").alias("streak_len")
    )
    return (
        streaks.groupBy(F.col("streak_len").cast("bigint").alias("streak_len"))
        .agg(F.count("*").alias("n_streaks"))
        .orderBy("streak_len")
    )


@register(
    "column_profile",
    sql="""
    WITH agg AS (SELECT
        CAST(count(value) AS BIGINT)                  AS value_n,
        CAST(count(DISTINCT value) AS BIGINT)         AS value_dist,
        CAST(count(*) FILTER (value <= 0 OR value > 500) AS BIGINT)
                                                      AS value_bad,
        CAST(count(user_id) AS BIGINT)                AS user_n,
        CAST(count(DISTINCT user_id) AS BIGINT)       AS user_dist,
        CAST(count(*) FILTER (user_id < 0) AS BIGINT) AS user_bad,
        CAST(count(event_type) AS BIGINT)             AS type_n,
        CAST(count(DISTINCT event_type) AS BIGINT)    AS type_dist,
        CAST(count(*) FILTER (NOT regexp_matches(event_type, '^[a-z_]+$'))
             AS BIGINT)                               AS type_bad
        FROM events)
    SELECT col, n_nonnull, n_distinct, n_invalid FROM (
        SELECT 'value' AS col, value_n AS n_nonnull,
               value_dist AS n_distinct, value_bad AS n_invalid FROM agg
        UNION ALL
        SELECT 'user_id', user_n, user_dist, user_bad FROM agg
        UNION ALL
        SELECT 'event_type', type_n, type_dist, type_bad FROM agg)
    ORDER BY col
    """,
    doc="one-pass data-quality profile: per column, non-null count, "
    "distinct count, and a policy-violation count (range check for "
    "value, sign check for user_id, charset regex for event_type) — "
    "all nine aggregates in a single scan (Catalyst expands the "
    "multi-DISTINCT into one Expand + aggregate, still one file pass), "
    "then stacked to a row per column. The validation manifest a "
    "100 TB ingest writes next to each table snapshot.",
)
def column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    agg = e.agg(
        F.count("value").alias("value_n"),
        F.countDistinct("value").alias("value_dist"),
        F.count(
            F.when((F.col("value") <= 0) | (F.col("value") > 500), 1)
        ).alias("value_bad"),
        F.count("user_id").alias("user_n"),
        F.countDistinct("user_id").alias("user_dist"),
        F.count(F.when(F.col("user_id") < 0, 1)).alias("user_bad"),
        F.count("event_type").alias("type_n"),
        F.countDistinct("event_type").alias("type_dist"),
        F.count(
            F.when(~F.col("event_type").rlike("^[a-z_]+$"), 1)
        ).alias("type_bad"),
    )
    return agg.select(
        F.expr(
            "stack(3, "
            "'value', value_n, value_dist, value_bad, "
            "'user_id', user_n, user_dist, user_bad, "
            "'event_type', type_n, type_dist, type_bad) "
            "AS (col, n_nonnull, n_distinct, n_invalid)"
        )
    ).orderBy("col")


@register(
    "fuzzy_name_pairs",
    sql="""
    WITH names AS (SELECT DISTINCT p_name FROM part),
    blocked AS (
        SELECT p_name, split_part(p_name, ' ', 2) AS blk FROM names)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
    FROM blocked a JOIN blocked b
      ON a.blk = b.blk AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    ORDER BY name_a, name_b
    """,
    doc="fuzzy string matching (edit-distance near-dup over a name "
    "vocabulary): distinct names, blocked on the head noun so the "
    "self-join is per-block not all-pairs, Levenshtein <= 3 verify. "
    "The same block-then-verify shape as near_dup_pairs but for short "
    "strings where edit distance (not Jaccard) is the right metric — "
    "entity-resolution for dimension tables. At 100 TB the distinct "
    "names are orders of magnitude smaller than the fact table; the "
    "blocked join never touches the raw rows.",
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = _t(spark, sf_dir, "part").select("p_name").distinct()
    blocked = names.select(
        "p_name", F.split(F.col("p_name"), " ").getItem(1).alias("blk")
    )
    a = blocked.alias("a")
    b = blocked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
            .cast("int")
            .alias("dist"),
        )
        .filter(F.col("dist") <= 3)
        .orderBy("name_a", "name_b")
    )


@register(
    "zscore_outliers",
    sql="""
    WITH s AS (
        SELECT l_returnflag,
               avg(l_extendedprice)         AS mu,
               stddev_samp(l_extendedprice) AS sd
        FROM lineitem GROUP BY l_returnflag)
    SELECT l.l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) FILTER (abs((l.l_extendedprice - s.mu) / s.sd) > 3)
                AS BIGINT) AS n_outliers,
           round(max(abs((l.l_extendedprice - s.mu) / s.sd)), 3) AS max_abs_z
    FROM lineitem l JOIN s USING (l_returnflag)
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
    doc="z-score outlier detection per group: group stats (mean, sample "
    "stddev) computed once, broadcast back onto the fact rows, |z| > 3 "
    "counted per flag. Two scans but only ONE shuffle (the tiny stats "
    "aggregate); the fact table is never repartitioned — the join is a "
    "broadcast. The standard anomaly gate before training-data ingest.",
)
def zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    stats = li.groupBy("l_returnflag").agg(
        F.avg("l_extendedprice").alias("mu"),
        F.stddev_samp("l_extendedprice").alias("sd"),
    )
    z = F.abs((F.col("l_extendedprice") - F.col("mu")) / F.col("sd"))
    return (
        # bounded: one row per l_returnflag (3-value enum)
        li.join(F.broadcast(stats), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.count(F.when(z > 3, 1)).alias("n_outliers"),
            F.round(F.max(z), 3).alias("max_abs_z"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "equi_depth_histogram",
    sql="""
    WITH bucketed AS (
        SELECT l_extendedprice,
               ntile(10) OVER (ORDER BY l_extendedprice) AS bucket
        FROM lineitem)
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(min(l_extendedprice), 2) AS lo,
           round(max(l_extendedprice), 2) AS hi,
           round(sum(l_extendedprice), 2) AS total
    FROM bucketed
    GROUP BY bucket
    ORDER BY bucket
    """,
    doc="equi-depth (decile) histogram: per-bucket count/min/max/sum. "
    "Tie-safe: rows straddling a bucket boundary are identical in the "
    "only aggregated column, so the output is invariant to tie order. "
    "The oracle keeps DuckDB's native ntile-over-sort; the Spark side "
    "deliberately does NOT use the single-task Window.orderBy ntile — "
    "buckets come from operators/ranking.global_rank + ntile_from_rank "
    "(range bucketing, per-bucket row_number, tiny prefix-sum offsets), "
    "so the exact equi-depth split stays distributed at 100 TB while "
    "still hashing identically against the windowed SQL formulation.",
)
def equi_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ranking import global_rank, ntile_from_rank

    li = _t(spark, sf_dir, "lineitem")
    pts = li.select("l_extendedprice", "l_orderkey", "l_linenumber")
    total = pts.agg(F.count("*").alias("__total"))
    ranked = global_rank(
        pts,
        "l_extendedprice",
        [F.asc("l_orderkey"), F.asc("l_linenumber")],
        rank_col="__rnk",
    )
    bucketed = ranked.crossJoin(F.broadcast(total)).select(
        "l_extendedprice",
        ntile_from_rank(F.col("__rnk"), F.col("__total"), 10).alias("bucket"),
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("l_extendedprice"), 2).alias("lo"),
            F.round(F.max("l_extendedprice"), 2).alias("hi"),
            F.round(F.sum("l_extendedprice"), 2).alias("total"),
        )
        .orderBy("bucket")
    )


@register(
    "key_skew_profile",
    sql="""
    WITH oc AS (
        SELECT CAST(count(*) AS DOUBLE) AS n FROM orders GROUP BY o_custkey),
    ev AS (
        SELECT CAST(count(*) AS DOUBLE) AS n FROM events GROUP BY user_id)
    SELECT 'orders.o_custkey' AS keyspace,
           CAST(count(*) AS BIGINT)       AS n_keys,
           CAST(max(n) AS BIGINT)         AS max_rows,
           round(avg(n), 4)               AS avg_rows,
           round(quantile_cont(n, 0.5), 4)  AS p50_rows,
           round(quantile_cont(n, 0.99), 4) AS p99_rows,
           round(max(n) / avg(n), 4)      AS skew_factor
    FROM oc
    UNION ALL
    SELECT 'events.user_id',
           CAST(count(*) AS BIGINT),
           CAST(max(n) AS BIGINT),
           round(avg(n), 4),
           round(quantile_cont(n, 0.5), 4),
           round(quantile_cont(n, 0.99), 4),
           round(max(n) / avg(n), 4)
    FROM ev
    ORDER BY keyspace
    """,
    doc="join/agg-key skew diagnosis — the profile you run BEFORE "
    "choosing a salting factor or trusting AQE's skew-join split: "
    "per-key row counts reduced to max/avg/p50/p99 and a max/avg skew "
    "factor, for the two natural join keys in the schema. Two partial "
    "aggregations (map-side combine on the key), each followed by a "
    "single-row reduce — no full-table sort, scale-safe.",
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    def profile(df: DataFrame, key: str, label: str) -> DataFrame:
        per_key = df.groupBy(key).agg(F.count("*").cast("double").alias("n"))
        return per_key.agg(
            F.lit(label).alias("keyspace"),
            F.count("*").cast("bigint").alias("n_keys"),
            F.max("n").cast("bigint").alias("max_rows"),
            F.round(F.avg("n"), 4).alias("avg_rows"),
            F.round(F.percentile("n", F.lit(0.5)), 4).alias("p50_rows"),
            F.round(F.percentile("n", F.lit(0.99)), 4).alias("p99_rows"),
            F.round(F.max("n") / F.avg("n"), 4).alias("skew_factor"),
        )

    o = _t(spark, sf_dir, "orders")
    e = _t(spark, sf_dir, "events")
    return (
        profile(o, "o_custkey", "orders.o_custkey")
        .unionByName(profile(e, "user_id", "events.user_id"))
        .orderBy("keyspace")
    )


from ..operators.sketches import hll_oracle_ctes  # noqa: E402  (oracle twin)

_HLL_REPORT_SQL = f"""
    WITH {hll_oracle_ctes("events", "user_id", "event_type", 64)},
    {hll_oracle_ctes("events", "user_id", "event_type", 1024)},
    exact AS (
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
        FROM events GROUP BY event_type)
    SELECT e.event_type, e.exact_users,
           round(h64.est, 4) AS hll_m64,
           round(h1024.est, 4) AS hll_m1024,
           round((round(h64.est, 4) - e.exact_users) / e.exact_users, 6)
               AS rel_err_m64,
           round((round(h1024.est, 4) - e.exact_users) / e.exact_users, 6)
               AS rel_err_m1024
    FROM exact e
    JOIN hll64_est h64 USING (event_type)
    JOIN hll1024_est h1024 USING (event_type)
    ORDER BY event_type
    """


@register(
    "hll_error_report",
    sql=_HLL_REPORT_SQL,
    doc="sketch accountability for HyperLogLog — now with the ESTIMATES "
    "themselves oracle-checked (r7, the cms_token_accuracy treatment): "
    "per-event-type exact distinct user counts vs a PORTABLE md5-based "
    "HLL (operators/sketches.hll_distinct_estimate) at two register "
    "counts (m=64, rsd~13%%; m=1024, rsd~3.3%%), with measured relative "
    "error.  The harmonic sum is frozen as an exact BIGINT so both "
    "engines compute bit-identical registers AND estimates; the unit "
    "test additionally pins |rel_err| within 3x each rsd.  Build is one "
    "hash + a |types|*m-cell max-groupBy — constant state, mergeable, "
    "the calibration report you run before trusting sketches at 100 TB.",
)
def hll_error_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import hll_distinct_estimate

    e = _t(spark, sf_dir, "events")
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_users")
    )
    e64 = hll_distinct_estimate(e, "user_id", ["event_type"], m=64)
    e1024 = hll_distinct_estimate(e, "user_id", ["event_type"], m=1024)
    rel = lambda est: F.round(  # noqa: E731
        (F.round(est, 4) - F.col("exact_users")) / F.col("exact_users"), 6
    )
    return (
        # bounded: both estimate relations are one row per event_type
        # (fixed enum); without the hint the post-aggregation join picks
        # a (harmless but pointless) SortMergeJoin
        exact.join(F.broadcast(e64.withColumnRenamed("est", "e64")), "event_type")
        .join(F.broadcast(e1024.withColumnRenamed("est", "e1024")), "event_type")
        .select(
            "event_type",
            "exact_users",
            F.round("e64", 4).alias("hll_m64"),
            F.round("e1024", 4).alias("hll_m1024"),
            rel(F.col("e64")).alias("rel_err_m64"),
            rel(F.col("e1024")).alias("rel_err_m1024"),
        )
        .orderBy("event_type")
    )
