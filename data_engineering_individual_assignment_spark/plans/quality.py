"""Data-quality / contract checks: a declarative expectation suite
(dbt-test / Great-Expectations style) and a CDC snapshot diff.

Scale notes:
- ``expectation_suite``: every check is a single aggregate or anti-join
  over one table — checks UNION into one result relation, so the whole
  suite is a handful of linear passes that AQE schedules together; no
  check materializes violating ROWS (counts only), so output is
  check-sized.  Uniqueness is count-vs-distinct-count (map-side partial
  agg), referential integrity is a broadcast anti-join when the parent
  side is dimension-sized.
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

    uniq = check(
        "orders.o_orderkey unique",
        orders.agg(
            F.count("*").alias("n_checked"),
            (F.count("*") - F.countDistinct("o_orderkey")).alias("n_violations"),
        ),
    )
    notnull = check(
        "orders.o_custkey not null",
        orders.agg(
            F.count("*").alias("n_checked"),
            F.sum(F.col("o_custkey").isNull().cast("long")).alias("n_violations"),
        ),
    )
    orphans = orders.join(
        F.broadcast(customer.select("c_custkey")),
        orders["o_custkey"] == customer["c_custkey"],
        "left_anti",
    ).agg(F.count("*").alias("n_violations"))
    refint = check(
        "orders.o_custkey references customer",
        orders.agg(F.count("*").alias("n_checked")).crossJoin(
            F.broadcast(orphans)
        ),
    )
    rng = check(
        "orders.o_totalprice in (0, 1e7)",
        orders.agg(
            F.count("*").alias("n_checked"),
            F.sum(
                ((F.col("o_totalprice") <= 0) | (F.col("o_totalprice") >= 1e7))
                .cast("long")
            ).alias("n_violations"),
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
    suite = uniq.unionByName(notnull).unionByName(refint).unionByName(rng)
    suite = suite.unionByName(accepted).unionByName(qty)
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
                 WHEN o.state <> n.state THEN 'changed'
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

    now_state = latest(events)
    old_state = latest(
        events.where(F.col("ts").cast("date") <= F.lit("2024-01-15").cast("date"))
    ).select(F.col("user_id"), F.col("state").alias("old_state"))
    joined = old_state.join(
        now_state.select("user_id", F.col("state").alias("new_state")),
        "user_id",
        "full_outer",
    )
    change = (
        F.when(F.col("old_state").isNull(), "added")
        .when(F.col("new_state").isNull(), "removed")
        .when(F.col("old_state") != F.col("new_state"), "changed")
        .otherwise("unchanged")
    )
    return (
        joined.select(change.alias("change"))
        .groupBy("change")
        .agg(F.count("*").alias("n_keys"))
        .orderBy("change")
    )
