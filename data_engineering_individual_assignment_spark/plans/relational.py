"""Core relational surface (SURVEY §2.2-§2.8): scans, projections,
filters, joins (all flavors), aggregations, windows, sorts/top-k,
set ops, pivot/unpivot, JSON extraction.

The reference never executes joins/group-bys itself (it stops at loading
joinable tables into Postgres); this module provides the general query
capability its schema implies, exercised on the driver's TPC-H-ish tables.

Scale notes appear per query; the common themes:
- filters/projections are expressed before joins so Catalyst pushes them
  into the parquet scan (check: PushedFilters in .explain("formatted"));
- BOUNDED dimension tables (region=5, nation=25) are broadcast — no
  shuffle of the fact table for those star-join legs; sf-SCALING
  relations (customer, part: TPC-H ×sf ratios) are left unhinted so
  Catalyst/AQE picks BHJ below autoBroadcastJoinThreshold and degrades
  to SMJ — never OOM — when they outgrow executor memory at 100 TB;
- aggregations are partial+final automatically (map-side combine);
- top-k is orderBy+limit => TakeOrderedAndProject, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .catalog import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Aggregation (SURVEY §2.4) — TPC-H Q1-style pricing summary
# --------------------------------------------------------------------------
@register(
    "pricing_summary",
    sql="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT)                                   AS count_order,
           round(sum(l_quantity), 2)                                  AS sum_qty,
           round(sum(l_extendedprice), 2)                             AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)          AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)                                  AS avg_qty,
           round(avg(l_extendedprice), 4)                             AS avg_price,
           round(avg(l_discount), 4)                                  AS avg_disc
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: scan-filter-groupBy-agg; partial+final hash agg, "
    "filter pushed to parquet scan. Maps reference A1-A2 aggregates.",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("count_order"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        )
        .select(
            "l_returnflag", "l_linestatus", "count_order", "sum_qty",
            "sum_base_price", "sum_disc_price", "sum_charge",
            "avg_qty", "avg_price", "avg_disc",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Projection + filter (SURVEY §2.2, P1/P2 analog) with pushdown
# --------------------------------------------------------------------------
@register(
    "filter_project",
    sql="""
    SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS order_date,
           round(o_totalprice, 2) AS total_price
    FROM orders
    WHERE o_orderstatus = 'O'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_totalprice > 1000.0
    ORDER BY o_orderkey
    """,
    doc="P1/P2: column projection + row predicates; both pushed into the "
    "parquet scan (PushedFilters), so at 100 TB only matching row groups "
    "and 4 columns are read.",
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.col("o_orderstatus") == "O")
            & (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_totalprice") > 1000.0)
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.round("o_totalprice", 2).alias("total_price"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# Sort / top-k (SURVEY §2.6, O1)
# --------------------------------------------------------------------------
@register(
    "top_orders",
    sql="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total_price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
    doc="O1 + limit: orderBy+limit compiles to TakeOrderedAndProject "
    "(per-partition heap + driver merge of k rows) — no global sort at any "
    "scale. Tie-broken on o_orderkey for determinism.",
)
def top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("total_price"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Multi-key mixed-direction sort (O1 exact shape: F:437)
# --------------------------------------------------------------------------
@register(
    "multikey_sort",
    sql="""
    SELECT c_custkey, c_nationkey, c_mktsegment, round(c_acctbal, 2) AS acctbal
    FROM customer
    ORDER BY c_nationkey DESC, c_acctbal ASC, c_custkey ASC
    LIMIT 100
    """,
    doc="Reference O1: sort_values(by=[k1,k2], ascending=[False,True]) — "
    "multi-key mixed-direction sort (range-partitioned exchange when "
    "unlimited; TakeOrdered here).",
)
def multikey_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return (
        c.orderBy(F.col("c_nationkey").desc(), F.col("c_acctbal").asc(), F.col("c_custkey").asc())
        .select("c_custkey", "c_nationkey", "c_mktsegment", F.round("c_acctbal", 2).alias("acctbal"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# Joins (SURVEY §2.3) — star join with broadcast dimensions
# --------------------------------------------------------------------------
@register(
    "star_join_revenue",
    sql="""
    SELECT r.r_name, n.n_name,
           CAST(count(*) AS BIGINT)        AS num_orders,
           round(sum(o.o_totalprice), 2)   AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    ORDER BY r.r_name, n.n_name
    """,
    doc="video_id-star analog (§2.3): fact⋈dim equi-joins. nation/region "
    "(bounded: 25/5 rows) are broadcast-hinted; customer scales with sf "
    "so it is UNHINTED — AQE broadcasts it while it fits under the "
    "session threshold and flips to shuffle join beyond, instead of "
    "OOMing a pinned broadcast at 100 TB.",
)
def star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("num_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("r_name", "n_name")
    )


@register(
    "semi_join_customers",
    sql="""
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS num_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 40000.0)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    doc="left-semi join: customers having a >40k order; semi-join never "
    "duplicates the left side and only ships the join key of the right.",
)
def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 40000.0)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("num_customers"))
        .orderBy("c_mktsegment")
    )


@register(
    "anti_join_customers",
    sql="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
    doc="left-anti join: customers with no orders at all.",
)
def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "outer_join_nation_customers",
    sql="""
    SELECT n.n_name,
           CAST(count(c.c_custkey) AS BIGINT) AS num_customers,
           round(coalesce(sum(c.c_acctbal), 0.0), 2) AS total_acctbal
    FROM nation n
    LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
    doc="left outer join preserving empty dimensions (nations with zero "
    "customers still appear with count 0).",
)
def outer_join_nation_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    return (
        n.join(c, c.c_nationkey == n.n_nationkey, "left")
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").alias("num_customers"),
            F.round(F.coalesce(F.sum("c_acctbal"), F.lit(0.0)), 2).alias("total_acctbal"),
        )
        .orderBy("n_name")
    )


# --------------------------------------------------------------------------
# Window functions (SURVEY §2.5)
# --------------------------------------------------------------------------
@register(
    "rank_orders_per_customer",
    sql="""
    SELECT * FROM (
        SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS total_price,
               CAST(row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rnk
        FROM orders)
    WHERE rnk <= 3
    ORDER BY o_custkey, rnk
    """,
    doc="§2.5 ranking window: top-3 orders per customer via row_number. "
    "Single hash-partition shuffle on o_custkey; no global sort.",
)
def rank_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            F.row_number().over(w).cast("int").alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
        .orderBy("o_custkey", "rnk")
    )


@register(
    "events_moving_avg",
    sql="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               round(sum(value), 2) AS day_value
        FROM events GROUP BY 1, 2)
    SELECT event_type, day, day_value,
           round(avg(day_value) OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7
    FROM daily
    ORDER BY event_type, day
    """,
    doc="§2.5 frame-spec window: 7-day moving average of daily event value "
    "per type (the GA page_views moving-average shape from SURVEY §2.5).",
)
def events_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.round(F.sum("value"), 2).alias("day_value"))
    )
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    return (
        daily.select(
            "event_type",
            "day",
            "day_value",
            F.round(F.avg("day_value").over(w), 4).alias("ma7"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "lag_lead_order_gaps",
    sql="""
    WITH seq AS (
        SELECT o_custkey, CAST(o_orderdate AS DATE) AS order_date,
               lag(CAST(o_orderdate AS DATE)) OVER
                   (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_date
        FROM orders)
    SELECT o_custkey,
           CAST(count(*) AS BIGINT) AS num_gaps,
           CAST(max(date_diff('day', prev_date, order_date)) AS BIGINT) AS max_gap_days
    FROM seq WHERE prev_date IS NOT NULL
    GROUP BY o_custkey
    ORDER BY o_custkey
    """,
    doc="§2.5 analytic window (lag): per-customer inter-order gap stats.",
)
def lag_lead_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.lag(F.col("o_orderdate").cast("date")).over(w).alias("prev_date"),
    )
    return (
        seq.filter(F.col("prev_date").isNotNull())
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("num_gaps"),
            F.max(F.datediff("order_date", "prev_date")).cast("bigint").alias("max_gap_days"),
        )
        .orderBy("o_custkey")
    )


# --------------------------------------------------------------------------
# Set operations (SURVEY §2.7)
# --------------------------------------------------------------------------
@register(
    "set_ops_customers",
    sql="""
    WITH big_spenders AS (
        SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 50000.0),
    urgent AS (
        SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    SELECT 'both' AS segment, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT custkey FROM big_spenders INTERSECT SELECT custkey FROM urgent)
    UNION ALL
    SELECT 'big_only' AS segment, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT custkey FROM big_spenders EXCEPT SELECT custkey FROM urgent)
    UNION ALL
    SELECT 'either' AS segment, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT custkey FROM big_spenders UNION SELECT custkey FROM urgent)
    ORDER BY segment
    """,
    doc="§2.7 union/intersect/except over customer-key sets (the page-batch "
    "union-all of the reference generalized to full set algebra).",
)
def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 50000.0).select(
        F.col("o_custkey").alias("custkey")
    ).distinct()
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    ).distinct()
    both = big.intersect(urgent).agg(F.count("*").alias("n")).select(
        F.lit("both").alias("segment"), "n"
    )
    big_only = big.exceptAll(urgent).agg(F.count("*").alias("n")).select(
        F.lit("big_only").alias("segment"), "n"
    )
    either = big.union(urgent).distinct().agg(F.count("*").alias("n")).select(
        F.lit("either").alias("segment"), "n"
    )
    return both.unionByName(big_only).unionByName(either).orderBy("segment")


@register(
    "collect_sorted_lists",
    sql="""
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS n,
           array_to_string(list(c_custkey ORDER BY c_custkey), ',') AS custkeys
    FROM customer
    WHERE c_custkey < 200
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    doc="array aggregation (collect_list/array_agg): per-nation sorted "
    "key lists — sort inside the array makes the nondeterministic "
    "collection order canonical, and the array is serialized to a "
    "comma string so differential harnesses can hash/sort it "
    "(raw list columns are unhashable in pandas canonicalizers).",
)
def collect_sorted_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_custkey") < 200)
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n"),
            F.array_join(
                F.array_sort(F.collect_list("c_custkey")), ","
            ).alias("custkeys"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "first_last_order_dates",
    sql="""
    SELECT DISTINCT o_custkey,
           strftime(first_value(o_orderdate) OVER w, '%Y-%m-%d') AS first_order,
           strftime(last_value(o_orderdate)  OVER w, '%Y-%m-%d') AS last_order,
           CAST(count(*) OVER w AS BIGINT) AS n_orders
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey
    """,
    doc="first_value/last_value analytic windows with an explicit "
    "unbounded frame (last_value defaults to current-row frames — the "
    "classic trap) — per-customer order-history bounds.",
)
def first_last_order_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        o.select(
            "o_custkey",
            F.date_format(F.first("o_orderdate").over(w), "yyyy-MM-dd").alias("first_order"),
            F.date_format(F.last("o_orderdate").over(w), "yyyy-MM-dd").alias("last_order"),
            F.count("*").over(w).alias("n_orders"),
        )
        .distinct()
        .orderBy("o_custkey")
    )


@register(
    "bag_set_ops",
    sql="""
    WITH a AS (SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'A'),
         b AS (SELECT l_suppkey AS k FROM lineitem WHERE l_linestatus = 'O')
    SELECT 'intersect_all' AS op, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
    UNION ALL
    SELECT 'except_all' AS op, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
    ORDER BY op
    """,
    doc="multiset set ops (§2.7): intersectAll/exceptAll keep duplicate "
    "multiplicity (bag semantics), unlike the distinct forms in "
    "set_ops_customers.",
)
def bag_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select(F.col("l_suppkey").alias("k"))
    b = li.filter(F.col("l_linestatus") == "O").select(F.col("l_suppkey").alias("k"))
    inter = a.intersectAll(b).agg(F.count("*").alias("n")).select(
        F.lit("intersect_all").alias("op"), "n"
    )
    exc = a.exceptAll(b).agg(F.count("*").alias("n")).select(
        F.lit("except_all").alias("op"), "n"
    )
    return inter.unionByName(exc).orderBy("op")


# --------------------------------------------------------------------------
# Distinct / approx-distinct (SURVEY §2.4 extension)
# --------------------------------------------------------------------------
@register(
    "distinct_counts",
    sql="""
    SELECT CAST(count(DISTINCT l_partkey) AS BIGINT)  AS distinct_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT)  AS distinct_suppliers,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS distinct_orders
    FROM lineitem
    """,
    doc="exact distinct counts (expand-based count-distinct in Spark); the "
    "approx_count_distinct(HLL) variant is the scale path but is engine-"
    "specific so the oracle pins the exact one.",
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_suppliers"),
        F.countDistinct("l_orderkey").alias("distinct_orders"),
    )


# --------------------------------------------------------------------------
# Rollup / cube (SURVEY §2.4: grouping sets)
# --------------------------------------------------------------------------
@register(
    "rollup_orders",
    sql="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    doc="hierarchical subtotals via rollup (status -> status×priority -> "
    "grand total); Spark expands grouping sets in one pass.",
)
def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@register(
    "cube_lineitem",
    sql="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(l_quantity), 2) AS total_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="full cube over the two lineitem flags (all 4 grouping sets).",
)
def cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


# --------------------------------------------------------------------------
# Pivot / unpivot (SURVEY §2.8 C14 generalization)
# --------------------------------------------------------------------------
@register(
    "pivot_event_types",
    sql="""
    SELECT CAST(ts AS DATE) AS day,
           CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
    doc="pivot: long->wide daily counts per event type. Values list is "
    "pinned so Spark skips the extra distinct-discovery job.",
)
def pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    df = (
        e.groupBy(F.col("ts").cast("date").alias("day"))
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
        .na.fill(0, kinds)
        .orderBy("day")
    )
    return df


@register(
    "unpivot_part_attrs",
    sql="""
    SELECT p_partkey, attr, val FROM (
        SELECT p_partkey, 'size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
        UNION ALL
        SELECT p_partkey, 'retailprice' AS attr, round(p_retailprice, 2) AS val FROM part)
    ORDER BY p_partkey, attr
    """,
    doc="unpivot/melt (reference C14's generic form, pandas melt F:435): "
    "wide part attributes -> long (key, attr, val) via Spark unpivot.",
)
def unpivot_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    wide = p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.round("p_retailprice", 2).alias("retailprice"),
    )
    return (
        wide.unpivot("p_partkey", ["size", "retailprice"], "attr", "val")
        .orderBy("p_partkey", "attr")
    )


# --------------------------------------------------------------------------
# JSON extraction (SURVEY §2.8 C11)
# --------------------------------------------------------------------------
@register(
    "json_extract_events",
    sql="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS total_k,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="C11 from_json: parse the events.props JSON string with an explicit "
    "schema and aggregate an extracted field. At scale from_json runs "
    "JVM-side inside codegen — no Python.",
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    parsed = e.select(
        "event_type", F.from_json("props", "k BIGINT").alias("p")
    )
    return (
        parsed.groupBy("event_type")
        .agg(F.sum("p.k").alias("total_k"), F.count("*").alias("n"))
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Exact percentiles / median (SURVEY §2.4 extension)
# --------------------------------------------------------------------------
@register(
    "percentiles_by_flag",
    sql="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4)  AS p50_price,
           round(quantile_cont(l_extendedprice, 0.9), 4)  AS p90_price,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="exact continuous percentiles per group (Spark percentile == DuckDB "
    "quantile_cont, linear interpolation). percentile_approx(KLL/GK) is the "
    "100 TB path; the oracle pins the exact variant.",
)
def percentiles_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # ONE array-valued percentile aggregate: three scalar percentile()
    # calls each buffer and sort the group's values independently
    # (3x the memory and sort work per aggregation buffer); the array
    # form buffers once and reads three ranks out of the same sort.
    p = F.percentile(
        "l_extendedprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))
    )
    return (
        li.groupBy("l_returnflag")
        .agg(p.alias("ps"))
        .select(
            "l_returnflag",
            F.round(F.col("ps")[0], 4).alias("p50_price"),
            F.round(F.col("ps")[1], 4).alias("p90_price"),
            F.round(F.col("ps")[2], 4).alias("p99_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "distribution_windows",
    sql="""
    SELECT o_orderkey, o_orderpriority,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cum_dist
    FROM orders
    WHERE o_orderkey < 500
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderkey
    """,
    doc="distribution window functions (§2.5): percent_rank + cume_dist "
    "of order value within each priority class — unique (price, key) "
    "ordering makes both deterministic across engines.",
)
def distribution_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").asc())
    )
    return (
        o.filter(F.col("o_orderkey") < 500)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cum_dist"),
        )
        .orderBy("o_orderkey")
    )
