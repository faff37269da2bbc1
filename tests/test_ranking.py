"""operators/ranking: distributed global rank + exact ntile derivation.

The invariant under test: global_rank must agree ROW-FOR-ROW with the
single-task `row_number() over (order by ...)` it replaces, and
ntile_from_rank must reproduce `F.ntile(k)` exactly (including the
uneven first-bucket split) for awkward n/k combinations.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_engineering_individual_assignment_spark.operators.ranking import (
    global_rank,
    ntile_from_rank,
)
from data_engineering_individual_assignment_spark.sources.readers import load_table

from .conftest import SF_SMALL


def test_global_rank_agrees_with_single_window(spark):
    o = load_table(spark, SF_SMALL, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    scalable = global_rank(
        o, "o_totalprice", [F.asc("o_orderkey")], ascending=False,
        rank_col="r", n_buckets=7,
    )
    reference = o.withColumn(
        "r_ref",
        F.row_number()
        .over(Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")))
        .cast("long"),
    )
    diff = (
        scalable.join(reference, ["o_orderkey", "o_totalprice"])
        .filter(F.col("r") != F.col("r_ref"))
        .count()
    )
    assert diff == 0
    assert scalable.count() == o.count()


def test_global_rank_no_single_task_window(spark):
    """The row-scale row_number window must be PARTITIONED by the
    bucket column.  In windowspecdefinition(...) partition expressions
    appear first WITHOUT a sort direction, so the partitioned spec
    renders as `windowspecdefinition(__bkt#N, <order> ASC ...` while a
    partition-less spec ordering by __bkt would render __bkt WITH a
    direction (`__bkt#N ASC`).  The tiny offsets prefix-sum window is
    legitimately partition-less (it runs over n_buckets rows)."""
    import re as _re

    o = load_table(spark, SF_SMALL, "orders")
    plan = global_rank(
        o, "o_orderkey", [], n_buckets=4
    )._jdf.queryExecution().optimizedPlan().toString()
    rn_lines = [
        line
        for line in plan.splitlines()
        if "row_number()" in line and "windowspecdefinition" in line
    ]
    assert rn_lines, "row_number window missing from plan"
    for line in rn_lines:
        assert _re.search(r"windowspecdefinition\(__bkt#\d+L?,", line), (
            f"row_number window not partitioned by __bkt: {line}"
        )


def test_global_rank_empty_input(spark):
    o = load_table(spark, SF_SMALL, "orders").filter(F.lit(False))
    assert global_rank(o, "o_orderkey", []).count() == 0


def test_ntile_from_rank_matches_builtin(spark):
    # n=103, k=10 → first 3 buckets get 11 rows; also k=7 and k > n.
    df = spark.range(1, 104).withColumn("r", F.col("id"))
    total = F.lit(103)
    for k in (10, 7, 150):
        got = df.select(
            "id",
            ntile_from_rank(F.col("r"), total, k).alias("b"),
            F.ntile(k).over(Window.orderBy("id")).alias("b_ref"),
        )
        assert got.filter(F.col("b") != F.col("b_ref")).count() == 0


def test_global_rank_constant_primary(spark):
    """All-equal primary (span == 0): every row lands in bucket 0 —
    degenerate parallelism but ranks must still be exact via the
    tiebreaks."""
    df = spark.createDataFrame([(i, 7.0) for i in range(40)], "id long, v double")
    got = {r.id: r.r for r in global_rank(df, "v", [F.asc("id")], rank_col="r").collect()}
    assert got == {i: i + 1 for i in range(40)}
