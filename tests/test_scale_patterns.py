"""Scale-pattern tests: bucketed joins plan zero shuffles, salted joins
produce identical results to plain joins on skewed data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from .conftest import SF_SMALL


def test_bucketed_join_has_no_exchange(spark):
    from data_engineering_individual_assignment_spark.sinks.writers import (
        write_bucketed_table,
    )
    from data_engineering_individual_assignment_spark.sources.readers import load_table

    orders = load_table(spark, SF_SMALL, "orders")
    lineitem = load_table(spark, SF_SMALL, "lineitem")
    write_bucketed_table(orders, "orders_b", "o_orderkey", 8, sort_col="o_orderkey")
    write_bucketed_table(lineitem, "lineitem_b", "l_orderkey", 8, sort_col="l_orderkey")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        joined = (
            spark.table("orders_b")
            .join(
                spark.table("lineitem_b"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        join_section = plan.split("HashAggregate")[-1]  # below the agg
        assert "SortMergeJoin" in plan
        # bucketed-bucketed join: no shuffle feeds the join
        assert "Exchange" not in join_section, join_section[:2000]
        # cross-check the result against the unbucketed plan
        plain = (
            orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        # restore the SESSION policy (static broadcasts off — see
        # session.py), not the old 64m static threshold
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_salted_join_matches_plain_join(spark):
    from data_engineering_individual_assignment_spark.operators.skew import salted_join

    # pathological skew: 90% of probe rows share one key
    probe = spark.createDataFrame(
        [(i, 1 if i % 10 else i) for i in range(5000)], "row_id long, k long"
    )
    build = spark.createDataFrame(
        [(k, f"dim_{k}") for k in range(600)], "k long, attr string"
    )
    salted = salted_join(probe, build, "k", salt_factor=8, probe_salt_col="row_id")
    plain = probe.join(build, "k")
    assert sorted(map(tuple, salted.select("row_id", "k", "attr").collect())) == sorted(
        map(tuple, plain.select("row_id", "k", "attr").collect())
    )
