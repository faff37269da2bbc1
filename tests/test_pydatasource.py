"""Spark 4 Python Data Source API (sources/pydatasource.py), the raw
text-lines source, and a dynamic-partition-pruning plan assertion."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_engineering_individual_assignment_spark.sources import pydatasource, readers
from data_engineering_individual_assignment_spark.sources.readers import load_table

from .conftest import SF_SMALL


def test_python_datasource_partitions_and_determinism(spark):
    pydatasource.register(spark)
    read = (
        lambda: spark.read.format("synthetic_events")
        .option("rowsPerPartition", 400)
        .option("numPartitions", 5)
        .load()
    )
    df = read()
    # one reader task per declared InputPartition — the scale contract
    assert df.rdd.getNumPartitions() == 5
    assert df.count() == 2000
    assert df.select("event_id").distinct().count() == 2000
    # retry-idempotence: a second scan is byte-identical
    assert df.exceptAll(read()).count() == 0
    kinds = {r.event_type for r in df.select("event_type").distinct().collect()}
    assert kinds <= {"view", "click", "purchase", "signup", "error"}
    bounds = df.agg(F.min("value"), F.max("value")).first()
    assert 0.0 <= bounds[0] and bounds[1] < 10.0


def test_python_datasource_composes_with_sql(spark):
    """The custom source is a first-class relation: SQL over it plans
    and aggregates like any table."""
    pydatasource.register(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("rowsPerPartition", 300)
        .option("numPartitions", 2)
        .load()
    )
    out = (
        df.groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .agg(F.sum("n"))
        .first()[0]
    )
    assert out == 600


def test_read_text_lines(spark, tmp_path):
    (tmp_path / "a.txt").write_text("one\ntwo\n")
    (tmp_path / "b.txt").write_text("three\n")
    rows = sorted(
        (r.value, r.source_file)
        for r in readers.read_text_lines(spark, str(tmp_path)).collect()
    )
    assert rows == [("one", "a.txt"), ("three", "b.txt"), ("two", "a.txt")]


def test_dynamic_partition_pruning_fires_on_partitioned_fact(spark, tmp_path):
    """Partition-column join against a filtered broadcast dim must plan a
    DynamicPruningExpression on the fact scan — the mechanism that keeps
    a 100 TB date-partitioned fact from being fully scanned when the dim
    filter selects a handful of partitions."""
    fact_dir = str(tmp_path / "fact")
    orders = load_table(spark, SF_SMALL, "orders")
    orders.withColumn("o_month", F.month("o_orderdate")).write.partitionBy(
        "o_month"
    ).mode("overwrite").parquet(fact_dir)

    fact = spark.read.parquet(fact_dir)
    dim = (
        fact.select("o_month")
        .distinct()
        .withColumn("keep", F.col("o_month") <= 2)
    )
    joined = fact.join(F.broadcast(dim.where("keep")), "o_month").agg(
        F.sum("o_totalprice").alias("s")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString().lower()
    assert "dynamicpruning" in plan
    # and the result is the manually-pruned aggregate
    expected = (
        fact.where(F.col("o_month") <= 2).agg(F.sum("o_totalprice")).first()[0]
    )
    assert abs(joined.first().s - expected) < 1e-6


def test_python_streaming_datasource_stream_equals_batch(spark, tmp_path):
    """The SimpleDataSourceStreamReader twin must deliver, across
    micro-batches, exactly the rows the batch generator yields for the
    same row range — exactly-once, no gaps, no duplicates."""
    pydatasource.register(spark)
    ckpt = str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("synthetic_events_stream")
        .option("rowsPerBatch", 70)
        .option("maxRows", 300)
        .load()
        .writeStream.format("memory")
        .queryName("synth_stream")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table("synth_stream")
    assert got.count() == 300
    batch = (
        spark.read.format("synthetic_events")
        .option("rowsPerPartition", 300)
        .option("numPartitions", 1)
        .load()
    )
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_python_streaming_datasource_resumes_from_checkpoint(spark, tmp_path):
    """Restarting against the same checkpoint continues from the
    committed offset: the union of the two runs is still exactly-once."""
    pydatasource.register(spark)
    ckpt = str(tmp_path / "ckpt2")
    out = str(tmp_path / "out")

    def run(max_rows: int):
        q = (
            spark.readStream.format("synthetic_events_stream")
            .option("rowsPerBatch", 50)
            .option("maxRows", max_rows)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run(120)
    assert spark.read.parquet(out).count() == 120
    run(250)
    final = spark.read.parquet(out)
    # second run resumed at the committed offset — the sink holds each
    # row exactly once across both runs
    assert final.count() == 250
    assert final.select("event_id").distinct().count() == 250
