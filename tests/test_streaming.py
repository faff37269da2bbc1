"""Structured Streaming tests: stream == batch on the same input,
exactly-once incremental ingest, custom stateful operator."""

from __future__ import annotations

import os

import pytest

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def landing(spark, tmp_path_factory):
    from data_engineering_individual_assignment_spark.streaming import windows as W

    d = str(tmp_path_factory.mktemp("events_landing"))
    W.stage_events(spark, SF_SMALL, d)
    return d


def _canon(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_tumbling_stream_equals_batch(spark, landing):
    from data_engineering_individual_assignment_spark import plans
    from data_engineering_individual_assignment_spark.streaming import windows as W

    stream_out = W.run_to_memory(
        spark, W.tumbling_counts_stream(W.stream_events(spark, landing))
    )
    batch_out = plans.CATALOG["tumbling_window_counts"].fn(spark, SF_SMALL)
    cols = ["window_day", "event_type", "n", "total_value"]
    assert _canon(stream_out, cols) == _canon(batch_out, cols)


def test_sliding_stream_equals_batch(spark, landing):
    from data_engineering_individual_assignment_spark import plans
    from data_engineering_individual_assignment_spark.streaming import windows as W

    stream_out = W.run_to_memory(
        spark, W.sliding_counts_stream(W.stream_events(spark, landing))
    )
    batch_out = plans.CATALOG["sliding_window_counts"].fn(spark, SF_SMALL)
    cols = ["window_day", "n", "total_value"]
    assert _canon(stream_out, cols) == _canon(batch_out, cols)


def test_session_windows_stream(spark, landing):
    from data_engineering_individual_assignment_spark.streaming import windows as W

    out = W.run_to_memory(spark, W.session_counts_stream(W.stream_events(spark, landing)))
    rows = out.collect()
    assert len(rows) > 0
    # session invariants: end > start, positive event counts
    for r in rows:
        assert r["session_end"] > r["session_start"]
        assert r["n_events"] >= 1


def test_incremental_ingest_exactly_once(spark, landing, tmp_path):
    from data_engineering_individual_assignment_spark.streaming import windows as W

    wh = str(tmp_path / "warehouse")
    ck = str(tmp_path / "ckpt")
    W.incremental_ingest(spark, landing, wh, ck)
    n1 = spark.read.parquet(wh).count()
    expected = spark.read.parquet(landing).count()
    assert n1 == expected
    # re-run with the same checkpoint: no new files -> no duplicates
    # (the reference's retry could double-append; this can't)
    W.incremental_ingest(spark, landing, wh, ck)
    n2 = spark.read.parquet(wh).count()
    assert n2 == expected
    # partition layout: ingest_date=... directories exist
    assert any(p.startswith("ingest_date=") for p in os.listdir(wh))


def test_running_totals_stateful(spark, landing):
    from pyspark.sql import functions as F

    from data_engineering_individual_assignment_spark.streaming import windows as W

    out = W.run_to_memory(
        spark,
        W.running_totals_stateful(W.stream_events(spark, landing)),
        mode="update",
    )
    # the LAST emitted row per user must equal the batch totals
    batch = (
        spark.read.parquet(landing)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
    )
    # memory sink in update mode appends every emission; take max n_events
    final = (
        out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("total_value").alias("total_value"),
        )
    )
    b = {r["user_id"]: (r["n_events"], round(r["total_value"], 6)) for r in batch.collect()}
    s = {r["user_id"]: (r["n_events"], round(r["total_value"], 6)) for r in final.collect()}
    assert b == s
