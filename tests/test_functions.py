"""Column-function unit tests: cleaning chain edge cases and the
demojize import gate."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_clean_text_two_pass_semantics(spark):
    from data_engineering_individual_assignment_spark.functions.cleaning import (
        clean_text,
    )

    rows = [
        (1, "a;b"),                 # C1
        (2, "café ☕"),             # C2
        (3, "x\\ty real\ttab"),     # C3 two-pass: literal then real
        (4, None),                  # null propagates
        (5, ""),                    # empty stays empty
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    out = {r["id"]: r["c"] for r in df.select("id", clean_text("s").alias("c")).collect()}
    assert out[1] == "a,b"
    assert out[2] == "caf "
    assert out[3] == "xy realtab"
    assert out[4] is None
    assert out[5] == ""


def test_demojize_gate_returns_none_without_lib(spark):
    from data_engineering_individual_assignment_spark.functions.cleaning import (
        demojize_udf,
    )

    udf = demojize_udf()
    if udf is None:
        # expected in this container: the pipeline skips the step, like
        # the reference's commented-out demojize (F:181-182)
        assert udf is None
    else:  # environment has the lib: it must behave
        df = spark.createDataFrame([("hi",)], "s string")
        assert df.select(udf("s")).collect()[0][0] == "hi"


def test_fingerprint_normalizes(spark):
    from data_engineering_individual_assignment_spark.functions.text import fingerprint

    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "  hello world "), (3, "hello worlds")],
        "id long, s string",
    )
    fps = {r["id"]: r["fp"] for r in df.select("id", fingerprint("s").alias("fp")).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]
