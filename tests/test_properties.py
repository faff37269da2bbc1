"""Property-style checks (SURVEY §5 item 4): the tricky semantics hold
for generated inputs, not just fixtures.  Hypothesis generates the
corpus; each property evaluates in ONE Spark job over the whole batch
(per-example Spark jobs would be seconds each)."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

# weird-but-legal text: semicolons, control chars, literal backslash
# escapes, emoji, accents, surroged-free unicode
TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=60
)


@settings(max_examples=5, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=40))
def test_clean_text_idempotent_and_ascii(spark, strings):
    from data_engineering_individual_assignment_spark.functions.cleaning import (
        clean_text,
    )

    df = spark.createDataFrame([(i, s) for i, s in enumerate(strings)], "id long, s string")
    out = df.select(
        "id",
        clean_text("s").alias("once"),
        clean_text(clean_text("s")).alias("twice"),
    ).collect()
    for r in out:
        assert r["once"] == r["twice"]  # idempotent
        assert all(ord(c) < 128 for c in r["once"])  # pure ASCII
        assert ";" not in r["once"]
        assert not any(c in r["once"] for c in "\t\n\r")


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(st.text(alphabet="abc ", min_size=0, max_size=5), min_size=0, max_size=8),
        min_size=1,
        max_size=30,
    )
)
def test_posexplode_rowcount_identity(spark, tag_lists):
    """Σ|tags per video| == rows of the long table, and ordinals are a
    1..n dense sequence per video (the C14 melt identity)."""
    rows = [(i, tags) for i, tags in enumerate(tag_lists)]
    df = spark.createDataFrame(rows, "video_id long, tags array<string>")
    long = df.select("video_id", F.posexplode("tags").alias("pos", "v"))
    assert long.count() == sum(len(t) for t in tag_lists)
    per_video = (
        long.groupBy("video_id")
        .agg(F.count("*").alias("n"), F.max("pos").alias("mx"), F.min("pos").alias("mn"))
        .collect()
    )
    for r in per_video:
        assert r["mn"] == 0 and r["mx"] == r["n"] - 1


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.datetimes(
            min_value=dt.datetime(1990, 1, 1), max_value=dt.datetime(2100, 1, 1)
        ),
        min_size=1,
        max_size=40,
    )
)
def test_iso_slash_date_roundtrip(spark, stamps):
    """ISO-8601 -> 'yyyy/MM/dd' string -> DateType recovers the calendar
    date (C5's string dates lose nothing at day granularity)."""
    from data_engineering_individual_assignment_spark.functions.cleaning import (
        iso_to_slash_date,
        slash_date_to_date,
    )

    rows = [(i, ts.strftime("%Y-%m-%dT%H:%M:%SZ"), ts.date()) for i, ts in enumerate(stamps)]
    df = spark.createDataFrame(rows, "id long, iso string, expected date")
    out = df.select(
        "id", "expected", slash_date_to_date(iso_to_slash_date("iso")).alias("back")
    ).collect()
    for r in out:
        assert r["back"] == r["expected"]


@settings(max_examples=3, deadline=None)
@given(st.integers(min_value=2, max_value=40))
def test_dropna_equivalence(spark, n):
    """na.drop == filter(isNotNull) on a generated null pattern (P4)."""
    rows = [(i, None if i % 3 == 0 else float(i)) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, v double")
    a = sorted(r["id"] for r in df.na.drop(subset=["v"]).collect())
    b = sorted(r["id"] for r in df.filter(F.col("v").isNotNull()).collect())
    assert a == b


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=60,
    )
)
def test_global_rank_property(spark, values):
    """For ANY finite double list (duplicates, negatives, constants),
    global_rank under (value asc, id asc) equals the single-window
    row_number — the operator's defining property."""
    from pyspark.sql import Window

    from data_engineering_individual_assignment_spark.operators.ranking import (
        global_rank,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id long, v double"
    )
    got = global_rank(df, "v", [F.asc("id")], rank_col="r", n_buckets=5)
    ref = df.withColumn(
        "r_ref",
        F.row_number().over(Window.orderBy(F.asc("v"), F.asc("id"))).cast("long"),
    )
    assert (
        got.join(ref, ["id", "v"]).filter(F.col("r") != F.col("r_ref")).count()
        == 0
    )


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=50,
    ),
    st.integers(min_value=1, max_value=50),
)
def test_exact_kth_smallest_property(spark, values, k_seed):
    """Histogram-refinement selection equals the brute sort at an
    arbitrary rank for ANY finite double list."""
    from data_engineering_individual_assignment_spark.operators.order_stats import (
        exact_kth_smallest,
    )

    k = (k_seed - 1) % len(values) + 1
    df = spark.createDataFrame([(v,) for v in values], "x double")
    assert exact_kth_smallest(df, "x", k) == sorted(values)[k - 1]
