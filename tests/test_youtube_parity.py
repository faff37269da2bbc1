"""Golden-parity tests for the YouTube nested-JSON normalization
(SURVEY §5.2): raw-shaped JSONL fixtures -> the 4 warehouse tables,
byte-compared against hand-derived expected rows that encode the
reference's pandas semantics (cleaning chain order, two-pass regex,
string dates, tag ordinals, reply flags, sort order)."""

from __future__ import annotations

import pytest

from data_engineering_individual_assignment_spark.sources import fixtures, youtube


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("yt_landing")
    paths = fixtures.write_fixtures(str(base))
    return youtube.normalize_all(
        spark, paths["search"], paths["comments"], paths["stats"], paths["snippets"]
    )


def test_video_descriptions(tables):
    rows = sorted(
        tuple(r) for r in tables["video_descriptions"].collect()
    )
    assert rows == sorted(
        [
            ("2021/03/05", "vidA", fixtures.NASTY_TITLE_CLEAN,
             "full description, of A  end"),
            ("2021/03/06", "vidB", "plain title B", "full B"),
            ("2021/04/01", "vidC", "title C", "full C"),
        ]
    )


def test_video_comments(tables):
    rows = sorted(tuple(r) for r in tables["video_comments"].collect())
    assert rows == sorted(
        [
            ("2021/03/05", "vidA", fixtures.NASTY_COMMENT_CLEAN, "Ali,ce ", 3, 0),
            ("2021/03/05", "vidA", "reply one", "Bob", 0, 1),
            ("2021/03/05", "vidA", "replytwo", "Cara", 1, 1),
            ("2021/03/06", "vidB", "no replies here", "Dee", 7, 0),
            ("2021/03/07", "vidB", "second page comment", "Eve", 2, 0),
        ]
    )


def test_video_statistics(tables):
    rows = sorted(tuple(r) for r in tables["video_statistics"].collect())
    assert rows == sorted(
        [
            ("vidA", 1000, 50, 2, 4),
            ("vidB", 200, 8, 0, 2),
            ("vidC", 31, 1, 0, 0),
        ]
    )
    # counters were JSON strings; schema must be long after the cast
    dtypes = dict(tables["video_statistics"].dtypes)
    assert dtypes["views"] == "bigint"


def test_video_tags_ordinals_and_sort(tables):
    # collect preserves the plan's orderBy: video_id DESC, tag_number ASC
    rows = [tuple(r) for r in tables["video_tags"].collect()]
    assert rows == [
        ("vidC", 1, "solo"),
        ("vidB", 1, ""),          # missing tags key -> [""] default (P5)
        ("vidA", 1, "tag one"),
        ("vidA", 2, "tag,two"),   # ';' -> ',' applied to tag values
        ("vidA", 3, "caf"),       # non-ASCII stripped
    ]


def test_comment_counts_match_stats(tables):
    """A1-style invariant: per-video comment rows == commentCount from the
    statistics endpoint (holds for this fixture)."""
    from pyspark.sql import functions as F

    counted = (
        tables["video_comments"].groupBy("video_id").agg(F.count("*").alias("n"))
    )
    joined = (
        tables["video_statistics"]
        .join(counted, "video_id", "left")
        .select("video_id", "comments", F.coalesce("n", F.lit(0)).alias("n"))
        .collect()
    )
    for r in joined:
        if r["video_id"] == "vidB":
            # vidB has 2 top-level; stats say 2
            assert r["n"] == r["comments"] == 2
    assert {r["video_id"]: r["n"] for r in joined}["vidC"] == 0
