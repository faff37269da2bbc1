"""End-to-end daily pipeline test (SURVEY §3.1): landing fixtures ->
warehouse parquet -> SQL over the star schema -> model artifact.
Also covers the GA flat file (S7) + nearest-date as-of enrichment."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    from data_engineering_individual_assignment_spark import pipeline
    from data_engineering_individual_assignment_spark.sources import fixtures

    base = tmp_path_factory.mktemp("landing")
    wh = str(tmp_path_factory.mktemp("warehouse"))
    paths = fixtures.write_fixtures(str(base))
    tables = pipeline.daily_run(
        spark,
        {"search": paths["search"], "comments": paths["comments"],
         "stats": paths["stats"], "snippets": paths["snippets"]},
        wh,
        day="2026_08_13",
    )
    return wh, tables


def test_warehouse_tables_written_and_queryable(spark, warehouse):
    wh, _ = warehouse
    # the video_id star join the reference's schema implies (§2.3)
    out = spark.sql(
        """
        SELECT d.video_id, d.video_title, s.views,
               count(c.comment) AS n_comments,
               count(DISTINCT t.tag_value) AS n_tags
        FROM video_descriptions d
        JOIN video_statistics s ON d.video_id = s.video_id
        LEFT JOIN video_comments c ON d.video_id = c.video_id
        LEFT JOIN video_tags t ON d.video_id = t.video_id
        GROUP BY d.video_id, d.video_title, s.views
        ORDER BY d.video_id
        """
    ).collect()
    assert [r["video_id"] for r in out] == ["vidA", "vidB", "vidC"]
    by_id = {r["video_id"]: r for r in out}
    assert by_id["vidA"]["views"] == 1000
    assert by_id["vidB"]["n_comments"] == 2
    assert by_id["vidC"]["n_comments"] == 0


def test_daily_rerun_is_idempotent(spark, warehouse):
    wh, _ = warehouse
    from data_engineering_individual_assignment_spark import pipeline
    from data_engineering_individual_assignment_spark.sources import fixtures
    import tempfile

    with tempfile.TemporaryDirectory() as base:
        paths = fixtures.write_fixtures(base)
        n_before = spark.read.parquet(f"{wh}/video_comments").count()
        pipeline.daily_run(
            spark,
            {"search": paths["search"], "comments": paths["comments"],
             "stats": paths["stats"], "snippets": paths["snippets"]},
            wh,
            day="2026_08_13",  # same day again — the retry scenario
        )
        assert spark.read.parquet(f"{wh}/video_comments").count() == n_before


def test_model_artifact_written(spark, warehouse):
    wh, _ = warehouse
    model = spark.read.json(f"{wh}/regression_model/2026_08_13")
    row = model.collect()[0]
    assert row["n"] == 3
    assert row["b1"] is not None and row["rmse"] is not None


def test_ga_csv_and_asof_enrichment(spark, warehouse, tmp_path):
    """S7 + the nearest-date GA lookup (SURVEY §4.3): comments enriched
    with the most recent website_statistics row at-or-before their date."""
    from data_engineering_individual_assignment_spark.operators.joins import asof_join
    from data_engineering_individual_assignment_spark.sources.readers import read_ga_csv

    wh, tables = warehouse
    ga_path = str(tmp_path / "ga.csv")
    with open(ga_path, "w") as fh:
        fh.write(
            "date,average_session_duration,bounce_rate,new_users,"
            "number_of_sessions_per_user,pages_per_session,page_views,users\n"
            "04/03/2021,120.5,0.4,10,1.2,3.4,500,40\n"
            "06/03/2021,130.0,0.35,12,1.3,3.6,600,45\n"
        )
    ga = read_ga_csv(spark, ga_path)
    assert dict(ga.dtypes)["date_parsed"] == "date"

    comments = tables["video_comments"].withColumn(
        "comment_date", F.to_date("date", "yyyy/MM/dd")
    ).withColumn("join_key", F.lit(1)).withColumn(
        "comment_id", F.monotonically_increasing_id()
    )
    enriched = asof_join(
        comments,
        ga.withColumn("join_key", F.lit(1)),
        left_ts="comment_date",
        right_ts="date_parsed",
        left_by="join_key",
        right_by="join_key",
        left_id="comment_id",
    )
    rows = enriched.select("comment_date", "page_views").collect()
    for r in rows:
        d = str(r["comment_date"])
        if d < "2021-03-04":
            assert r["page_views"] is None
        elif d < "2021-03-06":
            assert r["page_views"] == 500   # nearest GA day: 04/03
        else:
            assert r["page_views"] == 600   # nearest GA day: 06/03
