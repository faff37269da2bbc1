"""The reference's daily DAG as ONE Spark job (SURVEY §3.1).

Reference task chain (final DAG 746):
    create_schema -> youtube_web_scraping -> save_scraped_data_to_s3
    -> save_scraped_data_to_postgres_db -> lambda_regression_model

Spark lifecycle replacing it: the fetch stage lands raw JSONL (out of
engine scope — Spark has no YouTube source, SURVEY §4.3); then a single
lazy plan normalizes, cleans, and writes each warehouse table as a
date-partitioned parquet overwrite (idempotent per day — the reference's
retry could double-insert, F:601-656), and the regression model runs as
an aggregation query whose 1-row result lands as a JSON artifact
(S11).  The only process boundaries left are driver->executors and
source/sink I/O; XCom/eval JSON round-trips (S13) are gone.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.regression import ols_fit
from .sinks.writers import (
    overwrite_day_partition,
    register_warehouse_view,
    write_json_artifact,
)
from .sources import youtube

WAREHOUSE_TABLES = (
    "video_descriptions",
    "video_statistics",
    "video_comments",
    "video_tags",
)


def daily_run(
    spark: SparkSession,
    landing: dict[str, str],
    warehouse_dir: str,
    day: str,
    ga_csv_path: str | None = None,
) -> dict[str, DataFrame]:
    """One scheduled run: landing JSONL -> 4 warehouse tables (idempotent
    day overwrite) -> regression artifact.  Returns the table DataFrames.

    ``landing`` maps {search, comments, stats, snippets} to paths;
    ``day`` is the reference's 'yyyy_MM_dd' run key (F:36-39).
    ``ga_csv_path``: when given, the Google-Analytics flat file loads as
    the 5th warehouse table ``website_statistics`` (active in the
    reference's v5, commented out in final — V5:577,649-660).
    """
    tables = youtube.normalize_all(
        spark,
        landing["search"],
        landing["comments"],
        landing["stats"],
        landing["snippets"],
    )
    if ga_csv_path is not None:
        from .sources.readers import read_ga_csv

        tables["website_statistics"] = read_ga_csv(spark, ga_csv_path).drop(
            "date_parsed"
        )
    for name, df in tables.items():
        overwrite_day_partition(df, os.path.join(warehouse_dir, name), day)
        register_warehouse_view(spark, name, os.path.join(warehouse_dir, name))

    # the Lambda model (views -> comments OLS + in-sample RMSE), straight
    # from the just-written statistics table — no collect, no separate
    # runtime.  (The held-out-split variant is operators.regression.evaluate;
    # a daily artifact fits on the full day's table.)
    stats = spark.read.parquet(os.path.join(warehouse_dir, "video_statistics"))
    xy = stats.select(F.col("views").alias("x"), F.col("comments").alias("y"))
    coefs = ols_fit(xy, "x", "y")
    scored = xy.crossJoin(F.broadcast(coefs))
    model = scored.agg(
        F.first("b0").alias("b0"),
        F.first("b1").alias("b1"),
        F.sqrt(F.avg(F.pow(F.col("b0") + F.col("b1") * F.col("x") - F.col("y"), 2))).alias("rmse"),
        F.count("*").alias("n"),
    )
    write_json_artifact(model, os.path.join(warehouse_dir, "regression_model", day))
    return tables


def model_http_response(spark: SparkSession, warehouse_dir: str, day: str) -> dict:
    """S12: the API-Gateway response the reference's Lambda returns
    (LF:94-109) — read the day's model artifact and wrap it.  The ONLY
    collect in the package, and it collects exactly one row, at the
    serving boundary where a single JSON document is the product."""
    import json

    df = spark.read.json(os.path.join(warehouse_dir, "regression_model", day))
    row = df.collect()[0].asDict()
    return {
        "statusCode": 200,
        "headers": {"Content-Type": "application/json"},
        "body": json.dumps(row),
    }
