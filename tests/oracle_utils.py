"""Differential-test harness mimicking the driver's correctness gate:
run each catalog query in Spark AND its oracle SQL in DuckDB on the same
parquet, then compare row count + column names + order-insensitive
canonical values."""

from __future__ import annotations

import datetime as dt
import math
import os

import duckdb

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def canon_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 12 significant digits: enough to catch real mismatches, immune
        # to sub-ulp noise left after explicit rounding in the queries
        return f"{v:.12g}"
    if isinstance(v, dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    return str(v)


def canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon_value(r[i]) for i in order) for r in rows)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Returns a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    rel = con.execute(sql)
    d_cols = [c[0] for c in rel.description]
    d_rows = rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"schema: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"rowcount: spark={len(s_rows)} duckdb={len(d_rows)}")
    sc = canon_rows(s_cols, s_rows)
    dc = canon_rows(d_cols, d_rows)
    if sc != dc:
        only_s = [r for r in sc if r not in set(dc)][:5]
        only_d = [r for r in dc if r not in set(sc)][:5]
        problems.append(
            f"values differ; spark-only(first5)={only_s} duckdb-only(first5)={only_d}"
        )
    return problems
