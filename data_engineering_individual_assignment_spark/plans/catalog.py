"""Query catalog: the single registry behind ``__spark_entry__.py``.

Every operator from SURVEY §2 (plus the §2.11 LLM-pipeline extensions) is
registered here as a ``Query``: a PySpark plan builder plus, when the
semantics are SQL-expressible, the equivalent ANSI SQL that DuckDB runs on
the same parquet for the differential-correctness gate.

Determinism rules every query obeys (so the order-insensitive value hash
matches across engines):
- every computed column is aliased identically in Spark and SQL;
- floating-point aggregates are rounded (sum-order differs across engines);
- timestamps are projected as dates or strings (time-zone neutrality);
- count()/sum(int) are BIGINT on both sides (DuckDB sum(int) is HUGEINT —
  oracle SQL casts it).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: SparkFn
    sql: str | None  # DuckDB oracle; None => non-SQL-expressible (weaker check)
    doc: str = ""


CATALOG: dict[str, Query] = {}


def register(name: str, sql: str | None = None, doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame plan builder."""

    def deco(fn: SparkFn) -> SparkFn:
        if name in CATALOG:
            raise ValueError(f"duplicate query name: {name}")
        CATALOG[name] = Query(name=name, fn=fn, sql=sql, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def queries() -> dict[str, SparkFn]:
    return {q.name: q.fn for q in CATALOG.values()}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.sql for q in CATALOG.values() if q.sql is not None}
