"""As-of (nearest-key) join — the one join flavor Spark SQL lacks natively
(SURVEY §4.3: the GA nearest-date enrichment implied by the reference's
date-linked schema, DDL ``...final.py:87-111``).

Two implementations:

- ``asof_join``: range-join + row_number pick.  Deterministic (explicit
  tie-break), oracle-friendly, fully declarative so Catalyst can push
  filters.  Cost: the range join expands each left row by the number of
  matching right rows within its by-key before the window prunes to 1 —
  fine when per-key right cardinality is bounded (dimension history,
  daily GA rows), which is the reference's shape.
- ``asof_join_pandas``: co-grouped ``pd.merge_asof`` per by-key via
  ``cogroup().applyInPandas`` (Arrow-batched).  Linear per group after
  the shuffle + sort; the 100 TB path when per-key fan-out would make
  the range join quadratic.  Same semantics (backward direction: latest
  right row with ts <= left ts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    left_by: str,
    right_by: str,
    left_id: str,
    tie_break: str | None = None,
    how: str = "left",
) -> DataFrame:
    """Backward as-of join: for each left row, the single right row with
    the greatest ``right_ts`` <= ``left_ts`` within the matching by-key.

    ``left_id`` must uniquely identify left rows (window partition key).
    ``tie_break``: right column ordered DESC to break equal-``right_ts``
    ties deterministically.
    """
    cond = (F.col(f"l.{left_by}") == F.col(f"r.{right_by}")) & (
        F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}")
    )
    joined = left.alias("l").join(right.alias("r"), cond, how)
    order = [F.col(f"r.{right_ts}").desc_nulls_last()]
    if tie_break:
        order.append(F.col(f"r.{tie_break}").desc_nulls_last())
    w = Window.partitionBy(F.col(f"l.{left_id}")).orderBy(*order)
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    left_by: str,
    right_by: str,
    right_cols: list[str],
) -> DataFrame:
    """Scale-path as-of join: both sides are hash-partitioned on the
    by-key, then ``pd.merge_asof`` runs once per co-grouped key pair.

    Output schema: all left columns + ``right_cols`` (nullable).
    ``right_ts`` must be distinct from every left column name.
    """
    import pandas as pd

    r_fields = {f.name: f for f in right.schema.fields}
    out_schema = T.StructType(
        list(left.schema.fields)
        + [T.StructField(c, r_fields[c].dataType, True) for c in right_cols]
    )
    out_cols = [f.name for f in out_schema.fields]
    right_slim = right.select(right_by, right_ts, *right_cols)

    def merge_groups(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame(columns=out_cols)
        lpdf = lpdf.sort_values(left_ts)
        if rpdf.empty:
            for c in right_cols:
                lpdf[c] = None
            return lpdf[out_cols]
        rpdf = rpdf.sort_values(right_ts)
        merged = pd.merge_asof(
            lpdf,
            rpdf[[right_ts, *right_cols]],
            left_on=left_ts,
            right_on=right_ts,
            direction="backward",
        )
        return merged[out_cols]

    return (
        left.groupBy(left_by)
        .cogroup(right_slim.groupBy(right_by))
        .applyInPandas(merge_groups, schema=out_schema)
    )
