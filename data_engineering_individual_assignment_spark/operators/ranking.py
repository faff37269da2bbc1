"""Scalable global ranking: bucketed rank assignment without a
single-task window.

``Window.orderBy(...)`` with no ``partitionBy`` is the classic silent
scale-killer: Spark moves EVERY row into one task to number them, so a
global ``row_number``/``ntile`` that is instant at sf0.1 is a straight
OOM at 100 TB.  (A global ``orderBy`` SORT is fine — that is
range-partitioned — it is only the windowed *numbering* that
single-tasks.)

``global_rank`` keeps the numbering distributed AND deterministic:

1. Bucket every row by its ranking value against ``n_buckets``
   equal-width boundaries derived from a broadcast 1-row min/max
   aggregate.  The bucket is a PURE FUNCTION OF THE ROW DATA — unlike
   ``repartitionByRange + spark_partition_id()``, which this module
   first tried and which is NOT stable across plan branches (AQE may
   coalesce the range exchange differently in the offsets branch vs
   the output branch, silently misaligning partition ids; observed at
   sf0.01 as ranks exceeding the row count).
2. ``row_number`` over ``Window.partitionBy(bucket).orderBy(keys)`` —
   per-bucket, embarrassingly parallel, one hash exchange.
3. Per-bucket counts (``groupBy(bucket)`` — n_buckets rows, tiny)
   prefix-summed into starting offsets with a window over that TINY
   relation, broadcast-joined back.

global rank = local row_number + bucket offset.  Buckets respect the
primary sort order (every row in bucket b sorts before every row in
bucket b+1), so the concatenation of per-bucket orderings is the
global ordering.

Caveats by design:
- The primary ranking column must be numeric and non-null; ties on it
  are broken by ``tiebreaks`` (callers must make the full key unique,
  same as any deterministic ``row_number``).
- Equal-width buckets trade balance for determinism: a skewed value
  distribution concentrates rows in few buckets (correctness is
  unaffected — only parallelism).  Production note: quantile-sketch
  boundaries balance better but ``percentile_approx`` partial-merge
  order is not guaranteed reproducible across plan branches, which
  would reintroduce exactly the bug above; if you want quantile
  boundaries, compute them in a SEPARATE job and pass literals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    primary: str,
    tiebreaks: list[Column],
    ascending: bool = True,
    rank_col: str = "rank",
    n_buckets: int = 64,
) -> DataFrame:
    """Append a 1-based global ``row_number`` under the total order
    (``primary`` asc/desc, then ``tiebreaks``) without a single-task
    window.  Returns ``df``'s columns + ``rank_col``."""
    bounds = df.agg(
        F.min(F.col(primary).cast("double")).alias("__lo"),
        F.max(F.col(primary).cast("double")).alias("__hi"),
    )
    v = F.col(primary).cast("double")
    span = F.col("__hi") - F.col("__lo")
    raw = F.when(span > 0, F.floor((v - F.col("__lo")) / span * n_buckets)).otherwise(
        F.lit(0)
    )
    clamped = F.least(F.greatest(raw, F.lit(0)), F.lit(n_buckets - 1))
    bucket = clamped if ascending else (F.lit(n_buckets - 1) - clamped)
    order = [F.asc(primary) if ascending else F.desc(primary), *tiebreaks]
    bucketed = (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("__bkt", bucket.cast("int"))
        .drop("__lo", "__hi")
    )
    local = bucketed.withColumn(
        "__rn",
        F.row_number().over(Window.partitionBy("__bkt").orderBy(*order)),
    )
    # tiny: one row per bucket — the prefix-sum window is over n_buckets
    # rows, so single-task is fine HERE.
    offsets = (
        bucketed.groupBy("__bkt")
        .agg(F.count("*").alias("__n"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__n").over(
                    Window.orderBy("__bkt").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("__bkt", "__off")
    )
    return (
        local.join(F.broadcast(offsets), "__bkt")
        .withColumn(rank_col, (F.col("__rn") + F.col("__off")).cast("long"))
        .drop("__bkt", "__rn")
    )


def ntile_from_rank(rank: Column, total: Column, k: int) -> Column:
    """Exact ``ntile(k)`` bucket (1-based) from a 1-based global rank
    and the total row count — the SQL-standard split where the first
    ``total % k`` buckets get ``ceil(total/k)`` rows and the rest get
    ``floor(total/k)``.  Pure column arithmetic: composes with
    ``global_rank`` into a fully distributed ntile."""
    q = F.floor(total / F.lit(k)).cast("long")
    rem = (total % k).cast("long")
    big = rem * (q + 1)  # rows living in the (q+1)-sized buckets
    in_big = (rank <= big)
    bucket_big = F.floor((rank - 1) / (q + 1)) + 1
    bucket_small = rem + F.floor((rank - 1 - big) / F.greatest(q, F.lit(1))) + 1
    return F.when(in_big, bucket_big).otherwise(bucket_small).cast("int")
