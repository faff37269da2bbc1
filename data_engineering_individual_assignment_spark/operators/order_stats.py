"""Exact distributed order statistics by iterative histogram
refinement — the scale path to an EXACT median/quantile.

``sort + take k`` moves data; a single-partition window moves ALL of
it.  The classic alternative (Munro-Paterson style multi-pass
selection): histogram the value range, locate the bucket containing
the target rank from the (tiny) cumulative counts, recurse INTO that
bucket with tightened bounds.  Each round is one full scan with a
256-ary histogram aggregate (map-side combined, 256-row shuffle), and
the candidate range shrinks ~256x per round — 3-4 rounds pin any
double exactly, independent of data size.  Driver state per round is
one 256-row aggregate: no row data ever reaches the driver.

The terminal step sorts only the rows still inside the final bounds
(an equal-value tie group or a numerically tiny range) — bounded by
the largest tie group, not by n.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKETS = 256


def exact_kth_smallest(
    df: DataFrame, col: str, k: int, max_rounds: int = 8
) -> float:
    """The exact k-th smallest (1-based) value of ``df[col]`` (nulls
    excluded), via histogram bisection.  Raises on k out of range."""
    v = F.col(col).cast("double")
    vals = df.select(v.alias("v")).filter(F.col("v").isNotNull())
    row = vals.agg(
        F.count("*").alias("n"), F.min("v").alias("lo"), F.max("v").alias("hi")
    ).first()
    n, lo, hi = row["n"], row["lo"], row["hi"]
    if not 1 <= k <= n:
        raise ValueError(f"k={k} out of range 1..{n}")
    rank = k
    below = 0  # rows ranked below the current [lo, hi] candidate range
    for _ in range(max_rounds):
        if lo == hi:
            return lo
        width = (hi - lo) / _BUCKETS
        hist = (
            vals.filter((F.col("v") >= lo) & (F.col("v") <= hi))
            .select(
                F.least(
                    F.floor((F.col("v") - lo) / width).cast("int"),
                    F.lit(_BUCKETS - 1),
                ).alias("b")
            )
            .groupBy("b")
            .agg(F.count("*").alias("c"))
            .collect()
        )
        counts = {r["b"]: r["c"] for r in hist}
        cum = 0
        target = rank - below
        for b in range(_BUCKETS):
            c = counts.get(b, 0)
            if cum + c >= target:
                below += cum
                new_lo = lo + b * width
                new_hi = hi if b == _BUCKETS - 1 else lo + (b + 1) * width
                lo, hi = new_lo, new_hi
                break
            cum += c
        else:  # float-edge fallback: target sits past the last bucket
            break
        # if the remaining candidate set is one tie group, we're done
        if counts.get(b, 0) == 0:
            break
    # terminal: exact selection inside the final (tiny or tied) range
    remain = vals.filter((F.col("v") >= lo) & (F.col("v") <= hi))
    take = rank - below
    rows = remain.orderBy("v").limit(take).collect()
    return rows[-1]["v"]


def exact_median(df: DataFrame, col: str) -> float:
    """Lower median: the ceil(n/2)-th smallest value."""
    n = df.filter(F.col(col).isNotNull()).count()
    return exact_kth_smallest(df, col, (n + 1) // 2)
