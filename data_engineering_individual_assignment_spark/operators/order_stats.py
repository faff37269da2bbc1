"""Exact distributed order statistics by iterative histogram
refinement — the scale path to an EXACT median/quantile.

``sort + take k`` moves data; a single-partition window moves ALL of
it.  The classic alternative (Munro-Paterson style multi-pass
selection): histogram the value range, locate the bucket containing
the target rank from the (tiny) cumulative counts, recurse INTO that
bucket with tightened bounds.  Each round is one full scan with a
256-ary histogram aggregate (map-side combined, 256-row shuffle), and
the candidate range shrinks ~256x per round — a handful of rounds pin
any double, independent of data size.  Driver state per round is one
256-row aggregate: no row data ever reaches the driver.

Correctness subtlety: candidate membership is tracked by REPLAYING the
exact bucket expressions chosen so far (a conjunction of
``bucket_expr(lo, width) == b`` predicates), NOT by re-filtering on
arithmetic bounds ``v >= lo + b*width``.  The two disagree within one
ulp of a bucket boundary (``floor((v-lo)/width)`` can land a row in
bucket b while ``v < lo + b*width`` under IEEE rounding), which
double-counts or drops boundary rows and silently shifts the selected
rank — found by a boundary-value search during review.  Replaying the
identical float expression makes membership match the histogram counts
bit-for-bit.

The terminal step sorts only the rows still matching the predicate —
entered as soon as the candidate set is small (or rounds are
exhausted, e.g. one giant tie group), so it is bounded by
max(tie group, 4096), never by n.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 256
_TERMINAL = 4096  # candidate count below which we just sort


def _bucket_expr(v: Column, lo: float, width: float) -> Column:
    # clamp BOTH ends: a row at the lower edge of the refined range can
    # compute floor() == -1 within one ulp, and the max value lands at
    # _BUCKETS; clamping keeps every candidate countable and the count
    # and membership expressions identical.
    return F.greatest(
        F.least(
            F.floor((v - F.lit(lo)) / F.lit(width)).cast("int"),
            F.lit(_BUCKETS - 1),
        ),
        F.lit(0),
    )


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
    pred = F.lit(True)
    below = 0  # rows ranked below the current candidate set
    remaining = n
    vcol = F.col("v")
    for _ in range(max_rounds):
        if lo == hi or remaining <= _TERMINAL:
            break
        width = (hi - lo) / _BUCKETS
        if width <= 0:  # range narrower than one ulp
            break
        bexpr = _bucket_expr(vcol, lo, width)
        hist = (
            vals.filter(pred)
            .select(bexpr.alias("b"))
            .groupBy("b")
            .agg(F.count("*").alias("c"))
            .collect()
        )
        counts = {r["b"]: r["c"] for r in hist}
        cum = 0
        target = k - below
        for b in range(_BUCKETS):
            c = counts.get(b, 0)
            if cum + c >= target:
                below += cum
                remaining = c
                # exact membership: replay the same float expression
                pred = pred & (bexpr == b)
                lo = lo + b * width
                hi = hi if b == _BUCKETS - 1 else lo + width
                break
            cum += c
        else:  # pragma: no cover — unreachable: counts sum to remaining
            break
    # terminal: exact selection among the rows matching the predicate
    take = k - below
    rows = vals.filter(pred).orderBy("v").limit(take).collect()
    if len(rows) < take:  # would indicate a membership bug — fail loud
        raise AssertionError(
            f"selection invariant broken: need {take} rows, got {len(rows)}"
        )
    return rows[-1]["v"]


def exact_median(df: DataFrame, col: str) -> float:
    """Lower median: the ceil(n/2)-th smallest value."""
    n = df.filter(F.col(col).isNotNull()).count()
    return exact_kth_smallest(df, col, (n + 1) // 2)
