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
    right_cols: list[str] | None = None,
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the single nearest right row within
    the matching by-key — ``direction='backward'`` (default) picks the
    greatest ``right_ts`` <= ``left_ts``; ``'forward'`` picks the
    smallest ``right_ts`` >= ``left_ts`` (pandas ``merge_asof``
    directions; both inclusive at equality).

    ``tolerance`` (e.g. ``"30 DAYS"``): maximum staleness — a match
    older than ``left_ts - tolerance`` is treated as NO match (nulled
    under ``how='left'``, dropped under ``'inner'``), the kdb/pandas
    ``merge_asof(tolerance=...)`` semantics.  Applied after the carry,
    so it adds zero shuffles.

    ``right_cols`` prunes the right payload carried through the window
    (default: every right column) — at scale, carry only what you need.

    Implementation is the union-merge carry-forward: tag both sides,
    union them, sort per by-key on (ts, side) with right rows first at
    equal timestamps, and carry the last non-null right payload forward
    with last(..., ignoreNulls) over an unbounded-preceding frame.  One
    shuffle + one sort, ZERO fan-out — per-key cost is O((|L|+|R|) log),
    independent of how many right rows precede each left row (a naive
    range-join + row_number pick is O(|L|·|R|) per key).  This is the
    100 TB-safe exact form; ``asof_join_pandas`` below trades it for
    arrow-batched merge_asof when pandas-side logic is wanted.

    ``tie_break``: right column that decides equal-``right_ts`` winners
    (backward: max tie_break at the max eligible ts; forward: min
    tie_break at the min eligible ts).  ``left_id`` is retained for API
    compatibility and must be non-null per row.  ``how='left'`` keeps
    unmatched left rows with null right columns; ``'inner'`` drops them.

    The forward direction is the SAME single-shuffle carry plan run in
    reverse scan order: sort each by-key descending on ts, and the
    last-non-null carry then holds the nearest FOLLOWING right row —
    no extra exchange, no plan change beyond the sort direction.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    fwd = direction == "forward"
    needed = set(right_cols or right.columns) | {right_ts, right_by}
    if tie_break:
        needed.add(tie_break)
    # a null right_ts can never satisfy right_ts <= left_ts, so those rows
    # must not enter the carry-forward (nulls-first ordering would otherwise
    # make them eligible for every left row); mirrors asof_join_pandas
    right = right.filter(F.col(right_ts).isNotNull()).select(
        *[c for c in right.columns if c in needed]
    )
    out_right_cols = right_cols or right.columns
    # carry the pruned right row as one struct so last(ignoreNulls) moves
    # all payload columns together.  The struct packs ONLY what is read
    # back out of it (guide §2.3 — it rides the union through the
    # exchange and the per-key window sort, so every field is shuffle +
    # sort payload): the output columns, tie_break even when right_cols
    # excludes it (the window orders by it), and right_ts only under
    # tolerance (the staleness check reads the CARRIED row's ts).
    # right_by is never packed — it always equals the __by column that
    # already travels beside the struct.
    struct_needed = set(out_right_cols)
    if tie_break:
        struct_needed.add(tie_break)
    if tolerance is not None:
        struct_needed.add(right_ts)
    struct_cols = [c for c in right.columns if c in struct_needed]
    r_tagged = right.select(
        F.col(right_by).alias("__by"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*struct_cols).alias("__r"),
    )
    l_tagged = left.select(
        F.col(left_by).alias("__by"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_tagged.schema["__r"].dataType).alias("__r"),
        *[F.col(c) for c in left.columns],
    )
    unioned = r_tagged.select(
        "__by", "__ts", "__side", "__r",
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left.columns],
    ).unionByName(l_tagged)

    # at equal ts: right rows (side 0) sort before left rows (side 1) in
    # SCAN order so same-timestamp right rows are eligible; among same-ts
    # right rows the winner must sort last in scan order (the carry keeps
    # the last non-null): backward = greatest tie_break, forward (scan
    # runs ts-descending) = smallest tie_break
    order = [F.col("__ts").desc() if fwd else F.col("__ts").asc(), F.col("__side").asc()]
    if tie_break:
        tb = F.col("__r").getField(tie_break)
        order.append(tb.desc_nulls_first() if fwd else tb.asc_nulls_first())
    w = (
        Window.partitionBy("__by")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn("__last_r", F.last("__r", ignorenulls=True).over(w))
    if tolerance is not None:
        gap = (
            F.col("__last_r").getField(right_ts) - F.col("__ts")
            if fwd
            else F.col("__ts") - F.col("__last_r").getField(right_ts)
        )
        stale = F.col("__last_r").isNotNull() & (gap > F.expr(f"INTERVAL {tolerance}"))
        carried = carried.withColumn(
            "__last_r",
            F.when(stale, F.lit(None).cast(r_tagged.schema["__r"].dataType)).otherwise(
                F.col("__last_r")
            ),
        )
    matched = carried.filter(F.col("__side") == 1)
    if how == "inner":
        matched = matched.filter(F.col("__last_r").isNotNull())
    return matched.select(
        *[F.col(c) for c in left.columns],
        *[F.col("__last_r").getField(c).alias(c) for c in out_right_cols],
    )


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    left_by: str,
    right_by: str,
    right_cols: list[str],
    direction: str = "backward",
    tie_break: str | None = None,
    num_buckets: int = 64,
) -> DataFrame:
    """Scale-path as-of join: both sides are hash-partitioned on a
    COARSE bucket of the by-key (``xxhash64 % num_buckets``), then ONE
    ``pd.merge_asof(by=key)`` call handles every key in the bucket.
    ``direction`` is passed through to ``merge_asof``
    (``backward``/``forward``, inclusive at equality).

    Bucketing matters: co-grouping on the raw key invokes Python once
    per KEY (~100k interpreter round-trips at sf0.1 — measured 39 s,
    the same per-group pathology ``capped_decay_balance`` had), while
    ``merge_asof``'s ``by=`` argument does the per-key split inside one
    vectorized C call, so ``num_buckets`` bounds the Python-call count
    regardless of key cardinality.

    ``tie_break``: the right column that decides equal-``right_ts``
    winners, mirroring ``asof_join``'s semantics (backward: max,
    forward: min).  When omitted, ties fall back to ``right_cols``
    order — a caller pairing this with the declarative twin should
    always pass the same ``tie_break``.

    Output schema: all left columns + ``right_cols`` (nullable).
    ``right_ts`` must be distinct from every left column name, and the
    by-keys must be the same type on both sides (they are equated).
    """
    import pandas as pd

    r_fields = {f.name: f for f in right.schema.fields}
    out_schema = T.StructType(
        list(left.schema.fields)
        + [T.StructField(c, r_fields[c].dataType, True) for c in right_cols]
    )
    out_cols = [f.name for f in out_schema.fields]
    slim_cols = list(right_cols)
    if tie_break and tie_break not in slim_cols:
        slim_cols.append(tie_break)  # the sort key must ride along
    # null-ts / null-by right rows can never be picked: dropping them
    # SPARK-side (not in pandas) keeps the Arrow handoff null-free, so
    # an int64 by-key arrives as int64 — a null-bearing long column
    # would cross Arrow as float64 and round keys above 2^53
    right_slim = right.select(right_by, right_ts, *slim_cols).filter(
        F.col(right_by).isNotNull() & F.col(right_ts).isNotNull()
    )
    # ... and the SAME split on the LEFT side: a single null in a long
    # column makes Arrow hand the whole column over as float64, so even
    # the non-null left keys would round above 2^53 before pandas could
    # split them.  Null-by / null-ts left rows can never match — set them
    # aside Spark-side and re-append with a null payload at the end.
    left_nulls = left.filter(F.col(left_by).isNull() | F.col(left_ts).isNull())
    left_clean = left.filter(
        F.col(left_by).isNotNull() & F.col(left_ts).isNotNull()
    )

    bkt = lambda c: F.pmod(F.xxhash64(F.col(c)), F.lit(num_buckets)).cast("int")  # noqa: E731
    left_b = left_clean.withColumn("__asof_bkt", bkt(left_by))
    right_b = right_slim.withColumn("__asof_bkt", bkt(right_by))

    def merge_bucket(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame(columns=out_cols)
        lpdf = lpdf.drop(columns=["__asof_bkt"])
        rpdf = rpdf.drop(columns=["__asof_bkt"])
        # merge_asof raises on null ON keys: null-ts or null-by left rows
        # can never match (set-aside, re-appended with null payload);
        # null-ts / null-by right rows can never be picked (dropped)
        null_left = lpdf[lpdf[left_ts].isna() | lpdf[left_by].isna()]
        lpdf = lpdf[lpdf[left_ts].notna() & lpdf[left_by].notna()]
        rpdf = rpdf[rpdf[right_ts].notna() & rpdf[right_by].notna()]
        if not null_left.empty:
            for c in right_cols:
                null_left = null_left.assign(**{c: None})
        if lpdf.empty:
            return null_left[out_cols]
        if rpdf.empty:
            for c in right_cols:
                lpdf[c] = None
            return pd.concat([lpdf, null_left])[out_cols] if not null_left.empty else lpdf[out_cols]
        # by-keys must agree in dtype for merge_asof (Arrow hands a
        # null-bearing long column over as float64): unify on mismatch.
        # Integer-family keys unify on nullable Int64 — a float64 cast
        # would lose precision above 2^53 and let distinct keys collide;
        # float64 is only the fallback for genuinely float keys.
        if lpdf[left_by].dtype != rpdf[right_by].dtype:
            try:
                # nullable Int64 is exact for the int64-vs-float64(nulls)
                # mismatch; raises on genuinely fractional float keys
                lk = lpdf[left_by].astype("Int64")
                rk = rpdf[right_by].astype("Int64")
            except (TypeError, ValueError):
                lk = lpdf[left_by].astype("float64")
                rk = rpdf[right_by].astype("float64")
            lpdf = lpdf.assign(**{left_by: lk})
            rpdf = rpdf.assign(**{right_by: rk})
        # secondary sort makes equal-ts winners deterministic: merge_asof
        # keeps the LAST equal-ts row (per by-group) going backward and
        # the FIRST going forward, so (ts, tie)-ascending order picks
        # max-tie backward / min-tie forward — matching the declarative
        # twin's tie_break.  mergesort is stable, so same-key rows keep
        # this relative order inside the bucket-wide frame.
        tie_cols = [tie_break] if tie_break else list(right_cols)
        rpdf = rpdf.sort_values([right_ts, *tie_cols], kind="mergesort")
        lpdf = lpdf.sort_values([left_ts], kind="mergesort")
        merged = pd.merge_asof(
            lpdf,
            rpdf[[right_by, right_ts, *right_cols]],
            left_on=left_ts,
            right_on=right_ts,
            left_by=left_by,
            right_by=right_by,
            direction=direction,
        )
        if not null_left.empty:
            merged = pd.concat([merged[out_cols], null_left[out_cols]])
        return merged[out_cols]

    merged = (
        left_b.groupBy("__asof_bkt")
        .cogroup(right_b.groupBy("__asof_bkt"))
        .applyInPandas(merge_bucket, schema=out_schema)
    )
    null_payload = left_nulls.select(
        "*",
        *[
            F.lit(None).cast(r_fields[c].dataType).alias(c)
            for c in right_cols
        ],
    )
    return merged.unionByName(null_payload)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    band: int,
) -> DataFrame:
    """Banded interval-overlap join: all (left, right) pairs whose
    inclusive intervals ``[l_start, l_end]`` and ``[r_start, r_end]``
    overlap (``l_start <= r_end AND r_start <= l_end``).  Bounds are
    numeric (e.g. epoch-micros longs); column names must be disjoint
    across the two inputs.

    Scale design: a naive theta join is a broadcast-nested-loop —
    O(|L|*|R|) comparisons regardless of overlap density.  Banding maps
    each interval to the ``band``-sized buckets it touches (``explode
    (sequence(start div band, end div band))``), turns the join into an
    EQUI join on the bucket id (hash-partitionable, AQE-skew-splittable),
    and re-checks the exact predicate.  Each overlapping pair is emitted
    in exactly ONE bucket — the one containing the overlap's start,
    ``greatest(l_start, r_start) div band`` — so no distinct pass is
    needed.  Cost is O(touched buckets + true pairs); pick ``band``
    near the typical interval length so intervals touch O(1) buckets.

    Negative coordinates are correct but slightly unbalanced: ``div``
    truncates toward zero (not floor), so the bucket containing zero is
    2x wide.  Both the explode and the emit-once rule use the same
    monotone bucket function, so coverage and exactly-once emission
    hold for any sign; epoch-micros inputs are always positive anyway.
    """
    lb = left.withColumn(
        "__band",
        F.explode(
            F.sequence(
                F.expr(f"{l_start} div {band}"), F.expr(f"{l_end} div {band}")
            )
        ),
    )
    rb = right.withColumn(
        "__band",
        F.explode(
            F.sequence(
                F.expr(f"{r_start} div {band}"), F.expr(f"{r_end} div {band}")
            )
        ),
    )
    pairs = lb.join(rb, "__band").where(
        (F.col(l_start) <= F.col(r_end))
        & (F.col(r_start) <= F.col(l_end))
        # emit-once rule: only the bucket holding the overlap's start
        & (
            F.col("__band")
            == F.expr(f"greatest({l_start}, {r_start}) div {band}")
        )
    )
    return pairs.drop("__band")
