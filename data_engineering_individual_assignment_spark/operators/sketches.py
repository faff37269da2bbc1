"""Distributed heavy-hitters: per-partition Misra-Gries summaries merged
into a candidate set, then one exact verification pass restricted to the
candidates.

Why a sketch at all: the direct ``groupBy(item).count()`` over a 100 TB
corpus shuffles one record per DISTINCT item — billions of keys for
n-grams/URLs — and the aggregation hash tables spill.  Misra-Gries
bounds the state to ``k`` counters per partition, the merged candidate
set to ``partitions * k`` rows (kilobytes), and the exact pass then
aggregates only rows whose item survives a broadcast semi-join — the
hash table is candidate-sized, never vocabulary-sized.

Guarantee (Misra-Gries 1982; merge form Agarwal et al., "Mergeable
Summaries", PODS 2012): a partition summary with ``k`` counters
undercounts any item by at most ``n_p / k``.  Summing partial counts
item-wise, the total undercount is at most ``sum(n_p) / k = n / k``, so
every item with true frequency > ``n / k`` has a merged estimate > 0 and
is in the candidate set.  The exact pass therefore returns EXACTLY the
``freq > n/k`` item set regardless of partitioning — deterministic
output from a partition-dependent sketch.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_merge(counter: dict, value_counts, k: int) -> dict:
    """One Misra-Gries merge-and-decrement step, shared by the batch
    partials and the streaming state update so the decrement rule (the
    part carrying the n/(k+1) undercount proof) has exactly one home:
    add the batch's counts, then subtract the (size-k)-th smallest
    counter value from everything and drop the non-positive remainder."""
    for item, c in value_counts.items():
        counter[item] = counter.get(item, 0) + int(c)
    if len(counter) > k:
        vals = sorted(counter.values())
        m = vals[len(counter) - k - 1]
        counter = {i: c - m for i, c in counter.items() if c > m}
    return counter


def mg_partials(
    df: DataFrame, col: str, k: int, with_totals: bool = False
) -> DataFrame:
    """Per-partition Misra-Gries summary: at most ``k`` (item,
    lower-bound count) rows per partition, via Arrow-batched
    ``mapInPandas``.  The batched decrement subtracts the (size-k)-th
    smallest counter value from everything and drops the non-positive
    remainder — equivalent to running the classic one-at-a-time
    decrement, vectorized.

    ``with_totals=True`` appends one sentinel row per partition
    (``item`` NULL, ``c`` = non-null rows seen) so callers get the
    exact total WITHOUT a second corpus scan."""
    import pandas as pd

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counter: dict = {}
        seen = 0
        for pdf in batches:
            vc = pdf[col].value_counts()
            seen += int(vc.sum())
            counter = mg_merge(counter, vc, k)
        items = list(counter.keys())
        cnts = list(counter.values())
        if with_totals:
            items.append(None)
            cnts.append(seen)
        yield pd.DataFrame({"item": items, "c": cnts})

    return df.select(F.col(col).alias(col)).mapInPandas(
        summarize, schema="item string, c long"
    )


def heavy_hitters_exact(df: DataFrame, col: str, k: int) -> DataFrame:
    """All items of ``df[col]`` with exact frequency > n/k, computed via
    MG candidates + one candidate-restricted exact pass.

    Output: ``item``, ``cnt`` (exact), ``share`` (cnt/n, 6 dp) —
    deterministic for any partitioning (see module docstring).
    """
    from .dedup import _persist

    # one corpus scan produces BOTH the candidates and the exact total
    # (sentinel rows); the partial relation is partitions*(k+1) rows, so
    # persisting it to serve two consumers costs kilobytes
    partials = _persist(mg_partials(df, col, k, with_totals=True))
    candidates = (
        partials.where(F.col("item").isNotNull()).select("item").distinct()
    )
    total = partials.where(F.col("item").isNull()).agg(
        F.sum("c").alias("n")
    )
    exact = (
        df.join(
            F.broadcast(candidates), df[col] == candidates["item"], "leftsemi"
        )
        .groupBy(F.col(col).alias("item"))
        .agg(F.count("*").alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .where(F.col("cnt") * k > F.col("n"))
        .select(
            "item",
            "cnt",
            F.round(F.col("cnt") / F.col("n"), 6).alias("share"),
        )
    )


# --------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005)
# --------------------------------------------------------------------------
def cms_build(
    df: DataFrame, col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Count-Min sketch as a RELATION: ``depth * width`` cells of
    (row, bucket, n).  Building it is one explode (each item emits
    ``depth`` (row, bucket) updates) + one groupBy over a key space of
    ``depth * width`` — constant-sized state no matter how many
    distinct items flow through, and trivially mergeable (cell-wise
    sum), which is the whole point at 100 TB: a 4x64 integer grid
    summarizes any vocabulary.

    Hashes are the repo's portable 60-bit md5 construction
    (``operators.dedup._md5_hash60``) so a DuckDB oracle can rebuild
    the IDENTICAL sketch and the estimates themselves are
    differential-testable."""
    from .dedup import _md5_hash60

    entries = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        (_md5_hash60(F.col(col), f"cms{i}") % width)
                        .cast("int")
                        .alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("e")
    )
    return entries.groupBy(
        F.col("e.row").alias("row"), F.col("e.bucket").alias("bucket")
    ).agg(F.count("*").alias("n"))


def cms_estimate(
    probes: DataFrame, sketch: DataFrame, col: str, depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Point-frequency estimates for ``probes[col]``: min over the
    sketch rows of the probed cells.  CMS never undercounts, so
    ``est >= true`` always — the invariant the accuracy query pins.
    The sketch is broadcast (it is depth*width rows)."""
    from .dedup import _md5_hash60

    probe_cells = probes.select(
        col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        (_md5_hash60(F.col(col), f"cms{i}") % width)
                        .cast("int")
                        .alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("e"),
    ).select(col, "e.row", "e.bucket")
    return (
        probe_cells.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .withColumn("n", F.coalesce("n", F.lit(0)))
        .groupBy(col)
        .agg(F.min("n").alias("cms_est"))
    )


def hll_distinct_estimate(
    df: DataFrame,
    col: str,
    by: list[str],
    m: int = 64,
) -> DataFrame:
    """PORTABLE HyperLogLog (Flajolet et al. 2007) distinct-count
    estimate per ``by`` group — unlike ``approx_count_distinct`` (whose
    registers are engine-internal), every step here is rebuildable in
    any engine with md5, so the ESTIMATE itself is differential-testable
    against a DuckDB twin (the same treatment ``cms_build`` gives CMS).

    Construction, identical cross-engine by design:
    - 60-bit md5 hash (``_md5_hash60`` with salt ``hll{m}``); bucket =
      ``h % m`` (p = log2 m bits), payload = ``h DIV m`` (60-p bits);
    - rho = leading-zeros-of-payload + 1 = ``(60-p+1) - bitlength``,
      with the all-zero payload pinned to the max rho;
    - register r_j = max rho per (group, bucket) — a groupBy over a key
      space of |groups|·m, constant-sized state at any corpus size and
      cell-wise MERGEABLE (max), which is the 100 TB point;
    - the harmonic sum is frozen as an INTEGER scaled by 2^rho_max
      (NOT 2^pay_bits: r can reach rho_max = pay_bits+1 on an all-zero
      payload, and a 2^pay_bits scale would then need a NEGATIVE shift
      — Spark's shiftleft masks it to 63 and corrupts the sum, DuckDB
      raises): Z_int = ``sum(1 << (rho_max - r))`` plus ``2^rho_max``
      per absent register — shift exponent always in [0, pay_bits],
      total at most m·2^rho_max = 2^61, exact in BIGINT in every
      engine, so no float-summation-order divergence is possible;
    - estimate = alpha_m·m²·2^rho_max / Z_int (one double division),
      with the standard linear-counting small-range correction
      (E <= 2.5m and empty registers exist -> m·ln(m/V)).

    Returns ``by + [est]`` with ``est`` the raw double estimate.
    """
    from .dedup import _md5_hash60

    p = m.bit_length() - 1
    if 1 << p != m:
        raise ValueError("m must be a power of two")
    pay_bits = 60 - p
    rho_max = pay_bits + 1
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1 + 1.079 / m)
    )
    coef = alpha * m * m * float(1 << rho_max)
    regs = (
        df.select(
            *by,
            _md5_hash60(F.col(col).cast("string"), f"hll{m}").alias("h"),
        )
        .withColumn("pay", F.expr(f"h DIV {m}"))
        .groupBy(*by, F.expr(f"CAST(h % {m} AS INT)").alias("bucket"))
        .agg(
            F.expr(
                f"max(CASE WHEN pay = 0 THEN {rho_max} "
                f"ELSE {rho_max} - length(bin(pay)) END)"
            ).alias("r")
        )
    )
    z = regs.groupBy(*by).agg(
        F.expr(
            f"CAST({m} - count(*) AS BIGINT) * CAST({1 << rho_max} AS BIGINT)"
            f" + sum(shiftleft(CAST(1 AS BIGINT), CAST({rho_max} - r AS INT)))"
        ).alias("z_int"),
        F.expr(f"CAST({m} - count(*) AS BIGINT)").alias("v"),
    )
    return z.select(
        *by,
        F.expr(
            f"CASE WHEN {coef!r} / z_int <= {2.5 * m!r} AND v > 0 "
            f"THEN {m} * ln({m} * 1.0 / v) "
            f"ELSE {coef!r} / z_int END"
        ).alias("est"),
    )


def hll_oracle_ctes(src: str, col: str, group: str, m: int) -> str:
    """DuckDB WITH-clause fragment rebuilding ``hll_distinct_estimate``
    bit-for-bit: CTEs ``hll{m}_est(group, est)``.  Kept next to the
    operator so the two constructions can only drift visibly."""
    p = m.bit_length() - 1
    pay_bits = 60 - p
    rho_max = pay_bits + 1
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1 + 1.079 / m)
    )
    coef = alpha * m * m * float(1 << rho_max)
    return f"""hll{m}_hash AS (
        SELECT {group},
               CAST('0x' || substr(md5('hll{m}|' || CAST({col} AS VARCHAR)), 1, 15)
                    AS BIGINT) AS h
        FROM {src}),
    hll{m}_reg AS (
        SELECT {group}, h % {m} AS bucket,
               max(CASE WHEN h // {m} = 0 THEN {rho_max}
                        ELSE {rho_max} - length(bin(h // {m})) END) AS r
        FROM hll{m}_hash GROUP BY {group}, bucket),
    hll{m}_z AS (
        SELECT {group},
               CAST({m} - count(*) AS BIGINT) * CAST({1 << rho_max} AS BIGINT)
               + sum(1::BIGINT << CAST({rho_max} - r AS INT)) AS z_int,
               CAST({m} - count(*) AS BIGINT) AS v
        FROM hll{m}_reg GROUP BY {group}),
    hll{m}_est AS (
        SELECT {group},
               CASE WHEN {coef!r} / z_int <= {2.5 * m!r} AND v > 0
                    THEN {m} * ln({m} * 1.0 / v)
                    ELSE {coef!r} / z_int END AS est
        FROM hll{m}_z)"""
