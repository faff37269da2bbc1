"""Anti-entropy table reconciliation: find WHERE two huge tables
differ without shipping either one.

Diffing two 100 TB table versions with a full-outer join moves both
tables through one shuffle.  The anti-entropy alternative (the design
behind Dynamo/Cassandra repair and DVC-style data diffing): bucket
rows by key, reduce each bucket to a tiny COMMUTATIVE digest
(bit_xor of a per-row hash — order- and partitioning-independent),
compare the two bucket-digest relations (buckets x 16 bytes, a
broadcast-sized join), and only drill into the buckets whose digests
disagree.  Pass 1 moves digests, not rows; pass 2 joins only the
differing key ranges — proportional to the DAMAGE, not the data.

Hashes are the repo's portable md5-60bit construction, so a DuckDB
oracle reproduces the digests bit-for-bit and the bucket verdicts
themselves are differential-testable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_digest(key: Column, payload: list[Column]) -> Column:
    """Portable 60-bit row hash over key + payload columns (null-safe:
    nulls serialize as a sentinel so NULL != '' != 'NULL-sentinel'
    collisions don't silently cancel)."""
    from .dedup import _md5_hash60

    parts = [key.cast("string")] + [c.cast("string") for c in payload]
    safe = [F.coalesce(c, F.lit("\x00null")) for c in parts]
    return _md5_hash60(F.concat_ws("\x1f", *safe))


def bucket_digests(
    df: DataFrame,
    key_col: str,
    payload_cols: list[str],
    n_buckets: int = 64,
) -> DataFrame:
    """(bucket, n, digest): bit_xor-folded row hashes per key bucket.
    bit_xor is commutative+associative, so the digest is identical for
    ANY partitioning/arrival order — and under ANSI mode it cannot
    overflow like sum() would."""
    key = F.col(key_col)
    h = row_digest(key, [F.col(c) for c in payload_cols])
    return (
        df.select(
            F.pmod(key, F.lit(n_buckets)).cast("int").alias("bucket"),
            h.alias("h"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.expr("bit_xor(h)").alias("digest"),
        )
    )


def reconcile(
    a: DataFrame,
    b: DataFrame,
    key_col: str,
    payload_cols: list[str],
    n_buckets: int = 64,
    check_unique_keys: bool = False,
) -> DataFrame:
    """Two-pass diff: bucket-digest comparison, then a row-level drill
    into differing buckets only.  Returns one row per DIFFERING bucket:
    (bucket, n_a, n_b, n_changed_keys) where n_changed_keys counts keys
    whose row hash differs between sides (covers modified + added +
    deleted keys).

    PRECONDITION: ``key_col`` must be UNIQUE on both sides (primary-key
    tables — the only kind anti-entropy repair is defined over).  With
    duplicate keys the xor digest can cancel a pair of identical
    duplicates and the per-key drill-down fans out, so both passes
    under-report.  Set ``check_unique_keys=True`` to pay one extra
    aggregation per side and fail loudly instead."""
    if check_unique_keys:
        for side, df in (("a", a), ("b", b)):
            dup = (
                df.groupBy(key_col)
                .count()
                .filter(F.col("count") > 1)
                .limit(1)
                .collect()
            )
            if dup:
                raise ValueError(
                    f"reconcile: duplicate {key_col} on side {side} "
                    f"(e.g. {dup[0][0]!r}); keys must be unique"
                )
    da = bucket_digests(a, key_col, payload_cols, n_buckets)
    db = bucket_digests(b, key_col, payload_cols, n_buckets)
    verdicts = (
        da.withColumnRenamed("n", "n_a")
        .withColumnRenamed("digest", "dig_a")
        .join(
            db.withColumnRenamed("n", "n_b").withColumnRenamed(
                "digest", "dig_b"
            ),
            "bucket",
            "full_outer",
        )
        .select(
            "bucket",
            F.coalesce("n_a", F.lit(0)).alias("n_a"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
            (
                F.coalesce("dig_a", F.lit(0)) != F.coalesce("dig_b", F.lit(0))
            ).alias("differs"),
        )
    )
    bad = verdicts.filter(
        F.col("differs") | (F.col("n_a") != F.col("n_b"))
    ).select("bucket", "n_a", "n_b")
    # drill-down restricted to the differing buckets (broadcast: the
    # damaged-bucket list is tiny by assumption — that's the point)
    key = F.col(key_col)

    def keyed(df: DataFrame) -> DataFrame:
        return df.select(
            F.pmod(key, F.lit(n_buckets)).cast("int").alias("bucket"),
            key.cast("long").alias("k"),
            row_digest(key, [F.col(c) for c in payload_cols]).alias("h"),
        ).join(F.broadcast(bad.select("bucket")), "bucket")

    ka, kb = keyed(a), keyed(b)
    changed = (
        ka.join(kb, ["bucket", "k"], "full_outer")
        .filter(
            ka["h"].isNull()
            | kb["h"].isNull()
            | (ka["h"] != kb["h"])
        )
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("n_changed_keys"))
    )
    return (
        bad.join(changed, "bucket", "left")
        .select(
            "bucket",
            "n_a",
            "n_b",
            F.coalesce("n_changed_keys", F.lit(0)).alias("n_changed_keys"),
        )
        .orderBy("bucket")
    )
