"""Hierarchical (sharded) corpus fingerprints.

A corpus fingerprint is an order-sensitive md5 over per-row digests —
the audit readout dedup/scrub queries return so an oracle can check a
stage's full CONTENT, not just its counts.  The naive idiom
(``md5(array_join(sort(collect_list(digest))))`` / DuckDB
``md5(string_agg(digest ORDER BY key))``) funnels every per-row digest
through ONE final aggregation task — ~33 GB in a single task at 1e9
docs.  This module replaces it with a two-level scheme that both
engines express identically, so differential testing is preserved:

  level 1: shard = key % N_SHARDS; per shard, md5 over the
           key-ordered digest concat (plus any partial counts/sums)
  level 2: md5 over the shard fps concat ordered by shard id
           (<= N_SHARDS rows per group — trivially small)

DuckDB twin shape::

    WITH sfp AS (
        SELECT <group>, <key> % 64 AS shard,
               count(*) AS n, sum(<x>) AS sx,
               md5(string_agg(<digest>, '|' ORDER BY <key>)) AS fp
        FROM <rel> GROUP BY <group>, shard)
    SELECT <group>, CAST(coalesce(sum(n), 0) AS BIGINT) AS n,
           CAST(sum(sx) AS BIGINT) AS sx,
           md5(string_agg(fp, '|' ORDER BY shard)) AS corpus_fp
    FROM sfp GROUP BY <group>

Scale: each shard's collect_list holds n/N_SHARDS 32-byte digests and
shards aggregate in parallel with map-side partials on the numeric
legs; the final reduce sees <= N_SHARDS rows.  ``N_SHARDS`` is pinned
to 64 in the catalog queries (it participates in the oracle hash); a
production job sizes it ~ n_docs/1e6 via the ``shards=`` knob so a
shard's digest list stays ~32 MB at any corpus size.

Empty-relation semantics match DuckDB exactly: a global (ungrouped)
fingerprint over zero rows yields count 0, NULL sums, and a NULL
fingerprint (DuckDB's ``string_agg`` over zero rows is NULL, so the
outer ``md5`` is NULL; the Spark side guards with ``when(count > 0)``
— the divergence ADVICE r10 flagged on ``dedup_pipeline_roi``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_SHARDS = 64


def _ordered_md5(order: Column, digest: Column) -> Column:
    """md5 over ``digest`` values of the current group, ordered by
    ``order`` (collect_list has no order guarantee; the struct sort
    pins one — the idiom every catalog fingerprint already used)."""
    return F.md5(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(order.alias("i"), digest.alias("h"))
                    )
                ),
                lambda x: x["h"],
            ),
            "|",
        )
    )


def corpus_fp_agg(
    df: DataFrame,
    *,
    order: Column | str,
    digest: Column | str,
    shard_key: Column | str,
    sums: tuple[tuple[Column, str], ...] = (),
    count_alias: str | None = None,
    group: tuple[str, ...] = (),
    shards: int = N_SHARDS,
    fp_alias: str = "corpus_fp",
) -> DataFrame:
    """Aggregate ``df`` to one row per ``group`` carrying an optional
    row count, summed numeric legs, and the two-level sharded corpus
    fingerprint of ``digest`` ordered by ``order``.

    ``order`` must be unique within each (group, shard) — doc_id or a
    (doc_a, doc_b) struct.  ``shard_key`` must be a non-negative
    integer column (``pmod`` and DuckDB ``%`` agree there).  ``sums``
    is ``((expr, alias), ...)``; totals are cast to bigint.
    """
    order = F.col(order) if isinstance(order, str) else order
    digest = F.col(digest) if isinstance(digest, str) else digest
    shard_key = F.col(shard_key) if isinstance(shard_key, str) else shard_key

    base = df.select(
        *group,
        F.pmod(shard_key, F.lit(shards)).alias("_fp_shard"),
        order.alias("_fp_ord"),
        digest.alias("_fp_h"),
        *[e.alias(f"_fp_x{i}") for i, (e, _) in enumerate(sums)],
    )
    lvl1 = base.groupBy(*group, "_fp_shard").agg(
        F.count(F.lit(1)).alias("_fp_n"),
        *[F.sum(f"_fp_x{i}").alias(f"_fp_t{i}") for i in range(len(sums))],
        _ordered_md5(F.col("_fp_ord"), F.col("_fp_h")).alias("_fp_sfp"),
    )
    out_cols = []
    if count_alias is not None:
        out_cols.append(
            F.coalesce(F.sum("_fp_n"), F.lit(0))
            .cast("bigint")
            .alias(count_alias)
        )
    out_cols += [
        F.sum(f"_fp_t{i}").cast("bigint").alias(a)
        for i, (_, a) in enumerate(sums)
    ]
    out_cols.append(
        F.when(
            F.count(F.lit(1)) > 0,
            _ordered_md5(F.col("_fp_shard"), F.col("_fp_sfp")),
        ).alias(fp_alias)
    )
    # groupBy() with no keys == global agg (1 row even on empty input)
    return lvl1.groupBy(*group).agg(*out_cols)
