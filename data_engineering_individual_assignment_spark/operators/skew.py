"""Skew mitigation (SURVEY engine-surface requirement; no reference
counterpart — the reference never joins).

First line of defense is AQE's skew-join splitting
(``spark.sql.adaptive.skewJoin.enabled``, on by default in session.py),
which handles skewed *shuffle* partitions at runtime.  ``salted_join``
is the explicit fallback for the pathological case AQE can't fix: one
join key so hot that a single task would still process it alone.

Mechanics: the build side is replicated ``salt_factor`` times (one copy
per salt value), the probe side gets a random-but-deterministic salt
(hash of a unique column, not rand(), so retries/reruns are stable),
and the join runs on (key, salt) — the hot key's rows spread across
``salt_factor`` tasks.  Cost: build side × salt_factor; use only for
genuinely hot keys (pair with a key-frequency pre-check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    salt_factor: int = 8,
    probe_salt_col: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``key`` with the build side salted ``salt_factor``
    ways.  ``probe_salt_col``: a probe column whose hash picks the salt
    (defaults to the key itself via monotonically varying hash of all
    probe columns is NOT stable — pass a unique id column for
    deterministic reruns; falling back to rand-free xxhash64 of the key
    spreads only across *distinct* non-key attributes, so prefer an id).
    Output columns = probe ∪ build (minus the duplicate key).

    Only ``inner``, ``left``, ``left_semi`` and ``left_anti`` are
    supported: the build side is replicated ``salt_factor`` times, so a
    right/full join would emit each unmatched build row once per salt
    copy.  Probe-side semantics (including anti) are salt-independent —
    a probe row at salt s finds build key k iff k exists at all, since
    every key is present at every salt.
    """
    if how not in {
        "inner", "left", "left_outer",
        "left_semi", "leftsemi", "left_anti", "leftanti",
    }:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, not "
            f"{how!r}: the replicated build side would duplicate "
            "unmatched build rows under right/full semantics"
        )
    if probe_salt_col is not None:
        # deterministic: reruns place each row in the same salt bucket
        salt = F.pmod(F.xxhash64(F.col(probe_salt_col)), F.lit(salt_factor))
    else:
        # no unique column given: spread by row position.  Salting the
        # KEY would put every row of the hot key in ONE bucket (a no-op);
        # position-based salt still spreads them — join RESULTS are
        # salt-independent, only the task placement varies across reruns.
        salt = F.pmod(F.monotonically_increasing_id(), F.lit(salt_factor))
    p = probe.withColumn("__salt", salt.cast("int"))
    b = build.join(
        F.broadcast(
            build.sparkSession.range(salt_factor).select(
                F.col("id").cast("int").alias("__salt")
            )
        )
    )
    joined = p.join(b, [key, "__salt"], how)
    return joined.drop("__salt")
