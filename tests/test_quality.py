"""Semantic invariants for plans/quality.py and the EWMA recursion."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_individual_assignment_spark import plans
from data_engineering_individual_assignment_spark.sources.readers import load_table

from .conftest import SF_SMALL


def _q(spark, name):
    return plans.CATALOG[name].fn(spark, SF_SMALL)


def test_expectation_suite_passes_on_clean_testdata(spark):
    rows = _q(spark, "expectation_suite").collect()
    assert len(rows) == 6
    for r in rows:
        assert r.n_checked > 0
        assert r.n_violations == 0
        assert r.passed is True


def test_snapshot_diff_partitions_the_key_space(spark):
    events = load_table(spark, SF_SMALL, "events")
    total_users = events.select("user_id").distinct().count()
    rows = {r.change: r.n_keys for r in _q(spark, "snapshot_diff").collect()}
    # old snapshot is a subset of now: nothing can be 'removed'
    assert "removed" not in rows
    assert sum(rows.values()) == total_users
    assert rows.get("unchanged", 0) + rows.get("changed", 0) > 0


def test_ewma_recursion_matches_hand_rolled_series(spark):
    """Pin the grouped-map recursion on a planted series: alpha=0.3,
    adjust-free — s1=x1, s2=0.3*x2+0.7*s1, ..."""
    rows = _q(spark, "ewma_daily").collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for evs in by_type.values():
        assert evs == sorted(evs, key=lambda r: r.day)
        s = float(evs[0].cnt)
        assert evs[0].ewma == round(s, 4)
        for r in evs[1:]:
            s = 0.3 * r.cnt + 0.7 * s
            assert abs(r.ewma - round(s, 4)) < 5e-4


def test_benford_screen_is_a_proper_distribution(spark):
    import math

    rows = _q(spark, "benford_price_screen").collect()
    assert [r.digit for r in rows] == list(range(1, 10))
    assert abs(sum(r.obs_share for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.benford_share for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert abs(r.benford_share - math.log10(1 + 1 / r.digit)) < 1e-6
    chi2 = {r.chi2_total for r in rows}
    assert len(chi2) == 1 and chi2.pop() >= 0


def test_reconcile_detects_adds_deletes_mods_and_clean(spark):
    """reconcile() on identical tables returns ZERO buckets; planted
    adds/deletes/modifications each surface in the right bucket with
    the right changed-key count."""
    from pyspark.sql import functions as F

    from data_engineering_individual_assignment_spark.operators.reconcile import (
        reconcile,
    )

    a = spark.range(0, 200).select(
        F.col("id").alias("k"),
        (F.col("id") * 2.5).alias("val"),
        F.lit("ok").alias("status"),
    )
    assert reconcile(a, a, "k", ["val", "status"], n_buckets=8).count() == 0

    b = (
        a.filter(F.col("k") != 17)  # delete key 17 (bucket 1)
        .withColumn(
            "val",
            F.when(F.col("k") == 34, F.lit(-1.0)).otherwise(F.col("val")),
        )  # modify key 34 (bucket 2)
        .unionByName(
            spark.createDataFrame(
                [(1000, 9.9, "new")], "k long, val double, status string"
            )
        )  # add key 1000 (bucket 0)
    )
    got = {
        r.bucket: (r.n_a, r.n_b, r.n_changed_keys)
        for r in reconcile(a, b, "k", ["val", "status"], n_buckets=8).collect()
    }
    assert got == {
        0: (25, 26, 1),  # addition
        1: (25, 24, 1),  # deletion
        2: (25, 25, 1),  # modification: equal counts, digest caught it
    }


def test_row_digest_portable_to_duckdb(spark):
    """The per-row hash reproduces bit-for-bit in DuckDB (the property
    the reconcile oracle's independence rests on)."""
    import duckdb

    from pyspark.sql import functions as F

    from data_engineering_individual_assignment_spark.operators.reconcile import (
        row_digest,
    )

    df = spark.createDataFrame(
        [(1, 2.5, "x"), (2, None, "y"), (3, 7.0, None)],
        "k long, val double, s string",
    )
    got = {
        r.k: r.h
        for r in df.select(
            "k", row_digest(F.col("k"), [F.col("val"), F.col("s")]).alias("h")
        ).collect()
    }
    con = duckdb.connect()
    ref = {
        k: h
        for k, h in con.execute(
            """
            SELECT k, CAST('0x' || substr(md5(concat_ws(chr(31),
                coalesce(CAST(k AS VARCHAR), chr(0) || 'null'),
                coalesce(CAST(val AS VARCHAR), chr(0) || 'null'),
                coalesce(s, chr(0) || 'null'))), 1, 15) AS BIGINT) AS h
            FROM (VALUES (1, 2.5, 'x'), (2, NULL, 'y'), (3, 7.0, NULL))
                 t(k, val, s)
            """
        ).fetchall()
    }
    assert got == ref
