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
