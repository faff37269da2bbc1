"""Broadcast-disabled strategy-independence sweep (round-6, VERDICT r5 #2).

At 100 TB the sf-scaling relations (customer, part, derived participant
sets) will NOT fit in executor memory, so every join that the bench
measures as BroadcastHashJoin must also be *correct* in the shuffle-join
regime Catalyst/AQE will actually pick there.  This module reruns the
driver's CORRECTNESS query set with `spark.sql.autoBroadcastJoinThreshold
= -1` (and the AQE runtime variant) — the exact technique used at
tests/test_scale_patterns.py to force SortMergeJoin — and diffs each
result against the same DuckDB oracle the driver uses.

A query passing here proves its plan is strategy-independent: the
broadcast the 64 MB session threshold picks at bench scale is an
optimization, not a correctness or feasibility dependency.
"""

from __future__ import annotations

import glob
import json
import os

import pytest

from .conftest import REPO_ROOT, SF_ORACLE
from .oracle_utils import compare, duck_con


def _driver_query_names() -> list[str]:
    """The fixed 50-name set the round driver checks (keys of the most
    recent CORRECTNESS_r*.json); falls back to the bench headliners if
    no driver artifact is present (fresh clone)."""
    arts = sorted(glob.glob(os.path.join(REPO_ROOT, "CORRECTNESS_r*.json")))
    if arts:
        with open(arts[-1]) as f:
            return sorted(json.load(f).keys())
    return [
        "pricing_summary",
        "star_join_revenue",
        "shipping_priority",
        "regression_ols",
        "rank_orders_per_customer",
        "asof_join_events_orders",
        "dedup_exact",
        "near_dup_pairs",
        "ann_brute_force",
        "tumbling_window_counts",
        "text_stats",
    ]


def _catalog():
    from data_engineering_individual_assignment_spark import plans

    return plans.CATALOG


@pytest.fixture(scope="module")
def smj_spark(spark):
    """Session Spark with every broadcast-size heuristic disabled: plans
    that survive this run in the pure shuffle-join regime."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    yield spark
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_ORACLE)
    yield c
    c.close()


@pytest.mark.parametrize("name", _driver_query_names())
def test_driver_query_without_broadcast(smj_spark, con, name):
    cat = _catalog()
    assert name in cat, f"driver checks {name} but it left the catalog"
    q = cat[name]
    df = q.fn(smj_spark, SF_ORACLE)
    if q.sql is None:
        assert df.columns, f"{name}: no columns"
        df.collect()
        return
    problems = compare(df, con, q.sql)
    assert not problems, f"{name} (SMJ regime): " + " | ".join(problems)
