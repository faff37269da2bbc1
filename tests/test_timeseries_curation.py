"""Semantic invariants for the time-series batch (plans/timeseries.py)
and the round-2 curation additions (dup-span fraction, perplexity
proxy, quality-aware survivors) — properties the DuckDB differential
can't express: spine completeness, interval contiguity, survivor
optimality.  Cross-engine value checks live in
tests/test_queries_oracle.py."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_engineering_individual_assignment_spark import plans
from data_engineering_individual_assignment_spark.sources.readers import load_table

from .conftest import SF_SMALL


def _q(spark, name):
    return plans.CATALOG[name].fn(spark, SF_SMALL)


# --------------------------------------------------------------------------
# gap_fill_daily
# --------------------------------------------------------------------------
def test_gap_fill_spine_is_complete_and_dense(spark):
    rows = _q(spark, "gap_fill_daily").collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    assert len(by_type) >= 2
    days = {dt.date.fromisoformat(r.day) for r in rows}
    lo, hi = min(days), max(days)
    expect_n = (hi - lo).days + 1
    for etype, rs in by_type.items():
        # every type covers the FULL global range with no holes
        assert len(rs) == expect_n, etype
        assert len({r.day for r in rs}) == expect_n, etype


def test_gap_fill_forward_fill_never_regresses_to_null(spark):
    """After the first observed day for a type, avg_value_ff must stay
    non-null (last ignoreNulls carries forward across gap days)."""
    rows = _q(spark, "gap_fill_daily").collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for rs in by_type.values():
        rs.sort(key=lambda r: r.day)
        seen = False
        for r in rs:
            if r.avg_value_ff is not None:
                seen = True
            elif seen:
                raise AssertionError(f"ff regressed to null at {r}")


# --------------------------------------------------------------------------
# scd2_user_state_history
# --------------------------------------------------------------------------
def test_scd2_intervals_contiguous_one_current_per_user(spark):
    rows = _q(spark, "scd2_user_state_history").collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for uid, rs in by_user.items():
        rs.sort(key=lambda r: r.valid_from)
        assert sum(r.is_current for r in rs) == 1, uid
        assert rs[-1].valid_to == "current", uid
        for a, b in zip(rs, rs[1:]):
            # closed by the successor's open: contiguous, no overlap
            assert a.valid_to == b.valid_from, uid
            # consecutive runs always change state
            assert a.state != b.state, uid


# --------------------------------------------------------------------------
# dup_span_fraction
# --------------------------------------------------------------------------
def test_dup_span_matches_driver_side_recompute(spark):
    """Full independent recompute of the 8-gram dup fractions in plain
    Python over the tiny sf0.001 slice — a second differential besides
    the DuckDB oracle, immune to shared SQL-dialect blind spots."""
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text").collect()
    grams: dict[int, set] = {}
    for r in docs:
        toks = r.text.strip().lower().split()
        if len(toks) >= 8:
            grams[r.doc_id] = {
                " ".join(toks[i : i + 8]) for i in range(len(toks) - 7)
            }
    df: dict[str, int] = {}
    for gs in grams.values():
        for g in gs:
            df[g] = df.get(g, 0) + 1
    got = {r.doc_id: r for r in _q(spark, "dup_span_fraction").collect()}
    assert set(got) == set(grams)
    for did, gs in grams.items():
        n_dup = sum(1 for g in gs if df[g] > 1)
        assert got[did].n_ngrams == len(gs), did
        assert got[did].n_dup == n_dup, did
        assert abs(got[did].dup_frac - round(n_dup / len(gs), 6)) < 1e-9, did


# --------------------------------------------------------------------------
# perplexity_proxy
# --------------------------------------------------------------------------
def test_perplexity_bounds_and_coverage(spark):
    n_docs = load_table(spark, SF_SMALL, "documents").count()
    rows = _q(spark, "perplexity_proxy").collect()
    assert len(rows) == n_docs  # every doc scores (tokens('') is [''])
    for r in rows:
        assert r.cross_entropy >= 0.0
        assert r.n_tokens >= 1


# --------------------------------------------------------------------------
# dedup_quality_survivors
# --------------------------------------------------------------------------
def test_survivor_is_longest_member(spark):
    clusters = plans.CATALOG["near_dup_clusters"].fn(spark, SF_SMALL)
    d = load_table(spark, SF_SMALL, "documents").select("doc_id", "n_chars")
    members = clusters.join(d, "doc_id").collect()
    by_cluster: dict[int, list] = {}
    for r in members:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    surv = {r.cluster_id: r for r in _q(spark, "dedup_quality_survivors").collect()}
    assert set(surv) == set(by_cluster)
    for cid, rs in by_cluster.items():
        best = max(rs, key=lambda r: (r.n_chars, -r.doc_id))
        assert surv[cid].survivor_doc_id == best.doc_id, cid
        assert surv[cid].n_members == len(rs), cid
