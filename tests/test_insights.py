"""Semantic invariants for the insights batch (plans/insights.py).
Cross-engine value checks live in tests/test_queries_oracle.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_individual_assignment_spark import plans
from data_engineering_individual_assignment_spark.sources.readers import load_table

from .conftest import SF_SMALL


def _q(spark, name):
    return plans.CATALOG[name].fn(spark, SF_SMALL)


def test_market_basket_support_bounds(spark):
    rows = _q(spark, "market_basket_lift").collect()
    assert rows
    for r in rows:
        assert r.type_a < r.type_b  # canonical orientation
        assert 0 < r.n_both <= min(r.n_a, r.n_b)  # support containment
        assert r.lift > 0


def test_rfm_segments_cover_every_customer(spark):
    df = _q(spark, "rfm_segments")
    total = df.agg(F.sum("n_customers")).first()[0]
    n_cust = (
        load_table(spark, SF_SMALL, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert total == n_cust
    for r in df.collect():
        assert 1 <= r.r <= 4 and 1 <= r.f <= 4 and 1 <= r.m <= 4


def test_dup_histogram_conserves_documents(spark):
    df = _q(spark, "dup_multiplicity_histogram")
    total_docs = df.agg(F.sum("n_docs")).first()[0]
    assert total_docs == load_table(spark, SF_SMALL, "documents").count()
    for r in df.collect():
        assert r.n_docs == r.multiplicity * r.n_clusters


def test_vocab_coverage_curve_is_monotone(spark):
    rows = sorted(_q(spark, "vocab_coverage_curve").collect(),
                  key=lambda r: r.threshold)
    assert [r.threshold for r in rows] == [0.5, 0.9, 0.99]
    ks = [r.k_tokens for r in rows]
    assert ks == sorted(ks)  # higher coverage needs no fewer tokens
    for r in rows:
        assert r.share_at_k >= r.threshold  # first-crossing rule


def test_cusum_peak_is_on_an_observed_day(spark):
    days = {
        (r.event_type, r.day.strftime("%Y-%m-%d"))
        for r in load_table(spark, SF_SMALL, "events")
        .select("event_type", F.col("ts").cast("date").alias("day"))
        .distinct()
        .collect()
    }
    rows = _q(spark, "cusum_changepoint").collect()
    assert rows
    for r in rows:
        assert (r.event_type, r.changepoint_day) in days


def test_autocorr_within_unit_interval(spark):
    for r in _q(spark, "autocorr_daily").collect():
        assert r.n_days > 0
        if r.lag1_autocorr is not None:
            assert -1.0 <= r.lag1_autocorr <= 1.0


def test_trimmed_mean_udaf_ignores_planted_outliers(spark):
    """UDAF semantics: 10% trim drops a planted 1e9 outlier entirely,
    while the plain mean is dragged by it."""
    from data_engineering_individual_assignment_spark.functions.stats import (
        trimmed_mean_udaf,
    )

    rows = [("g", float(v)) for v in range(1, 20)] + [("g", 1e9)]
    df = spark.createDataFrame(rows, "k string, v double")
    tm = trimmed_mean_udaf(0.1)
    got = df.groupBy("k").agg(tm(F.col("v")).alias("t")).first().t
    # sorted values 1..19, 1e9; trim k=2 -> interior = 3..18 -> mean 10.5
    assert abs(got - 10.5) < 1e-9
    plain = df.agg(F.avg("v")).first()[0]
    assert plain > 1e7


def test_pca_invariants_against_numpy_ground_truth(spark):
    """Distributed gram-partial PCA must reproduce numpy's exact
    covariance eigenstructure: descending eigenvalues, unit-norm
    orthogonal components, projected variance == eigenvalue, and
    decorrelated projections."""
    import numpy as np

    from data_engineering_individual_assignment_spark.operators import pca

    emb = load_table(spark, SF_SMALL, "embeddings")
    vals, comps, mean, trace = pca.fit_pca(emb, "embedding", dim=64, k=4)

    assert vals == sorted(vals, reverse=True)
    # shares divide by the TRACE (total variance), so the top-k shares
    # must sum to LESS than 1 on a 64-dim space
    assert 0 < sum(vals) / trace < 1
    C = np.array(comps)
    assert np.allclose(C @ C.T, np.eye(4), atol=1e-9)  # orthonormal

    # exact numpy reference on the collected matrix (500 x 64 — test-only)
    X = np.vstack([r.embedding for r in emb.select("embedding").collect()])
    ref_cov = np.cov(X.T, bias=True)
    ref_all = np.sort(np.linalg.eigvalsh(ref_cov))[::-1]
    assert np.allclose(vals, ref_all[:4], atol=1e-9)
    assert abs(trace - ref_all.sum()) < 1e-9

    proj = pca.project(emb, "embedding", comps, mean)
    stats = proj.agg(
        F.var_pop("pc0"), F.var_pop("pc1"), F.covar_pop("pc0", "pc1")
    ).first()
    assert abs(stats[0] - vals[0]) < 1e-9
    assert abs(stats[1] - vals[1]) < 1e-9
    assert abs(stats[2]) < 1e-9  # decorrelated


def test_ab_test_pooled_z_is_finite_and_consistent(spark):
    r = _q(spark, "ab_test_conversion").first()
    assert r.n_a > 0 and r.n_b > 0
    assert 0 < r.p_a < 1 and 0 < r.p_b < 1  # median split: non-degenerate
    assert r.z_stat is not None
    assert r.significant == (abs(r.z_stat) > 1.96)


def test_km_survival_curve_is_monotone_in_unit_interval(spark):
    rows = sorted(
        _q(spark, "km_survival_signup_to_error").collect(), key=lambda r: r.day
    )
    assert rows and rows[0].day == 0
    prev = 1.0 + 1e-9
    for r in rows:
        assert 0.0 <= r.survival <= 1.0
        assert r.survival <= prev  # survival never increases
        assert 0 <= r.n_events <= r.n_at_risk
        prev = r.survival


def test_moments_profile_respects_pearson_inequality(spark):
    rows = _q(spark, "moments_profile").collect()
    assert rows
    for r in rows:
        assert r.variance >= 0
        if r.skewness is None:  # constant column: guarded to NULL
            assert r.variance == 0
            continue
        # kurtosis >= skewness^2 + 1  =>  excess >= skew^2 - 2;
        # 1e-4 tolerance: both sides are 5-dp rounded
        assert r.excess_kurtosis >= r.skewness**2 - 2 - 1e-4


def test_source_entropy_bounded_by_vocab(spark):
    for r in _q(spark, "source_token_entropy").collect():
        assert 0 < r.entropy_nats
        assert 0 < r.normalized_entropy <= 1.0 + 1e-9


def test_pmi_collocations_support_floor_and_bounds(spark):
    import math

    docs_tokens = (
        load_table(spark, SF_SMALL, "documents")
        .select(F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("t"))
        .count()
    )
    rows = _q(spark, "token_pmi_collocations").collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r.c_ab >= 50  # support floor
        # PMI is bounded above by ln(n_uni / c_min) — loose sanity bound
        assert r.pmi <= math.log(docs_tokens) + 1e-6


def test_gini_in_unit_interval(spark):
    r = _q(spark, "gini_revenue_concentration").first()
    assert 0.0 <= r.gini < 1.0
    assert r.n_customers > 0 and r.total_revenue > 0


def test_decile_lift_partitions_rows_and_averages_to_one(spark):
    rows = sorted(_q(spark, "decile_lift_chart").collect(), key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, 11))
    n = [r.n for r in rows]
    assert max(n) - min(n) <= 1  # ntile balance
    total = sum(r.n for r in rows)
    weighted = sum(r.lift * r.n for r in rows) / total
    assert abs(weighted - 1.0) < 1e-3  # lifts average to 1 by construction
    # predictions within a decile ranking must be monotone across deciles
    preds = [r.predicted_mean for r in rows]
    assert preds == sorted(preds, reverse=True)


def test_percent_of_parent_shares_sum_to_one(spark):
    rows = _q(spark, "percent_of_parent_rollup").collect()
    assert rows
    by_region: dict = {}
    for r in rows:
        by_region.setdefault(r.region, []).append(r)
    region_shares = {}
    for region, rs in by_region.items():
        assert abs(sum(x.share_of_region for x in rs) - 1.0) < 1e-3
        region_shares[region] = rs[0].region_share_of_total
    assert abs(sum(region_shares.values()) - 1.0) < 1e-3
