"""Semantic invariants for the feature-engineering batch
(plans/features.py) — properties the DuckDB differential can't express:
funnel monotonicity, quantization reconstruction bounds, vote-count
arithmetic.  The cross-engine value checks live in
tests/test_queries_oracle.py like every other catalog query."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_individual_assignment_spark import plans
from data_engineering_individual_assignment_spark.sources.readers import load_table

from .conftest import SF_SMALL


def _q(spark, name):
    return plans.CATALOG[name].fn(spark, SF_SMALL)


def test_funnel_stages_are_monotone(spark):
    r = _q(spark, "event_funnel").first()
    assert r.n_users >= r.n_viewed >= r.n_clicked_after_view
    assert r.n_clicked_after_view >= r.n_purchased_after_click
    assert r.n_viewed > 0  # synthetic events always contain views


def test_cohort_week_zero_covers_every_user(spark):
    """Every user is active in their own cohort week, so summing the
    offset-0 rows must count every distinct user exactly once."""
    df = _q(spark, "cohort_retention")
    week0 = (
        df.filter(F.col("week_offset") == 0).agg(F.sum("n_users").alias("s")).first().s
    )
    n_users = (
        load_table(spark, SF_SMALL, "events").select("user_id").distinct().count()
    )
    assert week0 == n_users
    assert df.filter(F.col("week_offset") < 0).count() == 0


def test_bigram_transitions_conserve_events(spark):
    """Each user contributes exactly (events - 1) transitions."""
    total = _q(spark, "bigram_transitions").agg(F.sum("n").alias("s")).first().s
    e = load_table(spark, SF_SMALL, "events")
    n_events = e.count()
    n_users = e.select("user_id").distinct().count()
    assert total == n_events - n_users


def test_quantize_reconstruction_error_bounded(spark):
    """Dequantized values must sit within scale/2 of the original, and
    codes within the int8 range [-127, 127]."""
    emb = load_table(spark, SF_SMALL, "embeddings").filter(F.col("vec_id") < 10)
    q = _q(spark, "embedding_quantize")
    joined = emb.join(q, "vec_id").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        F.transform(F.split("q_vec", ","), lambda s: s.cast("double")).alias("codes"),
        "scale",
    )
    checked = joined.select(
        F.array_max(
            F.zip_with("v", "codes", lambda x, c: F.abs(x - c * F.col("scale")))
        ).alias("max_err"),
        F.array_max(F.transform("codes", F.abs)).alias("max_code"),
        "scale",
    ).collect()
    assert checked
    for r in checked:
        # rounded display scale adds <= 5e-7 * 127 of slack to the bound
        assert r.max_err <= r.scale / 2 + 1e-4
        assert r.max_code <= 127


def test_tfidf_rank_dense_and_scores_ordered(spark):
    df = _q(spark, "tfidf_top_terms").collect()
    by_doc: dict[int, list] = {}
    for r in df:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rows in by_doc.items():
        rnks = sorted(r.rnk for r in rows)
        assert rnks == list(range(1, len(rnks) + 1)), f"doc {doc_id} ranks {rnks}"
        ordered = sorted(rows, key=lambda r: r.rnk)
        scores = [r.score for r in ordered]
        assert scores == sorted(scores, reverse=True), f"doc {doc_id} not sorted"


def test_knn_votes_sum_to_k_at_most(spark):
    """The winning label's votes can't exceed k=5, and every query id
    below 20 present in the corpus gets exactly one prediction."""
    rows = _q(spark, "knn_label_vote").collect()
    qids = [r.query_id for r in rows]
    assert len(qids) == len(set(qids))
    for r in rows:
        assert 1 <= r.votes <= 5


def test_dim_stats_cover_all_dimensions(spark):
    rows = _q(spark, "embedding_dim_stats").collect()
    dims = [r.dim for r in rows]
    assert dims == list(range(1, len(dims) + 1))
    n_dim = len(
        load_table(spark, SF_SMALL, "embeddings").first().embedding
    )
    assert len(dims) == n_dim
    for r in rows:
        assert r.min_val <= r.mean_val <= r.max_val
        assert r.std_val >= 0
