"""Modern-surface batch 2 invariants (plans/surfaces.py): multi-file
_metadata provenance, session-variable idempotence, scripting loop
semantics.  Cross-engine value checks run in test_queries_oracle.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_individual_assignment_spark import plans
from data_engineering_individual_assignment_spark.sources.readers import load_table

from .conftest import SF_SMALL


def _q(spark, name):
    return plans.CATALOG[name].fn(spark, SF_SMALL)


def test_metadata_provenance_tracks_multi_file_layouts(spark, tmp_path):
    """_metadata.file_name must attribute every row to its actual shard
    in a multi-file directory — the manifest-free provenance contract."""
    out = str(tmp_path / "sharded")
    docs = load_table(spark, SF_SMALL, "documents")
    docs.repartition(3).write.mode("overwrite").parquet(out)
    per_file = (
        spark.read.parquet(out)
        .groupBy(F.col("_metadata.file_name").alias("f"))
        .count()
        .collect()
    )
    assert len(per_file) == 3
    assert sum(r["count"] for r in per_file) == docs.count()
    for r in per_file:
        assert r.f.endswith(".parquet") and r["count"] > 0
    # row_index is a within-file ordinal: dense from 0 per file
    idx = (
        spark.read.parquet(out)
        .groupBy(F.col("_metadata.file_name").alias("f"))
        .agg(F.min("_metadata.row_index"), F.max("_metadata.row_index"),
             F.count("*"))
        .collect()
    )
    for r in idx:
        assert r[1] == 0 and r[2] == r[3] - 1


def test_session_variable_query_is_rerunnable(spark):
    """DECLARE OR REPLACE makes the query idempotent in one session —
    running it twice must not raise or drift."""
    a = _q(spark, "session_variable_threshold").first()
    b = _q(spark, "session_variable_threshold").first()
    assert a == b
    assert a.n_above > 0 and a.min_above > a.threshold


def test_scripting_loop_finds_first_power_of_two_coverage(spark):
    r = _q(spark, "sql_scripting_coverage_search").first()
    assert r.coverage >= 0.5
    k = r.k_orders
    assert k >= 1 and (k & (k - 1)) == 0  # power of two
    # minimality: half the k must NOT reach coverage (unless k == 1)
    if k > 1:
        orders = load_table(spark, SF_SMALL, "orders")
        tot = orders.agg(F.sum("o_totalprice")).first()[0]
        half_k_cov = (
            orders.orderBy(F.desc("o_totalprice"), "o_orderkey")
            .limit(k // 2)
            .agg(F.sum("o_totalprice"))
            .first()[0]
            / tot
        )
        assert half_k_cov < 0.5


def test_zipf_fit_reports_plausible_exponent(spark):
    r = _q(spark, "zipf_fit_tokens").first()
    assert r.vocab_size > 0
    assert 0 <= r.r_squared <= 1
    # synthetic near-uniform vocab: alpha far below natural-language ~1
    assert -1.0 < r.zipf_alpha < 1.0
