#!/usr/bin/env python
"""Scale-headroom check: replicate the sf0.1 tables 10× (≈ sf1:
6M lineitem rows, 50k documents) into a temp dir, rerun headline
queries, and report the scaling exponent per query.

A query that "would survive 100×" should scale ~linearly (exponent ≈ 1)
or better; a quadratic operator shows exponent ≈ 2 here and gets fixed,
not shipped.  Usage: python scale_check.py [replication_factor]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    "pricing_summary",
    "star_join_revenue",
    "regression_ols",
    "rank_orders_per_customer",
    "asof_join_events_orders",
    "dedup_exact",
    "near_dup_pairs",
    "tumbling_window_counts",
    "text_stats",
    "contamination_check",
    "chunk_documents",
    "near_dup_clusters",
    "tfidf_top_terms",
    "event_funnel",
    "volume_shipping",
    "waiting_suppliers",
    "dup_span_fraction",
    "gap_fill_daily",
    "near_dup_clusters_star",
    "dedup_latest_event",
    "minhash_estimate_accuracy",
    "key_skew_profile",
    "pagerank_near_dup",
    "fuzzy_match_part_names",
    "rollup_multires",
    "kl_divergence_sources",
    "nucleus_corpus_selection",
    "interval_overlap_errors",
    "asof_forward_next_purchase",
    "heavy_hitter_tokens",
    "triangle_census_near_dup",
    "market_basket_lift",
    "cusum_changepoint",
    "vocab_coverage_curve",
    "ewma_daily",
    "expectation_suite",
    "snapshot_diff",
    "ab_test_conversion",
    "trimmed_mean_values",
    "kfold_ols_cv",
    "temporal_state_join",
    "small_order_parts",
    "min_cost_supplier",
    "embedding_pca_variance",
    "benford_price_screen",
    "zipf_fit_tokens",
    "arrow_native_token_median",
    "sql_scripting_coverage_search",
    "ann_pq_adc",
    # round 4 additions
    "global_rank_scalable",
    "decile_lift_scalable",
    "mann_whitney_value_shift",
    "chi_square_priority_status",
    "holt_linear_daily",
    "doc_cosine_pairs_sparse",
    "sorted_neighborhood_pairs",
    "cms_token_accuracy",
    "exact_median_refinement",
    "local_supplier_volume",
    "supplier_relationship_count",
    "dominant_part_suppliers",
    "target_encode_loo",
    "weighted_sample_topk",
    "group_sample_deterministic",
    "reconcile_corrupted_orders",
    "bigram_lm_perplexity",
    "negative_sampling_pairs",
    "top_session_paths",
    "near_dup_2core",
    "isotonic_price_curve",
    "rolling_distinct_users",
    "capped_decay_balance",
    "stl_decompose_anomalies",
    "segment_overlap_jaccard",
    "conversion_latency_quantiles",
    "sql_pivot_unpivot",
    "pareto_revenue_share",
    "join_fanout_estimate",
    "state_dwell_times",
    "lang_source_independence",
    "activity_heatmap",
    "boilerplate_chunks",
    # image_png_stats and audio_wav_features intentionally EXCLUDED: it caps at 256 docs, so
    # its exponent would be ~0 by construction — padding, not evidence
]

REPLICATED = ("lineitem", "orders", "customer", "events", "documents", "embeddings")
COPIED = ("region", "nation", "supplier", "part")


def replicate(spark, src: str, dst: str, factor: int) -> None:
    from pyspark.sql import functions as F

    from data_engineering_individual_assignment_spark.sources.readers import load_table

    os.makedirs(dst, exist_ok=True)
    for name in COPIED:
        load_table(spark, src, name).write.mode("overwrite").parquet(
            os.path.join(dst, f"{name}.parquet")
        )
    # key-shift each replica so ids stay unique and joins keep their
    # selectivity instead of becoming factor²-fanout self-intersections
    shifts = {
        "lineitem": ("l_orderkey", 10_000_000),
        "orders": ("o_orderkey", 10_000_000),
        "customer": ("c_custkey", 1_000_000),
        "events": ("event_id", 10_000_000),
        "documents": ("doc_id", 1_000_000),
        "embeddings": ("vec_id", 1_000_000),
    }
    extra = {
        "orders": ("o_custkey", 1_000_000),
        "events": ("user_id", 1_000_000),
    }
    for name in REPLICATED:
        df = load_table(spark, src, name)
        key, stride = shifts[name]
        parts = []
        for i in range(factor):
            part = df.withColumn(key, F.col(key) + F.lit(i * stride))
            if name in extra:
                k2, s2 = extra[name]
                part = part.withColumn(k2, F.col(k2) + F.lit(i * s2))
            if name == "documents" and i > 0:
                # remap replica i's tokens into a disjoint vocabulary
                # (suffix every token): intra-replica similarity structure
                # is preserved exactly, but replicas are NOT near-dups of
                # each other — otherwise every doc gains factor-1 exact
                # copies and the TRUE pair/cluster/graph answer grows
                # quadratically in the factor, which would measure output
                # size, not operator scaling
                part = part.withColumn(
                    "text", F.regexp_replace("text", r"(\S+)", f"$1x{i}")
                )
            parts.append(part)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(os.path.join(dst, f"{name}.parquet"))


def run_suite(spark, sf_dir: str) -> dict[str, float]:
    from data_engineering_individual_assignment_spark import plans
    from data_engineering_individual_assignment_spark.operators.dedup import (
        release_intermediates,
    )

    timings = {}
    for name in QUERIES:
        t0 = time.perf_counter()
        plans.CATALOG[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        timings[name] = round(time.perf_counter() - t0, 3)
        release_intermediates()
    return timings


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = "/root/testdata/sf0.1"
    from data_engineering_individual_assignment_spark.session import get_spark

    spark = get_spark("dei-spark-scale-check")
    spark.sparkContext.setLogLevel("ERROR")
    dst = tempfile.mkdtemp(prefix="dei_scale_")
    try:
        replicate(spark, src, dst, factor)
        base = run_suite(spark, src)  # warm
        base = run_suite(spark, src)
        big = run_suite(spark, dst)
        report = {}
        for q in QUERIES:
            exponent = math.log(max(big[q], 1e-3) / max(base[q], 1e-3)) / math.log(factor)
            report[q] = {
                "sf0.1_sec": base[q],
                f"x{factor}_sec": big[q],
                "scaling_exponent": round(exponent, 2),
            }
        print(json.dumps(report, indent=2))
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "SCALING_RUN.json"),
            "w",
        ) as f:
            json.dump(report, f, indent=2)
    finally:
        shutil.rmtree(dst, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
