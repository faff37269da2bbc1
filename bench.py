#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall-clock of the headline suite.  Each query is
forced with a cheap count() action after a fresh plan build, so the
number reflects scan+plan+execute, not cached results.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pricing_summary",
    "shipping_priority",
    "star_join_revenue",
    "regression_ols",
    "rank_orders_per_customer",
    "asof_join_events_orders",
    "dedup_exact",
    "near_dup_pairs",
    "ann_brute_force",
    "tumbling_window_counts",
    "text_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from data_engineering_individual_assignment_spark import plans
    from data_engineering_individual_assignment_spark.session import get_spark

    spark = get_spark("dei-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so per-query numbers measure the
    # engine, not first-touch JIT/classloading
    plans.CATALOG["pricing_summary"].fn(spark, sf_dir).count()

    def run(df) -> None:
        # noop sink forces EVERY column to be computed (count() would let
        # Catalyst prune the projections we're trying to measure)
        df.write.format("noop").mode("overwrite").save()

    from data_engineering_individual_assignment_spark.operators.dedup import (
        release_intermediates,
    )

    # median-of-5 per query makes the number adjudicable: a single
    # contended run can't masquerade as a regression, and a real
    # regression can't hide behind "contention" (round-5 medians on a
    # loaded box swung +64% with NO plan change at median-of-3 — the
    # two discarded extremes were not enough).  The unpersist of dedup
    # intermediates happens OUTSIDE the timed window.  Total wall-clock
    # stays well under 2 min at sf0.1.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    extra_runs: dict[str, int] = {}
    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    for name in HEADLINE:
        q = plans.CATALOG[name]
        samples: list[float] = []
        for _ in range(extra_runs.get(name, runs)):
            release_intermediates()  # outside the timed window
            t0 = time.perf_counter()
            run(q.fn(spark, sf_dir))
            samples.append(round(time.perf_counter() - t0, 3))
        release_intermediates()
        samples.sort()
        all_runs[name] = samples
        timings[name] = samples[len(samples) // 2]
    total = round(sum(timings.values()), 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # 1-minute load average: lets a reviewer tell a contended-box sample
    # spread apart from a real plan regression when comparing rounds
    try:
        loadavg = round(os.getloadavg()[0], 2)
    except OSError:
        loadavg = None
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "runs": runs,
                "median": True,
                "samples": all_runs,
                "loadavg_1m": loadavg,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
