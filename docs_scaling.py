#!/usr/bin/env python
"""Regenerate SCALING.md from SCALING_RUN.json (the raw output of
scale_check.py).  The measured table is data; the design prose below it
is maintained here.  Run: python docs_scaling.py
"""

from __future__ import annotations

import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))

# Queries whose Spark plan intentionally keeps a single-task global
# window because they exist as the DIFFERENTIAL ANCHOR for a scalable
# twin that is measured alongside (same oracle SQL on both).
ANCHORS = {
    "decile_lift_chart": "decile_lift_scalable",
}

HEADER = """# SCALING — measured headroom + 100 TB design notes

## Measured: 10× replication check (`python scale_check.py 10`)

sf0.1 tables replicated 10× with key-shifting (≈ sf1: 6M lineitem rows,
100k orders-per-replica joins kept at original selectivity, 50k
documents, 1M events, 200k embeddings), local[32] (full catalog swept
round 7 under the shipped broadcast policy — hints unpinned, static
broadcasts off, AQE measured-size broadcasts only; rounds 8-9
re-measured the rows their changes touched — the jaccard-join
restructure family (r9: postings-shaped dfreq, partition-aligned
verify chain), the capped anchors (r9: caps folded into the plan as
1-row aggregates), the re-oracled queries, and the two new catalog
entries — via `--queries` merge: the FULL
catalog swept — every registered query except the {n_excluded}
bounded-by-construction asset caps listed in `scale_check.EXCLUDED`;
base timings are the second warm pass, raw numbers in
SCALING_RUN.json, re-measured entries merged via
`scale_check.py 10 --queries ...`).
Document replicas get a token-remapped (disjoint) vocabulary: verbatim
copies would make every doc gain factor-1 exact duplicates, growing the
TRUE near-dup pair/cluster/graph answer quadratically in the factor —
that measures output size, not operator scaling (measured: verbatim
replication pushes near_dup_pairs to exponent ~1.06; remapped, the same
plan is 0.28).

Table sorted by exponent (worst first).

| query | sf0.1 (s) | ×10 (s) | scaling exponent* |
|---|---|---|---|
"""

MIDDLE = """
\\* log(t_big/t_small)/log(10) — 1.0 = linear, <1 = overhead-dominated
(good headroom), ≈2 would flag an accidental quadratic.

**{n} queries measured; max exponent {maxe:.2f}** excluding the one
documented single-task-window anchor: `decile_lift_chart` ({anchor_e:.2f})
deliberately keeps `Window.orderBy().ntile()` as the three-way
differential anchor (Spark window ntile == DuckDB window ntile == the
bucketed reconstruction), while its production form
`decile_lift_scalable` — same semantics, `global_rank +
ntile_from_rank` — measures {twin_e:.2f}.  Since round 8 the anchor's
window INPUT is md5-sample-capped above 100k rows (fit and global mean
stay full-table; the cap never bites at oracle scales and the capped
branch is itself hash-checked against DuckDB at sf0.1), so even the
anchor has no component that grows with the corpus.  Prior rounds: r4
max 0.53 over 82 queries, r3 0.56, r2 0.79.

The worst non-anchor rows sit at ~0.51-0.55 and are per-row-compute
queries (`bpe_token_estimate`'s regex token passes,
`capped_decay_balance`'s grouped-map recursion, `ngram_novelty`'s
cross-doc explode): their ×10 run is compute-bound rather than
overhead-bound — linear work, honest exponent.
(`sql_scripting_coverage_search`, the former 0.67 tail, now caches the
skinny price projection once inside the script — its O(log answer)
loop iterations re-scan the columnar cache, not parquet: 0.41.)  `embedding_near_dup`, the EXACT all-pairs cosine baseline
(quadratic by definition — r7 measured 1.21 at ×100 uncapped), is
md5-sample-capped above 30k vectors since round 8; its scale paths
`embedding_lsh_near_dup` / `semdedup_cells` / `ann_*` are measured
alongside, uncapped.

This harness has now caught and fixed one real super-linear bug per
round it grew:

- round 8 (subset re-measure): the exact-cosine block grid fed BOTH
  sides of its self-cogroup from ONE shared projection; Catalyst's
  attribute dedup pointed the right side's vid/vec at the left side's
  ids, which made a downstream count() column-prune them out of the
  right child (worker KeyError) and inflated the ×10 row 2.4 s → 17.9 s
  even uncapped.  Each side now builds its own projection (fresh
  expression ids): ×10 back to 3.4 s, count() pinned by a regression
  test.

- round 7 (100× extension): the STATIC planner broadcast corpus-sized
  shingle/prefix relations inside `jaccard_join` (Catalyst's
  parquet-based size estimate undercounts array relations ~10×) and
  OOM'd the 8 GiB driver at ×100 on the loose-threshold queries.
  The shipped fix is session-level, not per-join: static broadcasts
  are disabled entirely (`autoBroadcastJoinThreshold=-1`) and only
  AQE may broadcast, from MEASURED post-shuffle sizes
  (`adaptive.autoBroadcastJoinThreshold=64m` — session.py).  Per-join
  `.hint("merge")` was tried first and dropped (2-3× bench cost);
  `.hint("shuffle_hash")` fails outright at ×100 (SHJ's build side
  cannot spill).  Under the policy the whole family re-measured green
  (`dedup_threshold_curve` 0.66, `near_dup_pairs` 0.37 at ×100).

- round 4: `doc_cosine_pairs_sparse` measured 2.54 with only a relative
  (10%-of-corpus) document-frequency cap — replica-local stopwords kept
  per-token df flat while n grew, letting df² posting joins through; an
  absolute df<=200 posting cap brought it to ~0.15.
- round 5 (full-catalog sweep): `embedding_near_dup` measured **1.45**
  (403 s at ×10) — the exact cosine baseline materialized every
  candidate pair as a shuffled row.  Rewritten as a block-pair grid
  (O(n·blocks) replication, chunked BLAS gemm per grid cell, pairs
  above threshold only): **0.37** (2.7 s at ×10).  The same sweep
  exposed `asof_join_pandas_variant`'s per-KEY Python invocation
  (38.9 s base constant; exponent was fine) — bucketed
  `merge_asof(by=key)` cut it to 1.8 s — and the single-task ntile
  window in `equi_depth_histogram` (0.73 → 0.17 via `global_rank +
  ntile_from_rank`).

Near-zero or negative exponents are fixed-cost-dominated queries whose
×10 run reuses JIT'd code and warmed parquet footers.  Nothing outside
the documented anchor exhibits exponent > {maxe:.2f}.
"""

TAIL = """
## Why the same plans hold at 1000 executors / 100 TB

- **Scans**: predicates and projections are pushed into parquet
  (PLANS.md, tests/test_plans.py) — bytes read scale with selectivity,
  not table size.  Partitioned warehouse writes add partition pruning
  on ingest_date for the daily tables.
- **Joins**: BOUNDED dimensions (region=5, nation=25, scalar/aggregate
  sides) carry explicit broadcast hints — no fact shuffle, and they can
  never outgrow memory.  sf-SCALING relations (customer, part — TPC-H
  ×sf ratios) are deliberately UNHINTED: below the 64 MB session
  `autoBroadcastJoinThreshold` Catalyst still picks BHJ (same plan the
  bench measures), and beyond it AQE degrades to shuffle join instead
  of OOMing a pinned broadcast — the strategy-independence sweep
  (tests/test_broadcast_independence.py) proves every plan also runs
  correctly in the forced-SMJ regime.  Fact-fact joins can pre-pay
  their shuffle via bucketed tables (zero-Exchange SMJ proven in
  tests); hot keys have AQE skew-split plus explicit `salted_join`.
- **Aggregations**: partial+final everywhere (map-side combine), so the
  shuffle carries one row per (partition × group), not per input row.
  Sketches (`approx_sketches`) swap exactness for constant memory when
  group cardinality explodes.
- **Dedup/similarity**: shuffle payloads are digests (16-byte md5 /
  8-byte xxhash64), never documents.  Near-dup candidate generation is
  prefix-filter or banded-LSH bucket joins — O(n·candidates), no
  all-pairs operator exists in any plan (asserted: no CartesianProduct).
  The one exact all-pairs QUERY (`embedding_near_dup`, the oracle
  anchor for the LSH path) is a block-grid gemm: Θ(n²) flops by
  definition, but O(n·blocks) shuffle rows and O((n/blocks)·dim)
  per-task memory — raise `num_blocks` with n.
- **As-of**: union-merge carry-forward — O((|L|+|R|) log) per key,
  immune to per-key fan-out, one shuffle; the Arrow `merge_asof` twin
  buckets keys so Python is called per BUCKET, never per key.
- **Windows/streaming**: identical logical plans run as
  Structured-Streaming with watermark-bounded state; ingestion is
  checkpointed AvailableNow with per-partition dynamic overwrite —
  reruns and retries cannot duplicate.  Global numbering (rank, ntile,
  Pareto shares, equi-depth buckets) never uses the single-task
  `Window.orderBy()` — `operators/ranking.global_rank` keeps it
  distributed (the one documented anchor above excepted).
- **Python boundary**: only Arrow-vectorized (pandas UDF / mapInPandas)
  and only where JVM expressions can't express the op (codec stubs,
  merge_asof variant, block cosine).  No row-at-a-time Python UDFs, no
  driver-side loops, and the only `collect()` in the package pulls one
  row at the serving boundary.

## Knobs that change per deployment (not per query)

`spark.sql.shuffle.partitions` sized to ~128-256 MB post-shuffle
partitions; `spark.sql.files.maxPartitionBytes` likewise for scans; AQE
coalescing then right-sizes at runtime.  Bucket counts for the bucketed
warehouse tables follow data volume (tests use 8; a 100 TB fact table
wants thousands).  All set in `session.py` / table DDL, never inside
operator code.
"""


def main() -> None:
    with open(os.path.join(HERE, "SCALING_RUN.json")) as f:
        run = json.load(f)
    import scale_check

    rows = sorted(
        run.items(), key=lambda kv: -kv[1]["scaling_exponent"]
    )
    lines = [HEADER.format(n_excluded=len(scale_check.EXCLUDED))]
    for name, r in rows:
        mark = " †" if name in ANCHORS else ""
        lines.append(
            f"| {name}{mark} | {r['sf0.1_sec']:.2f} | {r['x10_sec']:.2f} "
            f"| {r['scaling_exponent']:.2f} |\n"
        )
    lines.append(
        "\n† single-task-window differential anchor by design (input "
        "md5-sample-capped above 100k rows since round 8, so the "
        "single-task sort is bounded at every scale) — see note below.\n"
    )
    # optional 100x spot-check (scale_check.py 100 --queries ...; print-only
    # run captured to SCALING_100X.json): two decades of scale headroom for
    # the flagship queries
    x100_path = os.path.join(HERE, "SCALING_100X.json")
    if os.path.exists(x100_path):
        with open(x100_path) as f:
            x100 = json.load(f)
        lines.append(
            f"\n## 100× spot-check ({len(x100)} queries)\n\n"
            "`scale_check.py 100` replicates sf0.1 one-hundred-fold "
            "(60M lineitem rows, 500k documents — two DECADES above the "
            "base measurement) and reruns the queries below — every "
            "§2.11 LLM-pipeline op, every join/explode query, the full "
            "unpinned TPC-H batch, and the maintenance audits — at the "
            "DEFAULT 8 GiB driver (round 7: the round-5 "
            "SPARK_DRIVER_MEMORY=48g requirement is GONE — it was the "
            "pinned broadcasts; with those unpinned and the session's "
            "measured-sizes-only broadcast policy (static threshold -1, "
            "AQE threshold 64m — session.py), nothing needs an inflated "
            "heap).\n\n"
            "Round 8 removed the two formerly super-linear rows at the "
            "source: `embedding_near_dup` — the EXACT all-pairs cosine "
            "baseline, quadratic by definition — is now md5-sample-"
            "capped above 30k vectors (deterministic and engine-"
            "portable; never bites at oracle scales, so the DuckDB "
            "differential still checks the full exact answer), with its "
            "production paths `embedding_lsh_near_dup` / "
            "`semdedup_cells` measured alongside; and the "
            "`interval_overlap_errors` replication artifact is fixed in "
            "the harness (each events replica now shifts into a "
            "disjoint decade, so the TRUE overlap answer scales "
            "linearly instead of quadratically in the factor).\n\n"
            "Round 10 found and fixed the third replication artifact, "
            "this time in the EMBEDDINGS table: replicas kept identical "
            "vectors, so every vector gained factor-1 exact clones and "
            "the near-dup families' TRUE answer (and their LSH bucket "
            "occupancy) grew quadratically in the factor — each replica "
            "now applies a deterministic md5-parity ±1 coordinate mask, "
            "which preserves every intra-replica dot product EXACTLY "
            "(sign flips cancel pairwise) while collapsing cross-replica "
            "cosines to ~0.  Re-measured on the fixed harness after "
            "restructuring both operators (signatures computed row-"
            "locally as literal-plane zip_with folds instead of a "
            "posexplode×plane join-aggregate; only the skinny "
            "(id, bucket)/(id, rank) relations persist across the "
            "candidate self-joins; vectors fetched by id equi-join "
            "AFTER candidate generation): `embedding_lsh_near_dup` "
            "0.66 → 0.44 and `semdedup_cells` 0.63 → 0.29, with the "
            "sample-capped exact baseline `embedding_near_dup` "
            "unchanged (0.25 → 0.26) as the control.\n\n"
            "`bpe_token_estimate`, the current table max (0.67), is "
            "documented compute-bound LINEAR: the query is a single "
            "`regexp_count` codegen map plus an output sort, and its "
            "per-unit compute rate is stable across both probes "
            "(k ≈ 0.086 s per sf0.1-unit from the ×10 row, 0.089 from "
            "the ×100 row) under a ~0.3-0.4 s fixed session/plan "
            "overhead — the two-point exponent understates exactly that "
            "overhead amortizing, not any super-linear work.\n\n"
            "| query | sf0.1 s | ×100 s | exponent |\n|---|---|---|---|\n"
        )
        for name, r in sorted(
            x100.items(), key=lambda kv: -(kv[1]["scaling_exponent"] or 0)
        ):
            lines.append(
                f"| {name} | {r['sf0.1_sec']:.2f} | {r['x100_sec']:.2f} "
                f"| {r['scaling_exponent']:.2f} |\n"
            )
        worst = max(r["scaling_exponent"] for r in x100.values())
        lines.append(
            f"\nAll {len(x100)} queries complete at 100× on the default "
            f"8 GiB driver; max exponent {worst:.2f} — "
            "no super-linear row remains: sublinear across two decades "
            "(doubling the data less than doubles the work).\n"
        )
    # optional 300x spot-check for the hottest jaccard-family operators
    # (scale_check.py 300 --queries ...; print-only, merged by hand)
    x300_path = os.path.join(HERE, "SCALING_300X.json")
    if os.path.exists(x300_path):
        with open(x300_path) as f:
            x300 = {k: v for k, v in json.load(f).items()
                    if not k.startswith("_")}
        lines.append(
            "\n## 300× spot-check (hottest dedup paths)\n\n"
            "The 100 TB claim for the hottest operators should not rest "
            "on a single 100× extrapolation: `scale_check.py 300` "
            "replicates sf0.1 three-hundred-fold (180M lineitem rows, "
            "1.5M documents, 600k vectors — half a decade beyond the "
            "100× table) on the default 8 GiB driver.  Jaccard family: "
            "exponents rise mildly against their 100× rows (0.44→0.57, "
            "0.40→0.48, 0.56→0.65) and stay sub-linear — no breaking "
            "constraint (driver memory, single-stage skew) surfaced.  "
            "Embedding family: the catalog queries pin signature width "
            "(12 planes) and cell count (8) as ORACLE CONSTANTS, and at "
            "fixed width LSH bucket occupancy grows with n — the "
            "intrinsic LSH scaling law, visible as the 0.86/0.66 stress "
            "rows.  Both operators parameterize the knob; scaled with n "
            "the way production would run them (num_planes 12→20, "
            "num_cells 8→64 — recall for exact clones is unaffected, "
            "identical vectors collide at any width), the SAME 300× "
            "corpus runs 268.7 s → 59.3 s and 126.1 s → 40.8 s "
            "(whole-run exponents 0.60 / 0.46), measured by the knob "
            "rows below.\n\n"
            "| query | sf0.1 s | ×300 s | exponent |\n|---|---|---|---|\n"
        )
        for name, r in sorted(
            x300.items(),
            key=lambda kv: -(kv[1].get("scaling_exponent") or 0),
        ):
            base = (
                f"{r['sf0.1_sec']:.2f}" if "sf0.1_sec" in r else "(knob run)"
            )
            exp = r.get(
                "scaling_exponent",
                r.get("scaling_exponent_vs_12plane_base")
                or r.get("scaling_exponent_vs_8cell_base"),
            )
            lines.append(
                f"| {name} | {base} | {r['x300_sec']:.2f} | {exp:.2f} |\n"
            )
    # stateful-streaming twins (stream_scale_check.py): the batch sweep
    # cannot see Structured-Streaming state management, so their 10x
    # evidence is measured separately with stream==batch asserted
    stream_path = os.path.join(HERE, "SCALING_STREAM.json")
    if os.path.exists(stream_path):
        with open(stream_path) as f:
            stream = json.load(f)
        lines.append(
            "\n## Stateful streaming twins at 10× "
            "(`python stream_scale_check.py`)\n\n"
            "The batch sweeps above cannot exercise Structured-Streaming "
            "state management (micro-batch replay, state store restore, "
            "update-mode emission).  This harness replays the 10× "
            "document corpus through the HEAVY streaming twins and "
            "asserts stream == batch at BOTH scales before timing "
            "anything: `heavy_hitters_stream` (bounded Misra-Gries "
            "state via applyInPandasWithState; final-state candidates "
            "must contain every MG-guaranteed item), "
            "`incremental_dedup_stream` (stream-static anti-join; "
            "survivor set compared by bounded aggregates), `cms_stream` "
            "(complete-mode bounded-cell aggregate; cells equal "
            "cms_build's bit-for-bit), `lsh_dedup_stream` "
            "(stream-static banded MinHash-LSH near-dup rejection; "
            "matches equal the batch run of the same operator).\n\n"
            "| stream twin | sf0.1 (s) | ×10 (s) | exponent |\n"
            "|---|---|---|---|\n"
        )
        for name, r in sorted(
            stream.items(), key=lambda kv: -kv[1]["scaling_exponent"]
        ):
            lines.append(
                f"| {name} | {r['sf0.1_sec']:.2f} | {r['x10_sec']:.2f} "
                f"| {r['scaling_exponent']:.2f} |\n"
            )
    non_anchor = [
        r["scaling_exponent"] for n, r in run.items() if n not in ANCHORS
    ]
    lines.append(
        MIDDLE.format(
            n=len(run),
            maxe=max(non_anchor),
            anchor_e=run["decile_lift_chart"]["scaling_exponent"],
            twin_e=run["decile_lift_scalable"]["scaling_exponent"],
        )
    )
    lines.append(TAIL)
    with open(os.path.join(HERE, "SCALING.md"), "w") as f:
        f.write("".join(lines))
    print(f"SCALING.md: {len(run)} rows, max non-anchor exponent "
          f"{max(non_anchor):.2f}")


if __name__ == "__main__":
    main()
