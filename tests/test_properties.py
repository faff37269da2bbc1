"""Property-style checks (SURVEY §5 item 4): the tricky semantics hold
for generated inputs, not just fixtures.  Hypothesis generates the
corpus; each property evaluates in ONE Spark job over the whole batch
(per-example Spark jobs would be seconds each)."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

# weird-but-legal text: semicolons, control chars, literal backslash
# escapes, emoji, accents, surroged-free unicode
TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=60
)


@settings(max_examples=5, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=40))
def test_clean_text_idempotent_and_ascii(spark, strings):
    from data_engineering_individual_assignment_spark.functions.cleaning import (
        clean_text,
    )

    df = spark.createDataFrame([(i, s) for i, s in enumerate(strings)], "id long, s string")
    out = df.select(
        "id",
        clean_text("s").alias("once"),
        clean_text(clean_text("s")).alias("twice"),
    ).collect()
    for r in out:
        assert r["once"] == r["twice"]  # idempotent
        assert all(ord(c) < 128 for c in r["once"])  # pure ASCII
        assert ";" not in r["once"]
        assert not any(c in r["once"] for c in "\t\n\r")


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(st.text(alphabet="abc ", min_size=0, max_size=5), min_size=0, max_size=8),
        min_size=1,
        max_size=30,
    )
)
def test_posexplode_rowcount_identity(spark, tag_lists):
    """Σ|tags per video| == rows of the long table, and ordinals are a
    1..n dense sequence per video (the C14 melt identity)."""
    rows = [(i, tags) for i, tags in enumerate(tag_lists)]
    df = spark.createDataFrame(rows, "video_id long, tags array<string>")
    long = df.select("video_id", F.posexplode("tags").alias("pos", "v"))
    assert long.count() == sum(len(t) for t in tag_lists)
    per_video = (
        long.groupBy("video_id")
        .agg(F.count("*").alias("n"), F.max("pos").alias("mx"), F.min("pos").alias("mn"))
        .collect()
    )
    for r in per_video:
        assert r["mn"] == 0 and r["mx"] == r["n"] - 1


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.datetimes(
            min_value=dt.datetime(1990, 1, 1), max_value=dt.datetime(2100, 1, 1)
        ),
        min_size=1,
        max_size=40,
    )
)
def test_iso_slash_date_roundtrip(spark, stamps):
    """ISO-8601 -> 'yyyy/MM/dd' string -> DateType recovers the calendar
    date (C5's string dates lose nothing at day granularity)."""
    from data_engineering_individual_assignment_spark.functions.cleaning import (
        iso_to_slash_date,
        slash_date_to_date,
    )

    rows = [(i, ts.strftime("%Y-%m-%dT%H:%M:%SZ"), ts.date()) for i, ts in enumerate(stamps)]
    df = spark.createDataFrame(rows, "id long, iso string, expected date")
    out = df.select(
        "id", "expected", slash_date_to_date(iso_to_slash_date("iso")).alias("back")
    ).collect()
    for r in out:
        assert r["back"] == r["expected"]


@settings(max_examples=3, deadline=None)
@given(st.integers(min_value=2, max_value=40))
def test_dropna_equivalence(spark, n):
    """na.drop == filter(isNotNull) on a generated null pattern (P4)."""
    rows = [(i, None if i % 3 == 0 else float(i)) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, v double")
    a = sorted(r["id"] for r in df.na.drop(subset=["v"]).collect())
    b = sorted(r["id"] for r in df.filter(F.col("v").isNotNull()).collect())
    assert a == b


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=60,
    )
)
def test_global_rank_property(spark, values):
    """For ANY finite double list (duplicates, negatives, constants),
    global_rank under (value asc, id asc) equals the single-window
    row_number — the operator's defining property."""
    from pyspark.sql import Window

    from data_engineering_individual_assignment_spark.operators.ranking import (
        global_rank,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id long, v double"
    )
    got = global_rank(df, "v", [F.asc("id")], rank_col="r", n_buckets=5)
    ref = df.withColumn(
        "r_ref",
        F.row_number().over(Window.orderBy(F.asc("v"), F.asc("id"))).cast("long"),
    )
    assert (
        got.join(ref, ["id", "v"]).filter(F.col("r") != F.col("r_ref")).count()
        == 0
    )


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=50,
    ),
    st.integers(min_value=1, max_value=50),
)
def test_exact_kth_smallest_property(spark, values, k_seed):
    """Histogram-refinement selection equals the brute sort at an
    arbitrary rank for ANY finite double list."""
    from data_engineering_individual_assignment_spark.operators.order_stats import (
        exact_kth_smallest,
    )

    k = (k_seed - 1) % len(values) + 1
    df = spark.createDataFrame([(v,) for v in values], "x double")
    assert exact_kth_smallest(df, "x", k) == sorted(values)[k - 1]


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        # docs as token-index lists over a SMALL vocabulary so generated
        # corpora actually contain overlapping shingle sets (including
        # boundary pairs whose intersection exactly equals the required
        # overlap — the case PPJoin's positional bound must not prune)
        st.lists(st.integers(min_value=0, max_value=7), min_size=3, max_size=12),
        min_size=2,
        max_size=14,
    ),
    st.sampled_from([0.5, 0.7, 0.9]),
)
def test_jaccard_join_equals_brute_force(spark, token_lists, threshold):
    """Prefix + length + PPJoin positional filtering is EXACT: the
    pruned join returns precisely the brute-force pair set (no false
    negatives from any filter, no false positives past verification)."""
    from data_engineering_individual_assignment_spark.operators.dedup import (
        jaccard_join,
        release_intermediates,
    )

    k = 3
    texts = [" ".join(f"w{t}" for t in toks) for toks in token_lists]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_join(df, "text", "doc_id", threshold=threshold, k=k).collect()
    }
    release_intermediates()

    def shingles(toks):
        return {tuple(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    want = {}
    sets = [shingles(t) for t in token_lists]
    for a in range(len(sets)):
        for b in range(a + 1, len(sets)):
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter / union >= threshold:
                want[(a, b)] = round(inter / union, 6)
    assert got == want


@settings(max_examples=5, deadline=None)
@given(st.data())
def test_cosine_near_dup_pairs_equals_brute_force(spark, data):
    """Block-grid GEMM pair search is EXACT: equals the O(n²) python
    loop for random corpora with planted near-duplicates, across block
    counts (1 block = single-cell triangle; >n blocks = mostly empty
    cells) and thresholds."""
    import numpy as np

    from data_engineering_individual_assignment_spark.operators.similarity import (
        cosine_near_dup_pairs,
    )

    rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
    n = data.draw(st.integers(min_value=2, max_value=20))
    dim = 8
    num_blocks = data.draw(st.sampled_from([1, 3, 16]))
    threshold = data.draw(st.sampled_from([0.8, 0.95]))
    V = rng.normal(size=(n, dim))
    # plant a few near-identical clones so the threshold set is non-empty
    for i in range(0, n - 1, 5):
        V[i + 1] = V[i] + rng.normal(scale=1e-3, size=dim)
    rows = [(i, [float(x) for x in V[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in cosine_near_dup_pairs(
            df, threshold=threshold, num_blocks=num_blocks
        ).collect()
    }
    Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-300)
    want = {}
    for a in range(n):
        for b in range(a + 1, n):
            c = float(Vn[a] @ Vn[b])
            if c >= threshold:
                want[(a, b)] = round(c, 6)
    assert got == want


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
            min_size=8,
            max_size=8,
        ).filter(lambda v: sum(x * x for x in v) > 1e-6),
        min_size=6,
        max_size=30,
    )
)
def test_semdedup_window_inf_equals_within_cell_brute_force(spark, vectors):
    """With window >= cell size, semdedup_pairs must report EXACTLY the
    within-cell cos>=threshold pairs (dropped = greater id, keeper = the
    LOWEST matching smaller id) that a numpy brute force derives from
    the same deterministic assignment."""
    import numpy as np

    from data_engineering_individual_assignment_spark.operators.similarity import (
        semdedup_pairs,
    )

    thr = 0.9
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vectors)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    n_cells = 3
    got = {
        (r.cell_id, r.kept_id, r.dropped_id)
        for r in semdedup_pairs(
            df, num_cells=n_cells, threshold=thr, window=len(rows)
        ).collect()
    }

    # numpy reference: same centroid choice, same argmax w/ lowest-cell
    # tie-break, all within-cell pairs
    V = np.array([v for _, v in rows], dtype=float)
    cents = {i: V[i] for i in range(min(n_cells, len(rows)))}

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return float(a @ b / (na * nb)) if na > 0 and nb > 0 else 0.0

    assign = {}
    for i in range(len(rows)):
        best = max(cents, key=lambda c: (cos(V[i], cents[c]), -c))
        assign[i] = best
    expect = {}
    for j in range(len(rows)):
        keepers = [
            i
            for i in range(j)
            if assign[i] == assign[j] and cos(V[i], V[j]) >= thr
        ]
        if keepers:
            expect[(assign[j], min(keepers), j)] = True
    assert got == set(expect)


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["en", "de", "zh"]),
            st.lists(st.sampled_from("abcdefg"), min_size=2, max_size=12),
        ),
        min_size=3,
        max_size=25,
    )
)
def test_dsir_weights_equal_numpy_reference(spark, corpus):
    """The whole DSIR pipeline (hash buckets, smoothed distributions,
    micro-unit rounding, int64 sums) must equal an independent plain-
    Python derivation on generated corpora."""
    import hashlib
    import math

    from data_engineering_individual_assignment_spark.plans.training import (
        _DSIR_BUCKETS,
        _dsir_doc_buckets,
        dsir_lr_table,
    )
    from pyspark.sql import functions as F

    rows = [(i, lang, " ".join(toks)) for i, (lang, toks) in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        r.doc_id: (r.n_bigrams, r.weight_micro)
        for r in (
            _dsir_doc_buckets(df)
            .join(F.broadcast(dsir_lr_table(df)), "bucket")
            .groupBy("doc_id")
            .agg(
                F.sum("cnt").cast("bigint").alias("n_bigrams"),
                F.sum(F.col("cnt") * F.col("lr_micro"))
                .cast("bigint")
                .alias("weight_micro"),
            )
            .collect()
        )
    }

    def bucket(bg):
        return int(hashlib.md5(bg.encode()).hexdigest()[:8], 16) % _DSIR_BUCKETS

    raw: dict[int, int] = {}
    tgt: dict[int, int] = {}
    per_doc: dict[int, dict[int, int]] = {}
    for i, lang, text in rows:
        toks = text.strip().lower().split()
        for a, b in zip(toks, toks[1:]):
            h = bucket(f"{a} {b}")
            raw[h] = raw.get(h, 0) + 1
            if lang == "en":
                tgt[h] = tgt.get(h, 0) + 1
            per_doc.setdefault(i, {})[h] = per_doc.get(i, {}).get(h, 0) + 1
    nr, nt = sum(raw.values()), sum(tgt.values())
    B = float(_DSIR_BUCKETS)

    def rnd(x):  # round-half-away-from-zero, matching both engines
        return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)

    lr = {
        h: rnd(
            (math.log((tgt.get(h, 0) + 1.0) / (nt + B)) - math.log((r + 1.0) / (nr + B)))
            * 1_000_000
        )
        for h, r in raw.items()
    }
    expect = {
        i: (sum(c.values()), sum(cnt * lr[h] for h, cnt in c.items()))
        for i, c in per_doc.items()
    }
    assert got == expect


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=12),
        min_size=1,
        max_size=8,
    ),
    st.sampled_from([("a", "a"), ("a", "b"), ("b", "c"), ("c", "c")]),
)
def test_greedy_merge_matches_python_scan(spark, syms_lists, pair):
    """merge_pair_greedy == the textbook left-to-right non-overlapping
    scan, on arbitrary symbol runs (the run-parity edge 'aaaa...' is the
    hard case the string-encoded fold must get right)."""
    from data_engineering_individual_assignment_spark.operators.bpe import (
        merge_pair_greedy,
    )
    from pyspark.sql import functions as F

    def py_greedy(syms, l, r):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(syms_lists)], "i long, syms array<string>"
    )
    got = {
        r["i"]: r["m"]
        for r in df.select(
            "i", merge_pair_greedy(F.col("syms"), *pair).alias("m")
        ).collect()
    }
    for i, s in enumerate(syms_lists):
        assert got[i] == py_greedy(s, *pair), (s, pair)
