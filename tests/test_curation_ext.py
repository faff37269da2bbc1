"""Unit tests for the training-data hygiene extensions: Gopher-style
quality heuristics, PII scrubbing, and benchmark decontamination.
The catalog queries run the same code differentially against DuckDB
(tests/test_queries_oracle.py); these tests pin the semantics on
hand-computed fixtures, including planted PII the synthetic corpus
doesn't contain."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_individual_assignment_spark.functions import text as TX


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], "text string").select(
        col.alias("v")
    ).first()["v"]


def test_mean_word_length_and_repetition(spark):
    assert _one(spark, "aa bbbb cc", TX.mean_word_length("text")) == (8 / 3)
    assert _one(spark, "  ", TX.mean_word_length("text")) == 0.0
    # 5 tokens, 3 distinct -> 2/5 repeat
    assert _one(spark, "a b a b c", TX.repetition_ratio("text")) == 0.4
    assert _one(spark, "", TX.repetition_ratio("text")) == 0.0
    # bigrams of "a b a b a": [a b, b a, a b, b a] -> 2 distinct of 4
    assert _one(spark, "a b a b a", TX.bigram_repetition_ratio("text")) == 0.5
    assert _one(spark, "solo", TX.bigram_repetition_ratio("text")) == 0.0


def test_scrub_pii_planted(spark):
    s = _one(
        spark,
        "mail a.b+c@x.co.uk or 555-123-4567 from 10.0.0.1 now",
        TX.scrub_pii("text"),
    )
    assert s == "mail <EMAIL> or <PHONE> from <IP> now"
    # dotted phone must be taken by the PHONE pass, not the IP pass
    assert _one(spark, "call 333.444.5555", TX.scrub_pii("text")) == "call <PHONE>"
    # counts
    df = spark.createDataFrame(
        [("a@b.io and c@d.io", )], "text string"
    )
    n = df.select(TX.pii_count("text", TX.EMAIL_RE).alias("n")).first()["n"]
    assert n == 2


def test_contamination_pairs_planted(spark):
    from data_engineering_individual_assignment_spark.operators.dedup import (
        contamination_pairs,
    )

    bench = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # shares 'quick brown fox' and 'brown fox jumps' (2 trigrams)
            (100, "a quick brown fox jumps here"),
            (101, "completely unrelated words only appear within this row"),
        ],
        "doc_id long, text string",
    )
    out = {(r["doc_id"], r["bench_id"]): r["n_shared"] for r in contamination_pairs(
        corpus, bench, "text", "doc_id", k=3, min_shared=2
    ).collect()}
    assert out == {(100, 1): 2}
    # threshold excludes the pair
    assert contamination_pairs(
        corpus, bench, "text", "doc_id", k=3, min_shared=3
    ).count() == 0


def test_token_chunks_overlap_semantics(spark):
    import pytest

    words = " ".join(f"w{i}" for i in range(10))
    chunks = _one(spark, words, TX.token_chunks("text", size=4, stride=3))
    # starts at 0,3,6,9 — last window is short (1 token)
    assert chunks == [
        "w0 w1 w2 w3",
        "w3 w4 w5 w6",
        "w6 w7 w8 w9",
        "w9",
    ]
    # a doc shorter than one window yields exactly one chunk
    assert _one(spark, "a b", TX.token_chunks("text", 4, 3)) == ["a b"]
    with pytest.raises(ValueError):
        TX.token_chunks("text", 4, 0)


def test_compression_ratio_separates_boilerplate(spark):
    df = spark.createDataFrame(
        [
            (1, "spam " * 400),                      # highly redundant
            (2, " ".join(f"tok{i * 7919 % 104729}" for i in range(400))),
        ],
        "doc_id long, text string",
    )
    ratio = TX.compression_ratio_udf()(F.col("text"))
    out = {r["doc_id"]: r["r"] for r in df.select("doc_id", ratio.alias("r")).collect()}
    assert out[1] < 0.05          # pure repetition compresses to nothing
    assert out[2] > 0.3           # varied tokens stay incompressible-ish
    assert out[1] < out[2]


def test_compression_ratio_null_and_empty_are_null(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "some actual text here")],
        "doc_id long, text string",
    )
    ratio = TX.compression_ratio_udf()(F.col("text"))
    out = {r["doc_id"]: r["r"] for r in df.select("doc_id", ratio.alias("r")).collect()}
    assert out[1] is None and out[2] is None
    assert out[3] is not None and out[3] > 0


def test_segment_dedup_first_occurrence_survives(spark):
    """A segment duplicated across documents survives only in the lowest
    (doc_id, seg_idx); totals conserve: sum(n_kept) == distinct segments."""
    from data_engineering_individual_assignment_spark.plans.curation import (
        segment_dedup_reassembly,
        _SEG,
    )

    base = " ".join(f"w{i}" for i in range(_SEG))  # one exact segment
    uniq = lambda tag: " ".join(f"{tag}{i}" for i in range(_SEG))
    import os, tempfile

    with tempfile.TemporaryDirectory() as tmp:
        docs = spark.createDataFrame(
            [
                (0, base + " " + uniq("a"), "en", "s", 0),
                (1, uniq("b") + " " + base, "en", "s", 0),  # dup seg at idx 1
                (2, base + " " + base, "en", "s", 0),  # self-dup too
            ],
            "doc_id long, text string, lang string, source string, n_chars int",
        )
        docs.write.parquet(os.path.join(tmp, "documents.parquet"))
        out = {
            r["doc_id"]: (r["n_segments"], r["n_kept"])
            for r in segment_dedup_reassembly(spark, tmp).collect()
        }
    # doc 0 owns the shared segment (first occurrence): keeps both
    assert out[0] == (2, 2)
    # doc 1's copy of `base` is a duplicate
    assert out[1] == (2, 1)
    # doc 2 duplicates `base` twice over
    assert out[2] == (2, 0)
    # conservation: kept == distinct segments (4 distinct: base, a, b)
    assert sum(k for _, k in out.values()) == 3


def test_dup_span_removal_merges_overlapping_spans(spark):
    """A 10-token run shared by two documents yields THREE duplicated
    8-gram start positions that merge into ONE maximal span covering
    all 10 tokens; both copies are removed and each document
    re-assembles from its unique remainder."""
    import hashlib
    import os
    import tempfile

    from data_engineering_individual_assignment_spark.plans.curation import (
        dup_span_removal,
    )

    shared = " ".join(f"s{i}" for i in range(10))
    a_tail = " ".join(f"a{i}" for i in range(8))
    b_head = " ".join(f"b{i}" for i in range(8))
    with tempfile.TemporaryDirectory() as tmp:
        docs = spark.createDataFrame(
            [
                (0, shared + " " + a_tail, "en", "s", 0),
                (1, b_head + " " + shared, "en", "s", 0),
            ],
            "doc_id long, text string, lang string, source string, n_chars int",
        )
        docs.write.parquet(os.path.join(tmp, "documents.parquet"))
        out = {r.doc_id: r for r in dup_span_removal(spark, tmp).collect()}
    assert out[0].n_tokens == 18 and out[1].n_tokens == 18
    # one merged span of 10 tokens on each side
    assert out[0].n_spans == 1 and out[1].n_spans == 1
    assert out[0].tokens_removed == 10 and out[1].tokens_removed == 10
    assert out[0].surviving_md5 == hashlib.md5(a_tail.encode()).hexdigest()
    assert out[1].surviving_md5 == hashlib.md5(b_head.encode()).hexdigest()


def test_dup_span_removal_merges_exactly_adjacent_spans(spark):
    """Two duplicated 8-grams whose heads sit exactly 8 apart cover a
    contiguous 16-token range -> ONE maximal span (the widened q >= p-8
    merge predicate), not two."""
    import os
    import tempfile

    from data_engineering_individual_assignment_spark.plans.curation import (
        dup_span_removal,
    )

    g = " ".join(f"g{i}" for i in range(8))
    h = " ".join(f"h{i}" for i in range(8))
    with tempfile.TemporaryDirectory() as tmp:
        docs = spark.createDataFrame(
            [
                (0, g + " " + h, "en", "s", 0),  # dup heads at 1 and 9
                (1, g, "en", "s", 0),
                (2, h, "en", "s", 0),
            ],
            "doc_id long, text string, lang string, source string, n_chars int",
        )
        docs.write.parquet(os.path.join(tmp, "documents.parquet"))
        out = {r.doc_id: r for r in dup_span_removal(spark, tmp).collect()}
    assert out[0].n_spans == 1  # adjacent spans merged into one range
    assert out[0].tokens_removed == 16


def test_segment_hashes_empty_and_null_guard(spark):
    """Empty token arrays yield ZERO segments (not the descending
    sequence(0,-1) phantom pair); null arrays stay null."""
    df = spark.createDataFrame([(0, []), (1, None)], "i long, toks array<string>")
    out = {
        r["i"]: r["h"]
        for r in df.select(
            "i", TX.segment_hashes(F.col("toks"), 8).alias("h")
        ).collect()
    }
    assert out[0] == []
    assert out[1] is None


def test_dedup_pipeline_roi_stage_accounting(spark):
    """End-to-end dedup ROI on a crafted corpus: stage 1 drops the exact
    copy, stage 2 removes the cross-doc 8-gram span from both owners,
    stage 3 collapses the near-dup pair keeping the longer member —
    and tokens conserve exactly at every boundary."""
    import os
    import tempfile

    from data_engineering_individual_assignment_spark.plans.curation import (
        dedup_pipeline_roi,
    )

    u = " ".join(f"u{i}" for i in range(12))
    shared8 = " ".join(f"s{i}" for i in range(8))
    a4 = " ".join(f"a{i}" for i in range(4))
    b4 = " ".join(f"b{i}" for i in range(4))
    n7 = " ".join(f"n{i}" for i in range(7))
    with tempfile.TemporaryDirectory() as tmp:
        docs = spark.createDataFrame(
            [
                (0, u, "en", "s", 0),
                (1, u, "en", "s", 0),  # exact dup -> dropped at stage 1
                (2, shared8 + " " + a4, "en", "s", 0),  # span owners
                (3, b4 + " " + shared8, "en", "s", 0),
                (4, n7, "en", "s", 0),  # near-dup pair (J = 5/6)
                (5, n7 + " nx", "en", "s", 0),
            ],
            "doc_id long, text string, lang string, source string, n_chars int",
        )
        docs.write.parquet(os.path.join(tmp, "documents.parquet"))
        rows = {r.stage: r for r in dedup_pipeline_roi(spark, tmp).collect()}
    assert rows["raw"].n_docs == 6 and rows["raw"].n_tokens == 63
    assert rows["exact_dedup"].n_docs == 5
    assert rows["exact_dedup"].n_tokens == 51
    # span removal drops no DOCS, only the 2x8 shared-span tokens
    assert rows["span_removal"].n_docs == 5
    assert rows["span_removal"].n_tokens == 51 - 16
    # near-dup cluster {4,5} keeps doc 5 (8 rewritten tokens > 7)
    assert rows["near_dup_survivors"].n_docs == 4
    assert rows["near_dup_survivors"].n_tokens == 35 - 7
    # stage ordinals are the sort key and stages are monotone
    t = [rows[s].n_tokens for s in
         ("raw", "exact_dedup", "span_removal", "near_dup_survivors")]
    assert t == sorted(t, reverse=True)


def test_dedup_pipeline_roi_monotone_on_corpus(spark):
    """On the real sf0.001 corpus the stage accounting is monotone
    non-increasing in both docs and tokens, and span removal never
    drops a document."""
    from data_engineering_individual_assignment_spark.plans.curation import (
        dedup_pipeline_roi,
    )

    rows = sorted(
        dedup_pipeline_roi(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r.stage_ord,
    )
    docs = [r.n_docs for r in rows]
    toks = [r.n_tokens for r in rows]
    assert docs == sorted(docs, reverse=True)
    assert toks == sorted(toks, reverse=True)
    assert rows[1].n_docs == rows[2].n_docs  # span removal rewrites, never drops


def test_training_corpus_roi_conservation_and_monotonicity(spark):
    """The flagship composition's invariants: doc counts never grow
    through the drop stages, the scrub drops nothing, packing conserves
    tokens EXACTLY (stage 6 tokens == stage 5 tokens — padding is
    slack, not loss), the sequence count is the ceil-sum over shards,
    and every non-empty stage carries a fingerprint."""
    from data_engineering_individual_assignment_spark.plans.curation import (
        training_corpus_roi,
    )

    rows = {
        r.stage: r
        for r in training_corpus_roi(spark, "/root/testdata/sf0.001").collect()
    }
    assert list(rows) == [
        "raw", "quality_gate", "pii_scrub", "exact_dedup", "decontam",
        "mix_sample", "packing",
    ]
    # drop stages are monotone non-increasing in docs
    order = ["raw", "quality_gate", "pii_scrub", "exact_dedup", "decontam",
             "mix_sample"]
    docs = [rows[s].n_docs for s in order]
    assert docs == sorted(docs, reverse=True)
    assert rows["pii_scrub"].n_docs == rows["quality_gate"].n_docs
    # the mix gates must actually bite on the 4-source corpus
    assert rows["mix_sample"].n_docs < rows["decontam"].n_docs
    # token conservation through packing
    assert rows["packing"].n_tokens == rows["mix_sample"].n_tokens
    # sequences cover the tokens at 128/seq with < 64*127 total padding
    seqs, toks = rows["packing"].n_docs, rows["packing"].n_tokens
    assert seqs * 128 >= toks > (seqs - 64) * 128
    assert all(r.corpus_fp for r in rows.values())


def test_cross_modal_lsh_equals_exact_on_fixture_domain(spark):
    """r11 switched cross_modal_dedup_agreement's embedding side from
    the exact block-grid scorer to 12-plane hyperplane LSH on the claim
    that the two are IDENTICAL on this domain (every >= 0.95 pair is an
    exact planted clone, which collides at any signature width).  That
    claim is data-dependent — pin it, so a fixture change that plants a
    non-clone near-pair (which LSH can miss, flipping 'both' ->
    'text_only') surfaces here instead of silently shifting audit
    semantics."""
    from data_engineering_individual_assignment_spark.operators import (
        similarity as sim,
    )
    from data_engineering_individual_assignment_spark.plans.extensions import (
        _cross_modal_domains,
    )

    _txts, embs = _cross_modal_domains(spark, "/root/testdata/sf0.001")
    lsh = {
        (r.id_a, r.id_b)
        for r in sim.hyperplane_lsh_pairs(embs, num_planes=12, threshold=0.95)
        .select("id_a", "id_b")
        .collect()
    }
    exact = {
        (r.id_a, r.id_b)
        for r in sim.cosine_near_dup_pairs(embs, threshold=0.95)
        .select("id_a", "id_b")
        .collect()
    }
    assert lsh == exact
    B = 1_000_000_000
    # and the exact set is precisely the planted identical clones
    assert exact == {(i, i + B) for i in range(5)} | {
        (i, i + 3 * B) for i in range(10, 15)
    }


def test_cross_modal_dedup_agreement_planted_classes(spark):
    """The planted cross-modal domain is deterministic: ids <5 are
    cloned in BOTH modalities (exactly 5 'both' pairs), 10-14 are
    vector-cloned with reversed token order (exactly 5
    'embedding_only' pairs), and 5-9 text-cloned with reversed vectors
    land in 'text_only' alongside the corpus's natural text dups."""
    from data_engineering_individual_assignment_spark.plans.extensions import (
        cross_modal_dedup_agreement,
    )

    rows = {
        r["class"]: r
        for r in cross_modal_dedup_agreement(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert rows["both"].n_pairs == 5
    assert rows["embedding_only"].n_pairs == 5
    assert rows["text_only"].n_pairs >= 5  # 5 planted + natural dups
    assert all(r.pairs_fp for r in rows.values())
