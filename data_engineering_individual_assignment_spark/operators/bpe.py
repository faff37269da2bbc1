"""Distributed BPE merge training — tokenizer TRAINING, not tokenization
(the estimate side lives in functions/text.bpe_ish_token_count).

Classic map-reduce BPE (the SentencePiece / HF-trainer shape at corpus
scale): the only corpus-sized step is the word histogram — a
(word)-keyed count with map-side partial aggregation, the textbook
combiner pattern.  Every merge round after that runs over the
DISTINCT-WORD vocabulary relation, which is corpus-bounded (vocabulary
grows ~O(corpus^0.5) by Heaps' law, millions of rows at 100 TB, never
corpus-sized):

- pair counting is a (left, right)-keyed aggregation of the zipped
  symbol array weighted by word count (arrays_zip of two slices —
  codegen collection expressions, no lambda, no window);
- the round's winner is a 1-row TakeOrderedAndProject (pair_count
  DESC, then (left, right) lexicographic — deterministic tie-break);
- the merge itself is a row-local array rewrite implementing EXACT
  textbook greedy left-to-right non-overlapping replacement (see
  ``merge_pair_greedy``), evaluated over the vocabulary only.

Per-round vocabularies are localCheckpointed (the pagerank / kmeans
idiom, see operators/graph.py) so plan depth stays O(1) per round
instead of doubling — the merge round references the prior vocabulary
twice (pair counts + rewrite).  The ONLY driver-visible object per
round is the single winning pair (bounded by construction); nothing
corpus-sized is ever collected.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..functions import text as TX

MERGES_SCHEMA = StructType(
    [
        StructField("merge_round", LongType(), False),
        StructField("lhs", StringType(), False),
        StructField("rhs", StringType(), False),
        StructField("pair_count", LongType(), False),
    ]
)


def merge_pair_greedy(syms: Column, left: str, right: str) -> Column:
    """Rewrite a symbol array by merging (left, right) -> left||right,
    exact greedy left-to-right NON-overlapping (textbook BPE): in a run
    of consecutive matches ("a a a" merging (a,a)) only alternate
    occurrences starting at the run head merge -> [aa, a].

    Row-local; no shuffle.  The greedy scan is a fold (F.aggregate)
    over the match positions with a string-encoded
    ``"<last kept>;<kept csv>"`` accumulator — higher-order functions
    run interpreted, but this evaluates over the vocabulary relation
    (distinct words), never the corpus, so the interpreted cost is
    bounded by vocabulary size.
    """
    lval, rval = F.lit(left), F.lit(right)
    merged = F.lit(left + right)
    # match positions, 1-based j where syms[j]=left and syms[j+1]=right.
    # guard size>=2: Spark's sequence(1, 0) yields a DESCENDING [1, 0],
    # not an empty array.
    cand = F.when(
        F.size(syms) >= 2, F.sequence(F.lit(1), F.size(syms) - 1)
    ).otherwise(F.array().cast("array<int>"))
    mpos = F.filter(
        cand,
        lambda j: (F.element_at(syms, j) == lval)
        & (F.element_at(syms, j + 1) == rval),
    )
    # greedy scan: keep a match at j unless the previously-kept match was
    # at j-1 (it would share symbol j).  Accumulator "<last>;<csv>".
    enc = F.aggregate(
        F.transform(mpos, lambda x: x.cast("string")),
        F.lit("-99;"),
        lambda acc, x: F.when(
            x.cast("int")
            == F.split_part(acc, F.lit(";"), F.lit(1)).cast("int") + 1,
            acc,
        ).otherwise(
            F.concat(x, F.lit(";"), F.split_part(acc, F.lit(";"), F.lit(2)), F.lit(","), x)
        ),
    )
    kept = F.transform(
        F.filter(
            F.split(F.split_part(enc, F.lit(";"), F.lit(2)), ","),
            lambda s: s != "",
        ),
        lambda s: s.cast("int"),
    )
    # rebuild: kept position j emits the merged symbol, position j+1 is
    # consumed (skip when j-1 is kept), everything else passes through.
    return F.filter(
        F.transform(
            F.sequence(F.lit(1), F.size(syms)),
            lambda j: F.when(F.array_contains(kept, j - 1), F.lit(None).cast("string"))
            .when(F.array_contains(kept, j), merged)
            .otherwise(F.element_at(syms, j)),
        ),
        lambda x: x.isNotNull(),
    )


def char_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt, syms) vocabulary: the corpus-sized histogram step.

    groupBy(word) runs with map-side partial aggregation — the shuffle
    carries (word, partial count), never document text.  syms is the
    per-character symbol array BPE training starts from.
    """
    words = docs.select(F.explode(TX.tokens(text_col)).alias("word")).filter(
        F.length("word") >= 1
    )
    vocab = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    return vocab.select(
        "word",
        "cnt",
        F.expr(
            "transform(sequence(1, length(word)), j -> substring(word, j, 1))"
        ).alias("syms"),
    )


def best_pair(vocab: DataFrame) -> DataFrame:
    """One merge round's winner over a (cnt, syms) vocabulary relation:
    adjacent pairs via arrays_zip of two slices (codegen collection
    expressions — no lambda, no window), a (lhs, rhs)-keyed weighted
    count, and a deterministic 1-row TakeOrderedAndProject (count DESC,
    then pair lexicographic)."""
    nsym = F.size("syms")
    prs = vocab.select(
        "cnt",
        F.explode(
            F.arrays_zip(
                F.slice("syms", 1, nsym - 1).alias("l"),
                F.slice("syms", 2, nsym - 1).alias("r"),
            )
        ).alias("pr"),
    )
    return (
        prs.groupBy(F.col("pr.l").alias("lhs"), F.col("pr.r").alias("rhs"))
        .agg(F.sum("cnt").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "lhs", "rhs")
        .limit(1)
    )


def bpe_train_merges(
    docs: DataFrame, text_col: str = "text", n_merges: int = 6
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges from a document corpus.

    Returns (merge_round, lhs, rhs, pair_count) — the learned merge
    table, one row per round, pair_count = the corpus-weighted count of
    the winning adjacent symbol pair at the time it won.

    Rounds are driver-synchronous like the Lloyd iterations in
    operators/similarity.ann_ivf_kmeans: each round collects exactly
    ONE row (the argmax pair — bounded by construction) and
    localCheckpoints the vocab rewrite so lineage does not double per
    round.  The heavy lifting (corpus histogram) happens once, before
    round 1.
    """
    spark = docs.sparkSession
    merges = [
        (r, lhs, rhs, pc)
        for r, lhs, rhs, pc, _ in _train_rounds(docs, text_col, n_merges)
        if r >= 1
    ]
    return spark.createDataFrame(merges, MERGES_SCHEMA)


def bpe_compression_curve(
    docs: DataFrame, text_col: str = "text", n_merges: int = 6
) -> DataFrame:
    """(merge_round, total_symbols): the corpus-weighted total symbol
    count after each merge round — round 0 is the per-character
    baseline, so total_symbols[0] / total_symbols[k] is the compression
    a k-merge tokenizer buys on this corpus (the curve you size a
    vocabulary budget with).  One bounded 1-row aggregation per round
    over the vocabulary relation; same training loop, same checkpoints
    as bpe_train_merges."""
    spark = docs.sparkSession
    rows = []
    for r, _, _, _, vocab in _train_rounds(docs, text_col, n_merges):
        tot = vocab.agg(
            F.sum(F.col("cnt") * F.size("syms")).alias("t")
        ).collect()[0]["t"]  # bounded: one global aggregate row
        rows.append((r, int(tot)))
    return spark.createDataFrame(rows, "merge_round long, total_symbols long")


def _train_rounds(docs: DataFrame, text_col: str, n_merges: int):
    """The shared training loop: yields (round, lhs, rhs, pair_count,
    vocab_after_merge) per round — round 0 is the character baseline
    (lhs/rhs None, the un-merged vocabulary), each later round's vocab
    is the localCheckpointed (cnt, syms) relation AFTER applying that
    round's merge.  Consumed by bpe_train_merges (the merge table) and
    bpe_compression_curve (the per-round symbol totals)."""
    vocab = char_vocab(docs, text_col).select("cnt", "syms").localCheckpoint()
    yield 0, None, None, 0, vocab
    for r in range(1, n_merges + 1):
        best = best_pair(vocab)
        rows = best.collect()  # bounded: 1 row (TakeOrderedAndProject)
        if not rows:
            return
        lhs, rhs, pc = rows[0]["lhs"], rows[0]["rhs"], int(rows[0]["pair_count"])
        vocab = vocab.select(
            "cnt", merge_pair_greedy(F.col("syms"), lhs, rhs).alias("syms")
        ).localCheckpoint()
        yield r, lhs, rhs, pc, vocab


def bpe_apply(
    df: DataFrame, word_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """Apply a learned merge list — the INFERENCE side: replay each merge
    in learned order with the same exact-greedy semantics, adding a
    ``syms`` column.  One localCheckpointed step per merge: composing
    ``merge_pair_greedy`` as nested Column expressions is NOT viable —
    each level references its input array ~8 times, so Catalyst's
    projection collapse substitutes the subtree 8^k times and analysis
    blows up past ~3 merges.  The checkpoint is the same per-round
    barrier the trainer uses."""
    out = df.withColumn("syms", F.split(F.col(word_col), ""))
    for lhs, rhs in merges:
        out = out.withColumn(
            "syms", merge_pair_greedy(F.col("syms"), lhs, rhs)
        ).localCheckpoint()
    return out


def best_pair_wordpiece(vocab: DataFrame) -> DataFrame:
    """One WordPiece round's winner: same adjacent-pair relation as
    ``best_pair``, but scored by the WordPiece likelihood criterion
    score = pair_count / (count(lhs) * count(rhs)) (Schuster & Nakajima
    2012; the HF WordPiece trainer's ranking) — merge the pair whose
    co-occurrence is most surprising given its parts, not the most
    frequent pair.  Symbol counts are a corpus-weighted aggregate over
    the SAME vocabulary relation (one extra vocabulary-sized explode
    per round, never corpus-sized).

    Cross-engine determinism: pair and symbol counts are exact
    integers; both engines convert them to double (exact below 2^53)
    and perform ONE division — identical doubles, so the (score DESC,
    lhs, rhs) argmax replays bit-for-bit in DuckDB."""
    nsym = F.size("syms")
    prs = vocab.select(
        "cnt",
        F.explode(
            F.arrays_zip(
                F.slice("syms", 1, nsym - 1).alias("l"),
                F.slice("syms", 2, nsym - 1).alias("r"),
            )
        ).alias("pr"),
    )
    pairs = prs.groupBy(
        F.col("pr.l").alias("lhs"), F.col("pr.r").alias("rhs")
    ).agg(F.sum("cnt").alias("pair_count"))
    syms = (
        vocab.select("cnt", F.explode("syms").alias("s"))
        .groupBy("s")
        .agg(F.sum("cnt").alias("scnt"))
    )
    return (
        pairs.join(
            syms.select(F.col("s").alias("lhs"), F.col("scnt").alias("lc")),
            "lhs",
        )
        .join(
            syms.select(F.col("s").alias("rhs"), F.col("scnt").alias("rc")),
            "rhs",
        )
        .select(
            "lhs",
            "rhs",
            "pair_count",
            (
                F.col("pair_count").cast("double")
                / (F.col("lc").cast("double") * F.col("rc").cast("double"))
            ).alias("score"),
        )
        .orderBy(F.desc("score"), "lhs", "rhs")
        .limit(1)
    )


def wordpiece_train_merges(
    docs: DataFrame, text_col: str = "text", n_merges: int = 6
) -> DataFrame:
    """Learn the first ``n_merges`` WordPiece merges — the third
    dominant tokenizer-training family next to bpe_train_merges and
    unigram (operators/unigram.py).  Identical harness to the BPE
    trainer (corpus histogram once, per-round vocabulary aggregates,
    1-row argmax collect, exact-greedy row-local merge rewrite,
    localCheckpointed rounds); only the ranking differs.

    Returns (merge_round, lhs, rhs, pair_count, score)."""
    spark = docs.sparkSession
    vocab = char_vocab(docs, text_col).select("cnt", "syms").localCheckpoint()
    merges = []
    for r in range(1, n_merges + 1):
        rows = best_pair_wordpiece(vocab).collect()  # bounded: 1 row
        if not rows:
            break
        lhs, rhs = rows[0]["lhs"], rows[0]["rhs"]
        merges.append(
            (r, lhs, rhs, int(rows[0]["pair_count"]), float(rows[0]["score"]))
        )
        vocab = vocab.select(
            "cnt", merge_pair_greedy(F.col("syms"), lhs, rhs).alias("syms")
        ).localCheckpoint()
    return spark.createDataFrame(
        merges,
        "merge_round long, lhs string, rhs string, "
        "pair_count long, score double",
    )
