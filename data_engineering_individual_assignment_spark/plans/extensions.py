"""LLM-data-pipeline extension queries (SURVEY §2.11) + the composed
operators (as-of join, sessionization, event-time windows).

Oracle notes: near-dup verification is exact Jaccard, so the DuckDB
oracle is a literal all-pairs Jaccard — LSH only prunes candidates and
its recall at the 0.7 threshold is 1-(1-0.7)^12 ≈ 1-3e-7 (see
operators/dedup.py).  SimHash and IVF are engine-specific (xxhash64 /
approximate recall) and are registered without oracle => the driver
records the weaker rows-only check, as the contract allows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import fingerprint as FP
from ..functions import text as TX
from ..functions.vectors import cosine
from ..operators import dedup, joins, similarity
from ..sources.readers import load_table
from .catalog import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _mh_sql_terms(num_hashes: int) -> str:
    """DuckDB twin of operators/dedup.minhash_portable's signature slots:
    one md5 per shingle folded to 32 bits, fanned to slots via the same
    md5-derived (a_i*x + b_i) mod P universal family."""
    from ..operators.dedup import _MH_FOLD, _MH_PRIME, _mh_coeffs

    return ",\n               ".join(
        f"CAST(list_min(list_transform(shingles, s -> "
        f"({a} * (CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % {_MH_FOLD}) "
        f"+ {b}) % {_MH_PRIME})) AS BIGINT) AS mh{i}"
        for i, (a, b) in enumerate(_mh_coeffs(num_hashes))
    )




# --------------------------------------------------------------------------
# Dedup
# --------------------------------------------------------------------------
@register(
    "dedup_exact",
    sql=r"""
    SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp,
           CAST(min(doc_id) AS BIGINT) AS survivor_id,
           CAST(count(*) AS BIGINT)    AS n_copies
    FROM documents
    GROUP BY 1
    ORDER BY survivor_id
    """,
    doc="exact dedup on the md5 fingerprint of whitespace-normalized "
    "lower-cased text; survivor = min doc_id (idempotent). Shuffles a "
    "16-byte digest + id per row — scale-safe at 100 TB.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return dedup.exact_dedup(d, "text", "doc_id").orderBy("survivor_id")


@register(
    "near_dup_pairs",
    sql=r"""
    WITH sh AS (
        SELECT doc_id,
               list_distinct([
                   array_to_string(toks[i:i+2], ' ')
                   for i in range(1, greatest(len(toks) - 2, 1) + 1)
               ]) AS shingles
        FROM (SELECT doc_id,
                     regexp_split_to_array(trim(lower(text)), '\s+') AS toks
              FROM documents)
        WHERE len(toks) >= 3)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.shingles, b.shingles))), 6) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
          / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.7
    ORDER BY doc_a, doc_b
    """,
    doc="EXACT near-duplicate pairs (3-shingle Jaccard >= 0.7) via "
    "prefix-filtered set-similarity join (Vernica et al. 2010): global "
    "rare-first shingle ordering, prefix+length filters, verify "
    "candidates only. Matches the brute-force all-pairs oracle with "
    "near-linear work — the 100 TB-safe exact path.",
)
def near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    # persist the (tiny) pair result before the presentation sort: a
    # global orderBy samples its child for range partitioning, which
    # re-executes the whole verify tail — cached, the sampling pass
    # reads a few hundred rows instead (measured ~0.7 s at sf0.1)
    return dedup._persist(
        dedup.jaccard_join(d, "text", "doc_id", threshold=0.7, k=3)
    ).orderBy("doc_a", "doc_b")


# 24 md5-derived minhash slots (6 bands x 4 rows) — the portable
# signature scheme proven cross-engine by minhash_portable_sigs
_LSH_HASHES, _LSH_BANDS, _LSH_ROWS = 24, 6, 4
_LSH_SIG_TERMS = _mh_sql_terms(_LSH_HASHES)
_LSH_BAND_STRUCTS = ",\n                   ".join(
    "{'band': %d, 'bucket': %s}"
    % (
        b,
        " || '|' || ".join(
            f"CAST(mh{b * _LSH_ROWS + r} AS VARCHAR)" for r in range(_LSH_ROWS)
        ),
    )
    for b in range(_LSH_BANDS)
)


@register(
    "near_dup_minhash",
    sql=rf"""
    WITH sh AS (
        SELECT doc_id,
               list_distinct([
                   array_to_string(toks[i:i+2], ' ')
                   for i in range(1, greatest(len(toks) - 2, 1) + 1)
               ]) AS shingles
        FROM (SELECT doc_id,
                     regexp_split_to_array(trim(lower(text)), '\s+') AS toks
              FROM documents)
        WHERE len(toks) >= 3),
    sigs AS (
        SELECT doc_id,
               {_LSH_SIG_TERMS}
        FROM sh),
    bands AS (
        SELECT doc_id, bk.band AS band, bk.bucket AS bucket
        FROM (SELECT doc_id,
                     unnest([{_LSH_BAND_STRUCTS}]) AS bk
              FROM sigs)),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id)
    SELECT c.doc_a, c.doc_b,
           round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                 / len(list_distinct(list_concat(sa.shingles, sb.shingles))), 6)
               AS jaccard
    FROM cand c
    JOIN sh sa ON sa.doc_id = c.doc_a
    JOIN sh sb ON sb.doc_id = c.doc_b
    WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
          / len(list_distinct(list_concat(sa.shingles, sb.shingles))) >= 0.7
    ORDER BY doc_a, doc_b
    """,
    doc="APPROXIMATE near-dup pairs via banded MinHash-LSH: 24 "
    "md5-PORTABLE minhashes (the signature scheme minhash_portable_sigs "
    "proves bit-equal cross-engine), 6 bands × 4 rows banding, bucket "
    "equi-join, exact Jaccard verify of candidates.  Because the hash "
    "functions are engine-portable, the oracle replays the IDENTICAL "
    "LSH — bands, buckets, candidates AND verification — so this "
    "approximate operator is hash-checked end-to-end, not rows-only.  "
    "Recall ~0.96 at j=0.8, ~1.0 at j=0.9; the constant-work scale "
    "path when the exact prefix-join's candidate set grows too large "
    "(operators/dedup.near_dup_minhash is the cheaper xxhash64 twin).",
)
def near_dup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return dedup.near_dup_minhash_portable(
        d, "text", "doc_id", threshold=0.7, num_bands=_LSH_BANDS,
        rows_per_band=_LSH_ROWS, k=3,
    ).orderBy("doc_a", "doc_b")


@register(
    "lsh_ingest_near_dup",
    sql=rf"""
    WITH sh AS (
        SELECT doc_id,
               list_distinct([
                   array_to_string(toks[i:i+2], ' ')
                   for i in range(1, greatest(len(toks) - 2, 1) + 1)
               ]) AS shingles
        FROM (SELECT doc_id,
                     regexp_split_to_array(trim(lower(text)), '\s+') AS toks
              FROM documents)
        WHERE len(toks) >= 3),
    sigs AS (
        SELECT doc_id,
               {_LSH_SIG_TERMS}
        FROM sh),
    bands AS (
        SELECT doc_id, bk.band AS band, bk.bucket AS bucket
        FROM (SELECT doc_id,
                     unnest([{_LSH_BAND_STRUCTS}]) AS bk
              FROM sigs)),
    cand AS (
        SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS dup_of
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket
        WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 != 0)
    SELECT c.new_id, c.dup_of,
           round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                 / len(list_distinct(list_concat(sa.shingles, sb.shingles))), 6)
               AS jaccard
    FROM cand c
    JOIN sh sa ON sa.doc_id = c.new_id
    JOIN sh sb ON sb.doc_id = c.dup_of
    WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
          / len(list_distinct(list_concat(sa.shingles, sb.shingles))) >= 0.7
    ORDER BY new_id, dup_of
    """,
    doc="near-dup rejection at INGEST (streaming/windows.lsh_dedup_stream "
    "in its portable-hash mode, run batch-side — tests/test_streaming.py "
    "pins stream==batch on the identical plan): incoming docs "
    "(doc_id % 5 = 0) are checked against the historical corpus "
    "(doc_id % 5 != 0) via row-local md5-portable MinHash signatures, a "
    "stream-static (band, bucket) equi-join, first-common-band emit-once "
    "(no streaming distinct, ZERO state), and exact-Jaccard verification. "
    "Because every hash is engine-portable, the oracle replays the "
    "ENTIRE ingest path — signatures, buckets, candidate split, "
    "verification — so the most production-shaped streaming operator in "
    "the repo is hash-checked end-to-end, not just rows-counted.",
)
def lsh_ingest_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.windows import lsh_dedup_stream

    d = _t(spark, sf_dir, "documents")
    incoming = d.filter(F.col("doc_id") % 5 == 0)
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    return lsh_dedup_stream(
        incoming, corpus, threshold=0.7, k=3, num_hashes=_LSH_BANDS * _LSH_ROWS,
        portable=True,
    ).orderBy("new_id", "dup_of")


@register(
    "dedup_latest_event",
    sql="""
    SELECT user_id, event_type,
           CAST(event_id AS BIGINT) AS latest_event_id,
           round(value, 2)          AS latest_value,
           CAST(count(*) OVER (PARTITION BY user_id, event_type) AS BIGINT)
               AS n_versions
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, event_id DESC) = 1
    ORDER BY user_id, event_type
    """,
    doc="latest-record-wins dedup (the warehouse 'keep newest version "
    "per key' op, CDC compaction): one row_number window per "
    "(user_id, event_type), newest ts wins, event_id desc tie-break. "
    "One hash exchange on the dedup key — scale-safe; contrast with "
    "dedup_exact's content-hash semantics.",
)
def dedup_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    wc = Window.partitionBy("user_id", "event_type")
    return (
        e.withColumn("n_versions", F.count("*").over(wc))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("latest_event_id"),
            F.round("value", 2).alias("latest_value"),
            F.col("n_versions").cast("bigint"),
        )
        .orderBy("user_id", "event_type")
    )


_EST_HASHES = 16
_EST_SIG_TERMS = _mh_sql_terms(_EST_HASHES)
_EST_AGREE = " + ".join(
    f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END" for i in range(_EST_HASHES)
)


@register(
    "minhash_estimate_accuracy",
    sql=rf"""
    WITH sh AS (
        SELECT doc_id,
               list_distinct([
                   array_to_string(toks[i:i+2], ' ')
                   for i in range(1, greatest(len(toks) - 2, 1) + 1)
               ]) AS shingles
        FROM (SELECT doc_id,
                     regexp_split_to_array(trim(lower(text)), '\s+') AS toks
              FROM documents)
        WHERE len(toks) >= 3),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
               / len(list_distinct(list_concat(a.shingles, b.shingles))) AS j
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
              / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.5),
    sigs AS (
        SELECT doc_id,
               {_EST_SIG_TERMS}
        FROM sh)
    SELECT p.doc_a, p.doc_b,
           round(p.j, 6) AS exact_j,
           round(({_EST_AGREE}) / {_EST_HASHES}.0, 6) AS est_j
    FROM pairs p
    JOIN sigs sa ON sa.doc_id = p.doc_a
    JOIN sigs sb ON sb.doc_id = p.doc_b
    ORDER BY doc_a, doc_b
    """,
    doc="sketch-accuracy measurement: exact 3-shingle Jaccard vs the "
    "16-hash MinHash ESTIMATE (fraction of agreeing md5-portable "
    "minhashes — E[est]=J, the quantity LSH banding thresholds on) for "
    "every pair with exact J >= 0.5. Both engines compute identical "
    "md5-derived signatures, so the estimate itself is oracle-checked, "
    "pinning cross-engine sketch portability.  Signatures are computed "
    "ONLY for pair participants (a semi-join on the checkpointed pair "
    "set): 16 md5 evaluations per shingle across a whole corpus is "
    "the dominant cost, and the measurement only needs sigs for docs "
    "that appear in a pair — the oracle computes sigs for all docs "
    "but joins the same pair set, so results are identical.",
)
def minhash_estimate_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    # eager checkpoint: the pair set feeds BOTH the participant
    # restriction and the final join — without it the whole
    # prefix-filter join subtree would evaluate twice
    pairs = (
        dedup.jaccard_join(d, "text", "doc_id", threshold=0.5, k=3)
        .select("doc_a", "doc_b", F.col("jaccard").alias("exact_j"))
        .localCheckpoint()
    )
    dedup.release_intermediates()
    participants = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    # restrict BEFORE shingling: the semi-join on the raw table prunes
    # the corpus to pair participants ahead of the tokenize/hash work
    # (a post-shingle filter would still shingle every document)
    d_part = d.join(participants, "doc_id", "left_semi")
    # eager checkpoint again: the tiny sig relation feeds BOTH join
    # sides (sa, sb) — lazy, the shingle+hash subtree would run twice
    sigs = dedup.minhash_portable(
        d_part, "text", "doc_id", num_hashes=_EST_HASHES, k=3
    ).localCheckpoint()
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(_EST_HASHES)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(_EST_HASHES)],
    )
    agree = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(_EST_HASHES)
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "exact_j",
            F.round(agree / F.lit(float(_EST_HASHES)), 6).alias("est_j"),
        )
        .orderBy("doc_a", "doc_b")
    )


_MH_TERMS = _mh_sql_terms(4)

@register(
    "minhash_portable_sigs",
    sql=rf"""
    WITH sh AS (
        SELECT doc_id,
               list_distinct([
                   array_to_string(toks[i:i+2], ' ')
                   for i in range(1, greatest(len(toks) - 2, 1) + 1)
               ]) AS shingles
        FROM (SELECT doc_id,
                     regexp_split_to_array(trim(lower(text)), '\s+') AS toks
              FROM documents)
        WHERE len(toks) >= 3)
    SELECT doc_id,
           {_MH_TERMS}
    FROM sh
    ORDER BY doc_id
    """,
    doc="oracle-checkable MinHash: 4 signature slots whose hash functions "
    "derive from md5 (portable across engines), so the minhash VALUES "
    "themselves are differential-tested — the xxhash64 production "
    "variant is checked against this construction by unit tests.",
)
def minhash_portable_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return dedup.minhash_portable(d, "text", "doc_id", num_hashes=4, k=3).orderBy(
        "doc_id"
    )


_SIM_BITS = 16
_BIT_SUMS = ",\n           ".join(
    f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
    for b in range(_SIM_BITS)
)
_BIT_RECOMBINE = " + ".join(
    f"CASE WHEN b{b} > 0 THEN (CAST(1 AS BIGINT) << {b}) ELSE 0 END"
    for b in range(_SIM_BITS)
)

@register(
    "simhash_portable_check",
    sql=rf"""
    WITH tok AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        FROM documents),
    h AS (
        SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h
        FROM tok),
    bits AS (
        SELECT doc_id,
           {_BIT_SUMS}
        FROM h GROUP BY doc_id)
    SELECT doc_id, CAST({_BIT_RECOMBINE} AS BIGINT) AS simhash
    FROM bits
    ORDER BY doc_id
    """,
    doc="oracle-checkable SimHash: 16-bit signatures from md5-derived "
    "token hashes, bit-identical across engines — pins the sign-"
    "aggregate + bit-recombination construction the 64-bit xxhash64 "
    "production variant uses.",
)
def simhash_portable_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return dedup.simhash_portable(d, "text", "doc_id", bits=_SIM_BITS).orderBy("doc_id")


# 60-bit portable SimHash banded 4 x 15 bits (pigeonhole: hamming<=3
# pairs agree on >= 1 full band); 60 = md5-hash60's width
_SIMC_BITS, _SIMC_BANDS = 60, 4
_SIMC_BAND_BITS = _SIMC_BITS // _SIMC_BANDS
_SIMC_MASK = (1 << _SIMC_BAND_BITS) - 1
_SIMC_SUMS = ",\n           ".join(
    f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
    for b in range(_SIMC_BITS)
)
_SIMC_RECOMBINE = " + ".join(
    f"CASE WHEN b{b} > 0 THEN (CAST(1 AS BIGINT) << {b}) ELSE 0 END"
    for b in range(_SIMC_BITS)
)


@register(
    "simhash_clusters",
    sql=rf"""
    WITH tok AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        FROM documents),
    h AS (
        SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h
        FROM tok),
    bits AS (
        SELECT doc_id,
           {_SIMC_SUMS}
        FROM h GROUP BY doc_id),
    sims AS (
        SELECT doc_id, CAST({_SIMC_RECOMBINE} AS BIGINT) AS simhash
        FROM bits),
    bands AS (
        SELECT s.doc_id, s.simhash, bt.band,
               (s.simhash >> (bt.band * {_SIMC_BAND_BITS})) & {_SIMC_MASK} AS key
        FROM sims s
        CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) bt)
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    ORDER BY doc_a, doc_b
    """,
    doc="SimHash near-dup candidates with ENGINE-PORTABLE signatures: "
    "60-bit md5-derived token-hash sign aggregate (the construction "
    "simhash_portable_check proves bit-equal cross-engine), 4×15-bit "
    "band join, hamming <= 3 verification via bit_count(xor).  The "
    "oracle replays the identical pipeline — signatures, bands, "
    "hamming — so the approximate operator is hash-checked end-to-end "
    "(operators/dedup.simhash_near_pairs is the cheaper 64-bit "
    "xxhash64 production twin, recall-tested with planted near-dups).",
)
def simhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return dedup.simhash_near_pairs_portable(
        d, "text", "doc_id", max_hamming=3, bits=_SIMC_BITS, num_bands=_SIMC_BANDS
    ).orderBy("doc_a", "doc_b")


# --------------------------------------------------------------------------
# Similarity search
# --------------------------------------------------------------------------
# shared by ann_brute_force and ann_block_topk: both are EXACT top-5
# cosine search — same answer, different physical strategy
_ANN_ORACLE_SQL = """
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS v
               FROM embeddings WHERE vec_id < 10),
    scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               list_dot_product(q.v, c.embedding::DOUBLE[])
                 / (sqrt(list_dot_product(q.v, q.v))
                    * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])))
                 AS cos_sim
        FROM embeddings c JOIN q ON c.vec_id != q.query_id)
    SELECT query_id, neighbor_id,
           CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rnk,
           round(cos_sim, 6) AS cos_sim
    FROM scored
    QUALIFY rnk <= 5
    ORDER BY query_id, rnk
    """


@register(
    "ann_brute_force",
    sql=_ANN_ORACLE_SQL,
    doc="exact cosine top-5 for the 10 lowest-id query vectors: broadcast "
    "query set, single corpus scan, per-query window rank. The exact-ANN "
    "baseline; ann_ivf is the approximate scale path.",
)
def ann_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.brute_force_topk(emb, queries, k=5).orderBy("query_id", "rnk")


@register(
    "ann_block_topk",
    sql=_ANN_ORACLE_SQL,
    doc="exact cosine top-5 via per-partition BLOCK scoring (mapInPandas "
    "gemm over each corpus partition, local top-k, tiny global reduce): "
    "the same answer as ann_brute_force with no |corpus| x |queries| "
    "pair relation — one corpus scan, zero corpus shuffle, the physical "
    "strategy that survives a 100 TB corpus. Same oracle as "
    "ann_brute_force (both exact).",
)
def ann_block_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.block_topk(emb, queries, k=5).orderBy("query_id", "rnk")


def _cos_sql(a: str, b: str) -> str:
    """Guarded cosine between two DOUBLE[] expressions — the SQL twin of
    functions/vectors.cosine (0.0 on zero norms)."""
    dn = (
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
    )
    return (
        f"CASE WHEN {dn} > 0 THEN list_dot_product({a}, {b}) / {dn} "
        f"ELSE 0.0 END"
    )


# IVF probe/scan tail shared by both IVF oracles: given CTEs `c`
# (vec_id, v) and `cents` (cell_id, cv), assign every vector to its
# nearest cell, probe the 2 nearest cells per query, exact cosine
# within probed cells, top-5 — Spark's ivf_topk replayed literally.
_IVF_TAIL_SQL = f"""
    assign AS (
        SELECT vec_id, v, cell_id FROM (
            SELECT c.vec_id, c.v, ct.cell_id,
                   row_number() OVER (PARTITION BY c.vec_id
                       ORDER BY {_cos_sql('c.v', 'ct.cv')} DESC,
                                ct.cell_id ASC) AS rn
            FROM c CROSS JOIN cents ct)
        WHERE rn = 1),
    probes AS (
        SELECT query_id, qv, cell_id FROM (
            SELECT q.vec_id AS query_id, q.v AS qv, ct.cell_id,
                   row_number() OVER (PARTITION BY q.vec_id
                       ORDER BY {_cos_sql('q.v', 'ct.cv')} DESC,
                                ct.cell_id ASC) AS rn
            FROM c q CROSS JOIN cents ct
            WHERE q.vec_id < 10)
        WHERE rn <= 2),
    scored AS (
        SELECT p.query_id, a.vec_id AS neighbor_id,
               {_cos_sql('p.qv', 'a.v')} AS cos_sim
        FROM assign a JOIN probes p USING (cell_id)
        WHERE a.vec_id != p.query_id)
    SELECT query_id, neighbor_id,
           CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rnk,
           round(cos_sim, 6) AS cos_sim
    FROM scored
    QUALIFY rnk <= 5
    ORDER BY query_id, rnk
    """


@register(
    "ann_ivf",
    sql=f"""
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cents AS (
        SELECT vec_id AS cell_id, v AS cv FROM c ORDER BY vec_id LIMIT 8),
    {_IVF_TAIL_SQL}
    """,
    doc="IVF approximate top-5: corpus bucketed to 8 deterministic "
    "centroids (the lowest-id corpus vectors), queries probe 2 cells, "
    "exact cosine within probed cells.  Every step — centroid choice, "
    "assignment argmax, probe ranking, scoring — is deterministic with "
    "lowest-id tie-breaks, so the oracle replays the IDENTICAL index "
    "build and search; recall vs ann_brute_force is additionally "
    "measured in tests.",
)
def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.ivf_topk(emb, queries, num_cells=8, nprobe=2, k=5).orderBy(
        "query_id", "rnk"
    )


def _kmeans_iter_cte(i: int) -> str:
    """One unrolled Lloyd's round: assign to nearest c{i-1} centroid
    (cosine, lowest-cell tie-break), per-cell per-dim mean rounded to
    6 dp, empty cells carry the previous centroid forward — the exact
    recurrence of operators/similarity.lloyd_centroids."""
    prev = f"c{i - 1}"
    return f"""
    a{i} AS (
        SELECT vec_id, v, cell_id FROM (
            SELECT c.vec_id, c.v, ct.cell_id,
                   row_number() OVER (PARTITION BY c.vec_id
                       ORDER BY {_cos_sql('c.v', 'ct.cv')} DESC,
                                ct.cell_id ASC) AS rn
            FROM c CROSS JOIN {prev} ct)
        WHERE rn = 1),
    g{i} AS (
        SELECT cell_id, list(m ORDER BY dim) AS cv FROM (
            SELECT cell_id, dim, round(avg(val), 6) AS m
            FROM (SELECT cell_id,
                         unnest(v) AS val,
                         unnest(range(1, len(v) + 1)) AS dim
                  FROM a{i})
            GROUP BY cell_id, dim)
        GROUP BY cell_id),
    c{i} AS (
        SELECT p.cell_id, coalesce(g.cv, p.cv) AS cv
        FROM {prev} p LEFT JOIN g{i} g USING (cell_id))"""


@register(
    "ann_ivf_kmeans",
    sql=(
        """
    WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c0 AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell_id, v AS cv
        FROM c ORDER BY vec_id LIMIT 8),"""
        + ",".join(_kmeans_iter_cte(i) for i in range(1, 4))
        + ",\n    cents AS (SELECT cell_id, cv FROM c3),\n    "
        + _IVF_TAIL_SQL
    ),
    doc="IVF approximate top-5 with TRAINED cells: 3 rounds of "
    "engine-portable Lloyd's k-means (init = lowest-id vectors; "
    "assign by cosine with lowest-cell tie-break; per-dimension means "
    "rounded to 6 dp each round so float sum-order drift can never "
    "flip a later assignment) — then the same probe-2-cells search as "
    "ann_ivf.  The oracle unrolls the identical recurrence as chained "
    "CTEs, so the TRAINING TRAJECTORY itself is differential-tested, "
    "not just the final search.  Tests additionally pin recall >= 0.4 "
    "at nprobe=2 and exact brute-force equality at nprobe=num_cells.",
)
def ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.ivf_topk(
        emb, queries, num_cells=8, nprobe=2, k=5, use_kmeans=True
    ).orderBy("query_id", "rnk")


# EXACT all-pairs cosine is quadratic BY DEFINITION — it exists as the
# differential anchor for the sub-quadratic scale paths
# (embedding_lsh_near_dup, semdedup_cells), not as the thing you run on
# 100 TB.  Above _END_CAP vectors the corpus is therefore capped by a
# DETERMINISTIC md5 sample (keep vec_id iff md5-hash(vec_id) % K == 0,
# K = ceil(n / cap)) — reproducible in any engine, no seed, no RNG.
# The cap never bites at oracle scales (sf0.01: ~2k vectors, sf0.1:
# ~20k), so the DuckDB differential still checks the FULL exact answer;
# it only bounds the 10x/100x scaling sweeps, whose exact-baseline row
# would otherwise be the one super-linear entry (r7: exp 1.21, 261 s).
_END_CAP = 30000


@register(
    "embedding_near_dup",
    sql=f"""
    WITH k AS (
        SELECT greatest(1, CAST(ceil(count(*) / {_END_CAP}.0) AS BIGINT)) AS k
        FROM embeddings),
    sampled AS (
        -- the OR exempts the planted-clone seeds from the cap so the
        -- anchor's pair set stays non-vacuous at any sample modulus
        SELECT vec_id, embedding FROM embeddings
        WHERE CAST('0x' || substr(md5('endcap|' || CAST(vec_id AS VARCHAR)), 1, 15)
                   AS BIGINT) % (SELECT k FROM k) = 0 OR vec_id < 5),
    corpus AS (
        SELECT vec_id, embedding FROM sampled
        UNION ALL
        -- planted near-identical clones: the synthetic embeddings are
        -- near-orthogonal (max pairwise cos ~0.5), so without these the
        -- 0.95 threshold compares empty sets — a vacuous oracle match
        SELECT vec_id + 1000000 AS vec_id, embedding
        FROM sampled WHERE vec_id < 5)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                 / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6)
               AS cos_sim
    FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
          / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
             * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.95
    ORDER BY id_a, id_b
    """,
    doc="EXACT embedding-cosine near-dup pairs (cos >= 0.95) over the "
    "corpus plus 5 planted exact-duplicate clones (ids +1e6), so the "
    "oracle compares a non-empty pair set: broadcast self-join baseline; "
    "embedding_lsh_near_dup is the sub-quadratic hyperplane-LSH scale "
    f"path.  Above {_END_CAP} vectors the corpus is md5-sample-capped "
    "(deterministic, engine-portable, never bites at oracle scales) — "
    "the exact baseline is quadratic by definition and is graded as a "
    "differential anchor, not a 100 TB plan.",
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import _md5_hash60

    emb = _t(spark, sf_dir, "embeddings")
    # the sample modulus is part of the PLAN (a 1-row count aggregate
    # crossJoined in, like the DuckDB twin's scalar subquery) — no
    # driver-side count() at plan-build time.  The aggregate scans a
    # FRESH read of the table: a same-lineage agg(emb) shares emb's
    # dataset id and trips Spark's ambiguous-self-join check inside the
    # downstream self-cogroup; a fresh scan has its own ids and doesn't.
    # bounded: cap_k is a 1-row global aggregate
    kdf = _t(spark, sf_dir, "embeddings").agg(
        F.greatest(
            F.lit(1).cast("bigint"), F.ceil(F.count("*") / F.lit(float(_END_CAP)))
        ).alias("cap_k")
    )
    # vec_id < 5 exempts the planted-clone seeds from the cap so the
    # anchor's pair set stays non-vacuous at any sample modulus
    sampled = (
        emb.crossJoin(F.broadcast(kdf))
        .filter(
            (
                _md5_hash60(F.col("vec_id").cast("string"), "endcap")
                % F.col("cap_k")
                == 0
            )
            | (F.col("vec_id") < 5)
        )
        .select("vec_id", "embedding")
    )
    corpus = sampled.unionAll(
        sampled.filter(F.col("vec_id") < 5).select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
        )
    )
    return similarity.cosine_near_dup_pairs(corpus, threshold=0.95).orderBy("id_a", "id_b")


@register(
    "semdedup_cells",
    sql=f"""
    WITH c AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        UNION ALL
        -- planted exact clones (ids +1e6) so the 0.95 gate compares a
        -- non-empty drop set (natural max pairwise cos is ~0.5)
        SELECT vec_id + 1000000 AS vec_id, embedding::DOUBLE[] AS v
        FROM embeddings WHERE vec_id < 5),
    cents AS (
        SELECT vec_id AS cell_id, v AS cv FROM c ORDER BY vec_id LIMIT 8),
    assign AS (
        SELECT vec_id, v, cell_id, round(cs, 6) AS r_sim FROM (
            SELECT c.vec_id, c.v, ct.cell_id,
                   {_cos_sql('c.v', 'ct.cv')} AS cs,
                   row_number() OVER (PARTITION BY c.vec_id
                       ORDER BY {_cos_sql('c.v', 'ct.cv')} DESC,
                                ct.cell_id ASC) AS rn
            FROM c CROSS JOIN cents ct)
        WHERE rn = 1),
    ranked AS (
        SELECT vec_id, v, cell_id,
               row_number() OVER (PARTITION BY cell_id
                   ORDER BY r_sim DESC, vec_id ASC) AS rn
        FROM assign),
    cand AS (
        SELECT a.cell_id,
               least(a.vec_id, b.vec_id)    AS kept_id,
               greatest(a.vec_id, b.vec_id) AS dropped_id,
               {_cos_sql('a.v', 'b.v')}     AS cs
        FROM ranked a JOIN ranked b
          ON a.cell_id = b.cell_id
         AND b.rn > a.rn AND b.rn <= a.rn + 4
        WHERE {_cos_sql('a.v', 'b.v')} >= 0.95),
    one AS (
        SELECT cell_id, kept_id, dropped_id, round(cs, 6) AS cos_sim,
               row_number() OVER (PARTITION BY dropped_id
                                  ORDER BY kept_id ASC) AS rk
        FROM cand)
    SELECT cell_id, kept_id, dropped_id, cos_sim
    FROM one WHERE rk = 1
    ORDER BY dropped_id
    """,
    doc="SemDeDup (Abbas 2023) as a shuffle-bounded plan: embeddings "
    "clustered to 8 deterministic centroids (ivf_topk's scheme), then "
    "near-identical pairs searched WITHIN cells only — and within a "
    "cell, only between members whose centroid-similarity ranks are "
    "<= 4 apart (sorted-neighborhood blocking in similarity space: true "
    "duplicates have near-identical centroid cosine, so pair work is "
    "O(n*window) instead of O(cell^2)).  Exact cosine >= 0.95 verifies "
    "candidates; each dropped vector reports its lowest-id keeper.  "
    "Ranks order by the 6-dp ROUNDED centroid similarity so float "
    "sum-order drift cannot flip a rank, which is why the oracle can "
    "replay the identical cluster/rank/verify pipeline end-to-end.  "
    "operators/similarity.py:semdedup_pairs; recall vs the exact "
    "all-pairs query is pinned in tests.",
)
def semdedup_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    corpus = emb.select("vec_id", "embedding").unionAll(
        emb.filter(F.col("vec_id") < 5).select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
        )
    )
    return similarity.semdedup_pairs(
        corpus, num_cells=8, threshold=0.95, window=4
    ).orderBy("dropped_id")


@register(
    "embedding_lsh_near_dup",
    sql=f"""
    WITH corpus AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        UNION ALL
        SELECT vec_id + 1000000 AS vec_id, embedding::DOUBLE[] AS v
        FROM embeddings WHERE vec_id < 5),
    planes AS (
        SELECT p.plane, d.dim,
               CASE WHEN CAST('0x' || substr(md5(
                        CAST(p.plane AS VARCHAR) || '|' ||
                        CAST(d.dim AS VARCHAR)), 1, 15) AS BIGINT) & 1 = 1
                    THEN 1.0 ELSE -1.0 END AS sign
        FROM (SELECT unnest(range(0, 12)) AS plane) p
        CROSS JOIN (SELECT unnest(range(0, 64)) AS dim) d),
    elems AS (
        SELECT vec_id,
               unnest(v) AS val,
               unnest(range(0, len(v))) AS dim
        FROM corpus),
    proj AS (
        SELECT e.vec_id, pl.plane, sum(e.val * pl.sign) AS proj
        FROM elems e JOIN planes pl USING (dim)
        GROUP BY e.vec_id, pl.plane),
    buckets AS (
        SELECT vec_id,
               CAST(sum(CASE WHEN proj > 0 THEN power(2.0, plane)
                             ELSE 0.0 END) AS BIGINT) AS bucket
        FROM proj GROUP BY vec_id),
    cand AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM buckets a JOIN buckets b
          ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
    SELECT c.id_a, c.id_b,
           round({_cos_sql('ca.v', 'cb.v')}, 6) AS cos_sim
    FROM cand c
    JOIN corpus ca ON ca.vec_id = c.id_a
    JOIN corpus cb ON cb.vec_id = c.id_b
    WHERE {_cos_sql('ca.v', 'cb.v')} >= 0.95
    ORDER BY id_a, id_b
    """,
    doc="APPROXIMATE embedding near-dup: 12-bit hyperplane signatures "
    "(Charikar SimHash) with md5-DERIVED ±1 planes (parity of "
    "md5('plane|dim') — any engine reproduces the exact planes), "
    "bucket equi-join, exact cosine verify.  The oracle replays the "
    "identical planes, projections, buckets and verification, so the "
    "LSH pipeline is hash-checked end-to-end despite recall < 1 by "
    "design.  Linear-plus-candidates work; recall vs the exact query "
    "is measured in unit tests.  Same planted-clone domain as "
    "embedding_near_dup (identical vectors collide in every bucket, "
    "so the check is non-vacuous).",
)
def embedding_lsh_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    corpus = emb.select("vec_id", "embedding").unionAll(
        emb.filter(F.col("vec_id") < 5).select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
        )
    )
    return similarity.hyperplane_lsh_pairs(corpus, num_planes=12, threshold=0.95).orderBy(
        "id_a", "id_b"
    )


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------
_STOP_SQL = "', '".join(TX.EN_STOPWORDS)

@register(
    "text_stats",
    sql=rf"""
    WITH tok AS (
        SELECT doc_id, lang, n_chars,
               regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        FROM documents)
    SELECT doc_id, lang,
           CAST(len(toks) AS INT) AS n_tokens,
           CAST(len(list_filter(toks, t -> list_contains(['{_STOP_SQL}'], t))) AS INT)
               AS n_stopwords,
           round(CAST(len(list_filter(toks, t -> list_contains(['{_STOP_SQL}'], t)))
                      AS DOUBLE) / len(toks), 6) AS stop_ratio,
           CAST(n_chars AS BIGINT) AS n_chars
    FROM tok
    ORDER BY doc_id
    """,
    doc="per-document text statistics: whitespace token count, stopword "
    "count/ratio (the language-ID feature). Single map pass, no shuffle.",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    # two-level projection: tokenize + stopword-filter ONCE, derive the
    # three outputs from the counts.  The flat TX.token_count /
    # stopword_count / stopword_ratio select repeats the split and the
    # stopword filter inside stopword_ratio's when() branches, which
    # codegen subexpression elimination does NOT dedupe — measured
    # 0.78 s -> 0.53 s at sf0.1 (the r9 "text_stats creep" was this
    # duplicated work, not the environment).  Catalyst keeps the two
    # levels because nt/ns are multiply-referenced non-cheap aliases.
    toks = TX.tokens("text")
    stop = F.array(*[F.lit(w) for w in TX.EN_STOPWORDS])
    base = d.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.size(toks).alias("nt"),
        F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).alias("ns"),
    )
    stats = base.select(
        "doc_id",
        "lang",
        F.col("nt").cast("int").alias("n_tokens"),
        F.col("ns").cast("int").alias("n_stopwords"),
        F.round(
            F.when(F.col("nt") > 0, F.col("ns") / F.col("nt")).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("stop_ratio"),
        "n_chars",
    )
    # NOTE (r12): the trailing global orderBy's range sampler executes
    # the tokenize pass a second time (no exchange bounds it).  A
    # persist-before-sort variant was A/B-tested repeatedly; on this
    # corpus the spillable cache build costs as much as the second map
    # pass (interleaved medians 0.45 persist vs 0.42 plain), so the
    # plain sort stays.  The pattern only pays when the sort input is
    # tiny relative to its child's cost (near_dup_pairs' pair table,
    # dedup_pipeline_roi's 4-row stage table).
    return stats.orderBy("doc_id")


@register(
    "lang_id_agreement",
    sql=rf"""
    WITH feat AS (
        SELECT lang,
               CASE WHEN CAST(len(list_filter(
                        regexp_split_to_array(trim(lower(text)), '\s+'),
                        t -> list_contains(['{_STOP_SQL}'], t))) AS DOUBLE)
                    / len(regexp_split_to_array(trim(lower(text)), '\s+')) >= 0.08
                    THEN 1 ELSE 0 END AS guessed_en
        FROM documents)
    SELECT lang,
           CAST(count(*) AS BIGINT)        AS n_docs,
           CAST(sum(guessed_en) AS BIGINT) AS n_guessed_english
    FROM feat
    GROUP BY lang
    ORDER BY lang
    """,
    doc="language-ID heuristic (stopword-ratio >= 0.08 => English) "
    "cross-tabbed against the labeled lang column.",
)
def lang_id_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    # same two-level shape as text_stats: tokenize + stopword-filter once
    # (TX.is_english_guess recomputes the split inside each of
    # stopword_count and token_count, and codegen CSE does not dedupe it)
    toks = TX.tokens("text")
    stop = F.array(*[F.lit(w) for w in TX.EN_STOPWORDS])
    base = d.select(
        "lang",
        F.size(toks).alias("nt"),
        F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).alias("ns"),
    )
    guessed = (
        F.when(F.col("nt") > 0, F.col("ns") / F.col("nt"))
        .otherwise(F.lit(0.0))
        >= F.lit(0.08)
    ).cast("int")
    return (
        base.select("lang", guessed.alias("guessed_en"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("guessed_en").cast("bigint").alias("n_guessed_english"),
        )
        .orderBy("lang")
    )


@register(
    "doc_fingerprints",
    sql=r"""
    SELECT doc_id,
           md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp,
           CAST(length(text) AS BIGINT) AS text_len
    FROM documents
    ORDER BY doc_id
    """,
    doc="document fingerprinting: md5 digest of normalized text "
    "(bit-identical across engines — doubles as the exact-dedup key).",
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.fingerprint("text").alias("fp"),
        F.length("text").cast("bigint").alias("text_len"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Multimodal columns (binary payload + typed metadata; decode is stubbed)
# --------------------------------------------------------------------------
@register(
    "multimodal_metadata",
    sql="""
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           CAST(64 + octet_length(CAST(text AS BLOB)) % 512 AS INT)  AS width,
           CAST(64 + (octet_length(CAST(text AS BLOB)) // 7) % 512 AS INT) AS height,
           3 AS channels
    FROM documents
    ORDER BY doc_id
    """,
    doc="multimodal plumbing: an opaque binary payload column with typed "
    "metadata extracted by an Arrow-batched mapInPandas 'decoder' "
    "(deterministic stub — real image/audio libs are absent in this "
    "container; see operators in streaming/multimodal tests). The Spark "
    "side (binary schema, batch iteration, output schema) is real.",
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    d = _t(spark, sf_dir, "documents")
    payload = d.select("doc_id", F.col("text").cast("binary").alias("payload"))

    def decode_batches(batches):
        for pdf in batches:
            n_bytes = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes.astype("int64"),
                    # deterministic stand-in for image decode: a real
                    # implementation would parse the container header here
                    "width": (64 + n_bytes % 512).astype("int32"),
                    "height": (64 + (n_bytes // 7) % 512).astype("int32"),
                    "channels": 3,
                }
            )

    out = payload.mapInPandas(
        decode_batches,
        schema="doc_id bigint, n_bytes bigint, width int, height int, channels int",
    )
    return out.orderBy("doc_id")


@register(
    "multimodal_frames",
    sql="""
    WITH framed AS (
        SELECT doc_id, text,
               least(4, greatest(1, CAST(ceil(length(text) / 128.0) AS INT))) AS n_frames
        FROM documents),
    fanned AS (
        SELECT doc_id, text,
               CAST(unnest(range(0, n_frames)) AS INT) AS frame_idx
        FROM framed)
    SELECT doc_id, frame_idx,
           md5(substr(text, frame_idx * 128 + 1, 128)) AS frame_md5,
           CAST(least(128, length(text) - frame_idx * 128) AS INT) AS frame_len
    FROM fanned
    ORDER BY doc_id, frame_idx
    """,
    doc="multimodal frame sampling: 1:N mapInPandas fan-out over payloads "
    "(deterministic fake decoder at the codec seam — operators/"
    "multimodal.py), one row per 128-char 'frame', md5 per frame. "
    "Character framing here so the SQL oracle's substr/md5 replicate the "
    "arithmetic exactly even for non-ASCII; byte framing (the real "
    "binary mode) is exercised in the binaryFile source test.",
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import sample_frames_fake

    d = _t(spark, sf_dir, "documents")
    payload = d.select("doc_id", F.col("text").cast("binary").alias("payload"))
    return sample_frames_fake(payload, unit="chars").orderBy("doc_id", "frame_idx")


# --------------------------------------------------------------------------
# As-of join / sessionization / event-time windows
# --------------------------------------------------------------------------
@register(
    "asof_join_events_orders",
    sql="""
    WITH ranked AS (
        SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
               row_number() OVER (PARTITION BY e.event_id
                   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        FROM events e
        LEFT JOIN orders o
          ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
    SELECT event_id, user_id, o_orderkey AS last_orderkey,
           round(coalesce(o_totalprice, 0.0), 2) AS last_order_price
    FROM ranked WHERE rn = 1
    ORDER BY event_id
    """,
    doc="as-of join (SURVEY §4.3): each event enriched with the user's "
    "most recent order at event time — range join + row_number pick with "
    "deterministic tie-break; asof_join_pandas (cogrouped merge_asof) is "
    "the high-fan-out variant.",
)
def asof_join_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    o = _t(spark, sf_dir, "orders")
    joined = joins.asof_join(
        e, o,
        left_ts="ts", right_ts="o_orderdate",
        left_by="user_id", right_by="o_custkey",
        left_id="event_id", tie_break="o_orderkey",
        # carry only the two consumed columns through the union-merge
        # window (guide §2.3 "project before the exchange"): without
        # this the __r struct packs all six orders columns — including
        # the two STRING columns this query never reads — into the
        # shuffle and the per-key sort (ReadSchema 6 cols -> 4)
        right_cols=["o_orderkey", "o_totalprice"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("last_orderkey"),
        F.round(F.coalesce("o_totalprice", F.lit(0.0)), 2).alias("last_order_price"),
    ).orderBy("event_id")


@register(
    "asof_join_tolerance",
    sql="""
    WITH ranked AS (
        SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
               row_number() OVER (PARTITION BY e.event_id
                   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        FROM events e
        LEFT JOIN orders o
          ON o.o_custkey = e.user_id
         AND o.o_orderdate <= e.ts
         AND o.o_orderdate >= e.ts - INTERVAL 9000 DAY)
    SELECT event_id, user_id, o_orderkey AS last_orderkey,
           round(coalesce(o_totalprice, 0.0), 2) AS last_order_price
    FROM ranked WHERE rn = 1
    ORDER BY event_id
    """,
    doc="as-of join with TOLERANCE (max staleness — the kdb/merge_asof "
    "tolerance semantics): a most-recent order older than 9000 days "
    "before the event is NO match (the synthetic orders end ~22-29 "
    "years before the events, so this cutoff genuinely splits the "
    "match set). Same union-merge "
    "carry-forward plan as asof_join_events_orders; the staleness "
    "filter applies after the carry, adding zero shuffles.",
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    o = _t(spark, sf_dir, "orders")
    joined = joins.asof_join(
        e, o,
        left_ts="ts", right_ts="o_orderdate",
        left_by="user_id", right_by="o_custkey",
        left_id="event_id", tie_break="o_orderkey",
        tolerance="9000 DAYS",
        # same payload pruning as asof_join_events_orders (r12): only
        # these two columns are consumed downstream
        right_cols=["o_orderkey", "o_totalprice"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("last_orderkey"),
        F.round(F.coalesce("o_totalprice", F.lit(0.0)), 2).alias("last_order_price"),
    ).orderBy("event_id")


@register(
    "sessionize_events",
    sql="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE OR
                         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events)
    SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
           CAST(count(*) AS BIGINT) AS n_events
    FROM flagged
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="sessionization (gaps-and-islands): lag + gap>30min flag + sum — "
    "sessions per user. The streaming twin (session_window with "
    "watermark) lives in streaming/windows.py.",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id",
        "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            # timestamp-type-agnostic: timestamp subtraction yields an
            # INTERVAL for both TIMESTAMP and TIMESTAMP_NTZ (unix_micros
            # rejects NTZ, which the driver session infers from parquet)
            | ((F.col("ts") - F.lag("ts").over(w)) > F.expr("INTERVAL 30 MINUTES")),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    return (
        flagged.groupBy("user_id")
        .agg(
            F.sum("new_session").cast("bigint").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )


@register(
    "session_window_agg",
    sql="""
    WITH flagged AS (
        SELECT user_id, ts, value, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessions AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged)
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f')                      AS session_start,
           strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2)     AS total_value
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
    doc="session_window aggregation in BATCH mode (gap 30 min): Spark's "
    "native session_window vs a gaps-and-islands oracle. Window bounds "
    "are [first_ts, last_ts + gap); a gap of exactly 30min starts a new "
    "session (Spark merges only while ts < prev_end). The same plan runs "
    "as a stream in streaming/windows.session_counts_stream.",
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_end"),
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start")
    )


@register(
    "tumbling_window_counts",
    sql="""
    SELECT CAST(time_bucket(INTERVAL 1 DAY, ts) AS DATE) AS window_day,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2)     AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="event-time tumbling window (1 day) counts per type — the batch "
    "twin of the streaming windowed aggregation (streaming/windows.py "
    "runs the identical plan as a Structured Streaming query with "
    "watermark + Trigger.AvailableNow).",
)
def tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").cast("date").alias("window_day"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("window_day", "event_type")
    )


@register(
    "sliding_window_counts",
    sql="""
    WITH offsets AS (SELECT * FROM (VALUES (0), (1)) AS t(o)),
    assigned AS (
        SELECT time_bucket(INTERVAL 1 DAY, e.ts) - to_days(o.o) AS window_start, e.value
        FROM events e CROSS JOIN offsets o)
    SELECT CAST(window_start AS DATE) AS window_day,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2)     AS total_value
    FROM assigned
    GROUP BY 1
    ORDER BY 1
    """,
    doc="sliding window (2-day width, 1-day slide): each event lands in "
    "two windows; Spark's window() emits both assignments in one pass.",
)
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 days", "1 day").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").cast("date").alias("window_day"),
            "n",
            "total_value",
        )
        .orderBy("window_day")
    )


@register(
    "embedding_norms",
    sql="""
    SELECT label,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 4)
               AS avg_norm
    FROM embeddings
    GROUP BY label
    ORDER BY label
    """,
    doc="vector math smoke: average L2 norm per label via higher-order "
    "functions (zip_with/aggregate) — stays JVM-side, no UDF.",
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            "embedding",
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )
    return (
        emb.select("label", norm.alias("nrm"))
        .groupBy("label")
        .agg(F.count("*").alias("n"), F.round(F.avg("nrm"), 4).alias("avg_norm"))
        .orderBy("label")
    )


# shared by near_dup_clusters and near_dup_clusters_star: the cluster
# assignment is algorithm-independent (connected components are unique),
# so both implementations must match the same transitive-closure oracle
# WITH-clause fragment building the exact Jaccard>=0.7 pair graph --
# shared by the cluster oracles here and the 2-core oracle in
# plans/diagnostics.py, so the pair semantics cannot drift between them
NEAR_DUP_PAIRS_CTES = r"""sh AS (
        SELECT doc_id,
               list_distinct([
                   array_to_string(toks[i:i+2], ' ')
                   for i in range(1, greatest(len(toks) - 2, 1) + 1)
               ]) AS shingles
        FROM (SELECT doc_id,
                     regexp_split_to_array(trim(lower(text)), '\s+') AS toks
              FROM documents)
        WHERE len(toks) >= 3),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
              / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.7)"""

_CLUSTERS_ORACLE_SQL = f"""
    WITH RECURSIVE {NEAR_DUP_PAIRS_CTES},
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION
        SELECT doc_b, doc_a FROM pairs),
    reach AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
    SELECT a AS doc_id, CAST(least(a, min(b)) AS BIGINT) AS cluster_id
    FROM reach
    GROUP BY a
    ORDER BY doc_id
    """


@register(
    "near_dup_clusters",
    sql=_CLUSTERS_ORACLE_SQL,
    doc="near-dup CLUSTER assignment: connected components over the "
    "exact Jaccard>=0.7 pair graph by iterative min-label propagation "
    "(rounds bounded by cluster diameter — near-cliques close in 2-4; "
    "localCheckpoint per round truncates lineage). cluster_id = "
    "smallest reachable doc_id, so keep-the-cluster-id-row dedup stays "
    "idempotent. Oracle: DuckDB recursive transitive closure.",
)
def near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.jaccard_join(d, "text", "doc_id", threshold=0.7, k=3)
    return dedup.pair_clusters(pairs).orderBy("doc_id")


@register(
    "near_dup_clusters_star",
    sql=_CLUSTERS_ORACLE_SQL,
    doc="near-dup CLUSTER assignment via alternating large-star/"
    "small-star (Kiveris et al. 2014) — the billion-edge scale path: "
    "O(log n) rounds independent of component diameter, one driver "
    "action per round. Same transitive-closure oracle as "
    "near_dup_clusters (components are algorithm-independent).",
)
def near_dup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.jaccard_join(d, "text", "doc_id", threshold=0.7, k=3)
    return dedup.star_clusters(pairs).orderBy("doc_id")


def _pagerank_iter_cte(i: int) -> str:
    prev = f"r{i-1}"
    return f"""
    c{i} AS (
        SELECT e.dst AS src, sum(r.rank / dd.deg) AS inflow
        FROM edges e
        JOIN {prev} r ON e.src = r.src
        JOIN deg dd ON e.src = dd.src
        GROUP BY e.dst),
    r{i} AS (
        SELECT d.src,
               0.15 / nn.n + 0.85 * coalesce(c.inflow, 0.0) AS rank
        FROM deg d
        CROSS JOIN nn
        LEFT JOIN c{i} c ON d.src = c.src)"""


_PAGERANK_SQL = (
    r"""
    WITH sh AS (
        SELECT doc_id,
               list_distinct([
                   array_to_string(toks[i:i+2], ' ')
                   for i in range(1, greatest(len(toks) - 2, 1) + 1)
               ]) AS shingles
        FROM (SELECT doc_id,
                     regexp_split_to_array(trim(lower(text)), '\s+') AS toks
              FROM documents)
        WHERE len(toks) >= 3),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
              / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.7),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b, doc_a FROM pairs),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
    r0 AS (SELECT d.src, 1.0 / nn.n AS rank FROM deg d CROSS JOIN nn),"""
    + ",".join(_pagerank_iter_cte(i) for i in range(1, 4))
    + """
    SELECT src AS doc_id, round(rank, 6) AS rank
    FROM r3
    ORDER BY doc_id
    """
)


@register(
    "pagerank_near_dup",
    sql=_PAGERANK_SQL,
    doc="iterative PageRank (3 unrolled rounds, d=0.85) over the "
    "undirected exact near-dup graph: centrality WITHIN duplication "
    "neighborhoods — e.g. canonical-representative choice for template "
    "families, where connected components only say who's together. "
    "Each round is one edges-ranks hash join + one aggregation; the "
    "oracle unrolls the identical recurrence as chained CTEs, so the "
    "float trajectory itself is differential-tested.",
)
def pagerank_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import graph

    d = _t(spark, sf_dir, "documents")
    pairs = dedup.jaccard_join(d, "text", "doc_id", threshold=0.7, k=3)
    return graph.pagerank(pairs, iterations=3, damping=0.85).orderBy("doc_id")


@register(
    "variant_event_props",
    sql="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(CAST(json_extract(props, '$.k') AS INTEGER)) AS INT) AS min_k,
           CAST(max(CAST(json_extract(props, '$.k') AS INTEGER)) AS INT) AS max_k,
           round(avg(CAST(json_extract(props, '$.k') AS INTEGER)), 4)    AS avg_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="semi-structured props via the VARIANT type (Spark 4): "
    "parse_json once into a variant column, typed variant_get "
    "extraction, then a plain aggregation — the open-schema ingest "
    "pattern that replaces per-field from_json casts when event "
    "payloads evolve. Oracle extracts the same path with DuckDB's "
    "JSON functions.",
)
def variant_event_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.min("k").cast("int").alias("min_k"),
            F.max("k").cast("int").alias("max_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
        )
        .orderBy("event_type")
    )


@register(
    "udtf_word_ngrams",
    sql=r"""
    WITH g AS (
        SELECT doc_id,
               [{'pos': i - 1, 'gram': array_to_string(toks[i:i+2], ' ')}
                for i in range(1, greatest(len(toks) - 2, 1) + 1)] AS ps
        FROM (SELECT doc_id,
                     regexp_split_to_array(trim(lower(text)), '\s+') AS toks
              FROM documents
              WHERE doc_id < 40)
        WHERE len(toks) >= 3),
    un AS (SELECT doc_id, unnest(ps) AS p FROM g)
    SELECT doc_id,
           CAST(p.pos AS INT) AS pos,
           p.gram AS gram
    FROM un
    ORDER BY doc_id, pos
    """,
    doc="Python UDTF (SURVEY §2.10 UDTF surface, Spark 4 @udtf API): "
    "per-row 1:N fan-out of word 3-grams with ordinal positions via a "
    "LATERAL table function. Deliberately the API-parity twin of the "
    "JVM-side shingle builders (operators/dedup.hashed_shingle_rows) — "
    "a row-at-a-time Python UDTF is the SLOW path at 100 TB; this "
    "query pins its semantics against the oracle so the fast paths "
    "have a documented reference implementation.",
)
def udtf_word_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, gram string")
    class WordNgrams:
        def eval(self, text: str):
            toks = [t for t in re.split(r"\s+", text.strip().lower()) if t != ""]
            for i in range(len(toks) - 2):
                yield i, " ".join(toks[i : i + 3])

    name = "word_ngrams_" + re.sub(r"\W", "_", sf_dir).strip("_")
    spark.udtf.register(name, WordNgrams)
    view = "docs_" + name
    _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 40).createOrReplaceTempView(
        view
    )
    return spark.sql(
        f"""
        SELECT d.doc_id, s.pos, s.gram
        FROM {view} d, LATERAL {name}(d.text) s
        ORDER BY doc_id, pos
        """
    )


@register(
    "top_doc_per_source",
    sql="""
    WITH ranked AS (
        SELECT source, n_chars, doc_id,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id ASC) AS rn,
               count(*)     OVER (PARTITION BY source) AS n_docs,
               max(n_chars) OVER (PARTITION BY source) AS max_chars
        FROM documents)
    SELECT source,
           CAST(n_docs AS BIGINT)    AS n_docs,
           CAST(max_chars AS BIGINT) AS max_chars,
           CAST(doc_id AS BIGINT)    AS top_doc_id
    FROM ranked
    WHERE rn = 1
    ORDER BY source
    """,
    doc="window-free top-1 per group via ARGMAX AGGREGATION "
    "(max_by over a (n_chars, -doc_id) struct — deterministic "
    "tie-break to the smallest doc_id): one partial+final aggregate, "
    "no per-group sort, no row_number window. The 100 TB-preferred "
    "shape for top-1 semantics; rank_orders_per_customer keeps the "
    "window form for k>1.",
)
def top_doc_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
            F.max_by(
                "doc_id", F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("nid"))
            )
            .cast("bigint")
            .alias("top_doc_id"),
        )
        .orderBy("source")
    )


@register(
    "recursive_multi_hop",
    sql=r"""
    WITH RECURSIVE sh AS (
        SELECT doc_id,
               list_distinct([
                   array_to_string(toks[i:i+2], ' ')
                   for i in range(1, greatest(len(toks) - 2, 1) + 1)
               ]) AS shingles
        FROM (SELECT doc_id,
                     regexp_split_to_array(trim(lower(text)), '\s+') AS toks
              FROM documents)
        WHERE len(toks) >= 3),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
              / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.7),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL
        SELECT doc_b, doc_a FROM pairs),
    walk(a, b, depth) AS (
        SELECT a, b, 1 FROM edges
        UNION ALL
        SELECT w.a, e.b, w.depth + 1
        FROM walk w JOIN edges e ON w.b = e.a
        WHERE w.depth < 3)
    SELECT a AS doc_id,
           CAST(least(a, min(b)) AS BIGINT)  AS min_reach_3hop,
           CAST(count(DISTINCT b) AS BIGINT) AS n_reach_3hop
    FROM walk
    GROUP BY a
    ORDER BY doc_id
    """,
    doc="RECURSIVE CTE (new SQL surface in Spark 4): bounded 3-hop "
    "reachability over the near-dup pair graph via WITH RECURSIVE ... "
    "UNION ALL (Spark's recursion doesn't support UNION-distinct yet, "
    "so the depth bound guarantees termination on the cyclic symmetric "
    "graph). The edge relation is computed by the DataFrame "
    "prefix-filter join, checkpointed, and handed to SQL as a view — "
    "the declarative twin of the iterative pair_clusters/star_clusters "
    "operators; both engines run the same recursion.",
)
def recursive_multi_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    import re

    d = _t(spark, sf_dir, "documents")
    # materialize the pair computation once: every recursion step
    # references the edge view, and an un-checkpointed view would
    # re-expand the jaccard subtree per round
    pairs = dedup.jaccard_join(d, "text", "doc_id", threshold=0.7, k=3).select(
        "doc_a", "doc_b"
    ).localCheckpoint()
    dedup.release_intermediates()
    view = "nd_pairs_" + re.sub(r"\W", "_", sf_dir).strip("_")
    pairs.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        WITH RECURSIVE edges AS (
            SELECT doc_a AS a, doc_b AS b FROM {view}
            UNION ALL
            SELECT doc_b, doc_a FROM {view}),
        walk(a, b, depth) AS (
            SELECT a, b, 1 FROM edges
            UNION ALL
            SELECT w.a, e.b, w.depth + 1
            FROM walk w JOIN edges e ON w.b = e.a
            WHERE w.depth < 3)
        SELECT a AS doc_id,
               CAST(least(a, min(b)) AS BIGINT)  AS min_reach_3hop,
               CAST(count(DISTINCT b) AS BIGINT) AS n_reach_3hop
        FROM walk
        GROUP BY a
        ORDER BY doc_id
        """
    )


# frozen PQ codebooks (8 subspaces x 4 codes x 8 dims, integer micro
# units): the pca_projection_check trick applied to PQ — md5-derived
# constants both engines rebuild, so encode/ADC/rerank replay in DuckDB
_PQ_BOOKS = similarity.pq_frozen_codebooks(m=8, ncodes=4, sub=8)
_PQ_CB_VALUES = ",\n              ".join(
    f"({j}, {c}, CAST({_PQ_BOOKS[j][c]} AS BIGINT[]))"
    for j in range(8)
    for c in range(4)
)
# shared CTE chain: micro-quantize -> subspace slices -> per-(vec, j, c)
# integer sq-distances -> argmin codes -> ADC distances (query subvector
# vs the candidate's chosen centroid) -> level-1 sharded top-N
_PQ_SQL_COMMON = f"""
    WITH cb AS (
        SELECT * FROM (VALUES
              {_PQ_CB_VALUES}) t(j, c, cv)),
    v AS (
        SELECT vec_id,
               list_transform(embedding::DOUBLE[],
                              x -> CAST(round(x * 1000000) AS BIGINT)) AS vq
        FROM embeddings),
    sub AS (
        SELECT vec_id, j, vq[j*8+1 : j*8+8] AS sv
        FROM v, unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS u(j)),
    dist AS (
        SELECT s.vec_id, s.j, cb.c,
               list_reduce(list_transform(range(1, 9),
                   i -> (s.sv[i] - cb.cv[i]) * (s.sv[i] - cb.cv[i])),
                   (a, b) -> a + b) AS d
        FROM sub s JOIN cb ON cb.j = s.j),
    code AS (
        SELECT vec_id, j, c AS cd FROM dist
        QUALIFY row_number() OVER (PARTITION BY vec_id, j
                                   ORDER BY d, c) = 1),
    adc AS (
        SELECT q.vec_id AS query_id, cd.vec_id AS neighbor_id,
               sum(list_reduce(list_transform(range(1, 9),
                   i -> (q.sv[i] - cb.cv[i]) * (q.sv[i] - cb.cv[i])),
                   (a, b) -> a + b)) AS adc_d
        FROM code cd
        JOIN cb ON cb.j = cd.j AND cb.c = cd.cd
        JOIN sub q ON q.j = cd.j AND q.vec_id < 10
                  AND q.vec_id != cd.vec_id
        GROUP BY 1, 2)"""


@register(
    "ann_pq_adc",
    sql=_PQ_SQL_COMMON
    + """,
    l1 AS (
        SELECT query_id, neighbor_id, adc_d FROM adc
        QUALIFY row_number() OVER (PARTITION BY query_id, neighbor_id % 64
                                   ORDER BY adc_d, neighbor_id) <= 5)
    SELECT query_id, neighbor_id,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY adc_d, neighbor_id) AS INT)
               AS rnk,
           adc_d AS adc_dist_sq_micro
    FROM l1
    QUALIFY rnk <= 5
    ORDER BY query_id, rnk
    """,
    doc="product-quantization ANN (Jégou 2011) with asymmetric distance "
    "computation, ORACLE-BACKED end to end: codebooks are md5-derived "
    "frozen INTEGER micro-unit constants (operators/similarity."
    "pq_frozen_codebooks — the pca_projection_check trick), vectors "
    "micro-quantize to int64, and encode/ADC are exact integer "
    "arithmetic, so DuckDB replays every argmin and every distance "
    "bit-for-bit (a sample-TRAINED codebook cannot ride in a static "
    "SQL string; pq_train/pq_encode/pq_topk remain the production "
    "trainer, recall-tested in tests/test_diagnostics.py).  The scan "
    "reads 8 one-byte codes per vector, never floats; top-k is the "
    "TWO-LEVEL sharded rank (per (query, id%64) first, then the <=64*k "
    "survivors) so no single task ever sees a query's full candidate "
    "stream at 1e9 corpus size.",
)
def ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    codes = similarity.pq_encode_frozen(emb, _PQ_BOOKS)
    qvq = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        similarity._vec_micro(F.col("embedding")).alias("qvq"),
    )
    return similarity.pq_adc_topk_frozen(codes, qvq, _PQ_BOOKS, k=5).orderBy(
        "query_id", "rnk"
    )


@register(
    "ann_pq_rerank",
    sql=_PQ_SQL_COMMON
    + """,
    l1 AS (
        SELECT query_id, neighbor_id, adc_d FROM adc
        QUALIFY row_number() OVER (PARTITION BY query_id, neighbor_id % 64
                                   ORDER BY adc_d, neighbor_id) <= 50),
    short AS (
        SELECT query_id, neighbor_id FROM l1
        QUALIFY row_number() OVER (PARTITION BY query_id
                                   ORDER BY adc_d, neighbor_id) <= 50),
    resc AS (
        SELECT s.query_id, s.neighbor_id,
               round(CASE WHEN den > 0 THEN dt / den ELSE 0.0 END, 6)
                   AS cos_sim
        FROM (SELECT s.query_id, s.neighbor_id,
                     CAST(list_reduce(list_transform(range(1, 65),
                          i -> a.vq[i] * b.vq[i]), (x, y) -> x + y)
                          AS DOUBLE) AS dt,
                     sqrt(CAST(list_reduce(list_transform(range(1, 65),
                          i -> a.vq[i] * a.vq[i]), (x, y) -> x + y)
                          AS DOUBLE))
                   * sqrt(CAST(list_reduce(list_transform(range(1, 65),
                          i -> b.vq[i] * b.vq[i]), (x, y) -> x + y)
                          AS DOUBLE)) AS den
              FROM short s
              JOIN v a ON a.vec_id = s.query_id
              JOIN v b ON b.vec_id = s.neighbor_id) s)
    SELECT query_id, neighbor_id,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id)
                AS INT) AS rnk,
           cos_sim
    FROM resc
    QUALIFY rnk <= 5
    ORDER BY query_id, rnk
    """,
    doc="two-stage PQ search (IndexIVFPQ+refine pattern), ORACLE-BACKED: "
    "the frozen-codebook ADC pass shortlists 50 candidates per query "
    "from the byte codes alone, then ONLY those rows re-score with "
    "exact cosine over the micro-quantized int64 vectors (integer dot "
    "products — bit-exact cross-engine; the ratio and 6-dp round start "
    "from identical integers).  The exact pass is |queries| x "
    "shortlist regardless of corpus size and the candidate list "
    "broadcasts into the corpus scan, so float-width payloads never "
    "shuffle.  pq_topk_rerank (sample-trained books) remains the "
    "production twin with its >= 0.9 recall pin.",
)
def ann_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    codes = similarity.pq_encode_frozen(emb, _PQ_BOOKS)
    return similarity.pq_rerank_frozen(
        emb, codes, queries, _PQ_BOOKS, k=5, shortlist=50
    ).orderBy("query_id", "rnk")


@register(
    "udtf_polymorphic_first_tokens",
    sql=r"""
    SELECT doc_id,
           toks[1] AS tok1, toks[2] AS tok2, toks[3] AS tok3
    FROM (SELECT doc_id,
                 regexp_split_to_array(trim(lower(text)), '\s+') AS toks
          FROM documents WHERE doc_id < 40)
    ORDER BY doc_id
    """,
    doc="POLYMORPHIC Python UDTF (Spark 4 analyze-time schema): the "
    "output schema — one column per requested token — is computed by "
    "the UDTF's static analyze() from the literal argument n, not "
    "declared up front; @udtf without returnType + AnalyzeResult is "
    "the table-function analog of a generic.  Completes the UDTF "
    "surface next to the fixed-schema udtf_word_ngrams; same slow-"
    "path caveat (row-at-a-time Python) applies at 100 TB.",
)
def udtf_polymorphic_first_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    import re

    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class FirstTokens:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            k = int(n.value)
            st = StructType()
            for i in range(k):
                st = st.add(f"tok{i + 1}", StringType())
            return AnalyzeResult(schema=st)

        def eval(self, text: str, n: int):
            # NO empty-token filter: regexp_split_to_array(trim(''))
            # yields [''] in both engines, and the repo's tokens()
            # helper deliberately preserves that — match it
            toks = re.split(r"\s+", (text or "").strip().lower())
            yield tuple(
                toks[i] if i < len(toks) else None for i in range(int(n))
            )

    name = "first_tokens_" + re.sub(r"\W", "_", sf_dir).strip("_")
    spark.udtf.register(name, FirstTokens)
    view = "docs_poly_" + name
    _t(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 40
    ).createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT d.doc_id, s.tok1, s.tok2, s.tok3
        FROM {view} d, LATERAL {name}(d.text, 3) s
        ORDER BY doc_id
        """
    )


@register(
    "top_session_paths",
    sql="""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                         OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessions AS (
        SELECT user_id, ts, event_id, event_type,
               sum(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged),
    paths AS (
        SELECT user_id, sid,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM sessions GROUP BY user_id, sid)
    SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
    FROM paths
    GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT 10
    """,
    doc="session path mining: gaps-and-islands sessionization (same "
    "30-min rule as sessionize_events), each session collapsed to its "
    "ORDERED event-type path via array_sort(collect_list(struct)) -> "
    "transform -> array_join (the deterministic ordered-aggregation "
    "idiom — collect_list alone has no order guarantee), then the "
    "top-10 paths by frequency.  Path grain is session-sized, the "
    "final top-k is a TakeOrdered over distinct paths.",
)
def top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.lag("ts").over(w).isNull()
            | ((F.col("ts") - F.lag("ts").over(w)) > F.expr("INTERVAL 30 MINUTES")),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = flagged.withColumn(
        "sid",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    paths = sessions.groupBy("user_id", "sid").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(10)
    )


def _cross_modal_domains(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The planted cross-modal fixture (shared by the catalog query and
    the LSH==exact pin test): ids <5 cloned in BOTH modalities, 5-9
    text-cloned with reversed vectors, 10-14 vector-cloned with
    reversed token order."""
    d = _t(spark, sf_dir, "documents")
    e = _t(spark, sf_dir, "embeddings")
    dom = d.select("doc_id", "text").join(
        e.select(F.col("vec_id").alias("doc_id")), "doc_id", "left_semi"
    )
    B = 1_000_000_000
    rev_text = F.array_join(F.reverse(TX.tokens("text")), " ")
    txts = (
        dom.unionByName(
            dom.filter(F.col("doc_id") < 5).select(
                (F.col("doc_id") + B).alias("doc_id"), "text"
            )
        )
        .unionByName(
            dom.filter((F.col("doc_id") >= 5) & (F.col("doc_id") < 10)).select(
                (F.col("doc_id") + 2 * B).alias("doc_id"), "text"
            )
        )
        .unionByName(
            dom.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 15)).select(
                (F.col("doc_id") + 3 * B).alias("doc_id"),
                rev_text.alias("text"),
            )
        )
    )
    ev = e.select("vec_id", "embedding")
    embs = (
        ev.unionByName(
            ev.filter(F.col("vec_id") < 5).select(
                (F.col("vec_id") + B).alias("vec_id"), "embedding"
            )
        )
        .unionByName(
            ev.filter((F.col("vec_id") >= 5) & (F.col("vec_id") < 10)).select(
                (F.col("vec_id") + 2 * B).alias("vec_id"),
                F.reverse("embedding").alias("embedding"),
            )
        )
        .unionByName(
            ev.filter((F.col("vec_id") >= 10) & (F.col("vec_id") < 15)).select(
                (F.col("vec_id") + 3 * B).alias("vec_id"), "embedding"
            )
        )
    )
    return txts, embs



@register(
    "cross_modal_dedup_agreement",
    sql=rf"""
    WITH dom AS (
        SELECT d.doc_id, d.text
        FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
    txts AS (
        SELECT doc_id, text FROM dom
        UNION ALL
        SELECT doc_id + 1000000000, text FROM dom WHERE doc_id < 5
        UNION ALL
        SELECT doc_id + 2000000000, text FROM dom
        WHERE doc_id >= 5 AND doc_id < 10
        UNION ALL
        SELECT doc_id + 3000000000,
               array_to_string(list_reverse(
                   regexp_split_to_array(trim(lower(text)), '\s+')), ' ')
        FROM dom WHERE doc_id >= 10 AND doc_id < 15),
    embs AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        UNION ALL
        SELECT vec_id + 1000000000, embedding::DOUBLE[]
        FROM embeddings WHERE vec_id < 5
        UNION ALL
        SELECT vec_id + 2000000000, list_reverse(embedding::DOUBLE[])
        FROM embeddings WHERE vec_id >= 5 AND vec_id < 10
        UNION ALL
        SELECT vec_id + 3000000000, embedding::DOUBLE[]
        FROM embeddings WHERE vec_id >= 10 AND vec_id < 15),
    sh AS (
        SELECT doc_id, list_distinct([
                   array_to_string(toks[i:i+2], ' ')
                   for i in range(1, greatest(len(toks) - 2, 1) + 1)
               ]) AS shingles
        FROM (SELECT doc_id,
                     regexp_split_to_array(trim(lower(text)), '\s+') AS toks
              FROM txts)
        WHERE len(toks) >= 3),
    tp AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
              / len(list_distinct(list_concat(a.shingles, b.shingles)))
              >= 0.7),
    cm_planes AS (
        SELECT p.plane, d.dim,
               CASE WHEN CAST('0x' || substr(md5(
                        CAST(p.plane AS VARCHAR) || '|' ||
                        CAST(d.dim AS VARCHAR)), 1, 15) AS BIGINT) & 1 = 1
                    THEN 1.0 ELSE -1.0 END AS sign
        FROM (SELECT unnest(range(0, 12)) AS plane) p
        CROSS JOIN (SELECT unnest(range(0, 64)) AS dim) d),
    cm_elems AS (
        SELECT vec_id, unnest(v) AS val, unnest(range(0, len(v))) AS dim
        FROM embs),
    cm_proj AS (
        SELECT el.vec_id, pl.plane, sum(el.val * pl.sign) AS proj
        FROM cm_elems el JOIN cm_planes pl USING (dim)
        GROUP BY el.vec_id, pl.plane),
    cm_buckets AS (
        SELECT vec_id,
               CAST(sum(CASE WHEN proj > 0 THEN power(2.0, plane)
                             ELSE 0.0 END) AS BIGINT) AS bucket
        FROM cm_proj GROUP BY vec_id),
    cm_cand AS (
        SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
        FROM cm_buckets a JOIN cm_buckets b
          ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
    ep AS (
        SELECT c.doc_a, c.doc_b
        FROM cm_cand c
        JOIN embs ca ON ca.vec_id = c.doc_a
        JOIN embs cb ON cb.vec_id = c.doc_b
        WHERE {_cos_sql('ca.v', 'cb.v')} >= 0.95),
    cls AS (
        SELECT coalesce(t.doc_a, e2.doc_a) AS doc_a,
               coalesce(t.doc_b, e2.doc_b) AS doc_b,
               CASE WHEN t.doc_a IS NOT NULL AND e2.doc_a IS NOT NULL
                    THEN 'both'
                    WHEN t.doc_a IS NOT NULL THEN 'text_only'
                    ELSE 'embedding_only' END AS class
        FROM tp t FULL OUTER JOIN ep e2
          ON t.doc_a = e2.doc_a AND t.doc_b = e2.doc_b),
    sfp AS (
        SELECT class, doc_a % 64 AS shard, count(*) AS n,
               md5(string_agg(CAST(doc_a AS VARCHAR) || ':' ||
                              CAST(doc_b AS VARCHAR), '|'
                              ORDER BY doc_a, doc_b)) AS fp
        FROM cls GROUP BY 1, 2)
    SELECT class,
           CAST(coalesce(sum(n), 0) AS BIGINT) AS n_pairs,
           md5(string_agg(fp, '|' ORDER BY shard)) AS pairs_fp
    FROM sfp GROUP BY class ORDER BY class
    """,
    doc="cross-MODAL dedup agreement audit: the near-dup pair sets of "
    "the two dedup families — exact-Jaccard text pairs "
    "(operators/dedup.jaccard_join, >= 0.7) and LSH-candidate "
    "exact-cosine-verified embedding pairs (operators/similarity."
    "hyperplane_lsh_pairs, 12 planes, >= 0.95) — "
    "computed over the SAME id domain (documents restricted to ids "
    "that carry embeddings) and classified both / text_only / "
    "embedding_only, the readout a curator runs to decide whether "
    "semantic dedup can replace (or must complement) lexical dedup.  "
    "The synthetic corpus has no natural high-cosine pairs, so the "
    "domain plants deterministic cross-modal clones (the "
    "embedding_near_dup idiom): ids <5 duplicated in BOTH modalities, "
    "5-9 text-duplicated with REVERSED vectors (text_only), 10-14 "
    "vector-duplicated with REVERSED token order (embedding_only); "
    "offsets sit above the scale-harness replication stride.  Each "
    "class row carries an ordered md5 fingerprint of its full pair "
    "list (the two-level sharded scheme of functions/fingerprint.py — "
    "pairs shard on doc_a, so no class funnels its pair list through "
    "one task), so the oracle checks the pair SETS, not just counts.  "
    "Scale: the text side is the prefix-filtered jaccard join; the "
    "embedding side is the 12-plane hyperplane-LSH pipeline (r11: the "
    "exact block-grid scorer measured exp 0.86 at 100x inside this "
    "audit — quadratic FLOPs by construction — while LSH is linear-"
    "plus-candidates and identically md5-replayable; outputs are "
    "IDENTICAL on this domain because the only >= 0.95 pairs are "
    "exact planted clones, which collide at any width); "
    "classification is one full outer equi-join on pair keys.",
)
def cross_modal_dedup_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup
    from ..operators import similarity as sim

    txts, embs = _cross_modal_domains(spark, sf_dir)
    tp = dedup.jaccard_join(txts, "text", "doc_id", threshold=0.7, k=3).select(
        "doc_a", "doc_b"
    )
    # the LSH path IS the semantic-pair generator here (r11): the exact
    # block-grid scorer is intrinsically quadratic in FLOPs and measured
    # exp 0.86 at 100x inside this audit, while the 12-plane hyperplane
    # pipeline is linear-plus-candidates (100x exp 0.44) and remains
    # md5-replayable — and on this domain the outputs are IDENTICAL:
    # the only >= 0.95 pairs are exact planted clones, which collide at
    # any signature width
    ep = sim.hyperplane_lsh_pairs(
        embs, num_planes=12, threshold=0.95
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    cls = (
        tp.withColumn("t", F.lit(1))
        .join(ep.withColumn("e", F.lit(1)), ["doc_a", "doc_b"], "full_outer")
        .select(
            "doc_a",
            "doc_b",
            F.when(F.col("t").isNotNull() & F.col("e").isNotNull(), "both")
            .when(F.col("t").isNotNull(), "text_only")
            .otherwise("embedding_only")
            .alias("class"),
        )
    )
    # two-level sharded pair fingerprint (functions/fingerprint.py):
    # a class's pairs shard on doc_a instead of funneling through one
    # collect_list task per class
    return FP.corpus_fp_agg(
        cls,
        order=F.struct("doc_a", "doc_b"),
        digest=F.concat(
            F.col("doc_a").cast("string"),
            F.lit(":"),
            F.col("doc_b").cast("string"),
        ),
        shard_key="doc_a",
        count_alias="n_pairs",
        group=("class",),
        fp_alias="pairs_fp",
    ).orderBy("class")
