"""Training-data curation pipeline (the north-star composition): the
§2.11 extension operators chained the way an LLM-data pipeline actually
uses them — normalize -> exact-dedup -> quality gate -> token accounting
-> stratified sampling — expressed as single lazy plans with oracles.

At 100 TB this shape is the daily job: every stage is a map or a
digest-keyed aggregation; nothing materializes between stages except
what the optimizer chooses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..sources.readers import load_table
from .catalog import register

_STOPS = "', '".join(TX.EN_STOPWORDS)


@register(
    "curation_pipeline",
    sql=rf"""
    WITH fp AS (
        SELECT doc_id, lang, text,
               md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
        FROM documents),
    survivors AS (
        SELECT * FROM fp
        QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1),
    scored AS (
        SELECT doc_id, lang,
               len(regexp_split_to_array(trim(lower(text)), '\s+')) AS n_tokens,
               (least(length(text) / 500.0, 1.0)
                + (1.0 - least(4.0 * (length(text) - length(regexp_replace(text,
                      '[^\w\s]', '', 'g'))) / greatest(length(text), 1), 1.0))
                + least(5.0 * CAST(len(list_filter(
                      regexp_split_to_array(trim(lower(text)), '\s+'),
                      t -> list_contains(['{_STOPS}'], t))) AS DOUBLE)
                    / greatest(len(regexp_split_to_array(trim(lower(text)), '\s+')), 1), 1.0)
               ) / 3 AS quality
        FROM survivors)
    SELECT lang,
           CAST(count(*) AS BIGINT)       AS n_docs,
           CAST(sum(n_tokens) AS BIGINT)  AS total_tokens,
           round(avg(quality), 4)         AS avg_quality
    FROM scored
    WHERE quality >= 0.5
    GROUP BY lang
    ORDER BY lang
    """,
    doc="the curation composition: fingerprint dedup (min-id survivor) -> "
    "quality gate (>= 0.5) -> per-language document/token accounting. "
    "One plan: a digest-keyed window, map-side feature expressions, one "
    "final small aggregate.",
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("fp").orderBy("doc_id")
    survivors = (
        d.withColumn("fp", TX.fingerprint("text"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
    )
    scored = survivors.select(
        "lang",
        TX.token_count("text").alias("n_tokens"),
        TX.quality_score("text").alias("quality"),
    )
    return (
        scored.filter(F.col("quality") >= 0.5)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.round(F.avg("quality"), 4).alias("avg_quality"),
        )
        .orderBy("lang")
    )


@register(
    "stratified_sample",
    sql="""
    WITH tagged AS (
        SELECT lang,
               CASE WHEN ((doc_id % 1000003) * 2654435761) % 100 < 20
                    THEN 1 ELSE 0 END AS sampled
        FROM documents)
    SELECT lang,
           CAST(count(*) AS BIGINT)     AS n_total,
           CAST(sum(sampled) AS BIGINT) AS n_sampled
    FROM tagged
    GROUP BY lang
    ORDER BY lang
    """,
    doc="deterministic stratified sampling (training-data subsetting): "
    "a multiplicative-hash bucket on the id keeps ~20% per stratum, "
    "reproducible across engines and reruns — no rand(), no "
    "sampleBy-seed engine coupling.  The id is reduced mod a prime "
    "BEFORE the multiply so the product stays inside int64 in every "
    "engine (Spark non-ANSI would silently wrap for ids above ~3.5e9 "
    "while wider-integer engines would not — a divergence and a skew).",
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sampled = (((F.col("doc_id") % 1000003) * 2654435761) % 100 < 20).cast("int")
    return (
        d.select("lang", sampled.alias("sampled"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_total"),
            F.sum("sampled").cast("bigint").alias("n_sampled"),
        )
        .orderBy("lang")
    )
