"""Reference-parity queries: the operations the reference pipeline itself
performs, re-expressed on the driver's testdata tables.

- ``regression_ols`` — the flagship.  The reference's AWS Lambda fits a
  simple OLS of views -> comments with a 60/40 split and reports RMSE
  (``lambda_function_final.py:22-99``).  Here the same model is a single
  aggregation plan: b1 = covar_pop/var_pop, b0 = ȳ − b1·x̄, RMSE on the
  held-out split — no collect, no Python loop, no Lambda.  The reference's
  ``random.seed(1)`` split is replaced by a deterministic modulo split so
  the DuckDB oracle reproduces it bit-for-bit (SURVEY §2.10 U1 notes the
  Bernoulli-vs-exact caveat; the seeded Bernoulli variant lives in
  ``operators/regression.py``).
- ``clean_text_md5`` — the C1-C3 cleaning chain (';'->',', strip
  non-ASCII, two-pass control-char removal; reference final DAG 322-329,
  447-454) fingerprinted with md5 so parity is verified byte-exactly.
- ``slash_dates`` — C5/C6 date-string formats ('yyyy/MM/dd' warehouse
  dates, 'yyyy_MM_dd' file keys; reference 36-39, 185-186, 310-311).
- ``posexplode_tokens`` — C14: jagged array -> long (id, ordinal, value)
  table, the pandas melt + insertion-order tag_number reproduced by
  posexplode (reference 425-437).
- ``union_flag_branches`` — C15: two filtered branches tagged with a
  0/1 literal flag then unioned (the reply_flag construction,
  reference 286-303).
- ``null_handling`` — P4-P6: nullif/coalesce/dropna semantics
  (reference 415-421, 436).
- ``ols_moments`` — A2-A4 directly: the mean/variance/covariance the
  Lambda computes with Python loops (``lambda_function_final.py:54-66``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import cleaning
from ..sources.readers import load_table
from .catalog import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Flagship: OLS regression as one aggregation plan
# --------------------------------------------------------------------------
_REGRESSION_SQL = """
WITH labeled AS (
    SELECT l_quantity AS x, l_extendedprice AS y,
           ((l_orderkey * 7 + l_linenumber) % 10) < 6 AS is_train
    FROM lineitem),
coefs AS (
    SELECT covar_pop(x, y) / var_pop(x)                       AS b1,
           avg(y) - covar_pop(x, y) / var_pop(x) * avg(x)     AS b0,
           CAST(count(*) AS BIGINT)                           AS n_train
    FROM labeled WHERE is_train),
test_eval AS (
    SELECT sqrt(avg(pow(c.b0 + c.b1 * t.x - t.y, 2))) AS rmse,
           CAST(count(*) AS BIGINT)                   AS n_test
    FROM labeled t CROSS JOIN coefs c
    WHERE NOT t.is_train
    GROUP BY c.b0, c.b1)
SELECT round(c.b0, 4) AS b0, round(c.b1, 4) AS b1,
       round(e.rmse, 4) AS rmse, c.n_train, e.n_test
FROM coefs c CROSS JOIN test_eval e
"""


@register(
    "regression_ols",
    sql=_REGRESSION_SQL,
    doc="Flagship: the reference Lambda's OLS (views->comments ≈ "
    "quantity->extendedprice) + RMSE on a deterministic 60/40 split, as "
    "two aggregations and a broadcast of a 1-row coefficient frame. "
    "Reference lambda_function_final.py:22-99. At 100 TB this is two "
    "scans (train agg, test eval) with no shuffle beyond a scalar agg.",
)
def regression_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    labeled = li.select(
        F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"),
        (((F.col("l_orderkey") * 7 + F.col("l_linenumber")) % 10) < 6).alias("is_train"),
    )
    train = labeled.filter("is_train")
    coefs = train.agg(
        (F.covar_pop("x", "y") / F.var_pop("x")).alias("b1"),
        (F.avg("y") - (F.covar_pop("x", "y") / F.var_pop("x")) * F.avg("x")).alias("b0"),
        F.count("*").alias("n_train"),
    )
    test = labeled.filter(~F.col("is_train"))
    evaluated = test.crossJoin(F.broadcast(coefs)).agg(
        F.sqrt(F.avg(F.pow(F.col("b0") + F.col("b1") * F.col("x") - F.col("y"), 2))).alias("rmse"),
        F.count("*").alias("n_test"),
        F.first("b0").alias("b0"),
        F.first("b1").alias("b1"),
        F.first("n_train").alias("n_train"),
    )
    return evaluated.select(
        F.round("b0", 4).alias("b0"),
        F.round("b1", 4).alias("b1"),
        F.round("rmse", 4).alias("rmse"),
        "n_train",
        "n_test",
    )


# --------------------------------------------------------------------------
# A2-A4: the Lambda's hand-rolled statistical moments as aggregates
# --------------------------------------------------------------------------
@register(
    "ols_moments",
    sql="""
    SELECT round(avg(l_quantity), 4)                          AS mean_x,
           round(avg(l_extendedprice), 4)                     AS mean_y,
           round(var_pop(l_quantity), 4)                      AS var_x,
           round(covar_pop(l_quantity, l_extendedprice), 4)   AS covar_xy,
           round(corr(l_quantity, l_extendedprice), 6)        AS corr_xy
    FROM lineitem
    """,
    doc="A2/A3/A4: mean, population variance/covariance, correlation — the "
    "quantities lambda_function_final.py:54-66 computes with Python loops, "
    "as one partial+final aggregate.",
)
def ols_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.avg("l_quantity"), 4).alias("mean_x"),
        F.round(F.avg("l_extendedprice"), 4).alias("mean_y"),
        F.round(F.var_pop("l_quantity"), 4).alias("var_x"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("covar_xy"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_xy"),
    )


# --------------------------------------------------------------------------
# C1-C3 cleaning chain, verified by md5 fingerprint
# --------------------------------------------------------------------------
@register(
    "clean_text_md5",
    sql=r"""
    SELECT doc_id,
           md5(regexp_replace(
                 regexp_replace(
                   regexp_replace(translate(text, ';', ','),
                                  '[^\x00-\x7F]', '', 'g'),
                   '\\t|\\n|\\r', '', 'g'),
                 '[\t\n\r]', '', 'g'))        AS clean_md5,
           CAST(length(translate(text, ';', ',')) AS BIGINT) AS clean_len
    FROM documents
    ORDER BY doc_id
    """,
    doc="C1+C2+C3 reference cleaning chain (';'->',' , strip non-ASCII, "
    "two-pass control-char removal) applied to documents.text; md5 makes "
    "the parity check byte-exact. Pure codegen expressions — one map pass.",
)
def clean_text_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    cleaned = cleaning.clean_text("text")
    return d.select(
        "doc_id",
        F.md5(cleaned).alias("clean_md5"),
        F.length(cleaning.replace_semicolons("text")).cast("bigint").alias("clean_len"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# C5/C6: warehouse date-string formats
# --------------------------------------------------------------------------
@register(
    "slash_dates",
    sql="""
    SELECT strftime(o_orderdate, '%Y/%m/%d') AS date_slash,
           strftime(o_orderdate, '%Y_%m_%d') AS date_key,
           CAST(count(*) AS BIGINT) AS n
    FROM orders
    GROUP BY 1, 2
    ORDER BY 1
    """,
    doc="C5/C6: the warehouse's 'yyyy/MM/dd' string dates and 'yyyy_MM_dd' "
    "S3 file keys (reference 36-39, 185-186, 310-311).",
)
def slash_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.date_format("o_orderdate", "yyyy/MM/dd").alias("date_slash"),
            cleaning.run_date_key("o_orderdate").alias("date_key"),
        )
        .agg(F.count("*").alias("n"))
        .orderBy("date_slash")
    )


# --------------------------------------------------------------------------
# C14: jagged arrays -> long ordinal table via posexplode
# --------------------------------------------------------------------------
@register(
    "posexplode_tokens",
    sql=r"""
    WITH toks AS (
        SELECT doc_id,
               (regexp_split_to_array(trim(lower(text)), '\s+'))[1:8] AS toks
        FROM documents)
    SELECT doc_id,
           CAST(generate_subscripts(toks, 1) AS INT) AS tag_number,
           unnest(toks) AS tag_value
    FROM toks
    ORDER BY doc_id, tag_number
    """,
    doc="C14: the video-tags melt (pandas wide-table + melt, reference "
    "425-437) is posexplode — jagged array to (id, 1-based ordinal, value) "
    "rows with insertion-order ordinals and no NaN padding. First 8 tokens "
    "of each document stand in for the tag arrays.",
)
def posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.slice(F.split(F.trim(F.lower("text")), r"\s+"), 1, 8).alias("toks"),
    )
    return (
        toks.select("doc_id", F.posexplode("toks").alias("pos", "tag_value"))
        .select(
            "doc_id",
            (F.col("pos") + 1).cast("int").alias("tag_number"),
            "tag_value",
        )
        .orderBy("doc_id", "tag_number")
    )


# --------------------------------------------------------------------------
# C15: branch + literal flag + union (reply_flag construction)
# --------------------------------------------------------------------------
@register(
    "union_flag_branches",
    sql="""
    SELECT reply_flag, CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value
    FROM (
        SELECT event_id, value, 0 AS reply_flag FROM events WHERE event_type = 'view'
        UNION ALL
        SELECT event_id, value, 1 AS reply_flag FROM events WHERE event_type = 'click')
    GROUP BY reply_flag
    ORDER BY reply_flag
    """,
    doc="C15: the reply_flag pattern — two filtered branches tagged with "
    "literal 0/1 and unioned (top-level comments vs replies, reference "
    "286-303), then aggregated.",
)
def union_flag_branches(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    top = e.filter(F.col("event_type") == "view").select(
        "event_id", "value", F.lit(0).alias("reply_flag")
    )
    replies = e.filter(F.col("event_type") == "click").select(
        "event_id", "value", F.lit(1).alias("reply_flag")
    )
    return (
        top.unionByName(replies)
        .groupBy("reply_flag")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy("reply_flag")
    )


# --------------------------------------------------------------------------
# P4-P6: null handling — nullif / dropna / coalesce-default
# --------------------------------------------------------------------------
@register(
    "null_handling",
    sql="""
    WITH parsed AS (
        SELECT event_type,
               nullif(CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS k_nz
        FROM events)
    SELECT event_type,
           CAST(count(*) AS BIGINT)   AS n_nonnull,
           CAST(sum(k_nz) AS BIGINT)  AS sum_k,
           CAST(min(coalesce(k_nz, -1)) AS BIGINT) AS min_k_defaulted
    FROM parsed
    WHERE k_nz IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="P4 dropna (na.drop on the nulled column), P5 coalesce-with-default "
    "(the missing-tags [''] fallback, reference 415-421), P6 isNotNull "
    "predicates — exercised via nullif over the JSON-extracted field.",
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    parsed = e.select(
        "event_type",
        F.nullif(F.get_json_object("props", "$.k").cast("bigint"), F.lit(0)).alias("k_nz"),
    )
    return (
        parsed.na.drop(subset=["k_nz"])
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_nonnull"),
            F.sum("k_nz").alias("sum_k"),
            F.min(F.coalesce("k_nz", F.lit(-1))).alias("min_k_defaulted"),
        )
        .orderBy("event_type")
    )
