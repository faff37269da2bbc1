"""Scalar-function surface coverage (SURVEY §2.8): string, math,
conditional, and array expression suites, each oracle-checked.

The reference's scalar usage is C1-C12 (cleaning, dates, sqrt/pow,
concat, JSON) — those have dedicated parity queries in reference.py.
These suites pin the *general* function surface an analyst gets, and
they are deliberately projection-heavy: everything stays inside
whole-stage codegen, no shuffle except the final small aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import EN_STOPWORDS
from ..sources.readers import load_table
from .catalog import register

_STOPS = "', '".join(EN_STOPWORDS)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "string_funcs",
    sql="""
    SELECT p_partkey,
           upper(p_name)                          AS name_upper,
           CAST(length(p_name) AS INT)            AS name_len,
           substr(p_name, 1, 5)                   AS name_prefix,
           concat(p_brand, '#', p_type)           AS brand_type,
           replace(p_type, ' ', '_')              AS type_snake,
           lpad(CAST(p_size AS VARCHAR), 4, '0')  AS size_padded,
           CASE WHEN contains(p_name, 'a') THEN 1 ELSE 0 END AS has_a
    FROM part
    ORDER BY p_partkey
    """,
    doc="C10 generalization: upper/length/substr/concat/replace/lpad/"
    "contains — all codegen, single map pass.",
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("int").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.concat("p_brand", F.lit("#"), "p_type").alias("brand_type"),
        F.replace("p_type", F.lit(" "), F.lit("_")).alias("type_snake"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.when(F.contains("p_name", F.lit("a")), 1).otherwise(0).alias("has_a"),
    ).orderBy("p_partkey")


@register(
    "math_funcs",
    sql="""
    SELECT l_orderkey, l_linenumber,
           round(sqrt(l_extendedprice), 4)            AS price_sqrt,
           round(pow(l_discount, 2), 6)               AS disc_sq,
           CAST(ceil(l_quantity / 7.0) AS BIGINT)     AS qty_ceil7,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_kfloor,
           round(ln(l_extendedprice + 1), 6)          AS price_ln,
           abs(l_quantity - 25.0)                     AS qty_center_dist,
           CAST(l_quantity AS BIGINT) % 5             AS qty_mod5
    FROM lineitem
    WHERE l_linenumber = 1 AND l_orderkey < 500
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="C7/C8 generalization: sqrt/pow/ceil/floor/ln/abs/mod — the "
    "Lambda's math surface (LF:36-38,66) and beyond.",
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_linenumber") == 1) & (F.col("l_orderkey") < 500))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
            F.round(F.pow("l_discount", 2), 6).alias("disc_sq"),
            F.ceil(F.col("l_quantity") / 7.0).cast("bigint").alias("qty_ceil7"),
            F.floor(F.col("l_extendedprice") / 1000).cast("bigint").alias("price_kfloor"),
            F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
            F.abs(F.col("l_quantity") - 25.0).alias("qty_center_dist"),
            (F.col("l_quantity").cast("bigint") % 5).alias("qty_mod5"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "case_when_buckets",
    sql="""
    SELECT CASE WHEN o_totalprice < 10000 THEN 'small'
                WHEN o_totalprice < 50000 THEN 'medium'
                WHEN o_totalprice < 100000 THEN 'large'
                ELSE 'jumbo' END AS bucket,
           CAST(count(*) AS BIGINT)      AS n,
           round(avg(o_totalprice), 4)   AS avg_price
    FROM orders
    GROUP BY 1
    ORDER BY 1
    """,
    doc="conditional expressions: CASE WHEN bucketing + aggregate.",
)
def case_when_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 10000, "small")
        .when(F.col("o_totalprice") < 50000, "medium")
        .when(F.col("o_totalprice") < 100000, "large")
        .otherwise("jumbo")
    )
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("n"), F.round(F.avg("o_totalprice"), 4).alias("avg_price"))
        .orderBy("bucket")
    )


@register(
    "array_funcs",
    sql=r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        FROM documents)
    SELECT doc_id,
           CAST(len(t) AS INT)                       AS n_tokens,
           CAST(len(list_distinct(t)) AS INT)        AS n_distinct,
           CASE WHEN list_contains(t, 'spark') THEN 1 ELSE 0 END AS has_spark,
           t[1]                                      AS first_token,
           t[-1]                                     AS last_token,
           array_to_string(t[1:3], '-')              AS first3_joined
    FROM toks
    ORDER BY doc_id
    """,
    doc="array surface (C13/C14 generalization): size, distinct, "
    "contains, element_at, slice, join — higher-order-function-free "
    "forms that stay in codegen.",
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    t = F.split(F.trim(F.lower("text")), r"\s+")
    return d.select(
        "doc_id",
        F.size(t).cast("int").alias("n_tokens"),
        F.size(F.array_distinct(t)).cast("int").alias("n_distinct"),
        F.array_contains(t, "spark").cast("int").alias("has_spark"),
        F.element_at(t, 1).alias("first_token"),
        F.element_at(t, -1).alias("last_token"),
        F.array_join(F.slice(t, 1, 3), "-").alias("first3_joined"),
    ).orderBy("doc_id")


@register(
    "bpe_token_estimate",
    sql=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
                '[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]')) AS INT) AS bpe_tokens,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
    ORDER BY doc_id
    """,
    doc="BPE-ish token estimate (SURVEY §2.11 token counting): word "
    "pieces <=4 chars + digits + punctuation runs, via regexp_count — "
    "the LLM-cost accounting pass, one codegen map.",
)
def bpe_token_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import bpe_ish_token_count

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        bpe_ish_token_count("text").alias("bpe_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
    ).orderBy("doc_id")


@register(
    "date_funcs",
    sql="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d')                     AS d,
           CAST(year(o_orderdate) AS INT)                        AS y,
           CAST(month(o_orderdate) AS INT)                       AS m,
           CAST(dayofweek(o_orderdate) AS INT)                   AS dow,
           CAST(quarter(o_orderdate) AS INT)                     AS q,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d')  AS plus3m,
           CAST(date_diff('day', o_orderdate,
                TIMESTAMP '2002-01-01 00:00:00') AS BIGINT)      AS days_to_2002
    FROM orders
    WHERE o_orderkey < 300
    ORDER BY o_orderkey
    """,
    doc="date/time function surface (C5/C6 generalization): year/month/"
    "dayofweek/quarter, date_trunc, add_months, datediff. Spark dayofweek "
    "is 1-based Sunday, DuckDB 0-based — the Spark side subtracts 1.",
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderkey") < 300)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"),
            F.year("o_orderdate").cast("int").alias("y"),
            F.month("o_orderdate").cast("int").alias("m"),
            # Spark dayofweek: 1=Sunday..7; DuckDB dayofweek: 0=Sunday..6
            (F.dayofweek("o_orderdate") - 1).cast("int").alias("dow"),
            F.quarter("o_orderdate").cast("int").alias("q"),
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
                "month_start"
            ),
            F.date_format(
                F.add_months("o_orderdate", 3).cast("timestamp"), "yyyy-MM-dd"
            ).alias("plus3m"),
            F.datediff(
                F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")
            ).cast("bigint").alias("days_to_2002"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "map_funcs",
    sql="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="map-typed columns (SURVEY §2.8 'map functions: absent' engine "
    "surface): props parsed into map<string,string>, accessed via "
    "element_at/map_keys; the oracle checks the extracted values (DuckDB "
    "has no map-from-JSON, so it reads the field directly).",
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    parsed = e.select(
        "event_type",
        F.element_at(m, "k").cast("bigint").alias("k_val"),
    )
    return (
        parsed.filter(F.col("k_val").isNotNull())
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.max("k_val").alias("max_k"))
        .orderBy("event_type")
    )


@register(
    "quality_scores",
    sql=rf"""
    WITH feat AS (
        SELECT doc_id,
               least(length(text) / 500.0, 1.0) AS length_term,
               1.0 - least(4.0 * (length(text) - length(regexp_replace(text,
                     '[^\w\s]', '', 'g'))) / greatest(length(text), 1), 1.0) AS punct_term,
               least(5.0 * CAST(len(list_filter(
                     regexp_split_to_array(trim(lower(text)), '\s+'),
                     t -> list_contains(['{_STOPS}'], t))) AS DOUBLE)
                   / greatest(len(regexp_split_to_array(trim(lower(text)), '\s+')), 1), 1.0)
                   AS stop_term
        FROM documents)
    SELECT doc_id, round((length_term + punct_term + stop_term) / 3, 6) AS quality
    FROM feat
    ORDER BY doc_id
    """,
    doc="document quality scoring (SURVEY §2.11): length/punctuation/"
    "stopword composite in [0,1], deterministic and SQL-expressible.",
)
def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import quality_score

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.round(quality_score("text"), 6).alias("quality")
    ).orderBy("doc_id")
