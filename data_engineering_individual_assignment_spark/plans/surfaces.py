"""Modern engine surfaces, batch 2 (the batch-1 surfaces — VARIANT,
pipe syntax, collations, recursive CTE, UDTF, Observation — live in
plans/advanced.py and plans/extensions.py):

- hidden ``_metadata`` file-source columns (file provenance without a
  side-channel manifest),
- Spark 4 SQL session variables (DECLARE / SET VAR / EXECUTE IMMEDIATE),
- Spark 4 SQL scripting (BEGIN ... WHILE ... END compound statements),
- plus a Zipf-law fit of the token distribution (the tokenizer-design
  diagnostic), which is plain SQL but belongs to the same
  "engine-evidence" family.

Scale notes: the provenance and Zipf queries are single linear
aggregations; the session-variable and scripting queries move CONTROL
FLOW to the engine, not data — each loop iteration is an ordinary
Catalyst-planned aggregate, so the loop body scales like any query and
the loop count is logarithmic by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TX
from ..sources.readers import load_table, register_temp_views
from .catalog import register

from ..functions.text import TOKS_SQL as _TOKS  # noqa: E402


@register(
    "file_provenance_counts",
    sql="""
    SELECT 'documents.parquet' AS file_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id,
           CAST(max(doc_id) AS BIGINT) AS max_doc_id
    FROM documents
    """,
    doc="file provenance via the hidden _metadata struct on file "
    "sources (file_name / row_index) — per-file row accounting with NO "
    "side-channel manifest and no input_file_name() UDF.  The testdata "
    "table is a single file, so the oracle pins the constant; the "
    "multi-file behavior (per-shard counts matching a written layout) "
    "is pinned in tests/test_surfaces.py.",
)
def file_provenance_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.col("_metadata.file_name").alias("file_name"), "doc_id")
        .groupBy("file_name")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("file_name")
    )


@register(
    "session_variable_threshold",
    sql="""
    WITH thr AS (SELECT avg(o_totalprice) AS t FROM orders)
    SELECT CAST(count(*) AS BIGINT) AS n_above,
           round(min(o_totalprice), 2) AS min_above,
           round((SELECT t FROM thr), 2) AS threshold
    FROM orders CROSS JOIN thr
    WHERE o_totalprice > thr.t
    """,
    doc="SQL session variables (Spark 4): DECLARE OR REPLACE VARIABLE + "
    "SET VAR from a scalar subquery, then EXECUTE IMMEDIATE a query "
    "that references the variable — the parameterized-SQL workflow "
    "without string interpolation.  The variable is a 1-row constant "
    "folded into the plan (the scan filter is ordinary pushdown); the "
    "oracle inlines the same scalar subquery.",
)
def session_variable_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_temp_views(spark, sf_dir, "orders")
    spark.sql(
        "DECLARE OR REPLACE VARIABLE graft_price_thr DOUBLE DEFAULT 0.0"
    )
    spark.sql(
        "SET VAR graft_price_thr = (SELECT avg(o_totalprice) FROM orders)"
    )
    return spark.sql(
        """EXECUTE IMMEDIATE
        'SELECT CAST(count(*) AS BIGINT) AS n_above,
                round(min(o_totalprice), 2) AS min_above,
                round(graft_price_thr, 2) AS threshold
         FROM orders WHERE o_totalprice > graft_price_thr'"""
    )


@register(
    "sql_scripting_coverage_search",
    sql="""
    WITH ranked AS (
        SELECT o_totalprice,
               row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey)
                   AS rn,
               sum(o_totalprice) OVER (ORDER BY o_totalprice DESC, o_orderkey)
                   AS cum
        FROM orders),
    tot AS (SELECT sum(o_totalprice) AS t,
                   CAST(count(*) AS BIGINT) AS n FROM orders),
    m AS (SELECT min(rn) AS m FROM ranked CROSS JOIN tot
          WHERE cum >= 0.5 * t),
    k AS (SELECT CAST(power(2, ceil(log2(m))) AS BIGINT) AS k FROM m)
    SELECT k.k AS k_orders,
           round((SELECT max(cum) FROM ranked WHERE rn <= k.k)
                 / (SELECT t FROM tot), 6) AS coverage
    FROM k
    """,
    doc="SQL scripting (Spark 4 BEGIN/WHILE/END): a compound statement "
    "doubles k until the top-k orders cover half of total revenue — "
    "engine-side control flow where each iteration is an ordinary "
    "Catalyst-planned TakeOrdered aggregate, so the loop adds "
    "O(log answer) query executions and zero driver-side data "
    "movement.  The loop body scans a CACHE TABLE of the skinny "
    "(price, key) projection built once inside the script — the "
    "O(log answer) re-scans hit the columnar cache, never parquet, "
    "and the iteration count grows only with log(answer) at larger "
    "corpora (top-k itself is per-partition heaps + driver merge, "
    "never a global sort).  The oracle derives the same power-of-two "
    "analytically from the revenue cumsum.",
)
def sql_scripting_coverage_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_temp_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        BEGIN
          -- INT, not BIGINT: LIMIT only accepts integer-typed expressions
          DECLARE k INT DEFAULT 1;
          DECLARE cov DOUBLE DEFAULT 0.0;
          DECLARE tot DOUBLE DEFAULT 0.0;
          -- CACHE TABLE registers a temp view: drop any leftover from a
          -- prior invocation in the same session before re-creating it
          DROP VIEW IF EXISTS graft_prices;
          CACHE TABLE graft_prices AS
            SELECT o_totalprice, o_orderkey FROM orders;
          SET tot = (SELECT sum(o_totalprice) FROM graft_prices);
          SET cov = (SELECT sum(p) / tot FROM (
              SELECT o_totalprice AS p FROM graft_prices
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 1));
          WHILE cov < 0.5 DO
            SET k = k * 2;
            SET cov = (SELECT sum(p) / tot FROM (
                SELECT o_totalprice AS p FROM graft_prices
                ORDER BY o_totalprice DESC, o_orderkey LIMIT k));
          END WHILE;
          UNCACHE TABLE graft_prices;
          DROP VIEW IF EXISTS graft_prices;
          SELECT CAST(k AS BIGINT) AS k_orders, round(cov, 6) AS coverage;
        END
        """
    )


@register(
    "zipf_fit_tokens",
    sql=f"""
    WITH cnts AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
        GROUP BY tok),
    ranked AS (
        SELECT ln(row_number() OVER (ORDER BY c DESC, tok)) AS lx,
               ln(c) AS ly
        FROM cnts)
    SELECT CAST(count(*) AS BIGINT) AS vocab_size,
           round(-(covar_pop(lx, ly) / var_pop(lx)), 6) AS zipf_alpha,
           round(corr(lx, ly) * corr(lx, ly), 6) AS r_squared
    FROM ranked
    """,
    doc="Zipf-law fit of the token frequency distribution: OLS slope of "
    "ln(freq) on ln(rank) over the vocabulary relation (alpha ~ 1 for "
    "natural language; far off for synthetic/templated corpora — a "
    "tokenizer-design and data-quality diagnostic).  One vocabulary-"
    "sized agg + one closed-form regression aggregate.",
)
def zipf_fit_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    cnts = (
        docs.select(F.explode(TX.tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    ranked = cnts.select(
        F.log(F.row_number().over(Window.orderBy(F.desc("c"), F.asc("tok")))).alias(
            "lx"
        ),
        F.log("c").alias("ly"),
    )
    return ranked.agg(
        F.count("*").alias("vocab_size"),
        F.round(-(F.covar_pop("lx", "ly") / F.var_pop("lx")), 6).alias("zipf_alpha"),
        F.round(F.pow(F.corr("lx", "ly"), 2), 6).alias("r_squared"),
    )


@register(
    "arrow_native_token_median",
    sql=f"""
    WITH counts AS (
        SELECT source, len({_TOKS}) AS n_tokens FROM documents)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(quantile_cont(n_tokens, 0.5), 1) AS median_tokens
    FROM counts GROUP BY source ORDER BY source
    """,
    doc="pure-Arrow UDF path (Spark 4 mapInArrow + applyInArrow): token "
    "counts computed with pyarrow.compute kernels (split_pattern + "
    "list_value_length — no pandas materialization), then an exact "
    "per-source median via a grouped applyInArrow that sorts inside "
    "Arrow.  The Arrow path skips the pandas conversion entirely — "
    "the lowest-overhead Python boundary Spark offers; like every "
    "order statistic, the median group ships whole to one task, so "
    "the group key must be well-distributed.",
)
def arrow_native_token_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.compute as pc

    docs = load_table(spark, sf_dir, "documents").select("source", "text")

    def count_tokens(batches):
        for batch in batches:
            text = batch.column(1)
            toks = pc.split_pattern_regex(
                pc.utf8_lower(pc.utf8_trim_whitespace(text)), r"\s+"
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), pc.cast(pc.list_value_length(toks), pa.int64())],
                names=["source", "n_tokens"],
            )

    counted = docs.mapInArrow(count_tokens, schema="source string, n_tokens long")

    # no annotations: PySpark resolves the UDF flavor from the signature
    # hints, and unresolvable string annotations (PEP 563) break that
    # inspection with an opaque eval_type error
    def group_median(key, table):
        v = pc.array_sort_indices(table.column("n_tokens"))
        s = pc.take(table.column("n_tokens"), v)
        n = len(s)
        if n % 2:
            med = s[n // 2].as_py() * 1.0
        else:
            med = (s[n // 2 - 1].as_py() + s[n // 2].as_py()) / 2.0
        return pa.Table.from_arrays(
            [
                pa.array([key[0].as_py() if hasattr(key[0], "as_py") else key[0]]),
                pa.array([n], type=pa.int64()),
                pa.array([round(med, 1)], type=pa.float64()),
            ],
            names=["source", "n_docs", "median_tokens"],
        )

    return (
        counted.groupBy("source")
        .applyInArrow(
            group_median, schema="source string, n_docs long, median_tokens double"
        )
        .orderBy("source")
    )


@register(
    "sql_pivot_unpivot",
    sql="""
    WITH wide AS (
        SELECT CAST(year(o_orderdate) AS INT) AS yr,
               round(sum(CASE WHEN o_orderstatus = 'F'
                              THEN o_totalprice END), 2) AS f_total,
               round(sum(CASE WHEN o_orderstatus = 'O'
                              THEN o_totalprice END), 2) AS o_total,
               round(sum(CASE WHEN o_orderstatus = 'P'
                              THEN o_totalprice END), 2) AS p_total
        FROM orders GROUP BY yr)
    SELECT yr, status, total FROM wide
    UNPIVOT (total FOR status IN (f_total AS 'F', o_total AS 'O',
                                  p_total AS 'P'))
    ORDER BY yr, status
    """,
    doc="SQL-syntax PIVOT ... UNPIVOT round trip (the Spark SQL "
    "clauses, not the DataFrame .pivot()/.unpivot() API, which "
    "pivot_event_types / unpivot_part_attrs already cover): orders "
    "pivoted wide by status then unpivoted back to long — a lossless "
    "wide<->long round trip whose output equals the direct grouped "
    "aggregate, which is exactly what the oracle computes.  Rows "
    "with NULL totals (status absent in a year) drop in UNPIVOT "
    "(both engines' documented semantics).",
)
def sql_pivot_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_temp_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        WITH wide AS (
            SELECT * FROM (
                SELECT CAST(year(o_orderdate) AS INT) AS yr,
                       o_orderstatus, o_totalprice
                FROM orders)
            PIVOT (round(sum(o_totalprice), 2)
                   FOR o_orderstatus IN ('F' AS f_total, 'O' AS o_total,
                                         'P' AS p_total)))
        SELECT yr, status, total FROM wide
        UNPIVOT (total FOR status IN (f_total AS `F`, o_total AS `O`,
                                      p_total AS `P`))
        ORDER BY yr, status
        """
    )


@register(
    "parameterized_sql_revenue",
    sql="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    WHERE o_totalprice > 150000.0 AND o_orderdate >= TIMESTAMP '1996-06-01'
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="parameterized spark.sql (named parameter markers + args dict "
    "— the injection-safe templating added in Spark 3.4): threshold "
    "and cutoff arrive as BOUND PARAMETERS, not string interpolation; "
    "Catalyst still constant-folds and pushes them to the scan.  The "
    "oracle inlines the same literals.",
)
def parameterized_sql_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_temp_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders
        WHERE o_totalprice > :threshold AND o_orderdate >= :cutoff
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        args={"threshold": 150000.0, "cutoff": "1996-06-01 00:00:00"},
    ).select(
        "o_orderpriority", F.col("n").cast("long").alias("n"), "revenue"
    )


@register(
    "conversion_latency_quantiles",
    sql="""
    WITH firsts AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup' THEN ts END) AS s_ts,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS p_ts
        FROM events GROUP BY user_id),
    lat AS (
        SELECT (epoch_us(p_ts) - epoch_us(s_ts)) / 3600000000.0
                   AS hours
        FROM firsts
        WHERE s_ts IS NOT NULL AND p_ts IS NOT NULL AND p_ts >= s_ts)
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           round(quantile_disc(hours, 0.5), 4) AS p50_hours,
           round(quantile_disc(hours, 0.9), 4) AS p90_hours
    FROM lat
    """,
    doc="conversion latency: per user, first signup -> first purchase "
    "delay (conditional-min aggregation — one pass, no join), exact "
    "discrete p50/p90 over the user-grain latency relation via "
    "percentile_disc (an actual data value at rank ceil(p*n) — "
    "matching DuckDB quantile_disc; the interpolating percentile() "
    "would not).  The funnel-timing metric next to "
    "event_funnel's stage counts; user-grain input keeps the exact "
    "percentile cheap.",
)
def conversion_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "s_ts"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "p_ts"
        ),
    )
    lat = firsts.filter(
        F.col("s_ts").isNotNull()
        & F.col("p_ts").isNotNull()
        & (F.col("p_ts") >= F.col("s_ts"))
    ).select(
        # timestampdiff is timestamp-type-agnostic (works under both
        # TIMESTAMP and the driver session's TIMESTAMP_NTZ; casting a
        # timestamp to double is not).  MICROSECOND, not SECOND: the
        # event timestamps carry sub-second parts, and truncated
        # elapsed-seconds vs DuckDB's boundary-crossing date_diff
        # disagree by 1s on ~half the users — both sides now compute
        # the latency at full microsecond exactness (same discipline
        # as timeseries.state_dwell_times).
        (
            F.expr("timestampdiff(MICROSECOND, s_ts, p_ts)").cast("double")
            / 3.6e9
        ).alias("hours")
    )
    return lat.agg(
        F.count("*").alias("n_converted"),
        F.round(F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY hours)"), 4).alias("p50_hours"),
        F.round(F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY hours)"), 4).alias("p90_hours"),
    )
