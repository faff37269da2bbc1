"""PySpark-native analytics engine with the query/data-processing
capabilities of ``joshnlewedum/data-engineering-individual-assignment``.

The reference is a daily Airflow ELT pipeline (YouTube API -> pandas ->
S3 CSV -> Postgres -> Lambda OLS regression).  This package re-expresses
every operator it performs -- and the LLM-data-pipeline extensions a
100 TB deployment needs -- as idiomatic Spark DataFrame / SQL plans:
declarative, shuffle-aware, collect-free.

Layout:
    session      SparkSession factory tuned for local[32] testing and
                 cluster-scale defaults (AQE, broadcast thresholds).
    sources      parquet/CSV/JSON readers + the YouTube-shaped nested-JSON
                 normalizer that rebuilds the reference's 4 warehouse tables.
    functions    column-expression libraries: cleaning (reference parity),
                 text analysis, vector math.
    operators    composed operators Spark lacks natively: as-of join,
                 dedup (exact/minhash/simhash), similarity search, unpivot,
                 OLS regression-as-aggregation.
    plans        the query catalog: every SURVEY.md §2 operator as a named
                 (spark_fn, oracle_sql) pair consumed by __spark_entry__.py.
    streaming    Structured Streaming: windowed aggregation with watermark,
                 Trigger.AvailableNow incremental batch.
    sinks        partitioned parquet warehouse writer, ';'-CSV compat sink.
"""

__version__ = "0.1.0"
