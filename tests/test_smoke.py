"""Smoke tests of the driver contract (__spark_entry__.py)."""

from __future__ import annotations


def test_entry_returns_rows(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    r = rows[0].asDict()
    assert r["n_train"] > 0 and r["n_test"] > 0
    assert r["b1"] is not None and r["rmse"] is not None


def test_queries_and_oracles_align():
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles).issubset(set(qs))
    # the vast majority must carry an oracle (rows-only is the exception)
    assert len(oracles) >= 0.75 * len(qs)


def test_catalog_registers_the_named_function():
    """Every CATALOG entry's fn must BE the function named after the
    query — a helper def inserted between @register and the query def
    silently steals the decorator and registers the helper (the r12
    cross_modal_dedup_agreement incident: unit tests importing the
    function directly stayed green while the driver-facing catalog
    entry returned a tuple)."""
    from data_engineering_individual_assignment_spark import plans

    mismatched = {
        name: q.fn.__name__
        for name, q in plans.CATALOG.items()
        if q.fn.__name__ != name
    }
    assert not mismatched


def test_load_table_schema_cache(spark):
    """The r12 schema cache: the second load of a path must take the
    explicit-schema fast path and produce an identical schema AND
    identical rows (covers the events nanos->micros rewrite, whose
    dtype check must see the same bigint on both paths)."""
    from data_engineering_individual_assignment_spark.sources import readers

    sf = "/root/testdata/sf0.001"
    for name in ("events", "nation"):
        readers._SCHEMA_CACHE.pop(
            (id(spark), f"{sf}/{name}.parquet"), None
        )
        first = readers.load_table(spark, sf, name)
        assert (id(spark), f"{sf}/{name}.parquet") in readers._SCHEMA_CACHE
        second = readers.load_table(spark, sf, name)
        assert first.schema == second.schema
        a = sorted(map(str, first.limit(50).collect()))
        b = sorted(map(str, second.limit(50).collect()))
        assert a == b
