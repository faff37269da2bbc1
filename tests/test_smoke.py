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
