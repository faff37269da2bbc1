from .catalog import CATALOG, Query, queries, oracle_sql, register

# Importing the query modules populates the catalog.
from . import relational, reference, extensions, scalar, advanced, analytics, curation, features, tpch, timeseries, profiling, training, diagnostics, insights, quality, surfaces, stats_tests  # noqa: E402,F401

__all__ = ["CATALOG", "Query", "queries", "oracle_sql", "register"]
