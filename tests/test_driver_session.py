"""Driver-session type-drift sweep.

The round driver hands us a vanilla SparkSession it built itself — not
our ``get_spark`` — so session-level defaults can differ from the local
test session.  Round 2 shipped a bug exactly of this class:
``sessionize_events`` used ``unix_micros``, which raises
DATATYPE_MISMATCH when ``spark.sql.parquet.inferTimestampNTZ.enabled``
makes ``events.ts`` resolve as TIMESTAMP_NTZ instead of TIMESTAMP.

This sweep flips the two session knobs most likely to drift —
timestamp-NTZ inference ON and a hostile non-UTC session time zone —
then *executes* every catalog query at sf0.001.  It asserts no query
raises; value-level parity is covered by test_queries_oracle (UTC
session) and the /verify recipe (hostile session + oracle at sf0.01).
"""

from __future__ import annotations

import pytest

from .conftest import SF_SMALL

HOSTILE_CONFS = {
    "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
    "spark.sql.session.timeZone": "America/New_York",
}


@pytest.fixture(scope="module")
def hostile_spark(spark):
    saved = {k: spark.conf.get(k) for k in HOSTILE_CONFS}
    for k, v in HOSTILE_CONFS.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in saved.items():
        spark.conf.set(k, v)


def _catalog_names():
    from data_engineering_individual_assignment_spark import plans

    return sorted(plans.CATALOG)


@pytest.mark.parametrize("name", _catalog_names())
def test_query_executes_under_driver_shaped_session(hostile_spark, name):
    from data_engineering_individual_assignment_spark import plans

    df = plans.CATALOG[name].fn(hostile_spark, SF_SMALL)
    # touching every column (count would let Catalyst prune the
    # projection whose expression types we are trying to exercise)
    df.write.format("noop").mode("overwrite").save()
