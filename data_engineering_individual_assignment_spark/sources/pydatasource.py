"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic-events generator, registered as a real
``spark.read.format(...)`` source.

This is the modern replacement for the reference's driver-side REST
landing loop (SURVEY §2.1 S1-S4 discussion): instead of materializing
fetched pages on the driver and parallelizing, a DataSource declares its
schema and PARTITIONS, and Spark schedules one reader task per
partition — the generator below fans out across ``numPartitions``
executor tasks with no driver-side data movement, exactly how a
paginated-API source should scale (one partition per page range).

Determinism: rows are a pure function of (partition, row index) via a
splitmix64-style integer hash — no RNG state, so every read of the same
options yields byte-identical data (required for the differential
harness and for retry-idempotent tasks at scale: a re-scheduled reader
task MUST produce the same partition it replaces).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


_MASK = (1 << 64) - 1


def _mix(x: int) -> int:
    """splitmix64 finalizer: deterministic 64-bit avalanche."""
    x = (x + 0x9E3779B97F4A7C15) & _MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK
    return x ^ (x >> 31)


_EVENT_TYPES = ("view", "click", "purchase", "signup", "error")


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events")`` with options:

    - ``rowsPerPartition`` (default 1000)
    - ``numPartitions`` (default 4)
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return (
            "event_id bigint, user_id bigint, event_type string, value double"
        )

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)


class _Part(InputPartition):
    def __init__(self, index: int, rows: int) -> None:
        self.index = index
        self.rows = rows


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.rows = int(options.get("rowsPerPartition", 1000))
        self.parts = int(options.get("numPartitions", 4))

    def partitions(self):
        return [_Part(i, self.rows) for i in range(self.parts)]

    def read(self, partition: _Part):
        base = partition.index * partition.rows
        for i in range(partition.rows):
            event_id = base + i
            h = _mix(event_id)
            yield (
                event_id,
                h % 1000,  # user_id
                _EVENT_TYPES[(h >> 10) % len(_EVENT_TYPES)],
                round(((h >> 20) % 100_000) / 10_000.0, 4),  # value 0..10
            )


class SyntheticEventsStreamDataSource(DataSource):
    """``spark.readStream.format("synthetic_events_stream")`` — the
    STREAMING twin of the batch generator, built on Spark 4's
    ``SimpleDataSourceStreamReader`` (the pure-Python streaming source
    API).  Offsets are row indices; each micro-batch advances the
    offset by ``rowsPerBatch`` until ``maxRows``.

    Exactly-once comes from determinism: rows are a pure function of
    the offset RANGE, so ``readBetweenOffsets(start, end)`` (Spark's
    failure-recovery replay hook) regenerates precisely the rows the
    lost batch contained — the same splitmix64 row function as the
    batch source, which is also what the stream==batch test asserts.

    Options: ``rowsPerBatch`` (default 100), ``maxRows`` (default
    1000; the stream reports no new data past it, so
    ``processAllAvailable``/availableNow terminate).
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_events_stream"

    def schema(self) -> str:
        return (
            "event_id bigint, user_id bigint, event_type string, value double"
        )

    def simpleStreamReader(self, schema) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(self.options)


def _gen_rows(start: int, end: int):
    for event_id in range(start, end):
        h = _mix(event_id)
        yield (
            event_id,
            h % 1000,
            _EVENT_TYPES[(h >> 10) % len(_EVENT_TYPES)],
            round(((h >> 20) % 100_000) / 10_000.0, 4),
        )


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.batch_rows = int(options.get("rowsPerBatch", 100))
        self.max_rows = int(options.get("maxRows", 1000))

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def read(self, start: dict):
        s = int(start["offset"])
        e = min(s + self.batch_rows, self.max_rows)
        # an ITERATOR over a materialized list: Spark's prefetch cache
        # requires an iterator (it calls next()), but a raw generator
        # can't be pickled when the wrapper caches it — iter(list) is
        # both (bounded by rowsPerBatch).
        return iter(list(_gen_rows(s, e))), {"offset": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(list(_gen_rows(int(start["offset"]), int(end["offset"]))))


def register(spark) -> None:
    """Idempotent registration of the custom formats."""
    spark.dataSource.register(SyntheticEventsDataSource)
    spark.dataSource.register(SyntheticEventsStreamDataSource)
