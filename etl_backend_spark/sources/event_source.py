"""Custom Python DataSource (PySpark 4 ``spark.dataSource.register`` API):
a deterministic synthetic chat-event generator, batch and streaming.

This is the engine's "rate-source with domain shape": the reference's
WebSocket clients produce events at some rate (reference
src/websocket.ts:38-63); for load tests and streaming demos we need that
traffic without a live socket. Events are generated deterministically from
(partition, offset) so re-reads and replays are identical — the same
replayability contract the file/Kafka sources give Structured Streaming.

Scale notes: ``numPartitions`` controls read parallelism (each partition
generates an id-disjoint slice); the stream reader hands out offset ranges
per micro-batch, so throughput scales with partitions x trigger rate.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def _event(i: int, n_users: int):
    h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
    return (
        i,
        EPOCH + timedelta(seconds=i),
        h % n_users,
        EVENT_TYPES[h % len(EVENT_TYPES)],
        round((h % 10_000) / 100.0, 2),
        '{"k": %d}' % (h % 100),
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int, n_users: int):
        self.start, self.end, self.n_users = start, end, n_users


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("numrows", 1000))
        self.n_parts = int(options.get("numpartitions", 4))
        self.n_users = int(options.get("numusers", 100))

    def partitions(self):
        step = -(-self.n_rows // self.n_parts)
        return [
            _RangePartition(lo, min(lo + step, self.n_rows), self.n_users)
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            yield _event(i, partition.n_users)


class SyntheticEventsStreamReader(DataSourceStreamReader):
    """Micro-batch offsets are plain event counters; replaying an offset
    range regenerates identical rows (deterministic source contract)."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rowsperbatch", 100))
        self.n_users = int(options.get("numusers", 100))
        self.n_parts = int(options.get("numpartitions", 2))

    def initialOffset(self):
        return {"offset": 0}

    def latestOffset(self):
        # each poll advances one batch worth of events
        if not hasattr(self, "_cur"):
            self._cur = 0
        self._cur += self.rows_per_batch
        return {"offset": self._cur}

    def partitions(self, start, end):
        lo, hi = start["offset"], end["offset"]
        step = -(-(hi - lo) // self.n_parts) or 1
        return [
            _RangePartition(a, min(a + step, hi), self.n_users)
            for a in range(lo, hi, step)
        ]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            yield _event(i, partition.n_users)

    def commit(self, end):
        pass


class SyntheticEventsDataSource(DataSource):
    """Usage:
        spark.dataSource.register(SyntheticEventsDataSource)
        spark.read.format("synthetic_events").option("numRows", 10000).load()
        spark.readStream.format("synthetic_events").load()
    """

    @classmethod
    def name(cls):
        return "synthetic_events"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return SyntheticEventsReader(self.options)

    def streamReader(self, schema):
        return SyntheticEventsStreamReader(self.options)
