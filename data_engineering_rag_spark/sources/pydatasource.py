"""Spark 4 Python Data Source API (§2.1 EXT): a from-scratch batch
source implemented against ``pyspark.sql.datasource`` — the public
extension point for reading systems Spark has no built-in connector
for (internal REST feeds, bespoke binary logs, device telemetry).

The source here emits DETERMINISTIC synthetic telemetry (pure integer
arithmetic per row id), which makes it oracle-checkable: DuckDB
replays the same generator with ``generate_series``. The interesting
part is the plumbing, which is exactly what a real connector needs:

- ``partitions()`` returns N ``InputPartition`` splits → Spark
  schedules N parallel ``read()`` calls (one per task). Range-split by
  row id, so reads never overlap and the union is exactly [0, rows).
- ``read(partition)`` is a generator yielding tuples — rows stream
  into Arrow batches without materializing a partition in memory.
- options arrive as strings through the reader constructor (the
  ``.option()`` channel), schema is declared DDL-style.

At 100 TB the same shape holds: partitions() maps to the remote
system's natural shards (files, topic partitions, id ranges) and each
executor pulls only its slice.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

TELEMETRY_SCHEMA = "reading_id bigint, sensor_id int, reading double"


def _reading(i: int) -> float:
    # pure integer arithmetic then ONE double division — bit-identical
    # in any engine that replays it
    return ((i * i) % 97) / 7.0


class SyntheticTelemetryReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self):
        return [InputPartition(p) for p in range(self.n_parts)]

    def read(self, partition: InputPartition):
        p = partition.value
        # contiguous range split: partition p owns [lo, hi)
        base, rem = divmod(self.rows, self.n_parts)
        lo = p * base + min(p, rem)
        hi = lo + base + (1 if p < rem else 0)
        for i in range(lo, hi):
            yield (i, i % 50, _reading(i))


class SyntheticTelemetryDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_telemetry"

    def schema(self) -> str:
        return TELEMETRY_SCHEMA

    def reader(self, schema) -> SyntheticTelemetryReader:
        return SyntheticTelemetryReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticTelemetryDataSource)


def read_telemetry(spark, rows: int = 5000, partitions: int = 8):
    register(spark)
    return (
        spark.read.format("synthetic_telemetry")
        .option("rows", str(rows))
        .option("partitions", str(partitions))
        .load()
    )


class _RangePartition(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo, self.hi = lo, hi


class SyntheticTelemetryStreamReader(DataSourceStreamReader):
    """Micro-batch STREAM reader for the same telemetry generator
    (Spark 4 ``DataSourceStreamReader``): offsets are row positions,
    ``latestOffset`` advances one ``batch_rows`` micro-batch per
    trigger (self-capped at ``rows``), and ``partitions(start, end)``
    range-splits each batch so executors read slices in parallel —
    the same offset/partition contract a Kafka-style connector keeps.

    Offsets are JSON dicts. ``partitions(start, end)`` depends only on
    the offset range, so any committed range re-reads identically —
    but ``_pos`` (the latestOffset cursor) is in-memory DRIVER state:
    this source is single-run-only. A restarted query's checkpoint may
    hold a committed offset ahead of the fresh ``_pos = 0``; the
    cursor fast-forwards to any ``start`` Spark passes (and
    ``commit`` keeps it ≥ every committed end) so no inverted
    ``end < start`` range is ever produced, but rows before the
    checkpointed offset are simply not replayed. A durable connector
    would persist the generator's high-water mark with the offsets."""

    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.batch_rows = int(options.get("batch_rows", 250))
        self.n_parts = int(options.get("partitions", 4))
        self._pos = 0

    def initialOffset(self):
        return {"i": 0}

    def latestOffset(self):
        self._pos = min(self._pos + self.batch_rows, self.rows)
        return {"i": self._pos}

    def partitions(self, start, end):
        lo, hi = start["i"], end["i"]
        # fast-forward the in-memory cursor past any offset Spark has
        # already committed (restart-with-checkpoint case) so the next
        # latestOffset() can never step backwards below `start`.
        self._pos = max(self._pos, hi)
        if hi <= lo:
            # Never return zero partitions: some Spark versions reject
            # an empty partition list once a batch has been planned.
            # A single empty-range partition makes read() yield nothing
            # while the planner always sees >= 1 input split.
            return [_RangePartition(lo, lo)]
        n = max(1, min(self.n_parts, hi - lo))
        base, rem = divmod(hi - lo, n)
        parts = []
        cur = lo
        for p in range(n):
            size = base + (1 if p < rem else 0)
            parts.append(_RangePartition(cur, cur + size))
            cur += size
        return parts

    def read(self, partition: _RangePartition):
        for i in range(partition.lo, partition.hi):
            yield (i, i % 50, _reading(i))

    def commit(self, end):
        self._pos = max(self._pos, end["i"])


class SyntheticTelemetryStreamSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_telemetry_stream"

    def schema(self) -> str:
        return TELEMETRY_SCHEMA

    def streamReader(self, schema) -> SyntheticTelemetryStreamReader:
        return SyntheticTelemetryStreamReader(self.options)


def read_telemetry_stream(spark, rows: int = 5000, batch_rows: int = 1000, partitions: int = 4):
    spark.dataSource.register(SyntheticTelemetryStreamSource)
    return (
        spark.readStream.format("synthetic_telemetry_stream")
        .option("rows", str(rows))
        .option("batch_rows", str(batch_rows))
        .option("partitions", str(partitions))
        .load()
    )
