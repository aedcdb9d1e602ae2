"""Deterministic synthetic-events data source (Python DataSource API).

``spark.read.format("events_datagen")`` / ``spark.readStream.format(
"events_datagen")`` — a self-registering Spark 4 custom source that
generates the lake's ``events`` shape (event_id, user_id, event_type,
value, ts) without touching storage. The batch/soak-test source every
pipeline needs: load-test an operator at any row count, or drive a
streaming query with a reproducible unbounded feed.

Design for scale:
- generation is PER PARTITION and seeded by (seed, partition index):
  executors generate their own rows from an O(1) description — no
  driver materialization, no data movement, linear scale-out with
  ``numPartitions``;
- rows are emitted as Arrow ``RecordBatch``es (the vectorized fast
  path through the Python data source API), built from numpy arrays;
- the stream reader hands out row-range offsets per micro-batch, so
  a restart resumes exactly at the committed offset (replayable,
  exactly-once with a checkpointed sink).

Register with ``register_datagen(spark)``; then the format name works
for every reader in the session.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ts", T.TimestampNTZType()),
    ]
)

_EVENT_TYPES = ("click", "view", "signup", "purchase")
_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00 UTC


def _splitmix64(x):
    """Vectorized splitmix64 finalizer over uint64 arrays (numpy uint64
    wraps modulo 2^64 — the intended semantics of the mixer)."""
    import numpy as np

    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype("uint64")
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _gen_batch(start: int, end: int, seed: int, n_users: int = 1000):
    """Arrow RecordBatch of rows [start, end).

    Every column is a PURE per-row function of (seed, event_id) —
    counter-based generation, not a sequential RNG stream — so ANY
    partitioning of the id space (and any replay of a sub-range)
    yields the same rows. That invariant is what makes the source
    safe to scale out and to resume from a checkpointed offset.
    """
    import numpy as np
    import pyarrow as pa

    ids = np.arange(start, end, dtype="int64")
    h = _splitmix64(ids.astype("uint64") ^ np.uint64(seed * 0x5EED5EED5EED))
    user_id = (h % np.uint64(max(1, n_users))).astype("int64")
    h2 = _splitmix64(h)
    etype = np.array(_EVENT_TYPES)[(h2 % np.uint64(len(_EVENT_TYPES))).astype("int64")]
    # 53-bit mantissa slice -> uniform [0, 1), rounded for readability
    value = np.round((h2 >> np.uint64(11)).astype("float64") / float(1 << 53) * 100.0, 6)
    ts = _EPOCH_US + ids * 1_000_000  # one event per second of id-time
    return pa.RecordBatch.from_arrays(
        [
            pa.array(ids),
            pa.array(user_id),
            pa.array(etype),
            pa.array(value),
            pa.array(ts, type=pa.timestamp("us")),
        ],
        names=["event_id", "user_id", "event_type", "value", "ts"],
    )


@dataclass
class _RangePartition(InputPartition):
    start: int
    end: int
    seed: int


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("numrows", 1000))
        self.n_parts = int(options.get("numpartitions", 8))
        self.seed = int(options.get("seed", 42))
        self.n_users = int(options.get("numusers", 1000))

    def partitions(self):
        if self.n_rows <= 0:
            # degenerate numRows=0: one empty partition instead of
            # range(0, 0, 0) blowing up
            return [_RangePartition(0, 0, self.seed)]
        step = -(-self.n_rows // self.n_parts)
        return [
            _RangePartition(lo, min(lo + step, self.n_rows), self.seed)
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _RangePartition):
        yield _gen_batch(partition.start, partition.end, partition.seed, self.n_users)


def _gen_rows(start: int, end: int, seed: int, n_users: int = 1000):
    """Row-tuple iterator view of ``_gen_batch`` (the simple stream
    reader is row-oriented; the batch reader uses the Arrow path).
    Materialized list iterator, not a generator — Spark's stream-reader
    prefetch cache copy.copy()s it, which generators don't support."""
    batch = _gen_batch(start, end, seed, n_users)
    cols = [batch.column(i).to_pylist() for i in range(batch.num_columns)]
    return iter(list(zip(*cols)))


class _StreamReader(SimpleDataSourceStreamReader):
    """Offset = next event_id to emit; each micro-batch advances by
    ``rowsPerBatch``. Offsets are plain dicts checkpointed by Spark —
    a restarted query regenerates exactly the uncommitted range."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rowsperbatch", 100))
        self.seed = int(options.get("seed", 42))
        self.n_users = int(options.get("numusers", 1000))

    def initialOffset(self):
        return {"next": 0}

    def read(self, start):
        end = {"next": start["next"] + self.rows_per_batch}
        return _gen_rows(start["next"], end["next"], self.seed, self.n_users), end

    def readBetweenOffsets(self, start, end):
        return _gen_rows(start["next"], end["next"], self.seed, self.n_users)

    def commit(self, end):
        pass


class EventsDatagenSource(DataSource):
    """Options: numRows (batch), numPartitions, rowsPerBatch (stream),
    numUsers, seed. All lower-cased by Spark before reaching the reader."""

    @classmethod
    def name(cls) -> str:
        return "events_datagen"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return _BatchReader(self.options)

    def simpleStreamReader(self, schema):
        return _StreamReader(self.options)


def register_datagen(spark) -> None:
    """Register the source under its format name for this session.

    The class is pickled by module reference into Spark's Python
    workers, so ``parquet_export_spark`` must be importable there —
    true automatically in local mode run from the repo root, and on a
    cluster via the standard routes (``spark-submit --py-files``,
    ``sparkContext.addPyFile``, or an installed wheel).
    """
    spark.dataSource.register(EventsDatagenSource)
