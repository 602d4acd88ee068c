"""Custom Python Data Source: the reference's transaction queue as a
first-class Spark source.

The reference's S8 "queue source" is an SQS producer stub
(``mock_data_generstion/send_data_to_sqs.py:1-2`` — two import lines, the
consumer was never built). Here it becomes a real engine source via
Spark 4's Python Data Source API (``pyspark.sql.datasource``): register
once, then ``spark.read.format("txqueue")`` (bounded batch drain) or
``spark.readStream.format("txqueue")`` (micro-batch stream with real
offset tracking) — the exact consumer surface an SQS/Kinesis connector
exposes, minus the network.

Determinism contract: message i is a pure function of (seed, i) — a
stable hash-free recurrence (Python's ``random.Random(seed * 1_000_003 +
i)``), so replays of the same offset range are byte-identical. That is
exactly the at-least-once replay property a queue consumer needs: a
retried micro-batch re-reads its offset range and produces the same rows
(idempotent downstream sinks then dedup — streaming/pipeline.py).

Scale notes: batch mode splits the message range into ``numPartitions``
contiguous slices (one reader task each, no driver data path); streaming
mode advances ``rowsPerBatch`` offsets per micro-batch, partitioned the
same way. Generation cost is per-row Python — fine for a mock feed; a
real connector replaces ``_message`` with a network fetch, keeping every
offset/partition mechanism here.

Worker-pickling rule (the engine-wide discipline, see
streaming/pipeline.py's stateful handlers): every class below is defined
INSIDE ``_build_datasource_class`` so its ``__qualname__`` never resolves
from this module's top level — cloudpickle then serializes the whole
class graph BY VALUE into the registered command. A module-level class
would pickle by reference, and Spark's Python workers (fresh interpreters
that inherit neither the driver's ``sys.path`` edits nor its cwd) would
fail to import this package when the driver process runs outside the
repo root — exactly how the round driver invokes ``queries()``.
"""

from __future__ import annotations

_SCHEMA_DDL = (
    "offset BIGINT, transaction_id STRING, product_id STRING, "
    "customer_id STRING, quantity INT, payment_type STRING, "
    "status STRING, transaction_date STRING"
)

_PAYMENT_TYPES = ("credit_card", "debit_card", "paypal", "gift_card")
_STATUSES = ("completed", "pending", "failed")


def _build_datasource_class():
    """Create the DataSource class graph in a closure (see the module
    docstring's worker-pickling rule). Everything the workers touch —
    the message generator, partitions, both readers — lives inside."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceStreamReader,
        InputPartition,
    )
    from pyspark.sql.types import StructType

    schema_ddl = _SCHEMA_DDL
    payment_types = _PAYMENT_TYPES
    statuses = _STATUSES

    def _message(seed: int, i: int) -> tuple:
        """Deterministic message i: replay-stable, partition-independent."""
        import datetime
        import random

        rng = random.Random(seed * 1_000_003 + i)
        ts = datetime.datetime(2024, 1, 1) + datetime.timedelta(
            seconds=i * 13 + rng.randrange(13)
        )
        return (
            i,
            f"TX-{ts:%Y%m%d%H%M%S}-{i % 10000:05d}",
            f"P{rng.randrange(10000):06d}",
            f"C{rng.randrange(5000):06d}",
            rng.randrange(1, 6),
            payment_types[rng.randrange(len(payment_types))],
            statuses[rng.randrange(len(statuses))],
            f"{ts:%Y-%m-%d-%H:%M:%S}",  # the reference's non-ISO format
        )

    class _RangePartition(InputPartition):
        def __init__(self, start: int, end: int):
            self.start = start
            self.end = end

    class _QueueBatchReader(DataSourceReader):
        def __init__(self, options):
            self.seed = int(options.get("seed", 42))
            self.n = int(options.get("nMessages", 1000))
            self.parts = int(options.get("numPartitions", 4))

        def partitions(self):
            step = max(1, (self.n + self.parts - 1) // self.parts)
            return [
                _RangePartition(lo, min(lo + step, self.n))
                for lo in range(0, self.n, step)
            ]

        def read(self, partition):
            for i in range(partition.start, partition.end):
                yield _message(self.seed, i)

    class _QueueStreamReader(DataSourceStreamReader):
        def __init__(self, options):
            self.seed = int(options.get("seed", 42))
            self.rows_per_batch = int(options.get("rowsPerBatch", 100))
            self.max_offset = int(options.get("maxOffset", 10_000))
            self.parts = max(1, int(options.get("numPartitions", 2)))
            self._current = 0

        def initialOffset(self):
            return {"offset": 0}

        def latestOffset(self):
            self._current = min(
                self._current + self.rows_per_batch, self.max_offset
            )
            return {"offset": self._current}

        def partitions(self, start, end):
            lo, hi = start["offset"], end["offset"]
            # offsets live only in driver memory (self._current): a fresh
            # reader after a checkpoint restart starts from 0 while the
            # restored batch start can be far ahead, so a recovered trigger
            # can present end < start. Clamp to an empty range — the engine
            # never commits a backward offset (restart-after-saturation is
            # duplicate-free, pinned by
            # test_txqueue_stream_restart_emits_no_duplicates), and the bump
            # below resynchronizes _current so the NEXT trigger resumes from
            # the committed position.
            hi = max(lo, hi)
            if self._current < hi:
                self._current = hi
            if hi - lo <= 1:
                return [_RangePartition(lo, hi)]
            # contiguous slices, same scheme as the batch reader — the
            # numPartitions option governs per-trigger parallelism
            step = max(1, (hi - lo + self.parts - 1) // self.parts)
            return [
                _RangePartition(p, min(p + step, hi))
                for p in range(lo, hi, step)
            ]

        def read(self, partition):
            for i in range(partition.start, partition.end):
                yield _message(self.seed, i)

        def commit(self, end):
            pass

    class TransactionQueueDataSource(DataSource):
        """format("txqueue") — options: seed, nMessages/numPartitions
        (batch), rowsPerBatch/maxOffset (streaming)."""

        @classmethod
        def name(cls):
            return "txqueue"

        def schema(self):
            return schema_ddl

        def reader(self, schema: StructType):
            return _QueueBatchReader(self.options)

        def streamReader(self, schema: StructType):
            return _QueueStreamReader(self.options)

    return TransactionQueueDataSource


TransactionQueueDataSource = _build_datasource_class()


def register_queue_source(spark) -> None:
    spark.dataSource.register(TransactionQueueDataSource)
