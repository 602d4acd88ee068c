"""Structured Streaming: the reference's implied streaming tier, made real.

Reference parity (SURVEY.md §2.9 — all [implied]):
- SQS producer stub (``mock_data_generstion/send_data_to_sqs.py:1-2``, two
  import lines, never written) → a file-stream source over the landing
  directory stands in for the queue (S8).
- Lambda-scheduled micro-batching (handlers ``transactions_mock_data.py:
  125-150``) → Structured Streaming micro-batches with explicit triggers.
- The 10 s "S3 consistency" sleep (``transactions_mock_data.py:132``) and
  1-minute partition granularity (``:90``) — crude late-data handling →
  real watermarks (``withWatermark``) + windowed aggregation.
- The fire-and-forget Glue append (``:105-123``) → ``foreachBatch``
  running the enrichment join + warehouse append transactionally per
  micro-batch, with checkpointing instead of blind triggers.

Scale notes: streaming state (dedup keys, open windows) is partitioned by
key across executors; watermarks bound state size — without them the
dedup/bag state grows forever at 100 TB/day. ``availableNow`` triggers
give tests (and backfills) deterministic run-to-completion semantics.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def read_file_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """S8: stream the landing directory (SQS stand-in). New files become
    micro-batch input — exactly the reference's per-run CSV drops."""
    reader = spark.readStream.schema(schema).format(fmt)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def stream_dedup(
    events: DataFrame, key_cols: list[str], ts_col: str, watermark: str = "10 minutes"
) -> DataFrame:
    """Stateful streaming dedup — P3's semantic over an infinite stream.

    The watermark lets Spark drop per-key state older than the lateness
    bound; keys are hash-partitioned so state scales horizontally.
    """
    return events.withWatermark(ts_col, watermark).dropDuplicates(key_cols)


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window_len: str = "5 minutes",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Tumbling-window counts/sums per event type, watermark-bounded.

    Pass ``watermark=None`` when an upstream stateful operator (e.g.
    stream_dedup) already set one — Spark disallows redefining it.
    """
    if watermark is not None:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(F.window(ts_col, window_len), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_aggregate(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Per-user session windows (gap-based) — the stateful operator the
    reference's minute-partitioned landing layout approximates.

    ``watermark=None`` when chained after another stateful operator.
    """
    if watermark is not None:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(F.session_window(ts_col, gap), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("session_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def foreach_batch_append(
    stream: DataFrame,
    out_path: str,
    checkpoint: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
) -> StreamingQuery:
    """EP2's Glue step as foreachBatch: per micro-batch, apply the
    enrichment transform and append to the warehouse table — with
    checkpoint-based exactly-once bookkeeping instead of the reference's
    fire-and-forget ``glue.start_job_run`` + sleep."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        out = transform(batch) if transform else batch
        out.write.mode("append").parquet(out_path)

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def run_available_now(
    df: DataFrame, checkpoint: str, output_mode: str = "append"
) -> tuple[StreamingQuery, str]:
    """Drain the stream to an in-memory sink (deterministic test/backfill
    runner); returns the query + the temp view name holding results.

    Aggregations should use ``output_mode='complete'`` in tests: in append
    mode a window only emits once the watermark passes it, so the tail
    windows of a drained finite stream would never appear.
    """
    name = f"stream_out_{abs(hash(checkpoint)) % 10**8}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    return q, name
