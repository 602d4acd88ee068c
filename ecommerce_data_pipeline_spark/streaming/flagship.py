"""End-to-end streaming flagship: the reference's EP2 lifecycle as ONE
continuously-running composition.

The reference runs its transaction lifecycle as a Lambda loop
(``transactions_mock_data.py:125-150``): poll the feed → land the batch →
trigger the Glue enrichment join → append to the warehouse, with a
10-second sleep standing in for consistency and NO defense against
redelivery or client retries. Here the same loop is one Structured
Streaming query composed entirely from the engine's individually-tested
streaming pieces:

    txqueue source (S8)                sources/queue_source.py
      → watermarked key-dedup (ST4)    streaming/pipeline.py:65
      → foreachBatch, per micro-batch:
          · broadcast dim enrichment   (EP2's Glue join, J1)
          · idempotent warehouse append (_batch_id dynamic overwrite, ST5)
          · incremental near-dedup store advance (X2 streaming form)

Why TWO dedup layers: watermarked ``dropDuplicatesWithinWatermark`` kills
byte-identical redeliveries (at-least-once queue semantics) by
transaction_id; the near-dedup store catches what key-dedup cannot — the
same purchase RESUBMITTED under a fresh transaction_id (client retry
after a gateway timeout, the classic double-charge hazard). Resubmissions
appear as near-dup pairs in the audit store, keyed by a hash of the
transaction id, while the warehouse append stays reference-faithful
(append every key-distinct fact; auditing is a separate relation, not a
silent drop).

Scale shape per trigger: the dims are broadcast (facts never shuffle for
enrichment), the warehouse append is a partition write, and the
near-dedup advance is O(batch · bands) against the signature store —
nothing in the loop touches the accumulated corpus except through
signatures (see ``neardup_store_increment``). State in the streaming
query itself is bounded by the watermark.

Correctness surface: ``streaming_flagship_certificate``
(plans/misc_plans.py) drains a bounded queue with a redelivery overlay +
id-mutated resubmissions through this composition and grades the landed
warehouse against a batch-mode twin (driver oracle row);
tests/test_streaming_flagship.py covers ≥3-trigger drains, saturation
re-runs, and crash-replay of a single batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ecommerce_data_pipeline_spark.functions.datetime import parse_reference_ts
from ecommerce_data_pipeline_spark.operators.generators import (
    MEMBERSHIP_WEIGHTS,
    PRODUCT_CATEGORIES,
)
from ecommerce_data_pipeline_spark.sources.queue_source import (
    register_queue_source,
)
from ecommerce_data_pipeline_spark.streaming.pipeline import (
    neardup_store_increment,
    stream_dedup_within_watermark,
)


def queue_dimensions(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    """Dimension snapshots covering the queue source's id spaces
    (``P%06d`` over 0..9999, ``C%06d`` over 0..4999 —
    sources/queue_source.py::_message), so the EP2 inner enrichment join
    never orphans a fact. Attributes are pure id-derived Column
    expressions (no rand): the streaming handler and the batch twin must
    join against bit-identical snapshots."""
    pid = F.col("id")
    dim_products = spark.range(10_000).select(
        F.concat(F.lit("P"), F.lpad(pid.cast("string"), 6, "0")).alias(
            "product_id"
        ),
        # deterministic price in [10.00, 500.00), 2dp exact
        (
            (F.pmod(pid * 7919 + 13, F.lit(49_000)) + 1_000).cast(
                "decimal(18,2)"
            )
            / F.lit(100).cast("decimal(18,2)")
        )
        .cast("decimal(18,2)")
        .alias("price"),
        F.element_at(
            F.array(*[F.lit(c) for c in PRODUCT_CATEGORIES]),
            (F.pmod(pid * 31 + 7, F.lit(len(PRODUCT_CATEGORIES))) + 1).cast(
                "int"
            ),
        ).alias("category"),
    )
    levels = [name for name, _w in MEMBERSHIP_WEIGHTS]
    cid = F.col("id")
    dim_customers = spark.range(5_000).select(
        F.concat(F.lit("C"), F.lpad(cid.cast("string"), 6, "0")).alias(
            "customer_id"
        ),
        F.element_at(
            F.array(*[F.lit(m) for m in levels]),
            (F.pmod(cid * 17 + 3, F.lit(len(levels))) + 1).cast("int"),
        ).alias("membership_level"),
    )
    return dim_products, dim_customers


def payload_text(df: DataFrame) -> DataFrame:
    """(doc_id, text) view of a transaction batch for the near-dedup
    audit: doc_id hashes the transaction id (unique per key-distinct
    fact, stable across engines' row order), text is the full business
    payload MINUS the transaction id — so a resubmission under a fresh
    id is an EXACT text duplicate (Jaccard 1) while organically distinct
    transactions share no discriminative shingles."""
    return df.select(
        F.xxhash64("transaction_id").alias("doc_id"),
        F.concat_ws(
            " ",
            "payment_type",
            "status",
            F.concat(F.lit("q"), F.col("quantity").cast("string")),
            "product_id",
            "customer_id",
            "transaction_date",
        ).alias("text"),
    )


def enrich_transactions(
    batch: DataFrame, dim_products: DataFrame, dim_customers: DataFrame
) -> DataFrame:
    """EP2's Glue enrichment join over one micro-batch: both dims
    broadcast (the fact side never shuffles), revenue derived in exact
    decimal. Inner joins — the certificate dims cover the full id space,
    and production orphans are surfaced by the ingest metrics path
    (ingest.py), not silently kept as null-brand rows."""
    return (
        batch.join(F.broadcast(dim_products), "product_id", "inner")
        .join(F.broadcast(dim_customers), "customer_id", "inner")
        .withColumn(
            "revenue",
            (
                F.col("price") * F.col("quantity").cast("decimal(18,2)")
            ).cast("decimal(18,2)"),
        )
    )


def flagship_batch_handler(
    warehouse_root: str,
    dim_products: DataFrame,
    dim_customers: DataFrame,
    neardup_threshold: float = 0.8,
):
    """The per-micro-batch body of the streaming flagship, exposed
    standalone so tests can crash-replay one batch directly (calling it
    twice with the same ``batch_id`` must leave the warehouse and the
    near-dedup stores unchanged — every sink is a ``_batch_id``
    dynamic-partition overwrite)."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        # enrichment + append AND the near-dedup advance both consume
        # the batch — pin it so the queue/dedup lineage runs once. A
        # persist, unpersisted at trigger end: the r6 form
        # localCheckpointed every batch and never released the blocks,
        # which accumulates until ContextCleaner GC in a continuous
        # deployment (r6 ADVICE; mirrors neardup_store_increment's
        # state['persisted'] cleanup). The micro-batch lineage is a
        # deterministic queue read, so eviction can only recompute.
        batch = batch.persist()
        try:
            enriched = enrich_transactions(
                batch, dim_products, dim_customers
            )
            (
                enriched.withColumn("_batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_batch_id")
                .parquet(f"{warehouse_root}/fact_enriched")
            )
            # pre_pinned: payload_text is a projection of the pinned
            # batch — a second pin per trigger is pure overhead
            neardup_store_increment(
                payload_text(batch),
                batch_id,
                docs_path=f"{warehouse_root}/neardup_docs",
                sigs_path=f"{warehouse_root}/neardup_sigs",
                pairs_path=f"{warehouse_root}/neardup_pairs",
                threshold=neardup_threshold,
                pre_pinned=True,
            )
        finally:
            batch.unpersist()

    return handle


def queue_stream(
    spark: SparkSession,
    *,
    seed: int = 42,
    rows_per_batch: int = 100,
    max_offset: int = 300,
    resend_every: int | None = None,
) -> DataFrame:
    """The flagship's raw input: the txqueue stream UNIONED with a
    byte-identical second delivery (at-least-once queue semantics — two
    consumer instances of the same offsets) and, when ``resend_every``
    is set, a client-retry overlay (``resend_overlay``): every Nth
    message resubmitted with a FRESH transaction id and the same
    business payload. Redeliveries are for the watermark dedup to kill;
    resends are for the near-dedup audit to flag."""
    register_queue_source(spark)

    def feed() -> DataFrame:
        return (
            spark.readStream.format("txqueue")
            .option("seed", seed)
            .option("rowsPerBatch", rows_per_batch)
            .option("maxOffset", max_offset)
            .load()
        )

    stream = feed().unionByName(feed())
    if resend_every is not None:
        stream = stream.unionByName(resend_overlay(feed(), resend_every))
    return stream


def resend_overlay(messages: DataFrame, resend_every: int) -> DataFrame:
    """Client-retry overlay over a transaction relation (batch or
    stream): every ``resend_every``-th message resubmitted under a fresh
    transaction id (suffix ``-R``), business payload unchanged — the
    double-charge hazard the near-dedup audit exists to flag. ONE
    definition shared by ``queue_stream`` and the certificate's
    batch-mode twin, so the twin-equality oracle can only fail on the
    pipeline under test, never on divergent overlay constructions."""
    return messages.filter(
        F.pmod(F.col("offset"), F.lit(resend_every)) == 0
    ).withColumn("transaction_id", F.concat("transaction_id", F.lit("-R")))


def run_streaming_flagship(
    spark: SparkSession,
    warehouse_root: str,
    checkpoint: str,
    dim_products: DataFrame,
    dim_customers: DataFrame,
    *,
    source: DataFrame | None = None,
    watermark: str = "4 hours",
    neardup_threshold: float = 0.8,
    available_now: bool = True,
    **queue_opts,
) -> StreamingQuery:
    """Start the composed lifecycle. ``available_now=True`` (default) is
    one availableNow pass — one trigger per call against the
    incrementally-filling mock queue, repeated calls drain it, exactly
    the reference's scheduled-Lambda cadence. ``available_now=False``
    starts a CONTINUOUS query (default ASAP trigger): the caller drains
    with ``q.processAllAvailable()`` then ``q.stop()`` — the same
    micro-batch sequence without a query restart between triggers (the
    certificate uses this; per-restart planning overhead would otherwise
    dominate a bounded drain). ``source`` overrides the default
    ``queue_stream`` for callers composing their own overlays.

    The watermark default (4 hours > the bounded queue's full event-time
    span) keeps dedup state alive across every drain run of the
    certificate/tests; a production deployment sets it to its actual
    redelivery horizon so state stays O(rate × watermark)."""
    if source is not None and queue_opts:
        raise ValueError(
            "source and queue options are mutually exclusive — a "
            f"caller-composed source ignores {sorted(queue_opts)}; bake "
            "them into the source (queue_stream/resend_overlay) instead"
        )
    raw = source if source is not None else queue_stream(spark, **queue_opts)
    with_ts = raw.withColumn("ts", parse_reference_ts(F.col("transaction_date")))
    deduped = stream_dedup_within_watermark(
        with_ts, ["transaction_id"], "ts", watermark=watermark
    )
    handler = flagship_batch_handler(
        warehouse_root, dim_products, dim_customers, neardup_threshold
    )
    writer = deduped.writeStream.foreachBatch(handler).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
