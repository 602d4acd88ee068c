"""Structured Streaming tests: file-stream ingest, stateful dedup,
windowed aggregation, session windows, foreachBatch append — each run to
completion with availableNow triggers and compared against the batch
equivalent (SURVEY.md §5.3).
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from ecommerce_data_pipeline_spark.sources.readers import load_table
from ecommerce_data_pipeline_spark.streaming.pipeline import (
    foreach_batch_append,
    read_file_stream,
    run_available_now,
    session_aggregate,
    stream_dedup,
    tumbling_counts,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def landing_dir(spark):
    """Write the events fixture into a multi-file landing zone (stream
    source), with the second half duplicated to exercise dedup."""
    d = tempfile.mkdtemp(prefix="landing_")
    events = load_table(spark, SF_SMOKE, "events")
    events.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    odd = events.filter(F.col("event_id") % 2 == 1).coalesce(1)
    odd.write.mode("append").parquet(d)
    odd.write.mode("append").parquet(d)  # duplicate drop (re-delivered batch)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="module")
def events_schema(spark):
    return load_table(spark, SF_SMOKE, "events").schema


def _drain(df, output_mode="append"):
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q, name = run_available_now(df, ckpt, output_mode)
    q.awaitTermination(120)
    shutil.rmtree(ckpt, ignore_errors=True)
    return name


def test_stream_dedup_drops_redelivered_batch(spark, landing_dir, events_schema):
    stream = read_file_stream(spark, landing_dir, events_schema)
    deduped = stream_dedup(stream, ["event_id"], "ts", watermark="1 hour")
    name = _drain(deduped)
    n = spark.table(name).count()
    expected = load_table(spark, SF_SMOKE, "events").count()
    assert n == expected  # re-delivered files collapse to one copy


def test_tumbling_counts_match_batch(spark, landing_dir, events_schema):
    stream = read_file_stream(spark, landing_dir, events_schema)
    deduped = stream_dedup(stream, ["event_id"], "ts", watermark="1 hour")
    agg = tumbling_counts(deduped, window_len="5 minutes", watermark=None)
    name = _drain(agg, output_mode="complete")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.table(name).collect()
    }
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("v"),
        )
        .select(F.col("window.start").alias("ws"), "event_type", "n", "v")
        .collect()
    )
    expected = {(r["ws"], r["event_type"]): (r["n"], r["v"]) for r in batch}
    assert got == expected


def test_session_windows_stream(spark, landing_dir, events_schema):
    stream = read_file_stream(spark, landing_dir, events_schema)
    deduped = stream_dedup(stream, ["event_id"], "ts", watermark="1 hour")
    sess = session_aggregate(deduped, gap="30 minutes", watermark=None)
    name = _drain(sess, output_mode="complete")
    rows = spark.table(name).collect()
    assert rows
    # total events across sessions == distinct events
    assert sum(r["n_events"] for r in rows) == load_table(
        spark, SF_SMOKE, "events"
    ).count()
    # session bounds are ordered and per-user
    for r in rows:
        assert r["session_start"] <= r["session_end"]


def test_foreach_batch_append_lands_parquet(spark, landing_dir, events_schema):
    out = tempfile.mkdtemp(prefix="warehouse_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_fb_")
    stream = read_file_stream(spark, landing_dir, events_schema)

    def enrich(batch):
        return batch.withColumn("ingested", F.lit(True))

    q = foreach_batch_append(stream, f"{out}/events", ckpt, transform=enrich)
    q.awaitTermination(120)
    landed = spark.read.parquet(f"{out}/events")
    # all delivered rows land (dedup is a separate operator); schema extended
    assert landed.count() == spark.read.parquet(landing_dir).count()
    assert "ingested" in landed.columns
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)


def test_stream_stream_join_bounded(spark, landing_dir, events_schema):
    """Purchases ⋈ signups within 30 minutes per user, as a stream-stream
    join — checked against the equivalent batch join."""
    from ecommerce_data_pipeline_spark.streaming.pipeline import stream_stream_join

    stream = read_file_stream(spark, landing_dir, events_schema)
    purchases = stream.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("p_id")
    )
    signups = stream.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("s_ts"), F.col("event_id").alias("s_id")
    )
    joined = stream_stream_join(
        purchases, signups, on="user_id", left_ts="ts", right_ts="s_ts"
    ).select("p_id", "s_id")
    name = _drain(joined)
    got = {(r["p_id"], r["s_id"]) for r in spark.table(name).collect()}

    ev = spark.read.parquet(landing_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("p_id")
    ).distinct()
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("u2"), F.col("ts").alias("s_ts"),
        F.col("event_id").alias("s_id"),
    ).distinct()
    batch = p.join(
        s,
        (F.col("user_id") == F.col("u2"))
        & (F.col("s_ts") <= F.col("ts"))
        & (F.col("s_ts") >= F.col("ts") - F.expr("INTERVAL 30 minutes")),
    )
    expected = {(r["p_id"], r["s_id"]) for r in batch.collect()}
    assert got == expected
    assert got  # the fixture produces at least one in-window pair


def test_stateful_user_counts_accumulate(spark, landing_dir, events_schema):
    """applyInPandasWithState: final per-user counters equal the batch
    totals (update mode emits per micro-batch; the last emission per user
    carries the lifetime count)."""
    from ecommerce_data_pipeline_spark.streaming.pipeline import stateful_user_counts

    stream = read_file_stream(spark, landing_dir, events_schema)
    deduped = stream_dedup(stream, ["event_id"], "ts", watermark="1 hour")
    counts = stateful_user_counts(deduped, watermark=None)
    name = _drain(counts, output_mode="update")
    out = spark.table(name).collect()
    # take each user's max (= latest cumulative) emission
    latest = {}
    for r in out:
        cur = latest.get(r["user_id"])
        if cur is None or r["n_events"] > cur:
            latest[r["user_id"]] = r["n_events"]
    batch = {
        r["user_id"]: r["n"]
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert latest == batch


def test_stream_static_enrich_matches_batch(spark, landing_dir, events_schema):
    """Stream-static broadcast enrichment produces exactly the batch
    join's rows once drained (streaming twin of the J1 star join)."""
    from ecommerce_data_pipeline_spark.streaming.pipeline import (
        stream_static_enrich,
    )

    dim = (
        load_table(spark, SF_SMOKE, "customer")
        .select(F.col("c_custkey"), F.col("c_mktsegment"))
    )
    stream = read_file_stream(spark, landing_dir, events_schema)
    enriched = stream_static_enrich(
        stream_dedup(stream, ["event_id"], "ts", watermark="1 hour"),
        dim, "user_id", "c_custkey"
    ).select("event_id", "user_id", "c_mktsegment")
    name = _drain(enriched)
    got = {
        (r["event_id"], r["user_id"], r["c_mktsegment"])
        for r in spark.table(name).collect()
    }
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .dropDuplicates(["event_id"])
        .join(dim, F.col("user_id") == F.col("c_custkey"), "left")
        .select("event_id", "user_id", "c_mktsegment")
    )
    want = {
        (r["event_id"], r["user_id"], r["c_mktsegment"])
        for r in batch.collect()
    }
    assert got == want


def test_stream_dedup_within_watermark_bounded_state(spark, landing_dir, events_schema):
    """dropDuplicatesWithinWatermark drops the re-delivered batch like the
    unbounded-state form, but its state expires with the watermark —
    the scale-safe default for at-least-once redelivery."""
    from ecommerce_data_pipeline_spark.streaming.pipeline import (
        stream_dedup_within_watermark,
    )

    stream = read_file_stream(spark, landing_dir, events_schema)
    deduped = stream_dedup_within_watermark(
        stream, ["event_id"], "ts", watermark="24 hours"
    )
    name = _drain(deduped)
    n = spark.table(name).count()
    expected = load_table(spark, SF_SMOKE, "events").count()
    assert n == expected


def test_foreach_batch_idempotent_replay_no_duplicates(spark, landing_dir, events_schema, tmp_path):
    """Re-running a batch (fresh checkpoint, same input) overwrites its
    own _batch_id partition instead of appending a second copy."""
    import shutil as _sh
    import tempfile as _tf

    from ecommerce_data_pipeline_spark.streaming.pipeline import (
        foreach_batch_append_idempotent,
    )

    out = str(tmp_path / "warehouse")
    for _ in range(2):  # second run = full replay with a new checkpoint
        ckpt = _tf.mkdtemp(prefix="ckpt_idem_")
        stream = read_file_stream(spark, landing_dir, events_schema)
        q = foreach_batch_append_idempotent(stream, out, ckpt)
        q.awaitTermination(120)
        _sh.rmtree(ckpt, ignore_errors=True)
    landed = spark.read.parquet(out)
    # the sink must hold exactly the landing rows, not 2x after replay
    assert landed.drop("_batch_id").count() == spark.read.schema(
        events_schema
    ).parquet(landing_dir).count()


def test_foreach_batch_cdc_snapshot_matches_batch_compaction(spark, tmp_path):
    """Draining a changelog through the streaming CDC sink one file per
    micro-batch must land the same final snapshot as one-shot
    cdc_compact over the whole log (associativity, operationalized),
    including a delete whose key must vanish."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ecommerce_data_pipeline_spark.operators.scd import cdc_compact
    from ecommerce_data_pipeline_spark.streaming.pipeline import (
        foreach_batch_cdc_snapshot,
        read_file_stream,
    )

    schema = StructType([
        StructField("k", StringType()),
        StructField("seq", LongType()),
        StructField("op", StringType()),
        StructField("v", DoubleType()),
    ])
    landing = str(tmp_path / "changelog")
    chunks = [
        [("k1", 1, "U", 1.0), ("k2", 2, "U", 9.0)],
        [("k1", 3, "U", 2.0), ("k2", 4, "D", 0.0)],
        [("k3", 5, "U", 7.0)],
    ]
    for i, rows in enumerate(chunks):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(landing)

    snap_path = str(tmp_path / "snapshot")
    ckpt = str(tmp_path / "ckpt")
    stream = read_file_stream(
        spark, landing, schema, max_files_per_trigger=1
    )
    q = foreach_batch_cdc_snapshot(stream, snap_path, ckpt, "k", ["seq"])
    q.awaitTermination(120)

    import os

    versions = sorted(
        int(d.split("=")[1]) for d in os.listdir(snap_path) if d.startswith("v=")
    )
    final = spark.read.parquet(f"{snap_path}/v={versions[-1]}")
    expected = cdc_compact(
        spark.createDataFrame(sum(chunks, []), schema), "k", ["seq"]
    )
    got = sorted(tuple(r) for r in final.collect())
    want = sorted(tuple(r) for r in expected.collect())
    assert got == want
    assert {r[0] for r in got} == {"k1", "k3"}


def test_txqueue_batch_source_deterministic_partitioned(spark):
    """Custom Python Data Source (S8 queue consumer): bounded drain is
    partitioned, schema-pinned, and replay-deterministic."""
    from ecommerce_data_pipeline_spark.sources.queue_source import (
        register_queue_source,
    )

    register_queue_source(spark)
    df = (
        spark.read.format("txqueue")
        .option("nMessages", 500)
        .option("numPartitions", 4)
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    rows = df.collect()
    assert len(rows) == 500
    assert len({r["offset"] for r in rows}) == 500
    # non-ISO reference timestamp format parses
    from pyspark.sql import functions as F

    parsed = df.select(
        F.to_timestamp("transaction_date", "yyyy-MM-dd-HH:mm:ss").alias("ts")
    )
    assert parsed.filter(F.col("ts").isNull()).count() == 0
    again = spark.read.format("txqueue").option("nMessages", 500).load().collect()
    assert {tuple(r) for r in rows} == {tuple(r) for r in again}


def test_txqueue_stream_source_micro_batches(spark, tmp_path):
    """Streaming form: offsets advance rowsPerBatch per micro-batch and
    the drained rows equal the batch drain of the same range."""
    from ecommerce_data_pipeline_spark.sources.queue_source import (
        register_queue_source,
    )

    register_queue_source(spark)
    out = str(tmp_path / "q")
    q = (
        spark.readStream.format("txqueue")
        .option("rowsPerBatch", 100)
        .option("maxOffset", 300)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", out + "_ckpt")
        .start()
    )
    # the mock queue 'fills' incrementally (latestOffset advances
    # rowsPerBatch per poll until maxOffset); processAllAvailable drains
    # until offsets stop moving — availableNow would snapshot only the
    # first poll
    q.processAllAvailable()
    q.stop()
    landed = spark.read.parquet(out)
    batch = (
        spark.read.format("txqueue").option("nMessages", 300).load()
    )
    assert landed.count() == 300
    assert {tuple(r) for r in landed.collect()} == {
        tuple(r) for r in batch.collect()
    }


def test_transform_with_state_matches_apply_in_pandas(
    spark, landing_dir, events_schema
):
    """The transformWithStateInPandas processor (RocksDB state store)
    must reach the same final per-user counters as the batch totals —
    same contract as the applyInPandasWithState twin.

    Skipped when google.protobuf is unavailable: Spark's TWS state-server
    protocol imports StateMessage_pb2 in the driver-side Python worker
    (verified root cause: STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE
    from that import), and this container cannot pip install."""
    pytest.importorskip("google.protobuf")
    from ecommerce_data_pipeline_spark.streaming.pipeline import (
        stateful_user_counts_tws,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = read_file_stream(spark, landing_dir, events_schema)
        counts = stateful_user_counts_tws(stream)
        name = _drain(counts, output_mode="update")
        out = spark.table(name).collect()
    finally:
        if prev:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    latest = {}
    for r in out:
        cur = latest.get(r["user_id"])
        if cur is None or r["n_events"] > cur:
            latest[r["user_id"]] = r["n_events"]
    batch = {
        r["user_id"]: r["n"]
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert latest == batch


def test_streaming_incremental_neardup_matches_batch_run(spark):
    """Continuous near-dedup: documents arrive in 3 micro-batches; the
    union of per-batch INTRODUCED pairs must equal the batch-mode
    minhash_lsh_neardup pair relation over the whole corpus (each pair
    emitted exactly once, at its later member's batch)."""
    import os

    from ecommerce_data_pipeline_spark.operators.similarity import (
        minhash_lsh_neardup,
    )
    from ecommerce_data_pipeline_spark.streaming.pipeline import (
        foreach_batch_incremental_neardup,
        read_file_stream,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="incdedup_")
    src = os.path.join(root, "src")
    for i in range(3):  # one file per micro-batch (maxFilesPerTrigger=1)
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    try:
        stream = read_file_stream(
            spark, src, docs.schema, max_files_per_trigger=1
        )
        q = foreach_batch_incremental_neardup(
            stream,
            docs_path=os.path.join(root, "docs"),
            sigs_path=os.path.join(root, "sigs"),
            pairs_path=os.path.join(root, "pairs"),
            checkpoint=os.path.join(root, "ckpt"),
            threshold=0.8,
        )
        q.awaitTermination(180)
        got = {
            (r["id1"], r["id2"])
            for r in spark.read.parquet(os.path.join(root, "pairs")).collect()
        }
        expected = {
            (r["id1"], r["id2"])
            for r in minhash_lsh_neardup(docs, threshold=0.8).collect()
        }
        assert got == expected and len(expected) > 0
        # store completeness: every doc landed exactly once
        n_docs = spark.read.parquet(os.path.join(root, "docs")).count()
        assert n_docs == docs.count()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_streaming_incremental_neardup_replay_is_idempotent(spark):
    """At-least-once replay: a batch whose docs/sigs partitions already
    landed (crash after write, before checkpoint commit) must produce
    the SAME pairs when re-run — the store read prunes to _batch_id <
    current, so the batch never bands against its own landed rows
    (which would double-count every delta shingle in the exact-Jaccard
    verify and inflate scores past the threshold)."""
    import os

    from ecommerce_data_pipeline_spark.streaming.pipeline import (
        foreach_batch_incremental_neardup,
        read_file_stream,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="increplay_")
    src = os.path.join(root, "src")
    docs.coalesce(1).write.parquet(src)
    paths = dict(
        docs_path=os.path.join(root, "docs"),
        sigs_path=os.path.join(root, "sigs"),
        pairs_path=os.path.join(root, "pairs"),
    )
    try:
        def run(ckpt: str) -> set:
            stream = read_file_stream(
                spark, src, docs.schema, max_files_per_trigger=1
            )
            q = foreach_batch_incremental_neardup(
                stream, checkpoint=os.path.join(root, ckpt), **paths
            )
            q.awaitTermination(180)
            return {
                (r["id1"], r["id2"])
                for r in spark.read.parquet(paths["pairs_path"]).collect()
            }

        first = run("ckpt1")
        # fresh checkpoint → Structured Streaming re-delivers the same
        # file as batch 0 while the stores already hold batch 0's
        # partitions: the worst-case replay
        replay = run("ckpt2")
        assert replay == first and len(first) > 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_txqueue_stream_restart_emits_no_duplicates(spark, tmp_path):
    """Checkpoint restarts (fresh reader instance, driver-memory offsets
    lost) must never re-emit committed offsets — including restarts
    AFTER the queue is fully drained, where the fresh reader's first
    latestOffset() is far behind the committed position."""
    import collections
    import os

    from ecommerce_data_pipeline_spark.sources.queue_source import (
        TransactionQueueDataSource,
    )

    spark.dataSource.register(TransactionQueueDataSource)
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

    def run_once():
        q = (
            spark.readStream.format("txqueue")
            .option("rowsPerBatch", 50)
            .option("maxOffset", 150)
            .option("numPartitions", 4)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    for _ in range(5):  # drains at run 3; runs 4-5 are post-saturation
        run_once()
    offsets = [r[0] for r in spark.read.parquet(out).select("offset").collect()]
    counts = collections.Counter(offsets)
    assert sum(1 for v in counts.values() if v > 1) == 0
    assert len(counts) == 150 and min(counts) == 0 and max(counts) == 149


def test_neardup_store_ahead_of_checkpoint_fails_loud(spark):
    """Checkpoint rotated/lost while the stores were kept: the store's
    max _batch_id exceeds the incoming batch id. Proceeding would prune
    away newer corpus state and dynamic-overwrite older partitions —
    the guard must raise instead of silently dropping state. Also pins
    the per-trigger pin hygiene: after the call (success OR the guarded
    failure), no pinned blocks may linger in the session."""
    import os

    import pytest

    from ecommerce_data_pipeline_spark.streaming.pipeline import (
        neardup_store_increment,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="incguard_")
    paths = dict(
        docs_path=os.path.join(root, "docs"),
        sigs_path=os.path.join(root, "sigs"),
        pairs_path=os.path.join(root, "pairs"),
    )
    try:
        # pin-hygiene baseline: start from a clean CacheManager (other
        # tests in the session-scoped fixture may hold harness-owned
        # caches; they lazily re-populate on next use)
        spark.catalog.clearCache()
        # land a legitimate increment at batch 5
        neardup_store_increment(docs, 5, **paths)
        # a batch id BEHIND the store = rotated/lost checkpoint
        with pytest.raises(RuntimeError, match="ahead of the checkpoint"):
            neardup_store_increment(docs.limit(10), 3, **paths)
        # pin hygiene: neither the successful nor the failed call may
        # leave anything pinned behind (the r7 persist+unpersist
        # contract) — the CacheManager check also catches lazy persists
        # that never materialized blocks (the failure path's pin)
        assert (
            spark._jsparkSession.sharedState().cacheManager().isEmpty()
        ), "cached plans leaked past neardup_store_increment"
    finally:
        shutil.rmtree(root, ignore_errors=True)
