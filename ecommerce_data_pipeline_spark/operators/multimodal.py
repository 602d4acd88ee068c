"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (SURVEY.md §2.11 / BASELINE north star "multimodal columns"):
media (image/audio/video) travels as an opaque ``binary`` column next to a
typed metadata struct; decode / feature-extraction / resize / frame-sample
run as Arrow-batched ``mapInPandas`` stages so bytes never round-trip
through per-row Python.

The actual codec step is STUBBED — this container has no image/audio
libraries — behind ``_decode_stub``, which raises ``NotImplementedError``
for real decoding and provides a deterministic fake (byte-level stats) so
the Spark-side plumbing (schema, batching, partition behavior) is real and
testable. Swapping the stub for PIL/ffmpeg is a one-function change.

Scale notes: binary payloads dominate partition size — ``mapInPandas``
keeps Arrow batches bounded via ``spark.sql.execution.arrow.
maxRecordsPerBatch``; repartitioning before decode spreads large media
evenly instead of hot-spotting whole files on one executor.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("checksum", StringType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("byte_mean", DoubleType(), True),
        StructField("byte_histogram", ArrayType(LongType()), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)


def attach_binary_payload(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Build a multimodal table from the documents fixture: the text bytes
    stand in for an encoded media payload (deterministic fake media)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.lit("image/fake").alias("media_type"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("checksum"),
    )


def extract_features(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas``: each Arrow batch arrives as a pandas DataFrame; the
    decode loop is per-batch Python (the unavoidable codec boundary), but
    transfer is columnar and output is a fixed explicit schema.

    IMPORTANT (worker-pickling rule): the batch function below is fully
    self-contained — it closes over nothing from this package, only
    stdlib/pandas — so cloudpickle ships it by value and Python workers
    never need this package on their PYTHONPATH. Every Python-worker
    function in this engine follows the same rule; all other operators
    are pure JVM Column expressions.

    ``real_decode=True`` marks the stubbed codec integration point
    (PIL/ffmpeg are not in this container) and raises on the executor.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def decode_stub(payload) -> dict:
            # STUB for PIL.Image.open / av.open: deterministic byte-level
            # pseudo-features; swap this inner function for a real codec.
            if real_decode:
                raise NotImplementedError(
                    "real media decoding requires PIL/ffmpeg (not in this "
                    "container); swap decode_stub for the codec call"
                )
            if payload is None or len(payload) == 0:
                return {"byte_mean": 0.0, "hist": [0] * 16, "width": 0, "height": 0}
            hist = [0] * 16
            total = 0
            for b in payload:
                hist[b >> 4] += 1
                total += b
            # fake dimensions derived deterministically from content
            return {
                "byte_mean": total / len(payload),
                "hist": hist,
                "width": 16 + (payload[0] % 64),
                "height": 16 + (payload[-1] % 64),
            }

        for pdf in it:
            feats = [decode_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["n_bytes"],
                    "byte_mean": [f["byte_mean"] for f in feats],
                    "byte_histogram": [f["hist"] for f in feats],
                    "width": pd.array([f["width"] for f in feats], dtype="int32"),
                    "height": pd.array([f["height"] for f in feats], dtype="int32"),
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def frame_sample(
    media: DataFrame, n_frames: int = 4, frame_bytes: int = 32
) -> DataFrame:
    """'Video' frame sampling as pure Column ops: slice the payload into
    n evenly-spaced fixed-size binary chunks (array<binary>). The real
    implementation would seek keyframes inside the codec stub."""
    stride = (F.col("n_bytes") / n_frames).cast("long")
    idx = F.sequence(F.lit(0), F.lit(n_frames - 1))
    frames = F.transform(
        idx,
        lambda i: F.substring(
            F.col("payload"), (i * stride + 1).cast("int"), F.lit(frame_bytes)
        ),
    )
    return media.select("media_id", "media_type", frames.alias("frames"))


def extract_features_arrow(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """``mapInArrow`` twin of ``extract_features``: batches arrive as
    ``pyarrow.RecordBatch`` and never materialize a pandas frame — one
    fewer copy per batch, and binary payloads stay in Arrow buffers until
    the decode loop touches them. Same stubbed codec, same output schema,
    bit-identical results (asserted in tests). Prefer this form when the
    per-batch work is bytes-in → fixed-width-out and pandas adds nothing;
    keep mapInPandas where downstream batch logic genuinely wants pandas
    semantics. Self-contained closure (worker-pickling rule)."""

    def batches(it):
        import pyarrow as pa

        def decode_stub(payload):
            if real_decode:
                raise NotImplementedError(
                    "real media decoding requires PIL/ffmpeg (not in this "
                    "container); swap decode_stub for the codec call"
                )
            if payload is None or len(payload) == 0:
                return {"byte_mean": 0.0, "hist": [0] * 16, "width": 0, "height": 0}
            hist = [0] * 16
            total = 0
            for b in payload:
                hist[b >> 4] += 1
                total += b
            return {
                "byte_mean": total / len(payload),
                "hist": hist,
                "width": 16 + (payload[0] % 64),
                "height": 16 + (payload[-1] % 64),
            }

        for batch in it:
            payloads = batch.column("payload").to_pylist()
            feats = [decode_stub(p) for p in payloads]
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("media_id"),
                    batch.column("n_bytes"),
                    pa.array([f["byte_mean"] for f in feats], pa.float64()),
                    pa.array([f["hist"] for f in feats], pa.list_(pa.int64())),
                    pa.array([f["width"] for f in feats], pa.int32()),
                    pa.array([f["height"] for f in feats], pa.int32()),
                ],
                names=[
                    "media_id",
                    "n_bytes",
                    "byte_mean",
                    "byte_histogram",
                    "width",
                    "height",
                ],
            )

    return media.mapInArrow(batches, schema=FEATURE_SCHEMA)
