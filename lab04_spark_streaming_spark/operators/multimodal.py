"""Multimodal column pattern: opaque binary payloads + typed metadata.

Media (image/audio/video) live in DataFrames as ``binary`` columns with
a typed ``meta`` struct (schemas.MEDIA_SCHEMA). The engine's contract:

* the binary column is NEVER interpreted by Catalyst — it flows
  column-pruned and untouched unless a decode stage needs it;
* decode / feature-extraction runs in Arrow-batched ``mapInPandas``
  stages: one Python worker per partition, whole-column Arrow transfer
  (never per-row pickling). Partitioning stays whatever the upstream
  scan produced — decode is embarrassingly parallel, so the only tuning
  knob at 100 TB is ``spark.sql.files.maxPartitionBytes`` to keep a
  partition's payload bytes within worker memory.

The actual codec libraries (PIL/ffmpeg/...) are NOT in this container:
``decode_stub`` is a clearly-marked deterministic fake that exercises
the real plumbing (schema, batching, Arrow round-trip); swap
``_fake_decode`` for a real decoder to productionize.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a synthetic media table from ``documents`` (the container
    has no real media): payload = UTF-8 bytes of the text, kind cycles
    image/audio/video, meta carries sizes. Exercises the exact schema
    and plumbing a real ingest would produce."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.length(F.col("text").cast("binary")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder: 4 'features' from the
    byte stream (length, mean, first, last). A real implementation
    raises NotImplementedError without its codec:

        try:
            from PIL import Image  # noqa
        except ImportError:
            raise NotImplementedError("image codec not available")
    """
    if not payload:
        return [0.0, 0.0, 0.0, 0.0]
    return [
        float(len(payload)),
        float(sum(payload)) / len(payload),
        float(payload[0]),
        float(payload[-1]),
    ]


def decode_stub(media: DataFrame) -> DataFrame:
    """Arrow-batched decode stage. ``mapInPandas`` streams record
    batches; each batch decodes vectorized-ish in Python and yields the
    typed result — the canonical shape for any real decoder."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "features": pdf["payload"].map(_fake_decode),
                }
            )

    return media.mapInPandas(decode_batches, DECODED_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_bytes_out", LongType()),
    ]
)


def resize_stub(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Image-resize stage plumbing: Arrow-batched ``mapInPandas`` over
    image rows only (the kind filter happens in Catalyst BEFORE the
    Python boundary — never ship non-image payload bytes to a worker
    that drops them). The deterministic fake emits a width×height
    payload size; a real implementation decodes/resamples with its
    codec and raises NotImplementedError without one (see
    ``_fake_decode``). Output sizes are pure functions of the input →
    the whole Python stage is DuckDB-oracle-checkable."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": [width] * n,
                    "height": [height] * n,
                    # Fake resample: output byte count is exactly w×h
                    # (one channel); real decoders produce w×h×channels.
                    "n_bytes_out": [width * height] * n,
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        resize_batches, RESIZED_SCHEMA
    )


FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_ts_ms", LongType()),
        StructField("n_frames", LongType()),
    ]
)


def frame_sample_stub(media: DataFrame, every_ms: int = 40) -> DataFrame:
    """Video frame-sampling plumbing: the one multimodal stage whose
    OUTPUT CARDINALITY differs from its input (one row per sampled
    frame) — the Arrow batch must be rebuilt, not mapped 1:1. Fake
    duration rule (documented): duration_ms := payload byte count;
    frames at t = 0, every_ms, … < duration. Row expansion happens
    inside the Python worker exactly as a real ffmpeg-backed sampler
    would emit frames; counts are arithmetic on the input → DuckDB-
    oracle-checkable."""

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, totals = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                duration_ms = len(payload)
                n_frames = max(0, (duration_ms + every_ms - 1) // every_ms)
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    totals.append(n_frames)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_ts_ms": pd.Series(tss, dtype="int64"),
                    "n_frames": pd.Series(totals, dtype="int64"),
                }
            )

    return media.filter(F.col("kind") == "video").mapInPandas(
        sample_batches, FRAMES_SCHEMA
    )


PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("phash", LongType()),
    ]
)

_PHASH_BITS = 60  # stays clear of the int64 sign bit


def phash_stub(media: DataFrame) -> DataFrame:
    """Perceptual-hash stage plumbing (the LAION-style image near-dup
    primitive): a {b}-bit signature per payload, computed INSIDE the
    Arrow-batched Python worker exactly where a real pHash (DCT of the
    decoded image) would run. The deterministic fake samples {b}
    evenly-spaced bytes and thresholds each against the floor-mean
    byte — integer-only, so the signature is reproducible in SQL for
    the oracle while the Spark side exercises the real decode-stage
    shape. Swap the byte math for PIL+DCT to productionize; the
    banding/join downstream is codec-agnostic."""

    def phash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                n = len(b)
                if n == 0:
                    hashes.append(0)
                    continue
                m = sum(b) // n
                ph = 0
                for i in range(_PHASH_BITS):
                    p = (i * (n - 1)) // (_PHASH_BITS - 1) if n > 1 else 0
                    if b[p] > m:
                        ph |= 1 << i
                hashes.append(ph)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "phash": pd.Series(hashes, dtype="int64"),
                }
            )

    return media.mapInPandas(phash_batches, PHASH_SCHEMA)


phash_stub.__doc__ = phash_stub.__doc__.format(b=_PHASH_BITS)
