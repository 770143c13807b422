"""Multimodal column plumbing: opaque binary media + typed metadata.

The Spark-side contract is real and tested — schemas, Arrow batch
shapes, ``mapInPandas`` pipelines, partition sizing — while the codec
kernels (image/audio decode) are deterministic fakes behind
``DECODERS``, clearly marked: this container ships no media
libraries, so decode produces stable pseudo-features derived from the
bytes. Swap the kernel for a real decoder (PIL/ffmpeg) in production
without touching any Spark plumbing.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "IMAGE_FEATURES_SCHEMA",
    "attach_media",
    "decode_image_features",
    "sample_video_frames",
    "resize_images",
    "audio_window_features",
]

#: canonical multimodal row schema: opaque payload + typed metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("meta", StructType([
            StructField("mime", StringType()),
            StructField("bytes", LongType()),
        ])),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _fake_image_decode(payload: bytes, feat_dim: int = 8):
    """STUB KERNEL — deterministic pseudo-decode.

    Real deployments replace this with PIL/torchvision; it exists so
    the distributed plumbing (batching, schema, shuffle) is testable
    in this container. Raises for empty payloads like a real decoder
    would."""
    if not payload:
        raise NotImplementedError("empty media payload; real decoder required")
    digest = hashlib.sha256(payload).digest()
    width = 1 + digest[0] % 64
    height = 1 + digest[1] % 64
    rng = np.frombuffer(digest, dtype=np.uint8).astype(np.float32)
    feats = (rng[:feat_dim] / 255.0).astype(np.float32)
    return width, height, 3, feats


DECODERS = {"image": _fake_image_decode}


def attach_media(df: DataFrame, payload_col: str, id_col: str, kind: str = "image") -> DataFrame:
    """Wrap a binary column into the canonical media schema.

    ``id_col`` must be a stable source key (e.g. ``doc_id``):
    synthesizing ids with monotonically_increasing_id() is unstable
    across recomputations/retries and partitionings, which breaks
    downstream joins and reproducible results (advisor round-1
    finding)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col(payload_col).alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.col(payload_col)).cast("long").alias("bytes"),
        ).alias("meta"),
    )


def decode_image_features(media: DataFrame, feat_dim: int = 8) -> DataFrame:
    """mapInPandas decode: Arrow-batched, one Python worker pass,
    output schema fixed — the real 100 TB shape for media decode
    (batch size controlled by spark.sql.execution.arrow.maxRecordsPerBatch;
    repartition upstream so a batch of payloads fits executor memory)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, c, feats = DECODERS["image"](bytes(payload), feat_dim)
                rows.append((mid, w, h, c, [float(x) for x in feats]))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "channels", "features"]
            )

    return media.select("media_id", "payload").mapInPandas(
        decode, IMAGE_FEATURES_SCHEMA
    )


def sample_video_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing: emits (media_id, frame_idx, frame)
    rows. The splitter kernel is the same deterministic stub pattern —
    payload chunks stand in for decoded frames."""
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame", BinaryType()),
        ]
    )

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                chunk = max(1, len(raw) // max(1, every_n))
                for i, off in enumerate(range(0, len(raw), chunk)):
                    rows.append((mid, i, raw[off : off + chunk]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return media.select("media_id", "payload").mapInPandas(split, out_schema)


def resize_images(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Resize plumbing: (media_id, payload, meta) -> same schema with
    the payload replaced by a ``width x height x 3`` buffer and the
    meta updated. The RESAMPLING kernel is the deterministic stub
    (bytes tiled/truncated to the target size — swap for PIL's
    ``Image.resize`` in production); the Spark side is the real shape:
    one mapInPandas pass, fixed output schema, output size known
    up-front so executors can size batches (a 64x64x3 output is 12 KiB
    per row regardless of input size — resize EARLY in a pipeline to
    cap downstream shuffle width)."""
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("payload", BinaryType()),
            StructField(
                "meta",
                StructType(
                    [
                        StructField("mime", StringType()),
                        StructField("bytes", LongType()),
                        StructField("width", IntegerType()),
                        StructField("height", IntegerType()),
                    ]
                ),
            ),
        ]
    )
    nbytes = width * height * 3

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                if not raw:
                    raise NotImplementedError(
                        "empty media payload; real decoder required"
                    )
                reps = -(-nbytes // len(raw))  # STUB kernel: tile + cut
                out = (raw * reps)[:nbytes]
                rows.append(
                    (mid, out, ("application/octet-stream", nbytes, width, height))
                )
            yield pd.DataFrame(rows, columns=["media_id", "payload", "meta"])

    return media.select("media_id", "payload").mapInPandas(_resize, out_schema)


def audio_window_features(media: DataFrame, window_bytes: int = 1024) -> DataFrame:
    """Windowed audio features: one row per fixed-size window with
    byte-level mean / RMS / zero-crossing counts. The WINDOWING and
    the statistics are real vectorized numpy over the Arrow batch
    (only the codec step — payload bytes standing in for PCM samples —
    is the stub; swap the ``samples = frombuffer`` line for a real
    decode). Output rows are (media_id, window_idx, n, mean, rms,
    zero_crossings)."""
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("window_idx", IntegerType()),
            StructField("n", IntegerType()),
            StructField("mean", FloatType()),
            StructField("rms", FloatType()),
            StructField("zero_crossings", IntegerType()),
        ]
    )

    def _feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                if not raw:
                    raise NotImplementedError(
                        "empty media payload; real decoder required"
                    )
                # STUB codec: bytes as centered int16-ish samples
                samples = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
                for w in range(-(-len(samples) // window_bytes)):
                    win = samples[w * window_bytes : (w + 1) * window_bytes]
                    signs = np.signbit(win[win != 0.0])
                    zc = int(np.count_nonzero(signs[1:] != signs[:-1]))
                    rows.append(
                        (
                            mid,
                            w,
                            len(win),
                            float(win.mean()),
                            float(np.sqrt(np.mean(win * win))),
                            zc,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "window_idx", "n", "mean", "rms", "zero_crossings"],
            )

    return media.select("media_id", "payload").mapInPandas(_feats, out_schema)
