"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns + typed metadata structs. The
Spark-side machinery — schemas, batch shapes, partition sizing, UDF
signatures — is real and tested; the actual codec calls are stubbed
behind ``DECODERS`` because media libraries are not available in this
environment (clearly marked; a deployment registers real decoders).

Design notes for 100 TB of media:
* media bytes ride in their own table keyed by content hash; feature
  extraction is mapInPandas over (hash, bytes) so the wide binary
  column never joins through a shuffle — features join back by hash.
* maxRecordsPerBatch must be lowered for multi-MB blobs (Arrow batch
  memory = rows x blob size); extract_features takes a batch-rows hint.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("content_sha256", StringType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("content", BinaryType(), True),
        StructField("meta_width", LongType(), True),
        StructField("meta_height", LongType(), True),
        StructField("meta_duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("content_sha256", StringType(), False),
        StructField("media_type", StringType(), False),
        StructField("feature", ArrayType(FloatType()), True),
        StructField("decode_ok", StringType(), False),  # ok|stubbed|error
    ]
)


def _stub_decoder(media_type: str, blob: bytes) -> np.ndarray:
    """STUB: media libs are absent in this container. Deterministic
    fake features derived from the bytes so the plumbing is testable;
    a real deployment replaces DECODERS entries with PIL/librosa/etc.
    (Raise NotImplementedError instead by registering `_raise_decoder`.)
    """
    h = hashlib.sha256(blob or b"").digest()
    return (
        np.frombuffer(h, dtype=np.uint8).astype(np.float32) / 255.0
    )[:16]


def _raise_decoder(media_type: str, blob: bytes) -> np.ndarray:
    raise NotImplementedError(
        f"no {media_type} codec available in this environment"
    )


DECODERS: dict[str, Callable[[str, bytes], np.ndarray]] = {
    "image": _stub_decoder,
    "audio": _stub_decoder,
    "video": _stub_decoder,
}


def extract_features(media: DataFrame) -> DataFrame:
    """(content_sha256, media_type, content) -> feature rows via
    mapInPandas. Real batching/schema; decode behind DECODERS."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sha, mt, blob in zip(
                pdf["content_sha256"].values,
                pdf["media_type"].values,
                pdf["content"].values,
            ):
                dec = DECODERS.get(mt)
                if dec is None:
                    rows.append((sha, mt, None, "error"))
                    continue
                try:
                    feat = dec(mt, bytes(blob) if blob is not None else b"")
                    status = "stubbed" if dec is _stub_decoder else "ok"
                    rows.append((sha, mt, [float(x) for x in feat], status))
                except NotImplementedError:
                    rows.append((sha, mt, None, "stubbed"))
                except Exception:
                    rows.append((sha, mt, None, "error"))
            yield pd.DataFrame(
                rows,
                columns=["content_sha256", "media_type", "feature", "decode_ok"],
            )

    return media.select("content_sha256", "media_type", "content").mapInPandas(
        gen, schema=FEATURE_SCHEMA
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("content_sha256", StringType(), False),
        StructField("out_width", LongType(), False),
        StructField("out_height", LongType(), False),
        StructField("resized", BinaryType(), True),
        StructField("decode_ok", StringType(), False),
    ]
)


def _stub_resize(blob: bytes, w: int, h: int) -> bytes:
    """STUB resize: deterministic byte surrogate of a (w, h) raster —
    real deployments register a PIL/pyvips resize here. Output length
    w*h so batch-memory accounting in tests is realistic."""
    seed = hashlib.sha256((blob or b"") + f"{w}x{h}".encode()).digest()
    reps = (w * h) // len(seed) + 1
    return (seed * reps)[: w * h]


def resize_images(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Image resize over mapInPandas: (hash, bytes) -> (hash, resized
    raster). Plumbing (schema, pruned input, per-batch loop, error
    rows) is real; the raster math is stubbed (no codec libs here)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sha, mt, blob in zip(
                pdf["content_sha256"].values,
                pdf["media_type"].values,
                pdf["content"].values,
            ):
                if mt != "image":
                    rows.append((sha, width, height, None, "skipped"))
                    continue
                try:
                    out = _stub_resize(
                        bytes(blob) if blob is not None else b"", width, height
                    )
                    rows.append((sha, width, height, bytearray(out), "stubbed"))
                except Exception:
                    rows.append((sha, width, height, None, "error"))
            yield pd.DataFrame(
                rows,
                columns=["content_sha256", "out_width", "out_height",
                         "resized", "decode_ok"],
            )

    return media.select("content_sha256", "media_type", "content").mapInPandas(
        gen, schema=RESIZED_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("content_sha256", StringType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame_ts_ms", LongType(), False),
        StructField("frame", BinaryType(), True),
        StructField("decode_ok", StringType(), False),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling over mapInPandas: one output row per
    sampled timestamp (explode happens INSIDE the pandas stage so the
    multi-MB source blob crosses Arrow once, not once per frame). Frame
    decode is stubbed; the fan-out shape, metadata pruning and
    timestamp arithmetic are real."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sha, mt, blob, dur in zip(
                pdf["content_sha256"].values,
                pdf["media_type"].values,
                pdf["content"].values,
                pdf["meta_duration_ms"].values,
            ):
                if mt != "video" or dur is None:
                    continue
                b = bytes(blob) if blob is not None else b""
                for idx, ts in enumerate(range(0, int(dur), every_ms)):
                    frame = hashlib.sha256(b + ts.to_bytes(8, "little")).digest()
                    rows.append((sha, idx, ts, bytearray(frame), "stubbed"))
            yield pd.DataFrame(
                rows,
                columns=["content_sha256", "frame_idx", "frame_ts_ms",
                         "frame", "decode_ok"],
            )

    return media.select(
        "content_sha256", "media_type", "content", "meta_duration_ms"
    ).mapInPandas(gen, schema=FRAME_SCHEMA)


def make_media_table(spark, n: int = 32) -> DataFrame:
    """Deterministic fake media rows for tests (bytes derived from the
    index; no external data)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        blob = hashlib.sha256(f"media-{i}".encode()).digest() * 4
        rows.append(
            (
                hashlib.sha256(blob).hexdigest(),
                kinds[i % 3],
                bytearray(blob),
                64 + i,
                48 + i,
                1000 * (i + 1),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
