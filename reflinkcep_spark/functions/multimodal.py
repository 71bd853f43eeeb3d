"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``BINARY`` columns with a
metadata struct; decode / feature-extraction steps are Arrow-batched
``mapInPandas`` stages so payloads stream JVM→Python in columnar
batches (never one row at a time).

The actual codecs (PIL/librosa/ffmpeg) are NOT available in this
environment, so the decode step is STUBBED two ways:

* ``decoder="strict"`` raises ``NotImplementedError`` — the marker for
  "plug your codec here";
* ``decoder="fake"`` produces a deterministic pseudo-feature vector
  from the payload bytes, so the Spark-side plumbing (schema, batch
  shape, partitioning) is fully testable end-to-end.

Everything around the stub — schemas, batching, metadata extraction —
is real.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "binary_metadata",
    "extract_features",
    "resize_images",
    "sample_frames",
    "FEATURE_SCHEMA",
    "RESIZE_SCHEMA",
    "FRAME_SCHEMA",
]

# Magic-byte sniffing for common containers (pure SQL, no UDF).
_MAGIC = [
    ("89504e47", "image/png"),
    ("ffd8ff", "image/jpeg"),
    ("47494638", "image/gif"),
    ("52494646", "audio/wav"),  # RIFF
    ("494433", "audio/mp3"),  # ID3
    ("1a45dfa3", "video/webm"),
]


def binary_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Attach byte length + sniffed media type from magic bytes."""
    hex_prefix = F.lower(F.hex(F.substring(F.col(payload_col), 1, 4)))
    mtype = F.lit("application/octet-stream")
    for magic, name in reversed(_MAGIC):
        mtype = F.when(hex_prefix.startswith(magic.lower()), F.lit(name)).otherwise(mtype)
    return df.withColumn("byte_len", F.octet_length(F.col(payload_col))).withColumn(
        "media_type", mtype
    )


FEATURE_SCHEMA = StructType(
    [
        StructField("item_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def _fake_decode(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder: features derived from
    the payload digest.  Stable across runs and machines."""
    digest = hashlib.sha256(payload or b"").digest()
    raw = (digest * ((dim * 2) // len(digest) + 1))[: dim * 2]
    return [
        int.from_bytes(raw[2 * i : 2 * i + 2], "big") / 65535.0 for i in range(dim)
    ]


def extract_features(
    df: DataFrame,
    id_col: str = "item_id",
    payload_col: str = "payload",
    dim: int = 16,
    decoder: str = "strict",
) -> DataFrame:
    """Decode payloads into feature vectors via ``mapInPandas``.

    ``decoder="strict"`` raises NotImplementedError (no codecs in this
    environment — swap in PIL/librosa here).  ``decoder="fake"`` runs
    the deterministic stub so the distributed plumbing is testable.
    """
    src = binary_metadata(df.select(F.col(id_col).alias("item_id"), payload_col), payload_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "strict":
                raise NotImplementedError(
                    "media decoding requires codec libraries not present in "
                    "this environment; use decoder='fake' for plumbing tests "
                    "or plug a real decoder here"
                )
            feats = [_fake_decode(p, dim) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["byte_len"],
                    "features": feats,
                }
            )

    return src.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("item_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "item_id",
    payload_col: str = "payload",
    decoder: str = "strict",
) -> DataFrame:
    """Resize image payloads to ``width``×``height`` via ``mapInPandas``.

    One output row per input row: ``(item_id, width, height, payload)``.
    ``decoder="strict"`` raises NotImplementedError (plug a codec here);
    ``decoder="fake"`` emits a deterministic digest-derived payload of
    ``width·height`` bytes so schema/batching/row-alignment are
    testable without codecs; ``decoder="pil"`` uses Pillow when it is
    installed (decode → LANCZOS resize → grayscale raw bytes, one byte
    per pixel; undecodable/NULL payloads yield a zero payload rather
    than failing the batch).  The import happens inside the worker
    function, so the plan builds fine on driver hosts without Pillow.
    The stage is stateless per row — it pipelines with the scan, no
    shuffle.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decoder == "pil":
            from io import BytesIO

            from PIL import Image  # raises on workers without Pillow

            def decode(p: bytes | None) -> bytes:
                try:
                    img = Image.open(BytesIO(p or b""))
                    return img.convert("L").resize(
                        (width, height), Image.LANCZOS
                    ).tobytes()
                except Exception:
                    return bytes(width * height)

        for pdf in batches:
            if decoder == "strict":
                raise NotImplementedError(
                    "image resize requires codec libraries not present in "
                    "this environment; use decoder='fake' for plumbing tests "
                    "or decoder='pil' when Pillow is installed"
                )
            n = width * height
            if decoder == "pil":
                payloads = [decode(p) for p in pdf[payload_col]]
            else:
                payloads = [
                    bytes(
                        (hashlib.sha256(p or b"").digest() * (n // 32 + 1))[:n]
                    )
                    for p in pdf[payload_col]
                ]
            yield pd.DataFrame(
                {
                    "item_id": pdf[id_col] if id_col in pdf else pdf["item_id"],
                    "width": width,
                    "height": height,
                    "payload": payloads,
                }
            )

    src = df.select(F.col(id_col).alias("item_id"), F.col(payload_col))
    return src.mapInPandas(run, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("item_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("ts_ms", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 16,
    id_col: str = "item_id",
    payload_col: str = "payload",
    decoder: str = "strict",
) -> DataFrame:
    """Sample frames from video payloads: one OUTPUT ROW PER FRAME
    (``mapInPandas`` yields more rows than it receives — the UDTF-style
    expansion shape).  ``(item_id, frame_idx, ts_ms, frame)``.

    ``decoder="strict"`` raises NotImplementedError (plug ffmpeg/pyav
    here).  ``decoder="fake"`` treats payload length as duration in ms
    and emits digest-derived 64-byte frames at ``every_ms`` intervals,
    capped at ``max_frames`` — deterministic row counts for tests.

    ``max_frames`` is the memory rail: frame expansion multiplies rows,
    and an unbounded explode of a long video inside one Arrow batch is
    how executors die at scale.  Real decoders should also stream
    frames out incrementally per input row, as this stub does.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "strict":
                raise NotImplementedError(
                    "frame sampling requires codec libraries not present in "
                    "this environment; use decoder='fake' for plumbing tests "
                    "or plug ffmpeg/pyav here"
                )
            ids, idxs, stamps, frames = [], [], [], []
            for item_id, p in zip(pdf[id_col], pdf[payload_col]):
                p = p or b""
                duration_ms = len(p)
                n = min(max_frames, max(1, duration_ms // every_ms + 1))
                digest = hashlib.sha256(p).digest()
                for i in range(n):
                    ids.append(item_id)
                    idxs.append(i)
                    stamps.append(i * every_ms)
                    frames.append(
                        bytes((digest * 2)[:64]) + i.to_bytes(4, "big")
                    )
            yield pd.DataFrame(
                {"item_id": ids, "frame_idx": idxs, "ts_ms": stamps, "frame": frames}
            )

    src = df.select(F.col(id_col).alias("item_id"), F.col(payload_col))
    return src.mapInPandas(run, schema=FRAME_SCHEMA)
