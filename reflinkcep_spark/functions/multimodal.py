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
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["binary_metadata", "extract_features", "FEATURE_SCHEMA"]

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
