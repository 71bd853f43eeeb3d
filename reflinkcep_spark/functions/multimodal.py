"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``BINARY`` columns with a
metadata struct; decode / feature-extraction steps are Arrow-batched
``mapInPandas`` stages so payloads stream JVM→Python in columnar
batches (never one row at a time).

Decoder tiers, selected per call with ``decoder=``:

* ``"strict"`` (default) raises ``NotImplementedError`` — the marker
  for "plug your codec here";
* ``"fake"`` produces a deterministic pseudo-output from the payload
  bytes, so the Spark-side plumbing (schema, batch shape,
  partitioning) is fully testable end-to-end without any codec;
* REAL pure-Python decoders that need no external codec library:
  ``"netpbm"`` (binary PPM ``P6`` / PGM ``P5`` images, header parsed
  with comment support, numpy nearest-neighbor resize) for
  :func:`resize_images`, and ``"wav"`` (stdlib ``wave``, 16-bit PCM)
  for :func:`extract_features` (per-window mean-amplitude features)
  and :func:`sample_frames` (raw PCM slices at sample timestamps),
  and ``"avi"`` for :func:`sample_frames` (AVI/RIFF container walk —
  frame timing from the ``avih`` header, each sampled frame's exact
  ``movi`` chunk bytes emitted without invoking any codec);
* ``"pil"`` in :func:`resize_images` uses Pillow when installed (the
  import lives in the worker function; the test skips without it).

Undecodable or NULL payloads yield zero output rather than failing
the Arrow batch — at 100 TB a corrupt blob must mark itself, not
kill the stage.
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
    "wav_roundtrip_stats",
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


def _decode_netpbm(payload: bytes):
    """Binary netpbm → 2-D uint8 grayscale array, or None if the
    payload isn't a parseable ``P6`` (RGB) / ``P5`` (gray) image with
    maxval ≤ 255.  Pure Python + numpy — no codec library."""
    import re

    import numpy as np

    if not payload or payload[:2] not in (b"P5", b"P6"):
        return None
    # Header = magic + 3 ints (width, height, maxval), '#' comments
    # allowed between tokens, ONE whitespace byte after maxval, then
    # the raster.
    m = re.match(
        rb"(P[56])\s+(?:#[^\n]*\n\s*)*(\d+)\s+(?:#[^\n]*\n\s*)*(\d+)"
        rb"\s+(?:#[^\n]*\n\s*)*(\d+)\s",
        payload,
    )
    if m is None:
        return None
    magic, w, h, maxval = m.group(1), int(m.group(2)), int(m.group(3)), int(m.group(4))
    if maxval > 255 or w <= 0 or h <= 0:
        return None
    channels = 3 if magic == b"P6" else 1
    raster = payload[m.end() : m.end() + w * h * channels]
    if len(raster) < w * h * channels:
        return None
    arr = np.frombuffer(raster, dtype=np.uint8).reshape(h, w * channels)
    if channels == 3:
        rgb = arr.reshape(h, w, 3).astype(np.uint16)
        # Integer mean keeps the result deterministic across platforms.
        return ((rgb[:, :, 0] + rgb[:, :, 1] + rgb[:, :, 2]) // 3).astype(np.uint8)
    return arr


def _resize_nearest(gray, width: int, height: int) -> bytes:
    """Nearest-neighbor resample of a 2-D uint8 array to h×w bytes."""
    import numpy as np

    src_h, src_w = gray.shape
    rows = (np.arange(height) * src_h) // height
    cols = (np.arange(width) * src_w) // width
    return gray[np.ix_(rows, cols)].tobytes()


def _decode_wav(payload: bytes):
    """WAV payload → (mono int16 numpy array, frame rate), or None.
    stdlib ``wave`` handles the RIFF container; only 16-bit PCM is
    accepted (the overwhelmingly common case)."""
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(payload or b""), "rb") as wf:
            if wf.getsampwidth() != 2:
                return None
            n = wf.getnframes()
            pcm = np.frombuffer(wf.readframes(n), dtype="<i2")
            ch = wf.getnchannels()
            if ch > 1:
                pcm = pcm.reshape(-1, ch).astype(np.int32).mean(axis=1).astype(np.int16)
            return pcm, wf.getframerate()
    except Exception:
        return None


def _parse_avi(payload: bytes):
    """AVI (RIFF) container → ``(video frame chunks, µs per frame)``,
    or None if the payload isn't a parseable AVI.  Pure Python: walks
    the RIFF chunk tree, reads ``dwMicroSecPerFrame`` from the ``avih``
    main header, and indexes the ``movi`` list's stream-0 video chunks
    (``00dc`` = compressed — JPEG bytes in an MJPEG AVI — and ``00db``
    = uncompressed).  No codec is invoked: the caller gets each
    frame's exact byte slice, which downstream stages decode however
    they like.  Frames are byte slices, so this never copies the
    raster twice."""
    import struct

    if (
        not payload
        or len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"AVI "
    ):
        return None
    us_per_frame = 0
    frames: list[tuple[int, int]] = []

    # Iterative walk with an explicit range stack: a crafted payload of
    # ~1000 nested 12-byte LIST headers (a ~12 KB blob) would blow the
    # recursion limit and fail the whole Spark task instead of honoring
    # the "unparseable payloads emit no rows" contract.
    stack: list[tuple[int, int]] = [(12, len(payload))]
    while stack:
        off, end = stack.pop()
        while off + 8 <= end:
            fourcc = payload[off : off + 4]
            (size,) = struct.unpack("<I", payload[off + 4 : off + 8])
            body = off + 8
            if body + size > end:
                break  # truncated chunk: stop at the damage, keep prior
            if fourcc == b"LIST":
                # resume the remainder of THIS level after the nested
                # list (LIFO order preserves document order: the nested
                # range is pushed last, popped first)
                stack.append((body + size + (size & 1), end))
                stack.append((body + 4, body + size))  # skip the list type
                break
            if fourcc == b"avih" and size >= 4:
                (us_per_frame,) = struct.unpack("<I", payload[body : body + 4])
            elif fourcc[:2] == b"00" and fourcc[2:4] in (b"dc", b"db"):
                frames.append((body, size))
            off = body + size + (size & 1)  # chunks are word-aligned
    if us_per_frame <= 0 or not frames:
        return None
    return frames, us_per_frame


def _fake_decode(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder: features derived from
    the payload digest.  Stable across runs and machines."""
    digest = hashlib.sha256(payload or b"").digest()
    raw = (digest * ((dim * 2) // len(digest) + 1))[: dim * 2]
    return [
        int.from_bytes(raw[2 * i : 2 * i + 2], "big") / 65535.0 for i in range(dim)
    ]


def _wav_features(payload: bytes, dim: int) -> list[float]:
    """Mean |amplitude| per equal-width window of the mono PCM, in
    [0, 1] — ``dim`` deterministic floats; zeros if undecodable."""
    import numpy as np

    dec = _decode_wav(payload)
    if dec is None or len(dec[0]) == 0:
        return [0.0] * dim
    pcm, _rate = dec
    idx = (np.arange(dim + 1) * len(pcm)) // dim
    return [
        float(np.abs(pcm[idx[i]:idx[i + 1]].astype(np.int32)).mean() / 32768.0)
        if idx[i + 1] > idx[i] else 0.0
        for i in range(dim)
    ]


def extract_features(
    df: DataFrame,
    id_col: str = "item_id",
    payload_col: str = "payload",
    dim: int = 16,
    decoder: str = "strict",
) -> DataFrame:
    """Decode payloads into feature vectors via ``mapInPandas``.

    ``decoder="strict"`` raises NotImplementedError (plug PIL/librosa
    here); ``decoder="fake"`` runs the deterministic stub so the
    distributed plumbing is testable; ``decoder="wav"`` REALLY decodes
    16-bit PCM WAV payloads (stdlib ``wave``) into ``dim`` per-window
    mean-amplitude features — zeros for undecodable payloads.
    """
    if decoder not in ("strict", "fake", "wav"):
        raise ValueError(f"unknown decoder {decoder!r}")
    src = binary_metadata(df.select(F.col(id_col).alias("item_id"), payload_col), payload_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "strict":
                raise NotImplementedError(
                    "media decoding requires codec libraries not present in "
                    "this environment; use decoder='fake' for plumbing "
                    "tests, decoder='wav' for real PCM audio, or plug a "
                    "codec here"
                )
            if decoder == "wav":
                feats = [_wav_features(p, dim) for p in pdf[payload_col]]
            else:
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
    testable without codecs; ``decoder="netpbm"`` REALLY decodes
    binary PPM/PGM payloads (pure Python header parse + numpy
    nearest-neighbor resample → grayscale raw bytes, one byte per
    pixel — no codec library needed); ``decoder="pil"`` uses Pillow
    when it is installed (decode → LANCZOS resize → grayscale raw
    bytes).  Undecodable/NULL payloads yield a zero payload rather
    than failing the batch.  Library imports happen inside the worker
    function, so the plan builds fine on driver hosts without them.
    The stage is stateless per row — it pipelines with the scan, no
    shuffle.
    """
    if decoder not in ("strict", "fake", "netpbm", "pil"):
        raise ValueError(f"unknown decoder {decoder!r}")

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
                    "image resize requires a decoder: use decoder='fake' "
                    "for plumbing tests, decoder='netpbm' for real binary "
                    "PPM/PGM payloads (no codec library needed), or "
                    "decoder='pil' when Pillow is installed"
                )
            n = width * height
            if decoder == "pil":
                payloads = [decode(p) for p in pdf[payload_col]]
            elif decoder == "netpbm":
                payloads = []
                for p in pdf[payload_col]:
                    gray = _decode_netpbm(p)
                    payloads.append(
                        _resize_nearest(gray, width, height)
                        if gray is not None else bytes(n)
                    )
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
    ``decoder="wav"`` REALLY decodes 16-bit PCM WAV payloads (stdlib
    ``wave``): duration comes from frame count / sample rate, and each
    emitted frame is the 64-byte raw PCM slice starting at its
    timestamp (zero-padded at the tail); undecodable payloads emit no
    rows.  ``decoder="avi"`` REALLY parses AVI (RIFF) video
    containers — pure-Python chunk walk, no codec: frame timing comes
    from the ``avih`` header's µs-per-frame, and each emitted frame is
    the indexed ``movi`` chunk's exact bytes (JPEG images for MJPEG
    AVIs, raw pixels for ``00db`` uncompressed AVIs) at the sampled
    timestamp; unparseable payloads emit no rows.

    ``max_frames`` is the memory rail: frame expansion multiplies rows,
    and an unbounded explode of a long video inside one Arrow batch is
    how executors die at scale.  Real decoders should also stream
    frames out incrementally per input row, as this stub does.

    ``frame_idx`` is DECODER-DEPENDENT: for ``avi`` it is the SOURCE
    CONTAINER frame index the sample landed on (e.g. 0, 10, 20 when
    sampling a 100 fps container every 100 ms — the value you'd pass a
    seeking decoder), while ``wav`` and ``fake`` have no container
    frame structure and emit the SAMPLE ORDINAL i.  Don't key across
    decoders on it; the decoder-independent sample ordinal is always
    ``ts_ms / every_ms`` (``ts_ms`` is uniform across decoders).
    """
    if decoder not in ("strict", "fake", "wav", "avi"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "strict":
                raise NotImplementedError(
                    "frame sampling requires a decoder: use decoder='fake' "
                    "for plumbing tests, decoder='wav' for real PCM audio, "
                    "decoder='avi' for real AVI/MJPEG video containers, "
                    "or plug ffmpeg/pyav here"
                )
            ids, idxs, stamps, frames = [], [], [], []
            for item_id, p in zip(pdf[id_col], pdf[payload_col]):
                if decoder == "avi":
                    parsed = _parse_avi(p)
                    if parsed is None:
                        continue
                    chunks, uspf = parsed
                    duration_ms = (len(chunks) * uspf) // 1000
                    n = min(max_frames, max(1, duration_ms // every_ms + 1))
                    for i in range(n):
                        fidx = min(
                            len(chunks) - 1, (i * every_ms * 1000) // uspf
                        )
                        off, size = chunks[fidx]
                        ids.append(item_id)
                        idxs.append(fidx)
                        stamps.append(i * every_ms)
                        frames.append(bytes(p[off : off + size]))
                    continue
                if decoder == "wav":
                    dec = _decode_wav(p)
                    if dec is None or dec[1] == 0:
                        continue
                    pcm, rate = dec
                    duration_ms = (len(pcm) * 1000) // rate
                    n = min(max_frames, max(1, duration_ms // every_ms + 1))
                    for i in range(n):
                        start = (i * every_ms * rate) // 1000
                        ids.append(item_id)
                        idxs.append(i)
                        stamps.append(i * every_ms)
                        frames.append(
                            pcm[start : start + 32].tobytes().ljust(64, b"\0")
                        )
                    continue
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


def wav_roundtrip_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched WAV decode with an end-to-end integer contract:
    per row, synthesize deterministic 16-bit PCM from the id
    (``s_i = (id·31 + i·17) mod 8192 − 4096``, rate
    ``8000 + (id mod 4)·4000`` Hz, ``500 + id mod 300`` frames),
    containerize with the stdlib ``wave`` WRITER (a real RIFF
    encoder), decode the bytes back with :func:`_decode_wav` (the real
    reader used by ``extract_features``), and emit integer stats of
    what the DECODER saw — (id, frame_rate, n_frames, peak_abs,
    sum_abs).

    The point: an external oracle can recompute every output from the
    generation FORMULA without touching bytes, so the full
    synthesize → RIFF → parse → stats round trip is value-checked,
    not rows-only — any header-layout, sample-width, channel-fold, or
    endianness regression in the decode path breaks equality.  A
    failed round trip raises rather than emitting zeros (unlike
    ``extract_features``' zeros-for-undecodable contract, this
    operator's inputs are valid by construction).

    Scale shape: ``mapInPandas`` over the id column only — per-row
    CPU-bound codec work, Arrow-batched, embarrassingly parallel,
    ZERO exchanges; exactly the multimodal decode pattern (the codec
    is the cost, never the shuffle).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        import numpy as np

        for pdf in batches:
            rows = []
            for raw_id in pdf[id_col]:
                did = int(raw_id)
                if did < 0:
                    # Python % floors, SQL % keeps the dividend's sign:
                    # the generation formulas only agree for ids >= 0,
                    # so reject rather than silently diverge from any
                    # external recomputation of the contract.
                    raise ValueError(f"ids must be non-negative, got {did}")
                rate = 8000 + (did % 4) * 4000
                n = 500 + did % 300
                idx = np.arange(n, dtype=np.int64)
                samples = ((did * 31 + idx * 17) % 8192 - 4096).astype("<i2")
                buf = io.BytesIO()
                with wave.open(buf, "wb") as wf:
                    wf.setnchannels(1)
                    wf.setsampwidth(2)
                    wf.setframerate(rate)
                    wf.writeframes(samples.tobytes())
                dec = _decode_wav(buf.getvalue())
                if dec is None:
                    raise ValueError(f"WAV round trip failed for id {did}")
                pcm, fr = dec
                a = np.abs(pcm.astype(np.int64))
                rows.append((did, fr, len(pcm), int(a.max()), int(a.sum())))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "frame_rate", "n_frames", "peak_abs", "sum_abs"],
            )

    return df.select(id_col).mapInPandas(
        run,
        f"{id_col} long, frame_rate long, n_frames long, peak_abs long, sum_abs long",
    )


def ppm_roundtrip_stats(
    df: DataFrame, id_col: str = "doc_id", width: int = 4, height: int = 3
) -> DataFrame:
    """Arrow-batched netpbm decode with an end-to-end integer contract
    (the :func:`wav_roundtrip_stats` recipe for the IMAGE path): per
    row, synthesize a deterministic ``P6`` RGB image from the id
    (``w = 8 + id mod 9``, ``h = 6 + id mod 7``, channel ``c`` at
    ``(y, x)`` is ``(id·7 + y·31 + x·13 + 5c) mod 256``), emit real
    PPM bytes (header WITH a ``#`` comment line, so the tolerant
    header grammar is on the tested path), parse them back with
    :func:`_decode_netpbm` (the real parser ``resize_images`` uses,
    including its integer RGB→gray fold), nearest-neighbor resample to
    ``width``×``height`` through :func:`_resize_nearest`, and emit
    integer stats of what the DECODER produced — (id, src_w, src_h,
    px_sum, px_max, px_checksum), where ``px_checksum =
    Σ (k+1)·px_k`` over row-major resampled pixels is POSITION
    sensitive (a row/column-order or index-rounding regression breaks
    it even when the pixel multiset survives).

    An external oracle recomputes every output from the generation
    formula without touching a byte: output pixel ``k`` reads source
    pixel ``sy = (⌊k/width⌋·h) div height``, ``sx = ((k mod
    width)·w) div width``, gray = ``(r + g + b) div 3`` over the three
    channel formulas.  A failed parse raises rather than emitting
    zeros (inputs are valid by construction — same contract as the WAV
    round trip).

    Scale shape: ``mapInPandas`` over the id column only — per-row
    CPU-bound codec work, Arrow-batched, ZERO exchanges.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for raw_id in pdf[id_col]:
                did = int(raw_id)
                if did < 0:
                    # Python % floors, SQL % keeps the dividend's sign:
                    # the formulas only agree for ids >= 0 (the WAV
                    # round trip's rail, same reasoning).
                    raise ValueError(f"ids must be non-negative, got {did}")
                w, h = 8 + did % 9, 6 + did % 7
                y, x = np.mgrid[0:h, 0:w]
                base = did * 7 + y * 31 + x * 13
                rgb = np.stack(
                    [(base + 5 * c) % 256 for c in range(3)], axis=-1
                ).astype(np.uint8)
                payload = (
                    b"P6\n# synthetic %d\n%d %d\n255\n" % (did, w, h)
                    + rgb.tobytes()
                )
                gray = _decode_netpbm(payload)
                if gray is None or gray.shape != (h, w):
                    raise ValueError(f"PPM round trip failed for id {did}")
                px = np.frombuffer(
                    _resize_nearest(gray, width, height), dtype=np.uint8
                ).astype(np.int64)
                ks = np.arange(px.size) + 1
                rows.append(
                    (
                        did,
                        w,
                        h,
                        int(px.sum()),
                        int(px.max()),
                        int((ks * px).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "src_w", "src_h", "px_sum", "px_max", "px_checksum"],
            )

    return df.select(id_col).mapInPandas(
        run,
        f"{id_col} long, src_w long, src_h long, px_sum long, px_max long, "
        "px_checksum long",
    )


def avi_roundtrip_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched AVI container decode with an end-to-end integer
    contract — the VIDEO-container member of the round-trip family
    (:func:`wav_roundtrip_stats` / :func:`ppm_roundtrip_stats`): per
    row, a deterministic AVI is synthesized from the id
    (``3 + id mod 6`` uncompressed ``00db`` frames, frame ``i`` of
    length ``16 + (id + 7i) mod 33`` — ODD lengths included, so RIFF
    word-alignment padding is on the tested path — byte ``j`` of
    frame ``i`` is ``(13·id + 29·i + 17·j) mod 256``, header
    ``dwMicroSecPerFrame = 20000 + (id mod 5)·10000``), written as a
    real RIFF tree (hdrl/avih + movi), parsed back by
    :func:`_parse_avi` (the real container walk ``sample_frames``
    uses), and reduced to integer stats of the PARSED bytes —
    (id, us_per_frame, n_frames, total_bytes, byte_checksum), where
    ``byte_checksum = Σ_i Σ_j (i+1)(j+1)·byte(i,j)`` is position
    sensitive in BOTH frame order and intra-frame offset: a chunk
    mis-slice, a padding-byte leak, or a frame-order regression
    breaks equality.  An external oracle recomputes every output
    from the generation formula without touching a byte.

    A failed parse raises (inputs are valid by construction — the WAV
    round trip's contract), and ids must be non-negative (Python %
    floors, SQL % truncates; same rail as the other round trips).

    Scale shape: ``mapInPandas`` over the id column only — per-row
    CPU-bound container work, Arrow-batched, ZERO exchanges.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        for pdf in batches:
            rows = []
            for raw_id in pdf[id_col]:
                did = int(raw_id)
                if did < 0:
                    raise ValueError(f"ids must be non-negative, got {did}")
                nf = 3 + did % 6
                uspf = 20000 + (did % 5) * 10000
                avih = struct.pack("<I", uspf) + bytes(52)
                hdrl_body = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
                hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body
                movi_body = bytearray(b"movi")
                for i in range(nf):
                    ln = 16 + (did + 7 * i) % 33
                    frame = bytes(
                        (13 * did + 29 * i + 17 * j) % 256 for j in range(ln)
                    )
                    movi_body += b"00db" + struct.pack("<I", ln) + frame
                    if ln & 1:
                        movi_body += b"\x00"  # RIFF word alignment
                movi = b"LIST" + struct.pack("<I", len(movi_body)) + bytes(movi_body)
                body = b"AVI " + hdrl + movi
                payload = b"RIFF" + struct.pack("<I", len(body)) + body

                parsed = _parse_avi(payload)
                if parsed is None:
                    raise ValueError(f"AVI round trip failed for id {did}")
                chunks, got_uspf = parsed
                if len(chunks) != nf:
                    raise ValueError(
                        f"AVI round trip: frame count {len(chunks)} != {nf} "
                        f"for id {did}"
                    )
                import numpy as np

                total = 0
                checksum = 0
                for i, (off, size) in enumerate(chunks):
                    arr = np.frombuffer(
                        payload[off : off + size], dtype=np.uint8
                    ).astype(np.int64)
                    total += arr.size
                    checksum += (i + 1) * int(
                        ((np.arange(arr.size) + 1) * arr).sum()
                    )
                rows.append((did, got_uspf, len(chunks), total, checksum))
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "us_per_frame", "n_frames", "total_bytes",
                    "byte_checksum",
                ],
            )

    return df.select(id_col).mapInPandas(
        run,
        f"{id_col} long, us_per_frame long, n_frames long, total_bytes long, "
        "byte_checksum long",
    )
