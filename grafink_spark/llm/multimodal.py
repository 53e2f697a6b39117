"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with a typed metadata
struct; all heavy per-item work (decode, resize, feature-extract,
frame-sample) runs as Arrow-batched ``mapInPandas`` so bytes stream
through Python in columnar batches, never row-at-a-time, and the plan
stays a narrow map (no shuffle).

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this environment,
so the decode kernel is pluggable: the default kernel is a
deterministic fake (parses only our own fake header) and a real one
raises NotImplementedError until a codec library is installed. The
Spark-side contract — schemas, batching, partitioning — is real and
tested; swapping in a real decoder changes one python function.

The reference carries media the same way: ZTF cutout stamps are binary
struct fields (cutoutScience.stampData — SURVEY §1.2) that grafink
flattens and downcasts; we keep them as first-class binary columns
instead.
"""

from __future__ import annotations

import hashlib
import math
import struct
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("format", T.StringType()),  # png | wav | mp4 | fake
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload_md5", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def payload_checksum(payload: bytes) -> str:
    """md5 of the payload's lowercase-hex encoding. Hashing the hex
    string (not the raw bytes) is deliberate: it lets a pure-SQL oracle
    (DuckDB md5 accepts VARCHAR only) rebuild the identical checksum,
    so the media pipeline gets a value-level correctness gate instead of
    a rows-only check."""
    return hashlib.md5(payload.hex().encode()).hexdigest()


def make_fake_image(doc_id: int, width: int, height: int) -> bytes:
    """Deterministic fake 'image': 8-byte header (w,h as int32 LE) +
    pseudo-pixel bytes = md5(str(doc_id)) digest repeated to w*h bytes.
    Stands in for PNG bytes in tests and keeps every downstream step
    exercisable; md5-seeded so an SQL oracle can reconstruct it."""
    header = struct.pack("<ii", width, height)
    seed = hashlib.md5(str(doc_id).encode()).digest()
    body = (seed * ((width * height) // len(seed) + 1))[: width * height]
    return header + body


def fake_decode_kernel(doc_id: int, payload: bytes) -> dict:
    """Default decode kernel: understands make_fake_image's layout."""
    if payload is None or len(payload) < 8:
        return {"width": None, "height": None, "mean_luma": None}
    w, h = struct.unpack("<ii", payload[:8])
    body = payload[8 : 8 + w * h]
    mean = (sum(body) / len(body)) if body else None
    return {"width": w, "height": h, "mean_luma": mean}


def real_decode_kernel(doc_id: int, payload: bytes) -> dict:
    """Swap-in point for a real decoder (PIL etc.) — not available in
    this container."""
    raise NotImplementedError(
        "image codec libraries are not installed in this environment; "
        "use fake_decode_kernel or install PIL and implement here"
    )


def extract_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    kernel: Callable[[int, bytes], dict] = fake_decode_kernel,
    batch_hint: int = 1024,
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads → one row per
    media item (IMAGE_FEATURE_SCHEMA). Arrow moves the bytes in columnar
    batches; per-batch python overhead is amortized."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("_p"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["_p"]):
                payload = bytes(payload) if payload is not None else None
                d = kernel(int(doc_id), payload)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "payload_md5": payload_checksum(payload) if payload else None,
                        "n_bytes": len(payload) if payload is not None else 0,
                        "width": d.get("width"),
                        "height": d.get("height"),
                        "mean_luma": d.get("mean_luma"),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURE_SCHEMA])

    return src.mapInPandas(run, IMAGE_FEATURE_SCHEMA)


def resize_images(
    df: DataFrame,
    target_width: int,
    target_height: int,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """1→1 mapInPandas resize: returns (doc_id, payload) with payloads
    at the target dimensions. The fake kernel nearest-neighbor-samples
    the fake-image body; a real kernel would call PIL — the Spark
    contract (binary in, binary out, narrow map, no shuffle) is what
    this pins down."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("_p"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["_p"]):
                if payload is None or len(payload) < 8:
                    rows.append({"doc_id": int(doc_id), "payload": None})
                    continue
                payload = bytes(payload)
                w, h = struct.unpack("<ii", payload[:8])
                body = payload[8:]
                out = bytearray(struct.pack("<ii", target_width, target_height))
                for y in range(target_height):
                    sy = min(int(y * h / target_height), h - 1) if h else 0
                    for x in range(target_width):
                        sx = min(int(x * w / target_width), w - 1) if w else 0
                        idx = sy * w + sx
                        out.append(body[idx] if idx < len(body) else 0)
                rows.append({"doc_id": int(doc_id), "payload": bytes(out)})
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return src.mapInPandas(run, out_schema)


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def make_fake_audio(doc_id: int, duration_ms: int, sample_rate: int = 8) -> bytes:
    """Deterministic fake 'audio': 12-byte header (duration_ms int64 LE,
    sample_rate int32 LE) + pseudo-sample bytes."""
    header = struct.pack("<qi", duration_ms, sample_rate)
    n = duration_ms * sample_rate // 1000
    seed = hashlib.md5(f"a{doc_id}".encode()).digest()
    body = (seed * (n // len(seed) + 1))[:n]
    return header + body


def fake_audio_kernel(doc_id: int, payload: bytes) -> dict:
    if payload is None or len(payload) < 12:
        return {"duration_ms": None, "rms": None}
    duration_ms, _rate = struct.unpack("<qi", payload[:12])
    body = payload[12:]
    rms = math.sqrt(sum(b * b for b in body) / len(body)) if body else None
    return {"duration_ms": duration_ms, "rms": rms}


def real_audio_kernel(doc_id: int, payload: bytes) -> dict:
    """Swap-in point for torchaudio/soundfile — not in this container."""
    raise NotImplementedError(
        "audio codec libraries are not installed in this environment; "
        "use fake_audio_kernel or install soundfile and implement here"
    )


def extract_audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    kernel: Callable[[int, bytes], dict] = fake_audio_kernel,
) -> DataFrame:
    """mapInPandas audio feature extraction (AUDIO_FEATURE_SCHEMA)."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("_p"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["_p"]):
                payload = bytes(payload) if payload is not None else None
                d = kernel(int(doc_id), payload)
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "n_bytes": len(payload) if payload is not None else 0,
                        "duration_ms": d.get("duration_ms"),
                        "rms": d.get("rms"),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURE_SCHEMA]
            )

    return src.mapInPandas(run, AUDIO_FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_n_bytes: int = 64,
) -> DataFrame:
    """'Frame sampling' plumbing: one output row per sampled frame
    (doc_id, frame_idx, frame_bytes). The fake kernel slices the payload
    every n bytes; a real video kernel would emit decoded frames. Shape
    matters: this is a 1→N mapInPandas, the same contract a real
    ffmpeg-based sampler needs."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_bytes", T.BinaryType()),
        ]
    )
    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("_p"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["_p"]):
                if payload is None:
                    continue
                payload = bytes(payload)
                for idx, off in enumerate(range(0, len(payload), every_n_bytes)):
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "frame_idx": idx,
                            "frame_bytes": payload[off : off + every_n_bytes],
                        }
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_bytes"])

    return src.mapInPandas(run, out_schema)
