"""Multimodal-column plumbing (BASELINE.json north star).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata. The Spark-side plumbing — schema, partition sizing, Arrow
batch shape, UDF signatures — is real and tested; the actual decoders
are stubbed (the media libraries are not in this container) behind
clearly-marked deterministic fakes / NotImplementedError.

Scale posture: binary payloads dominate row size, so operators here
use ``mapInPandas`` (Arrow batches, zero-copy into numpy) and never
shuffle payload bytes — feature extraction projects the payload away
before any wide operation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def binary_metadata(payload: Column) -> dict[str, Column]:
    """Cheap JVM-side metadata for a binary column: size + sha256 + a
    magic-byte format sniff (no Python involved)."""
    fmt = (
        F.when(F.hex(F.substring(payload, 1, 2)) == "FFD8", F.lit("jpeg"))
        .when(F.hex(F.substring(payload, 1, 4)) == "89504E47", F.lit("png"))
        .when(F.hex(F.substring(payload, 1, 4)) == "52494646", F.lit("riff"))
        .otherwise(F.lit("unknown"))
    )
    return {
        "n_bytes": F.octet_length(payload),
        "sha256": F.sha2(payload, 256),
        "format": fmt,
    }


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for decode→feature-extract. Real
    deployments replace this with PIL/torchaudio/decord inside the same
    mapInPandas adapter; the Spark-side contract is unchanged."""
    if payload is None:
        return [0.0] * dim
    # byte-histogram folded to `dim` buckets, L1-normalized
    buckets = [0] * dim
    for b in payload:
        buckets[b % dim] += 1
    total = sum(buckets) or 1
    return [round(v / total, 6) for v in buckets]


def extract_features(
    df: DataFrame, id_col: str, payload_col: str, dim: int = 8
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The UDF sees pandas batches (spark.sql.execution.arrow
    maxRecordsPerBatch controls batch sizing for fat rows).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": pdf[payload_col].map(
                        lambda p: 0 if p is None else len(p)
                    ),
                    "feature": pdf[payload_col].map(
                        lambda p: _fake_decode_features(p, dim)
                    ),
                }
            )
            yield out

    return df.select(id_col, payload_col).mapInPandas(run, FEATURE_SCHEMA)


def decode_image(payload: Column) -> Column:  # pragma: no cover - stub
    """Real image decode is not available in this container."""
    raise NotImplementedError(
        "image decode requires PIL/opencv; wire it into extract_features's "
        "mapInPandas adapter — the Spark-side plumbing is already in place"
    )


# ---------------------------------------------------------------------------
# Resize / frame-sample / audio-window plumbing. Same honesty contract
# as extract_features: the byte-level transforms are deterministic
# fakes standing in for PIL/decord/torchaudio, but the Spark-side shape
# — Arrow batches, typed schemas, 1->N row expansion, payload projected
# away before any shuffle — is the real production plumbing.

THUMBNAIL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_src_bytes", T.LongType()),
        T.StructField("thumb", T.BinaryType()),
    ]
)


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for decode+resize: stride-sample the
    payload down to exactly width*height bytes (one grayscale plane).
    Short/empty payloads pad with zeros — output size is always fixed,
    which is the property downstream batching relies on."""
    n = width * height
    if not payload:
        return bytes(n)
    if len(payload) >= n:
        step = len(payload) / n
        return bytes(payload[int(i * step)] for i in range(n))
    return payload + bytes(n - len(payload))


def resize_thumbnails(
    df: DataFrame, id_col: str, payload_col: str, width: int = 16, height: int = 16
) -> DataFrame:
    """Arrow-batched image-resize plumbing: every payload becomes a
    fixed-size thumbnail plane. Output rows are uniform width*height
    bytes, so downstream batch tensors can be stacked without ragged
    handling."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": width,
                    "height": height,
                    "n_src_bytes": pdf[payload_col].map(
                        lambda p: 0 if p is None else len(p)
                    ),
                    "thumb": pdf[payload_col].map(
                        lambda p: _fake_resize(p or b"", width, height)
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, THUMBNAIL_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    frame_bytes: int = 64,
    max_frames: int = 4,
) -> DataFrame:
    """Video frame-sampling plumbing: treat the payload as concatenated
    fixed-size frames and emit up to ``max_frames`` uniformly-strided
    frames per row — the 1->N row expansion real frame samplers
    (decord/ffmpeg) need from the engine. Payloads shorter than one
    frame yield no rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                n_total = len(payload) // frame_bytes
                if n_total == 0:
                    continue
                take = min(n_total, max_frames)
                stride = n_total / take
                for j in range(take):
                    k = int(j * stride)
                    ids.append(int(doc_id))
                    idxs.append(k)
                    frames.append(payload[k * frame_bytes : (k + 1) * frame_bytes])
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int32"),
                 "frame": pd.Series(frames, dtype="object")}
            )

    return df.select(id_col, payload_col).mapInPandas(run, FRAME_SCHEMA)


AUDIO_WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("window_idx", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def audio_energy_windows(
    df: DataFrame, id_col: str, payload_col: str, window_bytes: int = 256
) -> DataFrame:
    """Audio windowing plumbing: treat the payload as unsigned 8-bit
    PCM, chunk it into fixed windows, and compute per-window RMS energy
    (numpy-vectorized per Arrow batch). The trailing partial window is
    kept — silence detection needs it."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes, rmss = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if not payload:
                    continue
                samples = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
                samples = (samples - 128.0) / 128.0
                for k in range(0, len(samples), window_bytes):
                    w = samples[k : k + window_bytes]
                    ids.append(int(doc_id))
                    idxs.append(k // window_bytes)
                    sizes.append(len(w))
                    rmss.append(round(float(np.sqrt(np.mean(w * w))), 6))
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "window_idx": pd.Series(idxs, dtype="int32"),
                 "n_samples": pd.Series(sizes, dtype="int32"),
                 "rms": pd.Series(rmss, dtype="float64")}
            )

    return df.select(id_col, payload_col).mapInPandas(run, AUDIO_WINDOW_SCHEMA)
