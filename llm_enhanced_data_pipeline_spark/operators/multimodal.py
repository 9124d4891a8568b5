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
