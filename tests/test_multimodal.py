"""Multimodal binary-column plumbing: Arrow-batched feature extraction
over binary payloads with the deterministic fake decoder."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from llm_enhanced_data_pipeline_spark.operators import multimodal


def test_extract_features_shapes_and_determinism(spark):
    rows = [Row(doc_id=i, payload=bytes([i % 251] * (10 + i))) for i in range(20)]
    rows.append(Row(doc_id=99, payload=None))
    df = spark.createDataFrame(rows)
    out = multimodal.extract_features(df, "doc_id", "payload", dim=8).collect()
    assert len(out) == 21
    by_id = {r.doc_id: r for r in out}
    assert by_id[0].n_bytes == 10
    assert len(by_id[0].feature) == 8
    assert abs(sum(by_id[0].feature) - 1.0) < 1e-4  # L1-normalized histogram
    assert by_id[99].n_bytes == 0
    assert by_id[99].feature == [0.0] * 8


def test_binary_metadata_format_sniff(spark):
    df = spark.createDataFrame(
        [
            Row(i=1, p=bytes.fromhex("FFD8FFE0") + b"rest"),
            Row(i=2, p=bytes.fromhex("89504E47") + b"rest"),
            Row(i=3, p=b"plain bytes"),
        ]
    )
    meta = multimodal.binary_metadata(F.col("p"))
    out = {r.i: r for r in df.select("i", meta["format"].alias("fmt"), meta["n_bytes"].alias("n")).collect()}
    assert out[1].fmt == "jpeg"
    assert out[2].fmt == "png"
    assert out[3].fmt == "unknown"
    assert out[3].n == len(b"plain bytes")


def test_decode_image_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(F.lit(b""))
