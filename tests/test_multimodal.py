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


def test_resize_thumbnails_fixed_size(spark):
    rows = [
        Row(doc_id=1, payload=bytes(range(256)) * 4),  # bigger than target
        Row(doc_id=2, payload=b"tiny"),                # smaller -> zero-padded
        Row(doc_id=3, payload=None),                   # null -> all zeros
    ]
    out = {
        r.doc_id: r
        for r in multimodal.resize_thumbnails(
            spark.createDataFrame(rows), "doc_id", "payload", width=8, height=4
        ).collect()
    }
    assert all(len(r.thumb) == 32 and r.width == 8 and r.height == 4 for r in out.values())
    assert out[1].n_src_bytes == 1024
    assert out[2].thumb[:4] == b"tiny" and out[2].thumb[4:] == bytes(28)
    assert out[3].thumb == bytes(32)
    # deterministic: same payload -> same thumb
    again = {
        r.doc_id: r.thumb
        for r in multimodal.resize_thumbnails(
            spark.createDataFrame(rows), "doc_id", "payload", width=8, height=4
        ).collect()
    }
    assert again[1] == out[1].thumb


def test_sample_frames_expansion_and_stride(spark):
    rows = [
        Row(doc_id=1, payload=bytes(100)),        # 10 frames of 10 -> 4 sampled
        Row(doc_id=2, payload=bytes(25)),         # 2 full frames -> both
        Row(doc_id=3, payload=bytes(5)),          # < 1 frame -> no rows
        Row(doc_id=4, payload=None),              # null -> no rows
    ]
    out = multimodal.sample_frames(
        spark.createDataFrame(rows), "doc_id", "payload", frame_bytes=10, max_frames=4
    ).collect()
    by_id: dict[int, list] = {}
    for r in out:
        by_id.setdefault(r.doc_id, []).append(r)
    assert len(by_id[1]) == 4
    assert [r.frame_idx for r in sorted(by_id[1], key=lambda r: r.frame_idx)] == [0, 2, 5, 7]
    assert all(len(r.frame) == 10 for r in by_id[1])
    assert len(by_id[2]) == 2
    assert 3 not in by_id and 4 not in by_id


def test_audio_energy_windows_rms(spark):
    silence = bytes([128] * 64)           # centered PCM -> rms 0
    loud = bytes([0, 255] * 32)           # near full-scale square wave
    rows = [Row(doc_id=1, payload=silence + loud), Row(doc_id=2, payload=b"")]
    out = multimodal.audio_energy_windows(
        spark.createDataFrame(rows), "doc_id", "payload", window_bytes=64
    ).collect()
    by_key = {(r.doc_id, r.window_idx): r for r in out}
    assert by_key[(1, 0)].rms == 0.0
    assert by_key[(1, 1)].rms > 0.99
    assert by_key[(1, 0)].n_samples == 64
    assert (2, 0) not in by_key  # empty payload yields no windows
