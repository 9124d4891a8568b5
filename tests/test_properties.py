"""Property-based tests (hypothesis) for the pure-Python pieces:
parser cascade never crashes and is idempotent-ish, engine-stable
hashing invariants, fake-client determinism."""

from __future__ import annotations

import hashlib
import json

from hypothesis import given, settings
from hypothesis import strategies as st

from llm_enhanced_data_pipeline_spark.enrich.client import DeterministicFakeLLM
from llm_enhanced_data_pipeline_spark.functions.parsing import parse_llm_json
from llm_enhanced_data_pipeline_spark.operators.vector import random_hyperplanes


@given(st.text(max_size=500))
@settings(max_examples=300, deadline=None)
def test_parser_never_raises(text):
    parse_llm_json(text)  # any junk → dict/list/None, never an exception


@given(st.dictionaries(st.from_regex(r"[a-z_][a-z0-9_]{0,10}", fullmatch=True),
                       st.integers(-1000, 1000) | st.floats(-10, 10, allow_nan=False),
                       max_size=8))
@settings(max_examples=200, deadline=None)
def test_parser_roundtrips_valid_json_objects(d):
    assert parse_llm_json(json.dumps(d)) == json.loads(json.dumps(d))


@given(st.dictionaries(st.from_regex(r"[a-z_][a-z0-9_]{0,10}", fullmatch=True),
                       st.integers(-1000, 1000), min_size=1, max_size=5))
@settings(max_examples=100, deadline=None)
def test_parser_recovers_fenced_and_prose_wrapped(d):
    payload = json.dumps(d)
    assert parse_llm_json(f"```json\n{payload}\n```") == d
    assert parse_llm_json(f"Sure, here you go: {payload} — anything else?") == d


@given(st.text(min_size=1, max_size=50))
@settings(max_examples=200, deadline=None)
def test_stable_hash32_matches_spec(s):
    # the Python spec of the SQL/Spark expression pair
    expected = int(hashlib.md5(f"0:{s}".encode()).hexdigest()[:8], 16)
    assert 0 <= expected < 2**32


@given(st.text(min_size=1, max_size=200))
@settings(max_examples=100, deadline=None)
def test_fake_llm_deterministic_and_parseable(prompt):
    c = DeterministicFakeLLM(task="scoring")
    r1, r2 = c.generate(prompt), c.generate(prompt)
    assert r1 == r2
    parsed = parse_llm_json(r1)
    assert isinstance(parsed, dict)
    assert 0 <= parsed["novelty"] <= 10
    assert 0.3 <= parsed["confidence"] <= 0.99


def test_hyperplanes_are_stable_and_centered():
    p1 = random_hyperplanes(4, 16)
    p2 = random_hyperplanes(4, 16)
    assert p1 == p2
    flat = [v for row in p1 for v in row]
    assert all(-0.5 <= v < 0.5 for v in flat)
    assert abs(sum(flat) / len(flat)) < 0.1  # roughly centered


def test_stable_round_engine_parity_on_adversarial_doubles(spark):
    """stable_round (Spark) and stable_round_sql (DuckDB) must agree on
    IDENTICAL input doubles — including half-boundary and negative
    values, where the engines' native round() is known to diverge."""
    import random

    import duckdb

    from llm_enhanced_data_pipeline_spark.functions.rounding import (
        stable_round,
        stable_round_sql,
    )
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    rng = random.Random(61)
    vals = (
        # exact decimal half-boundaries at each tested scale
        [i / 2000.0 for i in range(-30, 30)]
        + [i / 20000.0 for i in range(-30, 30)]
        + [rng.uniform(-1e6, 1e6) for _ in range(200)]
        + [rng.uniform(-1, 1) for _ in range(200)]
    )
    df = spark.createDataFrame([Row(i=i, v=float(v)) for i, v in enumerate(vals)])
    got_spark = {
        r.i: (r.r2, r.r4, r.r6)
        for r in df.select(
            "i",
            stable_round(F.col("v"), 2).alias("r2"),
            stable_round(F.col("v"), 4).alias("r4"),
            stable_round(F.col("v"), 6).alias("r6"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INTEGER, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(map(float, vals))))
    got_duck = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            f"SELECT i, {stable_round_sql('v', 2)}, {stable_round_sql('v', 4)},"
            f" {stable_round_sql('v', 6)} FROM t"
        ).fetchall()
    }
    assert got_spark == got_duck


# --- media codec round-trip properties (pure Python/numpy, no Spark) --

@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 12), st.integers(1, 12), st.sampled_from([1, 3]),
    st.integers(0, 2**32 - 1),
)
def test_pnm_roundtrip_is_identity(h, w, c, seed):
    import numpy as np

    from llm_enhanced_data_pipeline_spark.operators import multimodal as mm

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
    w2, h2, c2, back = mm.parse_ppm(mm.write_ppm(img))
    assert (w2, h2, c2) == (w, h, c)
    assert (back == img).all()


@settings(max_examples=40, deadline=None)
@given(
    st.integers(0, 500), st.sampled_from([1, 2]),
    st.sampled_from([8000, 16000, 44100]), st.integers(0, 2**32 - 1),
)
def test_wav_roundtrip_is_identity(n, channels, rate, seed):
    import numpy as np

    from llm_enhanced_data_pipeline_spark.operators import multimodal as mm

    rng = np.random.default_rng(seed)
    samples = rng.integers(-32768, 32768, (n, channels)).astype("<i2")
    rate2, ch2, back = mm.parse_wav(mm.write_wav(samples, rate))
    assert (rate2, ch2) == (rate, channels)
    assert back.shape == (n, channels) and (back == samples).all()


@settings(max_examples=25, deadline=None)
@given(
    st.integers(0, 6), st.integers(1, 10), st.integers(1, 10),
    st.integers(0, 2**32 - 1),
)
def test_y4m_roundtrip_is_identity(n_frames, h, w, seed):
    import numpy as np

    from llm_enhanced_data_pipeline_spark.operators import multimodal as mm

    rng = np.random.default_rng(seed)
    vid = rng.integers(0, 256, (n_frames, h, w), dtype=np.uint8)
    w2, h2, _, _, cs, back = mm.parse_y4m(mm.write_y4m(vid))
    assert (w2, h2, cs) == (w, h, "mono")
    assert back.shape == (n_frames, h, w) and (back == vid).all()


# --- r10 crawl/codec parsers -------------------------------------------

_HDR_NAME = st.from_regex(r"[A-Za-z][A-Za-z0-9-]{0,15}", fullmatch=True).filter(
    lambda n: n.lower() != "content-length"
)
_HDR_VALUE = st.text(
    alphabet=st.characters(blacklist_characters="\r\n", min_codepoint=32,
                           max_codepoint=126),
    max_size=30,
)


@given(
    st.lists(
        st.tuples(st.dictionaries(_HDR_NAME, _HDR_VALUE, max_size=4),
                  st.binary(max_size=200)),
        min_size=1, max_size=4,
    ),
    st.booleans(),
)
@settings(max_examples=80, deadline=None)
def test_warc_roundtrip_property(recs, gz):
    """write_warc -> parse_warc_records roundtrips arbitrary sane
    headers and ARBITRARY binary content (incl. 0xFF / CRLF bytes in
    the payload), gzip-member layout or plain, with the mandatory
    fields auto-filled."""
    from llm_enhanced_data_pipeline_spark.sources import warc

    # parsed header names are lower-cased: collapse case-colliding
    # names up front so the roundtrip comparison is well-defined
    recs = [({k.lower(): v for k, v in h.items()}, c) for h, c in recs]
    records = [{"headers": h, "content": c} for h, c in recs]
    back = warc.parse_warc_records(warc.write_warc(records, gzip_members=gz))
    assert len(back) == len(records)
    for rec, (headers, content) in zip(back, recs):
        assert rec["content"] == content
        for name, value in headers.items():
            assert rec["headers"][name.lower()] == value.strip()
        for mandatory in ("warc-type", "warc-date", "warc-record-id"):
            assert mandatory in rec["headers"]


@given(
    st.dictionaries(_HDR_NAME, _HDR_VALUE, max_size=4),
    st.binary(max_size=100),
    st.integers(100, 599),
    st.booleans(),
)
@settings(max_examples=80, deadline=None)
def test_split_http_response_property(headers, body, status, crlf):
    """The envelope split recovers status/headers/body for both CRLF
    and bare-LF header termination."""
    from llm_enhanced_data_pipeline_spark.sources import warc

    headers = {k.lower(): v for k, v in headers.items()}  # see WARC note
    nl = "\r\n" if crlf else "\n"
    head = f"HTTP/1.1 {status} X" + "".join(
        f"{nl}{k}: {v}" for k, v in headers.items()
    )
    blob = head.encode() + (nl + nl).encode() + body
    got_status, got_headers, got_body = warc.split_http_response(blob)
    assert got_status == status
    assert got_body == body
    for k, v in headers.items():
        assert got_headers[k.lower()] == v.strip()


@given(
    st.integers(1, 3),             # frames
    st.integers(1, 3),             # block cols
    st.integers(1, 2),             # block rows
    st.integers(0, 2 ** 31 - 1),   # seed for block constants
)
@settings(max_examples=25, deadline=None)
def test_avi_mjpeg_lattice_roundtrip_property(n_frames, bw, bh, seed):
    """Any DC-only-lattice MJPEG AVI (block-constant grayscale frames,
    flat q=8) roundtrips BIT-exactly through write_avi_mjpeg ->
    parse_avi_mjpeg, for arbitrary frame counts and block grids."""
    import numpy as np

    from llm_enhanced_data_pipeline_spark.operators import multimodal

    flat8 = [8] * 64
    w, h = bw * 8, bh * 8
    frames = []
    for f in range(n_frames):
        y = np.zeros((h, w), dtype=np.uint8)
        for b in range(bw * bh):
            by, bx = divmod(b, bw)
            y[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = (
                seed + f * 31 + b * 53
            ) % 256
        frames.append(y)
    avi = multimodal.write_avi_mjpeg(
        [multimodal.write_jpeg(fr, q_luma=flat8) for fr in frames], w, h
    )
    pw, ph, _, _, decoded = multimodal.parse_avi_mjpeg(avi)
    assert (pw, ph, len(decoded)) == (w, h, n_frames)
    for fr, dec in zip(frames, decoded):
        assert np.array_equal(dec[:, :, 0], fr)


@given(st.text(max_size=400))
@settings(max_examples=150, deadline=None)
def test_parse_robots_full_never_raises_on_text(text):
    """Any text parses (quarantine is only for None): outputs are
    well-typed, rules/delays carry lowercased UA tokens."""
    from llm_enhanced_data_pipeline_spark.operators import web

    parsed = web.parse_robots_full(text)
    for ua, allow, pattern in parsed["rules"]:
        assert ua == ua.lower() and isinstance(allow, bool) and pattern
    for ua, seconds in parsed["delays"]:
        assert ua == ua.lower() and isinstance(seconds, float)


@given(st.binary(max_size=300), st.sampled_from(
    [b"", b"RIFF", b"\xff\xd8", b"GIF89a", b"\x89PNG\r\n\x1a\n", b"P6\n",
     b"YUV4MPEG2 ", b"WARC/1.0\r\n", b"RIFF\x20\x00\x00\x00AVI "]
))
@settings(max_examples=200, deadline=None)
def test_media_parsers_quarantine_never_crash(tail, magic):
    """The quarantine contract under fuzz: random bytes — including
    ones wearing each format's magic prefix — either decode or raise
    ValueError. Never any other exception, never a hang."""
    from llm_enhanced_data_pipeline_spark.operators import multimodal
    from llm_enhanced_data_pipeline_spark.sources import warc

    payload = magic + tail
    for parse in (multimodal.parse_image, multimodal.parse_wav,
                  multimodal.parse_y4m, multimodal.parse_avi_mjpeg,
                  warc.parse_warc_records):
        try:
            parse(payload)
        except ValueError:
            pass
