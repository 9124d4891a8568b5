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
