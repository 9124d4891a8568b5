"""P11 parser cascade against the reference's malformed-output
pathologies (FIXTURES.md §8.4; enhance_scoring.py:282-340 fallbacks)."""

from __future__ import annotations

from llm_enhanced_data_pipeline_spark.functions.parsing import parse_llm_json, strip_fences


def test_direct_json():
    assert parse_llm_json('{"novelty": 8, "clarity": 7}') == {"novelty": 8, "clarity": 7}


def test_fenced_json():
    assert parse_llm_json('```json\n{"a": 1}\n```') == {"a": 1}
    assert parse_llm_json("```\n[1, 2]\n```") == [1, 2]


def test_prose_wrapped_object():
    text = 'Sure! Here is the JSON you asked for: {"score": 9, "conf": 0.5} Hope it helps.'
    assert parse_llm_json(text) == {"score": 9, "conf": 0.5}


def test_prose_wrapped_array():
    assert parse_llm_json("The keywords are: [\"a\", \"b\"] as requested") == ["a", "b"]


def test_bare_key_value_lines():
    text = 'novelty: 8\n"clarity": 6.5\ndepth = 7'
    assert parse_llm_json(text) == {"novelty": 8, "clarity": 6.5, "depth": 7}


def test_bullet_list_fallback():
    text = "- first keyword\n* second keyword\n  - third"
    assert parse_llm_json(text) == ["first keyword", "second keyword", "third"]


def test_truncated_json_falls_through_to_kv():
    text = '{"novelty": 8, "clarity": '
    assert parse_llm_json(text) == {"novelty": 8}


def test_unparseable_returns_none():
    assert parse_llm_json("complete nonsense with no structure") is None
    assert parse_llm_json("") is None
    assert parse_llm_json(None) is None


def test_strip_fences_idempotent():
    assert strip_fences("```json\nx\n```") == "x"
    assert strip_fences("x") == "x"
