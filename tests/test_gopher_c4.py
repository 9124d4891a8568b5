"""Gopher rule-set and C4 line-filter semantics on engineered realistic
fixtures (the synthetic documents table has no natural prose structure;
the oracle gates cover engine parity, these cover the heuristics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from llm_enhanced_data_pipeline_spark.operators import text_analysis as ta

GOOD_PROSE = (
    "The quick brown fox jumps over the lazy dog and runs to the river of "
    "dreams with great joy. " * 6
)  # ~108 words, plenty of stopwords, sane word lengths


def _flags(spark, text):
    df = spark.createDataFrame([(text,)], "text STRING")
    flags = ta.gopher_flags(F.col("text"))
    row = df.select(*[v.alias(k) for k, v in flags.items()]).first()
    return row.asDict()


def test_gopher_passes_good_prose(spark):
    assert not any(_flags(spark, GOOD_PROSE).values())


def test_gopher_word_count_bounds(spark):
    assert _flags(spark, "too short")["fail_word_count"]
    assert not _flags(spark, GOOD_PROSE)["fail_word_count"]


def test_gopher_mean_word_length(spark):
    short = " ".join(["a b c d"] * 30)
    assert _flags(spark, short)["fail_mean_word_len"]
    long = " ".join(["incomprehensibilities"] * 60)
    assert _flags(spark, long)["fail_mean_word_len"]


def test_gopher_symbol_ratio(spark):
    hashy = GOOD_PROSE + " " + "# # # # # # # # # # # # # #" * 2
    assert _flags(spark, hashy)["fail_symbol_ratio"]


def test_gopher_bullet_and_ellipsis_lines(spark):
    bullets = "\n".join(f"- {GOOD_PROSE[:40]}" for _ in range(10))
    assert _flags(spark, bullets)["fail_bullet_lines"]
    ells = "\n".join(f"{GOOD_PROSE[:40]}..." for _ in range(10))
    assert _flags(spark, ells)["fail_ellipsis_lines"]
    assert not _flags(spark, GOOD_PROSE)["fail_bullet_lines"]


def test_gopher_alpha_word_fraction(spark):
    numeric = GOOD_PROSE + " " + " ".join(str(i) for i in range(40))
    assert _flags(spark, numeric)["fail_alpha_words"]


def test_gopher_stopword_rule(spark):
    no_stops = " ".join(["lorem", "dolor", "amet", "elit"] * 20)
    assert _flags(spark, no_stops)["fail_stopwords"]
    assert not _flags(spark, GOOD_PROSE)["fail_stopwords"]


# ---------------------------------------------------------------------------


def _c4(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id BIGINT, text STRING")
    return ta.c4_clean(df, "text").collect()


def test_c4_keeps_only_terminal_punctuation_lines(spark):
    text = (
        "This is a proper sentence with enough words here.\n"
        "no terminal punctuation on this line of words\n"
        "Another proper sentence that ends with a question mark?\n"
        "A third proper sentence right here ends with a period."
    )
    rows = _c4(spark, text)
    assert len(rows) == 1
    out = rows[0]
    assert out["n_lines"] == 4 and out["n_kept"] == 3
    assert "no terminal punctuation" not in out["text"]
    assert out["text"].count("\n") == 2  # order-preserving reassembly


def test_c4_line_rules_words_and_javascript(spark):
    text = (
        "First good sentence with plenty of words in it.\n"
        "Too short.\n"
        "Please enable JavaScript to view the comments powered here.\n"
        "Second good sentence with plenty of words in it.\n"
        "Third good sentence with plenty of words in it."
    )
    rows = _c4(spark, text)
    out = rows[0]
    assert out["n_kept"] == 3
    assert "JavaScript" not in out["text"]
    assert "Too short." not in out["text"]


def test_c4_doc_level_drops(spark):
    # fewer than 3 kept lines -> doc dropped entirely
    assert _c4(spark, "Only one good sentence with enough words here.") == []
    # brace and lorem ipsum are page-level kills even with good lines
    good3 = "\n".join(
        f"Good sentence number {i} with plenty of words in it." for i in range(3)
    )
    assert _c4(spark, good3 + " {") == []
    assert _c4(spark, good3 + "\nLorem ipsum dolor sit amet consectetur elit.") == []
    assert len(_c4(spark, good3)) == 1


def test_c4_clean_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "x.")], "doc_id BIGINT, text STRING")
    plan = ta.c4_clean(df, "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
