"""Cleaning/alignment/quality operator semantics (P1-P9, P12) against
the reference's documented behaviors."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from llm_enhanced_data_pipeline_spark.operators import cleaning, quality


def _one(spark, col, **cols):
    df = spark.createDataFrame([Row(**cols)])
    return df.select(col.alias("v")).collect()[0].v


def test_cleanse_text_chain_matches_reference_order(spark):
    # text_cleaning.py:28-47 — inline math, \cmd{...}, bare \cmd,
    # entities, non-ASCII → space, whitespace collapse.
    raw = r"We show $x^2$ that \textbf{bold} and \alpha decay &amp; café rocks".replace(
        "\\u00e9", "é"
    )
    out = _one(spark, cleaning.cleanse_text(F.col("t")), t=raw)
    assert out == "We show that and decay caf rocks"


def test_cleanse_handles_multiline_and_empty(spark):
    assert _one(spark, cleaning.cleanse_text(F.col("t")), t="  a\n\n b\t c ") == "a b c"
    assert _one(spark, cleaning.cleanse_text(F.col("t")), t="") == ""


def test_clean_string_array_drops_nulls_and_empties(spark):
    out = _one(
        spark,
        cleaning.clean_string_array(F.col("a")),
        a=["  Alice ", None, "", "  ", "Bob"],
    )
    assert out == ["Alice", "Bob"]


def test_normalize_label_array_titlecase_dedup_sorted(spark):
    out = _one(
        spark,
        cleaning.normalize_label_array(F.col("a")),
        a=[" machine learning ", "MACHINE LEARNING", "vision", ""],
    )
    assert out == ["Machine Learning", "Vision"]


def test_bounded_distinct_list_preserves_first_occurrence_order(spark):
    out = _one(
        spark,
        cleaning.bounded_distinct_list(F.col("a"), 3),
        a=["b", "a", "b", "c", "a", "d"],
    )
    assert out == ["b", "a", "c"]


def test_safe_int_rescues_number_in_string(spark):
    assert _one(spark, cleaning.safe_int(F.col("x")), x="12") == 12
    assert _one(spark, cleaning.safe_int(F.col("x")), x="12 citations") == 12
    assert _one(spark, cleaning.safe_int(F.col("x")), x="2025 (preprint)") == 2025
    assert _one(spark, cleaning.safe_int(F.col("x")), x="none") is None


def test_safe_float_rescues(spark):
    assert _one(spark, cleaning.safe_float(F.col("x")), x="8.5/10") == 8.5
    assert _one(spark, cleaning.safe_float(F.col("x")), x=" 0.7 ") == 0.7
    assert _one(spark, cleaning.safe_float(F.col("x")), x="n/a") is None


def test_align_schema_totality(spark):
    # every row gets every field with the documented defaults
    df = spark.createDataFrame([Row(title="t", extra="dropme")])
    out = cleaning.align_schema(
        df,
        string_fields=["title", "abstract"],
        array_fields=["authors"],
        int_fields=["citation_count"],
    )
    assert out.columns == ["title", "abstract", "citation_count", "authors"]
    r = out.collect()[0]
    assert (r.title, r.abstract, r.citation_count, r.authors) == ("t", "", 0, [])


def test_clamp_and_validated_score(spark):
    assert _one(spark, quality.clamp(F.col("x"), 0.0, 10.0), x=15.0) == 10.0
    assert _one(spark, quality.clamp(F.col("x"), 0.0, 10.0), x=-3.0) == 0.0
    assert _one(spark, quality.validated_score(F.col("x")), x="8.5/10") == 8.5
    assert _one(spark, quality.validated_score(F.col("x"), default=0.5), x="bad") == 0.5


def test_quality_gate_first_reason_priority(spark):
    df = spark.createDataFrame(
        [
            Row(i=1, a=1, b=1),  # fails both → counted under reason_a only
            Row(i=2, a=0, b=1),  # fails b
            Row(i=3, a=0, b=0),  # passes
        ]
    )
    passed, reasons = quality.quality_gate(
        df, [("reason_a", F.col("a") == 1), ("reason_b", F.col("b") == 1)]
    )
    assert [r.i for r in passed.collect()] == [3]
    got = {r.reason: r.n for r in reasons.collect()}
    assert got == {"reason_a": 1, "reason_b": 1}


def test_tier_ladder_boundaries(spark):
    for score, want in [(0.86, "Excellent"), (0.85, "Excellent"), (0.84, "High"),
                        (0.70, "Good"), (0.60, "Medium"), (0.50, "Fair"), (0.10, "Low")]:
        assert _one(spark, quality.tier(F.lit(score))) == want, score


def test_truncate_with_ellipsis(spark):
    assert _one(spark, quality.truncate_with_ellipsis(F.col("t"), 5), t="abcdefgh") == "abcde..."
    assert _one(spark, quality.truncate_with_ellipsis(F.col("t"), 5), t="abc") == "abc"
