"""Golden-artifact shape reproduction: the stage-comparison frame and
compliance JSON must match the reference's published column/key shapes
(data_quality_comparison_3stage.csv, compliance_report.json)."""

from __future__ import annotations

from pyspark.sql import Row

from llm_enhanced_data_pipeline_spark.plans import reports


def _stage_df(spark, n, with_keywords=False):
    rows = []
    for i in range(n):
        rows.append(
            Row(
                source="arxiv",
                paper_id=f"p{i}",
                title=f"title {i}",
                abstract="A" * 100 if i % 2 == 0 else "",
                authors=[f"a{i}"] if i % 3 != 0 else [],
                publish_year=2024,
                fields_of_study=["ML"],
                keywords=["k1", "k2"] if with_keywords else [],
                overall_score=float(5 + i % 3),
            )
        )
    schema = (
        "source string, paper_id string, title string, abstract string, "
        "authors array<string>, publish_year long, fields_of_study array<string>, "
        "keywords array<string>, overall_score double"
    )
    return spark.createDataFrame(rows, schema)


def test_stage_comparison_frame_shape_and_values(spark):
    stages = {
        "Raw (Merged)": _stage_df(spark, 10),
        "Cleaned & Aligned": _stage_df(spark, 8),
        "Enhanced & Filtered": _stage_df(spark, 4, with_keywords=True),
    }
    frame = reports.stage_comparison_frame(stages)
    assert frame.columns == reports.STAGE_FRAME_COLUMNS
    rows = {r.stage: r for r in frame.collect()}
    assert set(rows) == set(stages)
    assert rows["Raw (Merged)"].num_papers == 10
    assert rows["Raw (Merged)"].__getattr__("has_abstract_%") == 50.0
    assert rows["Enhanced & Filtered"].__getattr__("has_keywords_%") == 100.0
    assert rows["Cleaned & Aligned"].__getattr__("has_keywords_%") == 0.0


def test_stage_row_tolerates_missing_columns(spark):
    df = spark.createDataFrame([Row(title="only title", abstract="x" * 10)])
    row = reports.stage_quality_row(df).collect()[0]
    assert row.num_papers == 1
    assert row.__getattr__("has_authors_%") == 0.0
    assert row.avg_overall_score is None


def test_compliance_report_doc_shape():
    doc = reports.compliance_report_doc(
        risk_counts={"low": 16017, "high": 4, "critical": 3},
        issue_counts={"title_too_short": 3},
        total=16024,
        analysis_date="2026-08-13T00:00:00",
        all_urls_arxiv=True,
    )
    # the reference artifact's top-level keys and nesting
    assert set(doc) == {
        "summary",
        "privacy_analysis",
        "quality_analysis",
        "licensing_summary",
        "recommendations",
    }
    assert doc["summary"]["compliance_status"] == "needs_review"
    assert doc["privacy_analysis"]["highest_risk"] == "critical"
    assert abs(doc["privacy_analysis"]["percentages"]["low"] - 99.956) < 0.01
    assert doc["quality_analysis"]["most_common_issue"] == "title_too_short"
    assert doc["licensing_summary"]["all_arxiv"] is True
