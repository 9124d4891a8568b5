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


def test_svg_stage_report_renders_and_is_proportional(tmp_path):
    """The dependency-free SVG twins of visualize_improvement.py's
    three matplotlib artifacts: valid XML, bar heights proportional to
    values (via data-* attributes), one radar polygon per stage, and
    signed improvement percentages computed first-vs-last."""
    import xml.etree.ElementTree as ET

    from llm_enhanced_data_pipeline_spark.plans import viz

    rows = [
        {"stage": "raw", "num_papers": 1000, "avg_overall_score": 5.0,
         "schema_completeness_%": 60.0},
        {"stage": "cleaned", "num_papers": 800, "avg_overall_score": 6.5,
         "schema_completeness_%": 90.0},
        {"stage": "final", "num_papers": 600, "avg_overall_score": 8.0,
         "schema_completeness_%": 100.0},
    ]
    cols = ["avg_overall_score", "schema_completeness_%"]
    arts = viz.render_stage_report(rows, str(tmp_path), value_cols=cols)
    assert set(arts) == {
        "quality_comparison.svg", "quality_radar.svg", "quality_improvement.svg"
    }

    ns = {"s": "http://www.w3.org/2000/svg"}
    comp = ET.parse(arts["quality_comparison.svg"]).getroot()
    bars = [
        e for e in comp.iter("{http://www.w3.org/2000/svg}rect")
        if e.get("data-metric")
    ]
    assert len(bars) == len(rows) * len(cols)
    # height proportional to data-value within a metric
    for col in cols:
        mbars = [b for b in bars if b.get("data-metric") == col]
        ratios = [
            float(b.get("height")) / float(b.get("data-value")) for b in mbars
        ]
        # px-per-unit constant across bars (up to the 0.1px coordinate
        # rounding the SVG emits)
        assert max(ratios) - min(ratios) < 0.01 * max(ratios), (col, ratios)

    radar = ET.parse(arts["quality_radar.svg"]).getroot()
    polys = [
        e for e in radar.iter("{http://www.w3.org/2000/svg}polygon")
        if e.get("data-group")
    ]
    assert [p.get("data-group") for p in polys] == ["raw", "cleaned", "final"]

    imp = ET.parse(arts["quality_improvement.svg"]).getroot()
    pct = {
        e.get("data-metric"): float(e.get("data-pct"))
        for e in imp.iter("{http://www.w3.org/2000/svg}rect")
        if e.get("data-metric")
    }
    assert abs(pct["avg_overall_score"] - 60.0) < 0.01   # 5.0 -> 8.0
    assert abs(pct["schema_completeness_%"] - 66.67) < 0.01


def test_svg_stage_report_from_real_stage_frame(spark, tmp_path):
    """End-to-end: the Spark stage_comparison_frame collects into the
    renderer — the reference's CSV -> matplotlib path as frame -> SVG."""
    from pyspark.sql import Row

    from llm_enhanced_data_pipeline_spark.plans import reports, viz

    raw = spark.createDataFrame(
        [Row(title="t%d" % i, abstract="a" * (10 + i), overall_score=float(5 + i % 3))
         for i in range(20)]
    )
    final = raw.filter("overall_score >= 6")
    frame = reports.stage_comparison_frame({"raw": raw, "final": final})
    rows = [r.asDict() for r in frame.collect()]
    arts = viz.render_stage_report(
        rows, str(tmp_path), value_cols=["avg_overall_score", "num_papers"]
    )
    import os

    assert all(os.path.getsize(p) > 500 for p in arts.values())
