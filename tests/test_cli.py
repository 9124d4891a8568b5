"""CLI entry point (__main__.py): list/run surfaces."""

from __future__ import annotations

import json

from llm_enhanced_data_pipeline_spark.__main__ import main


def test_cli_list_filters_and_labels_lanes(capsys):
    assert main(["list", "--filter", "bm25"]) == 0
    out = capsys.readouterr().out
    assert "bm25_topk" in out and "[oracle]" in out

    assert main(["list", "--filter", "streaming_embed"]) == 0
    assert "[rows-only]" in capsys.readouterr().out


def test_cli_run_unknown_query_suggests(spark, monkeypatch, capsys):
    import llm_enhanced_data_pipeline_spark.__main__ as cli

    monkeypatch.setattr(
        "llm_enhanced_data_pipeline_spark.session.get_spark",
        lambda *a, **k: spark,
    )
    monkeypatch.setattr(spark, "stop", lambda: None)
    assert main(["run", "bm2"]) == 2
    err = capsys.readouterr().err
    assert "did you mean" in err and "bm25_topk" in err


def test_cli_run_json_rows(spark, monkeypatch, capsys):
    monkeypatch.setattr(
        "llm_enhanced_data_pipeline_spark.session.get_spark",
        lambda *a, **k: spark,
    )
    monkeypatch.setattr(spark, "stop", lambda: None)
    assert main(["run", "q1_pricing_summary", "--json", "--limit", "2"]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert 1 <= len(lines) <= 2
    row = json.loads(lines[0])
    assert "l_returnflag" in row


def test_cli_explain_prints_real_plan_markers(spark, monkeypatch, capsys):
    """--explain is the 100x-audit surface: it must print the FORMATTED
    physical plan with real content, not just exit 0 — pinned on
    tf_embeddings, whose vocab build must show the r8 limit-pushdown
    (TakeOrderedAndProject / WindowGroupLimit under the vocab window)
    and a parquet scan with a pruned ReadSchema."""
    monkeypatch.setattr(
        "llm_enhanced_data_pipeline_spark.session.get_spark",
        lambda *a, **k: spark,
    )
    monkeypatch.setattr(spark, "stop", lambda: None)
    assert main(["run", "tf_embeddings", "--explain"]) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out
    assert "TakeOrderedAndProject" in out or "WindowGroupLimit" in out
    assert "Scan parquet" in out and "ReadSchema" in out
    # and no rows were printed (explain replaces execution)
    assert "embedding" in out  # plan mentions the output column
    assert "only showing top" not in out
