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
