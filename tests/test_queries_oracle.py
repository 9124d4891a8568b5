"""The big gate: every registered query with an oracle must match DuckDB
on sf0.01 — the same check the driver runs."""

from __future__ import annotations

import pytest

from llm_enhanced_data_pipeline_spark.queries import REGISTRY

from .oracle_harness import compare, duck_connection

SPECS = sorted(REGISTRY.values(), key=lambda s: s.name)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("spec", [s for s in SPECS if s.oracle], ids=lambda s: s.name)
def test_query_matches_oracle(spec, spark, sf_dir, duck):
    df = spec.fn(spark, sf_dir)
    ok, msg = compare(df, duck, spec.oracle)
    assert ok, f"{spec.name}: {msg}"


@pytest.mark.parametrize("spec", [s for s in SPECS if s.oracle is None], ids=lambda s: s.name)
def test_rows_only_queries_run(spec, spark, sf_dir):
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
