"""Partition pruning: a filter on the partition column must prune
directories at planning time (PartitionFilters, not data filters)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from llm_enhanced_data_pipeline_spark.sources import dataset
from llm_enhanced_data_pipeline_spark.tables import load_table


def test_partitioned_write_and_pruned_read(spark, sf_dir, tmp_path):
    docs = load_table(spark, "documents", sf_dir)
    out = str(tmp_path / "docs_by_lang")
    dataset.write_partitioned(docs, out, ["lang"])

    # layout: one directory per lang value
    dirs = sorted(d for d in os.listdir(out) if d.startswith("lang="))
    assert len(dirs) == docs.select("lang").distinct().count()

    back = dataset.read_dataset(spark, out).filter(F.col("lang") == "en")
    plan = back._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan
    assert "isnotnull(lang" in plan or "lang#" in plan
    en_expected = docs.filter(F.col("lang") == "en").count()
    assert back.count() == en_expected
