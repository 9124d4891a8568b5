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


def test_write_sharded_balances_file_sizes(spark, sf_dir, tmp_path):
    """write_sharded must produce exactly n_shards parquet files with
    near-equal row counts even though doc_ids are sequential (the
    md5 shard key decorrelates the range partitioning from id order).
    Balance matters because downstream training loaders map one worker
    per shard."""
    import duckdb

    docs = load_table(spark, "documents", sf_dir)
    out = str(tmp_path / "sharded")
    dataset.write_sharded(docs, out, n_shards=8, id_col="doc_id")

    files = [
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")
    ]
    assert len(files) == 8
    con = duckdb.connect()
    counts = [
        con.execute(
            "select count(*) from read_parquet(?)", [f]
        ).fetchone()[0]
        for f in files
    ]
    con.close()
    total = docs.count()
    assert sum(counts) == total  # nothing lost or duplicated
    mean = total / 8
    assert min(counts) > 0.6 * mean and max(counts) < 1.5 * mean, counts
    # round-trip: same rows, schema intact
    back = dataset.read_dataset(spark, out)
    assert back.count() == total
    assert set(back.columns) == set(docs.columns)


def test_write_sharded_balance_by_tokens_lpt_bound(spark, sf_dir, tmp_path):
    """balance_by=<size col> must route through LPT packing: per-shard
    TOKEN totals within the round-robin-LPT bound (max - min <= one
    maximal item), exactly one parquet file per shard directory, and a
    lossless roundtrip. Count-balanced shards can't promise this under
    document-length skew; token-balanced shards are what equalizes the
    actual training-loader work."""
    import duckdb

    n_shards = 8
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint").alias(
            "n_toks"
        ),
        "lang",
    )
    out = str(tmp_path / "sharded_lpt")
    dataset.write_sharded(
        docs, out, n_shards=n_shards, id_col="doc_id", balance_by="n_toks"
    )

    shard_dirs = sorted(
        d for d in os.listdir(out) if d.startswith("_shard=")
    )
    assert len(shard_dirs) == n_shards
    for d in shard_dirs:  # exactly ONE file per shard
        parquets = [
            f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")
        ]
        assert len(parquets) == 1, (d, parquets)

    back = dataset.read_dataset(spark, out)
    total_rows = docs.count()
    assert back.count() == total_rows  # nothing lost or duplicated
    assert set(back.columns) == {"doc_id", "n_toks", "lang", "_shard"}
    assert back.select("doc_id").distinct().count() == total_rows

    con = duckdb.connect()
    totals = dict(
        con.execute(
            "select _shard, sum(n_toks) from read_parquet(?, hive_partitioning=1) "
            "group by _shard",
            [out + "/*/*.parquet"],
        ).fetchall()
    )
    max_item = con.execute(
        "select max(n_toks) from read_parquet(?, hive_partitioning=1)",
        [out + "/*/*.parquet"],
    ).fetchone()[0]
    con.close()
    assert len(totals) == n_shards
    spread = max(totals.values()) - min(totals.values())
    assert spread <= max_item, (totals, max_item)
