"""Partitioned parquet dataset sink/source (the engine's canonical
at-scale storage layout).

The reference materializes whole JSONL files per stage; the Spark-first
layout is hive-partitioned parquet — predicate pushdown prunes entire
partition directories before any IO, and bucketing (see
tests/test_skew_bucketing.py) co-locates join keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    writer = df.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy(*partition_cols).parquet(path)


def read_dataset(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
