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


def write_sharded(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as exactly ``n_shards`` size-balanced parquet files.

    Sharding key is the md5 of the id — uniform regardless of input
    skew or arrival order, so range partitioning yields near-equal
    shards even when ids are clustered (sequential ids, hot sources).
    Deterministic: the same rows land in the same shard on rerun
    (modulo Spark's range-boundary sampling, which is seeded by the
    data itself).

    This is the training-data handoff layout: downstream loaders map
    one worker per shard, so balanced shards ARE the load balance of
    the training job's input pipeline. One range shuffle; no driver
    collect.
    """
    from pyspark.sql import functions as F

    (
        df.withColumn("_shard_key", F.md5(F.col(id_col).cast("string")))
        .repartitionByRange(n_shards, F.col("_shard_key"))
        .drop("_shard_key")
        .write.mode(mode)
        .parquet(path)
    )
