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
    balance_by: str | None = None,
) -> None:
    """Write ``df`` as exactly ``n_shards`` size-balanced parquet
    shards — the training-data handoff layout: downstream loaders map
    one worker per shard, so balanced shards ARE the load balance of
    the training job's input pipeline.

    Two balancing modes:

    - ``balance_by=None`` (default): balance by ROW COUNT. Sharding
      key is the md5 of the id — uniform regardless of input skew or
      arrival order, so range partitioning yields near-equal flat
      files even when ids are clustered (sequential ids, hot
      sources). One range shuffle; no driver collect. Deterministic
      modulo Spark's range-boundary sampling.

    - ``balance_by=<size column>`` (e.g. ``"n_toks"``): balance by the
      SUM of that column via round-robin LPT packing
      (:func:`..operators.ranking.pack_shards_lpt` — rank by size
      descending, deal rank r to shard (r-1) mod n): per-shard totals
      are within one maximal item of each other even under heavy
      document-length skew, where count-balanced shards can differ by
      the skew itself. Written hive-partitioned on ``_shard`` (0..n-1)
      with exactly ONE file per shard: rows are hash-repartitioned on
      the shard id first, so every shard's rows land in a single task
      regardless of hash collisions. Fully deterministic (rank
      tie-break on ``id_col``).
    """
    from pyspark.sql import functions as F

    if balance_by is not None:
        from ..operators import dedup as _cache
        from ..operators.ranking import pack_shards_lpt

        # global_rank scans its input three times (boundary fold,
        # count fold, rank pass); feeding it the full ``df`` re-runs
        # an arbitrarily expensive upstream lineage per pass. Persist
        # a NARROW (id, size) projection for the multi-pass packing,
        # then join the tiny assignment back — the wide lineage is
        # computed exactly once, at write time.
        mark = _cache.cache_mark()
        narrow = _cache.persist_tracked(df.select(id_col, balance_by))
        try:
            assignment = pack_shards_lpt(
                narrow, balance_by, id_col,
                n_shards=n_shards, shard_col="_shard",
            ).select(id_col, "_shard")
            (
                df.join(assignment, id_col)
                .repartition(n_shards, F.col("_shard"))
                .write.mode(mode)
                .partitionBy("_shard")
                .parquet(path)
            )
        finally:
            _cache.release_caches_since(mark)
        return
    (
        df.withColumn("_shard_key", F.md5(F.col(id_col).cast("string")))
        .repartitionByRange(n_shards, F.col("_shard_key"))
        .drop("_shard_key")
        .write.mode(mode)
        .parquet(path)
    )
