"""Continuous corpus ingest with cross-batch content dedup.

The batch twin (`operators/dedup.dedup_against_index`, gate query
`dedup_incremental`) dedups one batch against a static snapshot index.
Streaming ingest is the production loop around it: batches arrive
forever, and every accepted document immediately becomes part of the
index the NEXT batch dedups against.

Spark-first shape — the corpus store IS the index IS the checkpoint:

    readStream(docs) → foreachBatch:
        keyed  = batch + content fingerprint (md5, the D3 hash)
        fresh  = store.remaining(keyed)      # anti-join on fp
        first  = within-batch first-wins     # (fp, doc_id) window
        store.append(first)                  # durable accept

One keyed parquet store, keyed by content fingerprint, gives all three
roles at once: accepted-corpus table, dedup index, and idempotence
checkpoint. Because accept = append to the SAME store the anti-join
reads, a crash anywhere leaves no torn state — replaying a batch
re-skips everything it already appended (same two-layer
exactly-once as streaming/enrichment.py: the engine's offset log
bounds re-reads, the keyed store bounds re-accepts).

At 100 TB the fp index is the only thing the anti-join touches —
distinct 16-byte hashes, not corpus text — and partitions by fp, so
each micro-batch costs one equi anti-join against an index scan that
prunes to the batch's hash buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators import dedup
from ..sources.checkpoint import ParquetCheckpoint
from .enrichment import DOC_SCHEMA


def corpus_store(spark: SparkSession, path: str) -> ParquetCheckpoint:
    """The accepted-corpus store, keyed by content fingerprint."""
    return ParquetCheckpoint(spark, path, key="fp")


def make_ingest_batch_fn(store: ParquetCheckpoint):
    """foreachBatch body, exposed for direct replay testing: calling it
    twice with the same batch appends nothing the second time."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        keyed = batch_df.withColumn(
            "fp", dedup.content_hash(F.coalesce(F.col("text"), F.lit("")))
        )
        fresh = store.remaining(keyed)
        first = dedup.dedup_content_hash(fresh, "text", ["doc_id"])
        store.append(first)

    return process


def incremental_ingest_stream(
    spark: SparkSession,
    input_path: str,
    store: ParquetCheckpoint,
    stream_checkpoint_dir: str | None = None,
    max_files_per_trigger: int = 10,
    timeout_s: int = 120,
) -> StreamingQuery:
    """Drain currently-available document files through the dedup ingest
    (availableNow trigger), then stop. Restart with the same
    ``stream_checkpoint_dir`` to resume from recorded offsets."""
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(input_path)
    )
    writer = stream.writeStream.foreachBatch(make_ingest_batch_fn(store)).trigger(
        availableNow=True
    )
    if stream_checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", stream_checkpoint_dir)
    q = writer.start()
    q.awaitTermination(timeout_s)
    q.stop()
    return q
