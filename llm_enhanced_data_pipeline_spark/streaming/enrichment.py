"""Incremental LLM enrichment as a foreachBatch stream (SURVEY.md
§1.3/§3.2: the enrichment pass is a natural incremental job — the
reference re-runs its enhancement scripts over whatever arrived since
the last checkpoint, enhance_fields_of_study.py:243-269, 344-356).

Spark-first shape: a file-source stream of incoming documents feeds
``foreachBatch``; each micro-batch is anti-joined against the durable
parquet result checkpoint (sources/checkpoint.py, J3) BEFORE the paid
LLM pass, and results append to the same checkpoint:

    readStream(docs) → foreachBatch:
        todo = checkpoint.remaining(batch)      # J3 anti-join
        enriched = enrich_with_llm(todo, ...)   # P19 mapInPandas
        checkpoint.append(enriched)             # durable before commit

Effectively-exactly-once spend: the streaming engine's own checkpoint
(offset log) makes each input file processed at-least-once; the
result-checkpoint anti-join makes the LLM call per id idempotent under
both engine replays (a crash between append and offset commit) and
overlapping re-deliveries. That two-layer design is exactly how a paid
enrichment keeps running on a 100 TB/day ingest: the offset log bounds
re-reads, the keyed result store bounds re-spends.

State posture at scale: no streaming state at all (foreachBatch is
stateless); the dedup lives in the durable keyed store, so the stream
restarts cold in O(1) and the anti-join cost is a broadcast/shuffle
against only the batch's keys.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..enrich.enhance import enrich_with_llm
from ..sources.checkpoint import ParquetCheckpoint

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def read_document_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 10
) -> DataFrame:
    """File-source stream of JSONL document batches (test/dev source;
    production swaps in Kafka/object-store notifications with the same
    downstream graph)."""
    return (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )


def make_enrich_batch_fn(
    checkpoint: ParquetCheckpoint,
    prompt_builder: Callable[[pd.DataFrame], pd.Series],
    client_factory,
    rate_per_sec: float = 10.0,
) -> Callable[[DataFrame, int], None]:
    """The foreachBatch body, exposed for direct replay testing: safe to
    call twice with the same batch — the second call appends nothing."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        todo = checkpoint.remaining(batch_df)
        enriched = enrich_with_llm(
            todo, checkpoint.key, prompt_builder, client_factory, rate_per_sec
        )
        # .append is the only action: the enrichment lineage executes
        # exactly once, straight into the durable store.
        checkpoint.append(enriched)

    return process


def incremental_enrichment_stream(
    spark: SparkSession,
    input_path: str,
    checkpoint: ParquetCheckpoint,
    prompt_builder: Callable[[pd.DataFrame], pd.Series],
    client_factory,
    rate_per_sec: float = 10.0,
    stream_checkpoint_dir: str | None = None,
    timeout_s: int = 120,
) -> StreamingQuery:
    """Drain all currently-available input files through the enrichment
    foreachBatch (availableNow trigger), then stop. Restarting with the
    same ``stream_checkpoint_dir`` resumes from the recorded offsets —
    already-read files are not re-read, and any replayed rows are
    re-skipped by the result-checkpoint anti-join."""
    stream = read_document_stream(spark, input_path)
    writer = stream.writeStream.foreachBatch(
        make_enrich_batch_fn(checkpoint, prompt_builder, client_factory, rate_per_sec)
    ).trigger(availableNow=True)
    if stream_checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", stream_checkpoint_dir)
    q = writer.start()
    q.awaitTermination(timeout_s)
    q.stop()
    return q


def make_embed_batch_fn(
    checkpoint: ParquetCheckpoint,
    embedder_factory: Callable[[], Callable[[list[str]], list[list[float]]]],
    batch_size: int = 32,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body for embed-on-ingest: fingerprint the batch's
    content (md5 of text), keep the first in-batch occurrence per
    fingerprint, anti-join the fp-keyed durable store, run the REAL
    model (embed_with mapInPandas) over novel content only, append
    (fp, doc_id, embedding). Content-keyed exactly-once: a re-ingested
    or replayed document with already-embedded text costs nothing —
    even under a new doc_id. Safe to call twice with the same batch.

    ``checkpoint`` must be keyed on ``fp``."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..enrich.embedding import embed_with

    def process(batch_df: DataFrame, batch_id: int) -> None:
        fp = batch_df.withColumn("fp", F.md5(F.col("text")))
        w = Window.partitionBy("fp").orderBy("doc_id")
        novel = (
            fp.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        todo = checkpoint.remaining(novel)
        emb = embed_with(todo, "doc_id", "text", embedder_factory(), batch_size)
        out = emb.join(todo.select("doc_id", "fp"), "doc_id").select(
            "fp", "doc_id", "embedding"
        )
        checkpoint.append(out)

    return process


def incremental_embedding_stream(
    spark: SparkSession,
    input_path: str,
    checkpoint: ParquetCheckpoint,
    embedder_factory: Callable[[], Callable[[list[str]], list[list[float]]]],
    batch_size: int = 32,
    stream_checkpoint_dir: str | None = None,
    timeout_s: int = 120,
) -> StreamingQuery:
    """Embed-on-ingest: drain all currently-available document files
    through the fp-keyed embedding foreachBatch (availableNow), then
    stop. The same two-layer exactly-once design as the LLM enrichment
    stream — the offset log bounds re-reads, the content-keyed store
    bounds re-embeds — so stop/restart mid-stream neither loses nor
    recomputes embeddings (tested in test_streaming)."""
    stream = read_document_stream(spark, input_path)
    writer = stream.writeStream.foreachBatch(
        make_embed_batch_fn(checkpoint, embedder_factory, batch_size)
    ).trigger(availableNow=True)
    if stream_checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", stream_checkpoint_dir)
    q = writer.start()
    q.awaitTermination(timeout_s)
    q.stop()
    return q
