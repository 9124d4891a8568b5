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


# ---------------------------------------------------------------------------
# Near-dup-aware ingest: the same loop with a SECOND persisted artifact,
# the MinHash band index (operators/dedup.minhash_index), so each batch
# is screened for NEAR duplicates of everything previously accepted —
# not just exact recrawls.
#
# Crash-safety across the TWO appends (no transaction spans them):
# the INDEX is appended first, and the screen ignores index rows
# matching the current batch's own (doc_id, fp) pairs. Either crash
# window then replays cleanly: (a) crash before the index append —
# nothing written, plain replay; (b) crash between the appends — the
# corpus store is unchanged so the fp-anti-join re-admits the batch,
# the self-pair filter stops the half-written index rows from
# rejecting their own documents, decisions replay identically, and
# the only residue is duplicate index ROWS, which the screen's
# (batch id, index id) pair-dedup makes harmless. Dropping the index
# rows of an ACCEPTED doc (the failure the store-first order had)
# can no longer happen.
#
# The exclusion keys on the PAIR, not the bare doc_id: a doc_id
# legitimately reused by a later batch with edited text carries a
# different fp, so its prior version's index rows survive the filter
# and the edit IS screened against them (bare-id exclusion silently
# skipped that screen and was the one hole in the replay story).


def near_dup_index_store(spark: SparkSession, path: str) -> ParquetCheckpoint:
    """The persisted MinHash band index of everything accepted so far."""
    return ParquetCheckpoint(spark, path, key="_band")


def make_near_dup_ingest_batch_fn(
    store: ParquetCheckpoint,
    index_store: ParquetCheckpoint,
    threshold: float = 0.8,
):
    """foreachBatch body: exact-fp dedup -> near-dup screen against the
    band index -> append accepted docs + their index rows. Exposed for
    direct replay testing (idempotent per batch)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        keyed = batch_df.withColumn(
            "fp", dedup.content_hash(F.coalesce(F.col("text"), F.lit("")))
        )
        fresh = store.remaining(keyed)
        first = dedup.dedup_content_hash(fresh, "text", ["doc_id"])
        toked = first.withColumn("toks", dedup.tokens(F.col("text")))
        grouped = dedup.minhash_grouped(toked, "doc_id", "toks", shingle_n=3)
        idx = index_store.load()
        if idx is None:
            accepted_ids = grouped.select("doc_id")
        else:
            # drop index rows matching this batch's own (doc_id, fp)
            # pairs: residue of a torn previous attempt must not reject
            # its own documents. Keying on the pair (not bare doc_id)
            # keeps the PRIOR version's rows when a doc_id is reused
            # with edited text, so the edit is screened against it.
            # Pre-fp index vintages lack the column; for those the
            # exclusion degrades to bare-id (the old contract).
            if "fp" in idx.columns:
                idx = idx.join(
                    first.select("doc_id", "fp"), ["doc_id", "fp"], "left_anti"
                )
            else:
                idx = idx.join(
                    first.select(F.col("doc_id")), "doc_id", "left_anti"
                )
            report = dedup.near_dup_against_index(
                grouped, idx, "doc_id", threshold=threshold
            )
            accepted_ids = report.filter(~F.col("is_dup")).select("doc_id")
        # docs too short to shingle (no grouped row) are accepted as-is:
        # they cannot near-duplicate anything at shingle granularity
        accept = first.join(
            first.select("doc_id")
            .join(grouped.select("doc_id"), "doc_id", "left_anti")
            .unionByName(accepted_ids),
            "doc_id",
            "left_semi",
        )
        # Index rows carry the content fp so a torn replay can be
        # recognized by (doc_id, fp) pair, not bare id (see module
        # note). min(fp) per id is deterministic for the pathological
        # same-id-two-texts batch (minhash_grouped already merges those
        # into one signature row).
        fp_by_id = first.groupBy("doc_id").agg(F.min("fp").alias("fp"))
        to_index = dedup.minhash_index(
            grouped.join(accepted_ids, "doc_id", "left_semi"), "doc_id"
        ).join(fp_by_id, "doc_id")
        # Pin BOTH outputs before the first append: writing to a path
        # invalidates every cached plan that scans it (Spark refreshes
        # and uncaches by path on insert), so a lazy frame would
        # silently recompute against post-append state. _truncate_
        # lineage also returns the checkpoint block ids — df.rdd.
        # unpersist() is a documented no-op for localCheckpoint blocks
        # (see operators/dedup.py), and an unreleased pair per
        # micro-batch leaks executor storage for the stream's lifetime.
        sc = batch_df.sparkSession.sparkContext
        accept, accept_ids_blocks = dedup._truncate_lineage(accept)
        to_index, index_blocks = dedup._truncate_lineage(to_index)
        index_store.append(to_index)  # index first — see module note
        store.append(accept)
        dedup._release_ckpt_blocks(sc, accept_ids_blocks)
        dedup._release_ckpt_blocks(sc, index_blocks)
        dedup.release_caches()  # free the per-batch persisted signatures

    return process


# ---------------------------------------------------------------------------
# Crawl-archive ingest: the streaming twin of corpus_build_v6. Crawl
# dumps land continuously as binary WARC payload columns; each
# micro-batch runs the container walk + HTTP gates + html-strip +
# token floor and appends the surviving page rows to a keyed store.
# Exactly-once at the PAGE level: the store key is
# md5(doc_id ':' clean_text) — re-delivered files (stream-checkpoint
# loss, recrawl of identical content) re-skip, while the same clean
# text under a DIFFERENT doc is its own row (cross-doc dedup is a
# separate, deliberate stage — see the content-dedup ingest above).


def warc_corpus_store(spark: SparkSession, path: str) -> ParquetCheckpoint:
    """Accepted-page store for the WARC ingest, keyed per (doc, text)."""
    return ParquetCheckpoint(spark, path, key="rec_key")


def make_warc_corpus_batch_fn(store: ParquetCheckpoint):
    """foreachBatch body (exposed for direct replay testing): WARC
    1->N record expansion with HTTP split, v6's status/content-type/
    html-strip/token-floor gates, then the keyed exactly-once append.
    Calling it twice with the same batch appends nothing the second
    time."""
    from ..functions import hashing
    from ..operators import cleaning
    from ..sources import warc
    from pyspark.sql import Window

    def process(batch_df: DataFrame, batch_id: int) -> None:
        recs = warc.read_warc_records(
            batch_df, "doc_id", "payload", parse_http=True
        )
        pages = (
            recs.filter(
                (F.col("http_status") == 200)
                & (F.col("http_content_type") == "text/html")
            )
            .withColumn("clean", cleaning.html_strip(F.col("body_text")))
            .withColumn(
                "n_toks", F.size(cleaning.tokens(F.col("clean"))).cast("bigint")
            )
            .filter(F.col("n_toks") >= 3)
            .select(
                "doc_id",
                "n_toks",
                hashing.md5_hex(F.col("clean")).alias("fp"),
                hashing.md5_hex(
                    F.concat(
                        F.col("doc_id").cast("string"), F.lit(":"),
                        F.col("clean"),
                    )
                ).alias("rec_key"),
            )
        )
        fresh = store.remaining(pages)
        # within-batch first-wins on the store key (a replayed file in
        # the same micro-batch must not append twice)
        w = Window.partitionBy("rec_key").orderBy("doc_id", "n_toks")
        first = (
            fresh.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        store.append(first)

    return process


def warc_corpus_stream(
    spark: SparkSession,
    input_path: str,
    store: ParquetCheckpoint,
    stream_checkpoint_dir: str | None = None,
    max_files_per_trigger: int = 10,
    timeout_s: int = 120,
) -> StreamingQuery:
    """availableNow drain of parquet files carrying (doc_id, payload)
    binary WARC columns through the crawl-archive ingest; restart with
    the same checkpoint dir to resume from recorded offsets."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )
    writer = stream.writeStream.foreachBatch(
        make_warc_corpus_batch_fn(store)
    ).trigger(availableNow=True)
    if stream_checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", stream_checkpoint_dir)
    q = writer.start()
    q.awaitTermination(timeout_s)
    q.stop()
    return q


def near_dup_ingest_stream(
    spark: SparkSession,
    input_path: str,
    store: ParquetCheckpoint,
    index_store: ParquetCheckpoint,
    stream_checkpoint_dir: str | None = None,
    threshold: float = 0.8,
    max_files_per_trigger: int = 10,
    timeout_s: int = 120,
) -> StreamingQuery:
    """availableNow drain of document files through the near-dup-aware
    ingest; restart with the same checkpoint dir to resume."""
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(input_path)
    )
    writer = stream.writeStream.foreachBatch(
        make_near_dup_ingest_batch_fn(store, index_store, threshold)
    ).trigger(availableNow=True)
    if stream_checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", stream_checkpoint_dir)
    q = writer.start()
    q.awaitTermination(timeout_s)
    q.stop()
    return q
