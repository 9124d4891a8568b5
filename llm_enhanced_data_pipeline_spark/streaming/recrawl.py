"""Streaming recrawl: link extraction per WARC micro-batch into a
persisted edge store, then warm-start PageRank from the prior fixed
point — the production recrawl cadence (r12 verdict item 5).

The batch lane already has both halves: ``operators/graph.pagerank_int``
warm-starts from a prior ``(node, rank_u)`` frame, and
``streaming/ingest.warc_corpus_stream`` drains crawl archives. This
module joins them:

    readStream(warc parquet) → foreachBatch:
        records   = WARC walk + HTTP split      (Arrow mapInPandas)
        pages     = status-200 text/html rows
        links     = anchor extraction + RFC 3986 resolution
        per-page  = (page_url, dst url, n anchors)   [one hash agg]
        store.append(store.remaining(per-page))      [keyed, replay-safe]

    recrawl cadence (driver-side, between drains):
        edges = host aggregation over the store      [|hosts|²-bounded]
        ranks = pagerank_int(edges, few rounds, init_ranks=prior)
        save as the next crawl's prior

Exactly-once at the LINK-FACT level, CRAWL-VERSIONED (r13 verdict
item 4): the store key is ``md5(crawl_id ':' page_url ':' dst_url)``,
so within one crawl generation a (page, target) fact appends once no
matter how many times the archive file is re-delivered
(stream-checkpoint loss, engine replay), while a later crawl of the
same page writes a NEW generation of its facts. Every crawled page
also records a zero-link sentinel row (``url = ''``, ``n = 0``) so a
page that DROPPED all its links still advances its generation — the
failure mode of the old forever-union store, where a removed link kept
its stale edge in every future re-rank. ``host_edges`` reads only each
page's LATEST generation (one keyed max-window, no join), so removed
links demonstrably leave the graph and the warm ranks.

Warm-start contract (pinned in tests/test_graph.py and re-pinned here
over the streamed composition): the damped iteration contracts by
d = 0.85 per round, so the fixed point is init-independent — a warm
start from last crawl's ranks needs only enough rounds to absorb the
edge DELTA, not to mix from uniform.

100 TB shape: each micro-batch costs the WARC scan (the ingest IS the
scan), one link hash-agg, and one keyed anti-join against an index of
16-byte keys; the re-rank runs entirely on the |hosts|²-bounded edge
frame. Nothing rescans history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions import hashing
from ..operators import graph
from ..sources import warc
from ..sources.checkpoint import ParquetCheckpoint


def link_store(spark: SparkSession, path: str) -> ParquetCheckpoint:
    """The persisted link-fact store: one row per (crawl generation,
    page_url, dst url) observed — plus a zero-link sentinel per
    crawled page — keyed by the md5 of the triple."""
    return ParquetCheckpoint(spark, path, key="link_key")


def make_link_extract_batch_fn(store: ParquetCheckpoint, crawl_id: int = 0):
    """foreachBatch body (exposed for direct replay testing): WARC
    record walk + HTTP gates, anchor extraction from the real page
    HTML, per-(page, target) anchor counting, keyed exactly-once
    append under the given crawl generation. Calling it twice with the
    same batch and crawl_id appends nothing the second time; the same
    page under a HIGHER crawl_id appends a new generation of facts
    (and its sentinel row advances the generation even when the page
    now has zero links)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        recs = warc.read_warc_records(
            batch_df, "doc_id", "payload", parse_http=True
        )
        pages = recs.filter(
            (F.col("http_status") == 200)
            & (F.col("http_content_type") == "text/html")
            & (F.col("target_uri") != "")
        ).select(F.col("target_uri").alias("page_url"), "body_text")
        links = graph.extract_links(pages, "page_url", "body_text", "page_url")
        counted = links.groupBy("page_url", "url").agg(
            F.count(F.lit(1)).cast("bigint").alias("n")
        )
        sentinels = pages.select("page_url").distinct().select(
            "page_url", F.lit("").alias("url"), F.lit(0).cast("bigint").alias("n")
        )
        facts = counted.unionByName(sentinels).select(
            hashing.md5_hex(
                F.concat(
                    F.lit(str(crawl_id)), F.lit(":"),
                    F.col("page_url"), F.lit(":"), F.col("url"),
                )
            ).alias("link_key"),
            F.lit(crawl_id).cast("bigint").alias("crawl_id"),
            "page_url",
            "url",
            "n",
        )
        store.append(store.remaining(facts))

    return process


def recrawl_stream(
    spark: SparkSession,
    input_path: str,
    store: ParquetCheckpoint,
    stream_checkpoint_dir: str | None = None,
    max_files_per_trigger: int = 10,
    timeout_s: int = 120,
    crawl_id: int = 0,
) -> StreamingQuery:
    """availableNow drain of (doc_id, payload) binary WARC parquet
    files through the link-extraction ingest under the given crawl
    generation; restart with the same checkpoint dir to resume from
    recorded offsets."""
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
        make_link_extract_batch_fn(store, crawl_id=crawl_id)
    ).trigger(availableNow=True)
    if stream_checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", stream_checkpoint_dir)
    q = writer.start()
    finished = q.awaitTermination(timeout_s)
    if not finished:
        # A drain that outlives timeout_s must not be silently
        # truncated mid-batch: downstream re-ranks would read a
        # partial edge store with no signal. Stop, then fail loud.
        q.stop()
        raise TimeoutError(
            f"recrawl drain did not finish within {timeout_s}s; "
            "edge store may be partial — raise timeout_s and re-drain"
        )
    q.stop()
    return q


def host_edges(store: ParquetCheckpoint) -> DataFrame:
    """Weighted host→host edge list over each page's LATEST crawl
    generation — the same host/self-loop/empty-host discipline as
    ``operators/graph.host_graph``, with anchor multiplicity carried
    through the stored ``n``. The generation filter is one keyed
    max-window partitioned by page_url (no self-join, one shuffle on
    the page key); a page whose newest generation dropped a link — or
    every link, leaving only its sentinel row — contributes only its
    current facts, so stale edges leave the graph. One hash
    aggregation after the filter; |hosts|²-bounded output."""
    from pyspark.sql import Window

    rows = store.load()
    if rows is None:  # nothing drained yet: empty graph, not a crash
        return store.spark.createDataFrame(
            [], "src string, dst string, weight bigint"
        )
    if "crawl_id" not in rows.columns:  # pre-versioning store: one gen
        rows = rows.withColumn("crawl_id", F.lit(0).cast("bigint"))
    latest = F.max("crawl_id").over(Window.partitionBy("page_url"))
    rows = rows.withColumn("_latest", latest).filter(
        F.col("crawl_id") == F.col("_latest")
    )
    s = graph.url_host(F.col("page_url"))
    t = graph.url_host(F.col("url"))
    return (
        rows.select(s.alias("src"), t.alias("dst"), "n")
        .filter(
            (F.col("src") != F.col("dst"))
            & (F.col("src") != "")
            & (F.col("dst") != "")
        )
        .groupBy("src", "dst")
        .agg(F.sum("n").cast("bigint").alias("weight"))
    )


def load_prior_ranks(spark: SparkSession, rank_path: str) -> DataFrame | None:
    """Last crawl's fixed point, or None before the first re-rank."""
    try:
        return spark.read.parquet(rank_path)
    except Exception:
        return None


def rerank_warm(
    spark: SparkSession,
    store: ParquetCheckpoint,
    rank_path: str,
    n_iter: int = 3,
) -> DataFrame:
    """One recrawl re-rank: PageRank over the CURRENT edge store,
    warm-started from the ranks persisted at ``rank_path`` (cold on
    first run), and persisted back as the next cadence's prior.

    Overwriting the path the prior was loaded from is safe:
    ``pagerank_int`` eagerly checkpoints every iteration (including
    the warm-start frame) through the package's lineage truncation, so
    the returned ranks no longer reference the parquet being
    replaced."""
    ranks = graph.pagerank_int(
        host_edges(store),
        n_iter=n_iter,
        init_ranks=load_prior_ranks(spark, rank_path),
    )
    ranks.write.mode("overwrite").parquet(rank_path)
    return ranks
