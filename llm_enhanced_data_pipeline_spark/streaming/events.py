"""Structured Streaming variants of the event pipeline (SURVEY.md §2.9).

The reference is batch-only, so these are engine extensions, not parity
operators: the same hourly rollup and enrichment passes as the batch
queries (queries/events_q.py), expressed as readStream→writeStream with
watermarked event-time windows. The batch/stream pair shares semantics
by construction — Structured Streaming reuses the batch operators where
the API allows.

Scale posture: watermark bounds state; the windowed aggregate shuffles
only (window, event_type) partials; checkpointLocation makes the sink
exactly-once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 10
) -> DataFrame:
    """File-source stream of JSONL event batches (the test/dev source;
    production swaps in Kafka with the same downstream graph)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )


def hourly_rollup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of queries/events_q.events_hourly_rollup:
    tumbling 1-hour event-time windows with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sessionize_stream(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of events_sessionize using session windows
    (native gap-based session_window — no custom state store code)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def run_to_memory_sink(
    stream_df: DataFrame, query_name: str, timeout_s: int = 60, mode: str | None = None
) -> None:
    """Drain all available input into an in-memory table (tests/dev).

    ``mode`` defaults to "complete" (right for the aggregate streams);
    pass "append" for row streams — dedup and stream-stream joins only
    support append output.
    """
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(mode or ("complete" if stream_df.isStreaming else "append"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    q.stop()


def dedup_stream(
    events: DataFrame, key_cols: tuple[str, ...] = ("event_id",), watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exact dedup with watermark-BOUNDED state.

    The streaming twin of operators/dedup.dedup_exact: duplicates
    arriving within the watermark horizon are dropped;
    dropDuplicatesWithinWatermark evicts seen-keys state once the
    watermark passes, so state is O(keys per horizon), not O(all keys
    ever) — the property that keeps an always-on 100 TB/day ingest
    dedup from growing without bound (a plain dropDuplicates on a
    stream never evicts).
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def view_purchase_interval_join_stream(
    events: DataFrame, max_gap_minutes: int = 30, watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream interval self-join: each view matched to the same
    user's purchases at most ``max_gap_minutes`` BEFORE it.

    Both sides carry watermarks and the join condition bounds the
    event-time range, so Spark can size the join state and evict
    expired rows — the streaming twin of the batch bucketized range
    join (operators/joins.range_join_bucketed).
    """
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id"),
            F.col("ts").alias("v_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("v_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("p_ts", watermark)
    )
    cond = (
        (views.user_id == purchases.p_user_id)
        & (F.col("v_ts") >= F.col("p_ts"))
        & (F.col("v_ts") <= F.col("p_ts") + F.expr(f"INTERVAL {max_gap_minutes} MINUTES"))
    )
    return views.join(purchases, cond, "inner").select(
        "user_id", "view_id", "v_ts", "purchase_id", "purchase_value"
    )
