"""Event-stream queries (batch forms; streaming twins live in
llm_enhanced_data_pipeline_spark/streaming/).

load_table normalizes events.ts to an epoch-nano long regardless of the
parquet's physical timestamp encoding (nanos-long legacy vintage or
timestamp[us]); DuckDB reads the native timestamps — so time math
crosses the oracle boundary as epoch integers only (epoch_ns on the
DuckDB side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import rounding
from ..operators import aggregates, joins, quality
from ..operators.cleaning import safe_int
from ..tables import load_table
from .registry import register

NS_PER_HOUR = 3_600_000_000_000
NS_PER_S = 1_000_000_000


@register(
    "events_hourly_rollup",
    bench=True,
    doc="Tumbling-window rollup (batch twin of the Structured Streaming "
    "pipeline): per hour × event_type count + value sum.",
    oracle=f"""
SELECT (epoch_ns(ts) // {NS_PER_HOUR}) AS hour_bucket,
       event_type,
       count(*) AS n,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY hour_bucket, event_type
""",
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.withColumn("hour_bucket", F.expr(f"ts div {NS_PER_HOUR}"))
        .groupBy("hour_bucket", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@register(
    "events_json_extract",
    doc="Map/JSON ops (S4/P11 fast path): parse the props JSON column, "
    "extract k, aggregate per event_type.",
    oracle="""
SELECT event_type,
       round(avg(try_cast(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
       sum(try_cast(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS sum_k
FROM events
GROUP BY event_type
""",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").try_cast("bigint")
    return ev.groupBy("event_type").agg(
        F.round(F.avg(k), 4).alias("avg_k"), F.sum(k).alias("sum_k")
    )


@register(
    "events_safe_cast",
    doc="P8 safe_int: regex number-rescue casts on string payloads "
    "(bulid_final_dataset.py:84-130).",
    oracle="""
SELECT event_id,
       coalesce(try_cast(trim(CAST(props AS VARCHAR)) AS BIGINT),
                try_cast(nullif(regexp_extract(CAST(props AS VARCHAR), '[-+]?\\d+', 0), '') AS BIGINT)) AS k_rescued
FROM events
""",
)
def events_safe_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return ev.select("event_id", safe_int(F.col("props")).alias("k_rescued"))


@register(
    "events_score_clamp",
    doc="P9: clamp scores into range, round(1), derive overall as the "
    "dim mean (enhance_scoring.py:53-117).",
    oracle="""
SELECT event_id,
       round(least(greatest(value, 0.0), 10.0), 1) AS v_clamped,
       round((round(least(greatest(value, 0.0), 10.0), 1)
              + (user_id % 10)::DOUBLE) / 2.0, 1) AS overall
FROM events
""",
)
def events_score_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    v = F.round(quality.clamp(F.col("value"), 0.0, 10.0), 1)
    dim2 = (F.col("user_id") % 10).cast("double")
    return ev.select(
        "event_id",
        v.alias("v_clamped"),
        quality.derived_overall([v, dim2]).alias("overall"),
    )


@register(
    "events_sessionize",
    doc="Gap-based sessionization (30-min inactivity) per user via "
    "lag + running sum — the batch twin of stateful streaming "
    "sessions.",
    oracle=f"""
WITH gaps AS (
  SELECT user_id, epoch_ns(ts) AS tns,
         CASE WHEN epoch_ns(ts) - lag(epoch_ns(ts)) OVER w > {30 * 60 * NS_PER_S}
              OR lag(epoch_ns(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, sum(new_session)::BIGINT AS n_sessions, count(*) AS n_events
FROM gaps GROUP BY user_id
""",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts") - F.lag("ts").over(w)
    new_session = F.when(
        gap.isNull() | (gap > 30 * 60 * NS_PER_S), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        ev.withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(
            F.sum("new_session").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "events_iqr_outliers",
    doc="A6: exact-percentile IQR outlier detection "
    "(ablation_error_analysis.py:171-192).",
    oracle="""
WITH q AS (
  SELECT quantile_cont(value, 0.25) AS q1, quantile_cont(value, 0.75) AS q3 FROM events
)
SELECT round(q.q1, 6) AS q1, round(q.q3, 6) AS q3,
       sum(CASE WHEN e.value < q.q1 - 1.5 * (q.q3 - q.q1)
                 OR e.value > q.q3 + 1.5 * (q.q3 - q.q1) THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
       count(*) AS n_total
FROM events e CROSS JOIN q
GROUP BY q.q1, q.q3
""",
)
def events_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return aggregates.iqr_outlier_stats(ev, "value")


@register(
    "events_corr",
    doc="A3: Pearson correlation value↔k plus summary stats "
    "(quality_scoring.py:446-479 shape).",
    oracle="""
SELECT round(corr(value, try_cast(json_extract_string(props, '$.k') AS BIGINT)), 4) AS corr_vk,
       round(avg(value), 4) AS mean_v,
       round(stddev_samp(value), 4) AS std_v,
       round(min(value), 2) AS min_v,
       round(max(value), 2) AS max_v
FROM events
""",
)
def events_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").try_cast("bigint")
    return ev.agg(
        F.round(F.corr(F.col("value"), k), 4).alias("corr_vk"),
        F.round(F.avg("value"), 4).alias("mean_v"),
        F.round(F.stddev_samp("value"), 4).alias("std_v"),
        F.round(F.min("value"), 2).alias("min_v"),
        F.round(F.max("value"), 2).alias("max_v"),
    )


@register(
    "events_value_histogram",
    doc="A2: value-counts distribution over integer buckets "
    "(enhance_scoring.py:501-537 shape).",
    oracle="""
SELECT floor(value / 50.0)::BIGINT AS bucket, count(*) AS n
FROM events GROUP BY bucket
""",
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return aggregates.value_histogram(ev, F.floor(F.col("value") / 50.0).cast("bigint"))


@register(
    "events_asof_join",
    bench=True,
    doc="Backward as-of join (kdb/DuckDB ASOF semantics; Spark has no "
    "built-in): each view event picks the user's latest prior purchase "
    "value. Union-and-scan implementation — one shuffle, zero join "
    "nodes, immune to dense right sides.",
    oracle=f"""
WITH v AS (
  SELECT user_id, ts FROM events WHERE event_type = 'view'
),
p AS (
  SELECT user_id, ts, value FROM events
  WHERE event_type = 'purchase' AND value IS NOT NULL
  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
),
j AS (
  SELECT v.user_id, p.value AS mv
  FROM v ASOF LEFT JOIN p ON v.user_id = p.user_id AND v.ts >= p.ts
)
SELECT user_id,
       count(*) AS n_views,
       sum(CASE WHEN mv IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_matched,
       {rounding.stable_round_sql("sum(coalesce(mv, 0.0))", 2)} AS sum_matched_value
FROM j GROUP BY user_id
""",
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    purchases = ev.filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select("user_id", "ts", "value", "event_id")
    matched = joins.asof_join(
        views, purchases, "user_id", "ts", "ts", ["value"], right_tiebreak="event_id"
    )
    return matched.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_views"),
        F.sum(F.col("matched_value").isNotNull().cast("int"))
        .cast("bigint")
        .alias("n_matched"),
        rounding.stable_round(
            F.sum(F.coalesce(F.col("matched_value"), F.lit(0.0))), 2
        ).alias("sum_matched_value"),
    )


@register(
    "events_range_join",
    doc="Interval range join as an equi-join: clicks landing in any "
    "[purchase_ts, +30min) window of the same user, via bucketized "
    "interval explosion — never the BroadcastNestedLoopJoin a raw "
    "BETWEEN predicate plans as.",
    oracle=f"""
WITH p AS (
  SELECT user_id, epoch_ns(ts) AS ps, event_id AS p_id
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id, epoch_ns(ts) AS cs, event_id AS c_id
  FROM events WHERE event_type = 'click'
)
SELECT c.user_id,
       count(*) AS n_pairs,
       count(DISTINCT p_id) AS n_purchases_hit,
       count(DISTINCT c_id) AS n_clicks_hit
FROM c JOIN p
  ON c.user_id = p.user_id AND c.cs >= p.ps AND c.cs < p.ps + {30 * 60 * NS_PER_S}
GROUP BY c.user_id
""",
)
def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    window_ns = 30 * 60 * NS_PER_S
    ev = load_table(spark, "events", sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("_start"),
        (F.col("ts") + window_ns).alias("_end"),
        F.col("event_id").alias("p_id"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("c_id")
    )
    pairs = joins.range_join_bucketed(
        clicks, purchases, "user_id", "ts", "_start", "_end", window_ns
    )
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("p_id").alias("n_purchases_hit"),
        F.countDistinct("c_id").alias("n_clicks_hit"),
    )


@register(
    "events_percentiles_by_type",
    doc="Exact per-group percentiles (Spark `percentile` == DuckDB "
    "quantile_cont bit-for-bit on identical sorted input) — the "
    "small-N ground truth for the bucketed scale path.",
    oracle="""
SELECT event_type,
       round(quantile_cont(value, 0.25), 6) AS p25,
       round(quantile_cont(value, 0.50), 6) AS p50,
       round(quantile_cont(value, 0.75), 6) AS p75,
       round(quantile_cont(value, 0.90), 6) AS p90
FROM events GROUP BY event_type
""",
)
def events_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy("event_type").agg(
        *[
            F.round(F.expr(f"percentile(value, {p})"), 6).alias(f"p{int(p * 100)}")
            for p in (0.25, 0.50, 0.75, 0.90)
        ]
    )


@register(
    "events_bucket_quantiles",
    doc="Histogram-bucket quantiles per event type — the 100 TB "
    "quantile shape: two hash aggs + a tiny per-group cumulative "
    "window instead of a full per-group sort; integer bucket output "
    "is drift-free across engines.",
    oracle="""
WITH h AS (
  SELECT event_type, floor(value / 25.0)::BIGINT AS _b, count(*) AS _n
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
c AS (
  SELECT event_type, _b, _n,
         sum(_n) OVER (PARTITION BY event_type ORDER BY _b) AS _cum,
         sum(_n) OVER (PARTITION BY event_type) AS _total
  FROM h
)
SELECT event_type,
       min(CASE WHEN _cum >= ceil(0.25 * _total) THEN _b END) AS q_25,
       min(CASE WHEN _cum >= ceil(0.5 * _total) THEN _b END) AS q_50,
       min(CASE WHEN _cum >= ceil(0.9 * _total) THEN _b END) AS q_90
FROM c GROUP BY event_type
""",
)
def events_bucket_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).filter(F.col("value").isNotNull())
    return aggregates.bucket_quantiles(
        ev, "value", ["event_type"], [0.25, 0.5, 0.9], width=25.0
    )


@register(
    "events_funnel",
    doc="Ordered funnel (view -> click -> purchase per user): stacked "
    "per-user window minima — each stage's first-hit must be at or "
    "after the previous stage's. Three window passes over ONE user "
    "shuffle (Catalyst chains same-partitioning windows).",
    oracle="""
WITH w1 AS (
  SELECT user_id, ts, event_type,
         min(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS v
  FROM events
),
w2 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts >= v THEN ts END)
              OVER (PARTITION BY user_id) AS c
  FROM w1
),
w3 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= c THEN ts END)
              OVER (PARTITION BY user_id) AS p
  FROM w2
)
SELECT count(DISTINCT CASE WHEN v IS NOT NULL THEN user_id END) AS n_reached_view,
       count(DISTINCT CASE WHEN c IS NOT NULL THEN user_id END) AS n_reached_click,
       count(DISTINCT CASE WHEN p IS NOT NULL THEN user_id END) AS n_reached_purchase
FROM w3
""",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    wu = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "v", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(wu)
        )
        .withColumn(
            "c",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") >= F.col("v")),
                    F.col("ts"),
                )
            ).over(wu),
        )
        .withColumn(
            "p",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") >= F.col("c")),
                    F.col("ts"),
                )
            ).over(wu),
        )
    )
    return staged.agg(
        F.countDistinct(F.when(F.col("v").isNotNull(), F.col("user_id"))).alias(
            "n_reached_view"
        ),
        F.countDistinct(F.when(F.col("c").isNotNull(), F.col("user_id"))).alias(
            "n_reached_click"
        ),
        F.countDistinct(F.when(F.col("p").isNotNull(), F.col("user_id"))).alias(
            "n_reached_purchase"
        ),
    )


@register(
    "events_type_pivot",
    doc="Hourly wide table via pivot with EXPLICIT type values (an "
    "implicit pivot would add a distinct-scan job and make the output "
    "schema data-dependent — never at 100 TB).",
    oracle=f"""
SELECT (epoch_ns(ts) // {NS_PER_HOUR}) AS hour_bucket,
       sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS click,
       sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS view,
       sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS purchase,
       sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS signup,
       sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS error
FROM events GROUP BY 1
""",
)
def events_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    types = ["click", "view", "purchase", "signup", "error"]
    out = (
        ev.withColumn("hour_bucket", F.expr(f"ts div {NS_PER_HOUR}"))
        .groupBy("hour_bucket")
        .pivot("event_type", types)
        .count()
    )
    # pivot leaves missing cells null — normalize to 0 like the CASE sums
    return out.select(
        "hour_bucket",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types],
    )


@register(
    "events_type_hour_cube",
    doc="CUBE(event_type, hour-of-day) counts with grouping_id — all "
    "four rollup combinations in one pass of partial aggregates.",
    oracle=f"""
SELECT event_type,
       (epoch_ns(ts) // {NS_PER_HOUR}) % 24 AS hour_of_day,
       grouping(event_type, (epoch_ns(ts) // {NS_PER_HOUR}) % 24)::BIGINT AS gid,
       count(*) AS n
FROM events
GROUP BY CUBE(event_type, (epoch_ns(ts) // {NS_PER_HOUR}) % 24)
""",
)
def events_type_hour_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).withColumn(
        "hour_of_day", F.expr(f"ts div {NS_PER_HOUR}") % 24
    )
    return (
        ev.cube("event_type", "hour_of_day")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("event_type", "hour_of_day", "gid", "n")
    )


NS_PER_DAY = 24 * NS_PER_HOUR


@register(
    "events_retention_cohorts",
    doc="Retention triangle: users grouped by first-seen day, distinct "
    "actives per (cohort_day, day_offset) — one per-user window min + "
    "one distinct aggregate.",
    oracle=f"""
WITH d AS (
  SELECT user_id, (epoch_ns(ts) // {NS_PER_DAY}) AS day,
         min(epoch_ns(ts) // {NS_PER_DAY}) OVER (PARTITION BY user_id) AS cohort_day
  FROM events
)
SELECT cohort_day, (day - cohort_day) AS day_offset,
       count(DISTINCT user_id) AS n_users
FROM d GROUP BY cohort_day, day_offset
""",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).withColumn(
        "day", F.expr(f"ts div {NS_PER_DAY}")
    )
    wu = Window.partitionBy("user_id")
    d = ev.withColumn("cohort_day", F.min("day").over(wu))
    return d.groupBy(
        "cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset")
    ).agg(F.countDistinct("user_id").alias("n_users"))


@register(
    "events_user_trend",
    doc="Per-user OLS slope of value over time, computed from the five "
    "closed-form sums in one hash aggregate (no per-group sort, no "
    "UDF; engine regr_slope internals differ, the raw-sum formula "
    "doesn't). Time in hours since each user's first event.",
    oracle=f"""
WITH b AS (
  SELECT user_id,
         (epoch_ns(ts) - min(epoch_ns(ts)) OVER (PARTITION BY user_id))::DOUBLE
           / {NS_PER_HOUR} AS x,
         value AS y
  FROM events WHERE value IS NOT NULL
),
s AS (
  SELECT user_id, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM b GROUP BY user_id
)
SELECT user_id, n,
       {rounding.stable_round_sql(
           "(n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0.0)", 4)} AS slope
FROM s WHERE n >= 2
""",
)
def events_user_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).filter(F.col("value").isNotNull())
    wu = Window.partitionBy("user_id")
    x = (F.col("ts") - F.min("ts").over(wu)).cast("double") / NS_PER_HOUR
    b = ev.select("user_id", x.alias("x"), F.col("value").alias("y"))
    s = b.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.when(
        denom != 0.0, denom
    )
    return s.filter(F.col("n") >= 2).select(
        "user_id", "n", rounding.stable_round(slope, 4).alias("slope")
    )


@register(
    "events_rolling_hour_avg",
    doc="Time-range rolling mean per user (RANGE BETWEEN 1 hour "
    "PRECEDING): summand is integer cents so the windowed sum is "
    "EXACT — no FP association-order drift between engines' window "
    "implementations.",
    oracle=f"""
WITH c AS (
  SELECT user_id, event_id, epoch_ns(ts) AS tns,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vc
  FROM events WHERE value IS NOT NULL
)
SELECT user_id, event_id,
       {rounding.stable_round_sql(
           "(sum(vc) OVER (PARTITION BY user_id ORDER BY tns"
           f" RANGE BETWEEN {NS_PER_HOUR} PRECEDING AND CURRENT ROW))::DOUBLE"
           " / (100.0 * count(*) OVER (PARTITION BY user_id ORDER BY tns"
           f" RANGE BETWEEN {NS_PER_HOUR} PRECEDING AND CURRENT ROW))", 4)}
         AS rolling_avg
FROM c
""",
)
def events_rolling_hour_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).filter(F.col("value").isNotNull())
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("bigint")
    c = ev.select("user_id", "event_id", F.col("ts").alias("tns"), cents.alias("vc"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("tns")
        .rangeBetween(-NS_PER_HOUR, Window.currentRow)
    )
    rolling = F.sum("vc").over(w).cast("double") / (
        F.lit(100.0) * F.count(F.lit(1)).over(w)
    )
    return c.select(
        "user_id", "event_id", rounding.stable_round(rolling, 4).alias("rolling_avg")
    )


# ---------------------------------------------------------------------------
# Operational skew diagnosis (beyond-reference scale tooling)

from ..operators import skew as _skew  # noqa: E402


@register(
    "events_skew_report",
    doc="Join-key skew diagnosis over events.user_id: top-5 heaviest "
    "keys with share-of-table, ratio vs the mean key, and the salt "
    "factor that returns the hot key to a 1e6-rows/task budget "
    "(here scaled to 100 rows/task so the synthetic table produces "
    "non-trivial factors). Two map-side-combined aggs + one window "
    "over the 5-row top frame.",
    oracle="""
WITH counts AS (
  SELECT user_id, count(*) AS n_rows FROM events GROUP BY user_id
),
tot AS (SELECT sum(n_rows)::DOUBLE AS _total, count(*)::BIGINT AS _n_keys FROM counts)
SELECT user_id, rank, n_rows,
       round(n_rows / _total, 6) AS share,
       round(n_rows / (_total / _n_keys), 4) AS vs_mean,
       greatest(1, ceil(n_rows / 100.0)::INT)::BIGINT AS salt_factor
FROM (
  SELECT c.user_id, c.n_rows, t._total, t._n_keys,
         row_number() OVER (ORDER BY c.n_rows DESC, c.user_id ASC) AS rank
  FROM counts c CROSS JOIN tot t
) WHERE rank <= 5
""",
)
def events_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return _skew.skew_report(
        ev, ["user_id"], top_n=5, target_rows_per_task=100
    ).select(
        "user_id",
        F.col("rank").cast("long").alias("rank"),
        "n_rows",
        "share",
        "vs_mean",
        F.col("salt_factor").cast("long").alias("salt_factor"),
    )


@register(
    "events_hourly_anomalies",
    doc="Volume anomaly detection: per-(type, hour) event counts "
    "z-scored against the type's own hourly mean/stddev; hours at "
    "|z| >= 2 surface. The monitoring twin of the skew report — two "
    "keyed aggregations + a broadcast of the per-type stats frame.",
    oracle=f"""
WITH hourly AS (
  SELECT event_type, (epoch_ns(ts) // {NS_PER_HOUR}) AS hour_bucket,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, avg(n) AS _mu, stddev_samp(n) AS _sd
  FROM hourly GROUP BY event_type
)
SELECT event_type, hour_bucket, n, z FROM (
  SELECT h.event_type, h.hour_bucket, h.n,
         (floor(((h.n - s._mu) / s._sd) * 10000.0 + 0.5) / 10000.0) AS z
  FROM hourly h JOIN stats s USING (event_type)
  WHERE s._sd > 0
) WHERE abs(z) >= 2.0
""",
)
def events_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    hourly = (
        ev.withColumn("hour_bucket", F.expr(f"ts div {NS_PER_HOUR}"))
        .groupBy("event_type", "hour_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    stats = hourly.groupBy("event_type").agg(
        F.avg("n").alias("_mu"), F.stddev_samp("n").alias("_sd")
    )
    from ..functions.rounding import stable_round

    z = stable_round((F.col("n") - F.col("_mu")) / F.col("_sd"), 4)
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .filter(F.col("_sd") > 0)
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) >= 2.0)
        .select("event_type", "hour_bucket", "n", "z")
    )


@register(
    "events_burstiness",
    doc="Traffic burstiness per event type: Fano factor (variance / "
    "mean) of the hourly volume distribution — ~1 is Poisson-like "
    "arrivals, >>1 is bursty traffic that needs skew-aware "
    "partitioning. Two keyed aggregations.",
    oracle=f"""
WITH hourly AS (
  SELECT event_type, (epoch_ns(ts) // {NS_PER_HOUR}) AS hour_bucket,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       count(*)::BIGINT AS n_hours,
       {rounding.stable_round_sql("avg(n)", 4)} AS mean_per_hour,
       {rounding.stable_round_sql("var_samp(n) / avg(n)", 4)} AS fano
FROM hourly GROUP BY event_type
""",
)
def events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import stable_round

    ev = load_table(spark, "events", sf_dir)
    hourly = (
        ev.withColumn("hour_bucket", F.expr(f"ts div {NS_PER_HOUR}"))
        .groupBy("event_type", "hour_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        stable_round(F.avg("n"), 4).alias("mean_per_hour"),
        stable_round(F.var_samp("n") / F.avg("n"), 4).alias("fano"),
    )


@register(
    "events_trend_mk",
    doc="Mann-Kendall monotonic-trend test per event type over the "
    "DAILY volume series: S = sum of sign(n_j - n_i) over day pairs "
    "i<j — pure integer arithmetic, engine-exact. The grouped pair "
    "join is quadratic in DAYS per type (~84 here), not in events.",
    oracle=f"""
WITH daily AS (
  SELECT event_type, (epoch_ns(ts) // {24 * NS_PER_HOUR}) AS day_bucket,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type,
         CASE WHEN b.n > a.n THEN 1 WHEN b.n < a.n THEN -1 ELSE 0 END AS sgn
  FROM daily a
  JOIN daily b
    ON a.event_type = b.event_type AND b.day_bucket > a.day_bucket
)
SELECT event_type,
       (SELECT count(*) FROM daily d WHERE d.event_type = pairs.event_type)::BIGINT
         AS n_days,
       sum(sgn)::BIGINT AS s_statistic,
       CASE WHEN sum(sgn) > 0 THEN 'rising'
            WHEN sum(sgn) < 0 THEN 'falling' ELSE 'flat' END AS direction
FROM pairs GROUP BY event_type
""",
)
def events_trend_mk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    daily = (
        ev.withColumn("day_bucket", F.expr(f"ts div {24 * NS_PER_HOUR}"))
        .groupBy("event_type", "day_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    a = daily.select("event_type", F.col("day_bucket").alias("_da"), F.col("n").alias("_na"))
    b = daily.select("event_type", F.col("day_bucket").alias("_db"), F.col("n").alias("_nb"))
    sgn = (
        F.when(F.col("_nb") > F.col("_na"), 1)
        .when(F.col("_nb") < F.col("_na"), -1)
        .otherwise(0)
    )
    counts = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    s = (
        a.join(b, "event_type")
        .filter(F.col("_db") > F.col("_da"))
        .groupBy("event_type")
        .agg(F.sum(sgn).cast("bigint").alias("s_statistic"))
    )
    return s.join(F.broadcast(counts), "event_type").select(
        "event_type",
        "n_days",
        "s_statistic",
        F.when(F.col("s_statistic") > 0, "rising")
        .when(F.col("s_statistic") < 0, "falling")
        .otherwise("flat")
        .alias("direction"),
    )


@register(
    "events_transition_matrix",
    doc="Per-user event-type transition counts (first-order Markov "
    "view of user journeys): consecutive events by (user, ts) with a "
    "deterministic event_id tie-break, per-(from, to) counts and the "
    "row-normalized probability — the funnel-shape diagnostic. One "
    "per-user window + two keyed aggregations.",
    oracle=f"""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY epoch_ns(ts), event_id) AS next_type
  FROM events
),
cells AS (
  SELECT event_type AS from_type, next_type AS to_type, count(*)::BIGINT AS n
  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
),
tots AS (SELECT from_type, sum(n)::BIGINT AS _t FROM cells GROUP BY 1)
SELECT c.from_type, c.to_type, c.n,
       {rounding.stable_round_sql("c.n / t._t", 4)} AS p
FROM cells c JOIN tots t USING (from_type)
""",
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.rounding import stable_round

    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    )
    cells = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tots = cells.groupBy("from_type").agg(F.sum("n").alias("_t"))
    return cells.join(F.broadcast(tots), "from_type").select(
        "from_type",
        "to_type",
        "n",
        stable_round(F.col("n") / F.col("_t"), 4).alias("p"),
    )


@register(
    "events_type_drift",
    doc="Period-over-period volume drift per event type: first half "
    "vs second half of the time range (split at the midpoint epoch), "
    "with the per-mille change — the release-comparison twin of "
    "vocab_drift. Two keyed aggregations + a broadcast 1-row midpoint.",
    oracle="""
WITH bounds AS (
  SELECT (min(epoch_ns(ts)) + (max(epoch_ns(ts)) - min(epoch_ns(ts))) // 2) AS mid
  FROM events
),
halves AS (
  SELECT event_type,
         sum(CASE WHEN epoch_ns(ts) < b.mid THEN 1 ELSE 0 END)::BIGINT AS n_first,
         sum(CASE WHEN epoch_ns(ts) >= b.mid THEN 1 ELSE 0 END)::BIGINT AS n_second
  FROM events CROSS JOIN bounds b
  GROUP BY event_type
)
SELECT event_type, n_first, n_second,
       -- sign-explicit so DuckDB's floor-div and Spark's trunc-div agree
       (CASE WHEN n_second >= n_first
             THEN  ((n_second - n_first) * 1000) // greatest(n_first, 1)
             ELSE -(((n_first - n_second) * 1000) // greatest(n_first, 1))
        END)::BIGINT AS change_permille
FROM halves
""",
)
def events_type_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    bounds = ev.agg(
        # pure integer arithmetic (div, not double /): double division of
        # epoch-nano longs loses integer exactness past 2^53 ns (~104 days
        # of range) and would silently diverge from the oracle's `// 2`;
        # both operands are non-negative so trunc-div == floor-div
        F.expr("min(ts) + (max(ts) - min(ts)) div 2").cast("long").alias("mid")
    )
    halves = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("ts") < F.col("mid"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_first"),
            F.sum(F.when(F.col("ts") >= F.col("mid"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_second"),
        )
    )
    return halves.select(
        "event_type",
        "n_first",
        "n_second",
        F.expr(
            # sign-explicit: floor-div (DuckDB //) == trunc-div (Spark
            # div) only on non-negative operands
            "cast(case when n_second >= n_first"
            " then (n_second - n_first) * 1000 div greatest(n_first, 1)"
            " else -((n_first - n_second) * 1000 div greatest(n_first, 1))"
            " end as bigint)"
        ).alias("change_permille"),
    )


@register(
    "events_hourly_seasonality",
    doc="Hour-of-day seasonality profile per event type: mean volume "
    "at each of the 24 clock hours (UTC-epoch arithmetic, no session "
    "timezone involved) — the baseline the anomaly detector's "
    "type-level z-scores deliberately ignore.",
    oracle=f"""
WITH hourly AS (
  SELECT event_type, (epoch_ns(ts) // {NS_PER_HOUR}) AS hour_bucket,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, (hour_bucket % 24)::BIGINT AS hour_of_day,
       count(*)::BIGINT AS n_hours,
       {{SRS}} AS mean_volume
FROM hourly GROUP BY event_type, hour_of_day
""".replace("{SRS}", rounding.stable_round_sql("avg(n)", 4)),
)
def events_hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import stable_round

    ev = load_table(spark, "events", sf_dir)
    hourly = (
        ev.withColumn("hour_bucket", F.expr(f"ts div {NS_PER_HOUR}"))
        .groupBy("event_type", "hour_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        hourly.withColumn(
            "hour_of_day", (F.col("hour_bucket") % 24).cast("bigint")
        )
        .groupBy("event_type", "hour_of_day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hours"),
            stable_round(F.avg("n"), 4).alias("mean_volume"),
        )
    )


@register(
    "monthly_conversion",
    doc="Activity-to-purchase conversion per 30-day epoch bucket: "
    "distinct active event users vs distinct ordering customers (the "
    "keys are shared by construction), with the per-mille conversion. "
    "30-day integer epoch buckets keep the bucketing timezone-free "
    "and engine-exact; two distinct-aggregations + one equi-join.",
    oracle=f"""
WITH act AS (
  SELECT ((epoch_ns(ts) // {24 * NS_PER_HOUR}) // 30) AS period,
         count(DISTINCT user_id)::BIGINT AS n_active
  FROM events GROUP BY 1
),
buy AS (
  SELECT ((CAST(o_orderdate AS DATE) - DATE '1970-01-01') // 30) AS period,
         count(DISTINCT o_custkey)::BIGINT AS n_buyers
  FROM orders GROUP BY 1
)
SELECT act.period, act.n_active, buy.n_buyers,
       (buy.n_buyers * 1000 // act.n_active)::BIGINT AS conversion_permille
FROM act JOIN buy USING (period)
""",
)
def monthly_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    act = (
        ev.withColumn("period", F.expr(f"(ts div {24 * NS_PER_HOUR}) div 30"))
        .groupBy("period")
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_active"))
    )
    buy = (
        o.withColumn(
            "period",
            F.expr("datediff(to_date(o_orderdate), date '1970-01-01') div 30").cast(
                "long"
            ),
        )
        .groupBy("period")
        .agg(F.countDistinct("o_custkey").cast("bigint").alias("n_buyers"))
    )
    return act.join(buy, "period").select(
        "period",
        "n_active",
        "n_buyers",
        F.expr("cast(n_buyers * 1000 div n_active as bigint)").alias(
            "conversion_permille"
        ),
    )


@register(
    "events_dau_wau_stickiness",
    doc="DAU / trailing-7-day WAU / stickiness per day: the rolling "
    "distinct count is computed by exploding each distinct (user, day) "
    "into the 7 windows it contributes to — a keyed aggregation "
    "instead of an unexpressible rolling COUNT DISTINCT. Days without "
    "a full 7-day history are excluded (partial windows understate "
    "WAU). Stickiness is per-mille integer.",
    oracle=f"""
WITH ud AS (
  SELECT DISTINCT user_id, (epoch_ns(ts) // {24 * NS_PER_HOUR}) AS day
  FROM events
),
dau AS (SELECT day, count(*)::BIGINT AS dau FROM ud GROUP BY day),
contrib AS (
  SELECT user_id, day + _k AS wday
  FROM ud, LATERAL unnest(range(0, 7)) r(_k)
),
wau AS (
  SELECT wday AS day, count(DISTINCT user_id)::BIGINT AS wau
  FROM contrib GROUP BY wday
),
bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM ud)
SELECT d.day, d.dau, w.wau,
       (d.dau * 1000 // w.wau)::BIGINT AS stickiness_permille
FROM dau d JOIN wau w USING (day) CROSS JOIN bounds b
WHERE d.day >= b.d0 + 6 AND d.day <= b.d1
""",
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    ud = (
        ev.select(
            "user_id", F.expr(f"ts div {24 * NS_PER_HOUR}").alias("day")
        )
        .distinct()
    )
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).cast("bigint").alias("dau"))
    contrib = ud.select(
        "user_id",
        "day",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("_k"),
    ).select("user_id", (F.col("day") + F.col("_k")).alias("wday"))
    wau = contrib.groupBy(F.col("wday").alias("day")).agg(
        F.countDistinct("user_id").cast("bigint").alias("wau")
    )
    bounds = ud.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    return (
        dau.join(wau, "day")
        .crossJoin(F.broadcast(bounds))
        .filter((F.col("day") >= F.col("d0") + 6) & (F.col("day") <= F.col("d1")))
        .select(
            "day",
            "dau",
            "wau",
            F.expr("cast(dau * 1000 div wau as bigint)").alias(
                "stickiness_permille"
            ),
        )
    )


@register(
    "events_mad_outliers",
    doc="Robust (median/MAD) outlier detection per event type: the "
    "3-sigma-equivalent cutoff med +- 3 * 1.4826 * MAD — unlike the "
    "IQR gate this one is per-type and immune to the mean/stddev "
    "being dragged by the outliers themselves. Two exact-percentile "
    "passes + one count.",
    oracle="""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS _med
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, e.value, m._med, abs(e.value - m._med) AS _ad
  FROM events e JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, quantile_cont(_ad, 0.5) AS _mad
  FROM dev GROUP BY event_type
)
SELECT d.event_type,
       count(*)::BIGINT AS n_events,
       (floor(max(d._med) * 10000.0 + 0.5) / 10000.0) AS median_value,
       (floor(max(m._mad) * 10000.0 + 0.5) / 10000.0) AS mad,
       sum(CASE WHEN d._ad > 3.0 * 1.4826 * m._mad THEN 1 ELSE 0 END)::BIGINT
         AS n_outliers
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type
""",
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import stable_round

    ev = load_table(spark, "events", sf_dir)
    med = ev.groupBy("event_type").agg(
        F.percentile(F.col("value"), F.lit(0.5)).alias("_med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "_med",
        F.abs(F.col("value") - F.col("_med")).alias("_ad"),
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile(F.col("_ad"), F.lit(0.5)).alias("_mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            stable_round(F.max("_med"), 4).alias("median_value"),
            stable_round(F.max("_mad"), 4).alias("mad"),
            F.sum(
                F.when(F.col("_ad") > 3.0 * 1.4826 * F.col("_mad"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


@register(
    "events_weekday_weekend_mix",
    doc="Weekday vs weekend volume mix per event type (epoch-day "
    "modulo-7 arithmetic; 1970-01-01 was a Thursday, so day%7 in "
    "{2,3} is the weekend — timezone-free on both engines), with the "
    "weekend share per-mille.",
    oracle=f"""
WITH d AS (
  SELECT event_type,
         CASE WHEN ((epoch_ns(ts) // {24 * NS_PER_HOUR}) % 7) IN (2, 3)
              THEN 1 ELSE 0 END AS is_weekend
  FROM events
)
SELECT event_type,
       sum(1 - is_weekend)::BIGINT AS n_weekday,
       sum(is_weekend)::BIGINT AS n_weekend,
       (sum(is_weekend) * 1000 // count(*))::BIGINT AS weekend_permille
FROM d GROUP BY event_type
""",
)
def events_weekday_weekend_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    is_weekend = F.when(
        F.expr(f"(ts div {24 * NS_PER_HOUR}) % 7").isin(2, 3), 1
    ).otherwise(0)
    return (
        ev.select("event_type", is_weekend.alias("is_weekend"))
        .groupBy("event_type")
        .agg(
            F.sum(1 - F.col("is_weekend")).cast("bigint").alias("n_weekday"),
            F.sum("is_weekend").cast("bigint").alias("n_weekend"),
            F.expr(
                "cast(sum(is_weekend) * 1000 div count(*) as bigint)"
            ).alias("weekend_permille"),
        )
    )


@register(
    "top_engaged_users",
    doc="Top-20 users by events-per-active-day: lifetime span, volume, "
    "and the integer-scaled engagement rate with a total tie-break — "
    "the power-user listing. One keyed aggregation + TakeOrdered.",
    oracle=f"""
WITH u AS (
  SELECT user_id,
         count(*)::BIGINT AS n_events,
         (max(epoch_ns(ts) // {24 * NS_PER_HOUR})
          - min(epoch_ns(ts) // {24 * NS_PER_HOUR}) + 1)::BIGINT AS span_days,
         count(DISTINCT epoch_ns(ts) // {24 * NS_PER_HOUR})::BIGINT AS active_days
  FROM events GROUP BY user_id
)
SELECT user_id, n_events, span_days, active_days,
       (n_events * 1000 // active_days)::BIGINT AS events_per_day_milli
FROM u
ORDER BY events_per_day_milli DESC, user_id ASC
LIMIT 20
""",
)
def top_engaged_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    day = F.expr(f"ts div {24 * NS_PER_HOUR}")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (F.max(day) - F.min(day) + 1).cast("bigint").alias("span_days"),
        F.countDistinct(day).cast("bigint").alias("active_days"),
    )
    return (
        u.select(
            "user_id",
            "n_events",
            "span_days",
            "active_days",
            F.expr("cast(n_events * 1000 div active_days as bigint)").alias(
                "events_per_day_milli"
            ),
        )
        .orderBy(F.col("events_per_day_milli").desc(), F.col("user_id").asc())
        .limit(20)
    )


@register(
    "events_interarrival_stats",
    doc="Inter-arrival gap statistics per event type: median / p90 / "
    "max of the seconds between consecutive events of the SAME user "
    "(lag window per user, gaps attributed to the later event's type) "
    "— the burstiness profile session gap thresholds are tuned "
    "against. One keyed window + one percentile aggregation; exact "
    "interpolated percentiles match DuckDB's quantile_cont bit-for-"
    "bit (the iqr precedent).",
    oracle="""
WITH gaps AS (
  SELECT event_type,
         (epoch_ns(ts) - lag(epoch_ns(ts)) OVER
            (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)) AS gap_ns
  FROM events
)
SELECT event_type,
       count(*)::BIGINT AS n_gaps,
       (floor((quantile_cont(gap_ns, 0.5) / 1000000000.0) * 100.0 + 0.5) / 100.0)
         AS median_gap_s,
       (floor((quantile_cont(gap_ns, 0.9) / 1000000000.0) * 100.0 + 0.5) / 100.0)
         AS p90_gap_s,
       (floor((max(gap_ns) / 1000000000.0) * 100.0 + 0.5) / 100.0) AS max_gap_s
FROM gaps WHERE gap_ns IS NOT NULL
GROUP BY event_type
""",
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.rounding import stable_round

    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (F.col("ts") - F.lag("ts").over(w)).alias("gap_ns"),
    ).filter(F.col("gap_ns").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        stable_round(
            F.expr("percentile(gap_ns, 0.5)") / 1_000_000_000.0, 2
        ).alias("median_gap_s"),
        stable_round(
            F.expr("percentile(gap_ns, 0.9)") / 1_000_000_000.0, 2
        ).alias("p90_gap_s"),
        stable_round(F.max("gap_ns") / 1_000_000_000.0, 2).alias("max_gap_s"),
    )
