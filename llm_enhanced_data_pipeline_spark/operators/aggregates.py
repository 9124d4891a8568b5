"""Aggregation operators (SURVEY.md §2.5, A1-A12).

All single-pass hash aggregates: Catalyst plans partial (map-side)
aggregation before the shuffle, so these scale linearly with input and
shuffle only the per-group partials.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pct(cond: Column, decimals: int = 2) -> Column:
    """``100 * avg(cond ? 1 : 0)`` — the reference's `%` stats
    (data_quality_comparison.py:56-76)."""
    return F.round(100.0 * F.avg(F.when(cond, 1.0).otherwise(0.0)), decimals)


def stage_quality_stats(
    df: DataFrame,
    text_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """A1-shaped stats: count, avg length, % non-empty, avg word count."""
    from .cleaning import tokens

    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.avg(F.length(text_col)), 4).alias("avg_len"),
        pct(F.length(F.trim(F.col(text_col))) > 0).alias("pct_nonempty"),
        F.round(F.avg(F.size(tokens(F.col(text_col)))), 4).alias("avg_words"),
    ]
    if group_cols:
        return df.groupBy(*group_cols).agg(*aggs)
    return df.agg(*aggs)


def value_histogram(df: DataFrame, bucket: Column) -> DataFrame:
    """A2 distribution: value counts by bucket expression."""
    return df.groupBy(bucket.alias("bucket")).agg(F.count(F.lit(1)).alias("n"))


def iqr_outlier_stats(df: DataFrame, col: str) -> DataFrame:
    """A6 IQR outliers: exact percentiles (Q1/Q3 ± 1.5·IQR), one pass +
    one filtered agg. Uses exact `percentile` so the DuckDB
    quantile_cont oracle matches bit-for-bit."""
    q = df.agg(
        F.expr(f"percentile({col}, 0.25)").alias("q1"),
        F.expr(f"percentile({col}, 0.75)").alias("q3"),
    )
    joined = df.crossJoin(F.broadcast(q))
    iqr = F.col("q3") - F.col("q1")
    is_out = (F.col(col) < F.col("q1") - 1.5 * iqr) | (
        F.col(col) > F.col("q3") + 1.5 * iqr
    )
    return joined.agg(
        F.round(F.first("q1"), 6).alias("q1"),
        F.round(F.first("q3"), 6).alias("q3"),
        F.sum(F.when(is_out, 1).otherwise(0)).alias("n_outliers"),
        F.count(F.lit(1)).alias("n_total"),
    )


def distribution(df: DataFrame, key: Column | str, order_desc: bool = True) -> DataFrame:
    """A9 topic distribution: group → count → sort."""
    key_col = F.col(key) if isinstance(key, str) else key
    out = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    return out


def bucket_quantiles(
    df: DataFrame,
    col: str,
    group_cols: list[str],
    probs: list[float],
    width: float = 1.0,
) -> DataFrame:
    """Histogram-based quantiles: the bucket containing each requested
    quantile, per group.

    The 100 TB quantile shape: exact `percentile` needs a full sort of
    every group; this is two hash aggregations (value→bucket counts,
    then a per-group cumulative scan over a FEW THOUSAND bucket rows).
    Results are integer bucket indices — deterministic in any engine,
    no floating-point interpolation to drift — at resolution ``width``.
    approx_percentile gives tighter error but engine-private sketches;
    this stays oracle-reproducible.

    Output: group_cols + q_<pct> bucket-index columns (bigint).
    """
    bucket = F.floor(F.col(col) / width).cast("bigint")
    hist = df.groupBy(*group_cols, bucket.alias("_b")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    w = Window.partitionBy(*group_cols).orderBy("_b")
    wt = Window.partitionBy(*group_cols)
    cum = hist.withColumn("_cum", F.sum("_n").over(w)).withColumn(
        "_total", F.sum("_n").over(wt)
    )
    aggs = []
    for p in probs:
        name = f"q_{int(round(p * 100))}"
        # first bucket whose cumulative count reaches ceil(p * total)
        reached = F.col("_cum") >= F.ceil(F.lit(p) * F.col("_total"))
        aggs.append(F.min(F.when(reached, F.col("_b"))).alias(name))
    return cum.groupBy(*group_cols).agg(*aggs)


# ---------------------------------------------------------------------------
# KMV distinct-count sketch (Bar-Yossef et al. 2002, "Counting distinct
# elements in a data stream"). The engine-exact alternative to HLL:
# Spark's approx_count_distinct and DuckDB's approx sketches are
# implementation-private, so their estimates can never cross the
# oracle boundary — KMV over the md5 hash IS reproducible bit-for-bit
# on any engine, and two sketches merge by keeping the k smallest of
# the union (the property that makes per-shard/per-day sketches
# composable at 100 TB without rescanning).


def kmv_distinct(
    values: DataFrame,
    value_col: str,
    k: int = 256,
    seed: int = 9,
) -> DataFrame:
    """1-row (n_estimate) KMV estimate of #distinct values.

    Sketch = the k smallest distinct md5-based 32-bit hashes; with
    fewer than k distinct values the sketch is exhaustive and the
    estimate is exact, otherwise n ~ (k-1) * 2^32 / h_k (relative
    error ~ 1/sqrt(k-2), ~6% at k=256).

    Scale shape: map-side-combined distinct on the hash, then a
    TakeOrdered top-k (per-partition partial top-k, k-row driver
    merge) — the full value set is never collected, and the k-row
    sketch frame is the only global state.
    """
    from ..functions import hashing

    sk = (
        values.select(hashing.stable_hash32(F.col(value_col), seed=seed).alias("_h"))
        .distinct()
        .orderBy("_h")
        .limit(k)
    )
    return sk.agg(
        F.count(F.lit(1)).alias("_k"), F.max("_h").alias("_hk")
    ).select(
        F.when(F.col("_k") < k, F.col("_k"))
        .otherwise(
            F.floor((k - 1) * F.lit(4294967296.0) / F.col("_hk") + 0.5).cast("bigint")
        )
        .cast("bigint")
        .alias("n_estimate")
    )


def kmv_distinct_sql(values_rel: str, value_expr: str, k: int = 256, seed: int = 9) -> str:
    """DuckDB twin of :func:`kmv_distinct`; ``values_rel`` exposes one
    row per value under ``value_expr``."""
    from ..functions import hashing

    h = hashing.stable_hash32_sql(value_expr, seed)
    return f"""
SELECT CASE WHEN count(*) < {k} THEN count(*)
            ELSE floor(({k} - 1) * 4294967296.0 / max(_h) + 0.5)::BIGINT
       END::BIGINT AS n_estimate
FROM (SELECT DISTINCT {h} AS _h FROM {values_rel} ORDER BY _h LIMIT {k})
"""


def kmv_intersection(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    k: int = 256,
    seed: int = 9,
) -> DataFrame:
    """1-row (n_estimate) KMV/theta estimate of #distinct values shared
    by two frames — "how much distinct vocabulary do two corpus
    snapshots share" without an exact distinct-join over either.

    Theta-sketch semantics: theta = the smaller of the two sketches'
    effective thresholds (2^32 for an exhaustive side, else its k-th
    smallest hash); the estimate is |sketch_A ∩ sketch_B below theta|
    scaled by 2^32/theta. Deterministic — identical on every engine.

    Scale shape: two independent k-row sketches (map-side-combined
    distinct + partial top-k each), a k-row equi-join, two 1-row
    broadcasts. Nothing global beyond the sketches.
    """
    from ..functions import hashing

    m = 4294967296.0

    def sketch(df: DataFrame) -> DataFrame:
        return (
            df.select(hashing.stable_hash32(F.col(value_col), seed=seed).alias("_h"))
            .distinct()
            .orderBy("_h")
            .limit(k)
        )

    sa, sb = sketch(a), sketch(b)

    def theta(sk: DataFrame, name: str) -> DataFrame:
        return sk.agg(
            F.when(F.count(F.lit(1)) < k, F.lit(m))
            .otherwise(F.max("_h").cast("double"))
            .alias(name)
        )

    matched = sa.join(sb, "_h")
    return (
        matched.crossJoin(F.broadcast(theta(sa, "_ta")))
        .crossJoin(F.broadcast(theta(sb, "_tb")))
        .select("_h", F.least("_ta", "_tb").alias("_t"))
        .agg(
            F.floor(
                F.sum(F.when(F.col("_h") < F.col("_t"), 1).otherwise(0))
                * F.lit(m)
                / F.min("_t")
                + 0.5
            )
            .cast("bigint")
            .alias("n_estimate")
        )
        .select(F.coalesce(F.col("n_estimate"), F.lit(0)).cast("bigint").alias("n_estimate"))
    )


def kmv_intersection_sql(
    a_rel: str, b_rel: str, value_expr: str, k: int = 256, seed: int = 9
) -> str:
    """DuckDB twin of :func:`kmv_intersection`."""
    from ..functions import hashing

    h = hashing.stable_hash32_sql(value_expr, seed)
    m = "4294967296.0"
    return f"""
WITH sa AS (SELECT DISTINCT {h} AS _h FROM {a_rel} ORDER BY _h LIMIT {k}),
sb AS (SELECT DISTINCT {h} AS _h FROM {b_rel} ORDER BY _h LIMIT {k}),
ta AS (SELECT CASE WHEN count(*) < {k} THEN {m} ELSE max(_h)::DOUBLE END AS _ta FROM sa),
tb AS (SELECT CASE WHEN count(*) < {k} THEN {m} ELSE max(_h)::DOUBLE END AS _tb FROM sb),
mt AS (
  SELECT sa._h, least(ta._ta, tb._tb) AS _t
  FROM sa JOIN sb USING (_h) CROSS JOIN ta CROSS JOIN tb
)
SELECT coalesce(
  floor(sum(CASE WHEN _h < _t THEN 1 ELSE 0 END) * {m} / min(_t) + 0.5)::BIGINT,
  0)::BIGINT AS n_estimate
FROM mt
"""


# ---------------------------------------------------------------------------
# 2-D skyline (Pareto front) — the classic OLAP dominance operator
# ("Integration of Skyline Queries into Spark SQL", EDBT 2023, is the
# retrieved-paper anchor; the operator itself is Börzsönyi et al.,
# ICDE 2001). A row survives iff no other row is at least as good on
# BOTH axes and strictly better on one.


def skyline_2d(
    df: DataFrame,
    max_col: str,
    min_col: str,
) -> DataFrame:
    """Rows on the Pareto front of (maximize ``max_col``, minimize
    ``min_col``), duplicates of a front point included.

    Not a nested-loop dominance test: group to the per-``max_col``
    best ``min_col`` (one keyed aggregation), sweep that tiny frame
    once with a running-min window ordered by ``max_col`` descending
    (a front point must beat every strictly-better-``max_col`` group's
    best), and semi-join the corpus back on the surviving (max, min)
    pairs. The window frame has one row per DISTINCT ``max_col`` value
    — bounded by the value domain (scores are 4dp-rounded here), not
    the corpus, so the single-partition sweep is safe at any scale.
    """
    per = df.groupBy(F.col(max_col).alias("_q")).agg(
        F.min(F.col(min_col)).alias("_ml")
    )
    w = Window.orderBy(F.col("_q").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    front = (
        per.withColumn("_rm", F.min("_ml").over(w))
        .filter(F.col("_rm").isNull() | (F.col("_ml") < F.col("_rm")))
        .select(F.col("_q").alias(max_col), F.col("_ml").alias(min_col))
    )
    return df.join(front, [max_col, min_col], "left_semi")


def gini_of_counts(
    counts: DataFrame,
    key_col: str,
    count_col: str,
) -> DataFrame:
    """1-row (n_keys, total, gini) Gini coefficient of an integer count
    distribution — the imbalance statistic for "how concentrated is the
    corpus/traffic across domains/keys" (0 = perfectly even, ->1 = one
    key owns everything).

    Exact formula over the ascending-sorted counts:
    G = (2 * sum(i * x_i)) / (n * sum(x)) - (n + 1) / n, with i the
    1-based rank. Every product is integer (rank x count) carried in
    decimal(38,0) — matching DuckDB's BIGINT-sum-promotes-to-HUGEINT
    semantics rather than Spark's silently-wrapping int64 — so the only
    float step is the final division, engine-exact at any scale.

    Scale shape: one rank window over the keys frame (keys, not rows)
    + one reduction. Tie-break on the key keeps ranks deterministic;
    Gini itself is invariant to the order within a tie group (equal
    counts contribute rank-sum-invariant terms).
    """
    from ..functions.rounding import stable_round

    w = Window.orderBy(F.col(count_col).asc(), F.col(key_col).asc())
    ranked = counts.withColumn("_i", F.row_number().over(w))
    n = F.count(F.lit(1))
    tot = F.sum(F.col(count_col).cast("decimal(38,0)"))
    # decimal(38,0) products: DuckDB's sum over BIGINT promotes to
    # HUGEINT while Spark's int64 sum wraps silently in non-ANSI mode —
    # the decimal lane keeps both engines exact once rank*count or
    # n_keys*total exceeds int64 (same trick as apportion_budget)
    sum_ic = F.sum(F.col("_i").cast("decimal(38,0)") * F.col(count_col))
    return ranked.agg(
        n.cast("bigint").alias("n_keys"),
        tot.cast("bigint").alias("total"),
        stable_round(
            (F.lit(2.0) * sum_ic.cast("double"))
            / (n.cast("decimal(38,0)") * tot).cast("double")
            - (n + 1) / n.cast("double"),
            6,
        ).alias("gini"),
    )


def gini_of_counts_sql(counts_rel: str, key_expr: str, count_expr: str) -> str:
    """DuckDB twin of :func:`gini_of_counts`; ``counts_rel`` exposes
    one row per key."""
    from ..functions.rounding import stable_round_sql

    return f"""
WITH ranked AS (
  SELECT {count_expr} AS _c,
         row_number() OVER (ORDER BY {count_expr} ASC, {key_expr} ASC) AS _i
  FROM {counts_rel}
)
SELECT count(*)::BIGINT AS n_keys,
       sum(_c)::BIGINT AS total,
       {stable_round_sql(
           "(2.0 * sum(_i * _c)) / (count(*) * sum(_c))"
           " - (count(*) + 1) / count(*)::DOUBLE", 6
       )} AS gini
FROM ranked
"""


def count_min_table(
    tok: DataFrame,
    token_col: str = "_tok",
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Count-Min sketch as a (row, bucket, n) TABLE (Cormode &
    Muthukrishnan 2005): ``depth`` md5-seeded hash rows x ``width``
    buckets, each cell the exact count of tokens hashing into it.

    Cell values are SUMS of per-token indicators, so the sketch is
    mergeable (shard sketches add cell-wise), partitioning-independent,
    and engine-exact — unlike Misra-Gries, whose merge depends on
    arrival order. Point estimate for a token = min over rows of its
    bucket's count; the classic one-sided guarantee (estimate >= true,
    overestimate bounded by collisions) holds by construction.

    Scale shape: one token explode x depth (a generate, not a join),
    one (row, bucket) hash aggregation — depth*width cells total, a
    broadcastable few-KB frame at ANY corpus size.
    """
    from ..functions import hashing

    # per-row seed goes into the hash salt (seed=i); the union of the
    # depth projections is a generate over the same scan, not a join
    out = None
    for i in range(depth):
        part = tok.select(
            F.lit(i).alias("cms_row"),
            (hashing.stable_hash32(F.col(token_col), seed=i) % width).alias(
                "bucket"
            ),
        )
        out = part if out is None else out.unionByName(part)
    return out.groupBy("cms_row", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


def count_min_table_sql(
    tok_rel: str, token_expr: str, depth: int = 4, width: int = 64
) -> str:
    """DuckDB twin of :func:`count_min_table` (same seeded hashes)."""
    from ..functions import hashing

    parts = [
        f"SELECT {i} AS cms_row, ({hashing.stable_hash32_sql(token_expr, seed=i)}) % {width} AS bucket FROM {tok_rel}"
        for i in range(depth)
    ]
    union = " UNION ALL ".join(parts)
    return f"SELECT cms_row, bucket, count(*)::BIGINT AS n FROM ({union}) GROUP BY 1, 2"
