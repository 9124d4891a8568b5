"""Distributed global ranking and balanced shard packing.

``row_number() OVER (ORDER BY ...)`` with no partition spec moves
every row to ONE task — the exact defect class the plan sweep
(tests/test_plans.py) exists to catch. But a training-data pipeline
genuinely needs global ranks: balanced output shards for dataloaders,
exact percentile listings, deterministic curriculum ordering. This
module provides the scale-safe construction:

1. **Range-bucket** rows by a pure function of the order metric —
   approximate quantile boundaries (any boundary set works; accuracy
   affects only balance, never correctness) broadcast as one row.
2. **Offset** each bucket by the total count of rows in all lower
   buckets — a B-row triangle aggregation (B is a constant), no
   window, no single-partition sort.
3. **Rank within buckets** with a PARTITIONED row_number window, and
   add the broadcast offset.

The result is bit-identical to the single-partition
``row_number() OVER (ORDER BY metric, id)`` (ties share a bucket
because bucketing depends on the metric alone), but every stage is a
keyed shuffle or a broadcast — nothing ever single-partition-sorts
the corpus.

Reference anchor: the reference materializes its corpus with plain
pandas sorts (Data_Analysis notebooks); this is the 100 TB-shaped
equivalent of "sort the corpus once and deal it out".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: default number of range buckets — parallelism of the rank stage.
#: Raise toward ~2-4x the cluster's task slots at real scale; balance
#: (not correctness) is the only thing at stake.
DEFAULT_BUCKETS = 32


def global_rank(
    df: DataFrame,
    metric_col: str,
    id_col: str,
    rank_col: str = "rank",
    descending: bool = False,
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """``df`` + ``rank_col`` = exact dense 1-based global rank by
    ``(metric, id)`` (id ascending as the deterministic tie-break),
    without an unpartitioned window.

    Correctness does not depend on the quantile sketch: boundaries
    only choose WHERE the bucket seams fall. Rows with equal metric
    values always land in the same bucket (the bucket index is a pure
    function of the metric), so within-bucket ranks + lower-bucket
    counts reproduce the global order exactly.
    """
    m = F.col(metric_col)
    probed = df.withColumn("_gr_probe", (-m) if descending else m)
    # 1) boundary row: B-1 approximate quantiles of the probe metric
    qs = [i / buckets for i in range(1, buckets)]
    b = probed.agg(
        F.percentile_approx(
            "_gr_probe", F.array(*[F.lit(q) for q in qs]), F.lit(10_000)
        ).alias("_gr_bounds")
    )
    # 2) bucket index = #boundaries strictly below the probe (pure
    #    function of the metric -> ties can never straddle a seam)
    with_bkt = probed.crossJoin(F.broadcast(b)).withColumn(
        "_gr_bkt",
        F.size(F.filter(F.col("_gr_bounds"), lambda x: x < F.col("_gr_probe"))),
    )
    # 3) lower-bucket offsets via a B-row triangle aggregation — no
    #    window over the (tiny but technically unpartitioned) frame
    counts = with_bkt.groupBy("_gr_bkt").agg(F.count(F.lit(1)).alias("_gr_n"))
    lower = counts.alias("lo").join(
        counts.alias("hi"),
        F.col("lo._gr_bkt") < F.col("hi._gr_bkt"),
        "inner",
    )
    offsets = (
        lower.groupBy(F.col("hi._gr_bkt").alias("_gr_bkt"))
        .agg(F.sum(F.col("lo._gr_n")).alias("_gr_off"))
    )
    # 4) partitioned rank + broadcast offset
    w = Window.partitionBy("_gr_bkt").orderBy(
        F.col("_gr_probe").asc(), F.col(id_col).asc()
    )
    return (
        with_bkt.join(F.broadcast(offsets), "_gr_bkt", "left")
        .withColumn(
            rank_col,
            (
                F.coalesce(F.col("_gr_off"), F.lit(0))
                + F.row_number().over(w)
            ).cast("bigint"),
        )
        .drop("_gr_probe", "_gr_bounds", "_gr_bkt", "_gr_off")
    )


def pack_shards_lpt(
    df: DataFrame,
    size_col: str,
    id_col: str,
    n_shards: int,
    shard_col: str = "shard",
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Balanced shard assignment: the round-robin LPT heuristic
    (longest processing time first) — rank items by size DESCENDING,
    deal rank r to shard ``(r-1) mod n_shards``. The classic
    dataloader-shard balancer: biggest documents spread across shards
    first, the tail fills evenly; worst-case shard imbalance is
    bounded by one maximal item.

    Deterministic (rank tie-break on id), and scale-safe end to end:
    the only global coordination is :func:`global_rank`'s broadcast
    boundary/offset rows.
    """
    ranked = global_rank(
        df, size_col, id_col, rank_col="_ps_rank", descending=True, buckets=buckets
    )
    return ranked.withColumn(
        shard_col, ((F.col("_ps_rank") - 1) % n_shards).cast("bigint")
    ).drop("_ps_rank")


def global_rank_sql(
    metric_expr: str, id_expr: str, descending: bool = False
) -> str:
    """The oracle twin is the PLAIN global window — DuckDB can afford
    it; the point of the pair is proving the bucketed construction
    reproduces it exactly."""
    direction = "DESC" if descending else "ASC"
    return (
        f"row_number() OVER (ORDER BY ({metric_expr}) {direction},"
        f" ({id_expr}) ASC)"
    )
