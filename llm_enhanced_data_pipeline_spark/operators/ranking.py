"""Distributed global ranking and balanced shard packing.

``row_number() OVER (ORDER BY ...)`` with no partition spec moves
every row to ONE task — the exact defect class the plan sweep
(tests/test_plans.py) exists to catch. But a training-data pipeline
genuinely needs global ranks: balanced output shards for dataloaders,
exact percentile listings, deterministic curriculum ordering. This
module provides the scale-safe construction:

1. **Range-bucket** rows by a pure function of the order metric —
   approximate quantile boundaries (any boundary set works; accuracy
   affects only balance, never correctness), collected once to the
   driver (B-1 scalars) and inlined as a literal so every lineage
   sees the SAME bucketing.
2. **Offset** each bucket by the total count of rows in all lower
   buckets — a B-row keyed count aggregate whose prefix sums are
   folded on the driver and inlined as a literal map; no window, no
   single-partition sort, no shared nondeterministic subplan.
3. **Rank within buckets** with a PARTITIONED row_number window, and
   add the literal offset.

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
    """``df`` + ``rank_col`` = exact 1-based global rank with
    **row_number semantics** by ``(metric, id)`` — ties receive
    DISTINCT consecutive ranks via the id ascending tie-break (this is
    NOT dense_rank) — without an unpartitioned window.

    ``metric_col`` must be **numeric** (the boundary probe is a
    percentile_approx sketch, and ``descending`` negates the metric)
    and **non-null**: a NULL probe buckets to 0 and
    Spark's window sorts NULLS FIRST, whereas ANSI engines (and the
    :func:`global_rank_sql` oracle) default to NULLS LAST on ASC —
    filter or coalesce nulls before calling.

    Correctness does not depend on the quantile sketch: boundaries
    only choose WHERE the bucket seams fall. Rows with equal metric
    values always land in the same bucket (the bucket index is a pure
    function of the metric), so within-bucket ranks + lower-bucket
    counts reproduce the global order exactly. The boundary array and
    the bucket-count prefix sums are collected to the driver and
    inlined as literals — one pinned evaluation each — so every
    downstream lineage sees the SAME bucketing (a lazily shared
    percentile_approx frame would not guarantee that: GK-sketch merge
    follows shuffle-fetch order and can differ across re-evaluations).
    """
    m = F.col(metric_col)
    probed = df.withColumn("_gr_probe", (-m) if descending else m)
    # 1) boundary set: B-1 approximate quantiles of the probe metric,
    #    PINNED to one evaluation by collecting to the driver and
    #    inlining as a literal array. percentile_approx is a GK sketch
    #    whose merge order follows nondeterministic shuffle-fetch
    #    order: a lazily shared boundary frame feeding several
    #    lineages (offsets AND the rank branch) could be re-evaluated
    #    per lineage and — past the accuracy budget — return
    #    DIFFERENT arrays, so offsets would be computed against a
    #    different bucketing than the within-bucket ranks. The frame
    #    is tiny by construction (B-1 scalars), so the collect is a
    #    driver-side constant fold, not a driver-side loop.
    qs = [i / buckets for i in range(1, buckets)]
    fold = probed.agg(
        F.percentile_approx(
            "_gr_probe", F.array(*[F.lit(q) for q in qs]), F.lit(10_000)
        ).alias("b"),
        F.count(F.lit(1)).alias("n"),
        F.count("_gr_probe").alias("n_nonnull"),
    ).first()
    bounds = fold["b"] or []
    # percentile_approx returns NULL both for an empty frame and for a
    # non-empty frame whose metric is ALL NULL. The second case must
    # not fall through to the single-partition window this module
    # exists to avoid (and its NULLS-FIRST order diverges from the
    # NULLS-LAST oracle) — the non-null contract is the caller's to
    # meet, so violating it raises.
    if fold["n"] > 0 and fold["n_nonnull"] == 0:
        raise ValueError(
            f"global_rank: metric column {metric_col!r} is NULL in "
            f"all {fold['n']} rows; filter or coalesce nulls first"
        )
    if not bounds:
        # truly empty input (or buckets=1, the degenerate all-in-one
        # bucket): rank the nothing / the one bucket (schema-stable)
        w0 = Window.partitionBy(F.lit(0)).orderBy(
            F.col("_gr_probe").asc(), F.col(id_col).asc()
        )
        return probed.withColumn(
            rank_col, F.row_number().over(w0).cast("bigint")
        ).drop("_gr_probe")
    blit = F.array(*[F.lit(x) for x in bounds])
    # 2) bucket index = #boundaries strictly below the probe (pure
    #    function of the metric -> ties can never straddle a seam)
    with_bkt = probed.withColumn(
        "_gr_bkt", F.size(F.filter(blit, lambda x: x < F.col("_gr_probe")))
    )
    # 3) lower-bucket offsets: with the boundaries now literal, the
    #    bucket counts are a deterministic B-row aggregate — fold them
    #    on the driver too (one keyed-shuffle pass) and inline the
    #    prefix sums as a literal map; this also removes the former
    #    counts⋈counts triangle join (two extra corpus scans).
    cnt_rows = with_bkt.groupBy("_gr_bkt").agg(
        F.count(F.lit(1)).alias("n")
    ).collect()
    cnts = {r["_gr_bkt"]: r["n"] for r in cnt_rows}
    offs: dict[int, int] = {}
    running = 0
    for bkt in sorted(cnts):
        offs[bkt] = running
        running += cnts[bkt]
    off_map = F.create_map(
        *[F.lit(v) for kv in sorted(offs.items()) for v in kv]
    )
    # 4) partitioned rank + literal offset
    w = Window.partitionBy("_gr_bkt").orderBy(
        F.col("_gr_probe").asc(), F.col(id_col).asc()
    )
    return (
        with_bkt.withColumn(
            rank_col,
            (
                F.coalesce(
                    F.element_at(off_map, F.col("_gr_bkt")), F.lit(0)
                )
                + F.row_number().over(w)
            ).cast("bigint"),
        )
        .drop("_gr_probe", "_gr_bkt")
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
