"""Skew-handling operators (100 TB posture).

AQE already splits skewed SHUFFLE JOIN partitions at runtime; what it
cannot fix is a hash AGGREGATE whose hot key funnels into one task.
`salted_agg` is the classic two-stage rewrite: aggregate on
(keys, salt) first — spreading each hot key over `salt_buckets` tasks —
then combine the partials. Works for any algebraic aggregate expressed
as (partial_exprs, final_exprs).

Salting here may use Spark's native `rand`/`hash` — the salt never
reaches results, so engine-stable hashing is not required (contrast
functions/hashing.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_sum_count_agg(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-stage skew-safe groupBy: per-key `sum(col)` for every column
    in ``sum_cols`` plus ``n`` (count). Equivalent to the direct
    ``df.groupBy(keys).agg(...)`` but each hot key is first reduced by
    ``salt_buckets`` parallel tasks."""
    salted = df.withColumn(SALT_COL, (F.rand() * salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, SALT_COL).agg(
        F.count(F.lit(1)).alias("_pn"),
        *[F.sum(c).alias(f"_ps_{c}") for c in sum_cols],
    )
    return partial.groupBy(*keys).agg(
        F.sum("_pn").alias("n"),
        *[F.sum(f"_ps_{c}").alias(f"sum_{c}") for c in sum_cols],
    )


def salted_join_left(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Manual skew-join salting for engines/paths without AQE: the big
    side gets a random salt, the small side is exploded across every
    salt value, and the join key becomes (key, salt). Row multiplicity
    is unchanged (each big row matches exactly one replicated small
    row)."""
    big_salted = big.withColumn(SALT_COL, (F.rand() * salt_buckets).cast("int"))
    small_exploded = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return big_salted.join(small_exploded, [key, SALT_COL], "left").drop(SALT_COL)


def skew_report(
    df: DataFrame,
    keys: Sequence[str],
    top_n: int = 5,
    target_rows_per_task: int = 1_000_000,
) -> DataFrame:
    """Join/agg-key skew diagnosis: the operational report a pipeline
    runs BEFORE shuffling 100 TB on a key. Per key group: row count,
    share of the table, rank by weight, and the salt factor that would
    bring the heaviest key back to ``target_rows_per_task`` rows per
    task (1 = no salting needed). Two hash aggs + one tiny window over
    the top-N frame — the diagnosis itself is skew-proof because the
    per-key agg is map-side combined.
    """
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(
        F.sum("n_rows").alias("_total"), F.count(F.lit(1)).alias("_n_keys")
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n_rows").desc(), *[F.col(k).asc() for k in keys])
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select(
            *keys,
            "rank",
            "n_rows",
            F.round(F.col("n_rows") / F.col("_total"), 6).alias("share"),
            F.round(F.col("n_rows") / (F.col("_total") / F.col("_n_keys")), 4).alias(
                "vs_mean"
            ),
            F.greatest(
                F.lit(1),
                F.ceil(F.col("n_rows") / target_rows_per_task).cast("int"),
            ).alias("salt_factor"),
        )
    )
