"""Join operators (SURVEY.md §2.4).

Reference parity:
- J1/J2 N-way left-outer enrichment join with defaults
  (Data_Enhancement/bulid_final_dataset.py:145-333,
   build_simple_dataset.py:149-250 — dict-probe hash joins)
- J3 checkpoint anti-join (enhance_fields_of_study.py:347-356)

Scale: enrichment sides are slim (paper_id + one payload column), so
they broadcast when under the threshold; otherwise AQE picks a shuffled
hash join on the shared key — one shuffle, reused across the chained
joins because every join keys on the same column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def enrichment_join(
    base: DataFrame,
    sides: dict[str, tuple[DataFrame, dict[str, Column]]],
    key: str,
    broadcast_sides: bool = True,
) -> DataFrame:
    """LEFT JOIN each enrichment side on ``key``; fill missing payloads.

    ``sides`` maps a label to (df, defaults) where defaults maps payload
    column → default expression used when the side has no match
    (bulid_final_dataset.py's `.get(pid)`-with-default probes).
    """
    out = base
    for _label, (side, defaults) in sides.items():
        side_df = F.broadcast(side) if broadcast_sides else side
        out = out.join(side_df, key, "left")
        for col_name, default in defaults.items():
            out = out.withColumn(col_name, F.coalesce(F.col(col_name), default))
    return out


def checkpoint_anti_join(todo: DataFrame, done: DataFrame, key: str) -> DataFrame:
    """Rows of ``todo`` whose key is absent from ``done`` (resume)."""
    return todo.join(done.select(key).distinct(), key, "left_anti")


def semi_join(df: DataFrame, other: DataFrame, key: str) -> DataFrame:
    return df.join(other.select(key).distinct(), key, "left_semi")
