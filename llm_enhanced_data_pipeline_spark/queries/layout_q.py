"""Data-layout clustering gates (operators/layout.py): Z-order keys
and the locality report that justifies them.

The gate compares THREE candidate layouts of the same lineitem
projection — Z-order on (part, supplier), single-column sort on part,
and orderkey scatter (the do-nothing layout) — by the number min/max
file pruning actually sees: per-bucket spans summed per dimension.
Z-order keeps both dims' spans small; the single-column sort wins its
own dim and loses the other; the scatter loses both. All integer bit
algebra, so the DuckDB twin matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import layout
from ..tables import load_table
from .registry import register

#: per-dimension quantization width (10 bits -> values in [0, 1024))
_BITS = 10
#: bucket count: top 6 bits of the 20-bit Morton key
_BUCKET_SHIFT = 2 * _BITS - 6

_DIMS_SQL = "(l_partkey % 1024) AS x, (l_suppkey % 1024) AS y, l_orderkey"
_Z_SQL = layout.zorder_key_sql(["x", "y"], bits=_BITS)


def _layout_sql(bucket_expr: str, label: str) -> str:
    return f"""
SELECT '{label}' AS layout, count(*)::BIGINT AS n_buckets,
       sum(sx)::BIGINT AS span_x, sum(sy)::BIGINT AS span_y,
       (sum(sx) + sum(sy))::BIGINT AS span_total
FROM (
  SELECT {bucket_expr} AS _b,
         max(x)::BIGINT - min(x)::BIGINT + 1 AS sx,
         max(y)::BIGINT - min(y)::BIGINT + 1 AS sy
  FROM pts GROUP BY 1
)"""


@register(
    "zorder_layout_report",
    doc="Z-order (Morton) layout evaluation — the Delta/Iceberg "
    "OPTIMIZE ZORDER BY recipe as an exact-integer report: lineitem "
    "quantized to a 1024x1024 (part, supplier) grid, bit-interleaved "
    "into a 20-bit Morton key (closed-form shift/mask sum, whole-"
    "stage codegen), bucketed by the key's top 6 bits, and each "
    "candidate layout scored by the per-bucket min/max SPAN summed "
    "per dimension — the quantity file-level min/max pruning reads. "
    "Z-order keeps BOTH dims' spans small; the single-column sort "
    "wins its dim and forfeits the other; orderkey scatter forfeits "
    "both. One projection + one hash aggregation per layout.",
    oracle=f"""
WITH pts AS (SELECT {_DIMS_SQL} FROM lineitem),
z AS ({_layout_sql(f"({_Z_SQL}) >> {_BUCKET_SHIFT}", "zorder")}),
sx AS ({_layout_sql("x >> 4", "sort_x")}),
sc AS ({_layout_sql("l_orderkey % 64", "scatter")})
SELECT * FROM z UNION ALL SELECT * FROM sx UNION ALL SELECT * FROM sc
""",
)
def zorder_layout_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).select(
        (F.col("l_partkey") % 1024).alias("x"),
        (F.col("l_suppkey") % 1024).alias("y"),
        "l_orderkey",
    )
    zkey = layout.zorder_key([F.col("x"), F.col("y")], bits=_BITS)
    dims = ["x", "y"]
    z = layout.layout_report(
        li, dims, F.shiftright(zkey, _BUCKET_SHIFT), "zorder"
    )
    sx = layout.layout_report(li, dims, F.shiftright(F.col("x"), 4), "sort_x")
    sc = layout.layout_report(li, dims, F.col("l_orderkey") % 64, "scatter")
    return z.unionByName(sx).unionByName(sc)


@register(
    "zorder_pruning_proof",
    oracle=None,  # rows-only: the measured quantity is the REAL
    # Parquet reader's scan-node numOutputRows after row-group/page
    # min/max pruning — a runtime metric DuckDB's reader cannot twin
    # (its pruning granularity differs); the relative claims are
    # pinned exactly in tests/test_layout_pruning.py.
    doc="The Z-order claim proven against the real reader: the three "
    "candidate layouts (bit-aligned Morton buckets, single-column "
    "sort, scatter) are WRITTEN to parquet (write_clustered: one unit "
    "per aligned bucket) and read back under a 1/16-selectivity "
    "predicate on each dimension; the report row per (layout, "
    "predicate) carries the rows the scan actually materialized after "
    "min/max pruning and the matching-row count. Z-order materializes "
    "~1/8 on either dim; sort_x only wins its own; scatter prunes "
    "nothing. Dims are (l_partkey % 1024, l_orderkey % 1024) — "
    "supplier cardinality collapses at small SFs.",
)
def zorder_pruning_proof(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    li = load_table(spark, "lineitem", sf_dir).select(
        (F.col("l_partkey") % 1024).cast("bigint").alias("x"),
        (F.col("l_orderkey") % 1024).cast("bigint").alias("y"),
        "l_orderkey",
    )
    zkey = layout.zorder_key([F.col("x"), F.col("y")], bits=_BITS)
    buckets = {
        "zorder": F.shiftright(zkey, 2 * _BITS - 6),
        "sort_x": F.shiftright(F.col("x"), 4),
        "scatter": F.abs(F.xxhash64("l_orderkey")) % 64,
    }
    base = tempfile.mkdtemp(prefix="zorder_proof_")
    try:
        for name, bucket in buckets.items():
            layout.write_clustered(li, f"{base}/{name}", bucket)
        rows = []
        for pred in ("x >= 128 AND x < 192", "y >= 128 AND y < 192"):
            for name in buckets:
                st = layout.scan_pruning_stats(spark, f"{base}/{name}", pred)
                matching = (
                    spark.read.parquet(f"{base}/{name}").filter(pred).count()
                )
                rows.append(
                    (
                        name,
                        pred,
                        int(st.get("numOutputRows", -1)),
                        int(st.get("numFiles", -1)),
                        int(matching),
                    )
                )
        return spark.createDataFrame(
            rows,
            "layout string, predicate string, rows_scanned bigint, "
            "n_files bigint, rows_matching bigint",
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
