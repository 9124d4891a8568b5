"""Z-order pruning PROOF against the real Parquet reader (r12 verdict
item 2): `zorder_layout_report` scores layouts by per-bucket min/max
span sums — the PROXY for pruning. This test writes the three layouts
to actual Parquet, reads them back under per-dimension predicates, and
asserts from the scan node's own metrics (numOutputRows after
row-group/page pruning by the pushed min/max filters) that the proxy's
claim holds on disk: Z-order prunes on BOTH dimensions, the
single-column sort prunes only its own, the scatter prunes neither.

Dims here are (l_partkey % 1024, l_orderkey % 1024) rather than the
report gate's (l_partkey, l_suppkey) grid: supplier cardinality
collapses at small scale factors (100 suppliers at sf0.01 -> the y
dimension occupies <1/8 of the grid and every Morton bucket covers all
of it), while orderkey stays wide at every SF. The claim structure is
identical.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from llm_enhanced_data_pipeline_spark.operators import layout
from llm_enhanced_data_pipeline_spark.tables import load_table

_BITS = 10


@pytest.fixture(scope="module")
def layouts(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("layouts")
    li = load_table(spark, "lineitem", sf_dir).select(
        (F.col("l_partkey") % 1024).cast("bigint").alias("x"),
        (F.col("l_orderkey") % 1024).cast("bigint").alias("y"),
        "l_orderkey",
    )
    zkey = layout.zorder_key([F.col("x"), F.col("y")], bits=_BITS)
    buckets = {
        # top 6 Morton bits: 64 aligned 128x128 boxes
        "zorder": F.shiftright(zkey, 2 * _BITS - 6),
        # 64 x-ranges of width 16: wins dim x, forfeits dim y
        "sort_x": F.shiftright(F.col("x"), 4),
        # 64 pseudo-random buckets: forfeits both
        "scatter": F.abs(F.xxhash64("l_orderkey")) % 64,
    }
    paths = {}
    for name, bucket in buckets.items():
        paths[name] = str(base / name)
        layout.write_clustered(li, paths[name], bucket)
    return paths, li.count()


def _scanned(spark, paths, predicate):
    return {
        name: layout.scan_pruning_stats(spark, path, predicate)[
            "numOutputRows"
        ]
        for name, path in paths.items()
    }


def test_all_layouts_return_identical_matching_rows(spark, layouts):
    paths, _ = layouts
    pred = "x >= 128 AND x < 192 AND y >= 640 AND y < 704"
    counts = {
        name: spark.read.parquet(p).filter(pred).count()
        for name, p in paths.items()
    }
    assert len(set(counts.values())) == 1, counts


def test_zorder_prunes_the_dimension_sort_x_forfeits(spark, layouts):
    """Predicate on y (1/16 selectivity): Z-order materializes only
    the buckets whose y-box overlaps (<= 1/4 of rows, ideally 1/8);
    the x-sorted layout's files all span the full y domain and prune
    nothing; so does the scatter."""
    paths, total = layouts
    rows = _scanned(spark, paths, "y >= 128 AND y < 192")
    assert rows["zorder"] <= total // 4, rows
    assert rows["sort_x"] > total * 9 // 10, rows
    assert rows["scatter"] > total * 9 // 10, rows
    assert 3 * rows["zorder"] < rows["sort_x"], rows


def test_sort_wins_its_own_dimension_zorder_stays_close(spark, layouts):
    """Predicate on x: the x-sorted layout prunes best (width-16
    buckets), Z-order still prunes to its 128-wide boxes (<= 1/4 of
    rows), the scatter reads everything."""
    paths, total = layouts
    rows = _scanned(spark, paths, "x >= 128 AND x < 192")
    assert rows["sort_x"] <= rows["zorder"], rows
    assert rows["zorder"] <= total // 4, rows
    assert rows["scatter"] > total * 9 // 10, rows
    assert 3 * rows["zorder"] < rows["scatter"], rows


def test_zorder_beats_sort_x_on_a_two_dim_box(spark, layouts):
    """Box predicate on both dims: Z-order narrows to ~one box; the
    x-sort can only narrow on x and drags the full y extent along."""
    paths, total = layouts
    rows = _scanned(
        spark, paths, "x >= 128 AND x < 192 AND y >= 640 AND y < 704"
    )
    assert rows["zorder"] < rows["sort_x"], rows
    assert 3 * rows["zorder"] < rows["scatter"], rows


def test_span_proxy_ordering_matches_measured_pruning(spark, layouts):
    """Closure with the registered report: layout_report's span-sum
    PROXY must rank the three layouts in the same order as the rows
    the real reader materialized (summed over one predicate per
    dimension) — the proxy is only worth publishing if it predicts
    the reader."""
    paths, _ = layouts
    li = spark.read.parquet(paths["scatter"]).select("x", "y", "l_orderkey")
    zkey = layout.zorder_key([F.col("x"), F.col("y")], bits=_BITS)
    proxy = {}
    for name, bucket in {
        "zorder": F.shiftright(zkey, 2 * _BITS - 6),
        "sort_x": F.shiftright(F.col("x"), 4),
        "scatter": F.abs(F.xxhash64("l_orderkey")) % 64,
    }.items():
        proxy[name] = layout.layout_report(li, ["x", "y"], bucket, name).collect()[
            0
        ]["span_total"]
    measured = {
        name: _scanned(spark, {name: paths[name]}, "y >= 128 AND y < 192")[name]
        + _scanned(spark, {name: paths[name]}, "x >= 128 AND x < 192")[name]
        for name in paths
    }
    proxy_order = sorted(proxy, key=proxy.get)
    measured_order = sorted(measured, key=measured.get)
    assert proxy_order == measured_order == ["zorder", "sort_x", "scatter"], (
        proxy,
        measured,
    )
