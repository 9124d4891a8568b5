"""Operator-level unit tests (frames built inline, no oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F




def test_global_rank_matches_window_and_handles_edges(spark):
    """ranking.global_rank == single-partition row_number on heavy-tie
    and tiny frames, ascending and descending, extreme bucket counts
    (1 bucket = degenerate all-in-one; 64 buckets over 10 rows = most
    buckets empty). pack_shards_lpt deals ranks round-robin."""
    from pyspark.sql import Row, Window

    from llm_enhanced_data_pipeline_spark.operators import ranking

    rows = [Row(id=i, m=[5, 1, 5, 3, 1, 5, 2, 3, 5, 1][i]) for i in range(10)]
    df = spark.createDataFrame(rows)

    for desc in (False, True):
        w = Window.orderBy(
            F.col("m").desc() if desc else F.col("m").asc(), F.col("id").asc()
        )
        want = {
            (r.id, r.rank)
            for r in df.select("id", F.row_number().over(w).alias("rank")).collect()
        }
        for buckets in (1, 4, 64):
            got = {
                (r.id, r.rank)
                for r in ranking.global_rank(
                    df, "m", "id", descending=desc, buckets=buckets
                ).collect()
            }
            assert got == want, (desc, buckets)

    packed = ranking.pack_shards_lpt(df, "m", "id", n_shards=3)
    by_id = {r.id: r.shard for r in packed.collect()}
    # rank desc by (m desc, id asc): ids 0,2,5,8 (m=5), 3,7 (m=3), 6
    # (m=2), 1,4,9 (m=1) -> shards cycle 0,1,2,...
    order = [0, 2, 5, 8, 3, 7, 6, 1, 4, 9]
    for pos, i in enumerate(order):
        assert by_id[i] == pos % 3, (i, by_id[i])

    # the construction must not plan an unpartitioned window
    plan = (
        ranking.global_rank(df, "m", "id")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "windowspecdefinition(m" not in plan  # partitioned by bucket only
    # r8 ADVICE-high regression pin: the boundary sketch and the offset
    # counts must be DRIVER-FOLDED LITERALS in the returned plan — a
    # lazily shared percentile_approx frame feeding multiple lineages
    # can be re-evaluated with different GK merge orders past the
    # accuracy budget, silently forking the bucketing between offsets
    # and ranks. No sketch and no join may survive into the plan.
    assert "percentile_approx" not in plan
    assert "Join" not in plan


def test_global_rank_all_null_metric_raises(spark):
    """r9 ADVICE: a non-empty frame whose metric is ALL NULL must raise
    (percentile_approx returns NULL there too, and silently falling
    back to the single-partition lit(0) window both defeats the module
    and diverges from the oracle's NULLS-LAST order). Empty input and
    the degenerate buckets=1 path still return schema-stable frames."""
    import pytest
    from pyspark.sql import Row

    from llm_enhanced_data_pipeline_spark.operators import ranking

    all_null = spark.createDataFrame(
        [Row(id=i, m=None) for i in range(4)], "id int, m double"
    )
    with pytest.raises(ValueError, match="NULL in all 4 rows"):
        ranking.global_rank(all_null, "m", "id")
    # all-NULL raises for ANY bucket count, including the degenerate 1
    with pytest.raises(ValueError, match="NULL"):
        ranking.global_rank(all_null, "m", "id", buckets=1)
    # truly empty input: no raise, schema-stable empty result
    empty = all_null.filter("id < 0")
    out = ranking.global_rank(empty, "m", "id")
    assert out.count() == 0 and "rank" in out.columns


def test_zorder_key_matches_hand_morton(spark):
    from llm_enhanced_data_pipeline_spark.operators import layout

    cases = [(3, 5), (15, 15), (0, 1), (1023, 0), (512, 511)]

    def morton(x, y, bits=10):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return z

    df = spark.createDataFrame(cases, "x bigint, y bigint")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y",
            layout.zorder_key([F.col("x"), F.col("y")], bits=10).alias("z"),
        ).collect()
    }
    for x, y in cases:
        assert got[(x, y)] == morton(x, y), (x, y)


def test_zorder_key_rejects_int64_overflow():
    import pytest as _pytest

    from llm_enhanced_data_pipeline_spark.operators import layout

    with _pytest.raises(ValueError):
        layout.zorder_key([None, None, None], bits=21)
    with _pytest.raises(ValueError):
        layout.zorder_key_sql(["a", "b"], bits=32)


def test_zorder_layout_beats_scatter_and_balances_dims(spark, sf_dir):
    # the point of the report: z-order keeps BOTH dims' spans small,
    # the single-column sort forfeits the other dim, scatter forfeits
    # both — pin the ordering so the gate can't pass vacuously
    from llm_enhanced_data_pipeline_spark.queries import REGISTRY

    rows = {
        r["layout"]: r
        for r in REGISTRY["zorder_layout_report"].fn(spark, sf_dir).collect()
    }
    z, sx, sc = rows["zorder"], rows["sort_x"], rows["scatter"]
    assert z["span_total"] < sc["span_total"]      # beats do-nothing
    assert z["span_total"] < sx["span_total"]      # beats 1-D sort overall
    assert sx["span_x"] <= z["span_x"]             # 1-D sort wins its dim
    assert z["span_y"] < sx["span_y"]              # ...and forfeits the other
