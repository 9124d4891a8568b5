"""Skew-handling and bucketing: salted aggregation equals the direct
aggregate; bucketed tables join without an exchange on the bucket key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from llm_enhanced_data_pipeline_spark.operators import skew
from llm_enhanced_data_pipeline_spark.tables import load_table


def test_salted_agg_equals_direct(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    direct = {
        r.l_returnflag: (r.n, round(r.s, 2))
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s"))
        .collect()
    }
    salted = {
        r.l_returnflag: (r.n, round(r.sum_l_quantity, 2))
        for r in skew.salted_sum_count_agg(
            li, ["l_returnflag"], ["l_quantity"], salt_buckets=16
        ).collect()
    }
    assert direct == salted


def test_salted_join_preserves_multiplicity(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir).limit(2000)
    nation_sized = load_table(spark, "customer", sf_dir).select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    direct = orders.join(nation_sized, "o_custkey", "left").count()
    salted = skew.salted_join_left(orders, nation_sized, "o_custkey").count()
    assert direct == salted == 2000


def test_bucketed_join_avoids_exchange(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, "orders", sf_dir)
        li = load_table(spark, "lineitem", sf_dir)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
         .mode("overwrite").saveAsTable("b_orders"))
        (li.withColumnRenamed("l_orderkey", "o_orderkey")
         .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
         .mode("overwrite").saveAsTable("b_lineitem"))
        joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located bucketed join: no shuffle exchange on either side
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_skew_report_and_salting_on_zipf_fixture(spark):
    """Proof on an ACTUALLY skewed fixture (the synthetic tables are
    near-uniform, so this had only ever run on benign keys): one hot
    user owns 30% of events. skew_report must rank it first and
    recommend a >1 salt factor sized by target_rows_per_task, and
    salting must balance the shuffle: the max reduce-task input for the
    salted (key, salt) distribution is a fraction of the direct
    by-key distribution, whose hot task swallows the whole hot key.
    Task-size balance is the 100 TB-relevant metric — local[32] wall
    time hides stragglers."""
    n = 200_000
    ev = spark.range(n).select(
        F.col("id").alias("event_id"),
        # 30% of rows -> user 0; the rest spread over 997 cold users
        F.when(F.col("id") % 10 < 3, F.lit(0))
        .otherwise(1 + F.col("id") % 997)
        .alias("user_id"),
        (F.col("id") % 100).cast("double").alias("value"),
    )

    report = skew.skew_report(
        ev, ["user_id"], top_n=3, target_rows_per_task=5_000
    ).collect()
    top = report[0]
    assert top.user_id == 0 and top.rank == 1
    assert abs(top.share - 0.30) < 0.005
    # 60k-row hot key at 5k rows/task -> salt factor 12; cold keys need none
    assert top.salt_factor == 12
    assert all(r.salt_factor == 1 for r in report[1:])

    # distribution proof: reproduce each plan's shuffle with an explicit
    # hash repartition and measure per-partition input rows
    def max_partition_rows(df, cols):
        sizes = (
            df.repartition(32, *cols)
            .withColumn("_pid", F.spark_partition_id())
            .groupBy("_pid")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        return max(r.n for r in sizes)

    direct_max = max_partition_rows(ev, [F.col("user_id")])
    salted = ev.withColumn(
        "_salt", (F.rand(seed=7) * 32).cast("int")
    )
    salted_max = max_partition_rows(salted, [F.col("user_id"), F.col("_salt")])
    assert direct_max >= 60_000  # the hot key lands whole on one task
    assert salted_max < direct_max / 4  # salting actually spread it

    # and the salted aggregate still equals the direct one on this fixture
    direct = {
        r.user_id: (r.n, round(r.s, 6))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    two_stage = {
        r.user_id: (r.n, round(r.sum_value, 6))
        for r in skew.salted_sum_count_agg(
            ev, ["user_id"], ["value"], salt_buckets=32
        ).collect()
    }
    assert direct == two_stage
