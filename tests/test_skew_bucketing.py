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
