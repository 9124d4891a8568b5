"""Relational queries: filters, joins, aggregates, top-k (SURVEY.md
§2.4 J1-J3, §2.5 A-family, §2.6 T-family) on the star-schema tables.

Plans to expect (verified via .explain): parquet scans with
PushedFilters + pruned ReadSchema, broadcast hash joins for the dim
tables, partial hash aggregation before every shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import joins
from ..tables import load_table
from .registry import register


@register(
    "q1_pricing_summary",
    bench=True,
    doc="A1/A2-shaped scan+aggregate (TPC-H Q1 pattern): partial hash agg, "
    "filter pushed to parquet.",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                   AS sum_qty,
       round(sum(l_extendedprice), 2)                              AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
       round(avg(l_quantity), 4)                                   AS avg_qty,
       round(avg(l_discount), 4)                                   AS avg_disc,
       count(*)                                                    AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '2001-09-01'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.filter(F.to_date("l_shipdate") <= F.lit("2001-09-01").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    bench=True,
    doc="3-way join + agg + top-k (TPC-H Q3 pattern); customer side "
    "broadcast, deterministic tie-break on orderkey.",
    oracle="""
SELECT o.o_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       CAST(o.o_orderdate AS DATE)::VARCHAR                  AS orderdate
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND CAST(o.o_orderdate AS DATE) < DATE '2000-03-15'
  AND CAST(l.l_shipdate AS DATE)  > DATE '2000-03-15'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o.o_orderkey ASC
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir).filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, "orders", sf_dir).filter(
        F.to_date("o_orderdate") < F.lit("2000-03-15").cast("date")
    )
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.to_date("l_shipdate") > F.lit("2000-03-15").cast("date")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "o_orderkey",
            "revenue",
            # ISO string, not DATE: keeps both engines' pandas dtypes
            # identical for the driver's value hash.
            F.date_format(F.to_date("o_orderdate"), "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@register(
    "q5_region_revenue",
    bench=True,
    doc="6-way join (TPC-H Q5 pattern): dims broadcast, one shuffle per "
    "fact co-group; revenue per nation within a region.",
    oracle="""
SELECT n.n_name AS nation,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
GROUP BY n.n_name
""",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(
        F.to_date("o_orderdate") >= F.lit("1996-01-01").cast("date")
    )
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "enrichment_join_5way",
    bench=True,
    doc="J1: base LEFT JOIN slim enrichment sides on one key with "
    "coalesce defaults (bulid_final_dataset.py:145-333 shape).",
    oracle="""
WITH ord AS (
  SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_spent
  FROM orders GROUP BY o_custkey
), ev AS (
  SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
)
SELECT c.c_custkey,
       coalesce(n.n_name, '')  AS nation,
       coalesce(r.r_name, '')  AS region,
       coalesce(o.n_orders, 0) AS n_orders,
       coalesce(o.total_spent, 0.0) AS total_spent,
       coalesce(e.n_events, 0) AS n_events
FROM customer c
LEFT JOIN ord o ON c.c_custkey = o.o_custkey
LEFT JOIN ev  e ON c.c_custkey = e.user_id
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
""",
)
def enrichment_join_5way(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = (
        load_table(spark, "orders", sf_dir)
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
        )
    )
    e = (
        load_table(spark, "events", sf_dir)
        .groupBy(F.col("user_id").alias("c_custkey"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    base = joins.enrichment_join(
        c,
        {
            "orders": (o, {"n_orders": F.lit(0), "total_spent": F.lit(0.0)}),
            "events": (e, {"n_events": F.lit(0)}),
        },
        key="c_custkey",
        broadcast_sides=False,
    )
    out = (
        base.join(F.broadcast(n), base.c_nationkey == n.n_nationkey, "left")
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey, "left")
        .select(
            "c_custkey",
            F.coalesce("n_name", F.lit("")).alias("nation"),
            F.coalesce("r_name", F.lit("")).alias("region"),
            "n_orders",
            "total_spent",
            "n_events",
        )
    )
    return out


@register(
    "checkpoint_anti_join",
    doc="J3/S9: resume = left-anti join of base against processed keys "
    "(enhance_fields_of_study.py:347-356).",
    oracle="""
SELECT o.o_orderkey
FROM orders o
ANTI JOIN (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_quantity >= 45) done
  ON o.o_orderkey = done.l_orderkey
""",
)
def checkpoint_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    done = (
        load_table(spark, "lineitem", sf_dir)
        .filter(F.col("l_quantity") >= 45)
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    return joins.checkpoint_anti_join(o, done, "o_orderkey").select("o_orderkey")


@register(
    "semi_join_open_orders",
    doc="left-semi join: orders having at least one late-shipped line.",
    oracle="""
SELECT o.o_orderkey, o.o_totalprice
FROM orders o
SEMI JOIN (SELECT l_orderkey FROM lineitem WHERE CAST(l_shipdate AS DATE) > DATE '2001-06-01') l
  ON o.o_orderkey = l.l_orderkey
""",
)
def semi_join_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    late = (
        load_table(spark, "lineitem", sf_dir)
        .filter(F.to_date("l_shipdate") > F.lit("2001-06-01").cast("date"))
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    return joins.semi_join(o, late, "o_orderkey").select("o_orderkey", "o_totalprice")


@register(
    "global_topk_customers",
    doc="T1: global sort + limit with total tie-break.",
    oracle="""
SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
FROM customer
ORDER BY c_acctbal DESC, c_custkey ASC
LIMIT 10
""",
)
def global_topk_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    return (
        c.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
        .limit(10)
        .select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal"))
    )


@register(
    "topk_per_group",
    doc="T2: top-3 orders by totalprice per priority (window rank, "
    "tie-break orderkey).",
    oracle="""
SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS totalprice, rank
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
  FROM orders
)
WHERE rank <= 3
""",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


@register(
    "having_filter",
    doc="Group-filter pattern (TPC-H Q18 shape): customers whose total "
    "order value exceeds a threshold — HAVING over a hash aggregate.",
    oracle="""
SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_spent
FROM orders
GROUP BY o_custkey
HAVING sum(o_totalprice) > 1500000
""",
)
def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
            F.sum("o_totalprice").alias("_raw"),
        )
        .filter(F.col("_raw") > 1500000)
        .drop("_raw")
    )


@register(
    "rollup_totals",
    doc="ROLLUP hierarchy aggregate: per (lang, source), per lang, and "
    "grand total in one pass (partial-agg friendly; NULL markers for "
    "the rollup levels match across engines).",
    oracle="""
SELECT lang, source, count(*) AS n, round(avg(n_chars), 4) AS avg_chars
FROM documents
GROUP BY ROLLUP (lang, source)
""",
)
def rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return docs.rollup("lang", "source").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.avg("n_chars"), 4).alias("avg_chars")
    )
