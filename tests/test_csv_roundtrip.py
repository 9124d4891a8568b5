"""S7 — CSV stats sink/source round trip (the reference's pandas
to_csv/read_csv of aggregate tables, data_quality_comparison.py:130-135)."""

from __future__ import annotations

from pyspark.sql import functions as F

from llm_enhanced_data_pipeline_spark.tables import load_table


def test_csv_stats_roundtrip(spark, sf_dir, tmp_path):
    stats = (
        load_table(spark, "documents", sf_dir)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("n_chars"), 2).alias("avg_chars"))
    )
    out = str(tmp_path / "stats_csv")
    stats.write.option("header", True).mode("overwrite").csv(out)
    back = spark.read.option("header", True).option("inferSchema", True).csv(out)
    a = {r.lang: (r.n, r.avg_chars) for r in stats.collect()}
    b = {r.lang: (r.n, r.avg_chars) for r in back.collect()}
    assert a == b
