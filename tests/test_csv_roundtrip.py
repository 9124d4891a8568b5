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


def test_orc_roundtrip_preserves_schema_and_values(spark, sf_dir, tmp_path):
    """ORC sink/source parity (second columnar format beside parquet):
    schema and values survive a write/read cycle, including the array
    column the driver gate can't hash (ORC keeps it typed)."""
    docs = load_table(spark, "documents", sf_dir).limit(200).select(
        "doc_id", "text", "source", F.split("text", " ").alias("toks")
    )
    out = str(tmp_path / "docs_orc")
    docs.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    # nullability widens on read-back (ORC stores no containsNull=false);
    # names and types must survive exactly
    assert [(f.name, f.dataType.simpleString()) for f in back.schema] == [
        (f.name, f.dataType.simpleString()) for f in docs.schema
    ]
    a = sorted((r.doc_id, r.text, tuple(r.toks)) for r in docs.collect())
    b = sorted((r.doc_id, r.text, tuple(r.toks)) for r in back.collect())
    assert a == b
