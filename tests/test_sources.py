"""JSONL permissive reads (S4), checkpoint resume (S9/J3), and the
inverted-index round trip (S10)."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from llm_enhanced_data_pipeline_spark.sources import inverted_index, jsonl
from llm_enhanced_data_pipeline_spark.sources.checkpoint import ParquetCheckpoint


def test_jsonl_permissive_corrupt_lines(spark, tmp_path):
    path = str(tmp_path / "raw.jsonl")
    with open(path, "w") as f:
        f.write('{"paper_id": "p1", "title": "ok"}\n')
        f.write("this is not json at all\n")
        f.write('{"paper_id": "p2", "title": "also ok"}\n')
        f.write('{"paper_id": "p3", "title": truncated\n')
    schema = T.StructType(
        [T.StructField("paper_id", T.StringType()), T.StructField("title", T.StringType())]
    )
    df = jsonl.read_jsonl(spark, path, schema=schema)
    valid = jsonl.valid_lines(df).select("paper_id").collect()
    assert sorted(r.paper_id for r in valid) == ["p1", "p2"]
    assert jsonl.corrupt_lines(df).count() == 2


def test_jsonl_roundtrip(spark, tmp_path):
    out = str(tmp_path / "out")
    df = spark.createDataFrame([Row(paper_id="p1", n=1), Row(paper_id="p2", n=2)])
    jsonl.write_jsonl(df, out)
    back = spark.read.json(out)
    assert sorted(r.paper_id for r in back.collect()) == ["p1", "p2"]


def test_checkpoint_resume_skips_processed(spark, tmp_path):
    ckpt = ParquetCheckpoint(spark, str(tmp_path / "ckpt"), key="paper_id")
    todo = spark.createDataFrame(
        [Row(paper_id="p%d" % i, payload=i) for i in range(10)]
    )
    assert ckpt.remaining(todo).count() == 10

    first_batch = todo.filter(F.col("payload") < 4).withColumn("result", F.col("payload") * 2)
    ckpt.append(first_batch)
    remaining = ckpt.remaining(todo)
    assert remaining.count() == 6
    assert set(r.paper_id for r in remaining.collect()) == {"p%d" % i for i in range(4, 10)}

    second = remaining.withColumn("result", F.col("payload") * 2)
    ckpt.append(second)
    assert ckpt.remaining(todo).count() == 0
    merged = ckpt.merged(spark.createDataFrame([], first_batch.schema))
    assert merged.count() == 10


def test_inverted_index_roundtrip_preserves_duplicates(spark):
    df = spark.createDataFrame([Row(text="the cat and the hat and more")])
    toks = F.split(F.col("text"), " ")
    idx = inverted_index.build_inverted_index(toks)
    rebuilt = inverted_index.reconstruct_text(idx)
    out = df.select(rebuilt.alias("r")).collect()[0].r
    assert out == "the cat and the hat and more"
