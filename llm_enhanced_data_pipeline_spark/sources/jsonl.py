"""JSONL source/sink (SURVEY.md §2.1 S4/S5).

The reference parses line-per-record JSON, logging and skipping corrupt
lines (enhance_fields_of_study.py:228-241). Spark-first equivalent:
PERMISSIVE mode with a ``_corrupt_record`` column so bad lines are
observable instead of silently dropped, plus ``keep_order`` support —
JSONL order is semantically meaningful to the reference's keep-first
dedups, so an explicit line-number column can be requested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    keep_corrupt: bool = True,
    with_line_id: bool = False,
) -> DataFrame:
    reader = spark.read.option("mode", "PERMISSIVE")
    if schema is not None:
        if keep_corrupt and CORRUPT_COL not in schema.fieldNames():
            schema = schema.add(T.StructField(CORRUPT_COL, T.StringType()))
        reader = reader.schema(schema)
        reader = reader.option("columnNameOfCorruptRecord", CORRUPT_COL)
    df = reader.json(path)
    if with_line_id:
        # monotonically_increasing_id preserves within-file ordering per
        # partition split; adequate as the "seen first" tiebreaker the
        # reference gets from sequential reading.
        df = df.withColumn("_line_id", F.monotonically_increasing_id())
    return df


def corrupt_lines(df: DataFrame) -> DataFrame:
    """Bad-line diagnostics. Spark disallows queries that touch ONLY the
    corrupt column of a raw JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN);
    the supported pattern is to cache the parsed frame first — fine
    here because corrupt-line inspection is a small diagnostic read."""
    if CORRUPT_COL not in df.columns:
        return df.limit(0)
    return df.cache().filter(F.col(CORRUPT_COL).isNotNull())


def valid_lines(df: DataFrame) -> DataFrame:
    """Rows that parsed cleanly. Downstream queries must reference at
    least one data column (a bare count() would prune the scan down to
    the corrupt column alone, which Spark disallows on raw JSON —
    QUERY_ONLY_CORRUPT_RECORD_COLUMN)."""
    if CORRUPT_COL not in df.columns:
        return df
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S5 — one JSON object per line (Spark json sink is exactly that)."""
    df.write.mode(mode).json(path)
