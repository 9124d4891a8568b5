"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query at sf0.001 (smoke).
queries()     — every implemented SURVEY.md §2 operator, (spark, sf_dir)
                → DataFrame.
oracle_sql()  — DuckDB twin SQL per query (column names/aliases match
                the Spark output; driver hash-compares values).

Implementations live in llm_enhanced_data_pipeline_spark/queries/.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# robust against being loaded by file path from any cwd
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from llm_enhanced_data_pipeline_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: cleanse → dedup → quality-score → per-lang rollup at
    sf0.001 (the reference's batch pipeline shape, SURVEY.md §3.1)."""
    return _q.REGISTRY["flagship_pipeline"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
