"""Query registry: every implemented operator from SURVEY.md §2 gets a
(spark_fn, duckdb_oracle_sql) pair here; __spark_entry__.py exposes the
dict to the driver's correctness gate.

Contract (from __spark_entry__.py):
- spark_fn(spark, sf_dir) -> DataFrame
- oracle sql runs on DuckDB views named region nation customer supplier
  part orders lineitem events documents embeddings over the same
  parquet; column names/aliases MUST match the Spark output exactly
  (the driver sorts columns by name before value-hashing).
- oracle=None → driver records a weaker rows-only check (reserved for
  genuinely non-SQL-expressible ops, e.g. LLM enrichment).

Determinism rules applied throughout:
- doubles are rounded (money 2dp, ratios/sims 4-6dp) on BOTH sides;
- every top-k has a total tie-break order;
- timestamps never cross the boundary raw — epoch integers instead
  (load_table normalizes events.ts to long nanos in Spark whatever the
  parquet's physical encoding; DuckDB reads native timestamps and
  converts with epoch_ns).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    bench: bool = False  # include in bench.py headline set
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, bench: bool = False, doc: str = ""):
    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, bench=bench, doc=doc)
        return fn

    return wrap


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}


def bench_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items() if spec.bench}
