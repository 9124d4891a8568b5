"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference LLM-enhanced data pipeline
(Ann-2003-Wang/llm-enhanced-data-pipeline), re-expressed Spark-first.

Layout
------
- ``session``    : SparkSession factory tuned for local[32] and cluster use.
- ``tables``     : loaders for the synthetic star-schema test tables.
- ``sources``    : JSONL/Parquet/CSV IO, checkpoint-resume, inverted-index.
- ``operators``  : cleaning, dedup, joins, aggregates, quality, compliance,
                   vector search, text analysis, multimodal plumbing.
- ``functions``  : reusable column expressions (stable hashing, LLM-output
                   parsing).
- ``enrich``     : pluggable LLM-enrichment harness (deterministic fake
                   client for tests; mapInPandas adapters, rate limiting).
- ``streaming``  : Structured Streaming variants of the event pipeline.
- ``queries``    : the registry mapping every implemented operator to a
                   (spark_fn, duckdb_oracle_sql) pair for the correctness
                   gate in ``__spark_entry__.py``.

Every operator is a pure DataFrame-in/DataFrame-out function built on
built-in ``pyspark.sql.functions`` (JVM-side, whole-stage codegen) —
Python UDFs appear only where the semantics genuinely require imperative
code (LLM calls, multi-strategy response parsing, binary decode stubs),
and then always as Arrow-batched ``mapInPandas``/``pandas_udf``.
"""

__version__ = "0.1.0"
