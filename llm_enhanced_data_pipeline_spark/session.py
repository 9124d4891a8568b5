"""SparkSession factory.

Tuned for the local[32] test box but written so the same settings are the
right defaults on a multi-executor cluster: AQE on (runtime re-plan,
skew-join splitting, partition coalescing), Arrow on (fast
pandas-UDF/driver transfer), shuffle partitions sized to cores rather
than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "llm_enhanced_data_pipeline_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Notes on scale posture: on a real cluster ``master``/memory come from
    the submit environment; everything set here is cluster-safe. AQE
    handles skewed shuffle joins and coalesces tiny post-shuffle
    partitions, which matters at 100 TB where static partition counts
    are always wrong somewhere.
    """
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def enable_nanos_as_long(spark: SparkSession) -> None:
    """Allow reading parquet TIMESTAMP(NANOS) columns as epoch-nano longs.

    Stock Spark rejects nano-precision parquet timestamps
    (PARQUET_TYPE_ILLEGAL); this legacy conf is runtime-settable and is
    applied inside every query that touches the ``events`` table so the
    queries also work under a caller-provided session. Harmless for the
    current timestamp[us] testdata vintage (the conf only affects
    nano-precision columns); load_table handles dtype normalization for
    both vintages.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
