"""SparkSession factory.

Defaults tuned for correctness-vs-oracle and local[N] testing, while the
settings themselves are what we would ship on a real multi-executor
cluster (AQE on, skew-join handling on, UTC session timezone, Arrow for
the few Pandas-UDF paths).

Scale notes (100 TB deployment):
- ``spark.sql.shuffle.partitions`` here is sized for local runs; on a
  cluster AQE coalesces post-shuffle partitions from the configured
  initial value, so the initial number only needs to be "big enough"
  (set it to ~2-3x total cores at deploy time).
- ANSI stays at the Spark 4 default (ON): every place the reference's
  pandas-permissive semantics need coerce-to-null, the engine already
  uses ``try_cast``/``try_to_timestamp`` explicitly, and ANSI's
  strictness has caught real expression bugs the permissive mode would
  have silently mis-evaluated.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "data_migration_etl_scripts_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) the SparkSession with engine defaults.

    All settings are cluster-safe; only ``master`` and memory are
    local-mode specifics.
    """
    cpus = int(DEFAULT_CPUS)
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # keep stdout clean for harnesses that parse the last line
        # (bench JSON); progress bars would interleave \r chatter
        .config("spark.ui.showConsoleProgress", "false")
        # 128 MiB input splits: good default for parquet scans at scale
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # broadcast joins up to 64 MiB dims (FK-remap lookups are small)
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # parquet TIMESTAMP(NANOS) (e.g. events.ts) reads as raw long;
        # catalog/query layer converts to timestamp via `ts div 1000`
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
