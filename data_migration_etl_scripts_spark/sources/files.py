"""File sources (CSV/JSON/parquet directories).

Reference S6: ``pd.read_csv('Roles.csv')``
(``Settings/Roles/notebook.ipynb``). Spark-side, schema may be given
explicitly (preferred — inference costs an extra pass and types drift
per batch, SURVEY.md §1.3) or inferred for exploration parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    **options,
) -> DataFrame:
    reader = spark.read.options(header=str(header).lower(), **options)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    **options,
) -> DataFrame:
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_parquet_dir(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    **options,
) -> DataFrame:
    """JSON-lines corpus reader (the interchange format of most web-scale
    text pipelines). Always pass a schema in production: inference scans
    the data once extra and drifts across shards."""
    return read_json(spark, path, schema=schema, **options)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite", **options) -> None:
    """JSON-lines sink; pair with compression='zstd'/'gzip' for shipping."""
    df.write.mode(mode).options(**options).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — columnar like parquet, same pushdown/pruning behavior
    (PushedFilters shows in .explain identically)."""
    return spark.read.orc(path)


def write_orc(
    df: DataFrame, path: str, mode: str = "overwrite", partition_by=None
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
