"""JDBC source/sink wrappers (reference S1/S7/S9 surface).

The reference reads micro-batches with f-string SQL over pyodbc
(``Template_Tables/makes.py:44-47``) and appends with ``df.to_sql``.
Spark-side:

- ``jdbc_scan`` builds a pushdown query (`WHERE pk > watermark`,
  projection list) and hands it to ``spark.read.jdbc`` — the database
  executes the filter, Spark never sees skipped rows. Partitioned
  reads (``numPartitions`` + bounds on the watermark column) split the
  batch across executors — the scale story the reference's
  single-cursor loop cannot have.
- ``jdbc_append`` is the S7 sink.

No database ships in this environment, so these are exercised by
query-construction unit tests only; the parquet catalog covers the
integration path. The SQL text uses standard quoting — parameterize
``dialect_quote`` for T-SQL bracket quoting if needed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def watermark_query(
    table: str,
    watermark_col: str,
    watermark: int | None,
    columns: Sequence[str] | None = None,
    extra_predicates: Sequence[str] = (),
) -> str:
    """The pushdown batch query (no TOP N: limiting happens Spark-side
    so the same query text works on any dialect; the DB still only
    streams rows past the watermark)."""
    cols = ", ".join(columns) if columns else "*"
    preds = list(extra_predicates)
    if watermark is not None:
        preds.append(f"{watermark_col} > {int(watermark)}")
    where = f" WHERE {' AND '.join(preds)}" if preds else ""
    return f"SELECT {cols} FROM {table}{where}"


def jdbc_scan(
    spark: SparkSession,
    url: str,
    table: str,
    watermark_col: str,
    watermark: int | None = None,
    columns: Sequence[str] | None = None,
    extra_predicates: Sequence[str] = (),
    num_partitions: int | None = None,
    bounds: tuple[int, int] | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    query = watermark_query(table, watermark_col, watermark, columns, extra_predicates)
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("query", query)
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if num_partitions and bounds:
        lo, hi = bounds
        reader = (
            reader.option("partitionColumn", watermark_col)
            .option("lowerBound", str(lo))
            .option("upperBound", str(hi))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def jdbc_append(
    df: DataFrame,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    batchsize: int = 10_000,
) -> None:
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode("append")
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
