"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship query at sf0.001 (smoke).
queries()      -> every implemented operator from SURVEY.md §2 plus the
                  training-data-pipeline operators, (spark, sf_dir) -> DataFrame.
oracle_sql()   -> DuckDB-equivalent SQL per query (omitted only for
                  genuinely non-SQL-expressible ops: mapInPandas media
                  kernels and engine-specific JSON struct formatting).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_migration_etl_scripts_spark import queries as q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return q.all_queries()


def oracle_sql() -> dict[str, str]:
    return q.all_oracles()
