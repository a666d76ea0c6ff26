"""SQL entry surface: register the catalog tables as temp views and run
ad-hoc ANSI SQL through Spark SQL.

The reference exposes its data only through per-script pandas code; a
user switching to this engine gets the same tables as named views and
the full Spark SQL dialect over them (`spark.sql(...)` → Catalyst →
the same optimized physical plans as the DataFrame API — the two
front-ends share the planner, so there is no penalty for SQL).

Views go through the same scan normalization as the query inventory
(`queries._t`): TIMESTAMP_NTZ/nanos vintages are folded to TIMESTAMP
once at registration, so SQL text never has to care which parquet
vintage it is reading.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def register_views(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> None:
    """Register each parquet table as a temp view named after itself."""
    from data_migration_etl_scripts_spark.queries import _t

    for name in tables or TABLES:
        _t(spark, sf_dir, name).createOrReplaceTempView(name)


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """Ad-hoc SQL over the catalog: register views, return the lazy
    DataFrame for ``sql``. Catalyst applies the same pushdown/pruning
    as the DataFrame API — a view is just a named logical plan."""
    register_views(spark, sf_dir)
    return spark.sql(sql)
