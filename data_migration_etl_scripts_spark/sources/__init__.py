"""Sources & sinks (SURVEY.md §2.1 S1-S11)."""

from data_migration_etl_scripts_spark.sources.files import (  # noqa: F401
    read_csv,
    read_json,
    read_parquet_dir,
)
from data_migration_etl_scripts_spark.sources.jdbc import (  # noqa: F401
    jdbc_append,
    jdbc_scan,
    watermark_query,
)
