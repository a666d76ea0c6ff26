"""Run plans: dependency-ordered orchestration of pipelines."""

from data_migration_etl_scripts_spark.plans.runner import (  # noqa: F401
    DagRunner,
    PipelineFailure,
    RunReport,
)
