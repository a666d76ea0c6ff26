"""Macro-operators: the reference's composite transform patterns plus the
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing), all as DataFrame -> DataFrame
combinators that keep the plan declarative for Catalyst.
"""

from data_migration_etl_scripts_spark.operators.relational import (  # noqa: F401
    fk_remap,
    anti_join_existing,
    top1_per_group,
    dedup_keep_first,
    collect_group_json,
    unpivot_kv,
    cross_seed,
    backfill_from_group_earliest,
)
