"""PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference batch-incremental ETL system (GARAGE-POS/data-migration-etl-scripts,
studied read-only at /root/reference): relational sources/sinks, a rich
project/filter/join/agg/dedup/unpivot/JSON-collect transform vocabulary,
referential-integrity gates, watermark-based CDC incremental extraction —
plus the large-scale training-data-pipeline operators a 100 TB deployment
needs (dedup families, similarity search, text analysis, multimodal column
plumbing).

Design principles (see SURVEY.md §7):
- DataFrame/SQL only; Catalyst plans everything; no RDDs.
- Zero row-at-a-time Python UDFs on the hot path — every scalar function
  in the reference is re-expressed as built-in Column expressions.
- Broadcast the small side of every FK-remap join; aggregate before join;
  dedup lookups before 1:N joins.
- Deterministic semantics (injectable batch_ts, total orderings on dedup)
  so results are oracle-testable.
"""

from data_migration_etl_scripts_spark.session import get_spark  # noqa: F401
from data_migration_etl_scripts_spark.catalog import Catalog  # noqa: F401

__all__ = ["get_spark", "Catalog"]
__version__ = "0.1.0"
