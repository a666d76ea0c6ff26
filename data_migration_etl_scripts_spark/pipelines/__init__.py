"""Declarative pipeline catalog: one builder per reference script shape.

Each builder returns an :class:`~data_migration_etl_scripts_spark.cdc.
IncrementalPipeline` whose transform is composed from the engine's
column-function and macro-operator libraries — the Spark-first
re-expression of the reference's extract/transform/load scripts
(SURVEY.md §3.2-3.3, §7.2).

The reference's 36 scripts collapse into a handful of SHAPES:

- :mod:`dimensions` — drop/rename/strip/fill template tables (makes,
  models, units, amenities, services, landmarks, app_sources,
  suppliers, bays, warehouses ...) + sync-crosswalk builders.
- :mod:`facts` — multi-input pre-aggregated fact loads with checkout
  repair and gated FK remaps (orders, order_line_items ...).
- :mod:`wide` — JSON side-collects (locations), EAV unpivots
  (location_settings, roles), multiformat-date + backfill (cars),
  dedup/anti-join dual-output (categories, items).
"""

from data_migration_etl_scripts_spark.pipelines.dimensions import (  # noqa: F401
    dimension_pipeline,
    sync_crosswalk_pipeline,
)
from data_migration_etl_scripts_spark.pipelines.facts import (  # noqa: F401
    order_line_items_pipeline,
    order_payments_pipeline,
    orders_pipeline,
)
from data_migration_etl_scripts_spark.pipelines.geo import (  # noqa: F401
    cities_pipeline,
    countries_pipeline,
    recode_via_join,
    warehouses_pipeline,
)
from data_migration_etl_scripts_spark.pipelines.inventory import (  # noqa: F401
    purchase_bills_pipeline,
    stock_transfers_pipeline,
    stocks_pipeline,
)
from data_migration_etl_scripts_spark.pipelines.products import (  # noqa: F401
    items_pipeline,
    subcategories_pipeline,
)
from data_migration_etl_scripts_spark.pipelines.registry import (  # noqa: F401
    build_dimension,
    build_entity,
    build_gated_entity,
    build_sync,
)
from data_migration_etl_scripts_spark.pipelines.settings import (  # noqa: F401
    roles_claims_transform,
    roles_pipeline,
    subscriptions_pipeline,
)
from data_migration_etl_scripts_spark.pipelines.users import (  # noqa: F401
    account_payment_pipeline,
    subusers_pipeline,
)
from data_migration_etl_scripts_spark.pipelines.wide import (  # noqa: F401
    cars_pipeline,
    categories_pipeline,
    location_settings_pipeline,
    locations_pipeline,
)
