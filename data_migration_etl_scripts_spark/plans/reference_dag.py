"""The reference's canonical migration run as one declared DAG.

``main.py:41-57`` in the reference calls pipelines in a hand-kept
order (accounts -> locations -> categories -> items -> bays ->
customers -> cars -> orders -> order_line_items, with dimensions
first and the inventory/settings chains alongside). Here the same run
is DECLARED: each pipeline states what it depends on, the runner
topologically sorts, and a failure blocks only its downstream subtree.

``build_reference_dag`` wires every implemented pipeline shape against
a catalog holding the V1-shaped fixture tables (tests) or real V1
exports (deployment). Pipelines whose source tables are absent from
the catalog are skipped — the same run plan serves partial catalogs.
"""

from __future__ import annotations

from data_migration_etl_scripts_spark.pipelines import (
    account_payment_pipeline,
    cars_pipeline,
    categories_pipeline,
    cities_pipeline,
    countries_pipeline,
    dimension_pipeline,
    items_pipeline,
    location_settings_pipeline,
    locations_pipeline,
    order_line_items_pipeline,
    order_payments_pipeline,
    orders_pipeline,
    roles_pipeline,
    subcategories_pipeline,
    subscriptions_pipeline,
    subusers_pipeline,
    warehouses_pipeline,
)
from data_migration_etl_scripts_spark.pipelines.inventory import (
    purchase_bills_pipeline,
    stock_transfers_pipeline,
    stocks_pipeline,
)
from data_migration_etl_scripts_spark.pipelines.registry import (
    DIMENSION_CONFIGS,
    ENTITY_CONFIGS,
    GATED_ENTITY_CONFIGS,
    SYNC_CONFIGS,
    build_dimension,
    build_entity,
    build_gated_entity,
    build_sync,
)
from data_migration_etl_scripts_spark.plans.runner import DagRunner


def _entity_sources(name: str) -> list[str]:
    """A config entity needs its source table and every remap lookup."""
    cfg = ENTITY_CONFIGS[name]
    return [cfg["source_table"]] + [rm.lookup_table for rm in cfg.get("remaps", ())]


def _packages_chained(catalog):
    """The gated packages entity with the reference's SECOND category
    hop (``packages.py:75-90``): the subcategory remap yields the OLD
    category id; resolve it to the migrated CategoryID by deriving the
    (OldCategoryID -> CategoryID) map from SyncCategories x
    CategoriesV2Map (same derivation as subcategories_transform), then
    drop the intermediate columns so the PackagesV2 sink carries the
    migrated CategoryID that location_packages fans out on."""
    import dataclasses

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from data_migration_etl_scripts_spark import functions as ef
    from data_migration_etl_scripts_spark.gates import require_no_nulls

    p = build_gated_entity(catalog, "packages")
    inner = p.transform

    def transform(df, ts):
        out = inner(df, ts)
        # packages.py:66-70 cleans EVERY object column (strip -> None,
        # 'NULL' -> None) before the remaps — applied to every
        # string-typed column of the batch, not just Name
        for field in out.schema.fields:
            if isinstance(field.dataType, T.StringType):
                out = out.withColumn(
                    field.name,
                    ef.scrub_null_literal(ef.strip_or_null(field.name)),
                )
        cat_ids = (
            catalog.read("SyncCategories")
            .join(catalog.read("CategoriesV2Map"), ["AccountID", "Name"])
            # min(), not dropDuplicates: the categories pipeline APPENDS
            # crosswalk rows whose old-ids can collide with pre-seeded
            # ones, and an arbitrary-pick dedup would make the sink
            # hash run-dependent
            .groupBy("OldCategoryID")
            .agg(F.min("CategoryID").alias("CategoryID"))
        )
        out = out.withColumnRenamed("NewCategoryID", "OldCategoryID")
        out = out.join(F.broadcast(cat_ids), "OldCategoryID", "left")
        # packages.py:84-88 gates the SECOND hop too: any OldCategoryID
        # that fails to resolve aborts the batch (the first hop's RI
        # gate guarantees OldCategoryID itself is non-null by now, so a
        # null CategoryID can only mean an unmatched crosswalk row).
        out = require_no_nulls(out, "CategoryID", context="packages->Categories")
        return out.drop("SubCategoryID", "OldCategoryID")

    return dataclasses.replace(p, transform=transform)


def build_reference_dag(catalog) -> DagRunner:
    runner = DagRunner(catalog)

    def add_if_sources(pipeline, sources: list[str], depends_on: list[str] = ()):
        if all(catalog.exists(s) for s in sources):
            present = [d for d in depends_on if d in runner._pipelines]
            runner.add(pipeline, depends_on=present)

    # --- tier 0: template dimensions + root entities (no deps) ------
    for dim in DIMENSION_CONFIGS:
        add_if_sources(build_dimension(catalog, dim),
                       [DIMENSION_CONFIGS[dim]["source_table"]])
    # countries writes its own V2 sink; the pre-seeded CountriesV2
    # lookup (the crosswalk cities joins) keeps its fixture identity,
    # matching the registry dims' *V2Out discipline
    add_if_sources(countries_pipeline(catalog, sink_table="CountriesV2Out"),
                   ["Country"])
    add_if_sources(warehouses_pipeline(catalog), ["Stores"])
    add_if_sources(cities_pipeline(catalog), ["City", "CountriesV2"])
    add_if_sources(roles_pipeline(catalog), ["RoleGroupForms"])
    for sync in SYNC_CONFIGS:
        add_if_sources(build_sync(catalog, sync),
                       [SYNC_CONFIGS[sync]["source_table"],
                        SYNC_CONFIGS[sync]["lookup_table"]])
    # accounts is the root of the reference DAG (main.py:41)
    add_if_sources(build_entity(catalog, "accounts"), _entity_sources("accounts"))

    # --- tier 1: entities over dimensions ---------------------------
    add_if_sources(
        locations_pipeline(
            catalog,
            side_specs={
                "AmenitiesJson": ("LocationAmenitiesJunc", ["AmenitiesID"]),
                "WorkingHours": ("LocationWorkingHours", ["Name", "Time"]),
            },
        ),
        ["Locations", "SyncCities"],
        depends_on=["accounts"],
    )
    add_if_sources(
        location_settings_pipeline(
            catalog, value_vars=["Facebook", "Twitter", "Instagram"]
        ),
        ["Receipt"],
        depends_on=["locations"],
    )
    add_if_sources(
        categories_pipeline(catalog), ["Category", "Locations"], depends_on=["locations"]
    )
    add_if_sources(
        items_pipeline(catalog), ["Items", "SubCategory"], depends_on=["categories"]
    )
    add_if_sources(
        subcategories_pipeline(catalog),
        ["SubCategory", "SyncCategories", "CategoriesV2Map"],
        depends_on=["categories"],
    )
    add_if_sources(
        build_gated_entity(catalog, "bays"),
        ["Bay", "LocationsV2Lookup"],
        depends_on=["locations"],
    )
    add_if_sources(
        build_entity(catalog, "customers"),
        _entity_sources("customers"),
        depends_on=["locations"],
    )
    add_if_sources(
        build_gated_entity(catalog, "customer_locations"),
        ["CustomerLocationJunc", "LocationsV2Lookup"],
        depends_on=["customers", "locations"],
    )
    add_if_sources(subusers_pipeline(catalog), ["SubUsers"], depends_on=["accounts"])
    add_if_sources(subscriptions_pipeline(catalog), ["UserPackageDetails"])
    add_if_sources(
        account_payment_pipeline(catalog),
        ["Accounts", "PaymentModes"],
        depends_on=["accounts"],
    )
    add_if_sources(
        cars_pipeline(catalog), ["Cars", "CarsLocationJunc"], depends_on=["subusers"]
    )
    add_if_sources(
        build_entity(catalog, "car_locations"),
        _entity_sources("car_locations"),
        depends_on=["cars", "locations"],
    )
    add_if_sources(
        _packages_chained(catalog),
        ["Packages", "SubCategory", "SyncCategories", "CategoriesV2Map"],
        depends_on=["subcategories"],
    )
    add_if_sources(
        build_gated_entity(catalog, "package_details"),
        ["PackageDetails", "PackagesSync"],
        depends_on=["packages"],
    )
    # location_items reads the MIGRATED items table (the items sink),
    # so its source check is the upstream's source list
    add_if_sources(
        build_entity(catalog, "location_items"),
        ["Items", "SubCategory", "CategoriesV2Map", "LocationsV2All"],
        depends_on=["items", "locations"],
    )
    # location_packages reads the MIGRATED packages table (the packages
    # sink), so its source check is the upstream's source list
    add_if_sources(
        build_entity(catalog, "location_packages"),
        ["Packages", "SubCategory", "CategoriesV2Map", "LocationsV2All"],
        depends_on=["packages", "locations"],
    )

    # --- tier 2: facts over everything ------------------------------
    add_if_sources(
        orders_pipeline(
            catalog,
            lookup_specs={
                "NewLocationID": (
                    "LocationsV2Lookup",
                    "OldLocationID",
                    "LocationID",
                    "LocationID",
                )
            },
        ),
        ["Orders", "OrderCheckout", "LocationsV2Lookup"],
        depends_on=["locations", "cars"],
    )
    add_if_sources(
        order_line_items_pipeline(catalog),
        ["OrderDetail", "OrdersV2Map"],
        depends_on=["orders"],
    )
    add_if_sources(
        order_payments_pipeline(catalog),
        ["OrderCheckout", "OrdersV2Map", "SyncAppSources"],
        depends_on=["orders"],
    )
    add_if_sources(
        build_entity(catalog, "order_packages"),
        _entity_sources("order_packages"),
        depends_on=["order_line_items", "items"],
    )

    # --- inventory chain --------------------------------------------
    add_if_sources(
        build_gated_entity(catalog, "purchase_orders"),
        ["PurchaseOrder", "SuppliersV2"],
    )
    add_if_sources(
        purchase_bills_pipeline(catalog),
        ["Bill", "SuppliersV2", "Warehouses"],
        depends_on=["purchase_orders"],
    )
    add_if_sources(
        build_entity(catalog, "purchase_bill_details"),
        _entity_sources("purchase_bill_details"),
        depends_on=["purchase_bills"],
    )
    add_if_sources(
        stock_transfers_pipeline(catalog), ["StockIssue", "Warehouses"]
    )
    add_if_sources(
        build_entity(catalog, "stock_transfer_details"),
        _entity_sources("stock_transfer_details"),
        depends_on=["stock_transfers"],
    )
    add_if_sources(stocks_pipeline(catalog), ["Stock", "Warehouses"])
    return runner
