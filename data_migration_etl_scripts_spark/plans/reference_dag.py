"""The reference's canonical migration run as one declared DAG.

``main.py:41-57`` in the reference calls pipelines in a hand-kept
order (accounts -> locations -> categories -> items -> bays ->
customers -> cars -> orders -> order_line_items, with dimensions
first). Here the same run is DECLARED: each pipeline states what it
depends on, the runner topologically sorts, and a failure blocks only
its downstream subtree.

``build_reference_dag`` wires every implemented pipeline shape against
a catalog holding the V1-shaped fixture tables (tests) or real V1
exports (deployment). Pipelines whose source tables are absent from
the catalog are skipped — the same run plan serves partial catalogs.
"""

from __future__ import annotations

from data_migration_etl_scripts_spark.pipelines import (
    cars_pipeline,
    categories_pipeline,
    dimension_pipeline,
    items_pipeline,
    location_settings_pipeline,
    locations_pipeline,
    orders_pipeline,
    subscriptions_pipeline,
    subusers_pipeline,
    warehouses_pipeline,
)
from data_migration_etl_scripts_spark.plans.runner import DagRunner


def build_reference_dag(catalog) -> DagRunner:
    runner = DagRunner(catalog)

    def add_if_sources(pipeline, sources: list[str], depends_on: list[str] = ()):
        if all(catalog.exists(s) for s in sources):
            present = [d for d in depends_on if d in runner._pipelines]
            runner.add(pipeline, depends_on=present)

    # --- tier 0: template dimensions (no dependencies)
    add_if_sources(
        dimension_pipeline(
            catalog,
            name="makes",
            source_table="Make",
            watermark_col="MakeID",
            sink_table="MakesV2",
            rename={"MakeID": "OldMakeID"},
            strip_to_null=["Name", "ArabicName"],
            scrub_values={"ImagePath": "-1"},
            fill_ts_cols=["CreatedAt"],
        ),
        ["Make"],
    )
    add_if_sources(warehouses_pipeline(catalog), ["Stores"])

    # --- tier 1: entities over dimensions
    add_if_sources(
        locations_pipeline(
            catalog,
            side_specs={
                "AmenitiesJson": ("LocationAmenitiesJunc", ["AmenitiesID"]),
                "WorkingHours": ("LocationWorkingHours", ["Name", "Time"]),
            },
        ),
        ["Locations", "SyncCities"],
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
    add_if_sources(subusers_pipeline(catalog), ["SubUsers"])
    add_if_sources(subscriptions_pipeline(catalog), ["UserPackageDetails"])
    add_if_sources(
        cars_pipeline(catalog), ["Cars", "CarsLocationJunc"], depends_on=["subusers"]
    )

    # --- tier 2: facts over everything
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
    return runner
