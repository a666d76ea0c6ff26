"""Declarative registry of the remaining reference tables.

Most of the reference's 36 scripts are instances of the shapes already
implemented (SURVEY.md §7.2). This registry pins the per-table configs
so the WHOLE script surface is declared in one place: a user of the
reference finds every table they migrate today, with its V1 source,
watermark key, and cleaning policy.

Entries marked gated=... additionally FK-remap through the named
lookup with an RI gate, built on fk_remap exactly like the tested
pipelines in products/inventory.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_migration_etl_scripts_spark.cdc import IncrementalPipeline
from data_migration_etl_scripts_spark.operators import fk_remap
from data_migration_etl_scripts_spark.pipelines.dimensions import dimension_pipeline

#: table -> dimension_pipeline kwargs (reference script in comment)
DIMENSION_CONFIGS: dict[str, dict] = {
    # Template_Tables/makes.py
    "makes": dict(
        source_table="Make", watermark_col="MakeID", sink_table="MakesV2",
        rename={"MakeID": "OldMakeID"}, strip_to_null=["Name", "ArabicName"],
        scrub_values={"ImagePath": "-1"}, fill_ts_cols=["CreatedAt"],
    ),
    # Template_Tables/models.py (Year/RecommendedLitres coercions)
    "models": dict(
        source_table="Model", watermark_col="ModelID", sink_table="ModelsV2",
        rename={"ModelID": "OldModelID"}, strip_to_null=["Name", "ArabicName"],
        numeric_coerce=["Year", "RecommendedLitres"],
        scrub_values={"ImagePath": "-1"}, fill_ts_cols=["CreatedAt"],
    ),
    # Template_Tables/units.py / amenities / services / landmarks /
    # app_sources — one shape, five tables
    "units": dict(
        source_table="Units", watermark_col="UnitID", sink_table="UnitsV2Out",
        rename={"UnitID": "OldUnitID"}, strip_keep=["Name"],
    ),
    "amenities": dict(
        source_table="Amenities", watermark_col="AmenitiesID",
        sink_table="AmenitiesV2", rename={"AmenitiesID": "OldAmenitiesID"},
        strip_to_null=["Description"], strip_keep=["Name"],
    ),
    "services": dict(
        source_table="Service", watermark_col="ServiceID", sink_table="ServicesV2",
        rename={"ServiceID": "OldServiceID"}, strip_keep=["ServiceTitle"],
    ),
    "landmarks": dict(
        source_table="Landmark", watermark_col="LandmarkID", sink_table="LandmarksV2",
        rename={"LandmarkID": "OldLandmarkID"}, strip_keep=["Name"],
    ),
    "app_sources": dict(
        source_table="AppSource", watermark_col="AppSourceID",
        sink_table="AppSourcesV2", rename={"AppSourceID": "OldAppSourceID"},
        strip_keep=["Name"],
    ),
    # Invertory/Suppliers/suppliers.py
    "suppliers": dict(
        source_table="Supplier", watermark_col="SupplierID", sink_table="SuppliersV2Out",
        rename={"SupplierID": "OldSupplierID"},
        strip_to_null=["Email", "ContactPerson", "Address"], strip_keep=["Name"],
        fill_defaults={"StatusID": 1}, fill_ts_cols=["CreatedAt"],
    ),
    # Invertory/Reconciliations/reconciliations.py
    "reconciliations": dict(
        source_table="Reconciliation", watermark_col="ReconciliationID",
        sink_table="ReconciliationsV2", strip_to_null=["Reason"],
        fill_defaults={"StatusID": 1}, fill_ts_cols=["CreatedAt"],
    ),
}

#: gated FK-remap entities: name -> (source, wm, sink, lookup_table,
#: lookup_old_id, batch_fk, lookup_new_id, gate?)  (reference script)
GATED_ENTITY_CONFIGS: dict[str, tuple] = {
    # Main_Modules/Bays/bays.py — bay -> location remap, gated
    "bays": ("Bay", "BayID", "BaysV2",
             "LocationsV2Lookup", "OldLocationID", "LocationID", "LocationID", True),
    # Main_Modules/AspNetUsers/customer_locations.py — nullable LocationID
    # gets default 16 BEFORE the remap in the reference; here the remap is
    # gateless and nulls propagate for the caller's fill policy
    "customer_locations": ("CustomerLocationJunc", "CustomerLocationID",
                           "CustomerLocationsV2", "LocationsV2Lookup",
                           "OldLocationID", "LocationId", "LocationID", False),
    # Main_Modules/Packages/packages.py — package -> subcategory remap
    "packages": ("Packages", "PackageID", "PackagesV2",
                 "SubCategory", "SubCatID", "SubCategoryID", "CategoryID", True),
    # Main_Modules/Packages/package_details.py — detail -> package + item
    "package_details": ("PackageDetails", "PackageDetailID", "PackageDetailsV2",
                        "PackagesSync", "OldPackageID", "PackageID",
                        "NewPackageID", True),
    # Invertory/Purchases/purchase_orders.py — po -> supplier remap
    "purchase_orders": ("PurchaseOrder", "PurchaseOrderID", "PurchaseOrdersV2Out",
                        "SuppliersV2", "OldSupplierID", "SupplierID",
                        "SupplierID", True),
}


def build_dimension(catalog, name: str) -> IncrementalPipeline:
    return dimension_pipeline(catalog, name=name, **DIMENSION_CONFIGS[name])


def build_gated_entity(catalog, name: str) -> IncrementalPipeline:
    (source, wm, sink, lk_table, lk_old, batch_fk, lk_new, gated) = (
        GATED_ENTITY_CONFIGS[name]
    )

    def transform(df, ts):
        lookup = catalog.read(lk_table).select(
            F.col(lk_old).alias(batch_fk), F.col(lk_new).alias(f"New{lk_new}")
        ).dropDuplicates([batch_fk])
        return fk_remap(
            df, lookup, on=batch_fk,
            gate=f"New{lk_new}" if gated else None,
            context=f"{name}->{lk_table}",
        )

    return IncrementalPipeline(
        name=name, source=lambda: catalog.read(source), watermark_col=wm,
        sink_table=sink, transform=transform,
    )
