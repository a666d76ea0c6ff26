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

import datetime as dt
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from data_migration_etl_scripts_spark import functions as ef
from data_migration_etl_scripts_spark.cdc import IncrementalPipeline
from data_migration_etl_scripts_spark.operators import fk_remap
from data_migration_etl_scripts_spark.pipelines.dimensions import (
    dimension_pipeline,
    dimension_transform,
    sync_crosswalk_pipeline,
)

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


@dataclass(frozen=True)
class Remap:
    """One FK remap step: left-join ``lookup_table`` (projected to
    ``old_id -> on``, ``new_id -> new_name``) onto the batch.

    ``gated=True`` aborts the batch on any unmatched key (RI gate,
    reference's IncrementalDependencyError). ``carry`` names extra
    lookup columns to pull through (e.g. TaxAmount riding along with
    the PurchaseBillID remap). ``dedup=False`` keeps a fan-out join
    (one account -> many locations)."""

    lookup_table: str
    old_id: str
    on: str
    new_id: str
    new_name: str | None = None
    gated: bool = False
    carry: tuple[str, ...] = ()
    dedup: bool = True


def _ts_fill(col: str):
    """UpdatedAt <- now() parity, with the injectable batch timestamp."""
    return lambda ts: F.coalesce(F.col(col), F.lit(ts))


#: Multi-remap entity configs: the reference scripts that clean a batch
#: then chain 1-2 FK remaps. Fixed transform order: keep/select ->
#: dimension_transform policies -> post exprs (sequential, so an expr
#: may read a column a later expr overwrites) -> remaps -> drop_after.
ENTITY_CONFIGS: dict[str, dict] = {
    # Main_Modules/Accounts/accounts.py:54-108 — the root entity of the
    # reference DAG (main.py:41-57 runs it first). No remaps: pure
    # select/rename/clean/fill.
    "accounts": dict(
        source_table="Users", watermark_col="UserID", sink_table="AccountsV2Out",
        keep=["UserID", "FirstName", "LastName", "ImagePath", "Company",
              "BusinessType", "Email", "ContactNo", "LastUpdatedDate", "StatusID",
              "CompanyCode", "CreatedDate", "VATNO", "BrandThumbnailImage"],
        rename={"UserID": "OldUserID", "FirstName": "RepresentativeFirstName",
                "LastName": "RepresentativeLastName", "Company": "CompanyName",
                "BusinessType": "PrimaryBusiness", "Email": "CompanyEmail",
                "ContactNo": "RepresentativeContactNo", "CreatedDate": "CreatedAt",
                "VATNO": "VATNo", "LastUpdatedDate": "UpdatedAt"},
        strip_to_null=["RepresentativeFirstName", "RepresentativeLastName",
                       "ImagePath", "PrimaryBusiness", "CompanyEmail",
                       "RepresentativeContactNo", "CompanyCode",
                       "BrandThumbnailImage"],
        strip_keep=["CompanyName"],  # accounts.py:77: CompanyName strips but keeps ''
        post=[
            ("RepresentativeContactNo", lambda ts: ef.clean_contact("RepresentativeContactNo")),
            ("CompanyName", lambda ts: F.coalesce(F.col("CompanyName"), F.lit(""))),
            ("UpdatedAt", _ts_fill("UpdatedAt")),
            ("CreatedAt", lambda ts: F.coalesce(F.col("CreatedAt"), F.col("UpdatedAt"))),
            ("CRNo", lambda ts: F.lit("")),
            ("CompanyCode", lambda ts: F.coalesce(F.col("CompanyCode"), F.lit(""))),
            ("VATNo", lambda ts: ef.try_numeric("VATNo")),
        ],
    ),
    # Main_Modules/AspNetUsers/customers.py:45-101 — subusers_transform
    # shape plus the two chained geo remaps (location -> city -> country).
    "customers": dict(
        source_table="Customers", watermark_col="CustomerID",
        sink_table="AspNetUsersV2",
        keep=["CustomerID", "FullName", "ImagePath", "Password", "Email",
              "Mobile", "LocationID", "StatusID", "CreatedOn", "LastUpdatedDate"],
        rename={"CustomerID": "OldID", "LastUpdatedDate": "UpdatedAt",
                "Password": "PasswordHash", "LocationID": "OldLocationID",
                "FullName": "FirstName", "Mobile": "ContactNo",
                "CreatedOn": "CreatedAt"},
        strip_to_null=["FirstName", "ImagePath", "PasswordHash", "Email",
                       "ContactNo"],
        post=[
            ("ContactNo", lambda ts: ef.clean_contact("ContactNo")),
            ("UpdatedAt", _ts_fill("UpdatedAt")),
            ("CreatedAt", lambda ts: F.coalesce(F.col("CreatedAt"), F.col("UpdatedAt"))),
            ("StatusID", lambda ts: F.coalesce(F.col("StatusID"), F.lit(1))),
            ("IsEmailVerified", lambda ts: F.lit(0)),
            ("IsContactNoVerified", lambda ts: F.lit(0)),
            ("EmailConfirmed", lambda ts: F.lit(0)),
            ("PhoneNumberConfirmed", lambda ts: F.lit(0)),
            ("TwoFactorEnabled", lambda ts: F.lit(0)),
            ("LockoutEnabled", lambda ts: F.lit(0)),
            ("AccessFailedCount", lambda ts: F.lit(0)),
            ("UserType", lambda ts: F.lit("Customer")),
            ("NormalizedEmail", lambda ts: F.upper(F.col("Email"))),
        ],
        remaps=[
            Remap("LocationsV2All", "OldLocationID", "OldLocationID", "CityID"),
            Remap("CitiesV2", "CityID", "CityID", "CountryID"),
        ],
        drop_after=["OldLocationID"],
    ),
    # Main_Modules/Cars/car_locations.py:47-95 — junction with two gated
    # remaps; CreatedAt backfilled from raw UpdatedAt, then the epoch
    # default, THEN UpdatedAt gets its now() fill (order matters).
    "car_locations": dict(
        source_table="CarsLocationJunc", watermark_col="CarLocationID",
        sink_table="CarLocationsV2",
        keep=["CarLocationID", "CarID", "LocationID", "StatusID", "CreatedOn",
              "LastUpdatedDate"],
        rename={"CarLocationID": "OldCarLocationID", "CarID": "OldCarID",
                "LocationID": "OldLocationID", "LastUpdatedDate": "UpdatedAt",
                "CreatedOn": "CreatedAt"},
        remaps=[
            Remap("LocationsV2Lookup", "OldLocationID", "OldLocationID",
                  "LocationID", gated=True),
            Remap("CarsV2Map", "OldCarID", "OldCarID", "CarID", gated=True),
        ],
        post=[
            ("CreatedAt", lambda ts: F.coalesce(F.col("CreatedAt"), F.col("UpdatedAt"),
                                               F.lit(dt.datetime(2000, 1, 1)))),
            ("UpdatedAt", _ts_fill("UpdatedAt")),
            ("StatusID", lambda ts: F.coalesce(F.col("StatusID"), F.lit(1))),
        ],
        post_after_remaps=True,  # reference remaps before the fills
        drop_after=["OldLocationID", "OldCarID"],
    ),
    # Orders_Payments/Orders/order_packages.py:49-90 — two gated remaps;
    # Name: fillna('') + strip + 'NULL' literal -> ''.
    "order_packages": dict(
        source_table="OrderPackageDetail", watermark_col="OrderPkgDetailID",
        sink_table="OrderDetailPackagesV2",
        rename={"OrderPkgDetailID": "OldOrderPackageDetailID",
                "OrderDetailID": "OldOrderDetailID", "ItemID": "OldItemID"},
        post=[
            ("Name", lambda ts: F.when(
                F.trim(F.col("Name")).isNull()
                | (F.trim(F.col("Name")) == "NULL"), F.lit("")
            ).otherwise(F.trim(F.col("Name")))),
        ],
        remaps=[
            Remap("OrderLineItemsV2Map", "OldOrderDetailID", "OldOrderDetailID",
                  "OrderDetailID", gated=True),
            Remap("ItemsV2Map", "OldItemID", "OldItemID", "ItemID", gated=True),
        ],
        drop_after=["OldOrderDetailID", "OldItemID"],
    ),
    # Invertory/Purchases/purchase_bill_details.py:44-100 — the bill
    # remap carries TaxAmount through from the lookup.
    "purchase_bill_details": dict(
        source_table="BillDetail", watermark_col="BillDetailID",
        sink_table="PurchaseBillDetailsV2",
        rename={"BillDetailID": "OldBillDetailID", "BillID": "OldBillID",
                "ItemID": "OldItemID", "Cost": "CostPerUnit",
                "Price": "PricePerUnit", "CreatedOn": "CreatedAt",
                "LastUpdatedDate": "UpdatedAt"},
        post=[
            ("StatusID", lambda ts: F.coalesce(F.col("StatusID"), F.lit(1))),
            ("UpdatedAt", _ts_fill("UpdatedAt")),
            ("CreatedAt", lambda ts: F.coalesce(F.col("CreatedAt"), F.col("UpdatedAt"))),
        ],
        remaps=[
            Remap("PurchaseBillsV2Map", "OldBillID", "OldBillID",
                  "PurchaseBillID", gated=True, carry=("TaxAmount",)),
            Remap("ItemsV2Map", "OldItemID", "OldItemID", "ItemID", gated=True),
        ],
        drop_after=["OldBillID", "OldItemID", "CreatedBy", "LastUpdatedBy",
                    "Remarks"],
    ),
    # Invertory/Stocks/stock_transfer_details.py:44-105
    "stock_transfer_details": dict(
        source_table="StockIssueDetail", watermark_col="StockIssueDetailID",
        sink_table="StockTransferDetailsV2",
        rename={"StockIssueDetailID": "OldStockIssueDetailID",
                "ItemID": "OldItemID", "StockIssueID": "OldStockIssueID",
                "IssueQty": "TransferredQuantity",
                "RequestQty": "RequestedQuantity",
                "ReceiveQty": "ReceivedQuantity", "CreateOn": "CreatedAt",
                "LastUpdatedDate": "UpdatedAt"},
        strip_to_null=["Notes"],
        post=[
            ("StatusID", lambda ts: F.coalesce(F.col("StatusID"), F.lit(1))),
            ("UpdatedAt", _ts_fill("UpdatedAt")),
            ("CreatedAt", lambda ts: F.coalesce(F.col("CreatedAt"), F.col("UpdatedAt"))),
        ],
        remaps=[
            Remap("ItemsV2Map", "OldItemID", "OldItemID", "ItemID", gated=True),
            Remap("StockTransfersV2Map", "OldStockIssueID", "OldStockIssueID",
                  "StockTransferID", gated=True),
        ],
        drop_after=["OldItemID", "OldStockIssueID", "CreatedBy",
                    "LastUpdatedBy", "Notes"],
    ),
    # Main_Modules/ProductManagement/location_items.py:45-77 — derive the
    # (location, item) junction by chaining item -> category -> account
    # -> locations; the last hop FANS OUT (one account, many locations),
    # so its remap keeps duplicates.
    "location_items": dict(
        source_table="ItemsV2", watermark_col="ItemID",
        sink_table="LocationItemsV2",
        keep=["ItemID", "CategoryID", "Price", "UpdatedAt", "CreatedAt",
              "StatusID"],
        remaps=[
            Remap("CategoriesV2Map", "CategoryID", "CategoryID", "AccountID"),
            Remap("LocationsV2All", "AccountID", "AccountID", "LocationID",
                  dedup=False),
        ],
        drop_after=["CategoryID", "AccountID"],
    ),
    # Main_Modules/Packages/location_packages.py:43-77 — same two-hop
    # fan-out shape over packages.
    "location_packages": dict(
        source_table="PackagesV2", watermark_col="PackageID",
        sink_table="LocationPackagesV2",
        keep=["PackageID", "CategoryID", "Price", "CreatedAt", "UpdatedAt",
              "StatusID"],
        remaps=[
            Remap("CategoriesV2Map", "CategoryID", "CategoryID", "AccountID"),
            Remap("LocationsV2All", "AccountID", "AccountID", "LocationID",
                  dedup=False),
        ],
        drop_after=["CategoryID", "AccountID"],
    ),
}


def build_entity(catalog, name: str) -> IncrementalPipeline:
    """One ENTITY_CONFIGS entry -> a runnable IncrementalPipeline."""
    cfg = dict(ENTITY_CONFIGS[name])
    source_table = cfg.pop("source_table")
    watermark_col = cfg.pop("watermark_col")
    sink_table = cfg.pop("sink_table")
    keep = cfg.pop("keep", None)
    post = cfg.pop("post", ())
    remaps = cfg.pop("remaps", ())
    drop_after = cfg.pop("drop_after", ())
    post_after_remaps = cfg.pop("post_after_remaps", False)

    def apply_post(out, ts):
        for colname, spec in post:
            col = spec if isinstance(spec, Column) else spec(ts)
            out = out.withColumn(colname, col)
        return out

    def apply_remaps(out):
        for rm in remaps:
            lk = catalog.read(rm.lookup_table).select(
                F.col(rm.old_id).alias(rm.on),
                F.col(rm.new_id).alias(rm.new_name or rm.new_id),
                *rm.carry,
            )
            if rm.dedup:
                lk = lk.dropDuplicates([rm.on])
            out = fk_remap(
                out, lk, on=rm.on,
                gate=(rm.new_name or rm.new_id) if rm.gated else None,
                context=f"{name}->{rm.lookup_table}",
            )
        return out

    def transform(df, ts):
        out = df.select(*[c for c in keep if c in df.columns]) if keep else df
        out = dimension_transform(out, ts, **cfg)
        if post_after_remaps:
            out = apply_post(apply_remaps(out), ts)
        else:
            out = apply_remaps(apply_post(out, ts))
        if drop_after:
            out = out.drop(*[c for c in drop_after if c in out.columns])
        return out

    return IncrementalPipeline(
        name=name,
        source=lambda: catalog.read(source_table),
        watermark_col=watermark_col,
        sink_table=sink_table,
        transform=transform,
    )


#: sync_cities.py:58-66 — hand-kept old-spelling -> new-spelling fixes
#: applied to the OLD side before the name join.
CITY_NAME_FIXES = {
    "Sharja": "Sharjah",
    "Sanaa": "Sana'a",
    "Ha il": "Ha'il",
    "Hail": "Ha'il",
    "Ta if": "Ta'if",
    "Kuwait": "Kuwait City",
    "Salala": "Salalah",
    "Masqat": "Muscat",
}

#: sync_payment_modes.py:58-66 — fixes applied to the NEW side.
PAYMENT_MODE_FIXES = {
    "STC Pay": "StcPay",
    "Bank Transfer": "BankTransfer",
    "Credit Card": "Credit",
    "Debit Card": "Card",
}


def _fix_names(mapping):
    """strip + dict.get(x, x) as a crosswalk name cleaner."""
    return lambda c: F.coalesce(ef.recode(F.trim(c), mapping), F.trim(c))


#: Pinned configs for the reference's 7 sync_* scripts. sync_landmarks
#: replicates the INTENDED semantics (join Landmark to LandmarksV2);
#: the reference's copy-paste bug (it joins Amenities,
#: sync_landmarks.py:42-50) is pinned as a negative test instead.
SYNC_CONFIGS: dict[str, dict] = {
    # sync_units.py:42-70
    "sync_units": dict(source_table="Units", lookup_table="UnitsV2",
                       old_id="UnitID", new_id="UnitID",
                       watermark_col="UnitID", sink_table="SyncUnits"),
    # sync_amenities.py:42-70
    "sync_amenities": dict(source_table="Amenities", lookup_table="AmenitiesV2New",
                           old_id="AmenitiesID", new_id="AmenitiesID",
                           watermark_col="AmenitiesID", sink_table="SyncAmenities"),
    # sync_services.py:42-70 (':61 strips the " Service" suffix)
    "sync_services": dict(source_table="Service", lookup_table="ServicesV2New",
                          old_id="ServiceID", new_id="ServiceID",
                          old_name="ServiceTitle", new_name="Name",
                          watermark_col="ServiceID", sink_table="SyncServices",
                          name_cleaner=lambda c: F.regexp_replace(
                              F.trim(c), " Service$", "")),
    # sync_app_sources.py:42-70
    "sync_app_sources": dict(source_table="AppSource",
                             lookup_table="AppSourcesV2New",
                             old_id="AppSourceID", new_id="AppSourceID",
                             watermark_col="AppSourceID",
                             sink_table="SyncAppSourcesOut"),
    # sync_landmarks.py:42-70 (intended semantics; see note above)
    "sync_landmarks": dict(source_table="Landmark", lookup_table="LandmarksV2New",
                           old_id="LandmarkID", new_id="LandmarkID",
                           watermark_col="LandmarkID", sink_table="SyncLandmarks"),
    # sync_cities.py:58-90 — old names get the spelling fixes
    "sync_cities": dict(source_table="City", lookup_table="CitiesV2New",
                        old_id="ID", new_id="CityID",
                        old_name="Name", new_name="CityName",
                        watermark_col="ID", sink_table="SyncCitiesOut",
                        old_cleaner=_fix_names(CITY_NAME_FIXES)),
    # sync_payment_modes.py:58-80 — NEW names get the fixes
    "sync_payment_modes": dict(source_table="PaymentModesOld",
                               lookup_table="PaymentModesV2",
                               old_id="PaymentModeID", new_id="PaymentModeID",
                               watermark_col="PaymentModeID",
                               sink_table="SyncPaymentModes",
                               new_cleaner=_fix_names(PAYMENT_MODE_FIXES)),
}


def build_sync(catalog, name: str) -> IncrementalPipeline:
    return sync_crosswalk_pipeline(catalog, name=name, **SYNC_CONFIGS[name])


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
