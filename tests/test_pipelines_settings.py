"""End-to-end tests for the settings/users/products pipeline shapes."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_migration_etl_scripts_spark.catalog import Catalog
from data_migration_etl_scripts_spark.cdc import run_incremental
from data_migration_etl_scripts_spark.gates import IncrementalDependencyError
from data_migration_etl_scripts_spark.pipelines import (
    account_payment_pipeline,
    items_pipeline,
    roles_claims_transform,
    subscriptions_pipeline,
    subusers_pipeline,
)

from tests.v1fixtures import build_v1_fixtures_extra

TS = dt.datetime(2026, 1, 1, 12, 0, 0)


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(spark, base_dir=str(tmp_path), scratch_dir=str(tmp_path))
    build_v1_fixtures_extra(c)
    return c


def test_subscriptions_recode_and_expiry(cat):
    run_incremental(cat, subscriptions_pipeline(cat), batch_size=None, batch_ts=TS)
    got = {r.UserPackageDetailID: r for r in cat.read("SubscriptionsV2").collect()}
    assert got[1].SubscriptionType == "FREE"
    assert got[2].SubscriptionType == "PROF"
    assert got[3].SubscriptionType == "FREE"  # null -> default
    assert got[1].ExpiryDate == dt.datetime(2026, 3, 1)  # +1 year
    assert got[2].ExpiryDate == dt.datetime(2027, 1, 1)  # kept
    assert got[3].ExpiryDate == dt.datetime(2025, 2, 28)  # leap-day clamp


def test_roles_claims_unpivot_and_lookup(cat):
    claims = {
        ("Users", "New"): "POST:users",
        ("Users", "Edit"): "PUT:users",
        ("Users", "Access"): "GET:users",
        ("Cancel Order", "Access"): "GET:orders/cancel",
    }
    out = roles_claims_transform(cat.read("RoleGroupForms"), claims).collect()
    got = {(r.GroupID, r.FormName, r.ClaimType): r.ClaimValue for r in out}
    # only granted flags become claims; group 2 granted nothing
    assert got == {
        (1, "Users", "New"): "POST:users",
        (1, "Users", "Edit"): "PUT:users",
        (1, "Users", "Access"): "GET:users",
        (1, "Cancel Order", "Access"): "GET:orders/cancel",
    }


def test_subusers_normalization(cat):
    run_incremental(cat, subusers_pipeline(cat), batch_size=None, batch_ts=TS)
    got = {r.SubUserID: r for r in cat.read("SubUsersV2").collect()}
    assert got[1].Email == "ali@x.com"
    assert got[1].NormalizedEmail == "ALI@X.COM"
    assert got[1].ContactNo == "+966501234567"
    assert got[1].CityID == 12
    assert got[2].NormalizedEmail is None
    assert got[2].ContactNo is None  # 'junk' has no digits
    assert got[2].CityID is None  # 'x9' not numeric
    assert got[1].CreatedAt == TS


def test_account_payment_cross_seed(cat):
    run_incremental(cat, account_payment_pipeline(cat), batch_size=None, batch_ts=TS)
    out = cat.read("AccountPaymentModesV2")
    assert out.count() == 6  # 2 accounts x 3 modes
    assert out.select("AccountID").distinct().count() == 2


def test_items_pipeline_full_shape(cat):
    # dangling SubCatID=99 (item 5) must abort the whole batch
    with pytest.raises(IncrementalDependencyError):
        run_incremental(cat, items_pipeline(cat), batch_size=None, batch_ts=TS)
    assert not cat.exists("ItemsV2")

    # drop the orphan -> loads clean (materialize before overwriting the
    # same path — Spark reads lazily from the files being replaced)
    fixed = cat.read("Items").where(F.col("ItemID") != 5)
    rows = fixed.collect()
    cat.write(cat.spark.createDataFrame(rows, fixed.schema), "Items", mode="overwrite")
    run_incremental(cat, items_pipeline(cat), batch_size=None, batch_ts=TS)
    v2 = {r.ItemID: r for r in cat.read("ItemsV2").collect()}
    # dedup on (CategoryID, Name): items 1,2 share (100, 'Oil 5W30');
    # same StatusID -> higher Price wins -> item 2
    assert 2 in v2 and 1 not in v2
    assert v2[2].ItemTypeID == 2  # 'oil filter' -> normalized 'oilfilter'
    assert v2[3].Name is None  # 'NULL' scrubbed
    assert v2[3].ItemTypeID == 4  # unknown type -> default
    assert v2[4].Price == 30.0  # string-numeric coerced
    sync = cat.read("SyncItems")
    assert sync.columns == ["OldItemID", "CategoryID", "Name"]
    assert sync.count() == 3


# ------------------------------------------------------ inventory chain


@pytest.fixture()
def inv_cat(spark, tmp_path):
    from tests.v1fixtures import build_v1_fixtures_inventory

    c = Catalog(spark, base_dir=str(tmp_path), scratch_dir=str(tmp_path))
    build_v1_fixtures_inventory(c)
    return c


def test_stock_transfers_role_playing_join(inv_cat):
    from data_migration_etl_scripts_spark.pipelines import stock_transfers_pipeline

    run_incremental(inv_cat, stock_transfers_pipeline(inv_cat), batch_size=None, batch_ts=TS)
    got = {r.StockIssueID: r for r in inv_cat.read("StockTransfersV2").collect()}
    assert (got[1].SourceWarehouseID, got[1].DestinationWarehouseID) == (501, 502)
    assert (got[2].SourceWarehouseID, got[2].DestinationWarehouseID) == (503, 501)


def test_purchase_bills_nullable_fk_does_not_gate(inv_cat):
    from data_migration_etl_scripts_spark.pipelines import purchase_bills_pipeline

    run_incremental(inv_cat, purchase_bills_pipeline(inv_cat), batch_size=None, batch_ts=TS)
    got = {r.BillID: r for r in inv_cat.read("PurchaseBillsV2").collect()}
    assert got[1].NewSupplierID == 9011 and got[1].NewPurchaseOrderID == 8021
    assert got[2].NewPurchaseOrderID is None  # null PO passes through
    assert got[3].NewPurchaseOrderID is None  # dangling PO: no gate, null
    assert got[3].WarehouseID == 503          # but store remap gated and resolved


def test_stocks_typo_repair_and_defaults(inv_cat):
    from data_migration_etl_scripts_spark.pipelines import stocks_pipeline

    run_incremental(inv_cat, stocks_pipeline(inv_cat), batch_size=None, batch_ts=TS)
    got = {r.StockID: r for r in inv_cat.read("StocksV2").collect()}
    assert "StatusID" in inv_cat.read("StocksV2").columns  # typo renamed
    assert got[1].CurrentStock == 12.5
    assert got[2].CurrentStock == 0.0 and got[2].StatusID == 1
    assert got[3].CurrentStock == 0.0  # 'x' coerces to null -> 0
    assert got[2].CreatedAt == TS


# --------------------------------------------------- geo + multimodal


def test_countries_large_map_recode(spark, tmp_path):
    from data_migration_etl_scripts_spark.pipelines import countries_pipeline

    c = Catalog(spark, base_dir=str(tmp_path), scratch_dir=str(tmp_path))
    c.write(
        spark.createDataFrame(
            [
                (1, "SA", " Saudi Arabia ", "SAR"),
                (2, "EGY", "Egypt", "EGP"),     # already alpha-3: kept as-is
                (3, "X", "Mystery", None),      # not mappable, length != 3 -> dropped
                (4, "GB", "United Kingdom", "GBP"),
            ],
            "CountryRowID long, Code string, Name string, Curr_Code string",
        ),
        "Country",
    )
    run_incremental(c, countries_pipeline(c), batch_size=None, batch_ts=TS)
    got = {r.Code: r for r in c.read("CountriesV2").collect()}
    assert set(got) == {"SAU", "EGY", "GBR"}
    assert got["SAU"].Name == "Saudi Arabia"


def test_warehouses_flags_and_defaults(spark, tmp_path):
    from data_migration_etl_scripts_spark.pipelines import warehouses_pipeline

    c = Catalog(spark, base_dir=str(tmp_path), scratch_dir=str(tmp_path))
    c.write(
        spark.createDataFrame(
            [
                (1, "Main", "Main Store", None, None),
                (2, "Aux", "Sub Store", 7, None),
            ],
            "StoreID long, Name string, Type string, StoreLocationID long,"
            " LastUpdatedDate timestamp",
        ),
        "Stores",
    )
    run_incremental(c, warehouses_pipeline(c), batch_size=None, batch_ts=TS)
    got = {r.StoreID: r for r in c.read("WarehousesV2").collect()}
    assert got[1].IsMainStore is True and got[2].IsMainStore is False
    assert got[1].StoreLocationID == 4  # 41%-null default
    assert got[2].StoreLocationID == 7


# ------------------------------------------------------ config registry


def test_registry_configs_build_and_run(spark, tmp_path):
    """Every registry config wires a runnable pipeline; spot-run a
    dimension and a gated entity on minimal fixtures."""
    from data_migration_etl_scripts_spark.pipelines import registry as rg

    c = Catalog(spark, base_dir=str(tmp_path), scratch_dir=str(tmp_path))

    # all configs at least construct against an empty catalog
    for name in rg.DIMENSION_CONFIGS:
        assert rg.build_dimension(c, name).name == name
    for name in rg.GATED_ENTITY_CONFIGS:
        assert rg.build_gated_entity(c, name).name == name

    # models: coercions + image recode
    c.write(
        spark.createDataFrame(
            [(1, 1, " Corolla ", "2020", "4.5", "-1"),
             (2, 1, "Civic", "x", None, "c.png")],
            "ModelID long, MakeID long, Name string, Year string,"
            " RecommendedLitres string, ImagePath string",
        ),
        "Model",
    )
    run_incremental(c, rg.build_dimension(c, "models"), batch_size=None, batch_ts=TS)
    got = {r.OldModelID: r for r in c.read("ModelsV2").collect()}
    assert got[1].Name == "Corolla" and got[1].Year == 2020.0
    assert got[1].ImagePath is None
    assert got[2].Year is None  # 'x' coerced to null

    # bays: gated location remap aborts on dangling FK, passes when clean
    c.write(
        spark.createDataFrame([(10, 5010)], "OldLocationID long, LocationID long"),
        "LocationsV2Lookup",
    )
    c.write(
        spark.createDataFrame(
            [(1, "Bay 1", 10), (2, "Bay 2", 99)],
            "BayID long, BayName string, LocationID long",
        ),
        "Bay",
    )
    with pytest.raises(IncrementalDependencyError):
        run_incremental(c, rg.build_gated_entity(c, "bays"), batch_size=None, batch_ts=TS)
    c.write(
        spark.createDataFrame(
            [(1, "Bay 1", 10)], "BayID long, BayName string, LocationID long"
        ),
        "Bay",
        mode="overwrite",
    )
    run_incremental(c, rg.build_gated_entity(c, "bays"), batch_size=None, batch_ts=TS)
    assert c.read("BaysV2").collect()[0].NewLocationID == 5010
