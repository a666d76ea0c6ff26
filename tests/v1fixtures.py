"""Deterministic V1-shaped fixture tables (FIXTURES.md) written into a
test catalog's scratch area. Small, explicit, and dirty in exactly the
ways the reference's data is: 'NULL' literals, whitespace, VARCHAR
dates in two formats, dangling FKs, case-duplicate names, div-by-zero
quantities.
"""

from __future__ import annotations

from pyspark.sql import types as T

from data_migration_etl_scripts_spark.catalog import Catalog


def _write(cat: Catalog, name: str, rows, schema) -> None:
    cat.write(cat.spark.createDataFrame(rows, schema), name, mode="overwrite")


def build_v1_fixtures(cat: Catalog) -> None:
    # --- dimensions -------------------------------------------------
    _write(
        cat,
        "Make",
        [
            (1, "  Toyota ", "تويوتا", "-1", "2020-01-01 00:00:00"),
            (2, "Honda", None, "h.png", None),
            (3, "   ", "نيسان", None, "2021-05-05 00:00:00"),
        ],
        "MakeID long, Name string, ArabicName string, ImagePath string, CreatedOn string",
    )
    _write(
        cat,
        "Units",
        [(1, "Litre"), (2, "Piece"), (3, "Box")],
        "UnitID long, Name string",
    )
    _write(
        cat,
        "UnitsV2",  # freshly-migrated V2 table the sync build joins to
        [(101, "Litre"), (102, "Piece"), (104, "litre")],  # case matters (CS join)
        "UnitID long, Name string",
    )

    # --- cities / sync ---------------------------------------------
    _write(
        cat,
        "SyncCities",
        # new V2 CityID <- old V1 city id (4101 = the reference's
        # default old-domain city for SA rows with no city)
        [(11, 4101, "SA"), (12, 4102, "SA")],
        "CityID long, OldCityID long, CountryID string",
    )

    # --- locations + satellites ------------------------------------
    _write(
        cat,
        "Locations",
        [
            # (id, user, country, name, contact, city, landmark, lat, lon, updated, account)
            (10, 1, "SA", "Loc A", "0501234567", 4101, 2, "24.5", "46.7", "2024-01-01 00:00:00", 900),
            (11, 1, "SA", "Loc B", "no-phone", None, 9, "1200.0", "46.7", None, 900),
            (12, 2, "AE", "Loc C", "9665000000", 4102, None, None, None, None, 901),
        ],
        "LocationID long, UserID long, CountryID string, Name string, ContactNo string,"
        " CityID long, LandmarkID int, Latitude string, Longitude string,"
        " LastUpdatedDate string, AccountID long",
    )
    _write(
        cat,
        "LocationAmenitiesJunc",
        [(10, 1), (10, 2), (10, 2), (11, 1)],  # duplicate pair
        "LocationID long, AmenitiesID long",
    )
    _write(
        cat,
        "LocationWorkingHours",
        [(10, "Mon", "9-5"), (10, "Tue", "9-5"), (12, "Fri", "closed")],
        "LocationID long, Name string, Time string",
    )
    _write(
        cat,
        "Receipt",
        [
            (1, 10, "fb.com/a", None, "  "),
            (2, 11, None, None, None),
        ],
        "ReceiptID long, LocationID long, Facebook string, Twitter string, Instagram string",
    )

    # --- categories -------------------------------------------------
    _write(
        cat,
        "Category",
        [
            # duplicate (account-derived, name) at different StatusID
            (100, 10, "Oil", 2),
            (101, 10, "Oil", 1),   # survives (lowest StatusID)
            (102, 11, "Tyres", 1),
            (103, 12, "Oil", 1),   # different account -> kept
        ],
        "CategoryID long, LocationID long, Name string, StatusID int",
    )

    # --- cars -------------------------------------------------------
    _write(
        cat,
        "Cars",
        [
            (1, "May 29 2020 8:39AM", "NULL"),
            (2, "NULL", "3/3/2025 1:28:20 PM"),
            (3, None, None),  # backfilled from junction
            (4, "garbage date", None),  # unparseable -> fallback
        ],
        "CarID long, CreatedOn string, LastUpdatedDate string",
    )
    junc_schema = T.StructType(
        [
            T.StructField("CarLocationID", T.LongType()),
            T.StructField("CarID", T.LongType()),
            T.StructField("CreatedOn", T.TimestampType()),
            T.StructField("LocationID", T.LongType()),
            T.StructField("StatusID", T.IntegerType()),
            T.StructField("LastUpdatedDate", T.TimestampType()),
        ]
    )
    import datetime as dt

    _write(
        cat,
        "CarsLocationJunc",
        [
            (1, 3, dt.datetime(2021, 7, 7, 10, 0, 0), 10, None,
             dt.datetime(2025, 1, 2, 0, 0, 0)),
            # earliest CreatedOn wins (cars backfill); null LastUpdatedDate
            # -> batch_ts fill in car_locations
            (2, 3, dt.datetime(2021, 1, 1, 9, 0, 0), 11, 1, None),
            (3, 1, dt.datetime(2022, 2, 2, 8, 0, 0), 12, 2,
             dt.datetime(2025, 1, 3, 0, 0, 0)),
        ],
        junc_schema,
    )

    # --- orders chain ----------------------------------------------
    _write(
        cat,
        "Orders",
        [
            (1000, 10, "New", "2025-02-01 10:00:00"),
            (1001, 11, "New", "2025-02-02 11:00:00"),
            (1002, 12, "New", None),
        ],
        "OrderID long, LocationID long, OrderType string, CreatedOn string",
    )
    import datetime as _dt

    _write(
        cat,
        "OrderCheckout",
        [
            # order 1000: two checkout rows; all three money cols present
            (1, 1000, 100.0, 15.0, 115.0, 115.0, 0.0, 1, 7,
             " ok ", 1, _dt.datetime(2025, 2, 1, 10, 5, 0)),
            (2, 1000, 50.0, 5.0, 55.0, 0.0, 0.0, 1, 7, None, 1, None),
            # order 1001: grand total missing -> derived (st - disc + tax)
            (3, 1001, 200.0, 20.0, 0.0, 100.0, 10.0, 2, 7, "part pay", 2,
             _dt.datetime(2025, 2, 2, 11, 0, 0)),
            # order 1002: subtotal missing -> derived (gt - tax + disc);
            # null PaymentMode -> order_payments fills 1
            (4, 1002, 0.0, 30.0, 330.0, 330.0, 0.0, None, 8, None, None, None),
        ],
        "OrderCheckOutID long, OrderID long, AmountTotal double, Tax double,"
        " GrandTotal double, AmountPaid double, AmountDiscount double,"
        " PaymentMode int, AppSourceID int, Remarks string, OrderStatus int,"
        " CreatedOn timestamp",
    )
    _write(
        cat,
        "LocationsV2Lookup",
        [(10, 5010), (11, 5011), (12, 5012)],
        "OldLocationID long, LocationID long",
    )
    _write(
        cat,
        "OrderDetail",
        [
            (1, 1000, 1, 4.0, 200.0, 0.0),
            (2, 1000, 2, 0.0, 80.0, 80.0),   # qty 0 + 100% discount
            (3, 1001, None, 2.0, 100.0, 10.0),  # open item
        ],
        "OrderDetailID long, OrderID long, ItemID long, Quantity double,"
        " Price double, DiscountAmount double",
    )


def build_v1_fixtures_extra(cat: Catalog) -> None:
    """Settings/users/products fixtures (FIXTURES.md §2, §5)."""
    import datetime as dt

    _write(
        cat,
        "UserPackageDetails",
        [
            (1, 10, 1, dt.datetime(2025, 3, 1), None),
            (2, 11, 2, dt.datetime(2025, 4, 1), dt.datetime(2027, 1, 1)),
            (3, 12, None, dt.datetime(2024, 2, 29), None),  # leap-day +1y
        ],
        "UserPackageDetailID long, UserID long, PackageInfoID int,"
        " CreatedDate timestamp, ExpiryDate timestamp",
    )
    _write(
        cat,
        "RoleGroupForms",
        [
            (1, "Users", True, False, True, True),
            (1, "Cancel Order", False, False, False, True),
            (2, "Users", False, False, False, False),
        ],
        "GroupID long, FormName string, New boolean, Remove boolean,"
        " Edit boolean, Access boolean",
    )
    _write(
        cat,
        "SubUsers",
        [
            (1, 10, " ali@x.com ", "Ali", "0501234567", "12", None),
            (2, 10, None, "Badr", "junk", "x9", dt.datetime(2025, 5, 5)),
        ],
        "SubUserID long, UserID long, Email string, UserName string,"
        " ContactNo string, CityID string, LastUpdatedDate timestamp",
    )
    _write(cat, "Accounts", [(900,), (901,)], "AccountID long")
    _write(
        cat,
        "PaymentModes",
        [(1,), (2,), (3,)],
        "PaymentModeID long",
    )
    _write(
        cat,
        "SubCategory",
        [(70, 100), (71, 101)],
        "SubCatID long, CategoryID long",
    )
    _write(
        cat,
        "Items",
        [
            (1, 70, "Oil 5W30", "Oil", 10.0, "50.5", 1),
            (2, 70, "Oil 5W30", "oil filter", 20.0, "60.0", 1),  # dup name, higher price... same status
            (3, 70, "NULL", "unknown thing", None, "x", 2),      # 'NULL' name scrubbed
            (4, 71, "Brake Pad", "OIL FILTER", 1.0, "30", None),
            (5, 99, "Orphan", "oil", 1.0, "5", 1),               # dangling SubCatID
        ],
        "ItemID long, SubCatID long, Name string, ItemType string,"
        " Cost double, Price string, StatusID int",
    )


def build_v1_fixtures_inventory(cat: Catalog) -> None:
    """Inventory-chain fixtures (FIXTURES.md §4)."""
    _write(
        cat,
        "Warehouses",
        [(1, 501), (2, 502), (3, 503)],
        "OldStoreID long, WarehouseID long",
    )
    _write(
        cat,
        "StockIssue",
        [(1, 1, 2), (2, 3, 1)],
        "StockIssueID long, FromStoreID long, ToStoreID long",
    )
    _write(
        cat,
        "SuppliersV2",
        [(11, 9011), (12, 9012)],
        "OldSupplierID long, SupplierID long",
    )
    _write(
        cat,
        "PurchaseOrdersV2",
        [(21, 8021)],
        "OldPurchaseOrderID long, PurchaseOrderID long",
    )
    _write(
        cat,
        "Bill",
        [
            (1, 11, 1, 21),
            (2, 12, 2, None),   # 81%-null PO: must NOT gate
            (3, 11, 3, 999),    # dangling PO: propagates as null-new-id, no gate
        ],
        "BillID long, SupplierID long, StoreID long, PurchaseOrderID long",
    )
    _write(
        cat,
        "Stock",
        [
            (1, 1, "12.5", 1, None),
            (2, 1, None, None, None),   # missing stock -> 0, status -> 1
            (3, 2, "x", 2, None),
        ],
        "StockID long, StoreID long, CurrentStock string, StutusID int,"
        " CreatedOn timestamp",
    )


def build_v1_fixtures_registry(cat: Catalog) -> None:
    """Fixtures for the ENTITY_CONFIGS / SYNC_CONFIGS / custom-pipeline
    coverage of the remaining reference scripts (accounts, customers,
    car_locations, order_payments/packages, bill/stock details,
    location_items/packages, subcategories, cities, pinned sync_*)."""
    import datetime as dt

    t = dt.datetime(2025, 6, 1, 8, 0, 0)

    # accounts (Main_Modules/Accounts/accounts.py)
    _write(
        cat,
        "Users",
        [
            (1, " Sara ", " Haddad ", "-1", "  Acme Motors ", "Garage", " a@b.c ",
             "0501234567", t, 1, None, dt.datetime(2024, 1, 1), "300123", None),
            (2, "Omar", None, "u2.png", None, None, None, "junk", None, 2,
             "C2", None, "x", "b.png"),
        ],
        "UserID long, FirstName string, LastName string, ImagePath string,"
        " Company string, BusinessType string, Email string, ContactNo string,"
        " LastUpdatedDate timestamp, StatusID int, CompanyCode string,"
        " CreatedDate timestamp, VATNO string, BrandThumbnailImage string",
    )

    # customers (Main_Modules/AspNetUsers/customers.py) + geo chain
    _write(
        cat,
        "Customers",
        [
            (1, " Ali Kareem ", None, "hash1", " ali@x.com ", "0501234567",
             10, None, dt.datetime(2024, 5, 1), t),
            (2, "Noor", "-", "hash2", None, None, None, 2, None, None),
        ],
        "CustomerID long, FullName string, ImagePath string, Password string,"
        " Email string, Mobile string, LocationID long, StatusID int,"
        " CreatedOn timestamp, LastUpdatedDate timestamp",
    )
    _write(
        cat,
        "LocationsV2All",
        # (old location, new location, city, account) — serves customers
        # (OldLocationID -> CityID) AND location_* (AccountID -> LocationID fan-out)
        [(10, 5010, 4101, 900), (11, 5011, 4102, 900), (12, 5012, None, 901)],
        "OldLocationID long, LocationID long, CityID long, AccountID long",
    )
    _write(cat, "CitiesV2", [(4101, 966), (4102, 971)], "CityID long, CountryID long")

    # car_locations lookups
    _write(
        cat,
        "CarsV2Map",
        [(1, 901), (2, 902), (3, 903), (4, 904)],
        "OldCarID long, CarID long",
    )

    # order_packages (Orders_Payments/Orders/order_packages.py)
    _write(
        cat,
        "OrderPackageDetail",
        [(1, 1, 1, " Widget "), (2, 2, 2, "NULL"), (3, 3, 4, None)],
        "OrderPkgDetailID long, OrderDetailID long, ItemID long, Name string",
    )
    _write(
        cat,
        "OrderLineItemsV2Map",
        [(1, 9001), (2, 9002), (3, 9003)],
        "OldOrderDetailID long, OrderDetailID long",
    )
    _write(
        cat,
        "ItemsV2Map",
        [(1, 801), (2, 802), (3, 803), (4, 804), (5, 805), (50, 850)],
        "OldItemID long, ItemID long",
    )

    # purchase_bill_details (Invertory/Purchases/purchase_bill_details.py)
    _write(
        cat,
        "BillDetail",
        [
            (1, 100, 1, 5.0, 7.5, dt.datetime(2024, 3, 1), None, 1, "u1", "u2", "note"),
            (2, 101, 2, 3.0, 4.0, None, t, None, None, None, None),
        ],
        "BillDetailID long, BillID long, ItemID long, Cost double, Price double,"
        " CreatedOn timestamp, LastUpdatedDate timestamp, StatusID int,"
        " CreatedBy string, LastUpdatedBy string, Remarks string",
    )
    _write(
        cat,
        "PurchaseBillsV2Map",
        [(100, 7100, 0.15), (101, 7101, 0.0)],
        "OldBillID long, PurchaseBillID long, TaxAmount double",
    )

    # stock_transfer_details (Invertory/Stocks/stock_transfer_details.py)
    _write(
        cat,
        "StockIssueDetail",
        [
            (1, 50, 1, 10.0, 12.0, 9.0, dt.datetime(2024, 4, 1), None, None,
             "u1", "u2", "  keep  "),
            (2, 51, 2, 1.0, 1.0, 1.0, None, t, 2, None, None, None),
        ],
        "StockIssueDetailID long, StockIssueID long, ItemID long, IssueQty double,"
        " RequestQty double, ReceiveQty double, CreateOn timestamp,"
        " LastUpdatedDate timestamp, StatusID int, CreatedBy string,"
        " LastUpdatedBy string, Notes string",
    )
    _write(
        cat,
        "StockTransfersV2Map",
        [(50, 6050), (51, 6051)],
        "OldStockIssueID long, StockTransferID long",
    )

    # subcategories / location_items / location_packages
    _write(
        cat,
        "SyncCategories",
        [(900, "Oil", 100), (901, "Tyres", 101)],
        "AccountID long, Name string, OldCategoryID long",
    )
    _write(
        cat,
        "CategoriesV2Map",
        [(201, 900, "Oil"), (202, 901, "Tyres")],
        "CategoryID long, AccountID long, Name string",
    )
    # cities + sync_cities (Template_Tables/cities.py, sync_cities.py)
    _write(
        cat,
        "City",
        [
            # codes are alpha-3 except the legacy 'SA' quirk (cities.py:81)
            (1, " Riyadh ", None, "SA"),
            (2, "Dubai", "Deira", "ARE"),
            (3, "Nowhere", None, "XXX"),    # unknown country -> dropped
            (4, "Sharja", None, "ARE"),     # old spelling, fixed by sync map
        ],
        "ID long, Name string, District string, CountryCode string",
    )
    _write(cat, "CountriesV2", [(966, "SAU"), (971, "ARE")], "CountryID long, Code string")
    _write(
        cat,
        "CitiesV2New",
        [(11, "Riyadh"), (12, "Dubai"), (13, "Sharjah")],
        "CityID long, CityName string",
    )

    # sync_payment_modes (Template_Tables/sync_payment_modes.py)
    _write(
        cat,
        "PaymentModesOld",
        [(1, " Cash "), (2, "StcPay"), (3, "Cheque")],
        "PaymentModeID long, Name string",
    )
    _write(
        cat,
        "PaymentModesV2",
        [(21, "Cash"), (22, "STC Pay")],
        "PaymentModeID long, Name string",
    )

    # order_payments (Orders_Payments/Orders/order_payments.py)
    _write(
        cat,
        "OrdersV2Map",
        [(1000, 9100), (1001, 9101), (1002, 9102)],
        "OldOrderID long, OrderID long",
    )
    _write(
        cat,
        "SyncAppSources",
        [(7, 70), (8, 80)],
        "OldAppSourceID long, AppSourceID long",
    )


def build_v1_fixtures_dag_close(cat: Catalog) -> None:
    """Source tables for the pipelines that close the 36-script DAG:
    template dims (models, countries, amenities, services, landmarks,
    app_sources, suppliers, reconciliations), their sync_* V2 lookups,
    the gated entities (bays, customer_locations, packages chain,
    purchase_orders), and roles. Dirty in the reference's ways."""
    import datetime as dt

    t = dt.datetime(2025, 6, 1, 8, 0, 0)

    # Template_Tables/models.py
    _write(
        cat,
        "Model",
        [
            (1, 1, " Corolla ", "2020", "4.5", "-1"),
            (2, 1, "Civic", "x", None, "c.png"),
            (3, 2, "NULL", None, "3.0", None),
        ],
        "ModelID long, MakeID long, Name string, Year string,"
        " RecommendedLitres string, ImagePath string",
    )
    # Template_Tables/countries.py (alpha-2 -> alpha-3 recode + filter)
    _write(
        cat,
        "Country",
        [
            (1, "SA", " Saudi Arabia ", "SAR"),
            (2, "EGY", "Egypt", "EGP"),
            (3, "X", "Mystery", None),      # unmappable, dropped
            (4, "GB", "United Kingdom", "GBP"),
        ],
        "CountryRowID long, Code string, Name string, Curr_Code string",
    )
    # Template_Tables/amenities.py + sync_amenities.py
    _write(
        cat,
        "Amenities",
        [(1, " WiFi ", "  "), (2, "Parking", "NULL"), (3, "Cafe", " open ")],
        "AmenitiesID long, Name string, Description string",
    )
    _write(
        cat,
        "AmenitiesV2New",
        [(31, "WiFi"), (32, "Parking")],
        "AmenitiesID long, Name string",
    )
    # Template_Tables/services.py + sync_services.py (' Service' suffix)
    _write(
        cat,
        "Service",
        [(1, " Oil Change Service "), (2, "Tyre Rotation"), (3, "Wash Service")],
        "ServiceID long, ServiceTitle string",
    )
    _write(
        cat,
        "ServicesV2New",
        [(41, "Oil Change"), (42, "Wash")],
        "ServiceID long, Name string",
    )
    # Template_Tables/landmarks.py + sync_landmarks.py
    _write(
        cat,
        "Landmark",
        [(1, " Mall "), (2, "Airport"), (9, "Old Tower")],
        "LandmarkID long, Name string",
    )
    _write(
        cat,
        "LandmarksV2New",
        [(51, "Mall"), (52, "Airport")],
        "LandmarkID long, Name string",
    )
    # Template_Tables/app_sources.py + sync_app_sources.py
    _write(
        cat,
        "AppSource",
        [(7, " iOS "), (8, "Android"), (9, "Web")],
        "AppSourceID long, Name string",
    )
    _write(
        cat,
        "AppSourcesV2New",
        [(70, "iOS"), (80, "Android")],
        "AppSourceID long, Name string",
    )
    # Invertory/Suppliers/suppliers.py
    _write(
        cat,
        "Supplier",
        [
            (11, " Gulf Parts ", " a@gulf.example ", " Hamid ", "  ", None),
            (12, "Desert Oil", None, "NULL", " POB 9 ", 2),
        ],
        "SupplierID long, Name string, Email string, ContactPerson string,"
        " Address string, StatusID int",
    )
    # Invertory/Reconciliations/reconciliations.py
    _write(
        cat,
        "Reconciliation",
        [(1, " shrinkage ", None), (2, "  ", 2), (3, None, None)],
        "ReconciliationID long, Reason string, StatusID int",
    )
    # Main_Modules/Bays/bays.py — all FKs resolvable (gated; a dangling
    # row would abort the whole DAG run)
    _write(
        cat,
        "Bay",
        [(1, "Bay 1", 10), (2, "Bay 2", 11), (3, "Bay 3", 12)],
        "BayID long, BayName string, LocationID long",
    )
    # Main_Modules/AspNetUsers/customer_locations.py (gateless remap;
    # note the reference's 'LocationId' casing)
    _write(
        cat,
        "CustomerLocationJunc",
        [(1, 1, 10, t), (2, 1, 11, None), (3, 2, None, None)],
        "CustomerLocationID long, CustomerID long, LocationId long,"
        " CreatedOn timestamp",
    )
    # Main_Modules/Packages/packages.py — SubCategoryID must resolve
    _write(
        cat,
        "Packages",
        [
            (1, 70, " Oil Combo ", "89.5", 1, t),
            (2, 71, "NULL", "120", None, None),
        ],
        "PackageID long, SubCategoryID long, Name string, Price string,"
        " StatusID int, UpdatedAt timestamp",
    )
    # Main_Modules/Packages/package_details.py + the target-side
    # crosswalk (stand-in for the DB identity map, like OrdersV2Map)
    _write(
        cat,
        "PackageDetails",
        [(1, 1, 1, 2.0), (2, 1, 2, 1.0), (3, 2, 4, 3.0)],
        "PackageDetailID long, PackageID long, ItemID long, Quantity double",
    )
    _write(
        cat,
        "PackagesSync",
        [(1, 7001), (2, 7002)],
        "OldPackageID long, NewPackageID long",
    )
    # Invertory/Purchases/purchase_orders.py — suppliers resolvable
    _write(
        cat,
        "PurchaseOrder",
        [(21, 11, " first po ", t), (22, 12, None, None)],
        "PurchaseOrderID long, SupplierID long, Remarks string,"
        " CreatedOn timestamp",
    )


def build_v1_fixtures_migrated_products(cat: Catalog) -> None:
    """Standalone migrated-side product tables for the location_items /
    location_packages unit tests. NOT part of the registry set: in the
    full DAG these names are the items/packages pipeline SINKS."""
    import datetime as dt

    t = dt.datetime(2025, 6, 1, 8, 0, 0)
    _write(
        cat,
        "ItemsV2",
        [
            (1, 201, 10.0, t, t, 1),
            (2, 202, 20.0, None, None, 1),
            (3, 203, 30.0, None, None, 2),  # unknown category -> null LocationID
        ],
        "ItemID long, CategoryID long, Price double, UpdatedAt timestamp,"
        " CreatedAt timestamp, StatusID int",
    )
    _write(
        cat,
        "PackagesV2",
        [(1, 201, 99.0, t, t, 1), (2, 203, 50.0, None, None, 1)],
        "PackageID long, CategoryID long, Price double, CreatedAt timestamp,"
        " UpdatedAt timestamp, StatusID int",
    )
