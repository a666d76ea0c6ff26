"""Inventory-chain pipeline shapes.

Reference ``Invertory/`` module: warehouses -> purchase_orders ->
purchase_bills -> bill_details -> stocks -> stock_transfers ->
transfer_details -> reconciliations. The distinctive shapes:

- J7 role-playing dim: warehouses joined TWICE as source/destination
  (``Invertory/Stocks/stock_transfers.py:73-80``);
- chained gated remaps with a nullable FK that must NOT gate
  (``purchase_bills.py:87-99`` — ~81% of bills have no purchase
  order, so that join is gateless while supplier/store gate);
- the stocks source-typo repair (``stocks.py:46`` selects
  ``StutusID``; we rename it on ingest instead of crashing like the
  reference would — SURVEY.md §5 'latent defects').
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_migration_etl_scripts_spark import functions as ef
from data_migration_etl_scripts_spark.cdc import IncrementalPipeline
from data_migration_etl_scripts_spark.operators import fk_remap


def stock_transfers_transform(
    batch: DataFrame, warehouse_lookup: DataFrame
) -> DataFrame:
    """J7: one warehouse crosswalk joined twice under role aliases."""
    src = warehouse_lookup.select(
        F.col("OldStoreID").alias("FromStoreID"),
        F.col("WarehouseID").alias("SourceWarehouseID"),
    ).dropDuplicates(["FromStoreID"])
    dst = warehouse_lookup.select(
        F.col("OldStoreID").alias("ToStoreID"),
        F.col("WarehouseID").alias("DestinationWarehouseID"),
    ).dropDuplicates(["ToStoreID"])
    out = fk_remap(batch, src, on="FromStoreID", gate="SourceWarehouseID",
                   context="stock_transfers->warehouses(source)")
    return fk_remap(out, dst, on="ToStoreID", gate="DestinationWarehouseID",
                    context="stock_transfers->warehouses(destination)")


def stock_transfers_pipeline(
    catalog, name: str = "stock_transfers", sink_table: str = "StockTransfersV2"
) -> IncrementalPipeline:
    return IncrementalPipeline(
        name=name,
        source=lambda: catalog.read("StockIssue"),
        watermark_col="StockIssueID",
        sink_table=sink_table,
        transform=lambda df, ts: stock_transfers_transform(
            df, catalog.read("Warehouses")
        ),
    )


def purchase_bills_transform(
    batch: DataFrame,
    supplier_lookup: DataFrame,
    warehouse_lookup: DataFrame,
    po_lookup: DataFrame,
) -> DataFrame:
    """Chained remaps: supplier and store GATE; purchase order is a
    legitimately-nullable FK (81% null in production) so its remap is
    gateless and the null simply propagates."""
    out = fk_remap(
        batch,
        supplier_lookup.dropDuplicates(["SupplierID"]),
        on="SupplierID",
        gate="NewSupplierID",
        context="purchase_bills->suppliers",
    )
    out = fk_remap(
        out,
        warehouse_lookup.select(
            F.col("OldStoreID").alias("StoreID"), "WarehouseID"
        ).dropDuplicates(["StoreID"]),
        on="StoreID",
        gate="WarehouseID",
        context="purchase_bills->warehouses",
    )
    return fk_remap(
        out,
        po_lookup.dropDuplicates(["PurchaseOrderID"]),
        on="PurchaseOrderID",
        gate=None,  # nullable by design
    )


def purchase_bills_pipeline(
    catalog, name: str = "purchase_bills", sink_table: str = "PurchaseBillsV2"
) -> IncrementalPipeline:
    def transform(df: DataFrame, ts: datetime) -> DataFrame:
        return purchase_bills_transform(
            df,
            catalog.read("SuppliersV2").select(
                F.col("OldSupplierID").alias("SupplierID"),
                F.col("SupplierID").alias("NewSupplierID"),
            ),
            catalog.read("Warehouses"),
            catalog.read("PurchaseOrdersV2").select(
                F.col("OldPurchaseOrderID").alias("PurchaseOrderID"),
                F.col("PurchaseOrderID").alias("NewPurchaseOrderID"),
            ),
        )

    return IncrementalPipeline(
        name=name,
        source=lambda: catalog.read("Bill"),
        watermark_col="BillID",
        sink_table=sink_table,
        transform=transform,
    )


def stocks_transform(batch: DataFrame, batch_ts: datetime) -> DataFrame:
    """Source-typo repair + business defaults (``stocks.py:46-70``,
    ``Readme.md:69-70``: 31K missing CurrentStock -> 0)."""
    out = batch
    if "StutusID" in out.columns:  # V1 column-name typo, fixed on ingest
        out = out.withColumnRenamed("StutusID", "StatusID")
    return out.withColumns(
        {
            "CurrentStock": F.coalesce(ef.try_numeric("CurrentStock"), F.lit(0.0)),
            "StatusID": F.coalesce(F.col("StatusID"), F.lit(1)),
            "CreatedAt": F.coalesce(F.col("CreatedOn"), F.lit(batch_ts)),
        }
    )


def stocks_pipeline(
    catalog, name: str = "stocks", sink_table: str = "StocksV2"
) -> IncrementalPipeline:
    return IncrementalPipeline(
        name=name,
        source=lambda: catalog.read("Stock"),
        watermark_col="StockID",
        sink_table=sink_table,
        transform=stocks_transform,
    )
