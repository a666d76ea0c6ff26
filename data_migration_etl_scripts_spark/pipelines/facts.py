"""Fact-table pipeline shapes (orders & friends).

Reference entry point C (SURVEY.md §3.3, ``Orders_Payments/Orders/
orders.py``): extract reads THREE source tables (orders scan, checkout
pre-agg, details pre-agg), transform runs scalar derivations + the
checkout repair + five gated FK-remap joins, load appends + advances
the watermark. Here the whole thing is one lazy plan; the RI gates run
as actions before the write (cdc.run_incremental contract).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_migration_etl_scripts_spark import functions as ef
from data_migration_etl_scripts_spark.cdc import IncrementalPipeline
from data_migration_etl_scripts_spark.functions.numeric import derive_missing_of_three
from data_migration_etl_scripts_spark.operators import fk_remap


def _dec(c, p=18, s=2):
    return (F.col(c) if isinstance(c, str) else c).cast(f"decimal({p},{s})")


def checkout_preagg(checkout: DataFrame) -> DataFrame:
    """Per-order money rollup (A1: sum money cols, max of flags).

    Reference: ``orders.py:55-56`` groupby('OrderID').agg({...: 'sum'
    or 'max'}). Decimal sums so partial aggregation is exact.
    """
    return checkout.groupBy("OrderID").agg(
        F.sum(_dec("AmountTotal")).alias("Subtotal"),
        F.sum(_dec("Tax")).alias("ItemTaxTotal"),
        F.sum(_dec("GrandTotal")).alias("GrandTotal"),
        F.sum(_dec("AmountPaid")).alias("AmountPaidTotal"),
        F.sum(_dec("AmountDiscount")).alias("OrderDiscountTotal"),
        F.max("PaymentMode").alias("PaymentMode"),
        F.max("AppSourceID").alias("AppSourceID"),
    )


def orders_transform(
    batch: DataFrame,
    checkout: DataFrame,
    lookups: dict[str, DataFrame],
    batch_ts: datetime,
) -> DataFrame:
    """orders batch + checkout rollup + gated remaps + money repair.

    The checkout side-table is semi-joined to the batch's order keys
    BEFORE pre-aggregation — the engine form of the reference's
    ``WHERE OrderID IN {order_ids}`` string splicing (P7,
    ``orders.py:54-55``): only this batch's checkout rows are
    aggregated, so the side-scan cost follows the batch size, not the
    full history."""
    batch_keys = batch.select("OrderID")
    scoped = checkout.join(F.broadcast(batch_keys), "OrderID", "left_semi")
    out = batch.join(checkout_preagg(scoped), "OrderID", "left")

    # F6 checkout repair: derive the missing one of {subtotal, grand,
    # tax} from the accounting identity (no row UDF — pure columns)
    st, gt, tax = derive_missing_of_three(
        F.col("Subtotal").cast("double"),
        F.col("GrandTotal").cast("double"),
        F.col("ItemTaxTotal").cast("double"),
        F.col("OrderDiscountTotal").cast("double"),
    )
    out = out.withColumns(
        {
            "Subtotal": st,
            "GrandTotal": gt,
            "ItemTaxTotal": tax,
        }
    )
    # F11 derived money columns (orders.py:115-117)
    out = out.withColumns(
        {
            "AmountDueTotal": F.col("GrandTotal")
            - F.coalesce(F.col("AmountPaidTotal").cast("double"), F.lit(0.0)),
            "OrderType": F.lit(0),  # F7: map({'New': 0})
            "CreatedAt": F.coalesce(F.col("CreatedOn"), F.lit(batch_ts)),
        }
    )
    # J1 gated FK remaps (orders.py:120-140): each lookup is a small
    # dim -> broadcast; nulls after the join abort the batch
    for gate_col, (lookup, on) in lookups.items():
        out = fk_remap(out, lookup, on=on, gate=gate_col, context=f"orders->{gate_col}")
    return out


def orders_pipeline(
    catalog,
    lookup_specs: dict[str, tuple[str, str, str, str]],
    name: str = "orders",
    sink_table: str = "OrdersV2",
) -> IncrementalPipeline:
    """lookup_specs: gate_col -> (lookup_table, lookup_old_id, batch_fk, lookup_new_id).

    Each spec reads ``lookup_table`` mid-pipeline from the catalog (the
    target is both sink and source, SURVEY.md §1.1) and remaps
    ``batch_fk`` -> ``gate_col``.
    """

    def transform(df: DataFrame, ts: datetime) -> DataFrame:
        lookups = {}
        for gate_col, (table, old_id, batch_fk, new_id) in lookup_specs.items():
            lk = catalog.read(table).select(
                F.col(old_id).alias(batch_fk), F.col(new_id).alias(gate_col)
            )
            lookups[gate_col] = (lk.dropDuplicates([batch_fk]), batch_fk)
        return orders_transform(df, catalog.read("OrderCheckout"), lookups, ts)

    return IncrementalPipeline(
        name=name,
        source=lambda: catalog.read("Orders"),
        watermark_col="OrderID",
        sink_table=sink_table,
        transform=transform,
    )


def line_items_transform(details: DataFrame) -> DataFrame:
    """Per-line money derivations (F11/F14, reference
    ``order_line_items.py:79-122``): unit price from line total,
    subtotal/grand-total identities, discount percent, free-item flag.
    Quantity 0 -> null unit price (pandas div-by-zero parity)."""
    qty = F.col("Quantity").cast("double")
    price = F.col("Price").cast("double")
    disc = F.coalesce(F.col("DiscountAmount").cast("double"), F.lit(0.0))
    unit = F.when(qty != 0, price / qty)
    subtotal = price
    grand = subtotal - disc
    disc_pct = F.when(subtotal != 0, disc / subtotal * 100).otherwise(F.lit(0.0))
    return details.withColumns(
        {
            "UnitPrice": unit,
            "Subtotal": subtotal,
            "GrandTotal": grand,
            "DiscountPercent": disc_pct,
            "IsFreeItem": disc_pct == 100.0,
            "IsOpenItem": F.col("ItemID").isNull(),
        }
    )


def order_payments_pipeline(
    catalog, name: str = "order_payments", sink_table: str = "OrderPaymentsV2"
) -> IncrementalPipeline:
    """Checkout rows -> payment rows, reference
    ``Orders_Payments/Orders/order_payments.py:50-90``.

    The reference watermarks on the TARGET Orders table's new OrderID
    and extracts checkout rows by an IN-list of the batch's
    OldOrderIDs. Spark-first: the IN-list string splice becomes an
    equi-join of checkout to the Orders (OldOrderID -> OrderID)
    crosswalk; the runner's pushed ``OrderID > wm`` range predicate
    then scopes the batch. RI on OrderID holds by construction — the
    keys originate from the Orders table — so the inner join replaces
    the reference's post-hoc missing-OrderID gate
    (order_payments.py:80-84). The AppSource recode stays an ungated
    left join (order_payments.py:86).
    """

    def source() -> DataFrame:
        co = catalog.read("OrderCheckout")
        keep = [c for c in ("OrderCheckOutID", "OrderID", "PaymentMode", "Remarks",
                            "OrderStatus", "CreatedOn", "AppSourceID", "AmountPaid")
                if c in co.columns]
        co = co.select(*keep).withColumnsRenamed(
            {"OrderCheckOutID": "OldPaymentID", "OrderID": "OldOrderID",
             "OrderStatus": "StatusID", "CreatedOn": "CreatedAt",
             "Remarks": "Notes", "PaymentMode": "PaymentModeID",
             "AppSourceID": "OldAppSourceID"}
        )
        orders = (
            catalog.read("OrdersV2Map")
            .select("OldOrderID", "OrderID")
            .where(F.col("OldOrderID").isNotNull())
            .dropDuplicates(["OldOrderID"])
        )
        return co.join(orders, "OldOrderID", "inner")

    def transform(df: DataFrame, ts: datetime) -> DataFrame:
        out = df.withColumns(
            {
                "CreatedBy": F.lit(0),
                "PaymentModeID": F.coalesce(F.col("PaymentModeID"), F.lit(1)),
                "OldAppSourceID": ef.try_numeric("OldAppSourceID").cast("long"),
            }
        )
        sync = (
            catalog.read("SyncAppSources")
            .select("OldAppSourceID", "AppSourceID")
            .dropDuplicates(["OldAppSourceID"])
        )
        out = fk_remap(out, sync, on="OldAppSourceID",
                       context="order_payments->app_sources")
        return out.drop("OldOrderID", "OldAppSourceID")

    return IncrementalPipeline(
        name=name,
        source=source,
        watermark_col="OrderID",
        sink_table=sink_table,
        transform=transform,
    )


def order_line_items_pipeline(
    catalog, name: str = "order_line_items", sink_table: str = "OrderLineItemsV2"
) -> IncrementalPipeline:
    """Per-line money derivations + the gated OldOrderID -> OrderID
    remap, reference ``order_line_items.py:49-130``: a missing order
    aborts the batch (IncrementalDependencyError) so line items never
    land before their order."""

    def transform(df: DataFrame, ts: datetime) -> DataFrame:
        out = line_items_transform(df.withColumnRenamed("OrderID", "OldOrderID"))
        orders = (
            catalog.read("OrdersV2Map")
            .select("OldOrderID", "OrderID")
            .dropDuplicates(["OldOrderID"])
        )
        out = fk_remap(out, orders, on="OldOrderID", gate="OrderID",
                       context="order_line_items->orders")
        return out.drop("OldOrderID")

    return IncrementalPipeline(
        name=name,
        source=lambda: catalog.read("OrderDetail"),
        watermark_col="OrderDetailID",
        sink_table=sink_table,
        transform=transform,
    )
