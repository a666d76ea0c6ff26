"""User-module pipeline shapes: subusers/customers normalization and
account payment-mode seeding.

Reference: ``Main_Modules/AspNetUsers/subusers.py`` (NormalizedEmail =
upper(Email), phone cleaning, string-numeric coercions) and
``Orders_Payments/Payments/account_payment.py`` (accounts x payment
modes cross-join seeding — J4).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_migration_etl_scripts_spark import functions as ef
from data_migration_etl_scripts_spark.cdc import IncrementalPipeline
from data_migration_etl_scripts_spark.operators import cross_seed


def subusers_transform(df: DataFrame, batch_ts: datetime) -> DataFrame:
    """F3 upper-normalized identity keys + F4 phone + F9 coercion
    (``subusers.py:63-90``, ``customers.py:72-86``)."""
    return df.withColumns(
        {
            "Email": ef.strip_or_null("Email"),
            "NormalizedEmail": F.upper(ef.strip_or_null("Email")),
            "NormalizedUserName": F.upper(ef.strip_or_null("UserName")),
            "ContactNo": ef.clean_contact("ContactNo"),
            "CityID": ef.try_numeric("CityID").cast("long"),
            "CreatedAt": F.coalesce(F.col("LastUpdatedDate"), F.lit(batch_ts)),
        }
    )


def subusers_pipeline(
    catalog, name: str = "subusers", sink_table: str = "SubUsersV2"
) -> IncrementalPipeline:
    return IncrementalPipeline(
        name=name,
        source=lambda: catalog.read("SubUsers"),
        watermark_col="SubUserID",
        sink_table=sink_table,
        transform=subusers_transform,
    )


def account_payment_pipeline(
    catalog,
    name: str = "account_payment",
    sink_table: str = "AccountPaymentModesV2",
) -> IncrementalPipeline:
    """Every account gets every payment mode (J4 cross seed,
    ``account_payment.py:53``). The mode side is broadcast — a
    non-broadcast cross join is a shuffle catastrophe at scale."""

    def transform(df: DataFrame, ts: datetime) -> DataFrame:
        modes = catalog.read("PaymentModes").select("PaymentModeID")
        return cross_seed(df.select("AccountID"), modes).withColumn(
            "CreatedAt", F.lit(ts)
        )

    return IncrementalPipeline(
        name=name,
        source=lambda: catalog.read("Accounts"),
        watermark_col="AccountID",
        sink_table=sink_table,
        transform=transform,
    )
