"""Wide/nested pipeline shapes: locations (JSON side-collects),
location_settings (EAV unpivot), cars (multiformat dates + earliest-row
backfill), categories (dedup + anti-join + dual output).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_migration_etl_scripts_spark import functions as ef
from data_migration_etl_scripts_spark.cdc import IncrementalPipeline
from data_migration_etl_scripts_spark.gates import require_no_nulls
from data_migration_etl_scripts_spark.operators import (
    anti_join_existing,
    backfill_from_group_earliest,
    collect_group_json,
    fk_remap,
    top1_per_group,
    unpivot_kv,
)

# ------------------------------------------------------------ locations


def locations_transform(
    batch: DataFrame,
    side_tables: dict[str, tuple[DataFrame, list[str]]],
    city_lookup: DataFrame,
    batch_ts: datetime,
    default_city_id: int = 4101,
) -> DataFrame:
    """The maximal reference transform (``Main_Modules/Locations/
    locations.py:57-182``): scalar scrubs, lat/long bounds, landmark
    domain restriction, SA-city default, gated city remap, and N
    JSON side-collects left-joined back (A3/F15).

    ``side_tables``: out_col -> (junction_df keyed by LocationID,
    struct_cols). Junctions are deduped before collect (the reference
    does too — ``locations.py:117,128`` — and at scale it bounds the
    1:N blowup).
    """
    out = batch.withColumns(
        {
            "ContactNo": ef.clean_contact("ContactNo"),
            "Latitude": ef.bounded_abs(ef.try_numeric("Latitude"), 999, scale=6),
            "Longitude": ef.bounded_abs(ef.try_numeric("Longitude"), 999, scale=6),
            "LandmarkID": ef.domain_restrict("LandmarkID", [1, 2, 3]),
            "CreatedAt": F.coalesce(F.col("LastUpdatedDate"), F.lit(batch_ts)),
        }
    )
    # F12 conditional default: SA rows with no city get the default city
    out = out.withColumn(
        "CityID",
        F.when(
            (F.col("CountryID") == "SA") & F.col("CityID").isNull(),
            F.lit(default_city_id),
        ).otherwise(F.col("CityID")),
    )
    # gated city remap (J1 + RI gate)
    out = fk_remap(
        out,
        city_lookup.dropDuplicates(["CityID"]),
        on="CityID",
        gate="NewCityID",
        context="locations->cities",
    )
    for out_col, (junc, struct_cols) in side_tables.items():
        collected = collect_group_json(
            junc.dropDuplicates(["LocationID", *struct_cols]),
            group_key="LocationID",
            struct_cols=struct_cols,
            out_col=out_col,
        )
        out = out.join(collected, "LocationID", "left")
    return out


def locations_pipeline(
    catalog,
    side_specs: dict[str, tuple[str, list[str]]],
    name: str = "locations",
    sink_table: str = "LocationsV2",
) -> IncrementalPipeline:
    def transform(df: DataFrame, ts: datetime) -> DataFrame:
        sides = {
            out_col: (catalog.read(table), cols)
            for out_col, (table, cols) in side_specs.items()
        }
        city_lookup = catalog.read("SyncCities").select(
            F.col("OldCityID").alias("CityID"), F.col("CityID").alias("NewCityID")
        )
        return locations_transform(df, sides, city_lookup, ts)

    return IncrementalPipeline(
        name=name,
        source=lambda: catalog.read("Locations"),
        watermark_col="LocationID",
        sink_table=sink_table,
        transform=transform,
    )


# ----------------------------------------------------- location_settings


def location_settings_pipeline(
    catalog,
    value_vars: list[str],
    name: str = "location_settings",
    sink_table: str = "LocationSettingsV2",
) -> IncrementalPipeline:
    """Receipt socials -> (LocationID, Key, Value) EAV rows (R1,
    reference ``location_settings.py:89-93``). Blank values map to ''
    (that pipeline's distinct policy — F1 variant)."""

    def transform(df: DataFrame, ts: datetime) -> DataFrame:
        cleaned = df.withColumns(
            {c: F.coalesce(ef.strip_keep_empty(c), F.lit("")) for c in value_vars}
        )
        return unpivot_kv(
            cleaned.select("LocationID", *value_vars),
            ids=["LocationID"],
            values=value_vars,
            key_col="Key",
            value_col="Value",
        )

    return IncrementalPipeline(
        name=name,
        source=lambda: catalog.read("Receipt"),
        watermark_col="ReceiptID",
        sink_table=sink_table,
        transform=transform,
    )


# ----------------------------------------------------------------- cars


def cars_transform(
    batch: DataFrame,
    junction: DataFrame,
    batch_ts: datetime,
    fallback_ts: str = "2000-01-01 00:00:00",
) -> DataFrame:
    """Multiformat VARCHAR dates + earliest-junction-row backfill
    (reference ``Main_Modules/Cars/cars.py:72-122``):

    - 'NULL' literals scrubbed, dates parsed with both formats (F2/F5);
    - missing CreatedAt filled from the car's earliest junction row
      (J8 as join+coalesce);
    - still-missing dates get the fixed fallback (F13).
    """
    out = batch.withColumns(
        {
            "CreatedOn": ef.parse_multiformat_ts(ef.scrub_null_literal("CreatedOn")),
            "LastUpdatedDate": ef.parse_multiformat_ts(
                ef.scrub_null_literal("LastUpdatedDate")
            ),
        }
    )
    out = backfill_from_group_earliest(
        out,
        junction,
        key="CarID",
        fill_cols=["CreatedOn"],
        aux_order="CreatedOn",
        aux_source_col="CreatedOn",
    )
    fallback = F.lit(fallback_ts).cast("timestamp")
    return out.withColumns(
        {
            "CreatedOn": F.coalesce(F.col("CreatedOn"), fallback),
            "LastUpdatedDate": F.coalesce(
                F.col("LastUpdatedDate"), F.col("CreatedOn"), F.lit(batch_ts)
            ),
        }
    )


def cars_pipeline(
    catalog, name: str = "cars", sink_table: str = "CarsV2"
) -> IncrementalPipeline:
    return IncrementalPipeline(
        name=name,
        source=lambda: catalog.read("Cars"),
        watermark_col="CarID",
        sink_table=sink_table,
        transform=lambda df, ts: cars_transform(
            df, catalog.read("CarsLocationJunc"), ts
        ),
    )


# ----------------------------------------------------------- categories


def categories_transform(
    batch: DataFrame,
    account_lookup: DataFrame,
    existing: DataFrame | None,
) -> DataFrame:
    """Dedup-keeping-best + skip-already-loaded (reference
    ``Main_Modules/ProductManagement/categories.py:45-128``):

    - gated account remap (location -> account);
    - W1 top-1-per-(AccountID, Name) keeping lowest StatusID, with the
      dedup key + id as tiebreakers (total order — the reference's
      pandas stable-sort tie is nondeterministic, SURVEY.md §7.4);
    - J5 anti-join against already-loaded (AccountID, Name).
    """
    out = batch.withColumn("Name", ef.strip_keep_empty("Name"))
    out = fk_remap(
        out,
        account_lookup.dropDuplicates(["LocationID"]),
        on="LocationID",
        gate="AccountID",
        context="categories->accounts",
    )
    out = top1_per_group(
        out,
        keys=["AccountID", "Name"],
        order=[F.col("StatusID").asc_nulls_last()],
        tiebreakers=["CategoryID"],
    )
    if existing is not None:
        out = anti_join_existing(out, existing, on=["AccountID", "Name"])
    return require_no_nulls(out, "AccountID", context="categories->accounts")


def categories_pipeline(
    catalog, name: str = "categories", sink_table: str = "CategoriesV2"
) -> IncrementalPipeline:
    """Dual output: entity table + Sync crosswalk from one batch (S8,
    reference ``categories.py:111-128``)."""

    def transform(df: DataFrame, ts: datetime) -> DataFrame:
        accounts = catalog.read("Locations").select(
            "LocationID", F.col("AccountID")
        )
        existing = (
            catalog.read(sink_table).select("AccountID", "Name")
            if catalog.exists(sink_table)
            else None
        )
        return categories_transform(df, accounts, existing)

    return IncrementalPipeline(
        name=name,
        source=lambda: catalog.read("Category"),
        watermark_col="CategoryID",
        sink_table=sink_table,
        transform=transform,
        extra_sinks=(
            (
                "SyncCategories",
                lambda df: df.select(
                    F.col("CategoryID").alias("OldCategoryID"), "AccountID", "Name"
                ),
            ),
        ),
    )
