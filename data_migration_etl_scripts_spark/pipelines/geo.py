"""Geography dimension pipelines: countries (the 250-entry recode) and
warehouses.

Reference ``Template_Tables/countries.py:37-311``: project 3 columns,
recode alpha-2 codes to alpha-3 via a 250-entry literal dict, drop
rows whose code is not exactly 3 chars after recoding. A map this
size is where the two recode strategies cross over: chained
``when``/map-literal expressions bloat the plan, so ``recode_via_join``
broadcasts a literal DataFrame instead — same semantics, O(1) plan
size, and the join is map-side (broadcast) so it costs no shuffle.

``Invertory/Warehouses/warehouses.py:48-85``: IsMainStore boolean
derivation (F14) + the 41%-null StoreLocationID default (F13).
"""

from __future__ import annotations

from collections.abc import Mapping
from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_migration_etl_scripts_spark import functions as ef
from data_migration_etl_scripts_spark.cdc import IncrementalPipeline

#: representative slice of the reference's alpha2 -> alpha3 literal map
#: (countries.py:60-308; full table plugs in identically)
ALPHA2_TO_ALPHA3 = {
    "SA": "SAU", "AE": "ARE", "EG": "EGY", "US": "USA", "GB": "GBR",
    "FR": "FRA", "DE": "DEU", "IN": "IND", "PK": "PAK", "JO": "JOR",
    "KW": "KWT", "QA": "QAT", "BH": "BHR", "OM": "OMN", "YE": "YEM",
}


def recode_via_join(
    df: DataFrame, col: str, mapping: Mapping[str, str], keep_unmatched: bool = True
) -> DataFrame:
    """Large-map recode as a broadcast join against a literal table.

    The engine's `functions.recode` (map-literal + element_at) is right
    for tens of entries; past ~1k entries the literal map bloats every
    task's plan — a broadcast-joined lookup table scales to any size
    and Catalyst still prunes/pushes around it.
    """
    spark = df.sparkSession
    from data_migration_etl_scripts_spark.localdata import local_df

    lookup = local_df(
        spark, [(k, v) for k, v in mapping.items()],
        f"{col} string, __recoded string",
    )
    out = df.join(F.broadcast(lookup), col, "left")
    new_val = (
        F.coalesce(F.col("__recoded"), F.col(col)) if keep_unmatched else F.col("__recoded")
    )
    return out.withColumn(col, new_val).drop("__recoded")


def countries_transform(df: DataFrame, batch_ts: datetime) -> DataFrame:
    out = df.select(
        ef.strip_keep_empty("Code").alias("Code"),
        ef.strip_or_null("Name").alias("Name"),
        ef.strip_or_null("Curr_Code").alias("Currency"),
    )
    out = recode_via_join(out, "Code", ALPHA2_TO_ALPHA3)
    # P4 code-length filter (countries.py:310-311): only alpha-3 survive
    return out.where(F.length("Code") == 3).withColumn("CreatedAt", F.lit(batch_ts))


def countries_pipeline(
    catalog, name: str = "countries", sink_table: str = "CountriesV2"
) -> IncrementalPipeline:
    return IncrementalPipeline(
        name=name,
        source=lambda: catalog.read("Country"),
        watermark_col="CountryRowID",
        sink_table=sink_table,
        transform=countries_transform,
    )


def warehouses_transform(df: DataFrame, batch_ts: datetime, default_location: int = 4) -> DataFrame:
    return df.withColumns(
        {
            "Name": ef.strip_keep_empty("Name"),
            "IsMainStore": F.col("Type") == "Main Store",          # F14
            "StoreLocationID": F.coalesce(                         # F13 (41% null)
                F.col("StoreLocationID"), F.lit(default_location)
            ),
            "CreatedAt": F.coalesce(F.col("LastUpdatedDate"), F.lit(batch_ts)),
        }
    )


def warehouses_pipeline(
    catalog, name: str = "warehouses", sink_table: str = "WarehousesV2"
) -> IncrementalPipeline:
    return IncrementalPipeline(
        name=name,
        source=lambda: catalog.read("Stores"),
        watermark_col="StoreID",
        sink_table=sink_table,
        transform=warehouses_transform,
    )


def cities_transform(df: DataFrame, countries: DataFrame) -> DataFrame:
    """Template_Tables/cities.py:64-100: project/rename, Timezone='',
    District fillna(''), the SA->SAU code fix, strip, then an inner
    join to Countries on Code — rows whose code has no country are
    DROPPED (the reference's ``~CountryID.isna()`` mask), and Code is
    dropped after the join. The country side is tiny -> broadcast.
    """
    out = df.select(
        F.col("ID").alias("OldCityID"),
        ef.strip_keep_empty("Name").alias("CityName"),
        F.coalesce(F.trim(F.col("District")), F.lit("")).alias("District"),
        F.when(F.trim(F.col("CountryCode")) == "SA", F.lit("SAU"))
        .otherwise(F.trim(F.col("CountryCode")))
        .alias("Code"),
        F.lit("").alias("Timezone"),
    )
    lookup = countries.select("CountryID", "Code").dropDuplicates(["Code"])
    return out.join(F.broadcast(lookup), "Code", "inner").drop("Code")


def cities_pipeline(
    catalog, name: str = "cities", sink_table: str = "CitiesV2Out"
) -> IncrementalPipeline:
    """The reference reloads dbo.City wholesale (no TOP N); watermarking
    on OldCityID keeps re-runs incremental without changing results."""
    return IncrementalPipeline(
        name=name,
        source=lambda: catalog.read("City"),
        watermark_col="ID",
        sink_table=sink_table,
        transform=lambda df, ts: cities_transform(df, catalog.read("CountriesV2")),
    )
