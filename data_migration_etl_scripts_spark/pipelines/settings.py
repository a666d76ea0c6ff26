"""Settings-module pipeline shapes: subscriptions and RBAC roles.

Reference: ``Settings/Subscriptions/subscriptions.py`` (recode of the
package type, +1-year expiry default) and ``Settings/Roles/roles.py``
(unpivot of the per-form permission flags into claim rows, then a
positional (FormName, ClaimType) -> claim-string lookup — SURVEY.md
§2.7 F16/F17, §2.6 R1).
"""

from __future__ import annotations

from collections.abc import Mapping
from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_migration_etl_scripts_spark import functions as ef
from data_migration_etl_scripts_spark.cdc import IncrementalPipeline
from data_migration_etl_scripts_spark.operators import unpivot_kv

SUBSCRIPTION_TYPES = {1: "FREE", 2: "PROF"}


def subscriptions_transform(df: DataFrame, batch_ts: datetime) -> DataFrame:
    """F7 recode + F16 one-year expiry default
    (``subscriptions.py:46-73``)."""
    return df.withColumns(
        {
            "SubscriptionType": ef.recode("PackageInfoID", SUBSCRIPTION_TYPES, default="FREE"),
            "ExpiryDate": F.coalesce(
                F.col("ExpiryDate"), ef.add_years("CreatedDate", 1)
            ),
            "CreatedAt": F.coalesce(F.col("CreatedDate"), F.lit(batch_ts)),
        }
    )


def subscriptions_pipeline(
    catalog, name: str = "subscriptions", sink_table: str = "SubscriptionsV2"
) -> IncrementalPipeline:
    return IncrementalPipeline(
        name=name,
        source=lambda: catalog.read("UserPackageDetails"),
        watermark_col="UserPackageDetailID",
        sink_table=sink_table,
        transform=subscriptions_transform,
    )


def roles_claims_transform(
    group_forms: DataFrame,
    claim_strings: Mapping[tuple[str, str], str],
) -> DataFrame:
    """Permission flags -> one claim row per granted (group, form, verb).

    1. R1 unpivot: the four flag columns become (ClaimType, granted)
       rows (reference melt at ``roles.py:96-101``);
    2. P4 filter: keep granted rows only (``roles.py:105``);
    3. F17 positional lookup: (FormName, ClaimType) -> claim string via
       a broadcast join against the literal claims table (the engine
       form of the reference's pandas ``roles_table[Form][verb]``
       double-index — no driver-side dict lookups).
    """
    spark = group_forms.sparkSession
    claims = unpivot_kv(
        group_forms,
        ids=["GroupID", "FormName"],
        values=["New", "Remove", "Edit", "Access"],
        key_col="ClaimType",
        value_col="granted",
    ).where(F.col("granted"))
    from data_migration_etl_scripts_spark.localdata import local_df

    lookup = local_df(
        spark,
        [(f, t, v) for (f, t), v in claim_strings.items()],
        "FormName string, ClaimType string, ClaimValue string",
    )
    out = claims.join(F.broadcast(lookup), ["FormName", "ClaimType"], "left")
    return out.select(
        "GroupID",
        "FormName",
        "ClaimType",
        F.coalesce(F.col("ClaimValue"), F.concat_ws(":", "FormName", "ClaimType")).alias(
            "ClaimValue"
        ),
    )


#: The reference's positional claims table (``roles.py:90-96``):
#: FormName -> [POST, DELETE, GET, PUT] indexed by the verb map
#: {'New': 0, 'Remove': 1, 'Access': 2, 'Edit': 3}. The doubled
#: "DELETE  POST"/"GET  POST"/"PUT  POST" strings for AppSources are
#: the reference's own copy-paste quirk, pinned faithfully.
_REFERENCE_ROLES_TABLE: dict[str, list[str]] = {
    "Accounts": [
        "POST /api/v1/accounts",
        "DELETE /api/v1/accounts/{AccountID}",
        "GET /api/v1/accounts/{AccountID}",
        "PUT /api/v1/accounts/{AccountID}",
    ],
    "AppSources": [
        "POST /api/v1/appsources",
        "DELETE  POST /api/v1/appsources/{AppSourceID}",
        "GET  POST /api/v1/appsources/{AppSourceID}",
        "PUT  POST /api/v1/appsources/{AppSourceID}",
    ],
}
_VERB_INDEX = {"New": 0, "Remove": 1, "Access": 2, "Edit": 3}

REFERENCE_CLAIM_STRINGS: Mapping[tuple[str, str], str] = {
    (form, verb): strings[i]
    for form, strings in _REFERENCE_ROLES_TABLE.items()
    for verb, i in _VERB_INDEX.items()
}


def roles_pipeline(
    catalog,
    name: str = "roles",
    sink_table: str = "RoleClaimsV2",
    claim_strings: Mapping[tuple[str, str], str] = REFERENCE_CLAIM_STRINGS,
) -> IncrementalPipeline:
    """``Settings/Roles/roles.py`` as a runnable DAG node: unpivot the
    per-form permission flags into granted claim rows and resolve each
    (FormName, verb) through the claims table; unmapped forms fall back
    to ``FormName:ClaimType`` instead of the reference's hard KeyError."""
    return IncrementalPipeline(
        name=name,
        source=lambda: catalog.read("RoleGroupForms"),
        watermark_col="GroupID",
        sink_table=sink_table,
        transform=lambda df, ts: roles_claims_transform(df, claim_strings),
    )
