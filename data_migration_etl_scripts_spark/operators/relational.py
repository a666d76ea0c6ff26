"""Relational macro-operators (SURVEY.md §2.3-2.6).

Each encodes a composite pattern the reference hand-writes in pandas,
as a single declarative DataFrame combinator:

- ``fk_remap``      — the 83-site left-join old->new ID enrichment (J1)
                      with broadcast lookup + optional RI gate.
- ``anti_join_existing`` — the marker-column merge/keep-where-null idiom
                      (J5) as a native left_anti join.
- ``top1_per_group`` — sort + drop_duplicates(keep='first') (W1) as a
                      row_number window with a TOTAL ordering.
- ``collect_group_json`` — groupby().apply(to_dict)+json.dumps (A3) as
                      collect_list(struct) + array_sort + to_json.
- ``unpivot_kv``    — melt -> (Key, Value) EAV rows (R1).
- ``cross_seed``    — cross-join seeding (J4).
- ``backfill_from_group_earliest`` — the pandas index-aligned backfill
                      (J8, ``Main_Modules/Cars/cars.py:92-109``) as
                      earliest-row-per-key join + coalesce.

Scale notes: lookups in fk_remap are dimension-sized -> broadcast (no
shuffle on the fact side). top1_per_group shuffles once on the group
keys — same cost as any agg; at 100 TB prefer pre-bucketed tables on
the hot group key. collect_group_json bounds state per group by the
group's row count — callers must dedup junction rows first (the
reference does too: ``locations.py:117,128``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_migration_etl_scripts_spark.gates import require_no_nulls


def fk_remap(
    df: DataFrame,
    lookup: DataFrame,
    on: str | Sequence[str],
    gate: str | Sequence[str] | None = None,
    broadcast: bool = True,
    context: str = "",
) -> DataFrame:
    """Left-join a (small) lookup to remap old IDs to new surrogate IDs.

    ``gate`` columns are RI-checked after the join; any null aborts the
    batch with IncrementalDependencyError (reference pattern:
    ``Main_Modules/Locations/locations.py:106-111``).
    """
    right = F.broadcast(lookup) if broadcast else lookup
    joined = df.join(right, on=on, how="left")
    if gate:
        gate_cols = [gate] if isinstance(gate, str) else list(gate)
        joined = require_no_nulls(joined, *gate_cols, context=context or str(on))
    return joined


def anti_join_existing(
    df: DataFrame, existing: DataFrame, on: str | Sequence[str]
) -> DataFrame:
    """Drop rows already present in ``existing`` (idempotent re-run guard).

    Native left_anti replaces the reference's marker-column emulation
    (``Main_Modules/ProductManagement/categories.py:95-101``).
    """
    keys = [on] if isinstance(on, str) else list(on)
    return df.join(existing.select(*keys).dropDuplicates(keys), on=keys, how="left_anti")


def top1_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column],
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Keep the best row per key: row_number over a TOTAL ordering.

    The reference's sort+drop_duplicates(keep='first') relies on pandas
    stable sort for tie-breaking (SURVEY.md §7.4 risk 1) — here callers
    pass explicit ``tiebreakers`` so the result is deterministic and
    oracle-testable.
    """
    ordering = list(order) + [F.col(t) for t in tiebreakers]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_keep_first(df: DataFrame, subset: Sequence[str]) -> DataFrame:
    """Plain dedup on a key subset (W2). Row choice is arbitrary —
    use top1_per_group when which-row-survives matters."""
    return df.dropDuplicates(list(subset))


def collect_group_json(
    df: DataFrame,
    group_key: str | Sequence[str],
    struct_cols: Sequence[str],
    out_col: str,
    sort_within_group: bool = True,
) -> DataFrame:
    """Per-group array-of-struct serialized to a JSON string column.

    Reference: five groupby().apply(to_dict('records')) + json.dumps
    sites building WorkingHours/Amenities/Services/SocialMedia/Images
    JSON (``Main_Modules/Locations/locations.py:123-166``). The array
    is sorted for determinism (the reference inherits source row order).
    ``ensure_ascii=False`` parity: Spark's to_json does not escape
    unicode by default.
    """
    keys = [group_key] if isinstance(group_key, str) else list(group_key)
    arr = F.collect_list(F.struct(*[F.col(c) for c in struct_cols]))
    if sort_within_group:
        arr = F.array_sort(arr)
    return df.groupBy(*keys).agg(F.to_json(arr).alias(out_col))


def unpivot_kv(
    df: DataFrame,
    ids: Sequence[str],
    values: Sequence[str],
    key_col: str = "Key",
    value_col: str = "Value",
) -> DataFrame:
    """Wide -> EAV rows (reference melt sites:
    ``Main_Modules/Locations/location_settings.py:89-93``,
    ``Settings/Roles/roles.py:96-101``)."""
    return df.unpivot(list(ids), list(values), key_col, value_col)


def cross_seed(df: DataFrame, seeds: DataFrame) -> DataFrame:
    """Cross-join seeding (reference:
    ``Orders_Payments/Payments/account_payment.py:53``). Broadcasts the
    seed side — a cross join against a non-broadcast side is a shuffle
    catastrophe at scale."""
    return df.crossJoin(F.broadcast(seeds))


def backfill_from_group_earliest(
    df: DataFrame,
    aux: DataFrame,
    key: str,
    fill_cols: Sequence[str],
    aux_order: str | Sequence[str],
    aux_source_col: str,
    broadcast: bool = False,
) -> DataFrame:
    """Fill null ``fill_cols`` from the earliest aux row per key.

    Re-derivation of the pandas index-aligned assignment at
    ``Main_Modules/Cars/cars.py:92-109`` (fill missing CreatedAt from
    the earliest CarsLocation_Junc row per car): earliest-per-key via
    row_number, then left join + coalesce.

    ``broadcast=False`` by default: earliest-per-key is fact-sized (one
    row per key), so at scale this is a shuffle join on ``key`` — only
    broadcast when the aux table is known-small.
    """
    order_cols = [aux_order] if isinstance(aux_order, str) else list(aux_order)
    w = Window.partitionBy(key).orderBy(
        *[F.col(c).asc_nulls_last() for c in order_cols]
    )
    earliest = (
        aux.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(F.col(key), F.col(aux_source_col).alias("__fill"))
    )
    right = F.broadcast(earliest) if broadcast else earliest
    out = df.join(right, on=key, how="left")
    for c in fill_cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.col("__fill")))
    return out.drop("__fill")
