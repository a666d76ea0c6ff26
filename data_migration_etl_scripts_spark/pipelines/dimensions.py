"""Dimension/lookup-table pipeline shapes.

The reference's Template_Tables scripts share one four-part shape
(SURVEY.md §0, reference ``Template_Tables/makes.py:34-127``):
watermark extract -> drop/rename/strip/fill transform -> append +
watermark advance. The 6 ``sync_*`` scripts are one further template:
join old rows to new rows by (cleaned) name and emit an
(OldID, NewID) crosswalk (``Template_Tables/sync_units.py:42-70``).

Here both shapes are factories parameterized by column specs, so each
concrete reference table is a few lines of config — the engine-level
counterpart of the reference's copy-paste-the-script workflow (and the
fix for its sync_landmarks copy-paste bug, SURVEY.md §0).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from datetime import datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_migration_etl_scripts_spark import functions as ef
from data_migration_etl_scripts_spark.cdc import IncrementalPipeline


def dimension_transform(
    df: DataFrame,
    batch_ts: datetime,
    drop: Sequence[str] = (),
    rename: Mapping[str, str] | None = None,
    strip_to_null: Sequence[str] = (),
    strip_keep: Sequence[str] = (),
    scrub_null_literal: Sequence[str] = (),
    fill_defaults: Mapping[str, object] | None = None,
    fill_ts_cols: Sequence[str] = (),
    numeric_coerce: Sequence[str] = (),
    recodes: Mapping[str, tuple[Mapping, object]] | None = None,
    scrub_values: Mapping[str, object] | None = None,
    extra: Sequence[tuple[str, Column]] = (),
) -> DataFrame:
    """The canonical template-table transform as one projection chain.

    Mirrors reference ``Template_Tables/makes.py:50-73`` semantics:
    drop bookkeeping columns, rename to V2 names, per-column string
    policies, business-default fills, ``CreatedAt <- batch_ts`` stamps
    (injectable, unlike the reference's datetime.now()), numeric
    coercions, and dict-recodes.
    """
    out = df.drop(*[c for c in drop if c in df.columns])
    if rename:
        out = out.withColumnsRenamed(dict(rename))
    out = ef.clean_string_columns(
        out,
        strip_to_null=[c for c in strip_to_null if c in out.columns],
        strip_keep=[c for c in strip_keep if c in out.columns],
        scrub_literals=[c for c in scrub_null_literal if c in out.columns],
    )
    exprs: dict[str, Column] = {}
    for c in numeric_coerce:
        if c in out.columns:
            exprs[c] = ef.try_numeric(c)
    for c, default in (fill_defaults or {}).items():
        if c in out.columns:
            exprs[c] = F.coalesce(F.col(c), F.lit(default))
    for c in fill_ts_cols:
        base = F.col(c) if c in out.columns else F.lit(None).cast("timestamp")
        exprs[c] = F.coalesce(base, F.lit(batch_ts))
    for c, (mapping, default) in (recodes or {}).items():
        if c in out.columns:
            exprs[c] = ef.recode(c, mapping, default=default)
    # sentinel scrub ('-1' image paths etc.): matched value -> NULL,
    # everything else KEPT — distinct from recode, whose dict-map
    # semantics (pandas .map) send unmatched values to the default
    for c, sentinel in (scrub_values or {}).items():
        if c in out.columns:
            exprs[c] = F.nullif(F.col(c), F.lit(sentinel))
    if exprs:
        out = out.withColumns(exprs)
    for name, col in extra:
        out = out.withColumn(name, col)
    return out


def dimension_pipeline(
    catalog,
    name: str,
    source_table: str,
    watermark_col: str,
    sink_table: str,
    **transform_kw,
) -> IncrementalPipeline:
    """A whole Template_Tables-style script as one declaration."""
    return IncrementalPipeline(
        name=name,
        source=lambda: catalog.read(source_table),
        watermark_col=watermark_col,
        sink_table=sink_table,
        transform=lambda df, ts: dimension_transform(df, ts, **transform_kw),
    )


def build_sync_crosswalk(
    old: DataFrame,
    new: DataFrame,
    old_id: str,
    new_id: str,
    old_name: str = "Name",
    new_name: str = "Name",
    name_cleaner=None,
    extra_cols: Sequence[str] = (),
    old_cleaner=None,
    new_cleaner=None,
) -> DataFrame:
    """(OldID, NewID) crosswalk by cleaned-name join.

    Reference shape: right-join old rows to the freshly loaded V2 table
    on Name, dedup, insert into app.Sync<X>
    (``Template_Tables/sync_units.py:42-70``, ``sync_cities.py:82-114``).
    Rewritten as a left join from the old side (J2 -> J1, SURVEY.md
    §2.3) with an explicit cleaner (e.g. the 'X Service' -> 'X' rename,
    ``sync_services.py:61``). Name matching is case-sensitive, matching
    the reference's forced COLLATE CS_AS joins (S5).

    ``old_cleaner``/``new_cleaner`` override ``name_cleaner`` per side:
    sync_cities fixes spellings on the OLD names (sync_cities.py:58-74),
    sync_payment_modes on the NEW names (sync_payment_modes.py:58-66).
    """
    clean = name_cleaner or (lambda c: ef.strip_keep_empty(c))
    clean_old = old_cleaner or clean
    clean_new = new_cleaner or clean
    o = old.select(
        F.col(old_id).alias("old_id"), clean_old(F.col(old_name)).alias("__k"), *extra_cols
    )
    n = new.select(F.col(new_id).alias("new_id"), clean_new(F.col(new_name)).alias("__k"))
    return (
        o.join(F.broadcast(n.dropDuplicates(["__k"])), "__k", "left")
        .where(F.col("new_id").isNotNull())
        .drop("__k")
        .dropDuplicates(["old_id"])
    )


def sync_crosswalk_pipeline(
    catalog,
    name: str,
    source_table: str,
    lookup_table: str,
    old_id: str,
    new_id: str,
    watermark_col: str,
    sink_table: str,
    old_name: str = "Name",
    new_name: str = "Name",
    name_cleaner=None,
    old_cleaner=None,
    new_cleaner=None,
) -> IncrementalPipeline:
    return IncrementalPipeline(
        name=name,
        source=lambda: catalog.read(source_table),
        watermark_col=watermark_col,
        sink_table=sink_table,
        transform=lambda df, ts: build_sync_crosswalk(
            df,
            catalog.read(lookup_table),
            old_id=old_id,
            new_id=new_id,
            old_name=old_name,
            new_name=new_name,
            name_cleaner=name_cleaner,
            old_cleaner=old_cleaner,
            new_cleaner=new_cleaner,
        ),
    )
