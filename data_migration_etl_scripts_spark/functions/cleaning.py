"""String-cleaning column expressions.

Covers the reference's ubiquitous strip-or-None lambda applied to all
object columns (~40 sites, e.g. reference
``Main_Modules/Accounts/accounts.py:72-76``), the ``'NULL'``-literal
scrub (``Main_Modules/Cars/cars.py:72``), and the normalized-key
builders (``Main_Modules/ProductManagement/items.py:108-109``).

Per-column policies differ per pipeline in the reference (SURVEY.md
§7.4 risk 5): some columns strip-to-null, some strip-but-keep-empty.
``clean_string_columns`` takes an explicit policy map instead of a
global pass.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _strip(c: Column) -> Column:
    # python str.strip() parity: ALL whitespace, not just spaces
    # (Spark's trim() only strips 0x20)
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def strip_or_null(col: Column | str) -> Column:
    """strip; empty/whitespace-only -> NULL (the default cleaning policy)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.nullif(_strip(c), F.lit(""))


def strip_keep_empty(col: Column | str) -> Column:
    """strip but keep '' (the reference's key-column exemption, e.g. Name)."""
    c = F.col(col) if isinstance(col, str) else col
    return _strip(c)


def scrub_null_literal(col: Column | str, literal: str = "NULL") -> Column:
    """Map the string literal 'NULL' to a real NULL."""
    c = F.col(col) if isinstance(col, str) else col
    return F.nullif(c, F.lit(literal))


def clean_string_columns(
    df: DataFrame,
    strip_to_null: Iterable[str] = (),
    strip_keep: Iterable[str] = (),
    scrub_literals: Iterable[str] = (),
) -> DataFrame:
    """Apply per-column string policies in one projection."""
    exprs: dict[str, Column] = {}
    for c in strip_to_null:
        exprs[c] = strip_or_null(c)
    for c in strip_keep:
        exprs[c] = strip_keep_empty(c)
    for c in scrub_literals:
        base = exprs.get(c, F.col(c))
        exprs[c] = scrub_null_literal(base)
    return df.withColumns(exprs) if exprs else df


def normalized_key(col: Column | str) -> Column:
    """lower + remove spaces: the join-key normalizer for free-text types."""
    c = F.col(col) if isinstance(col, str) else col
    return F.replace(F.lower(c), F.lit(" "), F.lit(""))
