"""Numeric coercion/derivation column expressions.

- ``try_numeric``: pandas ``to_numeric(errors='coerce')`` parity
  (11 reference sites, e.g. ``Main_Modules/Accounts/accounts.py:85``).
- ``bounded_abs``: null out |x| > bound (lat/long scrub,
  ``Main_Modules/Locations/locations.py:77-80``).
- ``derive_missing_of_three``: the order-checkout repair
  (``utils/tools.py:43-55``): when exactly two of
  {subtotal, grand_total, item_tax_total} are "present" (non-null and
  non-zero), derive the third from the accounting identity
  ``grand_total = subtotal - discount + item_tax_total``.

Null-semantics note (SURVEY.md §7.4 risk 3): the pandas original uses
Python truthiness on floats, under which NaN is truthy. This engine
defines "present" = non-null AND non-zero — the sane three-valued-logic
translation — and documents the deviation; both the Spark query and the
DuckDB oracle use this definition, and the golden test pins the
difference explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def try_numeric(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("double")


def bounded_abs(col: Column | str, bound: float, scale: int | None = None) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    out = F.when(F.abs(c) > bound, F.lit(None)).otherwise(c)
    return F.round(out, scale) if scale is not None else out


def _present(c: Column) -> Column:
    return c.isNotNull() & (c != 0)


def derive_missing_of_three(
    subtotal: Column,
    grand_total: Column,
    item_tax_total: Column,
    discount_total: Column,
) -> tuple[Column, Column, Column]:
    """Return repaired (subtotal, grand_total, item_tax_total) columns."""
    a, b, c = _present(subtotal), _present(grand_total), _present(item_tax_total)
    two_present = (a.cast("int") + b.cast("int") + c.cast("int")) == 2
    d = F.coalesce(discount_total, F.lit(0.0))
    new_subtotal = F.when(two_present & ~a, grand_total - item_tax_total + d).otherwise(subtotal)
    new_grand = F.when(two_present & a & ~b, subtotal - d + item_tax_total).otherwise(grand_total)
    new_tax = F.when(two_present & a & b & ~c, grand_total - subtotal + d).otherwise(item_tax_total)
    return new_subtotal, new_grand, new_tax


def derive_missing_of_three_sql(
    subtotal: str, grand_total: str, item_tax_total: str, discount_total: str
) -> tuple[str, str, str]:
    """DuckDB twin of :func:`derive_missing_of_three` (oracle queries)."""

    def present(e: str) -> str:
        return f"({e} IS NOT NULL AND {e} <> 0)"

    a, b, c = present(subtotal), present(grand_total), present(item_tax_total)
    two = (
        f"((CASE WHEN {a} THEN 1 ELSE 0 END) + (CASE WHEN {b} THEN 1 ELSE 0 END) "
        f"+ (CASE WHEN {c} THEN 1 ELSE 0 END) = 2)"
    )
    d = f"coalesce({discount_total}, 0.0)"
    new_sub = (
        f"CASE WHEN {two} AND NOT {a} THEN {grand_total} - {item_tax_total} + {d} "
        f"ELSE {subtotal} END"
    )
    new_grand = (
        f"CASE WHEN {two} AND {a} AND NOT {b} THEN {subtotal} - {d} + {item_tax_total} "
        f"ELSE {grand_total} END"
    )
    new_tax = (
        f"CASE WHEN {two} AND {a} AND {b} AND NOT {c} THEN {grand_total} - {subtotal} + {d} "
        f"ELSE {item_tax_total} END"
    )
    return new_sub, new_grand, new_tax
