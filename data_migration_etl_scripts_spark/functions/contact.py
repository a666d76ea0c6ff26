"""Phone-number normalization as a pure column expression.

Re-expression of the reference UDF ``clean_contact``
(``utils/tools.py:15-27``): keep only ``[+0-9]``, empty -> NULL, strip
leading zeros, then prefix ``+966`` if the number starts with 5
(truncate to 12 digits first), ``+`` if it starts with 9 (truncate 14),
else truncate to 15.

Edge parity with the original, golden-tested in
tests/test_functions_contact.py:
- NULL in -> NULL out; no [+0-9] chars at all -> NULL.
- all-zeros input ('000') -> '' (the original strips zeros AFTER the
  empty check, so it returns the empty string, not None).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def clean_contact(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    digits = F.nullif(F.regexp_replace(c, r"[^+0-9]", ""), F.lit(""))
    no_leading_zeros = F.regexp_replace(digits, r"^0+", "")
    return (
        F.when(no_leading_zeros.startswith("5"),
               F.concat(F.lit("+966"), F.substring(no_leading_zeros, 1, 12)))
        .when(no_leading_zeros.startswith("9"),
              F.concat(F.lit("+"), F.substring(no_leading_zeros, 1, 14)))
        .otherwise(F.substring(no_leading_zeros, 1, 15))
    )


def clean_contact_sql(expr: str) -> str:
    """DuckDB twin of :func:`clean_contact` (for oracle queries)."""
    digits = f"nullif(regexp_replace({expr}, '[^+0-9]', '', 'g'), '')"
    nz = f"regexp_replace({digits}, '^0+', '')"
    return (
        f"CASE WHEN {nz} LIKE '5%' THEN '+966' || substr({nz}, 1, 12) "
        f"WHEN {nz} LIKE '9%' THEN '+' || substr({nz}, 1, 14) "
        f"ELSE substr({nz}, 1, 15) END"
    )
