"""Value-recode column expressions.

The reference recodes values via literal Python dict ``.map`` calls —
up to 250 entries (alpha2->alpha3 country codes,
``Template_Tables/countries.py:60-308``; payment-mode names,
``sync_payment_modes.py:58-66``; ItemType->ID with default,
``items.py:107-109``). Here: a map literal + ``element_at`` — constant-
folded by Catalyst, no join, no UDF. For maps that are genuinely large
(>~1k entries) prefer a broadcast join against a literal DataFrame.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F


def recode(col: Column | str, mapping: Mapping, default=None) -> Column:
    """dict.map parity: unmapped -> default (None matches pandas .map)."""
    c = F.col(col) if isinstance(col, str) else col
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    looked_up = F.element_at(F.create_map(*pairs), c)
    if default is None:
        return looked_up
    return F.coalesce(looked_up, F.lit(default))


def domain_restrict(col: Column | str, allowed: Iterable) -> Column:
    """Keep the value only if it is in the allowed domain
    (``Main_Modules/Locations/locations.py:89``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isin(*list(allowed)), c)
