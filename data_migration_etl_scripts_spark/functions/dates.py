"""Timestamp parsing/arithmetic column expressions.

The reference stores V1 dates as VARCHAR in two formats and parses with
a try-each-format UDF (``utils/tools.py:30-40``; formats per
``Readme.md:31``):

- ``'%b %d %Y %I:%M%p'``    e.g. ``May 29 2020  8:39AM``
- ``'%m/%d/%Y %I:%M:%S %p'`` e.g. ``3/3/2025 1:28:20 PM``

Here: ``coalesce(try_to_timestamp(fmt1), try_to_timestamp(fmt2))`` —
fully codegen'd, no Python. Invalid strings -> NULL (the original
returns NaT).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Java DateTimeFormatter equivalents of the reference's strptime formats.
# 'h'/'d'/'M' (non-padded) accept both padded and non-padded digits.
FORMAT_MONTH_NAME = "MMM d yyyy h:mma"
FORMAT_US_SLASH = "M/d/yyyy h:mm:ss a"


def parse_multiformat_ts(col: Column | str, formats: tuple[str, ...] = (FORMAT_MONTH_NAME, FORMAT_US_SLASH)) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    attempts = [F.try_to_timestamp(F.trim(c), F.lit(fmt)) for fmt in formats]
    return F.coalesce(*attempts)


def add_years(col: Column | str, years: int) -> Column:
    """Reference: ``CreatedAt + pd.DateOffset(years=1)``
    (``Settings/Subscriptions/subscriptions.py:65``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.add_months(c, 12 * years)
