"""Declarative data-quality expectations, evaluated in ONE scan.

The reference hand-rolls referential-integrity asserts at ~25 sites
(e.g. /root/reference/Main_Modules/Locations/locations.py:108-111 —
count nulls after a lookup merge, raise on any). `gates.py` ports that
exact gate; this module generalizes it to the dbt-style check
vocabulary a data platform expects:

- ``not_null`` / ``accepted_values`` / arbitrary row predicates
- ``unique_key`` (composite keys supported)
- ``fk`` relationship checks against dimension tables

Scale shape: every check folds into a SINGLE aggregate job over one
pass of the table — row predicates become conditional sums, uniqueness
is ``count(*) - count(distinct key)``, and FK checks are broadcast
left joins whose null-markers feed the same aggregate. A 100 TB fact
table is scanned once no matter how many checks are attached.

``enforce`` raises ``ExpectationError`` listing every failed check —
same abort-before-write discipline as the RI gates.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Check names are interpolated into the stack() SQL string at report
# time; restrict them up front so a quote/backtick can't break (or
# mangle) the generated expression.
_SAFE_NAME = re.compile(r"^[A-Za-z0-9_]+$")


def _validate_names(names) -> None:
    bad = [n for n in names if not _SAFE_NAME.match(n)]
    if bad:
        raise ValueError(
            "expectation check names must match [A-Za-z0-9_]+; got: "
            + ", ".join(repr(n) for n in bad)
        )


class ExpectationError(RuntimeError):
    """At least one expectation failed; message lists all of them."""


def not_null(col: str) -> Column:
    """Violation predicate: value is NULL."""
    return F.col(col).isNull()


def accepted_values(col: str, values: list) -> Column:
    """Violation predicate: non-null value outside the accepted set."""
    return F.col(col).isNotNull() & ~F.col(col).isin(values)


def expectation_report(
    df: DataFrame,
    row_checks: dict[str, Column] | None = None,
    unique_keys: dict[str, list[str]] | None = None,
    fk_checks: dict[str, tuple[DataFrame, str | list[str], str | list[str]]]
    | None = None,
    approx_unique: bool = False,
) -> DataFrame:
    """(check_name, n_violations) for every declared expectation, one scan.

    ``row_checks``  name -> violation predicate (true = bad row)
    ``unique_keys`` name -> key column list (composite ok)
    ``fk_checks``   name -> (dim_df, fact_key, dim_key); keys may be a
                    single column name or a same-length list for
                    composite foreign keys. A fact key with every
                    component non-null that is missing from the dim is
                    a violation (partially-null composites are the
                    not_null checks' business, mirroring SQL FK
                    semantics)
    ``approx_unique``: screen uniqueness with HLL
    (approx_count_distinct) instead of exact count-distinct. An exact
    distinct adds a full extra shuffle stage keyed by the key values —
    and an Expand (duplicated scan rows) once several distinct checks
    are declared; at 100 TB that dominates the whole report. The
    approx mode keeps everything in ONE map-side-partial aggregate
    (plan-tested: no Expand, no distinct re-shuffle); violation counts
    become estimates (floored at 0), so use it as a gate on "roughly
    unique", not an exact census.
    """
    row_checks = dict(row_checks or {})
    _validate_names(
        list(row_checks)
        + list(unique_keys or {})
        + list(fk_checks or {})
    )
    base = df
    for name, (dim, fact_key, dim_key) in (fk_checks or {}).items():
        fact_keys = [fact_key] if isinstance(fact_key, str) else list(fact_key)
        dim_keys = [dim_key] if isinstance(dim_key, str) else list(dim_key)
        marker = f"__fk_{name}"
        key_aliases = [f"{marker}_k{i}" for i in range(len(dim_keys))]
        lookup = F.broadcast(
            dim.select(
                *[F.col(d).alias(a) for d, a in zip(dim_keys, key_aliases)]
            )
            .distinct()
            .withColumn(marker, F.lit(1))
        )
        cond = None
        for fk, a in zip(fact_keys, key_aliases):
            eq = base[fk] == lookup[a]
            cond = eq if cond is None else cond & eq
        base = base.join(lookup, cond, "left").drop(*key_aliases)
        all_present = None
        for fk in fact_keys:
            nn = F.col(fk).isNotNull()
            all_present = nn if all_present is None else all_present & nn
        row_checks[name] = all_present & F.col(marker).isNull()

    aggs = [
        F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(name)
        for name, pred in row_checks.items()
    ]
    for name, keys in (unique_keys or {}).items():
        distinct = (
            F.approx_count_distinct(F.struct(*keys))
            if approx_unique
            else F.count_distinct(F.struct(*keys))
        )
        aggs.append(
            F.greatest(F.lit(0), F.count(F.lit(1)) - distinct)
            .cast("long")
            .alias(name)
        )
    wide = base.agg(*aggs)
    names = [f.name for f in wide.schema.fields]
    stack = F.expr(
        "stack({n}, {pairs}) AS (check_name, n_violations)".format(
            n=len(names),
            pairs=", ".join(f"'{c}', `{c}`" for c in names),
        )
    )
    return wide.select(stack)


def enforce(report: DataFrame) -> None:
    """Raise :class:`ExpectationError` if any check has violations.
    The report is group-cardinality-sized, so the collect is O(checks)."""
    bad = [
        f"{r['check_name']}: {r['n_violations']} violations"
        for r in report.collect()
        if r["n_violations"]
    ]
    if bad:
        raise ExpectationError("; ".join(bad))
