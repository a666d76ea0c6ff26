"""Shared text canonicalization for dedup / text-analysis operators.

Single source of truth for tokenization & hashing, exposed BOTH as
Spark Column builders and as DuckDB SQL fragment builders so every
operator's oracle stays in lockstep with its Spark plan.

Hashing: md5 is used as the portable hash (identical hex output in
Spark and DuckDB, so oracle hashes match bit-for-bit). At production
scale swap ``PORTABLE_HASH=False`` call sites to ``xxhash64`` — ~5x
faster, JVM-side, but with no DuckDB twin (tests then fall back to
rows-only checks).

Determinism gotchas encoded here:
- Spark ``sequence(1, 0)`` yields ``[1, 0]`` (it auto-steps -1), so
  shingle builders guard with ``when(n_tokens >= n, ...)``.
- Lexicographic min over fixed-length lowercase hex == numeric min of
  the underlying unsigned value, so minhash can stay in string-land
  portably.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------- tokens

#: chars kept by canonical tokenization (both engines)
_TOKEN_RE = "[^a-z0-9]+"


def tokens_list(text: str) -> list[str]:
    """Driver-side Python twin of :func:`tokens` (same regex class;
    the pattern is ASCII-only so Python/Java/RE2 agree) — for
    tokenizing literal query strings before they enter a plan."""
    import re

    return [w for w in re.sub(_TOKEN_RE, " ", text.lower()).split(" ") if w]


def tokens(col: Column | str) -> Column:
    """lower -> non-alnum runs to space -> split -> drop empties."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(F.lower(c), _TOKEN_RE, " ")
    return F.filter(F.split(cleaned, " "), lambda x: x != "")


def tokens_sql(expr: str) -> str:
    """DuckDB twin of :func:`tokens`."""
    return (
        "list_filter(string_split(regexp_replace(lower({e}), '[^a-z0-9]+', ' ', 'g'), ' '), "
        "x -> x <> '')"
    ).format(e=expr)


# -------------------------------------------------------------- shingles


def word_shingles(tokens_col: Column, n: int = 3, distinct: bool = True) -> Column:
    """n-word shingles as space-joined strings; [] when fewer than n tokens.

    Built as zip_with over shifted slices, NOT as
    ``transform(indices, i -> element_at(tokens, i+j))``: Catalyst has
    no common-subexpression elimination inside lambdas, so the
    element_at form re-evaluates the whole upstream tokenize expression
    per window element (observed ~50x slowdown). zip_with binds each
    input array once per row; zip_with pads the shorter side with
    nulls, concat propagates them, and the final filter drops the
    partial trailing windows.
    """
    out = tokens_col
    for j in range(1, n):
        shifted = F.slice(
            tokens_col, j + 1, F.greatest(F.size(tokens_col) - j, F.lit(0))
        )
        out = F.zip_with(out, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    if n > 1:
        out = F.filter(out, lambda x: x.isNotNull())
    return F.array_distinct(out) if distinct else out


def word_shingles_sql(tokens_expr: str, n: int = 3, distinct: bool = True) -> str:
    """DuckDB twin of :func:`word_shingles`."""
    joined = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
    core = (
        f"CASE WHEN len(t) >= {n} "
        f"THEN list_transform(generate_series(1, len(t)-{n - 1}), i -> {joined}) "
        f"ELSE [] END"
    )
    expr = f"(SELECT {core} FROM (SELECT {tokens_expr} AS t))"
    return f"list_distinct({expr})" if distinct else expr


# -------------------------------------------------------------- hashing


def md5_hex(col: Column) -> Column:
    return F.md5(col.cast("string"))


def hex_to_long(hex_col: Column, digits: int = 15) -> Column:
    """First ``digits`` hex chars -> non-negative BIGINT (60 bits max).

    DuckDB twin: ``('0x' || substr(<hex>, 1, digits))::BIGINT``.
    """
    return F.conv(F.substring(hex_col, 1, digits), 16, 10).cast("long")


def md5_long(col: Column, digits: int = 15) -> Column:
    return hex_to_long(md5_hex(col), digits)


def md5_long_sql(expr: str, digits: int = 15) -> str:
    return f"('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, {digits}))::BIGINT"
