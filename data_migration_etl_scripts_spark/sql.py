"""SQL entry surface: register the catalog tables as temp views and run
ad-hoc ANSI SQL through Spark SQL.

The reference exposes its data only through per-script pandas code; a
user switching to this engine gets the same tables as named views and
the full Spark SQL dialect over them (`spark.sql(...)` → Catalyst →
the same optimized physical plans as the DataFrame API — the two
front-ends share the planner, so there is no penalty for SQL).

Views go through the same scan normalization as the query inventory
(`queries._t`): TIMESTAMP_NTZ/nanos vintages are folded to TIMESTAMP
once at registration, so SQL text never has to care which parquet
vintage it is reading.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)

#: DuckDB-dialect -> Spark SQL function renames with IDENTICAL
#: semantics and argument shapes (1-based list indexing on both sides
#: of list_extract/element_at; quantile_cont and percentile are both
#: exact linear-interpolation percentiles; epoch_us and unix_micros
#: are both microseconds-since-epoch). Rename-only by design: nothing
#: here reorders, retypes, or reinterprets arguments — anything needing
#: that (unnest, slices, lenient casts) stays engine-specific and is
#: NOT translated.
_DUCKDB_FN_RENAMES = {
    "list_distinct": "array_distinct",
    "list_filter": "filter",
    "list_transform": "transform",
    "list_extract": "element_at",
    "array_to_string": "array_join",
    "json_extract_string": "get_json_object",
    "quantile_cont": "percentile",
    "epoch_us": "unix_micros",
    "epoch": "unix_timestamp",
    "strlen": "octet_length",
    # list_sort and sort_array are both ASC NULLS FIRST by default;
    # string_split/split agree whenever the separator is regex-safe
    # (true of every oracle text — single space or punctuation-free),
    # and the per-query row-match test is the gate either way
    "list_sort": "sort_array",
    "string_split": "split",
    # both are partial-match regex predicates (RLIKE semantics)
    "regexp_matches": "regexp_like",
    # single-generator SELECT flattening; DuckDB's parallel multi-unnest
    # zipping has no Spark form — those texts raise MULTI_GENERATOR and
    # stay off the compat board (the row-match test is the gate)
    "unnest": "explode",
    # both inclusive, both take (start, stop[, step]) incl. timestamps
    "generate_series": "sequence",
}


def _strip_regexp_replace_gflag(sql: str) -> str:
    """Drop a trailing ``, 'g'`` argument from ``regexp_replace(...)``
    calls ONLY. Walks parens (string-literal-aware) from each call site
    so nested calls and quoted commas can't confuse the match."""
    out = []
    i, n = 0, len(sql)
    pat = re.compile(r"regexp_replace\s*\(", re.IGNORECASE)
    while i < n:
        m = pat.search(sql, i)
        if not m:
            out.append(sql[i:])
            break
        open_pos = m.end() - 1  # the '('
        out.append(sql[i:m.end()])
        # walk to the matching close paren, tracking single-quoted strings
        depth, j, in_str = 1, open_pos + 1, False
        while j < n and depth:
            c = sql[j]
            if in_str:
                if c == "'":
                    # '' is an escaped quote inside a literal
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 1
                    else:
                        in_str = False
            elif c == "'":
                in_str = True
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            j += 1
        body = sql[m.end(): j - 1] if depth == 0 else sql[m.end():]
        body = _strip_regexp_replace_gflag(body)  # nested calls
        stripped = re.sub(r",\s*'g'\s*$", "", body)
        out.append(stripped)
        if depth == 0:
            out.append(")")
        i = j
    return "".join(out)


def translate_duckdb_sql(sql: str) -> str:
    """Translate a DuckDB-dialect SQL text to Spark SQL where the
    mapping is a pure rename (see ``_DUCKDB_FN_RENAMES``) plus two
    spelling differences:

    - ``CAST(x AS VARCHAR)`` -> ``CAST(x AS STRING)`` (same type)
    - ``datediff('day', a, b)`` -> ``datediff(day, a, b)`` (Spark
      takes the unit as a keyword, not a string literal)

    This is the usual thin dialect shim an engine ships so one SQL
    text can drive two planners; the oracle texts remain the single
    source of truth (DuckDB runs them verbatim, Spark runs them
    through this). Word-boundary regexes only — the mapped names do
    not occur inside string literals in any oracle text."""
    out = sql
    for src, dst in _DUCKDB_FN_RENAMES.items():
        out = re.sub(rf"\b{src}\s*\(", f"{dst}(", out, flags=re.IGNORECASE)
    # VARCHAR -> STRING only for the bare type name; a sized VARCHAR(n)
    # is left alone (negative lookahead), Spark accepts it as-is
    out = re.sub(
        r"\bAS\s+VARCHAR\b(?!\s*\()", "AS STRING", out, flags=re.IGNORECASE
    )
    out = re.sub(
        r"\bdatediff\(\s*'(\w+)'\s*,", r"datediff(\1,", out, flags=re.IGNORECASE
    )
    # DuckDB's regex GLOBAL flag: Spark's regexp_replace is global by
    # default and its 4th arg is a position INT, so the flag drops.
    # Anchored to regexp_replace calls via a paren walk — a bare
    # ",\\s*'g')" regex would also eat e.g. split(col, 'g') or any
    # function whose legitimate last argument is the literal 'g'.
    out = _strip_regexp_replace_gflag(out)
    # DuckDB orders inside the aggregate args; Spark uses the ANSI
    # WITHIN GROUP form. Paren-free args only (the oracle texts' shape).
    out = re.sub(
        r"\bstring_agg\(([^()]+?),\s*('[^']*')\s+ORDER\s+BY\s+([^()]+?)\)",
        r"listagg(\1, \2) WITHIN GROUP (ORDER BY \3)",
        out,
        flags=re.IGNORECASE,
    )
    return out


def register_views(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> None:
    """Register each parquet table as a temp view named after itself."""
    from data_migration_etl_scripts_spark.queries import _t

    for name in tables or TABLES:
        _t(spark, sf_dir, name).createOrReplaceTempView(name)


def run_sql(
    spark: SparkSession, sf_dir: str, sql: str, dialect: str = "spark"
) -> DataFrame:
    """Ad-hoc SQL over the catalog: register views, return the lazy
    DataFrame for ``sql``. Catalyst applies the same pushdown/pruning
    as the DataFrame API — a view is just a named logical plan.
    ``dialect="duckdb"`` first applies :func:`translate_duckdb_sql`,
    so the driver-oracle texts run here unchanged."""
    register_views(spark, sf_dir)
    if dialect == "duckdb":
        sql = translate_duckdb_sql(sql)
    return spark.sql(sql)
