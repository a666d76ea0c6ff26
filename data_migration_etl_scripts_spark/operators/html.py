"""HTML -> text extraction and wordlist filtering — the front of every
web-corpus training-data pipeline (CommonCrawl-style WARC processing:
strip markup, measure boilerplate, drop policy-violating docs) that
the engine lacked until round 6.

Everything here is pure column expressions (zero UDFs, zero shuffles
beyond the caller's own): at 100 TB these run map-side inside
whole-stage codegen and pipeline into whatever scan precedes them,
which is exactly how a 1000-executor WARC pass wants its per-document
transforms. Every operator has a DuckDB twin built from the SAME regex
strings — both engines run RE2-compatible patterns (no backreferences,
``(?is)`` inline flags, lazy quantifiers), so the twins hash-match.

Scope (documented): the extractor is the regex pipeline every
practical pass starts with — script/style/comment removal, block tags
to newlines, all other tags stripped, the common named entities
decoded, whitespace normalized. Numeric character references beyond
``&#39;`` and full DOM-aware boilerplate models (trafilatura-class
readability scoring) are the documented plug point; the LINK-DENSITY
signal (fraction of text inside <a> tags — the classic boilerplate
discriminator) is computed exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_migration_etl_scripts_spark.operators import textprep as tp

#: (pattern, replacement marker) pipeline shared verbatim by both
#: engines. NOTE: RE2 (DuckDB) has no backreferences — script and
#: style blocks are separate patterns by design.
_BLOCK_TAGS = (
    "p|div|br|h[1-6]|li|ul|ol|tr|td|th|table|section|article|header"
    "|footer|blockquote"
)
_RE_SCRIPT = r"(?is)<script\b[^>]*>.*?</script>"
_RE_STYLE = r"(?is)<style\b[^>]*>.*?</style>"
_RE_COMMENT = r"(?s)<!--.*?-->"
_RE_BLOCK = rf"(?i)</?({_BLOCK_TAGS})\b[^>]*>"
_RE_TAG = r"(?s)<[^>]+>"
_RE_HSPACE = "[ \t\x0b\f\r]+"
_RE_NL = " ?\n[ \n]*"
_RE_ANCHOR = r"(?is)<a\b[^>]*>(.*?)</a>"

#: the named entities every practical corpus decode handles; numeric
#: references beyond &#39; stay at the plug point (module docstring)
_ENTITIES = (
    ("&nbsp;", " "),
    ("&amp;", "&"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
)


def html_to_text(col: Column | str) -> Column:
    """HTML -> visible text: script/style/comment blocks dropped,
    block-level tags become newlines, remaining tags stripped, named
    entities decoded, horizontal whitespace squashed, newline runs
    collapsed, trimmed."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, _RE_SCRIPT, " ")
    c = F.regexp_replace(c, _RE_STYLE, " ")
    c = F.regexp_replace(c, _RE_COMMENT, " ")
    c = F.regexp_replace(c, _RE_BLOCK, "\n")
    c = F.regexp_replace(c, _RE_TAG, " ")
    for ent, ch in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    c = F.regexp_replace(c, _RE_HSPACE, " ")
    c = F.regexp_replace(c, _RE_NL, "\n")
    c = F.regexp_replace(c, "^\n+|\n+$", "")  # trim() is space-only
    return F.trim(c)


def html_to_text_sql(expr: str) -> str:
    """DuckDB twin of :func:`html_to_text` (same regex strings)."""
    c = expr
    for pat in (_RE_SCRIPT, _RE_STYLE, _RE_COMMENT):
        c = f"regexp_replace({c}, '{pat}', ' ', 'g')"
    c = f"regexp_replace({c}, '{_RE_BLOCK}', chr(10), 'g')"
    c = f"regexp_replace({c}, '{_RE_TAG}', ' ', 'g')"
    for ent, ch in _ENTITIES:
        lit = "chr(39)" if ch == "'" else f"'{ch}'"
        c = f"replace({c}, '{ent}', {lit})"
    c = f"regexp_replace({c}, '[ \\t\\x0B\\f\\r]+', ' ', 'g')"
    c = f"regexp_replace({c}, ' ?\\n[ \\n]*', chr(10), 'g')"
    c = f"regexp_replace({c}, '^\\n+|\\n+$', '', 'g')"
    return f"trim({c})"


def _anchor_text_len(col: Column) -> Column:
    """Total characters inside <a>...</a> (pre-strip) — the numerator
    of the classic link-density boilerplate signal."""
    return F.aggregate(
        F.transform(
            F.regexp_extract_all(col, F.lit(_RE_ANCHOR), F.lit(1)),
            lambda s: F.length(s),
        ),
        F.lit(0),
        lambda a, x: a + x,
    )


def extract_text(df: DataFrame, id_col: str, html_col: str) -> DataFrame:
    """Per-document extraction: (id, text_clean, n_chars, n_links,
    link_density). link_density = anchor-text chars / clean-text chars
    (0 for empty docs), rounded to 6 dp for cross-engine parity."""
    clean = html_to_text(F.col(html_col))
    n_links = F.size(
        F.regexp_extract_all(F.col(html_col), F.lit(_RE_ANCHOR), F.lit(1))
    )
    # materialize clean ONCE (no CSE across projections)
    out = df.select(
        F.col(id_col),
        clean.alias("text_clean"),
        n_links.alias("n_links"),
        _anchor_text_len(F.col(html_col)).alias("__alen"),
    )
    return out.select(
        id_col,
        "text_clean",
        F.length("text_clean").alias("n_chars"),
        "n_links",
        F.when(
            F.length("text_clean") > 0,
            F.round(F.col("__alen") / F.length("text_clean"), 6),
        ).otherwise(F.lit(0.0)).alias("link_density"),
    )


def extract_text_sql(table: str, id_col: str, html_col: str) -> str:
    """DuckDB twin of :func:`extract_text`."""
    clean = html_to_text_sql(html_col)
    alen = (
        f"coalesce((SELECT sum(length(m)) FROM "
        f"unnest(regexp_extract_all({html_col}, '{_RE_ANCHOR}', 1)) u(m)), 0)"
    )
    nlinks = f"len(regexp_extract_all({html_col}, '{_RE_ANCHOR}', 1))"
    return f"""
        SELECT {id_col}, text_clean,
               length(text_clean) AS n_chars,
               n_links,
               CASE WHEN length(text_clean) > 0
                    THEN round(__alen / CAST(length(text_clean) AS DOUBLE), 6)
                    ELSE 0.0 END AS link_density
        FROM (
            SELECT {id_col}, {clean} AS text_clean,
                   {nlinks} AS n_links,
                   CAST({alen} AS DOUBLE) AS __alen
            FROM {table}
        )
    """


def blocklist_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    max_frac: float = 0.0,
) -> DataFrame:
    """C4-style wordlist policy filter: tokenize (the engine's
    canonical lowercase-alnum tokens), count blocklisted tokens, and
    keep docs whose flagged fraction is <= ``max_frac`` (the C4 rule
    is max_frac=0: any hit drops the document). Returns every doc
    labeled (id, n_tokens, n_flagged, flagged_frac, keep) so the
    survivor set is one filter and the drop set is auditable.

    Scale: the term set rides the plan as a literal IN-list (policy
    lists are hundreds of terms — broadcast-sized by nature); the scan
    is one map-side pass, no shuffle."""
    toks = tp.tokens(text_col)
    lowered = [t.lower() for t in terms]
    flagged = F.filter(toks, lambda x: x.isin(*lowered))
    out = df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(flagged).alias("n_flagged"),
    )
    frac = F.when(
        F.col("n_tokens") > 0,
        F.round(F.col("n_flagged") / F.col("n_tokens"), 6),
    ).otherwise(F.lit(0.0))
    return out.select(
        id_col, "n_tokens", "n_flagged",
        frac.alias("flagged_frac"),
        (frac <= max_frac).alias("keep"),
    )


def blocklist_filter_sql(
    table: str,
    id_col: str,
    text_col: str,
    terms: list[str],
    max_frac: float = 0.0,
) -> str:
    """DuckDB twin of :func:`blocklist_filter`."""
    toks = tp.tokens_sql(text_col)
    in_list = ", ".join("'" + t.lower().replace("'", "''") + "'" for t in terms)
    return f"""
        SELECT {id_col}, n_tokens, n_flagged,
               CASE WHEN n_tokens > 0
                    THEN round(n_flagged / CAST(n_tokens AS DOUBLE), 6)
                    ELSE 0.0 END AS flagged_frac,
               (CASE WHEN n_tokens > 0
                     THEN round(n_flagged / CAST(n_tokens AS DOUBLE), 6)
                     ELSE 0.0 END) <= {max_frac} AS keep
        FROM (
            SELECT {id_col},
                   len({toks}) AS n_tokens,
                   len(list_filter({toks}, x -> x IN ({in_list}))) AS n_flagged
            FROM {table}
        )
    """


# ------------------------------------------------ markdown (r6)

#: shared pattern strings (RE2-compatible: no backreferences in the
#: PATTERNS; capture-group replacements differ only in marker syntax —
#: $1 in Spark, \1 in DuckDB)
_MD_FENCE = r"(?s)```.*?```"
_MD_IMAGE = r"!\[([^\]]*)\]\([^)]*\)"
_MD_LINK = r"\[([^\]]*)\]\([^)]*\)"
_MD_HEADER = r"(?m)^#{1,6}[ \t]+"
_MD_QUOTE = r"(?m)^>[ \t]?"
_MD_LIST = r"(?m)^[ \t]*([-*+]|[0-9]+\.)[ \t]+"
_MD_RULE = r"(?m)^[ \t]*(-{3,}|={3,}|\*{3,})[ \t]*$"
_MD_EMPH = r"\*{1,3}"


def markdown_to_text(col: Column | str) -> Column:
    """Markdown -> prose text: fenced code blocks dropped (code is not
    prose — count them separately), image/link syntax reduced to its
    visible text, header/quote/list/rule markers stripped, asterisk
    emphasis unwrapped, backticks and table pipes removed, whitespace
    normalized. Underscore emphasis is deliberately NOT stripped
    (snake_case identifiers survive). Pure column expressions — the
    README/issue/doc half of a code-adjacent corpus runs map-side."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, _MD_FENCE, " ")
    c = F.regexp_replace(c, _MD_IMAGE, "$1")
    c = F.regexp_replace(c, _MD_LINK, "$1")
    c = F.regexp_replace(c, _MD_RULE, " ")
    c = F.regexp_replace(c, _MD_HEADER, "")
    c = F.regexp_replace(c, _MD_QUOTE, "")
    c = F.regexp_replace(c, _MD_LIST, "")
    c = F.regexp_replace(c, _MD_EMPH, "")
    for lit in ("`", "|"):
        c = F.replace(c, F.lit(lit), F.lit(" "))
    c = F.regexp_replace(c, _RE_HSPACE, " ")
    c = F.regexp_replace(c, _RE_NL, "\n")
    c = F.regexp_replace(c, "^\n+|\n+$", "")
    return F.trim(c)


def markdown_to_text_sql(expr: str) -> str:
    """DuckDB twin of :func:`markdown_to_text` (same pattern strings,
    \\1 replacement markers)."""
    c = expr
    c = f"regexp_replace({c}, '{_MD_FENCE}', ' ', 'g')"
    c = f"regexp_replace({c}, '{_MD_IMAGE}', '\\1', 'g')"
    c = f"regexp_replace({c}, '{_MD_LINK}', '\\1', 'g')"
    c = f"regexp_replace({c}, '{_MD_RULE}', ' ', 'g')"
    c = f"regexp_replace({c}, '{_MD_HEADER}', '', 'g')"
    c = f"regexp_replace({c}, '{_MD_QUOTE}', '', 'g')"
    c = f"regexp_replace({c}, '{_MD_LIST}', '', 'g')"
    c = f"regexp_replace({c}, '{_MD_EMPH}', '', 'g')"
    c = f"replace({c}, chr(96), ' ')"
    c = f"replace({c}, chr(124), ' ')"
    c = f"regexp_replace({c}, '[ \\t\\x0B\\f\\r]+', ' ', 'g')"
    c = f"regexp_replace({c}, ' ?\\n[ \\n]*', chr(10), 'g')"
    c = f"regexp_replace({c}, '^\\n+|\\n+$', '', 'g')"
    return f"trim({c})"


def extract_markdown(df: DataFrame, id_col: str, md_col: str) -> DataFrame:
    """(id, text, n_chars, n_code_blocks, n_links): extraction plus the
    two structure signals a code-adjacent quality filter keys on.
    n_code_blocks counts fences on the raw source; n_links counts on
    the FENCE-STRIPPED source (link syntax inside code is code, not a
    link) and excludes image syntax (every ![alt](url) contains a
    [alt](url) substring the link pattern would otherwise match)."""
    n_code = F.regexp_count(F.col(md_col), F.lit(_MD_FENCE))
    defenced = F.regexp_replace(F.col(md_col), _MD_FENCE, " ")
    n_links = (
        F.regexp_count(defenced, F.lit(_MD_LINK))
        - F.regexp_count(defenced, F.lit(_MD_IMAGE))
    )
    return df.select(
        F.col(id_col),
        markdown_to_text(md_col).alias("text"),
        F.length(markdown_to_text(md_col)).alias("n_chars"),
        n_code.alias("n_code_blocks"),
        n_links.alias("n_links"),
    )


def extract_markdown_sql(table: str, id_col: str, md_col: str) -> str:
    """DuckDB twin of :func:`extract_markdown`."""
    txt = markdown_to_text_sql(md_col)
    defenced = f"regexp_replace({md_col}, '{_MD_FENCE}', ' ', 'g')"
    return f"""
    SELECT {id_col},
           {txt} AS text,
           length({txt}) AS n_chars,
           length(regexp_extract_all({md_col}, '{_MD_FENCE}')) AS n_code_blocks,
           length(regexp_extract_all({defenced}, '{_MD_LINK}'))
               - length(regexp_extract_all({defenced}, '{_MD_IMAGE}')) AS n_links
    FROM {table}
    """
