"""HTML -> text extraction + blocklist filter: golden extractions,
entity decoding, link density, RE2-compatibility of the shared regex
strings, and the C4-style keep rule."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from data_migration_etl_scripts_spark.operators import html as hx

CASES = [
    # (html, expected visible text)
    ("<p>hello world</p>", "hello world"),
    ("<h1>Title</h1><p>body</p>", "Title\nbody"),
    ("<script>var x = '<p>sneaky</p>';</script>after", "after"),
    ("<style>p { color: red }</style>styled", "styled"),
    ("<!-- hidden -->shown", "shown"),
    ("a&amp;b &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end",
     'a&b <tag> "q" \'s\' end'),
    ("<div>one</div><div>two</div>", "one\ntwo"),
    ("<span>in</span><b>line</b>", "in line"),
    ("text <a href='/x'>link</a> tail", "text link tail"),
    ("", ""),
    ("   \t spaced\n\n\nout   ", "spaced\nout"),
    ("<SCRIPT>UPPER()</SCRIPT><P>case</P>", "case"),
]


def _spark_extract(spark, html: str) -> str:
    return spark.range(1).select(
        hx.html_to_text(F.lit(html)).alias("t")
    ).first().t


@pytest.mark.parametrize("html,want", CASES)
def test_html_to_text_goldens(spark, html, want):
    assert _spark_extract(spark, html) == want


@pytest.mark.parametrize("html,want", CASES)
def test_duckdb_twin_matches_goldens(html, want):
    con = duckdb.connect()
    lit = "'" + html.replace("'", "''") + "'"
    got = con.sql(f"SELECT {hx.html_to_text_sql(lit)} AS t").fetchone()[0]
    assert got == want


def test_extract_text_link_density(spark):
    html = "<p>aaaa</p><a href='/'>bbbb</a>"  # 4 anchor chars / 9 clean
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    row = hx.extract_text(df, "doc_id", "html").first()
    assert row.text_clean == "aaaa\nbbbb"
    assert row.n_links == 1
    assert row.n_chars == 9
    assert abs(row.link_density - 4 / 9) < 1e-6


def test_extract_text_no_links_zero_density(spark):
    df = spark.createDataFrame([(1, "<p>plain</p>"), (2, "")],
                               "doc_id long, html string")
    out = {r.doc_id: r for r in hx.extract_text(df, "doc_id", "html").collect()}
    assert out[1].link_density == 0.0 and out[1].n_links == 0
    assert out[2].n_chars == 0 and out[2].link_density == 0.0


def test_blocklist_filter_c4_rule(spark):
    df = spark.createDataFrame(
        [
            (1, "clean text all good here"),
            (2, "one bad Apple spoils it"),
            (3, "bad bad bad bad"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in
           hx.blocklist_filter(df, "doc_id", "text", ["bad", "APPLE"]).collect()}
    assert out[1].keep and out[1].n_flagged == 0
    assert not out[2].keep and out[2].n_flagged == 2  # bad + apple (cased)
    assert not out[3].keep and out[3].flagged_frac == 1.0
    assert out[4].keep and out[4].n_tokens == 0  # empty doc passes


def test_blocklist_threshold_form(spark):
    df = spark.createDataFrame(
        [(1, " ".join(["ok"] * 99 + ["bad"]))], "doc_id long, text string"
    )
    strict = hx.blocklist_filter(df, "doc_id", "text", ["bad"], max_frac=0.0)
    loose = hx.blocklist_filter(df, "doc_id", "text", ["bad"], max_frac=0.02)
    assert not strict.first().keep
    assert loose.first().keep


def test_regexes_are_re2_compatible():
    # the shared patterns must stay backreference-free (DuckDB = RE2)
    import re as _re

    for pat in (hx._RE_SCRIPT, hx._RE_STYLE, hx._RE_COMMENT,
                hx._RE_BLOCK, hx._RE_TAG, hx._RE_ANCHOR):
        assert "\\1" not in pat and "(?P=" not in pat
        _re.compile(pat)  # and they are valid Java/Python-style too


def test_extraction_is_map_side_only(spark):
    df = spark.createDataFrame([(1, "<p>x</p>")], "doc_id long, html string")
    plan = hx.extract_text(df, "doc_id", "html")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffles: pure projection


def test_markdown_fence_with_inner_backticks(spark):
    from data_migration_etl_scripts_spark.operators import html as hx

    md = "intro\n```\nx = `cmd` + `other`\n```\nprose [a](http://x) tail"
    df = spark.createDataFrame([(1, md)], "doc_id long, md string")
    row = hx.extract_markdown(df, "doc_id", "md").collect()[0]
    assert row["n_code_blocks"] == 1
    assert "cmd" not in row["text"]  # code body dropped, backticks and all
    assert row["n_links"] == 1


def test_markdown_link_count_excludes_images_and_code(spark):
    from data_migration_etl_scripts_spark.operators import html as hx

    md = ("![pic](/i.png) real [link](http://a) "
          "```\n[not a link](http://in-code)\n```")
    df = spark.createDataFrame([(1, md)], "doc_id long, md string")
    row = hx.extract_markdown(df, "doc_id", "md").collect()[0]
    assert row["n_links"] == 1
    assert row["n_code_blocks"] == 1
    assert row["text"].startswith("pic real link")
