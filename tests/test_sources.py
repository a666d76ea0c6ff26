"""Source wrappers: CSV/JSON readers and JDBC query construction."""

from __future__ import annotations

from data_migration_etl_scripts_spark.sources import (
    read_csv,
    read_json,
    watermark_query,
)


def test_read_csv_with_schema(spark, tmp_path):
    p = tmp_path / "roles.csv"
    p.write_text("UserID,FormName,Access\n1,Users,true\n2,Cancel Order,false\n")
    df = read_csv(spark, str(p), schema="UserID long, FormName string, Access boolean")
    rows = {r.UserID: (r.FormName, r.Access) for r in df.collect()}
    assert rows == {1: ("Users", True), 2: ("Cancel Order", False)}


def test_read_csv_infers(spark, tmp_path):
    p = tmp_path / "x.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    df = read_csv(spark, str(p))
    assert dict(df.dtypes)["a"] == "int"


def test_read_json(spark, tmp_path):
    p = tmp_path / "x.jsonl"
    p.write_text('{"k": 1, "v": "a"}\n{"k": 2, "v": "b"}\n')
    df = read_json(spark, str(p), schema="k long, v string")
    assert df.count() == 2


def test_watermark_query_construction():
    q = watermark_query("dbo.Orders", "OrderID", 1500, columns=["OrderID", "Total"],
                        extra_predicates=["CreatedOn > '2025-01-01'"])
    assert q == (
        "SELECT OrderID, Total FROM dbo.Orders"
        " WHERE CreatedOn > '2025-01-01' AND OrderID > 1500"
    )
    assert watermark_query("t", "pk", None) == "SELECT * FROM t"


def test_jsonl_roundtrip_and_orc_pushdown(spark, tmp_path):
    from data_migration_etl_scripts_spark.sources.files import (
        read_jsonl,
        read_orc,
        write_jsonl,
        write_orc,
    )

    df = spark.range(100).selectExpr("id", "concat('doc ', id) AS text")
    jl = str(tmp_path / "docs_jsonl")
    write_jsonl(df, jl, compression="gzip")
    back = read_jsonl(spark, jl, schema="id long, text string")
    assert back.count() == 100
    assert {r.id for r in back.where("id < 3").collect()} == {0, 1, 2}

    oc = str(tmp_path / "docs_orc")
    write_orc(df, oc)
    scanned = read_orc(spark, oc).where("id > 90").select("id")
    plan = scanned._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(id,90)" in plan
    assert scanned.count() == 9
