"""Replicates the driver's correctness gate locally: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
at sf0.01, compare row count, column names, and an order-insensitive
value hash (columns sorted by name, rows sorted, values canonicalized).

Usage:
    python tools/selfcheck.py              # all queries
    python tools/selfcheck.py q1 dedup_*   # substring filters
    python tools/selfcheck.py --json SELFCHECK_r03.json   # + artifact
    SELFCHECK_SF_DIR=/root/testdata/sf0.001 python tools/selfcheck.py

With ``--json PATH`` a machine-readable per-query artifact (status,
row counts, value hashes, seconds) is written — committed per round so
queries outside the driver's pinned board carry durable correctness
evidence.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time
import traceback

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SELFCHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def canon(v) -> str:
    """Canonicalize a value for hashing (engine-agnostic)."""
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        f = float(v)
        return canon(f)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> tuple[str, int]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.md5("\n".join(lines).encode()).hexdigest()
    return h, len(rows)


def main() -> int:
    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        args = args[:i] + args[i + 2 :]
    filters = args
    import __spark_entry__ as entrymod
    from data_migration_etl_scripts_spark import get_spark

    spark = get_spark(shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.isdir(path):
            # engine-generated datasets (tools/gen_sf.py) are Spark
            # directory writes; the driver's testdata are single files
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if filters:
        qs = {k: v for k, v in qs.items() if any(f in k for f in filters)}

    failures = []
    board: dict[str, dict] = {}
    for name, fn in qs.items():
        t0 = time.time()
        spark.catalog.clearCache()  # operators may persist(); keep runs independent
        rec = board[name] = {
            "status": None, "spark_rows": None, "oracle_rows": None,
            "spark_hash": None, "oracle_hash": None, "secs": None,
        }
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL  {name}: SPARK ERROR\n{traceback.format_exc()}")
            failures.append(name)
            rec["status"] = "spark_error"
            continue
        if name not in oracles:
            rec.update(status="rows_only", spark_rows=len(srows),
                       secs=round(time.time() - t0, 2))
            print(f"ok*   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [c.lower() for c in rel.columns]
            orows = rel.fetchall()
        except Exception:
            print(f"FAIL  {name}: ORACLE ERROR\n{traceback.format_exc()}")
            failures.append(name)
            rec["status"] = "oracle_error"
            continue
        scols_l = [c.lower() for c in scols]
        sh, sn = table_hash(scols_l, srows)
        oh, on = table_hash(ocols, orows)
        rec.update(spark_rows=sn, oracle_rows=on, spark_hash=sh, oracle_hash=oh,
                   secs=round(time.time() - t0, 2))
        if sorted(scols_l) != sorted(ocols):
            print(f"FAIL  {name}: COLUMNS spark={sorted(scols_l)} oracle={sorted(ocols)}")
            failures.append(name)
            rec["status"] = "columns_mismatch"
        elif sn != on:
            print(f"FAIL  {name}: ROWCOUNT spark={sn} oracle={on}")
            failures.append(name)
            rec["status"] = "rowcount_mismatch"
        elif sh != oh:
            print(f"FAIL  {name}: HASH mismatch ({sn} rows)")
            _diff(scols_l, srows, ocols, orows)
            failures.append(name)
            rec["status"] = "hash_mismatch"
        else:
            print(f"ok    {name}: {sn} rows match ({time.time()-t0:.1f}s)")
            rec["status"] = "ok"

    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries pass")
    if json_path:
        import json

        summary = {
            "sf_dir": SF_DIR,
            "n_queries": len(qs),
            "n_pass": len(qs) - len(failures),
            "queries": board,
        }
        with open(json_path, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
        print(f"artifact: {json_path}")
    spark.stop()
    return 1 if failures else 0


def _diff(scols, srows, ocols, orows, limit=3):
    so = sorted(range(len(scols)), key=lambda i: scols[i])
    oo = sorted(range(len(ocols)), key=lambda i: ocols[i])
    sset = {"|".join(canon(r[i]) for i in so) for r in srows}
    oset = {"|".join(canon(r[i]) for i in oo) for r in orows}
    cols = sorted(scols)
    print(f"      cols: {cols}")
    for line in list(sset - oset)[:limit]:
        print(f"      spark-only:  {line}")
    for line in list(oset - sset)[:limit]:
        print(f"      oracle-only: {line}")


if __name__ == "__main__":
    raise SystemExit(main())
