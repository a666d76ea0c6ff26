"""Probe every oracle text against the Spark SQL front-end: run each
``oracle_sql()`` entry through ``sql.run_sql(dialect="duckdb")`` at
sf0.001 and row-match it against the DataFrame twin, reporting which
texts pass, which fail to parse/run, and which run-but-mismatch.

This is the widening loop for the dialect shim: each failure's first
error line names the next translation to build (or the reason a text
must stay off the compat board).

Usage:
    python tools/sql_probe.py              # texts not already on a board
    python tools/sql_probe.py --all        # every oracle text
    python tools/sql_probe.py retention    # substring filter
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SQL_PROBE_SF_DIR", "/root/testdata/sf0.001")


def _canon_rows(rows):
    """The driver's value canonicalization (floats rounded to 9
    digits, Decimal folded to float) — the same protocol the
    correctness gate hashes with."""
    from tools.selfcheck import canon

    out = []
    for r in rows:
        d = r.asDict()
        out.append(tuple(canon(d[k]) for k in sorted(d)))
    return sorted(out)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    probe_all = "--all" in sys.argv

    import __spark_entry__ as entry
    from data_migration_etl_scripts_spark import sql as esql
    from data_migration_etl_scripts_spark.session import get_spark
    from tests.test_sql_surface import SQL_COMPAT_BOARD, SQL_PORTABLE_BOARD

    spark = get_spark()
    qs, oracles = entry.queries(), entry.oracle_sql()
    on_board = set(SQL_PORTABLE_BOARD) | set(SQL_COMPAT_BOARD)

    names = sorted(
        n for n in oracles
        if (probe_all or n not in on_board)
        and (not args or any(a in n for a in args))
    )
    passed, mismatched, errored = [], [], []
    for name in names:
        try:
            sql_rows = _canon_rows(
                esql.run_sql(spark, SF_DIR, oracles[name], dialect="duckdb")
                .collect()
            )
            df_rows = _canon_rows(qs[name](spark, SF_DIR).collect())
        except Exception as e:  # noqa: BLE001 - probe reports, never dies
            first = str(e).strip().splitlines()[0][:160] if str(e) else type(e).__name__
            errored.append((name, first))
            print(f"err   {name}: {first}", flush=True)
            continue
        if sql_rows == df_rows:
            passed.append(name)
            print(f"ok    {name}", flush=True)
        else:
            mismatched.append(name)
            print(f"MISM  {name}: rows {len(sql_rows)} vs {len(df_rows)}",
                  flush=True)

    print(f"\n{len(passed)} pass / {len(mismatched)} mismatch / "
          f"{len(errored)} error (of {len(names)} probed; "
          f"{len(on_board)} already on boards)")
    if passed:
        print("\nNEW PASSES (add to SQL_COMPAT_BOARD):")
        for n in passed:
            print(f"    \"{n}\",")


if __name__ == "__main__":
    main()
