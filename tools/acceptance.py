"""One-shot acceptance gate: run every verification surface in order
and print a single PASS/FAIL summary line per surface.

    python tools/acceptance.py            # pytest + selfcheck + bench
    python tools/acceptance.py --smoke    # also the 10x scale smoke

Exit code 0 only if every surface passes — the local equivalent of
the driver's correctness + bench round, suitable for CI or a
pre-round sanity check.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(name: str, cmd: list[str]) -> bool:
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True)
    ok = proc.returncode == 0
    status = "PASS" if ok else "FAIL"
    print(f"{status}  {name}  ({time.time() - t0:.0f}s)")
    if not ok:
        tail = "\n".join((proc.stdout + proc.stderr).splitlines()[-25:])
        print(tail)
    return ok


def main() -> int:
    surfaces = [
        ("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"]),
        ("selfcheck (DuckDB oracles, sf0.01)",
         [sys.executable, "tools/selfcheck.py", "--json", "SELFCHECK_LOCAL.json"]),
        ("full-DAG sink hashes (V1 fixtures)",
         [sys.executable, "tools/dag_acceptance.py", "--json", "DAG_ACCEPTANCE.json"]),
        ("bench (sf0.1)", [sys.executable, "bench.py"]),
    ]
    if "--smoke" in sys.argv:
        surfaces.append(("10x scale smoke", [sys.executable, "tools/scale_smoke.py"]))
    results = [run(name, cmd) for name, cmd in surfaces]
    print(f"\n{sum(results)}/{len(results)} surfaces pass")
    return 0 if all(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
