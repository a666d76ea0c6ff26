"""Compare two bench artifacts (BENCH_LOCAL.json / BENCH_r{N}.json):
shared-query totals, the biggest movers both ways, and added/removed
queries — the per-round adjudication this repo's verdicts do by hand.

Usage:
    python tools/bench_diff.py OLD.json NEW.json [top_n]
    python tools/bench_diff.py <(git show r6tag:BENCH_LOCAL.json) BENCH_LOCAL.json
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as f:
        doc = json.load(f)
    return doc["queries"] if "queries" in doc else doc


def main() -> int:
    old_p, new_p = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    old, new = load(old_p), load(new_p)
    shared = sorted(set(old) & set(new))
    to = sum(old[k] for k in shared)
    tn = sum(new[k] for k in shared)
    print(f"shared {len(shared)} queries: {to:.1f}s -> {tn:.1f}s "
          f"(ratio {tn / to:.3f})" if to else "no shared queries")
    movers = sorted(((new[k] - old[k], k) for k in shared), reverse=True)
    print(f"\ntop {top_n} regressions:")
    for d, k in movers[:top_n]:
        if d <= 0:
            break
        print(f"  +{d:6.2f}  {k}: {old[k]:.2f} -> {new[k]:.2f}")
    print(f"\ntop {top_n} improvements:")
    for d, k in sorted(movers)[:top_n]:
        if d >= 0:
            break
        print(f"  {d:6.2f}  {k}: {old[k]:.2f} -> {new[k]:.2f}")
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print(f"\nadded ({len(added)}, {sum(new[k] for k in added):.1f}s): "
              + ", ".join(added))
    if removed:
        print(f"removed ({len(removed)}): " + ", ".join(removed))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
