"""Compare two bench artifacts (BENCH_LOCAL.json / BENCH_r{N}.json):
shared-query totals, the biggest movers both ways, and added/removed
queries — the per-round adjudication this repo's verdicts do by hand.

When either artifact carries a per-query "spread" field (produced by
``bench.py --repeat N``), a mover is flagged only when |delta| clears
max(spread_old, spread_new, 0.3 s) — the measured run-to-run noise
band — and within-band changes are summarized, not listed.

Usage:
    python tools/bench_diff.py OLD.json NEW.json [top_n]
    python tools/bench_diff.py <(git show r6tag:BENCH_LOCAL.json) BENCH_LOCAL.json
"""

from __future__ import annotations

import json
import sys

#: movers below this absolute delta are never flagged, spread or not
NOISE_FLOOR_SEC = 0.3


def load(path: str) -> tuple[dict[str, float], dict[str, float]]:
    with open(path) as f:
        doc = json.load(f)
    if "queries" in doc:
        return doc["queries"], doc.get("spread", {})
    return doc, {}


def main() -> int:
    old_p, new_p = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    old, old_spread = load(old_p)
    new, new_spread = load(new_p)
    shared = sorted(set(old) & set(new))
    to = sum(old[k] for k in shared)
    tn = sum(new[k] for k in shared)
    print(f"shared {len(shared)} queries: {to:.1f}s -> {tn:.1f}s "
          f"(ratio {tn / to:.3f})" if to else "no shared queries")

    def band(k: str) -> float:
        return max(old_spread.get(k, 0.0), new_spread.get(k, 0.0),
                   NOISE_FLOOR_SEC)

    movers = sorted(((new[k] - old[k], k) for k in shared), reverse=True)
    in_band = [k for d, k in movers if abs(d) <= band(k)]
    flagged_up = [(d, k) for d, k in movers if d > band(k)]
    flagged_down = [(d, k) for d, k in sorted(movers) if -d > band(k)]
    if old_spread or new_spread:
        print(f"(spread-aware: {len(in_band)} of {len(shared)} shared "
              f"queries moved within their noise band)")
    print(f"\ntop {top_n} regressions (beyond band):")
    for d, k in flagged_up[:top_n]:
        print(f"  +{d:6.2f}  {k}: {old[k]:.2f} -> {new[k]:.2f}"
              f"  [band {band(k):.2f}]")
    if not flagged_up:
        print("  none")
    print(f"\ntop {top_n} improvements (beyond band):")
    for d, k in flagged_down[:top_n]:
        print(f"  {d:6.2f}  {k}: {old[k]:.2f} -> {new[k]:.2f}"
              f"  [band {band(k):.2f}]")
    if not flagged_down:
        print("  none")
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
