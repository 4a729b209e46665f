"""Round-over-round per-query bench comparator.

``BENCH_FULL.json`` is committed every round (the per-query wall
table); this module diffs the current run against the previously
committed table so "no query regressed" is a computed number in the
bench summary instead of a claim re-derived from top-10 snapshots.

Noise discipline: the shared host stalls individual queries 10-30×
(BASELINE.md round-3 protocol notes), so a "regression" only counts
when the CURRENT wall is both >``factor``× the prior wall AND above
``floor`` seconds — sub-second flutter on either side is ambient, not
a plan change. The bench's stall guard has already re-run outliers by
the time this comparator sees the timings.

Standalone use:  python tools/bench_compare.py BENCH_FULL.json
(compares the file against the git-HEAD version of itself).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REGRESSION_FACTOR = 1.5
REGRESSION_FLOOR_SEC = 1.0


def regressions(
    prev_queries: dict[str, float],
    cur_queries: dict[str, float],
    factor: float = REGRESSION_FACTOR,
    floor: float = REGRESSION_FLOOR_SEC,
) -> dict[str, tuple[float, float]]:
    """Queries whose current wall exceeds factor× their prior wall
    (current wall above the noise floor). Returns {name: (prev, cur)}."""
    return {
        n: (prev_queries[n], t)
        for n, t in sorted(cur_queries.items())
        if n in prev_queries and t > floor and t > factor * prev_queries[n]
    }


def load_previous(path: str) -> dict | None:
    """The prior round's table: the committed (git HEAD) version of
    ``path`` if the working copy is being regenerated, else the file
    itself. Returns None when no prior table exists (round 1)."""
    rel = os.path.basename(path)
    try:
        blob = subprocess.run(
            ["git", "show", f"HEAD:{rel}"],
            capture_output=True,
            cwd=os.path.dirname(os.path.abspath(path)) or ".",
            timeout=10,
        )
        if blob.returncode == 0:
            return json.loads(blob.stdout)
    except Exception:
        pass
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return None


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_FULL.json"
    with open(path) as f:
        cur = json.load(f)
    prev = load_previous(path)
    if prev is None or prev.get("queries") == cur.get("queries"):
        print("no prior BENCH_FULL.json to compare against")
        return 0
    reg = regressions(prev["queries"], cur["queries"])
    print(
        f"{len(reg)} quer{'y' if len(reg) == 1 else 'ies'} >"
        f"{REGRESSION_FACTOR}x prior wall (floor {REGRESSION_FLOOR_SEC}s);"
        f" totals {prev.get('value')}s -> {cur.get('value')}s"
    )
    for n, (p, c) in sorted(reg.items(), key=lambda kv: -kv[1][1]):
        print(f"  {n}: {p}s -> {c}s ({c / p:.1f}x)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
