"""Mechanical cross-round bench comparison — no more narrative A/B.

Diffs the current BENCH_full.json against a prior round's full artifact
(pass a path, or a git rev whose BENCH_full.json is extracted), buckets
each per-query delta against the HOST CALIBRATION drift, and prints only
the deltas that exceed the residual band — the candidates worth a solo
re-run (`python bench.py <entry>`), which remains the final arbiter.

Method: bench.py records host_python_loop_sec / host_jvm_agg_sec with
every suite run (two fixed microbenchmarks pricing the two substrates,
which round-9 measured drifting in OPPOSITE directions on one
re-provision: JVM -20%, Python +40%). A query's expected cross-round
ratio lies between the two substrate ratios; anything outside
[min_ratio / band, max_ratio * band] is flagged. The headline
pagerank_s3_solo_median_sec is compared directly (fresh-JVM medians are
already host-comparable modulo the JVM scalar).

Usage:
  python tools/bench_compare.py <old BENCH_full.json | git-rev> [band=1.3]
"""

from __future__ import annotations

import json
import subprocess
import sys


def load(ref: str) -> dict:
    try:
        with open(ref) as fh:
            return json.load(fh)
    except OSError:
        out = subprocess.run(
            ["git", "-C", "/root/repo", "show", f"{ref}:BENCH_full.json"],
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out)


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    old = load(sys.argv[1])
    band = float(sys.argv[2]) if len(sys.argv) > 2 else 1.3
    cur = load("/root/repo/BENCH_full.json")

    ratios = []
    for k in ("host_python_loop_sec", "host_jvm_agg_sec"):
        if k in old and k in cur and old[k]:
            ratios.append(cur[k] / old[k])
            print(f"{k}: {old[k]} -> {cur[k]} ({cur[k] / old[k]:.2f}x)")
    if ratios:
        lo, hi = min(ratios) / band, max(ratios) * band
    else:
        print("no host calibration in one artifact; using raw band")
        lo, hi = 1 / band, band
    print(f"acceptance ratio window: [{lo:.2f}, {hi:.2f}]")

    for k in ("pagerank_s3_solo_median_sec",):
        if k in old and k in cur:
            r = cur[k] / old[k]
            verdict = "OK" if lo <= r <= hi else "FLAG"
            print(f"{verdict}  headline {k}: {old[k]} -> {cur[k]} ({r:.2f}x)")

    oq, cq = old.get("queries", {}), cur.get("queries", {})
    flagged = []
    for k in sorted(set(oq) & set(cq)):
        a, b = oq[k], cq[k]
        if a < 1.0 and b < 1.0:
            continue  # sub-second entries live inside scheduler noise
        r = b / a if a else float("inf")
        if not (lo <= r <= hi):
            flagged.append((r, k, a, b))
    arb = cur.get("arbitration", {}).get("verdicts", {})
    for r, k, a, b in sorted(flagged, reverse=True):
        if k in arb:
            row = arb[k]
            warm = f" warm={row['warm']}" if "warm" in row else ""
            print(
                f"FLAG  {k}: {a} -> {b} ({r:.2f}x) —"
                f" arbitrated: {row['verdict']}{warm}"
            )
        else:
            print(f"FLAG  {k}: {a} -> {b} ({r:.2f}x) — solo-arbiter it")
    print(
        f"{len(flagged)} flagged / {len(set(oq) & set(cq))} comparable"
        f" (new: {len(set(cq) - set(oq))}, gone: {len(set(oq) - set(cq))})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
