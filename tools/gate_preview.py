"""Print the correctness-gate composition for this round: which 50
queries the driver will check first (registration order), and each
one's certification history across CORRECTNESS_r*.json.

Usage: python tools/gate_preview.py [budget]
"""

from __future__ import annotations

import glob
import json
import sys

sys.path.insert(0, "/root/repo")

from pagerank_giraph_vs_mapreduce_spark.plans.registry import (  # noqa: E402
    QUERIES,
    load_all_queries,
)


def main() -> int:
    budget = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    load_all_queries()
    history: dict[str, list[str]] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = path.split("_r")[1].split(".")[0]
        for name, row in json.load(open(path)).items():
            ok = row.get("hash_match") or (
                row.get("rows_match") and row.get("err") is None
            )
            history.setdefault(name, []).append(f"r{rnd}{'+' if ok else '-'}")
    names = list(QUERIES)
    print(f"{len(names)} registered; gate budget {budget}\n")
    for i, name in enumerate(names, 1):
        marker = "GATE" if i <= budget else "    "
        hist = ",".join(history.get(name, [])) or "never"
        print(f"{marker} {i:3d} {name:40s} {hist}")
    never_out = [
        n for n in names[budget:] if n not in history
    ]
    if never_out:
        print(f"\nWARNING: never-certified queries outside the gate: {never_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
