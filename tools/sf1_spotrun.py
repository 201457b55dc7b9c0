"""sf1 (10x) spot-run of the extension headliners — VERDICT r07 item 3.

Correctness is proven at sf0.01 and bench runs at sf0.1; this tool checks
that SHUFFLE VOLUME scales linearly from sf0.1 to a 10x documents table
(built by tools/make_sf1.py: word-permuted replicas so gate rates and
per-doc work stay identical while shingle sets stay disjoint — growth is
attributable to the plan, not planted-dup explosions).

Shuffle records/bytes are deterministic properties of the executed plan,
so the check is immune to timing noise; a superlinear ratio (>> factor)
names a plan whose candidate generation or join is quadratic in corpus
size. Appends an '## sf1 spot-run' section to RUNTIME.md.

Usage: python tools/sf1_spotrun.py [sf1_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pagerank_giraph_vs_mapreduce_spark.plans.registry import (  # noqa: E402
    load_all_queries,
)
from pagerank_giraph_vs_mapreduce_spark.session import get_spark  # noqa: E402
from tools.runtime_metrics import measure  # noqa: E402

HEADLINERS = [
    "pipeline_corpus_build",
    "pipeline_curation",
    "dedup_simhash64_near_dups",
    "dedup_cdc_chunks",
    "text_tfidf_top_term",
    # round-10 documents-table additions
    "pipeline_span_corrupt",
    "pipeline_url_dedup",
    "text_pmi_bigrams",
]

BASE = "/root/testdata/sf0.1"


def main() -> int:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"
    names = sys.argv[2:] or HEADLINERS
    load_all_queries()
    spark = get_spark(cpus=8, shuffle_partitions=32)

    lines = [
        "",
        "## sf1 spot-run (10x documents, tools/make_sf1.py replicas)",
        "",
        "Volume linearity check — `x10 ratio` is (sf1 metric / sf0.1 metric);",
        "linear plans land near 10, sublinear (fixed-size sketch/index sides)",
        "below, anything well above 10 is a scale bug. Shuffle volume is a",
        "deterministic plan property, so this is timing-noise-free.",
        "",
        "| query | shuffle records 0.1 / 1 (ratio) | shuffle MB 0.1 / 1 (ratio) |"
        " scan rows 0.1 / 1 | sec 0.1 / 1 |",
        "|---|---|---|---|---|",
    ]
    import time

    for name in names:
        t0 = time.monotonic()
        base = measure(spark, name, BASE)
        t_base = time.monotonic() - t0
        spark.catalog.clearCache()
        t0 = time.monotonic()
        big = measure(spark, name, sf1_dir)
        t_big = time.monotonic() - t0
        spark.catalog.clearCache()

        def ratio(a: float, b: float) -> str:
            return f"{b / a:.1f}x" if a else "n/a"

        lines.append(
            f"| {name} "
            f"| {base['shuffle_records']} / {big['shuffle_records']} "
            f"({ratio(base['shuffle_records'], big['shuffle_records'])}) "
            f"| {base['shuffle_mb']} / {big['shuffle_mb']} "
            f"({ratio(base['shuffle_mb'], big['shuffle_mb'])}) "
            f"| {base['scan_rows']} / {big['scan_rows']} "
            f"| {t_base:.1f} / {t_big:.1f} |"
        )
        print("measured", name, "base", base, "sf1", big)

    # splice out ONLY the prior section of the same name (up to the next
    # "\n## " heading) — truncating at the marker would delete every
    # section other tools appended after it (the ADVICE r09 #2 defect,
    # fixed in sf1_graph_spotrun and now here)
    with open("/root/repo/RUNTIME.md") as fh:
        doc = fh.read()
    marker = "\n## sf1 spot-run"
    if marker in doc:
        start = doc.index(marker)
        nxt = doc.find("\n## ", start + len(marker))
        tail = doc[nxt:] if nxt != -1 else ""
        doc = doc[:start] + tail
    with open("/root/repo/RUNTIME.md", "w") as fh:
        fh.write(doc.rstrip("\n") + "\n" + "\n".join(lines) + "\n")
    print("appended sf1 section to RUNTIME.md")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
