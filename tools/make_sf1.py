"""Synthesize an sf1-scale documents table from the driver's sf0.1 one.

The driver only materializes sf{0.001,0.01,0.1}; VERDICT r07 item 3 asks
for a 10x spot-run of the extension headliners to verify shuffle volume
scales linearly. Naive row duplication would be a rigged benchmark: every
replica is an exact (or near-) duplicate of its original, so the dedup
candidate generators would see 10-copy groups and pair counts would grow
quadratically BY CONSTRUCTION, not by plan shape. Instead each replica
word-shuffles its document with a per-(replica, doc) seeded permutation:

- length, vocabulary, char distribution, stopword/punct ratios are all
  preserved, so the lang/quality gates pass at the same rate and the
  per-doc work (tokenize, shingle, hash) is identical to the original;
- WORD-level shingle sets are effectively disjoint across replicas, but
  the curation near-dup stage shingles CHARACTER 5-grams, and word
  permutation preserves every word-internal char 5-gram — so replicas
  form genuine ~factor-member near-dup clusters (J ~ 0.5). Measured and
  kept deliberately (RUNTIME.md "sf1 spot-run"): the corpus doubles as
  the cluster-stress fixture for the star candidate generator; for the
  shingle-count-linear entries (cdc, tfidf) it is still a clean 10x.

Replica 0 is the original table verbatim; replicas 1..9 offset doc_id by
a stride of (max_id + 1) per replica.

Usage: python tools/make_sf1.py [factor] [src_dir] [out_dir]
Defaults: 10  /root/testdata/sf0.1  /root/repo/.scratch/sf1
"""

from __future__ import annotations

import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/.scratch/sf1"

    import os

    os.makedirs(out, exist_ok=True)
    t = pq.read_table(f"{src}/documents.parquet")
    df = t.to_pandas()
    stride = int(df["doc_id"].max()) + 1

    frames = [df]
    for i in range(1, factor):
        rep = df.copy()
        rep["doc_id"] = rep["doc_id"] + stride * i

        def shuffle_text(row_id: int, text: str, _i: int = i) -> str:
            words = text.split(" ")
            random.Random(_i * 1_000_003 + row_id).shuffle(words)
            return " ".join(words)

        rep["text"] = [
            shuffle_text(d, x) for d, x in zip(rep["doc_id"], rep["text"])
        ]
        frames.append(rep)

    import pandas as pd

    big = pd.concat(frames, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(big, preserve_index=False),
        f"{out}/documents.parquet",
    )
    print(f"{len(big)} docs -> {out}/documents.parquet")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
