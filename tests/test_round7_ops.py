"""Round-7 operator tests: BPE-at-depth semantics, JPEG decode, and the
streaming exactly-once kill/replay path."""

from __future__ import annotations

import re
from collections import Counter


def _py_bpe(texts: list[str], merges: int) -> list[tuple[int, str, int]]:
    """Independent pure-Python BPE reference: word-frequency-weighted pair
    counts, top-1 per round (count desc, joined-pair-string asc — the same
    tie-break Spark's orderBy(desc(n_occ), asc(pair)) applies), greedy
    leftmost non-overlapping merge."""
    words: Counter[str] = Counter()
    for t in texts:
        for w in re.split(r"[^a-z]+", t.lower()):
            if w:
                words[w] += 1
    syms = {w: list(w) for w in words}
    out = []
    for r in range(1, merges + 1):
        pc: Counter[tuple[str, str]] = Counter()
        for w, s in syms.items():
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += words[w]
        if not pc:
            break
        (a, b), n = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1])
        )
        out.append((r, a + " " + b, n))
        for w, s in syms.items():
            ns: list[str] = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            syms[w] = ns
    return out


def test_bpe_learn_scaled_matches_python_oracle_at_depth(spark):
    """64 merge rounds on a small corpus must match the independent
    Python implementation row for row — includes repeated-symbol words
    ('aaaa'), ties, and vocabulary exhaustion ordering."""
    from pagerank_giraph_vs_mapreduce_spark.operators.text import (
        bpe_learn_scaled,
    )

    texts = [
        "the cat sat on the mat the cat",
        "a banana and a bandana in havana",
        "aaaa aaa aa baab abab",
        "low lower lowest newer newest wider wide",
        "the theme there these throne",
    ] * 3
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r["merge_round"], r["pair"], r["n_occ"])
        for r in bpe_learn_scaled(
            df, "text", merges=64, sample_hexmax=None
        ).collect()
    ]
    want = _py_bpe(texts, 64)
    assert got == want


def test_bpe_learn_scaled_sample_gate_bounds_training_corpus(spark):
    """The md5 gate must train on the deterministic subset only: gating
    with hexmax '0' admits no document -> empty merge table; hexmax 'g'
    admits all -> identical to ungated."""
    from pagerank_giraph_vs_mapreduce_spark.operators.text import (
        bpe_learn_scaled,
    )

    texts = ["alpha beta gamma delta"] * 4 + ["zig zag zug"] * 4
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    assert bpe_learn_scaled(df, "text", merges=3, sample_hexmax="0").count() == 0
    full = bpe_learn_scaled(df, "text", merges=3, sample_hexmax=None).collect()
    allin = bpe_learn_scaled(df, "text", merges=3, sample_hexmax="g").collect()
    assert full == allin
