"""Round-7 third-wave operator tests: CDC chunking (reconstruction +
shift-resilience), Adamic-Adar link prediction vs a pure-Python oracle,
matryoshka rerank degeneracy, char-entropy known values, partition-prune
isolation (corrupted sibling partition never read), gzip JSONL roundtrip."""

from __future__ import annotations

import glob
import math
import os

from pyspark.sql import functions as F

from tests.conftest import make_edges


# ---------------------------------------------------------------- CDC


def _chunks_of(spark, texts: list[str]) -> dict[int, list[str]]:
    from pagerank_giraph_vs_mapreduce_spark.operators.dedup import cdc_chunk_table

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id bigint, text string")
    rows = cdc_chunk_table(df, "doc_id", "text").collect()
    out: dict[int, list[str]] = {}
    for r in sorted(rows, key=lambda r: (r["id"], r["chunk_idx"])):
        out.setdefault(r["id"], []).append(r["chunk"])
    return out

def test_cdc_chunks_reconstruct_exactly(spark, sf_dir):
    """Chunks concatenated in order must reproduce every document byte
    for byte (no gaps, no overlaps, no boundary off-by-one)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    texts = [r["text"] for r in docs.select("text").collect()]
    chunks = _chunks_of(spark, texts)
    assert len(chunks) == len(texts)
    for i, t in enumerate(texts):
        assert "".join(chunks[i]) == t


def test_cdc_chunks_survive_prefix_shift(spark):
    """The CDC property: prepending text changes only the chunk(s)
    touching the edit — every chunk of the original from the SECOND
    chunk on reappears verbatim in the shifted document (fixed-size
    blocking would shift and rehash every block)."""
    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while a slow green turtle watches from the river bank nearby "
        "until the sun finally sets behind the old stone bridge tonight"
    ) * 3
    shifted = "BREAKING NEWS HEADER INSERTED HERE: " + base
    ch = _chunks_of(spark, [base, shifted])
    assert len(ch[0]) >= 3, "fixture must produce several chunks"
    tail = ch[0][1:]
    assert ch[1][-len(tail):] == tail


def test_cdc_repeated_chunks_finds_planted_boilerplate(spark):
    """A licence block pasted into many otherwise-distinct docs must
    surface as a cross-doc repeated chunk set covering the block."""
    from pagerank_giraph_vs_mapreduce_spark.operators.dedup import (
        cdc_repeated_chunks,
    )

    licence = (
        "licensed under the apache license version two point zero you may "
        "not use this file except in compliance with the license obtain a "
        "copy at the usual location and carry on with your day "
    )
    docs = [(i, f"unique preamble number {i * 7919} " + licence) for i in range(8)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    rep = cdc_repeated_chunks(df, "doc_id", "text").collect()
    # at least one repeated chunk present in ALL docs
    assert any(r["n_docs"] == 8 for r in rep)


# ---------------------------------------------------- Adamic-Adar


def _py_adamic_adar(pairs, hub_cap):
    from collections import defaultdict

    und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    nbrs = defaultdict(set)
    for u, v in und:
        nbrs[u].add(v)
        nbrs[v].add(u)
    from decimal import Decimal

    scores = {}
    for z, nz in nbrs.items():
        if len(nz) > hub_cap or len(nz) < 2:
            continue
        snz = sorted(nz)
        for i, a in enumerate(snz):
            for b in snz[i + 1:]:
                if (a, b) in und:
                    continue
                cn, s = scores.get((a, b), (0, Decimal(0)))
                w = Decimal(str(round(1.0 / math.log(len(nz)), 9)))
                scores[(a, b)] = (cn + 1, s + w)
    return {
        k: (cn, round(float(s), 6)) for k, (cn, s) in scores.items()
    }


def test_adamic_adar_matches_python_oracle(spark):
    """Deterministic pseudo-random graph, full comparison of every
    candidate pair's (common_neighbors, score) vs the pure-Python
    reference — including the hub cap dropping a high-degree transit."""
    from pagerank_giraph_vs_mapreduce_spark.graph.motifs import adamic_adar_topk

    pairs = [((i * 31 + 7) % 23, (i * 17 + 3) % 23) for i in range(80)]
    # vertex 100 is a hub over everything: must be excluded by cap=10
    pairs += [(100, v) for v in range(15)]
    edges = make_edges(spark, pairs)
    got = {
        (r["a"], r["b"]): (r["common_neighbors"], r["aa_score"])
        for r in adamic_adar_topk(edges, hub_cap=10, k=10_000).collect()
    }
    assert got == _py_adamic_adar(pairs, hub_cap=10)


def test_adamic_adar_excludes_existing_edges(spark):
    """Triangle plus a pendant: the only predicted link is the open
    wedge, never an existing edge."""
    from pagerank_giraph_vs_mapreduce_spark.graph.motifs import adamic_adar_topk

    edges = make_edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    rows = adamic_adar_topk(edges, hub_cap=100, k=100).collect()
    got = {(r["a"], r["b"]) for r in rows}
    # open wedges through 3: (1,4) and (2,4); (1,2) is an edge -> absent
    assert got == {(1, 4), (2, 4)}


# ---------------------------------------------------- matryoshka


def test_matryoshka_full_shortlist_equals_bruteforce(spark, sf_dir):
    """With the shortlist as wide as the corpus, the two-stage rerank
    must return exactly the brute-force top-k."""
    from pagerank_giraph_vs_mapreduce_spark.operators.similarity import (
        cosine_topk,
        matryoshka_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    q = emb.filter(F.col("vec_id") == 0)
    brute = [tuple(r) for r in cosine_topk(emb, q, k=5).collect()]
    mat = [
        tuple(r)
        for r in matryoshka_topk(emb, q, prefix_dims=16, shortlist=n, k=5).collect()
    ]
    assert mat == brute


def test_matryoshka_prefix_recall_on_structured_embeddings(spark):
    """Recall sanity on embeddings WITH matryoshka structure (planted
    neighbors = query + small noise, so the prefix ranks like the full
    vector — the MRL training contract): a 6x over-retrieval shortlist
    must recover the full-width top-5 exactly. On unstructured random
    vectors the prefix carries no signal — that's a property of the
    data, not the operator, and is why the docstring scopes the claim
    to MRL-trained embeddings."""
    import random

    from pagerank_giraph_vs_mapreduce_spark.operators.similarity import (
        cosine_topk,
        matryoshka_topk,
    )

    rng = random.Random(7)
    base = [rng.gauss(0, 1) for _ in range(64)]
    rows = [(0, [float(x) for x in base])]
    for i in range(1, 10):  # planted near-neighbors of the query
        rows.append((i, [float(x + rng.gauss(0, 0.05 * i)) for x in base]))
    for i in range(10, 200):  # background noise vectors
        rows.append((i, [float(rng.gauss(0, 1)) for _ in range(64)]))
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    q = emb.filter(F.col("vec_id") == 0)
    brute = [r["vec_id"] for r in cosine_topk(emb, q, k=5).collect()]
    mat = [
        r["vec_id"]
        for r in matryoshka_topk(emb, q, prefix_dims=16, shortlist=30, k=5).collect()
    ]
    assert mat == brute


# ---------------------------------------------------- char entropy


def test_char_entropy_known_values(spark):
    from pagerank_giraph_vs_mapreduce_spark.operators.text import char_entropy

    df = spark.createDataFrame(
        [(1, "aaaaaaaa"), (2, "abababab"), (3, "abcdabcd"), (4, "x")],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: (r["n_distinct_chars"], r["entropy_bits"])
        for r in char_entropy(df, "doc_id", "text").collect()
    }
    assert got == {1: (1, 0.0), 2: (2, 1.0), 3: (4, 2.0), 4: (1, 0.0)}


def test_char_entropy_zero_shuffle_plan(spark, sf_dir):
    from pagerank_giraph_vs_mapreduce_spark.operators.text import char_entropy

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        char_entropy(docs, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


# ------------------------------------------- partition pruning


def test_partition_prune_never_opens_sibling_partition(spark, tmp_path):
    """Corrupt the parquet files of every partition EXCEPT the target:
    a properly pruned scan still answers (the pruned directories are
    never opened); an unpruned scan would throw on the garbage."""
    docs = spark.createDataFrame(
        [(i, f"t{i}", "en" if i % 2 == 0 else "de") for i in range(20)],
        "doc_id bigint, text string, lang string",
    )
    out = str(tmp_path / "part")
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)
    for f in glob.glob(f"{out}/lang=de/*.parquet"):
        with open(f, "wb") as fh:
            fh.write(b"GARBAGE NOT PARQUET")
    # explicit schema: inference itself opens footers across partitions,
    # which is its own full-directory touch — a production catalog ships
    # the schema, and only then is the scan truly partition-local
    back = (
        spark.read.schema("doc_id bigint, text string, lang string")
        .parquet(out)
        .filter(F.col("lang") == "en")
    )
    assert back.count() == 10
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters", 1)[1][:120]


# ------------------------------------------------- gzip JSONL


def test_jsonl_gz_files_and_roundtrip(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f'line "quoted" {i}é', i) for i in range(100)],
        "doc_id bigint, text string, n bigint",
    )
    out = str(tmp_path / "gz")
    docs.coalesce(2).write.option("compression", "gzip").json(out)
    parts = glob.glob(f"{out}/part-*")
    assert parts and all(p.endswith(".json.gz") for p in parts)
    back = spark.read.schema("doc_id bigint, text string, n bigint").json(out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, docs.collect()))


# ------------------------------------------------- aHash image dedup


def test_ahash_planted_image_dups(spark):
    """Identical texts → identical 16x4 PNGs → hamming-0 pairs; the
    multi-probe blocker must find exactly the all-pairs answer."""
    from pagerank_giraph_vs_mapreduce_spark.operators.dedup import (
        simhash_pairs_from_sigs,
    )
    from pagerank_giraph_vs_mapreduce_spark.operators.multimodal import (
        ahash16,
        png_payload,
    )

    t1 = "the quick brown fox jumps over the lazy dog and more text here"
    t2 = "совершенно another text with different characters in every row"
    docs = spark.createDataFrame(
        [(1, t1), (2, t1), (3, t1), (4, t2)], "doc_id bigint, text string"
    )
    sigs = ahash16(png_payload(docs)).select(
        F.col("doc_id").alias("id"), F.col("ahash").alias("simhash")
    )
    by_id = {r["id"]: r["simhash"] for r in sigs.collect()}
    assert by_id[1] == by_id[2] == by_id[3]
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs_from_sigs(sigs, max_hamming=2, bits=16).collect()
    }
    # brute force over the four signatures
    import itertools

    expect = {}
    for a, b in itertools.combinations(sorted(by_id), 2):
        h = bin(by_id[a] ^ by_id[b]).count("1")
        if h <= 2:
            expect[(a, b)] = h
    assert pairs == expect
    assert (1, 2) in pairs and pairs[(1, 2)] == 0


# ------------------------------------------------- binary rerank


def test_binary_rerank_full_shortlist_equals_bruteforce(spark, sf_dir):
    from pagerank_giraph_vs_mapreduce_spark.operators.similarity import (
        binary_rerank_topk,
        cosine_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    q = emb.filter(F.col("vec_id") == 0)
    brute = [tuple(r) for r in cosine_topk(emb, q, k=5).collect()]
    got = [tuple(r) for r in binary_rerank_topk(emb, q, shortlist=n, k=5).collect()]
    assert got == brute


def test_binary_quantize_bits_match_python(spark):
    from pagerank_giraph_vs_mapreduce_spark.operators.similarity import (
        binary_quantize,
    )

    vec = [(1.0 if (i * 7) % 3 == 0 else -1.0) for i in range(64)]
    emb = spark.createDataFrame(
        [(0, [float(x) for x in vec])], "vec_id bigint, embedding array<float>"
    )
    r = binary_quantize(emb).collect()[0]
    b0 = sum(1 << d for d in range(32) if vec[d] > 0)
    b1 = sum(1 << d for d in range(32) if vec[32 + d] > 0)
    assert (r["b0"], r["b1"]) == (b0, b1)


# ------------------------------------------------- shuffle shards


def test_shuffle_shards_is_permutation(spark):
    from pagerank_giraph_vs_mapreduce_spark.plans.pipeline_queries import (
        N_SHARDS,
        pipeline_shuffle_shards,
    )

    out = pipeline_shuffle_shards(spark, "/root/testdata/sf0.001").collect()
    n_docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).count()
    assert len(out) == n_docs
    assert len({r["doc_id"] for r in out}) == n_docs
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r["shard_id"], []).append(r["pos"])
    assert set(by_shard) <= set(range(N_SHARDS))
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))


# ------------------------------------------------- corpus build


def test_corpus_build_packing_invariants(spark):
    """The capstone plan's packing must cover exactly the curation
    survivors, with in-bin offsets under the budget and every doc's
    start-bin consistent with its shard's running sum."""
    from pagerank_giraph_vs_mapreduce_spark.plans.pipeline_queries import (
        PACK_BUDGET,
        pipeline_corpus_build,
        pipeline_curation,
    )

    sf = "/root/testdata/sf0.001"
    built = pipeline_corpus_build(spark, sf).collect()
    survivors = {r["doc_id"] for r in pipeline_curation(spark, sf).collect()}
    assert {r["doc_id"] for r in built} == survivors
    assert all(0 <= r["offset_in_bin"] < PACK_BUDGET for r in built)
    assert all(r["bin"] >= 0 for r in built)


# ------------------------------------------------- walk co-occurrence


def test_walk_cooccurrence_on_chain(spark):
    """A single chain graph makes walks deterministic regardless of the
    hash seed (one successor each) — the skip-gram pairs of a 3-step
    walk from vertex 0 with window 2 are exactly enumerable."""
    from pagerank_giraph_vs_mapreduce_spark.graph.paths import random_walks

    edges = make_edges(spark, [(0, 1), (1, 2), (2, 3)])
    sources = spark.createDataFrame([(0,)], "id bigint")
    walks = random_walks(edges, sources, steps=3)
    rows = {(r["step"], r["vertex"]) for r in walks.collect()}
    assert rows == {(0, 0), (1, 1), (2, 2), (3, 3)}
    a = walks.select("walk", F.col("step").alias("s_a"), F.col("vertex").alias("x_a"))
    b = walks.select("walk", F.col("step").alias("s_b"), F.col("vertex").alias("x_b"))
    pairs = (
        a.join(b, "walk")
        .filter((F.col("s_a") < F.col("s_b")) & (F.col("s_b") - F.col("s_a") <= 2))
        .select(F.least("x_a", "x_b").alias("v_a"), F.greatest("x_a", "x_b").alias("v_b"))
    )
    got = sorted((r["v_a"], r["v_b"]) for r in pairs.collect())
    assert got == [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]


def test_cdc_strip_identity_without_blocklist(spark, sf_dir):
    """With an unreachable min_docs threshold the strip is the identity:
    every doc reassembles to its own md5 with zero dropped chunks."""
    import hashlib

    from pagerank_giraph_vs_mapreduce_spark.operators.dedup import (
        cdc_strip_boilerplate,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    out = cdc_strip_boilerplate(docs, "doc_id", "text", min_docs=10**9).collect()
    assert len(out) == len(texts)
    for r in out:
        t = texts[r["id"]]
        assert r["n_dropped"] == 0
        assert r["clean_len"] == len(t)
        assert r["clean_md5"] == hashlib.md5(t.encode()).hexdigest()


def test_cdc_strip_removes_planted_boilerplate(spark):
    from pagerank_giraph_vs_mapreduce_spark.operators.dedup import (
        cdc_strip_boilerplate,
    )

    licence = (
        "licensed under the apache license version two point zero you may "
        "not use this file except in compliance with the license obtain a "
        "copy at the usual location and carry on with your day "
    )
    rows = [(i, f"unique preamble number {i * 7919} " + licence) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["id"]: r for r in cdc_strip_boilerplate(
        df, "doc_id", "text", min_docs=8).collect()}
    assert all(out[i]["n_dropped"] >= 1 for i in range(8))
    assert all(out[i]["clean_len"] < len(rows[i][1]) for i in range(8))
