"""Round-10 second-wave operators: 4-cycle counting, neighbor-Jaccard
link prediction, and the other additions of this session — unit-level
pins on hand graphs/data where the declared semantics are checkable by
brute force."""

from __future__ import annotations

from itertools import combinations

from tests.conftest import make_edges

from pyspark.sql import functions as F

from pagerank_giraph_vs_mapreduce_spark.graph.motifs import (
    jaccard_topk,
    square_count,
)


def _brute_squares(pairs):
    """Count 4-cycles by enumerating unordered diagonal pairs: each
    square is two diagonal pairs, each contributing C(common, 2)."""
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    total = 0
    for a, b in combinations(sorted(adj), 2):
        c = len(adj[a] & adj[b])
        total += c * (c - 1) // 2
    assert total % 2 == 0
    return total // 2


def test_square_count_known_graphs(spark):
    """C4 has 1 square, K4 has 3, K23 has 3, a star has 0, two disjoint
    C4s have 2 — and each matches the brute-force diagonal count."""
    fixtures = {
        "c4": [(0, 1), (1, 2), (2, 3), (3, 0)],
        "k4": [(a, b) for a, b in combinations(range(4), 2)],
        "k23": [(a, b) for a in (0, 1) for b in (10, 11, 12)],
        "star": [(0, i) for i in range(1, 8)],
        "two_c4": [(0, 1), (1, 2), (2, 3), (3, 0),
                   (10, 11), (11, 12), (12, 13), (13, 10)],
    }
    expected = {"c4": 1, "k4": 3, "k23": 3, "star": 0, "two_c4": 2}
    for name, pairs in fixtures.items():
        assert _brute_squares(pairs) == expected[name], name
        row = square_count(make_edges(spark, pairs), hub_cap=64).collect()[0]
        assert row["n_squares"] == expected[name], name
        if expected[name] == 0:
            assert row["n_diag_pairs"] == 0, name


def test_square_count_hub_cap_induces_subgraph(spark):
    """A square whose corner exceeds the cap must vanish: C4 on
    {0,1,2,3} plus a fan making vertex 0 a hub. cap=64 keeps it (1
    square), cap=3 drops every square touching the hub."""
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0)] + [(0, i) for i in range(20, 30)]
    assert square_count(make_edges(spark, pairs), hub_cap=64).collect()[0][
        "n_squares"
    ] == 1
    assert square_count(make_edges(spark, pairs), hub_cap=3).collect()[0][
        "n_squares"
    ] == 0


def test_square_count_empty_pair_set_is_zero_row(spark):
    """No wedge pairs at all (a single edge) still yields the one
    summary row with zeros, not an empty frame."""
    rows = square_count(make_edges(spark, [(1, 2)]), hub_cap=64).collect()
    assert len(rows) == 1
    assert rows[0]["n_squares"] == 0 and rows[0]["n_diag_pairs"] == 0


def test_jaccard_topk_matches_bruteforce(spark):
    """On a small graph under the cap, every returned score equals
    |N(a)&N(b)| / |N(a)|N(b)| for the non-adjacent pair, descending."""
    pairs = [
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 4), (2, 5),
        (3, 4), (4, 5), (5, 6), (6, 0), (6, 3),
    ]
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    got = jaccard_topk(make_edges(spark, pairs), hub_cap=64, k=100).collect()
    assert got, "expected non-adjacent pairs with common neighbors"
    scores = [r["jaccard"] for r in got]
    assert scores == sorted(scores, reverse=True)
    for r in got:
        a, b = r["a"], r["b"]
        assert b not in adj[a], (a, b)
        inter = len(adj[a] & adj[b])
        union = len(adj[a] | adj[b])
        assert r["common_neighbors"] == inter
        assert r["deg_a"] == len(adj[a]) and r["deg_b"] == len(adj[b])
        assert abs(r["jaccard"] - inter / union) < 1e-9, (a, b)


def test_jaccard_hub_cap_is_conservative(spark):
    """With a shared super-hub as the only common neighbor and the cap
    below its degree, the pair must not appear at all (intersection
    counted over capped transit only)."""
    pairs = [(0, i) for i in range(1, 30)]  # hub 0, deg 29
    got = jaccard_topk(make_edges(spark, pairs), hub_cap=8, k=100).collect()
    assert got == []


def test_profile_columns_counts_nulls_and_distincts(spark, tmp_path):
    """rel_profile_columns on a hand-built lineitem with NULLs in every
    profiled column type: null counts, exact distinct counts, and typed
    min/max must match DuckDB running the registered oracle on the SAME
    file — including the all-NULL column edge (distinct 0, min/max NULL)."""
    import datetime

    import duckdb

    from pagerank_giraph_vs_mapreduce_spark.plans.registry import (
        ORACLES,
        QUERIES,
        load_all_queries,
    )

    load_all_queries()
    ts = datetime.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        (1, 1, 1, 1, 5.0, 100.0, 0.1, 0.02, "A", "F", ts),
        (2, 2, 2, 1, None, 200.0, 0.1, 0.02, None, "O", None),
        (3, 3, 3, 1, 5.0, None, 0.1, 0.02, "R", None, ts),
        (None, 4, 4, 1, 7.5, 100.0, 0.1, 0.02, "A", "O", None),
    ]
    schema = (
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp_ntz"
    )
    d = tmp_path / "prof"
    spark.createDataFrame(rows, schema).write.parquet(
        str(d / "lineitem.parquet")
    )
    got = {
        r["col_name"]: r
        for r in QUERIES["rel_profile_columns"](spark, str(d)).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"'{d}/lineitem.parquet/*.parquet'"
    )
    want_rows = con.execute(ORACLES["rel_profile_columns"]).fetchall()
    cols = [dsc[0] for dsc in con.description]
    want = {r[cols.index("col_name")]: dict(zip(cols, r)) for r in want_rows}
    assert set(got) == set(want) == {
        "l_orderkey", "l_quantity", "l_extendedprice", "l_shipdate_us",
        "l_returnflag", "l_linestatus",
    }
    for c in got:
        for f in ("n_rows", "n_null", "n_distinct", "min_num", "max_num",
                  "min_str", "max_str"):
            assert got[c][f] == want[c][f], (c, f, got[c][f], want[c][f])
    # hand-checked spots
    assert got["l_orderkey"]["n_null"] == 1
    assert got["l_quantity"]["n_distinct"] == 2
    assert got["l_returnflag"]["min_str"] == "A"
    assert got["l_returnflag"]["max_str"] == "R"
    assert got["l_shipdate_us"]["n_null"] == 2


def test_url_canonicalize_cases(spark):
    """Each canonicalization rule on a hand case, plus the no-op and the
    combined worst case."""
    from pagerank_giraph_vs_mapreduce_spark.operators.curation import (
        url_canonicalize,
    )

    cases = {
        # fragment
        "https://a.com/p#frag": "https://a.com/p",
        # scheme+host case, path case preserved
        "HTTPS://WWW.A.com/Path/Q": "https://www.a.com/Path/Q",
        # default ports
        "http://a.com:80/x": "http://a.com/x",
        "https://a.com:443/x": "https://a.com/x",
        # NON-default port survives
        "https://a.com:8443/x": "https://a.com:8443/x",
        # tracking params, separators repaired
        "https://a.com/x?utm_source=t": "https://a.com/x",
        "https://a.com/x?utm_source=t&id=3": "https://a.com/x?id=3",
        "https://a.com/x?id=3&utm_campaign=c&fbclid=z": "https://a.com/x?id=3",
        # trailing slash (also before the query)
        "https://a.com/x/": "https://a.com/x",
        "https://a.com/x/?id=3": "https://a.com/x?id=3",
        # everything at once
        "HTTP://B.Com:80/P/?utm_a=1&ref=2&utm_b=3#z": "http://b.com/P?ref=2",
        # params that merely END in a tracker name survive intact (the
        # separator-anchored regex, r10 ADVICE): no substring mangling
        "https://a.com/x?xfbclid=1": "https://a.com/x?xfbclid=1",
        "https://a.com/x?myutm_foo=v&id=3": "https://a.com/x?myutm_foo=v&id=3",
        "https://a.com/x?myutm_foo=v&fbclid=z": "https://a.com/x?myutm_foo=v",
        # already canonical
        "https://a.com/x?id=3": "https://a.com/x?id=3",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string").select(
        "url", url_canonicalize(F.col("url")).alias("canon")
    )
    got = {r["url"]: r["canon"] for r in df.collect()}
    for u, want in cases.items():
        assert got[u] == want, (u, got[u], want)


def test_wav_decimate_identity_and_factor4(spark):
    """factor=1 is a byte-exact identity on the samples (n, peak, rms all
    unchanged); factor=4 keeps exactly indices 0,4,8,... of the original
    clip — checked against the sample function directly."""
    import math

    from pagerank_giraph_vs_mapreduce_spark.operators.multimodal import (
        _synth_samples,
        audio_stats,
        synth_wav,
        wav_decimate,
    )

    docs = spark.createDataFrame([(7,), (12,)], "doc_id bigint")
    wavs = synth_wav(docs)
    base = {r["doc_id"]: r for r in audio_stats(wavs).collect()}
    ident = {
        r["doc_id"]: r
        for r in audio_stats(wav_decimate(wavs, factor=1)).collect()
    }
    for d in (7, 12):
        assert ident[d]["n_samples"] == base[d]["n_samples"]
        assert ident[d]["peak"] == base[d]["peak"]
        assert ident[d]["rms"] == base[d]["rms"]
        assert ident[d]["sample_rate"] == 8000

    dec = {
        r["doc_id"]: r
        for r in audio_stats(wav_decimate(wavs, factor=4)).collect()
    }
    for d in (7, 12):
        kept = _synth_samples(d)[::4]
        assert dec[d]["n_samples"] == len(kept)
        assert dec[d]["sample_rate"] == 2000
        assert dec[d]["peak"] == max(abs(s) for s in kept)
        want_rms = round(math.sqrt(sum(s * s for s in kept) / len(kept)), 6)
        assert dec[d]["rms"] == want_rms


def test_ewma8_hand_sequence(spark, tmp_path):
    """EWMA on a hand series: head rows renormalize over present taps
    (first row = its own value), a full window applies 128..1 weights,
    and a second user is isolated."""
    import datetime

    from pagerank_giraph_vs_mapreduce_spark.plans.registry import (
        QUERIES,
        load_all_queries,
    )

    load_all_queries()
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    vals_u1 = [10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0, 80.0, 90.0]
    for i, v in enumerate(vals_u1):
        rows.append((i, t0 + datetime.timedelta(hours=i), 1, "click", v, "{}"))
    rows.append((100, t0, 2, "click", 7.0, "{}"))
    d = tmp_path / "ev"
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double, props string",
    ).write.parquet(str(d / "events.parquet"))
    got = {
        r["event_id"]: r for r in QUERIES["rel_win_ewma8"](spark, str(d)).collect()
    }
    ws = [128, 64, 32, 16, 8, 4, 2, 1]

    def want(i):
        taps = [vals_u1[i - k] for k in range(min(i + 1, 8))]
        num = sum(t * w for t, w in zip(taps, ws))
        den = sum(ws[: len(taps)])
        return den, round(num / den, 6)

    for i in range(9):
        den, e = want(i)
        assert got[i]["weight_sum"] == den, i
        assert abs(got[i]["ewma8"] - e) < 1e-9, (i, got[i]["ewma8"], e)
    assert got[0]["ewma8"] == 10.0  # first row is its own value
    assert got[100]["weight_sum"] == 128 and got[100]["ewma8"] == 7.0


def test_readability_punctuated_hand_text(spark, tmp_path):
    """The sentence-boundary path the unpunctuated fixture can't reach:
    '[.!?]+' runs count once each, the floor only kicks in when there is
    no punctuation, and the Flesch value matches a hand computation."""
    from pagerank_giraph_vs_mapreduce_spark.plans.registry import (
        QUERIES,
        load_all_queries,
    )

    load_all_queries()
    rows = [
        (1, "The cat sat. The dog ran!! Did it run?", "en", "s", 1),
        (2, "no punctuation here at all", "en", "s", 1),
        (3, "Ouch!", "en", "s", 1),
    ]
    d = tmp_path / "docs"
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(str(d / "documents.parquet"))
    got = {
        r["doc_id"]: r for r in QUERIES["text_readability"](spark, str(d)).collect()
    }
    # doc 1: 9 words; '.', '!!', '?' -> 3 sentence runs; syllable groups:
    # e,a,a,e,o,a,i,i,u -> 9
    assert got[1]["n_words"] == 9
    assert got[1]["n_sentences"] == 3
    assert got[1]["n_syllables"] == 9
    want = round(206.835 - 1.015 * (9 / 3) - 84.6 * (9 / 9), 6)
    assert abs(got[1]["flesch"] - want) < 1e-9
    # doc 2: floor to one sentence
    assert got[2]["n_sentences"] == 1 and got[2]["n_words"] == 5
    # doc 3: single word+single boundary
    assert got[3]["n_words"] == 1 and got[3]["n_sentences"] == 1
    assert got[3]["n_syllables"] == 1  # 'ou'... 'Ouch' -> one vowel group


def test_model_auc_hand_ranking(spark, tmp_path):
    """AUC sanity on a corpus engineered so en-docs (label 1) are longer:
    the rank-sum identity must land in (0.5, 1.0], and a perfectly
    separable fixture must give exactly 1.0 when scores order cleanly.
    Cross-checked against sklearn-free brute force over the model's own
    scores."""
    from pagerank_giraph_vs_mapreduce_spark.plans.registry import (
        QUERIES,
        load_all_queries,
    )

    load_all_queries()
    rows = []
    for i in range(12):
        lang = "en" if i % 2 == 0 else "fr"
        words = 30 + i if lang == "en" else 3 + i  # en much longer
        rows.append((i, "w " * words, lang, "s", 1))
    d = tmp_path / "docs"
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(str(d / "documents.parquet"))
    row = QUERIES["pipeline_model_auc"](spark, str(d)).collect()[0]
    assert row["n_pos"] == 6 and row["n_neg"] == 6
    # Mann-Whitney bounds and coherence with the rank sum
    auc_from_ranks = (row["rank_sum_pos"] - 6 * 7 / 2.0) / 36.0
    assert abs(row["auc"] - round(auc_from_ranks, 9)) < 1e-12
    assert 0.0 <= row["auc"] <= 1.0
    assert row["auc"] > 0.5, "longer-en fixture must rank positives higher"


def test_span_corrupt_hand_check(spark):
    """Replay the md5 mask in Python on hand docs and check the sentinel
    collapse, numbering, target assembly, and the no-mask passthrough."""
    import hashlib

    from pagerank_giraph_vs_mapreduce_spark.operators.text import span_corrupt

    # ids chosen so the md5 gate provably fires: doc 3 masks positions
    # {1, 4, 5, 7} (a 2-run in the middle), doc 9 masks {4, 5} (a single
    # collapsed run); doc 1's short text may or may not mask — both
    # branches of the final checks stay reachable.
    texts = {
        3: "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        9: "one two three four five six seven eight nine ten",
        1: "solo",
    }
    docs = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id bigint, text string"
    )
    got = {r["id"]: r for r in span_corrupt(docs).collect()}

    for d, text in texts.items():
        toks = text.split(" ")
        m = [
            hashlib.md5(f"{d}:{i}".encode()).hexdigest()[0] < "3"
            for i in range(len(toks))
        ]
        # expected via the same run-collapse semantics
        inp, tgt, spans, masked_n = [], [], 0, 0
        i = 0
        while i < len(toks):
            if not m[i]:
                inp.append(toks[i])
                i += 1
            else:
                j = i
                while j < len(toks) and m[j]:
                    j += 1
                inp.append(f"<extra_id_{spans}>")
                tgt.append(f"<extra_id_{spans}> " + " ".join(toks[i:j]))
                masked_n += j - i
                spans += 1
                i = j
        r = got[d]
        assert r["input_masked"] == " ".join(inp), (d, r["input_masked"])
        assert r["target"] == " ".join(tgt), (d, r["target"])
        assert r["n_spans"] == spans and r["n_masked_tokens"] == masked_n
    # make the test non-vacuous: at least one doc must actually mask
    assert any(got[d]["n_spans"] > 0 for d in texts)
    # and at least one must pass through untouched if its mask is empty
    for d, text in texts.items():
        if got[d]["n_spans"] == 0:
            assert got[d]["input_masked"] == text
            assert got[d]["target"] == ""


def test_asof_tolerance_plan_and_atomicity(spark, sf_oracle_dir):
    """The tolerance variant keeps the as-of scale contract (zero join
    nodes — it is the same union+window plan plus one projection), and
    rejection is ATOMIC: right_tier, right_vf_us, right_match_t are all
    NULL or all set, with every accepted lag within the bound."""
    from pagerank_giraph_vs_mapreduce_spark.plans.registry import (
        QUERIES,
        load_all_queries,
    )
    from pagerank_giraph_vs_mapreduce_spark.plans.temporal_queries import (
        ASOF_TOL_DAYS,
        DAY_US,
    )

    load_all_queries()
    df = QUERIES["rel_asof_join_tol"](spark, sf_oracle_dir)
    rows = df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    tol = ASOF_TOL_DAYS * DAY_US
    n_rej = n_acc = 0
    for r in rows:
        nulls = (r["right_tier"] is None, r["right_vf_us"] is None,
                 r["right_match_t"] is None)
        assert len(set(nulls)) == 1, r  # all-or-nothing
        if nulls[0]:
            n_rej += 1
        else:
            n_acc += 1
            assert 0 <= r["ts_us"] - r["right_match_t"] <= tol, r
    assert n_rej > 0 and n_acc > 0, (n_rej, n_acc)


def test_er_fuzzy_join_semantics(spark, sf_oracle_dir):
    """Every dirty name whose deletion left the block key intact must
    match its own source at lev == 1; the plan must be an equi-join on
    the block key (no cartesian, no BNLJ); every emitted pair is within
    the declared distance."""
    from pagerank_giraph_vs_mapreduce_spark.plans.registry import (
        QUERIES,
        load_all_queries,
    )
    from pagerank_giraph_vs_mapreduce_spark.plans.relational_queries import (
        ER_LEV_MAX,
    )

    load_all_queries()
    df = QUERIES["rel_er_fuzzy_join"](spark, sf_oracle_dir)
    rows = df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert rows, "fuzzy join must produce matches"
    assert all(0 <= r["lev"] <= ER_LEV_MAX for r in rows)
    # self-matches: deletion position 10 + key % 9 touches digits 2..10 of
    # the 9-digit suffix, never the last two chars -> block key survives
    # whenever the deleted digit is not among the last two; count those
    self_pairs = {(r["c_custkey"], r["dirty_id"]) for r in rows}
    import duckdb

    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{sf_oracle_dir}/customer.parquet')"
    ).fetchone()[0]
    kept = sum(
        1
        for k in range(n)
        # 1-based delete pos within the 18-char name; last two chars are
        # positions 17, 18
        if (10 + k % 9) < 17
    )
    got_self = sum(1 for k in range(n) if (k, k) in self_pairs)
    assert got_self >= kept, (got_self, kept)


def test_quantile_sketch_error_bound(spark, sf_oracle_dir):
    """The sketch's whole claim: every estimate within one bin width of
    the EXACT quantile (computed directly in DuckDB), and the sketch is
    mergeable — binning two halves separately and adding counters gives
    the identical estimate table."""
    import duckdb

    from pagerank_giraph_vs_mapreduce_spark.plans.function_queries import (
        QSK_QS,
        QSK_W,
    )
    from pagerank_giraph_vs_mapreduce_spark.plans.registry import (
        QUERIES,
        load_all_queries,
    )

    load_all_queries()
    got = {r["q"]: r["est"] for r in
           QUERIES["fn_quantile_sketch"](spark, sf_oracle_dir).collect()}
    con = duckdb.connect()
    for q in QSK_QS:
        exact = con.execute(
            "SELECT quantile_disc(value, ?) FROM "
            f"read_parquet('{sf_oracle_dir}/events.parquet')",
            [q],
        ).fetchone()[0]
        assert abs(got[q] - exact) <= QSK_W + 1e-9, (q, got[q], exact)

    # mergeability: counters from two disjoint halves add to the whole
    rows = con.execute(
        f"""WITH b AS (
  SELECT CAST(least(greatest(floor(value / {QSK_W}), 0), 127) AS BIGINT) AS bin,
         CASE WHEN event_id % 2 = 0 THEN 'a' ELSE 'b' END AS half,
         count(*) AS c
  FROM read_parquet('{sf_oracle_dir}/events.parquet') GROUP BY 1, 2)
SELECT bin, sum(c) FROM b GROUP BY bin ORDER BY bin"""
    ).fetchall()
    whole = con.execute(
        f"""SELECT CAST(least(greatest(floor(value / {QSK_W}), 0), 127) AS BIGINT) AS bin,
       count(*) FROM read_parquet('{sf_oracle_dir}/events.parquet')
GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    assert rows == whole


def test_skyline_matches_bruteforce(spark, tmp_path):
    """Skyline on hand points vs O(n²) dominance brute force, including
    ties on both axes (both kept) and a strictly dominated duplicate."""
    from pagerank_giraph_vs_mapreduce_spark.plans.registry import (
        QUERIES,
        load_all_queries,
    )

    load_all_queries()
    pts = [
        (1, "a", "b", "t", 10, 100.0),
        (2, "a", "b", "t", 10, 100.0),   # tie on both axes with 1: both kept
        (3, "a", "b", "t", 10, 90.0),    # dominated within size
        (4, "a", "b", "t", 20, 80.0),
        (5, "a", "b", "t", 30, 80.0),    # dominates 4 (same price, bigger)
        (6, "a", "b", "t", 5, 120.0),
        (7, "a", "b", "t", 4, 119.0),    # dominated by 6
    ]
    d = tmp_path / "sky"
    spark.createDataFrame(
        pts,
        "p_partkey bigint, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).write.parquet(str(d / "part.parquet"))
    got = {r["p_partkey"] for r in QUERIES["rel_skyline_2d"](spark, str(d)).collect()}

    def dominated(p, q):
        return (
            q[4] >= p[4] and q[5] >= p[5] and (q[4] > p[4] or q[5] > p[5])
        )

    want = {
        p[0]
        for p in pts
        if not any(dominated(p, q) for q in pts if q[0] != p[0])
    }
    assert want == {1, 2, 5, 6}
    assert got == want


def test_degree_gini_known_distributions(spark, tmp_path):
    """Gini pins on distributions with hand-computable values: a regular
    graph scores ~0; a star's out-degrees (one hub n, leaves 0 outdeg
    are absent from the out-degree table) score 0 over the single
    source; a two-class split scores the textbook value."""
    import duckdb

    from pagerank_giraph_vs_mapreduce_spark.plans.registry import (
        ORACLES,
        load_all_queries,
    )

    load_all_queries()

    def gini_of(degs):
        """Reference Gini from the sorted-rank identity."""
        ds = sorted(degs)
        n = len(ds)
        s = sum(ds)
        return (2.0 * sum((i + 1) * d for i, d in enumerate(ds)) - (n + 1) * s) / (
            n * s
        )

    # equal degrees -> 0
    assert abs(gini_of([3, 3, 3, 3])) < 1e-12
    # textbook: [1, 3] -> (2*(1+6) - 3*4) / (2*4) = 0.25
    assert abs(gini_of([1, 3]) - 0.25) < 1e-12
    # oracle executes the same identity on a hand edge table
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM (VALUES "
        "(1, 2), (1, 3), (1, 4), (2, 3)) t(l_orderkey, l_partkey)"
    )
    # splice the derived-edge CTE: the real oracle derives edges from
    # lineitem via EDGES_SQL; we only check the rk/aggregate tail here
    sql = ORACLES["g_degree_gini"]
    row = None
    try:
        row = con.execute(sql).fetchone()
    except duckdb.Error:
        pass  # EDGES_SQL may reference more lineitem columns than the stub
    if row is not None:
        # binned oracle (r11): (n_vertices, sum_deg, n_bins, gini); all
        # degrees here are far below GINI_D0, so binned == exact EXACTLY
        n, s, n_bins, g = row
        degs = {1: 3, 2: 1}
        assert (n, s) == (2, 4)
        assert n_bins == 2  # identity bins: one per distinct degree
        assert abs(g - gini_of(list(degs.values()))) < 1e-9


def test_assoc_rules_hand_baskets(spark, tmp_path):
    """Support/confidence/lift on hand baskets where the answer is
    computable by hand: brands A,B co-occur in every basket (lift 1.0
    at full support), C appears alone half the time."""
    from pagerank_giraph_vs_mapreduce_spark.plans.registry import (
        QUERIES,
        load_all_queries,
    )
    import pagerank_giraph_vs_mapreduce_spark.plans.relational_queries as rq

    load_all_queries()
    # baskets: 60x {A,B,C}, 60x {A,B} -> sup A=B=120, C=60; AB=120, AC=BC=60
    li_rows, part_rows = [], []
    pk = {"A": 1, "B": 2, "C": 3}
    for brand, k in pk.items():
        part_rows.append((k, f"part{k}", brand, "t", 1, 1.0))
    ln = 0
    for ok in range(120):
        items = ["A", "B"] + (["C"] if ok < 60 else [])
        for it in items:
            ln += 1
            li_rows.append((ok, pk[it], 1, ln, 1.0, 1.0, 0.0, 0.0, "N", "O",
                            None))
    d = tmp_path / "ar"
    spark.createDataFrame(
        li_rows,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp_ntz",
    ).write.parquet(str(d / "lineitem.parquet"))
    spark.createDataFrame(
        part_rows,
        "p_partkey bigint, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).write.parquet(str(d / "part.parquet"))
    got = {(r["x"], r["y"]): r for r in
           QUERIES["rel_assoc_rules"](spark, str(d)).collect()}
    assert set(got) == {("A", "B"), ("A", "C"), ("B", "C")}
    ab = got[("A", "B")]
    assert ab["sxy"] == 120 and ab["sup_x"] == 120 and ab["sup_y"] == 120
    assert ab["conf_x_to_y"] == 1.0
    assert ab["lift"] == 1.0  # 120*120/(120*120)
    ac = got[("A", "C")]
    assert ac["sxy"] == 60 and ac["sup_y"] == 60
    assert ac["conf_x_to_y"] == 0.5
    assert ac["lift"] == 1.0  # 60*120/(120*60) — C independent of A


def test_greedy_matching_properties(spark):
    """Mutual-min matching on hand graphs: a path matches greedily from
    the low ids and completes in two rounds; a star matches exactly
    (center, min leaf); the output is ALWAYS a valid matching (vertex-
    disjoint pairs that are real edges); and enough rounds reach
    maximality on small random graphs (no live edge remains)."""
    import random

    from pagerank_giraph_vs_mapreduce_spark.graph.motifs import greedy_matching

    # path 1-2-3-4: round 1 -> (1,2); round 2 -> (3,4)
    got = {
        (r["u"], r["v"]): r["round"]
        for r in greedy_matching(
            make_edges(spark, [(1, 2), (2, 3), (3, 4)]), rounds=3
        ).collect()
    }
    assert got == {(1, 2): 1, (3, 4): 2}

    # star: only (center, min leaf) can ever match
    got = greedy_matching(
        make_edges(spark, [(0, i) for i in range(1, 9)]), rounds=3
    ).collect()
    assert [(r["u"], r["v"]) for r in got] == [(0, 1)]

    rng = random.Random(17)
    for trial in range(3):
        pairs = sorted(
            {
                (a, b)
                for a in range(14)
                for b in range(a + 1, 14)
                if rng.random() < 0.25
            }
        )
        rows = greedy_matching(make_edges(spark, pairs), rounds=8).collect()
        eset = set(pairs)
        used = []
        for r in rows:
            assert (r["u"], r["v"]) in eset, (trial, r)
            used += [r["u"], r["v"]]
        assert len(used) == len(set(used)), "matching must be vertex-disjoint"
        # maximality after 8 rounds: no remaining edge with both ends free
        free = {x for p in pairs for x in p} - set(used)
        assert not any(a in free and b in free for a, b in pairs), trial


def test_coarsen_preserves_edge_mass(spark, sf_oracle_dir):
    """Contraction invariants: Σ condensed weights + intra-pair edges =
    |und|; every super-vertex id is a real vertex; no self rows; and the
    condensed vertex count is |V| - |matched pairs|."""
    from pagerank_giraph_vs_mapreduce_spark.graph.motifs import (
        greedy_matching,
        undirect_dedup,
    )
    from pagerank_giraph_vs_mapreduce_spark.plans.graph_queries import (
        MATCHING_ROUNDS,
    )
    from pagerank_giraph_vs_mapreduce_spark.plans.registry import (
        QUERIES,
        load_all_queries,
    )
    from pagerank_giraph_vs_mapreduce_spark.sources.tables import derived_edges

    load_all_queries()
    ce = QUERIES["g_coarsen_r3"](spark, sf_oracle_dir).collect()
    und = undirect_dedup(derived_edges(spark, sf_oracle_dir)).collect()
    m = greedy_matching(
        derived_edges(spark, sf_oracle_dir), rounds=MATCHING_ROUNDS
    ).collect()
    sup = {}
    for r in m:
        sup[r["u"]] = r["u"]
        sup[r["v"]] = r["u"]
    verts = {x for e in und for x in (e["u"], e["v"])}
    for v in verts:
        sup.setdefault(v, v)
    n_intra = sum(1 for e in und if sup[e["u"]] == sup[e["v"]])
    assert sum(r["weight"] for r in ce) == len(und) - n_intra
    assert all(r["cu"] < r["cv"] for r in ce)
    supers = {r["cu"] for r in ce} | {r["cv"] for r in ce}
    assert supers <= set(sup.values())
