"""Unit tests for the r4 graph/scoring wave: PageRank, Bloom
decontamination, the frozen linear quality classifier, and CCNet
perplexity buckets. Oracle-level value checks live in
tests/test_oracle_parity.py; these pin the operator semantics on
hand-computable graphs/corpora."""

import math

import pytest
from pyspark.sql import functions as F

from zoi_spark import graph, text


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


class TestPagerank:
    def test_two_node_cycle_is_uniform(self, spark):
        e = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
        r = _ranks(graph.pagerank(e, iters=3, checkpoint=False))
        assert r[1] == pytest.approx(0.5)
        assert r[2] == pytest.approx(0.5)
        assert sum(r.values()) == pytest.approx(1.0)

    def test_star_sink_gets_the_mass(self, spark):
        # 1,2,3 all point at 4; 4 is dangling
        e = spark.createDataFrame(
            [(1, 4), (2, 4), (3, 4)], "src long, dst long")
        r = _ranks(graph.pagerank(e, iters=12))
        assert sum(r.values()) == pytest.approx(1.0)
        assert r[4] > r[1] > 0
        assert r[1] == pytest.approx(r[2]) == pytest.approx(r[3])

    def test_matches_dense_power_iteration(self, spark):
        # reference: numpy-free dense power iteration on a small graph
        edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)]
        n, d, iters = 4, 0.85, 7
        out = {}
        for s, _ in edges:
            out[s] = out.get(s, 0) + 1
        rank = [1.0 / n] * n
        for _ in range(iters):
            dm = sum(rank[v] for v in range(n) if v not in out)
            contrib = [0.0] * n
            for s, t in edges:
                contrib[t] += rank[s] / out[s]
            rank = [(1 - d) / n + d * (contrib[v] + dm / n)
                    for v in range(n)]
        e = spark.createDataFrame(edges, "src long, dst long")
        got = _ranks(graph.pagerank(e, iters=iters, damping=d))
        for v in range(n):
            assert got[v] == pytest.approx(rank[v], abs=1e-12), v

    def test_parallel_edges_sum_as_weight(self, spark):
        # duplicate edge 1->2 must behave as weight 2 next to 1->3
        e = spark.createDataFrame(
            [(1, 2), (1, 2), (1, 3), (2, 1), (3, 1)],
            "src long, dst long")
        w = spark.createDataFrame(
            [(1, 2, 2.0), (1, 3, 1.0), (2, 1, 1.0), (3, 1, 1.0)],
            "src long, dst long, w double")
        a = _ranks(graph.pagerank(e, iters=5))
        b = _ranks(graph.pagerank(w, weight_col="w", iters=5))
        for v in a:
            assert a[v] == pytest.approx(b[v], abs=1e-12)
        assert a[2] > a[3]

    def test_empty_graph(self, spark):
        e = spark.createDataFrame([], "src long, dst long")
        assert graph.pagerank(e, iters=2).count() == 0

    def test_iters_validated(self, spark):
        e = spark.createDataFrame([(1, 2)], "src long, dst long")
        with pytest.raises(ValueError):
            graph.pagerank(e, iters=0)


class TestHits:
    def _scores(self, df):
        return {r["node"]: (r["hub"], r["authority"]) for r in df.collect()}

    def test_bipartite_hub_authority_split(self, spark):
        # 1,2 point at 3,4: pure hubs score authority 0, pure
        # authorities score hub 0 — the link-farm asymmetry.
        e = spark.createDataFrame(
            [(1, 3), (1, 4), (2, 3)], "src long, dst long")
        s = self._scores(graph.hits(e, iters=3, checkpoint=False))
        assert s[1] == (1.0, 0.0)          # 2 out-edges: best hub
        assert s[2][0] < 1.0 and s[2][1] == 0.0
        assert s[3] == (0.0, 1.0)          # 2 in-edges: best authority
        assert s[4][1] < 1.0 and s[4][0] == 0.0

    def test_matches_dense_reference(self, spark):
        # numpy-free max-normalized HITS on a small digraph
        edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 1)]
        n, iters = 4, 4
        hub = [1.0] * n
        auth = [0.0] * n
        for _ in range(iters):
            auth = [0.0] * n
            for s_, t in edges:
                auth[t] += hub[s_]
            m = max(auth)
            auth = [v / m for v in auth]
            hub = [0.0] * n
            for s_, t in edges:
                hub[s_] += auth[t]
            m = max(hub)
            hub = [v / m for v in hub]
        e = spark.createDataFrame(edges, "src long, dst long")
        got = self._scores(graph.hits(e, iters=iters))
        for v in range(n):
            assert got[v][0] == pytest.approx(hub[v], abs=1e-12), v
            assert got[v][1] == pytest.approx(auth[v], abs=1e-12), v

    def test_parallel_edges_sum_as_weight(self, spark):
        e = spark.createDataFrame(
            [(1, 2), (1, 2), (3, 2), (2, 1), (2, 3)],
            "src long, dst long")
        w = spark.createDataFrame(
            [(1, 2, 2.0), (3, 2, 1.0), (2, 1, 1.0), (2, 3, 1.0)],
            "src long, dst long, w double")
        a = self._scores(graph.hits(e, iters=3))
        b = self._scores(graph.hits(w, weight_col="w", iters=3))
        for v in a:
            assert a[v][0] == pytest.approx(b[v][0], abs=1e-12)
            assert a[v][1] == pytest.approx(b[v][1], abs=1e-12)
        assert a[1][0] > a[3][0]  # double-weight hub beats single

    def test_scores_bounded_and_max_is_one(self, spark):
        e = spark.createDataFrame(
            [(i, (i * 7 + 1) % 5) for i in range(5)],
            "src long, dst long")
        s = self._scores(graph.hits(e, iters=5))
        hubs = [v[0] for v in s.values()]
        auths = [v[1] for v in s.values()]
        assert max(hubs) == pytest.approx(1.0)
        assert max(auths) == pytest.approx(1.0)
        assert all(0.0 <= x <= 1.0 for x in hubs + auths)

    def test_empty_graph(self, spark):
        e = spark.createDataFrame([], "src long, dst long")
        assert graph.hits(e, iters=2).count() == 0

    def test_iters_validated(self, spark):
        e = spark.createDataFrame([(1, 2)], "src long, dst long")
        with pytest.raises(ValueError):
            graph.hits(e, iters=0)


class TestBloomDecontamination:
    def _frames(self, spark, docs, probes):
        d = spark.createDataFrame(docs, "doc_id long, text string")
        p = spark.createDataFrame(probes, "probe_text string")
        return d, p

    def test_exact_overlap_flags(self, spark):
        d, p = self._frames(
            spark,
            [(1, "alpha beta gamma delta"), (2, "zeta eta theta iota")],
            [("alpha beta gamma delta",)])
        out = {r["doc_id"]: r.asDict() for r in text.bloom_decontamination(
            d, p, n=3, m=1 << 20, k=4).collect()}
        assert out[1]["bloom_contaminated"] is True
        assert out[1]["n_hit_grams"] == out[1]["n_grams"] == 2
        assert out[2]["bloom_contaminated"] is False
        assert out[2]["n_hit_grams"] == 0

    def test_no_false_negatives_ever(self, spark):
        # Bloom filters can false-positive but NEVER false-negative:
        # every doc sharing a real n-gram with a probe must flag.
        docs = [(i, f"common prefix tokens w{i} x{i} y{i}")
                for i in range(20)]
        d, p = self._frames(spark, docs, [("common prefix tokens",)])
        out = text.bloom_decontamination(d, p, n=3, m=64, k=2)
        assert out.where(~F.col("bloom_contaminated")).count() == 0

    def test_tiny_filter_false_positives(self, spark):
        # m=4 bits: every position set -> everything collides
        d, p = self._frames(
            spark, [(1, "aa bb cc"), (2, "dd ee ff")],
            [("gg hh ii",), ("jj kk ll",), ("mm nn oo",),
             ("pp qq rr",), ("ss tt uu",)])
        out = text.bloom_decontamination(d, p, n=3, m=4, k=1)
        flagged = out.where(F.col("bloom_contaminated")).count()
        assert flagged >= 1  # saturated filter must FP


class TestLinearQualityScore:
    def test_deterministic_and_bounded(self, spark):
        d = spark.createDataFrame(
            [(1, "the quick brown fox"), (2, "the quick brown fox"),
             (3, "lorem ipsum dolor sit amet")],
            "doc_id long, text string")
        rows = {r["doc_id"]: r for r in
                text.linear_quality_score(d).collect()}
        assert rows[1]["qlin_score"] == rows[2]["qlin_score"]
        for r in rows.values():
            assert 0.0 < r["qlin_score"] < 1.0
        assert rows[1]["n_tokens"] == 4

    def test_empty_doc_scores_null(self, spark):
        d = spark.createDataFrame(
            [(1, ""), (2, "   "), (3, "word")],
            "doc_id long, text string")
        rows = {r["doc_id"]: r for r in
                text.linear_quality_score(d).collect()}
        assert rows[1]["qlin_score"] is None
        assert rows[2]["qlin_score"] is None
        assert rows[1]["n_tokens"] == 0
        assert rows[3]["qlin_score"] is not None

    def test_matches_python_reference(self, spark):
        import hashlib

        def bucket(tok):
            return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 1024

        def weight(b):
            h = int(hashlib.md5(f"qlin#{b}".encode()).hexdigest()[:8], 16)
            return (h % 2_000_001) / 1e6 - 1.0

        toks = ["alpha", "beta", "alpha", "gamma"]
        expect = 1.0 / (1.0 + math.exp(
            -sum(weight(bucket(t)) for t in toks) / len(toks)))
        d = spark.createDataFrame([(1, " ".join(toks))],
                                  "doc_id long, text string")
        got = text.linear_quality_score(d).collect()[0]["qlin_score"]
        assert got == pytest.approx(round(expect, 6), abs=2e-6)


class TestPerplexityBuckets:
    def test_balanced_tertiles_per_lang(self, spark):
        docs = [(i, f"tok{i % 7} tok{i % 3} filler", "en")
                for i in range(9)]
        docs += [(100 + i, f"wort{i} und", "de") for i in range(6)]
        d = spark.createDataFrame(docs, "doc_id long, text string, lang string")
        out = text.perplexity_buckets(d, n_buckets=3)
        counts = {(r["lang"], r["ppl_bucket"]): r["n"] for r in
                  out.groupBy("lang", "ppl_bucket")
                  .agg(F.count("*").alias("n")).collect()}
        assert counts[("en", 1)] == counts[("en", 2)] == counts[("en", 3)] == 3
        assert counts[("de", 1)] == counts[("de", 2)] == counts[("de", 3)] == 2

    def test_bucket_order_tracks_surprisal(self, spark):
        d = spark.createDataFrame(
            [(i, "common common common" if i < 4
              else f"rare{i} unique{i} single{i}", "en")
             for i in range(8)],
            "doc_id long, text string, lang string")
        out = text.perplexity_buckets(d, n_buckets=2).collect()
        lo = [r for r in out if r["ppl_bucket"] == 1]
        hi = [r for r in out if r["ppl_bucket"] == 2]
        assert max(r["mean_surprisal"] for r in lo) <= min(
            r["mean_surprisal"] for r in hi)


class TestMinhashLshJoin:
    def test_finds_cross_corpus_near_dups(self, spark):
        from zoi_spark import dedup

        base = ("the quick brown fox jumps over the lazy dog and runs "
                "far away into the deep green forest tonight")
        left = spark.createDataFrame(
            [(1, base),
             (2, base.replace("fox", "cat")),
             (3, "completely different text about spark plans and "
                 "shuffle partitions at massive corpus scale")],
            "doc_id long, text string")
        right = spark.createDataFrame(
            [(10, base), (11, "nothing shared here at all friends")],
            "probe_id long, probe_text string")
        out = dedup.minhash_lsh_join(left, right, threshold=0.5,
                                     num_hashes=64, bands=32)
        rows = {(r["doc_id"], r["probe_id"]): r["jaccard"]
                for r in out.collect()}
        dedup.unpersist_candidates(out)
        assert rows[(1, 10)] == 1.0
        assert (2, 10) in rows and 0.5 <= rows[(2, 10)] < 1.0
        assert all(d != 3 and p != 11 for d, p in rows)

    def test_never_pairs_left_with_left(self, spark):
        from zoi_spark import dedup

        txt = "alpha beta gamma delta epsilon zeta eta theta"
        left = spark.createDataFrame(
            [(1, txt), (2, txt)], "doc_id long, text string")
        right = spark.createDataFrame(
            [(9, "unrelated words only here")],
            "probe_id long, probe_text string")
        out = dedup.minhash_lsh_join(left, right, threshold=0.3)
        assert out.count() == 0  # identical LEFT twins are NOT a pair
        dedup.unpersist_candidates(out)

    def test_max_bucket_size_prunes(self, spark):
        from zoi_spark import dedup

        txt = "repeat me " * 6
        left = spark.createDataFrame(
            [(i, txt) for i in range(8)], "doc_id long, text string")
        right = spark.createDataFrame(
            [(99, txt)], "probe_id long, probe_text string")
        capped = dedup.minhash_lsh_join(left, right, threshold=0.9,
                                        max_bucket_size=4)
        full = dedup.minhash_lsh_join(left, right, threshold=0.9)
        assert capped.count() == 0   # mega-bucket excluded
        assert full.count() == 8
        dedup.unpersist_candidates(capped)
        dedup.unpersist_candidates(full)

    def test_same_id_name_rejected(self, spark):
        from zoi_spark import dedup

        left = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        right = spark.createDataFrame([(2, "a b c")], "doc_id long, probe_text string")
        with pytest.raises(ValueError, match="must differ"):
            dedup.minhash_lsh_join(left, right, right_id="doc_id")


class TestScriptProfile:
    def test_counts_and_dominant(self, spark):
        d = spark.createDataFrame(
            [(1, "hello мир 42"),       # 5 latin, 3 cyrillic, 2 digit
             (2, "привет"),             # pure cyrillic
             (3, "!!! ???"),            # no script chars at all
             (4, "ab же")],             # 2 latin vs 2 cyrillic tie
            "doc_id long, text string")
        rows = {r["doc_id"]: r.asDict()
                for r in text.script_profile(d).collect()}
        assert rows[1]["n_latin"] == 5
        assert rows[1]["n_cyrillic"] == 3
        assert rows[1]["n_digit"] == 2
        assert rows[1]["dominant_script"] == "latin"
        assert rows[1]["latin_fraction"] == 0.5
        assert rows[2]["dominant_script"] == "cyrillic"
        assert rows[2]["latin_fraction"] == 0.0
        assert rows[3]["dominant_script"] is None
        assert rows[3]["latin_fraction"] is None
        # ties break by declaration order: latin first
        assert rows[4]["dominant_script"] == "latin"

    def test_cjk_and_arabic_ranges(self, spark):
        d = spark.createDataFrame(
            [(1, "漢字かなカナ가"), (2, "مرحبا")],
            "doc_id long, text string")
        rows = {r["doc_id"]: r.asDict()
                for r in text.script_profile(d).collect()}
        assert rows[1]["n_cjk"] == 7 and rows[1]["dominant_script"] == "cjk"
        assert rows[2]["n_arabic"] == 5
        assert rows[2]["dominant_script"] == "arabic"


class TestMojibakeStats:
    def test_marker_counts_and_flag(self, spark):
        d = spark.createDataFrame(
            [(1, "clean page"),
             (2, "it Ã©tÃ© â€™quoted Â here"),   # 2×Ã, 1×â€, 1×Â
             (3, "lossy � and ﻿ bom"),
             (4, "")],
            "doc_id long, text string")
        rows = {r["doc_id"]: r.asDict()
                for r in text.mojibake_stats(d, max_ratio=0.05).collect()}
        assert rows[1]["mojibake_chars"] == 0
        assert rows[1]["mojibake_flagged"] is False
        assert rows[2]["n_utf8_latin1"] == 2
        assert rows[2]["n_win1252_punct"] == 1
        assert rows[2]["n_nbsp_artifact"] == 1
        assert rows[2]["mojibake_chars"] == 4
        assert rows[2]["mojibake_flagged"] is True
        assert rows[3]["n_replacement"] == 1
        assert rows[3]["n_stray_bom"] == 1
        # empty text: ratio NULL, flag coalesces to False
        assert rows[4]["mojibake_ratio"] is None
        assert rows[4]["mojibake_flagged"] is False

    def test_ratio_threshold_boundary(self, spark):
        # 1 artifact in 100 chars = ratio 0.01: strictly-greater gate
        body = "x" * 99 + "�"
        d = spark.createDataFrame([(1, body)], "doc_id long, text string")
        at = text.mojibake_stats(d, max_ratio=0.01).collect()[0]
        below = text.mojibake_stats(d, max_ratio=0.009).collect()[0]
        assert at["mojibake_ratio"] == 0.01
        assert at["mojibake_flagged"] is False
        assert below["mojibake_flagged"] is True


class TestBigramLogprob:
    def test_hand_computed_model(self, spark):
        d = spark.createDataFrame(
            [(1, "a b a b"), (2, "a b"), (3, "x")],
            "doc_id long, text string")
        rows = {r["doc_id"]: r.asDict()
                for r in text.bigram_logprob(d, k=0.5).collect()}
        # corpus: c(a,b)=3, c(b,a)=1; contexts a·=3, b·=1; V=2, k=0.5
        # P(b|a)=(3+.5)/(3+1)=0.875, P(a|b)=(1+.5)/(1+1)=0.75
        exp1 = (2 * -math.log2(0.875) + 1 * -math.log2(0.75)) / 3
        assert rows[1]["n_bigrams"] == 3
        assert rows[1]["mean_bigram_surprisal"] == round(exp1, 6)
        assert rows[2]["n_bigrams"] == 1
        assert rows[2]["mean_bigram_surprisal"] == round(
            -math.log2(0.875), 6)
        # single-token doc has no bigrams: excluded, not zero-scored
        assert 3 not in rows

    def test_normalization_and_case(self, spark):
        # "A  b" normalizes to "a b" — same bigram as the lowercase doc
        d = spark.createDataFrame(
            [(1, "A  b"), (2, "a b")], "doc_id long, text string")
        rows = text.bigram_logprob(d).collect()
        vals = {r["mean_bigram_surprisal"] for r in rows}
        assert len(vals) == 1 and len(rows) == 2


class TestDegreeStats:
    def test_degrees_reciprocity_and_self_loops(self, spark):
        from zoi_spark import graph

        edges = [(1, 2), (2, 1),     # reciprocal pair
                 (1, 3), (1, 3),     # duplicate edge counts once
                 (3, 3),             # self-loop excluded
                 (4, 1)]             # 4 has no in-edges
        df = spark.createDataFrame(edges, "src long, dst long")
        out = {r.node: r for r in graph.degree_stats(df).collect()}
        assert (out[1].out_deg, out[1].in_deg) == (2, 2)
        assert (out[1].n_reciprocal, out[1].reciprocity) == (1, 0.5)
        assert (out[2].out_deg, out[2].n_reciprocal) == (1, 1)
        assert out[2].reciprocity == 1.0
        assert (out[3].out_deg, out[3].in_deg) == (0, 1)   # loop gone
        assert out[3].reciprocity == 0.0
        assert (out[4].out_deg, out[4].in_deg, out[4].n_reciprocal) \
            == (1, 0, 0)


class TestCentroidDrift:
    def test_hand_centroids(self, spark):
        from zoi_spark import similarity

        rows = [(0, [1.0, 0.0]), (0, [1.0, 0.0]),     # mean (1, 0)
                (1, [0.0, 2.0]),                      # mean (0, 2)
                (2, [1.0, 1.0]), (2, [3.0, 3.0])]     # mean (2, 2)
        df = spark.createDataFrame(
            rows, "label int, embedding array<float>")
        out = {(r.g_a, r.g_b): r.centroid_cosine
               for r in similarity.centroid_drift(df).collect()}
        assert out[(0, 1)] == 0.0                     # orthogonal
        assert abs(out[(0, 2)] - round(2 ** -0.5, 6)) < 1e-9
        assert abs(out[(1, 2)] - round(2 ** -0.5, 6)) < 1e-9


class TestLpaCommunities:
    def test_bridge_keeps_triangles_apart(self, spark):
        from zoi_spark import graph

        # two triangles joined by ONE bridge edge: connected components
        # would merge them; LPA's density bias keeps them apart.
        edges = [(1, 2), (2, 3), (3, 1),
                 (4, 5), (5, 6), (6, 4),
                 (3, 4)]                      # the bridge
        df = spark.createDataFrame(edges, "src long, dst long")
        out = {r.node: r.community
               for r in graph.lpa_communities(df, iters=3).collect()}
        # hand-unrolled 3 synchronous min-tie-break rounds
        assert out == {1: 1, 2: 1, 3: 1, 4: 3, 5: 3, 6: 3}
        assert len({out[1], out[4]}) == 2     # two communities survive

    def test_self_loops_and_nulls_dropped(self, spark):
        from zoi_spark import graph

        edges = [(7, 7), (None, 1), (1, None), (2, 3)]
        df = spark.createDataFrame(edges, "src long, dst long")
        out = {r.node: r.community
               for r in graph.lpa_communities(df, iters=2).collect()}
        # 7 only self-loops and the NULL-partner rows -> not nodes.
        # A bare edge is bipartite: synchronous LPA swaps labels each
        # round (the textbook oscillation), so after 2 rounds each node
        # is back to its own label.
        assert out == {2: 2, 3: 3}
        out3 = {r.node: r.community
                for r in graph.lpa_communities(df, iters=3).collect()}
        assert out3 == {2: 3, 3: 2}


class TestTriangleStats:
    def test_circulant_hand_values(self, spark):
        from zoi_spark import graph

        # C12(1,2): every node has degree 4 and sits in exactly the 3
        # triangles {g-2..g}, {g-1..g+1}, {g..g+2} -> cc = 3/6 = 0.5
        edges = [(g, (g + 1) % 12) for g in range(12)] + \
                [(g, (g + 2) % 12) for g in range(12)]
        df = spark.createDataFrame(edges, "src long, dst long")
        out = graph.triangle_stats(df).collect()
        assert len(out) == 12
        assert all((r.degree, r.n_triangles, r.clustering)
                   == (4, 3, 0.5) for r in out)

    def test_duplicate_reverse_and_degenerate(self, spark):
        from zoi_spark import graph

        # triangle given with duplicate + reversed edges counts once;
        # pendant node 4 (degree 1) has cc = 0.0 by convention
        edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (3, 4)]
        df = spark.createDataFrame(edges, "src long, dst long")
        out = {r.node: r for r in graph.triangle_stats(df).collect()}
        assert (out[1].n_triangles, out[1].degree) == (1, 2)
        assert out[3].degree == 3
        assert out[3].clustering == round(2 * 1 / (3 * 2), 6)
        assert (out[4].n_triangles, out[4].clustering) == (0, 0.0)


class TestVocabCoverage:
    def test_hand_counts_and_tiebreak(self, spark):
        from zoi_spark import text as ztext

        # tokens: the x4, cat x2, dog x2 (tie broken 'cat' < 'dog'), ox
        d = spark.createDataFrame(
            [(1, "the cat THE dog"), (2, "the cat dog the ox")],
            "doc_id long, text string")
        out = {r.vocab_size: r for r in ztext.vocab_coverage(
            d, thresholds=(1, 2, 3)).collect()}
        assert (out[1].covered_tokens, out[1].total_tokens) == (4, 9)
        assert out[2].covered_tokens == 6      # the + cat (tiebreak)
        assert out[3].covered_tokens == 8
        assert out[3].coverage == round(8 / 9, 6)

    def test_rejects_bad_thresholds(self, spark):
        import pytest as _pt

        from zoi_spark import text as ztext

        d = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with _pt.raises(ValueError, match="thresholds"):
            ztext.vocab_coverage(d, thresholds=(0,))


class TestAssortativity:
    def test_star_is_perfectly_disassortative(self, spark):
        from zoi_spark import graph

        e = spark.createDataFrame([(0, 1), (0, 2), (0, 3)],
                                  "src long, dst long")
        r = graph.degree_assortativity(e).first()
        assert (r.n_edges, r.assortativity) == (3, -1.0)

    def test_regular_graph_has_no_variance(self, spark):
        from zoi_spark import graph

        ring = [(i, (i + 1) % 5) for i in range(5)]
        e = spark.createDataFrame(ring, "src long, dst long")
        r = graph.degree_assortativity(e).first()
        assert r.n_edges == 5 and r.assortativity is None


class TestKcore:
    def test_chain_peels_over_rounds(self, spark):
        from zoi_spark import graph

        # triangle {1,2,3} + chain 3-4-5: round 1 peels leaf 5 (which
        # re-exposes 4 at degree 1), round 2 peels 4
        e = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)],
            "src long, dst long")
        one = {r.node: r.degree
               for r in graph.kcore(e, k=2, rounds=1).collect()}
        assert one == {1: 2, 2: 2, 3: 3, 4: 1}
        two = {r.node: r.degree
               for r in graph.kcore(e, k=2, rounds=2).collect()}
        assert two == {1: 2, 2: 2, 3: 2}
        # converged: extra rounds are no-ops
        four = {r.node: r.degree
                for r in graph.kcore(e, k=2, rounds=4).collect()}
        assert four == two

    def test_validates_params(self, spark):
        from zoi_spark import graph

        e = spark.createDataFrame([(1, 2)], "src long, dst long")
        with pytest.raises(ValueError):
            graph.kcore(e, k=0, rounds=1)
        with pytest.raises(ValueError):
            graph.kcore(e, k=2, rounds=0)


class TestSilhouetteCentroid:
    def test_separated_clusters_score_one(self, spark):
        from zoi_spark import similarity

        rows = [(1, 0, [1.0, 0.0]), (2, 0, [1.0, 0.0]),
                (3, 1, [0.0, 1.0])]
        df = spark.createDataFrame(
            rows, "vec_id long, label int, embedding array<float>")
        out = {r.label: r for r in
               similarity.silhouette_centroid(df).collect()}
        assert (out[0].n_points, out[1].n_points) == (2, 1)
        for lbl in (0, 1):
            assert out[lbl].mean_a == 0.0
            assert out[lbl].mean_b == 1.0       # orthogonal centroids
            assert out[lbl].mean_silhouette == 1.0

    def test_overlapping_clusters_score_negative_side(self, spark):
        from zoi_spark import similarity

        # label 1's point sits ON label 0's centroid direction:
        # a = 1 - cos(45deg-ish)… simpler: point closer to the OTHER
        # centroid must get s < 0
        rows = [(1, 0, [1.0, 0.0]), (2, 0, [0.0, 1.0]),
                (3, 1, [1.0, 0.0])]
        df = spark.createDataFrame(
            rows, "vec_id long, label int, embedding array<float>")
        out = {r.label: r for r in
               similarity.silhouette_centroid(df).collect()}
        # label-1 centroid IS its point -> a=0, s=1; label-0 points are
        # 45deg from own centroid; point (1,0) is 0deg from label-1's
        # centroid -> its s < 0 drags label-0's mean below label-1's
        assert out[1].mean_silhouette == 1.0
        assert out[0].mean_silhouette < out[1].mean_silhouette


class TestByteFertility:
    def test_sum_ratios(self, spark):
        from zoi_spark import text as ztext

        rows = [("en", "ab cd"), ("en", ""), ("zh", "中文")]
        df = spark.createDataFrame(rows, "lang string, text string")
        out = {r.lang: r for r in ztext.byte_fertility(df).collect()}
        assert (out["en"].n_docs, out["en"].n_tokens) == (2, 2)
        assert out["en"].bytes_per_char == 1.0
        assert out["en"].chars_per_token == 2.5
        assert (out["zh"].bytes_per_char, out["zh"].bytes_per_token) \
            == (3.0, 6.0)

    def test_all_empty_lang_has_null_ratios(self, spark):
        from zoi_spark import text as ztext

        df = spark.createDataFrame([("fr", "")], "lang string, text string")
        r = ztext.byte_fertility(df).first()
        assert (r.n_docs, r.n_tokens) == (1, 0)
        assert r.bytes_per_char is None and r.bytes_per_token is None


class TestGramNovelty:
    def test_first_occurrence_semantics(self, spark):
        from zoi_spark import text as ztext

        rows = [(1, "a b c d"), (2, "a b c d"), (3, "a b c x")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r.doc_id: r for r in
               ztext.gram_novelty(df, n=3).collect()}
        assert (out[1].n_grams, out[1].novelty) == (2, 1.0)
        assert (out[2].n_novel, out[2].novelty) == (0, 0.0)
        assert (out[3].n_grams, out[3].n_novel, out[3].novelty) \
            == (2, 1, 0.5)

    def test_short_doc_whole_text_shingle(self, spark):
        from zoi_spark import text as ztext

        rows = [(1, "hello"), (2, "hello"), (3, "")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r.doc_id: r for r in
               ztext.gram_novelty(df, n=3).collect()}
        assert out[1].novelty == 1.0 and out[2].novelty == 0.0
        assert 3 not in out                 # no grams -> omitted


class TestCooccurrencePairs:
    def test_hand_baskets(self, spark):
        from zoi_spark import graph

        rows = [(1, "A"), (1, "B"), (2, "A"), (2, "B"), (3, "A"),
                (3, "C"), (3, "A")]           # dup (3,A) dedups
        df = spark.createDataFrame(rows, "u long, item string")
        out = {(r.item_a, r.item_b): r for r in
               graph.cooccurrence_pairs(df, entity_col="u",
                                        item_col="item").collect()}
        assert set(out) == {("A", "B"), ("A", "C")}   # B-C never co-occur
        ab = out[("A", "B")]
        assert (ab.n_both, ab.n_a, ab.n_b) == (2, 3, 2)
        assert ab.affinity == round(2 / 3, 6)
        assert out[("A", "C")].affinity == round(1 / 3, 6)


class TestSeedDistance:
    def test_path_graph_hops(self, spark):
        from zoi_spark import graph

        e = spark.createDataFrame([(i, i + 1) for i in range(6)],
                                  "src long, dst long")
        seeds = spark.createDataFrame([(0,)], "node long")
        out = {r.node: r.distance for r in
               graph.seed_distance(e, seeds, max_hops=2).collect()}
        assert out == {0: 0, 1: 1, 2: 2}      # 3.. beyond the cap

    def test_two_seeds_take_nearest(self, spark):
        from zoi_spark import graph

        e = spark.createDataFrame([(i, i + 1) for i in range(4)],
                                  "src long, dst long")
        seeds = spark.createDataFrame([(0,), (4,)], "node long")
        out = {r.node: r.distance for r in
               graph.seed_distance(e, seeds, max_hops=3).collect()}
        assert out == {0: 0, 4: 0, 1: 1, 3: 1, 2: 2}


class TestBestPerStratum:
    def test_topk_and_tiebreak(self, spark):
        from zoi_spark import sampling

        rows = [("en", 1, 0.9), ("en", 2, 0.9), ("en", 3, 0.5),
                ("de", 4, 0.1)]
        df = spark.createDataFrame(rows, "lang string, id long, q double")
        out = sampling.best_per_stratum(df, stratum_col="lang",
                                        score_col="q", k=2,
                                        order_col="id").collect()
        kept = {(r.lang, r.id): r["__rank"] for r in out}
        assert kept == {("en", 1): 1, ("en", 2): 2, ("de", 4): 1}

    def test_validates_k(self, spark):
        from zoi_spark import sampling

        df = spark.createDataFrame([("en", 1, 0.9)],
                                   "lang string, id long, q double")
        with pytest.raises(ValueError):
            sampling.best_per_stratum(df, stratum_col="lang",
                                      score_col="q", k=0,
                                      order_col="id")


class TestCapsProfile:
    def test_hand_ratios(self, spark):
        from zoi_spark import text as ztext

        rows = [("s1", "HELLO WORLD yes"),     # 2/3 caps -> shouty
                ("s1", "Ab AB A a8"),          # only AB counts: 1/4
                ("s2", "")]                    # empty: 0 tokens
        df = spark.createDataFrame(rows, "source string, text string")
        out = {r.source: r for r in ztext.caps_profile(
            df, shouty_ratio=0.3).collect()}
        s1 = out["s1"]
        assert (s1.n_docs, s1.n_tokens, s1.n_caps_tokens) == (2, 7, 3)
        assert s1.caps_ratio == round(3 / 7, 6)
        assert s1.n_shouty == 1
        s2 = out["s2"]
        assert (s2.n_tokens, s2.caps_ratio, s2.n_shouty) == (0, None, 0)


class TestAdamicAdar:
    @staticmethod
    def _aa_micro(deg):
        import math
        return round(1e6 / math.log(deg))

    def test_butterfly_scores(self, spark):
        from zoi_spark import graph

        # 1 and 2 share neighbors {3, 4}; 3 and 4 share {1, 2};
        # every node has degree 2
        e = spark.createDataFrame([(1, 3), (2, 3), (1, 4), (2, 4)],
                                  "src long, dst long")
        out = {(r.node_a, r.node_b): (r.common_neighbors, r.aa_micro)
               for r in graph.adamic_adar(e).collect()}
        c = self._aa_micro(2)
        assert out == {(1, 2): (2, 2 * c), (3, 4): (2, 2 * c)}

    def test_connected_pairs_excluded_by_default(self, spark):
        from zoi_spark import graph

        e = spark.createDataFrame(
            [(1, 3), (2, 3), (1, 2)], "src long, dst long")
        # (1,2) share neighbor 3 but are themselves linked
        assert graph.adamic_adar(e).where(
            "node_a = 1 AND node_b = 2").count() == 0
        kept = graph.adamic_adar(e, include_connected=True).where(
            "node_a = 1 AND node_b = 2").collect()
        # shared z=3 with deg(3)=2; 1 and 2's extra mutual edge only
        # raises THEIR degrees, not the contribution
        assert kept[0].common_neighbors == 1
        assert kept[0].aa_micro == self._aa_micro(2)

    def test_hub_cap_excludes_shared_role_only(self, spark):
        from zoi_spark import graph

        # hub 9 (degree 3) is every pair's shared neighbor; node 5
        # (degree 2) is shared by (1,2) only
        e = spark.createDataFrame(
            [(1, 9), (2, 9), (3, 9), (1, 5), (2, 5)],
            "src long, dst long")
        out = {(r.node_a, r.node_b): r.aa_micro for r in
               graph.adamic_adar(e, max_hub_degree=2).collect()}
        # pairs via the hub vanish; (1,2) keeps only 5's contribution.
        # (5,9) is legitimately shared by z=1 and z=2 (both deg 2) —
        # the cap removes 9 from the SHARED role, not the pair role
        c = self._aa_micro(2)
        assert out == {(1, 2): c, (5, 9): 2 * c}


def test_levenshtein_pairs_block_and_threshold(spark):
    from zoi_spark import dedup

    rows = [(1, "abcdefghij"),       # base
            (2, "abcdefghiX"),       # dist 1, same block
            (3, "abcdefZZZZ"),       # dist 4 > max_dist, same block
            (4, "XYZdefghij")]       # edit inside prefix -> other block
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.id_a, r.id_b): r.lev_dist for r in
           dedup.levenshtein_verify_pairs(
               df, max_dist=3, key_len=10, block_prefix=6).collect()}
    # (1,3)/(2,3) exceed the threshold (banded form returns -1);
    # 4 never meets anyone -- prefix blocking recall tradeoff
    assert out == {(1, 2): 1}


def test_levenshtein_pairs_mega_block_cap(spark):
    from zoi_spark import dedup

    rows = [(i, "samePrefix" + str(i)) for i in range(5)] \
        + [(10, "uniqueAAAA"), (11, "uniqueAAAB")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.id_a, r.id_b) for r in dedup.levenshtein_verify_pairs(
        df, max_dist=3, key_len=10, block_prefix=6,
        max_block_size=4).collect()}
    # the 5-row 'samepr' block is excluded wholesale; the 2-row
    # 'unique' block survives
    assert out == {(10, 11)}


class TestHammingDupGroups:
    def test_hand_hashes_and_counts(self, spark):
        from zoi_spark import dedup

        # hashes: 0b0000 ×3 rows, 0b0001 ×2, 0b0111, and a far one
        rows = [(0,), (0,), (0,), (1,), (1,), (7,), (-1,)]
        df = spark.createDataFrame(rows, "phash long")
        out = {(r.hash_a, r.hash_b): (r.hamming, r.n_pairs) for r in
               dedup.hamming_dup_groups(df, hash_col="phash",
                                        max_dist=3).collect()}
        # (0,1)=1, (0,7)=3, (1,7)=2; -1 is 61+ bits from everything
        assert out == {(0, 1): (1, 6), (0, 7): (3, 3), (1, 7): (2, 2)}

    def test_banding_finds_high_bit_neighbors(self, spark):
        from zoi_spark import dedup

        # differ ONLY in the top band (bits 48+): pigeonhole still
        # pairs them via the equal low bands
        a, b = 5 << 48 | 123, 4 << 48 | 123
        df = spark.createDataFrame([(a,), (b,)], "phash long")
        got = dedup.hamming_dup_groups(df, hash_col="phash",
                                       max_dist=3).collect()
        assert len(got) == 1 and got[0].hamming == 1

    def test_validates_max_dist(self, spark):
        from zoi_spark import dedup
        import pytest as _pt

        df = spark.createDataFrame([(0,)], "phash long")
        with _pt.raises(ValueError):
            dedup.hamming_dup_groups(df, hash_col="phash", max_dist=64)


class TestTrustRank:
    def test_mass_stays_one_and_seeds_dominate(self, spark):
        # seeds {1}; chain 1->2->3 plus an unreachable island 4->5
        e = spark.createDataFrame([(1, 2), (2, 3), (4, 5)],
                                  "src long, dst long")
        seeds = spark.createDataFrame([(1,)], "node long")
        r = {row.node: row["rank"] for row in
             graph.trust_rank(e, seeds, iters=4,
                              checkpoint=False).collect()}
        assert sum(r.values()) == pytest.approx(1.0)
        # island never reachable from the seed: zero trust
        assert r[4] == 0.0 and r[5] == 0.0
        # trust decays along the chain from 2 on (2 gets 0.85·r(1)
        # wholesale, so it may out-rank the seed itself — the seed only
        # keeps teleport + the dangling return); all reachable > 0
        assert r[2] > r[3] > 0 and r[1] > 0

    def test_matches_dense_reference(self, spark):
        edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)]
        seeds_l = [0, 3]
        n, d, iters = 4, 0.85, 5
        out = {}
        for s, _ in edges:
            out[s] = out.get(s, 0) + 1
        s_vec = [1.0 / len(seeds_l) if v in seeds_l else 0.0
                 for v in range(n)]
        rank = s_vec[:]
        for _ in range(iters):
            dm = sum(rank[v] for v in range(n) if v not in out)
            contrib = [0.0] * n
            for s, t in edges:
                contrib[t] += rank[s] / out[s]
            rank = [(1 - d) * s_vec[v]
                    + d * (contrib[v] + dm * s_vec[v])
                    for v in range(n)]
        e = spark.createDataFrame(edges, "src long, dst long")
        seeds = spark.createDataFrame([(v,) for v in seeds_l],
                                      "node long")
        got = {row.node: row["rank"] for row in
               graph.trust_rank(e, seeds, iters=iters,
                                damping=d).collect()}
        for v in range(n):
            assert got[v] == pytest.approx(rank[v], abs=1e-12), v

    def test_requires_in_graph_seed(self, spark):
        e = spark.createDataFrame([(1, 2)], "src long, dst long")
        seeds = spark.createDataFrame([(99,)], "node long")
        with pytest.raises(ValueError):
            graph.trust_rank(e, seeds, iters=2)


def test_cross_source_copies_prefix_and_distinct(spark):
    from zoi_spark import dedup

    rows = [(1, "the same head but tail one", "a"),
            (2, "the same head but tail two", "b"),
            (3, "the same head but tail two", "b"),   # dup within b
            (4, "entirely different text here", "c")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    # full-text: only exact copies count -> none cross-source
    assert dedup.cross_source_copies(df).count() == 0
    # prefix-18 ('the same head but ') unifies a and b, ONCE despite
    # b carrying the text twice
    out = dedup.cross_source_copies(df, prefix_chars=18).collect()
    assert [(r.source_a, r.source_b, r.n_shared_fps)
            for r in out] == [("a", "b", 1)]


def test_angular_histogram_known_bins(spark):
    from zoi_spark import similarity

    # one block (ids 0..3 with n_blocks=1): vectors chosen so pair
    # cosines are exactly +1 (0,1), -1 (0,2)/(1,2), 0 (x,3)
    rows = [(0, [1.0, 0.0]), (1, [2.0, 0.0]),
            (2, [-1.0, 0.0]), (3, [0.0, 1.0])]
    df = spark.createDataFrame(rows,
                               "vec_id long, embedding array<float>")
    out = {r.bin: (r.n_pairs, r.lo_micro, r.hi_micro) for r in
           similarity.angular_histogram(df, n_blocks=1,
                                        bins=10).collect()}
    # cos -1 -> bin 0 (x2 pairs); cos 0 -> bin 5 (x3); cos 1 -> bin 9
    assert out == {0: (2, -1000000, -1000000),
                   5: (3, 0, 0),
                   9: (1, 1000000, 1000000)}
    import pytest as _pt
    with _pt.raises(ValueError):
        similarity.angular_histogram(df, bins=0)


def test_vocab_overlap_hand_sets(spark):
    from zoi_spark import text as ztext

    rows = [(1, "the cat sat", "en"), (2, "the cat ran", "en"),
            (3, "the dog sat", "de"), (4, "unrelated words", "fr")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {(r.group_a, r.group_b): (r.n_common, r.n_a, r.n_b,
                                    r.jaccard_micro)
           for r in ztext.vocab_overlap(df).collect()}
    # en={the,cat,sat,ran}, de={the,dog,sat}: common {the,sat}=2,
    # union 5 -> 0.4; fr shares nothing -> absent
    assert out == {("de", "en"): (2, 3, 4, 400000)}


def test_embedding_norm_qc_gates(spark):
    from zoi_spark import similarity

    rows = [(0, [3.0, 4.0], "a"),        # norm 5
            (1, [0.0, 0.0], "a"),        # zero norm
            (2, None, "a"),              # NULL vector
            (3, [1.0, 0.0, 0.0], "b"),   # dim drift vs id 4
            (4, [float("nan"), 1.0], "b")]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string")
    out = {r.group: r for r in
           similarity.embedding_norm_qc(df, group_col="label").collect()}
    a, b = out["a"], out["b"]
    assert (a.n_vecs, a.n_null, a.n_zero_norm, a.n_nan) == (2, 1, 1, 0)
    assert (a.dim_min, a.dim_max) == (2, 2)
    assert (a.norm_min, a.norm_max, a.norm_avg) == (0.0, 5.0, 2.5)
    assert (b.dim_min, b.dim_max) == (2, 3)
    assert b.n_nan == 1


def test_covariance_pairs_hand_matrix(spark):
    import numpy as np

    from zoi_spark import similarity

    vs = [[1.0, 2.0], [3.0, 0.0], [5.0, 4.0], [7.0, 2.0]]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vs)],
                               "vec_id long, embedding array<double>")
    out = {(r.i, r.j): r.cov for r in
           similarity.covariance_pairs(df).collect()}
    m = np.array(vs)
    exp = np.cov(m, rowvar=False, bias=True)  # population covariance
    assert set(out) == {(0, 0), (0, 1), (1, 1)}
    for (i, j), c in out.items():
        assert abs(c - exp[i][j]) < 1e-9


def test_rrf_topk_rank_fusion(spark):
    from zoi_spark import similarity

    # query [1,0]; corpus: id1 same direction (cos rank 1) but FAR in
    # L2; id2 near in L2 but orthogonal-ish; id3 both-bad
    corpus = spark.createDataFrame(
        [(1, [100.0, 0.0]), (2, [1.0, 1.0]), (3, [-1.0, 50.0])],
        "vec_id long, embedding array<double>")
    qs = spark.createDataFrame([(0, [1.0, 0.0])],
                               "query_id long, embedding array<double>")
    out = {r.vec_id: r for r in
           similarity.rrf_topk(corpus, qs, k=3).collect()}
    assert out[1].rank_cos == 1 and out[1].rank_l2 == 3
    assert out[2].rank_l2 == 1
    # id2 fuses best: ranks (2,1) -> 1/62+1/61 vs id1 (1,3) -> 1/61+1/63
    assert out[2].rank == 1 and out[1].rank == 2
    assert out[2].rrf_micro == round((1 / 62 + 1 / 61) * 1e6)


def test_pq_topk_matches_numpy_adc(spark):
    import numpy as np

    from zoi_spark import similarity

    rng = np.random.RandomState(7)
    vs = rng.randn(12, 8).round(3)
    corpus = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vs)],
        "vec_id long, embedding array<double>")
    qs = spark.createDataFrame([(0, vs[0].tolist())],
                               "query_id long, embedding array<double>")
    out = similarity.pq_topk(corpus, qs, k=3, m=2, ksub=4, seed=1)
    rows = {r.vec_id: r for r in out.collect()}
    assert len(rows) == 3 and all(r.rank in (1, 2, 3)
                                  for r in rows.values())
    # hand-recompute ADC for every corpus vector with the same books
    books = np.array(similarity.pq_codebooks(8, m=2, ksub=4, seed=1))
    q = vs[0]
    expect = {}
    for i, v in enumerate(vs[1:], start=1):
        adc = 0.0
        for s in range(2):
            sub_v, sub_q = v[s * 4:(s + 1) * 4], q[s * 4:(s + 1) * 4]
            d2 = [round(float(np.sum(sub_v**2) + np.sum(c**2)
                              - 2 * np.dot(sub_v, c)), 9)
                  for c in books[s]]
            code = int(np.argmin(d2))
            dq = round(float(np.sum(sub_q**2) + np.sum(books[s][code]**2)
                             - 2 * np.dot(sub_q, books[s][code])), 9)
            adc += dq
        expect[i] = round(adc, 6)
    want = sorted(expect.items(), key=lambda kv: (kv[1], kv[0]))[:3]
    assert [(r.vec_id, r.adc) for r in
            sorted(rows.values(), key=lambda r: r.rank)] == want


def test_ppjoin_pairs_exact_and_pruned(spark):
    from zoi_spark import dedup

    rows = [(1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),      # J=1 with 1
            (3, "alpha beta gamma delta zeta"),          # J=4/6 with 1
            (4, "umlaut totally different words here"),
            (5, "x")]                                    # length filter
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.id_a, r.id_b): r for r in
           dedup.ppjoin_pairs(df, threshold=0.8).collect()}
    assert list(out) == [(1, 2)]
    assert (out[(1, 2)].n_common, out[(1, 2)].jaccard) == (5, 1.0)
    # at 0.6 the (1,3)/(2,3) pairs clear the bar too
    low = {(r.id_a, r.id_b) for r in
           dedup.ppjoin_pairs(df, threshold=0.6).collect()}
    assert low == {(1, 2), (1, 3), (2, 3)}


class TestMultiSignalClusters:
    def test_union_of_evidence_and_signal_rollup(self, spark):
        from zoi_spark import dedup
        jac = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        url = spark.createDataFrame([(2, 3), (10, 11)],
                                    "id_a long, id_b long")
        out = {r["cluster_id"]: r for r in dedup.multi_signal_clusters(
            {"jaccard": jac, "url": url}).collect()}
        # 1-2 (jaccard) and 2-3 (url) merge into one cluster rooted at 1
        assert out[1]["n_docs"] == 3
        assert out[1]["n_pairs"] == 2
        assert list(out[1]["signals"]) == ["jaccard", "url"]
        # 10-11 is url-only evidence
        assert out[10]["n_docs"] == 2
        assert list(out[10]["signals"]) == ["url"]

    def test_same_pair_in_two_signals_counts_once(self, spark):
        from zoi_spark import dedup
        p = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        row = dedup.multi_signal_clusters({"a": p, "b": p}).collect()[0]
        assert row["n_pairs"] == 1
        assert list(row["signals"]) == ["a", "b"]

    def test_empty_signals_rejected(self, spark):
        from zoi_spark import dedup
        with pytest.raises(ValueError):
            dedup.multi_signal_clusters({})


class TestBlockingProfile:
    def test_hand_pair_work_and_cap(self, spark):
        from zoi_spark import dedup
        rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)]
        df = spark.createDataFrame(rows, "block string")
        r = dedup.blocking_profile(df, block_col="block",
                                   max_block_size=3).collect()[0]
        assert r["n_blocks"] == 3 and r["n_rows"] == 9
        assert r["max_block_size"] == 5
        assert r["top_block"] == "a"
        assert r["pair_work"] == 10 + 3 + 0  # 5C2 + 3C2 + 1C2
        assert r["top_block_pairwork_share"] == pytest.approx(
            10 / 13, abs=1e-6)
        assert r["capped_pair_work"] == 3  # only the size-3 block fits
        assert r["capped_share"] == pytest.approx(3 / 13, abs=1e-6)

    def test_no_cap_means_full_work(self, spark):
        from zoi_spark import dedup
        df = spark.createDataFrame([("x",)] * 4, "block string")
        r = dedup.blocking_profile(df, block_col="block").collect()[0]
        assert r["pair_work"] == 6 and r["capped_pair_work"] == 6
        assert r["capped_share"] == pytest.approx(1.0)


class TestResolveChains:
    def test_chain_collapses_to_terminal(self, spark):
        # 1->2->3->4 and 9->8; 4 and 8 are terminal
        rows = [(1, 2), (2, 3), (3, 4), (9, 8)]
        df = spark.createDataFrame(rows, "src long, dst long")
        out = {r["src"]: (r["resolved"], r["is_terminal"])
               for r in graph.resolve_chains(df).collect()}
        assert out == {1: (4, True), 2: (4, True), 3: (4, True),
                       9: (8, True)}

    def test_cycle_is_reported_not_spun(self, spark):
        # a 3-cycle: nothing terminates; is_terminal False everywhere
        rows = [(1, 2), (2, 3), (3, 1)]
        df = spark.createDataFrame(rows, "src long, dst long")
        out = graph.resolve_chains(df, rounds=3).collect()
        assert len(out) == 3
        assert all(r["is_terminal"] is False for r in out)

    def test_doubling_resolves_long_chain_in_log_rounds(self, spark):
        # a 40-hop chain resolves with rounds=6 (2^6=64 >= 40)
        rows = [(i, i + 1) for i in range(40)]
        df = spark.createDataFrame(rows, "src long, dst long")
        out = {r["src"]: r["resolved"]
               for r in graph.resolve_chains(df, rounds=6).collect()}
        assert out[0] == 40 and out[39] == 40

    def test_non_functional_input_deduped_to_min(self, spark):
        rows = [(1, 5), (1, 3)]  # min dst 3 wins, deterministically
        df = spark.createDataFrame(rows, "src long, dst long")
        out = graph.resolve_chains(df).collect()
        assert len(out) == 1 and out[0]["resolved"] == 3


def test_jaro_winkler_kernel_matches_duckdb():
    """The pandas JW kernel must be value-identical to DuckDB's
    jaro_winkler_similarity (the oracle scorer) on the adversarial
    cases: transpositions, window misses, repeated chars, empties,
    sub-boost-threshold scores (no prefix bonus below jaro 0.7)."""
    import duckdb
    import pandas as pd
    from zoi_spark.dedup import _jaro_winkler_batch

    cases = [("martha", "marhta"), ("dixon", "dicksonx"),
             ("abc", "abc"), ("", "x"), ("a", "b"), ("ab", "ba"),
             ("hello world", "hello wrld"), ("DWAYNE", "DUANE"),
             ("aaaa", "aaa"), ("prefixmatch", "prefixmatcx"),
             ("zzzz", "zzyz"), ("abcdefgh", "hgfedcba")]
    a = pd.Series([c[0] for c in cases])
    b = pd.Series([c[1] for c in cases])
    got = _jaro_winkler_batch(a, b).tolist()
    for (s1, s2), g in zip(cases, got):
        want = duckdb.sql(
            f"select jaro_winkler_similarity('{s1}', '{s2}')"
        ).fetchall()[0][0]
        assert g == pytest.approx(want, abs=1e-12), (s1, s2)


def test_jaro_winkler_pairs_blocking_and_threshold(spark):
    from zoi_spark import dedup
    rows = [(1, "shared prefix alpha beta gamma"),
            (2, "shared prefix alpha beta gamma!"),   # near-dup of 1
            (3, "shared prefix totally different tail xyz"),
            (4, "other block entirely")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.id_a, r.id_b): r.jw for r in dedup.jaro_winkler_pairs(
        df, threshold=0.9, key_len=40, block_prefix=8).collect()}
    assert (1, 2) in out and out[(1, 2)] > 0.97
    # cross-block pair (1,4) never scored; low-sim in-block pair
    # (1,3) scored but filtered by the threshold
    assert all(k[0] != 4 and k[1] != 4 for k in out)


def test_jaro_winkler_pairs_mega_block_cap(spark):
    from zoi_spark import dedup
    rows = [(i, "same one text") for i in range(5)] + \
        [(10, "rare pre text a"), (11, "rare pre text b")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.id_a, r.id_b) for r in dedup.jaro_winkler_pairs(
        df, threshold=0.9, key_len=40, block_prefix=8,
        max_block_size=3).collect()}
    # the 5-doc block exceeds the cap and is excluded wholesale;
    # the 2-doc block survives
    assert out == {(10, 11)}


class TestEffectiveDim:
    def test_isotropic_uses_all_dims(self, spark):
        from zoi_spark import similarity as sim
        import random
        rng = random.Random(171)
        rows = [([rng.gauss(0, 1) for _ in range(8)],)
                for _ in range(2000)]
        df = spark.createDataFrame(rows, "embedding array<double>")
        out = sim.effective_dim(df).collect()[0]
        assert out["d"] == 8
        assert out["pr_effective_dim"] > 7.0
        assert out["n_dead_dims"] == 0

    def test_dead_and_dominant_dims(self, spark):
        from zoi_spark import similarity as sim
        import random
        rng = random.Random(172)
        # dim0 dominant, dims 2-7 constant (dead)
        rows = [([rng.gauss(0, 10), rng.gauss(0, 1)]
                 + [0.5] * 6,) for _ in range(2000)]
        df = spark.createDataFrame(rows, "embedding array<double>")
        out = sim.effective_dim(df).collect()[0]
        assert out["n_dead_dims"] == 6
        assert out["pr_effective_dim"] < 1.3
        assert out["top_var_share"] > 0.95


class TestAnisotropy:
    def test_identical_vectors_cos_one(self, spark):
        from zoi_spark import similarity as sim
        rows = [([1.0, 2.0, 2.0],)] * 50
        df = spark.createDataFrame(rows, "embedding array<double>")
        out = sim.anisotropy(df).collect()[0]
        assert out["mean_cosine"] == 1.0
        assert out["mean_norm"] == 3.0

    def test_matches_bruteforce_pairs(self, spark):
        from zoi_spark import similarity as sim
        import random, math
        rng = random.Random(173)
        vecs = [[rng.gauss(0, 1) for _ in range(5)]
                for _ in range(40)]
        df = spark.createDataFrame([(v,) for v in vecs],
                                   "embedding array<double>")
        out = sim.anisotropy(df).collect()[0]
        unit = []
        for v in vecs:
            nm = math.sqrt(sum(x * x for x in v))
            unit.append([x / nm for x in v])
        tot, cnt = 0.0, 0
        for i in range(40):
            for k in range(40):
                if i != k:
                    tot += sum(a * b for a, b in
                               zip(unit[i], unit[k]))
                    cnt += 1
        assert abs(out["mean_cosine"] - tot / cnt) < 1e-6


class TestNormLengthBias:
    def test_planted_bias_detected(self, spark):
        from zoi_spark import similarity as sim
        import random
        rng = random.Random(174)
        emb_rows, doc_rows = [], []
        for i in range(500):
            ln = rng.randrange(50, 1000)
            scale = 0.01 * ln                  # norm grows with len
            emb_rows.append((i, [scale * rng.gauss(0, 1)
                                 for _ in range(4)]))
            doc_rows.append((i, ln))
        e = spark.createDataFrame(
            emb_rows, "vec_id long, embedding array<double>")
        d = spark.createDataFrame(doc_rows, "doc_id long, n_chars long")
        out = sim.norm_length_bias(e, d).collect()[0]
        assert out["pearson_r"] > 0.7
        assert out["slope_per_kchar"] > 0

    def test_unbiased_near_zero(self, spark):
        from zoi_spark import similarity as sim
        import random
        rng = random.Random(175)
        emb_rows = [(i, [rng.gauss(0, 1) for _ in range(4)])
                    for i in range(500)]
        doc_rows = [(i, rng.randrange(50, 1000)) for i in range(500)]
        e = spark.createDataFrame(
            emb_rows, "vec_id long, embedding array<double>")
        d = spark.createDataFrame(doc_rows, "doc_id long, n_chars long")
        out = sim.norm_length_bias(e, d).collect()[0]
        assert abs(out["pearson_r"]) < 0.15


class TestLabelRetrievalEval:
    def test_separable_labels_perfect(self, spark):
        from zoi_spark import similarity as sim
        import random
        rng = random.Random(181)
        rows = []
        for i in range(60):
            lb = i % 3
            center = [10.0 * (lb == j) for j in range(3)]
            rows.append((i, [c + rng.gauss(0, 0.1) for c in center],
                         lb))
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int")
        out = sim.label_retrieval_eval(df, k=5,
                                       n_queries=10).collect()[0]
        assert out["precision_at_k"] == 1.0
        assert out["mrr"] == 1.0
        assert out["coverage_at_k"] == 1.0

    def test_random_labels_near_base_rate(self, spark):
        from zoi_spark import similarity as sim
        import random
        rng = random.Random(182)
        rows = [(i, [rng.gauss(0, 1) for _ in range(6)], i % 4)
                for i in range(200)]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int")
        out = sim.label_retrieval_eval(df, k=10,
                                       n_queries=20).collect()[0]
        assert 0.1 < out["precision_at_k"] < 0.45   # base rate .25


class TestClusterValidity:
    def test_tight_separated_clusters(self, spark):
        from zoi_spark import similarity as sim
        import random
        rng = random.Random(183)
        rows = []
        for i in range(300):
            lb = i % 3
            rows.append(([20.0 * lb + rng.gauss(0, 0.5),
                          rng.gauss(0, 0.5)], lb))
        df = spark.createDataFrame(
            rows, "embedding array<double>, label int")
        out = sim.cluster_validity(df).collect()[0]
        assert out["ch_index"] > 1000
        assert out["db_index"] < 0.2

    def test_random_labels_poor_indices(self, spark):
        from zoi_spark import similarity as sim
        import random
        rng = random.Random(184)
        rows = [([rng.gauss(0, 1), rng.gauss(0, 1)], i % 3)
                for i in range(300)]
        df = spark.createDataFrame(
            rows, "embedding array<double>, label int")
        out = sim.cluster_validity(df).collect()[0]
        assert out["ch_index"] < 5
        assert out["db_index"] > 3


class TestLabelConfusability:
    def test_aligned_centroids_high_cosine(self, spark):
        from zoi_spark import similarity as sim
        rows = ([([1.0, 0.0], 0)] * 10 + [([0.9, 0.1], 1)] * 10
                + [([0.0, 1.0], 2)] * 10)
        df = spark.createDataFrame(
            rows, "embedding array<double>, label int")
        out = {(r["label_a"], r["label_b"]): r["centroid_cosine"]
               for r in sim.label_confusability(df).collect()}
        assert out[(0, 1)] > 0.99              # near-duplicate dirs
        assert out[(0, 2)] < 0.1               # orthogonal
        assert len(out) == 3                   # C(3,2)


class TestHopkins:
    def _clustered(self, spark):
        # two tight blobs far apart in 4-d
        rows = []
        for i in range(30):
            base = 0.0 if i % 2 == 0 else 100.0
            rows.append((i, [base + (i % 5) * 0.01] * 4))
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def test_clustered_cloud_above_half(self, spark):
        from zoi_spark import similarity as sim
        df = self._clustered(spark)
        out = sim.hopkins_statistic(df, m=16).collect()[0]
        assert out["hopkins"] > 0.8        # blobs: uniforms land far
        assert out["n"] == 30 and out["m"] == 16

    def test_grid_cloud_near_half(self, spark):
        from zoi_spark import similarity as sim
        rows = [(i, [float(i % 6), float(i // 6)])
                for i in range(36)]
        df = spark.createDataFrame(rows,
                                   "vec_id long, embedding array<float>")
        out = sim.hopkins_statistic(df, m=12).collect()[0]
        assert 0.1 < out["hopkins"] < 0.75   # space-filling ≈ noise

    def test_deterministic(self, spark):
        from zoi_spark import similarity as sim
        df = self._clustered(spark)
        a = sim.hopkins_statistic(df, m=16).collect()[0]
        b = sim.hopkins_statistic(df, m=16).collect()[0]
        assert a == b


class TestTwoNN:
    def test_hand_line_case(self, spark):
        from zoi_spark import similarity as sim
        import math
        pts = {0: 0.0, 1: 1.0, 2: 3.0, 3: 7.0}
        rows = [(i, [x, 0.0]) for i, x in pts.items()]
        df = spark.createDataFrame(rows,
                                   "vec_id long, embedding array<float>")
        out = sim.twonn_intrinsic_dim(df, m=10).collect()[0]
        # mus: A 3/1, B 2/1, C 3/2, D 6/4 -> sum ln = ln(3*2*1.5*1.5)
        s = math.log(3) + math.log(2) + 2 * math.log(1.5)
        assert out["n_probes"] == 4 and out["n_dropped"] == 0
        assert out["intrinsic_dim"] == round(4 / s, 6)
        assert out["mean_mu"] == round((3 + 2 + 1.5 + 1.5) / 4, 6)

    def test_duplicate_points_dropped(self, spark):
        from zoi_spark import similarity as sim
        rows = [(0, [0.0, 0.0]), (1, [0.0, 0.0]),
                (2, [1.0, 0.0]), (3, [3.0, 0.0])]
        df = spark.createDataFrame(rows,
                                   "vec_id long, embedding array<float>")
        out = sim.twonn_intrinsic_dim(df, m=10).collect()[0]
        # vec 0 and 1 coincide: r1 = 0 -> both dropped
        assert out["n_probes"] == 2
        assert out["n_dropped"] == 2


class TestKCenterPrototypes:
    def test_matches_reference_greedy(self, spark):
        from zoi_spark import similarity as sim
        import hashlib, math
        pts = {1: (0.0, 0.0), 2: (10.0, 0.0), 3: (0.0, 10.0),
               4: (1.0, 1.0), 5: (9.0, 1.0)}
        rows = [(i, [x, y]) for i, (x, y) in pts.items()]
        df = spark.createDataFrame(rows,
                                   "vec_id long, embedding array<float>")
        out = sim.kcenter_prototypes(df, k=3,
                                     sample_m=10).collect()
        # reference greedy in plain python
        md5 = lambda i: hashlib.md5(str(i).encode()).hexdigest()
        dist = lambda a, b: math.dist(pts[a], pts[b])
        start = min(pts, key=md5)
        chosen = [start]
        mind = {i: dist(i, start) for i in pts}
        expect = [(0, start, None)]
        for step in (1, 2):
            far = max(pts, key=lambda i: (mind[i], -i))
            expect.append((step, far, round(mind[far], 6)))
            for i in pts:
                mind[i] = min(mind[i], dist(i, far))
            chosen.append(far)
        got = [(r["step"], r["id"], r["radius"]) for r in out]
        assert got == expect

    def test_radius_non_increasing(self, spark):
        from zoi_spark import similarity as sim
        rows = [(i, [float(i % 7), float(i // 7)])
                for i in range(30)]
        df = spark.createDataFrame(rows,
                                   "vec_id long, embedding array<float>")
        out = sim.kcenter_prototypes(df, k=5,
                                     sample_m=30).collect()
        radii = [r["radius"] for r in out if r["radius"] is not None]
        assert radii == sorted(radii, reverse=True)
        assert len(set(r["id"] for r in out)) == 5


class TestDunnIndex:
    def test_separated_clusters_high(self, spark):
        from zoi_spark import similarity as sim
        rows = ([(i, [0.0 + (i % 3) * 0.1, 0.0], 0)
                 for i in range(10)]
                + [(100 + i, [50.0 + (i % 3) * 0.1, 0.0], 1)
                   for i in range(10)])
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int")
        out = sim.dunn_index(df, sample_m=50).collect()[0]
        assert out["dunn"] > 100          # gap 50 vs diameter 0.2
        assert out["n_labels"] == 2

    def test_touching_clusters_low(self, spark):
        from zoi_spark import similarity as sim
        rows = ([(i, [float(i), 0.0], 0) for i in range(5)]
                + [(100 + i, [4.5 + i, 0.0], 1) for i in range(5)])
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int")
        out = sim.dunn_index(df, sample_m=50).collect()[0]
        # clusters overlap: min inter gap 0.5 << diameter 4
        assert out["dunn"] < 0.2
        assert out["min_inter"] == 0.5


class TestTripletAccuracy:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int")

    def test_separated_labels_perfect(self, spark):
        from zoi_spark import similarity as sim
        rows = ([(i, [0.0 + i * 0.01, 0.0], 0) for i in range(10)]
                + [(100 + i, [50.0 + i * 0.01, 0.0], 1)
                   for i in range(10)])
        out = sim.triplet_accuracy(self._df(spark, rows),
                                   m=20).collect()[0]
        assert out["accuracy"] == 1.0
        assert out["mean_margin"] > 40

    def test_interleaved_labels_poor(self, spark):
        from zoi_spark import similarity as sim
        rows = [(i, [float(i), 0.0], i % 2) for i in range(20)]
        out = sim.triplet_accuracy(self._df(spark, rows),
                                   m=20).collect()[0]
        # neighbors always carry the OTHER label on this lattice
        assert out["accuracy"] == 0.0
        assert out["mean_margin"] < 0


class TestCKADimHalves:
    def test_duplicated_halves_one(self, spark):
        from zoi_spark import similarity as sim
        rows = [(i, [float(i % 7), float(i // 7)] * 2)
                for i in range(30)]
        df = spark.createDataFrame(rows,
                                   "vec_id long, embedding array<float>")
        out = sim.cka_dim_halves(df, m=30).collect()[0]
        assert out["cka"] == 1.0              # identical geometry

    def test_independent_halves_low(self, spark):
        from zoi_spark import similarity as sim
        # first half varies with i%5, second with an md5-derived
        # pattern uncorrelated with it
        import hashlib
        h = lambda i: int(hashlib.md5(str(i).encode())
                          .hexdigest()[:4], 16) % 11
        rows = [(i, [float(i % 5), 0.0, float(h(i)), 0.0])
                for i in range(40)]
        df = spark.createDataFrame(rows,
                                   "vec_id long, embedding array<float>")
        out = sim.cka_dim_halves(df, m=40).collect()[0]
        assert out["cka"] < 0.3


class TestC2ST:
    def test_same_distribution_near_half(self, spark):
        from zoi_spark import similarity as sim
        import hashlib
        h = lambda i, j: int(hashlib.md5(f"{i}:{j}".encode())
                             .hexdigest()[:6], 16) % 1000 / 1000.0
        rows = [(i, [h(i, 0), h(i, 1), h(i, 2)]) for i in range(80)]
        df = spark.createDataFrame(rows,
                                   "vec_id long, embedding array<float>")
        out = sim.c2st_1nn(df, m=80).collect()[0]
        assert 0.25 <= out["accuracy"] <= 0.75
        assert abs(out["z"]) < 4.5

    def test_shifted_halves_detected(self, spark):
        from zoi_spark import similarity as sim
        rows = [(i, [float(i % 7) + (0.0 if i % 2 == 0 else 100.0),
                     0.0]) for i in range(60)]
        df = spark.createDataFrame(rows,
                                   "vec_id long, embedding array<float>")
        out = sim.c2st_1nn(df, m=60).collect()[0]
        assert out["accuracy"] == 1.0
        assert out["z"] > 5


class TestBayesErrorBound:
    def test_clean_labels_zero(self, spark):
        from zoi_spark import similarity as sim
        rows = ([(i, [0.0 + i * 0.01, 0.0], 0) for i in range(10)]
                + [(100 + i, [50.0 + i * 0.01, 0.0], 1)
                   for i in range(10)])
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int")
        out = sim.bayes_error_bound(df, m=20).collect()[0]
        assert out["nn_error"] == 0.0
        assert out["bayes_lo"] == 0.0 and out["bayes_hi"] == 0.0

    def test_hopeless_labels_high(self, spark):
        from zoi_spark import similarity as sim
        rows = [(i, [float(i), 0.0], i % 2) for i in range(20)]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int")
        out = sim.bayes_error_bound(df, m=20).collect()[0]
        assert out["nn_error"] == 1.0     # lattice alternation
        assert out["bayes_lo"] == 0.5


class TestCanopyBlocks:
    def test_two_tight_clusters(self, spark):
        from zoi_spark import similarity as sim
        rows = ([(i, [0.0 + (i % 4) * 0.1, 0.0])
                 for i in range(10)]
                + [(100 + i, [50.0 + (i % 4) * 0.1, 0.0])
                   for i in range(10)])
        df = spark.createDataFrame(rows,
                                   "vec_id long, embedding array<float>")
        out = sim.canopy_blocks(df, t2=1.0,
                                max_centers=6).collect()
        # two canopies absorb everything; terminal row shows 0 left
        assert len(out) == 3
        assert [r["n_assigned"] for r in out[:2]] == [10, 10]
        assert out[2]["center_id"] is None
        assert out[2]["n_assigned"] == 0
        assert out[2]["step"] == 2

    def test_cap_leaves_remainder(self, spark):
        from zoi_spark import similarity as sim
        rows = [(i, [float(i * 10), 0.0]) for i in range(10)]
        df = spark.createDataFrame(rows,
                                   "vec_id long, embedding array<float>")
        out = sim.canopy_blocks(df, t2=1.0,
                                max_centers=3).collect()
        assert len(out) == 4                  # 3 canopies + rest
        assert all(r["n_assigned"] == 1 for r in out[:3])
        assert out[3]["n_assigned"] == 7


class TestLOFOutliers:
    def test_isolated_point_tops(self, spark):
        from zoi_spark import similarity as sim
        rows = [(i, [float(i % 5) * 0.2, float(i // 5) * 0.2])
                for i in range(25)]
        rows.append((999, [50.0, 50.0]))
        df = spark.createDataFrame(rows,
                                   "vec_id long, embedding array<float>")
        out = sim.lof_outliers(df, k=5, sample_m=50,
                               top=3).collect()
        assert out[0]["id"] == 999
        assert out[0]["lof"] > 5
        assert out[1]["lof"] < 2             # grid points are fine

    def test_uniform_grid_near_one(self, spark):
        from zoi_spark import similarity as sim
        rows = [(i, [float(i % 6), float(i // 6)])
                for i in range(36)]
        df = spark.createDataFrame(rows,
                                   "vec_id long, embedding array<float>")
        out = sim.lof_outliers(df, k=5, sample_m=40,
                               top=5).collect()
        assert all(0.8 <= r["lof"] <= 1.6 for r in out)


class TestDBSCANLabels:
    def test_cluster_plus_scatter(self, spark):
        from zoi_spark import similarity as sim
        rows = [(i, [float(i % 5) * 0.2, float(i // 5) * 0.2])
                for i in range(25)]
        rows += [(100, [50.0, 0.0]), (101, [80.0, 0.0]),
                 (102, [0.0, 70.0])]
        df = spark.createDataFrame(rows,
                                   "vec_id long, embedding array<float>")
        out = sim.dbscan_labels(df, eps=1.0, min_pts=5,
                                sample_m=50).collect()[0]
        assert out["m"] == 28
        assert out["n_noise"] == 3
        assert out["n_core"] + out["n_border"] == 25
        assert out["noise_share"] == round(3 / 28, 6)

    def test_tight_eps_all_noise(self, spark):
        from zoi_spark import similarity as sim
        rows = [(i, [float(i * 10), 0.0]) for i in range(12)]
        df = spark.createDataFrame(rows,
                                   "vec_id long, embedding array<float>")
        out = sim.dbscan_labels(df, eps=1.0, min_pts=3,
                                sample_m=20).collect()[0]
        assert out["n_noise"] == 12 and out["n_core"] == 0


class TestRichClub:
    def test_clique_of_hubs(self, spark):
        from zoi_spark import graph
        # 4-clique (each degree >= 3) plus a pendant leaf per node
        edges = [(a, b) for a in range(4) for b in range(4) if a < b]
        edges += [(i, 10 + i) for i in range(4)]
        df = spark.createDataFrame(edges, "src long, dst long")
        out = {r["k"]: r for r in graph.rich_club(
            df, thresholds=(2, 4)).collect()}
        # d>2: exactly the clique (degree 4 = 3 club + 1 pendant)
        assert out[2]["n_nodes"] == 4
        assert out[2]["phi"] == 1.0
        assert out[4]["n_nodes"] == 0 and out[4]["phi"] is None

    def test_star_no_club(self, spark):
        from zoi_spark import graph
        edges = [(0, i) for i in range(1, 9)]
        df = spark.createDataFrame(edges, "src long, dst long")
        out = {r["k"]: r for r in graph.rich_club(
            df, thresholds=(2,)).collect()}
        assert out[2]["n_nodes"] == 1        # only the hub
        assert out[2]["phi"] is None         # no pair to wire


class TestHubness:
    def test_center_point_hub(self, spark):
        from zoi_spark import similarity as sim
        import math
        # 10 points on a circle: 1-step chords 6.18, 2-step 11.76,
        # so the center (distance 10) is everyone's 3rd neighbor
        rows = [(i, [10 * math.cos(2 * math.pi * i / 10),
                     10 * math.sin(2 * math.pi * i / 10)])
                for i in range(10)]
        rows.append((999, [0.0, 0.0]))        # universal 3rd NN
        df = spark.createDataFrame(rows,
                                   "vec_id long, embedding array<float>")
        out = sim.hubness(df, k=3, sample_m=30).collect()[0]
        assert out["max_nk"] == 10            # the center saturates
        assert out["skew_nk"] > 1.0

    def test_lattice_balanced(self, spark):
        from zoi_spark import similarity as sim
        rows = [(i, [float(i % 6), float(i // 6)])
                for i in range(36)]
        df = spark.createDataFrame(rows,
                                   "vec_id long, embedding array<float>")
        out = sim.hubness(df, k=3, sample_m=40).collect()[0]
        assert out["share_antihubs"] < 0.3
        assert out["skew_nk"] < 1.5


class TestMetricityAudit:
    def test_euclidean_clean_cosine_flagged(self, spark):
        from zoi_spark import similarity as sim
        # vectors spread over directions AND magnitudes: cosine
        # distance concentrates by angle and breaks triangles
        rows = [(i, [float(1 + i % 5), float(i % 7) - 3.0,
                     float(i % 3)]) for i in range(18)]
        df = spark.createDataFrame(rows,
                                   "vec_id long, embedding array<float>")
        out = sim.metricity_audit(df, sample_m=18).collect()[0]
        assert out["eucl_violations"] == 0     # L2 is a metric
        assert out["n_triples"] == 816         # C(18,3)
        assert 0.0 <= out["cos_violation_share"] <= 1.0
