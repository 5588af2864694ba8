"""Hand-value tests for the wave-37 operators: weighted_jaccard_pairs,
dup_inverse_weights, structure_profile, cluster_consistency_audit."""

from zoi_spark import dedup, text


def test_weighted_jaccard_separates_repetition_profiles(spark):
    # same token SET {a,b}; doc2 stuffs 'a' -> set Jaccard 1.0 but
    # J_w = (min(1,4)+min(1,1)) / (max(1,4)+max(1,1)) = 2/5
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a a a a b"), (3, "a b")],
        "doc_id long, text string")
    out = dedup.weighted_jaccard_pairs(df, threshold=0.3)
    got = {(r.id_a, r.id_b): (r.tot_a, r.tot_b, r.min_mass,
                              r.weighted_jaccard)
           for r in out.collect()}
    assert got[(1, 3)] == (2, 2, 2, 1.0)          # exact dup -> 1.0
    assert got[(1, 2)] == (2, 5, 2, 0.4)
    assert got[(2, 3)] == (5, 2, 2, 0.4)
    # the size-ratio prefilter kills mismatched pairs before the join
    strict = dedup.weighted_jaccard_pairs(df, threshold=0.8)
    got_s = {(r.id_a, r.id_b) for r in strict.collect()}
    assert got_s == {(1, 3)}


def test_dup_inverse_weights_unit_mass_per_content(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "same text"),
         (4, "unique")],
        "doc_id long, text string")
    got = {r.doc_id: (r.n_copies, r.weight, r.is_canonical)
           for r in dedup.dup_inverse_weights(df).collect()}
    assert got[1] == (3, round(1 / 3, 6), True)
    assert got[2] == (3, round(1 / 3, 6), False)
    assert got[4] == (1, 1.0, True)
    # total mass = number of distinct contents
    assert round(sum(w for _, w, _ in got.values()), 4) == 2.0


def test_structure_profile_code_table_bullets(spark):
    code = "```\ndef f(x) {\n    return x;\n}\n```"
    table = "| a | b |\n| 1 | 2 |\n| 3 | 4 |"
    bullets = "- one\n- two\n1. three\nplain"
    prose = "just a plain sentence with no structure at all"
    df = spark.createDataFrame(
        [(1, code), (2, table), (3, bullets), (4, prose)],
        "doc_id long, text string")
    got = {r.doc_id: r for r in text.structure_profile(df).collect()}
    assert (got[1].code_fences, got[1].indent_ratio,
            got[1].is_codeish) == (1, 0.2, True)
    assert (got[2].table_lines, got[2].is_tableish) == (3, True)
    assert got[2].is_codeish is False
    assert got[3].bullet_ratio == 0.75
    assert got[4].n_lines == 1 and not got[4].is_codeish \
        and not got[4].is_tableish


def test_cluster_consistency_audit_detects_bad_labels(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
    good = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "doc_id long, cluster_id long")
    r = dedup.cluster_consistency_audit(pairs, good).collect()[0]
    assert (r.n_pairs, r.n_pair_violations, r.n_docs, r.n_clusters,
            r.max_cluster_size, r.ok) == (3, 0, 5, 2, 3, True)
    # break one label: the 2-3 pair now crosses clusters
    bad = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (10, 10), (11, 10)],
        "doc_id long, cluster_id long")
    r2 = dedup.cluster_consistency_audit(pairs, bad).collect()[0]
    assert (r2.n_pair_violations, r2.ok) == (1, False)


class TestFsLinkageWeights:
    def test_hand_computed_weights(self, spark):
        import math
        import pytest
        from zoi_spark import dedup
        # 2 proxy matches (both agree), 2 non-matches (one agrees)
        rows = [(True, True), (True, True), (True, False),
                (False, False)]
        df = spark.createDataFrame(rows, "a boolean, m boolean")
        r = dedup.fs_linkage_weights(
            df, agree_cols=["a"], proxy_col="m").collect()[0]
        m = (2 + 0.5) / (2 + 1.0)   # 0.833333
        u = (1 + 0.5) / (2 + 1.0)   # 0.5
        assert r["n_match"] == 2 and r["n_nonmatch"] == 2
        assert r["m"] == pytest.approx(m, abs=1e-6)
        assert r["u"] == pytest.approx(u, abs=1e-6)
        assert r["agreement_weight"] == pytest.approx(
            math.log2(m / u), abs=1e-6)
        assert r["disagreement_weight"] == pytest.approx(
            math.log2((1 - m) / (1 - u)), abs=1e-6)

    def test_smoothing_keeps_weights_finite(self, spark):
        from zoi_spark import dedup
        # every proxy match agrees, every non-match disagrees:
        # unsmoothed u=0 would be -inf
        rows = [(True, True), (False, False)]
        df = spark.createDataFrame(rows, "a boolean, m boolean")
        r = dedup.fs_linkage_weights(
            df, agree_cols=["a"], proxy_col="m").collect()[0]
        assert all(v is not None and abs(v) < 100
                   for v in (r["agreement_weight"],
                             r["disagreement_weight"]))

    def test_empty_agree_cols_raise(self, spark):
        import pytest as _pt
        from zoi_spark import dedup
        df = spark.createDataFrame([(True,)], "m boolean")
        with _pt.raises(ValueError):
            dedup.fs_linkage_weights(df, agree_cols=[], proxy_col="m")


class TestCdcChunks:
    def test_chunks_reassemble_to_text(self, spark):
        from pyspark.sql import functions as F
        from zoi_spark import dedup
        texts = [(1, "hello world " * 30), (2, "abc"),
                 (3, "x" * 7)]  # 3: shorter than window+1 -> 1 chunk
        df = spark.createDataFrame(texts, "doc_id long, text string")
        rows = dedup.cdc_chunks(df).orderBy("id", "chunk_idx").collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["id"], []).append(r)
        # chunk lengths per doc sum to the text length, in order
        for doc_id, text in texts:
            assert sum(r["chunk_len"] for r in by_doc[doc_id]) \
                == len(text)
        assert len(by_doc[3]) == 1  # no full window -> whole text

    def test_shared_passage_detected_despite_insertion(self, spark):
        from zoi_spark import dedup
        # same long passage, one copy with a prefix insertion that
        # would break fixed-offset blocking
        passage = ("the quick brown fox jumps over the lazy dog "
                   * 20)
        df = spark.createDataFrame(
            [(1, passage), (2, "INSERTED PREFIX >>> " + passage)],
            "doc_id long, text string")
        shared = dedup.cdc_shared_chunks(
            df, window=8, boundary_nibbles=1).collect()
        assert any(r["n_docs"] == 2 and r["chunk_len"] > 8
                   for r in shared)

    def test_boundary_decision_is_local(self, spark):
        # identical texts chunk identically: same hashes, same counts
        from zoi_spark import dedup
        t = "deterministic chunking text " * 15
        df = spark.createDataFrame([(1, t), (2, t)],
                                   "doc_id long, text string")
        out = dedup.cdc_shared_chunks(df, boundary_nibbles=1).collect()
        assert all(r["n_docs"] == 2 for r in out)
        assert sum(r["n_occurrences"] for r in out) % 2 == 0


class TestGearCdcArrow:
    def test_chunks_reassemble_to_utf8_bytes(self, spark):
        from zoi_spark import dedup
        texts = [(1, "hello wörld " * 40), (2, "短い"), (3, "x" * 5)]
        df = spark.createDataFrame(texts, "doc_id long, text string")
        rows = dedup.cdc_chunks(df, engine="arrow") \
            .orderBy("id", "chunk_idx").collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["id"], 0)
            by_doc[r["id"]] += r["chunk_len"]
        for doc_id, text in texts:
            assert by_doc[doc_id] == len(text.encode("utf-8"))

    def test_deterministic_and_duplicate_detecting(self, spark):
        from zoi_spark import dedup
        passage = "the quick brown fox jumps over the dog " * 25
        df = spark.createDataFrame(
            [(1, passage), (2, "PREFIX >>> " + passage)],
            "doc_id long, text string")
        shared = dedup.cdc_shared_chunks(
            df, engine="arrow", boundary_nibbles=1).collect()
        # the shared tail must produce at least one cross-doc chunk
        assert any(r["n_docs"] == 2 and r["chunk_len"] > 8
                   for r in shared)

    def test_engines_agree_on_totals(self, spark):
        # engines cut differently but both must cover every byte of
        # an ASCII corpus exactly once (chars == bytes for ASCII)
        from pyspark.sql import functions as F
        from zoi_spark import dedup
        df = spark.createDataFrame(
            [(i, "abcdefgh" * (10 + i)) for i in range(5)],
            "doc_id long, text string")
        tot_e = dedup.cdc_chunks(df, engine="expr") \
            .agg(F.sum("chunk_len")).first()[0]
        tot_a = dedup.cdc_chunks(df, engine="arrow") \
            .agg(F.sum("chunk_len")).first()[0]
        assert tot_e == tot_a

    def test_rejects_unknown_engine(self, spark):
        import pytest as _pt
        from zoi_spark import dedup
        df = spark.createDataFrame([(1, "abc")],
                                   "doc_id long, text string")
        with _pt.raises(ValueError):
            dedup.cdc_chunks(df, engine="nope").collect()


class TestSimhashBitBias:
    def test_varied_corpus_balanced(self, spark):
        from zoi_spark import dedup
        # ODD token count: with even n the strict-majority rule
        # (ties -> 0) biases every bit share toward 5/16, not 1/2
        rows = [(i, f"alpha{i} beta{i*7} gamma{i*13} delta{i*29} "
                    f"eps{i*31}")
                for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = dedup.simhash_bit_bias(df, hash="md5").collect()[0]
        assert out["n_docs"] == 200
        assert out["max_abs_bias"] < 0.2      # healthy-ish hash
        assert 0 <= out["worst_bit"] < 60

    def test_degenerate_corpus_saturates(self, spark):
        from zoi_spark import dedup
        rows = [(i, "same template text every time")
                for i in range(50)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = dedup.simhash_bit_bias(df, hash="md5").collect()[0]
        # one template -> every doc has the identical fingerprint:
        # every bit share is 0 or 1, bias saturates at 0.5
        assert out["max_abs_bias"] == 0.5
        assert out["mean_abs_bias"] == 0.5
