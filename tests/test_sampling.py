"""Corpus sampling / admission operators: determinism, the two-phase
host-cap equivalence, nested-rate subset laws, incremental admission,
repetition metrics on hand-computable docs, and the exact-vs-sketch
quantile contract."""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from zoi_spark import dedup, sampling, tablechecks, text

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{TESTDATA}/documents.parquet")


# -- hash_sample / stratified_sample ----------------------------------------

def test_hash_sample_deterministic_and_roughly_sized(docs):
    a = sorted(r.doc_id for r in
               sampling.hash_sample(docs, id_col="doc_id", rate=0.5)
               .select("doc_id").collect())
    b = sorted(r.doc_id for r in
               sampling.hash_sample(docs, id_col="doc_id", rate=0.5)
               .select("doc_id").collect())
    n = docs.count()
    assert a == b
    assert 0.3 * n < len(a) < 0.7 * n


def test_hash_sample_nested_rates_are_subsets(docs):
    """rate r1 < r2 ⇒ sample(r1) ⊆ sample(r2) (same key, smaller
    threshold) — the property that makes budget ladders reproducible."""
    s25 = {r.doc_id for r in
           sampling.hash_sample(docs, id_col="doc_id", rate=0.25)
           .select("doc_id").collect()}
    s50 = {r.doc_id for r in
           sampling.hash_sample(docs, id_col="doc_id", rate=0.5)
           .select("doc_id").collect()}
    assert s25 <= s50


def test_hash_sample_rate_bounds():
    with pytest.raises(ValueError):
        sampling._rate_threshold(1.5)
    assert sampling._rate_threshold(0.0) == "00000000"
    assert sampling._rate_threshold(1.0) == "gggggggg"
    assert sampling._rate_threshold(0.5) == "80000000"


def test_hash_sample_rate_one_keeps_everything(docs):
    assert (sampling.hash_sample(docs, id_col="doc_id", rate=1.0).count()
            == docs.count())


def test_hash_sample_salt_decorrelates(docs):
    s1 = {r.doc_id for r in
          sampling.hash_sample(docs, id_col="doc_id", rate=0.5, salt="a")
          .select("doc_id").collect()}
    s2 = {r.doc_id for r in
          sampling.hash_sample(docs, id_col="doc_id", rate=0.5, salt="b")
          .select("doc_id").collect()}
    assert s1 != s2  # independent passes pick different rows


def test_stratified_sample_default_drops_unlisted(docs):
    kept = sampling.stratified_sample(
        docs, id_col="doc_id", stratum_col="lang",
        rates={"en": 1.0}, default_rate=0.0)
    assert kept.where(F.col("lang") != "en").count() == 0
    assert (kept.count()
            == docs.where(F.col("lang") == "en").count())


# -- host_cap ----------------------------------------------------------------

def test_host_cap_two_phase_equals_single_phase(docs):
    plain = sampling.host_cap(docs, host_col="source", id_col="doc_id",
                              cap=3, keep_rank=True)
    salted = sampling.host_cap(docs, host_col="source", id_col="doc_id",
                               cap=3, presalt=4, keep_rank=True)
    key = lambda r: (r.source, r.host_rank, r.doc_id)  # noqa: E731
    assert (sorted(map(key, plain.select("source", "host_rank", "doc_id")
                       .collect()))
            == sorted(map(key, salted.select("source", "host_rank", "doc_id")
                          .collect())))


def test_host_cap_caps_every_host(docs):
    capped = sampling.host_cap(docs, host_col="source", id_col="doc_id",
                               cap=2)
    per_host = capped.groupBy("source").count().collect()
    assert per_host and all(r["count"] <= 2 for r in per_host)


def test_host_cap_rejects_bad_cap(docs):
    with pytest.raises(ValueError):
        sampling.host_cap(docs, host_col="source", id_col="doc_id", cap=0)


# -- incremental_new_docs ----------------------------------------------------

def test_incremental_admission(spark):
    base = spark.createDataFrame(
        [Row(doc_id=i, text=f"base page {i}") for i in range(5)])
    new = spark.createDataFrame(
        [Row(doc_id=100, text="base page 3"),      # re-crawl → rejected
         Row(doc_id=101, text="Base  Page 4 "),    # re-crawl modulo norm
         Row(doc_id=102, text="genuinely new")])
    kept = dedup.incremental_new_docs(new, base)
    assert [r.doc_id for r in kept.collect()] == [102]
    # broadcast variant: identical admission set
    kept_b = dedup.incremental_new_docs(new, base, broadcast_base=True)
    assert [r.doc_id for r in kept_b.collect()] == [102]


def test_incremental_keeps_within_snapshot_dups(spark):
    """Within-snapshot duplicates are exact_dedup's job, not admission's
    — both copies of a new page pass the base filter."""
    base = spark.createDataFrame([Row(doc_id=1, text="old")])
    new = spark.createDataFrame([Row(doc_id=10, text="fresh"),
                                 Row(doc_id=11, text="fresh")])
    assert dedup.incremental_new_docs(new, base).count() == 2


# -- repetition_stats --------------------------------------------------------

def test_repetition_stats_hand_computed(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a a a b"),   # top token a:3/4; bigram "a a":2/3
         Row(doc_id=2, text="w x y z")])  # all distinct
    rows = {r.doc_id: r for r in text.repetition_stats(df).collect()}
    r1 = rows[1]
    assert (r1.n_tokens, r1.n_distinct) == (4, 2)
    assert r1.top_token_frac == 0.75
    assert r1.top_bigram_frac == round(2 / 3, 6)
    r2 = rows[2]
    assert r2.distinct_ratio == 1.0
    assert r2.top_token_frac == 0.25
    assert r2.top_bigram_frac == round(1 / 3, 6)


def test_repetition_stats_degenerate_single_token(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="solo")])
    r = text.repetition_stats(df).collect()[0]
    assert (r.n_tokens, r.n_distinct, r.top_token_frac) == (1, 1, 1.0)
    assert r.top_bigram_frac == 1.0  # single degenerate bigram


# -- column_quantiles --------------------------------------------------------

def test_quantiles_exact_matches_known_values(spark):
    df = spark.createDataFrame([Row(v=float(i)) for i in range(1, 101)])
    r = tablechecks.column_quantiles(df, "v", probs=(0.5,)).collect()[0]
    assert r.q_0_5 == pytest.approx(50.5)


def test_quantiles_sketch_tracks_exact(docs):
    """The percentile_approx sketch (the 10^12-row mode) must land
    within the length distribution's neighborhood of the exact
    per-group answer — the verification-run cross-check."""
    exact = {r.lang: r.q_0_5 for r in tablechecks.column_quantiles(
        docs, "n_chars", probs=(0.5,), by="lang").collect()}
    approx = {r.lang: r.q_0_5 for r in tablechecks.column_quantiles(
        docs, "n_chars", probs=(0.5,), by="lang",
        approx_accuracy=10000).collect()}
    for lang, v in exact.items():
        assert abs(approx[lang] - v) <= max(5.0, 0.05 * v)


# -- pack_sequences ----------------------------------------------------------

def test_pack_sequences_hand_computed(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, toks=t) for i, t in
         enumerate([40, 40, 40, 10, 100, 5])])
    out = sampling.pack_sequences(df, token_col="toks", capacity=100,
                                  order_col="doc_id",
                                  shard_col=F.lit(0))
    bins = {r.doc_id: r.seq_bin for r in out.collect()}
    # cumsum-before: 0,40,80,120,130,230 → //100 = 0,0,0,1,1,2
    assert bins == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 2}


def test_pack_sequences_shards_are_independent(docs):
    out = sampling.pack_sequences(docs, token_col="n_chars", capacity=2000,
                                  order_col="doc_id", n_shards=4)
    # each shard starts its own bin space at 0
    per_shard_min = (out.groupBy("pack_shard")
                     .agg(F.min("seq_bin").alias("m")).collect())
    assert per_shard_min and all(r.m == 0 for r in per_shard_min)
    # bins respect the budget: no bin's START offsets exceed capacity
    # beyond one straddling doc (cumsum-chunking invariant: every doc's
    # pre-sum lies inside its bin's window)
    assert out.where(F.col("seq_bin") < 0).count() == 0


def test_pack_sequences_requires_shard(docs):
    with pytest.raises(ValueError):
        sampling.pack_sequences(docs, token_col="n_chars", capacity=100,
                                order_col="doc_id")


# -- zscore_outliers ---------------------------------------------------------

def test_zscore_outliers_flags_planted_extreme(spark):
    rows = [Row(doc_id=i, lang="en", v=100) for i in range(20)]
    rows[0] = Row(doc_id=0, lang="en", v=100000)           # the outlier
    rows += [Row(doc_id=100 + i, lang="zz", v=7) for i in range(3)]  # σ=0
    df = spark.createDataFrame(rows)
    out = tablechecks.zscore_outliers(df, "v", by="lang", k=2.0,
                                      id_col="doc_id").collect()
    assert [r.doc_id for r in out] == [0]
    assert out[0].rule_id == "v.zscore_outlier"
    # zero-variance stratum emits nothing (no div-by-zero, no rows)
    assert all(r.lang == "en" for r in out)


def test_zscore_outliers_plan_broadcasts_stats(docs):
    out = tablechecks.zscore_outliers(docs, "n_chars", by="lang", k=2.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


# -- dsir_logweights ----------------------------------------------------------

def test_dsir_logweights_prefers_target_like_docs(spark):
    """Docs sharing the target's bigrams must outscore docs that
    don't; counts and determinism hold across re-runs."""
    from zoi_spark import sampling

    cats = [(i, "the small cat sat on the warm mat near the door")
            for i in range(5)]
    dogs = [(10 + i, "ein großer hund lief schnell durch den park heute")
            for i in range(5)]
    df = spark.createDataFrame(cats + dogs, "doc_id long, text string")
    target = df.where("doc_id < 5")
    w = sampling.dsir_logweights(df, target, buckets=64)
    rows = {r.doc_id: r for r in w.collect()}
    assert len(rows) == 10
    assert all(rows[i].n_grams == 10 for i in range(5))   # 11 tokens
    assert all(rows[10 + i].n_grams == 8 for i in range(5))  # 9 tokens
    cat_w = rows[0].dsir_logweight
    dog_w = rows[10].dsir_logweight
    assert cat_w > dog_w                     # target-like docs score higher
    assert all(rows[i].dsir_logweight == cat_w for i in range(5))
    rerun = {r.doc_id: r.dsir_logweight
             for r in sampling.dsir_logweights(df, target,
                                               buckets=64).collect()}
    assert rerun == {i: r.dsir_logweight for i, r in rows.items()}


def test_dsir_logweights_plan_broadcasts_ratio_table(docs):
    from zoi_spark import sampling

    w = sampling.dsir_logweights(docs, docs.where("lang = 'en'"),
                                 buckets=128)
    plan = w._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan       # k-row log-ratio table


def test_hash_split_deterministic_and_leakfree(spark):
    from zoi_spark import sampling

    df = spark.range(0, 4000).withColumnRenamed("id", "doc_id")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = sampling.hash_split(df, id_col="doc_id", weights=w)
    counts = {r["split"]: r["n"] for r in
              a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 4000 - 0.8) < 0.03
    assert abs(counts["val"] / 4000 - 0.1) < 0.02
    # integer weights normalize to the same assignment
    b = sampling.hash_split(df, id_col="doc_id",
                            weights={"train": 8, "val": 1, "test": 1})
    assert a.exceptAll(b).count() == 0
    # a GROWN corpus never reassigns an old doc (leak-free invariant)
    grown = sampling.hash_split(
        spark.range(0, 8000).withColumnRenamed("id", "doc_id"),
        id_col="doc_id", weights=w)
    assert grown.where("doc_id < 4000").exceptAll(a).count() == 0
    # a different salt draws an independent split
    c = sampling.hash_split(df, id_col="doc_id", weights=w, salt="exp2:")
    assert c.exceptAll(a).count() > 0


def test_hash_split_validates_weights(spark):
    from zoi_spark import sampling

    df = spark.range(3).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        sampling.hash_split(df, id_col="doc_id", weights={})
    with pytest.raises(ValueError):
        sampling.hash_split(df, id_col="doc_id", weights={"a": 0.0})
    one = sampling.hash_split(df, id_col="doc_id", weights={"all": 1.0})
    assert {r["split"] for r in one.collect()} == {"all"}


def test_split_boundaries_match_assignment_arithmetic():
    from zoi_spark import sampling

    b = sampling.split_boundaries({"train": 0.8, "val": 0.1, "test": 0.1})
    assert b == [0.8, 0.8 + 0.1]
    # the ulp artifact the boundary export exists for: cumulative float
    # sums are NOT the decimal literals a hand-written oracle would use
    b2 = sampling.split_boundaries({"a": 0.1, "b": 0.2, "c": 0.7})
    assert b2 == [0.1, 0.1 + 0.2]
    assert b2[1] != 0.3               # 0.30000000000000004


def test_recency_weights_half_life(spark):
    import datetime as dt

    rows = [(1, dt.datetime(2026, 1, 8)),    # newest -> weight 1
            (2, dt.datetime(2026, 1, 1)),    # 7 days old -> 0.5
            (3, dt.datetime(2025, 12, 25)),  # 14 days -> 0.25
            (4, None)]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    out = {r.id: r.recency_weight for r in sampling.recency_weights(
        df, ts_col="ts", half_life_days=7.0).collect()}
    assert out[1] == 1.0
    assert out[2] == 0.5
    assert out[3] == 0.25
    assert out[4] is None                    # NULL ts stays NULL


def test_shuffle_shards_deterministic_permutation(docs):
    out = sampling.shuffle_shards(docs.select("doc_id"),
                                  id_col="doc_id", n_shards=8,
                                  seed="t").collect()
    again = sampling.shuffle_shards(docs.select("doc_id"),
                                    id_col="doc_id", n_shards=8,
                                    seed="t").collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    n = docs.count()
    assert len({r.doc_id for r in out}) == n          # a permutation
    assert {r.shard for r in out} <= set(range(8))
    # shard_pos is a dense 1..len rank within each shard
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.shard_pos)
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_shuffle_shards_seed_reshuffles(docs):
    a = {(r.doc_id, r.shard, r.shard_pos) for r in
         sampling.shuffle_shards(docs.select("doc_id"), id_col="doc_id",
                                 n_shards=4, seed="a").collect()}
    b = {(r.doc_id, r.shard, r.shard_pos) for r in
         sampling.shuffle_shards(docs.select("doc_id"), id_col="doc_id",
                                 n_shards=4, seed="b").collect()}
    assert a != b


def test_epoch_factors_hand_computed(spark):
    rows = [("en",)] * 6 + [("de",)] * 3 + [("fr",)] * 1
    df = spark.createDataFrame(rows, "lang string")
    out = {r.lang: r for r in sampling.epoch_factors(
        df, stratum_col="lang",
        targets={"en": 0.5, "de": 0.5}).collect()}
    # N=10; en: ceil(0.5*10/6)=1, de: ceil(0.5*10/3)=2, fr: recipe-less
    assert (out["en"].epoch_factor, out["en"].effective_rows) == (1, 6)
    assert (out["de"].epoch_factor, out["de"].effective_rows) == (2, 6)
    assert out["fr"].target_share is None
    assert (out["fr"].epoch_factor, out["fr"].effective_rows) == (1, 1)
    # budget_multiplier scales the numerator
    out2 = {r.lang: r.epoch_factor for r in sampling.epoch_factors(
        df, stratum_col="lang", targets={"en": 0.5, "de": 0.5},
        budget_multiplier=3.0).collect()}
    assert out2 == {"en": 3, "de": 5, "fr": 1}


def test_epoch_factors_rejects_empty_recipe(spark):
    df = spark.createDataFrame([("en",)], "lang string")
    with pytest.raises(ValueError, match="targets is empty"):
        sampling.epoch_factors(df, stratum_col="lang", targets={})


class TestWeightedSample:
    def test_deterministic_and_heavy_weight_wins(self, spark):
        df = spark.createDataFrame(
            [(1, 1e9), (2, 1e-9), (3, 1e-9)],
            "doc_id long, w double")
        kept = sampling.weighted_sample(
            df, weight_col="w", id_col="doc_id", k=1)
        ids = [r["doc_id"] for r in kept.collect()]
        # ln(u)/1e9 ~ 0- beats ln(u)/1e-9 ~ -inf for any u in (0,1)
        assert ids == [1]
        again = sampling.weighted_sample(
            df, weight_col="w", id_col="doc_id", k=1).collect()
        assert [r["doc_id"] for r in again] == ids

    def test_strata_and_weight_hygiene(self, spark):
        df = spark.createDataFrame(
            [(1, 1.0, "a"), (2, 1.0, "a"), (3, 1.0, "b"),
             (4, 0.0, "b"), (5, None, "b"), (6, -2.0, "b")],
            "doc_id long, w double, g string")
        kept = sampling.weighted_sample(
            df, weight_col="w", id_col="doc_id", k=2, stratum_col="g")
        by_g = {}
        for r in kept.collect():
            by_g.setdefault(r["g"], set()).add(r["doc_id"])
        assert by_g["a"] == {1, 2}
        # zero/NULL/negative weights are dropped before ranking
        assert by_g["b"] == {3}

    def test_k_validated_and_k_exceeds_rows(self, spark):
        df = spark.createDataFrame([(1, 1.0)], "doc_id long, w double")
        with pytest.raises(ValueError):
            sampling.weighted_sample(df, weight_col="w",
                                     id_col="doc_id", k=0)
        assert sampling.weighted_sample(
            df, weight_col="w", id_col="doc_id", k=5).count() == 1


class TestVocabPruneCurve:
    def test_hand_curve(self, spark):
        # corpus: 'a' x5, 'b' x2, 'c' x1 (normalize lowercases)
        df = spark.createDataFrame(
            [("a a A b",), ("a A b c",)], "text string")
        out = {r["min_count"]: r for r in text.vocab_prune_curve(
            df, thresholds=[1, 2, 3, 6]).collect()}
        assert out[1]["vocab_size"] == 3
        assert out[1]["covered_share"] == 1.0
        assert out[2]["vocab_size"] == 2      # a, b survive
        assert out[2]["covered_share"] == 0.875  # 7/8
        assert out[3]["vocab_size"] == 1      # only a
        assert out[3]["covered_share"] == 0.625  # 5/8
        assert out[6]["vocab_size"] == 0
        assert out[6]["covered_share"] == 0.0

    def test_threshold_validation(self, spark):
        df = spark.createDataFrame([("x",)], "text string")
        with pytest.raises(ValueError):
            text.vocab_prune_curve(df, thresholds=[0, 1])


class TestSampleGof:
    def test_unbiased_sampler_z_small(self, spark):
        from pyspark.sql import functions as F
        df = spark.range(20000).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 4).cast("string").alias("g"))
        out = sampling.sample_gof(df, id_col="doc_id", stratum_col="g",
                                  rate=0.2, salt="gof").collect()
        assert len(out) == 4
        for r in out:
            assert r["n"] == 5000
            assert r["expected"] == 1000.0
            assert abs(r["z"]) < 4  # md5 mixes; 4 sigma on 5k draws
            # kept matches the actual sampler output exactly
        kept_total = sum(r["kept"] for r in out)
        assert kept_total == sampling.hash_sample(
            df, id_col="doc_id", rate=0.2, salt="gof").count()

    def test_rate_validated(self, spark):
        import pytest
        df = spark.range(5).withColumnRenamed("id", "doc_id")
        with pytest.raises(ValueError):
            sampling.sample_gof(df, id_col="doc_id", stratum_col="doc_id",
                                rate=1.5)


class TestRakingWeights:
    def test_marginals_converge(self, spark):
        import pytest
        from pyspark.sql import functions as F
        from zoi_spark import sampling
        rows = ([("a", "x")] * 30 + [("a", "y")] * 30
                + [("b", "x")] * 30 + [("b", "y")] * 10)
        df = spark.createDataFrame(rows, "r string, c string")
        out = sampling.raking_weights(
            df, row_col="r", col_col="c",
            row_targets={"a": 0.5, "b": 0.5},
            col_targets={"x": 0.5, "y": 0.5}, rounds=8)
        m = (out.groupBy("row_val")
             .agg(F.sum(F.col("n") * F.col("weight")).alias("mass"))
             .collect())
        tot = sum(r["mass"] for r in m)
        for r in m:
            assert r["mass"] / tot == pytest.approx(0.5, abs=1e-3)
        c = (out.groupBy("col_val")
             .agg(F.sum(F.col("n") * F.col("weight")).alias("mass"))
             .collect())
        for r in c:
            assert r["mass"] / tot == pytest.approx(0.5, abs=1e-3)

    def test_unmatched_value_gets_null_weight(self, spark):
        from zoi_spark import sampling
        df = spark.createDataFrame([("a", "x"), ("q", "x")],
                                   "r string, c string")
        out = {r["row_val"]: r["weight"] for r in
               sampling.raking_weights(
                   df, row_col="r", col_col="c",
                   row_targets={"a": 1.0},
                   col_targets={"x": 1.0}).collect()}
        assert out["q"] is None and out["a"] is not None

    def test_bad_rounds_raise(self, spark):
        import pytest
        from zoi_spark import sampling
        df = spark.createDataFrame([("a", "x")], "r string, c string")
        with pytest.raises(ValueError):
            sampling.raking_weights(df, row_col="r", col_col="c",
                                    row_targets={"a": 1.0},
                                    col_targets={"x": 1.0}, rounds=0)


class TestWeightEss:
    def test_uniform_weights_full_ess(self, spark):
        import pytest
        from zoi_spark import sampling
        df = spark.createDataFrame([(1.0,)] * 8, "w double")
        r = sampling.weight_ess(df, weight_col="w").collect()[0]
        assert r["ess"] == pytest.approx(8.0)
        assert r["deff"] == pytest.approx(1.0)

    def test_dominant_weight_collapses_ess(self, spark):
        import pytest
        from zoi_spark import sampling
        df = spark.createDataFrame([(1000.0,)] + [(0.001,)] * 99,
                                   "w double")
        r = sampling.weight_ess(df, weight_col="w").collect()[0]
        assert r["ess"] == pytest.approx(1.0, abs=0.01)

    def test_nonpositive_excluded_but_counted(self, spark):
        from zoi_spark import sampling
        df = spark.createDataFrame([(1.0,), (0.0,), (-2.0,), (None,)],
                                   "w double")
        r = sampling.weight_ess(df, weight_col="w").collect()[0]
        assert r["n_rows"] == 4 and r["n_weighted"] == 1


class TestHorvitzThompson:
    def test_full_inclusion_is_exact(self, spark):
        import pytest
        from pyspark.sql import functions as F
        from zoi_spark import sampling
        rows = [(i, float(i * 10)) for i in range(1, 6)]
        df = spark.createDataFrame(rows, "doc_id long, y double")
        r = sampling.horvitz_thompson(
            df, "y", pi=F.lit(1.0), id_col="doc_id").collect()[0]
        assert r["n_sampled"] == r["n_pop"] == 5
        assert r["ht_total"] == pytest.approx(r["true_total"])
        assert r["ht_se"] == 0.0

    def test_estimate_within_three_se(self, spark, sf_dir):
        # deterministic sample → a fixed estimate; it must land
        # within 3 SE of the truth (and SE must be > 0)
        from pyspark.sql import functions as F
        from zoi_spark import sampling
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        r = sampling.horvitz_thompson(
            d, "n_chars",
            pi=F.least(F.lit(1.0), F.col("n_chars") / 500.0),
            id_col="doc_id").collect()[0]
        assert 0 < r["n_sampled"] < r["n_pop"]
        assert r["ht_se"] > 0
        assert abs(r["ht_total"] - r["true_total"]) <= 3 * r["ht_se"]

    def test_uniform01_strictly_inside_unit_interval(self, spark):
        from pyspark.sql import functions as F
        from zoi_spark import sampling
        df = spark.range(0, 2000).select(
            sampling.uniform01(F.col("id")).alias("u"))
        r = df.agg(F.min("u").alias("lo"), F.max("u").alias("hi"),
                   F.avg("u").alias("mu")).collect()[0]
        assert 0.0 < r["lo"] and r["hi"] < 1.0
        assert 0.45 < r["mu"] < 0.55


class TestGreedySetCover:
    def test_greedy_order_and_gains(self, spark):
        from zoi_spark import sampling
        # A={1,2,3}, B={3,4}, C={4,5}: greedy picks A(3), then C(2)
        # (beats B whose leftover {4} ties C's {4,5}), then B adds 0
        rows = ([("A", i) for i in (1, 2, 3)]
                + [("B", i) for i in (3, 4)]
                + [("C", i) for i in (4, 5)])
        df = spark.createDataFrame(rows, "g string, w long")
        out = sampling.greedy_set_cover(df, group_col="g",
                                        item_col="w", k=3).collect()
        assert [(r["round"], r["group"], r["gain"]) for r in out] \
            == [(1, "A", 3), (2, "C", 2)]
        assert out[-1]["covered_total"] == 5

    def test_tie_breaks_by_group_asc(self, spark):
        from zoi_spark import sampling
        rows = [("B", 1), ("B", 2), ("A", 3), ("A", 4)]
        df = spark.createDataFrame(rows, "g string, w long")
        out = sampling.greedy_set_cover(df, group_col="g",
                                        item_col="w", k=1).collect()
        assert out[0]["group"] == "A"

    def test_text_wrapper_covers_vocab(self, spark):
        from zoi_spark import sampling
        df = spark.createDataFrame(
            [(1, "a b c", "s1"), (2, "c d", "s2"), (3, "a", "s3")],
            "doc_id long, text string, source string")
        out = sampling.source_set_cover(df, k=3).collect()
        assert out[0]["group"] == "s1" and out[0]["gain"] == 3
        assert out[1]["group"] == "s2" and out[1]["gain"] == 1
        assert len(out) == 2  # s3 adds nothing -> early stop


class TestParetoFront:
    def test_dominated_point_flagged(self, spark):
        from zoi_spark import sampling
        # B dominates A (higher cov, lower dup); C trades off
        rows = [("A", 0.5, 0.2), ("B", 0.9, 0.1), ("C", 0.95, 0.3)]
        df = spark.createDataFrame(rows,
                                   "g string, cov double, dup double")
        out = {r["g"]: r["on_front"] for r in
               sampling.pareto_front(df, by="g", maximize=["cov"],
                                     minimize=["dup"]).collect()}
        assert out == {"A": False, "B": True, "C": True}

    def test_duplicate_metric_rows_both_on_front(self, spark):
        from zoi_spark import sampling
        # equal vectors do not strictly dominate each other
        rows = [("A", 1.0), ("B", 1.0)]
        df = spark.createDataFrame(rows, "g string, m double")
        out = sampling.pareto_front(df, by="g",
                                    maximize=["m"]).collect()
        assert all(r["on_front"] for r in out)

    def test_requires_metrics(self, spark):
        import pytest as _pt
        from zoi_spark import sampling
        df = spark.createDataFrame([("A", 1.0)], "g string, m double")
        with _pt.raises(ValueError):
            sampling.pareto_front(df, by="g")
