"""Table-level checks, text analysis, dedup, ANN, runner — on the
deterministic synthetic webtext table (FIXTURES.md F1-F3) and the
driver testdata."""

import os

import pytest
from pyspark.sql import functions as F

import zoi_spark as z
from zoi_spark import dedup, runner, similarity, tablechecks, testgen, text


@pytest.fixture(scope="module")
def web(spark):
    df = testgen.webtext(spark, 2000, partitions=8).cache()
    df.count()
    return df


# --- uniqueness -------------------------------------------------------------

def test_duplicates_salted_matches_plain(spark, web):
    plain = {r.url: r.n_occurrences
             for r in tablechecks.duplicates(web, "url").collect()}
    salted = {r.url: r.n_occurrences
              for r in tablechecks.duplicates(web, "url",
                                              salt_partitions=8).collect()}
    assert plain == salted
    assert len(plain) > 0
    assert all(n > 1 for n in plain.values())


def test_duplicates_match_seeded_ground_truth(spark, web):
    seeded_dup_urls = (web.where(F.array_contains("expect_rule_ids",
                                                  "url.duplicate"))
                       .where(F.col("url").isNotNull())
                       .select("url").distinct().count())
    found = tablechecks.duplicates(web, "url").count()
    # a dup target may itself be a seeded bad/null url (~4%), so a few
    # seeded dups don't materialize as equal urls
    assert found >= seeded_dup_urls * 0.8


# --- referential ------------------------------------------------------------

def test_referential_broadcast_anti_join(spark, web):
    dictionary = testgen.allowed_langs(spark)
    bad = tablechecks.referential_violations(web, "lang", dictionary)
    got = {r.lang for r in bad.select("lang").distinct().collect()}
    assert got == {"xx", "q1", "zz"}
    seeded = web.where(F.array_contains("expect_rule_ids", "lang.one_of")).count()
    assert bad.count() == seeded


# --- single-pass stats + drift ----------------------------------------------

def test_column_stats_single_pass(spark, web):
    hist = tablechecks.HistogramSpec("text", 0, 4000, buckets=10, length_of=True)
    row = tablechecks.column_stats(
        web, ["url", "text", "lang"], histograms=[hist]).collect()[0].asDict()
    assert row["n_rows"] == 2000
    assert row["url__nulls"] == web.where(F.col("url").isNull()).count()
    exact = web.select(F.countDistinct("lang")).collect()[0][0]
    assert abs(row["lang__distinct"] - exact) <= max(2, exact * 0.15)
    buckets = tablechecks.stats_to_rows(row, [hist])
    assert sum(b["count"] for b in buckets) == web.where(
        F.col("text").isNotNull()).count()


def test_drift_kl_psi(spark, web):
    base = [(r.value, r["count"]) for r in
            tablechecks.categorical_histogram(web, "lang").collect()]
    same = tablechecks.check_drift(base, base)
    assert same["psi"] == pytest.approx(0.0, abs=1e-9)
    assert not same["drifted"]
    # shift the mix hard: drop every 'en' row
    shifted_df = web.where(F.col("lang") != "en")
    shifted = [(r.value, r["count"]) for r in
               tablechecks.categorical_histogram(shifted_df, "lang").collect()]
    moved = tablechecks.check_drift(base, shifted)
    assert moved["psi"] > 0.2 and moved["drifted"]


# --- text analysis ----------------------------------------------------------

def test_text_profile_columns(spark):
    df = spark.createDataFrame(
        [(1, "The cat and the dog of the house went to the market in town."),
         (2, "der hund und die katze und der vogel das haus nicht hier"),
         (3, ""), (4, "HELLO!!! WORLD!!!")],
        "id int, text string")
    rows = {r.id: r.asDict() for r in text.profile(df).collect()}
    assert rows[1]["lang_pred"] == "en"
    assert rows[2]["lang_pred"] == "de"
    assert rows[3]["n_tokens"] == 0
    assert rows[4]["punct_ratio"] > 0.3
    assert rows[4]["upper_ratio"] > 0.5
    assert 0.0 <= rows[1]["quality"] <= 1.0
    assert rows[1]["fingerprint"] == rows[1]["fingerprint"]


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "  hello world "), (3, "different")],
        "id int, text string")
    fps = {r.id: r.fp for r in
           df.select("id", text.fingerprint(F.col("text")).alias("fp")).collect()}
    assert fps[1] == fps[2] != fps[3]


# --- dedup ------------------------------------------------------------------

@pytest.fixture(scope="module")
def dup_docs(spark):
    rows = []
    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "into the deep green forest tonight")
    for i in range(30):
        rows.append((i, base + f" unique tail {i} with extra words here"))
    rows.append((100, base + " unique tail 5 with extra words here"))   # exact dup of 5
    rows.append((101, base + " unique tail 7 with extra words HERE"))   # near dup of 7 (case)
    rows.append((102, "completely different tiny text"))
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_dedup(spark, dup_docs):
    # 100 is byte-identical to 5; 101 differs only by case, which the
    # normalized fingerprint also collapses → 2 exact groups
    groups = {g.keep_id: g.n_docs for g in
              dedup.exact_duplicates(dup_docs).collect()}
    assert groups == {5: 2, 7: 2}
    kept = dedup.exact_dedup(dup_docs)
    assert kept.count() == dup_docs.count() - 2
    assert kept.where(F.col("doc_id").isin(100, 101)).count() == 0


def test_ngram_jaccard_pairs(spark, dup_docs):
    pairs = {(r.id_a, r.id_b): r.jaccard
             for r in dedup.ngram_jaccard_pairs(
                 dup_docs, threshold=0.7).collect()}
    assert (5, 100) in pairs and pairs[(5, 100)] == 1.0
    assert (7, 101) in pairs  # case-only difference normalizes away
    assert all(a < b for a, b in pairs)


def test_minhash_lsh_finds_near_dups(spark, dup_docs):
    verified = {(r.id_a, r.id_b): r.jaccard
                for r in dedup.minhash_dedup_pairs(
                    dup_docs, threshold=0.8, num_hashes=64, bands=16).collect()}
    assert (5, 100) in verified
    assert (7, 101) in verified
    # all returned pairs are genuinely similar (verify step prunes)
    assert all(j >= 0.8 for j in verified.values())


def test_simhash_near_dups(spark, dup_docs):
    pairs = {(r.id_a, r.id_b) for r in dedup.simhash_near_dups(
        dup_docs, max_hamming=4).collect()}
    assert (5, 100) in pairs


# --- embeddings: near-dup + ANN ----------------------------------------------

def test_embedding_ops(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = (emb.limit(3)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    topk = similarity.brute_force_topk(emb, queries, k=5)
    rows = topk.collect()
    assert len(rows) == 15
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append((r.rank, r.cosine))
    for q, lst in by_q.items():
        lst.sort()
        sims = [c for _rk, c in lst]
        assert sims == sorted(sims, reverse=True)

    # LSH path returns a subset with high precision vs brute force
    lsh = similarity.lsh_topk(emb, queries, k=5, bits=4, dim=64)
    assert lsh.count() > 0
    exact_top = {(r.query_id, r.vec_id) for r in rows}
    lsh_rows = {(r.query_id, r.vec_id) for r in lsh.collect()}
    assert len(lsh_rows & exact_top) > 0


# --- runner: manifest + resume + byte identity --------------------------------

def test_runner_resume_and_byte_identity(spark, web, tmp_path):
    schema = testgen.webtext_schema()
    r = runner.ValidationRunner(
        spark, schema, id_col="row_id", n_partitions=16,
        manifest_dir=str(tmp_path / "manifest"),
        violations_dir=str(tmp_path / "violations"),
        input_lineage="testgen.webtext(2000)")
    s1 = r.run(web, "run1")
    assert s1.n_partitions_total == 16
    assert s1.n_rows == 2000
    assert s1.n_invalid > 0 and s1.n_valid > 0
    # resume: everything already done → 0 processed
    s2 = r.run(web, "run1")
    assert s2.n_partitions_skipped == 16
    assert s2.n_rows == s1.n_rows  # manifest totals unchanged
    # violations landed partitioned
    v = spark.read.parquet(str(tmp_path / "violations"))
    assert v.count() == s1.n_violations
    # byte identity of text through validation
    after = z.validate(web, schema, id_cols=["row_id"]).annotated
    assert runner.assert_byte_identity(web, after, "row_id", "text")


def test_seeded_violations_detected(spark, web):
    """Every seeded violation class is caught by the matching rule
    (oracle column expect_rule_ids from the generator)."""
    schema = testgen.webtext_schema()
    res = z.validate(web, schema, id_cols=["row_id"])
    got = (res.violations.groupBy("rule_id").count().collect())
    got_rules = {r.rule_id for r in got}
    for expected in ["url.url", "url.required", "warc_ts.required",
                     "text.gte", "text.lte", "lang.one_of"]:
        assert expected in got_rules, f"missing {expected} in {got_rules}"
    # url violations match the seeded count exactly
    seeded_bad_url = web.where(
        F.array_contains("expect_rule_ids", "url.url")).count()
    found_bad_url = res.violations.where(F.col("rule_id") == "url.url").count()
    assert found_bad_url == seeded_bad_url


def test_ivf_full_probe_equals_brute_force(spark, sf_dir):
    """IVF with nprobe == n_centroids scans every inverted list — must
    reproduce the exact brute-force ranking."""
    from zoi_spark import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = (emb.where(F.col("vec_id") < 3)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    exact = similarity.brute_force_topk(emb, queries, k=5)
    full = similarity.ivf_topk(emb, queries, k=5, n_centroids=8, nprobe=8)
    assert sorted(map(tuple, exact.collect())) == \
        sorted(map(tuple, full.collect()))


def test_ivf_partial_probe_recall(spark, sf_dir):
    """nprobe=4 of 8 lists: every result must still be a true corpus
    pair, and recall vs exact top-5 should be well above random."""
    from zoi_spark import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = (emb.where(F.col("vec_id") < 5)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    exact = {(r.query_id, r.vec_id) for r in
             similarity.brute_force_topk(emb, queries, k=5).collect()}
    approx = {(r.query_id, r.vec_id) for r in
              similarity.ivf_topk(emb, queries, k=5, n_centroids=8,
                                  nprobe=4).collect()}
    assert len(approx & exact) / len(exact) >= 0.4


def test_arrow_topk_matches_jvm_brute_force(spark, sf_dir):
    """The Arrow/numpy block-wise top-k must agree with the JVM
    expression path on ids and ranks (cosines to 5 decimals — the two
    compute the quotient with different float orderings)."""
    from zoi_spark import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = (emb.where(F.col("vec_id") < 3)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    jvm = similarity.brute_force_topk(emb, queries, k=5)
    arrow = similarity.brute_force_topk_arrow(emb, queries, k=5)
    jr = sorted((r.query_id, r.vec_id, r.rank, round(r.cosine, 5))
                for r in jvm.collect())
    ar = sorted((r.query_id, r.vec_id, r.rank, round(r.cosine, 5))
                for r in arrow.collect())
    assert jr == ar


def test_duplicate_clusters_transitive(spark):
    """A≈B and B≈C collapse into one cluster even with no A-C pair;
    cluster_id = min member id; disjoint pairs stay separate."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a long, id_b long")
    got = {r.doc_id: r.cluster_id
           for r in dedup.duplicate_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20, 23: 20}


def test_duplicate_clusters_long_chain_log_rounds(spark):
    """Star contraction (large-star/small-star) collapses a 300-node
    gradual-drift chain within a log-scale round budget — 1-hop label
    propagation would need 300 rounds, the exact scale failure the
    rewrite removes."""
    chain = spark.createDataFrame([(i, i + 1) for i in range(300)],
                                  "id_a long, id_b long")
    out = dedup.duplicate_clusters(chain, max_iters=12)
    assert out._zoi_converged
    rows = out.collect()
    assert len(rows) == 301
    assert {r.cluster_id for r in rows} == {0}


def test_duplicate_clusters_keeps_selfpair_and_null_partner_nodes(spark):
    """A doc whose only rows are self-pairs or NULL-partner pairs must
    still appear in the doc->cluster map (labeled as itself), not
    silently vanish."""
    pairs = spark.createDataFrame([(7, 7), (8, None), (1, 2)],
                                  "id_a long, id_b long")
    got = {r.doc_id: r.cluster_id
           for r in dedup.duplicate_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 7: 7, 8: 8}


def test_duplicate_clusters_matches_union_find(spark):
    """Randomized equivalence vs a plain union-find closure: same
    (doc -> component-min) map on arbitrary graphs (hubs, chains,
    cliques, singleton-pair mixes)."""
    import random

    for seed in (7, 42, 1337):
        rng = random.Random(seed)
        n = 80
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(70)]
        edges = [(a, b) for a, b in edges if a != b]
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expected = {x: find(x) for x in
                    {v for e in edges for v in e}}
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {r.doc_id: r.cluster_id
               for r in dedup.duplicate_clusters(pairs).collect()}
        assert got == expected, f"seed {seed}"


def test_lsh_multiprobe_recall_at_least_single_probe(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = (emb.limit(3)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    exact = {(r.query_id, r.vec_id)
             for r in similarity.brute_force_topk(emb, queries, k=5).collect()}
    single = {(r.query_id, r.vec_id)
              for r in similarity.lsh_topk(emb, queries, k=5, bits=4,
                                           dim=64).collect()}
    multi = {(r.query_id, r.vec_id)
             for r in similarity.lsh_topk_multiprobe(emb, queries, k=5,
                                                     bits=4, dim=64).collect()}
    assert len(multi & exact) >= len(single & exact)


def test_bpe_ish_token_count(spark):
    """Letter/digit/punct runs, GPT-2-pre-tokenizer style: punctuation
    and digits count even without surrounding whitespace."""
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "foo123bar!!"), (3, ""), (4, None),
         (5, "naïve café, 42€")],
        "id int, text string")
    got = {r.id: r.n for r in df.select(
        "id", text.bpe_ish_token_count(F.col("text")).alias("n")).collect()}
    # foo|123|bar|!! ; naïve|café|,|42|€
    assert got == {1: 2, 2: 4, 3: 0, 4: 0, 5: 5}


def test_winnowing_fingerprints_shared_substring(spark):
    """Winnowing guarantee: docs sharing a substring of length >= w+k-1
    share at least one selected fingerprint; tiny/empty docs degrade
    gracefully."""
    common = "the quick brown fox jumps over the lazy dog tonight"
    df = spark.createDataFrame(
        [(1, "AAA " + common + " BBB"),
         (2, "xyz123 " + common + " 987qrs"),
         (3, "completely unrelated content with other words entirely"),
         (4, "ab"), (5, "")],
        "id int, text string")
    fp = text.winnowing_fingerprints(F.col("text"), k=5, w=8)
    rows = {r.id: set(r.fp or []) for r in df.select("id", fp.alias("fp")).collect()}
    assert rows[1] & rows[2], "shared long substring must share a fingerprint"
    assert not (rows[1] & rows[3] & rows[2]) or True  # disjoint docs: no guarantee either way
    assert len(rows[4]) == 1   # shorter than k -> single whole-text hash
    assert rows[5] == set()


def test_minhash_bucket_cap_prunes_mega_buckets(spark):
    """max_bucket_size: a boilerplate mega-group is excluded from the
    pairwise join (its members belong to the exact-dedup path), while
    small near-dup groups still pair."""
    boiler = "exactly the same boilerplate page body repeated verbatim here"
    rows = [(i, boiler) for i in range(40)]                # one mega bucket
    rows += [(100, "a rare unique page about gardens and trees today ok"),
             (101, "a rare unique page about gardens and trees today OK")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = dedup.minhash_dedup_pairs(df, threshold=0.8, bands=16,
                                       max_bucket_size=10)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert (100, 101) in got
    assert not any(a < 40 and b < 40 for a, b in got)
    uncapped = dedup.minhash_dedup_pairs(df, threshold=0.8, bands=16)
    assert any(a < 40 and b < 40 for a, b in
               {(r.id_a, r.id_b) for r in uncapped.collect()})


def test_curation_pipeline_end_to_end(spark):
    """pipeline.curate: validate → quality → exact dedup → cluster
    dedup; each seeded defect drops at exactly its stage."""
    from zoi_spark import pipeline

    base = ("a perfectly reasonable web document about gardens with many "
            "plain words and sentences that go on for a while longer")
    def doc(i):   # six distinct trailing tokens keep base docs ~J=0.5 apart
        return base + f" sect{i} a{i} b{i} c{i} d{i} e{i}"
    rows = [(i, doc(i), "en") for i in range(20)]
    rows.append((50, None, "en"))                     # invalid: null text
    rows.append((51, doc(3), "en"))                   # exact dup of 3
    # near dup of 4: one trailing token changed (~J=0.78 after shingles)
    rows.append((52, base + " sect4 a4 b4 c4 d4 zz", "en"))
    rows.append((53, "AAA!!! BBB??? " * 30, "en"))    # quality reject
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    schema = z.fields({"doc_id": z.integer(), "text": z.string(min=10),
                       "lang": z.string()})
    res = pipeline.curate(df, schema, id_col="doc_id", min_quality=0.3,
                          near_dup_threshold=0.7)
    rep = res.report()
    assert rep["input"] == 24
    assert rep["valid"] == 23          # null text dropped by the schema
    assert rep["quality"] == 22        # punctuation wall dropped
    assert rep["exact_dedup"] == 21    # 51 collapses into 3
    assert rep["near_dedup"] == 20     # 52 collapses into 4's cluster
    kept_ids = {r.doc_id for r in res.kept.select("doc_id").collect()}
    assert kept_ids == set(range(20))
    assert rep["kept_ws_tokens"] > 0 and rep["kept_bpe_tokens"] > 0


def test_suggest_salt_from_frequency_sketch(spark):
    """Hot keys drive the salt factor up; uniform keys leave it at 1;
    the seeded sample keeps the choice deterministic across resumes."""
    hot = spark.range(0, 100_000).selectExpr(
        "CASE WHEN id % 2 = 0 THEN 'hot-host' ELSE concat('h', id) END AS k")
    s_hot = tablechecks.suggest_salt(hot, "k", sample_fraction=0.05,
                                     target_rows_per_task=10_000)
    assert s_hot >= 4
    uniform = spark.range(0, 50_000).selectExpr("concat('h', id) AS k")
    s_uni = tablechecks.suggest_salt(uniform, "k", sample_fraction=0.05,
                                     target_rows_per_task=10_000)
    assert s_uni == 1
    assert s_hot == tablechecks.suggest_salt(
        hot, "k", sample_fraction=0.05, target_rows_per_task=10_000)


def test_embedding_near_dups_engines_agree(spark):
    """The arrow matmul engine and the pure-Column join produce the
    same pairs; max_block_size excludes oversized blocks."""
    import random
    rnd = random.Random(7)
    rows = [(i, [rnd.gauss(0, 1) for _ in range(8)], i % 3)
            for i in range(30)]
    df = spark.createDataFrame(rows,
                               "vec_id long, embedding array<double>, label int")
    a = {tuple(r) for r in dedup.embedding_near_dups(
        df, threshold=0.3, block_col="label").collect()}
    b = {tuple(r) for r in dedup.embedding_near_dups(
        df, threshold=0.3, block_col="label", engine="column").collect()}
    assert a == b and a
    capped = dedup.embedding_near_dups(df, threshold=0.3, block_col="label",
                                       max_block_size=2)
    assert capped.count() == 0
    with pytest.raises(ValueError):
        dedup.embedding_near_dups(df, engine="nope")


def test_duplicate_clusters_convergence_flag(spark):
    """A chain deeper than max_iters emits the non-convergence warning
    and flags the result; enough iters converge silently."""
    import warnings

    chain = spark.createDataFrame([(i, i + 1) for i in range(12)],
                                  "id_a long, id_b long")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        bad = dedup.duplicate_clusters(chain, max_iters=2)
        bad.count()
    assert not bad._zoi_converged
    assert any("did not converge" in str(x.message) for x in w)
    good = dedup.duplicate_clusters(chain, max_iters=15)
    assert good._zoi_converged
    assert {r.cluster_id for r in good.collect()} == {0}


def test_ngram_jaccard_block_cap(spark):
    """max_block_size excludes oversized blocks from the pair join and
    requires a block column."""
    rows = [(i, "common words shared by every member here", "big")
            for i in range(6)]
    rows += [(10, "two small docs nearly the same text body", "sm"),
             (11, "two small docs nearly the same text body!", "sm")]
    df = spark.createDataFrame(rows, "doc_id long, text string, blk string")
    capped = dedup.ngram_jaccard_pairs(df, threshold=0.5, block_col="blk",
                                       max_block_size=3)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert got == {(10, 11)}
    with pytest.raises(ValueError):
        dedup.ngram_jaccard_pairs(df, max_block_size=3)


def test_suggest_bits_scales_with_corpus():
    from zoi_spark import similarity

    assert similarity.suggest_bits(1000) == 1
    assert similarity.suggest_bits(1 << 20, target_block=1024) == 10
    assert similarity.suggest_bits(10**12, target_block=1024) == 24
    # doubling the corpus adds ~one bit -> expected block size bounded
    assert (similarity.suggest_bits(2 << 20, target_block=1024)
            == similarity.suggest_bits(1 << 20, target_block=1024) + 1)


def test_mix_multiplier_distinct_offsets():
    """shingle_n > 3 offsets get distinct multipliers (swapping tokens
    j and j+3 must change the shingle hash)."""
    import numpy as np

    ks = [dedup._mix_multiplier(j) for j in range(8)]
    assert len(set(ks)) == len(ks)
    assert all(k % 2 == 1 or j < 3 for j, k in enumerate(ks))
    h1 = np.array([11, 22, 33, 44, 55], dtype=np.uint64)
    h2 = np.array([44, 22, 33, 11, 55], dtype=np.uint64)  # swap j=0, j=3
    s1 = dedup._numeric_shingles(h1, 4)
    s2 = dedup._numeric_shingles(h2, 4)
    assert set(s1.tolist()) != set(s2.tolist())


def test_url_canonicalization(spark):
    """canonical_url collapses host case, default ports, fragments and
    tracking params; url_dedup keeps the min-id representative."""
    from zoi_spark import urls

    rows = [
        (1, "http://Example.COM/Path?a=1#frag"),
        (2, "http://example.com:80/Path?a=1"),
        (3, "http://example.com/Path?a=1&utm_source=x"),
        (4, "https://example.com:443/"),
        (5, "https://example.com"),
        (6, "http://example.com/Path?utm_campaign=y&a=1"),
        (7, "http://other.com/Path?a=1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    canon = {r.doc_id: r.c for r in df.select(
        "doc_id", urls.canonical_url(F.col("url")).alias("c")).collect()}
    assert canon[1] == canon[2] == canon[3] == canon[6] \
        == "http://example.com/Path?a=1"
    assert canon[4] == canon[5] == "https://example.com"
    assert canon[7] == "http://other.com/Path?a=1"
    kept = {r.doc_id for r in urls.url_dedup(df).collect()}
    assert kept == {1, 4, 7}
    groups = urls.url_dedup_groups(df)
    assert {(r.n_docs, r.keep_id) for r in groups.collect()} \
        == {(4, 1), (2, 4)}


def test_pii_flags(spark):
    from zoi_spark import text as zt

    rows = [(1, "clean prose with no contact info at all"),
            (2, "mail me at a.b+c@example.org thanks"),
            (3, "host 10.0.0.255 and backup 192.168.1.1"),
            (4, "call +44 20 7946 0958 now"),
            (5, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in zt.with_pii_flags(df).collect()}
    assert not out[1].has_pii
    assert out[2].n_pii_email == 1 and out[2].has_pii
    assert out[3].n_pii_ipv4 == 2
    assert out[4].n_pii_phone == 1
    assert not out[5].has_pii


def test_winnowing_overlap_pairs(spark):
    """Shared-fingerprint pairs: a doc with an inserted sentence still
    overlaps its source (local fingerprints survive edits); the
    document-frequency cap prunes boilerplate hashes."""
    base = ("the winnowing algorithm selects the minimum hash in every "
            "window of consecutive k gram hashes across this document")
    edited = base.replace("across this document",
                          "with one inserted clause here across this document")
    other = "completely different content about gardens and the weather today"
    df = spark.createDataFrame(
        [(1, base), (2, edited), (3, other)], "doc_id long, text string")
    pairs = {(r.id_a, r.id_b): r.n_shared
             for r in dedup.winnowing_overlap_pairs(
                 df, min_shared=3, max_hash_docs=2).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 3
    assert (1, 3) not in pairs and (2, 3) not in pairs
    # cap=0-like: max_hash_docs=1 prunes every shared hash -> no pairs
    assert dedup.winnowing_overlap_pairs(
        df, min_shared=1, max_hash_docs=1).count() == 0


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the same key/count join WITHOUT an
    Exchange — the pay-the-shuffle-once contract for big-big joins
    (corpus-to-snapshot drift, violations-to-corpus)."""
    from zoi_spark import bucketing

    a = spark.range(0, 5000).selectExpr("id AS k", "id * 2 AS va")
    b = spark.range(0, 5000).selectExpr("id AS k", "id * 3 AS vb")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bucketing.write_bucketed(a, "zoi_bt_a", key="k", buckets=4,
                                 path=str(tmp_path / "a"))
        bucketing.write_bucketed(b, "zoi_bt_b", key="k", buckets=4,
                                 path=str(tmp_path / "b"))
        j = bucketing.bucketed_join(spark, "zoi_bt_a", "zoi_bt_b", "k")
        assert j.count() == 5000
        bucketing.assert_no_shuffle_join(j)
        # counter-example: an UNbucketed side must trip the assertion
        plain = spark.range(0, 5000).selectExpr("id AS k", "id AS vc")
        bad = spark.table("zoi_bt_a").join(plain, "k")
        bad.count()
        with pytest.raises(AssertionError):
            bucketing.assert_no_shuffle_join(bad)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS zoi_bt_a")
        spark.sql("DROP TABLE IF EXISTS zoi_bt_b")


def test_curate_url_and_pii_stages(spark):
    """curate with url_col + drop_pii: the canonical-url dup and the
    PII doc drop at their stages; clean docs survive."""
    from zoi_spark import pipeline

    base = ("a perfectly ordinary web document with plain words and "
            "sentences that keep going for a while longer than needed")
    other = ("entirely different prose about winter gardens and the "
             "migratory habits of seabirds across northern coastlines")
    rows = [
        (1, base + " one", "http://a.com/p"),
        (2, other, "http://b.com/p"),
        (3, base + " one", "HTTP://A.COM/p#frag"),     # url dup of 1
        (4, base + " mail me at x@example.com", "http://c.com/p"),  # PII
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, url string")
    schema = z.fields({"doc_id": z.integer(), "text": z.string(min=10),
                       "url": z.string()})
    res = pipeline.curate(df, schema, id_col="doc_id", url_col="url",
                          drop_pii=True)
    kept = {r.doc_id for r in res.kept.select("doc_id").collect()}
    assert kept == {1, 2}
    res.release()

    # url_filter=True additionally rejects a blocklisted url at intake
    rows2 = rows + [(5, other + " again", "http://bad.example/casino/x")]
    df2 = spark.createDataFrame(rows2, "doc_id long, text string, url string")
    res2 = pipeline.curate(df2, schema, id_col="doc_id", url_col="url",
                           url_filter=True, drop_pii=True)
    assert 5 not in {r.doc_id for r in res2.kept.select("doc_id").collect()}
    res2.release()


def test_curate_line_correction_stages(spark):
    """curate with strip_frequent_lines + c4_filter: boilerplate lines
    vanish from the working text, later stages (quality, dedup, token
    ledger) run on the cleaned column, and docs emptied by the line
    stages are dropped — while the original text column is untouched."""
    from zoi_spark import pipeline

    boiler = "accept cookies to continue"
    body_a = ("A perfectly ordinary paragraph with plenty of words that "
              "ends with terminal punctuation as C4 expects it to.")
    body_b = ("Entirely different prose about winter gardens and the "
              "migratory habits of seabirds across northern coastlines.")
    rows = [
        (1, boiler + "\n" + body_a),
        (2, boiler + "\n" + body_b),
        (3, boiler + "\n" + boiler),          # only boilerplate → dropped
        (4, boiler + "\nshort line"),          # C4 kills the short line
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    schema = z.fields({"doc_id": z.integer(), "text": z.string(min=5)})
    res = pipeline.curate(
        df, schema, id_col="doc_id",
        strip_frequent_lines_min_docs=2,
        c4_filter={"min_words": 3, "require_terminal": True})
    out = {r.doc_id: r for r in res.kept.collect()}
    assert set(out) == {1, 2}
    # cleaned working column lost the boilerplate; original bytes intact
    assert res.text_col == "__c4_clean"
    assert out[1][res.text_col] == body_a
    assert out[1].text == boiler + "\n" + body_a
    ledger = res.report()
    assert ledger["kept_ws_tokens"] > 0
    res.release()


def test_semantic_dedup_keep_rule(spark):
    """semantic_dedup keeps the min-id representative of each in-cell
    near-identical group and never pairs across cells."""
    from zoi_spark import dedup

    # two well-separated cells on the x/y axes; near-dups inside each
    rows = [
        (1, [1.0, 0.0]), (2, [0.999, 0.01]),    # cell 0 dups → keep 1
        (3, [0.0, 1.0]), (4, [0.01, 0.999]),    # cell 1 dups → keep 3
        (5, [0.6, 0.8]),                         # cell 1, but dissimilar
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [[1.0, 0.0], [0.0, 1.0]]
    kept = dedup.semantic_dedup(df, id_col="vec_id", vec_col="embedding",
                                centroids=cents, threshold=0.99)
    assert {r.vec_id for r in kept.collect()} == {1, 3, 5}
    # column engine agrees bit-for-bit on the kept set
    kept2 = dedup.semantic_dedup(df, id_col="vec_id", vec_col="embedding",
                                 centroids=cents, threshold=0.99,
                                 engine="column")
    assert {r.vec_id for r in kept2.collect()} == {1, 3, 5}


def test_dup_ngram_fraction_values(spark):
    from zoi_spark import text as zt

    shared = "alpha beta gamma delta epsilon"        # one shared 5-gram
    rows = [(1, shared + " zeta"),                   # 2 grams, 1 dup
            (2, shared),                             # 1 gram, 1 dup
            (3, "unrelated words entirely different here now")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           zt.dup_ngram_fraction(df, n=5, min_docs=2).collect()}
    assert (out[1].n_grams, out[1].n_dup) == (2, 1)
    assert out[1].dup_fraction == 0.5
    assert (out[2].n_grams, out[2].n_dup) == (1, 1)
    assert out[3].n_dup == 0


def test_curate_admission_gates(spark):
    """curate with gopher + max_dup_ngram_fraction: the Gopher battery
    and the cross-doc dup-gram cap each drop their target doc."""
    from zoi_spark import pipeline

    shared = ("alpha beta gamma delta epsilon zeta eta theta iota "
              "kappa lambda mu")
    good = ("the quick brown fox and the lazy dog have agreed to meet "
            "with friends of that old cat near the river bank where "
            "tall reeds grow thick in the long summer light each year")
    rows = [
        (1, good),
        (2, "- one\n- two\n- three\n- four"),          # Gopher: bullets
        (3, shared + " first tail of the document here now"),
        (4, shared + " second tail of the document here now"),  # dup grams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    schema = z.fields({"doc_id": z.integer(), "text": z.string(min=5)})
    res = pipeline.curate(
        df, schema, id_col="doc_id",
        gopher={"min_words": 10},
        max_dup_ngram_fraction=0.5,
        near_dup_threshold=0.99)
    kept = {r.doc_id for r in res.kept.select("doc_id").collect()}
    assert 1 in kept and 2 not in kept
    # docs 3+4 share most 5-grams -> dup fraction above the 0.5 cap
    assert 3 not in kept and 4 not in kept
    res.release()


def test_curate_auto_knob_sizing(spark):
    """Blocking knobs default to "auto": bands from the threshold
    S-curve (recall-floored), bucket cap from the pair-work bound,
    cluster rounds from log2(n) — the CLI path needs no tuning, and
    passing approx_rows skips the sizing count() job."""
    from zoi_spark import dedup, pipeline

    # threshold-only sizing: midpoint (1/b)^(1/r) must not exceed t
    assert dedup.suggest_minhash_bands(64, 0.7) == 16
    assert dedup.suggest_minhash_bands(64, 0.85) == 8
    for t in (0.3, 0.5, 0.8, 0.95):
        b = dedup.suggest_minhash_bands(64, t)
        assert 64 % b == 0 and (1.0 / b) ** (b / 64) <= t
    # pair-work bound: cap²/2 ≈ target, corpus size only tightens it
    assert dedup.suggest_max_bucket_size(target_pairs=2_000_000) == 2000
    assert dedup.suggest_max_bucket_size(100) == 100
    assert dedup.suggest_max_bucket_size(10**12) == 2000
    # round budget: log-scaled, clamped
    assert dedup.suggest_cluster_iters(24) == 13      # ceil(log2)+8
    assert dedup.suggest_cluster_iters(2) == 12       # floor
    assert dedup.suggest_cluster_iters(10**12) == 48

    rows = [(i, f"plain document number {i} with agreeable words "
                "that run long enough to shingle cleanly") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    schema = z.fields({"doc_id": z.integer(), "text": z.string(min=5)})
    res = pipeline.curate(df, schema, id_col="doc_id", approx_rows=8)
    assert res.kept.count() == 8
    res.release()


def test_gopher_quality_flags(spark):
    from zoi_spark import text as zt

    good = ("the quick brown fox and the lazy dog have agreed to meet "
            "with friends of that old be-whiskered cat near the river "
            "bank where the tall reeds grow thick in summer light")
    bullets = "- one\n- two\n- three\n- four"
    symbols = "### " * 30 + "the of and to be"
    rows = [(1, good), (2, bullets), (3, symbols)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           zt.gopher_quality_flags(df, min_words=10).collect()}
    assert out[1].gopher_pass
    assert not out[2].g_bullet_ratio and not out[2].gopher_pass
    assert not out[3].g_symbol_ratio and not out[3].gopher_pass


def test_sessionize_gap_semantics(spark):
    from zoi_spark import tablechecks

    rows = [(1, 10, "2024-01-01 00:00:00"),
            (2, 10, "2024-01-01 00:10:00"),     # same session (10 min)
            (3, 10, "2024-01-01 01:00:00"),     # 50-min gap -> session 2
            (4, 20, "2024-01-01 00:00:00")]     # other user -> own session 1
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts string") \
        .withColumn("ts", F.to_timestamp("ts"))
    out = {r.event_id: r.session_id for r in tablechecks.sessionize(
        df, user_col="user_id", ts_col="ts", gap_minutes=30,
        order_col="event_id").collect()}
    assert out == {1: 1, 2: 1, 3: 2, 4: 1}


def test_ks_drift_binned(spark):
    from zoi_spark import tablechecks

    # sample A all in bucket 0, sample B all in bucket 9 -> KS = 1.0
    rows = [(i, 10.0 if i % 2 == 0 else 990.0) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, v double")
    r = tablechecks.ks_drift_binned(
        df, "v", split=F.col("doc_id") % 2 == 0,
        bucket_width=100.0, n_buckets=10).first()
    assert r.ks == 1.0 and r.n_buckets == 2


def test_schema_drift_detection(spark):
    from pyspark.sql import types as T
    from zoi_spark import tablechecks

    b = T.StructType([T.StructField("a", T.LongType()),
                      T.StructField("b", T.StringType())])
    c = T.StructType([T.StructField("a", T.DoubleType()),
                      T.StructField("c", T.StringType())])
    d = tablechecks.schema_drift(b, c)
    assert d["added"] == ["c"] and d["removed"] == ["b"]
    assert d["retyped"] == ["a"] and d["drifted"]
    same = tablechecks.schema_drift(b, b)
    assert not same["drifted"]


def test_temperature_weights_boost_direction(spark):
    from zoi_spark import tablechecks

    rows = [(i, "big" if i < 90 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = {r.lang: r for r in tablechecks.temperature_weights(
        df, stratum_col="lang", tau=0.5).collect()}
    # temperature < 1 upsamples the low-resource stratum
    assert out["small"].boost > 1.0 > out["big"].boost
    assert abs(out["small"].q + out["big"].q - 1.0) < 1e-6


def test_cluster_representatives(spark):
    from zoi_spark import dedup

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)],
        "doc_id long, cluster_id long")
    scores = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (7, 0.5), (8, 0.4)],
        "doc_id long, score double")
    reps = {r.cluster_id: r.keep_id for r in dedup.cluster_representatives(
        clusters, scores).collect()}
    assert reps == {1: 2, 7: 7}      # argmax score, tie -> min id


def test_strip_repeated_lines(spark):
    from zoi_spark import text as zt

    df = spark.createDataFrame(
        [(1, "a\nb\na\nc\nb"), (2, "x\nx\nx"), (3, "solo"),
         (4, "p1\n\np2\n\np3")],                    # blank separators exempt
        "doc_id long, text string")
    out = {r.doc_id: r for r in zt.strip_repeated_lines(df).collect()}
    assert out[1].clean_text == "a\nb\nc"          # first occurrences, in order
    assert (out[1].n_lines, out[1].n_kept) == (5, 3)
    assert out[2].clean_text == "x"
    assert out[3].clean_text == "solo"
    assert out[4].clean_text == "p1\n\np2\n\np3"   # paragraph structure intact


def test_url_dedup_latest(spark):
    from zoi_spark import urls

    rows = [
        (1, "http://a.com/p", "2024-01-01 00:00:00"),
        (2, "HTTP://A.COM/p#f", "2024-06-01 00:00:00"),   # same canonical, later
        (3, "http://b.com/p", "2024-01-01 00:00:00"),
        (4, "http://b.com:80/p", "2024-01-01 00:00:00"),  # same canonical, tie -> min id
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, ts string") \
        .withColumn("ts", F.to_timestamp("ts"))
    kept = {r.doc_id for r in urls.url_dedup_latest(
        df, url_col="url", ts_col="ts", id_col="doc_id").collect()}
    assert kept == {2, 3}


def test_token_budget_fill(spark):
    from zoi_spark import sampling

    rows = [(1, "en", 40), (2, "en", 50), (3, "en", 20),   # cum 40,90,110
            (4, "de", 90), (5, "de", 20)]                   # cum 90,110
    df = spark.createDataFrame(rows, "doc_id long, lang string, n long")
    out = {r.doc_id: r.cum_tokens for r in sampling.token_budget_fill(
        df, id_col="doc_id", weight_col="n", budget=100,
        stratum_col="lang").collect()}
    assert out == {1: 40, 2: 90, 4: 90}


def test_url_quality_flags(spark):
    from zoi_spark import urls

    rows = [
        (1, "http://good.example.com/p/1"),
        (2, "http://10.1.2.3/p/1"),                       # ip host
        (3, "http://ok.example.com/casino/bonus"),        # blocklist
        (4, "notaurl:whatever"),                          # malformed
        (5, "http://x.example.com/" + "/".join("abcdefghijklmn")),
        (6, None),                                        # null url
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r.doc_id: r for r in urls.url_quality_flags(df).collect()}
    assert out[1].url_pass
    assert not out[2].u_not_ip and not out[2].url_pass
    assert not out[3].u_not_blocked
    assert not out[4].u_valid
    assert not out[5].u_depth
    assert not out[6].u_valid and not out[6].url_pass


def test_ngram_decontamination(spark):
    """13-gram overlap fires on a shared window but not on reflowed
    text shorter than n, and the miss probe matches nothing."""
    from zoi_spark import text as zt

    base = " ".join(f"tok{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, base + " tail"), (2, "unrelated " * 20)],
        "doc_id long, text string")
    probes = spark.createDataFrame(
        [(10, " ".join(f"tok{i}" for i in range(5, 25))),   # inside doc 1
         (11, "never present anywhere at all")],
        "probe_id long, probe_text string")
    out = {(r.doc_id, r.probe_id): r.n_shared_grams
           for r in zt.ngram_decontamination(docs, probes, n=13).collect()}
    assert out == {(1, 10): 8}   # 20-token window -> 8 distinct 13-grams


def test_contamination_and_ngrams(spark):
    from zoi_spark import text as zt

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "a totally unrelated sentence about shipping containers"),
         (3, "we said the quick brown fox appears here too")],
        "doc_id long, text string")
    probes = spark.createDataFrame(
        [(10, "QUICK   Brown fox"), (11, "not present anywhere")],
        "probe_id long, probe_text string")
    hits = {r.probe_id: (r.n_docs, r.first_doc_id)
            for r in zt.contamination_check(docs, probes).collect()}
    assert hits == {10: (2, 1)}      # normalization bridges case/spacing
    grams = {r.ngram: r.n_occurrences
             for r in zt.ngram_counts(docs, n=2, min_count=2).collect()}
    assert grams["quick brown"] == 2 and grams["brown fox"] == 2
    assert "shipping containers" not in grams   # count 1 < min_count


def test_pair_operators_tolerate_empty_and_null_inputs(spark):
    """Degenerate inputs must yield empty results, not batch errors:
    empty frames, all-null vectors/texts."""
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert dedup.minhash_dedup_pairs(empty_docs).count() == 0
    assert dedup.ngram_jaccard_pairs(empty_docs, threshold=0.5).count() == 0
    assert dedup.winnowing_overlap_pairs(empty_docs).count() == 0

    emb = spark.createDataFrame(
        [(1, None, 0), (2, None, 0), (3, [1.0, 0.0], 1), (4, [1.0, 0.1], 1)],
        "vec_id long, embedding array<double>, label int")
    pairs = dedup.embedding_near_dups(emb, threshold=0.9, block_col="label")
    assert {(r.id_a, r.id_b) for r in pairs.collect()} == {(3, 4)}

    nulls = spark.createDataFrame([(1, None), (2, None)],
                                  "doc_id long, text string")
    assert dedup.winnowing_overlap_pairs(nulls).count() == 0
    assert dedup.ngram_jaccard_pairs(nulls, threshold=0.5).count() == 0


def test_refine_centroids_reduces_inertia(spark, sf_dir):
    """One Lloyd step must not worsen the clustering objective: the
    mean best-dot similarity under refined centroids >= under seeds."""
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    c0 = similarity.sample_centroids(emb, n_centroids=8)
    c1 = similarity.refine_centroids(emb, c0, iters=1)
    assert len(c1) == len(c0) and len(c1[0]) == len(c0[0])
    V = np.array([r[0] for r in emb.select("embedding").collect()],
                 dtype=np.float64)

    def mean_best_cosine(cents):
        C = np.array(cents, dtype=np.float64)
        C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        return float((Vn @ C.T).max(axis=1).mean())

    assert mean_best_cosine(c1) >= mean_best_cosine(c0) - 1e-9
    # deterministic across invocations
    assert c1 == similarity.refine_centroids(emb, c0, iters=1)


def test_verdicts_stable_under_repartitioning(spark, web):
    """SURVEY §5 invariant 3: the violation set and per-partition
    verdict inputs are identical whatever the physical partitioning —
    rules are pure per-row expressions and the runner's partition id is
    data-derived (pmod of the id hash), never spark_partition_id."""
    schema = testgen.webtext_schema()
    base = {(r.row_id, r.rule_id) for r in
            z.validate(web, schema, id_cols=["row_id"])
            .violations.select("row_id", "rule_id").collect()}
    for reshaped in (web.repartition(3), web.repartition(17, "lang"),
                     web.coalesce(1)):
        got = {(r.row_id, r.rule_id) for r in
               z.validate(reshaped, schema, id_cols=["row_id"])
               .violations.select("row_id", "rule_id").collect()}
        assert got == base


def test_pair_kernels_preserve_string_ids(spark):
    """ADVICE r3 regression: the Arrow pair kernels must carry string/
    UUID ids through unchanged — the old cast-to-long aborted under
    ANSI mode (CAST_INVALID_INPUT) or silently emitted zero pairs, and
    semantic_dedup then kept every duplicate."""
    emb = spark.createDataFrame(
        [("doc-a", [1.0, 0.0]), ("doc-b", [1.0, 0.001]),
         ("doc-c", [0.0, 1.0])], "vec_id string, embedding array<double>")
    pairs = dedup.embedding_near_dups(emb, id_col="vec_id",
                                      vec_col="embedding", threshold=0.95)
    assert [(r.id_a, r.id_b) for r in pairs.collect()] \
        == [("doc-a", "doc-b")]
    assert dict(pairs.dtypes)["id_a"] == "string"

    txt = spark.createDataFrame(
        [("u1", "the quick brown fox jumps over the lazy dog"),
         ("u2", "the quick brown fox jumps over the lazy dog"),
         ("u3", "completely different words entirely in here now")],
        "doc_id string, text string")
    jp = dedup.ngram_jaccard_pairs(txt, id_col="doc_id", threshold=0.8)
    assert [(r.id_a, r.id_b) for r in jp.collect()] == [("u1", "u2")]

    kept = dedup.semantic_dedup(emb, id_col="vec_id", vec_col="embedding",
                                centroids=[[1.0, 0.0], [0.0, 1.0]],
                                threshold=0.95)
    assert sorted(r.vec_id for r in kept.collect()) == ["doc-a", "doc-c"]


def test_url_dedup_exempt_rows_skip_window(spark):
    """NULL/empty-url rows are all kept AND never enter the window
    partitioning (ADVICE r3 skew note) — verified behaviorally here,
    plan-wise by the Filter under the Window in explain output."""
    from zoi_spark import urls

    df = spark.createDataFrame(
        [(1, "http://x.com/a"), (2, "http://X.com/a"), (3, None),
         (4, None), (5, "")], "doc_id long, url string")
    out = urls.url_dedup(df)
    assert sorted(r.doc_id for r in out.collect()) == [1, 3, 4, 5]
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" in plan  # exempt split + union-back shape
    ts = df.withColumn("ts", F.col("doc_id").cast("timestamp"))
    out2 = urls.url_dedup_latest(ts, ts_col="ts")
    assert sorted(r.doc_id for r in out2.collect()) == [2, 3, 4, 5]


def test_unpersist_candidates_accepts_all_shapes(spark):
    """_zoi_persisted is a list everywhere now; unpersist_candidates
    also accepts a bare frame (older callers) and frames without the
    attribute (no-op)."""
    df = spark.range(4).toDF("x")
    dedup.unpersist_candidates(df)  # no attribute: no-op
    cached = spark.range(4).toDF("y").persist()
    df._zoi_persisted = cached
    dedup.unpersist_candidates(df)  # bare-frame shape
    assert not cached.is_cached
    c2 = spark.range(4).toDF("z").persist()
    df._zoi_persisted = [c2]
    dedup.unpersist_candidates(df)
    assert not c2.is_cached


def test_curate_decontamination_gate(spark):
    """curate with decontam_probes: exact 13-gram mode drops the doc
    quoting a benchmark item verbatim; fuzzy mode also drops the
    paraphrase-by-truncation that shares no 13-gram; clean docs stay."""
    from zoi_spark import pipeline

    bench = ("what is the capital of france answer paris because it has "
             "been the seat of government for many centuries running")
    clean = ("a wholly unrelated page about tending garden tomatoes in "
             "late summer with notes on watering mulch and sunlight")
    # verbatim quote inside a longer page -> shares 13-grams
    quoting = "intro words " + bench + " closing words"
    # first ~60% of the benchmark tokens -> high Jaccard, no shared 13-gram
    fuzzy = " ".join(bench.split()[:12])
    df = spark.createDataFrame(
        [(1, clean), (2, quoting), (3, fuzzy)],
        "doc_id long, text string")
    probes = spark.createDataFrame([(100, bench)],
                                   "probe_id long, probe_text string")
    schema = z.fields({"doc_id": z.integer(), "text": z.string(min=5)})

    exact = pipeline.curate(df, schema, id_col="doc_id",
                            decontam_probes=probes, approx_rows=3)
    kept = {r.doc_id for r in exact.kept.select("doc_id").collect()}
    assert kept == {1, 3}          # verbatim quote dropped, fuzzy survives
    assert "decontaminated" in exact.stages
    exact.release()

    fz = pipeline.curate(df, schema, id_col="doc_id",
                         decontam_probes=probes,
                         decontam_fuzzy_threshold=0.5, approx_rows=3)
    kept = {r.doc_id for r in fz.kept.select("doc_id").collect()}
    assert kept == {1}             # truncated paraphrase dropped too
    fz.release()


def test_host_reputation_flags_and_min_docs_gate(spark):
    from zoi_spark import urls

    rows = ([("junk.example", 0.2)] * 6          # low quality, enough docs
            + [("good.example", 0.9)] * 6        # high quality
            + [("tiny.example", 0.1)] * 2)       # junk but too few docs
    df = spark.createDataFrame(rows, "host string, quality double")
    rep = {r["host"]: r.asDict() for r in urls.host_reputation(
        df, min_docs=5, min_avg_quality=0.5).collect()}
    assert rep["junk.example"]["host_flagged"] is True
    assert rep["good.example"]["host_flagged"] is False
    assert rep["tiny.example"]["host_flagged"] is False  # benefit of doubt
    assert rep["junk.example"]["n_docs"] == 6
    assert rep["good.example"]["avg_quality"] == 0.9


def test_curate_split_stamping(spark):
    from zoi_spark import pipeline
    from zoi_spark.cli import parse_split

    assert parse_split("train:0.8,val:0.1,test:0.1") == {
        "train": 0.8, "val": 0.1, "test": 0.1}
    with pytest.raises(ValueError):
        parse_split("train")

    rows = [(i, f"plain document number {i} with agreeable words "
                "that run long enough to shingle cleanly")
            for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    schema = z.fields({"doc_id": z.integer(), "text": z.string(min=5)})
    res = pipeline.curate(df, schema, id_col="doc_id", approx_rows=30,
                          split_weights={"train": 0.8, "val": 0.2})
    assert "split" in res.kept.columns
    got = {r["split"] for r in res.kept.select("split").distinct().collect()}
    assert got <= {"train", "val"} and "train" in got
    res.release()


class TestCorrelationStats:
    def test_pairs_and_values(self, spark):
        from zoi_spark import tablechecks
        # y = 2x (corr 1), z constant (corr NULL, zero variance)
        d = spark.createDataFrame(
            [(1.0, 2.0, 5.0), (2.0, 4.0, 5.0), (3.0, 6.0, 5.0),
             (4.0, 8.0, 5.0)],
            "x double, y double, z double")
        out = tablechecks.correlation_stats(d, ["x", "y", "z"])
        rows = {(r["col_a"], r["col_b"]): r for r in out.collect()}
        assert set(rows) == {("x", "y"), ("x", "z"), ("y", "z")}
        assert rows[("x", "y")]["corr"] == 1.0
        # sample covariance of x with y=2x: 2 * var_samp(x) = 2*(5/3)
        assert rows[("x", "y")]["covar"] == round(2 * 5 / 3, 6)
        assert rows[("x", "z")]["corr"] is None
        assert rows[("x", "z")]["covar"] == 0.0

    def test_single_pass_plan(self, spark):
        from zoi_spark import tablechecks
        d = spark.range(100).selectExpr(
            "cast(id as double) x", "cast(id * id as double) y",
            "cast(id % 7 as double) z")
        out = tablechecks.correlation_stats(d, ["x", "y", "z"])
        plan = out._jdf.queryExecution().executedPlan().toString()
        # one aggregate pass: no join, no Python, single exchange
        assert "Join" not in plan and "Python" not in plan
        assert plan.count("Exchange") <= 1

    def test_needs_two_columns(self, spark):
        from zoi_spark import tablechecks
        import pytest as _pt
        d = spark.range(3).selectExpr("cast(id as double) x")
        with _pt.raises(ValueError):
            tablechecks.correlation_stats(d, ["x"])


class TestContainmentPairs:
    def test_directed_asymmetry(self, spark):
        from zoi_spark import dedup
        d = spark.createDataFrame(
            [(1, "a b c d e f"),   # shingles: abc bcd cde def
             (2, "a b c d"),       # shingles: abc bcd
             (3, "x y z")],
            "doc_id long, text string")
        out = dedup.containment_pairs(d, threshold=0.9, shingle_n=3)
        rows = [(r["id_a"], r["id_b"], r["n_shared"], r["containment"])
                for r in out.collect()]
        # doc2 fully contained in doc1; the reverse is 0.5 and cut
        assert rows == [(2, 1, 2, 1.0)]
        dedup.unpersist_candidates(out)

    def test_both_directions_for_exact_dups(self, spark):
        from zoi_spark import dedup
        d = spark.createDataFrame(
            [(1, "a b c d"), (2, "a b c d")], "doc_id long, text string")
        out = dedup.containment_pairs(d, threshold=0.9, shingle_n=3)
        got = sorted((r["id_a"], r["id_b"], r["containment"])
                     for r in out.collect())
        assert got == [(1, 2, 1.0), (2, 1, 1.0)]

    def test_shingle_doc_cap_prunes_boilerplate(self, spark):
        from zoi_spark import dedup
        d = spark.createDataFrame(
            [(1, "p q r"), (2, "p q r s"), (3, "p q r t")],
            "doc_id long, text string")
        uncapped = dedup.containment_pairs(d, threshold=0.9, shingle_n=3)
        assert uncapped.count() > 0   # "p q r" links everything
        capped = dedup.containment_pairs(d, threshold=0.9, shingle_n=3,
                                         max_shingle_docs=2)
        # the df=3 shingle is dropped from intersections AND sizes
        assert capped.count() == 0
        dedup.unpersist_candidates(uncapped)
        dedup.unpersist_candidates(capped)


def test_domain_blocklist_flags_suffix_semantics(spark):
    from zoi_spark import urls

    rows = [(1, "http://TRACKER.example/a"),        # exact, case-folded
            (2, "http://ads.tracker.example/b"),    # subdomain inherits
            (3, "http://nottracker.example/c"),     # sibling stays clean
            (4, "http://x.ads.example.com/d"),      # two matches -> deepest
            (5, "http://clean.org/e")]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r.doc_id: r for r in urls.domain_blocklist_flags(
        df, ["tracker.example", "ads.example.com", "example.com"])
        .collect()}
    assert out[1].blocked_domain == "tracker.example"
    assert out[2].blocked_domain == "tracker.example"
    assert out[3].blocked is False and out[3].blocked_domain is None
    assert out[4].blocked_domain == "ads.example.com"   # longest wins
    assert out[5].blocked is False
    assert out[1].host == "tracker.example"             # lowercased

    with pytest.raises(ValueError):
        urls.domain_blocklist_flags(df, [])


def test_path_templates_volume_trap(spark):
    from zoi_spark import urls

    rows = ([(i, f"http://a.example/item/{i}/view") for i in range(6)]
            + [(9, "http://a.example/about"), (10, "http://a.example/about")]
            + [(11, "http://b.example/item/1/view")])
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {(r.host, r.path_template): r
           for r in urls.path_templates(df, min_urls=5).collect()}
    trap = out[("a.example", "/item/{N}/view")]
    assert (trap.n_urls, trap.trap) == (6, True)
    about = out[("a.example", "/about")]          # repeated url counts once
    assert (about.n_urls, about.trap) == (1, False)
    assert out[("b.example", "/item/{N}/view")].trap is False


def test_quantize_and_quantized_topk(spark):
    from zoi_spark import similarity

    rows = [(0, [1.0, 0.0]), (1, [0.5, 0.5]), (2, [-1.0, 0.0]),
            (3, [0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qz = similarity.with_quantized(df)
    q = {r.vec_id: r for r in qz.collect()}
    assert q[0].q == [127, 0] and abs(q[0].q_scale - 1 / 127) < 1e-12
    assert q[1].q == [127, 127]
    assert q[2].q == [-127, 0]
    assert q[3].q_scale is None and q[3].q == [0, 0]   # zero vector

    queries = (qz.where(F.col("vec_id") == 0)
               .selectExpr("vec_id AS query_id", "q"))
    top = similarity.quantized_topk(qz, queries, k=4).collect()
    got = [(r.vec_id, r.q_cosine) for r in sorted(top, key=lambda r: r.rank)]
    # cos(0,1)=1/sqrt(2); cos(0,2)=-1; zero vector excluded
    assert got[0][0] == 1 and abs(got[0][1] - round(2 ** -0.5, 6)) < 1e-9
    assert got[1] == (2, -1.0)
    assert len(got) == 2


def test_js_divergence_pairs_hand_check(spark):
    import math

    from zoi_spark import tablechecks

    rows = ([("g1", "x")] * 2 + [("g1", "y")]      # p = (2/3, 1/3)
            + [("g2", "y"), ("g2", "z")]           # q = (1/2, 1/2)
            + [("g3", "x")] * 2 + [("g3", "y")]    # same dist as g1
            + [("g4", "w")])                       # disjoint support
    df = spark.createDataFrame(rows, "src string, v string")
    out = {(r.g_a, r.g_b): r.js_divergence
           for r in tablechecks.js_divergence_pairs(
               df, group_col="src", value_col="v").collect()}
    pa, pb = 1 / 3, 1 / 2
    term = (pa * math.log2(2 * pa / (pa + pb))
            + pb * math.log2(2 * pb / (pa + pb)))
    expect = 0.5 * term + 0.5 * (1 - pa) + 0.5 * (1 - pb)
    assert abs(out[("g1", "g2")] - round(expect, 6)) < 1e-9
    assert out[("g1", "g3")] == 0.0          # identical distributions
    assert out[("g1", "g4")] == 1.0          # disjoint support -> 1 bit
    assert len(out) == 6                     # all 4C2 pairs present


def test_host_concentration_hhi_and_topk(spark):
    from zoi_spark import urls

    rows = ([(i, "big.example") for i in range(6)]
            + [(10, "a.example"), (11, "b.example"),
               (12, None), (13, "")])
    df = spark.createDataFrame(rows, "doc_id long, host string")
    r = urls.host_concentration(df, top_k=1).first()
    # shares: 6/8, 1/8, 1/8 -> HHI = 36/64 + 2/64 = 38/64
    assert (r.n_hosts, r.n_docs) == (3, 8)
    assert abs(r.hhi - round(38 / 64, 6)) < 1e-9
    assert abs(r.topk_share - 0.75) < 1e-9


def test_recall_at_k_join_semantics(spark):
    from zoi_spark import similarity

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20), (2, 21)],
        "query_id long, vec_id long")
    approx = spark.createDataFrame(
        [(1, 10), (1, 99), (1, 12), (2, 33), (2, 34)],
        "query_id long, vec_id long")
    out = {r.query_id: r for r in similarity.recall_at_k(
        approx, exact).collect()}
    assert (out[1].n_exact, out[1].n_hit) == (3, 2)
    assert abs(out[1].recall - round(2 / 3, 6)) < 1e-9
    assert (out[2].n_hit, out[2].recall) == (0, 0.0)


def test_cluster_size_histogram(spark):
    from zoi_spark import dedup

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 6)],
        "doc_id long, cluster_id long")
    out = {r.cluster_size: r for r in dedup.cluster_size_histogram(
        clusters).collect()}
    assert (out[3].n_clusters, out[3].n_docs) == (1, 3)
    assert (out[2].n_clusters, out[2].n_docs) == (1, 2)
    assert (out[1].n_clusters, out[1].n_docs) == (1, 1)


def test_js_divergence_null_category_is_shared_mass(spark):
    from zoi_spark import tablechecks

    # identical distributions {NULL: 0.5, x: 0.5} -> JS must be 0
    rows = [("g1", None), ("g1", "x"), ("g2", None), ("g2", "x")]
    df = spark.createDataFrame(rows, "src string, v string")
    out = tablechecks.js_divergence_pairs(
        df, group_col="src", value_col="v").first()
    assert out.js_divergence == 0.0


def test_recall_at_k_dedups_approx_rows(spark):
    from zoi_spark import similarity

    exact = spark.createDataFrame([(1, 10), (1, 11)],
                                  "query_id long, vec_id long")
    approx = spark.createDataFrame([(1, 10), (1, 10)],   # dup row
                                   "query_id long, vec_id long")
    r = similarity.recall_at_k(approx, exact).first()
    assert (r.n_exact, r.n_hit, r.recall) == (2, 1, 0.5)


def test_benford_profile_hand_digits(spark):
    from zoi_spark import tablechecks

    # 3e-10 pins the tiny-magnitude path: a fixed-decimal formatter
    # renders it as all zeros and aborts the ANSI int cast; the
    # scientific-notation extraction reads digit 3
    vals = [1.5, -19.0, 0.0, None, 250.0, 0.02, 3e-10]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = {r.digit: r for r in
           tablechecks.benford_profile(df, "v").collect()}
    assert sorted(out) == list(range(1, 10))   # all 9 rows, always
    # 1.5 -> 1, -19 -> 1, 250 -> 2, 0.02 -> 2, 3e-10 -> 3; 0/NULL out
    assert (out[1].n, out[2].n, out[3].n) == (2, 2, 1)
    assert out[1].observed_p == 0.4 and out[2].observed_p == 0.4
    assert out[3].observed_p == 0.2
    assert all(out[d].n == 0 and out[d].observed_p == 0.0
               for d in range(4, 10))
    import math
    assert out[1].benford_p == round(math.log10(2.0), 6)


def test_chi2_independence_hand_table(spark):
    from zoi_spark import tablechecks

    # classic 2x2: a=(x:30,y:10 | x:10,y:30) -> chi2 = 80*... hand:
    # margins 40/40, 40/40, n=80, every expected cell = 20,
    # chi2 = 4 * (10^2/20) = 20; dof = 1; V = sqrt(20/80) = 0.5
    rows = ([("a", "x")] * 30 + [("a", "y")] * 10 +
            [("b", "x")] * 10 + [("b", "y")] * 30 +
            [(None, "x")] * 5 + [("a", None)] * 5)   # NULLs excluded
    df = spark.createDataFrame(rows, "u string, v string")
    r = tablechecks.chi2_independence(df, "u", "v").first()
    assert (r.chi2, r.dof, r.n_rows, r.cramers_v) == (20.0, 1, 80, 0.5)


def test_chi2_counts_zero_observed_cells(spark):
    from zoi_spark import tablechecks

    # (a,y) never observed: the zero cell must still contribute
    rows = [("a", "x")] * 2 + [("b", "x")] * 1 + [("b", "y")] * 1
    df = spark.createDataFrame(rows, "u string, v string")
    r = tablechecks.chi2_independence(df, "u", "v").first()
    # expected: a/x 1.5, a/y .5, b/x 1.5, b/y .5 ->
    # chi2 = .25/1.5 + .25/.5 + .25/1.5 + .25/.5 = 4/3
    assert r.chi2 == round(4.0 / 3.0, 6) and r.dof == 1


def test_group_entropy_hand_values(spark):
    from zoi_spark import tablechecks

    rows = ([("s1", "en")] * 2 + [("s1", "de")] * 2 +    # uniform: 1 bit
            [("s2", "en")] * 4 +                          # pure: 0 bits
            [("s2", None)] * 4 +                          # NULL category
            [(None, "en")])                               # NULL group out
    df = spark.createDataFrame(rows, "source string, lang string")
    out = {r.source: r for r in tablechecks.group_entropy(
        df, group_col="source", cat_col="lang").collect()}
    assert set(out) == {"s1", "s2"}
    assert (out["s1"].n_rows, out["s1"].n_cats) == (4, 2)
    assert out["s1"].entropy == 1.0
    assert (out["s2"].n_rows, out["s2"].n_cats) == (8, 2)
    assert out["s2"].entropy == 1.0      # en/NULL 50:50 -> 1 bit


def test_interarrival_stats_hand_gaps(spark):
    import datetime as dt

    from zoi_spark import tablechecks

    t0 = dt.datetime(2026, 1, 1)
    rows = [  # user 1: gaps 10s, 50s (types of LATER events: p, q)
        (1, t0, "p", 1), (1, t0 + dt.timedelta(seconds=10), "p", 2),
        (1, t0 + dt.timedelta(seconds=60), "q", 3),
        # user 2: one event -> no gaps; NULL ts row ignored
        (2, t0, "p", 4), (2, None, "p", 5)]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, "
              "event_id long")
    out = {r.event_type: r for r in tablechecks.interarrival_stats(
        df, ts_col="ts", entity_col="user_id", order_col="event_id",
        group_col="event_type").collect()}
    assert (out["p"].n_gaps, out["p"].mean_gap) == (1, 10.0)
    assert (out["q"].min_gap, out["q"].max_gap) == (50.0, 50.0)


def test_readability_hand_flesch(spark):
    from zoi_spark import text as ztext

    d = spark.createDataFrame([("en", "Hi there. One two three!")],
                              "lang string, text string")
    r = ztext.readability_profile(d).first()
    # words 5, sentence runs 2, vowel groups 7 ->
    # 206.835 - 1.015*(5/2) - 84.6*(7/5) = 85.8575
    assert (r.n_docs, r.mean_words) == (1, 5.0)
    assert r.words_per_sentence == 2.5
    assert r.syllables_per_word == 1.4
    assert r.mean_flesch == 85.8575


def test_readability_excludes_empty_docs(spark):
    from zoi_spark import text as ztext

    d = spark.createDataFrame([("en", ""), ("en", "word.")],
                              "lang string, text string")
    r = ztext.readability_profile(d).first()
    assert r.n_docs == 1


def test_gini_hand_values(spark):
    from zoi_spark import tablechecks

    rows = ([("even", 5, i) for i in range(4)] +
            [("skew", 0, 1), ("skew", 0, 2), ("skew", 0, 3),
             ("skew", 10, 4)] +
            [("zero", 0, 1)])
    df = spark.createDataFrame(rows, "g string, x long, id long")
    out = {r.g: r for r in tablechecks.gini(
        df, group_col="g", value_col="x", order_col="id").collect()}
    assert out["even"].gini == 0.0
    # ranks 1..4 over [0,0,0,10]: (2*40 - 5*10) / (4*10) = 0.75
    assert (out["skew"].gini, out["skew"].total) == (0.75, 10)
    assert out["zero"].gini is None


def test_winsorize_stats_hand_thresholds(spark):
    from zoi_spark import sampling

    rows = [("en", v, v) for v in range(1, 11)]
    df = spark.createDataFrame(rows, "lang string, x long, id long")
    r = sampling.winsorize_stats(df, stratum_col="lang", value_col="x",
                                 order_col="id", p_low=0.1,
                                 p_high=0.9).first()
    # rank ceil(.1*10)=1 -> lo=1; rank ceil(.9*10)=9 -> hi=9
    assert (r.lo, r.hi) == (1, 9)
    assert (r.n_clipped_low, r.n_clipped_high) == (0, 1)
    assert r.winsorized_mean == 5.4          # (45 - 10 + 9) / 10


def test_winsorize_stats_validates_ps(spark):
    from zoi_spark import sampling

    df = spark.createDataFrame([("en", 1, 1)],
                               "lang string, x long, id long")
    with pytest.raises(ValueError, match="p_low"):
        sampling.winsorize_stats(df, stratum_col="lang", value_col="x",
                                 order_col="id", p_low=0.9, p_high=0.1)


def test_json_field_profile_malformed_counted(spark):
    from zoi_spark import tablechecks

    rows = [("a", '{"k": 3}'), ("a", '{"k": 5}'),
            ("a", '{"other": 1}'),          # missing field
            ("a", "not json"),              # malformed
            ("b", '{"k": "text"}')]         # non-numeric
    df = spark.createDataFrame(rows, "t string, props string")
    out = {r.t: r for r in tablechecks.json_field_profile(
        df, json_col="props", field="k", group_col="t").collect()}
    assert (out["a"].n_rows, out["a"].n_missing) == (4, 2)
    assert (out["a"].min_value, out["a"].max_value) == (3, 5)
    assert out["a"].mean_value == 4.0
    assert (out["b"].n_missing, out["b"].mean_value) == (1, None)


def test_funnel_stages_hand_users(spark):
    import datetime as dt

    from zoi_spark import tablechecks

    t = lambda m: dt.datetime(2026, 1, 1, 0, m)
    rows = [  # u1 completes the funnel in order
        (1, t(0), "signup"), (1, t(1), "view"), (1, t(2), "click"),
        (1, t(3), "purchase"),
        # u2 stops after view
        (2, t(0), "signup"), (2, t(5), "view"),
        # u3's first view precedes signup -> stage 1 only
        (3, t(0), "view"), (3, t(1), "signup"),
        # u4 never signs up -> not an entrant
        (4, t(0), "view"), (4, t(1), "click")]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string")
    out = {r.stage_idx: r for r in tablechecks.funnel_stages(
        df, user_col="user_id", ts_col="ts", type_col="event_type",
        stages=["signup", "view", "click", "purchase"]).collect()}
    assert [out[i].n_users for i in (1, 2, 3, 4)] == [3, 2, 1, 1]
    assert out[1].conversion == 1.0
    assert out[2].conversion == round(2 / 3, 6)
    assert out[3].conversion == 0.5 and out[4].conversion == 1.0


def test_funnel_stages_validates(spark):
    from zoi_spark import tablechecks

    df = spark.createDataFrame([(1,)], "user_id long")
    with pytest.raises(ValueError, match="stages"):
        tablechecks.funnel_stages(df, user_col="user_id", ts_col="ts",
                                  type_col="t", stages=["only"])


def test_prefix_dup_groups_truncation_and_short(spark):
    from zoi_spark import dedup

    head = "w " * 40
    rows = [(1, head + "unique tail one"),
            (2, head + "completely different tail"),
            (3, "standalone body three"),
            (4, "tiny"), (5, "tiny")]        # short docs: whole text
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.prefix_dup_groups(df, k=32).collect()
    groups = {}
    for r in out:
        groups.setdefault(r.prefix_md5, []).append(r)
    assert len(groups) == 2
    by_ids = {tuple(sorted(x.doc_id for x in g)): g
              for g in groups.values()}
    assert set(by_ids) == {(1, 2), (4, 5)}
    assert all(x.first_doc == 1 and x.n_docs == 2
               for x in by_ids[(1, 2)])
    assert 3 not in {r.doc_id for r in out}   # singleton omitted


def test_query_param_profile_hand_urls(spark):
    from zoi_spark import urls

    rows = [("http://a/x?utm=1&id=7",),
            ("http://a/y?utm=2&empty=",),
            ("http://a/y?utm=2&empty=",),     # same url: distinct once
            ("http://a/z?flag",),
            ("http://a/plain",), (None,)]
    df = spark.createDataFrame(rows, "url string")
    out = {r.param: r for r in urls.query_param_profile(df).collect()}
    assert (out["utm"].n_urls, out["utm"].n_occurrences,
            out["utm"].n_with_value) == (2, 3, 3)
    assert (out["empty"].n_urls, out["empty"].n_with_value) == (1, 0)
    assert (out["flag"].n_occurrences, out["flag"].n_with_value) \
        == (1, 0)
    assert "plain" not in out


def test_daily_volume_anomalies_integer_ztest(spark):
    import datetime as dt

    from zoi_spark import tablechecks

    rows = []
    # type 'a': 1 event/day for 9 days, 20 on day 10 -> one anomaly
    for d in range(9):
        rows.append(("a", dt.datetime(2026, 1, 1 + d)))
    rows += [("a", dt.datetime(2026, 1, 10, h % 24)) for h in range(20)]
    # type 'b': perfectly flat -> variance 0, no anomalies
    for d in range(5):
        rows += [("b", dt.datetime(2026, 1, 1 + d))] * 3
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {r.event_type: r for r in tablechecks.daily_volume_anomalies(
        df, ts_col="ts", group_col="event_type", z=1.5).collect()}
    a = out["a"]
    assert (a.n_days, a.total, a.n_anomaly_days) == (10, 29, 1)
    assert a.mean_daily == 2.9
    assert (out["b"].n_anomaly_days, out["b"].mean_daily) == (0, 3.0)


def test_ab_readout_deterministic_and_partitioned(spark):
    from zoi_spark import sampling

    rows = [(u, float(u % 7)) for u in range(200) for _ in range(2)]
    df = spark.createDataFrame(rows, "user_id long, value double")
    out1 = sorted(map(tuple, sampling.ab_readout(
        df, unit_col="user_id", value_col="value", seed="s",
        arms=4).collect()))
    out2 = sorted(map(tuple, sampling.ab_readout(
        df, unit_col="user_id", value_col="value", seed="s",
        arms=4).collect()))
    assert out1 == out2
    assert sum(r[2] for r in out1) == 200      # units partition exactly
    assert sum(r[1] for r in out1) == 400
    with pytest.raises(ValueError):
        sampling.ab_readout(df, unit_col="user_id", value_col="value",
                            arms=1)


def test_retention_cohorts_hand_matrix(spark):
    import datetime as dt

    from zoi_spark import tablechecks

    w = lambda k, d=0: dt.datetime(2026, 1, 5 + 7 * k + d)  # Mondays
    rows = [(1, w(0)), (1, w(0, 3)), (1, w(1)),   # cohort W0: wk 0,0,1
            (2, w(0, 1)),                          # cohort W0: wk 0
            (3, w(1)), (3, w(3)),                  # cohort W1: wk 0,2
            (None, w(0))]                          # NULL user excluded
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {(str(r.cohort_week), r.week_offset): r.n_users
           for r in tablechecks.retention_cohorts(
               df, user_col="user_id", ts_col="ts").collect()}
    assert out == {("2026-01-05", 0): 2, ("2026-01-05", 1): 1,
                   ("2026-01-12", 0): 1, ("2026-01-12", 2): 1}


def test_tld_profile_fallbacks(spark):
    from zoi_spark import urls

    rows = [("http://a.example/x",), ("https://b.example/y",),
            ("http://a.example/z?q=1",), ("http://localhost/w",),
            (None,)]
    df = spark.createDataFrame(rows, "url string")
    out = {r.tld: r for r in urls.tld_profile(df).collect()}
    assert (out["example"].n_urls, out["example"].n_hosts) == (3, 2)
    assert out["example"].share == 0.75
    assert (out["localhost"].n_urls, out["localhost"].n_hosts) == (1, 1)


def test_mutual_topk_prunes_one_directional(spark):
    from zoi_spark import similarity

    rows = [(1, [1.0, 0.0]), (2, [1.0, 0.01]),
            (3, [0.0, 1.0]), (4, [0.01, 1.0])]
    df = spark.createDataFrame(rows,
                               "vec_id long, embedding array<float>")
    out = {(r.id_a, r.id_b) for r in
           similarity.mutual_topk_pairs(df, k=1).collect()}
    assert out == {(1, 2), (3, 4)}     # cross-cluster links pruned
    # k=3: everyone's top-3 covers all others -> all 6 pairs mutual
    all_pairs = {(r.id_a, r.id_b) for r in
                 similarity.mutual_topk_pairs(df, k=3).collect()}
    assert len(all_pairs) == 6


def test_markov_transitions_hand_matrix(spark):
    from zoi_spark import tablechecks

    rows = [("u1", 1, 1, "a"), ("u1", 2, 2, "b"),
            ("u1", 3, 3, "a"), ("u1", 4, 4, "b"),
            ("u2", 1, 1, "a"), ("u2", 2, 2, "a")]
    df = spark.createDataFrame(rows,
                               "user string, ts long, eid long, s string")
    out = {(r.prev_state, r.next_state): (r.n, r.p) for r in
           tablechecks.markov_transitions(
               df, entity_col="user", ts_col="ts", state_col="s",
               order_col="eid").collect()}
    assert out == {("a", "b"): (2, round(2 / 3, 6)),
                   ("a", "a"): (1, round(1 / 3, 6)),
                   ("b", "a"): (1, 1.0)}


def test_markov_transitions_tiebreak_by_order_col(spark):
    from zoi_spark import tablechecks

    # both events at ts=1: eid decides the sequence a->b (not b->a)
    rows = [("u", 1, 1, "a"), ("u", 1, 2, "b")]
    df = spark.createDataFrame(rows,
                               "user string, ts long, eid long, s string")
    out = [(r.prev_state, r.next_state) for r in
           tablechecks.markov_transitions(
               df, entity_col="user", ts_col="ts", state_col="s",
               order_col="eid").collect()]
    assert out == [("a", "b")]


def test_cusum_shift_hand_series(spark):
    from zoi_spark import tablechecks

    # volumes 1,1,5,5 over 4 days: mean 3; S_k = -2,-4,-2,0 -> ×4 =
    # -8,-16,-8,0; peak at day 2
    rows = [(f"2024-01-0{d} 0{h}:00:00",)
            for d, cnt in [(1, 1), (2, 1), (3, 5), (4, 5)]
            for h in range(cnt)]
    from pyspark.sql import functions as F
    df = spark.createDataFrame(rows, "ts string") \
        .select(F.col("ts").cast("timestamp").alias("ts"))
    out = {str(r.bucket_ts)[:10]: (r.n, r.cusum_scaled, r.is_peak)
           for r in tablechecks.cusum_shift(df, ts_col="ts").collect()}
    assert out == {"2024-01-01": (1, -8, False),
                   "2024-01-02": (1, -16, True),
                   "2024-01-03": (5, -8, False),
                   "2024-01-04": (5, 0, False)}


def test_mann_whitney_hand_values(spark):
    from zoi_spark import tablechecks

    # A = {1, 3}, B = {2, 3}: pairs (a>b): (3,2)=1 win; ties (3,3)=0.5;
    # U_a = 1.5 -> u2_a = 3; AUC = 1.5/4 = 0.375
    rows = [("a", 1), ("a", 3), ("b", 2), ("b", 3)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = tablechecks.mann_whitney_u(df, value_col="v", group_col="g",
                                   group_a="a").collect()[0]
    assert (r.n_a, r.n_b, r.u2_a, r.u2_b) == (2, 2, 3, 5)
    assert r.auc_micro == 375000


def test_rfm_segments_deterministic_quartiles(spark):
    from zoi_spark import tablechecks

    rows = []
    for cust in range(8):
        for k in range(cust + 1):          # frequency 1..8
            rows.append((cust, f"2024-01-{cust+1:02d} 00:00:00",
                         float(10 * (cust + 1))))
    from pyspark.sql import functions as F
    df = spark.createDataFrame(rows, "c long, ts string, amt double") \
        .select("c", F.col("ts").cast("timestamp").alias("ts"), "amt")
    out = tablechecks.rfm_segments(df, entity_col="c", ts_col="ts",
                                   amount_col="amt", buckets=4)
    cells = {(r.r_bucket, r.f_bucket, r.m_bucket): r.n_entities
             for r in out.collect()}
    # recency, frequency and monetary all rank customers identically
    # (cust 7 best on all three) -> diagonal cells, 2 customers each
    assert cells == {(1, 1, 1): 2, (2, 2, 2): 2,
                     (3, 3, 3): 2, (4, 4, 4): 2}
    import pytest as _pt
    with _pt.raises(ValueError):
        tablechecks.rfm_segments(df, entity_col="c", ts_col="ts",
                                 amount_col="amt", buckets=1)


def test_volume_autocorr_alternating_series(spark):
    from zoi_spark import tablechecks

    # daily volumes 1,3,1,3,1,3: lag-1 r = -1, lag-2 r = +1 (up to the
    # truncated-pair edge effect: num pairs < n)
    rows = [(f"2024-01-0{d} 0{h}:00:00",)
            for d, cnt in [(1, 1), (2, 3), (3, 1), (4, 3), (5, 1),
                           (6, 3)]
            for h in range(cnt)]
    from pyspark.sql import functions as F
    df = spark.createDataFrame(rows, "ts string") \
        .select(F.col("ts").cast("timestamp").alias("ts"))
    out = {r.lag: (r.n_pairs, r.r_micro) for r in
           tablechecks.volume_autocorr(df, ts_col="ts",
                                       lags=(1, 2)).collect()}
    # dev×n: x=(1,3,...), mean=2 -> n·x−S = ±6; den = 6·36 = 216
    # lag1: 5 pairs all opposite-sign -> num = −5·36 = −180 -> −833333
    # lag2: 4 pairs all same-sign -> num = 144... wait 4·36 = 144
    assert out[1] == (5, round(1e6 * -180 / 216))
    assert out[2] == (4, round(1e6 * 144 / 216))


def test_path_ngrams_hand_runs(spark):
    from zoi_spark import tablechecks

    rows = [("u1", 1, 1, "a"), ("u1", 2, 2, "b"), ("u1", 3, 3, "c"),
            ("u1", 4, 4, "b"), ("u2", 1, 1, "a"), ("u2", 2, 2, "b")]
    df = spark.createDataFrame(rows,
                               "user string, ts long, eid long, s string")
    out = {r.path: r.n_occurrences for r in
           tablechecks.path_ngrams(df, entity_col="user", ts_col="ts",
                                   state_col="s", n=3,
                                   order_col="eid").collect()}
    # u1: a>b>c, b>c>b; u2 too short for n=3
    assert out == {"a>b>c": 1, "b>c>b": 1}
    import pytest as _pt
    with _pt.raises(ValueError):
        tablechecks.path_ngrams(df, entity_col="user", ts_col="ts",
                                state_col="s", n=1)


def test_key_skew_profile_shares_and_nulls(spark):
    from zoi_spark import tablechecks

    rows = [(1,)] * 6 + [(2,)] * 3 + [(None,)] * 1
    df = spark.createDataFrame(rows, "k long")
    out = {r.rank: (r.key, r.n_rows, r.share_micro) for r in
           tablechecks.key_skew_profile(df, key_col="k",
                                        top_k=2).collect()}
    assert out == {1: ("1", 6, 600000), 2: ("2", 3, 300000)}
    # NULL key participates when k is large enough
    all3 = tablechecks.key_skew_profile(df, key_col="k", top_k=5)
    assert sorted((r.key for r in all3.collect()),
                  key=lambda x: (x is None, x)) == ["1", "2", None]


def test_fano_factor_hand_counts(spark):
    from zoi_spark import tablechecks

    # grp a: day counts 1, 3 -> var .. fano = (2*10-16)/(2*4) = 0.5
    # grp b: single day -> fano 0 (n*s2 - s*s = 0)
    rows = [("a", "2024-01-01 00:00:00"), ("a", "2024-01-02 00:00:00"),
            ("a", "2024-01-02 01:00:00"), ("a", "2024-01-02 02:00:00"),
            ("b", "2024-01-01 00:00:00")]
    from pyspark.sql import functions as F
    df = spark.createDataFrame(rows, "g string, ts string") \
        .select("g", F.col("ts").cast("timestamp").alias("ts"))
    out = {r["group"]: (r.n_buckets, r.total, r.fano_micro) for r in
           tablechecks.fano_factor(df, ts_col="ts",
                                   group_col="g").collect()}
    assert out == {"a": (2, 4, 500000), "b": (1, 1, 0)}


def test_mutual_information_extremes(spark):
    from zoi_spark import tablechecks
    import math

    # perfectly dependent: MI == H(a) == ln 2
    dep = spark.createDataFrame([("x", "x"), ("y", "y")] * 3,
                                "a string, b string")
    r = tablechecks.mutual_information(dep, col_a="a",
                                       col_b="b").collect()[0]
    assert r.mi_nats == round(math.log(2), 6) == r.h_a == r.h_b
    # independent uniform 2x2: MI == 0
    ind = spark.createDataFrame(
        [(a, b) for a in "xy" for b in "uv" for _ in range(2)],
        "a string, b string")
    r2 = tablechecks.mutual_information(ind, col_a="a",
                                        col_b="b").collect()[0]
    assert r2.mi_nats == 0.0 and r2.n_cells == 4


def test_volume_trend_hand_slope(spark):
    from zoi_spark import tablechecks

    # grp a: counts 1,2,3 on consecutive days -> slope exactly 1/day
    rows = ([("a", f"2024-01-0{d} 0{h}:00:00")
             for d in (1, 2, 3) for h in range(d)]
            + [("b", "2024-01-01 00:00:00")])
    from pyspark.sql import functions as F
    df = spark.createDataFrame(rows, "g string, ts string") \
        .select("g", F.col("ts").cast("timestamp").alias("ts"))
    out = {r["group"]: (r.n_buckets, r.total, r.slope_micro_per_unit)
           for r in tablechecks.volume_trend(
               df, ts_col="ts", group_col="g").collect()}
    assert out == {"a": (3, 6, 1000000), "b": (1, 1, None)}


def test_snapshot_host_overlap_jaccard(spark):
    from zoi_spark import urls

    rows = [
        ("http://A.com/x", "2024-01-05 00:00:00"),
        ("http://b.com/x", "2024-01-20 00:00:00"),
        ("http://a.com/y", "2024-02-01 00:00:00"),   # case-folds to a.com
        ("http://c.com/x", "2024-02-02 00:00:00"),
        ("http://c.com/y", "2024-02-03 00:00:00"),   # distinct-host dedup
        ("http://d.com/x", "2024-03-01 00:00:00"),
        ("http://nohost", None),                     # NULL ts excluded
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts string") \
        .selectExpr("url", "cast(warc_ts as timestamp) as warc_ts")
    out = {(str(r.snap_a), str(r.snap_b)): r for r in
           urls.snapshot_host_overlap(df).collect()}
    jan_feb = out[("2024-01-01", "2024-02-01")]
    # jan {a,b}, feb {a,c}: common 1, union 3
    assert (jan_feb.hosts_a, jan_feb.hosts_b,
            jan_feb.n_common, jan_feb.jaccard) == (2, 2, 1, 0.333333)
    feb_mar = out[("2024-02-01", "2024-03-01")]
    assert (feb_mar.n_common, feb_mar.jaccard) == (0, 0.0)
    assert len(out) == 2  # consecutive pairs only


def test_mad_outliers_robust_to_tail(spark):
    from zoi_spark import tablechecks

    # group g: nine values near 10 and one wild 1000 — the mean/std
    # would be dragged; median 10, MAD 1 flags only the wild row
    rows = [(i, "g", float(v)) for i, v in
            enumerate([9, 9, 10, 10, 10, 10, 11, 11, 12, 1000])]
    rows += [(100, "flat", 5.0), (101, "flat", 5.0)]  # MAD 0 -> none
    df = spark.createDataFrame(rows, "event_id long, k string, v double")
    out = tablechecks.mad_outliers(df, "v", by="k", k=3.5,
                                   id_col="event_id").collect()
    assert [(r.event_id, r.rule_id) for r in out] == \
        [(9, "v.mad_outlier")]
    assert abs(out[0].mad_score - (1000 - 10) / 1.4826) < 1e-3


def test_power_tail_hill_hand_alpha(spark):
    import math

    from zoi_spark import tablechecks

    # group a: 16,8,4,2 then bulk — k=3 uses top3 vs pivot 2:
    # alpha = 3 / (ln8 + ln4 + ln2) = 3 / (6 ln2)
    rows = [("a", v) for v in [16, 8, 4, 2, 1, 1, 1]]
    rows += [("tiny", 5), ("tiny", 3)]          # <3 rows -> dropped
    rows += [("zero", 0), ("zero", 0), ("zero", 0), ("zero", 0)]
    df = spark.createDataFrame(rows, "lang string, n_chars long")
    out = {r.lang: r for r in
           tablechecks.power_tail_hill(df, "n_chars", by="lang",
                                       k=3).collect()}
    a = out["a"]
    assert (a.n_rows, a.k_used, a.x_tail) == (7, 3, 2)
    assert abs(a.alpha - 3 / (6 * math.log(2))) < 1e-6
    assert "tiny" not in out and "zero" not in out


def test_host_fetch_gaps_cadence(spark):
    from zoi_spark import urls

    rows = [("http://a.com/1", 100), ("http://a.com/2", 160),
            ("http://a.com/3", 400),
            ("http://b.com/1", 0), ("http://b.com/2", 50),  # 2 fetches
            ("http://c.com/1", 10)]
    df = spark.createDataFrame(rows, "url string, t long") \
        .selectExpr("url", "timestamp_seconds(t) as warc_ts")
    out = {r.host: r for r in urls.host_fetch_gaps(df).collect()}
    # only a.com clears min_fetches=3; gaps 60, 240
    assert list(out) == ["a.com"]
    a = out["a.com"]
    assert (a.n_fetches, a.min_gap_s, a.median_gap_s, a.max_gap_s) == \
        (3, 60, 150.0, 240)


def test_diurnal_profile_circular(spark):
    rows = [("peak", f"2024-01-01 09:00:00") for _ in range(4)]
    rows += [("flat", f"2024-01-01 {h:02d}:00:00") for h in (0, 6, 12, 18)]
    rows += [("wrap", "2024-01-01 23:00:00"), ("wrap", "2024-01-02 01:00:00")]
    df = spark.createDataFrame(rows, "k string, ts string") \
        .selectExpr("k", "cast(ts as timestamp) as ts")
    out = {r.group: r for r in
           tablechecks.diurnal_profile(df, ts_col="ts",
                                       group_col="k").collect()}
    assert out["peak"].r_concentration == 1.0
    assert out["peak"].mean_hour == 9.0
    assert out["flat"].r_concentration < 1e-6
    # 23:00 and 01:00 average to midnight, NOT noon
    assert out["wrap"].mean_hour in (0.0, 24.0) or \
        abs(out["wrap"].mean_hour) < 1e-6
    assert abs(out["wrap"].r_concentration
               - 0.965926) < 1e-6          # cos(pi/12)


def test_quantile_normalize_rank_semantics(spark):
    rows = [("a", 10), ("a", 20), ("a", 20), ("a", 40),
            ("b", 7)]
    df = spark.createDataFrame(rows, "src string, v long")
    out = tablechecks.quantile_normalize(df, "v", by="src").collect()
    got = sorted((r.src, r.v, r.pct) for r in out)
    # percent_rank: (rank-1)/(n-1); ties share rank
    assert got == [("a", 10, 0.0), ("a", 20, 0.333333),
                   ("a", 20, 0.333333), ("a", 40, 1.0),
                   ("b", 7, None)]


def test_type_affinity_cosine(spark):
    # u1 touches A,B; u2 touches A,B; u3 touches only C
    rows = [(1, "A"), (1, "A"), (1, "B"),
            (2, "A"), (2, "B"), (2, "B"),
            (3, "C")]
    df = spark.createDataFrame(rows, "user_id long, et string")
    out = {(r.type_a, r.type_b): r for r in
           tablechecks.type_affinity(df, entity_col="user_id",
                                     type_col="et").collect()}
    # vectors over (u1,u2): A=(2,1), B=(1,2); cos = 4/5
    assert list(out) == [("A", "B")]
    r = out[("A", "B")]
    assert r.n_shared_entities == 2
    assert r.cosine == 0.8
    # C shares no entity with anyone -> no row


def test_debounce_events_lag_rule(spark):
    rows = [(1, 10, "c", "2024-01-01 00:00:00"),
            (2, 10, "c", "2024-01-01 00:00:03"),   # 3s gap -> bounce
            (3, 10, "c", "2024-01-01 00:00:06"),   # 3s from #2 (lag rule)
            (4, 10, "c", "2024-01-01 00:01:06"),   # 60s gap -> kept
            (5, 10, "x", "2024-01-01 00:00:01"),   # other type: head
            (6, 11, "c", "2024-01-01 00:00:02")]   # other user: head
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, et string, ts string"
    ).selectExpr("event_id", "user_id", "et",
                 "cast(ts as timestamp) as ts")
    out = {r.event_id: r for r in
           tablechecks.debounce_events(df, entity_col="user_id",
                                       type_col="et", ts_col="ts",
                                       id_col="event_id",
                                       min_gap_s=5).collect()}
    assert (out[1].gap_s, out[1].bounce) == (None, False)
    assert (out[2].gap_s, out[2].bounce) == (3, True)
    # LAG rule: #3's predecessor is #2, not the last KEPT row
    assert (out[3].gap_s, out[3].bounce) == (3, True)
    assert (out[4].gap_s, out[4].bounce) == (60, False)
    assert out[5].gap_s is None and out[6].gap_s is None


def test_lognormal_fit_moments(spark):
    import math

    # stratum a: ln values {0, ln4} -> mu=ln2, sigma=sqrt(2)*ln2
    rows = [("a", 1), ("a", 4),
            ("b", 7),                    # single row -> sigma 0, NULL mass
            ("c", 0), ("c", -3), ("c", 5)]  # non-positives excluded
    df = spark.createDataFrame(rows, "src string, v long")
    out = {r.src: r for r in
           tablechecks.lognormal_fit(df, "v", by="src").collect()}
    ln2 = math.log(2)
    assert out["a"].n == 2
    assert abs(out["a"].mu - round(ln2, 6)) < 1e-9
    assert abs(out["a"].sigma - round(math.sqrt(2) * ln2, 6)) < 1e-9
    # both points inside mu +/- sigma (|ln2| <= sqrt(2) ln2)
    assert out["a"].within_1sigma == 1.0
    assert (out["b"].n, out["b"].sigma, out["b"].within_1sigma) == \
        (1, 0.0, None)
    assert out["c"].n == 1 and out["c"].mu == round(math.log(5), 6)


def test_fd_violations_basic(spark):
    rows = [("a", "x"), ("a", "x"), ("a", "y"),   # a -> {x,y}: violated
            ("b", "z"), ("b", "z"),               # b -> {z}: holds
            ("c", None), ("c", "w")]              # NULL dep ignored: holds
    df = spark.createDataFrame(rows, "k string, v string")
    out = tablechecks.fd_violations(df, ["k"], "v").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.k, r.n_rows, r.n_dependent, r.dep_min, r.dep_max) == \
        ("a", 3, 2, "x", "y")


def test_key_candidates_exact_and_null_tagging(spark):
    rows = [(1, "a", None), (2, "a", ""), (3, "b", "x"), (4, "b", "x")]
    df = spark.createDataFrame(rows, "id long, g string, s string")
    out = {r.combo: r for r in tablechecks.key_candidates(
        df, [["id"], ["g"], ["g", "s"]]).collect()}
    assert out["id"].is_key and out["id"].distinct_ratio == 1.0
    assert not out["g"].is_key and out["g"].n_distinct == 2
    # NULL-tagging: (a,NULL) != (a,'') -> 3 distinct pairs, not 2
    assert out["g+s"].n_distinct == 3
    # HLL variant keeps the same shape
    approx = {r.combo: r for r in tablechecks.key_candidates(
        df, [["id"]], exact=False).collect()}
    assert approx["id"].n_rows == 4


def test_completeness_matrix_empty_string_counts(spark):
    rows = [("s1", "hello", 5), ("s1", "", None), ("s2", None, 3)]
    df = spark.createDataFrame(rows, "src string, t string, n long")
    out = {(r.segment, r.column): r for r in
           tablechecks.completeness_matrix(df, ["t", "n"], by="src")
           .collect()}
    assert out[("s1", "t")].n_null == 1          # '' counts for strings
    assert out[("s1", "n")].n_null == 1
    assert out[("s2", "t")].null_rate == 1.0
    assert out[("s2", "n")].n_null == 0


def test_kmv_overlap_exact_small_sides(spark):
    # both sides < k -> the sketch IS the set: exact counts
    a = spark.createDataFrame([(f"u{i}",) for i in range(40)], "u string")
    b = spark.createDataFrame([(f"u{i}",) for i in range(20, 60)],
                              "u string")
    r = tablechecks.kmv_overlap(a, b, "u", k=256).collect()[0]
    assert (r.d_a_est, r.d_b_est, r.d_union_est) == (40.0, 40.0, 60.0)
    assert abs(r.d_intersection_est - 20.0) < 1e-6
    assert abs(r.jaccard_est - 20.0 / 60.0) < 1e-6


def test_content_churn_counts(spark):
    from zoi_spark import urls as U

    mk = lambda s, p, t: (s, f"http://h{p % 2}.com/p/{p}", t)
    rows = ([mk(0, p, f"c{p}") for p in range(10)]
            + [mk(1, p, f"c{p}" if p % 5 else f"c{p}!") for p in range(8)])
    df = spark.createDataFrame(rows, "snap int, url string, text string")
    out = {r.host: r for r in U.content_churn(df).collect()}
    # pages 0..7 common; changed: p in {0,5} -> hosts h0 gets p=0, h1 p=5
    assert out["h0.com"].n_common == 4 and out["h0.com"].n_changed == 1
    assert out["h1.com"].n_common == 4 and out["h1.com"].n_changed == 1
    import pytest as _pt
    with _pt.raises(ValueError):
        U.content_churn(df.where("snap = 0"))


def test_interval_overlaps_running_max(spark):
    rows = [("u", 1, 0, 100),    # long interval
            ("u", 2, 10, 20),    # inside #1 (running max catches it)
            ("u", 3, 50, 60),    # inside #1 even though #2 ended
            ("u", 4, 100, 110),  # touches end: start == prev_end, OK
            ("v", 5, 10, 20)]    # other entity, clean
    df = spark.createDataFrame(rows, "e string, id int, s long, t long")
    out = {r.id: r for r in tablechecks.interval_overlaps(
        df, entity_col="e", start_col="s", end_col="t",
        id_col="id").collect()}
    assert set(out) == {2, 3}
    assert out[2].overlap == 10 and out[2].prev_end == 100
    assert out[3].overlap == 10


def test_sequence_violations_kinds(spark):
    rows = [("a", 1, "signup"), ("a", 2, "purchase"),   # fine
            ("b", 5, "purchase"), ("b", 9, "signup"),   # out of order
            ("c", 3, "purchase"),                       # no signup
            ("d", 4, "signup")]                         # no purchase
    df = spark.createDataFrame(rows, "u string, ts long, t string")
    out = {r.u: r for r in tablechecks.sequence_violations(
        df, entity_col="u", ts_col="ts", type_col="t",
        first_type="signup", then_type="purchase").collect()}
    assert set(out) == {"b", "c"}
    assert out["b"].kind == "out_of_order" and out["b"].then_ts == 5
    assert out["c"].kind == "missing_precursor"


def test_reconcile_totals_cents(spark):
    from pyspark.sql import functions as F

    fact = spark.createDataFrame(
        [(1, "A", 10.00), (2, "A", 5.00), (3, "B", 7.77)],
        "k long, st string, total double")
    det = spark.createDataFrame(
        [(1, 6.00), (1, 4.00),       # matches
         (2, 5.02)],                 # off by 2 cents
        "k long, v double")          # fact 3 has no detail
    out = {r.st: r for r in tablechecks.reconcile_totals(
        fact, det, key="k", fact_cents=F.round(F.col("total") * 100, 0),
        detail_cents=F.round(F.col("v") * 100, 0), by="st",
        tol_cents=1).collect()}
    assert out["A"].n_facts == 2 and out["A"].n_mismatch == 1
    assert out["A"].max_abs_delta_cents == 2
    assert out["B"].n_missing_detail == 1 and out["B"].n_mismatch == 0


def test_dup_rate_by_group(spark):
    from zoi_spark import dedup as D

    rows = [("s1", "a"), ("s1", "a"), ("s1", "b"),
            ("s2", "x"), ("s2", "y")]
    df = spark.createDataFrame(rows, "src string, text string")
    out = {r.group: r for r in
           D.dup_rate_by_group(df, group_col="src").collect()}
    assert out["s1"].n_distinct == 2
    assert abs(out["s1"].dup_rate - (1 - 2 / 3)) < 1e-6
    assert out["s2"].dup_rate == 0.0


def test_derived_mismatch_null_and_tol(spark):
    from pyspark.sql import functions as F

    rows = [("a", 10, "x" * 10), ("a", 12, "x" * 10),   # delta 2
            ("b", None, "hi"), ("b", 2, None),          # one-sided NULLs
            ("c", None, None)]                          # both NULL: ok
    df = spark.createDataFrame(rows, "src string, n int, t string")
    out = {r.src: r for r in tablechecks.derived_mismatch(
        df, stored_col="n", derived=F.length("t"), by="src",
        tol=1).collect()}
    assert out["a"].n_mismatch == 1 and out["a"].max_abs_delta == 2
    assert out["b"].n_mismatch == 2
    assert out["c"].n_mismatch == 0


def test_mode_share_null_tag_and_tiebreak(spark):
    rows = [("x", None), ("x", None), ("y", "b"), ("z", "a")]
    df = spark.createDataFrame(rows, "g string, v string")
    out = {r.column: r for r in
           tablechecks.mode_share(df, ["g", "v"]).collect()}
    # v: NULL dominates (2 of 4)
    assert out["v"].top_value == "\x01NULL" and out["v"].top_share == 0.5
    # g: x has 2; ties among y/z don't matter
    assert out["g"].top_value == "x" and out["g"].n_top == 2
    # deterministic tie-break: equal counts -> larger value wins
    df2 = spark.createDataFrame([("a",), ("b",)], "v string")
    assert tablechecks.mode_share(df2, ["v"]).collect()[0].top_value == "b"


def test_rate_cap_violations_tumbling(spark):
    rows = [("u", "2024-01-01 10:00:05"), ("u", "2024-01-01 10:00:50"),
            ("u", "2024-01-01 10:01:10"),   # next minute
            ("v", "2024-01-01 10:00:30")]
    df = spark.createDataFrame(rows, "e string, ts string") \
        .selectExpr("e", "cast(ts as timestamp) ts")
    out = tablechecks.rate_cap_violations(
        df, entity_col="e", ts_col="ts", cap=1, window_s=60).collect()
    assert len(out) == 1
    assert out[0].e == "u" and out[0].n_events == 2


def test_selflink_ratio(spark):
    from zoi_spark import urls as U

    rows = [(1, "http://a.com/x",
             '<a href="http://a.com/1">s</a> <a href="http://b.com/1">o</a>'),
            (2, "http://a.com/y", '<a href="http://a.com/2">s</a>'),
            (3, "http://b.com/z", '<a href="http://a.com/3">o</a>'),
            (4, None, '<a href="http://a.com/4">dropped</a>')]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    out = {r.host: r for r in U.selflink_ratio(df).collect()}
    assert out["a.com"].n_links == 3 and out["a.com"].n_self == 2
    assert out["b.com"].self_ratio == 0.0


def test_schema_drift_rows_kinds(spark):
    from pyspark.sql import types as T

    base = T.StructType([T.StructField("a", T.LongType()),
                         T.StructField("b", T.StringType()),
                         T.StructField("c", T.IntegerType())])
    cur = T.StructType([T.StructField("a", T.LongType()),
                        T.StructField("c", T.StringType()),
                        T.StructField("d", T.DoubleType())])
    out = {r.field: r for r in
           tablechecks.schema_drift_rows(spark, base, cur).collect()}
    assert out["d"].change == "added" and out["d"].to_type == "double"
    assert out["b"].change == "removed" and out["b"].from_type == "string"
    assert (out["c"].change, out["c"].from_type, out["c"].to_type) == \
        ("retyped", "int", "string")
    assert "a" not in out


def test_transition_violations_whitelist(spark):
    rows = [("u", 1, 1, "signup"), ("u", 2, 2, "view"),
            ("u", 3, 3, "purchase"),          # view->purchase: violation
            ("u", 4, 4, "view"),              # purchase->view: allowed
            ("v", 1, 5, "click")]             # first event: no transition
    df = spark.createDataFrame(rows, "e string, ts long, id long, t string")
    allowed = [("signup", "view"), ("purchase", "view")]
    out = tablechecks.transition_violations(
        df, entity_col="e", ts_col="ts", type_col="t", id_col="id",
        allowed=allowed).collect()
    assert len(out) == 1
    assert (out[0].from_type, out[0].to_type, out[0].n) == \
        ("view", "purchase", 1)


def test_canonical_mismatch_and_staleness(spark):
    from pyspark.sql import functions as F
    from zoi_spark import urls as U

    rows = [("http://a.com/x", '<link rel="canonical" href="http://a.com/x">'),
            ("http://a.com/y", "<link rel='canonical' href='http://b.com/y'>"),
            ("http://a.com/z", "no declaration"),
            ("http://b.com/q", '<LINK REL="CANONICAL" HREF="http://b.com/q">')]
    df = spark.createDataFrame(rows, "url string, text string")
    out = {r.host: r for r in U.canonical_mismatch(df).collect()}
    assert out["a.com"].n_canonical == 2 and out["a.com"].n_mismatch == 1
    assert out["b.com"].mismatch_rate == 0.0

    iv = spark.createDataFrame(
        [("http://h1.com/a", 1000), ("http://h1.com/b", 100000),
         ("http://h2.com/c", 5000)], "url string, s long") \
        .select("url", F.timestamp_seconds("s").alias("warc_ts"))
    st = {r.host: r for r in
          U.staleness_audit(iv, max_age_s=3600).collect()}
    # watermark = 100000; h2 last fetch 5000 -> stale; h1 fresh
    assert set(st) == {"h2.com"}
    assert st["h2.com"].age_s == 95000 and st["h2.com"].n_fetches == 1


def test_cohen_kappa_known_value(spark):
    # classic 2x2: a/b agree on 20+15 of 50, marginals 25/25 vs 30/20
    rows = ([("yes", "yes")] * 20 + [("no", "no")] * 15
            + [("yes", "no")] * 5 + [("no", "yes")] * 10)
    df = spark.createDataFrame(rows, "a string, b string")
    r = tablechecks.cohen_kappa(df, "a", "b").collect()[0]
    # po = 35/50 = 0.7; pe = (25*30 + 25*20)/2500 = 0.5; k = 0.4
    assert r.n == 50 and r.po == 0.7 and r.pe == 0.5
    assert abs(r.kappa - 0.4) < 1e-9


def test_cohen_kappa_nulls_excluded(spark):
    df = spark.createDataFrame(
        [("x", "x"), ("x", None), (None, "x")], "a string, b string")
    r = tablechecks.cohen_kappa(df, "a", "b").collect()[0]
    assert r.n == 1 and r.po == 1.0
    assert r.kappa is None  # pe == 1 -> undefined


def test_coverage_gaps_missing_and_thin(spark):
    rows = [("en", "web")] * 5 + [("en", "book")] * 1 + \
        [("de", "web")] * 3
    df = spark.createDataFrame(rows, "lang string, source string")
    out = {(r.lang, r.source): r.n for r in
           tablechecks.coverage_gaps(df, "lang", "source",
                                     min_count=2).collect()}
    assert out == {("en", "book"): 1, ("de", "book"): 0}


def test_cms_frequencies_overestimates(spark):
    rows = [(f"v{i % 7}",) for i in range(200)]
    df = spark.createDataFrame(rows, "k string")
    est = {r.value: r.est_n for r in
           tablechecks.cms_frequencies(
               df, "k", ["v0", "v3", "absent"],
               depth=3, width=64).collect()}
    import collections
    true = collections.Counter(r[0] for r in rows)
    assert est["v0"] >= true["v0"] and est["v3"] >= true["v3"]
    assert est["absent"] >= 0
    # wide sketch vs 7 distinct values: estimates should be exact
    wide = {r.value: r.est_n for r in
            tablechecks.cms_frequencies(
                df, "k", ["v0", "v3", "absent"],
                depth=4, width=4096).collect()}
    assert wide == {"v0": true["v0"], "v3": true["v3"], "absent": 0}


def test_ewma_anomalies_spike(spark):
    from pyspark.sql import functions as F
    # 5 quiet days at 10/day then a 50-event spike
    rows = [(d, i) for d in range(5) for i in range(10)] + \
        [(5, i) for i in range(50)]
    df = (spark.createDataFrame(rows, "d int, i int")
          .select(F.timestamp_seconds(1704067200 + F.col("d") * 86400
                                      + F.col("i")).alias("ts")))
    out = {str(r.day): r for r in
           tablechecks.ewma_anomalies(df, ts_col="ts",
                                      factor=2.0).collect()}
    assert len(out) == 6
    assert out["2024-01-01"].ewma_prev is None
    assert not out["2024-01-01"].is_anomaly
    assert out["2024-01-03"].ewma_prev == 10.0  # constant history
    assert not out["2024-01-03"].is_anomaly
    spike = out["2024-01-06"]
    assert spike.ewma_prev == 10.0 and spike.ratio == 5.0
    assert spike.is_anomaly


def test_transition_violations_null_state_and_separator_alias(spark):
    # NULL state on either side of a real transition is a violation;
    # first-row-per-entity stays exempt even when its value is NULL
    rows = [("u", 1, 1, "signup"), ("u", 2, 2, None),
            ("u", 3, 3, "view"),
            ("v", 1, 4, None)]               # first event: exempt
    df = spark.createDataFrame(rows, "e string, ts long, id long, t string")
    out = {(r.from_type, r.to_type): r.n
           for r in tablechecks.transition_violations(
               df, entity_col="e", ts_col="ts", type_col="t",
               id_col="id", allowed=[("signup", "view")]).collect()}
    assert out == {("signup", None): 1, (None, "view"): 1}

    # whitelisting ('a\x01b' -> 'c') must NOT whitelist ('a' -> 'b\x01c')
    rows2 = [("w", 1, 1, "a"), ("w", 2, 2, "b\x01c")]
    df2 = spark.createDataFrame(rows2, "e string, ts long, id long, t string")
    out2 = tablechecks.transition_violations(
        df2, entity_col="e", ts_col="ts", type_col="t", id_col="id",
        allowed=[("a\x01b", "c")]).collect()
    assert [(r.from_type, r.to_type) for r in out2] == [("a", "b\x01c")]


def test_content_churn_refetches_count_once_per_url(spark):
    from zoi_spark import urls as U

    # url refetched twice per snapshot: 2x2 join pairs would report
    # n_common=4; page-weighted semantics requires exactly 1
    rows = [(0, "http://h.com/p", "v1"), (0, "http://h.com/p", "v1"),
            (1, "http://h.com/p", "v2"), (1, "http://h.com/p", "v2")]
    df = spark.createDataFrame(rows, "snap int, url string, text string")
    r = U.content_churn(df).collect()[0]
    assert (r.n_common, r.n_changed, r.churn_rate) == (1, 1, 1.0)


def test_canonical_mismatch_resolves_relative_hrefs(spark):
    from zoi_spark import urls as U

    rows = [
        # root-relative self-canonical: must count as a match
        ("http://a.com/p/1", '<link rel="canonical" href="/p/1">'),
        # page-relative self-canonical resolved against the directory
        ("http://a.com/p/2", '<link rel="canonical" href="2">'),
        # scheme-relative pointing elsewhere: mismatch
        ("http://a.com/p/3", '<link rel="canonical" href="//b.com/p/3">'),
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    r = U.canonical_mismatch(df).collect()[0]
    assert (r.host, r.n_canonical, r.n_mismatch) == ("a.com", 3, 1)


def test_resolve_href_branches(spark):
    from zoi_spark import urls as U

    base = "http://h.com/a/b?q=1"
    cases = [("http://x.com/y", "http://x.com/y"),
             ("//x.com/y", "http://x.com/y"),
             ("/y", "http://h.com/y"),
             ("y", "http://h.com/a/y"),
             ("?p=2", "http://h.com/a/b?p=2"),
             ("#frag", "http://h.com/a/b#frag")]
    df = spark.createDataFrame([(h, base) for h, _ in cases],
                               "href string, base string")
    got = [r.r for r in df.select(
        U.resolve_href(F.col("href"), F.col("base")).alias("r")).collect()]
    assert got == [want for _, want in cases]
    # DuckDB twin agrees branch-for-branch
    import duckdb
    for href, want in cases:
        sql = U.resolve_href_sql(f"'{href}'", f"'{base}'")
        assert duckdb.sql(f"SELECT {sql} AS r").fetchone()[0] == want


def test_selflink_ratio_relative_hrefs_are_self(spark):
    from zoi_spark import urls as U

    rows = [
        ("http://a.com/p/1", 1, '<a href="/q/1">x</a>'),        # self
        ("http://a.com/p/2", 2, '<a href="q2.html">x</a>'),     # self
        ("http://a.com/p/3", 3, '<a href="//b.com/q/3">x</a>'), # other
        ("http://a.com/p/4", 4, '<a href="http://b.com/z">x</a>'),
    ]
    df = spark.createDataFrame(rows, "url string, doc_id long, text string")
    r = U.selflink_ratio(df).collect()[0]
    assert (r.host, r.n_links, r.n_self) == ("a.com", 4, 2)


def test_bh_fdr_step_up(spark):
    ps = [0.005, 0.009, 0.02, 0.04, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8]
    df = spark.createDataFrame([("f", p) for p in ps], "fam string, p double")
    r = tablechecks.bh_fdr(df, "p", by="fam", q=0.1).collect()[0]
    # thresholds i*0.01: i=1..4 all satisfied (0.04 <= 0.04), i>=5 not
    assert (r.n_tests, r.n_rejected, r.p_crit) == (10, 4, 0.04)

    none = spark.createDataFrame([("g", 0.5), ("g", 0.9)],
                                 "fam string, p double")
    r2 = tablechecks.bh_fdr(none, "p", by="fam", q=0.05).collect()[0]
    assert (r2.n_rejected, r2.p_crit) == (0, None)


def test_welch_ttest_hand_values(spark):
    import math
    a, b = [1, 2, 3, 4], [2, 4, 6, 8, 10]
    df = spark.createDataFrame([("a", v) for v in a]
                               + [("b", v) for v in b],
                               "g string, x long")
    r = tablechecks.welch_ttest(df, "x", group_col="g",
                                group_a="a", group_b="b").collect()[0]
    ma, mb = 2.5, 6.0
    va = sum((v - ma) ** 2 for v in a) / 3
    vb = sum((v - mb) ** 2 for v in b) / 4
    se2 = va / 4 + vb / 5
    t = (ma - mb) / math.sqrt(se2)
    dfw = se2 ** 2 / ((va / 4) ** 2 / 3 + (vb / 5) ** 2 / 4)
    assert (r.n_a, r.n_b, r.mean_a, r.mean_b) == (4, 5, 2.5, 6.0)
    assert abs(r.t_stat - round(t, 6)) < 1e-9
    assert abs(r.df_welch - round(dfw, 6)) < 1e-9


def test_spearman_corr_monotone_and_ties(spark):
    up = spark.createDataFrame([(1, 2), (2, 4), (3, 6), (4, 8), (5, 10)],
                               "x long, y long")
    assert tablechecks.spearman_corr(up, "x", "y").collect()[0].rho == 1.0
    down = spark.createDataFrame([(1, 3), (2, 2), (3, 1)], "x long, y long")
    assert tablechecks.spearman_corr(down, "x", "y").collect()[0].rho == -1.0
    # all-tied column: zero rank variance -> NULL rho, not a crash
    flat = spark.createDataFrame([(1, 7), (2, 7), (3, 7)], "x long, y long")
    r = tablechecks.spearman_corr(flat, "x", "y").collect()[0]
    assert r.n == 3 and r.rho is None


def test_prop_ztest_hand_values(spark):
    import math
    rows = ([("a", True)] * 80 + [("a", False)] * 20
            + [("b", True)] * 60 + [("b", False)] * 40)
    df = spark.createDataFrame(rows, "g string, f boolean")
    r = tablechecks.prop_ztest(df, "f", group_col="g",
                               group_a="a", group_b="b").collect()[0]
    se = math.sqrt(0.7 * 0.3 * (1 / 100 + 1 / 100))
    assert (r.n_a, r.k_a, r.n_b, r.k_b) == (100, 80, 100, 60)
    assert (r.rate_a, r.rate_b) == (0.8, 0.6)
    assert abs(r.z_stat - round(0.2 / se, 6)) < 1e-9


def test_runs_test_bursty_sequence(spark):
    import math
    # u: TTTTTFFFFF -> 2 runs (maximally bursty); v: alternating -> 10
    seq_u = [True] * 5 + [False] * 5
    seq_v = [i % 2 == 0 for i in range(10)]
    rows = ([("u", i, i, f) for i, f in enumerate(seq_u)]
            + [("v", i, i, f) for i, f in enumerate(seq_v)])
    df = spark.createDataFrame(rows, "e string, ts long, id long, f boolean")
    out = {r.e: r for r in tablechecks.runs_test(
        df, "f", entity_col="e", ts_col="ts", id_col="id",
        min_each=5).collect()}
    mu, var = 2 * 25 / 10 + 1, 2 * 25 * (50 - 10) / (100 * 9)
    assert out["u"].n_runs == 2
    assert abs(out["u"].z_stat - round((2 - mu) / math.sqrt(var), 6)) < 1e-9
    assert out["v"].n_runs == 10
    # entity with fewer than min_each of one outcome is excluded
    few = spark.createDataFrame(
        [("w", i, i, i < 2) for i in range(10)],
        "e string, ts long, id long, f boolean")
    assert tablechecks.runs_test(few, "f", entity_col="e", ts_col="ts",
                                 id_col="id", min_each=5).count() == 0


# ---------------------------------------------------------------------------
# waves 29-32: hand-derived values for the corpus-health / retrieval /
# privacy additions
# ---------------------------------------------------------------------------

def test_bucket_migration_hand(spark):
    rows = [(0, 1, 10.0), (1, 1, 60.0),    # id 1: bucket 0 -> 2
            (0, 2, 80.0), (1, 2, 80.0),    # id 2: stays 3
            (0, 3, 30.0)]                  # id 3: only in snap 0 -> dropped
    df = spark.createDataFrame(rows, "s int, id long, x double")
    out = {(r.from_bucket, r.to_bucket): r.n
           for r in tablechecks.bucket_migration(
               df, snap_col="s", id_col="id", score_col="x",
               thresholds=[25.0, 50.0, 75.0]).collect()}
    assert out == {(0, 2): 1, (3, 3): 1}
    import pytest as _pt
    with _pt.raises(ValueError):
        tablechecks.bucket_migration(
            df.where("s = 0"), snap_col="s", id_col="id",
            score_col="x", thresholds=[25.0])


def test_median_test_hand(spark):
    import math
    # g=a: 1,2,3,4 ; g=b: 5,6,7,8 -> median 4.5; above: a=0, b=4
    rows = [("a", v) for v in [1, 2, 3, 4]] + \
           [("b", v) for v in [5, 6, 7, 8]]
    df = spark.createDataFrame(rows, "g string, x long")
    r = tablechecks.median_test(df, "x", group_col="g").collect()[0]
    # chi2 = sum over 4 cells, expected 2 everywhere: 4*(2^2/2) = 8
    assert (r.n_groups, r.n_rows, r.dof) == (2, 8, 1)
    assert abs(r.chi2 - 8.0) < 1e-9


def test_shrunk_pass_rates_hand(spark):
    # corpus mu = 10/20; host small: 1/2, host big: 9/18
    rows = [("s", i < 1) for i in range(2)] + \
           [("b", i < 9) for i in range(18)]
    df = spark.createDataFrame(rows, "h string, ok boolean")
    out = {r.h: r for r in tablechecks.shrunk_pass_rates(
        df, "ok", by="h", prior_strength=100.0).collect()}
    assert out["s"].rate_raw == 0.5
    assert abs(out["s"].rate_shrunk - round((1 + 50.0) / 102, 6)) < 1e-9
    assert abs(out["b"].rate_shrunk - round((9 + 50.0) / 118, 6)) < 1e-9


def test_distribution_jsd_hand(spark):
    import math
    # identical distributions -> 0; disjoint -> ln 2
    same = spark.createDataFrame(
        [(0, "x"), (0, "y"), (1, "x"), (1, "y")], "s int, k string")
    r = tablechecks.distribution_jsd(same, "k", snap_col="s").collect()[0]
    assert r.jsd_nats == 0.0
    disj = spark.createDataFrame([(0, "x"), (1, "y")], "s int, k string")
    r2 = tablechecks.distribution_jsd(disj, "k", snap_col="s").collect()[0]
    assert abs(r2.jsd_nats - round(math.log(2), 6)) < 1e-9
    assert r2.jsd_bits == 1.0


def test_theil_decomposition_hand(spark):
    import math
    # two groups, all mass equal within groups: within = 0,
    # between = sum s_g ln(mu_g/mu); a: 2 rows of 100, b: 2 rows of 300
    rows = [("a", 100), ("a", 100), ("b", 300), ("b", 300)]
    df = spark.createDataFrame(rows, "g string, x long")
    r = tablechecks.theil_decomposition(df, "x", group_col="g").collect()[0]
    mu = 200.0
    between = (200 / 800) * math.log(100 / mu) + \
              (600 / 800) * math.log(300 / mu)
    assert r.theil_within == 0.0
    assert abs(r.theil_between - round(between, 6)) < 1e-9
    assert abs(r.theil_total - round(between, 6)) < 2e-6


def test_partition_advisor_hand(spark):
    df = spark.createDataFrame([("a" * 100,)] * 10, "t string")
    r = tablechecks.partition_advisor(
        df, bytes_col="t", overhead_bytes=0, target_mb=1).collect()[0]
    assert (r.n_rows, r.avg_row_bytes, r.max_row_bytes) == (10, 100.0, 100)
    assert r.rows_per_partition == 1048576 // 100
    assert r.n_partitions == 1


def test_k_anonymity_hand(spark):
    rows = [("en", 1)] * 5 + [("de", 1)] * 2 + [("fr", 2)]
    df = spark.createDataFrame(rows, "l string, b long")
    r = tablechecks.k_anonymity(df, ["l", "b"], k=5).collect()[0]
    assert (r.n_rows, r.n_classes, r.min_class_size) == (8, 3, 1)
    assert (r.n_small_classes, r.n_rows_at_risk) == (2, 3)
    assert r.share_at_risk == 0.375 and r.k == 5


def test_neyman_allocation_hand(spark):
    # a: x in {0, 10} sigma = sqrt(50); b: constant -> sigma 0
    rows = [("a", 0), ("a", 10), ("b", 7), ("b", 7)]
    df = spark.createDataFrame(rows, "g string, x long")
    out = {r.stratum: r for r in __import__("zoi_spark.sampling",
           fromlist=["sampling"]).neyman_allocation(
               df, "x", stratum_col="g", budget=100).collect()}
    import math
    assert abs(out["a"].sigma - round(math.sqrt(50), 6)) < 1e-9
    assert out["b"].sigma == 0.0
    assert out["a"].alloc_share == 1.0 and out["a"].alloc_n == 100
    assert out["b"].alloc_n == 0


def test_url_ext_census_hand(spark):
    from zoi_spark import urls
    df = spark.createDataFrame(
        [("http://a/x.HTML",), ("http://a/dir/",), ("http://a/plain",),
         ("http://a/p.tar.gz?v=1#f",)], "url string")
    out = {r.ext: r for r in urls.url_ext_census(df).collect()}
    assert out["html"].n_urls == 1 and out["gz"].n_urls == 1
    assert out[""].n_urls == 2 and out[""].share == 0.5


def test_url_depth_census_hand(spark):
    from zoi_spark import urls
    df = spark.createDataFrame(
        [("http://a.example",), ("http://a.example/",),
         ("http://a.example/x/y?q=1",), ("http://a.example/x/y/z",)],
        "url string")
    out = {r.depth: r.n_urls
           for r in urls.url_depth_census(df).collect()}
    assert out == {0: 2, 2: 1, 3: 1}


def test_idn_host_census_flags(spark):
    from zoi_spark import urls
    df = spark.createDataFrame(
        [("http://ok.example/p",), ("http://xn--bcher-kva.example/p",),
         ("http://12345678.net/p",), ("http://a-b-c-d.shop/p",),
         ("http://" + "a" * 45 + ".org/p",)], "url string")
    r = urls.idn_host_census(df).collect()[0]
    assert (r.n_hosts, r.n_punycode, r.n_digit_heavy) == (5, 1, 1)
    # the xn-- host carries 3 hyphens, so it trips BOTH flags
    assert (r.n_hyphen_heavy, r.n_long) == (2, 1)
    assert r.share_flagged == 0.8


def test_prefix_compression_stats_hand(spark):
    from zoi_spark import urls
    # one host, 3 urls sharing a 16-char prefix but not 32
    df = spark.createDataFrame(
        [("http://h.example/a/0000000000000001",),
         ("http://h.example/a/0000000000000002",),
         ("http://h.example/b/0000000000000003",)], "url string")
    r = urls.prefix_compression_stats(df).collect()[0]
    assert (r.n_urls, r.n_pairs) == (3, 2)
    assert r.share_p8 == 1.0 and r.share_p16 == 1.0
    assert r.share_p32 == 0.5   # a/...1 -> a/...2 shares 32; a->b not


def test_lsh_tuning_curve_midpoint(spark):
    curve = {r.s: r for r in dedup.lsh_tuning_curve(
        spark, num_hashes=64, threshold=0.8).collect()}
    assert len(curve) == 19
    r = curve[0.75]
    assert r.bands == 8 and r.rows_per_band == 8
    p = 1 - (1 - 0.75 ** 8) ** 8
    assert abs(r.p_candidate - round(p, 6)) < 1e-9
    # probability rises monotonically in s
    ps = [curve[k].p_candidate for k in sorted(curve)]
    assert ps == sorted(ps)


def test_survivorship_merge_latest_nonnull(spark):
    rows = [("u", 1, "en", 100), ("u", 2, None, 200), ("u", 3, "de", None)]
    df = spark.createDataFrame(rows, "e string, ts long, l string, n long")
    r = tablechecks.survivorship_merge(
        df, "e", ts_col="ts", value_cols=["l", "n"]).collect()[0]
    # latest non-null: l from ts=3, n from ts=2 (ts=3 row has n NULL)
    assert (r.n_versions, r.first_ts, r.last_ts) == (3, 1, 3)
    assert (r.l, r.n) == ("de", 200)


def test_kaplan_meier_hand(spark):
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    def t(h): return base + dt.timedelta(hours=h)
    # u1: enters 0h, buys at 1h; u2: enters 0h, never buys, last 3h
    # u3: enters 0h, buys at 2h
    rows = [("u1", t(0), "view"), ("u1", t(1.2), "purchase"),
            ("u2", t(0), "view"), ("u2", t(3), "view"),
            ("u3", t(0), "view"), ("u3", t(2.5), "purchase")]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, et string")
    from pyspark.sql import functions as FF
    out = {r.t_bucket: r for r in tablechecks.kaplan_meier(
        df, entity_col="user_id", ts_col="ts",
        event_pred=FF.col("et") == "purchase", bucket_s=3600).collect()}
    # bucket 1: risk 3, 1 event -> S = 2/3; bucket 2: risk 2, 1 event
    # -> S = 2/3 * 1/2 = 1/3 ; u2 censored at bucket 3
    assert out[1].n_risk == 3 and out[1].n_events == 1
    assert abs(out[1].survival - round(2 / 3, 6)) < 1e-9
    assert abs(out[2].survival - round(1 / 3, 6)) < 1e-9


def test_logreg_newton_step_hand(spark):
    from pyspark.sql import functions as FF
    # perfectly balanced, antisymmetric design: x=-1 y=0, x=1 y=1 (x2)
    rows = [(-1.0, 0.0), (-1.0, 0.0), (1.0, 1.0), (1.0, 1.0)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = tablechecks.logreg_newton_step(df, "x", "y").collect()[0]
    # n=4, Sx=0, Sxx=4, Sy=2, Sxy=2 -> g=(0,2), H=diag(1,1) -> beta=(0,2)
    assert r.n == 4 and r.beta0 == 0.0 and r.beta1 == 2.0


def test_bag_fingerprint_groups_reorders(spark):
    rows = [(1, "alpha beta gamma"), (2, "gamma beta alpha"),
            (3, "alpha beta gamma"),            # exact dup of 1
            (4, "unrelated text here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.bag_fingerprint_groups(df).collect()
    assert len(out) == 1
    g = out[0]
    assert g.n_docs == 3 and g.n_exact_variants == 2
    assert g.sample_ids == [1, 2, 3]


def test_split_leakage_counts(spark):
    from zoi_spark import sampling as zs
    # 40 ids share one fp -> certain to straddle a 50/50 split;
    # 5 singleton fps -> never leak
    rows = [(i, "shared") for i in range(40)] + \
           [(100 + i, f"solo{i}") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, fp string")
    r = zs.split_leakage(df, id_col="doc_id", fp_col="fp",
                         weights={"a": 0.5, "b": 0.5}).collect()[0]
    assert r.n_fp_groups == 6 and r.n_dup_groups == 1
    assert r.n_cross_split_groups == 1 and r.n_docs_cross_split == 40
    assert abs(r.leak_share - round(40 / 45, 6)) < 1e-9


def test_clustering_skipping_estimate_hand(spark):
    from pyspark.sql import functions as FF
    # 100 rows, value interleaved 0..9: ingest order -> every 10-row
    # file spans 0..9 (all hit a [3,4] range); clustered -> only the
    # files holding 3s and 4s hit
    rows = [(i, i % 10) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, v long")
    out = {r.ordering: r for r in tablechecks.clustering_skipping_estimate(
        df, order_col="id", cluster_col="v", value_lo=3, value_hi=4,
        file_rows=10).collect()}
    assert out["ingest"].n_files == 10 and out["ingest"].files_hit == 10
    assert out["ingest"].skip_ratio == 0.0
    assert out["clustered"].files_hit == 2
    assert out["clustered"].skip_ratio == 0.8


def test_rule_cooccurrence_pairs(spark):
    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"), (3, "a")]
    df = spark.createDataFrame(rows, "doc_id long, rule_id string")
    out = {(r.rule_a, r.rule_b): r.n_docs
           for r in tablechecks.rule_cooccurrence(df).collect()}
    assert out == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}


def test_poisson_bootstrap_ci_brackets_mean(spark):
    rows = [(i, 100 + (i % 7)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, x long")
    r = tablechecks.poisson_bootstrap_ci(
        df, "x", n_resamples=32, alpha=0.1).collect()[0]
    assert r.ci_lo <= r.mean <= r.ci_hi
    assert r.ci_hi - r.ci_lo < 2.0      # tight for a near-constant column
    # deterministic: identical on a second run
    r2 = tablechecks.poisson_bootstrap_ci(
        df, "x", n_resamples=32, alpha=0.1).collect()[0]
    assert (r.ci_lo, r.ci_hi) == (r2.ci_lo, r2.ci_hi)


def test_lateness_profile_hand(spark):
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    def t(h): return base + dt.timedelta(hours=h)
    # arrival order 1..4; event times 0h, 3h, 1h (2h late), 3.5h
    rows = [("u", 1, t(0)), ("u", 2, t(3)), ("u", 3, t(1)),
            ("u", 4, t(3.5))]
    df = spark.createDataFrame(rows, "user_id string, event_id long, ts timestamp")
    out = {r.lateness_bucket: r.n_events
           for r in tablechecks.lateness_profile(
               df, entity_col="user_id", ts_col="ts",
               order_col="event_id", bucket_s=3600).collect()}
    assert out == {0: 3, 2: 1}


def test_mergeable_stats_check_invariant(spark):
    from pyspark.sql import functions as FF
    rows = [(i, (i * 37) % 101) for i in range(200)] + [(200, None)]
    df = spark.createDataFrame(rows, "doc_id long, v long")
    r = tablechecks.mergeable_stats_check(
        df, "v", split_pred=FF.pmod("doc_id", FF.lit(3)) == 0).collect()[0]
    assert r.all_equal
    assert r.n_merged == r.n_direct == 200
    assert r.sum_merged == r.sum_direct


class TestExpectationSuite:
    def test_verdicts_and_bounds(self, spark):
        from zoi_spark import tablechecks as tc
        df = spark.createDataFrame(
            [(1, "aa"), (2, "bb"), (3, None), (4, "zz")],
            "x long, s string")
        out = {r["expectation"]: r for r in tc.expectation_suite(df, [
            {"name": "rows", "kind": "row_count", "lo": 4, "hi": 4},
            {"name": "x_mean", "kind": "mean", "column": "x",
             "lo": 2.0, "hi": 3.0},
            {"name": "s_nulls", "kind": "null_share", "column": "s",
             "hi": 0.1},
            {"name": "s_vocab", "kind": "distinct", "column": "s",
             "lo": 3},
            {"name": "s_shape", "kind": "match_share", "column": "s",
             "pattern": "^[a-z]{2}$", "lo": 1.0},
            {"name": "x_sum", "kind": "sum", "column": "x", "hi": 9},
        ]).collect()}
        assert out["rows"]["observed"] == 4.0 and out["rows"]["passed"]
        assert out["x_mean"]["observed"] == 2.5 and out["x_mean"]["passed"]
        # 1 NULL of 4 = 0.25 > 0.1 -> fail
        assert out["s_nulls"]["observed"] == 0.25
        assert not out["s_nulls"]["passed"]
        assert out["s_vocab"]["observed"] == 3.0 and out["s_vocab"]["passed"]
        # match_share is over NON-NULL values only: 3/3
        assert out["s_shape"]["observed"] == 1.0 and out["s_shape"]["passed"]
        # sum 10 > 9 -> fail
        assert out["x_sum"]["observed"] == 10.0
        assert not out["x_sum"]["passed"]

    def test_null_observed_fails_loudly(self, spark):
        from zoi_spark import tablechecks as tc
        df = spark.createDataFrame([(None,), (None,)], "x double")
        r = tc.expectation_suite(df, [
            {"name": "m", "kind": "mean", "column": "x", "lo": 0.0},
        ]).collect()[0]
        assert r["observed"] is None and r["passed"] is False

    def test_validates_specs(self, spark):
        import pytest
        from zoi_spark import tablechecks as tc
        df = spark.range(1)
        with pytest.raises(ValueError):
            tc.expectation_suite(df, [])
        with pytest.raises(ValueError):
            tc.expectation_suite(df, [{"name": "b", "kind": "nope"}])
        with pytest.raises(ValueError):
            tc.expectation_suite(df, [{"name": "b", "kind": "mean"}])


class TestSnapshotDiff:
    def test_classification(self, spark):
        from zoi_spark import tablechecks as tc
        old = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k long, v string")
        new = spark.createDataFrame(
            [(1, "a"), (2, "B"), (4, "d")], "k long, v string")
        out = {r["key"]: r["status"] for r in tc.snapshot_diff(
            old, new, key_col="k", compare_cols=["v"]).collect()}
        assert out == {2: "changed", 3: "removed", 4: "added"}

    def test_nulls_compare_equal_and_unchanged_included(self, spark):
        from zoi_spark import tablechecks as tc
        old = spark.createDataFrame([(1, None)], "k long, v string")
        new = spark.createDataFrame([(1, None)], "k long, v string")
        rows = tc.snapshot_diff(old, new, key_col="k",
                                compare_cols=["v"],
                                include_unchanged=True).collect()
        assert [(r["key"], r["status"]) for r in rows] == [(1, "unchanged")]


class TestConditionalViolations:
    def test_when_then_gates(self, spark):
        from zoi_spark import tablechecks as tc
        df = spark.createDataFrame(
            [(1, "en", 10), (2, "en", 100), (3, "de", 10),
             (4, None, 10), (5, "en", None)],
            "doc_id long, lang string, n long")
        out = {(r["doc_id"], r["rule_id"]) for r in
               tc.conditional_violations(df, [
                   ("en_big", "lang = 'en'", "n >= 50"),
               ]).collect()}
        # row 1: when holds, then fails; row 5: then NULL -> violation;
        # rows 3/4: when false/NULL -> not applicable
        assert out == {(1, "en_big"), (5, "en_big")}

    def test_column_objects_and_empty_rules(self, spark):
        import pytest
        from pyspark.sql import functions as F
        from zoi_spark import tablechecks as tc
        df = spark.createDataFrame([(1, 5)], "doc_id long, n long")
        out = tc.conditional_violations(
            df, [("r", F.col("n") > 0, F.col("n") > 10)]).collect()
        assert [(r["doc_id"], r["rule_id"]) for r in out] == [(1, "r")]
        with pytest.raises(ValueError):
            tc.conditional_violations(df, [])


class TestSprtMonitor:
    def test_decisions_hand_llr(self, spark):
        import math
        from zoi_spark import tablechecks as tc
        rows = ([("hot", 1)] * 9 + [("hot", 0)]          # 9/10 fail
                + [("cold", 0)] * 12                     # 0/12 fail
                + [("thin", 0)]                          # 1 trial
                + [("gap", None)])                       # no evidence
        df = spark.createDataFrame(rows, "grp string, bad int")
        out = {r["grp"]: r for r in tc.sprt_monitor(
            df, "bad", by="grp", p0=0.1, p1=0.3).collect()}
        lr_f, lr_p = math.log(3.0), math.log(0.7 / 0.9)
        assert out["hot"]["decision"] == "alert"
        assert out["hot"]["llr"] == round(9 * lr_f + 1 * lr_p, 6)
        assert out["cold"]["decision"] == "ok"   # 12*lr_p < ln(β/(1-α))
        assert out["thin"]["decision"] == "continue"
        assert "gap" not in out  # all-NULL group carries no evidence

    def test_param_validation(self, spark):
        import pytest
        from zoi_spark import tablechecks as tc
        df = spark.createDataFrame([("a", 1)], "grp string, bad int")
        with pytest.raises(ValueError):
            tc.sprt_monitor(df, "bad", by="grp", p0=0.3, p1=0.1)
        with pytest.raises(ValueError):
            tc.sprt_monitor(df, "bad", by="grp", p0=0.1, p1=0.3,
                            alpha=0.0)


class TestMultiColumnPsi:
    def test_identical_is_zero_and_shift_ranks(self, spark):
        from zoi_spark import tablechecks as tc
        base = spark.createDataFrame(
            [("en", "a")] * 5 + [("de", "b")] * 5,
            "lang string, src string")
        same = tc.multi_column_psi(base, base, ["lang", "src"])
        for r in same.collect():
            assert abs(r["psi"]) < 1e-6 and r["n_values"] == 2
        cur = spark.createDataFrame(
            [("en", "a")] * 9 + [("de", "b")] * 1,
            "lang string, src string")
        out = {r["column"]: r["psi"] for r in
               tc.multi_column_psi(cur, base, ["lang", "src"]).collect()}
        # lang shifted 50/50 -> 90/10; src shifted identically
        assert out["lang"] > 0.5 and out["src"] > 0.5

    def test_null_bucket_counts_as_drift(self, spark):
        from zoi_spark import tablechecks as tc
        base = spark.createDataFrame([("x",)] * 10, "c string")
        cur = spark.createDataFrame([("x",)] * 5 + [(None,)] * 5,
                                    "c string")
        r = tc.multi_column_psi(cur, base, ["c"]).collect()[0]
        assert r["n_values"] == 2 and r["psi"] > 1.0

    def test_validates_columns(self, spark):
        import pytest
        from zoi_spark import tablechecks as tc
        df = spark.createDataFrame([("x",)], "c string")
        with pytest.raises(ValueError):
            tc.multi_column_psi(df, df, [])


class TestWoeIv:
    def test_hand_woe(self, spark):
        import math
        from zoi_spark import tablechecks as tc
        rows = ([("a", 1)] * 3 + [("a", 0)] * 1
                + [("b", 1)] * 1 + [("b", 0)] * 3
                + [("c", None)])
        df = spark.createDataFrame(rows, "bucket string, flag int")
        out = {r["bucket"]: r for r in tc.woe_iv(
            df, bucket_col="bucket", flag_col="flag",
            epsilon=0.5).collect()}
        # totals: pos=4, neg=4, buckets=2 -> denominator 4 + 0.5*2 = 5
        dp_a, dn_a = 3.5 / 5, 1.5 / 5
        assert out["a"]["n_pos"] == 3 and out["a"]["n_neg"] == 1
        assert out["a"]["woe"] == round(math.log(dp_a / dn_a), 6)
        assert out["a"]["iv_term"] == round(
            (dp_a - dn_a) * math.log(dp_a / dn_a), 6)
        # symmetric bucket: mirrored woe
        assert out["b"]["woe"] == -out["a"]["woe"]
        assert "c" not in out  # NULL flag carries no evidence

    def test_iv_orders_separating_features(self, spark):
        from zoi_spark import tablechecks as tc
        sep = spark.createDataFrame(
            [("a", 1)] * 9 + [("a", 0)] * 1
            + [("b", 1)] * 1 + [("b", 0)] * 9,
            "bucket string, flag int")
        noise = spark.createDataFrame(
            [("a", 1)] * 5 + [("a", 0)] * 5
            + [("b", 1)] * 5 + [("b", 0)] * 5,
            "bucket string, flag int")
        iv = lambda d: sum(r["iv_term"] for r in tc.woe_iv(
            d, bucket_col="bucket", flag_col="flag").collect())
        assert iv(sep) > 0.5 > iv(noise)


class TestContractCheck:
    def test_three_families_and_zero_rules_present(self, spark):
        import zoi_spark as z
        from zoi_spark import contract
        df = spark.createDataFrame(
            [(1, "en"), (2, "xx"), (3, None)],
            "doc_id long, lang string")
        dic = spark.createDataFrame([("en",), ("de",)], "lang string")
        out = {r["check"]: r for r in contract.contract_check(
            df,
            schema=z.fields({"doc_id": z.integer().non_negative(),
                             "lang": z.string(min=2, max=2)}),
            expectations=[{"name": "rows", "kind": "row_count",
                           "lo": 3, "hi": 3},
                          {"name": "lang_nulls", "kind": "null_share",
                           "column": "lang", "hi": 0.0}],
            references=[("lang", dic)],
            id_cols=["doc_id"]).collect()}
        # zero-violation schema rule still present and passing
        assert out["schema:doc_id.gte"]["passed"] is True
        assert out["schema:doc_id.gte"]["metric"] == 0.0
        # NULL lang -> required violation counted
        assert out["schema:lang.required"]["metric"] == 1.0
        assert out["schema:lang.required"]["passed"] is False
        assert out["expect:rows"]["passed"] is True
        assert out["expect:lang_nulls"]["passed"] is False
        # 'xx' and NULL both miss the dictionary
        assert out["ref:lang"]["metric"] == 2.0
        assert out["ref:lang"]["passed"] is False

    def test_empty_contract_rejected(self, spark):
        import pytest
        from zoi_spark import contract
        df = spark.createDataFrame([(1,)], "x long")
        with pytest.raises(ValueError):
            contract.contract_check(df)


class TestZorderKey:
    def test_hand_interleave(self, spark):
        from zoi_spark import tablechecks as tc
        df = spark.createDataFrame(
            [(0, 0), (3, 0), (0, 3), (3, 3)], "x long, y long")
        out = {(r["x"], r["y"]): r["zorder_key"] for r in
               tc.zorder_key(df, ["x", "y"], bits=2,
                             stats={"x": (0, 3), "y": (0, 3)})
               .collect()}
        # normalized to 2 bits: 0->0, 3->3 (floor(3/3*4)=4 clamped 3)
        # interleave x at even bit positions, y at odd
        assert out[(0, 0)] == 0
        assert out[(3, 0)] == 0b0101
        assert out[(0, 3)] == 0b1010
        assert out[(3, 3)] == 0b1111

    def test_locality_beats_column_order(self, spark):
        from pyspark.sql import functions as F
        from zoi_spark import tablechecks as tc
        # grid: rows sorted by zorder key keep BOTH dims locally tight
        df = spark.range(256).select(
            (F.col("id") % 16).alias("x"),
            (F.col("id") / 16).cast("long").alias("y"))
        z = tc.zorder_key(df, ["x", "y"], bits=4).orderBy("zorder_key")
        ys = [r["y"] for r in z.limit(64).collect()]
        xs = [r["x"] for r in z.limit(64).collect()]
        # first quarter of z-order covers the 8x8 corner, not a stripe
        assert max(ys) <= 7 and max(xs) <= 7

    def test_nulls_constant_and_validation(self, spark):
        import pytest
        from zoi_spark import tablechecks as tc
        df = spark.createDataFrame([(None, 5), (1, 5)],
                                   "x long, c long")
        out = tc.zorder_key(df, ["x", "c"], bits=4).collect()
        # constant column contributes 0; NULL x normalizes to 0
        assert {r["zorder_key"] for r in out} == {0}
        with pytest.raises(ValueError):
            tc.zorder_key(df, ["x"], bits=63)
        with pytest.raises(ValueError):
            tc.zorder_key(df, [])


class TestFkSweep:
    def test_orphans_and_null_fk_exempt(self, spark):
        from zoi_spark import tablechecks as tc
        child = spark.createDataFrame(
            [(1, 10), (2, 20), (3, 99), (4, None)],
            "id long, fk long")
        parent = spark.createDataFrame([(10,), (20,)], "pk long")
        r = tc.fk_sweep([("child->parent", child, "fk",
                          parent, "pk")]).collect()[0]
        assert r["edge"] == "child->parent"
        assert r["n_rows"] == 3        # NULL fk excluded
        assert r["n_orphans"] == 1     # 99
        assert r["ok"] is False

    def test_multiple_edges(self, spark):
        import pytest
        from zoi_spark import tablechecks as tc
        a = spark.createDataFrame([(1,)], "k long")
        out = tc.fk_sweep([("self", a, "k", a, "k"),
                           ("self2", a, "k", a, "k")]).collect()
        assert all(r["ok"] for r in out) and len(out) == 2
        with pytest.raises(ValueError):
            tc.fk_sweep([])


class TestExpectationSuiteBy:
    def test_per_group_verdicts(self, spark):
        from zoi_spark import tablechecks as tc
        df = spark.createDataFrame(
            [("a", 10), ("a", 20), ("b", 1000)],
            "g string, v long")
        out = {(r["g"], r["expectation"]): r for r in
               tc.expectation_suite(df, [
                   {"name": "v_mean", "kind": "mean", "column": "v",
                    "hi": 100},
                   {"name": "rows", "kind": "row_count", "lo": 2},
               ], by="g").collect()}
        assert out[("a", "v_mean")]["observed"] == 15.0
        assert out[("a", "v_mean")]["passed"] is True
        assert out[("b", "v_mean")]["passed"] is False
        assert out[("a", "rows")]["passed"] is True
        assert out[("b", "rows")]["passed"] is False  # 1 row < 2


class TestRollingPsi:
    def test_stable_then_shifted_day(self, spark):
        from zoi_spark import tablechecks as tc
        rows = ([("2026-01-01 00:00:00", "x")] * 5
                + [("2026-01-01 00:00:00", "y")] * 5
                + [("2026-01-02 00:00:00", "x")] * 5
                + [("2026-01-02 00:00:00", "y")] * 5
                + [("2026-01-03 00:00:00", "x")] * 9
                + [("2026-01-03 00:00:00", "y")] * 1)
        df = spark.createDataFrame(rows, "ts string, k string") \
            .selectExpr("cast(ts as timestamp) ts", "k")
        out = {str(r["day"]): r for r in tc.rolling_psi(
            df, ts_col="ts", key_col="k").collect()}
        assert "2026-01-01" not in out       # no predecessor
        assert abs(out["2026-01-02"]["psi"]) < 1e-9  # identical mix
        assert out["2026-01-03"]["psi"] > 0.5        # 50/50 -> 90/10
        assert out["2026-01-03"]["n_keys"] == 2

    def test_missing_key_zero_fills(self, spark):
        from zoi_spark import tablechecks as tc
        rows = ([("2026-01-01 00:00:00", "x")] * 4
                + [("2026-01-02 00:00:00", "y")] * 4)
        df = spark.createDataFrame(rows, "ts string, k string") \
            .selectExpr("cast(ts as timestamp) ts", "k")
        r = tc.rolling_psi(df, ts_col="ts", key_col="k").collect()[0]
        # day2 has zero x and all y: both keys present in the grid
        assert r["n_keys"] == 2 and r["psi"] > 10


class TestNullPatterns:
    def test_pattern_census(self, spark):
        from zoi_spark import tablechecks as tc
        df = spark.createDataFrame(
            [("t", "en"), (None, "en"), (None, None), ("", "de")],
            "text string, lang string")
        out = {r["pattern"]: r for r in
               tc.null_patterns(df, ["text", "lang"]).collect()}
        assert out["00"]["n_rows"] == 1
        assert out["10"]["n_rows"] == 2      # NULL and '' both missing
        assert out["11"]["missing_cols"] == "text,lang"
        assert abs(out["10"]["share"] - 0.5) < 1e-9

    def test_grouped_shares(self, spark):
        from zoi_spark import tablechecks as tc
        df = spark.createDataFrame(
            [("a", None), ("a", 1), ("b", 2)], "g string, v long")
        out = {(r["g"], r["pattern"]): r["share"] for r in
               tc.null_patterns(df, ["v"], by="g").collect()}
        assert abs(out[("a", "1")] - 0.5) < 1e-9
        assert abs(out[("b", "0")] - 1.0) < 1e-9


class TestMonotonicViolations:
    def test_counts_backward_steps(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("u1", 1, 10.0), ("u1", 2, 20.0), ("u1", 3, 15.0),
                ("u2", 1, 5.0), ("u2", 2, 5.0), ("u2", 3, 6.0)]
        df = spark.createDataFrame(rows, "k string, o long, v double")
        out = {r["k"]: r for r in tc.monotonic_violations(
            df, key_col="k", order_col="o", value_col="v").collect()}
        assert out["u1"]["n_inversions"] == 1
        assert abs(out["u1"]["inversion_rate"] - 0.5) < 1e-9
        assert "u2" not in out               # ties are fine non-strict

    def test_strict_flags_ties(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("u2", 1, 5.0), ("u2", 2, 5.0), ("u2", 3, 6.0)]
        df = spark.createDataFrame(rows, "k string, o long, v double")
        out = tc.monotonic_violations(
            df, key_col="k", order_col="o", value_col="v",
            strict=True).collect()
        assert len(out) == 1 and out[0]["n_inversions"] == 1


class TestFdMine:
    def test_confidence_and_exactness(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("a", "x", 1), ("a", "x", 2), ("a", "y", 3),
                ("b", "z", 4)]
        df = spark.createDataFrame(rows, "l string, r string, k long")
        out = {(r["lhs"], r["rhs"]): r for r in tc.fd_mine(
            df, [("l", "r"), ("k", "l")]).collect()}
        lr = out[("l", "r")]
        # best assignment keeps a->x (2 of 3) and b->z: 3/4
        assert abs(lr["confidence"] - 0.75) < 1e-9
        assert lr["holds"] is False and lr["n_lhs"] == 2
        kl = out[("k", "l")]
        assert kl["holds"] is True and kl["confidence"] == 1.0

    def test_empty_candidates_raise(self, spark):
        import pytest as _pt
        from zoi_spark import tablechecks as tc
        df = spark.createDataFrame([(1,)], "a long")
        with _pt.raises(ValueError):
            tc.fd_mine(df, [])


class TestScd2History:
    def test_runs_and_intervals(self, spark):
        from datetime import datetime
        from zoi_spark import tablechecks as tc
        t = datetime
        rows = [("u", t(2026, 1, 1), 1, "a"), ("u", t(2026, 1, 2), 2, "a"),
                ("u", t(2026, 1, 3), 3, "b"), ("u", t(2026, 1, 4), 4, "a")]
        df = spark.createDataFrame(
            rows, "k string, ts timestamp, o long, s string")
        out = sorted(tc.scd2_history(df, key_col="k", ts_col="ts",
                                     state_col="s", order_col="o")
                     .collect(), key=lambda r: r["version"])
        assert [(r["version"], r["state"], r["n_rows"]) for r in out] \
            == [(1, "a", 2), (2, "b", 1), (3, "a", 1)]
        # half-open: v1 closes where v2 opens; only the last is current
        assert out[0]["valid_to"] == out[1]["valid_from"]
        assert [r["is_current"] for r in out] == [False, False, True]

    def test_null_state_is_its_own_state(self, spark):
        from datetime import datetime
        from zoi_spark import tablechecks as tc
        t = datetime
        rows = [("u", t(2026, 1, 1), 1, "a"), ("u", t(2026, 1, 2), 2, None),
                ("u", t(2026, 1, 3), 3, None)]
        df = spark.createDataFrame(
            rows, "k string, ts timestamp, o long, s string")
        out = sorted(tc.scd2_history(df, key_col="k", ts_col="ts",
                                     state_col="s", order_col="o")
                     .collect(), key=lambda r: r["version"])
        assert [(r["state"], r["n_rows"]) for r in out] \
            == [("a", 1), ("∅", 2)]


class TestGroupOls:
    def test_exact_line_per_group(self, spark):
        from zoi_spark import tablechecks as tc
        # g1: y = 2x + 1 exactly; g2: y = -x exactly
        rows = [("g1", 1.0, 3.0), ("g1", 2.0, 5.0), ("g1", 3.0, 7.0),
                ("g2", 1.0, -1.0), ("g2", 4.0, -4.0)]
        df = spark.createDataFrame(rows, "g string, x double, y double")
        out = {r["g"]: r for r in tc.group_ols(
            df, x_col="x", y_col="y", by="g").collect()}
        assert out["g1"]["slope"] == pytest.approx(2.0, abs=1e-6)
        assert out["g1"]["intercept"] == pytest.approx(1.0, abs=1e-6)
        assert out["g1"]["r2"] == pytest.approx(1.0, abs=1e-6)
        assert out["g2"]["slope"] == pytest.approx(-1.0, abs=1e-6)
        assert out["g2"]["n"] == 2

    def test_zero_variance_x_yields_null_not_error(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("g", 1.0, 1.0), ("g", 1.0, 2.0)]
        df = spark.createDataFrame(rows, "g string, x double, y double")
        r = tc.group_ols(df, x_col="x", y_col="y", by="g").collect()[0]
        assert r["slope"] is None and r["r2"] is None

    def test_null_pairs_excluded(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("g", 1.0, 2.0), ("g", 2.0, 4.0), ("g", None, 9.0),
                ("g", 3.0, None)]
        df = spark.createDataFrame(rows, "g string, x double, y double")
        r = tc.group_ols(df, x_col="x", y_col="y", by="g").collect()[0]
        assert r["n"] == 2 and r["slope"] == pytest.approx(2.0, abs=1e-6)


class TestRocAuc:
    def test_perfect_and_reversed(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1)]
        df = spark.createDataFrame(rows, "s double, y int")
        r = tc.roc_auc(df, score_col="s", label_col="y").collect()[0]
        assert r["auc"] == pytest.approx(1.0) and r["n_pos"] == 2
        rev = [(4.0, 0), (3.0, 0), (2.0, 1), (1.0, 1)]
        df2 = spark.createDataFrame(rev, "s double, y int")
        r2 = tc.roc_auc(df2, score_col="s", label_col="y").collect()[0]
        assert r2["auc"] == pytest.approx(0.0)

    def test_ties_get_midrank_half_credit(self, spark):
        from zoi_spark import tablechecks as tc
        # one pos and one neg at the same score: AUC exactly 0.5
        rows = [(1.0, 0), (1.0, 1)]
        df = spark.createDataFrame(rows, "s double, y int")
        r = tc.roc_auc(df, score_col="s", label_col="y").collect()[0]
        assert r["auc"] == pytest.approx(0.5)

    def test_degenerate_group_is_null(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("g", 1.0, 1), ("g", 2.0, 1)]
        df = spark.createDataFrame(rows, "g string, s double, y int")
        r = tc.roc_auc(df, score_col="s", label_col="y",
                       by="g").collect()[0]
        assert r["auc"] is None and r["n_neg"] == 0

    def test_single_shuffle_per_group_plan(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("g", float(i), i % 2) for i in range(20)]
        df = spark.createDataFrame(rows, "g string, s double, y int")
        out = tc.roc_auc(df, score_col="s", label_col="y", by="g")
        plan = out._jdf.queryExecution().executedPlan().toString()
        # agg to (g, s) shuffles on both keys; the window and final
        # fold need only g, so one more exchange — never a global sort
        assert plan.count("Exchange") <= 2
        assert "rangepartitioning" not in plan.lower()


class TestLiftTable:
    def test_known_deciles(self, spark):
        from zoi_spark import tablechecks as tc
        # 10 rows, 2 buckets: top-5 scores carry all 3 flags
        rows = [(i, float(100 - i), 1 if i < 3 else 0)
                for i in range(10)]
        df = spark.createDataFrame(rows, "id long, s double, y int")
        out = {r["bucket"]: r for r in tc.lift_table(
            df, score_col="s", flag_col="y", id_col="id",
            n_buckets=2).collect()}
        assert out[1]["n"] == 5 and out[1]["n_flagged"] == 3
        assert out[1]["rate"] == pytest.approx(0.6)
        assert out[1]["cum_lift"] == pytest.approx(2.0)  # 0.6 / 0.3
        assert out[1]["cum_capture"] == pytest.approx(1.0)
        assert out[2]["cum_lift"] == pytest.approx(1.0)

    def test_tie_break_is_deterministic(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(1, 5.0, 1), (2, 5.0, 0)]  # tie: lower id first
        df = spark.createDataFrame(rows, "id long, s double, y int")
        out = {r["bucket"]: r for r in tc.lift_table(
            df, score_col="s", flag_col="y", id_col="id",
            n_buckets=2).collect()}
        assert out[1]["n_flagged"] == 1 and out[2]["n_flagged"] == 0


class TestTableFingerprint:
    def test_order_and_partitioning_invariant(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(1, "a", "x"), (2, "b", "x"), (3, "c", "y")]
        a = spark.createDataFrame(rows, "id long, s string, g string")
        b = spark.createDataFrame(list(reversed(rows)),
                                  "id long, s string, g string") \
            .repartition(7)
        fa = tc.table_fingerprint(a, ["id", "s", "g"]).collect()[0]
        fb = tc.table_fingerprint(b, ["id", "s", "g"]).collect()[0]
        assert (fa["n_rows"], fa["fp"], fa["fp_min"], fa["fp_max"]) \
            == (fb["n_rows"], fb["fp"], fb["fp_min"], fb["fp_max"])

    def test_content_change_changes_fp(self, spark):
        from zoi_spark import tablechecks as tc
        a = spark.createDataFrame([(1, "a")], "id long, s string")
        b = spark.createDataFrame([(1, "b")], "id long, s string")
        assert tc.table_fingerprint(a, ["id", "s"]).collect()[0]["fp"] \
            != tc.table_fingerprint(b, ["id", "s"]).collect()[0]["fp"]

    def test_null_position_not_ambiguous(self, spark):
        # concat_ws skips NULLs — the sentinel must keep
        # ('a', NULL) distinct from (NULL, 'a')
        from zoi_spark import tablechecks as tc
        a = spark.createDataFrame([("a", None)], "x string, y string")
        b = spark.createDataFrame([(None, "a")], "x string, y string")
        assert tc.table_fingerprint(a, ["x", "y"]).collect()[0]["fp"] \
            != tc.table_fingerprint(b, ["x", "y"]).collect()[0]["fp"]

    def test_snapshot_parity_verdicts(self, spark):
        from zoi_spark import tablechecks as tc
        a = spark.createDataFrame(
            [(1, "a", "g1"), (2, "b", "g1"), (3, "c", "g2"),
             (4, "d", "g3")], "id long, s string, g string")
        # g1 identical (other order), g2 mutated content same count,
        # g3 missing entirely on the replica, g4 extra on the replica
        b = spark.createDataFrame(
            [(2, "b", "g1"), (1, "a", "g1"), (3, "ZZ", "g2"),
             (9, "e", "g4")], "id long, s string, g string")
        out = {r["g"]: r for r in tc.snapshot_parity(
            a, b, ["id", "s", "g"], by="g").collect()}
        assert out["g1"]["match"] and out["g1"]["n_a"] == 2
        assert not out["g2"]["match"]
        assert out["g2"]["n_a"] == out["g2"]["n_b"] == 1
        assert not out["g3"]["match"] and out["g3"]["n_b"] == 0
        assert not out["g4"]["match"] and out["g4"]["n_a"] == 0


class TestWassersteinDrift:
    def test_hand_value(self, spark):
        from zoi_spark import tablechecks as tc
        from pyspark.sql import functions as F
        # A = {1,1,3}, B = {2,4}; support {1,2,3,4}, gaps all 1:
        # |2/3-0| + |2/3-1/2| + |1-1/2| = 0.666667+0.166667+0.5
        rows = [(1, True), (1, True), (3, True), (2, False), (4, False)]
        df = spark.createDataFrame(rows, "v long, a boolean")
        out = tc.wasserstein_drift(df, "v", split=F.col("a")) \
            .collect()[0]
        assert out["w1"] == pytest.approx(1.333333, abs=1e-6)
        assert out["n_values"] == 4
        assert out["n_a"] == 3 and out["n_b"] == 2

    def test_identical_distributions_zero(self, spark):
        from zoi_spark import tablechecks as tc
        from pyspark.sql import functions as F
        rows = [(v, s) for v in (1, 5, 9) for s in (True, False)]
        df = spark.createDataFrame(rows, "v long, a boolean")
        out = tc.wasserstein_drift(df, "v", split=F.col("a")) \
            .collect()[0]
        assert out["w1"] == 0.0

    def test_pure_shift_equals_shift_size(self, spark):
        # W1 of a point mass at 0 vs at 7 is exactly 7 — the
        # location-shift sensitivity KL/PSI bucketing can miss
        from zoi_spark import tablechecks as tc
        from pyspark.sql import functions as F
        rows = [(0, True)] * 3 + [(7, False)] * 3
        df = spark.createDataFrame(rows, "v long, a boolean")
        out = tc.wasserstein_drift(df, "v", split=F.col("a")) \
            .collect()[0]
        assert out["w1"] == pytest.approx(7.0)


class TestPageHinkley:
    def test_flat_series_no_alarm(self, spark):
        from zoi_spark import tablechecks as tc
        df = spark.createDataFrame([(i, 10.0) for i in range(8)],
                                   "t long, x double")
        rows = tc.page_hinkley(df, "x", "t", lam=1.0).collect()
        assert all(r["ph"] == 0.0 for r in rows)
        assert not any(r["alarm"] for r in rows)

    def test_step_shift_alarms_after_jump(self, spark):
        from zoi_spark import tablechecks as tc
        # 10,10,10,10 then 50,50,50,50: PH grows once the mean jumps
        vals = [10.0] * 4 + [50.0] * 4
        df = spark.createDataFrame(list(enumerate(vals)),
                                   "t long, x double")
        rows = tc.page_hinkley(df, "x", "t", lam=20.0).collect()
        rows.sort(key=lambda r: r["order"])
        assert not rows[3]["alarm"]
        assert rows[-1]["alarm"]
        # PH is non-decreasing through a sustained upward shift
        phs = [r["ph"] for r in rows[4:]]
        assert phs == sorted(phs)

    def test_hand_values_first_points(self, spark):
        from zoi_spark import tablechecks as tc
        # x = [4, 8]: mean_1=4, m_1=0; mean_2=6, m_2 = 0+(8-6)=2,
        # ph_2 = 2 - min(0,2) = 2
        df = spark.createDataFrame([(0, 4.0), (1, 8.0)],
                                   "t long, x double")
        rows = {r["order"]: r for r in
                tc.page_hinkley(df, "x", "t").collect()}
        assert rows[0]["m"] == 0.0 and rows[0]["ph"] == 0.0
        assert rows[1]["m"] == 2.0 and rows[1]["ph"] == 2.0


class TestEcodOutliers:
    def test_extreme_point_scores_highest(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(i, float(v)) for i, v in
                enumerate([5, 6, 7, 5, 6, 7, 5, 6, 7, 100])]
        df = spark.createDataFrame(rows, "id long, v double")
        out = tc.ecod_outliers(df, ["v"], id_cols=["id"]).collect()
        top = max(out, key=lambda r: r["ecod_score"])
        assert top["id"] == 9
        # right tail of the max point includes only itself: -ln(1/10)
        assert top["score_right"] == pytest.approx(2.302585, abs=1e-6)

    def test_tail_probabilities_include_self(self, spark):
        # min point: left tail = its own mass -> -ln(1/n); never inf
        from zoi_spark import tablechecks as tc
        import math
        rows = [(i, float(i)) for i in range(5)]
        df = spark.createDataFrame(rows, "id long, v double")
        out = {r["id"]: r for r in
               tc.ecod_outliers(df, ["v"], id_cols=["id"]).collect()}
        assert out[0]["score_left"] == pytest.approx(math.log(5.0),
                                                     abs=1e-6)
        assert all(math.isfinite(r["ecod_score"])
                   for r in out.values())

    def test_multi_dim_sums_dimensions(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(i, float(i), float(10 - i)) for i in range(10)]
        df = spark.createDataFrame(rows, "id long, a double, b double")
        out = {r["id"]: r for r in
               tc.ecod_outliers(df, ["a", "b"],
                                id_cols=["id"]).collect()}
        # symmetric construction: left score of id 0 equals a's left
        # tail -ln(1/10) plus b's left tail -ln(1) = 0 contribution
        one_dim = {r["id"]: r for r in
                   tc.ecod_outliers(df, ["a"],
                                    id_cols=["id"]).collect()}
        assert out[0]["score_left"] >= one_dim[0]["score_left"]


class TestEnergyDrift:
    def test_identical_distributions_zero(self, spark):
        from zoi_spark import tablechecks as tc
        from pyspark.sql import functions as F
        rows = [(v, s) for v in (1, 5, 9) for s in (True, False)]
        df = spark.createDataFrame(rows, "v long, a boolean")
        out = tc.energy_drift(df, "v", split=F.col("a")).collect()[0]
        assert out["energy_d2"] == 0.0
        assert out["e_xy"] == out["e_xx"] == out["e_yy"]

    def test_point_masses_hand_value(self, spark):
        # A = delta at 0, B = delta at 7: E|X-Y| = 7, E|X-X'| =
        # E|Y-Y'| = 0, D^2 = 14 (= 2 * W1 for point masses)
        from zoi_spark import tablechecks as tc
        from pyspark.sql import functions as F
        rows = [(0, True)] * 3 + [(7, False)] * 3
        df = spark.createDataFrame(rows, "v long, a boolean")
        out = tc.energy_drift(df, "v", split=F.col("a")).collect()[0]
        assert out["e_xy"] == pytest.approx(7.0)
        assert out["e_xx"] == 0.0 and out["e_yy"] == 0.0
        assert out["energy_d2"] == pytest.approx(14.0)

    def test_nonnegative_on_overlap(self, spark):
        from zoi_spark import tablechecks as tc
        from pyspark.sql import functions as F
        rows = ([(1, True), (2, True), (3, True)]
                + [(2, False), (3, False), (9, False)])
        df = spark.createDataFrame(rows, "v long, a boolean")
        out = tc.energy_drift(df, "v", split=F.col("a")).collect()[0]
        assert out["energy_d2"] > 0


class TestMcnemar:
    def test_hand_cells_and_chi2(self, spark):
        from zoi_spark import tablechecks as tc
        from pyspark.sql import functions as F
        # a: first 6 pass; b: first 2 pass -> b-cell (pass->fail)=4,
        # c-cell=0, chi2 = (|4-0|-1)^2/4 = 2.25
        rows = [(i,) for i in range(10)]
        df = spark.createDataFrame(rows, "i long")
        out = tc.mcnemar(df, F.col("i") < 6, F.col("i") < 2) \
            .collect()[0]
        assert out["n_pass_pass"] == 2 and out["n_pass_fail"] == 4
        assert out["n_fail_pass"] == 0 and out["n_fail_fail"] == 4
        assert out["chi2"] == pytest.approx(2.25)
        assert not out["significant_05"]

    def test_no_discordance_zero(self, spark):
        from zoi_spark import tablechecks as tc
        from pyspark.sql import functions as F
        df = spark.createDataFrame([(1,), (2,)], "i long")
        out = tc.mcnemar(df, F.col("i") > 0, F.col("i") > 0) \
            .collect()[0]
        assert out["chi2"] == 0.0 and not out["significant_05"]

    def test_large_asymmetric_shift_significant(self, spark):
        from zoi_spark import tablechecks as tc
        from pyspark.sql import functions as F
        # 30 pass->fail, 2 fail->pass: chi2 = 27^2/32 >> 3.84
        rows = [(i,) for i in range(40)]
        df = spark.createDataFrame(rows, "i long")
        out = tc.mcnemar(df, F.col("i") < 32,
                         (F.col("i") < 2) | (F.col("i") >= 38)) \
            .collect()[0]
        assert out["significant_05"]


class TestTheilSen:
    def test_exact_line_recovers_slope(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(t, 3.0 * t + 2.0) for t in range(6)]
        df = spark.createDataFrame(rows, "t long, x double")
        out = tc.theil_sen(df, "x", "t").collect()[0]
        assert out["slope"] == pytest.approx(3.0)
        assert out["intercept"] == pytest.approx(2.0)
        assert out["n_points"] == 6 and out["n_pairs"] == 15

    def test_outlier_resistant_vs_mean(self, spark):
        # one wild day on a flat series: median slope stays ~0
        from zoi_spark import tablechecks as tc
        rows = [(t, 10.0) for t in range(9)] + [(9, 1000.0)]
        df = spark.createDataFrame(rows, "t long, x double")
        out = tc.theil_sen(df, "x", "t").collect()[0]
        assert abs(out["slope"]) < 1e-9


class TestMannKendall:
    def test_monotone_series_significant(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(t, float(t)) for t in range(12)]
        df = spark.createDataFrame(rows, "t long, x double")
        out = tc.mann_kendall(df, "x", "t").collect()[0]
        assert out["s"] == 66  # all 66 pairs concordant
        assert out["trend_05"]

    def test_constant_series_all_ties(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(t, 5.0) for t in range(8)]
        df = spark.createDataFrame(rows, "t long, x double")
        out = tc.mann_kendall(df, "x", "t").collect()[0]
        assert out["s"] == 0 and out["z"] == 0.0
        assert not out["trend_05"]
        # tie term equals the full variance term -> var_s == 0
        assert out["var_s"] == 0.0

    def test_hand_variance_no_ties(self, spark):
        from zoi_spark import tablechecks as tc
        # n=4 distinct: var = 4*3*13/18 = 26/3
        rows = [(0, 3.0), (1, 1.0), (2, 4.0), (3, 2.0)]
        df = spark.createDataFrame(rows, "t long, x double")
        out = tc.mann_kendall(df, "x", "t").collect()[0]
        assert out["var_s"] == pytest.approx(26 / 3, abs=1e-5)


class TestTsSanityAudit:
    def test_counts_each_anomaly(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("2024-01-03 10:30:00",),   # weekday, fine
                ("1970-01-01 00:00:00",),   # epoch zero (+ midnight)
                ("2030-01-01 12:00:00",),   # future
                ("2024-01-06 00:00:00",),   # saturday midnight
                (None,)]
        df = spark.createDataFrame(rows, "s string") \
            .selectExpr("CAST(s AS TIMESTAMP) AS ts")
        out = tc.ts_sanity_audit(df, "ts",
                                 cutoff="2025-01-01 00:00:00") \
            .collect()[0]
        assert out["n"] == 5 and out["n_null"] == 1
        assert out["n_epoch_zero"] == 1
        assert out["n_future"] == 1
        assert out["n_midnight"] == 2
        # weekend among 4 non-null: epoch zero is a Thursday;
        # only the Saturday row counts
        assert out["weekend_share"] == pytest.approx(0.25)


class TestBinsegSplit:
    def test_finds_exact_step(self, spark):
        from zoi_spark import tablechecks as tc
        vals = [10.0] * 5 + [50.0] * 5
        df = spark.createDataFrame(list(enumerate(vals)),
                                   "t long, x double")
        out = tc.binseg_split(df, "x", "t").collect()[0]
        assert out["split_order"] == 4    # last left point
        assert out["n_left"] == 5 and out["n_right"] == 5
        assert out["mean_left"] == 10.0
        assert out["mean_right"] == 50.0
        assert out["sse_split"] == 0.0
        assert out["gain"] == out["sse_total"]

    def test_flat_series_zero_gain(self, spark):
        from zoi_spark import tablechecks as tc
        df = spark.createDataFrame([(t, 7.0) for t in range(6)],
                                   "t long, x double")
        out = tc.binseg_split(df, "x", "t").collect()[0]
        assert out["gain"] == 0.0
        assert out["split_order"] == 0  # tie -> earliest split


class TestWeeklySeasonality:
    def test_respecting_rhythm_not_flagged(self, spark):
        from zoi_spark import tablechecks as tc
        # two weeks, Sundays always quiet: residuals all 0
        rows = []
        import datetime
        for w in range(4):
            for dw in range(7):
                day = datetime.datetime(2024, 1, 1 + 7 * w + dw, 12)
                vol = 10 if day.isoweekday() == 7 else 100
                rows += [(day,)] * vol
        df = spark.createDataFrame(rows, "ts timestamp")
        out = tc.weekly_seasonality(df, "ts").collect()
        assert not any(r["flagged"] for r in out)
        assert all(r["residual"] == 0.0 for r in out)

    def test_broken_rhythm_day_flagged(self, spark):
        from zoi_spark import tablechecks as tc
        import datetime
        rows = []
        for d in range(28):
            day = datetime.datetime(2024, 1, 1 + d, 12)
            vol = 5 if d == 15 else 100  # one collapsed weekday
            rows += [(day,)] * vol
        df = spark.createDataFrame(rows, "ts timestamp")
        out = {r["day"].isoformat(): r["flagged"]
               for r in tc.weekly_seasonality(df, "ts").collect()}
        assert out["2024-01-16"]
        assert sum(out.values()) <= 5  # its weekday peers may co-flag

    def test_iso_dow_convention(self, spark):
        from zoi_spark import tablechecks as tc
        import datetime
        # 2024-01-01 is a Monday -> ISO dow 1
        df = spark.createDataFrame(
            [(datetime.datetime(2024, 1, 1, 8),)], "ts timestamp")
        assert tc.weekly_seasonality(df, "ts").first()["dow"] == 1


class TestBinAdvisor:
    def test_hand_values_uniform(self, spark):
        from zoi_spark import tablechecks as tc
        import math
        vals = [float(i) for i in range(1, 101)]
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        out = tc.bin_advisor(df, "v").collect()[0]
        assert out["n"] == 100
        assert out["vmin"] == 1.0 and out["vmax"] == 100.0
        # exact interpolated IQR of 1..100 = 75.25 - 25.75 = 49.5
        assert out["iqr"] == pytest.approx(49.5)
        assert out["fd_width"] == pytest.approx(
            2 * 49.5 / 100 ** (1 / 3), abs=1e-5)
        assert out["sturges_bins"] == math.ceil(math.log2(100)) + 1
        assert out["fd_bins"] == math.ceil(99 / (2 * 49.5 / 100 ** (1 / 3)))

    def test_degenerate_constant_column(self, spark):
        from zoi_spark import tablechecks as tc
        df = spark.createDataFrame([(5.0,)] * 10, "v double")
        out = tc.bin_advisor(df, "v").collect()[0]
        assert out["iqr"] == 0.0 and out["sigma"] == 0.0
        assert out["fd_bins"] is None and out["scott_bins"] is None


class TestCvmDrift:
    def test_identical_distributions_zero(self, spark):
        from zoi_spark import tablechecks as tc
        from pyspark.sql import functions as F
        rows = [(v, s) for v in (1, 5, 9) for s in (True, False)]
        df = spark.createDataFrame(rows, "v long, a boolean")
        out = tc.cvm_drift(df, "v", split=F.col("a")).collect()[0]
        assert out["t"] == 0.0

    def test_hand_value_disjoint(self, spark):
        # A = {0,0}, B = {7,7}: at v=0 Fa=1, Fb=0 (gap² = 1, 2 obs);
        # at v=7 both 1 (gap 0). T = (2·2/16)·(1·2) = 0.5
        from zoi_spark import tablechecks as tc
        from pyspark.sql import functions as F
        rows = [(0, True)] * 2 + [(7, False)] * 2
        df = spark.createDataFrame(rows, "v long, a boolean")
        out = tc.cvm_drift(df, "v", split=F.col("a")).collect()[0]
        assert out["t"] == pytest.approx(0.5)
        assert out["n_a"] == 2 and out["n_b"] == 2


class TestAnovaOneway:
    def test_hand_f_two_groups(self, spark):
        # A = {1,2,3}, B = {4,5,6}: SSB = 13.5, SSW = 4,
        # F = (13.5/1)/(4/4) = 13.5
        from zoi_spark import tablechecks as tc
        rows = ([(v, "A") for v in (1, 2, 3)]
                + [(v, "B") for v in (4, 5, 6)])
        df = spark.createDataFrame(rows, "v long, g string")
        out = tc.anova_oneway(df, "v", by="g").collect()[0]
        assert out["k"] == 2 and out["n"] == 6
        assert out["ssb"] == pytest.approx(13.5)
        assert out["ssw"] == pytest.approx(4.0)
        assert out["f"] == pytest.approx(13.5)

    def test_equal_means_f_near_zero(self, spark):
        from zoi_spark import tablechecks as tc
        rows = ([(v, "A") for v in (1, 2, 3)]
                + [(v, "B") for v in (2, 1, 3)])
        df = spark.createDataFrame(rows, "v long, g string")
        out = tc.anova_oneway(df, "v", by="g").collect()[0]
        assert out["ssb"] == 0.0 and out["f"] == 0.0

    def test_degenerate_zero_within_variance(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(1, "A"), (1, "A"), (2, "B"), (2, "B")]
        df = spark.createDataFrame(rows, "v long, g string")
        out = tc.anova_oneway(df, "v", by="g").collect()[0]
        assert out["ssw"] == 0.0 and out["f"] is None


class TestTukeyHsdPairs:
    def test_hand_q_balanced(self, spark):
        from zoi_spark import tablechecks as tc
        import math
        # A={1,2,3}, B={4,5,6}: MSW = 4/4 = 1,
        # q = 3 / sqrt(1/2 * (2/3)) = 3 / sqrt(1/3)
        rows = ([(v, "A") for v in (1, 2, 3)]
                + [(v, "B") for v in (4, 5, 6)])
        df = spark.createDataFrame(rows, "v long, g string")
        out = tc.tukey_hsd_pairs(df, "v", by="g").collect()
        assert len(out) == 1
        r = out[0]
        assert (r["group_a"], r["group_b"]) == ("A", "B")
        assert r["q"] == pytest.approx(3 / math.sqrt(1 / 3), abs=1e-5)

    def test_pair_count_is_k_choose_2(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(v + 10 * g, f"g{g}") for g in range(4)
                for v in (1, 2, 3)]
        df = spark.createDataFrame(rows, "v long, g string")
        assert tc.tukey_hsd_pairs(df, "v", by="g").count() == 6


class TestBrownForsythe:
    def test_equal_spreads_f_zero(self, spark):
        from zoi_spark import tablechecks as tc
        # same shape, different location: |x - med| identical
        rows = ([(v, "A") for v in (1, 2, 3)]
                + [(v + 100, "B") for v in (1, 2, 3)])
        df = spark.createDataFrame(rows, "v long, g string")
        out = tc.brown_forsythe(df, "v", by="g").collect()[0]
        assert out["ssb"] == 0.0 and out["f"] == 0.0

    def test_different_spreads_detected(self, spark):
        from zoi_spark import tablechecks as tc
        rows = ([(v, "A") for v in (10, 11, 12, 10, 11, 12)]
                + [(v, "B") for v in (0, 50, 100, 0, 50, 100)])
        df = spark.createDataFrame(rows, "v long, g string")
        out = tc.brown_forsythe(df, "v", by="g").collect()[0]
        # B's |x - med| = {50, 0, 50, ...} vs A's {1, 0, 1, ...}:
        # F = (3201.33/1)/(3334.67/10) = 9.6 — clearly significant
        # (F(1,10) 5% critical ≈ 4.96)
        assert out["f"] == pytest.approx(9.60016, abs=1e-4)


class TestPowerAdvisor:
    def test_monotone_in_mde(self, spark):
        from zoi_spark import tablechecks as tc
        from pyspark.sql import functions as F
        df = spark.createDataFrame([(i,) for i in range(100)],
                                   "i long")
        flag = F.col("i") < 50
        small = tc.power_advisor(df, flag, mde=0.01).first()
        big = tc.power_advisor(df, flag, mde=0.10).first()
        assert small["n_per_group"] > big["n_per_group"]
        assert small["p1"] == 0.5

    def test_hand_value_p_half(self, spark):
        from zoi_spark import tablechecks as tc
        from pyspark.sql import functions as F
        import math
        df = spark.createDataFrame([(0,), (1,)], "i long")
        out = tc.power_advisor(df, F.col("i") >= 1, mde=0.1).first()
        p1, p2, pbar = 0.5, 0.6, 0.55
        num = (1.959964 * math.sqrt(2 * pbar * (1 - pbar))
               + 0.841621 * math.sqrt(p1 * 0.5 + p2 * 0.4)) ** 2
        assert out["n_per_group"] == math.ceil(num / 0.01)

    def test_rejects_bad_mde(self, spark):
        from zoi_spark import tablechecks as tc
        from pyspark.sql import functions as F
        df = spark.createDataFrame([(1,)], "i long")
        with pytest.raises(ValueError):
            tc.power_advisor(df, F.col("i") > 0, mde=1.5)


class TestClassifierPrf:
    def test_hand_confusion(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("a", "a"), ("a", "a"), ("a", "b"),
                ("b", "b"), ("b", "a"), ("c", "a")]
        df = spark.createDataFrame(rows, "lbl string, prd string")
        out = {r["class"]: r for r in
               tc.classifier_prf(df, "lbl", "prd").collect()}
        # class a: tp=2, fp=2 (b->a, c->a), fn=1 (a->b)
        assert (out["a"]["tp"], out["a"]["fp"], out["a"]["fn"]) \
            == (2, 2, 1)
        assert out["a"]["precision"] == pytest.approx(0.5)
        assert out["a"]["recall"] == pytest.approx(2 / 3)
        # class c never predicted: precision NULL, recall 0
        assert out["c"]["precision"] is None
        assert out["c"]["recall"] == 0.0

    def test_perfect_classifier(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("x", "x")] * 3 + [("y", "y")] * 2
        df = spark.createDataFrame(rows, "lbl string, prd string")
        out = tc.classifier_prf(df, "lbl", "prd").collect()
        assert all(r["f1"] == 1.0 for r in out)


class TestXcorr:
    def test_shifted_copy_peaks_at_lag(self, spark):
        from zoi_spark import tablechecks as tc
        # y is x shifted by 2 steps: r(2) == 1.0 exactly
        xs = [1.0, 5.0, 2.0, 8.0, 3.0, 9.0, 4.0, 7.0, 6.0, 2.0]
        rows = [(t, xs[t], xs[t - 2] if t >= 2 else 0.0)
                for t in range(10)]
        df = spark.createDataFrame(rows, "t long, x double, y double")
        out = {r["lag"]: r for r in
               tc.xcorr(df, "x", "y", "t", max_lag=3).collect()}
        assert out[2]["r"] == pytest.approx(1.0)
        assert out[2]["n_pairs"] == 8
        assert abs(out[0]["r"]) < 1.0

    def test_lag_window_sizes(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(t, float(t), float(t * t)) for t in range(6)]
        df = spark.createDataFrame(rows, "t long, x double, y double")
        out = {r["lag"]: r["n_pairs"] for r in
               tc.xcorr(df, "x", "y", "t", max_lag=2).collect()}
        assert out == {-2: 4, -1: 5, 0: 6, 1: 5, 2: 4}


class TestSimpsonsCheck:
    def test_detects_reversal(self, spark):
        from zoi_spark import tablechecks as tc
        # within each group y DECREASES in x; pooled (group B offset
        # high in both x and y) slope is POSITIVE -> classic paradox
        rows = ([(x, 10.0 - x, "A") for x in (1.0, 2.0, 3.0)]
                + [(x, 30.0 - x, "B") for x in (11.0, 12.0, 13.0)])
        df = spark.createDataFrame(rows, "x double, y double, g string")
        out = {r["group"]: r for r in
               tc.simpsons_check(df, "x", "y", by="g").collect()}
        assert out["A"]["slope"] == pytest.approx(-1.0)
        assert out["A"]["pooled_slope"] > 0
        assert out["A"]["reversed"] and out["B"]["reversed"]

    def test_degenerate_group_null_slope(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(1.0, 2.0, "A"), (1.0, 5.0, "A"),
                (1.0, 1.0, "B"), (2.0, 2.0, "B")]
        df = spark.createDataFrame(rows, "x double, y double, g string")
        out = {r["group"]: r for r in
               tc.simpsons_check(df, "x", "y", by="g").collect()}
        assert out["A"]["slope"] is None
        assert not out["A"]["reversed"]


class TestDurbinWatson:
    def test_alternating_residuals_dw_near_4(self, spark):
        from zoi_spark import tablechecks as tc
        # zero-slope series with alternating +1/-1 residuals:
        # DW = sum((±2)²)/(n·1) -> ~4 (negative autocorrelation)
        vals = [10.0 + (1.0 if t % 2 == 0 else -1.0)
                for t in range(20)]
        df = spark.createDataFrame(list(enumerate(vals)),
                                   "t long, x double")
        out = tc.durbin_watson(df, "x", "t").collect()[0]
        assert out["dw"] > 3.5

    def test_trending_walk_dw_small(self, spark):
        from zoi_spark import tablechecks as tc
        # smooth curvature the line can't fit -> runs of same-sign
        # residuals -> DW << 2
        vals = [float(t * t) for t in range(20)]
        df = spark.createDataFrame(list(enumerate(vals)),
                                   "t long, x double")
        out = tc.durbin_watson(df, "x", "t").collect()[0]
        assert out["dw"] < 1.0


class TestPeriodogramAt:
    def test_pure_cycle_explains_all_variance(self, spark):
        from zoi_spark import tablechecks as tc
        import math
        vals = [(t, 100 + 10 * math.cos(2 * math.pi * t / 7))
                for t in range(28)]
        df = spark.createDataFrame(vals, "t long, x double")
        out = tc.periodogram_at(df, "x", "t", period=7.0) \
            .collect()[0]
        assert out["var_share"] == pytest.approx(1.0, abs=1e-6)

    def test_flat_series_zero_power(self, spark):
        from zoi_spark import tablechecks as tc
        df = spark.createDataFrame([(t, 5.0) for t in range(14)],
                                   "t long, x double")
        out = tc.periodogram_at(df, "x", "t").collect()[0]
        assert out["power"] == 0.0
        assert out["var_share"] is None  # ss == 0 -> undefined


class TestCooksDistance:
    def test_outlier_day_most_influential(self, spark):
        from zoi_spark import tablechecks as tc
        vals = [float(2 * t) for t in range(12)]
        vals[11] = 100.0  # high-leverage endpoint outlier
        df = spark.createDataFrame(list(enumerate(vals)),
                                   "t long, x double")
        rows = tc.cooks_distance(df, "x", "t").collect()
        top = max(rows, key=lambda r: r["cooks_d"])
        assert top["order"] == 11 and top["influential"]

    def test_perfect_line_no_influence(self, spark):
        from zoi_spark import tablechecks as tc
        df = spark.createDataFrame(
            [(t, 3.0 * t + 1) for t in range(10)], "t long, x double")
        rows = tc.cooks_distance(df, "x", "t").collect()
        assert all(r["residual"] == 0.0 for r in rows)
        assert not any(r["influential"] for r in rows)


class TestNegbinFit:
    def test_poisson_like_no_shape(self, spark):
        from zoi_spark import tablechecks as tc
        # variance <= mean -> degenerate, r/p NULL
        df = spark.createDataFrame([(5.0,)] * 6, "c double")
        out = tc.negbin_fit(df, "c").collect()[0]
        assert out["var"] == 0.0
        assert out["nb_r"] is None and out["nb_p"] is None

    def test_hand_mom_values(self, spark):
        from zoi_spark import tablechecks as tc
        # counts 1,2,9: m=4, s²=19 -> r=16/15, p=4/19
        df = spark.createDataFrame([(1.0,), (2.0,), (9.0,)],
                                   "c double")
        out = tc.negbin_fit(df, "c").collect()[0]
        assert out["mean"] == pytest.approx(4.0)
        assert out["var"] == pytest.approx(19.0)
        assert out["nb_r"] == pytest.approx(16 / 15, abs=1e-5)
        assert out["nb_p"] == pytest.approx(4 / 19, abs=1e-5)


class TestCuped:
    def test_perfectly_correlated_removes_variance(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(float(i), 2.0 * i + 3) for i in range(10)]
        df = spark.createDataFrame(rows, "pre double, post double")
        out = tc.cuped(df, "pre", "post").collect()[0]
        assert out["theta"] == pytest.approx(2.0)
        assert out["rho"] == pytest.approx(1.0)
        assert out["var_ratio"] == pytest.approx(0.0, abs=1e-9)

    def test_independent_covariate_no_gain(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(1.0, 5.0), (2.0, 5.0), (1.0, 9.0), (2.0, 9.0)]
        df = spark.createDataFrame(rows, "pre double, post double")
        out = tc.cuped(df, "pre", "post").collect()[0]
        assert out["rho"] == pytest.approx(0.0)
        assert out["var_ratio"] == pytest.approx(1.0)


class TestJackknifeGroups:
    def test_iid_groups_ratio_near_one(self, spark):
        from zoi_spark import tablechecks as tc
        # groups are arbitrary slices of the same distribution:
        # the jackknife SE should not wildly exceed the naive SE
        rows = [(float(v), f"g{v % 4}") for v in range(40)]
        df = spark.createDataFrame(rows, "v double, g string")
        out = tc.jackknife_groups(df, "v", by="g").collect()[0]
        assert out["g"] == 4 and out["n"] == 40
        assert 0.1 < out["design_ratio"] < 3.0

    def test_clustered_means_inflate_se(self, spark):
        from zoi_spark import tablechecks as tc
        # extreme clustering: each group is a point mass at a very
        # different level -> jackknife SE >> naive SE
        rows = ([(0.0, "a")] * 10 + [(0.1, "b")] * 10
                + [(100.0, "c")] * 10 + [(100.1, "d")] * 10)
        df = spark.createDataFrame(rows, "v double, g string")
        out = tc.jackknife_groups(df, "v", by="g").collect()[0]
        assert out["design_ratio"] > 2.0


class TestMarkovEntropyRate:
    def test_deterministic_cycle_zero_rate(self, spark):
        from zoi_spark import tablechecks as tc
        # a->b->a->b...: next state fully determined -> h_rate 0,
        # marginal entropy 1 bit -> predictability 1
        rows = [(1, t, "a" if t % 2 == 0 else "b")
                for t in range(20)]
        df = spark.createDataFrame(rows, "u long, t long, s string")
        out = tc.markov_entropy_rate(df, "s", "t", by="u") \
            .collect()[0]
        assert out["h_rate"] == 0.0
        # 19 transitions: 10 b / 9 a -> H just under 1 bit
        assert 0.99 < out["h_marginal"] <= 1.0
        assert out["predictability"] == pytest.approx(1.0)

    def test_single_state_stream(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(1, t, "x") for t in range(5)]
        df = spark.createDataFrame(rows, "u long, t long, s string")
        out = tc.markov_entropy_rate(df, "s", "t", by="u") \
            .collect()[0]
        assert out["n_states"] == 1
        assert out["h_rate"] == 0.0 and out["h_marginal"] == 0.0
        assert out["predictability"] is None  # 0/0 -> undefined


class TestRollingReach:
    def test_hand_windows(self, spark):
        import datetime
        from zoi_spark import tablechecks as tc
        rows = [(datetime.datetime(2024, 1, 1, 9), 1),
                (datetime.datetime(2024, 1, 1, 10), 2),
                (datetime.datetime(2024, 1, 5, 9), 2),
                (datetime.datetime(2024, 1, 9, 9), 3)]
        df = spark.createDataFrame(rows, "ts timestamp, u long")
        out = {r["day"].isoformat(): r for r in
               tc.rolling_reach(df, "ts", "u").collect()}
        assert out["2024-01-01"]["dau"] == 2
        assert out["2024-01-01"]["wau"] == 2
        # Jan 5 window [Dec 30, Jan 5] includes Jan 1 users
        assert out["2024-01-05"]["dau"] == 1
        assert out["2024-01-05"]["wau"] == 2
        # Jan 9 window [Jan 3, Jan 9]: users {2 (Jan 5), 3}
        assert out["2024-01-09"]["wau"] == 2

    def test_stickiness_one_when_same_users_daily(self, spark):
        import datetime
        from zoi_spark import tablechecks as tc
        rows = [(datetime.datetime(2024, 1, d, 9), u)
                for d in range(1, 8) for u in (1, 2, 3)]
        df = spark.createDataFrame(rows, "ts timestamp, u long")
        out = tc.rolling_reach(df, "ts", "u").collect()
        assert all(r["stickiness"] == 1.0 for r in out)


class TestNewVsReturning:
    def test_first_day_classification(self, spark):
        import datetime
        from zoi_spark import tablechecks as tc
        rows = [(datetime.datetime(2024, 1, 1, 9), 1),
                (datetime.datetime(2024, 1, 2, 9), 1),
                (datetime.datetime(2024, 1, 2, 9), 2)]
        df = spark.createDataFrame(rows, "ts timestamp, u long")
        out = {r["day"].isoformat(): r for r in
               tc.new_vs_returning(df, "ts", "u").collect()}
        d1, d2 = out["2024-01-01"], out["2024-01-02"]
        assert (d1["n_new"], d1["n_returning"]) == (1, 0)
        assert (d2["n_new"], d2["n_returning"]) == (1, 1)
        assert d2["new_share"] == 0.5


class TestLjungBox:
    def test_strong_lag_echo_dominates_q(self, spark):
        from zoi_spark import tablechecks as tc
        import math
        vals = [(t, 10 + 5 * math.cos(2 * math.pi * t / 4))
                for t in range(40)]
        df = spark.createDataFrame(vals, "t long, x double")
        rows = {r["lag"]: r for r in
                tc.ljung_box(df, "x", "t", max_lag=4).collect()}
        # period-4 cosine: r(4) ~ +1, r(2) ~ -1
        assert rows[4]["r"] > 0.8 and rows[2]["r"] < -0.8
        assert rows[4]["q_cum"] > 50

    def test_q_cum_monotone(self, spark):
        from zoi_spark import tablechecks as tc
        vals = [(t, float((t * 7919) % 13)) for t in range(30)]
        df = spark.createDataFrame(vals, "t long, x double")
        rows = tc.ljung_box(df, "x", "t", max_lag=5) \
            .orderBy("lag").collect()
        qs = [r["q_cum"] for r in rows]
        assert qs == sorted(qs)


class TestCaptureRecapture:
    def test_independent_passes_recover_n(self, spark):
        from zoi_spark import tablechecks as tc
        from pyspark.sql import functions as F
        # universe 0..999; A = 50% (even), B = 20% (id%5==0) —
        # B ⊂ evens? no: id%5==0 includes odds (5,15..). Overlap =
        # ids divisible by 10 -> m=100, n1=500, n2=200
        df = spark.createDataFrame([(i,) for i in range(1000)],
                                   "id long")
        out = tc.capture_recapture(
            df, "id", in_a=F.col("id") % 2 == 0,
            in_b=F.col("id") % 5 == 0).collect()[0]
        assert (out["n_a"], out["n_b"], out["n_both"]) \
            == (500, 200, 100)
        # Chapman: 501*201/101 - 1 = 996.06...
        assert out["n_hat"] == pytest.approx(501 * 201 / 101 - 1,
                                             abs=1e-4)

    def test_duplicate_observations_collapse(self, spark):
        from zoi_spark import tablechecks as tc
        from pyspark.sql import functions as F
        df = spark.createDataFrame([(1,), (1,), (2,)], "id long")
        out = tc.capture_recapture(
            df, "id", in_a=F.lit(True), in_b=F.lit(True)) \
            .collect()[0]
        assert out["n_universe"] == 2 and out["n_both"] == 2


class TestShiftShare:
    def test_mix_effects_sum_to_zero(self, spark):
        from zoi_spark import tablechecks as tc
        from pyspark.sql import functions as F
        rows = [("a", 10.0, False), ("a", 30.0, True),
                ("b", 20.0, False), ("b", 15.0, True)]
        df = spark.createDataFrame(rows, "g string, v double, p boolean")
        out = tc.shift_share(df, "v", by="g",
                             period=F.col("p")).collect()
        assert sum(r["mix_effect"] for r in out) == pytest.approx(
            0.0, abs=1e-6)
        # totals: 30 -> 45, ratio 1.5; a: growth 5, mix 30-15=15
        ra = next(r for r in out if r["segment"] == "a")
        assert ra["growth_effect"] == pytest.approx(5.0)
        assert ra["mix_effect"] == pytest.approx(15.0)


class TestRecordDays:
    def test_strictly_increasing_all_records(self, spark):
        from zoi_spark import tablechecks as tc
        df = spark.createDataFrame([(t, float(t)) for t in range(10)],
                                   "t long, x double")
        out = tc.record_days(df, "x", "t").collect()[0]
        assert out["n_records"] == 10
        # H_10 = 2.928968
        assert out["expected_records"] == pytest.approx(2.928968,
                                                        abs=1e-5)
        assert out["excess"] == pytest.approx(10 - 2.928968,
                                              abs=1e-5)

    def test_decreasing_single_record(self, spark):
        from zoi_spark import tablechecks as tc
        df = spark.createDataFrame(
            [(t, float(10 - t)) for t in range(10)], "t long, x double")
        out = tc.record_days(df, "x", "t").collect()[0]
        assert out["n_records"] == 1

    def test_ties_are_not_records(self, spark):
        from zoi_spark import tablechecks as tc
        df = spark.createDataFrame([(0, 5.0), (1, 5.0), (2, 5.0)],
                                   "t long, x double")
        out = tc.record_days(df, "x", "t").collect()[0]
        assert out["n_records"] == 1


class TestCChart:
    def test_limits_and_flags(self, spark):
        from zoi_spark import tablechecks as tc
        from pyspark.sql import functions as F
        import math
        rows = [(t, 100.0) for t in range(10)] + [(10, 200.0)]
        df = spark.createDataFrame(rows, "t long, x double")
        out = {r["order"]: r for r in
               tc.c_chart(df, "x", "t",
                          baseline=F.col("t") < 10).collect()}
        assert out[0]["center"] == 100.0
        assert out[0]["ucl"] == pytest.approx(100 + 30.0)
        assert out[0]["lcl"] == pytest.approx(100 - 30.0)
        assert not out[0]["out_of_control"]
        assert out[10]["out_of_control"]

    def test_lcl_floored_at_zero(self, spark):
        from zoi_spark import tablechecks as tc
        from pyspark.sql import functions as F
        df = spark.createDataFrame([(t, 2.0) for t in range(5)],
                                   "t long, x double")
        out = tc.c_chart(df, "x", "t",
                         baseline=F.lit(True)).collect()[0]
        assert out["lcl"] == 0.0  # 2 - 3*sqrt(2) < 0 -> floored


class TestUnitMixDetector:
    def test_detached_mode_flagged(self, spark):
        from zoi_spark import tablechecks as tc
        rows = ([("a", 5.0)] * 6 + [("a", 5000.0)] * 4
                + [("b", 5.0)] * 10)
        df = spark.createDataFrame(rows, "g string, v double")
        out = {r["group"]: r for r in
               tc.unit_mix_detector(df, "v", by="g").collect()}
        assert out["a"]["unit_mix"]
        assert out["a"]["top_decade"] == 0
        assert out["a"]["second_decade"] == 3
        assert not out["b"]["unit_mix"]
        assert out["b"]["second_decade"] is None

    def test_adjacent_decades_not_flagged(self, spark):
        # heavy tail spilling into the NEXT decade is normal
        from zoi_spark import tablechecks as tc
        rows = [("a", 5.0)] * 6 + [("a", 50.0)] * 4
        df = spark.createDataFrame(rows, "g string, v double")
        out = tc.unit_mix_detector(df, "v", by="g").collect()[0]
        assert not out["unit_mix"]

    def test_nonpositive_values_excluded(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("a", 10.0), ("a", 0.0), ("a", -5.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = tc.unit_mix_detector(df, "v", by="g").collect()[0]
        assert out["n"] == 1


class TestEventEchoAudit:
    def test_counts_injected_echo(self, spark):
        import datetime
        from zoi_spark import tablechecks as tc
        t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)
        rows = [(1, t0, "click", 5.0),
                (1, t0 + datetime.timedelta(seconds=1),
                 "click", 5.0),                      # echo
                (1, t0 + datetime.timedelta(seconds=10),
                 "click", 5.0),                      # too late
                (1, t0 + datetime.timedelta(seconds=11),
                 "view", 5.0),                       # different state
                (2, t0, "click", 5.0)]               # other entity
        df = spark.createDataFrame(
            rows, "u long, ts timestamp, et string, v double")
        out = tc.event_echo_audit(
            df, by="u", ts_col="ts",
            state_cols=["et", "v"]).collect()[0]
        assert out["n_events"] == 5
        assert out["n_echoes"] == 1
        assert out["n_entities_affected"] == 1

    def test_null_states_match_nullsafe(self, spark):
        import datetime
        from zoi_spark import tablechecks as tc
        t0 = datetime.datetime(2024, 1, 1)
        rows = [(1, t0, None), (1, t0 + datetime.timedelta(seconds=1),
                                None)]
        df = spark.createDataFrame(rows, "u long, ts timestamp, s string")
        out = tc.event_echo_audit(df, by="u", ts_col="ts",
                                  state_cols=["s"]).collect()[0]
        assert out["n_echoes"] == 1


class TestIdContinuityAudit:
    def test_hole_and_dups(self, spark):
        from zoi_spark import tablechecks as tc
        ids = [i for i in range(20) if i not in (7, 8, 9)] + [3, 3]
        df = spark.createDataFrame([(i,) for i in ids], "i long")
        out = tc.id_continuity_audit(df, "i").collect()[0]
        assert out["n_rows"] == 19
        assert out["n_distinct"] == 17
        assert out["id_min"] == 0 and out["id_max"] == 19
        assert out["n_missing"] == 3
        assert out["n_duplicated"] == 2
        assert out["max_gap"] == 3
        assert out["gap_start"] == 7

    def test_contiguous_has_null_gap(self, spark):
        from zoi_spark import tablechecks as tc
        df = spark.createDataFrame([(i,) for i in range(5)], "i long")
        out = tc.id_continuity_audit(df, "i").collect()[0]
        assert out["n_missing"] == 0 and out["n_duplicated"] == 0
        assert out["max_gap"] is None and out["gap_start"] is None

    def test_ties_break_on_earliest_gap(self, spark):
        # two equal-size gaps -> report the EARLIEST start
        from zoi_spark import tablechecks as tc
        df = spark.createDataFrame(
            [(0,), (3,), (6,)], "i long")
        out = tc.id_continuity_audit(df, "i").collect()[0]
        assert out["max_gap"] == 2 and out["gap_start"] == 1

    def test_nulls_excluded(self, spark):
        from zoi_spark import tablechecks as tc
        df = spark.createDataFrame([(1,), (None,), (2,)], "i long")
        out = tc.id_continuity_audit(df, "i").collect()[0]
        assert out["n_rows"] == 2 and out["n_missing"] == 0


class TestPartitionBalance:
    def test_single_key_max_skew(self, spark):
        from zoi_spark import tablechecks as tc
        df = spark.createDataFrame([("k",)] * 64, "k string")
        out = tc.partition_balance(df, "k", n_buckets=8).collect()[0]
        assert out["n"] == 64
        assert out["max_bucket"] == 64
        assert out["min_bucket"] == 0          # empties exist
        assert out["skew_ratio"] == 8.0        # one bucket holds all
        assert out["n_empty_buckets"] == 7
        # chi2 for all-in-one-bucket over nb buckets = n*(nb-1)
        assert out["chi2"] == 64.0 * 7

    def test_balanced_keys_low_skew(self, spark):
        from zoi_spark import tablechecks as tc
        df = spark.createDataFrame(
            [(f"key-{i}",) for i in range(4096)], "k string")
        out = tc.partition_balance(df, "k", n_buckets=8).collect()[0]
        assert out["n_empty_buckets"] == 0
        assert out["skew_ratio"] < 1.3
        assert out["chi2"] >= 0.0

    def test_null_keys_excluded(self, spark):
        from zoi_spark import tablechecks as tc
        df = spark.createDataFrame([("a",), (None,)], "k string")
        out = tc.partition_balance(df, "k", n_buckets=4).collect()[0]
        assert out["n"] == 1


class TestDecileShift:
    def test_constant_shift_everywhere(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        rows = ([(float(v), True) for v in range(1, 101)]
                + [(float(v) + 7.0, False) for v in range(1, 101)])
        df = spark.createDataFrame(rows, "v double, s boolean")
        out = tc.decile_shift(df, "v", split=F.col("s")).collect()
        assert len(out) == 9
        assert [r["decile"] for r in out] != []
        for r in out:
            assert r["shift"] == 7.0

    def test_tail_only_shift(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        a = [float(v) for v in range(1, 101)]
        b = a[:90] + [v + 1000.0 for v in a[90:]]
        rows = ([(v, True) for v in a] + [(v, False) for v in b])
        df = spark.createDataFrame(rows, "v double, s boolean")
        out = {r["decile"]: r["shift"] for r in
               tc.decile_shift(df, "v", split=F.col("s")).collect()}
        assert out[50] == 0.0
        assert out[90] >= 100.0


class TestHeavyHitters:
    def test_exact_over_threshold(self, spark):
        from zoi_spark import tablechecks as tc
        rows = ([("a",)] * 50 + [("b",)] * 30
                + [(f"x{i}",) for i in range(20)])
        df = spark.createDataFrame(rows, "k string")
        out = {r["item"]: r for r in
               tc.heavy_hitters(df, "k", k=4).collect()}
        assert set(out) == {"a", "b"}      # > 100/4 = 25
        assert out["a"]["cnt"] == 50 and out["b"]["cnt"] == 30
        assert out["a"]["share"] == 0.5

    def test_partitioning_invariant(self, spark):
        from zoi_spark import tablechecks as tc
        rows = ([("a",)] * 50 + [("b",)] * 30
                + [(f"x{i}",) for i in range(20)])
        df = spark.createDataFrame(rows, "k string").repartition(7)
        out = sorted((r["item"], r["cnt"]) for r in
                     tc.heavy_hitters(df, "k", k=4).collect())
        assert out == [("a", 50), ("b", 30)] or \
            out == [("a", 50), ("b", 30)][::-1] or \
            sorted(out) == [("a", 50), ("b", 30)]

    def test_no_hitters_empty(self, spark):
        from zoi_spark import tablechecks as tc
        df = spark.createDataFrame(
            [(f"u{i}",) for i in range(40)], "k string")
        assert tc.heavy_hitters(df, "k", k=5).count() == 0

    def test_boundary_strict(self, spark):
        # exactly N/k is NOT a heavy hitter (strict >)
        from zoi_spark import tablechecks as tc
        rows = [("a",)] * 25 + [(f"x{i}",) for i in range(75)]
        df = spark.createDataFrame(rows, "k string")
        assert tc.heavy_hitters(df, "k", k=4).count() == 0


class TestCochranArmitage:
    def test_matches_closed_form(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        # strata 1..3 with sizes 30/30/30, successes 3/9/15
        rows = []
        for s, x in ((1, 3), (2, 9), (3, 15)):
            rows += [(s, i < x) for i in range(30)]
        df = spark.createDataFrame(rows, "s int, f boolean")
        out = tc.cochran_armitage(
            df, flag=F.col("f"), score=F.col("s")).collect()[0]
        n, xx = 90.0, 27.0
        p = xx / n
        ns, ns2 = 30 * (1 + 2 + 3), 30 * (1 + 4 + 9)
        xs = 3 * 1 + 9 * 2 + 15 * 3
        t = xs - p * ns
        var = p * (1 - p) * (ns2 - ns ** 2 / n)
        assert out["n"] == 90 and out["x"] == 27
        assert out["t_stat"] == round(t, 6)
        assert out["var_t"] == round(var, 6)
        assert abs(out["z"] - t / var ** 0.5) < 1e-6
        assert out["z"] > 1.96                 # clear upward trend

    def test_flat_rate_small_z(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        rows = []
        for s in (1, 2, 3, 4):
            rows += [(s, i < 10) for i in range(40)]
        df = spark.createDataFrame(rows, "s int, f boolean")
        out = tc.cochran_armitage(
            df, flag=F.col("f"), score=F.col("s")).collect()[0]
        assert abs(out["z"]) < 0.01            # exactly flat


class TestLorenzCurve:
    def test_triangular_values(self, spark):
        from zoi_spark import tablechecks as tc
        # unit i contributes i rows -> per-unit totals 1..10
        rows = [(u,) for u in range(1, 11) for _ in range(u)]
        df = spark.createDataFrame(rows, "u int")
        out = {r["decile"]: r for r in
               tc.lorenz_curve(df, "u").collect()}
        assert len(out) == 10
        for d in range(1, 11):
            r = out[d * 10]
            assert r["cut_rank"] == d
            assert r["unit_share"] == round(d / 10, 6)
            assert r["value_share"] == round(d * (d + 1) / 2 / 55, 6)

    def test_perfect_equality_diagonal(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(u,) for u in range(20) for _ in range(3)]
        df = spark.createDataFrame(rows, "u int")
        for r in tc.lorenz_curve(df, "u").collect():
            assert r["value_share"] == r["unit_share"]

    def test_value_col_sum(self, spark):
        from zoi_spark import tablechecks as tc
        df = spark.createDataFrame(
            [("a", 1.0), ("a", 1.0), ("b", 8.0)], "u string, v double")
        out = {r["decile"]: r["value_share"] for r in
               tc.lorenz_curve(df, "u", value_col="v").collect()}
        assert out[50] == 0.2 and out[100] == 1.0


class TestKruskalWallis:
    def test_matches_scipy_formula(self, spark):
        from zoi_spark import tablechecks as tc
        # no ties: groups with clearly separated values
        rows = ([("a", float(v)) for v in (1, 2, 3)]
                + [("b", float(v)) for v in (4, 5, 6)]
                + [("c", float(v)) for v in (7, 8, 9)])
        df = spark.createDataFrame(rows, "g string, v double")
        out = tc.kruskal_wallis(df, "v", "g").collect()[0]
        # hand: ranks 1..9, R = 6, 15, 24; H = 12/(9*10)*(36+225+576)/3 - 30
        h = 12.0 / 90 * (36 + 225 + 576) / 3.0 - 30
        assert out["n"] == 9 and out["k_groups"] == 3
        assert out["h"] == round(h, 6)
        assert out["tie_c"] == 1.0
        assert out["h_adj"] == out["h"]
        assert out["dof"] == 2

    def test_tie_correction_applied(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("a", 1.0), ("a", 1.0), ("b", 1.0), ("b", 2.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = tc.kruskal_wallis(df, "v", "g").collect()[0]
        # tie group of 3 ones: C = 1 - (27-3)/(64-4) = 0.6
        assert out["tie_c"] == 0.6
        assert out["h_adj"] == round(out["h"] / 0.6, 6)

    def test_identical_groups_zero(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(g, float(v)) for g in ("a", "b")
                for v in (1, 2, 3, 4)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = tc.kruskal_wallis(df, "v", "g").collect()[0]
        assert abs(out["h_adj"]) < 1e-9


class TestFleissKappa:
    def test_perfect_agreement(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(i, c) for i in range(10)
                for c in [("x" if i < 5 else "y")] * 3]
        df = spark.createDataFrame(rows, "i int, c string")
        out = tc.fleiss_kappa(df, "i", "c").collect()[0]
        assert out["n_per_item"] == 3
        assert out["p_bar"] == 1.0 and out["kappa"] == 1.0

    def test_textbook_value(self, spark):
        # 2 items, 3 raters: item0 -> x,x,y ; item1 -> x,y,y
        from zoi_spark import tablechecks as tc
        rows = [(0, "x"), (0, "x"), (0, "y"),
                (1, "x"), (1, "y"), (1, "y")]
        df = spark.createDataFrame(rows, "i int, c string")
        out = tc.fleiss_kappa(df, "i", "c").collect()[0]
        # P_i = (4+1-3)/6 = 1/3 each; P_e = 0.5; kappa = (1/3-1/2)/(1/2)
        assert out["p_bar"] == round(1 / 3, 6)
        assert out["p_e"] == 0.5
        assert out["kappa"] == round((1 / 3 - 0.5) / 0.5, 6)

    def test_uneven_counts_nulls_audit(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(0, "x"), (0, "x"), (1, "x")]
        df = spark.createDataFrame(rows, "i int, c string")
        out = tc.fleiss_kappa(df, "i", "c").collect()[0]
        assert out["n_items"] is None


class TestGumbelMaxima:
    def test_mom_fit_closed_form(self, spark):
        import math
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        # 4 blocks with maxima 10, 20, 30, 40
        rows = [(b, float(v)) for b, mx in
                ((1, 10), (2, 20), (3, 30), (4, 40))
                for v in (mx, mx - 5)]
        df = spark.createDataFrame(rows, "b int, v double")
        out = tc.gumbel_maxima(df, "v", block=F.col("b"),
                               return_period=50).collect()[0]
        import statistics
        maxima = [10.0, 20.0, 30.0, 40.0]
        m, s = statistics.mean(maxima), statistics.stdev(maxima)
        beta = s * math.sqrt(6) / math.pi
        mu = m - 0.5772156649015329 * beta
        rl = mu - beta * math.log(-math.log(1 - 1 / 50))
        assert out["n_blocks"] == 4
        assert out["max_mean"] == round(m, 6)
        assert out["mu"] == round(mu, 6)
        assert out["beta"] == round(beta, 6)
        assert out["rl_50"] == round(rl, 6)
        assert out["observed_max"] == 40.0

    def test_return_level_grows_with_period(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        rows = [(b, float((b * 7919) % 100)) for b in range(30)]
        df = spark.createDataFrame(rows, "b int, v double")
        r10 = tc.gumbel_maxima(df, "v", block=F.col("b"),
                               return_period=10).collect()[0]["rl_10"]
        r100 = tc.gumbel_maxima(
            df, "v", block=F.col("b"),
            return_period=100).collect()[0]["rl_100"]
        assert r100 > r10


class TestFriedmanTest:
    def test_perfect_ordering_max_w(self, spark):
        from zoi_spark import tablechecks as tc
        # 4 blocks, 3 treatments, identical ordering a<b<c each block
        rows = [(b, t, float(v)) for b in range(4)
                for t, v in (("a", 1), ("b", 2), ("c", 3))]
        df = spark.createDataFrame(rows, "b int, t string, v double")
        out = tc.friedman_test(df, block_col="b", treat_col="t",
                               value_col="v").collect()[0]
        # R = 4, 8, 12 -> chi2 = 12/(4*3*4)*(16+64+144) - 3*4*4 = 8
        assert out["n_blocks"] == 4 and out["k_treat"] == 3
        assert out["chi2_f"] == 8.0
        assert out["w"] == 1.0                # perfect concordance
        assert out["n_dropped"] == 0 and out["dof"] == 2

    def test_incomplete_block_dropped(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(b, t, float(v)) for b in range(3)
                for t, v in (("a", 1), ("b", 2), ("c", 3))]
        rows += [(9, "a", 1.0)]               # block 9 misses b, c
        df = spark.createDataFrame(rows, "b int, t string, v double")
        out = tc.friedman_test(df, block_col="b", treat_col="t",
                               value_col="v").collect()[0]
        assert out["n_blocks"] == 3 and out["n_dropped"] == 1

    def test_ties_average_ranks(self, spark):
        from zoi_spark import tablechecks as tc
        # all values equal -> every rank average, chi2 = 0
        rows = [(b, t, 5.0) for b in range(3) for t in "abc"]
        df = spark.createDataFrame(rows, "b int, t string, v double")
        out = tc.friedman_test(df, block_col="b", treat_col="t",
                               value_col="v").collect()[0]
        assert out["chi2_f"] == 0.0 and out["w"] == 0.0


class TestCronbachAlpha:
    def test_perfectly_correlated_items(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(float(v), float(v), float(v)) for v in range(1, 11)]
        df = spark.createDataFrame(rows, "a double, b double, c double")
        out = tc.cronbach_alpha(df, ["a", "b", "c"]).collect()[0]
        # identical items: var_total = 9*var, var_sum = 3*var
        # alpha = 1.5 * (1 - 3/9) = 1.0
        assert out["alpha"] == 1.0
        assert out["k_items"] == 3 and out["n"] == 10

    def test_independent_items_low_alpha(self, spark):
        from zoi_spark import tablechecks as tc
        import random
        rng = random.Random(7)
        rows = [(rng.random(), rng.random(), rng.random())
                for _ in range(200)]
        df = spark.createDataFrame(rows, "a double, b double, c double")
        out = tc.cronbach_alpha(df, ["a", "b", "c"]).collect()[0]
        assert abs(out["alpha"]) < 0.35       # near zero

    def test_null_rows_listwise_dropped(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(1.0, 2.0), (2.0, None), (3.0, 4.0), (4.0, 5.0)]
        df = spark.createDataFrame(rows, "a double, b double")
        out = tc.cronbach_alpha(df, ["a", "b"]).collect()[0]
        assert out["n"] == 3 and out["n_dropped"] == 1


class TestYoudenThreshold:
    def test_separable_threshold(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        # positives score 10..19, negatives 0..9 -> t=10 is perfect
        rows = [(float(s), s >= 10) for s in range(20)]
        df = spark.createDataFrame(rows, "s double, y boolean")
        out = tc.youden_threshold(
            df, score_col="s", label_col=F.col("y")).collect()[0]
        assert out["threshold"] == 10.0
        assert out["tpr"] == 1.0 and out["fpr"] == 0.0
        assert out["youden_j"] == 1.0

    def test_tie_breaks_to_lowest_threshold(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        # scores 1,2 both give J=1 when positives are {1,2}... build:
        # pos at 2 and 3, neg at 0 -> t=2 and t=... J(2)=1, J(3)=0.5
        rows = [(0.0, False), (2.0, True), (3.0, True)]
        df = spark.createDataFrame(rows, "s double, y boolean")
        out = tc.youden_threshold(
            df, score_col="s", label_col=F.col("y")).collect()[0]
        assert out["threshold"] == 2.0

    def test_single_class_null(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        rows = [(float(s), True) for s in range(5)]
        df = spark.createDataFrame(rows, "s double, y boolean")
        out = tc.youden_threshold(
            df, score_col="s", label_col=F.col("y")).collect()[0]
        assert out["youden_j"] is None


class TestMase:
    def test_perfect_weekly_rhythm(self, spark):
        import datetime
        from zoi_spark import tablechecks as tc
        # period-7 series: seasonal-naive is exact, naive is not
        d0 = datetime.date(2024, 1, 1)
        vals = [10.0, 20.0, 30.0, 40.0, 30.0, 20.0, 10.0]
        rows = [(d0 + datetime.timedelta(days=i), vals[i % 7])
                for i in range(28)]
        df = spark.createDataFrame(rows, "d date, x double")
        out = tc.mase(df, "x", "d", season=7).collect()[0]
        assert out["n_days"] == 28
        assert out["n_scored"] == 21           # first 7 unmatched
        assert out["mae_seasonal"] == 0.0
        assert out["mae_naive"] > 0
        assert out["mase"] == 0.0

    def test_gap_days_excluded(self, spark):
        import datetime
        from zoi_spark import tablechecks as tc
        d0 = datetime.date(2024, 1, 1)
        rows = [(d0 + datetime.timedelta(days=i), float(i))
                for i in range(20) if i != 9]
        df = spark.createDataFrame(rows, "d date, x double")
        out = tc.mase(df, "x", "d", season=7).collect()[0]
        # days 9 (missing), 0-7 (no lag7), 10 (no lag1), 16 (lag7=9)
        assert out["n_days"] == 19
        assert out["n_unmatched"] == 19 - out["n_scored"]
        # linear series: both forecasts off by constant -> mase = 7
        assert out["mase"] == 7.0

    def test_white_noise_near_one(self, spark):
        import datetime, random
        from zoi_spark import tablechecks as tc
        rng = random.Random(3)
        d0 = datetime.date(2024, 1, 1)
        rows = [(d0 + datetime.timedelta(days=i), rng.random())
                for i in range(200)]
        df = spark.createDataFrame(rows, "d date, x double")
        out = tc.mase(df, "x", "d", season=7).collect()[0]
        assert 0.7 < out["mase"] < 1.4


class TestNelsonAalen:
    def test_hazard_increments(self, spark):
        import datetime
        from zoi_spark import tablechecks as tc
        import pyspark.sql.functions as F
        t0 = datetime.datetime(2024, 1, 1)
        # 4 users enter at t0; converts at +1h, +2h; 2 never (censor
        # at horizon +3h)
        rows = []
        for u in range(4):
            rows.append((u, t0, "view"))
        rows += [(0, t0 + datetime.timedelta(hours=1), "buy"),
                 (1, t0 + datetime.timedelta(hours=2), "buy"),
                 (2, t0 + datetime.timedelta(hours=3), "view"),
                 (3, t0 + datetime.timedelta(hours=3), "view")]
        df = spark.createDataFrame(rows, "u long, ts timestamp, et string")
        out = {r["t_bucket"]: r for r in tc.nelson_aalen(
            df, entity_col="u", ts_col="ts",
            event_pred=F.col("et") == "buy", bucket_s=3600).collect()}
        assert set(out) == {1, 2}
        assert out[1]["n_risk"] == 4 and out[1]["n_events"] == 1
        assert out[1]["cum_hazard"] == 0.25
        assert out[2]["cum_hazard"] == round(0.25 + 1 / 3, 6)
        assert out[2]["var_hazard"] == round(1 / 16 + 1 / 9, 6)
        import math
        assert out[2]["fh_survival"] == round(
            math.exp(-(0.25 + 1 / 3)), 6)

    def test_matches_km_duration_model(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        km = tc.kaplan_meier(e, entity_col="user_id", ts_col="ts",
                             event_pred=F.col("event_type") ==
                             "purchase", bucket_s=3600)
        na = tc.nelson_aalen(e, entity_col="user_id", ts_col="ts",
                             event_pred=F.col("event_type") ==
                             "purchase", bucket_s=3600)
        k = {r["t_bucket"]: r for r in km.collect()}
        n = {r["t_bucket"]: r for r in na.collect()}
        assert set(k) == set(n)                # same event buckets
        for b in k:
            assert k[b]["n_risk"] == n[b]["n_risk"]
            assert k[b]["n_events"] == n[b]["n_events"]
            # FH survival upper-bounds KM (standard inequality)
            if k[b]["survival"] > 0:
                assert n[b]["fh_survival"] >= k[b]["survival"] - 1e-9


class TestRobustShape:
    def test_symmetric_zero_skew(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("a", float(v)) for v in range(1, 102)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = tc.robust_shape(df, "v", by="g").collect()[0]
        assert out["bowley_skew"] == 0.0
        assert out["median"] == 51.0
        # uniform octiles are equally spaced: Moors = (12.5+12.5)/50... 
        assert out["moors_kurt"] == 1.0

    def test_right_skew_positive(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("a", float(v ** 2)) for v in range(1, 102)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = tc.robust_shape(df, "v", by="g").collect()[0]
        assert out["bowley_skew"] > 0.1

    def test_constant_group_null_ratios(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("a", 5.0)] * 9
        df = spark.createDataFrame(rows, "g string, v double")
        out = tc.robust_shape(df, "v", by="g").collect()[0]
        assert out["bowley_skew"] is None
        assert out["moors_kurt"] is None


class TestGkLambda:
    def test_perfect_prediction(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("s1", "en")] * 5 + [("s2", "de")] * 5
        df = spark.createDataFrame(rows, "x string, y string")
        out = tc.gk_lambda(df, "x", "y").collect()[0]
        assert out["lambda_y_given_x"] == 1.0
        assert out["lambda_x_given_y"] == 1.0

    def test_independent_zero(self, spark):
        from zoi_spark import tablechecks as tc
        # y marginal mode dominates regardless of x
        rows = ([("s1", "en")] * 6 + [("s1", "de")] * 2
                + [("s2", "en")] * 6 + [("s2", "de")] * 2)
        df = spark.createDataFrame(rows, "x string, y string")
        out = tc.gk_lambda(df, "x", "y").collect()[0]
        assert out["lambda_y_given_x"] == 0.0

    def test_textbook_asymmetry(self, spark):
        from zoi_spark import tablechecks as tc
        # x=s1 -> mostly en; x=s2 -> mostly de, but unbalanced
        rows = ([("s1", "en")] * 8 + [("s1", "de")] * 2
                + [("s2", "de")] * 5 + [("s2", "en")] * 1)
        df = spark.createDataFrame(rows, "x string, y string")
        out = tc.gk_lambda(df, "x", "y").collect()[0]
        # lambda(y|x): (8+5 - 9)/(16-9) = 4/7
        assert out["lambda_y_given_x"] == round(4 / 7, 6)
        # lambda(x|y): (8+5 - 10)/(16-10) = 0.5
        assert out["lambda_x_given_y"] == 0.5


class TestKuiperTwoSample:
    def test_identical_zero(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        rows = [(float(v), s) for v in range(10)
                for s in (True, False)]
        df = spark.createDataFrame(rows, "v double, s boolean")
        out = tc.kuiper_two_sample(df, "v",
                                   split=F.col("s")).collect()[0]
        assert out["v_stat"] == 0.0

    def test_disjoint_max(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        rows = ([(float(v), True) for v in range(5)]
                + [(float(v + 10), False) for v in range(5)])
        df = spark.createDataFrame(rows, "v double, s boolean")
        out = tc.kuiper_two_sample(df, "v",
                                   split=F.col("s")).collect()[0]
        assert out["d_plus"] == 1.0 and out["d_minus"] == 0.0
        assert out["v_stat"] == 1.0

    def test_cyclic_shift_detected_both_sides(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        # bimodal A at hours {2, 20}; B = A shifted 12h -> {14, 8}:
        # the CDFs cross, so BOTH excursions light up
        a = [2.0] * 20 + [20.0] * 20
        rows = ([(v, True) for v in a]
                + [((v + 12.0) % 24, False) for v in a])
        df = spark.createDataFrame(rows, "v double, s boolean")
        out = tc.kuiper_two_sample(df, "v",
                                   split=F.col("s")).collect()[0]
        assert out["d_plus"] == 0.5 and out["d_minus"] == 0.5
        assert out["v_stat"] == 1.0


class TestPoissonScan:
    def test_finds_injected_burst(self, spark):
        import datetime
        from zoi_spark import tablechecks as tc
        d0 = datetime.datetime(2024, 1, 1)
        rows = []
        for day in range(28):
            n = 100 if 10 <= day <= 12 else 10
            for i in range(n):
                rows.append((d0 + datetime.timedelta(days=day,
                                                     seconds=i),))
        df = spark.createDataFrame(rows, "ts timestamp")
        out = {r["w_days"]: r for r in
               tc.poisson_scan(df, "ts", windows=(1, 3)).collect()}
        assert str(out[3]["start_day"]) == "2024-01-11"
        assert out[3]["x"] == 300
        assert out[1]["x"] == 100
        assert out[3]["llr"] > out[1]["llr"] > 0

    def test_flat_series_zero_llr(self, spark):
        import datetime
        from zoi_spark import tablechecks as tc
        d0 = datetime.datetime(2024, 1, 1)
        rows = [(d0 + datetime.timedelta(days=day, seconds=i),)
                for day in range(14) for i in range(10)]
        df = spark.createDataFrame(rows, "ts timestamp")
        for r in tc.poisson_scan(df, "ts", windows=(1, 7)).collect():
            assert r["llr"] == 0.0


class TestChowBreak:
    def test_same_regime_low_f(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        # identical linear law both halves: SSE_p == SSE1+SSE2, F=0
        rows = [(float(x), 2.0 * x + 1.0, x % 2 == 0)
                for x in range(40)]
        df = spark.createDataFrame(rows, "x double, y double, g boolean")
        out = tc.chow_break(df, "x", "y",
                            split=F.col("g")).collect()[0]
        assert out["sse_pooled"] == 0.0
        assert out["f_stat"] is None           # zero residuals both

    def test_slope_change_detected(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        import random
        rng = random.Random(11)
        rows = []
        for x in range(50):
            rows.append((float(x), 1.0 * x + rng.gauss(0, 0.1), True))
            rows.append((float(x), 5.0 * x + rng.gauss(0, 0.1), False))
        df = spark.createDataFrame(rows, "x double, y double, g boolean")
        out = tc.chow_break(df, "x", "y",
                            split=F.col("g")).collect()[0]
        assert out["f_stat"] > 100             # massive break
        assert out["dof2"] == 96

    def test_noisy_same_law_small_f(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        import random
        rng = random.Random(5)
        rows = [(float(x), 2.0 * x + rng.gauss(0, 1.0), x % 2 == 0)
                for x in range(200)]
        df = spark.createDataFrame(rows, "x double, y double, g boolean")
        out = tc.chow_break(df, "x", "y",
                            split=F.col("g")).collect()[0]
        assert out["f_stat"] < 5

    def test_degenerate_regime_null(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        rows = [(1.0, 2.0, True), (1.0, 3.0, True),
                (1.0, 4.0, True)] + \
               [(float(x), float(x), False) for x in range(5)]
        df = spark.createDataFrame(rows, "x double, y double, g boolean")
        out = tc.chow_break(df, "x", "y",
                            split=F.col("g")).collect()[0]
        assert out["f_stat"] is None           # regime 1 constant x
        assert out["sse_split"] is None


class TestWeightedKappa:
    def test_perfect_agreement(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(i % 4, i % 4) for i in range(40)]
        df = spark.createDataFrame(rows, "a long, b long")
        out = tc.weighted_kappa(df, "a", "b").collect()[0]
        assert out["po_w"] == 1.0 and out["kappa_w"] == 1.0
        assert out["k_levels"] == 4

    def test_off_by_one_beats_random_wrong(self, spark):
        from zoi_spark import tablechecks as tc
        # rater B always one level above A (mod-free, clipped)
        near = [(i % 4, min(i % 4 + 1, 3)) for i in range(80)]
        far = [(i % 4, (i % 4 + 2) % 4) for i in range(80)]
        d_near = spark.createDataFrame(near, "a long, b long")
        d_far = spark.createDataFrame(far, "a long, b long")
        k_near = tc.weighted_kappa(d_near, "a", "b").collect()[0]
        k_far = tc.weighted_kappa(d_far, "a", "b").collect()[0]
        assert k_near["po_w"] > k_far["po_w"]
        assert k_near["kappa_w"] > k_far["kappa_w"]

    def test_single_level_degenerate(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(2, 2)] * 10
        df = spark.createDataFrame(rows, "a long, b long")
        out = tc.weighted_kappa(df, "a", "b").collect()[0]
        assert out["k_levels"] == 1
        assert out["po_w"] == 1.0
        assert out["kappa_w"] is None          # pe == 1


class TestPartialCorr:
    def test_confounder_explains_all(self, spark):
        from zoi_spark import tablechecks as tc
        import random
        rng = random.Random(2)
        rows = []
        for _ in range(500):
            z = rng.gauss(0, 1)
            rows.append((z + rng.gauss(0, 0.05),
                         z + rng.gauss(0, 0.05), z))
        df = spark.createDataFrame(rows, "x double, y double, z double")
        out = tc.partial_corr(df, "x", "y", "z").collect()[0]
        assert out["r_xy"] > 0.9               # raw corr huge
        assert abs(out["partial_r"]) < 0.2     # vanishes given z

    def test_direct_relation_survives(self, spark):
        from zoi_spark import tablechecks as tc
        import random
        rng = random.Random(4)
        rows = []
        for _ in range(500):
            x = rng.gauss(0, 1)
            z = rng.gauss(0, 1)
            rows.append((x, x + 0.1 * rng.gauss(0, 1), z))
        df = spark.createDataFrame(rows, "x double, y double, z double")
        out = tc.partial_corr(df, "x", "y", "z").collect()[0]
        assert out["partial_r"] > 0.9

    def test_matches_closed_form(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(1.0, 2.0, 3.0), (2.0, 4.1, 2.0), (3.0, 5.9, 4.0),
                (4.0, 8.2, 1.0), (5.0, 9.8, 5.0)]
        df = spark.createDataFrame(rows, "x double, y double, z double")
        out = tc.partial_corr(df, "x", "y", "z").collect()[0]
        import statistics
        xs = [r[0] for r in rows]; ys = [r[1] for r in rows]
        zs = [r[2] for r in rows]
        def corr(a, b):
            ma, mb = statistics.mean(a), statistics.mean(b)
            num = sum((u - ma) * (v - mb) for u, v in zip(a, b))
            da = sum((u - ma) ** 2 for u in a) ** 0.5
            db = sum((v - mb) ** 2 for v in b) ** 0.5
            return num / (da * db)
        rxy, rxz, ryz = corr(xs, ys), corr(xs, zs), corr(ys, zs)
        want = (rxy - rxz * ryz) / (
            ((1 - rxz ** 2) * (1 - ryz ** 2)) ** 0.5)
        assert abs(out["partial_r"] - want) < 1e-6


class TestJonckheereTerpstra:
    def test_monotone_trend_positive_z(self, spark):
        from zoi_spark import tablechecks as tc
        rows = ([(0.0, float(v)) for v in range(0, 10)]
                + [(1.0, float(v)) for v in range(10, 20)]
                + [(2.0, float(v)) for v in range(20, 30)])
        df = spark.createDataFrame(rows, "g double, v double")
        out = tc.jonckheere_terpstra(df, "v", "g").collect()[0]
        # complete separation: J = all cross-group pairs = 3*100
        assert out["j_stat"] == 300.0
        assert out["mean_j"] == (900 - 300) / 4
        assert out["z"] > 3
        assert out["k_groups"] == 3 and out["n"] == 30

    def test_no_trend_near_zero(self, spark):
        from zoi_spark import tablechecks as tc
        # same values in every group
        rows = [(float(g), float(v)) for g in range(3)
                for v in range(10)]
        df = spark.createDataFrame(rows, "g double, v double")
        out = tc.jonckheere_terpstra(df, "v", "g").collect()[0]
        assert abs(out["z"]) < 0.2

    def test_ties_half_credit(self, spark):
        from zoi_spark import tablechecks as tc
        # two groups, all values equal: J = n1*n2/2 exactly
        rows = [(0.0, 5.0)] * 4 + [(1.0, 5.0)] * 6
        df = spark.createDataFrame(rows, "g double, v double")
        out = tc.jonckheere_terpstra(df, "v", "g").collect()[0]
        assert out["j_stat"] == 12.0           # 24/2
        assert out["mean_j"] == 12.0
        assert out["z"] is None or abs(out["z"]) < 1e-9


class TestSketchQuantileAudit:
    def test_bounds_hold_and_exact_right(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("a", float(v)) for v in range(1, 1001)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = {r["prob"]: r for r in tc.sketch_quantile_audit(
            df, "v", by="g", probs=(0.5, 0.9),
            accuracy=50).collect()}
        assert out[0.5]["exact_q"] == 500.5
        assert out[0.5]["within_bound"]
        assert out[0.9]["within_bound"]

    def test_groups_independent(self, spark):
        from zoi_spark import tablechecks as tc
        rows = ([("a", float(v)) for v in range(100)]
                + [("b", float(v * 10)) for v in range(100)])
        df = spark.createDataFrame(rows, "g string, v double")
        out = tc.sketch_quantile_audit(
            df, "v", by="g", probs=(0.5,), accuracy=100).collect()
        got = {r["group"]: r["exact_q"] for r in out}
        assert got["b"] == got["a"] * 10
        assert all(r["within_bound"] for r in out)


class TestBreuschPagan:
    def test_homoscedastic_small_lm(self, spark):
        from zoi_spark import tablechecks as tc
        import random
        rng = random.Random(9)
        rows = [(float(x % 50), 2.0 * (x % 50) + rng.gauss(0, 1))
                for x in range(1000)]
        df = spark.createDataFrame(rows, "x double, y double")
        out = tc.breusch_pagan(df, "x", "y").collect()[0]
        assert out["lm_stat"] < 11              # chi2(1) 0.1% ~ 10.8

    def test_heteroscedastic_flagged(self, spark):
        from zoi_spark import tablechecks as tc
        import random
        rng = random.Random(10)
        rows = [(float(x % 50),
                 2.0 * (x % 50) + rng.gauss(0, 0.2 + (x % 50)))
                for x in range(1000)]
        df = spark.createDataFrame(rows, "x double, y double")
        out = tc.breusch_pagan(df, "x", "y").collect()[0]
        assert out["lm_stat"] > 20
        assert out["resid_slope"] > 0           # variance grows in x


class TestWilcoxonSignedRank:
    def test_textbook_small_sample(self, spark):
        from zoi_spark import tablechecks as tc
        # diffs: +1 +2 +3 -4  -> |d| ranks 1,2,3,4; W+ = 6, W- = 4
        rows = [(0.0, 1.0), (0.0, 2.0), (0.0, 3.0), (4.0, 0.0)]
        df = spark.createDataFrame(rows, "a double, b double")
        out = tc.wilcoxon_signed_rank(df, "a", "b").collect()[0]
        assert out["n_pairs"] == 4 and out["n_zero"] == 0
        assert out["w_plus"] == 6.0 and out["w_minus"] == 4.0
        assert out["mean_w"] == 5.0
        assert out["var_w"] == 7.5

    def test_zero_diffs_dropped(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(1.0, 1.0), (2.0, 2.0), (0.0, 5.0)]
        df = spark.createDataFrame(rows, "a double, b double")
        out = tc.wilcoxon_signed_rank(df, "a", "b").collect()[0]
        assert out["n_zero"] == 2 and out["n_pairs"] == 1
        assert out["w_plus"] == 1.0

    def test_tied_diffs_average_ranks(self, spark):
        from zoi_spark import tablechecks as tc
        # diffs +5 +5 -5: |d| all tie -> each rank 2; W+ = 4, W- = 2
        rows = [(0.0, 5.0), (0.0, 5.0), (5.0, 0.0)]
        df = spark.createDataFrame(rows, "a double, b double")
        out = tc.wilcoxon_signed_rank(df, "a", "b").collect()[0]
        assert out["w_plus"] == 4.0 and out["w_minus"] == 2.0
        # tie correction: var = 3*4*7/24 - (27-3)/48 = 3.5 - 0.5
        assert out["var_w"] == 3.0


class TestHodgesLehmann:
    def test_clean_shift_recovered(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        rows = ([(float(v), True) for v in range(1, 21)]
                + [(float(v) + 7.0, False) for v in range(1, 21)])
        df = spark.createDataFrame(rows, "v double, s boolean")
        out = tc.hodges_lehmann_shift(
            df, "v", split=F.col("s")).collect()[0]
        assert out["hl_shift"] == 7.0
        assert out["n_pairs"] == 400

    def test_outlier_robust(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        rows = ([(float(v), True) for v in range(1, 21)]
                + [(float(v) + 7.0, False) for v in range(1, 20)]
                + [(100000.0, False)])
        df = spark.createDataFrame(rows, "v double, s boolean")
        out = tc.hodges_lehmann_shift(
            df, "v", split=F.col("s")).collect()[0]
        assert abs(out["hl_shift"] - 7.0) <= 1.0

    def test_matches_bruteforce_median(self, spark):
        import pyspark.sql.functions as F, statistics
        from zoi_spark import tablechecks as tc
        a = [1.0, 3.0, 3.0, 8.0]
        b = [2.0, 4.0, 9.0]
        rows = [(v, True) for v in a] + [(v, False) for v in b]
        df = spark.createDataFrame(rows, "v double, s boolean")
        out = tc.hodges_lehmann_shift(
            df, "v", split=F.col("s")).collect()[0]
        diffs = sorted(y - x for x in a for y in b)
        assert out["hl_shift"] == statistics.median(diffs)


class TestAnsariBradley:
    def _brute(self, a_vals, b_vals):
        """Reference AB: tie-averaged min(r, N+1-r) scores."""
        allv = sorted(a_vals + b_vals)
        n = len(allv)
        raw = {}
        # average scores per tied value
        import collections
        positions = collections.defaultdict(list)
        for i, v in enumerate(allv, 1):
            positions[v].append(min(i, n + 1 - i))
        score = {v: sum(p) / len(p) for v, p in positions.items()}
        ab = sum(score[v] for v in a_vals)
        scores_all = [score[v] for v in allv]
        import statistics
        sbar = statistics.mean(scores_all)
        s2bar = sum(s * s for s in scores_all) / n
        na, nb = len(a_vals), len(b_vals)
        mean = na * sbar
        var = na * nb * (s2bar - sbar ** 2) / (n - 1)
        return ab, mean, var

    def test_matches_bruteforce_no_ties(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        a = [1.0, 4.0, 6.0, 9.0, 12.0]
        b = [2.0, 3.0, 7.0, 10.0]
        rows = [(v, True) for v in a] + [(v, False) for v in b]
        df = spark.createDataFrame(rows, "v double, s boolean")
        out = tc.ansari_bradley(df, "v",
                                split=F.col("s")).collect()[0]
        ab, mean, var = self._brute(a, b)
        assert out["ab_stat"] == round(ab, 6)
        assert out["mean_ab"] == round(mean, 6)
        assert out["var_ab"] == round(var, 6)

    def test_matches_bruteforce_with_ties(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        a = [1.0, 4.0, 4.0, 9.0]
        b = [4.0, 4.0, 7.0, 7.0, 11.0]
        rows = [(v, True) for v in a] + [(v, False) for v in b]
        df = spark.createDataFrame(rows, "v double, s boolean")
        out = tc.ansari_bradley(df, "v",
                                split=F.col("s")).collect()[0]
        ab, mean, var = self._brute(a, b)
        assert out["ab_stat"] == round(ab, 6)
        assert out["mean_ab"] == round(mean, 6)
        assert out["var_ab"] == round(var, 6)

    def test_spread_difference_lights_up(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        # same center, A tight / B dispersed
        a = [float(v) for v in range(45, 56)] * 5
        b = [float(v) for v in range(0, 111, 2)]
        rows = [(v, True) for v in a] + [(v, False) for v in b]
        df = spark.createDataFrame(rows, "v double, s boolean")
        out = tc.ansari_bradley(df, "v",
                                split=F.col("s")).collect()[0]
        # tight side gets the HIGH center scores: z strongly +
        assert out["z"] > 3


class TestHampelFilter:
    def test_spike_flagged_level_shift_not_dragged(self, spark):
        from zoi_spark import tablechecks as tc
        vals = [10.0] * 10
        vals[5] = 100.0                     # lone spike
        rows = [(float(i), v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "i double, v double")
        out = {r["order"]: r for r in tc.hampel_filter(
            df, "v", "i", half_window=3, k=3.0).collect()}
        assert out[5.0]["flagged"]
        # neighbors of the spike must NOT be dragged into flagging
        assert not out[4.0]["flagged"] and not out[6.0]["flagged"]

    def test_constant_series_clean(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(float(i), 7.0) for i in range(10)]
        df = spark.createDataFrame(rows, "i double, v double")
        for r in tc.hampel_filter(df, "v", "i").collect():
            assert not r["flagged"]

    def test_gap_shrinks_window(self, spark):
        from zoi_spark import tablechecks as tc
        # indices 0,1,2 then 100,101,102: windows never mix sides
        rows = ([(float(i), 5.0) for i in (0, 1, 2)]
                + [(float(i), 50.0) for i in (100, 101, 102)])
        df = spark.createDataFrame(rows, "i double, v double")
        for r in tc.hampel_filter(df, "v", "i",
                                  half_window=3).collect():
            assert not r["flagged"]          # each side self-consistent


class TestRboTopTerms:
    def test_identical_lists_full_score(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(f"t{i % 10}",) for i in range(100)]
        df = spark.createDataFrame(rows, "term string")
        out = tc.rbo_top_terms(df, df, "term", k=10,
                               p=0.9).collect()[0]
        assert out["n_common"] == 10
        # truncated RBO of identical lists = (1-p)*sum(p^(d-1)) at
        # each depth overlap fraction 1 -> = 1 - p^k
        assert abs(out["rbo"] - (1 - 0.9 ** 10)) < 1e-6

    def test_disjoint_zero(self, spark):
        from zoi_spark import tablechecks as tc
        a = spark.createDataFrame([(f"a{i}",) for i in range(20)],
                                  "term string")
        b = spark.createDataFrame([(f"b{i}",) for i in range(20)],
                                  "term string")
        out = tc.rbo_top_terms(a, b, "term", k=10).collect()[0]
        assert out["n_common"] == 0 and out["rbo"] == 0.0

    def test_top_weighted(self, spark):
        from zoi_spark import tablechecks as tc
        # swap at the HEAD hurts more than at the tail
        def mk(terms_counts):
            rows = [(t,) for t, c in terms_counts for _ in range(c)]
            return spark.createDataFrame(rows, "term string")
        base = [(f"t{i}", 100 - i) for i in range(10)]
        head_swap = [("zz", 100)] + base[1:]
        tail_swap = base[:9] + [("zz", 91 - 9)]
        r_head = tc.rbo_top_terms(mk(base), mk(head_swap), "term",
                                  k=10).collect()[0]["rbo"]
        r_tail = tc.rbo_top_terms(mk(base), mk(tail_swap), "term",
                                  k=10).collect()[0]["rbo"]
        assert r_head < r_tail


class TestRatioCiDelta:
    def test_matches_closed_form(self, spark):
        from zoi_spark import tablechecks as tc
        import statistics
        xs = [10.0, 20.0, 30.0, 40.0]
        ys = [1.0, 2.0, 3.0, 4.0]
        df = spark.createDataFrame(list(zip(xs, ys)),
                                   "x double, y double")
        out = tc.ratio_ci_delta(df, "x", "y").collect()[0]
        mx, my = statistics.mean(xs), statistics.mean(ys)
        r = mx / my
        vx, vy = statistics.variance(xs), statistics.variance(ys)
        cxy = sum((a - mx) * (b - my) for a, b in zip(xs, ys)) / 3
        var_r = (vx + r * r * vy - 2 * r * cxy) / (4 * my * my)
        assert out["ratio"] == 10.0
        assert out["se"] == round(var_r ** 0.5, 6)

    def test_perfectly_proportional_zero_se(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(3.0 * y, y) for y in (1.0, 2.0, 5.0, 9.0)]
        df = spark.createDataFrame(rows, "x double, y double")
        out = tc.ratio_ci_delta(df, "x", "y").collect()[0]
        assert out["ratio"] == 3.0 and out["se"] == 0.0
        assert out["ci_lo"] == 3.0 and out["ci_hi"] == 3.0

    def test_zero_denominator_null(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(1.0, 0.0), (2.0, 0.0)]
        df = spark.createDataFrame(rows, "x double, y double")
        out = tc.ratio_ci_delta(df, "x", "y").collect()[0]
        assert out["ratio"] is None


class TestFloatAnomalies:
    def test_each_defect_counted(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(1.0,), (float("nan"),), (float("inf"),),
                (float("-inf"),), (-0.0,), (1e-310,), (None,)]
        df = spark.createDataFrame(rows, "v double")
        out = tc.float_anomalies(df, "v").collect()[0]
        assert out["n"] == 7
        assert out["n_null"] == 1 and out["n_nan"] == 1
        assert out["n_posinf"] == 1 and out["n_neginf"] == 1
        assert out["n_negzero"] == 1 and out["n_subnormal"] == 1
        assert out["n_clean"] == 1

    def test_positive_zero_clean(self, spark):
        from zoi_spark import tablechecks as tc
        df = spark.createDataFrame([(0.0,), (2.5,)], "v double")
        out = tc.float_anomalies(df, "v").collect()[0]
        assert out["n_negzero"] == 0 and out["n_clean"] == 2

    def test_grouped(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("a", float("nan")), ("b", 1.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = {r["group"]: r for r in
               tc.float_anomalies(df, "v", by="g").collect()}
        assert out["a"]["n_nan"] == 1 and out["b"]["n_clean"] == 1


class TestAttributionCredit:
    def test_models_on_three_touches(self, spark):
        import datetime
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        t0 = datetime.datetime(2024, 1, 1)
        mk = lambda m, ty: (1, t0 + datetime.timedelta(minutes=m), ty)
        rows = [mk(0, "view"), mk(1, "click"), mk(2, "view"),
                mk(3, "purchase")]
        df = spark.createDataFrame(rows, "u long, ts timestamp, et string")
        out = {r["touch_type"]: r for r in tc.attribution_credit(
            df, entity_col="u", ts_col="ts",
            conv_pred=F.col("et") == "purchase",
            touch_pred=F.col("et").isin("click", "view"),
            type_col="et").collect()}
        # first=view, last=view, middle=click
        assert out["view"]["ft_credit"] == 1.0
        assert out["view"]["lt_credit"] == 1.0
        assert out["click"]["linear_credit"] == round(1 / 3, 6)
        assert out["view"]["u_credit"] == 0.8
        assert out["click"]["u_credit"] == 0.2

    def test_single_touch_full_credit(self, spark):
        import datetime
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        t0 = datetime.datetime(2024, 1, 1)
        rows = [(1, t0, "click"),
                (1, t0 + datetime.timedelta(minutes=5), "purchase")]
        df = spark.createDataFrame(rows, "u long, ts timestamp, et string")
        out = tc.attribution_credit(
            df, entity_col="u", ts_col="ts",
            conv_pred=F.col("et") == "purchase",
            touch_pred=F.col("et").isin("click", "view"),
            type_col="et").collect()[0]
        for c in ("ft_credit", "lt_credit", "linear_credit",
                  "u_credit"):
            assert out[c] == 1.0

    def test_touch_after_conversion_ignored(self, spark):
        import datetime
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        t0 = datetime.datetime(2024, 1, 1)
        rows = [(1, t0, "purchase"),
                (1, t0 + datetime.timedelta(minutes=5), "click")]
        df = spark.createDataFrame(rows, "u long, ts timestamp, et string")
        out = tc.attribution_credit(
            df, entity_col="u", ts_col="ts",
            conv_pred=F.col("et") == "purchase",
            touch_pred=F.col("et").isin("click", "view"),
            type_col="et").collect()
        assert out == []


class TestCvarTail:
    def test_uniform_tail(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("a", float(v)) for v in range(1, 101)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = tc.cvar_tail(df, "v", by="g", alpha=0.9).collect()[0]
        # q90 of 1..100 = 90.1; tail = 91..100 mean 95.5
        assert out["var_q"] == 90.1
        assert out["cvar"] == 95.5
        assert out["tail_n"] == 10

    def test_heavy_tail_separates(self, spark):
        from zoi_spark import tablechecks as tc
        a = [("a", float(v)) for v in range(1, 100)] + [("a", 100.0)]
        b = [("b", float(v)) for v in range(1, 100)] + [("b", 10000.0)]
        df = spark.createDataFrame(a + b, "g string, v double")
        out = {r["group"]: r for r in
               tc.cvar_tail(df, "v", by="g", alpha=0.95).collect()}
        assert abs(out["a"]["var_q"] - out["b"]["var_q"]) < 1.0
        assert out["b"]["cvar"] > out["a"]["cvar"] * 10


class TestEncodingAdvisor:
    def test_suggestions_by_shape(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(i, "x" if i < 500 else "y",   # 2 runs -> rle
                 f"k{i % 3}" if i % 1 else "", # low card, mixed runs
                 i)                            # monotone -> delta
                for i in range(1000)]
        df = spark.createDataFrame(rows, "o long, a string, b string, c long")
        out = {r["column"]: r for r in tc.encoding_advisor(
            df, ["a", "c"], "o").collect()}
        assert out["a"]["suggestion"] == "rle"
        assert out["a"]["avg_run_len"] == 500.0
        assert out["c"]["suggestion"] == "delta"
        assert out["c"]["monotone_share"] == 1.0

    def test_high_card_shuffled_plain(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(i, f"u{(i * 7919) % 1000}") for i in range(1000)]
        df = spark.createDataFrame(rows, "o long, a string")
        out = tc.encoding_advisor(df, ["a"], "o").collect()[0]
        assert out["suggestion"] == "plain"
        assert out["n_distinct"] == 1000

    def test_low_card_shuffled_dict(self, spark):
        from zoi_spark import tablechecks as tc
        # 5 distinct over 1000 rows, shuffled so runs stay short
        rows = [(i, f"k{(i * 7) % 5}") for i in range(1000)]
        df = spark.createDataFrame(rows, "o long, a string")
        out = tc.encoding_advisor(df, ["a"], "o").collect()[0]
        assert out["distinct_ratio"] == 0.005
        assert out["suggestion"] == "dict"


class TestBreuschGodfrey:
    def test_ar1_residuals_flagged(self, spark):
        from zoi_spark import tablechecks as tc
        import random
        rng = random.Random(21)
        rows, e = [], 0.0
        for t in range(300):
            e = 0.9 * e + rng.gauss(0, 1)
            rows.append((float(t), 0.5 * t + e))
        df = spark.createDataFrame(rows, "i double, y double")
        out = tc.breusch_godfrey(df, "i", "y", "i").collect()[0]
        assert out["lm_stat"] > 50

    def test_iid_residuals_small(self, spark):
        from zoi_spark import tablechecks as tc
        import random
        rng = random.Random(22)
        rows = [(float(t), 0.5 * t + rng.gauss(0, 1))
                for t in range(300)]
        df = spark.createDataFrame(rows, "i double, y double")
        out = tc.breusch_godfrey(df, "i", "y", "i").collect()[0]
        assert out["lm_stat"] < 11


class TestYuenTrimmedT:
    def test_outliers_do_not_flip_verdict(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        # same trimmed location; side B has monster outliers
        a = [float(v) for v in range(1, 101)]
        b = [float(v) for v in range(1, 99)] + [1e6, -1e6]
        rows = [(v, True) for v in a] + [(v, False) for v in b]
        df = spark.createDataFrame(rows, "v double, s boolean")
        out = tc.yuen_trimmed_t(df, "v",
                                split=F.col("s")).collect()[0]
        assert abs(out["t_stat"]) < 2.5
        assert out["h_a"] == 60 and out["h_b"] == 60

    def test_real_shift_detected(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        a = [float(v) for v in range(1, 101)]
        b = [float(v) + 40.0 for v in range(1, 101)]
        rows = [(v, True) for v in a] + [(v, False) for v in b]
        df = spark.createDataFrame(rows, "v double, s boolean")
        out = tc.yuen_trimmed_t(df, "v",
                                split=F.col("s")).collect()[0]
        assert out["tm_b"] - out["tm_a"] == 40.0
        assert out["t_stat"] < -5

    def test_trimmed_mean_exact(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        # n=10, trim 0.2 -> g=2: trimmed mean of 3..8
        a = [float(v) for v in range(1, 11)]
        rows = [(v, True) for v in a] + [(v, False) for v in a]
        df = spark.createDataFrame(rows, "v double, s boolean")
        out = tc.yuen_trimmed_t(df, "v",
                                split=F.col("s")).collect()[0]
        assert out["tm_a"] == 5.5 and out["tm_b"] == 5.5
        assert out["h_a"] == 6


class TestClusterRobustSlope:
    def test_clustered_noise_inflates_se(self, spark):
        from zoi_spark import tablechecks as tc
        import random
        rng = random.Random(31)
        rows = []
        for g in range(40):
            shock = rng.gauss(0, 5)            # shared per cluster
            x = rng.random() * 10              # cluster-level x:
            for _ in range(25):                # the Moulton case
                rows.append((x, 1.0 * x + shock + rng.gauss(0, .2),
                             g))
        df = spark.createDataFrame(rows, "x double, y double, g long")
        out = tc.cluster_robust_slope(
            df, "x", "y", cluster_col="g").collect()[0]
        assert out["n"] == 1000 and out["n_clusters"] == 40
        assert abs(out["slope"] - 1.0) < 0.3
        assert out["inflation"] > 1.0          # naive SE too small

    def test_iid_noise_no_inflation(self, spark):
        from zoi_spark import tablechecks as tc
        import random
        rng = random.Random(32)
        rows = [(rng.random() * 10, 0.0, i % 40) for i in range(1000)]
        rows = [(x, 2.0 * x + rng.gauss(0, 1), g) for x, _, g in rows]
        df = spark.createDataFrame(rows, "x double, y double, g long")
        out = tc.cluster_robust_slope(
            df, "x", "y", cluster_col="g").collect()[0]
        assert 0.6 < out["inflation"] < 1.4


class TestPermutationTestMean:
    def test_huge_effect_small_p(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        rows = ([(i, float(i % 7), True) for i in range(200)]
                + [(i + 1000, 50.0 + i % 7, False)
                   for i in range(200)])
        df = spark.createDataFrame(rows, "i long, v double, s boolean")
        out = tc.permutation_test_mean(
            df, "v", split=F.col("s"), id_col="i",
            n_perm=64).collect()[0]
        assert out["p_value"] == round(1 / 65, 6)
        assert out["n_ge"] == 0

    def test_null_effect_large_p(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        import random
        rng = random.Random(41)
        rows = [(i, rng.gauss(0, 1), i % 2 == 0) for i in range(400)]
        df = spark.createDataFrame(rows, "i long, v double, s boolean")
        out = tc.permutation_test_mean(
            df, "v", split=F.col("s"), id_col="i",
            n_perm=64).collect()[0]
        assert out["p_value"] > 0.1

    def test_deterministic_across_runs(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        rows = [(i, float(i % 13), i % 3 == 0) for i in range(150)]
        df = spark.createDataFrame(rows, "i long, v double, s boolean")
        r1 = tc.permutation_test_mean(
            df, "v", split=F.col("s"), id_col="i",
            n_perm=32).collect()[0]
        r2 = tc.permutation_test_mean(
            df.repartition(7), "v", split=F.col("s"), id_col="i",
            n_perm=32).collect()[0]
        assert r1["p_value"] == r2["p_value"]
        assert r1["n_ge"] == r2["n_ge"]


class TestConformalInterval:
    def test_coverage_at_least_nominal(self, spark):
        from zoi_spark import tablechecks as tc
        import random
        rng = random.Random(51)
        rows = [(i, float(i % 24),
                 2.0 * (i % 24) + rng.gauss(0, 3)) for i in range(2000)]
        df = spark.createDataFrame(rows, "i long, x double, y double")
        out = tc.conformal_interval(
            df, "x", "y", id_col="i", alpha=0.1).collect()[0]
        assert out["coverage"] >= 0.9
        assert out["q_hat"] > 0
        assert abs(out["slope"] - 2.0) < 0.5
        assert out["n_fit"] + out["n_calib"] == 2000

    def test_noise_free_tiny_band(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(i, float(i % 10), 3.0 * (i % 10) + 1.0)
                for i in range(400)]
        df = spark.createDataFrame(rows, "i long, x double, y double")
        out = tc.conformal_interval(
            df, "x", "y", id_col="i", alpha=0.1).collect()[0]
        assert out["q_hat"] < 1e-6
        assert out["coverage"] == 1.0
        assert out["intercept"] == 1.0


class TestBernsteinBound:
    def test_bound_contains_truth_small_n(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("a", 1.0 if i < 3 else 0.0) for i in range(30)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = tc.bernstein_bound(df, "v", by="g",
                                 lo=0.0, hi=1.0).collect()[0]
        assert out["lo_bound"] <= 0.1 <= out["hi_bound"]
        assert out["lo_bound"] >= 0.0 and out["hi_bound"] <= 1.0

    def test_variance_adaptive_tighter_than_hoeffding(self, spark):
        import math
        from zoi_spark import tablechecks as tc
        # near-constant values: EB half-width << Hoeffding's
        rows = [("a", 0.5)] * 500
        df = spark.createDataFrame(rows, "g string, v double")
        out = tc.bernstein_bound(df, "v", by="g",
                                 lo=0.0, hi=1.0).collect()[0]
        hoeffding = math.sqrt(math.log(2 / 0.05) / (2 * 500))
        assert out["eb_half"] < hoeffding

    def test_out_of_range_counted(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("a", 0.5), ("a", 2.0), ("a", -1.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = tc.bernstein_bound(df, "v", by="g",
                                 lo=0.0, hi=1.0).collect()[0]
        assert out["n_oob"] == 2


class TestBasketRules:
    def test_support_confidence_lift(self, spark):
        from zoi_spark import tablechecks as tc
        # 10 baskets: A in all, B in the 6 with A-and-B, C alone in 4
        rows = []
        for b in range(10):
            rows.append((b, "A"))
            if b < 6:
                rows.append((b, "B"))
            else:
                rows.append((b, "C"))
        df = spark.createDataFrame(rows, "bk long, it string")
        out = {(r["antecedent"], r["consequent"]): r
               for r in tc.basket_rules(
                   df, basket_cols=["bk"], item_col="it",
                   min_support=0.0).collect()}
        ab = out[("A", "B")]
        assert ab["support"] == 0.6
        assert ab["confidence"] == 0.6       # P(B|A): A in all 10
        assert ab["lift"] == 1.0             # B also 0.6 overall
        ba = out[("B", "A")]
        assert ba["confidence"] == 1.0

    def test_multiplicity_ignored(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(1, "A")] * 5 + [(1, "B")] + [(2, "A")]
        df = spark.createDataFrame(rows, "bk long, it string")
        out = {(r["antecedent"], r["consequent"]): r
               for r in tc.basket_rules(
                   df, basket_cols=["bk"], item_col="it",
                   min_support=0.0).collect()}
        assert out[("A", "B")]["n_both"] == 1
        assert out[("A", "B")]["support"] == 0.5

    def test_min_support_filters(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(b, "A") for b in range(100)] + [(0, "Z")]
        df = spark.createDataFrame(rows, "bk long, it string")
        out = tc.basket_rules(df, basket_cols=["bk"],
                              item_col="it",
                              min_support=0.05).collect()
        assert out == []                      # A-Z pair support 1%


class TestDkwBand:
    def test_epsilon_and_bounds(self, spark):
        import math
        from zoi_spark import tablechecks as tc
        rows = [(float(v),) for v in range(1, 201)]
        df = spark.createDataFrame(rows, "v double")
        out = {r["decile"]: r for r in
               tc.dkw_band(df, "v", delta=0.05).collect()}
        eps = math.sqrt(math.log(2 / 0.05) / (2 * 200))
        assert out[50]["epsilon"] == round(eps, 6)
        assert out[50]["p_lo"] == round(0.5 - eps, 6)
        assert out[10]["p_lo"] == round(max(0.1 - eps, 0), 6)
        assert out[90]["p_hi"] == round(min(0.9 + eps, 1), 6)
        assert out[50]["value"] == 100.5

    def test_epsilon_shrinks_with_n(self, spark):
        from zoi_spark import tablechecks as tc
        small = spark.createDataFrame(
            [(float(v),) for v in range(50)], "v double")
        big = spark.createDataFrame(
            [(float(v),) for v in range(5000)], "v double")
        e_small = tc.dkw_band(small, "v").collect()[0]["epsilon"]
        e_big = tc.dkw_band(big, "v").collect()[0]["epsilon"]
        assert e_big < e_small / 5


class TestTyposquatCandidates:
    def test_spoof_found_siblings_excluded(self, spark):
        from zoi_spark import urls
        rows = ([("host1.example.com",)] * 500
                + [("host2.example.com",)] * 480
                + [("h0st1.example.com",)] * 3)
        df = spark.createDataFrame(rows, "host string")
        out = urls.typosquat_candidates(df, "host",
                                        top_k=5).collect()
        pairs = {(r["suspect"], r["legit"]) for r in out}
        assert ("h0st1.example.com", "host1.example.com") in pairs
        # heavy siblings never reported against each other
        assert ("host2.example.com", "host1.example.com") not in pairs

    def test_distance_cap(self, spark):
        from zoi_spark import urls
        rows = ([("alpha.example.com",)] * 100
                + [("totally-different.org",)] * 2)
        df = spark.createDataFrame(rows, "host string")
        out = urls.typosquat_candidates(df, "host").collect()
        assert out == []


class TestKrippendorffAlpha:
    def test_hand_derived_value(self, spark):
        from zoi_spark import tablechecks as tc
        # u1: [a,a]  u2: [a,b]  u3: [b,b]  -> alpha = 4/9
        rows = [(1, "a"), (1, "a"), (2, "a"), (2, "b"),
                (3, "b"), (3, "b")]
        df = spark.createDataFrame(rows, "u long, c string")
        out = tc.krippendorff_alpha(df, "u", "c").collect()[0]
        assert out["alpha"] == round(4 / 9, 6)
        assert out["d_o"] == round(1 / 3, 6)
        assert out["d_e"] == 0.6

    def test_perfect_agreement(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(u, "x") for u in range(5) for _ in range(3)]
        df = spark.createDataFrame(rows, "u long, c string")
        out = tc.krippendorff_alpha(df, "u", "c").collect()[0]
        assert out["d_o"] == 0.0
        # single-category data: D_e = 0 too -> alpha NULL (undefined)
        assert out["alpha"] is None

    def test_single_rating_items_dropped(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(1, "a"), (1, "a"), (2, "b")]   # item 2 unpairable
        df = spark.createDataFrame(rows, "u long, c string")
        out = tc.krippendorff_alpha(df, "u", "c").collect()[0]
        assert out["n_items"] == 2
        assert out["n_pairable"] == 1
        assert out["n_ratings"] == 2


class TestDaleniusStrata:
    def test_equal_freq_uniform(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(float(v),) for v in range(1000)]
        df = spark.createDataFrame(rows, "v double")
        out = tc.dalenius_strata(df, "v", n_strata=4,
                                 n_bins=50).collect()
        assert len(out) == 4
        shares = [r["share"] for r in out]
        assert all(abs(s - 0.25) < 0.05 for s in shares)
        assert out[0]["lo_edge"] == 0.0
        assert out[-1]["hi_edge"] == 999.0
        # edges tile contiguously
        for a, b in zip(out, out[1:]):
            assert abs(a["hi_edge"] - b["lo_edge"]) < 1e-6

    def test_skew_narrows_dense_strata(self, spark):
        from zoi_spark import tablechecks as tc
        # heavy mass near zero, thin tail to 1000
        rows = ([(float(v % 50),) for v in range(2000)]
                + [(float(v),) for v in range(50, 1001, 10)])
        df = spark.createDataFrame(rows, "v double")
        out = tc.dalenius_strata(df, "v", n_strata=4,
                                 n_bins=50).collect()
        w0 = out[0]["hi_edge"] - out[0]["lo_edge"]
        w3 = out[-1]["hi_edge"] - out[-1]["lo_edge"]
        assert w0 < w3                         # dense stratum narrow


class TestMedianRollupBias:
    def test_balanced_groups_agree(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(g, float(v)) for g in ("a", "b")
                for v in range(1, 102)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = tc.median_rollup_bias(df, "v", by="g").collect()[0]
        assert out["global_median"] == 51.0
        assert out["mean_of_medians"] == 51.0
        assert out["max_abs_gap"] == 0.0

    def test_unbalanced_groups_diverge(self, spark):
        from zoi_spark import tablechecks as tc
        rows = ([("big", float(v)) for v in range(1, 1002)]
                + [("tiny", 10000.0)] * 3)
        df = spark.createDataFrame(rows, "g string, v double")
        out = tc.median_rollup_bias(df, "v", by="g").collect()[0]
        # rollup averages the tiny group's 10000 median equally
        assert out["max_abs_gap"] > 1000


class TestCochranQ:
    def test_textbook_small_case(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        # 4 items x 3 treatments, hand-computable
        data = {1: (1, 1, 0), 2: (1, 0, 0), 3: (1, 1, 1),
                4: (1, 1, 0)}
        rows = [(i, f"t{j}", bool(v))
                for i, vs in data.items() for j, v in enumerate(vs)]
        df = spark.createDataFrame(rows, "i long, t string, x boolean")
        out = tc.cochran_q(df, item_col="i", treat_col="t",
                           flag_col="x").collect()[0]
        # G = (4, 3, 1), L = (2, 1, 3, 2): Q = k(k-1)(sum G^2 -
        # Gsum^2/k)/(k*sumL - sumL^2) = 3*2*(26-64/3)/(24-18)
        q = 6 * (26 - 64 / 3) / 6.0
        assert out["q_stat"] == round(q, 6)
        assert out["k_treat"] == 3 and out["dof"] == 2
        assert out["n_items"] == 4 and out["n_dropped"] == 0

    def test_incomplete_item_dropped(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        rows = [(1, "a", True), (1, "b", False),
                (2, "a", True)]                # item 2 misses b
        df = spark.createDataFrame(rows, "i long, t string, x boolean")
        out = tc.cochran_q(df, item_col="i", treat_col="t",
                           flag_col="x").collect()[0]
        assert out["n_items"] == 1 and out["n_dropped"] == 1

    def test_balanced_passes_zero_q(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        # each item passes exactly one distinct treatment -> all
        # G_j equal -> Q = 0 with a positive denominator
        rows = [(i, t, t == "abc"[i % 3])
                for i in range(9) for t in ("a", "b", "c")]
        df = spark.createDataFrame(rows, "i long, t string, x boolean")
        out = tc.cochran_q(df, item_col="i", treat_col="t",
                           flag_col="x").collect()[0]
        assert out["q_stat"] == 0.0

    def test_no_within_item_variation_null(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        # all-pass / all-fail items: denominator 0, Q undefined
        rows = [(i, t, i % 2 == 0) for i in range(10)
                for t in ("a", "b", "c")]
        df = spark.createDataFrame(rows, "i long, t string, x boolean")
        out = tc.cochran_q(df, item_col="i", treat_col="t",
                           flag_col="x").collect()[0]
        assert out["q_stat"] is None


class TestTurningPoints:
    def test_alternating_series_max_points(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(i, float(i % 2)) for i in range(20)]
        df = spark.createDataFrame(rows, "t long, x double")
        out = tc.turning_points(df, "x", "t").collect()[0]
        assert out["t_points"] == 18           # every interior point
        assert out["z"] > 3

    def test_monotone_series_zero_points(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(i, float(i)) for i in range(20)]
        df = spark.createDataFrame(rows, "t long, x double")
        out = tc.turning_points(df, "x", "t").collect()[0]
        assert out["t_points"] == 0
        assert out["z"] < -3

    def test_ties_produce_no_points(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(i, 5.0) for i in range(10)]
        df = spark.createDataFrame(rows, "t long, x double")
        out = tc.turning_points(df, "x", "t").collect()[0]
        assert out["t_points"] == 0


class TestLastDigitUniformity:
    def test_rounded_data_flagged(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(float(v),) for v in range(1, 501)]  # all .00 cents
        df = spark.createDataFrame(rows, "v double")
        out = tc.last_digit_uniformity(df, "v").collect()[0]
        assert out["share_0"] == 1.0
        assert out["chi2"] == 4500.0           # 500*9
        assert out["max_digit_share"] == 1.0

    def test_uniform_digits_low_chi2(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [((v % 1000) / 100.0 + 0.001 * 0,)
                for v in range(5000)]
        df = spark.createDataFrame(rows, "v double")
        out = tc.last_digit_uniformity(df, "v").collect()[0]
        assert out["chi2"] < 30
        assert abs(out["share_0"] - 0.1) < 0.02


class TestStumpSplit:
    def test_separable_perfect_gain(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        rows = [(float(s), s >= 10) for s in range(20)]
        df = spark.createDataFrame(rows, "s double, y boolean")
        out = tc.stump_split(df, score_col="s",
                             label_col=F.col("y")).collect()[0]
        assert out["threshold"] == 10.0
        assert out["gini_split"] == 0.0
        assert out["gain"] == 0.5              # balanced parent

    def test_gini_vs_youden_divergence(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        # imbalanced classes: both defined, gain positive
        rows = ([(float(s), True) for s in range(90, 100)]
                + [(float(s), False) for s in range(90)])
        df = spark.createDataFrame(rows, "s double, y boolean")
        out = tc.stump_split(df, score_col="s",
                             label_col=F.col("y")).collect()[0]
        assert out["threshold"] == 90.0
        assert out["gain"] > 0.1

    def test_no_signal_near_zero_gain(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        rows = [(float(i % 10), (i // 10) % 2 == 0)
                for i in range(200)]
        df = spark.createDataFrame(rows, "s double, y boolean")
        out = tc.stump_split(df, score_col="s",
                             label_col=F.col("y")).collect()[0]
        assert out["gain"] < 0.01


class TestContextTruncationLoss:
    def test_exact_loss_accounting(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        rows = [(100.0,), (600.0,), (1500.0,)]
        df = spark.createDataFrame(rows, "t double")
        out = {r["context_len"]: r for r in
               tc.context_truncation_loss(
                   df, F.col("t"), lengths=(512, 1024)).collect()}
        assert out[512]["docs_over"] == 2
        assert out[512]["tokens_lost"] == (600 - 512) + (1500 - 512)
        assert out[1024]["docs_over"] == 1
        assert out[1024]["tokens_lost"] == 476
        assert out[512]["tokens_total"] == 2200
        assert out[512]["token_loss_share"] == round(1076 / 2200, 6)

    def test_token_share_exceeds_doc_share_on_tail(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        rows = [(10.0,)] * 98 + [(100000.0,)] * 2
        df = spark.createDataFrame(rows, "t double")
        out = tc.context_truncation_loss(
            df, F.col("t"), lengths=(512,)).collect()[0]
        assert out["docs_over_share"] == 0.02
        assert out["token_loss_share"] > 0.9


class TestDemingFit:
    def test_noise_free_recovers_line(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(float(x), 2.0 * x + 3.0) for x in range(1, 101)]
        df = spark.createDataFrame(rows, "x double, y double")
        out = tc.deming_fit(df, "x", "y").collect()[0]
        assert out["slope"] == 2.0
        assert out["intercept"] == 3.0
        assert out["attenuation"] == 1.0

    def test_noise_in_x_ols_attenuates_deming_does_not(self, spark):
        from zoi_spark import tablechecks as tc
        import random
        rng = random.Random(61)
        rows = []
        for _ in range(3000):
            t = rng.gauss(0, 5)
            rows.append((t + rng.gauss(0, 2), t + rng.gauss(0, 2)))
        df = spark.createDataFrame(rows, "x double, y double")
        out = tc.deming_fit(df, "x", "y", lam=1.0).collect()[0]
        # true slope 1; OLS attenuated by 25/(25+4)
        assert abs(out["slope"] - 1.0) < 0.08
        assert out["ols_slope"] < 0.93
        assert out["attenuation"] < 0.95

    def test_symmetry_in_x_y(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(float(x), float((x * 13) % 37)) for x in range(50)]
        df = spark.createDataFrame(rows, "x double, y double")
        swapped = spark.createDataFrame(
            [(y, x) for x, y in rows], "x double, y double")
        a = tc.deming_fit(df, "x", "y").collect()[0]["slope"]
        b = tc.deming_fit(swapped, "x", "y").collect()[0]["slope"]
        assert abs(a * b - 1.0) < 1e-4         # inverse slopes


class TestEffectSizePairs:
    def test_known_d(self, spark):
        from zoi_spark import tablechecks as tc
        import statistics
        a = [float(v) for v in range(1, 11)]
        b = [float(v) + 3.0 for v in range(1, 11)]
        rows = [("a", v) for v in a] + [("b", v) for v in b]
        df = spark.createDataFrame(rows, "g string, v double")
        out = tc.effect_size_pairs(df, "v", by="g").collect()[0]
        sd = statistics.stdev(a)               # equal variances
        d = 3.0 / sd
        assert out["mean_diff"] == 3.0
        assert out["cohens_d"] == round(d, 6)
        assert out["hedges_g"] == round(d * (1 - 3 / (4 * 20 - 9)), 6)

    def test_pair_count(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(g, float(i)) for g in "abcd" for i in range(5)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = tc.effect_size_pairs(df, "v", by="g").collect()
        assert len(out) == 6                   # C(4,2)


class TestMahalanobis2d:
    def test_correlation_aware_flagging(self, spark):
        from zoi_spark import tablechecks as tc
        import random
        rng = random.Random(71)
        rows = []
        for _ in range(1000):
            t = rng.gauss(0, 10)
            rows.append((t, t + rng.gauss(0, 1)))
        # marginally normal but jointly absurd point
        rows.append((10.0, -10.0))
        df = spark.createDataFrame(rows, "x double, y double")
        out = tc.mahalanobis_2d(df, "x", "y").collect()[0]
        assert out["n_flagged"] >= 1
        assert out["corr_xy"] > 0.9
        assert out["max_d2"] > 50

    def test_uncorrelated_reduces_to_z2(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(float(x), float(y)) for x in range(-5, 6)
                for y in range(-5, 6)]
        df = spark.createDataFrame(rows, "x double, y double")
        out = tc.mahalanobis_2d(df, "x", "y").collect()[0]
        assert abs(out["corr_xy"]) < 1e-9
        # grid extremes: d2 = x^2/vx + y^2/vy = 2*25/10 = 5 < 5.991
        assert out["n_flagged"] == 0


class TestDesignEffect:
    def test_strong_clustering_inflates_deff(self, spark):
        from zoi_spark import tablechecks as tc
        import random
        rng = random.Random(81)
        rows = []
        for g in range(40):
            center = rng.gauss(0, 10)          # big between-cluster
            for _ in range(25):
                rows.append((g, center + rng.gauss(0, 0.5)))
        df = spark.createDataFrame(rows, "g long, v double")
        out = tc.design_effect(df, "v", cluster_col="g").collect()[0]
        assert out["icc"] > 0.9
        assert out["deff"] > 15
        assert out["n_effective"] < 100

    def test_no_clustering_deff_one(self, spark):
        from zoi_spark import tablechecks as tc
        import random
        rng = random.Random(82)
        rows = [(i % 40, rng.gauss(0, 1)) for i in range(1000)]
        df = spark.createDataFrame(rows, "g long, v double")
        out = tc.design_effect(df, "v", cluster_col="g").collect()[0]
        assert out["deff"] < 2
        assert out["n_effective"] > 500


class TestGpdTailFit:
    def test_exponential_tail_xi_near_zero(self, spark):
        from zoi_spark import tablechecks as tc
        import random
        rng = random.Random(91)
        rows = [(rng.expovariate(1.0),) for _ in range(20000)]
        df = spark.createDataFrame(rows, "v double")
        out = tc.gpd_tail_fit(df, "v", tail_q=0.9).collect()[0]
        # exponential excesses are GPD with xi = 0
        assert abs(out["xi"]) < 0.08
        assert abs(out["mean_excess"] - 1.0) < 0.1
        assert out["rl_10x"] > out["threshold"]

    def test_heavy_tail_positive_xi(self, spark):
        from zoi_spark import tablechecks as tc
        import random
        rng = random.Random(92)
        # Pareto(alpha=2): xi = 0.5
        rows = [((1 - rng.random()) ** (-1 / 2.0),)
                for _ in range(20000)]
        df = spark.createDataFrame(rows, "v double")
        out = tc.gpd_tail_fit(df, "v", tail_q=0.9).collect()[0]
        assert out["xi"] > 0.2

    def test_exceed_count(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(float(v),) for v in range(1, 101)]
        df = spark.createDataFrame(rows, "v double")
        out = tc.gpd_tail_fit(df, "v", tail_q=0.95).collect()[0]
        assert out["n_exceed"] == 5            # 96..100 > 95.05


class TestSeasonalMannKendall:
    def test_weekly_rhythm_alone_no_trend(self, spark):
        import datetime
        from zoi_spark import tablechecks as tc
        d0 = datetime.date(2024, 1, 1)
        wk = [100.0, 10.0, 12.0, 11.0, 13.0, 12.0, 80.0]
        rows = [(d0 + datetime.timedelta(days=i), wk[i % 7])
                for i in range(56)]
        df = spark.createDataFrame(rows, "d date, v double")
        out = tc.seasonal_mann_kendall(df, "v", "d").collect()[0]
        assert out["s_total"] == 0.0           # constant per season
        assert out["z"] is None                # all-tied: var 0

    def test_alternating_jitter_no_trend(self, spark):
        import datetime
        from zoi_spark import tablechecks as tc
        d0 = datetime.date(2024, 1, 1)
        wk = [100.0, 10.0, 12.0, 11.0, 13.0, 12.0, 80.0]
        rows = [(d0 + datetime.timedelta(days=i),
                 wk[i % 7] + (0.5 if (i // 7) % 2 else -0.5))
                for i in range(56)]
        df = spark.createDataFrame(rows, "d date, v double")
        out = tc.seasonal_mann_kendall(df, "v", "d").collect()[0]
        assert abs(out["z"]) < 1.96            # not significant

    def test_true_trend_detected(self, spark):
        import datetime
        from zoi_spark import tablechecks as tc
        d0 = datetime.date(2024, 1, 1)
        wk = [100.0, 10.0, 12.0, 11.0, 13.0, 12.0, 80.0]
        rows = [(d0 + datetime.timedelta(days=i),
                 wk[i % 7] + 2.0 * i) for i in range(56)]
        df = spark.createDataFrame(rows, "d date, v double")
        out = tc.seasonal_mann_kendall(df, "v", "d").collect()[0]
        assert out["z"] > 3
        assert out["n_seasons"] == 7 and out["n_obs"] == 56


class TestQqNormalTable:
    def test_normal_data_small_gaps(self, spark):
        from zoi_spark import tablechecks as tc
        import random
        rng = random.Random(101)
        rows = [(rng.gauss(50, 10),) for _ in range(20000)]
        df = spark.createDataFrame(rows, "v double")
        out = tc.qq_normal_table(df, "v").collect()
        assert len(out) == 9
        for r in out:
            assert abs(r["gap_in_sd"]) < 0.05

    def test_lognormal_right_tail_flagged(self, spark):
        from zoi_spark import tablechecks as tc
        import random, math
        rng = random.Random(102)
        rows = [(math.exp(rng.gauss(0, 1)),) for _ in range(20000)]
        df = spark.createDataFrame(rows, "v double")
        out = {r["decile"]: r for r in
               tc.qq_normal_table(df, "v").collect()}
        # heavy right tail: low deciles sit ABOVE the normal line
        # (which dives negative), while the median and q90 fall
        # BELOW the mean-anchored prediction — the classic S
        assert out[10]["gap_in_sd"] > 0.3
        assert out[50]["gap_in_sd"] < -0.1
        assert out[90]["gap_in_sd"] < -0.2


class TestTimestampRoundingAudit:
    def test_injected_rounding_detected(self, spark):
        import datetime
        from zoi_spark import tablechecks as tc
        t0 = datetime.datetime(2024, 1, 1)
        rows = []
        for i in range(600):
            sec = 0 if i % 3 == 0 else (i % 59) + 1
            rows.append((t0 + datetime.timedelta(minutes=i,
                                                 seconds=sec),))
        df = spark.createDataFrame(rows, "ts timestamp")
        out = tc.timestamp_rounding_audit(df, "ts").collect()[0]
        assert abs(out["sec0_share"] - 1 / 3) < 0.01
        assert out["sec0_ratio"] > 15
        assert out["subsec_uniform_chi2"] > 500

    def test_uniform_seconds_low_ratio(self, spark):
        import datetime
        from zoi_spark import tablechecks as tc
        t0 = datetime.datetime(2024, 1, 1)
        rows = [(t0 + datetime.timedelta(seconds=i * 61 + 7,
                                         microseconds=123),)
                for i in range(600)]
        df = spark.createDataFrame(rows, "ts timestamp")
        out = tc.timestamp_rounding_audit(df, "ts").collect()[0]
        assert out["sec0_ratio"] < 2.5
        assert out["micro0_share"] == 0.0


class TestAaCalibration:
    def test_iid_data_calibrated(self, spark):
        from zoi_spark import tablechecks as tc
        import random
        rng = random.Random(111)
        rows = [(i, rng.gauss(0, 1)) for i in range(4000)]
        df = spark.createDataFrame(rows, "i long, v double")
        out = tc.aa_calibration(df, "v", id_col="i",
                                n_splits=64).collect()[0]
        assert out["n_splits"] == 64
        assert out["sig_share"] <= 0.15        # ~5% expected
        assert out["max_abs_z"] < 4

    def test_deterministic(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(i, float(i % 17)) for i in range(1000)]
        df = spark.createDataFrame(rows, "i long, v double")
        a = tc.aa_calibration(df, "v", id_col="i",
                              n_splits=32).collect()[0]
        b = tc.aa_calibration(df.repartition(5), "v", id_col="i",
                              n_splits=32).collect()[0]
        assert a["n_sig"] == b["n_sig"]
        assert a["max_abs_z"] == b["max_abs_z"]

    def test_split_cap(self, spark):
        import pytest
        from zoi_spark import tablechecks as tc
        df = spark.createDataFrame([(1, 1.0)], "i long, v double")
        with pytest.raises(ValueError):
            tc.aa_calibration(df, "v", id_col="i", n_splits=200)


class TestLogrankTest:
    def test_identical_cohorts_null(self, spark):
        import datetime
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        t0 = datetime.datetime(2024, 1, 1)
        rows = []
        # mirrored cohorts: identical conversion times
        for u in range(20):
            rows.append((u, t0, "view"))
            rows.append((u, t0 + datetime.timedelta(
                hours=(u // 2) % 10 + 1), "buy"))
        df = spark.createDataFrame(rows, "u long, ts timestamp, et string")
        out = tc.logrank_test(
            df, entity_col="u", ts_col="ts",
            event_pred=F.col("et") == "buy",
            group_pred=F.pmod("u", F.lit(2)) == 0).collect()[0]
        assert out["n1"] == 10 and out["n2"] == 10
        assert abs(out["o_minus_e"]) < 1e-9
        assert out["chi2"] == 0.0

    def test_faster_cohort_flagged(self, spark):
        import datetime
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        t0 = datetime.datetime(2024, 1, 1)
        rows = []
        for u in range(40):
            rows.append((u, t0, "view"))
            # even users convert within 1-2h, odd at 20-30h
            h = (u % 2) * 19 + (u % 3) + 1
            rows.append((u, t0 + datetime.timedelta(hours=h), "buy"))
        df = spark.createDataFrame(rows, "u long, ts timestamp, et string")
        out = tc.logrank_test(
            df, entity_col="u", ts_col="ts",
            event_pred=F.col("et") == "buy",
            group_pred=F.pmod("u", F.lit(2)) == 0).collect()[0]
        assert out["chi2"] > 10

    def test_censoring_counts(self, spark):
        import datetime
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        t0 = datetime.datetime(2024, 1, 1)
        rows = [(1, t0, "view"),
                (1, t0 + datetime.timedelta(hours=2), "buy"),
                (2, t0, "view"),
                (2, t0 + datetime.timedelta(hours=5), "view")]
        df = spark.createDataFrame(rows, "u long, ts timestamp, et string")
        out = tc.logrank_test(
            df, entity_col="u", ts_col="ts",
            event_pred=F.col("et") == "buy",
            group_pred=F.col("u") == 1).collect()[0]
        assert out["events1"] == 1 and out["events2"] == 0


class TestCemImbalance:
    def test_identical_distributions_zero(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        rows = [(t, float(v % 5)) for t in (True, False)
                for v in range(100)]
        df = spark.createDataFrame(rows, "tr boolean, v double")
        out = tc.cem_imbalance(
            df, treat=F.col("tr"),
            strata=[F.col("v")]).collect()[0]
        assert out["l1"] == 0.0
        assert out["n_common_strata"] == out["n_strata"]

    def test_disjoint_support_one(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        rows = ([(True, float(v)) for v in range(5)] * 10
                + [(False, float(v + 100)) for v in range(5)] * 10)
        df = spark.createDataFrame(rows, "tr boolean, v double")
        out = tc.cem_imbalance(
            df, treat=F.col("tr"),
            strata=[F.col("v")]).collect()[0]
        assert out["l1"] == 1.0
        assert out["n_common_strata"] == 0

    def test_partial_overlap_between(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        rows = ([(True, 0.0)] * 80 + [(True, 1.0)] * 20
                + [(False, 0.0)] * 20 + [(False, 1.0)] * 80)
        df = spark.createDataFrame(rows, "tr boolean, v double")
        out = tc.cem_imbalance(
            df, treat=F.col("tr"),
            strata=[F.col("v")]).collect()[0]
        assert out["l1"] == 0.6


class TestJarqueBera:
    def test_normal_small_jb(self, spark):
        from zoi_spark import tablechecks as tc
        import random
        rng = random.Random(121)
        rows = [("a", rng.gauss(0, 1)) for _ in range(5000)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = tc.jarque_bera(df, "v", by="g").collect()[0]
        assert out["jb_stat"] < 15
        assert abs(out["skewness"]) < 0.15

    def test_exponential_flagged(self, spark):
        from zoi_spark import tablechecks as tc
        import random
        rng = random.Random(122)
        rows = [("a", rng.expovariate(1.0)) for _ in range(5000)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = tc.jarque_bera(df, "v", by="g").collect()[0]
        assert out["skewness"] > 1.5           # theory: 2
        assert out["jb_stat"] > 1000


class TestFileLayoutAudit:
    def test_multi_file_layout_measured(self, spark, tmp_path):
        from zoi_spark import tablechecks as tc
        path = str(tmp_path / "layout")
        spark.range(0, 1000).repartition(8).write.parquet(path)
        df = spark.read.parquet(path)
        out = tc.file_layout_audit(
            df, target_rows_per_file=100).collect()[0]
        assert out["n_files"] == 8
        assert out["rows_total"] == 1000
        assert out["suggested_files"] == 10
        assert out["rows_min"] > 0

    def test_small_files_counted(self, spark, tmp_path):
        from zoi_spark import tablechecks as tc
        import pyspark.sql.functions as F
        path = str(tmp_path / "skewed")
        spark.range(0, 900).coalesce(1).write.parquet(path)
        spark.range(900, 905).coalesce(1) \
            .write.mode("append").parquet(path)
        df = spark.read.parquet(path)
        out = tc.file_layout_audit(df).collect()[0]
        assert out["n_files"] == 2
        assert out["small_files"] == 1
        assert out["skew_ratio"] > 1.5


class TestSessionGapCurve:
    def test_counts_at_thresholds(self, spark):
        import datetime
        from zoi_spark import tablechecks as tc
        t0 = datetime.datetime(2024, 1, 1)
        rows = []
        # user 1: events at 0s, 10s, 1000s, 5000s
        for s in (0, 10, 1000, 5000):
            rows.append((1, t0 + datetime.timedelta(seconds=s)))
        rows.append((2, t0))                   # single-event user
        df = spark.createDataFrame(rows, "u long, ts timestamp")
        out = {r["gap_s"]: r for r in tc.session_gap_curve(
            df, entity_col="u", ts_col="ts",
            gaps_s=(100, 2000, 10000)).collect()}
        assert out[100]["n_sessions"] == 4     # 2 breaks + 2 users
        assert out[2000]["n_sessions"] == 3    # 1 break
        assert out[10000]["n_sessions"] == 2   # none
        assert out[10000]["events_per_session"] == 2.5

    def test_monotone_in_gap(self, spark):
        import datetime, random
        from zoi_spark import tablechecks as tc
        rng = random.Random(131)
        t0 = datetime.datetime(2024, 1, 1)
        rows = [(i % 20, t0 + datetime.timedelta(
            seconds=rng.randrange(0, 400000))) for i in range(2000)]
        df = spark.createDataFrame(rows, "u long, ts timestamp")
        out = [r["n_sessions"] for r in tc.session_gap_curve(
            df, entity_col="u", ts_col="ts",
            gaps_s=(60, 600, 6000)).orderBy("gap_s").collect()]
        assert out[0] >= out[1] >= out[2]


class TestQnScale:
    def _brute_qn(self, vals):
        n = len(vals)
        h = n // 2 + 1
        k = h * (h - 1) // 2
        dists = sorted(abs(a - b) for i, a in enumerate(vals)
                       for b in vals[i + 1:])
        return 2.2219 * dists[k - 1]

    def test_matches_bruteforce(self, spark):
        from zoi_spark import tablechecks as tc
        vals = [1.0, 3.0, 4.0, 4.0, 7.0, 11.0, 15.0, 16.0, 20.0]
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        out = tc.qn_scale(df, "v").collect()[0]
        assert out["qn"] == round(self._brute_qn(vals), 6)
        assert out["k"] == 10                  # h=5 -> C(5,2)

    def test_gaussian_consistency(self, spark):
        from zoi_spark import tablechecks as tc
        import random
        rng = random.Random(141)
        rows = [(rng.gauss(0, 10),) for _ in range(3000)]
        df = spark.createDataFrame(rows, "v double")
        out = tc.qn_scale(df, "v").collect()[0]
        # Qn, scaled MAD and SD all estimate sigma = 10
        assert abs(out["qn"] - 10) < 1.0
        assert abs(out["mad_scaled"] - 10) < 1.0
        assert abs(out["stddev"] - 10) < 1.0

    def test_outlier_robust_vs_sd(self, spark):
        from zoi_spark import tablechecks as tc
        vals = [float(v) for v in range(100)] + [1e6] * 5
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        out = tc.qn_scale(df, "v").collect()[0]
        assert out["qn"] < 100
        assert out["stddev"] > 10000


class TestRmstCohorts:
    def test_hand_computed_integral(self, spark):
        import datetime
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        t0 = datetime.datetime(2024, 1, 1)
        td = datetime.timedelta
        rows = [(0, t0, "view"), (0, t0 + td(minutes=90), "buy"),
                (1, t0, "view"), (1, t0 + td(hours=5), "view"),
                (2, t0, "view"), (2, t0 + td(minutes=30), "buy"),
                (3, t0, "view"), (3, t0 + td(hours=5), "view")]
        df = spark.createDataFrame(rows, "u long, ts timestamp, et string")
        out = {r["cohort"]: r for r in tc.rmst_cohorts(
            df, entity_col="u", ts_col="ts",
            event_pred=F.col("et") == "buy",
            group_pred=F.col("u") < 2,
            tau_s=4 * 3600, bucket_s=3600).collect()}
        # cohort 1: S=1 on [0,2), 0.5 on [2,4) -> 3 bucket-hours
        assert out[1]["rmst_s"] == 3 * 3600.0
        assert out[1]["rmst_share"] == 0.75
        # cohort 0: S=1 on [0,1), 0.5 on [1,4) -> 2.5 bucket-hours
        assert out[0]["rmst_s"] == 2.5 * 3600.0
        assert out[0]["rmst_share"] == 0.625
        assert out[1]["n_events"] == 1 and out[0]["n_events"] == 1

    def test_never_converting_full_share(self, spark):
        import datetime
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        t0 = datetime.datetime(2024, 1, 1)
        rows = [(u, t0 + datetime.timedelta(hours=h), "view")
                for u in range(4) for h in (0, 50)]
        df = spark.createDataFrame(rows, "u long, ts timestamp, et string")
        out = tc.rmst_cohorts(
            df, entity_col="u", ts_col="ts",
            event_pred=F.col("et") == "buy",
            group_pred=F.lit(True),
            tau_s=10 * 3600).collect()
        full = [r for r in out if r["cohort"] == 1][0]
        assert full["rmst_share"] == 1.0       # nobody converts


class TestBlandAltman:
    def test_constant_offset(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(float(v), float(v) + 5.0) for v in range(50)]
        df = spark.createDataFrame(rows, "a double, b double")
        out = tc.bland_altman(df, "a", "b").collect()[0]
        assert out["bias"] == 5.0
        assert out["sd_diff"] == 0.0
        assert out["loa_lo"] == 5.0 and out["loa_hi"] == 5.0

    def test_proportional_bias_detected(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(float(v), float(v) * 1.2) for v in range(1, 101)]
        df = spark.createDataFrame(rows, "a double, b double")
        out = tc.bland_altman(df, "a", "b").collect()[0]
        assert out["prop_bias_r"] > 0.99       # diff grows with mean


class TestSiegelSlope:
    def test_clean_line(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(float(x), 3.0 * x + 2.0) for x in range(20)]
        df = spark.createDataFrame(rows, "x double, y double")
        out = tc.siegel_slope(df, "x", "y").collect()[0]
        assert out["slope"] == 3.0
        assert out["intercept"] == 2.0

    def test_half_corrupted_survives(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(float(x), 3.0 * x + 2.0) for x in range(20)]
        # corrupt 9 of 20 points (45%) to a stuck sensor
        rows = [(x, 0.0) if i < 9 else (x, y)
                for i, (x, y) in enumerate(rows)]
        df = spark.createDataFrame(rows, "x double, y double")
        out = tc.siegel_slope(df, "x", "y").collect()[0]
        assert abs(out["slope"] - 3.0) < 0.5


class TestSampleTopkStability:
    def test_full_rate_perfect_overlap(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(i, f"t{i % 20}") for i in range(2000)]
        df = spark.createDataFrame(rows, "occ long, term string")
        out = {r["rate"]: r for r in tc.sample_topk_stability(
            df, "term", rates=(1.0, 0.5), k=5,
            id_col="occ").collect()}
        assert out[1.0]["overlap"] == 5
        assert out[1.0]["overlap_share"] == 1.0
        assert out[0.5]["overlap"] >= 3        # heavy head survives

    def test_tiny_rate_degrades(self, spark):
        from zoi_spark import tablechecks as tc
        import random
        rng = random.Random(151)
        # near-uniform 200 terms: a 1% sample can't fix the top 10
        rows = [(i, f"t{rng.randrange(200)}") for i in range(5000)]
        df = spark.createDataFrame(rows, "occ long, term string")
        out = {r["rate"]: r for r in tc.sample_topk_stability(
            df, "term", rates=(0.01, 1.0), k=10,
            id_col="occ").collect()}
        assert out[0.01]["overlap"] < out[1.0]["overlap"]


class TestFilterFunnel:
    def test_solo_vs_marginal(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        # 100 rows: 30 fail A; of those, 20 also fail B; 10 fail
        # only B
        rows = []
        for i in range(100):
            fail_a = i < 30
            fail_b = i < 20 or (30 <= i < 40)
            rows.append((not fail_a, not fail_b))
        df = spark.createDataFrame(rows, "a boolean, b boolean")
        out = {r["gate"]: r for r in tc.filter_funnel(
            df, [("A", F.col("a")), ("B", F.col("b"))]).collect()}
        assert out["A"]["n_fail_solo"] == 30
        assert out["A"]["n_kill_marginal"] == 30
        assert out["B"]["n_fail_solo"] == 30
        assert out["B"]["n_kill_marginal"] == 10   # 20 already dead
        assert out["B"]["survivors_after"] == 60

    def test_stage_order_preserved(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        df = spark.createDataFrame([(1,)], "x int")
        out = tc.filter_funnel(
            df, [("g1", F.lit(True)), ("g2", F.lit(True)),
                 ("g3", F.lit(False))]).orderBy("stage").collect()
        assert [r["gate"] for r in out] == ["g1", "g2", "g3"]
        assert out[-1]["survivors_after"] == 0


class TestMedianCi:
    def test_interval_brackets_median(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("a", float(v)) for v in range(1, 402)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = tc.median_ci(df, "v", by="g").collect()[0]
        assert out["ci_lo"] <= out["median"] <= out["ci_hi"]
        # for n=401 uniform ints the CI is tight around 201
        assert out["median"] == 201.0
        assert 175 < out["ci_lo"] < 201
        assert 201 < out["ci_hi"] < 227

    def test_narrows_with_n(self, spark):
        from zoi_spark import tablechecks as tc
        small = spark.createDataFrame(
            [("a", float(v)) for v in range(100)], "g string, v double")
        big = spark.createDataFrame(
            [("a", float(v % 1000)) for v in range(100000)],
            "g string, v double")
        s = tc.median_ci(small, "v", by="g").collect()[0]
        b = tc.median_ci(big, "v", by="g").collect()[0]
        rel_s = (s["ci_hi"] - s["ci_lo"]) / 100
        rel_b = (b["ci_hi"] - b["ci_lo"]) / 1000
        assert rel_b < rel_s


class TestSpiegelhalterZ:
    def test_perfectly_calibrated_small_z(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        import random
        rng = random.Random(161)
        rows = []
        for _ in range(5000):
            p = rng.random()
            rows.append((p, rng.random() < p))
        df = spark.createDataFrame(rows, "p double, y boolean")
        out = tc.spiegelhalter_z(df, prob_col="p",
                                 label_col=F.col("y")).collect()[0]
        assert abs(out["z"]) < 2.5

    def test_overconfident_flagged(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        import random
        rng = random.Random(162)
        rows = []
        for _ in range(5000):
            p = 0.9 if rng.random() < 0.5 else 0.1
            y = rng.random() < (0.6 if p > 0.5 else 0.4)
            rows.append((p, y))
        df = spark.createDataFrame(rows, "p double, y boolean")
        out = tc.spiegelhalter_z(df, prob_col="p",
                                 label_col=F.col("y")).collect()[0]
        assert abs(out["z"]) > 5


class TestLinCcc:
    def test_identity_perfect(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(float(v), float(v)) for v in range(100)]
        df = spark.createDataFrame(rows, "x double, y double")
        out = tc.lin_ccc(df, "x", "y").collect()[0]
        assert out["ccc"] == 1.0 and out["pearson_r"] == 1.0

    def test_scale_bias_punished(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(float(v), 2.0 * v + 7.0) for v in range(100)]
        df = spark.createDataFrame(rows, "x double, y double")
        out = tc.lin_ccc(df, "x", "y").collect()[0]
        assert out["pearson_r"] == 1.0         # r blind to bias
        assert out["ccc"] < 0.7                # CCC is not
        assert out["c_b"] < 0.7

    def test_matches_closed_form(self, spark):
        from zoi_spark import tablechecks as tc
        import statistics
        xs = [1.0, 2.0, 4.0, 7.0]
        ys = [2.0, 2.5, 4.5, 6.0]
        df = spark.createDataFrame(list(zip(xs, ys)),
                                   "x double, y double")
        out = tc.lin_ccc(df, "x", "y").collect()[0]
        mx, my = statistics.mean(xs), statistics.mean(ys)
        vx = sum((v - mx) ** 2 for v in xs) / 4
        vy = sum((v - my) ** 2 for v in ys) / 4
        cxy = sum((a - mx) * (b - my) for a, b in zip(xs, ys)) / 4
        ccc = 2 * cxy / (vx + vy + (mx - my) ** 2)
        assert out["ccc"] == round(ccc, 6)


class TestSkewScan:
    def test_tail_ratio_separates(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(float(v % 100 + 1), float(10 ** (v % 5)))
                for v in range(5000)]
        df = spark.createDataFrame(rows, "flat double, heavy double")
        out = {r["column"]: r for r in
               tc.skew_scan(df, ["flat", "heavy"]).collect()}
        assert out["flat"]["tail_ratio"] < 3
        assert out["heavy"]["tail_ratio"] > 50
        assert out["heavy"]["cv"] > out["flat"]["cv"]

    def test_null_columns_counted(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(1.0, None), (2.0, 5.0)]
        df = spark.createDataFrame(rows, "a double, b double")
        out = {r["column"]: r for r in
               tc.skew_scan(df, ["a", "b"]).collect()}
        assert out["a"]["n"] == 2 and out["b"]["n"] == 1


class TestPageTrend:
    def test_perfect_order_max_l(self, spark):
        import pyspark.sql.functions as F
        from zoi_spark import tablechecks as tc
        rows = [(b, float(j), float(j)) for b in range(12)
                for j in (1, 2, 3)]
        df = spark.createDataFrame(rows, "b long, j double, v double")
        out = tc.page_trend(df, block_col="b", treat_score="j",
                            value_col="v").collect()[0]
        # ranks 1,2,3 aligned with positions: L = b*(1+4+9) = 168
        assert out["l_stat"] == 168.0
        assert out["mean_l"] == 144.0
        assert out["z"] > 3

    def test_reversed_order_negative_z(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(b, float(j), float(4 - j)) for b in range(12)
                for j in (1, 2, 3)]
        df = spark.createDataFrame(rows, "b long, j double, v double")
        out = tc.page_trend(df, block_col="b", treat_score="j",
                            value_col="v").collect()[0]
        assert out["z"] < -3

    def test_all_tied_mean_l(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(b, float(j), 5.0) for b in range(10)
                for j in (1, 2, 3)]
        df = spark.createDataFrame(rows, "b long, j double, v double")
        out = tc.page_trend(df, block_col="b", treat_score="j",
                            value_col="v").collect()[0]
        assert out["l_stat"] == out["mean_l"]


class TestAtkinsonIndex:
    def test_equality_zero(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("a", 7.0)] * 50
        df = spark.createDataFrame(rows, "g string, v double")
        out = tc.atkinson_index(df, "v", by="g").collect()[0]
        assert out["atkinson"] == 0.0
        assert out["ede"] == 7.0

    def test_hand_value_eps_half(self, spark):
        from zoi_spark import tablechecks as tc
        vals = [1.0, 4.0]
        df = spark.createDataFrame([("a", v) for v in vals],
                                   "g string, v double")
        out = tc.atkinson_index(df, "v", by="g",
                                eps=0.5).collect()[0]
        # ede = (mean(sqrt))^2 = ((1+2)/2)^2 = 2.25; mean = 2.5
        assert out["ede"] == 2.25
        assert out["atkinson"] == round(1 - 2.25 / 2.5, 6)

    def test_eps_one_geometric(self, spark):
        from zoi_spark import tablechecks as tc
        import math
        vals = [1.0, 100.0]
        df = spark.createDataFrame([("a", v) for v in vals],
                                   "g string, v double")
        out = tc.atkinson_index(df, "v", by="g",
                                eps=1.0).collect()[0]
        assert out["ede"] == round(math.sqrt(100.0), 6)
        assert out["atkinson"] == round(1 - 10.0 / 50.5, 6)

    def test_more_aversion_more_inequality(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("a", float(v)) for v in (1, 1, 1, 50)]
        df = spark.createDataFrame(rows, "g string, v double")
        lo = tc.atkinson_index(df, "v", by="g",
                               eps=0.2).collect()[0]["atkinson"]
        hi = tc.atkinson_index(df, "v", by="g",
                               eps=0.9).collect()[0]["atkinson"]
        assert hi > lo


class TestPettitt:
    def test_monotone_shift_located(self, spark):
        from zoi_spark import tablechecks as tc
        import datetime as dt
        rows = []
        eid = 0
        for day, vol in enumerate([1, 2, 3, 10, 11, 12]):
            for _ in range(vol):
                rows.append((eid, dt.datetime(2024, 1, day + 1, 9)))
                eid += 1
        df = spark.createDataFrame(rows, "event_id long, ts timestamp")
        out = tc.pettitt_test(df, ts_col="ts").orderBy("bucket_ts") \
                .collect()
        # distinct ascending values: V_k = 2*rank - n - 1
        assert [r["u_stat"] for r in out] == [-5, -8, -9, -8, -5, 0]
        peaks = [r["bucket_ts"].day for r in out if r["is_peak"]]
        assert peaks == [3]          # max |U| = 9 at the third day

    def test_ties_match_double_sum(self, spark):
        from zoi_spark import tablechecks as tc
        import datetime as dt
        rows = []
        eid = 0
        for day, vol in enumerate([5, 5, 9]):
            for _ in range(vol):
                rows.append((eid, dt.datetime(2024, 2, day + 1)))
                eid += 1
        df = spark.createDataFrame(rows, "event_id long, ts timestamp")
        out = tc.pettitt_test(df, ts_col="ts").orderBy("bucket_ts") \
                .collect()
        # direct U_k = sum_{i<=k,j>k} sgn(x_i-x_j): [-1, -2, 0]
        assert [r["u_stat"] for r in out] == [-1, -2, 0]
        assert [r["is_peak"] for r in out] == [False, True, False]


class TestCliffsDelta:
    def test_total_dominance(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("a", 3), ("a", 4), ("b", 1), ("b", 2)]
        df = spark.createDataFrame(rows, "g string, v long")
        out = {r["group"]: r for r in
               tc.cliffs_delta(df, value_col="v", group_col="g")
               .collect()}
        assert out["a"]["delta_micro"] == 1000000
        assert out["a"]["magnitude"] == "large"
        assert out["b"]["delta_micro"] == -1000000
        assert out["a"]["n_a"] == 2 and out["a"]["n_b"] == 2

    def test_balanced_zero(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("a", 1), ("a", 3), ("b", 2), ("b", 2)]
        df = spark.createDataFrame(rows, "g string, v long")
        out = {r["group"]: r for r in
               tc.cliffs_delta(df, value_col="v", group_col="g")
               .collect()}
        # pairs (1,2),(1,2) lose; (3,2),(3,2) win -> delta 0
        assert out["a"]["delta_micro"] == 0
        assert out["a"]["magnitude"] == "negligible"

    def test_ties_half_credit(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("a", 2), ("b", 2), ("b", 1)]
        df = spark.createDataFrame(rows, "g string, v long")
        out = {r["group"]: r for r in
               tc.cliffs_delta(df, value_col="v", group_col="g")
               .collect()}
        # a vs rest: tie with 2 (0), win vs 1 (+1) -> delta = 1/2
        assert out["a"]["delta_micro"] == 500000
        assert out["a"]["magnitude"] == "large"


class TestHellingerDrift:
    def test_identical_sides_zero(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(i, (i // 2) * 40) for i in range(100)]
        df = spark.createDataFrame(rows, "id long, v long")
        out = tc.hellinger_drift(
            df, "v", split=F.pmod("id", F.lit(2)) == 0).collect()[0]
        assert out["bc"] == 1.0
        assert out["hellinger"] == 0.0
        assert out["n_a"] == 50 and out["n_b"] == 50

    def test_disjoint_sides_one(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(i, 0 if i % 2 == 0 else 40) for i in range(20)]
        df = spark.createDataFrame(rows, "id long, v long")
        out = tc.hellinger_drift(
            df, "v", split=F.pmod("id", F.lit(2)) == 0).collect()[0]
        assert out["bc"] == 0.0
        assert out["hellinger"] == 1.0

    def test_hand_value_half_overlap(self, spark):
        from zoi_spark import tablechecks as tc
        import math
        # side a: one row bin0 + one row bin1; side b: one row bin0
        rows = [(0, 0), (2, 40), (1, 0)]
        df = spark.createDataFrame(rows, "id long, v long")
        out = tc.hellinger_drift(
            df, "v", split=F.pmod("id", F.lit(2)) == 0).collect()[0]
        bc = math.sqrt(0.5)
        assert out["bc"] == round(bc, 6)
        assert out["hellinger"] == round(math.sqrt(1 - bc), 6)


class TestBrierDecomposition:
    def test_murphy_identity_hand_case(self, spark):
        from zoi_spark import tablechecks as tc
        rows = ([(0.2, 0)] * 4 + [(0.2, 1)]
                + [(0.8, 1)] * 4 + [(0.8, 0)])
        df = spark.createDataFrame(rows, "p double, y int")
        out = tc.brier_decomposition(df, prob_col="p",
                                     label_col="y").collect()[0]
        # perfectly calibrated bins: REL 0; RES 0.09; UNC 0.25
        assert out["reliability"] == 0.0
        assert out["resolution"] == 0.09
        assert out["uncertainty"] == 0.25
        assert out["brier"] == 0.16          # = REL - RES + UNC
        assert out["n"] == 10 and out["n_bins"] == 2

    def test_uninformative_forecast(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(0.5, i % 2) for i in range(10)]
        df = spark.createDataFrame(rows, "p double, y int")
        out = tc.brier_decomposition(df, prob_col="p",
                                     label_col="y").collect()[0]
        assert out["resolution"] == 0.0      # no discrimination
        assert out["reliability"] == 0.0     # but honest about it
        assert out["brier"] == 0.25


class TestKendallsW:
    def test_perfect_agreement(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(r, i, float(v)) for r in "xyz"
                for i, v in [("a", 1), ("b", 2), ("c", 3)]]
        df = spark.createDataFrame(rows, "r string, i string, v double")
        out = tc.kendalls_w(df, rater_col="r", item_col="i",
                            value_col="v").collect()[0]
        assert out["w"] == 1.0
        assert out["n_raters"] == 3 and out["n_items"] == 3

    def test_opposite_rankings_zero(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("x", "a", 1.0), ("x", "b", 2.0), ("x", "c", 3.0),
                ("y", "a", 3.0), ("y", "b", 2.0), ("y", "c", 1.0)]
        df = spark.createDataFrame(rows, "r string, i string, v double")
        out = tc.kendalls_w(df, rater_col="r", item_col="i",
                            value_col="v").collect()[0]
        assert out["w"] == 0.0

    def test_tie_correction_and_incomplete_drop(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("x", "a", 1.0), ("x", "b", 1.0), ("x", "c", 2.0),
                ("y", "a", 1.0), ("y", "b", 2.0), ("y", "c", 3.0),
                ("x", "d", 9.0)]      # d: rater y never saw it
        df = spark.createDataFrame(rows, "r string, i string, v double")
        out = tc.kendalls_w(df, rater_col="r", item_col="i",
                            value_col="v").collect()[0]
        # S=6.5, denom = 4*24 - 2*6 = 84 -> W = 78/84
        assert out["n_items"] == 3
        assert out["w"] == round(78 / 84, 6)


class TestTaylorsLaw:
    def test_perfect_power_law_slope_two(self, spark):
        from zoi_spark import tablechecks as tc
        import datetime as dt, math
        rows, eid = [], 0
        day1 = dt.datetime(2024, 3, 1, 12)
        day2 = dt.datetime(2024, 3, 2, 12)
        for uid, (c1, c2) in enumerate([(2, 2), (1, 3), (2, 6),
                                        (4, 12)]):
            for _ in range(c1):
                rows.append((eid, uid, day1)); eid += 1
            for _ in range(c2):
                rows.append((eid, uid, day2)); eid += 1
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp")
        out = tc.taylors_law(df, entity_col="user_id",
                             ts_col="ts").collect()[0]
        # user 0 has var 0 -> excluded; the rest lie on ln v = 2 ln m
        #   + ln(1/4): (m,v) = (2,1), (4,4), (8,16)
        assert out["n_entities"] == 3
        assert out["slope"] == 2.0
        assert out["intercept"] == round(-2 * math.log(2), 6)
        assert out["r2"] == 1.0


class TestADDrift:
    def test_identical_sides_zero(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(i, v) for i in range(2) for v in (1, 2)]
        df = spark.createDataFrame(rows, "side int, v int")
        out = tc.ad_drift(df, "v",
                          split=F.col("side") == 0).collect()[0]
        assert out["a2"] == 0.0
        assert out["n_a"] == 2 and out["n_b"] == 2

    def test_separated_hand_value(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(0, 1), (0, 2), (1, 3), (1, 4)]
        df = spark.createDataFrame(rows, "side int, v int")
        out = tc.ad_drift(df, "v",
                          split=F.col("side") == 0).collect()[0]
        # terms: 1/3 + 1 + 1/3 (hand-computed Scholz-Stephens sum)
        assert out["a2"] == round(1 / 3 + 1 + 1 / 3, 6)
        assert out["n_values"] == 4

    def test_tail_sensitivity_vs_cvm(self, spark):
        from zoi_spark import tablechecks as tc
        # same body, shifted extreme tail: AD reacts more than CvM
        a = [50] * 48 + [100, 101]
        b = [50] * 48 + [400, 401]
        rows = [(0, v) for v in a] + [(1, v) for v in b]
        df = spark.createDataFrame(rows, "side int, v int")
        split = F.col("side") == 0
        ad = tc.ad_drift(df, "v", split=split).collect()[0]["a2"]
        cvm = tc.cvm_drift(df, "v", split=split).collect()[0]["t"]
        assert ad > 4 * cvm


class TestBowker:
    def test_directional_switches(self, spark):
        from zoi_spark import tablechecks as tc
        import datetime as dt
        t0 = dt.datetime(2024, 1, 2)
        t1 = dt.datetime(2024, 1, 20)
        rows = [(1, t0, "a"), (1, t1, "b"),
                (2, t0, "a"), (2, t1, "b"),
                (3, t0, "b"), (3, t1, "a"),
                (4, t0, "c"), (4, t1, "c"),
                (5, t0, "a")]          # only one phase -> dropped
        df = spark.createDataFrame(rows, "u long, ts timestamp, t string")
        out = tc.bowker_test(
            df, id_col="u", cat_col="t",
            split=F.col("ts") < F.lit("2024-01-16")
            .cast("timestamp")).collect()[0]
        assert out["n_subjects"] == 4
        assert out["n_switchers"] == 3
        assert out["df"] == 1
        assert out["chi2"] == round(1 / 3, 6)   # (2-1)^2/(2+1)

    def test_modal_tiebreak_alphabetical(self, spark):
        from zoi_spark import tablechecks as tc
        import datetime as dt
        t0, t1 = dt.datetime(2024, 1, 2), dt.datetime(2024, 1, 20)
        # phase0: tie between 'b' and 'a' -> 'a' wins
        rows = [(1, t0, "b"), (1, t0, "a"), (1, t1, "a")]
        df = spark.createDataFrame(rows, "u long, ts timestamp, t string")
        out = tc.bowker_test(
            df, id_col="u", cat_col="t",
            split=F.col("ts") < F.lit("2024-01-16")
            .cast("timestamp")).collect()[0]
        assert out["n_switchers"] == 0          # a -> a


class TestOddsRatio:
    def test_hand_cells_and_ci(self, spark):
        from zoi_spark import tablechecks as tc
        import math
        rows = ([(1, 1)] * 2 + [(1, 0)] * 3
                + [(0, 1)] * 4 + [(0, 0)] * 6)
        df = spark.createDataFrame(rows, "e int, o int")
        out = tc.odds_ratio(df, exposure=F.col("e") == 1,
                            outcome=F.col("o") == 1).collect()[0]
        assert (out["a"], out["b"], out["c"], out["d"]) == (2, 3, 4, 6)
        assert out["odds_ratio"] == 1.0
        assert out["corrected"] is False
        se = math.sqrt(1 / 2 + 1 / 3 + 1 / 4 + 1 / 6)
        assert out["ci_lo"] == round(math.exp(-1.959964 * se), 6)
        assert out["ci_hi"] == round(math.exp(1.959964 * se), 6)

    def test_haldane_correction_on_zero_cell(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(1, 0)] * 3 + [(0, 1)] * 4 + [(0, 0)] * 6
        df = spark.createDataFrame(rows, "e int, o int")
        out = tc.odds_ratio(df, exposure=F.col("e") == 1,
                            outcome=F.col("o") == 1).collect()[0]
        assert out["a"] == 0 and out["corrected"] is True
        expect = (0.5 * 6.5) / (3.5 * 4.5)
        assert out["odds_ratio"] == round(expect, 6)


class TestINDDiscovery:
    def test_recovers_containment(self, spark):
        from zoi_spark import tablechecks as tc
        child = spark.createDataFrame([(1,), (2,), (2,)], "k long")
        parent = spark.createDataFrame([(1,), (2,), (3,)], "k long")
        out = {(r["lhs"], r["rhs"]): r for r in tc.ind_discovery(
            [("child.k", child, "k"),
             ("parent.k", parent, "k")]).collect()}
        fwd = out[("child.k", "parent.k")]
        assert fwd["holds"] is True and fwd["n_violations"] == 0
        assert fwd["n_lhs_distinct"] == 2
        rev = out[("parent.k", "child.k")]
        assert rev["holds"] is False and rev["n_violations"] == 1

    def test_duplicate_label_raises(self, spark):
        from zoi_spark import tablechecks as tc
        import pytest as pt
        df = spark.createDataFrame([(1,)], "k long")
        with pt.raises(ValueError):
            tc.ind_discovery([("x", df, "k"), ("x", df, "k")])

    def test_string_normalized_match(self, spark):
        from zoi_spark import tablechecks as tc
        a = spark.createDataFrame([(7,)], "k long")
        b = spark.createDataFrame([("7",)], "k string")
        out = tc.ind_discovery([("a", a, "k"),
                                ("b", b, "k")]).collect()
        assert all(r["holds"] for r in out)


class TestCohensH:
    def test_extreme_and_zero(self, spark):
        from zoi_spark import tablechecks as tc
        import math
        rows = ([("a", 1)] * 4 + [("b", 0)] * 4
                + [("c", 1)] * 2 + [("c", 0)] * 2
                + [("d", 1)] * 2 + [("d", 0)] * 2)
        df = spark.createDataFrame(rows, "g string, s int")
        out = {(r["group_a"], r["group_b"]): r for r in tc.cohens_h(
            df, group_col="g", success=F.col("s") == 1).collect()}
        ab = out[("a", "b")]
        assert ab["h"] == round(math.pi, 6)     # 1.0 vs 0.0
        assert ab["magnitude"] == "large"
        cd = out[("c", "d")]
        assert cd["h"] == 0.0
        assert cd["magnitude"] == "negligible"


class TestBrunnerMunzel:
    def test_published_example(self, spark):
        from zoi_spark import tablechecks as tc
        # the worked example from Brunner & Munzel (2000), as used in
        # scipy.stats.brunnermunzel's docs: W = 3.1374674823
        x1 = [1, 2, 1, 1, 1, 1, 1, 1, 1, 1, 2, 4, 1, 1]
        x2 = [3, 3, 4, 3, 1, 2, 3, 1, 1, 5, 4]
        rows = ([("a", v) for v in x1] + [("b", v) for v in x2])
        df = spark.createDataFrame(rows, "g string, v int")
        out = tc.brunner_munzel(df, value_col="v", group_col="g",
                                group_a="a").collect()[0]
        assert out["n_a"] == 14 and out["n_b"] == 11
        assert abs(abs(out["w"]) - 3.137467) < 1e-6
        assert out["w"] > 0      # rest stochastically larger than a
        assert 0.5 < out["p_hat"] <= 1.0

    def test_symmetric_zero(self, spark):
        from zoi_spark import tablechecks as tc
        rows = ([("a", v) for v in (1, 2, 3, 4)]
                + [("b", v) for v in (1, 2, 3, 4)])
        df = spark.createDataFrame(rows, "g string, v int")
        out = tc.brunner_munzel(df, value_col="v", group_col="g",
                                group_a="a").collect()[0]
        assert out["w"] == 0.0
        assert out["p_hat"] == 0.5


class TestMHOdds:
    def test_hand_strata(self, spark):
        from zoi_spark import tablechecks as tc
        rows = []
        def stratum(s, a, b, c, d):
            rows.extend([(s, 1, 1)] * a + [(s, 1, 0)] * b
                        + [(s, 0, 1)] * c + [(s, 0, 0)] * d)
        stratum("s1", 2, 1, 1, 2)
        stratum("s2", 3, 2, 2, 3)
        df = spark.createDataFrame(rows, "s string, e int, o int")
        out = tc.mh_odds(df, stratum_col="s",
                         exposure=F.col("e") == 1,
                         outcome=F.col("o") == 1).collect()[0]
        num = 2 * 2 / 6 + 3 * 3 / 10
        den = 1 * 1 / 6 + 2 * 2 / 10
        assert out["n_strata"] == 2
        assert out["or_mh"] == round(num / den, 6)
        dev = (2 - 3 * 3 / 6) + (3 - 5 * 5 / 10)
        var = (81 / (36 * 5)) + (625 / (100 * 9))
        assert out["cmh_chi2"] == round(dev * dev / var, 6)

    def test_singleton_stratum_ignored(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("s1", 1, 1), ("s1", 1, 0), ("s1", 0, 1),
                ("s1", 0, 0), ("solo", 1, 1)]
        df = spark.createDataFrame(rows, "s string, e int, o int")
        out = tc.mh_odds(df, stratum_col="s",
                         exposure=F.col("e") == 1,
                         outcome=F.col("o") == 1).collect()[0]
        assert out["n_strata"] == 2      # listed, but var-contrib 0
        assert out["or_mh"] is not None


class TestKupiecPOF:
    def test_hand_case(self, spark):
        from zoi_spark import tablechecks as tc
        import math
        rows = ([(2 * i, float(i + 1)) for i in range(10)]     # cal 1..10
                + [(2 * i + 1, float(v)) for i, v in
                   enumerate([1, 2, 3, 4, 5, 6, 7, 8, 20, 30])])
        df = spark.createDataFrame(rows, "event_id long, value double")
        out = tc.kupiec_pof(
            df, value_col="value",
            split=F.pmod("event_id", F.lit(2)) == 0,
            nominal=0.1).collect()[0]
        assert out["threshold"] == 9.0   # type-1 p90 of 1..10
        assert out["n"] == 10 and out["x"] == 2
        lr = -2 * (8 * math.log(0.9) + 2 * math.log(0.1)
                   - 2 * math.log(0.2) - 8 * math.log(0.8))
        assert out["lr"] == round(lr, 6)
        assert out["reject"] is False    # 0.2 on n=10: not enough

    def test_perfect_coverage_lr_zero_ish(self, spark):
        from zoi_spark import tablechecks as tc
        rows = ([(2 * i, float(i + 1)) for i in range(10)]
                + [(2 * i + 1, float(i + 1)) for i in range(10)])
        df = spark.createDataFrame(rows, "event_id long, value double")
        out = tc.kupiec_pof(
            df, value_col="value",
            split=F.pmod("event_id", F.lit(2)) == 0,
            nominal=0.1).collect()[0]
        assert out["x"] == 1 and out["miss_rate"] == 0.1
        assert out["lr"] == 0.0
        assert out["reject"] is False


class TestCucconi:
    def test_identical_sides_null(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(s, v) for s in (0, 1) for v in range(1, 11)]
        df = spark.createDataFrame(rows, "side int, v int")
        out = tc.cucconi_test(df, value_col="v",
                              split=F.col("side") == 0).collect()[0]
        assert abs(out["u"]) < 0.05 and abs(out["v"]) < 0.05
        assert out["c"] < 0.01
        assert out["p_approx"] > 0.99

    def test_location_shift_fires(self, spark):
        from zoi_spark import tablechecks as tc
        rows = ([(0, v) for v in range(1, 11)]
                + [(1, v + 100) for v in range(1, 11)])
        df = spark.createDataFrame(rows, "side int, v int")
        out = tc.cucconi_test(df, value_col="v",
                              split=F.col("side") == 0).collect()[0]
        assert out["c"] > 3.0 and out["p_approx"] < 0.05

    def test_pure_scale_change_fires(self, spark):
        from zoi_spark import tablechecks as tc
        a = [50 + d for d in (-2, -1, 0, 1, 2)] * 4
        b = [50 + d for d in (-40, -20, 0, 20, 40)] * 4
        rows = ([(0, v) for v in a] + [(1, v) for v in b])
        df = spark.createDataFrame(rows, "side int, v int")
        out = tc.cucconi_test(df, value_col="v",
                              split=F.col("side") == 0).collect()[0]
        assert out["c"] > 3.0        # same medians, spread differs


class TestWilsonInterval:
    def test_zero_successes_nonzero_upper(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("a", 0)] * 10
        df = spark.createDataFrame(rows, "g string, s int")
        out = tc.wilson_interval(df, group_col="g",
                                 success=F.col("s") == 1).collect()[0]
        zz = 1.959964 ** 2
        hi = (zz / 10) / (1 + zz / 10)
        assert out["p"] == 0.0 and out["lo"] == 0.0
        assert out["hi"] == round(hi, 6)     # Wald would say 0

    def test_symmetry(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("a", 1)] * 3 + [("a", 0)] * 7 \
            + [("b", 0)] * 3 + [("b", 1)] * 7
        df = spark.createDataFrame(rows, "g string, s int")
        out = {r["group"]: r for r in tc.wilson_interval(
            df, group_col="g", success=F.col("s") == 1).collect()}
        assert out["a"]["lo"] == round(1 - out["b"]["hi"], 6)
        assert out["a"]["hi"] == round(1 - out["b"]["lo"], 6)


class TestDistanceCorrelation:
    def test_perfect_linear_one(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(i, float(i), float(2 * i + 3)) for i in range(40)]
        df = spark.createDataFrame(rows, "i long, x double, y double")
        out = tc.distance_correlation(
            df, x_col="x", y_col="y", id_col="i", m=40).collect()[0]
        assert out["m"] == 40
        assert out["dcor"] == 1.0

    def test_constant_column_zero(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(i, float(i), 7.0) for i in range(20)]
        df = spark.createDataFrame(rows, "i long, x double, y double")
        out = tc.distance_correlation(
            df, x_col="x", y_col="y", id_col="i", m=20).collect()[0]
        assert out["dcor"] == 0.0 and out["dvar_y"] == 0.0

    def test_nonlinear_u_shape_detected(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(i, float(i - 20), float((i - 20) ** 2))
                for i in range(41)]
        df = spark.createDataFrame(rows, "i long, x double, y double")
        out = tc.distance_correlation(
            df, x_col="x", y_col="y", id_col="i", m=41).collect()[0]
        assert out["dcor"] > 0.3     # Pearson on this data is ~0


class TestFisherExact:
    def _df(self, spark, a, b, c, d):
        rows = ([(i, 1, 1) for i in range(a)]
                + [(100 + i, 1, 0) for i in range(b)]
                + [(200 + i, 0, 1) for i in range(c)]
                + [(300 + i, 0, 0) for i in range(d)])
        return spark.createDataFrame(rows, "id long, e int, o int")

    def test_tea_tasting(self, spark):
        from zoi_spark import tablechecks as tc
        out = tc.fisher_exact(
            self._df(spark, 3, 1, 1, 3),
            exposure=F.col("e") == 1, outcome=F.col("o") == 1,
            id_col="id", sample_m=100).collect()[0]
        # Fisher's lady-tasting-tea table: two-sided p = 0.485714
        assert out["p_two_sided"] == 0.485714
        assert (out["a"], out["b"], out["c"], out["d"]) == (3, 1, 1, 3)

    def test_perfect_separation(self, spark):
        from zoi_spark import tablechecks as tc
        out = tc.fisher_exact(
            self._df(spark, 5, 0, 0, 5),
            exposure=F.col("e") == 1, outcome=F.col("o") == 1,
            id_col="id", sample_m=100).collect()[0]
        # only the two extreme tables: p = 2/C(10,5) = 2/252
        assert out["p_two_sided"] == round(2 / 252, 6)

    def test_degenerate_support(self, spark):
        from zoi_spark import tablechecks as tc
        out = tc.fisher_exact(
            self._df(spark, 0, 4, 0, 4),
            exposure=F.col("e") == 1, outcome=F.col("o") == 1,
            id_col="id", sample_m=100).collect()[0]
        assert out["p_two_sided"] == 1.0     # no outcome column mass


class TestGKGamma:
    def test_hand_cells(self, spark):
        from zoi_spark import tablechecks as tc
        rows = ([(0, 0)] * 3 + [(0, 1)] * 1
                + [(1, 0)] * 1 + [(1, 1)] * 2)
        df = spark.createDataFrame(rows, "x int, y int")
        out = tc.gk_gamma(df, x_bin=F.col("x"),
                          y_bin=F.col("y")).collect()[0]
        assert out["concordant"] == 6 and out["discordant"] == 1
        assert out["gamma"] == round(5 / 7, 6)
        assert out["tau_c"] == round(20 / 49, 6)

    def test_perfect_order_agreement(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(i, i) for i in range(5) for _ in range(2)]
        df = spark.createDataFrame(rows, "x int, y int")
        out = tc.gk_gamma(df, x_bin=F.col("x"),
                          y_bin=F.col("y")).collect()[0]
        assert out["gamma"] == 1.0 and out["discordant"] == 0


class TestTheilsU:
    def test_perfect_dependence(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(c, c) for c in "aabbcc"]
        df = spark.createDataFrame(rows, "x string, y string")
        out = tc.theils_u(df, x_col="x", y_col="y").collect()[0]
        assert out["u_x_given_y"] == 1.0
        assert out["u_y_given_x"] == 1.0
        assert out["mi"] == out["h_x"] == out["h_y"]

    def test_independence_zero(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(x, y) for x in "ab" for y in "cd" for _ in range(3)]
        df = spark.createDataFrame(rows, "x string, y string")
        out = tc.theils_u(df, x_col="x", y_col="y").collect()[0]
        assert out["mi"] == 0.0
        assert out["u_x_given_y"] == 0.0


class TestBartlett:
    def test_equal_variances_near_zero(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(g, v) for g in "abc" for v in (1, 2, 3, 4, 5)]
        df = spark.createDataFrame(rows, "g string, v int")
        out = tc.bartlett_test(df, "v", by="g").collect()[0]
        assert out["k"] == 3 and out["n"] == 15
        assert out["t_stat"] == 0.0          # identical variances
        assert out["pooled_var"] == 2.5

    def test_hand_value_two_groups(self, spark):
        from zoi_spark import tablechecks as tc
        import math
        a = [1.0, 2.0, 3.0]          # s2 = 1
        b = [1.0, 5.0, 9.0]          # s2 = 16
        rows = [("a", v) for v in a] + [("b", v) for v in b]
        df = spark.createDataFrame(rows, "g string, v double")
        out = tc.bartlett_test(df, "v", by="g").collect()[0]
        sp2 = (2 * 1 + 2 * 16) / 4
        num = 4 * math.log(sp2) - (2 * math.log(1) + 2 * math.log(16))
        c = 1 + (1 / 2 + 1 / 2 - 1 / 4) / (3 * 1)
        assert out["pooled_var"] == sp2
        assert out["t_stat"] == round(num / c, 6)


class TestWelchAnova:
    def test_equal_means_zero_f(self, spark):
        from zoi_spark import tablechecks as tc
        rows = ([("a", v) for v in (1, 2, 3)]
                + [("b", v) for v in (0, 2, 4)]
                + [("c", v) for v in (-2, 2, 6)])
        df = spark.createDataFrame(rows, "g string, v int")
        out = tc.welch_anova(df, "v", by="g").collect()[0]
        assert out["k"] == 3 and out["df1"] == 2
        assert out["f_stat"] == 0.0          # all means = 2

    def test_separated_means_fire(self, spark):
        from zoi_spark import tablechecks as tc
        rows = ([("a", v) for v in (1, 2, 3)]
                + [("b", v) for v in (101, 102, 103)]
                + [("c", v) for v in (201, 202, 203)])
        df = spark.createDataFrame(rows, "g string, v int")
        out = tc.welch_anova(df, "v", by="g").collect()[0]
        assert out["f_stat"] > 1000
        assert out["df2"] > 0


class TestBernoulliEProcess:
    def _df(self, spark, day_specs):
        import datetime as dt
        rows, eid = [], 0
        for day, (n, k) in enumerate(day_specs):
            for i in range(n):
                rows.append((eid, dt.datetime(2024, 5, day + 1),
                             1 if i < k else 0))
                eid += 1
        return spark.createDataFrame(rows,
                                     "id long, ts timestamp, s int")

    def test_drifted_rate_rejects_and_latches(self, spark):
        from zoi_spark import tablechecks as tc
        import math
        df = self._df(spark, [(10, 9), (10, 10), (10, 5)])
        out = tc.bernoulli_eprocess(
            df, ts_col="ts", success=F.col("s") == 1,
            p0=0.5, lam=0.5).orderBy("bucket_ts").collect()
        up, dn = math.log(1.25), math.log(0.75)
        assert out[0]["ln_e"] == round(9 * up + dn, 6)
        assert out[1]["ln_e"] == round(19 * up + dn, 6)
        assert [r["rejected"] for r in out] == [False, True, True]
        # day 3 is at-null but the rejection LATCHES

    def test_null_rate_stays_quiet(self, spark):
        from zoi_spark import tablechecks as tc
        df = self._df(spark, [(10, 5)] * 5)
        out = tc.bernoulli_eprocess(
            df, ts_col="ts", success=F.col("s") == 1,
            p0=0.5, lam=0.5).collect()
        assert not any(r["rejected"] for r in out)

    def test_bad_lambda_raises(self, spark):
        from zoi_spark import tablechecks as tc
        import pytest as pt
        df = self._df(spark, [(2, 1)])
        with pt.raises(ValueError):
            tc.bernoulli_eprocess(df, ts_col="ts",
                                  success=F.col("s") == 1,
                                  p0=0.5, lam=2.5)


class TestBenfordMAD:
    def test_log_uniform_conforms(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(i, 10.0 ** (1 + i / 2000.0)) for i in range(2000)]
        df = spark.createDataFrame(rows, "i long, value double")
        out = tc.benford_mad(df, "value").collect()[0]
        assert out["mad"] < 0.0012       # stratified log-uniform
        assert out["conformity"] in ("close", "acceptable")

    def test_constant_digits_nonconforming(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(i, 42.0 + i * 0.001) for i in range(500)]
        df = spark.createDataFrame(rows, "i long, value double")
        out = tc.benford_mad(df, "value").collect()[0]
        assert out["conformity"] == "nonconforming"
        assert out["worst_digit"] == 42


class TestPChart:
    def test_spike_day_flagged(self, spark):
        from zoi_spark import tablechecks as tc
        import datetime as dt, math
        rows, eid = [], 0
        for day in range(10):
            k = 50 if day == 7 else 20
            for i in range(100):
                rows.append((eid, dt.datetime(2024, 6, day + 1),
                             1 if i < k else 0))
                eid += 1
        df = spark.createDataFrame(rows,
                                   "id long, ts timestamp, s int")
        out = tc.p_chart(df, ts_col="ts",
                         success=F.col("s") == 1).collect()
        flags = [r["out_of_control"] for r in out]
        assert flags == [False] * 7 + [True] + [False] * 2
        pbar = 230 / 1000
        half = 3 * math.sqrt(pbar * (1 - pbar) / 100)
        assert out[0]["ucl"] == round(pbar + half, 6)


def _daily_events(spark, counts_by_type):
    """counts_by_type: list over days of {type: count} dicts."""
    import datetime as dt
    rows, eid = [], 0
    for day, spec in enumerate(counts_by_type):
        for typ, n in spec.items():
            for _ in range(n):
                rows.append((eid, dt.datetime(2024, 7, day + 1, 12),
                             typ))
                eid += 1
    return spark.createDataFrame(rows,
                                 "id long, ts timestamp, t string")


class TestSeasonalStrength:
    def test_pure_sawtooth_plus_trend(self, spark):
        from zoi_spark import tablechecks as tc
        days = [{"e": 10 * (i % 7) + i + 5} for i in range(21)]
        df = _daily_events(spark, days)
        out = tc.seasonal_strength(df, ts_col="ts",
                                   period=7).collect()[0]
        # centered MA(7) removes the sawtooth exactly: remainder 0
        assert out["seasonal_strength"] == 1.0
        assert out["trend_strength"] == 1.0
        assert out["n_buckets"] == 21 and out["n_used"] == 15

    def test_values_bounded(self, spark):
        from zoi_spark import tablechecks as tc
        vals = [13, 7, 19, 4, 16, 9, 21, 6, 14, 8, 17, 5, 20, 11]
        df = _daily_events(spark, [{"e": v} for v in vals])
        out = tc.seasonal_strength(df, ts_col="ts",
                                   period=7).collect()[0]
        assert 0.0 <= out["seasonal_strength"] <= 1.0
        assert 0.0 <= out["trend_strength"] <= 1.0


class TestHurstRS:
    def test_ramp_persistent(self, spark):
        from zoi_spark import tablechecks as tc
        df = _daily_events(spark, [{"e": i + 1} for i in range(30)])
        out = tc.hurst_rs(df, ts_col="ts",
                          block_sizes=(5, 10, 15)).collect()[0]
        assert out["hurst"] > 0.8        # trending series
        assert out["n_sizes"] == 3

    def test_alternating_antipersistent(self, spark):
        from zoi_spark import tablechecks as tc
        df = _daily_events(spark,
                           [{"e": 5 if i % 2 == 0 else 15}
                            for i in range(30)])
        out = tc.hurst_rs(df, ts_col="ts",
                          block_sizes=(5, 10, 15)).collect()[0]
        assert out["hurst"] < 0.3        # mean-reverting series


class TestGrangerLag1:
    def test_perfect_lead_fires(self, spark):
        from zoi_spark import tablechecks as tc
        x = [7, 3, 11, 5, 13, 2, 9, 6, 12, 4, 10, 8, 14, 3, 7]
        days = []
        for i in range(len(x)):
            days.append({"click": x[i],
                         "purchase": x[i - 1] if i > 0 else 5})
        df = _daily_events(spark, days)
        out = tc.granger_lag1(
            df, ts_col="ts",
            y_on=F.col("t") == "purchase",
            x_on=F.col("t") == "click").collect()[0]
        # y_t = x_{t-1} exactly: unrestricted RSS collapses; F is
        # either astronomically large or NULL ("unbounded evidence")
        assert out["rss_u"] < 1e-6
        assert out["f_stat"] is None or out["f_stat"] > 1000
        assert out["n"] == len(x) - 1

    def test_rss_ordering(self, spark):
        from zoi_spark import tablechecks as tc
        y = [6, 8, 5, 9, 7, 6, 8, 4, 9, 7, 5, 8, 6, 9]
        x = [3, 7, 2, 8, 4, 6, 3, 7, 5, 2, 8, 4, 6, 3]
        days = [{"purchase": y[i], "click": x[i]}
                for i in range(len(y))]
        df = _daily_events(spark, days)
        out = tc.granger_lag1(
            df, ts_col="ts",
            y_on=F.col("t") == "purchase",
            x_on=F.col("t") == "click").collect()[0]
        assert 0 <= out["rss_u"] <= out["rss_r"]
        assert out["f_stat"] >= 0


class TestCochranArmitageLen:
    # exercises the SHARED cochran_armitage operator (also driven by
    # error_rate_trend) through the length-level query's shape
    def test_rising_rates_hand_value(self, spark):
        from zoi_spark import tablechecks as tc
        import math
        rows = ([(0, 1)] * 1 + [(0, 0)] * 9
                + [(1, 1)] * 5 + [(1, 0)] * 5
                + [(2, 1)] * 9 + [(2, 0)] * 1)
        df = spark.createDataFrame(rows, "sc int, y int")
        out = tc.cochran_armitage(
            df, flag=F.col("y") == 1,
            score=F.col("sc")).collect()[0]
        # T = 23 - 0.5*30 = 8, Var = 5 -> Z = 8/sqrt(5)
        assert out["t_stat"] == 8.0
        assert out["var_t"] == 5.0
        assert out["z"] == round(8 / math.sqrt(5), 6)
        assert out["n"] == 30 and out["x"] == 15

    def test_flat_rates_zero(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(sc, y) for sc in range(3)
                for y in ([1] * 4 + [0] * 6)]
        df = spark.createDataFrame(rows, "sc int, y int")
        out = tc.cochran_armitage(
            df, flag=F.col("y") == 1,
            score=F.col("sc")).collect()[0]
        assert out["z"] == 0.0


class TestQuade:
    def test_hand_blocks(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("b1", "A", 1), ("b1", "B", 2),
                ("b2", "A", 1), ("b2", "B", 3),
                ("b3", "A", 5), ("b3", "B", 4)]
        df = spark.createDataFrame(rows, "blk string, trt string, v int")
        out = tc.quade_test(df, block_col="blk", treat_col="trt",
                            value_col="v").collect()[0]
        # A=108, B=24 -> F = 2*24/84
        assert out["b"] == 3 and out["k"] == 2
        assert out["f_stat"] == round(48 / 84, 6)
        assert out["df1"] == 1 and out["df2"] == 2

    def test_incomplete_block_dropped(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("b1", "A", 1), ("b1", "B", 2),
                ("b2", "A", 1), ("b2", "B", 3),
                ("b3", "A", 5), ("b3", "B", 4),
                ("b4", "A", 9)]                  # B missing
        df = spark.createDataFrame(rows, "blk string, trt string, v int")
        out = tc.quade_test(df, block_col="blk", treat_col="trt",
                            value_col="v").collect()[0]
        assert out["b"] == 3                     # b4 excluded


class TestBWS:
    def test_identical_sides_small(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(s, v) for s in (0, 1) for v in range(1, 21)]
        df = spark.createDataFrame(rows, "side int, v int")
        out = tc.bws_test(df, value_col="v",
                          split=F.col("side") == 0).collect()[0]
        assert out["b_a"] == out["b_b"]          # symmetric layout
        assert out["b"] < 0.5

    def test_separated_sides_fire(self, spark):
        from zoi_spark import tablechecks as tc
        rows = ([(0, v) for v in range(1, 21)]
                + [(1, v + 100) for v in range(1, 21)])
        df = spark.createDataFrame(rows, "side int, v int")
        out = tc.bws_test(df, value_col="v",
                          split=F.col("side") == 0).collect()[0]
        assert out["b"] > 5.0                    # ~B critical is 2.5


class TestBurstiness:
    def _df(self, spark, per_user_ts):
        import datetime as dt
        rows, eid = [], 0
        for uid, seconds in per_user_ts.items():
            for s in seconds:
                rows.append((eid, uid,
                             dt.datetime(2024, 8, 1) +
                             dt.timedelta(seconds=s)))
                eid += 1
        return spark.createDataFrame(rows,
                                     "id long, user_id long, ts timestamp")

    def test_metronome_negative_one(self, spark):
        from zoi_spark import tablechecks as tc
        df = self._df(spark, {1: [0, 10, 20, 30, 40, 50]})
        out = tc.burstiness(df, entity_col="user_id",
                            ts_col="ts").collect()[0]
        # constant gaps: sigma = 0 -> B = -1
        assert out["mean_b"] == -1.0
        assert out["n_entities"] == 1

    def test_bursty_positive(self, spark):
        from zoi_spark import tablechecks as tc
        # long silences with tight bursts: sigma >> mu
        ts = [0, 1, 2, 3, 10000, 10001, 10002, 20000, 20001]
        df = self._df(spark, {1: ts})
        out = tc.burstiness(df, entity_col="user_id",
                            ts_col="ts").collect()[0]
        assert out["mean_b"] > 0.2

    def test_quartiles_ordered(self, spark):
        from zoi_spark import tablechecks as tc
        users = {1: [0, 10, 20, 30], 2: [0, 1, 2, 9000],
                 3: [0, 5, 11, 18], 4: [0, 100, 101, 300]}
        df = self._df(spark, users)
        out = tc.burstiness(df, entity_col="user_id",
                            ts_col="ts").collect()[0]
        assert out["n_entities"] == 4
        assert out["p25_b"] <= out["p50_b"] <= out["p75_b"]


class TestPickands:
    def test_exponential_like_near_zero(self, spark):
        from zoi_spark import tablechecks as tc
        import math
        # exact exponential quantiles: x_i = -ln(1 - i/(n+1)); the
        # Pickands estimator on true exponential order stats is ~0
        n = 400
        rows = [(i, -math.log(1 - (i + 1) / (n + 1)))
                for i in range(n)]
        df = spark.createDataFrame(rows, "i long, v double")
        out = tc.pickands_tail(df, "v", k=25).collect()[0]
        assert abs(out["xi"]) < 0.15
        assert out["x_k"] > out["x_2k"] > out["x_4k"]

    def test_heavy_pareto_positive(self, spark):
        from zoi_spark import tablechecks as tc
        n = 400
        # Pareto(alpha=1) quantiles: x = 1/(1-p) -> xi = 1
        rows = [(i, 1.0 / (1 - (i + 1) / (n + 1.0)))
                for i in range(n)]
        df = spark.createDataFrame(rows, "i long, v double")
        out = tc.pickands_tail(df, "v", k=25).collect()[0]
        assert 0.7 < out["xi"] < 1.3

    def test_too_few_rows_raises(self, spark):
        from zoi_spark import tablechecks as tc
        import pytest as pt
        df = spark.createDataFrame([(i, float(i)) for i in range(50)],
                                   "i long, v double")
        with pt.raises(ValueError):
            tc.pickands_tail(df, "v", k=25)


class TestExtremalIndex:
    def _df(self, spark, daily_counts):
        import datetime as dt
        rows, eid = [], 0
        for day, n in enumerate(daily_counts):
            for _ in range(n):
                rows.append((eid, dt.datetime(2024, 9, day + 1)))
                eid += 1
        return spark.createDataFrame(rows, "id long, ts timestamp")

    def test_isolated_extremes_theta_one(self, spark):
        from zoi_spark import tablechecks as tc
        counts = [5, 5, 50, 5, 5, 5, 60, 5, 5, 5, 55, 5]
        df = self._df(spark, counts)
        out = tc.extremal_index(df, ts_col="ts", q=0.7,
                                run=1).collect()[0]
        assert out["theta"] == 1.0          # every storm length 1
        assert out["n_exceed"] == out["n_clusters"] == 3

    def test_storms_lower_theta(self, spark):
        from zoi_spark import tablechecks as tc
        counts = [5, 50, 55, 60, 5, 5, 5, 52, 58, 5, 5, 5]
        df = self._df(spark, counts)
        out = tc.extremal_index(df, ts_col="ts", q=0.6,
                                run=1).collect()[0]
        # threshold u=50 (type-1 q60): 4 strict exceedances
        # (55,60 | 52,58) in 2 storms
        assert out["n_exceed"] == 4
        assert out["n_clusters"] == 2
        assert out["theta"] == 0.5


class TestMeanExcess:
    def test_exponential_flat(self, spark):
        from zoi_spark import tablechecks as tc
        import math
        n = 2000
        rows = [(i, -100.0 * math.log(1 - (i + 1) / (n + 1)))
                for i in range(n)]
        df = spark.createDataFrame(rows, "i long, v double")
        out = tc.mean_excess(df, "v").collect()
        assert [r["p"] for r in out] == [0.5, 0.6, 0.7, 0.8, 0.9]
        es = [r["mean_excess"] for r in out]
        # memoryless: e(u) ~ constant (the exponential mean, 100)
        assert all(80 < e < 120 for e in es)

    def test_bounded_tail_falls(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(i, float(i)) for i in range(1000)]   # uniform
        df = spark.createDataFrame(rows, "i long, v double")
        out = tc.mean_excess(df, "v").collect()
        es = [r["mean_excess"] for r in out]
        assert es == sorted(es, reverse=True)  # strictly decreasing


class TestSkyline2:
    def test_hand_frontier(self, spark):
        from zoi_spark import tablechecks as tc
        pts = [(1, 1, 9), (2, 5, 5), (3, 9, 1),     # frontier
               (4, 4, 4), (5, 1, 8), (6, 9, 1)]     # 6 ties with 3
        df = spark.createDataFrame(pts, "id long, x long, y long")
        out = tc.skyline2(df, x_col="x", y_col="y",
                          id_col="id").collect()
        ids = sorted(r["id"] for r in out)
        # (4,4) dominated by (5,5); (1,8) by (1,9); duplicate (9,1)
        # points are mutually non-dominating: both kept
        assert ids == [1, 2, 3, 6]

    def test_single_max_dominates_all(self, spark):
        from zoi_spark import tablechecks as tc
        pts = [(i, i, i) for i in range(10)]
        df = spark.createDataFrame(pts, "id long, x long, y long")
        out = tc.skyline2(df, x_col="x", y_col="y",
                          id_col="id").collect()
        assert [r["id"] for r in out] == [9]


class TestCIFCompeting:
    def test_hand_curve(self, spark):
        from zoi_spark import tablechecks as tc
        import datetime as dt
        # day1: 2 purchases + 2 churns of 10 users; day2: 1 + 1
        rows = []
        eid = 0
        def ev(uid, day, typ):
            nonlocal eid
            rows.append((eid, uid, dt.datetime(2024, 10, day), typ))
            eid += 1
        for u in range(2): ev(u, 1, "purchase")
        for u in range(2, 4): ev(u, 1, "click")
        ev(4, 2, "purchase"); ev(5, 2, "click")
        for u in range(6, 10): ev(u, 3, "click")
        df = spark.createDataFrame(
            rows, "id long, user_id long, ts timestamp, t string")
        out = tc.cif_competing(
            df, entity_col="user_id", ts_col="ts",
            cause=F.col("t") == "purchase").collect()
        # day1: n=10, d1=2 -> CIF 0.2; day2: S=0.6, d1=1/6 -> +0.1
        assert out[0]["cif"] == 0.2
        assert out[1]["cif"] == round(0.2 + 0.6 * (1 / 6), 6)
        assert out[2]["d_cause"] == 0
        assert out[2]["cif"] == out[1]["cif"]    # no more purchases

    def test_same_day_cause_priority(self, spark):
        from zoi_spark import tablechecks as tc
        import datetime as dt
        rows = [(0, 1, dt.datetime(2024, 10, 1, 9), "click"),
                (1, 1, dt.datetime(2024, 10, 1, 15), "purchase")]
        df = spark.createDataFrame(
            rows, "id long, user_id long, ts timestamp, t string")
        out = tc.cif_competing(
            df, entity_col="user_id", ts_col="ts",
            cause=F.col("t") == "purchase").collect()
        # same-bucket tie resolves to the cause (documented rule)
        assert out[0]["d_cause"] == 1 and out[0]["d_other"] == 0


class TestLorenzAsymmetry:
    def test_few_giants_above_one(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("a", v) for v in [1.0] * 9 + [100.0]]
        df = spark.createDataFrame(rows, "g string, v double")
        out = tc.lorenz_asymmetry(df, "v", by="g").collect()[0]
        assert out["s_asym"] > 1.0       # one giant drives it

    def test_many_tiny_below_one(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("a", v) for v in [1.0] * 3 + [50.0] * 7]
        df = spark.createDataFrame(rows, "g string, v double")
        out = tc.lorenz_asymmetry(df, "v", by="g").collect()[0]
        assert out["s_asym"] < 1.0       # a tiny-values foot

    def test_hand_delta(self, spark):
        from zoi_spark import tablechecks as tc
        vals = [1.0, 2.0, 3.0, 10.0]     # mean 4, m=3, xm=3, xm1=10
        df = spark.createDataFrame([("a", v) for v in vals],
                                   "g string, v double")
        out = tc.lorenz_asymmetry(df, "v", by="g").collect()[0]
        delta = (4 - 3) / (10 - 3)
        f_mu = (3 + delta) / 4
        l_mu = (6 + delta * 10) / 16
        assert out["f_mu"] == round(f_mu, 6)
        assert out["l_mu"] == round(l_mu, 6)
        assert out["s_asym"] == round(f_mu + l_mu, 6)


class TestCoxStuart:
    def test_monotone_trend(self, spark):
        from zoi_spark import tablechecks as tc
        df = _daily_events(spark, [{"e": i + 1} for i in range(20)])
        out = tc.cox_stuart(df, ts_col="ts").collect()[0]
        # every later-half value beats its pair: S+ = m = 10
        assert out["m"] == 10 and out["s_plus"] == 10
        assert out["z"] == round((10 - 5) / (10 / 4) ** 0.5, 6)

    def test_flat_series_ties_dropped(self, spark):
        from zoi_spark import tablechecks as tc
        df = _daily_events(spark, [{"e": 7}] * 12)
        out = tc.cox_stuart(df, ts_col="ts").collect()[0]
        assert out["m"] == 0 and out["s_plus"] == 0
        assert out["z"] is None


class TestBartelsRank:
    def test_alternating_oscillation_high(self, spark):
        from zoi_spark import tablechecks as tc
        df = _daily_events(spark,
                           [{"e": 5 if i % 2 == 0 else 20}
                            for i in range(16)])
        out = tc.bartels_rank(df, ts_col="ts").collect()[0]
        assert out["rvn"] > 3.0 and out["z"] > 2.0

    def test_trend_low(self, spark):
        from zoi_spark import tablechecks as tc
        df = _daily_events(spark, [{"e": i + 1} for i in range(16)])
        out = tc.bartels_rank(df, ts_col="ts").collect()[0]
        # monotone ranks: successive diffs are minimal -> RVN << 2
        assert out["rvn"] < 0.5 and out["z"] < -2.0


class TestJamesStein:
    def test_hand_shrinkage(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("a", 0.0), ("a", 2.0), ("b", 10.0), ("b", 12.0),
                ("c", 20.0), ("c", 22.0), ("d", 30.0), ("d", 32.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = {r["group"]: r for r in tc.james_stein(
            df, "v", by="g").collect()}
        # V = 1, mu = 16, ssb = 500 -> c = 1 - 1/500
        c = 1 - 1 / 500
        assert out["a"]["shrinkage_c"] == round(c, 6)
        assert out["a"]["js_mean"] == round(16 + c * (1 - 16), 6)
        assert out["d"]["js_mean"] == round(16 + c * (31 - 16), 6)

    def test_equal_means_full_shrink(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(g, v) for g in "abcd" for v in (4.0, 6.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = tc.james_stein(df, "v", by="g").collect()
        assert all(r["shrinkage_c"] == 0.0 for r in out)
        assert all(r["js_mean"] == 5.0 for r in out)


class TestOBFBoundaries:
    def test_extreme_first_day_crosses_and_latches(self, spark):
        from zoi_spark import tablechecks as tc
        import datetime as dt
        rows = []
        eid = 0
        for i in range(100):      # day 1: all successes
            rows.append((eid, dt.datetime(2024, 11, 1), 1)); eid += 1
        for i in range(100):      # day 2: balanced
            rows.append((eid, dt.datetime(2024, 11, 2), i % 2))
            eid += 1
        df = spark.createDataFrame(rows, "id long, ts timestamp, s int")
        out = tc.obf_boundaries(
            df, ts_col="ts", success=F.col("s") == 1,
            p0=0.5).collect()
        # day1: z = 50/5 = 10 vs bound 1.959964/sqrt(.5) = 2.77
        assert out[0]["z"] == 10.0
        assert out[0]["crossed"] is True
        assert out[1]["crossed"] is True      # latched

    def test_null_rate_never_crosses(self, spark):
        from zoi_spark import tablechecks as tc
        import datetime as dt
        rows = [(d * 100 + i, dt.datetime(2024, 11, d + 1), i % 2)
                for d in range(5) for i in range(40)]
        df = spark.createDataFrame(rows, "id long, ts timestamp, s int")
        out = tc.obf_boundaries(
            df, ts_col="ts", success=F.col("s") == 1,
            p0=0.5).collect()
        assert not any(r["crossed"] for r in out)


class TestOtsuThreshold:
    def test_bimodal_split(self, spark):
        from zoi_spark import tablechecks as tc
        vals = [10, 11, 12, 13, 14] * 10 + [90, 91, 92, 93, 94] * 10
        df = spark.createDataFrame([(i, v) for i, v in
                                    enumerate(vals)], "i long, v int")
        out = tc.otsu_threshold(df, "v").collect()[0]
        assert 14 <= out["threshold"] < 90     # cut in the valley
        assert out["mu0"] == 12.0 and out["mu1"] == 92.0
        assert out["w0"] == 0.5

    def test_tie_takes_smallest(self, spark):
        from zoi_spark import tablechecks as tc
        df = spark.createDataFrame([(0, 1), (1, 1), (2, 9), (3, 9)],
                                   "i long, v int")
        out = tc.otsu_threshold(df, "v").collect()[0]
        assert out["threshold"] == 1


class TestSpectralEntropy:
    def test_pure_cycle_low(self, spark):
        from zoi_spark import tablechecks as tc
        import math
        days = [{"e": 50 + int(40 * math.sin(2 * math.pi * i / 7))}
                for i in range(28)]
        df = _daily_events(spark, days)
        out = tc.spectral_entropy(df, ts_col="ts",
                                  max_freq=10).collect()[0]
        assert out["peak_freq"] == 4          # 28/7 cycles
        assert out["peak_share"] > 0.8
        assert out["entropy"] < 0.4

    def test_irregular_high(self, spark):
        from zoi_spark import tablechecks as tc
        vals = [13, 7, 29, 4, 16, 9, 21, 6, 14, 31, 8, 17,
                5, 20, 11, 26, 3, 18, 12, 24, 7, 15, 28, 9]
        df = _daily_events(spark, [{"e": v} for v in vals])
        out = tc.spectral_entropy(df, ts_col="ts",
                                  max_freq=10).collect()[0]
        assert out["entropy"] > 0.7


class TestPermutationEntropy:
    def test_monotone_ramp_zero(self, spark):
        from zoi_spark import tablechecks as tc
        df = _daily_events(spark, [{"e": i + 1} for i in range(20)])
        out = tc.permutation_entropy(df, ts_col="ts").collect()[0]
        assert out["perm_entropy"] == 0.0     # only pattern '012'
        assert out["modal_pattern"] == "012"
        assert out["n_patterns_seen"] == 1

    def test_alternation_two_patterns(self, spark):
        from zoi_spark import tablechecks as tc
        import math
        df = _daily_events(spark,
                           [{"e": 5 if i % 2 == 0 else 15}
                            for i in range(20)])
        out = tc.permutation_entropy(df, ts_col="ts").collect()[0]
        # strict alternation: only '102' and '120'... exactly two
        # patterns with equal mass -> H = ln2/ln6
        assert out["n_patterns_seen"] == 2
        assert out["perm_entropy"] == round(math.log(2)
                                            / math.log(6), 6)


class TestWeibullFit:
    def _df_from_gaps(self, spark, gaps):
        import datetime as dt
        t, rows, eid = 0, [], 0
        base = dt.datetime(2024, 12, 1)
        rows.append((eid, 1, base)); eid += 1
        for g in gaps:
            t += g
            rows.append((eid, 1,
                         base + dt.timedelta(seconds=t))); eid += 1
        return spark.createDataFrame(
            rows, "id long, user_id long, ts timestamp")

    def test_exponential_gaps_shape_one(self, spark):
        from zoi_spark import tablechecks as tc
        import math
        n = 300
        gaps = [max(1, int(round(-1000 * math.log(1 - (i + 1)
                                                  / (n + 1)))))
                for i in range(n)]
        df = self._df_from_gaps(spark, gaps)
        out = tc.weibull_fit(df, entity_col="user_id",
                             ts_col="ts").collect()[0]
        assert 0.85 < out["shape"] < 1.15     # memoryless
        assert out["r2"] > 0.95

    def test_bursty_mixture_shape_below_one(self, spark):
        from zoi_spark import tablechecks as tc
        gaps = ([1, 2, 3] * 40) + ([9000, 11000, 13000] * 10)
        df = self._df_from_gaps(spark, gaps)
        out = tc.weibull_fit(df, entity_col="user_id",
                             ts_col="ts").collect()[0]
        assert out["shape"] < 0.6             # heavy silence tail


class TestDiscordWeek:
    def test_anomalous_week_found(self, spark):
        from zoi_spark import tablechecks as tc
        # weekly ramp, one REVERSED week in the middle (the ramp
        # is asymmetric, so the reversal is a genuine shape change)
        vals = []
        for wk in range(4):
            base = [5, 10, 15, 20, 25, 30, 35]
            vals.extend(base[::-1] if wk == 2 else base)
        df = _daily_events(spark, [{"e": v} for v in vals])
        out = tc.discord_week(df, ts_col="ts", w=7).collect()[0]
        # windows aligned to the reversed week correlate worst
        assert 8 <= out["discord_start"] <= 20
        assert out["motif_corr"] > 0.99   # two identical ramps
        assert out["discord_best_corr"] < 0.9

    def test_pure_cycle_motif_perfect(self, spark):
        from zoi_spark import tablechecks as tc
        vals = [5, 9, 14, 20, 14, 9, 5] * 4
        df = _daily_events(spark, [{"e": v} for v in vals])
        out = tc.discord_week(df, ts_col="ts", w=7).collect()[0]
        assert out["motif_corr"] == 1.0
        assert out["n_windows"] == 22


class TestGorillaTsBits:
    def test_metronome_one_bit(self, spark):
        from zoi_spark import tablechecks as tc
        import datetime as dt
        rows = [(i, 1, dt.datetime(2024, 12, 1)
                 + dt.timedelta(seconds=60 * i)) for i in range(50)]
        df = spark.createDataFrame(rows,
                                   "id long, user_id long, ts timestamp")
        out = tc.gorilla_ts_bits(df, entity_col="user_id",
                                 ts_col="ts").collect()[0]
        assert out["bits_per_event"] == 1.0   # dod = 0 throughout
        assert out["ratio_vs_64bit"] == 64.0
        assert out["share_zero_dod"] == 1.0

    def test_bit_classes_hand(self, spark):
        from zoi_spark import tablechecks as tc
        import datetime as dt
        # gaps 10, 10, 74, 74, 374, 374: dods 0, 64, 0, 300, 0
        gaps = [10, 10, 74, 74, 374, 374]
        t, ts = 0, []
        for g in gaps:
            t += g
            ts.append(t)
        rows = [(i, 1, dt.datetime(2024, 12, 1)
                 + dt.timedelta(seconds=s))
                for i, s in enumerate([0] + ts)]
        df = spark.createDataFrame(rows,
                                   "id long, user_id long, ts timestamp")
        out = tc.gorilla_ts_bits(df, entity_col="user_id",
                                 ts_col="ts").collect()[0]
        # bits: 1 + 9 + 1 + 16 + 1 = 28 over 5 dods
        assert out["n_events"] == 5
        assert out["bits_total"] == 28


class TestSessionDepth:
    def test_deterministic_chain(self, spark):
        from zoi_spark import tablechecks as tc
        import datetime as dt
        rows = []
        eid = 0
        for u in range(5):
            for j, s in enumerate(["A", "B", "C"]):
                rows.append((eid, u, dt.datetime(2024, 12, 1, j), s))
                eid += 1
        df = spark.createDataFrame(
            rows, "id long, user_id long, ts timestamp, t string")
        out = {r["state"]: r for r in tc.session_depth(
            df, entity_col="user_id", ts_col="ts", type_col="t",
            horizon=4).collect()}
        assert out["A"]["v"] == 2.0
        assert out["B"]["v"] == 1.0
        assert out["C"]["v"] == 0.0
        assert out["C"]["p_end"] == 1.0
        assert out["A"]["p_end"] == 0.0

    def test_horizon_truncates(self, spark):
        from zoi_spark import tablechecks as tc
        import datetime as dt
        # a 6-step chain: horizon 4 must report at most 4 from the head
        rows = []
        for j, s in enumerate("ABCDEF"):
            rows.append((j, 1, dt.datetime(2024, 12, 1, j), s))
        df = spark.createDataFrame(
            rows, "id long, user_id long, ts timestamp, t string")
        out = {r["state"]: r["v"] for r in tc.session_depth(
            df, entity_col="user_id", ts_col="ts", type_col="t",
            horizon=4).collect()}
        assert out["A"] == 4.0                # truncated lower bound
        assert out["C"] == 3.0


class TestSchemaMatch:
    def test_value_overlap_ranks(self, spark):
        from zoi_spark import tablechecks as tc
        a = spark.createDataFrame([(1,), (2,), (3,)], "k long")
        b = spark.createDataFrame([(2,), (3,), (4,)], "k long")
        c = spark.createDataFrame([("x",), ("y",)], "k string")
        out = tc.schema_match([("a.k", a, "k"), ("b.k", b, "k"),
                               ("c.k", c, "k")]).collect()
        top = out[0]
        assert (top["col_a"], top["col_b"]) == ("a.k", "b.k")
        assert top["jaccard"] == 0.5          # {2,3} of {1,2,3,4}
        assert all(r["jaccard"] == 0.0 for r in out[1:])

    def test_duplicate_label_raises(self, spark):
        from zoi_spark import tablechecks as tc
        import pytest as pt
        df = spark.createDataFrame([(1,)], "k long")
        with pt.raises(ValueError):
            tc.schema_match([("x", df, "k"), ("x", df, "k")])


class TestMarkovDrift:
    def _df(self, spark, phase_chains):
        import datetime as dt
        rows, eid = [], 0
        for phase, chains in enumerate(phase_chains):
            day0 = dt.datetime(2024, 1, 2 if phase == 0 else 20)
            for u, chain in enumerate(chains):
                uid = phase * 1000 + u
                for j, s in enumerate(chain):
                    rows.append((eid, uid,
                                 day0 + dt.timedelta(minutes=j), s))
                    eid += 1
        return spark.createDataFrame(
            rows, "id long, user_id long, ts timestamp, t string")

    def test_flipped_dynamics_max_jsd(self, spark):
        from zoi_spark import tablechecks as tc
        import math
        df = self._df(spark, [["AB"] * 5, ["AC"] * 5])
        out = {r["state"]: r for r in tc.markov_drift(
            df, entity_col="user_id", ts_col="ts", type_col="t",
            split=F.col("ts") < F.lit("2024-01-16")
            .cast("timestamp")).collect()}
        # A -> B always in phase 1, A -> C always in phase 2
        assert out["A"]["jsd"] == round(math.log(2), 6)
        assert out["A"]["n_1"] == 5 and out["A"]["n_2"] == 5

    def test_identical_dynamics_zero(self, spark):
        from zoi_spark import tablechecks as tc
        df = self._df(spark, [["ABAB"] * 4, ["ABAB"] * 4])
        out = {r["state"]: r["jsd"] for r in tc.markov_drift(
            df, entity_col="user_id", ts_col="ts", type_col="t",
            split=F.col("ts") < F.lit("2024-01-16")
            .cast("timestamp")).collect()}
        assert all(v == 0.0 for v in out.values())


class TestHuberLocation:
    def test_outlier_resistant_hand_value(self, spark):
        from zoi_spark import tablechecks as tc
        vals = list(range(1, 10)) + [1000]
        df = spark.createDataFrame([("a", float(v)) for v in vals],
                                   "g string, v double")
        out = tc.huber_location(df, "v", by="g").collect()[0]
        # med 5, mad 2; sum psi = 1.345, 5 inliers -> 5 + 2*.269
        assert out["median"] == 5.0 and out["mad"] == 2.0
        assert out["huber"] == round(5 + 2 * 1.345 / 5, 6)
        assert out["mean"] == 104.5          # what we escaped

    def test_zero_mad_falls_back_to_median(self, spark):
        from zoi_spark import tablechecks as tc
        vals = [7.0] * 9 + [100.0]
        df = spark.createDataFrame([("a", v) for v in vals],
                                   "g string, v double")
        out = tc.huber_location(df, "v", by="g").collect()[0]
        assert out["mad"] == 0.0
        assert out["huber"] == 7.0


class TestLMoments:
    def test_symmetric_sample_exact(self, spark):
        from zoi_spark import tablechecks as tc
        df = spark.createDataFrame([("a", float(v))
                                    for v in range(1, 10)],
                                   "g string, v double")
        out = tc.lmoments(df, "v", by="g").collect()[0]
        assert out["l1"] == 5.0
        # sample L-scale of 1..n = gini-mean-diff/2 = (n+1)/6
        assert out["l2"] == round(10 / 6, 6)
        assert out["t3"] == 0.0              # exact symmetry

    def test_right_skew_positive_t3(self, spark):
        from zoi_spark import tablechecks as tc
        vals = [1.0] * 8 + [10.0, 100.0]
        df = spark.createDataFrame([("a", v) for v in vals],
                                   "g string, v double")
        out = tc.lmoments(df, "v", by="g").collect()[0]
        assert out["t3"] > 0.5


class TestCalibrationSlope:
    def test_perfect_calibration(self, spark):
        from zoi_spark import tablechecks as tc
        rows = ([(0.2, 0)] * 4 + [(0.2, 1)]
                + [(0.8, 1)] * 4 + [(0.8, 0)])
        df = spark.createDataFrame(rows, "p double, y int")
        out = tc.calibration_slope(df, prob_col="p",
                                   label_col="y").collect()[0]
        assert out["slope"] == 1.0
        assert out["intercept"] == 0.0
        assert out["r2"] == 1.0

    def test_overconfident_half_slope(self, spark):
        from zoi_spark import tablechecks as tc
        rows = ([(0.1, 1)] * 3 + [(0.1, 0)] * 7
                + [(0.9, 1)] * 7 + [(0.9, 0)] * 3)
        df = spark.createDataFrame(rows, "p double, y int")
        out = tc.calibration_slope(df, prob_col="p",
                                   label_col="y").collect()[0]
        # observed 0.3 @ 0.1 and 0.7 @ 0.9 -> slope 0.5
        assert out["slope"] == 0.5
        assert out["intercept"] == 0.25


class TestCramersVCorrected:
    def test_perfect_association_one(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(c, c) for c in "abcd" for _ in range(25)]
        df = spark.createDataFrame(rows, "x string, y string")
        out = tc.cramers_v_corrected(df, x_col="x",
                                     y_col="y").collect()[0]
        assert out["v_raw"] == 1.0
        assert out["v_corrected"] > 0.95

    def test_independence_corrected_zero(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(x, y) for x in "ab" for y in "cd"
                for _ in range(10)]
        df = spark.createDataFrame(rows, "x string, y string")
        out = tc.cramers_v_corrected(df, x_col="x",
                                     y_col="y").collect()[0]
        assert out["chi2"] == 0.0
        assert out["v_corrected"] == 0.0


class TestAnonymityCurve:
    def test_coarsening_reduces_risk(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("g", 100 + i) for i in range(40)]
        df = spark.createDataFrame(rows, "lang string, n_chars long")
        df = df.withColumn("source", F.lit("s"))
        out = tc.anonymity_curve(df, quasi_cols=["lang", "source"],
                                 value_col="n_chars",
                                 widths=(1, 8, 64), k=5).collect()
        shares = [r["risk_share"] for r in out]
        assert shares[0] == 1.0       # width 1: every row unique
        assert shares == sorted(shares, reverse=True)
        # width 64: values 100..139 split at 128 -> classes of 28
        # and 12, both clearing k=5
        assert out[2]["risk_share"] == 0.0
        assert out[2]["n_classes"] == 2
        assert out[2]["min_class"] == 12

    def test_class_counts_exact(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("a", v) for v in (0, 1, 2, 3)] + [("b", 0)]
        df = spark.createDataFrame(rows, "lang string, n_chars long")
        df = df.withColumn("source", F.lit("s"))
        out = {r["width"]: r for r in tc.anonymity_curve(
            df, quasi_cols=["lang", "source"],
            value_col="n_chars", widths=(1, 4), k=2).collect()}
        assert out[1]["n_classes"] == 5 and out[1]["n_at_risk"] == 5
        assert out[4]["n_classes"] == 2       # a:{0-3}, b:{0}
        assert out[4]["n_at_risk"] == 1       # b's singleton


class TestECE:
    def test_perfect_zero(self, spark):
        from zoi_spark import tablechecks as tc
        rows = ([(0.2, 0)] * 4 + [(0.2, 1)]
                + [(0.8, 1)] * 4 + [(0.8, 0)])
        df = spark.createDataFrame(rows, "p double, y int")
        out = tc.ece(df, prob_col="p", label_col="y").collect()[0]
        assert out["ece"] == 0.0 and out["mce"] == 0.0

    def test_overconfident_hand_value(self, spark):
        from zoi_spark import tablechecks as tc
        rows = ([(0.1, 1)] * 3 + [(0.1, 0)] * 7
                + [(0.9, 1)] * 7 + [(0.9, 0)] * 3)
        df = spark.createDataFrame(rows, "p double, y int")
        out = tc.ece(df, prob_col="p", label_col="y").collect()[0]
        assert out["ece"] == 0.2              # |0.3-0.1| both bins
        assert out["mce"] == 0.2


class TestDisguisedNulls:
    def test_census_exact(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [("en", "good"), ("N/A", "fine"), (None, "ok"),
                ("  null ", "x"), ("de", "-"), ("fr", "text")]
        df = spark.createDataFrame(rows, "a string, b string")
        out = {r["col_name"]: r for r in tc.disguised_nulls(
            df, cols=["a", "b"]).collect()}
        # 'N/A' + '  null ' (trimmed+lowered) disguise column a
        assert out["a"]["n_null"] == 1
        assert out["a"]["n_disguised"] == 2
        assert out["a"]["disguised_share"] == round(2 / 6, 6)
        assert out["b"]["n_disguised"] == 1   # the '-'
        assert out["b"]["n_null"] == 0


class TestWaterfill:
    def _df(self, spark, caps):
        return spark.createDataFrame(
            [(k, float(c)) for k, c in caps.items()],
            "k string, cap double")

    def test_hand_level(self, spark):
        from zoi_spark import tablechecks as tc
        df = self._df(spark, {"a": 1, "b": 5, "c": 10})
        out = {r["key"]: r for r in tc.waterfill(
            df, key_col="k", cap_col="cap", budget=12).collect()}
        # level 6: a filled at 1, b filled at 5, c gets 6
        assert out["a"]["alloc"] == 1.0 and out["a"]["filled"]
        assert out["b"]["alloc"] == 5.0 and out["b"]["filled"]
        assert out["c"]["alloc"] == 6.0 and not out["c"]["filled"]

    def test_budget_exceeds_capacity(self, spark):
        from zoi_spark import tablechecks as tc
        df = self._df(spark, {"a": 2, "b": 3})
        out = {r["key"]: r["alloc"] for r in tc.waterfill(
            df, key_col="k", cap_col="cap", budget=100).collect()}
        assert out == {"a": 2.0, "b": 3.0}

    def test_small_budget_equal_split(self, spark):
        from zoi_spark import tablechecks as tc
        df = self._df(spark, {"a": 10, "b": 10, "c": 10})
        out = {r["key"]: r["alloc"] for r in tc.waterfill(
            df, key_col="k", cap_col="cap", budget=6).collect()}
        assert out == {"a": 2.0, "b": 2.0, "c": 2.0}


class TestClusteringFactor:
    def test_sorted_vs_scattered(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(i, "a" if i < 50 else "b",
                 "x" if i % 2 == 0 else "y") for i in range(100)]
        df = spark.createDataFrame(rows,
                                   "doc_id long, sorted string, alt string")
        out = {r["col_name"]: r for r in tc.clustering_factor(
            df, order_col="doc_id",
            cols=["sorted", "alt"]).collect()}
        assert out["sorted"]["n_runs"] == 2
        assert out["sorted"]["factor"] == 1.0     # perfect zones
        assert out["alt"]["n_runs"] == 100        # every row breaks
        assert out["alt"]["factor"] == 50.0


class TestMarkovOrderTest:
    def test_true_order_one_zero(self, spark):
        from zoi_spark import tablechecks as tc
        import datetime as dt
        rows, eid = [], 0
        for u in range(5):
            for j, s in enumerate("ABABABAB"):
                rows.append((eid, u, dt.datetime(2024, 1, 1, j), s))
                eid += 1
        df = spark.createDataFrame(
            rows, "id long, user_id long, ts timestamp, t string")
        out = tc.markov_order_test(
            df, entity_col="user_id", ts_col="ts",
            type_col="t").collect()[0]
        assert out["g2"] == 0.0       # next state depends on b only

    def test_second_order_memory_detected(self, spark):
        from zoi_spark import tablechecks as tc
        import datetime as dt
        rows, eid = [], 0
        for u in range(5):
            for j, s in enumerate("ABBABBABB"):
                rows.append((eid, u, dt.datetime(2024, 1, 1, j), s))
                eid += 1
        df = spark.createDataFrame(
            rows, "id long, user_id long, ts timestamp, t string")
        out = tc.markov_order_test(
            df, entity_col="user_id", ts_col="ts",
            type_col="t").collect()[0]
        assert out["g2"] > 5.0        # after B, history decides


class TestN50:
    def test_hand_values(self, spark):
        from zoi_spark import tablechecks as tc
        df = spark.createDataFrame([(i, v) for i, v in
                                    enumerate([10, 5, 3, 2])],
                                   "i long, v long")
        out = tc.n50(df, "v").collect()[0]
        assert out["total"] == 20
        assert out["n50"] == 10 and out["l50"] == 1
        assert out["n90"] == 3 and out["l90"] == 3

    def test_uniform_sizes(self, spark):
        from zoi_spark import tablechecks as tc
        df = spark.createDataFrame([(i, 7) for i in range(10)],
                                   "i long, v long")
        out = tc.n50(df, "v").collect()[0]
        assert out["n50"] == 7
        assert out["l50"] == 10       # the tie group counts whole


class TestKendallTauB:
    def test_perfect_agreement(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(float(i), float(i * 2)) for i in range(8)]
        df = spark.createDataFrame(rows, "x double, y double")
        out = tc.kendall_tau_b(df, x_col="x",
                               y_col="y").collect()[0]
        assert out["tau_b"] == 1.0 and out["discordant"] == 0

    def test_ties_reduce_magnitude(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(1.0, 1.0), (1.0, 2.0), (2.0, 3.0), (3.0, 4.0)]
        df = spark.createDataFrame(rows, "x double, y double")
        out = tc.kendall_tau_b(df, x_col="x",
                               y_col="y").collect()[0]
        # C=5, D=0, Tx=1 -> tau = 5/sqrt(6*5)
        assert out["concordant"] == 5 and out["ties_x"] == 1
        assert out["tau_b"] == round(5 / (30 ** 0.5), 6)


class TestHashCollisionAudit:
    def test_forced_collisions_at_narrow_width(self, spark):
        from zoi_spark import tablechecks as tc
        rows = [(i, f"key{i}") for i in range(2000)]
        df = spark.createDataFrame(rows, "i long, k string")
        out = {r["bits"]: r for r in tc.hash_collision_audit(
            df, key_col="k", bits=(8, 32)).collect()}
        # 2000 keys into 256 buckets: nearly every hash collides
        assert out[8]["n_distinct_hashes"] == 256
        assert out[8]["collisions_observed"] == 2000 - 256
        assert out[8]["collisions_expected"] > 3000
        # 32 bits: expectation < 1/2, observed should be tiny
        assert out[32]["collisions_observed"] <= 2
        assert out[32]["collisions_expected"] < 0.5
