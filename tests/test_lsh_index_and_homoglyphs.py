"""Hand-value tests for the wave-38 operators: robots wildcard
patterns, homoglyph folding, embedding prefix energy, and the
persisted MinHash-LSH index."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from zoi_spark import dedup, similarity, text, urls


def test_robots_wildcards_anchor_and_specificity(spark):
    rules = spark.createDataFrame(
        [("ex.com", "*", "disallow", "/*.pdf$"),
         ("ex.com", "*", "disallow", "/tmp*"),
         ("ex.com", "*", "allow", "/tmp/keep$")],
        "host string, agent string, rule string, path string")
    uu = spark.createDataFrame(
        [("http://ex.com/doc.pdf",),    # matches anchored *.pdf$
         ("http://ex.com/doc.pdfx",),   # anchor must NOT match
         ("http://ex.com/tmp/x",),      # /tmp* disallow
         ("http://ex.com/tmp/keep",)],  # longer anchored allow wins
        "url string")
    got = {r.url: (r.allowed, r.rule_path)
           for r in urls.robots_check(uu, rules).collect()}
    assert got["http://ex.com/doc.pdf"] == (False, "/*.pdf$")
    assert got["http://ex.com/doc.pdfx"] == (True, None)
    assert got["http://ex.com/tmp/x"] == (False, "/tmp*")
    assert got["http://ex.com/tmp/keep"] == (True, "/tmp/keep$")


def test_robots_like_metacharacters_are_literal(spark):
    # '%' and '_' in a robots path must match literally, not as LIKE
    rules = spark.createDataFrame(
        [("ex.com", "*", "disallow", "/a%b"),
         ("ex.com", "*", "disallow", "/c_d")],
        "host string, agent string, rule string, path string")
    uu = spark.createDataFrame(
        [("http://ex.com/a%b/x",), ("http://ex.com/aXb/x",),
         ("http://ex.com/c_d",), ("http://ex.com/cXd",)],
        "url string")
    got = {r.url: r.allowed
           for r in urls.robots_check(uu, rules).collect()}
    assert got["http://ex.com/a%b/x"] is False
    assert got["http://ex.com/aXb/x"] is True   # % not a wildcard
    assert got["http://ex.com/c_d"] is False
    assert got["http://ex.com/cXd"] is True     # _ not a wildcard


def test_homoglyph_fingerprint_folds_confusables(spark):
    df = spark.createDataFrame(
        [(1, "Example text"), (2, "Exаmplе tеxt"),  # cyrillic а/е
         (3, "different")],
        "doc_id long, text string")
    out = df.select("doc_id",
                    text.fingerprint(F.col("text")).alias("e"),
                    text.homoglyph_fingerprint(F.col("text")).alias("h"))
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].e != rows[2].e          # exact dedup misses the pair
    assert rows[1].h == rows[2].h          # homoglyph key catches it
    assert rows[1].h != rows[3].h


def test_emb_prefix_energy_hand_buckets(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]),   # all energy in prefix -> 1.0
         (2, [0.0, 0.0, 1.0, 0.0]),   # none -> 0.0
         (3, [1.0, 0.0, 1.0, 0.0]),   # half -> 0.5
         (4, None)],                  # ignored
        "vec_id long, embedding array<float>")
    got = {r.bucket: (r.lo, r.n_vecs)
           for r in similarity.emb_prefix_energy(df).collect()}
    # share 1.0 clamps into bucket 9; 0.0 -> 0; 0.5 -> 5
    assert got == {9: (0.9, 1), 0: (0.0, 1), 5: (0.5, 1)}


def test_lsh_index_roundtrip_finds_cross_duplicates(spark):
    base = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "completely unrelated base document about other things")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog today"),
         (101, "novel content that matches nothing in the index")],
        "doc_id long, text string")
    idx = os.path.join(tempfile.gettempdir(), "zoi_test_lsh_idx")
    shutil.rmtree(idx, ignore_errors=True)
    try:
        dedup.write_minhash_index(base, idx, num_hashes=64, bands=16)
        got = {(r.new_id, r.index_id): r.jaccard
               for r in dedup.lsh_join_index(new, idx,
                                             threshold=0.8).collect()}
        assert got == {(100, 1): 1.0}
        # meta is authoritative: stored params drive the probe side
        m = spark.read.parquet(f"{idx}/meta").collect()[0]
        assert (m.num_hashes, m.bands, m.shingle_n) == (64, 16, 3)
    finally:
        shutil.rmtree(idx, ignore_errors=True)
