"""Line-level curation operators (text.frequent_lines /
strip_boilerplate / c4_line_filter / unigram_logprob / chunk_lines) —
hand-computable fixtures; the corpus-scale twins live in the oracle
parity suite (`boilerplate_strip`, `c4_line_filter`,
`unigram_surprisal`)."""

import math

from pyspark.sql import functions as F

from zoi_spark import text


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_lines_fixed_width(spark):
    df = _docs(spark, [(1, "a b c d e f g"), (2, ""), (3, "x")])
    out = {r.doc_id: r.t for r in df.select(
        "doc_id",
        text.chunk_lines(F.col("text"), words_per_line=3).alias("t")
    ).collect()}
    assert out[1] == "a b c\nd e f\ng"
    assert out[2] == ""          # empty doc -> one empty line
    assert out[3] == "x"


def test_frequent_lines_counts_distinct_docs(spark):
    # "footer" appears twice in doc 1 but must count once per doc
    df = _docs(spark, [
        (1, "body one\nfooter\nfooter"),
        (2, "body two\nfooter"),
        (3, "body three\nfooter"),
        (4, "body four\nunique line"),
    ])
    freq = {r.line: r.n_docs
            for r in text.frequent_lines(df, min_docs=3).collect()}
    assert freq == {"footer": 3}


def test_strip_boilerplate_preserves_order_and_bytes(spark):
    df = _docs(spark, [
        (1, "keep A\nfooter\nkeep B"),
        (2, "footer\nkeep C"),
        (3, "footer\nonly boilerplate here is footer"),
    ])
    out = {r.doc_id: r for r in text.strip_boilerplate(
        df, min_docs=2, out_col="clean").collect()}
    assert out[1].clean == "keep A\nkeep B"
    assert (out[1].n_lines, out[1].n_kept) == (3, 2)
    assert out[2].clean == "keep C"
    # original text column untouched (byte-identity invariant)
    assert out[1].text == "keep A\nfooter\nkeep B"


def test_strip_boilerplate_max_lines_caps_removal_set(spark):
    df = _docs(spark, [
        (i, "common one\ncommon two\nbody %d" % i) for i in range(6)
    ])
    # cap at 1: only the lexicographically-first of the tied-frequency
    # lines is removed (deterministic top-K: n_docs desc, line asc)
    out = text.strip_boilerplate(df, min_docs=2, max_lines=1,
                                 out_col="clean").collect()
    for r in out:
        assert "common one" not in r.clean
        assert "common two" in r.clean


def test_c4_line_filter_rules(spark):
    df = _docs(spark, [
        (1, "This line is long enough.\nshort.\n"
            "no terminal punctuation here\n"
            "enable javascript to view this page.")
    ])
    r = text.c4_line_filter(df, min_words=4, out_col="clean").first()
    assert r.clean == "This line is long enough."
    assert (r.n_lines, r.n_kept) == (4, 1)
    # without the terminal-punctuation rule the unpunctuated line stays
    r2 = text.c4_line_filter(df, min_words=4, require_terminal=False,
                             out_col="clean").first()
    assert r2.clean == ("This line is long enough.\n"
                        "no terminal punctuation here")


def test_unigram_logprob_matches_hand_mle(spark):
    # corpus: a a a b  ->  p(a)=3/4, p(b)=1/4
    df = _docs(spark, [(1, "a a a"), (2, "b")])
    out = {r.doc_id: r for r in text.unigram_logprob(df).collect()}
    assert out[1].n_tokens == 3
    assert abs(out[1].mean_surprisal - (-math.log2(3 / 4))) < 1e-6
    assert abs(out[2].mean_surprisal - 2.0) < 1e-6
    for h in getattr(text.unigram_logprob(df), "_zoi_persisted", []):
        h.unpersist()
