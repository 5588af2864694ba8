"""Line-level curation operators (text.frequent_lines /
strip_boilerplate / c4_line_filter / unigram_logprob / chunk_lines) —
hand-computable fixtures; the corpus-scale twins live in the oracle
parity suite (`boilerplate_strip`, `c4_line_filter`,
`unigram_surprisal`)."""

import math

import pytest
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


def test_tfidf_top_terms_hand_check(spark):
    # N=2; df: a->1 b->2 c->1; idf = ln((1+N)/(1+df)) + 1
    df = _docs(spark, [(1, "a a b"), (2, "b c")])
    out = text.tfidf_top_terms(df, k=1)
    rows = {r.doc_id: r for r in out.collect()}
    for h in getattr(out, "_zoi_persisted", []):
        h.unpersist()
    idf_rare = math.log(3 / 2) + 1
    assert rows[1].term == "a"
    assert abs(rows[1].tfidf - round((2 / 3) * idf_rare, 6)) < 1e-9
    assert rows[2].term == "c"    # 0.5*idf_rare beats b's 0.5*1.0
    assert abs(rows[2].tfidf - round(0.5 * idf_rare, 6)) < 1e-9


def test_tfidf_rank_tie_breaks_by_term(spark):
    # both terms unique to the doc -> identical score -> term ASC wins
    df = _docs(spark, [(1, "y x")])
    top = text.tfidf_top_terms(df, k=2)
    got = [r.term for r in top.orderBy("rank").collect()]
    for h in getattr(top, "_zoi_persisted", []):
        h.unpersist()
    assert got == ["x", "y"]


def test_dedup_paragraphs_first_occurrence_and_exempt_blank(spark):
    df = _docs(spark, [
        (1, "dup\nunique one\n\ndup"),   # in-doc repeat + blank
        (2, "dup\nother"),               # cross-doc loser
        (3, "dup"),                      # loses everything
    ])
    out = {r.doc_id: r for r in text.dedup_paragraphs(df).collect()}
    assert (out[1].n_paragraphs, out[1].n_kept) == (4, 3)
    assert out[1].clean_text == "dup\nunique one\n"   # pos-3 repeat gone
    assert out[2].clean_text == "other"
    assert (out[3].n_kept, out[3].clean_text) == (0, "")
    # original text column is untouched
    assert out[2].text == "dup\nother"


def test_pii_redact_substitutions_and_counts(spark):
    df = _docs(spark, [
        (1, "mail a@b.co ip 10.0.0.1 tel +1 (555) 123-4567 end"),
        (2, "nothing sensitive here"),
    ])
    out = {r.doc_id: r for r in text.pii_redact(df).collect()}
    r1 = out[1]
    assert (r1.n_pii_email, r1.n_pii_ipv4, r1.n_pii_phone) == (1, 1, 1)
    assert r1.redacted_text == "mail <EMAIL> ip <IP> tel <PHONE> end"
    assert out[2].redacted_text == "nothing sensitive here"
    assert (out[2].n_pii_email, out[2].n_pii_ipv4,
            out[2].n_pii_phone) == (0, 0, 0)


def test_zipf_profile_matches_hand_ols(spark):
    # counts 8/4/2/1 -> y = ln(2)*(3,2,1,0) over x = ln(1..4)
    df = _docs(spark, [(1, " ".join(["a"] * 8 + ["b"] * 4)),
                       (2, "c c d")])
    out = text.zipf_profile(df, max_rank=10)
    row = out.first()
    for h in getattr(out, "_zoi_persisted", []):
        h.unpersist()
    xs = [math.log(i) for i in (1, 2, 3, 4)]
    ys = [math.log(c) for c in (8, 4, 2, 1)]
    mx = sum(xs) / 4
    my = sum(ys) / 4
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / 4
    var = sum((x - mx) ** 2 for x in xs) / 4
    assert (row.n_vocab, row.n_tokens, row.n_ranks_fit) == (4, 15, 4)
    assert abs(row.zipf_slope - round(cov / var, 6)) < 1e-6
    corr = cov / math.sqrt(
        var * (sum((y - my) ** 2 for y in ys) / 4))
    assert abs(row.zipf_r2 - round(corr ** 2, 6)) < 1e-6


def test_oov_rate_against_topv_vocab(spark):
    # corpus counts: a->3 b->2 c->1; V=2 -> vocab {a, b}
    df = _docs(spark, [(1, "a a a b"), (2, "b c")])
    out = text.oov_rate(df, vocab_size=2)
    rows = {r.doc_id: r for r in out.collect()}
    for h in getattr(out, "_zoi_persisted", []):
        h.unpersist()
    assert (rows[1].n_tokens, rows[1].n_oov, rows[1].oov_rate) == (4, 0, 0.0)
    assert (rows[2].n_tokens, rows[2].n_oov, rows[2].oov_rate) == (2, 1, 0.5)


def test_oov_vocab_cut_tie_breaks_by_token(spark):
    # y and z tie at count 1; V=2 keeps {x, y} (token ASC at the cut)
    df = _docs(spark, [(1, "x x z y")])
    out = text.oov_rate(df, vocab_size=2)
    r = out.first()
    for h in getattr(out, "_zoi_persisted", []):
        h.unpersist()
    assert (r.n_oov, r.n_tokens) == (1, 4)   # z is out


def test_normalize_punct_map_and_deletion(spark):
    df = _docs(spark, [(1, "“it’s” — a…b​ c d")])
    got = df.select(text.normalize_punct(F.col("text")).alias("t")).first().t
    assert got == "\"it's\" - a...b c d"


def test_token_windows_stride_and_tail(spark):
    # 7 tokens, window 4, stride 2: the stride grid [1, 3] misses the
    # last full-coverage start 4 (n-W+1), so it is appended — the tail
    # token t7 must appear in a window (the documented no-suffix-drop
    # contract)
    df = _docs(spark, [(1, "t1 t2 t3 t4 t5 t6 t7"), (2, ""), (3, "x")])
    out = text.token_windows(df, window=4, stride=2)
    rows = [(r.doc_id, r.win_idx, r.win_tokens, r.window_text)
            for r in out.orderBy("doc_id", "win_idx").collect()]
    assert rows == [
        (1, 0, 4, "t1 t2 t3 t4"),
        (1, 1, 4, "t3 t4 t5 t6"),
        (1, 2, 4, "t4 t5 t6 t7"),  # appended tail-coverage start
        (3, 0, 1, "x"),            # short doc -> one (partial) window
    ]                              # doc 2 (no tokens) yields nothing
    # when the grid already lands on n-W+1, nothing is appended
    df2 = _docs(spark, [(1, "a b c d e")])    # n=5, W=4, S=1 -> 1,2
    texts = [r.window_text for r in text.token_windows(
        df2, window=4, stride=1).orderBy("win_idx").collect()]
    assert texts == ["a b c d", "b c d e"]


def test_token_windows_covers_suffix(spark):
    # 5 tokens, window 4, stride 4 -> starts 1,2? no: max(5-4+1,1)=2,
    # sequence(1,2,4)=[1] ... suffix t5 dropped? window=4 stride=4 over
    # 5 tokens gives starts [1]; add stride 1 case to pin full cover.
    df = _docs(spark, [(1, "a b c d e")])
    out = text.token_windows(df, window=4, stride=1)
    texts = [r.window_text for r in out.orderBy("win_idx").collect()]
    assert texts == ["a b c d", "b c d e"]


def test_dup_paragraph_fraction_counts_and_chars(spark):
    df = _docs(spark, [
        (1, "dup\nother\ndup\n\n  "),    # 3 non-blank, 1 dup occurrence
        (2, "a\nb"),
        (3, "\n \n"),                     # all blank
    ])
    out = {r.doc_id: r for r in text.dup_paragraph_fraction(df).collect()}
    r1 = out[1]
    assert (r1.n_paras, r1.n_dup_paras) == (3, 1)
    assert abs(r1.dup_para_frac - round(1 / 3, 6)) < 1e-9
    # chars: all=3+5+3=11, uniq=3+5=8 -> dup chars 3/11
    assert abs(r1.dup_para_char_frac - round(3 / 11, 6)) < 1e-9
    assert (out[2].n_dup_paras, out[2].dup_para_frac) == (0, 0.0)
    assert (out[3].n_paras, out[3].dup_para_char_frac) == (0, 0.0)


def test_extract_links_three_quoting_syntaxes(spark):
    df = _docs(spark, [
        (1, 'pre <a href="http://a.example/1">x</a> '
            "mid <a HREF='http://b.example/2'>y</a> "
            "end <a href=http://c.example/3>z</a>"),
        (2, "no links here"),
    ])
    out = [(r.doc_id, r.link_idx, r.href)
           for r in text.extract_links(df)
           .orderBy("doc_id", "link_idx").collect()]
    assert out == [(1, 0, "http://a.example/1"),
                   (1, 1, "http://b.example/2"),
                   (1, 2, "http://c.example/3")]


def test_pmi_collocations_hand_check(spark):
    import math

    # bigrams: doc1 -> "a b"x3 + "b a"x2, doc2 -> "b a"x2 + "a b"x1,
    # doc3 -> "b c"x1; totals: "a b"=4, "b a"=4, "b c"=1, 9 slots
    # w1 (first-word slots): a->4 b->5 ; w2: a->4 b->4 c->1
    df = _docs(spark, [(1, "a b a b a b"), (2, "b a b a"), (3, "b c")])
    out = text.pmi_collocations(df, min_count=2, top_k=10)
    rows = {r.bigram: r for r in out.collect()}
    for h in getattr(out, "_zoi_persisted", []):
        h.unpersist()
    assert set(rows) == {"a b", "b a"}          # "b c" under min_count
    assert rows["a b"].c == 4
    assert abs(rows["a b"].pmi
               - round(math.log2((4 * 9) / (4 * 4)), 6)) < 1e-9
    assert abs(rows["b a"].pmi
               - round(math.log2((4 * 9) / (5 * 4)), 6)) < 1e-9


def test_heaps_profile_shape_and_totals(spark):
    df = _docs(spark, [(i, f"w{i} w{i} common") for i in range(1, 21)])
    out = text.heaps_profile(df, n_points=5)
    r = out.first()
    for h in getattr(out, "_zoi_persisted", []):
        h.unpersist()
    assert (r.n_vocab, r.n_tokens) == (21, 60)   # 20 uniques + common
    assert r.n_points_fit == 5
    # vocab grows sublinearly: 0 < beta < 1 for this corpus
    assert 0.0 < r.heaps_beta < 1.0
    assert r.heaps_k > 0


def test_token_entropy_hand_check(spark):
    # doc1 uniform over 4 distinct -> H=2 bits; doc2 all same -> 0
    df = _docs(spark, [(1, "a b c d"), (2, "x x x x"), (3, "")])
    out = {r.doc_id: r for r in text.token_entropy(df).collect()}
    assert (out[1].n_tokens, out[1].n_types) == (4, 4)
    assert out[1].token_entropy == 2.0
    assert out[1].type_token_ratio == 1.0
    assert out[2].token_entropy == 0.0
    assert abs(out[2].type_token_ratio - 0.25) < 1e-9
    assert 3 not in out                     # empty doc yields no row


def test_sentence_stats_counts_and_flags(spark):
    df = _docs(spark, [
        (1, "one two three. four five six seven eight nine ten! tail"),
        (2, "ends with period."),
        (3, ""),
    ])
    out = {r.doc_id: r for r in text.sentence_stats(
        df, max_words=5).collect()}
    r1 = out[1]
    assert r1.n_sentences == 3              # 3w, 7w, 1w
    assert abs(r1.mean_sentence_words - round(11 / 3, 6)) < 1e-9
    assert abs(r1.frac_long_sentences - round(1 / 3, 6)) < 1e-9
    assert r1.ends_terminal is False        # 'tail' has no terminal
    assert out[2].ends_terminal is True
    assert (out[3].n_sentences, out[3].mean_sentence_words) == (0, 0.0)


def test_boilerplate_phrase_flags_hits(spark):
    df = _docs(spark, [
        (1, "body All rights RESERVED and click here now"),
        (2, "clean body"),
    ])
    out = {r.doc_id: r for r in text.boilerplate_phrase_flags(
        df, max_hits=2).collect()}
    assert out[1].bp_0 is True and out[1].bp_4 is True
    assert out[1].n_boiler_hits == 2 and out[1].boiler_flagged is True
    assert out[2].n_boiler_hits == 0 and out[2].boiler_flagged is False


def test_trigram_logprob_single_path(spark):
    import math

    # one doc "a b c a b c": trigrams abc,bca,cab,abc -> self-model
    df = _docs(spark, [(1, "a b c a b c")])
    out = text.trigram_logprob(df, lambdas=(0.6, 0.3, 0.1))
    r = out.first()
    for h in getattr(out, "_zoi_persisted", []):
        h.unpersist()
    assert r.n_trigrams == 4
    # slots: abc x2, bca x1, cab x1 (N=4)
    def p(c123, c12, c23, c2, c3):
        return 0.6 * c123 / c12 + 0.3 * c23 / c2 + 0.1 * c3 / 4
    # marginals over slots: prefixes ab->2 bc->1 ca->1; mids b->2 c->1,a->1
    # suffixes bc->... suffix of abc is 'b c'? suffix = (w2,w3): abc->(b,c)x2,
    # bca->(c,a), cab->(a,b); unigram w3: c->2, a->1, b->1
    s = (2 * -math.log2(p(2, 2, 2, 2, 2))     # abc: pre ab=2, suf bc=2, mid b=2, uni c=2
         + 1 * -math.log2(p(1, 1, 1, 1, 1))   # bca: pre bc=1, suf ca=1, mid c=1, uni a=1
         + 1 * -math.log2(p(1, 1, 1, 1, 1)))  # cab: pre ca=1, suf ab=1, mid a=1, uni b=1
    assert abs(r.mean_trigram_surprisal - round(s / 4, 6)) < 1e-6


def test_boilerplate_phrases_empty_raises(spark):
    import pytest

    df = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError):
        text.boilerplate_phrase_flags(df, phrases=())


def test_html_strip_semantics(spark):
    from zoi_spark import text as ztext

    raw = ('<html><script a="b">var x = "<p>";</script>'
           '<style>p { c: d }</style><p class="big">Hello '
           '<b>world</b></p>&lt;b&gt; &amp;lt; A&nbsp;B&#39;s</html>')
    df = spark.createDataFrame([(1, raw), (2, "plain text")],
                               "doc_id long, text string")
    out = {r.doc_id: r.text_plain
           for r in ztext.html_strip(df).collect()}
    # tags stripped BEFORE entity decode: '&lt;b&gt;' survives as the
    # literal '<b>'; '&amp;lt;' decodes to '&lt;' exactly once
    assert out[1] == "Hello world <b> &lt; A B's"
    assert out[2] == "plain text"


def test_word_len_hist_cap_and_shares(spark):
    from zoi_spark import text as ztext

    df = spark.createDataFrame(
        [("en", "aa bbb aa toolongword")],
        "lang string, text string")
    out = {(r.lang, r.word_len): r for r in ztext.word_len_hist(
        df, group_col="lang", max_len=4).collect()}
    assert out[("en", 2)].n_words == 2
    assert out[("en", 2)].share == 0.5
    assert out[("en", 3)].n_words == 1
    assert out[("en", 4)].n_words == 1          # capped overflow


def test_anchor_texts_top_and_ties(spark):
    from zoi_spark import text as ztext

    rows = [
        (1, 'x <a href="http://t.com/a">Hello</a>'),
        (2, "y <A HREF='http://t.com/b'>hello </A>"),   # folds to hello
        (3, '<a class="z" href=http://t.com/c>bye</a>'),
        (4, '<a href="http://other.org/">solo</a>'),
        (5, 'no anchors here'),
        (6, '<a href="http://t.com/d"></a>'),            # empty dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.host: r for r in ztext.anchor_texts(df).collect()}
    t = out["t.com"]
    # hello x2 (case/trim folded), bye x1 -> top anchor hello
    assert (t.n_links, t.n_anchors, t.top_anchor, t.top_anchor_n) == \
        (3, 2, "hello", 2)
    assert out["other.org"].top_anchor == "solo"
    # tie: two anchors with count 1 -> lexicographically smallest
    df2 = spark.createDataFrame(
        [(1, '<a href="http://x.io/">zz</a> <a href="http://x.io/">aa</a>')],
        "doc_id long, text string")
    assert ztext.anchor_texts(df2).collect()[0].top_anchor == "aa"


def test_quality_calibration_dup_rate(spark):
    from zoi_spark import text as ztext

    dup = "The quick brown fox jumps over the lazy dog again and again."
    uniq = ["A different sentence number %d with plain prose." % i
            for i in range(3)]
    rows = [(1, dup), (2, dup)] + \
        [(10 + i, s) for i, s in enumerate(uniq)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = ztext.quality_calibration(df).collect()
    total = {(r.bucket): r for r in out}
    assert sum(r.n_docs for r in out) == 5
    assert sum(r.n_dup for r in out) == 2
    for r in out:
        assert abs(r.dup_rate - r.n_dup / r.n_docs) < 1e-9
        assert 0 <= r.bucket <= 9


def test_meta_robots_variants(spark):
    from zoi_spark import text as ztext

    rows = [
        (1, 'x <meta name="robots" content="noindex, nofollow"> y'),
        (2, "x <META NAME=ROBOTS CONTENT='NoArchive'> y"),
        (3, 'x <meta name="robots" content=""> y'),    # empty content
        (4, 'no meta here'),
        (5, '<meta name="viewport" content="width=1"> no robots'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.directive: r.n_docs for r in ztext.meta_robots(df).collect()}
    assert out == {"noindex": 1, "nofollow": 1, "noarchive": 1}


def test_hashed_features_l1_and_determinism(spark):
    import hashlib

    from zoi_spark import text as ztext

    df = spark.createDataFrame([(1, "apple banana apple"),
                                (2, "Apple  APPLE apple")],
                               "doc_id long, text string")
    out = ztext.hashed_features(df, buckets=16).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for rows_ in by_doc.values():
        assert abs(sum(r.w for r in rows_) - 1.0) < 1e-6
    apple_bucket = int(hashlib.md5(b"apple").hexdigest()[:15], 16) % 16
    # doc 2 is all 'apple' after normalization -> one bucket, w=1
    assert by_doc[2] == [r for r in by_doc[2]
                         if r.bucket == apple_bucket and r.w == 1.0]


def test_bitext_candidates_rare_anchor(spark):
    from zoi_spark import text as ztext
    from zoi_spark.dedup import unpersist_candidates

    rows = [
        (1, "en", "the invoice X77 ref K99 total due"),
        (2, "de", "rechnung X77 referenz K99 summe"),
        (3, "en", "the quick brown fox the the"),
        (4, "fr", "le renard brun rapide"),
        (5, "en", "the invoice X77 again"),  # X77 df=3, still rare
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {(r.id_a, r.id_b): r for r in
           ztext.bitext_candidates(df, max_df=3, min_shared=1).collect()}
    # (1,2) share X77+K99 cross-lang; (2,5) share X77 cross-lang
    assert (1, 2) in out and out[(1, 2)].n_shared == 2
    assert (2, 5) in out and out[(2, 5)].n_shared == 1
    # (1,5) same lang -> excluded despite shared rare token
    assert (1, 5) not in out
    # 'the' df=3 but same-lang only; no en-en pairs anywhere
    assert all(a != b for (_, _), r in out.items()
               for a, b in [(r.lang_a, r.lang_b)])
    # min_shared=2 drops the single-anchor pair
    pairs2 = ztext.bitext_candidates(df, max_df=3, min_shared=2)
    assert {(r.id_a, r.id_b) for r in pairs2.collect()} == {(1, 2)}
    unpersist_candidates(pairs2)


def test_good_turing_mass_counts(spark):
    from zoi_spark import text as ztext

    df = spark.createDataFrame(
        [(1, "en", "a a b c"), (2, "en", "a b d"),
         (3, "de", "x")],
        "doc_id long, lang string, text string")
    out = {r.lang: r for r in ztext.good_turing_mass(df).collect()}
    # en: tokens a*3 b*2 c*1 d*1 -> N=7, types=4, N1=2, N2=1
    en = out["en"]
    assert (en.n_tokens, en.n_types, en.singletons, en.doubletons) == \
        (7, 4, 2, 1)
    assert en.p_unseen == round(2 / 7, 6)
    de = out["de"]
    assert (de.n_tokens, de.n_types, de.singletons, de.p_unseen) == \
        (1, 1, 1, 1.0)


def test_hapax_rate_counts(spark):
    # en: tokens a a b -> vocab 2, hapax 1 (b); de: c d -> 2 hapax
    df = spark.createDataFrame(
        [("en", "a a b"), ("de", "c d")], "lang string, text string")
    out = {r.lang: r for r in text.hapax_rate(df).collect()}
    assert (out["en"].vocab_size, out["en"].n_hapax,
            out["en"].n_tokens) == (2, 1, 3)
    assert out["en"].hapax_share == 0.5
    assert out["de"].hapax_share == 1.0


def test_bm25_ranks_tf_and_rewards_rare_terms(spark):
    # 'rare' occurs in 1 of 3 docs -> higher idf than 'common' (3 of 3)
    rows = [(1, "common rare x"), (2, "common y z"), (3, "common w v")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    top = text.bm25_topk(df, ["rare", "common"], k=3).collect()
    assert top[0].doc_id == 1 and top[0].score > top[1].score
    # precomputed stats path agrees with the measured path
    pre = text.bm25_topk(df, ["rare", "common"], k=3,
                          corpus_stats=(3, 3.0)).collect()
    assert [r.doc_id for r in pre] == [r.doc_id for r in top]


def test_build_postings_caps_and_counts(spark):
    rows = [(i, "tok tok other") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.token: r for r in text.build_postings(
        df, min_df=2, max_postings=3).collect()}
    assert out["tok"].df == 10 and out["tok"].cf == 20
    assert out["tok"].postings == [0, 1, 2]   # sorted, capped
    assert out["other"].cf == 10


def test_code_switch_profile_detects_mixed(spark):
    rows = [(1, "the and of to in. der die und das nicht"),   # en + de
            (2, "the and of to in. the and of to in"),        # en only
            (3, "zzz qqq. xxx www")]                          # und only
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = text.code_switch_profile(df).collect()[0]
    assert (r.n_docs, r.n_multiseg, r.n_mixed) == (3, 3, 1)


def test_shape_template_census_collapses_runs(spark):
    df = spark.createDataFrame(
        [("Item 42 - ok",), ("Item 7 - ok",), ("plain words",)],
        "text string")
    out = {r.template: r.n_docs
           for r in text.shape_template_census(df).collect()}
    assert out == {"a 0 - a": 2, "a a": 1}


def test_term_burstiness_hand(spark):
    # 'b' bursts (4 occurrences in 1 doc over 5 docs); 'a' uniform
    rows = [(0, "a b b b b")] + [(i, "a") for i in range(1, 5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.token: r for r in text.term_burstiness(
        df, min_df=1, k=5).collect()}
    assert out["b"].burst == 4.0 and out["b"].df == 1
    assert out["a"].burst == 1.0 and out["a"].df == 5


def test_lexical_concentration_buckets(spark):
    # doc 1: one token repeated -> HHI 1 -> bucket 9
    # doc 2: four distinct tokens -> HHI 0.25 -> bucket 2
    df = spark.createDataFrame(
        [(1, "x x x x"), (2, "a b c d")], "doc_id long, text string")
    out = {r.bucket: r.n_docs
           for r in text.lexical_concentration(df).collect()}
    assert out == {9: 1, 2: 1}


class TestKeynessTerms:
    def test_enriched_term_is_positive(self, spark):
        import pytest
        from zoi_spark import text
        from pyspark.sql import functions as F
        rows = [("aaa aaa aaa bbb", True), ("bbb bbb bbb ccc", False),
                ("aaa aaa bbb bbb", True), ("ccc ccc bbb bbb", False)]
        df = spark.createDataFrame(rows, "text string, foc boolean")
        out = {r["term"]: r for r in text.keyness_terms(
            df, focus=F.col("foc"), min_count=1).collect()}
        assert out["aaa"]["keyness"] > 0      # only in focus
        assert out["ccc"]["keyness"] < 0      # only in reference
        assert out["aaa"]["n_focus"] == 5 and out["aaa"]["n_ref"] == 0
        # balanced term: G2 near zero
        assert abs(out["bbb"]["keyness"]) < abs(out["aaa"]["keyness"])

    def test_min_count_filters(self, spark):
        from zoi_spark import text
        from pyspark.sql import functions as F
        rows = [("rare common common", True), ("common common", False)]
        df = spark.createDataFrame(rows, "text string, foc boolean")
        terms = {r["term"] for r in text.keyness_terms(
            df, focus=F.col("foc"), min_count=2).collect()}
        assert terms == {"common"}


class TestVocabRichness:
    def test_chao1_and_coverage(self, spark):
        import pytest
        from zoi_spark import text
        # counts: a:3, b:1, c:1, d:2  -> V=4, f1=2, f2=1, N=7
        df = spark.createDataFrame(
            [("a a a b c d d",)], "text string")
        r = text.vocab_richness(df).collect()[0]
        assert (r["n_tokens"], r["vocab"], r["f1"], r["f2"]) \
            == (7, 4, 2, 1)
        assert r["chao1"] == pytest.approx(4 + 2 * 1 / 4.0, abs=1e-6)
        assert r["coverage"] == pytest.approx(1 - 2 / 7, abs=1e-6)

    def test_no_hapax_means_full_coverage(self, spark):
        import pytest
        from zoi_spark import text
        df = spark.createDataFrame([("x x y y",)], "text string")
        r = text.vocab_richness(df).collect()[0]
        assert r["chao1"] == pytest.approx(2.0)
        assert r["coverage"] == pytest.approx(1.0)


class TestRakePhrases:
    def test_hand_example(self, spark):
        import pytest
        from zoi_spark import text
        # stopwords 'and', 'of' delimit; '.' delimits
        df = spark.createDataFrame(
            [("Red apple and green apple of doom.",)], "text string")
        out = {r["phrase"]: r for r in text.rake_phrases(
            df, top_k=10).collect()}
        # freq: apple 2, red/green/doom 1; deg: apple 4, red/green 2,
        # doom 1 → scores: apple 2, red 2, green 2, doom 1
        assert out["red apple"]["score"] == pytest.approx(4.0)
        assert out["green apple"]["score"] == pytest.approx(4.0)
        assert out["doom"]["score"] == pytest.approx(1.0)
        assert out["red apple"]["n_words"] == 2
        assert out["red apple"]["n_occ"] == 1

    def test_repeated_phrase_counts_once_with_occurrences(self, spark):
        from zoi_spark import text
        df = spark.createDataFrame(
            [("alpha beta. alpha beta.",), ("alpha beta!",)],
            "text string")
        rows = text.rake_phrases(df, top_k=10).collect()
        assert len(rows) == 1
        assert rows[0]["phrase"] == "alpha beta"
        assert rows[0]["n_occ"] == 3

    def test_stopword_only_text_yields_nothing(self, spark):
        from zoi_spark import text
        df = spark.createDataFrame(
            [("the and of to...",), (None,)], "text string")
        assert text.rake_phrases(df, top_k=5).count() == 0


class TestKneserNeyBigrams:
    def test_hand_probabilities(self, spark):
        from zoi_spark import text as tx
        # corpus: "a b" x3, "a c" x1 -> contexts: c(a .) = 4,
        # N1+(a .) = 2; continuations: N1+(. b)=1, N1+(. c)=1,
        # N1+(..)=2 -> p_cont(b)=p_cont(c)=0.5
        # p_kn(b|a) = (3-0.75)/4 + (0.75/4)*2*0.5 = 0.75
        # p_kn(c|a) = (1-0.75)/4 + (0.75/4)*2*0.5 = 0.25
        df = spark.createDataFrame(
            [(1, "a b"), (2, "a b"), (3, "a b"), (4, "a c")],
            "doc_id long, text string")
        out = {r["bigram"]: r for r in
               tx.kneser_ney_bigrams(df).collect()}
        assert out["a b"]["c"] == 3
        assert out["a b"]["p_kn"] == pytest.approx(0.75)
        assert out["a c"]["p_kn"] == pytest.approx(0.25)

    def test_discount_mass_reserved_for_unseen(self, spark):
        # context x saw both continuations {y, z} -> observed mass
        # sums to 1; context w saw only y -> the sum over OBSERVED
        # continuations is 1 minus the smoothing mass KN reserves for
        # the unseen z: (1-d)/1 + d*1*p_cont(y) = 0.25 + 0.75*(2/3)
        from zoi_spark import text as tx
        df = spark.createDataFrame(
            [(1, "x y"), (2, "x z"), (3, "x y"), (4, "w y")],
            "doc_id long, text string")
        rows = tx.kneser_ney_bigrams(df, top_k=100).collect()
        by_ctx = {}
        for r in rows:
            by_ctx.setdefault(r["bigram"].split(" ")[0], 0.0)
            by_ctx[r["bigram"].split(" ")[0]] += r["p_kn"]
        assert by_ctx["x"] == pytest.approx(1.0, abs=1e-5)
        assert by_ctx["w"] == pytest.approx(0.25 + 0.75 * (2 / 3),
                                            abs=1e-5)

    def test_rejects_bad_discount(self, spark):
        from zoi_spark import text as tx
        df = spark.createDataFrame([(1, "a b")],
                                   "doc_id long, text string")
        with pytest.raises(ValueError):
            tx.kneser_ney_bigrams(df, discount=1.5)


class TestBurrowsDelta:
    def test_identical_styles_zero_delta(self, spark):
        from zoi_spark import text as tx
        df = spark.createDataFrame(
            [(1, "the cat sat", "s1"), (2, "the cat sat", "s2"),
             (3, "a dog ran here", "s3")],
            "doc_id long, text string, source string")
        out = {(r["group_a"], r["group_b"]): r["delta"]
               for r in tx.burrows_delta(df).collect()}
        assert out[("s1", "s2")] == 0.0
        assert out[("s1", "s3")] > 0

    def test_absent_word_counts_as_zero_frequency(self, spark):
        # s2 never uses "zebra": the grid must contain the zero row,
        # otherwise the z-scores (and delta) are silently wrong
        from zoi_spark import text as tx
        df = spark.createDataFrame(
            [(1, "zebra zebra other", "s1"), (2, "plain words here", "s2"),
             (3, "plain zebra words", "s3")],
            "doc_id long, text string, source string")
        rows = tx.burrows_delta(df, top_k_words=10).collect()
        pairs = {(r["group_a"], r["group_b"]) for r in rows}
        assert ("s1", "s2") in pairs and ("s2", "s3") in pairs
        deltas = {(r["group_a"], r["group_b"]): r["delta"]
                  for r in rows}
        assert all(d >= 0 for d in deltas.values())


class TestLuhnPanScan:
    def test_valid_and_invalid_pans(self, spark):
        from zoi_spark import text as tx
        df = spark.createDataFrame(
            [(1, "pay 4111111111111111 now"),       # Luhn-valid
             (2, "id 4111111111111112 here"),       # checksum off
             (3, "call 5500005555555559 or 4111111111111111"),
             (4, "no digits at all")],
            "doc_id long, text string")
        out = {r["id"]: r for r in tx.luhn_pan_scan(df).collect()}
        assert out[1]["n_candidates"] == 1
        assert out[1]["n_luhn_valid"] == 1
        assert out[2]["n_luhn_valid"] == 0
        assert out[3]["n_candidates"] == 2
        assert out[3]["n_luhn_valid"] == 2
        assert 4 not in out  # no candidates -> no row

    def test_short_runs_not_candidates(self, spark):
        from zoi_spark import text as tx
        # 12 digits: below the PAN length floor, never a candidate
        df = spark.createDataFrame([(1, "num 411111111111 x")],
                                   "doc_id long, text string")
        assert tx.luhn_pan_scan(df).count() == 0


class TestKnCrossEntropy:
    def test_uniform_corpus_bits(self, spark):
        from zoi_spark import text as tx
        import math
        # one bigram type per context, every doc identical: each
        # doc's bigrams score p_kn("a b") = p_kn of the only bigram
        df = spark.createDataFrame(
            [(1, "a b", "s1"), (2, "a b", "s2")],
            "doc_id long, text string, source string")
        rows = {r["group"]: r for r in
                tx.kn_cross_entropy(df).collect()}
        # p_kn(b|a) = (2-.75)/2 + (.75/2)*1*1 = 1.0 -> bits 0, ppl 1
        assert rows["s1"]["bits"] == pytest.approx(0.0, abs=1e-6)
        assert rows["s1"]["ppl"] == pytest.approx(1.0, abs=1e-6)

    def test_divergent_source_higher_ppl(self, spark):
        from zoi_spark import text as tx
        common = [(i, "the cat sat on the mat", "norm")
                  for i in range(8)]
        odd = [(100, "zq xw vv kk jj pp", "odd")]
        df = spark.createDataFrame(
            common + odd, "doc_id long, text string, source string")
        rows = {r["group"]: r["ppl"] for r in
                tx.kn_cross_entropy(df).collect()}
        assert rows["odd"] > rows["norm"]


class TestTextrankKeywords:
    def test_hub_word_outranks_isolated_pair(self, spark):
        from zoi_spark import text as tx
        # "core" co-occurs with 4 distinct words; "isolated"/"pairx"
        # co-occur only with each other (same total count)
        docs = [(1, "core alpha core beta core gamma core delta"),
                (2, "isolated pairx isolated pairx isolated pairx")]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        rows = {r["word"]: r["rank"] for r in
                tx.textrank_keywords(df, top_k=10).collect()}
        assert rows["core"] > rows["isolated"]
        assert rows["core"] > rows["pairx"]

    def test_stopwords_and_nonalpha_excluded(self, spark):
        from zoi_spark import text as tx
        # only (alpha,beta) and (gamma,alpha) survive the filters:
        # pairs through "the"/"and"/"x9" never become edges
        df = spark.createDataFrame(
            [(1, "the alpha beta and alpha beta x9 gamma alpha")],
            "doc_id long, text string")
        words = {r["word"] for r in
                 tx.textrank_keywords(df, top_k=20).collect()}
        assert words == {"alpha", "beta", "gamma"}


class TestMultibyteAudit:
    def test_ascii_vs_multibyte_density(self, spark):
        from zoi_spark import text as tx
        df = spark.createDataFrame(
            [(1, "plain ascii", "en"), (2, "café", "fr"),
             (3, "中文文本", "zh")],
            "doc_id long, text string, lang string")
        out = {r["group"]: r for r in
               tx.multibyte_audit(df).collect()}
        assert out["en"]["bytes_per_char"] == 1.0
        assert out["en"]["ascii_doc_share"] == 1.0
        # "café": 4 chars, 5 bytes
        assert out["fr"]["total_chars"] == 4
        assert out["fr"]["total_bytes"] == 5
        assert out["fr"]["ascii_doc_share"] == 0.0
        # CJK: 3 bytes per char
        assert out["zh"]["bytes_per_char"] == 3.0


class TestRenyiProfile:
    def test_uniform_distribution_all_equal(self, spark):
        from zoi_spark import text as tx
        import math
        df = spark.createDataFrame([(1, "a b c d", "s")],
                                   "doc_id long, text string, source string")
        out = tx.renyi_profile(df).collect()[0]
        assert out["h0"] == pytest.approx(2.0)
        assert out["h1"] == pytest.approx(2.0)
        assert out["h2"] == pytest.approx(2.0)

    def test_spectrum_is_nonincreasing(self, spark):
        from zoi_spark import text as tx
        df = spark.createDataFrame(
            [(1, "a a a a a a b c d", "s")],
            "doc_id long, text string, source string")
        out = tx.renyi_profile(df).collect()[0]
        assert out["h0"] >= out["h1"] >= out["h2"]
        assert out["h0"] == pytest.approx(2.0)  # 4 types


class TestChaoShenEntropy:
    def test_fully_covered_sample_close_to_mle(self, spark):
        from zoi_spark import text as tx
        # no singletons -> coverage 1, h_cs ~ h_mle (HT weights ~1)
        df = spark.createDataFrame(
            [(1, "a a b b c c " * 10, "s")],
            "doc_id long, text string, lang string")
        out = tx.chao_shen_entropy(df).collect()[0]
        assert out["f1"] == 0 and out["coverage"] == 1.0
        assert out["h_cs"] == pytest.approx(out["h_mle"], abs=1e-3)

    def test_undersampled_corrects_upward(self, spark):
        from zoi_spark import text as tx
        # singletons present -> coverage < 1; CS estimate must not
        # fall below the (downward-biased) MLE
        df = spark.createDataFrame(
            [(1, "a a a b c d e f", "s")],
            "doc_id long, text string, lang string")
        out = tx.chao_shen_entropy(df).collect()[0]
        assert out["f1"] == 5
        assert out["coverage"] == pytest.approx(1 - 5 / 8)
        assert out["h_cs"] > out["h_mle"] - 1e-9

    def test_all_singletons_guarded(self, spark):
        from zoi_spark import text as tx
        # coverage 0: every shrunk probability is 0 -> guarded to 0
        df = spark.createDataFrame(
            [(1, "a b c d", "s")],
            "doc_id long, text string, lang string")
        out = tx.chao_shen_entropy(df).collect()[0]
        assert out["coverage"] == 0.0
        assert out["h_cs"] == 0.0


class TestHtmlEntityAudit:
    def test_entity_classes(self, spark):
        from zoi_spark import text as tx
        rows = [(1, "a &amp; b &#65; c & d &#x41; e", "s")]
        df = spark.createDataFrame(rows,
                                   "doc_id long, text string, source string")
        out = tx.html_entity_audit(df).collect()[0]
        assert out["n_named"] == 1
        assert out["n_numeric"] == 2
        assert out["n_bare_amp"] == 1
        assert out["docs_with_entities"] == 1

    def test_clean_text_all_zero(self, spark):
        from zoi_spark import text as tx
        df = spark.createDataFrame([(1, "no entities here", "s")],
                                   "doc_id long, text string, source string")
        out = tx.html_entity_audit(df).collect()[0]
        assert (out["n_named"], out["n_numeric"],
                out["n_bare_amp"]) == (0, 0, 0)


class TestControlCharAudit:
    def test_codepoint_classes(self, spark):
        from zoi_spark import text as tx
        t = "a\r\nb\rc\x07d﻿e f​g"
        df = spark.createDataFrame([(1, t, "s")],
                                   "doc_id long, text string, source string")
        out = tx.control_char_audit(df).collect()[0]
        assert out["n_crlf"] == 1
        assert out["n_bare_cr"] == 1   # the \r before c
        assert out["n_ctrl"] == 1      # BEL only; \r\n\t exempt
        assert (out["n_bom"], out["n_nbsp"], out["n_zwsp"]) \
            == (1, 1, 1)


class TestTruncationAudit:
    def test_ceiling_spike_and_terminal_share(self, spark):
        from zoi_spark import text as tx
        rows = ([(i, "x" * 80, "s") for i in range(6)]     # ceiling
                + [(10, "Good sentence.", "s"),
                   (11, "varied length here", "s")])
        df = spark.createDataFrame(rows,
                                   "doc_id long, text string, source string")
        out = tx.truncation_audit(df).collect()[0]
        assert out["modal_len"] == 80
        assert out["modal_share"] == pytest.approx(6 / 8)
        assert out["no_terminal_share"] == pytest.approx(7 / 8)

    def test_modal_tie_breaks_smallest_length(self, spark):
        from zoi_spark import text as tx
        rows = [(1, "aa", "s"), (2, "bbb", "s")]
        df = spark.createDataFrame(rows,
                                   "doc_id long, text string, source string")
        out = tx.truncation_audit(df).collect()[0]
        assert out["modal_len"] == 2


class TestShoutingAudit:
    def test_clickbait_vs_prose(self, spark):
        from zoi_spark import text as tx
        rows = [(1, "BUY NOW!!! AMAZING FREE DEAL!", "spam"),
                (2, "A calm, ordinary sentence here.", "prose")]
        df = spark.createDataFrame(rows,
                                   "doc_id long, text string, source string")
        out = {r["group"]: r for r in
               tx.shouting_audit(df).collect()}
        assert out["spam"]["caps_word_share"] == 1.0
        assert out["spam"]["n_multi_excl"] == 1
        assert out["prose"]["caps_word_share"] == 0.0
        assert out["prose"]["n_multi_excl"] == 0
        assert (out["spam"]["upper_char_share"]
                > out["prose"]["upper_char_share"])


class TestEmojiProfile:
    def test_counts_astral_emoji(self, spark):
        from zoi_spark import text as tx
        rows = [(1, "hello 🔥🔥 world", "a", 100),
                (2, "plain prose", "a", 200),
                (3, "🚀 to the moon 🚀🚀", "b", 50)]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, source string, n_chars long")
        out = {r["group"]: r for r in
               tx.emoji_profile(df, by="source").collect()}
        assert out["a"]["emoji_hits"] == 2
        assert out["a"]["docs_with_emoji"] == 1
        assert out["a"]["docs_share"] == 0.5
        assert out["b"]["emoji_hits"] == 3
        # per-kchar uses the STORED n_chars, not string length
        assert out["b"]["emoji_per_kchar"] == 60.0

    def test_emoji_free_zero(self, spark):
        from zoi_spark import text as tx
        rows = [(1, "no pictographs here", "a", 19)]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, source string, n_chars long")
        out = tx.emoji_profile(df, by="source").collect()[0]
        assert out["emoji_hits"] == 0 and out["docs_with_emoji"] == 0


class TestSocialResidue:
    def test_counts_each_kind(self, spark):
        from zoi_spark import text as tx
        rows = [(1, "read #ai news from @alice at https://x.co/a b",
                 "a", 1000),
                (2, "email-like a@b and #x too short", "a", 1000)]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, source string, n_chars long")
        out = tx.social_residue(df, by="source").collect()[0]
        assert out["hashtag_hits"] == 1        # '#x' too short
        assert out["mention_hits"] == 1        # 'a@b' not ws-preceded
        assert out["url_hits"] == 1
        assert out["docs_with_any"] == 1
        assert out["residue_per_kchar"] == 1.5

    def test_clean_prose_zero(self, spark):
        from zoi_spark import text as tx
        rows = [(1, "perfectly ordinary sentence.", "a", 28)]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, source string, n_chars long")
        out = tx.social_residue(df, by="source").collect()[0]
        assert out["docs_with_any"] == 0


class TestGibberishProfile:
    def test_mash_flagged(self, spark):
        from zoi_spark import text as tx
        rows = [(1, "the quick brown fox jumps over the lazy dog",
                 "a"),
                (2, "qwrtpsdfghjklzxcvbnm mash", "a"),
                (3, "normal prose again here", "b")]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, source string")
        out = {r["group"]: r for r in
               tx.gibberish_profile(df, by="source").collect()}
        assert out["a"]["n_flagged"] == 1
        assert out["a"]["flagged_share"] == 0.5
        assert out["a"]["max_run_seen"] >= 19
        assert out["b"]["n_flagged"] == 0

    def test_low_vowel_share_flagged(self, spark):
        from zoi_spark import text as tx
        # short runs but almost no vowels
        rows = [(1, "xz bc df gh jk lm np qr st", "a")]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, source string")
        out = tx.gibberish_profile(df, by="source").collect()[0]
        assert out["n_flagged"] == 1
        assert out["mean_vowel_share"] == 0.0

    def test_normal_english_clean(self, spark):
        from zoi_spark import text as tx
        rows = [(1, "strength through clarity and plain words", "a")]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, source string")
        out = tx.gibberish_profile(df, by="source").collect()[0]
        assert out["n_flagged"] == 0
        assert out["mean_vowel_share"] > 0.25


class TestCommonPrefixProfile:
    def test_shared_template_head(self, spark):
        from zoi_spark import text as tx
        rows = [(1, "HEADER || alpha body", "a"),
                (2, "HEADER || beta body", "a"),
                (3, "HEADER || gamma", "a"),
                (4, "totally different", "b"),
                (5, "unrelated words", "b")]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, source string")
        out = {r["group"]: r for r in
               tx.common_prefix_profile(df, by="source").collect()}
        assert out["a"]["lcp_len"] == len("HEADER || ")
        assert out["a"]["lcp_head"] == "HEADER || "
        assert out["b"]["lcp_len"] == 0
        assert out["b"]["lcp_head"] == ""

    def test_identical_docs_capped(self, spark):
        from zoi_spark import text as tx
        long = "z" * 500
        rows = [(1, long, "a"), (2, long, "a")]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, source string")
        out = tx.common_prefix_profile(df, by="source",
                                       cap=100).collect()[0]
        assert out["lcp_len"] == 100           # capped
        assert out["lcp_head"] == "z" * 20


class TestHyphenationArtifacts:
    def test_counts_break_kinds(self, spark):
        from zoi_spark import text as tx
        rows = [(1, "exam-\nple and hy-\nphens", "a", 100),
                (2, "clean text entirely", "a", 100),
                (3, "soft­hyphen here", "b", 50)]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, source string, n_chars long")
        out = {r["group"]: r for r in
               tx.hyphenation_artifacts(df, by="source").collect()}
        assert out["a"]["hyphen_breaks"] == 2
        assert out["a"]["dangling_hyphen_lines"] == 2
        assert out["a"]["docs_affected"] == 1
        assert out["b"]["soft_hyphens"] == 1
        assert out["b"]["artifacts_per_kchar"] == 20.0

    def test_ordinary_hyphens_not_flagged(self, spark):
        from zoi_spark import text as tx
        rows = [(1, "well-known state-of-the-art results", "a", 35)]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, source string, n_chars long")
        out = tx.hyphenation_artifacts(df, by="source").collect()[0]
        assert out["docs_affected"] == 0


class TestBidiAudit:
    def test_balanced_and_unbalanced(self, spark):
        from zoi_spark import text as tx
        rlo, pdf = "‮", "‬"
        rli, pdi = "⁧", "⁩"
        rows = [(1, f"ok {rlo}x{pdf} done", "a"),     # balanced
                (2, f"bad {rlo}half", "a"),           # unbalanced
                (3, f"iso {rli}x{pdi}", "b"),         # balanced iso
                (4, "clean prose", "b")]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, source string")
        out = {r["group"]: r for r in
               tx.bidi_audit(df, by="source").collect()}
        assert out["a"]["n_overrides"] == 3     # 2x RLO + 1x PDF
        assert out["a"]["docs_affected"] == 2
        assert out["a"]["unbalanced_docs"] == 1
        assert out["b"]["n_isolates"] == 2
        assert out["b"]["unbalanced_docs"] == 0

    def test_clean_corpus_silent(self, spark):
        from zoi_spark import text as tx
        rows = [(1, "nothing suspicious here", "a")]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, source string")
        out = tx.bidi_audit(df, by="source").collect()[0]
        assert out["n_overrides"] == 0 and out["unbalanced_docs"] == 0


class TestYuleK:
    def test_repetitive_higher_than_rich(self, spark):
        from zoi_spark import text as tx
        import string
        rep = " ".join(["the cat sat"] * 50)
        words = [a + b + c for a in string.ascii_lowercase
                 for b in string.ascii_lowercase
                 for c in "xyz"][:150]
        rich = " ".join(words)
        rows = [(1, rep, "a"), (2, rich, "b")]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, source string")
        out = {r["group"]: r for r in
               tx.yule_k(df, by="source").collect()}
        assert out["a"]["yule_k"] > 100 * out["b"]["yule_k"] or \
            out["b"]["yule_k"] == 0.0
        assert out["b"]["n_types"] == 150

    def test_hand_value(self, spark):
        from zoi_spark import text as tx
        # tokens: a a a b b c -> N=6, sum n^2 = 9+4+1 = 14
        rows = [(1, "a a a b b c", "s")]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, source string")
        out = tx.yule_k(df, by="source").collect()[0]
        assert out["n_tokens"] == 6 and out["n_types"] == 3
        assert out["yule_k"] == round(1e4 * (14 - 6) / 36, 6)


class TestCorpusScorecard:
    def test_signals_fire_on_seeded_docs(self, spark):
        from zoi_spark import text as tx
        rows = [(1, "clean ordinary prose about things", "a", 34),
                (2, "fire 🔥 emoji and #tag plus http://x.co/a",
                 "a", 41),
                (3, "contact me at bob@example.com please", "a", 36),
                (4, "clean ordinary prose about things", "a", 34)]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, source string, n_chars long")
        out = tx.corpus_scorecard(df).collect()[0]
        assert out["n_docs"] == 4
        assert out["dup_fingerprint_ratio"] == 0.75   # one exact dup
        assert out["emoji_per_kdoc"] == 250.0
        assert out["social_per_kdoc"] == 500.0        # #tag + url
        assert out["pii_email_per_kdoc"] == 250.0
        assert out["gibberish_share"] == 0.0
        assert 0.3 < out["vowel_share"] < 0.55

    def test_single_pass_plan(self, spark):
        from zoi_spark import text as tx
        rows = [(1, "anything at all", "a", 15)]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, source string, n_chars long")
        plan = tx.corpus_scorecard(df)._jdf.queryExecution() \
            .optimizedPlan().toString()
        # ONE scan feeds everything: the relation appears once
        assert plan.count("LogicalRDD") <= 1


class TestChecksumValidators:
    def test_isbn13_known_vectors(self, spark):
        from zoi_spark import text as tx
        rows = [("9780306406157",),   # valid (classic test vector)
                ("9780131103627",),   # valid (K&R C)
                ("9780306406158",),   # bad check digit
                ("978030640615",),    # 12 digits
                ("97803064061570",),  # 14 digits
                ("978030640615a",),   # non-digit
                (None,)]
        df = spark.createDataFrame(rows, "s string")
        out = [r["ok"] for r in df.select(
            tx.isbn13_valid(F.col("s")).alias("ok")).collect()]
        assert out == [True, True, False, False, False, False,
                       False]

    def test_iban_known_vectors(self, spark):
        from zoi_spark import text as tx
        rows = [("GB82WEST12345698765432",),   # valid
                ("DE89370400440532013000",),   # valid
                ("FR1420041010050500013M02606",),  # valid, letters
                ("gb82west12345698765432",),   # lowercase ok
                ("GB82WEST12345698765433",),   # bad check
                ("GB82WEST1234569876543",),    # wrong length ok?
                ("1234",)]
        df = spark.createDataFrame(rows, "s string")
        out = [r["ok"] for r in df.select(
            tx.iban_valid(F.col("s")).alias("ok")).collect()]
        assert out[:5] == [True, True, True, True, False]
        assert out[6] is False                 # shape-gated

    def test_single_digit_corruption_always_caught(self, spark):
        from zoi_spark import text as tx
        base = "9780306406157"
        rows = []
        for pos in range(13):
            d = (int(base[pos]) + 1) % 10
            rows.append((base[:pos] + str(d) + base[pos + 1:],))
        df = spark.createDataFrame(rows, "s string")
        out = [r["ok"] for r in df.select(
            tx.isbn13_valid(F.col("s")).alias("ok")).collect()]
        assert not any(out)          # every single-digit bump fails


class TestGriesDP:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows,
                                     "doc_id long, text string, source string")

    def test_corpus_proportional_term_zero(self, spark):
        from zoi_spark import text as tx
        rows = [(0, "b b b b a a a a", "X"),     # X: 8 tokens
                (1, "b x", "Y")]                 # Y: 2 tokens
        out = {r["token"]: r for r in
               tx.gries_dp(self._df(spark, rows), part_col="source",
                           k=5, min_cf=1).collect()}
        # "a" lives only in X (s_X=.8): DP = .5*(|1-.8| + .2) = 0.2
        assert out["a"]["dp"] == 0.2
        # "b": 4/1 split == 8/2 corpus split -> DP = 0
        assert out["b"]["dp"] == 0.0
        # "x" only in Y (s_Y=.2): DP = .5*(|1-.2| + .8) = 0.8
        assert out["x"]["dp"] == 0.8

    def test_ordering_and_cut(self, spark):
        from zoi_spark import text as tx
        rows = [(0, "c c c d d", "X"), (1, "c d e", "Y")]
        out = tx.gries_dp(self._df(spark, rows), part_col="source",
                          k=2, min_cf=1).collect()
        assert [r["token"] for r in out] == ["c", "d"]  # cf desc
        assert out[0]["cf"] == 4


class TestDammChecksum:
    def test_known_vector_and_corruptions(self, spark):
        from zoi_spark import text as tx
        rows = [("5724",),      # canonical Damm example: valid
                ("5723",),      # wrong check digit
                ("7524",),      # adjacent transposition: caught
                ("572a",), ("",), (None,)]
        df = spark.createDataFrame(rows, "s string")
        out = [r["ok"] for r in df.select(
            tx.damm_valid(F.col("s")).alias("ok")).collect()]
        assert out == [True, False, False, False, False, False]

    def test_check_digit_closes_chain(self, spark):
        from zoi_spark import text as tx
        df = spark.createDataFrame([("572",), ("123456789",)],
                                   "p string")
        out = df.select(
            F.concat(F.col("p"),
                     tx.damm_interim(F.col("p")).cast("string"))
            .alias("full")).select(
            tx.damm_valid(F.col("full")).alias("ok")).collect()
        assert all(r["ok"] for r in out)

    def test_every_single_digit_bump_caught(self, spark):
        from zoi_spark import text as tx
        base = "5724"
        rows = []
        for pos in range(4):
            d = (int(base[pos]) + 3) % 10
            rows.append((base[:pos] + str(d) + base[pos + 1:],))
        df = spark.createDataFrame(rows, "s string")
        out = [r["ok"] for r in df.select(
            tx.damm_valid(F.col("s")).alias("ok")).collect()]
        assert not any(out)


class TestSoundex:
    def test_canonical_vectors(self, spark):
        from zoi_spark import text as tx
        vec = [("Robert", "R163"), ("Rupert", "R163"),
               ("Ashcraft", "A261"),      # the H/W rule
               ("Ashcroft", "A261"), ("Tymczak", "T522"),
               ("Pfister", "P236"), ("Honeyman", "H555"),
               ("Washington", "W252"), ("Lee", "L000"),
               ("Gutierrez", "G362"), ("Jackson", "J250"),
               ("O'Brien", "O165")]
        df = spark.createDataFrame([(w,) for w, _ in vec],
                                   "w string")
        out = [r["k"] for r in df.select(
            tx.soundex_key(F.col("w")).alias("k")).collect()]
        assert out == [k for _, k in vec]

    def test_null_and_letterless(self, spark):
        from zoi_spark import text as tx
        df = spark.createDataFrame([(None,), ("123",), ("",)],
                                   "w string")
        out = [r["k"] for r in df.select(
            tx.soundex_key(F.col("w")).alias("k")).collect()]
        assert out == [None, None, None]

    def test_vowel_separates_codes(self, spark):
        from zoi_spark import text as tx
        # 'Tested': T, s->2, t->3, d->3 with vowels between: T230...
        df = spark.createDataFrame([("Tested",), ("Tssttdd",)],
                                   "w string")
        out = [r["k"] for r in df.select(
            tx.soundex_key(F.col("w")).alias("k")).collect()]
        assert out[0] == "T233"      # vowels keep t/d separate
        assert out[1] == "T230"      # runs collapse without vowels


class TestIndexGapBits:
    def test_hand_postings(self, spark):
        from zoi_spark import text as tx
        # "t" in docs 1,3,7 -> gaps 2,2,4 (first codes id+1=2)
        rows = [(1, "t a"), (3, "t b"), (7, "t c"),
                (2, "a b"), (4, "a c"), (5, "a d"), (6, "b d"),
                (8, "b e"), (9, "c d"), (10, "c e")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["token"]: r for r in tx.index_gap_bits(
            df, k=5, min_df=3).collect()}
        # gamma bits: g=2 -> 3 bits, g=2 -> 3, g=4 -> 5
        assert out["t"]["df"] == 3
        assert out["t"]["total_bits"] == 11
        assert out["t"]["bits_per_posting"] == round(11 / 3, 6)

    def test_dense_postings_compress_harder(self, spark):
        from zoi_spark import text as tx
        rows = ([(i, "dense x") for i in range(40)]
                + [(i * 50, "sparse y") for i in range(1, 9)])
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["token"]: r["bits_per_posting"]
               for r in tx.index_gap_bits(df, k=5,
                                          min_df=3).collect()}
        assert out["dense"] < out["sparse"]


class TestVocabKnee:
    def test_sharp_head_knee(self, spark):
        from zoi_spark import text as tx
        # two huge head tokens, long flat tail: knee right after head
        docs, did = [], 0
        for _ in range(200):
            docs.append((did, "alpha")); did += 1
        for _ in range(150):
            docs.append((did, "beta")); did += 1
        for i in range(40):
            for _ in range(5):
                docs.append((did, f"tail{i:02d}")); did += 1
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = tx.vocab_knee(df, k=42).collect()[0]
        assert out["knee_rank"] <= 4      # the elbow is in the head
        assert out["gap"] > 0.5

    def test_linear_curve_degenerate(self, spark):
        from zoi_spark import text as tx
        docs, did = [], 0
        for i in range(10):
            for _ in range(10 - i):
                docs.append((did, f"w{i}")); did += 1
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = tx.vocab_knee(df, k=10).collect()[0]
        # perfectly linear: every gap 0, tie -> rank 1
        assert out["gap"] == 0.0 and out["knee_rank"] == 1


class TestTypographyCensus:
    def test_pipeline_fingerprints(self, spark):
        from zoi_spark import text as tx
        rows = [(0, 'he said "hi" and \'bye\' ...', "term"),
                (1, "she said “hello” and ‘so’ … — yes", "word"),
                (2, "code `x` and \"y\"", "term")]
        df = spark.createDataFrame(rows,
                                   "doc_id long, text string, source string")
        out = {r["group"]: r for r in tx.typography_census(
            df).collect()}
        assert out["term"]["straight_quotes_per_kc"] > 0
        assert out["term"]["curly_quotes_per_kc"] == 0.0
        assert out["word"]["curly_quotes_per_kc"] > 0
        assert out["word"]["ellipsis_char_per_kc"] > 0
        assert out["word"]["dashes_per_kc"] > 0
        assert out["term"]["dot_runs_per_kc"] > 0
        assert out["term"]["backticks_per_kc"] > 0


class TestAMSF2:
    def test_exact_and_sketch_match_reference(self, spark):
        from zoi_spark import text as tx
        import hashlib
        docs = [(0, "a a a b b c"), (1, "a b d d"), (2, "c c e")]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = tx.ams_f2(df, estimators=16).collect()[0]
        counts = {"a": 4, "b": 3, "c": 3, "d": 2, "e": 1}
        f2 = sum(c * c for c in counts.values())
        assert out["f2_exact"] == f2
        assert out["n_tokens"] == 13 and out["n_distinct"] == 5
        # replicate the md5-signed projections in plain python
        def sign(k, tok):
            h = hashlib.md5(f"{k}:{tok}".encode()).hexdigest()[:8]
            return 1 if int(h, 16) % 2 == 0 else -1
        zs = [sum(sign(k, t) * c for t, c in counts.items())
              for k in range(16)]
        est = sum(z * z for z in zs) / 16.0
        assert out["f2_ams"] == round(est, 6)
        assert out["rel_error"] == round(abs(est - f2) / f2, 6)


class TestGoodToulmin:
    def test_hand_prediction(self, spark):
        from zoi_spark import text as tx
        # fit half (even ids): counts a:1 b:2 c:1 -> V1=2, V2=1
        # -> delta_hat = 2 - 1 = 1; held half brings exactly 'd'
        rows = [(0, "a b b c"), (1, "b c d")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = tx.good_toulmin(df).collect()[0]
        assert out["v_fit"] == 3
        assert out["delta_hat"] == 1
        assert out["delta_actual"] == 1
        assert out["rel_error"] == 0.0

    def test_saturated_vocab(self, spark):
        from zoi_spark import text as tx
        rows = [(i, "x y z x y z") for i in range(10)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = tx.good_toulmin(df).collect()[0]
        # fit counts are all 10 (even) -> V10=3 lands with a minus
        # sign: the raw GT series oscillates (its known weakness,
        # deliberately reported un-truncated); actual new vocab is 0
        assert out["delta_hat"] == -3
        assert out["delta_actual"] == 0


class TestGreedySourceCover:
    def test_picks_and_break(self, spark):
        from zoi_spark import text as tx
        rows = [(0, "a b c", "X"),       # bigrams: 'a b', 'b c'
                (1, "a b", "Y"),          # subset of X
                (2, "c d", "Z")]          # new bigram 'c d'
        df = spark.createDataFrame(rows,
                                   "doc_id long, text string, source string")
        out = tx.greedy_source_cover(df, k=3).collect()
        assert [(r["source"], r["gain"]) for r in out] == \
            [("X", 2), ("Z", 1)]          # Y adds nothing: loop ends
        assert out[-1]["covered_total"] == 3

    def test_gains_non_increasing(self, spark):
        from zoi_spark import text as tx
        rows = [(i, " ".join(f"t{i}_{j}" for j in range(i + 2)),
                 f"s{i}") for i in range(6)]
        df = spark.createDataFrame(rows,
                                   "doc_id long, text string, source string")
        out = tx.greedy_source_cover(df, k=4).collect()
        gains = [r["gain"] for r in out]
        assert gains == sorted(gains, reverse=True)


class TestNBLangIdEval:
    def test_separable_langs_perfect(self, spark):
        from zoi_spark import text as tx
        rows = []
        for i in range(20):
            rows.append((2 * i, "aaa bbb aaa", "A"))      # train A
            rows.append((2 * i + 100 + 1, "aaa bbb", "A"))  # odd: test
        for i in range(20):
            rows.append((1000 + 2 * i, "ccc ddd ccc", "B"))
            rows.append((1000 + 2 * i + 1, "ccc ddd", "B"))
        df = spark.createDataFrame(rows,
                                   "doc_id long, text string, lang string")
        out = {r["lang"]: r for r in tx.nb_langid_eval(df).collect()}
        assert out["A"]["accuracy"] == 1.0
        assert out["B"]["accuracy"] == 1.0

    def test_unseen_tokens_fall_back_to_prior(self, spark):
        from zoi_spark import text as tx
        # test docs made of tokens the training half never saw:
        # every candidate scores only prior+unseen mass, and the
        # argmax resolves deterministically
        rows = [(0, "aaa aaa", "A"), (2, "bbb bbb", "B"),
                (4, "aaa", "A"), (6, "bbb", "B"),
                (1, "zzz qqq", "A"), (3, "zzz qqq", "B")]
        df = spark.createDataFrame(rows,
                                   "doc_id long, text string, lang string")
        out = tx.nb_langid_eval(df).collect()
        assert sum(r["n_docs"] for r in out) == 2
        # both test docs get the SAME predicted lang (tie rules)
        assert sum(r["n_correct"] for r in out) == 1


class TestNBLangIdConfusion:
    def test_cells_sum_to_eval(self, spark):
        from zoi_spark import text as tx
        rows = []
        for i in range(10):
            rows.append((2 * i, "aaa bbb", "A"))
            rows.append((2 * i + 1, "aaa bbb", "A"))
            rows.append((100 + 2 * i, "ccc ddd", "B"))
            rows.append((100 + 2 * i + 1, "ccc ddd", "B"))
        df = spark.createDataFrame(rows,
                                   "doc_id long, text string, lang string")
        cells = tx.nb_langid_confusion(df).collect()
        total = sum(r["n"] for r in cells)
        ev = tx.nb_langid_eval(df).collect()
        assert total == sum(r["n_docs"] for r in ev)
        # separable corpus: only diagonal cells, row shares 1
        assert all(r["true_lang"] == r["pred_lang"] for r in cells)
        assert all(r["row_share"] == 1.0 for r in cells)


class TestSymspellTypos:
    def test_repair_pairs_found(self, spark):
        from zoi_spark import text as tx
        docs, did = [], 0
        for _ in range(60):
            docs.append((did, "hello world")); did += 1
        docs += [(did, "helo there"), (did + 1, "wxrld again"),
                 (did + 2, "zzz unrelated")]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = {(r["rare_token"], r["frequent_token"]): r
               for r in tx.symspell_typo_pairs(
                   df, rare_max=2, freq_min=50, top=10).collect()}
        assert ("helo", "hello") in out
        assert ("wxrld", "world") in out
        assert not any(rt == "zzz" for rt, _ in out)

    def test_distance_two_not_matched(self, spark):
        from zoi_spark import text as tx
        docs = [(i, "hello") for i in range(60)]
        docs.append((100, "hxlxo only"))     # two substitutions
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = tx.symspell_typo_pairs(df, rare_max=2, freq_min=50,
                                     top=10).collect()
        assert not any(r["rare_token"] == "hxlxo" for r in out)


class TestCasingVariants:
    def test_variant_census(self, spark):
        from zoi_spark import text as tx
        docs = ([(i, "Apple pie") for i in range(6)]
                + [(10 + i, "apple tart") for i in range(3)]
                + [(20, "APPLE crumble"), (21, "plain words")])
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = {r["token_lower"]: r for r in tx.casing_variants(
            df, top=5, min_total=2).collect()}
        a = out["apple"]
        assert a["n_casings"] == 3 and a["total_cf"] == 10
        assert a["dominant"] == "Apple"
        assert a["dominant_share"] == 0.6
        assert "plain" not in out            # single casing


class TestRichnessIndices:
    def test_hand_panel(self, spark):
        from zoi_spark import text as tx
        import math
        # corpus: a x4, b x2, c x1, d x1 -> N=8, V=4, V1=2, V2=1
        rows = [(0, "a a a a b b c d", "x")]
        df = spark.createDataFrame(rows,
                                   "doc_id long, text string, lang string")
        out = tx.richness_indices(df, by="lang").collect()[0]
        assert (out["n_tokens"], out["v"], out["v1"],
                out["v2"]) == (8, 4, 2, 1)
        assert out["sichel_s"] == 0.25
        assert out["honore_r"] == round(100 * math.log(8)
                                        / (1 - 2 / 4), 6)
        assert out["margalef"] == round(3 / math.log(8), 6)
        assert out["menhinick"] == round(4 / math.sqrt(8), 6)
        h = -sum(p * math.log(p) for p in (0.5, 0.25, 0.125, 0.125))
        assert out["pielou_j"] == round(h / math.log(4), 6)

    def test_all_hapax_honore_null(self, spark):
        from zoi_spark import text as tx
        rows = [(0, "p q r s", "x")]
        df = spark.createDataFrame(rows,
                                   "doc_id long, text string, lang string")
        out = tx.richness_indices(df, by="lang").collect()[0]
        assert out["honore_r"] is None
        assert out["pielou_j"] == 1.0        # perfectly even


class TestCLIARI:
    def test_hand_scores(self, spark):
        from zoi_spark import text as tx
        import math
        txt = "The cat sat. The dog ran!"
        rows = [(0, txt, "x")]
        df = spark.createDataFrame(rows,
                                   "doc_id long, text string, lang string")
        out = tx.cli_ari(df, by="lang").collect()[0]
        l = sum(ch.isalpha() for ch in txt)
        w, s = 6, 2
        cli = 0.0588 * (100 * l / w) - 0.296 * (100 * s / w) - 15.8
        ari = 4.71 * (l / w) + 0.5 * (w / s) - 21.43
        assert out["cli"] == round(cli, 6)
        assert out["ari"] == round(ari, 6)

    def test_no_terminator_floors_sentences(self, spark):
        from zoi_spark import text as tx
        rows = [(0, "words without any stops here", "x")]
        df = spark.createDataFrame(rows,
                                   "doc_id long, text string, lang string")
        out = tx.cli_ari(df, by="lang").collect()[0]
        assert out["n_docs"] == 1            # s floored at 1, no div0
