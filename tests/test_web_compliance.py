"""Hand-value tests for the wave-35 web-compliance / substring-dedup
operators: exact_substring_spans, sorted_neighborhood_pairs,
robots_rules/robots_check, sitemap_locs, link_density_strip."""

from pyspark.sql import functions as F
from zoi_spark import dedup, text, urls


def _spans(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.exact_substring_spans(df, **kw)
    return {tuple(r) for r in
            out.select("id_a", "id_b", "start_a", "start_b",
                       "len_tokens").collect()}


def test_substring_spans_exact_dup_and_partial(spark):
    rows = [(1, "a b c d e f g h i j k l"),
            (2, "x y c d e f g h i j z q"),
            (3, "none of these words match anything"),
            (4, "a b c d e f g h i j k l")]
    got = _spans(spark, rows, min_len=4)
    # 1↔4 exact dup: one maximal span covering all 12 tokens
    assert (1, 4, 1, 1, 12) in got
    # 1↔2 share tokens 3..10 (c..j), 8 tokens, starting at pos 3 in both
    assert (1, 2, 3, 3, 8) in got
    # doc 3 pairs with nothing
    assert not any(3 in (a, b) for a, b, *_ in got)


def test_substring_spans_distinct_diagonals_stay_separate(spark):
    # shared run appears at DIFFERENT offsets: diagonal separates them
    rows = [(1, "p q r s t u v w"),
            (2, "z z z p q r s t u x y")]
    got = _spans(spark, rows, min_len=4)
    # tokens p..u (6 tokens) shared, doc1 pos 1, doc2 pos 4
    assert got == {(1, 2, 1, 4, 6)}


def test_substring_spans_short_docs_pair_via_degenerate_window(spark):
    rows = [(1, "tiny doc"), (2, "tiny doc"), (3, "other doc")]
    got = _spans(spark, rows, min_len=5)
    # whole-doc degenerate windows: the exact short dup still pairs
    assert (1, 2, 1, 1, 5) in got and len(got) == 1


def test_substring_spans_df_pruning_drops_viral_windows(spark):
    rows = [(i, "common run of five words plus tail%d" % i)
            for i in range(1, 6)]
    all_pairs = _spans(spark, rows, min_len=5)
    pruned = _spans(spark, rows, min_len=5, max_window_docs=4)
    assert len(all_pairs) == 10  # C(5,2) — every pair shares the run
    assert pruned == set()       # window sits in 5 > 4 docs → excluded


def test_sorted_neighborhood_window_and_blocks(spark):
    df = spark.createDataFrame(
        [(1, "aaa"), (2, "aab"), (3, "aac"), (4, "zzz")],
        "doc_id long, k string")
    out = dedup.sorted_neighborhood_pairs(df, key_col="k", window=2)
    got = {(r.id_a, r.id_b, r.offset) for r in out.collect()}
    assert got == {(1, 2, 1), (1, 3, 2), (2, 3, 1), (2, 4, 2), (3, 4, 1)}
    # 1-char blocks: the a-block pairs survive, nothing crosses to z
    blocked = dedup.sorted_neighborhood_pairs(df, key_col="k", window=2,
                                              block_chars=1)
    got_b = {(r.id_a, r.id_b, r.offset) for r in blocked.collect()}
    assert got_b == {(1, 2, 1), (1, 3, 2), (2, 3, 1)}


def test_robots_rules_groups_and_stacked_agents(spark):
    body = ("# hi\nUser-agent: *\nDisallow: /private\nAllow: /pub\n\n"
            "User-agent: gptbot\nUser-agent: ccbot\nDisallow: /\n"
            "Crawl-delay: 5\nDisallow:\n")
    df = spark.createDataFrame([("ex.com", body)],
                               "host string, robots_txt string")
    got = {tuple(r) for r in urls.robots_rules(df).collect()}
    assert got == {
        ("ex.com", "*", "disallow", "/private"),
        ("ex.com", "*", "allow", "/pub"),
        ("ex.com", "gptbot", "disallow", "/"),
        ("ex.com", "ccbot", "disallow", "/"),
    }  # comment ignored, empty Disallow dropped, stacked UAs share rules


def test_robots_check_precedence_and_fallback(spark):
    rules = spark.createDataFrame(
        [("ex.com", "*", "disallow", "/private"),
         ("ex.com", "*", "allow", "/private/pub"),
         ("ex.com", "bot", "disallow", "/only")],
        "host string, agent string, rule string, path string")
    uu = spark.createDataFrame(
        [("http://ex.com/private/pub/x",),   # allow beats shorter disallow
         ("http://ex.com/private/y",),       # disallowed
         ("http://ex.com/free",),            # no match → allowed
         ("http://other.com/a",)],           # no rules → allowed
        "url string")
    got = {r.url: (r.allowed, r.rule_path)
           for r in urls.robots_check(uu, rules, agent="*").collect()}
    assert got["http://ex.com/private/pub/x"] == (True, "/private/pub")
    assert got["http://ex.com/private/y"] == (False, "/private")
    assert got["http://ex.com/free"] == (True, None)
    assert got["http://other.com/a"] == (True, None)
    # exact-agent group EXCLUDES the * group (RFC 9309 group selection)
    got_bot = {r.url: r.allowed
               for r in urls.robots_check(uu, rules, agent="Bot").collect()}
    assert got_bot["http://ex.com/private/y"] is True  # '*' rule not used


def test_sitemap_locs_trim_and_case(spark):
    df = spark.createDataFrame(
        [(1, "<url><loc> http://A.com/p1 </loc></url>"
             "<url><LOC>http://a.com/p2</LOC></url>"),
         (2, "no locs here")],
        "doc_id long, text string")
    got = {(r.doc_id, r.loc, r.host)
           for r in urls.sitemap_locs(df).collect()}
    assert got == {(1, "http://A.com/p1", "a.com"),
                   (1, "http://a.com/p2", "a.com")}


def test_link_density_strip_keeps_prose_drops_nav(spark):
    body = ("This is a long paragraph of body prose with enough "
            "characters to keep and just one <a href='/y'>link</a> in it.")
    html = ("<div>Nav: <a href='/'>home</a> <a href='/x'>x</a></div>"
            f"<p>{body}</p><div><a>f</a></div>")
    df = spark.createDataFrame([(1, html)], "doc_id long, text string")
    row = text.link_density_strip(df).collect()[0]
    assert row.n_kept == 1
    assert row.main_text.startswith("This is a long paragraph")
    assert "home" not in row.main_text  # nav block dropped (density 1)
    assert "<a" not in row.main_text    # tags stripped from kept blocks


def test_link_density_strip_threshold_boundary(spark):
    # visible 30 chars, anchor 15 → density 0.5: kept at the default cap
    at = "<p>" + "x" * 15 + "<a>" + "y" * 15 + "</a></p>"
    over = "<p>" + "x" * 10 + "<a>" + "y" * 20 + "</a></p>"
    df = spark.createDataFrame([(1, at), (2, over)],
                               "doc_id long, text string")
    got = {r.doc_id: r.n_kept
           for r in text.link_density_strip(df).collect()}
    assert got == {1: 1, 2: 0}


class TestFrontierPriority:
    def test_opic_mass_split(self, spark):
        import pytest
        edges = spark.createDataFrame(
            [("s1", "u1"), ("s1", "u2"), ("s2", "u2")],
            "src string, dst string")
        quality = spark.createDataFrame(
            [("s1", 0.8), ("s2", 0.5)], "src string, quality double")
        out = {r["dst"]: r for r in
               urls.frontier_priority(edges, quality).collect()}
        # s1 splits 0.8 over 2 outlinks; s2 sends all 0.5 to u2
        assert out["u1"]["n_parents"] == 1
        assert out["u1"]["priority"] == pytest.approx(0.4)
        assert out["u2"]["n_parents"] == 2
        assert out["u2"]["priority"] == pytest.approx(0.9)

    def test_mass_conservation(self, spark):
        import pytest
        edges = spark.createDataFrame(
            [("a", "x"), ("a", "y"), ("a", "z"), ("b", "x")],
            "src string, dst string")
        quality = spark.createDataFrame(
            [("a", 0.9), ("b", 0.3), ("orphan", 1.0)],
            "src string, quality double")
        rows = urls.frontier_priority(edges, quality).collect()
        # orphan has no outlinks: its mass is not distributed
        assert sum(r["priority"] for r in rows) == pytest.approx(1.2)


class TestBadwordRate:
    def test_whole_word_case_insensitive(self, spark):
        from zoi_spark import text as tx
        rows = [("en", "a SLOW query"), ("en", "slowly but surely"),
                ("de", "legacy system"), ("de", "clean")]
        df = spark.createDataFrame(rows, "lang string, text string")
        out = {r["lang"]: r for r in tx.badword_rate(
            df, ["slow", "legacy"], by="lang").collect()}
        # 'slowly' must NOT match (word boundary)
        assert out["en"]["n_flagged"] == 1
        assert abs(out["de"]["flag_rate"] - 0.5) < 1e-9

    def test_rejects_non_word_terms(self, spark):
        import pytest as _pt
        from zoi_spark import text as tx
        df = spark.createDataFrame([("x",)], "text string")
        with _pt.raises(ValueError):
            tx.badword_rate(df, ["a.b"])
        with _pt.raises(ValueError):
            tx.badword_rate(df, [])


class TestPctEncodingAudit:
    def test_escape_classes(self, spark):
        from zoi_spark import urls
        rows = [(1, "http://a/x%20y"),        # one valid
                (2, "http://a/%2541"),        # valid AND double
                (3, "http://a/%zz"),          # invalid
                (4, "http://a/%e9%a1"),       # two valid
                (5, "http://a/plain")]        # no '%' -> excluded
        df = spark.createDataFrame(rows, "i long, url string")
        out = {r["url"]: r for r in
               urls.pct_encoding_audit(df).collect()}
        assert len(out) == 4
        assert out["http://a/x%20y"]["n_valid_escapes"] == 1
        r2 = out["http://a/%2541"]
        assert (r2["n_valid_escapes"], r2["n_double_encoded"]) \
            == (1, 1)
        r3 = out["http://a/%zz"]
        assert (r3["n_valid_escapes"], r3["n_invalid_escapes"]) \
            == (0, 1)
        assert out["http://a/%e9%a1"]["n_valid_escapes"] == 2

    def test_trailing_truncated_escape_invalid(self, spark):
        from zoi_spark import urls
        df = spark.createDataFrame([(1, "http://a/%2")],
                                   "i long, url string")
        r = urls.pct_encoding_audit(df).collect()[0]
        assert r["n_invalid_escapes"] == 1


class TestRegistrableDomain:
    def test_psl_and_fallbacks(self, spark):
        from zoi_spark import urls
        rows = [("news.BBC.co.uk",), ("m.bbc.co.uk",),
                ("a.b.c.example.com",), ("example.com",),
                ("shop.x.com.au",), ("localhost",), ("co.uk",)]
        df = spark.createDataFrame(rows, "h string")
        out = [r["rd"] for r in df.select(
            urls.registrable_domain(F.col("h")).alias("rd"))
            .collect()]
        assert out[0] == "bbc.co.uk" and out[1] == "bbc.co.uk"
        assert out[2] == "example.com"
        assert out[3] == "example.com"
        assert out[4] == "x.com.au"
        assert out[5] == "localhost"      # single label passes thru
        # bare public suffix has no registrable part: falls back to
        # the two-label string itself (documented mini-PSL limit)
        assert out[6] == "co.uk"

    def test_extra_suffixes(self, spark):
        from zoi_spark import urls
        df = spark.createDataFrame([("a.b.example.test",)], "h string")
        out = df.select(urls.registrable_domain(
            F.col("h"), extra_suffixes=("example.test",))
            .alias("rd")).collect()[0]["rd"]
        assert out == "b.example.test"


class TestLangScriptAgreement:
    def test_mislabeled_rows_flagged(self, spark):
        from zoi_spark import text as tx
        rows = [(0, "hello plain english words", "en"),
                (1, "你好世界", "zh"),     # real CJK
                (2, "latin text labeled chinese", "zh"),
                (3, "mixed 你好 ok", "en")]
        df = spark.createDataFrame(rows,
                                   "doc_id long, text string, lang string")
        out = {r["lang"]: r for r in tx.lang_script_agreement(
            df).collect()}
        assert out["en"]["n"] == 2 and out["en"]["n_agree"] == 2
        assert out["zh"]["n"] == 2 and out["zh"]["n_agree"] == 1
        assert out["zh"]["agree_share"] == 0.5
