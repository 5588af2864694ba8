"""Hand-value tests for the wave-36 operators: l_diversity_audit,
crawl_schedule_plan, bpe_pair_counts."""

import math

from zoi_spark import tablechecks, text, urls


def test_l_diversity_distinct_and_entropy_gates(spark):
    # group A: 4 rows, one sensitive value -> k-anonymous but NOT
    # l-diverse; group B: 4 rows, two balanced values -> l=2 ok;
    # group C: 4 rows, values 3+1 -> distinct-2 ok, entropy < ln(2)
    rows = ([("A", "s1")] * 4 + [("B", "s1")] * 2 + [("B", "s2")] * 2
            + [("C", "s1")] * 3 + [("C", "s2")])
    df = spark.createDataFrame(rows, "qi string, s string")
    got = {r.qi: r for r in tablechecks.l_diversity_audit(
        df, qi_cols=["qi"], sensitive_col="s", l=2).collect()}
    assert (got["A"].n, got["A"].l_distinct, got["A"].entropy,
            got["A"].ok) == (4, 1, 0.0, False)
    assert got["B"].ok is True
    assert got["B"].entropy == round(math.log(2), 6)
    # H(3/4, 1/4) = ln4 - (3 ln3)/4 ≈ 0.562335 < ln 2
    assert got["C"].l_distinct == 2
    assert got["C"].entropy == round(math.log(4) - 3 * math.log(3) / 4, 6)
    assert got["C"].ok is False


def test_crawl_schedule_plan_bounds_and_bottleneck(spark):
    # h1: 10 urls, h2: 2, h3: 2 -> total 14; delay 1s, 2 slots:
    # host bound 10s > fleet bound 7s -> host-bound makespan
    rows = [("h1",)] * 10 + [("h2",)] * 2 + [("h3",)] * 2
    df = spark.createDataFrame(rows, "host string")
    r = urls.crawl_schedule_plan(df, delay_s=1.0, parallelism=2) \
        .collect()[0]
    assert (r.n_hosts, r.n_urls, r.max_host_urls) == (3, 14, 10)
    assert r.bottleneck_host == "h1"
    assert (r.host_time_s, r.fleet_time_s, r.makespan_lb_s,
            r.host_bound) == (10.0, 7.0, 10.0, True)
    # with 14 slots the fleet bound collapses to 1s; host chain rules
    r2 = urls.crawl_schedule_plan(df, delay_s=1.0, parallelism=14) \
        .collect()[0]
    assert (r2.makespan_lb_s, r2.host_bound) == (10.0, True)


def test_crawl_schedule_bottleneck_tie_breaks_lexicographically(spark):
    df = spark.createDataFrame([("b",), ("a",)], "host string")
    r = urls.crawl_schedule_plan(df, delay_s=2.0, parallelism=1) \
        .collect()[0]
    assert r.bottleneck_host == "a"
    assert r.makespan_lb_s == 4.0  # fleet bound binds: 2 urls · 2s / 1


def test_bpe_pair_counts_hand_census(spark):
    # "abab abc" -> words [abab, abc]; pairs ab,ba,ab + ab,bc
    df = spark.createDataFrame([(1, "Abab ABC"), (2, "x")],
                               "doc_id long, text string")
    got = [(r.pair, r.n, r.rank) for r in
           text.bpe_pair_counts(df, top_k=10).collect()]
    assert got == [("ab", 3, 1), ("ba", 1, 2), ("bc", 1, 3)]
    # 1-char words contribute nothing; top_k truncates
    top1 = text.bpe_pair_counts(df, top_k=1).collect()
    assert [(r.pair, r.n) for r in top1] == [("ab", 3)]


class TestTCloseness:
    def test_tvd_with_absent_values(self, spark):
        import pytest
        from zoi_spark import tablechecks as tc
        # global: a=2/6, b=4/6. g1 has a=2/3,b=1/3 -> TVD 1/3;
        # g2 has b only -> TVD = .5*(|1-2/3| + 2/6 absent) = 1/3
        rows = [("g1", "a"), ("g1", "a"), ("g1", "b"),
                ("g2", "b"), ("g2", "b"), ("g2", "b")]
        df = spark.createDataFrame(rows, "qi string, s string")
        out = {r["qi"]: r for r in tc.t_closeness_audit(
            df, qi_cols=["qi"], sensitive_col="s", t=0.4).collect()}
        assert out["g1"]["emd"] == pytest.approx(1 / 3, abs=1e-6)
        assert out["g2"]["emd"] == pytest.approx(1 / 3, abs=1e-6)
        assert out["g1"]["ok"] and out["g2"]["ok"]

    def test_identical_distribution_is_zero(self, spark):
        import pytest
        from zoi_spark import tablechecks as tc
        rows = [("g1", "a"), ("g1", "b"), ("g2", "a"), ("g2", "b")]
        df = spark.createDataFrame(rows, "qi string, s string")
        for r in tc.t_closeness_audit(df, qi_cols=["qi"],
                                      sensitive_col="s").collect():
            assert r["emd"] == pytest.approx(0.0, abs=1e-9)

    def test_invalid_t_raises(self, spark):
        import pytest
        from zoi_spark import tablechecks as tc
        df = spark.createDataFrame([("g", "a")], "qi string, s string")
        with pytest.raises(ValueError):
            tc.t_closeness_audit(df, qi_cols=["qi"],
                                 sensitive_col="s", t=0.0)


class TestDpNoisyCounts:
    def test_deterministic_and_hand_checked(self, spark):
        import hashlib
        import math
        import pytest
        from zoi_spark import tablechecks as tc
        rows = [("en",)] * 10 + [("de",)] * 3
        df = spark.createDataFrame(rows, "lang string")
        out = {r["lang"]: r for r in tc.dp_noisy_counts(
            df, "lang", epsilon=0.5, seed="s").collect()}
        again = {r["lang"]: r["noisy_count"] for r in tc.dp_noisy_counts(
            df, "lang", epsilon=0.5, seed="s").collect()}
        # hand-recompute the deterministic Laplace draw for each key
        for key, n in (("en", 10), ("de", 3)):
            d = int(hashlib.md5(f"s:{key}".encode()).hexdigest()[:13], 16)
            u = (d + 0.5) / 2.0 ** 52
            v = u - 0.5
            noise = -2.0 * math.copysign(1.0, v) * math.log(1 - 2 * abs(v))
            want = max(0, round(n + noise))
            assert out[key]["noisy_count"] == want
            assert again[key] == want
            assert out[key]["epsilon"] == pytest.approx(0.5)

    def test_clamped_at_zero(self, spark):
        # small count + tiny epsilon: some key draws a large negative
        # noise and must clamp to 0, never go negative
        from zoi_spark import tablechecks as tc
        rows = [(f"k{i}",) for i in range(40)]
        df = spark.createDataFrame(rows, "k string")
        vals = [r["noisy_count"] for r in tc.dp_noisy_counts(
            df, "k", epsilon=0.05, seed="clamp").collect()]
        assert min(vals) == 0 and all(v >= 0 for v in vals)

    def test_bad_epsilon_raises(self, spark):
        import pytest
        from zoi_spark import tablechecks as tc
        df = spark.createDataFrame([("a",)], "k string")
        with pytest.raises(ValueError):
            tc.dp_noisy_counts(df, "k", epsilon=0.0)
