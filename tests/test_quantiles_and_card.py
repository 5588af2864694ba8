"""Hand-value tests for the wave-39 operators: exact_discrete_quantiles,
verdict_transitions, contrastive_negatives."""

import pytest

from zoi_spark import sampling, tablechecks


def test_exact_discrete_quantiles_type1_pick(spark):
    # values 1..10 once each: q-quantile = ceil(q*10)-th value
    df = spark.createDataFrame([(v,) for v in range(1, 11)], "x long")
    got = {r.q: (r.value, r.cum_count, r.n_rows)
           for r in tablechecks.exact_discrete_quantiles(
               df, "x", qs=(0.1, 0.5, 0.91, 1.0)).collect()}
    assert got[0.1] == (1, 1, 10)
    assert got[0.5] == (5, 5, 10)
    assert got[0.91] == (10, 10, 10)   # ceil(9.1) = 10th value
    assert got[1.0] == (10, 10, 10)


def test_exact_discrete_quantiles_skewed_counts(spark):
    # 97 zeros + 3 nines: p50 = 0, p99 = 9 (the tail a sketch blurs)
    rows = [(0,)] * 97 + [(9,)] * 3
    df = spark.createDataFrame(rows, "x long")
    got = {r.q: r.value
           for r in tablechecks.exact_discrete_quantiles(
               df, "x", qs=(0.5, 0.97, 0.98)).collect()}
    assert got == {0.5: 0, 0.97: 0, 0.98: 9}


def test_verdict_transitions_cells_and_samples(spark):
    old = spark.createDataFrame(
        [(1, "pass"), (2, "pass"), (3, "fail"), (4, "pass")],
        "partition_id long, status string")
    new = spark.createDataFrame(
        [(2, "fail"), (3, "pass"), (4, "pass"), (5, "fail")],
        "partition_id long, status string")
    got = {(r.old_status, r.new_status): (r.n, list(r.sample_keys))
           for r in tablechecks.verdict_transitions(old, new).collect()}
    assert got[("pass", "fail")] == (1, [2])     # the regression
    assert got[("fail", "pass")] == (1, [3])
    assert got[("pass", "pass")] == (1, [4])
    assert got[("pass", "absent")] == (1, [1])
    assert got[("absent", "fail")] == (1, [5])


def test_contrastive_negatives_domain_and_determinism(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    out1 = sorted(tuple(r) for r in
                  sampling.contrastive_negatives(df, k=4).collect())
    out2 = sorted(tuple(r) for r in
                  sampling.contrastive_negatives(df, k=4).collect())
    assert out1 == out2                       # reproducible
    assert len(out1) == 40
    for anchor, _j, neg in out1:
        assert 0 <= neg <= 9 and neg != anchor
    # a different seed family gives a different sample
    out3 = sorted(tuple(r) for r in
                  sampling.contrastive_negatives(df, k=4,
                                                 seed="other").collect())
    assert out3 != out1


def test_contrastive_negatives_rejects_sparse_ids(spark):
    df = spark.createDataFrame([(0,), (2,)], "doc_id long")
    with pytest.raises(ValueError, match="dense ids"):
        sampling.contrastive_negatives(df, k=1)
