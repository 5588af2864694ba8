"""Physical-plan contracts for the operators whose 100 TB story
depends on a specific plan shape. Each test asserts the property the
docstring promises (no shuffle, broadcast side, pushed filters,
truncated lineage) on the EXECUTED plan, so a regression shows up here
instead of as a melted cluster. PLANS.md records the same shapes for
every contract query; these pin the load-bearing ones in CI."""

import pytest
from pyspark.sql import functions as F

import zoi_spark as z
from zoi_spark import dedup, graph, text


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"plain document number {i} with several agreeable words "
             f"marker{i % 5} that run long enough to matter", "en")
         for i in range(40)],
        "doc_id long, text string, lang string")


def test_validate_is_single_projection(spark, sf_dir):
    """The verdict pass over a corpus must stay one whole-stage-codegen
    Project over the scan: no Exchange, no Python — the property the
    whole scaling-efficiency claim rests on."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    schema = z.fields({"doc_id": z.integer().non_negative(),
                       "text": z.string(min=1),
                       "lang": z.string(min=2, max=2)})
    plan = _plan(z.validate(df, schema, id_cols=["doc_id"]).annotated)
    assert "Exchange" not in plan
    assert "Python" not in plan and "BatchEval" not in plan
    assert "*(1) Project" in plan  # whole-stage-codegen span marker


def test_linear_quality_score_no_shuffle_no_python(docs):
    plan = _plan(text.linear_quality_score(docs))
    assert "Exchange" not in plan and "Python" not in plan


def test_column_filter_pushdown_reaches_scan(spark, sf_dir):
    """A filtered verdict projection must push the id predicate and
    prune unreferenced columns at the parquet scan."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = (df.where(F.col("doc_id") > 100)
           .select("doc_id", F.length("text").alias("len")))
    plan = _plan(out)
    assert "PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,100)]" \
        in plan
    assert "lang" not in plan.split("ReadSchema:")[1].splitlines()[0]


def test_referential_check_broadcasts_dimension(docs, spark):
    dim = spark.createDataFrame([("en",), ("de",)], "lang string")
    from zoi_spark import tablechecks
    bad = tablechecks.referential_violations(docs, "lang", dim)
    assert "BroadcastHashJoin" in _plan(bad)


def test_bloom_decontamination_broadcasts_bits(docs, spark):
    probes = spark.createDataFrame(
        [("plain document number 3 with several",)], "probe_text string")
    out = text.bloom_decontamination(docs, probes, n=3, m=1 << 16, k=4)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    # the corpus side must NOT shuffle on the gram/position key before
    # meeting the bit table: the only exchanges are the (doc,gram)
    # distinct + the per-doc aggregations
    assert "SortMergeJoin" not in plan


def test_pagerank_lineage_is_truncated(spark):
    """After k checkpointed rounds the final plan must hang off the
    checkpointed RDD, not replay rounds 1..k-1 (the dedup_clusters
    lineage-tower lesson)."""
    e = spark.createDataFrame([(1, 2), (2, 3), (3, 1)],
                              "src long, dst long")
    pr = graph.pagerank(e, iters=4)
    plan = _plan(pr)
    assert "Scan ExistingRDD" in plan
    assert plan.count("BroadcastHashJoin") == 0  # truncated: no join tower
    dedup.unpersist_candidates(pr)


def test_minhash_join_right_side_broadcast(docs, spark):
    probes = spark.createDataFrame(
        [(900, "plain document number 7 with several agreeable words "
               "marker2 that run long enough to matter")],
        "probe_id long, probe_text string")
    out = dedup.minhash_lsh_join(docs, probes, threshold=0.5,
                                 num_hashes=64, bands=32)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    dedup.unpersist_candidates(out)
