"""Unit tests for zoi_spark.joins — as-of join (tag-union merge scan)
and binned range join. Hand-built frames, exact expectations."""

import pytest

from pyspark.sql import functions as F

from zoi_spark import joins


def _left(spark):
    # (user, ts, purchase_id)
    return spark.createDataFrame(
        [(1, 100, "p1"), (1, 205, "p2"), (2, 50, "p3"), (3, 10, "p4")],
        "user long, ts long, pid string")


def _right(spark):
    # (user, ts, click_id) — user 1 has a tie at ts=100
    return spark.createDataFrame(
        [(1, 90, "c1"), (1, 100, "c2"), (1, 100, "c3"), (1, 200, "c4"),
         (2, 60, "c5")],
        "user long, ts long, cid string")


class TestAsofJoin:
    def test_inclusive_backward_match(self, spark):
        out = {r.pid: (r.ts_asof, r.cid) for r in joins.asof_join(
            _left(spark), _right(spark), on="user", left_ts="ts",
            payload=["ts", "cid"], right_order="cid").collect()}
        # ts=100 left matches the SAME-ts right; tie broken by cid
        # order (c2 < c3 → last in-frame is c3)
        assert out["p1"] == (100, "c3")
        assert out["p2"] == (200, "c4")
        # user 2's only click is at 60 > 50 → no match, row kept
        assert out["p3"] == (None, None)
        # user 3 has no right rows at all
        assert out["p4"] == (None, None)

    def test_strict_excludes_equal_ts(self, spark):
        out = {r.pid: r.cid for r in joins.asof_join(
            _left(spark), _right(spark), on="user", left_ts="ts",
            payload=["cid"], right_order="cid", strict=True).collect()}
        assert out["p1"] == "c1"     # 100 itself excluded → 90
        assert out["p2"] == "c4"     # 200 < 205 still matches

    def test_tolerance_nulls_stale_matches(self, spark):
        out = {r.pid: r.cid for r in joins.asof_join(
            _left(spark), _right(spark), on="user", left_ts="ts",
            payload=["cid"], right_order="cid",
            tolerance_seconds=4).collect()}
        assert out["p1"] == "c3"     # gap 0 ≤ 4
        assert out["p2"] is None     # gap 5 > 4 → payload cleared
        assert len(out) == 4         # …but every left row survives

    def test_collision_suffix_and_default_payload(self, spark):
        out = joins.asof_join(
            _left(spark), _right(spark), on="user", left_ts="ts",
            right_order="cid")
        # default payload = all right cols but the key; 'ts' collides
        assert set(out.columns) == {"user", "ts", "pid",
                                    "ts_asof", "cid"}

    def test_single_shuffle_no_join_in_plan(self, spark):
        plan = joins.asof_join(
            _left(spark), _right(spark), on="user", left_ts="ts",
            payload=["cid"])._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan    # merge-scan, not a join


class TestRangeJoin:
    def test_boundaries_inclusive_exactly_once(self, spark):
        pts = spark.createDataFrame(
            [(10.0, "a"), (20.0, "b"), (15.0, "c"), (21.0, "d")],
            "x double, pid string")
        ivals = spark.createDataFrame([(10.0, 20.0, "i1")],
                                      "lo double, hi double, iid string")
        out = joins.range_join(pts, ivals, point_col="x",
                               start_col="lo", end_col="hi",
                               bucket_width=3.0)
        rows = [(r.pid, r.iid) for r in out.collect()]
        # closed on both ends, d=21 outside; bucket_width 3 splits the
        # interval over buckets 3..6 yet each hit appears exactly once
        assert sorted(rows) == [("a", "i1"), ("b", "i1"), ("c", "i1")]

    def test_equality_key_respected(self, spark):
        pts = spark.createDataFrame([(5.0, 1), (5.0, 2)],
                                    "x double, user long")
        ivals = spark.createDataFrame([(0.0, 10.0, 1)],
                                      "lo double, hi double, user long")
        out = joins.range_join(pts, ivals, point_col="x",
                               start_col="lo", end_col="hi",
                               on="user", bucket_width=100.0)
        assert [r.user for r in out.collect()] == [1]

    def test_timestamps_bucket_on_epoch(self, spark):
        pts = spark.createDataFrame(
            [("2024-01-01 00:10:00",)], "ts string") \
            .select(F.col("ts").cast("timestamp").alias("ts"))
        ivals = spark.createDataFrame(
            [("2024-01-01 00:00:00", "2024-01-01 01:00:00")],
            "lo string, hi string") \
            .select(F.col("lo").cast("timestamp").alias("lo"),
                    F.col("hi").cast("timestamp").alias("hi"))
        out = joins.range_join(pts, ivals, point_col="ts",
                               start_col="lo", end_col="hi",
                               bucket_width=600.0)  # seconds
        assert out.count() == 1

    def test_span_guard_fails_loudly(self, spark):
        pts = spark.createDataFrame([(1.0,)], "x double")
        ivals = spark.createDataFrame([(0.0, 100.0)],
                                      "lo double, hi double")
        with pytest.raises(Exception, match="range_join"):
            joins.range_join(pts, ivals, point_col="x",
                             start_col="lo", end_col="hi",
                             bucket_width=1.0,
                             max_span_buckets=10).collect()

    def test_rejects_bad_width(self, spark):
        pts = spark.createDataFrame([(1.0,)], "x double")
        with pytest.raises(ValueError):
            joins.range_join(pts, pts, point_col="x", start_col="x",
                             end_col="x", bucket_width=0)

    def test_equi_join_not_nested_loop(self, spark):
        pts = spark.createDataFrame([(5.0, 1)], "x double, user long")
        ivals = spark.createDataFrame([(0.0, 10.0, 1)],
                                      "lo double, hi double, user long")
        plan = joins.range_join(
            pts, ivals, point_col="x", start_col="lo", end_col="hi",
            on="user", bucket_width=5.0
        )._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan


class TestNullAndReversedEdges:
    def test_asof_null_keys_never_match(self, spark):
        # NULL-key left rows come back unmatched; NULL-key right rows
        # match no one (SQL equality / DuckDB ASOF / merge_asof)
        left = spark.createDataFrame(
            [(None, 100, "p1"), (1, 100, "p2")],
            "user long, ts long, pid string")
        right = spark.createDataFrame(
            [(None, 90, "c1"), (1, 90, "c2")],
            "user long, ts long, cid string")
        out = {r.pid: r.cid for r in joins.asof_join(
            left, right, on="user", left_ts="ts",
            payload=["cid"], right_order="cid").collect()}
        assert out == {"p1": None, "p2": "c2"}

    def test_range_join_reversed_interval_is_empty_not_exploded(
            self, spark):
        # end < start: BETWEEN matches nothing; the descending
        # sequence() enumeration (which would bypass the span guard
        # and emit ~start/width rows) must not run
        pts = spark.createDataFrame([(5.0, "a")], "x double, pid string")
        ivals = spark.createDataFrame(
            [(2_000_000_000.0, 0.0, "bad"), (0.0, 10.0, "good")],
            "lo double, hi double, iid string")
        rows = joins.range_join(
            pts, ivals, point_col="x", start_col="lo", end_col="hi",
            bucket_width=1.0, max_span_buckets=100).collect()
        assert [(r.pid, r.iid) for r in rows] == [("a", "good")]
