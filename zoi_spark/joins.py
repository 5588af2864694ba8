"""Temporal join operators Spark's DataFrame API lacks: as-of join
and interval (range) join.

The reference engine (phcurado/zoi) is a schema-validation library
with no join surface — these operators belong to the LLM-pipeline /
event-analytics inventory (SURVEY §8): attaching "the most recent
prior state" to an observation (as-of) and locating points inside
derived intervals (range) are the two joins every training-data
telemetry pipeline needs and Spark only offers as O(|L|·|R|)
theta-joins.

Design stance — both operators are rebuilt as EQUI-joins so Catalyst
gets a hash/sort-merge plan instead of BroadcastNestedLoopJoin:

* :func:`asof_join` never joins at all: it unions the two sides,
  shuffles ONCE on the key, and resolves the match with a running
  ``last(..., ignorenulls=True)`` window — the merge-scan formulation
  (kdb's ``aj``, Pandas ``merge_asof``) expressed as a Spark window.
  Cost at 10^12 rows: one shuffle of |L|+|R|, no candidate-pair blowup,
  skew bounded by the hottest key exactly like any per-entity window.
* :func:`range_join` buckets both sides on a caller-chosen width and
  equi-joins on the bucket id (plus any equality keys), then applies
  the precise containment predicate — the standard binned range join
  (Databricks' range-join optimization implements the same strategy as
  a hint). A point lands in exactly one bucket and every covering
  interval enumerates that bucket, so no post-join dedup is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["asof_join", "range_join"]


def asof_join(left: DataFrame, right: DataFrame, *, on: str,
              left_ts: str, right_ts: str | None = None,
              payload: list[str] | None = None,
              right_order: str | None = None,
              strict: bool = False,
              tolerance_seconds: float | None = None,
              suffix: str = "_asof") -> DataFrame:
    """Backward as-of join: for every left row, attach the payload of
    the right row with the greatest ``right_ts`` ≤ ``left_ts`` within
    the same ``on`` key (``strict=True`` uses ``<``). Unmatched left
    rows keep NULL payloads (left-outer semantics, like DuckDB's
    ``ASOF LEFT JOIN`` and Pandas ``merge_asof``). NULL keys follow
    SQL equality: a NULL-key left row never matches anything (it is
    returned unmatched), and NULL-key right rows match no one.

    Implementation: tag-and-union, not join —

    1. both sides are projected to a common layout (left columns +
       a ``__p`` struct holding the right payload, NULL on left rows);
    2. one window per key ordered by ``(ts, side, right_order)`` where
       right rows sort BEFORE left rows at equal ts (AFTER when
       ``strict``), so inclusivity is decided by sort order, not by a
       predicate;
    3. ``last(__p, ignorenulls=True)`` over
       ``unboundedPreceding..currentRow`` resolves each left row's
       match in the single merge scan.

    One shuffle of |L|+|R| on the key — contrast the naive
    ``join + filter + row_number`` which materializes every
    (left, earlier-right) candidate pair: a user with n events pays
    O(n²) there and O(n log n) here. Ties among right rows at the same
    ts are broken by ``right_order`` (pass the event id) so the match
    is deterministic under any physical row order.

    ``tolerance_seconds`` nulls out matches older than the window
    (matched ts < left ts − tolerance), mirroring ``merge_asof``'s
    ``tolerance`` — rows are kept, payloads are cleared, so the output
    stays exactly one row per left row.

    Payload columns (default: every right column except the key) are
    appended under their own names, with ``suffix`` appended on
    collision with a left column name.
    """
    right_ts = right_ts or left_ts
    if payload is None:
        payload = [c for c in right.columns if c != on]
    lcols = left.columns

    # NULL keys never match (SQL equality / DuckDB ASOF / merge_asof
    # semantics): NULL-key left rows bypass the window entirely and
    # come back with NULL payloads — which also keeps the all-NULL key
    # out of the window shuffle (it would otherwise be the hottest
    # partition on sparse-key data). NULL-key right rows are dropped.
    left_null = left.where(F.col(on).isNull())
    left = left.where(F.col(on).isNotNull())
    right = right.where(F.col(on).isNotNull())

    p_struct = F.struct(
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(c) for c in payload])
    p_type = right.select(p_struct.alias("__p")).schema["__p"].dataType

    # the tie-break column keeps its NATIVE type (string ids would be
    # corrupted — or ANSI-aborted — by a numeric cast; "10" < "2" is
    # not the long ordering)
    if right_order:
        ord_type = right.schema[right_order].dataType
        order_expr = F.col(right_order)
    else:
        ord_type = T.IntegerType()
        order_expr = F.lit(0)
    l2 = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(ord_type).alias("__ord"),
        F.lit(None).cast(p_type).alias("__p"))
    null_left = [F.lit(None).cast(left.schema[c].dataType).alias(c)
                 for c in lcols if c != on]
    r2 = right.select(
        F.col(on),
        *null_left,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        order_expr.alias("__ord"),
        p_struct.alias("__p"))
    u = l2.unionByName(r2)

    # at equal ts: inclusive ⇒ right first (asc side: 0 then 1);
    # strict ⇒ left first (desc side: 1 then 0) so the same-ts right
    # row falls outside the ..currentRow frame of its left row
    side_order = F.col("__side").asc() if not strict \
        else F.col("__side").desc()
    w = (Window.partitionBy(on)
         .orderBy(F.col("__ts").asc(), side_order, F.col("__ord").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = F.last("__p", ignorenulls=True).over(w)

    out = (u.withColumn("__m", matched)
           .where(F.col("__side") == 1))
    if tolerance_seconds is not None:
        within = (F.col("__m.__rts").cast("double")
                  >= F.col("__ts").cast("double")
                  - F.lit(float(tolerance_seconds)))
        out = out.withColumn(
            "__m", F.when(within, F.col("__m")))

    taken = set(lcols)
    proj = [F.col(c) for c in lcols]
    null_proj = [F.col(c) for c in lcols]
    for c in payload:
        name = c if c not in taken else c + suffix
        taken.add(name)
        proj.append(F.col("__m." + c).alias(name))
        null_proj.append(
            F.lit(None).cast(p_type[c].dataType).alias(name))
    return out.select(*proj).unionByName(left_null.select(*null_proj))


def range_join(points: DataFrame, intervals: DataFrame, *,
               point_col: str, start_col: str, end_col: str,
               on: str | None = None,
               bucket_width: float,
               max_span_buckets: int = 10_000) -> DataFrame:
    """Inner join of point rows to every interval row with
    ``start ≤ point ≤ end`` (closed on both ends, SQL ``BETWEEN``),
    optionally also requiring equality on ``on``.

    Implementation — the binned range join: both sides are keyed by
    ``floor(x / bucket_width)``; intervals enumerate every bucket they
    overlap (``sequence(floor(start/w), floor(end/w))`` + explode);
    the join is an EQUI-join on (bucket [, on]) followed by the exact
    containment filter. A point belongs to exactly one bucket, so each
    qualifying (point, interval) pair is produced exactly once — no
    dedup pass. Timestamp columns are handled by bucketing their
    microsecond epoch (``bucket_width`` then means SECONDS).

    Why not ``points.join(intervals, between-predicate)``: with no
    equality conjunct Catalyst can only plan a (broadcast) nested-loop
    — O(|P|·|I|) comparisons and a single-threaded build side. Binned,
    the cost is one shuffle of each side plus in-bucket work; AQE's
    skew-join splitting handles hot buckets. ``bucket_width`` tunes
    replication: intervals are duplicated ``span/width + 1`` times, so
    pick a width near the typical interval span (Databricks documents
    the same guidance for its range-join hint). ``max_span_buckets``
    fails loudly (ValueError at plan time is impossible distributed —
    the guard is an ``assert_true`` column) when an interval would
    explode into more buckets than that, instead of silently OOMing
    the executor.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")

    def _num(df, c):
        dt = df.schema[c].dataType
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            # NTZ has no unix_micros; the cast maps wall time to an
            # instant monotonically, and ONLY the bucket id rides on
            # it — the exact containment filter compares originals
            return (F.unix_micros(F.col(c).cast("timestamp"))
                    / F.lit(1_000_000.0))
        return F.col(c).cast("double")

    w = float(bucket_width)
    p_bucket = F.floor(_num(points, point_col) / F.lit(w))
    lo = F.floor(_num(intervals, start_col) / F.lit(w))
    hi = F.floor(_num(intervals, end_col) / F.lit(w))
    # assert_true yields NULL on pass / raises on fail; folding it
    # into the sequence bound (+0) keeps it in the plan — a dropped
    # standalone check column would be pruned by the optimizer
    span_ok = F.assert_true(
        hi - lo < F.lit(int(max_span_buckets)),
        F.lit(f"range_join: interval spans more than {max_span_buckets}"
              " buckets; raise bucket_width or max_span_buckets"))
    hi_checked = hi + F.coalesce(span_ok.cast("long"), F.lit(0))
    # reversed intervals (end < start) contain no point under BETWEEN,
    # but sequence(lo, hi) would enumerate them DESCENDING — a corrupt
    # row with start=2e9, end=0 would emit ~2e9 bucket rows and bypass
    # the span guard (negative span < max always holds). Drop them
    # before enumeration: their match set is empty by definition.
    ivals = (intervals
             .where(F.col(start_col) <= F.col(end_col))
             .withColumn("__bucket", F.explode(F.sequence(lo, hi_checked))))
    pts = points.withColumn("__bucket", p_bucket)

    keys = ["__bucket"] + ([on] if on else [])
    contains = ((F.col(f"__p.{point_col}") >= F.col(f"__i.{start_col}"))
                & (F.col(f"__p.{point_col}") <= F.col(f"__i.{end_col}")))
    cond = contains
    joined = (pts.alias("__p")
              .join(ivals.alias("__i"),
                    [F.col(f"__p.{k}") == F.col(f"__i.{k}")
                     for k in keys],
                    "inner")
              .where(cond))
    pcols = [F.col(f"__p.{c}").alias(c) for c in points.columns]
    icols = [F.col(f"__i.{c}").alias(c if c not in points.columns
                                     else c + "_ival")
             for c in intervals.columns if c != on]
    return joined.select(*pcols, *icols)
