"""Temporal joins Spark lacks as built-ins: as-of join (+ bounded range).

``asof_join`` implements the classic distributed as-of ("most recent
right-side row at or before each left timestamp, per key") WITHOUT a
range self-join: tag both sides, union, and take a running
``last(..., ignorenulls=True)`` over a per-key time-sorted window.  One
shuffle on the key, one per-partition sort, running state instead of
buffering — the same sort-merge shape kdb/Flink/QuestDB document for
their asof implementations, and the plan AQE can re-balance like any
aggregation.  A broadcast-right range join would be quadratic in hot
keys; this is linear in rows after the sort.

Right-side ties at the same timestamp are resolved deterministically by
the largest tiebreak column value (DuckDB's ASOF JOIN leaves equal-key
ties unspecified, so callers wanting a cross-engine-stable result should
pre-aggregate the right side to one row per (key, ts) — q42 does).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_IS_LEFT = "__asof_is_left"
_T = "__asof_t"


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str, right_ts: str,
              value_cols: Sequence[str]) -> DataFrame:
    """For every ``left`` row, append the ``value_cols`` of the latest
    ``right`` row with the same ``on`` key and ``right_ts`` <= ``left_ts``
    (inclusive; NULLs when no such row exists — left-join semantics).
    Returns the left columns plus the appended values.

    ``value_cols`` must be disjoint from the left columns: the output
    appends each value column under its own name, so a collision would
    silently produce a duplicate-named (ambiguous) column that breaks any
    downstream name-based select.  Enforced up front.
    """
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join value_cols collide with left columns: {sorted(clash)}"
            " — rename/alias them on the right side first")
    lcols = [c for c in left.columns]
    tagged_left = left.select(
        F.col(on).alias(on), F.col(left_ts).alias(_T),
        F.lit(1).alias(_IS_LEFT),
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in value_cols])
    tagged_right = right.select(
        F.col(on).alias(on), F.col(right_ts).alias(_T),
        F.lit(0).alias(_IS_LEFT),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
          for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols])

    # right rows sort BEFORE left rows at an equal timestamp, which is
    # exactly the inclusive <=; the running frame needs no buffering
    w = (Window.partitionBy(on)
         .orderBy(_T, _IS_LEFT, *[F.col(f"__r_{c}") for c in value_cols])
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = tagged_left.unionByName(tagged_right)
    for c in value_cols:
        u = u.withColumn(f"__v_{c}",
                         F.last(f"__r_{c}", ignorenulls=True).over(w))
    return (u.filter(F.col(_IS_LEFT) == 1)
            .select(*[F.col(f"__l_{c}").alias(c) for c in lcols],
                    *[F.col(f"__v_{c}").alias(c) for c in value_cols]))


def asof_join_bucketed(left: DataFrame, right: DataFrame, on: str,
                       left_ts: str, right_ts: str,
                       value_cols: Sequence[str],
                       bucket_width: int) -> DataFrame:
    """Skew-resistant as-of join, same semantics as :func:`asof_join`.

    ``asof_join`` sorts ALL of a key's rows in one window partition — a
    hot key (one customer with 10^8 events) pins a single task.  This
    variant partitions by ``(key, floor(ts / bucket_width))`` so a hot
    key spreads across its time buckets, in three bounded stages:

    1. per-(key, bucket) LAST right row — a partial-aggregating groupBy
       (``max_by`` over the (ts, values) order, matching asof_join's tie
       rule);
    2. a bucket-granular as-of of the left's distinct (key, bucket)
       pairs against those summaries at ``bucket - 1`` (strictly-before
       buckets), producing each bucket's carry-in seed — this inner
       as-of runs on rows bounded by time-span/bucket_width, not by row
       count, so the simple algorithm is safe here;
    3. the running-last window WITHIN each (key, bucket), seeded by the
       carry-in where the bucket itself has no earlier right row.

    Timestamps must be numeric (cast dates to epoch days first).  Pick
    bucket_width so a single (key, bucket) cell fits a task comfortably.
    ``value_cols`` must be disjoint from the left columns (same appended-
    column contract as :func:`asof_join`).
    """
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join_bucketed value_cols collide with left columns: "
            f"{sorted(clash)} — rename/alias them on the right side first")
    b_left = F.floor(F.col(left_ts) / F.lit(bucket_width)).cast("long")
    b_right = F.floor(F.col(right_ts) / F.lit(bucket_width)).cast("long")
    lb = left.withColumn("__b", b_left)
    rb = right.withColumn("__b", b_right)

    order_key = F.struct(F.col(right_ts),
                         *[F.col(c) for c in value_cols])
    summ = rb.groupBy(on, "__b").agg(
        F.max_by(F.struct(*[F.col(c) for c in value_cols]),
                 order_key).alias("__vals"))

    lbuckets = (lb.select(on, "__b").distinct()
                .withColumn("__bprev", F.col("__b") - 1))
    seeds = asof_join(lbuckets, summ, on=on,
                      left_ts="__bprev", right_ts="__b",
                      value_cols=["__vals"]
                      ).select(on, "__b", F.col("__vals").alias("__seed"))

    lcols = list(left.columns)
    tagged_left = lb.select(
        F.col(on), F.col("__b"), F.col(left_ts).alias(_T),
        F.lit(1).alias(_IS_LEFT),
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in value_cols])
    tagged_right = rb.select(
        F.col(on), F.col("__b"), F.col(right_ts).alias(_T),
        F.lit(0).alias(_IS_LEFT),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
          for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in value_cols])
    w = (Window.partitionBy(on, "__b")
         .orderBy(_T, _IS_LEFT, *[F.col(f"__r_{c}") for c in value_cols])
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = tagged_left.unionByName(tagged_right)
    for c in value_cols:
        u = u.withColumn(f"__v_{c}",
                         F.last(f"__r_{c}", ignorenulls=True).over(w))
    return (u.filter(F.col(_IS_LEFT) == 1)
            .join(seeds, on=[on, "__b"], how="left")
            .select(*[F.col(f"__l_{c}").alias(c) for c in lcols],
                    *[F.coalesce(F.col(f"__v_{c}"),
                                 F.col("__seed")[c]).alias(c)
                      for c in value_cols]))


def range_join(points: DataFrame, intervals: DataFrame, point_col: str,
               start_col: str, end_col: str, bin_width: int,
               broadcast_intervals: bool = False) -> DataFrame:
    """Point-in-interval join WITHOUT a cross join: bucket the numeric
    axis into ``bin_width`` bins, replicate each interval into every bin
    it overlaps (explode of a native sequence), equi-join points to
    intervals on the bin, then filter exact containment.  Each point
    lives in exactly one bin, so no post-join dedup is needed; shuffle
    volume is |points| + |intervals| x (avg interval span / bin_width),
    versus |points| x |intervals| for the nested-loop plan Spark would
    otherwise pick for a pure inequality condition.  Column names must
    be disjoint.

    Candidate-pair count is |points| x |intervals| x (span + bin_width)
    / axis_length: SMALLER bins mean fewer false candidates per point
    at the cost of more interval replicas, so when the interval side is
    dimension-sized pick bin_width BELOW the typical span (the replicas
    are cheap there); only a fat interval side argues for bins near the
    span.  ``broadcast_intervals=True`` (dimension-sized interval side)
    broadcasts the exploded replicas so the point side is never
    shuffled at all AND the join parallelism follows the point scan
    instead of the bin-key cardinality (a coarse axis has few distinct
    bins — a shuffled join would funnel into that many reduce tasks).
    """
    p = points.withColumn(
        "__bin", F.floor(F.col(point_col) / F.lit(bin_width)).cast("long"))
    i = intervals.withColumn(
        "__bin", F.explode(F.sequence(
            F.floor(F.col(start_col) / F.lit(bin_width)).cast("long"),
            F.floor(F.col(end_col) / F.lit(bin_width)).cast("long"))))
    if broadcast_intervals:
        i = F.broadcast(i)
    return (p.join(i, on="__bin")
            .filter((F.col(point_col) >= F.col(start_col))
                    & (F.col(point_col) <= F.col(end_col)))
            .drop("__bin"))
