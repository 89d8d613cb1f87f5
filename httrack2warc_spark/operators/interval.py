"""Interval (range-overlap) join — the second time-series operator Spark's
DataFrame API lacks (DuckDB/PostgreSQL express it as a bare
``ON e.ts BETWEEN i.s AND i.e`` range join): match every point row to
every interval containing its timestamp, with NO equi key.

A naive formulation is a cross join with a range filter — Spark plans it
as BroadcastNestedLoopJoin, which is O(|points|·|intervals|) and a
non-starter at 10^10 rows.  This operator bucketizes time instead: points
land in the single bucket containing their timestamp, intervals are
exploded over the buckets they overlap, and the match becomes a plain
equi join on the bucket followed by the exact range refinement.  With the
bucket width chosen ≥ the typical interval length each interval lands in
≤ 2 buckets, so the exploded side stays O(|intervals|) and the whole
operator is ONE shuffle on an 8-byte key — the standard interval-join
strategy of streaming engines (Flink's interval join partitions the same
way).  No dedup pass is needed: a point is in exactly one bucket, so each
(point, interval) pair can match at most once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def _epoch(col: str):
    # TIMESTAMP_NTZ refuses a direct double cast; via TIMESTAMP both sides
    # of the join shift by the same session-tz offset, so bucket membership
    # (the only thing this feeds) is unaffected.
    return F.col(col).cast("timestamp").cast("double")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 7200,
) -> DataFrame:
    """Inner-join ``points`` to every ``intervals`` row whose
    [start_col, end_col] (inclusive both ends) contains ``ts_col``.

    Result carries all columns of both inputs.  ``bucket_seconds`` trades
    explode fan-out (long intervals span more buckets) against join
    selectivity (wide buckets admit more false candidates to the range
    refinement); set it near the typical interval length.  Timestamp
    comparisons are exact (microsecond integers), so the result is
    engine-reproducible — a SQL oracle's range join returns the identical
    pair set.
    """
    iv = (
        intervals.withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(_epoch(start_col) / bucket_seconds).cast("long"),
                    F.floor(_epoch(end_col) / bucket_seconds).cast("long"),
                )
            ),
        )
    )
    pt = points.withColumn(
        "__bucket",
        F.floor(_epoch(ts_col) / bucket_seconds).cast("long"),
    )
    return (
        pt.join(iv, on="__bucket")
        .where(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) <= F.col(end_col))
        )
        .drop("__bucket")
    )
