"""Streaming faces of the dedup/session operators (SURVEY.md §2.9: watermarks
+ windowed aggregations for late data).

- ``streaming_exact_dedup`` — the A1/A2 first-wins dedup as a state-backed
  streaming operator: ``dropDuplicatesWithinWatermark`` keeps per-key state
  only until the watermark passes (bounded state at an unbounded stream, the
  property an exact seen-set can't have; the batch Bloom/cuckoo seen-set is
  the cross-restart complement).
- ``streaming_sessionize`` — the gap-based sessionization query
  (``__spark_entry__.sessionize``) as a ``session_window`` aggregation:
  dynamic-gap windows merge as events arrive; the watermark bounds how late
  an event may extend a session.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["streaming_exact_dedup", "streaming_sessionize"]


def streaming_exact_dedup(
    stream: DataFrame,
    cols: list[str],
    ts_col: str,
    delay: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate rows on ``cols`` arriving within the watermark window.
    State is evicted once event time passes ``delay`` — duplicates farther
    apart than the watermark are the seen-set's job, not the stream's."""
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(cols)


def streaming_sessionize(
    events: DataFrame,
    ts_col: str,
    key_col: str | Column,
    gap: str = "30 minutes",
    delay: str = "10 minutes",
) -> DataFrame:
    """Per-key session windows with a ``gap`` inactivity timeout: returns
    (key, session_start, session_end, n_events) per closed session."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    return (
        events.withWatermark(ts_col, delay)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("session"), key)
        .agg(F.count("*").alias("n_events"))
        .select(
            key_col if isinstance(key_col, str) else key,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_events",
        )
    )
