"""Streaming face of the sketch family (SURVEY.md §2.9: watermarks +
windowed aggregations): HyperLogLog distinct-count over an event stream.

The register half of the sketch (``operators.sketches.hll_registers``) is
a plain max-aggregate, and max is its own merge operator — which makes it
a natively streaming-able sketch: ``groupBy(window(ts), bucket).max(rho)``
carries at most m rows of state per open window however many events
arrive, and micro-batches merge into the state for free.  The finalize
step (harmonic mean → estimate) is a SECOND aggregation, which Structured
Streaming does not chain in one query, so the operator emits the
register table (append mode once the watermark closes a window) and
``hll_estimate_from_registers`` finalizes wherever the registers land —
a memory sink, a parquet table, a foreachBatch.  That split is the
standard sketch architecture at scale: store tiny mergeable state,
finalize at read time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from httrack2warc_spark.operators.sketches import hll_registers

__all__ = ["streaming_hll_registers", "streaming_quantile_bins"]


def streaming_hll_registers(
    stream: DataFrame,
    value_col: str,
    ts_col: str,
    window: str = "10 minutes",
    delay: str = "10 minutes",
    p: int = 12,
    seed: int = 0,
) -> DataFrame:
    """Windowed HLL registers over a stream: one (window_start, window_end,
    __bucket, __rho) row per touched register per event-time window.

    State is bounded at m rows per open window and evicted when the
    watermark passes ``delay``; finalize the stored registers with
    ``hll_estimate_from_registers(regs, ["window_start", "window_end"], p)``
    to get per-window distinct-count estimates identical to running the
    batch operator over the same events (asserted in test_streaming).
    """
    regs = hll_registers(
        stream.withWatermark(ts_col, delay),
        value_col,
        [F.window(F.col(ts_col), window).alias("__w")],
        p=p,
        seed=seed,
    )
    return regs.select(
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        "__bucket",
        "__rho",
    )


def streaming_quantile_bins(
    stream: DataFrame,
    value_col: str,
    ts_col: str,
    lo: float,
    hi: float,
    window: str = "10 minutes",
    delay: str = "10 minutes",
    bins: int = 256,
) -> DataFrame:
    """Windowed quantile-sketch bins over a stream: (window_start,
    window_end, __bin, __c) counts on a FIXED [lo, hi] grid — the design
    point that distinguishes the streaming form from the batch operator:
    the batch form fixes its grid with a first min/max pass, which an
    unbounded stream cannot take, so the bounds are explicit parameters
    (domain knowledge: byte sizes, latencies, prices) and out-of-range
    values clamp into the edge bins.  Counts merge by SUM, so state is
    ≤ bins rows per open window; finalize stored bins into quantiles with
    the same rank-interpolation arithmetic as ``binned_quantiles``
    (equality with the batch operator on in-range data is asserted in
    test_streaming)."""
    if hi <= lo:
        raise ValueError("hi must exceed lo")
    width = (hi - lo) / float(bins)
    v = F.col(value_col).cast("double")
    idx = F.least(
        F.greatest(
            F.floor((v - F.lit(lo)) / F.lit(width)).cast("int"), F.lit(0)
        ),
        F.lit(bins - 1),
    )
    return (
        stream.withWatermark(ts_col, delay)
        .groupBy(
            F.window(F.col(ts_col), window).alias("__w"),
            idx.alias("__bin"),
        )
        .agg(F.count(F.lit(1)).alias("__c"))
        .select(
            F.col("__w.start").alias("window_start"),
            F.col("__w.end").alias("window_end"),
            "__bin",
            "__c",
        )
    )
