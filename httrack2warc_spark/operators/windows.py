"""Windowed/stateful scans.

``date_wraparound`` — P6, reference ``httrack/HttrackCrawl.java:149-152,197-205``:
HTTrack logs carry only a time-of-day; whenever time goes backwards relative to
the previous row (in visit order), the date advances one day. As a Spark plan
this is a prefix sum over a window: ``day_off = sum(time < lag(time)) over
(order by seq rows unbounded preceding)``, then ``timestamp = launch_date +
day_off days + time``.

Scale note: a global ``orderBy seq`` window is a single-partition sort — exactly
right for the reference's one-crawl log (new.txt is small), and the crawl-level
parallel unit is the *crawl directory*, not the row. For many crawls at once,
pass ``partition_by`` (e.g. crawl_id) and the window parallelizes per crawl.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["date_wraparound", "change_rate_estimates"]


def date_wraparound(
    df: DataFrame,
    time_col: str,
    seq_col: str,
    launch_date_col,
    out_col: str = "timestamp",
    partition_by: str | None = None,
) -> DataFrame:
    """``time_col``: string 'HH:mm:ss' (or TimestampType whose date part is
    ignored); ``launch_date_col``: Column/name of DateType launch date."""
    w = (Window.partitionBy(partition_by) if partition_by else Window.partitionBy(F.lit(0)))
    w_lag = w.orderBy(seq_col)
    w_sum = w.orderBy(seq_col).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    launch = F.col(launch_date_col) if isinstance(launch_date_col, str) else launch_date_col

    secs = (
        F.unix_timestamp(F.col(time_col), "HH:mm:ss")
        if dict(df.dtypes)[time_col] == "string"
        else F.unix_timestamp(F.col(time_col)) % 86400
    )
    wrapped = F.when(secs < F.lag(secs).over(w_lag), 1).otherwise(0)
    day_off = F.sum(wrapped).over(w_sum)
    ts = F.to_timestamp(F.date_add(launch, day_off.cast("int"))) + F.make_interval(
        secs=secs.cast("double")
    )
    return df.withColumn(out_col, ts)


def change_rate_estimates(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    order_cols: list | None = None,
) -> DataFrame:
    """Per-page change-rate estimation for revisit scheduling (Cho &
    Garcia-Molina 2003, "Estimating frequency of change"): from a history
    of observations (key, ts, state), estimate each page's Poisson change
    rate λ — the signal an incremental crawler ranks refetches by.

    Per key, in (ts, *order_cols, state) order: n = observation intervals,
    X = intervals whose state differs from the previous observation. The
    bias-corrected estimator r̂ = −ln((n − X + 0.5)/(n + 0.5)) is the
    expected changes per revisit interval; dividing by the mean interval
    gives the per-day rate.  The state column rides the window order as the
    LAST tie-break: when ``order_cols`` doesn't make (ts, *order_cols)
    total, rows tying on it sort by state, and any remaining ties are
    bit-identical rows — so n_changes is a pure function of the history,
    never of partition order (repo invariant: every ordering explicit).
    Pass ``order_cols`` (e.g. an event id) to impose the true observation
    order when same-timestamp observations with different states exist.

    Cross-engine determinism (the build-notes floor-micro recipe): the ln
    argument is ONE fixed IEEE expression over exact integers (+0.5),
    floored to micros immediately; timestamps reduce to exact integer
    microseconds (unix_micros == DuckDB epoch_us bit-for-bit); all later
    arithmetic — mean interval, per-day scaling — is pure BIGINT div, so
    the outputs are engine-exact integers.

    Scale shape: one exchange on ``key`` serves the lag window AND the
    aggregate; output is one 40-byte row per page, however long the
    history (the observation log never leaves its partitioning).

    Returns (key, n_intervals, n_changes, lnneg_micro, lambda_day_micro)
    for keys with ≥2 observations and a positive mean interval.
    """
    order_cols = order_cols or []
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col), *order_cols, F.col(state_col)
    )
    prev = F.lag(F.col(state_col)).over(w)
    obs = df.select(
        F.col(key_col).alias("key"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__us"),
        F.col(state_col).alias("__s"),
        prev.alias("__prev"),
    )
    agg = obs.groupBy("key").agg(
        F.count("__prev").alias("n_intervals"),
        F.sum(
            F.when(
                F.col("__prev").isNotNull()
                & (F.col("__s") != F.col("__prev")),
                1,
            ).otherwise(0)
        ).alias("n_changes"),
        (F.max("__us") - F.min("__us")).alias("__span_us"),
    )
    ln_arg = (
        F.col("n_intervals") - F.col("n_changes") + F.lit(0.5)
    ) / (F.col("n_intervals") + F.lit(0.5))
    lnneg_micro = F.floor(-F.log(ln_arg) * F.lit(1_000_000.0)).cast("long")
    avg_us = F.expr("__span_us div n_intervals")
    return (
        agg.where((F.col("n_intervals") >= 1) & (F.col("__span_us") > 0))
        .withColumn("lnneg_micro", lnneg_micro)
        .withColumn("__avg_us", avg_us)
        .where(F.col("__avg_us") > 0)
        .withColumn(
            "lambda_day_micro",
            F.expr("(lnneg_micro * 86400000000) div __avg_us"),
        )
        .select("key", "n_intervals", "n_changes", "lnneg_micro",
                "lambda_day_micro")
    )
