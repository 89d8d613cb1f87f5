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

__all__ = ["date_wraparound"]


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
