"""Global sequence assignment (O2 — visit-order discipline).

The reference's visit order is implicit in single-threaded iteration
(``HtsTxtParser.java:58-68``); Spark gives no free total order, so the engine
stamps explicit ``seq`` values. Two strategies:

- ``single``: one ``row_number`` window over the total ordering key. Exact
  and cheap for small/medium round batches, but funnels every row through one
  task — the wrong plan for a 10^9-row round.
- ``ranged``: the distributed form. ``repartitionByRange`` on the ordering
  key (Spark's range exchange samples split points), per-partition
  ``row_number``, then each partition's offset = exclusive prefix sum of
  partition counts (one tiny collect of N_partition longs, broadcast back as
  a join on partition id). Total order identical to ``single`` for any total
  (tie-free) ordering key; work is fully parallel.
- ``bucketed``: distributed AND lazy — no collect, no job barrier. The
  caller supplies a coarse bucket column that is monotone non-decreasing
  along ``order`` (e.g. ``floor(parent_seq / W)`` when the ordering key's
  prefix is ``parent_seq``); per-bucket offsets are computed *in-plan*
  (groupBy-count → tiny single-partition prefix-sum window → broadcast
  join), so the whole stamping stays a lazy transformation the downstream
  action materializes. Deterministic under recomputation (no range-boundary
  sampling, no ``spark_partition_id``), which is what lets the scheduler
  chain it inside a round without a foreground materialization. The trade:
  bucket balance is the caller's responsibility — range sampling would
  equalize row counts, a static width only equalizes key spans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["with_global_seq", "with_running_total"]


def with_global_seq(
    df: DataFrame,
    order: list,
    start: int = 0,
    out_col: str = "seq",
    mode: str = "single",
    num_partitions: int | None = None,
    cache_handle: list | None = None,
    count_handle: list | None = None,
    bucket_by=None,
) -> DataFrame:
    """Stamp ``out_col`` = start, start+1, … in the total order given by
    ``order`` (must be tie-free for determinism).

    Ranged mode persists the range-partitioned input (the offsets collected
    from the counts job MUST see the same partitioning as the final job —
    recomputation could re-sample range boundaries). The cached DataFrame is
    appended to ``cache_handle`` so the caller can unpersist once downstream
    results are materialized.

    Bucketed mode (``bucket_by``: a Column, REQUIRED, monotone non-decreasing
    along ``order``) runs no job at all: offsets ride the plan. ``start`` may
    be a Python int or a 1-row/1-col DataFrame holding the start value (a
    lazy scalar — the k-level batch path chains level i's start on level
    i-1's count without materializing either).
    """
    if mode == "single":
        w = Window.partitionBy(F.lit(0)).orderBy(*order)
        return df.withColumn(out_col, F.row_number().over(w).cast("long") + F.lit(start - 1))

    if mode == "bucketed":
        if bucket_by is None:
            raise ValueError("bucketed mode requires bucket_by")
        b = df.withColumn("__b", bucket_by.cast("long"))
        if isinstance(start, DataFrame):
            start_df = start.toDF("__start")
        else:
            start_df = df.sparkSession.range(1).select(
                F.lit(int(start)).cast("long").alias("__start")
            )
        w_off = (
            Window.partitionBy(F.lit(0))
            .orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offs = (
            b.groupBy("__b")
            .agg(F.count("*").alias("__n"))
            .crossJoin(start_df)
            .withColumn(
                "__off",
                F.coalesce(F.sum("__n").over(w_off), F.lit(0)) + F.col("__start"),
            )
            .select("__b", "__off")
        )
        w = Window.partitionBy("__b").orderBy(*order)
        return (
            b.join(F.broadcast(offs), "__b")
            .withColumn(
                out_col,
                F.row_number().over(w).cast("long") + F.col("__off") - 1,
            )
            .drop("__b", "__off")
        )

    if mode != "ranged":
        raise ValueError(mode)
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n, *order).withColumn(
        "__pid", F.spark_partition_id()
    )
    ranged = ranged.persist()
    if cache_handle is not None:
        cache_handle.append(ranged)
    df.sparkSession.sparkContext.setJobDescription("seq:ranged-offsets")
    counts = (
        ranged.groupBy("__pid").agg(F.count("*").alias("__n")).orderBy("__pid").collect()
    )
    df.sparkSession.sparkContext.setJobDescription(None)
    offsets, acc = {}, start
    for r in counts:
        offsets[r["__pid"]] = acc
        acc += r["__n"]
    if count_handle is not None:
        # the offsets collect already counted every row — callers that need
        # the total (e.g. the scheduler's next_seq arithmetic) can take it
        # here instead of running a separate count job
        count_handle.append(acc - start)
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()], "__pid int, __off long"
        )
    )
    w = Window.partitionBy("__pid").orderBy(*order)
    out = (
        ranged.join(off_df, "__pid")
        .withColumn(out_col, F.row_number().over(w).cast("long") + F.col("__off") - 1)
        .drop("__pid", "__off")
    )
    return out


def with_running_total(
    df: DataFrame,
    order: list,
    value,
    out_col: str = "running",
    mode: str = "single",
    num_partitions: int | None = None,
    cache_handle: list | None = None,
) -> DataFrame:
    """Exclusive prefix sum of ``value`` in the total order ``order``:
    ``out_col`` = sum of ``value`` over all strictly-earlier rows.

    Same two strategies as ``with_global_seq``: ``single`` is one window
    (small inputs); ``ranged`` is range-exchange + per-partition prefix sum +
    a tiny collect of per-partition totals — the distributed form for
    10^9-row inputs (used by the WARC file-rotation planner, K2).
    """
    value = value if not isinstance(value, str) else F.col(value)
    if mode == "single":
        w = (
            Window.partitionBy(F.lit(0))
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return df.withColumn(
            out_col, F.coalesce(F.sum(value).over(w), F.lit(0)).cast("long")
        )

    if mode != "ranged":
        raise ValueError(mode)
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.withColumn("__v", value.cast("long")).repartitionByRange(
        n, *order
    ).withColumn("__pid", F.spark_partition_id())
    ranged = ranged.persist()
    if cache_handle is not None:
        cache_handle.append(ranged)
    totals = (
        ranged.groupBy("__pid").agg(F.sum("__v").alias("__t")).orderBy("__pid").collect()
    )
    offsets, acc = {}, 0
    for r in totals:
        offsets[r["__pid"]] = acc
        # F.sum is null for a partition whose __v values are all null
        acc += r["__t"] or 0
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()], "__pid int, __off long"
        )
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        ranged.join(off_df, "__pid")
        .withColumn(
            out_col,
            (F.coalesce(F.sum("__v").over(w), F.lit(0)) + F.col("__off")).cast("long"),
        )
        .drop("__pid", "__off", "__v")
    )
