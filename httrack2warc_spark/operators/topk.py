"""Per-key top-k — the politeness scheduler's core (O3) — plus the salted
skew-aware variant (O4).

The reference *replays* HTTrack's politeness-constrained visit order
(options in the crawl cmdline, e.g. ``test-hts-log.txt:2``); the target
engine must *produce* it: each round, take at most ``budget(host)`` URLs per
host, best-priority first, with a total deterministic tiebreak.

Plain form: one shuffle on ``key``, rank window, filter — fine when no host
dominates. Salted form for skew (one host = half the frontier): phase 1 ranks
within ``(key, salt)`` sub-partitions and keeps the per-salt top-k (cuts the
hot key's rows to ``salt_buckets*k`` ≤ tiny), phase 2 re-ranks the survivors
per key. Two narrow shuffles instead of one monster partition — the explicit
skew handling BASELINE.json's north_rule demands (AQE splits skewed *joins*,
not windows, so the salting is in the plan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["per_key_topk", "salted_per_key_topk", "waterfill_budgets"]


def _budget_col(budget) -> Column:
    return budget if isinstance(budget, Column) else F.lit(budget)


def per_key_topk(
    df: DataFrame,
    key: str,
    order: list,
    budget,
    rank_col: str = "__rank",
) -> DataFrame:
    """rank() ≤ budget per key. ``order`` must totalize (priority, seq, url)."""
    w = Window.partitionBy(key).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= _budget_col(budget))
        .drop(rank_col)
    )


def salted_per_key_topk(
    df: DataFrame,
    key: str,
    order: list,
    budget,
    salt_buckets: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-phase skew-safe top-k per key. Identical result to ``per_key_topk``
    for any total ``order`` (each per-salt top-k is a superset of that salt's
    contribution to the global top-k).

    ``salt_on`` names the column whose hash spreads the hot key (default: the
    first order column's underlying name is NOT safe — pass an id/url column).
    """
    salt = F.pmod(F.xxhash64(F.col(salt_on if salt_on else key)), F.lit(salt_buckets))
    b = _budget_col(budget)
    phase1 = Window.partitionBy(key, "__salt").orderBy(*order)
    local = (
        df.withColumn("__salt", salt)
        .repartition(F.col(key), F.col("__salt"))
        .withColumn("__r1", F.row_number().over(phase1))
        .where(F.col("__r1") <= b)
        .drop("__r1")
    )
    phase2 = Window.partitionBy(key).orderBy(*order)
    return (
        local.withColumn("__r2", F.row_number().over(phase2))
        .where(F.col("__r2") <= b)
        .drop("__r2", "__salt")
    )


def waterfill_budgets(
    df: DataFrame,
    key_col: str,
    demand_col: str,
    capacity: int,
    mode: str = "ranged",
    num_partitions: int | None = None,
) -> DataFrame:
    """Max-min fair (water-filling) allocation of a global round capacity
    across hosts: every host gets ``min(demand, θ)`` with the water level θ
    chosen so the allocations sum to exactly ``min(capacity, Σdemand)`` —
    the budget-allocation step a global fetch-rate cap forces on a crawl
    round (per-host politeness bounds how fast each host MAY be fetched;
    the cluster's fetch capacity bounds how much the round CAN do; max-min
    is the standard fairness rule so one mega-host cannot starve the tail).

    Exact integer algorithm: sort hosts by (demand, key) ascending with
    inclusive prefix sum ``cum`` and rank ``i``; a host is *satisfiable* if
    cum_i + (H−i)·d_i ≤ C. With k = the last satisfiable rank, hosts ranked
    ≤ k receive their full demand and the remaining H−k hosts split
    C − cum_k evenly: θ = (C−cum_k) div (H−k) each, the mod remainder going
    one extra unit apiece to the first ranks after k (deterministic). The
    div/mod never exceeds any remaining host's demand (d_{k+1} > θ follows
    from k's maximality), so allocations are feasible and sum exactly.

    Scale shape: ``mode="ranged"`` is a range exchange on (demand, key) +
    per-partition window, with per-partition (Σd, count) offsets collected
    to the driver — the K2 ``with_running_total`` pattern, metadata-scale
    (num_partitions rows), never row data. The (k, cum_k, H) scalars are a
    second 1-row collect folded back as literals (the IVF centroid-collect
    precedent). ``mode="single"`` is one global window for small inputs.

    Returns (key, demand, alloc) — alloc: long, Σ = min(capacity, Σdemand).
    """
    C = max(int(capacity), 0)
    d = F.col(demand_col).cast("long")
    if mode == "single":
        ranked = df.select(
            F.col(key_col).alias("key"), d.alias("demand")
        ).withColumn("rank", F.row_number().over(
            Window.partitionBy(F.lit(0)).orderBy(F.col("demand"), F.col("key"))
        )).withColumn("cum", F.sum("demand").over(
            Window.partitionBy(F.lit(0))
            .orderBy(F.col("demand"), F.col("key"))
            .rowsBetween(Window.unboundedPreceding, 0)
        ))
    elif mode == "ranged":
        n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
        ranged = (
            df.select(F.col(key_col).alias("key"), d.alias("demand"))
            .repartitionByRange(n, F.col("demand"), F.col("key"))
            .withColumn("__pid", F.spark_partition_id())
            .persist()
        )
        parts = (
            ranged.groupBy("__pid")
            .agg(F.sum("demand").alias("__t"), F.count(F.lit(1)).alias("__c"))
            .orderBy("__pid")
            .collect()
        )
        off_t, off_c, offs = 0, 0, {}
        for r in parts:
            offs[r["__pid"]] = (off_t, off_c)
            off_t += r["__t"]
            off_c += r["__c"]
        off_df = df.sparkSession.createDataFrame(
            [(p, t, c) for p, (t, c) in offs.items()],
            "__pid int, __off_t long, __off_c long",
        )
        wp = Window.partitionBy("__pid").orderBy(F.col("demand"), F.col("key"))
        ranked = (
            ranged.join(F.broadcast(off_df), "__pid")
            .withColumn(
                "rank", F.row_number().over(wp) + F.col("__off_c")
            )
            .withColumn(
                "cum",
                F.sum("demand").over(
                    wp.rowsBetween(Window.unboundedPreceding, 0)
                )
                + F.col("__off_t"),
            )
            .drop("__pid", "__off_t", "__off_c")
        )
    else:
        raise ValueError(mode)

    ranked = ranked.localCheckpoint(eager=True)
    if mode == "ranged":
        # the eager checkpoint materialized everything downstream needs;
        # drop the range-exchange cache here so callers can't leak it
        ranged.unpersist()
    totals = ranked.agg(
        F.count(F.lit(1)).alias("h"), F.coalesce(F.sum("demand"), F.lit(0)).alias("td")
    ).collect()[0]
    H, total_demand = totals["h"], totals["td"]
    if H == 0:
        return ranked.select("key", "demand", F.lit(0).cast("long").alias("alloc"))
    feas = ranked.where(
        F.col("cum") + (F.lit(H) - F.col("rank")) * F.col("demand") <= F.lit(C)
    ).agg(F.max(F.struct(F.col("rank"), F.col("cum"))).alias("s")).collect()[0]["s"]
    k, cum_k = (feas["rank"], feas["cum"]) if feas is not None else (0, 0)
    if k >= H:
        alloc = F.col("demand")
    else:
        theta = (C - cum_k) // (H - k)
        rem = (C - cum_k) % (H - k)
        alloc = (
            F.when(F.col("rank") <= F.lit(k), F.col("demand"))
            .when(F.col("rank") - F.lit(k) <= F.lit(rem), F.lit(theta + 1))
            .otherwise(F.lit(theta))
        )
    return ranked.select(
        "key", "demand", alloc.cast("long").alias("alloc")
    )
