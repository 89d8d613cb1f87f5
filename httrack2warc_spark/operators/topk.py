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

__all__ = ["per_key_topk", "salted_per_key_topk"]


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
