"""As-of join — the classic time-series operator Spark's DataFrame API
lacks (pandas ``merge_asof`` / DuckDB ``ASOF JOIN``): for every left row,
attach the single right row with the LARGEST right timestamp ≤ the left
timestamp within the same key group (backward as-of).

Implemented as the union-window form, NOT a range join: tag both inputs,
union them, and take ``last(right_payload, ignorenulls=True)`` over a
window partitioned by key and ordered by (ts, side, tiebreak) up to the
current row — every left row then carries the payload of the nearest
preceding right row.

Scale: ONE exchange on the key + one sort, total work O((|L|+|R|) log p)
per partition — a naive range join (`l.ts >= r.ts` with a per-key max
filter) explodes to |L|·|R| pairs per key before pruning, which at 10^10
rows is the difference between a shuffle and a non-starter. Skewed keys
ride the same AQE machinery as any single-exchange window; the payload
travels as one struct column so multi-column attachment costs no extra
window passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tiebreak: str | None = None,
    exact_matches: bool = True,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: every ``left`` row gains ``right_cols`` from the right
    row with the largest ``right_ts`` ≤ ``left_ts`` (``direction=
    "backward"``, the default) or the smallest ``right_ts`` ≥ ``left_ts``
    (``direction="forward"`` — "next reading after the event"); strict
    inequality when ``exact_matches=False``; nulls when no such row.
    Forward is the same union-window traversed in descending timestamp
    order — still ONE exchange, no range join.

    ``tiebreak``: a right-side column totalizing the order among right rows
    with identical (key, ts) — REQUIRED for a deterministic result if such
    duplicates can exist (the matched row is the one with the greatest
    tiebreak value). Left rows keep all their columns; ``right_ts`` is
    attached alongside ``right_cols`` (callers alias collisions beforehand).

    NULL timestamps follow DuckDB ASOF JOIN / pandas merge_asof: a right
    row with NULL ``right_ts`` never matches anything (filtered before the
    union — otherwise Spark's nulls-first ascending sort would attach it to
    every left row preceding the first real right row), and a left row with
    NULL ``left_ts`` gets the all-NULL no-match result (nulls sort first in
    BOTH traversal directions, before any right row is visible).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction}")
    keys = [on] if isinstance(on, str) else list(on)
    payload = F.struct(
        F.col(right_ts), *[F.col(c) for c in right_cols]
    ).alias("__rp")
    # side ordering at equal ts: right rows must sort BEFORE left rows to be
    # visible at the left row (exact_matches) or AFTER to be excluded
    r_side, l_side = (0, 1) if exact_matches else (1, 0)
    right = right.where(F.col(right_ts).isNotNull())
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(r_side).alias("__side"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("__tb"),
        payload,
        *[F.lit(None).alias(f"__l_{c}") for c in left.columns],
    )
    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(l_side).alias("__side"),
        F.lit(0).alias("__tb"),
        F.lit(None).cast(r_tagged.schema["__rp"].dataType).alias("__rp"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    # nulls FIRST in both directions: a NULL-ts left row's window then
    # contains no right rows, giving the no-match result (desc defaults to
    # nulls-last, which would hand a NULL-ts left row the whole window)
    ts_order = (
        F.col("__ts")
        if direction == "backward"
        else F.col("__ts").desc_nulls_first()
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, "__side", "__tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__m", F.last("__rp", ignorenulls=True).over(w))
        .where(F.col("__side") == l_side)
    )
    return matched.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        F.col(f"__m.{right_ts}").alias(right_ts),
        *[F.col(f"__m.{c}").alias(c) for c in right_cols],
    )
