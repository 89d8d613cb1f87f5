"""Ordinal FIFO join (custom operator #1).

Reference semantics (``httrack/HttrackCrawl.java:49-51, 68-86, 173-174, 261-262``):
headers parsed from ``hts-ioinfo.txt`` are queued per scheme-stripped canonical URL
key; as the record stream is consumed, each occurrence of a key ``poll()``s the next
queued header — the k-th occurrence of the key on the probe side matches the k-th
occurrence on the build side ("add both to a queue … and hope the order is
preserved", comment at ``HttrackCrawl.java:71-75``). This is how http/https
duplicates that collapse onto one key get disambiguated.

Spark-first formulation: stamp both sides with an occurrence ordinal
(``row_number() over (partition by key order by seq)``) and left-equi-join on
``(key, ordinal)``. At scale this is the plan you want:

- both ``row_number`` windows and the join shuffle hash-partition on the *same*
  key, so AQE reuses one exchange per side — two shuffles total, no sort beyond
  the window's per-partition sort;
- the probe side keeps every row (left outer) — records with no header survive
  with nulls, exactly like ``poll()`` on an empty queue;
- if the build side is small (a crawl's header log), pass ``broadcast=True`` to
  collapse the join into a broadcast-hash-join (the window on the build side
  still runs, but on the small side only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ordinal_fifo_join"]


def ordinal_fifo_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_order: str,
    build_order: str,
    how: str = "left",
    broadcast: bool = False,
    ordinal_col: str = "__ord",
) -> DataFrame:
    """Join the k-th occurrence of ``key`` in ``probe`` (ordered by
    ``probe_order``) with the k-th occurrence in ``build`` (ordered by
    ``build_order``). Build-side columns come through as-is; callers should
    pre-project/rename to avoid collisions (``key`` itself is deduplicated).
    """
    pw = Window.partitionBy(key).orderBy(probe_order)
    bw = Window.partitionBy(key).orderBy(build_order)
    p = probe.withColumn(ordinal_col, F.row_number().over(pw))
    b = build.withColumn(ordinal_col, F.row_number().over(bw)).drop(build_order)
    if broadcast:
        b = F.broadcast(b)
    joined = p.join(b, on=[key, ordinal_col], how=how)
    return joined.drop(ordinal_col)
