"""PageRank over a link graph — link-based frontier prioritization.

The scheduler's default priority is BFS depth (the reference crawl's
semantics, which the golden visit order pins). A production crawler
re-prioritizes its frontier by link evidence (OPIC / backlink counts /
PageRank); this operator supplies that scoring as a pure DataFrame
computation so a priority column can be joined onto the frontier between
rounds without touching the visit-order contract.

Standard power iteration:
    rank(v) = (1 - d) / N + d * Σ_{u→v} rank(u) / outdeg(u)
with the simplified dangling-mass treatment (no redistribution) — the exact
formula the DuckDB oracle unrolls, so results are value-checkable.

Scale shape per iteration: one join of the edge list with the current ranks
(shuffle on the 8-byte src key), one groupBy(dst) sum, one left join back to
the vertex set. Rank rows are (vertex, double) — never wider.
``localCheckpoint`` truncates the per-iteration lineage (same reason as
connected_components: Catalyst plans grow exponentially under iteration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(vertex, rank) after ``iterations`` of power iteration over the
    distinct edge set. Vertices = every node appearing as src or dst."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t")).distinct()
    e = e.persist()
    verts = (
        e.select(F.col("s").alias("vertex"))
        .unionByName(e.select(F.col("t").alias("vertex")))
        .distinct()
        .persist()
    )
    n = verts.count()
    deg = e.groupBy("s").agg(F.count("*").alias("deg"))
    base = (1.0 - damping) / n
    ranks = verts.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(eager=True)
    for _ in range(iterations):
        contribs = (
            e.join(ranks, e["s"] == ranks["vertex"])
            .join(deg, "s")
            .select(F.col("t").alias("vertex"),
                    (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("vertex")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            verts.join(contribs, "vertex", "left")
            .select(
                "vertex",
                (F.lit(base)
                 + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                 ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    verts.unpersist()
    return ranks
