"""Distributed triangle counting (Suri & Vassilvitskii's degree-ordered
node-iterator — the MapReduce-era trick that makes triangle enumeration
feasible at web scale): orient every edge from the lower-(degree, id)
endpoint to the higher one, so every node's out-degree is O(sqrt(m)) even
for celebrity nodes, then wedge-join oriented edges on their source and
confirm the closing edge with one more equi join.  Without the
orientation a hub of degree d fans out d² wedges — 10^10 for a single
10^5-degree node; with it the fan-out is bounded by the orientation's
out-degree cap, which is the whole scale story.

Complements pagerank.py (centrality) and dedup.py's connected components
(reachability) with the third classic web-graph statistic (clustering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["triangle_counts"]


def triangle_counts(
    edges: DataFrame, a_col: str = "a", b_col: str = "b"
) -> DataFrame:
    """(node, n_triangles) for every node in at least one triangle of the
    undirected simple graph given by ``edges`` (direction/duplicates/self
    loops are normalized away first).

    Three shuffles total: canonicalize+distinct, the wedge self-join on
    the oriented source, and the closing-edge semi join — every joined row
    is a pair of 8-byte node ids.  Deterministic: output is a pure
    function of the edge set.
    """
    e = (
        edges.select(
            F.least(F.col(a_col), F.col(b_col)).alias("a"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient low-(degree, id) -> high-(degree, id)
    ed = (
        e.join(deg.withColumnRenamed("n", "a").withColumnRenamed("d", "da"), "a")
        .join(deg.withColumnRenamed("n", "b").withColumnRenamed("d", "db"), "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("s"), F.col("b").alias("t")),
            )
            .otherwise(F.struct(F.col("b").alias("s"), F.col("a").alias("t")))
            .alias("o")
        )
        .select("o.s", "o.t")
    )
    w1 = ed.select(F.col("s"), F.col("t").alias("v"))
    w2 = ed.select(F.col("s"), F.col("t").alias("w"))
    wedges = w1.join(w2, "s").where(F.col("v") < F.col("w"))
    # closing edge may be oriented either way after the degree flip, but its
    # CANONICAL form is unique: compare against the canonical edge set
    closed = wedges.join(
        e.select(F.col("a").alias("v"), F.col("b").alias("w")),
        ["v", "w"],
        "leftsemi",
    )
    tri_nodes = (
        closed.select(F.explode(F.array("s", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return tri_nodes
