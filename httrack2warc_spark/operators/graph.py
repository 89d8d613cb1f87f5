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

__all__ = ["triangle_counts", "common_neighbor_scores"]


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


def common_neighbor_scores(
    edges: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    min_common: int = 1,
    max_center_degree: int | None = None,
) -> DataFrame:
    """Link prediction by exact common-neighbor / Jaccard counts: for every
    NON-adjacent pair ``(a < b)`` at distance 2, return
    ``(a, b, common, deg_a, deg_b)`` — ``common`` exact, and the Jaccard
    score is the exact rational ``common / (deg_a + deg_b - common)``,
    shipped as its integer parts so no float enters the result (build-notes
    cross-engine determinism rule).

    Scale: wedge generation through a common neighbor ``v`` fans out
    ``deg(v)²`` — a 10^5-degree hub alone emits 10^10 pairs.
    ``max_center_degree`` drops hub CENTERS from CANDIDATE generation only
    (the ``max_shingle_df`` pattern from the dedup family: a bounded,
    documented recall trade — a pair whose EVERY witness is a hub is never
    emitted, and that loss is the least informative precisely because a hub
    neighborhood is uninformative).  Surviving candidates are then
    re-counted EXACTLY over the full neighbor sets (the dedup family's
    "candidates capped, verify exact" recipe), so every emitted score —
    ``common``, degrees, and the Jaccard rational — is exact, never the
    hub-censored undercount; the recount join fans out deg(a) per
    candidate, bounded because the candidate set is already pruned.
    ``min_common`` prunes the long tail before the degree joins.  Shuffles:
    canonicalize+distinct, the wedge self-join on the center, the pair
    aggregate (plus, under the cap, the exact-recount join); the degree
    attach is two joins on 8-byte keys.
    """
    e = (
        edges.select(
            F.least(F.col(a_col), F.col(b_col)).alias("a"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    both = e.select(F.col("a").alias("v"), F.col("b").alias("x")).unionAll(
        e.select(F.col("b").alias("v"), F.col("a").alias("x"))
    )
    deg = both.groupBy("v").agg(F.count(F.lit(1)).alias("d"))
    if max_center_degree is not None:
        centers = both.join(
            deg.where(F.col("d") <= max_center_degree).select("v"), "v", "leftsemi"
        )
        cand = (
            centers.alias("l")
            .join(centers.alias("r"), "v")
            .where(F.col("l.x") < F.col("r.x"))
            .select(F.col("l.x").alias("a"), F.col("r.x").alias("b"))
            .distinct()
        )
        # exact recount over the FULL neighbor sets: |N(a) ∩ N(b)| via two
        # joins on 8-byte keys — hub witnesses count again here, only the
        # candidate GENERATION was capped
        pairs = (
            cand.join(
                both.select(F.col("v").alias("a"), F.col("x").alias("__nb")), "a"
            )
            .join(
                both.select(F.col("v").alias("b"), F.col("x").alias("__nb")),
                ["b", "__nb"],
                "leftsemi",
            )
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("common"))
            .where(F.col("common") >= min_common)
        )
    else:
        pairs = (
            both.alias("l")
            .join(both.alias("r"), "v")
            .where(F.col("l.x") < F.col("r.x"))
            .select(F.col("l.x").alias("a"), F.col("r.x").alias("b"))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("common"))
            .where(F.col("common") >= min_common)
        )
    nonadj = pairs.join(e, ["a", "b"], "left_anti")
    return (
        nonadj.join(deg.select(F.col("v").alias("a"), F.col("d").alias("deg_a")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("d").alias("deg_b")), "b")
        .select("a", "b", "common", "deg_a", "deg_b")
    )
