"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k of every query against the corpus —
  the correctness baseline. Dot products are JVM-side (``zip_with`` +
  ``aggregate``, codegen'd); the top-k is a per-query window. O(|Q|·|C|) —
  fine for a query batch against a partitioned corpus, not for all-pairs.
- ``lsh_ann_topk``: the scale path — random-hyperplane LSH (signed projections
  → band buckets, the same banding trick as MinHash-LSH), candidates =
  bucket-join, exact re-rank of candidates only. Probabilistic recall;
  ``num_tables`` trades recall for candidate volume.
- ``ivf_topk``: IVF-style variant — k-means-ish coarse centroids picked
  deterministically (hash-sampled corpus rows), every vector assigned to its
  nearest centroid (broadcast), queries probe the ``nprobe`` nearest cells.

All math stays in Spark expressions; hyperplanes/centroids are small driver
arrays folded into literal columns (broadcast by codegen), never per-row
Python.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cosine", "brute_force_topk", "lsh_ann_topk", "ivf_topk"]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(v: Column) -> Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    query_id_col: str = "query_id",
) -> DataFrame:
    """(query_id, id, cosine_sim) — exact top-k per query, deterministic ties
    (score desc, id asc). Cross join is intentional: |Q| is small; Spark
    broadcasts the query side."""
    q = F.broadcast(
        queries.select(
            F.col(query_id_col), F.col(vec_col).alias("__qv")
        )
    )
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("__cv"))
    scored = c.crossJoin(q).select(
        query_id_col,
        id_col,
        (
            _dot(F.col("__qv"), F.col("__cv"))
            / (_norm(F.col("__qv")) * _norm(F.col("__cv")))
        ).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= k)
        .drop("__r")
    )


def _hyperplanes(dim: int, n: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, dim))


def _sign_bucket(vec_col: Column, planes: np.ndarray) -> Column:
    """Pack sign(v·h_i) bits into one long bucket id."""
    bits = []
    for i, h in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(float(x)) for x in h]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda a, v: a + v,
        )
        bits.append(F.when(proj >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    query_id_col: str = "query_id",
    dim: int | None = None,
    bits: int = 12,
    num_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane LSH: per table, corpus and queries bucket on the
    packed sign bits; equal buckets are candidates; candidates re-ranked
    exactly. Shuffles on (table, bucket) — 8-byte keys regardless of dim."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])

    c_buckets = []
    q_buckets = []
    for t in range(num_tables):
        planes = _hyperplanes(dim, bits, seed + t)
        c_buckets.append(
            corpus.select(
                F.col(id_col),
                F.col(vec_col).alias("__cv"),
                F.lit(t).alias("table"),
                _sign_bucket(F.col(vec_col), planes).alias("bucket"),
            )
        )
        q_buckets.append(
            queries.select(
                F.col(query_id_col),
                F.col(vec_col).alias("__qv"),
                F.lit(t).alias("table"),
                _sign_bucket(F.col(vec_col), planes).alias("bucket"),
            )
        )
    c_all = c_buckets[0]
    for x in c_buckets[1:]:
        c_all = c_all.unionByName(x)
    q_all = q_buckets[0]
    for x in q_buckets[1:]:
        q_all = q_all.unionByName(x)

    cand = (
        c_all.join(F.broadcast(q_all), ["table", "bucket"])
        .select(query_id_col, id_col, "__qv", "__cv")
        .dropDuplicates([query_id_col, id_col])
    )
    scored = cand.select(
        query_id_col,
        id_col,
        (
            _dot(F.col("__qv"), F.col("__cv"))
            / (_norm(F.col("__qv")) * _norm(F.col("__cv")))
        ).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= k)
        .drop("__r")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    query_id_col: str = "query_id",
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF: deterministic hash-sampled centroids; vectors partition by nearest
    centroid; queries probe the nprobe nearest cells; exact re-rank inside."""
    # centroids = first n_cells corpus rows by xxhash64(id) — deterministic sample
    cents = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)))
        .limit(n_cells)
        .collect()
    )
    cent_vecs = [list(r[1]) for r in cents]

    def nearest_cells(vec: Column, n: int) -> Column:
        scored = F.array(
            *[
                F.struct(
                    (-_dot(vec, F.array(*[F.lit(float(x)) for x in cv]))
                     / _norm(F.array(*[F.lit(float(x)) for x in cv]))).alias("d"),
                    F.lit(i).alias("cell"),
                )
                for i, cv in enumerate(cent_vecs)
            ]
        )
        return F.slice(F.array_sort(scored), 1, n)

    c = corpus.select(
        F.col(id_col),
        F.col(vec_col).alias("__cv"),
        nearest_cells(F.col(vec_col), 1)[0]["cell"].alias("cell"),
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qv"),
        F.explode(
            F.transform(nearest_cells(F.col(vec_col), nprobe), lambda s: s["cell"])
        ).alias("cell"),
    )
    cand = c.join(F.broadcast(q), "cell").dropDuplicates([query_id_col, id_col])
    scored = cand.select(
        query_id_col,
        id_col,
        (
            _dot(F.col("__qv"), F.col("__cv"))
            / (_norm(F.col("__qv")) * _norm(F.col("__cv")))
        ).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= k)
        .drop("__r")
    )
