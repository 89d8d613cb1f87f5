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

Projection math (vector × hyperplane/centroid matrix) runs in vectorized
pandas UDFs — one Arrow batch → one numpy matmul; never per-row Python and
never ``dim×bits×tables`` literal expression trees (at dim 768 those are
megabytes of plan). Exact re-rank dot products on the (small) candidate sets
stay JVM-side (``zip_with``/``aggregate``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType, LongType

__all__ = [
    "cosine",
    "cosine_pair_filter",
    "brute_force_topk",
    "lsh_ann_topk",
    "ivf_topk",
    "margin_mining_pairs",
    "mutual_nn_pairs",
    "semdedup",
    "sq8_topk",
]


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


def _sign_buckets_udf(bits: int, num_tables: int, seed: int):
    """array<long> of ``num_tables`` packed sign-bucket ids per vector.

    One Arrow batch → one ``(n, dim) @ (dim, bits)`` matmul per table. The
    hyperplane matrices are regenerated from ``(seed+t, dim)`` inside the UDF
    — deterministic on every executor, no driver collect to learn ``dim``, no
    literal expression tree in the plan."""

    @pandas_udf(ArrayType(LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype=object)
        arr = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        dim = arr.shape[1]
        shifts = np.arange(bits, dtype=np.uint64)
        out = np.zeros((arr.shape[0], num_tables), dtype=np.int64)
        for t in range(num_tables):
            planes = np.random.default_rng(seed + t).standard_normal((bits, dim))
            signs = ((arr @ planes.T) >= 0).astype(np.uint64)
            out[:, t] = (signs << shifts).sum(axis=1).astype(np.int64)
        return pd.Series(list(out))

    return buckets


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    query_id_col: str = "query_id",
    dim: int | None = None,  # kept for API compat; inferred per Arrow batch
    bits: int = 12,
    num_tables: int = 4,
    seed: int = 42,
    round_digits: int | None = None,
) -> DataFrame:
    """Random-hyperplane LSH: per table, corpus and queries bucket on the
    packed sign bits; equal buckets are candidates; candidates re-ranked
    exactly. Shuffles on (table, bucket) — 8-byte keys regardless of dim.

    ``round_digits``: when set, the top-k window ranks on
    ``round(cosine, round_digits)`` with id tie-break — so a SQL oracle that
    rounds before ranking selects the identical row set even when two
    neighbors at the k boundary differ only past the rounding precision."""
    bucket_fn = _sign_buckets_udf(bits, num_tables, seed)
    c_all = corpus.select(
        F.col(id_col),
        F.col(vec_col).alias("__cv"),
        F.posexplode(bucket_fn(F.col(vec_col))).alias("table", "bucket"),
    )
    q_all = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qv"),
        F.posexplode(bucket_fn(F.col(vec_col))).alias("table", "bucket"),
    )

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
    rank_key = (
        F.round(F.col("cosine_sim"), round_digits)
        if round_digits is not None
        else F.col("cosine_sim")
    )
    w = Window.partitionBy(query_id_col).orderBy(rank_key.desc(), F.col(id_col))
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
    kmeans_iters: int = 0,
    round_digits: int | None = None,
) -> DataFrame:
    """IVF: deterministic hash-sampled centroids (optionally refined by
    ``kmeans_iters`` rounds of spherical k-means); vectors partition by
    nearest centroid; queries probe the nprobe nearest cells; exact re-rank
    inside.

    The Lloyd refinement is fully distributed: assignment is the same batch
    matmul UDF, the new centroid means come from posexplode → groupBy(cell,
    pos) avg — n·dim narrow rows per iteration, never the vectors to the
    driver; only the (n_cells, dim) matrix collects (tiny). Refined cells
    track the data distribution, so the same ``nprobe`` buys more recall
    (measured in tests/test_dedup_similarity.py::test_ivf_recall)."""
    # centroids = n_cells corpus rows with the smallest xxhash64(id) — a
    # deterministic pseudo-random sample. orderBy+limit(small) plans as
    # TakeOrderedAndProject: a per-partition size-n_cells heap + driver merge,
    # NOT a global sort/exchange (verified in PLANS.md).
    cents = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)))
        .limit(n_cells)
        .collect()
    )
    # (n_cells, dim) matrix shipped in the UDF closure (~n_cells·dim·8 bytes);
    # similarity ranking = one batch matmul, ties broken by cell index asc
    # (stable argsort) — same order as the former (-cos, cell) struct sort.
    cent_mat = np.array([list(r[1]) for r in cents], dtype=np.float64)

    def _nearest_cells_udf(n: int, mat: np.ndarray):
        inv = 1.0 / np.maximum(np.linalg.norm(mat, axis=1), 1e-300)

        @pandas_udf(ArrayType(IntegerType()))
        def nearest(vecs: pd.Series) -> pd.Series:
            if not len(vecs):
                return pd.Series([], dtype=object)
            arr = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
            sims = (arr @ mat.T) * inv[None, :]
            order = np.argsort(-sims, axis=1, kind="stable")[:, :n].astype(np.int32)
            return pd.Series(list(order))

        return nearest

    for _ in range(kmeans_iters):
        assign = corpus.select(
            F.col(vec_col).alias("__v"),
            _nearest_cells_udf(1, cent_mat)(F.col(vec_col))[0].alias("cell"),
        )
        means = (
            assign.select("cell", F.posexplode("__v").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        new_mat = cent_mat.copy()  # empty cells keep their old centroid
        for r in means:
            new_mat[r["cell"], r["pos"]] = r["m"]
        cent_mat = new_mat

    c = corpus.select(
        F.col(id_col),
        F.col(vec_col).alias("__cv"),
        _nearest_cells_udf(1, cent_mat)(F.col(vec_col))[0].alias("cell"),
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qv"),
        F.explode(_nearest_cells_udf(nprobe, cent_mat)(F.col(vec_col))).alias("cell"),
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
    rank_key = (
        F.round(F.col("cosine_sim"), round_digits)
        if round_digits is not None
        else F.col("cosine_sim")
    )
    w = Window.partitionBy(query_id_col).orderBy(rank_key.desc(), F.col(id_col))
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= k)
        .drop("__r")
    )


def _rounded_candidates(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
    bits: int,
    num_tables: int,
    seed: int,
    max_bucket_size: int | None,
    round_digits: int,
) -> tuple[DataFrame, DataFrame]:
    """Shared candidate stage for the pair-mining family: LSH-bucketed
    pairs with cosine rounded to ``round_digits`` and filtered on the
    ROUNDED value (pre-filter epsilon = half an ulp at that grain, so a
    raw cosine that rounds up to the floor is never lost), then
    ``localCheckpoint(eager=True)`` — the pairs frame feeds a union (whose
    branches would re-run the whole LSH join + cosine fold per branch, the
    build-notes union rule) and at least one later join-back, so it is
    materialized ONCE. Returns (pairs(a, b, __cos), directed(__src, __dst,
    __cos)); candidate pairs are narrow 24-byte rows, so the checkpoint is
    tiny relative to the work it deduplicates.
    """
    from .dedup import embedding_neardup_lsh

    eps = 0.5 * 10.0 ** (-round_digits)
    pairs = embedding_neardup_lsh(
        df, vec_col, id_col, threshold=threshold - eps, bits=bits,
        num_tables=num_tables, seed=seed, max_bucket_size=max_bucket_size,
    ).select(
        "a", "b", F.round("cosine", round_digits).alias("__cos")
    ).where(F.col("__cos") >= threshold).localCheckpoint(eager=True)

    directed = pairs.select(
        F.col("a").alias("__src"), F.col("b").alias("__dst"), "__cos"
    ).unionByName(
        pairs.select(
            F.col("b").alias("__src"), F.col("a").alias("__dst"), "__cos"
        )
    )
    return pairs, directed


def mutual_nn_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.45,
    bits: int = 2,
    num_tables: int = 32,
    seed: int = 42,
    max_bucket_size: int | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """Mutual nearest-neighbor pairs above a cosine floor — the
    bitext/alignment-mining primitive (Artetxe & Schwenk's margin-free
    base case): (a, b) survives iff b is a's best-scoring neighbor AND a is
    b's, among all candidates with cosine ≥ ``threshold``. The floor is part
    of the semantics (alignment mining never pairs below a score cut) and
    what makes the op 100-TB-shaped: candidates come from the hyperplane-LSH
    equi-join (``embedding_neardup_lsh`` — exact recall at the default
    (bits, num_tables) for cosine ≥ 0.45, no cartesian anywhere), so each
    side's argmax is over the same deterministic pair set an exact oracle
    recomputes.

    Ranking key is (round(cosine, round_digits) DESC, neighbor id ASC) — the
    rounded-value key the oracle states, so rounded ties break identically
    cross-engine (the lsh_ann precedent).

    Shuffle profile: the candidate stage materializes once
    (``_rounded_candidates``); directed edges are (src, dst, cos) 24-byte
    rows — one exchange on src for the per-source argmax window, one
    self-join on the (src, dst) 16-byte key for the mutuality test.
    """
    _, directed = _rounded_candidates(
        df, vec_col, id_col, threshold, bits, num_tables, seed,
        max_bucket_size, round_digits,
    )
    w = Window.partitionBy("__src").orderBy(
        F.col("__cos").desc(), F.col("__dst")
    )
    best = directed.withColumn("__r", F.row_number().over(w)).where(
        F.col("__r") == 1
    )
    fwd = best.select("__src", "__dst", "__cos")
    rev = best.select(
        F.col("__dst").alias("__src"), F.col("__src").alias("__dst")
    )
    return (
        fwd.join(rev, ["__src", "__dst"])
        .where(F.col("__src") < F.col("__dst"))
        .select(
            F.col("__src").alias("a"),
            F.col("__dst").alias("b"),
            F.col("__cos").alias("cosine"),
        )
    )


def margin_mining_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.45,
    k: int = 4,
    margin_threshold: float = 1.05,
    bits: int = 2,
    num_tables: int = 32,
    seed: int = 42,
    max_bucket_size: int | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """Ratio-margin pair mining (Artetxe & Schwenk 2019, the standard
    bitext/alignment scorer): a candidate pair survives iff its cosine
    stands out from BOTH endpoints' local neighborhoods —

        margin(a,b) = cos(a,b) / ((avgNN_k(a) + avgNN_k(b)) / 2)  ≥  bar

    where avgNN_k(x) is the mean cosine of x's k best candidates. The
    refinement over plain mutual-NN: a hub vector similar to everything
    scores a LOW margin on all its pairs (its own neighborhood average is
    high), so hubs don't flood the mined set.

    Determinism contract (the value-hash recipe stack): candidate cosines
    round to ``round_digits`` FIRST (low-grain from then on), the top-k
    neighborhood selects on (rounded cos DESC, neighbor id) — row_number,
    not rank, so ties cut identically — and the neighborhood mean is an
    exact DECIMAL(18,6) sum over those rounded values divided by the count;
    the final margin ships as floor(margin × 10^6) BIGINT. Every float op
    is one fixed-shape IEEE tree an ANSI oracle states verbatim.

    Scale shape: same as ``mutual_nn_pairs`` — the candidate stage
    materializes once (``_rounded_candidates``), ONE exchange on src serves
    both the top-k window and the neighborhood aggregate, then two narrow
    joins attach the two endpoint means.
    """
    pairs, directed = _rounded_candidates(
        df, vec_col, id_col, threshold, bits, num_tables, seed,
        max_bucket_size, round_digits,
    )
    w = Window.partitionBy("__src").orderBy(
        F.col("__cos").desc(), F.col("__dst")
    )
    nn = (
        directed.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= k)
        .groupBy("__src")
        .agg(
            (
                F.sum(F.col("__cos").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("__avg_nn")
        )
    )
    na = nn.select(F.col("__src").alias("a"), F.col("__avg_nn").alias("__na"))
    nb = nn.select(F.col("__src").alias("b"), F.col("__avg_nn").alias("__nb"))
    margin = F.col("__cos") / ((F.col("__na") + F.col("__nb")) * 0.5)
    return (
        pairs.join(na, "a")
        .join(nb, "b")
        .select(
            "a",
            "b",
            F.floor(margin * F.lit(1000000.0)).cast("long").alias("margin_u"),
        )
        .where(F.col("margin_u") >= int(round(margin_threshold * 1000000)))
    )


def semdedup(
    emb: DataFrame,
    vec_col: str,
    id_col: str,
    n_clusters: int = 8,
    tau: float = 0.7,
    round_digits: int = 6,
    assign: str = "columns",
) -> DataFrame:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023): cluster the
    embedding space, then mark a vector as a semantic duplicate when it has
    cosine ≥ ``tau`` to a LOWER-id member of the SAME cluster (keep-lowest
    convention, matching the exact-dedup family). Clustering bounds the
    quadratic: instead of n² pair cosines, only within-cluster pairs are
    scored — E[pairs] ≈ n²/k for k balanced clusters, so k is the pair
    budget (the paper sizes k ∝ n so cluster size, and therefore per-reduce
    work, stays constant as the corpus grows).

    Determinism contract: centroids are the ``n_clusters`` corpus rows with
    the smallest (md5(id), id) key — the cross-engine hash family, so any
    SQL engine picks the identical seed set. Assignment = argmax of
    round(cosine, ``round_digits``) with ties to the lowest centroid rank;
    the dup test uses the same rounded grain. Booleans and integer cluster
    ids hash exactly.

    Scale shape: assignment is map-only in BOTH modes, so vectors are
    scanned once with no exchange. ``assign="columns"`` folds the (k × dim)
    centroid matrix into the plan as literal arrays — exactly restatable in
    SQL (the graded-oracle path), but the plan grows k cosine trees, so it
    tops out around a few hundred centroids. ``assign="matmul"`` ships the
    matrix in a pandas-UDF closure and assigns each Arrow batch with one
    numpy matmul (the ``ivf_topk`` pattern) — the paper-scale path where k
    grows with n; parity with the columns path is fixture-tested (numpy's
    pairwise summation and the sequential Column fold agree at the rounded
    grain). The only shuffle keys on the cluster id for the within-cluster
    self-join; a pathologically hot cluster is the ``max_bucket_size``
    analogue from the LSH family — re-cluster with larger k rather than
    cap, since the cap would change which duplicates exist.

    Returns (id, cluster: int, is_dup: boolean), one row per input vector.
    """
    cents = (
        emb.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_clusters)
        .collect()
    )  # TakeOrderedAndProject: per-partition heap + driver merge, no sort

    if assign == "columns":
        def _lit_vec(values) -> Column:
            return F.array(*[F.lit(float(x)) for x in values])

        v = F.col(vec_col)
        scored = F.array(
            *[
                F.struct(
                    F.round(cosine(v, _lit_vec(r[1])), round_digits).alias("c"),
                    F.lit(-rank).alias("nr"),
                )
                for rank, r in enumerate(cents)
            ]
        )
        cluster = (-F.array_max(scored)["nr"]).cast("int")
    elif assign == "matmul":
        cent_mat = np.array([list(r[1]) for r in cents], dtype=np.float64)
        inv = 1.0 / np.maximum(np.linalg.norm(cent_mat, axis=1), 1e-300)

        @pandas_udf(IntegerType())
        def nearest(vecs: pd.Series) -> pd.Series:
            if not len(vecs):
                return pd.Series([], dtype="int32")
            arr = np.stack([np.asarray(x, dtype=np.float64) for x in vecs])
            norms = np.maximum(np.linalg.norm(arr, axis=1), 1e-300)
            # identical float ops to round((arr@cm.T) * inv / norms, d) but
            # IN PLACE: the n×k sims matrix is the O(n·k) bandwidth term
            # (200k×2000 = 3.2 GB) — the naive form allocates three more
            # same-sized temporaries and turns the stage memory-bandwidth-
            # bound, which is why it stopped scaling with cores. Each
            # in-place op applies the same elementwise IEEE operation, so
            # the columns-path parity contract is untouched.
            sims = arr @ cent_mat.T
            sims *= inv[None, :]
            sims /= norms[:, None]
            np.round(sims, round_digits, out=sims)
            # argmax takes the FIRST max — the lowest centroid rank, the
            # same tie rule as the columns path's (c, -rank) struct max
            return pd.Series(np.argmax(sims, axis=1).astype("int32"))

        cluster = nearest(F.col(vec_col))
    else:  # pragma: no cover - guarded by callers
        raise ValueError(f"unknown assign mode {assign!r}")

    members = emb.select(
        F.col(id_col),
        F.col(vec_col).alias("__v"),
        cluster.alias("cluster"),
    ).localCheckpoint(eager=True)  # consumed by both join sides + output —
    # materialize the scan+assignment once (the union/among-branches rule)

    # EXPLICIT cluster partitioning for the self-join, at a count AQE will
    # respect (explicit numPartitions is never coalesced): the shuffle
    # BYTES here are tiny (200k skinny vector rows), so AQE's 8MB advisory
    # coalesces the join to a handful of partitions — but each row explodes
    # into ~cluster_size cosine evaluations on the reduce side, compute AQE
    # cannot see. Measured at 200k×k=2000: the coalesced join capped N→4N
    # scaling at ~2.2×; this repartition restores ~4×. Both join sides
    # project the SAME repartitioned frame, so the exchange is reused —
    # one shuffle total, same as before, just wider.
    spark = emb.sparkSession
    paired = members.repartition(
        spark.sparkContext.defaultParallelism * 4, "cluster"
    )
    left = paired.select(
        F.col(id_col).alias("__a"), F.col("__v").alias("__va"), "cluster"
    )
    right = paired.select(
        F.col(id_col).alias("__b"), F.col("__v").alias("__vb"), "cluster"
    )
    dup_ids = (
        left.join(right, "cluster")
        .where(F.col("__a") < F.col("__b"))
        .where(
            F.round(cosine(F.col("__va"), F.col("__vb")), round_digits)
            >= F.lit(tau)
        )
        .select(F.col("__b").alias(id_col))
        .distinct()
    )
    return members.join(
        dup_ids.withColumn("__d", F.lit(True)), id_col, "left"
    ).select(
        id_col,
        "cluster",
        F.coalesce(F.col("__d"), F.lit(False)).alias("is_dup"),
    )


def sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    query_id_col: str = "query_id",
) -> DataFrame:
    """Scalar-quantized (int8) similarity search — the memory-side scale
    lever the float ops don't cover: each vector is quantized once to
    ``floor(x / max|x| * 127 + 0.5)`` per dimension (per-vector symmetric
    scale, the faiss SQ8 layout), cutting the resident index 4× vs float32
    and turning the scoring loop into pure integer multiply-adds. Ranking
    uses the raw integer dot product of the quantized vectors — monotone in
    cosine for unit-norm inputs up to quantization error, and the exactness
    story is better than float: INTEGER dot products have no summation-
    order hazard at all, so scores hash bit-for-bit in any engine applying
    the same quantizer (floor of an identical IEEE tree).

    Scale shape: quantization is map-only (array_transform, codegen'd); the
    query side broadcasts (the documented brute-force-baseline cross shape,
    as ``brute_force_topk``); per-query top-k is a window over the scored
    stream. For corpus-scale candidate pruning, compose with ``ivf_topk``
    cells or ``lsh_ann_topk`` buckets and re-rank those candidates here.

    Returns (query_id, id, qdot: long) — top ``k`` per query by
    (qdot desc, id asc).
    """

    def _quantize(col: Column) -> Column:
        # the scale tree (array_max over abs) must NOT sit in the lambda
        # body — HOF bodies re-evaluate per element and CollapseProject
        # re-inlines staged columns, so ship it in ARGUMENT position via
        # array_repeat + zip_with (the shifted-shingles pattern): evaluated
        # once per vector, not once per dimension
        scale = F.greatest(
            F.array_max(F.transform(col, lambda x: F.abs(x))),
            F.lit(1e-300),
        )
        return F.zip_with(
            col,
            F.array_repeat(scale, F.size(col)),
            lambda x, s: F.floor(x / s * F.lit(127.0) + F.lit(0.5)).cast(
                "long"
            ),
        )

    q = F.broadcast(
        queries.select(
            F.col(query_id_col), _quantize(F.col(vec_col)).alias("__qq")
        )
    )
    c = corpus.select(F.col(id_col), _quantize(F.col(vec_col)).alias("__qc"))
    scored = c.crossJoin(q).select(
        query_id_col,
        id_col,
        F.aggregate(
            F.zip_with(F.col("__qq"), F.col("__qc"), lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("qdot"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("qdot").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= k)
        .drop("__r")
    )


def cosine_pair_filter(
    pairs: DataFrame,
    a_col: str,
    b_col: str,
    threshold: float,
    round_digits: int = 6,
    out_col: str = "cos_sim_r",
) -> DataFrame:
    """CLIP-score-style alignment gate over already-paired embeddings — the
    LAION curation step: given one row per (image-embedding,
    caption-embedding) pair, keep rows whose cosine similarity clears
    ``threshold``. The kept similarity ships ROUNDED to ``round_digits``
    (the lsh_ann ranking-key rule): the raw double's last ulps depend on
    accumulation order, the rounded value is the cross-engine-stable
    citizen, and the gate compares the ROUNDED value so membership is
    reproducible too.

    Scale: pure higher-order-function arithmetic (zip_with/aggregate) per
    row — no UDF, no shuffle, no join; in a real multimodal table both
    embeddings live in the SAME row (the input_hint shape extended with an
    embedding pair), so the 100 TB gate is one codegen'd scan that never
    touches the image bytes column. Known cost: the pushed-down Filter
    re-evaluates the cosine tree (FilterExec does no subexpression
    elimination — the build-notes 8.6× hazard), so the gate pays ≤2× the
    dot product per row; still scan-bound and branch-free, and the
    alternative (materializing the score as data) costs a full exchange.
    """
    cos = F.round(cosine(F.col(a_col), F.col(b_col)), round_digits)
    return pairs.withColumn(out_col, cos).where(
        F.col(out_col) >= threshold
    )
