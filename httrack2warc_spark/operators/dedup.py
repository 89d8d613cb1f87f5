"""Deduplication family.

Reference semantics: first-occurrence dedup via in-heap ``HashSet.add`` while
streaming in visit order — per localfile (``httrack/HttrackCrawl.java:130,138,
210,223-226``) and per redirect URL (``:255-258``). ``dropDuplicates`` alone
loses *which* row wins, so the order-preserving form is
``row_number() over (partition by key order by seq) == 1``.

Beyond the reference, this module carries the dedup operators a training-data
pipeline needs at 100 TB (exact hash, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup). Scale notes inline per operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

__all__ = [
    "exact_dedup",
    "first_occurrence",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "minhash_lsh_dedup",
    "ngram_containment_pairs",
    "allpairs_jaccard_pairs",
    "ngram_jaccard_pairs",
    "hamming_neardup_pairs",
    "simhash64",
    "simhash64_of_hashes",
    "simhash_dedup",
    "embedding_neardup_candidates",
    "embedding_lsh_candidates",
    "embedding_neardup_lsh",
    "connected_components",
    "dedup_by_components",
    "winnow_fingerprints",
    "winnow_overlap_pairs",
    "minhash_cross_pairs",
    "incremental_dedup",
]

# ---------------------------------------------------------------------------
# order-preserving first-occurrence (A1/A2)
# ---------------------------------------------------------------------------


def first_occurrence(df: DataFrame, key, order, tiebreak: list | None = None) -> DataFrame:
    """Keep the first row per ``key`` in ``order`` (deterministic: pass
    ``tiebreak`` columns to totalize the order). One shuffle on ``key``."""
    keys = key if isinstance(key, list) else [key]
    orders = order if isinstance(order, list) else [order]
    w = Window.partitionBy(*keys).orderBy(*orders, *(tiebreak or []))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def exact_dedup(df: DataFrame, cols: list[str], order, tiebreak: list | None = None) -> DataFrame:
    """Exact dedup on a content hash of ``cols`` (first occurrence wins).

    Scale: grouping on ``xxhash64`` of the content instead of the content
    itself keeps shuffle rows narrow when the content column is wide (a
    document body); the full row still flows but the exchange key is 8 bytes.
    """
    hashed = df.withColumn("__h", F.xxhash64(*[F.col(c) for c in cols]))
    return first_occurrence(hashed, "__h", order, tiebreak).drop("__h")


# ---------------------------------------------------------------------------
# shingling + MinHash + LSH
# ---------------------------------------------------------------------------


def _word_array(text: Column) -> Column:
    """Normalized word array: lower → strip non-word → split → drop empties."""
    return F.filter(
        F.split(F.trim(F.regexp_replace(F.lower(text), r"[^\w\s]+", " ")), r"\s+"),
        lambda w: F.length(w) > 0,
    )


def _shingles_of(words: Column, n: int) -> Column:
    """Sliding word n-grams via ``zip_with`` over shifted copies of the array.

    Deliberately NOT the transform-over-indices formulation: any expression
    referenced inside a higher-order-function *lambda body* is re-evaluated
    PER ELEMENT, so `transform(idx, i -> slice(words, i, n))` turns an inline
    `words` tree into O(len²) per document — and Catalyst's CollapseProject
    can re-inline even a materialized column (measured: 6.4 s vs 0.66 s at
    sf0.1). Here ``words`` appears only in argument positions (evaluated once
    per row); zip_with pads the shorter side with null, which marks and drops
    incomplete tail shingles."""
    cur = words
    for k in range(1, n):
        shifted = F.slice(
            words, k + 1, F.greatest(F.size(words) - k, F.lit(0))
        )
        cur = F.zip_with(
            cur,
            shifted,
            lambda a, b: F.when(
                a.isNull() | b.isNull(), F.lit(None).cast("string")
            ).otherwise(F.concat(a, F.lit(" "), b)),
        )
    return F.filter(cur, lambda x: x.isNotNull())


def md5_prefix_long(col: Column, n_hex: int = 8) -> Column:
    """First ``n_hex`` hex digits of md5(col) as a non-negative signed long
    — THE cross-engine uniform-hash primitive (md5 is the only hash Spark
    and DuckDB share; any SQL engine reproduces it with md5 + substr + hex
    conv, e.g. ``('0x' || substr(md5(x), 1, 8))::BIGINT``). ``n_hex`` ≤ 15
    keeps the value < 2^60, so there is no sign wrap and ``%`` agrees
    between engines. Centralized here beside ``_md5_long`` so every
    consumer (count-min buckets, retry jitter, feature-hash buckets,
    substring-span keys, sampling draws) shares one audited expression."""
    return F.conv(F.substring(F.md5(col), 1, n_hex), 16, 10).cast("long")


def _md5_long(hex32: Column) -> Column:
    """Lower 64 bits of an md5 hex digest as a signed long: two 32-bit hex
    halves via conv(), recombined with shift/or (bit 63 wraps negative — the
    intended two's-complement view). md5 is the cross-engine hash family: any
    SQL engine with md5() + substr() + hex conv reproduces it bit-for-bit,
    which is what makes simhash value-checkable against a DuckDB oracle."""
    hi = F.conv(F.substring(hex32, 17, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(hex32, 25, 8), 16, 10).cast("long")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def _with_shingle_hashes(df: DataFrame, text_col: str, n: int,
                         out: str = "__h",
                         hash_family: str = "xxhash64") -> DataFrame:
    """df + ``out`` = array<long> of hash(shingle) — words, shingles and
    hashes each materialized as their own column so every downstream
    per-element lambda references a cheap attribute (see _shingles_of).

    ``hash_family``: ``xxhash64`` (default — fastest, JVM intrinsic) or
    ``md5`` (lower 64 bits of the digest — reproducible in any SQL engine,
    see ``_md5_long``; the md5 strings materialize as their own column so
    each digest is computed once, not once per extracted half)."""
    if hash_family not in ("xxhash64", "md5"):
        raise ValueError(f"unknown hash_family: {hash_family}")
    with_sh = (
        df.withColumn("__words", _word_array(F.col(text_col)))
        .withColumn("__sh", _shingles_of(F.col("__words"), n))
    )
    if hash_family == "md5":
        return (
            with_sh.withColumn("__md5", F.transform(F.col("__sh"), F.md5))
            .withColumn(out, F.transform(F.col("__md5"), _md5_long))
            .drop("__words", "__sh", "__md5")
        )
    return (
        with_sh.withColumn(out, F.transform(F.col("__sh"), lambda s: F.xxhash64(s)))
        .drop("__words", "__sh")
    )


def _shingles(text: Column, n: int) -> Column:
    """Inline-shingle Column (API compat / small inputs). For anything hot,
    use the materialized two-step (``_with_shingle_hashes``) — the inline
    form re-evaluates the split tree per element (see _shingles_of)."""
    return _shingles_of(_word_array(text), n)


def _minhash_sig_expr(hashes: Column, num_hashes: int) -> Column:
    """MinHash signature Column over an array<long> of shingle hashes — the
    ONE definition of the permutation family: permutation i is
    ``min(xxhash64(h, seed=i))`` (one-strong-hash + cheap-rehash), empty
    docs get MAX_LONG slots. min is idempotent under duplicate hashes, so
    callers may pass the raw or the distinct array interchangeably."""

    def _perm(i: int):
        return lambda h: F.xxhash64(h, F.lit(i))

    return F.array(
        *[
            F.coalesce(
                F.array_min(F.transform(hashes, _perm(i))),
                F.lit(2**63 - 1),
            )
            for i in range(num_hashes)
        ]
    )


def _full_width_repartition(df: DataFrame, *cols: str) -> DataFrame:
    """Explicit repartition to ``spark.sql.shuffle.partitions``: the dedup
    family's hot stages are byte-small but CPU-heavy (shingle + num_hashes
    rehashes, band self-joins), so AQE's byte-based coalescing folds them
    onto 1-2 tasks (measured: whole signature pass single-task). A
    user-specified repartition is exempt from coalescing and restores the
    full slot count; with ``cols`` it also pins one hash partitioning that
    downstream windows/joins reuse without a second exchange."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(n, *cols) if cols else df.repartition(n)


def _parallel_head(df: DataFrame) -> DataFrame:
    """Scale-adaptive scan parallelizer for CPU-dense per-row pipelines
    (tokenize → shingle → per-shingle hash): round-robin repartition to
    ``spark.sql.shuffle.partitions`` ONLY when the source has fewer
    partitions. A single-row-group parquet file scans as ONE task no matter
    what ``maxPartitionBytes`` says (row groups are unsplittable), so the
    whole tokenize/hash head of a query runs on one core while the rest of
    the machine idles — the guide-§2 "scale-adaptive partitioning" fix is a
    cheap shuffle of the raw rows before the expensive projection. At
    cluster scale the input has >= shuffle-partitions splits and this is a
    no-op, so the 100 TB path never pays a full-corpus reshuffle.

    Guard: ``df.rdd`` on a frame whose plan already contains an Exchange
    would force AQE to MATERIALIZE every upstream query stage (run the
    shuffles as real jobs) just to learn the partition count — and a
    post-exchange frame is already at session width anyway. Such frames
    pass through untouched; only exchange-free (scan-rooted) plans are
    inspected, where ``.rdd`` is a pure-planning no-cost call."""
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "Exchange" in plan or "QueryStage" in plan:
            return df
        cur = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - defensive (unresolvable plans)
        return df
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    if cur >= n:
        return df
    return df.repartition(n)


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    shingle_n: int = 3,
    sig_col: str = "minhash",
) -> DataFrame:
    """MinHash signature per row, entirely JVM-side.

    Shingles are string-hashed ONCE (``xxhash64(shingle)`` → array<long>,
    materialized — see ``_with_shingle_hashes``); each of the ``num_hashes``
    permutations is then ``min(xxhash64(h, seed=i))`` over the longs — the
    standard one-strong-hash + cheap-rehash MinHash family. Long-rehashing is
    ~an order of magnitude cheaper than hashing the shingle strings
    ``num_hashes`` times. No Python, no explode, no shuffle. Empty docs get
    MAX_LONG slots.
    """

    with_h = _with_shingle_hashes(df, text_col, shingle_n)
    sig = _minhash_sig_expr(F.col("__h"), num_hashes)
    return with_h.withColumn(sig_col, sig).drop("__h")


def minhash_lsh_candidates(
    sigs: DataFrame,
    id_col: str,
    sig_col: str = "minhash",
    bands: int = 16,
    rows_per_band: int = 4,
    max_bucket_size: int | None = None,
    distinct: bool = True,
) -> DataFrame:
    """LSH banding: hash each band of the signature to a bucket, self-join on
    ``(band, bucket)`` → candidate pairs ``(a, b)`` with a < b, distinct.

    ``distinct=False`` skips the final dedup exchange: a pair agreeing on k
    bands comes out k times. Correct whenever the consumer is idempotent per
    pair (the dedup path's existence-only anti-join is) — dropping the
    shuffle beats re-verifying the ~20% duplicated pairs.

    Scale: the self-join shuffles on the 8-byte bucket key only; band explosion
    multiplies rows by ``bands`` but each row is (id, band, bucket) — tiny next
    to the documents. Bucket skew (a degenerate band, e.g. all-empty docs) is
    the classic hazard: a bucket of n members emits n² pairs, so one hot
    bucket at 10^5 members is 10^10 pairs. ``max_bucket_size`` drops buckets
    above the cap before the join (standard production LSH practice —
    members of an over-full bucket almost always share another, smaller
    bucket in one of the other bands; this is a recall trade, NOT silent:
    exact duplicates should be collapsed beforehand, see minhash_lsh_dedup).
    """
    band_buckets = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        *[
                            F.element_at(F.col(sig_col), b * rows_per_band + r + 1)
                            for r in range(rows_per_band)
                        ]
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    # pin the partitioning once for the cap window AND the self-join (no
    # second exchange; measured: without it the candidate+verify stage ran
    # as 2 tasks with 3.3 s of single-core time available to parallelize)
    band_buckets = _full_width_repartition(band_buckets, "band", "bucket")
    if max_bucket_size is not None:
        # window count over the same (band, bucket) partitioning the self-join
        # shuffles on — the count piggybacks on that single exchange instead
        # of a separate aggregate+join round trip (measured −6 s at sf0.1)
        wc = Window.partitionBy("band", "bucket")
        band_buckets = (
            band_buckets.withColumn("__n", F.count("*").over(wc))
            .where(F.col("__n") <= max_bucket_size)
            .drop("__n")
        )
    left = band_buckets.alias("l")
    right = band_buckets.alias("r")
    pairs = (
        left.join(
            right,
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.bucket") == F.col("r.bucket"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b"))
    )
    return pairs.distinct() if distinct else pairs


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    shingle_n: int = 3,
    bands: int = 16,
    rows_per_band: int = 4,
    threshold: float = 0.7,
    max_bucket_size: int | None = None,
    verify: str = "estimated",
) -> DataFrame:
    """Near-dup removal: LSH candidates → verify Jaccard ≥ threshold → drop
    the higher id of each surviving pair.

    ``verify``: ``estimated`` (signature agreement fraction — zero extra
    passes, the classic MinHash estimator) or ``exact`` (true Jaccard over
    the distinct shingle-hash sets — one more join against the shingle sets,
    but the survivor set becomes a pure function of the texts: with enough
    bands the candidate stage has ~certain recall and the exact filter makes
    the result equal all-pairs Jaccard ≥ t, which is what lets a SQL oracle
    value-check it; the standard production shape is also candidates-by-LSH +
    exact verify).

    Keeps the minimum id of each near-dup *pair chain* greedily (single pass,
    no connected components — at pipeline scale full transitive closure is an
    iterative job; this greedy form is the standard one-pass policy).

    Exact duplicates are collapsed to one representative *before* LSH (a
    duplicate IS a near-dup at Jaccard 1.0, and keeping them would make the
    bucket self-join quadratic in duplicate-group size — the classic LSH blowup
    on a corpus with heavy exact duplication).
    """
    if verify not in ("estimated", "exact"):
        raise ValueError(f"unknown verify mode: {verify}")
    w_exact = Window.partitionBy("__th").orderBy(id_col)
    hashed = df.withColumn("__th", F.xxhash64(F.col(text_col)))
    reps = (
        hashed.withColumn("__rn", F.row_number().over(w_exact))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__th")
    )

    # ONE tokenize+hash pass for the whole operator: the rep set, the
    # distinct shingle-hash sets and the signatures (minhash over the
    # DISTINCT set — min is idempotent under duplicates, and the distinct
    # array is smaller to rehash 'num_hashes' times) materialize together
    # via an eager localCheckpoint. Without it the candidate scan, both
    # verify-join sides and the final anti-join each re-tokenized the corpus
    # (4 full text passes — measured ~2× the operator at sf0.1). The blocks
    # are executor memory+disk and ContextCleaner-freed when the DataFrame
    # is dropped, so nothing leaks across bench repetitions.
    base = _with_shingle_hashes(
        _full_width_repartition(reps), text_col, shingle_n
    ).withColumn("__set", F.array_distinct("__h"))
    base = base.withColumn(
        "minhash", _minhash_sig_expr(F.col("__set"), num_hashes)
    ).drop("__h").localCheckpoint(eager=True)
    df = base.drop("__set", "minhash")
    sigs = base.select(id_col, "minhash")
    # distinct=False: the pair stream feeds an existence-only anti-join, so
    # duplicated pairs (one per agreeing band, ~20% extra here) are cheaper
    # to verify redundantly than to dedup through an extra exchange
    cand = minhash_lsh_candidates(
        sigs, id_col, "minhash", bands, rows_per_band, max_bucket_size,
        distinct=False,
    )
    if verify == "exact":
        sets = base.select(F.col(id_col), F.col("__set"))
        sl = sets.select(F.col(id_col).alias("a"), F.col("__set").alias("set_a"))
        sr = sets.select(F.col(id_col).alias("b"), F.col("__set").alias("set_b"))
        # (measured r06: broadcast-attaching the set tables here was
        # neutral-to-slower — the bucket cap keeps the candidate stream
        # modest, so the shuffle join's exchanges are cheaper than the
        # broadcast builds; minhash_cross_pairs, whose uncapped cross
        # candidates run to 68M rows, keeps the broadcast gate)
        #
        # sound size prune BEFORE the array joins: J ≤ min/max, so J ≥ t
        # requires min(|A|,|B|) ≥ t·max(|A|,|B|). Broadcasting just the
        # 8-byte sizes and filtering first keeps non-viable pairs (and
        # their shingle arrays) out of the verify exchanges entirely
        # (the minhash_cross_pairs pattern).
        za = F.broadcast(
            base.select(F.col(id_col).alias("a"), F.size("__set").alias("__za"))
        )
        zb = F.broadcast(
            base.select(F.col(id_col).alias("b"), F.size("__set").alias("__zb"))
        )
        cand = (
            cand.join(za, "a")
            .join(zb, "b")
            .where(
                F.least(F.col("__za"), F.col("__zb"))
                >= threshold * F.greatest(F.col("__za"), F.col("__zb"))
            )
            .select("a", "b")
        )
        inter = F.size(F.array_intersect("set_a", "set_b")).cast("double")
        union = F.size("set_a") + F.size("set_b") - inter
        verified = (
            cand.join(sl, "a")
            .join(sr, "b")
            .withColumn("jaccard", inter / union)
            .where(F.col("jaccard") >= threshold)
        )
    else:
        sl = sigs.select(F.col(id_col).alias("a"), F.col("minhash").alias("sig_a"))
        sr = sigs.select(F.col(id_col).alias("b"), F.col("minhash").alias("sig_b"))
        verified = (
            cand.join(sl, "a")
            .join(sr, "b")
            .withColumn(
                "est_jaccard",
                F.aggregate(
                    F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                    F.lit(0),
                    lambda acc, v: acc + v,
                ).cast("double")
                / F.size("sig_a"),
            )
            .where(F.col("est_jaccard") >= threshold)
        )
    # no distinct on losers: left_anti tests existence only, and skipping the
    # dedup exchange on the (small) loser stream removes a whole stage
    losers = verified.select(F.col("b").alias(id_col))
    return df.join(losers, id_col, "left_anti")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs sharing ≥1 shingle.

    explode(shingles) → self-join on shingle → per-pair intersection count →
    |A∪B| = |A|+|B|−|A∩B|. Quadratic in the worst case — meant for verification
    at modest candidate volume, not as the 100 TB primary (that's MinHash+LSH).

    ``max_shingle_df`` guards the classic hot-shingle blowup: a shingle shared
    by d documents emits d² join pairs, so one stop-word 3-gram across 10^5
    docs is 10^10 rows. Shingles with document frequency > the cap are dropped
    from the shingle universe BEFORE the self-join — i.e. Jaccard is computed
    over the DF-filtered universe (both intersection AND set sizes), the same
    semantics as stop-word removal: self-consistent, deterministic, and
    identical to unfiltered Jaccard whenever no shingle exceeds the cap. The
    doc-frequency count is a window over the same ``sh`` partitioning the
    self-join shuffles on, so it piggybacks on that exchange (the
    minhash_lsh_candidates trick) instead of a separate aggregate+join.
    """
    sh = _exploded_shingle_keys(df, text_col, id_col, shingle_n, max_shingle_df)
    inter = _shingle_intersections(sh, id_col)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    sa = sizes.select(F.col(id_col).alias("a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def _shingle_intersections(sh: DataFrame, id_col: str) -> DataFrame:
    """Per-pair shared-shingle counts from a materialized (id, sh) frame:
    self-join on the 8-byte ``sh`` key → count per (a, b). The SHUFFLE_HASH
    hint matters: the planner otherwise broadcast-builds the full exploded
    relation (multi-million rows — a ~100 MB driver collect + hash build
    per task, measured as the dominant cost at sf1.0), while a shuffled
    hash join reuses the checkpoint's existing ``sh`` hash-partitioning on
    both sides — zero new exchange, per-partition builds."""
    return (
        sh.alias("l")
        .join(sh.alias("r").hint("SHUFFLE_HASH"),
              on=[F.col("l.sh") == F.col("r.sh"),
                  F.col(f"l.{id_col}") < F.col(f"r.{id_col}")])
        .groupBy(F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b"))
        .agg(F.count("*").alias("inter"))
    )


def _exploded_shingle_keys(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int,
    max_shingle_df: int | None,
) -> DataFrame:
    """Shared prep for the n-gram pair family: one materialized
    (id, sh: long) frame of per-document DISTINCT shingle keys, DF-capped.

    Three structural optimizations over the lazy string-keyed form, result
    rows unchanged (verified against the unchanged string-keyed DuckDB
    oracles at sf0.001/0.01/0.1):

    - ``_parallel_head``: the tokenize + shingle + explode head parallelizes
      instead of running on the scan's (often single) task.
    - shingles become 8-byte ``xxhash64`` keys BEFORE the explode — the DF
      window, the self-join sort/merge and every exchange move longs, not
      ~25-byte gram strings (guide §2.3 "shuffle keys, not payloads";
      intersection/df counts are unchanged short of an xxhash64 collision,
      ~1e-5 for a 10M-shingle universe).
    - one eager ``localCheckpoint`` AFTER the DF-cap window: the per-doc
      size aggregate and BOTH self-join sides read the materialized rows.
      Lazily, Catalyst re-derived the whole tokenize pipeline once per
      consumer (4 scans in the recorded sf1.0 plan) and — worse — planned
      the self-join as a BroadcastHashJoin of the multi-million-row exploded
      side off a stale size estimate. The checkpoint also pins the window's
      hash-partitioning on ``sh``, so the self-join needs no new exchange.
    """
    sh = (
        _parallel_head(df.select(F.col(id_col), F.col(text_col)))
        .withColumn("__words", _word_array(F.col(text_col)))
        .withColumn("__sh", _shingles_of(F.col("__words"), shingle_n))
        .select(
            F.col(id_col),
            F.explode(F.array_distinct(F.col("__sh"))).alias("__s"),
        )
        .select(F.col(id_col), F.xxhash64("__s").alias("sh"))
    )
    if max_shingle_df is not None:
        wdf = Window.partitionBy("sh")
        sh = (
            sh.withColumn("__df", F.count("*").over(wdf))
            .where(F.col("__df") <= max_shingle_df)
            .drop("__df")
        )
    return sh.localCheckpoint(eager=True)


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Asymmetric n-gram CONTAINMENT pairs (Broder 1997): c(A→B) =
    |A∩B| / |A|. The curation signal Jaccard misses — a short document
    quoted wholesale inside a long one has c(short→long) ≈ 1 while
    J = |short|/|long| ≈ 0, so a Jaccard threshold never fires. Standard
    for near-superset detection (quotes, quoted-reply chains, article +
    boilerplate-wrapped article).

    Emits one UNDIRECTED row per candidate pair with BOTH directions as
    exact integer micros (floor(inter·10⁶ / |side|) — all terms < 2⁵³, so
    the double floor is exact in any engine), filtered on the larger
    direction ≥ ``threshold``. Pairs must share ≥1 shingle; same shingle
    universe and hot-shingle ``max_shingle_df`` cap as
    ``ngram_jaccard_pairs``.

    Candidate generation is a ONE-SIDED prefix filter (r06): the output
    filter ``max(c_ab, c_ba) ≥ t`` is the SMALLER side's containment
    (inter ≤ min(na, nb)), i.e. inter ≥ α := ceil(t·min(na, nb)) — a bound
    that depends only on the smaller side. Under the global
    rarity-then-hash shingle order, if B misses ALL of A's first
    na − α + 1 shingles then inter ≤ α − 1, so every qualifying pair is
    caught by joining the smaller side's rarity PREFIX against the larger
    side's FULL postings — at t=0.8 the prefix is ~0.2·|A|, and the
    measured sf1.0 candidate volume drops from 127M shared-shingle pair
    rows (the count-all-pairs shape) to 23M (+ a PPJoin positional bound
    on top). Verification then computes exact inter per DISTINCT candidate
    via array_intersect over the capped per-doc shingle-hash arrays
    (broadcast-gated like ``allpairs_jaccard_pairs``), so the output is
    provably identical to the count-all-pairs formulation: every pair
    passing the threshold is generated, every generated pair is verified
    exactly, and pairs not generated cannot pass.
    """
    t_micro = int(round(threshold * 1_000_000))
    sh = _exploded_shingle_keys(df, text_col, id_col, shingle_n, max_shingle_df)
    wdf = Window.partitionBy("sh")
    wid = Window.partitionBy(id_col)
    wrank = Window.partitionBy(id_col).orderBy(F.col("__df"), F.col("sh"))
    ann = (
        sh.withColumn("__df", F.count("*").over(wdf))
        .withColumn("__n", F.count("*").over(wid))
        .withColumn("__rk", F.row_number().over(wrank))
    )
    # α = ceil(t·n) in exact integer arithmetic; prefix = first n − α + 1
    # shingles in rarity order (the pigeonhole bound above)
    ceil_tn = F.floor(
        (F.lit(t_micro) * F.col("__n") + F.lit(999_999)) / F.lit(1_000_000)
    ).cast("long")
    prefix = ann.where(F.col("__rk") <= F.col("__n") - ceil_tn + 1).select(
        F.col(id_col).alias("__sid"), "sh",
        F.col("__n").alias("__sn"), F.col("__rk").alias("__srk"),
    )
    full = ann.select(
        F.col(id_col).alias("__lid"), F.col("sh").alias("__lsh"),
        F.col("__n").alias("__ln"), F.col("__rk").alias("__lrk"),
    )
    alpha = F.floor(
        (F.lit(t_micro) * F.col("__sn") + F.lit(999_999)) / F.lit(1_000_000)
    ).cast("long")
    # positional bound: all common shingles sit at ranks ≥ the match's on
    # each side, so overlap ≤ 1 + min(remaining ranks); the smaller side's
    # FIRST common shingle always passes (its bound ≥ the true overlap ≥ α)
    ubound = F.lit(1) + F.least(
        F.col("__sn") - F.col("__srk"), F.col("__ln") - F.col("__lrk")
    )
    # candidate match rows are verified REDUNDANTLY (measured multiplicity
    # ~1.03 at sf1.0 — almost every pair matches on exactly one prefix
    # shingle), which removes the candidate-dedup exchange entirely: with
    # the set tables broadcast the whole pipeline after the prefix join is
    # map-side (attach → intersect → threshold), and only the ~survivor
    # rows (identical per duplicate) reach the final tiny distinct.
    cand = prefix.join(
        full,
        on=[
            F.col("sh") == F.col("__lsh"),
            # orient: smaller (or equal-size lower-id) side generates
            (F.col("__sn") < F.col("__ln"))
            | (
                (F.col("__sn") == F.col("__ln"))
                & (F.col("__sid") < F.col("__lid"))
            ),
            ubound >= alpha,
        ],
    ).select("__sid", "__lid", "__sn", "__ln")
    sets = (
        sh.groupBy(id_col)
        .agg(F.collect_list("sh").alias("__set"))
        .localCheckpoint(eager=True)
    )
    s_side = sets.select(F.col(id_col).alias("__sid"), F.col("__set").alias("__ss"))
    l_side = sets.select(F.col(id_col).alias("__lid"), F.col("__set").alias("__ls"))
    if sets.count() <= 250_000:
        s_side, l_side = F.broadcast(s_side), F.broadcast(l_side)
    inter = F.size(F.array_intersect("__ss", "__ls")).cast("long")
    verified = (
        cand.join(s_side, "__sid")
        .join(l_side, "__lid")
        .withColumn("__i", inter)
        .where(F.col("__i") > 0)
    )
    # restate in (a, b) = (lower id, higher id) orientation with each
    # direction's exact micros — identical to the count-all-pairs output
    a_is_s = F.col("__sid") < F.col("__lid")
    a_id = F.when(a_is_s, F.col("__sid")).otherwise(F.col("__lid"))
    b_id = F.when(a_is_s, F.col("__lid")).otherwise(F.col("__sid"))
    na = F.when(a_is_s, F.col("__sn")).otherwise(F.col("__ln"))
    nb = F.when(a_is_s, F.col("__ln")).otherwise(F.col("__sn"))
    c_ab = F.floor(F.col("__i") * F.lit(1000000.0) / na).cast("long")
    c_ba = F.floor(F.col("__i") * F.lit(1000000.0) / nb).cast("long")
    return (
        verified.select(
            a_id.alias("a"),
            b_id.alias("b"),
            c_ab.alias("cont_ab_micro"),
            c_ba.alias("cont_ba_micro"),
        )
        .where(
            F.greatest(F.col("cont_ab_micro"), F.col("cont_ba_micro"))
            >= t_micro
        )
        .distinct()
    )


def allpairs_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """EXACT all-pairs Jaccard join via prefix filtering (Bayardo et al.
    WWW'07 "Scaling Up All Pairs Similarity Search"; Xiao et al. PPJoin).
    The deterministic counterpart to MinHash+LSH banding: zero missed pairs
    at any threshold, with the candidate volume bounded by construction
    instead of probabilistically.

    Under any fixed global shingle ordering, a pair with J(A,B) ≥ t shares
    ≥ ⌈t·max(|A|,|B|)⌉ shingles (since |A∪B| ≥ max ⇒ |A∩B| ≥ t·max), so the
    smallest common shingle must fall inside BOTH records' first
    p(d) = |d| − ⌈t·|d|⌉ + 1 shingles (pigeonhole on the suffix). Indexing
    only those prefixes makes the self-join exact. The global order here is
    ascending document frequency (ties by shingle value): the rare shingles
    land in prefixes and the hot ones — the d² join-blowup hazard
    ``ngram_jaccard_pairs`` needs ``max_shingle_df`` to cap — are pushed
    into suffixes and NEVER enter the join. Skew-resistance falls out of
    the algorithm with unchanged exact semantics, where the DF cap changes
    the shingle universe.

    Scale shape: one exchange on ``sh`` (the DF count window), one on
    ``id`` serving BOTH the per-doc size count and the rarity-rank
    row_number, a self-join keyed on rare prefix shingles with the
    size-ratio filter (t·|A| ≤ |B| ≤ |A|/t) applied pre-aggregation, then
    an array_intersect verify over the once-materialized distinct-shingle
    arrays. Candidate dedup and verify shuffle 16-byte (a, b) keys.

    Output: (a, b, inter, jacc_micro) — integer-exact in any engine
    (inter·10⁶ < 2⁵³ so the double floor of the quotient is reproducible;
    the build-notes floor-micro recipe).
    """
    t_micro = int(round(threshold * 1_000_000))
    # Structural optimizations (result rows unchanged — the exact-verify step
    # makes the output independent of the prefix order, see below; verified
    # against the unchanged string-keyed DuckDB oracle):
    # - _parallel_head: tokenize head runs wide, not on the scan's one task.
    # - shingles hash to 8-byte longs BEFORE any exchange: the prefix windows,
    #   the self-join and the verify array_intersect all move/compare longs
    #   (guide §2.3). The global rarity order becomes (df, hash) instead of
    #   (df, string) — a different but equally valid total order, and the
    #   prefix-filter correctness bound holds for ANY fixed total order, so
    #   the verified output is identical.
    # - eager localCheckpoint: `base` feeds the prefix pipeline AND both
    #   verify sides; lazily each consumer re-derived the tokenize pipeline.
    base = (
        _parallel_head(df.select(F.col(id_col), F.col(text_col)))
        .withColumn("__words", _word_array(F.col(text_col)))
        .withColumn("__sh", F.array_distinct(_shingles_of(F.col("__words"), shingle_n)))
        .where(F.size("__sh") > 0)
        .select(
            F.col(id_col).alias("id"),
            F.transform("__sh", lambda s: F.xxhash64(s)).alias("__sh"),
        )
        .localCheckpoint(eager=True)
    )
    sh = base.select("id", F.explode("__sh").alias("sh"))
    wdf = Window.partitionBy("sh")
    wid = Window.partitionBy("id")
    wrank = Window.partitionBy("id").orderBy(F.col("__df"), F.col("sh"))
    # ceil(t·n) in exact integer arithmetic: (t_micro·n + 999999) div 10⁶
    ceil_tn = F.floor(
        (F.lit(t_micro) * F.col("__n") + F.lit(999_999)) / F.lit(1_000_000)
    ).cast("long")
    prefix = (
        sh.withColumn("__df", F.count("*").over(wdf))
        .withColumn("__n", F.count("*").over(wid))
        .withColumn("__rk", F.row_number().over(wrank))
        .where(F.col("__rk") <= F.col("__n") - ceil_tn + 1)
        .select("id", "sh", "__n", "__rk")
    )
    # PPJoin positional filter (Xiao et al.): J ≥ t ⇔ inter ≥
    # ceil(t·(na+nb)/(1+t)) =: α, and for a match at 1-based rarity ranks
    # (rk_l, rk_r) the overlap can be at most 1 + min(na−rk_l, nb−rk_r)
    # (all common shingles sit at ranks ≥ rk on each side). The FIRST common
    # shingle of any qualifying pair passes this test (its ubound ≥ the true
    # overlap ≥ α), so recall stays exact while non-viable match rows are
    # dropped at generation instead of surviving to the verify join
    # (sf1.0: 26.4M → fewer candidate rows; exact arithmetic — α via
    # integer ceil-division).
    alpha = F.floor(
        (
            F.lit(t_micro) * (F.col("l.__n") + F.col("r.__n"))
            + F.lit(1_000_000 + t_micro - 1)
        )
        / F.lit(1_000_000 + t_micro)
    ).cast("long")
    ubound = F.lit(1) + F.least(
        F.col("l.__n") - F.col("l.__rk"), F.col("r.__n") - F.col("r.__rk")
    )
    cand = (
        prefix.alias("l")
        .join(
            prefix.alias("r"),
            on=[
                F.col("l.sh") == F.col("r.sh"),
                F.col("l.id") < F.col("r.id"),
                # size-ratio filter: t·max ≤ min  ⇔  both directions hold
                F.col("l.__n") * F.lit(t_micro) <= F.col("r.__n") * F.lit(1_000_000),
                F.col("r.__n") * F.lit(t_micro) <= F.col("l.__n") * F.lit(1_000_000),
                ubound >= alpha,
            ],
        )
        .groupBy(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .agg(F.first("l.__n").alias("na"), F.first("r.__n").alias("nb"))
    )
    arr_a = base.select(F.col("id").alias("a"), F.col("__sh").alias("__sa"))
    arr_b = base.select(F.col("id").alias("b"), F.col("__sh").alias("__sb"))
    # the shingle-array side table is one row per DOCUMENT (8 B id + the
    # distinct-shingle longs). When it is broadcast-sized, attaching the
    # arrays map-side removes BOTH exchanges of the (much larger) candidate
    # stream — the checkpoint makes the row count a free local metadata
    # lookup, so the gate is measured, not estimated. Past the gate (true
    # corpus scale) the planner keeps the shuffle join.
    if base.count() <= 250_000:
        arr_a, arr_b = F.broadcast(arr_a), F.broadcast(arr_b)
    inter = F.size(F.array_intersect(F.col("__sa"), F.col("__sb"))).cast("long")
    verified = (
        cand.join(arr_a, "a")
        .join(arr_b, "b")
        .withColumn("inter", inter)
        .withColumn(
            "jacc_micro",
            F.floor(
                F.col("inter") * F.lit(1_000_000.0)
                / (F.col("na") + F.col("nb") - F.col("inter"))
            ).cast("long"),
        )
        .where(F.col("jacc_micro") >= t_micro)
        .select("a", "b", "inter", "jacc_micro")
    )
    return verified


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: Column, shingle_n: int = 2) -> Column:
    """64-bit SimHash of inline-shingled text (API compat; for the hot path
    use ``simhash64_of_hashes`` over a materialized hash column — see
    ``_shingles_of`` for why inline shingling is quadratic)."""
    return simhash64_of_hashes(
        F.transform(_shingles(text, shingle_n), lambda s: F.xxhash64(s))
    )


def simhash64_of_hashes(hashes: Column) -> Column:
    """64-bit SimHash from an array<long> of shingle hashes: the 64-way bit
    vote runs in a vectorized pandas UDF over the hash arrays (numpy
    segmented sums — one Arrow pass; the pure-Column formulation needs 64
    aggregate scans per row and is ~50× slower)."""

    @pandas_udf(LongType())
    def _vote(arrs: pd.Series) -> pd.Series:
        # Vectorized across the whole Arrow batch: flatten every row's hash
        # array into one stream, then for each of the 64 bit positions run a
        # single segmented sum (np.add.reduceat over row offsets). No per-row
        # Python work beyond the C-level concatenate; memory stays O(total
        # hashes), not O(total × 64).
        n = len(arrs)
        if n == 0:
            return pd.Series([], dtype="int64")
        vals = [
            np.asarray(a, dtype=np.int64) if a is not None else np.empty(0, np.int64)
            for a in arrs
        ]
        lens = np.fromiter((v.size for v in vals), dtype=np.int64, count=n)
        out = np.zeros(n, dtype=np.uint64)
        nz = lens > 0
        if nz.any():
            flat = np.concatenate([v for v in vals if v.size]).astype(np.uint64)
            starts = np.zeros(n, dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            starts_nz = starts[nz]
            lens_nz = lens[nz]
            fp_nz = np.zeros(lens_nz.size, dtype=np.uint64)
            for b in range(64):
                ones = np.add.reduceat(
                    ((flat >> np.uint64(b)) & np.uint64(1)).astype(np.int64),
                    starts_nz,
                )
                fp_nz |= ((2 * ones - lens_nz) > 0).astype(np.uint64) << np.uint64(b)
            out[nz] = fp_nz
        return pd.Series(out.astype(np.int64))

    return _vote(hashes)


def hamming_neardup_pairs(
    df: DataFrame,
    fp_col: str,
    id_col: str,
    hamming_threshold: int = 3,
    blocks: int = 4,
) -> DataFrame:
    """All pairs (a < b, ``hamming`` = popcount(xor) ≤ threshold) over a
    64-bit fingerprint column, via pigeonhole block self-join: band the
    fingerprint into ``blocks`` equal slices — two fingerprints within
    ``blocks − 1`` differing bits MUST agree on at least one slice, so with
    ``hamming_threshold ≤ blocks − 1`` the blocking has EXACT recall. The
    shared core of SimHash text dedup and pHash image near-dup.

    Scale: the join shuffles (blk, blkval) 9-byte keys; each fingerprint
    appears ``blocks`` times. A pair sharing k identical slices is emitted
    k times — callers needing a set should drop duplicates or (as
    simhash_dedup does) feed an existence-only anti-join. Verification is
    one JVM bit_count per candidate, whole-stage codegen.
    """
    width = 64 // blocks
    blocked = df.select(
        id_col,
        fp_col,
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col(fp_col), b * width)
                    .bitwiseAND(F.lit((1 << width) - 1).cast("long"))
                    for b in range(blocks)
                ]
            )
        ).alias("blk", "blkval"),
    )
    return (
        blocked.alias("l")
        .join(
            blocked.alias("r"),
            on=[
                F.col("l.blk") == F.col("r.blk"),
                F.col("l.blkval") == F.col("r.blkval"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(
            F.col(f"l.{id_col}").alias("a"),
            F.col(f"r.{id_col}").alias("b"),
            F.bit_count(
                F.col(f"l.{fp_col}").bitwiseXOR(F.col(f"r.{fp_col}"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= hamming_threshold)
    )


def simhash_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 2,
    hamming_threshold: int = 3,
    blocks: int = 4,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """SimHash near-dup: band the 64-bit fingerprint into ``blocks`` equal
    blocks (pigeonhole: ≤ blocks−1 differing bits ⇒ ≥1 identical block),
    self-join per block, verify Hamming distance via bit_count(xor), drop
    higher ids. Exact duplicates collapse to a representative first (see
    minhash_lsh_dedup — identical fingerprints make the block join quadratic).

    With ``hamming_threshold ≤ blocks − 1`` the pigeonhole blocking has
    EXACT recall (not probabilistic), so the survivor set is a pure function
    of the per-shingle hashes; ``hash_family="md5"`` makes those hashes
    reproducible in any SQL engine (``_md5_long``) — together that is what
    lets a DuckDB oracle value-check the whole dedup."""
    w_exact = Window.partitionBy("__th").orderBy(id_col)
    df = (
        df.withColumn("__th", F.xxhash64(F.col(text_col)))
        .withColumn("__rn", F.row_number().over(w_exact))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__th")
        # materialize the rep set once: it feeds the fingerprint pass AND the
        # final anti-join — lazy, each consumer re-ran the exact-dup window
        # shuffle over the full text column
        .localCheckpoint(eager=True)
    )
    # fingerprints materialized once: the block self-join reads them on both
    # sides, and without the checkpoint each side re-ran tokenize +
    # per-shingle md5/xxhash + the pandas bit vote (the two dominant stages).
    fp = _with_shingle_hashes(_full_width_repartition(df), text_col, shingle_n,
                              hash_family=hash_family).select(
        F.col(id_col), simhash64_of_hashes(F.col("__h")).alias("fp")
    ).localCheckpoint(eager=True)
    cand = hamming_neardup_pairs(
        fp, "fp", id_col, hamming_threshold, blocks
    ).select("a", "b")
    # no distinct on pairs or losers: a pair sharing k identical blocks shows
    # up k times, but the hamming verdict is per-pair deterministic and the
    # left_anti below tests existence only — two dedup exchanges saved
    losers = cand.select(F.col("b").alias(id_col))
    return df.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_neardup_candidates(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
) -> DataFrame:
    """Brute-force cosine near-dup pairs (a<b, cos ≥ threshold), JVM-side dot
    products via zip_with/aggregate. O(n²) — correctness baseline; the scale
    path is LSH bucketing (see operators.similarity.lsh_ann)."""
    norm = F.sqrt(F.aggregate(F.col(vec_col), F.lit(0.0), lambda a, x: a + x * x))
    v = df.select(F.col(id_col), F.col(vec_col).alias("v"), norm.alias("nrm"))
    l, r = v.alias("l"), v.alias("r")
    dot = F.aggregate(
        F.zip_with(F.col("l.v"), F.col("r.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return (
        l.join(r, F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(
            F.col(f"l.{id_col}").alias("a"),
            F.col(f"r.{id_col}").alias("b"),
            (dot / (F.col("l.nrm") * F.col("r.nrm"))).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def embedding_lsh_candidates(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    bits: int = 2,
    num_tables: int = 32,
    seed: int = 42,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Bucketed candidate pairs (a < b, distinct) for hyperplane-LSH
    embedding dedup — exposed separately so the BENCH §9 sizing audit is one
    call: before paying the exact re-rank, ``candidates.count()`` and compare
    against the expected true-pair count; when the ratio exceeds ~100×, the
    sign-patterns are skewed for this corpus (correlated components) and
    ``bits`` must rise / ``max_bucket_size`` tighten — at 1M vectors that
    audit was the difference between a 280 s and a 29.7 s wall at identical
    recall (BENCH/BASELINE.md §9)."""
    from .similarity import _sign_buckets_udf

    bucket_fn = _sign_buckets_udf(bits, num_tables, seed)
    bk = df.select(
        F.col(id_col),
        F.posexplode(bucket_fn(F.col(vec_col))).alias("table", "bucket"),
    )
    if max_bucket_size is not None:
        wc = Window.partitionBy("table", "bucket")
        bk = (
            bk.withColumn("__n", F.count("*").over(wc))
            .where(F.col("__n") <= max_bucket_size)
            .drop("__n")
        )
    return (
        bk.alias("l")
        .join(
            bk.alias("r"),
            on=[
                F.col("l.table") == F.col("r.table"),
                F.col("l.bucket") == F.col("r.bucket"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b"))
        .distinct()
    )


def embedding_neardup_lsh(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    bits: int = 2,
    num_tables: int = 32,
    seed: int = 42,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via random-hyperplane LSH bucketing —
    the scale path: candidates come from equi-joins on 8-byte (table, bucket)
    keys, never a cartesian/inequality join; exact cosine re-ranks candidates
    only.

    Per-table collision probability for a pair at angle θ is (1−θ/π)^bits, so
    the miss probability after ``num_tables`` independent tables is
    (1−(1−θ/π)^bits)^num_tables. The defaults (bits=2, num_tables=32) put the
    miss below 1e-7 for cosine ≥ 0.45 — recall is deterministic given ``seed``
    (hyperplanes are regenerated from it inside the UDF) and verified exact
    against the brute-force baseline at fixture scale
    (tests/test_similarity.py). At corpus scale raise ``bits`` (smaller
    buckets, cheaper join) and ``num_tables`` to taste; ``max_bucket_size``
    caps degenerate buckets exactly like minhash_lsh_candidates. ``bits`` and
    the cap must be sized TOGETHER against the measured candidate volume —
    correlated embedding components skew sign-patterns far above the
    n/2^bits uniform estimate while every bucket stays under a loose cap;
    audit with ``embedding_lsh_candidates(...).count()`` per its docstring.

    Shuffle profile: explode multiplies rows by num_tables but each row is
    (id, table, bucket) — 24 bytes; the candidate self-join and the distinct
    both shuffle those narrow rows; vectors are joined back only for the
    surviving candidate pairs.
    """
    cand = embedding_lsh_candidates(
        df, vec_col, id_col, bits=bits, num_tables=num_tables, seed=seed,
        max_bucket_size=max_bucket_size,
    )
    norm = F.sqrt(F.aggregate(F.col(vec_col), F.lit(0.0), lambda a, x: a + x * x))
    v = df.select(F.col(id_col), F.col(vec_col).alias("__v"), norm.alias("__nrm"))
    va = v.select(F.col(id_col).alias("a"), F.col("__v").alias("__va"),
                  F.col("__nrm").alias("__na"))
    vb = v.select(F.col(id_col).alias("b"), F.col("__v").alias("__vb"),
                  F.col("__nrm").alias("__nb"))
    dot = F.aggregate(
        F.zip_with(F.col("__va"), F.col("__vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return (
        cand.join(va, "a")
        .join(vb, "b")
        .select(
            "a", "b", (dot / (F.col("__na") * F.col("__nb"))).alias("cosine")
        )
        .where(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------------------
# connected components over a candidate-pair graph
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iterations: int = 50,
    algorithm: str = "star",
    stats: dict | None = None,
) -> DataFrame:
    """(node, component) — component = the minimum node id reachable through
    the pair graph. The transitive-closure step a near-dup pipeline needs
    AFTER pair generation: greedy drop-the-higher-id-of-each-pair (the
    one-pass policy in minhash_lsh_dedup/simhash_dedup) under-merges chains
    A~B~C; component labels make the whole chain one group.

    ``algorithm``:

    - ``star`` (default, the web-scale path): alternating large-star /
      small-star contraction (Kiveris et al., "Connected Components in
      MapReduce and Beyond", SoCC'14). Each iteration rewires edges toward
      neighborhood minima — large-star hangs every larger neighbor of u onto
      min(Γ⁺(u)), small-star hangs the smaller ones — which doubles label
      reach per alternation, so a path of length n converges in O(log n)
      iterations (asserted by tests/test_dedup_similarity.py's chain
      fixture) instead of the O(n) a plain propagation pays. At fixpoint the
      edge set IS the answer: a forest of stars centered on component minima.
    - ``propagate``: plain min-label propagation (each node adopts the
      minimum label in its closed neighborhood per round — the simplest
      map-reduce CC, cf. Rastogi et al., "Finding Connected Components in
      Map-Reduce"). O(diameter) rounds: fine for the shallow components
      near-dup graphs produce, pathological on chains; kept as the
      cross-check oracle for the star path.

    Both run on (8-byte, 8-byte) edge/label rows only — never the documents
    — and ``localCheckpoint`` per iteration truncates the lineage Catalyst
    would otherwise grow exponentially. ``stats`` (optional dict) receives
    ``{"iterations": k}``.
    """
    if algorithm == "star":
        return _connected_components_star(pairs, a_col, b_col,
                                          max_iterations, stats)
    if algorithm != "propagate":
        raise ValueError(f"unknown connected_components algorithm: {algorithm}")
    edges = (
        pairs.select(F.col(a_col).alias("x"), F.col(b_col).alias("y"))
        .unionByName(
            pairs.select(F.col(b_col).alias("x"), F.col(a_col).alias("y"))
        )
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("x").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    iters = 0
    for _ in range(max_iterations):
        iters += 1
        # candidate label per node = min(own, min over neighbors' labels)
        neighbor_min = (
            edges.join(labels, edges["y"] == labels["node"])
            .groupBy("x")
            .agg(F.min("component").alias("nmin"))
        )
        updated = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["x"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
                (F.coalesce(F.col("nmin"), F.col("component"))
                 < F.col("component")).alias("__changed"),
            )
        )
        updated = updated.localCheckpoint(eager=True)
        changed = updated.where(F.col("__changed")).limit(1).count()
        labels = updated.drop("__changed")
        if changed == 0:
            break
    edges.unpersist()
    if stats is not None:
        stats["iterations"] = iters
    return labels


def _connected_components_star(
    pairs: DataFrame,
    a_col: str,
    b_col: str,
    max_iterations: int,
    stats: dict | None,
) -> DataFrame:
    """Large-star/small-star alternation (see connected_components). Edges
    are kept directed high→low (x > y), distinct; one alternation is two
    groupBy-min + joins on 8-byte keys, then a subtract-based fixpoint check
    (both sides distinct, so equal counts + empty one-way difference ⇔
    identical edge sets)."""
    raw = pairs.select(F.col(a_col).alias("x"), F.col(b_col).alias("y"))
    nodes = (
        raw.select("x").unionByName(raw.select(F.col("y").alias("x")))
        .distinct()
        .withColumnRenamed("x", "node")
        .persist()
    )
    e = (
        raw.where(F.col("x") != F.col("y"))
        .select(
            F.greatest("x", "y").alias("x"), F.least("x", "y").alias("y")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_e = e.count()
    iters = 0
    converged = n_e == 0
    while n_e > 0 and iters < max_iterations:
        iters += 1
        # large-star: for every node u, hang each LARGER neighbor v onto
        # m(u) = min(Γ(u) ∪ {u}).   (emitted as (v, m): v > u ≥ m ⇒ x > y)
        sym = e.select("x", "y").unionByName(
            e.select(F.col("y").alias("x"), F.col("x").alias("y"))
        )
        m_ls = sym.groupBy("x").agg(
            F.least(F.min("y"), F.first("x")).alias("m")
        )
        ls = (
            sym.join(m_ls, "x")
            .where(F.col("y") > F.col("x"))
            .select(F.col("y").alias("x"), F.col("m").alias("y"))
            .distinct()
        )
        # small-star: per node u (edges already high→low), hang u and all its
        # smaller neighbors onto mn(u) = min of those neighbors
        m_ss = ls.groupBy("x").agg(F.min("y").alias("mn"))
        with_m = ls.join(m_ss, "x")
        ss = (
            with_m.select(F.col("y").alias("x"), F.col("mn").alias("y"))
            .where(F.col("x") != F.col("y"))
            .unionByName(with_m.select("x", F.col("mn").alias("y")).distinct())
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_ss = ss.count()
        if n_ss == n_e and ss.subtract(e).limit(1).count() == 0:
            e = ss
            converged = True
            break
        e, n_e = ss, n_ss
        if n_e == 0:
            converged = True
    if stats is not None:
        stats["iterations"] = iters
        stats["converged"] = converged
    # fixpoint = star forest: non-roots point straight at their component
    # minimum; roots are the nodes never appearing on the high side
    non_roots = e.select(F.col("x").alias("node"), F.col("y").alias("component"))
    if not converged:
        # iteration budget exhausted before the fixpoint: the edge set is not
        # yet a star forest, so a node can carry several (conflicting) labels.
        # Collapse to one deterministic label per node and say so — silent
        # multi-labels would corrupt downstream dedup_by_components.
        import warnings

        warnings.warn(
            f"connected_components: star alternation hit max_iterations="
            f"{max_iterations} before convergence; labels collapsed to "
            f"min(component) per node and may split true components",
            RuntimeWarning,
            stacklevel=2,
        )
        non_roots = non_roots.groupBy("node").agg(
            F.min("component").alias("component")
        )
    roots = nodes.join(
        non_roots.select("node"), "node", "left_anti"
    ).withColumn("component", F.col("node"))
    out = non_roots.unionByName(roots)
    nodes.unpersist()
    return out


def dedup_by_components(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """Keep one representative (the minimum id) per connected component of
    the near-dup pair graph; rows in no pair survive untouched. The
    transitive policy: A~B and B~C drops both B and C even when (A, C) was
    never emitted as a pair."""
    comp = connected_components(pairs, a_col, b_col)
    losers = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def winnow_fingerprints(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every word ``shingle_n``-gram,
    slide a ``window``-wide window over the hash sequence and keep each
    window's minimum hash (rightmost occurrence on ties), yielding an
    expected density of 2/(window+1) position-robust fingerprints per
    document. Any pair of documents sharing a run of at least
    ``shingle_n + window - 1`` words is guaranteed to share a fingerprint —
    the local overlap/plagiarism signal Jaccard-style whole-document
    similarity misses.

    Tie rule without engine-specific struct ordering: each position packs
    into ONE bigint ``hash * 2^24 + (2^24 - 1 - pos)`` (hash < 2^32 from
    the 8-hex-digit md5 prefix — the cross-engine family, see
    ``md5_prefix_long``; 1-based pos < 2^24), so a plain integer MIN picks
    the smallest hash and, among equal hashes, the LARGEST position — the
    winnowing tie rule — and any SQL engine restates the selection with
    integer arithmetic alone. Documents with fewer than ``window`` shingles
    keep the minimum over what exists (≥1 fingerprint for any document with
    ≥ ``shingle_n`` words); shorter documents emit nothing.

    Scale: ZERO shuffle. The window minimum is computed array-side per
    document with ``zip_with`` over shifted copies of the packed-hash array
    (the ``_shingles_of`` pattern — the array tree appears only in argument
    positions, so it evaluates O(window) times per ROW, never per element;
    a per-doc window function would instead exchange every shingle row).
    Fingerprints are ``array_distinct``-ed per document BEFORE the explode,
    so only the ~2/(window+1) density survives the fan-out. At 100 TB this
    is a codegen'd scan + narrow explode with no exchange at all.

    The reference engine has no fingerprinting; this extends the dedup
    family beyond the reference surface (training-data pipeline ops).
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    if not 1 <= shingle_n:
        raise ValueError("shingle_n must be >= 1")
    packed = F.transform(
        _shingles_of(_word_array(F.col(text_col)), shingle_n),
        lambda s, i: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
        * F.lit(1 << 24)
        + (F.lit((1 << 24) - 1) - (i + F.lit(1))),
    )
    # _parallel_head: the per-shingle md5 chain is the whole cost of this
    # operator, and a single-row-group input runs it on ONE task (round 6
    # measured 8.06 s single-core at sf1.0). One cheap round-robin exchange
    # of the raw rows buys a full-width md5 stage; no-op at cluster scale.
    # (This trades the round-5 "zero shuffle" plan for a single narrow
    # exchange of the input rows — still no shuffle of shingles/fingerprints.)
    base = _parallel_head(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), packed.alias("__pk")
    )
    # position-packing guard (ADVICE r05): pos occupies 24 bits, so a
    # document with >= 2^24-1 shingles (~16.7M words) would wrap
    # (2^24-1-pos) negative and bleed into the hash field, silently
    # corrupting the min/tie selection. Fail loudly instead — assert_true
    # raises per offending row; on success it is NULL and the when()
    # passes __pk through (subexpression elimination keeps the packed
    # array evaluated once even if the projects collapse).
    guard = F.assert_true(
        F.size("__pk") < F.lit((1 << 24) - 1),
        F.lit(
            "winnow_fingerprints: document has >= 2^24-1 shingles; the "
            "24-bit position packing cannot represent it"
        ),
    )
    base = base.select(
        F.col(id_col), F.when(guard.isNull(), F.col("__pk")).alias("__pk")
    )
    # cur[i] = min(pk[i .. i+k]) after the k-th pass; zip_with pads the
    # shorter (shifted) side with null, which the when() treats as +inf, so
    # tail positions hold the min over the suffix that exists.
    cur: Column = F.col("__pk")
    for k in range(1, window):
        shifted = F.slice(
            F.col("__pk"), k + 1, F.greatest(F.size("__pk") - k, F.lit(0))
        )
        cur = F.zip_with(
            cur,
            shifted,
            lambda a, b: F.when(b.isNull(), a).otherwise(F.least(a, b)),
        )
    # valid window starts: 1 .. max(n - window + 1, 1) — the max() keeps one
    # whole-document window for docs with 1 <= n < window shingles.
    starts = F.slice(
        cur, 1, F.greatest(F.size("__pk") - (window - 1), F.lit(1))
    )
    exploded = base.select(
        F.col(id_col), F.explode(F.array_distinct(starts)).alias("__c")
    )
    return exploded.select(
        id_col,
        (F.lit((1 << 24) - 1) - F.pmod(F.col("__c"), F.lit(1 << 24)))
        .cast("int")
        .alias("pos"),
        F.shiftright(F.col("__c"), 24).alias("fp"),
    )


def winnow_overlap_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    window: int = 4,
    min_shared: int = 2,
    max_fp_df: int | None = None,
) -> DataFrame:
    """Local-overlap candidate pairs à la MOSS: documents sharing at least
    ``min_shared`` distinct winnowing fingerprints (see
    ``winnow_fingerprints``). Where MinHash/Jaccard measures WHOLE-document
    similarity, shared winnowing fingerprints localize COPIED PASSAGES — a
    400-word document embedding one plagiarized paragraph of another scores
    near zero Jaccard but is guaranteed ≥1 shared fingerprint for any
    shared run of ``shingle_n + window - 1`` words.

    Returns (a, b, n_shared, n_a, n_b): shared-fingerprint count plus each
    side's distinct-fingerprint total — all exact integers, so overlap
    ratios (n_shared / min(n_a, n_b)) are computed downstream from exact
    parts, never shipped as engine-divergent floats.

    Scale: fingerprint generation is shuffle-free (see
    ``winnow_fingerprints``); the candidate join shuffles distinct
    (fp, id) pairs — 16-byte rows at ~2/(window+1) of the shingle count —
    and self-joins on the 8-byte fp key. ``max_fp_df`` drops fingerprints
    in more than that many documents BEFORE the join (boilerplate
    passages: a fp in d docs contributes d² pair rows — the
    ``max_shingle_df`` hot-key cap pattern; per-doc totals n_a/n_b stay
    pre-cap exact).
    """
    # materialize the distinct fingerprint set once: it feeds the per-doc
    # totals, the hot-fp cap AND both self-join sides — lazy, each of the
    # four consumers re-ran tokenize + per-shingle md5 + the window minima
    # (the simhash_dedup rep-set pattern; measured 3.3 s → ~1.5 s at sf0.1)
    fps = (
        winnow_fingerprints(df, text_col, id_col, shingle_n, window)
        .select(F.col(id_col).alias("__id"), "fp")
        .distinct()
        .localCheckpoint(eager=True)
    )
    sizes = fps.groupBy("__id").agg(F.count(F.lit(1)).alias("__n"))
    joinable = fps
    if max_fp_df is not None:
        hot = (
            fps.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") > max_fp_df)
            .select("fp")
        )
        joinable = fps.join(hot, "fp", "left_anti")
    left = joinable.select(F.col("__id").alias("a"), "fp")
    right = joinable.select(F.col("__id").alias("b"), "fp")
    shared = (
        left.join(right, "fp")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    return (
        shared.join(sizes.select(F.col("__id").alias("a"),
                                 F.col("__n").alias("n_a")), "a")
        .join(sizes.select(F.col("__id").alias("b"),
                           F.col("__n").alias("n_b")), "b")
        .select("a", "b", "n_shared", "n_a", "n_b")
    )


def minhash_cross_pairs(
    new: DataFrame,
    ref: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    shingle_n: int = 3,
    bands: int = 16,
    rows_per_band: int = 4,
    threshold: float = 0.7,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Cross-set near-dup pairs — the INCREMENTAL dedup primitive: which
    documents of a new crawl batch near-duplicate the already-kept
    reference corpus? Same MinHash family and banding as
    ``minhash_lsh_dedup``, but candidates come from shared (band, bucket)
    keys BETWEEN the two sets (never within either side — within-batch
    dedup is a separate, cheaper within-set pass), then exact Jaccard over
    the distinct shingle sets verifies. Returns (new_id, ref_id, jaccard).

    With the exact-recall parameterization (bands = num_hashes,
    rows_per_band = 1 — per-pair miss probability ≤ (1−t)^bands), the
    result equals all-pairs CROSS Jaccard ≥ threshold, which is what lets
    a SQL oracle value-check it.

    Scale: each side tokenizes/hashes ONCE (eager localCheckpoint — sets
    + signatures materialize together, the minhash_lsh_dedup rationale);
    band rows from both sides share one explicit (band, bucket)
    repartition — the cap window and BOTH join inputs reuse that single
    exchange (the capacity-path split-after-repartition pattern).
    ``max_bucket_size`` caps the COMBINED bucket population before the
    join: the blowup is |bucket_new|·|bucket_ref| pairs, so the cap must
    see both sides.
    """
    # BOTH sides tokenize/hash/sign in ONE materialization: tag + union,
    # checkpoint once, split by tag — halves the prep jobs vs two eager
    # checkpoints, and the split filters are cheap scans of the
    # checkpointed blocks (results bit-identical either way)
    tagged = new.select(
        F.lit(0).alias("__side"), F.col(id_col), F.col(text_col)
    ).unionByName(
        ref.select(F.lit(1).alias("__side"), F.col(id_col), F.col(text_col))
    )
    base = (
        _with_shingle_hashes(
            _full_width_repartition(tagged), text_col, shingle_n
        )
        .withColumn("__set", F.array_distinct("__h"))
        .withColumn("minhash", _minhash_sig_expr(F.col("__set"), num_hashes))
        .select("__side", F.col(id_col).alias("__id"), "__set", "minhash")
        .localCheckpoint(eager=True)
    )
    nb = base.where(F.col("__side") == 0).select(
        F.col("__id").alias("new_id"), F.col("__set").alias("set_n"), "minhash"
    )
    rb = base.where(F.col("__side") == 1).select(
        F.col("__id").alias("ref_id"), F.col("__set").alias("set_r"), "minhash"
    )

    def bandify(base: DataFrame, idc: str, tag: int) -> DataFrame:
        return base.select(
            F.col(idc).alias("__id"),
            F.lit(tag).alias("__side"),
            F.posexplode(
                F.array(
                    *[
                        F.xxhash64(
                            *[
                                F.element_at(
                                    F.col("minhash"), b * rows_per_band + r + 1
                                )
                                for r in range(rows_per_band)
                            ]
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("band", "bucket"),
        )

    both = _full_width_repartition(
        bandify(nb, "new_id", 0).unionByName(bandify(rb, "ref_id", 1)),
        "band", "bucket",
    )
    if max_bucket_size is not None:
        wc = Window.partitionBy("band", "bucket")
        both = (
            both.withColumn("__n", F.count("*").over(wc))
            .where(F.col("__n") <= max_bucket_size)
            .drop("__n")
        )
    lhs = both.where(F.col("__side") == 0).select(
        F.col("__id").alias("new_id"), "band", "bucket"
    )
    rhs = both.where(F.col("__side") == 1).select(
        F.col("__id").alias("ref_id"), "band", "bucket"
    )
    cand = lhs.join(rhs, ["band", "bucket"]).select("new_id", "ref_id")
    inter = F.size(F.array_intersect("set_n", "set_r")).cast("double")
    union = F.size("set_n") + F.size("set_r") - inter
    # broadcast-gate the per-doc set tables (one row per document): attaching
    # the arrays map-side keeps the multi-million-row candidate stream in ONE
    # stage (candidate join → size prune → intersect → filter) instead of
    # exchanging it twice (sf1.0: 68M candidate rows vs 100k docs). The
    # checkpoint makes the doc count a free local lookup — a measured gate,
    # not an estimate; past it (true corpus scale) the shuffle joins stand.
    small = base.count() <= 250_000
    # sound size prune BEFORE the arrays attach: J ≤ min/max, so J ≥ t
    # requires min(|A|,|B|) ≥ t·max(|A|,|B|). Attaching just the 8-byte
    # sizes first (broadcast) and filtering kills the non-viable pairs
    # (measured ~41% of the random band collisions at sf1.0) before they
    # pay the array probe + per-pair hash-set intersect.
    zn = nb.select("new_id", F.size("set_n").alias("__zn"))
    zr = rb.select("ref_id", F.size("set_r").alias("__zr"))
    if small:
        zn, zr = F.broadcast(zn), F.broadcast(zr)
    cand = (
        cand.join(zn, "new_id")
        .join(zr, "ref_id")
        .where(
            F.least(F.col("__zn"), F.col("__zr"))
            >= threshold * F.greatest(F.col("__zn"), F.col("__zr"))
        )
        .select("new_id", "ref_id")
    )
    sl, sr = nb.select("new_id", "set_n"), rb.select("ref_id", "set_r")
    if small:
        sl, sr = F.broadcast(sl), F.broadcast(sr)
    return (
        cand.join(sl, "new_id")
        .join(sr, "ref_id")
        .withColumn("jaccard", inter / union)
        .where(F.col("jaccard") >= threshold)
        .select("new_id", "ref_id", "jaccard")
        .distinct()
    )


def incremental_dedup(
    new: DataFrame,
    ref: DataFrame,
    text_col: str,
    id_col: str,
    **kwargs,
) -> DataFrame:
    """Keep only the new-batch rows that near-duplicate NOTHING in the
    reference corpus (one left_anti on the flagged id set) — the policy
    wrapper over ``minhash_cross_pairs``; kwargs pass through."""
    flagged = (
        minhash_cross_pairs(new, ref, text_col, id_col, **kwargs)
        .select(F.col("new_id").alias(id_col))
        .distinct()
    )
    return new.join(flagged, id_col, "left_anti")
