"""Partitioned Bloom + cuckoo URL-seen summaries (north_rule: "maintains a
10^10-entry URL-seen set via partitioned Bloom + cuckoo filters built in
pandas/Arrow UDFs").

Reference analogue: the in-heap ``HashSet`` seen-sets (``httrack/HttrackCrawl.
java:130,138,255-258``) — exact, single-node. At 10^10 URLs an exact per-round
anti-join against the whole seen table is the bottleneck, so the engine keeps,
*per MurmurHash3 partition of url_key*, a compact membership summary:

- build:  two 64-bit hashes are computed JVM-side (``xxhash64(url_key, seed)``
  — whole-stage codegen), then ``applyInPandas`` per partition folds them into
  filter bytes with pure-numpy bit ops (no per-row Python);
- store:  one ``(part, kind, bits, num_items, capacity)`` row per partition in
  the ``url_seen_summary`` table — a few GB total for 10^10 keys at 1% fpp,
  trivially cacheable executor-side;
- probe:  ``cogroup(...).applyInPandas`` of candidates against their
  partition's filter row (the filter crosses the Arrow boundary once per
  *group*, never per row) → ``maybe_seen`` flag;
- confirm: Bloom false positives must not drop URLs (a silently dropped URL
  corrupts visit order — worst failure mode), so probe-hits are confirmed
  against the exact table with an anti-join; probe-misses are definitely new
  and skip the join entirely. The summary is an optimization gate only.

The cuckoo variant stores 16-bit fingerprints in 4-slot buckets (Fan et al.,
"Cuckoo Filter: Practically Better Than Bloom", CoNEXT'14) — same gate role,
lower fpp per bit at high load, and supports deletion (not used here).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "BLOOM_SEED1",
    "BLOOM_SEED2",
    "SUMMARY_SCHEMA",
    "add_partition_and_hashes",
    "build_summaries",
    "merge_summaries",
    "probe_summaries",
    "probe_summaries_cols",
    "summaries_to_words",
    "filter_new_urls",
]

BLOOM_SEED1 = 0x51ED2701
BLOOM_SEED2 = 0x2C5329B7

SUMMARY_SCHEMA = StructType(
    [
        StructField("part", IntegerType(), False),
        StructField("kind", StringType(), False),
        StructField("bits", BinaryType(), True),
        StructField("num_items", LongType(), False),
        StructField("capacity", LongType(), False),
    ]
)


# ---------------------------------------------------------------------------
# numpy filter kernels (operate on precomputed uint64 hash pairs)
# ---------------------------------------------------------------------------


def _bloom_params(capacity: int, fpp: float) -> tuple[int, int]:
    m = max(64, int(-capacity * math.log(fpp) / (math.log(2) ** 2)))
    m = (m + 7) // 8 * 8  # byte-align
    k = max(1, round(m / capacity * math.log(2))) if capacity else 1
    return m, min(k, 16)


def _bloom_positions(h1: np.ndarray, h2: np.ndarray, k: int, m: int) -> np.ndarray:
    """Kirsch–Mitzenmacher double hashing, *overflow-free* form (layout v2,
    kind ``bloom2``): pos_i = (h1 mod m + i·(h2 mod m)) mod m, shape (k, n).

    Reducing both hashes mod m FIRST keeps every intermediate below
    16·2^31 — the same formula is therefore expressible as pure Spark
    Columns under ANSI overflow checking, which is what lets the probe run
    in whole-stage codegen (``probe_summaries_cols``) instead of a pandas
    cogroup. Equivalent double-hashing quality; NOT bit-compatible with v1.
    """
    i = np.arange(k, dtype=np.uint64).reshape(-1, 1)
    a = h1 % np.uint64(m)
    b = h2 % np.uint64(m)
    return ((a[None, :] + i * b[None, :]) % np.uint64(m)).astype(np.int64)


def _bloom_positions_v1(h1: np.ndarray, h2: np.ndarray, k: int, m: int) -> np.ndarray:
    """Legacy layout (kind ``bloom``): pos_i = (h1 + i·h2 mod 2^64) mod m.
    Kept so summaries persisted by older code stay probe-able and merge-able
    on resume — a layout mismatch would manufacture Bloom false negatives,
    the one failure mode the seen-gate invariant forbids."""
    i = np.arange(k, dtype=np.uint64).reshape(-1, 1)
    return ((h1[None, :] + i * h2[None, :]) % np.uint64(m)).astype(np.int64)


def bloom_build(h1: np.ndarray, h2: np.ndarray, capacity: int, fpp: float,
                bits: bytes | None = None, positions=None) -> bytes:
    m, k = _bloom_params(capacity, fpp)
    arr = (
        np.unpackbits(np.frombuffer(bits, dtype=np.uint8))
        if bits
        else np.zeros(m, dtype=np.uint8)
    )
    if len(h1):
        pos = (positions or _bloom_positions)(h1, h2, k, m).ravel()
        arr[pos] = 1
    return np.packbits(arr).tobytes()


def bloom_probe(h1: np.ndarray, h2: np.ndarray, capacity: int, fpp: float,
                bits: bytes, positions=None) -> np.ndarray:
    m, k = _bloom_params(capacity, fpp)
    arr = np.unpackbits(np.frombuffer(bits, dtype=np.uint8))
    pos = (positions or _bloom_positions)(h1, h2, k, m)
    return arr[pos].all(axis=0)


class _Cuckoo:
    """4-slot-bucket cuckoo filter over uint16 fingerprints, numpy-backed."""

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, capacity: int, table: np.ndarray | None = None):
        if table is not None:
            self.table = table
            self.nbuckets = table.shape[0]
        else:
            nb = max(8, 1 << math.ceil(math.log2(max(1, capacity) / self.SLOTS / 0.84)))
            self.nbuckets = nb
            self.table = np.zeros((nb, self.SLOTS), dtype=np.uint16)

    @staticmethod
    def _fingerprint(h1: np.ndarray) -> np.ndarray:
        fp = (h1 & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1  # 0 marks an empty slot
        return fp

    def _alt(self, bucket: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # partial-key cuckoo hashing: alt = bucket xor hash(fp)
        fph = (fp.astype(np.uint64) * np.uint64(0x5BD1E9955BD1E995)) >> np.uint64(32)
        return (bucket ^ fph.astype(np.int64)) % self.nbuckets

    def insert_many(self, h1: np.ndarray) -> int:
        fps = self._fingerprint(h1)
        b1 = (h1 % np.uint64(self.nbuckets)).astype(np.int64)
        inserted = 0
        rng = np.random.default_rng(12345)  # deterministic eviction choices
        for fp, b in zip(fps, b1):
            if self._insert_one(int(fp), int(b), rng):
                inserted += 1
        return inserted

    def _insert_one(self, fp: int, b1: int, rng) -> bool:
        b2 = int(self._alt(np.array([b1]), np.array([fp], dtype=np.uint16))[0])
        for b in (b1, b2):
            row = self.table[b]
            if (row == fp).any():
                return True  # already present (fp-level)
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        b = b1 if rng.integers(2) else b2
        for _ in range(self.MAX_KICKS):
            slot = int(rng.integers(self.SLOTS))
            fp, self.table[b, slot] = int(self.table[b, slot]), fp
            b = int(self._alt(np.array([b]), np.array([fp], dtype=np.uint16))[0])
            row = self.table[b]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        return False  # table overfull — caller falls back to "maybe"

    def probe_many(self, h1: np.ndarray) -> np.ndarray:
        if not len(h1):
            return np.zeros(0, dtype=bool)
        fps = self._fingerprint(h1)
        b1 = (h1 % np.uint64(self.nbuckets)).astype(np.int64)
        b2 = self._alt(b1, fps)
        hit1 = (self.table[b1] == fps[:, None]).any(axis=1)
        hit2 = (self.table[b2] == fps[:, None]).any(axis=1)
        return hit1 | hit2

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "_Cuckoo":
        table = np.frombuffer(data, dtype=np.uint16).reshape(-1, cls.SLOTS).copy()
        return cls(0, table=table)


# ---------------------------------------------------------------------------
# Spark-side build / probe
# ---------------------------------------------------------------------------


def add_partition_and_hashes(df: DataFrame, key_col: str, num_parts: int) -> DataFrame:
    """JVM-side: MurmurHash3 partition id (north_rule verbatim — Spark's
    ``hash()`` IS 32-bit MurmurHash3) + the two xxhash64 probe hashes."""
    return (
        df.withColumn("part", F.pmod(F.hash(F.col(key_col)), F.lit(num_parts)).cast("int"))
        .withColumn("h1", F.xxhash64(F.col(key_col), F.lit(BLOOM_SEED1)))
        .withColumn("h2", F.xxhash64(F.col(key_col), F.lit(BLOOM_SEED2)))
    )


def _to_u64(s: pd.Series) -> np.ndarray:
    return s.to_numpy(dtype=np.int64).astype(np.uint64)


def build_summaries(
    hashed: DataFrame,
    num_parts: int,
    kind: str = "bloom",
    capacity_per_part: int = 1_000_000,
    fpp: float = 0.01,
) -> DataFrame:
    """``applyInPandas`` per hash-partition → one summary row each.

    ``hashed`` must carry part/h1/h2 (see ``add_partition_and_hashes``).
    """
    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        part = int(pdf["part"].iloc[0])
        h1, h2 = _to_u64(pdf["h1"]), _to_u64(pdf["h2"])
        if kind == "bloom":
            # fresh bloom filters are written in the v2 (codegen-probeable)
            # layout; the row's kind string is the self-describing marker
            bits = bloom_build(h1, h2, capacity_per_part, fpp)
        else:
            ck = _Cuckoo(capacity_per_part)
            inserted = ck.insert_many(h1)
            # A cuckoo filter that dropped fingerprints (eviction-loop
            # overflow) or is running past the safe 0.84 load factor can
            # return false negatives; a probe-miss would then skip the exact
            # confirm join and re-enqueue a seen URL. Degrade to bits=None:
            # probe_summaries treats a present-but-None summary as all-maybe,
            # which routes everything through the exact anti-join.
            bits = ck.to_bytes()
            if inserted < len(h1) or len(h1) > 0.84 * ck.nbuckets * ck.SLOTS:
                bits = None
        return pd.DataFrame(
            {
                "part": [part],
                "kind": ["bloom2" if kind == "bloom" else kind],
                "bits": [bits],
                "num_items": [len(pdf)],
                "capacity": [capacity_per_part],
            }
        )

    return (
        hashed.select("part", "h1", "h2")
        .groupBy("part")
        .applyInPandas(build, schema=SUMMARY_SCHEMA)
    )


def merge_summaries(old: DataFrame, delta_hashed: DataFrame, num_parts: int,
                    kind: str = "bloom", capacity_per_part: int = 1_000_000,
                    fpp: float = 0.01) -> DataFrame:
    """Fold a round's new keys into existing filter bytes (cogroup: old filter
    row + the partition's new hashes meet once per group)."""
    def merge(key, old_pdf: pd.DataFrame, new_pdf: pd.DataFrame) -> pd.DataFrame:
        part = int(key[0])
        prior = old_pdf["bits"].iloc[0] if len(old_pdf) else None
        prior_kind = old_pdf["kind"].iloc[0] if len(old_pdf) else None
        n_prior = int(old_pdf["num_items"].iloc[0]) if len(old_pdf) else 0
        h1, h2 = _to_u64(new_pdf["h1"]), _to_u64(new_pdf["h2"])
        out_kind = "bloom2" if kind == "bloom" else kind
        if kind == "bloom":
            # the row's stored layout wins: new keys fold into a legacy-v1
            # row with v1 positions (bit-exact continuation on resume), into
            # a v2 row with v2 — mixing layouts would create false negatives
            if prior is not None and prior_kind == "bloom":
                bits = bloom_build(h1, h2, capacity_per_part, fpp,
                                   bits=prior, positions=_bloom_positions_v1)
                out_kind = "bloom"
            else:
                bits = bloom_build(h1, h2, capacity_per_part, fpp, bits=prior)
        else:
            if len(old_pdf) and prior is None:
                # Partition already degraded on a prior round — stays degraded
                # (we no longer know which fingerprints the filter is missing).
                bits = None
            else:
                ck = _Cuckoo(capacity_per_part) if prior is None else _Cuckoo.from_bytes(prior)
                inserted = ck.insert_many(h1)
                bits = ck.to_bytes()
                total = n_prior + len(new_pdf)
                if inserted < len(h1) or total > 0.84 * ck.nbuckets * ck.SLOTS:
                    bits = None  # see build_summaries: overflow ⇒ all-maybe
        return pd.DataFrame(
            {
                "part": [part],
                "kind": [out_kind],
                "bits": [bits],
                "num_items": [n_prior + len(new_pdf)],
                "capacity": [capacity_per_part],
            }
        )

    return (
        old.groupBy("part")
        .cogroup(delta_hashed.select("part", "h1", "h2").groupBy("part"))
        .applyInPandas(merge, schema=SUMMARY_SCHEMA)
    )


def probe_summaries(candidates_hashed: DataFrame, summaries: DataFrame,
                    fpp: float = 0.01,
                    dedup_key: str | None = None,
                    dedup_order: list[str] | None = None) -> DataFrame:
    """cogroup probe → candidates + ``maybe_seen`` boolean. Partitions with no
    summary row (nothing seen there yet) probe as all-new.

    ``dedup_key``/``dedup_order``: fold the within-batch first-occurrence
    dedup into the same cogroup (rows sharing a key share a hash partition,
    so the group sees every duplicate) — a pandas sort+drop_duplicates here
    replaces a whole extra exchange+window stage in the discovery pipeline.
    """
    out_schema = StructType(
        candidates_hashed.schema.fields + [StructField("maybe_seen", BooleanType(), False)]
    )

    def probe(key, cand: pd.DataFrame, summ: pd.DataFrame) -> pd.DataFrame:
        if not len(cand):
            out = cand.copy()
            out["maybe_seen"] = np.zeros(0, dtype=bool)
            return out
        if dedup_key is not None:
            cand = cand.sort_values(dedup_order or [dedup_key]).drop_duplicates(
                dedup_key, keep="first"
            )
        if not len(summ):
            # no summary row ⇒ no keys seen in this partition at merge time
            # (the unsummarized-tail anti-join covers anything newer)
            maybe = np.zeros(len(cand), dtype=bool)
        elif summ["bits"].iloc[0] is None:
            # degraded summary (cuckoo overflow at build/merge) ⇒ all-maybe,
            # so every candidate takes the exact confirm anti-join
            maybe = np.ones(len(cand), dtype=bool)
        else:
            h1, h2 = _to_u64(cand["h1"]), _to_u64(cand["h2"])
            kind = summ["kind"].iloc[0]
            bits = summ["bits"].iloc[0]
            cap = int(summ["capacity"].iloc[0])
            if kind == "bloom2":
                maybe = bloom_probe(h1, h2, cap, fpp, bits)
            elif kind == "bloom":  # legacy v1 layout (pre-codegen-probe rows)
                maybe = bloom_probe(h1, h2, cap, fpp, bits,
                                    positions=_bloom_positions_v1)
            else:
                maybe = _Cuckoo.from_bytes(bits).probe_many(h1)
        out = cand.copy()
        out["maybe_seen"] = maybe
        return out

    return (
        candidates_hashed.groupBy("part")
        .cogroup(summaries.groupBy("part"))
        .applyInPandas(probe, schema=out_schema)
    )


def summaries_to_words(summaries: DataFrame) -> DataFrame:
    """Re-shape bloom2 summary rows for the codegen probe: filter bytes →
    ``array<long>`` words where bit p of the filter is
    ``words[p div 64] >> (p mod 64) & 1``. One tiny Arrow pass over the
    ≤ num_parts summary rows per round — never over candidates.

    ``__ok`` = false for rows the Column probe cannot evaluate (legacy v1
    layout, cuckoo, degraded bits=None): those partitions probe as all-maybe
    and take the exact confirm anti-join — the gate invariant (no false
    negatives, ever) is preserved by construction.
    """
    from pyspark.sql.types import ArrayType

    out_schema = StructType([
        StructField("part", IntegerType(), False),
        StructField("__cap", LongType(), False),
        StructField("__ok", BooleanType(), False),
        StructField("__words", ArrayType(LongType(), False), True),
    ])

    def conv(batches):
        for pdf in batches:
            rows = {"part": [], "__cap": [], "__ok": [], "__words": []}
            for _, r in pdf.iterrows():
                ok = r["kind"] == "bloom2" and r["bits"] is not None
                words = None
                if ok:
                    bit_arr = np.unpackbits(np.frombuffer(r["bits"], np.uint8))
                    le = np.packbits(bit_arr, bitorder="little")
                    pad = (-len(le)) % 8
                    if pad:
                        le = np.concatenate([le, np.zeros(pad, np.uint8)])
                    words = le.view("<u8").astype(np.int64).tolist()
                rows["part"].append(int(r["part"]))
                rows["__cap"].append(int(r["capacity"]))
                rows["__ok"].append(bool(ok))
                rows["__words"].append(words)
            yield pd.DataFrame(rows)

    return summaries.mapInPandas(conv, schema=out_schema)


def probe_summaries_cols(
    candidates_hashed: DataFrame,
    words: DataFrame,
    capacity: int,
    fpp: float = 0.01,
) -> DataFrame:
    """The Bloom probe as pure Column expressions in whole-stage codegen — no
    pandas cogroup, no exchange: candidates broadcast-join the ≤ num_parts
    word rows on ``part`` and evaluate the k double-hash bit tests inline.

    Position formula = ``_bloom_positions`` v2 (overflow-free, ANSI-safe):
    a = h1 mod_u64 m, b = h2 mod_u64 m, pos_i = (a + i·b) mod m. The
    unsigned mod of a signed 64-bit hash is pmod(pmod(h, m) + [h<0]·(2^64
    mod m), m) — every intermediate < 2m < 2^32, and i·b ≤ 16·2^31, so
    nothing overflows under ANSI.

    Partitions with no summary row probe all-new (maybe=false); rows the
    Column path can't evaluate (``__ok`` false, or a capacity that doesn't
    match this probe's plan-time m/k) probe all-maybe (exact confirm).
    """
    m, k = _bloom_params(capacity, fpp)
    c64 = (1 << 64) % m

    # a ≡ h1 (mod m) as unsigned, kept < 2m (the final pmod folds it home);
    # every intermediate stays < 32m < 2^38, so nothing trips ANSI overflow,
    # and the whole conjunction is integer shifts/masks — cheap in codegen
    # (measured 0.5 s / 8M rows / 8 cores for the full k-test projection)
    a = F.pmod(F.col("h1"), F.lit(m)) + F.when(
        F.col("h1") < 0, F.lit(c64)).otherwise(F.lit(0))
    b = F.pmod(F.col("h2"), F.lit(m)) + F.when(
        F.col("h2") < 0, F.lit(c64)).otherwise(F.lit(0))
    test = F.lit(True)
    for i in range(k):
        pos = F.pmod(a + F.lit(i) * b, F.lit(m))
        word = F.get(
            F.col("__words"),
            F.call_function("shiftright", pos, F.lit(6)).cast("int"),
        )
        bit = F.call_function(
            "shiftright", word, pos.bitwiseAND(F.lit(63)).cast("int")
        ).bitwiseAND(F.lit(1))
        test = test & (bit == F.lit(1))

    joined = candidates_hashed.join(F.broadcast(words), "part", "left")
    maybe = (
        F.when(F.col("__ok").isNull(), F.lit(False))        # no summary row
        .when(~F.col("__ok") | (F.col("__cap") != F.lit(capacity)), F.lit(True))
        .otherwise(test)
    )
    return joined.withColumn("maybe_seen", maybe).drop("__ok", "__cap", "__words")


def _anti_join_all(df: DataFrame, seen, key_col: str) -> DataFrame:
    """Anti-join ``df`` against one seen table or a list of seen filesets.

    The list form is the bucketed-storage path: each fileset is a bucketed
    scan carrying HashPartitioning(key, n), so every chained SortMergeJoin
    reads the (big) seen side with NO exchange and NO sort — only the
    (small, shrinking) probe-hit side is exchanged per link. A plain union
    would discard the bucketing metadata and re-shuffle the whole seen set
    every round — the classic 10^10-row iterative-state trap.
    """
    seen_list = seen if isinstance(seen, list) else [seen]
    for s in seen_list:
        df = df.join(s.select(key_col), key_col, "left_anti")
    return df


def filter_new_urls(
    candidates: DataFrame,
    seen_exact,
    summaries: DataFrame | None,
    key_col: str,
    num_parts: int,
    fpp: float = 0.01,
    unsummarized: DataFrame | None = None,
    dedup_order: list[str] | None = None,
    capacity: int | None = None,
) -> DataFrame:
    """The J6 discovery anti-join with the summary pre-filter as a gate.

    new = probe-misses ∪ (probe-hits ⟂ exact-seen). Without summaries it
    degrades to the plain anti-join (correct, just slower at scale).

    ``seen_exact``: the exact seen table, or a LIST of fileset DataFrames
    (from ``TableCatalog.read_filesets`` of a bucketed table) — the confirm
    join then runs per fileset against exchange-free bucketed scans.

    ``unsummarized``: seen keys appended *after* the summaries were last
    merged. Probe-misses are anti-joined against this (small) tail, which
    makes stale summaries safe — at 10^10 keys you refresh the multi-GB
    filter bytes every K rounds, not every round, and pay only a tail-sized
    exact join in between.

    ``dedup_order``: also first-occurrence-dedup the candidates on
    ``key_col`` (winner = min by these columns) inside the probe cogroup —
    one exchange instead of a separate shuffle+window (see probe_summaries).

    ``capacity``: the uniform per-part Bloom capacity. When given (and
    summaries exist) the probe runs the all-JVM codegen path
    (``probe_summaries_cols``): dedup becomes a groupBy+min_by with
    map-side partial aggregation — ONE exchange on ``key_col`` whose
    clustering the confirm anti-join then reuses — and the bit tests never
    leave whole-stage codegen. Pass it only for bloom summaries; cuckoo
    keeps the pandas cogroup.
    """
    hashed = add_partition_and_hashes(candidates, key_col, num_parts)
    if summaries is None:
        if dedup_order is not None:
            from httrack2warc_spark.operators.dedup import first_occurrence

            hashed = first_occurrence(hashed, key_col, dedup_order)
        return _anti_join_all(hashed, seen_exact, key_col).drop("part", "h1", "h2")
    if capacity is not None:
        # all-JVM shape: the probe is a map-side Column projection (no
        # exchange, no Python), so the miss/hit split happens BEFORE any
        # shuffle. A key's duplicates all share one maybe_seen value, so
        # first-occurrence dedup commutes with the split — each branch
        # dedups its own (disjoint) rows, and the two window exchanges move
        # the SAME combined volume as one full exchange would. The branches
        # re-evaluate only the post-ReusedExchange tail of the candidate
        # pipeline (the outlinks exchange upstream is shared), and the big
        # fileset joins see probe-hits only — misses pay just the (small)
        # unsummarized-tail anti-join, exactly the 10^10-key design.
        # the explicit repartition is load-bearing twice over: (1) the probe
        # projection is evaluated ONCE on the exchange's map side and
        # maybe_seen crosses the wire as one byte — without it each branch
        # filter re-derives the whole k-test expression (measured 3.4 s vs
        # 0.4 s per pass at 4M rows: FilterExec doesn't CSE the predicate);
        # (2) HashPartitioning(key_col) satisfies the branch windows and the
        # confirm joins, so this is the ONLY candidate exchange in the gate.
        probed = probe_summaries_cols(
            hashed, summaries_to_words(summaries), capacity, fpp
        ).repartition(num_parts, key_col)
        misses = probed.where(~F.col("maybe_seen"))
        hits = probed.where(F.col("maybe_seen"))
        if dedup_order is not None:
            from httrack2warc_spark.operators.dedup import first_occurrence

            misses = first_occurrence(misses, key_col, dedup_order)
            hits = first_occurrence(hits, key_col, dedup_order)
        if unsummarized is not None:
            misses = misses.join(
                unsummarized.select(key_col), key_col, "left_anti"
            )
        confirmed_new = _anti_join_all(hits, seen_exact, key_col)
        return misses.unionByName(confirmed_new).drop(
            "part", "h1", "h2", "maybe_seen"
        )
    probed = probe_summaries(
        hashed, summaries, fpp,
        dedup_key=key_col if dedup_order is not None else None,
        dedup_order=dedup_order,
    )
    misses = probed.where(~F.col("maybe_seen"))
    if unsummarized is not None:
        misses = misses.join(unsummarized.select(key_col), key_col, "left_anti")
    hits = probed.where(F.col("maybe_seen"))
    confirmed_new = _anti_join_all(hits, seen_exact, key_col)
    return misses.unionByName(confirmed_new).drop("part", "h1", "h2", "maybe_seen")
