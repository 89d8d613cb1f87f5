"""Largest-scale single-run dedup demonstration (BENCH/BASELINE.md §9).

One pass of the similarity/dedup family over a 1,000,000-document corpus
(12.5× the §4 stress ceiling) with the same skew-adversarial shape — 50%
of documents share one hot 3-gram, 10% exact dups, 10% near-dup partners
— on local[$SPARK_GRAFT_CPUS]. Single-shot by design: the point is that
the §4 linear curves EXTEND (caps keep the hot shingle bounded, the
embedding op applies the +1-bit-per-doubling sizing rule: bits=12 at 80k
→ bits=16 at 1M), not a min-of-k throughput claim — protocol numbers
stay in bench.py / similarity_stress.py.

Usage: python experiments/large_dedup.py [n_docs]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from httrack2warc_spark import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
DIM = 32
HOT = "the quick brown fox says hello"

spark = get_spark(
    app_name="large-dedup",
    master=f"local[{CPUS}]",
    shuffle_partitions=int(CPUS) * 2,
)
spark.sparkContext.setLogLevel("ERROR")

from httrack2warc_spark.operators.dedup import (  # noqa: E402
    connected_components,
    embedding_neardup_lsh,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_dedup,
)


def gen_docs(n: int):
    # same corpus law as experiments/similarity_stress.py::gen_docs
    base = spark.range(n).withColumnRenamed("id", "doc_id")

    def words(src):
        return F.concat_ws(
            " ",
            *[
                F.concat(F.lit("w"), (F.abs(F.xxhash64(src, F.lit(k))) % 8000)
                         .cast("string"))
                for k in range(12)
            ],
        )

    partner = F.when(F.col("doc_id") % 10 == 1, F.col("doc_id") - 1).otherwise(
        F.col("doc_id")
    )
    near = F.col("doc_id") % 10 == 3
    body = F.when(
        near, F.concat(words(F.col("doc_id") - 1), F.lit(" changed"))
    ).otherwise(words(partner))
    text = F.when(
        (partner % 2 == 0) | (near & ((F.col("doc_id") - 1) % 2 == 0)),
        F.concat(F.lit(HOT + " "), body),
    ).otherwise(body)
    return base.select("doc_id", text.alias("text"))


def gen_embeddings(n: int):
    base = spark.range(n).withColumnRenamed("id", "vec_id")
    anchor = F.when(F.col("vec_id") % 5 == 1, F.col("vec_id") - 1).otherwise(
        F.col("vec_id")
    )
    eps = F.when(F.col("vec_id") % 5 == 1, F.lit(0.01)).otherwise(F.lit(0.0))
    vec = F.array(
        *[
            ((F.abs(F.xxhash64(anchor, F.lit(k))) % 1000) / 500.0 - 1.0)
            + eps * ((F.abs(F.xxhash64(F.col("vec_id"), F.lit(1000 + k))) % 100)
                     / 100.0)
            for k in range(DIM)
        ]
    )
    return base.select("vec_id", vec.alias("v"))


def force(df):
    cols = [
        F.sum(F.xxhash64(F.col(c).cast("string")) % F.lit(1_000_000_007))
        for c in df.columns[:2]
    ]
    df.agg(*cols).collect()


def timed(fn) -> float:
    t0 = time.time()
    fn()
    return round(time.time() - t0, 2)


def main() -> None:
    docs = gen_docs(N).persist()
    emb = gen_embeddings(N).persist()
    docs.count(), emb.count()
    load0 = os.getloadavg()[0]
    walls = {}
    walls["minhash"] = timed(lambda: force(
        minhash_lsh_dedup(docs, "text", "doc_id", num_hashes=64, shingle_n=3,
                          bands=16, rows_per_band=4, threshold=0.7,
                          max_bucket_size=1000)))
    walls["simhash"] = timed(lambda: force(
        simhash_dedup(docs, "text", "doc_id", shingle_n=3,
                      hamming_threshold=3, blocks=4)))
    pairs = ngram_jaccard_pairs(docs, "text", "doc_id", shingle_n=3,
                                threshold=0.5, max_shingle_df=1000)
    walls["ngram_jaccard"] = timed(lambda: force(pairs))
    # sized by MEASUREMENT, not just the +1-bit rule: this corpus's
    # components are correlated, so sign-patterns are non-uniform and
    # bits=16 leaves ~210M candidate pairs (profiled: signature 4.7 s,
    # bucket cap 5.1 s, join+distinct 44.5 s, exact re-rank ~225 s).
    # bits=20 + cap=500 cut the wall 280 s → 30 s at UNCHANGED recall
    # (exactly the 200k planted pairs) — BENCH/BASELINE.md §9.
    walls["embedding_neardup"] = timed(lambda: force(
        embedding_neardup_lsh(emb, "v", "vec_id", threshold=0.98,
                              bits=20, num_tables=8, max_bucket_size=500)))
    walls["connected_components"] = timed(lambda: force(
        connected_components(pairs)))
    total = round(sum(walls.values()), 2)
    print(json.dumps({
        "mode": "large-dedup single run",
        "cpus": int(CPUS),
        "docs": N,
        "walls_sec": walls,
        "total_sec": total,
        "minhash_docs_per_sec": round(N / walls["minhash"], 1),
        "load_avg_start_1m": round(load0, 1),
        "load_avg_end_1m": round(os.getloadavg()[0], 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
