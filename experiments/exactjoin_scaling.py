"""N vs 4N parallelism scaling for the exact-join/tokenizer family
(BENCH/BASELINE.md §4f): prefix-filtered exact all-pairs Jaccard
(AllPairs/PPJoin) over a skew-adversarial corpus, and the BPE
pair-count iteration workload over a 1M-document corpus — at local[2]
and local[8], fresh JVM per level, warm-up pass + min-of-3 measured
(the bench_scaling.py noise protocol).

Hazards each op is built to hit:

  - **allpairs with a 50%-hot phrase**: half the documents open with the
    same 6-word boilerplate phrase — several shingles with df = n/2 each,
    the d² join blowup that forces ``max_shingle_df`` on the plain n-gram
    join. The prefix filter must keep those shingles out of the candidate
    join *structurally* (rare-first ordering) with EXACT output, so the
    measured curve is the claim "skew resistance falls out of the
    algorithm" under load.
  - **bpe_pairs at 1M docs**: the corpus must collapse to the
    distinct-word vocab before any fan-out — the measured wall is
    vocab-bound, which is what makes a 32-merge ``train_bpe`` loop
    affordable at corpus scale.

Run: python experiments/exactjoin_scaling.py
Child mode: python experiments/exactjoin_scaling.py --child <cpus>
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PAIR_DOCS = int(os.environ.get("SCALE_PAIR_DOCS", "200000"))
N_BPE_DOCS = int(os.environ.get("SCALE_BPE_DOCS", "1000000"))

HOT = "this site uses cookies accept decline"


def child(cpus: int) -> None:
    from pyspark.sql import functions as F

    from httrack2warc_spark import get_spark
    from httrack2warc_spark.functions.text import word_tokens
    from httrack2warc_spark.operators.corpus import _char_syms, bpe_pair_counts
    from httrack2warc_spark.operators.dedup import allpairs_jaccard_pairs

    spark = get_spark(
        app_name=f"exactjoin-scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 4, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    def para(src, salt, words=12):
        return F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit("w"),
                    (F.abs(F.xxhash64(src, F.lit(salt * 100 + k))) % 8000)
                    .cast("string"),
                )
                for k in range(words)
            ],
        )

    docs_path = f"/tmp/exactjoin_scaling_docs_{N_PAIR_DOCS}.parquet"
    if not os.path.exists(docs_path):
        base = spark.range(0, N_PAIR_DOCS, 1, 32).withColumnRenamed("id", "doc_id")
        # 10% exact dups, 10% near-dups (one word appended), 50% hot prefix
        partner = F.when(F.col("doc_id") % 10 == 1, F.col("doc_id") - 1) \
            .otherwise(F.col("doc_id"))
        near = F.col("doc_id") % 10 == 3
        body = F.when(
            near, F.concat(para(F.col("doc_id") - 1, 1), F.lit(" changed"))
        ).otherwise(para(partner, 1))
        text = F.when(
            (partner % 2 == 0) | (near & ((F.col("doc_id") - 1) % 2 == 0)),
            F.concat(F.lit(HOT + " "), body),
        ).otherwise(body)
        base.select("doc_id", text.alias("text")).write.mode(
            "overwrite"
        ).parquet(docs_path)
    bpe_path = f"/tmp/exactjoin_scaling_bpe_{N_BPE_DOCS}.parquet"
    if not os.path.exists(bpe_path):
        base = spark.range(0, N_BPE_DOCS, 1, 32).withColumnRenamed("id", "doc_id")
        base.select(
            "doc_id", para(F.col("doc_id"), 7, words=16).alias("text")
        ).write.mode("overwrite").parquet(bpe_path)

    docs = spark.read.parquet(docs_path)
    bpe_docs = spark.read.parquet(bpe_path)
    found = {}

    def once() -> float:
        t0 = time.time()
        pairs = allpairs_jaccard_pairs(
            docs, "text", "doc_id", shingle_n=3, threshold=0.7
        )
        found["allpairs_pairs"] = pairs.count()
        vocab = (
            bpe_docs.select(F.explode(word_tokens(F.col("text"))).alias("w"))
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(_char_syms(F.col("w")).alias("syms"), "cnt")
        )
        top = (
            bpe_pair_counts(vocab, "syms", "cnt")
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(5)
            .collect()
        )
        found["bpe_top_pair"] = f"{top[0]['pair']}:{top[0]['cnt']}"
        return time.time() - t0

    once()  # warm codegen + shuffle services
    runs = [round(once(), 2) for _ in range(3)]
    print(json.dumps({
        "cpus": cpus, "pair_docs": N_PAIR_DOCS, "bpe_docs": N_BPE_DOCS,
        "runs": runs, "sec": min(runs),
        "rows_per_sec": round((N_PAIR_DOCS + N_BPE_DOCS) / min(runs), 1),
        "allpairs_pairs": found["allpairs_pairs"],
        "bpe_top_pair": found["bpe_top_pair"],
        "load": os.getloadavg(),
    }))
    spark.stop()


def main() -> None:
    out = {}
    for cpus in (2, 8):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(cpus)],
            capture_output=True, text=True, check=True,
        )
        out[cpus] = json.loads(r.stdout.strip().splitlines()[-1])
        print(json.dumps(out[cpus]), flush=True)
    eff = out[8]["rows_per_sec"] / out[2]["rows_per_sec"] / 4.0
    same = (
        out[8]["allpairs_pairs"] == out[2]["allpairs_pairs"]
        and out[8]["bpe_top_pair"] == out[2]["bpe_top_pair"]
    )
    print(json.dumps({
        "efficiency_n_to_4n": round(eff, 3),
        "results_match_across_levels": same,
    }))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
    else:
        main()
