"""N vs 4N parallelism scaling for the fingerprint/phrase family
(BENCH/BASELINE.md §4h): winnowing fingerprint generation over a 1M-doc
corpus (the ZERO-shuffle claim — array-side window minimum via zip_with
over shifted packed-hash copies), MOSS overlap pairs over 200k docs with a
5%-planted copied passage (the fp self-join + hot-fp cap), and positional
phrase search over the same 1M docs (the O(vocabulary hits) shuffle claim)
— at local[2] and local[8], fresh JVM per level, warm-up pass + min-of-3
measured (the bench_scaling.py noise protocol).

Hazards each op is built to hit:

  - **winnow at 1M docs**: fingerprint selection must stay a codegen'd
    scan + narrow explode; any accidental exchange or per-element
    re-evaluation of the packed array turns the curve super-linear.
  - **overlap pairs with a 5% planted passage**: the copied passage's
    fingerprints have df = 10k — far over the max_fp_df=100 cap, so the
    cap must keep them out of the self-join structurally or the join
    explodes to 10^8 pair rows.
  - **phrase search at 1M docs**: the token stream must filter to the
    3-term vocabulary before the anchor aggregation — the measured wall
    is O(hits), which is what makes phrase queries affordable at 100 TB.

Run: python experiments/winnow_scaling.py
Child mode: python experiments/winnow_scaling.py --child <cpus>
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("SCALE_WINNOW_DOCS", "1000000"))
N_PAIR_DOCS = int(os.environ.get("SCALE_WINNOW_PAIR_DOCS", "200000"))

PASSAGE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


def child(cpus: int) -> None:
    from pyspark.sql import functions as F

    from httrack2warc_spark import get_spark
    from httrack2warc_spark.operators.corpus import phrase_search
    from httrack2warc_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_overlap_pairs,
    )

    spark = get_spark(
        app_name=f"winnow-scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 4, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    def para(src, salt, words=24):
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

    docs_path = f"/tmp/winnow_scaling_docs_{N_DOCS}.parquet"
    if not os.path.exists(docs_path):
        base = spark.range(0, N_DOCS, 1, 32).withColumnRenamed("id", "doc_id")
        # 1% of docs carry the exact phrase; body is unique per doc
        body = para(F.col("doc_id"), 3)
        text = F.when(
            F.col("doc_id") % 100 == 7,
            F.concat(body, F.lit(" data line join tail")),
        ).otherwise(body)
        base.select("doc_id", text.alias("text")).write.mode(
            "overwrite"
        ).parquet(docs_path)
    pair_path = f"/tmp/winnow_scaling_pairs_{N_PAIR_DOCS}.parquet"
    if not os.path.exists(pair_path):
        base = spark.range(0, N_PAIR_DOCS, 1, 32).withColumnRenamed(
            "id", "doc_id"
        )
        # 5% of docs embed the identical copied passage mid-document —
        # its fingerprints are boilerplate (df ~ 10k) the cap must drop;
        # 1% pairs share a UNIQUE passage (the signal the join must keep)
        shared = F.concat(
            para(F.col("doc_id"), 5, words=10),
            F.lit(" " + PASSAGE + " "),
            para(F.col("doc_id"), 6, words=10),
        )
        paired = F.concat(
            para(F.col("doc_id") - (F.col("doc_id") % 2), 8, words=10),
            F.lit(" end"),
        )
        text = (
            F.when(F.col("doc_id") % 20 == 11, shared)
            .when(F.col("doc_id") % 100 < 2, paired)
            .otherwise(para(F.col("doc_id"), 9, words=20))
        )
        base.select("doc_id", text.alias("text")).write.mode(
            "overwrite"
        ).parquet(pair_path)

    docs = spark.read.parquet(docs_path)
    pair_docs = spark.read.parquet(pair_path)
    found = {}

    def once() -> float:
        t0 = time.time()
        fps = winnow_fingerprints(docs, "text", "doc_id", shingle_n=3, window=4)
        # agg over a hash of every column: count() would prune the
        # projection and skip the md5/min work entirely
        found["winnow_hash"] = fps.agg(
            F.sum(F.hash("doc_id", "pos", "fp"))
        ).collect()[0][0]
        pairs = winnow_overlap_pairs(
            pair_docs, "text", "doc_id",
            shingle_n=3, window=4, min_shared=2, max_fp_df=100,
        )
        found["overlap_pairs"] = pairs.count()
        hits = phrase_search(docs, "text", "doc_id", ["data", "line", "join"])
        found["phrase_hits"] = hits.count()
        return time.time() - t0

    once()  # warm codegen + shuffle services
    runs = [round(once(), 2) for _ in range(3)]
    print(json.dumps({
        "cpus": cpus, "docs": N_DOCS, "pair_docs": N_PAIR_DOCS,
        "runs": runs, "sec": min(runs),
        "rows_per_sec": round((N_DOCS * 2 + N_PAIR_DOCS) / min(runs), 1),
        "winnow_hash": found["winnow_hash"],
        "overlap_pairs": found["overlap_pairs"],
        "phrase_hits": found["phrase_hits"],
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
    same = all(
        out[8][k] == out[2][k]
        for k in ("winnow_hash", "overlap_pairs", "phrase_hits")
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
