"""N vs 4N parallelism scaling for the retrieval/mining family
(BENCH/BASELINE.md §4e): Okapi BM25 ranking over a 1M-document corpus and
mutual nearest-neighbor mining over 200k embeddings, at local[2] and
local[8], fresh JVM per level, warm-up pass + min-of-3 measured — the
noise protocol of bench_scaling.py / image_scaling.py.

Hazards each op is built to hit:

  - **BM25 with a hot query term**: the query deliberately includes
    ``cookies`` (present in ~every document via the cookie-banner line) next
    to two rare ``w###`` vocabulary terms — the hot term pushes one
    (id, term) count per document through the aggregate, the worst case for
    the "only query-term hits shuffle" claim. Narrow 16-byte rows with
    map-side partial counts are why it must still scale.
  - **mutual_nn at 200k vectors**: the §9 sizing rule applies (bits and
    max_bucket_size sized together against candidate volume); the argmax
    window and the (src, dst) mutuality self-join both shuffle 24-byte
    edges, never vectors. 200k rows is the §4d protocol floor — below that,
    fixed job latency dominates and the ratio measures nothing.

Run: python experiments/retrieval_scaling.py
Child mode: python experiments/retrieval_scaling.py --child <cpus>
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("SCALE_DOCS", "1000000"))
N_VECS = int(os.environ.get("SCALE_VECS", "200000"))
DIM = 32


def child(cpus: int) -> None:
    from pyspark.sql import functions as F

    from httrack2warc_spark import get_spark
    from httrack2warc_spark.operators.corpus import bm25_topk
    from httrack2warc_spark.operators.similarity import mutual_nn_pairs

    spark = get_spark(
        app_name=f"retrieval-scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 4, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    def para(src, salt):
        return F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit("w"),
                    (F.abs(F.xxhash64(src, F.lit(salt * 100 + k))) % 8000)
                    .cast("string"),
                )
                for k in range(12)
            ],
        )

    # parquet sources shared across levels (generated once, 32 partitions so
    # both levels measure the same task granularity)
    docs_path = f"/tmp/retrieval_scaling_docs_{N_DOCS}.parquet"
    if not os.path.exists(docs_path):
        base = spark.range(0, N_DOCS, 1, 32).withColumnRenamed("id", "doc_id")
        text = F.concat(
            para(F.col("doc_id"), 1),
            F.lit(" this site uses cookies variant "),
            (F.col("doc_id") % 13).cast("string"),
            F.lit(" "),
            para(F.col("doc_id"), 2),
        )
        base.select("doc_id", text.alias("text")).write.mode(
            "overwrite"
        ).parquet(docs_path)
    vecs_path = f"/tmp/retrieval_scaling_vecs_{N_VECS}.parquet"
    if not os.path.exists(vecs_path):
        base = spark.range(0, N_VECS, 1, 32).withColumnRenamed("id", "vec_id")
        anchor = F.when(
            F.col("vec_id") % 5 == 1, F.col("vec_id") - 1
        ).otherwise(F.col("vec_id"))
        eps = F.when(F.col("vec_id") % 5 == 1, F.lit(0.01)).otherwise(F.lit(0.0))
        vec = F.array(
            *[
                ((F.abs(F.xxhash64(anchor, F.lit(k))) % 1000) / 500.0 - 1.0)
                + eps
                * ((F.abs(F.xxhash64(F.col("vec_id"), F.lit(1000 + k))) % 100)
                   / 100.0)
                for k in range(DIM)
            ]
        )
        base.select("vec_id", vec.alias("v")).write.mode("overwrite").parquet(
            vecs_path
        )
    docs = spark.read.parquet(docs_path)
    vecs = spark.read.parquet(vecs_path)

    pairs_found = {}

    def once() -> float:
        t0 = time.time()
        # BM25: hot term + two rare terms; 20-row result is its own force
        bm25_topk(docs, "text", "doc_id", ["cookies", "w10", "w999"], k=20
                  ).collect()
        # mutual NN: §9-sized LSH (bits/cap together), force via checksum
        mnn = mutual_nn_pairs(
            vecs, "v", "vec_id", threshold=0.9, bits=16, num_tables=32,
            max_bucket_size=500,
        )
        pairs_found["mutual_nn"] = mnn.count()
        return time.time() - t0

    once()  # warm codegen + Python workers
    runs = [round(once(), 2) for _ in range(3)]
    print(json.dumps({
        "cpus": cpus, "docs": N_DOCS, "vecs": N_VECS, "runs": runs,
        "sec": min(runs), "rows_per_sec": round(N_DOCS / min(runs), 1),
        "mutual_nn_pairs": pairs_found["mutual_nn"],
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
    same = out[8]["mutual_nn_pairs"] == out[2]["mutual_nn_pairs"]
    print(json.dumps({
        "efficiency_n_to_4n": round(eff, 3),
        "pairs_match_across_levels": same,
    }))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
    else:
        main()
