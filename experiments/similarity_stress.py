"""Scale-stress for the similarity/dedup family (BENCH/BASELINE.md §4).

Skew-adversarial synthetic corpus at increasing row counts: 50% of the
documents share one degenerate hot 3-gram phrase (the classic stop-shingle /
hot-LSH-bucket hazard — uncapped, that single shingle alone emits
(n/2)² join pairs), 10% are exact duplicates, 10% near-duplicate partners.
Each op runs with its production caps (max_shingle_df / max_bucket_size /
exact-dup pre-collapse) and we record, per scale:

  - wall seconds (rows-vs-wall curve should be ~linear — the caps turn the
    d² blowup into bounded work),
  - per-task duration median / p99 / max from the event log (straggler
    check: p99 must stay within ~10× median — skew is capped, not shuffled
    into one reducer).

Run: python experiments/similarity_stress.py  (local[8]; ~3-5 min)
"""

import json
import os
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from httrack2warc_spark import get_spark

SCALES = [int(x) for x in os.environ.get("STRESS_SCALES", "20000,40000,80000").split(",")]
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "8")
DIM = 32

evdir = tempfile.mkdtemp(prefix="stress-events")
spark = get_spark(
    app_name="similarity-stress", master=f"local[{CPUS}]", shuffle_partitions=32,
    extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.compress": "false",
        "spark.eventLog.dir": f"file://{evdir}",
    },
)
spark.sparkContext.setLogLevel("ERROR")

from httrack2warc_spark.operators.dedup import (  # noqa: E402
    connected_components,
    embedding_neardup_lsh,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_dedup,
)

HOT = "the quick brown fox says hello"  # 50% of docs open with this phrase


def gen_docs(n: int):
    """Deterministic skewed corpus, pure Column construction (no driver rows):
    12 'random' vocab words per doc via xxhash64(doc_id, k); doc_id%10==1 →
    exact duplicate of doc_id−1; doc_id%10==3 → near-dup of doc_id−1 (one
    word changed); doc_id%2==0 → hot shingle prefix."""
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

    # the "partner" id collapses dup/near-dup rows onto their predecessor
    partner = F.when(F.col("doc_id") % 10 == 1, F.col("doc_id") - 1).otherwise(
        F.col("doc_id")
    )
    near = F.col("doc_id") % 10 == 3
    body = F.when(
        near,
        F.concat(words(F.col("doc_id") - 1), F.lit(" changed")),
    ).otherwise(words(partner))
    text = F.when(
        (partner % 2 == 0) | (near & ((F.col("doc_id") - 1) % 2 == 0)),
        F.concat(F.lit(HOT + " "), body),
    ).otherwise(body)
    return base.select("doc_id", text.alias("text"))


def gen_embeddings(n: int):
    """vec_id%5==1 → near-dup of vec_id−1 (tiny perturbation); else a
    deterministic pseudo-random unit-ish vector."""
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
    """Evaluate without letting count() prune the expression pipeline
    (modulo keeps the ANSI-mode sum inside long range)."""
    cols = [
        F.sum(F.xxhash64(F.col(c).cast("string")) % F.lit(1_000_000_007))
        for c in df.columns[:2]
    ]
    df.agg(*cols).collect()


def timed(desc, fn):
    spark.sparkContext.setJobDescription(desc)
    t0 = time.time()
    fn()
    dt = time.time() - t0
    spark.sparkContext.setJobDescription(None)
    return round(dt, 2)


results = []
# JVM/codegen warmup so the first measured scale isn't paying first-run costs
_w = gen_docs(2000).persist()
force(minhash_lsh_dedup(_w, "text", "doc_id", num_hashes=64, shingle_n=3,
                        bands=16, rows_per_band=4, threshold=0.7,
                        max_bucket_size=1000))
force(simhash_dedup(_w, "text", "doc_id", shingle_n=3, hamming_threshold=3,
                    blocks=4))
_w.unpersist()

for n in SCALES:
    docs = gen_docs(n).persist()
    emb = gen_embeddings(n).persist()
    docs.count(), emb.count()
    row = {"rows": n}
    row["minhash"] = timed(f"minhash@{n}", lambda: force(
        minhash_lsh_dedup(docs, "text", "doc_id", num_hashes=64, shingle_n=3,
                          bands=16, rows_per_band=4, threshold=0.7,
                          max_bucket_size=1000)))
    row["simhash"] = timed(f"simhash@{n}", lambda: force(
        simhash_dedup(docs, "text", "doc_id", shingle_n=3,
                      hamming_threshold=3, blocks=4)))
    pairs = ngram_jaccard_pairs(docs, "text", "doc_id", shingle_n=3,
                                threshold=0.5, max_shingle_df=1000)
    row["ngram_jaccard"] = timed(f"ngram@{n}", lambda: force(pairs))
    # bits sized to the corpus (docstring guidance: raise bits at scale so
    # buckets stay small) — 2^12 buckets/table keeps ~n/4096 rows per bucket;
    # the cap then only removes genuinely degenerate buckets instead of all
    row["embedding_neardup"] = timed(f"embneardup@{n}", lambda: force(
        embedding_neardup_lsh(emb, "v", "vec_id", threshold=0.98,
                              bits=12, num_tables=8, max_bucket_size=2000)))
    row["connected_components"] = timed(f"cc@{n}", lambda: force(
        connected_components(pairs)))
    docs.unpersist(), emb.unpersist()
    results.append(row)
    print(json.dumps(row), flush=True)

spark.stop()

# ---- event-log task-straggler stats per op ---------------------------------
logf = []
for root, _dirs, files in os.walk(evdir):
    logf += [os.path.join(root, fn) for fn in files
             if "events" in fn and not fn.startswith(".")]
stage2desc = {}
stage_tasks = defaultdict(list)  # (desc, stage_id) -> task ms
with open(sorted(logf)[0]) as f:
    for line in f:
        ev = json.loads(line)
        t = ev.get("Event")
        if t == "SparkListenerJobStart":
            desc = ev.get("Properties", {}).get("spark.job.description")
            if desc and "@" in desc:
                for sid in ev["Stage IDs"]:
                    stage2desc[sid] = desc
        elif t == "SparkListenerTaskEnd":
            sid = ev.get("Stage ID")
            desc = stage2desc.get(sid)
            info = ev.get("Task Info", {})
            if desc and "Finish Time" in info:
                stage_tasks[(desc, sid)].append(
                    info["Finish Time"] - info["Launch Time"]
                )


def pct(xs, p):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(p * (len(xs) - 1)))]


# Straggler check WITHIN each stage (comparing tasks across stages of
# different weight is meaningless): report, per op, the worst max/median
# ratio among its stages with >= 8 tasks — a capped-skew plan keeps every
# stage's slowest task within single-digit multiples of its median.
straggler = {}
for (desc, sid), ds in stage_tasks.items():
    if len(ds) < 8:
        continue
    med = pct(ds, 0.5) or 1
    ratio = round(max(ds) / med, 1)
    cur = straggler.get(desc)
    if cur is None or ratio > cur["max_over_med"]:
        straggler[desc] = {
            "worst_stage": sid, "n_tasks": len(ds), "med_ms": med,
            "max_ms": max(ds), "max_over_med": ratio,
        }
for desc in sorted(straggler):
    print(desc, json.dumps(straggler[desc]), flush=True)

print(json.dumps({"scales": results, "cpus": int(CPUS)}))
