"""Scale-stress for the corpus-prep family (BENCH/BASELINE.md §4b).

Skew-adversarial synthetic corpus at increasing row counts, built to hit
each operator's hazard:

  - **50% of documents share one hot boilerplate paragraph** — for
    paragraph-level dedup that is one paragraph key carrying n/2 rows
    through the stats aggregate and the join back (the hot-key shuffle
    hazard; `max_df` drops it from the OUTPUT but the plan still has to
    move and aggregate its occurrences);
  - mod-13 cookie/copyright paragraphs give a band of medium-df keys;
  - every doc also carries 3 pseudo-random paragraphs (12 vocab words
    each via xxhash64) so the distinct-paragraph side stays large;
  - the decontamination benchmark shares 4-grams with ~1 in 23 docs.

Per scale we record wall seconds (rows-vs-wall should be ~linear) and the
per-stage max/median task-duration ratio from the event log (criterion:
≤10× — skew must be aggregated/capped, not shuffled into one reducer).

Run: python experiments/corpus_stress.py  (local[8]; ~3-5 min)
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

evdir = tempfile.mkdtemp(prefix="corpus-stress-events")
spark = get_spark(
    app_name="corpus-stress", master=f"local[{CPUS}]", shuffle_partitions=32,
    extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.compress": "false",
        "spark.eventLog.dir": f"file://{evdir}",
    },
)
spark.sparkContext.setLogLevel("ERROR")

from httrack2warc_spark.operators.corpus import (  # noqa: E402
    decontaminate,
    dedup_paragraphs,
    pack_sequences,
    redact_pii,
    repetition_topgram_stats,
)

HOT = "subscribe to our newsletter for the latest updates and offers"


def para(src, salt):
    """12 pseudo-random vocab words, pure Column."""
    return F.concat_ws(
        " ",
        *[
            F.concat(
                F.lit("w"),
                (F.abs(F.xxhash64(src, F.lit(salt * 100 + k))) % 8000).cast(
                    "string"
                ),
            )
            for k in range(12)
        ],
    )


def gen_docs(n: int):
    """Deterministic skewed corpus: every doc has 3 unique-ish paragraphs;
    doc_id%2==0 additionally carries the HOT paragraph (50% of the corpus —
    one paragraph key with n/2 occurrences); doc_id%13 selects one of 13
    shared cookie-banner variants (medium-df keys)."""
    base = spark.range(n).withColumnRenamed("id", "doc_id")
    cookie = F.concat(
        F.lit("this site uses cookies variant "),
        (F.col("doc_id") % 13).cast("string"),
    )
    nl = F.lit("\n")
    text = F.concat(
        para(F.col("doc_id"), 1), nl,
        F.when(F.col("doc_id") % 2 == 0, F.lit(HOT + "\n")).otherwise(F.lit("")),
        para(F.col("doc_id"), 2), nl,
        cookie, nl,
        para(F.col("doc_id"), 3),
    )
    return base.select("doc_id", text.alias("text"))


def gen_bench():
    """200 synthetic eval items; each is 20 words drawn from the same
    generator as corpus paragraph salt=1 for doc_ids ≡ 0 (mod 23), so ~1/23
    of the corpus shares 4-grams with the benchmark."""
    base = spark.range(200).withColumnRenamed("id", "bid")
    return base.select(para(F.col("bid") * 23, 1).alias("text"))


def force(df):
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
# warmup: JVM/codegen on a small corpus
_w = gen_docs(2000).persist()
force(dedup_paragraphs(_w, "text", "doc_id", max_df=100))
force(pack_sequences(_w, "text", "doc_id", seq_len=256, mode="ranged"))
_w.unpersist()
bench = gen_bench().persist()
bench.count()

for n in SCALES:
    docs = gen_docs(n).persist()
    docs.count()
    row = {"rows": n}
    row["paragraph_dedup"] = timed(f"paradedup@{n}", lambda: force(
        dedup_paragraphs(docs, "text", "doc_id", max_df=100)))
    row["pack_sequences"] = timed(f"pack@{n}", lambda: force(
        pack_sequences(docs, "text", "doc_id", seq_len=256, mode="ranged")))
    row["decontaminate"] = timed(f"decontam@{n}", lambda: force(
        decontaminate(docs, bench, "text", "doc_id", n=4)))
    row["repetition"] = timed(f"repetition@{n}", lambda: force(
        repetition_topgram_stats(docs, "text", "doc_id")))
    row["pii_redact"] = timed(f"pii@{n}", lambda: force(
        redact_pii(docs, "text")))
    docs.unpersist()
    results.append(row)
    print(json.dumps(row), flush=True)

spark.stop()

# ---- event-log task-straggler stats per op ---------------------------------
logf = []
for root, _dirs, files in os.walk(evdir):
    logf += [os.path.join(root, fn) for fn in files
             if "events" in fn and not fn.startswith(".")]
stage2desc = {}
stage_tasks = defaultdict(list)
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
