"""Per-stage wall/CPU breakdown of the dataflow at one parallelism level.

Runs one repetition of the scaling-lab variant with Spark event logging on,
then parses the event log: for each stage, wall time (completion − submission)
and the sum of task run times. Stages whose wall time doesn't shrink with
cores are the serial fraction.

Usage: python experiments/stage_times.py <variant> <cpus> [n_cand]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

variant, cpus = sys.argv[1], sys.argv[2]
N_CAND = int(sys.argv[3]) if len(sys.argv) > 3 else 8_000_000
N_SEEN, N_HOSTS, PARTS = N_CAND // 2, 10_000, 64

evdir = tempfile.mkdtemp(prefix="spark-events")

from httrack2warc_spark import get_spark
from pyspark.sql import functions as F

spark = get_spark(
    app_name=f"stagetimes-{variant}-{cpus}", master=f"local[{cpus}]",
    shuffle_partitions=64,
    extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.compress": "false",
        "spark.eventLog.dir": f"file://{evdir}",
    },
)
spark.sparkContext.setLogLevel("ERROR")

from httrack2warc_spark.functions.urls import (
    canonicalize_urls_udf, strip_protocol_col, url_host_col)
from httrack2warc_spark.operators.seen import (
    add_partition_and_hashes, build_summaries, filter_new_urls)
from httrack2warc_spark.operators.topk import per_key_topk
from httrack2warc_spark.operators.sequence import with_global_seq

seen = spark.range(N_SEEN).select(
    F.concat(F.lit("host"), (F.col("id") % N_HOSTS).cast("string"),
             F.lit(".example.com/p/"), F.col("id").cast("string")).alias("url_key"))
summaries = build_summaries(
    add_partition_and_hashes(seen, "url_key", PARTS), PARTS,
    capacity_per_part=max(N_SEEN // PARTS * 2, 1000)).persist()
summaries.count()
if variant in ("C", "D"):
    seen = seen.repartition(64, "url_key")
seen = seen.persist(); seen.count()

raw = spark.range(N_CAND).select(
    (F.col("id") % (N_SEEN * 2)).alias("k"), F.col("id").alias("ord"))
raw = raw.select(
    F.concat(F.lit("HTTP://Host"), (F.col("k") % N_HOSTS).cast("string"),
             F.lit(".Example.COM:80/p/../p/"), F.col("k").cast("string")).alias("dst_url"),
    F.col("ord"))

# warmup rep (JIT, worker pool), then the measured rep
for rep in range(2):
    t0 = time.time()
    cand = (raw.withColumn("url", canonicalize_urls_udf("dst_url"))
            .withColumn("url_key", strip_protocol_col(F.col("url")))
            .withColumn("host", url_host_col(F.col("url"))))
    new = filter_new_urls(cand, seen, summaries, "url_key", PARTS,
                          dedup_order=["ord"])
    sel = per_key_topk(new, "host", [F.col("ord"), F.col("url")], 2000)
    caches = []
    if rep == 1:
        spark.sparkContext.setJobGroup("measured", "measured rep")
        t_mark = time.time() * 1000
    out = with_global_seq(sel, [F.col("ord"), F.col("url")], mode="ranged",
                          num_partitions=64, cache_handle=caches)
    n = out.count()
    dt = time.time() - t0
    for c in caches:
        c.unpersist(blocking=True)
    print(f"# rep{rep}: {dt:.2f}s n={n}", file=sys.stderr)

spark.stop()

# parse the event log
stages = {}
jobs = []
logf = []
for root, _dirs, files in os.walk(evdir):
    logf += [os.path.join(root, fn) for fn in files
             if "events" in fn and not fn.startswith(".")]
with open(sorted(logf)[0]) as f:
    for line in f:
        ev = json.loads(line)
        t = ev.get("Event")
        if t == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sub = si.get("Submission Time")
            comp = si.get("Completion Time")
            if sub and comp and sub >= t_mark:
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"].split("\n")[0][:70],
                    "wall_ms": comp - sub,
                    "sub": sub,
                    "tasks": si["Number of Tasks"],
                }
        elif t == "SparkListenerJobEnd":
            jobs.append(ev)

total_wall = sum(s["wall_ms"] for s in stages.values())
print(f"\n== variant {variant} cpus {cpus}: measured rep {dt:.2f}s, "
      f"sum stage walls {total_wall/1000:.2f}s ==")
for sid in sorted(stages, key=lambda s: stages[s]["sub"]):
    s = stages[sid]
    print(f"stage {sid:3d} wall {s['wall_ms']/1000:7.2f}s tasks {s['tasks']:3d}  {s['name']}")
# gaps between stages = driver/planning time
ordered = sorted(stages.values(), key=lambda s: s["sub"])
gaps = 0
for a, b in zip(ordered, ordered[1:]):
    g = b["sub"] - (a["sub"] + a["wall_ms"])
    if g > 0:
        gaps += g
print(f"inter-stage gap total (driver/planning/collect): {gaps/1000:.2f}s")
