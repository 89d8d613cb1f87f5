"""Scheduler end-to-end skew stress (BENCH/BASELINE.md §5).

A 2M-URL crawl where ONE host holds 50% of the corpus (hot0: 1M pages;
200 cold hosts × 5k pages) — the Zipf-head shape the per-host politeness
top-k is most exposed to: every hot-host frontier row lands on one reducer
unless the salted two-phase plan engages. Records wall, URLs/s, which
rounds ran salted (from the metrics audit column), and the per-stage
straggler ratio (max task / median task) from the event log.

Run: python experiments/scheduler_skew_stress.py   (env: SPARK_GRAFT_CPUS)
"""

import json
import os
import statistics
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from httrack2warc_spark import get_spark

evdir = tempfile.mkdtemp(prefix="skew-events")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark(
    app_name="skew-stress", master=f"local[{cpus}]", shuffle_partitions=32,
    extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.compress": "false",
        "spark.eventLog.dir": f"file://{evdir}",
    },
)
spark.sparkContext.setLogLevel("ERROR")

from httrack2warc_spark.frontier import CrawlConfig, FrontierScheduler, generate_web
from httrack2warc_spark.frontier.synth import SyntheticWeb
from httrack2warc_spark.sinks.tables import TableCatalog

hot, hot_seeds = generate_web(spark, 1, 1_000_000, out_degree=12,
                              cross_host_every=0, host_prefix="hot")
cold, cold_seeds = generate_web(spark, 200, 5_000, out_degree=12,
                                cross_host_every=1)
web = SyntheticWeb(hot.pages.unionByName(cold.pages),
                   hot.links.unionByName(cold.links))
web.pages = web.pages.persist(); web.links = web.links.persist()
n_pages = web.pages.count(); web.links.count()
print(f"# corpus: {n_pages} pages, hot host = 50%", file=sys.stderr)

cat = TableCatalog(spark, tempfile.mkdtemp(prefix="skew_"))
sched = FrontierScheduler(
    spark, cat, web,
    CrawlConfig(num_parts=32, max_rounds=10, default_host_budget=1_000_000,
                fetch_robots=False, summary_capacity_per_part=200_000,
                summary_every=3, seq_mode="ranged", commit_every=2,
                salted_topk="auto"),
)
t_mark = time.time() * 1000
t0 = time.time()
log = sched.run(seeds=hot_seeds + cold_seeds)
n = log.count()
wall = time.time() - t0
hot_fetched = log.where("host = 'hot0.example.com'").count()
salted_rounds = sorted(
    r.round for r in cat.read("metrics").where("salted").select("round")
    .distinct().collect()
)
spark.stop()

# ---- straggler audit from the event log -----------------------------------
logf = []
for root, _dirs, files in os.walk(evdir):
    logf += [os.path.join(root, fn) for fn in files
             if "events" in fn and not fn.startswith(".")]
stage_tasks = defaultdict(list)
with open(sorted(logf)[0]) as f:
    for line in f:
        ev = json.loads(line)
        if ev.get("Event") != "SparkListenerTaskEnd":
            continue
        info = ev.get("Task Info", {})
        if info.get("Launch Time", 0) < t_mark or info.get("Failed"):
            continue
        stage_tasks[ev["Stage ID"]].append(
            info["Finish Time"] - info["Launch Time"]
        )

worst = (0.0, None, 0, 0.0, 0.0)  # ratio, stage, n, med, max
for sid, durs in stage_tasks.items():
    # stages too small/fast to straggle meaningfully are noise, not signal
    if len(durs) < 8:
        continue
    med = statistics.median(durs)
    if med < 100:  # ms
        continue
    ratio = max(durs) / med
    if ratio > worst[0]:
        worst = (ratio, sid, len(durs), med, max(durs))

print(json.dumps({
    "pages": n_pages, "urls": n, "hot_fetched": hot_fetched,
    "sec": round(wall, 2), "urls_per_sec": round(n / wall, 1),
    "salted_rounds": salted_rounds,
    "worst_stage": {"stage": worst[1], "n_tasks": worst[2],
                    "median_ms": round(worst[3], 1),
                    "max_ms": round(worst[4], 1),
                    "max_over_median": round(worst[0], 2)},
    "cpus": int(cpus),
    "load_avg_1m": round(os.getloadavg()[0], 1),
}))
