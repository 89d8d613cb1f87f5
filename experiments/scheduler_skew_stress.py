"""Scheduler end-to-end skew stress (BENCH/BASELINE.md §5).

A crawl of a 2M-page corpus where ONE host holds 50% of it (hot0: 1M pages;
200 cold hosts × 5k pages) — the Zipf-head shape the per-host politeness
top-k is most exposed to: every hot-host frontier row lands on one reducer
unless the salted two-phase plan engages. Records wall, URLs/s, which
rounds ran salted (from the metrics audit column), and the per-stage
straggler ratio (max task / median task) from the event log.

The per-host budget (150k) BINDS on the hot host: with a non-binding
budget the scheduler's top-k identity rule (n_frontier ≤ default budget ⇒
no host can exceed it) skips the per-host window entirely, and there is no
top-k reducer to protect — the stress must force the window to exist. The
binding budget also exercises multi-round leftover requeue on the hot host.

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
    CrawlConfig(num_parts=32, max_rounds=12, default_host_budget=150_000,
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
stage_tasks = defaultdict(list)   # sid -> [(duration_ms, input_bytes)]
stage_names = {}
with open(sorted(logf)[0]) as f:
    for line in f:
        ev = json.loads(line)
        if ev.get("Event") == "SparkListenerStageSubmitted":
            si = ev.get("Stage Info", {})
            stage_names[si.get("Stage ID")] = si.get("Stage Name", "")
            continue
        if ev.get("Event") != "SparkListenerTaskEnd":
            continue
        info = ev.get("Task Info", {})
        if info.get("Launch Time", 0) < t_mark or info.get("Failed"):
            continue
        tm = ev.get("Task Metrics") or {}
        nbytes = (
            (tm.get("Shuffle Read Metrics") or {}).get("Local Bytes Read", 0)
            + (tm.get("Shuffle Read Metrics") or {}).get("Remote Bytes Read", 0)
            + (tm.get("Input Metrics") or {}).get("Bytes Read", 0)
        )
        stage_tasks[ev["Stage ID"]].append(
            (info["Finish Time"] - info["Launch Time"], nbytes)
        )

scored = []
for sid, rows in stage_tasks.items():
    durs = [d for d, _ in rows]
    # stages too small/fast to straggle meaningfully are noise, not signal
    if len(durs) < 8:
        continue
    med = statistics.median(durs)
    if med < 100:  # ms
        continue
    i_max = max(range(len(durs)), key=lambda i: durs[i])
    byt = [b for _, b in rows]
    med_b = statistics.median(byt)
    # bytes ratio of the slowest task separates DATA skew (slow task read
    # proportionally more) from co-tenant noise (slow task, even bytes)
    scored.append({
        "stage": sid, "n_tasks": len(durs),
        "median_ms": round(med, 1), "max_ms": round(max(durs), 1),
        "max_over_median": round(max(durs) / med, 2),
        "slowest_task_bytes_over_median": (
            round(byt[i_max] / med_b, 2) if med_b else None
        ),
        "name": stage_names.get(sid, "")[:80],
    })
scored.sort(key=lambda s: -s["max_over_median"])

print(json.dumps({
    "pages": n_pages, "urls": n, "hot_fetched": hot_fetched,
    "sec": round(wall, 2), "urls_per_sec": round(n / wall, 1),
    "salted_rounds": salted_rounds,
    "worst_stages": scored[:3],
    "cpus": int(cpus),
    "load_avg_1m": round(os.getloadavg()[0], 1),
}))
