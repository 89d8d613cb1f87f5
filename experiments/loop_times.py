"""Per-stage/job breakdown of the bench.py frontier crawl (100k URLs).

Where does the ~58 s go? Parses the event log: job wall times grouped by
call site, plus inter-job driver gaps.
"""

import json
import os
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from httrack2warc_spark import get_spark

evdir = tempfile.mkdtemp(prefix="spark-events")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
aqe = os.environ.get("LAB_AQE", "true")
compact = int(os.environ.get("LAB_COMPACT", "6"))
spark = get_spark(
    app_name="loop-times", master=f"local[{cpus}]", shuffle_partitions=32,
    extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.sql.adaptive.enabled": aqe,
        "spark.eventLog.compress": "false",
        "spark.eventLog.dir": f"file://{evdir}",
    },
)
spark.sparkContext.setLogLevel("ERROR")

from httrack2warc_spark.frontier import CrawlConfig, FrontierScheduler, generate_web
from httrack2warc_spark.sinks.tables import TableCatalog

web, seeds = generate_web(
    spark,
    n_hosts=int(os.environ.get("LAB_HOSTS", "50")),
    pages_per_host=int(os.environ.get("LAB_PAGES", "2000")),
    out_degree=int(os.environ.get("LAB_DEGREE", "8")),
    cross_host_every=1,
)
web.pages = web.pages.persist(); web.links = web.links.persist()
web.pages.count(); web.links.count()
cat = TableCatalog(spark, tempfile.mkdtemp(prefix="loop_times_"))
sched = FrontierScheduler(
    spark, cat, web,
    CrawlConfig(num_parts=int(os.environ.get("LAB_PARTS", cpus)), max_rounds=12,
                default_host_budget=int(os.environ.get("LAB_BUDGET", "100000")),
                fetch_robots=False,
                summary_capacity_per_part=500_000, summary_every=3,
                seen_compact_max=compact,
                seq_mode=os.environ.get("LAB_SEQ", "auto"),
                batch_levels=int(os.environ.get("LAB_BATCH", "1")),
                commit_every=int(os.environ.get("LAB_COMMIT_EVERY", "1"))),
)
t_mark = time.time() * 1000
t0 = time.time()
log = sched.run(seeds=seeds)
n = log.count()
wall = time.time() - t0
print(f"# crawl: {n} urls in {wall:.1f}s", file=sys.stderr)
spark.stop()

logf = []
for root, _dirs, files in os.walk(evdir):
    logf += [os.path.join(root, fn) for fn in files
             if "events" in fn and not fn.startswith(".")]
jobs = {}
sites = defaultdict(float)
counts = defaultdict(int)
stage2job = {}
with open(sorted(logf)[0]) as f:
    for line in f:
        ev = json.loads(line)
        t = ev.get("Event")
        if t == "SparkListenerJobStart" and ev["Submission Time"] >= t_mark:
            jid = ev["Job ID"]
            desc = ev.get("Properties", {}).get("spark.job.description") or "?"
            jobs[jid] = {"site": desc, "sub": ev["Submission Time"]}
        elif t == "SparkListenerJobEnd" and ev["Job ID"] in jobs:
            j = jobs[ev["Job ID"]]
            j["end"] = ev["Completion Time"]
            sites[j["site"]] += (j["end"] - j["sub"]) / 1000
            counts[j["site"]] += 1

done = [j for j in jobs.values() if "end" in j]
done.sort(key=lambda j: j["sub"])
total_job = sum(j["end"] - j["sub"] for j in done) / 1000
# account for overlap: merged busy intervals
busy = 0
cur_s, cur_e = None, None
for j in done:
    if cur_e is None or j["sub"] > cur_e:
        if cur_e is not None:
            busy += cur_e - cur_s
        cur_s, cur_e = j["sub"], j["end"]
    else:
        cur_e = max(cur_e, j["end"])
if cur_e is not None:
    busy += cur_e - cur_s
print(f"\nwall {wall:.1f}s; {len(done)} jobs; sum job walls {total_job:.1f}s; "
      f"merged busy {busy/1000:.1f}s; driver-only gaps {wall - busy/1000:.1f}s")
for site, sec in sorted(sites.items(), key=lambda kv: -kv[1])[:25]:
    print(f"{sec:8.2f}s  n={counts[site]:3d}  {site}")

# gap attribution: idle spans > 200 ms labeled by the jobs on either side
print("\nlargest driver-only gaps (prev-job -> next-job):")
gaps = []
prev = None
for j in done:
    if prev is not None and j["sub"] > prev["end"] + 200:
        gaps.append(((j["sub"] - prev["end"]) / 1000, prev["site"], j["site"]))
    if prev is None or j["end"] > prev["end"]:
        prev = j
for sec, a, b in sorted(gaps, reverse=True)[:12]:
    print(f"{sec:8.2f}s  {a} -> {b}")
