"""Scale-stress for the sketch/approximate family (BENCH/BASELINE.md §4c).

Skew-adversarial inputs at doubling row counts:

- hll: 90% of rows land in ONE group (hot event type) — the register
  design must keep that group's shuffle at m rows, not row count; curve
  must stay ~linear (the map-side partial max does the work).
- heavy hitters: 50% of rows are ONE value (the classic hot key) over a
  100k-value tail — Misra-Gries summaries stay O(k) per partition and the
  exact confirm only aggregates candidate rows; the hot key's count rides
  map-side partial combine, not a single reducer.
- weighted sample: linear scan + one TakeOrdered — the control curve.
- interval join: one "burst hour" holds 30% of the points AND every 20th
  interval is 10 buckets long — the explode fan-out and the hot bucket
  must both stay bounded (points in the hot bucket join only the
  intervals overlapping that bucket).

Per scale we record wall seconds; afterwards per-op straggler ratios
(worst max/median task among stages with ≥ 8 tasks) from the event log —
the 100 TB claim is "linear-ish curve + no stage where one task runs away".

Run: python experiments/sketch_stress.py  (local[8]; ~2-4 min)
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

SCALES = [int(x) for x in os.environ.get(
    "STRESS_SCALES", "1000000,2000000,4000000").split(",")]
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "8")

evdir = tempfile.mkdtemp(prefix="sketch-stress-events")
spark = get_spark(
    app_name="sketch-stress", master=f"local[{CPUS}]", shuffle_partitions=32,
    extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.compress": "false",
        "spark.eventLog.dir": f"file://{evdir}",
    },
)
spark.sparkContext.setLogLevel("ERROR")

from httrack2warc_spark.operators.interval import interval_join  # noqa: E402
from httrack2warc_spark.operators.sketches import (  # noqa: E402
    binned_quantiles,
    frequent_items,
    hll_cardinality,
    weighted_sample,
)


def gen_events(n: int):
    """90% of rows in group 'hot'; values drawn from a 100k universe with a
    50%-mass hot value v0 (pure Column, no driver rows)."""
    base = spark.range(n).withColumnRenamed("id", "row_id")
    grp = F.when(F.col("row_id") % 10 < 9, F.lit("hot")).otherwise(
        (F.col("row_id") % 10).cast("string")
    )
    val = F.when(
        F.col("row_id") % 2 == 0, F.lit("v0")
    ).otherwise(
        F.concat(F.lit("v"), (F.abs(F.xxhash64("row_id")) % 100_000)
                 .cast("string"))
    )
    w = (F.abs(F.xxhash64("row_id", F.lit(7))) % 1000) + 1
    return base.select("row_id", grp.alias("grp"), val.alias("val"),
                       w.alias("w"))


def gen_points_intervals(n: int):
    """n points over 100 'hours'; hour 42 holds 30% of them. n/100
    intervals of 1 bucket, every 20th stretched to 10 buckets."""
    W = 3600
    pts = spark.range(n).select(
        F.col("id").alias("pid"),
        F.when(F.col("id") % 10 < 3, F.lit(42 * W)
               + (F.abs(F.xxhash64("id")) % W))
        .otherwise((F.abs(F.xxhash64("id", F.lit(1))) % (100 * W)))
        .cast("timestamp").alias("ts"),
    )
    iv = spark.range(n // 100).select(
        F.col("id").alias("iid"),
        ((F.abs(F.xxhash64("id", F.lit(2))) % (100 * W)))
        .cast("timestamp").alias("s"),
    ).withColumn(
        "e",
        (F.col("s").cast("double")
         + F.when(F.col("iid") % 20 == 0, 10 * W).otherwise(W))
        .cast("timestamp"),
    )
    return pts, iv


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
_w = gen_events(20_000).persist()
force(hll_cardinality(_w, "val", ["grp"], p=12))
force(frequent_items(_w, "val", k=64))
_w.unpersist()

for n in SCALES:
    ev = gen_events(n).persist()
    ev.count()
    # interval join runs at n/4: BOTH sides grow with n, so its true match
    # count — and thus its honest lower bound of work — grows ~n²; the
    # claim to check is flat cost PER OUTPUT ROW, recorded below
    pts, iv = gen_points_intervals(n // 4)
    pts, iv = pts.persist(), iv.persist()
    pts.count(), iv.count()
    row = {"rows": n}
    row["hll"] = timed(f"hll@{n}", lambda: force(
        hll_cardinality(ev, "val", ["grp"], p=12)))
    row["heavy_hitters"] = timed(f"heavy@{n}", lambda: force(
        frequent_items(ev, "val", k=64)))
    row["weighted_sample"] = timed(f"wsample@{n}", lambda: force(
        weighted_sample(ev, "row_id", "w", k=100)))
    row["quantiles"] = timed(f"quant@{n}", lambda: force(
        binned_quantiles(ev, "w", [0.5, 0.95, 0.99], ["grp"], bins=256)))
    ij = interval_join(pts, iv, "ts", "s", "e", 3600)
    row["interval_join"] = timed(f"ivjoin@{n}", lambda: force(ij))
    row["interval_join_out_rows"] = ij.count()
    ev.unpersist(), pts.unpersist(), iv.unpersist()
    results.append(row)
    print(json.dumps(row), flush=True)

spark.stop()

logf = []
for root, _dirs, files in os.walk(evdir):
    logf += [os.path.join(root, fn) for fn in files
             if "events" in fn and not fn.startswith(".")]
stage2desc = {}
stage_tasks = defaultdict(list)
with open(sorted(logf)[0]) as f:
    for line in f:
        evt = json.loads(line)
        t = evt.get("Event")
        if t == "SparkListenerJobStart":
            desc = evt.get("Properties", {}).get("spark.job.description")
            if desc and "@" in desc:
                for sid in evt["Stage IDs"]:
                    stage2desc[sid] = desc
        elif t == "SparkListenerTaskEnd":
            sid = evt.get("Stage ID")
            desc = stage2desc.get(sid)
            info = evt.get("Task Info", {})
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
