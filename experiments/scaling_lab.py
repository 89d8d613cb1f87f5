"""Scaling-efficiency lab: run dataflow variants at two parallelism levels.

Usage: python experiments/scaling_lab.py <variant> <cpus> [n_cand]
Variants:
  A  baseline (round-1 shape)
  B  A + persist the topk output before ranged seq (kills the range-sampler's
     full upstream recompute)
  C  B + seen set pre-hash-partitioned on url_key (models bucketed url_seen
     storage: confirm anti-join reads co-partitioned data, no seen exchange)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

variant, cpus = sys.argv[1], sys.argv[2]
N_CAND = int(sys.argv[3]) if len(sys.argv) > 3 else 8_000_000
N_SEEN, N_HOSTS, PARTS = N_CAND // 2, 10_000, 64

from httrack2warc_spark import get_spark
from pyspark.sql import functions as F

extra = {}
if variant in ("E",):
    # AQE's 64MB advisory size coalesces the ~800MB post-canonicalize shuffle
    # to ~10 partitions — a parallelism cap (1.25 waves at 8 cores, starvation
    # at 32+). 8MB keeps Python-UDF-heavy reduce stages fine-grained.
    extra["spark.sql.adaptive.advisoryPartitionSizeInBytes"] = "8m"
spark = get_spark(app_name=f"lab-{variant}-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=64, extra_conf=extra)
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
if variant in ("C", "D", "E"):
    seen = seen.repartition(64, "url_key")
seen = seen.persist(); seen.count()

raw = spark.range(N_CAND).select(
    (F.col("id") % (N_SEEN * 2)).alias("k"), F.col("id").alias("ord"))
raw = raw.select(
    F.concat(F.lit("HTTP://Host"), (F.col("k") % N_HOSTS).cast("string"),
             F.lit(".Example.COM:80/p/../p/"), F.col("k").cast("string")).alias("dst_url"),
    F.col("ord"))

best, n = None, 0
for rep in range(3):
    t0 = time.time()
    cand = (raw.withColumn("url", canonicalize_urls_udf("dst_url"))
            .withColumn("url_key", strip_protocol_col(F.col("url")))
            .withColumn("host", url_host_col(F.col("url"))))
    new = filter_new_urls(cand, seen, summaries, "url_key", PARTS,
                          dedup_order=["ord"])
    sel = per_key_topk(new, "host", [F.col("ord"), F.col("url")], 2000)
    caches = []
    if variant in ("B",):
        sel = sel.persist()
        caches.append(sel)
    out = with_global_seq(sel, [F.col("ord"), F.col("url")], mode="ranged",
                          num_partitions=64, cache_handle=caches)
    n = out.count()
    dt = time.time() - t0
    for c in caches:
        c.unpersist(blocking=True)
    print(f"# rep{rep}: {dt:.2f}s", file=sys.stderr)
    best = dt if best is None or dt < best else best
print(json.dumps({"variant": variant, "cpus": int(cpus), "candidates": N_CAND,
                  "selected": n, "sec": round(best, 2),
                  "urls_per_sec": round(N_CAND / best, 1)}))
