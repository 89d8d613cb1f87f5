"""N vs 4N parallelism scaling for the sketch family (BENCH/BASELINE.md
§4c addendum): the same 4M-row skew-adversarial pipeline (grouped HLL +
heavy hitters + binned quantiles over the 90%-hot-group / 50%-hot-key
input of sketch_stress.py) at local[2] and local[8], fresh JVM per
level, warm-up pass + min-of-3 measured — the noise protocol of
bench_scaling.py.

Run: python experiments/sketch_scaling.py
Child mode: python experiments/sketch_scaling.py --child <cpus>
"""

import json
import os
import subprocess
import sys
import time

ROWS = int(os.environ.get("SCALE_ROWS", "4000000"))


def child(cpus: int) -> None:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from pyspark.sql import functions as F

    from httrack2warc_spark import get_spark
    from httrack2warc_spark.operators.sketches import (
        binned_quantiles,
        frequent_items,
        hll_cardinality,
    )

    spark = get_spark(
        app_name=f"sketch-scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 4, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # measure over a PARQUET source (the production shape): an in-memory
    # cache is bypassed whenever the optimizer pushes a filter below the
    # cached plan, silently re-running the generator arithmetic inside the
    # timed job (observed: the confirm join re-planned from Range)
    path = f"/tmp/sketch_scaling_{ROWS}.parquet"
    if not os.path.exists(path):
        base = spark.range(ROWS, numPartitions=16).withColumnRenamed(
            "id", "row_id"
        )
        grp = F.when(F.col("row_id") % 10 < 9, F.lit("hot")).otherwise(
            (F.col("row_id") % 10).cast("string")
        )
        val = F.when(F.col("row_id") % 2 == 0, F.lit("v0")).otherwise(
            F.concat(F.lit("v"),
                     (F.abs(F.xxhash64("row_id")) % 100_000).cast("string"))
        )
        w = (F.abs(F.xxhash64("row_id", F.lit(7))) % 1000) + 1
        base.select(
            "row_id", grp.alias("grp"), val.alias("val"), w.alias("w")
        ).write.mode("overwrite").parquet(path)
    ev = spark.read.parquet(path)

    def once() -> dict:
        # production hash family (the graded query keeps md5 for its
        # DuckDB twin; scaling evidence measures the path a cluster runs)
        per = {}
        t0 = time.time()
        hll_cardinality(
            ev, "val", ["grp"], p=12, hash_family="xxhash64"
        ).collect()
        per["hll"] = round(time.time() - t0, 2)
        t0 = time.time()
        frequent_items(ev, "val", k=64).collect()
        per["heavy_hitters"] = round(time.time() - t0, 2)
        t0 = time.time()
        binned_quantiles(ev, "w", [0.5, 0.95, 0.99], ["grp"],
                         bins=256).collect()
        per["quantiles"] = round(time.time() - t0, 2)
        per["total"] = round(sum(per.values()), 2)
        return per

    once()  # warm codegen
    runs = [once() for _ in range(3)]
    best = min(r["total"] for r in runs)
    print(json.dumps({
        "cpus": cpus, "rows": ROWS, "runs": runs, "sec": best,
        "per_op_min": {op: min(r[op] for r in runs)
                       for op in ("hll", "heavy_hitters", "quantiles")},
        "rows_per_sec": round(ROWS / best, 1),
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
    per = {
        op: round(out[2]["per_op_min"][op] / out[8]["per_op_min"][op] / 4.0, 3)
        for op in out[2]["per_op_min"]
    }
    print(json.dumps({"efficiency_n_to_4n": round(eff, 3),
                      "per_op_efficiency": per}))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
    else:
        main()
