"""N vs 4N parallelism scaling for the image-kernel family
(BENCH/BASELINE.md §4d): the graded image pipeline's production ops —
Arrow-batched decode → feature extraction (per-channel stats, luminance
histogram, 64-bit pHash), bilinear resize + re-encode, and the salted
pHash near-dup bucket count — over a parquet image+caption table
(BASELINE.json input_hint shape), at local[2] and local[8], fresh JVM per
level, warm-up pass + min-of-3 measured: the noise protocol of
bench_scaling.py / sketch_scaling.py.

Why this family needs its own evidence: every kernel here is a Python
(pandas/numpy) stage, so its scaling is bounded by Python-worker fan-out,
not JVM codegen — the AQE advisory-partition sizing note in the build
notes (8 MB, not the 64 MB default) exists exactly so these Arrow batches
spread across workers instead of coalescing onto a few fat partitions.

Run: python experiments/image_scaling.py
Child mode: python experiments/image_scaling.py --child <cpus>
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_IMAGES = int(os.environ.get("SCALE_IMAGES", "50000"))


def child(cpus: int) -> None:
    from pyspark.sql import functions as F

    from httrack2warc_spark import get_spark
    from httrack2warc_spark.frontier.synth import generate_images
    from httrack2warc_spark.functions.images import image_features, resize_images

    spark = get_spark(
        app_name=f"image-scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 4, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # measure over a PARQUET source (the production shape — see
    # sketch_scaling.py for why an in-memory cache is not trustworthy
    # under filter pushdown). Partition count fixed across levels so both
    # measure the same task granularity.
    path = f"/tmp/image_scaling_{N_IMAGES}.parquet"
    if not os.path.exists(path):
        generate_images(spark, N_IMAGES, num_partitions=32).write.mode(
            "overwrite"
        ).parquet(path)
    imgs = spark.read.parquet(path)

    def once() -> float:
        t0 = time.time()
        # features: decode + stats + pHash, forced through a checksum agg
        # (count() prunes the projection — build notes)
        image_features(imgs).agg(
            F.sum(F.hash("phash", "std_lum")).alias("chk")
        ).collect()
        # resize: decode + bilinear + re-encode; checksum over payload size
        resize_images(imgs, 16, 16).agg(
            F.sum(F.length("bytes")).alias("sz")
        ).collect()
        # near-dup bucketing on the stored pHash, salted (synth ramps
        # CLUSTER at hamming-0 — build notes), one exchange
        imgs.groupBy(
            F.xxhash64("phash").alias("b")
        ).count().agg(F.sum(F.hash("b", "count"))).collect()
        return time.time() - t0

    once()  # warm codegen + Python workers
    runs = [round(once(), 2) for _ in range(3)]
    print(json.dumps({
        "cpus": cpus, "images": N_IMAGES, "runs": runs, "sec": min(runs),
        "images_per_sec": round(N_IMAGES / min(runs), 1),
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
    eff = out[8]["images_per_sec"] / out[2]["images_per_sec"] / 4.0
    print(json.dumps({"efficiency_n_to_4n": round(eff, 3)}))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
    else:
        main()
