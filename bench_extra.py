#!/usr/bin/env python
"""Per-query isolation bench (guide §1.4) — NOT the frozen headline bench.

Times individual declared queries with the same count() action bench.py uses
(so numbers are comparable to the driver's board), min-of-N in a warm JVM,
optionally capturing .explain("formatted") to a file.

Usage:
    python bench_extra.py [--sf SF_DIR] [--reps N] [--plans DIR] q1 q2 ...
    python bench_extra.py --all            # every headline query

Prints one JSON line: {"queries": {name: sec}, "sf_dir": ..., "reps": N,
"load": [...]}  plus per-run samples on stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf1.0"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None,
                    help="directory to write <name>.txt explain output")
    ap.add_argument("--suffix", default="", help="plan filename suffix")
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from httrack2warc_spark import get_spark

    spark = get_spark(app_name="bench_extra", master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus) * 2, 16))
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    names = args.names
    if args.all:
        names = [n for n in qs]
    missing = [n for n in names if n not in qs]
    if missing:
        print(f"unknown queries: {missing}", file=sys.stderr)
        sys.exit(2)

    # warm the JVM/IO once
    spark.read.parquet(f"{args.sf}/lineitem.parquet").count()

    if args.plans:
        import io
        from contextlib import redirect_stdout

        os.makedirs(args.plans, exist_ok=True)
        for name in names:
            df = qs[name](spark, args.sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.plans, f"{name}{args.suffix}.txt"),
                      "w") as fh:
                fh.write(buf.getvalue())
            print(f"# wrote plan {name}{args.suffix}", file=sys.stderr)
        spark.catalog.clearCache()

    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(args.reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = qs[name](spark, args.sf)
            n = df.count()
            dt = round(time.time() - t0, 3)
            samples[name].append(dt)
            if name not in timings or dt < timings[name]:
                timings[name] = dt
            print(f"# rep{rep} {name}: {n} rows in {dt}s "
                  f"(load {os.getloadavg()[0]:.1f})", file=sys.stderr)
        spark.catalog.clearCache()

    print(json.dumps({
        "queries": timings,
        "samples": samples,
        "sf_dir": args.sf,
        "reps": args.reps,
        "cpus": int(cpus),
        "load": [round(x, 1) for x in os.getloadavg()],
    }))


if __name__ == "__main__":
    main()
