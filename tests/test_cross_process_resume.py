"""True checkpoint/resume across PROCESSES (north_rule: "resumable from
checkpoint"): a crawl runs its first rounds in one Spark session/JVM, then a
brand-new process — fresh in-memory catalog, no bucketed-table registrations,
no cached state — resumes from the snapshot and must produce the identical
final visit order. Exercises TableCatalog._ensure_bucket_table on the real
resume path, not just the unit test."""

import json
import subprocess
import sys

WORKER = """
import json, sys
mode, root = sys.argv[1], sys.argv[2]
from httrack2warc_spark import get_spark
spark = get_spark(app_name=f"xresume-{mode}", master="local[4]",
                  shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")
from httrack2warc_spark.frontier import CrawlConfig, FrontierScheduler, fixture_web
from httrack2warc_spark.sinks.tables import TableCatalog

cat = TableCatalog(spark, root)
cfg = CrawlConfig(num_parts=4, max_rounds=10, summary_capacity_per_part=10_000,
                  summary_every=2)
sched = FrontierScheduler(spark, cat, fixture_web(spark), cfg)
if mode == "start":
    # run only the first two rounds, then exit mid-crawl
    sched.start(["http://test.example.org/"])
    next_seq = 0
    for rnd in range(2):
        n, next_seq = sched.run_round(rnd, next_seq)
    print(json.dumps({"partial_rounds": 2}))
else:
    log = sched.run(resume=True)
    rows = [(r.seq, r.url) for r in log.orderBy("seq").collect()]
    print(json.dumps(rows))
"""


def _run(mode: str, root: str) -> str:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, mode, root],
        capture_output=True, text=True, timeout=600, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-3000:]
    return out.stdout.strip().splitlines()[-1]


def test_resume_in_fresh_process(spark, tmp_path):
    root = str(tmp_path / "cat")
    _run("start", root)
    resumed = json.loads(_run("resume", root))

    # reference baseline: the same crawl uninterrupted, in this session
    from httrack2warc_spark.frontier import CrawlConfig, FrontierScheduler, fixture_web
    from httrack2warc_spark.sinks.tables import TableCatalog

    cat = TableCatalog(spark, str(tmp_path / "cat2"))
    sched = FrontierScheduler(
        spark, cat, fixture_web(spark),
        CrawlConfig(num_parts=4, max_rounds=10, summary_capacity_per_part=10_000,
                    summary_every=2),
    )
    log = sched.run(seeds=["http://test.example.org/"])
    baseline = [[r.seq, r.url] for r in log.orderBy("seq").collect()]
    assert resumed == baseline and len(baseline) >= 9
