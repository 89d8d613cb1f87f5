"""Streaming discovery ingestion: file-source micro-batches drain into the
same frontier/seen state tables, idempotently."""

import json
from pathlib import Path

from pyspark.sql import functions as F

from httrack2warc_spark.frontier.scheduler import CrawlConfig, FrontierScheduler
from httrack2warc_spark.frontier.synth import fixture_web
from httrack2warc_spark.sinks.tables import TableCatalog
from httrack2warc_spark.streaming import run_discovery_stream

SCHEMA = (
    "dst_url string, referrer string, parent_seq long, link_idx int, parent_depth int"
)


def test_streaming_discovery(spark, tmp_path):
    # seed state via the batch scheduler's start()
    cat = TableCatalog(spark, str(tmp_path / "cat"))
    sched = FrontierScheduler(
        spark, cat, fixture_web(spark), CrawlConfig(num_parts=4)
    )
    sched.start(["http://test.example.org/"])

    src = tmp_path / "incoming"
    src.mkdir()
    rows = [
        # one duplicate of the seed (must be dropped), two new URLs (one dup'd)
        {"dst_url": "http://test.example.org/", "referrer": None,
         "parent_seq": 0, "link_idx": 0, "parent_depth": 0},
        {"dst_url": "http://test.example.org/new1", "referrer": "http://test.example.org/",
         "parent_seq": 0, "link_idx": 1, "parent_depth": 0},
        {"dst_url": "HTTP://Test.Example.ORG/new1", "referrer": "http://test.example.org/",
         "parent_seq": 0, "link_idx": 2, "parent_depth": 0},
        {"dst_url": "http://test.example.org/new2", "referrer": "http://test.example.org/",
         "parent_seq": 0, "link_idx": 3, "parent_depth": 0},
    ]
    (src / "batch1.json").write_text("\n".join(json.dumps(r) for r in rows))

    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = run_discovery_stream(
        spark, stream, cat, num_parts=4,
        checkpoint_dir=str(tmp_path / "ckpt"),
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)

    seen = {r.url_key for r in cat.read("url_seen").collect()}
    assert "test.example.org/new1" in seen
    assert "test.example.org/new2" in seen
    frontier = cat.read("frontier")
    new1 = frontier.where(F.col("url_key") == "test.example.org/new1").collect()
    assert len(new1) == 1  # canonicalization collapsed the case variant
    # the duplicate seed was not re-enqueued
    assert frontier.where(F.col("url_key") == "test.example.org/").count() == 1
