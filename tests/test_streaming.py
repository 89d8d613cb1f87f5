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


def test_streaming_robots_and_rank(spark, tmp_path):
    """Mid-stream robots change + PageRank priority refresh: a Disallow that
    arrives between micro-batches blocks the host's candidates from every
    subsequent batch (slowly-changing broadcast, robots_refresh_every=1),
    and candidates matching the rank table are admitted with the overridden
    priority."""
    from httrack2warc_spark.functions.robots import robots_rules
    from httrack2warc_spark.operators.pagerank import pagerank
    from httrack2warc_spark.streaming import run_discovery_stream

    cat = TableCatalog(spark, str(tmp_path / "cat"))
    sched = FrontierScheduler(
        spark, cat, fixture_web(spark), CrawlConfig(num_parts=4)
    )
    sched.start(["http://test.example.org/"])

    # slowly-changing robots source: starts permissive, turns restrictive
    robots_state = {"body": "User-agent: *\n"}

    def current_rules():
        return robots_rules(
            spark.createDataFrame(
                [("blocked.example.org", robots_state["body"])],
                "host string, body string",
            )
        )

    # PageRank-derived priority: hot URLs jump the queue
    edges = spark.createDataFrame(
        [("a", "http://test.example.org/hot"), ("b", "http://test.example.org/hot"),
         ("c", "http://test.example.org/cold")],
        "src string, dst string",
    )
    ranked = pagerank(edges, src="src", dst="dst", iterations=3)
    overrides = (
        ranked.where(F.col("vertex").startswith("http"))
        .orderBy(F.col("rank").desc())
        .limit(1)
        .select(
            F.regexp_replace("vertex", "^https?://", "").alias("url_key"),
            F.lit(0).alias("priority"),
        )
    )

    src = tmp_path / "incoming"
    src.mkdir()

    def drain(name, rows):
        (src / name).write_text("\n".join(json.dumps(r) for r in rows))
        q = run_discovery_stream(
            spark, spark.readStream.schema(SCHEMA).json(str(src)), cat,
            num_parts=4, checkpoint_dir=str(tmp_path / "ckpt"),
            robots=current_rules, robots_refresh_every=1,
            priority_overrides=overrides,
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)

    row = {"referrer": None, "parent_seq": 0, "link_idx": 0, "parent_depth": 0}
    drain("b1.json", [
        {**row, "dst_url": "http://blocked.example.org/pre-rule"},
        {**row, "dst_url": "http://test.example.org/hot"},
    ])
    # the disallow lands between micro-batches
    robots_state["body"] = "User-agent: *\nDisallow: /\n"
    drain("b2.json", [
        {**row, "dst_url": "http://blocked.example.org/post-rule"},
        {**row, "dst_url": "http://test.example.org/cold"},
    ])

    frontier = {r.url_key: r.priority for r in cat.read("frontier").collect()}
    assert "blocked.example.org/pre-rule" in frontier     # admitted before rule
    assert "blocked.example.org/post-rule" not in frontier  # stopped mid-stream
    assert "test.example.org/cold" in frontier            # other hosts unaffected
    assert frontier["test.example.org/hot"] == 0          # rank override applied
    assert frontier["test.example.org/cold"] == 1         # default depth priority


def test_streaming_exact_dedup(spark, tmp_path):
    """dropDuplicatesWithinWatermark plumbing: duplicates inside the
    watermark window collapse to one row across micro-batches."""
    from httrack2warc_spark.streaming import streaming_exact_dedup

    src = tmp_path / "dedup_in"
    src.mkdir()
    rows = [
        {"url_key": "a.com/x", "ts": "2024-01-01T10:00:00"},
        {"url_key": "a.com/x", "ts": "2024-01-01T10:00:05"},
        {"url_key": "b.com/y", "ts": "2024-01-01T10:00:10"},
        {"url_key": "b.com/y", "ts": "2024-01-01T10:01:00"},
        {"url_key": "c.com/z", "ts": "2024-01-01T10:02:00"},
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = (
        spark.readStream.schema("url_key string, ts string")
        .json(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    out = streaming_exact_dedup(stream, ["url_key"], "ts", delay="10 minutes")
    q = (
        out.writeStream.format("memory").queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt_d"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r.url_key for r in spark.sql("SELECT * FROM dedup_out").collect()}
    assert got == {"a.com/x", "b.com/y", "c.com/z"}
    assert spark.sql("SELECT count(*) n FROM dedup_out").collect()[0].n == 3


def test_streaming_sessionize(spark, tmp_path):
    """session_window aggregation: a >30min gap splits sessions; counts per
    closed session match the batch sessionize semantics."""
    from httrack2warc_spark.streaming import streaming_sessionize

    src = tmp_path / "sess_in"
    src.mkdir()
    rows = [
        {"user_id": 1, "ts": "2024-01-01T10:00:00"},
        {"user_id": 1, "ts": "2024-01-01T10:10:00"},
        {"user_id": 1, "ts": "2024-01-01T11:30:00"},  # > 30 min gap: session 2
        {"user_id": 2, "ts": "2024-01-01T10:05:00"},
        # advances the watermark past 12:10 so user 1's second session closes;
        # this event's own session stays open and is NOT emitted (append mode)
        {"user_id": 3, "ts": "2024-01-01T13:00:00"},
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = (
        spark.readStream.schema("user_id int, ts string")
        .json(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    out = streaming_sessionize(stream, "ts", "user_id", gap="30 minutes")
    q = (
        out.writeStream.format("memory").queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_s"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.n_events)
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    assert got == {(1, 2), (1, 1), (2, 1)}


def test_streaming_corpus_chunks(spark, tmp_path):
    """Streamed documents land pre-chunked with boundaries bit-identical to
    the batch chunker, sampling membership matches the batch md5-draw, and
    re-delivery of an already-chunked document appends nothing."""
    from httrack2warc_spark.operators.corpus import (
        chunk_documents, deterministic_sample,
    )
    from httrack2warc_spark.streaming import run_corpus_stream

    docs = [
        {"doc_id": f"d{i}", "text": " ".join(f"w{i}_{j}" for j in range(n))}
        for i, n in enumerate([0, 3, 10, 17, 25, 40, 7, 13, 31, 22])
    ]
    cat = TableCatalog(spark, str(tmp_path / "cat"))
    src = tmp_path / "docs_in"
    src.mkdir()

    def drain():
        stream = spark.readStream.schema("doc_id string, text string").json(str(src))
        q = run_corpus_stream(
            spark, stream, cat, max_tokens=8, overlap=3,
            sample_fraction=0.7, sample_seed=11,
            checkpoint_dir=str(tmp_path / "ckpt_c"),
        ).trigger(availableNow=True).start()
        q.awaitTermination(120)

    # batch 1: first six docs; batch 2 (mid-stream): the rest + a re-delivery
    (src / "b1.json").write_text("\n".join(json.dumps(d) for d in docs[:6]))
    drain()
    (src / "b2.json").write_text(
        "\n".join(json.dumps(d) for d in docs[6:] + [docs[2]])
    )
    drain()

    batch_docs = spark.createDataFrame(
        [(d["doc_id"], d["text"]) for d in docs], "doc_id string, text string"
    )
    expect_docs = deterministic_sample(batch_docs, "doc_id", 0.7, seed=11)
    expected = {
        (r.doc_id, r.chunk_idx, r.chunk_text, r.n_tokens)
        for r in chunk_documents(
            expect_docs, "text", "doc_id", max_tokens=8, overlap=3
        ).collect()
    }
    got = [
        (r.doc_id, r.chunk_idx, r.chunk_text, r.n_tokens)
        for r in cat.read("doc_chunks").collect()
    ]
    assert len(got) == len(set(got))  # re-delivery appended nothing
    assert set(got) == expected       # batch-identical boundaries + sampling
    assert expected  # non-vacuous: the sampler kept documents to chunk


def test_streaming_hll_matches_batch(spark, tmp_path):
    """Windowed streaming HLL registers, delivered across two micro-batches,
    finalize to the EXACT estimates of the batch operator over the same
    events — max-merge across micro-batches is the sketch's merge."""
    from httrack2warc_spark.operators.sketches import (
        hll_cardinality,
        hll_estimate_from_registers,
    )
    from httrack2warc_spark.streaming import streaming_hll_registers

    rows = [
        {"user": f"u{i % 37}", "ts": f"2024-01-01T10:{i % 2 * 30:02d}:{i % 60:02d}"}
        for i in range(400)
    ]
    src = tmp_path / "hll_in"
    src.mkdir()
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows[:250]))
    (src / "b2.json").write_text("\n".join(json.dumps(r) for r in rows[250:]))

    stream = (
        spark.readStream.schema("user string, ts string").json(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    regs_stream = streaming_hll_registers(
        stream, "user", "ts", window="30 minutes", delay="5 minutes", p=12
    )
    q = (
        regs_stream.writeStream.format("memory").queryName("hll_regs")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_h"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)

    regs = spark.sql("SELECT * FROM hll_regs")
    got = {
        (str(r.window_start), r.est_distinct)
        for r in hll_estimate_from_registers(
            regs, ["window_start", "window_end"], p=12
        ).collect()
    }

    batch = spark.createDataFrame(
        [(r["user"], r["ts"]) for r in rows], "user string, ts string"
    ).select(
        "user",
        F.window(F.col("ts").cast("timestamp"), "30 minutes").alias("__w"),
    ).select("user", F.col("__w.start").alias("window_start"))
    expected = {
        (str(r.window_start), r.est_distinct)
        for r in hll_cardinality(
            batch, "user", ["window_start"], p=12
        ).collect()
    }
    assert got == {(w, e) for (w, e) in expected} and len(got) == 2


def test_streaming_quantile_bins_match_batch(spark, tmp_path):
    """Fixed-grid streaming quantile bins: two micro-batches of events
    merge (counts SUM) into exactly the bin table a batch pass over the
    same rows computes on the same [lo, hi] grid; state stays <= bins rows
    per window."""
    from httrack2warc_spark.streaming import streaming_quantile_bins

    rows = [
        {"v": (i * 37) % 100 + (0.5 if i % 3 else 0.0),
         "ts": f"2024-01-01T10:{i % 2 * 30:02d}:{i % 60:02d}"}
        for i in range(300)
    ]
    src = tmp_path / "qb_in"
    src.mkdir()
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows[:200]))
    (src / "b2.json").write_text("\n".join(json.dumps(r) for r in rows[200:]))

    stream = (
        spark.readStream.schema("v double, ts string").json(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        streaming_quantile_bins(
            stream, "v", "ts", lo=0.0, hi=100.0,
            window="30 minutes", delay="5 minutes", bins=64,
        )
        .writeStream.format("memory").queryName("qbins")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_qb"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)

    got = {
        (str(r.window_start), r["__bin"], r["__c"])
        for r in spark.sql("SELECT * FROM qbins").collect()
    }
    batch = spark.createDataFrame(
        [(r["v"], r["ts"]) for r in rows], "v double, ts string"
    ).select(
        "v",
        F.window(F.col("ts").cast("timestamp"), "30 minutes").alias("__w"),
    )
    width = 100.0 / 64
    idx = F.least(
        F.greatest(F.floor(F.col("v") / F.lit(width)).cast("int"), F.lit(0)),
        F.lit(63),
    )
    expected = {
        (str(r["start"]), r["__bin"], r["c"])
        for r in batch.groupBy(
            F.col("__w.start").alias("start"), idx.alias("__bin")
        ).agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert got == expected
    per_window = {}
    for w, _b, _c in got:
        per_window[w] = per_window.get(w, 0) + 1
    assert all(n <= 64 for n in per_window.values()) and len(per_window) == 2
