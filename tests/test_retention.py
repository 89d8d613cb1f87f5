"""Catalog retention: expire_snapshots + vacuum (Iceberg expire/remove-orphans
in miniature) and the scheduler's keep_snapshots wiring; run_round leaves
session confs untouched (ADVICE r2)."""

import tempfile

from httrack2warc_spark.frontier import CrawlConfig, FrontierScheduler, generate_web
from httrack2warc_spark.sinks.tables import TableCatalog


def _df(spark, lo, hi):
    return spark.createDataFrame(
        [(f"s.com/{i}", f"http://s.com/{i}", 0) for i in range(lo, hi)],
        "url_key string, url string, enqueued_round int",
    )


def test_vacuum_reclaims_dead_filesets_and_tables(spark, tmp_path):
    cat = TableCatalog(spark, str(tmp_path))
    cat.write("url_seen", _df(spark, 0, 100), bucket_by=("url_key", 4))
    cat.snapshot("round-0")
    for i in range(1, 5):
        cat.append("url_seen", _df(spark, 100 * i, 100 * (i + 1)),
                   bucket_by=("url_key", 4))
        cat.snapshot(f"round-{i}")
    cat.compact_small("url_seen", bucket_by=("url_key", 4), max_filesets=2)
    cat.snapshot("round-5")  # the scheduler's order: compact, then snapshot
    n_tables_before = sum(
        1 for t in spark.catalog.listTables() if t.name.startswith("h2w_url_seen_")
    )
    # nothing reclaimable while every snapshot is retained: round-4 still
    # pins the pre-compaction fileset list
    assert cat.vacuum("url_seen")["url_seen"]["filesets"] == 0

    cat.expire_snapshots(keep_last=1)
    stats = cat.vacuum("url_seen")["url_seen"]
    assert stats["filesets"] > 0 and stats["manifests"] > 0 and stats["tables"] > 0
    n_tables_after = sum(
        1 for t in spark.catalog.listTables() if t.name.startswith("h2w_url_seen_")
    )
    assert n_tables_after < n_tables_before
    # live data intact, still bucketed-readable, still resumable
    assert cat.read("url_seen").count() == 500
    assert cat.row_count("url_seen") == 500
    assert cat.list_snapshots() == ["round-5"]
    cat.rollback_to_snapshot("round-5")
    assert cat.read("url_seen").count() == 500


def test_scheduler_keep_snapshots_bounds_disk(spark, tmp_path):
    web, seeds = generate_web(spark, n_hosts=2, pages_per_host=40, out_degree=3,
                              cross_host_every=1)
    cat = TableCatalog(spark, str(tmp_path / "a"))
    sched = FrontierScheduler(
        spark, cat, web,
        CrawlConfig(num_parts=4, max_rounds=8, fetch_robots=False,
                    keep_snapshots=2),
    )
    log = sched.run(seeds=seeds)
    n = log.count()
    assert n > 0
    assert len(cat.list_snapshots()) <= 2
    # identical crawl without retention — same visit order
    cat2 = TableCatalog(spark, str(tmp_path / "b"))
    log2 = FrontierScheduler(
        spark, cat2, web,
        CrawlConfig(num_parts=4, max_rounds=8, fetch_robots=False),
    ).run(seeds=seeds)
    a = [(r.seq, r.url) for r in log.orderBy("seq").collect()]
    b = [(r.seq, r.url) for r in log2.orderBy("seq").collect()]
    assert a == b


def test_run_round_restores_session_conf(spark, tmp_path):
    web, seeds = generate_web(spark, n_hosts=1, pages_per_host=20, out_degree=3)
    cat = TableCatalog(spark, str(tmp_path))
    sched = FrontierScheduler(
        spark, cat, web,
        CrawlConfig(num_parts=4, max_rounds=2, fetch_robots=False,
                    aqe_mode="auto"),
    )
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    sched.start(seeds)
    sched.run_round(0, 0)
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_catalog_interface_conformance(spark):
    """Both catalog backends implement every CrawlCatalog verb (the Iceberg
    drop-in seam); the Iceberg adapter refuses to construct without the
    runtime jar rather than failing later mid-crawl."""
    import inspect

    import pytest

    from httrack2warc_spark.sinks.tables import (
        CrawlCatalog,
        IcebergCatalog,
        TableCatalog,
        iceberg_available,
    )

    verbs = {
        n for n, m in inspect.getmembers(CrawlCatalog, inspect.isfunction)
        if getattr(m, "__isabstractmethod__", False)
    }
    assert verbs  # the seam exists
    for impl in (TableCatalog, IcebergCatalog):
        for v in verbs:
            fn = getattr(impl, v)
            assert not getattr(fn, "__isabstractmethod__", False), (impl, v)
    assert issubclass(TableCatalog, CrawlCatalog)
    assert issubclass(IcebergCatalog, CrawlCatalog)
    if not iceberg_available(spark):
        with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
            IcebergCatalog(spark, "/tmp/never-created")


def test_salted_topk_auto_engages_on_skew(spark, tmp_path):
    """A skewed web (every frontier row on one host) trips the driver-side
    rows-per-host heuristic; the salted politeness plan engages and the visit
    order is unchanged vs the plain plan. The budget must be bindable
    (default_host_budget below the eventual frontier size) — a provably
    non-binding budget now skips the per-host window entirely, which the
    companion test below pins down."""
    web, seeds = generate_web(spark, n_hosts=1, pages_per_host=60, out_degree=4)

    def crawl(cfg_kwargs, d):
        cat = TableCatalog(spark, str(tmp_path / d))
        s = FrontierScheduler(
            spark, cat, web,
            CrawlConfig(num_parts=4, max_rounds=6, fetch_robots=False,
                        default_host_budget=8, **cfg_kwargs),
        )
        log = s.run(seeds=seeds)
        return s, [(r.seq, r.url) for r in log.orderBy("seq").collect()]

    s_auto, order_auto = crawl(
        {"salted_topk": "auto", "salt_auto_threshold": 2}, "auto")
    s_plain, order_plain = crawl({"salted_topk": False}, "plain")
    assert s_auto.salted_rounds, "auto heuristic never engaged"
    assert not s_plain.salted_rounds
    assert order_auto == order_plain and len(order_auto) > 10


def test_unbindable_budget_skips_topk_identically(spark, tmp_path):
    """When no per-host override or crawl-delay cap exists and the whole
    frontier fits inside the uniform default budget, the per-host top-k is
    the identity: the scheduler skips the window (no salted engagement even
    under forced salting) and the visit order is bit-identical to a run
    where the window executes (budget = frontier size exactly)."""
    web, seeds = generate_web(spark, n_hosts=1, pages_per_host=60, out_degree=4)

    def crawl(cfg_kwargs, d):
        cat = TableCatalog(spark, str(tmp_path / d))
        s = FrontierScheduler(
            spark, cat, web,
            CrawlConfig(num_parts=4, max_rounds=6, fetch_robots=False,
                        **cfg_kwargs),
        )
        log = s.run(seeds=seeds)
        return s, [(r.seq, r.url) for r in log.orderBy("seq").collect()]

    # huge default budget: window skipped, salted flag never set even
    # though salting is FORCED on — the identity rule preempts it
    s_skip, order_skip = crawl({"salted_topk": True}, "skip")
    assert not s_skip.salted_rounds
    # budget bindable (host_budget override present) ⇒ window runs
    import pyspark.sql.functions as F

    hb = spark.createDataFrame(
        [("host0.example.com", 1_000_000)], "host string, budget long")
    cat = TableCatalog(spark, str(tmp_path / "win"))
    s_win = FrontierScheduler(
        spark, cat, web,
        CrawlConfig(num_parts=4, max_rounds=6, fetch_robots=False),
        host_budget=hb,
    )
    log = s_win.run(seeds=seeds)
    order_win = [(r.seq, r.url) for r in log.orderBy("seq").collect()]
    assert order_skip == order_win and len(order_skip) > 10


def test_iceberg_catalog_smoke_with_runtime(spark, tmp_path):
    """One append/snapshot/expire cycle through the REAL Iceberg adapter —
    runs only when the iceberg-spark-runtime jar is on the classpath (absent
    in this sandbox, so normally a skip, not a gap: the adapter's SQL surface
    gets exercised the moment the runtime appears)."""
    import pytest

    from httrack2warc_spark.sinks.tables import IcebergCatalog, iceberg_available

    if not iceberg_available(spark):
        pytest.skip("iceberg-spark-runtime jar not on the session classpath")

    cat = IcebergCatalog(spark, str(tmp_path / "ice"))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    entry = cat.write("smoke", df)
    assert cat.exists("smoke")
    entry = cat.append("smoke", spark.createDataFrame([(3, "c")], "id long, v string"))
    assert cat.row_count("smoke") == 3
    assert cat.fileset_row_count(entry) == 1  # added-records of the append
    cat.snapshot("r1", {"round": 1})
    assert "r1" in cat.list_snapshots()
    cat.expire_snapshots(keep_last=1)
    assert cat.read("smoke").count() == 3


def test_iceberg_catalog_smoke(spark, tmp_path):
    """One append/snapshot/expire cycle through the REAL IcebergCatalog —
    exercised only when the iceberg-spark-runtime jar is on the classpath
    (absent in this sandbox, so the test skips rather than vanishes; catalog
    plugins resolve lazily, so the runtime conf set below is sufficient)."""
    import pytest

    from httrack2warc_spark.sinks.tables import IcebergCatalog, iceberg_available

    if not iceberg_available(spark):
        pytest.skip("iceberg-spark-runtime jar not on the session classpath")
    spark.conf.set("spark.sql.catalog.h2w", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.h2w.type", "hadoop")
    spark.conf.set("spark.sql.catalog.h2w.warehouse", str(tmp_path / "wh"))
    cat = IcebergCatalog(spark, str(tmp_path / "root"))

    entry = cat.write("url_seen", _df(spark, 0, 5), bucket_by=("url_key", 4))
    assert cat.fileset_row_count(entry) == 5  # added-records of THAT snapshot
    entry2 = cat.append("url_seen", _df(spark, 5, 8))
    assert cat.fileset_row_count(entry2) == 3
    assert cat.row_count("url_seen") == 8  # metadata-only total
    assert cat.read("url_seen").count() == 8

    cat.snapshot("round-0", {"round": 0})
    cat.append("url_seen", _df(spark, 8, 10))
    cat.snapshot("round-1", {"round": 1})
    assert cat.load_snapshot("round-1")["round"] == 1
    assert cat.expire_snapshots(keep_last=1) == ["round-0"]
    assert cat.list_snapshots() == ["round-1"]
    cat.vacuum("url_seen")
    payload = cat.rollback_to_snapshot("round-1")
    assert payload["round"] == 1 and cat.row_count("url_seen") == 10
