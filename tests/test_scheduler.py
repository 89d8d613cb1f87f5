"""Frontier scheduler golden tests: the engine must *produce* the visit order
the reference *replays* (BASELINE.json north_rule), plus politeness, skew,
and checkpoint/resume behavior."""

import pytest
from pyspark.sql import functions as F

from httrack2warc_spark.frontier import CrawlConfig, FrontierScheduler, fixture_web
from httrack2warc_spark.sinks.tables import TableCatalog

GOLDEN_VISIT_ORDER = [
    "http://test.example.org/robots.txt",
    "http://test.example.org/",
    "http://test.example.org/style.css",
    "http://test.example.org/query.html?page=1&query=2&FOO=3&&BaR=4&&#anchor",
    "http://test.example.org/another",
    "http://test.example.org/redirect",
    "http://test.example.org/page%20WITH%20%22special%22%20chars.html",
    "http://test.example.org/image.gif",
    "http://test.example.org/image404.png",
]

GOLDEN_SEEN = {
    "test.example.org/robots.txt",
    "test.example.org/",
    "test.example.org/style.css",
    "test.example.org/query.html?page=1&query=2&FOO=3&&BaR=4&&#anchor",
    "test.example.org/another",
    "test.example.org/redirect",
    "test.example.org/page%20WITH%20%22special%22%20chars.html",
    "test.example.org/image.gif",
    "test.example.org/image404.png",
}


def _run(spark, tmp, cfg):
    web = fixture_web(spark)
    cat = TableCatalog(spark, str(tmp))
    sched = FrontierScheduler(spark, cat, web, cfg)
    log = sched.run(seeds=["http://test.example.org/"])
    return cat, [r.url for r in log.orderBy("seq").collect()]


def test_golden_visit_order(spark, tmp_path):
    cat, urls = _run(spark, tmp_path, CrawlConfig(num_parts=8, max_rounds=10))
    assert urls == GOLDEN_VISIT_ORDER
    seen = {r.url_key for r in cat.read("url_seen").collect()}
    assert seen == GOLDEN_SEEN


def test_golden_visit_order_cuckoo_and_salted(spark, tmp_path):
    cfg = CrawlConfig(
        num_parts=8, max_rounds=10, summary_kind="cuckoo",
        salted_topk=True, salt_buckets=4,
    )
    cat, urls = _run(spark, tmp_path, cfg)
    assert urls == GOLDEN_VISIT_ORDER


def test_golden_visit_order_jvm_probe(spark, tmp_path):
    """The all-JVM codegen discovery gate (cfg.jvm_probe) must reproduce the
    golden order bit-for-bit — it swaps only the probe/dedup physical plan,
    never the semantics."""
    cfg = CrawlConfig(num_parts=8, max_rounds=10, jvm_probe=True)
    cat, urls = _run(spark, tmp_path, cfg)
    assert urls == GOLDEN_VISIT_ORDER


def test_golden_visit_order_all_variants_combined(spark, tmp_path):
    """Every physical-plan variant AT ONCE — codegen probe, deferred commit
    window, forced salted top-k, ranged seq stamping, stale-summary tail —
    must still reproduce the golden order bit-for-bit. The variants are
    proven order-identical individually; this pins their interactions
    (shared exchanges, handoff caches, pending-window compensation)."""
    cfg = CrawlConfig(
        num_parts=8, max_rounds=10, jvm_probe=True, commit_every=2,
        salted_topk=True, salt_buckets=4, seq_mode="ranged",
        summary_every=2,
    )
    cat, urls = _run(spark, tmp_path, cfg)
    assert urls == GOLDEN_VISIT_ORDER
    seen = {r.url_key for r in cat.read("url_seen").collect()}
    assert seen == GOLDEN_SEEN


def test_exclusion_at_discovery(spark, tmp_path):
    cfg = CrawlConfig(num_parts=8, max_rounds=10, exclusions=[".*/another"])
    cat, urls = _run(spark, tmp_path, cfg)
    assert "http://test.example.org/another" not in urls
    assert len(urls) == len(GOLDEN_VISIT_ORDER) - 1


def test_politeness_budget_spreads_rounds(spark, tmp_path):
    cfg = CrawlConfig(num_parts=8, max_rounds=30, default_host_budget=2)
    cat, urls = _run(spark, tmp_path, cfg)
    # same total order (single host, deterministic tiebreak), more rounds
    assert urls == GOLDEN_VISIT_ORDER
    log = cat.read("crawl_log")
    per_round = {
        r.round: r.n
        for r in log.groupBy("round").agg(F.count("*").alias("n")).collect()
    }
    assert max(per_round.values()) <= 3  # 2 budget + 1 robots in round 0
    assert len(per_round) >= 4


def test_resume_midway(spark, tmp_path):
    """Kill the crawl after round 0, resume, and get the identical final log."""
    web = fixture_web(spark)
    cat = TableCatalog(spark, str(tmp_path))
    cfg = CrawlConfig(num_parts=8, max_rounds=10)
    sched = FrontierScheduler(spark, cat, web, cfg)
    sched.start(["http://test.example.org/"])
    fetched, next_seq = sched.run_round(0, 0)
    assert fetched == 2  # robots + seed

    sched2 = FrontierScheduler(spark, TableCatalog(spark, str(tmp_path)), web, cfg)
    log = sched2.run(resume=True)
    assert [r.url for r in log.orderBy("seq").collect()] == GOLDEN_VISIT_ORDER


def test_metrics_lineage(spark, tmp_path):
    cat, urls = _run(spark, tmp_path, CrawlConfig(num_parts=8, max_rounds=10))
    m = cat.read("metrics")
    total_fetched = m.agg(F.sum("fetched")).collect()[0][0]
    assert total_fetched == len(GOLDEN_VISIT_ORDER)
    assert {r.part for r in m.collect()} <= set(range(8))


def test_robots_rules_block(spark, tmp_path):
    web = fixture_web(spark)
    cat = TableCatalog(spark, str(tmp_path))
    robots = web.pages.sparkSession.createDataFrame(
        [("test.example.org", ["/image"])], "host string, disallow array<string>"
    )
    sched = FrontierScheduler(
        web.pages.sparkSession, cat, web,
        CrawlConfig(num_parts=8, max_rounds=10), robots=robots,
    )
    log = sched.run(seeds=["http://test.example.org/"])
    urls = [r.url for r in log.orderBy("seq").collect()]
    assert "http://test.example.org/image.gif" not in urls
    assert "http://test.example.org/image404.png" not in urls
    assert "http://test.example.org/style.css" in urls


def test_frontier_delta_commits(spark, tmp_path):
    """The frontier commits as merge-on-read deltas: O(delta) appends per
    round (manifest accrues one adds fileset per discovering round — never a
    full rewrite), tombstones equal the fetched page set, the live anti-join
    view is empty at exhaustion, and lowering the collapse floor triggers
    compaction back to a single adds set with truncated tombstones."""
    web = fixture_web(spark)
    cat = TableCatalog(spark, str(tmp_path / "a"))
    sched = FrontierScheduler(spark, cat, web, CrawlConfig(num_parts=8, max_rounds=10))
    log = sched.run(seeds=["http://test.example.org/"])
    assert [r.url for r in log.orderBy("seq").collect()] == GOLDEN_VISIT_ORDER
    n_pages = log.where(~F.col("is_robots")).count()
    assert cat.row_count("frontier_removed") == n_pages
    assert sched._read_frontier().count() == 0  # exhausted crawl: empty live set
    assert len(cat._files("frontier")) > 1      # per-round appends, no rewrites

    # collapse floor 0: tombstones outgrow the (shrinking) live set and the
    # store compacts — same golden order, single adds fileset, no tombstones
    cat2 = TableCatalog(spark, str(tmp_path / "b"))
    sched2 = FrontierScheduler(
        spark, cat2, web,
        CrawlConfig(num_parts=8, max_rounds=10, frontier_tombstone_min=0),
    )
    log2 = sched2.run(seeds=["http://test.example.org/"])
    assert [r.url for r in log2.orderBy("seq").collect()] == GOLDEN_VISIT_ORDER
    assert cat2.row_count("frontier_removed") == 0
    assert len(cat2._files("frontier")) == 1


def test_commit_window_is_bit_identical(spark, tmp_path):
    """cfg.commit_every defers the table-commit wave K rounds; visit order,
    url_seen set and metrics totals must be BIT-identical for any K — the
    cadence is commit timing only. Exercised with robots fetching, a binding
    per-host budget, summaries with a tail (summary_every=2), and a window
    that does NOT divide the round count (forced partial flush at the end)."""
    from httrack2warc_spark.frontier import generate_web

    web, seeds = generate_web(spark, n_hosts=3, pages_per_host=40,
                              out_degree=4, cross_host_every=2)

    def crawl(k, d):
        cat = TableCatalog(spark, str(tmp_path / d))
        sched = FrontierScheduler(
            spark, cat, web,
            CrawlConfig(num_parts=4, max_rounds=7, default_host_budget=7,
                        summary_every=2, commit_every=k,
                        summary_capacity_per_part=10_000),
        )
        log = [
            (r.seq, r.url_key, r.round, r.is_robots)
            for r in sched.run(seeds=seeds).orderBy("seq").collect()
        ]
        seen = {(r.url_key, r.enqueued_round)
                for r in cat.read("url_seen").collect()}
        metrics = sorted(
            (r.round, r.part, r.fetched, r.new_urls)
            for r in cat.read("metrics").collect()
        )
        hosts = {r.host for r in cat.read("hosts_crawled").collect()}
        frontier = {r.url_key for r in sched._read_frontier().collect()}
        return log, seen, metrics, hosts, frontier

    base = crawl(1, "k1")
    got = crawl(3, "k3")  # 3 ∤ 7 ⇒ exercises the forced partial flush
    for name, a, b in zip(("log", "seen", "metrics", "hosts", "frontier"),
                          base, got):
        assert a == b, f"commit_every=3 diverged on {name}"


def test_resume_mid_commit_window(spark, tmp_path):
    """Crash INSIDE a commit window: with commit_every=3 a crawl killed
    before the first flush has committed nothing but the seed snapshot —
    the whole window's deltas lived only in the abandoned scheduler's
    caches. Resume must roll back to `round--1` and deterministically
    re-crawl the lost rounds: the documented commit_every trade is up to K
    rounds of re-crawl, never a divergent or torn log. Uses the
    non-flushing `_run_round_guarded` form `run()` uses — the public
    `run_round` flushes on every call by contract."""
    web = fixture_web(spark)
    cfg = CrawlConfig(num_parts=8, max_rounds=10, commit_every=3)
    cat = TableCatalog(spark, str(tmp_path))
    sched = FrontierScheduler(spark, cat, web, cfg)
    sched.start(["http://test.example.org/"])
    _, next_seq = sched._run_round_guarded(0, 0)
    sched.close()  # crash: round 0's deltas dropped, nothing flushed

    tags = {t for t in cat.list_snapshots() if t.startswith("round-")}
    assert tags == {"round--1"}  # pending window reached the catalog nowhere

    sched2 = FrontierScheduler(spark, TableCatalog(spark, str(tmp_path)), web, cfg)
    log = sched2.run(resume=True)
    assert [r.url for r in log.orderBy("seq").collect()] == GOLDEN_VISIT_ORDER
    seen = {r.url_key
            for r in TableCatalog(spark, str(tmp_path)).read("url_seen").collect()}
    assert seen == GOLDEN_SEEN


def test_crash_mid_round_discards_torn_window(spark, tmp_path):
    """An exception INSIDE a round (commit_every=3, fetch blows up in round
    1) must NOT flush the pending window: round 0's deltas and round 1's
    half-assembled ones are discarded, the catalog stays at the seed
    snapshot, and resume re-crawls the whole window to the golden order.
    Flushing a torn round would snapshot a catalog that already contains
    some of its keys — resume would then silently drop those URLs."""
    web = fixture_web(spark)

    class FlakyWeb:
        def __init__(self, inner, fail_on_call):
            self.inner, self.n, self.fail_on = inner, 0, fail_on_call

        def fetch(self, selected):
            self.n += 1
            if self.n == self.fail_on:
                raise RuntimeError("injected mid-round fetch failure")
            return self.inner.fetch(selected)

        def outlinks(self, fetched):
            return self.inner.outlinks(fetched)

    cfg = CrawlConfig(num_parts=8, max_rounds=10, commit_every=3)
    cat = TableCatalog(spark, str(tmp_path))
    flaky = FlakyWeb(web, fail_on_call=2)
    sched = FrontierScheduler(spark, cat, flaky, cfg)
    with pytest.raises(RuntimeError, match="injected"):
        sched.run(seeds=["http://test.example.org/"])

    # nothing flushed: round 0's deltas never reached the catalog
    assert {t for t in cat.list_snapshots()} == {"round--1"}
    assert cat.row_count("crawl_log") == 0

    sched2 = FrontierScheduler(spark, TableCatalog(spark, str(tmp_path)), web, cfg)
    log = sched2.run(resume=True)
    assert [r.url for r in log.orderBy("seq").collect()] == GOLDEN_VISIT_ORDER


def test_resume_after_window_flush(spark, tmp_path):
    """Crash AFTER a window flush but with later rounds pending
    (commit_every=3 on a 2-host generate_web crawl, killed after round 3:
    the round-2 flush snapshot is the last consistent state; round 3's
    deltas are lost). Resume rolls back to round-2, re-crawls round 3
    onward, and the final log/seen set are bit-identical to an
    uninterrupted commit_every=1 crawl of the same web."""
    from httrack2warc_spark.frontier import generate_web

    web, seeds = generate_web(spark, n_hosts=2, pages_per_host=40,
                              out_degree=3, cross_host_every=1)

    def harvest(cat):
        log = [(r.seq, r.url_key, r.round, r.is_robots)
               for r in cat.read("crawl_log").orderBy("seq").collect()]
        seen = {(r.url_key, r.enqueued_round)
                for r in cat.read("url_seen").collect()}
        return log, seen

    base_cat = TableCatalog(spark, str(tmp_path / "base"))
    base_sched = FrontierScheduler(
        spark, base_cat, web,
        CrawlConfig(num_parts=8, max_rounds=8, commit_every=1),
    )
    base_sched.run(seeds=seeds)
    base = harvest(base_cat)

    cfg = CrawlConfig(num_parts=8, max_rounds=8, commit_every=3)
    cat = TableCatalog(spark, str(tmp_path / "crash"))
    sched = FrontierScheduler(spark, cat, web, cfg)
    sched.start(seeds)
    next_seq = 0
    for r in range(4):  # flush cadence hits at round 2; round 3 stays pending
        _, next_seq = sched._run_round_guarded(r, next_seq)
    sched.close()

    tags = {t for t in cat.list_snapshots() if t.startswith("round-")}
    assert "round-2" in tags and "round-3" not in tags

    sched2 = FrontierScheduler(spark, TableCatalog(spark, str(tmp_path / "crash")),
                               web, cfg)
    sched2.run(resume=True)
    got = harvest(TableCatalog(spark, str(tmp_path / "crash")))
    assert got == base


def test_commit_window_golden_order(spark, tmp_path):
    """The reference-parity golden crawl is unchanged under a deferred
    commit window (robots.txt injection, budgets and all)."""
    cat, urls = _run(
        spark, tmp_path,
        CrawlConfig(num_parts=8, max_rounds=10, commit_every=3),
    )
    assert urls == GOLDEN_VISIT_ORDER
    seen = {r.url_key for r in cat.read("url_seen").collect()}
    assert seen == GOLDEN_SEEN


def test_level_mode_bucketed_order_identical(spark, tmp_path):
    """The level-mode fast path (lazy bucketed seq stamping + arithmetic
    fetch/frontier counts — ONE foreground job per round) must produce a log
    bit-identical to the always-correct single and ranged plans on a
    robots-off multi-host crawl, and must actually engage. Also pins the
    fallback: under a binding budget the level invariant breaks, forced
    bucketed degrades to ranged, and the result is still identical."""
    from httrack2warc_spark.frontier import generate_web

    web, seeds = generate_web(spark, n_hosts=4, pages_per_host=60,
                              out_degree=4, cross_host_every=2)

    def crawl(seq_mode, d, budget=1_000_000):
        cat = TableCatalog(spark, str(tmp_path / d))
        sched = FrontierScheduler(
            spark, cat, web,
            CrawlConfig(num_parts=4, max_rounds=10, fetch_robots=False,
                        seq_mode=seq_mode, commit_every=2,
                        default_host_budget=budget),
        )
        log = sched.run(seeds=seeds)
        rows = [(r.seq, r.url_key, r.round)
                for r in log.orderBy("seq").collect()]
        return sched, rows

    sched_b, rows_b = crawl("bucketed", "b")
    assert sched_b.level_rounds, "level mode never engaged"
    _, rows_s = crawl("single", "s")
    _, rows_r = crawl("ranged", "r")
    assert rows_b == rows_s
    assert rows_b == rows_r

    # binding budget (8 << pages/host): selection is no longer the identity,
    # level mode must stay off and forced-bucketed must fall back, while the
    # total visit order stays identical to single stamping
    sched_fb, rows_fb = crawl("bucketed", "fb", budget=8)
    # round 0 (4 seeds ≤ budget) is provably identity and MAY run level
    # mode; any round whose frontier exceeds the budget must not
    rounds_run = {r for _, _, r in rows_fb}
    assert sched_fb.level_rounds != rounds_run
    _, rows_fs = crawl("single", "fs", budget=8)
    assert rows_fb == rows_fs


def test_batch_levels_bit_identical(spark, tmp_path):
    """cfg.batch_levels fuses k BFS levels into one foreground
    materialization; visit order, url_seen, metrics, hosts and the final
    frontier must be BIT-identical to the unbatched crawl — the fusion is
    job-count plumbing only. Exercised with a commit window that doesn't
    divide the round count and a summary cadence with a tail."""
    from httrack2warc_spark.frontier import generate_web

    web, seeds = generate_web(spark, n_hosts=3, pages_per_host=60,
                              out_degree=4, cross_host_every=2)

    def crawl(batch, d):
        cat = TableCatalog(spark, str(tmp_path / d))
        sched = FrontierScheduler(
            spark, cat, web,
            CrawlConfig(num_parts=4, max_rounds=7, fetch_robots=False,
                        summary_every=2, commit_every=3,
                        batch_levels=batch,
                        summary_capacity_per_part=10_000),
        )
        log = [
            (r.seq, r.url_key, r.round)
            for r in sched.run(seeds=seeds).orderBy("seq").collect()
        ]
        seen = {(r.url_key, r.enqueued_round)
                for r in cat.read("url_seen").collect()}
        metrics = sorted(
            (r.round, r.part, r.fetched, r.new_urls, r.bytes)
            for r in cat.read("metrics").collect()
        )
        frontier = {r.url_key for r in sched._read_frontier().collect()}
        return sched, (log, seen, metrics, frontier)

    sched_b, got = crawl(3, "batched")
    assert sched_b.block_rounds, "no block ever engaged"
    assert sched_b.block_fallbacks == 0
    sched_u, base = crawl(1, "unbatched")
    assert not sched_u.block_rounds
    for name, a, b in zip(("log", "seen", "metrics", "frontier"), base, got):
        assert a == b, f"batch_levels=3 diverged on {name}"


def test_batch_levels_budget_fallback(spark, tmp_path):
    """A block whose in-flight level outgrows the default budget must be
    discarded by the post-hoc check and those rounds re-run per-round —
    identical results, fallback counter incremented. Budget 120 admits the
    seed level (3 rows) but not level 1 (~3*60 pages discovered)."""
    from httrack2warc_spark.frontier import generate_web

    web, seeds = generate_web(spark, n_hosts=3, pages_per_host=80,
                              out_degree=80, cross_host_every=2)

    def crawl(batch, d):
        cat = TableCatalog(spark, str(tmp_path / d))
        sched = FrontierScheduler(
            spark, cat, web,
            CrawlConfig(num_parts=4, max_rounds=8, fetch_robots=False,
                        default_host_budget=120, batch_levels=batch),
        )
        log = [(r.seq, r.url_key, r.round)
               for r in sched.run(seeds=seeds).orderBy("seq").collect()]
        return sched, log

    sched_b, got = crawl(4, "b")
    assert sched_b.block_fallbacks >= 1, "budget fallback never triggered"
    _, base = crawl(1, "u")
    assert got == base


def test_batch_levels_golden_untouched(spark, tmp_path):
    """Robots fetching is on in the reference-parity golden crawl, so
    batching must never engage and the order must stay golden even with
    batch_levels set."""
    cat, urls = _run(
        spark, tmp_path,
        CrawlConfig(num_parts=8, max_rounds=10, batch_levels=4),
    )
    assert urls == GOLDEN_VISIT_ORDER
    seen = {r.url_key for r in cat.read("url_seen").collect()}
    assert seen == GOLDEN_SEEN


def test_salted_auto_hot_host(spark, tmp_path):
    """A Zipf-head host (most of the frontier on ONE host) must trip the
    salted-auto switch even though frontier/hosts stays under the threshold,
    via the lagged per-host max probed on the deferred tail — and the crawl
    result must be identical to the unsalted plan (order-identical salting)."""
    from httrack2warc_spark.frontier import generate_web

    # hot: 1 host × 600 pages; cold: 30 hosts × 6 pages  → avg ≈ 25/host
    hot, hot_seeds = generate_web(
        spark, 1, 600, out_degree=6, cross_host_every=0, host_prefix="hot")
    cold, cold_seeds = generate_web(
        spark, 30, 6, out_degree=2, cross_host_every=1)
    from httrack2warc_spark.frontier.synth import SyntheticWeb
    web = SyntheticWeb(hot.pages.unionByName(cold.pages),
                       hot.links.unionByName(cold.links))
    seeds = hot_seeds + cold_seeds

    def crawl(salted):
        # fetch_robots=True keeps hosts_crawled populated, so the AVERAGE
        # heuristic sees ~500/31 ≈ 16 < 100 and stays off — only the probe
        # can trip the switch here
        cfg = CrawlConfig(
            num_parts=8, max_rounds=6,
            default_host_budget=50, salted_topk=salted,
            salt_auto_threshold=100, commit_every=2,
        )
        cat = TableCatalog(spark, str(tmp_path / f"c_{salted}"))
        sched = FrontierScheduler(spark, cat, web, cfg)
        log = sched.run(seeds=seeds)
        order = [(r.seq, r.url) for r in log.orderBy("seq").collect()]
        return sched, cat, order

    sched, cat, order = crawl("auto")
    # budget 50 on a 600-page host keeps >100 rows queued on `hot0` after the
    # first window, while frontier/hosts stays ~25 — only the max-probe can
    # see it. Lag: the probe lands with flush 1, switching from round 2 on.
    assert sched.salted_rounds, "hot host never tripped the salted switch"
    assert min(sched.salted_rounds) >= 1  # lagged signal: never round 0
    salted_metrics = {
        r.round for r in cat.read("metrics").where("salted").collect()
    }
    assert salted_metrics == sched.salted_rounds  # audit row matches
    # order-identical: forced-off plan produces the same (seq, url) sequence
    _, _, order_off = crawl(False)
    assert order == order_off


# ---------------------------------------------------------------------------
# Global round capacity (water-filling)
# ---------------------------------------------------------------------------


def test_round_capacity_caps_every_round_and_loses_nothing(spark, tmp_path):
    """With cfg.round_capacity set, no round fetches more than the cap, the
    cap binds max-min fairly (no host starved while another holds surplus),
    and the capped crawl still visits the exact URL set of the uncapped
    crawl — slower, never lossier."""
    from httrack2warc_spark.frontier.synth import generate_web

    web, seeds = generate_web(spark, n_hosts=3, pages_per_host=12,
                              out_degree=3, num_partitions=4)

    def crawl(tmp, **kw):
        cat = TableCatalog(spark, str(tmp))
        cfg = CrawlConfig(num_parts=4, max_rounds=40, fetch_robots=False, **kw)
        log = FrontierScheduler(spark, cat, web, cfg).run(seeds=seeds)
        return log.select("seq", "round", "url", "host").collect()

    capped = crawl(tmp_path / "capped", round_capacity=5)
    uncapped = crawl(tmp_path / "uncapped")

    assert {r.url for r in capped} == {r.url for r in uncapped}

    from collections import Counter, defaultdict
    per_round = Counter(r.round for r in capped)
    assert max(per_round.values()) <= 5
    # fairness: in every round that bound (fetched == cap), no host may be
    # starved (0 rows) while another got 2+ — max-min keeps levels balanced
    by_round_host = defaultdict(Counter)
    frontier_hosts = defaultdict(set)
    for r in capped:
        by_round_host[r.round][r.host] += 1
    for rnd, cnt in per_round.items():
        if cnt == 5 and len(by_round_host[rnd]) > 1:
            takes = sorted(by_round_host[rnd].values())
            assert takes[-1] - takes[0] <= 1


def test_round_capacity_identity_when_loose(spark, tmp_path):
    """A capacity the frontier never reaches must not perturb the golden
    visit order (allocation == demand for every host)."""
    cat, urls = _run(
        spark, tmp_path,
        CrawlConfig(num_parts=8, max_rounds=10, round_capacity=1000),
    )
    assert urls == GOLDEN_VISIT_ORDER


def test_extract_text_pages_drain(spark, tmp_path):
    """cfg.extract_text: fetched HTML bodies run through the html_to_text
    chain and land in the `pages` table on the commit wave — robots bodies
    excluded, visit order untouched (pure drain)."""
    from pyspark.sql import functions as F

    from httrack2warc_spark.frontier import CrawlConfig, FrontierScheduler
    from httrack2warc_spark.frontier.synth import SyntheticWeb
    from httrack2warc_spark.sinks.tables import TableCatalog

    host = "ext.example.org"
    page_html = ("<html><head><title>Front &amp; Center</title>"
                 "<script>var x = 1 < 2;</script></head>"
                 "<body><p>hello world</p><div>from page one</div></body></html>")
    robots_body = "User-agent: *\nDisallow:\n"
    pages = spark.createDataFrame(
        [(f"{host}/robots.txt", 200, "text/plain", len(robots_body), "r", None,
          robots_body),
         (f"{host}/", 200, "text/html", len(page_html), "f", None, page_html),
         (f"{host}/page/1", 200, "text/html", 40, "g", None,
          "<body><p>second page text here</p></body>")],
        "url_key string, status int, mime string, size long, localfile string, "
        "image_id string, body string",
    )
    links = spark.createDataFrame(
        [(f"{host}/", 0, f"http://{host}/page/1")],
        "src_key string, link_idx int, dst_url string",
    )
    web = SyntheticWeb(pages, links, broadcast_pages=True)
    cat = TableCatalog(spark, str(tmp_path / "ext"))
    sched = FrontierScheduler(
        spark, cat, web,
        CrawlConfig(num_parts=4, max_rounds=4, extract_text=True),
    )
    log = sched.run(seeds=[f"http://{host}/"])
    got = {r.url_key: (r.title, r.text, r.n_tokens)
           for r in cat.read("pages").collect()}
    assert got[f"{host}/"] == ("Front & Center", "hello world\nfrom page one", 5)
    assert got[f"{host}/page/1"] == ("", "second page text here", 4)
    assert f"{host}/robots.txt" not in got          # robots bodies excluded
    # pure drain: the visit order matches the same crawl without the gate
    cat2 = TableCatalog(spark, str(tmp_path / "ext2"))
    log2 = FrontierScheduler(
        spark, cat2, web, CrawlConfig(num_parts=4, max_rounds=4),
    ).run(seeds=[f"http://{host}/"])
    assert [(r.seq, r.url) for r in log.orderBy("seq").collect()] == \
           [(r.seq, r.url) for r in log2.orderBy("seq").collect()]


def test_extract_text_pages_drain_block_path(spark, tmp_path):
    """The level-block path must drain pages too: bodies survive the block
    materialization (fetch_cols carries `body` when extract_text is on) and
    every fused round's pages land — identical rows to the per-round path."""
    from httrack2warc_spark.frontier import CrawlConfig, FrontierScheduler
    from httrack2warc_spark.frontier.synth import SyntheticWeb
    from httrack2warc_spark.sinks.tables import TableCatalog

    host = "blk.example.org"
    def body(n):
        return f"<body><p>page {n} text body here</p></body>"
    pages = spark.createDataFrame(
        [(f"{host}/", 200, "text/html", 30, "a", None, body(0)),
         (f"{host}/p/1", 200, "text/html", 30, "b", None, body(1)),
         (f"{host}/p/2", 200, "text/html", 30, "c", None, body(2)),
         (f"{host}/p/3", 200, "text/html", 30, "d", None, body(3))],
        "url_key string, status int, mime string, size long, localfile string, "
        "image_id string, body string",
    )
    links = spark.createDataFrame(
        [(f"{host}/", 0, f"http://{host}/p/1"),
         (f"{host}/p/1", 0, f"http://{host}/p/2"),
         (f"{host}/p/2", 0, f"http://{host}/p/3")],
        "src_key string, link_idx int, dst_url string",
    )
    web = SyntheticWeb(pages, links, broadcast_pages=True)
    cfg = CrawlConfig(num_parts=4, max_rounds=6, fetch_robots=False,
                      batch_levels=3, extract_text=True)
    cat = TableCatalog(spark, str(tmp_path / "blk"))
    sched = FrontierScheduler(spark, cat, web, cfg)
    sched.run(seeds=[f"http://{host}/"])
    assert sched.block_rounds                 # blocks actually engaged
    got = {r.url_key: (r.text, r.n_tokens)
           for r in cat.read("pages").collect()}
    assert got == {
        f"{host}/": ("page 0 text body here", 5),
        f"{host}/p/1": ("page 1 text body here", 5),
        f"{host}/p/2": ("page 2 text body here", 5),
        f"{host}/p/3": ("page 3 text body here", 5),
    }


def test_blocklist_gate_blocks_subdomains_only(spark, tmp_path):
    """cfg.blocklist: a listed domain blocks its host + subdomains at the
    exclusion gate (never probed, never fetched); sibling domains and the
    string-suffix trap (notblocked.org vs blocked.org) stay crawlable."""
    from httrack2warc_spark.frontier import CrawlConfig, FrontierScheduler
    from httrack2warc_spark.frontier.synth import SyntheticWeb
    from httrack2warc_spark.sinks.tables import TableCatalog

    def page(k):
        return (k, 200, "text/html", 10, k, None)
    pages = spark.createDataFrame(
        [page("ok.example.com/"), page("blocked.org/"),
         page("sub.blocked.org/"), page("notblocked.org/")],
        "url_key string, status int, mime string, size long, "
        "localfile string, image_id string",
    )
    links = spark.createDataFrame(
        [("ok.example.com/", 0, "http://blocked.org/"),
         ("ok.example.com/", 1, "http://sub.blocked.org/"),
         ("ok.example.com/", 2, "http://notblocked.org/")],
        "src_key string, link_idx int, dst_url string",
    )
    web = SyntheticWeb(pages, links, broadcast_pages=True)
    cat = TableCatalog(spark, str(tmp_path / "bl"))
    log = FrontierScheduler(
        spark, cat, web,
        CrawlConfig(num_parts=4, max_rounds=4, fetch_robots=False,
                    blocklist=["blocked.org"]),
    ).run(seeds=["http://ok.example.com/"])
    visited = {r.url_key for r in log.collect()}
    assert visited == {"ok.example.com/", "notblocked.org/"}
