"""Crawl-hygiene + batch-prep operators (operators/crawlops.py, plus the
graph link-prediction scorer): query canonicalization, trap signals, retry
backoff, aspect bucketing, common-neighbor scores — fixture-pinned
semantics with hand-computed expecteds."""

from pyspark.sql import functions as F

from httrack2warc_spark.operators.crawlops import (
    assign_aspect_buckets,
    canonicalize_query_col,
    retry_schedule,
    trap_signals,
)
from httrack2warc_spark.operators.graph import common_neighbor_scores


def _canon(spark, url: str) -> str:
    return (
        spark.range(1)
        .select(canonicalize_query_col(F.lit(url)).alias("c"))
        .collect()[0]["c"]
    )


def test_canonicalize_query_sorts_and_strips(spark):
    assert (
        _canon(spark, "http://h/p?b=2&utm_source=news&&a=1&gclid=X#frag")
        == "http://h/p?a=1&b=2"
    )
    # no surviving params -> the '?' disappears entirely (the dedup point)
    assert _canon(spark, "http://h/p?utm_campaign=x&fbclid=Y") == "http://h/p"
    assert _canon(spark, "http://h/p") == "http://h/p"
    # bare tracking name without '=' is still dropped; non-tracking kept
    assert _canon(spark, "http://h/p?ref&z=9") == "http://h/p?z=9"
    # a param whose name merely CONTAINS a tracking name survives (anchored)
    assert _canon(spark, "http://h/p?xref=1") == "http://h/p?xref=1"


def test_trap_signals_fields(spark):
    rows = (
        spark.createDataFrame(
            [
                ("http://h/a/b/c",),
                ("http://h/a/b/a/b/a",),  # segs a,b,a,b,a -> 5, distinct 2
                ("http://h/p?a=1&b=2&c=3#f",),
                ("http://h/" + "/".join(f"s{i}" for i in range(10)),),
            ],
            "url string",
        )
        .select(trap_signals(F.col("url")).alias("t"))
        .select("t.*")
        .collect()
    )
    assert (rows[0]["path_depth"], rows[0]["repeated_segments"]) == (3, 0)
    assert not rows[0]["is_trap"]
    assert (rows[1]["path_depth"], rows[1]["repeated_segments"]) == (5, 3)
    assert rows[1]["is_trap"]  # mirror loop
    assert rows[2]["n_params"] == 3 and not rows[2]["is_trap"]
    assert rows[3]["path_depth"] == 10 and rows[3]["is_trap"]  # too deep


def test_retry_schedule_exact(spark):
    import hashlib

    df = spark.createDataFrame(
        [("http://h/x", 0, "2020-05-04 00:00:00"),
         ("http://h/x", 3, "2020-05-04 00:00:00"),
         ("http://h/x", 40, "2020-05-04 00:00:00")],
        "url string, attempt int, last_ts string",
    )
    out = {r["attempt"]: r for r in retry_schedule(df).collect()}
    for att, core in [(0, 30), (3, 240), (40, 86_400)]:  # 30<<3=240; capped
        j = int(hashlib.md5(f"http://h/x:{att}".encode()).hexdigest()[:8], 16) % 60
        assert out[att]["delay_s"] == core + j
        # epoch micros of 2020-05-04T00:00:00Z + delay seconds
        assert out[att]["next_us"] == 1588550400_000000 + (core + j) * 1_000_000


def test_aspect_buckets_exact_argmin(spark):
    df = spark.createDataFrame(
        [(1, 512, 512),   # exactly 1:1
         (2, 640, 480),   # exactly 4:3
         (3, 600, 480),   # 5:4 -> nearer 4:3 (|5/4-4/3|=1/12) than 1:1 (1/4)
         (4, 1280, 720)], # exactly 16:9
        "id int, w int, h int",
    )
    out = {r["id"]: r for r in assign_aspect_buckets(df).collect()}
    assert (out[1]["bucket_n"], out[1]["bucket_d"]) == (1, 1)
    assert (out[2]["bucket_n"], out[2]["bucket_d"]) == (4, 3)
    assert (out[3]["bucket_n"], out[3]["bucket_d"]) == (4, 3)
    assert (out[4]["bucket_n"], out[4]["bucket_d"]) == (16, 9)
    assert (out[4]["target_w"], out[4]["target_h"]) == (1024, 576)


def test_aspect_buckets_tie_breaks_low_index(spark):
    # w/h = 2 sits exactly between 3/2 (diff 1/2) and ... no; use a true tie:
    # w/h such that |w*d1-h*n1|*wt1 == |w*d2-h*n2|*wt2. 1:1 vs 4:3 tie at
    # w/h = 7/6: |7-6|*10368 = 10368; |21-24|*3456 = 10368. Earlier bucket
    # (1:1, index 0) must win.
    df = spark.createDataFrame([(1, 7, 6)], "id int, w int, h int")
    r = assign_aspect_buckets(df).collect()[0]
    assert (r["bucket_n"], r["bucket_d"]) == (1, 1)


def test_common_neighbor_scores_path_graph(spark):
    # path 0-1-2-3-4: non-adjacent distance-2 pairs (0,2),(1,3),(2,4), one
    # common neighbor each; degrees 1,2,2,2,1
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4)], "a int, b int"
    )
    rows = {
        (r["a"], r["b"]): (r["common"], r["deg_a"], r["deg_b"])
        for r in common_neighbor_scores(e).collect()
    }
    assert rows == {
        (0, 2): (1, 1, 2),
        (1, 3): (1, 2, 2),
        (2, 4): (1, 2, 1),
    }


def test_common_neighbor_scores_center_cap_keeps_degrees_exact(spark):
    # star 0-{1..5} plus edge 1-2: pairs through hub 0 vanish under the cap,
    # but the surviving pair's DEGREES still count the hub edges
    edges = [(0, i) for i in range(1, 6)] + [(1, 2)]
    e = spark.createDataFrame(edges, "a int, b int")
    uncapped = common_neighbor_scores(e).where(
        (F.col("a") == 3) | (F.col("b") == 3)
    )
    assert uncapped.count() > 0  # hub wedges exist without the cap
    capped = {
        (r["a"], r["b"]): (r["common"], r["deg_a"], r["deg_b"])
        for r in common_neighbor_scores(e, max_center_degree=3).collect()
    }
    # only centers 1 and 2 (deg 2) survive the cap; every wedge through
    # them closes into an existing star edge, so NO pair remains — the cap
    # engaged and dropped exactly the hub-witnessed pairs
    assert capped == {}


def test_common_neighbor_scores_mixed_witness_exact_under_cap(spark):
    """A pair witnessed by BOTH a hub and a small center must get the
    exact common count (hub witnesses counted in the recount), not the
    candidate-generation undercount — the 'candidates capped, verify
    exact' contract."""
    # hub 0 — {1, 2, 4, 5, 6}; small center 3 — {1, 2}
    edges = [(0, i) for i in (1, 2, 4, 5, 6)] + [(1, 3), (2, 3)]
    e = spark.createDataFrame(edges, "a int, b int")
    # deg(0)=5 > cap; pair (1,2) has witnesses {0, 3}: candidate comes
    # only from center 3, but common must still be the true 2
    capped = {
        (r["a"], r["b"]): (r["common"], r["deg_a"], r["deg_b"])
        for r in common_neighbor_scores(e, max_center_degree=3).collect()
    }
    assert capped[(1, 2)] == (2, 2, 2)
    # and it agrees with the uncapped exact path for that pair
    exact = {
        (r["a"], r["b"]): r["common"]
        for r in common_neighbor_scores(e).collect()
    }
    assert exact[(1, 2)] == 2


# ---------------------------------------------------------------------------
# scheduler integration: the hygiene gates as CrawlConfig options
# ---------------------------------------------------------------------------

def _hygiene_web(spark):
    """Three-page web: the index links to (a) two utm/ordering permutations
    of the SAME query page, (b) a trap URL (12 path segments), (c) a normal
    page."""
    from httrack2warc_spark.frontier.synth import SyntheticWeb

    trap = "h.example.org" + "/seg" * 12 + "/leaf.html"
    pages = spark.createDataFrame(
        [
            ("h.example.org/", 200, "text/html", 10, "index.html", None),
            ("h.example.org/q.html?a=1&b=2", 200, "text/html", 10, "q.html", None),
            ("h.example.org/plain.html", 200, "text/html", 10, "plain.html", None),
            (trap, 200, "text/html", 10, "trap.html", None),
        ],
        "url_key string, status int, mime string, size long, "
        "localfile string, image_id string",
    )
    links = spark.createDataFrame(
        [
            ("h.example.org/", 0, "http://h.example.org/q.html?b=2&utm_source=news&a=1"),
            ("h.example.org/", 1, "http://h.example.org/q.html?a=1&gclid=XY&b=2"),
            ("h.example.org/", 2, "http://" + trap),
            ("h.example.org/", 3, "http://h.example.org/plain.html"),
        ],
        "src_key string, link_idx int, dst_url string",
    )
    return SyntheticWeb(pages, links)


def _crawl_urls(spark, tmp_path, name, **cfg_kwargs):
    from httrack2warc_spark.frontier.scheduler import CrawlConfig, FrontierScheduler
    from httrack2warc_spark.sinks.tables import TableCatalog

    cat = TableCatalog(spark, str(tmp_path / name))
    sched = FrontierScheduler(
        spark, cat, _hygiene_web(spark),
        CrawlConfig(num_parts=4, max_rounds=4, fetch_robots=False, **cfg_kwargs),
    )
    log = sched.run(seeds=["http://h.example.org/"])
    return [r.url for r in log.orderBy("seq").collect()]


def test_scheduler_hygiene_gates_off_by_default(spark, tmp_path):
    urls = _crawl_urls(spark, tmp_path, "off")
    # both permutations fetched (distinct raw keys), trap fetched
    assert sum("q.html" in u for u in urls) == 2
    assert any("/seg/seg" in u for u in urls)
    assert len(urls) == 5


def test_scheduler_canonicalize_query_collapses_permutations(spark, tmp_path):
    urls = _crawl_urls(spark, tmp_path, "canon", canonicalize_query=True)
    # ONE canonical fetch, under the sorted tracking-stripped form
    assert [u for u in urls if "q.html" in u] == [
        "http://h.example.org/q.html?a=1&b=2"
    ]
    assert len(urls) == 4


def test_scheduler_trap_guard_drops_trap_urls(spark, tmp_path):
    urls = _crawl_urls(spark, tmp_path, "trap", trap_guard=True)
    assert not any("/seg/seg" in u for u in urls)
    assert len(urls) == 4  # index + 2 permutations + plain


def test_canonicalize_query_udf_not_duplicated(spark, tmp_path):
    """canonicalize_query_col references the WHATWG UDF's output many times
    (base/query/filter subtrees); after CollapseProject inlining, the
    extracted Python-UDF stage must still evaluate the UDF ONCE per row —
    duplicate PythonUDF expressions dedupe at extraction."""
    from httrack2warc_spark.frontier.scheduler import CrawlConfig, FrontierScheduler
    from httrack2warc_spark.sinks.tables import TableCatalog

    cat = TableCatalog(spark, str(tmp_path / "plan"))
    sched = FrontierScheduler(
        spark, cat, _hygiene_web(spark),
        CrawlConfig(num_parts=4, fetch_robots=False, canonicalize_query=True,
                    trap_guard=True),
    )
    df = sched._apply_exclusions(
        sched._canonicalize(
            spark.createDataFrame([("http://h/x?b=1&a=2",)], ["raw_url"]),
            "raw_url",
        )
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re
    assert len(re.findall(r"canonicalize_urls", plan)) <= 2, plan  # def + ref


def test_trap_guard_golden_fixture_safe(spark, tmp_path):
    """trap_guard at default thresholds passes every URL of the reference
    fixture crawl — the golden visit order is unchanged with the gate ON.
    (canonicalize_query intentionally is NOT golden-safe: the fixture's
    query.html URL carries unsorted + empty params and a fragment, and
    rewriting that key is the operator's entire point — so only the trap
    gate gets a fixture-safety pin.)"""
    from httrack2warc_spark.frontier.scheduler import CrawlConfig, FrontierScheduler
    from httrack2warc_spark.frontier.synth import fixture_web
    from httrack2warc_spark.sinks.tables import TableCatalog
    from tests.test_scheduler import GOLDEN_VISIT_ORDER

    cat = TableCatalog(spark, str(tmp_path / "golden-trap"))
    log = FrontierScheduler(
        spark, cat, fixture_web(spark),
        CrawlConfig(num_parts=8, max_rounds=10, trap_guard=True),
    ).run(seeds=["http://test.example.org/"])
    assert [r.url for r in log.orderBy("seq").collect()] == GOLDEN_VISIT_ORDER


# ---------------------------------------------------------------------------
# sitemap ingestion
# ---------------------------------------------------------------------------

_SM_BODY = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc> http://h.example.org/sm1.html </loc><lastmod>2024-01-01</lastmod></url>
  <url><loc>http://h.example.org/sm2.html?a=1&amp;b=2</loc></url>
  <url><loc>http://h.example.org/amp&amp;lt;.html</loc></url>
</urlset>"""

_SM_INDEX = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://h.example.org/sitemap-child.xml</loc></sitemap>
</sitemapindex>"""


def test_sitemap_locs_order_and_entities(spark):
    from httrack2warc_spark.operators.crawlops import sitemap_locs

    got = (
        spark.createDataFrame([(_SM_BODY,)], ["body"])
        .select(sitemap_locs(F.col("body")).alias("locs"))
        .collect()[0]["locs"]
    )
    assert got == [
        "http://h.example.org/sm1.html",          # whitespace trimmed
        "http://h.example.org/sm2.html?a=1&b=2",  # &amp; decoded
        "http://h.example.org/amp&lt;.html",      # &amp;lt; -> literal &lt;
    ]


def test_sitemap_outlinks_shape(spark):
    from httrack2warc_spark.operators.crawlops import (
        SITEMAP_LINK_IDX_OFFSET,
        sitemap_outlinks,
    )

    fetched = spark.createDataFrame(
        [
            ("http://h.example.org/sitemap.xml", 7, 1, _SM_BODY),
            ("http://h.example.org/plain.html", 8, 1, "<html>not a sitemap"),
            ("http://h.example.org/feed", 9, 2, _SM_INDEX),  # body-sniffed
            ("http://h.example.org/nobody.xml", 10, 2, None),
        ],
        "url string, seq long, depth int, body string",
    )
    rows = sorted(
        (r.parent_seq, r.link_idx, r.dst_url)
        for r in sitemap_outlinks(fetched).collect()
    )
    assert rows == [
        (7, SITEMAP_LINK_IDX_OFFSET + 0, "http://h.example.org/sm1.html"),
        (7, SITEMAP_LINK_IDX_OFFSET + 1, "http://h.example.org/sm2.html?a=1&b=2"),
        (7, SITEMAP_LINK_IDX_OFFSET + 2, "http://h.example.org/amp&lt;.html"),
        (9, SITEMAP_LINK_IDX_OFFSET + 0, "http://h.example.org/sitemap-child.xml"),
    ]


def _sitemap_web(spark):
    """index -> {page.html, sitemap.xml}; the sitemap's body lists two pages
    not linked from anywhere, plus page.html (already discovered via the
    real link — the probe must dedup it, not double-fetch)."""
    from httrack2warc_spark.frontier.synth import SyntheticWeb

    body = """<urlset>
      <url><loc>http://h.example.org/only-in-sitemap-1.html</loc></url>
      <url><loc>http://h.example.org/page.html</loc></url>
      <url><loc>http://h.example.org/only-in-sitemap-2.html</loc></url>
    </urlset>"""
    pages = spark.createDataFrame(
        [
            ("h.example.org/", 200, "text/html", 10, "index.html", None, None),
            ("h.example.org/page.html", 200, "text/html", 10, "p.html", None, None),
            ("h.example.org/sitemap.xml", 200, "application/xml", 10, "s.xml",
             None, body),
            ("h.example.org/only-in-sitemap-1.html", 200, "text/html", 10,
             "o1.html", None, None),
            ("h.example.org/only-in-sitemap-2.html", 200, "text/html", 10,
             "o2.html", None, None),
        ],
        "url_key string, status int, mime string, size long, "
        "localfile string, image_id string, body string",
    )
    links = spark.createDataFrame(
        [
            ("h.example.org/", 0, "http://h.example.org/page.html"),
            ("h.example.org/", 1, "http://h.example.org/sitemap.xml"),
        ],
        "src_key string, link_idx int, dst_url string",
    )
    return SyntheticWeb(pages, links)


def test_scheduler_discover_sitemaps_e2e(spark, tmp_path):
    from httrack2warc_spark.frontier.scheduler import CrawlConfig, FrontierScheduler
    from httrack2warc_spark.sinks.tables import TableCatalog

    def crawl(name, **kw):
        cat = TableCatalog(spark, str(tmp_path / name))
        log = FrontierScheduler(
            spark, cat, _sitemap_web(spark),
            CrawlConfig(num_parts=4, max_rounds=5, fetch_robots=False, **kw),
        ).run(seeds=["http://h.example.org/"])
        return [r.url for r in log.orderBy("seq").collect()]

    off = crawl("off")
    assert not any("only-in-sitemap" in u for u in off)
    assert len(off) == 3  # index, page, sitemap

    on = crawl("on", discover_sitemaps=True)
    # the two sitemap-only pages are crawled, page.html exactly once, and
    # sitemap entries land AFTER real links of the same level (idx offset)
    assert sum("only-in-sitemap" in u for u in on) == 2
    assert sum(u.endswith("/page.html") for u in on) == 1
    assert len(on) == 5
    # determinism: same crawl again, identical order
    assert crawl("on2", discover_sitemaps=True) == on


def test_pack_image_batches_exact(spark):
    """Two buckets, B=3: ranks and batch indexes hand-computed; drop_last
    removes each bucket's incomplete tail batch."""
    from httrack2warc_spark.operators.crawlops import pack_image_batches

    rows = [(f"i{i:02d}", 1, 1) for i in range(7)] + [
        (f"j{i:02d}", 4, 3) for i in range(3)
    ]
    images = spark.createDataFrame(rows, "image_id string, bucket_n int, bucket_d int")
    caches = []
    out = pack_image_batches(
        images, batch_size=3, order_cols=("image_id",), cache_handle=caches
    )
    got = {
        r.image_id: (r.rank_in_bucket, r.batch_idx) for r in out.collect()
    }
    assert got["i00"] == (0, 0) and got["i02"] == (2, 0)
    assert got["i03"] == (3, 1) and got["i06"] == (6, 2)
    assert got["j00"] == (0, 0) and got["j02"] == (2, 0)

    dropped = pack_image_batches(
        images, batch_size=3, order_cols=("image_id",), drop_last=True,
        cache_handle=caches,
    )
    kept = sorted(r.image_id for r in dropped.collect())
    # 1x1 bucket: 7 -> keep 6; 4:3 bucket: exactly one full batch, all kept
    assert kept == [f"i{i:02d}" for i in range(6)] + ["j00", "j01", "j02"]
    for c in caches:
        c.unpersist()


def test_domain_blocklist_hierarchy(spark):
    from pyspark.sql import functions as F

    from httrack2warc_spark.operators.crawlops import (
        domain_blocklist_filter,
        host_suffixes,
    )

    df = spark.createDataFrame(
        [(1, "a.b.example.com"), (2, "example.com"), (3, "notexample.com"),
         (4, "deep.sub.other.org"), (5, "other.org"), (6, "com")],
        "id long, host string",
    )
    rules = spark.createDataFrame([("example.com",), ("sub.other.org",)],
                                  "domain string")
    kept = {r.id for r in domain_blocklist_filter(df, "host", rules).collect()}
    # example.com blocks itself + subdomains; notexample.com is NOT a
    # subdomain (string suffix != domain suffix); sub.other.org blocks the
    # deep host but not the parent other.org
    assert kept == {3, 5, 6}
    allow = {r.id for r in
             domain_blocklist_filter(df, "host", rules, keep=True).collect()}
    assert allow == {1, 2, 4}
    sfx = df.where(F.col("id") == 1).select(
        F.explode(host_suffixes(F.col("host"))).alias("s")).collect()
    assert [r.s for r in sfx] == [
        "a.b.example.com", "b.example.com", "example.com", "com"]


def test_robots_sitemap_directive_discovery(spark, tmp_path):
    """A `Sitemap:` line in robots.txt leads the crawler to the sitemap,
    whose <urlset> then surfaces an otherwise-unlinked page — the full
    robots → sitemap → orphan chain, all through the normal discovery plan."""
    from httrack2warc_spark.frontier import CrawlConfig, FrontierScheduler
    from httrack2warc_spark.frontier.synth import SyntheticWeb
    from httrack2warc_spark.operators.crawlops import robots_sitemap_outlinks
    from httrack2warc_spark.sinks.tables import TableCatalog

    host = "sm.example.org"
    robots_body = (
        "User-agent: *\nDisallow:\n"
        f"SITEMAP:  http://{host}/sitemap.xml\n"    # case + padding
    )
    sitemap_body = (
        '<?xml version="1.0"?><urlset>'
        f"<loc>http://{host}/orphan.html</loc></urlset>"
    )
    pages = spark.createDataFrame(
        [(f"{host}/robots.txt", 200, "text/plain", 10, "r", None, robots_body),
         (f"{host}/", 200, "text/html", 10, "a", None, None),
         (f"{host}/sitemap.xml", 200, "text/xml", 10, "s", None, sitemap_body),
         (f"{host}/orphan.html", 200, "text/html", 10, "o", None, None)],
        "url_key string, status int, mime string, size long, localfile string, "
        "image_id string, body string",
    )
    links = spark.createDataFrame(
        [], "src_key string, link_idx int, dst_url string"
    )
    web = SyntheticWeb(pages, links, broadcast_pages=True)
    cat = TableCatalog(spark, str(tmp_path / "sm"))
    log = FrontierScheduler(
        spark, cat, web,
        CrawlConfig(num_parts=4, max_rounds=8, discover_sitemaps=True),
    ).run(seeds=[f"http://{host}/"])
    visited = {r.url_key for r in log.collect()}
    assert f"{host}/sitemap.xml" in visited       # declared by robots
    assert f"{host}/orphan.html" in visited       # declared by the sitemap
    # extraction unit semantics: case-insensitive, whitespace-tolerant key
    # (the Google-parser behavior: spaces may surround the colon); a
    # mid-line "...sitemap:" never matches (line-anchored)
    rows = robots_sitemap_outlinks(
        spark.createDataFrame(
            [(1, 0, "http://h/robots.txt",
              "User-agent: *\nnot a sitemap: nope\n"
              "  Sitemap : http://h/a.xml\nsitemap:\thttp://h/b.xml")],
            "seq long, depth int, url string, body string",
        )
    ).collect()
    assert [(r.dst_url, r.link_idx) for r in rows] == [
        ("http://h/a.xml", 2_000_000), ("http://h/b.xml", 2_000_001)]
