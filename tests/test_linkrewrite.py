"""J3 — mirror-link rewriting (LinkRewriter.java:16-92): local mirror paths in
HTML resolve back to original URLs via the crawl's filename→url map; the
``external.html?link=`` trampoline unwraps; fragments re-attach; unknown
targets stay untouched."""

from pyspark.sql import functions as F

from httrack2warc_spark.operators.linkrewrite import build_url_map, rewrite_html, rewrite_links
from httrack2warc_spark.sources.crawl import read_crawl
from httrack2warc_spark.sources.htstxt import NEW_TXT_HEADER

DOIT = (
    "-%H http://t.example.org/\n"
    "File generated automatically on Fri, 02 Feb 2018 15:27:21, do NOT edit\n"
)

HTML = (
    b'<html><body>'
    b'<a href="style.css">c</a>'
    b'<a href="sub/page2.html#frag">p2</a>'
    b'<a href="../external.html?link=http://other.example.org/x">ext</a>'
    b'<a href="http://absolute.example.org/keep">abs</a>'
    b'<img src="missing.gif">'
    b"</body></html>"
)


def _mk_crawl(tmp_path):
    d = tmp_path / "crawl"
    (d / "hts-cache").mkdir(parents=True)
    (d / "hts-cache/doit.log").write_text(DOIT)

    def row(time, url, localfile, via):
        return "\t".join(
            ["15:27:2" + time, "0/0", "---M--", "200", "added ('OK')",
             "text/html", "", url, localfile, f"(from {via})"]
        )

    (d / "hts-cache/new.txt").write_text(
        NEW_TXT_HEADER + "\n"
        + row("2", "http://t.example.org/", "t.example.org/index.html", "") + "\n"
        + row("3", "http://t.example.org/s.css", "t.example.org/style.css",
              "http://t.example.org/") + "\n"
        + row("4", "http://t.example.org/deep?p=2", "t.example.org/sub/page2.html",
              "http://t.example.org/") + "\n"
    )
    (d / "t.example.org" / "sub").mkdir(parents=True)
    (d / "t.example.org" / "index.html").write_bytes(HTML)
    (d / "t.example.org" / "style.css").write_bytes(b"body{}")
    (d / "t.example.org" / "sub" / "page2.html").write_bytes(b"<html>2</html>")
    return str(d)


def test_rewrite_html_kernel():
    url_map = {
        "http://httrack/t.example.org/style.css": "http://t.example.org/s.css",
        "http://httrack/t.example.org/sub/page2.html": "http://t.example.org/deep?p=2",
    }
    out, n = rewrite_html(
        HTML.decode("iso-8859-1"), "t.example.org/index.html", url_map
    )
    assert n == 3
    assert 'href="http://t.example.org/s.css"' in out
    assert 'href="http://t.example.org/deep?p=2#frag"' in out  # fragment re-attach
    assert 'href="http://other.example.org/x"' in out  # external.html?link= unwrap
    assert 'href="http://absolute.example.org/keep"' in out  # untouched
    assert 'src="missing.gif"' in out  # unknown target untouched


def test_rewrite_links_dataframe(spark, tmp_path):
    crawl = read_crawl(spark, _mk_crawl(tmp_path))
    # drop cache flags so index.html is eligible (no cache in this crawl)
    out = rewrite_links(spark, crawl)
    idx = out.where(F.col("filename") == "t.example.org/index.html").collect()[0]
    assert idx.links_rewritten == 3
    assert 'href="http://t.example.org/s.css"' in idx.rewritten
    css = out.where(F.col("filename") == "t.example.org/style.css").collect()[0]
    assert css.links_rewritten == 0 and css.rewritten is None  # not .html-eligible? css skipped


def test_url_map(spark, tmp_path):
    crawl = read_crawl(spark, _mk_crawl(tmp_path))
    m = {r.mirror_key: r.url for r in build_url_map(crawl).collect()}
    assert m["http://httrack/t.example.org/style.css"] == "http://t.example.org/s.css"
    assert m["http://httrack/t.example.org/sub/page2.html"] == "http://t.example.org/deep?p=2"


def test_rewrite_links_distributed_parity(spark, tmp_path):
    """The explode->join->cogroup-reassemble plan (forced) produces byte-
    identical rewritten docs and counts to the broadcast-map plan."""
    crawl = read_crawl(spark, _mk_crawl(tmp_path))
    cols = ["filename", "rewritten", "links_rewritten"]
    bcast = {r.filename: (r.rewritten, r.links_rewritten)
             for r in rewrite_links(spark, crawl, mode="broadcast")
             .select(cols).collect()}
    dist = {r.filename: (r.rewritten, r.links_rewritten)
            for r in rewrite_links(spark, crawl, mode="distributed")
            .select(cols).collect()}
    assert bcast == dist and len(bcast) >= 3
    # auto mode picks distributed when the map exceeds the threshold
    auto = {r.filename: (r.rewritten, r.links_rewritten)
            for r in rewrite_links(spark, crawl, mode="auto",
                                   broadcast_threshold=1)
            .select(cols).collect()}
    assert auto == bcast
