"""End-to-end tests for the alternative crawl sources:

- S3 warn-log redirects (hts-err.txt 'File has moved' → synthesized 302s with
  fabricated headers, deduped, appended AFTER txt rows — HttrackCrawl.java:238-278)
- S2 debug-log fallback (logs/debug 'Record:' lines when new.txt is absent,
  first-occurrence per localfile — HttrackCrawl.java:207-236)
- S8 ndx/dat cache (length-prefixed CACHE-1.x format — NdxCache.java:31-129)
"""

from pyspark.sql import functions as F

from httrack2warc_spark.sources.caches import parse_ndx_index, read_dat_entry, read_ndx_cache
from httrack2warc_spark.sources.crawl import read_crawl
from httrack2warc_spark.sources.htstxt import NEW_TXT_HEADER

DOIT = (
    "-%H http://w.example.org/\n"
    "File generated automatically on Fri, 02 Feb 2018 15:27:21, do NOT edit\n"
)


def test_warn_log_redirects(spark, tmp_path):
    d = tmp_path / "crawl"
    (d / "hts-cache").mkdir(parents=True)
    (d / "hts-cache/doit.log").write_text(DOIT)
    row = "\t".join(
        ["15:27:22", "10/10", "---M--", "200", "added ('OK')", "text/html", "",
         "http://w.example.org/", "w.example.org/index.html", "(from )"]
    )
    (d / "hts-cache/new.txt").write_text(NEW_TXT_HEADER + "\n" + row + "\n")
    (d / "w.example.org").mkdir()
    (d / "w.example.org/index.html").write_bytes(b"<html></html>")
    (d / "hts-err.txt").write_text(
        "15:27:23\tWarning: \tFile has moved from http://w.example.org/old to http://w.example.org/new\n"
        "15:27:24\tWarning: \tFile has moved from http://w.example.org/old to http://w.example.org/new2\n"  # dup URL: dropped (A2)
        "15:27:25\tWarning: \tFile has moved from http://w.example.org/other to http://w.example.org/x\n"
        "some unrelated line\n"
    )
    rows = read_crawl(spark, str(d)).orderBy("seq").collect()
    assert [r.url for r in rows] == [
        "http://w.example.org/",
        "http://w.example.org/old",
        "http://w.example.org/other",
    ]
    redirect = rows[1]
    assert redirect.status == 302
    assert redirect.response_header == (
        "HTTP/1.0 302 Found\r\nLocation: http://w.example.org/new\r\n"
        "Server: httrack2warc reconstructed header\r\n\r\n"
    )
    assert redirect.source == "warn"
    assert redirect.filename is None


def test_debug_log_fallback(spark, tmp_path):
    d = tmp_path / "crawl"
    (d / "logs").mkdir(parents=True)
    (d / "hts-cache").mkdir()
    (d / "hts-cache/doit.log").write_text(DOIT)
    (d / "logs/debug").write_text(
        "15:27:22\tDebug: \tRecord: http://w.example.org/ -> w.example.org/index.html\n"
        "noise line\n"
        "15:27:23\tDebug: \tRecord: http://w.example.org/a -> w.example.org/a.html\n"
        "15:27:24\tDebug: \tRecord: http://w.example.org/a2 -> w.example.org/a.html\n"  # dup file: dropped (A1)
    )
    (d / "w.example.org").mkdir()
    (d / "w.example.org/index.html").write_bytes(b"<html>i</html>")
    (d / "w.example.org/a.html").write_bytes(b"<html>a</html>")
    rows = read_crawl(spark, str(d)).orderBy("seq").collect()
    assert [r.url for r in rows] == [
        "http://w.example.org/",
        "http://w.example.org/a",
    ]
    assert rows[0].status == 200  # P12 default when no header and no code
    assert bytes(rows[1].payload) == b"<html>a</html>"


def _lp(s: bytes) -> bytes:
    return str(len(s)).encode() + b"\n" + s


def _make_ndx_dat(d, url_host, url_path, payload, extra_sd=False):
    """Build a CACHE-1.x ndx/dat pair (format per NdxCache.java:36-58,96-129)."""
    # dat entry: six header strings, optional SD pair, HTS, length, payload
    dat = bytearray()
    offset = len(dat)
    for field in (b"200", str(len(payload)).encode(), b"OK", b"text/html", b"", b""):
        dat += _lp(field)
    if extra_sd:
        dat += _lp(b"SD")
        dat += _lp(b"supplementary")
    dat += _lp(b"HTS")
    dat += _lp(str(len(payload)).encode())
    dat += payload

    ndx = bytearray()
    ndx += _lp(b"CACHE-1.5")
    ndx += _lp(b"Fri, 02 Feb 2018")
    host_and_path = url_host + b"\n" + url_path + b"X"  # trailing char stripped
    ndx += _lp(host_and_path)
    ndx += str(offset).encode() + b"\n"
    (d / "hts-cache/new.ndx").write_bytes(bytes(ndx))
    (d / "hts-cache/new.dat").write_bytes(bytes(dat))


def test_ndx_cache_parse_and_read(spark, tmp_path):
    d = tmp_path / "crawl"
    (d / "hts-cache").mkdir(parents=True)
    _make_ndx_dat(d, b"http://w.example.org", b"/page.html", b"<html>ndx</html>",
                  extra_sd=True)
    entries = parse_ndx_index((d / "hts-cache/new.ndx").read_bytes())
    assert entries == [("http://w.example.org/page.html", 0)]
    dat = (d / "hts-cache/new.dat").read_bytes()
    assert read_dat_entry(dat, 0) == b"<html>ndx</html>"

    df = read_ndx_cache(spark, str(d))
    rows = df.collect()
    assert rows[0].url == "http://w.example.org/page.html"
    assert bytes(rows[0].bytes) == b"<html>ndx</html>"
    assert rows[0].has_data


def test_ndx_cache_in_read_crawl(spark, tmp_path):
    d = tmp_path / "crawl"
    (d / "hts-cache").mkdir(parents=True)
    (d / "hts-cache/doit.log").write_text(DOIT)
    row = "\t".join(
        ["15:27:22", "16/16", "---M--", "200", "added ('OK')", "text/html", "",
         "http://w.example.org/page.html", "w.example.org/page.html", "(from )"]
    )
    (d / "hts-cache/new.txt").write_text(NEW_TXT_HEADER + "\n" + row + "\n")
    _make_ndx_dat(d, b"http://w.example.org", b"/page.html", b"<html>ndx</html>")
    rows = read_crawl(spark, str(d)).collect()
    assert len(rows) == 1
    assert bytes(rows[0].payload) == b"<html>ndx</html>"
    assert rows[0].has_cache_data