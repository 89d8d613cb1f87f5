"""The reference's end-to-end golden test (Httrack2WarcTest.java:39-103):
exclusion ``.*/another`` + redirect prefix ⇒ exact 29-record WARC sequence."""

from pyspark.sql import functions as F

from httrack2warc_spark.sinks.warc import (
    cdx_lines,
    format_warcinfo,
    warc_records,
    warcinfo_record,
)
from httrack2warc_spark.sources.crawl import read_crawl
from httrack2warc_spark.sources.htslogs import read_crawl_meta

GOLDEN = """warcinfo null
response http://test.example.org/
request http://test.example.org/
metadata http://test.example.org/
response http://prefix.example.org/test.example.org/index.html
response http://test.example.org/style.css
request http://test.example.org/style.css
metadata http://test.example.org/style.css
response http://prefix.example.org/test.example.org/style.css
response http://test.example.org/query.html?page=1&query=2&FOO=3&&BaR=4&&#anchor
request http://test.example.org/query.html?page=1&query=2&FOO=3&&BaR=4&&#anchor
metadata http://test.example.org/query.html?page=1&query=2&FOO=3&&BaR=4&&#anchor
response http://prefix.example.org/test.example.org/query3b6f.html
response http://test.example.org/redirect
request http://test.example.org/redirect
metadata http://test.example.org/redirect
response http://prefix.example.org/test.example.org/redirect
response http://test.example.org/page%20WITH%20%22special%22%20chars.html
request http://test.example.org/page%20WITH%20%22special%22%20chars.html
metadata http://test.example.org/page%20WITH%20%22special%22%20chars.html
response http://prefix.example.org/test.example.org/page%20WITH%20_special_%20chars.html
response http://test.example.org/image.gif
request http://test.example.org/image.gif
metadata http://test.example.org/image.gif
response http://prefix.example.org/test.example.org/image.gif
response http://test.example.org/image404.png
request http://test.example.org/image404.png
metadata http://test.example.org/image404.png
response http://prefix.example.org/test.example.org/image404.png"""


def test_warc_golden_sequence(spark, crawl_dir):
    meta = read_crawl_meta(crawl_dir)
    crawl = read_crawl(spark, crawl_dir)
    recs = warc_records(
        crawl,
        meta,
        exclusions=[".*/another"],
        redirect_prefix="http://prefix.example.org/",
    )
    info = warcinfo_record(
        spark, format_warcinfo(meta), "2018-02-02T15:27:21Z"
    ).select("seq", "sub", "record_type", "url")
    summary = [
        f"{r.record_type} {r.url if r.url is not None else 'null'}"
        for r in info.unionByName(recs.select("seq", "sub", "record_type", "url"))
        .orderBy("seq", "sub")
        .collect()
    ]
    assert summary == GOLDEN.splitlines()


def test_warcinfo_payload(spark, crawl_dir):
    # Httrack2WarcTest.java:66-69
    meta = read_crawl_meta(crawl_dir)
    assert format_warcinfo(meta) == (
        "software: HTTrack/3.49-2 http://www.httrack.com/\r\n"
        "software: httrack2warc https://github.com/nla/httrack2warc\r\n"
        "httrackOptions: -%H http://test.example.org/\r\n"
    )


def test_remove_transfer_encoding(spark):
    # Httrack2WarcTest.java:105-117
    from httrack2warc_spark.sinks.warc import remove_transfer_encoding

    header = (
        "HTTP/1.1 200 OK\r\nContent-Length: 400\r\nTransfer-Encoding: gzip\r\n"
        "Content-Type: image/pants\r\nTRANSFER-encoding: chunked, pizza\r\n\r\n"
    )
    out = spark.range(1).select(
        remove_transfer_encoding(F.lit(header)).alias("h")
    ).collect()[0].h
    assert out == (
        "HTTP/1.1 200 OK\r\nContent-Length: 400\r\nContent-Type: image/pants\r\n\r\n"
    )


def test_cdx_lines_sorted(spark, crawl_dir):
    meta = read_crawl_meta(crawl_dir)
    crawl = read_crawl(spark, crawl_dir)
    recs = warc_records(crawl, meta)
    lines = [r.cdx for r in cdx_lines(recs).collect()]
    assert lines == sorted(lines)
    assert len(lines) == 8  # one per response record
    assert all(len(l.split(" ")) == 11 for l in lines)


def test_warc_file_roundtrip(spark, crawl_dir, tmp_path):
    """write_warc_file output re-parses: every record has a well-formed WARC
    header and correct Content-Length."""
    import gzip

    meta = read_crawl_meta(crawl_dir)
    recs = warc_records(read_crawl(spark, crawl_dir), meta)
    path = tmp_path / "crawl-0.warc.gz"
    from httrack2warc_spark.sinks.warc import write_warc_file

    write_warc_file(recs, str(path))
    data = gzip.decompress(path.read_bytes())  # concatenated members decompress whole
    assert data.startswith(b"WARC/1.0\r\nWARC-Type: response\r\n")
    assert data.count(b"WARC/1.0\r\n") >= 24
