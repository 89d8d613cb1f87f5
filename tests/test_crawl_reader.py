"""read_crawl end-to-end against the reference test crawl
(port of HttrackRecordTest.java:49-82)."""

from httrack2warc_spark.sources.crawl import read_crawl
from httrack2warc_spark.sources.htslogs import read_crawl_meta

EXPECTED_URLS = [
    "http://test.example.org/",
    "http://test.example.org/style.css",
    "http://test.example.org/query.html?page=1&query=2&FOO=3&&BaR=4&&#anchor",
    "http://test.example.org/another",
    "http://test.example.org/redirect",
    "http://test.example.org/page%20WITH%20%22special%22%20chars.html",
    "http://test.example.org/image.gif",
    "http://test.example.org/image404.png",
]


def test_meta(crawl_dir):
    meta = read_crawl_meta(crawl_dir)
    assert meta.version == "3.49-2"
    assert meta.launch_time.isoformat() == "2018-02-02T15:27:21"
    assert meta.command_line == "-%H http://test.example.org/"


def test_read_crawl_golden(spark, crawl_dir):
    rows = read_crawl(spark, crawl_dir).orderBy("seq").collect()
    assert [r.url for r in rows] == EXPECTED_URLS
    r = rows[0]
    # HttrackRecordTest.java:60-82 — byte-exact reconstructed headers
    assert r.mime == "text/html"
    assert r.timestamp.isoformat() == "2018-02-02T15:27:22"
    assert r.request_header == (
        "GET / HTTP/1.1\r\n"
        "Connection: keep-alive\r\n"
        "Host: test.example.org\r\n"
        "User-Agent: Mozilla/4.5 (compatible; HTTrack 3.0x; Windows 98)\r\n"
        "Accept: text/html,image/png,image/jpeg,image/pjpeg,image/x-xbitmap,"
        "image/svg+xml,image/gif;q=0.9,*/*;q=0.1\r\n"
        "Accept-Language: en, *\r\n"
        "Accept-Encoding: gzip, identity;q=0.9\r\n\r\n"
    )
    assert r.response_header == (
        "HTTP/1.1 200 OK\r\n"
        "Server: nginx/1.12.1\r\n"
        "Date: Fri, 02 Feb 2018 06:27:22 GMT\r\n"
        "Content-Type: text/html\r\n"
        "Content-Length: 353\r\n"
        "Last-Modified: Fri, 02 Feb 2018 06:26:32 GMT\r\n"
        "Connection: keep-alive\r\n"
        'ETag: "5a740498-161"\r\n'
        "Accept-Ranges: bytes\r\n\r\n"
    )
    # payloads: cache for most rows, mirror-tree fallback for image.gif
    assert all(r.payload is not None for r in rows)
    assert len(rows[6].payload) == 945 and rows[6].has_cache_data is False
    # status codes straight from new.txt
    assert [r.status for r in rows] == [200, 200, 200, 200, 301, 200, 200, 404]
