"""payload_dedup: identical payloads after the first capture become WARC
revisit records (identical-payload-digest profile)."""

import datetime

from pyspark.sql import functions as F

from httrack2warc_spark.sources.htslogs import CrawlMeta
from httrack2warc_spark.sinks.warc import warc_records

SCHEMA = (
    "seq long, timestamp timestamp, url string, mime string, "
    "request_header string, response_header string, referrer string, "
    "filename string, status int, size long, payload binary, "
    "has_cache_data boolean, source string"
)


def _crawl(spark):
    ts = datetime.datetime(2020, 1, 1, 12, 0, 0)
    hdr = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
    rows = [
        (0, ts, "http://h/a", "text/html", None, hdr, None, "h/a.html",
         200, 5, b"same!", True, "t"),
        (1, ts, "http://h/b", "text/html", None, hdr, None, "h/b.html",
         200, 5, b"other", True, "t"),
        (2, ts, "http://h/c", "text/html", None, hdr, None, "h/c.html",
         200, 5, b"same!", True, "t"),   # dup of seq 0 → revisit
        (3, ts, "http://h/d", "text/html", None, None, None, None,
         404, 0, None, False, "t"),      # no payload: never dedups
        (4, ts, "http://h/e", "text/html", None, hdr, None, "h/e.html",
         200, 5, b"same!", True, "t"),   # second dup → also revisit of seq 0
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_revisit_records(spark):
    recs = warc_records(_crawl(spark), CrawlMeta(), strict=False,
                        payload_dedup=True)
    by_seq = {r.seq: r for r in recs.where(F.col("sub") == 0).collect()}
    assert by_seq[0].record_type == "response"
    assert by_seq[1].record_type == "response"
    for s in (2, 4):
        r = by_seq[s]
        assert r.record_type == "revisit"
        assert "WARC-Type: revisit" in r.warc_header
        # revisit records are WARC/1.1 (Refers-To-Target-URI/-Date are 1.1
        # fields); the rest of the file stays 1.0
        assert r.warc_header.startswith("WARC/1.1\r\n")
        assert ("WARC-Profile: http://netpreserve.org/warc/1.1/revisit/"
                "identical-payload-digest") in r.warc_header
        assert "WARC-Refers-To-Target-URI: http://h/a" in r.warc_header
        assert f"WARC-Payload-Digest: sha1:{by_seq[0].digest}" in r.warc_header
        # refers-to is the ORIGINAL record's id, verbatim
        orig_id = by_seq[0].warc_header.split("WARC-Record-ID: ")[1].split("\r\n")[0]
        assert f"WARC-Refers-To: {orig_id}" in r.warc_header
        # body = HTTP headers only, no payload; Content-Length matches
        assert bytes(r.body).endswith(b"\r\n\r\n") and b"same!" not in bytes(r.body)
        clen = int(r.warc_header.split("Content-Length: ")[-1].split("\r\n")[0])
        assert clen == len(bytes(r.body))
        assert r.digest == by_seq[0].digest  # CDX k column still the payload digest

    # off by default: everything stays a full response
    plain = warc_records(_crawl(spark), CrawlMeta(), strict=False)
    assert {r.record_type for r in plain.where(F.col("sub") == 0).collect()} <= {
        "response", "resource"}
    full = {r.seq: bytes(r.body) for r in plain.where(F.col("sub") == 0).collect()}
    assert full[2].endswith(b"same!")
