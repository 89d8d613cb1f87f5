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


def test_revisit_cdx_and_readback(spark, tmp_path):
    """End-to-end dedup parity: a payload-dedup'd archive written to disk
    yields (a) CDX lines whose m field is the pywb `warc/revisit` literal
    with the ORIGINAL payload digest in k, and (b) a read-back through
    sources/warcread where resolve_revisits splices the original payload
    back into every revisit capture."""
    from httrack2warc_spark.sinks.warc import (
        cdx_lines_from_positions, write_warc_files,
    )
    from httrack2warc_spark.sources.warcread import (
        read_warc, resolve_revisits, with_digest_check,
    )

    recs = warc_records(_crawl(spark), CrawlMeta(), strict=False,
                        payload_dedup=True)
    out = tmp_path / "w"
    positions = write_warc_files(recs, str(out), rotation_size=1 << 30)

    # CDX: revisit rows (seq 2, 4) carry warc/revisit + the original digest
    orig_digest = {r.seq: r.digest for r in recs.where("sub = 0").collect()}[0]
    cdx = [r.cdx for r in cdx_lines_from_positions(positions).collect()]
    revisit_lines = [l for l in cdx if " warc/revisit " in l]
    assert len(revisit_lines) == 2
    for line in revisit_lines:
        f = line.split(" ")
        assert f[0] in ("http://h/c", "http://h/e")
        assert f[3] == "warc/revisit" and f[5] == orig_digest
    # non-revisit lines keep their resolved MIME
    assert sum(" text/html " in l for l in cdx) == len(cdx) - 2
    positions.unpersist()

    # read-back: splice the original payload into each revisit capture
    back = resolve_revisits(read_warc(spark, str(out / "crawl-0.warc.gz")))
    rows = {r.url: r for r in back.where("record_type = 'revisit'").collect()}
    assert set(rows) == {"http://h/c", "http://h/e"}
    for r in rows.values():
        assert bytes(r.resolved_body).endswith(b"same!")
        assert bytes(r.body).endswith(b"\r\n\r\n")  # stored body: headers only
        assert r.payload_digest == f"sha1:{orig_digest}"
    # the revisit's STORED digest refers to the original payload, so the
    # integrity audit must check it against the resolved message, not the
    # stored header-only body
    audited = with_digest_check(
        back.withColumn("body", back["resolved_body"])
    )
    bad = audited.where("digest_ok = false").count()
    assert bad == 0