"""WARC reading source: round-trip of this engine's own output (compressed,
uncompressed, rotated multi-file) back into a records DataFrame."""

import gzip

from pyspark.sql import functions as F

from httrack2warc_spark.convert import convert
from httrack2warc_spark.sources.warcread import parse_warc_stream, read_warc


def test_roundtrip_compressed_fixture(spark, crawl_dir, tmp_path):
    recs = convert(
        spark, crawl_dir, str(tmp_path),
        exclusions=[".*/another"],
        redirect_prefix="http://prefix.example.org/",
    )
    written = recs.select("record_type", "url", "digest").collect()
    back = read_warc(spark, str(tmp_path / "crawl-0.warc.gz"))
    rows = back.collect()
    assert len(rows) == 29  # 28 + per-file warcinfo (driver-contract info row aside)
    assert rows[0].record_type == "warcinfo" and rows[0].offset == 0
    by_type = {}
    for r in rows:
        by_type[r.record_type] = by_type.get(r.record_type, 0) + 1
    w_by_type = {}
    for r in written:  # convert() already includes the warcinfo row
        w_by_type[r.record_type] = w_by_type.get(r.record_type, 0) + 1
    assert by_type == w_by_type
    # every written digest seen again, attached to the same URL
    w_digests = {(r.url, r.digest) for r in written if r.digest}
    b_digests = {(r.url, r.payload_digest.removeprefix("sha1:"))
                 for r in rows if r.payload_digest}
    assert w_digests == b_digests
    # offsets are real seek coordinates: re-read one member directly
    sample = [r for r in rows if r.record_type == "response"][0]
    data = (tmp_path / "crawl-0.warc.gz").read_bytes()
    member = gzip.decompress(data[sample.offset:sample.offset + sample.length])
    assert f"WARC-Target-URI: {sample.url}\r\n".encode() in member


def test_roundtrip_uncompressed_and_rotated(spark, crawl_dir, tmp_path):
    convert(
        spark, crawl_dir, str(tmp_path),
        exclusions=[".*/another"],
        redirect_prefix="http://prefix.example.org/",
        warc_size=4096, compress=False,
    )
    warcs = sorted(tmp_path.glob("crawl-*.warc.gz"))
    assert len(warcs) > 1
    back = read_warc(spark, str(tmp_path / "crawl-*.warc.gz"))
    n_files = back.select("filename").distinct().count()
    assert n_files == len(warcs)
    # one warcinfo per rotated file, all at offset 0
    infos = back.where(F.col("record_type") == "warcinfo").collect()
    assert len(infos) == len(warcs) and all(r.offset == 0 for r in infos)
    # body binary survives framing even when it contains CRLF/WARC-ish bytes
    gif = back.where(F.col("url") == "http://test.example.org/image.gif").collect()
    # response bodies are HTTP header + payload; the GIF bytes follow the header
    assert any(b"GIF8" in bytes(r.body) for r in gif if r.record_type == "response")


def test_parse_stream_binary_safe():
    """A body containing 'WARC/1.0' and CRLFCRLF must not split framing."""
    evil = b"x\r\n\r\nWARC/1.0\r\n\r\ny" * 3
    rec = (b"WARC/1.0\r\nWARC-Type: resource\r\nWARC-Target-URI: http://e/x\r\n"
           b"Content-Length: " + str(len(evil)).encode() + b"\r\n\r\n"
           + evil + b"\r\n\r\n")
    stream = rec + rec
    rows = parse_warc_stream(stream, "t.warc")
    assert len(rows) == 2
    assert all(bytes(r[10]) == evil for r in rows)
    rows2 = parse_warc_stream(gzip.compress(stream), "t.warc.gz")
    assert len(rows2) == 2 and all(bytes(r[10]) == evil for r in rows2)


def test_digest_verification_on_readback(spark, crawl_dir, tmp_path):
    """Every stored WARC-Payload-Digest re-verifies from the re-read bytes;
    a corrupted payload is detected."""
    from httrack2warc_spark.sources.warcread import with_digest_check

    convert(
        spark, crawl_dir, str(tmp_path),
        exclusions=[".*/another"],
        redirect_prefix="http://prefix.example.org/",
    )
    back = with_digest_check(read_warc(spark, str(tmp_path / "crawl-0.warc.gz")))
    rows = back.collect()
    with_digest = [r for r in rows if r.payload_digest is not None]
    assert len(with_digest) >= 10
    assert all(r.digest_ok for r in with_digest)
    assert all(r.digest_ok is None for r in rows if r.payload_digest is None)

    # flip one payload byte -> that record's digest check must fail
    sample = with_digest[3]
    tampered = spark.createDataFrame(
        [(sample.filename, sample.offset, sample.length, sample.record_type,
          sample.url, sample.warc_date, sample.record_id, sample.content_type,
          sample.payload_digest, sample.refers_to,
          bytes(sample.body)[:-1] + bytes([bytes(sample.body)[-1] ^ 1]))],
        back.drop("digest_ok").schema,
    )
    assert with_digest_check(tampered).collect()[0].digest_ok is False
