"""Full converter (entry point 1) + leftover audit + image drain."""

import gzip

from pyspark.sql import functions as F

from httrack2warc_spark.convert import convert
from httrack2warc_spark.operators.audit import leftover_files
from httrack2warc_spark.sources.crawl import read_crawl


def test_convert_end_to_end(spark, crawl_dir, tmp_path):
    recs = convert(
        spark,
        crawl_dir,
        str(tmp_path),
        exclusions=[".*/another"],
        redirect_prefix="http://prefix.example.org/",
    )
    warc = tmp_path / "crawl-0.warc.gz"
    cdx = tmp_path / "index.cdx"
    assert warc.exists() and cdx.exists()
    data = gzip.decompress(warc.read_bytes())
    assert data.startswith(b"WARC/1.0\r\nWARC-Type: warcinfo\r\n")
    assert recs.count() == 29
    lines = cdx.read_text().splitlines()
    assert lines[0] == " CDX N b a m s k r M S V g"
    body = lines[1:]
    assert body == sorted(body) and len(body) == 14  # 7 responses + 7 redirects


def test_cdx_write_is_executor_side_and_byte_identical(spark, crawl_dir, tmp_path):
    """The CDX final write streams sorted executor part files — the driver
    never collects CDX lines (at 10^10 records that body is hundreds of GB).
    Bytes must equal the driver-side construction exactly: header line, every
    line LF-terminated, LC_ALL=C (binary UTF-8) order."""
    import inspect

    from httrack2warc_spark import convert as convert_mod
    from httrack2warc_spark.convert import CDX_HEADER, _write_sorted_text

    # (a) no driver-side collect of CDX lines anywhere in convert()
    src = inspect.getsource(convert_mod.convert)
    assert "cdx" not in src.lower() or ".collect()" not in [
        ln for ln in src.splitlines() if "cdx" in ln.lower()
    ], "convert() collects CDX lines on the driver"
    for ln in src.splitlines():
        if "cdx" in ln.lower():
            assert ".collect()" not in ln, ln

    # (b) byte identity with the in-memory construction, multi-partition sort
    df = spark.createDataFrame(
        [("zz last",), ("  leading-space sorts first",), ("midline x 1",),
         ("Upper-before-lower per byte order",), ("midline x 0",)],
        "cdx string",
    ).repartition(4).orderBy("cdx")
    target = tmp_path / "check.cdx"
    _write_sorted_text(df, target, CDX_HEADER)
    lines = sorted(r.cdx for r in df.collect())
    want = (CDX_HEADER + "\n" + "\n".join(lines) + "\n").encode()
    assert target.read_bytes() == want
    # empty body: header only, trailing newline, no stray part dirs
    empty = tmp_path / "empty.cdx"
    _write_sorted_text(df.where(F.lit(False)), empty, CDX_HEADER)
    assert empty.read_bytes() == (CDX_HEADER + "\n").encode()
    assert not list(tmp_path.glob(".cdx-parts-*"))


def test_convert_rotation_and_cdx_offsets(spark, crawl_dir, tmp_path):
    """K2+K3 golden: with a small size target the converter rotates into
    several WARC files, each starting with its own warcinfo record
    (Httrack2Warc.java:199-203), and every CDX line's (V offset, S length,
    g filename) seeks back to a gzip member whose record matches the line's
    URL and digest (CdxWriter.java:80-92, WarcWriter.java:142-156)."""
    convert(
        spark,
        crawl_dir,
        str(tmp_path),
        exclusions=[".*/another"],
        redirect_prefix="http://prefix.example.org/",
        warc_size=4096,  # force several rotations on the 29-record fixture
    )
    warcs = sorted(tmp_path.glob("crawl-*.warc.gz"))
    assert len(warcs) > 1
    # consecutive numbering from 0
    assert [w.name for w in warcs] == [
        f"crawl-{i}.warc.gz" for i in range(len(warcs))
    ]
    for w in warcs:
        first = gzip.decompress(w.read_bytes())
        assert first.startswith(b"WARC/1.0\r\nWARC-Type: warcinfo\r\n")

    lines = (tmp_path / "index.cdx").read_text().splitlines()[1:]
    assert lines == sorted(lines) and len(lines) == 14
    for line in lines:
        fields = line.split(" ")
        url, digest, s_len, v_off, g_file = (
            fields[0], fields[5], int(fields[8]), int(fields[9]), fields[10]
        )
        data = (tmp_path / g_file).read_bytes()
        member = gzip.decompress(data[v_off : v_off + s_len])
        assert member.startswith(b"WARC/1.0\r\n")
        assert f"WARC-Target-URI: {url}\r\n".encode() in member
        if digest != "-":
            assert f"sha1:{digest}".encode() in member
    # record-group atomicity: a URL's response+request+metadata share a file
    by_url: dict[str, set] = {}
    for line in lines:
        f = line.split(" ")
        by_url.setdefault(f[0], set()).add(f[10])
    assert all(len(v) == 1 for v in by_url.values())


def test_convert_tarball_source(spark, crawl_dir, tmp_path):
    """S11 (Httrack2Warc.java:92-147): a .tar.gz crawl archive — even with the
    crawl nested under extra directories and unreadable permissions —
    extracts, locates hts-cache, and reproduces the directory conversion."""
    import os
    import tarfile

    tb = tmp_path / "crawl.tar.gz"
    with tarfile.open(tb, "w:gz") as tf:
        tf.add(crawl_dir, arcname="archive/nested/testcrawl")
    outdir = tmp_path / "out"
    recs = convert(
        spark,
        str(tb),
        str(outdir),
        exclusions=[".*/another"],
        redirect_prefix="http://prefix.example.org/",
    )
    assert recs.count() == 29
    assert (outdir / "crawl-0.warc.gz").exists()
    lines = (outdir / "index.cdx").read_text().splitlines()
    assert len(lines) == 15


def test_convert_warcinfo_extra_lines(spark, crawl_dir, tmp_path):
    """-I/--warcinfo (Main.java:92-94): extra lines land at the top of every
    warcinfo record, before the software lines."""
    convert(
        spark,
        crawl_dir,
        str(tmp_path),
        warcinfo_extra=["operator: National Library", "isPartOf: test-crawl"],
    )
    data = gzip.decompress((tmp_path / "crawl-0.warc.gz").read_bytes())
    body = data.split(b"\r\n\r\n", 1)[1]
    assert body.startswith(
        b"operator: National Library\r\nisPartOf: test-crawl\r\nsoftware: HTTrack/"
    )


def test_warc_records_timezone_shift(spark, crawl_dir):
    """P7 (Main.java:86-89, Httrack2Warc.java:76,205): HTTrack's zone-less
    log timestamps interpreted in -Z's zone shift every WARC-Date by the
    zone offset when converted to UTC instants."""
    from datetime import datetime, timedelta

    from httrack2warc_spark.sinks.warc import warc_records
    from httrack2warc_spark.sources.htslogs import read_crawl_meta

    meta = read_crawl_meta(crawl_dir)
    crawl = read_crawl(spark, crawl_dir)
    utc = warc_records(crawl, meta)
    shifted = warc_records(crawl, meta, timezone="Etc/GMT-10")  # == UTC+10
    a = {(r.seq, r.sub): r.warc_date for r in utc.collect()}
    b = {(r.seq, r.sub): r.warc_date for r in shifted.collect()}
    assert a.keys() == b.keys() and len(a) > 0
    fmt = "%Y-%m-%dT%H:%M:%SZ"
    for k in a:
        da, db = datetime.strptime(a[k], fmt), datetime.strptime(b[k], fmt)
        assert da - db == timedelta(hours=10)


def test_leftover_audit(spark, crawl_dir):
    crawl = read_crawl(spark, crawl_dir)
    left = {r.file for r in leftover_files(spark, crawl_dir, crawl).collect()}
    # image404 was saved as .html on disk but logged as .png — the audit
    # must flag the orphan file, and nothing else
    assert left == {"test.example.org/image404.html"}


def test_scheduler_image_drain(spark, tmp_path):
    from httrack2warc_spark.frontier import (
        CrawlConfig,
        FrontierScheduler,
        generate_images,
        generate_web,
    )
    from httrack2warc_spark.sinks.tables import TableCatalog

    web, seeds = generate_web(spark, n_hosts=1, pages_per_host=40, out_degree=3,
                              image_every=10)
    images = generate_images(spark, 64, w=16, h=16)
    cat = TableCatalog(spark, str(tmp_path))
    sched = FrontierScheduler(
        spark, cat, web,
        CrawlConfig(num_parts=4, max_rounds=10, fetch_robots=False),
        image_table=images,
    )
    sched.run(seeds=seeds)
    drained = cat.read("images_fetched")
    assert drained.count() > 0
    checks = cat.read("image_checks")
    bad = checks.where(
        ~F.col("decoded_ok") | ~F.col("caption_ok") | ~F.col("phash_ok")
    ).count()
    assert bad == 0


def test_convert_redirect_file(spark, crawl_dir, tmp_path):
    """--redirect-file (Httrack2Warc.java:155,161-163, Main.java:113-116):
    synthetic redirects land in their own WARC set starting with its own
    warcinfo; the main set has none; the shared CDX still covers both and the
    concatenated record sequence (by CDX identity) matches the single-set
    golden run."""
    recs = convert(
        spark,
        crawl_dir,
        str(tmp_path),
        exclusions=[".*/another"],
        redirect_prefix="http://prefix.example.org/",
        redirect_file="redirects.warc.gz",
    )
    assert recs.count() == 29
    main = gzip.decompress((tmp_path / "crawl-0.warc.gz").read_bytes())
    redir = gzip.decompress((tmp_path / "redirects.warc.gz").read_bytes())
    assert main.startswith(b"WARC/1.0\r\nWARC-Type: warcinfo\r\n")
    assert redir.startswith(b"WARC/1.0\r\nWARC-Type: warcinfo\r\n")
    assert b"prefix.example.org" not in main
    # all 7 synthetic redirects, and only them, in the redirect set
    assert redir.count(b"WARC-Type: response") == 7
    assert redir.count(b"WARC-Target-URI: http://prefix.example.org/") == 7
    lines = (tmp_path / "index.cdx").read_text().splitlines()[1:]
    assert len(lines) == 14 and lines == sorted(lines)
    redirect_lines = [l for l in lines if l.startswith("http://prefix.")]
    assert len(redirect_lines) == 7
    assert all(l.split(" ")[10] == "redirects.warc.gz" for l in redirect_lines)
    assert all(l.split(" ")[10] == "crawl-0.warc.gz"
               for l in lines if not l.startswith("http://prefix."))
    # every CDX line still seeks to its record in the right file
    for line in lines:
        f = line.split(" ")
        member = gzip.decompress(
            (tmp_path / f[10]).read_bytes()[int(f[9]): int(f[9]) + int(f[8])]
        )
        assert f"WARC-Target-URI: {f[0]}\r\n".encode() in member


def test_convert_cdx9_legacy_format(spark, crawl_dir, tmp_path):
    """CDX 9-field legacy toggle (CdxWriter.java:85-90): drops the second '-'
    and the length field; V offset and g filename remain the last two."""
    convert(
        spark,
        crawl_dir,
        str(tmp_path),
        exclusions=[".*/another"],
        redirect_prefix="http://prefix.example.org/",
        cdx11=False,
    )
    lines = (tmp_path / "index.cdx").read_text().splitlines()
    body = lines[1:]
    assert len(body) == 14 and body == sorted(body)
    for line in body:
        f = line.split(" ")
        assert len(f) == 9, line
        # url date url mime status digest - offset filename
        assert f[6] == "-" and f[8].endswith(".warc.gz")
        int(f[7])  # offset parses


def test_record_ids_are_valid_rfc4122(spark, crawl_dir):
    """Deterministic record IDs must still carry RFC 4122 v4 version/variant
    bits so strict WARC validators accept them (reference: UUID.randomUUID)."""
    import re
    import uuid

    from httrack2warc_spark.sinks.warc import warc_records
    from httrack2warc_spark.sources.htslogs import read_crawl_meta

    meta = read_crawl_meta(crawl_dir)
    recs = warc_records(read_crawl(spark, crawl_dir), meta)
    ids = set()
    for r in recs.collect():
        for m in re.finditer(r"<urn:uuid:([0-9a-f-]{36})>", r.warc_header):
            ids.add(m.group(1))
    assert len(ids) >= 8
    for s in ids:
        u = uuid.UUID(s)
        assert u.version == 4 and u.variant == uuid.RFC_4122, s


def test_full_mime_table_long_tail(spark):
    """Long-tail extensions resolve to the reference's bundled-table answers
    (reference resource mime.types; MimeTypesTest.java pattern), not
    octet-stream."""
    from httrack2warc_spark.sources.mime import FULL_MIME, resolve_mime

    assert FULL_MIME["xls"] == "application/vnd.ms-excel"
    assert FULL_MIME["flv"] == "video/x-flv"
    assert FULL_MIME["wmv"] == "video/x-ms-wmv"
    assert len(FULL_MIME) > 1000
    rows = spark.createDataFrame(
        [("a/report.xls",), ("b/movie.flv",), ("c/clip.wmv",),
         ("d/foo.bar.jpg",), ("e/unknown.zzz",)], "filename string"
    ).select(
        "filename",
        resolve_mime(F.lit(None).cast("string"), F.col("filename")).alias("mime"),
    ).collect()
    got = {r.filename.split("/")[0]: r.mime for r in rows}
    assert got == {
        "a": "application/vnd.ms-excel",
        "b": "video/x-flv",
        "c": "video/x-ms-wmv",
        "d": "image/jpeg",   # last-dot extension rule (MimeTypes.java:50-57)
        "e": "application/octet-stream",
    }


def test_cli_reference_flag_parity(spark, crawl_dir, tmp_path):
    """CLI spellings match the reference (Main.java:59-140): --cdx NAME,
    -C/--compression none|gzip, -q/-v accepted."""
    from httrack2warc_spark.convert import main

    main([crawl_dir, "-o", str(tmp_path), "--cdx", "my.cdx",
          "-C", "NONE", "-q"])
    warc = tmp_path / "crawl-0.warc.gz"
    assert warc.exists() and (tmp_path / "my.cdx").exists()
    # -C none ⇒ records are raw WARC bytes, not gzip members
    assert warc.read_bytes().startswith(b"WARC/1.0\r\n")
