"""Golden-fixture parser tests (ports of HtsTxtParserTest / HtsIoinfoParserTest /
HtsLogParserTest / HtsDoitParser behavior) against the reference's own fixtures."""

from datetime import datetime

import pytest

from tests.conftest import FIXTURES

from httrack2warc_spark.sources.htslogs import parse_doit_log, parse_hts_log
from httrack2warc_spark.sources.htstxt import read_new_txt
from httrack2warc_spark.sources.ioinfo import parse_ioinfo_lines


def _lines(name: str) -> list[str]:
    return [
        l.rstrip("\r")
        for l in (FIXTURES / name).read_text(encoding="iso-8859-1").split("\n")
    ]


# --- S1 new.txt (HtsTxtParserTest.java:30-71) --------------------------------


def test_new_txt_modern(spark):
    df = read_new_txt(spark, str(FIXTURES / "test-hts-new.txt"))
    rows = df.orderBy("seq").collect()
    r = rows[0]
    assert r.time == "16:24:26"
    assert r.url == "http://www-test.nla.gov.au/xinq/"
    assert r.via == ""  # referrer null for seeds
    assert r.mime == "text/html"
    assert (
        r.localfile
        == "/home/aosborne/tmp/pandas/working/1/20170725-1623/www-test.nla.gov.au/xinq/index.html"
    )
    assert all(row.url.startswith("http://") for row in rows)


def test_new_txt_early(spark):
    df = read_new_txt(spark, str(FIXTURES / "test-hts-new2.txt"))
    r = df.orderBy("seq").collect()[0]
    assert r.time == "01:00:14"
    assert r.url == "www.industry.gov.au/acreagereleases/ar_home.html"
    assert r.mime == "text/html"


def test_new_txt_303_delayed(spark, tmp_path):
    from httrack2warc_spark.sources.htstxt import NEW_TXT_HEADER

    p = tmp_path / "new.txt"
    p.write_text(
        NEW_TXT_HEADER
        + "\n15:55:04\t0/0\t---M--\t303\terror ('')\t\t\t"
        "http://www.antisf.com.au/component/weblinks/weblink/9-aussie-worldcon-2010?Itemid=89\t"
        "/pandoraworking/working/10063/20140108-1525/www.antisf.com.au/component/weblinks/"
        "weblink/9-aussie-worldcon-2010.80cd8f2.delayed\t"
        "(from http://www.antisf.com.au/the-stories/star-light-star-bright/42-content/newsflashes)"
    )
    rows = read_new_txt(spark, str(p)).collect()
    assert len(rows) == 1 and rows[0].statuscode == 303


def test_new_txt_bad_header(spark, tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("nope\n")
    with pytest.raises(ValueError):
        read_new_txt(spark, str(p))


# --- S6 ioinfo (HtsIoinfoParserTest.java:27-110) ------------------------------


def test_ioinfo_modern_golden():
    recs = parse_ioinfo_lines(_lines("test-hts-ioinfo.txt"))
    r0 = recs[0]
    assert r0["kind"] == "request"
    assert r0["url"] == "www.industry.gov.au/acreagereleases/ar_home.html"
    assert r0["header"] == (
        "GET /acreagereleases/ar_home.html HTTP/1.1\r\n"
        "Connection: close\r\n"
        "Host: www.industry.gov.au\r\n"
        "User-Agent: Mozilla/4.5 (compatible; HTTrack 3.0x; Windows 98)\r\n"
        "Accept: image/gif, image/x-xbitmap, image/jpeg, image/pjpeg, image/svg+xml, */*\r\n"
        "Accept-Language: en, *\r\n"
        "Accept-Charset: iso-8859-1, *\r\n"
        "Accept-Encoding: gzip, deflate, compress, identity\r\n\r\n"
    )
    r1 = recs[1]
    assert r1["kind"] == "response"
    assert r1["url"] == "www.industry.gov.au/acreagereleases/ar_home.html"
    assert r1["header"].startswith("HTTP/1.1 200 OK\r\nConnection: close\r\n")
    assert r1["header"].endswith('ETag: "5af18630baf1c21:8ad"\r\n\r\n')
    assert r1["code"] == 200
    # special-chars URL record
    r2 = recs[2]
    assert r2["url"] == 'test.example.org/page WITH "special" chars.html'
    assert r2["header"].startswith(
        "GET /page%20WITH%20%22special%22%20chars.html HTTP/1.1\r\n"
    )


def test_ioinfo_301_dialect():
    recs = parse_ioinfo_lines(_lines("test-hts-ioinfo-3.01.txt"))
    assert recs, "3.01 dialect must parse"
    assert recs[0]["kind"] == "request"
    assert recs[0]["header"].splitlines()[0].startswith("GET http://")


def test_ioinfo_spark_reader(spark):
    from httrack2warc_spark.sources.ioinfo import read_ioinfo

    df = read_ioinfo(spark, str(FIXTURES / "test-hts-ioinfo.txt"))
    rows = df.orderBy("file_seq").collect()
    assert rows[0].url == "www.industry.gov.au/acreagereleases/ar_home.html"
    assert rows[0].kind == "request"


# --- S4/S5 logs (HtsLogParserTest.java:30-49) ---------------------------------


def test_hts_log_golden():
    meta = parse_hts_log((FIXTURES / "test-hts-log.txt").read_text(encoding="iso-8859-1"))
    assert meta.version == "3.21-4"
    assert meta.launch_time == datetime(2003, 4, 3, 1, 0, 14)
    assert meta.output_dir == "/pandas/working/13982/20030403/"
    assert meta.command_line.startswith(
        "http://www.industry.gov.au/acreagereleases/ar_home.html"
    )


def test_hts_log_winhttrack_crcrlf():
    text = (
        "HTTrack3.33 launched on Wed, 02 Feb 2005 10:11:12 at http://x.example.org/\r\n"
        "\r\n"
        '(winhttrack http://x.example.org/ -O1 "C:\\My Web Sites\\x" )\r\n'
    )
    meta = parse_hts_log(text)
    assert meta.version == "3.33"
    assert meta.output_dir == "C:\\My Web Sites\\x/"


def test_doit_log(crawl_dir):
    from pathlib import Path

    meta = parse_doit_log(
        (Path(crawl_dir) / "hts-cache/doit.log").read_text(encoding="iso-8859-1")
    )
    assert meta.command_line == "-%H http://test.example.org/"
    assert meta.launch_time == datetime(2018, 2, 2, 15, 27, 21)
    assert meta.output_dir == ""  # no -O flag ⇒ "" (HtsDoitParser.java:56)
