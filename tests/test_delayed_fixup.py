"""P14 — .delayed path fixup (HttrackRecord.java:113-140): a row logged with
``x.<hash>.delayed`` whose file is actually on disk as ``x<hash4><ext>`` or
``x<ext>`` gets its filename and payload fixed up."""

from httrack2warc_spark.sources.crawl import read_crawl
from httrack2warc_spark.sources.htstxt import NEW_TXT_HEADER

DOIT = (
    "-%H http://d.example.org/\n"
    "File generated automatically on Fri, 02 Feb 2018 15:27:21, do NOT edit\n"
)


def _mk_crawl(tmp_path, localfile_rel, disk_name, body=b"<html>delayed</html>"):
    d = tmp_path / "crawl"
    (d / "hts-cache").mkdir(parents=True)
    (d / "hts-cache/doit.log").write_text(DOIT)
    row = (
        "15:55:04\t0/0\t---M--\t303\terror ('')\t\ttext/html\t"
        f"http://d.example.org/page?x=1\t{localfile_rel}\t(from )"
    )
    # note: mime column is field 7; build the row with explicit columns
    row = "\t".join(
        [
            "15:55:04", "0/0", "---M--", "303", "error ('')", "text/html", "",
            "http://d.example.org/page?x=1", localfile_rel, "(from )",
        ]
    )
    (d / "hts-cache/new.txt").write_text(NEW_TXT_HEADER + "\n" + row + "\n")
    (d / "site").mkdir()
    (d / "site" / disk_name).write_bytes(body)
    return str(d)


def test_delayed_hash4_variant(spark, tmp_path):
    crawl_dir = _mk_crawl(
        tmp_path, "site/page.80cd8f2.delayed", "paged8f2.html"
    )
    rows = read_crawl(spark, crawl_dir).collect()
    assert len(rows) == 1
    assert rows[0].filename == "site/paged8f2.html"
    assert bytes(rows[0].payload) == b"<html>delayed</html>"


def test_delayed_bare_variant(spark, tmp_path):
    crawl_dir = _mk_crawl(tmp_path, "site/page.80cd8f2.delayed", "page.html")
    rows = read_crawl(spark, crawl_dir).collect()
    assert rows[0].filename == "site/page.html"
    assert rows[0].payload is not None


def test_delayed_no_candidate_stays(spark, tmp_path):
    crawl_dir = _mk_crawl(tmp_path, "site/page.80cd8f2.delayed", "unrelated.html")
    rows = read_crawl(spark, crawl_dir).collect()
    assert rows[0].filename == "site/page.80cd8f2.delayed"
    assert rows[0].payload is None
