"""S2-S5 — log-file scans.

- S4 ``hts-log.txt`` / ``logs/gen`` header (reference ``httrack/HtsLogParser.
  java:28-86``): line 1 ``HTTrack<ver> launched on <date> at <seeds+filters>``,
  line 2 (maybe after a blank — WinHTTrack ``\\r\\r\\n`` artifact) the
  parenthesized command line, from which the output dir is the ``-O``/``-O1``
  argument (quoted or bare), slash-terminated.
- S5 ``hts-cache/doit.log`` (reference ``httrack/HtsDoitParser.java:32-70``):
  line 1 = command line; a later ``File generated automatically on <date>,
  do NOT edit`` line = crawl start time. doit.log values override hts-log
  values (``HttrackCrawl.java:106-115``).
- S3 warn-log redirects (``HttrackCrawl.java:238-278``): grep
  ``HH:MM:SS	Warning: 	File has moved from X to Y`` out of ``hts-err.txt`` /
  ``logs/warn``; each becomes a synthesized redirect record.
- S2 debug-log records (``HttrackCrawl.java:207-236``): grep
  ``HH:MM:SS	Debug: 	Record: URL -> FILE`` out of ``logs/debug`` (fallback
  source when new.txt is absent), first-occurrence dedup per file.

S4/S5 are one-row crawl-level scalars → parsed driver-side into ``CrawlMeta``
(the reference's warcinfo inputs); S2/S3 are row streams → DataFrame scans.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import datetime
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from httrack2warc_spark.functions.urls import percent_encode

__all__ = [
    "CrawlMeta",
    "parse_hts_log",
    "parse_doit_log",
    "read_crawl_meta",
    "read_warn_log",
    "read_debug_log",
]

_HTS_LOG_HEADER_RE = re.compile(
    r"HTTrack(?P<version>[^ ]+) launched on "
    r"(?P<date>\w+, \d\d \w+ \d\d\d\d \d\d:\d\d:\d\d) at "
    r"(?P<seedsAndFilters>.*)"
)
_CMDLINE_RE = re.compile(r"\(.*-O1? ?(?:\"([^\"]*)\"|([^ ]*)) .*")
_DOIT_CMDLINE_RE = re.compile(r".*-O1? ?(?:\"([^\"]*)\"|([^ ]*)) .*")
_DOIT_TS_RE = re.compile(r"File generated automatically on (.*), do NOT edit")
_HTS_DATE_FMT = "%a, %d %b %Y %H:%M:%S"

WARN_MOVED_RE = r"^(\d\d:\d\d:\d\d)\tWarning: \tFile has moved from (.*) to (.*)$"
DEBUG_RECORD_RE = r"^(\d\d:\d\d:\d\d)\tDebug: \tRecord: (.*) -> (.*)$"


@dataclass
class CrawlMeta:
    version: str | None = None
    launch_time: datetime | None = None
    seeds_and_filters: str | None = None
    output_dir: str | None = None  # percent-encoded (HttrackCrawl.java:101,117)
    command_line: str | None = None


def _parse_hts_date(s: str) -> datetime:
    # HTS_LOCAL_DATE: "EEE, d MMM yyyy HH:mm:ss" (HtsDoitParser.java:29)
    return datetime.strptime(s, _HTS_DATE_FMT)


def parse_hts_log(text: str) -> CrawlMeta:
    lines = [l.rstrip("\r") for l in text.split("\n")]
    if not lines or not lines[0]:
        raise ValueError("missing header line")
    m = _HTS_LOG_HEADER_RE.fullmatch(lines[0])
    if not m:
        raise ValueError(f"invalid hts-log.txt header: {lines[0]}")
    meta = CrawlMeta(
        version=m.group("version"),
        launch_time=_parse_hts_date(m.group("date")),
        seeds_and_filters=m.group("seedsAndFilters"),
    )
    rest = lines[1:]
    if rest and rest[0] == "":  # WinHTTrack \r\r\n artifact: skip one blank
        rest = rest[1:]
    if not rest or len(rest[0]) < 3:
        return meta
    line = rest[0]
    meta.command_line = line[1:-1].strip().split(" ", 1)[1]
    m = _CMDLINE_RE.fullmatch(line)
    if m:
        outdir = m.group(1) if m.group(1) is not None else m.group(2)
        if not outdir.endswith("/"):
            outdir += "/"
        meta.output_dir = outdir
    return meta


def parse_doit_log(text: str) -> CrawlMeta:
    lines = [l.rstrip("\r") for l in text.split("\n")]
    meta = CrawlMeta(command_line=lines[0] if lines else None)
    if lines:
        m = _DOIT_CMDLINE_RE.fullmatch(lines[0])
        if m:
            outdir = m.group(1) if m.group(1) is not None else m.group(2)
            if not outdir.endswith("/"):
                outdir += "/"
            meta.output_dir = outdir
        else:
            meta.output_dir = ""  # HtsDoitParser.java:56 — no -O flag ⇒ ""
    for line in lines[1:]:
        m = _DOIT_TS_RE.fullmatch(line)
        if m:
            meta.launch_time = _parse_hts_date(m.group(1))
            break
    return meta


def read_crawl_meta(crawl_dir: str) -> CrawlMeta:
    """S4 then S5 with doit.log precedence (``HttrackCrawl.java:58-66``).
    output_dir is percent-encoded like the reference (mode-0)."""
    d = Path(crawl_dir)
    meta = CrawlMeta()
    for name in ("hts-log.txt", "logs/gen"):
        p = d / name
        if p.exists():
            try:
                meta = parse_hts_log(p.read_text(encoding="iso-8859-1"))
            except ValueError:
                continue
    doit = d / "hts-cache/doit.log"
    if doit.exists():
        dm = parse_doit_log(doit.read_text(encoding="iso-8859-1"))
        meta.launch_time = dm.launch_time
        meta.output_dir = dm.output_dir
        meta.command_line = dm.command_line
    if meta.output_dir is not None:
        meta.output_dir = percent_encode(meta.output_dir)
    return meta


def _grep_scan(spark: SparkSession, path: str, pattern: str, names: list[str]) -> DataFrame:
    lines = (
        spark.read.text(path)
        .withColumn("__id", F.monotonically_increasing_id())
        .withColumn("value", F.regexp_replace("value", "\r$", ""))
        .where(F.regexp_like("value", F.lit(pattern)))
    )
    cols = [
        F.regexp_extract("value", pattern, i + 1).alias(n) for i, n in enumerate(names)
    ]
    w = Window.partitionBy(F.lit(0)).orderBy("__id")
    return lines.select(F.row_number().over(w).cast("long").alias("seq"), *cols)


def read_warn_log(spark: SparkSession, path: str) -> DataFrame:
    """S3 → (seq, time, url, dst)."""
    return _grep_scan(spark, path, WARN_MOVED_RE, ["time", "url", "dst"])


def read_debug_log(spark: SparkSession, path: str) -> DataFrame:
    """S2 → (seq, time, url, localfile)."""
    return _grep_scan(spark, path, DEBUG_RECORD_RE, ["time", "url", "localfile"])
