"""``read_crawl`` — the composed HTTrack-crawl reader (reference entry point 2).

Reproduces ``HttrackCrawl`` (``httrack/HttrackCrawl.java:58-195``) as one
declarative DataFrame plan over the S1-S8 scans:

  new.txt scan (S1) ──┐
                      ├─ union (txt first, warn after: U1) ─ date heuristic (P6)
  warn-log scan (S3) ─┘        │
  debug-log scan (S2, fallback when new.txt absent — first-occurrence per file)
                               │
        outputDir strip (P20) → URL canonicalize (P1) → filename decode (P3)
                               │
  ioinfo scan (S6) ── ordinal FIFO join ×2 (J1: request + response headers)
  cache scan (S7/S8) ─ payload left join (J2)
                               │
        status inference (P12) + redirect-header fabrication (P13)

Output: the ``crawl_log`` DataFrame (one row per HttrackRecord,
``httrack/HttrackRecord.java:32-58``), ordered by ``seq``.
"""

from __future__ import annotations

import re
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from httrack2warc_spark.functions.urls import (
    canonicalize_urls_udf,
    make_header_key_udf,
    percent_decode_udf,
)
from httrack2warc_spark.operators.dedup import first_occurrence
from httrack2warc_spark.operators.ordinal_join import ordinal_fifo_join
from httrack2warc_spark.operators.windows import date_wraparound
from httrack2warc_spark.sources.caches import read_ndx_cache, read_zip_cache
from httrack2warc_spark.sources.htslogs import (
    CrawlMeta,
    read_crawl_meta,
    read_debug_log,
    read_warn_log,
)
from httrack2warc_spark.sources.htstxt import read_new_txt
from httrack2warc_spark.sources.ioinfo import read_ioinfo

__all__ = ["read_crawl"]


def _txt_records(spark: SparkSession, d: Path, meta: CrawlMeta) -> tuple[DataFrame, DataFrame]:
    """S1 rows (F1-filtered) + the localfile 'seen' set for warn-log dedup."""
    txt = read_new_txt(spark, str(d / "hts-cache/new.txt"))
    # P20: localfile must start with outputDir; strip it (HttrackCrawl.java:158-162)
    outdir = meta.output_dir or ""
    txt = txt.withColumn(
        "relfile",
        F.when(
            F.col("localfile").startswith(outdir),
            F.col("localfile").substr(F.lit(len(outdir) + 1), F.length("localfile")),
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("new.txt localfile ("), F.col("localfile"),
                    F.lit(f") outside output dir ({outdir})"),
                )
            )
        ),
    )
    seen_files = txt.select(F.col("localfile").alias("seen_key")).where(
        F.length("localfile") > 0
    )
    rows = (
        txt.where(F.length("localfile") > 0)  # F1: skip 404s w/o local file
        .select(
            "seq",
            "time",
            "url",
            F.col("statuscode").cast("int").alias("status_in"),
            F.when(F.col("mime") != "", F.col("mime")).alias("mime"),
            F.when(F.col("via") != "", canonicalize_urls_udf("via")).alias("referrer"),
            "relfile",
            "size",
            F.lit("txt").alias("source"),
            F.lit(0).alias("source_rank"),
        )
    )
    return rows, seen_files


def _warn_records(spark: SparkSession, path: Path, seen_files: DataFrame) -> DataFrame:
    """S3 rows: File-has-moved redirects, dedup per URL and against the txt
    'seen' set (HttrackCrawl.java:238-278 — the reference reuses one set for
    localfiles and URLs)."""
    warn = read_warn_log(spark, str(path))
    warn = first_occurrence(warn, "url", ["seq"])  # A2
    warn = warn.join(
        seen_files, warn["url"] == seen_files["seen_key"], "left_anti"
    )
    return warn.select(
        "seq",
        "time",
        "url",
        F.lit(None).cast("int").alias("status_in"),
        F.lit(None).cast("string").alias("mime"),
        F.lit(None).cast("string").alias("referrer"),
        F.lit(None).cast("string").alias("relfile"),
        F.lit(None).cast("long").alias("size"),
        F.lit("warn").alias("source"),
        F.lit(1).alias("source_rank"),
        F.col("dst").alias("moved_to"),
    )


def _debug_records(spark: SparkSession, d: Path, meta: CrawlMeta) -> DataFrame:
    """S2 fallback rows (first-occurrence per localfile, A1)."""
    dbg = read_debug_log(spark, str(d / "logs/debug"))
    dbg = first_occurrence(dbg, "localfile", ["seq"])
    outdir = meta.output_dir or ""
    return dbg.select(
        "seq",
        "time",
        "url",
        F.lit(None).cast("int").alias("status_in"),
        F.lit(None).cast("string").alias("mime"),
        F.lit(None).cast("string").alias("referrer"),
        F.when(
            F.col("localfile").startswith(outdir),
            F.col("localfile").substr(F.lit(len(outdir) + 1), F.length("localfile")),
        ).alias("relfile"),
        F.lit(None).cast("long").alias("size"),
        F.lit("txt").alias("source"),
        F.lit(0).alias("source_rank"),
    )


def read_crawl(spark: SparkSession, crawl_dir: str, with_payload: bool = True) -> DataFrame:
    d = Path(crawl_dir)
    meta = read_crawl_meta(crawl_dir)
    if meta.launch_time is None:
        raise ValueError("no launch time found (hts-log.txt / doit.log missing)")

    # --- record sources (U1) ------------------------------------------------
    if (d / "hts-cache/new.txt").exists():
        rows, seen_files = _txt_records(spark, d, meta)
        warn_path = d / "hts-err.txt"
    elif (d / "logs/debug").exists():
        rows = _debug_records(spark, d, meta)
        seen_files = rows.select(F.col("relfile").alias("seen_key"))
        warn_path = d / "logs/warn"
    else:
        raise IOError(
            "Both hts-cache/new.txt and logs/debug are missing. I can't handle this crawl."
        )
    rows = rows.withColumn("moved_to", F.lit(None).cast("string"))
    if warn_path.exists():
        rows = rows.unionByName(_warn_records(spark, warn_path, seen_files))

    # --- P6 date heuristic (independently per source: the reference calls
    # resetDateHeuristic() before each stream — HttrackCrawl.java:128,243)
    launch = F.lit(meta.launch_time.date().isoformat()).cast("date")
    rows = date_wraparound(rows, "time", "seq", launch, "timestamp", partition_by="source")

    # --- P1/P3/P5 projections ----------------------------------------------
    rows = (
        rows.withColumn("fixed_url", canonicalize_urls_udf("url"))
        .withColumn("filename", percent_decode_udf("relfile"))
        .withColumn("header_key", make_header_key_udf("url"))
    )

    # --- J1 ordinal header joins (FIFO queues; probe order = stream order:
    # all txt rows, then warn rows — source_rank before seq)
    rows = rows.withColumn(
        "stream_ord", F.col("source_rank") * F.lit(1 << 40) + F.col("seq")
    )
    if (d / "hts-ioinfo.txt").exists():
        io = read_ioinfo(spark, str(d / "hts-ioinfo.txt")).withColumn(
            "header_key", make_header_key_udf("url")
        )
        for kind in ("request", "response"):
            side = io.where(F.col("kind") == kind).select(
                "header_key",
                F.col("file_seq"),
                F.col("header").alias(f"{kind}_header"),
            )
            rows = ordinal_fifo_join(
                rows, side, "header_key", "stream_ord", "file_seq", broadcast=True
            )
    else:
        rows = rows.withColumn("request_header", F.lit(None).cast("string"))
        rows = rows.withColumn("response_header", F.lit(None).cast("string"))

    # --- J2 payload join -----------------------------------------------------
    if with_payload and (d / "hts-cache/new.zip").exists():
        cache = read_zip_cache(spark, str(d / "hts-cache/new.zip"))
    elif with_payload and (d / "hts-cache/new.ndx").exists():
        cache = read_ndx_cache(spark, crawl_dir)
    else:
        cache = None
    if cache is not None:
        cache = cache.select(
            F.col("url").alias("fixed_url"),
            F.col("bytes").alias("cache_bytes"),
            F.col("size").alias("cache_size"),
            F.col("has_data").alias("cache_has_data"),
        )
        rows = rows.join(cache, "fixed_url", "left")
    else:
        rows = (
            rows.withColumn("cache_bytes", F.lit(None).cast("binary"))
            .withColumn("cache_size", F.lit(None).cast("long"))
            .withColumn("cache_has_data", F.lit(None).cast("boolean"))
        )

    # --- S9 mirror-tree fallback: cache entry w/o data ⇒ payload from the
    # crawl-dir file itself (HttrackRecord.openStream, HttrackRecord.java:89-97)
    if with_payload:
        files = (
            spark.read.format("binaryFile")
            .option("recursiveFileLookup", "true")
            .load(str(d))
            .select(
                F.url_decode(
                    F.regexp_replace(
                        F.regexp_replace(F.col("path"), r"^file:", ""),
                        F.lit(re.escape(str(d.resolve()) + "/")),
                        "",
                    )
                ).alias("filename"),
                F.col("content").alias("file_bytes"),
                F.col("length").alias("file_size"),
            )
        )
        rows = rows.join(files, "filename", "left")

        # P14 .delayed fixup (HttrackRecord.java:113-140): a 404 logged with
        # x.<hash>.delayed may exist on disk as x<hash4><ext> or x<ext>
        # (ext = .html for text/html, else the URL's suffix). Expressed as two
        # candidate-path left joins against the same file listing; the first
        # existing candidate wins and replaces filename+payload.
        delayed_re = r"\.([a-z0-9]+)\.delayed$"
        needs_fix = (
            F.col("filename").endswith(".delayed")
            & ~F.coalesce(F.col("cache_has_data"), F.lit(False))
            & F.col("file_bytes").isNull()
        )
        hash_part = F.regexp_extract("filename", delayed_re, 1)
        hash4 = F.substring(hash_part, -4, 4)
        ext = F.when(
            F.coalesce(F.col("mime"), F.lit("")).startswith("text/html"), F.lit(".html")
        ).otherwise(F.regexp_replace(F.col("url"), r".*\.", "."))
        stem = F.regexp_replace("filename", delayed_re, "")
        rows = (
            rows.withColumn(
                "__c1", F.when(needs_fix, F.concat(stem, hash4, ext))
            )
            .withColumn("__c2", F.when(needs_fix, F.concat(stem, ext)))
        )
        f1 = files.select(
            F.col("filename").alias("__c1"),
            F.col("file_bytes").alias("__b1"),
            F.col("file_size").alias("__s1"),
        )
        f2 = files.select(
            F.col("filename").alias("__c2"),
            F.col("file_bytes").alias("__b2"),
            F.col("file_size").alias("__s2"),
        )
        rows = rows.join(f1, "__c1", "left").join(f2, "__c2", "left")
        fixed_name = F.when(F.col("__b1").isNotNull(), F.col("__c1")).when(
            F.col("__b2").isNotNull(), F.col("__c2")
        )
        rows = (
            rows.withColumn(
                "filename", F.coalesce(fixed_name, F.col("filename"))
            )
            .withColumn(
                "file_bytes",
                F.coalesce(F.col("file_bytes"), F.col("__b1"), F.col("__b2")),
            )
            .withColumn(
                "file_size",
                F.coalesce(F.col("file_size"), F.col("__s1"), F.col("__s2")),
            )
            .drop("__c1", "__c2", "__b1", "__b2", "__s1", "__s2")
        )

        rows = rows.withColumn(
            "payload",
            F.when(F.col("cache_has_data"), F.col("cache_bytes")).otherwise(
                F.col("file_bytes")
            ),
        ).drop("file_bytes")
    else:
        rows = rows.withColumn("payload", F.col("cache_bytes"))
        rows = rows.withColumn("file_size", F.lit(None).cast("long"))

    # --- P12 status inference + P13 redirect fabrication ---------------------
    inferred = F.coalesce(
        F.col("status_in"),
        F.regexp_extract("response_header", r"^\S+[ \r\n](\d+)", 1).cast("int"),
        F.lit(200),
    )
    fabricated = F.concat(
        F.lit("HTTP/1.0 302 Found\r\nLocation: "),
        F.col("moved_to"),
        F.lit("\r\nServer: httrack2warc reconstructed header\r\n\r\n"),
    )
    rows = (
        rows.withColumn(
            "response_header",
            F.when(
                (F.col("source") == "warn") & F.col("response_header").isNull(),
                fabricated,
            ).otherwise(F.col("response_header")),
        )
        .withColumn(
            "status",
            F.when(
                (F.col("source") == "warn") & F.col("moved_to").isNotNull()
                & F.col("response_header").startswith("HTTP/1.0 302 Found"),
                F.lit(302),
            ).otherwise(inferred),
        )
    )

    return rows.select(
        F.row_number()
        .over(Window.partitionBy(F.lit(0)).orderBy("stream_ord"))
        .cast("long")
        .alias("seq"),
        "timestamp",
        F.col("fixed_url").alias("url"),
        "mime",
        "request_header",
        "response_header",
        "referrer",
        "filename",
        "status",
        "size",
        "payload",
        F.coalesce("cache_has_data", F.lit(False)).alias("has_cache_data"),
        "source",
    )
