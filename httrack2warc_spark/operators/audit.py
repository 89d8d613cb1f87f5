"""J4/U2/F4 — leftover-file audit.

Reference (``Httrack2Warc.java:268-278``): after conversion, walk the crawl
dir and warn about any file that is neither a processed record file, nor one
of HTTrack's housekeeping files (the 29-name set at ``Httrack2Warc.java:
43-71``), nor a directory, nor ``*.readme``.

Spark: binaryFile listing ⟂ processed filenames (left anti-join) with the
static exclusions as codegen predicates.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["IGNORE_FILES", "leftover_files"]

# HTTrack housekeeping files (interface constant, Httrack2Warc.java:43-71)
IGNORE_FILES = [
    "backblue.gif", "cookies.txt", "external.gif", "external.html", "fade.gif",
    "hts-cache/doit.log", "hts-cache/new.dat", "hts-cache/new.lst",
    "hts-cache/new.ndx", "hts-cache/new.txt", "hts-cache/new.zip",
    "hts-cache/old.dat", "hts-cache/old.lst", "hts-cache/old.ndx",
    "hts-cache/old.txt", "hts-cache/old.zip", "hts-cache/readme.txt",
    "hts-cache/winprofile.ini", "hts-err.txt", "hts-ioinfo.txt", "hts-log.txt",
    "hts-stats.txt", "index.html", "logs/info", "logs/err", "logs/gen",
    "logs/debug", "logs/warn",
]


def leftover_files(spark: SparkSession, crawl_dir: str, crawl: DataFrame) -> DataFrame:
    """Files under ``crawl_dir`` not accounted for by the crawl log
    (→ one ``file`` column; the reference logs each as a warning)."""
    from pathlib import Path

    d = Path(crawl_dir).resolve()
    files = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(str(d))
        .select(
            F.url_decode(
                F.regexp_replace(
                    F.regexp_replace(F.col("path"), r"^file:", ""),
                    F.lit(re.escape(str(d) + "/")),
                    "",
                )
            ).alias("file")
        )
    )
    processed = crawl.where(F.col("filename").isNotNull()).select(
        F.col("filename").alias("file")
    )
    out = files.join(processed, "file", "left_anti")
    out = out.where(~F.col("file").isin(IGNORE_FILES))
    out = out.where(~F.lower(F.col("file")).endswith(".readme"))
    return out
