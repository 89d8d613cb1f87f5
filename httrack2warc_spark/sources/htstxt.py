"""S1 — hts-cache/new.txt scan.

Reference: ``httrack/HtsTxtParser.java:31-68`` — a TSV whose header line must
match one exact string, rows tokenized by a single regex with named groups;
**row order is the crawl visit order** (load-bearing — O2).

Spark plan: ``spark.read.text`` (one file → offset-ordered partitions) +
``monotonically_increasing_id`` for the seq column (monotone across partition
index, so sorting by it reproduces file order), header check as a filter +
driver assertion, ``regexp_extract`` per column (one regex, compiled once per
codegen stage). Malformed rows: strict → ``raise_error`` (reference throws
``ParsingException``, ``HtsTxtParser.java:63-66``); non-strict → quarantined
out (F6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["NEW_TXT_HEADER", "NEW_TXT_ROW_RE", "read_new_txt"]

NEW_TXT_HEADER = (
    "date\tsize'/'remotesize\tflags(request:Update,Range state:File response:"
    "Modified,Chunked,gZipped)\tstatuscode\tstatus ('servermsg')\tMIME\t"
    "Etag|Date\tURL\tlocalfile\t(from URL)"
)

# column-by-column port of the reference's row grammar (HtsTxtParser.java:31-40)
NEW_TXT_ROW_RE = (
    r"^(\d\d:\d\d:\d\d)\t"          # 1 time
    r"(-?\d+)/(-?\d+)\t"            # 2 size / 3 remotesize
    r"([A-Z-]{6})\t"                # 4 flags
    r"(-?\d+)\t"                    # 5 statuscode
    r"(\w+)[ ](?:error )?\('([^']*)'\)\t"  # 6 status / 7 servermsg
    r"(\S*)\t"                      # 8 mime
    r"(\S*)\t"                      # 9 etag
    r"(.+)\t"                       # 10 url
    r"([^\t]*)\t"                   # 11 localfile
    r"\(from[ ](.*)\)$"             # 12 via
)


def read_new_txt(spark: SparkSession, path: str, strict: bool = True) -> DataFrame:
    """``strict=True`` (reference behavior): any malformed row fails the scan
    (``ParsingException``, ``HtsTxtParser.java:63-66``). ``strict=False``:
    malformed rows are dropped; use ``read_new_txt_with_rejects`` to also get
    the rejected lines as a DataFrame (the F6 quarantine-table policy)."""
    lines = spark.read.text(path).withColumn("seq", F.monotonically_increasing_id())
    header = lines.orderBy("seq").limit(1).collect()
    if not header:
        raise ValueError("empty file")  # reference: ParsingException("empty file")
    if header[0]["value"] != NEW_TXT_HEADER:
        raise ValueError("invalid header line")

    rows = lines.where(F.col("seq") > header[0]["seq"]).where(F.length("value") > 0)
    matched = F.regexp_like(F.col("value"), F.lit(NEW_TXT_ROW_RE))
    if strict:
        rows = rows.withColumn(
            "value",
            F.when(matched, F.col("value")).otherwise(
                F.raise_error(F.concat(F.lit("invalid record: "), F.col("value")))
            ),
        )
    else:
        rows = rows.where(matched)

    g = lambda i: F.regexp_extract("value", NEW_TXT_ROW_RE, i)  # noqa: E731
    out = rows.select(
        F.row_number()
        .over(Window.partitionBy(F.lit(0)).orderBy("seq"))
        .cast("long")
        .alias("seq"),
        g(1).alias("time"),
        g(2).cast("long").alias("size"),
        g(3).cast("long").alias("remotesize"),
        g(4).alias("flags"),
        g(5).cast("int").alias("statuscode"),
        g(6).alias("status"),
        g(7).alias("servermsg"),
        g(8).alias("mime"),
        g(9).alias("etag"),
        g(10).alias("url"),
        g(11).alias("localfile"),
        g(12).alias("via"),
    )
    return out


def read_new_txt_with_rejects(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Non-strict scan + quarantine: (parsed rows, rejected raw lines).

    F6 at scale: a 100 TB ingest can't die on one corrupt line; rejects land
    in their own table (``seq``, ``raw``) for audit instead of vanishing.
    """
    lines = spark.read.text(path).withColumn("seq", F.monotonically_increasing_id())
    header = lines.orderBy("seq").limit(1).collect()
    if not header:
        raise ValueError("empty file")
    if header[0]["value"] != NEW_TXT_HEADER:
        raise ValueError("invalid header line")
    body = lines.where(F.col("seq") > header[0]["seq"]).where(F.length("value") > 0)
    matched = F.regexp_like(F.col("value"), F.lit(NEW_TXT_ROW_RE))
    rejects = body.where(~matched).select("seq", F.col("value").alias("raw"))
    return read_new_txt(spark, path, strict=False), rejects
