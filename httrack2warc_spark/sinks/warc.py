"""WARC + CDX sink projections (K1-K5, P8-P9, P13, P15-P17, O1).

Reference lifecycle being re-expressed (``Httrack2Warc.java:149-283``): per
crawl record — exclusion filter (F2) → MIME chain (P10) → payload digest
(P11) → header surgery (P8 transfer-encoding strip, P9 content-length fix,
P13 fabrication for headerless ≥300s) → response-vs-resource branch → WARC
response/resource + request + metadata + synthetic-redirect records (K1, K4,
K5) → CDX lines with a final C-locale global sort (K3/O1).

Spark-first shape: ONE projection produces every record of a crawl row at
once (``explode`` of a record-struct array keeps the record group together —
the group-atomicity the reference enforces by only rotating between groups,
``RotatingFile.java:42-54``), the digest is computed in the same pass as the
serialized bytes (the reference reads each payload twice — digest then write,
``Httrack2Warc.java:193-197,208-242``; we fold both into one projection), and
the CDX sort is ``orderBy`` over binary-comparable keys (Spark's
range-partitioned external sort == the ``sort`` subprocess with LC_ALL=C).

Record IDs are content-derived (md5 of url+seq+type) instead of the
reference's ``UUID.randomUUID()`` (``Httrack2Warc.java:184``) — deterministic
replay is a north_rule requirement; the WARC grammar is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from httrack2warc_spark.functions.digests import sha1_base32_udf
from httrack2warc_spark.functions.urls import canonicalize_urls_udf
from httrack2warc_spark.sources.htslogs import CrawlMeta
from httrack2warc_spark.sources.mime import resolve_mime

__all__ = [
    "ENGINE_SOFTWARE",
    "WARC_ROTATION_SIZE",
    "format_warcinfo",
    "remove_transfer_encoding",
    "fix_content_length",
    "warc_records",
    "assign_warc_files",
    "write_warc_files",
    "cdx_lines",
    "cdx_lines_from_positions",
    "write_warc_file",
]

WARC_ROTATION_SIZE = 1 << 30  # reference default (Httrack2Warc.java:76)

ENGINE_SOFTWARE = "httrack2warc https://github.com/nla/httrack2warc"

# same spelling as the reference (Httrack2Warc.java:292-293): leading-
# whitespace-tolerant, case-insensitive, multiline, CRLF-terminated
_TE_RE = r"(?im)^[ \t]*Transfer-Encoding[ \t]*:.*\r\n"
_CL_RE = r"(?im)^[ \t]*Content-Length[ \t]*:.*\r\n"


def remove_transfer_encoding(header):
    """P8 (golden: ``Httrack2WarcTest.java:105-117``)."""
    return F.regexp_replace(header, _TE_RE, "")


def fix_content_length(header, length):
    """P9 — rewrite Content-Length to the actual body length."""
    return F.regexp_replace(
        header, _CL_RE, F.concat(F.lit("Content-Length: "), length.cast("string"), F.lit("\r\n"))
    )


def format_warcinfo(meta: CrawlMeta, extra: str = "") -> str:
    """``Httrack2Warc.formatWarcInfo`` (``Httrack2Warc.java:312-331``)."""
    info = extra
    if meta.version:
        info += f"software: HTTrack/{meta.version} http://www.httrack.com/\r\n"
    info += f"software: {ENGINE_SOFTWARE}\r\n"
    if meta.command_line:
        info += f"httrackOptions: {meta.command_line}\r\n"
    return info


def _rec_id(*cols) -> F.Column:
    """Deterministic urn:uuid from md5, with valid RFC 4122 version-4 bits.

    The reference uses ``UUID.randomUUID()`` (``Httrack2Warc.java:184``);
    determinism is a north_rule requirement here, so the hex is content-
    derived — but the version nibble is forced to ``4`` and the variant
    nibble to ``8|9|a|b`` so strict WARC validators accept the IDs."""
    h = F.md5(F.concat_ws("|", *cols))
    variant = F.element_at(
        F.array(F.lit("8"), F.lit("9"), F.lit("a"), F.lit("b")),
        (F.conv(F.substring(h, 17, 1), 16, 10).cast("int") % 4) + 1,
    )
    return F.concat(
        F.lit("<urn:uuid:"),
        F.substring(h, 1, 8), F.lit("-"),
        F.substring(h, 9, 4), F.lit("-"),
        F.lit("4"), F.substring(h, 14, 3), F.lit("-"),
        variant, F.substring(h, 18, 3), F.lit("-"),
        F.substring(h, 21, 12),
        F.lit(">"),
    )


def _py_rec_id(key: str) -> str:
    """Driver-side twin of ``_rec_id`` (same md5 → RFC 4122 v4 shaping)."""
    import hashlib
    import uuid

    digest = bytearray(hashlib.md5(key.encode()).digest())
    digest[6] = (digest[6] & 0x0F) | 0x40  # version 4
    digest[8] = (digest[8] & 0x3F) | 0x80  # variant 10xx
    return f"<urn:uuid:{uuid.UUID(bytes=bytes(digest))}>"


def warc_records(
    crawl: DataFrame,
    meta: CrawlMeta,
    exclusions: list[str] | None = None,
    redirect_prefix: str | None = None,
    strict: bool = False,
    timezone: str = "UTC",
    payload_dedup: bool = False,
) -> DataFrame:
    """crawl_log → one row per WARC record:
    (seq, sub, record_type, url, warc_date, warc_header, body, content_type,
    digest) ordered by (seq, sub). ``sub``: 0 response/resource, 1 request,
    2 metadata, 3 synthetic redirect — the reference's in-group emit order
    (``Httrack2Warc.java:208-263``).

    ``payload_dedup`` (off by default — the reference stores every payload):
    standard web-archive storage dedup. Any response whose payload digest
    matches an EARLIER response (by seq) is written as a ``revisit`` record
    (WARC 1.0 identical-payload-digest profile): the HTTP headers are kept,
    the payload body is omitted, and WARC-Refers-To / -Target-URI / -Date
    point at the first capture. At archive scale duplicate payloads dominate
    storage; the dedup costs ONE shuffle on the 32-byte digest key.
    """
    df = crawl
    for rx in exclusions or []:
        df = df.where(~F.col("url").rlike(f"^(?:{rx})$"))  # F2: full match

    exists = F.col("payload").isNotNull()
    if not strict:
        df = df.where(~((F.col("status") > 399) & ~exists))  # F3

    content_type = resolve_mime(F.col("mime"), F.col("filename"))
    digest = F.when(exists, sha1_base32_udf(F.col("payload")))
    body_len = F.when(exists, F.length("payload")).otherwise(F.lit(0)).cast("long")
    # P7: HTTrack logs carry zone-less local datetimes; the reference
    # interprets them in a configurable zone and emits UTC instants
    # (`record.getTimestamp().atZone(timezone).toInstant()`,
    # Httrack2Warc.java:76,205; CLI -Z, Main.java:86-89)
    ts_utc = (
        F.col("timestamp")
        if timezone in (None, "UTC")
        else F.to_utc_timestamp(F.col("timestamp"), timezone)
    )
    warc_date = F.date_format(ts_utc, "yyyy-MM-dd'T'HH:mm:ss'Z'")

    # P13: headerless ≥300 → fabricate (Httrack2Warc.java:222-227)
    fabricated = F.concat(
        F.lit("HTTP/1.0 "), F.col("status").cast("string"),
        F.lit(" \r\nContent-Type: "), content_type,
        F.lit("\r\nServer: httrack2warc reconstructed header\r\n\r\n"),
    )
    resp_hdr = F.when(
        F.col("response_header").isNotNull(), F.col("response_header")
    ).when(F.col("status") >= 300, fabricated)
    resp_hdr = F.when(
        exists, fix_content_length(remove_transfer_encoding(resp_hdr), body_len)
    ).otherwise(resp_hdr)
    truncated = F.when(resp_hdr.isNotNull() & ~exists, F.lit("unspecified"))

    rid = _rec_id(F.col("url"), F.col("seq").cast("string"), F.lit("response"))

    base = df.select(
        "seq",
        "url",
        F.col("referrer"),
        F.col("filename"),
        F.col("status"),
        warc_date.alias("warc_date"),
        content_type.alias("content_type"),
        digest.alias("digest"),
        body_len.alias("body_len"),
        resp_hdr.alias("resp_hdr"),
        truncated.alias("truncated"),
        rid.alias("response_id"),
        F.col("request_header"),
        F.coalesce(F.col("payload"), F.lit(b"")).alias("payload"),
    )

    if payload_dedup:
        # first capture per digest = the referred-to original; later captures
        # with an HTTP header become revisit records (identical-payload-
        # digest). Null digests (no payload) never deduplicate.
        wd = Window.partitionBy("digest").orderBy("seq")
        base = (
            base.withColumn("__orig_seq", F.first("seq").over(wd))
            .withColumn("__orig_id", F.first("response_id").over(wd))
            .withColumn("__orig_url", F.first("url").over(wd))
            .withColumn("__orig_date", F.first("warc_date").over(wd))
        )
        is_revisit = (
            F.col("digest").isNotNull()
            & (F.col("seq") != F.col("__orig_seq"))
            & F.col("resp_hdr").isNotNull()
        )
    else:
        is_revisit = F.lit(False)
    base = base.withColumn("__is_revisit", is_revisit)

    # revisit (payload_dedup): HTTP headers kept, payload omitted, pointers
    # at the first capture. Declared WARC/1.1 with the 1.1 profile URI:
    # WARC-Refers-To-Target-URI / WARC-Refers-To-Date are 1.1 fields, so the
    # record must claim the version that defines them (strict 1.0 validators
    # reject them as extensions). Response/request records stay 1.0 — mixed
    # per-record versions in one file are explicitly allowed by the spec.
    revisit_header = F.concat(
        F.lit("WARC/1.1\r\nWARC-Type: revisit\r\nWARC-Target-URI: "),
        F.col("url"),
        F.lit("\r\nWARC-Date: "), F.col("warc_date"),
        F.lit("\r\nWARC-Payload-Digest: sha1:"), F.col("digest"),
        F.lit("\r\nWARC-Profile: "
              "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest"),
        F.lit("\r\nWARC-Refers-To: "), F.col("__orig_id"),
        F.lit("\r\nWARC-Refers-To-Target-URI: "), F.col("__orig_url"),
        F.lit("\r\nWARC-Refers-To-Date: "), F.col("__orig_date"),
        F.lit("\r\nWARC-Record-ID: "), F.col("response_id"),
        F.lit("\r\nWARC-Truncated: length"),
        F.lit("\r\nContent-Type: application/http; msgtype=response\r\n"
              "Content-Length: "),
        F.length(F.col("resp_hdr")).cast("string"),
        F.lit("\r\n\r\n"),
    ) if payload_dedup else F.lit(None).cast("string")

    # sub 0: response (or resource when no HTTP header at all)
    response = base.select(
        "seq",
        F.lit(0).alias("sub"),
        F.when(F.col("__is_revisit"), F.lit("revisit"))
        .when(F.col("resp_hdr").isNotNull(), F.lit("response"))
        .otherwise(F.lit("resource"))
        .alias("record_type"),
        "url",
        "warc_date",
        F.when(F.col("__is_revisit"), revisit_header)
        .when(
            F.col("resp_hdr").isNotNull(),
            F.concat(
                F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
                F.col("url"),
                F.lit("\r\nWARC-Date: "), F.col("warc_date"),
                F.when(
                    F.col("digest").isNotNull(),
                    F.concat(F.lit("\r\nWARC-Payload-Digest: sha1:"), F.col("digest")),
                ).otherwise(F.lit("")),
                F.lit("\r\nWARC-Record-ID: "), F.col("response_id"),
                F.when(
                    F.col("truncated").isNotNull(),
                    F.concat(F.lit("\r\nWARC-Truncated: "), F.col("truncated")),
                ).otherwise(F.lit("")),
                F.lit("\r\nContent-Type: application/http; msgtype=response\r\nContent-Length: "),
                (F.col("body_len") + F.length(F.col("resp_hdr"))).cast("string"),
                F.lit("\r\n\r\n"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("WARC/1.0\r\nWARC-Type: resource\r\nWARC-Target-URI: "),
                F.col("url"),
                F.lit("\r\nWARC-Record-ID: "), F.col("response_id"),
                F.lit("\r\nWARC-Date: "), F.col("warc_date"),
                F.lit("\r\nWARC-Block-Digest: sha1:"), F.coalesce("digest", F.lit("-")),
                F.lit("\r\nContent-Type: "), F.col("content_type"),
                F.lit("\r\nContent-Length: "), F.col("body_len").cast("string"),
                F.lit("\r\n\r\n"),
            )
        )
        .alias("warc_header"),
        F.when(F.col("__is_revisit"), F.encode("resp_hdr", "ISO-8859-1"))
        .when(
            F.col("resp_hdr").isNotNull(),
            F.concat(F.encode("resp_hdr", "ISO-8859-1"), F.col("payload")),
        )
        .otherwise(F.col("payload"))
        .alias("body"),
        "content_type",
        "digest",
        "status",
    )

    request = (
        base.where(F.col("request_header").isNotNull())
        .select(
            "seq",
            F.lit(1).alias("sub"),
            F.lit("request").alias("record_type"),
            "url",
            "warc_date",
            F.concat(
                F.lit("WARC/1.0\r\nWARC-Type: request\r\nWARC-Target-URI: "),
                F.col("url"),
                F.lit("\r\nWARC-Date: "), F.col("warc_date"),
                F.lit("\r\nWARC-Concurrent-To: "), F.col("response_id"),
                F.lit("\r\nWARC-Record-ID: "),
                _rec_id(F.col("url"), F.col("seq").cast("string"), F.lit("request")),
                F.lit("\r\nContent-Type: application/http;msgtype=request\r\nContent-Length: "),
                F.length(F.col("request_header")).cast("string"),
                F.lit("\r\n\r\n"),
            ).alias("warc_header"),
            F.encode("request_header", "ISO-8859-1").alias("body"),
            "content_type",
            F.lit(None).cast("string").alias("digest"),
            "status",
        )
    )

    metadata_body = F.concat(
        F.when(
            F.col("referrer").isNotNull(),
            F.concat(F.lit("via: "), F.col("referrer"), F.lit("\r\n")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("filename").isNotNull(),
            F.concat(F.lit("httrackFile: "), F.col("filename"), F.lit("\r\n")),
        ).otherwise(F.lit("")),
    )
    metadata = (
        base.withColumn("meta_body", metadata_body)
        .where(F.length("meta_body") > 0)
        .select(
            "seq",
            F.lit(2).alias("sub"),
            F.lit("metadata").alias("record_type"),
            "url",
            "warc_date",
            F.concat(
                F.lit("WARC/1.0\r\nWARC-Type: metadata\r\nWARC-Target-URI: "),
                F.col("url"),
                F.lit("\r\nWARC-Date: "), F.col("warc_date"),
                F.lit("\r\nWARC-Concurrent-To: "), F.col("response_id"),
                F.lit("\r\nWARC-Record-ID: "),
                _rec_id(F.col("url"), F.col("seq").cast("string"), F.lit("metadata")),
                F.lit("\r\nContent-Type: application/warc-fields\r\nContent-Length: "),
                F.length("meta_body").cast("string"),
                F.lit("\r\n\r\n"),
            ).alias("warc_header"),
            F.encode("meta_body", "ISO-8859-1").alias("body"),
            "content_type",
            F.lit(None).cast("string").alias("digest"),
            "status",
        )
    )

    parts = [response, request, metadata]

    if redirect_prefix is not None:
        # K4 (RedirectWriter.java:24-38): fabricated 301 from prefix+filename
        # → original URL; empty body; digest of the empty body
        from httrack2warc_spark.functions.digests import sha1_base32

        empty_digest = sha1_base32(b"")
        redir_hdr_http = F.concat(
            F.lit("HTTP/1.1 301 Moved Permanently\r\nLocation: "),
            F.col("url"),
            F.lit("\r\nServer: httrack2warc synthetic redirect\r\nContent-Length: 0\r\n\r\n"),
        )
        redirect = (
            base.where(F.col("filename").isNotNull())
            .withColumn(
                "redir_url",
                canonicalize_urls_udf(
                    F.concat(F.lit(redirect_prefix), F.col("filename"))
                ),
            )
            .select(
                "seq",
                F.lit(3).alias("sub"),
                F.lit("response").alias("record_type"),
                F.col("redir_url").alias("url"),
                "warc_date",
                F.concat(
                    F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
                    F.col("redir_url"),
                    F.lit("\r\nWARC-Date: "), F.col("warc_date"),
                    F.lit("\r\nWARC-Payload-Digest: sha1:"), F.lit(empty_digest),
                    F.lit("\r\nWARC-Record-ID: "),
                    _rec_id(F.col("redir_url"), F.col("seq").cast("string"), F.lit("redirect")),
                    F.lit("\r\nContent-Type: application/http; msgtype=response\r\nContent-Length: "),
                    F.length(redir_hdr_http).cast("string"),
                    F.lit("\r\n\r\n"),
                ).alias("warc_header"),
                F.encode(redir_hdr_http, "ISO-8859-1").alias("body"),
                "content_type",
                F.lit(empty_digest).alias("digest"),
                F.lit(301).alias("status"),
            )
        )
        parts.append(redirect)

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def warcinfo_record(spark, warcinfo: str, launch_iso: str) -> DataFrame:
    body = warcinfo.encode("utf-8")
    header = (
        "WARC/1.0\r\nWARC-Type: warcinfo\r\nWARC-Date: "
        + launch_iso
        + "\r\nWARC-Record-ID: " + _py_rec_id(warcinfo + "|" + launch_iso) + "\r\n"
        + "Content-Type: application/warc-fields\r\nContent-Length:"
        + str(len(body))
        + "\r\n\r\n"
    )
    return spark.createDataFrame(
        [(0, -1, "warcinfo", None, launch_iso, header, body, None, None, None)],
        "seq long, sub int, record_type string, url string, warc_date string, "
        "warc_header string, body binary, content_type string, digest string, status int",
    )


def cdx_lines(records: DataFrame, warc_filename: str = "crawl-0.warc.gz",
              cdx11: bool = True) -> DataFrame:
    """P17/K3/O1 — CDX lines from response/resource records, globally
    sorted byte-wise (C locale == Spark's binary string ordering on ASCII).

    ``cdx11=False`` emits the 9-field legacy format (``CdxWriter.java:85-90``:
    drops the second ``-`` and the length field).

    This is the *table-sink* variant: records drained to tables have no WARC
    byte position, so S is the uncompressed serialized length and V/g are
    placeholders. When materializing real WARC files, use ``write_warc_files``
    + ``cdx_lines_from_positions`` — those carry the true compressed member
    offset/length and the rotated filename (``CdxWriter.java:80-92``).
    """
    rec_len = (F.length("warc_header") + F.length("body") + F.lit(4)).cast("long")
    return _cdx_of(records, rec_len, F.lit(0).cast("long"),
                   F.lit(warc_filename), cdx11)


def cdx_lines_from_positions(positions: DataFrame, cdx11: bool = True) -> DataFrame:
    """CDX from ``write_warc_files`` output: S = compressed member length,
    V = member start offset, g = the rotated file the record landed in
    (``CdxWriter.java:80-92``; positions from ``WarcWriter.java:142-156``).
    ``cdx11=False`` → 9-field legacy format (``CdxWriter.java:85-90``)."""
    return _cdx_of(positions, F.col("length"), F.col("offset"),
                   F.col("filename"), cdx11)


def _cdx_of(df: DataFrame, length, offset, filename, cdx11: bool) -> DataFrame:
    resp = df.where(F.col("sub").isin(0, 3))
    ts = F.regexp_replace(F.col("warc_date"), r"[-T:Z]", "")
    # pywb/OpenWayback convention for deduplicated captures: the CDX m field
    # is the literal `warc/revisit`; the k digest column stays the payload
    # digest, which is how replay resolves the line to the original capture.
    mime = F.col("content_type")
    if "record_type" in df.columns:
        mime = F.when(
            F.col("record_type") == "revisit", F.lit("warc/revisit")
        ).otherwise(mime)
    common = [
        F.col("url"), ts, F.col("url"), mime,
        F.col("status").cast("string"),
        F.coalesce(F.col("digest"), F.lit("-")),
        F.lit("-"),
    ]
    if cdx11:
        fields = common + [F.lit("-"), length.cast("string"),
                           offset.cast("string"), filename]
    else:  # 9-field legacy: no second '-', no compressed length
        fields = common + [offset.cast("string"), filename]
    return resp.select(F.concat_ws(" ", *fields).alias("cdx")).orderBy("cdx")


def assign_warc_files(records: DataFrame, rotation_size: int,
                      mode: str = "single") -> DataFrame:
    """K2 rotation plan: add ``file_no`` so that (a) every record of a seq
    group lands in the same file (the reference only rotates between groups,
    ``Httrack2Warc.java:199-203``, ``RotatingFile.java:42-54``) and (b) a new
    file starts once the previous one passed ``rotation_size`` bytes.

    The reference rotates on *compressed* position; compressed size is unknown
    before writing, so the plan uses cumulative uncompressed record-group
    bytes — same bound semantics (files overshoot by at most one group),
    deterministic, and computable as a distributed prefix sum (``ranged``
    mode) rather than a sequential writer.
    """
    from httrack2warc_spark.operators.sequence import with_running_total

    gsize = F.sum(F.length("warc_header") + F.length("body") + F.lit(4))
    groups = records.groupBy("seq").agg(gsize.alias("__gsize"))
    before = with_running_total(
        groups, [F.col("seq")], F.col("__gsize"), out_col="__before", mode=mode
    )
    raw_idx = before.withColumn(
        "__fidx", F.floor(F.col("__before") / F.lit(rotation_size)).cast("int")
    )
    # densify: an oversized group can skip floor values, but the reference's
    # filename counter increments by 1 per rotation (RotatingFile.java:48-51)
    from pyspark.sql import Window

    dense = Window.orderBy("__fidx")  # #files rows — tiny
    idx_map = (
        raw_idx.select("__fidx").distinct()
        .withColumn("file_no", F.dense_rank().over(dense) - 1)
    )
    assigned = raw_idx.join(F.broadcast(idx_map), "__fidx").select("seq", "file_no")
    return records.join(assigned, "seq")


_POSITIONS_SCHEMA = (
    "seq long, sub int, record_type string, url string, warc_date string, "
    "content_type string, status int, digest string, offset long, "
    "length long, filename string"
)


def write_warc_files(
    records: DataFrame,
    out_dir: str,
    name_pattern: str = "crawl-%d.warc.gz",
    rotation_size: int = WARC_ROTATION_SIZE,
    compress: bool = True,
    warcinfo: str | None = None,
    warcinfo_date: str | None = None,
    assign_mode: str = "single",
) -> DataFrame:
    """K1+K2+K3 materializer: write size-rotated ``.warc.gz`` files (one gzip
    member per record, ``Compression.java:24-42``) and RETURN the per-record
    byte positions (offset/length/filename) for CDX emission.

    Spark-first shape: the rotation plan is a distributed prefix sum
    (``assign_warc_files``), then ``groupBy(file_no).applyInPandas`` writes
    each output file in its own task — at 100 TB that is thousands of ~1 GiB
    files written in parallel (out_dir must be shared storage on a cluster).
    Each file starts with its own warcinfo record, like the reference's
    post-rotation ``writeWarcinfoRecord`` (``Httrack2Warc.java:200-203``).

    Returns the positions DataFrame (materialized eagerly so the files exist
    on return).
    """
    import gzip
    import os

    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    assigned = assign_warc_files(records, rotation_size, mode=assign_mode)
    info_bytes = warcinfo.encode("utf-8") if warcinfo is not None else None
    info_date = warcinfo_date or "1970-01-01T00:00:00Z"

    def write_one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["seq", "sub"])
        file_no = int(pdf["file_no"].iloc[0])
        if "%d" in name_pattern:
            fname = name_pattern % file_no
        elif file_no == 0:  # a literal name (e.g. --redirect-file redirects.warc.gz)
            fname = name_pattern
        else:  # rotation overflow of a literal name: suffix before the extension
            stem, dot, ext = name_pattern.partition(".")
            fname = f"{stem}-{file_no}{dot}{ext}"
        rows = []
        with open(os.path.join(out_dir, fname), "wb") as f:
            def emit(payload: bytes) -> tuple[int, int]:
                start = f.tell()
                # mtime=0: byte-deterministic members (replayable output)
                f.write(gzip.compress(payload, mtime=0) if compress else payload)
                return start, f.tell() - start

            if info_bytes is not None:
                rid = _py_rec_id(fname + "|warcinfo")
                hdr = (
                    "WARC/1.0\r\nWARC-Type: warcinfo\r\nWARC-Date: "
                    + info_date
                    + "\r\nWARC-Record-ID: " + rid
                    + "\r\nContent-Type: application/warc-fields\r\nContent-Length:"
                    + str(len(info_bytes))
                    + "\r\n\r\n"
                )
                emit(hdr.encode("utf-8") + info_bytes + b"\r\n\r\n")
            for r in pdf.itertuples(index=False):
                start, length = emit(
                    r.warc_header.encode("utf-8") + bytes(r.body) + b"\r\n\r\n"
                )
                rows.append(
                    (r.seq, r.sub, r.record_type, r.url, r.warc_date,
                     r.content_type, r.status, r.digest, start, length, fname)
                )
        return pd.DataFrame(
            rows,
            columns=["seq", "sub", "record_type", "url", "warc_date",
                     "content_type", "status", "digest", "offset", "length",
                     "filename"],
        )

    positions = assigned.groupBy("file_no").applyInPandas(
        write_one, schema=_POSITIONS_SCHEMA
    )
    # eager: the files must exist when this returns; cache so callers reusing
    # the positions (CDX emission) don't re-write the files
    positions = positions.persist()
    positions.count()
    return positions


def write_warc_file(records: DataFrame, path: str, compress: bool = True) -> None:
    """Single-file materializer (no rotation) kept for parity tests that
    re-read one WARC. ``records`` should already include the warcinfo row."""
    import gzip

    rows = records.orderBy("seq", "sub").select("warc_header", "body").collect()
    with open(path, "wb") as f:
        for r in rows:
            payload = r.warc_header.encode("utf-8") + bytes(r.body) + b"\r\n\r\n"
            f.write(gzip.compress(payload, mtime=0) if compress else payload)
