"""WARC reading source — the inverse of ``sinks/warc.py``: load ``.warc.gz``
(or uncompressed ``.warc``) files back into a records DataFrame.

The reference is write-only (it converts HTTrack → WARC and stops); an
archive *engine* also needs the read side — QA of produced archives,
re-deriving CDX indexes, feeding replay/analysis pipelines. Grammar
implemented: WARC/1.0 records, one gzip member per record when compressed
(``Compression.java:24-42`` framing — exactly what ``write_warc_files``
emits; multi-record members and plain concatenated streams also parse,
since the member splitter is just a resumable zlib loop over the byte
stream).

Spark-first shape: ``spark.read.format("binaryFile")`` gives one row per
WARC file (each ≈1 GiB under the rotation policy — the natural task
granularity), then a ``mapInPandas`` fan-out parses every record of the file
into its own output row, carrying (offset, length) so CDX lines can be
re-derived byte-exactly. At 100 TB that is thousands of file-parallel parse
tasks with no shuffle at all; records repartition downstream as needed.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

__all__ = ["parse_warc_stream", "read_warc", "with_digest_check",
           "resolve_revisits"]

_SCHEMA = (
    "filename string, offset long, length long, record_type string, "
    "url string, warc_date string, record_id string, content_type string, "
    "payload_digest string, refers_to string, body binary"
)


def _split_gzip_members(data: bytes):
    """Yield (offset, member_length, decompressed_bytes) per gzip member of a
    concatenated-member stream (resumable zlib — no temp files)."""
    pos, n = 0, len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        out = d.decompress(data[pos:])
        out += d.flush()
        consumed = (n - pos) - len(d.unused_data)
        if consumed <= 0:
            raise ValueError(f"gzip member at offset {pos} consumed nothing")
        yield pos, consumed, out
        pos += consumed


def _walk_records(buf: bytes):
    """Sequential Content-Length-driven record walker (bodies are binary and
    may themselves contain ``WARC/`` or CRLF pairs — delimiter scanning is
    NOT a correct framing; the length header is). Yields
    (start, end, fields, body) per record."""
    pos, n = 0, len(buf)
    while pos < n:
        if not buf.startswith(b"WARC/", pos):
            break  # trailing junk / padding: stop cleanly
        hend = buf.find(b"\r\n\r\n", pos)
        if hend == -1:
            break
        fields = {}
        for line in buf[pos:hend].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            fields[k.strip().decode("ascii", "replace").lower()] = (
                v.strip().decode("utf-8", "replace")
            )
        try:
            length = int(fields.get("content-length", "0"))
        except ValueError:
            length = 0
        body = buf[hend + 4:hend + 4 + length]
        end = hend + 4 + length
        while buf.startswith(b"\r\n", end):  # record trailer CRLFs
            end += 2
        yield pos, end, fields, body
        pos = end


def parse_warc_stream(data: bytes, filename: str) -> list[tuple]:
    """All records of one WARC byte stream → rows matching ``_SCHEMA``.
    Compressed streams report the compressed member (offset, length) — the
    seekable CDX coordinates (shared by all records of a member when a
    foreign writer packed several; this engine writes 1:1); uncompressed
    streams report per-record byte offsets."""
    rows = []

    def emit(offset: int, length: int, fields: dict, body: bytes) -> None:
        rows.append((
            filename, offset, length,
            fields.get("warc-type"),
            fields.get("warc-target-uri"),
            fields.get("warc-date"),
            fields.get("warc-record-id"),
            fields.get("content-type"),
            fields.get("warc-payload-digest"),
            fields.get("warc-refers-to"),
            body,
        ))

    if data[:2] == b"\x1f\x8b":
        for offset, length, raw in _split_gzip_members(data):
            for _s, _e, fields, body in _walk_records(raw):
                emit(offset, length, fields, body)
    else:
        for start, end, fields, body in _walk_records(data):
            emit(start, end - start, fields, body)
    return rows


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """DataFrame of every WARC record under ``path`` (glob ok):
    (filename, offset, length, record_type, url, warc_date, record_id,
    content_type, payload_digest, body). One parse task per file."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.strip().split(" ")[0] for f in _SCHEMA.split(",")]
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                fname = r.path.rsplit("/", 1)[-1]
                rows.extend(parse_warc_stream(bytes(r.content), fname))
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(work, schema=_SCHEMA)


def with_digest_check(records: DataFrame) -> DataFrame:
    """Archive integrity audit: recompute each record's payload digest and
    compare against the stored ``WARC-Payload-Digest``. For ``application/
    http`` records the payload is the body after the HTTP header block
    (``\\r\\n\\r\\n`` split); for resource records it is the whole body —
    matching how the sink computed them. Adds ``digest_ok`` (null where the
    record carries no digest). Stays Arrow-vectorized (the digest UDF is the
    sink's own sha1_base32 kernel)."""
    import base64
    import hashlib

    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def _payload_digest(bodies: pd.Series, ctypes: pd.Series) -> pd.Series:
        out = []
        for body, ct in zip(bodies, ctypes):
            if body is None:
                out.append(None)
                continue
            raw = bytes(body)
            if ct and ct.startswith("application/http"):
                # payload = bytes after the HTTP header block (byte-exact
                # split — header bytes are ISO-8859-1, never char-counted)
                k = raw.find(b"\r\n\r\n")
                raw = raw[k + 4:] if k != -1 else raw
            out.append(
                base64.b32encode(hashlib.sha1(raw).digest()).decode("ascii")
            )
        return pd.Series(out)

    return records.withColumn(
        "digest_ok",
        F.when(
            F.col("payload_digest").isNotNull(),
            F.col("payload_digest")
            == F.concat(F.lit("sha1:"),
                        _payload_digest(F.col("body"), F.col("content_type"))),
        ),
    )


def resolve_revisits(records: DataFrame) -> DataFrame:
    """Replay-side dedup resolution: rebuild each ``revisit`` record's full
    HTTP message by splicing the referred-to original's payload back in
    (WARC 1.1 §6.7.2 identical-payload-digest — the revisit stores only the
    HTTP header block; ``WARC-Refers-To`` names the record that kept the
    bytes). Adds ``resolved_body``: for every non-revisit row it is ``body``
    verbatim; for a revisit row it is the revisit's own HTTP headers followed
    by the original's payload (bytes after the original's HTTP header block),
    or null when the referred-to record is absent from the input (a dangling
    pointer — e.g. reading one file of a rotated set).

    Spark-first shape: one equi-join on the 47-byte ``record_id`` key (both
    sides shuffle-partitioned on it; no window, no collect) and one
    Arrow-vectorized splice pass. At archive scale the revisit side is the
    small minority of rows, so the join cost is bounded by the original-
    record shuffle — the same key layout a CDX digest lookup would use."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    @pandas_udf(BinaryType())
    def _splice(rev_bodies: pd.Series, orig_bodies: pd.Series,
                orig_ctypes: pd.Series) -> pd.Series:
        out = []
        for rev, orig, ct in zip(rev_bodies, orig_bodies, orig_ctypes):
            if orig is None:
                out.append(None)
                continue
            raw = bytes(orig)
            if ct and ct.startswith("application/http"):
                k = raw.find(b"\r\n\r\n")
                raw = raw[k + 4:] if k != -1 else raw
            out.append((bytes(rev) if rev is not None else b"") + raw)
        return pd.Series(out)

    originals = records.where(
        (F.col("record_type") != "revisit") & F.col("record_id").isNotNull()
    ).select(
        F.col("record_id").alias("__orig_id"),
        F.col("content_type").alias("__orig_ct"),
        F.col("body").alias("__orig_body"),
    )
    joined = records.join(
        originals, records["refers_to"] == originals["__orig_id"], "left"
    )
    return joined.withColumn(
        "resolved_body",
        F.when(F.col("record_type") != "revisit", F.col("body")).otherwise(
            _splice(F.col("body"), F.col("__orig_body"), F.col("__orig_ct"))
        ),
    ).drop("__orig_id", "__orig_ct", "__orig_body")
