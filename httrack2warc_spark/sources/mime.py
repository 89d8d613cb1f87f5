"""S10 — MIME lookup table (extension → type).

Reference: ``MimeTypes.java:59-77`` parses a bundled 1,857-line ``mime.types``
resource (``type ext1 ext2 …`` lines, ``#`` comments); lookups take the
substring after the *last* dot (``MimeTypes.java:50-57``) and the resolution
chain is record.mime → extension lookup → ``application/octet-stream``
(``Httrack2Warc.java:186-189``).

Here: a compact built-in table of the common web types (the fixture corpus
uses only a handful) + a loader for any Apache-style ``mime.types`` file the
deployment provides. Exposed as a small DataFrame meant for a broadcast join
(P10/J5), or as a scalar ``coalesce`` chain via ``resolve_mime``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["BUILTIN_MIME", "mime_table", "load_mime_types", "resolve_mime"]

BUILTIN_MIME: dict[str, str] = {
    "html": "text/html", "htm": "text/html", "xhtml": "application/xhtml+xml",
    "css": "text/css", "js": "application/javascript", "json": "application/json",
    "xml": "application/xml", "txt": "text/plain", "csv": "text/csv",
    "gif": "image/gif", "png": "image/png", "jpg": "image/jpeg",
    "jpeg": "image/jpeg", "webp": "image/webp", "svg": "image/svg+xml",
    "ico": "image/vnd.microsoft.icon", "bmp": "image/bmp", "tiff": "image/tiff",
    "mp3": "audio/mpeg", "wav": "audio/x-wav", "ogg": "audio/ogg",
    "mp4": "video/mp4", "webm": "video/webm", "avi": "video/x-msvideo",
    "mpeg": "video/mpeg", "mov": "video/quicktime",
    "pdf": "application/pdf", "zip": "application/zip", "gz": "application/gzip",
    "tar": "application/x-tar", "doc": "application/msword",
    "woff": "font/woff", "woff2": "font/woff2", "ttf": "font/ttf",
    "rss": "application/rss+xml", "atom": "application/atom+xml",
}


def load_mime_types(path: str) -> dict[str, str]:
    """Parse an Apache-style mime.types file (same grammar as the reference)."""
    table: dict[str, str] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if not line:
                continue
            parts = line.split()
            for ext in parts[1:]:
                table[ext.lower()] = parts[0]
    return table


def mime_table(spark: SparkSession, extra_file: str | None = None) -> DataFrame:
    table = dict(BUILTIN_MIME)
    if extra_file:
        table.update(load_mime_types(extra_file))
    return spark.createDataFrame(list(table.items()), "ext string, mime_by_ext string")


def resolve_mime(mime_col: Column, filename_col: Column) -> Column:
    """P10 as a pure-Column coalesce chain using the builtin table as a map
    literal (stays inside codegen; use the broadcast-join form for big custom
    tables). Extension = substring after the last '.', lowercased."""
    pairs: list[Column] = []
    for k, v in BUILTIN_MIME.items():
        pairs.extend([F.lit(k), F.lit(v)])
    mime_map = F.create_map(*pairs)
    ext = F.lower(F.substring_index(filename_col, ".", -1))
    return F.coalesce(
        F.when(mime_col.isNotNull() & (mime_col != ""), mime_col),
        mime_map[ext],
        F.lit("application/octet-stream"),
    )
