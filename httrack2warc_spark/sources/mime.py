"""S10 — MIME lookup table (extension → type).

Reference: ``MimeTypes.java:59-77`` parses a bundled 1,857-line ``mime.types``
resource (``type ext1 ext2 …`` lines, ``#`` comments); lookups take the
substring after the *last* dot (``MimeTypes.java:50-57``) and the resolution
chain is record.mime → extension lookup → ``application/octet-stream``
(``Httrack2Warc.java:186-189``).

Here: ``FULL_MIME`` (mime_data.py) carries the complete public table — 1,529
extensions generated from the Debian ``media-types`` data, the same
public-domain Apache lineage as the reference's bundled resource — overlaid
so the common web types keep the reference's values. ``BUILTIN_MIME`` remains
the compact core subset (used where a tiny literal map is preferable). A
loader accepts any Apache-style ``mime.types`` file the deployment provides.
Exposed as a DataFrame meant for a broadcast join (P10/J5), or as a scalar
``coalesce`` chain via ``resolve_mime``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from httrack2warc_spark.sources.mime_data import FULL_MIME

__all__ = ["BUILTIN_MIME", "FULL_MIME", "mime_table", "load_mime_types",
           "resolve_mime"]

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
    table = dict(FULL_MIME)
    if extra_file:
        table.update(load_mime_types(extra_file))
    return spark.createDataFrame(list(table.items()), "ext string, mime_by_ext string")


# one literal "ext:mime,ext:mime,..." string — str_to_map of literals folds to
# a single constant map in the plan (no 1,529-entry create_map expression tree)
_FULL_MIME_LITERAL = ",".join(f"{k}:{v}" for k, v in sorted(FULL_MIME.items()))


def resolve_mime(mime_col: Column, filename_col: Column) -> Column:
    """P10 as a pure-Column coalesce chain over the FULL table as a folded map
    literal (stays inside codegen). Extension = substring after the last '.',
    lowercased (``MimeTypes.java:50-57``). At corpus scale prefer the
    broadcast-join form (``mime_table`` + J5) — a literal-map probe is a
    linear scan per row, the broadcast hash join is O(1)."""
    mime_map = F.str_to_map(F.lit(_FULL_MIME_LITERAL), F.lit(","), F.lit(":"))
    ext = F.lower(F.substring_index(filename_col, ".", -1))
    return F.coalesce(
        F.when(mime_col.isNotNull() & (mime_col != ""), mime_col),
        mime_map[ext],
        F.lit("application/octet-stream"),
    )
