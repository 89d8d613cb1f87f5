"""J3 — mirror-link rewriting (reference ``LinkRewriter.java:16-92``).

HTTrack rewrites page links to point at local mirror files; converting back to
an archive needs the inverse map. Reference semantics:

- pass 1: over the whole crawl, map ``SEMANTIC-canonical("http://httrack/" +
  filename) → url`` (``LinkRewriter.java:19-25``);
- pass 2: per HTML doc, for each URI attribute: resolve against the base
  ``http://httrack/<filename>``, detach the fragment, SEMANTIC-canonicalize +
  strip the query, special-case ``external.html?link=`` (``:66-68``), look the
  mirror path up in the map, re-attach the fragment (``:76-78``), replace the
  attribute value HTML-entity-encoded in quotes (``:80-82``).

Spark-first: pass 1 is a projection; its output is collected to a plain dict
and shipped as a broadcast variable (the reference holds the same map in heap;
for truly huge crawls switch to the explode→join→reassemble plan). Pass 2 is
an Arrow-batched pandas UDF: regex attribute scan (stdlib stand-in for the
Jericho HTML parser — same attribute set: href/src/action/background/cite/
codebase/data/longdesc/profile/usemap), urllib resolution, the
canonicalization kernel from ``functions.urls``.

SEMANTIC canonicalization here = WHATWG + decode of safe percent-escapes —
for the ``http://httrack/<path>`` mirror-path namespace the WHATWG kernel is
sufficient (paths are percent-encoded consistently on both sides because both
come from ``record.filename``).
"""

from __future__ import annotations

import html
import re
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from httrack2warc_spark.functions.urls import canonicalize_url

__all__ = ["build_url_map", "rewrite_html", "rewrite_links"]

# the URI-valued attributes Jericho's getURIAttributes covers
_URI_ATTRS = (
    "href|src|action|background|cite|codebase|data|longdesc|profile|usemap"
)
_ATTR_RE = re.compile(
    r"(?i)\b(" + _URI_ATTRS + r")\s*=\s*(\"([^\"]*)\"|'([^']*)'|([^\s>]+))"
)


def _mirror_key(filename: str) -> str:
    url = canonicalize_url("http://httrack/" + filename)
    # SEMANTIC strips the query for map keys (LinkRewriter.java:63-64)
    for stop in "?#":
        k = url.find(stop)
        if k != -1:
            url = url[:k]
    return url


def build_url_map(crawl: DataFrame) -> DataFrame:
    """Pass 1 as a DataFrame: (mirror_key, url)."""
    from httrack2warc_spark.functions.urls import canonicalize_urls_udf

    keyed = crawl.where(F.col("filename").isNotNull()).select(
        canonicalize_urls_udf(
            F.concat(F.lit("http://httrack/"), F.col("filename"))
        ).alias("mirror_url"),
        F.col("url"),
    )
    return keyed.select(
        F.regexp_replace("mirror_url", r"[?#].*$", "").alias("mirror_key"), "url"
    )


def rewrite_html(doc: str, filename: str, url_map: dict[str, str]) -> tuple[str, int]:
    """Pass 2 kernel for one document. Returns (rewritten, n_rewritten)."""
    base = "http://httrack/" + filename

    def sub(m: re.Match) -> str:
        nonlocal count
        attr = m.group(1)
        value = m.group(3) if m.group(3) is not None else (
            m.group(4) if m.group(4) is not None else m.group(5)
        )
        if not value:
            return m.group(0)
        try:
            resolved = urljoin(base, html.unescape(value))
        except ValueError:
            return m.group(0)
        frag = None
        if "#" in resolved:
            resolved, frag = resolved.split("#", 1)
        query = None
        if "?" in resolved:
            resolved, query = resolved.split("?", 1)
        key = canonicalize_url(resolved)
        key = re.sub(r"[?#].*$", "", key)
        if key == "http://httrack/external.html" and query and query.startswith("link="):
            original = canonicalize_url(query[len("link="):])
        else:
            original = url_map.get(key)
        if original is None:
            return m.group(0)
        if frag is not None:
            original += "#" + frag
        count += 1
        return f'{attr}="{html.escape(original, quote=True)}"'

    count = 0
    return _ATTR_RE.sub(sub, doc), count


def rewrite_links(
    spark: SparkSession,
    crawl: DataFrame,
    doc_col: str = "payload",
    filename_col: str = "filename",
) -> DataFrame:
    """Rewrites mirror links back to original URLs for cache-less .html rows
    (the reference's gate: filename endswith .html and no cache data,
    ``Httrack2Warc.java:211-217``). Adds ``rewritten`` (binary) and
    ``links_rewritten`` (long) columns."""
    url_map = {
        r.mirror_key: r.url for r in build_url_map(crawl).collect()
    }
    bc = spark.sparkContext.broadcast(url_map)

    fields = crawl.schema.fields
    out_schema = StructType(
        fields
        + [
            StructField("rewritten", StringType(), True),
            StructField("links_rewritten", LongType(), False),
        ]
    )

    eligible = (
        F.col(filename_col).isNotNull()
        & F.col(filename_col).endswith(".html")
        & ~F.col("has_cache_data")
        & F.col(doc_col).isNotNull()
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        m = bc.value
        outs, counts = [], []
        for ok, doc, fname in zip(pdf["eligible__"], pdf[doc_col], pdf[filename_col]):
            if not ok:
                outs.append(None)
                counts.append(0)
                continue
            new, n = rewrite_html(bytes(doc).decode("iso-8859-1"), fname, m)
            outs.append(new)
            counts.append(n)
        out = pdf.drop(columns=["eligible__"])
        out["rewritten"] = outs
        out["links_rewritten"] = pd.array(counts, dtype="int64")
        return out

    marked = crawl.withColumn("eligible__", eligible)
    return marked.mapInPandas(lambda it: (run(pdf) for pdf in it), schema=out_schema)
