"""S7/S8 — HTTrack payload caches → (url, bytes, size, has_data) DataFrames.

- S7 zip cache (``httrack/ZipCache.java:33-80``): ``hts-cache/new.zip``, one
  entry per URL (entry name = raw URL, canonicalized on index build).
- S8 ndx/dat cache (``httrack/NdxCache.java:31-129``): ``new.ndx`` is a
  sequence of length-prefixed strings (``<len>\\n<bytes>``): version
  (``CACHE-1.*``), last-modified, then (host+"\\n"+path+trailer, offset-line)
  pairs; a *negative* offset flags "no data". ``new.dat`` at |offset| holds
  six length-prefixed header strings (status, size, msg, content-type,
  last-modified, etag), then tagged strings until ``HTS`` (``SD`` consumes one
  extra), then the data length and the payload bytes.

Both decoders run executor-side in ``mapInPandas`` over the (path) row — one
task per cache file; a multi-crawl ingest parallelizes across crawls. Payload
bytes land in a ``binary`` column (the engine's analogue of the reference's
lazy ``CacheEntry`` streams: Spark's columnar batches + spill replace manual
8 KiB streaming).
"""

from __future__ import annotations

import zipfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from httrack2warc_spark.functions.urls import canonicalize_url

__all__ = ["read_zip_cache", "read_ndx_cache", "parse_ndx_index", "read_dat_entry"]

_CACHE_SCHEMA = "url string, bytes binary, size long, has_data boolean"


def read_zip_cache(spark: SparkSession, zip_path: str) -> DataFrame:
    paths = spark.createDataFrame([(zip_path,)], "path string")

    def load(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p in pdf["path"]:
                with zipfile.ZipFile(p) as zf:
                    rows = []
                    for info in zf.infolist():
                        data = zf.read(info) if info.file_size > 0 else b""
                        rows.append(
                            (
                                canonicalize_url(info.filename),
                                data,
                                info.file_size,
                                info.file_size > 0,
                            )
                        )
                    yield pd.DataFrame(rows, columns=["url", "bytes", "size", "has_data"])

    return paths.mapInPandas(load, schema=_CACHE_SCHEMA)


# --- ndx/dat ------------------------------------------------------------------


def _read_lp_string(buf: bytes, pos: int) -> tuple[str | None, int]:
    """length-prefixed string: ASCII length line + '\\n' + payload bytes."""
    nl = buf.find(b"\n", pos)
    if nl == -1:
        return None, pos
    length = int(buf[pos:nl])
    start = nl + 1
    return buf[start : start + length].decode("iso-8859-1"), start + length


def parse_ndx_index(ndx_bytes: bytes) -> list[tuple[str, int]]:
    """→ [(canonical_url, offset)] (negative offset = no data)."""
    pos = 0
    version, pos = _read_lp_string(ndx_bytes, pos)
    if version is None or not version.startswith("CACHE-1."):
        raise ValueError(f"Unsupported cache version: {version}")
    _last_modified, pos = _read_lp_string(ndx_bytes, pos)
    out = []
    while True:
        host_and_path, pos = _read_lp_string(ndx_bytes, pos)
        if host_and_path is None:
            break
        nl = ndx_bytes.find(b"\n", pos)
        offset = int(ndx_bytes[pos:nl])
        pos = nl + 1
        i = host_and_path.index("\n")
        url = host_and_path[:i] + host_and_path[i + 1 : -1]
        out.append((canonicalize_url(url), offset))
    return out


def read_dat_entry(dat: bytes, offset: int) -> bytes:
    """Skip the tagged header at |offset|, return the payload bytes."""
    pos = abs(offset)
    for _ in range(6):  # status, size, msg, content-type, last-modified, etag
        _, pos = _read_lp_string(dat, pos)
    while True:
        tag, pos = _read_lp_string(dat, pos)
        if tag == "HTS":
            break
        if tag == "SD":
            _, pos = _read_lp_string(dat, pos)
    size_str, pos = _read_lp_string(dat, pos)
    data_len = int(size_str)
    return dat[pos : pos + data_len]


def read_ndx_cache(spark: SparkSession, crawl_dir: str) -> DataFrame:
    paths = spark.createDataFrame([(crawl_dir,)], "dir string")

    def load(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pathlib import Path

        for pdf in batches:
            for d in pdf["dir"]:
                ndx = (Path(d) / "hts-cache/new.ndx").read_bytes()
                dat = (Path(d) / "hts-cache/new.dat").read_bytes()
                rows = []
                for url, offset in parse_ndx_index(ndx):
                    has_data = offset >= 0
                    data = read_dat_entry(dat, offset)
                    rows.append((url, data, len(data), has_data))
                yield pd.DataFrame(rows, columns=["url", "bytes", "size", "has_data"])

    return paths.mapInPandas(load, schema=_CACHE_SCHEMA)
