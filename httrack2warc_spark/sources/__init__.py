"""HTTrack file-format scans (S1-S11) → DataFrames."""

from httrack2warc_spark.sources.htstxt import NEW_TXT_HEADER, read_new_txt  # noqa: F401
from httrack2warc_spark.sources.ioinfo import parse_ioinfo_lines, read_ioinfo  # noqa: F401
from httrack2warc_spark.sources.htslogs import (  # noqa: F401
    CrawlMeta,
    parse_doit_log,
    parse_hts_log,
    read_crawl_meta,
    read_debug_log,
    read_warn_log,
)
from httrack2warc_spark.sources.caches import read_ndx_cache, read_zip_cache  # noqa: F401
from httrack2warc_spark.sources.mime import mime_table  # noqa: F401
from httrack2warc_spark.sources.crawl import read_crawl  # noqa: F401
