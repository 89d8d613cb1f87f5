"""httrack2warc_spark — a from-scratch PySpark-native URL-frontier + fetch-scheduler
engine with the query/data-processing semantics of nla/httrack2warc.

The reference (/root/reference, Java, single-threaded) converts HTTrack crawl
directories to WARC+CDX. This package re-expresses every operator it performs —
and the crawl process it *replays* — as idiomatic Spark DataFrame plans:

- ``sources``   : HTTrack file-format scans (new.txt, ioinfo, logs, caches) → DataFrames
- ``functions`` : vectorized scalar kernels (URL canonicalization, percent codecs,
                  SHA1-base32, image decode/phash, text analysis)
- ``operators`` : relational building blocks (ordinal FIFO join, first-occurrence
                  dedup, politeness top-k, Bloom/cuckoo seen-set, near-dup families)
- ``frontier``  : the iterative crawl scheduler (BFS rounds, politeness, robots,
                  checkpoint/resume with per-partition lineage metrics)
- ``sinks``     : WARC/CDX serialization projections and table (Iceberg-or-parquet) IO
"""

__version__ = "0.1.0"

from httrack2warc_spark.session import get_spark  # noqa: F401
