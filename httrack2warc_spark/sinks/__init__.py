"""Sinks: engine-owned table IO (Iceberg when available, parquet fallback),
WARC/CDX serialization projections."""

from httrack2warc_spark.sinks.tables import TableCatalog  # noqa: F401
