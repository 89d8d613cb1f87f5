"""Structured Streaming surface of the engine."""

from httrack2warc_spark.streaming.frontier_stream import run_discovery_stream  # noqa: F401
