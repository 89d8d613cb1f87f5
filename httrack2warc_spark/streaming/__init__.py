"""Structured Streaming surface of the engine."""

from httrack2warc_spark.streaming.dedup_stream import (  # noqa: F401
    streaming_exact_dedup,
    streaming_sessionize,
)
from httrack2warc_spark.streaming.frontier_stream import run_discovery_stream  # noqa: F401
from httrack2warc_spark.streaming.corpus_stream import run_corpus_stream  # noqa: F401
from httrack2warc_spark.streaming.sketch_stream import (  # noqa: F401
    streaming_hll_registers,
    streaming_quantile_bins,
)
