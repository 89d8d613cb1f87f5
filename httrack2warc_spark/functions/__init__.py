"""Vectorized scalar kernels (pandas/Arrow UDFs) + JVM-side Column helpers."""

from httrack2warc_spark.functions.urls import (  # noqa: F401
    canonicalize_url,
    canonicalize_urls_udf,
    make_header_key,
    make_header_key_udf,
    percent_decode,
    percent_decode_udf,
    percent_encode,
    percent_encode_udf,
    strip_protocol,
    strip_protocol_col,
    url_host,
    url_host_col,
)
from httrack2warc_spark.functions.digests import sha1_base32, sha1_base32_udf  # noqa: F401
