"""Payload digests.

Reference: streaming SHA-1 over the payload with a custom RFC-4648 base32
encoding — 40-bit groups, no padding (``Digests.java:11-49``). Golden value:
the empty body digests to ``3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ``
(``test/.../RedirectWriterTest.java:36``).

Spark's builtin ``sha1()`` returns hex, so the base32 form is a vectorized
pandas UDF over the binary column (hashlib+b32encode per Arrow batch; the
per-element Python is amortized across the batch and is digest-bound anyway).
"""

from __future__ import annotations

import base64
import hashlib

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

__all__ = ["sha1_base32", "sha1_base32_udf"]


def sha1_base32(data: bytes | None) -> str | None:
    if data is None:
        return None
    return base64.b32encode(hashlib.sha1(data).digest()).decode("ascii").rstrip("=")


@pandas_udf(StringType())
def sha1_base32_udf(payload: pd.Series) -> pd.Series:
    return payload.map(sha1_base32, na_action="ignore")
