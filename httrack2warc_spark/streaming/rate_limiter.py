"""Stateful per-host politeness enforcement over a fetch-request stream
(SURVEY.md §2.9 / O3 in streaming form).

The batch scheduler enforces per-host budgets with a window top-k per round;
a continuously-fed fetcher needs the same policy as a *stateful streaming
operator*: for each host, admit at most ``budget`` requests per micro-batch
window and carry the cumulative admitted count across batches. Implemented
with ``applyInPandasWithState`` — the custom-stateful-operator surface the
engine exposes (per the build plan: "applyInPandasWithState for custom
stateful operators").

State per host: (admitted_total, batch_count). Rows beyond the batch budget
are emitted with ``admitted = false`` (the caller re-queues them — dropping
would violate the no-URL-loss invariant).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["rate_limit_stream"]

OUTPUT_SCHEMA = (
    "host string, url string, req_seq long, admitted boolean, "
    "admitted_total long, batch_no long"
)
STATE_SCHEMA = "admitted_total long, batch_count long"


def _limiter(budget_per_batch: int):
    def fn(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        if state.exists:
            admitted_total, batch_count = state.get
        else:
            admitted_total, batch_count = 0, 0
        batch_count += 1
        admitted_this_batch = 0
        for pdf in pdfs:
            pdf = pdf.sort_values("req_seq")
            out = pdf[["host", "url", "req_seq"]].copy()
            room = budget_per_batch - admitted_this_batch
            flags = [i < room for i in range(len(pdf))]
            admitted_this_batch += min(room, len(pdf))
            admitted_total += sum(flags)
            out["admitted"] = flags
            out["admitted_total"] = admitted_total
            out["batch_no"] = batch_count
            yield out
        state.update((admitted_total, batch_count))

    return fn


def rate_limit_stream(requests: DataFrame, budget_per_batch: int) -> DataFrame:
    """``requests``: streaming DF with (host, url, req_seq). Returns the
    admitted/deferred decision stream (append mode)."""
    return requests.groupBy("host").applyInPandasWithState(
        _limiter(budget_per_batch),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
