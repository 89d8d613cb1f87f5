"""Streaming frontier ingestion (SURVEY.md §2.9).

The scheduler proper is an iterative batch loop (per-round global per-host
top-k needs a barrier), but *discovery ingestion* — new candidate URLs
arriving continuously from fetcher workers — maps cleanly onto Structured
Streaming with ``foreachBatch``: each micro-batch runs the same
canonicalize → exclusion → within-batch first-occurrence dedup →
Bloom-gated anti-join pipeline as the batch scheduler, and commits new
frontier rows + seen-set updates through the same TableCatalog, so batch
rounds and streaming ingestion share one state store.

Source contract: a stream of ``(dst_url string, referrer string, parent_seq
long, link_idx int, parent_depth int)`` rows (any streaming source — files,
Kafka, rate). Late/duplicate arrivals are idempotent: the seen-set anti-join
drops re-discoveries regardless of arrival order (the streaming analogue of
the reference's first-wins HashSet, ``HttrackCrawl.java:130,255-258``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from httrack2warc_spark.functions.urls import canonicalize_urls_udf, strip_protocol_col, url_host_col
from httrack2warc_spark.operators.dedup import first_occurrence
from httrack2warc_spark.operators.seen import (
    add_partition_and_hashes,
    filter_new_urls,
    merge_summaries,
)
from httrack2warc_spark.sinks.tables import TableCatalog

__all__ = ["run_discovery_stream"]


def run_discovery_stream(
    spark: SparkSession,
    candidates_stream: DataFrame,
    catalog: TableCatalog,
    num_parts: int = 32,
    exclusions: list[str] | None = None,
    use_summaries: bool = True,
    checkpoint_dir: str | None = None,
    robots: "DataFrame | callable | None" = None,
    robots_refresh_every: int = 1,
    priority_overrides: "DataFrame | callable | None" = None,
    rank_refresh_every: int = 8,
):
    """Wire a streaming candidate source into the frontier state tables.
    Returns the StreamingQuery; callers pick the trigger (availableNow for
    drain-and-stop, processingTime for continuous).

    ``robots``: per-host rule rows (``functions.robots.robots_rules`` shape)
    as a static DataFrame, or a zero-arg callable re-invoked every
    ``robots_refresh_every`` micro-batches — the slowly-changing-broadcast
    pattern: a Disallow that arrives mid-stream blocks the host's candidates
    from every subsequent batch (admission-time filtering; rows admitted
    before the rule landed stay enqueued, exactly like a batch crawl that
    fetched before the rule changed).

    ``priority_overrides``: (url_key, priority) rows — e.g. derived from
    ``operators.pagerank`` over the crawl's link graph — as a DataFrame or a
    zero-arg callable re-invoked every ``rank_refresh_every`` batches.
    Matching candidates are admitted with the overridden priority (smaller =
    fetched earlier by the batch scheduler's per-host top-k).
    """
    from httrack2warc_spark.functions.robots import apply_robots_rules

    # slowly-changing broadcast state: (df, batch_id it was fetched at)
    _cache: dict = {"robots": (None, -1), "rank": (None, -1)}

    def _current(name: str, src, every: int, batch_id: int):
        if src is None:
            return None
        if not callable(src):
            return src
        df, fetched_at = _cache[name]
        if df is None or batch_id - fetched_at >= every:
            df = src()
            _cache[name] = (df, batch_id)
        return df

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        cand = (
            batch_df.withColumn("url", canonicalize_urls_udf(F.col("dst_url")))
            .withColumn("url_key", strip_protocol_col(F.col("url")))
            .withColumn("host", url_host_col(F.col("url")))
            .withColumn("depth", (F.col("parent_depth") + 1).cast("int"))
            .withColumn("priority", (F.col("parent_depth") + 1).cast("int"))
            .select(
                "url", "url_key", "host", "depth", "priority",
                "parent_seq", "link_idx", "referrer",
            )
        )
        for rx in exclusions or []:
            cand = cand.where(~F.col("url").rlike(f"^(?:{rx})$"))
        rules = _current("robots", robots, robots_refresh_every, batch_id)
        if rules is not None:
            cand = apply_robots_rules(cand, rules)
        rank = _current("rank", priority_overrides, rank_refresh_every, batch_id)
        if rank is not None:
            cand = (
                cand.join(
                    F.broadcast(
                        rank.select("url_key", F.col("priority").alias("__prio"))
                    ),
                    "url_key",
                    "left",
                )
                .withColumn(
                    "priority",
                    F.coalesce(F.col("__prio"), F.col("priority")).cast("int"),
                )
                .drop("__prio")
            )
        cand = first_occurrence(
            cand, "url_key", ["parent_seq", "link_idx"], tiebreak=["url"]
        )

        seen = catalog.read("url_seen")
        summaries = catalog.read("seen_summary") if use_summaries else None
        new_rows = filter_new_urls(
            cand, seen, summaries, "url_key", num_parts
        ).persist()

        # O(delta) appends, same discipline as the batch scheduler — a
        # read+union+write here would rewrite the full frontier/seen state
        # every micro-batch (the iterative-state trap, continuously)
        catalog.append(
            "frontier",
            new_rows.select(
                "url", "url_key", "host", "depth", "priority",
                "parent_seq", "link_idx", "referrer",
            ),
        )
        new_seen = new_rows.select(
            "url_key", "url", F.lit(-1).alias("enqueued_round")
        )
        catalog.append("url_seen", new_seen)
        if use_summaries:
            catalog.write(
                "seen_summary",
                merge_summaries(
                    summaries,
                    add_partition_and_hashes(new_seen, "url_key", num_parts),
                    num_parts,
                ),
            )
        new_rows.unpersist()

    writer = candidates_stream.writeStream.foreachBatch(process_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer
