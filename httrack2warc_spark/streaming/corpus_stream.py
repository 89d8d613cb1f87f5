"""Streaming corpus preparation — the training-data half of the pipeline,
run continuously: documents discovered mid-crawl land pre-chunked (and
pre-sampled) in the same catalog tables the batch corpus operators fill.

``foreachBatch`` is the right seam because chunking and the md5-draw sampler
are *pure per-document functions* (``operators/corpus.py``): a document
produces bit-identical chunk boundaries and an identical sample-membership
decision whether it arrives in a batch job or in micro-batch 17 of a stream.
That invariant is what makes mixing batch backfill + streaming ingestion
into one corpus sound, and it is what the test asserts.

Idempotence: foreachBatch re-delivers a batch after a failure, so the sink
anti-joins arriving doc ids against the already-chunked id set before
appending — the same O(delta), ids-only discipline as the frontier stream's
seen-set join (re-chunked duplicates are dropped, never double-appended).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from httrack2warc_spark.operators.corpus import chunk_documents, deterministic_sample
from httrack2warc_spark.sinks.tables import TableCatalog

__all__ = ["run_corpus_stream"]


def run_corpus_stream(
    spark: SparkSession,
    docs_stream: DataFrame,
    catalog: TableCatalog,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 128,
    overlap: int = 0,
    sample_fraction: float | None = None,
    sample_seed: int = 0,
    chunks_table: str = "doc_chunks",
    checkpoint_dir: str | None = None,
):
    """Wire a streaming document source into the chunked-corpus table.
    Returns the DataStreamWriter; callers pick the trigger (availableNow for
    drain-and-stop, processingTime for continuous).

    Per micro-batch: optional ``deterministic_sample`` (md5-draw family —
    membership is a pure function of ``id_col`` + ``sample_seed``, so a
    document kept by a batch backfill is kept by the stream and vice versa)
    → anti-join against already-chunked ids (idempotent re-delivery) →
    ``chunk_documents`` → O(delta) append. Chunk rows:
    (id, chunk_idx, chunk_text, n_tokens).

    Scale: the only shuffle is the ids-only anti-join; chunking itself is a
    narrow per-partition fan-out and the append never rewrites prior state.
    """

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        docs = batch_df
        if sample_fraction is not None:
            docs = deterministic_sample(
                docs, id_col, sample_fraction, seed=sample_seed
            )
        if catalog.exists(chunks_table):
            done_ids = (
                catalog.read(chunks_table).select(id_col).distinct()
            )
            docs = docs.join(done_ids, id_col, "left_anti")
        chunks = chunk_documents(
            docs, text_col, id_col, max_tokens=max_tokens, overlap=overlap
        )
        catalog.append(chunks_table, chunks)

    writer = docs_stream.writeStream.foreachBatch(process_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer
