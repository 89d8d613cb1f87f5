"""Small coverage gaps: F3 lax missing-file skip; IVF ANN recall sanity."""

from pyspark.sql import functions as F

from httrack2warc_spark.sinks.warc import warc_records
from httrack2warc_spark.sources.htslogs import CrawlMeta


def _crawl_df(spark):
    import datetime

    rows = [
        # (seq, ts, url, mime, req, resp, ref, filename, status, size, payload, cache)
        (1, datetime.datetime(2018, 2, 2, 15, 0, 0), "http://x.org/ok", "text/html",
         None, None, None, "x.org/ok.html", 200, 5, bytearray(b"hello"), True, "txt"),
        (2, datetime.datetime(2018, 2, 2, 15, 0, 1), "http://x.org/missing404", "text/html",
         None, None, None, "x.org/missing.html", 404, 0, None, False, "txt"),
    ]
    return spark.createDataFrame(
        rows,
        "seq long, timestamp timestamp, url string, mime string, "
        "request_header string, response_header string, referrer string, "
        "filename string, status int, size long, payload binary, "
        "has_cache_data boolean, source string",
    )


def test_f3_lax_drops_missing_error_files(spark):
    meta = CrawlMeta(version="3.49-2")
    strict = warc_records(_crawl_df(spark), meta, strict=True)
    lax = warc_records(_crawl_df(spark), meta, strict=False)
    strict_urls = {r.url for r in strict.where(F.col("sub") == 0).collect()}
    lax_urls = {r.url for r in lax.where(F.col("sub") == 0).collect()}
    assert "http://x.org/missing404" in strict_urls  # strict keeps (and truncates)
    assert "http://x.org/missing404" not in lax_urls  # F3: lax drops
    assert "http://x.org/ok" in lax_urls
    # strict mode marks the payload-less error record truncated
    rec = strict.where(
        (F.col("url") == "http://x.org/missing404") & (F.col("sub") == 0)
    ).collect()[0]
    assert "WARC-Truncated: unspecified" in rec.warc_header


def test_ivf_topk_recall(spark):
    """IVF with full probe (nprobe == n_cells) must equal brute force."""
    import numpy as np

    from httrack2warc_spark.operators.similarity import brute_force_topk, ivf_topk

    rng = np.random.default_rng(7)
    vecs = [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(200)]
    df = spark.createDataFrame(vecs, "id long, v array<double>")
    q = df.where(F.col("id") == 0).select(F.lit(0).alias("query_id"), "v")
    corpus = df.where(F.col("id") != 0)
    exact = {r.id for r in brute_force_topk(corpus, q, "v", "id", k=5).collect()}
    full_probe = {
        r.id
        for r in ivf_topk(corpus, q, "v", "id", k=5, n_cells=4, nprobe=4).collect()
    }
    assert full_probe == exact
    # partial probe is a subset-quality tradeoff but still returns k rows
    part = ivf_topk(corpus, q, "v", "id", k=5, n_cells=4, nprobe=2).collect()
    assert len(part) == 5
