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


def test_new_txt_quarantine(spark, tmp_path):
    from httrack2warc_spark.sources.htstxt import (
        NEW_TXT_HEADER,
        read_new_txt_with_rejects,
    )

    good = "\t".join(
        ["15:27:22", "10/10", "---M--", "200", "added ('OK')", "text/html", "",
         "http://x.org/", "x.org/index.html", "(from )"]
    )
    p = tmp_path / "new.txt"
    p.write_text(NEW_TXT_HEADER + "\n" + good + "\ngarbage line\n" + good + "\n")
    parsed, rejects = read_new_txt_with_rejects(spark, str(p))
    assert parsed.count() == 2
    rej = rejects.collect()
    assert len(rej) == 1 and rej[0].raw == "garbage line"


def test_lsh_bucket_cap(spark):
    """A degenerate bucket (many identical signatures) is dropped by the cap,
    while normal near-dup pairs survive."""
    from httrack2warc_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
    )

    base = "the quick brown fox jumps over the lazy dog again and again tonight"
    docs = [(i, base) for i in range(50)]  # one hot bucket of 50 identical docs
    docs += [(100, "completely different text about spark bloom filters")]
    docs += [(101, "completely different text about spark bloom filter")]
    df = spark.createDataFrame(docs, "id long, text string")
    sigs = minhash_signatures(df, "text", "id", num_hashes=32, shingle_n=2)
    uncapped = minhash_lsh_candidates(sigs, "id", bands=8, rows_per_band=4)
    capped = minhash_lsh_candidates(
        sigs, "id", bands=8, rows_per_band=4, max_bucket_size=10
    )
    assert uncapped.count() >= 50 * 49 // 2  # quadratic blowup
    got = {(r.a, r.b) for r in capped.collect()}
    assert (100, 101) in got  # small-bucket pair survives
    assert not any(a < 100 and b < 100 for a, b in got)  # hot bucket dropped


def test_sorted_neighborhood_pairs_window_semantics(spark):
    """Every pair within `window` positions of the blk-partitioned sort order
    (and under max_dist) is found, each exactly once; nothing beyond the
    window or over the distance bound leaks through."""
    from httrack2warc_spark.operators.fuzzy import sorted_neighborhood_pairs

    rows = [
        (1, "aaaa"), (2, "aaab"), (3, "aaba"), (4, "abzz"),
        (5, "zzzz"),              # different 2-char prefix partition
        (6, "aabb"), (7, "qqqq"),
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {(r.a, r.b): r.dist for r in sorted_neighborhood_pairs(
        df, "id", "s", window=3, max_dist=2, partition_prefix=2).collect()}

    # brute-force oracle: sort within prefix blocks, compare next 2 in order
    import itertools

    def lev(x, y):
        d = list(range(len(y) + 1))
        for i, cx in enumerate(x, 1):
            prev, d[0] = d[0], i
            for j, cy in enumerate(y, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                       prev + (cx != cy))
        return d[len(y)]

    expect = {}
    key = sorted(rows, key=lambda r: (r[1], r[0]))
    by_blk = itertools.groupby(key, key=lambda r: r[1][:2])
    for _, grp in by_blk:
        grp = list(grp)
        for i, (ida, sa) in enumerate(grp):
            for idb, sb in grp[i + 1:i + 3]:
                d = lev(sa, sb)
                if d <= 2:
                    expect[(min(ida, idb), max(ida, idb))] = d
    assert got == expect
    # skew immunity: each record generates at most window-1 forward candidates
    assert len(got) <= len(rows) * 2


def test_html_to_text_extraction_chain(spark):
    """The documented pass order: script/style/head/comment strip, block-tag
    newlines, entity decode with &amp; LAST, whitespace collapse including
    newline padding (trim() alone leaves newlines)."""
    from pyspark.sql import functions as F

    from httrack2warc_spark.functions.text import html_title, html_to_text

    cases = [
        (1, '<html><head><title> A &amp;lt; B </title>'
            '<style>p { color: red; }</style></head>'
            '<body><p>one</p><p>two &amp; three</p></body></html>'),
        (2, '<div>x</div><script>if (a < b) { alert("</div>"); }</script>'
            '<span>y</span>'),
        (3, 'plain text, no markup'),
        (4, '<body><ul><li>a</li><li>b</li></ul><!-- <p>ghost</p> --></body>'),
    ]
    df = spark.createDataFrame(cases, "id long, html string")
    out = {
        r.id: (r.t, r.ti)
        for r in df.select(
            "id",
            html_to_text(F.col("html")).alias("t"),
            html_title(F.col("html")).alias("ti"),
        ).collect()
    }
    # &amp;lt; decodes ONCE to &lt; (amp last); title whitespace collapsed
    assert out[1] == ("one\ntwo & three", "A &lt; B")
    # raw '<' inside script must not break the strip; span → inline space
    assert out[2] == ("x\ny", "")
    assert out[3] == ("plain text, no markup", "")
    # commented-out markup never surfaces
    assert out[4] == ("a\nb", "")
