"""Operator unit tests: ordinal FIFO join (J1), first-occurrence dedup (A1),
politeness top-k plain vs salted (O3/O4), date wraparound (P6), seen-set
filters (J6 + Bloom/cuckoo)."""

import datetime

from pyspark.sql import functions as F

from httrack2warc_spark.operators.dedup import exact_dedup, first_occurrence
from httrack2warc_spark.operators.ordinal_join import ordinal_fifo_join
from httrack2warc_spark.operators.seen import (
    add_partition_and_hashes,
    build_summaries,
    filter_new_urls,
    merge_summaries,
    probe_summaries,
)
from httrack2warc_spark.operators.topk import per_key_topk, salted_per_key_topk
from httrack2warc_spark.operators.windows import date_wraparound


def test_ordinal_fifo_join_queue_semantics(spark):
    """k-th probe occurrence of a key gets the k-th build occurrence — the
    reference's queue poll() (HttrackCrawl.java:80-81,173-174), including the
    http/https collapse case."""
    probe = spark.createDataFrame(
        [("a.b/", 1), ("a.b/", 2), ("c.d/x", 3), ("a.b/", 4)],
        "key string, seq int",
    )
    build = spark.createDataFrame(
        [("a.b/", 0, "H1"), ("a.b/", 1, "H2"), ("c.d/x", 2, "H3")],
        "key string, bseq int, hdr string",
    )
    out = {
        (r.key, r.seq): r.hdr
        for r in ordinal_fifo_join(probe, build, "key", "seq", "bseq").collect()
    }
    assert out[("a.b/", 1)] == "H1"
    assert out[("a.b/", 2)] == "H2"
    assert out[("c.d/x", 3)] == "H3"
    assert out[("a.b/", 4)] is None  # queue exhausted → poll() returns null


def test_first_occurrence(spark):
    df = spark.createDataFrame(
        [("f1", 3), ("f1", 1), ("f2", 2)], "file string, seq int"
    )
    rows = first_occurrence(df, "file", ["seq"]).collect()
    assert {(r.file, r.seq) for r in rows} == {("f1", 1), ("f2", 2)}


def test_exact_dedup_keeps_first(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], "id long, text string"
    )
    rows = exact_dedup(df, ["text"], "id").collect()
    assert {r.id for r in rows} == {1, 3}


def test_salted_topk_equals_plain(spark):
    import random

    random.seed(7)
    data = [
        (f"host{i % 5}", random.randint(0, 100), f"u{i}") for i in range(500)
    ] + [("hot", random.randint(0, 100), f"h{i}") for i in range(2000)]
    df = spark.createDataFrame(data, "host string, priority int, url string")
    order = [F.col("priority"), F.col("url")]
    plain = per_key_topk(df, "host", order, 7)
    salted = salted_per_key_topk(df, "host", order, 7, salt_buckets=8, salt_on="url")
    a = sorted((r.host, r.priority, r.url) for r in plain.collect())
    b = sorted((r.host, r.priority, r.url) for r in salted.collect())
    assert a == b and len(a) == 6 * 7


def test_per_key_topk_column_budget(spark):
    df = spark.createDataFrame(
        [("a", i, 3) for i in range(10)] + [("b", i, 1) for i in range(10)],
        "host string, pri int, budget int",
    )
    out = per_key_topk(df, "host", [F.col("pri")], F.col("budget"))
    counts = {r.host: r.n for r in out.groupBy("host").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 3, "b": 1}


def test_date_wraparound(spark):
    """time going backwards advances the date (HttrackCrawl.java:197-205)."""
    df = spark.createDataFrame(
        [(1, "23:59:58"), (2, "23:59:59"), (3, "00:00:01"), (4, "12:00:00"), (5, "01:00:00")],
        "seq int, time string",
    )
    out = date_wraparound(df, "time", "seq", F.lit("2018-01-01").cast("date"))
    ts = [r.timestamp for r in out.orderBy("seq").collect()]
    assert ts[0] == datetime.datetime(2018, 1, 1, 23, 59, 58)
    assert ts[2] == datetime.datetime(2018, 1, 2, 0, 0, 1)
    assert ts[4] == datetime.datetime(2018, 1, 3, 1, 0, 0)


# --- seen-set --------------------------------------------------------------


def _hashed(spark, keys, parts=4):
    df = spark.createDataFrame([(k,) for k in keys], "url_key string")
    return add_partition_and_hashes(df, "url_key", parts)


def test_bloom_no_false_negatives(spark):
    seen_keys = [f"host{i % 3}.com/p{i}" for i in range(500)]
    summaries = build_summaries(
        _hashed(spark, seen_keys), 4, "bloom", capacity_per_part=1000
    )
    probed = probe_summaries(_hashed(spark, seen_keys), summaries)
    assert probed.where(~F.col("maybe_seen")).count() == 0  # no false negatives


def test_cuckoo_no_false_negatives(spark):
    seen_keys = [f"host{i % 3}.com/p{i}" for i in range(500)]
    summaries = build_summaries(
        _hashed(spark, seen_keys), 4, "cuckoo", capacity_per_part=1000
    )
    probed = probe_summaries(_hashed(spark, seen_keys), summaries)
    assert probed.where(~F.col("maybe_seen")).count() == 0


def test_filter_new_urls_exactness(spark):
    """The summary is a gate only: output == exact anti-join, always."""
    seen_keys = [f"s.com/{i}" for i in range(300)]
    cand_keys = [f"s.com/{i}" for i in range(250, 400)]  # 50 dup, 100 new
    seen = spark.createDataFrame([(k,) for k in seen_keys], "url_key string")
    cand = spark.createDataFrame([(k,) for k in cand_keys], "url_key string")
    summaries = build_summaries(
        add_partition_and_hashes(seen, "url_key", 4), 4, capacity_per_part=1000
    )
    out = {r.url_key for r in filter_new_urls(cand, seen, summaries, "url_key", 4).collect()}
    assert out == {f"s.com/{i}" for i in range(300, 400)}


def test_cuckoo_overflow_degrades_to_all_maybe(spark):
    """An over-capacity cuckoo filter would drop fingerprints (probe false
    negatives → seen URLs re-enqueued, corrupting visit order). build/merge
    must detect overflow and degrade the partition to bits=None = all-maybe,
    so the exact confirm anti-join runs for every candidate."""
    # capacity 500 pow2-rounds to 256 buckets × 4 slots = 1024/part; 10000 keys
    # over 4 parts ⇒ ~2500/part, well past the 0.84 safe load ⇒ must degrade
    seen_keys = [f"host{i % 3}.com/p{i}" for i in range(10000)]
    summaries = build_summaries(
        _hashed(spark, seen_keys), 4, "cuckoo", capacity_per_part=500
    )
    assert summaries.where(F.col("bits").isNotNull()).count() == 0  # all degraded
    probed = probe_summaries(_hashed(spark, seen_keys), summaries)
    assert probed.where(~F.col("maybe_seen")).count() == 0  # no false negatives


def test_cuckoo_overflow_filter_new_urls_exact(spark):
    """End-to-end: with a deliberately undersized cuckoo summary, the output
    of filter_new_urls still equals the exact anti-join."""
    seen_keys = [f"s.com/{i}" for i in range(10000)]
    cand_keys = [f"s.com/{i}" for i in range(9900, 10100)]  # 100 dup, 100 new
    seen = spark.createDataFrame([(k,) for k in seen_keys], "url_key string")
    cand = spark.createDataFrame([(k,) for k in cand_keys], "url_key string")
    summaries = build_summaries(
        add_partition_and_hashes(seen, "url_key", 4), 4, "cuckoo",
        capacity_per_part=500,
    )
    out = {r.url_key for r in filter_new_urls(cand, seen, summaries, "url_key", 4).collect()}
    assert out == {f"s.com/{i}" for i in range(10000, 10100)}


def test_cuckoo_merge_overflow_stays_degraded(spark):
    """Merging more keys into a healthy filter past capacity degrades it, and
    a further merge keeps it degraded (missing fingerprints are unknowable)."""
    s1 = build_summaries(
        _hashed(spark, [f"a.com/{i}" for i in range(300)]), 4, "cuckoo",
        capacity_per_part=500,
    )
    assert s1.where(F.col("bits").isNull()).count() == 0  # healthy at 300/500
    s2 = merge_summaries(
        s1, _hashed(spark, [f"b.com/{i}" for i in range(9000)]), 4, "cuckoo",
        capacity_per_part=500,
    )
    assert s2.where(F.col("bits").isNotNull()).count() == 0
    s3 = merge_summaries(
        s2, _hashed(spark, [f"c.com/{i}" for i in range(10)]), 4, "cuckoo",
        capacity_per_part=500,
    )
    assert s3.where(F.col("bits").isNotNull()).count() == 0
    probed = probe_summaries(_hashed(spark, [f"a.com/{i}" for i in range(300)]), s3)
    assert probed.where(~F.col("maybe_seen")).count() == 0


def test_merge_summaries_incremental(spark):
    first = _hashed(spark, [f"a.com/{i}" for i in range(100)])
    second = _hashed(spark, [f"b.com/{i}" for i in range(100)])
    s1 = build_summaries(first, 4, capacity_per_part=1000)
    s2 = merge_summaries(s1, second, 4, capacity_per_part=1000)
    probed = probe_summaries(
        _hashed(spark, [f"a.com/{i}" for i in range(100)] + [f"b.com/{i}" for i in range(100)]),
        s2,
    )
    assert probed.where(~F.col("maybe_seen")).count() == 0
    assert s2.agg(F.sum("num_items")).collect()[0][0] == 200


def test_pagerank_matches_reference_iteration(spark):
    """Spark power iteration == a driver-side numpy reference on a small
    graph (same simplified dangling-mass formula)."""
    import numpy as np

    from httrack2warc_spark.operators.pagerank import pagerank

    edges = [(0, 1), (1, 2), (2, 0), (2, 1), (3, 2), (0, 2)]
    nodes = sorted({v for e in edges for v in e})
    n, d = len(nodes), 0.85
    deg = {u: sum(1 for a, _ in edges if a == u) for u in nodes}
    r = np.full(n, 1.0 / n)
    for _ in range(10):
        nxt = np.full(n, (1 - d) / n)
        for u, v in edges:
            nxt[v] += d * r[u] / deg[u]
        r = nxt

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {x.vertex: x.rank for x in pagerank(df, iterations=10).collect()}
    for i, node in enumerate(nodes):
        assert abs(got[node] - r[i]) < 1e-12, (node, got[node], r[i])
    # a hub with more in-links outranks a leaf
    assert got[2] > got[3]


def test_codegen_probe_matches_pandas_probe(spark):
    """probe_summaries_cols (whole-stage-codegen bit tests over broadcast
    filter words) must agree row-for-row with the pandas cogroup probe, and
    never produce a false negative for truly-seen keys."""
    from pyspark.sql import functions as F

    from httrack2warc_spark.operators.seen import (
        add_partition_and_hashes,
        build_summaries,
        probe_summaries,
        probe_summaries_cols,
        summaries_to_words,
    )

    n = 50_000
    cand = spark.range(0, n, 1, 8).select(
        F.concat(F.lit("h"), (F.col("id") % 13).cast("string"),
                 F.lit(".com/p/"), F.col("id").cast("string")).alias("url_key"))
    seen = spark.range(0, n, 3, 8).select(
        F.concat(F.lit("h"), (F.col("id") % 13).cast("string"),
                 F.lit(".com/p/"), F.col("id").cast("string")).alias("url_key"))
    summ = build_summaries(
        add_partition_and_hashes(seen, "url_key", 8), 8,
        capacity_per_part=20_000, fpp=0.01).persist()
    hashed = add_partition_and_hashes(cand, "url_key", 8)
    py = probe_summaries(hashed, summ, 0.01).select("url_key", "maybe_seen")
    jvm = probe_summaries_cols(
        hashed, summaries_to_words(summ), 20_000, 0.01
    ).select("url_key", F.col("maybe_seen").alias("m2"))
    assert py.join(jvm, "url_key").where(F.col("maybe_seen") != F.col("m2")).count() == 0
    assert jvm.join(seen, "url_key").where(~F.col("m2")).count() == 0
    summ.unpersist()


def test_filter_new_urls_codegen_path_equals_cogroup(spark):
    """filter_new_urls with capacity (single-pass JVM shape: map-side probe,
    window dedup, flag left-joins) returns the exact same row set as the
    pandas cogroup path, tail included."""
    from pyspark.sql import functions as F

    from httrack2warc_spark.operators.seen import (
        add_partition_and_hashes, build_summaries, filter_new_urls)

    n = 30_000
    cand = spark.range(0, n, 1, 8).select(
        F.concat(F.lit("h"), (F.col("id") % 7).cast("string"),
                 F.lit(".com/p/"), (F.col("id") % (n // 2)).cast("string")
                 ).alias("url_key"),       # duplicates: exercises dedup
        (F.col("id") % (n // 2)).alias("parent_seq"),
        (F.col("id") % 5).cast("int").alias("link_idx"),
        F.concat(F.lit("http://x/"), F.col("id").cast("string")).alias("url"))
    seen = spark.range(0, n, 4, 8).select(
        F.concat(F.lit("h"), (F.col("id") % 7).cast("string"),
                 F.lit(".com/p/"), (F.col("id") % (n // 2)).cast("string")
                 ).alias("url_key")).distinct()
    tail = seen.limit(500)
    summ = build_summaries(
        add_partition_and_hashes(seen, "url_key", 8), 8,
        capacity_per_part=20_000).localCheckpoint(eager=True)
    outs = {}
    for cap in (None, 20_000):
        nf = filter_new_urls(
            cand, [seen], summ, "url_key", 8, 0.01, unsummarized=tail,
            dedup_order=["parent_seq", "link_idx", "url"], capacity=cap)
        outs[cap] = sorted(
            (r["url_key"], r["parent_seq"], r["link_idx"], r["url"])
            for r in nf.collect())
    assert outs[None] == outs[20_000] and len(outs[None]) > 0


# ---------------------------------------------------------------------------
# Water-filling capacity allocation
# ---------------------------------------------------------------------------


def _ref_waterfill(demands, capacity):
    """Pure-python max-min reference: sort by (demand, key); satisfiable
    prefix gets full demand, the rest split evenly with the remainder to
    the earliest ranks."""
    items = sorted(demands.items(), key=lambda kv: (kv[1], kv[0]))
    H, C = len(items), max(capacity, 0)
    cum = 0
    k, cum_k = 0, 0
    for i, (key, dem) in enumerate(items, 1):
        cum += dem
        if cum + (H - i) * dem <= C:
            k, cum_k = i, cum
    out = {}
    if k >= H:
        return {key: dem for key, dem in items}
    theta, rem = divmod(C - cum_k, H - k)
    for i, (key, dem) in enumerate(items, 1):
        if i <= k:
            out[key] = dem
        elif i - k <= rem:
            out[key] = theta + 1
        else:
            out[key] = theta
    return out


def test_waterfill_matches_reference_and_invariants(spark):
    import random

    from httrack2warc_spark.operators.topk import waterfill_budgets

    rng = random.Random(42)
    for trial in range(6):
        H = rng.choice([1, 3, 17, 40])
        demands = {f"h{i:03d}": rng.choice([0, 1, 2, 5, 50, 1000])
                   for i in range(H)}
        total = sum(demands.values())
        for C in (0, 1, total // 3, total, total + 10):
            df = spark.createDataFrame(
                list(demands.items()), "key string, demand long"
            )
            for mode in ("single", "ranged"):
                got = {
                    r.key: r.alloc
                    for r in waterfill_budgets(
                        df, "key", "demand", C, mode=mode, num_partitions=4
                    ).collect()
                }
                want = _ref_waterfill(demands, C)
                assert got == want, (trial, C, mode)
                assert sum(got.values()) == min(C, total)
                assert all(got[k] <= demands[k] for k in demands)


def test_waterfill_hot_host_cannot_starve_tail(spark):
    from httrack2warc_spark.operators.topk import waterfill_budgets

    demands = [("mega", 10_000)] + [(f"h{i}", 10) for i in range(9)]
    df = spark.createDataFrame(demands, "key string, demand long")
    got = {r.key: r.alloc for r in
           waterfill_budgets(df, "key", "demand", 190).collect()}
    # all nine tail hosts fully served; the mega host absorbs the rest
    assert all(got[f"h{i}"] == 10 for i in range(9))
    assert got["mega"] == 100


def test_change_rate_estimates_hand_computed(spark):
    import datetime
    import math

    from httrack2warc_spark.operators.windows import change_rate_estimates

    t0 = datetime.datetime(2024, 1, 1)
    day = datetime.timedelta(days=1)
    rows = []
    # page A: 5 visits daily, states a b b a a -> n=4, X=2
    for i, s in enumerate("abbaa"):
        rows.append(("A", t0 + i * day, s))
    # page B: 3 visits 12h apart, never changes -> n=2, X=0
    for i in range(3):
        rows.append(("B", t0 + i * day / 2, "same"))
    # page C: single visit -> excluded
    rows.append(("C", t0, "x"))
    # page D: two visits same timestamp -> span 0 -> excluded
    rows.append(("D", t0, "x"))
    rows.append(("D", t0, "y"))
    df = spark.createDataFrame(rows, "key string, ts timestamp, state string")
    got = {r.key: r.asDict() for r in
           change_rate_estimates(df, "key", "ts", "state").collect()}
    assert set(got) == {"A", "B"}

    def expect(n, x, span_us):
        lnneg = math.floor(-math.log((n - x + 0.5) / (n + 0.5)) * 1e6)
        avg = span_us // n
        return lnneg, (lnneg * 86_400_000_000) // avg

    ln_a, lam_a = expect(4, 2, 4 * 86_400_000_000)
    assert (got["A"]["n_intervals"], got["A"]["n_changes"]) == (4, 2)
    assert (got["A"]["lnneg_micro"], got["A"]["lambda_day_micro"]) == (ln_a, lam_a)
    ln_b, lam_b = expect(2, 0, 86_400_000_000)
    assert (got["B"]["lnneg_micro"], got["B"]["lambda_day_micro"]) == (ln_b, lam_b)
    # a page that changes every visit outranks one that never does
    assert got["A"]["lambda_day_micro"] > got["B"]["lambda_day_micro"]
