"""Sketch family: HyperLogLog cardinality, Misra-Gries heavy hitters with
exact confirm, A-ES weighted sampling, and the bucketized interval join.

Each test pins the property that makes the operator trustworthy at scale:
HLL inside its published error bound and invariant to partitioning; MG
candidates a guaranteed superset so the confirmed result is EXACT;
weighted-sample membership a pure function of (id, seed, weight) — the
same rows from any partitioning; interval join identical to the naive
cross-join-with-range-filter it replaces, without the cross join.
"""

import math

import pytest
from pyspark.sql import functions as F

from httrack2warc_spark.operators.interval import interval_join
from httrack2warc_spark.operators.sketches import (
    frequent_items,
    hll_cardinality,
    weighted_sample,
)

SF = "/root/testdata/sf0.01"


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def test_hll_error_bound_large_range(spark):
    # 50k distinct ids: firmly in the harmonic-mean regime for p=12
    n = 50_000
    df = spark.range(n).select((F.col("id") * 7919 + 13).alias("v"))
    est = hll_cardinality(df, "v", p=12).collect()[0]["est_distinct"]
    rse = 1.04 / math.sqrt(1 << 12)  # published HLL relative standard error
    assert abs(est - n) / n < 4 * rse, est


def test_hll_small_range_linear_counting(spark):
    df = spark.range(300).select(F.col("id").alias("v"))
    est = hll_cardinality(df, "v", p=12).collect()[0]["est_distinct"]
    assert abs(est - 300) <= 15, est  # linear counting: ~2% here (hash
    # collisions in 4096 buckets at 300 keys make a handful invisible)


def test_hll_partitioning_invariant_and_duplicate_blind(spark):
    base = spark.range(2_000).select((F.col("id") % 500).alias("v"))
    a = hll_cardinality(base.repartition(1), "v", p=12).collect()[0][0]
    b = hll_cardinality(base.repartition(13), "v", p=12).collect()[0][0]
    assert a == b  # registers are max-merged: order/placement free
    solo = (
        hll_cardinality(
            spark.range(500).select(F.col("id").alias("v")), "v", p=12
        ).collect()[0][0]
    )
    assert a == solo  # 4x duplication moves nothing


def test_hll_grouped(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = hll_cardinality(ev, "user_id", ["event_type"], p=12)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("x")
    )
    joined = {
        r["event_type"]: (r["est_distinct"], r["x"])
        for r in out.join(exact, "event_type").collect()
    }
    assert len(joined) == 5
    for est, x in joined.values():
        assert abs(est - x) / x < 0.10, joined


def test_hll_rejects_bad_p(spark):
    df = spark.range(10).select(F.col("id").alias("v"))
    with pytest.raises(ValueError):
        hll_cardinality(df, "v", p=10)


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------


def test_frequent_items_exact_on_skewed_stream(spark):
    # 3 heavy items above n/k, a long tail below it, spread over partitions
    # so no single partition sees a heavy item concentrated
    rows = (
        [("hot_a",)] * 900 + [("hot_b",)] * 700 + [("hot_c",)] * 450
        + [(f"tail_{i}",) for i in range(2000)]
    )
    df = spark.createDataFrame(rows, ["v"]).repartition(11)
    n, k = len(rows), 16
    got = {
        (r["v"], r["cnt"]) for r in frequent_items(df, "v", k=k).collect()
    }
    exact = {
        (r["v"], r["cnt"])
        for r in df.groupBy("v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > n / k)
        .collect()
    }
    assert got == exact
    assert {"hot_a", "hot_b", "hot_c"} == {v for v, _ in got}


def test_frequent_items_counts_are_exact_not_mg_estimates(spark):
    rows = [("x",)] * 120 + [(f"t{i}",) for i in range(120)]
    df = spark.createDataFrame(rows, ["v"]).repartition(5)
    out = frequent_items(df, "v", k=4, total=len(rows)).collect()
    assert [(r["v"], r["cnt"]) for r in out] == [("x", 120)]


def test_frequent_items_empty_result(spark):
    # perfectly uniform: nothing exceeds n/k
    df = spark.range(100).select(F.col("id").cast("string").alias("v"))
    assert frequent_items(df, "v", k=10).count() == 0


def test_frequent_items_nulls_count_in_n_but_never_surface(spark):
    # the int-keyed MG pass (r06) must keep the original null contract:
    # null values are never candidates/output (value_counts dropna
    # semantics), but null rows still count toward n — so a value must
    # clear n/k INCLUDING the null rows to surface.
    rows = [("x",)] * 30 + [(None,)] * 60 + [(f"t{i}",) for i in range(10)]
    df = spark.createDataFrame(rows, "v string").repartition(4)
    # n = 100, k = 4 -> threshold 25; "x" (30) passes, nulls never surface
    out = {(r["v"], r["cnt"]) for r in frequent_items(df, "v", k=4).collect()}
    assert out == {("x", 30)}
    # k = 2 -> threshold 50; "x" fails BECAUSE nulls inflate n
    assert frequent_items(df, "v", k=2).count() == 0


# ---------------------------------------------------------------------------
# Weighted sampling (A-ES)
# ---------------------------------------------------------------------------


def test_weighted_sample_partitioning_invariant(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = sorted(
        r["doc_id"]
        for r in weighted_sample(
            docs.repartition(1), "doc_id", "n_chars", 25, seed=7
        ).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in weighted_sample(
            docs.repartition(17), "doc_id", "n_chars", 25, seed=7
        ).collect()
    )
    assert a == b and len(a) == 25


def test_weighted_sample_weight_bias(spark):
    # one item carries ~all the mass: it must be drawn at every seed
    rows = [(0, 10_000_000)] + [(i, 1) for i in range(1, 400)]
    df = spark.createDataFrame(rows, ["id", "w"])
    for seed in range(8):
        got = {
            r["id"] for r in weighted_sample(df, "id", "w", 5, seed=seed).collect()
        }
        assert 0 in got, (seed, got)


def test_weighted_sample_excludes_nonpositive_and_seed_varies(spark):
    rows = [(1, 0), (2, -5)] + [(i, 10) for i in range(3, 60)]
    df = spark.createDataFrame(rows, ["id", "w"])
    s1 = {r["id"] for r in weighted_sample(df, "id", "w", 10, seed=1).collect()}
    s2 = {r["id"] for r in weighted_sample(df, "id", "w", 10, seed=2).collect()}
    assert 1 not in s1 and 2 not in s1
    assert s1 != s2  # different seeds draw different samples


# ---------------------------------------------------------------------------
# Interval join
# ---------------------------------------------------------------------------


def _naive(points, intervals, ts, s, e):
    return points.crossJoin(intervals).where(
        (F.col(ts) >= F.col(s)) & (F.col(ts) <= F.col(e))
    )


def test_interval_join_matches_naive(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    iv = (
        ev.where((F.col("event_type") == "error") & (F.col("value") > 190))
        .select(
            F.col("event_id").alias("iid"),
            F.col("ts").alias("s"),
            (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("e"),
        )
    )
    pts = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "ts"
    )
    fast = {
        (r["pid"], r["iid"])
        for r in interval_join(pts, iv, "ts", "s", "e", 7200)
        .select("pid", "iid")
        .collect()
    }
    slow = {
        (r["pid"], r["iid"])
        for r in _naive(pts, iv, "ts", "s", "e").select("pid", "iid").collect()
    }
    assert fast == slow and len(fast) > 0


def test_interval_join_long_intervals_span_many_buckets(spark):
    # interval length >> bucket width: explode covers every bucket, matches
    # stay exact and unduplicated
    iv = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "2024-01-03 00:00:00")],
        ["iid", "s", "e"],
    ).select(
        "iid",
        F.col("s").cast("timestamp").alias("s"),
        F.col("e").cast("timestamp").alias("e"),
    )
    pts = spark.createDataFrame(
        [
            (1, "2023-12-31 23:59:59"),
            (2, "2024-01-01 00:00:00"),
            (3, "2024-01-02 12:00:00"),
            (4, "2024-01-03 00:00:00"),
            (5, "2024-01-03 00:00:01"),
        ],
        ["pid", "ts"],
    ).select("pid", F.col("ts").cast("timestamp").alias("ts"))
    got = sorted(
        r["pid"]
        for r in interval_join(pts, iv, "ts", "s", "e", 3600).collect()
    )
    assert got == [2, 3, 4]  # inclusive ends, no pre/post, no dupes


def test_interval_join_plan_has_no_nested_loop(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    iv = ev.limit(10).select(
        F.col("event_id").alias("iid"),
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("e"),
    )
    plan = (
        interval_join(ev.select("event_id", "ts"), iv, "ts", "s", "e")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# Binned quantile sketch
# ---------------------------------------------------------------------------


def test_binned_quantiles_accuracy_and_invariance(spark):
    from httrack2warc_spark.operators.sketches import binned_quantiles

    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = {
        (r["event_type"], r["prob"]): r["quantile"]
        for r in binned_quantiles(
            ev, "value", [0.5, 0.95], ["event_type"], bins=256
        ).collect()
    }
    exact = {
        (r["event_type"], p): r[f"q{int(p*100)}"]
        for r in ev.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("q50"),
            F.expr("percentile(value, 0.95)").alias("q95"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .collect()
        for p in (0.5, 0.95)
    }
    widths = {
        r["event_type"]: (r["hi"] - r["lo"]) / 256.0
        for r in ev.groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for (etype, p), q in out.items():
        assert abs(q - exact[(etype, p)]) <= 2.5 * widths[etype], (etype, p)
    # partitioning invariance: bin counts merge by sum
    out2 = {
        (r["event_type"], r["prob"]): r["quantile"]
        for r in binned_quantiles(
            ev.repartition(13), "value", [0.5, 0.95], ["event_type"], bins=256
        ).collect()
    }
    assert out == out2


def test_binned_quantiles_global_and_degenerate(spark):
    from httrack2warc_spark.operators.sketches import binned_quantiles

    # global (no groups)
    df = spark.range(1000).select((F.col("id") % 100).cast("double").alias("v"))
    got = {
        r["prob"]: r["quantile"]
        for r in binned_quantiles(df, "v", [0.5, 0.99], bins=256).collect()
    }
    assert abs(got[0.5] - 49.5) < 1.0 and abs(got[0.99] - 99.0) < 1.5
    # degenerate group: min == max
    const = spark.range(50).select(F.lit(7.25).alias("v"))
    one = binned_quantiles(const, "v", [0.5, 0.95], bins=256).collect()
    assert all(r["quantile"] == 7.25 for r in one)


def test_grouped_weighted_sample(spark):
    from httrack2warc_spark.operators.sketches import grouped_weighted_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = grouped_weighted_sample(docs, "doc_id", "n_chars", "source", k=5,
                                  seed=11)
    per = out.groupBy("source").count().collect()
    n_sources = docs.select("source").distinct().count()
    assert len(per) == n_sources and all(r["count"] <= 5 for r in per)
    # partitioning invariance
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in grouped_weighted_sample(
            docs.repartition(17), "doc_id", "n_chars", "source", k=5, seed=11
        ).collect()
    )
    assert a == b


# ---------------------------------------------------------------------------
# Triangle counting
# ---------------------------------------------------------------------------


def test_triangle_counts_hand_graphs(spark):
    from httrack2warc_spark.operators.graph import triangle_counts

    # K4: 4 triangles, every node in exactly 3
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    got = {
        (r["node"], r["n_triangles"])
        for r in triangle_counts(
            spark.createDataFrame(k4, ["a", "b"])
        ).collect()
    }
    assert got == {(n, 3) for n in range(4)}
    # triangle + pendant edge: node 3 in no triangle, absent from output
    g = [(0, 1), (1, 2), (0, 2), (2, 3)]
    got2 = {
        (r["node"], r["n_triangles"])
        for r in triangle_counts(
            spark.createDataFrame(g, ["a", "b"])
        ).collect()
    }
    assert got2 == {(0, 1), (1, 1), (2, 1)}


def test_triangle_counts_normalizes_dupes_loops_direction(spark):
    from httrack2warc_spark.operators.graph import triangle_counts

    # same triangle given with duplicates, reversed edges and a self loop
    g = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 2), (2, 2)]
    got = {
        (r["node"], r["n_triangles"])
        for r in triangle_counts(
            spark.createDataFrame(g, ["a", "b"])
        ).collect()
    }
    assert got == {(0, 1), (1, 1), (2, 1)}


def test_triangle_counts_hub_graph(spark):
    from httrack2warc_spark.operators.graph import triangle_counts
    from pyspark.sql import functions as F

    # star hub 0 connected to 1..40, plus rim edges (i, i+1) for odd i:
    # 20 disjoint triangles (0, 2k+1, 2k+2), hub in all 20
    edges = [(0, i) for i in range(1, 41)] + [
        (i, i + 1) for i in range(1, 40, 2)
    ]
    out = {
        (r["node"], r["n_triangles"])
        for r in triangle_counts(
            spark.createDataFrame(edges, ["a", "b"])
        ).collect()
    }
    assert (0, 20) in out
    assert sum(c for _, c in out) == 60  # 20 triangles x 3 nodes


def test_hll_xxhash64_family(spark):
    # production hash family: same register/estimate machinery, integer
    # hashing — error bound and partitioning invariance must hold like md5
    n = 50_000
    df = spark.range(n).select((F.col("id") * 7919 + 13).alias("v"))
    est = hll_cardinality(df, "v", p=12, hash_family="xxhash64").collect()[0][
        "est_distinct"
    ]
    rse = 1.04 / math.sqrt(1 << 12)
    assert abs(est - n) / n < 4 * rse, est
    base = spark.range(2_000).select((F.col("id") % 500).alias("v"))
    a = hll_cardinality(
        base.repartition(1), "v", p=12, hash_family="xxhash64"
    ).collect()[0][0]
    b = hll_cardinality(
        base.repartition(13), "v", p=12, hash_family="xxhash64"
    ).collect()[0][0]
    assert a == b
    with pytest.raises(ValueError):
        hll_cardinality(df, "v", p=12, hash_family="sha1")


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def test_count_min_one_sided_and_exact_when_wide(spark):
    """CM estimates are NEVER below the truth; with width >> #items the
    probability of any collision is tiny and the estimate is exact."""
    from collections import Counter

    from httrack2warc_spark.operators.sketches import (
        count_min_estimate,
        count_min_table,
    )

    items = (["apple"] * 50 + ["banana"] * 20 + ["cherry"] * 5
             + [f"tail{i}" for i in range(30)])
    truth = Counter(items)
    df = spark.createDataFrame([(x,) for x in items], "item string")
    probes = spark.createDataFrame([(x,) for x in sorted(truth)], "item string")

    sk = count_min_table(df, "item", depth=4, width=4096)
    est = {
        r.item: r.cm_est
        for r in count_min_estimate(sk, probes, "item", depth=4, width=4096).collect()
    }
    assert est == dict(truth)  # wide sketch: exact

    narrow = count_min_table(df, "item", depth=3, width=8)
    est_n = {
        r.item: r.cm_est
        for r in count_min_estimate(narrow, probes, "item", depth=3, width=8).collect()
    }
    assert all(est_n[k] >= v for k, v in truth.items())  # one-sided always


def test_count_min_merges_by_counter_sum(spark):
    """sketch(A ∪ B) == per-(row,bucket) sum of sketch(A) + sketch(B) —
    the property that lets the table build per crawl round / stream batch."""
    from httrack2warc_spark.operators.sketches import count_min_table

    a = spark.createDataFrame([(f"w{i % 7}",) for i in range(40)], "item string")
    b = spark.createDataFrame([(f"w{i % 11}",) for i in range(60)], "item string")
    both = a.union(b)

    merged = (
        count_min_table(a, "item", depth=4, width=64)
        .union(count_min_table(b, "item", depth=4, width=64))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = count_min_table(both, "item", depth=4, width=64)
    key = lambda rows: sorted((r.row, r.bucket, r.cnt) for r in rows)
    assert key(merged.collect()) == key(direct.collect())


def test_count_min_never_inserted_probe_and_weights(spark):
    from httrack2warc_spark.operators.sketches import (
        count_min_estimate,
        count_min_table,
    )

    df = spark.createDataFrame([("x", 3), ("x", 4), ("y", 10)],
                               "item string, w int")
    sk = count_min_table(df, "item", depth=4, width=4096, weight_col="w")
    probes = spark.createDataFrame([("x",), ("y",), ("ghost",)], "item string")
    est = {
        r.item: r.cm_est
        for r in count_min_estimate(sk, probes, "item", depth=4, width=4096).collect()
    }
    assert est == {"x": 7, "y": 10, "ghost": 0}
