"""Driver contract for the spark-graft builder (PySpark target).

``entry``      — flagship: run the frontier scheduler on the reference-shaped
                 fixture web graph and return the visit-ordered crawl_log.
``queries``    — operator kernels from SURVEY.md §2 + the training-data ops,
                 each runnable on the driver's TPC-H-ish parquet tables.
``oracle_sql`` — DuckDB-equivalent SQL per query (column names aligned).
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _tp(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Table + scale-adaptive scan parallelization (operators.dedup
    ``_parallel_head``): single-row-group parquet inputs scan as ONE task,
    so queries whose first stage is a CPU-dense per-row text pipeline use
    this loader to spread the head across the session's task width (no-op
    when the input already has enough splits — the cluster-scale case)."""
    from httrack2warc_spark.operators.dedup import _parallel_head

    return _parallel_head(_t(spark, sf_dir, name))


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Run the golden fixture crawl end-to-end (scheduler + Bloom seen-set +
    politeness + robots) and return the visit-ordered crawl_log."""
    from httrack2warc_spark.frontier import CrawlConfig, FrontierScheduler, fixture_web
    from httrack2warc_spark.sinks.tables import TableCatalog

    web = fixture_web(spark)
    cat = TableCatalog(spark, tempfile.mkdtemp(prefix="spark_graft_entry_"))
    sched = FrontierScheduler(
        spark, cat, web,
        CrawlConfig(num_parts=8, max_rounds=10, summary_capacity_per_part=10_000),
    )
    return sched.run(seeds=["http://test.example.org/"])


# ---------------------------------------------------------------------------
# queries  (each: (spark, sf_dir) -> DataFrame)
# ---------------------------------------------------------------------------


def q1_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_top_orders(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def q5_local_volume(spark, sf_dir):
    """Multi-way dim join: revenue per nation (broadcast dims, one fact shuffle)."""
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(c), (o["o_custkey"] == c["c_custkey"]) & (c["c_nationkey"] == s["s_nationkey"]))
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


def q18_large_orders(spark, sf_dir):
    """Group-by-having + semi-join shape (TPC-H Q18-ish)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 250)
    )
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select("c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


def asof_join_q(spark, sf_dir):
    """Backward as-of join (pandas merge_asof / DuckDB ASOF JOIN — an
    operator Spark's DataFrame API lacks): every click event gains the
    latest view by the same user at or before it. Implemented as the
    union-window form (ONE exchange + sort; a range join would explode
    |L|x|R| per key). Views are pre-deduped per (user, ts) keeping the
    max event id so the match is a total function — DuckDB's ASOF picks
    an arbitrary row among equal timestamps otherwise."""
    from httrack2warc_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", F.col("ts").alias("view_ts"))
        .agg(
            F.max("event_id").alias("view_id"),
            F.max_by("value", "event_id").alias("view_value"),
        )
    )
    out = asof_join(
        clicks, views, "user_id", "ts", "view_ts", ["view_id", "view_value"]
    )
    return out.select(
        "event_id", "user_id", "ts", "view_ts", "view_id", "view_value"
    ).orderBy("event_id")


def event_transitions_q(spark, sf_dir):
    """First-order transition matrix over per-user event sequences (lead
    window): counts and row-normalized probabilities for every
    event_type → next event_type edge; the probability is an
    exact-integer quotient so round(·, 6) is engine-stable."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("next_type", F.lead("event_type").over(w))
        .where(F.col("next_type").isNotNull())
    )
    counts = pairs.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w_row = Window.partitionBy("event_type")
    return (
        counts.withColumn("row_total", F.sum("n").over(w_row))
        .select(
            "event_type", "next_type", "n",
            F.round(
                F.col("n").cast("double") / F.col("row_total").cast("double"),
                6,
            ).alias("p"),
        )
        .orderBy("event_type", "next_type")
    )


def daily_anomalies_q(spark, sf_dir):
    """Z-score outlier days per event type, cross-engine-deterministic:
    stddev_samp over doubles is partition-order-sensitive, so instead the
    variance is assembled from EXACT decimal components (Σx and Σx² per
    day, then per type across days) and only the final mean/var/sqrt/z
    arithmetic runs in double — identical inputs, identical IEEE ops,
    identical z in both engines."""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.col("ts").cast("date").cast("string").alias("day"),
            F.col("value").cast("decimal(18,2)").alias("v"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("v").alias("daily_sum"))
        .select(
            "event_type", "day", F.col("daily_sum").cast("double").alias("x")
        )
    )
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(28,2)")).cast("double").alias("sx"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,4)"))
        .cast("double")
        .alias("sx2"),
    )
    j = daily.join(F.broadcast(stats), "event_type")
    mean = F.col("sx") / F.col("n")
    var = F.col("sx2") / F.col("n") - mean * mean
    z = (F.col("x") - mean) / F.sqrt(var)
    return (
        j.withColumn("z", F.round(z, 6))
        .where(F.abs("z") > 1.5)
        .select(
            "event_type", "day",
            F.round("x", 2).alias("daily_total"), "z",
        )
        .orderBy("event_type", "day")
    )


def cohort_retention_q(spark, sf_dir):
    """Cohort retention matrix: users grouped by first-seen day, activity
    counted per whole-week offset — two aggregations and a broadcast-able
    first-seen join, all exact integers."""
    ev = _t(spark, sf_dir, "events")
    acts = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    first = acts.groupBy("user_id").agg(F.min("d").alias("cohort_d"))
    return (
        acts.join(first, "user_id")
        .select(
            F.col("cohort_d").cast("string").alias("cohort_day"),
            F.floor(F.datediff("d", "cohort_d") / 7).cast("int").alias(
                "week_offset"
            ),
            "user_id",
        )
        .groupBy("cohort_day", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_day", "week_offset")
    )


def funnel_conversion_q(spark, sf_dir):
    """Funnel analysis (click → purchase within 1 hour, same user): the
    forward as-of join attaches each click's NEXT purchase, a horizon
    filter keeps conversions inside the window, and per-day counts +
    conversion rate come out — the product-analytics pattern expressed as
    one as-of pass instead of a range join.  The rate is a quotient of two
    exact integers, so round(·, 6) is engine-stable."""
    from httrack2warc_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("p_ts"))
        .agg(F.max("event_id").alias("p_id"))
    )
    matched = asof_join(
        clicks, purchases, "user_id", "ts", "p_ts", ["p_id"],
        direction="forward",
    )
    conv = F.col("p_ts").isNotNull() & (
        F.col("p_ts") <= F.col("ts") + F.expr("INTERVAL 1 HOUR")
    )
    return (
        matched.select(
            F.col("ts").cast("date").cast("string").alias("day"),
            conv.cast("int").alias("converted"),
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.sum("converted").alias("n_converted"),
            F.round(
                F.sum("converted").cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("conv_rate"),
        )
        .orderBy("day")
    )


def triangle_count_q(spark, sf_dir):
    """Distributed triangle counting (degree-ordered node-iterator): per-node
    triangle participation over a 2000-node circulant graph C(1,2) plus an
    arithmetic chord per node — closed-form, so the oracle rebuilds the
    identical edge set and counts triangles with a plain three-way SQL
    join.  The degree orientation bounds wedge fan-out at O(sqrt(m)) per
    node — the property that keeps a celebrity node from emitting d²
    wedges at web scale."""
    from httrack2warc_spark.operators.graph import triangle_counts

    n = 2000
    r = spark.range(n)
    raw = (
        r.select(F.col("id").alias("x"), ((F.col("id") + 1) % n).alias("y"))
        .unionAll(
            r.select(F.col("id").alias("x"), ((F.col("id") + 2) % n).alias("y"))
        )
        .unionAll(
            r.select(
                F.col("id").alias("x"), ((F.col("id") * 7 + 3) % n).alias("y")
            )
        )
    )
    return triangle_counts(raw, "x", "y").orderBy("node")


def asof_forward_q(spark, sf_dir):
    """Forward as-of join: every click gains the EARLIEST view by the same
    user at or after it — the same union-window operator traversed in
    descending timestamp order (one exchange, no range join); DuckDB's
    native ASOF with `<=` is the oracle."""
    from httrack2warc_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", F.col("ts").alias("view_ts"))
        .agg(
            F.max("event_id").alias("view_id"),
            F.max_by("value", "event_id").alias("view_value"),
        )
    )
    out = asof_join(
        clicks, views, "user_id", "ts", "view_ts",
        ["view_id", "view_value"], direction="forward",
    )
    return out.select(
        "event_id", "user_id", "ts", "view_ts", "view_id", "view_value"
    ).orderBy("event_id")


def q21_sole_blame_q(spark, sf_dir):
    """Correlated EXISTS / NOT-EXISTS shape (TPC-H Q21-ish, adapted to the
    available columns): suppliers who were the SOLE late shipper (shipdate
    > orderdate + 90 days) on a finished multi-supplier order. Exercises the
    non-equi semi-join (exists another supplier on the order) and non-equi
    anti-join (no OTHER supplier was also late) operator class — equi key +
    inequality residual, the classic decorrelated-subquery plan."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    fo = li.join(o.select("o_orderkey", "o_orderdate"),
                 li["l_orderkey"] == o["o_orderkey"])
    allp = fo.select("l_orderkey", "l_suppkey").distinct()
    late = (
        fo.where(F.col("l_shipdate") > F.col("o_orderdate")
                 + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey").distinct()
    )
    c = late.alias("c")
    blame = (
        c.join(
            allp.alias("p"),
            on=[F.col("c.l_orderkey") == F.col("p.l_orderkey"),
                F.col("c.l_suppkey") != F.col("p.l_suppkey")],
            how="left_semi",
        )
        .join(
            late.alias("l2"),
            on=[F.col("c.l_orderkey") == F.col("l2.l_orderkey"),
                F.col("c.l_suppkey") != F.col("l2.l_suppkey")],
            how="left_anti",
        )
    )
    return (
        blame.join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy("s_suppkey", "s_name", "n_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_suppkey")
        .limit(10)
    )


def median_value_q(spark, sf_dir):
    """Exact percentile aggregation (median + p90 per event type) — Spark's
    exact `percentile` (linear interpolation) == DuckDB quantile_cont."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
            F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type")
    )


def pivot_counts_q(spark, sf_dir):
    """Pivot (event_type → columns) per user bucket — the conditional-
    aggregation expansion; stays one pass over the fact."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("bucket", (F.col("user_id") % 10).cast("int"))
        .groupBy("bucket")
        .pivot("event_type", ["click", "view", "purchase"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .orderBy("bucket")
    )


def set_ops_q(spark, sf_dir):
    """§2.8 set operations: INTERSECT and EXCEPT of customer key sets
    (big spenders vs BUILDING segment), unioned with a tag column."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    big = o.where(F.col("o_totalprice") > 200000).select(
        F.col("o_custkey").alias("c_custkey")
    ).distinct()
    building = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    both = big.intersect(building).withColumn("tag", F.lit("both"))
    only_big = big.exceptAll(building).withColumn("tag", F.lit("only_big"))
    return both.unionByName(only_big).orderBy("tag", "c_custkey")


def pagerank_q(spark, sf_dir):
    """PageRank power iteration (3 rounds, d=0.85) over a deterministic
    synthetic link graph derived from events — link-based frontier priority,
    value-checked against an unrolled DuckDB iteration."""
    from httrack2warc_spark.operators.pagerank import pagerank

    ev = _t(spark, sf_dir, "events")
    edges = ev.select(
        (F.col("user_id") % 100).alias("src"),
        ((F.col("user_id") * 3 + F.col("event_id")) % 100).alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    out = pagerank(edges, iterations=3, damping=0.85)
    return out.select(
        "vertex", F.round("rank", 6).alias("rank")
    ).orderBy("vertex")


def rollup_revenue_q(spark, sf_dir):
    """ROLLUP grouping-sets aggregation (region → nation → total): the
    partial-aggregate expansion shape (Expand operator) — one pass over the
    fact emits all grouping-set rows; no per-level re-scan."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .rollup("r_name", "n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "revenue",
            "n_orders",
        )
        .orderBy("region", "nation")
    )


def running_total_q(spark, sf_dir):
    """Cumulative per-customer spend in order-date order (window frame)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    ).orderBy("o_custkey", "o_orderkey")


def ordinal_fifo_join_q(spark, sf_dir):
    """J1 kernel on events: k-th 'click' of a user pairs with the k-th
    'purchase' of the same user (FIFO queue semantics)."""
    from httrack2warc_spark.operators.ordinal_join import ordinal_fifo_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_order"),
        F.col("event_id").alias("purchase_id"),
    )
    out = ordinal_fifo_join(clicks, purchases, "user_id", "click_id", "purchase_order")
    return out.select("user_id", "click_id", "purchase_id").orderBy("user_id", "click_id")


def first_occurrence_q(spark, sf_dir):
    """A1/A2 kernel: first event per user in (ts, event_id) order."""
    from httrack2warc_spark.operators.dedup import first_occurrence

    ev = _t(spark, sf_dir, "events")
    return first_occurrence(ev, "user_id", ["ts"], tiebreak=["event_id"]).select(
        "user_id", "event_id", "event_type"
    )


def politeness_topk_q(spark, sf_dir):
    """O3 kernel: top-3 orders per customer by (totalprice desc, orderkey)."""
    from httrack2warc_spark.operators.topk import per_key_topk

    o = _t(spark, sf_dir, "orders")
    return per_key_topk(
        o, "o_custkey", [F.col("o_totalprice").desc(), F.col("o_orderkey")], 3
    ).select("o_custkey", "o_orderkey", "o_totalprice")


def salted_topk_q(spark, sf_dir):
    """O4 kernel: identical result via the skew-safe two-phase plan."""
    from httrack2warc_spark.operators.topk import salted_per_key_topk

    o = _t(spark, sf_dir, "orders")
    return salted_per_key_topk(
        o,
        "o_custkey",
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        3,
        salt_buckets=8,
        salt_on="o_orderkey",
    ).select("o_custkey", "o_orderkey", "o_totalprice")


def date_wraparound_q(spark, sf_dir):
    """P6 kernel: time-of-day stream in event_id order; backwards time ⇒ +1 day."""
    from httrack2warc_spark.operators.windows import date_wraparound

    ev = _t(spark, sf_dir, "events").select(
        "event_id", F.date_format("ts", "HH:mm:ss").alias("time")
    )
    out = date_wraparound(
        ev, "time", "event_id", F.lit("2024-01-01").cast("date"), "derived_ts"
    )
    return out.select("event_id", "derived_ts")


def anti_join_unseen_q(spark, sf_dir):
    """J6 kernel: customers with no orders (exact discovery anti-join)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 150000)
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select(
        "c_custkey", "c_name"
    )


def bloom_gated_antijoin_q(spark, sf_dir):
    """J6 + Bloom gate: same rows as the exact anti-join, via the partitioned
    summary pre-filter (proves false positives never drop rows)."""
    from httrack2warc_spark.operators.seen import (
        add_partition_and_hashes,
        build_summaries,
        filter_new_urls,
    )

    ev = _t(spark, sf_dir, "events")
    seen = (
        ev.where((F.col("event_type") == "purchase") & (F.col("value") > 180))
        .select(F.col("user_id").cast("string").alias("url_key"))
        .distinct()
    )
    cand = ev.select(F.col("user_id").cast("string").alias("url_key")).distinct()
    summaries = build_summaries(
        add_partition_and_hashes(seen, "url_key", 8), 8, capacity_per_part=100_000
    )
    out = filter_new_urls(cand, seen, summaries, "url_key", 8)
    return out.select(F.col("url_key").cast("long").alias("user_id")).orderBy("user_id")


def exact_dedup_q(spark, sf_dir):
    """Exact content dedup on documents.text — first doc_id wins."""
    from httrack2warc_spark.operators.dedup import exact_dedup

    docs = _t(spark, sf_dir, "documents")
    return exact_dedup(docs, ["text"], "doc_id").select("doc_id", "n_chars")


def sessionize_q(spark, sf_dir):
    """Gap-based sessionization (30-min) per user over events — the batch
    formulation of the streaming session-window operator."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    newsess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = ev.withColumn(
        "session_no",
        F.sum(newsess).over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        sess.groupBy("user_id")
        .agg(
            F.max("session_no").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )


def token_count_q(spark, sf_dir):
    from httrack2warc_spark.functions.text import token_count

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    ).orderBy("doc_id")


def quality_score_q(spark, sf_dir):
    from httrack2warc_spark.functions.text import punct_ratio, stopword_ratio

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.round(stopword_ratio(F.col("text")), 6).alias("stop_ratio"),
        F.round(punct_ratio(F.col("text")), 6).alias("punct_ratio"),
    ).orderBy("doc_id")


def quality_full_q(spark, sf_dir):
    """The composite C4/Gopher-style quality score (length band + stopword
    presence − punctuation excess), value-checked end to end."""
    from httrack2warc_spark.functions.text import quality_score

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", quality_score(F.col("text")).alias("quality")
    ).orderBy("doc_id")


def lang_id_q(spark, sf_dir):
    from httrack2warc_spark.functions.text import lang_id

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", lang_id(F.col("text")).alias("lang_guess")).orderBy(
        "doc_id"
    )


_MIME_EXTS = [".html", ".css", ".gif", ".xyz", ".xls", ".flv"]


def mime_resolution_q(spark, sf_dir):
    """P10 chain: filename derived from documents.source; mime only set for
    even doc_ids — exercises all three chain arms, including full-table
    long-tail extensions (.xls, .flv) and the octet-stream fallback (.xyz)."""
    from httrack2warc_spark.sources.mime import resolve_mime

    docs = _t(spark, sf_dir, "documents")
    df = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.lit("text/x-given")).alias("mime_in"),
        F.concat(
            F.lit("site/"),
            F.col("source"),
            F.element_at(
                F.array(*[F.lit(e) for e in _MIME_EXTS]),
                (F.col("doc_id") % len(_MIME_EXTS) + 1).cast("int"),
            ),
        ).alias("filename"),
    )
    return df.select(
        "doc_id", resolve_mime(F.col("mime_in"), F.col("filename")).alias("mime")
    ).orderBy("doc_id")


def strip_protocol_q(spark, sf_dir):
    """P4 as a pure-Column regexp (scheme-collapsed header keys)."""
    from httrack2warc_spark.functions.urls import strip_protocol_col

    docs = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("http://")).otherwise(F.lit("https://")),
        F.col("source"),
        F.lit(".example.com/doc/"),
        F.col("doc_id").cast("string"),
    )
    return docs.select(
        "doc_id", strip_protocol_col(url).alias("url_key")
    ).orderBy("doc_id")


def embedding_topk_q(spark, sf_dir):
    """Brute-force cosine top-10 for one query vector (vec_id 0)."""
    from httrack2warc_spark.operators.similarity import brute_force_topk

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    queries = emb.where(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), F.col("v")
    )
    out = brute_force_topk(emb.where(F.col("vec_id") != 0), queries, "v", "vec_id", k=10)
    return out.select(
        "vec_id", F.round("cosine_sim", 6).alias("cos_sim")
    ).orderBy(F.col("cos_sim").desc(), "vec_id")


def ngram_jaccard_q(spark, sf_dir):
    """Exact word-3-gram Jaccard pairs (threshold 0.5) over documents."""
    from httrack2warc_spark.operators.dedup import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    # hot-shingle cap engaged (no-op at fixture DF ≪ 1000, identical Jaccard;
    # guards the d² pair blowup on a degenerate common shingle at scale)
    out = ngram_jaccard_pairs(docs, "text", "doc_id", shingle_n=3, threshold=0.5,
                              max_shingle_df=1000)
    return out.select(
        "a", "b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("a", "b")


def ivf_ann_q(spark, sf_dir):
    """IVF ANN for one query vector, value-checked: full probe
    (nprobe == n_cells) makes every cell a candidate cell, so IVF equals
    brute force deterministically — the k-means refinement moves centroids
    but can't change the candidate set. Ranked on round(cosine, 6) with id
    tie-break, the same ordering key as the brute-force DuckDB oracle
    (partial-probe recall is covered by tests/test_dedup_similarity.py)."""
    from httrack2warc_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    queries = emb.where(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), F.col("v")
    )
    out = ivf_topk(
        emb.where(F.col("vec_id") != 0), queries, "v", "vec_id",
        k=10, n_cells=8, nprobe=8, kmeans_iters=2, round_digits=6,
    )
    return out.select(
        "vec_id", F.round("cosine_sim", 6).alias("cos_sim")
    ).orderBy(F.col("cos_sim").desc(), "vec_id")


def minhash_neardup_q(spark, sf_dir):
    """MinHash+LSH near-dup survivors, value-checked: candidates from LSH,
    verified with EXACT Jaccard over the distinct shingle sets (the standard
    production shape). With rows_per_band=1 × 32 bands a true pair at
    J ≥ 0.5 is missed only if the pair disagrees on all 32 minhash slots —
    P ≤ 0.5³² ≈ 2e-10, deterministic given the fixed seed — so the survivor
    set equals the all-pairs exact-Jaccard rule the DuckDB oracle computes
    (the lsh_ann exact-recall parameterization argument, verified at both
    fixture scales)."""
    from httrack2warc_spark.operators.dedup import minhash_lsh_dedup

    docs = _t(spark, sf_dir, "documents")
    out = minhash_lsh_dedup(
        docs, "text", "doc_id", num_hashes=32, shingle_n=3, bands=32,
        rows_per_band=1, threshold=0.5, max_bucket_size=1000, verify="exact",
    )
    return out.select("doc_id").orderBy("doc_id")


def simhash_neardup_q(spark, sf_dir):
    """SimHash near-dup survivors, value-checked: hamming_threshold=3 ≤
    blocks−1=3 makes the pigeonhole blocking EXACT (any pair within the
    threshold shares an identical 16-bit block — no probabilistic recall),
    and hash_family="md5" makes the per-shingle hashes reproducible in
    DuckDB, so the oracle recomputes the identical fingerprints and the
    identical survivor set."""
    from httrack2warc_spark.operators.dedup import simhash_dedup

    docs = _t(spark, sf_dir, "documents")
    out = simhash_dedup(docs, "text", "doc_id", shingle_n=3,
                        hamming_threshold=3, blocks=4, hash_family="md5")
    return out.select("doc_id").orderBy("doc_id")


def lsh_ann_q(spark, sf_dir):
    """LSH-bucketed ANN for one query, value-checked: with (bits=2,
    num_tables=32) the per-neighbor miss probability at fixture similarity
    levels is <1e-7 and deterministic given the seed, so the bucketed top-10
    equals the brute-force oracle exactly (the embedding_neardup_lsh recall
    argument; verified at both fixture scales)."""
    from httrack2warc_spark.operators.similarity import lsh_ann_topk

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    queries = emb.where(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), F.col("v")
    )
    out = lsh_ann_topk(
        emb.where(F.col("vec_id") != 0), queries, "v", "vec_id",
        k=10, bits=2, num_tables=32, round_digits=6,
    )
    return out.select(
        "vec_id", F.round("cosine_sim", 6).alias("cos_sim")
    ).orderBy(F.col("cos_sim").desc(), "vec_id")


def phash_neardup_q(spark, sf_dir):
    """Near-duplicate IMAGE detection over perceptual hashes: 48 real
    generated images (the pHash column is the actual decode→DCT kernel
    output) each get three variants with controlled fingerprint
    perturbations — v1 flips 1 bit, v2 flips 2, v3 flips 3 — and the
    pigeonhole block join (blocks=4, threshold=3: EXACT recall) must find
    precisely the within-group pairs at distances (1, 2, 3) plus the
    v1–v2 pair at distance 3. The synthetic gradient images CLUSTER in
    pHash space (many hamming-0 collisions — they share one dominant
    low-frequency ramp), unlike a photographic corpus, so the base
    fingerprint is xxhash64(image_id, phash): still a deterministic
    function of the real decode→DCT kernel output, with the cross-image
    distinctness a real corpus has. That no cross-group pair lands ≤ 3 is
    pinned by tests/test_dedup_similarity.py over this exact fixture, so
    the oracle is the construction's pair arithmetic (the exact-recall
    parameterization pattern used by minhash/lsh_ann)."""
    from httrack2warc_spark.frontier.synth import generate_images
    from httrack2warc_spark.operators.dedup import hamming_neardup_pairs

    base = generate_images(spark, 48, w=16, h=16).select(
        "image_id", F.xxhash64("image_id", "phash").alias("phash")
    )
    masks = [(1, 1 << 5), (2, (1 << 17) | (1 << 37)),
             (3, (1 << 11) | (1 << 29) | (1 << 53))]
    variants = [
        base.select(
            F.concat("image_id", F.lit(f"-v{m}")).alias("image_id"),
            F.col("phash").bitwiseXOR(F.lit(mask).cast("long")).alias("phash"),
        )
        for m, mask in masks
    ]
    fps = base
    for v in variants:
        fps = fps.unionByName(v)
    pairs = hamming_neardup_pairs(
        fps, "phash", "image_id", hamming_threshold=3, blocks=4
    ).dropDuplicates(["a", "b"])
    return pairs.select("a", "b", "hamming").orderBy("a", "b")


def image_invariant_q(spark, sf_dir):
    """Per-row image invariant over a deterministic generated table (rows-only:
    binary payloads aren't SQL-comparable)."""
    from httrack2warc_spark.frontier.synth import generate_images
    from httrack2warc_spark.functions.images import with_decode_check

    imgs = generate_images(spark, 64, w=16, h=16)
    out = with_decode_check(imgs)
    return out.where(
        F.col("decoded_ok") & F.col("caption_ok") & F.col("phash_ok")
    ).select("image_id", "fmt").orderBy("image_id")


def image_resize_q(spark, sf_dir):
    """Multimodal resize over the deterministic image table (rows-only:
    binary payloads). Asserts shape by re-decoding inside the plan."""
    from httrack2warc_spark.frontier.synth import generate_images
    from httrack2warc_spark.functions.images import resize_images

    imgs = generate_images(spark, 64, w=16, h=16)
    out = resize_images(imgs, 8, 8)
    return out.where(F.col("resized_ok")).select(
        "image_id", "w", "h", "fmt"
    ).orderBy("image_id")


def image_features_q(spark, sf_dir):
    """Image feature extraction VALUE-CHECKED: the generator emits expected
    feature columns computed by an independent numpy formulation (bincount
    histogram, E[x²]−E[x]² std, flat channel means — synth.py
    generate_images) at generation time; the query runs the real decode →
    mapInPandas feature kernels and compares. Every match flag must be true
    for all 64 rows — a constant table the DuckDB oracle states exactly, so
    codec round-trip + Arrow plumbing + kernel math are all on the hash."""
    from httrack2warc_spark.frontier.synth import generate_images
    from httrack2warc_spark.functions.images import image_features

    imgs = generate_images(spark, 64, w=16, h=16, with_expected=True)
    out = image_features(imgs.select("image_id", "bytes", "fmt"))
    exp = imgs.select("image_id", "fmt", "exp_mean_r", "exp_mean_g",
                      "exp_mean_b", "exp_std_lum", "exp_hist", "exp_phash")
    tol = 1e-9
    joined = out.join(F.broadcast(exp), "image_id")
    hist_ok = F.aggregate(
        F.zip_with(
            "lum_hist", "exp_hist",
            lambda a, b: (F.abs(a - b) < tol).cast("int"),
        ),
        F.lit(0), lambda acc, v: acc + v,
    ) == F.size("lum_hist")
    return joined.select(
        "image_id", "fmt", "decoded",
        ((F.abs(F.col("mean_r") - F.col("exp_mean_r")) < tol)
         & (F.abs(F.col("mean_g") - F.col("exp_mean_g")) < tol)
         & (F.abs(F.col("mean_b") - F.col("exp_mean_b")) < tol)).alias("mean_ok"),
        (F.abs(F.col("std_lum") - F.col("exp_std_lum")) < 1e-6).alias("std_ok"),
        hist_ok.alias("hist_ok"),
        (F.col("phash") == F.col("exp_phash")).alias("phash_ok"),
    ).orderBy("image_id")


def frame_sample_q(spark, sf_dir):
    """Video frame sampling VALUE-CHECKED: expected per-frame pHashes are
    computed at table-build time straight from the generative pixels
    (phash64 ∘ synth_pixels — never touching the container codec or the
    distributed fan-out); the query decodes the container in mapInPandas and
    must reproduce them for every sampled frame. The DuckDB oracle states
    the exact 16×{0,4,8} all-true table."""
    from httrack2warc_spark.functions.images import (
        frame_sample, phash64, synth_pixels, synth_video)

    vids = spark.createDataFrame(
        [(f"vid-{i}", synth_video(f"vid-{i}", 16, 16, 12)) for i in range(16)],
        "video_id string, bytes binary",
    )
    expected = spark.createDataFrame(
        [(f"vid-{i}", f, phash64(synth_pixels(f"vid-{i}#f{f}", 16, 16)))
         for i in range(16) for f in (0, 4, 8)],
        "video_id string, frame_idx int, exp_phash long",
    )
    out = frame_sample(vids, every_k=4)
    return out.join(F.broadcast(expected), ["video_id", "frame_idx"]).select(
        "video_id", "frame_idx",
        (F.col("phash") == F.col("exp_phash")).alias("phash_ok"),
    ).orderBy("video_id", "frame_idx")


def warc_roundtrip_q(spark, sf_dir):
    """Sink→source round trip, value-checked: serialize documents as WARC
    resource records, write rotated .warc.gz files (distributed prefix-sum
    rotation), read them back with the WARC source; (url, type, body byte
    length) must survive the trip — the DuckDB oracle states what the
    re-read records must be without ever touching a WARC."""
    from httrack2warc_spark.sinks.warc import write_warc_files
    from httrack2warc_spark.sources.warcread import read_warc

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    recs = docs.select(
        F.col("doc_id").alias("seq"),
        F.lit(0).alias("sub"),
        F.lit("resource").alias("record_type"),
        F.concat(F.lit("http://docs.example.org/"), F.col("doc_id").cast("string"))
        .alias("url"),
        F.lit("2020-05-04T03:02:01Z").alias("warc_date"),
        F.concat(
            F.lit("WARC/1.0\r\nWARC-Type: resource\r\nWARC-Target-URI: "
                  "http://docs.example.org/"),
            F.col("doc_id").cast("string"),
            F.lit("\r\nWARC-Date: 2020-05-04T03:02:01Z\r\nContent-Type: "
                  "text/plain\r\nContent-Length: "),
            F.length(F.encode("text", "UTF-8")).cast("string"),
            F.lit("\r\n\r\n"),
        ).alias("warc_header"),
        F.encode("text", "UTF-8").alias("body"),
        F.lit("text/plain").alias("content_type"),
        F.lit(None).cast("string").alias("digest"),
        F.lit(200).alias("status"),
    )
    out_dir = tempfile.mkdtemp(prefix="warc_roundtrip_")
    write_warc_files(recs, out_dir, name_pattern="rt-%d.warc.gz",
                     rotation_size=64 * 1024).unpersist()
    back = read_warc(spark, f"{out_dir}/rt-*.warc.gz")
    return back.select(
        "url", "record_type", F.length("body").alias("body_len")
    ).orderBy("url")


def warc_payload_dedup_q(spark, sf_dir):
    """Archive payload dedup value-checked: any response whose payload
    digest matches an earlier capture becomes a WARC ``revisit`` record
    (``sinks/warc.py::warc_records(payload_dedup=True)`` — window first-
    occurrence on the sha1-base32 payload digest ordered by seq; reference
    stores every payload, this is the beyond-reference archive-storage op).
    Payloads are synthesized into 97 deterministic duplicate classes from
    doc_id, so the DuckDB twin restates the digest-window semantics as a
    min-over-class window without computing any digest — identical bytes ⇒
    identical digest makes the two formulations equal by construction."""
    from httrack2warc_spark.sinks.warc import warc_records
    from httrack2warc_spark.sources.htslogs import CrawlMeta

    group = (F.col("doc_id") * 7919) % 97
    crawl = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("seq"),
        F.lit("2020-05-04 03:02:01").cast("timestamp").alias("timestamp"),
        F.concat(F.lit("http://docs.example.org/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.lit("text/html").alias("mime"),
        F.lit(None).cast("string").alias("request_header"),
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n")
        .alias("response_header"),
        F.lit(None).cast("string").alias("referrer"),
        F.concat(F.lit("docs.example.org/"),
                 F.col("doc_id").cast("string")).alias("filename"),
        F.lit(200).alias("status"),
        F.lit(0).cast("long").alias("size"),
        F.encode(F.concat(F.lit("payload-"), group.cast("string")), "UTF-8")
        .alias("payload"),
        F.lit(True).alias("has_cache_data"),
        F.lit("t").alias("source"),
    )
    recs = warc_records(crawl, CrawlMeta(), strict=False, payload_dedup=True)
    return recs.where(F.col("sub") == 0).select(
        F.col("seq").cast("long").alias("seq"),
        ((F.col("seq") * 7919) % 97).cast("long").alias("payload_group"),
        "record_type",
    ).orderBy("seq")


def _wave_mono(wav_bytes):
    """Independent WAV decode for oracle expecteds: the stdlib ``wave``
    parser, not this repo's RIFF codec — a bug in either decoder breaks the
    match flags instead of cancelling out."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(wav_bytes)) as w:
        sr = w.getframerate()
        pcm = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    return sr, pcm.astype(np.float64)


def audio_features_q(spark, sf_dir):
    """Audio feature extraction VALUE-CHECKED: expected values are computed
    at build time from an INDEPENDENT decode path (stdlib wave, not the
    repo's RIFF parser) with the documented formulas; the query's real
    codec + Arrow DSP kernels must match them, and the quarantined
    undecodable row must come back decoded=false. The DuckDB oracle states
    the exact 33-row table of flags."""
    import math

    import numpy as np

    from httrack2warc_spark.functions.audio import (
        audio_features, audio_fingerprint64, synth_audio)

    rows = [(f"au-{i}", synth_audio(f"au-{i}", 8000, 8000), "wav")
            for i in range(32)]
    exp_rows = []
    for aid, data, _fmt in rows:
        sr, mono = _wave_mono(data)
        x = mono / 32768.0
        rms = math.sqrt(float(np.square(x).sum()) / len(x))
        # the documented ZCR contract counts every sign-state change
        # including through exact zero (a -1→0→+1 run is two crossings),
        # so the expected value uses the same sign-delta definition — the
        # independence is in the decode path, not the formula
        zcr = float(np.mean(np.abs(np.diff(np.sign(x))) > 0))
        exp_rows.append((aid, round(20 * math.log10(max(rms, 1e-9)), 6),
                         round(zcr, 6), audio_fingerprint64(mono)))
    rows.append(("au-bad", b"\xffopaque", "mp3"))
    df = spark.createDataFrame(rows, "audio_id string, bytes binary, fmt string")
    exp = spark.createDataFrame(
        exp_rows,
        "audio_id string, exp_rms_db double, exp_zcr double, exp_fp long",
    )
    out = audio_features(df).join(F.broadcast(exp), "audio_id", "left")
    return out.select(
        "audio_id", "decoded",
        F.when(F.col("decoded"),
               F.abs(F.col("rms_db") - F.col("exp_rms_db")) < 1e-5)
        .otherwise(F.lit(False)).alias("rms_ok"),
        F.when(F.col("decoded"),
               F.abs(F.col("zero_cross_rate") - F.col("exp_zcr")) < 1e-5)
        .otherwise(F.lit(False)).alias("zcr_ok"),
        F.when(F.col("decoded"), F.col("fingerprint") == F.col("exp_fp"))
        .otherwise(F.lit(False)).alias("fp_ok"),
    ).orderBy("audio_id")


def audio_windows_q(spark, sf_dir):
    """Audio window fan-out VALUE-CHECKED: per-window expecteds computed at
    build time from the independent stdlib-wave decode (see
    audio_features_q); one row per sampled window, every flag true — the
    DuckDB oracle states the exact 16×{0,2,4,6} table."""
    import math

    import numpy as np

    from httrack2warc_spark.functions.audio import (
        audio_fingerprint64, synth_audio, window_sample)

    rows = [(f"au-{i}", synth_audio(f"au-{i}", 8000, 16000), "wav")
            for i in range(16)]
    exp_rows = []
    for aid, data, _fmt in rows:
        _sr, mono = _wave_mono(data)
        win = 2000  # 250 ms @ 8 kHz
        for idx in range(0, len(mono) // win, 2):
            seg = mono[idx * win:(idx + 1) * win]
            rms = math.sqrt(float(np.square(seg / 32768.0).sum()) / len(seg))
            exp_rows.append((aid, idx,
                             round(20 * math.log10(max(rms, 1e-9)), 6),
                             audio_fingerprint64(seg)))
    df = spark.createDataFrame(rows, "audio_id string, bytes binary, fmt string")
    exp = spark.createDataFrame(
        exp_rows,
        "audio_id string, window_idx int, exp_rms_db double, exp_fp long",
    )
    out = window_sample(df, window_ms=250, every_k=2)
    return out.join(F.broadcast(exp), ["audio_id", "window_idx"]).select(
        "audio_id", "window_idx",
        (F.abs(F.col("rms_db") - F.col("exp_rms_db")) < 1e-5).alias("rms_ok"),
        (F.col("fingerprint") == F.col("exp_fp")).alias("fp_ok"),
    ).orderBy("audio_id", "window_idx")


def embedding_neardup_q(spark, sf_dir):
    """Embedding-cosine near-dup pairs via the LSH-bucketed scale path
    (equi-join on (table, bucket) keys — no cartesian/inequality join in the
    plan), exact-cosine re-rank, value-checked against DuckDB
    list_cosine_similarity. Recall vs the brute-force oracle is exact at
    fixture scale with these (bits, num_tables, seed) — deterministic, see
    operators.dedup.embedding_neardup_lsh."""
    from httrack2warc_spark.operators.dedup import embedding_neardup_lsh

    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id"), F.col("embedding").cast("array<double>").alias("v")
    )
    # operator pre-filter slightly below the cut, final filter on the rounded
    # value — identical boundary semantics to the oracle's rounded filter
    out = embedding_neardup_lsh(
        emb, "v", "vec_id", threshold=0.45 - 1e-6, bits=2, num_tables=32
    )
    return out.select(
        "a", "b", F.round("cosine", 6).alias("cosine")
    ).where(F.col("cosine") >= 0.45).orderBy("a", "b")


def clean_corpus_q(spark, sf_dir):
    """Composite training-data cleaning pipeline, value-checked end to end:
    language gate (en) → composite quality threshold → exact content dedup
    (first doc_id wins) → stats projection. The single-query form of the
    filter→score→dedup chain a corpus build runs before near-dup/LSH."""
    from httrack2warc_spark.functions.text import lang_id, quality_score, token_count
    from httrack2warc_spark.operators.dedup import exact_dedup

    docs = _tp(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "text",
        lang_id(F.col("text")).alias("lang"),
        quality_score(F.col("text")).alias("quality"),
        token_count(F.col("text")).alias("n_tokens"),
    )
    # dedup BEFORE the gate (bit-identical: lang/quality are pure functions
    # of text — the dedup group key — so per-group winners and the filter
    # commute). The old filter-first order let Catalyst push the predicate
    # below the repartition, SUBSTITUTING the full lang_id+quality trees
    # into a single-task FilterExec (no subexpression elimination there —
    # the build-notes FilterExec trap; measured 8.4 s of the query's 11.4 s
    # at sf1.0). Above the dedup Window the predicate references
    # materialized attributes and cannot be pushed/substituted.
    deduped = exact_dedup(scored, ["text"], "doc_id")
    kept = deduped.where((F.col("lang") == "en") & (F.col("quality") >= 0.5))
    return kept.select(
        "doc_id", F.round("quality", 6).alias("quality"), "n_tokens"
    ).orderBy("doc_id")


def dedup_components_q(spark, sf_dir):
    """Connected components over the embedding near-dup pair graph
    (transitive dedup groups), value-checked against a DuckDB recursive CTE.
    Exercises the iterative min-label propagation operator end to end."""
    from httrack2warc_spark.operators.dedup import (
        connected_components,
        embedding_neardup_lsh,
    )

    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id"), F.col("embedding").cast("array<double>").alias("v")
    )
    pairs = embedding_neardup_lsh(
        emb, "v", "vec_id", threshold=0.45 - 1e-6, bits=2, num_tables=32
    ).where(F.round("cosine", 6) >= 0.45)
    return connected_components(pairs).orderBy("node")


def header_surgery_q(spark, sf_dir):
    """P8+P9 value-checked: Transfer-Encoding strip (leading-whitespace-
    tolerant, case-insensitive, multiline) + Content-Length rewrite to the
    actual body length, over constructed per-doc headers covering all arms."""
    from httrack2warc_spark.sinks.warc import fix_content_length, remove_transfer_encoding

    docs = _t(spark, sf_dir, "documents")
    te = F.element_at(
        F.array(
            F.lit("Transfer-Encoding: chunked\r\n"),
            F.lit("  transfer-ENCODING\t: gzip, pizza\r\n"),
            F.lit(""),
        ),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    hdr = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Length: 99999\r\n"),
        te,
        F.lit("Content-Type: text/html\r\n\r\n"),
    )
    out = fix_content_length(
        remove_transfer_encoding(hdr), F.col("n_chars").cast("long")
    )
    return docs.select("doc_id", out.alias("header")).orderBy("doc_id")


def percent_codecs_q(spark, sf_dir):
    """P2+P3 value-checked: HTTrack mode-0 percent-encode (controls, space,
    quote, non-ASCII bytes, backslash→slash) and the tolerant char-wise
    decode (invalid/truncated escapes pass through literally)."""
    from httrack2warc_spark.functions.urls import percent_decode_udf, percent_encode_udf

    docs = _t(spark, sf_dir, "documents")
    enc_in = F.concat(
        F.lit('a "b\tc é\\'), F.col("source"), F.lit(" "),
        F.col("doc_id").cast("string"),
    )
    dec_in = F.concat(
        F.lit("p%41q%20r~s%7E."), F.col("source"), F.lit("%zz%4")
    )
    return docs.select(
        "doc_id",
        percent_encode_udf(enc_in).alias("encoded"),
        percent_decode_udf(dec_in).alias("decoded"),
    ).orderBy("doc_id")


def cdx_format_q(spark, sf_dir):
    """P17 value-checked: 11-field CDX line formatting from positions —
    timestamp squashing, digest '-' fallback, request-record (sub=1)
    exclusion, global byte sort."""
    from httrack2warc_spark.sinks.warc import cdx_lines_from_positions

    docs = _t(spark, sf_dir, "documents")
    positions = docs.select(
        F.col("doc_id").alias("seq"),
        (F.col("doc_id") % 3).cast("int").alias("sub"),  # 1 ⇒ excluded
        F.concat(F.lit("http://ex.org/"), F.col("source"), F.lit("/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.concat(F.lit("2020-05-04T03:02:0"),
                 (F.col("doc_id") % 10).cast("string"),
                 F.lit("Z")).alias("warc_date"),
        F.lit("text/html").alias("content_type"),
        (F.lit(200) + (F.col("doc_id") % 2) * 101).cast("int").alias("status"),
        F.when(F.col("doc_id") % 5 != 0,
               F.concat(F.lit("SHA"), F.col("doc_id").cast("string"))).alias("digest"),
        (F.col("doc_id") * 100).cast("long").alias("offset"),
        F.col("n_chars").cast("long").alias("length"),
        F.lit("crawl-0.warc.gz").alias("filename"),
    )
    return cdx_lines_from_positions(positions)


def url_host_q(spark, sf_dir):
    """Politeness partition key (url_host_col): scheme/userinfo/port stripped,
    lowercased — the JVM-side kernel the scheduler keys every per-host
    operation on."""
    from httrack2warc_spark.functions.urls import url_host_col

    docs = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.element_at(F.array(F.lit("http://"), F.lit("https://")),
                     (F.col("doc_id") % 2 + 1).cast("int")),
        F.element_at(F.array(F.lit(""), F.lit("user@"), F.lit("u:p@")),
                     (F.col("doc_id") % 3 + 1).cast("int")),
        F.lit("WWW."), F.col("source"), F.lit(".Example.COM"),
        F.element_at(F.array(F.lit(""), F.lit(":8080")),
                     (F.col("doc_id") % 2 + 1).cast("int")),
        F.lit("/p/"), F.col("doc_id").cast("string"),
    )
    return docs.select(
        "doc_id", url_host_col(url).alias("host")
    ).orderBy("doc_id")


def frontier_crawl_q(spark, sf_dir):
    """The scheduler itself — robots fetching ON — VALUE-CHECKED. generate_web's
    graph is closed-form (k-ary host trees + cross-host edges over node ids),
    so a DuckDB generate_series rebuilds it exactly and a recursive CTE
    replays the crawl: seeding ONLY host0 makes host1 enter via the
    cross-host edge mid-crawl, which exercises the synthetic-robots flow the
    rows-only check never pinned — a new host's robots.txt row clones its
    trigger row's ordering tuple and takes the seq slot immediately before
    it (frontier/scheduler.py:567-594, reference Httrack2Warc robots-first
    fixture convention). Budget 1000 is non-binding (40 pages/host), so the
    visit log is a pure function of the graph + the (priority, parent_seq,
    link_idx, __robots, url) total order."""
    from httrack2warc_spark.frontier import CrawlConfig, FrontierScheduler, generate_web
    from httrack2warc_spark.sinks.tables import TableCatalog

    web, seeds = generate_web(spark, n_hosts=2, pages_per_host=40, out_degree=3,
                              cross_host_every=1)
    cat = TableCatalog(spark, tempfile.mkdtemp(prefix="spark_graft_q_"))
    sched = FrontierScheduler(
        spark, cat, web,
        CrawlConfig(num_parts=8, max_rounds=8, default_host_budget=1000,
                    summary_capacity_per_part=10_000, summary_every=2),
    )
    log = sched.run(seeds=seeds[:1])
    return log.select(
        "seq", "url", "host", F.col("depth").cast("int").alias("depth"),
        F.col("round").cast("int").alias("round"), "is_robots",
    ).orderBy("seq")


def frontier_bfs_q(spark, sf_dir, batch_levels=1):
    """The scheduler VALUE-CHECKED: crawl a deterministic link graph derived
    from the documents table (doc i → (7i+j+1) mod n, j<4; single host,
    unlimited budget, max_rounds=4) and return (url, round). Under those
    settings the scheduler's round number IS the BFS hop distance from the
    seed — a pure function of the graph that a DuckDB recursive CTE
    recomputes exactly (reachability + level assignment + first-discovery
    dedup). The politeness-rich variant stays rows-only (frontier_crawl);
    this pins the iterative core to a hard oracle.

    With batch_levels>1 (frontier_bfs_batched) the same crawl runs through
    the fused level-block path — all four BFS levels land as ONE foreground
    materialization — against the SAME recursive-CTE oracle, value-checking
    the block's relative-seq fixup + in-block re-discovery dedup."""
    import tempfile

    from httrack2warc_spark.frontier import CrawlConfig, FrontierScheduler
    from httrack2warc_spark.frontier.synth import SyntheticWeb
    from httrack2warc_spark.sinks.tables import TableCatalog

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    base = "http://corpus.example.org/doc/"
    key = F.concat(F.lit("corpus.example.org/doc/"), F.col("doc_id"))
    pages = docs.select(
        key.alias("url_key"), F.lit(200).alias("status"),
        F.lit("text/html").alias("mime"), F.lit(0).cast("long").alias("size"),
        F.lit("f").alias("localfile"), F.lit(None).cast("string").alias("image_id"),
    )
    links = docs.select(
        key.alias("src_key"),
        F.explode(F.array(*[
            F.struct(
                F.lit(j).alias("link_idx"),
                F.concat(F.lit(base),
                         ((F.col("doc_id") * 7 + j + 1) % n)).alias("dst_url"),
            )
            for j in range(4)
        ])).alias("l"),
    ).select("src_key", "l.link_idx", "l.dst_url")
    web = SyntheticWeb(pages, links, broadcast_pages=True)
    cat = TableCatalog(spark, tempfile.mkdtemp(prefix="spark_graft_bfs_"))
    sched = FrontierScheduler(
        spark, cat, web,
        CrawlConfig(num_parts=8, max_rounds=4, fetch_robots=False,
                    batch_levels=batch_levels),
    )
    log = sched.run(seeds=[base + "0"])
    return log.select("url", F.col("round").cast("int").alias("round")).orderBy("url")


def frontier_bfs_batched_q(spark, sf_dir):
    """frontier_bfs through the fused level-block path (batch_levels=4):
    the 4-level crawl lands in two fused blocks (the growth-aware gate
    caps the no-history first block at 2 levels), same DuckDB
    recursive-CTE oracle — value-checks the block machinery
    (scheduler.py::_run_level_block: relative-seq fixup, in-block
    re-discovery dedup, growth-capped k) end-to-end."""
    return frontier_bfs_q(spark, sf_dir, batch_levels=4)


def frontier_polite_q(spark, sf_dir):
    """The POLITENESS-RICH scheduler value-checked (the round-4 gap): two
    hosts, per-host budget 3, leftover rows queued across rounds. Under
    fetch_robots=False the whole crawl — which rows each round's per-host
    top-k picks, the global seq order, the first-discovery metadata a URL
    keeps — is a pure function of the deterministic doc graph and the
    (priority, parent_seq, link_idx, url) ordering contract
    (frontier/scheduler.py:438-483, operators/topk.py:30). The DuckDB twin
    replays it with a recursive CTE: per-round per-host row_number() ≤
    budget, first-occurrence discovery dedup, seen-set anti-join, and
    parent_seq modeled as the order-isomorphic (parent_round, in-round rank)
    composite. Returns the full visit log (seq, url, host, depth, round)."""
    import tempfile

    from httrack2warc_spark.frontier import CrawlConfig, FrontierScheduler
    from httrack2warc_spark.frontier.synth import SyntheticWeb
    from httrack2warc_spark.sinks.tables import TableCatalog

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    host = F.concat(F.lit("h"), (F.col("doc_id") % 2), F.lit(".example.org"))
    key = F.concat(host, F.lit("/doc/"), F.col("doc_id"))
    url_of = lambda node: F.concat(  # noqa: E731
        F.lit("http://h"), node % 2, F.lit(".example.org/doc/"), node
    )
    pages = docs.select(
        key.alias("url_key"), F.lit(200).alias("status"),
        F.lit("text/html").alias("mime"), F.lit(0).cast("long").alias("size"),
        F.lit("f").alias("localfile"), F.lit(None).cast("string").alias("image_id"),
    )
    links = docs.select(
        key.alias("src_key"),
        F.explode(F.array(*[
            F.struct(
                F.lit(j).alias("link_idx"),
                url_of((F.col("doc_id") * 7 + j + 1) % n).alias("dst_url"),
            )
            for j in range(4)
        ])).alias("l"),
    ).select("src_key", "l.link_idx", "l.dst_url")
    web = SyntheticWeb(pages, links, broadcast_pages=True)
    cat = TableCatalog(spark, tempfile.mkdtemp(prefix="spark_graft_pol_"))
    sched = FrontierScheduler(
        spark, cat, web,
        CrawlConfig(num_parts=8, max_rounds=6, fetch_robots=False,
                    default_host_budget=3),
    )
    log = sched.run(seeds=["http://h0.example.org/doc/0",
                           "http://h1.example.org/doc/1"])
    return log.select(
        "seq", "url", "host", F.col("depth").cast("int").alias("depth"),
        F.col("round").cast("int").alias("round"),
    ).orderBy("seq")


def doc_chunks_q(spark, sf_dir):
    """Context-window chunking (max 40 tokens, overlap 8) — the standard
    LLM pre-training chunker; exact function of the text, value-checked."""
    from httrack2warc_spark.operators.corpus import chunk_documents

    docs = _t(spark, sf_dir, "documents")
    out = chunk_documents(docs, "text", "doc_id", max_tokens=40, overlap=8)
    return out.select(
        "doc_id", F.col("chunk_idx").cast("int").alias("chunk_idx"),
        "chunk_text", F.col("n_tokens").cast("int").alias("n_tokens"),
    ).orderBy("doc_id", "chunk_idx")


def corpus_sample_q(spark, sf_dir):
    """Per-language deterministic corpus sampling (training-mix weights):
    membership = md5 draw vs the language's rate — a pure function of
    (doc_id, seed, lang) the oracle recomputes exactly."""
    from httrack2warc_spark.functions.text import lang_id
    from httrack2warc_spark.operators.corpus import stratified_sample

    docs = _t(spark, sf_dir, "documents").withColumn(
        "lang", lang_id(F.col("text"))
    )
    out = stratified_sample(
        docs, "doc_id", "lang",
        rates={"en": 0.7, "de": 0.4, "fr": 0.5, "es": 0.6},
        default_rate=0.2, seed=42,
    )
    return out.select("doc_id", "lang").orderBy("doc_id")


def tfidf_keywords_q(spark, sf_dir):
    """Top-3 characteristic terms per document by smoothed TF-IDF with a 50%
    document-frequency stop-word cap; ranked on round(score, 6) with term
    tie-break — the oracle's exact ordering key."""
    from httrack2warc_spark.operators.corpus import tfidf_topk

    docs = _t(spark, sf_dir, "documents")
    out = tfidf_topk(docs, "text", "doc_id", k=3, max_df_ratio=0.9)
    return out.select("doc_id", "term", "score").orderBy("doc_id", "term")


def decontaminate_bench_q(spark, sf_dir):
    """Benchmark decontamination (train/test-leakage scrub): the benchmark
    is the first 20 tokens of every 23rd document (a deterministic stand-in
    for an eval suite), and a document is contaminated iff it shares any
    word 4-gram with it. Returns (doc_id, n_hits = distinct benchmark
    4-grams present) for contaminated docs — organic cross-document hits
    included, so the count logic (not just the self-match) is exercised."""
    from httrack2warc_spark.functions.text import word_tokens
    from httrack2warc_spark.operators.corpus import decontaminate

    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 23 == 0).select(
        F.concat_ws(" ", F.slice(word_tokens(F.col("text")), 1, 20)).alias("text")
    )
    out = decontaminate(docs, bench, "text", "doc_id", n=4)
    return out.select("doc_id", "n_hits").orderBy("doc_id")


def paragraph_dedup_q(spark, sf_dir):
    """Paragraph-level exact dedup (MassiveText/RefinedWeb repeated-line
    scrub): each document is deterministically rebuilt as newline-separated
    paragraphs — its own text, a mod-7 newsletter line, a unique footer and a
    mod-3 copyright line — so the corpus carries heavy cross-document
    boilerplate plus whatever exact-duplicate documents the generator
    planted. First global occurrence (by doc_id, position) of a paragraph
    survives; boilerplate in more than max_df=20 distinct docs is dropped
    everywhere. Returns the rebuilt text + kept/dropped counts, so the value
    hash pins the split, the first-occurrence rule, the max_df rule and the
    order-preserving rejoin."""
    from httrack2warc_spark.operators.corpus import dedup_paragraphs

    docs = _t(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("\nsubscribe to tier "),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(" newsletter\ndoc "),
            F.col("doc_id").cast("string"),
            F.lit(" unique footer\ncopyright acme "),
            (F.col("doc_id") % 3).cast("string"),
        ).alias("text"),
    )
    out = dedup_paragraphs(aug, "text", "doc_id", sep="\n", max_df=20)
    return out.select(
        "doc_id", "deduped", "n_kept", "n_dropped"
    ).orderBy("doc_id")


def pack_sequences_q(spark, sf_dir):
    """GPT-style sequence packing: the documents' token streams (each
    terminated by <eos>) concatenate in doc_id order and cut into 128-token
    training examples; the trailing partial example is dropped. Runs the
    distributed prefix-sum path (mode='ranged' — the 10^9-row shape). The
    value hash pins the tokenization, the eos placement, the global
    ordering, the cut points and the per-example doc fan-in."""
    from httrack2warc_spark.operators.corpus import pack_sequences

    docs = _t(spark, sf_dir, "documents")
    out = pack_sequences(docs, "text", "doc_id", seq_len=128, mode="ranged")
    return out.select("example_id", "text", "n_docs").orderBy("example_id")


def pii_redact_q(spark, sf_dir):
    """PII redaction: each document is deterministically augmented with one
    synthetic email, IPv4 and phone (pure function of doc_id, recomputed by
    the oracle), then redacted category-by-category. Returns the per-category
    match counts AND the full redacted text — the value hash breaks if any
    pattern, placeholder or application order drifts."""
    from httrack2warc_spark.operators.corpus import redact_pii

    docs = _t(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com from 10."),
            (F.col("doc_id") % 256).cast("string"), F.lit(".0."),
            (F.col("doc_id") % 100).cast("string"),
            F.lit(" tel 555-867-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    out = redact_pii(aug, "text")
    return out.select(
        "doc_id",
        F.col("n_email").cast("long").alias("n_email"),
        F.col("n_ipv4").cast("long").alias("n_ipv4"),
        F.col("n_phone").cast("long").alias("n_phone"),
        "redacted",
    ).orderBy("doc_id")


def repetition_filter_q(spark, sf_dir):
    """Gopher-style repetition quality gate: fraction of tokens covered by
    the most frequent word 1/2/3-gram per document, plus the keep decision
    at the published thresholds (top-2-gram ≤ 0.20, top-3-gram ≤ 0.18)."""
    from httrack2warc_spark.operators.corpus import repetition_topgram_stats

    docs = _t(spark, sf_dir, "documents")
    out = repetition_topgram_stats(docs, "text", "doc_id", ns=(1, 2, 3))
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        "top1_frac", "top2_frac", "top3_frac",
        ((F.col("top2_frac") <= 0.20) & (F.col("top3_frac") <= 0.18)).alias("keep"),
    ).orderBy("doc_id")


def hll_distinct_q(spark, sf_dir):
    """HyperLogLog distinct-user estimate per event type (p=12, 4096
    registers): the mergeable-sketch cardinality path for 10^10-row scale,
    deterministic over the md5 hash family so the oracle recomputes the
    registers and the DECIMAL-summed harmonic mean bit-for-bit."""
    from httrack2warc_spark.operators.sketches import hll_cardinality

    ev = _t(spark, sf_dir, "events")
    return hll_cardinality(ev, "user_id", ["event_type"], p=12).orderBy(
        "event_type"
    )


def heavy_words_q(spark, sf_dir):
    """Misra-Gries heavy hitters with exact confirm: every word whose
    corpus frequency exceeds n/64, found via bounded-memory per-partition
    summaries (superset by the averaging argument) + an exact count over
    the candidate set only — the full-tail groupBy never runs."""
    from httrack2warc_spark.functions.text import word_tokens
    from httrack2warc_spark.operators.sketches import frequent_items

    docs = _t(spark, sf_dir, "documents")
    words = docs.select(F.explode(word_tokens(F.col("text"))).alias("word"))
    return frequent_items(words, "word", k=64).orderBy("word")


def weighted_sample_q(spark, sf_dir):
    """Weighted sampling without replacement (Efraimidis-Spirakis A-ES):
    25 documents drawn proportional to n_chars via the deterministic md5
    uniform — membership is a pure function of (doc_id, seed, weight) that
    the oracle's identical expression reselects."""
    from httrack2warc_spark.operators.sketches import weighted_sample

    docs = _t(spark, sf_dir, "documents")
    out = weighted_sample(docs, "doc_id", "n_chars", k=25, seed=7)
    return out.select("doc_id", "n_chars").orderBy("doc_id")


def interval_join_q(spark, sf_dir):
    """Interval-overlap join with no equi key (DuckDB range join): spike
    incidents (error events, value>190) open a 2-hour window; count and
    sum the purchase events falling inside each.  Bucketized to an equi
    join (one 8-byte shuffle key) + exact range refinement — never a
    BroadcastNestedLoop (plan-guarded)."""
    from httrack2warc_spark.operators.interval import interval_join

    ev = _t(spark, sf_dir, "events")
    incidents = ev.where(
        (F.col("event_type") == "error") & (F.col("value") > 190)
    ).select(
        F.col("event_id").alias("incident_id"),
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("e"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "ts", "value"
    )
    j = interval_join(purchases, incidents, "ts", "s", "e", 7200)
    return (
        j.groupBy("incident_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("incident_id")
    )


def image_caption_dedup_q(spark, sf_dir):
    """Joint multimodal dedup over the BASELINE.json input_hint table shape
    (image_id, bytes, w, h, fmt, caption, phash): near-duplicate IMAGES
    (pHash hamming ≤ 3 via the pigeonhole block join) and exact-duplicate
    CAPTIONS (the mirror/repost case: different pixels, same text) fuse
    into one duplicate graph, and large-star/small-star connected
    components label every member with its canonical representative.

    Fixture: the 48-image pHash corpus of phash_neardup (bit-flip variants
    v1/v2/v3 carry ALTERED captions so the hamming channel alone must
    connect them) plus a caption-clone '-c' for every 5th image whose
    fingerprint is fresh (xxhash64 re-salt: hamming-far from everything,
    pinned by tests) — so the caption channel alone must connect it.
    Caption edges are emitted as a STAR (min-id per caption → others),
    never all-pairs: a caption duplicated d times costs d−1 edges, not
    d(d−1)/2 — the 100 TB-safe shape for boilerplate captions. The oracle
    is the construction's component arithmetic (phash_neardup precedent)."""
    from httrack2warc_spark.frontier.synth import generate_images
    from httrack2warc_spark.operators.dedup import (
        connected_components,
        hamming_neardup_pairs,
    )

    base = generate_images(spark, 48, w=16, h=16).select(
        "image_id",
        F.xxhash64("image_id", "phash").alias("phash"),
        "caption",
    )
    masks = [(1, 1 << 5), (2, (1 << 17) | (1 << 37)),
             (3, (1 << 11) | (1 << 29) | (1 << 53))]
    variants = [
        base.select(
            F.concat("image_id", F.lit(f"-v{m}")).alias("image_id"),
            F.col("phash").bitwiseXOR(F.lit(mask).cast("long")).alias("phash"),
            F.concat("caption", F.lit(f" (variant {m})")).alias("caption"),
        )
        for m, mask in masks
    ]
    clones = base.where(
        F.regexp_extract("image_id", r"img-(\d+)", 1).cast("long") % 5 == 0
    ).select(
        F.concat("image_id", F.lit("-c")).alias("image_id"),
        F.xxhash64(F.concat("image_id", F.lit("-c")), "phash").alias("phash"),
        "caption",  # EXACT caption of the base: the only connecting channel
    )
    fps = base
    for v in variants:
        fps = fps.unionByName(v)
    fps = fps.unionByName(clones)
    # four consumers below (the hamming SELF-join counts twice) and a
    # union's branches re-evaluate their common subtree once per branch —
    # unmaterialized, the image-generation mapInPandas runs ~10x (measured
    # 18.5 s vs 2.9 s for the single-channel phash query). 202 tiny rows:
    # materialize once.
    fps = fps.localCheckpoint(eager=True)

    ham = hamming_neardup_pairs(
        fps, "phash", "image_id", hamming_threshold=3, blocks=4
    ).dropDuplicates(["a", "b"]).select("a", "b")
    cmin = fps.groupBy("caption").agg(F.min("image_id").alias("a"))
    cap = (
        fps.join(cmin, "caption")
        .where(F.col("image_id") != F.col("a"))
        .select("a", F.col("image_id").alias("b"))
    )
    comp = connected_components(ham.unionByName(cap), "a", "b")
    return comp.select("node", "component").orderBy("node")


def vector_norm_stats_q(spark, sf_dir):
    """Higher-order array functions as a graded surface: per-label L2-norm
    sums over the embedding column via F.aggregate (JVM lambda fold — the
    DuckDB twin is list_sum(list_transform(...))).  Each element is cast
    to double BEFORE squaring in both engines and the fold is the same
    left-to-right array order, so per-row norms agree bit-for-bit; the
    cross-row sum rides DECIMAL.  Division (avg) is deliberately avoided —
    sum + count carry the same information without a cross-engine
    quotient-rounding hazard."""
    emb = _t(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    norm = F.round(F.sqrt(sq), 6)
    return (
        emb.select("label", norm.alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("norm").cast("decimal(18,6)")), 4
            ).cast("double").alias("sum_norm"),
        )
        .orderBy("label")
    )


def daily_counts_q(spark, sf_dir):
    """Temporal truncation surface: per-day event counts + exact distinct
    users, day as an ISO date string so the hash is engine-neutral."""
    ev = _t(spark, sf_dir, "events")
    day = F.col("ts").cast("date").cast("string")
    return (
        ev.select(day.alias("day"), "user_id")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("day")
    )


def json_extract_agg_q(spark, sf_dir):
    """Semi-structured column surface: events.props is a JSON string;
    extract $.k path-wise (get_json_object — JVM-side JSON path, no UDF),
    aggregate per event type.  Sums ride DECIMAL so the oracle's identical
    extraction reproduces the values exactly."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
        )
        .orderBy("event_type")
    )


def cube_revenue_q(spark, sf_dir):
    """GROUP BY CUBE over (status, priority): all four grouping sets in ONE
    Expand pass over the fact table (the rollup_revenue pattern, completed
    to the full cross of subtotals).  DECIMAL sums keep the totals
    engine-exact."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2
            )
            .cast("double")
            .alias("revenue"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


def range_window_avg_q(spark, sf_dir):
    """RANGE-frame window (the value-based frame running_total's ROWS frame
    doesn't cover): per user, the trailing-1-hour moving average of event
    value — frame bounds in exact integer microseconds (unix_micros /
    epoch_us), sums in DECIMAL so variable-width windows stay
    engine-exact."""
    ev = _t(spark, sf_dir, "events")
    us = F.expr("unix_micros(cast(ts as timestamp))")
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-3_600_000_000, 0)
    )
    base = ev.select(
        "user_id", "event_id", us.alias("us"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    return (
        base.withColumn("n_in_window", F.count(F.lit(1)).over(w))
        .withColumn(
            "avg_1h",
            F.round(
                F.sum("v").over(w).cast("double")
                / F.col("n_in_window").cast("double"),
                6,
            ),
        )
        .select("user_id", "event_id", "n_in_window", "avg_1h")
        .orderBy("user_id", "event_id")
    )


def stratified_weighted_sample_q(spark, sf_dir):
    """Per-stratum weighted sampling (training-mix assembly): 5 documents
    per source, weight-proportional to n_chars, via the A-ES key ranked by
    a per-group row_number — one exchange on the stratum key."""
    from httrack2warc_spark.operators.sketches import grouped_weighted_sample

    docs = _t(spark, sf_dir, "documents")
    out = grouped_weighted_sample(
        docs, "doc_id", "n_chars", "source", k=5, seed=11
    )
    return out.select("source", "doc_id", "n_chars").orderBy(
        "source", "doc_id"
    )


def q13_cust_dist_q(spark, sf_dir):
    """TPC-H Q13 (customer order-count distribution): LEFT OUTER join with
    a join-condition residual (the NOT LIKE lives in the ON clause, not a
    post-filter — semantically different for outer joins: excluded orders
    still leave their customer with c_count 0) + double aggregation.
    Covers the outer-join operator class the other graded relational
    queries don't touch.  Q13's o_comment filter maps to o_orderpriority
    on the synthetic schema (no comment column)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    joined = cust.join(
        orders,
        (cust.c_custkey == orders.o_custkey)
        & ~orders.o_orderpriority.like("%URGENT%"),
        "left_outer",
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def event_gaps_q(spark, sf_dir):
    """Analytic lead/lag + ntile: per-user inter-event gaps (exact integer
    microseconds via unix_micros — a double epoch cast would round
    differently across engines), quartiled by ntile(4) over the fully
    deterministic (gap, user, event) ordering, then per-quartile stats.
    Covers the lag/ntile window-function class."""
    ev = _t(spark, sf_dir, "events")
    us = F.expr("unix_micros(cast(ts as timestamp))")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gaps = (
        ev.select("user_id", "event_id", us.alias("us"))
        .withColumn("gap_us", F.col("us") - F.lag("us").over(w))
        .where(F.col("gap_us").isNotNull())
    )
    wq = Window.orderBy("gap_us", "user_id", "event_id")
    tiled = gaps.withColumn("quartile", F.ntile(4).over(wq))
    return (
        tiled.groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("gap_us").alias("min_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
            F.round(F.avg("gap_us"), 3).alias("avg_gap_us"),
        )
        .orderBy("quartile")
    )


def quantile_sketch_q(spark, sf_dir):
    """Mergeable binned-quantile sketch (equi-width histogram + rank
    interpolation): p50/p95/p99 of event value per event type from two
    map-side-combined aggregate passes — per-group state is 256 bin
    counts that merge by SUM, the quantile-sketch architecture for
    10^10-row scale.  Exact-integer ranks + identical double bin math
    make the estimate engine-reproducible."""
    from httrack2warc_spark.operators.sketches import binned_quantiles

    ev = _t(spark, sf_dir, "events")
    return binned_quantiles(
        ev, "value", [0.5, 0.95, 0.99], ["event_type"], bins=256
    ).orderBy("event_type", "prob")


def q6_revenue_scan_q(spark, sf_dir):
    """Canonical pushdown scan-aggregate (TPC-H Q6 shape): every predicate
    reaches the parquet reader as PushedFilters, the projection prunes the
    scan to the three referenced columns, and the single scalar is a partial
    + final aggregate — zero joins, no wide shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def q4_order_priority_q(spark, sf_dir):
    """EXISTS-semi-join priority census (TPC-H Q4 shape, adapted: a lineitem
    is "late" when it ships more than 60 days after the order date — the
    synthetic schema carries no commit/receipt dates). The decorrelated plan
    is one equi-semi-join on the order key with the date inequality as a
    residual; only the quarter's orders flow into it."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        on=[
            o["o_orderkey"] == li["l_orderkey"],
            li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 60 DAYS"),
        ],
        how="left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q14_promo_share_q(spark, sf_dir):
    """Conditional-aggregation ratio (TPC-H Q14 shape): one month's revenue
    share from PROMO-type parts. The part dim broadcasts; the percentage is
    derived from the two ALREADY-ROUNDED sums so both engines divide
    bit-identical doubles (never hash a raw double quotient — build notes)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-03-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).agg(
        F.round(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))), 2
        ).alias("promo_revenue"),
        F.round(F.sum(rev), 2).alias("total_revenue"),
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        F.round(
            F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue"), 6
        ).alias("promo_pct"),
    )


def q17_small_qty_q(spark, sf_dir):
    """Correlated-average decorrelation (TPC-H Q17 shape): revenue locked in
    small orders — one brand's lineitems whose quantity is below 20% of that
    part's average order quantity. The correlated subquery decorrelates to a
    per-part aggregate joined back (broadcast: one brand's parts are tiny);
    the threshold `qty < 0.2 * avg(qty)` is restated in EXACT integer
    arithmetic (`5 * qty * n < sum_qty`; quantities are integer-valued) so no
    engine-specific float average can flip a boundary row."""
    p = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    li = _t(spark, sf_dir, "lineitem")
    bl = li.join(
        F.broadcast(p.select("p_partkey")), li["l_partkey"] == F.col("p_partkey")
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    stats = bl.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_li"),
    )
    small = bl.join(F.broadcast(stats), bl["l_partkey"] == F.col("pk")).where(
        F.lit(5) * F.col("l_quantity").cast("bigint") * F.col("n_li")
        < F.col("sum_qty")
    )
    agg = small.agg(
        F.round(F.sum("l_extendedprice"), 2).alias("rev2"),
        F.count(F.lit(1)).alias("n_small"),
    )
    return agg.select(
        F.round(F.col("rev2") / F.lit(7.0), 6).alias("avg_yearly"), "n_small"
    )


def q19_disjunctive_q(spark, sf_dir):
    """Disjunctive-predicate join (TPC-H Q19 shape): an OR of three
    brand/size/quantity conjunct groups over the lineitem ⨝ part equi-join.
    Catalyst keeps the common l_partkey = p_partkey equi-condition for a
    BroadcastHashJoin and leaves the disjunction as a residual, while
    per-side implied ranges push into both scans."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#17")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .where(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def q22_lapsed_rich_q(spark, sf_dir):
    """Scalar-threshold anti-join (TPC-H Q22 shape): per-nation census of
    above-average-balance customers with no orders since 2000. The global
    average is a single-scalar aggregate collected on the driver (O(1) rows —
    the same documented pattern as the IVF centroid collect) and folded into
    the filter as a literal; the no-recent-orders side is a shuffled anti-join
    on the customer key (orders is the BIG side at scale — never broadcast)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    avg_bal = (
        c.where(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal")).collect()[0][0]
    )
    recent = o.where(F.col("o_orderdate") >= F.lit("2000-01-01")).select("o_custkey")
    return (
        c.where(F.col("c_acctbal") > F.lit(avg_bal))
        .join(recent, c["c_custkey"] == recent["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


def q15_top_supplier_q(spark, sf_dir):
    """Max-of-aggregate selection (TPC-H Q15 shape): the supplier(s) with the
    quarter's top revenue. The max is NOT a global window (that would funnel
    every supplier through one partition at scale) — the per-supplier
    aggregate equi-joins its own 1-row max() on the rounded revenue key, a
    broadcast hash join."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    s = _t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_rev")
    )
    top = rev.agg(F.max("total_rev").alias("total_rev"))
    return (
        rev.join(F.broadcast(top), "total_rev")
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


def q2_min_cost_q(spark, sf_dir):
    """Correlated-min decorrelation / per-group argmin (TPC-H Q2 shape over
    the available schema: lineitem stands in for partsupp — a (part, supplier)
    pair's offer price is its cheapest observed extendedprice). The argmin is
    a keyed window-min (one shuffle on p_partkey, no global window) with
    EXACT double equality: min() selects an existing value, no arithmetic,
    so both engines agree bit-for-bit."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_size") <= 5)
    s = _t(spark, sf_dir, "supplier")
    offers = (
        li.join(
            F.broadcast(p.select("p_partkey", "p_brand")),
            li["l_partkey"] == F.col("p_partkey"),
        )
        .groupBy("p_partkey", "p_brand", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("cost"))
    )
    w = Window.partitionBy("p_partkey")
    best = offers.withColumn("min_cost", F.min("cost").over(w)).where(
        F.col("cost") == F.col("min_cost")
    )
    return (
        best.join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .select("p_partkey", "p_brand", "s_suppkey", "s_name", "cost")
        .orderBy("p_partkey", "s_suppkey")
    )


def q11_important_stock_q(spark, sf_dir):
    """Global-fraction HAVING (TPC-H Q11 shape): per-part stock value for one
    region's suppliers, keeping parts whose value exceeds 0.01% of the grand
    total. Two-pass: the per-part aggregate shuffles once on l_partkey; the
    grand total is a single-scalar driver collect (O(1) rows, the documented
    q22/IVF pattern) folded into the filter as a literal. The value is summed
    in DECIMAL so the 0.0001 threshold is EXACT integer-scaled arithmetic
    (`value * 10000 > total`) — no engine's float sum order can flip a
    boundary part — and only the final display column is rounded to double."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(F.col("n_regionkey") == 2)
    sup = s.join(
        F.broadcast(n.select("n_nationkey")),
        s["s_nationkey"] == F.col("n_nationkey"),
    ).select("s_suppkey")
    val = F.col("l_extendedprice").cast("decimal(18,2)") * F.col(
        "l_quantity"
    ).cast("bigint")
    stock = (
        li.join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .groupBy("l_partkey")
        .agg(F.sum(val).alias("value_dec"))
    )
    total = stock.agg(F.sum("value_dec")).collect()[0][0]
    return (
        stock.where(F.col("value_dec") * 10000 > F.lit(total))
        .select(
            "l_partkey",
            F.round(F.col("value_dec"), 2).cast("double").alias("stock_value"),
        )
        .orderBy(F.desc("stock_value"), "l_partkey")
    )


def q12_priority_class_q(spark, sf_dir):
    """Big-big join + conditional aggregation (TPC-H Q12 shape): one year's
    lineitems classified by their order's priority, counted per linestatus.
    lineitem ⨝ orders is the canonical big-big shuffle hash join on the order
    key (neither side broadcasts at scale); the priority split is a CASE
    inside sum, one pass, exact integer counts."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


def q16_supplier_cnt_q(spark, sf_dir):
    """Excluded-set distinct count (TPC-H Q16 shape): how many distinct
    suppliers can furnish each (brand, type, size) combination, excluding a
    blocklisted supplier set (negative account balance stands in for the
    'Customer Complaints' comment — the schema carries no s_comment). The
    part-supplier relation is the distinct (l_partkey, l_suppkey) projection
    of lineitem (the q2 partsupp stand-in); the blocklist is a broadcast
    anti-join; the count(DISTINCT) shuffles once on the 3-part group key."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#17")
        & (F.col("p_type") != "ECONOMY")
        & F.col("p_size").isin(1, 2, 5, 11, 28, 37, 44, 49)
    )
    bad = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(F.broadcast(bad), pairs["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(F.broadcast(p), pairs["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def q20_excess_stock_q(spark, sf_dir):
    """Nested decorrelated IN-chains (TPC-H Q20 shape): one region's suppliers
    holding more than half a year's shipments of any 'small…' part. Both
    correlated IN subqueries decorrelate to aggregates joined on their keys:
    per-(part, supplier) stock vs per-part 1997 shipment volume, compared in
    EXACT integer arithmetic (`2 * stock > shipped`; quantities are
    integer-valued). The part and supplier dims broadcast; the only big
    shuffles are the two lineitem aggregates."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_name").startswith("small")).select(
        "p_partkey"
    )
    stock = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("stock"))
    )
    shipped = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .groupBy(F.col("l_partkey").alias("sp_partkey"))
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("shipped"))
    )
    keep = (
        stock.join(shipped, stock["l_partkey"] == shipped["sp_partkey"])
        .where(F.lit(2) * F.col("stock") > F.col("shipped"))
        .select("l_suppkey")
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(F.col("n_regionkey") == 2)
    return (
        keep.join(s, keep["l_suppkey"] == s["s_suppkey"])
        .join(
            F.broadcast(n.select("n_nationkey")),
            s["s_nationkey"] == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


def listagg_sorted_q(spark, sf_dir):
    """Order-sensitive string aggregation made deterministic (LISTAGG /
    string_agg class): per-nation roster of supplier names. collect_list is
    partition-order nondeterministic by contract, so the list is array_sort'ed
    BEFORE concat — the only way a distributed listagg can be value-stable.
    The nation dim broadcasts; one exchange on the group key."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("s_name"))).alias(
                "suppliers"
            ),
            F.count(F.lit(1)).alias("n_suppliers"),
        )
        .orderBy("n_name")
    )


def bit_bool_aggs_q(spark, sf_dir):
    """Bitwise and boolean aggregate surface (BIT_AND/BIT_OR/BIT_XOR +
    BOOL_AND/BOOL_OR): order-independent by algebra (commutative, associative)
    so cross-engine exact with no decimal tricks. One pass over orders,
    grouped by status; XOR over the key set doubles as a cheap order-invariant
    set fingerprint (the same identity the url_seen checksum audit uses)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.bit_and("o_orderkey").alias("key_band"),
            F.bit_or("o_orderkey").alias("key_bor"),
            F.bit_xor("o_orderkey").alias("key_bxor"),
            F.bool_and(F.col("o_totalprice") > 1000.0).alias("all_over_1k"),
            F.bool_or(F.col("o_totalprice") > 400000.0).alias("any_over_400k"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


def argmax_per_group_q(spark, sf_dir):
    """Aggregate argmax (MAX_BY class, no window): the top-balance customer
    per market segment via max(struct(value, tiebreak)) — structs compare
    lexicographically, so the custkey tiebreak makes the answer a total
    function even under duplicate balances, and the whole thing is ONE
    partial-aggregable pass (a window argmax would sort every partition;
    max(struct) combines map-side). Oracle restates it as a row_number pick."""
    c = _t(spark, sf_dir, "customer")
    m = (
        c.groupBy("c_mktsegment")
        .agg(F.max(F.struct("c_acctbal", "c_custkey")).alias("best"))
    )
    return m.select(
        "c_mktsegment",
        F.col("best.c_custkey").alias("best_custkey"),
        F.col("best.c_acctbal").alias("best_acctbal"),
    ).orderBy("c_mktsegment")


def grouped_corr_q(spark, sf_dir):
    """Per-group Pearson correlation, cross-engine exact: corr(time, value)
    per event type. Never hash an engine's corr() — accumulation order moves
    the last ulps. Instead the five sufficient statistics are EXACT BIGINT
    sums (integer seconds offset to the epoch floor; value at its native
    2-decimal grain ×100), and the final coefficient is the same double
    expression evaluated from identical integers in both engines — IEEE ops
    on equal inputs are bit-identical. One partial-aggregable pass."""
    e = _t(spark, sf_dir, "events")
    x = (
        F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1000000)
    ).cast("bigint") - F.lit(1704067200)
    y = F.round(F.col("value") * 100).cast("bigint")
    stats = (
        e.select(F.col("event_type"), x.alias("x"), y.alias("y"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
        )
    )
    nd = F.col("n").cast("double")
    cov = nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double")
    vx = nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    ).cast("double")
    vy = nd * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col(
        "sy"
    ).cast("double")
    return stats.select(
        "event_type",
        "n",
        F.round(cov / F.sqrt(vx * vy), 6).alias("corr_tv"),
    ).orderBy("event_type")


def fuzzy_title_match_q(spark, sf_dir):
    """Blocked fuzzy string matching (edit-distance join): near-duplicate
    document titles via an 8-char-prefix blocking key + levenshtein ≤ 8
    refinement (operators/fuzzy.py). The blocking equi-join keeps the plan a
    hash join (the naive form is an all-pairs cross join paying a quadratic
    edit-distance bill); levenshtein evaluates JVM-side in codegen on block
    candidates only. The hot-block cap is carried (the 100-TB guard) but
    sized above every fixture block so the oracle is the uncapped truth."""
    from httrack2warc_spark.operators.fuzzy import fuzzy_match_pairs

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.substring("text", 1, 24)).alias("title")
    )
    pairs = fuzzy_match_pairs(
        d, "doc_id", "title", max_dist=8, max_block_size=1000
    )
    return pairs.select(
        F.col("a").alias("doc_a"), F.col("b").alias("doc_b"), "dist"
    ).orderBy("doc_a", "doc_b")


def unpivot_metrics_q(spark, sf_dir):
    """Unpivot / melt (wide → long): the per-returnflag metric matrix flips
    to (flag, metric, value) rows — the inverse of pivot_counts' conditional
    aggregation. The Expand operator runs over the already-aggregated tiny
    frame, never over the fact table."""
    li = _t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.count(F.lit(1)).cast("double").alias("n_rows"),
    )
    return wide.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price", "n_rows"], "metric", "value"
    ).orderBy("l_returnflag", "metric")


def running_distinct_q(spark, sf_dir):
    """Running windowed distinct-count — an aggregate Spark's window API has
    no native DISTINCT form for: per user, the number of distinct event
    types seen up to each event. Expressed as size(collect_set() OVER w);
    set state stays bounded by |event_type| per user, one exchange on
    user_id, ties fully ordered by (ts, event_id)."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w)).alias("n_types"),
    ).orderBy("event_id")


def q7_volume_shipping_q(spark, sf_dir):
    """Directional two-nation trade volume (TPC-H Q7 shape): revenue shipped
    between NATION_3 suppliers and NATION_7 customers over two ship years,
    both directions kept as separate groups.  The nation dim broadcasts
    TWICE (one copy per role — supplier side and customer side resolve
    independently); the symmetric pair predicate is a residual after the
    joins, so the plan stays four hash joins plus one partially-aggregated
    shuffle on (supp_nation, cust_nation, year).  Money rides DECIMAL so
    both engines sum exactly (build notes)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n1), s["s_nationkey"] == F.col("sn_key"))
        .join(F.broadcast(n2), c["c_nationkey"] == F.col("cn_key"))
        .where(
            (
                (F.col("supp_nation") == "NATION_3")
                & (F.col("cust_nation") == "NATION_7")
            )
            | (
                (F.col("supp_nation") == "NATION_7")
                & (F.col("cust_nation") == "NATION_3")
            )
        )
    )
    return (
        j.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.sum(rev.cast("decimal(38,6)")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q8_market_share_q(spark, sf_dir):
    """National market share (TPC-H Q8 shape): among ASIA-region customers'
    PROMO-part purchases, the yearly revenue fraction supplied by NATION_3.
    The share divides two doubles each derived from an EXACT decimal sum, so
    the quotient is bit-identical across engines before the final round.
    part / supplier / nation / region all broadcast; the only wide exchange
    is the order-year aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n_c = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cr_key")
    )
    n_s = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(38,6)"
    )
    j = (
        li.join(F.broadcast(p.select("p_partkey")), li["l_partkey"] == F.col("p_partkey"))
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n_c), c["c_nationkey"] == F.col("cn_key"))
        .join(F.broadcast(r.select("r_regionkey")), F.col("cr_key") == F.col("r_regionkey"))
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n_s), s["s_nationkey"] == F.col("sn_key"))
    )
    agg = j.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.sum(F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0).cast("decimal(38,6)")))
        .cast("double")
        .alias("nation_revenue"),
        F.sum(rev).cast("double").alias("total_revenue"),
    )
    return agg.select(
        "o_year",
        "nation_revenue",
        "total_revenue",
        F.round(F.col("nation_revenue") / F.col("total_revenue"), 6).alias(
            "mkt_share"
        ),
    ).orderBy("o_year")


def q9_nation_profit_q(spark, sf_dir):
    """Nation × order-year profit rollup (TPC-H Q9 shape over the available
    schema — no partsupp, so profit = discounted revenue from each supplier
    nation).  Full-corpus two-fact join (lineitem ⋈ orders on the order key)
    with broadcast dims, aggregated on a low-cardinality composite key
    (25 nations × 7 years); partial aggregation collapses almost everything
    map-side before the exchange."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(38,6)"
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(rev).cast("double").alias("profit"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("nation", "o_year")
    )


def q10_returned_items_q(spark, sf_dir):
    """Returned-item revenue ranking (TPC-H Q10 shape): customers ranked by
    revenue lost to returns (l_returnflag = 'R') in one quarter, top 20.
    The LIMIT rides a TOTAL order — (revenue DESC, c_custkey ASC) — so the
    boundary is deterministic under any partitioning; Spark plans it as
    TakeOrderedAndProject (per-partition top-20, then a 20-row merge on the
    driver — no global sort materializes)."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    c = _t(spark, sf_dir, "customer")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(38,6)"
    )
    return (
        li.join(o.select("o_orderkey", "o_custkey"), li["l_orderkey"] == o["o_orderkey"])
        .join(c.select("c_custkey", "c_name"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def gaps_islands_q(spark, sf_dir):
    """Gaps-and-islands: maximal runs of consecutive same-typed events per
    user.  The island key is the row_number difference (rank over the user
    stream minus rank over the (user, type) substream — constant exactly
    while the type repeats); both windows shuffle on the SAME user_id key so
    the second sort is partition-local, no extra exchange.  Island starts in
    exact integer microseconds (unix_micros == epoch_us, build notes)."""
    ev = _t(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_typ = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    runs = ev.select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        (F.row_number().over(w_all) - F.row_number().over(w_typ)).alias("grp"),
    )
    return (
        runs.groupBy("user_id", "event_type", "grp")
        .agg(
            F.count(F.lit(1)).alias("run_len"),
            F.min("us").alias("start_us"),
        )
        .drop("grp")
        .orderBy("user_id", "start_us")
    )


def sssp_relax_q(spark, sf_dir):
    """Weighted single-source shortest path, four UNROLLED Bellman-Ford
    relaxation rounds from vertex 0 over the events-derived graph (same
    edge rule as pagerank; weight = (s*7 + t*13) % 20 + 1, a pure integer
    function of the endpoints both engines compute identically).  Each round
    is dist ∪ (dist ⋈ edges → d+w) re-minimized per vertex — the frontier
    stays tiny (≤|V| rows) against the broadcast-joined edge set, distances
    stay integers so the min is exact.  A FIXED round count (not
    run-to-convergence) keeps the result a pure function of the graph,
    value-checkable round-for-round against the unrolled SQL twin."""
    ev = _t(spark, sf_dir, "events")
    e = (
        ev.select(
            (F.col("user_id") % 100).alias("s"),
            ((F.col("user_id") * 3 + F.col("event_id")) % 100).alias("t"),
        )
        .where(F.col("s") != F.col("t"))
        .distinct()
        .withColumn("w", (F.col("s") * 7 + F.col("t") * 13) % 20 + 1)
    )
    # seed = {vertex 0: dist 0}; derived from range(1).id, NOT lit(0) — a
    # literal join key constant-folds the equi-join back to a cross join
    # (build notes), and the plan lint forbids BNLJ.
    dist = spark.range(1).select(
        F.col("id").alias("vertex"), F.col("id").alias("dist")
    )
    for _ in range(4):
        relaxed = dist.join(e, dist["vertex"] == e["s"]).select(
            F.col("t").alias("vertex"), (F.col("dist") + F.col("w")).alias("dist")
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("vertex")
            .agg(F.min("dist").alias("dist"))
        )
    return dist.orderBy("vertex")


def pareto_frontier_q(spark, sf_dir):
    """2-D skyline (Pareto frontier): the (p_retailprice, p_size) pairs not
    dominated by any cheaper-and-smaller pair.  The fact table first
    collapses to DISTINCT pairs (bounded by the price grid, not the row
    count — that aggregate is the scale step); the skyline itself is then a
    single sorted sweep: ordered by (price ASC, size ASC), a pair survives
    iff every strictly-preceding pair has a LARGER size (running min over
    the preceding frame).  The oracle states the same set as the textbook
    NOT EXISTS dominance quantifier — two independent formulations, one
    answer.  No arithmetic touches the doubles, so comparisons are exact."""
    p = _t(spark, sf_dir, "part")
    pairs = p.select(
        F.col("p_retailprice").alias("price"), F.col("p_size").alias("size")
    ).distinct()
    w = (
        Window.orderBy("price", "size")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        pairs.withColumn("prev_min", F.min("size").over(w))
        .where(F.col("prev_min").isNull() | (F.col("prev_min") > F.col("size")))
        .select("price", "size")
        .orderBy("price", "size")
    )


def mode_per_group_q(spark, sf_dir):
    """Per-group mode (most frequent value): each user's dominant event
    type, ties broken alphabetically so the answer is a total function.
    Count-then-rank — the count aggregate and the rank window shuffle on the
    same user_id key, so the window sort is partition-local after one
    exchange."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("cnt").desc(), F.col("event_type").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_type"), "cnt")
        .orderBy("user_id")
    )


def cooccurrence_pairs_q(spark, sf_dir):
    """Co-occurrence mining (market-basket pairs): unordered event-type
    pairs observed within one user's stream, with user support counts.
    The pair space is built from the DEDUPLICATED (user, type) set — the
    self-join runs on |users|·|types| rows, never on raw events — and the
    `a < b` residual halves the output without a distinct."""
    ev = _t(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    return (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("type_a", "type_b")
    )


def basket_lift_q(spark, sf_dir):
    """Association-rule metrics (support / confidence / lift) over the
    co-occurrence pairs: lift = P(a∧b) / (P(a)·P(b)) from EXACT integer
    user counts — the quotient divides identical BIGINTs in both engines, so
    round-6 is deterministic. Singleton counts broadcast (|types| rows); the
    total-user scalar is an O(1) driver collect (the q22 pattern); the only
    fact-sized work is the same dedup + tiny self-join as cooccurrence."""
    ev = _t(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    n_total = ut.select("user_id").distinct().count()
    singles = ut.groupBy(F.col("event_type").alias("t")).agg(
        F.count(F.lit(1)).alias("n_single")
    )
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = singles.select(F.col("t").alias("type_a"), F.col("n_single").alias("n_a"))
    sb = singles.select(F.col("t").alias("type_b"), F.col("n_single").alias("n_b"))
    j = pairs.join(F.broadcast(sa), "type_a").join(F.broadcast(sb), "type_b")
    return j.select(
        "type_a",
        "type_b",
        "n_both",
        F.round(
            F.col("n_both").cast("double") / F.col("n_a").cast("double"), 6
        ).alias("confidence_ab"),
        F.round(
            (F.col("n_both").cast("double") * F.lit(float(n_total)))
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
            6,
        ).alias("lift"),
    ).orderBy("type_a", "type_b")


def date_densify_q(spark, sf_dir):
    """Calendar densification (gap filling): the per-day purchase count with
    MISSING days restored as explicit zero rows.  The date spine is a
    sequence() explode over the observed [min, max] range — one 2-row
    aggregate drives the generator, so the spine costs one tiny job-side
    expansion, not a join against a stored calendar; the left join back to
    the daily counts broadcasts the aggregated (not raw) side."""
    ev = _t(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    bounds = daily.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    return (
        spine.join(F.broadcast(daily), "day", "left")
        .select("day", F.coalesce("n", F.lit(0)).alias("n_purchases"))
        .orderBy("day")
    )


def locf_fill_q(spark, sf_dir):
    """Last-observation-carried-forward: at every event, the value of the
    user's most recent PURCHASE (NULL until the first one) — the classic
    sparse-measurement fill.  One window, `last(..., ignorenulls=True)` over
    the unbounded-preceding frame; values keyed in exact DECIMAL so both
    engines carry the identical scalar forward."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(
            F.col("event_type") == "purchase",
            F.col("value").cast("decimal(18,2)"),
        ).alias("purchase_value"),
    )
    return (
        marked.select(
            "event_id",
            "user_id",
            F.last("purchase_value", ignorenulls=True)
            .over(w)
            .cast("double")
            .alias("last_purchase"),
        )
        .orderBy("event_id")
    )


def value_distribution_q(spark, sf_dir):
    """Rank-distribution statistics: percent_rank and cume_dist of each
    order's total price within its priority class.  Both statistics are
    integer-quotient functions of rank positions — (rank-1)/(n-1) and
    peers/n — so the doubles are bit-identical across engines; the ordering
    is total ((o_totalprice, o_orderkey)) so tied prices rank stably."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cum_dist"),
        )
        .orderBy("o_orderkey")
    )


def share_of_total_q(spark, sf_dir):
    """Ratio-to-report (share of total): each market segment's slice of
    total order revenue.  Aggregate FIRST (5 segment rows), then the
    grand-total window runs over those 5 rows — never a whole-table window;
    numerator and denominator are the same exact DECIMAL sums cast once, so
    the quotient is bit-identical across engines before the round."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    seg = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_d")
        )
    )
    w = Window.partitionBy()
    return (
        seg.select(
            "c_mktsegment",
            F.col("rev_d").cast("double").alias("segment_revenue"),
            F.round(
                F.col("rev_d").cast("double")
                / F.sum("rev_d").over(w).cast("double"),
                6,
            ).alias("revenue_share"),
        )
        .orderBy("c_mktsegment")
    )


def type_entropy_q(spark, sf_dir):
    """Shannon entropy of each user's event-type distribution — the
    information-theoretic "how varied is this user" score used in
    behavioral segmentation.  Probabilities are exact integer quotients
    (count/total — identical doubles on both engines); the log2 sum is
    rounded to 6, well inside cross-libm ulp agreement.  Two aggregates on
    narrowing keys ((user, type) → user), both partial-combined."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("user_id")
    probs = counts.select(
        "user_id",
        (F.col("c").cast("double") / F.sum("c").over(w).cast("double")).alias(
            "p"
        ),
    )
    return (
        probs.groupBy("user_id")
        .agg(F.round(-F.sum(F.col("p") * F.log2("p")), 6).alias("entropy"))
        .orderBy("user_id")
    )


def curate_image_captions_q(spark, sf_dir):
    """End-to-end image+caption curation pipeline over the BASELINE.json
    input_hint table shape — the training-data-prep composition of gates a
    100 TB multimodal corpus runs before anything reaches a trainer:
    (1) format whitelist (png/jpeg), (2) caption quality (≥6 distinct
    tokens — repeated-word boilerplate drops), (3) exact caption dedup
    among the survivors (min image_id wins; a reposted image whose original
    was format-dropped survives as the new canonical).  Every gate is a
    JVM built-in over the metadata columns — the binary payload column is
    never touched, so at scale the scan prunes it away entirely.  The
    fixture plants a same-caption clone on every 6th image; the oracle is
    the generator arithmetic replayed independently (constant-table
    pattern, see image_invariant)."""
    from httrack2warc_spark.frontier.synth import generate_images

    imgs = generate_images(spark, 96, w=16, h=16).select(
        "image_id", "fmt", "caption"
    )
    clones = imgs.where(
        F.regexp_extract("image_id", r"img-(\d+)", 1).cast("long") % 6 == 0
    ).select(
        F.concat("image_id", F.lit("-dup")).alias("image_id"),
        F.lit("png").alias("fmt"),
        "caption",
    )
    corpus = imgs.unionByName(clones)
    toks = F.split(F.col("caption"), " ")
    gated = corpus.select(
        "image_id",
        "fmt",
        "caption",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
    ).where(F.col("fmt").isin("png", "jpeg") & (F.col("n_distinct") >= 6))
    w = Window.partitionBy("caption").orderBy("image_id")
    return (
        gated.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("image_id", "fmt", "n_tokens", "n_distinct")
        .orderBy("image_id")
    )


def event_debounce_q(spark, sf_dir):
    """Debounce (double-fire suppression): drop any event that repeats the
    same user's same event type within 10 minutes of the previous kept-or-
    dropped occurrence — the duplicate-click scrub a stream gets before
    sessionization.  One lag() per (user, type) partition over exact integer
    microseconds; the NULL first-in-partition lag passes the gate by
    definition.  (This is lag-debounce — gap from the previous RAW event,
    the stateless form; a carry-forward debounce would need a running
    anchor.)"""
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = us - F.lag(us).over(w)
    return (
        ev.select("event_id", "user_id", "event_type", "ts", gap.alias("gap_us"))
        .where(F.col("gap_us").isNull() | (F.col("gap_us") > 600_000_000))
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
    )


def trailing_window_count_q(spark, sf_dir):
    """Trailing event-time window (RANGE frame on the physical clock): for
    every event, how many of the same user's events fall in the preceding
    hour — rate-limiter / anomaly input.  The frame is rangeBetween over
    exact integer microseconds (NOT row-count), so irregular event spacing
    is honored; counts are integers, cross-engine exact."""
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    with_us = ev.select("event_id", "user_id", us.alias("us"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        with_us.select(
            "event_id",
            "user_id",
            F.count(F.lit(1)).over(w).alias("n_last_hour"),
        )
        .orderBy("event_id")
    )


def time_weighted_avg_q(spark, sf_dir):
    """Time-weighted average (TWAP class): per-user mean of `value` weighted
    by how long each observation was in force (duration to the NEXT event —
    the step-function integral a price/telemetry series needs; a plain avg
    over-weights bursts). Numerator and denominator are EXACT BIGINT sums
    (integer-microsecond durations × the value at its native 2-decimal grain)
    so the final quotient divides identical integers in both engines; the
    last observation per user carries no duration by definition. One lead()
    window and one aggregate on the same user_id partitioning — the exchange
    is shared."""
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dur = F.lead(us).over(w) - us
    y = F.round(F.col("value") * 100).cast("bigint")
    stepped = ev.select(
        "user_id", dur.alias("dur_us"), (y * dur).alias("wv")
    ).where(F.col("dur_us").isNotNull())
    return (
        stepped.groupBy("user_id")
        .agg(
            F.sum("dur_us").alias("total_us"),
            F.sum("wv").alias("sum_wv"),
            F.count(F.lit(1)).alias("n_steps"),
        )
        .where(F.col("total_us") > 0)
        .select(
            "user_id",
            "n_steps",
            F.round(
                F.col("sum_wv").cast("double")
                / F.col("total_us").cast("double")
                / F.lit(100.0),
                6,
            ).alias("twap_value"),
        )
        .orderBy("user_id")
    )


def ohlc_bars_q(spark, sf_dir):
    """OHLC resampling (bar aggregation class): per (event_type, day) open/
    high/low/close of `value`. Open and close are aggregate argmin/argmax via
    min(struct)/max(struct) with the event_id tiebreak — ONE partial-
    aggregable grouped pass, no window sort over the facts — and every output
    is an EXISTING double (picks, never arithmetic), so cross-engine equality
    is exact with no decimal tricks. Day is an ISO string so the hash is
    engine-neutral."""
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    day = F.col("ts").cast("date").cast("string")
    rows = ev.select(
        "event_type",
        day.alias("day"),
        F.struct(us.alias("us"), F.col("event_id"), F.col("value")).alias("k"),
        "value",
    )
    agg = rows.groupBy("event_type", "day").agg(
        F.min("k").alias("first_k"),
        F.max("k").alias("last_k"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return agg.select(
        "event_type",
        "day",
        F.col("first_k.value").alias("open"),
        "high",
        "low",
        F.col("last_k.value").alias("close"),
        "n_events",
    ).orderBy("event_type", "day")


def spend_quartiles_q(spark, sf_dir):
    """Two-level aggregate → window → re-aggregate (RFM/segmentation class):
    customers bucketed into spend quartiles, then per-quartile stats. The
    per-customer spend is an EXACT DECIMAL sum; ntile runs over the total
    order (spend, custkey) so ties are deterministic; the outer aggregate is
    counts + decimal sums again. The window operates on the ALREADY-AGGREGATED
    per-customer frame (one row per customer), never the orders fact — at
    100 TB the facts see exactly one exchange (the groupBy), and the ntile's
    single-partition sort handles only |customers| rows of 16-byte pairs."""
    o = _t(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend_d")
    )
    w = Window.orderBy("spend_d", "o_custkey")
    q = spend.withColumn("quartile", F.ntile(4).over(w))
    return (
        q.groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("spend_d"), 2).cast("double").alias("total_spend"),
            F.round(F.min("spend_d"), 2).cast("double").alias("min_spend"),
            F.round(F.max("spend_d"), 2).cast("double").alias("max_spend"),
        )
        .orderBy("quartile")
    )


def topk_with_ties_q(spark, sf_dir):
    """Top-k per group WITH ties (dense_rank ≤ k): the three highest order
    prices per priority class, every order at a tied price kept — the rank
    family's set-valued form (row_number would drop ties arbitrarily;
    dense_rank makes the cutoff a property of the VALUE, so the result is a
    total function of the data)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc())
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            F.dense_rank().over(w).alias("price_rank"),
        )
        .where(F.col("price_rank") <= 3)
        .orderBy("o_orderkey")
    )


def weighted_median_q(spark, sf_dir):
    """Exact weighted median per group (lower weighted median: the smallest
    value whose cumulative weight reaches half the total) — the
    corpus-stats quantile where documents carry token weights.  Weights are
    integers derived from the key, so the cumulative sums are exact; the
    pick is a running-sum window + min() — no interpolation, the result is
    an EXISTING value (bit-exact across engines).  One exchange on the
    group key shared by the window and the final aggregate."""
    o = _t(spark, sf_dir, "orders")
    wt = (F.col("o_orderkey") % 5 + 1).cast("long")
    base = o.select(
        "o_orderpriority", F.col("o_totalprice").alias("v"), wt.alias("wt")
    )
    w_run = (
        Window.partitionBy("o_orderpriority")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("o_orderpriority")
    marked = base.select(
        "o_orderpriority",
        "v",
        F.sum("wt").over(w_run).alias("cum"),
        F.sum("wt").over(w_tot).alias("tot"),
    )
    return (
        marked.where(F.col("cum") * 2 >= F.col("tot"))
        .groupBy("o_orderpriority")
        .agg(F.min("v").alias("weighted_median"))
        .orderBy("o_orderpriority")
    )


def mom_growth_q(spark, sf_dir):
    """Month-over-month growth: the revenue time series aggregated to
    calendar months, each month's percent change vs the previous observed
    month (NULL for the first).  lag() runs over the ~80-row aggregate,
    never the fact table; the quotient divides two doubles cast from the
    same exact DECIMAL sums, rounded once."""
    o = _t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate").cast("timestamp")).alias(
            "month"
        )
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev_d"))
    w = Window.orderBy("month")
    prev = F.lag("rev_d").over(w)
    return monthly.select(
        F.date_format("month", "yyyy-MM").alias("month"),
        F.col("rev_d").cast("double").alias("revenue"),
        F.round(
            (F.col("rev_d").cast("double") - prev.cast("double"))
            / prev.cast("double")
            * 100,
            6,
        ).alias("mom_pct"),
    ).orderBy("month")


def mutual_nn_q(spark, sf_dir):
    """Mutual nearest-neighbor mining (operators/similarity.py
    mutual_nn_pairs): (a, b) kept iff each is the other's best cosine
    neighbor among candidates >= 0.45 — the bitext/alignment-mining
    primitive. Candidates ride the exact-recall LSH equi-join
    (embedding_neardup's guarantee), argmax ranks on (round(cos,6) desc,
    neighbor id), so the DuckDB brute-force twin selects identical pairs."""
    from httrack2warc_spark.operators.similarity import mutual_nn_pairs

    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id"), F.col("embedding").cast("array<double>").alias("v")
    )
    out = mutual_nn_pairs(emb, "v", "vec_id", threshold=0.45)
    return out.orderBy("a", "b")


def dsir_select_q(spark, sf_dir):
    """DSIR importance weighting (operators/corpus.py dsir_weights): hashed-
    bigram log-ratio weights of every document against the every-23rd-doc
    target domain (the decontaminate_bench convention). The per-bucket
    log-ratio is the pipeline's only float — one fixed IEEE tree floored to
    integer micros — so doc weights are exact integer sums in both engines.
    Documents never shuffle: (id, bucket) count rows do, and the <=4096-row
    bucket table broadcast-joins back."""
    from httrack2warc_spark.operators.corpus import dsir_weights

    docs = _t(spark, sf_dir, "documents")
    target = docs.where(F.col("doc_id") % 23 == 0)
    out = dsir_weights(docs, "text", "doc_id", target, n_buckets=4096)
    return out.select("doc_id", "weight_micro").orderBy("doc_id")


def margin_mining_q(spark, sf_dir):
    """Ratio-margin pair mining (operators/similarity.py
    margin_mining_pairs, Artetxe & Schwenk): pair kept iff its cosine
    exceeds 1.05x the mean of its endpoints' k=4 best-neighbor cosines —
    the hub-suppressing refinement over mutual_nn. The 0.25 candidate floor
    (vs mutual_nn's 0.45) admits multi-member neighborhoods so the margin
    actually discriminates; because 0.25 sits below the bits=2/32-table
    exact-recall envelope documented for >= 0.45, this query doubles to
    num_tables=64 (per-pair miss (1-(1-acos(0.25)/pi)^2)^64 ~ 4e-12), so
    the bucketed candidate set equals the oracle's brute force with
    recall-envelope-grade margin, not just fixture luck. Determinism stack:
    rounded cosines -> row_number top-k -> exact DECIMAL neighborhood mean
    -> floor(margin*1e6) BIGINT."""
    from httrack2warc_spark.operators.similarity import margin_mining_pairs

    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id"), F.col("embedding").cast("array<double>").alias("v")
    )
    out = margin_mining_pairs(
        emb, "v", "vec_id", threshold=0.25, k=4, margin_threshold=1.05,
        num_tables=64,
    )
    return out.orderBy("a", "b")


def bm25_rank_q(spark, sf_dir):
    """Okapi BM25 retrieval ranking (operators/corpus.py bm25_topk): top-20
    documents for the 3-term query (customer, window, merge), k1=1.2 b=0.75.
    Only query-term token hits shuffle; N/avgdl fold to literals, the
    <=3-row document-frequency table BroadcastHashJoins back so idf
    evaluates in-plan (one action total), and each per-term contribution
    floors to integer micros — the per-doc score is an exact INTEGER sum
    in both engines."""
    from httrack2warc_spark.operators.corpus import bm25_topk

    docs = _t(spark, sf_dir, "documents")
    out = bm25_topk(
        docs, "text", "doc_id", ["customer", "window", "merge"], k=20
    )
    return out.orderBy("doc_id")


def sorted_neighborhood_q(spark, sf_dir):
    """Sorted-neighborhood dedup candidates (operators/fuzzy.py): records
    sort by a 24-char lowercased title, each compares to its next 5
    neighbours in sort order (window=6), refined by levenshtein <= 8 —
    the O(n*w), skew-immune complement to fuzzy_title_match's O(block^2)
    prefix blocking. Sort runs inside 2-char-prefix partitions (one hash
    exchange, never a global single-partition window)."""
    from httrack2warc_spark.operators.fuzzy import sorted_neighborhood_pairs

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.substring("text", 1, 24)).alias("title")
    )
    pairs = sorted_neighborhood_pairs(
        d, "doc_id", "title", window=6, max_dist=8, partition_prefix=2
    )
    return pairs.select(
        F.col("a").alias("doc_a"),
        F.col("b").alias("doc_b"),
        F.col("dist").cast("long").alias("dist"),
    ).orderBy("doc_a", "doc_b")


def classifier_score_q(spark, sf_dir):
    """Hashed linear classifier scoring (operators/corpus.py
    hashed_classifier_score): the fastText-shaped quality-filter stage —
    tokens feature-hash into 4096 md5 buckets, per-doc counts aggregate on
    narrow (id, bucket) rows, the integer micro-weight table (deterministic
    md5 stand-in for trained weights, same plan shape) broadcast-joins
    back; the logit is an exact integer sum in both engines (sigmoid is
    monotone — thresholding happens outside the value-checked surface)."""
    from httrack2warc_spark.operators.corpus import hashed_classifier_score

    docs = _t(spark, sf_dir, "documents")
    out = hashed_classifier_score(docs, "text", "doc_id", n_buckets=4096, seed=7)
    return out.orderBy("doc_id")


def count_min_q(spark, sf_dir):
    """Count-Min sketch point-frequency estimates (operators/sketches.py
    count_min_table/count_min_estimate, Cormode & Muthukrishnan 2005):
    d=4 × w=512 counter table over every document token — the mergeable
    frequency summary whose exchange carries ≤ d·w rows per partition
    however many tokens arrive. Probes are the 40 most frequent tokens
    (deterministic count-desc, token-asc tiebreak); output carries the
    exact count beside the estimate, exhibiting the one-sided guarantee
    (est ≥ truth, both engines compute the identical md5 bucket walk)."""
    from httrack2warc_spark.functions.text import word_tokens
    from httrack2warc_spark.operators.sketches import (
        count_min_estimate,
        count_min_table,
    )

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(word_tokens(F.col("text"))).alias("item"))
    truth = toks.groupBy("item").agg(F.count(F.lit(1)).alias("true_cnt"))
    probes = truth.orderBy(F.desc("true_cnt"), F.asc("item")).limit(40)
    sk = count_min_table(toks, "item", depth=4, width=512)
    est = count_min_estimate(sk, probes, "item", depth=4, width=512)
    return (
        est.join(probes, "item")
        .select("item", "true_cnt", "cm_est")
        .orderBy("item")
    )


def change_rate_q(spark, sf_dir):
    """Per-page change-rate estimation for revisit scheduling
    (operators/windows.py change_rate_estimates; Cho & Garcia-Molina
    2003): events replayed as page-observation histories (page=user_id,
    state=event_type) → bias-corrected Poisson rate
    −ln((n−X+0.5)/(n+0.5)) floored to micros, per-day scaling in pure
    BIGINT division — the refetch-priority signal of an incremental
    crawler, engine-exact."""
    from httrack2warc_spark.operators.windows import change_rate_estimates

    ev = _t(spark, sf_dir, "events")
    out = change_rate_estimates(
        ev, "user_id", "ts", "event_type", order_cols=[F.col("event_id")]
    )
    return out.orderBy("key")


def waterfill_q(spark, sf_dir):
    """Max-min fair capacity allocation (operators/topk.py
    waterfill_budgets): split a global round capacity (⅓ of total demand)
    across per-user event demands so no mega-key starves the tail —
    the budget-allocation step a cluster-wide fetch-rate cap forces on a
    crawl round. Exact integer water level; ranged prefix-sum shape (the
    K2 rotation pattern), metadata-only collects."""
    from httrack2warc_spark.operators.topk import waterfill_budgets

    ev = _t(spark, sf_dir, "events")
    demands = ev.groupBy(F.col("user_id").alias("key")).agg(
        F.count(F.lit(1)).alias("demand")
    )
    total = demands.agg(F.sum("demand")).collect()[0][0] or 0
    out = waterfill_budgets(demands, "key", "demand", int(total) // 3)
    return out.orderBy("key")


def bpe_pairs_q(spark, sf_dir):
    """BPE training iteration workload (operators/corpus.py
    bpe_pair_counts; Sennrich et al. 2016): corpus-weighted adjacent
    char-pair counts over the DISTINCT-word vocab — the token stream
    collapses to word counts once, every merge iteration is vocab-sized.
    Top-30 merge candidates, deterministic (cnt desc, pair asc) tiebreak.
    The full iterative trainer (train_bpe — driver loop, codegen
    regexp_replace merge application, zero per-row Python) is pinned to a
    pure-Python reference BPE in tests/test_corpus.py."""
    from httrack2warc_spark.functions.text import word_tokens
    from httrack2warc_spark.operators.corpus import (
        _char_syms,
        bpe_pair_counts,
    )

    docs = _t(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(word_tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(_char_syms(F.col("w")).alias("syms"), "cnt")
    )
    return (
        bpe_pair_counts(vocab, "syms", "cnt")
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(30)
    )


def ngram_containment_q(spark, sf_dir):
    """Asymmetric n-gram containment pairs (operators/dedup.py
    ngram_containment_pairs, Broder 1997): c(A→B) = |A∩B|/|A| — the
    near-superset signal a Jaccard threshold misses when a short document
    is quoted inside a long one. Threshold 0.8 on the larger direction;
    both directions ship as exact integer micros (floor of a < 2^53
    double quotient, identical in any IEEE engine). Same shingle universe
    and hot-shingle cap as ngram_jaccard."""
    from httrack2warc_spark.operators.dedup import ngram_containment_pairs

    docs = _t(spark, sf_dir, "documents")
    out = ngram_containment_pairs(
        docs, "text", "doc_id", shingle_n=3, threshold=0.8,
        max_shingle_df=1000,
    )
    return out.orderBy("a", "b")


def allpairs_jaccard_q(spark, sf_dir):
    """EXACT all-pairs Jaccard via prefix filtering (operators/dedup.py
    allpairs_jaccard_pairs; Bayardo et al. WWW'07 / PPJoin): the
    deterministic counterpart to MinHash+LSH — zero missed pairs at the
    threshold, candidate volume bounded by indexing only each doc's
    |d|−⌈t·|d|⌉+1 RAREST shingles (hot shingles structurally never enter
    the self-join). Both engines compute integer Jaccard micros, so the
    value check is exact."""
    from httrack2warc_spark.operators.dedup import allpairs_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    out = allpairs_jaccard_pairs(docs, "text", "doc_id", shingle_n=3,
                                 threshold=0.6)
    return out.orderBy("a", "b")


def substring_dedup_q(spark, sf_dir):
    """Substring-level duplication audit (operators/corpus.py
    substring_dup_spans, the ExactSubstr signal of Lee et al. 2022): per
    document, how many of its distinct 8-token windows also occur in some
    OTHER document — the curation signal for shared boilerplate/licence
    blocks that document-level MinHash misses. Pure integer counts keyed on
    the 60-bit md5 prefix (the cross-engine hash family); documents never
    shuffle, only 16-byte (span_hash, doc_id) rows."""
    from httrack2warc_spark.operators.corpus import substring_dup_spans

    docs = _t(spark, sf_dir, "documents")
    out = substring_dup_spans(docs, "text", "doc_id", window_tokens=8)
    return out.orderBy("doc_id")


def lm_quality_q(spark, sf_dir):
    """Unigram-LM quality scoring (operators/corpus.py unigram_logprob, the
    CCNet recipe with a unigram LM standing in for KenLM): every document's
    log-probability under a model trained on the every-7th-doc reference
    slice, add-0.5 smoothing, OOV = the c_ref=0 value. The per-word log-prob
    is the only float — one fixed IEEE tree floored to integer micros — so
    doc scores are exact integer sums in both engines; (sum, n_tokens) ship
    instead of the mean so no quotient rounding enters the value check."""
    from httrack2warc_spark.operators.corpus import unigram_logprob

    docs = _t(spark, sf_dir, "documents")
    ref = docs.where(F.col("doc_id") % 7 == 0)
    out = unigram_logprob(docs, "text", "doc_id", ref, alpha=0.5)
    return out.orderBy("doc_id")


def semdedup_q(spark, sf_dir):
    """Semantic dedup (operators/similarity.py semdedup, Abbas et al.
    2023): 8 deterministic md5-sampled centroids, argmax rounded-cosine
    assignment (ties to the lowest centroid rank), within-cluster cosine
    >= 0.7 to a lower-id member marks a duplicate. Clustering bounds the
    pair quadratic to n^2/k; assignment is map-only (centroid matrix folds
    into the plan), the one shuffle keys on the cluster id."""
    from httrack2warc_spark.operators.similarity import semdedup

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    out = semdedup(emb, "v", "vec_id", n_clusters=8, tau=0.7)
    return out.orderBy("vec_id")


def sq8_ann_q(spark, sf_dir):
    """Scalar-quantized int8 ANN (operators/similarity.py sq8_topk, the
    faiss SQ8 layout): per-vector symmetric quantization floor(x/max|x|*127
    + 0.5), ranking on the raw INTEGER dot product — 4x smaller resident
    index, integer multiply-adds, and scores that hash bit-for-bit (no
    float-summation order anywhere). Top-10 for the vec_id-0 query."""
    from httrack2warc_spark.operators.similarity import sq8_topk

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.where(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), F.col("v")
    )
    out = sq8_topk(emb.where(F.col("vec_id") != 0), q, "v", "vec_id", k=10)
    return out.select("vec_id", "qdot").orderBy(
        F.col("qdot").desc(), "vec_id"
    )


def url_canon_query_q(spark, sf_dir):
    """Query-string canonicalization (operators/crawlops.py
    canonicalize_query_col): the north rule's "query-string normalization"
    as a pure codegen Column — fragment stripped, empty + tracking params
    (utm_*/gclid/fbclid/...) dropped, survivors sorted and rejoined. URLs
    synthesized from doc_id residues so the DuckDB twin rebuilds the exact
    raw strings and re-runs the same split/filter/sort pipeline."""
    from httrack2warc_spark.operators.crawlops import canonicalize_query_col

    docs = _t(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("http://"), F.col("source"), F.lit(".example.com/p/"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit("?b="), (F.col("doc_id") % 7).cast("string"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("&utm_source=news")).otherwise(F.lit("")),
        F.lit("&&a="), (F.col("doc_id") % 3).cast("string"),
        F.when(F.col("doc_id") % 5 == 0, F.lit("&gclid=CjkK")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 3 == 0, F.lit("#sec")).otherwise(F.lit("")),
    )
    return docs.select(
        "doc_id", canonicalize_query_col(raw).alias("canon")
    ).orderBy("doc_id")


def trap_detect_q(spark, sf_dir):
    """Crawler-trap heuristics (operators/crawlops.py trap_signals): path
    depth, repeated-segment count and query-param explosion as one codegen
    struct, gating the frontier before the url_seen probe. Mirror-loop
    paths (`/loop/loop/...`) and calendar-CGI param blowups synthesized
    from doc_id residues; the oracle recomputes every signal with DuckDB
    list ops over the identical strings."""
    from httrack2warc_spark.operators.crawlops import trap_signals

    docs = _t(spark, sf_dir, "documents")
    m = (F.col("doc_id") * 3 % 11).cast("int")
    url = F.concat(
        F.lit("http://h"), (F.col("doc_id") % 3).cast("string"),
        F.lit(".example.com"),
        F.repeat(F.lit("/loop"), (F.col("doc_id") % 5).cast("int")),
        F.lit("/page"),
        F.when(m > 0, F.concat(F.lit("?x=1"),
                               F.repeat(F.lit("&x=1"), m - 1))).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 4 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    sig = trap_signals(url, max_depth=8, max_repeats=2, max_params=8)
    return docs.select(
        "doc_id",
        sig["path_depth"].alias("path_depth"),
        sig["repeated_segments"].alias("repeated_segments"),
        sig["n_params"].alias("n_params"),
        sig["is_trap"].alias("is_trap"),
    ).orderBy("doc_id")


def retry_backoff_q(spark, sf_dir):
    """Fetch-retry scheduling (operators/crawlops.py retry_schedule): capped
    exponential backoff, min(30 << attempt, 86400) seconds, plus
    deterministic md5 jitter mod 60 on url:attempt — exact BIGINT
    microseconds end-to-end (unix_micros == epoch_us bit-for-bit, build
    notes), so a resumed crawl and the DuckDB twin recompute the identical
    schedule."""
    from httrack2warc_spark.operators.crawlops import retry_schedule

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.concat(F.lit("http://h"), (F.col("user_id") % 20).cast("string"),
                 F.lit(".ex.com/"), F.col("event_id").cast("string")).alias("url"),
        (F.col("event_id") % 12).cast("int").alias("attempt"),
        F.col("ts").alias("last_ts"),
    )
    out = retry_schedule(ev, base_s=30, cap_s=86_400, jitter_mod_s=60)
    return out.select("event_id", "delay_s", "next_us").orderBy("event_id")


def aspect_buckets_q(spark, sf_dir):
    """Aspect-ratio bucketing for image-training batch assembly
    (operators/crawlops.py assign_aspect_buckets): nearest-AR bucket by
    exact cross-multiplied integer argmin |w*d - h*n|*(S/d) folded over a
    literal bucket array — map-only, no explode, no per-image window.
    (w, h) synthesized from doc_id residues; per-bucket image counts +
    target train dims."""
    from httrack2warc_spark.operators.crawlops import assign_aspect_buckets

    imgs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (F.lit(64) + (F.col("doc_id") % 29) * 16).cast("int").alias("w"),
        (F.lit(64) + (F.col("doc_id") * 7 % 31) * 16).cast("int").alias("h"),
    )
    out = assign_aspect_buckets(imgs, "w", "h", base=64)
    return (
        out.groupBy("bucket_n", "bucket_d", "target_w", "target_h")
        .agg(F.count(F.lit(1)).alias("n_images"))
        .orderBy("bucket_n", "bucket_d")
    )


def link_predict_q(spark, sf_dir):
    """Link prediction by exact common-neighbor counts (operators/graph.py
    common_neighbor_scores): non-adjacent distance-2 pairs of a 1500-node
    circulant graph C(1,3)+chord, with (common, deg_a, deg_b) shipped as
    the integer parts of the exact Jaccard — no float in the result. The
    wedge self-join's hub fan-out bound (max_center_degree, the
    max_shingle_df pattern) is the web-scale guard; here the graph is
    near-regular so the unbounded run is exact."""
    from httrack2warc_spark.operators.graph import common_neighbor_scores

    n = 1500
    r = spark.range(n)
    raw = (
        r.select(F.col("id").alias("x"), ((F.col("id") + 1) % n).alias("y"))
        .unionAll(r.select(F.col("id").alias("x"), ((F.col("id") + 3) % n).alias("y")))
        .unionAll(
            r.select(F.col("id").alias("x"), ((F.col("id") * 5 + 2) % n).alias("y"))
        )
    )
    return common_neighbor_scores(raw, "x", "y", min_common=2).orderBy("a", "b")


def sitemap_parse_q(spark, sf_dir):
    """Sitemap ingestion (operators/crawlops.py sitemap_locs, wired into the
    scheduler as CrawlConfig.discover_sitemaps): synthesize a <urlset> XML
    body per document (1-4 entity-escaped, whitespace-padded <loc> entries
    from doc_id residues), parse it back with the production extractor
    (regexp_extract_all + XML-entity decode), posexplode to (pos, loc).
    The oracle never parses: it regenerates each (doc_id, pos, loc) from
    first principles, so the check is that parsing round-trips construction
    exactly — order, trimming, and entity decoding included."""
    from httrack2warc_spark.operators.crawlops import sitemap_locs

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    entries = F.transform(
        F.sequence(F.lit(0).cast("long"), d % 4),
        lambda e: F.concat(
            F.lit("<url><loc> http://s"), (d % 5).cast("string"),
            F.lit(".ex.com/p/"), ((d * 7 + e) % 97).cast("string"),
            F.lit("?a=1&amp;b="), e.cast("string"),
            F.lit(" </loc></url>"),
        ),
    )
    body = F.concat(
        F.lit('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'),
        F.array_join(entries, ""),
        F.lit("</urlset>"),
    )
    return (
        docs.select("doc_id", F.posexplode(sitemap_locs(body)).alias("pos", "loc"))
        .orderBy("doc_id", "pos")
    )


def image_batches_q(spark, sf_dir):
    """Training-batch packing (operators/crawlops.py pack_image_batches):
    aspect-bucketed images ranked within bucket by the RANGED global-seq
    primitive (no per-bucket window funnel — 7 buckets would mean 7
    reducers for 10^10 images), batch_idx = rank DIV 16, incomplete tail
    batches dropped. Per-batch counts + id span; the oracle recomputes the
    rank with a row_number window (exact at oracle scale)."""
    from httrack2warc_spark.operators.crawlops import (
        assign_aspect_buckets,
        pack_image_batches,
    )

    imgs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (F.lit(64) + (F.col("doc_id") % 29) * 16).cast("int").alias("w"),
        (F.lit(64) + (F.col("doc_id") * 7 % 31) * 16).cast("int").alias("h"),
    )
    packed = pack_image_batches(
        assign_aspect_buckets(imgs, "w", "h", base=64),
        batch_size=16,
        order_cols=("doc_id",),
        drop_last=True,
    )
    return (
        packed.groupBy("bucket_n", "bucket_d", "batch_idx")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.min("doc_id").alias("first_id"),
            F.max("doc_id").alias("last_id"),
        )
        .orderBy("bucket_n", "bucket_d", "batch_idx")
    )


def image_patches_q(spark, sf_dir):
    """ViT patch extraction VALUE-CHECKED: the generator emits row-major
    per-patch means computed by an independent reshape-and-sum formulation
    (synth.py exp_patch) at generation time; the query runs the real
    decode → mapInPandas patchify kernel (per-tile ndarray.mean) and
    compares each of the 64 images' 2×2 grid — a 256-row constant table
    the DuckDB oracle states exactly, so codec round-trip + Arrow plumbing
    + the patch-grid arithmetic are all on the hash."""
    from httrack2warc_spark.frontier.synth import generate_images
    from httrack2warc_spark.functions.images import patchify_images

    imgs = generate_images(spark, 64, w=16, h=16, expected_patch=8)
    out = patchify_images(imgs.select("image_id", "bytes", "fmt"), patch=8)
    exp = imgs.select("image_id", "exp_patch")
    joined = out.join(F.broadcast(exp), "image_id")
    mean_ok = (
        F.abs(
            F.col("p_mean")
            - F.element_at(
                "exp_patch", F.col("patch_row") * 2 + F.col("patch_col") + 1
            )
        )
        < 1e-9
    )
    return (
        joined.where(F.col("decoded"))
        .select(
            "image_id", "patch_row", "patch_col", mean_ok.alias("mean_ok")
        )
        .orderBy("image_id", "patch_row", "patch_col")
    )


def blocklist_filter_q(spark, sf_dir):
    """Domain-hierarchy blocklist gate: synthetic hosts
    sub{id%7}.site{id%11}.com are filtered against a blocklist that names
    one registrable domain (site3.com — must block every subdomain), one
    exact deep host (sub2.site5.com — must block only that subdomain) and
    one miss (site99.com). Suffix-explode + equi-join, never an endswith
    nested loop. The value hash pins the suffix chain and the hierarchy
    semantics."""
    from httrack2warc_spark.operators.crawlops import domain_blocklist_filter

    docs = _t(spark, sf_dir, "documents")
    hosts = docs.select(
        "doc_id",
        F.concat(
            F.lit("sub"), (F.col("doc_id") % 7).cast("string"),
            F.lit(".site"), (F.col("doc_id") % 11).cast("string"),
            F.lit(".com"),
        ).alias("host"),
    )
    rules = spark.createDataFrame(
        [("site3.com",), ("sub2.site5.com",), ("site99.com",)],
        "domain string",
    )
    out = domain_blocklist_filter(hosts, "host", rules)
    return out.select("doc_id", "host").orderBy("doc_id")


def epoch_shuffle_q(spark, sf_dir):
    """Deterministic training-epoch permutation: dense global rank in md5
    draw order over (doc_id, seed, epoch), stamped via the RANGED
    global-sequence primitive (range exchange + per-partition row_number +
    offset map — never a single-partition window). The value hash pins the
    whole permutation — any partitioning drift, draw drift or off-by-one
    in the ranged offsets flips it."""
    from httrack2warc_spark.operators.corpus import epoch_shuffle

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    out = epoch_shuffle(docs, "doc_id", epoch=2, seed=9, mode="ranged")
    return out.select("rank", "doc_id").orderBy("rank")


def incremental_dedup_q(spark, sf_dir):
    """Cross-set incremental dedup — which documents of a NEW batch
    near-duplicate the kept REFERENCE corpus: a fifth of the new batch
    repeats a reference text verbatim (J = 1), a fifth appends one token
    (J just under 1), the rest reverse their word order (3-gram Jaccard
    collapses). Exact-recall parameterization (32 bands × 1 row: per-pair
    miss ≤ 2^-32 at J ≥ 0.5) + exact Jaccard verify ⇒ the result equals
    all-pairs CROSS Jaccard ≥ 0.5, which the oracle computes directly.
    Returns every (new_id, ref_id, jaccard) pair rounded to 6."""
    from httrack2warc_spark.functions.text import word_tokens
    from httrack2warc_spark.operators.dedup import minhash_cross_pairs

    docs = _t(spark, sf_dir, "documents")
    ref = docs.select("doc_id", "text")
    new = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.when(F.col("doc_id") % 5 == 0, F.col("text"))
        .when(
            F.col("doc_id") % 5 == 1,
            F.concat(F.col("text"), F.lit(" extra trailing token")),
        )
        .otherwise(
            F.concat_ws(" ", F.reverse(word_tokens(F.col("text"))))
        )
        .alias("text"),
    )
    pairs = minhash_cross_pairs(
        new, ref, "text", "doc_id",
        num_hashes=32, bands=32, rows_per_band=1, threshold=0.5,
    )
    return pairs.select(
        "new_id", "ref_id", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("new_id", "ref_id")


def ingest_pipeline_q(spark, sf_dir):
    """End-to-end web-ingest composition — the full path from fetched HTML
    to training chunks, each stage an already-value-checked operator:
    html_to_text (regexp chain) → ≥10-token quality gate → exact
    first-occurrence dedup on the extracted body (the generator plants
    exact-duplicate documents; dedup keys on the STRING here so the oracle
    joins byte-for-byte — production keys on xxhash64, see exact_dedup) →
    deterministic 0.8 sample → 32/8 sliding-window chunking. The value
    hash pins every stage boundary and their composition order."""
    from httrack2warc_spark.functions.text import html_to_text, token_count
    from httrack2warc_spark.operators.corpus import (
        chunk_documents,
        deterministic_sample,
    )
    from httrack2warc_spark.operators.dedup import first_occurrence

    docs = _tp(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit(' &amp; friends</title><script type="text/javascript">'
              "var x = 1 < 2;</script></head><body><p>"),
        F.col("text"),
        F.lit('</p><div class="nav">nav '),
        (F.col("doc_id") % 5).cast("string"),
        F.lit("</div><!-- hidden --></body></html>"),
    )
    # eager checkpoint: the token_count gate otherwise pushes below the
    # repartition with the whole html_to_text regexp chain SUBSTITUTED into
    # a single-task FilterExec (the build-notes FilterExec trap), and the
    # surviving rows recompute the chain again in the Project. Materializing
    # (doc_id, body) once runs the chain exactly once, full-width.
    staged = docs.select(
        "doc_id", html_to_text(html).alias("body")
    ).localCheckpoint(eager=True)
    gated = staged.where(token_count(F.col("body")) >= 10)
    deduped = first_occurrence(gated, "body", [F.col("doc_id")])
    sampled = deterministic_sample(deduped, "doc_id", 0.8, seed=11)
    chunks = chunk_documents(sampled, "body", "doc_id",
                             max_tokens=32, overlap=8)
    return chunks.select(
        "doc_id", "chunk_idx", "chunk_text", "n_tokens"
    ).orderBy("doc_id", "chunk_idx")


#: ordered merge list for the bpe_encode graded query — includes a chained
#: merge ('ta'+'b' fires only after 't'+'a') and a merge ('b','l') that the
#: earlier 'ta b' consumption must starve on "table" (order semantics).
BPE_MERGES: list[tuple[str, str]] = [
    ("i", "n"), ("e", "r"), ("t", "a"), ("ta", "b"), ("b", "l"), ("o", "w"),
    ("s", "o"), ("a", "r"),
]


def bpe_encode_q(spark, sf_dir):
    """Tokenizer APPLY (BPE segment + count) with a fixed ordered merge
    list: every word splits to BRACKETED symbols ('|t| |a| |b|') and each
    merge is one literal replace('|a| |b|', '|ab|') — the RE2-safe
    formulation whose brackets force matches to start AND end on symbol
    boundaries, making plain leftmost replace-all equal to the reference
    greedy merge-all (fuzz-verified). The value hash pins the merge ORDER
    (later merges starve on earlier consumptions — 'table' ends 'tab l e',
    never 'ta bl e'), the segmentation and the subword counts."""
    from httrack2warc_spark.operators.corpus import bpe_encode

    docs = _t(spark, sf_dir, "documents")
    return bpe_encode(docs, "text", "doc_id", BPE_MERGES).orderBy("doc_id")


def _bpe_encode_sql() -> str:
    inner = "rtrim(regexp_replace(x, '(.)', '|\\1| ', 'g'))"
    for a, b in BPE_MERGES:
        pat, rep = f"|{a}| |{b}|", f"|{a}{b}|"
        inner = f"replace({inner}, '{pat}', '{rep}')"
    inner = f"replace({inner}, '|', '')"
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(
                       regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                       x -> x <> '') AS w
            FROM documents
        ), enc AS (
            SELECT doc_id,
                   list_transform(w, x -> trim({inner})) AS e
            FROM toks
        )
        SELECT doc_id,
               array_to_string(e, ' / ') AS seg,
               CAST(coalesce(list_sum(
                   list_transform(e, x -> len(string_split(x, ' ')))), 0)
                   AS BIGINT) AS n_tokens
        FROM enc ORDER BY doc_id
    """


def html_extract_q(spark, sf_dir):
    """HTML main-content extraction — the ingest step between fetched crawl
    payloads and the documents table. Each document is wrapped in a
    deterministic HTML page (title with an entity, a script with a raw '<',
    a nav div, a comment) and run through the pure-Column regexp chain
    (functions/text.py html_to_text/html_title — RE2 ∩ Java dialect,
    documented order). The value hash pins script/head/comment stripping,
    block-tag newlines, entity decode order and whitespace collapse."""
    from httrack2warc_spark.functions.text import html_title, html_to_text

    docs = _t(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit(' &amp; friends</title><script type="text/javascript">'
              "var x = 1 < 2;</script></head><body><p>"),
        F.col("text"),
        F.lit('</p><div class="nav">nav '),
        (F.col("doc_id") % 5).cast("string"),
        F.lit("</div><!-- hidden --></body></html>"),
    )
    body = html_to_text(html)
    return docs.select(
        "doc_id",
        html_title(html).alias("title"),
        body.alias("body"),
        F.length(body).cast("long").alias("n_chars"),
    ).orderBy("doc_id")


def clip_filter_q(spark, sf_dir):
    """CLIP-score alignment gate (the LAION multimodal curation step):
    even vec_ids play image embeddings, odd vec_ids their paired caption
    embeddings; pairs whose rounded-6 cosine clears 0.1 survive. The gate
    compares the ROUNDED value (the cross-engine-stable citizen), so
    membership and the shipped score are both on the hash."""
    from httrack2warc_spark.operators.similarity import cosine_pair_filter

    emb = _t(spark, sf_dir, "embeddings")
    img = emb.where(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("pair_id"),
        F.col("embedding").cast("array<double>").alias("img_vec"),
    )
    cap = emb.where(F.col("vec_id") % 2 == 1).select(
        (F.col("vec_id") - 1).alias("pair_id"),
        F.col("embedding").cast("array<double>").alias("cap_vec"),
    )
    pairs = img.join(cap, "pair_id")
    out = cosine_pair_filter(pairs, "img_vec", "cap_vec", threshold=0.1)
    return out.select("pair_id", "cos_sim_r").orderBy("pair_id")


def winnow_fp_q(spark, sf_dir):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken SIGMOD'03,
    the MOSS algorithm): hash every 3-word shingle, slide a 4-wide window
    over the hash sequence, keep each window's minimum with the rightmost-
    on-ties rule. Selection is restated engine-neutrally as an integer MIN
    over packed ``hash*2^24 + (2^24-1-pos)`` bigints, so the value hash
    pins the md5 hash family, the packing, the window minimum, the tie
    rule and the short-document whole-doc fallback — computed array-side
    in Spark (zero shuffle) and via a ROWS window in the oracle."""
    from httrack2warc_spark.operators.dedup import winnow_fingerprints

    docs = _t(spark, sf_dir, "documents")
    out = winnow_fingerprints(docs, "text", "doc_id", shingle_n=3, window=4)
    return out.orderBy("doc_id", "pos")


def winnow_overlap_q(spark, sf_dir):
    """MOSS-style local-overlap candidates: docs with doc_id % 50 == 0 get
    an identical 9-word passage appended (a shared run of ≥ k+w−1 = 6 words
    guarantees a shared fingerprint), then pairs sharing ≥2 distinct
    winnowing fingerprints are returned with exact integer parts
    (n_shared, n_a, n_b); fingerprints in more than 100 documents are
    dropped before the join (the hot-key cap — engaged here by the corpus's
    own hot boilerplate shingles). The value hash pins fingerprint
    generation, the distinct rule, the cap and the pair counts."""
    from httrack2warc_spark.operators.dedup import winnow_overlap_pairs

    docs = _t(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 50 == 0,
            F.concat(
                F.col("text"),
                F.lit(" copied passage alpha beta gamma delta epsilon zeta eta theta"),
            ),
        ).otherwise(F.col("text")).alias("text"),
    )
    out = winnow_overlap_pairs(
        aug, "text", "doc_id",
        shingle_n=3, window=4, min_shared=2, max_fp_df=100,
    )
    return out.orderBy("a", "b")


def mixture_sample_q(spark, sf_dir):
    """Domain-mixture resampling (Pile/DoReMi-style static mixing): derive
    the retention-maximal per-domain keep rates that hit target shares
    45/35/20 across three sources — rate_d = C*p_d/n_d with
    C = min_d(n_d/p_d), so the binding domain is kept whole — then keep
    rows whose md5 draw clears the 2^32-scaled floor threshold. The value
    hash pins the derived thresholds (fixed-shape IEEE over per-domain
    counts), the draw family and exact membership."""
    from httrack2warc_spark.operators.corpus import mixture_sample

    docs = _t(spark, sf_dir, "documents")
    out = mixture_sample(
        docs, "doc_id", "source",
        {"src0": 0.45, "src1": 0.35, "src2": 0.2}, seed=7,
    )
    return out.select("doc_id", "source").orderBy("doc_id")


def phrase_search_q(spark, sf_dir):
    """Exact positional phrase search over a positional posting list: each
    document is suffixed with two planted occurrences of the 3-gram
    "data line join" (natural hits also count), and the operator returns
    every 1-based anchor position via slot-voting — posting for phrase
    slot j at word position p votes anchor p-(j-1); anchors with all 3
    distinct slot votes match. Tokens filter to the phrase vocabulary
    before the only shuffle (O(hits), never O(tokens)). The value hash
    pins tokenization, the anchor arithmetic and the distinct-slot rule."""
    from httrack2warc_spark.operators.corpus import phrase_search

    docs = _t(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" padding data line join mid data line join"),
        ).alias("text"),
    )
    out = phrase_search(aug, "text", "doc_id", ["data", "line", "join"])
    return out.orderBy("doc_id", "pos")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q1_pricing_summary": q1_pricing_summary,
        "q3_top_orders": q3_top_orders,
        "q5_local_volume": q5_local_volume,
        "q18_large_orders": q18_large_orders,
        "q21_sole_blame": q21_sole_blame_q,
        "asof_join": asof_join_q,
        "pagerank": pagerank_q,
        "rollup_revenue": rollup_revenue_q,
        "median_value": median_value_q,
        "pivot_counts": pivot_counts_q,
        "set_ops": set_ops_q,
        "running_total": running_total_q,
        "ordinal_fifo_join": ordinal_fifo_join_q,
        "first_occurrence": first_occurrence_q,
        "politeness_topk": politeness_topk_q,
        "salted_topk": salted_topk_q,
        "date_wraparound": date_wraparound_q,
        "anti_join_unseen": anti_join_unseen_q,
        "bloom_gated_antijoin": bloom_gated_antijoin_q,
        "exact_dedup": exact_dedup_q,
        "sessionize": sessionize_q,
        "token_count": token_count_q,
        "quality_score": quality_score_q,
        "quality_full": quality_full_q,
        "lang_id": lang_id_q,
        "mime_resolution": mime_resolution_q,
        "strip_protocol": strip_protocol_q,
        "embedding_topk": embedding_topk_q,
        "ngram_jaccard": ngram_jaccard_q,
        "ivf_ann": ivf_ann_q,
        "minhash_neardup": minhash_neardup_q,
        "simhash_neardup": simhash_neardup_q,
        "lsh_ann": lsh_ann_q,
        "phash_neardup": phash_neardup_q,
        "image_invariant": image_invariant_q,
        "image_resize": image_resize_q,
        "image_features": image_features_q,
        "frame_sample": frame_sample_q,
        "audio_features": audio_features_q,
        "audio_windows": audio_windows_q,
        "warc_roundtrip": warc_roundtrip_q,
        "warc_payload_dedup": warc_payload_dedup_q,
        "embedding_neardup": embedding_neardup_q,
        "dedup_components": dedup_components_q,
        "clean_corpus": clean_corpus_q,
        "header_surgery": header_surgery_q,
        "percent_codecs": percent_codecs_q,
        "cdx_format": cdx_format_q,
        "url_host": url_host_q,
        "frontier_crawl": frontier_crawl_q,
        "frontier_bfs": frontier_bfs_q,
        "frontier_bfs_batched": frontier_bfs_batched_q,
        "frontier_polite": frontier_polite_q,
        "doc_chunks": doc_chunks_q,
        "corpus_sample": corpus_sample_q,
        "tfidf_keywords": tfidf_keywords_q,
        "mutual_nn": mutual_nn_q,
        "margin_mining": margin_mining_q,
        "dsir_select": dsir_select_q,
        "bm25_rank": bm25_rank_q,
        "sorted_neighborhood": sorted_neighborhood_q,
        "classifier_score": classifier_score_q,
        "ngram_containment": ngram_containment_q,
        "allpairs_jaccard": allpairs_jaccard_q,
        "count_min": count_min_q,
        "bpe_pairs": bpe_pairs_q,
        "waterfill": waterfill_q,
        "change_rate": change_rate_q,
        "substring_dedup": substring_dedup_q,
        "lm_quality": lm_quality_q,
        "semdedup": semdedup_q,
        "sq8_ann": sq8_ann_q,
        "decontaminate_bench": decontaminate_bench_q,
        "paragraph_dedup": paragraph_dedup_q,
        "pack_sequences": pack_sequences_q,
        "pii_redact": pii_redact_q,
        "repetition_filter": repetition_filter_q,
        "hll_distinct": hll_distinct_q,
        "heavy_words": heavy_words_q,
        "weighted_sample": weighted_sample_q,
        "interval_join": interval_join_q,
        "image_caption_dedup": image_caption_dedup_q,
        "quantile_sketch": quantile_sketch_q,
        "q13_cust_dist": q13_cust_dist_q,
        "event_gaps": event_gaps_q,
        "asof_forward": asof_forward_q,
        "triangle_count": triangle_count_q,
        "funnel_conversion": funnel_conversion_q,
        "cohort_retention": cohort_retention_q,
        "daily_anomalies": daily_anomalies_q,
        "event_transitions": event_transitions_q,
        "stratified_weighted_sample": stratified_weighted_sample_q,
        "json_extract_agg": json_extract_agg_q,
        "cube_revenue": cube_revenue_q,
        "range_window_avg": range_window_avg_q,
        "vector_norm_stats": vector_norm_stats_q,
        "daily_counts": daily_counts_q,
        "q6_revenue_scan": q6_revenue_scan_q,
        "q4_order_priority": q4_order_priority_q,
        "q14_promo_share": q14_promo_share_q,
        "q17_small_qty": q17_small_qty_q,
        "q19_disjunctive": q19_disjunctive_q,
        "q22_lapsed_rich": q22_lapsed_rich_q,
        "q15_top_supplier": q15_top_supplier_q,
        "q2_min_cost": q2_min_cost_q,
        "q11_important_stock": q11_important_stock_q,
        "q12_priority_class": q12_priority_class_q,
        "q16_supplier_cnt": q16_supplier_cnt_q,
        "q20_excess_stock": q20_excess_stock_q,
        "listagg_sorted": listagg_sorted_q,
        "bit_bool_aggs": bit_bool_aggs_q,
        "argmax_per_group": argmax_per_group_q,
        "grouped_corr": grouped_corr_q,
        "fuzzy_title_match": fuzzy_title_match_q,
        "unpivot_metrics": unpivot_metrics_q,
        "running_distinct": running_distinct_q,
        "q7_volume_shipping": q7_volume_shipping_q,
        "q8_market_share": q8_market_share_q,
        "q9_nation_profit": q9_nation_profit_q,
        "q10_returned_items": q10_returned_items_q,
        "gaps_islands": gaps_islands_q,
        "sssp_relax": sssp_relax_q,
        "pareto_frontier": pareto_frontier_q,
        "mode_per_group": mode_per_group_q,
        "cooccurrence_pairs": cooccurrence_pairs_q,
        "basket_lift": basket_lift_q,
        "date_densify": date_densify_q,
        "locf_fill": locf_fill_q,
        "value_distribution": value_distribution_q,
        "share_of_total": share_of_total_q,
        "type_entropy": type_entropy_q,
        "curate_image_captions": curate_image_captions_q,
        "event_debounce": event_debounce_q,
        "trailing_window_count": trailing_window_count_q,
        "topk_with_ties": topk_with_ties_q,
        "weighted_median": weighted_median_q,
        "mom_growth": mom_growth_q,
        "time_weighted_avg": time_weighted_avg_q,
        "ohlc_bars": ohlc_bars_q,
        "spend_quartiles": spend_quartiles_q,
        "url_canon_query": url_canon_query_q,
        "trap_detect": trap_detect_q,
        "retry_backoff": retry_backoff_q,
        "aspect_buckets": aspect_buckets_q,
        "link_predict": link_predict_q,
        "sitemap_parse": sitemap_parse_q,
        "image_batches": image_batches_q,
        "winnow_fp": winnow_fp_q,
        "winnow_overlap": winnow_overlap_q,
        "image_patches": image_patches_q,
        "clip_filter": clip_filter_q,
        "html_extract": html_extract_q,
        "bpe_encode": bpe_encode_q,
        "ingest_pipeline": ingest_pipeline_q,
        "incremental_dedup": incremental_dedup_q,
        "epoch_shuffle": epoch_shuffle_q,
        "blocklist_filter": blocklist_filter_q,
        "mixture_sample": mixture_sample_q,
        "phrase_search": phrase_search_q,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB) — column names aligned with the Spark results
# ---------------------------------------------------------------------------


def _pagerank_sql(iterations: int = 3) -> str:
    """Unrolled power-iteration oracle (same simplified dangling-mass formula
    as operators.pagerank; fp sum-order differences vanish at round 6)."""
    steps = []
    for i in range(1, iterations + 1):
        steps.append(f"""r{i} AS (
            SELECT v.vertex,
                   (1 - 0.85) / nn.n
                   + 0.85 * COALESCE(SUM(r{i-1}.rank / deg.deg), 0) AS rank
            FROM v CROSS JOIN nn
            LEFT JOIN e ON e.t = v.vertex
            LEFT JOIN r{i-1} ON r{i-1}.vertex = e.s
            LEFT JOIN deg ON deg.s = e.s
            GROUP BY v.vertex, nn.n
        )""")
    return f"""
        WITH e AS (
            SELECT DISTINCT user_id % 100 AS s,
                   (user_id * 3 + event_id) % 100 AS t
            FROM events
            WHERE user_id % 100 <> (user_id * 3 + event_id) % 100
        ), v AS (
            SELECT s AS vertex FROM e UNION SELECT t FROM e
        ), nn AS (SELECT count(*)::DOUBLE AS n FROM v),
        deg AS (SELECT s, count(*)::DOUBLE AS deg FROM e GROUP BY s),
        r0 AS (SELECT vertex, 1.0 / nn.n AS rank FROM v CROSS JOIN nn),
        {", ".join(steps)}
        SELECT vertex, round(rank, 6) AS rank
        FROM r{iterations} ORDER BY vertex
    """


def _sssp_sql(rounds: int = 4) -> str:
    """Unrolled Bellman-Ford oracle — the DuckDB twin of sssp_relax_q, one
    CTE per relaxation round so both engines compute the identical
    fixed-round function (no convergence test on either side)."""
    steps = []
    for i in range(1, rounds + 1):
        steps.append(f"""d{i} AS (
            SELECT vertex, min(dist) AS dist FROM (
                SELECT vertex, dist FROM d{i-1}
                UNION ALL
                SELECT ew.t AS vertex, d{i-1}.dist + ew.w AS dist
                FROM d{i-1} JOIN ew ON ew.s = d{i-1}.vertex
            ) GROUP BY vertex
        )""")
    return f"""
        WITH e AS (
            SELECT DISTINCT user_id % 100 AS s,
                   (user_id * 3 + event_id) % 100 AS t
            FROM events
            WHERE user_id % 100 <> (user_id * 3 + event_id) % 100
        ), ew AS (
            SELECT s, t, (s * 7 + t * 13) % 20 + 1 AS w FROM e
        ), d0 AS (
            SELECT CAST(0 AS BIGINT) AS vertex, CAST(0 AS BIGINT) AS dist
        ),
        {", ".join(steps)}
        SELECT vertex, dist FROM d{rounds} ORDER BY vertex
    """


def _curate_images_sql(n: int = 96) -> str:
    """Constant-table oracle for curate_image_captions_q: the generator
    arithmetic (fmt cycle, crc32 caption, every-6th clone) replayed in pure
    Python — independent of the Spark pipeline's split/array_distinct/
    window machinery — then the same three gates applied sequentially."""
    from httrack2warc_spark.functions.images import synth_caption

    fmt_cycle = ("png", "jpeg", "png", "gif")
    corpus = []
    for i in range(n):
        iid = f"img-{i}"
        cap = synth_caption(iid)
        corpus.append((iid, fmt_cycle[i % 4], cap))
        if i % 6 == 0:
            corpus.append((f"{iid}-dup", "png", cap))
    survivors = [
        (iid, fmt, cap)
        for iid, fmt, cap in corpus
        if fmt in ("png", "jpeg") and len(set(cap.split(" "))) >= 6
    ]
    first_per_caption = {}
    for iid, fmt, cap in sorted(survivors):
        first_per_caption.setdefault(cap, (iid, fmt))
    rows = sorted(
        (iid, fmt, len(cap.split(" ")), len(set(cap.split(" "))))
        for cap, (iid, fmt) in first_per_caption.items()
    )
    values = ", ".join(
        f"('{iid}', '{fmt}', {nt}, {nd})" for iid, fmt, nt, nd in rows
    )
    return f"""
        SELECT * FROM (VALUES {values})
            AS t(image_id, fmt, n_tokens, n_distinct)
        ORDER BY image_id
    """


def _mime_values_sql() -> str:
    """The FULL 1,529-entry extension table as a VALUES list (the DuckDB twin
    of the folded literal map in sources.mime.resolve_mime)."""
    from httrack2warc_spark.sources.mime import FULL_MIME

    return ", ".join(f"('{k}', '{v}')" for k, v in sorted(FULL_MIME.items()))


def _hll_oracle() -> str:
    """DuckDB twin of hll_distinct_q, emitted by the operator module itself
    (single source of truth for the register/estimate arithmetic)."""
    from httrack2warc_spark.operators.sketches import hll_oracle_sql

    return (
        hll_oracle_sql("events", "user_id", ["event_type"], p=12)
        + " ORDER BY event_type"
    )


def oracle_sql() -> dict[str, str]:
    sqls = _oracle_sqls()
    # same crawl, same graph, same oracle — only the engine's foreground
    # materialization strategy differs (fused level blocks)
    sqls["frontier_bfs_batched"] = sqls["frontier_bfs"]
    return sqls


def _oracle_sqls() -> dict[str, str]:
    return {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity) AS sum_qty,
                   sum(l_extendedprice) AS sum_base_price,
                   sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
                   sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
                   avg(l_quantity) AS avg_qty,
                   avg(l_extendedprice) AS avg_price,
                   avg(l_discount) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= DATE '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "q3_top_orders": """
            SELECT o_orderkey, o_orderdate, o_orderpriority,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY o_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, o_orderkey
            LIMIT 10
        """,
        "q5_local_volume": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
            GROUP BY n_name
            ORDER BY revenue DESC, n_name
        """,
        "q18_large_orders": """
            WITH big AS (
                SELECT l_orderkey, sum(l_quantity) AS total_qty
                FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
            )
            SELECT c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
            FROM big
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 20
        """,
        "q21_sole_blame": """
            WITH fo AS (
                SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                WHERE o_orderstatus = 'F'
            ), allp AS (
                SELECT DISTINCT l_orderkey, l_suppkey FROM fo
            ), late AS (
                SELECT DISTINCT l_orderkey, l_suppkey FROM fo
                WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
            ), blame AS (
                SELECT c.l_orderkey, c.l_suppkey FROM late c
                WHERE EXISTS (
                    SELECT 1 FROM allp p
                    WHERE p.l_orderkey = c.l_orderkey
                      AND p.l_suppkey <> c.l_suppkey)
                  AND NOT EXISTS (
                    SELECT 1 FROM late l2
                    WHERE l2.l_orderkey = c.l_orderkey
                      AND l2.l_suppkey <> c.l_suppkey)
            )
            SELECT s_suppkey, s_name, n_name, count(*) AS numwait
            FROM blame
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            GROUP BY s_suppkey, s_name, n_name
            ORDER BY numwait DESC, s_suppkey
            LIMIT 10
        """,
        "asof_join": """
            WITH views AS (
                SELECT user_id, ts AS view_ts, max(event_id) AS view_id,
                       arg_max(value, event_id) AS view_value
                FROM events WHERE event_type = 'view' GROUP BY user_id, ts
            ), clicks AS (
                SELECT event_id, user_id, ts FROM events
                WHERE event_type = 'click'
            )
            SELECT c.event_id, c.user_id, c.ts,
                   v.view_ts, v.view_id, v.view_value
            FROM clicks c ASOF LEFT JOIN views v
              ON c.user_id = v.user_id AND c.ts >= v.view_ts
            ORDER BY c.event_id
        """,
        "event_transitions": """
            WITH pairs AS (
                SELECT event_type,
                       lead(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS next_type
                FROM events
            ), counts AS (
                SELECT event_type, next_type, count(*) AS n
                FROM pairs WHERE next_type IS NOT NULL GROUP BY 1, 2
            )
            SELECT event_type, next_type, n,
                   round(CAST(n AS DOUBLE) / CAST(sum(n) OVER (
                       PARTITION BY event_type) AS DOUBLE), 6) AS p
            FROM counts ORDER BY event_type, next_type
        """,
        "daily_anomalies": """
            WITH daily AS (
                SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
                       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS x
                FROM events GROUP BY 1, 2
            ), stats AS (
                SELECT event_type, count(*) AS n,
                       CAST(sum(CAST(x AS DECIMAL(28,2))) AS DOUBLE) AS sx,
                       CAST(sum(CAST(x * x AS DECIMAL(38,4))) AS DOUBLE)
                           AS sx2
                FROM daily GROUP BY 1
            )
            SELECT event_type, day, round(x, 2) AS daily_total,
                   round((x - sx / n) / sqrt(sx2 / n - (sx / n) * (sx / n)),
                         6) AS z
            FROM daily JOIN stats USING (event_type)
            WHERE abs(round((x - sx / n)
                      / sqrt(sx2 / n - (sx / n) * (sx / n)), 6)) > 1.5
            ORDER BY event_type, day
        """,
        "cohort_retention": """
            WITH acts AS (
                SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
            ), first AS (
                SELECT user_id, min(d) AS cohort_d FROM acts GROUP BY user_id
            )
            SELECT CAST(cohort_d AS VARCHAR) AS cohort_day,
                   CAST(floor(date_diff('day', cohort_d, d) / 7.0) AS INT)
                       AS week_offset,
                   count(DISTINCT a.user_id) AS n_users
            FROM acts a JOIN first f USING (user_id)
            GROUP BY 1, 2 ORDER BY cohort_day, week_offset
        """,
        "funnel_conversion": """
            WITH purchases AS (
                SELECT user_id, ts AS p_ts, max(event_id) AS p_id
                FROM events WHERE event_type = 'purchase'
                GROUP BY user_id, ts
            ), clicks AS (
                SELECT event_id, user_id, ts FROM events
                WHERE event_type = 'click'
            ), m AS (
                SELECT c.ts, p.p_ts
                FROM clicks c ASOF LEFT JOIN purchases p
                  ON c.user_id = p.user_id AND c.ts <= p.p_ts
            )
            SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
                   count(*) AS n_clicks,
                   CAST(sum(CASE WHEN p_ts IS NOT NULL
                                  AND p_ts <= ts + INTERVAL 1 HOUR
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
                   round(sum(CASE WHEN p_ts IS NOT NULL
                                   AND p_ts <= ts + INTERVAL 1 HOUR
                             THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
                       AS conv_rate
            FROM m GROUP BY 1 ORDER BY day
        """,
        "triangle_count": """
            WITH r AS (SELECT i FROM range(2000) t(i)),
            raw AS (
                SELECT i AS x, (i + 1) % 2000 AS y FROM r
                UNION ALL SELECT i, (i + 2) % 2000 FROM r
                UNION ALL SELECT i, (7 * i + 3) % 2000 FROM r
            ),
            e AS (
                SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
                FROM raw WHERE x <> y
            ),
            tri AS (
                SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM e e1
                JOIN e e2 ON e2.a = e1.b
                JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
            )
            SELECT node, count(*) AS n_triangles FROM (
                SELECT unnest([x, y, z]) AS node FROM tri
            ) GROUP BY node ORDER BY node
        """,
        "asof_forward": """
            WITH views AS (
                SELECT user_id, ts AS view_ts, max(event_id) AS view_id,
                       arg_max(value, event_id) AS view_value
                FROM events WHERE event_type = 'view' GROUP BY user_id, ts
            ), clicks AS (
                SELECT event_id, user_id, ts FROM events
                WHERE event_type = 'click'
            )
            SELECT c.event_id, c.user_id, c.ts,
                   v.view_ts, v.view_id, v.view_value
            FROM clicks c ASOF LEFT JOIN views v
              ON c.user_id = v.user_id AND c.ts <= v.view_ts
            ORDER BY c.event_id
        """,
        "pagerank": _pagerank_sql(3),
        "median_value": """
            SELECT event_type,
                   round(quantile_cont(value, 0.5), 6) AS p50,
                   round(quantile_cont(value, 0.9), 6) AS p90,
                   count(*) AS n
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "pivot_counts": """
            SELECT (user_id % 10)::INT AS bucket,
                   count(*) FILTER (event_type = 'click') AS click,
                   count(*) FILTER (event_type = 'view') AS view,
                   count(*) FILTER (event_type = 'purchase') AS purchase
            FROM events GROUP BY 1 ORDER BY bucket
        """,
        "set_ops": """
            WITH big AS (
                SELECT DISTINCT o_custkey AS c_custkey FROM orders
                WHERE o_totalprice > 200000
            ), building AS (
                SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
            )
            SELECT c_custkey, 'both' AS tag
            FROM (SELECT * FROM big INTERSECT SELECT * FROM building)
            UNION ALL
            SELECT c_custkey, 'only_big' AS tag
            FROM (SELECT * FROM big EXCEPT ALL SELECT * FROM building)
            ORDER BY tag, c_custkey
        """,
        "rollup_revenue": """
            SELECT COALESCE(r_name, 'ALL') AS region,
                   COALESCE(n_name, 'ALL') AS nation,
                   round(sum(o_totalprice), 2) AS revenue,
                   count(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY ROLLUP (r_name, n_name)
            ORDER BY region, nation
        """,
        "running_total": """
            SELECT o_custkey, o_orderkey,
                   round(sum(o_totalprice) OVER (
                       PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                       AS running_spend
            FROM orders ORDER BY o_custkey, o_orderkey
        """,
        "ordinal_fifo_join": """
            WITH clicks AS (
                SELECT user_id, event_id AS click_id,
                       row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
                FROM events WHERE event_type = 'click'
            ), purchases AS (
                SELECT user_id, event_id AS purchase_id,
                       row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
                FROM events WHERE event_type = 'purchase'
            )
            SELECT c.user_id, c.click_id, p.purchase_id
            FROM clicks c LEFT JOIN purchases p USING (user_id, rn)
            ORDER BY c.user_id, c.click_id
        """,
        "first_occurrence": """
            SELECT user_id, event_id, event_type FROM (
                SELECT user_id, event_id, event_type,
                       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
                FROM events
            ) WHERE rn = 1
        """,
        "politeness_topk": """
            SELECT o_custkey, o_orderkey, o_totalprice FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       row_number() OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey
                       ) AS rn
                FROM orders
            ) WHERE rn <= 3
        """,
        "salted_topk": """
            SELECT o_custkey, o_orderkey, o_totalprice FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       row_number() OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey
                       ) AS rn
                FROM orders
            ) WHERE rn <= 3
        """,
        "date_wraparound": """
            WITH t AS (
                SELECT event_id,
                       floor(epoch(ts::TIME))::BIGINT AS secs
                FROM events
            ), w AS (
                SELECT event_id, secs,
                       CASE WHEN secs < lag(secs) OVER (ORDER BY event_id)
                            THEN 1 ELSE 0 END AS wrapped
                FROM t
            )
            SELECT event_id,
                   DATE '2024-01-01'
                   + to_days((sum(wrapped) OVER (ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::INT)
                   + to_seconds(secs::BIGINT) AS derived_ts
            FROM w
        """,
        "anti_join_unseen": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (
                SELECT 1 FROM orders
                WHERE o_custkey = c_custkey AND o_totalprice > 150000
            )
        """,
        "bloom_gated_antijoin": """
            SELECT DISTINCT user_id FROM events
            WHERE user_id NOT IN (
                SELECT user_id FROM events
                WHERE event_type = 'purchase' AND value > 180
            )
            ORDER BY user_id
        """,
        "exact_dedup": """
            SELECT doc_id, n_chars FROM (
                SELECT doc_id, n_chars,
                       row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
                FROM documents
            ) WHERE rn = 1
        """,
        "sessionize": """
            WITH g AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN epoch(ts) - epoch(lag(ts) OVER
                                (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                            OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                               IS NULL
                            THEN 1 ELSE 0 END AS newsess
                FROM events
            ), s AS (
                SELECT user_id,
                       sum(newsess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
                FROM g
            )
            SELECT user_id, max(session_no)::BIGINT AS n_sessions,
                   count(*)::BIGINT AS n_events
            FROM s GROUP BY user_id ORDER BY user_id
        """,
        "token_count": r"""
            SELECT doc_id,
                   len(list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                                   x -> x <> '')) AS n_tokens
            FROM documents ORDER BY doc_id
        """,
        "quality_score": r"""
            WITH toks AS (
                SELECT doc_id, text,
                       list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                                   x -> x <> '') AS w
                FROM documents
            )
            SELECT doc_id,
                   round(CASE WHEN len(w) > 0 THEN
                       len(list_filter(w, x -> list_contains(
                           ['the','and','of','to','in','is','that','for','with','a'], x)))
                       / len(w)::DOUBLE ELSE 0.0 END, 6) AS stop_ratio,
                   round(CASE WHEN length(text) > 0 THEN
                       (length(text) - length(regexp_replace(text, '[^0-9a-zA-Z_ \t\n\r]',
                        '', 'g')))::DOUBLE / length(text) ELSE 0.0 END, 6) AS punct_ratio
            FROM toks ORDER BY doc_id
        """,
        "mime_resolution": f"""
            WITH mimes(ext, mime_by_ext) AS (VALUES {_mime_values_sql()}),
            d AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 2 = 0 THEN 'text/x-given' END AS mime_in,
                       'site/' || source ||
                           ({_MIME_EXTS!r})[(doc_id % {len(_MIME_EXTS)} + 1)::INT]
                           AS filename
                FROM documents
            )
            SELECT doc_id,
                   COALESCE(
                       CASE WHEN mime_in IS NOT NULL AND mime_in <> ''
                            THEN mime_in END,
                       m.mime_by_ext,
                       'application/octet-stream') AS mime
            FROM d LEFT JOIN mimes m
              ON m.ext = lower(regexp_extract(filename, '([^.]*)$', 1))
            ORDER BY doc_id
        """,
        "strip_protocol": """
            SELECT doc_id,
                   regexp_replace(
                       (CASE WHEN doc_id % 2 = 0 THEN 'http://' ELSE 'https://' END)
                       || source || '.example.com/doc/' || doc_id,
                       '^https?://', '') AS url_key
            FROM documents ORDER BY doc_id
        """,
        "embedding_topk": """
            WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[], qv::DOUBLE[]), 6)
                       AS cos_sim
            FROM embeddings, q
            WHERE vec_id <> 0
            ORDER BY cos_sim DESC, vec_id
            LIMIT 10
        """,
        "ngram_jaccard": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(
                           string_split_regex(
                               trim(regexp_replace(lower(text), '[^\w\s]+', ' ', 'g')),
                               '\s+'),
                           x -> x <> '') AS w
                FROM documents
            ), sh AS (
                SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
                FROM toks, UNNEST(generate_series(1, greatest(len(w) - 2, 0))) AS t(i)
                WHERE len(w) >= 3
            ), sizes AS (
                SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
            ), inter AS (
                SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
                FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
                GROUP BY 1, 2
            )
            SELECT a, b,
                   round(i::DOUBLE / (sa.n + sb.n - i), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = a
            JOIN sizes sb ON sb.doc_id = b
            WHERE i::DOUBLE / (sa.n + sb.n - i) >= 0.5
            ORDER BY a, b
        """,
        "quality_full": r"""
            WITH toks AS (
                SELECT doc_id, text,
                       list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                                   x -> x <> '') AS w
                FROM documents
            ), m AS (
                SELECT doc_id, text, len(w) AS n_tok,
                       len(list_filter(w, x -> list_contains(
                           ['the','and','of','to','in','is','that','for','with','a'],
                           x))) AS n_stop
                FROM toks
            )
            SELECT doc_id,
                   round(
                       (CASE WHEN n_tok BETWEEN 10 AND 100000 THEN 0.4 ELSE 0.0 END)
                       + least((CASE WHEN n_tok > 0
                                     THEN n_stop::DOUBLE / n_tok ELSE 0.0 END) * 4, 0.4)
                       + (0.2 - least((CASE WHEN length(text) > 0 THEN
                           (length(text) - length(regexp_replace(text,
                               '[^0-9a-zA-Z_ \t\n\r]', '', 'g')))::DOUBLE
                           / length(text) ELSE 0.0 END) * 2, 0.2)), 6) AS quality
            FROM m ORDER BY doc_id
        """,
        "lang_id": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                                   x -> x <> '') AS w
                FROM documents
            ), counts AS (
                SELECT doc_id,
                       len(list_filter(w, x -> list_contains(
                           ['der','die','das','und','ist','nicht','ein','mit','für','von'],
                           x))) AS n_de,
                       len(list_filter(w, x -> list_contains(
                           ['the','and','of','to','in','is','that','for','with','a'],
                           x))) AS n_en,
                       len(list_filter(w, x -> list_contains(
                           ['el','la','los','y','es','no','una','por','que','con'],
                           x))) AS n_es,
                       len(list_filter(w, x -> list_contains(
                           ['le','la','les','et','est','pas','une','pour','que','dans'],
                           x))) AS n_fr
                FROM toks
            )
            SELECT doc_id,
                   CASE WHEN greatest(n_de, n_en, n_es, n_fr) = 0 THEN 'und'
                        WHEN n_de >= n_en AND n_de >= n_es AND n_de >= n_fr THEN 'de'
                        WHEN n_en >= n_es AND n_en >= n_fr THEN 'en'
                        WHEN n_es >= n_fr THEN 'es'
                        ELSE 'fr' END AS lang_guess
            FROM counts ORDER BY doc_id
        """,
        "embedding_neardup": """
            WITH v AS (
                SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
            )
            SELECT x.vec_id AS a, y.vec_id AS b,
                   round(list_cosine_similarity(x.e, y.e), 6) AS cosine
            FROM v x JOIN v y ON x.vec_id < y.vec_id
            WHERE round(list_cosine_similarity(x.e, y.e), 6) >= 0.45
            ORDER BY a, b
        """,
        # image/audio/video: the Spark queries compare real-codec + Arrow
        # kernel output against expecteds computed by INDEPENDENT paths at
        # generation time (alternate numpy formulations, stdlib-wave decode,
        # straight-from-pixels phashes); the oracle states the exact
        # constant table the comparison must produce — every id present,
        # every flag true, quarantined rows false/NULL. A regression in
        # codec, plumbing or kernel flips a flag (or drops a row) and the
        # value hash breaks.
        # phash_neardup: the construction's pair arithmetic — per base
        # group {b, v1, v2, v3} with flip masks of popcount 1/2/3 at
        # disjoint positions, the pairs at hamming ≤ 3 are exactly
        # (b,v1)=1, (b,v2)=2, (b,v3)=3 and (v1,v2)=1+2=3; cross-group
        # collisions are pinned absent by the pytest fixture check.
        "phash_neardup": """
            WITH g AS (SELECT 'img-' || i::VARCHAR AS bid FROM range(48) t(i))
            SELECT a, b, hamming FROM (
                SELECT bid AS a, bid || '-v1' AS b, 1 AS hamming FROM g
                UNION ALL SELECT bid, bid || '-v2', 2 FROM g
                UNION ALL SELECT bid, bid || '-v3', 3 FROM g
                UNION ALL SELECT bid || '-v1', bid || '-v2', 3 FROM g
            ) ORDER BY a, b
        """,
        "image_invariant": """
            SELECT 'img-' || i AS image_id,
                   (['png', 'jpeg', 'png', 'gif'])[(i % 4) + 1] AS fmt
            FROM range(64) t(i) ORDER BY image_id
        """,
        "image_resize": """
            SELECT 'img-' || i AS image_id, 8::INT AS w, 8::INT AS h,
                   (['png', 'jpeg', 'png', 'gif'])[(i % 4) + 1] AS fmt
            FROM range(64) t(i) ORDER BY image_id
        """,
        "image_features": """
            SELECT 'img-' || i AS image_id,
                   (['png', 'jpeg', 'png', 'gif'])[(i % 4) + 1] AS fmt,
                   true AS decoded, true AS mean_ok, true AS std_ok,
                   true AS hist_ok, true AS phash_ok
            FROM range(64) t(i) ORDER BY image_id
        """,
        "frame_sample": """
            SELECT 'vid-' || i AS video_id, f.f::INT AS frame_idx,
                   true AS phash_ok
            FROM range(16) t(i), (SELECT UNNEST([0, 4, 8]) AS f) f
            ORDER BY video_id, frame_idx
        """,
        "audio_features": """
            SELECT * FROM (
                SELECT 'au-' || i AS audio_id, true AS decoded, true AS rms_ok,
                       true AS zcr_ok, true AS fp_ok
                FROM range(32) t(i)
                UNION ALL
                SELECT 'au-bad', false, false, false, false
            ) ORDER BY audio_id
        """,
        "audio_windows": """
            SELECT 'au-' || i AS audio_id, w.w::INT AS window_idx,
                   true AS rms_ok, true AS fp_ok
            FROM range(16) t(i), (SELECT UNNEST([0, 2, 4, 6]) AS w) w
            ORDER BY audio_id, window_idx
        """,
        "warc_roundtrip": """
            SELECT 'http://docs.example.org/' || doc_id AS url,
                   'resource' AS record_type,
                   octet_length(encode(text)) AS body_len
            FROM documents WHERE doc_id < 200 ORDER BY url
        """,
        "warc_payload_dedup": """
            SELECT doc_id::BIGINT AS seq,
                   ((doc_id * 7919) % 97)::BIGINT AS payload_group,
                   CASE WHEN doc_id > MIN(doc_id) OVER
                            (PARTITION BY (doc_id * 7919) % 97)
                        THEN 'revisit' ELSE 'response' END AS record_type
            FROM documents ORDER BY seq
        """,
        "clean_corpus": r"""
            WITH toks AS (
                SELECT doc_id, text,
                       list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                                   x -> x <> '') AS w
                FROM documents
            ), m AS (
                SELECT doc_id, text, len(w) AS n_tok,
                       len(list_filter(w, x -> list_contains(
                           ['the','and','of','to','in','is','that','for','with','a'],
                           x))) AS n_en,
                       len(list_filter(w, x -> list_contains(
                           ['der','die','das','und','ist','nicht','ein','mit','für','von'],
                           x))) AS n_de,
                       len(list_filter(w, x -> list_contains(
                           ['el','la','los','y','es','no','una','por','que','con'],
                           x))) AS n_es,
                       len(list_filter(w, x -> list_contains(
                           ['le','la','les','et','est','pas','une','pour','que','dans'],
                           x))) AS n_fr
                FROM toks
            ), scored AS (
                SELECT doc_id, text, n_tok AS n_tokens,
                       (CASE WHEN n_tok BETWEEN 10 AND 100000 THEN 0.4 ELSE 0.0 END)
                       + least((CASE WHEN n_tok > 0
                                     THEN n_en::DOUBLE / n_tok ELSE 0.0 END) * 4, 0.4)
                       + (0.2 - least((CASE WHEN length(text) > 0 THEN
                           (length(text) - length(regexp_replace(text,
                               '[^0-9a-zA-Z_ \t\n\r]', '', 'g')))::DOUBLE
                           / length(text) ELSE 0.0 END) * 2, 0.2)) AS quality,
                       CASE WHEN greatest(n_de, n_en, n_es, n_fr) = 0 THEN 'und'
                            WHEN n_de >= n_en AND n_de >= n_es AND n_de >= n_fr THEN 'de'
                            WHEN n_en >= n_es AND n_en >= n_fr THEN 'en'
                            WHEN n_es >= n_fr THEN 'es'
                            ELSE 'fr' END AS lang
                FROM m
            ), kept AS (
                SELECT doc_id, quality, n_tokens,
                       row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
                FROM scored
                WHERE lang = 'en' AND quality >= 0.5
            )
            SELECT doc_id, round(quality, 6) AS quality, n_tokens
            FROM kept WHERE rn = 1 ORDER BY doc_id
        """,
        "dedup_components": """
            WITH RECURSIVE v AS (
                SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
            ), pairs AS (
                SELECT x.vec_id AS a, y.vec_id AS b
                FROM v x JOIN v y ON x.vec_id < y.vec_id
                WHERE round(list_cosine_similarity(x.e, y.e), 6) >= 0.45
            ), edges AS (
                SELECT a AS x, b AS y FROM pairs
                UNION
                SELECT b, a FROM pairs
            ), reach(x, y) AS (
                SELECT x, y FROM edges
                UNION
                SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x
            )
            SELECT x AS node, least(x, min(y)) AS component
            FROM reach GROUP BY x ORDER BY node
        """,
        "header_surgery": r"""
            WITH h AS (
                SELECT doc_id, n_chars,
                       'HTTP/1.1 200 OK' || chr(13)||chr(10) ||
                       'Content-Length: 99999' || chr(13)||chr(10) ||
                       (['Transfer-Encoding: chunked' || chr(13)||chr(10),
                         '  transfer-ENCODING' || chr(9) || ': gzip, pizza'
                             || chr(13)||chr(10),
                         ''])[(doc_id % 3 + 1)::INT] ||
                       'Content-Type: text/html' || chr(13)||chr(10)
                           || chr(13)||chr(10) AS hdr
                FROM documents
            )
            SELECT doc_id,
                   regexp_replace(
                       regexp_replace(hdr,
                           '(?im)^[ ' || chr(9) || ']*Transfer-Encoding[ '
                               || chr(9) || ']*:.*' || chr(13)||chr(10),
                           '', 'g'),
                       '(?im)^[ ' || chr(9) || ']*Content-Length[ '
                           || chr(9) || ']*:.*' || chr(13)||chr(10),
                       'Content-Length: ' || n_chars || chr(13)||chr(10),
                       'g') AS header
            FROM h ORDER BY doc_id
        """,
        "percent_codecs": r"""
            SELECT doc_id,
                   replace(replace(replace(replace(replace(
                       'a "b' || chr(9) || 'c é\' || source || ' ' || doc_id,
                       '\', '/'), 'é', '%c3%a9'), '"', '%22'),
                       chr(9), '%09'), ' ', '%20') AS encoded,
                   replace(replace(replace(
                       'p%41q%20r~s%7E.' || source || '%zz%4',
                       '%41', 'A'), '%20', ' '), '%7E', '~') AS decoded
            FROM documents ORDER BY doc_id
        """,
        "cdx_format": """
            SELECT url || ' ' ||
                   regexp_replace(warc_date, '[-TZ:]', '', 'g') || ' ' ||
                   url || ' text/html ' || status || ' ' ||
                   COALESCE(digest, '-') || ' - - ' ||
                   n_chars || ' ' || "offset" || ' crawl-0.warc.gz' AS cdx
            FROM (
                SELECT 'http://ex.org/' || source || '/' || doc_id AS url,
                       '2020-05-04T03:02:0' || (doc_id % 10) || 'Z' AS warc_date,
                       200 + (doc_id % 2) * 101 AS status,
                       CASE WHEN doc_id % 5 <> 0 THEN 'SHA' || doc_id END AS digest,
                       doc_id * 100 AS "offset",
                       n_chars, doc_id % 3 AS sub
                FROM documents
            )
            WHERE sub IN (0, 3)
            ORDER BY cdx
        """,
        "url_host": """
            SELECT doc_id,
                   lower(regexp_extract(
                       (['http://', 'https://'])[(doc_id % 2 + 1)::INT] ||
                       (['', 'user@', 'u:p@'])[(doc_id % 3 + 1)::INT] ||
                       'WWW.' || source || '.Example.COM' ||
                       (['', ':8080'])[(doc_id % 2 + 1)::INT] ||
                       '/p/' || doc_id,
                       '^(?:https?://)?(?:[^/?#]*@)?([^/?#:]*)', 1)) AS host
            FROM documents ORDER BY doc_id
        """,
        "lsh_ann": """
            WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[], qv::DOUBLE[]), 6)
                       AS cos_sim
            FROM embeddings, q
            WHERE vec_id <> 0
            ORDER BY cos_sim DESC, vec_id
            LIMIT 10
        """,
        "ivf_ann": """
            WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
                   round(list_cosine_similarity(embedding::DOUBLE[], qv::DOUBLE[]), 6)
                       AS cos_sim
            FROM embeddings, q
            WHERE vec_id <> 0
            ORDER BY cos_sim DESC, vec_id
            LIMIT 10
        """,
        # minhash_neardup: survivors of the all-pairs exact-Jaccard ≥ 0.5 rule
        # over exact-dup representatives (engine: LSH candidates at certain
        # fixture-scale recall + exact verify — see minhash_neardup_q).
        "minhash_neardup": r"""
            WITH reps AS (
                SELECT min(doc_id) AS doc_id, text
                FROM documents GROUP BY text
            ), toks AS (
                SELECT doc_id,
                       list_filter(
                           string_split_regex(
                               trim(regexp_replace(lower(text), '[^\w\s]+', ' ', 'g')),
                               '\s+'),
                           x -> x <> '') AS w
                FROM reps
            ), sh AS (
                SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
                FROM toks, UNNEST(generate_series(1, greatest(len(w) - 2, 0))) AS t(i)
                WHERE len(w) >= 3
            ), sizes AS (
                SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
            ), losers AS (
                SELECT DISTINCT y.doc_id AS b
                FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
                GROUP BY x.doc_id, y.doc_id
                HAVING count(*)::DOUBLE /
                       ((SELECT n FROM sizes WHERE doc_id = x.doc_id)
                        + (SELECT n FROM sizes WHERE doc_id = y.doc_id)
                        - count(*)) >= 0.5
            )
            SELECT doc_id FROM reps
            WHERE doc_id NOT IN (SELECT b FROM losers)
            ORDER BY doc_id
        """,
        # simhash_neardup: identical md5-family fingerprints recomputed in SQL
        # (lower-64-bit md5 per shingle, strict-majority bit vote), survivors
        # of the all-pairs hamming ≤ 3 rule — exact because the engine's
        # pigeonhole blocking at threshold ≤ blocks−1 has exact recall.
        "simhash_neardup": r"""
            WITH reps AS (
                SELECT min(doc_id) AS doc_id, text
                FROM documents GROUP BY text
            ), toks AS (
                SELECT doc_id,
                       list_filter(
                           string_split_regex(
                               trim(regexp_replace(lower(text), '[^\w\s]+', ' ', 'g')),
                               '\s+'),
                           x -> x <> '') AS w
                FROM reps
            ), sh AS (
                -- every occurrence, NOT distinct: simhash's bit vote is
                -- frequency-weighted (the engine votes over all shingles)
                SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
                FROM toks, UNNEST(generate_series(1, greatest(len(w) - 2, 0))) AS t(i)
                WHERE len(w) >= 3
            ), h AS (
                SELECT doc_id,
                       ('0x' || substr(md5(s), 17, 8))::BIGINT AS hi,
                       ('0x' || substr(md5(s), 25, 8))::BIGINT AS lo
                FROM sh
            ), votes AS (
                SELECT r.doc_id, t.b,
                       COALESCE(SUM(CASE WHEN t.b < 32
                                         THEN (h.lo >> t.b) & 1
                                         ELSE (h.hi >> (t.b - 32)) & 1 END), 0)
                           AS ones,
                       COUNT(h.doc_id) AS n
                FROM reps r
                CROSS JOIN range(64) t(b)
                LEFT JOIN h ON h.doc_id = r.doc_id
                GROUP BY r.doc_id, t.b
            ), bits AS (
                SELECT doc_id, b,
                       CASE WHEN 2 * ones > n THEN 1 ELSE 0 END AS bit
                FROM votes
            ), pairs AS (
                SELECT x.doc_id AS a, y.doc_id AS b,
                       SUM(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END) AS ham
                FROM bits x JOIN bits y ON x.b = y.b AND x.doc_id < y.doc_id
                GROUP BY x.doc_id, y.doc_id
            ), losers AS (
                SELECT DISTINCT b FROM pairs WHERE ham <= 3
            )
            SELECT doc_id FROM reps
            WHERE doc_id NOT IN (SELECT b FROM losers)
            ORDER BY doc_id
        """,
        # frontier_bfs: the scheduler as BFS — round == hop distance from the
        # seed over the deterministic doc-graph (single host, no budget caps,
        # max_rounds=4 ⇒ depth ≤ 3); the recursive CTE recomputes min-depth
        # reachability. UNION (distinct) bounds the state to (node, depth)
        # pairs, so the cyclic graph terminates.
        "frontier_bfs": """
            WITH RECURSIVE params AS (
                SELECT count(*)::BIGINT AS n FROM documents
            ), edges AS (
                SELECT d.doc_id AS src,
                       (d.doc_id * 7 + j.j + 1) % p.n AS dst
                FROM documents d, params p,
                     (SELECT UNNEST([0, 1, 2, 3]) AS j) j
            ), bfs AS (
                SELECT 0::BIGINT AS node, 0 AS depth
                UNION
                SELECT e.dst, b.depth + 1
                FROM bfs b JOIN edges e ON e.src = b.node
                WHERE b.depth < 3
            )
            SELECT 'http://corpus.example.org/doc/' || node AS url,
                   min(depth)::INT AS round
            FROM bfs GROUP BY node ORDER BY url
        """,
        # frontier_polite: full replay of the politeness-rich scheduler.
        # State rows per iteration r: kind 'f' = frontier, 'v' = visited
        # (vround = fetch round). Each step: per-host row_number() <= 3
        # budget pick ordered by the scheduler's (priority=depth, parent_seq,
        # link_idx, url) contract, first-occurrence discovery dedup, seen-set
        # anti-join (frontier + visited nodes), leftover rows requeued.
        # parent_seq is modeled by the order-isomorphic composite
        # parent_ord = vround*1e6 + in-round rank (global seq is consecutive
        # by round, so (vround, rank) sorts identically); the final seq is
        # row_number over (vround, depth, parent_ord, link_idx, url).
        "frontier_polite": """
            WITH RECURSIVE crawl AS (
                SELECT 0 AS r, 'f' AS kind, s.node::BIGINT AS node,
                       0 AS depth, (-1)::BIGINT AS parent_ord,
                       s.idx AS link_idx, NULL::INT AS vround
                FROM (VALUES (0, 0), (1, 1)) s(node, idx)
                UNION ALL
                SELECT * FROM (
                    WITH prev AS (SELECT * FROM crawl WHERE r < 6),
                    front AS (
                        SELECT *,
                               'http://h' || (node % 2) || '.example.org/doc/'
                                   || node AS url
                        FROM prev WHERE kind = 'f'
                    ),
                    vis AS (SELECT * FROM prev WHERE kind = 'v'),
                    sel AS (
                        SELECT *, row_number() OVER (
                                   PARTITION BY node % 2
                                   ORDER BY depth, parent_ord, link_idx, url
                               ) AS hrk
                        FROM front QUALIFY hrk <= 3
                    ),
                    ranked AS (
                        SELECT *, row_number() OVER (
                                   ORDER BY depth, parent_ord, link_idx, url
                               ) AS rrk
                        FROM sel
                    ),
                    cand AS (
                        SELECT (s.node * 7 + j.j + 1)
                                   % (SELECT count(*) FROM documents) AS dst,
                               s.depth + 1 AS depth,
                               (s.r * 1000000 + s.rrk)::BIGINT AS parent_ord,
                               j.j AS link_idx, s.r AS r
                        FROM ranked s, (SELECT UNNEST([0, 1, 2, 3]) AS j) j
                    ),
                    firstc AS (
                        SELECT *, row_number() OVER (
                                   PARTITION BY dst ORDER BY parent_ord, link_idx
                               ) AS dk
                        FROM cand QUALIFY dk = 1
                    ),
                    fresh AS (
                        SELECT * FROM firstc
                        WHERE dst NOT IN (SELECT node FROM front)
                          AND dst NOT IN (SELECT node FROM vis)
                    )
                    SELECT v.r + 1, 'v', v.node, v.depth, v.parent_ord,
                           v.link_idx, v.vround
                    FROM vis v
                    UNION ALL
                    SELECT s.r + 1, 'v', s.node, s.depth, s.parent_ord,
                           s.link_idx, s.r
                    FROM sel s
                    UNION ALL
                    SELECT f.r + 1, 'f', f.node, f.depth, f.parent_ord,
                           f.link_idx, NULL::INT
                    FROM front f
                    WHERE f.node NOT IN (SELECT node FROM sel)
                    UNION ALL
                    SELECT c.r + 1, 'f', c.dst, c.depth, c.parent_ord,
                           c.link_idx, NULL::INT
                    FROM fresh c
                ) step
            ), visited AS (
                SELECT DISTINCT node, depth, parent_ord, link_idx, vround
                FROM crawl WHERE kind = 'v'
            )
            SELECT (row_number() OVER (
                        ORDER BY vround, depth, parent_ord, link_idx,
                                 'http://h' || (node % 2) || '.example.org/doc/'
                                     || node
                    ) - 1)::BIGINT AS seq,
                   'http://h' || (node % 2) || '.example.org/doc/' || node AS url,
                   'h' || (node % 2) || '.example.org' AS host,
                   depth::INT AS depth, vround::INT AS round
            FROM visited ORDER BY seq
        """,
        # frontier_crawl: robots-ON replay. generate_web(2 hosts, 40 pages,
        # out_degree 3, cross_host_every 1) is closed-form over node ids
        # 0..79 (host = node//40, page = node%40; k-ary tree edges
        # p -> 3p+1..3p+3 same host, page 0 -> page 0 of the next host at
        # link_idx 3; .gif extension when page%10=9), so the graph is
        # rebuilt from generate_series. Only host0 is seeded: host1 enters
        # via the cross edge, and the replay injects a synthetic robots.txt
        # row the first round a host is selected, cloning the trigger row's
        # (depth=priority, parent_ord, link_idx) and sorting immediately
        # before it via the robots-first flag — the scheduler's exact
        # (priority, parent_seq, link_idx, __robots, url) total order.
        # Budget 1000 never binds, so sel == frontier each round; robots
        # rows have no outlinks. parent_ord is the order-isomorphic
        # (round*1e6 + in-round page rank) composite (robots rows shift
        # absolute seq but never parent RANK: they are never parents).
        "frontier_crawl": """
            WITH RECURSIVE crawl AS (
                SELECT 0 AS r, 'f' AS kind, 0::BIGINT AS node, 0 AS depth,
                       (-1)::BIGINT AS parent_ord, 0 AS link_idx,
                       NULL::INT AS vround
                UNION ALL
                SELECT * FROM (
                    WITH prev AS (SELECT * FROM crawl WHERE r < 8),
                    edges AS (
                        SELECT i AS src, j.j AS link_idx,
                               (i // 40) * 40 + (i % 40) * 3 + j.j + 1 AS dst
                        FROM generate_series(0, 79) t(i),
                             (SELECT UNNEST([0, 1, 2]) AS j) j
                        WHERE (i % 40) * 3 + j.j + 1 < 40
                        UNION ALL
                        SELECT i, 3, (((i // 40) + 1) % 2) * 40
                        FROM generate_series(0, 79) t(i) WHERE i % 40 = 0
                    ),
                    front AS (SELECT * FROM prev WHERE kind = 'f'),
                    vis AS (SELECT * FROM prev WHERE kind = 'v'),
                    rob AS (SELECT * FROM prev WHERE kind = 'r'),
                    sel AS (
                        SELECT f.*,
                               'http://host' || (f.node // 40)
                                   || '.example.com/page/' || (f.node % 40)
                                   || CASE WHEN (f.node % 40) % 10 = 9
                                            AND f.node % 40 > 0
                                           THEN '.gif' ELSE '.html' END AS url
                        FROM front f
                    ),
                    ranked AS (
                        SELECT *, row_number() OVER (
                                   ORDER BY depth, parent_ord, link_idx, url
                               ) AS rrk
                        FROM sel
                    ),
                    newrob AS (
                        SELECT *, row_number() OVER (
                                   PARTITION BY node // 40
                                   ORDER BY depth, parent_ord, link_idx, url
                               ) AS hk
                        FROM sel s
                        WHERE s.node // 40 NOT IN
                              (SELECT v.node // 40 FROM vis v)
                        QUALIFY hk = 1
                    ),
                    cand AS (
                        SELECT e.dst, s.depth + 1 AS depth,
                               (s.r * 1000000 + s.rrk)::BIGINT AS parent_ord,
                               e.link_idx, s.r AS r
                        FROM ranked s JOIN edges e ON e.src = s.node
                    ),
                    firstc AS (
                        SELECT *, row_number() OVER (
                                   PARTITION BY dst ORDER BY parent_ord, link_idx
                               ) AS dk
                        FROM cand QUALIFY dk = 1
                    ),
                    fresh AS (
                        SELECT * FROM firstc
                        WHERE dst NOT IN (SELECT node FROM front)
                          AND dst NOT IN (SELECT node FROM vis)
                    )
                    SELECT v.r + 1, 'v', v.node, v.depth, v.parent_ord,
                           v.link_idx, v.vround
                    FROM vis v
                    UNION ALL
                    SELECT b.r + 1, 'r', b.node, b.depth, b.parent_ord,
                           b.link_idx, b.vround
                    FROM rob b
                    UNION ALL
                    SELECT s.r + 1, 'v', s.node, s.depth, s.parent_ord,
                           s.link_idx, s.r
                    FROM sel s
                    UNION ALL
                    SELECT n.r + 1, 'r', n.node, n.depth, n.parent_ord,
                           n.link_idx, n.r
                    FROM newrob n
                    UNION ALL
                    SELECT c.r + 1, 'f', c.dst, c.depth, c.parent_ord,
                           c.link_idx, NULL::INT
                    FROM fresh c
                ) step
            ), visited AS (
                SELECT DISTINCT kind, node, depth, parent_ord, link_idx, vround
                FROM crawl WHERE kind IN ('v', 'r')
            ), rows_out AS (
                SELECT *,
                       CASE WHEN kind = 'r' THEN 0 ELSE 1 END AS pageflag,
                       CASE WHEN kind = 'r'
                            THEN 'http://host' || (node // 40)
                                 || '.example.com/robots.txt'
                            ELSE 'http://host' || (node // 40)
                                 || '.example.com/page/' || (node % 40)
                                 || CASE WHEN (node % 40) % 10 = 9
                                          AND node % 40 > 0
                                         THEN '.gif' ELSE '.html' END
                       END AS url
                FROM visited
            )
            SELECT (row_number() OVER (
                        ORDER BY vround, depth, parent_ord, link_idx,
                                 pageflag, url
                    ) - 1)::BIGINT AS seq,
                   url,
                   'host' || (node // 40) || '.example.com' AS host,
                   depth::INT AS depth, vround::INT AS round,
                   (kind = 'r') AS is_robots
            FROM rows_out ORDER BY seq
        """,
        # doc_chunks: sliding windows of 40 tokens, stride 32 (overlap 8);
        # window count 1 + ceil(max(n-40,0)/32); DuckDB list slice clamps
        # like Spark's slice().
        "doc_chunks": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                                   x -> x <> '') AS w
                FROM documents
            ), sized AS (
                SELECT doc_id, w, len(w) AS n,
                       CASE WHEN len(w) > 0
                            THEN 1 + CAST(floor((greatest(len(w) - 40, 0) + 31) / 32)
                                          AS INT)
                            ELSE 0 END AS n_chunks
                FROM toks
            ), idx AS (
                SELECT doc_id, w, n, UNNEST(range(0, n_chunks)) AS chunk_idx
                FROM sized
            )
            SELECT doc_id, chunk_idx::INT AS chunk_idx,
                   array_to_string(w[chunk_idx * 32 + 1 : chunk_idx * 32 + 40], ' ')
                       AS chunk_text,
                   least(40, n - chunk_idx * 32)::INT AS n_tokens
            FROM idx ORDER BY doc_id, chunk_idx
        """,
        # corpus_sample: md5-family stratified sampling — draw = upper 32
        # digest bits of 'doc_id:42', kept iff under the language's rate;
        # the lang CTE is the lang_id oracle verbatim.
        "corpus_sample": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                                   x -> x <> '') AS w
                FROM documents
            ), counts AS (
                SELECT doc_id,
                       len(list_filter(w, x -> list_contains(
                           ['der','die','das','und','ist','nicht','ein','mit','für','von'],
                           x))) AS n_de,
                       len(list_filter(w, x -> list_contains(
                           ['the','and','of','to','in','is','that','for','with','a'],
                           x))) AS n_en,
                       len(list_filter(w, x -> list_contains(
                           ['le','la','les','et','est','pas','une','pour','que','dans'],
                           x))) AS n_fr,
                       len(list_filter(w, x -> list_contains(
                           ['el','la','los','y','es','no','una','por','que','con'],
                           x))) AS n_es
                FROM toks
            ), langs AS (
                SELECT doc_id,
                       CASE WHEN greatest(n_de, n_en, n_es, n_fr) = 0 THEN 'und'
                            WHEN n_de >= greatest(n_en, n_es, n_fr) THEN 'de'
                            WHEN n_en >= greatest(n_es, n_fr) THEN 'en'
                            WHEN n_es >= n_fr THEN 'es'
                            ELSE 'fr' END AS lang
                FROM counts
            ), drawn AS (
                SELECT doc_id, lang,
                       ('0x' || substr(md5(doc_id::VARCHAR || ':42'), 1, 8))::BIGINT
                           AS draw
                FROM langs
            )
            SELECT doc_id, lang FROM drawn
            WHERE draw < CASE lang
                             WHEN 'en' THEN CAST(0.7 * 4294967296 AS BIGINT)
                             WHEN 'de' THEN CAST(0.4 * 4294967296 AS BIGINT)
                             WHEN 'fr' THEN CAST(0.5 * 4294967296 AS BIGINT)
                             WHEN 'es' THEN CAST(0.6 * 4294967296 AS BIGINT)
                             ELSE CAST(0.2 * 4294967296 AS BIGINT) END
            ORDER BY doc_id
        """,
        # tfidf_keywords: smoothed tf-idf, 50% df stop-word cap, top-3 per
        # doc ranked on the rounded score with term tie-break.
        "tfidf_keywords": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                                   x -> x <> '') AS w
                FROM documents
            ), terms AS (
                SELECT doc_id, UNNEST(w) AS term FROM toks
            ), tf AS (
                SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2
            ), dfreq AS (
                SELECT term, count(*) AS df FROM tf GROUP BY 1
            ), scored AS (
                SELECT t.doc_id, t.term,
                       round(t.tf * (ln((1.0 + (SELECT count(*) FROM documents))
                                        / (1.0 + d.df)) + 1.0), 6) AS score
                FROM tf t JOIN dfreq d USING (term)
                WHERE d.df <= CAST(floor(0.9 * (SELECT count(*) FROM documents))
                                   AS BIGINT)
            ), ranked AS (
                SELECT doc_id, term, score,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY score DESC, term) AS rn
                FROM scored
            )
            SELECT doc_id, term, score FROM ranked
            WHERE rn <= 3 ORDER BY doc_id, term
        """,
        # dsir_select: hashed-bigram DSIR log-ratio weights vs the
        # every-23rd-doc target; per-bucket ratio floored to integer micros,
        # doc weight = exact integer sum of count*ratio_micro.
        "dsir_select": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                                   x -> x <> '') AS w
                FROM documents
            ), grams AS (
                SELECT doc_id, w[i] || ' ' || w[i+1] AS g
                FROM toks,
                     UNNEST(generate_series(1, greatest(len(w) - 1, 0))) AS t(i)
                WHERE len(w) >= 2
            ), bucketed AS (
                SELECT doc_id,
                       CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT) % 4096 AS b
                FROM grams
            ), doc_b AS (
                SELECT doc_id, b, count(*) AS c FROM bucketed GROUP BY 1, 2
            ), raw_b AS (
                SELECT b, sum(c) AS cr FROM doc_b GROUP BY 1
            ), tgt_b AS (
                SELECT b, count(*) AS ct FROM bucketed
                WHERE doc_id % 23 = 0 GROUP BY 1
            ), totals AS (
                SELECT (SELECT CAST(sum(cr) AS DOUBLE) FROM raw_b)
                           + CAST(2048.0 AS DOUBLE) AS dr,
                       (SELECT CAST(coalesce(sum(ct), 0) AS DOUBLE) FROM tgt_b)
                           + CAST(2048.0 AS DOUBLE) AS dt
            ), ratio AS (
                SELECT r.b,
                       CAST(floor((
                           ln((CAST(coalesce(t.ct, 0) AS DOUBLE)
                               + CAST(0.5 AS DOUBLE)) / s.dt)
                           - ln((CAST(r.cr AS DOUBLE)
                                 + CAST(0.5 AS DOUBLE)) / s.dr)
                       ) * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS rm
                FROM raw_b r LEFT JOIN tgt_b t USING (b) CROSS JOIN totals s
            )
            SELECT d.doc_id, CAST(sum(d.c * x.rm) AS BIGINT) AS weight_micro
            FROM doc_b d JOIN ratio x USING (b)
            GROUP BY 1 ORDER BY doc_id
        """,
        # margin_mining: ratio margin over the brute-force candidate set —
        # rounded cosines, row_number top-4 neighborhood, exact DECIMAL mean,
        # floor(margin*1e6) >= 1050000.
        "margin_mining": """
            WITH v AS (
                SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
            ), pairs AS (
                SELECT x.vec_id AS a, y.vec_id AS b,
                       round(list_cosine_similarity(x.e, y.e), 6) AS cos
                FROM v x JOIN v y ON x.vec_id < y.vec_id
                WHERE round(list_cosine_similarity(x.e, y.e), 6) >= 0.25
            ), directed AS (
                SELECT a AS src, b AS dst, cos FROM pairs
                UNION ALL
                SELECT b AS src, a AS dst, cos FROM pairs
            ), topk AS (
                SELECT src, dst, cos,
                       row_number() OVER (PARTITION BY src
                                          ORDER BY cos DESC, dst) AS rn
                FROM directed
            ), nn AS (
                SELECT src,
                       CAST(sum(CAST(cos AS DECIMAL(18,6))) AS DOUBLE)
                           / CAST(count(*) AS DOUBLE) AS avg_nn
                FROM topk WHERE rn <= 4 GROUP BY src
            )
            SELECT p.a, p.b,
                   CAST(floor(p.cos / ((na.avg_nn + nb.avg_nn)
                                       * CAST(0.5 AS DOUBLE))
                              * CAST(1000000.0 AS DOUBLE)) AS BIGINT)
                       AS margin_u
            FROM pairs p
            JOIN nn na ON na.src = p.a
            JOIN nn nb ON nb.src = p.b
            WHERE floor(p.cos / ((na.avg_nn + nb.avg_nn)
                                 * CAST(0.5 AS DOUBLE))
                        * CAST(1000000.0 AS DOUBLE)) >= 1050000
            ORDER BY a, b
        """,
        # mutual_nn: mutual nearest neighbors above the 0.45 cosine floor —
        # brute-force pair set, per-source argmax on (round(cos,6), dst),
        # pair kept iff best in BOTH directions.
        "mutual_nn": """
            WITH v AS (
                SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
            ), pairs AS (
                SELECT x.vec_id AS src, y.vec_id AS dst,
                       round(list_cosine_similarity(x.e, y.e), 6) AS cos
                FROM v x JOIN v y ON x.vec_id <> y.vec_id
                WHERE round(list_cosine_similarity(x.e, y.e), 6) >= 0.45
            ), best AS (
                SELECT src, dst, cos,
                       row_number() OVER (PARTITION BY src
                                          ORDER BY cos DESC, dst) AS rn
                FROM pairs
            )
            SELECT l.src AS a, l.dst AS b, l.cos AS cosine
            FROM best l JOIN best r
              ON l.src = r.dst AND l.dst = r.src AND r.rn = 1
            WHERE l.rn = 1 AND l.src < l.dst
            ORDER BY a, b
        """,
        # bm25_rank: Okapi BM25 for the fixed 3-term query, per-term
        # contributions added in query order (the identical IEEE tree the
        # Spark side states), score shipped as floor(score*1e6) BIGINT.
        "bm25_rank": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                                   x -> x <> '') AS w
                FROM documents
            ), stats AS (
                SELECT CAST(count(*) AS DOUBLE) AS n,
                       CAST(sum(len(w)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
                FROM toks
            ), hits AS (
                SELECT doc_id, len(w) AS dl, t.term
                FROM toks, UNNEST(w) AS t(term)
                WHERE t.term IN ('customer', 'window', 'merge')
            ), tf AS (
                SELECT doc_id, term, count(*) AS tf, min(dl) AS dl
                FROM hits GROUP BY 1, 2
            ), dfreq AS (
                SELECT term, count(*) AS df FROM tf GROUP BY 1
            ), contrib AS (
                SELECT t.doc_id,
                       CAST(floor(
                           ln(CAST(1.0 AS DOUBLE)
                              + (s.n - d.df + CAST(0.5 AS DOUBLE))
                                / (d.df + CAST(0.5 AS DOUBLE)))
                           * ((CAST(t.tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
                              / (CAST(t.tf AS DOUBLE) + CAST(1.2 AS DOUBLE)
                                 * (CAST(0.25 AS DOUBLE)
                                    + CAST(0.75 AS DOUBLE)
                                      * (CAST(t.dl AS DOUBLE) / s.avgdl))))
                           * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS cu
                FROM tf t JOIN dfreq d USING (term) CROSS JOIN stats s
            ), scored AS (
                SELECT doc_id, CAST(sum(cu) AS BIGINT) AS score_u
                FROM contrib GROUP BY 1
            ), ranked AS (
                SELECT doc_id, score_u,
                       row_number() OVER (ORDER BY score_u DESC, doc_id) AS rn
                FROM scored
            )
            SELECT doc_id, score_u FROM ranked WHERE rn <= 20
            ORDER BY doc_id
        """,
        # classifier_score: hashed bag-of-words features x md5-derived
        # integer micro-weights; logit = exact integer sum of count*w.
        "classifier_score": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                                   x -> x <> '') AS w
                FROM documents
            ), doc_b AS (
                SELECT doc_id,
                       CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 4096 AS b,
                       count(*) AS c
                FROM toks, UNNEST(w) AS u(t) GROUP BY 1, 2
            ), wt AS (
                SELECT b,
                       CAST(('0x' || substr(md5('7:' || CAST(b AS VARCHAR)), 1, 8))
                            AS BIGINT) % 2000001 - 1000000 AS w_micro
                FROM (SELECT DISTINCT b FROM doc_b)
            )
            SELECT doc_id, CAST(sum(c * w_micro) AS BIGINT) AS logit_micro,
                   CAST(sum(c) AS BIGINT) AS n_tokens
            FROM doc_b JOIN wt USING (b) GROUP BY 1 ORDER BY doc_id
        """,
        # ngram_containment: Broder containment both directions as exact
        # integer micros, filtered on the larger direction >= 0.8; the
        # jaccard-family tokenizer/shingle universe.
        "ngram_containment": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(
                           string_split_regex(
                               trim(regexp_replace(lower(text), '[^\w\s]+', ' ', 'g')),
                               '\s+'),
                           x -> x <> '') AS w
                FROM documents
            ), sh AS (
                SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
                FROM toks, UNNEST(generate_series(1, greatest(len(w) - 2, 0))) AS t(i)
                WHERE len(w) >= 3
            ), sizes AS (
                SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
            ), inter AS (
                SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
                FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
                GROUP BY 1, 2
            )
            SELECT a, b,
                   CAST(floor(i * CAST(1000000.0 AS DOUBLE) / sa.n) AS BIGINT)
                       AS cont_ab_micro,
                   CAST(floor(i * CAST(1000000.0 AS DOUBLE) / sb.n) AS BIGINT)
                       AS cont_ba_micro
            FROM inter
            JOIN sizes sa ON sa.doc_id = a
            JOIN sizes sb ON sb.doc_id = b
            WHERE greatest(floor(i * CAST(1000000.0 AS DOUBLE) / sa.n),
                           floor(i * CAST(1000000.0 AS DOUBLE) / sb.n))
                  >= 800000
            ORDER BY a, b
        """,
        # change_rate: lag window over (ts, event_id); the ln argument is
        # ONE fixed IEEE double expression (ints + 0.5, CAST to DOUBLE so
        # DuckDB's DECIMAL literals don't change the arithmetic), floored
        # to micros immediately; everything after is BIGINT div.
        "change_rate": r"""
            WITH obs AS (
                SELECT user_id AS key, epoch_us(ts) AS us, event_type AS s,
                       lag(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS prev
                FROM events
            ), agg AS (
                SELECT key,
                       count(prev) AS n_intervals,
                       sum(CASE WHEN prev IS NOT NULL AND s <> prev
                                THEN 1 ELSE 0 END) AS n_changes,
                       max(us) - min(us) AS span_us
                FROM obs GROUP BY key
            ), est AS (
                SELECT key, n_intervals, n_changes, span_us,
                       CAST(floor(-ln((CAST(n_intervals AS DOUBLE)
                                       - n_changes + 0.5)
                                      / (CAST(n_intervals AS DOUBLE) + 0.5))
                                  * CAST(1000000.0 AS DOUBLE)) AS BIGINT)
                           AS lnneg_micro,
                       span_us // n_intervals AS avg_us
                FROM agg
                WHERE n_intervals >= 1 AND span_us > 0
            )
            SELECT key,
                   CAST(n_intervals AS BIGINT) AS n_intervals,
                   CAST(n_changes AS BIGINT) AS n_changes,
                   lnneg_micro,
                   CAST((lnneg_micro * 86400000000) // avg_us AS BIGINT)
                       AS lambda_day_micro
            FROM est
            WHERE avg_us > 0
            ORDER BY key
        """,
        # waterfill: the exact integer water level restated with windows —
        # k = last satisfiable rank (max_by), then full-demand / theta+1 /
        # theta by rank; CASE laziness guards the H==k division.
        "waterfill": r"""
            WITH demands AS (
                SELECT user_id AS key, count(*) AS demand
                FROM events GROUP BY user_id
            ), cap AS (
                SELECT CAST(sum(demand) // 3 AS BIGINT) AS c,
                       count(*) AS h
                FROM demands
            ), ranked AS (
                SELECT key, demand,
                       row_number() OVER (ORDER BY demand, key) AS rank,
                       sum(demand) OVER (ORDER BY demand, key
                           ROWS UNBOUNDED PRECEDING) AS cum
                FROM demands
            ), sel AS (
                SELECT coalesce(max(rank), 0) AS k,
                       coalesce(max_by(cum, rank), 0) AS cum_k
                FROM ranked, cap
                WHERE cum + (cap.h - rank) * demand <= cap.c
            )
            SELECT r.key, r.demand,
                   CAST(CASE
                        WHEN sel.k >= cap.h THEN r.demand
                        WHEN r.rank <= sel.k THEN r.demand
                        WHEN r.rank - sel.k <=
                             (cap.c - sel.cum_k) % (cap.h - sel.k)
                            THEN (cap.c - sel.cum_k) // (cap.h - sel.k) + 1
                        ELSE (cap.c - sel.cum_k) // (cap.h - sel.k)
                        END AS BIGINT) AS alloc
            FROM ranked r, cap, sel
            ORDER BY r.key
        """,
        # bpe_pairs: char pairs need no regex lookaround (RE2 lacks them) —
        # substr walks over the distinct-word table, weighted by word count.
        "bpe_pairs": r"""
            WITH toks AS (
                SELECT unnest(list_filter(
                           regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                           x -> x <> '')) AS w
                FROM documents
            ), wc AS (
                SELECT w, count(*) AS c FROM toks GROUP BY w
            ), pairs AS (
                SELECT substr(w, i, 1) || ' ' || substr(w, i + 1, 1) AS pair, c
                FROM wc,
                     UNNEST(generate_series(1, greatest(length(w) - 1, 0))) AS t(i)
                WHERE length(w) >= 2
            )
            SELECT pair, CAST(sum(c) AS BIGINT) AS cnt
            FROM pairs GROUP BY pair
            ORDER BY cnt DESC, pair ASC LIMIT 30
        """,
        # count_min: identical d=4 x w=512 md5 counter walk in SQL; probes =
        # top-40 tokens by exact count (count desc, token asc). The sketch
        # CTE is the whole d*w table; estimate = min over the 4 row hashes.
        "count_min": r"""
            WITH toks AS (
                SELECT unnest(list_filter(
                           regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                           x -> x <> '')) AS item
                FROM documents
            ), truth AS (
                SELECT item, count(*) AS true_cnt FROM toks GROUP BY item
            ), probes AS (
                SELECT item, true_cnt FROM truth
                ORDER BY true_cnt DESC, item ASC LIMIT 40
            ), entries AS (
                SELECT j,
                       CAST(('0x' || substr(md5(j || ':' || item), 1, 8))
                            AS BIGINT) % 512 AS bucket
                FROM toks, UNNEST([0, 1, 2, 3]) AS t(j)
            ), sketch AS (
                SELECT j, bucket, count(*) AS cnt
                FROM entries GROUP BY j, bucket
            ), probe_buckets AS (
                SELECT p.item, p.true_cnt, t.j,
                       CAST(('0x' || substr(md5(t.j || ':' || p.item), 1, 8))
                            AS BIGINT) % 512 AS bucket
                FROM probes p, UNNEST([0, 1, 2, 3]) AS t(j)
            )
            SELECT pb.item, pb.true_cnt,
                   CAST(min(coalesce(s.cnt, 0)) AS BIGINT) AS cm_est
            FROM probe_buckets pb
            LEFT JOIN sketch s ON s.j = pb.j AND s.bucket = pb.bucket
            GROUP BY pb.item, pb.true_cnt
            ORDER BY pb.item
        """,
        # allpairs_jaccard: the prefix-filtered join is EXACT, so the oracle
        # is plain brute force — all pairs sharing a shingle, integer
        # Jaccard micros (floor of a < 2^53 double quotient), threshold 0.6.
        "allpairs_jaccard": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(
                           string_split_regex(
                               trim(regexp_replace(lower(text), '[^\w\s]+', ' ', 'g')),
                               '\s+'),
                           x -> x <> '') AS w
                FROM documents
            ), sh AS (
                SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
                FROM toks, UNNEST(generate_series(1, greatest(len(w) - 2, 0))) AS t(i)
                WHERE len(w) >= 3
            ), sizes AS (
                SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
            ), inter AS (
                SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
                FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
                GROUP BY 1, 2
            )
            SELECT a, b, i AS inter,
                   CAST(floor(i * CAST(1000000.0 AS DOUBLE)
                              / (sa.n + sb.n - i)) AS BIGINT) AS jacc_micro
            FROM inter
            JOIN sizes sa ON sa.doc_id = a
            JOIN sizes sb ON sb.doc_id = b
            WHERE floor(i * CAST(1000000.0 AS DOUBLE) / (sa.n + sb.n - i))
                  >= 600000
            ORDER BY a, b
        """,
        # substring_dedup: per-doc distinct 8-token windows shared with
        # another document — integer counts on the 60-bit md5 span key.
        "substring_dedup": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                                   x -> x <> '') AS w
                FROM documents
            ), spans AS (
                SELECT DISTINCT doc_id,
                       CAST(('0x' || substr(md5(array_to_string(w[i:i+7], ' ')), 1, 15))
                            AS BIGINT) AS h
                FROM toks,
                     UNNEST(generate_series(1, greatest(len(w) - 7, 0))) AS t(i)
                WHERE len(w) >= 8
            ), shared AS (
                SELECT h FROM spans GROUP BY h HAVING count(*) >= 2
            )
            SELECT doc_id,
                   CAST(count(*) FILTER (h IN (SELECT h FROM shared)) AS BIGINT)
                       AS dup_spans,
                   CAST(count(*) AS BIGINT) AS total_spans
            FROM spans GROUP BY doc_id ORDER BY doc_id
        """,
        # lm_quality: unigram-LM log-prob under the every-7th-doc reference,
        # add-0.5 smoothing; per-word ln floored to micros (one fixed IEEE
        # tree), doc score = exact integer sum of count*lp_micro.
        "lm_quality": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                                   x -> x <> '') AS w
                FROM documents
            ), doc_w AS (
                SELECT doc_id, t AS tok, count(*) AS c
                FROM toks, UNNEST(w) AS u(t) GROUP BY 1, 2
            ), ref_w AS (
                SELECT t AS tok, count(*) AS cr
                FROM toks, UNNEST(w) AS u(t) WHERE doc_id % 7 = 0 GROUP BY 1
            ), totals AS (
                SELECT (SELECT CAST(coalesce(sum(cr), 0) AS DOUBLE) FROM ref_w)
                       + CAST(0.5 AS DOUBLE)
                         * (SELECT CAST(count(*) AS DOUBLE) FROM ref_w) AS denom
            ), lp AS (
                SELECT d.tok,
                       CAST(floor(ln((CAST(coalesce(r.cr, 0) AS DOUBLE)
                                      + CAST(0.5 AS DOUBLE)) / s.denom)
                                  * CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS lm
                FROM (SELECT DISTINCT tok FROM doc_w) d
                LEFT JOIN ref_w r USING (tok) CROSS JOIN totals s
            )
            SELECT doc_id, CAST(sum(c * lm) AS BIGINT) AS logprob_micro,
                   CAST(sum(c) AS BIGINT) AS n_tokens
            FROM doc_w JOIN lp USING (tok) GROUP BY 1 ORDER BY doc_id
        """,
        # semdedup: 8 md5-sampled centroids, argmax rounded-cosine
        # assignment (tie -> lowest rank), within-cluster cos >= 0.7 to a
        # lower id marks a duplicate.
        "semdedup": """
            WITH v AS (
                SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
            ), cents AS (
                SELECT vec_id, e,
                       row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                          vec_id) - 1 AS r
                FROM v QUALIFY r < 8
            ), assigned AS (
                SELECT v.vec_id, v.e, c.r AS cluster,
                       row_number() OVER (
                           PARTITION BY v.vec_id
                           ORDER BY round(list_cosine_similarity(v.e, c.e), 6)
                                        DESC, c.r) AS rn
                FROM v CROSS JOIN cents c QUALIFY rn = 1
            ), dups AS (
                SELECT DISTINCT y.vec_id
                FROM assigned x JOIN assigned y
                  ON x.cluster = y.cluster AND x.vec_id < y.vec_id
                WHERE round(list_cosine_similarity(x.e, y.e), 6) >= 0.7
            )
            SELECT a.vec_id, CAST(a.cluster AS INT) AS cluster,
                   a.vec_id IN (SELECT vec_id FROM dups) AS is_dup
            FROM assigned a ORDER BY vec_id
        """,
        # sq8_ann: faiss-SQ8 scalar quantization floor(x/max|x|*127+0.5),
        # integer dot-product ranking — exact BIGINT scores, no float sums.
        "sq8_ann": """
            WITH v AS (
                SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
            ), qv AS (
                SELECT vec_id,
                       list_transform(e, x -> CAST(floor(
                           x / greatest(list_max(list_transform(e, y -> abs(y))),
                                        1e-300)
                           * CAST(127.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
                           AS BIGINT)) AS q
                FROM v
            ), scored AS (
                SELECT c.vec_id,
                       CAST((SELECT sum(c.q[i] * qq.q[i])
                             FROM UNNEST(generate_series(1, len(c.q))) AS t(i))
                            AS BIGINT) AS qdot
                FROM qv c, (SELECT q FROM qv WHERE vec_id = 0) qq
                WHERE c.vec_id <> 0
            )
            SELECT vec_id, qdot FROM scored
            ORDER BY qdot DESC, vec_id LIMIT 10
        """,
        # sorted_neighborhood: merge/purge candidate pairs — records sort by
        # 24-char lowercased title inside 2-char-prefix partitions, each
        # compares to its next 5 neighbours, levenshtein <= 8 refinement.
        "sorted_neighborhood": r"""
            WITH base AS (
                SELECT doc_id, lower(substr(text, 1, 24)) AS s
                FROM documents
            ), keyed AS (
                SELECT doc_id, s, substr(s, 1, 2) AS blk,
                       row_number() OVER (PARTITION BY substr(s, 1, 2)
                                          ORDER BY s, doc_id) AS rn
                FROM base
            )
            SELECT least(l.doc_id, r.doc_id) AS doc_a,
                   greatest(l.doc_id, r.doc_id) AS doc_b,
                   CAST(levenshtein(l.s, r.s) AS BIGINT) AS dist
            FROM keyed l JOIN keyed r
              ON l.blk = r.blk AND r.rn > l.rn AND r.rn <= l.rn + 5
            WHERE levenshtein(l.s, r.s) <= 8
            ORDER BY doc_a, doc_b
        """,
        # decontaminate_bench: benchmark = first 20 tokens of every 23rd
        # doc; contamination = sharing any word 4-gram; n_hits counts
        # DISTINCT benchmark 4-grams present in the doc.
        "decontaminate_bench": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                                   x -> x <> '') AS w
                FROM documents
            ), bench AS (
                SELECT DISTINCT array_to_string(w[i : i + 3], ' ') AS g
                FROM (SELECT w[1:20] AS w FROM toks WHERE doc_id % 23 = 0) b,
                     UNNEST(range(1, greatest(len(b.w) - 3, 0) + 1)) AS t(i)
            ), doc_grams AS (
                SELECT DISTINCT doc_id, array_to_string(w[i : i + 3], ' ') AS g
                FROM toks,
                     UNNEST(range(1, greatest(len(w) - 3, 0) + 1)) AS t(i)
            )
            SELECT doc_id, count(*) AS n_hits
            FROM doc_grams JOIN bench USING (g)
            GROUP BY doc_id ORDER BY doc_id
        """,
        # paragraph_dedup: same deterministic augmentation; first global
        # occurrence by (doc_id, position) survives, boilerplate in > 20
        # distinct docs dropped everywhere, empties removed, order-preserving
        # rejoin on chr(10).
        "paragraph_dedup": r"""
            WITH aug AS (
                SELECT doc_id,
                       text || chr(10) || 'subscribe to tier '
                            || (doc_id % 7)::VARCHAR || ' newsletter'
                            || chr(10) || 'doc ' || doc_id::VARCHAR
                            || ' unique footer'
                            || chr(10) || 'copyright acme '
                            || (doc_id % 3)::VARCHAR AS t
                FROM documents
            ), parts AS (
                SELECT doc_id, ti.i, ps[ti.i] AS p
                FROM (SELECT doc_id, string_split(t, chr(10)) AS ps FROM aug),
                     UNNEST(range(1, len(ps) + 1)) AS ti(i)
                WHERE ps[ti.i] <> ''
            ), grp AS (
                SELECT p, count(DISTINCT doc_id) AS nd FROM parts GROUP BY p
            ), marked AS (
                SELECT parts.doc_id, parts.i, parts.p,
                       (row_number() OVER (PARTITION BY parts.p
                                           ORDER BY parts.doc_id, parts.i) = 1
                        AND grp.nd <= 20) AS keep
                FROM parts JOIN grp USING (p)
            )
            SELECT doc_id,
                   coalesce(string_agg(p, chr(10) ORDER BY i)
                            FILTER (WHERE keep), '') AS deduped,
                   count(*) FILTER (WHERE keep) AS n_kept,
                   count(*) FILTER (WHERE NOT keep) AS n_dropped
            FROM marked GROUP BY doc_id ORDER BY doc_id
        """,
        # pack_sequences: concat-and-chunk packing — exclusive prefix sum of
        # per-doc token counts (incl. the appended <eos>) in doc_id order,
        # example k = global token positions [k*128, (k+1)*128), trailing
        # partial dropped.
        "pack_sequences": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_append(
                           list_filter(
                               regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                               x -> x <> ''),
                           '<eos>') AS tk
                FROM documents
            ), sized AS (
                SELECT doc_id, tk, len(tk) AS n,
                       coalesce(sum(len(tk)) OVER (
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0)::BIGINT AS st
                FROM toks
            ), tot AS (
                SELECT sum(len(tk))::BIGINT AS total FROM toks
            ), pieces AS (
                SELECT s.st, t.k,
                       s.tk[(greatest(t.k * 128, s.st) - s.st + 1)
                            : (least((t.k + 1) * 128, s.st + s.n) - s.st)] AS sl
                FROM sized s, tot,
                     UNNEST(range(s.st // 128, (s.st + s.n - 1) // 128 + 1)) AS t(k)
                WHERE t.k < tot.total // 128
            )
            SELECT k AS example_id,
                   array_to_string(flatten(list(sl ORDER BY st)), ' ') AS text,
                   count(*) AS n_docs
            FROM pieces GROUP BY k ORDER BY example_id
        """,
        # pii_redact: same deterministic augmentation, same pattern order
        # (email → ipv4 → phone), counts taken on the progressively-redacted
        # text exactly as operators.corpus.redact_pii applies them.
        "pii_redact": r"""
            WITH aug AS (
                SELECT doc_id,
                       text || ' contact user' || doc_id::VARCHAR
                            || '@example.com from 10.'
                            || (doc_id % 256)::VARCHAR || '.0.'
                            || (doc_id % 100)::VARCHAR
                            || ' tel 555-867-'
                            || lpad((doc_id % 10000)::VARCHAR, 4, '0') AS t
                FROM documents
            ), s1 AS (
                SELECT doc_id,
                       len(regexp_extract_all(t,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT
                           AS n_email,
                       regexp_replace(t,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                           '<EMAIL>', 'g') AS t
                FROM aug
            ), s2 AS (
                SELECT doc_id, n_email,
                       len(regexp_extract_all(t,
                           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::BIGINT
                           AS n_ipv4,
                       regexp_replace(t,
                           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                           '<IP>', 'g') AS t
                FROM s1
            )
            SELECT doc_id, n_email, n_ipv4,
                   len(regexp_extract_all(t,
                       '\b\d{3}-\d{3}-\d{4}\b'))::BIGINT AS n_phone,
                   regexp_replace(t, '\b\d{3}-\d{3}-\d{4}\b',
                                  '<PHONE>', 'g') AS redacted
            FROM s2 ORDER BY doc_id
        """,
        # repetition_filter: fraction of tokens covered by the most frequent
        # word n-gram (n = 1, 2, 3) + the Gopher keep thresholds.
        "repetition_filter": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                                   x -> x <> '') AS w
                FROM documents
            ), sized AS (
                SELECT doc_id, w, len(w) AS n_tok FROM toks WHERE len(w) > 0
            ), grams AS (
                SELECT doc_id, n_tok, tn.n,
                       array_to_string(w[ti.i : ti.i + tn.n - 1], ' ') AS g
                FROM sized,
                     UNNEST([1, 2, 3]) AS tn(n),
                     UNNEST(range(1, greatest(n_tok - tn.n + 1, 0) + 1)) AS ti(i)
            ), per_gram AS (
                SELECT doc_id, n_tok, n, g, count(*) AS c
                FROM grams GROUP BY 1, 2, 3, 4
            ), top AS (
                SELECT doc_id, n_tok, n, max(c) AS topc
                FROM per_gram GROUP BY 1, 2, 3
            ), pivoted AS (
                SELECT doc_id, n_tok::INT AS n_tokens,
                       round(coalesce(max(CASE WHEN n = 1 THEN topc END), 0)
                             * 1 / n_tok, 6) AS top1_frac,
                       round(coalesce(max(CASE WHEN n = 2 THEN topc END), 0)
                             * 2 / n_tok, 6) AS top2_frac,
                       round(coalesce(max(CASE WHEN n = 3 THEN topc END), 0)
                             * 3 / n_tok, 6) AS top3_frac
                FROM top GROUP BY doc_id, n_tok
            )
            SELECT doc_id, n_tokens, top1_frac, top2_frac, top3_frac,
                   (top2_frac <= 0.20 AND top3_frac <= 0.18) AS keep
            FROM pivoted ORDER BY doc_id
        """,
        "image_caption_dedup": """
            WITH g AS (SELECT i FROM range(48) t(i)),
            members AS (
                SELECT 'img-' || i::VARCHAR AS node,
                       'img-' || i::VARCHAR AS component FROM g
                UNION ALL SELECT 'img-' || i || '-v1', 'img-' || i FROM g
                UNION ALL SELECT 'img-' || i || '-v2', 'img-' || i FROM g
                UNION ALL SELECT 'img-' || i || '-v3', 'img-' || i FROM g
                UNION ALL SELECT 'img-' || i || '-c',  'img-' || i
                          FROM g WHERE i % 5 = 0
            )
            SELECT node, component FROM members ORDER BY node
        """,
        "vector_norm_stats": r"""
            WITH norms AS (
                SELECT label,
                       round(sqrt(list_sum(list_transform(embedding,
                             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))),
                             6) AS norm
                FROM embeddings
            )
            SELECT label, count(*) AS n,
                   CAST(round(sum(CAST(norm AS DECIMAL(18,6))), 4)
                        AS DOUBLE) AS sum_norm
            FROM norms GROUP BY label ORDER BY label
        """,
        "daily_counts": r"""
            SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
                   count(*) AS n_events,
                   count(DISTINCT user_id) AS n_users
            FROM events GROUP BY 1 ORDER BY day
        """,
        "json_extract_agg": r"""
            SELECT event_type, count(*) AS n,
                   CAST(sum(CAST(json_extract_string(props, '$.k') AS INT))
                        AS BIGINT) AS sum_k,
                   max(CAST(json_extract_string(props, '$.k') AS INT))
                       AS max_k,
                   round(avg(CAST(json_extract_string(props, '$.k')
                                  AS INT)), 6) AS avg_k
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "cube_revenue": r"""
            SELECT o_orderstatus, o_orderpriority,
                   count(*) AS n_orders,
                   CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                        AS DOUBLE) AS revenue
            FROM orders
            GROUP BY CUBE (o_orderstatus, o_orderpriority)
            ORDER BY o_orderstatus ASC NULLS FIRST,
                     o_orderpriority ASC NULLS FIRST
        """,
        "range_window_avg": r"""
            WITH b AS (
                SELECT user_id, event_id, epoch_us(ts) AS us,
                       CAST(value AS DECIMAL(18,2)) AS v
                FROM events
            )
            SELECT user_id, event_id,
                   count(*) OVER w AS n_in_window,
                   round(CAST(sum(v) OVER w AS DOUBLE)
                         / (count(*) OVER w), 6) AS avg_1h
            FROM b
            WINDOW w AS (PARTITION BY user_id ORDER BY us
                         RANGE BETWEEN 3600000000 PRECEDING
                                   AND CURRENT ROW)
            ORDER BY user_id, event_id
        """,
        "stratified_weighted_sample": r"""
            SELECT source, doc_id, n_chars FROM (
                SELECT source, doc_id, n_chars,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY CAST(floor(ln((CAST(('0x' || substr(
                                     md5(CAST(doc_id AS VARCHAR) || ':11'),
                                     1, 8)) AS BIGINT) + 0.5)
                                     / 4294967296.0)
                                 / CAST(n_chars AS DOUBLE)
                                 * CAST(1000000000 AS DOUBLE))
                                 AS BIGINT) DESC,
                               doc_id
                       ) AS rn
                FROM documents WHERE n_chars > 0
            ) WHERE rn <= 5
            ORDER BY source, doc_id
        """,
        "q13_cust_dist": r"""
            SELECT c_count, count(*) AS custdist FROM (
                SELECT c.c_custkey, count(o.o_orderkey) AS c_count
                FROM customer c LEFT OUTER JOIN orders o
                  ON c.c_custkey = o.o_custkey
                 AND o.o_orderpriority NOT LIKE '%URGENT%'
                GROUP BY c.c_custkey
            ) GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC
        """,
        "event_gaps": r"""
            WITH g AS (
                SELECT user_id, event_id,
                       epoch_us(ts) - lag(epoch_us(ts)) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS gap_us
                FROM events
            ), t AS (
                SELECT gap_us, ntile(4) OVER (
                           ORDER BY gap_us, user_id, event_id
                       ) AS quartile
                FROM g WHERE gap_us IS NOT NULL
            )
            SELECT quartile, count(*) AS n,
                   min(gap_us) AS min_gap_us, max(gap_us) AS max_gap_us,
                   round(avg(gap_us), 3) AS avg_gap_us
            FROM t GROUP BY quartile ORDER BY quartile
        """,
        "quantile_sketch": r"""
            WITH stats AS (
                SELECT event_type, min(CAST(value AS DOUBLE)) lo,
                       max(CAST(value AS DOUBLE)) hi
                FROM events GROUP BY 1
            ), b AS (
                SELECT e.event_type,
                       CASE WHEN s.hi = s.lo THEN 0
                            ELSE least(CAST(floor(
                                     (CAST(e.value AS DOUBLE) - s.lo)
                                     / ((s.hi - s.lo) / 256.0)) AS INT), 255)
                       END AS bin,
                       s.lo, s.hi
                FROM events e JOIN stats s USING (event_type)
            ), counts AS (
                SELECT event_type, bin, count(*) c,
                       any_value(lo) lo, any_value(hi) hi
                FROM b GROUP BY 1, 2
            ), cum AS (
                SELECT *,
                       sum(c) OVER (PARTITION BY event_type
                                    ORDER BY bin) AS cm,
                       sum(c) OVER (PARTITION BY event_type) AS n
                FROM counts
            ), p AS (
                SELECT CAST(unnest([0.5, 0.95, 0.99]) AS DOUBLE) AS prob
            ), hit AS (
                SELECT event_type, prob,
                       greatest(CAST(ceil(prob * n) AS BIGINT), 1) AS r,
                       bin, c, cm, lo, hi
                FROM cum, p
                WHERE cm >= greatest(CAST(ceil(prob * n) AS BIGINT), 1)
                  AND cm - c < greatest(CAST(ceil(prob * n) AS BIGINT), 1)
            )
            SELECT event_type, prob,
                   round(CASE WHEN hi = lo THEN lo
                              ELSE lo + ((hi - lo) / 256.0)
                                   * (bin + (r - (cm - c)) * 1.0 / c)
                         END, 6) AS quantile
            FROM hit ORDER BY event_type, prob
        """,
        "hll_distinct": _hll_oracle(),
        "heavy_words": r"""
            WITH toks AS (
                SELECT unnest(list_filter(
                    regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                    x -> x <> '')) AS word
                FROM documents
            ), n AS (SELECT count(*) AS total FROM toks)
            SELECT word, count(*) AS cnt
            FROM toks GROUP BY word
            HAVING count(*) > (SELECT total FROM n) / 64.0
            ORDER BY word
        """,
        "weighted_sample": r"""
            SELECT doc_id, n_chars FROM (
                SELECT doc_id, n_chars,
                       CAST(floor(ln((CAST(('0x' || substr(
                                 md5(CAST(doc_id AS VARCHAR) || ':7'), 1, 8))
                                 AS BIGINT) + 0.5) / 4294967296.0)
                             / CAST(n_chars AS DOUBLE)
                             * CAST(1000000000 AS DOUBLE)) AS BIGINT) AS aes
                FROM documents WHERE n_chars > 0
                ORDER BY aes DESC, doc_id LIMIT 25
            ) ORDER BY doc_id
        """,
        "interval_join": r"""
            WITH incidents AS (
                SELECT event_id AS incident_id, ts AS s,
                       ts + INTERVAL 2 HOUR AS e
                FROM events WHERE event_type = 'error' AND value > 190
            ), p AS (
                SELECT event_id, ts, value FROM events
                WHERE event_type = 'purchase'
            )
            SELECT i.incident_id, count(*) AS n_events,
                   CAST(round(sum(CAST(p.value AS DECIMAL(18,2))), 2)
                        AS DOUBLE) AS sum_value
            FROM p JOIN incidents i ON p.ts BETWEEN i.s AND i.e
            GROUP BY i.incident_id ORDER BY i.incident_id
        """,
        "q6_revenue_scan": """
            SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
                   count(*) AS n_rows
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
              AND l_discount >= CAST(0.05 AS DOUBLE)
              AND l_discount <= CAST(0.07 AS DOUBLE)
              AND l_quantity < 24
        """,
        "q4_order_priority": """
            SELECT o_orderpriority, count(*) AS order_count
            FROM orders o
            WHERE o_orderdate >= TIMESTAMP '1996-07-01'
              AND o_orderdate < TIMESTAMP '1996-10-01'
              AND EXISTS (
                SELECT 1 FROM lineitem
                WHERE l_orderkey = o.o_orderkey
                  AND l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority
        """,
        "q14_promo_share": """
            WITH a AS (
                SELECT round(sum(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE CAST(0 AS DOUBLE) END), 2)
                           AS promo_revenue,
                       round(sum(l_extendedprice * (1 - l_discount)), 2)
                           AS total_revenue
                FROM lineitem JOIN part ON l_partkey = p_partkey
                WHERE l_shipdate >= TIMESTAMP '1997-03-01'
                  AND l_shipdate < TIMESTAMP '1997-04-01'
            )
            SELECT promo_revenue, total_revenue,
                   round(CAST(100 AS DOUBLE) * promo_revenue / total_revenue,
                         6) AS promo_pct
            FROM a
        """,
        "q17_small_qty": """
            WITH bl AS (
                SELECT l_partkey, l_quantity, l_extendedprice
                FROM lineitem JOIN part ON l_partkey = p_partkey
                WHERE p_brand = 'Brand#23'
            ), stats AS (
                SELECT l_partkey AS pk,
                       sum(CAST(l_quantity AS BIGINT)) AS sum_qty,
                       count(*) AS n_li
                FROM bl GROUP BY l_partkey
            )
            SELECT round(round(sum(l_extendedprice), 2)
                         / CAST(7 AS DOUBLE), 6) AS avg_yearly,
                   count(*) AS n_small
            FROM bl JOIN stats ON l_partkey = pk
            WHERE 5 * CAST(l_quantity AS BIGINT) * n_li < sum_qty
        """,
        "q19_disjunctive": """
            SELECT round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS revenue,
                   count(*) AS n_rows
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 10
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#17' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 20 AND 30)
        """,
        "q22_lapsed_rich": """
            WITH t AS (
                SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0
            )
            SELECT c_nationkey, count(*) AS numcust,
                   round(sum(c_acctbal), 2) AS totacctbal
            FROM customer, t
            WHERE c_acctbal > ab
              AND NOT EXISTS (
                SELECT 1 FROM orders
                WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01')
            GROUP BY c_nationkey
            ORDER BY c_nationkey
        """,
        "q15_top_supplier": """
            WITH rev AS (
                SELECT l_suppkey,
                       round(sum(l_extendedprice * (1 - l_discount)), 2)
                           AS total_rev
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1996-04-01'
                GROUP BY l_suppkey
            )
            SELECT s_suppkey, s_name, total_rev
            FROM rev JOIN supplier ON l_suppkey = s_suppkey
            WHERE total_rev = (SELECT max(total_rev) FROM rev)
            ORDER BY s_suppkey
        """,
        "q2_min_cost": """
            WITH offers AS (
                SELECT p_partkey, p_brand, l_suppkey,
                       min(l_extendedprice) AS cost
                FROM lineitem JOIN part ON l_partkey = p_partkey
                WHERE p_size <= 5
                GROUP BY p_partkey, p_brand, l_suppkey
            )
            SELECT p_partkey, p_brand, l_suppkey AS s_suppkey, s_name, cost
            FROM offers JOIN supplier ON l_suppkey = s_suppkey
            WHERE cost = (SELECT min(cost) FROM offers o2
                          WHERE o2.p_partkey = offers.p_partkey)
            ORDER BY p_partkey, s_suppkey
        """,
        "q11_important_stock": """
            WITH stock AS (
                SELECT l_partkey,
                       sum(CAST(l_extendedprice AS DECIMAL(18,2))
                           * CAST(l_quantity AS BIGINT)) AS value_dec
                FROM lineitem
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
                WHERE n_regionkey = 2
                GROUP BY l_partkey
            )
            SELECT l_partkey,
                   CAST(round(value_dec, 2) AS DOUBLE) AS stock_value
            FROM stock
            WHERE value_dec * 10000 > (SELECT sum(value_dec) FROM stock)
            ORDER BY stock_value DESC, l_partkey
        """,
        "q12_priority_class": """
            SELECT l_linestatus,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS high_line_count,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                                 THEN 0 ELSE 1 END) AS BIGINT)
                       AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY l_linestatus
            ORDER BY l_linestatus
        """,
        "q16_supplier_cnt": """
            WITH pairs AS (
                SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
            )
            SELECT p_brand, p_type, p_size,
                   count(DISTINCT l_suppkey) AS supplier_cnt
            FROM pairs JOIN part ON l_partkey = p_partkey
            WHERE p_brand <> 'Brand#17'
              AND p_type <> 'ECONOMY'
              AND p_size IN (1, 2, 5, 11, 28, 37, 44, 49)
              AND l_suppkey NOT IN (
                  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
            GROUP BY p_brand, p_type, p_size
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """,
        "q20_excess_stock": """
            WITH small_parts AS (
                SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
            ), stock AS (
                SELECT l_partkey, l_suppkey,
                       sum(CAST(l_quantity AS BIGINT)) AS stock
                FROM lineitem JOIN small_parts ON l_partkey = p_partkey
                GROUP BY l_partkey, l_suppkey
            ), shipped AS (
                SELECT l_partkey AS sp_partkey,
                       sum(CAST(l_quantity AS BIGINT)) AS shipped
                FROM lineitem JOIN small_parts ON l_partkey = p_partkey
                WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                  AND l_shipdate < TIMESTAMP '1998-01-01'
                GROUP BY l_partkey
            )
            SELECT DISTINCT s_suppkey, s_name
            FROM stock
            JOIN shipped ON l_partkey = sp_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE 2 * stock > shipped AND n_regionkey = 2
            ORDER BY s_suppkey
        """,
        "listagg_sorted": """
            SELECT n_name,
                   string_agg(s_name, ',' ORDER BY s_name) AS suppliers,
                   count(*) AS n_suppliers
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            GROUP BY n_name
            ORDER BY n_name
        """,
        "bit_bool_aggs": """
            SELECT o_orderstatus,
                   bit_and(o_orderkey) AS key_band,
                   bit_or(o_orderkey) AS key_bor,
                   bit_xor(o_orderkey) AS key_bxor,
                   bool_and(o_totalprice > CAST(1000 AS DOUBLE))
                       AS all_over_1k,
                   bool_or(o_totalprice > CAST(400000 AS DOUBLE))
                       AS any_over_400k,
                   count(*) AS n_orders
            FROM orders
            GROUP BY o_orderstatus
            ORDER BY o_orderstatus
        """,
        "argmax_per_group": """
            SELECT c_mktsegment, c_custkey AS best_custkey,
                   c_acctbal AS best_acctbal
            FROM (
                SELECT c_mktsegment, c_custkey, c_acctbal,
                       row_number() OVER (
                           PARTITION BY c_mktsegment
                           ORDER BY c_acctbal DESC, c_custkey DESC) AS rn
                FROM customer
            )
            WHERE rn = 1
            ORDER BY c_mktsegment
        """,
        "grouped_corr": """
            WITH s AS (
                SELECT event_type,
                       (epoch_us(ts) // 1000000) - 1704067200 AS x,
                       CAST(round(value * 100) AS BIGINT) AS y
                FROM events
            ), stats AS (
                SELECT event_type, count(*) AS n,
                       CAST(sum(x) AS BIGINT) AS sx,
                       CAST(sum(y) AS BIGINT) AS sy,
                       CAST(sum(x * x) AS BIGINT) AS sxx,
                       CAST(sum(y * y) AS BIGINT) AS syy,
                       CAST(sum(x * y) AS BIGINT) AS sxy
                FROM s GROUP BY event_type
            )
            SELECT event_type, n,
                   round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                         / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                                * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                         6) AS corr_tv
            FROM stats
            ORDER BY event_type
        """,
        "fuzzy_title_match": """
            WITH t AS (
                SELECT doc_id, lower(substr(text, 1, 24)) AS title,
                       lower(substr(text, 1, 8)) AS blk
                FROM documents
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   levenshtein(a.title, b.title) AS dist
            FROM t a JOIN t b
              ON a.blk = b.blk AND a.doc_id < b.doc_id
            WHERE levenshtein(a.title, b.title) <= 8
            ORDER BY doc_a, doc_b
        """,
        "unpivot_metrics": """
            WITH wide AS (
                SELECT l_returnflag,
                       round(sum(l_quantity), 2) AS sum_qty,
                       round(sum(l_extendedprice), 2) AS sum_price,
                       CAST(count(*) AS DOUBLE) AS n_rows
                FROM lineitem GROUP BY l_returnflag
            )
            SELECT l_returnflag, metric, value FROM (
                SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value
                FROM wide
                UNION ALL
                SELECT l_returnflag, 'sum_price', sum_price FROM wide
                UNION ALL
                SELECT l_returnflag, 'n_rows', n_rows FROM wide
            )
            ORDER BY l_returnflag, metric
        """,
        "running_distinct": """
            SELECT event_id, user_id,
                   count(DISTINCT event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS n_types
            FROM events ORDER BY event_id
        """,
        "q7_volume_shipping": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   year(l_shipdate) AS l_year,
                   CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                                 AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
              AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
                OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
            GROUP BY supp_nation, cust_nation, l_year
            ORDER BY supp_nation, cust_nation, l_year
        """,
        "q8_market_share": """
            WITH j AS (
                SELECT year(o_orderdate) AS o_year,
                       CAST(l_extendedprice * (1 - l_discount)
                            AS DECIMAL(38,6)) AS rev,
                       ns.n_name AS supp_nation
                FROM lineitem
                JOIN part     ON l_partkey = p_partkey
                JOIN orders   ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation nc ON c_nationkey = nc.n_nationkey
                JOIN region   ON nc.n_regionkey = r_regionkey
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation ns ON s_nationkey = ns.n_nationkey
                WHERE p_type = 'PROMO' AND r_name = 'ASIA'
            ), agg AS (
                SELECT o_year,
                       CAST(sum(CASE WHEN supp_nation = 'NATION_3'
                                     THEN rev ELSE CAST(0 AS DECIMAL(38,6))
                                END) AS DOUBLE) AS nation_revenue,
                       CAST(sum(rev) AS DOUBLE) AS total_revenue
                FROM j GROUP BY o_year
            )
            SELECT o_year, nation_revenue, total_revenue,
                   round(nation_revenue / total_revenue, 6) AS mkt_share
            FROM agg ORDER BY o_year
        """,
        "q9_nation_profit": """
            SELECT n_name AS nation, year(o_orderdate) AS o_year,
                   CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                                 AS DECIMAL(38,6))) AS DOUBLE) AS profit,
                   count(*) AS n_items
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            GROUP BY n_name, o_year
            ORDER BY n_name, o_year
        """,
        "q10_returned_items": """
            SELECT c_custkey, c_name,
                   CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                                 AS DECIMAL(38,6))) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= TIMESTAMP '1996-07-01'
              AND o_orderdate < TIMESTAMP '1996-10-01'
            GROUP BY c_custkey, c_name
            ORDER BY revenue DESC, c_custkey ASC
            LIMIT 20
        """,
        "gaps_islands": """
            WITH runs AS (
                SELECT user_id, event_type, epoch_us(ts) AS us,
                       row_number() OVER (
                           PARTITION BY user_id ORDER BY ts, event_id)
                     - row_number() OVER (
                           PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS grp
                FROM events
            )
            SELECT user_id, event_type,
                   count(*) AS run_len, min(us) AS start_us
            FROM runs GROUP BY user_id, event_type, grp
            ORDER BY user_id, start_us
        """,
        "sssp_relax": _sssp_sql(rounds=4),
        "pareto_frontier": """
            WITH pairs AS (
                SELECT DISTINCT p_retailprice AS price, p_size AS size
                FROM part
            )
            SELECT price, size FROM pairs p
            WHERE NOT EXISTS (
                SELECT 1 FROM pairs q
                WHERE q.price <= p.price AND q.size <= p.size
                  AND (q.price < p.price OR q.size < p.size)
            )
            ORDER BY price, size
        """,
        "mode_per_group": """
            WITH counts AS (
                SELECT user_id, event_type, count(*) AS cnt
                FROM events GROUP BY user_id, event_type
            )
            SELECT user_id, event_type AS mode_type, cnt
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY user_id
                    ORDER BY cnt DESC, event_type ASC) AS rn
                FROM counts
            ) WHERE rn = 1
            ORDER BY user_id
        """,
        "cooccurrence_pairs": """
            WITH ut AS (
                SELECT DISTINCT user_id, event_type FROM events
            )
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   count(*) AS n_users
            FROM ut a JOIN ut b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY type_a, type_b
            ORDER BY type_a, type_b
        """,
        "basket_lift": """
            WITH ut AS (
                SELECT DISTINCT user_id, event_type FROM events
            ), tot AS (
                SELECT count(DISTINCT user_id) AS n_total FROM ut
            ), singles AS (
                SELECT event_type AS t, count(*) AS n_single
                FROM ut GROUP BY event_type
            ), pairs AS (
                SELECT a.event_type AS type_a, b.event_type AS type_b,
                       count(*) AS n_both
                FROM ut a JOIN ut b
                  ON a.user_id = b.user_id AND a.event_type < b.event_type
                GROUP BY type_a, type_b
            )
            SELECT type_a, type_b, n_both,
                   round(CAST(n_both AS DOUBLE) / CAST(sa.n_single AS DOUBLE),
                         6) AS confidence_ab,
                   round((CAST(n_both AS DOUBLE) * CAST(n_total AS DOUBLE))
                         / (CAST(sa.n_single AS DOUBLE)
                            * CAST(sb.n_single AS DOUBLE)),
                         6) AS lift
            FROM pairs, tot
            JOIN singles sa ON sa.t = type_a
            JOIN singles sb ON sb.t = type_b
            ORDER BY type_a, type_b
        """,
        "date_densify": """
            WITH daily AS (
                SELECT CAST(ts AS DATE) AS day, count(*) AS n
                FROM events WHERE event_type = 'purchase' GROUP BY day
            ), b AS (
                SELECT min(day) AS lo, max(day) AS hi FROM daily
            ), spine AS (
                SELECT CAST(unnest(generate_series(
                    CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP),
                    INTERVAL 1 DAY)) AS DATE) AS day
                FROM b
            )
            SELECT spine.day, COALESCE(n, 0) AS n_purchases
            FROM spine LEFT JOIN daily ON spine.day = daily.day
            ORDER BY spine.day
        """,
        "locf_fill": """
            SELECT event_id, user_id,
                   CAST(last_value(
                       CASE WHEN event_type = 'purchase'
                            THEN CAST(value AS DECIMAL(18,2)) END
                       IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS DOUBLE) AS last_purchase
            FROM events ORDER BY event_id
        """,
        "value_distribution": """
            SELECT o_orderkey, o_orderpriority,
                   round(percent_rank() OVER w, 6) AS pct_rank,
                   round(cume_dist() OVER w, 6) AS cum_dist
            FROM orders
            WINDOW w AS (PARTITION BY o_orderpriority
                         ORDER BY o_totalprice, o_orderkey)
            ORDER BY o_orderkey
        """,
        "share_of_total": """
            WITH seg AS (
                SELECT c_mktsegment,
                       sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_d
                FROM orders JOIN customer ON o_custkey = c_custkey
                GROUP BY c_mktsegment
            )
            SELECT c_mktsegment,
                   CAST(rev_d AS DOUBLE) AS segment_revenue,
                   round(CAST(rev_d AS DOUBLE)
                         / CAST(sum(rev_d) OVER () AS DOUBLE), 6)
                       AS revenue_share
            FROM seg ORDER BY c_mktsegment
        """,
        "type_entropy": """
            WITH counts AS (
                SELECT user_id, event_type, count(*) AS c
                FROM events GROUP BY user_id, event_type
            ), probs AS (
                SELECT user_id,
                       CAST(c AS DOUBLE)
                       / CAST(sum(c) OVER (PARTITION BY user_id) AS DOUBLE)
                           AS p
                FROM counts
            )
            SELECT user_id, round(-sum(p * log2(p)), 6) AS entropy
            FROM probs GROUP BY user_id ORDER BY user_id
        """,
        "curate_image_captions": _curate_images_sql(96),
        "event_debounce": """
            WITH g AS (
                SELECT event_id, user_id, event_type,
                       epoch_us(ts) - lag(epoch_us(ts)) OVER (
                           PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS gap_us
                FROM events
            )
            SELECT event_id, user_id, event_type
            FROM g WHERE gap_us IS NULL OR gap_us > 600000000
            ORDER BY event_id
        """,
        "trailing_window_count": """
            SELECT event_id, user_id,
                   count(*) OVER (
                       PARTITION BY user_id ORDER BY epoch_us(ts)
                       RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
                   ) AS n_last_hour
            FROM events ORDER BY event_id
        """,
        "topk_with_ties": """
            SELECT o_orderkey, o_orderpriority, o_totalprice, price_rank
            FROM (
                SELECT o_orderkey, o_orderpriority, o_totalprice,
                       dense_rank() OVER (
                           PARTITION BY o_orderpriority
                           ORDER BY o_totalprice DESC) AS price_rank
                FROM orders
            ) WHERE price_rank <= 3
            ORDER BY o_orderkey
        """,
        "weighted_median": """
            WITH base AS (
                SELECT o_orderpriority, o_totalprice AS v,
                       o_orderkey % 5 + 1 AS wt
                FROM orders
            ), marked AS (
                SELECT o_orderpriority, v,
                       sum(wt) OVER (PARTITION BY o_orderpriority ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS cum,
                       sum(wt) OVER (PARTITION BY o_orderpriority) AS tot
                FROM base
            )
            SELECT o_orderpriority, min(v) AS weighted_median
            FROM marked WHERE cum * 2 >= tot
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority
        """,
        "mom_growth": """
            WITH monthly AS (
                SELECT date_trunc('month', o_orderdate) AS month,
                       sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_d
                FROM orders GROUP BY month
            )
            SELECT strftime(month, '%Y-%m') AS month,
                   CAST(rev_d AS DOUBLE) AS revenue,
                   round((CAST(rev_d AS DOUBLE)
                          - CAST(lag(rev_d) OVER (ORDER BY month) AS DOUBLE))
                         / CAST(lag(rev_d) OVER (ORDER BY month) AS DOUBLE)
                         * 100, 6) AS mom_pct
            FROM monthly ORDER BY month
        """,
        "time_weighted_avg": """
            WITH s AS (
                SELECT user_id,
                       lead(epoch_us(ts)) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id)
                           - epoch_us(ts) AS dur_us,
                       CAST(round(value * 100) AS BIGINT) AS y
                FROM events
            ), st AS (
                SELECT user_id, count(*) AS n_steps,
                       CAST(sum(dur_us) AS BIGINT) AS total_us,
                       CAST(sum(y * dur_us) AS BIGINT) AS sum_wv
                FROM s WHERE dur_us IS NOT NULL GROUP BY user_id
            )
            SELECT user_id, n_steps,
                   round(CAST(sum_wv AS DOUBLE) / CAST(total_us AS DOUBLE)
                         / CAST(100 AS DOUBLE), 6) AS twap_value
            FROM st WHERE total_us > 0 ORDER BY user_id
        """,
        "ohlc_bars": """
            WITH r AS (
                SELECT event_type,
                       CAST(CAST(ts AS DATE) AS VARCHAR) AS day, value,
                       row_number() OVER (
                           PARTITION BY event_type, CAST(ts AS DATE)
                           ORDER BY ts, event_id) AS rn_a,
                       row_number() OVER (
                           PARTITION BY event_type, CAST(ts AS DATE)
                           ORDER BY ts DESC, event_id DESC) AS rn_d
                FROM events
            ), agg AS (
                SELECT event_type, day,
                       max(CASE WHEN rn_a = 1 THEN value END) AS open,
                       max(value) AS high, min(value) AS low,
                       max(CASE WHEN rn_d = 1 THEN value END) AS close,
                       count(*) AS n_events
                FROM r GROUP BY event_type, day
            )
            SELECT event_type, day, open, high, low, close, n_events
            FROM agg ORDER BY event_type, day
        """,
        "spend_quartiles": """
            WITH spend AS (
                SELECT o_custkey,
                       sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend_d
                FROM orders GROUP BY o_custkey
            ), q AS (
                SELECT o_custkey, spend_d,
                       ntile(4) OVER (ORDER BY spend_d, o_custkey) AS quartile
                FROM spend
            )
            SELECT quartile, count(*) AS n_customers,
                   CAST(round(sum(spend_d), 2) AS DOUBLE) AS total_spend,
                   CAST(round(min(spend_d), 2) AS DOUBLE) AS min_spend,
                   CAST(round(max(spend_d), 2) AS DOUBLE) AS max_spend
            FROM q GROUP BY quartile
            ORDER BY quartile
        """,
        # url_canon_query: rebuild the raw URLs from doc_id residues, then
        # re-run the identical canonicalization (strip fragment, drop empty
        # + tracking params, sort, rejoin) with DuckDB list lambdas.
        "url_canon_query": r"""
            WITH u AS (
                SELECT doc_id,
                       'http://' || source || '.example.com/p/'
                       || CAST(doc_id % 50 AS VARCHAR)
                       || '?b=' || CAST(doc_id % 7 AS VARCHAR)
                       || CASE WHEN doc_id % 2 = 0 THEN '&utm_source=news' ELSE '' END
                       || '&&a=' || CAST(doc_id % 3 AS VARCHAR)
                       || CASE WHEN doc_id % 5 = 0 THEN '&gclid=CjkK' ELSE '' END
                       || CASE WHEN doc_id % 3 = 0 THEN '#sec' ELSE '' END AS url
                FROM documents
            ),
            s AS (
                SELECT doc_id,
                       split_part(url, '#', 1) AS nofrag
                FROM u
            ),
            t AS (
                SELECT doc_id,
                       split_part(nofrag, '?', 1) AS base,
                       regexp_extract(nofrag, '\?(.*)$', 1) AS q
                FROM s
            ),
            p AS (
                SELECT doc_id, base,
                       list_sort(list_filter(string_split(q, '&'),
                           x -> x <> '' AND NOT regexp_matches(x,
                               '^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|igshid|mc_eid|_ga|ref)(=.*)?$')))
                           AS kept
                FROM t
            )
            SELECT doc_id,
                   CASE WHEN len(kept) > 0
                        THEN base || '?' || array_to_string(kept, '&')
                        ELSE base END AS canon
            FROM p ORDER BY doc_id
        """,
        # trap_detect: identical synthetic URLs, every signal recomputed
        # with DuckDB string/list ops (depth, segments-minus-distinct,
        # non-empty param count).
        "trap_detect": r"""
            WITH u AS (
                SELECT doc_id,
                       'http://h' || CAST(doc_id % 3 AS VARCHAR) || '.example.com'
                       || repeat('/loop', CAST(doc_id % 5 AS INT)) || '/page'
                       || CASE WHEN (doc_id * 3) % 11 > 0
                               THEN '?x=1' || repeat('&x=1', CAST((doc_id * 3) % 11 AS INT) - 1)
                               ELSE '' END
                       || CASE WHEN doc_id % 4 = 0 THEN '#frag' ELSE '' END AS url
                FROM documents
            ),
            s AS (
                SELECT doc_id,
                       list_filter(string_split(
                           regexp_extract(url,
                               '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
                           '/'), x -> x <> '') AS segs,
                       list_filter(string_split(
                           regexp_extract(url, '\?([^#]*)', 1), '&'),
                           x -> x <> '') AS params
                FROM u
            )
            SELECT doc_id,
                   len(segs) AS path_depth,
                   len(segs) - len(list_distinct(segs)) AS repeated_segments,
                   len(params) AS n_params,
                   (len(segs) > 8
                    OR len(segs) - len(list_distinct(segs)) >= 2
                    OR len(params) > 8) AS is_trap
            FROM s ORDER BY doc_id
        """,
        # retry_backoff: min(30 << attempt, 86400) + md5(url:attempt) % 60,
        # epoch_us == unix_micros bit-for-bit (build notes).
        "retry_backoff": r"""
            WITH f AS (
                SELECT event_id,
                       'http://h' || CAST(user_id % 20 AS VARCHAR) || '.ex.com/'
                       || CAST(event_id AS VARCHAR) AS url,
                       CAST(event_id % 12 AS INT) AS attempt,
                       ts
                FROM events
            )
            SELECT event_id,
                   least(30 * (CAST(1 AS BIGINT) << least(attempt, 32)),
                         86400)
                   + ('0x' || substr(md5(url || ':' || CAST(attempt AS VARCHAR)),
                                     1, 8))::BIGINT % 60 AS delay_s,
                   epoch_us(ts)
                   + (least(30 * (CAST(1 AS BIGINT) << least(attempt, 32)),
                            86400)
                      + ('0x' || substr(md5(url || ':' || CAST(attempt AS VARCHAR)),
                                        1, 8))::BIGINT % 60) * 1000000 AS next_us
            FROM f ORDER BY event_id
        """,
        # aspect_buckets: exact integer argmin |w*d - h*n| * (10368/d) over
        # the 7-bucket ladder (wt precomputed: S = prod(d) = 10368), tie →
        # lower bucket index; per-bucket counts + 64px-base target dims.
        "aspect_buckets": """
            WITH img AS (
                SELECT doc_id,
                       64 + (doc_id % 29) * 16 AS w,
                       64 + (doc_id * 7 % 31) * 16 AS h
                FROM documents
            ),
            b(i, n, d, wt) AS (
                VALUES (0, 1, 1, 10368), (1, 4, 3, 3456), (2, 3, 4, 2592),
                       (3, 3, 2, 5184), (4, 2, 3, 3456), (5, 16, 9, 1152),
                       (6, 9, 16, 648)
            ),
            ranked AS (
                SELECT img.doc_id, b.n, b.d,
                       row_number() OVER (
                           PARTITION BY img.doc_id
                           ORDER BY abs(img.w * b.d - img.h * b.n) * b.wt, b.i
                       ) AS rn
                FROM img CROSS JOIN b
            )
            SELECT n AS bucket_n, d AS bucket_d,
                   n * 64 AS target_w, d * 64 AS target_h,
                   count(*) AS n_images
            FROM ranked WHERE rn = 1
            GROUP BY n, d ORDER BY bucket_n, bucket_d
        """,
        # link_predict: common-neighbor counts over the rebuilt circulant
        # graph; non-adjacent pairs only, exact integer Jaccard parts.
        "link_predict": """
            WITH r AS (SELECT i FROM range(1500) t(i)),
            raw AS (
                SELECT i AS x, (i + 1) % 1500 AS y FROM r
                UNION ALL SELECT i, (i + 3) % 1500 FROM r
                UNION ALL SELECT i, (5 * i + 2) % 1500 FROM r
            ),
            e AS (
                SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
                FROM raw WHERE x <> y
            ),
            nb AS (
                SELECT a AS v, b AS x FROM e
                UNION ALL SELECT b, a FROM e
            ),
            deg AS (SELECT v, count(*) AS d FROM nb GROUP BY v),
            pairs AS (
                SELECT l.x AS a, r2.x AS b, count(*) AS common
                FROM nb l JOIN nb r2 USING (v)
                WHERE l.x < r2.x
                GROUP BY l.x, r2.x
                HAVING count(*) >= 2
            ),
            nonadj AS (
                SELECT p.a, p.b, p.common FROM pairs p
                ANTI JOIN e ON p.a = e.a AND p.b = e.b
            )
            SELECT n.a, n.b, n.common, da.d AS deg_a, db.d AS deg_b
            FROM nonadj n
            JOIN deg da ON da.v = n.a
            JOIN deg db ON db.v = n.b
            ORDER BY n.a, n.b
        """,
        # sitemap_parse: the oracle REGENERATES (doc_id, pos, loc) from the
        # same residues — never parsing XML — so it checks that the Spark
        # extractor round-trips construction (order, trim, entity decode).
        "sitemap_parse": """
            SELECT doc_id, CAST(e AS INT) AS pos,
                   'http://s' || CAST(doc_id % 5 AS VARCHAR) || '.ex.com/p/'
                   || CAST((doc_id * 7 + e) % 97 AS VARCHAR)
                   || '?a=1&b=' || CAST(e AS VARCHAR) AS loc
            FROM documents, UNNEST(range(0, CAST(doc_id % 4 AS INT) + 1)) AS t(e)
            ORDER BY doc_id, pos
        """,
        # image_batches: rank-in-bucket recomputed with a window (exact at
        # oracle scale; the engine's ranged-seq path is parity-tested),
        # identical bucket argmin (wt = 10368/d, tie -> lower index).
        "image_batches": """
            WITH img AS (
                SELECT doc_id,
                       64 + (doc_id % 29) * 16 AS w,
                       64 + (doc_id * 7 % 31) * 16 AS h
                FROM documents
            ),
            b(i, n, d, wt) AS (
                VALUES (0, 1, 1, 10368), (1, 4, 3, 3456), (2, 3, 4, 2592),
                       (3, 3, 2, 5184), (4, 2, 3, 3456), (5, 16, 9, 1152),
                       (6, 9, 16, 648)
            ),
            assigned AS (
                SELECT doc_id, n, d,
                       row_number() OVER (
                           PARTITION BY doc_id
                           ORDER BY abs(w * d - h * n) * wt, i
                       ) AS rn
                FROM img CROSS JOIN b
            ),
            ranked AS (
                SELECT doc_id, n, d,
                       row_number() OVER (PARTITION BY n, d ORDER BY doc_id) - 1
                           AS rank_in_bucket,
                       count(*) OVER (PARTITION BY n, d) AS n_bucket
                FROM assigned WHERE rn = 1
            )
            SELECT n AS bucket_n, d AS bucket_d,
                   rank_in_bucket // 16 AS batch_idx,
                   CAST(count(*) AS BIGINT) AS n_images,
                   min(doc_id) AS first_id, max(doc_id) AS last_id
            FROM ranked
            WHERE rank_in_bucket < (n_bucket // 16) * 16
            GROUP BY n, d, rank_in_bucket // 16
            ORDER BY bucket_n, bucket_d, batch_idx
        """,
        # blocklist_filter: hierarchy semantics replayed — kept iff NO
        # suffix of the host appears in the rule list.
        "blocklist_filter": r"""
            WITH hosts AS (
                SELECT doc_id,
                       'sub' || (doc_id % 7) || '.site' || (doc_id % 11) || '.com' AS host
                FROM documents
            ), sfx AS (
                SELECT doc_id, host,
                       array_to_string(w[i:len(w)], '.') AS s
                FROM (SELECT doc_id, host, string_split(host, '.') AS w FROM hosts),
                     UNNEST(generate_series(1, len(w))) AS t(i)
            )
            SELECT doc_id, host
            FROM hosts
            WHERE doc_id NOT IN (
                SELECT doc_id FROM sfx
                WHERE s IN ('site3.com', 'sub2.site5.com', 'site99.com')
            )
            ORDER BY doc_id
        """,
        # epoch_shuffle: the permutation replayed as one global
        # row_number over the same md5 draw key.
        "epoch_shuffle": """
            SELECT row_number() OVER (
                       ORDER BY ('0x' || substr(md5(doc_id::VARCHAR || ':e2:9'), 1, 8))::BIGINT,
                                doc_id) - 1 AS rank,
                   doc_id
            FROM documents
            ORDER BY rank
        """,
        # incremental_dedup: all-pairs CROSS Jaccard >= 0.5 between the
        # reconstructed new batch and the reference (3-word shingles,
        # same tokenization twin as ngram_jaccard).
        "incremental_dedup": r"""
            WITH base AS (
                SELECT doc_id,
                       list_filter(
                           string_split_regex(
                               trim(regexp_replace(lower(text), '[^\w\s]+', ' ', 'g')),
                               '\s+'),
                           x -> x <> '') AS w0,
                       text
                FROM documents
            ), newdocs AS (
                SELECT doc_id + 100000 AS doc_id,
                       CASE
                           WHEN doc_id % 5 = 0 THEN text
                           WHEN doc_id % 5 = 1 THEN text || ' extra trailing token'
                           ELSE array_to_string(list_reverse(
                               list_filter(
                                   regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
                                   x -> x <> '')), ' ')
                       END AS text
                FROM documents
            ), tn AS (
                SELECT doc_id,
                       list_filter(
                           string_split_regex(
                               trim(regexp_replace(lower(text), '[^\w\s]+', ' ', 'g')),
                               '\s+'),
                           x -> x <> '') AS w
                FROM newdocs
            ), shn AS (
                SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
                FROM tn, UNNEST(generate_series(1, greatest(len(w) - 2, 0))) AS t(i)
                WHERE len(w) >= 3
            ), shr AS (
                SELECT DISTINCT doc_id, w0[i] || ' ' || w0[i+1] || ' ' || w0[i+2] AS s
                FROM base, UNNEST(generate_series(1, greatest(len(w0) - 2, 0))) AS t(i)
                WHERE len(w0) >= 3
            ), szn AS (
                SELECT doc_id, count(*) AS n FROM shn GROUP BY doc_id
            ), szr AS (
                SELECT doc_id, count(*) AS n FROM shr GROUP BY doc_id
            ), inter AS (
                SELECT x.doc_id AS new_id, y.doc_id AS ref_id, count(*) AS i
                FROM shn x JOIN shr y ON x.s = y.s
                GROUP BY 1, 2
            )
            SELECT new_id, ref_id,
                   round(i::DOUBLE / (a.n + b.n - i), 6) AS jaccard
            FROM inter
            JOIN szn a ON a.doc_id = new_id
            JOIN szr b ON b.doc_id = ref_id
            WHERE i::DOUBLE / (a.n + b.n - i) >= 0.5
            ORDER BY new_id, ref_id
        """,
        # ingest_pipeline: the html_extract body chain composed with the
        # quality gate, string-keyed first-occurrence dedup, the md5 draw
        # (0.8 * 2^32 = 3435973836) and the 32/8 chunk arithmetic.
        "ingest_pipeline": r"""
            WITH h AS (
                SELECT doc_id,
                       '<html><head><title>Doc ' || doc_id
                       || ' &amp; friends</title><script type="text/javascript">var x = 1 < 2;</script></head><body><p>'
                       || text || '</p><div class="nav">nav ' || (doc_id % 5)
                       || '</div><!-- hidden --></body></html>' AS html
                FROM documents
            ), s1 AS (
                SELECT doc_id,
                       regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
                           '(?is)<script\b[^>]*>.*?</script\s*>', '', 'g'),
                           '(?is)<style\b[^>]*>.*?</style\s*>', '', 'g'),
                           '(?is)<head\b[^>]*>.*?</head\s*>', '', 'g'),
                           '(?s)<!--.*?-->', '', 'g') AS x
                FROM h
            ), s2 AS (
                SELECT doc_id,
                       regexp_replace(regexp_replace(x,
                           '(?is)</?(p|div|br|h[1-6]|li|ul|ol|tr|td|th|table|blockquote|section|article|header|footer|nav|pre)\b[^>]*>', e'\n', 'g'),
                           '(?s)<[^>]+>', ' ', 'g') AS x
                FROM s1
            ), s3 AS (
                SELECT doc_id,
                       replace(replace(replace(replace(replace(replace(x,
                           '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                           '&#39;', CHR(39)), '&nbsp;', ' '), '&amp;', '&') AS x
                FROM s2
            ), s4 AS (
                SELECT doc_id,
                       regexp_replace(trim(regexp_replace(regexp_replace(regexp_replace(x,
                           '[ \t\r\f]+', ' ', 'g'),
                           ' ?\n ?', e'\n', 'g'),
                           '\n+', e'\n', 'g')),
                           '^\n+|\n+$', '', 'g') AS body
                FROM s3
            ), gated AS (
                SELECT doc_id, body FROM s4
                WHERE len(list_filter(
                    regexp_split_to_array(lower(body), '[^0-9a-z_]+'),
                    x -> x <> '')) >= 10
            ), dedup AS (
                SELECT doc_id, body FROM (
                    SELECT doc_id, body,
                           row_number() OVER (PARTITION BY body
                                              ORDER BY doc_id) AS rn
                    FROM gated
                ) WHERE rn = 1
            ), samp AS (
                SELECT doc_id, body FROM dedup
                WHERE ('0x' || substr(md5(doc_id::VARCHAR || ':11'), 1, 8))::BIGINT
                      < 3435973836
            ), toks AS (
                SELECT doc_id,
                       list_filter(
                           regexp_split_to_array(lower(body), '[^0-9a-z_]+'),
                           x -> x <> '') AS w
                FROM samp
            ), sized AS (
                SELECT doc_id, w, len(w) AS n,
                       CASE WHEN len(w) > 0
                            THEN 1 + CAST(floor((greatest(len(w) - 32, 0) + 23) / 24)
                                          AS INT)
                            ELSE 0 END AS n_chunks
                FROM toks
            ), idx AS (
                SELECT doc_id, w, n, UNNEST(range(0, n_chunks)) AS chunk_idx
                FROM sized
            )
            SELECT doc_id, chunk_idx::INT AS chunk_idx,
                   array_to_string(w[chunk_idx * 24 + 1 : chunk_idx * 24 + 32], ' ')
                       AS chunk_text,
                   least(32, n - chunk_idx * 24)::INT AS n_tokens
            FROM idx ORDER BY doc_id, chunk_idx
        """,
        # bpe_encode: merge chain built programmatically from BPE_MERGES
        # (same list as the query) — see _bpe_encode_sql.
        "bpe_encode": _bpe_encode_sql(),
        # html_extract: the documented RE2∩Java regexp chain replayed
        # verbatim (same pass order, entity order, whitespace passes).
        "html_extract": r"""
            WITH h AS (
                SELECT doc_id,
                       '<html><head><title>Doc ' || doc_id
                       || ' &amp; friends</title><script type="text/javascript">var x = 1 < 2;</script></head><body><p>'
                       || text || '</p><div class="nav">nav ' || (doc_id % 5)
                       || '</div><!-- hidden --></body></html>' AS html
                FROM documents
            ), s1 AS (
                SELECT doc_id,
                       regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
                           '(?is)<script\b[^>]*>.*?</script\s*>', '', 'g'),
                           '(?is)<style\b[^>]*>.*?</style\s*>', '', 'g'),
                           '(?is)<head\b[^>]*>.*?</head\s*>', '', 'g'),
                           '(?s)<!--.*?-->', '', 'g') AS x,
                       regexp_extract(html, '(?is)<title[^>]*>(.*?)</title\s*>', 1) AS t
                FROM h
            ), s2 AS (
                SELECT doc_id,
                       regexp_replace(regexp_replace(x,
                           '(?is)</?(p|div|br|h[1-6]|li|ul|ol|tr|td|th|table|blockquote|section|article|header|footer|nav|pre)\b[^>]*>', e'\n', 'g'),
                           '(?s)<[^>]+>', ' ', 'g') AS x,
                       t
                FROM s1
            ), s3 AS (
                SELECT doc_id,
                       replace(replace(replace(replace(replace(replace(x,
                           '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                           '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&') AS x,
                       replace(replace(replace(replace(replace(replace(t,
                           '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                           '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&') AS t
                FROM s2
            ), s4 AS (
                SELECT doc_id,
                       regexp_replace(trim(regexp_replace(regexp_replace(regexp_replace(x,
                           '[ \t\r\f]+', ' ', 'g'),
                           ' ?\n ?', e'\n', 'g'),
                           '\n+', e'\n', 'g')),
                           '^\n+|\n+$', '', 'g') AS body,
                       trim(regexp_replace(t, '\s+', ' ', 'g')) AS title
                FROM s3
            )
            SELECT doc_id, title, body, length(body)::BIGINT AS n_chars
            FROM s4 ORDER BY doc_id
        """,
        # clip_filter: DuckDB's list_cosine_similarity vs the zip_with/
        # aggregate form agree at round-6 (the embedding_topk precedent);
        # the gate compares the rounded value in both engines.
        "clip_filter": """
            WITH img AS (
                SELECT vec_id AS pair_id, embedding::DOUBLE[] AS iv
                FROM embeddings WHERE vec_id % 2 = 0
            ), cap AS (
                SELECT vec_id - 1 AS pair_id, embedding::DOUBLE[] AS cv
                FROM embeddings WHERE vec_id % 2 = 1
            )
            SELECT i.pair_id,
                   round(list_cosine_similarity(iv, cv), 6) AS cos_sim_r
            FROM img i JOIN cap ON i.pair_id = cap.pair_id
            WHERE round(list_cosine_similarity(iv, cv), 6) >= 0.1
            ORDER BY i.pair_id
        """,
        # image_patches: constant expected table (generation-time exp_patch
        # vs the patchify kernel — the image-family convention).
        "image_patches": """
            SELECT 'img-' || i AS image_id,
                   pr.pr::INT AS patch_row, pc.pc::INT AS patch_col,
                   true AS mean_ok
            FROM range(64) t(i),
                 (SELECT UNNEST([0, 1]) AS pr) pr,
                 (SELECT UNNEST([0, 1]) AS pc) pc
            ORDER BY image_id, patch_row, patch_col
        """,
        # winnow_fp: same packed-bigint selection, window-function form —
        # min over ROWS BETWEEN CURRENT AND 3 FOLLOWING, full windows only
        # (plus the whole-doc window for docs with < 4 shingles).
        "winnow_fp": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(
                           string_split_regex(
                               trim(regexp_replace(lower(text), '[^\w\s]+', ' ', 'g')),
                               '\s+'),
                           x -> x <> '') AS w
                FROM documents
            ), sh AS (
                SELECT doc_id, i,
                       ('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]), 1, 8))::BIGINT
                           * 16777216 + (16777215 - i) AS packed,
                       len(w) - 2 AS n
                FROM toks, UNNEST(generate_series(1, greatest(len(w) - 2, 0))) AS t(i)
                WHERE len(w) >= 3
            ), wm AS (
                SELECT doc_id, i, n,
                       min(packed) OVER (PARTITION BY doc_id ORDER BY i
                                         ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m
                FROM sh
            ), sel AS (
                SELECT DISTINCT doc_id, m
                FROM wm
                WHERE i <= greatest(n - 3, 1)
            )
            SELECT doc_id,
                   CAST(16777215 - (m % 16777216) AS INTEGER) AS pos,
                   m // 16777216 AS fp
            FROM sel
            ORDER BY doc_id, pos
        """,
        # winnow_overlap: the winnow_fp chain on augmented text, then
        # distinct (doc, fp) sets, >100-df hot-fp drop, fp self-join.
        "winnow_overlap": r"""
            WITH aug AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 50 = 0
                            THEN text || ' copied passage alpha beta gamma delta epsilon zeta eta theta'
                            ELSE text END AS text
                FROM documents
            ), toks AS (
                SELECT doc_id,
                       list_filter(
                           string_split_regex(
                               trim(regexp_replace(lower(text), '[^\w\s]+', ' ', 'g')),
                               '\s+'),
                           x -> x <> '') AS w
                FROM aug
            ), sh AS (
                SELECT doc_id, i,
                       ('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]), 1, 8))::BIGINT
                           * 16777216 + (16777215 - i) AS packed,
                       len(w) - 2 AS n
                FROM toks, UNNEST(generate_series(1, greatest(len(w) - 2, 0))) AS t(i)
                WHERE len(w) >= 3
            ), wm AS (
                SELECT doc_id, i, n,
                       min(packed) OVER (PARTITION BY doc_id ORDER BY i
                                         ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m
                FROM sh
            ), fps AS (
                SELECT DISTINCT doc_id, m // 16777216 AS fp
                FROM wm
                WHERE i <= greatest(n - 3, 1)
            ), sizes AS (
                SELECT doc_id, count(*) AS n FROM fps GROUP BY doc_id
            ), hot AS (
                SELECT fp FROM fps GROUP BY fp HAVING count(*) > 100
            ), j AS (
                SELECT fp, doc_id FROM fps
                WHERE fp NOT IN (SELECT fp FROM hot)
            ), pairs AS (
                SELECT x.doc_id AS a, y.doc_id AS b,
                       CAST(count(*) AS BIGINT) AS n_shared
                FROM j x JOIN j y ON x.fp = y.fp AND x.doc_id < y.doc_id
                GROUP BY 1, 2
                HAVING count(*) >= 2
            )
            SELECT a, b, n_shared, sa.n AS n_a, sb.n AS n_b
            FROM pairs
            JOIN sizes sa ON sa.doc_id = a
            JOIN sizes sb ON sb.doc_id = b
            ORDER BY a, b
        """,
        # mixture_sample: thresholds restate the exact IEEE shape
        # floor(((min(n/p) * p) / n) * 2^32) over per-domain counts.
        "mixture_sample": """
            WITH cnt AS (
                SELECT source AS d, count(*) AS n,
                       CASE source
                           WHEN 'src0' THEN CAST('0.45' AS DOUBLE)
                           WHEN 'src1' THEN CAST('0.35' AS DOUBLE)
                           WHEN 'src2' THEN CAST('0.2' AS DOUBLE)
                       END AS p
                FROM documents
                WHERE source IN ('src0', 'src1', 'src2')
                GROUP BY source
            ), thr AS (
                SELECT d,
                       CAST(floor(
                           ((min(CAST(n AS DOUBLE) / p) OVER ()) * p
                            / CAST(n AS DOUBLE))
                           * CAST(4294967296 AS DOUBLE)) AS BIGINT) AS t
                FROM cnt
            )
            SELECT doc_id, source
            FROM documents JOIN thr ON source = thr.d
            WHERE ('0x' || substr(md5(doc_id::VARCHAR || ':7'), 1, 8))::BIGINT < t
            ORDER BY doc_id
        """,
        # phrase_search: positional postings filtered to the phrase
        # vocabulary, slot-voting on anchor = i - (j-1), all-slots match.
        "phrase_search": """
            WITH toks AS (
                SELECT doc_id,
                       list_filter(
                           regexp_split_to_array(
                               lower(text || ' padding data line join mid data line join'),
                               '[^0-9a-z_]+'),
                           x -> x <> '') AS w
                FROM documents
            ), post AS (
                SELECT doc_id, i, w[i] AS t
                FROM toks, UNNEST(generate_series(1, len(w))) AS u(i)
                WHERE w[i] IN ('data', 'line', 'join')
            ), ph AS (
                SELECT * FROM (VALUES (1, 'data'), (2, 'line'), (3, 'join')) AS v(j, t)
            ), hits AS (
                SELECT doc_id, post.i - (ph.j - 1) AS pos, ph.j AS j
                FROM post JOIN ph ON post.t = ph.t
                WHERE post.i - (ph.j - 1) >= 1
            )
            SELECT doc_id, CAST(pos AS INTEGER) AS pos
            FROM hits
            GROUP BY doc_id, pos
            HAVING count(DISTINCT j) = 3
            ORDER BY doc_id, pos
        """,
        # image/audio/video: value-checked against generation-time expecteds
        # (constant-table oracles above); frontier_crawl's BFS core is
        # value-checked via frontier_bfs / frontier_polite.
    }
