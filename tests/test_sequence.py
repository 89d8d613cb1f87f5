"""with_global_seq: ranged mode must equal single mode for any total order,
and the scheduler must produce the golden order in ranged mode too."""

from pyspark.sql import functions as F

from httrack2warc_spark.operators.sequence import with_global_seq


def test_ranged_equals_single(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") * 2654435761 % 100003).alias("k"),
        F.col("id").alias("id"),
    )
    order = [F.col("k"), F.col("id")]
    a = {
        (r.k, r.id): r.seq
        for r in with_global_seq(df, order, start=100, mode="single").collect()
    }
    b = {
        (r.k, r.id): r.seq
        for r in with_global_seq(
            df, order, start=100, mode="ranged", num_partitions=8
        ).collect()
    }
    assert a == b
    assert sorted(a.values()) == list(range(100, 5100))


def test_scheduler_golden_ranged(spark, tmp_path):
    from httrack2warc_spark.frontier import CrawlConfig, FrontierScheduler, fixture_web
    from httrack2warc_spark.sinks.tables import TableCatalog
    from tests.test_scheduler import GOLDEN_VISIT_ORDER

    cat = TableCatalog(spark, str(tmp_path))
    sched = FrontierScheduler(
        spark, cat, fixture_web(spark),
        CrawlConfig(num_parts=4, max_rounds=10, seq_mode="ranged"),
    )
    log = sched.run(seeds=["http://test.example.org/"])
    assert [r.url for r in log.orderBy("seq").collect()] == GOLDEN_VISIT_ORDER


def test_running_total_ranged_equals_single(spark):
    from pyspark.sql import functions as F

    from httrack2warc_spark.operators.sequence import with_running_total

    df = spark.createDataFrame(
        [(i, (i * 37) % 11 + 1) for i in range(5000)], "k int, v int"
    )
    a = {
        r.k: r.running
        for r in with_running_total(df, [F.col("k")], F.col("v"), mode="single").collect()
    }
    caches = []
    b = {
        r.k: r.running
        for r in with_running_total(
            df, [F.col("k")], F.col("v"), mode="ranged", num_partitions=8,
            cache_handle=caches,
        ).collect()
    }
    for c in caches:
        c.unpersist()
    assert a == b
    assert a[0] == 0 and a[1] == ((0 * 37) % 11 + 1)


def test_assign_warc_files_dense_and_atomic(spark):
    """K2: an oversized record group may skip floor boundaries, but file
    numbers must stay consecutive from 0 (RotatingFile seq += 1), and all
    subs of a seq group share one file."""
    from pyspark.sql import functions as F

    from httrack2warc_spark.sinks.warc import assign_warc_files

    rows = []
    for seq in range(10):
        size = 5000 if seq == 3 else 100  # group 3 is ~12x the rotation size
        rows.append((seq, 0, "h" * 10, bytes(size)))
        rows.append((seq, 1, "h" * 10, bytes(20)))
    records = spark.createDataFrame(
        rows, "seq long, sub int, warc_header string, body binary"
    )
    out = assign_warc_files(records, rotation_size=400).collect()
    by_seq = {}
    for r in out:
        by_seq.setdefault(r.seq, set()).add(r.file_no)
    assert all(len(v) == 1 for v in by_seq.values())  # group atomicity
    file_nos = sorted({r.file_no for r in out})
    assert file_nos == list(range(len(file_nos)))  # consecutive from 0
    assert len(file_nos) > 1
    # order-preserving: file numbers are monotone in seq
    seq_file = sorted((s, next(iter(v))) for s, v in by_seq.items())
    assert [f for _, f in seq_file] == sorted(f for _, f in seq_file)


def test_bucketed_equals_single(spark):
    """Lazy in-plan stamping (no collect, no job barrier) must equal single
    mode exactly when the bucket column is monotone along the order — here
    a parent_seq-style prefix key with a ragged fan-out per parent."""
    df = spark.range(0, 5000).select(
        (F.col("id") % 700).alias("parent_seq"),       # ~7 children/parent
        (F.col("id") % 13).alias("link_idx"),
        F.concat(F.lit("u"), (F.col("id") * 2654435761 % 99991)).alias("url"),
    ).distinct()
    order = [F.col("parent_seq"), F.col("link_idx"), F.col("url")]
    a = {
        (r.parent_seq, r.link_idx, r.url): r.seq
        for r in with_global_seq(df, order, start=42, mode="single").collect()
    }
    b = {
        (r.parent_seq, r.link_idx, r.url): r.seq
        for r in with_global_seq(
            df, order, start=42, mode="bucketed",
            bucket_by=F.floor(F.col("parent_seq") / 50),
        ).collect()
    }
    assert a == b
    n = df.count()
    assert sorted(a.values()) == list(range(42, 42 + n))


def test_bucketed_lazy_scalar_start(spark):
    """start may be a 1-row DataFrame (lazy scalar) — the k-level batch path
    chains level i's start on level i-1's count without materializing it."""
    df = spark.createDataFrame(
        [(i // 3, i % 3, f"u{i}") for i in range(100)],
        "parent_seq long, link_idx int, url string",
    )
    order = [F.col("parent_seq"), F.col("link_idx"), F.col("url")]
    start_df = spark.range(1).select((F.lit(7) + F.lit(3)).cast("long"))
    got = {
        r.url: r.seq
        for r in with_global_seq(
            df, order, start=start_df, mode="bucketed",
            bucket_by=F.floor(F.col("parent_seq") / 8),
        ).collect()
    }
    want = {
        r.url: r.seq
        for r in with_global_seq(df, order, start=10, mode="single").collect()
    }
    assert got == want


def test_bucketed_requires_bucket(spark):
    import pytest

    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        with_global_seq(df, [F.col("k")], mode="bucketed")
