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
