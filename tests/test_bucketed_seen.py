"""Bucketed url_seen storage: exchange-free confirm joins + re-registration.

The TableCatalog writes bucketed filesets as Spark-native bucketed external
tables (Iceberg bucket-partitioning stand-in). The exact-confirm anti-join in
filter_new_urls must read them without an Exchange on the seen side.
"""

from pyspark.sql import functions as F

from httrack2warc_spark.operators.seen import filter_new_urls
from httrack2warc_spark.sinks.tables import TableCatalog


def _seen_df(spark, n=300):
    return spark.createDataFrame(
        [(f"s.com/{i}", f"http://s.com/{i}", 0) for i in range(n)],
        "url_key string, url string, enqueued_round int",
    )


def test_bucketed_write_read_roundtrip(spark, tmp_path):
    cat = TableCatalog(spark, str(tmp_path))
    cat.write("url_seen", _seen_df(spark), bucket_by=("url_key", 4))
    cat.append(
        "url_seen",
        spark.createDataFrame(
            [("t.com/1", "http://t.com/1", 1)],
            "url_key string, url string, enqueued_round int",
        ),
        bucket_by=("url_key", 4),
    )
    assert cat.read("url_seen").count() == 301
    assert len(cat.read_filesets("url_seen")) == 2


def test_bucketed_scan_has_no_exchange(spark, tmp_path):
    """When the confirm anti-join runs as a sort-merge join, the bucketed
    fileset side carries HashPartitioning from the scan — no Exchange (and no
    Sort, thanks to sortBy + one file per bucket) under the seen arm; only the
    probe side exchanges. (With a tiny probe side AQE picks a broadcast join
    instead — no exchange at all — which is also correct; the merge hint
    forces the shape that matters at scale.)"""
    cat = TableCatalog(spark, str(tmp_path))
    cat.write("url_seen", _seen_df(spark, 2000), bucket_by=("url_key", 8))
    fs = cat.read_filesets("url_seen")[0]
    probe = spark.createDataFrame(
        [(f"s.com/{i}",) for i in range(1990, 2020)], "url_key string"
    )
    plan = (
        probe.join(fs.select("url_key").hint("merge"), "url_key", "left_anti")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Bucketed: true" in plan, plan
    # exactly one exchange (the probe side); the bucketed scan side has none
    assert plan.count("Exchange") == 1, plan


def test_filter_new_urls_with_fileset_list(spark, tmp_path):
    """filter_new_urls(seen_exact=list-of-filesets) == the exact anti-join."""
    cat = TableCatalog(spark, str(tmp_path))
    cat.write("url_seen", _seen_df(spark, 200), bucket_by=("url_key", 4))
    cat.append(
        "url_seen",
        spark.createDataFrame(
            [(f"s.com/{i}", f"http://s.com/{i}", 1) for i in range(200, 300)],
            "url_key string, url string, enqueued_round int",
        ),
        bucket_by=("url_key", 4),
    )
    cand = spark.createDataFrame(
        [(f"s.com/{i}",) for i in range(250, 400)], "url_key string"
    )
    out = {
        r.url_key
        for r in filter_new_urls(
            cand, cat.read_filesets("url_seen"), None, "url_key", 4
        ).collect()
    }
    assert out == {f"s.com/{i}" for i in range(300, 400)}


def test_compact_small_keeps_base_and_rows(spark, tmp_path):
    """Size-tiered compaction: merges everything but the largest fileset into
    one; row set unchanged; the big base entry is reused verbatim (never
    rewritten)."""
    cat = TableCatalog(spark, str(tmp_path))
    cat.write("url_seen", _seen_df(spark, 1000), bucket_by=("url_key", 4))
    base_entry = cat._files("url_seen")[0]
    for i in range(5):
        cat.append(
            "url_seen",
            spark.createDataFrame(
                [(f"t{i}.com/{j}", f"http://t{i}.com/{j}", i) for j in range(10)],
                "url_key string, url string, enqueued_round int",
            ),
            bucket_by=("url_key", 4),
        )
    assert len(cat._files("url_seen")) == 6
    assert cat.compact_small("url_seen", bucket_by=("url_key", 4), max_filesets=3)
    files = cat._files("url_seen")
    assert len(files) == 2
    assert files[0] == base_entry  # base never rewritten
    assert cat.read("url_seen").count() == 1050
    assert cat.row_count("url_seen") == 1050
    assert not cat.compact_small("url_seen", bucket_by=("url_key", 4), max_filesets=3)


def test_bucket_table_reregisters_after_catalog_loss(spark, tmp_path):
    """Session catalogs are in-memory; a fresh session (resume) must be able
    to re-register the bucketed fileset tables from the manifest."""
    cat = TableCatalog(spark, str(tmp_path))
    cat.write("url_seen", _seen_df(spark, 50), bucket_by=("url_key", 4))
    entry = cat._files("url_seen")[0]
    spark.sql(f"DROP TABLE {entry['table']}")  # simulate a new session
    assert cat.read("url_seen").count() == 50
    fs = cat.read_filesets("url_seen")[0]
    probe = spark.createDataFrame([("s.com/1",)], "url_key string")
    plan = (
        probe.join(fs.select("url_key").hint("merge"), "url_key", "left_anti")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the re-registered table still serves bucketed (exchange-free) scans
    assert "Bucketed: true" in plan and plan.count("Exchange") == 1, plan
