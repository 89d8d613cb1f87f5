"""Full converter (entry point 1) + leftover audit + image drain."""

import gzip

from pyspark.sql import functions as F

from httrack2warc_spark.convert import convert
from httrack2warc_spark.operators.audit import leftover_files
from httrack2warc_spark.sources.crawl import read_crawl


def test_convert_end_to_end(spark, crawl_dir, tmp_path):
    recs = convert(
        spark,
        crawl_dir,
        str(tmp_path),
        exclusions=[".*/another"],
        redirect_prefix="http://prefix.example.org/",
    )
    warc = tmp_path / "crawl-0.warc.gz"
    cdx = tmp_path / "index.cdx"
    assert warc.exists() and cdx.exists()
    data = gzip.decompress(warc.read_bytes())
    assert data.startswith(b"WARC/1.0\r\nWARC-Type: warcinfo\r\n")
    assert recs.count() == 29
    lines = cdx.read_text().splitlines()
    assert lines[0] == " CDX N b a m s k r M S V g"
    body = lines[1:]
    assert body == sorted(body) and len(body) == 14  # 7 responses + 7 redirects


def test_leftover_audit(spark, crawl_dir):
    crawl = read_crawl(spark, crawl_dir)
    left = {r.file for r in leftover_files(spark, crawl_dir, crawl).collect()}
    # image404 was saved as .html on disk but logged as .png — the audit
    # must flag the orphan file, and nothing else
    assert left == {"test.example.org/image404.html"}


def test_scheduler_image_drain(spark, tmp_path):
    from httrack2warc_spark.frontier import (
        CrawlConfig,
        FrontierScheduler,
        generate_images,
        generate_web,
    )
    from httrack2warc_spark.sinks.tables import TableCatalog

    web, seeds = generate_web(spark, n_hosts=1, pages_per_host=40, out_degree=3,
                              image_every=10)
    images = generate_images(spark, 64, w=16, h=16)
    cat = TableCatalog(spark, str(tmp_path))
    sched = FrontierScheduler(
        spark, cat, web,
        CrawlConfig(num_parts=4, max_rounds=10, fetch_robots=False),
        image_table=images,
    )
    sched.run(seeds=seeds)
    drained = cat.read("images_fetched")
    assert drained.count() > 0
    checks = cat.read("image_checks")
    bad = checks.where(
        ~F.col("decoded_ok") | ~F.col("caption_ok") | ~F.col("phash_ok")
    ).count()
    assert bad == 0
