"""End-to-end HTTrack→WARC conversion (reference entry point 1:
``Main.java:59-176`` + ``Httrack2Warc.convert``, ``Httrack2Warc.java:87-283``).

One call composes the whole engine: crawl reconstruction (S1-S9) → optional
mirror-link rewrite (J3) → WARC record projection (K1/K4/K5) → WARC file(s) +
C-sorted CDX (K3/O1) → leftover audit (J4). Payload digest/serialization run
distributed; only the final byte-stream assembly of the .warc.gz is a driver
drain (the reference's sequential-file contract; table sinks are the scale
path).
"""

from __future__ import annotations

import argparse
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from httrack2warc_spark.operators.audit import leftover_files
from httrack2warc_spark.sinks.warc import (
    cdx_lines,
    format_warcinfo,
    warc_records,
    warcinfo_record,
    write_warc_file,
)
from httrack2warc_spark.sources.crawl import read_crawl
from httrack2warc_spark.sources.htslogs import read_crawl_meta

__all__ = ["convert", "main"]

CDX_HEADER = " CDX N b a m s k r M S V g"


def convert(
    spark: SparkSession,
    crawl_dir: str,
    output_dir: str,
    exclusions: list[str] | None = None,
    redirect_prefix: str | None = None,
    rewrite_links: bool = False,
    cdx_name: str | None = "index.cdx",
    warc_name: str = "crawl-0.warc.gz",
    compress: bool = True,
    strict: bool = False,
) -> DataFrame:
    """Returns the WARC-record DataFrame after writing warc/cdx files."""
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    meta = read_crawl_meta(crawl_dir)
    crawl = read_crawl(spark, crawl_dir)

    if rewrite_links:
        from httrack2warc_spark.operators.linkrewrite import rewrite_links as rl

        crawl = rl(spark, crawl)
        crawl = crawl.withColumn(
            "payload",
            F.when(
                F.col("rewritten").isNotNull(), F.encode("rewritten", "ISO-8859-1")
            ).otherwise(F.col("payload")),
        ).drop("rewritten")

    recs = warc_records(
        crawl, meta, exclusions=exclusions,
        redirect_prefix=redirect_prefix, strict=strict,
    )
    launch_iso = meta.launch_time.strftime("%Y-%m-%dT%H:%M:%SZ")
    info = warcinfo_record(spark, format_warcinfo(meta), launch_iso)
    all_recs = info.unionByName(recs)

    write_warc_file(all_recs, str(out / warc_name), compress=compress)

    if cdx_name:
        lines = [r.cdx for r in cdx_lines(recs, warc_name).collect()]
        (out / cdx_name).write_text(
            CDX_HEADER + "\n" + "\n".join(lines) + ("\n" if lines else "")
        )

    for r in leftover_files(spark, crawl_dir, crawl).collect():
        print(f"Unprocessed extra file: {r.file}")

    return all_recs


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(
        description="Convert an HTTrack crawl directory to WARC + CDX (Spark)."
    )
    p.add_argument("crawl_dir")
    p.add_argument("-o", "--outdir", default=".", help="output directory")
    p.add_argument("-x", "--exclude", action="append", default=[],
                   help="URL exclusion regex (full match; repeatable)")
    p.add_argument("--redirect-prefix", default=None)
    p.add_argument("--rewrite-links", action="store_true")
    p.add_argument("-C", "--cdx-name", default="index.cdx")
    p.add_argument("--warc-name", default="crawl-0.warc.gz")
    p.add_argument("--no-compress", action="store_true")
    # Reference default is lax (Httrack2Warc.java:81 `strict = false`;
    # missing >399-status files are skipped with a warning). --strict opts in
    # to abort-on-issue; --lax is kept as an explicit no-op alias.
    p.add_argument("--strict", action="store_true",
                   help="abort on issues normally considered a warning")
    p.add_argument("--lax", action="store_true",
                   help="(default) skip missing error files (F3)")
    args = p.parse_args(argv)

    from httrack2warc_spark import get_spark

    spark = get_spark(app_name="httrack2warc")
    convert(
        spark,
        args.crawl_dir,
        args.outdir,
        exclusions=args.exclude,
        redirect_prefix=args.redirect_prefix,
        rewrite_links=args.rewrite_links,
        cdx_name=args.cdx_name,
        warc_name=args.warc_name,
        compress=not args.no_compress,
        strict=args.strict,
    )


if __name__ == "__main__":
    main()
