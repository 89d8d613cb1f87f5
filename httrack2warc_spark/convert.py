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
    WARC_ROTATION_SIZE,
    cdx_lines_from_positions,
    format_warcinfo,
    warc_records,
    warcinfo_record,
    write_warc_files,
)
from httrack2warc_spark.sources.crawl import read_crawl
from httrack2warc_spark.sources.htslogs import read_crawl_meta

__all__ = ["convert", "main"]

CDX_HEADER = " CDX N b a m s k r M S V g"


def _write_sorted_text(df: DataFrame, target: Path, header: str) -> None:
    """Executor-side single-file text write for a globally sorted one-column
    DataFrame: each task writes its own sorted range as a part file (the
    orderBy's range exchange guarantees part-i < part-i+1), then the driver
    STREAMS the parts in order into ``target`` — O(io-buffer) driver memory.
    At 10^10 records the CDX body is hundreds of GB; the former
    ``[r.cdx for r in ...collect()]`` materialized all of it on the driver."""
    import shutil
    import tempfile

    target.parent.mkdir(parents=True, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=str(target.parent), prefix=".cdx-parts-")
    try:
        df.write.mode("overwrite").text(tmp)
        with open(target, "wb") as out_f:
            out_f.write((header + "\n").encode())
            # numeric part-index sort: past 99,999 tasks the index grows to
            # six digits and lexicographic order would put part-100000 before
            # part-99999, reordering the CDX body at the 10^10-record scale
            # this path targets
            for part in sorted(
                Path(tmp).glob("part-*"),
                key=lambda p: int(p.name.split("-")[1]),
            ):
                with open(part, "rb") as src:
                    shutil.copyfileobj(src, out_f)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _extract_tarball(tarball: str) -> tuple[str, str]:
    """S11 (``Httrack2Warc.java:92-147``): unpack a ``.tar.gz``/``.tgz`` crawl
    to a temp dir, normalize permissions (dirs 700, files 600 — the
    reference's ``fixPermissions``), and locate the directory containing
    ``hts-cache``. Returns (tmp_root, crawl_dir).

    ``filter="data"`` rejects absolute paths, ``..`` traversal, and special
    files — the explicit resolved-path guard the reference applies via its
    extraction sandbox (P21).
    """
    import os
    import tarfile
    import tempfile

    tmp = tempfile.mkdtemp(prefix="httrack2warc")
    with tarfile.open(tarball, "r:gz") as tf:
        tf.extractall(tmp, filter="data")
    for root, dirs, files in os.walk(tmp):
        for d in dirs:
            os.chmod(os.path.join(root, d), 0o700)
        for fn in files:
            os.chmod(os.path.join(root, fn), 0o600)
    for root, dirs, _files in os.walk(tmp):  # top-down == reference findFirst
        if "hts-cache" in dirs:
            return tmp, root
    raise IOError(f"Unable to find hts-cache directory in archive {tarball}")


def convert(
    spark: SparkSession,
    crawl_dir: str,
    output_dir: str,
    exclusions: list[str] | None = None,
    redirect_prefix: str | None = None,
    rewrite_links: bool = False,
    cdx_name: str | None = "index.cdx",
    warc_pattern: str = "crawl-%d.warc.gz",
    warc_size: int = WARC_ROTATION_SIZE,
    compress: bool = True,
    strict: bool = False,
    timezone: str = "UTC",
    warcinfo_extra: list[str] | None = None,
    redirect_file: str | None = None,
    cdx11: bool = True,
    payload_dedup: bool = False,
) -> DataFrame:
    """Returns the WARC-record DataFrame after writing warc/cdx files.

    ``warc_pattern``/``warc_size``: the reference's rotated-file naming and
    1 GiB size target (``Httrack2Warc.java:75-76``, ``RotatingFile.java``).
    The emitted CDX carries real compressed member offsets/lengths and the
    per-record rotated filename.

    ``redirect_file``: when set together with ``redirect_prefix``, synthetic
    redirect records (sub=3) go into their own rotated WARC set starting with
    its own warcinfo, while both sets share the one CDX — the reference's
    ``--redirect-file`` (``Httrack2Warc.java:155,161-163``, ``Main.java:113-116``).
    ``cdx11=False`` emits the 9-field legacy CDX (``CdxWriter.java:85-90``).
    """
    import os
    import shutil

    tmp_root = None
    if os.path.isfile(crawl_dir) and crawl_dir.endswith((".tar.gz", ".tgz")):
        tmp_root, crawl_dir = _extract_tarball(crawl_dir)
    try:
        result = _convert_dir(
            spark, crawl_dir, output_dir, exclusions, redirect_prefix,
            rewrite_links, cdx_name, warc_pattern, warc_size, compress, strict,
            timezone, warcinfo_extra, redirect_file, cdx11, payload_dedup,
        )
        if tmp_root is not None:
            # the extracted files vanish below; pin the returned records
            # (lineage truncation) so callers can still consume them
            result = result.localCheckpoint(eager=True)
        return result
    finally:
        if tmp_root is not None:
            shutil.rmtree(tmp_root, ignore_errors=True)


def _resolve_timezone(tz: str | None) -> str | None:
    """Accept ``system`` as a timezone value (the reference's default is the
    system zone, ``Httrack2Warc.java:76``; this engine defaults to UTC for
    determinism — ADVICE r2). Resolves to an IANA name when the host exposes
    one, else to a fixed ``±HH:MM`` offset."""
    if tz != "system":
        return tz
    import os
    import re as _re

    name = os.environ.get("TZ", "").lstrip(":")
    if name and "/" in name:
        return name
    try:
        link = os.readlink("/etc/localtime")
        m = _re.search(r"zoneinfo/(.+)$", link)
        if m:
            return m.group(1)
    except OSError:
        pass
    try:
        return Path("/etc/timezone").read_text().strip() or "UTC"
    except OSError:
        pass
    from datetime import datetime

    off = datetime.now().astimezone().utcoffset()
    total = int(off.total_seconds()) if off else 0
    sign = "+" if total >= 0 else "-"
    total = abs(total)
    return f"{sign}{total // 3600:02d}:{total % 3600 // 60:02d}"


def _tzinfo_of(tz: str):
    """tzinfo for either an IANA name or a ``±HH:MM`` fixed offset."""
    import re as _re
    from datetime import timedelta, timezone as _dt_tz

    m = _re.fullmatch(r"([+-])(\d{2}):(\d{2})", tz)
    if m:
        delta = timedelta(hours=int(m.group(2)), minutes=int(m.group(3)))
        return _dt_tz(delta if m.group(1) == "+" else -delta)
    from zoneinfo import ZoneInfo

    return ZoneInfo(tz)


def _convert_dir(
    spark: SparkSession,
    crawl_dir: str,
    output_dir: str,
    exclusions: list[str] | None,
    redirect_prefix: str | None,
    rewrite_links: bool,
    cdx_name: str | None,
    warc_pattern: str,
    warc_size: int,
    compress: bool,
    strict: bool,
    timezone: str = "UTC",
    warcinfo_extra: list[str] | None = None,
    redirect_file: str | None = None,
    cdx11: bool = True,
    payload_dedup: bool = False,
) -> DataFrame:
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    timezone = _resolve_timezone(timezone)
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
        redirect_prefix=redirect_prefix, strict=strict, timezone=timezone,
        payload_dedup=payload_dedup,
    )
    # P7: launch time shifts with the crawl zone like every WARC-Date
    # (Httrack2Warc.java:157 `crawl.getLaunchTime().atZone(timezone)`)
    launch = meta.launch_time
    if timezone not in (None, "UTC"):
        from datetime import timezone as _tzutc

        launch = launch.replace(tzinfo=_tzinfo_of(timezone)).astimezone(_tzutc.utc)
    launch_iso = launch.strftime("%Y-%m-%dT%H:%M:%SZ")
    # reference -I/--warcinfo: extra "KEY: VALUE" lines prepended
    # (Httrack2Warc.java:384-386, Main.java:92-94)
    extra = "".join(line + "\r\n" for line in (warcinfo_extra or []))
    warcinfo = format_warcinfo(meta, extra=extra)
    info = warcinfo_record(spark, warcinfo, launch_iso)
    all_recs = info.unionByName(recs)

    # --redirect-file: sub=3 records get their own rotated WARC set (with its
    # own warcinfo); the CDX still covers both sets, exactly like the
    # reference's shared CdxWriter (Httrack2Warc.java:155,161-163)
    split_redirects = redirect_file is not None and redirect_prefix is not None
    main_recs = recs.where(F.col("sub") != 3) if split_redirects else recs

    positions = write_warc_files(
        main_recs, str(out), name_pattern=warc_pattern, rotation_size=warc_size,
        compress=compress, warcinfo=warcinfo, warcinfo_date=launch_iso,
    )
    redirect_positions = None
    if split_redirects:
        redirect_positions = write_warc_files(
            recs.where(F.col("sub") == 3), str(out),
            name_pattern=redirect_file, rotation_size=warc_size,
            compress=compress, warcinfo=warcinfo, warcinfo_date=launch_iso,
        )

    if cdx_name:
        pos_all = (
            positions if redirect_positions is None
            else positions.unionByName(redirect_positions)
        )
        _write_sorted_text(
            cdx_lines_from_positions(pos_all, cdx11=cdx11),
            out / cdx_name, CDX_HEADER,
        )
    positions.unpersist()
    if redirect_positions is not None:
        redirect_positions.unpersist()

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
    p.add_argument("--redirect-file", default=None,
                   help="write synthetic redirect records to their own WARC "
                        "set with this name/pattern (reference --redirect-file; "
                        "requires --redirect-prefix)")
    p.add_argument("--rewrite-links", action="store_true")
    p.add_argument("--cdx", "--cdx-name", dest="cdx_name", default="index.cdx",
                   help="CDX output filename (reference --cdx; reference "
                        "emits no CDX unless given — this CLI defaults to "
                        "index.cdx)")
    p.add_argument("--no-cdx", action="store_true",
                   help="disable CDX output (the reference's default)")
    p.add_argument("--cdx9", action="store_true",
                   help="emit the 9-field legacy CDX format "
                        "(CdxWriter.java:85-90) instead of CDX-11")
    p.add_argument("-C", "--compression", choices=["none", "gzip"],
                   type=str.lower, default="gzip",
                   help="WARC record compression (reference -C/--compression)")
    p.add_argument("-q", "--quiet", action="count", default=0,
                   help="less logging (repeatable; reference -q)")
    p.add_argument("-v", "--verbose", action="count", default=0,
                   help="more logging (repeatable; reference -v)")
    p.add_argument("-n", "--name", dest="warc_pattern", default="crawl-%d.warc.gz",
                   help="WARC filename pattern (reference -n; %%d = file number)")
    p.add_argument("-s", "--size", dest="warc_size", type=int,
                   default=WARC_ROTATION_SIZE,
                   help="WARC rotation size target in bytes (reference -s)")
    p.add_argument("--no-compress", action="store_true",
                   help="alias for --compression none")
    p.add_argument("-I", "--warcinfo", action="append", default=[],
                   help="extra 'KEY: VALUE' line for the warcinfo record "
                        "(reference -I; repeatable)")
    p.add_argument("-Z", "--timezone", default="UTC",
                   help="timezone of the HTTrack logs (reference -Z; "
                        "reference defaults to the system zone, this CLI to UTC "
                        "for deterministic output — pass 'system' for the "
                        "reference behavior)")
    # Reference default is lax (Httrack2Warc.java:81 `strict = false`;
    # missing >399-status files are skipped with a warning). --strict opts in
    # to abort-on-issue; --lax is kept as an explicit no-op alias.
    p.add_argument("--payload-dedup", action="store_true",
                   help="write repeat payload captures as WARC revisit "
                        "records (identical-payload-digest profile) instead "
                        "of storing the payload again — beyond-reference "
                        "archive-dedup capability, off by default")
    p.add_argument("--strict", action="store_true",
                   help="abort on issues normally considered a warning")
    p.add_argument("--lax", action="store_true",
                   help="(default) skip missing error files (F3)")
    args = p.parse_args(argv)

    from httrack2warc_spark import get_spark

    spark = get_spark(app_name="httrack2warc")
    # -q/-v (Main.java:126-134): walk the level ladder from the default
    levels = ["ERROR", "WARN", "INFO", "DEBUG"]
    lvl = min(max(1 + args.verbose - args.quiet, 0), len(levels) - 1)
    spark.sparkContext.setLogLevel(levels[lvl])
    convert(
        spark,
        args.crawl_dir,
        args.outdir,
        exclusions=args.exclude,
        redirect_prefix=args.redirect_prefix,
        rewrite_links=args.rewrite_links,
        cdx_name=None if args.no_cdx else args.cdx_name,
        warc_pattern=args.warc_pattern,
        warc_size=args.warc_size,
        compress=not args.no_compress and args.compression != "none",
        strict=args.strict,
        timezone=args.timezone,
        warcinfo_extra=args.warcinfo,
        redirect_file=args.redirect_file,
        cdx11=not args.cdx9,
        payload_dedup=args.payload_dedup,
    )


if __name__ == "__main__":
    main()
