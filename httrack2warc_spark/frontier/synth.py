"""Synthetic web + image tables (deterministic, no external data).

``SyntheticWeb`` implements the scheduler's fetch contract against two
DataFrames — ``pages(url_key, status, mime, size, localfile, image_id)`` and
``links(src_key, link_idx, dst_url)`` — standing in for real fetch I/O. Both
joins hash-partition on ``url_key``; the pages side of ``fetch`` is the
payload path (at 100 TB it's the Iceberg image table; the join strategy is
sort-merge there, broadcast here where the fixture is tiny).

``fixture_web`` reproduces the reference's golden crawl
(``test-resources/.../testcrawl-3.49-2.zip::hts-cache/new.txt`` — 9 rows over
``test.example.org``) so the scheduler's output can be asserted against the
reference's visit order (``Httrack2WarcTest.java:73-102``).

``generate_web`` builds an arbitrarily large deterministic crawl graph
entirely JVM-side (``spark.range`` + hash projections — generation itself is
distributed and O(rows/partition) per executor): a k-ary page tree per host
(page p links to pages pk+1..pk+k — BFS from page 0 reaches every page),
optional cross-host edges, and every Nth page an image with a deterministic
payload from ``functions.images``.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from httrack2warc_spark.functions.images import (
    decode_image,
    encode_image,
    phash64,
    synth_caption,
    synth_pixels,
)
from httrack2warc_spark.functions.urls import strip_protocol_col

__all__ = ["SyntheticWeb", "fixture_web", "generate_web", "generate_images"]


class SyntheticWeb:
    def __init__(self, pages: DataFrame, links: DataFrame, broadcast_pages: bool = False):
        self.pages = pages
        self.links = links
        self.broadcast_pages = broadcast_pages

    def fetch(self, selected: DataFrame) -> DataFrame:
        # name-based join against a renamed projection, never pages["col"]
        # attribute references: the level-block scheduler chains fetch →
        # discover → fetch in ONE lazy plan, so the pages relation appears
        # several times in one tree — dataset-tagged attribute refs trip the
        # ambiguous-self-join analyzer there, unique names resolve cleanly
        extra = ["body"] if "body" in self.pages.columns else []
        pages = self.pages.select(
            "url_key",
            *[F.col(c).alias(f"__pg_{c}")
              for c in ["status", "mime", "size", "localfile", "image_id", *extra]],
        )
        if self.broadcast_pages:
            pages = F.broadcast(pages)
        cols = [
            *[F.col(c) for c in selected.columns],
            F.coalesce(F.col("__pg_status"), F.lit(404)).alias("status"),
            F.col("__pg_mime").alias("mime"),
            F.coalesce(F.col("__pg_size"), F.lit(0)).alias("size"),
            F.col("__pg_localfile").alias("localfile"),
            F.col("__pg_image_id").alias("image_id"),
        ]
        # optional payload body (e.g. robots.txt text the scheduler parses
        # for dynamic rule discovery) — part of the fetch contract when the
        # pages table carries it
        if extra:
            cols.append(F.col("__pg_body").alias("body"))
        return selected.join(pages, "url_key", "left").select(*cols)

    def outlinks(self, fetched: DataFrame) -> DataFrame:
        src = fetched.select(
            F.col("url_key").alias("src_key"),
            F.col("url").alias("referrer"),
            F.col("seq").alias("parent_seq"),
            F.col("depth").alias("parent_depth"),
        )
        return src.join(self.links, "src_key").select(
            "parent_seq", "parent_depth", "link_idx", "dst_url", "referrer"
        )


# ---------------------------------------------------------------------------
# golden fixture graph (reference testcrawl-3.49-2)
# ---------------------------------------------------------------------------

_FIXTURE_PAGES = [
    # url_key, status, mime, size, localfile (new.txt columns; empty localfile = the F1 drop)
    ("test.example.org/robots.txt", 404, "text/html", 169, ""),
    ("test.example.org/", 200, "text/html", 353, "test.example.org/index.html"),
    ("test.example.org/style.css", 200, "text/css", 30, "test.example.org/style.css"),
    (
        "test.example.org/query.html?page=1&query=2&FOO=3&&BaR=4&&#anchor",
        200, "text/html", 34, "test.example.org/query3b6f.html",
    ),
    ("test.example.org/another", 200, "text/html", 37, "test.example.org/another.html"),
    ("test.example.org/redirect", 301, "text/html", 185, "test.example.org/redirect"),
    (
        "test.example.org/page%20WITH%20%22special%22%20chars.html",
        200, "text/html", 13, "test.example.org/page%20WITH%20_special_%20chars.html",
    ),
    ("test.example.org/image.gif", 200, "image/gif", 945, "test.example.org/image.gif"),
    ("test.example.org/image404.png", 404, "text/html", 169, "test.example.org/image404.png"),
]

_FIXTURE_LINKS = [
    # index page links in discovery order (hts-cache/new.txt '(from ...)' order)
    ("test.example.org/", 0, "http://test.example.org/style.css"),
    ("test.example.org/", 1, "http://test.example.org/query.html?page=1&query=2&FOO=3&&BaR=4&&#anchor"),
    ("test.example.org/", 2, "http://test.example.org/another"),
    ("test.example.org/", 3, "http://test.example.org/redirect"),
    ("test.example.org/", 4, "http://test.example.org/page%20WITH%20%22special%22%20chars.html"),
    ("test.example.org/", 5, "http://test.example.org/image.gif"),
    ("test.example.org/", 6, "http://test.example.org/image404.png"),
]


def fixture_web(spark: SparkSession) -> SyntheticWeb:
    pages = spark.createDataFrame(
        [(k, s, m, z, lf, None) for k, s, m, z, lf in _FIXTURE_PAGES],
        "url_key string, status int, mime string, size long, localfile string, image_id string",
    )
    links = spark.createDataFrame(
        _FIXTURE_LINKS, "src_key string, link_idx int, dst_url string"
    )
    return SyntheticWeb(pages, links, broadcast_pages=True)


# ---------------------------------------------------------------------------
# scaled deterministic generator
# ---------------------------------------------------------------------------


def generate_web(
    spark: SparkSession,
    n_hosts: int,
    pages_per_host: int,
    out_degree: int = 4,
    image_every: int = 10,
    cross_host_every: int = 50,
    num_partitions: int | None = None,
    host_prefix: str = "host",
) -> tuple[SyntheticWeb, list[str]]:
    """Deterministic host-tree web; returns (web, seed list = page 0 per host).

    ``host_prefix`` namespaces the hostnames (hostN / hotN / ...), so two
    generated webs can be unioned into one corpus without URL collisions —
    the skew-stress experiment builds a 50%-hot-host web that way."""
    n = n_hosts * pages_per_host
    base = spark.range(0, n, 1, num_partitions or spark.sparkContext.defaultParallelism)
    host = (F.col("id") / pages_per_host).cast("long")
    page = F.col("id") % pages_per_host
    is_img = (page % image_every == image_every - 1) & (page > 0)
    url = F.concat(
        F.lit(f"http://{host_prefix}"), host.cast("string"), F.lit(".example.com/page/"),
        page.cast("string"),
        F.when(is_img, F.lit(".gif")).otherwise(F.lit(".html")),
    )
    pages = base.select(
        strip_protocol_col(url).alias("url_key"),
        F.lit(200).alias("status"),
        F.when(is_img, F.lit("image/gif")).otherwise(F.lit("text/html")).alias("mime"),
        (F.pmod(F.xxhash64(F.col("id")), F.lit(65536)) + 128).alias("size"),
        F.regexp_replace(url, "^http://", "").alias("localfile"),
        F.when(is_img, F.concat(F.lit("img-"), F.col("id").cast("string"))).alias("image_id"),
    )

    # k-ary tree edges: page p -> pages pk+1 .. pk+k (same host), + periodic
    # cross-host edge from page 0
    child = [
        (F.col("id") % pages_per_host) * out_degree + F.lit(j + 1)
        for j in range(out_degree)
    ]
    edges = []
    for j, c in enumerate(child):
        dst_page = c
        dst_is_img = (dst_page % image_every == image_every - 1) & (dst_page > 0)
        dst_url = F.concat(
            F.lit(f"http://{host_prefix}"), host.cast("string"), F.lit(".example.com/page/"),
            dst_page.cast("string"),
            F.when(dst_is_img, F.lit(".gif")).otherwise(F.lit(".html")),
        )
        edges.append(
            base.where(dst_page < pages_per_host).select(
                F.concat(
                    F.lit(host_prefix), host.cast("string"), F.lit(".example.com/page/"),
                    page.cast("string"),
                    F.when(is_img, F.lit(".gif")).otherwise(F.lit(".html")),
                ).alias("src_key"),
                F.lit(j).cast("int").alias("link_idx"),
                dst_url.alias("dst_url"),
            )
        )
    links = edges[0]
    for e in edges[1:]:
        links = links.unionByName(e)
    if n_hosts > 1 and cross_host_every:
        cross = base.where(
            (page == 0) & (host % cross_host_every == 0)
        ).select(
            F.concat(
                F.lit(host_prefix), host.cast("string"), F.lit(".example.com/page/0.html")
            ).alias("src_key"),
            F.lit(out_degree).cast("int").alias("link_idx"),
            F.concat(
                F.lit(f"http://{host_prefix}"), ((host + 1) % n_hosts).cast("string"),
                F.lit(".example.com/page/0.html"),
            ).alias("dst_url"),
        )
        links = links.unionByName(cross)

    seeds = [f"http://{host_prefix}{h}.example.com/page/0.html" for h in range(n_hosts)]
    return SyntheticWeb(pages, links), seeds


def generate_images(
    spark: SparkSession,
    n: int,
    w: int = 32,
    h: int = 32,
    fmt_cycle: tuple[str, ...] = ("png", "jpeg", "png", "gif"),
    num_partitions: int | None = None,
    with_expected: bool = False,
    expected_patch: int | None = None,
) -> DataFrame:
    """Deterministic image+caption table matching BASELINE.json input_hint:
    (image_id, bytes, w, h, fmt, caption, phash). Generation runs in
    mapInPandas (distributed; payload bytes never touch the driver).

    ``with_expected=True`` additionally emits expected feature columns
    (exp_mean_r/g/b, exp_std_lum, exp_hist, exp_phash) computed at
    generation time by an INDEPENDENT numpy formulation over the decoded
    reconstruction — bincount histogram instead of np.histogram, E[x²]−E[x]²
    std instead of ndarray.std, flat per-channel means. A downstream feature
    pass that matches them proves the codec round-trip + Arrow plumbing +
    kernel math end-to-end, which is what lets the graded image queries be
    value-checked by a constant-table DuckDB oracle.

    ``expected_patch=p`` additionally emits ``exp_patch`` — row-major
    per-patch means over the p×p ViT grid, computed by reshape-and-sum
    (a different formulation than the patchify kernel's per-tile
    ``ndarray.mean``), for value-checking ``patchify_images``."""
    base = spark.range(0, n, 1, num_partitions or spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                image_id = f"img-{int(i)}"
                fmt = fmt_cycle[int(i) % len(fmt_cycle)]
                px = synth_pixels(image_id, w, h)
                data = encode_image(px, fmt)
                # phash over the *decoded* pixels so lossy formats stay stable
                recon = decode_image(data, fmt)
                row = (
                    image_id, data, w, h, fmt,
                    synth_caption(image_id),
                    phash64(recon),
                )
                if with_expected:
                    flat = recon.reshape(-1, 3).astype(np.float64)
                    lum = flat.mean(axis=1)
                    hist = np.bincount(
                        np.minimum(lum, 255.0).astype(np.int64) // 32,
                        minlength=8,
                    ) / max(1, lum.size)
                    var = float((lum * lum).mean() - lum.mean() ** 2)
                    row = row + (
                        float(flat[:, 0].mean()), float(flat[:, 1].mean()),
                        float(flat[:, 2].mean()),
                        float(np.sqrt(max(var, 0.0))),
                        hist.tolist(), phash64(recon),
                    )
                if expected_patch is not None:
                    p_ = expected_patch
                    gh, gw = recon.shape[0] // p_, recon.shape[1] // p_
                    # CENTER crop — must mirror patchify_images' offset rule
                    # exactly or the value oracle checks the wrong pixels
                    # for any dims that aren't multiples of the patch size
                    oy = (recon.shape[0] - gh * p_) // 2
                    ox = (recon.shape[1] - gw * p_) // 2
                    grid = recon[oy: oy + gh * p_, ox: ox + gw * p_, :] \
                        .astype(np.float64)
                    sums = grid.reshape(gh, p_, gw, p_, 3).sum(axis=(1, 3, 4))
                    row = row + ((sums / float(p_ * p_ * 3)).reshape(-1).tolist(),)
                rows.append(row)
            cols = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
            if with_expected:
                cols += ["exp_mean_r", "exp_mean_g", "exp_mean_b",
                         "exp_std_lum", "exp_hist", "exp_phash"]
            if expected_patch is not None:
                cols += ["exp_patch"]
            yield pd.DataFrame(rows, columns=cols)

    schema = (
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long"
    )
    if with_expected:
        schema += (
            ", exp_mean_r double, exp_mean_g double, exp_mean_b double, "
            "exp_std_lum double, exp_hist array<double>, exp_phash long"
        )
    if expected_patch is not None:
        schema += ", exp_patch array<double>"
    return base.mapInPandas(gen, schema=schema)
