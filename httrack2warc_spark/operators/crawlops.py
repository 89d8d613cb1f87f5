"""Crawl-frontier hygiene + training-batch prep operators, all JVM-side.

Four operators a production crawl/curation pipeline runs constantly that
none of the other modules cover:

* ``canonicalize_query_col`` — query-string normalization (sort params,
  drop tracking params, strip fragments).  The reference normalizes query
  strings during link rewriting (``HtsUtil.java`` percent codecs keep the
  query verbatim; dedup happens on the *canonical* form) — at web scale
  the same page is discovered under thousands of ``utm_*`` permutations,
  and canonicalizing BEFORE the url_seen probe is the difference between
  storing one key and storing every permutation.
* ``trap_signals`` — crawler-trap heuristics (path depth, repeated path
  segments, query-param explosion) computed as one pure Column struct.
  Calendar CGIs and mirror loops generate unbounded URL spaces; the trap
  gate bounds the frontier *before* politeness budgeting.
* ``retry_schedule`` — capped exponential backoff with deterministic
  md5-derived jitter for failed fetches.  Exact integer microseconds so
  the schedule is reproducible across engines and across resume.
* ``assign_aspect_buckets`` — aspect-ratio bucketing for image-training
  batch assembly (the multimodal-pipeline step that groups (w, h) images
  into fixed-AR buckets so a batch pads minimally).  Bucket choice is
  exact integer arithmetic: comparing ``w/h`` against ``n/d`` uses
  cross-multiplied |w*d - h*n| rescaled to a common denominator — no
  float enters the decision, so Spark and any SQL oracle agree
  bit-for-bit.

Scale notes: every operator here is map-only except the final per-bucket
count (a tiny aggregate on ≤ len(buckets) keys).  ``trap_signals`` and
``canonicalize_query_col`` run inside whole-stage codegen; the bucket
argmin folds over a literal array with ``F.aggregate`` — no explode, no
window, no shuffle on the image id.  Expensive subtrees stay in argument
position per the lambda-body re-evaluation rule (operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from httrack2warc_spark.operators.dedup import md5_prefix_long

__all__ = [
    "host_suffixes",
    "domain_blocklist_filter",
    "robots_sitemap_outlinks",
    "canonicalize_query_col",
    "trap_signals",
    "retry_schedule",
    "assign_aspect_buckets",
    "pack_image_batches",
    "sitemap_locs",
    "sitemap_outlinks",
    "xml_unescape_col",
    "DEFAULT_TRACKING_RE",
    "DEFAULT_ASPECT_BUCKETS",
    "SITEMAP_LOC_RE",
    "SITEMAP_LINK_IDX_OFFSET",
]

# Anchored full-match (rlike is substring-match — anchors are load-bearing):
# a param is tracking if its NAME matches, with or without a value.
DEFAULT_TRACKING_RE = (
    r"^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|igshid|mc_eid|_ga|ref)(=.*)?$"
)


def canonicalize_query_col(
    url: Column, tracking_re: str = DEFAULT_TRACKING_RE
) -> Column:
    """Normalize a URL's query string: strip the fragment, drop empty and
    tracking params, sort the survivors lexicographically, rejoin.

    Pure Column expression (split/filter/array_sort/array_join — all
    codegen'd); the param list is tiny so the per-element lambda
    re-evaluation hazard doesn't apply.  A URL with no surviving params
    loses its ``?`` entirely — ``/p`` and ``/p?utm_source=x`` canonicalize
    identically, which is the dedup point.
    """
    nofrag = F.substring_index(url, "#", 1)
    base = F.substring_index(nofrag, "?", 1)
    query = F.regexp_extract(nofrag, r"\?(.*)$", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(tracking_re),
        )
    )
    return F.when(
        F.size(kept) > 0, F.concat(base, F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(base)


def trap_signals(
    url: Column,
    max_depth: int = 8,
    max_repeats: int = 2,
    max_params: int = 8,
) -> Column:
    """Crawler-trap heuristics as one struct Column:
    ``(path_depth, repeated_segments, n_params, is_trap)``.

    * ``path_depth`` — number of non-empty path segments.
    * ``repeated_segments`` — segments minus distinct segments (a mirror
      loop like ``/a/b/a/b/a/b`` scores 4; any legitimate once-repeated
      segment scores 1, under the default threshold).
    * ``n_params`` — non-empty query params (calendar/session CGIs explode
      here).
    * ``is_trap`` — any signal over its threshold.

    All C-level regex + array ops; apply BEFORE the url_seen probe so trap
    URLs never enter the frontier or the seen set.
    """
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    params = F.filter(F.split(query, "&"), lambda p: p != "")
    depth = F.size(segs)
    repeats = depth - F.size(F.array_distinct(segs))
    n_params = F.size(params)
    return F.struct(
        depth.alias("path_depth"),
        repeats.alias("repeated_segments"),
        n_params.alias("n_params"),
        (
            (depth > max_depth)
            | (repeats >= max_repeats)
            | (n_params > max_params)
        ).alias("is_trap"),
    )


def retry_schedule(
    failures: DataFrame,
    url_col: str = "url",
    attempt_col: str = "attempt",
    ts_col: str = "last_ts",
    base_s: int = 30,
    cap_s: int = 86_400,
    jitter_mod_s: int = 60,
) -> DataFrame:
    """Capped exponential backoff for fetch retries, exact to the
    microsecond: ``delay = min(base_s << attempt, cap_s) + jitter`` where
    jitter is an md5 draw on ``url:attempt`` mod ``jitter_mod_s``
    (deterministic — a resumed crawl recomputes the identical schedule,
    and thundering herds on a shared host spread out).

    Returns the input plus ``delay_s`` (BIGINT seconds) and ``next_us``
    (BIGINT epoch microseconds).  Integer end-to-end: ``unix_micros`` is
    bit-exact across engines where a double epoch is not (build notes).
    Map-only — no shuffle, no Python.
    """
    attempt = F.col(attempt_col).cast("int")
    # clamp the shift so a pathological attempt count can't overflow the
    # long; 2^32 * base already exceeds any sane cap
    # python F.shiftleft takes numBits as a literal int only — go through
    # the SQL function, which accepts a Column shift amount
    delay_core = F.least(
        F.call_function(
            "shiftleft",
            F.lit(int(base_s)).cast("long"),
            F.least(attempt, F.lit(32)),
        ),
        F.lit(int(cap_s)).cast("long"),
    )
    jitter = (
        md5_prefix_long(
            F.concat(F.col(url_col), F.lit(":"), attempt.cast("string"))
        )
        % int(jitter_mod_s)
    )
    delay = (delay_core + jitter).alias("delay_s")
    return failures.withColumn("delay_s", delay).withColumn(
        "next_us",
        F.unix_micros(F.col(ts_col).cast("timestamp"))
        + F.col("delay_s") * F.lit(1_000_000).cast("long"),
    )


# (n, d) aspect-ratio buckets, the usual SD-training ladder around square
DEFAULT_ASPECT_BUCKETS: tuple[tuple[int, int], ...] = (
    (1, 1),
    (4, 3),
    (3, 4),
    (3, 2),
    (2, 3),
    (16, 9),
    (9, 16),
)


def assign_aspect_buckets(
    images: DataFrame,
    w_col: str = "w",
    h_col: str = "h",
    buckets: tuple[tuple[int, int], ...] = DEFAULT_ASPECT_BUCKETS,
    base: int = 64,
) -> DataFrame:
    """Assign each image to the nearest aspect-ratio bucket, exactly.

    ``|w/h - n_i/d_i|`` ranks identically to ``|w*d_i - h*n_i| * (S/d_i)``
    where ``S = prod(d_j)`` — pure integer arithmetic, so the argmin is
    deterministic and any SQL engine reproduces it bit-for-bit (the
    float-free cross-multiplication trick).  Ties break toward the earlier
    bucket in ``buckets``.

    The argmin FOLDS over a literal array (``F.aggregate``) instead of
    explode + per-image window: map-only, no shuffle on the image id, no
    7× row blowup through an exchange — at 10^10 images the explode form
    shuffles 7×10^10 rows to rank them, this form shuffles nothing.

    Returns the input plus ``bucket_n``, ``bucket_d``, ``target_w``,
    ``target_h`` (``n*base`` × ``d*base``).
    """
    scale = 1
    for _, d in buckets:
        scale *= d
    lits = F.array(
        *[
            F.struct(
                F.lit(n).alias("n"),
                F.lit(d).alias("d"),
                F.lit(scale // d).alias("wt"),
            )
            for n, d in buckets
        ]
    )
    w = F.col(w_col).cast("long")
    h = F.col(h_col).cast("long")
    # fold accumulator carries only (key, n, d) — ties break toward the
    # earlier literal via the strict '<', no index field needed
    best = F.aggregate(
        lits,
        F.struct(
            F.lit(None).cast("long").alias("key"),
            F.lit(0).alias("n"),
            F.lit(0).alias("d"),
        ),
        lambda acc, b: F.when(
            acc["key"].isNull()
            | (F.abs(w * b["d"] - h * b["n"]) * b["wt"] < acc["key"]),
            F.struct(
                (F.abs(w * b["d"] - h * b["n"]) * b["wt"]).alias("key"),
                b["n"].alias("n"),
                b["d"].alias("d"),
            ),
        ).otherwise(acc),
    )
    out = images.withColumn("__b", best)
    return (
        out.withColumn("bucket_n", F.col("__b.n"))
        .withColumn("bucket_d", F.col("__b.d"))
        .withColumn("target_w", F.col("__b.n") * base)
        .withColumn("target_h", F.col("__b.d") * base)
        .drop("__b")
    )


# ---------------------------------------------------------------------------
# sitemap ingestion (sitemaps.org XML: <urlset>/<sitemapindex> of <loc> urls)
# ---------------------------------------------------------------------------

# <loc> content in document order; tolerant of surrounding whitespace.
SITEMAP_LOC_RE = r"<loc>\s*([^<\s][^<]*?)\s*</loc>"


def xml_unescape_col(s: Column) -> Column:
    """Decode the five predefined XML entities. ``&amp;`` LAST — so the
    escaped text ``&amp;lt;`` correctly decodes to the literal ``&lt;``,
    never to ``<``."""
    out = s
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"),
                    ("&quot;", '"'), ("&apos;", "'"), ("&amp;", "&")):
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def sitemap_locs(body: Column) -> Column:
    """``array<string>`` of a sitemap document's ``<loc>`` URLs in document
    order, XML-entity-decoded (sitemaps.org requires entity-escaping URLs).
    Works for both ``<urlset>`` leaf sitemaps and ``<sitemapindex>`` index
    files (whose locs are child sitemap URLs — enqueue them and the nesting
    chains naturally). Pure codegen: one regexp_extract_all + a transform
    of constant replaces; the entity chain sits in ARGUMENT position of the
    transform lambda only via cheap literals, so per-element re-evaluation
    costs nothing."""
    return F.transform(
        F.regexp_extract_all(body, F.lit(SITEMAP_LOC_RE), F.lit(1)),
        lambda s: xml_unescape_col(s),
    )


# sitemap-discovered links order AFTER the page's real outlinks (reference
# discipline: link_idx is the within-parent discovery order; real links are
# small ints)
SITEMAP_LINK_IDX_OFFSET = 1_000_000


def is_sitemap_row(url_col: str = "url", body_col: str = "body") -> Column:
    """THE sitemap-document predicate (shared by ``sitemap_outlinks`` and
    the scheduler's pages drain, which must exclude exactly the rows the
    discovery path treats as sitemaps): URL looks like ``sitemap*.xml``
    (cheap test first) or the body opens a ``<urlset>``/``<sitemapindex>``
    root."""
    return F.col(body_col).isNotNull() & (
        F.col(url_col).rlike(r"(?i)sitemap[^/]*\.xml(\?.*)?$")
        | F.col(body_col).rlike(r"(?i)<(urlset|sitemapindex)[\s>]")
    )


def sitemap_outlinks(
    fetched: DataFrame,
    body_col: str = "body",
    url_col: str = "url",
    seq_col: str = "seq",
    depth_col: str = "depth",
) -> DataFrame:
    """Turn fetched sitemap documents into discovery outlink rows
    ``(parent_seq, parent_depth, link_idx, dst_url, referrer)`` — the same
    shape the web's ``outlinks`` contract emits, so the scheduler unions
    them into one discovery pass (one probe, one dedup, one politeness
    plan; sitemap URLs get no special path downstream).

    A row is a sitemap if its URL looks like one (``sitemap*.xml``, the
    cheap test, evaluated first) or its body opens a ``<urlset>`` /
    ``<sitemapindex>`` root (the body regex only runs on rows with a
    non-null body — at scale, gate the fetch contract so only XML bodies
    are carried this far). ``link_idx = SITEMAP_LINK_IDX_OFFSET + position``
    keeps the within-parent order deterministic and AFTER real page links.
    Map-only: filter + posexplode, no shuffle.
    """
    return (
        fetched.where(is_sitemap_row(url_col, body_col))
        .select(
            F.col(seq_col).alias("parent_seq"),
            F.col(depth_col).alias("parent_depth"),
            F.col(url_col).alias("referrer"),
            F.posexplode(sitemap_locs(F.col(body_col))).alias("__pos", "dst_url"),
        )
        .select(
            "parent_seq",
            "parent_depth",
            (F.lit(SITEMAP_LINK_IDX_OFFSET) + F.col("__pos"))
            .cast("int")
            .alias("link_idx"),
            "dst_url",
            "referrer",
        )
    )


def pack_image_batches(
    images: DataFrame,
    batch_size: int,
    bucket_cols: tuple[str, ...] = ("bucket_n", "bucket_d"),
    order_cols: tuple[str, ...] = ("image_id",),
    drop_last: bool = False,
    num_partitions: int | None = None,
    cache_handle: list | None = None,
) -> DataFrame:
    """Pack bucketed images into fixed-size training batches: within each
    aspect bucket, rank images by ``order_cols`` (must be tie-free) and
    assign ``batch_idx = rank_in_bucket DIV batch_size``.  ``drop_last``
    removes the incomplete tail batch per bucket (the training-loader
    convention).

    Scale: a window PARTITIONED BY bucket funnels 10^10 images through
    ~7 reducers (one per aspect bucket) — the skew disaster.  Instead the
    rank rides the engine's ranged global-sequence primitive
    (operators/sequence.py with_global_seq: repartitionByRange over
    (bucket…, order…), per-partition row_number + an offsets collect —
    fully parallel), and per-bucket ranks are recovered by subtracting
    each bucket's min seq, a ≤len(buckets)-row aggregate broadcast back.
    Integer arithmetic end-to-end (``DIV``, never float division).
    ``cache_handle`` passes through to with_global_seq (ranged mode
    persists the range-partitioned input; unpersist after materializing).
    """
    from httrack2warc_spark.operators.sequence import with_global_seq

    order = [F.col(c) for c in (*bucket_cols, *order_cols)]
    seq = with_global_seq(
        images,
        order,
        mode="ranged",
        out_col="__seq",
        num_partitions=num_partitions,
        cache_handle=cache_handle,
    )
    stats = seq.groupBy(*bucket_cols).agg(
        F.min("__seq").alias("__min"), F.count(F.lit(1)).alias("__n")
    )
    out = (
        seq.join(F.broadcast(stats), list(bucket_cols))
        .withColumn("rank_in_bucket", F.col("__seq") - F.col("__min"))
        .withColumn("batch_idx", F.expr(f"rank_in_bucket DIV {int(batch_size)}"))
    )
    if drop_last:
        out = out.where(
            F.col("rank_in_bucket")
            < F.expr(f"(__n DIV {int(batch_size)}) * {int(batch_size)}")
        )
    return out.drop("__seq", "__min", "__n")


def host_suffixes(host: Column) -> Column:
    """array<string> of a host's registrable-suffix chain, most-specific
    first: ``a.b.example.com`` → [a.b.example.com, b.example.com,
    example.com, com]. The per-element slice references the split array
    (cheap: hosts are ≤ ~6 labels — the CollapseProject re-eval costs
    O(labels²) on a tiny tree, unlike the shingle case)."""
    parts = F.split(host, r"\.")
    return F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda i: F.concat_ws(".", F.slice(parts, i, F.size(parts))),
    )


def domain_blocklist_filter(
    df: DataFrame,
    host_col: str,
    blocklist: DataFrame,
    domain_col: str = "domain",
    keep: bool = False,
) -> DataFrame:
    """Domain-hierarchy blocklist gate — the SafeBrowsing/ad-list style
    crawler filter regex exclusions don't express: a listed ``domain``
    blocks the exact host AND every subdomain (``example.com`` blocks
    ``a.b.example.com``), nothing else (``notexample.com`` stays). With
    ``keep=True`` the list is an ALLOWLIST (only matching hosts survive).

    Scale: each row explodes to its ≤ ~6 host suffixes and equi-joins the
    (broadcast) blocklist on the suffix string — never a LIKE/endswith
    cross join, which would be a BroadcastNestedLoopJoin over |rules|
    comparisons per row. Flagged ids come back through one left_anti
    (or left_semi) on the row's own id-free key: the host itself, so the
    gate composes as a plain column filter with no id contract.
    """
    suffixes = df.select(F.col(host_col).alias("__h")).distinct().select(
        "__h", F.explode(host_suffixes(F.col("__h"))).alias("__sfx")
    )
    hit_hosts = (
        suffixes.join(
            F.broadcast(blocklist.select(F.col(domain_col).alias("__sfx"))),
            "__sfx",
        )
        .select("__h")
        .distinct()
    )
    how = "left_semi" if keep else "left_anti"
    return df.join(
        hit_hosts.select(F.col("__h").alias(host_col)), host_col, how
    )


#: RFC 9309 §2.3 allows non-group records; the sitemaps.org extension is the
#: ubiquitous one. Case-insensitive, per-line, value = first non-space run.
ROBOTS_SITEMAP_RE = r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)"

#: robots-declared sitemaps order after page links AND after body-discovered
#: sitemap entries within the same parent
ROBOTS_SITEMAP_LINK_IDX_OFFSET = 2 * SITEMAP_LINK_IDX_OFFSET


def robots_sitemap_outlinks(
    fetched: DataFrame,
    body_col: str = "body",
    url_col: str = "url",
    seq_col: str = "seq",
    depth_col: str = "depth",
) -> DataFrame:
    """``Sitemap:`` directives in fetched robots.txt bodies (the
    sitemaps.org extension every large site uses) → discovery outlink rows
    in the ``sitemap_outlinks`` shape, so declared sitemaps enter the SAME
    probe/dedup/politeness plan as every other URL; once fetched, their
    ``<urlset>`` bodies chain through ``sitemap_outlinks`` naturally.
    Map-only: one regexp_extract_all + posexplode, no shuffle.
    """
    return (
        fetched.where(F.col(body_col).isNotNull())
        .select(
            F.col(seq_col).alias("parent_seq"),
            F.col(depth_col).alias("parent_depth"),
            F.col(url_col).alias("referrer"),
            F.posexplode(
                F.regexp_extract_all(
                    F.col(body_col), F.lit(ROBOTS_SITEMAP_RE), F.lit(1)
                )
            ).alias("__pos", "dst_url"),
        )
        .select(
            "parent_seq",
            "parent_depth",
            (F.lit(ROBOTS_SITEMAP_LINK_IDX_OFFSET) + F.col("__pos"))
            .cast("int")
            .alias("link_idx"),
            "dst_url",
            "referrer",
        )
    )
