"""Iterative URL-frontier / fetch scheduler.

This is the engine the north_rule asks for: the reference *replays* an
HTTrack crawl's visit order out of ``hts-cache/new.txt`` (single-threaded,
``HttrackCrawl.java:117-147``); this scheduler *produces* that order from a
seed list + link graph + politeness budget, as a driver-side loop of pure
DataFrame rounds:

  round r:
    1. eligible  = frontier rows allowed by robots rules
    2. selected  = per-host top-k (politeness budget; salted variant when the
                   frontier is host-skewed) — O3/O4
    3. seq       = global visit order: row_number over the round's selected
                   rows by the total key (priority, parent_seq, link_idx, url)
                   — reproduces HTTrack's BFS-in-discovery-order; a synthetic
                   robots.txt fetch is injected before a host's first fetch
                   (HTTrack behavior, visible as row 1 of the fixture new.txt)
    4. fetch     = join against the web (payload source) → crawl_log rows
    5. discover  = outlinks of fetched pages → canonicalize (the reference's
                   fixupUrl, P1) → exclusion regexes (F2) → robots → dedup
                   within batch (first-occurrence, A1/A2) → Bloom/cuckoo-gated
                   anti-join vs url_seen (J6) → new frontier rows
    6. commit    = url_seen ∪ new keys; summaries merged; crawl_log/metrics
                   appended; catalog snapshot tagged round-r (resume point)

Every round's state lives in catalog tables (Iceberg in production, versioned
parquet here), so the loop is checkpoint-resumable: ``FrontierScheduler.resume``
re-opens the latest round-r snapshot and continues. Per-partition lineage
metrics (fetched/new/dup counts per MurmurHash3 partition) are appended with
every snapshot.

Visit-order determinism: every ordering is over the total key
``(priority, parent_seq, link_idx, url, robots-first flag)`` — no reliance on
partition order, no uuid()/now() nondeterminism anywhere.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from httrack2warc_spark.functions.urls import (
    canonicalize_urls_udf,
    strip_protocol_col,
    url_host_col,
)
from httrack2warc_spark.operators.seen import (
    SUMMARY_SCHEMA,
    add_partition_and_hashes,
    filter_new_urls,
    merge_summaries,
)
from httrack2warc_spark.operators.topk import (
    per_key_topk,
    salted_per_key_topk,
    waterfill_budgets,
)
from httrack2warc_spark.operators.dedup import first_occurrence
from httrack2warc_spark.sinks.tables import TableCatalog

__all__ = ["CrawlConfig", "FrontierScheduler"]

FRONTIER_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("url_key", StringType(), False),
        StructField("host", StringType(), False),
        StructField("depth", IntegerType(), False),
        StructField("priority", IntegerType(), False),
        StructField("parent_seq", LongType(), False),
        StructField("link_idx", IntegerType(), False),
        StructField("referrer", StringType(), True),
    ]
)

SEEN_SCHEMA = StructType(
    [
        StructField("url_key", StringType(), False),
        StructField("url", StringType(), False),
        StructField("enqueued_round", IntegerType(), False),
    ]
)


@dataclass
class CrawlConfig:
    num_parts: int = 32                    # MurmurHash3 url_key partitions
    default_host_budget: int = 1_000_000   # per-host fetches per round
    # global per-round fetch cap (cluster capacity), water-filled across
    # hosts max-min fairly (operators/topk.py::waterfill_budgets) so a
    # mega-host cannot starve the tail; None = uncapped. Costs ~3 extra
    # metadata-scale jobs per round — opt in only when a real rate cap
    # exists. Composes with per-host budgets/Crawl-delay (allocation never
    # exceeds either).
    round_capacity: int | None = None
    max_rounds: int = 100
    max_depth: int | None = None
    exclusions: list[str] = field(default_factory=list)  # full-match regexes (F2)
    fetch_robots: bool = True
    # skew-aware politeness variant: True/False force it; "auto" engages it
    # when the frontier's average rows-per-host (both from parquet footers —
    # no Spark job) exceeds salt_auto_threshold, i.e. when single hosts are
    # big enough to make one reducer the per-key-top-k straggler. The salted
    # plan is order-identical (tests/test_operators.py), so auto-switching
    # never changes the visit order.
    salted_topk: bool | str = "auto"
    salt_auto_threshold: int = 50_000
    salt_buckets: int = 16
    summary_kind: str = "bloom"            # or "cuckoo"
    summary_capacity_per_part: int = 1_000_000
    summary_fpp: float = 0.01
    use_summaries: bool = True
    # merge new keys into the filter bytes every K rounds; in between,
    # probe-misses anti-join the (small) unsummarized tail — at 10^10 keys
    # this avoids rewriting multi-GB filters every round
    summary_every: int = 1
    parallel_commits: bool = True          # independent table commits in threads
    # pipeline round r's ENTIRE commit tail — frontier/hosts/summary writes,
    # crawl_log/metrics/image appends, url_seen compaction, snapshot,
    # retention, unpersists — into a background task that overlaps round
    # r+1's plan/top-k/fetch phase. Only the url_seen append (the discovery
    # materializer) and one next-frontier count stay foreground. Round r+1's
    # overlapped phase reads NOTHING from the catalog: it runs on the cached
    # in-memory handoff (next frontier + hosts set + lagged host count), and
    # makes no catalog read/commit of its own until the tail has been
    # flushed, so the deferred snapshot still captures a consistent,
    # fully-committed catalog. This hides most of the fixed local-mode job
    # latency per round (the loop is latency-bound at sandbox scale; on a
    # real cluster the same overlap hides the commit round-trips behind
    # hours of dataflow).
    pipelined_commits: bool = True
    # "single" = one-window seq stamping (small rounds); "ranged" =
    # range-partitioned distributed stamping (10^9-row rounds); "auto" =
    # ranged when the round's frontier exceeds seq_single_max rows (the
    # one-partition window is a driver-adjacent funnel at 10^9 rows)
    seq_mode: str = "auto"
    seq_single_max: int = 100_000
    # store url_seen as Spark-bucketed filesets on url_key (Iceberg bucket
    # partitioning stand-in): the exact-confirm anti-join reads them with no
    # exchange/sort on the seen side — at 10^10 keys the per-round reshuffle
    # of the whole seen set is the scale killer this removes
    bucketed_seen: bool = True
    # size-tiered compaction threshold for url_seen filesets: the confirm
    # anti-join chains one join per fileset, so unbounded appends make the
    # chain O(rounds); compaction merges the small tails (never the big base)
    seen_compact_max: int = 6
    # "auto": disable AQE while rounds are small (<= seq_single_max frontier
    # rows) — per-stage adaptive replanning costs a driver round-trip per
    # exchange, which dominates latency-bound small rounds (measured: 12-round
    # 100k-URL crawl 49 s with AQE, 39 s without); big rounds get AQE back
    # (skew joins, runtime coalescing). "on"/"off" force it.
    aqe_mode: str = "auto"
    # discovery-gate probe strategy. False (default): the pandas cogroup
    # (one Arrow pass folds dedup + Bloom probe; measured FASTER end-to-end
    # at sandbox scales — local[2] 14.1k vs 11.3k URLs/s, local[8] 28.4k vs
    # 25.8k on the 2M-URL loop — because the grouped numpy sort+dedupe beats
    # Spark's window sort). True: the all-JVM codegen path
    # (probe_summaries_cols — zero Python in the gate, bit tests inside
    # WholeStageCodegen); parity-tested row-for-row, the right trade where
    # Python worker pools are the constraint (many-executor clusters with
    # low spark.python.worker counts). bloom summaries only.
    jvm_probe: bool = False
    # retention: keep the last K round snapshots; older ones expire after each
    # round and `vacuum` reclaims their filesets + stale bucketed-table
    # registrations (Iceberg expire_snapshots + remove_orphan_files). None =
    # keep everything (full time travel, unbounded disk over a long crawl).
    keep_snapshots: int | None = None
    # dynamic robots discovery: when the web's fetch contract carries a
    # ``body`` column, robots.txt responses fetched during the crawl are
    # parsed (functions.robots.robots_rules, RFC 9309 incl. wildcards) and
    # merged into the active rule set, taking effect from the NEXT round —
    # the rules a real crawler obeys are the ones it fetched, not a static
    # config. The statically-passed ``robots`` DataFrame (if any) seeds the
    # set; discovered Crawl-delay values feed the same per-round budget caps.
    discover_robots: bool = True
    robots_user_agent: str = "*"
    # frontier tombstones collapse (rewrite adds := live set, truncate
    # removals) once they exceed max(this, live-row count) — the merge-on-
    # read compaction trigger. The rewrite scans the already-cached next
    # frontier, so compaction is cheap; the floor just stops tiny crawls
    # from compacting every round.
    frontier_tombstone_min: int = 1000
    # commit cadence: flush the table-commit wave (url_seen/frontier/hosts/
    # summary/log/metrics/images + compaction + snapshot + retention) every K
    # rounds instead of every round. Rounds in between run ENTIRELY on the
    # in-memory handoff state (cached frontier/hosts/summary + pending seen
    # deltas folded into the discovery anti-join), so their fixed cost is one
    # fetch job + one seen-delta materialization. Pure commit timing — visit
    # order, budgets, robots and the url-seen set are bit-identical for any
    # K (tests/test_scheduler.py asserts log equality). Trades: resume
    # granularity becomes K rounds (snapshots land on flush rounds only) and
    # up to K rounds of deltas stay cached between flushes.
    commit_every: int = 1
    # fuse K BFS levels into one foreground materialization when the round
    # is provably one whole level (robots off, no budget can bind): levels
    # 2..K chain lazily on the previous level's lineage and the block
    # materializes once — (K-1) fewer foreground job barriers per block.
    # Order-safe by construction: with a non-binding budget every frontier
    # row is fetched, so round == BFS level and priority == depth == level;
    # the global visit order (priority, parent_seq, link_idx, url) already
    # sorts level-major, so stamping seq once over the block's union equals
    # stamping each level separately (tests assert log equality). Budget-
    # safe post-hoc: a block whose in-flight level outgrew the default
    # budget is discarded untouched and those rounds re-run per-round (one
    # wasted job, never a semantic change). 1 = off.
    batch_levels: int = 1
    # when set (seconds of fetch time a round represents) and the robots
    # DataFrame carries a crawl_delay column (functions.robots.robots_rules),
    # a host's per-round budget is additionally capped at
    # max(1, floor(round_seconds / crawl_delay)) — the RFC-era Crawl-delay
    # politeness contract expressed in round units.
    round_seconds: float | None = None
    # frontier hygiene gates (operators/crawlops.py), both OFF by default so
    # the golden reference-parity visit order is untouched:
    # canonicalize_query — after WHATWG canonicalization, normalize the query
    # string (strip fragment, drop empty + tracking params, sort survivors)
    # BEFORE url_key derivation, so `?utm_*` permutations of one page collapse
    # to ONE seen key instead of one stored key per permutation. Pure Column,
    # adds nothing to the probe's shuffle bill.
    canonicalize_query: bool = False
    # trap_guard — drop URLs whose trap_signals struct flags them (path depth
    # / repeated path segments / query-param explosion over the thresholds
    # below) at the same gate as the exclusion regexes: trap URLs never reach
    # the url_seen probe, the frontier, or the summaries. Map-only.
    trap_guard: bool = False
    trap_max_depth: int = 8
    trap_max_repeats: int = 2
    trap_max_params: int = 8
    # domain-hierarchy blocklist (operators/crawlops.py semantics): each
    # entry blocks the exact host AND every subdomain, nothing else.
    # Applied at the same gate as the exclusion regexes, so blocked URLs
    # never reach the url_seen probe, frontier or summaries. ≤32 entries
    # fold into a pure-Column predicate (zero joins); larger lists run the
    # suffix-explode equi-join (domain_blocklist_filter). OFF by default.
    blocklist: list[str] = field(default_factory=list)
    # ingest extraction (functions/text.py::html_to_text): when the fetch
    # contract carries a ``body`` column, fetched page bodies are run
    # through the pure-Column HTML extraction chain and drained into a
    # ``pages`` table (url, url_key, seq, round, title, text, n_tokens) on
    # the same deferred commit wave as images — the crawl's output IS the
    # documents table, ready for the corpus operators. Robots bodies are
    # excluded. OFF by default (pure drain; visit order untouched).
    extract_text: bool = False
    # sitemap ingestion (operators/crawlops.py::sitemap_outlinks): when the
    # fetch contract carries a ``body`` column, <loc> entries of fetched
    # sitemap documents (sitemap*.xml URL, or an XML body opening a
    # <urlset>/<sitemapindex> root) are unioned into the round's discovery
    # as outlinks of the sitemap page — same probe, dedup and politeness
    # plan as real links, no special path downstream. link_idx is offset by
    # 10^6 so sitemap-discovered URLs order deterministically AFTER the
    # page's real links within one parent. Nested sitemap indexes chain
    # naturally: a child sitemap URL is enqueued, fetched, and parsed on a
    # later round. Off by default (golden parity); disables the fused
    # level-block fast path while on (the block's lazy fetch chain would
    # re-scan bodies per level).
    discover_sitemaps: bool = False


class FrontierScheduler:
    def __init__(
        self,
        spark: SparkSession,
        catalog: TableCatalog,
        web,
        config: CrawlConfig | None = None,
        host_budget: DataFrame | None = None,
        robots: DataFrame | None = None,
        image_table: DataFrame | None = None,
    ):
        """``web`` provides ``fetch(selected) -> DataFrame`` (adds status, mime,
        size, localfile, image_id) and ``outlinks(fetched) -> DataFrame``
        (parent_seq, link_idx, dst_url, referrer) — see frontier.synth.
        ``host_budget``: (host, budget); ``robots``: (host, disallow array<string>).
        """
        self.spark = spark
        self.catalog = catalog
        self.web = web
        self.cfg = config or CrawlConfig()
        self.host_budget = host_budget
        self.robots = robots
        self.image_table = image_table
        # rounds where the skew-aware salted politeness plan engaged
        self.salted_rounds: set[int] = set()
        # rounds that ran the level-mode fast path (lazy bucketed seq
        # stamping + arithmetic counts — one foreground job per round)
        self.level_rounds: set[int] = set()
        # rounds consumed by fused level blocks (cfg.batch_levels), and how
        # many blocks were discarded by the post-hoc budget check
        self.block_rounds: set[int] = set()
        self.block_fallbacks = 0
        # one-round-deep deferred commit pipeline (cfg.pipelined_commits)
        self._deferred = None
        self._bg_pool = None
        # in-memory round handoff: round r leaves its next frontier (and,
        # with robots fetching, the next hosts set) CACHED with an exact
        # count, so round r+1's plan/top-k/fetch phase never reads the
        # catalog — which is what lets every table commit except the url_seen
        # materializer ride the deferred tail and overlap that phase.
        self._frontier_mem: DataFrame | None = None
        self._frontier_count = 0
        # previous round's frontier count — the observed level-growth ratio
        # (prev → current) projects in-block level sizes for the fused-block
        # gate (levels are stamped by a one-partition window inside a block,
        # so fusing a level that grows big turns the block into a serial
        # funnel; perf heuristic only — stamping is correct at any size)
        self._frontier_count_prev = 0
        self._hosts_mem: DataFrame | None = None
        self._n_hosts = 0  # lagged (hosts@r-1) input to the salted-auto heuristic
        # lagged max frontier rows on any single host (probed on the deferred
        # tail each flush): the Zipf-head signal the average-based heuristic
        # misses — one hot host holding 50% of a big frontier keeps
        # n_frontier/n_hosts small while one top-k reducer straggles
        self._max_host_frontier = 0
        # lagged distinct-host count from the same probe: the avg signal's
        # denominator when hosts_crawled is not maintained (robots off)
        self._probe_n_hosts = 0
        # sticky auto-switch: once a crawl trips the salted plan it stays
        # salted (lagged signals + fast-growing hot hosts; see the auto
        # branch). Reset only with the scheduler object, not per handoff —
        # a resumed crawl re-trips from its own signals.
        self._salt_latched = False
        # commit-window state (cfg.commit_every > 1): summary handoff + the
        # per-round deltas awaiting the next flush
        self._summary_mem: DataFrame | None = None
        self._pending: dict | None = None
        self._pend_seen_all: DataFrame | None = None  # cumulative window deltas
        self._window_pos = (0, 0)  # (last round, next_seq) for a forced flush
        # single-BFS-level invariant: True while the frontier is provably one
        # uniform-priority level whose parent_seq values all fall in
        # _level_span = [lo, hi) — the previous round's seq range. Holds from
        # start() (seeds: priority 0, parent_seq −1) and is preserved by any
        # round where selection was the identity (no robots rows, no depth or
        # robots filter, non-binding budget) so next_frontier == that round's
        # discoveries. It unlocks the job-free plans: bucketed lazy seq
        # stamping (order within a level is (parent_seq, link_idx, url), so
        # floor(parent_seq/W) buckets are order-aligned) and the arithmetic
        # n_fetched. Reset to False on resume/rollback (the stored frontier's
        # provenance is unknown) — the scheduler then falls back to
        # ranged/single stamping, which is always correct.
        self._level_clean = False
        self._level_span = (0, 0)

    # ------------------------------------------------------------------ utils
    def _seen_bucket(self) -> tuple[str, int] | None:
        return ("url_key", self.cfg.num_parts) if self.cfg.bucketed_seen else None

    def _canonicalize(self, df: DataFrame, url_col: str) -> DataFrame:
        out = df.withColumn("url", canonicalize_urls_udf(F.col(url_col)))
        if self.cfg.canonicalize_query:
            # query normalization runs on the WHATWG output so url_key (the
            # seen/dedup key) is derived from the fully canonical form —
            # utm permutations collapse before the probe, not after
            from httrack2warc_spark.operators.crawlops import (
                canonicalize_query_col,
            )

            out = out.withColumn("url", canonicalize_query_col(F.col("url")))
        return out.withColumn(
            "url_key", strip_protocol_col(F.col("url"))
        ).withColumn("host", url_host_col(F.col("url")))

    def _apply_exclusions(self, df: DataFrame) -> DataFrame:
        # reference F2: Pattern.matches == full match (Httrack2Warc.java:288-290)
        out = df
        for rx in self.cfg.exclusions:
            out = out.where(~F.col("url").rlike(f"^(?:{rx})$"))
        if self.cfg.trap_guard:
            from httrack2warc_spark.operators.crawlops import trap_signals

            out = out.where(
                ~trap_signals(
                    F.col("url"),
                    max_depth=self.cfg.trap_max_depth,
                    max_repeats=self.cfg.trap_max_repeats,
                    max_params=self.cfg.trap_max_params,
                )["is_trap"]
            )
        if self.cfg.blocklist:
            # normalize entries to match canonicalized hosts (lowercased;
            # stray dots/whitespace stripped) — 'Example.COM' or
            # '.example.com' otherwise silently never matches (ADVICE r05)
            bl = sorted({
                d.strip().lstrip(".").lower()
                for d in self.cfg.blocklist
                if d and d.strip().lstrip(".")
            })
            if len(bl) <= 32:
                # fold the hierarchy test into one codegen predicate —
                # (host == d) | endswith('.' + d) IS the suffix semantics.
                # coalesce(pred, False): a NULL host makes pred NULL under
                # three-valued logic and where(~NULL) would DROP the row,
                # while the >32-entry left_anti path keeps NULL hosts —
                # both paths now agree (keep) (ADVICE r05)
                pred = F.lit(False)
                for d in bl:
                    pred = pred | (F.col("host") == d) | F.col(
                        "host"
                    ).endswith("." + d)
                out = out.where(~F.coalesce(pred, F.lit(False)))
            else:
                from httrack2warc_spark.operators.crawlops import (
                    domain_blocklist_filter,
                )

                rules = self.spark.createDataFrame(
                    [(d,) for d in bl], "domain string"
                )
                out = domain_blocklist_filter(out, "host", rules)
        return out

    @staticmethod
    def _normalize_rules(df: DataFrame) -> DataFrame:
        """Pad a (possibly back-compat) rules DataFrame to the full
        (host, allow, disallow, crawl_delay) shape for merging."""
        out = df
        if "allow" not in out.columns:
            out = out.withColumn("allow", F.array().cast("array<string>"))
        if "crawl_delay" not in out.columns:
            out = out.withColumn("crawl_delay", F.lit(None).cast("double"))
        return out.select("host", "allow", "disallow", "crawl_delay")

    def _apply_robots(self, df: DataFrame) -> DataFrame:
        """RFC 9309 longest-match rule application. ``self.robots`` is
        (host, disallow array<string>[, allow array<string>[, crawl_delay]])
        — e.g. the output of ``functions.robots.robots_rules`` over fetched
        robots.txt bodies. With no allow column this reduces to the plain
        any-disallow-prefix block (back-compatible)."""
        if self.robots is None:
            return df
        from httrack2warc_spark.functions.robots import rule_match_col

        path = F.regexp_extract(F.col("url_key"), r"^[^/]*(/.*)?$", 1)
        joined = df.join(F.broadcast(self.robots), "host", "left")
        allow = (
            F.col("allow") if "allow" in self.robots.columns else F.array()
        )
        blocked = rule_match_col(path, allow, F.col("disallow"))
        drop = [c for c in ("allow", "disallow", "crawl_delay")
                if c in self.robots.columns]
        return joined.where(~blocked).drop(*drop)

    # ------------------------------------------------------------- lifecycle
    def start(self, seeds: list[str]) -> None:
        """Initialize catalog state from a seed URL list (round -1 snapshot)."""
        spark = self.spark
        cfg = self.cfg
        seed_df = spark.createDataFrame(
            [(u, i) for i, u in enumerate(seeds)], ["raw_url", "seed_idx"]
        )
        frontier = (
            self._canonicalize(seed_df, "raw_url")
            .withColumn("depth", F.lit(0))
            .withColumn("priority", F.lit(0))
            .withColumn("parent_seq", F.lit(-1).cast("long"))
            .withColumn("link_idx", F.col("seed_idx").cast("int"))
            .withColumn("referrer", F.lit(None).cast("string"))
            .select([f.name for f in FRONTIER_SCHEMA.fields])
        )
        frontier = self._apply_exclusions(frontier)
        frontier = first_occurrence(frontier, "url_key", ["link_idx"])

        seen = frontier.select(
            "url_key", "url", F.lit(0).alias("enqueued_round")
        )
        writes = [
            lambda: self.catalog.write("frontier", frontier),
            lambda: self.catalog.write(
                "frontier_removed", spark.createDataFrame([], "url_key string")
            ),
            lambda: self.catalog.write(
                "url_seen", seen, bucket_by=self._seen_bucket()
            ),
            lambda: self.catalog.write(
                "crawl_log",
                spark.createDataFrame(
                    [],
                    "seq long, round int, url string, url_key string, host string, "
                    "depth int, referrer string, status int, mime string, size long, "
                    "localfile string, image_id string, is_robots boolean",
                ),
            ),
            lambda: self.catalog.write(
                "metrics",
                # MUST stay column-identical to the per-round metrics rows
                # (_run_round): catalog.read unions filesets with the schema of
                # whichever file it inspects first, so a narrower seed fileset
                # here can silently drop later columns (the 'salted' audit
                # column flaked exactly that way)
                spark.createDataFrame(
                    [],
                    "round int, part int, fetched long, new_urls long, "
                    "bytes long, salted boolean",
                ),
            ),
            lambda: self.catalog.write(
                "hosts_crawled", spark.createDataFrame([], "host string")
            ),
        ]
        if cfg.use_summaries:
            hashed = add_partition_and_hashes(seen, "url_key", cfg.num_parts)
            summ = merge_summaries(
                self.spark.createDataFrame([], SUMMARY_SCHEMA),
                hashed,
                cfg.num_parts,
                cfg.summary_kind,
                cfg.summary_capacity_per_part,
                cfg.summary_fpp,
            )
            writes.append(lambda: self.catalog.write("seen_summary", summ))
        # the seed writes are independent (separate table dirs + manifests)
        # and each is a tiny fileset whose cost is driver/committer fixed
        # overhead, not data — overlap them (guide §2.6; measured 9.5 s
        # serial -> ~2 s at 4 workers, the bulk of start()'s wall time)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(
            max_workers=4, thread_name_prefix="h2w-seed"
        ) as pool:
            for fut in [pool.submit(w) for w in writes]:
                fut.result()
        self.catalog.snapshot("round--1", {"round": -1, "next_seq": 0})
        self._reset_handoff()
        # seeds are one uniform level: priority 0, parent_seq −1 for every row
        self._level_clean = True
        self._level_span = (-1, 0)

    def _reset_handoff(self) -> None:
        """Drop the in-memory round handoff; the next round falls back to
        catalog reads (safe: callers ensure no deferred tail is outstanding
        and no pending commit window — run() force-flushes before this)."""
        for df in (self._frontier_mem, self._hosts_mem, self._summary_mem):
            if df is not None:
                df.unpersist()
        self._frontier_mem = None
        self._frontier_count = 0
        self._frontier_count_prev = 0
        self._hosts_mem = None
        self._n_hosts = 0
        self._max_host_frontier = 0
        self._probe_n_hosts = 0
        self._summary_mem = None
        self._level_clean = False
        self._level_span = (0, 0)
        self._discard_pending()

    def _discard_pending(self) -> None:
        """Drop the pending (unflushed) commit window and release its caches.
        Called on the exception paths: a torn round's deltas must never be
        flushed; the crash contract is rollback-to-last-flush + re-crawl."""
        if self._pending is not None:
            for df in self._pending["caches"]:
                df.unpersist()
            self._pending = None
        self._pend_seen_all = None

    def _pending_window(self) -> dict:
        """The accumulating commit window (cfg.commit_every): per-round delta
        DataFrames awaiting the next flush, plus every cache the flush must
        release. All delta frames are persisted/cached by their round."""
        if self._pending is None:
            self._pending = {
                "new_seen": [], "log": [], "metrics": [], "front_adds": [],
                "front_removed": [], "new_hosts": [], "images": [],
                "checks": [], "pages": [], "summary": None, "caches": [],
                "rounds": [],
            }
        return self._pending

    # --------------------------------------------------- frontier delta store
    # The frontier commits as Iceberg-style merge-on-read deltas: "frontier"
    # is append-only adds (the per-round discovery delta; streaming ingestion
    # appends here too), "frontier_removed" is append-only tombstones (the
    # round's fetched keys). A fetched key never re-enters the frontier (it
    # is in url_seen), so each url_key appears at most once per table and the
    # live set is a clean anti-join — and the live COUNT is a footer
    # subtraction, no job. This keeps the per-round frontier commit O(delta);
    # the former full rewrite was O(frontier) every round — at a 10^10-row
    # frontier, the last remaining O(total-state) commit. Tombstones collapse
    # in the deferred tail (write the already-cached next frontier, truncate
    # removals) once they outgrow the live set.

    def _read_frontier(self) -> DataFrame:
        adds = self.catalog.read("frontier")
        if not self.catalog.exists("frontier_removed"):
            return adds  # pre-delta catalogs (older snapshots) have no tombstones
        return adds.join(
            self.catalog.read("frontier_removed"), "url_key", "left_anti"
        )

    def _frontier_row_count(self) -> int:
        n = self.catalog.row_count("frontier")
        if self.catalog.exists("frontier_removed"):
            n -= self.catalog.row_count("frontier_removed")
        return n

    # ----------------------------------------------------------------- round
    def run_round(self, round_no: int, next_seq: int) -> tuple[int, int]:
        """Execute one round; returns (fetched_count, next_seq).

        Session confs the round toggles (AQE) are restored on exit, so calling
        ``run_round`` directly never leaves the shared SparkSession altered
        for unrelated queries; any pipelined commit tail is flushed before
        returning, so direct callers always observe a fully-committed round
        (``run()`` uses the non-flushing form to get the overlap). If the
        round raises, its half-assembled pending deltas are discarded, never
        flushed — the catalog stays at the last completed commit."""
        try:
            out = self._run_round_guarded(round_no, next_seq)
        except BaseException:
            self._discard_pending()
            raise
        self._force_flush()
        self._flush_deferred()
        return out

    def _run_round_guarded(
        self, round_no: int, next_seq: int, n_hint: int | None = None
    ) -> tuple[int, int]:
        aqe_before = self.spark.conf.get("spark.sql.adaptive.enabled", "true")
        try:
            return self._run_round(round_no, next_seq, n_hint)
        finally:
            self.spark.conf.set("spark.sql.adaptive.enabled", aqe_before)

    def _flush_deferred(self) -> None:
        """Wait for (and surface errors from) the previous round's deferred
        commit tail. Called before any commit/catalog mutation of the current
        round, and at the end of ``run()``."""
        fut, self._deferred = self._deferred, None
        if fut is not None:
            fut.result()

    def _submit_deferred(self, work) -> None:
        if self.cfg.pipelined_commits:
            from concurrent.futures import ThreadPoolExecutor

            if self._bg_pool is None:
                self._bg_pool = ThreadPoolExecutor(
                    max_workers=1, thread_name_prefix="h2w-deferred"
                )
            self._deferred = self._bg_pool.submit(work)
        else:
            work()

    def _run_round(
        self, round_no: int, next_seq: int, n_hint: int | None = None
    ) -> tuple[int, int]:
        cfg = self.cfg
        # Emptiness + sizing: from the in-memory handoff when the previous
        # round left one (its deferred tail may still be committing tables —
        # nothing here may touch the catalog), else from parquet footers
        # (first round / fresh resume: no tail outstanding, catalog reads are
        # safe). Either way no Spark job runs. ``n_hint`` carries a count
        # run()'s block gate already paid for, so the footers aren't re-read.
        use_mem = self._frontier_mem is not None
        if use_mem:
            n_frontier = self._frontier_count
        elif n_hint is not None:
            n_frontier = n_hint
        else:
            n_frontier = self._frontier_row_count()
        if n_frontier == 0:
            return 0, next_seq
        frontier = (
            self._frontier_mem if use_mem else self._read_frontier().persist()
        )
        frontier_prev = frontier  # this round's tail releases it
        if cfg.aqe_mode == "auto":
            self.spark.conf.set(
                "spark.sql.adaptive.enabled",
                "true" if n_frontier > cfg.seq_single_max else "false",
            )
        elif cfg.aqe_mode in ("on", "off"):
            self.spark.conf.set(
                "spark.sql.adaptive.enabled", "true" if cfg.aqe_mode == "on" else "false"
            )

        eligible = self._apply_robots(frontier)
        if cfg.max_depth is not None:
            eligible = eligible.where(F.col("depth") <= cfg.max_depth)

        order = [F.col("priority"), F.col("parent_seq"), F.col("link_idx"), F.col("url")]
        # budget provably non-binding ⇒ top-k is the identity. With no
        # per-host overrides and no crawl-delay caps in force, every host's
        # budget is the uniform default; any single host's frontier rows are
        # bounded by the WHOLE frontier, so n_frontier ≤ default budget means
        # no host can exceed it. Skipping the per-host window drops one
        # exchange + sort over the full frontier from every such round — the
        # common case for an unthrottled crawl (and the same rule a real
        # optimizer would apply: LIMIT k per group with k ≥ group size is a
        # no-op).
        crawl_delay_active = (
            cfg.round_seconds is not None
            and self.robots is not None
            and "crawl_delay" in self.robots.columns
        )
        # a global capacity ≥ the whole frontier is provably the identity:
        # sum(min(count, budget)) ≤ n_frontier ≤ C means water-fill returns
        # alloc == demand for every host — skip the 3 eager water-fill jobs
        # + checkpoint + alloc join entirely, and don't let a loose capacity
        # disable the level-mode fast path (n_frontier is already in hand)
        capacity_binds = (
            cfg.round_capacity is not None
            and cfg.round_capacity < n_frontier
        )
        budget_can_bind = (
            self.host_budget is not None
            or crawl_delay_active
            or capacity_binds
            or n_frontier > cfg.default_host_budget
        )
        # level mode: selection is provably the identity — no robots rows
        # (fetch_robots off), no robots/depth filter, non-binding budget —
        # over a frontier the invariant guarantees is one uniform-priority
        # BFS level. Unlocks the lazy bucketed seq stamping (no offsets
        # collect job) and the arithmetic n_fetched (no count job): with
        # both, the round's only foreground job is the discovery
        # materializer. Order within the level is (parent_seq, link_idx,
        # __robots, url) — priority and __robots are constant — so
        # floor(parent_seq/W) buckets are monotone along the full ordering.
        level_mode = (
            self._level_clean
            and not cfg.fetch_robots
            and self.robots is None
            and cfg.max_depth is None
            and not budget_can_bind
        )
        if level_mode:
            self.level_rounds.add(round_no)
        seq_mode = cfg.seq_mode
        if seq_mode == "auto":
            if n_frontier <= cfg.seq_single_max:
                seq_mode = "single"
            else:
                seq_mode = "bucketed" if level_mode else "ranged"
        elif seq_mode == "bucketed" and not level_mode:
            # bucketed stamping is only exact under the level invariant;
            # outside it fall back to the always-correct distributed form
            seq_mode = "ranged"
        if self.host_budget is not None:
            eligible = eligible.join(F.broadcast(self.host_budget), "host", "left")
            budget = F.coalesce(F.col("budget"), F.lit(cfg.default_host_budget))
        else:
            budget = F.lit(cfg.default_host_budget)
        if crawl_delay_active:
            # Crawl-delay politeness: a host granting one fetch per
            # crawl_delay seconds gets at most round_seconds/crawl_delay
            # fetches of a round (floor, min 1 so progress never stalls)
            delays = self.robots.select(
                "host", F.col("crawl_delay").alias("__cd")
            ).where(F.col("__cd").isNotNull())
            eligible = eligible.join(F.broadcast(delays), "host", "left")
            cap = F.greatest(
                F.floor(F.lit(float(cfg.round_seconds)) / F.col("__cd")),
                F.lit(1),
            ).cast("long")
            budget = F.when(
                F.col("__cd").isNotNull(), F.least(budget.cast("long"), cap)
            ).otherwise(budget.cast("long"))
        if capacity_binds:
            # global round capacity: water-fill it max-min fairly across
            # hosts. Demand = the host's frontier rows capped by its
            # per-host budget (the budget expression is constant per host,
            # so max() reads it off any row). Reads ONLY the handoff-derived
            # frontier — no catalog access (the pipelined-commit contract).
            # The alloc join hash-partitions on host, the same partitioning
            # the top-k window needs, so the exchange is shared.
            demands = eligible.groupBy("host").agg(
                F.least(
                    F.count(F.lit(1)), F.max(budget.cast("long"))
                ).alias("__dem")
            )
            alloc = waterfill_budgets(
                demands, "host", "__dem", cfg.round_capacity,
                num_partitions=cfg.num_parts,
            ).select(F.col("key").alias("host"), F.col("alloc").alias("__wf"))
            eligible = eligible.join(alloc, "host")
            budget = F.least(budget.cast("long"), F.col("__wf"))
        use_salted = cfg.salted_topk is True
        if not budget_can_bind:
            use_salted = False
        elif cfg.salted_topk == "auto":
            # with a handoff in hand the catalog may be mid-tail-commit: use
            # the lagged hosts@r-1 count recorded post-flush last round (the
            # salted plan is order-identical, so one round of heuristic lag
            # never changes results). hosts_crawled is only maintained when
            # robots fetching is on; with it empty, fall back to the host
            # count the salt probe measured on the frontier itself —
            # without that fallback the average degenerates to
            # n_frontier/1 and salts every big uniform frontier needlessly.
            n_hosts = max(
                self._n_hosts if use_mem
                else self.catalog.row_count("hosts_crawled"),
                self._probe_n_hosts,
                1,
            )
            # two signals, either trips the switch: the metadata-only average
            # (uniformly huge hosts), and the lagged per-host max probed on
            # the deferred tail (a Zipf head host that leaves the average
            # small). Both lag up to one commit window; the salted plan is
            # order-identical, so late/early switching never changes results.
            # Once tripped the switch LATCHES for the rest of the crawl:
            # both signals lag, and a hot host grows fastest exactly when
            # the lagged probe still shows it small — a measured de-latch
            # window left 2 rounds unsalted mid-growth and put a 31× task
            # straggler on the unprotected top-k reducer. Staying salted on
            # a frontier that no longer needs it costs only the two-phase
            # overhead (small, and smallest exactly when unneeded).
            use_salted = (
                self._salt_latched
                or n_frontier / n_hosts > cfg.salt_auto_threshold
                or self._max_host_frontier > cfg.salt_auto_threshold
            )
            self._salt_latched = use_salted
        if use_salted:
            self.salted_rounds.add(round_no)
        if budget_can_bind:
            topk = salted_per_key_topk if use_salted else per_key_topk
            kwargs = (
                {"salt_buckets": cfg.salt_buckets, "salt_on": "url"}
                if use_salted
                else {}
            )
            selected = topk(eligible, "host", order, budget, **kwargs)
        else:
            selected = eligible
        for aux in ("budget", "__cd", "__wf"):
            if aux in selected.columns:
                selected = selected.drop(aux)

        # synthetic robots.txt fetch before a host's first-ever fetch (HTTrack
        # behavior: fixture new.txt row 1). The robots row clones its trigger
        # row's ordering tuple and sorts before it via the __robots flag.
        selected = selected.withColumn("__robots", F.lit(1))
        if cfg.fetch_robots:
            # hosts@r-1, exactly what the catalog read used to yield — but
            # from the cached handoff so this phase can overlap the tail
            crawled_hosts = (
                self._hosts_mem
                if (use_mem and self._hosts_mem is not None)
                else self.catalog.read("hosts_crawled")
            )
            first_per_host = first_occurrence(
                selected.join(crawled_hosts, "host", "left_anti"),
                "host",
                ["priority", "parent_seq", "link_idx", "url"],
            )
            robots_rows = (
                first_per_host.withColumn(
                    "url", F.concat(F.lit("http://"), F.col("host"), F.lit("/robots.txt"))
                )
                .withColumn("url_key", strip_protocol_col(F.col("url")))
                .withColumn("referrer", F.lit(None).cast("string"))
                .withColumn("__robots", F.lit(0))
            )
            selected = selected.unionByName(robots_rows)

        # total order: ordering tuple, then robots-before-page, then url
        from httrack2warc_spark.operators.sequence import with_global_seq

        seq_caches: list = []
        seq_count: list = []
        bucket_by = None
        if seq_mode == "bucketed":
            # parent_seq spans the previous level's seq range; a fixed width
            # W ≈ span/(4·num_parts) gives ~4 buckets per partition of
            # expected-balanced children (exactly balanced only for uniform
            # fan-out — a heavy-tailed out-degree skews single buckets, which
            # degrades one task, never correctness)
            lo, hi = self._level_span
            width = max(1, -(-(hi - lo) // (4 * cfg.num_parts)))
            bucket_by = F.floor(F.col("parent_seq") / F.lit(width))
        sequenced = with_global_seq(
            selected,
            [F.col("priority"), F.col("parent_seq"), F.col("link_idx"),
             F.col("__robots"), F.col("url")],
            start=next_seq,
            mode=seq_mode,
            num_partitions=cfg.num_parts,
            cache_handle=seq_caches,
            count_handle=seq_count,
            bucket_by=bucket_by,
        )

        # materialized once: reused by log append, seen update, leftover
        # anti-join and host bookkeeping without recomputing topk+fetch
        fetched = self.web.fetch(sequenced).persist()
        if seq_count:
            # ranged mode: the seq-offsets collect already counted every
            # selected row, and fetch is row-preserving BY CONTRACT (seq is
            # stamped dense pre-fetch; a fetch that dropped or duplicated
            # rows would hole/dupe the visit sequence) — so the separate
            # fetch-count job is redundant. The fetched persist fills on its
            # first scan, which is the foreground discovery job below.
            n_fetched = seq_count[0]
        elif level_mode:
            # level mode: selection was the identity over the frontier and
            # fetch is row-preserving (same contract as above), so the count
            # is pure arithmetic — no job. Bucketed seq stamping runs no
            # offsets collect either, leaving the discovery materializer as
            # the round's only foreground job.
            n_fetched = n_frontier
        else:
            self.spark.sparkContext.setJobDescription("fetch:materialize")
            n_fetched = fetched.count()
            self.spark.sparkContext.setJobDescription(None)
        next_seq += n_fetched

        # the previous round's deferred tail (frontier/hosts/summary commits,
        # crawl_log/metrics/images, compaction, snapshot, retention)
        # overlapped this round's plan/top-k/fetch; it must land before this
        # round reads or mutates any catalog table
        self._flush_deferred()
        if cfg.salted_topk == "auto":
            # catalog is quiescent here: record the lagged hosts@r-1 count
            # the NEXT round's salted-auto heuristic reads (see above)
            self._n_hosts = self.catalog.row_count("hosts_crawled")

        log_rows = fetched.select(
            "seq",
            F.lit(round_no).alias("round"),
            "url",
            "url_key",
            "host",
            "depth",
            "referrer",
            "status",
            "mime",
            "size",
            "localfile",
            "image_id",
            (F.col("__robots") == 0).alias("is_robots"),
        )

        # ---- discovery --------------------------------------------------
        raw_links = self.web.outlinks(fetched.where(F.col("__robots") == 1))
        if self.cfg.discover_sitemaps and "body" in fetched.columns:
            from httrack2warc_spark.operators.crawlops import sitemap_outlinks

            # fetched is persisted above, so this union branch re-reads the
            # cache, not the fetch join (the union-recompute rule)
            raw_links = raw_links.unionByName(
                sitemap_outlinks(fetched.where(F.col("__robots") == 1))
            )
            if cfg.fetch_robots:
                from httrack2warc_spark.operators.crawlops import (
                    robots_sitemap_outlinks,
                )

                # Sitemap: directives in this round's robots.txt bodies —
                # the declared sitemap URL enters the normal discovery plan
                # and its <urlset> chains through sitemap_outlinks when
                # fetched next round
                raw_links = raw_links.unionByName(
                    robots_sitemap_outlinks(
                        fetched.where(F.col("__robots") == 0)
                    )
                )
        candidates = (
            self._canonicalize(raw_links, "dst_url")
            .withColumn("depth", (F.col("parent_depth") + 1).cast("int"))
            .withColumn("priority", (F.col("parent_depth") + 1).cast("int"))
            .select(
                "url", "url_key", "host", "depth", "priority",
                "parent_seq", "link_idx", "referrer",
            )
        )
        candidates = self._apply_exclusions(candidates)
        # within-batch first-occurrence dedup (A1/A2) is folded into the
        # probe cogroup below (dedup_order) — one exchange, not two

        seen = self.catalog.read("url_seen")
        # commit-window deltas (cfg.commit_every > 1): seen keys from rounds
        # whose flush hasn't happened yet — they compensate every stale
        # catalog read below (exact confirm, unsummarized tail, robots dedup)
        # one CUMULATIVE cached frame, not a per-round list: each extra
        # frame would add a broadcast-build job to every probe/count plan
        # (measured: 3 jobs/round of pure latency at commit_every=4)
        pend_seen = self._pend_seen_all
        summaries = (
            self._summary_mem
            if self._summary_mem is not None
            else (self.catalog.read("seen_summary") if cfg.use_summaries else None)
        )
        covered = getattr(self, "_summary_covered_round", 0)
        tail = (
            seen.where(F.col("enqueued_round") > covered)
            if cfg.use_summaries and cfg.summary_every > 1
            else None
        )
        if pend_seen is not None and tail is not None:
            tail = tail.unionByName(pend_seen)
        # robots fetches are logged but their url_keys must also be marked
        # seen. Stamp round_no+1 like every other key committed this round:
        # the unsummarized-tail filter is `enqueued_round > covered` with
        # covered = round_no+1 at merge time, so a round_no stamp would leave
        # these keys in neither the summary nor the tail (probe false miss).
        robots_seen = (
            fetched.where(F.col("__robots") == 0)
            .select("url_key", "url")
            .withColumn("enqueued_round", F.lit(round_no + 1))
        )
        # bucketed path: confirm anti-join per fileset (exchange-free bucketed
        # scans on the seen side; see _anti_join_all); pending window deltas
        # ride along as extra (small, cached) confirm filesets
        seen_confirm = (
            self.catalog.read_filesets("url_seen")
            if cfg.bucketed_seen
            else [seen]
        ) + ([pend_seen] if pend_seen is not None else [])
        new_frontier = filter_new_urls(
            candidates, seen_confirm, summaries, "url_key",
            cfg.num_parts, cfg.summary_fpp, unsummarized=tail,
            dedup_order=["parent_seq", "link_idx", "url"],
            # cfg.jvm_probe: bloom summaries probe in whole-stage codegen
            # (no pandas cogroup); default is the (faster-here) Arrow path
            capacity=(
                cfg.summary_capacity_per_part
                if cfg.jvm_probe and cfg.summary_kind == "bloom"
                else None
            ),
        )
        # materialize the round's discoveries as a localCheckpoint, not a
        # persist: the codegen-probe plan (filter_new_urls capacity path)
        # defeats cache-by-plan-equality reuse in the deferred tail — each
        # commit silently recomputed the whole discovery pipeline (measured
        # 3× loop wall). A checkpoint truncates to a materialized RDD every
        # consumer shares by construction, no plan matching involved.
        self.spark.sparkContext.setJobDescription("seen:materialize")
        if cfg.fetch_robots:
            # also exclude robots keys fetched this round
            new_frontier = new_frontier.join(
                robots_seen.select("url_key"), "url_key", "left_anti"
            ).localCheckpoint(eager=True)

            seen_keys = seen.select("url_key")
            if pend_seen is not None:
                seen_keys = seen_keys.unionByName(pend_seen.select("url_key"))
            robots_new = robots_seen.join(seen_keys, "url_key", "left_anti")
            new_seen_rows = first_occurrence(
                new_frontier.select(
                    "url_key", "url", F.lit(round_no + 1).alias("enqueued_round")
                ).unionByName(robots_new),
                "url_key",
                ["enqueued_round"],
                tiebreak=["url"],
            )
        else:
            # no robots rows exist: filter_new_urls already emitted exactly
            # one row per url_key (dedup_order folds the within-batch
            # first-occurrence into the probe cogroup), so the re-dedup
            # window — a full exchange + sort of the round's discoveries —
            # is the identity. Skip it. The lazy checkpoint + direct count
            # is ONE job that both materializes the checkpoint (a direct
            # action on the checkpointed frame does; actions on DERIVED
            # frames do not) and fixes n_new_seen (== discoveries: the
            # seen-rows frame is a pure projection of this set), replacing
            # the separate eager-materialize and count jobs.
            new_frontier = new_frontier.localCheckpoint(eager=False)
            n_new_seen_direct = new_frontier.count()
            new_seen_rows = new_frontier.select(
                "url_key", "url", F.lit(round_no + 1).alias("enqueued_round")
            )
        self.spark.sparkContext.setJobDescription(None)

        new_frontier_rows = new_frontier.select(
            [f.name for f in FRONTIER_SCHEMA.fields]
        )
        # removed_keys also feeds the frontier delta store's tombstone
        # append at flush time, so it is defined on every path
        removed_keys = fetched.where(F.col("__robots") == 1).select("url_key")
        if not cfg.fetch_robots and n_fetched == n_frontier:
            # every frontier row was selected and fetched (fetch is row-
            # preserving and, with robots off, fetched rows come only from
            # the frontier), so the leftover anti-join is provably empty —
            # next_frontier is just this round's discoveries, one exchange
            # cheaper per non-binding round.
            next_frontier = new_frontier_rows
        else:
            # leftover = eligible-but-over-budget rows stay queued
            leftover = frontier.join(removed_keys, "url_key", "left_anti")
            next_frontier = leftover.unionByName(new_frontier_rows)

        # level invariant for the NEXT round: preserved exactly when this
        # round's selection was the identity over a clean level — robots off
        # (else synthetic robots rows / the leftover path mix in) and every
        # frontier row fetched (any filter or binding budget would have
        # dropped rows, breaking the count equality). Then next_frontier is
        # purely this round's discoveries: uniform priority (= parent depth
        # + 1 over uniform parents) with parent_seq in this round's dense
        # seq range — the span the bucketed stamping buckets by.
        self._level_clean = (
            self._level_clean
            and not cfg.fetch_robots
            and n_fetched == n_frontier
        )
        self._level_span = (next_seq - n_fetched, next_seq)

        # ---- commit ------------------------------------------------------
        # url_seen is append-only (set semantics): appending just the round's
        # new keys keeps the commit O(delta); a full-rewrite union would make
        # every round O(total-seen) — the classic iterative-state trap.
        # new_frontier is already a materialized localCheckpoint (the
        # discovery materializer above — checkpoint, not persist, because
        # cache-by-plan-equality reuse is shape-fragile: with the codegen-
        # probe plan every deferred commit silently recomputed the whole
        # pipeline, 3× loop wall). Robots off: n_new_seen came with the
        # materializing count and new_seen_rows is a pure projection its
        # consumers recompute from the checkpoint for free. Robots on:
        # new_seen_rows adds the robots union + dedup window, so pin it and
        # count it here (the window runs once, the tail reuses the persist).
        if cfg.fetch_robots:
            new_seen_rows = new_seen_rows.persist()
            self.spark.sparkContext.setJobDescription("seen:materialize")
            n_new_seen = new_seen_rows.count()
            self.spark.sparkContext.setJobDescription(None)
        else:
            n_new_seen = n_new_seen_direct

        # dynamic robots discovery (cfg.discover_robots): parse this round's
        # fetched robots.txt bodies and fold them into the active rule set —
        # effective from next round's eligibility filter. Runs on the cached
        # fetched rows (the append above materialized them); the tiny merged
        # set is checkpointed so it never chains lineage into old rounds.
        if (
            cfg.fetch_robots
            and cfg.discover_robots
            and "body" in fetched.columns
        ):
            from httrack2warc_spark.functions.robots import robots_rules

            robots_bodies = fetched.where(
                (F.col("__robots") == 0)
                & (F.col("status") < 400)
                & F.col("body").isNotNull()
            )
            new_rules = robots_rules(
                robots_bodies, body_col="body", host_col="host",
                user_agent=cfg.robots_user_agent,
            )
            if self.robots is None:
                merged_rules = new_rules
            else:
                # one row per host, freshly fetched rules win: a static row
                # left in place alongside a discovered row would double every
                # frontier row for that host through _apply_robots's left
                # join (duplicate fetches, seq rows, tombstones — and the
                # footer-based frontier arithmetic breaks)
                merged_rules = (
                    self._normalize_rules(self.robots)
                    .join(new_rules.select("host"), "host", "left_anti")
                    .unionByName(new_rules)
                )
            self.robots = merged_rules.localCheckpoint(eager=True)

        # ---- in-memory handoff: hand round r+1 the next frontier so it
        # plans/top-ks/fetches from cache. That frees EVERY remaining table
        # commit — frontier, hosts_crawled, seen_summary, crawl_log, metrics,
        # image drains — plus compaction, snapshot and retention to ride the
        # deferred tail, off the round's critical path. localCheckpoint (not
        # persist): truncating lineage gives the handoff fresh attribute ids
        # (round r+1 re-joins the same web relations — a cached-but-lineaged
        # frontier trips the ambiguous-self-join analyzer) and unpins it from
        # catalog files a later retention vacuum may reclaim.
        #
        # The count (round r+1's emptiness check + seq/AQE sizing) must be
        # EXACT. Without robots fetching it is pure arithmetic — no job:
        # every fetched row consumed one frontier row and every new seen row
        # is one new frontier row (new_frontier is unique by url_key and
        # robots_new is empty), so
        #   n_next = n_frontier − n_fetched + n_new_seen.
        # Robots rows perturb both terms, so that path materializes with one
        # count job over cached inputs (which also pre-fills the handoff the
        # tail's frontier write reuses).
        next_frontier = next_frontier.localCheckpoint(eager=False)
        if cfg.fetch_robots:
            self.spark.sparkContext.setJobDescription("frontier:materialize")
            n_next = next_frontier.count()
            self.spark.sparkContext.setJobDescription(None)
        else:
            n_next = n_frontier - n_fetched + n_new_seen

        # ---- commit window (cfg.commit_every): this round's deltas join
        # the pending window; the combined wave flushes every K rounds (and
        # at crawl end). Between flushes the catalog is bit-stale by design —
        # every read above compensates from the cached pending deltas.
        pend = self._pending_window()
        pend["rounds"].append(round_no)
        pend["new_seen"].append(new_seen_rows)
        if (round_no + 1) % max(cfg.commit_every, 1) != 0:
            # later rounds of this window will read the pending seen set;
            # keep it ONE cached frame (see pend_seen above). Skipped on
            # flush rounds — nothing reads it before the catalog catches up.
            prev_all = self._pend_seen_all
            cum = (
                new_seen_rows
                if prev_all is None
                else prev_all.unionByName(new_seen_rows)
            ).persist()
            if prev_all is not None:
                pend["caches"].append(prev_all)
            self._pend_seen_all = cum
            pend["caches"].append(cum)
        pend["log"].append(log_rows)
        pend["front_adds"].append(new_frontier_rows)
        pend["front_removed"].append(removed_keys)

        hosts_next = None
        if cfg.fetch_robots:
            # append-only like url_seen: only hosts first crawled this round
            # (anti-join against the standing set) — O(delta) per round, not
            # an O(total-hosts) rewrite+distinct. The standing set is the
            # in-memory chain when one exists (the catalog may be a whole
            # commit window stale), else the committed table.
            hosts_base = (
                self._hosts_mem
                if self._hosts_mem is not None
                else self.catalog.read("hosts_crawled")
            )
            new_hosts = (
                fetched.select("host")
                .distinct()
                .join(hosts_base, "host", "left_anti")
            )
            pend["new_hosts"].append(new_hosts)
            if self._hosts_mem is not None:
                pend["caches"].append(self._hosts_mem)
            # same localCheckpoint rationale as next_frontier; materialized
            # by the tail's count (or round r+1's first use — benign race)
            hosts_next = hosts_base.unionByName(new_hosts).localCheckpoint(
                eager=False
            )
            self._hosts_mem = hosts_next
        merge_now = cfg.use_summaries and (
            cfg.summary_every <= 1 or (round_no + 1) % cfg.summary_every == 0
        )
        if merge_now:
            # fold in everything since the last merge: the standing tail plus
            # this round's new keys (both already computed — no re-read; with
            # a commit window open, `tail` already carries the pending rows)
            delta = new_seen_rows.select("url_key")
            if tail is not None:
                delta = delta.unionByName(tail.select("url_key"))
            hashed_new = add_partition_and_hashes(delta, "url_key", cfg.num_parts)
            merged = merge_summaries(
                summaries, hashed_new, cfg.num_parts,
                cfg.summary_kind, cfg.summary_capacity_per_part, cfg.summary_fpp,
            )
            if self._summary_mem is not None:
                pend["caches"].append(self._summary_mem)
            # the summary handoff every later round probes; only the LATEST
            # merged state is written at flush
            self._summary_mem = merged.localCheckpoint(eager=False)
            pend["summary"] = self._summary_mem
            self._summary_covered_round = round_no + 1
        # one union-aggregate pass (tagged rows → conditional sums) instead of
        # two hashed aggregations + an outer join: one exchange on the 4-byte
        # part key, not three — this rides the deferred tail, so every core
        # it doesn't burn is a core the overlapped foreground keeps
        part_of = F.pmod(F.hash(F.col("url_key")), F.lit(cfg.num_parts)).cast("int")
        tagged = log_rows.select(
            part_of.alias("part"), F.lit(1).alias("__f"),
            F.coalesce(F.col("size"), F.lit(0)).cast("long").alias("__b"),
            F.lit(0).alias("__n"),
        ).unionByName(
            new_frontier.select(
                part_of.alias("part"), F.lit(0).alias("__f"),
                F.lit(0).cast("long").alias("__b"), F.lit(1).alias("__n"),
            )
        )
        metrics = tagged.groupBy("part").agg(
            F.sum("__f").alias("fetched"),
            F.sum("__n").alias("new_urls"),
            F.sum("__b").alias("bytes"),
        ).select(
            F.lit(round_no).alias("round"),
            "part",
            "fetched",
            "new_urls",
            "bytes",
            # audit trail for the skew path: did this round's top-k run
            # the salted two-phase plan (auto-switch or forced)?
            F.lit(round_no in self.salted_rounds).alias("salted"),
        )
        pend["metrics"].append(metrics)

        # ---- image payload drain (north_rule: fetched image+caption records
        # land in the table store; the per-row invariant is checked in the
        # same pass — decode/phash are Arrow UDFs in functions.images)
        if self.image_table is not None:
            from httrack2warc_spark.functions.images import with_decode_check

            fetched_images = (
                fetched.where(F.col("image_id").isNotNull())
                .select("image_id", "seq", "url")
                .join(self.image_table, "image_id")
            )
            checked = with_decode_check(fetched_images).select(
                "image_id", "fmt", "decoded_ok", "psnr_db", "phash_ok", "caption_ok",
                F.lit(round_no).alias("round"),
            )
            drained = fetched_images.select(
                "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
                F.col("seq").alias("fetch_seq"),
                F.col("url").alias("fetch_url"),
            )
            pend["images"].append(drained)
            pend["checks"].append(checked)

        # ---- page-text drain (ingest extraction): fetched HTML bodies →
        # (title, text, n_tokens) rows on the same deferred commit wave
        self._drain_pages(fetched, F.lit(round_no), pend)

        # caches this window pins until its flush (delta lineages reach into
        # them); the LATEST handoffs (next_frontier / hosts / summary) are
        # excluded — they carry state into the next window
        pend["caches"].extend(
            [frontier_prev, fetched, new_frontier, new_seen_rows]
        )
        pend["caches"].extend(seq_caches)

        self._frontier_mem = next_frontier
        self._frontier_count_prev = n_frontier
        self._frontier_count = n_next
        self._window_pos = (round_no, next_seq)
        if (round_no + 1) % max(cfg.commit_every, 1) == 0:
            self._force_flush()
        return n_fetched, next_seq

    # ---------------------------------------------------------- pages drain
    def _drain_pages(self, src, round_col, pend) -> None:
        """cfg.extract_text: run fetched HTML bodies through the pure-Column
        extraction chain and stage (url, url_key, seq, round, title, text,
        n_tokens) rows for the ``pages`` table on the pending commit wave.
        ONE implementation for both the per-round and level-block paths —
        the two drains must stay column-identical (catalog.read unions
        filesets with the first-inspected schema). No-op unless the fetch
        contract carries a ``body`` column; robots bodies excluded.

        Known cost: ``n_tokens`` shares the extraction chain with ``text``
        in one Project and Spark does not fully subexpression-eliminate it
        (measured +62% over text-only at sf0.1) — accepted for the opt-in
        drain; a consumer that prefers can drop the column and recompute
        token_count over the committed rows in one cheap stored-text pass."""
        if not self.cfg.extract_text or "body" not in src.columns:
            return
        from httrack2warc_spark.functions.text import (
            html_title,
            html_to_text,
            token_count,
        )

        body_rows = src.where(F.col("body").isNotNull())
        if "__robots" in src.columns:
            # __robots == 0 marks the robots.txt fetch rows
            body_rows = body_rows.where(F.col("__robots") != 0)
        if self.cfg.discover_sitemaps:
            # sitemap XML is link inventory, not document text: without this
            # the drain ran tag-stripped URL lists through html_to_text and
            # committed them as corpus documents (ADVICE r05). Same predicate
            # the discovery path classifies sitemaps with.
            from httrack2warc_spark.operators.crawlops import is_sitemap_row

            body_rows = body_rows.where(~is_sitemap_row("url", "body"))
        text = html_to_text(F.col("body"))
        pend["pages"].append(
            body_rows.select(
                "url",
                "url_key",
                "seq",
                round_col.alias("round"),
                html_title(F.col("body")).alias("title"),
                text.alias("text"),
                token_count(text).cast("long").alias("n_tokens"),
            )
        )

    # ------------------------------------------------------------- level block
    def _block_eligible(self, n_frontier: int) -> bool:
        """May the next ``cfg.batch_levels`` rounds fuse into one foreground
        materialization? Requires the level invariant (the frontier is one
        uniform-priority BFS level) plus every selection-is-identity
        condition checkable up front: robots fully off, no depth filter, no
        per-host overrides, and a frontier that fits under both the single-
        window stamping threshold (blocks exist to amortize SMALL rounds)
        and the default budget (level 0's identity proof; later levels are
        checked post-hoc, see the fallback in _run_level_block)."""
        cfg = self.cfg
        return (
            cfg.batch_levels > 1
            and self._level_clean
            and not cfg.fetch_robots
            and not cfg.discover_sitemaps
            and self.robots is None
            and cfg.max_depth is None
            and self.host_budget is None
            and cfg.round_capacity is None
            and 0 < n_frontier <= min(cfg.seq_single_max, cfg.default_host_budget)
        )

    def _growth_capped_k(self, k: int, n_now: int) -> int:
        """Cap the fused-block depth by PROJECTED level sizes. In-block
        levels are seq-stamped by a one-partition window (the price of
        chaining levels lazily), so fusing a level that grows past
        cfg.seq_single_max turns the block's single job into a serial
        funnel — measured 1.8× slower on the 2M-URL loop when a block
        entered at 200 rows fused a ~350k-row level. Project level i as
        n_now * g^i with g = the last observed round-over-round growth
        ratio, and fuse only while the projection stays under the
        threshold. With no history yet (round 0 / fresh resume) fuse at
        most 2 levels — one level of unknown growth from a block-small
        frontier stays cheap. Perf heuristic only: an underestimate of g
        costs speed on one block, never correctness (single-partition
        stamping is order-exact at any size), and the post-hoc budget
        fallback is unaffected."""
        if k <= 1 or n_now <= 0:
            return k
        if self._frontier_count_prev <= 0:
            return min(k, 2)
        g = max(1.0, n_now / self._frontier_count_prev)
        proj = float(n_now)
        kg = 1
        while kg < k and proj * g <= self.cfg.seq_single_max:
            proj *= g
            kg += 1
        return kg

    def _run_level_block_guarded(
        self, round_no: int, next_seq: int, k: int, n_hint: int | None = None
    ):
        aqe_before = self.spark.conf.get("spark.sql.adaptive.enabled", "true")
        try:
            return self._run_level_block(round_no, next_seq, k, n_hint)
        finally:
            self.spark.conf.set("spark.sql.adaptive.enabled", aqe_before)

    def _run_level_block(
        self, round_no: int, next_seq: int, k: int, n_hint: int | None = None
    ):
        """Fuse up to ``k`` BFS levels into ONE foreground materialization
        (cfg.batch_levels — VERDICT r4 Next #2a).

        Levels chain lazily: level i's fetch/discover/probe plan consumes
        level i-1's un-materialized discoveries; the whole block then lands
        as one localCheckpoint'ed union (fetched levels + the final
        frontier, tagged __lvl) materialized by one count job — (k-1) fewer
        foreground barriers, one catalog-manifest read per block instead of
        per round.

        Plan-size discipline (logical plans are trees, not DAGs — every
        re-reference of a chained frame COPIES its whole subtree, so naive
        chaining is exponential in k and OOMs the driver during analysis):
        (a) seq is stamped RELATIVE per level with one lazy single-partition
        window (zero input duplication; level sizes are block-small by the
        entry gate) and fixed up to absolute values after materialization,
        when the per-level counts are plain ints — a __lvl CASE column, no
        lazy start scalars; (b) in-block re-discoveries are removed by ONE
        pre-probe anti-join against an iteratively-accumulated in-block key
        union (candidates of level i+1 can duplicate keys discovered at
        levels ≤ i, which the block-start catalog snapshot cannot know) —
        the probe's own dedup + confirm paths then need no in-block
        compensation. Net tree growth ≈ 2× per level, ~30× base at k=4.
        Execution stays linear: every level's chain is cut by its probe and
        join exchanges, whose shuffle files the union branches reuse.

        Order safety: with selection the identity, round == BFS level and
        the global (priority, parent_seq, link_idx, url) order is
        level-major, so stamping each level with chained dense starts equals
        stamping every level separately (tests assert bit-identical logs).

        Budget safety is settled POST-materialization: the per-level counts
        come back with the checkpoint, and if any in-block level exceeded
        cfg.default_host_budget (the same conservative whole-frontier proxy
        the normal path uses — a host can only exceed the budget if its
        whole level does) the block is DISCARDED before any scheduler state
        mutates and the caller re-runs those rounds through the normal
        per-round path. One wasted job on a mis-guess, never a semantic
        change.

        Returns (total_fetched, next_seq, rounds_consumed), or None for the
        budget fallback. Commit cadence: the window flushes at block end
        when the last round crosses the cfg.commit_every boundary —
        granularity coarsens to the block size (same trade as commit_every).
        """
        cfg = self.cfg
        use_mem = self._frontier_mem is not None
        if use_mem:
            n0 = self._frontier_count
        elif n_hint is not None:
            n0 = n_hint  # run()'s block gate already read the footers
        else:
            n0 = self._frontier_row_count()
        if n0 == 0:
            return 0, next_seq, 1
        frontier0 = (
            self._frontier_mem if use_mem else self._read_frontier().persist()
        )
        frontier_prev = frontier0

        # the block's discovery plans read catalog state (url_seen manifest,
        # confirm filesets, summaries) up front — the previous window's tail
        # must land first. The trade vs a normal round: the barrier comes
        # before plan building instead of after the fetch phase; in level
        # mode that phase is lazy (no job), so nothing of substance is lost.
        self._flush_deferred()
        if cfg.salted_topk == "auto":
            self._n_hosts = self.catalog.row_count("hosts_crawled")
        if cfg.aqe_mode == "auto":
            # by the entry size; a level that grows large mid-block runs
            # with AQE off (plan-identical result, possibly fewer coalesced
            # partitions than a standalone big round would pick)
            self.spark.conf.set(
                "spark.sql.adaptive.enabled",
                "true" if n0 > cfg.seq_single_max else "false",
            )
        elif cfg.aqe_mode in ("on", "off"):
            self.spark.conf.set(
                "spark.sql.adaptive.enabled",
                "true" if cfg.aqe_mode == "on" else "false",
            )

        seen = self.catalog.read("url_seen")
        pend_seen = self._pend_seen_all
        summaries = (
            self._summary_mem
            if self._summary_mem is not None
            else (self.catalog.read("seen_summary") if cfg.use_summaries else None)
        )
        covered = getattr(self, "_summary_covered_round", 0)
        tail = (
            seen.where(F.col("enqueued_round") > covered)
            if cfg.use_summaries and cfg.summary_every > 1
            else None
        )
        if pend_seen is not None and tail is not None:
            tail = tail.unionByName(pend_seen)
        seen_confirm = (
            self.catalog.read_filesets("url_seen")
            if cfg.bucketed_seen
            else [seen]
        ) + ([pend_seen] if pend_seen is not None else [])
        capacity = (
            cfg.summary_capacity_per_part
            if cfg.jvm_probe and cfg.summary_kind == "bloom"
            else None
        )

        frontier_cols = [f.name for f in FRONTIER_SCHEMA.fields]
        # level 0's parent_seq values are absolute (stamped by earlier
        # rounds); levels ≥ 1 carry RELATIVE parent_seq (the parent level's
        # 0-based row_number) until the post-materialization fix-up. Either
        # way the within-level order (priority, parent_seq, link_idx, url)
        # is preserved — relative stamps are order-isomorphic to absolute.
        w_lvl = Window.partitionBy(F.lit(0)).orderBy(
            "priority", "parent_seq", "link_idx", "url"
        )
        fetched_levels: list[DataFrame] = []
        news: list[DataFrame] = []  # per-level discoveries (frontier schema)
        inblock = None  # accumulated in-block keys (one ref per level)
        cur = frontier0
        for i in range(k):
            sel = cur.withColumn("__robots", F.lit(1)).withColumn(
                "seq", F.row_number().over(w_lvl).cast("long") - 1
            )
            fetched_i = self.web.fetch(sel)
            fetched_levels.append(fetched_i)

            raw = self.web.outlinks(fetched_i.where(F.col("__robots") == 1))
            cand = (
                self._canonicalize(raw, "dst_url")
                .withColumn("depth", (F.col("parent_depth") + 1).cast("int"))
                .withColumn("priority", (F.col("parent_depth") + 1).cast("int"))
                .select(*frontier_cols)
            )
            cand = self._apply_exclusions(cand)
            if inblock is not None:
                # keys discovered at earlier in-block levels: the one place
                # the block-start catalog snapshot can't see
                cand = cand.join(inblock, "url_key", "left_anti")
            new_i = filter_new_urls(
                cand, seen_confirm, summaries, "url_key",
                cfg.num_parts, cfg.summary_fpp, unsummarized=tail,
                dedup_order=["parent_seq", "link_idx", "url"],
                capacity=capacity,
            )
            news.append(new_i)
            nk = new_i.select("url_key")
            inblock = nk if inblock is None else inblock.unionByName(nk)
            cur = new_i

        # ---- the ONE foreground materialization --------------------------
        fetch_cols = ["seq", "status", "mime", "size", "localfile", "image_id"]
        if cfg.extract_text and "body" in fetched_levels[0].columns:
            # page bodies must survive the block materialization or the
            # pages drain below sees no body column and silently drains
            # nothing for every fused round (the per-round path would) —
            # the memory cost of carrying them is the price of extraction
            fetch_cols.append("body")
        fdtypes = dict(fetched_levels[0].dtypes)
        parts = [
            f.select(*frontier_cols, "__robots", *fetch_cols)
            .withColumn("__lvl", F.lit(i))
            for i, f in enumerate(fetched_levels)
        ]
        parts.append(
            news[-1]
            .select(
                *frontier_cols,
                F.lit(1).alias("__robots"),
                *[F.lit(None).cast(fdtypes[c]).alias(c) for c in fetch_cols],
            )
            .withColumn("__lvl", F.lit(k))
        )
        block = parts[0]
        for p in parts[1:]:
            block = block.unionByName(p)
        # direct count on the checkpointed frame materializes it (actions on
        # derived frames would not); the per-level counts are then a cached
        # scan — 2 foreground jobs per block vs 1 per round unbatched
        block = block.localCheckpoint(eager=False)
        self.spark.sparkContext.setJobDescription("block:materialize")
        block.count()
        counts = {
            r["__lvl"]: r["count"]
            for r in block.groupBy("__lvl").count().collect()
        }
        self.spark.sparkContext.setJobDescription(None)

        # ---- budget fallback: NOTHING above mutated scheduler state -------
        if any(counts.get(i, 0) > cfg.default_host_budget for i in range(1, k)):
            self.block_fallbacks += 1
            block.unpersist()
            if not use_mem:
                frontier_prev.unpersist()
            return None

        per_level = [counts.get(i, 0) for i in range(k)]
        consumed = 0
        for c in per_level:
            if c == 0:
                break
            consumed += 1
        total_fetched = sum(per_level[:consumed])
        n_next = counts.get(k, 0)
        last_round = round_no + consumed - 1
        next_seq += total_fetched
        self.block_rounds.update(range(round_no, round_no + consumed))
        self.level_rounds.update(range(round_no, round_no + consumed))

        # level invariant: every in-block selection was the identity, so the
        # final frontier is one uniform level whose parents span the LAST
        # fetched level's dense seq range
        self._level_span = (next_seq - per_level[consumed - 1], next_seq)

        # ---- relative → absolute stamp fix-up (plan-size discipline (a)) --
        # in-loop stamping was RELATIVE per level (0-based row_number over
        # the within-level order); now that per-level counts are plain ints,
        # shift each level by its dense absolute start with one CASE column.
        # parent_seq of __lvl=i rows (i ≥ 1, incl. the final frontier at
        # __lvl=k) references level i-1's stamps; __lvl=0 parents were
        # stamped absolute by earlier rounds and shift by 0. Constant shifts
        # preserve every within-level order the loop relied on, so only the
        # stored VALUES change here, never a winner or a sort.
        starts: list[int] = []
        s = next_seq - total_fetched
        for c in per_level[:consumed]:
            starts.append(s)
            s += c
        off_seq = None
        off_par = F.when(F.col("__lvl") == 0, F.lit(0))
        for i, st in enumerate(starts):
            cond = F.col("__lvl") == i
            off_seq = (
                F.when(cond, F.lit(st))
                if off_seq is None
                else off_seq.when(cond, F.lit(st))
            )
            off_par = off_par.when(F.col("__lvl") == i + 1, F.lit(st))
        ckpt = block  # the materialized frame — what the tail must unpersist
        block = block.withColumn(
            "seq", F.col("seq") + off_seq.otherwise(F.lit(0))
        ).withColumn(
            "parent_seq",
            F.col("parent_seq") + off_par.otherwise(F.lit(starts[-1])),
        )

        # ---- per-table deltas, all cheap projections of the checkpoint ----
        lvl_round = (F.lit(round_no) + F.col("__lvl")).cast("int")
        fetched_rows = block.where(F.col("seq").isNotNull())
        log_all = fetched_rows.select(
            "seq",
            lvl_round.alias("round"),
            "url", "url_key", "host", "depth", "referrer",
            "status", "mime", "size", "localfile", "image_id",
            (F.col("__robots") == 0).alias("is_robots"),
        )
        # discoveries of round r sit at __lvl r-round_no+1 (incl. the final
        # frontier at __lvl k, discovered by the last fetched level)
        disc_rows = block.where(F.col("__lvl") >= 1)
        block_seen_all = disc_rows.select(
            "url_key", "url", lvl_round.alias("enqueued_round")
        )
        part_of = F.pmod(F.hash(F.col("url_key")), F.lit(cfg.num_parts)).cast("int")
        tagged = log_all.select(
            F.col("round"), part_of.alias("part"), F.lit(1).alias("__f"),
            F.coalesce(F.col("size"), F.lit(0)).cast("long").alias("__b"),
            F.lit(0).alias("__n"),
        ).unionByName(
            disc_rows.select(
                (lvl_round - 1).alias("round"), part_of.alias("part"),
                F.lit(0).alias("__f"), F.lit(0).cast("long").alias("__b"),
                F.lit(1).alias("__n"),
            )
        )
        metrics_all = tagged.groupBy("round", "part").agg(
            F.sum("__f").alias("fetched"),
            F.sum("__n").alias("new_urls"),
            F.sum("__b").alias("bytes"),
        ).select(
            "round", "part", "fetched", "new_urls", "bytes",
            F.lit(False).alias("salted"),
        )

        pend = self._pending_window()
        pend["rounds"].extend(range(round_no, round_no + consumed))
        pend["new_seen"].append(block_seen_all)
        pend["log"].append(log_all)
        pend["front_adds"].append(disc_rows.select(*frontier_cols))
        pend["front_removed"].append(fetched_rows.select("url_key"))
        pend["metrics"].append(metrics_all)

        if self.image_table is not None:
            from httrack2warc_spark.functions.images import with_decode_check

            fetched_images = (
                fetched_rows.where(F.col("image_id").isNotNull())
                .select("image_id", "seq", "url", lvl_round.alias("round"))
                .join(self.image_table, "image_id")
            )
            checked = with_decode_check(fetched_images).select(
                "image_id", "fmt", "decoded_ok", "psnr_db", "phash_ok",
                "caption_ok", "round",
            )
            drained = fetched_images.select(
                "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
                F.col("seq").alias("fetch_seq"),
                F.col("url").alias("fetch_url"),
            )
            pend["images"].append(drained)
            pend["checks"].append(checked)

        self._drain_pages(fetched_rows, lvl_round, pend)

        merge_now = cfg.use_summaries and (
            cfg.summary_every <= 1
            or any(
                (round_no + i + 1) % cfg.summary_every == 0
                for i in range(consumed)
            )
        )
        if merge_now:
            delta = block_seen_all.select("url_key")
            if tail is not None:
                delta = delta.unionByName(tail.select("url_key"))
            hashed_new = add_partition_and_hashes(delta, "url_key", cfg.num_parts)
            merged = merge_summaries(
                summaries, hashed_new, cfg.num_parts,
                cfg.summary_kind, cfg.summary_capacity_per_part, cfg.summary_fpp,
            )
            if self._summary_mem is not None:
                pend["caches"].append(self._summary_mem)
            self._summary_mem = merged.localCheckpoint(eager=False)
            pend["summary"] = self._summary_mem
            self._summary_covered_round = round_no + consumed

        if (last_round + 1) % max(cfg.commit_every, 1) != 0:
            prev_all = self._pend_seen_all
            cum = (
                block_seen_all
                if prev_all is None
                else prev_all.unionByName(block_seen_all)
            ).persist()
            if prev_all is not None:
                pend["caches"].append(prev_all)
            self._pend_seen_all = cum
            pend["caches"].append(cum)

        pend["caches"].extend([frontier_prev, ckpt])

        # handoff: own (lazy) checkpoint layered on the materialized block,
        # same shape as the normal path's next_frontier — consumers re-scan
        # the in-memory block cheaply and survive the block's unpersist
        self._frontier_mem = (
            block.where(F.col("__lvl") == k)
            .select(*frontier_cols)
            .localCheckpoint(eager=False)
        )
        self._frontier_count_prev = per_level[consumed - 1]
        self._frontier_count = n_next
        self._window_pos = (last_round, next_seq)
        if (last_round + 1) % max(cfg.commit_every, 1) == 0:
            self._force_flush()
        return total_fetched, next_seq, consumed

    def _force_flush(self) -> None:
        """Flush the pending commit window (if any) using the latest round's
        handoffs — the cadence trigger, the end-of-crawl partial window, and
        direct ``run_round`` callers all land here."""
        if self._pending is not None and self._pending["rounds"]:
            round_no, seq_after = self._window_pos
            self._flush_window(
                round_no, seq_after, self._frontier_mem, self._hosts_mem
            )

    def _flush_window(
        self,
        round_no: int,
        seq_after: int,
        next_frontier: DataFrame,
        hosts_next: DataFrame | None,
    ) -> None:
        """Submit the combined commit wave for the pending window: unioned
        per-table deltas (one fileset per table per window), url_seen
        compaction, one consistent snapshot at the window boundary,
        retention, and the window's cache releases — all on the deferred
        tail, overlapped with the next round's plan/top-k/fetch phase."""
        cfg = self.cfg
        pend, self._pending = self._pending, None
        self._pend_seen_all = None
        if pend is None or not pend["rounds"]:
            return

        def _union(dfs: list[DataFrame]) -> DataFrame:
            out = dfs[0]
            for d in dfs[1:]:
                out = out.unionByName(d)
            return out

        new_seen_all = _union(pend["new_seen"])
        log_all = _union(pend["log"])
        metrics_all = _union(pend["metrics"])
        front_adds = _union(pend["front_adds"])
        front_removed = _union(pend["front_removed"])

        def _commit_frontier() -> None:
            # merge-on-read deltas (see _read_frontier): O(delta) appends,
            # then collapse to the CACHED next frontier (a cheap cache scan,
            # never a recompute) once tombstones outgrow the live set
            self.catalog.append("frontier", front_adds)
            self.catalog.append("frontier_removed", front_removed)
            n_adds = self.catalog.row_count("frontier")
            n_rem = self.catalog.row_count("frontier_removed")
            if n_rem > max(cfg.frontier_tombstone_min, n_adds - n_rem):
                self.catalog.write("frontier", next_frontier)
                self.catalog.write(
                    "frontier_removed",
                    self.spark.createDataFrame([], "url_key string"),
                )

        commits = [
            lambda: self.catalog.append(
                "url_seen", new_seen_all, bucket_by=self._seen_bucket()
            ),
            _commit_frontier,
            lambda: self.catalog.append("crawl_log", log_all),
            lambda: self.catalog.append("metrics", metrics_all),
        ]
        if pend["new_hosts"]:
            hosts_all = _union(pend["new_hosts"])
            commits.append(
                lambda: self.catalog.append("hosts_crawled", hosts_all)
            )
        if pend["summary"] is not None:
            merged = pend["summary"]
            commits.append(lambda: self.catalog.write("seen_summary", merged))
        if pend["images"]:
            img_all = _union(pend["images"])
            chk_all = _union(pend["checks"])
            commits.append(
                lambda: self.catalog.append("images_fetched", img_all)
            )
            commits.append(lambda: self.catalog.append("image_checks", chk_all))
        if pend["pages"]:
            pages_all = _union(pend["pages"])
            commits.append(lambda: self.catalog.append("pages", pages_all))

        covered = getattr(self, "_summary_covered_round", 0)
        caches = pend["caches"]
        n_frontier_now = self._frontier_count  # captured: the tail runs async

        def _tail() -> None:
            try:
                if cfg.parallel_commits and len(commits) > 1:
                    from concurrent.futures import ThreadPoolExecutor

                    with ThreadPoolExecutor(max_workers=len(commits)) as p:
                        for f in list(p.map(lambda c: c(), commits)):
                            pass
                else:
                    for c in commits:
                        c()
                if cfg.bucketed_seen:
                    self.catalog.compact_small(
                        "url_seen", bucket_by=self._seen_bucket(),
                        max_filesets=cfg.seen_compact_max,
                    )
                if hosts_next is not None:
                    # fill the hosts-handoff cache while its inputs (cached
                    # fetched) are still alive — the next round may also race
                    # to fill it, which is benign (tiny table, same result)
                    hosts_next.count()
                if cfg.salted_topk == "auto" and next_frontier is not None:
                    # skew probe for the auto-switch: max frontier rows on any
                    # one host. Runs here (off the critical path, once per
                    # window) over the cached handoff — an 8-byte (host,count)
                    # shuffle, and materializing next_frontier early is the
                    # same benign race as hosts_next above. When the WHOLE
                    # frontier fits under the threshold the per-host max
                    # cannot exceed it either — exact answer 0 signal, no job.
                    if n_frontier_now <= cfg.salt_auto_threshold:
                        self._max_host_frontier = 0
                    else:
                        self.spark.sparkContext.setJobDescription("salt:probe")
                        row = (
                            next_frontier.groupBy("host").count()
                            .agg(F.max("count"), F.count(F.lit(1))).collect()
                        )
                        self.spark.sparkContext.setJobDescription(None)
                        self._max_host_frontier = row[0][0] or 0
                        # same pass, one more 8-byte column: the frontier's
                        # distinct-host count, the avg signal's denominator
                        # when hosts_crawled is not maintained (robots off)
                        self._probe_n_hosts = row[0][1] or 0
                self.catalog.snapshot(
                    f"round-{round_no}",
                    {
                        "round": round_no,
                        "next_seq": seq_after,
                        "summary_covered_round": covered,
                    },
                )
                if cfg.keep_snapshots is not None:
                    # retention: expire old resume points, then reclaim the
                    # fileset dirs + h2w_* registrations only they referenced
                    self.catalog.expire_snapshots(cfg.keep_snapshots)
                    self.catalog.vacuum()
            finally:
                # a failed commit must not pin the window's caches forever
                for c in caches:
                    c.unpersist()

        self._submit_deferred(_tail)

    # ------------------------------------------------------------------ run
    def run(self, seeds: list[str] | None = None, resume: bool = False) -> DataFrame:
        """Run to frontier exhaustion; returns the final crawl_log."""
        if resume:
            tags = [t for t in self.catalog.list_snapshots() if t.startswith("round-")]
            if not tags:
                raise RuntimeError("nothing to resume")
            last = max(tags, key=lambda t: int(t[len("round-"):]))
            payload = self.catalog.rollback_to_snapshot(last)
            round_no = payload["round"] + 1
            next_seq = payload["next_seq"]
            self._summary_covered_round = payload.get("summary_covered_round", 0)
            self._reset_handoff()  # stale caches never survive a rollback
        else:
            assert seeds is not None
            self.start(seeds)
            round_no, next_seq = 0, 0

        aqe_before = self.spark.conf.get("spark.sql.adaptive.enabled", "true")
        try:
            while round_no < self.cfg.max_rounds:
                out = None
                n_hint = None  # footer count the block gate paid for, if any
                if self.cfg.batch_levels > 1:
                    if self._frontier_mem is not None:
                        n_now = self._frontier_count
                    else:
                        n_now = n_hint = self._frontier_row_count()
                    k = min(self.cfg.batch_levels, self.cfg.max_rounds - round_no)
                    k = self._growth_capped_k(k, n_now)
                    if k > 1 and self._block_eligible(n_now):
                        # fused k-level block: one foreground materialization
                        # for up to k rounds; None = post-hoc budget fallback,
                        # re-run the same rounds through the per-round path
                        # (state untouched by contract, so the hint holds)
                        out = self._run_level_block_guarded(
                            round_no, next_seq, k, n_hint
                        )
                if out is not None:
                    fetched, next_seq, consumed = out
                else:
                    # non-flushing form: round r's commit tail overlaps r+1
                    fetched, next_seq = self._run_round_guarded(
                        round_no, next_seq, n_hint
                    )
                    consumed = 1
                if fetched == 0:
                    break
                round_no += consumed
            # clean exit ONLY: the partial commit window at crawl end
            # (commit_every > 1, or a break between flush rounds) lands
            # before anything reads the final catalog state. On an
            # exception the pending window is DISCARDED instead (close()
            # below): its rounds may be half-assembled (an error between a
            # round's delta appends leaves e.g. seen without log), and
            # flushing + snapshotting a torn round would make resume
            # re-crawl against a catalog that already contains some of that
            # round's keys — silently dropping URLs. Discarding restores the
            # documented crash contract: the catalog stays at the last
            # consistent flush and resume re-crawls the lost window.
            self._flush_deferred()
            self._force_flush()
            self._flush_deferred()
        finally:
            self.close()
            self.spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
        return self.catalog.read("crawl_log").orderBy("seq")

    def close(self) -> None:
        """Release the deferred-commit worker thread and the in-memory round
        handoff caches (idempotent). ``run()`` calls this; direct
        ``run_round`` drivers should too when done."""
        pool, self._bg_pool = self._bg_pool, None
        if pool is not None:
            pool.shutdown(wait=True)
        self._reset_handoff()
