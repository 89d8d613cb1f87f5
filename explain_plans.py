#!/usr/bin/env python
"""Dump formatted physical plans for the engine's key operators → PLANS.md.

The build discipline (driver instructions): after correctness, ``.explain``
every operator and iterate until the plan is the one you'd want at 100 TB —
filters pushed to the scan, small sides broadcast, whole-stage codegen spans
wide, no accidental exchanges. This script materializes that review.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

from pyspark.sql import functions as F


def grab(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    from httrack2warc_spark import get_spark

    spark = get_spark(app_name="plans", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    sections: list[tuple[str, str, str]] = []

    qs = entry.queries()
    for name, expect in [
        ("q1_pricing_summary", "scan-level PushedFilters on l_shipdate + partial aggregation"),
        ("q3_top_orders", "broadcast-hash-join for the customer dim, shuffle join on the fact keys"),
        ("politeness_topk", "single exchange on o_custkey feeding the rank window"),
        ("ordinal_fifo_join", "both row_number windows + the join reuse one hash partitioning per side"),
        ("anti_join_unseen", "broadcast/shuffled left-anti join, filter pushed below"),
        ("token_count", "pure whole-stage-codegen projection, no exchange"),
        ("embedding_neardup", "LSH-bucketed candidates: equi-joins on "
         "(table, bucket) only — NO CartesianProduct/BroadcastNestedLoopJoin "
         "(asserted in tests/test_dedup_similarity.py)"),
        ("ngram_jaccard", "hot-shingle DF cap: window count over the same sh "
         "partitioning the self-join shuffles on"),
        ("doc_chunks", "pure whole-stage-codegen fan-out (sequence → explode "
         "→ slice) — the operator is exchange-free; the only Exchange is the "
         "graded query's final orderBy (oracle output determinism)"),
        ("corpus_sample", "single codegen'd scan: md5 draw + CASE threshold, "
         "NO join; only the final orderBy exchanges"),
        ("tfidf_keywords", "two hash aggregates on (id, term) / (term) "
         "narrow keys + rank window — documents never shuffle"),
        ("decontaminate_bench", "bench n-grams BroadcastHashJoin BuildRight: "
         "the corpus side never exchanges before the join (scan → one "
         "tokenize Project → Generate → BHJ), partial+final count on doc_id; "
         "only the oracle orderBy range-exchanges"),
        ("pii_redact", "map-only: scan → two Projects (augment, then "
         "regexp_count/replace chain) in one WholeStageCodegen span — zero "
         "shuffle except the oracle orderBy"),
        ("paragraph_dedup", "paragraph rows shuffle once on the paragraph "
         "key (stats aggregate with partial_count/partial_min map-side "
         "combine), join back on the same key, then one doc-id exchange for "
         "the order-preserving rebuild — document payloads cross the wire "
         "as their paragraphs, never whole"),
        ("pack_sequences", "distributed prefix sum (range exchange + "
         "per-partition window + broadcast per-partition offsets), then "
         "Generate fans each doc out to only the examples it overlaps "
         "carrying array slices; one hash exchange on the dense example id "
         "for the rebuild; the total-token cutoff is a BroadcastNestedLoop "
         "of a 1-row aggregate, not a driver collect"),
        ("asof_join", "union-window as-of: both inputs union (no join "
         "operator at all), ONE exchange on the key feeding the sort + "
         "running last(payload, ignorenulls) window; the right payload "
         "rides a single struct column"),
        ("phash_neardup", "pigeonhole block self-join: each fingerprint "
         "explodes to (blk, blkval) 9-byte keys, equi-join on both + id "
         "inequality, then one JVM bit_count per candidate inside codegen — "
         "no cartesian, no Python in the join path (image decode/pHash is "
         "the upstream mapInPandas source)"),
        ("repetition_filter", "one tagged Generate fans out n=1..3 grams, "
         "then three partial+final HashAggregate pairs on narrowing keys "
         "((id,n,g) → (id,n) → (id)) with map-side combine each time; the "
         "pivot is conditional-agg, not a generic pivot scan; document "
         "payloads never shuffle — only (id, n_tok, n, gram) rows"),
        ("hll_distinct", "HLL sketch: one codegen'd Project (md5 → bucket "
         "+ leading-zero rho), partial+final max on (event_type, bucket) "
         "— map-side combine caps the exchange at m=4096 rows per group — "
         "then a tiny per-group DECIMAL-sum aggregate; input rows never "
         "shuffle, only registers"),
        ("interval_join", "bucketized range join: intervals Generate over "
         "their overlapped buckets, points project one bucket key, plain "
         "shuffle/broadcast HASH join on __bucket + exact range Filter — "
         "NO BroadcastNestedLoopJoin despite the join having no natural "
         "equi key"),
        ("weighted_sample", "A-ES: one codegen'd Project (md5 uniform → "
         "ln(u)/w key) feeding TakeOrderedAndProject — the global top-k "
         "never materializes a full sort"),
        ("quantile_sketch", "binned quantiles: two partial+final "
         "HashAggregate pairs (per-group min/max broadcast back, then "
         "(group, bin) counts), one ≤256-row window cumsum, probs attach "
         "as Generate (explode of a literal array) — no join for the "
         "probs, no BNLJ anywhere"),
        ("q13_cust_dist", "TPC-H Q13: LEFT OUTER join with the NOT LIKE "
         "residual inside the join (BuildRight broadcast of orders at this "
         "SF; shuffled at scale), then two aggregates — count(o_orderkey) "
         "per customer including zero-order customers, histogram on top"),
        ("q6_revenue_scan", "TPC-H Q6: every predicate (shipdate range, "
         "discount band, quantity cap) lands in PushedFilters, ReadSchema "
         "prunes to the referenced columns, partial+final scalar aggregate "
         "— zero joins"),
        ("q19_disjunctive", "TPC-H Q19 shape: Catalyst keeps the common "
         "l_partkey=p_partkey equi-condition for a BroadcastHashJoin and "
         "evaluates the OR-of-conjuncts as a codegen residual filter"),
        ("q15_top_supplier", "max-of-aggregate via a 1-row broadcast "
         "equi-join on the normalized rounded-revenue key — NOT a global "
         "window (which would single-partition every supplier at scale)"),
        ("q22_lapsed_rich", "scalar threshold folded as a literal into "
         "PushedFilters on the customer scan; LeftAnti join against recent "
         "orders (broadcast at this SF, shuffled at scale — orders is the "
         "big side and is never forced broadcast)"),
        ("q2_min_cost", "per-group argmin: keyed window-min over the "
         "(part, supplier) offer aggregate — one exchange on p_partkey "
         "shared by the aggregate and the window, no global window, exact "
         "double-equality selection"),
        ("heavy_words", "Misra-Gries heavy hitters: tokenize Generate → "
         "MG summary (one mapInPandas, O(k) state, candidates + row count "
         "in one pass) feeds a collected bounded candidate list; the "
         "confirm is a pure-codegen isin Filter + partial/final count "
         "aggregate — the full-tail groupBy never appears in the plan"),
        ("q7_volume_shipping", "TPC-H Q7: the nation dim broadcasts TWICE "
         "(supplier role + customer role), the symmetric pair predicate "
         "is a codegen residual after the joins, and the final "
         "(nation, nation, year) aggregate partial-combines map-side"),
        ("q10_returned_items", "TPC-H Q10: TakeOrderedAndProject — each "
         "partition keeps its local top-20 on (revenue DESC, custkey), "
         "the driver merges 20-row heaps; no global sort materializes"),
        ("sssp_relax", "unrolled Bellman-Ford: each relaxation round is a "
         "BroadcastHashJoin of the tiny dist frontier against the edge "
         "set + a re-min HashAggregate — the seed comes from range(1).id "
         "because a lit(0) join key would constant-fold to a cross join"),
        ("date_densify", "calendar spine: sequence() explode over a 2-row "
         "min/max aggregate (no stored calendar), left BroadcastHashJoin "
         "back to the AGGREGATED daily counts — the raw events never "
         "join the spine"),
        ("q12_priority_class", "fact-fact equi-join on the order key with "
         "shipdate PushedFilters and CASE-sums partial+final; the join is "
         "declared with NO broadcast hint so AQE picks broadcast at fixture "
         "scale and shuffle join when both sides are facts at 100 TB"),
        ("q11_important_stock", "two-pass global-fraction HAVING: one "
         "exchange on l_partkey for the per-part DECIMAL aggregate; the "
         "grand total folds in as a LITERAL (O(1)-row driver collect, the "
         "q22 pattern) so the filter is codegen, not a second join"),
        ("argmax_per_group", "aggregate argmax: partial_max(struct) "
         "combines MAP-SIDE before the single group-key exchange — no "
         "window sort anywhere in the plan"),
        ("grouped_corr", "five exact BIGINT sufficient statistics in ONE "
         "partial-aggregable pass; the coefficient is a codegen projection "
         "over the 5-row aggregate"),
        ("bm25_rank", "query-term filter BEFORE the explode-side aggregate: "
         "only query-term hits shuffle (partial+final HashAggregate on "
         "(doc_id, term) with map-side combine); the <=|q|-row df table "
         "BroadcastHashJoins back so idf is in-plan, N/avgdl are literals, "
         "per-term contributions floor to integer micros and sum exactly; "
         "TakeOrderedAndProject top-k, no global sort"),
        ("sorted_neighborhood", "ONE hash exchange on the 2-char prefix "
         "block feeding the within-partition sort + lead() window walk — "
         "O(n·w) candidates, no self-join blowup; levenshtein in codegen "
         "on exploded candidates"),
        ("mutual_nn", "LSH equi-join candidates (no cartesian) "
         "materialized once (localCheckpoint), directed edges are 24-byte "
         "rows: one argmax window exchange on src, one (src,dst) hash "
         "self-join for the mutuality test"),
        ("margin_mining", "candidate pairs materialize ONCE "
         "(localCheckpoint below the union — branches would re-run the LSH "
         "join per the CLAUDE.md union rule); ONE src exchange serves the "
         "top-k window (WindowGroupLimit prunes before the mean); two "
         "narrow joins attach the endpoint means"),
        ("dsir_select", "documents never shuffle: (id, bucket) counts "
         "partial-aggregate map-side and materialize ONCE (localCheckpoint "
         "scans below), the <=n_buckets log-ratio table BroadcastHashJoins "
         "back, doc weights are integer sums"),
        ("substring_dedup", "ONE parquet scan (the naive "
         "shared-agg + semi-join + total-join shape scans three times): an "
         "explicit repartition on the 60-bit span hash satisfies the "
         "per-doc distinct AND the per-span doc-count window with zero "
         "further exchange ([h] subset of [id,h] clustering), then one "
         "doc-id rollup; wide traffic is 16-byte (hash, doc) rows"),
        ("lm_quality", "documents never shuffle — (id, word) counts do "
         "(partial+final HashAggregate); the reference vocab materializes "
         "ONCE (localCheckpoint feeds the T/V scalar job and the logp "
         "join), per-word ln floors to micros in-plan, BroadcastHashJoin "
         "attaches it, doc scores are exact integer sums"),
        ("semdedup", "map-only assignment: the centroid matrix folds into "
         "the plan as literal arrays (k x dim cosine trees in one codegen "
         "Project), members materialize ONCE (localCheckpoint feeds both "
         "self-join sides + output); the only exchange keys on the cluster "
         "id for the within-cluster pair join — no cartesian"),
        ("sq8_ann", "quantization is a codegen'd zip_with over "
         "array_repeat(scale) — the scale tree in ARGUMENT position "
         "evaluates once per vector, not per dimension; scoring is the "
         "documented broadcast-cross baseline with INTEGER dot products "
         "(no float-sum order anywhere), TakeOrdered-style window top-k"),
        ("ngram_containment", "same single-exchange shape as ngram_jaccard "
         "— the hot-shingle DF window rides the sh partitioning the "
         "self-join shuffles on; intersection counts aggregate on 16-byte "
         "(a,b) keys, the per-doc size table joins back twice (AQE "
         "broadcasts it), both containment directions are exact integer "
         "micros in one codegen Project"),
        ("classifier_score", "documents never shuffle: one partial+final "
         "HashAggregate on narrow (id, bucket) rows, the <=4096-row "
         "micro-weight table BroadcastHashJoins back, the logit is an "
         "integer sum — no per-row model invocation anywhere"),
        ("allpairs_jaccard", "prefix filter = one sh exchange (DF window) "
         "+ one id exchange serving BOTH the size count and the "
         "rarity-rank row_number; the self-join keys only on rare prefix "
         "shingles (hot shingles structurally absent), size-ratio filter "
         "sits in the join condition before the pair aggregate; verify is "
         "an array_intersect over the once-computed shingle arrays"),
        ("count_min", "the sketch build is one codegen Project (token -> 4 "
         "(row,bucket) structs) + partial+final HashAggregate whose "
         "exchange is capped at d*w rows per partition; the probe side "
         "BroadcastHashJoins the <=2048-row counter table — the token "
         "stream never shuffles for the estimate"),
        ("bpe_pairs", "the corpus collapses to the distinct-word vocab "
         "in one partial+final aggregate; pair fan-out explodes the "
         "VOCAB (not the corpus), second aggregate on the pair key, "
         "TakeOrderedAndProject for the top-30 — the shape every "
         "train_bpe iteration repeats"),
        ("change_rate", "ONE exchange on the page key serves both the lag "
         "window and the groupBy aggregate; the estimator is a codegen "
         "Project over the 40-byte per-page aggregate rows — the "
         "observation log never reshuffles"),
        ("waterfill", "range exchange on (demand, key) + per-partition "
         "window with broadcast per-partition offsets (the K2 ranged "
         "prefix-sum shape — no single-partition global window); the "
         "(k, cum_k) scalars fold back as literals so the final "
         "allocation is one codegen Project over the checkpointed "
         "ranked table"),
        ("url_canon_query", "ONE codegen Project end-to-end: split/filter/"
         "array_sort/array_join all inside whole-stage codegen, zero "
         "exchanges before the presentation sort — the canonicalizer adds "
         "NOTHING to the url_seen probe's shuffle bill"),
        ("trap_detect", "map-only struct of regex + array ops in a single "
         "WholeStageCodegen span; the frontier gate costs no shuffle"),
        ("retry_backoff", "map-only codegen Project (shiftleft + md5 + "
         "unix_micros); no exchange, no Python"),
        ("aspect_buckets", "the bucket argmin FOLDS over a literal array "
         "(aggregate expression) — no explode, no per-image window, no "
         "join: one codegen Project then the tiny <=7-key aggregate"),
        ("sitemap_parse", "map-only: XML synthesis, regexp_extract_all, "
         "entity-decode transform and posexplode all in one codegen span + "
         "Generate; zero exchanges before the presentation sort"),
        ("image_batches", "ONE range exchange on (bucket, doc_id) does the "
         "ranking work (ranged seq, no per-bucket window funnel); the "
         "bucket-stats join is a broadcast of <=7 rows; the final "
         "per-batch aggregate is partial-aggregable"),
        ("link_predict", "wedge self-join shuffles (v, x) pairs of 8-byte "
         "ids on the center key; pair aggregate + left_anti adjacency "
         "check + two degree joins, all on int keys — documents never "
         "enter the plan"),
        ("winnow_fp", "near-zero-shuffle fingerprinting (r06: one narrow "
                      "round-robin exchange of the raw rows parallelizes the "
                      "per-shingle md5 head on single-row-group inputs; "
                      "no-op at cluster scale): one WholeStageCodegen "
         "Project evaluates the packed-hash array + zip_with window "
         "minima array-side, then Generate explodes the distinct "
         "selections — the only Exchange is the oracle orderBy"),
        ("winnow_overlap", "fingerprints self-join on the 8-byte fp key "
         "after the >max_fp_df hot-fp left_anti; per-doc totals join "
         "back on id — document text never shuffles, only (fp, id) rows"),
        ("mixture_sample", "per-domain counts partial+final aggregate "
         "(tiny), unpartitioned window-min over the |domains|-row table, "
         "broadcast back, codegen'd md5-draw filter — the corpus scans "
         "once and never shuffles"),
        ("phrase_search", "tokenize Generate → vocabulary isin Filter "
         "BEFORE any exchange, broadcast (slot,term) join, one hash "
         "aggregate on (id, anchor) — O(hits) shuffle, never O(tokens)"),
        ("image_patches", "two mapInPandas sources (generator + patchify "
         "kernel) meet in a BroadcastHashJoin on image_id; patch pixels "
         "never leave the kernel — only 5-column statistics rows flow"),
        ("clip_filter", "zip_with/aggregate cosine inside a codegen "
         "Project; the pair join is a plain hash join on pair_id (in the "
         "input_hint shape both embeddings share a row → map-only)"),
        ("html_extract", "ONE codegen Project runs the whole regexp "
         "chain (script/head strip → block newlines → entities → "
         "whitespace) — no UDF, no shuffle except the oracle orderBy"),
        ("ingest_pipeline", "five stages fuse into one plan: extraction "
         "Project → gate Filter → body-key window dedup (one exchange) → "
         "md5-draw Filter → chunk Generate — no stage materializes "
         "between them"),
        ("incremental_dedup", "both checkpointed band streams share one "
         "explicit (band,bucket) repartition reused by the cap window "
         "and BOTH cross-join inputs; verify joins read the checkpointed "
         "sets — no re-tokenize anywhere in the plan"),
    ]:
        sections.append((name, expect, grab(qs[name](spark, sf_dir))))

    # frontier discovery kernel
    from httrack2warc_spark.operators.seen import (
        add_partition_and_hashes,
        build_summaries,
        filter_new_urls,
    )

    seen = spark.range(100_000).select(
        F.concat(F.lit("h/"), F.col("id").cast("string")).alias("url_key")
    )
    summ = build_summaries(
        add_partition_and_hashes(seen, "url_key", 16), 16, capacity_per_part=10_000
    )
    cand = spark.range(50_000, 150_000).select(
        F.concat(F.lit("h/"), F.col("id").cast("string")).alias("url_key")
    )
    sections.append(
        (
            "filter_new_urls (Bloom-gated discovery anti-join, codegen path)",
            "NO Python in the hot path: BroadcastHashJoin on part against the "
            "filter-word rows, k shiftright/AND bit tests inside "
            "WholeStageCodegen evaluated ONCE on the map side of the single "
            "explicit url_key exchange (maybe_seen crosses the wire as one "
            "byte), then disjoint branches — probe-misses anti-join only the "
            "small unsummarized tail, probe-hits confirm against the exact "
            "filesets — unioned back; both branch windows reuse the one "
            "exchange's clustering",
            grab(filter_new_urls(cand, seen, summ, "url_key", 16,
                                 capacity=10_000)),
        )
    )
    sections.append(
        (
            "filter_new_urls (pandas cogroup path — cuckoo summaries)",
            "cogroup (FlatMapCoGroupsInPandas) probe; anti-join only on probe-hits",
            grab(filter_new_urls(cand, seen, summ, "url_key", 16)),
        )
    )

    # bucketed url_seen confirm join (Iceberg bucket-partitioning stand-in)
    import tempfile

    from httrack2warc_spark.sinks.tables import TableCatalog

    cat = TableCatalog(spark, tempfile.mkdtemp(prefix="plans_bucketed_"))
    cat.write(
        "url_seen",
        seen.withColumn("url", F.col("url_key")).withColumn(
            "enqueued_round", F.lit(0)
        ),
        bucket_by=("url_key", 16),
    )
    fs = cat.read_filesets("url_seen")[0]
    sections.append(
        (
            "bucketed confirm anti-join (url_seen fileset)",
            "seen side = bucketed scan (Bucketed: true), NO Exchange/Sort under "
            "it; only the probe side exchanges (merge hint forces the "
            "at-scale SMJ shape — with a tiny probe AQE broadcasts instead)",
            grab(cand.join(fs.select("url_key").hint("merge"), "url_key", "left_anti")),
        )
    )

    # ANN plans after the hygiene pass: no .first()/collect before the
    # candidate join; bucket/cell assignment is one ArrowEvalPython node
    for name, expect in [
        ("lsh_ann", "ArrowEvalPython (batch matmul buckets) → posexplode → "
                    "bucket join; no literal hyperplane trees"),
        ("ivf_ann", "TakeOrderedAndProject centroid sample (no global sort); "
                    "ArrowEvalPython cell assignment"),
        ("minhash_neardup", "JVM-side signatures; capped band buckets; "
                            "8-byte bucket-key self-join"),
        ("embedding_neardup", "JVM-side zip_with dot products, range self-join"),
    ]:
        sections.append((name, expect, grab(qs[name](spark, sf_dir))))

    out = ["# PLANS — formatted physical plans of the key operators\n"]
    for name, expect, plan in sections:
        out.append(f"## {name}\n\nExpected shape: {expect}\n\n```\n{plan}```\n")
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md", file=sys.stderr)


if __name__ == "__main__":
    main()
