"""Corpus-preparation operators a large-scale training-data pipeline runs
between dedup and training: context-window chunking, deterministic sampling,
and TF-IDF keyword extraction. All three are pure-Column (whole-stage
codegen, no Python in the hot path) and value-checkable against a SQL oracle
— chunking and TF-IDF are exact functions of the text, and sampling uses the
md5-derived hash family (see ``operators.dedup._md5_long``) any SQL engine
reproduces bit-for-bit.

Round 5 additions: benchmark decontamination (n-gram leakage scrub), PII
redaction, the Gopher repetition quality gate, paragraph-level exact dedup
(repeated-line scrub) and GPT-style sequence packing — same contract: each
output is an exact function of the text under explicit deterministic rules
(ordered PII patterns, global first-occurrence paragraph rule, prefix-sum
packing offsets) that any SQL engine reproduces bit-for-bit.

Scale notes per op are on the functions; none of them ever shuffles document
payloads except where the semantics force it (TF-IDF's term aggregation
shuffles (term, count) pairs — 16-byte rows, not documents; paragraph dedup
shuffles paragraphs, never whole documents; packing ships array slices to
only the examples a document overlaps).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from httrack2warc_spark.functions.text import word_tokens
from httrack2warc_spark.operators.dedup import _parallel_head, md5_prefix_long

__all__ = [
    "bm25_topk",
    "chunk_documents",
    "decontaminate",
    "dedup_paragraphs",
    "deterministic_sample",
    "dsir_weights",
    "epoch_shuffle",
    "hashed_classifier_score",
    "bpe_pair_counts",
    "bpe_encode",
    "train_bpe",
    "mixture_sample",
    "pack_sequences",
    "phrase_search",
    "redact_pii",
    "repetition_topgram_stats",
    "stratified_sample",
    "substring_dup_spans",
    "tfidf_topk",
    "unigram_logprob",
]

#: (name, pattern, replacement) applied IN ORDER — counts for category i are
#: taken on the text with categories < i already redacted, so the operator
#: and any oracle that applies the same sequence agree exactly. Patterns are
#: deliberately restricted to the Java-regex ∩ RE2 common dialect (\b, \d,
#: bounded repetition; no backreferences or lookaround) so DuckDB/Trino/
#: BigQuery oracles reproduce them verbatim.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
]


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_tokens: int = 128,
    overlap: int = 0,
) -> DataFrame:
    """Split each document into sliding context windows of ``max_tokens``
    whitespace-ish tokens with ``overlap`` tokens of overlap (stride =
    max_tokens − overlap) — the standard LLM pre-training chunker. Returns
    one row per chunk: (id, chunk_idx, chunk_text, n_tokens).

    Window count = 1 + ⌈max(n − max_tokens, 0) / stride⌉, so every token is
    covered and the final window is never fully contained in its
    predecessor; zero-token documents produce zero chunks.

    Scale: a narrow per-row fan-out (sequence → posexplode → slice) with NO
    shuffle — tokens never leave their partition, and the expensive
    tokenization runs once per document (materialized column, not
    re-evaluated per window — see _shingles_of's lambda-body rationale).
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    with_words = _parallel_head(df).withColumn("__w", word_tokens(F.col(text_col)))
    n = F.size("__w")
    n_chunks = F.when(
        n > 0,
        1 + F.floor((F.greatest(n - max_tokens, F.lit(0)) + stride - 1) / stride),
    ).otherwise(F.lit(0)).cast("int")
    # sequence(1, 0) would generate a DESCENDING [1, 0] — guard the empty case
    idxs = F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return (
        with_words.select(
            F.col(id_col), F.col("__w"), F.explode(idxs).alias("chunk_idx")
        )
        .select(
            id_col,
            "chunk_idx",
            F.concat_ws(
                " ", F.slice(F.col("__w"), F.col("chunk_idx") * stride + 1, max_tokens)
            ).alias("chunk_text"),
            F.least(
                F.lit(max_tokens), F.size("__w") - F.col("chunk_idx") * stride
            ).alias("n_tokens"),
        )
    )


def _md5_uniform(key: Column, seed: int) -> Column:
    """Deterministic uniform draw in [0, 2^32) from the upper 32 md5 bits of
    ``key || ':' || seed`` — the cross-engine-reproducible sampling family
    (any SQL engine: ('0x' || substr(md5(k||':'||s), 1, 8))::BIGINT)."""
    return md5_prefix_long(F.concat(key.cast("string"), F.lit(f":{seed}")))


def deterministic_sample(
    df: DataFrame,
    id_col: str,
    fraction: float,
    seed: int = 42,
) -> DataFrame:
    """Keep each row iff its md5 draw falls under ``fraction`` — stable
    across runs, engines, partitionings and row order (unlike df.sample,
    which is per-partition-seeded). Membership is a pure function of
    (id, seed), so re-running on a grown corpus keeps the same rows."""
    return df.where(_md5_uniform(F.col(id_col), seed) < int(fraction * (1 << 32)))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. per-language mixing weights
    for a training corpus): row kept iff its md5 draw < its stratum's rate.
    The rates map folds into one CASE expression — no join, no shuffle;
    at 100 TB this is a single codegen'd scan."""
    draw = _md5_uniform(F.col(id_col), seed)
    thresh: Column = F.lit(int(default_rate * (1 << 32)))
    for value, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(stratum_col) == value, F.lit(int(rate * (1 << 32)))
        ).otherwise(thresh)
    return df.where(draw < thresh)


def decontaminate(
    df: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    bench_text_col: str | None = None,
    n: int = 8,
    count_col: str = "n_hits",
) -> DataFrame:
    """Benchmark decontamination: find training documents that share any
    word ``n``-gram with an evaluation/benchmark set — the standard
    train/test-leakage scrub (GPT-3 appendix C / Lee et al. 2022 use 8-13
    word n-grams). Returns one row per CONTAMINATED document:
    ``(id_col, count_col)`` where the count is the number of DISTINCT
    benchmark n-grams found in the document; anti-join the result against
    the corpus to drop (or mask) the flagged docs.

    Scale: both sides collapse to distinct n-grams before the join. A full
    eval-suite benchmark is ~10^5-10^6 n-grams — broadcast, so the 100 TB
    corpus side never shuffles (the groupBy re-uses the scan-local
    partitioning only after the broadcast semi-side cut the row count by
    orders of magnitude). The join key here is the n-gram STRING so a SQL
    oracle reproduces the join byte-for-byte; a production run at 10^12
    corpus n-grams would key on ``xxhash64(ngram)`` (8-byte exchange, FP
    rate 2^-64) — the one-line swap is noted inline.
    """
    from pyspark.sql.functions import broadcast

    from httrack2warc_spark.operators.dedup import _shingles_of

    bench_text_col = bench_text_col or text_col
    # tokenize ONCE per row: _shingles_of references its word-array argument
    # ~2n times (slice bases + size calls) — materializing __w keeps the
    # split/lower/filter tree a single Project instead of 2n inlined copies
    # in the Generate argument (same fix as repetition_topgram_stats; the
    # Project survives because Generate is not a CollapseProject target)
    # production: wrap both __g in F.xxhash64() for an 8-byte join key
    doc_grams = (
        # _parallel_head: corpus-side tokenize + n-gram explode parallelizes
        # (single-row-group inputs scan as one task; guide §2)
        _parallel_head(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), word_tokens(F.col(text_col)).alias("__w"))
        .select(
            F.col(id_col),
            F.explode(F.array_distinct(_shingles_of(F.col("__w"), n))).alias("__g"),
        )
    )
    bench_grams = (
        bench.select(word_tokens(F.col(bench_text_col)).alias("__w"))
        .select(
            F.explode(F.array_distinct(_shingles_of(F.col("__w"), n))).alias("__g")
        )
        .distinct()
    )
    return (
        doc_grams.join(broadcast(bench_grams), "__g")
        .groupBy(id_col)
        .agg(F.count("*").alias(count_col))
    )


def dedup_paragraphs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    sep: str = "\n",
    max_df: int | None = None,
    out_col: str = "deduped",
    kept_col: str = "n_kept",
    dropped_col: str = "n_dropped",
) -> DataFrame:
    """Paragraph/line-level exact dedup (the MassiveText / RefinedWeb
    repeated-line scrub — Rae et al. 2021 §A1.2, Penedo et al. 2023 §4.2):
    split each document on the literal ``sep``, drop every later exact
    occurrence of a paragraph already seen anywhere in the corpus (first
    occurrence by ``(id, position)`` wins), and — with ``max_df`` set —
    drop ALL occurrences of boilerplate paragraphs appearing in more than
    ``max_df`` distinct documents (nav bars, cookie banners, copyright
    footers). Returns ``(id, out_col, kept_col, dropped_col)`` with the
    surviving paragraphs rejoined by ``sep`` in original order. Empty
    paragraphs are removed unconditionally; a document with no non-empty
    paragraphs is absent from the result.

    Scale: paragraphs shuffle once on the paragraph key for the stats
    aggregate (map-side combine collapses within-partition repeats — the
    common case for boilerplate), once for the stats join back, and the
    rebuilt docs shuffle on id. The join key is the paragraph STRING so a
    SQL oracle reproduces it byte-for-byte; production would key on
    ``xxhash64(paragraph)`` (8-byte exchange, then only the first-occurrence
    winners carry their text). Hot boilerplate keys are exactly what
    ``max_df`` bounds — the stats aggregate meets them with partial
    aggregation, never a fat window.
    """
    import re

    # no _parallel_head here: the split+posexplode head is cheap relative to
    # the paragraph-key exchange right below it, and the extra round-robin
    # exchange of full texts measured as a net loss (r06: 1.6 -> 2.3 s)
    parts = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), re.escape(sep), -1)).alias(
            "__i", "__p"
        ),
    ).where(F.col("__p") != "")
    aggs = [
        F.min(
            F.struct(F.col(id_col).alias("f_id"), F.col("__i").alias("f_i"))
        ).alias("__first")
    ]
    if max_df is not None:
        aggs.append(F.count_distinct(F.col(id_col)).alias("__nd"))
    stats = parts.groupBy("__p").agg(*aggs)
    keep = (F.col(id_col) == F.col("__first.f_id")) & (
        F.col("__i") == F.col("__first.f_i")
    )
    if max_df is not None:
        keep = keep & (F.col("__nd") <= max_df)
    marked = parts.join(stats, "__p").withColumn("__keep", keep)
    # collect_list skips nulls → only kept paragraphs enter the rebuild;
    # array_sort on (position, text) structs restores the original order
    kept_struct = F.when(
        F.col("__keep"), F.struct(F.col("__i"), F.col("__p"))
    )
    return marked.groupBy(id_col).agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda x: x["__p"]
            ),
        ).alias(out_col),
        F.sum(F.col("__keep").cast("long")).alias(kept_col),
        F.sum((~F.col("__keep")).cast("long")).alias(dropped_col),
    )


def pack_sequences(
    df: DataFrame,
    text_col: str,
    id_col: str,
    seq_len: int,
    eos: str = "<eos>",
    mode: str = "single",
    example_col: str = "example_id",
    out_col: str = "text",
) -> DataFrame:
    """GPT-style sequence packing (concat-and-chunk): append ``eos`` to every
    document's token stream, concatenate the streams in ascending ``id_col``
    order, and cut the result into consecutive ``seq_len``-token training
    examples — the standard pretraining dataloader transform (GPT-2/3,
    The Pile). The trailing partial example is dropped. Returns
    ``(example_col, out_col, n_docs)`` where ``n_docs`` counts the documents
    contributing tokens to the example.

    Deterministic given unique ids: example k holds global token positions
    ``[k*seq_len, (k+1)*seq_len)``, where a document's start position is the
    exclusive prefix sum of earlier documents' token counts.

    Scale: the prefix sum is ``with_running_total`` — ``mode="ranged"`` is
    the distributed form (range exchange + per-partition prefix + a tiny
    per-partition-totals collect; the 10^9-row path shared with the WARC
    rotation planner, K2), ``single`` is one window for small inputs. Each
    document then fans out to only the examples it overlaps (1 + n/seq_len
    on average) carrying array SLICES, never per-token rows, and the
    examples rebuild with one exchange on the dense example id. The total
    token count joins in as a broadcast 1-row aggregate, not a driver
    collect.
    """
    from httrack2warc_spark.operators.sequence import with_running_total

    toks = _parallel_head(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col),
        F.concat(word_tokens(F.col(text_col)), F.array(F.lit(eos))).alias(
            "__tk"
        ),
    ).withColumn("__n", F.size("__tk"))
    started = with_running_total(
        toks, [F.col(id_col)], F.col("__n"), out_col="__start", mode=mode
    )
    # total tokens = last doc's start + count; aggregating the prefix-summed
    # frame (not toks) hits the ranged mode's internal persist instead of
    # re-tokenizing the corpus a second time. The broadcast of this 1-row
    # aggregate is necessarily a nested-loop cross (an equi-join on a
    # literal key constant-folds back to cross); with a single-row build
    # side it is one comparison per stream row — the plan lint carries a
    # documented exception (tests/test_plan_guards.py).
    total = F.broadcast(
        started.agg(
            F.max(F.col("__start") + F.col("__n")).alias("__total")
        )
    )
    L = F.lit(seq_len).cast("long")
    k0 = F.floor(F.col("__start") / L)
    k1 = F.floor((F.col("__start") + F.col("__n") - 1) / L)
    pieces = (
        started.crossJoin(total)
        .select(
            F.col("__start"),
            F.col("__tk"),
            F.explode(F.sequence(k0, k1)).alias("__k"),
            F.col("__total"),
        )
        # drop the trailing partial example
        .where(F.col("__k") < F.floor(F.col("__total") / L))
    )
    g_from = F.greatest(F.col("__k") * L, F.col("__start"))
    g_to_excl = F.least((F.col("__k") + 1) * L, F.col("__start") + F.size("__tk"))
    sliced = pieces.select(
        "__k",
        "__start",
        F.slice(
            F.col("__tk"),
            (g_from - F.col("__start") + 1).cast("int"),
            (g_to_excl - g_from).cast("int"),
        ).alias("__sl"),
    )
    return (
        sliced.groupBy("__k")
        .agg(
            F.concat_ws(
                " ",
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("__start", "__sl"))
                        ),
                        lambda x: x["__sl"],
                    )
                ),
            ).alias(out_col),
            F.count("*").alias("n_docs"),
        )
        .select(F.col("__k").alias(example_col), out_col, "n_docs")
    )


def redact_pii(
    df: DataFrame,
    text_col: str,
    out_col: str = "redacted",
    patterns: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """PII redaction over a text column: replaces every match of each
    pattern with its placeholder token and records a per-category match
    count (``n_<name>`` columns, counted on the text with earlier
    categories already redacted — see ``PII_PATTERNS`` ordering note).

    Scale: pure-Column ``regexp_count``/``regexp_replace`` — whole-stage
    codegen, zero shuffle, zero Python; at 100 TB this is a map-only pass
    that pipelines into whatever sink follows. The progressive-redaction
    trees are small (3 regexes) and stay inside one codegen stage.
    """
    patterns = PII_PATTERNS if patterns is None else patterns
    cur: Column = F.col(text_col)
    counts: list[Column] = []
    for name, pat, token in patterns:
        counts.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, token)
    return df.select("*", *counts, cur.alias(out_col))


def repetition_topgram_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    ns: tuple[int, ...] = (1, 2, 3),
    round_digits: int = 6,
) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021, table A1):
    for each document and each n in ``ns``, the fraction of tokens covered
    by the single most frequent word n-gram — boilerplate and degenerate
    (keyboard-mash / template) documents score high. Returns
    ``(id, n_tokens, top<n>_frac...)`` with fractions rounded to
    ``round_digits``; callers threshold (Gopher rejects top-2-gram > 0.20,
    top-3-gram > 0.18).

    Scale: all requested n-gram sizes explode in ONE pass (tagged structs,
    one shuffle of (id, n, gram) rows — never document payloads), two-level
    aggregate (count per gram → max per doc) keeps the map-side combine,
    and the final pivot is a conditional-agg over n ∈ ns, not a generic
    pivot scan. Tokenization runs once per document (materialized column;
    see ``_shingles_of`` for the lambda-body re-evaluation trap).
    """
    from httrack2warc_spark.operators.dedup import _shingles_of

    base = (
        # _parallel_head: tokenize + the n-gram explode head otherwise run
        # on the scan's (single) task for single-row-group inputs (guide §2)
        _parallel_head(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), word_tokens(F.col(text_col)).alias("__w"))
        .withColumn("__n_tok", F.size("__w"))
    )
    tagged = F.concat(
        *[
            F.transform(
                _shingles_of(F.col("__w"), n),
                # default-arg closure: HOF lambdas need exact arity, so bind
                # n via a literal in argument position instead
                (lambda n: lambda g: F.struct(F.lit(n).alias("n"), g.alias("g")))(n),
            )
            for n in ns
        ]
    )
    grams = base.select(
        id_col, "__n_tok", F.explode(tagged).alias("__t")
    ).select(id_col, "__n_tok", F.col("__t.n").alias("__n"), F.col("__t.g").alias("__g"))
    per_gram = grams.groupBy(id_col, "__n_tok", "__n", "__g").agg(
        F.count("*").alias("__c")
    )
    top = per_gram.groupBy(id_col, "__n_tok", "__n").agg(F.max("__c").alias("__top"))
    fracs = [
        F.round(
            F.coalesce(
                F.max(F.when(F.col("__n") == n, F.col("__top"))), F.lit(0)
            )
            * n
            / F.col("__n_tok"),
            round_digits,
        ).alias(f"top{n}_frac")
        for n in ns
    ]
    return (
        top.groupBy(id_col, "__n_tok")
        .agg(*fracs)
        .select(
            id_col, F.col("__n_tok").alias("n_tokens"),
            *[f"top{n}_frac" for n in ns],
        )
    )


def tfidf_topk(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    max_df_ratio: float | None = None,
    round_digits: int = 6,
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF:
    ``tf(term, doc) × (ln((1 + N) / (1 + df(term))) + 1)`` (the smoothed
    idf), ranked on the ROUNDED score with term tie-break so a SQL oracle
    ranking the same way selects identical rows. N counts every input row
    (token-less documents contribute to N but emit no terms).

    ``max_df_ratio`` drops terms appearing in more than that fraction of
    documents BEFORE scoring — stop-words carry no signal and their
    (term → doc list) groups are the one skew hazard here. The aggregation
    itself shuffles only (id, term, count) rows — never documents.

    Returns (id, term, score) with score rounded to ``round_digits``.
    """
    n_docs = df.count()
    terms = _parallel_head(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("term")
    )
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    if max_df_ratio is not None:
        docfreq = docfreq.where(F.col("df") <= int(max_df_ratio * n_docs))
    scored = tf.join(docfreq, "term").select(
        id_col,
        "term",
        F.round(
            F.col("tf") * (F.log((1.0 + n_docs) / (1.0 + F.col("df"))) + 1.0),
            round_digits,
        ).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= k)
        .drop("__r")
    )


def bm25_topk(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents for a bag-of-words query by Okapi BM25 (the
    Lucene/Robertson scoring every retrieval-based curation pipeline ranks
    with — e.g. selecting in-domain documents by similarity to a seed set):

        idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
        tfn(t,d)= tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
        score   = sum over query terms of idf * tfn

    Cross-engine determinism (the value-hash contract): each per-term
    contribution is ONE fixed-shape IEEE expression over integer columns
    (tf, df, dl) and two literals (N, avgdl) that an ANSI oracle states
    verbatim, floored to integer micros PER TERM — the per-document score
    is then an exact INTEGER sum, immune to partial-sum order in both
    engines (the dsir_weights recipe).

    Scale shape: the token stream filters to the query vocabulary BEFORE
    the (id, term) aggregation, so only query-term hits shuffle — a
    |q|-term query over 100 TB shuffles O(hits), never O(tokens) — with
    map-side partial counts; the per-term document-frequency table is at
    most |q| rows and BroadcastHashJoins back, so idf evaluates in-plan
    (no second scan, no extra action). N/avgdl come from one
    metadata-grade aggregate (the ``tfidf_topk`` n_docs pattern) — the
    only job besides the returned plan; tokenization runs once per row
    (materialized word array). The global top-k is TakeOrderedAndProject
    (per-partition heads, never a full sort).

    Returns (id, score_u) ranked on (score_u desc, id) — the oracle's
    exact ordering key.
    """
    # ONE tokenize pass for the whole operator (was two: the N/avgdl scalar
    # aggregate and the posting scan each re-tokenized the corpus): the
    # parallel head tokenizes once, keeps only (id, doc length, query-term
    # hits) — metadata-grade rows — and an eager checkpoint feeds both the
    # scalar job and the postings. _parallel_head: single-row-group inputs
    # otherwise tokenize on one task (guide §2); no-op at cluster scale.
    terms = list(query_terms)
    head = _parallel_head(df.select(F.col(id_col), F.col(text_col)))
    with_w = head.select(F.col(id_col), word_tokens(F.col(text_col)).alias("__w"))
    pruned = with_w.select(
        F.col(id_col),
        F.size("__w").alias("__dl"),
        F.filter("__w", lambda t: t.isin(list(set(terms)))).alias("__hits"),
    ).localCheckpoint(eager=True)
    n_docs, total_tokens = pruned.select(
        F.count(F.lit(1)),
        F.coalesce(F.sum("__dl"), F.lit(0)),
    ).first()
    avgdl = float(total_tokens) / float(n_docs) if n_docs else 1.0

    toks = pruned.select(
        F.col(id_col),
        F.col("__dl"),
        F.explode("__hits").alias("__term"),
    )
    tf = toks.groupBy(id_col, "__term").agg(
        F.count(F.lit(1)).alias("__tf"), F.first("__dl").alias("__dl")
    )
    dfreq = tf.groupBy("__term").agg(F.count(F.lit(1)).alias("__df"))

    idf = F.log(
        1.0
        + (F.lit(float(n_docs)) - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    tfn = (F.col("__tf").cast("double") * (k1 + 1.0)) / (
        F.col("__tf").cast("double")
        + k1 * (1.0 - b + b * (F.col("__dl").cast("double") / F.lit(avgdl)))
    )
    contrib_u = F.floor(idf * tfn * F.lit(1000000.0)).cast("long")
    scored = (
        tf.join(F.broadcast(dfreq), "__term")
        .select(F.col(id_col), contrib_u.alias("__cu"))
        .groupBy(id_col)
        .agg(F.sum("__cu").alias("score_u"))
    )
    return scored.orderBy(F.col("score_u").desc(), F.col(id_col)).limit(k)


def dsir_weights(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target: DataFrame,
    target_text_col: str | None = None,
    n_buckets: int = 4096,
    alpha: float = 0.5,
) -> DataFrame:
    """Hashed n-gram importance weights for data selection (DSIR, Xie et
    al. 2023): score each document by how much its hashed-bigram
    distribution looks like a TARGET domain versus the raw corpus —

        weight(doc) = sum over doc's bigram buckets of
                      count_doc(b) * [ln p_target(b) − ln p_raw(b)]

    with add-``alpha`` smoothed bucket probabilities. Select by taking the
    top-weighted documents (or resample proportionally) — the standard
    pre-training recipe for "more like this seed set, please".

    Determinism contract: the per-bucket log-ratio is the ONLY float in the
    pipeline — one fixed-shape IEEE tree over integer counts and literal
    totals, floored once to integer micros; doc weights are then exact
    INTEGER sums (count × ratio_micro), immune to partial-sum order in both
    engines. Buckets come from the md5 hash family (the cross-engine one).

    Scale shape: documents never shuffle — only (id, bucket) and (bucket)
    count rows do; the per-bucket log-ratio table is at most ``n_buckets``
    rows and broadcast-joins back onto the doc-bucket counts. The gram
    pipelines materialize exactly once (localCheckpoint on both count
    aggregates) — the smoothing-total scalar jobs and the returned plan all
    read the checkpoints, never re-tokenize; the totals then fold into the
    ratio expression as literals.

    Returns (id, weight_micro: long), one row per document with ≥1 bigram.
    """
    import math

    target_text_col = target_text_col or text_col

    def bigram_buckets(frame: DataFrame, col: str, keep_id: bool) -> DataFrame:
        from httrack2warc_spark.operators.dedup import _shingles_of

        cols = [F.col(id_col)] if keep_id else []
        # tokenize ONCE per row (materialized column), then the shared
        # zip-with-shifted shingle helper — same "a b" space-joined grams,
        # same empty array for 1-token docs. _parallel_head: the tokenize +
        # md5-bucket head otherwise runs on the scan's (single) task.
        with_w = _parallel_head(frame).select(
            *cols, word_tokens(F.col(col)).alias("__w")
        )
        out = with_w.select(
            *cols, F.explode(_shingles_of(F.col("__w"), 2)).alias("__g")
        )
        bucket = md5_prefix_long(F.col("__g")) % n_buckets
        return out.select(*cols, bucket.alias("__b"))

    # both aggregates are consumed by TWO downstream readers each (the
    # smoothing-total scalar job AND the returned plan), and the gram
    # pipeline above them is the expensive part — localCheckpoint(eager)
    # runs the tokenize+md5 work exactly once (the scheduler's materializer
    # pattern; persist is not enough — see the build-notes cache-by-plan note)
    doc_b = bigram_buckets(df, text_col, keep_id=True).groupBy(
        id_col, "__b"
    ).agg(F.count(F.lit(1)).alias("__c")).localCheckpoint(eager=True)
    raw_b = doc_b.groupBy("__b").agg(F.sum("__c").alias("__cr"))
    tgt_b = bigram_buckets(target, target_text_col, keep_id=False).groupBy(
        "__b"
    ).agg(F.count(F.lit(1)).alias("__ct")).localCheckpoint(eager=True)

    total_raw, = raw_b.select(F.coalesce(F.sum("__cr"), F.lit(0))).first()
    total_tgt, = tgt_b.select(F.coalesce(F.sum("__ct"), F.lit(0))).first()
    denom_raw = float(total_raw) + alpha * n_buckets
    denom_tgt = float(total_tgt) + alpha * n_buckets

    ratio = F.log(
        (F.coalesce(F.col("__ct"), F.lit(0)).cast("double") + alpha)
        / F.lit(denom_tgt)
    ) - F.log((F.col("__cr").cast("double") + alpha) / F.lit(denom_raw))
    bucket_ratio = (
        raw_b.join(tgt_b, "__b", "left")
        .select(
            "__b",
            F.floor(ratio * F.lit(1000000.0)).cast("long").alias("__rm"),
        )
    )
    return (
        doc_b.join(F.broadcast(bucket_ratio), "__b")
        .groupBy(id_col)
        .agg(F.sum(F.col("__c") * F.col("__rm")).alias("weight_micro"))
    )


def substring_dup_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window_tokens: int = 8,
) -> DataFrame:
    """Substring-level duplication audit (the ExactSubstr signal of Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models Better",
    restated over fixed-width token windows): a ``window_tokens``-token span
    is *duplicated* when the identical span occurs in at least one OTHER
    document. Per document, report how many of its distinct spans are
    duplicated — the pre-training curation signal for boilerplate/licence
    blocks that document-level MinHash misses (two long documents sharing
    one paragraph have tiny Jaccard but a screaming span count).

    Determinism contract: outputs are pure INTEGER counts of distinct
    window strings — no floats anywhere. Spans key on the top-60-bits of
    md5 (the cross-engine hash family); a 60-bit collision would perturb
    counts identically in any engine applying the same hash, so oracle
    equality is unconditional.

    Scale shape: documents are scanned and tokenized exactly ONCE — the
    naive shape (shared-span aggregate + semi-join + total-count join)
    consumes the span pipeline three times and Spark re-derives a common
    subtree per consumer (the build-notes union rule), tripling the expensive
    tokenize+md5 scan. Instead, one EXPLICIT repartition on the span hash
    satisfies the clustering requirement of all three downstream steps
    ([h] ⊆ [id, h]): the per-doc distinct, the per-span doc count (a window
    over the same h partitioning — zero further exchange), and then one
    final exchange on the doc id for the per-document rollup. Wide traffic
    is only (span_hash: long, doc_id) 16-byte rows. A boilerplate span hot
    enough to skew its h partition would be equally hot under any join-back
    shape — the rows must co-locate once to be counted.

    Returns (id, dup_spans, total_spans), one row per document with ≥1 span
    (documents shorter than ``window_tokens`` tokens have none).
    """
    w = F.col("__w")
    n_spans = F.size(w) - window_tokens + 1
    spans = F.transform(
        F.sequence(F.lit(1), n_spans),
        lambda i: F.array_join(F.slice(w, i, window_tokens), " "),
    )
    doc_spans = (
        # _parallel_head: tokenize + per-span md5 all run BEFORE the __h
        # repartition — on a single-row-group input that whole head was one
        # task (guide §2; measured 9.3 s at sf1.0). No-op at cluster scale.
        _parallel_head(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), word_tokens(F.col(text_col)).alias("__w"))
        .where(F.size(w) >= window_tokens)
        .select(F.col(id_col), F.explode(spans).alias("__s"))
        .select(
            id_col,
            # 60-bit md5 prefix: lean 8-byte shuffle key (shared primitive)
            md5_prefix_long(F.col("__s"), 15).alias("__h"),
        )
        .repartition(F.col("__h"))
        .dropDuplicates([id_col, "__h"])
    )
    n_docs = F.count(F.lit(1)).over(Window.partitionBy("__h"))
    return (
        doc_spans.withColumn("__nd", n_docs)
        .groupBy(id_col)
        .agg(
            F.sum(
                F.when(F.col("__nd") >= 2, F.lit(1)).otherwise(F.lit(0))
            ).alias("dup_spans"),
            F.count(F.lit(1)).alias("total_spans"),
        )
    )


def unigram_logprob(
    df: DataFrame,
    text_col: str,
    id_col: str,
    reference: DataFrame,
    reference_text_col: str | None = None,
    alpha: float = 0.5,
) -> DataFrame:
    """Language-model quality scoring (the CCNet recipe, Wenzek et al.
    2020, with a unigram LM standing in for KenLM): score every document by
    its log-probability under a model trained on a REFERENCE slice —
    low-probability documents are gibberish/boilerplate candidates, and the
    per-token normalized score is the standard quality-bucket key
    (head/middle/tail) for pre-training curation.

        logp(doc) = sum over tokens w of ln((c_ref(w) + alpha) / (T + alpha*V))

    with add-``alpha`` smoothing over the reference vocabulary of size V and
    total token count T; out-of-vocabulary tokens take the c_ref = 0 value.

    Determinism contract (the dsir_weights recipe): the per-WORD log-prob is
    the only float — one fixed-shape IEEE tree over an integer count and
    literal totals, floored once to integer micros. Document scores are then
    exact INTEGER sums (count x logp_micro), immune to partial-sum order in
    any engine. Ship (logprob_micro, n_tokens) instead of a quotient so the
    mean-per-token division (the one rounding hazard) never happens inside
    the value-checked surface.

    Scale shape: documents never shuffle — (id, word) count rows do (one
    exchange), and the reference-vocabulary logp table joins back on the
    word key (broadcast when the vocab fits — gated on the already-collected
    V, not forced — shuffle-hash otherwise; hot function words are fine
    either way because the doc-side is already aggregated per document). The
    reference count aggregate materializes once (localCheckpoint) and feeds
    both the T/V scalar job and the join.

    Returns (id, logprob_micro: long, n_tokens: long), one row per document
    with >= 1 token.
    """
    reference_text_col = reference_text_col or text_col

    # no _parallel_head here: tokenization is a cheap split (no per-token
    # hashing) and the per-(id, word) partial aggregate collapses the token
    # stream map-side before the exchange — the extra head exchange measured
    # as a net loss at BOTH sf0.1 and sf1.0 (r06: 2.16 -> 2.29 s at sf1.0)
    doc_w = (
        df.select(F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("__t"))
        .groupBy(id_col, "__t")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    ref_w = (
        reference.select(
            F.explode(word_tokens(F.col(reference_text_col))).alias("__t")
        )
        .groupBy("__t")
        .agg(F.count(F.lit(1)).alias("__cr"))
        .localCheckpoint(eager=True)
    )
    total, vocab = ref_w.select(
        F.coalesce(F.sum("__cr"), F.lit(0)), F.count(F.lit(1))
    ).first()
    denom = float(total) + alpha * float(vocab)

    # one fixed IEEE tree for in-vocab AND OOV words: coalesce(c, 0) feeds
    # the same ln((c + alpha)/denom) expression (the dsir_weights recipe —
    # each engine evaluates its own ln, never a Python-libm literal)
    logp = F.log(
        (F.coalesce(F.col("__cr"), F.lit(0)).cast("double") + alpha)
        / F.lit(denom)
    )
    word_logp = ref_w.select(
        "__t", F.floor(logp * F.lit(1000000.0)).cast("long").alias("__lm")
    )
    oov = F.floor(
        F.log(F.lit(alpha) / F.lit(denom)) * F.lit(1000000.0)
    ).cast("long")
    # broadcast only when the collected vocab count says the table is small
    # (~30 B/row -> 1M rows ~ 30 MB, the sane ceiling for a forced hint); a
    # web-scale reference slice (10^7+ words) degrades to the optimizer's
    # choice (shuffle-hash) instead of OOMing the driver on a forced build
    if vocab <= 1_000_000:
        word_logp = F.broadcast(word_logp)
    return (
        doc_w.join(word_logp, "__t", "left")
        .groupBy(id_col)
        .agg(
            F.sum(
                F.col("__c") * F.coalesce(F.col("__lm"), oov)
            ).alias("logprob_micro"),
            F.sum("__c").alias("n_tokens"),
        )
    )


def hashed_classifier_score(
    df: DataFrame,
    text_col: str,
    id_col: str,
    weights: DataFrame | None = None,
    n_buckets: int = 4096,
    seed: int = 7,
) -> DataFrame:
    """Linear classifier scoring over hashed bag-of-words features — the
    fastText-shaped quality-filter stage of the GPT-3/LLaMA-style pipelines
    (a trained classifier scores every document; low scorers are dropped or
    downsampled). The Spark shape is the point: tokens feature-hash into
    ``n_buckets`` buckets (md5 family), per-doc bucket counts aggregate once
    on narrow (id, bucket) rows, and the weight table broadcast-joins back —
    the score is a pure dataflow, no per-row model invocation.

        logit_micro(doc) = sum over doc's buckets of count(b) * w_micro(b)

    ``weights``: a (bucket: long, w_micro: long) DataFrame of INTEGER
    micro-weights — ship trained weights pre-floored to micros and the doc
    logit is an exact integer sum in any engine (sigmoid is monotone, so
    thresholding/ranking on the logit is thresholding on the probability;
    apply it outside the value-checked surface). When ``weights`` is None a
    deterministic md5-derived weight table stands in (tests/oracles): bucket
    b gets w_micro = (md5-draw of (seed, b) mod 2,000,001) − 1,000,000,
    uniform in [−1e6, 1e6] — reproducible in SQL verbatim.

    Scale shape: documents never shuffle; one partial+final aggregate on
    (id, bucket) 24-byte rows, then a BroadcastHashJoin against the
    ≤``n_buckets``-row weight table (the hint is only forced for the
    generated table, whose size is known; a user-supplied giant model is
    left to the optimizer, which degrades to shuffle-hash). Same plan
    family as ``dsir_weights`` — one scan, one narrow exchange,
    integer-exact output.

    The weight join is LEFT with coalesce(w, 0): a sparse trained table
    covering only nonzero-weight buckets (the natural fastText export)
    contributes 0 for uncovered buckets instead of silently dropping the
    document rows that hash there — n_tokens is always the document's full
    token count and every ≥1-token document gets its row.

    Returns (id, logit_micro: long, n_tokens: long), one row per document
    with ≥1 token.
    """
    bucket = md5_prefix_long(F.col("__t")) % n_buckets
    doc_b = (
        # _parallel_head: tokenize + per-token md5 bucket head (guide §2)
        _parallel_head(df.select(F.col(id_col), F.col(text_col)))
        .select(
            F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("__t")
        )
        .select(id_col, bucket.alias("__b"))
        .groupBy(id_col, "__b")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    generated = weights is None
    if generated:
        spark = df.sparkSession
        draw = md5_prefix_long(F.concat_ws(":", F.lit(seed), F.col("bucket")))
        weights = spark.range(0, n_buckets).select(
            F.col("id").alias("bucket"),
            (draw % 2000001 - 1000000).alias("w_micro"),
        )
    w = weights.select(
        F.col("bucket").alias("__b"), F.col("w_micro").alias("__w")
    )
    if generated:
        w = F.broadcast(w)
    return (
        doc_b.join(w, "__b", "left")
        .groupBy(id_col)
        .agg(
            F.sum(
                F.col("__c") * F.coalesce(F.col("__w"), F.lit(0))
            ).alias("logit_micro"),
            F.sum("__c").alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# BPE tokenizer induction
# ---------------------------------------------------------------------------


def _char_syms(word: Column) -> Column:
    """array<string> of single characters (Java split on the zero-width
    (?!^) boundary leaves a trailing empty element — filtered)."""
    return F.filter(F.split(word, r"(?!^)"), lambda c: F.length(c) > 0)


def _sym_pairs(syms: Column) -> Column:
    """Adjacent symbol pairs as 'a b' strings — the zip_with-over-shifted
    form (argument position, once per row; see dedup._shingles_of)."""
    shifted = F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0)))
    return F.filter(
        F.zip_with(
            syms,
            shifted,
            lambda a, b: F.when(
                a.isNull() | b.isNull(), F.lit(None).cast("string")
            ).otherwise(F.concat(a, F.lit(" "), b)),
        ),
        lambda x: x.isNotNull(),
    )


def bpe_pair_counts(vocab: DataFrame, syms_col: str, cnt_col: str) -> DataFrame:
    """Corpus-weighted adjacent-symbol pair counts — the per-iteration
    workload of BPE training (Sennrich et al. 2016). ``vocab`` is the
    DISTINCT-word table (syms: array<string>, cnt: long), so the fan-out
    is vocabulary-sized (10⁶-10⁷ rows at web scale), NOT corpus-sized:
    the token stream collapses to word counts once, and every merge
    iteration touches only the vocab. One explode + partial+final
    HashAggregate on (pair) — counts are exact integers.

    Returns (pair: string "a b", cnt: long).
    """
    return (
        vocab.select(
            F.explode(_sym_pairs(F.col(syms_col))).alias("pair"),
            F.col(cnt_col).alias("__c"),
        )
        .groupBy("pair")
        .agg(F.sum("__c").alias("cnt"))
    )


def train_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int = 32,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Byte-pair-encoding merge-table induction on the cluster — the
    tokenizer-training stage of an LLM data pipeline, as a driver loop in
    the pagerank/k-means mold (the per-iteration state is the DISTINCT-word
    vocab, lineage truncated by eager localCheckpoint each round).

    Iteration = ONE vocab-sized aggregate (:func:`bpe_pair_counts`) + a
    1-row argmax collect (metadata-scale, like the k-means centroid
    collect) + ONE codegen regexp_replace projection applying the merge.
    The merge application leans on java.util.regex leftmost-first
    non-rescanning replace semantics over the space-joined symbol string:
    for pair (a, a) on "a a a" the leftmost pair merges and scanning
    resumes AFTER the match — exactly BPE's left-to-right greedy collapse
    — so no per-row Python ever runs. Ties break on the lexicographically
    smallest pair string, making the merge sequence deterministic and
    engine-independent.

    Returns the ordered merge list [(left_sym, right_sym), ...]; stops
    early when the best pair's corpus count falls below
    ``min_pair_count``.
    """
    from httrack2warc_spark.functions.text import word_tokens

    spark = df.sparkSession
    vocab = (
        df.select(F.explode(word_tokens(F.col(text_col))).alias("__w"))
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.concat_ws(" ", _char_syms(F.col("__w"))).alias("syms_str"),
            F.col("cnt"),
        )
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            bpe_pair_counts(
                vocab.select(
                    F.split("syms_str", " ").alias("syms"), F.col("cnt")
                ),
                "syms",
                "cnt",
            )
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_pair_count:
            break
        a, b = top[0]["pair"].split(" ", 1)
        merges.append((a, b))
        pat = f"(?<=^| )\\Q{a}\\E \\Q{b}\\E(?= |$)"
        vocab = vocab.select(
            F.regexp_replace("syms_str", pat, a + b).alias("syms_str"),
            F.col("cnt"),
        ).localCheckpoint(eager=True)
    return merges


def mixture_sample(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    targets: dict[str, float],
    seed: int = 42,
) -> DataFrame:
    """Maximal deterministic subsample whose expected domain mixture equals
    ``targets`` — the static data-mixing step every multi-source training
    corpus runs (Pile/DoReMi-style domain weights). Unlike
    ``stratified_sample`` (caller supplies per-stratum RATES), the rates
    here are DERIVED from the data: with n_d rows in domain d and target
    share p_d, the retention-maximal solution keeps domain d at rate
    C * p_d / n_d where C = min_d(n_d / p_d) — the binding domain is kept
    whole and every other domain is thinned to match. Domains not in
    ``targets`` are dropped; a target domain with ZERO rows simply never
    appears (C minimizes over present domains only — the asked mixture is
    unachievable and the others are kept at their max rather than emptied).
    Membership is the md5 draw (pure function of (id, seed)), so the
    sample is stable across engines, partitionings and corpus growth.

    Cross-engine determinism: C, the rates and the 2^32-scaled thresholds
    are fixed-shape IEEE expressions over per-domain BIGINT counts and
    double literals — ``floor(((C * p) / n) * 2^32)`` with this exact
    association — so any SQL engine computes bit-identical thresholds and
    the md5 draw comparison is exact-integer.

    Scale: one partial-agg count per domain (tiny result), an unpartitioned
    window MIN over that |domains|-row table (single partition is fine at
    metadata grade), then a broadcast join back and a codegen'd filter —
    the 100 TB corpus is scanned once and never shuffled.
    """
    if not targets:
        raise ValueError("targets must be non-empty")
    p_case: Column = F.lit(None).cast("double")
    for value, share in sorted(targets.items()):
        p_case = F.when(
            F.col(domain_col) == value, F.lit(float(share))
        ).otherwise(p_case)
    counts = (
        df.groupBy(domain_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("__p", p_case)
        .where(F.col("__p").isNotNull())
    )
    c_min = F.min(F.col("__n").cast("double") / F.col("__p")).over(
        Window.partitionBy()
    )
    thresholds = counts.select(
        F.col(domain_col),
        F.floor(
            ((c_min * F.col("__p")) / F.col("__n").cast("double"))
            * F.lit(float(1 << 32))
        )
        .cast("long")
        .alias("__thr"),
    )
    draw = _md5_uniform(F.col(id_col), seed)
    return (
        df.join(F.broadcast(thresholds), domain_col)
        .where(draw < F.col("__thr"))
        .drop("__thr")
    )


def phrase_search(
    df: DataFrame,
    text_col: str,
    id_col: str,
    phrase: list[str],
) -> DataFrame:
    """Exact positional phrase search over a positional posting list — the
    inverted-index primitive behind benchmark decontamination at the
    phrase level and boilerplate locating (where ``decontaminate`` counts
    n-gram leakage, this returns the exact 1-based word position of every
    occurrence). Matching is on the ``word_tokens`` stream, so punctuation
    and case are normalized exactly as the rest of the text family.

    Algorithm: each posting for the j-th phrase term at word position p
    votes for anchor position p - (j - 1); an anchor with all
    ``len(phrase)`` distinct j-votes is a match (repeated phrase terms
    vote once per slot they could fill — countDistinct(j) handles them).

    Scale: the token stream filters to the phrase vocabulary BEFORE
    anything shuffles (the ``bm25_topk`` shape) — a phrase query over
    100 TB shuffles O(vocabulary hits), never O(tokens); the
    (slot, term) table is |phrase| rows and broadcast-joins; the only
    exchange is the (id, anchor) aggregation of the hits.

    Returns (id, pos) — one row per occurrence, pos = 1-based word
    position of the phrase's first word.
    """
    if not phrase:
        raise ValueError("phrase must be non-empty")
    terms = [t.lower() for t in phrase]
    m = len(terms)
    spark = df.sparkSession
    slots = F.broadcast(
        spark.createDataFrame(
            [(j + 1, t) for j, t in enumerate(terms)], "__j int, __t string"
        )
    )
    postings = _parallel_head(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col),
        F.posexplode(word_tokens(F.col(text_col))).alias("__i", "__t"),
    ).where(F.col("__t").isin(list(set(terms))))
    hits = (
        postings.join(slots, "__t")
        .select(
            F.col(id_col),
            (F.col("__i") + 2 - F.col("__j")).alias("pos"),
            F.col("__j"),
        )
        .where(F.col("pos") >= 1)
    )
    return (
        hits.groupBy(id_col, "pos")
        .agg(F.count_distinct(F.col("__j")).alias("__nj"))
        .where(F.col("__nj") == m)
        .select(id_col, "pos")
    )


def bpe_encode(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Apply an ordered BPE merge list (e.g. from ``train_bpe``) to every
    word — the tokenizer-APPLY step that turns text into subword tokens for
    training. Each word splits to characters, then each merge rewrites the
    pair on the symbol string, reproducing the reference greedy
    left-to-right merge-all step (Sennrich et al.) EXACTLY.

    Cross-engine formulation (the value-hash contract): symbols are
    bracketed — ``|a| |b| |c|`` — and each merge is ONE literal
    ``replace('|a| |b|', '|ab|')`` pass. The brackets are what make a
    plain leftmost replace-all equal to BPE: a match can only START at a
    symbol boundary (the pattern opens with ``|``) and can only END at one
    (it closes with ``|``), so a merged symbol's tail can never
    pseudo-match the next pattern ('ab'+'aa' never matches 'b aa'), a
    symbol prefix never matches ('b' never fires inside 'bc'), and
    consecutive occurrences share no characters so runs merge exactly like
    the reference ('aaaaa' → 'aa aa a', fuzz-verified against a greedy
    reference on 100k random words). No regex lookaround anywhere — RE2
    engines replay it verbatim.

    Scale: pure higher-order-function work inside one codegen'd projection
    — the merge chain runs per word-ARRAY element (lambda-var-only bodies:
    no captured-tree re-evaluation hazard), documents never shuffle, and a
    k-merge tokenizer costs k literal replaces per word. Returns
    (id, seg, n_tokens): the fully segmented document (words joined with
    ' / ') and the subword count.
    """
    from httrack2warc_spark.functions.text import word_tokens

    def enc(w: Column) -> Column:
        x = F.rtrim(F.regexp_replace(w, "(.)", "|$1| "))
        for a, b in merges:
            x = F.replace(x, F.lit(f"|{a}| |{b}|"), F.lit(f"|{a}{b}|"))
        return F.replace(x, F.lit("|"), F.lit(""))

    encoded = F.transform(word_tokens(F.col(text_col)), enc)
    n = F.aggregate(
        encoded, F.lit(0), lambda acc, x: acc + F.size(F.split(x, " "))
    )
    return df.select(
        F.col(id_col),
        F.concat_ws(" / ", encoded).alias("seg"),
        n.cast("long").alias("n_tokens"),
    )


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    epoch: int,
    seed: int = 42,
    out_col: str = "rank",
    mode: str = "ranged",
) -> DataFrame:
    """Deterministic training-epoch permutation — the dataloader shuffle,
    computed once as data: every row gets a dense global ``out_col`` rank
    (0, 1, …) in the order of its md5 draw over (id, seed, epoch). Each
    epoch is an independent permutation; re-running any epoch on any
    cluster/partitioning reproduces it bit-for-bit (df.orderBy(rand()) is
    per-partition-seeded and neither stable nor resumable).

    Scale: the draw is one codegen'd Project; the dense rank uses the
    RANGED global-sequence primitive (``with_global_seq``) — range
    exchange on the draw + per-partition row_number + a collected
    per-partition offset map — never a single-partition global window.
    ``mode="single"`` is the small-input shortcut.
    """
    draw = _md5_uniform(
        F.concat(F.col(id_col).cast("string"), F.lit(f":e{epoch}")), seed
    )
    from httrack2warc_spark.operators.sequence import with_global_seq

    return with_global_seq(
        df.withColumn("__draw", draw),
        order=[F.col("__draw"), F.col(id_col)],
        start=0,
        out_col=out_col,
        mode=mode,
    ).drop("__draw")
