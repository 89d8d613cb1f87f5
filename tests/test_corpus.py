"""Corpus-preparation operators: context-window chunking, deterministic
(stratified) sampling, TF-IDF keyword extraction."""

import hashlib
import math

from pyspark.sql import functions as F

from httrack2warc_spark.operators.corpus import (
    chunk_documents,
    deterministic_sample,
    stratified_sample,
    tfidf_topk,
)


def test_chunk_documents_windows(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))),  # 10 tokens
         (2, "a b c"),                               # fits in one window
         (3, ""),                                    # zero tokens: no chunks
         (4, " ".join(f"x{i}" for i in range(8)))],  # exact boundary
        "id long, text string",
    )
    out = chunk_documents(docs, "text", "id", max_tokens=8, overlap=4)
    rows = {(r.id, r.chunk_idx): (r.chunk_text, r.n_tokens) for r in out.collect()}
    # n=10, stride=4: 1 + ceil(2/4) = 2 windows — [t0..t7], [t4..t9]
    assert rows[(1, 0)] == (" ".join(f"t{i}" for i in range(8)), 8)
    assert rows[(1, 1)] == (" ".join(f"t{i}" for i in range(4, 10)), 6)
    assert rows[(2, 0)] == ("a b c", 3)
    assert rows[(4, 0)][1] == 8
    assert not any(i == 3 for i, _ in rows)
    assert len(rows) == 4
    # every token of doc 1 is covered
    covered = set(rows[(1, 0)][0].split()) | set(rows[(1, 1)][0].split())
    assert covered == {f"t{i}" for i in range(10)}


def test_deterministic_sample_is_stable_and_md5_exact(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "id long")
    a = {r.id for r in deterministic_sample(df, "id", 0.3, seed=7).collect()}
    b = {r.id for r in deterministic_sample(df, "id", 0.3, seed=7).collect()}
    assert a == b                      # stable across runs
    assert 0.25 < len(a) / 2000 < 0.35  # roughly the asked fraction
    # exact membership matches the documented md5 rule
    for i in [0, 1, 17, 999]:
        draw = int(hashlib.md5(f"{i}:7".encode()).hexdigest()[:8], 16)
        assert (i in a) == (draw < int(0.3 * (1 << 32))), i
    # growing the corpus keeps prior members (pure function of id+seed)
    small = {r.id for r in deterministic_sample(
        df.where(F.col("id") < 500), "id", 0.3, seed=7).collect()}
    assert small == {i for i in a if i < 500}


def test_stratified_sample_rates(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(4000)],
        "id long, lang string",
    )
    out = stratified_sample(df, "id", "lang", rates={"en": 0.8, "de": 0.1},
                            seed=3).collect()
    en = sum(1 for r in out if r.lang == "en") / 2000
    de = sum(1 for r in out if r.lang == "de") / 2000
    assert 0.75 < en < 0.85 and 0.06 < de < 0.14, (en, de)


def test_tfidf_topk_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "apple banana apple"),   # apple tf=2 df=1; banana tf=1 df=2
         (2, "banana cherry"),
         (3, "dates")],
        "id long, text string",
    )
    out = {(r.id, r.term): r.score
           for r in tfidf_topk(docs, "text", "id", k=2).collect()}
    idf = lambda df_: math.log(4 / (1 + df_)) + 1  # noqa: E731  N=3
    assert out[(1, "apple")] == round(2 * idf(1), 6)
    assert out[(1, "banana")] == round(1 * idf(2), 6)
    assert out[(2, "cherry")] == round(1 * idf(1), 6)
    assert out[(3, "dates")] == round(1 * idf(1), 6)
    # the df cap drops ubiquitous terms entirely
    capped = tfidf_topk(docs.withColumn("text", F.concat(F.col("text"), F.lit(" the"))),
                        "text", "id", k=3, max_df_ratio=0.67)
    assert not [r for r in capped.collect() if r.term == "the"]


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=12, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=60),
    max_tokens=st.integers(min_value=2, max_value=16),
    data=st.data(),
)
def test_chunk_documents_invariants(spark, n, max_tokens, data):
    """For any (token count, window, overlap): every token is covered, chunk
    sizes are within the window, consecutive chunks overlap by exactly
    `overlap` (except a short tail), and stripping the overlaps reconstructs
    the original token stream."""
    overlap = data.draw(st.integers(min_value=0, max_value=max_tokens - 1))
    stride = max_tokens - overlap
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(n)))], "id long, text string"
    )
    rows = sorted(
        chunk_documents(docs, "text", "id", max_tokens, overlap).collect(),
        key=lambda r: r.chunk_idx,
    )
    if n == 0:
        assert rows == []
        return
    expect_chunks = 1 + max(0, -(-(n - max_tokens) // stride)) if n > max_tokens else 1
    assert len(rows) == expect_chunks
    toks = [r.chunk_text.split() for r in rows]
    assert all(0 < len(t) <= max_tokens for t in toks)
    assert all(r.n_tokens == len(t) for r, t in zip(rows, toks))
    # reconstruction: first chunk whole, then each chunk minus its overlap
    rebuilt = toks[0] + [w for t in toks[1:] for w in t[overlap:]]
    assert rebuilt == [f"w{i}" for i in range(n)]


def test_decontaminate_flags_shared_ngrams(spark):
    from httrack2warc_spark.operators.corpus import decontaminate

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),   # contains bench 4-gram
         (2, "beta gamma delta epsilon something"),    # contains it shifted
         (3, "totally unrelated words here present"),  # clean
         (4, "alpha beta gamma other delta epsilon")], # broken up: clean
        "id long, text string",
    )
    bench = spark.createDataFrame(
        [("alpha beta gamma delta epsilon",)], "text string"
    )
    out = {r.id: r.n_hits for r in
           decontaminate(docs, bench, "text", "id", n=4).collect()}
    # bench 4-grams: {alpha beta gamma delta, beta gamma delta epsilon}
    assert out == {1: 2, 2: 1}


def test_decontaminate_counts_distinct_hits_once(spark):
    from httrack2warc_spark.operators.corpus import decontaminate

    docs = spark.createDataFrame(
        [(1, "a b c d x a b c d y a b c d")], "id long, text string"
    )
    bench = spark.createDataFrame([("a b c d",)], "text string")
    out = decontaminate(docs, bench, "text", "id", n=4).collect()
    # the 4-gram appears 3 times in the doc but is ONE distinct benchmark hit
    assert [(r.id, r.n_hits) for r in out] == [(1, 1)]


def test_redact_pii_counts_and_placeholders(spark):
    from httrack2warc_spark.operators.corpus import redact_pii

    docs = spark.createDataFrame(
        [(1, "mail a.b+c@ex-ample.org or d@e.io, ip 10.0.0.1, tel 555-123-4567"),
         (2, "nothing sensitive here"),
         (3, "999.1.2.3 still redacts the dotted quad by design")],
        "id long, text string",
    )
    rows = {r.id: r for r in redact_pii(docs, "text").collect()}
    assert (rows[1].n_email, rows[1].n_ipv4, rows[1].n_phone) == (2, 1, 1)
    assert rows[1].redacted == "mail <EMAIL> or <EMAIL>, ip <IP>, tel <PHONE>"
    assert (rows[2].n_email, rows[2].n_ipv4, rows[2].n_phone) == (0, 0, 0)
    assert rows[2].redacted == "nothing sensitive here"
    # \d{1,3} quads don't range-check octets — documented regex semantics
    assert rows[3].n_ipv4 == 1 and rows[3].redacted.startswith("<IP>")
    # original column is preserved alongside
    assert rows[1].text.startswith("mail a.b+c@")


def test_redact_pii_progressive_order(spark):
    from httrack2warc_spark.operators.corpus import redact_pii

    # an email whose domain ends in a dotted quad lookalike: the email
    # pattern consumes it FIRST, so the ipv4 count sees none of it
    docs = spark.createDataFrame([(1, "x 1.2.3.4@ab.cd y")], "id long, text string")
    r = redact_pii(docs, "text").collect()[0]
    assert (r.n_email, r.n_ipv4) == (1, 0)
    assert r.redacted == "x <EMAIL> y"


def test_repetition_topgram_stats_exact(spark):
    from httrack2warc_spark.operators.corpus import repetition_topgram_stats

    docs = spark.createDataFrame(
        [(1, "spam spam spam spam eggs"),          # top1: 4/5, top2: 3*2/5
         (2, "a b a b a b"),                       # top2 ("a b") = 3*2/6 = 1.0
         (3, "all distinct words only here now")], # top1 = 1/6
        "id long, text string",
    )
    rows = {r.id: r for r in
            repetition_topgram_stats(docs, "text", "id").collect()}
    assert rows[1].n_tokens == 5
    assert rows[1].top1_frac == 0.8
    assert rows[1].top2_frac == 1.2  # 3 occurrences x 2 tokens / 5 — can exceed 1 by overlap
    assert rows[2].top2_frac == 1.0
    assert rows[2].top3_frac == round(2 * 3 / 6, 6)
    assert rows[3].top1_frac == round(1 / 6, 6)
    # ns with no grams (n > token count) report 0, not a missing row
    one = spark.createDataFrame([(9, "solo")], "id long, text string")
    r9 = repetition_topgram_stats(one, "text", "id").collect()[0]
    assert (r9.top1_frac, r9.top2_frac, r9.top3_frac) == (1.0, 0.0, 0.0)


def test_dedup_paragraphs_first_occurrence_wins(spark):
    from httrack2warc_spark.operators.corpus import dedup_paragraphs

    docs = spark.createDataFrame(
        [
            (1, "alpha\nshared line\nbeta"),
            (2, "shared line\ngamma\nshared line"),  # cross-doc + within-doc
            (3, "delta\n\ndelta"),                   # empty para + within-doc dup
        ],
        "id long, text string",
    )
    out = {r.id: r for r in dedup_paragraphs(docs, "text", "id").collect()}
    # doc 1 is the global first occurrence of "shared line" (id 1 < 2)
    assert out[1].deduped == "alpha\nshared line\nbeta"
    assert (out[1].n_kept, out[1].n_dropped) == (3, 0)
    # doc 2 loses both copies (first occurrence lives in doc 1)
    assert out[2].deduped == "gamma"
    assert (out[2].n_kept, out[2].n_dropped) == (1, 2)
    # the empty paragraph between the two deltas is removed unconditionally
    # and the second delta is a within-doc duplicate
    assert out[3].deduped == "delta"
    assert (out[3].n_kept, out[3].n_dropped) == (1, 1)


def test_dedup_paragraphs_max_df_drops_boilerplate_everywhere(spark):
    from httrack2warc_spark.operators.corpus import dedup_paragraphs

    rows = [(i, f"unique {i}\ncookie banner") for i in range(5)]
    docs = spark.createDataFrame(rows, "id long, text string")
    # banner appears in 5 docs > max_df=3: ALL occurrences dropped,
    # including the first
    out = {r.id: r for r in dedup_paragraphs(docs, "text", "id", max_df=3).collect()}
    for i in range(5):
        assert out[i].deduped == f"unique {i}"
        assert (out[i].n_kept, out[i].n_dropped) == (1, 1)
    # without max_df the first occurrence (doc 0) keeps the banner
    out2 = {r.id: r for r in dedup_paragraphs(docs, "text", "id").collect()}
    assert out2[0].deduped == "unique 0\ncookie banner"
    assert all(out2[i].deduped == f"unique {i}" for i in range(1, 5))


def test_dedup_paragraphs_order_and_custom_sep(spark):
    from httrack2warc_spark.operators.corpus import dedup_paragraphs

    docs = spark.createDataFrame(
        [(7, "z||a||m||a||z")], "id long, text string"
    )
    out = dedup_paragraphs(docs, "text", "id", sep="||").collect()[0]
    # duplicates removed, survivor order is the original document order
    assert out.deduped == "z||a||m"
    assert (out.n_kept, out.n_dropped) == (3, 2)


def test_dedup_paragraphs_idempotent(spark):
    """After one pass every surviving paragraph is globally unique, so a
    second pass (with or without max_df) must be the identity."""
    from httrack2warc_spark.operators.corpus import dedup_paragraphs

    docs = spark.createDataFrame(
        [(i, f"unique {i}\nshared banner\nalso {i % 2}") for i in range(6)],
        "id long, text string",
    )
    once = dedup_paragraphs(docs, "text", "id", max_df=4).select(
        "id", F.col("deduped").alias("text")
    )
    twice = dedup_paragraphs(once, "text", "id", max_df=4)
    rows = {r.id: r for r in twice.collect()}
    base = {r.id: r.text for r in once.collect()}
    assert {i: r.deduped for i, r in rows.items()} == base
    assert all(r.n_dropped == 0 for r in rows.values())


def test_pack_sequences_hand_computed(spark):
    from httrack2warc_spark.operators.corpus import pack_sequences

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e"), (3, "f g h i j")], "id long, text string"
    )
    # streams: [a b c <eos>] [d e <eos>] [f g h i j <eos>] — 13 tokens,
    # L=4 → 3 full examples, the trailing lone <eos> is dropped
    out = {r.example_id: r for r in
           pack_sequences(docs, "text", "id", seq_len=4).collect()}
    assert len(out) == 3
    assert (out[0].text, out[0].n_docs) == ("a b c <eos>", 1)
    assert (out[1].text, out[1].n_docs) == ("d e <eos> f", 2)
    assert (out[2].text, out[2].n_docs) == ("g h i j", 1)


def test_pack_sequences_ranged_matches_single(spark):
    from httrack2warc_spark.operators.corpus import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(1 + (i * 7) % 13)))
         for i in range(200)],
        "id long, text string",
    ).repartition(8)
    single = pack_sequences(docs, "text", "id", seq_len=32, mode="single")
    ranged = pack_sequences(docs, "text", "id", seq_len=32, mode="ranged")
    s = sorted((r.example_id, r.text, r.n_docs) for r in single.collect())
    g = sorted((r.example_id, r.text, r.n_docs) for r in ranged.collect())
    assert s == g and len(s) > 10
    # every example is exactly seq_len tokens
    assert all(len(t.split(" ")) == 32 for _, t, _ in s)


def test_pack_sequences_empty_doc_contributes_eos(spark):
    from httrack2warc_spark.operators.corpus import pack_sequences

    docs = spark.createDataFrame(
        [(1, ""), (2, "a b c d e f g")], "id long, text string"
    )
    # doc 1 contributes a single <eos>; 9 tokens total, L=3 → 3 examples
    out = {r.example_id: r.text for r in
           pack_sequences(docs, "text", "id", seq_len=3).collect()}
    assert out[0] == "<eos> a b"
    assert out[1] == "c d e"
    assert out[2] == "f g <eos>"


def test_bm25_topk_hand_computed(spark):
    from httrack2warc_spark.operators.corpus import bm25_topk

    docs = spark.createDataFrame(
        [(1, "apple banana apple"),   # dl=3: apple tf=2
         (2, "banana cherry"),        # dl=2: no query hit
         (3, "apple dates kiwi lime")],  # dl=4: apple tf=1
        "id long, text string",
    )
    out = {r.id: r.score_u for r in bm25_topk(
        docs, "text", "id", ["apple", "mango"], k=10).collect()}
    # N=3, avgdl=3, df(apple)=2, mango absent everywhere
    k1, b = 1.2, 0.75
    idf = math.log(1 + (3 - 2 + 0.5) / (2 + 0.5))

    def tfn(tf, dl):
        return tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / 3.0))

    assert out == {
        1: math.floor(idf * tfn(2, 3) * 1e6),
        3: math.floor(idf * tfn(1, 4) * 1e6),
    }
    # doc 1 has the higher tf at below-average length: it must rank first
    top = bm25_topk(docs, "text", "id", ["apple"], k=1).collect()
    assert [r.id for r in top] == [1]


def test_bm25_topk_partitioning_invariant(spark):
    from httrack2warc_spark.operators.corpus import bm25_topk

    rows = [(i, f"alpha beta w{i % 5} " * (1 + i % 3)) for i in range(40)]
    docs = spark.createDataFrame(rows, "id long, text string")
    a = bm25_topk(docs.repartition(1), "text", "id", ["alpha", "w2"], k=40)
    b = bm25_topk(docs.repartition(13, "id"), "text", "id", ["alpha", "w2"], k=40)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_dsir_weights_prefers_target_domain(spark):
    """DSIR: every target-domain document outweighs every off-domain one,
    and weights are partitioning-invariant (integer-exact sums)."""
    from httrack2warc_spark.operators.corpus import dsir_weights

    spark_docs = [(i, f"spark shuffle partition executor stage task{i % 3} "
                      "broadcast join codegen") for i in range(10)]
    cook_docs = [(100 + i, f"butter flour sugar oven whisk bake{i % 3} "
                           "dough cream") for i in range(10)]
    docs = spark.createDataFrame(spark_docs + cook_docs,
                                 "doc_id long, text string")
    target = docs.where(F.col("doc_id") < 10)
    w = {r.doc_id: r.weight_micro for r in dsir_weights(
        docs, "text", "doc_id", target, n_buckets=256).collect()}
    assert len(w) == 20
    assert min(w[i] for i in range(10)) > max(w[100 + i] for i in range(10))

    w2 = {r.doc_id: r.weight_micro for r in dsir_weights(
        docs.repartition(7, "doc_id"), "text", "doc_id",
        target.repartition(3), n_buckets=256).collect()}
    assert w == w2


def test_substring_dup_spans_shared_block(spark):
    block = " ".join(f"s{i}" for i in range(8))  # one shared 8-token window
    docs = spark.createDataFrame(
        [(1, block + " aaa bbb"),          # block + 2 unique tails
         (2, "xxx yyy " + block),          # block + 2 unique heads
         (3, " ".join(f"u{i}" for i in range(9))),  # all-unique spans
         (4, "too short")],                # < 8 tokens: no row
        "id long, text string",
    )
    from httrack2warc_spark.operators.corpus import substring_dup_spans

    out = {
        r.id: (r.dup_spans, r.total_spans)
        for r in substring_dup_spans(docs, "text", "id", 8).collect()
    }
    # doc 1: 3 windows (s0..s7, s1..s7 aaa, s2..s7 aaa bbb) — only the
    # first also occurs in doc 2; same shape mirrored for doc 2
    assert out[1] == (1, 3)
    assert out[2] == (1, 3)
    assert out[3] == (0, 2)
    assert 4 not in out


def test_substring_dup_spans_distinct_within_doc(spark):
    # a window repeated INSIDE one document only is not a duplicate —
    # span sets are per-doc distinct and sharing needs >= 2 documents
    rep = " ".join(f"r{i}" for i in range(8))
    docs = spark.createDataFrame(
        [(1, rep + " " + rep)], "id long, text string"
    )
    from httrack2warc_spark.operators.corpus import substring_dup_spans

    row, = substring_dup_spans(docs, "text", "id", 8).collect()
    # 9 window positions, but position 9 repeats position 1 (r0..r7):
    # 8 DISTINCT spans, none shared with another document
    assert row.dup_spans == 0 and row.total_spans == 8


def test_unigram_logprob_exact_integers(spark):
    import math

    docs = spark.createDataFrame(
        [(0, "a a b"),      # reference doc: c(a)=2 c(b)=1, T=3 V=2
         (1, "a b"),
         (2, "a zzz")],     # zzz is OOV
        "id long, text string",
    )
    from httrack2warc_spark.operators.corpus import unigram_logprob

    ref = docs.where(F.col("id") == 0)
    out = {
        r.id: (r.logprob_micro, r.n_tokens)
        for r in unigram_logprob(docs, "text", "id", ref, alpha=0.5).collect()
    }
    denom = 3.0 + 0.5 * 2
    lp = lambda c: math.floor(math.log((c + 0.5) / denom) * 1e6)
    assert out[0] == (2 * lp(2) + lp(1), 3)
    assert out[1] == (lp(2) + lp(1), 2)
    assert out[2] == (lp(2) + lp(0), 2)  # OOV takes the c=0 tree


def test_hashed_classifier_trained_weights_and_determinism(spark):
    from httrack2warc_spark.operators.corpus import hashed_classifier_score

    docs = spark.createDataFrame(
        [(1, "good good text"), (2, "bad text"), (3, "")],
        "id long, text string",
    )
    # "trained" weight table: every bucket the fixture tokens hash to
    from pyspark.sql import functions as FF

    bucket_of = lambda t: spark.sql(
        f"SELECT CAST(conv(substring(md5('{t}'), 1, 8), 16, 10) AS BIGINT) % 4096"
    ).first()[0]
    w = spark.createDataFrame(
        [(bucket_of("good"), 500000),
         (bucket_of("bad"), -750000),
         (bucket_of("text"), 10000)],
        "bucket long, w_micro long",
    )
    out = {r.id: (r.logit_micro, r.n_tokens)
           for r in hashed_classifier_score(docs, "text", "id", weights=w).collect()}
    assert out[1] == (2 * 500000 + 10000, 3)
    assert out[2] == (-750000 + 10000, 2)
    assert 3 not in out  # zero tokens: no row

    # default md5 stand-in weights: stable across invocations
    a = hashed_classifier_score(docs, "text", "id").collect()
    b = hashed_classifier_score(docs, "text", "id").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_hashed_classifier_sparse_weights_keep_every_document(spark):
    """A sparse trained table (the natural fastText export covers only
    nonzero-weight buckets) must not drop documents or shrink n_tokens:
    uncovered buckets contribute weight 0 through the left join."""
    from httrack2warc_spark.operators.corpus import hashed_classifier_score

    docs = spark.createDataFrame(
        [(1, "good good text"), (2, "zebra zebra")],
        "id long, text string",
    )
    bucket_of = lambda t: spark.sql(
        f"SELECT CAST(conv(substring(md5('{t}'), 1, 8), 16, 10) AS BIGINT) % 4096"
    ).first()[0]
    # covers ONLY "good" — "text" and "zebra" hash to uncovered buckets
    w = spark.createDataFrame(
        [(bucket_of("good"), 500000)], "bucket long, w_micro long"
    )
    out = {r.id: (r.logit_micro, r.n_tokens)
           for r in hashed_classifier_score(docs, "text", "id", weights=w).collect()}
    # doc 1: 2×good weighted, "text" contributes 0; n_tokens = full 3
    assert out[1] == (2 * 500000, 3)
    # doc 2: no covered bucket at all — still one row, logit 0, n_tokens 2
    assert out[2] == (0, 2)


# ---------------------------------------------------------------------------
# BPE tokenizer induction
# ---------------------------------------------------------------------------


def _ref_bpe(texts, n_merges, min_pair_count):
    """Reference BPE (Sennrich et al.): greedy leftmost merge application,
    ties broken on the lexicographically smallest 'a b' pair string."""
    import re
    from collections import Counter

    wc = Counter(t for s in texts for t in re.findall(r"\w+", s.lower()))
    vocab = {tuple(w): c for w, c in wc.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best_cnt = max(pairs.values())
        if best_cnt < min_pair_count:
            break
        best = min((p for p, c in pairs.items() if c == best_cnt),
                   key=lambda p: f"{p[0]} {p[1]}")
        merges.append(best)
        new = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = c
        vocab = new
    return merges


def test_train_bpe_matches_reference_including_overlaps(spark):
    from httrack2warc_spark.operators.corpus import train_bpe

    texts = [
        "the theme of the theater is the thesis",
        "aaaa aaa aa a banana bandana",
        "low lower lowest newest widest",
        "the the the banana aaaa",
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    got = train_bpe(docs, "text", n_merges=12, min_pair_count=2)
    want = _ref_bpe(texts, 12, 2)
    assert got == want
    assert len(got) >= 8  # the fixture genuinely exercises many merges
    # the overlap word 'aaaa' forces an (a,a)->aa then (aa,aa)/(aa,a) round:
    assert ("a", "a") in got


def test_bpe_pair_counts_weighted(spark):
    from pyspark.sql import functions as F

    from httrack2warc_spark.operators.corpus import bpe_pair_counts

    vocab = spark.createDataFrame(
        [(["a", "b", "c"], 5), (["a", "b"], 2), (["x"], 9)],
        "syms array<string>, cnt long",
    )
    rows = {r.pair: r.cnt for r in bpe_pair_counts(vocab, "syms", "cnt").collect()}
    assert rows == {"a b": 7, "b c": 5}


def test_mixture_sample_rates_and_membership(spark):
    from httrack2warc_spark.operators.corpus import mixture_sample

    rows = [(i, "a" if i < 100 else ("b" if i < 400 else "c")) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, dom string")
    targets = {"a": 0.5, "b": 0.3, "c": 0.2}
    # n = {a:100, b:300, c:600}; C = min(200, 1000, 3000) = 200 — domain a
    # binds and is kept whole; b thins to 200*0.3/300=0.2, c to 200*0.2/600.
    out = mixture_sample(df, "id", "dom", targets, seed=3)
    got = {(r.id, r.dom) for r in out.collect()}
    kept = {d: sum(1 for _, x in got if x == d) for d in targets}
    assert kept["a"] == 100                       # binding domain kept whole
    assert abs(kept["b"] - 60) < 25               # ~0.2 * 300
    assert abs(kept["c"] - 40) < 25               # ~0.0667 * 600
    # exact membership replays the documented rule
    C = min(100 / 0.5, 300 / 0.3, 600 / 0.2)
    n = {"a": 100, "b": 300, "c": 600}
    for i, d in [(5, "a"), (150, "b"), (500, "c"), (999, "c")]:
        thr = math.floor(((C * targets[d]) / n[d]) * float(1 << 32))
        draw = int(hashlib.md5(f"{i}:3".encode()).hexdigest()[:8], 16)
        assert ((i, d) in got) == (draw < thr), (i, d)
    # domains outside targets are dropped entirely
    df2 = df.union(spark.createDataFrame([(5000, "zz")], "id long, dom string"))
    got2 = {r.dom for r in mixture_sample(df2, "id", "dom", targets).collect()}
    assert "zz" not in got2


def test_phrase_search_positions_and_repeated_terms(spark):
    from httrack2warc_spark.operators.corpus import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "the data line join is here and data line join again"),
            (2, "data line nope join"),
            (3, "Data, LINE; join!"),          # normalization
            (4, "x data data data y"),          # overlapping repeated-term
            (5, ""),
        ],
        "id long, text string",
    )
    out = phrase_search(docs, "text", "id", ["data", "line", "join"])
    got = {(r.id, r.pos) for r in out.collect()}
    assert got == {(1, 2), (1, 8), (3, 1)}
    # repeated-term phrase: slot voting must demand distinct slots
    out2 = phrase_search(docs, "text", "id", ["data", "data"])
    got2 = {(r.id, r.pos) for r in out2.collect()}
    assert got2 == {(4, 2), (4, 3)}


def test_bpe_encode_order_and_double_pass(spark):
    from httrack2warc_spark.operators.corpus import bpe_encode

    merges = [("i", "n"), ("e", "r"), ("t", "a"), ("ta", "b"), ("b", "l"),
              ("o", "w")]
    docs = spark.createDataFrame(
        [(1, "table winter in a window"), (2, "aaaa"), (3, "")],
        "id long, text string",
    )
    out = {r.id: (r.seg, r.n_tokens)
           for r in bpe_encode(docs, "text", "id", merges).collect()}
    # merge ORDER: 'ta b' fires before 'b l' can — 'tab l e', never 'ta bl e'
    assert out[1] == ("tab l e / w in t er / in / a / w in d ow", 13)
    # 'a a a a' with no (a,a) merge stays 4 chars; empty doc → 0 tokens
    assert out[2] == ("a a a a", 4)
    assert out[3] == ("", 0)
    # bracket semantics == reference greedy merge-all, incl. runs ('aaaa'
    # → 'aa aa', 'aaaaa' → 'aa aa a') and no cross-symbol pseudo-match
    # ('ab'+'aa' must never fire a (b, aa) merge across the boundary)
    docs2 = spark.createDataFrame(
        [(2, "aaaa"), (5, "aaaaa"), (6, "abaa")], "id long, text string"
    )
    out2 = {r.id: (r.seg, r.n_tokens)
            for r in bpe_encode(docs2, "text", "id", [("a", "a")]).collect()}
    assert out2[2] == ("aa aa", 2)
    assert out2[5] == ("aa aa a", 3)
    out3 = {r.id: r.seg for r in bpe_encode(
        docs2, "text", "id", [("a", "b"), ("b", "aa")]).collect()}
    assert out3[6] == "ab a a"          # (b,aa) must not match inside 'ab'


def test_epoch_shuffle_permutation_properties(spark):
    from httrack2warc_spark.operators.corpus import epoch_shuffle

    df = spark.createDataFrame([(i,) for i in range(500)], "id long")
    e1 = {r.id: r.rank for r in epoch_shuffle(df, "id", 1, seed=5).collect()}
    # dense permutation: ranks are exactly 0..n-1
    assert sorted(e1.values()) == list(range(500))
    # stable across runs and modes (ranged == single)
    e1b = {r.id: r.rank for r in epoch_shuffle(
        df, "id", 1, seed=5, mode="single").collect()}
    assert e1 == e1b
    # different epochs are different permutations of the same ids
    e2 = {r.id: r.rank for r in epoch_shuffle(df, "id", 2, seed=5).collect()}
    assert e1 != e2 and sorted(e2.values()) == list(range(500))
    # exact md5 replay
    import hashlib
    draws = sorted(
        (int(hashlib.md5(f"{i}:e1:5".encode()).hexdigest()[:8], 16), i)
        for i in range(500)
    )
    assert {i: r for r, (_, i) in enumerate(draws)} == e1
