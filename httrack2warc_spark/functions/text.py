"""Text-analysis kernels for the training-data pipeline — all pure-Column
expressions (whole-stage codegen; no Python in the hot path).

These have no reference analogue (httrack2warc stores payloads opaquely); they
are the document-quality operators a 100 TB corpus pipeline runs next to the
crawl: token counting, quality scoring, language-ID heuristics, fingerprints.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "token_count",
    "word_tokens",
    "stopword_ratio",
    "punct_ratio",
    "avg_word_len",
    "quality_score",
    "lang_scores",
    "lang_id",
    "doc_fingerprint",
    "html_to_text",
    "html_title",
]

# small per-language stopword seeds for the n-gram/stopword heuristic
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "a"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "pour", "que", "dans"],
    "es": ["el", "la", "los", "y", "es", "no", "una", "por", "que", "con"],
}


def word_tokens(text: Column) -> Column:
    """array<string> of \\w+ tokens, lowercased."""
    return F.filter(
        F.split(F.lower(text), r"[^\w]+"), lambda t: F.length(t) > 0
    )


def token_count(text: Column) -> Column:
    """BPE-ish proxy: count of \\w+ runs (the standard pre-tokenizer split)."""
    return F.size(word_tokens(text))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = word_tokens(text)
    stops = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    return F.when(F.size(toks) > 0, n_stop / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    punct = n - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    return F.when(n > 0, punct.cast("double") / n).otherwise(F.lit(0.0))


def avg_word_len(text: Column) -> Column:
    toks = word_tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
    return F.when(F.size(toks) > 0, total.cast("double") / F.size(toks)).otherwise(
        F.lit(0.0)
    )


def quality_score(text: Column) -> Column:
    """[0,1] heuristic: length band + stopword presence − punctuation excess
    (the classic C4/Gopher-style cheap filters, composed as one expression)."""
    n_tok = token_count(text)
    length_ok = F.when((n_tok >= 10) & (n_tok <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
    stop_ok = F.least(stopword_ratio(text) * 4, F.lit(0.4))
    punct_pen = F.least(punct_ratio(text) * 2, F.lit(0.2))
    return F.round(length_ok + stop_ok + (F.lit(0.2) - punct_pen), 6)


def _contains_fn(stops: Column):
    return lambda t: F.array_contains(stops, t)


def lang_scores(text: Column) -> Column:
    """map<lang, ratio of that language's stopwords among tokens>."""
    toks = word_tokens(text)
    entries = []
    for lang, words in LANG_STOPWORDS.items():
        stops = F.array(*[F.lit(w) for w in words])
        n = F.size(F.filter(toks, _contains_fn(stops)))
        entries.extend(
            [F.lit(lang), F.when(F.size(toks) > 0, n / F.size(toks)).otherwise(F.lit(0.0))]
        )
    return F.create_map(*entries)


def lang_id(text: Column) -> Column:
    """argmax of lang_scores (ties → lexicographically first lang), 'und' if all 0."""
    toks = word_tokens(text)
    scored = []
    for lang, words in sorted(LANG_STOPWORDS.items()):
        stops = F.array(*[F.lit(w) for w in words])
        n = F.size(F.filter(toks, _contains_fn(stops)))
        scored.append(F.struct(n.alias("n"), F.lit(lang).alias("lang")))
    best = F.aggregate(
        F.array(*scored),
        F.struct(F.lit(-1).alias("n"), F.lit("und").alias("lang")),
        lambda acc, x: F.when(x["n"] > acc["n"], x).otherwise(acc),
    )
    return F.when(best["n"] > 0, best["lang"]).otherwise(F.lit("und"))


def doc_fingerprint(text: Column, normalize: bool = True) -> Column:
    """64-bit content fingerprint of normalized text (rolling-hash analogue:
    xxhash64 over the canonicalized token stream)."""
    base = F.concat_ws(" ", word_tokens(text)) if normalize else text
    return F.xxhash64(base)


# --- HTML main-content extraction ---------------------------------------------
#
# The regex chain below is deliberately RE2 ∩ Java-regex (inline (?is) flags,
# non-greedy .*?, NO backreferences), applied in this exact order, so a SQL
# oracle replays it verbatim with regexp_replace(..., 'g'):
#   1. strip <script>…</script> and <style>…</style> (separate passes — RE2
#      has no backreferences to share one pattern)
#   2. strip <head>…</head> (titles/meta are not body text)
#   3. strip <!-- comments -->
#   4. block-level tags → '\n' (paragraph boundaries survive)
#   5. any remaining tag → ' '
#   6. entity decode: &lt; &gt; &quot; &#39; &nbsp; then &amp; LAST
#      (so '&amp;lt;' decodes to '&lt;', never twice)
#   7. collapse horizontal whitespace, trim around newlines, collapse
#      newline runs, trim

_HTML_BLOCK_TAGS = (
    "p|div|br|h[1-6]|li|ul|ol|tr|td|th|table|blockquote|section|article|"
    "header|footer|nav|pre"
)

#: ordered entity decode — &amp; LAST so '&amp;lt;' decodes once, to '&lt;'
_HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
)


def _decode_entities(col: Column) -> Column:
    """The ONE entity chain both html_to_text and html_title apply — body
    and title decoding (and their SQL oracle replicas) must never drift."""
    for ent, rep in _HTML_ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(rep))
    return col


def html_to_text(col: Column) -> Column:
    """Main-content text from an HTML payload — the step between fetched
    crawl payloads and the ``documents`` table. Pure-Column regexp chain
    (whole-stage codegen, no parser library, no UDF): honest about being a
    regex extractor, which is exactly what large-corpus pipelines run at
    ingest grade (full DOM parsing is reserved for link rewriting, see
    ``operators/linkrewrite.py``). Scale: one codegen'd projection — no
    shuffle, no Python."""
    x = F.regexp_replace(col, r"(?is)<script\b[^>]*>.*?</script\s*>", "")
    x = F.regexp_replace(x, r"(?is)<style\b[^>]*>.*?</style\s*>", "")
    x = F.regexp_replace(x, r"(?is)<head\b[^>]*>.*?</head\s*>", "")
    x = F.regexp_replace(x, r"(?s)<!--.*?-->", "")
    x = F.regexp_replace(
        x, r"(?is)</?(" + _HTML_BLOCK_TAGS + r")\b[^>]*>", "\n"
    )
    x = F.regexp_replace(x, r"(?s)<[^>]+>", " ")
    x = _decode_entities(x)
    x = F.regexp_replace(x, r"[ \t\r\f]+", " ")
    x = F.regexp_replace(x, r" ?\n ?", "\n")
    x = F.regexp_replace(x, r"\n+", "\n")
    # trim() strips only spaces — newline padding needs its own pass
    return F.regexp_replace(F.trim(x), r"^\n+|\n+$", "")


def html_title(col: Column) -> Column:
    """<title> text (first occurrence), entity-decoded and
    whitespace-collapsed with the same chain as ``html_to_text``."""
    t = F.regexp_extract(col, r"(?is)<title[^>]*>(.*?)</title\s*>", 1)
    return F.trim(
        F.regexp_replace(_decode_entities(t), r"\s+", " ")
    )
