"""Relational building blocks re-expressing the reference's implicit operators."""

from httrack2warc_spark.operators.ordinal_join import ordinal_fifo_join  # noqa: F401
from httrack2warc_spark.operators.dedup import (  # noqa: F401
    embedding_lsh_candidates,
    embedding_neardup_candidates,
    exact_dedup,
    first_occurrence,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_dedup,
)
from httrack2warc_spark.operators.topk import per_key_topk, salted_per_key_topk  # noqa: F401
from httrack2warc_spark.operators.windows import date_wraparound  # noqa: F401
from httrack2warc_spark.operators.similarity import (  # noqa: F401
    brute_force_topk,
    ivf_topk,
    lsh_ann_topk,
)
from httrack2warc_spark.operators.corpus import (  # noqa: F401
    chunk_documents,
    decontaminate,
    dedup_paragraphs,
    deterministic_sample,
    mixture_sample,
    phrase_search,
    redact_pii,
    repetition_topgram_stats,
    stratified_sample,
    tfidf_topk,
)
from httrack2warc_spark.operators.dedup import (  # noqa: F401
    connected_components,
    dedup_by_components,
    winnow_fingerprints,
)
from httrack2warc_spark.operators.fuzzy import fuzzy_match_pairs  # noqa: F401
from httrack2warc_spark.operators.pagerank import pagerank  # noqa: F401
from httrack2warc_spark.operators.asof import asof_join  # noqa: F401
from httrack2warc_spark.operators.interval import interval_join  # noqa: F401
from httrack2warc_spark.operators.sketches import (  # noqa: F401
    frequent_items,
    hll_cardinality,
    weighted_sample,
)
