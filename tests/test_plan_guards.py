"""Plan lint over the driver query surface: no accidental cartesian joins.

Every queries() entry that is pure plan-building (no side effects / driver
iteration in construction) must compile to a physical plan free of
CartesianProduct and BroadcastNestedLoopJoin. Known exceptions:
- embedding_topk / lsh_ann / ivf_ann / frontier-ish entries listed below are
  either intentionally broadcast-cross (tiny query side vs corpus: the
  documented brute-force baseline) or execute work while building.
"""

import pytest

import __spark_entry__ as entry

# intentionally-cross or non-plan-only queries
SKIP = {
    "embedding_topk",   # documented brute-force baseline: broadcast cross join
    "frontier_crawl",   # runs the crawl while building
    "frontier_polite",  # runs the crawl while building
    "warc_roundtrip",   # writes WARC files while building
    "dedup_components", # iterative: executes jobs during construction
    "pagerank",         # iterative: executes jobs during construction
    "ivf_ann",          # collects centroids while building
    "semdedup",         # collects centroids + checkpoints while building
    "sq8_ann",          # documented brute-force baseline: broadcast cross
                        # join (the embedding_topk shape; compose with
                        # ivf/lsh candidates for corpus-scale pruning)
    "pack_sequences",   # 1-ROW broadcast total-token cutoff: the aggregate
                        # side of the BNLJ has exactly one row (an equi-join
                        # on a literal key constant-folds back to cross), so
                        # the "nested loop" is one comparison per stream row
}

QUERIES = [n for n in entry.queries() if n not in SKIP]


@pytest.mark.parametrize("name", QUERIES)
def test_no_cartesian_in_plan(spark, name):
    df = entry.queries()[name](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}:\n{plan[:2000]}"
    assert "BroadcastNestedLoopJoin" not in plan, f"{name}:\n{plan[:2000]}"
