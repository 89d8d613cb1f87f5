"""Property tests for the filter kernels (pure numpy — no Spark session):
Bloom and cuckoo must NEVER produce a false negative (a dropped URL corrupts
visit order — the engine's worst failure mode), under any key set."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from httrack2warc_spark.operators.seen import (
    _Cuckoo,
    bloom_build,
    bloom_probe,
)

keys = st.lists(
    st.integers(min_value=0, max_value=2**64 - 1), min_size=1, max_size=400, unique=True
)


def _pair(ks):
    h1 = np.array(ks, dtype=np.uint64)
    # independent second hash: a fixed odd-multiplier mix
    h2 = (h1 * np.uint64(0x9E3779B97F4A7C15)) ^ (h1 >> np.uint64(31))
    return h1, h2


@settings(max_examples=100, deadline=None)
@given(keys)
def test_bloom_never_false_negative(ks):
    h1, h2 = _pair(ks)
    bits = bloom_build(h1, h2, capacity=500, fpp=0.01)
    assert bloom_probe(h1, h2, 500, 0.01, bits).all()


@settings(max_examples=100, deadline=None)
@given(keys)
def test_bloom_incremental_merge(ks):
    """building in two halves == membership for all keys."""
    h1, h2 = _pair(ks)
    half = len(ks) // 2
    bits = bloom_build(h1[:half], h2[:half], capacity=500, fpp=0.01)
    bits = bloom_build(h1[half:], h2[half:], capacity=500, fpp=0.01, bits=bits)
    assert bloom_probe(h1, h2, 500, 0.01, bits).all()


@settings(max_examples=100, deadline=None)
@given(keys)
def test_cuckoo_never_false_negative(ks):
    h1, _ = _pair(ks)
    ck = _Cuckoo(capacity=1000)
    inserted = ck.insert_many(h1)
    assert inserted == len(h1)  # ample capacity: all inserts must land
    assert ck.probe_many(h1).all()


@settings(max_examples=50, deadline=None)
@given(keys)
def test_cuckoo_serialization_roundtrip(ks):
    h1, _ = _pair(ks)
    ck = _Cuckoo(capacity=1000)
    ck.insert_many(h1)
    ck2 = _Cuckoo.from_bytes(ck.to_bytes())
    assert ck2.probe_many(h1).all()


@settings(max_examples=100, deadline=None)
@given(keys)
def test_bloom_v1_layout_never_false_negative(ks):
    """Legacy (kind='bloom') rows keep their v1 wraparound positions on
    probe and merge — a layout mix would manufacture false negatives."""
    from httrack2warc_spark.operators.seen import _bloom_positions_v1

    h1, h2 = _pair(ks)
    bits = bloom_build(h1, h2, capacity=500, fpp=0.01,
                       positions=_bloom_positions_v1)
    assert bloom_probe(h1, h2, 500, 0.01, bits,
                       positions=_bloom_positions_v1).all()
    # v2 probe of v1 bits WOULD miss for some key sets — that's exactly why
    # probe_summaries dispatches on the row's kind string (self-describing
    # layout) and summaries_to_words marks legacy rows not-ok (all-maybe).


@settings(max_examples=50, deadline=None)
@given(keys)
def test_bloom_v2_positions_overflow_free(ks):
    """The v2 position formula must equal its Column restatement: reduce
    both hashes mod m first, every intermediate < 32·m (ANSI-safe)."""
    from httrack2warc_spark.operators.seen import _bloom_params, _bloom_positions

    h1, h2 = _pair(ks)
    m, k = _bloom_params(500, 0.01)
    pos = _bloom_positions(h1, h2, k, m)
    a = h1 % np.uint64(m)
    b = h2 % np.uint64(m)
    for i in range(k):
        ref = (a.astype(object) + i * b.astype(object)) % m  # exact bigint
        assert (pos[i] == np.array(ref, dtype=np.int64)).all()
