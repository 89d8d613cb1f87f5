"""Audio multimodal operators: real WAV codec, vectorized features,
fingerprints, window fan-out, quarantine of undecodable formats."""

import numpy as np
import pytest

from httrack2warc_spark.functions.audio import (
    audio_features,
    audio_fingerprint64,
    synth_audio,
    synth_samples,
    wav_decode,
    wav_encode,
    window_sample,
)


def test_wav_roundtrip_exact():
    s = synth_samples("a-1", 8000, 5000)
    sr, out = wav_decode(wav_encode(s, 8000))
    assert sr == 8000 and out.shape == (5000, 1)
    assert np.array_equal(out[:, 0], s)
    # stereo
    st = np.stack([s, -s], axis=1)
    sr2, out2 = wav_decode(wav_encode(st, 44100))
    assert sr2 == 44100 and np.array_equal(out2, st)


def test_wav_decode_rejects_garbage():
    with pytest.raises(ValueError):
        wav_decode(b"not a riff stream at all........")


def test_fingerprint_gain_invariant_and_discriminative():
    a = synth_samples("fp-a", 8000, 16000).astype(np.float64)
    b = synth_samples("fp-b", 8000, 16000).astype(np.float64)
    fa, fb = audio_fingerprint64(a), audio_fingerprint64(b)
    assert fa != fb  # different content → different prints
    assert audio_fingerprint64(a * 0.5) == fa  # gain-invariant
    # mild noise flips few bits
    noisy = a + np.random.default_rng(7).normal(0, 50, a.shape)
    assert bin(np.uint64(fa) ^ np.uint64(audio_fingerprint64(noisy))).count("1") <= 12


def _audio_df(spark, n=12):
    rows = [(f"au-{i}", synth_audio(f"au-{i}", 8000, 8000), "wav")
            for i in range(n)]
    rows.append(("au-bad", b"\xffcompressed-opaque-bytes", "mp3"))
    return spark.createDataFrame(rows, "audio_id string, bytes binary, fmt string")


def test_audio_features_dataframe(spark):
    out = audio_features(_audio_df(spark)).collect()
    by_id = {r.audio_id: r for r in out}
    assert len(by_id) == 13
    assert not by_id["au-bad"].decoded  # quarantined, not crashed
    ok = [r for r in out if r.decoded]
    assert len(ok) == 12
    for r in ok:
        assert r.sample_rate == 8000 and abs(r.duration_sec - 1.0) < 1e-9
        assert -30 < r.rms_db < 0
        assert 0 < r.zero_cross_rate < 1
        assert 50 < r.spectral_centroid < 4000
    # deterministic across runs
    again = {r.audio_id: r.fingerprint for r in audio_features(_audio_df(spark)).collect()}
    assert again == {r.audio_id: r.fingerprint for r in out}


def test_window_sample_fanout(spark):
    out = window_sample(_audio_df(spark, 4), window_ms=250, every_k=2).collect()
    # 1s @ 250ms = 4 windows, every 2nd kept → 2 per decodable row
    assert len(out) == 8
    assert {r.window_idx for r in out} == {0, 2}
    assert all(r.audio_id != "au-bad" for r in out)


from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra import numpy as hnp


@settings(max_examples=60, deadline=None)
@given(
    hnp.arrays(np.int16, st.tuples(st.integers(1, 400), st.integers(1, 2))),
    st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip_property(samples, sr):
    sr2, out = wav_decode(wav_encode(samples, sr))
    assert sr2 == sr and np.array_equal(out, samples)
