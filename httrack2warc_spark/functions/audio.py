"""Audio-column operators (the audio leg of the multimodal matrix, alongside
functions/images.py): treat audio as an opaque ``binary`` column with typed
metadata, decode / feature-extract / window-sample via Arrow-batched
``mapInPandas`` — never per-row Python UDFs in the hot path; the DSP kernels
are vectorized numpy.

Codecs, honestly labeled (same policy as images.py):

- **WAV (RIFF PCM16/PCM8)** is a REAL codec — pure struct+numpy, round-trip
  exact, no external library needed.
- Compressed formats (mp3/ogg/flac) need a codec library that is absent in
  this sandbox → ``NotImplementedError``, and the DataFrame operators
  quarantine undecodable rows instead of crashing (decoded=false), so the
  pipeline shape is production-real even where the codec is stubbed.

The audio fingerprint is the classic band-energy-delta sign scheme
(Haitsma-Kalker style): frame the signal, take per-frame band energies, and
emit one bit per (frame, band) for whether the band's energy delta exceeds
the previous frame's — robust to gain changes, cheap, and pure numpy.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "wav_encode",
    "wav_decode",
    "decode_audio",
    "synth_samples",
    "synth_audio",
    "audio_fingerprint64",
    "audio_features",
    "window_sample",
]


# --- real WAV codec ----------------------------------------------------------


def wav_encode(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 mono/stereo (n,) or (n, ch) → RIFF/WAVE PCM16 bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM16 (or PCM8) → (sample_rate, int16 array (n, ch))."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, end = 12, 8 + struct.unpack("<I", data[4:8])[0]
    sample_rate = channels = bits = None
    pcm = None
    while pos + 8 <= min(end, len(data)):
        tag = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        payload = data[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            codec, channels, sample_rate, _, _, bits = struct.unpack(
                "<HHIIHH", payload[:16]
            )
            if codec != 1:
                raise NotImplementedError(f"non-PCM WAV codec {codec}")
        elif tag == b"data":
            pcm = payload
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if pcm is None or sample_rate is None:
        raise ValueError("WAV missing fmt/data chunk")
    if bits == 16:
        arr = np.frombuffer(pcm, dtype="<i2")
    elif bits == 8:  # unsigned 8-bit → centered int16
        arr = (np.frombuffer(pcm, dtype=np.uint8).astype(np.int16) - 128) << 8
    else:
        raise NotImplementedError(f"{bits}-bit PCM")
    return sample_rate, arr.reshape(-1, channels)


def decode_audio(data: bytes, fmt: str) -> tuple[int, np.ndarray]:
    """(sample_rate, int16 (n, ch)). WAV is real; compressed formats need a
    codec library absent in this sandbox (operators quarantine the row)."""
    if fmt == "wav":
        return wav_decode(data)
    raise NotImplementedError(f"real {fmt} decode requires a codec library")


# --- deterministic synthetic audio -------------------------------------------


def synth_samples(audio_id: str, sample_rate: int = 8000,
                  n_samples: int = 8000) -> np.ndarray:
    """Deterministic int16 mono signal from the id: three id-seeded sinusoids
    + low-level noise. Stable across sessions/machines (seeded rng), with
    enough spectral structure for the feature/fingerprint kernels to be
    meaningfully exercised."""
    seed = zlib.crc32(audio_id.encode()) & 0xFFFFFFFF
    rng = np.random.default_rng(seed)
    t = np.arange(n_samples) / sample_rate
    sig = np.zeros(n_samples)
    for _ in range(3):
        f = rng.uniform(100.0, sample_rate / 2 * 0.8)
        sig += rng.uniform(0.2, 1.0) * np.sin(2 * np.pi * f * t + rng.uniform(0, 6.28))
    sig += rng.normal(0, 0.02, n_samples)
    sig /= max(np.abs(sig).max(), 1e-9)
    return (sig * 0.8 * 32767).astype(np.int16)


def synth_audio(audio_id: str, sample_rate: int = 8000,
                n_samples: int = 8000) -> bytes:
    """Deterministic REAL WAV bytes for tests/benchmarks (no external data)."""
    return wav_encode(synth_samples(audio_id, sample_rate, n_samples), sample_rate)


# --- DSP kernels (vectorized) -------------------------------------------------

_N_BANDS = 8
_FRAME = 1024


def _frame_band_energies(mono: np.ndarray, frame: int = _FRAME) -> np.ndarray:
    """(n_frames, _N_BANDS) spectral band energies — one rfft over the whole
    framed matrix, no per-frame Python loop."""
    n = (len(mono) // frame) * frame
    if n == 0:
        return np.zeros((0, _N_BANDS))
    frames = mono[:n].reshape(-1, frame).astype(np.float64)
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    bands = np.array_split(np.arange(1, spec.shape[1]), _N_BANDS)
    return np.stack([spec[:, idx].sum(axis=1) for idx in bands], axis=1)


def audio_fingerprint64(mono: np.ndarray) -> int:
    """64-bit Haitsma-Kalker-style fingerprint: sign of the band-energy
    double-delta over the first 9 frames × 8 bands (gain-invariant)."""
    e = _frame_band_energies(mono)
    if e.shape[0] < 2:
        return 0
    # energy delta across time and frequency: E[t,b] - E[t,b+1] - (E[t-1,b] - E[t-1,b+1])
    de = np.diff(e, axis=0)  # (frames-1, bands)
    bits = (de[:8] > 0).astype(np.uint64)  # first 8 transitions × 8 bands
    if bits.size < 64:
        bits = np.pad(bits, ((0, 8 - bits.shape[0]), (0, 0)))
    return int(np.bitwise_or.reduce(bits.flatten() << np.arange(64, dtype=np.uint64)))


def audio_features(audio: DataFrame, bytes_col: str = "bytes",
                   fmt_col: str = "fmt", id_col: str = "audio_id") -> DataFrame:
    """Per-row audio features in one Arrow pass: duration, RMS (dBFS),
    zero-crossing rate, spectral centroid (Hz), 64-bit fingerprint.
    Undecodable rows are quarantined (decoded=false), never crash the stage."""
    out_schema = (
        f"{id_col} string, decoded boolean, sample_rate int, duration_sec double, "
        "rms_db double, zero_cross_rate double, spectral_centroid double, "
        "fingerprint long"
    )

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    sr, pcm = decode_audio(bytes(getattr(r, bytes_col)),
                                           getattr(r, fmt_col))
                except (NotImplementedError, ValueError):
                    rows.append((getattr(r, id_col), False, 0, 0.0, 0.0, 0.0,
                                 0.0, 0))
                    continue
                mono = pcm.mean(axis=1) / 32768.0
                n = len(mono)
                rms = float(np.sqrt(np.mean(mono**2))) if n else 0.0
                rms_db = 20 * np.log10(max(rms, 1e-9))
                zcr = float(np.mean(np.abs(np.diff(np.sign(mono))) > 0)) if n > 1 else 0.0
                spec = np.abs(np.fft.rfft(mono)) ** 2
                freqs = np.fft.rfftfreq(n, 1.0 / sr)
                centroid = float((freqs * spec).sum() / max(spec.sum(), 1e-12))
                fp = audio_fingerprint64(mono * 32768.0)
                rows.append((getattr(r, id_col), True, int(sr), n / sr,
                             round(rms_db, 6), round(zcr, 6),
                             round(centroid, 6), np.int64(np.uint64(fp)).item()))
            yield pd.DataFrame(rows, columns=[
                id_col, "decoded", "sample_rate", "duration_sec", "rms_db",
                "zero_cross_rate", "spectral_centroid", "fingerprint",
            ])

    return audio.select(id_col, bytes_col, fmt_col).mapInPandas(
        work, schema=out_schema
    )


def window_sample(audio: DataFrame, window_ms: int = 250, every_k: int = 2,
                  bytes_col: str = "bytes", fmt_col: str = "fmt",
                  id_col: str = "audio_id") -> DataFrame:
    """Window fan-out (the audio twin of video frame_sample): decode, split
    into ``window_ms`` windows, keep every k-th, one output row per kept
    window with its RMS and fingerprint. Rows-in → window-rows-out via
    ``mapInPandas``; windows repartition downstream at corpus scale."""
    out_schema = (
        f"{id_col} string, window_idx int, start_sec double, rms_db double, "
        "fingerprint long"
    )

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    sr, pcm = decode_audio(bytes(getattr(r, bytes_col)),
                                           getattr(r, fmt_col))
                except (NotImplementedError, ValueError):
                    continue  # quarantine
                mono = pcm.mean(axis=1)
                win = max(int(sr * window_ms / 1000), 1)
                n_win = len(mono) // win
                for idx in range(0, n_win, every_k):
                    seg = mono[idx * win:(idx + 1) * win] / 32768.0
                    rms = float(np.sqrt(np.mean(seg**2))) if len(seg) else 0.0
                    fp = audio_fingerprint64(seg * 32768.0)
                    rows.append((getattr(r, id_col), idx, idx * win / sr,
                                 round(20 * np.log10(max(rms, 1e-9)), 6),
                                 np.int64(np.uint64(fp)).item()))
            yield pd.DataFrame(rows, columns=[
                id_col, "window_idx", "start_sec", "rms_db", "fingerprint",
            ])

    return audio.select(id_col, bytes_col, fmt_col).mapInPandas(
        work, schema=out_schema
    )
