"""Image payload path: pure-numpy PNG roundtrip, fake lossy codec PSNR≥40dB,
pHash stability, and the Spark-side per-row invariant (BASELINE.json:15)."""

import numpy as np
from pyspark.sql import functions as F

from httrack2warc_spark.functions.images import (
    phash64,
    png_decode,
    png_encode,
    psnr,
    qimg_decode,
    qimg_encode,
    synth_pixels,
    with_decode_check,
)
from httrack2warc_spark.frontier.synth import generate_images


def test_png_roundtrip_exact():
    px = synth_pixels("img-42", 40, 24)
    assert np.array_equal(png_decode(png_encode(px)), px)


def test_png_decoder_handles_filters():
    """Our decoder must accept filter types beyond 0 (real-world PNGs)."""
    import struct
    import zlib

    px = synth_pixels("img-7", 8, 8)
    h, w, _ = px.shape
    # hand-build a PNG using filter 2 (up) on every row
    raw = bytearray()
    prev = np.zeros(w * 3, dtype=np.uint8)
    for y in range(h):
        row = px[y].reshape(-1)
        raw.append(2)
        raw += ((row.astype(np.int32) - prev) & 0xFF).astype(np.uint8).tobytes()
        prev = row
    from httrack2warc_spark.functions.images import _PNG_SIG, _chunk

    data = (
        _PNG_SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(png_decode(data), px)


def test_lossy_codec_psnr_gate():
    px = synth_pixels("img-1", 32, 32)
    dec = qimg_decode(qimg_encode(px))
    assert psnr(px, dec) >= 40.0  # BASELINE.json lossy gate
    # deterministic: re-encode bit-identical
    assert qimg_encode(px) == qimg_encode(synth_pixels("img-1", 32, 32))


def test_phash_properties():
    a = synth_pixels("img-5", 32, 32)
    b = synth_pixels("img-777", 32, 32)
    assert phash64(a) == phash64(a.copy())
    # lossy roundtrip keeps the hash close (usually identical)
    deg = qimg_decode(qimg_encode(a))
    assert bin(phash64(a) ^ phash64(deg)).count("1") <= 6
    assert phash64(a) != phash64(b)


def test_generate_images_invariant(spark):
    imgs = generate_images(spark, 32, w=16, h=16)
    checked = with_decode_check(imgs)
    rows = checked.collect()
    assert len(rows) == 32
    assert all(r.decoded_ok for r in rows)
    assert all(r.caption_ok for r in rows)
    assert all(r.phash_ok for r in rows)
    lossy = [r for r in rows if r.fmt == "jpeg"]
    assert lossy and all(r.psnr_db >= 40.0 for r in lossy)
