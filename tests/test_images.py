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


def test_resize_bilinear_identity_and_shape():
    from httrack2warc_spark.functions.images import resize_bilinear, synth_pixels

    px = synth_pixels("img-1", 32, 24)
    same = resize_bilinear(px, 24, 32)
    assert (same == px).all()
    small = resize_bilinear(px, 12, 16)
    assert small.shape == (12, 16, 3)
    # downscale of a smooth gradient stays within the original value range
    assert small.min() >= px.min() and small.max() <= px.max()
    # deterministic
    assert (resize_bilinear(px, 12, 16) == small).all()


def test_resize_images_spark(spark):
    from httrack2warc_spark.frontier.synth import generate_images
    from httrack2warc_spark.functions.images import (
        decode_image,
        resize_images,
    )
    from pyspark.sql import functions as F

    imgs = generate_images(spark, 16, w=16, h=16)
    out = resize_images(imgs, 8, 8)
    rows = out.collect()
    assert len(rows) == 16
    ok = [r for r in rows if r.resized_ok]
    assert ok, "at least the png/qimg rows must resize"
    for r in ok:
        assert (r.w, r.h) == (8, 8)
        assert decode_image(bytes(r.bytes), r.fmt).shape == (8, 8, 3)


def test_image_features_spark(spark):
    from httrack2warc_spark.frontier.synth import generate_images
    from httrack2warc_spark.functions.images import image_features

    imgs = generate_images(spark, 16, w=16, h=16)
    feats = {r.image_id: r for r in image_features(imgs).collect()}
    assert len(feats) == 16
    decoded = [f for f in feats.values() if f.decoded]
    assert decoded
    for f in decoded:
        assert 0 <= f.mean_r <= 255 and 0 <= f.std_lum <= 128
        assert abs(sum(f.lum_hist) - 1.0) < 1e-9 and len(f.lum_hist) == 8


def test_frame_sample_spark(spark):
    from httrack2warc_spark.functions.images import (
        frame_sample,
        phash64,
        png_decode,
        synth_pixels,
        synth_video,
    )

    vids = spark.createDataFrame(
        [(f"vid-{i}", synth_video(f"vid-{i}", 8, 8, 10)) for i in range(3)],
        "video_id string, bytes binary",
    )
    rows = frame_sample(vids, every_k=4).collect()
    # 10 frames sampled every 4 => indices 0,4,8 per video
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r.video_id, []).append(r.frame_idx)
    assert all(sorted(v) == [0, 4, 8] for v in by_vid.values())
    r0 = next(r for r in rows if r.video_id == "vid-1" and r.frame_idx == 4)
    ref = synth_pixels("vid-1#f4", 8, 8)
    assert (png_decode(bytes(r0.png)) == ref).all()
    assert r0.phash == phash64(ref)


def test_pil_real_jpeg_decode():
    """Skip-unless-PIL: when a real codec library is present, decode_image
    must route real JPEG bytes through it (the HAVE_PIL gate) and reproduce
    the pixels within lossy tolerance."""
    import pytest

    from httrack2warc_spark.functions.images import HAVE_PIL, decode_image, psnr

    if not HAVE_PIL:
        pytest.skip("PIL not installed in this sandbox")
    import io

    from PIL import Image

    pixels = synth_pixels("pil-test", 32, 32)
    buf = io.BytesIO()
    Image.fromarray(pixels).save(buf, format="JPEG", quality=95)
    out = decode_image(buf.getvalue(), "jpeg")
    assert out.shape == pixels.shape
    assert psnr(pixels, out) >= 30.0


def test_patchify_images_grid_and_crop(spark):
    from httrack2warc_spark.functions.images import patchify_images, png_encode

    # 16×16 with four constant 8×8 quadrants → exact patch means
    px = np.zeros((16, 16, 3), dtype=np.uint8)
    px[:8, :8] = 10
    px[:8, 8:] = 20
    px[8:, :8] = 30
    px[8:, 8:] = 40
    # 16×24: grid 2×3 exactly (no crop); 16×20 with patch 8 → gw=2, crop
    # offset (20-16)//2 = 2, so columns 2..17 of a horizontal ramp
    ramp = np.tile(
        np.arange(20, dtype=np.uint8).reshape(1, 20, 1), (16, 1, 3)
    )
    df = spark.createDataFrame(
        [("quad", bytearray(png_encode(px)), "png"),
         ("ramp", bytearray(png_encode(ramp)), "png"),
         ("bad", bytearray(b"\x00\x01"), "jpeg")],
        "image_id string, bytes binary, fmt string",
    )
    out = patchify_images(df, patch=8)
    rows = {(r.image_id, r.patch_row, r.patch_col): r for r in out.collect()}
    assert rows[("quad", 0, 0)].p_mean == 10.0
    assert rows[("quad", 0, 1)].p_mean == 20.0
    assert rows[("quad", 1, 0)].p_mean == 30.0
    assert rows[("quad", 1, 1)].p_mean == 40.0
    assert rows[("quad", 0, 0)].p_std == 0.0
    # ramp: center crop keeps columns 2..17 → patch (.,0) covers 2..9
    assert rows[("ramp", 0, 0)].p_mean == float(np.arange(2, 10).mean())
    assert rows[("ramp", 1, 1)].p_mean == float(np.arange(10, 18).mean())
    assert ("ramp", 0, 2) not in rows          # gw = 20//8 = 2
    # quarantine row for the undecodable payload
    bad = rows[("bad", -1, -1)]
    assert bad.decoded is False and bad.p_mean is None
    assert sum(1 for k in rows if k[0] == "quad") == 4
