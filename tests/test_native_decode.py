"""Native decode tier (compiled libjpeg/libpng shim) vs the pure-python
oracle decoders.  PNG must be BIT-EXACT (both are lossless decoders of the
same stream); JPEG is pinned to a small bounded error (decoders legitimately
differ by a few levels — IDCT rounding / fixed- vs float-point color
convert), with replication upsampling matched on both sides."""

import numpy as np
import pytest
import ray

from chronon_ray.functions import native_decode as nd
from chronon_ray.functions.jpeg import (decode_jpeg_baseline,
                                        encode_jpeg_baseline)
from chronon_ray.functions.multimodal import (DecodeImageStage, decode_png,
                                              encode_png, synth_media_table)

pytestmark = pytest.mark.skipif(
    not nd.available(), reason="native decode tier unavailable on this node")


def test_png_native_bit_exact_all_filters():
    rng = np.random.Generator(np.random.PCG64(11))
    for f in range(5):
        for h, w in ((1, 1), (3, 17), (40, 31)):
            pix = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            buf = encode_png(pix, filter_type=f)
            np.testing.assert_array_equal(nd.decode_png_native(buf),
                                          decode_png(buf))


def test_png_native_gray_and_rgba():
    import struct
    import zlib

    from chronon_ray.functions.multimodal import _PNG_SIG, _png_chunk

    rng = np.random.Generator(np.random.PCG64(12))
    # gray (colortype 0): replicated to RGB, same as the python tier
    g = rng.integers(0, 256, size=(9, 7), dtype=np.uint8)
    raw = b"".join(b"\x00" + g[r].tobytes() for r in range(9))
    buf = (_PNG_SIG
           + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 7, 9, 8, 0, 0, 0, 0))
           + _png_chunk(b"IDAT", zlib.compress(raw))
           + _png_chunk(b"IEND", b""))
    np.testing.assert_array_equal(nd.decode_png_native(buf), decode_png(buf))
    # RGBA (colortype 6): alpha DROPPED, never composited
    a = rng.integers(0, 256, size=(5, 6, 4), dtype=np.uint8)
    raw = b"".join(b"\x00" + a[r].tobytes() for r in range(5))
    buf = (_PNG_SIG
           + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 5, 8, 6, 0, 0, 0))
           + _png_chunk(b"IDAT", zlib.compress(raw))
           + _png_chunk(b"IEND", b""))
    np.testing.assert_array_equal(nd.decode_png_native(buf), a[:, :, :3])


def test_jpeg_native_parity_bounded():
    rng = np.random.Generator(np.random.PCG64(13))
    worst = 0
    for sub in ("444", "420"):
        for q in (75, 90):
            pix = rng.integers(0, 256, size=(33, 29, 3), dtype=np.uint8)
            buf = encode_jpeg_baseline(pix, quality=q, subsample=sub)
            a = nd.decode_jpeg_native(buf).astype(np.int16)
            b = decode_jpeg_baseline(buf).astype(np.int16)
            assert a.shape == b.shape
            d = np.abs(a - b)
            worst = max(worst, int(d.max()))
            # libjpeg clamps IDCT samples to 8-bit BEFORE color convert,
            # the python tier converts unclamped floats — isolated pixels
            # on saturated noise can differ by ~a dozen levels, so pin the
            # tail mass and RMS rather than a tight max.
            assert d.max() <= 24, (sub, q, int(d.max()))
            assert (d > 4).mean() < 0.005, (sub, q)
            assert np.sqrt((d.astype(np.float64) ** 2).mean()) < 2.0
    # observed ceiling is 11 (one pixel); 24 is slack for other builds
    assert worst <= 24


def test_jpeg_native_grayscale_and_restart():
    rng = np.random.Generator(np.random.PCG64(14))
    g = rng.integers(0, 256, size=(24, 16), dtype=np.uint8)
    pix = np.repeat(g[:, :, None], 3, axis=2)
    buf = encode_jpeg_baseline(pix, quality=90)  # gray-ish input, 444
    a = nd.decode_jpeg_native(buf).astype(np.int16)
    b = decode_jpeg_baseline(buf).astype(np.int16)
    assert np.abs(a - b).max() <= 8
    # restart markers (DRI/RSTn)
    pix = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
    buf = encode_jpeg_baseline(pix, quality=85, subsample="420",
                               restart_interval=2)
    a = nd.decode_jpeg_native(buf).astype(np.int16)
    b = decode_jpeg_baseline(buf).astype(np.int16)
    assert np.abs(a - b).max() <= 8


def test_jpeg_native_true_grayscale():
    """A REAL 1-component grayscale JPEG (not gray-valued RGB): exercises
    libjpeg's JCS_GRAYSCALE→JCS_RGB expansion and the output_components
    guard against the python tier's Y-stacking."""
    rng = np.random.Generator(np.random.PCG64(15))
    for h, w in ((8, 8), (25, 17)):
        g = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        buf = encode_jpeg_baseline(g, quality=90)  # 1-component SOF0
        a = nd.decode_jpeg_native(buf).astype(np.int16)
        b = decode_jpeg_baseline(buf).astype(np.int16)
        assert a.shape == b.shape == (h, w, 3)
        # gray→RGB replicates the Y plane on both sides; only IDCT
        # rounding differs (no chroma, no color convert)
        assert np.abs(a - b).max() <= 2
        # channel replication must hold exactly on the native side too
        np.testing.assert_array_equal(a[:, :, 0], a[:, :, 1])
        np.testing.assert_array_equal(a[:, :, 0], a[:, :, 2])


def test_jpeg_native_fill_bytes_before_marker():
    """0xFF fill bytes before a marker are legal JPEG; the python-side dims
    walk must skip them like libjpeg does."""
    rng = np.random.Generator(np.random.PCG64(21))
    pix = rng.integers(0, 256, size=(16, 12, 3), dtype=np.uint8)
    buf = encode_jpeg_baseline(pix, quality=90)
    i = buf.find(b"\xff\xc0")
    padded = buf[:i] + b"\xff\xff\xff" + buf[i:]
    assert nd._jpeg_dims(padded) == (16, 12)
    assert nd.decode_jpeg_native(padded).shape == (16, 12, 3)


def test_native_rejects_garbage():
    with pytest.raises(ValueError):
        nd.decode_jpeg_native(b"\xff\xd8 not a real jpeg")
    with pytest.raises(ValueError):
        nd.decode_png_native(b"\x89PNG\r\n\x1a\n garbage")


def test_native_rejects_truncated_jpeg():
    """libjpeg's default recovery pads truncated streams with garbage
    scanlines and only WARNS; the shim must turn that warning into a
    loud failure (silent corruption guard), matching the python tier."""
    rng = np.random.Generator(np.random.PCG64(16))
    pix = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    buf = encode_jpeg_baseline(pix, quality=90, subsample="420")
    for frac in (0.5, 0.9):
        cut = buf[:int(len(buf) * frac)]
        with pytest.raises(Exception):
            decode_jpeg_baseline(cut)  # python tier fails loudly
        with pytest.raises(ValueError):
            nd.decode_jpeg_native(cut)  # native must too (rc=4 path)


def test_stage_tiers_agree_on_fixture_corpus(ray_session):
    """DecodeImageStage(decoder='native') vs 'python' over the mixed
    bmp/ppm/png/jpeg fixture: identical except a bounded JPEG delta."""
    tbl = synth_media_table(48)
    ds = ray.data.from_arrow(tbl)
    kw = dict(out_h=16, out_w=16, fake=False)
    nat = ds.map_batches(DecodeImageStage(decoder="native", **kw),
                         batch_format="pyarrow", batch_size=16).to_pandas()
    pyt = ds.map_batches(DecodeImageStage(decoder="python", **kw),
                         batch_format="pyarrow", batch_size=16).to_pandas()
    fmts = [m["format"] for m in tbl["meta"].to_pylist()]
    for i, fmt in enumerate(fmts):
        a = np.asarray(nat["pixels"].iloc[i], dtype=np.int16)
        b = np.asarray(pyt["pixels"].iloc[i], dtype=np.int16)
        if fmt == "jpeg":
            assert np.abs(a - b).max() <= 8, (i, fmt)
        else:
            np.testing.assert_array_equal(a, b, err_msg=f"{i} {fmt}")


# ----------------------------------------------------- progressive (SOF2)


def test_progressive_jpeg_native_decode():
    """The native tier decodes SOF2 streams (libjpeg handles progressive
    natively); output is bit-stable and close to the source pixels."""
    x = np.linspace(0, 255, 48)
    base = np.stack(np.meshgrid(x, x), -1).sum(-1) / 2
    pix = np.stack([base, base[::-1], base.T], -1).astype(np.uint8)
    buf = nd.encode_jpeg_progressive_native(pix, quality=95)
    assert b"\xff\xc2" in buf  # SOF2 marker really present
    got = nd.decode_jpeg_native(buf)
    assert got.shape == pix.shape
    assert np.abs(got.astype(np.int16) - pix.astype(np.int16)).max() <= 16
    np.testing.assert_array_equal(got, nd.decode_jpeg_native(buf))


def test_progressive_python_tier_refuses_loudly():
    rng = np.random.Generator(np.random.PCG64(21))
    pix = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    buf = nd.encode_jpeg_progressive_native(pix)
    with pytest.raises(NotImplementedError, match="FFC2"):
        decode_jpeg_baseline(buf)


def test_progressive_vs_baseline_same_pixels_bounded():
    """Progressive and baseline encodings of the SAME pixels decode to
    nearly identical output (same quant tables at same quality)."""
    x = np.linspace(0, 255, 32)
    base = np.stack(np.meshgrid(x, x), -1).sum(-1) / 2
    pix = np.stack([base, base.T, base[::-1]], -1).astype(np.uint8)
    prog = nd.decode_jpeg_native(nd.encode_jpeg_progressive_native(pix, 92))
    seq = nd.decode_jpeg_native(encode_jpeg_baseline(pix, quality=92,
                                                     subsample="444"))
    assert np.abs(prog.astype(np.int16) - seq.astype(np.int16)).max() <= 24


def test_progressive_truncation_fails_loudly():
    rng = np.random.Generator(np.random.PCG64(22))
    pix = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    buf = nd.encode_jpeg_progressive_native(pix)
    with pytest.raises(ValueError):
        nd.decode_jpeg_native(buf[:len(buf) * 2 // 3])


def test_stage_decodes_progressive_via_native(ray_session):
    """DecodeImageStage(decoder='native') handles a jpeg_prog fixture
    row; the python-tier stage refuses the same row."""
    t = synth_media_table(8, formats=("jpeg_prog",), side=20)
    stage = DecodeImageStage(out_h=8, out_w=8, fake=False, decoder="native")
    out = stage(t)
    assert out["pixels"].combine_chunks().flatten().to_numpy(
        zero_copy_only=False).size == 8 * 8 * 8 * 3
    py_stage = DecodeImageStage(out_h=8, out_w=8, fake=False,
                                decoder="python")
    with pytest.raises(NotImplementedError):
        py_stage(t)


def test_python_tier_size_guardrail_warns_once():
    """The oracle tier warns (once) after the byte threshold, pointing at
    decoder='auto'."""
    t = synth_media_table(6, formats=("png",), side=32)
    stage = DecodeImageStage(out_h=8, out_w=8, decoder="python",
                             py_tier_warn_bytes=64)
    with pytest.warns(RuntimeWarning, match="decoder='auto'"):
        stage(t)
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("error")  # a second batch must NOT warn again
        stage(t)
