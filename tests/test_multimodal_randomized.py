"""Randomized multimodal differentials: decode stages over random sizes
(odd widths, tiny images, random PNG filters, 420-subsampled odd-dim JPEG)
vs per-row oracles, python-vs-native tier cross-checks, audio framing and
rawvideo sampling vs independent numpy oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from chronon_ray.functions.multimodal import (
    AudioFrameStage,
    DecodeImageStage,
    VideoFrameSampleStage,
    decode_png,
    encode_bmp,
    encode_png,
    encode_ppm,
    encode_rawvideo,
    encode_wav_pcm16,
    resize_nearest,
)


def _img_table(rng: np.random.Generator, n: int, formats) -> tuple:
    rows, pixes = [], []
    for i in range(n):
        h, w = int(rng.integers(5, 70)), int(rng.integers(5, 70))
        pix = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        fmt = formats[int(rng.integers(0, len(formats)))]
        enc = {"bmp": encode_bmp, "ppm": encode_ppm,
               "png": lambda x: encode_png(x, filter_type=int(
                   rng.integers(0, 5)))}[fmt]
        rows.append({"media_id": f"m{i:04d}", "payload": enc(pix),
                     "meta": {"modality": "image", "format": fmt,
                              "width": w, "height": h, "sample_rate": 0,
                              "n_frames": 0}})
        pixes.append(pix)
    tbl = pa.Table.from_pylist(rows)
    return tbl, pixes


def _sorted_pixels(ds, n_px: int) -> np.ndarray:
    df = ds.to_pandas().sort_values("media_id").reset_index(drop=True)
    return np.stack(df["pixels"].to_numpy()).reshape(len(df), n_px)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_decode_stage_random_sizes_vs_oracle(ray_session, seed):
    rng = np.random.default_rng(seed)
    tbl, pixes = _img_table(rng, 40, ("bmp", "ppm", "png"))
    out_h = int(rng.integers(8, 40))
    out_w = int(rng.integers(8, 40))
    bs = int(rng.integers(3, 17))
    got = rd.from_arrow(tbl).map_batches(
        DecodeImageStage,
        fn_constructor_kwargs={"fake": False, "out_h": out_h, "out_w": out_w},
        batch_format="pyarrow", batch_size=bs, concurrency=(1, 2))
    gpx = _sorted_pixels(got, out_h * out_w * 3)
    exp = np.stack([resize_nearest(p, out_h, out_w).reshape(-1)
                    for p in pixes])
    np.testing.assert_array_equal(gpx, exp)


@pytest.mark.parametrize("seed", [11, 12])
def test_native_vs_python_tiers_random(ray_session, seed):
    from chronon_ray.functions import native_decode

    if not native_decode.available():
        pytest.skip("native tier unavailable")
    rng = np.random.default_rng(seed)
    from chronon_ray.functions.jpeg import encode_jpeg_baseline

    # PNG: bit-exact across tiers, any filter / odd dims
    for _ in range(8):
        h, w = int(rng.integers(5, 90)), int(rng.integers(5, 90))
        pix = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        buf = encode_png(pix, filter_type=int(rng.integers(0, 5)))
        np.testing.assert_array_equal(native_decode.decode_png_native(buf),
                                      decode_png(buf))
    # JPEG: decoders legitimately differ by IDCT rounding — bounded delta,
    # including 420 subsampling with ODD dimensions
    from chronon_ray.functions.jpeg import decode_jpeg_baseline

    for _ in range(6):
        h, w = int(rng.integers(9, 64)) | 1, int(rng.integers(9, 64)) | 1
        pix = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        sub = "420" if rng.random() < 0.5 else "444"
        buf = encode_jpeg_baseline(pix, quality=int(rng.integers(60, 96)),
                                   subsample=sub)
        a = native_decode.decode_jpeg_native(buf).astype(np.int16)
        b = decode_jpeg_baseline(buf).astype(np.int16)
        assert a.shape == b.shape == (h, w, 3)
        # decoders legitimately differ: integer-islow vs float IDCT (worst
        # on saturated noise blocks) and, for 420, the chroma upsampling
        # algorithm. Pin a TIGHT mean delta and a loose max — a real bug
        # (stride slip, channel swap, plane offset) blows up the mean.
        d = np.abs(a - b)
        assert float(d.mean()) <= 2.0, (sub, d.mean())
        assert int(d.max()) <= 48, (sub, d.max())


@pytest.mark.parametrize("seed", [21, 22])
def test_audio_frames_vs_numpy_oracle(ray_session, seed):
    rng = np.random.default_rng(seed)
    n_frames = int(rng.integers(3, 24))
    rows, raw = [], []
    for i in range(30):
        ln = int(rng.integers(1, 5000))
        x = rng.integers(-32768, 32767, size=ln).astype(np.int16)
        rows.append({"media_id": f"a{i:04d}",
                     "payload": encode_wav_pcm16(x, 16000),
                     "meta": {"modality": "audio", "format": "wav",
                              "width": 0, "height": 0,
                              "sample_rate": 16000, "n_frames": 0}})
        raw.append(x)
    got = rd.from_arrow(pa.Table.from_pylist(rows)).map_batches(
        AudioFrameStage,
        fn_constructor_kwargs={"fake": False, "n_frames": n_frames},
        batch_format="pyarrow", batch_size=7, concurrency=(1, 2)) \
        .to_pandas().sort_values("media_id").reset_index(drop=True)
    for i, x in enumerate(raw):
        # independent oracle: decode_wav normalizes PCM16 to [-1, 1];
        # frame edges by integer division, RMS each
        xf = x.astype(np.float32) / 32768.0
        edges = (np.arange(n_frames + 1) * len(xf)) // n_frames
        exp = []
        for a, b in zip(edges[:-1], edges[1:]):
            seg = xf[a:b].astype(np.float64)
            exp.append(np.sqrt((seg ** 2).mean()) if len(seg) else 0.0)
        np.testing.assert_allclose(
            np.asarray(got["frame_energy"][i], dtype=np.float64),
            np.asarray(exp), rtol=1e-5)


@pytest.mark.parametrize("seed", [31, 32])
def test_video_sampling_vs_oracle(ray_session, seed):
    rng = np.random.default_rng(seed)
    k = int(rng.integers(2, 7))
    oh, ow = int(rng.integers(4, 20)), int(rng.integers(4, 20))
    rows, vids = [], []
    for i in range(20):
        nf = int(rng.integers(1, 12))
        h, w = int(rng.integers(4, 30)), int(rng.integers(4, 30))
        frames = rng.integers(0, 256, size=(nf, h, w, 3), dtype=np.uint8)
        rows.append({"media_id": f"v{i:04d}",
                     "payload": encode_rawvideo(frames),
                     "meta": {"modality": "video", "format": "rawvideo",
                              "width": w, "height": h, "sample_rate": 0,
                              "n_frames": nf}})
        vids.append(frames)
    got = rd.from_arrow(pa.Table.from_pylist(rows)).map_batches(
        VideoFrameSampleStage,
        fn_constructor_kwargs={"fake": False, "k_frames": k,
                               "out_h": oh, "out_w": ow},
        batch_format="pyarrow", batch_size=6, concurrency=(1, 2)) \
        .to_pandas().sort_values("media_id").reset_index(drop=True)
    for i, vid in enumerate(vids):
        n = len(vid)
        idx = np.minimum((np.arange(k) * n) // k, n - 1)
        exp = [resize_nearest(vid[j], oh, ow).reshape(-1) for j in idx]
        fr = got["frames"][i]
        assert len(fr) == k
        for a, b in zip(fr, exp):
            np.testing.assert_array_equal(np.asarray(a, dtype=np.uint8), b)
