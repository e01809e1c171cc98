"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as `binary` columns with a metadata struct
(`{modality, format, width/height | sample_rate | fps, n_bytes}`). The
decode/resize/feature kernels are STUBS in this container (no image/audio
libraries available): `DecodeStage(fake=True)` produces a deterministic fake
decode (seeded by a content hash) so the Ray-side plumbing — schema, actor
pool signature, batch sizing, output layout — is real and tested; with
`fake=False` they raise NotImplementedError where the real library call
(PIL/libav/soundfile) belongs.

Actor-pool stages with small batch sizes: large binary rows mean a batch ×
concurrency must fit the worker heap — callers should pass
``batch_size=32..256`` and ``concurrency`` sized to the node.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa

MEDIA_META_TYPE = pa.struct([
    ("modality", pa.string()),   # image | audio | video
    ("format", pa.string()),     # png/jpeg/wav/mp4/...
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("sample_rate", pa.int32()),
    ("fps", pa.float32()),
    ("n_bytes", pa.int64()),
])


def media_schema(extra_fields: Optional[list[pa.Field]] = None) -> pa.Schema:
    fields = [
        pa.field("media_id", pa.string()),
        pa.field("payload", pa.binary()),
        pa.field("meta", MEDIA_META_TYPE),
    ]
    return pa.schema(fields + (extra_fields or []))


def _fake_pixels(payload: bytes, h: int, w: int, c: int = 3) -> np.ndarray:
    """Deterministic pseudo-decode: pixels seeded by content hash."""
    seed = int.from_bytes(hashlib.md5(payload or b"").digest()[:8], "little")
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


class DecodeImageStage:
    """binary payload → fixed-size uint8 pixel tensor (flattened list col).

    Real implementation decodes with PIL/turbojpeg and resizes; the stub
    substitutes a deterministic fake so downstream stages are testable.
    """

    def __init__(self, out_h: int = 32, out_w: int = 32, fake: bool = True,
                 payload_col: str = "payload"):
        self.out_h, self.out_w, self.fake = out_h, out_w, fake
        self.payload_col = payload_col
        if not fake:
            raise NotImplementedError(
                "real image decode requires PIL/turbojpeg — not in this container; "
                "construct with fake=True for plumbing tests")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        pix = np.stack([
            _fake_pixels(p, self.out_h, self.out_w) for p in payloads
        ])
        flat = pix.reshape(len(payloads), -1)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(flat.reshape(-1), type=pa.uint8()), flat.shape[1])
        return batch.append_column("pixels", col)


class ImageFeatureStage:
    """pixel tensor → small feature vector (channel means/stds + histogram).
    Pure numpy — real either way."""

    def __init__(self, h: int = 32, w: int = 32):
        self.h, self.w = h, w

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat = np.stack(batch["pixels"].to_pandas().to_numpy()).astype(np.float32)
        pix = flat.reshape(len(batch), self.h, self.w, 3)
        means = pix.mean(axis=(1, 2))
        stds = pix.std(axis=(1, 2))
        feats = np.concatenate([means, stds], axis=1)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1), type=pa.float32()), feats.shape[1])
        return batch.append_column("img_features", col)


class AudioFrameStage:
    """binary audio → fixed number of frame energies. STUB decode (seeded by
    content hash); real impl reads PCM via soundfile/libav."""

    def __init__(self, n_frames: int = 16, fake: bool = True,
                 payload_col: str = "payload"):
        self.n_frames, self.fake, self.payload_col = n_frames, fake, payload_col
        if not fake:
            raise NotImplementedError("real audio decode requires soundfile/libav")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        rows = []
        for p in payloads:
            seed = int.from_bytes(hashlib.md5(p or b"").digest()[:8], "little")
            rng = np.random.Generator(np.random.PCG64(seed))
            rows.append(rng.random(self.n_frames, dtype=np.float32))
        feats = np.stack(rows)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1), type=pa.float32()), self.n_frames)
        return batch.append_column("frame_energy", col)


class VideoFrameSampleStage:
    """binary video → k sampled frame tensors. STUB decode; emits
    list<fixed_size_list<uint8>> of k frames per row."""

    def __init__(self, k_frames: int = 4, out_h: int = 16, out_w: int = 16,
                 fake: bool = True, payload_col: str = "payload"):
        self.k, self.h, self.w = k_frames, out_h, out_w
        self.payload_col = payload_col
        if not fake:
            raise NotImplementedError("real video decode requires libav/ffmpeg")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        per_frame = self.h * self.w * 3
        all_frames = []
        for p in payloads:
            for f in range(self.k):
                px = _fake_pixels((p or b"") + bytes([f]), self.h, self.w)
                all_frames.append(px.reshape(-1))
        flat = np.concatenate(all_frames) if all_frames else np.array([], dtype=np.uint8)
        inner = pa.FixedSizeListArray.from_arrays(
            pa.array(flat, type=pa.uint8()), per_frame)
        offsets = pa.array(np.arange(0, (len(payloads) + 1) * self.k, self.k,
                                     dtype=np.int32))
        frames = pa.ListArray.from_arrays(offsets, inner)
        return batch.append_column("frames", frames)


def synth_media_table(n: int, seed: int = 42, modality: str = "image") -> pa.Table:
    """Deterministic fake media table for plumbing tests (payload = random
    bytes; metadata populated)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    payloads = [rng.bytes(int(rng.integers(100, 1000))) for _ in range(n)]
    meta = [
        {"modality": modality, "format": "fake", "width": 64, "height": 64,
         "sample_rate": 0, "fps": 0.0, "n_bytes": len(p)}
        for p in payloads
    ]
    return pa.table({
        "media_id": pa.array([f"m{i:06d}" for i in range(n)]),
        "payload": pa.array(payloads, type=pa.binary()),
        "meta": pa.array(meta, type=MEDIA_META_TYPE),
    })
