"""Property-based tests (hypothesis) for the function-family invariants."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(n=st.integers(0, 2000), c=st.integers(1, 64), s_frac=st.floats(0.1, 1.0))
def test_chunk_coverage_properties(n, c, s_frac):
    """Every char is covered by >= 1 chunk; chunk starts advance by exactly
    `stride`; last chunk reaches the end of the doc."""
    import ray.data as rd

    from chronon_ray.functions.text import chunk_documents

    s = max(1, int(c * s_frac))
    text = "x" * n
    docs = rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": [text]}))
    out = chunk_documents(docs, chunk_chars=c, stride=s).to_pandas()
    if n == 0:
        assert len(out) == 0
        return
    out = out.sort_values("chunk_idx").reset_index(drop=True)
    assert out["start"].iloc[0] == 0
    assert (np.diff(out["start"].to_numpy()) == s).all()
    assert out["end"].iloc[-1] == n          # full coverage to the end
    # no gap between consecutive chunks (stride <= chunk)
    assert (out["start"].to_numpy()[1:] <= out["end"].to_numpy()[:-1]).all()
    # chunk strings match their offsets
    for _, r in out.iterrows():
        assert r["chunk"] == text[r["start"]:r["end"]]


@settings(max_examples=25, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_fnv_window_hash_matches_direct(data):
    """The prefix-scan rolling hash equals the direct polynomial per window
    (mod 2^64) on arbitrary codepoint streams."""
    from chronon_ray.functions.dedup import _FNV_B, _char_window_hashes

    text = data.decode("latin-1")
    L = 8
    hw = _char_window_hashes(pd.Series([text]), L)
    if len(text) < L:
        assert hw is None or len(hw[0]) == 0
        return
    H, _, starts, _, _, _ = hw
    codes = np.array([ord(ch) for ch in text], dtype=np.uint64)
    B = int(_FNV_B)
    for wi in range(min(len(H), 10)):
        st_ = int(starts[wi])
        direct = 0
        for j in range(L):
            direct = (direct * B + int(codes[st_ + j])) % (1 << 64)
        assert int(np.uint64(H[wi])) == direct


@settings(max_examples=15, deadline=None)
@given(st.integers(1, 60), st.integers(1, 60), st.integers(0, 4))
def test_png_roundtrip_property(h, w, f):
    """encode_png(filter f) → decode_png is the identity for any size."""
    from chronon_ray.functions.multimodal import decode_png, encode_png

    rng = np.random.Generator(np.random.PCG64(h * 1000 + w * 10 + f))
    pix = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(pix, filter_type=f)), pix)
