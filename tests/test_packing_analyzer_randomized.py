"""Randomized differentials for sequence packing and the table profiler.

pack_sequences is compared against a SERIAL single-process scan (the
definitionally correct concat-and-chunk layout); profile_table against a
pandas recompute. Random sparse ids, empty/None docs, random seq_len and
bucket counts, random block layouts, all-null columns.
"""

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

_WORDS = ["alpha", "beta", "g4mm4", "Z", "42", "the"]


def _rand_docs(rng, n=200):
    ids = np.sort(rng.choice(np.arange(0, n * 7), size=n, replace=False))
    texts = []
    for _ in range(n):
        r = rng.random()
        if r < 0.06:
            texts.append(None)
        elif r < 0.12:
            texts.append("")
        elif r < 0.16:
            texts.append("!!! ...")  # zero ASCII words
        else:
            texts.append(" ".join(
                str(_WORDS[rng.integers(0, len(_WORDS))])
                for _ in range(int(rng.integers(1, 30)))))
    return pd.DataFrame({"doc_id": ids.astype(np.int64), "text": texts})


def _to_ds(df, rng, n_blocks=5):
    t = pa.table({"doc_id": pa.array(df["doc_id"].to_numpy()),
                  "text": pa.array(df["text"].tolist(), type=pa.string())})
    # shuffle row order too — packing must be id-ordered, not arrival-ordered
    perm = rng.permutation(t.num_rows)
    t = t.take(pa.array(perm))
    cuts = np.sort(rng.choice(np.arange(1, t.num_rows),
                              size=n_blocks - 1, replace=False))
    ds = None
    for idx in np.split(np.arange(t.num_rows), cuts):
        x = rd.from_arrow(t.take(pa.array(idx)))
        ds = x if ds is None else ds.union(x)
    return ds


@pytest.mark.parametrize("seed", [401, 402, 403])
def test_pack_sequences_vs_serial_scan(ray_session, seed):
    from chronon_ray.functions.packing import pack_sequences

    rng = np.random.default_rng(seed)
    df = _rand_docs(rng)
    L = int(rng.integers(8, 100))
    n_buckets = int(rng.integers(1, 7))
    out = pack_sequences(_to_ds(df, rng), "text", "doc_id", seq_len=L,
                         n_buckets=n_buckets).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    wre = re.compile(r"[a-z0-9]+")
    o = df.sort_values("doc_id").reset_index(drop=True)
    n_tok = np.array([len(wre.findall((t or "").lower()))
                      for t in o["text"]], dtype=np.int64)
    off = np.concatenate([[0], np.cumsum(n_tok)[:-1]])
    end = off + np.maximum(n_tok, 1) - 1
    exp = pd.DataFrame({
        "doc_id": o["doc_id"].to_numpy(),
        "n_tok": n_tok,
        "tok_offset": off,
        "seq_id": off // L,
        "seq_pos": off % L,
        "n_seqs": end // L - off // L + 1,
    })
    assert len(out) == len(exp), (seed, len(out), len(exp))
    for c in exp.columns:
        np.testing.assert_array_equal(out[c].to_numpy(), exp[c].to_numpy(),
                                      err_msg=f"{seed}:{c}")


@pytest.mark.parametrize("seed", [411, 412])
def test_profile_table_vs_pandas(ray_session, seed):
    from chronon_ray.analyzer import profile_table

    rng = np.random.default_rng(seed)
    n = 400
    i64 = rng.integers(-1000, 1000, size=n).astype(object)
    i64[rng.random(n) < 0.1] = None
    f64 = rng.normal(0, 100, size=n).round(3).astype(object)
    f64[rng.random(n) < 0.1] = None
    s = rng.choice(["a", "bb", "ccc"], size=n).astype(object)
    s[rng.random(n) < 0.1] = None
    ts_ms = (np.int64(1_700_000_000_000)
             + rng.integers(0, 10**9, size=n)).astype("datetime64[ms]")
    t = pa.table({
        "i": pa.array(i64.tolist(), type=pa.int64()),
        "f": pa.array(f64.tolist(), type=pa.float64()),
        "s": pa.array(s.tolist(), type=pa.string()),
        "ts": pa.array(ts_ms),
        "allnull": pa.nulls(n, type=pa.float64()),
        "lst": pa.array([[float(x)] for x in range(n)],
                        type=pa.list_(pa.float64())),
    })
    cuts = np.sort(rng.choice(np.arange(1, n), size=4, replace=False))
    ds = None
    for idx in np.split(np.arange(n), cuts):
        x = rd.from_arrow(t.take(pa.array(idx)))
        ds = x if ds is None else ds.union(x)

    out = profile_table(ds).set_index("column")
    pdf = t.to_pandas()
    assert (out["n_rows"] == n).all()
    for c in ["i", "f", "s", "allnull"]:
        assert out.loc[c, "n_nulls"] == int(pdf[c].isna().sum()), (seed, c)
    assert out.loc["ts", "n_nulls"] == 0
    assert out.loc["lst", "n_nulls"] == 0
    ivals = pdf["i"].dropna().astype(float)
    fvals = pdf["f"].dropna().astype(float)
    assert out.loc["i", "min_val"] == ivals.min()
    assert out.loc["i", "max_val"] == ivals.max()
    np.testing.assert_allclose(out.loc["f", "min_val"], fvals.min())
    np.testing.assert_allclose(out.loc["f", "max_val"], fvals.max())
    # timestamps profile as epoch seconds
    ts_s = pdf["ts"].astype("datetime64[ns]").astype("int64") / 1e9
    np.testing.assert_allclose(out.loc["ts", "min_val"], ts_s.min())
    np.testing.assert_allclose(out.loc["ts", "max_val"], ts_s.max())
    # non-numeric and all-null: NaN min/max
    for c in ["s", "allnull", "lst"]:
        assert np.isnan(out.loc[c, "min_val"]), (seed, c)
        assert np.isnan(out.loc[c, "max_val"]), (seed, c)
