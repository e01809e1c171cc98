"""Randomized invariance for the sampling / export family.

Hash-rank sampling is deterministic BY CONSTRUCTION — these tests pin
that construction against the two things that can silently break it:
input block layout (a layout-dependent result poisons resumable runs)
and the SQL-oracle conventions (Bernoulli threshold, budget running-sum,
shard/pos assignment)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from chronon_ray.functions.sampling import (
    budget_sample,
    hash_sample,
    rank_hash,
    shuffle_export,
    stratified_sample,
)


def _gen(rng, n):
    lang = np.array(["en", "zh", "de"], dtype=object)[
        rng.integers(0, 3, size=n)]
    lang[rng.random(n) < 0.1] = None
    return pd.DataFrame({
        "doc_id": rng.permutation(np.arange(10_000, 10_000 + n))
        .astype(np.int64),
        "lang": lang,
        "n_tokens": rng.integers(1, 50, size=n).astype(np.int64),
    })


def _to_ds(df, rng, max_blocks=5):
    order = rng.permutation(len(df))
    df = df.iloc[order].reset_index(drop=True)
    nb = int(rng.integers(1, max_blocks + 1))
    cuts = np.sort(rng.choice(np.arange(1, len(df)), size=nb - 1,
                              replace=False)) if nb > 1 else np.array([], int)
    ds = None
    for idx in np.split(np.arange(len(df)), cuts):
        sub = df.iloc[idx]
        t = pa.table({
            "doc_id": pa.array(sub["doc_id"].to_numpy()),
            "lang": pa.array(sub["lang"].tolist(), type=pa.string()),
            "n_tokens": pa.array(sub["n_tokens"].to_numpy()),
        })
        d = rd.from_arrow(t)
        ds = d if ds is None else ds.union(d)
    return ds


@pytest.mark.parametrize("seed", [4, 37])
def test_hash_sample_layout_invariant_and_oracle(ray_session, seed):
    rng = np.random.default_rng(seed)
    df = _gen(rng, 400)
    frac = 0.3
    got = []
    for _ in range(2):
        out = hash_sample(_to_ds(df, rng), "doc_id", frac,
                          seed=7).to_pandas()
        got.append(set(out["doc_id"].tolist()))
    assert got[0] == got[1], seed
    # first-principles: keep iff rank_hash(id) < frac * 2^32
    h = rank_hash(df["doc_id"].to_numpy(), 7)
    want = set(df["doc_id"].to_numpy()[h < np.uint64(int(frac * 2**32))]
               .tolist())
    assert got[0] == want, seed


@pytest.mark.parametrize("seed", [12])
def test_stratified_sample_null_group_and_invariance(ray_session, seed):
    rng = np.random.default_rng(seed)
    df = _gen(rng, 400)
    kw = dict(fractions={"en": 0.5, "zh": 0.1}, default_fraction=0.25,
              seed=3)
    got = []
    for _ in range(2):
        out = stratified_sample(_to_ds(df, rng), "doc_id", "lang",
                                **kw).to_pandas()
        got.append(set(out["doc_id"].tolist()))
    assert got[0] == got[1], seed
    h = rank_hash(df["doc_id"].to_numpy(), 3)
    thr = {"en": 0.5, "zh": 0.1}
    want = set()
    for did, lang, hv in zip(df["doc_id"], df["lang"], h):
        f = thr.get(lang, 0.25)  # null lang draws the default
        if hv < np.uint64(int(f * 2**32)):
            want.add(int(did))
    assert got[0] == want, (seed, len(got[0] ^ want))
    # the null stratum must actually be represented (not dropped)
    kept_null = df[df["lang"].isna() & df["doc_id"].isin(got[0])]
    assert len(kept_null) > 0, seed


@pytest.mark.parametrize("seed", [25])
def test_budget_sample_running_sum_oracle(ray_session, seed):
    rng = np.random.default_rng(seed)
    df = _gen(rng, 300)
    budgets = {"en": 500, "zh": 120}
    got = []
    for _ in range(2):
        out = budget_sample(_to_ds(df, rng), "doc_id", "lang", "n_tokens",
                            budgets=budgets, default_budget=60,
                            seed=5).to_pandas()
        got.append(set(out["doc_id"].tolist()))
    assert got[0] == got[1], seed
    # oracle: per group in (rank_hash, id) order keep while the EXCLUSIVE
    # running weight is under budget
    h = rank_hash(df["doc_id"].to_numpy(), 5)
    o = df.assign(_h=h.astype(np.int64))
    want = set()
    for g, sub in o.groupby("lang", sort=False, dropna=False):
        b = budgets.get(g, 60) if isinstance(g, str) else 60
        sub = sub.sort_values(["_h", "doc_id"])
        cum = np.concatenate([[0],
                              np.cumsum(sub["n_tokens"].to_numpy())[:-1]])
        want.update(sub["doc_id"].to_numpy()[cum < b].tolist())
    assert got[0] == want, (seed, len(got[0] ^ want))


@pytest.mark.parametrize("seed", [18])
def test_shuffle_export_layout_invariant(ray_session, seed):
    rng = np.random.default_rng(seed)
    df = _gen(rng, 300)
    frames = []
    for _ in range(2):
        out = shuffle_export(_to_ds(df, rng), "doc_id", n_shards=4,
                             seed=9).to_pandas()
        frames.append(out.sort_values("doc_id").reset_index(drop=True)
                      [["doc_id", "shard", "pos"]])
    pd.testing.assert_frame_equal(frames[0], frames[1])
    out = frames[0]
    # shards partition the id space; positions dense 0..n_i-1 per shard
    h = rank_hash(df["doc_id"].to_numpy(), 9)
    want_shard = dict(zip(df["doc_id"].tolist(),
                          (h % np.uint64(4)).astype(int).tolist()))
    assert all(want_shard[d] == s
               for d, s in zip(out["doc_id"], out["shard"])), seed
    for s, sub in out.groupby("shard"):
        assert sorted(sub["pos"].tolist()) == list(range(len(sub))), seed


@pytest.mark.parametrize("seed", [39])
def test_budget_sample_int_group_with_nulls(ray_session, seed):
    """Integer group column with nulls: null-bearing blocks promote the
    group to float in pandas — plan keys, boundary keys and the exact-scan
    lookup must all canonicalize ('5', never '5.0') or one group splits
    into two boundary scans and overshoots its budget."""
    rng = np.random.default_rng(seed)
    n = 300
    grp = rng.integers(0, 3, size=n).astype(object)
    grp[rng.random(n) < 0.15] = None
    df = pd.DataFrame({
        "doc_id": rng.permutation(np.arange(n)).astype(np.int64),
        "g": grp,
        "n_tokens": rng.integers(1, 40, size=n).astype(np.int64),
    })

    def to_ds(d, r):
        order = r.permutation(len(d))
        d = d.iloc[order].reset_index(drop=True)
        cuts = np.sort(r.choice(np.arange(1, len(d)), size=3,
                                replace=False))
        ds = None
        for idx in np.split(np.arange(len(d)), cuts):
            sub = d.iloc[idx]
            t = pa.table({
                "doc_id": pa.array(sub["doc_id"].to_numpy()),
                "g": pa.array(sub["g"].tolist(), type=pa.int64()),
                "n_tokens": pa.array(sub["n_tokens"].to_numpy()),
            })
            x = rd.from_arrow(t)
            ds = x if ds is None else ds.union(x)
        return ds

    budgets = {0: 300, 1: 150, 2: 80}
    got = []
    for _ in range(2):
        out = budget_sample(to_ds(df, rng), "doc_id", "g", "n_tokens",
                            budgets=budgets, default_budget=50,
                            seed=6).to_pandas()
        got.append(set(out["doc_id"].tolist()))
    assert got[0] == got[1], seed
    h = rank_hash(df["doc_id"].to_numpy(), 6)
    o = df.assign(_h=h.astype(np.int64))
    want = set()
    for g, sub in o.groupby("g", sort=False, dropna=False):
        b = budgets.get(g, 50) if g is not None and g == g else 50
        sub = sub.sort_values(["_h", "doc_id"])
        cum = np.concatenate([[0],
                              np.cumsum(sub["n_tokens"].to_numpy())[:-1]])
        want.update(sub["doc_id"].to_numpy()[cum < b].tolist())
    assert got[0] == want, (seed, len(got[0] ^ want))
