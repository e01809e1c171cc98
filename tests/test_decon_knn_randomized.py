"""Randomized differential for decontamination and kNN.

Decontamination: planted benchmark overlap, all three membership tiers
(exact string set / 64-bit hashed / bloom) vs a brute-force Counter
oracle; bloom may only err toward MORE contamination flagged (one-sided
false positives). kNN: exact brute-force cosine vs a numpy oracle under
randomized block layouts; IVF recall sanity on planted near-neighbors."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

_VOCAB = np.array([f"tok{i}" for i in range(40)], dtype=object)


def _texts(rng, n, lo=6, hi=20):
    return [" ".join(rng.choice(_VOCAB, size=int(rng.integers(lo, hi))))
            for _ in range(n)]


def _grams(text, n):
    w = text.split()
    return [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]


@pytest.mark.parametrize("mode", ["exact", "hashed", "bloom"])
def test_decontaminate_randomized(ray_session, mode):
    from chronon_ray.functions.decontaminate import decontaminate

    rng = np.random.default_rng(77)
    nb, nd, n = 25, 80, 4
    bench_texts = _texts(rng, nb, 8, 16)
    doc_texts = _texts(rng, nd, 6, 18)
    # plant contamination: some docs embed a benchmark excerpt verbatim
    for i in range(0, nd, 7):
        src = bench_texts[int(rng.integers(0, nb))].split()
        j = int(rng.integers(0, max(1, len(src) - n)))
        excerpt = " ".join(src[j:j + n + 2])
        doc_texts[i] = doc_texts[i] + " " + excerpt

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(nd, dtype=np.int64)),
        "text": pa.array(doc_texts, type=pa.string()),
    }))
    bench = rd.from_arrow(pa.table({
        "text": pa.array(bench_texts, type=pa.string())}))
    out = decontaminate(docs, bench, "text", "doc_id", n=n,
                        max_frac=0.0, mode=mode).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)

    ref = set()
    for t in bench_texts:
        ref.update(_grams(t, n))
    for i in range(nd):
        gs = _grams(doc_texts[i], n)
        want_total = len(gs)
        want_bad = sum(1 for g in gs if g in ref)
        assert int(out["n_grams"].iloc[i]) == want_total, (mode, i)
        got_bad = int(out["n_contaminated"].iloc[i])
        if mode == "bloom":
            # one-sided: bloom can only ADD false hits, never miss one
            assert got_bad >= want_bad, (mode, i, got_bad, want_bad)
        else:
            assert got_bad == want_bad, (mode, i, got_bad, want_bad)
        if want_bad > 0:
            assert not out["keep"].iloc[i], (mode, i)


def _emb_frame(rng, n, dim):
    X = rng.normal(size=(n, dim)).astype(np.float32)
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [row for row in X],
    }), X


def _emb_ds(df, rng, max_blocks=5):
    order = rng.permutation(len(df))
    df = df.iloc[order].reset_index(drop=True)
    nb = int(rng.integers(1, max_blocks + 1))
    cuts = np.sort(rng.choice(np.arange(1, len(df)), size=nb - 1,
                              replace=False)) if nb > 1 else np.array([], int)
    ds = None
    for idx in np.split(np.arange(len(df)), cuts):
        sub = df.iloc[idx]
        t = pa.table({
            "vec_id": pa.array(sub["vec_id"].to_numpy()),
            "embedding": pa.array([v.tolist() for v in sub["embedding"]],
                                  type=pa.list_(pa.float32())),
        })
        d = rd.from_arrow(t)
        ds = d if ds is None else ds.union(d)
    return ds


@pytest.mark.parametrize("seed", [10, 48])
def test_brute_force_knn_randomized(ray_session, seed):
    from chronon_ray.functions.knn import brute_force_knn

    rng = np.random.default_rng(seed)
    n, dim, k, nq = 150, 16, 5, 8
    df, X = _emb_frame(rng, n, dim)
    Q = rng.normal(size=(nq, dim)).astype(np.float32)
    qids = np.arange(1000, 1000 + nq, dtype=np.int64)

    out = brute_force_knn(_emb_ds(df, rng), qids, Q, k=k).to_pandas()
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    S = Qn @ Xn.T
    for qi, qid in enumerate(qids):
        sub = out[out["query_id"] == qid].sort_values("rank")
        assert len(sub) == k, (seed, qid)
        scores = S[qi]
        # engine ids must achieve the same score multiset as the true
        # top-k (exact ties can swap ids; scores must match)
        want = np.sort(scores)[::-1][:k]
        got = np.sort(sub["score"].to_numpy())[::-1]
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-5,
                                   err_msg=str((seed, qid)))
        # and each returned neighbor's true score equals the reported one
        for _, r in sub.iterrows():
            np.testing.assert_allclose(
                float(r["score"]), float(scores[int(r["neighbor_id"])]),
                rtol=0, atol=1e-5)


def test_ivf_knn_planted_recall(ray_session):
    """IVF with planted exact duplicates: the duplicate is ALWAYS the
    top-1 under nprobe covering its own cluster."""
    from chronon_ray.functions.knn import build_ivf, ivf_knn

    rng = np.random.default_rng(5)
    n, dim = 200, 12
    df, X = _emb_frame(rng, n, dim)
    qidx = rng.choice(n, size=6, replace=False)
    Q = X[qidx].copy()  # queries ARE corpus points
    qids = np.arange(2000, 2006, dtype=np.int64)
    ds = _emb_ds(df, rng)
    cent, assigned = build_ivf(ds, n_clusters=8)
    out = ivf_knn(assigned, cent, qids, Q, k=3, nprobe=4).to_pandas()
    top1 = out[out["rank"] == 1].set_index("query_id")
    for qid, ci in zip(qids, qidx):
        assert int(top1.loc[qid, "neighbor_id"]) == int(ci), qid
        np.testing.assert_allclose(float(top1.loc[qid, "score"]), 1.0,
                                   atol=1e-5)
