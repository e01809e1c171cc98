"""Randomized differential for the curation / training-export composites.

curate_documents is compared against a pure-python per-doc oracle (token
gate, per-occurrence n-gram contamination fraction, rank-hash sampling,
min-id canonical election incl. the None-text group); training_export
against the composed oracle (curate keep-set → serial concat-and-chunk
packing → seq-hash shards). Random params, planted duplicates and
contaminated docs, random block layouts.
"""

import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from chronon_ray.functions.sampling import _TWO32, rank_hash

_WORD_RE = re.compile(r"[a-z0-9]+")
_BENCH = [
    "the quick brown fox jumps over the lazy dog tonight",
    "pack my box with five dozen liquor jugs right now",
    "how vexingly quick daft zebras jump over fences",
]


def _rand_docs(rng, n=150):
    texts = []
    for i in range(n):
        r = rng.random()
        if r < 0.05:
            texts.append(None)
        elif r < 0.10:
            texts.append("")
        elif r < 0.25:  # contaminated: splice a benchmark span
            b = _BENCH[rng.integers(0, len(_BENCH))].split()
            extra = [f"w{rng.integers(0, 20)}"
                     for _ in range(int(rng.integers(0, 10)))]
            texts.append(" ".join(extra + b + extra))
        else:
            texts.append(" ".join(f"w{rng.integers(0, 30)}"
                                  for _ in range(int(rng.integers(1, 40)))))
    # planted exact duplicates (dedup election)
    for _ in range(15):
        a, b = rng.integers(0, n, size=2)
        texts[a] = texts[b]
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})


def _to_ds(df, rng, n_blocks=4):
    t = pa.table({"doc_id": pa.array(df["doc_id"].to_numpy()),
                  "text": pa.array(df["text"].tolist(), type=pa.string())})
    perm = rng.permutation(t.num_rows)
    t = t.take(pa.array(perm))
    cuts = np.sort(rng.choice(np.arange(1, t.num_rows), size=n_blocks - 1,
                              replace=False))
    ds = None
    for idx in np.split(np.arange(t.num_rows), cuts):
        x = rd.from_arrow(t.take(pa.array(idx)))
        ds = x if ds is None else ds.union(x)
    return ds


def _grams(t, n):
    w = _WORD_RE.findall((t or "").lower())
    return [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]


def _oracle_curate(df, bench_texts, min_tokens, max_tokens, ngram_n,
                   max_cf, frac, seed):
    gram_set = set()
    for b in bench_texts:
        gram_set.update(_grams(b, ngram_n))
    thr = np.uint64(int(frac * _TWO32))
    h = rank_hash(df["doc_id"].to_numpy().astype(np.int64), seed) \
        .astype(np.uint64)

    # min-id canonical per identical text; None-texts form ONE group
    # distinct from ""
    canon_min: dict = {}
    for did, t in zip(df["doc_id"], df["text"]):
        key = (t is None, t or "")
        if key not in canon_min or did < canon_min[key]:
            canon_min[key] = did

    rows = []
    for i, (did, t) in enumerate(zip(df["doc_id"], df["text"])):
        n_tok = len(re.findall(r"\S+", t or ""))
        g = _grams(t, ngram_n)
        cf = (sum(x in gram_set for x in g) / len(g)) if g else 0.0
        ok_len = min_tokens <= n_tok <= max_tokens
        ok_dec = cf <= max_cf
        ok_sam = bool(h[i] < thr)
        canon = canon_min[(t is None, t or "")] == did
        rows.append((did, n_tok, cf, ok_len, ok_dec, ok_sam, canon,
                     ok_len and ok_dec and ok_sam and canon))
    return pd.DataFrame(rows, columns=[
        "doc_id", "n_tokens", "contaminated_frac", "pass_length",
        "pass_decontaminate", "pass_sample", "is_canonical", "keep"])


@pytest.mark.parametrize("seed", [501, 502, 503])
def test_curate_documents_vs_python_oracle(ray_session, seed):
    from chronon_ray.pipelines.curation import curate_documents

    rng = np.random.default_rng(seed)
    df = _rand_docs(rng)
    bench = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(_BENCH), dtype=np.int64)),
        "text": pa.array(_BENCH)}))
    min_tokens = int(rng.integers(1, 7))
    ngram_n = int(rng.integers(3, 6))
    max_cf = float(rng.choice([0.0, 0.3]))
    frac = float(rng.choice([0.5, 1.0]))
    s = int(rng.integers(0, 100))

    out = curate_documents(_to_ds(df, rng), bench, min_tokens=min_tokens,
                           ngram_n=ngram_n, max_contaminated_frac=max_cf,
                           sample_fraction=frac, seed=s,
                           num_partitions=8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    exp = _oracle_curate(df, _BENCH, min_tokens, 1_000_000, ngram_n,
                         max_cf, frac, s) \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(out) == len(exp), seed
    for c in ["doc_id", "n_tokens", "pass_length", "pass_decontaminate",
              "pass_sample", "is_canonical", "keep"]:
        np.testing.assert_array_equal(out[c].to_numpy(), exp[c].to_numpy(),
                                      err_msg=f"{seed}:{c}")
    np.testing.assert_allclose(out["contaminated_frac"],
                               exp["contaminated_frac"], rtol=1e-12)


@pytest.mark.parametrize("seed", [511, 512])
def test_training_export_vs_composed_oracle(ray_session, seed):
    from chronon_ray.pipelines.curation import training_export

    rng = np.random.default_rng(seed)
    df = _rand_docs(rng)
    bench = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(_BENCH), dtype=np.int64)),
        "text": pa.array(_BENCH)}))
    L = int(rng.integers(8, 64))
    n_shards = int(rng.integers(2, 6))
    frac = float(rng.choice([0.6, 1.0]))
    s1, s2 = int(rng.integers(0, 50)), int(rng.integers(0, 50))
    min_tokens = int(rng.integers(1, 5))

    out = training_export(_to_ds(df, rng), bench, seq_len=L,
                          n_shards=n_shards, sample_fraction=frac,
                          sample_seed=s1, shard_seed=s2,
                          min_tokens=min_tokens, ngram_n=5,
                          num_partitions=8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    audit = _oracle_curate(df, _BENCH, min_tokens, 1_000_000, 5, 0.0,
                           frac, s1)
    kept = df.merge(audit.loc[audit["keep"], ["doc_id"]], on="doc_id") \
        .sort_values("doc_id").reset_index(drop=True)
    n_tok = np.array([len(_WORD_RE.findall((t or "").lower()))
                      for t in kept["text"]], dtype=np.int64)
    off = np.concatenate([[0], np.cumsum(n_tok)[:-1]]) \
        if len(kept) else np.array([], dtype=np.int64)
    end = off + np.maximum(n_tok, 1) - 1
    seq_id = off // L
    shard = rank_hash(seq_id.astype(np.int64), s2) % np.uint32(n_shards)
    exp = pd.DataFrame({
        "doc_id": kept["doc_id"].to_numpy(),
        "n_tok": n_tok,
        "tok_offset": off,
        "seq_id": seq_id,
        "seq_pos": off % L,
        "n_seqs": end // L - seq_id + 1,
        "shard": shard.astype(np.int64),
    })
    assert len(out) == len(exp), (seed, len(out), len(exp))
    for c in exp.columns:
        np.testing.assert_array_equal(out[c].to_numpy(), exp[c].to_numpy(),
                                      err_msg=f"{seed}:{c}")
