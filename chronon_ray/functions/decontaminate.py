"""Benchmark decontamination: flag training docs that overlap an evaluation
set by word n-grams (the standard "remove eval contamination" pass — e.g.
GPT-3 appendix C / PaLM-style 8-gram overlap; no reference analog, named by
the task brief's training-data family).

Pattern: the benchmark side is small by construction (eval sets are orders
of magnitude below the corpus), so its distinct n-gram set is collected once
and broadcast with `ray.put`; the corpus streams through one `map_batches`
that counts, per document, total n-gram occurrences and occurrences hitting
the benchmark set. No shuffle at all — at 100 TB the corpus never moves.

Membership tiers (pick by benchmark size, mirroring the reference's
small-mode → bloom join-filter ladder):

- ``mode="exact"``: gram STRINGS in a python set — C-speed probes, SQL-
  oracle-exact. Default.
- ``mode="hashed"``: uint64 gram hashes (~8 B/gram), ~2^-64 FP per pair.
- ``mode="bloom"``: a Bloom bit array (~`bloom_bits_per_gram` bits/gram,
  k=4 probes derived from the 64-bit hash) — ~6× smaller than hashed;
  one-sided error: every truly-contaminated gram is flagged, plus an
  ~0.5-2% false-positive rate (tune with bloom_bits_per_gram). Use when
  even the hash array strains the object store.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

_WORD_RE = re.compile(r"[a-z0-9]+")


def _doc_grams(texts: pd.Series, n: int) -> pd.Series:
    """Per-row list of word n-grams as a (row_idx-indexed) exploded Series."""
    words = texts.fillna("").str.lower().reset_index(drop=True) \
        .str.findall(_WORD_RE.pattern).explode()
    words = words[words.notna()]
    parts = [words]
    for k in range(1, n):
        parts.append(words.groupby(level=0).shift(-k))
    ok = pd.concat([p.notna() for p in parts], axis=1).all(axis=1)
    if not ok.any():
        return pd.Series([], dtype=str)
    g = parts[0][ok]
    for p in parts[1:]:
        g = g + " " + p[ok]
    return g


def _hash_grams(g: pd.Series) -> np.ndarray:
    return pd.util.hash_pandas_object(g, index=False).to_numpy()


_BLOOM_K = 4


def _bloom_probes(h: np.ndarray, nbits: int) -> np.ndarray:
    """(len(h), k) bit positions via double hashing of the 64-bit hash."""
    h = h.astype(np.uint64)
    h1 = h % np.uint64(nbits)
    h2 = ((h >> np.uint64(33)) | np.uint64(1)) % np.uint64(nbits)
    ks = np.arange(_BLOOM_K, dtype=np.uint64)
    return (h1[:, None] + ks[None, :] * h2[:, None]) % np.uint64(nbits)


def _bloom_build(hashes: np.ndarray, bits_per_gram: int) -> np.ndarray:
    # byte-align nbits: the tester re-derives it as len(bits) * 8
    nbits = -(-max(int(len(hashes) * bits_per_gram), 64) // 8) * 8
    bits = np.zeros(nbits // 8, dtype=np.uint8)
    pos = _bloom_probes(hashes, nbits).reshape(-1)
    np.bitwise_or.at(bits, (pos // 8).astype(np.int64),
                     (np.uint8(1) << (pos % 8).astype(np.uint8)))
    return bits


def _bloom_test(bits: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    nbits = len(bits) * 8
    pos = _bloom_probes(hashes, nbits)
    byte = bits[(pos // 8).astype(np.int64)]
    got = (byte >> (pos % 8).astype(np.uint8)) & 1
    return got.all(axis=1)


def benchmark_gram_set(bench: ray.data.Dataset, text_col: str, n: int = 8,
                       hashed: bool = False, mode: str | None = None,
                       bloom_bits_per_gram: int = 10):
    """Distinct benchmark n-grams (strings, uint64 hashes, or a Bloom bit
    array) → object-store ref for broadcast. The per-block distinct runs
    distributed; only the (small) distinct set reaches the driver."""
    if mode is None:
        mode = "hashed" if hashed else "exact"

    def grams(pdf: pd.DataFrame) -> pd.DataFrame:
        g = _doc_grams(pdf[text_col], n).drop_duplicates()
        if mode in ("hashed", "bloom"):
            return pd.DataFrame({"g": np.unique(_hash_grams(g))})
        return pd.DataFrame({"g": g.to_numpy()})

    grams.__name__ = "bench_grams"
    pdf = bench.map_batches(grams, batch_format="pandas").to_pandas()
    if mode == "bloom":
        return ray.put(_bloom_build(np.unique(pdf["g"].to_numpy()),
                                    bloom_bits_per_gram))
    if mode == "hashed":
        return ray.put(np.unique(pdf["g"].to_numpy()))
    return ray.put(set(pdf["g"].tolist()))


def decontaminate(docs: ray.data.Dataset, bench: ray.data.Dataset,
                  text_col: str, id_col: str, n: int = 8,
                  max_frac: float = 0.0,
                  hashed: bool = False,
                  mode: str | None = None,
                  bloom_bits_per_gram: int = 10) -> ray.data.Dataset:
    """Per-doc contamination stats + keep flag.

    Output: (id_col, n_grams, n_contaminated, contaminated_frac, keep) —
    keep iff contaminated_frac <= max_frac (docs with no grams keep=True).
    """
    if mode is None:
        mode = "hashed" if hashed else "exact"
    ref = benchmark_gram_set(bench, text_col, n=n, mode=mode,
                             bloom_bits_per_gram=bloom_bits_per_gram)

    class Mark:
        __name__ = "decontaminate_mark"

        def __init__(self):
            self._set = None

        def __call__(self, pdf: pd.DataFrame) -> pd.DataFrame:
            if self._set is None:
                self._set = ray.get(ref)
            ids = pdf[id_col].reset_index(drop=True)
            g = _doc_grams(pdf[text_col], n)
            total = np.zeros(len(ids), dtype=np.int64)
            bad = np.zeros(len(ids), dtype=np.int64)
            if len(g):
                if mode == "bloom":
                    hit = _bloom_test(self._set, _hash_grams(g))
                elif mode == "hashed":
                    hit = np.isin(_hash_grams(g), self._set)
                else:
                    hit = g.isin(self._set).to_numpy()
                row = g.index.to_numpy().astype(np.int64)
                np.add.at(total, row, 1)
                np.add.at(bad, row, hit.astype(np.int64))
            frac = bad / np.maximum(total, 1)
            return pd.DataFrame({
                id_col: ids,
                "n_grams": total,
                "n_contaminated": bad,
                "contaminated_frac": frac,
                "keep": frac <= max_frac,
            })

    return docs.map_batches(Mark, batch_format="pandas", concurrency=(1, 8))
