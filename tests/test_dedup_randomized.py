"""Randomized differential for the dedup family.

Seeded random corpora with PLANTED duplicates, nulls in content columns,
and randomized block layouts, checked against first-principles pandas /
Counter oracles. The focus is the invariance class where the round-4
systemic bug lived (null-promotion key splits): the SAME corpus split
into DIFFERENT block layouts must produce identical results, and content
equality must be exact (null-distinct, dtype-stable) regardless of which
block a row landed in."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from chronon_ray.functions.dedup import (
    char_dup_ngram_stats,
    dup_ngram_stats,
    exact_dedup,
    incremental_exact_dedup,
    minhash_lsh_pairs,
    remove_dup_spans,
)

_VOCAB = np.array([f"w{i}" for i in range(30)], dtype=object)


def _gen_docs(rng, n, dup_frac=0.3):
    """Random corpus: texts from a small vocab (so word n-grams repeat),
    a fraction of docs are exact copies of earlier docs, `cat` is a
    nullable int content column."""
    texts = []
    for i in range(n):
        if i > 0 and rng.random() < dup_frac:
            texts.append(texts[rng.integers(0, i)])
        else:
            k = int(rng.integers(4, 12))
            texts.append(" ".join(rng.choice(_VOCAB, size=k)))
    cat = rng.integers(0, 3, size=n).astype(object)
    cat[rng.random(n) < 0.2] = None
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "cat": cat,
    })


def _to_ds(df, rng, max_blocks=6):
    """Dataset with a RANDOM block layout: shuffled row order, random
    split points, one block per chunk (unioned so Ray keeps them as
    separate blocks with independently-inferred schemas)."""
    order = rng.permutation(len(df))
    df = df.iloc[order].reset_index(drop=True)
    nb = int(rng.integers(1, max_blocks + 1))
    cuts = np.sort(rng.choice(np.arange(1, len(df)), size=nb - 1,
                              replace=False)) if nb > 1 else np.array([], int)
    parts = np.split(np.arange(len(df)), cuts)
    tables = []
    for idx in parts:
        sub = df.iloc[idx]
        tables.append(pa.table({
            "doc_id": pa.array(sub["doc_id"].to_numpy()),
            "text": pa.array(sub["text"].tolist(), type=pa.string()),
            "cat": pa.array(sub["cat"].tolist(), type=pa.int64()),
        }))
    ds = rd.from_arrow(tables[0])
    for t in tables[1:]:
        ds = ds.union(rd.from_arrow(t))
    return ds


def _exact_oracle(df, on):
    """SQL-DISTINCT conventions: nulls equal each other, never a value;
    keep the min doc_id per content group."""
    key = df[list(on)].astype(object).where(df[list(on)].notna(), "\x00null")
    grp = df.assign(_k=[tuple(r) for r in key.to_numpy()])
    return set(grp.groupby("_k")["doc_id"].min().tolist())


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_exact_dedup_vs_oracle_any_block_layout(ray_session, seed):
    rng = np.random.default_rng(seed)
    df = _gen_docs(rng, int(rng.integers(60, 140)))
    want = _exact_oracle(df, ("text", "cat"))
    got_sets = []
    for trial in range(2):  # two different random layouts of the SAME corpus
        ds = _to_ds(df, rng)
        out = exact_dedup(ds, on=("text", "cat"), id_col="doc_id",
                          num_partitions=16).to_pandas()
        got_sets.append(set(out["doc_id"].tolist()))
    assert got_sets[0] == want, (seed, sorted(got_sets[0] ^ want))
    assert got_sets[1] == want, (seed, "layout-dependent result")


@pytest.mark.parametrize("seed", [5, 31])
def test_incremental_chain_equals_global_dedup(ray_session, seed, tmp_path):
    """Chaining incremental_exact_dedup day by day must equal one global
    dedup with earlier-(day, id) wins over the concatenated corpus."""
    rng = np.random.default_rng(seed)
    days = []
    base = 0
    pool: list[str] = []
    for d in range(3):
        n = int(rng.integers(30, 60))
        texts = []
        for i in range(n):
            # duplicates within the day AND against earlier days
            if pool and rng.random() < 0.4:
                texts.append(pool[rng.integers(0, len(pool))])
            else:
                texts.append(" ".join(rng.choice(_VOCAB,
                                                 size=int(rng.integers(4, 9)))))
        pool.extend(texts)
        days.append(pd.DataFrame({
            "doc_id": np.arange(base, base + n, dtype=np.int64),
            "text": texts,
        }))
        base += n

    state = str(tmp_path / "state")
    kept = []
    for d, df in enumerate(days):
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(df["doc_id"].to_numpy()),
            "text": pa.array(df["text"].tolist(), type=pa.string()),
        }))
        out = incremental_exact_dedup(
            ds, state, f"2026-01-0{d + 1}", on=("text",), id_col="doc_id",
            num_partitions=8).to_pandas()
        kept.extend(out["doc_id"].tolist())

    allcat = pd.concat(days, ignore_index=True)
    want = set(allcat.groupby("text")["doc_id"].min().tolist())
    assert set(kept) == want, (seed, sorted(set(kept) ^ want))


def _gram_oracle(df, n):
    """Brute-force word-n-gram stats (Counter over the whole corpus)."""
    from collections import Counter

    grams_per_doc = {}
    total = Counter()
    docs_of = {}
    for _, row in df.iterrows():
        words = row["text"].split()
        gs = [tuple(words[i:i + n]) for i in range(len(words) - n + 1)]
        grams_per_doc[row["doc_id"]] = gs
        total.update(gs)
        for g in set(gs):
            docs_of.setdefault(g, set()).add(row["doc_id"])
    rows = {}
    for did, gs in grams_per_doc.items():
        cnt = len(gs)
        dup = sum(1 for g in gs if total[g] > 1)
        cross = sum(1 for g in gs if len(docs_of[g]) > 1)
        rows[did] = (cnt, dup, cross)
    return rows


@pytest.mark.parametrize("seed", [7, 19])
def test_dup_ngram_stats_vs_bruteforce(ray_session, seed):
    rng = np.random.default_rng(seed)
    df = _gen_docs(rng, int(rng.integers(40, 90)), dup_frac=0.35)
    n = 3
    want = _gram_oracle(df, n)
    ds = _to_ds(df, rng)
    out = dup_ngram_stats(ds, "text", "doc_id", n=n,
                          num_partitions=16).to_pandas()
    got = {int(r.doc_id): (int(r.n_grams), int(r.n_dup_grams),
                           int(r.n_cross_doc_grams))
           for r in out.itertuples()}
    want_nonzero = {d: v for d, v in want.items() if v[0] > 0}
    assert got == want_nonzero, (
        seed, {d: (got.get(d), want_nonzero.get(d))
               for d in set(got) | set(want_nonzero)
               if got.get(d) != want_nonzero.get(d)})


def _char_oracle(df, L):
    from collections import Counter

    total = Counter()
    docs_of = {}
    windows = {}
    for _, row in df.iterrows():
        t = row["text"]
        ws = [t[i:i + L] for i in range(len(t) - L + 1)]
        windows[row["doc_id"]] = ws
        total.update(ws)
        for w in set(ws):
            docs_of.setdefault(w, set()).add(row["doc_id"])
    rows = {}
    for did, ws in windows.items():
        cnt = len(ws)
        dup = sum(1 for w in ws if total[w] > 1)
        cross = sum(1 for w in ws if len(docs_of[w]) > 1)
        rows[did] = (cnt, dup, cross)
    return rows


@pytest.mark.parametrize("seed", [13])
def test_char_dup_ngram_stats_vs_bruteforce(ray_session, seed):
    rng = np.random.default_rng(seed)
    df = _gen_docs(rng, 60, dup_frac=0.35)
    L = 12
    want = _char_oracle(df, L)
    ds = _to_ds(df, rng)
    out = char_dup_ngram_stats(ds, "text", "doc_id", L=L,
                               num_partitions=16).to_pandas()
    got = {int(r.doc_id): (int(r.n_grams), int(r.n_dup_grams),
                           int(r.n_cross_doc_grams))
           for r in out.itertuples()}
    want_nonzero = {d: v for d, v in want.items() if v[0] > 0}
    assert got == want_nonzero, seed


@pytest.mark.parametrize("seed", [3, 29])
def test_minhash_pairs_block_layout_invariance(ray_session, seed):
    """Same corpus, two random block layouts → identical verified pair
    set; planted exact duplicates must always be found."""
    rng = np.random.default_rng(seed)
    df = _gen_docs(rng, 70, dup_frac=0.3)
    # texts long enough to shingle (k=5 chars): vocab words are 2-3 chars
    # + spaces, 4-12 words → >= 11 chars; fine.
    pair_sets = []
    for trial in range(2):
        ds = _to_ds(df, rng)
        out = minhash_lsh_pairs(ds, "text", "doc_id", num_perm=64, bands=16,
                                shingle_k=5, threshold=0.7).to_pandas()
        pair_sets.append(set(zip(out["a"].tolist(), out["b"].tolist())))
    assert pair_sets[0] == pair_sets[1], (seed, pair_sets[0] ^ pair_sets[1])
    # every planted exact-duplicate pair (jaccard 1.0) must be present
    by_text = df.groupby("text")["doc_id"].apply(list)
    for ids in by_text:
        if len(ids) > 1:
            ids = sorted(ids)
            for i in range(1, len(ids)):
                a, b = ids[0], ids[i]
                assert (min(a, b), max(a, b)) in pair_sets[0] or \
                    any((x, y) in pair_sets[0]
                        for x in ids for y in ids if x < y), \
                    (seed, "exact dup cluster not connected", ids)


@pytest.mark.parametrize("seed", [17])
def test_remove_dup_spans_layout_invariance_and_canonical(ray_session, seed):
    """Span removal must be block-layout invariant, keep the canonical
    (min-id) copy intact, and cut the shared span from every other doc."""
    rng = np.random.default_rng(seed)
    n = 40
    L = 12
    shared = "the quick brown fox jumps over the lazy dog tonight"
    texts = []
    for i in range(n):
        body = " ".join(rng.choice(_VOCAB, size=int(rng.integers(6, 12))))
        if i % 5 == 0:
            texts.append(body + " " + shared)
        else:
            texts.append(body)
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "text": texts, "cat": [0] * n})
    outs = []
    for trial in range(2):
        ds = _to_ds(df, rng)
        out = remove_dup_spans(ds, "text", "doc_id", L=L,
                               num_partitions=8).to_pandas()
        outs.append(out.sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    got = outs[0].set_index("doc_id")
    carriers = [i for i in range(n) if i % 5 == 0]
    canon = min(carriers)
    assert got.loc[canon, "n_chars_removed"] == 0
    assert shared in got.loc[canon, "text"]
    for c in carriers[1:]:
        assert got.loc[c, "n_chars_removed"] > 0, (seed, c)
        assert shared not in got.loc[c, "text"], (seed, c)


def test_exact_dedup_dtype_divergent_blocks(ray_session):
    """Blocks may DECLARE different dtypes for the same logical column (a
    pandas round trip promotes nullable int to double): content must hash
    against the dataset-UNIFIED type so 5 and 5.0 are one value."""
    from chronon_ray.functions.dedup import exact_dedup

    t_int = pa.table({"text": ["x", "y"],
                      "cat": pa.array([5, 7], type=pa.int64()),
                      "doc_id": pa.array([1, 2], type=pa.int64())})
    t_dbl = pa.table({"text": ["x", "z"],
                      "cat": pa.array([5.0, None], type=pa.float64()),
                      "doc_id": pa.array([3, 4], type=pa.int64())})
    ds = rd.from_arrow(t_int).union(rd.from_arrow(t_dbl))
    out = exact_dedup(ds, on=("text", "cat"), id_col="doc_id",
                      num_partitions=32).to_pandas()
    # ('x',5)→min id 1 (the 5.0 copy is the SAME content); ('y',7)→2;
    # ('z',NULL)→4
    assert sorted(out["doc_id"].tolist()) == [1, 2, 4], out.to_string()


def test_incremental_dedup_dtype_divergent_day(ray_session, tmp_path):
    """Day-2 blocks arriving dtype-promoted (double) must hash equal to
    the int hashes persisted on day 1 — otherwise every historical
    duplicate is silently re-admitted."""
    from chronon_ray.functions.dedup import incremental_exact_dedup

    state = str(tmp_path / "state")
    d1 = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array(["a", "b"]),
        "cat": pa.array([5, 7], type=pa.int64())}))
    out1 = incremental_exact_dedup(d1, state, "2026-01-01",
                                   on=("text", "cat"), id_col="doc_id",
                                   num_partitions=8).to_pandas()
    assert sorted(out1["doc_id"]) == [1, 2]
    # day 2: same content, but the block declares cat as double (one null
    # forces promotion through a pandas round trip)
    d2 = rd.from_arrow(pa.table({
        "doc_id": pa.array([10, 11], type=pa.int64()),
        "text": pa.array(["a", "c"]),
        "cat": pa.array([5.0, None], type=pa.float64())}))
    out2 = incremental_exact_dedup(d2, state, "2026-01-02",
                                   on=("text", "cat"), id_col="doc_id",
                                   num_partitions=8).to_pandas()
    # ('a',5) already seen on day 1 → dropped; ('c',NULL) is new → kept
    assert sorted(out2["doc_id"].tolist()) == [11], out2.to_string()
