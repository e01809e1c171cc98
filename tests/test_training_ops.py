"""Edge-case tests for the round-2 training-data ops: repetition signals,
corpus-wide duplicate n-grams, and concat-and-chunk sequence packing.

(The full-corpus parity with DuckDB is covered by test_entry_contract; these
pin the hand-computable edge semantics.)"""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from chronon_ray.functions.dedup import dup_ngram_stats
from chronon_ray.functions.packing import pack_sequences
from chronon_ray.functions.text import RepetitionSignalsStage


def test_repetition_signals_edges(ray_session):
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            "a b\na b\nxy z",          # dup line "a b" (2x), top 2gram "a b"
            "",                         # empty
            "one two three four five",  # all unique
        ],
    })
    out = rd.from_pandas(docs).map_batches(
        RepetitionSignalsStage(), batch_format="pandas").to_pandas() \
        .set_index("doc_id").sort_index()
    r1 = out.loc[1]
    assert r1["n_lines"] == 3
    # 3 lines, 2 distinct -> dup_line_frac = 1/3
    assert r1["dup_line_frac"] == pytest.approx(1 / 3)
    # dup chars: one extra "a b" occurrence = 3 chars of 3+3+4=10 total
    assert r1["dup_line_char_frac"] == pytest.approx(3 / 10)
    # words: a b a b xy z (7 word chars) -> top 2gram "a b" cnt=2 clen=2,
    # covers 4 of 7 chars
    assert r1["top_2gram_char_frac"] == pytest.approx(4 / 7)
    r2 = out.loc[2]
    assert r2["n_lines"] == 0 and r2["dup_line_frac"] == 0.0
    assert out.loc[3, "dup_5gram_frac"] == 0.0


def test_repetition_dup_5gram(ray_session):
    # "a b c d e" * 3 = 15 words -> 11 5-grams but only 5 distinct (the
    # stream is cyclic, every gram is a rotation) -> dup = (11 - 5) / 11
    text = "a b c d e " * 3
    out = rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": [text]})) \
        .map_batches(RepetitionSignalsStage(), batch_format="pandas") \
        .to_pandas()
    assert out["dup_5gram_frac"].iloc[0] == pytest.approx(6 / 11)


def test_dup_ngram_stats_cross_doc(ray_session):
    shared = "alpha beta gamma delta epsilon"
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            shared + " zeta",            # 2 grams, 1 shared with doc 2
            "intro " + shared,           # 2 grams, 1 shared with doc 1
            "p q r s t u",               # 2 grams, all unique
        ],
    })
    out = dup_ngram_stats(rd.from_pandas(docs), "text", "doc_id", n=5,
                          num_partitions=4).to_pandas() \
        .set_index("doc_id").sort_index()
    assert out.loc[1, "n_grams"] == 2
    assert out.loc[1, "n_dup_grams"] == 1
    assert out.loc[1, "n_cross_doc_grams"] == 1
    assert out.loc[2, "n_cross_doc_grams"] == 1
    assert out.loc[3, "n_dup_grams"] == 0
    assert out.loc[3, "cross_doc_gram_frac"] == 0.0


def test_dup_ngram_stats_within_doc(ray_session):
    # gram repeated inside ONE doc counts as dup but not cross-doc
    text = "a b c d e " * 2  # grams: 6, "a b c d e" occurs 2x
    out = dup_ngram_stats(
        rd.from_pandas(pd.DataFrame({"doc_id": [7], "text": [text]})),
        "text", "doc_id", n=5, num_partitions=2).to_pandas()
    row = out.iloc[0]
    assert row["n_grams"] == 6
    assert row["n_dup_grams"] == 2
    assert row["n_cross_doc_grams"] == 0


def test_pack_sequences_boundaries(ray_session):
    docs = pd.DataFrame({
        "doc_id": [10, 20, 30, 40],
        "text": ["w " * 6, "", "x " * 3, "y " * 10],  # counts 6, 0, 3, 10
    })
    out = pack_sequences(rd.from_pandas(docs), "text", "doc_id",
                         seq_len=8, n_buckets=2).to_pandas() \
        .set_index("doc_id").sort_index()
    # offsets are an exclusive scan in doc_id order: 0, 6, 6, 9
    assert out["tok_offset"].tolist() == [0, 6, 6, 9]
    assert out["seq_id"].tolist() == [0, 0, 0, 1]
    assert out["seq_pos"].tolist() == [0, 6, 6, 1]
    # doc 40: tokens 9..18 -> seqs 1 and 2
    assert out.loc[40, "n_seqs"] == 2
    assert out.loc[20, "n_seqs"] == 1  # empty doc occupies its start seq
    # total layout is contiguous
    assert (out["tok_offset"] + np.where(out["n_tok"] > 0, out["n_tok"], 0)
            ).max() == 19


def test_pack_sequences_matches_serial_scan(ray_session):
    rng = np.random.default_rng(5)
    n = 500
    docs = pd.DataFrame({
        "doc_id": rng.choice(100_000, size=n, replace=False),
        "text": ["t " * int(k) for k in rng.integers(0, 50, size=n)],
    })
    out = pack_sequences(rd.from_pandas(docs), "text", "doc_id",
                         seq_len=64, n_buckets=16).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    ordered = docs.sort_values("doc_id").reset_index(drop=True)
    ntok = ordered["text"].str.split().map(len).to_numpy()
    exp_off = np.concatenate([[0], np.cumsum(ntok)[:-1]])
    assert (out["doc_id"].to_numpy() == ordered["doc_id"].to_numpy()).all()
    assert (out["n_tok"].to_numpy() == ntok).all()
    assert (out["tok_offset"].to_numpy() == exp_off).all()
    assert (out["seq_id"].to_numpy() == exp_off // 64).all()
