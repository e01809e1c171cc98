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


@pytest.fixture(scope="module")
def docs_ds(ray_session, sf_dir):
    return rd.read_parquet(f"{sf_dir}/documents.parquet")


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


def test_hash_sample_deterministic_and_shard_independent(ray_session):
    from chronon_ray.functions.sampling import hash_sample, rank_hash

    ids = np.arange(2000, dtype=np.int64)
    docs = pd.DataFrame({"doc_id": ids})
    a = hash_sample(rd.from_pandas(docs), "doc_id", 0.3, seed=3) \
        .to_pandas()["doc_id"].sort_values().to_numpy()
    # resharded input -> identical sample
    b = hash_sample(rd.from_pandas(docs).repartition(7), "doc_id", 0.3,
                    seed=3).to_pandas()["doc_id"].sort_values().to_numpy()
    assert (a == b).all()
    # matches the serial definition
    exp = ids[rank_hash(ids, 3).astype(np.uint64) < np.uint64(int(0.3 * 2**32))]
    assert (a == np.sort(exp)).all()
    # fraction is roughly honored
    assert 0.25 < len(a) / len(ids) < 0.35


def test_budget_sample_exact_boundary(ray_session):
    from chronon_ray.functions.sampling import budget_sample, rank_hash

    rng = np.random.default_rng(11)
    n = 1000
    docs = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "grp": np.where(np.arange(n) % 3 == 0, "a", "b"),
        "w": rng.integers(1, 50, size=n).astype(np.int64),
    })
    out = budget_sample(rd.from_pandas(docs), "doc_id", "grp", "w",
                        budgets={"a": 1500, "b": 900}, seed=5,
                        rank_bucket_bits=28).to_pandas()
    # serial oracle: per group, order by (hash, id), keep while cum_excl < B
    h = rank_hash(docs["doc_id"].to_numpy(), 5).astype(np.int64)
    docs2 = docs.assign(h=h)
    keep = []
    for g, B in [("a", 1500), ("b", 900)]:
        sub = docs2[docs2["grp"] == g].sort_values(["h", "doc_id"])
        cum = np.concatenate([[0], np.cumsum(sub["w"].to_numpy())[:-1]])
        keep.extend(sub["doc_id"].to_numpy()[cum < B].tolist())
    got = out["doc_id"].sort_values().to_numpy()
    assert (got == np.sort(np.array(keep))).all()
    # budgets respected: overshoot only by the last straddling row
    for g, B in [("a", 1500), ("b", 900)]:
        s = out[out["grp"] == g]["w"].sum()
        assert s >= B or len(out[out["grp"] == g]) == (docs["grp"] == g).sum()
        assert s - B < 50  # < max weight


def test_budget_sample_zero_and_unlimited(ray_session):
    from chronon_ray.functions.sampling import budget_sample

    docs = pd.DataFrame({"doc_id": np.arange(100, dtype=np.int64),
                         "grp": ["x"] * 100,
                         "w": np.ones(100, dtype=np.int64)})
    none = budget_sample(rd.from_pandas(docs), "doc_id", "grp", "w",
                         default_budget=0).to_pandas()
    assert len(none) == 0
    everything = budget_sample(rd.from_pandas(docs), "doc_id", "grp", "w",
                               default_budget=10**9).to_pandas()
    assert len(everything) == 100


def test_pii_scrub_matches_duckdb(ray_session, docs_ds, duck):
    from chronon_ray.functions.scrub import PIIScrubStage, scrub_oracle_sql

    out = docs_ds.map_batches(PIIScrubStage(), batch_format="pandas") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    expr, counts = scrub_oracle_sql("coalesce(text,'')")
    sql = (f"select doc_id, {expr} as text_scrubbed, "
           + ", ".join(f"{v} as {k}" for k, v in counts.items())
           + " from documents order by doc_id")
    exp = duck.sql(sql).df()
    for c in ["text_scrubbed", "n_email", "n_ipv4", "n_phone"]:
        assert out[c].tolist() == exp[c].tolist(), c


def test_decontaminate_against_serial(ray_session, docs_ds):
    import pandas as pd
    import ray.data as rd

    from chronon_ray.functions.decontaminate import decontaminate, _doc_grams

    def _b(t):
        import pyarrow.compute as pc
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        import pyarrow as pa
        return t.filter(pa.array(ids % 20 == 0))

    _b.__name__ = "bench_subset"
    bench = docs_ds.map_batches(_b, batch_format="pyarrow")
    out = decontaminate(docs_ds, bench, "text", "doc_id", n=5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # serial oracle
    pdf = docs_ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    bset = set()
    for t in pdf[pdf["doc_id"] % 20 == 0]["text"]:
        bset.update(_doc_grams(pd.Series([t]), 5).tolist())
    for _, r in pdf.iterrows():
        g = _doc_grams(pd.Series([r["text"]]), 5)
        total = len(g)
        bad = int(g.isin(bset).sum())
        row = out[out["doc_id"] == r["doc_id"]].iloc[0]
        assert row["n_grams"] == total
        assert row["n_contaminated"] == bad, r["doc_id"]
        assert bool(row["keep"]) == (bad / max(total, 1) <= 0.0)
    # every benchmark member with >=5 words is fully contaminated
    m = out[(out["doc_id"] % 20 == 0) & (out["n_grams"] > 0)]
    assert (m["n_contaminated"] == m["n_grams"]).all()
    assert (~m["keep"]).all()


def test_decontaminate_hashed_mode(ray_session, docs_ds):
    from chronon_ray.functions.decontaminate import decontaminate

    def _b(t):
        import pyarrow.compute as pc
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        import pyarrow as pa
        return t.filter(pa.array(ids % 20 == 0))

    _b.__name__ = "bench_subset"
    bench = docs_ds.map_batches(_b, batch_format="pyarrow")
    a = decontaminate(docs_ds, bench, "text", "doc_id", n=5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = decontaminate(docs_ds, bench, "text", "doc_id", n=5,
                      hashed=True).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert (a["n_contaminated"] == b["n_contaminated"]).all()
    assert (a["keep"] == b["keep"]).all()
    # bloom tier: one-sided — never misses a real hit, small FP rate
    c = decontaminate(docs_ds, bench, "text", "doc_id", n=5,
                      mode="bloom").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert (c["n_contaminated"] >= a["n_contaminated"]).all()
    tot = int(a["n_grams"].sum())
    fp = int((c["n_contaminated"] - a["n_contaminated"]).sum())
    assert fp / max(tot, 1) < 0.05, fp / tot



def test_char_dup_ngram_stats_matches_duckdb(ray_session, docs_ds, duck):
    from chronon_ray.functions.dedup import char_dup_ngram_stats

    out = char_dup_ngram_stats(docs_ds, "text", "doc_id", L=12,
                               num_partitions=8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    exp = duck.sql(r"""
        with pos as (
            select doc_id,
                   unnest(generate_series(1,
                       greatest(length(coalesce(text,'')) - 11, 0))) as i
            from documents
        ), g as (
            select p.doc_id, substring(coalesce(d.text,''), p.i, 12) as gram
            from pos p join documents d using (doc_id)
        ), gc as (
            select doc_id, gram, count(*) as cnt from g group by doc_id, gram
        ), gt as (
            select gram, sum(cnt) as total, count(*) as ndocs
            from gc group by gram
        ), per as (
            select gc.doc_id, gc.cnt,
                   case when gt.total > 1 then gc.cnt else 0 end as dup,
                   case when gt.ndocs > 1 then gc.cnt else 0 end as xd
            from gc join gt using (gram)
        )
        select doc_id, cast(sum(cnt) as bigint) as n_grams,
               cast(sum(dup) as bigint) as n_dup_grams,
               cast(sum(xd) as bigint) as n_cross_doc_grams
        from per group by doc_id order by doc_id
    """).df()
    assert len(out) == len(exp)
    for c in ["n_grams", "n_dup_grams", "n_cross_doc_grams"]:
        assert out[c].tolist() == exp[c].tolist(), c


def test_training_export_sharded_write(ray_session, docs_ds, tmp_path):
    """The export chain streams into shard-partitioned parquet through the
    atomic/manifest writer — the resume unit is a completed shard dir."""
    import os

    from chronon_ray.pipelines.curation import training_export
    from chronon_ray.state.lineage import write_partitioned

    out = training_export(docs_ds, None, seq_len=256, n_shards=4,
                          min_tokens=5)
    manifests = write_partitioned(out, str(tmp_path), config_hash="texp1",
                                  partition_col="shard")
    assert set(manifests) == {"0", "1", "2", "3"} or len(manifests) >= 1
    total = 0
    import pyarrow.parquet as pq
    for sh, man in manifests.items():
        pdir = os.path.join(str(tmp_path), f"shard={sh}")
        assert os.path.exists(os.path.join(pdir, "_MANIFEST.json"))
        n = sum(pq.read_metadata(os.path.join(pdir, f)).num_rows
                for f in os.listdir(pdir) if f.endswith(".parquet"))
        assert n == man["rows"]
        total += n
    # every kept doc appears exactly once across shards
    kept = out.to_pandas()
    assert total == len(kept)
    assert kept["doc_id"].is_unique


def test_incremental_dedup_state(ray_session, tmp_path):
    """Persisted-state dedup: day 2 drops texts committed on day 1 plus
    within-day dups; rerunning a committed day is idempotent."""
    import ray.data as rd

    from chronon_ray.functions.dedup import incremental_exact_dedup

    state = str(tmp_path / "state")
    day1 = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                         "text": ["a", "b", "a", "c"]})
    day2 = pd.DataFrame({"doc_id": [10, 11, 12, 13, 14],
                         "text": ["b", "d", "d", "e", "a"]})
    k1 = incremental_exact_dedup(rd.from_pandas(day1), state, "2026-01-01",
                                 ["text"], "doc_id").to_pandas()
    assert sorted(k1["doc_id"]) == [1, 2, 4]
    k2 = incremental_exact_dedup(rd.from_pandas(day2), state, "2026-01-02",
                                 ["text"], "doc_id").to_pandas()
    assert sorted(k2["doc_id"]) == [11, 13]
    k2b = incremental_exact_dedup(rd.from_pandas(day2), state, "2026-01-02",
                                  ["text"], "doc_id").to_pandas()
    assert sorted(k2b["doc_id"]) == [11, 13]


def test_stratified_sample_null_group(ray_session):
    """Rows with a NULL group take default_fraction, not the last group's
    threshold (the factorize -1 sentinel trap)."""
    import pyarrow as pa
    import ray.data

    from chronon_ray.functions.sampling import stratified_sample

    n = 2000
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n), type=pa.int64()),
        "lang": pa.array(["en" if i % 2 == 0 else None
                          for i in range(n)]),
    })
    out = stratified_sample(ray.data.from_arrow(tbl), "doc_id", "lang",
                            fractions={"en": 1.0}, default_fraction=0.0,
                            seed=3).to_pandas()
    assert len(out) == n // 2
    assert out["lang"].notna().all()
