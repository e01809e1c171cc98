"""End-to-end document curation: the composite pipeline a pre-training data
run actually executes — length gate → benchmark decontamination →
deterministic down-sampling → exact-dedup canonical pick — emitted as an
AUDIT table (one row per input doc, a flag per stage plus the final keep),
so every drop is attributable.

Shuffle budget: ONE. Token counting, contamination marking and hash
sampling are all stateless per-row `map_batches` stages chained on the same
streaming Dataset (the benchmark n-gram set rides the object store via
`ray.put`); only canonical-duplicate election needs co-location, and it
reuses the content-hash partitioning of dedup.exact_dedup. At 100 TB the
corpus crosses the exchange exactly once, as (hash-partitioned) full rows.

Every decision is reproducible in SQL (see __ray_entry__ `curate` oracle):
whitespace token counts = regexp counts, contamination = n-gram set
membership, sampling = the murmur3 fmix32 rank hash, canonical = min doc_id
per identical text.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions.decontaminate import _doc_grams, benchmark_gram_set
from ..functions.dedup import _partition_by_hash
from ..functions.sampling import _TWO32, rank_hash
from ..util import auto_partitions


def curate_documents(
    docs: ray.data.Dataset,
    bench: Optional[ray.data.Dataset],
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 5,
    max_tokens: int = 1_000_000,
    ngram_n: int = 5,
    max_contaminated_frac: float = 0.0,
    sample_fraction: float = 1.0,
    seed: int = 0,
    num_partitions: Optional[int] = None,
    keep_text: bool = False,
) -> ray.data.Dataset:
    """Audit table: (id, n_tokens, contaminated_frac, pass_length,
    pass_decontaminate, pass_sample, is_canonical, keep). ``keep`` is the
    AND of the four stage flags. ``bench=None`` skips decontamination.
    ``keep_text=True`` carries the text column through (already co-located
    — the canonical election partitions by text) so downstream stages like
    packing can consume kept docs without re-joining the corpus."""
    if num_partitions is None:
        num_partitions = auto_partitions(docs)
    gram_ref = None if bench is None else benchmark_gram_set(
        bench, text_col, n=ngram_n)
    thr = np.uint64(int(sample_fraction * _TWO32))

    class RowStages:
        """All per-row signals in one pass: token count, contamination
        fraction, sample flag."""

        __name__ = "curate_row_stages"

        def __init__(self):
            self._set = None

        def __call__(self, pdf: pd.DataFrame) -> pd.DataFrame:
            t = pdf[text_col].fillna("")
            out = pdf.copy()
            out["n_tokens"] = t.str.count(r"\S+").astype(np.int64)
            if gram_ref is not None:
                if self._set is None:
                    self._set = ray.get(gram_ref)
                g = _doc_grams(t, ngram_n)
                total = np.zeros(len(pdf), dtype=np.int64)
                bad = np.zeros(len(pdf), dtype=np.int64)
                if len(g):
                    hit = g.isin(self._set).to_numpy()
                    row = g.index.to_numpy().astype(np.int64)
                    np.add.at(total, row, 1)
                    np.add.at(bad, row, hit.astype(np.int64))
                out["contaminated_frac"] = bad / np.maximum(total, 1)
            else:
                out["contaminated_frac"] = 0.0
            ids = pdf[id_col].to_numpy().astype(np.int64)
            out["pass_sample"] = rank_hash(ids, seed).astype(np.uint64) < thr
            return out

    def finish(pdf: pd.DataFrame) -> pd.DataFrame:
        """One content-hash partition: elect min-id canonical per identical
        text, then fold the flags."""
        pdf = pdf.sort_values([text_col, id_col], kind="stable")
        canon = ~pdf.duplicated(text_col, keep="first")
        n_tok = pdf["n_tokens"].to_numpy()
        ok_len = (n_tok >= min_tokens) & (n_tok <= max_tokens)
        ok_dec = pdf["contaminated_frac"].to_numpy() <= max_contaminated_frac
        ok_sam = pdf["pass_sample"].to_numpy()
        out = pd.DataFrame({
            id_col: pdf[id_col].to_numpy(),
            "n_tokens": n_tok,
            "contaminated_frac": pdf["contaminated_frac"].to_numpy(),
            "pass_length": ok_len,
            "pass_decontaminate": ok_dec,
            "pass_sample": ok_sam,
            "is_canonical": canon.to_numpy(),
            "keep": ok_len & ok_dec & ok_sam & canon.to_numpy(),
        })
        if keep_text:
            out[text_col] = pdf[text_col].to_numpy()
        return out

    finish.__name__ = "curate_finish"
    staged = docs.map_batches(RowStages, batch_format="pandas",
                              concurrency=(1, 8))
    return _partition_by_hash(staged, [text_col], num_partitions) \
        .groupby("_part").map_groups(finish, batch_format="pandas")


def training_export(
    docs: ray.data.Dataset,
    bench: Optional[ray.data.Dataset],
    text_col: str = "text",
    id_col: str = "doc_id",
    seq_len: int = 512,
    n_shards: int = 4,
    sample_fraction: float = 1.0,
    sample_seed: int = 0,
    shard_seed: int = 0,
    min_tokens: int = 5,
    ngram_n: int = 5,
    num_partitions: Optional[int] = None,
) -> ray.data.Dataset:
    """The full pre-training export chain: curate (length gate +
    decontamination + deterministic sample + canonical dedup) → kept docs →
    concat-and-chunk sequence packing → hash-ranked shard assignment.

    Output: one row per KEPT doc — (id, n_tok, tok_offset, seq_id,
    seq_pos, n_seqs, shard). Shuffle budget: curate's content-hash exchange
    + packing's ordered range buckets; shard assignment is a zero-shuffle
    map over seq_id. Every column is integer and reproducible in SQL (see
    the `training_export` oracle)."""
    from ..functions.packing import pack_sequences

    audit = curate_documents(
        docs, bench, text_col=text_col, id_col=id_col,
        min_tokens=min_tokens, ngram_n=ngram_n,
        sample_fraction=sample_fraction, seed=sample_seed,
        num_partitions=num_partitions, keep_text=True)

    def kept_only(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.equal(t["keep"], True)) \
            .select([id_col, text_col])

    kept_only.__name__ = "kept_docs"
    kept = audit.map_batches(kept_only, batch_format="pyarrow")
    packed = pack_sequences(kept, text_col, id_col, seq_len=seq_len)

    def add_shard(t: pa.Table) -> pa.Table:
        sid = t["seq_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sh = rank_hash(sid, shard_seed) % np.uint32(max(n_shards, 1))
        return t.append_column("shard", pa.array(sh.astype(np.int64)))

    add_shard.__name__ = "add_shard"
    return packed.map_batches(add_shard, batch_format="pyarrow")
