"""Sequence packing for LM training: concat-and-chunk token layout.

No reference analog (named by the task brief's training-data family). The
standard "concatenate every document's token stream in a fixed order and
slice into length-L training sequences" layout (as used by GPT-2/3-style
pre-training, published in those papers' data sections) needs one global
exclusive prefix sum over per-document token counts — the classic
distributed-scan shape:

1. one ``map_batches`` pass computes per-doc token counts and an ORDERED
   range bucket (``doc_id // bucket_width`` — order-preserving by
   construction, no sort or sample needed);
2. per-bucket totals are a tiny aggregate (one int per bucket) — only that
   crosses to the driver, where the exclusive scan over bucket totals runs
   (at 100 TB: #buckets values, not #docs);
3. bucket base offsets are broadcast back (``ray.put``) and a per-bucket
   ``map_groups`` assigns within-bucket cumulative offsets vectorized.

Output per doc: ``n_tok``, ``tok_offset`` (global start position in the
concatenated stream), ``seq_id`` (= tok_offset // L), ``seq_pos``
(= tok_offset % L) and ``n_seqs`` (how many training sequences the doc
spans — >1 when it crosses a chunk boundary).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

_WORD_RE = re.compile(r"[a-z0-9]+")


class _CountTokens:
    """doc → (id, n_tok). Token count = ASCII word count (parity with the
    DuckDB oracle); swap in a real tokenizer via `count_fn`."""

    def __init__(self, text_col: str, id_col: str, count_fn=None):
        self.__name__ = type(self).__name__
        self.text_col, self.id_col = text_col, id_col
        self.count_fn = count_fn

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[self.text_col].fillna("")
        if self.count_fn is not None:
            n = t.map(self.count_fn).to_numpy(dtype=np.int64)
        else:
            n = t.str.lower().str.count(_WORD_RE.pattern) \
                .to_numpy(dtype=np.int64)
        return pd.DataFrame({
            self.id_col: batch[self.id_col].to_numpy(dtype=np.int64),
            "n_tok": n,
        })


def pack_sequences(ds: ray.data.Dataset, text_col: str, id_col: str,
                   seq_len: int = 2048, n_buckets: int | None = None,
                   count_fn=None) -> ray.data.Dataset:
    """Assign every document its slot in the concat-and-chunk training
    layout (see module docstring). Documents are concatenated in ``id_col``
    order; ``seq_len`` is the training sequence length L. ``n_buckets``
    defaults to a byte-based auto size so one bucket's counts stay within
    a worker heap at any corpus size."""
    from ..util import auto_partitions

    # materialize the tiny (id, n_tok) table once — 16 bytes/doc in the
    # object store — instead of re-scanning the text for each consumer
    counts = ds.map_batches(
        _CountTokens(text_col, id_col, count_fn=count_fn),
        batch_format="pandas").materialize()
    if n_buckets is None:
        n_buckets = auto_partitions(counts, target_bytes=64 << 20)

    # order-preserving bucket width from the id range (parquet stats would
    # give min/max for free; here one cheap agg over the materialized counts)
    hi, lo = int(counts.max(id_col)), int(counts.min(id_col))
    width = max(1, (hi - lo + n_buckets) // n_buckets)

    def addbucket(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("_bucket", pa.array(ids // width))

    addbucket.__name__ = "add_bucket"
    counts = counts.map_batches(addbucket, batch_format="pyarrow")

    totals = counts.groupby("_bucket").sum("n_tok").to_pandas()
    totals = totals.sort_values("_bucket").reset_index(drop=True)
    base = np.concatenate(
        [[0], np.cumsum(totals["sum(n_tok)"].to_numpy())[:-1]])
    base_ref = ray.put(dict(zip(totals["_bucket"].astype(np.int64),
                                base.astype(np.int64))))

    L = int(seq_len)

    class _Assign:
        """Holds only the broadcast ref; the bucket-base dict is fetched
        from the object store inside the task (once per worker process)."""

        def __init__(self, ref):
            self.__name__ = "AssignOffsets"
            self.ref = ref
            self.base = None

        def __call__(self, pdf: pd.DataFrame) -> pd.DataFrame:
            if self.base is None:
                self.base = ray.get(self.ref)
            pdf = pdf.sort_values(id_col, kind="stable").reset_index(drop=True)
            n = pdf["n_tok"].to_numpy(dtype=np.int64)
            b = int(pdf["_bucket"].iloc[0])
            off = self.base[b] + np.concatenate([[0], np.cumsum(n)[:-1]])
            end = off + np.maximum(n, 1) - 1  # last token's position
            seq_id = off // L
            return pd.DataFrame({
                id_col: pdf[id_col],
                "n_tok": n,
                "tok_offset": off,
                "seq_id": seq_id,
                "seq_pos": off % L,
                "n_seqs": (end // L) - seq_id + 1,
            })

    return counts.groupby("_bucket").map_groups(_Assign(base_ref),
                                                batch_format="pandas")
