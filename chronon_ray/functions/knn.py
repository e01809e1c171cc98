"""Similarity search over an embedding column: brute-force cosine top-k and
an IVF (inverted-file) clustered variant for scale.

Pattern: the query matrix is tiny relative to the corpus — broadcast it once
with `ray.put`, stream the corpus through `map_batches` computing a per-batch
top-k (numpy matmul), then reduce the (batches × queries × k) candidate set —
small by construction — with one groupby to the global top-k. The corpus is
never collected; only candidates move.

IVF: centroids are learned driver-side from a bounded sample (classic
Lloyd/k-means, a few iterations), the corpus is assigned to its nearest
centroid in one map_batches, and each query probes the nprobe nearest
centroid groups only.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


class _BatchTopK:
    """Per-batch cosine top-k against the broadcast query matrix."""

    def __init__(self, query_ref, emb_col: str, id_col: str, k: int):
        self.query_ref = query_ref
        self.emb_col, self.id_col, self.k = emb_col, id_col, k
        self._q = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._q is None:
            qids, qm = ray.get(self.query_ref)
            self._q = (np.asarray(qids), _normalize(np.asarray(qm)))
        qids, qm = self._q
        emb = _normalize(np.stack(batch[self.emb_col].to_pandas().to_numpy()))
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        sim = qm @ emb.T  # (Q, B)
        k = min(self.k, sim.shape[1])
        top = np.argpartition(-sim, kth=k - 1, axis=1)[:, :k]
        rows_q = np.repeat(qids, k)
        flat = top.reshape(-1)
        return pa.table({
            "query_id": pa.array(rows_q),
            "neighbor_id": pa.array(ids[flat]),
            "score": pa.array(np.take_along_axis(sim, top, axis=1).reshape(-1)),
        })


class _FinalTopK:
    """Per-query global top-k over one hash partition of candidates —
    vectorized pandas groupby.head, no per-query UDF dispatch."""

    def __init__(self, k: int):
        self.__name__ = "FinalTopK"
        self.k = k

    def __call__(self, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["query_id", "score", "neighbor_id"],
                              ascending=[True, False, True], kind="stable")
        pdf = pdf.groupby("query_id", sort=False).head(self.k).copy()
        pdf["rank"] = (pdf.groupby("query_id", sort=False).cumcount() + 1) \
            .astype(np.int64)
        return pdf.drop(columns=[c for c in ("_part",) if c in pdf.columns])


def _per_query_topk(cands: ray.data.Dataset, k: int,
                    num_partitions: int = 32) -> ray.data.Dataset:
    """Reduce (query_id, neighbor_id, score) candidates to the global top-k
    per query: hash-partition queries (bounded group count — a groupby over
    every query_id would pay a per-group dispatch), then one vectorized pass
    per partition."""

    def addp(t: pa.Table) -> pa.Table:
        q = t["query_id"].to_pandas()
        h = pd.util.hash_pandas_object(q, index=False).to_numpy()
        return t.append_column(
            "_part", pa.array((h % num_partitions).astype(np.int64)))

    addp.__name__ = "add_qpart"
    return cands.map_batches(addp, batch_format="pyarrow") \
        .groupby("_part").map_groups(_FinalTopK(k), batch_format="pandas")


def brute_force_knn(
    corpus: ray.data.Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
) -> ray.data.Dataset:
    """(query_id, neighbor_id, score, rank) — exact cosine top-k."""
    ref = ray.put((query_ids, query_matrix))
    cands = corpus.map_batches(
        _BatchTopK(ref, emb_col, id_col, k), batch_format="pyarrow",
        batch_size=4096)
    return _per_query_topk(cands, k)


# ------------------------------------------------------------------ IVF


def _kmeans(sample: np.ndarray, n_clusters: int, iters: int = 8,
            seed: int = 11) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    idx = rng.choice(len(sample), size=min(n_clusters, len(sample)), replace=False)
    cent = sample[idx].copy()
    for _ in range(iters):
        d = sample @ cent.T
        assign = d.argmax(axis=1)
        for c in range(len(cent)):
            m = sample[assign == c]
            if len(m):
                cent[c] = _normalize(m.mean(axis=0, keepdims=True))[0]
    return cent


def build_ivf(corpus: ray.data.Dataset, emb_col: str = "embedding",
              id_col: str = "vec_id", n_clusters: int = 16,
              sample_limit: int = 20_000, sub_shards: int = 1):
    """Learn centroids from a bounded sample; return (centroids, assigned_ds)
    where assigned_ds has `_cluster` (and `_sub`) columns.

    ``sub_shards`` splits each cluster into hash sub-shards so no single
    `map_groups` task holds a whole (possibly skewed) cluster — the final
    per-query top-k reduce merges sub-shard candidates, so results are
    unchanged. At scale pick sub_shards ≈ cluster_rows / target_rows."""
    sample = corpus.limit(sample_limit).to_pandas()
    m = _normalize(np.stack(sample[emb_col].to_numpy()))
    cent = _kmeans(m, n_clusters)
    ref = ray.put(cent)

    class Assign:
        def __init__(self):
            self._c = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self._c is None:
                self._c = ray.get(ref)
            emb = _normalize(np.stack(batch[emb_col].to_pandas().to_numpy()))
            cl = (emb @ self._c.T).argmax(axis=1)
            batch = batch.append_column("_cluster", pa.array(cl.astype(np.int64)))
            ids = batch[id_col].to_pandas()
            sub = (pd.util.hash_pandas_object(ids, index=False).to_numpy()
                   % np.uint64(max(sub_shards, 1))).astype(np.int64)
            return batch.append_column("_sub", pa.array(sub))

    assigned = corpus.map_batches(Assign, batch_format="pyarrow", concurrency=2)
    return cent, assigned


def ivf_knn(
    assigned: ray.data.Dataset,
    centroids: np.ndarray,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    nprobe: int = 4,
) -> ray.data.Dataset:
    """Approximate top-k probing only the nprobe nearest centroid groups per
    query. The scale path: corpus work is proportional to probed clusters."""
    qm = _normalize(np.asarray(query_matrix))
    probe = (qm @ centroids.T).argsort(axis=1)[:, ::-1][:, :nprobe]
    # query q participates in clusters probe[q]; broadcast per-cluster queries
    cluster_queries: dict[int, list[int]] = {}
    for qi, clusters in enumerate(probe):
        for c in clusters:
            cluster_queries.setdefault(int(c), []).append(qi)
    ref = ray.put((np.asarray(query_ids), qm, cluster_queries))

    class ClusterTopK:
        __name__ = "ClusterTopK"

        def __init__(self):
            self._q = None

        def __call__(self, pdf: pd.DataFrame) -> pd.DataFrame:
            if self._q is None:
                self._q = ray.get(ref)
            qids, qm_, cq = self._q
            c = int(pdf["_cluster"].iloc[0])
            sel = cq.get(c, [])
            if not sel:
                return pd.DataFrame({"query_id": [], "neighbor_id": [], "score": []})
            emb = _normalize(np.stack(pdf[emb_col].to_numpy()))
            ids = pdf[id_col].to_numpy()
            sim = qm_[sel] @ emb.T
            kk = min(k, sim.shape[1])
            top = np.argpartition(-sim, kth=kk - 1, axis=1)[:, :kk]
            return pd.DataFrame({
                "query_id": np.repeat(qids[sel], kk),
                "neighbor_id": ids[top.reshape(-1)],
                "score": np.take_along_axis(sim, top, axis=1).reshape(-1),
            })

    group_keys = ["_cluster", "_sub"] if "_sub" in assigned.schema().names \
        else ["_cluster"]
    cands = assigned.groupby(group_keys).map_groups(ClusterTopK(),
                                                    batch_format="pandas")
    return _per_query_topk(cands, k)
