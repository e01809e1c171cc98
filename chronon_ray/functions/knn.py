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
        # drop parquet's `pandas` schema metadata: it makes hash(schema)
        # fail inside Ray's sort-reduce (worker-side "Failed to hash the
        # schemas" warning we cannot filter from here)
        return t.append_column(
            "_part", pa.array((h % num_partitions).astype(np.int64))) \
            .replace_schema_metadata(None)

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
            seed: int = 11, init: str = "random") -> np.ndarray:
    if init == "first":
        # deterministic seeding: the first k sample rows (callers that need
        # cross-engine reproducibility sort the sample by id first)
        cent = sample[:min(n_clusters, len(sample))].copy()
    else:
        rng = np.random.Generator(np.random.PCG64(seed))
        idx = rng.choice(len(sample), size=min(n_clusters, len(sample)),
                         replace=False)
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
            # metadata stripped: parquet's `pandas` blob breaks hash(schema)
            # in Ray's sort-reduce workers (noisy, unfilterable from here)
            return batch.append_column("_sub", pa.array(sub)) \
                .replace_schema_metadata(None)

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


# ----------------------------------------------------------------- HNSW


class _ShardHNSW:
    """Minimal in-memory HNSW (Malkov & Yashunin 2016, public algorithm)
    over unit-normalized vectors with cosine similarity.

    Pure numpy; neighbor expansion is vectorized per visited node. Built
    once per shard inside a map_groups task — the third ANN tier beside
    brute-force (exact) and IVF (clustered): graphs scale by sharding the
    corpus and merging per-shard candidates in the existing top-k reduce.
    """

    def __init__(self, vecs: np.ndarray, M: int = 16,
                 ef_construction: int = 100, seed: int = 7):
        self.v = vecs
        self.M = M
        self.M0 = 2 * M
        self.efC = ef_construction
        n = len(vecs)
        rng = np.random.Generator(np.random.PCG64(seed))
        mL = 1.0 / np.log(M)
        self.levels = np.floor(
            -np.log(rng.random(n) + 1e-300) * mL).astype(np.int64)
        self.max_level = int(self.levels.max(initial=0))
        # adjacency: per layer, list-of-int64-arrays
        self.adj: list[list[np.ndarray]] = [
            [None] * n for _ in range(self.max_level + 1)]
        self._visited = np.zeros(n, dtype=bool)
        self.entry = 0
        for i in range(n):
            self._insert(i)

    def _search_layer(self, q: np.ndarray, entry: int, ef: int,
                      layer: int) -> list[tuple[float, int]]:
        """Beam search; returns up to ef (sim, node) best, sim descending."""
        import heapq
        adj = self.adj[layer]
        sims = float(self.v[entry] @ q)
        visited = self._visited
        visited[:] = False
        visited[entry] = True
        # best: min-heap of (sim, node) holding the ef best so far
        best = [(sims, entry)]
        cand = [(-sims, entry)]  # max-heap by sim
        while cand:
            cs, cn = heapq.heappop(cand)
            if -cs < best[0][0] and len(best) >= ef:
                break
            nbrs = adj[cn]
            if nbrs is None or len(nbrs) == 0:
                continue
            new = nbrs[~visited[nbrs]]
            if len(new) == 0:
                continue
            visited[new] = True
            s = self.v[new] @ q
            floor = best[0][0] if len(best) >= ef else -np.inf
            ok = s > floor
            for sim, node in zip(s[ok].tolist(), new[ok].tolist()):
                if len(best) < ef or sim > best[0][0]:
                    heapq.heappush(best, (sim, node))
                    if len(best) > ef:
                        heapq.heappop(best)
                    heapq.heappush(cand, (-sim, node))
        return sorted(best, reverse=True)

    def _insert(self, i: int) -> None:
        if i == 0:
            for lvl in range(min(self.levels[0], self.max_level) + 1):
                self.adj[lvl][0] = np.empty(0, dtype=np.int64)
            self.entry = 0
            self._entry_level = int(self.levels[0])
            return
        q = self.v[i]
        lvl_i = int(self.levels[i])
        ep = self.entry
        # greedy descent through layers above lvl_i
        for lvl in range(self._entry_level, lvl_i, -1):
            ep = self._search_layer(q, ep, 1, lvl)[0][1]
        for lvl in range(min(lvl_i, self._entry_level), -1, -1):
            found = self._search_layer(q, ep, self.efC, lvl)
            mmax = self.M0 if lvl == 0 else self.M
            sel = np.array([n for _, n in found[:self.M]], dtype=np.int64)
            self.adj[lvl][i] = sel
            for n in sel:
                cur = self.adj[lvl][n]
                cur = np.append(cur, i) if cur is not None \
                    else np.array([i], dtype=np.int64)
                if len(cur) > mmax:  # prune to the mmax most similar
                    s = self.v[cur] @ self.v[n]
                    cur = cur[np.argsort(-s)[:mmax]]
                self.adj[lvl][n] = cur
            ep = found[0][1]
        if lvl_i > self._entry_level:
            for lvl in range(self._entry_level + 1, lvl_i + 1):
                if self.adj[lvl][i] is None:
                    self.adj[lvl][i] = np.empty(0, dtype=np.int64)
            self.entry = i
            self._entry_level = lvl_i

    def search(self, q: np.ndarray, k: int, ef: int) -> tuple[np.ndarray,
                                                              np.ndarray]:
        ep = self.entry
        for lvl in range(self._entry_level, 0, -1):
            ep = self._search_layer(q, ep, 1, lvl)[0][1]
        found = self._search_layer(q, ep, max(ef, k), 0)[:k]
        idx = np.array([n for _, n in found], dtype=np.int64)
        sims = np.array([s for s, _ in found], dtype=np.float64)
        return idx, sims


def hnsw_knn(
    corpus: ray.data.Dataset,
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    n_shards: int = 4,
    M: int = 16,
    ef_construction: int = 100,
    ef_search: int = 64,
) -> ray.data.Dataset:
    """Graph-ANN top-k: hash-shard the corpus, build one HNSW graph per
    shard (inside its map_groups task), beam-search every broadcast query
    against every shard, merge shards in the per-query top-k reduce.

    Scale: shard count bounds per-task memory (graph ~ rows × M × 8 B +
    vectors); query work is n_shards × log-ish per shard — for query sets
    large enough to dominate, prefer ivf_knn. ``ef_search >= shard rows``
    degenerates to an exact within-shard scan (graph recall caveats do not
    apply), which is the oracle mode — same trick as ivf_knn(nprobe=all).
    """
    qm = _normalize(np.asarray(query_matrix))
    ref = ray.put((np.asarray(query_ids), qm))
    nsh = np.uint64(max(n_shards, 1))

    def add_shard(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pandas()
        h = pd.util.hash_pandas_object(ids, index=False).to_numpy()
        return t.append_column("_shard",
                               pa.array((h % nsh).astype(np.int64))) \
            .replace_schema_metadata(None)

    add_shard.__name__ = "add_shard"

    class ShardSearch:
        __name__ = "HnswShardSearch"

        def __init__(self):
            self._q = None

        def __call__(self, pdf: pd.DataFrame) -> pd.DataFrame:
            if self._q is None:
                self._q = ray.get(ref)
            qids, qm_ = self._q
            # deterministic build order regardless of upstream partitioning
            pdf = pdf.sort_values(id_col, kind="stable").reset_index(drop=True)
            emb = _normalize(np.stack(pdf[emb_col].to_numpy()))
            ids = pdf[id_col].to_numpy()
            kk = min(k, len(ids))
            if ef_search >= len(ids):  # exact degenerate mode
                sim = qm_ @ emb.T
                top = np.argpartition(-sim, kth=kk - 1, axis=1)[:, :kk]
                return pd.DataFrame({
                    "query_id": np.repeat(qids, kk),
                    "neighbor_id": ids[top.reshape(-1)],
                    "score": np.take_along_axis(sim, top, axis=1).reshape(-1),
                })
            g = _ShardHNSW(emb, M=M, ef_construction=ef_construction)
            out_q, out_n, out_s = [], [], []
            for qi, qv in zip(qids, qm_):
                idx, sims = g.search(qv, kk, ef_search)
                out_q.append(np.repeat(qi, len(idx)))
                out_n.append(ids[idx])
                out_s.append(sims)
            return pd.DataFrame({
                "query_id": np.concatenate(out_q),
                "neighbor_id": np.concatenate(out_n),
                "score": np.concatenate(out_s),
            })

    cands = corpus.map_batches(add_shard, batch_format="pyarrow") \
        .groupby("_shard").map_groups(ShardSearch(), batch_format="pandas")
    return _per_query_topk(cands, k)


# ------------------------------------------------------------------- PQ


def _pq_kmeans(sample: np.ndarray, n_codes: int, iters: int = 10,
               seed: int = 13, init: str = "random") -> np.ndarray:
    """Euclidean k-means for a PQ sub-codebook (cosine kmeans above is for
    unit vectors; subvectors are not unit)."""
    if init == "first":
        # deterministic seeding: the first k sample rows (callers that need
        # cross-engine reproducibility sort the sample by id first)
        cent = sample[:min(n_codes, len(sample))].copy()
    else:
        rng = np.random.Generator(np.random.PCG64(seed))
        idx = rng.choice(len(sample), size=min(n_codes, len(sample)),
                         replace=False)
        cent = sample[idx].copy()
    for _ in range(iters):
        # ||x-c||^2 argmin == (-2 x.c + ||c||^2) argmin — avoids the
        # (n, k, dsub) difference tensor
        d = -2 * sample @ cent.T + (cent ** 2).sum(axis=1)[None, :]
        assign = d.argmin(axis=1)
        for c in range(len(cent)):
            m = sample[assign == c]
            if len(m):
                cent[c] = m.mean(axis=0)
    return cent


def build_pq(corpus: ray.data.Dataset, emb_col: str = "embedding",
             id_col: str = "vec_id", m: int = 8, n_codes: int = 256,
             sample_limit: int = 20_000, deterministic: bool = False):
    """Product-quantize the corpus: split the (normalized) embedding into m
    subspaces, learn a `n_codes`-entry codebook per subspace from a bounded
    sample, and encode every vector as m uint8 codes (~m bytes/vec vs
    4·dim — a 32× compression at dim=64, m=8). Returns (codebooks
    (m, n_codes, dsub), coded_ds with a `code` list<uint8> column).

    Scale shape: codebooks are driver-learned on the sample and broadcast;
    encoding is a zero-shuffle streaming map.

    ``deterministic=True`` makes the whole build engine-reproducible (the
    driver's SQL oracle replays it): the sample is the GLOBALLY first
    `sample_limit` rows by `id_col` (sort-then-limit — a bare limit() would
    make the codebook depend on Ray's block layout for corpora larger than
    the sample), all float work runs in float64, and each sub-codebook is
    seeded from the first `n_codes` sample subvectors with Lloyd refinement
    OFF — the codebook is then an exact slice of the input table (the
    global first `n_codes` ids, any corpus size), so encode + ADC are
    SQL-expressible. The refined (Lloyd) regime stays recall-pinned in
    pytest."""
    if deterministic:
        # materialize once: count() is metadata-only on parquet but would
        # EXECUTE a transformed pipeline, and the sample pull + Encode
        # scan would then re-execute it. Global first-`sample_limit` by
        # id; skip the all-to-all sort when the corpus fits the sample.
        corpus = corpus.materialize()
        if corpus.count() <= sample_limit:
            sample = corpus.to_pandas()
        else:
            sample = corpus.sort(id_col).limit(sample_limit).to_pandas()
        sample = sample.sort_values(id_col, kind="mergesort")
    else:
        sample = corpus.limit(sample_limit).to_pandas()
    x = np.stack(sample[emb_col].to_numpy())
    if deterministic:
        x = x.astype(np.float64)
    x = _normalize(x)
    dim = x.shape[1]
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    dsub = dim // m
    books = np.stack([
        _pq_kmeans(x[:, j * dsub:(j + 1) * dsub], n_codes, seed=13 + j,
                   iters=0 if deterministic else 10,
                   init="first" if deterministic else "random")
        for j in range(m)])
    ref = ray.put(books)

    class Encode:
        def __init__(self):
            self._b = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self._b is None:
                self._b = ray.get(ref)
            emb = np.stack(batch[emb_col].to_pandas().to_numpy())
            if deterministic:
                emb = emb.astype(np.float64)
            emb = _normalize(emb)
            n = len(emb)
            codes = np.empty((n, m), dtype=np.uint8)
            for j in range(m):
                sub = emb[:, j * dsub:(j + 1) * dsub]
                # ||x - c||² = ||x||² - 2x·c + ||c||² → argmin over codes
                d = (-2 * sub @ self._b[j].T
                     + (self._b[j] ** 2).sum(axis=1)[None, :])
                codes[:, j] = d.argmin(axis=1).astype(np.uint8)
            flat = codes.reshape(-1)
            offs = np.arange(0, (n + 1) * m, m, dtype=np.int32)
            col = pa.ListArray.from_arrays(pa.array(offs),
                                           pa.array(flat, type=pa.uint8()))
            return pa.table({id_col: batch[id_col], "code": col})

    coded = corpus.map_batches(Encode, batch_format="pyarrow",
                               concurrency=(1, 4))
    return books, coded


def pq_knn(coded: ray.data.Dataset, codebooks: np.ndarray,
           query_ids: np.ndarray, query_matrix: np.ndarray,
           id_col: str = "vec_id", k: int = 5) -> ray.data.Dataset:
    """Asymmetric-distance (ADC) top-k over PQ codes: per batch, one LUT
    of query·codeword inner products (nq, m, n_codes), then score =
    Σ_j LUT[q, j, code_j] — a gather-sum, no float reconstruction. The
    final exact top-k reduce is shared with the other ANN tiers."""
    m, n_codes, dsub = codebooks.shape
    qm = _normalize(np.asarray(query_matrix, dtype=np.float64))
    lut = np.einsum("qjd,jcd->qjc",
                    qm.reshape(len(qm), m, dsub), codebooks)
    ref = ray.put((np.asarray(query_ids), lut))

    class Scan:
        def __init__(self):
            self._q = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self._q is None:
                self._q = ray.get(ref)
            qids, lut = self._q
            codes = np.stack(batch["code"].to_pandas().to_numpy()) \
                .astype(np.int64)                      # (B, m)
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            nq = len(qids)
            # gather: scores[q, b] = sum_j lut[q, j, codes[b, j]]
            sim = np.zeros((nq, len(ids)))
            for j in range(lut.shape[1]):
                sim += lut[:, j, codes[:, j]]
            kk = min(k, sim.shape[1])
            top = np.argpartition(-sim, kth=kk - 1, axis=1)[:, :kk]
            flat = top.reshape(-1)
            return pa.table({
                "query_id": pa.array(np.repeat(qids, kk)),
                "neighbor_id": pa.array(ids[flat]),
                "score": pa.array(np.take_along_axis(sim, top, axis=1)
                                  .reshape(-1)),
            })

    cands = coded.map_batches(Scan, batch_format="pyarrow",
                              concurrency=(1, 4))
    return _per_query_topk(cands, k)
