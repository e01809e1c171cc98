"""Deterministic sampling & mixture operators for training-data curation.

No reference analog (named by the task brief's training-data family). Three
ops, all keyed by a seeded rank hash (the murmur3 fmix32 finalizer — public
domain constants) chosen because it is BOTH numpy-vectorizable and exactly
expressible in ANSI-ish SQL (``rank_hash_sql`` emits the DuckDB form), so
every sampling decision is reproducible row-for-row by an oracle:

- ``hash_sample``: Bernoulli-by-hash (keep iff rank < fraction·2^32). A pure
  ``map_batches`` filter — no shuffle, stable under re-runs and resharding.
- ``stratified_sample``: per-group fractions (e.g. per language), same
  zero-shuffle filter with a per-row threshold lookup.
- ``budget_sample``: per-group weight budget (e.g. N chars/tokens per
  source), taking rows in rank order until the budget fills — the standard
  "data mixture" draw. Distributed via rank-range buckets: a tiny
  (group × bucket) weight aggregate goes to the driver, which classifies
  whole buckets as accept/reject and isolates the ONE boundary bucket per
  group; only boundary rows (≈ group_count × rows/bucket) take a shuffle
  for the exact within-bucket scan. At 100 TB nothing per-row ever reaches
  the driver.
"""

from __future__ import annotations

from typing import Mapping, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

_TWO32 = 4294967296
# sentinel plan key for the null stratum in budget_sample (a null group
# is a real partition under SQL `partition by g` semantics)
_NULL_GROUP = ("__null_group__",)


def rank_hash(ids: np.ndarray, seed: int = 0) -> np.ndarray:
    """Seeded 32-bit rank hash (murmur3 fmix32 finalizer) of int ids,
    folded from 64 bits. Returns uint32."""
    ids = ids.astype(np.uint64)
    h = (ids & np.uint64(0xFFFFFFFF)).astype(np.uint32) \
        ^ (ids >> np.uint64(32)).astype(np.uint32) ^ np.uint32(seed)
    with np.errstate(over="ignore"):
        h = h ^ (h >> np.uint32(16))
        h = h * np.uint32(0x85EBCA6B)
        h = h ^ (h >> np.uint32(13))
        h = h * np.uint32(0xC2B2AE35)
        h = h ^ (h >> np.uint32(16))
    return h


def rank_hash_sql(col: str, seed: int = 0) -> str:
    """The exact DuckDB expression for ``rank_hash`` (bit-identical), for
    SQL oracles / external validation."""
    h0 = (f"xor(xor(cast({col} as hugeint) % 4294967296, "
          f"cast({col} as hugeint) // 4294967296), {seed})")
    a = f"xor({h0}, ({h0}) // 65536)"
    b = f"((({a}) * 2246822507) % 4294967296)"          # 0x85EBCA6B
    c = f"xor({b}, ({b}) // 8192)"
    d = f"((({c}) * 3266489909) % 4294967296)"          # 0xC2B2AE35
    return f"xor({d}, ({d}) // 65536)"


def hash_sample(ds: ray.data.Dataset, id_col: str, fraction: float,
                seed: int = 0) -> ray.data.Dataset:
    """Keep a deterministic ``fraction`` of rows: rank_hash(id) <
    fraction·2^32. Zero-shuffle, rerun-stable, shard-independent."""
    thr = np.uint64(int(fraction * _TWO32))

    def f(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = rank_hash(ids, seed).astype(np.uint64) < thr
        return t.filter(pa.array(keep))

    f.__name__ = "hash_sample"
    return ds.map_batches(f, batch_format="pyarrow")


def stratified_sample(ds: ray.data.Dataset, id_col: str, group_col: str,
                      fractions: Mapping[str, float],
                      default_fraction: float = 0.0,
                      seed: int = 0) -> ray.data.Dataset:
    """Per-group Bernoulli-by-hash (e.g. keep 50% of 'en', 10% of the
    rest). Zero-shuffle like hash_sample."""
    thr = {g: np.uint64(int(f * _TWO32)) for g, f in fractions.items()}
    dthr = np.uint64(int(default_fraction * _TWO32))

    def f(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # use_na_sentinel=False: null groups get their own code (the
        # default -1 sentinel would index the LAST group's threshold)
        codes, uniq = pd.factorize(pd.Series(t[group_col].to_pandas()),
                                   use_na_sentinel=False)
        lut = np.array([dthr if u is None or (isinstance(u, float)
                                              and np.isnan(u))
                        else thr.get(u, dthr) for u in uniq],
                       dtype=np.uint64)
        keep = rank_hash(ids, seed).astype(np.uint64) < lut[codes]
        return t.filter(pa.array(keep))

    f.__name__ = "stratified_sample"
    return ds.map_batches(f, batch_format="pyarrow")


def budget_sample(ds: ray.data.Dataset, id_col: str, group_col: str,
                  weight_col: str,
                  budgets: Optional[Mapping[str, int]] = None,
                  default_budget: int = 0, seed: int = 0,
                  rank_bucket_bits: int = 22) -> ray.data.Dataset:
    """Per-group weight-budget draw in rank order (see module docstring).

    A row is kept iff the exclusive running weight sum of its group —
    ordered by (rank_hash(id), id) — is < the group's budget. Equivalent
    SQL: ``sum(w) over (partition by g order by h, id rows between
    unbounded preceding and 1 preceding) < budget``."""
    budgets = dict(budgets or {})
    shift = np.uint32(rank_bucket_bits)
    from ..util import dataset_schema

    gtype = dataset_schema(ds).field(group_col).type

    def canon_g(vals) -> list:
        """Group values as python scalars of the DECLARED type: a
        null-bearing block's to_pandas promotes int→float, and '5.0' vs
        '5' would split one group's plan/boundary keys across blocks."""
        return pa.array(pd.Series(list(vals)), type=gtype,
                        from_pandas=True).to_pylist()

    def add_rank(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = rank_hash(ids, seed)
        t = t.append_column("_h", pa.array(h.astype(np.int64)))
        return t.append_column("_rb", pa.array((h >> shift).astype(np.int64)))

    add_rank.__name__ = "add_rank"
    # 16 bytes/row extra; materialized so the bucket aggregate and the
    # final filter don't recompute the upstream pipeline
    ranked = ds.map_batches(add_rank, batch_format="pyarrow").materialize()

    # tiny aggregate: (group, rank-bucket) weight sums → per-block partial
    # (combiner) then a driver-side combine of the small partial stream.
    # NOT Ray-native groupby: its sort comparator crashes on a null-bearing
    # group column ('<' between None and str), and the null group is a
    # legitimate stratum here.
    def bucket_partial(t: pa.Table) -> pd.DataFrame:
        pdf = t.select([group_col, "_rb", weight_col]).to_pandas()
        pdf[group_col] = canon_g(pdf[group_col])
        return pdf.groupby([group_col, "_rb"], dropna=False, sort=False,
                           as_index=False)[weight_col].sum()

    bucket_partial.__name__ = "bucket_partial"
    parts_df = ranked.map_batches(bucket_partial,
                                  batch_format="pyarrow").to_pandas()
    # re-canonicalize: the partial's python scalars crossed an Arrow
    # round trip on the way to the driver (None re-promotes int groups)
    parts_df[group_col] = canon_g(parts_df[group_col])
    tot = parts_df.groupby([group_col, "_rb"], dropna=False, sort=False,
                           as_index=False)[weight_col].sum()
    wcol = weight_col
    plan: dict = {}
    # dropna=False: a null group is its own stratum and draws the default
    # budget (matching the documented SQL `partition by g` semantics, where
    # nulls form one partition) instead of being silently dropped
    for g, sub in tot.groupby(group_col, sort=False, dropna=False):
        if g is None or (isinstance(g, float) and np.isnan(g)):
            g = _NULL_GROUP
        budget = int(budgets.get(g, default_budget))
        sub = sub.sort_values("_rb")
        w = sub[wcol].to_numpy(dtype=np.int64)
        cum_excl = np.concatenate([[0], np.cumsum(w)[:-1]])
        full = cum_excl + w <= budget
        # boundary = first bucket whose rows straddle the budget cut
        over = ~full
        if over.any():
            bi = int(np.argmax(over))
            boundary_rb = int(sub["_rb"].iloc[bi])
            boundary_base = int(cum_excl[bi])
            accept_below = boundary_rb
        else:
            boundary_rb, boundary_base = -1, 0
            accept_below = np.iinfo(np.int64).max
        plan[g] = (accept_below, boundary_rb, boundary_base, budget)
    plan_ref = ray.put(plan)

    class _Classify:
        """accept whole buckets below the boundary; pass boundary rows
        through tagged for the exact scan; drop the rest."""

        def __init__(self, ref, boundary: bool):
            self.__name__ = "BoundaryRows" if boundary else "AcceptedRows"
            self.ref = ref
            self.boundary = boundary
            self.plan = None

        def __call__(self, t: pa.Table) -> pa.Table:
            if self.plan is None:
                self.plan = ray.get(self.ref)
            rb = t["_rb"].to_numpy(zero_copy_only=False)
            codes, uniq = pd.factorize(pd.Series(t[group_col].to_pandas()),
                                       use_na_sentinel=False)
            uniq = canon_g(uniq)  # declared-type scalars ('5', never '5.0')
            per = [self.plan.get(_NULL_GROUP, (-1, -1, 0, 0))
                   if u is None
                   else self.plan.get(u, (-1, -1, 0, 0)) for u in uniq]
            below = np.array([p[0] for p in per], dtype=np.int64)[codes]
            bnd = np.array([p[1] for p in per], dtype=np.int64)[codes]
            mask = (rb == bnd) if self.boundary else (rb < below)
            t = t.filter(pa.array(mask))
            if self.boundary:
                # null-safe group key for the boundary exchange (Ray-native
                # groupby cannot sort a null-bearing column)
                gk = np.array(["\x00<null>" if u is None
                               else f"g:{u}" for u in uniq], dtype=object)
                kept = codes[np.asarray(mask)]
                t = t.append_column("_gk", pa.array(gk[kept].tolist(),
                                                    type=pa.string()))
            return t

    accepted = ranked.map_batches(_Classify(plan_ref, boundary=False),
                                  batch_format="pyarrow") \
        .drop_columns(["_h", "_rb"])

    class _ExactScan:
        def __init__(self, ref):
            self.__name__ = "BoundaryExactScan"
            self.ref = ref
            self.plan = None

        def __call__(self, pdf: pd.DataFrame) -> pd.DataFrame:
            if self.plan is None:
                self.plan = ray.get(self.ref)
            g = canon_g([pdf[group_col].iloc[0]])[0]
            if g is None:
                g = _NULL_GROUP
            _, _, base, budget = self.plan[g]
            pdf = pdf.sort_values(["_h", id_col], kind="stable") \
                .reset_index(drop=True)
            w = pdf[weight_col].to_numpy(dtype=np.int64)
            cum_excl = base + np.concatenate([[0], np.cumsum(w)[:-1]])
            return pdf[cum_excl < budget].drop(columns=["_h", "_rb", "_gk"])

    boundary = ranked.map_batches(_Classify(plan_ref, boundary=True),
                                  batch_format="pyarrow") \
        .groupby("_gk").map_groups(_ExactScan(plan_ref),
                                   batch_format="pandas")
    return accepted.union(boundary)


def shuffle_export(ds: ray.data.Dataset, id_col: str, n_shards: int,
                   seed: int = 0) -> ray.data.Dataset:
    """Deterministic global shuffle for a training-data export: every row
    gets shard = rank_hash(id, seed) % n_shards and a dense position within
    its shard ordered by (rank_hash, id). Reproducible run-to-run and
    independent of input partitioning — re-running after adding data moves
    only the affected positions, and the oracle can replay the exact order.

    Shape: one zero-shuffle map adds (shard, rank); ONE exchange
    co-partitions by shard; positions come from a per-shard in-partition
    sort. Consumers stream shards straight to `write_partitioned(...,
    by=["shard"])`."""

    def add_shard(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        r = rank_hash(ids, seed)
        t = t.append_column("rank", pa.array(r.astype(np.int64)))
        return t.append_column(
            "shard", pa.array((r % np.uint32(n_shards)).astype(np.int64)))

    add_shard.__name__ = "add_shard"

    def order_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        # a hash partition may hold several shards — position is per shard
        pdf = pdf.sort_values(["shard", "rank", id_col], kind="mergesort")
        pdf["pos"] = pdf.groupby("shard", sort=False).cumcount() \
            .to_numpy(dtype=np.int64)
        return pdf.drop(columns=["_part"])

    order_shard.__name__ = "order_shard"
    from .dedup import _partition_by_hash
    tagged = ds.map_batches(add_shard, batch_format="pyarrow")
    return _partition_by_hash(tagged, ["shard"], max(n_shards, 1)) \
        .groupby("_part").map_groups(order_shard, batch_format="pandas")
