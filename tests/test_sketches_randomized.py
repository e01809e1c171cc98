"""Randomized property suite for the sketch IRs (HLL++, KLL, Misra-Gries).

Class-level invariants under random data, random split shapes and random
merge trees — the exact properties the distributed IR shuffle relies on —
plus a pipeline-level layout-determinism check for the HLL path.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from chronon_ray.aggregators.sketches import HLL, KLL, MG


def _random_merge_tree(rng, states, merge):
    states = list(states)
    while len(states) > 1:
        i = int(rng.integers(0, len(states) - 1))
        a = states.pop(i)
        b = states.pop(int(rng.integers(0, len(states))))
        states.append(merge(a, b))
    return states[0]


@pytest.mark.parametrize("seed", [601, 602, 603, 604])
def test_hll_split_and_merge_order_invariant(seed):
    """HLL is register-max: ANY split of the value stream into chunks and
    ANY merge tree must give the exact same estimate as one-shot update —
    the invariant the IR shuffle relies on. Sparse→dense transitions are
    exercised by spanning cardinalities around 2^lgk."""
    rng = np.random.default_rng(seed)
    n_distinct = int(rng.choice([10, 200, 400, 5000]))
    lgk = 8
    vals = rng.integers(0, n_distinct, size=4 * n_distinct) \
        .astype(np.int64)
    one = HLL.update_many(HLL.empty(lgk), vals)
    e_one = HLL.estimate(one)

    for _ in range(3):
        n_chunks = int(rng.integers(2, 9))
        bounds = np.sort(rng.choice(np.arange(1, len(vals)),
                                    size=n_chunks - 1, replace=False))
        states = [HLL.update_many(HLL.empty(lgk), c)
                  for c in np.split(vals, bounds)]
        merged = _random_merge_tree(rng, states, HLL.merge)
        assert HLL.estimate(merged) == e_one, (seed, n_chunks)

    # accuracy: sparse regime exact, dense within ~3 sigma (1.04/sqrt(m))
    exact = len(np.unique(vals))
    if exact <= (1 << lgk):
        assert e_one == exact, seed
    else:
        assert abs(e_one - exact) / exact < 3 * 1.04 / np.sqrt(1 << lgk), \
            (seed, e_one, exact)

    # serialization round-trips bit-exactly
    back = HLL.deserialize(HLL.serialize(merged))
    assert HLL.estimate(back) == e_one


@pytest.mark.parametrize("seed", [611, 612, 613])
def test_kll_rank_error_bound(seed):
    """Split+merged KLL quantile estimates stay within rank error ~O(1/k)
    of the true quantile (checked as a rank deviation, not a value
    deviation — heavy-tailed values make value deltas meaningless)."""
    rng = np.random.default_rng(seed)
    n = int(rng.choice([1000, 20000]))
    dist = rng.choice(["uniform", "lognormal", "discrete"])
    if dist == "uniform":
        vals = rng.random(n)
    elif dist == "lognormal":
        vals = rng.lognormal(0, 2, size=n)
    else:
        vals = rng.integers(0, 50, size=n).astype(np.float64)
    k = 128
    n_chunks = int(rng.integers(1, 8))
    if n_chunks == 1:
        st = KLL.update_many(KLL.empty(k), vals)
    else:
        bounds = np.sort(rng.choice(np.arange(1, n), size=n_chunks - 1,
                                    replace=False))
        states = [KLL.update_many(KLL.empty(k), c)
                  for c in np.split(vals, bounds)]
        st = _random_merge_tree(rng, states, KLL.merge)

    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    est = KLL.quantiles(st, qs)
    svals = np.sort(vals)
    for q, e in zip(qs, est):
        # rank of the estimate within the true data
        r = np.searchsorted(svals, e, side="right") / n
        assert abs(r - q) < 0.08, (seed, dist, q, e, r)

    back = KLL.deserialize(KLL.serialize(st))
    np.testing.assert_array_equal(KLL.quantiles(back, qs), est)


def _mg_update_stream(state, vals, k):
    for v in vals:
        state = MG.update(state, v, k)
    return state


@pytest.mark.parametrize("seed", [621, 622, 623])
def test_mg_error_bounds_and_exact_regime(seed):
    """Misra-Gries: the stored count never exceeds the true count, the
    estimate (cnt + err) is an upper bound, and its slack is bounded by
    the state's global offset. Exact tier when cardinality ≤ k. Random
    split + merge trees must obey the same bounds."""
    rng = np.random.default_rng(seed)
    k = 8
    card = int(rng.choice([6, 40, 300]))
    raw = rng.zipf(1.5, size=3000)  # skew → real heavy hitters
    vals = [str(v % card) for v in raw]
    truth = pd.Series(vals).value_counts().to_dict()

    n_chunks = int(rng.integers(1, 7))
    if n_chunks == 1:
        st = _mg_update_stream(MG.empty(), vals, k)
    else:
        bounds = np.sort(rng.choice(np.arange(1, len(vals)),
                                    size=n_chunks - 1, replace=False))
        states = [_mg_update_stream(MG.empty(), c, k)
                  for c in np.split(np.array(vals, dtype=object), bounds)]
        st = _random_merge_tree(rng, states,
                                lambda a, b: MG.merge(a, b, k))

    if card <= k:
        assert st[0] == "E", (seed, st[0])
        assert st[1] == truth, seed
    else:
        assert st[0] == "A", seed
        _, d, off = st
        assert len(d) <= MG.cap_for(k), (seed, len(d))
        for v, (c, e) in d.items():
            t = truth.get(v, 0)
            assert c <= t, (seed, v, c, t)
            assert c + e >= t, (seed, v, c, e, t)
            assert e <= off, (seed, v, e, off)


def test_mg_update_and_merge_copy_on_write():
    """MG.update/merge must not mutate input states (hop IRs are shared
    across windows; merge-then-update without a clone must stay safe)."""
    import copy

    k = 2
    a = _mg_update_stream(MG.empty(), ["a", "a", "b", "c", "d"], k)
    b = _mg_update_stream(MG.empty(), ["e", "f", "g", "a"], k)
    snap_a, snap_b = copy.deepcopy(a), copy.deepcopy(b)
    merged = MG.merge(a, b, k)
    assert a == snap_a and b == snap_b
    MG.update(merged, "zzz", k, times=5)
    MG.update(a, "yyy", k, times=3)
    assert a == snap_a and b == snap_b


@pytest.mark.parametrize("seed", [631])
def test_hll_pipeline_layout_determinism(ray_session, seed):
    """aggregate_snapshot APPROX_UNIQUE_COUNT must give identical results
    for ANY block layout of the same rows."""
    from chronon_ray.api import GroupByConf, agg
    from chronon_ray.pipelines.groupby import aggregate_snapshot

    rng = np.random.default_rng(seed)
    n = 3000
    t = pa.table({
        "k": pa.array(rng.integers(0, 5, size=n).astype(np.int64)),
        "v": pa.array(rng.integers(0, 800, size=n).astype(np.int64)),
    })
    conf = GroupByConf(name="u", sources=(), key_columns=("k",),
                       aggregations=(agg("v", "approx_unique_count"),))

    results = []
    for _ in range(3):
        perm = rng.permutation(n)
        tt = t.take(pa.array(perm))
        cuts = np.sort(rng.choice(np.arange(1, n), size=5, replace=False))
        ds = None
        for idx in np.split(np.arange(n), cuts):
            x = rd.from_arrow(tt.take(pa.array(idx)))
            ds = x if ds is None else ds.union(x)
        out = aggregate_snapshot(ds, conf, num_partitions=8).to_pandas() \
            .sort_values("k").reset_index(drop=True)
        results.append(out)
    for r in results[1:]:
        pd.testing.assert_frame_equal(results[0], r)
    # sparse-exact regime sanity: estimates equal true distinct when small
    truth = t.to_pandas().groupby("k")["v"].nunique()
    col = [c for c in results[0].columns if c != "k"][0]
    got = results[0].set_index("k")[col]
    for key in truth.index:
        if truth[key] <= 256:
            assert got[key] == truth[key], (key, got[key], truth[key])
