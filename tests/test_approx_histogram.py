"""APPROX_HISTOGRAM_K bounded heavy-hitter sketch (reference ApproxHistogram
hybrid — SimpleAggregators.scala:458-600): exact below k distinct, bounded
Misra-Gries summary beyond, heavy hitters always surface on skewed input."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from chronon_ray.aggregators.sketches import MG
from chronon_ray.api import GroupByConf, agg
from chronon_ray.pipelines.groupby import aggregate_snapshot


def test_mg_exact_regime_matches_counts():
    s = MG.empty()
    for v in ["a", "b", "a", "c", "a", "b"]:
        s = MG.update(s, v, k=8)
    assert s[0] == "E"
    assert MG.finalize(s, 8) == [("a", 3), ("b", 2), ("c", 1)]


def test_mg_bounded_ir_on_high_cardinality():
    k = 16
    cap = MG.cap_for(k)
    s = MG.empty()
    rng = np.random.default_rng(0)
    # zipf-ish skew: few heavy values + a long unique tail
    for i in range(20_000):
        v = f"hot{i % 5}" if rng.random() < 0.5 else f"tail{i}"
        s = MG.update(s, v, k)
    assert s[0] == "A"
    assert len(s[1]) <= cap  # bounded regardless of ~10k distinct values
    top = dict(MG.finalize(s, k))
    for h in range(5):
        assert f"hot{h}" in top  # heavy hitters survive


def test_mg_merge_bounded_and_pure():
    k = 8
    cap = MG.cap_for(k)
    parts = []
    for p in range(10):
        s = MG.empty()
        for i in range(2000):
            v = "hot" if i % 3 == 0 else f"t{p}_{i}"
            s = MG.update(s, v, k)
        parts.append(s)
    import copy

    snapshot = copy.deepcopy(parts[0])
    merged = parts[0]
    for s in parts[1:]:
        merged = MG.merge(merged, s, k)
    assert merged[0] == "A" and len(merged[1]) <= cap
    # merge never mutates its inputs (hop IRs are shared across windows)
    assert parts[0] == snapshot
    est = dict(MG.finalize(merged, k))["hot"]
    true = 10 * len([i for i in range(2000) if i % 3 == 0])
    # MG estimate is an upper bound within true + n/cap-ish error
    assert est >= true
    assert est <= true + 20000 // (cap // 2)


def test_mg_estimate_error_bound():
    """Classic MG guarantee: est - true <= n / (cap - k') ~ n / cap."""
    k = 32
    cap = MG.cap_for(k)
    rng = np.random.default_rng(3)
    vals = [f"v{int(rng.zipf(1.5)) % 200}" for _ in range(30_000)]
    s = MG.empty()
    for v in vals:
        s = MG.update(s, v, k)
    true = pd.Series(vals).value_counts()
    for v, est in MG.finalize(s, k):
        assert est >= true[v]
        assert est - true[v] <= len(vals) // cap + 1


def test_approx_histogram_snapshot_exact_regime(ray_session):
    """Below k distinct the output equals the exact HISTOGRAM op."""
    rng = np.random.default_rng(1)
    df = pd.DataFrame({
        "user_id": rng.integers(0, 10, size=3000).astype(np.int64),
        "ts": np.arange(3000, dtype=np.int64),
        "et": rng.choice(["a", "b", "c", "d"], size=3000),
    })
    mk = lambda op: GroupByConf(  # noqa: E731
        name="h", sources=(), key_columns=("user_id",),
        aggregations=(agg("et", op, k=10),))
    ds = rd.from_pandas(df).repartition(8)
    approx = aggregate_snapshot(ds, mk("approx_histogram_k"),
                                num_partitions=4).to_pandas()
    exact = aggregate_snapshot(ds, mk("histogram"),
                               num_partitions=4).to_pandas()
    a = approx.set_index("user_id").sort_index()["et_approx_histogram_k"]
    e = exact.set_index("user_id").sort_index()["et_histogram"]
    for u in a.index:
        assert list(a[u]) == list(e[u])


def test_approx_histogram_temporal_window(ray_session):
    """Windowed as-of APPROX_HISTOGRAM_K flows through the sawtooth path
    (hop IRs + py merge) and surfaces heavy hitters."""
    from chronon_ray.api import window
    from chronon_ray.pipelines.temporal import temporal_join

    rng = np.random.default_rng(2)
    n = 5000
    base = pd.Timestamp("2024-03-01").value // 10**6
    ev = pd.DataFrame({
        "user_id": rng.integers(0, 5, size=n).astype(np.int64),
        "ts": np.sort(base + rng.integers(0, 10 * 86_400_000, size=n)),
        "et": np.where(rng.random(n) < 0.6, "hot",
                       [f"t{i}" for i in range(n)]),
    })
    q = pd.DataFrame({
        "user_id": np.arange(5, dtype=np.int64),
        "ts": np.full(5, base + 9 * 86_400_000, dtype=np.int64),
    })
    conf = GroupByConf(
        name="h", sources=(), key_columns=("user_id",),
        aggregations=(agg("et", "approx_histogram_k", [window(7, "d")], k=4),))
    out = temporal_join(rd.from_pandas(q), rd.from_pandas(ev), conf,
                        num_partitions=4).to_pandas()
    assert len(out) == 5
    for m in out["et_approx_histogram_k_7d"]:
        d = dict(m)
        assert "hot" in d and len(d) <= 4
