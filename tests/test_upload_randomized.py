"""Randomized differential: checkpoint-and-serve vs direct temporal join.

groupby_upload + serve_with_events (FinalBatchIr checkpoint, lambda head
replay) and temporal_join (full-history sawtooth) are two INDEPENDENT
engine paths that must agree bit-for-bit on any query inside the serving
horizon. Seeded random scenarios rotate through the full op/feature
surface — windows (hours/days/unbounded), nulls, list inputs
(auto-explode), map inputs (per-key IR planes), bucketed parts — far
beyond the fixed fixture in test_upload.py. Event ts are unique per key
by construction (equal-ts tie conventions are covered by the dedicated
tie tests; without a tie_break two MISSING ties are arrival-order-
dependent by design)."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from chronon_ray.api import GroupByConf, UNBOUNDED, agg, window
from chronon_ray.pipelines.temporal import temporal_join
from chronon_ray.pipelines.upload import groupby_upload, serve_with_events

DAY = 86_400_000
BASE = pd.Timestamp("2024-03-01").value // 10**6

# (aggregation builder, needs) — rotated per seed
_OP_POOL = [
    lambda w: agg("value", "sum", w),
    lambda w: agg("value", "count", w),
    lambda w: agg("value", "average", w),
    lambda w: agg("value", "variance", w),
    lambda w: agg("value", "skew", w),
    lambda w: agg("value", "kurtosis", w),
    lambda w: agg("value", "min", w),
    lambda w: agg("value", "max", w),
    lambda w: agg("value", "last", w),
    lambda w: agg("value", "first", w),
    lambda w: agg("value", "last_k", w, k=3),
    lambda w: agg("value", "top_k", w, k=3),
    lambda w: agg("item", "unique_count", w),
    lambda w: agg("item", "approx_unique_count", w),
    lambda w: agg("item", "histogram", w),
    lambda w: agg("tokens", "unique_count", w),
    lambda w: agg("metrics", "sum", w),
    lambda w: agg("value", "sum", w, buckets=("store",)),
]
_WINDOW_POOL = [
    lambda: [UNBOUNDED],
    lambda: [window(7, "d")],
    lambda: [window(1, "d")],
    lambda: [window(12, "h")],
    lambda: [window(7, "d"), UNBOUNDED],
]


def _events(rng, n, keys, days):
    ts = BASE + rng.integers(0, days * DAY, size=n).astype(np.int64)
    key = rng.integers(0, keys, size=n).astype(np.int64)
    # unique ts per key: ties are covered by the dedicated tie tests
    df = pd.DataFrame({"user_id": key, "ts": ts})
    df = df.drop_duplicates(["user_id", "ts"]).reset_index(drop=True)
    n = len(df)
    val = np.round(rng.normal(10, 3, size=n), 3)
    val[rng.random(n) < 0.08] = np.nan
    df["value"] = val
    df["item"] = rng.integers(0, 40, size=n).astype(np.int64)
    df["store"] = np.array(["s1", "s2", "s3"])[rng.integers(0, 3, size=n)]
    df["tokens"] = [rng.integers(0, 30,
                                 size=rng.integers(0, 5)).tolist()
                    for _ in range(n)]
    df["metrics"] = [None if rng.random() < 0.15 else
                     {str(m): float(rng.integers(1, 50))
                      for m in rng.choice(["x", "y", "z"],
                                          size=int(rng.integers(1, 4)),
                                          replace=False)}
                     for _ in range(n)]
    return df


def _to_ds(df):
    mtype = pa.map_(pa.string(), pa.float64())
    t = pa.table({
        "user_id": pa.array(df["user_id"].to_numpy()),
        "ts": pa.array(df["ts"].to_numpy()),
        "value": pa.array(df["value"].to_numpy(), from_pandas=True),
        "item": pa.array(df["item"].to_numpy()),
        "store": pa.array(df["store"].tolist()),
        "tokens": pa.array(df["tokens"].tolist(),
                           type=pa.list_(pa.int64())),
        "metrics": pa.array(df["metrics"].tolist(), type=mtype),
    })
    return rd.from_arrow(t)


def _norm(v):
    """Normalize nested values (arrow map → dict, arrays → lists)."""
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, dict):
        return {str(k): _norm(x) for k, x in v.items()}
    if isinstance(v, (list, np.ndarray)):
        lst = list(v)
        if lst and isinstance(lst[0], tuple) and len(lst[0]) == 2:
            return {str(k): _norm(x) for k, x in lst}
        return [_norm(x) for x in lst]
    if isinstance(v, (np.floating, float)):
        return round(float(v), 9)
    if isinstance(v, np.integer):
        return int(v)
    return v


@pytest.mark.parametrize("seed", [81, 82, 83])
def test_rolling_checkpoint_randomized(ray_session, seed):
    """Full-hops checkpoint rolled forward day-by-day + served must equal
    the direct full-history join at every day — randomized op bundles
    (windows, lists, maps, buckets) over random event streams."""
    from chronon_ray.pipelines.upload import roll_checkpoint

    rng = np.random.default_rng(seed)
    ev = _events(rng, n=int(rng.integers(1500, 2500)),
                 keys=int(rng.integers(6, 15)), days=24)
    picks = rng.choice(len(_OP_POOL), size=5, replace=False)
    aggs = []
    for i in picks:
        w = _WINDOW_POOL[int(rng.integers(0, len(_WINDOW_POOL)))]()
        aggs.append(_OP_POOL[i](w))
    conf = GroupByConf(name=f"roll{seed}", sources=(),
                       key_columns=("user_id",), aggregations=tuple(aggs))
    from chronon_ray.pipelines.upload import groupby_upload
    end0 = ((BASE // DAY) + 20) * DAY
    ir = groupby_upload(_to_ds(ev[ev["ts"] < end0]), conf, end0,
                        num_partitions=4, full_hops=True)
    for d in range(1, 4):  # roll three days forward
        end = end0 + d * DAY
        ir = roll_checkpoint(ir, _to_ds(ev), conf, end - DAY, end,
                             num_partitions=4)
        nq = 120
        qts = end + rng.integers(0, DAY, size=nq)
        q = pd.DataFrame({
            "user_id": rng.integers(0, ev["user_id"].max() + 1,
                                    size=nq).astype(np.int64),
            "ts": qts.astype(np.int64)})
        head = _to_ds(ev[ev["ts"] >= end])
        served = serve_with_events(ir, head, rd.from_pandas(q), conf,
                                   end, num_partitions=4).to_pandas()
        direct = temporal_join(rd.from_pandas(q), _to_ds(ev), conf,
                               num_partitions=4).to_pandas()
        sort = ["user_id", "ts"]
        a = served.sort_values(sort).reset_index(drop=True)
        b = direct.sort_values(sort).reset_index(drop=True)
        assert len(a) == len(b) == nq, (seed, d)
        for c in b.columns:
            av, bv = a[c], b[c]
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                av, bv = av.astype(float), bv.astype(float)
                na, nb = av.isna(), bv.isna()
                assert (na == nb).all(), (seed, d, c)
                # skew/kurtosis: 3rd/4th-moment merges amplify order
                # rounding between both-correct paths (~5e-9 rel seen
                # on fresh seeds; driver tolerance is 1e-6)
                rt = 1e-7 if ("skew" in c or "kurtosis" in c) else 1e-9
                np.testing.assert_allclose(av[~na], bv[~nb], rtol=rt,
                                           atol=1e-9,
                                           err_msg=f"{seed}:d{d}:{c}")
            elif av.dtype == object or bv.dtype == object:
                for i, (x, y) in enumerate(zip(av, bv)):
                    assert _norm(x) == _norm(y), (seed, d, c, i, x, y)
            else:
                assert (av.fillna(-1) == bv.fillna(-1)).all(), (seed, d, c)


@pytest.mark.parametrize("seed", [11, 22, 33, 44, 55, 66])
def test_serve_equals_direct_randomized(ray_session, seed):
    rng = np.random.default_rng(seed)
    ev = _events(rng, n=int(rng.integers(1500, 3000)),
                 keys=int(rng.integers(8, 30)), days=30)
    picks = rng.choice(len(_OP_POOL), size=6, replace=False)
    aggs = []
    for i in picks:
        w = _WINDOW_POOL[int(rng.integers(0, len(_WINDOW_POOL)))]()
        aggs.append(_OP_POOL[i](w))
    conf = GroupByConf(name=f"up{seed}", sources=(),
                       key_columns=("user_id",), aggregations=tuple(aggs))
    batch_end = ((BASE // DAY) + 26) * DAY
    nq = 300
    qts = batch_end + rng.integers(0, 2 * DAY - 1, size=nq)
    qts[0] = batch_end                 # horizon start edge
    qts[1] = batch_end + 2 * DAY - 1   # horizon end edge
    head_ts = ev.loc[(ev["ts"] >= batch_end)
                     & (ev["ts"] < batch_end + 2 * DAY), "ts"]
    if len(head_ts):
        qts[2] = int(head_ts.min())  # exactly AT a head event ts
    q = pd.DataFrame({
        "user_id": rng.integers(0, ev["user_id"].max() + 1,
                                size=nq).astype(np.int64),
        "ts": qts.astype(np.int64),
    })
    hist = _to_ds(ev[ev["ts"] < batch_end])
    head = _to_ds(ev[ev["ts"] >= batch_end])
    ir = groupby_upload(hist, conf, batch_end, num_partitions=4)
    served = serve_with_events(ir, head, rd.from_pandas(q), conf,
                               batch_end, num_partitions=4).to_pandas()
    direct = temporal_join(rd.from_pandas(q), _to_ds(ev), conf,
                           num_partitions=4).to_pandas()
    sort = ["user_id", "ts"]
    a = served.sort_values(sort).reset_index(drop=True)
    b = direct.sort_values(sort).reset_index(drop=True)
    assert len(a) == len(b) == nq, (seed, len(a), len(b))
    assert sorted(a.columns) == sorted(b.columns), seed
    for c in b.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype(float)
            bv = bv.astype(float)
            na, nb = av.isna(), bv.isna()
            assert (na == nb).all(), (seed, c)
            # atol: the two paths merge Welford IRs in different orders, so
            # a near-zero variance can differ by ~1e-11 absolute
            # skew/kurtosis: 3rd/4th-moment merges amplify order
            # rounding between both-correct paths (~5e-9 rel seen
            # on fresh seeds; driver tolerance is 1e-6)
            rt = 1e-7 if ("skew" in c or "kurtosis" in c) else 1e-9
            np.testing.assert_allclose(av[~na], bv[~nb], rtol=rt,
                                       atol=1e-9, err_msg=f"{seed}:{c}")
        elif av.dtype == object or bv.dtype == object:
            for i, (x, y) in enumerate(zip(av, bv)):
                assert _norm(x) == _norm(y), (seed, c, i, x, y)
        else:
            assert (av.fillna(-1) == bv.fillna(-1)).all(), (seed, c)
