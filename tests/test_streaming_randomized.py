"""Randomized differential: tiled lambda fetch vs event-replay serve vs
direct temporal join — three INDEPENDENT engine paths that must agree
bit-for-bit. Rotates op bundles across the full surface (windows in
hours/days/unbounded, nulls, list auto-explode, map inputs, bucketed
parts) over random event streams, plus random micro-batch slicings of
the tile build (merge_tiles associativity under arbitrary stream cuts)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from chronon_ray.api import GroupByConf
from chronon_ray.pipelines.streaming import (make_tiles, merge_tiles,
                                             serve_with_tiles)
from chronon_ray.pipelines.temporal import temporal_join
from chronon_ray.pipelines.upload import groupby_upload, serve_with_events
from tests.test_upload_randomized import (_OP_POOL, _WINDOW_POOL, _events,
                                          _norm, _to_ds)

DAY = 86_400_000
BASE = pd.Timestamp("2024-03-01").value // 10**6


def _cmp(a, b, sort, ctx):
    a = a.sort_values(sort).reset_index(drop=True)
    b = b.sort_values(sort).reset_index(drop=True)
    assert len(a) == len(b), (ctx, len(a), len(b))
    assert sorted(a.columns) == sorted(b.columns), ctx
    for c in b.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av, bv = av.astype(float), bv.astype(float)
            na, nb = av.isna(), bv.isna()
            assert (na == nb).all(), (ctx, c)
            # rtol 1e-7: tile pre-aggregation merges moment IRs (variance/
            # skew/kurtosis) in a different tree shape than the per-event
            # sawtooth, so fp rounding legitimately differs at ~1e-8 rel
            np.testing.assert_allclose(av[~na], bv[~nb], rtol=1e-7,
                                       atol=1e-9, err_msg=f"{ctx}:{c}")
        elif av.dtype == object or bv.dtype == object:
            for i, (x, y) in enumerate(zip(av, bv)):
                assert _norm(x) == _norm(y), (ctx, c, i, x, y)
        else:
            assert (av.fillna(-1) == bv.fillna(-1)).all(), (ctx, c)


@pytest.mark.parametrize("seed", [301, 302, 303, 304, 305])
def test_tiled_serve_three_way_randomized(ray_session, seed):
    rng = np.random.default_rng(seed)
    ev = _events(rng, n=int(rng.integers(1500, 3000)),
                 keys=int(rng.integers(8, 30)), days=30)
    picks = rng.choice(len(_OP_POOL), size=6, replace=False)
    aggs = []
    for i in picks:
        w = _WINDOW_POOL[int(rng.integers(0, len(_WINDOW_POOL)))]()
        aggs.append(_OP_POOL[i](w))
    conf = GroupByConf(name=f"tile{seed}", sources=(),
                       key_columns=("user_id",), aggregations=tuple(aggs))
    batch_end = ((BASE // DAY) + 26) * DAY
    nq = 250
    qts = batch_end + rng.integers(0, 2 * DAY - 1, size=nq)
    qts[0] = batch_end                 # horizon start edge
    qts[1] = batch_end + 2 * DAY - 1   # horizon end edge
    head_df = ev[ev["ts"] >= batch_end]
    if len(head_df):
        qts[2] = int(head_df["ts"].min())  # exactly AT a head event ts
    q = pd.DataFrame({
        "user_id": rng.integers(0, ev["user_id"].max() + 1,
                                size=nq).astype(np.int64),
        "ts": qts.astype(np.int64)})

    hist = _to_ds(ev[ev["ts"] < batch_end])
    head = _to_ds(head_df)
    ir = groupby_upload(hist, conf, batch_end, num_partitions=4)

    # tile store assembled from a RANDOM micro-batch slicing of the head
    ncuts = int(rng.integers(1, 4))
    if ncuts == 1 or len(head_df) < 4:
        tiles = make_tiles(head, conf, batch_end, num_partitions=4)
    else:
        cut_ts = np.sort(rng.choice(head_df["ts"].to_numpy(),
                                    size=ncuts - 1, replace=False))
        bounds = [batch_end, *cut_ts.tolist(), np.iinfo(np.int64).max]
        tiles = None
        for j in range(ncuts):
            mb = head_df[(head_df["ts"] >= bounds[j])
                         & (head_df["ts"] < bounds[j + 1])]
            t = make_tiles(_to_ds(mb), conf, batch_end, num_partitions=4)
            tiles = t if tiles is None else merge_tiles(
                tiles, t, conf, num_partitions=4)

    tiled = serve_with_tiles(ir, tiles, head, rd.from_pandas(q), conf,
                             batch_end, num_partitions=4).to_pandas()
    evs = serve_with_events(ir, head, rd.from_pandas(q), conf,
                            batch_end, num_partitions=4).to_pandas()
    direct = temporal_join(rd.from_pandas(q), _to_ds(ev), conf,
                           num_partitions=4).to_pandas()
    _cmp(tiled, evs, ["user_id", "ts"], f"{seed}:t-vs-e")
    _cmp(tiled, direct, ["user_id", "ts"], f"{seed}:t-vs-d")
