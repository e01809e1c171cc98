"""Randomized differential for the label family.

label_join (time-reversed sawtooth) vs a numpy brute-force oracle of the
documented forward-window convention ``e.ts > q.ts AND -e.ts >=
floor((-q.ts - W)/hop)*hop``, and latest_label_view across versions that
disagree on declared dtypes (one version re-persisted through a pandas
round-trip promotes int64 → double, the exact shape the round-4 union
hashing fix covers)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from chronon_ray.api import GroupByConf, agg
from chronon_ray.api import window as W
from chronon_ray.windowing.resolution import tail_hop_millis

MS1D = 86_400_000


def _rand_frame(rng, n, null_keys):
    key = np.array([f"k{i}" for i in rng.integers(0, 5, size=n)],
                   dtype=object)
    if null_keys:
        key[rng.random(n) < 0.1] = None
    ts = rng.integers(0, 3 * MS1D, size=n).astype(np.int64)
    return key, ts


@pytest.mark.parametrize("seed", [6, 44])
def test_label_join_randomized_vs_bruteforce(ray_session, seed):
    from chronon_ray.pipelines.joins import label_join

    rng = np.random.default_rng(seed)
    nq, ne = int(rng.integers(40, 90)), int(rng.integers(80, 200))
    qk, qts = _rand_frame(rng, nq, null_keys=True)
    ek, ets = _rand_frame(rng, ne, null_keys=True)
    ev_val = np.round(rng.normal(5, 2, size=ne), 3)
    eid = np.arange(ne, dtype=np.int64)

    feats = rd.from_arrow(pa.table({
        "user_id": pa.array(qk.tolist(), type=pa.string()),
        "ts": pa.array(qts), "qid": pa.array(np.arange(nq, dtype=np.int64)),
    }))
    labels = rd.from_arrow(pa.table({
        "user_id": pa.array(ek.tolist(), type=pa.string()),
        "ts": pa.array(ets), "value": pa.array(ev_val),
        "event_id": pa.array(eid),
    }))
    win = W(1, "d")
    conf = GroupByConf(name="lbl", sources=(), key_columns=("user_id",),
                       aggregations=(agg("value", "sum", [win]),
                                     agg("value", "last", [win])),
                       tie_break_column="event_id")
    out = label_join(feats, labels, conf, num_partitions=8).to_pandas()
    assert len(out) == nq, (seed, len(out))
    out = out.sort_values("qid").reset_index(drop=True)

    hop = tail_hop_millis(win)
    got_sum = out["value_sum_1d"].to_numpy(dtype=np.float64)
    got_last = out["value_last_1d"].to_numpy(dtype=np.float64)
    for i in range(nq):
        k, t = qk[i], qts[i]
        if k is None:
            assert np.isnan(got_sum[i]) and np.isnan(got_last[i]), (seed, i)
            continue
        bound = int(np.floor((-t - MS1D) / hop)) * hop
        m = (ek == k) & (ets > t) & (-ets >= bound)
        if not m.any():
            assert np.isnan(got_sum[i]) and np.isnan(got_last[i]), (seed, i)
            continue
        np.testing.assert_allclose(got_sum[i], ev_val[m].sum(), rtol=1e-9,
                                   err_msg=f"{seed}:{i}:sum")
        # LAST = event with max (ts, event_id) inside the window
        sel = np.lexsort((eid[m], ets[m]))
        want_last = ev_val[m][sel][-1]
        np.testing.assert_allclose(got_last[i], want_last, rtol=0,
                                   err_msg=f"{seed}:{i}:last")


@pytest.mark.parametrize("seed", [16])
def test_latest_label_view_randomized_dtype_divergence(ray_session, seed):
    from chronon_ray.pipelines.joins import latest_label_view

    rng = np.random.default_rng(seed)
    n = 60
    key = np.array([f"k{i}" for i in rng.integers(0, 8, size=n)],
                   dtype=object)
    key[rng.random(n) < 0.08] = None
    ts = rng.integers(0, 50, size=n).astype(np.int64)
    ident = pd.DataFrame({"user_id": key, "ts": ts}).drop_duplicates()
    versions = []
    frames = []
    for vi, ds_val in enumerate(["2026-01-01", "2026-01-02", "2026-01-03"]):
        # each version covers a random subset of identities
        sub = ident.sample(frac=0.7, random_state=seed + vi)
        f = sub.assign(lab=np.round(rng.normal(0, 1, size=len(sub)), 3),
                       label_ds=ds_val)
        frames.append(f)
        if vi == 1:
            # dtype-divergent version: ts re-persisted as double (pandas
            # null-pad round trip) — must still co-partition and compare
            t = pa.table({
                "user_id": pa.array(f["user_id"].tolist(), type=pa.string()),
                "ts": pa.array(f["ts"].astype(np.float64).to_numpy()),
                "lab": pa.array(f["lab"].to_numpy()),
                "label_ds": pa.array(f["label_ds"].tolist()),
            })
        else:
            t = pa.table({
                "user_id": pa.array(f["user_id"].tolist(), type=pa.string()),
                "ts": pa.array(f["ts"].to_numpy()),
                "lab": pa.array(f["lab"].to_numpy()),
                "label_ds": pa.array(f["label_ds"].tolist()),
            })
        versions.append(rd.from_arrow(t))

    out = latest_label_view(versions, ["user_id"],
                            num_partitions=16).to_pandas()
    allv = pd.concat(frames, ignore_index=True)
    kf = allv["user_id"].astype(object).where(allv["user_id"].notna(),
                                              "\x00null")
    allv = allv.assign(_k=list(zip(kf, allv["ts"].astype(np.int64))))
    want = allv.sort_values("label_ds").groupby("_k").tail(1)
    assert len(out) == len(want), (seed, len(out), len(want))
    ko = out["user_id"].astype(object).where(out["user_id"].notna(),
                                             "\x00null")
    got = dict(zip(zip(ko, out["ts"].astype(np.int64)),
                   zip(out["lab"], out["label_ds"])))
    for _, r in want.iterrows():
        g = got[r["_k"]]
        assert g[1] == r["label_ds"], (seed, r["_k"], g, r["label_ds"])
        np.testing.assert_allclose(g[0], r["lab"], rtol=0)
