"""FinalBatchIr upload + lambda merge: the checkpoint path must reproduce
the direct full-history temporal join bit-for-bit (reference
GroupByUpload.scala:65-105 + SawtoothOnlineAggregator.scala:83-126)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from chronon_ray.api import GroupByConf, UNBOUNDED, agg, window
from chronon_ray.pipelines.temporal import temporal_join
from chronon_ray.pipelines.upload import groupby_upload, serve_with_events

DAY = 86_400_000


def _events(n=4000, keys=37, days=30, seed=9):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-03-01").value // 10**6
    ts = base + rng.integers(0, days * DAY, size=n)
    return pd.DataFrame({
        "user_id": rng.integers(0, keys, size=n).astype(np.int64),
        "ts": np.sort(ts).astype(np.int64),
        "value": np.round(rng.normal(10, 3, size=n), 3),
        "item": rng.integers(0, 50, size=n).astype(np.int64),
    })


CONF = GroupByConf(
    name="up", sources=(), key_columns=("user_id",),
    aggregations=(
        agg("value", "sum", [window(7, "d"), UNBOUNDED]),
        agg("value", "count", [window(1, "d")]),
        agg("value", "average", [UNBOUNDED]),
        agg("value", "last", [window(7, "d")]),
        agg("item", "unique_count", [window(7, "d")]),
        agg("value", "min", [UNBOUNDED]),
    ),
)


def test_upload_serve_equals_direct_join(ray_session):
    ev = _events()
    base = int(ev["ts"].min())
    batch_end = ((base // DAY) + 26) * DAY  # midnight on day 26
    rng = np.random.default_rng(4)
    # queries inside the serving horizon [batch_end, batch_end + 2d)
    qts = batch_end + rng.integers(0, 2 * DAY - 1, size=600)
    q = pd.DataFrame({
        "user_id": rng.integers(0, 37, size=600).astype(np.int64),
        "ts": qts.astype(np.int64),
    })

    hist = ev[ev["ts"] < batch_end]
    head = ev[ev["ts"] >= batch_end]
    ir = groupby_upload(rd.from_pandas(hist), CONF, batch_end,
                        num_partitions=4)
    served = serve_with_events(
        ir, rd.from_pandas(head), rd.from_pandas(q), CONF, batch_end,
        num_partitions=4).to_pandas()

    direct = temporal_join(rd.from_pandas(q), rd.from_pandas(ev), CONF,
                           num_partitions=4).to_pandas()
    sort = ["user_id", "ts"]
    a = served.sort_values(sort).reset_index(drop=True)
    b = direct.sort_values(sort).reset_index(drop=True)
    assert len(a) == len(b) == 600
    for c in b.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype(float)
            bv = bv.astype(float)
            na, nb = av.isna(), bv.isna()
            assert (na == nb).all(), c
            np.testing.assert_allclose(av[~na], bv[~nb], rtol=1e-9,
                                       err_msg=c)
        else:
            assert (av.fillna(-1) == bv.fillna(-1)).all(), c


def test_upload_ir_table_shape(ray_session):
    ev = _events(n=500, keys=11)
    batch_end = ((int(ev["ts"].min()) // DAY) + 26) * DAY
    ir = groupby_upload(rd.from_pandas(ev), CONF, batch_end,
                        num_partitions=2).to_pandas()
    # one row per key that has history
    assert ir["user_id"].is_unique
    assert (ir["_batch_end_ts"] == batch_end).all()
    # windowed parts carry a tail-hop blob column
    assert "value_sum_7d__tailhops" in ir.columns


def test_serve_rejects_out_of_horizon_queries(ray_session):
    ev = _events(n=300, keys=5)
    batch_end = ((int(ev["ts"].min()) // DAY) + 26) * DAY
    ir = groupby_upload(rd.from_pandas(ev[ev["ts"] < batch_end]), CONF,
                        batch_end, num_partitions=2)
    bad_q = pd.DataFrame({"user_id": np.array([1], dtype=np.int64),
                          "ts": np.array([batch_end + 3 * DAY],
                                         dtype=np.int64)})
    with pytest.raises(Exception):
        serve_with_events(ir, rd.from_pandas(ev[ev["ts"] >= batch_end]),
                          rd.from_pandas(bad_q), CONF, batch_end,
                          num_partitions=2).to_pandas()


def test_rolling_checkpoint_daily_advance(ray_session):
    """full-hops checkpoint rolled day-by-day must serve identically to
    the direct full-history join — the O(one day) incremental backfill."""
    from chronon_ray.pipelines.upload import roll_checkpoint

    ev = _events(n=6000, keys=23, days=30, seed=13)
    base_day = int(ev["ts"].min()) // DAY
    e24 = (base_day + 24) * DAY
    e25, e26 = e24 + DAY, e24 + 2 * DAY

    evds = rd.from_pandas(ev)
    ck24 = groupby_upload(rd.from_pandas(ev[ev["ts"] < e24]), CONF, e24,
                          num_partitions=4, full_hops=True)
    ck25 = roll_checkpoint(ck24, evds, CONF, e24, e25, num_partitions=4)
    ck26 = roll_checkpoint(ck25, evds, CONF, e25, e26, num_partitions=4)

    rng = np.random.default_rng(8)
    # queries spread over 3 days past e26 — beyond the 2-day buffer cap,
    # which full-hops layout lifts
    q = pd.DataFrame({
        "user_id": rng.integers(0, 23, size=400).astype(np.int64),
        "ts": (e26 + rng.integers(0, int(2.5 * DAY), size=400))
        .astype(np.int64),
    })
    head = ev[ev["ts"] >= e26]
    served = serve_with_events(ck26, rd.from_pandas(head),
                               rd.from_pandas(q), CONF, e26,
                               num_partitions=4,
                               full_hops=True).to_pandas()
    direct = temporal_join(rd.from_pandas(q), evds, CONF,
                           num_partitions=4).to_pandas()
    sort = ["user_id", "ts"]
    a = served.sort_values(sort).reset_index(drop=True)
    b = direct.sort_values(sort).reset_index(drop=True)
    assert len(a) == len(b) == 400
    for c in b.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av, bv = av.astype(float), bv.astype(float)
            na, nb = av.isna(), bv.isna()
            assert (na == nb).all(), c
            np.testing.assert_allclose(av[~na], bv[~nb], rtol=1e-9,
                                       err_msg=c)
        else:
            assert (av.fillna(-1) == bv.fillna(-1)).all(), c


def test_rolling_checkpoint_list_and_sketch_ops(ray_session):
    """LAST_K/TOP_K (split __o/__p item columns) and HLL sketches must
    survive the checkpoint Arrow round-trip and the roll merge."""
    from chronon_ray.pipelines.upload import roll_checkpoint

    rng = np.random.default_rng(21)
    base = pd.Timestamp("2024-03-01").value // 10**6
    n = 3000
    ev = pd.DataFrame({
        "user_id": rng.integers(0, 17, size=n).astype(np.int64),
        "ts": np.sort(base + rng.integers(0, 30 * DAY, size=n))
        .astype(np.int64),
        "value": np.round(rng.normal(10, 3, size=n), 3),
    })
    conf = GroupByConf(
        name="lk", sources=(), key_columns=("user_id",),
        aggregations=(agg("value", "last_k", [window(7, "d")], k=3),
                      agg("value", "top_k", [window(7, "d")], k=2),
                      agg("value", "approx_unique_count", [UNBOUNDED])))
    e24 = (base // DAY + 24) * DAY
    ck = groupby_upload(rd.from_pandas(ev[ev["ts"] < e24]), conf, e24,
                        num_partitions=2, full_hops=True)
    ck = roll_checkpoint(ck, rd.from_pandas(ev), conf, e24, e24 + DAY,
                         num_partitions=2)
    q = pd.DataFrame({"user_id": np.arange(17, dtype=np.int64),
                      "ts": np.full(17, e24 + DAY + 3_600_000,
                                    dtype=np.int64)})
    served = serve_with_events(
        ck, rd.from_pandas(ev[ev["ts"] >= e24 + DAY]), rd.from_pandas(q),
        conf, e24 + DAY, num_partitions=2, full_hops=True).to_pandas()
    direct = temporal_join(rd.from_pandas(q), rd.from_pandas(ev), conf,
                           num_partitions=2).to_pandas()
    a = served.sort_values("user_id").reset_index(drop=True)
    b = direct.sort_values("user_id").reset_index(drop=True)
    for c in b.columns:
        if c.startswith("value_last") or c.startswith("value_top"):
            assert all((x is None and y is None) or list(x) == list(y)
                       for x, y in zip(a[c], b[c])), c
        elif c.endswith("approx_unique_count"):
            assert (a[c].fillna(-1) == b[c].fillna(-1)).all(), c
