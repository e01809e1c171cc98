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
