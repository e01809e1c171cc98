"""KV handoff codec + point fetch: kv_export/kv_import must round-trip a
FinalBatchIr checkpoint AND a tile store losslessly (serve bit-equal),
and fetch_features must return exactly what the serve pipelines compute."""

import numpy as np
import pandas as pd
import pickle
import pyarrow as pa
import pytest
import ray.data as rd

from chronon_ray.api import GroupByConf, UNBOUNDED, agg, window
from chronon_ray.pipelines.streaming import make_tiles, serve_with_tiles
from chronon_ray.pipelines.upload import groupby_upload, serve_with_events
from chronon_ray.serving import fetch_features, kv_export, kv_import

DAY = 86_400_000


def _events(n=3000, keys=23, days=30, seed=5):
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
    name="kv", sources=(), key_columns=("user_id",),
    aggregations=(
        agg("value", "sum", [window(7, "d"), UNBOUNDED]),
        agg("value", "last_k", [window(7, "d")], k=2),
        agg("item", "unique_count", [window(7, "d")]),
    ),
)


def _setup():
    ev = _events()
    batch_end = ((int(ev["ts"].min()) // DAY) + 26) * DAY
    rng = np.random.default_rng(3)
    q = pd.DataFrame({
        "user_id": rng.integers(0, 23, size=300).astype(np.int64),
        "ts": (batch_end
               + rng.integers(0, 2 * DAY - 1, size=300)).astype(np.int64)})
    hist = ev[ev["ts"] < batch_end]
    head = ev[ev["ts"] >= batch_end]
    ir = groupby_upload(rd.from_pandas(hist), CONF, batch_end,
                        num_partitions=4)
    return ev, head, q, ir, batch_end


def _eq(a, b, ctx):
    sort = ["user_id", "ts"]
    a = a.sort_values(sort).reset_index(drop=True)
    b = b.sort_values(sort).reset_index(drop=True)
    assert len(a) == len(b) and sorted(a.columns) == sorted(b.columns), ctx
    for c in b.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av, bv = av.astype(float), bv.astype(float)
            assert (av.isna() == bv.isna()).all(), (ctx, c)
            np.testing.assert_allclose(av.dropna(), bv.dropna(), rtol=1e-9,
                                       err_msg=f"{ctx}:{c}")
        elif av.dtype == object:
            for x, y in zip(av, bv):
                assert (x is None and y is None) or list(x) == list(y), \
                    (ctx, c)
        else:
            assert (av.fillna(-1) == bv.fillna(-1)).all(), (ctx, c)


def test_checkpoint_kv_round_trip_serves_bit_equal(ray_session):
    ev, head, q, ir, batch_end = _setup()
    ir = ir.materialize()
    ir_schema = ir.schema().base_schema
    kv = kv_export(ir, CONF.key_columns)
    kvp = kv.to_pandas()
    assert set(kvp.columns) == {"key_bytes", "value_bytes"}
    assert kvp["key_bytes"].is_unique  # one KV pair per key
    back = kv_import(kv, [ir_schema.field(k) for k in CONF.key_columns])
    a = serve_with_events(back, rd.from_pandas(head), rd.from_pandas(q),
                          CONF, batch_end, num_partitions=4).to_pandas()
    b = serve_with_events(ir, rd.from_pandas(head), rd.from_pandas(q),
                          CONF, batch_end, num_partitions=4).to_pandas()
    _eq(a, b, "ck-roundtrip")


def test_tile_store_kv_round_trip(ray_session):
    """Tiles use the reference's tiled KV layout: key = conf keys + tile
    start."""
    ev, head, q, ir, batch_end = _setup()
    tiles = make_tiles(rd.from_pandas(head), CONF, batch_end,
                       num_partitions=4).materialize()
    t_schema = tiles.schema().base_schema
    kcols = [*CONF.key_columns, "_tile"]
    kv = kv_export(tiles, kcols)
    assert kv.to_pandas()["key_bytes"].is_unique
    back = kv_import(kv, [t_schema.field(k) for k in kcols])
    a = serve_with_tiles(ir, back, rd.from_pandas(head), rd.from_pandas(q),
                         CONF, batch_end, num_partitions=4).to_pandas()
    b = serve_with_tiles(ir, tiles, rd.from_pandas(head),
                         rd.from_pandas(q), CONF, batch_end,
                         num_partitions=4).to_pandas()
    _eq(a, b, "tile-roundtrip")


def test_key_bytes_canonical_across_dtypes(ray_session):
    """The same logical key must export identical key_bytes whether it
    rode in as int32 or int64 — a dtype-divergent store would miss every
    lookup."""
    t32 = pa.table({"user_id": pa.array([1, 2], type=pa.int32()),
                    "x": pa.array([1.0, 2.0])})
    t64 = pa.table({"user_id": pa.array([1, 2], type=pa.int64()),
                    "x": pa.array([1.0, 2.0])})
    k32 = kv_export(rd.from_arrow(t32), ["user_id"]).to_pandas()
    k64 = kv_export(rd.from_arrow(t64), ["user_id"]).to_pandas()
    assert sorted(k32["key_bytes"]) == sorted(k64["key_bytes"])
    # and import restores the DECLARED key type regardless of export dtype
    back = kv_import(kv_export(rd.from_arrow(t32), ["user_id"]),
                     [pa.field("user_id", pa.int64())]).to_pandas()
    assert back["user_id"].dtype == np.int64 and set(back["user_id"]) == {1, 2}


def test_fetch_features_matches_serve(ray_session):
    ev, head, q, ir, batch_end = _setup()
    at_ts = batch_end + DAY
    want_keys = [{"user_id": 3}, {"user_id": 7}, {"user_id": 99_999}]
    tiles = make_tiles(rd.from_pandas(head), CONF, batch_end,
                       num_partitions=4)
    got = fetch_features(ir, CONF, batch_end, want_keys, at_ts,
                         tiles=tiles, recent_events=rd.from_pandas(head),
                         num_partitions=4)
    assert list(got["user_id"]) == [3, 7, 99_999]  # request order
    ref_q = pd.DataFrame({"user_id": np.array([3, 7, 99_999], np.int64),
                          "ts": np.int64(at_ts)})
    ref = serve_with_events(ir, rd.from_pandas(head),
                            rd.from_pandas(ref_q), CONF, batch_end,
                            num_partitions=4).to_pandas()
    _eq(got, ref, "fetch")
    # unknown key -> null features, row preserved
    assert got.loc[got["user_id"] == 99_999, "value_sum_7d"].isna().all()
    # events-mode fetch with an EMPTY in-flight buffer + declared schema
    ev_schema = pa.table({
        "user_id": pa.array([], type=pa.int64()),
        "ts": pa.array([], type=pa.int64()),
        "value": pa.array([], type=pa.float64()),
        "item": pa.array([], type=pa.int64())}).schema
    got2 = fetch_features(ir, CONF, batch_end, want_keys, batch_end,
                          events_schema=ev_schema, num_partitions=4)
    ref2 = serve_with_events(
        ir, rd.from_arrow(pa.table({f.name: pa.array([], type=f.type)
                                    for f in ev_schema})),
        rd.from_pandas(pd.DataFrame({
            "user_id": np.array([3, 7, 99_999], np.int64),
            "ts": np.int64(batch_end)})),
        CONF, batch_end, num_partitions=4).to_pandas()
    _eq(got2, ref2, "fetch-empty")
    with pytest.raises(ValueError, match="events_schema"):
        fetch_features(ir, CONF, batch_end, want_keys, batch_end)
