"""Tiled streaming analog (FlinkJob/TileCodec/FetcherBase parity):
make_tiles + serve_with_tiles must reproduce serve_with_events and the
direct full-history temporal join bit-for-bit; micro-batch tile merges
must be invariant to how the stream was sliced."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from chronon_ray.api import GroupByConf, UNBOUNDED, agg, window
from chronon_ray.pipelines.streaming import (default_tile_ms, make_tiles,
                                             merge_tiles, serve_with_tiles)
from chronon_ray.pipelines.temporal import temporal_join
from chronon_ray.pipelines.upload import groupby_upload, serve_with_events

DAY = 86_400_000
HOUR = 3_600_000
FIVE_MIN = 5 * 60 * 1000


def _events(n=4000, keys=37, days=30, seed=9):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-03-01").value // 10**6
    ts = base + rng.integers(0, days * DAY, size=n)
    return pd.DataFrame({
        "user_id": rng.integers(0, keys, size=n).astype(np.int64),
        "ts": np.sort(ts).astype(np.int64),
        "value": np.round(rng.normal(10, 3, size=n), 3),
        "item": rng.integers(0, 50, size=n).astype(np.int64),
        "store": np.array(["s1", "s2", "s3"])[rng.integers(0, 3, size=n)],
    })


CONF = GroupByConf(
    name="tiled", sources=(), key_columns=("user_id",),
    aggregations=(
        agg("value", "sum", [window(7, "d"), UNBOUNDED]),
        agg("value", "count", [window(1, "d")]),
        agg("value", "average", [UNBOUNDED]),
        agg("value", "last", [window(7, "d")]),
        agg("value", "last_k", [window(7, "d")], k=3),
        agg("item", "unique_count", [window(7, "d")]),
        agg("value", "min", [UNBOUNDED]),
        agg("value", "sum", [window(1, "d")], buckets=("store",)),
    ),
)


def _assert_frames_equal(a, b, sort, n=None, ctx=""):
    a = a.sort_values(sort).reset_index(drop=True)
    b = b.sort_values(sort).reset_index(drop=True)
    if n is not None:
        assert len(a) == len(b) == n, (ctx, len(a), len(b))
    assert sorted(a.columns) == sorted(b.columns), ctx
    for c in b.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av, bv = av.astype(float), bv.astype(float)
            na, nb = av.isna(), bv.isna()
            assert (na == nb).all(), (ctx, c)
            np.testing.assert_allclose(av[~na], bv[~nb], rtol=1e-9,
                                       atol=1e-9, err_msg=f"{ctx}:{c}")
        elif av.dtype == object or bv.dtype == object:
            from tests.test_upload_randomized import _norm
            for i, (x, y) in enumerate(zip(av, bv)):
                assert _norm(x) == _norm(y), (ctx, c, i, x, y)
        else:
            assert (av.fillna(-1) == bv.fillna(-1)).all(), (ctx, c)


def _setup(conf=CONF, seed=9):
    ev = _events(seed=seed)
    base = int(ev["ts"].min())
    batch_end = ((base // DAY) + 26) * DAY
    rng = np.random.default_rng(4)
    nq = 500
    qts = batch_end + rng.integers(0, 2 * DAY - 1, size=nq)
    q = pd.DataFrame({
        "user_id": rng.integers(0, 37, size=nq).astype(np.int64),
        "ts": qts.astype(np.int64)})
    hist = ev[ev["ts"] < batch_end]
    head = ev[ev["ts"] >= batch_end]
    ir = groupby_upload(rd.from_pandas(hist), conf, batch_end,
                        num_partitions=4)
    return ev, head, q, ir, batch_end


def test_tiled_serve_equals_events_serve_and_direct(ray_session):
    ev, head, q, ir, batch_end = _setup()
    tiles = make_tiles(rd.from_pandas(head), CONF, batch_end,
                       num_partitions=4)
    tiled = serve_with_tiles(ir, tiles, rd.from_pandas(head),
                             rd.from_pandas(q), CONF, batch_end,
                             num_partitions=4).to_pandas()
    evs = serve_with_events(ir, rd.from_pandas(head), rd.from_pandas(q),
                            CONF, batch_end, num_partitions=4).to_pandas()
    direct = temporal_join(rd.from_pandas(q), rd.from_pandas(ev), CONF,
                           num_partitions=4).to_pandas()
    _assert_frames_equal(tiled, evs, ["user_id", "ts"], n=500, ctx="t-vs-e")
    _assert_frames_equal(tiled, direct, ["user_id", "ts"], n=500,
                         ctx="t-vs-d")


def test_tiles_raw_side_only_needs_current_tile(ray_session):
    """The in-flight buffer can be restricted to each query's own tile —
    complete tiles carry everything older. Restricting raw events to the
    last tile boundary must not change a single feature."""
    ev, head, q, ir, batch_end = _setup()
    T = default_tile_ms(CONF)
    assert T == HOUR  # all CONF windows are >= 12h → 1h hops → 1h tiles
    tiles = make_tiles(rd.from_pandas(head), CONF, batch_end,
                       num_partitions=4)
    # per-query minimal buffer: everything >= the EARLIEST query tile is a
    # superset of every query's own tile (tiles cover the rest exactly)
    floor = (int(q["ts"].min()) // T) * T
    thin = head[head["ts"] >= floor]
    full = serve_with_tiles(ir, tiles, rd.from_pandas(head),
                            rd.from_pandas(q), CONF, batch_end,
                            num_partitions=4).to_pandas()
    minimal = serve_with_tiles(ir, tiles, rd.from_pandas(thin),
                               rd.from_pandas(q), CONF, batch_end,
                               num_partitions=4).to_pandas()
    _assert_frames_equal(full, minimal, ["user_id", "ts"], n=500,
                         ctx="thin-buffer")


def test_microbatch_merge_invariance(ray_session):
    """Tiles built from k micro-batches and folded with merge_tiles must
    serve identically to tiles built in one shot (Flink checkpoint
    advance == batch rebuild)."""
    ev, head, q, ir, batch_end = _setup()
    one_shot = make_tiles(rd.from_pandas(head), CONF, batch_end,
                          num_partitions=4)
    cuts = np.array_split(np.sort(head["ts"].unique()), 3)
    store = None
    lo = batch_end
    for c in cuts:
        hi = int(c[-1]) + 1
        mb = head[(head["ts"] >= lo) & (head["ts"] < hi)]
        lo = hi
        t = make_tiles(rd.from_pandas(mb), CONF, batch_end,
                       num_partitions=4)
        store = t if store is None else merge_tiles(store, t, CONF,
                                                    num_partitions=4)
    a = serve_with_tiles(ir, one_shot, rd.from_pandas(head),
                         rd.from_pandas(q), CONF, batch_end,
                         num_partitions=4).to_pandas()
    b = serve_with_tiles(ir, store, rd.from_pandas(head),
                         rd.from_pandas(q), CONF, batch_end,
                         num_partitions=4).to_pandas()
    _assert_frames_equal(a, b, ["user_id", "ts"], n=500, ctx="microbatch")
    # a micro-batch boundary mid-tile splits that tile across two builds —
    # merge must have re-fused them (one row per (key, tile))
    tp = store.to_pandas()
    assert not tp.duplicated(["user_id", "_tile"]).any()


def test_tile_expiry_drops_out_of_window_tiles(ray_session):
    """expire_before_ts bounds the rolling store without touching any
    feature a query can still ask for (no unbounded part here)."""
    conf = GroupByConf(
        name="texp", sources=(), key_columns=("user_id",),
        aggregations=(agg("value", "sum", [window(1, "d")]),
                      agg("item", "unique_count", [window(12, "h")])))
    ev, head, q, ir2, batch_end = _setup(conf=conf)
    ir = groupby_upload(rd.from_pandas(ev[ev["ts"] < batch_end]), conf,
                        batch_end, num_partitions=4)
    tiles = make_tiles(rd.from_pandas(head), conf, batch_end,
                       num_partitions=4)
    # oldest tail any in-horizon query can need: its 1d window hop-rounded
    # from the earliest query ts
    qmin = int(q["ts"].min())
    floor = ((qmin - DAY) // FIVE_MIN) * FIVE_MIN
    pruned = merge_tiles(tiles, make_tiles(
        rd.from_pandas(head.iloc[0:0]), conf, batch_end, num_partitions=4),
        conf, num_partitions=4, expire_before_ts=floor)
    assert pruned.count() <= tiles.count()
    a = serve_with_tiles(ir, tiles, rd.from_pandas(head),
                         rd.from_pandas(q), conf, batch_end,
                         num_partitions=4).to_pandas()
    b = serve_with_tiles(ir, pruned, rd.from_pandas(head),
                         rd.from_pandas(q), conf, batch_end,
                         num_partitions=4).to_pandas()
    _assert_frames_equal(a, b, ["user_id", "ts"], ctx="expiry")


def test_tile_ms_validation(ray_session):
    ev, head, q, ir, batch_end = _setup()
    with pytest.raises(ValueError, match="does not divide"):
        make_tiles(rd.from_pandas(head), CONF, batch_end,
                   tile_ms=7 * 60 * 1000, num_partitions=4)
    # serving with a tile size that contradicts the table fails loudly
    # (5-min tiles are valid — they divide the 1h hops — but the serve
    # side must round query tiles with the SAME size the table used)
    tiles = make_tiles(rd.from_pandas(head), CONF, batch_end,
                       tile_ms=FIVE_MIN, num_partitions=4)
    with pytest.raises(Exception, match="_tile_ms"):
        serve_with_tiles(ir, tiles, rd.from_pandas(head),
                         rd.from_pandas(q), CONF, batch_end,
                         tile_ms=HOUR, num_partitions=4).to_pandas()


def test_null_key_queries_preserved(ray_session):
    """Null-keyed query rows match nothing but must still come back with
    null features (left-outer row preservation), same as the events
    serve."""
    ev, head, q, ir, batch_end = _setup()
    q = q.copy()
    q["user_id"] = q["user_id"].astype("Int64")
    q.loc[q.index[:7], "user_id"] = pd.NA
    tiles = make_tiles(rd.from_pandas(head), CONF, batch_end,
                       num_partitions=4)
    a = serve_with_tiles(ir, tiles, rd.from_pandas(head),
                         rd.from_pandas(q), CONF, batch_end,
                         num_partitions=4).to_pandas()
    b = serve_with_events(ir, rd.from_pandas(head), rd.from_pandas(q),
                          CONF, batch_end, num_partitions=4).to_pandas()
    assert len(a) == len(b) == len(q)
    _assert_frames_equal(a, b, ["user_id", "ts"], ctx="nullq")


def test_rolling_checkpoint_with_tiles(ray_session):
    """Full-hops rolling checkpoint + tiles serves beyond the 2-day
    collapsed horizon, still matching the direct join."""
    ev = _events()
    base = int(ev["ts"].min())
    e0 = ((base // DAY) + 22) * DAY
    conf = CONF
    ir = groupby_upload(rd.from_pandas(ev[ev["ts"] < e0]), conf, e0,
                        num_partitions=4, full_hops=True)
    from chronon_ray.pipelines.upload import roll_checkpoint
    end = e0 + 3 * DAY
    cur = ir
    for d in range(3):
        cur = roll_checkpoint(cur, rd.from_pandas(ev), conf,
                              e0 + d * DAY, e0 + (d + 1) * DAY,
                              num_partitions=4)
    rng = np.random.default_rng(11)
    nq = 300
    q = pd.DataFrame({
        "user_id": rng.integers(0, 37, size=nq).astype(np.int64),
        "ts": (end + rng.integers(0, 3 * DAY, size=nq)).astype(np.int64)})
    head = ev[ev["ts"] >= end]
    tiles = make_tiles(rd.from_pandas(head), conf, end, num_partitions=4)
    served = serve_with_tiles(cur, tiles, rd.from_pandas(head),
                              rd.from_pandas(q), conf, end,
                              num_partitions=4).to_pandas()
    direct = temporal_join(rd.from_pandas(q), rd.from_pandas(ev), conf,
                           num_partitions=4).to_pandas()
    _assert_frames_equal(served, direct, ["user_id", "ts"], n=nq,
                         ctx="rolled-tiles")
