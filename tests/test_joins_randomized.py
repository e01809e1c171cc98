"""Randomized differential suite for the JOIN ASSEMBLY layer.

The temporal/sawtooth feature engine is differentially tested elsewhere
(test_temporal_randomized); these tests stress what sits ON TOP of it —
multi-part assembly fan-out, prefixes, left dedup, snapshot-lag equi-joins,
the range-planned backfill driver — against DuckDB / composed oracles on
randomized inputs (random key cardinality, null keys, ts tie clusters,
random block layouts, random op/window bundles).
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd

from chronon_ray.api import (
    EventSource,
    GroupByConf,
    JoinConf,
    JoinPart,
    TQuery,
    UNBOUNDED,
    agg,
    window,
)
from chronon_ray.pipelines.joins import compute_join, entity_snapshot_join
from chronon_ray.windowing.resolution import tail_hop_millis

MS_H = 3_600_000
MS_D = 86_400_000

# (op, sql_agg, fill_zero) — the SQL-expressible vectorized family
_OPS = [
    ("sum", "sum", False),
    ("count", "count", True),
    ("min", "min", False),
    ("max", "max", False),
    ("average", "avg", False),
]
_WINDOWS = [window(1, "d"), window(7, "d"), window(12, "h"), UNBOUNDED]


def _rand_events(rng, n_users=8, n=500):
    """Events with deliberate ts tie clusters (coarse 1h grid), null values
    and null keys."""
    uid = rng.integers(0, n_users, size=n).astype(object)
    uid[rng.random(n) < 0.08] = None
    ts = (rng.integers(0, 14 * 24, size=n) * MS_H).astype(np.int64)
    val = rng.normal(50, 20, size=n).round(3).astype(object)
    val[rng.random(n) < 0.10] = None
    et = rng.choice(["a", "b"], size=n, p=[0.3, 0.7])
    return pd.DataFrame({
        "user_id": uid, "ts": ts, "value": val, "event_type": et,
        "event_id": np.arange(n, dtype=np.int64),
    })


def _write_events(df, path):
    t = pa.table({
        "user_id": pa.array(df["user_id"].tolist(), type=pa.int64()),
        "ts": pa.array(df["ts"].to_numpy()),
        "value": pa.array(df["value"].tolist(), type=pa.float64()),
        "event_type": pa.array(df["event_type"].tolist()),
        "event_id": pa.array(df["event_id"].to_numpy()),
    })
    import pyarrow.parquet as pq

    pq.write_table(t, path)


@pytest.mark.parametrize("seed", [71, 72, 73])
def test_compute_join_random_parts_vs_duckdb(ray_session, tmp_path, seed):
    """2-3 random (op, window) parts with random prefixes assembled onto a
    filtered left: engine vs a dynamically built DuckDB oracle with the
    hop-rounded window predicate."""
    import duckdb

    rng = np.random.default_rng(seed)
    ev = _rand_events(rng)
    path = str(tmp_path / "events.parquet")
    _write_events(ev, path)

    n_parts = int(rng.integers(2, 4))
    picks = [(_OPS[rng.integers(0, len(_OPS))],
              _WINDOWS[rng.integers(0, len(_WINDOWS))])
             for _ in range(n_parts)]

    ev_src = EventSource(table=path, query=TQuery())
    left_src = EventSource(
        table=path,
        query=TQuery.of(selects={"user_id": "user_id", "ts": "ts",
                                 "event_id": "event_id"},
                        wheres=[lambda t: pc.equal(t["event_type"], "a")]))
    parts, agg_sqls, fills = [], [], []
    for i, ((op, sql_agg, fill0), w) in enumerate(picks):
        gb = GroupByConf(name=f"g{i}", sources=(ev_src,),
                         key_columns=("user_id",),
                         aggregations=(agg("value", op, [w]),))
        prefix = None if i == 0 else f"p{i}"
        parts.append(JoinPart(group_by=gb, prefix=prefix))
        if w is UNBOUNDED or w is None:
            cond = "e.ts < q.ts"
        else:
            wms = w.millis
            hop = tail_hop_millis(w)
            cond = (f"e.ts < q.ts and "
                    f"e.ts >= ((q.ts - {wms}) // {hop}) * {hop}")
        agg_sqls.append(
            f"{sql_agg}(case when {cond} then e.value end) as f{i}")
        fills.append(fill0)

    jc = JoinConf(name=f"rj{seed}", left=left_src, parts=tuple(parts))
    out = compute_join(jc, num_partitions=16).to_pandas()
    out = out.sort_values(["event_id"]).reset_index(drop=True)

    con = duckdb.connect()
    exp = con.sql(f"""
        with q as (select user_id, ts, event_id
                   from read_parquet('{path}') where event_type = 'a'),
             e as (select user_id, ts, value from read_parquet('{path}'))
        select q.event_id, {', '.join(agg_sqls)}
        from q left join e on q.user_id = e.user_id
        group by q.user_id, q.ts, q.event_id
        order by q.event_id
    """).df()
    con.close()

    assert len(out) == len(exp), (seed, len(out), len(exp))
    left_cols = {"user_id", "ts", "event_id"}
    feat_cols = [c for c in out.columns if c not in left_cols]
    assert len(feat_cols) == n_parts, (seed, feat_cols)
    for i, fc in enumerate(feat_cols):
        op = picks[i][0][0]
        assert f"_{('average' if op == 'average' else op)}" in fc, (fc, op)
        g = out[fc].astype(float).to_numpy()
        w_ = exp[f"f{i}"].astype(float).to_numpy()
        if fills[i]:
            g = np.nan_to_num(g)
            w_ = np.nan_to_num(w_)
        nan_g, nan_w = np.isnan(g), np.isnan(w_)
        assert (nan_g == nan_w).all(), (seed, fc, int((nan_g != nan_w).sum()))
        np.testing.assert_allclose(g[~nan_g], w_[~nan_w], rtol=1e-9,
                                   err_msg=f"{seed}:{fc}")


def _split_ds(df_to_arrow, rng, n_blocks=4):
    """Union random row-slices so the dataset arrives in a random block
    layout."""
    n = df_to_arrow.num_rows
    if n < n_blocks + 1:
        return rd.from_arrow(df_to_arrow)
    cuts = np.sort(rng.choice(np.arange(1, n), size=n_blocks - 1,
                              replace=False))
    ds = None
    for idx in np.split(np.arange(n), cuts):
        x = rd.from_arrow(df_to_arrow.take(pa.array(idx)))
        ds = x if ds is None else ds.union(x)
    return ds


@pytest.mark.parametrize("seed", [81, 82])
def test_entity_snapshot_join_randomized_vs_duckdb(ray_session, seed):
    """Events × daily snapshots as of date(ts)-lag, random lag, null keys
    both sides, random block layouts."""
    import duckdb

    rng = np.random.default_rng(seed)
    lag = int(rng.integers(1, 3))

    # snapshot rows: unique (user, ds), some null keys (must never match)
    days = [f"2026-03-{d:02d}" for d in range(1, 9)]
    rows = set()
    snap_u, snap_d, snap_v = [], [], []
    for _ in range(60):
        u = None if rng.random() < 0.1 else int(rng.integers(0, 8))
        d = days[rng.integers(0, len(days))]
        if (u, d) in rows:
            continue
        rows.add((u, d))
        snap_u.append(u)
        snap_d.append(d)
        snap_v.append(round(float(rng.normal(10, 5)), 3))
    snap = pa.table({"user_id": pa.array(snap_u, type=pa.int64()),
                     "ds": pa.array(snap_d),
                     "day_total": pa.array(snap_v, type=pa.float64())})

    n = 300
    base = int(np.datetime64("2026-03-01").astype("datetime64[ms]")
               .astype(np.int64))
    uid = rng.integers(0, 8, size=n).astype(object)
    uid[rng.random(n) < 0.1] = None
    ts = base + rng.integers(0, 9 * 24, size=n) * MS_H
    left = pa.table({"user_id": pa.array(uid.tolist(), type=pa.int64()),
                     "ts": pa.array(ts.astype(np.int64)),
                     "event_id": pa.array(np.arange(n, dtype=np.int64))})

    out = entity_snapshot_join(_split_ds(left, rng), _split_ds(snap, rng),
                               keys=["user_id"], num_partitions=8,
                               snapshot_lag_days=lag).to_pandas()
    out = out.sort_values("event_id").reset_index(drop=True)

    con = duckdb.connect()
    con.register("l", left.to_pandas())
    con.register("s", snap.to_pandas())
    exp = con.sql(f"""
        select l.event_id, s.day_total
        from l left join s
          on l.user_id = s.user_id
         and strftime(epoch_ms(l.ts - {lag} * {MS_D}), '%Y-%m-%d') = s.ds
        order by l.event_id
    """).df()
    con.close()

    assert len(out) == len(exp), (seed, len(out), len(exp))
    g = out["day_total"].astype(float).to_numpy()
    w = exp["day_total"].astype(float).to_numpy()
    nan = np.isnan(g)
    assert (nan == np.isnan(w)).all(), seed
    np.testing.assert_allclose(g[~nan], w[~nan], rtol=1e-12)


@pytest.mark.parametrize("seed", [91])
def test_backfill_step_days_equals_single_shot(ray_session, tmp_path, seed):
    """backfill_join with a random step_days over a ds-partitioned staging
    of random events must assemble EXACTLY what compute_join produces in
    one shot; a re-run resumes (no output change)."""
    import duckdb
    import glob

    from chronon_ray.pipelines.backfill import backfill_join

    rng = np.random.default_rng(seed)
    ev = _rand_events(rng, n_users=6, n=400)
    # shift ts to real dates so ds partitioning is meaningful
    base = int(np.datetime64("2026-03-01").astype("datetime64[ms]")
               .astype(np.int64))
    ev["ts"] = ev["ts"] + base
    flat = str(tmp_path / "flat.parquet")
    _write_events(ev, flat)
    ev_dir = str(tmp_path / "events")
    os.makedirs(ev_dir, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"""copy (select *, strftime(epoch_ms(ts), '%Y-%m-%d') as ds
                      from read_parquet('{flat}'))
                to '{ev_dir}'
                (format parquet, partition_by (ds), overwrite_or_ignore)""")
    con.close()

    ev_src = EventSource(table=ev_dir, query=TQuery())
    left_src = EventSource(
        table=ev_dir,
        query=TQuery.of(selects={"user_id": "user_id", "ts": "ts",
                                 "event_id": "event_id"},
                        wheres=[lambda t: pc.equal(t["event_type"], "a")]))
    gb1 = GroupByConf(name="g1", sources=(ev_src,), key_columns=("user_id",),
                      aggregations=(agg("value", "sum", [window(3, "d")]),))
    gb2 = GroupByConf(name="g2", sources=(ev_src,), key_columns=("user_id",),
                      aggregations=(agg("value", "count", [UNBOUNDED]),))
    jc = JoinConf(name=f"bf{seed}", left=left_src,
                  parts=(JoinPart(group_by=gb1),
                         JoinPart(group_by=gb2, prefix="p2")))

    days = sorted(d.split("=")[1] for d in os.listdir(ev_dir)
                  if d.startswith("ds="))
    out_dir = str(tmp_path / "out")
    step = int(rng.integers(1, 4))
    backfill_join(jc, out_dir, days[0], days[-1], step_days=step,
                  num_partitions=8)

    def read_out():
        files = sorted(glob.glob(f"{out_dir}/ds=*/**/*.parquet",
                                 recursive=True))
        df = pd.concat([pd.read_parquet(f) for f in files],
                       ignore_index=True)
        cols = [c for c in df.columns if not c.startswith("_")]
        return df[cols].sort_values("event_id").reset_index(drop=True)

    got = read_out()
    single = compute_join(jc, num_partitions=8).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert len(got) == len(single), (seed, step, len(got), len(single))
    for c in single.columns:
        if c not in got.columns:
            continue
        g = got[c].to_numpy()
        s = single[c].to_numpy()
        if g.dtype.kind == "f" or s.dtype.kind == "f":
            g, s = g.astype(float), s.astype(float)
            nan = np.isnan(g)
            assert (nan == np.isnan(s)).all(), (seed, c)
            np.testing.assert_allclose(g[~nan], s[~nan], rtol=1e-9,
                                       err_msg=f"{seed}:{c}")
        else:
            np.testing.assert_array_equal(g, s, err_msg=f"{seed}:{c}")

    # resume: a re-run must not change the assembled output
    backfill_join(jc, out_dir, days[0], days[-1], step_days=step,
                  num_partitions=8)
    again = read_out()
    pd.testing.assert_frame_equal(got, again)


@pytest.mark.parametrize("seed", [97, 98])
def test_key_partitioned_join_fanout_vs_pandas(ray_session, seed):
    """Assembly primitive: left with DUPLICATE keys fanned out against 1-3
    unique-keyed feature tables, random block layouts, vs pandas merges."""
    from chronon_ray.pipelines.assembly import key_partitioned_join

    rng = np.random.default_rng(seed)
    n = 250
    keys = rng.integers(0, 40, size=n)
    left = pa.table({"k": pa.array(keys.astype(np.int64)),
                     "row_id": pa.array(np.arange(n, dtype=np.int64))})
    n_rights = int(rng.integers(1, 4))
    rights, right_pd = [], []
    for j in range(n_rights):
        uk = np.unique(rng.integers(0, 40, size=30)).astype(np.int64)
        feat = rng.normal(0, 1, size=len(uk)).round(4)
        t = pa.table({"k": pa.array(uk), f"f{j}": pa.array(feat)})
        rights.append(_split_ds(t, rng, n_blocks=3))
        right_pd.append(t.to_pandas())

    out = key_partitioned_join(_split_ds(left, rng), rights, keys=["k"],
                               how="left", num_partitions=8).to_pandas()
    out = out.sort_values("row_id").reset_index(drop=True)

    exp = left.to_pandas()
    for j in range(n_rights):
        exp = exp.merge(right_pd[j], on="k", how="left")
    exp = exp.sort_values("row_id").reset_index(drop=True)
    assert len(out) == n, (seed, len(out))
    for j in range(n_rights):
        g = out[f"f{j}"].astype(float).to_numpy()
        w = exp[f"f{j}"].astype(float).to_numpy()
        nan = np.isnan(g)
        assert (nan == np.isnan(w)).all(), (seed, j)
        np.testing.assert_allclose(g[~nan], w[~nan], rtol=1e-12)
