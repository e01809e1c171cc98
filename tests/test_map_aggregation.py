"""Map-input aggregation (MapColumnAggregator analog — reference
aggregator/row/MapColumnAggregator.scala:29-75, dispatch at
ColumnAggregator.scala:178-190): per-map-key dispatch of scalar ops over a
map<string, scalar> column, producing a map output per group."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from chronon_ray.api import GroupByConf, agg
from chronon_ray.pipelines.groupby import aggregate_snapshot


def _map_table(rows):
    return pa.table({
        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array(range(len(rows)), type=pa.int64()),
        "m": pa.array([r[1] for r in rows],
                      type=pa.map_(pa.string(), pa.float64())),
    })


def _asdict(v):
    return None if v is None else dict(v)


def test_map_sum_count_average(ray_session):
    t = _map_table([
        (1, [("a", 1.0), ("b", 2.0)]),
        (1, [("a", 3.0), ("c", 4.0)]),
        (2, [("a", 10.0)]),
    ])
    conf = GroupByConf(
        name="m", sources=(), key_columns=("user_id",),
        aggregations=(agg("m", "sum"), agg("m", "count"),
                      agg("m", "average")),
    )
    out = aggregate_snapshot(rd.from_arrow(t), conf, num_partitions=2) \
        .to_pandas().set_index("user_id").sort_index()
    assert _asdict(out.loc[1, "m_sum"]) == {"a": 4.0, "b": 2.0, "c": 4.0}
    assert _asdict(out.loc[1, "m_count"]) == {"a": 2, "b": 1, "c": 1}
    assert _asdict(out.loc[1, "m_average"]) == {"a": 2.0, "b": 2.0, "c": 4.0}
    assert _asdict(out.loc[2, "m_sum"]) == {"a": 10.0}


def test_map_null_entries_and_rows(ray_session):
    """Null maps and null map VALUES are skipped (reference mapIterator
    filters _.getValue != null); a key seen only with null values is
    absent from the output map."""
    t = _map_table([
        (1, None),
        (1, [("a", 1.0), ("b", None)]),
        (1, [("b", None)]),
    ])
    conf = GroupByConf(name="m", sources=(), key_columns=("user_id",),
                       aggregations=(agg("m", "sum"),))
    out = aggregate_snapshot(rd.from_arrow(t), conf, num_partitions=2) \
        .to_pandas()
    assert len(out) == 1
    assert _asdict(out.iloc[0]["m_sum"]) == {"a": 1.0}


def test_map_cross_block_merge(ray_session):
    """Partial IRs from different blocks must merge per map key through
    the shuffle — split the same key's rows across many input blocks."""
    rng = np.random.default_rng(7)
    n = 2000
    users = rng.integers(0, 5, size=n)
    keys = rng.choice(["x", "y", "z"], size=n)
    vals = rng.integers(1, 100, size=n).astype(np.float64)
    rows = [(int(u), [(str(k), float(v))]) for u, k, v in zip(users, keys, vals)]
    # many small blocks → cross-block merges guaranteed
    ds = rd.from_arrow(_map_table(rows)).repartition(16)
    conf = GroupByConf(
        name="m", sources=(), key_columns=("user_id",),
        aggregations=(agg("m", "sum"), agg("m", "min"), agg("m", "max"),
                      agg("m", "unique_count"), agg("m", "variance")),
    )
    out = aggregate_snapshot(ds, conf, num_partitions=4).to_pandas() \
        .set_index("user_id").sort_index()
    df = pd.DataFrame({"u": users, "k": keys, "v": vals})
    for u, grp in df.groupby("u"):
        for k, sub in grp.groupby("k"):
            assert _asdict(out.loc[u, "m_sum"])[k] == sub["v"].sum()
            assert _asdict(out.loc[u, "m_min"])[k] == sub["v"].min()
            assert _asdict(out.loc[u, "m_max"])[k] == sub["v"].max()
            assert _asdict(out.loc[u, "m_unique_count"])[k] == sub["v"].nunique()
            np.testing.assert_allclose(
                _asdict(out.loc[u, "m_variance"])[k],
                sub["v"].var(ddof=0), rtol=1e-9)


def test_map_unsupported_op_raises(ray_session):
    from chronon_ray.aggregators.row import RowAggregator

    t = _map_table([(1, [("a", 1.0)])])
    conf = GroupByConf(name="m", sources=(), key_columns=("user_id",),
                       aggregations=(agg("m", "last"),))
    with pytest.raises(NotImplementedError, match="map"):
        RowAggregator(conf.parts(), t.schema)


def test_map_temporal_join(ray_session):
    """Map-input aggregation through the temporal as-of path (MapPyOp):
    windowed + unbounded SUM/COUNT/MIN over map entries vs a brute-force
    pandas oracle; null maps and null entry values skipped."""
    from chronon_ray.api import UNBOUNDED, window
    from chronon_ray.pipelines.temporal import temporal_join

    rng = np.random.default_rng(4)
    n = 1200
    base = pd.Timestamp("2024-03-01").value // 10**6
    day = 86_400_000
    ts = np.sort(base + rng.integers(0, 10 * day, size=n))
    rows = []
    for i in range(n):
        if rng.random() < 0.08:
            rows.append((int(rng.integers(0, 6)), None))
            continue
        ks = rng.choice(list("abcd"), size=rng.integers(1, 4), replace=False)
        rows.append((int(rng.integers(0, 6)),
                     [(str(k), None if rng.random() < 0.1
                       else float(rng.integers(1, 20))) for k in ks]))
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array(ts, type=pa.int64()),
        "m": pa.array([r[1] for r in rows],
                      type=pa.map_(pa.string(), pa.float64())),
    })
    q = pd.DataFrame({
        "user_id": np.repeat(np.arange(6, dtype=np.int64), 8),
        "ts": np.tile(np.sort(base + rng.integers(day, 10 * day, size=8)), 6)
        .astype(np.int64),
    }).drop_duplicates(["user_id", "ts"])
    conf = GroupByConf(
        name="mt", sources=(), key_columns=("user_id",),
        aggregations=(agg("m", "sum", [window(7, "d"), UNBOUNDED]),
                      agg("m", "count", [window(7, "d")]),
                      agg("m", "min", [UNBOUNDED])),
    )
    out = temporal_join(rd.from_pandas(q), rd.from_arrow(t), conf,
                        num_partitions=3).to_pandas() \
        .set_index(["user_id", "ts"])
    evdf = pd.DataFrame({
        "u": [r[0] for r in rows], "ts": ts,
        "m": [r[1] for r in rows],
    })
    hop = 3_600_000
    for (u, qt), row in out.iterrows():
        tail = ((qt - 7 * day) // hop) * hop
        win = evdf[(evdf.u == u) & (evdf.ts < qt) & (evdf.ts >= tail)]
        unb = evdf[(evdf.u == u) & (evdf.ts < qt)]
        def fold(sub):
            d = {}
            for m in sub["m"]:
                for k, v in (m or []):
                    if v is not None:
                        d.setdefault(k, []).append(v)
            return d
        dw, du = fold(win), fold(unb)
        got_sum7 = None if row["m_sum_7d"] is None else dict(row["m_sum_7d"])
        got_cnt7 = None if row["m_count_7d"] is None else dict(row["m_count_7d"])
        got_sumu = None if row["m_sum"] is None else dict(row["m_sum"])
        got_minu = None if row["m_min"] is None else dict(row["m_min"])
        if dw:
            assert got_sum7 == {k: sum(v) for k, v in dw.items()}
            assert got_cnt7 == {k: len(v) for k, v in dw.items()}
        else:
            assert got_sum7 in (None, {})
        if du:
            assert got_sumu == {k: sum(v) for k, v in du.items()}
            assert got_minu == {k: min(v) for k, v in du.items()}


def test_map_temporal_unsupported_op_raises(ray_session):
    from chronon_ray.api import UNBOUNDED
    from chronon_ray.pipelines.temporal import temporal_join

    t = _map_table([(1, [("a", 1.0)])])
    q = pd.DataFrame({"user_id": [1], "ts": [10]})
    conf = GroupByConf(name="m", sources=(), key_columns=("user_id",),
                       aggregations=(agg("m", "last", [UNBOUNDED]),))
    with pytest.raises(NotImplementedError, match="map"):
        temporal_join(rd.from_pandas(q), rd.from_arrow(t), conf,
                      num_partitions=2)


def test_sawtooth_list_explode_exact_and_hopped(ray_session):
    """UNIQUE_COUNT/HISTOGRAM/MIN over a list column in a windowed as-of
    join (sawtooth family) — brute-force pandas oracle, both hop-rounded
    and exact window modes."""
    import pyarrow as pa
    from chronon_ray.api import window
    from chronon_ray.pipelines.temporal import temporal_join

    rng = np.random.default_rng(11)
    n = 1500
    base = pd.Timestamp("2024-03-01").value // 10**6
    day = 86_400_000
    ts = np.sort(base + rng.integers(0, 10 * day, size=n))
    toks = [rng.integers(0, 50, size=rng.integers(0, 6)).astype(np.int32).tolist()
            for _ in range(n)]
    ev = pa.table({
        "user_id": pa.array(rng.integers(0, 7, size=n), type=pa.int64()),
        "ts": pa.array(ts, type=pa.int64()),
        "tokens": pa.array(toks, type=pa.list_(pa.int32())),
    })
    qn = 60
    q = pd.DataFrame({
        "user_id": rng.integers(0, 7, size=qn).astype(np.int64),
        "ts": np.sort(base + rng.integers(day, 10 * day, size=qn)).astype(np.int64),
    }).drop_duplicates(["user_id", "ts"])
    conf = GroupByConf(
        name="lx", sources=(), key_columns=("user_id",),
        aggregations=(agg("tokens", "unique_count", [window(7, "d")]),
                      agg("tokens", "min", [window(7, "d")]),
                      agg("tokens", "histogram", [window(7, "d")])),
    )
    for exact in (False, True):
        out = temporal_join(rd.from_pandas(q), rd.from_arrow(ev), conf,
                            num_partitions=3, exact_windows=exact) \
            .to_pandas().set_index(["user_id", "ts"])
        evdf = pd.DataFrame({"u": ev["user_id"].to_numpy(),
                             "ts": ev["ts"].to_numpy(),
                             "tok": [list(t) for t in toks]})
        hop = 3_600_000
        for (u, qt), row in out.iterrows():
            tail = qt - 7 * day if exact else ((qt - 7 * day) // hop) * hop
            sel = evdf[(evdf.u == u) & (evdf.ts < qt) & (evdf.ts >= tail)]
            flat = [e for lst in sel["tok"] for e in lst]
            if flat:
                assert row["tokens_unique_count_7d"] == len(set(flat))
                assert row["tokens_min_7d"] == min(flat)
                got_hist = dict(row["tokens_histogram_7d"])
                exp = pd.Series([str(x) for x in flat]).value_counts()
                assert got_hist == exp.to_dict()
            else:
                assert pd.isna(row["tokens_unique_count_7d"])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_map_agg_equals_exploded_scalar_agg(ray_session, seed):
    """Property: aggregating a map column per map key == exploding the map
    to (key-col, map-key, value) rows and aggregating the scalar column at
    (key, map-key) granularity — for every supported op, under random
    maps with nulls and duplicate keys across rows."""
    rng = np.random.default_rng(seed)
    n = 800
    users = rng.integers(0, 12, size=n)
    rows = []
    for u in users:
        if rng.random() < 0.1:
            rows.append((int(u), None))
            continue
        ks = rng.choice(list("abcdef"), size=rng.integers(0, 4),
                        replace=False)
        rows.append((int(u), [(str(k),
                               None if rng.random() < 0.15
                               else float(rng.integers(0, 50)))
                              for k in ks]))
    t = _map_table(rows)
    conf = GroupByConf(
        name="m", sources=(), key_columns=("user_id",),
        aggregations=(agg("m", "sum"), agg("m", "count"), agg("m", "min"),
                      agg("m", "max"), agg("m", "average"),
                      agg("m", "unique_count"), agg("m", "variance")),
    )
    out = aggregate_snapshot(rd.from_arrow(t).repartition(7), conf,
                             num_partitions=3).to_pandas() \
        .set_index("user_id").sort_index()
    # oracle: explode in pandas
    recs = []
    for u, m in rows:
        for k, v in (m or []):
            if v is not None:
                recs.append((u, k, v))
    df = pd.DataFrame(recs, columns=["u", "k", "v"])
    for (u, k), sub in df.groupby(["u", "k"]):
        assert _asdict(out.loc[u, "m_sum"])[k] == sub["v"].sum()
        assert _asdict(out.loc[u, "m_count"])[k] == len(sub)
        assert _asdict(out.loc[u, "m_min"])[k] == sub["v"].min()
        assert _asdict(out.loc[u, "m_max"])[k] == sub["v"].max()
        np.testing.assert_allclose(_asdict(out.loc[u, "m_average"])[k],
                                   sub["v"].mean(), rtol=1e-9)
        assert _asdict(out.loc[u, "m_unique_count"])[k] == sub["v"].nunique()
        np.testing.assert_allclose(_asdict(out.loc[u, "m_variance"])[k],
                                   sub["v"].var(ddof=0), rtol=1e-9, atol=1e-12)
    # and no phantom keys
    for u, grp in df.groupby("u"):
        assert set(_asdict(out.loc[u, "m_sum"])) == set(grp["k"])
