"""Randomized differential for the extras family vs DuckDB oracles.

Random event frames with NULL KEYS (SQL window PARTITION BY groups
nulls together — same as the engine's own-group convention), NULL
values, timestamp TIES resolved by a tie_break column, and randomized
block layouts. DuckDB runs the equivalent SQL on the identical frame."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def _gen(rng, n):
    key = np.array([f"k{i}" for i in rng.integers(0, 6, size=n)],
                   dtype=object)
    key[rng.random(n) < 0.12] = None
    # coarse ts so ties happen; unique event_id breaks them
    ts = rng.integers(0, 40, size=n).astype(np.int64) * 1000
    val = np.round(rng.normal(10, 5, size=n), 3)
    val[rng.random(n) < 0.1] = np.nan
    return pd.DataFrame({
        "user_id": key,
        "ts": ts,
        "event_id": np.arange(n, dtype=np.int64),
        "value": val,
    })


def _to_ds(df, rng, max_blocks=5):
    order = rng.permutation(len(df))
    df = df.iloc[order].reset_index(drop=True)
    nb = int(rng.integers(1, max_blocks + 1))
    cuts = np.sort(rng.choice(np.arange(1, len(df)), size=nb - 1,
                              replace=False)) if nb > 1 else np.array([], int)
    ds = None
    for idx in np.split(np.arange(len(df)), cuts):
        sub = df.iloc[idx]
        t = pa.table({
            "user_id": pa.array(sub["user_id"].tolist(), type=pa.string()),
            "ts": pa.array(sub["ts"].to_numpy()),
            "event_id": pa.array(sub["event_id"].to_numpy()),
            "value": pa.array(sub["value"].to_numpy(), from_pandas=True),
        })
        d = rd.from_arrow(t)
        ds = d if ds is None else ds.union(d)
    return ds


def _con(df):
    con = duckdb.connect()
    con.register("ev", df)
    return con


@pytest.mark.parametrize("seed", [2, 41])
def test_lag_lead_randomized(ray_session, seed):
    from chronon_ray.pipelines.extras import lag_lead

    rng = np.random.default_rng(seed)
    df = _gen(rng, int(rng.integers(60, 150)))
    out = lag_lead(_to_ds(df, rng), keys=["user_id"], value_cols=["value"],
                   lags=[1, 2], leads=[1], tie_break="event_id",
                   num_partitions=8).to_pandas()
    out = out.sort_values("event_id").reset_index(drop=True)
    con = _con(df)
    exp = con.sql("""
        select event_id,
               lag(value, 1) over w as value_lag1,
               lag(value, 2) over w as value_lag2,
               lead(value, 1) over w as value_lead1
        from ev window w as (partition by user_id order by ts, event_id)
        order by event_id
    """).df()
    for col in ["value_lag1", "value_lag2", "value_lead1"]:
        g = out[col].astype(float).to_numpy()
        w = exp[col].astype(float).to_numpy()
        assert (np.isnan(g) == np.isnan(w)).all(), (seed, col)
        m = ~np.isnan(g)
        np.testing.assert_allclose(g[m], w[m], rtol=0, err_msg=f"{seed}:{col}")


@pytest.mark.parametrize("seed", [9, 33])
def test_session_stats_randomized(ray_session, seed):
    from chronon_ray.pipelines.extras import session_stats

    rng = np.random.default_rng(seed)
    df = _gen(rng, int(rng.integers(60, 150)))
    gap = 3000
    out = session_stats(_to_ds(df, rng), keys=["user_id"], gap_ms=gap,
                        tie_break="event_id", num_partitions=8).to_pandas()
    out = out.sort_values(["user_id", "session_id"],
                          na_position="first").reset_index(drop=True)
    con = _con(df)
    exp = con.sql(f"""
        with t as (
            select user_id, ts, event_id,
                   case when ts - lag(ts) over w > {gap}
                        or lag(ts) over w is null then 1 else 0 end as ns
            from ev window w as (partition by user_id order by ts, event_id)
        ), s as (
            select user_id, ts,
                   sum(ns) over (partition by user_id
                                 order by ts, event_id) - 1 as session_id
            from t
        )
        select user_id, session_id, min(ts) as session_start,
               max(ts) as session_end, count(*) as n_events
        from s group by user_id, session_id
        order by user_id nulls first, session_id
    """).df()
    assert len(out) == len(exp), (seed, len(out), len(exp))
    np.testing.assert_array_equal(out["session_start"].to_numpy(),
                                  exp["session_start"].to_numpy())
    np.testing.assert_array_equal(out["session_end"].to_numpy(),
                                  exp["session_end"].to_numpy())
    np.testing.assert_array_equal(out["n_events"].astype(int).to_numpy(),
                                  exp["n_events"].astype(int).to_numpy())


@pytest.mark.parametrize("seed", [14, 52])
def test_running_aggregate_randomized(ray_session, seed):
    from chronon_ray.pipelines.extras import running_aggregate

    rng = np.random.default_rng(seed)
    df = _gen(rng, int(rng.integers(60, 150)))
    out = running_aggregate(_to_ds(df, rng), keys=["user_id"],
                            value_col="value", tie_break="event_id",
                            num_partitions=8).to_pandas()
    out = out.sort_values("event_id").reset_index(drop=True)
    con = _con(df)
    exp = con.sql("""
        select event_id,
               sum(value) over w as running_sum,
               count(value) over w as running_count,
               min(value) over w as running_min,
               max(value) over w as running_max,
               row_number() over w as row_number
        from ev window w as (partition by user_id order by ts, event_id
                             rows between unbounded preceding
                                      and current row)
        order by event_id
    """).df()
    np.testing.assert_array_equal(out["row_number"].astype(int).to_numpy(),
                                  exp["row_number"].astype(int).to_numpy())
    for col in ["running_sum", "running_count", "running_min", "running_max"]:
        g = out[col].astype(float).to_numpy()
        w = exp[col].astype(float).to_numpy()
        assert (np.isnan(g) == np.isnan(w)).all(), (seed, col)
        m = ~np.isnan(g)
        np.testing.assert_allclose(g[m], w[m], rtol=1e-12,
                                   err_msg=f"{seed}:{col}")


@pytest.mark.parametrize("seed", [21, 60])
def test_group_quantiles_randomized(ray_session, seed):
    from chronon_ray.pipelines.extras import group_quantiles

    rng = np.random.default_rng(seed)
    df = _gen(rng, int(rng.integers(60, 150)))
    out = group_quantiles(_to_ds(df, rng), keys=["user_id"],
                          value_col="value", qs=(0.5, 0.9),
                          num_partitions=8).to_pandas()
    out = out.sort_values("user_id", na_position="first") \
        .reset_index(drop=True)
    con = _con(df)
    exp = con.sql("""
        select user_id, count(value)::bigint as n,
               quantile_cont(value, 0.5) as q50,
               quantile_cont(value, 0.9) as q90
        from ev group by user_id
        having count(value) > 0
        order by user_id nulls first
    """).df()
    assert len(out) == len(exp), (seed, len(out), len(exp))
    np.testing.assert_array_equal(out["n"].astype(int).to_numpy(),
                                  exp["n"].astype(int).to_numpy())
    for col in ["q50", "q90"]:
        np.testing.assert_allclose(out[col].to_numpy(),
                                   exp[col].to_numpy(), rtol=1e-12,
                                   err_msg=f"{seed}:{col}")


@pytest.mark.parametrize("seed", [8, 27])
def test_range_join_randomized(ray_session, seed):
    from chronon_ray.pipelines.extras import range_join

    rng = np.random.default_rng(seed)
    df = _gen(rng, int(rng.integers(50, 120)))
    ni = int(rng.integers(10, 30))
    ikey = np.array([f"k{i}" for i in rng.integers(0, 6, size=ni)],
                    dtype=object)
    ikey[rng.random(ni) < 0.15] = None
    start = rng.integers(0, 40, size=ni).astype(np.int64) * 1000
    length = rng.integers(-2, 15, size=ni).astype(np.int64) * 1000
    iv = pd.DataFrame({"user_id": ikey, "start_ts": start,
                       "end_ts": start + length,
                       "iv_id": np.arange(ni, dtype=np.int64)})
    ivt = pa.table({"user_id": pa.array(iv["user_id"].tolist(),
                                        type=pa.string()),
                    "start_ts": pa.array(iv["start_ts"].to_numpy()),
                    "end_ts": pa.array(iv["end_ts"].to_numpy()),
                    "iv_id": pa.array(iv["iv_id"].to_numpy())})
    out = range_join(_to_ds(df, rng), rd.from_arrow(ivt),
                     keys=["user_id"], num_partitions=8).to_pandas()
    con = _con(df)
    con.register("iv", iv)
    exp = con.sql("""
        select e.event_id, i.iv_id from ev e
        join iv i on e.user_id = i.user_id
         and e.ts >= i.start_ts and e.ts < i.end_ts
    """).df()
    got = sorted(zip(out["event_id"].astype(int), out["iv_id"].astype(int)))
    want = sorted(zip(exp["event_id"].astype(int), exp["iv_id"].astype(int)))
    assert got == want, (seed, set(got) ^ set(want))
