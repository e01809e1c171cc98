"""lag/lead and sessionization vs DuckDB window-function oracles."""

import numpy as np
import pytest
import ray.data

from chronon_ray.api import TQuery
from chronon_ray.pipelines.extras import lag_lead, session_stats, sessionize
from chronon_ray.sources import scan_table

GAP_MS = 30 * 60 * 1000


@pytest.fixture(scope="module")
def events_ds(ray_session, sf_dir):
    return scan_table(f"{sf_dir}/events.parquet", TQuery(time_column="ts"))


def test_lag_lead_vs_duckdb(events_ds, duck):
    out = lag_lead(events_ds, keys=["user_id"], value_cols=["value"],
                   lags=[1], leads=[1], tie_break="event_id",
                   num_partitions=8).to_pandas()
    out = out.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    exp = duck.sql("""
        select user_id, epoch_ms(ts) as ts, event_id, value,
               lag(value) over w as value_lag1,
               lead(value) over w as value_lead1
        from events
        window w as (partition by user_id order by epoch_ms(ts), event_id)
        order by user_id, ts, event_id
    """).df()
    assert len(out) == len(exp)
    for col in ["value_lag1", "value_lead1"]:
        g = out[col].astype(float).to_numpy()
        w = exp[col].astype(float).to_numpy()
        nan = np.isnan(g) & np.isnan(w)
        assert (np.isnan(g) == np.isnan(w)).all(), col
        np.testing.assert_allclose(g[~nan], w[~nan], rtol=0, err_msg=col)


def test_sessionize_vs_duckdb(events_ds, duck):
    out = sessionize(events_ds, keys=["user_id"], gap_ms=GAP_MS,
                     tie_break="event_id", num_partitions=8).to_pandas()
    out = out.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    exp = duck.sql(f"""
        with t as (
            select user_id, epoch_ms(ts) as ts, event_id,
                   case when epoch_ms(ts) - lag(epoch_ms(ts)) over w > {GAP_MS}
                        or lag(epoch_ms(ts)) over w is null then 1 else 0 end as new_sess
            from events window w as (partition by user_id order by epoch_ms(ts), event_id)
        )
        select user_id, ts, event_id,
               sum(new_sess) over (partition by user_id order by ts, event_id) - 1
                   as session_id
        from t order by user_id, ts, event_id
    """).df()
    np.testing.assert_array_equal(out["session_id"].astype(int),
                                  exp["session_id"].astype(int))


def test_session_stats_vs_duckdb(events_ds, duck):
    out = session_stats(events_ds, keys=["user_id"], gap_ms=GAP_MS,
                        tie_break="event_id", num_partitions=8).to_pandas()
    out = out.sort_values(["user_id", "session_id"]).reset_index(drop=True)
    exp = duck.sql(f"""
        with t as (
            select user_id, epoch_ms(ts) as ts, event_id,
                   case when epoch_ms(ts) - lag(epoch_ms(ts)) over w > {GAP_MS}
                        or lag(epoch_ms(ts)) over w is null then 1 else 0 end as new_sess
            from events window w as (partition by user_id order by epoch_ms(ts), event_id)
        ), s as (
            select user_id, ts,
                   sum(new_sess) over (partition by user_id order by ts, event_id) - 1
                       as session_id
            from t
        )
        select user_id, session_id, min(ts) as session_start, max(ts) as session_end,
               count(*) as n_events
        from s group by user_id, session_id order by user_id, session_id
    """).df()
    assert len(out) == len(exp)
    np.testing.assert_array_equal(out["session_start"], exp["session_start"])
    np.testing.assert_array_equal(out["session_end"], exp["session_end"])
    np.testing.assert_array_equal(out["n_events"].astype(int), exp["n_events"].astype(int))
