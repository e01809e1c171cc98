"""End-to-end snapshot GroupBy over Ray Data vs DuckDB SQL oracle on the
driver-generated events table (the reference's GroupByTest-style oracle tier —
spark/test/GroupByTest.scala:57-67)."""

import numpy as np
import pandas as pd
import pytest

from chronon_ray.api import GroupByConf, TQuery, agg
from chronon_ray.pipelines.groupby import aggregate_snapshot
from chronon_ray.sources import scan_table


@pytest.fixture(scope="module")
def events_ds(ray_session, sf_dir):
    return scan_table(f"{sf_dir}/events.parquet", TQuery(time_column="ts"))


def test_snapshot_groupby_vs_duckdb(events_ds, duck):
    conf = GroupByConf(
        name="ev_stats",
        sources=(),
        key_columns=("user_id",),
        aggregations=(
            agg("value", "sum"), agg("value", "count"), agg("value", "average"),
            agg("value", "min"), agg("value", "max"), agg("value", "variance"),
            agg("event_type", "unique_count"),
        ),
        tie_break_column="event_id",
    )
    out = aggregate_snapshot(events_ds, conf, num_partitions=8).to_pandas()
    out = out.sort_values("user_id").reset_index(drop=True)
    exp = duck.sql("""
        select user_id,
               sum(value) as value_sum,
               count(value) as value_count,
               avg(value) as value_average,
               min(value) as value_min,
               max(value) as value_max,
               var_pop(value) as value_variance,
               count(distinct event_type) as event_type_unique_count
        from events group by user_id order by user_id
    """).df()
    assert len(out) == len(exp)
    np.testing.assert_array_equal(out["user_id"], exp["user_id"])
    for col in ["value_sum", "value_average", "value_min", "value_max", "value_variance"]:
        np.testing.assert_allclose(out[col].astype(float), exp[col], rtol=1e-9)
    np.testing.assert_array_equal(out["value_count"].astype(int), exp["value_count"])
    np.testing.assert_array_equal(out["event_type_unique_count"].astype(int),
                                  exp["event_type_unique_count"])


def test_snapshot_groupby_first_last(events_ds, duck):
    conf = GroupByConf(
        name="ev_fl",
        sources=(),
        key_columns=("user_id",),
        aggregations=(agg("value", "first"), agg("value", "last"),
                      agg("value", "last_k", k=3)),
        tie_break_column="event_id",
    )
    out = aggregate_snapshot(events_ds, conf, num_partitions=8).to_pandas()
    out = out.sort_values("user_id").reset_index(drop=True)
    exp = duck.sql("""
        select user_id,
               arg_min(value, epoch_ms(ts)*1000000 + event_id) as value_first,
               arg_max(value, epoch_ms(ts)*1000000 + event_id) as value_last,
               list_slice(list(value order by epoch_ms(ts) desc, event_id desc), 1, 3)
                   as value_last3
        from events group by user_id order by user_id
    """).df()
    np.testing.assert_allclose(out["value_first"].astype(float), exp["value_first"], rtol=1e-12)
    np.testing.assert_allclose(out["value_last"].astype(float), exp["value_last"], rtol=1e-12)
    for got, want in zip(out["value_last3"], exp["value_last3"]):
        np.testing.assert_allclose(np.asarray(list(got), dtype=float),
                                   np.asarray(list(want), dtype=float), rtol=1e-12)


def test_snapshot_groupby_bucketed(events_ds, duck):
    conf = GroupByConf(
        name="ev_bucketed",
        sources=(),
        key_columns=("user_id",),
        aggregations=(agg("value", "sum", buckets=["event_type"]),
                      agg("value", "count", buckets=["event_type"])),
    )
    out = aggregate_snapshot(events_ds, conf, num_partitions=8).to_pandas()
    # explode maps to rows for comparison
    rows = []
    for _, r in out.iterrows():
        for k, v in r["value_sum_by_event_type"]:
            rows.append((r["user_id"], k, v))
    got = pd.DataFrame(rows, columns=["user_id", "event_type", "s"]) \
        .sort_values(["user_id", "event_type"]).reset_index(drop=True)
    exp = duck.sql("""
        select user_id, event_type, sum(value) as s
        from events group by user_id, event_type order by user_id, event_type
    """).df()
    assert len(got) == len(exp)
    np.testing.assert_allclose(got["s"], exp["s"], rtol=1e-9)
