"""Null-key contracts across the extras / label / mutations surfaces.

The engine-wide convention (matching the reference and the DuckDB
oracles): GROUP-BY-style operators treat the null key as its OWN group
(SQL GROUP BY); join-style operators follow SQL equality (NULL never
matches) with left-outer left rows surviving with null features; and
data-side (right/event/snapshot/mutation) null-key rows are dropped
(reference removeNulls, GroupBy.scala:181). These pins were added after
a round-4 audit found four operators silently DROPPING null-keyed rows
through pandas groupby's default dropna=True."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _events():
    return rd.from_arrow(pa.table({
        "user_id": pa.array(["a", "a", None, None, "b"]),
        "ts": pa.array([0, 100, 50, 60, 10], type=pa.int64()),
        "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0]),
    }))


def test_session_stats_null_key_group(ray_session):
    from chronon_ray.pipelines.extras import session_stats

    out = session_stats(_events(), keys=["user_id"], order_col="ts",
                        gap_ms=1000).to_pandas()
    nullrow = out[out["user_id"].isna()]
    assert len(nullrow) == 1 and int(nullrow["n_events"].iloc[0]) == 2
    assert int(nullrow["session_start"].iloc[0]) == 50
    assert len(out) == 3


def test_group_quantiles_null_key_group(ray_session):
    from chronon_ray.pipelines.extras import group_quantiles

    out = group_quantiles(_events(), keys=["user_id"], value_col="value",
                          qs=(0.5,)).to_pandas()
    nullrow = out[out["user_id"].isna()]
    assert len(nullrow) == 1 and float(nullrow["q50"].iloc[0]) == 3.5
    assert len(out) == 3


def test_group_quantiles_all_null_partition_schema(ray_session):
    """A partition containing ONLY null keys must emit the declared key
    dtype (pa.null() inference used to fail the block concat)."""
    from chronon_ray.pipelines.extras import group_quantiles

    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([None, None], type=pa.string()),
        "value": pa.array([1.0, 3.0]),
    }))
    out = group_quantiles(ds, keys=["user_id"], value_col="value",
                          qs=(0.5,)).to_pandas()
    assert len(out) == 1 and float(out["q50"].iloc[0]) == 2.0


def test_range_join_sql_null_semantics(ray_session):
    """SQL inner-join equality: NULL keys never match (the DuckDB oracle
    is `on e.user_id = iv.user_id`)."""
    from chronon_ray.pipelines.extras import range_join

    iv = rd.from_arrow(pa.table({
        "user_id": pa.array(["a", None]),
        "start_ts": pa.array([0, 40], type=pa.int64()),
        "end_ts": pa.array([120, 70], type=pa.int64()),
        "tag": pa.array(["x", "y"]),
    }))
    out = range_join(_events(), iv, keys=["user_id"]).to_pandas()
    assert out["user_id"].notna().all(), out
    assert len(out) == 2  # a@0 and a@100 inside [0, 120)
    assert set(out["tag"]) == {"x"}


def test_latest_label_view_null_key_identity(ray_session):
    """A null-keyed feature identity is still an identity: the latest
    view keeps it and picks the max label_ds version."""
    from chronon_ray.pipelines.joins import latest_label_view

    v1 = pa.table({"user_id": pa.array(["a", None, "b"]),
                   "ts": pa.array([1, 2, 3], type=pa.int64()),
                   "lab": pa.array([1.0, 2.0, 3.0]),
                   "label_ds": pa.array(["2026-01-01"] * 3)})
    v2 = pa.table({"user_id": pa.array(["a", None]),
                   "ts": pa.array([1, 2], type=pa.int64()),
                   "lab": pa.array([10.0, 20.0]),
                   "label_ds": pa.array(["2026-01-02"] * 2)})
    out = latest_label_view([rd.from_arrow(v1), rd.from_arrow(v2)],
                            ["user_id"], num_partitions=4).to_pandas()
    assert len(out) == 3
    nullrow = out[out["user_id"].isna()]
    assert float(nullrow["lab"].iloc[0]) == 20.0
    assert nullrow["label_ds"].iloc[0] == "2026-01-02"


def test_temporal_entities_null_key_left_outer(ray_session):
    """Null-keyed QUERY rows come out with null features; null-keyed
    snapshot/mutation rows are dropped (removeNulls) and never leak into
    the null-key query's features."""
    from chronon_ray.api import GroupByConf, agg
    from chronon_ray.pipelines.mutations import temporal_entities_join

    snaps = pa.table({"user_id": pa.array(["a", "b", None]),
                      "ds": pa.array(["2026-01-01"] * 3),
                      "value": pa.array([10.0, 20.0, 99.0])})
    base = int(pd.Timestamp("2026-01-02").timestamp()) * 1000
    muts = pa.table({"user_id": pa.array(["a", None]),
                     "mutation_ts": pa.array([base + 100] * 2,
                                             type=pa.int64()),
                     "is_before": pa.array([False, False]),
                     "value": pa.array([5.0, 77.0])})
    qs = pa.table({"user_id": pa.array(["a", None, "b"]),
                   "ts": pa.array([base + 200, base + 300, base + 50],
                                  type=pa.int64())})
    conf = GroupByConf(name="t", sources=(), key_columns=("user_id",),
                       aggregations=(agg("value", "sum"),))
    out = temporal_entities_join(
        rd.from_arrow(qs), rd.from_arrow(snaps), rd.from_arrow(muts),
        conf, num_partitions=4).to_pandas()
    assert len(out) == 3
    nullrow = out[out["user_id"].isna()]
    assert len(nullrow) == 1 and np.isnan(nullrow["value_sum"].iloc[0])
    byk = out.dropna(subset=["user_id"]).set_index("user_id")["value_sum"]
    assert byk["a"] == 15.0 and byk["b"] == 20.0
