"""Analyzer-lite: bad configs fail at plan time with readable errors
(reference spark/Analyzer.scala:279-661)."""

import pytest

from chronon_ray.analyzer import (
    AnalyzerError,
    analyze_group_by,
    check_availability,
    check_group_by,
    check_join,
)
from chronon_ray.api import (
    EventSource,
    GroupByConf,
    JoinConf,
    JoinPart,
    TQuery,
    agg,
    window,
)


def _ev_src(sf_dir):
    return EventSource(table=f"{sf_dir}/events.parquet", query=TQuery())


def test_clean_config_passes(ray_session, sf_dir):
    conf = GroupByConf(name="ok", sources=(_ev_src(sf_dir),),
                       key_columns=("user_id",),
                       aggregations=(agg("value", "sum", [window(7, "d")]),))
    assert analyze_group_by(conf) == []
    check_group_by(conf)  # no raise


def test_missing_key_and_input(ray_session, sf_dir):
    conf = GroupByConf(name="bad", sources=(_ev_src(sf_dir),),
                       key_columns=("nope_key",),
                       aggregations=(agg("nope_col", "sum"),))
    with pytest.raises(AnalyzerError) as ei:
        check_group_by(conf)
    msg = str(ei.value)
    assert "nope_key" in msg and "nope_col" in msg


def test_numeric_op_on_string(ray_session, sf_dir):
    conf = GroupByConf(name="bad2", sources=(_ev_src(sf_dir),),
                       key_columns=("user_id",),
                       aggregations=(agg("event_type", "sum"),))
    issues = analyze_group_by(conf)
    assert any("needs a numeric" in i for i in issues)


def test_duplicate_outputs(ray_session, sf_dir):
    conf = GroupByConf(name="dup", sources=(_ev_src(sf_dir),),
                       key_columns=("user_id",),
                       aggregations=(agg("value", "sum"), agg("value", "sum")))
    issues = analyze_group_by(conf)
    assert any("duplicate output" in i for i in issues)


def test_join_key_mapping_missing_left_col(ray_session, sf_dir):
    gb = GroupByConf(name="gb", sources=(_ev_src(sf_dir),),
                     key_columns=("user_id",),
                     aggregations=(agg("value", "sum"),))
    left = EventSource(
        table=f"{sf_dir}/events.parquet",
        query=TQuery.of(selects={"other_id": "event_id", "ts": "ts"}))
    jc = JoinConf(name="j", left=left, parts=(JoinPart(group_by=gb),))
    with pytest.raises(AnalyzerError) as ei:
        check_join(jc)
    assert "user_id" in str(ei.value)


def test_join_duplicate_part_outputs(ray_session, sf_dir):
    gb = GroupByConf(name="gb", sources=(_ev_src(sf_dir),),
                     key_columns=("user_id",),
                     aggregations=(agg("value", "sum"),))
    left = EventSource(table=f"{sf_dir}/events.parquet", query=TQuery())
    jc = JoinConf(name="j", left=left,
                  parts=(JoinPart(group_by=gb), JoinPart(group_by=gb)))
    issues = __import__("chronon_ray.analyzer", fromlist=["analyze_join"]) \
        .analyze_join(jc)
    assert any("produced by both" in i for i in issues)


def test_availability(tmp_path):
    import numpy as np
    import pyarrow as pa

    from chronon_ray.testing.tokengen import write_partitioned

    tbl = pa.table({"x": np.arange(10),
                    "ds": ["2024-01-05"] * 5 + ["2024-01-06"] * 5})
    d = str(tmp_path / "t")
    write_partitioned(tbl, d)
    # window reaches before the earliest partition → issue
    issues = check_availability(d, "2024-01-06", "2024-01-06",
                                max_window_days=7)
    assert issues and "miss history" in issues[0]
    # fits → clean
    assert check_availability(d, "2024-01-06", "2024-01-06",
                              max_window_days=1) == []
    # end beyond latest partition → issue
    issues = check_availability(d, "2024-01-06", "2024-01-09",
                                max_window_days=1)
    assert issues and "before the requested end" in issues[0]
