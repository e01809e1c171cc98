"""Config compile round-trip (the reference compile.py analog): authoring
dataclasses → validated JSON → identical dataclasses."""

import pytest

from chronon_ray.api import (Accuracy, EventSource, GroupByConf, JoinConf,
                             JoinPart, JoinSource, TQuery, UNBOUNDED, agg,
                             window)
from chronon_ray.compile import CompileError, compile_to_json, load_json
from chronon_ray.expr import sql_expr, sql_where


def _gb(name="gb1"):
    return GroupByConf(
        name=name,
        sources=(EventSource(
            table="events.parquet",
            query=TQuery.of(
                selects={"user_id": "user_id", "v": sql_expr("value * 2")},
                wheres=[sql_where("event_type = 'click'")],
                time_column="ts")),),
        key_columns=("user_id",),
        aggregations=(
            agg("v", "sum", [window(7, "d"), UNBOUNDED]),
            agg("v", "last_k", [window(1, "d")], k=3),
            agg("v", "sum", buckets=["event_type"]),
        ),
        accuracy=Accuracy.TEMPORAL,
        derivations=(("double_sum", sql_expr("v_sum_7d * 2")),),
        tie_break_column="event_id",
    )


def test_groupby_roundtrip():
    g = _gb()
    g2 = load_json(compile_to_json(g))
    assert g2 == g
    assert g2.semantic_hash() == g.semantic_hash()


def test_join_roundtrip_with_chained_source():
    inner = JoinConf(
        name="inner", left=EventSource(table="left.parquet"),
        parts=(JoinPart(group_by=_gb("inner_gb"),
                        key_mapping=(("uid", "user_id"),)),),
    )
    j = JoinConf(
        name="outer",
        left=EventSource(table="left.parquet",
                         query=TQuery.of(selects={"uid": "uid", "ts": "ts"})),
        parts=(
            JoinPart(group_by=_gb("gb_a"), prefix="a"),
            JoinPart(group_by=GroupByConf(
                name="chained",
                sources=(JoinSource(join=inner),),
                key_columns=("uid",),
                aggregations=(agg("inner_gb_v_sum_7d", "average"),)),
                key_mapping=(("uid", "uid"),)),
        ),
        skew_keys=(("uid", ("0", "1")),),
        derivations=(("ratio", sql_expr("a_gb_a_v_sum_7d / 2")),),
        row_ids=("uid", "ts"),
    )
    j2 = load_json(compile_to_json(j))
    assert j2 == j
    assert j2.semantic_hash() == j.semantic_hash()


def test_python_callables_rejected():
    g = GroupByConf(
        name="bad",
        sources=(EventSource(
            table="e.parquet",
            query=TQuery.of(selects={"v": lambda t: t["v"]})),),
        key_columns=("k",), aggregations=(agg("v", "sum"),))
    with pytest.raises(CompileError, match="sql"):
        compile_to_json(g)


def test_structural_validation():
    with pytest.raises(CompileError, match="key_columns"):
        compile_to_json(GroupByConf(name="x", sources=(), key_columns=(),
                                    aggregations=(agg("v", "sum"),)))
    with pytest.raises(CompileError, match="duplicate"):
        compile_to_json(GroupByConf(
            name="x", sources=(), key_columns=("k",),
            aggregations=(agg("v", "sum"), agg("v", "sum"))))
