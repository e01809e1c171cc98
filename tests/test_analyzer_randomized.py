"""Randomized planted-error suite for the plan-time analyzer: build a
random VALID conf+schema (must analyze clean), then plant one random
defect and assert the analyzer names it (reference:
spark/Analyzer.scala:279-661 analyzeGroupBy checks). Pure-function path
(explicit schema) — no Ray session needed."""

import numpy as np
import pyarrow as pa
import pytest

from chronon_ray.analyzer import analyze_group_by
from chronon_ray.api import GroupByConf, UNBOUNDED, agg, window


def _schema(cols: dict[str, pa.DataType]) -> pa.Schema:
    return pa.schema([pa.field(n, t) for n, t in cols.items()])


def _valid(rng: np.random.Generator):
    cols = {"user_id": pa.string(), "ts": pa.int64(),
            "value": pa.float64(), "cnt": pa.int32(),
            "tag": pa.string(), "toks": pa.large_list(pa.int32()),
            "bucket_col": pa.string()}
    pool = [
        agg("value", "sum", [window(7, "d")]),
        agg("cnt", "average", [UNBOUNDED]),
        agg("tag", "unique_count", [window(1, "d")]),
        agg("toks", "last_k", [window(3, "d")], k=2),
        agg("value", "top_k", [UNBOUNDED], k=3),
        agg("tag", "histogram", [window(7, "d")]),
        agg("value", "variance", [window(1, "d")], bucket="bucket_col"),
    ]
    take = sorted(rng.choice(len(pool), size=int(rng.integers(2, 5)),
                             replace=False))
    conf = GroupByConf(name="az", sources=(), key_columns=("user_id",),
                       aggregations=tuple(pool[i] for i in take))
    return conf, cols


@pytest.mark.parametrize("seed", list(range(12)))
def test_planted_defect_is_named(seed):
    rng = np.random.default_rng(seed)
    conf, cols = _valid(rng)
    assert analyze_group_by(conf, schema=_schema(cols)) == []

    defects = [
        ("key column 'user_id' missing",
         lambda: _schema({k: v for k, v in cols.items() if k != "user_id"}),
         lambda: conf),
        ("needs a 'ts' column",
         lambda: _schema({k: v for k, v in cols.items() if k != "ts"}),
         lambda: conf),
        ("'ts' must be epoch-millis int",
         lambda: _schema({**cols, "ts": pa.string()}),
         lambda: conf),
        ("needs a numeric input",
         lambda: _schema({**cols, "value": pa.string(),
                          "cnt": pa.string()}),
         lambda: GroupByConf(name="az", sources=(),
                             key_columns=("user_id",),
                             aggregations=(agg("value", "sum",
                                               [window(7, "d")]),))),
        ("missing from source",
         lambda: _schema({k: v for k, v in cols.items()
                          if k not in ("value", "cnt", "tag", "toks")}),
         lambda: conf),
        # note: a missing-k defect cannot be built through agg()/parts() —
        # the API itself raises at construction (get_int), so the
        # analyzer's _K_REQUIRED check only guards hand-built parts
        ("duplicate output columns",
         lambda: _schema(cols),
         lambda: GroupByConf(
             name="az", sources=(), key_columns=("user_id",),
             aggregations=(agg("value", "sum", [window(7, "d")]),
                           agg("value", "sum", [window(7, "d")])))),
        ("bucket column",
         lambda: _schema({k: v for k, v in cols.items()
                          if k != "bucket_col"}),
         lambda: GroupByConf(
             name="az", sources=(), key_columns=("user_id",),
             aggregations=(agg("value", "variance", [window(1, "d")],
                               bucket="bucket_col"),))),
    ]
    needle, mk_schema, mk_conf = defects[int(rng.integers(0, len(defects)))]
    issues = analyze_group_by(mk_conf(), schema=mk_schema())
    assert issues, f"defect {needle!r} not detected"
    assert any(needle in i for i in issues), (needle, issues)


def test_unbounded_nontemporal_needs_no_ts():
    """Snapshot-accuracy unbounded aggregations don't require ts."""
    conf = GroupByConf(name="az", sources=(), key_columns=("k",),
                       aggregations=(agg("v", "sum", [UNBOUNDED]),))
    sch = _schema({"k": pa.string(), "v": pa.float64()})
    assert analyze_group_by(conf, schema=sch, temporal=False) == []
