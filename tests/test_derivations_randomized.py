"""Randomized differential for the derivation layer: random expression
trees (arithmetic over feature columns, sql_expr escape hatch, renames,
"*" passthrough) applied by apply_derivations over a real join output
must match DuckDB evaluating the SAME expressions over the SAME
pre-derivation rows. Covers the pc.*-callable path and the per-batch
DuckDB path, null propagation, and division edge cases."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from chronon_ray.api import GroupByConf, agg, window
from chronon_ray.expr import sql_expr
from chronon_ray.pipelines.joins import apply_derivations
from chronon_ray.pipelines.temporal import temporal_join

DAY = 86_400_000
BASE = pd.Timestamp("2024-03-01").value // 10**6

# (name template, sql text, builder) — sql text uses {a}/{b} feature refs
_EXPR_POOL = [
    ("sum_plus", "{a} + {b}"),
    ("diff", "{a} - {b}"),
    ("prod", "{a} * {b}"),
    ("safe_ratio", "case when {b} is null or {b} = 0 then null "
                   "else {a} / {b} end"),
    ("clipped", "case when {a} > 50 then 50.0 else {a} end"),
    ("nullif_neg", "case when {a} < 0 then null else {a} end"),
]


@pytest.mark.parametrize("seed", [701, 702, 703])
def test_derivations_vs_duckdb_randomized(ray_session, seed):
    import duckdb

    rng = np.random.default_rng(seed)
    n = int(rng.integers(1200, 2400))
    ev = pd.DataFrame({
        "user_id": rng.integers(0, 20, size=n).astype(np.int64),
        "ts": (BASE + rng.integers(0, 15 * DAY, size=n)).astype(np.int64),
        "value": np.round(rng.normal(0, 30, size=n), 3),
        "amount": np.round(rng.exponential(9, size=n), 3),
    })
    ev.loc[rng.random(n) < 0.07, "value"] = np.nan
    conf = GroupByConf(
        name=f"der{seed}", sources=(), key_columns=("user_id",),
        aggregations=(agg("value", "sum", [window(7, "d")]),
                      agg("amount", "count", [window(7, "d")]),
                      agg("value", "min", [window(3, "d")])))
    nq = 200
    q = pd.DataFrame({
        "user_id": rng.integers(0, 24, size=nq).astype(np.int64),
        "ts": (BASE + rng.integers(DAY, 15 * DAY, size=nq)).astype(np.int64)})
    joined = temporal_join(rd.from_pandas(q), rd.from_pandas(ev), conf,
                           num_partitions=4)
    base_pdf = joined.to_pandas()
    feat_cols = ["value_sum_7d", "amount_count_7d", "value_min_3d"]

    picks = rng.choice(len(_EXPR_POOL), size=3, replace=False)
    derivs = [("*", "*")]
    sql_select = ["*"]
    for i in picks:
        nm, tpl = _EXPR_POOL[i]
        a, b = rng.choice(feat_cols, size=2, replace=False)
        text = tpl.format(a=a, b=b)
        derivs.append((nm, sql_expr(text)))
        sql_select.append(f"({text}) as {nm}")
    # plus a plain rename (string expr path)
    derivs.append(("renamed_sum", "value_sum_7d"))
    sql_select.append("value_sum_7d as renamed_sum")

    got = apply_derivations(
        rd.from_pandas(base_pdf), derivs).to_pandas() \
        .sort_values(["user_id", "ts"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("base", base_pdf)
    exp = con.sql(f"select {', '.join(sql_select)} from base").df() \
        .sort_values(["user_id", "ts"]).reset_index(drop=True)
    con.close()
    assert sorted(got.columns) == sorted(exp.columns), seed
    for c in exp.columns:
        av, bv = got[c], exp[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av, bv = av.astype(float), bv.astype(float)
            assert (av.isna() == bv.isna()).all(), (seed, c)
            np.testing.assert_allclose(av.dropna(), bv.dropna(), rtol=1e-9,
                                       err_msg=f"{seed}:{c}")
        else:
            assert (av.fillna(-1) == bv.fillna(-1)).all(), (seed, c)
