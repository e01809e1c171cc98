"""Mimics the driver's correctness gate: every queries() entry with an
oracle_sql() must match DuckDB on row-count + order-insensitive values."""

import importlib
import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod  # noqa: E402


def _to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: None if v is None or
                              (isinstance(v, float) and np.isnan(v)) else v)
        try:
            df[c] = df[c].astype("float64")
        except (ValueError, TypeError):
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


ORACLE_KEYS = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_vs_oracle(ray_session, duck, sf_dir, name):
    q = entrymod.queries()[name]
    got_raw = _to_pandas(q(sf_dir))
    exp_raw = duck.sql(entrymod.oracle_sql()[name]).df()
    # the driver's value hash is dtype-sensitive (int64 5 vs float64 5.0
    # hash differently) — enforce matching dtype KIND before the lossy
    # float canonicalization below
    for c in sorted(set(got_raw.columns) & set(exp_raw.columns)):
        gk = got_raw[c].dtype.kind
        ek = exp_raw[c].dtype.kind
        norm = {"u": "i", "b": "i"}
        assert norm.get(gk, gk) == norm.get(ek, ek), \
            f"{name}.{c}: dtype kind {got_raw[c].dtype} vs {exp_raw[c].dtype}"
    got = _canon(got_raw)
    exp = _canon(exp_raw)
    assert list(got.columns) == list(exp.columns), (got.columns, exp.columns)
    assert len(got) == len(exp), f"{name}: {len(got)} vs {len(exp)} rows"
    for c in got.columns:
        a, b = got[c], exp[c]
        if a.dtype.kind == "f":
            an, bn = a.isna(), b.isna()
            assert (an == bn).all(), f"{name}.{c} null mismatch"
            np.testing.assert_allclose(a[~an], b[~bn], rtol=1e-9,
                                       err_msg=f"{name}.{c}")
        else:
            assert (a == b).all(), f"{name}.{c}"


def test_rows_only_queries(ray_session, sf_dir):
    names = [k for k in entrymod.queries() if k not in entrymod.oracle_sql()]
    for name in names:
        res = _to_pandas(entrymod.queries()[name](sf_dir))
        assert res is not None and len(res) >= 0, name


def test_entry(ray_session):
    res = _to_pandas(entrymod.entry())
    assert len(res) > 0


def test_running_agg_null_prefix(ray_session):
    """Rows whose cumulative window holds only NULL values report NULL
    running_sum/min/max (SQL window semantics), not 0.0."""
    import pandas as pd
    import ray.data

    from chronon_ray.pipelines.extras import running_aggregate

    df = pd.DataFrame({"k": [1, 1, 1], "ts": [1, 2, 3],
                       "value": [None, None, 5.0]})
    out = running_aggregate(ray.data.from_pandas(df), keys=["k"],
                            value_col="value", num_partitions=2) \
        .to_pandas().sort_values("ts")
    assert np.isnan(out["running_sum"].iloc[0])
    assert np.isnan(out["running_sum"].iloc[1])
    assert out["running_sum"].iloc[2] == 5.0
    assert list(out["running_count"]) == [0, 0, 1]
