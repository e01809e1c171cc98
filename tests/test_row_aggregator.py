"""Unit tests for the columnar RowAggregator: partial → arrow round-trip →
merge → finalize, against hand-computed / pandas-computed expectations.
Mirrors the reference's aggregator unit-test tier (RowAggregatorTest.scala)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from chronon_ray.api import AggregationPart, Operation, UNBOUNDED, agg, unpack_aggregations
from chronon_ray.aggregators.row import RowAggregator


def _tbl():
    rng = np.random.Generator(np.random.PCG64(7))
    n = 500
    g = rng.integers(0, 5, size=n)
    v = rng.normal(10, 3, size=n)
    v[rng.random(n) < 0.05] = np.nan  # nulls
    ts = rng.integers(1_700_000_000_000, 1_700_100_000_000, size=n)
    cat = np.array(["a", "b", "c", "d"])[rng.integers(0, 4, size=n)]
    toks = [rng.integers(0, 100, size=rng.integers(2, 6)).astype(np.int32) for _ in range(n)]
    tbl = pa.table({
        "g_key": pa.array(g.astype(str)),
        "v": pa.array(v, from_pandas=True),  # NaN → null
        "iv": pa.array((np.nan_to_num(v) * 10).astype(np.int64)),
        "ts": pa.array(ts, type=pa.int64()),
        "cat": pa.array(cat),
        "tokens": pa.array([t.tolist() for t in toks], type=pa.list_(pa.int32())),
    })
    return tbl, g, v, ts, cat, toks


def run_agg(tbl, codes, parts, n_chunks=3, tie_break=None):
    """Split into chunks, partial each, arrow-roundtrip, merge, finalize —
    exactly the distributed dataflow, in-process."""
    ra = RowAggregator(parts, tbl.schema, tie_break_column=tie_break)
    n = len(tbl)
    bounds = np.linspace(0, n, n_chunks + 1).astype(int)
    frames = []
    for i in range(n_chunks):
        sub = tbl.slice(bounds[i], bounds[i + 1] - bounds[i])
        sub_codes = codes[bounds[i]:bounds[i + 1]]
        irf = ra.partial_frame(sub, sub_codes, int(codes.max()) + 1)
        at = ra.ir_frame_to_arrow(irf, {"g": pa.array(irf["g"].to_numpy())})
        frames.append(ra.ir_frame_from_pandas(at.to_pandas()))
    df = pd.concat(frames, ignore_index=True)
    merged = ra.merge_frame(df)
    fin = ra.finalize_frame(merged)
    return fin.set_index("g").sort_index()


def test_numeric_ops():
    tbl, g, v, ts, cat, toks = _tbl()
    parts = unpack_aggregations([
        agg("v", "sum"), agg("v", "count"), agg("v", "average"),
        agg("v", "min"), agg("v", "max"), agg("v", "variance"),
        agg("v", "skew"), agg("v", "kurtosis"),
    ])
    out = run_agg(tbl, g, parts)
    pdf = pd.DataFrame({"g": g, "v": v}).dropna()
    exp = pdf.groupby("g")["v"]
    np.testing.assert_allclose(out["v_sum"].astype(float), exp.sum(), rtol=1e-9)
    np.testing.assert_allclose(out["v_count"].astype(float), exp.size(), rtol=0)
    np.testing.assert_allclose(out["v_average"].astype(float), exp.mean(), rtol=1e-9)
    np.testing.assert_allclose(out["v_min"].astype(float), exp.min(), rtol=0)
    np.testing.assert_allclose(out["v_max"].astype(float), exp.max(), rtol=0)
    np.testing.assert_allclose(out["v_variance"].astype(float), exp.var(ddof=0), rtol=1e-8)


def test_variance_skew_kurtosis_formulas():
    tbl, g, v, ts, cat, toks = _tbl()
    parts = unpack_aggregations([agg("v", "variance"), agg("v", "skew"), agg("v", "kurtosis")])
    out = run_agg(tbl, g, parts)
    pdf = pd.DataFrame({"g": g, "v": v}).dropna()
    for gk, grp in pdf.groupby("g"):
        x = grp["v"].to_numpy()
        n = len(x)
        m = x.mean()
        m2 = ((x - m) ** 2).sum()
        m3 = ((x - m) ** 3).sum()
        m4 = ((x - m) ** 4).sum()
        np.testing.assert_allclose(float(out.loc[gk, "v_variance"]), m2 / n, rtol=1e-8)
        np.testing.assert_allclose(float(out.loc[gk, "v_skew"]),
                                   np.sqrt(n) * m3 / m2**1.5, rtol=1e-7)
        np.testing.assert_allclose(float(out.loc[gk, "v_kurtosis"]),
                                   n * m4 / (m2 * m2) - 3, rtol=1e-7)


def test_first_last_and_k():
    tbl, g, v, ts, cat, toks = _tbl()
    parts = unpack_aggregations([
        agg("iv", "first"), agg("iv", "last"),
        agg("iv", "first_k", k=3), agg("iv", "last_k", k=3),
        agg("iv", "top_k", k=3), agg("iv", "bottom_k", k=3),
    ])
    out = run_agg(tbl, g, parts)
    pdf = pd.DataFrame({"g": g, "iv": (np.nan_to_num(v) * 10).astype(np.int64), "ts": ts})
    for gk, grp in pdf.groupby("g"):
        s = grp.sort_values("ts", kind="stable")
        assert out.loc[gk, "iv_first"] == s["iv"].iloc[0]
        assert out.loc[gk, "iv_last"] == s["iv"].iloc[-1]
        assert list(out.loc[gk, "iv_first3"]) == s["iv"].head(3).tolist()
        assert list(out.loc[gk, "iv_last3"]) == s["iv"].iloc[::-1].head(3).tolist()
        sv = grp["iv"].sort_values()
        assert list(out.loc[gk, "iv_top3"]) == sv.iloc[::-1].head(3).tolist()
        assert list(out.loc[gk, "iv_bottom3"]) == sv.head(3).tolist()


def test_unique_histogram():
    tbl, g, v, ts, cat, toks = _tbl()
    parts = unpack_aggregations([
        agg("cat", "unique_count"), agg("cat", "histogram"),
        agg("cat", "approx_unique_count"),
    ])
    out = run_agg(tbl, g, parts)
    pdf = pd.DataFrame({"g": g, "cat": cat})
    for gk, grp in pdf.groupby("g"):
        assert out.loc[gk, "cat_unique_count"] == grp["cat"].nunique()
        exp_hist = sorted(grp["cat"].value_counts().items())
        assert [(k2, v2) for k2, v2 in out.loc[gk, "cat_histogram"]] == exp_hist
        # HLL at lgk=8 on ≤4 distinct values is exact
        assert out.loc[gk, "cat_approx_unique_count"] == grp["cat"].nunique()


def test_token_payload_exact_roundtrip():
    """FIRST/LAST/LAST_K over the list<int32> tokens column must return the
    exact arrays (input_hint invariant)."""
    tbl, g, v, ts, cat, toks = _tbl()
    parts = unpack_aggregations([agg("tokens", "last"), agg("tokens", "last_k", k=2)])
    out = run_agg(tbl, g, parts)
    pdf = pd.DataFrame({"g": g, "ts": ts, "i": np.arange(len(g))})
    for gk, grp in pdf.groupby("g"):
        s = grp.sort_values("ts", kind="stable")
        exp_last = toks[s["i"].iloc[-1]]
        got = np.asarray(out.loc[gk, "tokens_last"], dtype=np.int32)
        np.testing.assert_array_equal(got, exp_last)
        exp_k = [toks[i] for i in s["i"].iloc[::-1].head(2)]
        got_k = [np.asarray(x, dtype=np.int32) for x in out.loc[gk, "tokens_last2"]]
        assert len(got_k) == len(exp_k)
        for a, b in zip(got_k, exp_k):
            np.testing.assert_array_equal(a, b)


def test_auto_explode_sum_count():
    """SUM/COUNT over a list column aggregate the elements (VectorDispatcher
    parity — reference ColumnAggregator.scala:80-117)."""
    tbl, g, v, ts, cat, toks = _tbl()
    parts = unpack_aggregations([agg("tokens", "sum"), agg("tokens", "count")])
    out = run_agg(tbl, g, parts)
    pdf = pd.DataFrame({"g": g, "s": [t.sum() for t in toks], "c": [len(t) for t in toks]})
    exp = pdf.groupby("g").sum()
    np.testing.assert_allclose(out["tokens_sum"].astype(float), exp["s"], rtol=0)
    np.testing.assert_allclose(out["tokens_count"].astype(float), exp["c"], rtol=0)


def test_deletable_ops_reversal():
    """Abelian-group ops support delete (mutation-reversal groundwork —
    reference api.thrift:136-165 deletable split): update then delete of the
    same value restores the prior state."""
    from chronon_ray.aggregators.ops import OPS
    from chronon_ray.api import AggregationPart, Operation

    p = AggregationPart("v", Operation.SUM)
    s = OPS[Operation.SUM]
    ir = s.py_update(None, 5.0, 1, p)
    ir = s.py_update(ir, 3.0, 2, p)
    ir = s.py_delete(ir, 5.0, 1, p)
    assert s.py_finalize(ir, p) == 3.0

    c = OPS[Operation.COUNT]
    ir = c.py_update(None, "x", 1, p)
    ir = c.py_update(ir, "y", 2, p)
    ir = c.py_delete(ir, "x", 1, p)
    assert c.py_finalize(ir, p) == 1

    a = OPS[Operation.AVERAGE]
    ir = a.py_update(None, 10.0, 1, p)
    ir = a.py_update(ir, 20.0, 2, p)
    ir = a.py_delete(ir, 10.0, 1, p)
    assert a.py_finalize(ir, p) == 20.0

    h = OPS[Operation.HISTOGRAM]
    hp = AggregationPart("v", Operation.HISTOGRAM)
    ir = h.py_update(None, "a", 1, hp)
    ir = h.py_update(ir, "b", 2, hp)
    ir = h.py_delete(ir, "a", 1, hp)
    assert h.py_finalize(ir, hp) == [("b", 1)]

    # monoid ops refuse deletion
    import pytest as _pt

    with _pt.raises(NotImplementedError):
        OPS[Operation.MIN].py_delete(None, 1, 1, AggregationPart("v", Operation.MIN))
    assert OPS[Operation.SUM].deletable and not OPS[Operation.MIN].deletable
