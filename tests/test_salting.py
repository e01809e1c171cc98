"""Salted hot-key path must be bit-equivalent to the single-pass path across
every aggregation family (invariance oracle — the salted re-split is a purely
physical transformation)."""

import numpy as np
import pytest
import ray.data as rd

from chronon_ray.api import GroupByConf, UNBOUNDED, agg, window
from chronon_ray.pipelines.salting import detect_hot_keys
from chronon_ray.pipelines.temporal import temporal_join
from chronon_ray.testing.tokengen import gen_events, gen_queries


def _norm(v):
    if isinstance(v, np.ndarray):
        return [_norm(e) for e in v.tolist()]
    if isinstance(v, (list, tuple)):
        return [_norm(e) for e in v]
    if isinstance(v, np.generic):
        return v.item()
    return v


@pytest.fixture(scope="module")
def data(ray_session):
    ev = gen_events(8000, n_keys=50)
    q = gen_queries(800, ev, n_keys=50)
    return ev, q


def _conf():
    return GroupByConf(
        name="b", sources=(), key_columns=("doc_id",),
        aggregations=(
            agg("n_tok", "sum", [window(7, "d"), UNBOUNDED]),
            agg("n_tok", "average", [window(7, "d")]),
            agg("n_tok", "variance", [window(7, "d")]),
            agg("tokens", "last", [window(7, "d")]),
            agg("tokens", "last_k", [window(7, "d")], k=2),
            agg("n_tok", "first", [window(7, "d")]),
            agg("source", "unique_count", [window(7, "d")]),
            agg("n_tok", "sum", [window(7, "d")], buckets=["source"]),
        ),
    )


def test_salted_equals_plain(data):
    ev, q = data
    conf = _conf()
    plain = temporal_join(rd.from_arrow(q), rd.from_arrow(ev), conf,
                          num_partitions=4).to_pandas()
    hot = ["doc_00000000", "doc_00000001", "doc_00000002"]
    salted = temporal_join(rd.from_arrow(q), rd.from_arrow(ev), conf,
                           num_partitions=4, hot_keys=hot,
                           salt_shards=4).to_pandas()
    sp = plain.sort_values(["doc_id", "ts"], kind="stable").reset_index(drop=True)
    ss = salted.sort_values(["doc_id", "ts"], kind="stable").reset_index(drop=True)
    assert len(sp) == len(ss)
    for col in sp.columns:
        if col in ("doc_id", "ts", "ds"):
            continue
        a, b = sp[col], ss[col]
        if a.dtype.kind == "f" and b.dtype.kind == "f":
            na, nb = a.isna().to_numpy(), b.isna().to_numpy()
            assert (na == nb).all(), col
            np.testing.assert_allclose(a[~na], b[~nb], rtol=1e-9, err_msg=col)
        else:
            for i, (x, y) in enumerate(zip(a, b)):
                xn, yn = _norm(x), _norm(y)
                if xn is None and yn is None:
                    continue
                if isinstance(xn, float) and isinstance(yn, float) \
                        and np.isnan(xn) and np.isnan(yn):
                    continue
                assert xn == yn, f"{col} row {i}"


def test_auto_hot_key_detection(data):
    ev, q = data
    hot = detect_hot_keys(rd.from_arrow(ev), "doc_id", num_partitions=16,
                          sample_frac=0.5, factor=2.0, min_hot_rows=0)
    # the generator pins 3 hot keys at ~10% of rows each
    assert set(hot) >= {"doc_00000000", "doc_00000001", "doc_00000002"}
    assert len(hot) <= 6


def test_salted_auto_mode(data):
    ev, q = data
    conf = GroupByConf(name="b2", sources=(), key_columns=("doc_id",),
                       aggregations=(agg("n_tok", "sum", [window(7, "d")]),))
    plain = temporal_join(rd.from_arrow(q), rd.from_arrow(ev), conf,
                          num_partitions=4).to_pandas()
    auto = temporal_join(rd.from_arrow(q), rd.from_arrow(ev), conf,
                         num_partitions=4, hot_keys="auto").to_pandas()
    sp = plain.sort_values(["doc_id", "ts"], kind="stable").reset_index(drop=True)
    sa = auto.sort_values(["doc_id", "ts"], kind="stable").reset_index(drop=True)
    a, b = sp["n_tok_sum_7d"], sa["n_tok_sum_7d"]
    na, nb = a.isna().to_numpy(), b.isna().to_numpy()
    assert (na == nb).all()
    np.testing.assert_allclose(a[~na], b[~nb], rtol=1e-12)
