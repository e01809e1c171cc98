"""Randomized salted-vs-plain differential for the temporal join.

Round 4 removed every salting carve-out (tie-sensitive FIRST/LAST/TOP_K,
bucketed, composite-key, map-input parts all take the salted two-stage
path now). These seeded scenarios force salting on random hot-key sets
across rotating op bundles from every family and assert the salted
output equals the plain single-pass path — the salted re-split is a
purely physical rewrite, so outputs must be identical up to float
merge-order noise in the moment family."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from chronon_ray.api import GroupByConf, UNBOUNDED, agg, window
from chronon_ray.pipelines.temporal import temporal_join

from test_upload_randomized import _events, _to_ds, _norm

_OPS = [
    lambda w: agg("value", "sum", w),
    lambda w: agg("value", "count", w),
    lambda w: agg("value", "average", w),
    lambda w: agg("value", "variance", w),
    lambda w: agg("value", "kurtosis", w),
    lambda w: agg("value", "min", w),
    lambda w: agg("value", "max", w),
    lambda w: agg("value", "first", w),
    lambda w: agg("value", "last", w),
    lambda w: agg("value", "last_k", w, k=3),
    lambda w: agg("value", "first_k", w, k=3),
    lambda w: agg("value", "top_k", w, k=3),
    lambda w: agg("value", "bottom_k", w, k=3),
    lambda w: agg("item", "unique_count", w),
    lambda w: agg("item", "histogram", w),
    lambda w: agg("tokens", "unique_count", w),
    lambda w: agg("metrics", "sum", w),
    lambda w: agg("value", "sum", w, buckets=("store",)),
]
_WINS = [lambda: [UNBOUNDED], lambda: [window(7, "d")],
         lambda: [window(12, "h")], lambda: [window(7, "d"), UNBOUNDED]]

DAY = 86_400_000
BASE = pd.Timestamp("2024-03-01").value // 10**6


@pytest.mark.parametrize("seed", [71, 72, 73, 74])
def test_salted_equals_plain_randomized(ray_session, seed):
    rng = np.random.default_rng(seed)
    ev = _events(rng, n=int(rng.integers(1500, 2600)),
                 keys=int(rng.integers(5, 12)), days=20)
    picks = rng.choice(len(_OPS), size=7, replace=False)
    aggs = tuple(_OPS[i](_WINS[int(rng.integers(0, len(_WINS)))]())
                 for i in picks)
    conf = GroupByConf(name=f"salt{seed}", sources=(),
                       key_columns=("user_id",), aggregations=aggs)
    nq = 250
    q = pd.DataFrame({
        "user_id": rng.choice(ev["user_id"].unique(),
                              size=nq).astype(np.int64),
        "ts": (BASE + rng.integers(DAY, 20 * DAY,
                                   size=nq)).astype(np.int64),
    })
    # a random half of the keys is declared hot (forced salting)
    keys = ev["user_id"].unique()
    hot = [int(k) for k in
           rng.choice(keys, size=max(1, len(keys) // 2), replace=False)]
    plain = temporal_join(rd.from_pandas(q), _to_ds(ev), conf,
                          num_partitions=4).to_pandas()
    salted = temporal_join(rd.from_pandas(q), _to_ds(ev), conf,
                           num_partitions=4, hot_keys=hot,
                           salt_shards=4).to_pandas()
    sort = ["user_id", "ts"]
    a = salted.sort_values(sort, kind="stable").reset_index(drop=True)
    b = plain.sort_values(sort, kind="stable").reset_index(drop=True)
    assert len(a) == len(b) == nq
    assert sorted(a.columns) == sorted(b.columns)
    for c in b.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av, bv = av.astype(float), bv.astype(float)
            na, nb = av.isna(), bv.isna()
            assert (na == nb).all(), (seed, c)
            # skew/kurtosis: 3rd/4th-moment merges amplify order
            # rounding between both-correct paths (~5e-9 rel seen
            # on fresh seeds; driver tolerance is 1e-6)
            rt = 1e-7 if ("skew" in c or "kurtosis" in c) else 1e-9
            np.testing.assert_allclose(av[~na], bv[~nb], rtol=rt,
                                       atol=1e-9, err_msg=f"{seed}:{c}")
        elif av.dtype == object or bv.dtype == object:
            for i, (x, y) in enumerate(zip(av, bv)):
                assert _norm(x) == _norm(y), (seed, c, i, x, y)
        else:
            assert (av.fillna(-1) == bv.fillna(-1)).all(), (seed, c)
