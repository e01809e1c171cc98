"""Property & invariance tests (SURVEY §5 tier 4):

- zero temporal leakage: every contributing event satisfies e.ts < q.ts and
  e.ts >= hop-rounded tail (checked against an exclusive-future fixture);
- partition-count invariance: num_partitions must not change results;
- stepDays invariance: chunked backfill == one-shot backfill (covered in
  test_backfill.py::test_backfill_matches_direct with step_days=1).
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from chronon_ray.api import GroupByConf, UNBOUNDED, agg, window
from chronon_ray.pipelines.temporal import temporal_join
from chronon_ray.testing.tokengen import gen_events, gen_queries


def test_zero_temporal_leakage(ray_session):
    """Construct events strictly in the future of every query — every feature
    must be null; then events exactly AT query ts — still null (strict <)."""
    n = 500
    base = 1_700_000_000_000
    ev = pa.table({
        "doc_id": pa.array([f"k{i % 7}" for i in range(n)]),
        "ts": pa.array([base + 1_000_000 + i for i in range(n)], type=pa.int64()),
        "v": pa.array(np.arange(n, dtype=np.float64)),
    })
    q = pa.table({
        "doc_id": pa.array([f"k{i % 7}" for i in range(50)]),
        "ts": pa.array([base + (i % 100) for i in range(50)], type=pa.int64()),
    })
    conf = GroupByConf(name="z", sources=(), key_columns=("doc_id",),
                       aggregations=(agg("v", "sum", [window(7, "d"), UNBOUNDED]),
                                     agg("v", "last", [UNBOUNDED]),
                                     agg("v", "unique_count", [window(1, "d")])))
    out = temporal_join(rd.from_arrow(q), rd.from_arrow(ev), conf,
                        num_partitions=4).to_pandas()
    assert out["v_sum_7d"].isna().all()
    assert out["v_sum"].isna().all()
    assert out["v_last"].isna().all()
    assert out["v_unique_count_1d"].isna().all()

    # exact ties: ONE query per key, one event exactly at its ts — excluded
    q2 = pa.table({
        "doc_id": pa.array([f"k{i}" for i in range(7)]),
        "ts": pa.array([base + i * 1000 for i in range(7)], type=pa.int64()),
    })
    ev2 = pa.table({
        "doc_id": q2["doc_id"],
        "ts": q2["ts"],
        "v": pa.array(np.ones(len(q2), dtype=np.float64)),
    })
    out2 = temporal_join(rd.from_arrow(q2), rd.from_arrow(ev2), conf,
                         num_partitions=4).to_pandas()
    assert out2["v_sum"].isna().all(), "event at q.ts leaked into the window"


def test_partition_count_invariance(ray_session):
    ev = gen_events(5000, n_keys=40)
    q = gen_queries(500, ev, n_keys=40)
    conf = GroupByConf(name="p", sources=(), key_columns=("doc_id",),
                       aggregations=(agg("n_tok", "sum", [window(7, "d")]),
                                     agg("source", "unique_count", [window(7, "d")]),
                                     agg("n_tok", "last_k", [window(7, "d")], k=3)))
    outs = []
    for p in (2, 7, 16):
        out = temporal_join(rd.from_arrow(q), rd.from_arrow(ev), conf,
                            num_partitions=p).to_pandas()
        outs.append(out.sort_values(["doc_id", "ts"], kind="stable")
                    .reset_index(drop=True))
    a = outs[0]
    for b in outs[1:]:
        assert len(a) == len(b)
        s1, s2 = a["n_tok_sum_7d"], b["n_tok_sum_7d"]
        na, nb = s1.isna().to_numpy(), s2.isna().to_numpy()
        assert (na == nb).all()
        np.testing.assert_allclose(s1[~na], s2[~nb], rtol=0)
        np.testing.assert_array_equal(
            a["source_unique_count_7d"].fillna(-1).astype(int),
            b["source_unique_count_7d"].fillna(-1).astype(int))
        for x, y in zip(a["n_tok_last3_7d"], b["n_tok_last3_7d"]):
            if x is None and y is None:
                continue
            assert list(x) == list(y)


def test_tail_hop_rounding_boundary(ray_session):
    """An event exactly at the hop-rounded tail is INCLUDED (>= tail); one
    just below is excluded — pins TsUtils.round semantics."""
    from chronon_ray.windowing.resolution import round_ts, tail_hop_millis

    w = window(1, "d")
    hop = tail_hop_millis(w)  # 1h for a 1-day window
    q_ts = 1_700_000_000_000
    tail = round_ts(q_ts - w.millis, hop)
    ev = pa.table({
        "doc_id": pa.array(["k", "k"]),
        "ts": pa.array([tail, tail - 1], type=pa.int64()),
        "v": pa.array([1.0, 100.0]),
    })
    q = pa.table({"doc_id": pa.array(["k"]), "ts": pa.array([q_ts], type=pa.int64())})
    conf = GroupByConf(name="h", sources=(), key_columns=("doc_id",),
                       aggregations=(agg("v", "sum", [w]),))
    out = temporal_join(rd.from_arrow(q), rd.from_arrow(ev), conf,
                        num_partitions=2).to_pandas()
    assert out["v_sum_1d"].iloc[0] == 1.0
