"""Randomized differential for the bootstrap-join lifecycle.

compute_join_bootstrapped must equal a per-cell OVERLAY oracle: bootstrap
value where a covering table provides one (non-null), else the computed
feature (base compute_join output). Random coverage subsets, per-column
partial coverage, null bootstrap cells falling back to compute, two
bootstrap tables with earlier-wins precedence.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from chronon_ray.api import (
    BootstrapPart,
    EventSource,
    GroupByConf,
    JoinConf,
    JoinPart,
    TQuery,
    UNBOUNDED,
    agg,
    window,
)
from chronon_ray.pipelines.joins import compute_join, compute_join_bootstrapped

MS_H = 3_600_000


def _write_rand_events(rng, path, n=400, n_users=7):
    uid = rng.integers(0, n_users, size=n).astype(object)
    uid[rng.random(n) < 0.05] = None
    val = rng.normal(50, 20, size=n).round(3).astype(object)
    val[rng.random(n) < 0.1] = None
    t = pa.table({
        "user_id": pa.array(uid.tolist(), type=pa.int64()),
        "ts": pa.array((rng.integers(0, 14 * 24, size=n) * MS_H)
                       .astype(np.int64)),
        "value": pa.array(val.tolist(), type=pa.float64()),
        "event_type": pa.array(rng.choice(["a", "b"], size=n,
                                          p=[0.35, 0.65]).tolist()),
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
    })
    pq.write_table(t, path)


@pytest.mark.parametrize("seed", [701, 702, 703])
def test_bootstrap_overlay_vs_oracle(ray_session, tmp_path, seed):
    rng = np.random.default_rng(seed)
    path = str(tmp_path / "events.parquet")
    _write_rand_events(rng, path)

    ev_src = EventSource(table=path, query=TQuery())
    left_src = EventSource(
        table=path,
        query=TQuery.of(selects={"user_id": "user_id", "ts": "ts",
                                 "event_id": "event_id"},
                        wheres=[lambda t: pc.equal(t["event_type"], "a")]))
    gb = GroupByConf(name="g", sources=(ev_src,), key_columns=("user_id",),
                     aggregations=(agg("value", "sum", [window(7, "d")]),
                                   agg("value", "count", [UNBOUNDED])))
    base_jc = JoinConf(name=f"bj{seed}", left=left_src,
                       parts=(JoinPart(group_by=gb),),
                       row_ids=("event_id",))
    full = compute_join(base_jc, num_partitions=8).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    sum_col, cnt_col = "g_value_sum_7d", "g_value_count"
    ids = full["event_id"].to_numpy()

    # bootstrap table 1: random subset, SENTINEL sums (≠ computed), ~25%
    # null cells (must fall back to compute)
    a_ids = rng.choice(ids, size=max(1, len(ids) // 3), replace=False)
    a_sum = (1e6 + a_ids).astype(object)
    a_sum[rng.random(len(a_ids)) < 0.25] = None
    bs1 = rd.from_arrow(pa.table({
        "event_id": pa.array(np.sort(a_ids).astype(np.int64)),
        sum_col: pa.array(a_sum[np.argsort(a_ids)].tolist(),
                          type=pa.float64()),
    }))
    # bootstrap table 2: different subset, covers the COUNT column, plus
    # sums that must LOSE to table 1 where both cover
    b_ids = rng.choice(ids, size=max(1, len(ids) // 3), replace=False)
    order = np.argsort(b_ids)
    bs2 = rd.from_arrow(pa.table({
        "event_id": pa.array(np.sort(b_ids).astype(np.int64)),
        sum_col: pa.array((2e6 + np.sort(b_ids)).astype(np.float64)),
        cnt_col: pa.array((np.sort(b_ids) * 2).astype(np.int64)),
    }))

    jc2 = JoinConf(name=f"bj{seed}", left=left_src,
                   parts=(JoinPart(group_by=gb),),
                   row_ids=("event_id",),
                   bootstrap_parts=(BootstrapPart(table=bs1),
                                    BootstrapPart(table=bs2)))
    boot = compute_join_bootstrapped(jc2, num_partitions=8).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert len(boot) == len(full), seed

    a_map = dict(zip(a_ids, a_sum))
    b_set = set(b_ids.tolist())

    def exp_sum(row_id, computed):
        if row_id in a_map and a_map[row_id] is not None:
            return float(a_map[row_id])  # earlier table wins
        if row_id in a_map:  # covered but null → next table, then compute
            if row_id in b_set:
                return 2e6 + row_id
            return computed
        if row_id in b_set:
            return 2e6 + row_id
        return computed

    def exp_cnt(row_id, computed):
        return float(row_id * 2) if row_id in b_set else computed

    comp_sum = full[sum_col].astype(float).to_numpy()
    comp_cnt = full[cnt_col].astype(float).to_numpy()
    want_sum = np.array([exp_sum(i, c)
                         for i, c in zip(ids, comp_sum)], dtype=float)
    want_cnt = np.array([exp_cnt(i, c)
                         for i, c in zip(ids, comp_cnt)], dtype=float)
    got_sum = boot[sum_col].astype(float).to_numpy()
    got_cnt = boot[cnt_col].astype(float).to_numpy()
    for got, want, name in [(got_sum, want_sum, sum_col),
                            (got_cnt, want_cnt, cnt_col)]:
        nan_g, nan_w = np.isnan(got), np.isnan(want)
        assert (nan_g == nan_w).all(), (seed, name,
                                        int((nan_g != nan_w).sum()))
        np.testing.assert_allclose(got[~nan_g], want[~nan_w], rtol=1e-12,
                                   err_msg=f"{seed}:{name}")

    # lineage: exactly the union of covered rows carries matched hashes
    hit = boot["matched_hashes"].map(
        lambda v: v is not None and len(v) > 0).to_numpy()
    covered = np.array([i in a_map or i in b_set for i in ids])
    np.testing.assert_array_equal(hit, covered, err_msg=str(seed))
