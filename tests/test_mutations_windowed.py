"""Windowed temporal-entities aggregations vs an independent naive oracle
implementing the reference SawtoothMutationAggregator rules directly
(collapsed/tail-hop split with the 2-day tailBufferMillis, hop-rounded
query tails, mutation row-event-ts window checks)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from chronon_ray.api import GroupByConf, agg, window
from chronon_ray.pipelines.mutations import TAIL_BUFFER_MS, temporal_entities_join
from chronon_ray.windowing.resolution import round_ts, tail_hop_millis

MS_DAY = 86_400_000
MS_HOUR = 3_600_000
D0 = 1_704_067_200_000  # 2024-01-01T00:00Z
W3 = window(3, "d")
HOP = tail_hop_millis(W3)  # 1h


@pytest.fixture(scope="module")
def windowed_entity_data():
    """Entity rows with event ts spread over 6 days; daily snapshots of the
    then-alive rows; day-D CDC mutations (inserts with row ts = mutation_ts
    and delete/insert pairs whose before-row carries an OLD event ts);
    queries across two days."""
    rng = np.random.default_rng(21)
    keys = [f"e{i}" for i in range(5)]
    # live state per key: item -> (amount, event_ts)
    state = {k: {} for k in keys}
    snap_rows = []   # (key, ds, item, amount, ts)
    mut_rows = []    # (key, mutation_ts, is_before, item, amount, row_ts)
    item_ctr = 0
    for d in range(6):
        day_start = D0 + d * MS_DAY
        # intra-day activity BEFORE the day's snapshot is cut
        for k in keys:
            # a new item with event ts inside this day
            t = day_start + int(rng.integers(0, MS_DAY))
            item = f"i{item_ctr}"
            item_ctr += 1
            amt = float(rng.integers(1, 50))
            state[k][item] = (amt, t)
            if d >= 4:  # CDC days: also emit as mutations for query days
                mut_rows.append((k, t, False, item, amt, t))
            # occasionally delete the oldest item (CDC days only)
            if d >= 4 and len(state[k]) > 2 and rng.random() < 0.6:
                old_item = min(state[k], key=lambda i: state[k][i][1])
                oamt, ots = state[k].pop(old_item)
                dt = day_start + int(rng.integers(0, MS_DAY))
                mut_rows.append((k, dt, True, old_item, oamt, ots))
        ds = pd.Timestamp(day_start, unit="ms").strftime("%Y-%m-%d")
        for k in keys:
            for item, (amt, t) in state[k].items():
                snap_rows.append((k, ds, item, amt, t))
    snapshots = pa.table({
        "entity_id": pa.array([r[0] for r in snap_rows]),
        "ds": pa.array([r[1] for r in snap_rows]),
        "item": pa.array([r[2] for r in snap_rows]),
        "amount": pa.array([r[3] for r in snap_rows], type=pa.float64()),
        "ts": pa.array([r[4] for r in snap_rows], type=pa.int64()),
    })
    mutations = pa.table({
        "entity_id": pa.array([r[0] for r in mut_rows]),
        "mutation_ts": pa.array([r[1] for r in mut_rows], type=pa.int64()),
        "is_before": pa.array([r[2] for r in mut_rows]),
        "item": pa.array([r[3] for r in mut_rows]),
        "amount": pa.array([r[4] for r in mut_rows], type=pa.float64()),
        "ts": pa.array([r[5] for r in mut_rows], type=pa.int64()),
    })
    q_rows = []
    rng2 = np.random.default_rng(22)
    for d in (4, 5):
        day_start = D0 + d * MS_DAY
        for k in keys:
            for _ in range(8):
                q_rows.append((k, day_start + int(rng2.integers(0, MS_DAY))))
    queries = pa.table({
        "entity_id": pa.array([r[0] for r in q_rows]),
        "ts": pa.array([r[1] for r in q_rows], type=pa.int64()),
    })
    return snapshots, mutations, queries


def _naive_windowed(snapshots, mutations, queries, w_millis):
    """Direct per-query implementation of the reference rules."""
    snaps = snapshots.to_pandas()
    muts = mutations.to_pandas().sort_values("mutation_ts", kind="stable")
    qs = queries.to_pandas()
    out_sum, out_cnt = [], []
    for _, q in qs.iterrows():
        k, qts = q["entity_id"], int(q["ts"])
        day = qts // MS_DAY
        eod = day * MS_DAY  # end of prev-day snapshot
        prev_ds = pd.Timestamp(eod - MS_DAY, unit="ms").strftime("%Y-%m-%d")
        qtail = round_ts(qts - w_millis, HOP)
        base = snaps[(snaps.entity_id == k) & (snaps.ds == prev_ds)]
        total, cnt = 0.0, 0
        for _, r in base.iterrows():
            ts = int(r["ts"])
            if not (ts < eod and round_ts(ts, HOP)
                    >= round_ts(eod - w_millis, HOP)):
                continue
            if ts >= eod - w_millis + TAIL_BUFFER_MS:
                total += r["amount"]; cnt += 1       # collapsed: always in
            elif round_ts(ts, HOP) >= qtail:
                total += r["amount"]; cnt += 1       # tail hop in window
        # single-pass mutation replay with first-crossing window checks:
        # queries for this key/day sorted; here we evaluate per query but
        # replicate "applied at the first query after mutation_ts" by
        # evaluating the window check at the EARLIEST same-key query ts
        # that exceeds mutation_ts
        day_qs = sorted(int(t) for t in
                        qs[(qs.entity_id == k) &
                           (qs.ts // MS_DAY == day)]["ts"])
        mday = muts[(muts.entity_id == k) &
                    (muts.mutation_ts >= eod) & (muts.mutation_ts < qts)]
        for _, m in mday.iterrows():
            mts = int(m["mutation_ts"])
            first_q = next(t for t in day_qs if t > mts)
            f_tail = round_ts(first_q - w_millis, HOP)
            rts = int(m["ts"])
            if not (rts >= f_tail and rts < first_q):
                continue
            sign = -1 if m["is_before"] else 1
            total += sign * m["amount"]; cnt += sign
        out_sum.append(total)
        out_cnt.append(cnt)
    qs["exp_sum"] = out_sum
    qs["exp_cnt"] = out_cnt
    return qs


def test_windowed_temporal_entities(ray_session, windowed_entity_data):
    snapshots, mutations, queries = windowed_entity_data
    conf = GroupByConf(
        name="went", sources=(), key_columns=("entity_id",),
        aggregations=(agg("amount", "sum", [W3]),
                      agg("amount", "count", [W3])))
    out = temporal_entities_join(
        rd.from_arrow(queries), rd.from_arrow(snapshots),
        rd.from_arrow(mutations), conf, num_partitions=4).to_pandas()
    exp = _naive_windowed(snapshots, mutations, queries, W3.millis)
    m = out.merge(exp, on=["entity_id", "ts"], how="inner")
    assert len(m) == len(out) == len(exp)
    got_sum = m["amount_sum_3d"].fillna(0).to_numpy(dtype=float)
    got_cnt = m["amount_count_3d"].fillna(0).to_numpy(dtype=float)
    np.testing.assert_allclose(got_sum, m["exp_sum"].to_numpy(), rtol=1e-9)
    np.testing.assert_array_equal(got_cnt, m["exp_cnt"].to_numpy(dtype=float))


def test_windowed_requires_snapshot_ts(ray_session):
    snapshots = pa.table({"entity_id": ["a"], "ds": ["2024-01-01"],
                          "amount": [1.0]})
    mutations = pa.table({"entity_id": pa.array([], type=pa.string()),
                          "mutation_ts": pa.array([], type=pa.int64()),
                          "is_before": pa.array([], type=pa.bool_()),
                          "amount": pa.array([], type=pa.float64())})
    queries = pa.table({"entity_id": ["a"],
                        "ts": pa.array([D0], type=pa.int64())})
    conf = GroupByConf(name="x", sources=(), key_columns=("entity_id",),
                       aggregations=(agg("amount", "sum", [W3]),))
    with pytest.raises(ValueError, match="event 'ts'"):
        temporal_entities_join(rd.from_arrow(queries),
                               rd.from_arrow(snapshots),
                               rd.from_arrow(mutations), conf,
                               num_partitions=2)


def test_unbounded_and_windowed_mix(ray_session, windowed_entity_data):
    """Unbounded parts keep their round-1 semantics alongside windowed
    parts in the same conf."""
    snapshots, mutations, queries = windowed_entity_data
    conf = GroupByConf(
        name="mix", sources=(), key_columns=("entity_id",),
        aggregations=(agg("amount", "sum"),
                      agg("amount", "sum", [W3])))
    out = temporal_entities_join(
        rd.from_arrow(queries), rd.from_arrow(snapshots),
        rd.from_arrow(mutations), conf, num_partitions=4).to_pandas()
    assert {"amount_sum", "amount_sum_3d"} <= set(out.columns)
    assert len(out) == queries.num_rows
    # windowed ≤ unbounded for nonneg amounts wherever both defined
    both = out.dropna(subset=["amount_sum", "amount_sum_3d"])
    assert (both["amount_sum_3d"] <= both["amount_sum"] + 1e-9).all()


def test_windowed_mutation_exits_between_same_day_queries(ray_session):
    """rowInWindow must be evaluated per query (reference
    SawtoothMutationAggregator.updateIr): a row inserted by a day-D
    mutation is inside the first query's 1h window but has exited the
    second query's window two hours later — the second query must NOT
    keep it (regression: the old shared-prefix replay did)."""
    import pyarrow as pa
    import ray.data as rd

    from chronon_ray.api import GroupByConf, agg, window
    from chronon_ray.pipelines.mutations import temporal_entities_join

    d0 = pd.Timestamp("2024-01-10").value // 10**6
    snap = pa.table({"entity_id": pa.array([], type=pa.int64()),
                     "ds": pa.array([], type=pa.string()),
                     "ts": pa.array([], type=pa.int64()),
                     "amount": pa.array([], type=pa.float64())})
    mut = pa.table({"entity_id": [1], "mutation_ts": [d0 + 40 * 60_000],
                    "is_before": [False], "ts": [d0 + 30 * 60_000],
                    "amount": [10.0]})
    q = pa.table({"entity_id": [1, 1],
                  "ts": [d0 + 60 * 60_000, d0 + 180 * 60_000]})
    conf = GroupByConf(
        name="m", sources=(), key_columns=("entity_id",),
        aggregations=(agg("amount", "sum", [window(1, "h")]),
                      agg("amount", "variance", [window(1, "h")])))
    out = temporal_entities_join(
        rd.from_arrow(q), rd.from_arrow(snap), rd.from_arrow(mut), conf,
        num_partitions=2).to_pandas().sort_values("ts").reset_index(drop=True)
    # q @ 01:00: row (event ts 00:30) in window [00:00, 01:00)
    assert out["amount_sum_1h"].iloc[0] == 10.0
    # q @ 03:00: window tail 02:00 -> row exited, feature is null
    assert pd.isna(out["amount_sum_1h"].iloc[1])
    # the windowed scalar (per-query replay) path agrees
    assert out["amount_variance_1h"].iloc[0] == 0.0
    assert pd.isna(out["amount_variance_1h"].iloc[1])


def test_windowed_boundary_row_included(ray_session):
    """A snapshot row at EXACTLY end_of_day - W must be included for a
    query whose hop-rounded window tail reaches it (the old strict
    `ts > eod - W` pre-filter silently dropped it)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from chronon_ray.api import GroupByConf, agg, window
    from chronon_ray.pipelines.mutations import temporal_entities_join

    MS_DAY = 86_400_000
    day = 20_000  # arbitrary day ordinal
    eod = day * MS_DAY
    W = MS_DAY  # 1d window, hop = 1h
    prev_ds = pd.Timestamp(eod - MS_DAY, unit="ms").strftime("%Y-%m-%d")
    snaps = pa.table({
        "entity_id": pa.array([1, 1], type=pa.int64()),
        "amount": pa.array([10.0, 5.0]),
        "ts": pa.array([eod - W, eod - 1], type=pa.int64()),  # boundary + head
        "ds": pa.array([prev_ds, prev_ds]),
    })
    muts = pa.table({
        "entity_id": pa.array([], type=pa.int64()),
        "amount": pa.array([], type=pa.float64()),
        "ts": pa.array([], type=pa.int64()),
        "mutation_ts": pa.array([], type=pa.int64()),
        "is_delete": pa.array([], type=pa.bool_()),
        "ds": pa.array([], type=pa.string()),
    })
    queries = pa.table({
        "entity_id": pa.array([1], type=pa.int64()),
        "ts": pa.array([eod + 1], type=pa.int64()),  # round(q-W,1h) <= eod-W
    })
    conf = GroupByConf(
        name="bnd", sources=(), key_columns=("entity_id",),
        aggregations=(agg("amount", "sum", [window(1, "d")]),))
    out = temporal_entities_join(
        ray.data.from_arrow(queries), ray.data.from_arrow(snaps),
        ray.data.from_arrow(muts), conf, num_partitions=2).to_pandas()
    assert float(out["amount_sum_1d"].iloc[0]) == 15.0
