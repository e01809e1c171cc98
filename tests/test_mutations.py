"""Temporal entities (mutation PITC) vs a DuckDB state-reconstruction oracle:
state_at(q.ts) = snapshot(day(q)-1) rows + after-rows(mutation_ts < q.ts)
− before-rows(mutation_ts < q.ts), aggregated per key."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from chronon_ray.api import GroupByConf, Operation, agg
from chronon_ray.pipelines.mutations import temporal_entities_join

MS_DAY = 86_400_000
D0 = 1_704_067_200_000  # 2024-01-01T00:00Z


@pytest.fixture(scope="module")
def entity_data(ray_session):
    """3 days of snapshots for 6 keys, with intra-day update/insert/delete
    mutation pairs, and queries before/between/after mutations."""
    rng = np.random.Generator(np.random.PCG64(9))
    keys = [f"e{i}" for i in range(6)]
    snap_rows = []
    # entity table: (key, item, amount); several rows (items) per key
    state = {}
    for k in keys:
        state[k] = {f"i{j}": float(rng.integers(1, 100))
                    for j in range(int(rng.integers(2, 5)))}
    mut_rows = []
    for d in range(3):
        ds = pd.Timestamp((D0 // MS_DAY + d) * MS_DAY, unit="ms").strftime("%Y-%m-%d")
        for k in keys:
            for item, amt in state[k].items():
                snap_rows.append((k, ds, item, amt))
        # mutations during day d+1 change the state (affect snapshots of d+1)
        day_start = D0 + (d + 1) * MS_DAY
        for k in keys:
            items = list(state[k].items())
            # update: one item changes value
            if items:
                item, old = items[0]
                new = float(rng.integers(1, 100))
                t = day_start + int(rng.integers(1, MS_DAY // 2))
                mut_rows.append((k, t, True, item, old))    # before (delete)
                mut_rows.append((k, t, False, item, new))   # after (insert)
                state[k][item] = new
            # insert: a new item appears later in the day
            newitem = f"n{d}_{k}"
            amt = float(rng.integers(1, 100))
            t2 = day_start + MS_DAY // 2 + int(rng.integers(1, MS_DAY // 3))
            mut_rows.append((k, t2, False, newitem, amt))
            state[k][newitem] = amt
    snapshots = pa.table({
        "entity_id": pa.array([r[0] for r in snap_rows]),
        "ds": pa.array([r[1] for r in snap_rows]),
        "item": pa.array([r[2] for r in snap_rows]),
        "amount": pa.array([r[3] for r in snap_rows], type=pa.float64()),
    })
    mutations = pa.table({
        "entity_id": pa.array([r[0] for r in mut_rows]),
        "mutation_ts": pa.array([r[1] for r in mut_rows], type=pa.int64()),
        "is_before": pa.array([r[2] for r in mut_rows]),
        "item": pa.array([r[3] for r in mut_rows]),
        "amount": pa.array([r[4] for r in mut_rows], type=pa.float64()),
    })
    q_rows = []
    rng2 = np.random.Generator(np.random.PCG64(10))
    for d in range(1, 3):  # query days whose prev-day snapshot exists
        day_start = D0 + d * MS_DAY
        for k in keys:
            for _ in range(6):
                q_rows.append((k, day_start + int(rng2.integers(0, MS_DAY))))
    # include exact-tie query at a mutation ts (strict < check)
    q_rows.append((mut_rows[0][0], mut_rows[0][1]))
    queries = pa.table({
        "entity_id": pa.array([r[0] for r in q_rows]),
        "ts": pa.array([r[1] for r in q_rows], type=pa.int64()),
    })
    return snapshots, mutations, queries


def _oracle(duck_con, snapshots, mutations, queries):
    duck_con.register("snap", snapshots.to_pandas())
    duck_con.register("mut", mutations.to_pandas())
    duck_con.register("q", queries.to_pandas())
    return duck_con.sql(f"""
        with st as (
            select q.entity_id, q.ts, s.amount, 1 as sign
            from q join snap s
              on s.entity_id = q.entity_id
             and s.ds = strftime(epoch_ms(q.ts) - interval 1 day, '%Y-%m-%d')
            union all
            select q.entity_id, q.ts, m.amount,
                   case when m.is_before then -1 else 1 end as sign
            from q join mut m
              on m.entity_id = q.entity_id
             and m.mutation_ts < q.ts
             and m.mutation_ts >= (q.ts // {MS_DAY}) * {MS_DAY}
        )
        select entity_id, ts,
               sum(amount * sign) as amount_sum,
               sum(sign) as cnt,
               sum(amount * sign) / sum(sign) as amount_average
        from st group by entity_id, ts
    """).df()


def test_temporal_entities_vs_oracle(ray_session, entity_data):
    import duckdb

    snapshots, mutations, queries = entity_data
    conf = GroupByConf(name="ent", sources=(), key_columns=("entity_id",),
                       aggregations=(agg("amount", "sum"),
                                     agg("amount", "count"),
                                     agg("amount", "average")))
    out = temporal_entities_join(rd.from_arrow(queries),
                                 rd.from_arrow(snapshots),
                                 rd.from_arrow(mutations), conf,
                                 num_partitions=4).to_pandas()
    out = out.sort_values(["entity_id", "ts"], kind="stable").reset_index(drop=True)
    con = duckdb.connect()
    exp = _oracle(con, snapshots, mutations, queries)
    exp = exp.sort_values(["entity_id", "ts"], kind="stable").reset_index(drop=True)
    # oracle only emits rows where state is non-empty — engine emits all
    merged = out.merge(exp, on=["entity_id", "ts"], how="left",
                       suffixes=("", "_exp"))
    assert len(merged) == len(out) >= len(exp)
    g = merged["amount_sum"].astype(float).to_numpy()
    w = merged["amount_sum_exp"].astype(float).to_numpy()
    nan = np.isnan(g) & np.isnan(w)
    assert (np.isnan(g) == np.isnan(w)).all()
    np.testing.assert_allclose(g[~nan], w[~nan], rtol=1e-9)
    got_cnt = merged["amount_count"].fillna(0).astype(int).to_numpy()
    exp_cnt = merged["cnt"].fillna(0).astype(int).to_numpy()
    np.testing.assert_array_equal(got_cnt, exp_cnt)
    ga = merged["amount_average"].astype(float).to_numpy()
    wa = merged["amount_average_exp"].astype(float).to_numpy()
    nana = np.isnan(ga) & np.isnan(wa)
    np.testing.assert_allclose(ga[~nana], wa[~nana], rtol=1e-9)


def test_mutation_tie_excluded(ray_session, entity_data):
    """A query exactly AT a mutation_ts must not see that mutation."""
    snapshots, mutations, queries = entity_data
    conf = GroupByConf(name="ent2", sources=(), key_columns=("entity_id",),
                       aggregations=(agg("amount", "sum"),))
    mpd = mutations.to_pandas()
    m0 = mpd.iloc[0]
    q_tie = pa.table({"entity_id": pa.array([m0["entity_id"]]),
                      "ts": pa.array([int(m0["mutation_ts"])], type=pa.int64())})
    q_after = pa.table({"entity_id": pa.array([m0["entity_id"]]),
                        "ts": pa.array([int(m0["mutation_ts"]) + 1], type=pa.int64())})
    out_tie = temporal_entities_join(rd.from_arrow(q_tie), rd.from_arrow(snapshots),
                                     rd.from_arrow(mutations), conf,
                                     num_partitions=2).to_pandas()
    out_after = temporal_entities_join(rd.from_arrow(q_after), rd.from_arrow(snapshots),
                                       rd.from_arrow(mutations), conf,
                                       num_partitions=2).to_pandas()
    # the first mutation pair is (delete old, insert new) at the same ts —
    # at the tie the state is the pre-mutation snapshot sum
    spd = snapshots.to_pandas()
    day_ds = pd.Timestamp((int(m0["mutation_ts"]) // MS_DAY - 1) * MS_DAY,
                          unit="ms").strftime("%Y-%m-%d")
    base = spd[(spd["entity_id"] == m0["entity_id"]) & (spd["ds"] == day_ds)]["amount"].sum()
    assert abs(out_tie["amount_sum"].iloc[0] - base) < 1e-9
    # strictly after: old deleted, new inserted (same-ts pair applied together)
    mpd_pair = mpd[(mpd["entity_id"] == m0["entity_id"]) &
                   (mpd["mutation_ts"] == m0["mutation_ts"])]
    delta = (mpd_pair.apply(lambda r: -r["amount"] if r["is_before"] else r["amount"],
                            axis=1)).sum()
    assert abs(out_after["amount_sum"].iloc[0] - (base + delta)) < 1e-9


def test_skew_kurtosis_deletes(ray_session):
    """SKEW/KURTOSIS over mutating entities: signed-merge deletes must land
    on the same values as recomputing the moments from the surviving rows."""
    import pyarrow as pa
    import ray.data as rd

    from chronon_ray.api import GroupByConf, agg
    from chronon_ray.pipelines.mutations import temporal_entities_join

    d0 = pd.Timestamp("2024-02-05").value // 10**6
    start = [3.0, 9.5, 1.0, 7.25, 4.0, 2.5, 8.0]
    snap = pa.table({
        "entity_id": [1] * len(start),
        "ds": ["2024-02-04"] * len(start),
        "amount": start,
    })
    # day-D CDC: delete 9.5 and 1.0, insert 6.0
    mut = pa.table({
        "entity_id": [1, 1, 1],
        "mutation_ts": [d0 + 1000, d0 + 2000, d0 + 3000],
        "is_before": [True, True, False],
        "amount": [9.5, 1.0, 6.0],
    })
    q = pa.table({"entity_id": [1], "ts": [d0 + 10_000]})
    conf = GroupByConf(name="mom", sources=(), key_columns=("entity_id",),
                       aggregations=(agg("amount", "skew"),
                                     agg("amount", "kurtosis")))
    out = temporal_entities_join(rd.from_arrow(q), rd.from_arrow(snap),
                                 rd.from_arrow(mut), conf,
                                 num_partitions=2).to_pandas()
    final = np.array([3.0, 7.25, 4.0, 2.5, 8.0, 6.0])
    n = len(final)
    m = final.mean()
    m2 = ((final - m) ** 2).sum()
    m3 = ((final - m) ** 3).sum()
    m4 = ((final - m) ** 4).sum()
    exp_skew = np.sqrt(n) * m3 / m2 ** 1.5
    exp_kurt = n * m4 / (m2 * m2) - 3.0
    assert out["amount_skew"].iloc[0] == pytest.approx(exp_skew, rel=1e-9)
    assert out["amount_kurtosis"].iloc[0] == pytest.approx(exp_kurt, rel=1e-9)
