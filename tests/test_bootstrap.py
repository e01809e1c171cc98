"""Bootstrap joins (coalesce precomputed values, matched_hashes lineage),
covering-set analysis, external-part null padding."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from chronon_ray.pipelines.joins import (
    bootstrap_join,
    covering_sets,
    pad_external_parts,
)


@pytest.fixture(scope="module")
def tables(ray_session):
    left = pa.table({
        "row_id": pa.array(list(range(10)), type=pa.int64()),
        "user_id": pa.array([i % 3 for i in range(10)], type=pa.int64()),
        "f_sum": pa.nulls(10, pa.float64()),
        "f_cnt": pa.nulls(10, pa.int64()),
    })
    # bootstrap covers rows 0-4 fully, rows 5-6 partially (f_sum only)
    bs = pa.table({
        "row_id": pa.array([0, 1, 2, 3, 4, 5, 6], type=pa.int64()),
        "f_sum": pa.array([10.0, 11, 12, 13, 14, 15, 16]),
        "f_cnt": pa.array([1, 1, 1, 1, 1, None, None], type=pa.int64()),
    })
    return left, bs


def test_bootstrap_join_coalesce_and_lineage(tables):
    left, bs = tables
    out = bootstrap_join(rd.from_arrow(left), rd.from_arrow(bs),
                         row_ids=["row_id"], part_hash="bs1",
                         num_partitions=4).to_pandas()
    out = out.sort_values("row_id").reset_index(drop=True)
    assert len(out) == 10
    np.testing.assert_allclose(out.loc[:6, "f_sum"], [10, 11, 12, 13, 14, 15, 16])
    assert out.loc[7:, "f_sum"].isna().all()
    for i in range(7):
        assert list(out.loc[i, "matched_hashes"]) == ["bs1"]
    assert out.loc[8, "matched_hashes"] is None or \
        (isinstance(out.loc[8, "matched_hashes"], float))


def test_covering_sets(tables):
    left, bs = tables
    booted = bootstrap_join(rd.from_arrow(left), rd.from_arrow(bs),
                            row_ids=["row_id"], part_hash="bs1",
                            num_partitions=4)
    need = covering_sets(booted, {"p": ["f_sum", "f_cnt"], "q": ["f_sum"]})
    need_p = need["p"].to_pandas()["row_id"].sort_values().tolist()
    need_q = need["q"].to_pandas()["row_id"].sort_values().tolist()
    # p needs rows where f_sum or f_cnt null: 5,6 (cnt null) + 7,8,9
    assert need_p == [5, 6, 7, 8, 9]
    # q (f_sum only) needs just 7,8,9
    assert need_q == [7, 8, 9]


def test_pad_external_parts(tables):
    left, _ = tables
    out = pad_external_parts(
        rd.from_arrow(left),
        [pa.field("ext_score", pa.float64()), pa.field("ext_tag", pa.string())],
    ).to_pandas()
    assert out["ext_score"].isna().all()
    assert out["ext_tag"].isna().all()
    assert len(out) == 10


def test_compute_join_bootstrapped_invariance(ray_session, sf_dir):
    """Bootstrapping half the rows with previously-computed features must
    reproduce the full compute_join output exactly (strong invariance: the
    covering set skips compute for covered rows, coalesce restores them)."""
    import pyarrow.compute as pc

    from chronon_ray.api import (BootstrapPart, EventSource, GroupByConf,
                                 JoinConf, JoinPart, TQuery, agg, window)
    from chronon_ray.pipelines.joins import compute_join, compute_join_bootstrapped

    events_src = EventSource(table=f"{sf_dir}/events.parquet", query=TQuery())
    left_src = EventSource(
        table=f"{sf_dir}/events.parquet",
        query=TQuery.of(selects={"user_id": "user_id", "ts": "ts",
                                 "event_id": "event_id"},
                        wheres=[lambda t: pc.equal(t["event_type"], "purchase")]))
    gb = GroupByConf(name="g", sources=(events_src,), key_columns=("user_id",),
                     aggregations=(agg("value", "sum", [window(7, "d")]),
                                   agg("value", "count", [window(7, "d")])))
    base_jc = JoinConf(name="j", left=left_src, parts=(JoinPart(group_by=gb),),
                       row_ids=("event_id",))
    full = compute_join(base_jc, num_partitions=8).to_pandas()
    full = full.sort_values("event_id").reset_index(drop=True)

    # bootstrap table: the computed features for half the rows
    half = full.iloc[::2][["event_id", "g_value_sum_7d", "g_value_count_7d"]]
    bs = rd.from_pandas(half.reset_index(drop=True))
    jc2 = JoinConf(name="j", left=left_src, parts=(JoinPart(group_by=gb),),
                   row_ids=("event_id",),
                   bootstrap_parts=(BootstrapPart(table=bs),))
    boot = compute_join_bootstrapped(jc2, num_partitions=8).to_pandas()
    boot = boot.sort_values("event_id").reset_index(drop=True)
    assert len(boot) == len(full)
    for col in ["g_value_sum_7d", "g_value_count_7d"]:
        a = full[col].astype(float).to_numpy()
        b = boot[col].astype(float).to_numpy()
        nan = np.isnan(a) & np.isnan(b)
        assert (np.isnan(a) == np.isnan(b)).all(), col
        np.testing.assert_allclose(a[~nan], b[~nan], rtol=1e-12, err_msg=col)
    # lineage: bootstrapped rows carry the hash, others don't
    hit = boot["matched_hashes"].map(lambda v: v is not None and len(v) > 0)
    assert hit.sum() == len(half)
