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
