"""Regression tests for the round-3 fixes: dtype restoration after pandas
merge paths, canonical key hashing in the upload/mutation exchanges, null
groups in budget_sample, and schema preservation in incremental dedup."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from chronon_ray.api import GroupByConf, UNBOUNDED, agg, window

DAY = 86_400_000
BASE = pd.Timestamp("2024-03-01").value // 10**6


def _mk_events(n=3000, keys=23, days=20, seed=5, key_dtype=np.int64):
    rng = np.random.default_rng(seed)
    ts = BASE + rng.integers(0, days * DAY, size=n)
    return pd.DataFrame({
        "user_id": rng.integers(0, keys, size=n).astype(key_dtype),
        "ts": np.sort(ts).astype(np.int64),
        "value": np.round(rng.normal(10, 3, size=n), 3),
    })


def test_serve_output_left_dtypes(ray_session):
    """serve_with_events must emit left columns (ts, keys) with the query
    schema's dtypes, not the float64 the null-padded union promotes to."""
    from chronon_ray.pipelines.upload import groupby_upload, serve_with_events

    conf = GroupByConf(
        name="d", sources=(), key_columns=("user_id",),
        aggregations=(agg("value", "sum", [window(7, "d")]),
                      agg("value", "count", [window(1, "d")])),
    )
    ev = _mk_events()
    batch_end = BASE + 15 * DAY
    head = ev[ev.ts >= batch_end]
    rng = np.random.default_rng(11)
    q = pd.DataFrame({
        "user_id": rng.integers(0, 23, size=200).astype(np.int64),
        "ts": (batch_end + rng.integers(0, DAY, size=200)).astype(np.int64),
    })
    ir = groupby_upload(rd.from_pandas(ev), conf, batch_end,
                        num_partitions=4)
    out = serve_with_events(ir, rd.from_pandas(head), rd.from_pandas(q),
                            conf, batch_end, num_partitions=4)
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    assert t.schema.field("ts").type == pa.int64()
    assert t.schema.field("user_id").type == pa.int64()
    # COUNT output stays integer
    assert pa.types.is_integer(t.schema.field("value_count_1d").type)


def test_serve_cross_dtype_keys(ray_session):
    """int32 event/IR keys vs int64 query keys must co-partition (canonical
    key hashing) — mismatched hashing silently yields all-null features."""
    from chronon_ray.pipelines.upload import groupby_upload, serve_with_events

    conf = GroupByConf(
        name="d", sources=(), key_columns=("user_id",),
        aggregations=(agg("value", "sum", [UNBOUNDED]),),
    )
    ev = _mk_events(key_dtype=np.int32)
    batch_end = BASE + 15 * DAY
    head = ev[ev.ts >= batch_end]
    q = pd.DataFrame({
        "user_id": np.arange(23, dtype=np.int64),
        "ts": np.full(23, batch_end + DAY // 2, dtype=np.int64),
    })
    ir = groupby_upload(rd.from_pandas(ev), conf, batch_end,
                        num_partitions=7)
    out = serve_with_events(ir, rd.from_pandas(head), rd.from_pandas(q),
                            conf, batch_end, num_partitions=7).to_pandas()
    assert len(out) == 23
    assert out["value_sum"].notna().all()


def test_serve_null_key_query_rows_preserved(ray_session):
    """Null-key query rows must still be emitted (left-outer contract),
    with null features."""
    from chronon_ray.pipelines.upload import groupby_upload, serve_with_events

    conf = GroupByConf(
        name="d", sources=(), key_columns=("user_id",),
        aggregations=(agg("value", "sum", [UNBOUNDED]),),
    )
    ev = _mk_events()
    batch_end = BASE + 15 * DAY
    head = ev[ev.ts >= batch_end]
    q = pd.DataFrame({
        "user_id": pd.array([1, None, 2, None], dtype="Int64"),
        "ts": np.full(4, batch_end + DAY // 2, dtype=np.int64),
    })
    ir = groupby_upload(rd.from_pandas(ev), conf, batch_end,
                        num_partitions=3)
    out = serve_with_events(ir, rd.from_pandas(head), rd.from_pandas(q),
                            conf, batch_end, num_partitions=3).to_pandas()
    assert len(out) == 4
    nulls = out[out["user_id"].isna()]
    assert len(nulls) == 2
    assert nulls["value_sum"].isna().all()


def test_temporal_entities_left_dtypes(ray_session):
    """temporal_entities_join must restore the query schema's dtypes on
    left columns after the pandas replay merge."""
    from chronon_ray.pipelines.mutations import temporal_entities_join

    rng = np.random.default_rng(3)
    snaps = pd.DataFrame({
        "entity_id": np.tile(np.arange(10, dtype=np.int64), 3),
        "ds": np.repeat(["2024-03-01", "2024-03-02", "2024-03-03"], 10),
        "amount": np.round(rng.normal(100, 10, size=30), 2),
    })
    q = pd.DataFrame({
        "entity_id": rng.integers(0, 10, size=50).astype(np.int64),
        "ts": (BASE + 2 * DAY
               + rng.integers(0, 2 * DAY, size=50)).astype(np.int64),
    })
    muts = pd.DataFrame({
        "entity_id": rng.integers(0, 10, size=20).astype(np.int64),
        "mutation_ts": (BASE + 2 * DAY
                        + rng.integers(0, 2 * DAY, size=20)).astype(np.int64),
        "is_before": np.zeros(20, dtype=bool),
        "amount": np.round(rng.normal(100, 10, size=20), 2),
    })
    conf = GroupByConf(
        name="te", sources=(), key_columns=("entity_id",),
        aggregations=(agg("amount", "sum", [UNBOUNDED]),
                      agg("amount", "count", [UNBOUNDED])),
    )
    out = temporal_entities_join(rd.from_pandas(q), rd.from_pandas(snaps),
                                 rd.from_pandas(muts), conf,
                                 num_partitions=4)
    t = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    assert t.schema.field("ts").type == pa.int64()
    assert t.schema.field("entity_id").type == pa.int64()
    assert pa.types.is_integer(t.schema.field("amount_count").type)


def test_budget_sample_null_group_gets_default_budget(ray_session):
    """Rows with a null group form their own stratum with default_budget
    (SQL `partition by g` treats nulls as one partition)."""
    from chronon_ray.functions.sampling import budget_sample

    df = pd.DataFrame({
        "doc_id": np.arange(100, dtype=np.int64),
        "source": ["a"] * 50 + [None] * 50,
        "w": np.ones(100, dtype=np.int64),
    })
    out = budget_sample(rd.from_pandas(df), "doc_id", "source", "w",
                        budgets={"a": 10}, default_budget=7).to_pandas()
    a = out[out["source"] == "a"]
    nul = out[out["source"].isna()]
    assert len(a) == 10
    assert len(nul) == 7


def test_incremental_dedup_preserves_schema(ray_session, tmp_path):
    """All integer doc columns (not just id) must come back with their
    input dtypes after the history-null union."""
    from chronon_ray.functions.dedup import incremental_exact_dedup

    d1 = pd.DataFrame({
        "doc_id": np.arange(20, dtype=np.int64),
        "text": [f"doc {i % 10}" for i in range(20)],
        "n_tok": np.arange(20, dtype=np.int32),
    })
    state = str(tmp_path / "state")
    out1 = incremental_exact_dedup(rd.from_pandas(d1), state, "2024-01-01",
                                   ["text"], "doc_id",
                                   num_partitions=3).to_pandas()
    assert len(out1) == 10
    d2 = pd.DataFrame({
        "doc_id": np.arange(100, 120, dtype=np.int64),
        "text": [f"doc {i % 15}" for i in range(20)],
        "n_tok": np.arange(20, dtype=np.int32),
    })
    out2 = incremental_exact_dedup(rd.from_pandas(d2), state, "2024-01-02",
                                   ["text"], "doc_id", num_partitions=3)
    t = pa.Table.from_pandas(out2.to_pandas(), preserve_index=False)
    assert t.schema.field("doc_id").type == pa.int64()
    assert t.schema.field("n_tok").type == pa.int32()
    # only the 5 genuinely-new contents survive day 2
    assert len(t) == 5
