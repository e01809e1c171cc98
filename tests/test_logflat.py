"""Log flattening (pipelines/logflat.py): encode → flatten round trip,
schema-version merging, and log-based bootstrap feeding
compute_join_bootstrapped (the LogFlattenerJob + LogBootstrap lifecycle)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def _served_frame(rng, n=300):
    return pd.DataFrame({
        "user_id": rng.integers(0, 20, n).astype(np.int64),
        "ts": rng.integers(0, 3 * 86_400_000, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "f_sum": np.where(rng.random(n) < 0.1, np.nan,
                          rng.integers(0, 50, n).astype(np.float64)),
        "f_name": np.where(rng.random(n) < 0.2, None, "x"),
    })


def test_encode_flatten_round_trip(ray_session):
    from chronon_ray.pipelines.logflat import encode_log, flatten_logs

    rng = np.random.default_rng(3)
    df = _served_frame(rng)
    served = rd.from_pandas(df)
    log_ds, registry = encode_log(served, key_cols=["user_id", "event_id"],
                                  name="my_join")
    assert len(registry) == 1
    flat = flatten_logs(log_ds, registry).to_pandas()
    assert list(flat.columns) == ["schema_hash", "ts", "ds", "user_id",
                                  "event_id", "f_sum", "f_name"]
    got = flat.sort_values("event_id").reset_index(drop=True)
    exp = df.sort_values("event_id").reset_index(drop=True)
    for c in ("user_id", "ts", "event_id"):
        assert (got[c].to_numpy() == exp[c].to_numpy()).all()
    np.testing.assert_array_equal(got["f_sum"].to_numpy(),
                                  exp["f_sum"].to_numpy())
    assert got["f_name"].where(got["f_name"].notna(), None).tolist() \
        == exp["f_name"].tolist()
    # ds derives from ts day
    exp_ds = pd.to_datetime(exp["ts"], unit="ms").dt.strftime("%Y-%m-%d")
    assert got["ds"].tolist() == exp_ds.tolist()
    # name filter drops foreign joins
    assert flatten_logs(log_ds, registry, name="other").count() == 0


def test_flatten_merges_schema_versions(ray_session):
    """Two logged schema versions (v2 adds a column) flatten into ONE
    merged-schema table with typed NULLs where the old version lacked the
    field — dedupeFields first-appearance order."""
    from chronon_ray.pipelines.logflat import encode_log, flatten_logs

    v1 = pd.DataFrame({"user_id": np.array([1, 2], dtype=np.int64),
                       "ts": np.array([0, 1], dtype=np.int64),
                       "f_a": [1.0, 2.0]})
    v2 = pd.DataFrame({"user_id": np.array([3], dtype=np.int64),
                       "ts": np.array([2], dtype=np.int64),
                       "f_a": [3.0], "f_b": ["new"]})
    l1, r1 = encode_log(rd.from_pandas(v1), ["user_id"], "j")
    l2, r2 = encode_log(rd.from_pandas(v2), ["user_id"], "j")
    registry = pa.concat_tables([r1, r2])
    flat = flatten_logs(l1.union(l2), registry).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    assert list(flat.columns) == ["schema_hash", "ts", "ds", "user_id",
                                  "f_a", "f_b"]
    assert flat["f_a"].tolist() == [1.0, 2.0, 3.0]
    assert flat["f_b"].where(flat["f_b"].notna(), None).tolist() \
        == [None, None, "new"]
    assert flat["schema_hash"].nunique() == 2


def test_flatten_conflicting_types_raise(ray_session):
    from chronon_ray.pipelines.logflat import encode_log, flatten_logs

    v1 = pd.DataFrame({"user_id": np.array([1], dtype=np.int64),
                       "ts": np.array([0], dtype=np.int64), "f": [1.0]})
    v2 = pd.DataFrame({"user_id": np.array([2], dtype=np.int64),
                       "ts": np.array([0], dtype=np.int64), "f": ["s"]})
    l1, r1 = encode_log(rd.from_pandas(v1), ["user_id"], "j")
    l2, r2 = encode_log(rd.from_pandas(v2), ["user_id"], "j")
    with pytest.raises(ValueError, match="conflicting types"):
        flatten_logs(l1.union(l2), pa.concat_tables([r1, r2])).count()


def test_flatten_unknown_hash_raises(ray_session):
    from chronon_ray.pipelines.logflat import encode_log, flatten_logs

    df = pd.DataFrame({"user_id": np.array([1], dtype=np.int64),
                       "ts": np.array([0], dtype=np.int64), "f": [1.0]})
    log_ds, registry = encode_log(rd.from_pandas(df), ["user_id"], "j")
    _, other = encode_log(rd.from_pandas(df.rename(columns={"f": "g"})),
                          ["user_id"], "j")
    with pytest.raises(Exception, match="missing from registry"):
        flatten_logs(log_ds, other).count()


def test_log_bootstrap_skips_served_rows(ray_session, tmp_path):
    """The LogBootstrap lifecycle: serve a join (here: the offline compute
    stands in for the fetcher), log it, flatten the log, and feed the
    flattened table to compute_join_bootstrapped — the bootstrapped output
    must equal the direct compute bit-for-bit."""
    from chronon_ray.api import (BootstrapPart, EventSource, GroupByConf,
                                 JoinConf, JoinPart, TQuery, agg, window)
    from chronon_ray.pipelines.joins import (compute_join,
                                             compute_join_bootstrapped)
    from chronon_ray.pipelines.logflat import encode_log, flatten_logs

    rng = np.random.default_rng(17)
    n = 800
    ts = rng.integers(0, 6 * 86_400_000, n).astype(np.int64)
    ev = pd.DataFrame({
        "user_id": rng.integers(0, 15, n).astype(np.int64),
        "ts": ts,
        "event_id": np.arange(n, dtype=np.int64),
        "value": rng.integers(1, 50, n).astype(np.float64),
        "ds": pd.to_datetime(ts, unit="ms").strftime("%Y-%m-%d"),
    })
    events_path = str(tmp_path / "events.parquet")
    ev.to_parquet(events_path, index=False)
    events_src = EventSource(table=events_path, query=TQuery())
    left_src = EventSource(
        table=events_path,
        query=TQuery.of(selects={"user_id": "user_id", "ts": "ts",
                                 "event_id": "event_id"}))
    gb = GroupByConf(name="g", sources=(events_src,),
                     key_columns=("user_id",),
                     aggregations=(agg("value", "sum", [window(7, "d")]),))
    row_ids = ("user_id", "ts", "event_id")
    jc = JoinConf(name="lb", left=left_src, parts=(JoinPart(group_by=gb),),
                  row_ids=row_ids)
    direct = compute_join(jc, num_partitions=8).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)

    # "online" served half the rows; log + flatten them
    served = direct[direct["event_id"] % 2 == 0]
    log_ds, registry = encode_log(rd.from_pandas(served),
                                  key_cols=list(row_ids), name="lb")
    flat = flatten_logs(log_ds, registry)
    bs = flat.map_batches(
        lambda t: t.drop(["schema_hash", "ds"]), batch_format="pyarrow")
    jc_boot = JoinConf(name="lb", left=left_src,
                       parts=(JoinPart(group_by=gb),), row_ids=row_ids,
                       bootstrap_parts=(BootstrapPart(table=bs),))
    boot = compute_join_bootstrapped(jc_boot, num_partitions=8).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    cols = sorted(c for c in direct.columns if c != "matched_hashes")
    for c in cols:
        np.testing.assert_array_equal(
            boot[c].to_numpy(), direct[c].to_numpy(), err_msg=c)


def test_log_flatten_job_evolution_and_chaos(ray_session, tmp_path):
    """Randomized-ish lifecycle: three logged schema versions across days
    written as a hive log table, resumable flatten, deleted-output chaos,
    final table equals a one-shot flatten of everything."""
    import os
    import shutil

    import pyarrow.parquet as pq

    from chronon_ray.pipelines.logflat import (encode_log, flatten_logs,
                                               log_flatten_job)

    rng = np.random.default_rng(101)
    day_ms = 86_400_000
    frames = []
    for v in range(3):
        n = 40
        ts = (v * day_ms + rng.integers(0, day_ms, n)).astype(np.int64)
        df = pd.DataFrame({
            "user_id": rng.integers(0, 10, n).astype(np.int64),
            "ts": ts, "f_a": rng.normal(0, 1, n)})
        if v >= 1:
            df["f_b"] = rng.integers(0, 5, n).astype(np.int64)
        if v >= 2:
            df["f_c"] = np.where(rng.random(n) < 0.5, None, "s")
        frames.append(df)
    logs, regs = [], []
    for i, df in enumerate(frames):
        l, r = encode_log(rd.from_pandas(df), ["user_id"], "j")
        logs.append(l)
        regs.append(r)
    registry = pa.concat_tables(regs)
    log_all = logs[0].union(logs[1]).union(logs[2])
    # hive log table partitioned by ds
    log_dir = str(tmp_path / "log_table")
    for t in log_all.iter_batches(batch_format="pyarrow"):
        for ds_val in set(t["ds"].to_pylist()):
            sub = t.filter(pa.compute.equal(t["ds"], ds_val))
            pdir = os.path.join(log_dir, f"ds={ds_val}")
            os.makedirs(pdir, exist_ok=True)
            pq.write_table(sub.drop(["ds"]),
                           os.path.join(pdir, f"part-{abs(hash(ds_val))%99}"
                                        f"-{len(os.listdir(pdir))}.parquet"))
    reg_path = str(tmp_path / "reg.parquet")
    pq.write_table(registry, reg_path)

    out = str(tmp_path / "flat_out")
    w1 = log_flatten_job(log_dir, reg_path, out, name="j", step_days=1)
    assert len(w1) == 3
    # chaos: delete the newest output day, torn tmp dir
    days = sorted(d for d in os.listdir(out) if d.startswith("ds="))
    shutil.rmtree(os.path.join(out, days[-1]))
    os.makedirs(os.path.join(out, "_tmp.torn"), exist_ok=True)
    w2 = log_flatten_job(log_dir, reg_path, out, name="j", step_days=1)
    assert sorted(w2) == [days[-1][3:]]

    got = rd.read_parquet(out).to_pandas() \
        .sort_values(["ts", "user_id"]).reset_index(drop=True)
    oneshot = flatten_logs(log_all, registry, name="j").to_pandas() \
        .sort_values(["ts", "user_id"]).reset_index(drop=True)
    # hive read re-injects ds last; compare on the one-shot's order
    assert set(got.columns) == set(oneshot.columns)
    got = got[list(oneshot.columns)]
    for c in oneshot.columns:
        if oneshot[c].dtype.kind == "f":
            np.testing.assert_array_equal(got[c].to_numpy(),
                                          oneshot[c].to_numpy(), err_msg=c)
        else:
            a = got[c].where(got[c].notna(), None)
            b = oneshot[c].where(oneshot[c].notna(), None)
            assert a.tolist() == b.tolist(), c
    # merged schema: early days carry typed nulls for later fields
    assert oneshot["f_c"].isna().sum() >= 80
