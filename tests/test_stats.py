"""Observability family (pipelines/stats.py) vs independent oracles.

Summary stats and comparison metrics verify against DuckDB / pure-pandas
first-principles oracles under randomized frames, block layouts, null
keys and planted discrepancies.  Edit distance verifies against a
literal port of the reference DP (EditDistance.scala:55-119)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

HOUR = 3600_000


def _split_blocks(df, rng, to_table, max_blocks=5):
    order = rng.permutation(len(df))
    df = df.iloc[order].reset_index(drop=True)
    nb = int(rng.integers(1, max_blocks + 1))
    cuts = (np.sort(rng.choice(np.arange(1, len(df)), size=nb - 1,
                               replace=False)) if nb > 1 and len(df) > nb
            else np.array([], int))
    ds = None
    for idx in np.split(np.arange(len(df)), cuts):
        d = rd.from_arrow(to_table(df.iloc[idx]))
        ds = d if ds is None else ds.union(d)
    return ds


# ------------------------------------------------------------- summaries


@pytest.mark.parametrize("seed", [3, 17])
def test_summary_stats_vs_duckdb(ray_session, seed):
    from chronon_ray.pipelines.stats import summary_stats

    rng = np.random.default_rng(seed)
    n = 3000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, n).astype(np.int64),
        "ts": rng.integers(0, 5 * HOUR, n).astype(np.int64),
        "value": np.where(rng.random(n) < 0.15, np.nan,
                          np.round(rng.normal(10, 3, n), 4)),
        "name": np.where(rng.random(n) < 0.25, None, "x"),
    })

    def to_table(sub):
        return pa.table({
            "user_id": pa.array(sub["user_id"].to_numpy()),
            "ts": pa.array(sub["ts"].to_numpy()),
            "value": pa.array(sub["value"].to_numpy(), from_pandas=True),
            "name": pa.array(sub["name"].tolist(), type=pa.string()),
        })

    ds = _split_blocks(df, rng, to_table)
    out = summary_stats(ds, keys=["user_id"]).to_pandas() \
        .sort_values("bucket_ts").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", df)
    oracle = con.execute(f"""
        SELECT (ts // {HOUR}) * {HOUR} AS bucket_ts,
               SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS value_null,
               SUM(CASE WHEN name IS NULL THEN 1 ELSE 0 END) AS name_null,
               COUNT(*) AS total
        FROM t GROUP BY 1 ORDER BY 1""").df()
    assert (out["bucket_ts"].to_numpy()
            == oracle["bucket_ts"].to_numpy()).all()
    assert (out["value__null"].to_numpy()
            == oracle["value_null"].to_numpy()).all()
    assert (out["name__null"].to_numpy()
            == oracle["name_null"].to_numpy()).all()
    assert (out["total_count"].to_numpy() == oracle["total"].to_numpy()).all()
    np.testing.assert_allclose(
        out["value__null_rate"].to_numpy(),
        oracle["value_null"].to_numpy() / oracle["total"].to_numpy())
    # numeric column got a percentile summary, string column did not
    assert "value__percentiles" in out.columns
    assert "name__percentiles" not in out.columns


def test_summary_percentiles_exact_tier(ray_session):
    """Below the KLL level-0 capacity (2k items) the sketch holds every
    value with weight 1, so the percentile summary is deterministic —
    compare against the weighted-rank formula applied to raw values."""
    from chronon_ray.pipelines.stats import PERCENTILES_MERGED, summary_stats

    rng = np.random.default_rng(7)
    n = 200  # < 2*128: exact tier regardless of blocking
    vals = np.round(rng.normal(0, 5, n), 4)
    df = pd.DataFrame({"ts": np.zeros(n, dtype=np.int64), "value": vals})
    ds = _split_blocks(df, rng, lambda s: pa.table({
        "ts": pa.array(s["ts"].to_numpy()),
        "value": pa.array(s["value"].to_numpy())}))
    out = summary_stats(ds, k=128).to_pandas()
    got = np.array(out["value__percentiles"].iloc[0])
    sv = np.sort(vals)
    cw = np.arange(1, n + 1)
    exp = [sv[min(int(np.searchsorted(cw, q * n, side="left")), n - 1)]
           for q in PERCENTILES_MERGED]
    np.testing.assert_allclose(got, exp)


def test_summary_ds_bucketing(ray_session):
    """Entity tables without a ts column bucket on the ds day."""
    from chronon_ray.pipelines.stats import summary_stats

    df = pd.DataFrame({"ds": ["2023-01-01"] * 3 + ["2023-01-02"] * 2,
                       "v": [1.0, None, 3.0, None, None]})
    out = summary_stats(rd.from_pandas(df)).to_pandas() \
        .sort_values("bucket_ts").reset_index(drop=True)
    assert len(out) == 2
    assert out["v__null"].tolist() == [1, 2]
    assert out["total_count"].tolist() == [3, 2]


# ------------------------------------------------------------------ drift


def test_drift_metrics_detects_shift(ray_session):
    from chronon_ray.pipelines.stats import drift_metrics, summary_stats

    rng = np.random.default_rng(11)
    n = 4000

    def mk(loc):
        return rd.from_pandas(pd.DataFrame({
            "ts": np.zeros(n, dtype=np.int64),
            "value": rng.normal(loc, 1, n)}))

    base = summary_stats(mk(0.0), finalize=False)
    same = summary_stats(mk(0.0), finalize=False)
    shifted = summary_stats(mk(3.0), finalize=False)
    d_same = drift_metrics(base, same)
    d_shift = drift_metrics(base, shifted)
    assert d_same["psi"].iloc[0] < 0.05
    assert d_same["linf"].iloc[0] < 0.1
    assert d_shift["psi"].iloc[0] > 0.25      # "significant shift"
    assert d_shift["linf"].iloc[0] > 0.5
    assert d_shift["null_rate_delta"].iloc[0] == 0.0


def test_kll_rank_pmf_exact_tier():
    from chronon_ray.aggregators.sketches import KLL
    from chronon_ray.pipelines.stats import kll_pmf, kll_rank

    vals = np.array([1.0, 2.0, 2.0, 3.0, 10.0])
    st = KLL.update_many(KLL.empty(128), vals)
    assert kll_rank(st, 2.0) == pytest.approx(1 / 5)   # strictly below
    assert kll_rank(st, 2.5) == pytest.approx(3 / 5)
    assert kll_rank(st, 100.0) == 1.0
    pmf = kll_pmf(st, np.array([2.0, 3.0]))
    np.testing.assert_allclose(pmf, [1 / 5, 2 / 5, 2 / 5])
    assert pmf.sum() == pytest.approx(1.0)


# ---------------------------------------------------------- edit distance


def _reference_edit_distance(left, right):
    """Literal port of EditDistance.scala:55-119 (rolling two-row grid,
    separate insert/delete counts, edits into right)."""
    l = [] if left is None else list(left)
    r = [] if right is None else list(right)
    if not l and not r:
        return (0, 0)
    if not l:
        return (0, len(r))
    if not r:
        return (len(l), 0)
    rows = [[(i, 0) for i in range(len(l) + 1)],
            [None] * (len(l) + 1)]
    for i in range(1, len(r) + 1):
        cur, prev = rows[i % 2], rows[(i - 1) % 2]
        for j in range(len(l) + 1):
            if j == 0:
                cur[j] = (0, i)
            elif r[i - 1] == l[j - 1]:
                cur[j] = prev[j - 1]
            else:
                dr, ir = prev[j], cur[j - 1]
                if sum(dr) < sum(ir):
                    cur[j] = (dr[0], dr[1] + 1)
                else:
                    cur[j] = (ir[0] + 1, ir[1])
    return rows[len(r) % 2][len(l)]


@pytest.mark.parametrize("seed", [1, 23])
def test_edit_distance_vs_reference_dp(seed):
    from chronon_ray.pipelines.stats import edit_distance

    rng = np.random.default_rng(seed)
    for _ in range(300):
        l = rng.integers(0, 3, rng.integers(0, 9)).tolist()
        r = rng.integers(0, 3, rng.integers(0, 9)).tolist()
        if rng.random() < 0.05:
            l = None
        if rng.random() < 0.05:
            r = None
        assert edit_distance(l, r) == _reference_edit_distance(l, r), (l, r)
    # strings work too
    assert edit_distance("abc", "abd") == _reference_edit_distance("abc", "abd")


# ------------------------------------------------------- table comparison


def test_check_consistency_errors(ray_session):
    from chronon_ray.pipelines.stats import check_consistency

    l = pa.schema([("ts", pa.int64()), ("k", pa.string()),
                   ("v", pa.float64())])
    r_ok = pa.schema([("ts", pa.int64()), ("k", pa.string()),
                      ("v", pa.float64())])
    check_consistency(l, r_ok, ["ts", "k"])
    r_bad_type = pa.schema([("ts", pa.int64()), ("k", pa.string()),
                            ("v", pa.int64())])
    with pytest.raises(ValueError, match="dtype mismatch"):
        check_consistency(l, r_bad_type, ["ts", "k"])
    with pytest.raises(ValueError, match="missing on right"):
        check_consistency(l, pa.schema([("ts", pa.int64()),
                                        ("v", pa.float64()),
                                        ("x", pa.int32())]), ["ts", "k"])
    with pytest.raises(ValueError, match="time column"):
        check_consistency(l, r_ok, ["k"])
    # migration: left may carry extra fields
    l_extra = pa.schema([("ts", pa.int64()), ("k", pa.string()),
                         ("v", pa.float64()), ("extra", pa.int64())])
    with pytest.raises(ValueError, match="field counts"):
        check_consistency(l_extra, r_ok, ["ts", "k"])
    check_consistency(l_extra, r_ok, ["ts", "k"], migration_check=True)
    with pytest.raises(ValueError, match="duplicate"):
        check_consistency(
            pa.schema([("ts", pa.int64()), ("a", pa.int64()),
                       ("b", pa.int64())]),
            pa.schema([("ts", pa.int64()), ("c", pa.int64())]),
            ["ts"], mapping={"a": "c", "b": "c"})


def _gen_pair(rng, n):
    """Left/right frames sharing a unique key (id, ts) with planted
    discrepancies: value mismatches, one-sided nulls, one-sided rows,
    null keys, list + string columns."""
    ids = np.arange(n, dtype=np.int64)
    ts = rng.integers(0, 3 * HOUR, n).astype(np.int64)
    v = np.round(rng.normal(5, 2, n), 3)
    v[rng.random(n) < 0.1] = np.nan
    s = np.where(rng.random(n) < 0.15, None, "s")
    lst = [None if rng.random() < 0.1
           else rng.integers(0, 4, rng.integers(0, 5)).tolist()
           for _ in range(n)]
    left = pd.DataFrame({"id": ids, "ts": ts, "v": v, "s": s, "lst": lst})
    right = left.copy(deep=True)
    # planted value mismatches
    mism = rng.random(n) < 0.2
    right.loc[mism, "v"] = right.loc[mism, "v"] * 1.5 + 1
    smut = rng.random(n) < 0.1
    right.loc[smut, "s"] = "t"
    lmut = np.flatnonzero(rng.random(n) < 0.15)
    for i in lmut:
        cur = right.at[i, "lst"]
        right.at[i, "lst"] = ([0] if cur is None
                              else (cur + [9] if rng.random() < 0.5
                                    else cur[:-1]))
    # one-sided nulls
    right.loc[rng.random(n) < 0.08, "v"] = np.nan
    # one-sided rows: drop a few from each side
    left = left[rng.random(n) > 0.05].reset_index(drop=True)
    right = right[rng.random(n) > 0.05].reset_index(drop=True)
    # null keys on both sides never match
    nk = pd.DataFrame({"id": [None, None], "ts": [0, 0],
                       "v": [1.0, 2.0], "s": ["s", "s"],
                       "lst": [[1], [1]]})
    left = pd.concat([left, nk.iloc[:1]], ignore_index=True)
    right = pd.concat([right, nk.iloc[1:]], ignore_index=True)
    return left, right


def _pair_to_table(sub):
    return pa.table({
        "id": pa.array(sub["id"].tolist(), type=pa.int64()),
        "ts": pa.array(sub["ts"].to_numpy().astype(np.int64)),
        "v": pa.array(sub["v"].to_numpy(), from_pandas=True),
        "s": pa.array(sub["s"].tolist(), type=pa.string()),
        "lst": pa.array(sub["lst"].tolist(), type=pa.list_(pa.int64())),
    })


def _oracle_compare(left, right, bucket_ms=HOUR):
    """First-principles metric oracle: python-dict full outer join (null
    keys never match), per-bucket sums."""
    from chronon_ray.pipelines.stats import edit_distance

    def keyed(df):
        d = {}
        for row in df.itertuples(index=False):
            if pd.isna(row.id):
                continue
            d.setdefault((row.id, row.ts), []).append(row)
        return d

    lmap, rmap = keyed(left), keyed(right)
    pairs = []
    for k, lrows in lmap.items():
        rrows = rmap.get(k, [None])
        for a in lrows:
            for b in rrows:
                pairs.append((k[1], a, b))
    for k, rrows in rmap.items():
        if k not in lmap:
            for b in rrows:
                pairs.append((k[1], None, b))
    for row in left.itertuples(index=False):
        if pd.isna(row.id):
            pairs.append((row.ts, row, None))
    for row in right.itertuples(index=False):
        if pd.isna(row.id):
            pairs.append((row.ts, None, row))

    acc: dict = {}
    for ts, a, b in pairs:
        bkt = (ts // bucket_ms) * bucket_ms
        m = acc.setdefault(bkt, {})

        def bump(key, x=1):
            m[key] = m.get(key, 0) + x

        for f in ("v", "s", "lst"):
            av = getattr(a, f) if a is not None else None
            bv = getattr(b, f) if b is not None else None
            an = av is None or (isinstance(av, float) and np.isnan(av))
            bn = bv is None or (isinstance(bv, float) and np.isnan(bv))
            bump(f"{f}_total")
            if an and bn:
                bump(f"{f}_both_null")
            elif an:
                bump(f"{f}_left_null")
            elif bn:
                bump(f"{f}_right_null")
            if not an and not bn:
                if f == "lst":
                    if list(av) != list(bv):
                        bump(f"{f}_mismatch")
                    if len(av) != len(bv):
                        bump(f"{f}_mismatch_length")
                elif f == "v":
                    if av != bv:
                        bump(f"{f}_mismatch")
                elif av != bv:
                    bump(f"{f}_mismatch")
            if f == "v":
                denom = (abs(av) if not an else 0) + (abs(bv) if not bn else 0)
                smape = (2 * abs(av - bv) / denom
                         if not an and not bn and denom != 0 else 0.0)
                m["v_smape_sum"] = m.get("v_smape_sum", 0.0) + smape
            if f == "lst" and not an and not bn:
                ins, dele = edit_distance(av, bv)
                m.setdefault("ed", []).append((ins, dele))
    return acc


@pytest.mark.parametrize("seed", [5, 29])
def test_compare_tables_vs_first_principles(ray_session, seed):
    from chronon_ray.pipelines.stats import compare_tables

    rng = np.random.default_rng(seed)
    left, right = _gen_pair(rng, 400)
    lds = _split_blocks(left, rng, _pair_to_table)
    rds = _split_blocks(right, rng, _pair_to_table)
    cmp_ds, met_ds = compare_tables(lds, rds, keys=["id", "ts"],
                                    num_partitions=7)
    met = met_ds.to_pandas().set_index("bucket_ts").sort_index()
    oracle = _oracle_compare(left, right)
    assert set(met.index) == set(oracle)
    for bkt, m in oracle.items():
        row = met.loc[bkt]
        for f in ("v", "s", "lst"):
            for suffix in ("total", "both_null", "left_null", "right_null",
                           "mismatch"):
                assert row[f"{f}_{suffix}"] == m.get(f"{f}_{suffix}", 0), \
                    (bkt, f, suffix)
        assert row["lst_mismatch_length"] == m.get("lst_mismatch_length", 0)
        assert row["v_smape"] == pytest.approx(
            m.get("v_smape_sum", 0.0) / m["v_total"])
    # compare_ds cardinality = full outer join cardinality
    assert cmp_ds.count() == sum(
        m["v_total"] for m in oracle.values())


def test_compare_join_mapping_and_migration(ray_session):
    from chronon_ray.pipelines.stats import compare_join

    left = pd.DataFrame({"ts": np.array([0, 1], dtype=np.int64),
                         "val": [1.0, 2.0],
                         "legacy_only": [9, 9]})
    right = pd.DataFrame({"ts": np.array([0, 1], dtype=np.int64),
                          "value_new": [1.0, 5.0]})
    cmp_ds, fields = compare_join(
        rd.from_pandas(left), rd.from_pandas(right), keys=["ts"],
        mapping={"val": "value_new"}, migration_check=True)
    assert [n for n, _ in fields] == ["val"]
    out = cmp_ds.to_pandas().sort_values("ts")
    assert out["val_left"].tolist() == [1.0, 2.0]
    assert out["val_right"].tolist() == [1.0, 5.0]
    assert "legacy_only_left" not in out.columns


def test_compare_percentile_columns_exact_tier(ray_session):
    """left_minus_right sketch over an exact-tier bucket: percentile grid
    of the planted differences, deterministic."""
    from chronon_ray.pipelines.stats import (COMPARE_PERCENTILES,
                                             compare_tables)

    n = 100
    ts = np.zeros(n, dtype=np.int64)
    ids = np.arange(n, dtype=np.int64)
    lv = np.linspace(0, 9.9, n)
    diff = np.repeat(np.arange(10), 10).astype(np.float64)
    left = pd.DataFrame({"id": ids, "ts": ts, "v": lv})
    right = pd.DataFrame({"id": ids, "ts": ts, "v": lv - diff})
    _, met = compare_tables(rd.from_pandas(left), rd.from_pandas(right),
                            keys=["id", "ts"])
    got = np.array(met.to_pandas()["v_left_minus_right"].iloc[0])
    sv = np.sort(diff)
    cw = np.arange(1, n + 1)
    exp = [sv[min(int(np.searchsorted(cw, q * n, side="left")), n - 1)]
           for q in COMPARE_PERCENTILES]
    np.testing.assert_allclose(got, exp)


def test_compare_map_columns_stringified(ray_session):
    """Map values compare by canonical string (the reference stringifies
    Spark maps before metric computation)."""
    from chronon_ray.pipelines.stats import compare_tables

    mt = pa.map_(pa.string(), pa.int64())
    ids = np.arange(4, dtype=np.int64)

    def tbl(maps):
        return pa.table({
            "id": pa.array(ids), "ts": pa.array(np.zeros(4, dtype=np.int64)),
            "m": pa.array(maps, type=mt)})

    left = rd.from_arrow(tbl([{"a": 1, "b": 2}, {"a": 1}, None, {"z": 9}]))
    right = rd.from_arrow(tbl([{"b": 2, "a": 1}, {"a": 2}, None, None]))
    _, met = compare_tables(left, right, keys=["id", "ts"])
    row = met.to_pandas().iloc[0]
    # {a=1, b=2} == {b=2, a=1} canonically; {a=1} != {a=2}
    assert row["m_mismatch"] == 1
    assert row["m_both_null"] == 1
    assert row["m_right_null"] == 1
    assert row["m_total"] == 4


# ------------------------------------------------------------ consistency


def _write_events(tmp_path, rng, n=1500, users=25):
    ts = rng.integers(0, 8 * 86_400_000, n).astype(np.int64)
    df = pd.DataFrame({
        "user_id": rng.integers(0, users, n).astype(np.int64),
        "ts": ts,
        "event_id": np.arange(n, dtype=np.int64),
        # integer-valued floats: sums are exact under any partition order,
        # so truth == logged holds bit-for-bit wherever we didn't perturb
        "value": rng.integers(1, 100, n).astype(np.float64),
        "ds": pd.to_datetime(ts, unit="ms").strftime("%Y-%m-%d"),
    })
    p = str(tmp_path / "events.parquet")
    df.to_parquet(p, index=False)
    return p, df


def test_consistency_job_end_to_end(ray_session, tmp_path):
    """ConsistencyJob analog: serve (here: perturb a copy of the offline
    truth), log, and measure — mismatch counts land exactly on the
    perturbed rows, clean rows read back all-match."""
    from chronon_ray.api import (EventSource, GroupByConf, JoinConf,
                                 JoinPart, TQuery, agg, window)
    from chronon_ray.pipelines.joins import compute_join
    from chronon_ray.pipelines.stats import consistency_job

    rng = np.random.default_rng(13)
    events_path, _ = _write_events(tmp_path, rng)
    events_src = EventSource(table=events_path, query=TQuery())
    left_src = EventSource(
        table=events_path,
        query=TQuery.of(selects={"user_id": "user_id", "ts": "ts",
                                 "event_id": "event_id"}))
    gb = GroupByConf(name="gb_val", sources=(events_src,),
                     key_columns=("user_id",),
                     aggregations=(agg("value", "sum", [window(7, "d")]),
                                   agg("value", "count", [window(7, "d")])))
    jc = JoinConf(name="cj", left=left_src, parts=(JoinPart(group_by=gb),),
                  row_ids=("user_id", "ts", "event_id"))

    truth = compute_join(jc, num_partitions=8).to_pandas()
    # "online-logged" values: truth with a deterministic perturbation
    logged = truth.copy(deep=True)
    pert = logged["event_id"].to_numpy() % 7 == 0
    col = "gb_val_value_sum_7d"
    logged.loc[pert, col] = logged.loc[pert, col] + 1.0
    nulled = logged["event_id"].to_numpy() % 11 == 0
    logged.loc[nulled, col] = np.nan
    # keep the offline schema: the count column is a nullable int64
    logged["gb_val_value_count_7d"] = \
        logged["gb_val_value_count_7d"].astype("Int64")
    logged_path = str(tmp_path / "logged.parquet")
    logged.to_parquet(logged_path, index=False)

    _, met_ds = consistency_job(jc, logged_path, time_bucket_minutes=24 * 60)
    met = met_ds.to_pandas()
    total = met[f"{col}_total"].sum()
    assert total == len(truth)
    truth_null = truth[col].isna().to_numpy()
    exp_mismatch = int((pert & ~nulled & ~truth_null).sum())
    exp_right_null = int((nulled & ~truth_null).sum())
    assert met[f"{col}_mismatch"].sum() == exp_mismatch
    assert met[f"{col}_right_null"].sum() == exp_right_null
    assert met[f"{col}_left_null"].sum() == 0
    # count column was never perturbed: zero mismatches
    assert met["gb_val_value_count_7d_mismatch"].sum() == 0
    assert met["gb_val_value_count_7d_right_null"].sum() == 0


def test_consistency_job_sampling(ray_session, tmp_path):
    from chronon_ray.api import (EventSource, GroupByConf, JoinConf,
                                 JoinPart, TQuery, agg, window)
    from chronon_ray.pipelines.joins import compute_join
    from chronon_ray.pipelines.stats import consistency_job

    rng = np.random.default_rng(31)
    events_path, _ = _write_events(tmp_path, rng, n=800)
    events_src = EventSource(table=events_path, query=TQuery())
    left_src = EventSource(
        table=events_path,
        query=TQuery.of(selects={"user_id": "user_id", "ts": "ts",
                                 "event_id": "event_id"}))
    gb = GroupByConf(name="g", sources=(events_src,),
                     key_columns=("user_id",),
                     aggregations=(agg("value", "sum", [window(7, "d")]),))
    jc = JoinConf(name="cjs", left=left_src, parts=(JoinPart(group_by=gb),),
                  row_ids=("user_id", "ts", "event_id"))
    truth = compute_join(jc, num_partitions=8).to_pandas()
    logged_path = str(tmp_path / "logged.parquet")
    truth.to_parquet(logged_path, index=False)

    _, met_full = consistency_job(jc, logged_path,
                                  time_bucket_minutes=24 * 60)
    _, met_half = consistency_job(jc, logged_path, sample_percent=50,
                                  time_bucket_minutes=24 * 60)
    col = "g_value_sum_7d"
    full = met_full.to_pandas()
    half = met_half.to_pandas()
    assert full[f"{col}_mismatch"].sum() == 0
    assert full[f"{col}_total"].sum() == len(truth)
    # the deterministic sample thins BOTH sides congruently: the compare
    # population IS the sampled population — no one-sided left_null
    # dilution of rates/SMAPE (the reference's RAND() can only thin the
    # comparison left)
    assert half[f"{col}_mismatch"].sum() == 0
    assert half[f"{col}_left_null"].sum() == 0
    assert half[f"{col}_right_null"].sum() == 0
    sampled = int(half[f"{col}_total"].sum())
    assert 0 < sampled < len(truth)


# ------------------------------------------------------------ summary job


def _daily_events(tmp_path, rng, days=5, per_day=200):
    rows = []
    for d in range(days):
        ts = (d * 86_400_000
              + rng.integers(0, 86_400_000, per_day).astype(np.int64))
        rows.append(pd.DataFrame({
            "user_id": rng.integers(0, 10, per_day).astype(np.int64),
            "ts": ts,
            "value": np.where(rng.random(per_day) < 0.1, np.nan,
                              rng.normal(5, 2, per_day)),
            "ds": pd.to_datetime(ts, unit="ms").strftime("%Y-%m-%d"),
        }))
    df = pd.concat(rows, ignore_index=True)
    p = str(tmp_path / "in.parquet")
    df.to_parquet(p, index=False)
    return p, df


def test_summary_job_backfill_and_resume(ray_session, tmp_path):
    from chronon_ray.pipelines.stats import summary_job
    from chronon_ray.sources import list_partitions

    rng = np.random.default_rng(19)
    inp, df = _daily_events(tmp_path, rng)
    out = str(tmp_path / "stats_out")
    written = summary_job(inp, out, keys=["user_id"], step_days=2,
                          time_bucket_minutes=24 * 60)
    all_days = sorted(df["ds"].unique())
    assert sorted(written) == all_days
    assert list_partitions(out) == all_days
    # re-run: nothing to do
    assert summary_job(inp, out, keys=["user_id"], step_days=2,
                       time_bucket_minutes=24 * 60) == {}
    # values: per-day null counts vs pandas
    import ray.data as rd
    got = rd.read_parquet(out).to_pandas().sort_values("bucket_ts")
    exp = df.groupby("ds").agg(nulls=("value", lambda s: s.isna().sum()),
                               total=("value", "size")).sort_index()
    assert got["value__null"].tolist() == exp["nulls"].tolist()
    assert got["total_count"].tolist() == exp["total"].tolist()
    # end_ds truncation + later-day catch-up resume
    out2 = str(tmp_path / "stats_out2")
    summary_job(inp, out2, keys=["user_id"], end_ds=all_days[1],
                time_bucket_minutes=24 * 60)
    assert list_partitions(out2) == all_days[:2]
    w2 = summary_job(inp, out2, keys=["user_id"],
                     time_bucket_minutes=24 * 60)
    assert sorted(w2) == all_days[2:]


def test_summary_job_sampling_deterministic(ray_session, tmp_path):
    from chronon_ray.pipelines.stats import summary_job

    rng = np.random.default_rng(23)
    inp, df = _daily_events(tmp_path, rng, days=2, per_day=500)
    outs = []
    for name in ("a", "b"):
        out = str(tmp_path / f"samp_{name}")
        summary_job(inp, out, keys=["user_id"], sample=0.5,
                    time_bucket_minutes=24 * 60)
        import ray.data as rd
        outs.append(rd.read_parquet(out).to_pandas()
                    .sort_values("bucket_ts").reset_index(drop=True))
    a, b = outs
    # identical reruns: the sample is a ts hash, not RAND()
    assert a["total_count"].tolist() == b["total_count"].tolist()
    assert a["value__null"].tolist() == b["value__null"].tolist()
    tot = a["total_count"].sum()
    assert 0.4 * len(df) < tot < 0.6 * len(df)


# -------------------------------------------------- review-pass regressions


def test_compare_null_time_key_rows_excluded(ray_session):
    """A row with a NULL time key survives the outer join but has no
    bucket: the metrics exclude it instead of minting an INT64_MIN
    phantom bucket."""
    from chronon_ray.pipelines.stats import compare_tables

    left = pa.table({"id": pa.array([1, 2], type=pa.int64()),
                     "ts": pa.array([0, None], type=pa.int64()),
                     "v": pa.array([1.0, 2.0])})
    right = pa.table({"id": pa.array([1], type=pa.int64()),
                      "ts": pa.array([0], type=pa.int64()),
                      "v": pa.array([1.0])})
    cmp_ds, met_ds = compare_tables(rd.from_arrow(left),
                                    rd.from_arrow(right),
                                    keys=["id", "ts"])
    assert cmp_ds.count() == 2           # null-ts row survives the join
    met = met_ds.to_pandas()
    assert met["bucket_ts"].tolist() == [0]
    assert met["v_total"].tolist() == [1]  # bucketed metrics exclude it


def test_summary_decimal_and_nullable_int(ray_session):
    from chronon_ray.pipelines.stats import summary_stats
    from decimal import Decimal

    t = pa.table({
        "ts": pa.array([0, 0, 0, 0], type=pa.int64()),
        "d": pa.array([Decimal("1.5"), None, Decimal("2.5"), None],
                      type=pa.decimal128(10, 2)),
        "i": pa.array([5, None, 7, None], type=pa.int64()),
    })
    out = summary_stats(rd.from_arrow(t)).to_pandas()
    assert out["d__null"].iloc[0] == 2
    assert out["i__null"].iloc[0] == 2
    # p50 convention: first value whose cum weight >= q*n (1.5 of {1.5,2.5})
    assert out["d__percentiles"].iloc[0][10] == 1.5
    assert out["i__percentiles"].iloc[0][10] == 5.0


def test_drift_dark_column_returns_none(ray_session):
    """A column that went entirely null has no distribution: drift is
    None (the null-rate delta is the alerting signal), never NaN."""
    from chronon_ray.pipelines.stats import drift_metrics, summary_stats

    n = 200
    a = rd.from_arrow(pa.table({
        "ts": pa.array(np.zeros(n, dtype=np.int64)),
        "v": pa.array(np.random.default_rng(0).normal(0, 1, n))}))
    b = rd.from_arrow(pa.table({
        "ts": pa.array(np.zeros(n, dtype=np.int64)),
        "v": pa.array([None] * n, type=pa.float64())}))
    d = drift_metrics(summary_stats(a, finalize=False),
                      summary_stats(b, finalize=False))
    row = d[d["column"] == "v"].iloc[0]
    assert row["linf"] is None or pd.isna(row["linf"])
    assert not np.isnan(row["null_rate_delta"])
    assert row["null_rate_delta"] == 1.0


def test_regularize_never_negative():
    from chronon_ray.pipelines.stats import _regularize

    pmf = np.array([0.0, 1e-9, 0.5, 0.5 - 1e-9])
    out = _regularize(pmf, eps=1e-6)
    assert (out > 0).all()
    assert out.sum() == pytest.approx(pmf.sum(), rel=1e-6)


def test_encode_log_rejects_unsupported_key_type(ray_session):
    from chronon_ray.pipelines.logflat import encode_log

    t = pa.table({"k": pa.array([0], type=pa.timestamp("ms")),
                  "ts": pa.array([0], type=pa.int64()),
                  "v": pa.array([1.0])})
    with pytest.raises(ValueError, match="unsupported log key type"):
        encode_log(rd.from_arrow(t), key_cols=["k"], name="j")


def test_summary_job_late_ts_never_clobbers(ray_session, tmp_path):
    """An event landing in partition D+1 with ts on day D must not make
    step D+1 rewrite day D's completed summary with a partial one."""
    import os

    from chronon_ray.pipelines.stats import summary_job

    d0, d1 = "2024-01-01", "2024-01-02"
    t0 = int(np.datetime64(d0, "ms").astype(np.int64))
    base = str(tmp_path / "hive_in")
    for ds_val, rows in (
        (d0, pd.DataFrame({"user_id": np.array([1, 2], dtype=np.int64),
                           "ts": np.array([t0 + 100, t0 + 200],
                                          dtype=np.int64),
                           "value": [1.0, 2.0]})),
        # landing on d1: one on-time row + one LATE row with ts on d0
        (d1, pd.DataFrame({"user_id": np.array([3, 4], dtype=np.int64),
                           "ts": np.array([t0 + 86_400_000 + 100, t0 + 300],
                                          dtype=np.int64),
                           "value": [3.0, 4.0]})),
    ):
        p = os.path.join(base, f"ds={ds_val}")
        os.makedirs(p)
        rows.to_parquet(os.path.join(p, "part-0.parquet"), index=False)
    out = str(tmp_path / "hive_out")
    # step_days=1: day d0 written by its own step only
    summary_job(base, out, keys=["user_id"], step_days=1,
                time_bucket_minutes=24 * 60)
    import ray.data as rd2
    got = rd2.read_parquet(out).to_pandas().sort_values("bucket_ts")
    # d0's summary has exactly the two rows whose ts-day is d0 scanned
    # from its own step; the late row (landed d1, ts-day d0) was NOT
    # allowed to clobber it from step d1
    assert got["total_count"].tolist() == [2, 1]
    # re-run converges (nothing rewritten)
    assert summary_job(base, out, keys=["user_id"], step_days=1,
                       time_bucket_minutes=24 * 60) == {}


def test_summary_job_chaos_resume(ray_session, tmp_path):
    """Deleted output partitions and torn tmp dirs: a rerun converges to
    the one-shot result (the backfill chaos contract)."""
    import os
    import shutil

    import ray.data as rd2

    from chronon_ray.pipelines.stats import summary_job

    rng = np.random.default_rng(41)
    inp, df = _daily_events(tmp_path, rng, days=6, per_day=100)
    out = str(tmp_path / "chaos_out")
    summary_job(inp, out, keys=["user_id"], step_days=2,
                time_bucket_minutes=24 * 60)
    oneshot = rd2.read_parquet(out).to_pandas() \
        .sort_values("bucket_ts").reset_index(drop=True)
    # chaos: delete the LAST completed day (resume semantics refill only
    # trailing holes), leave a torn tmp dir behind
    days = sorted(d for d in os.listdir(out) if d.startswith("ds="))
    shutil.rmtree(os.path.join(out, days[-1]))
    os.makedirs(os.path.join(out, "_tmp.deadbeef"), exist_ok=True)
    with open(os.path.join(out, "_tmp.deadbeef", "junk"), "w") as f:
        f.write("torn")
    w = summary_job(inp, out, keys=["user_id"], step_days=2,
                    time_bucket_minutes=24 * 60)
    assert sorted(w) == [days[-1][3:]]
    again = rd2.read_parquet(out).to_pandas() \
        .sort_values("bucket_ts").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        again[oneshot.columns.drop("ds")], oneshot.drop(columns=["ds"]))


def test_drift_schema_evolution_reported(ray_session):
    """A column that disappeared between periods is itself a drift
    signal, not a KeyError."""
    from chronon_ray.pipelines.stats import drift_metrics, summary_stats

    n = 60
    a = rd.from_arrow(pa.table({
        "ts": pa.array(np.zeros(n, dtype=np.int64)),
        "x": pa.array(np.arange(n, dtype=np.float64)),
        "y": pa.array(np.arange(n, dtype=np.float64))}))
    b = rd.from_arrow(pa.table({
        "ts": pa.array(np.zeros(n, dtype=np.int64)),
        "x": pa.array(np.arange(n, dtype=np.float64))}))
    d = drift_metrics(summary_stats(a, finalize=False),
                      summary_stats(b, finalize=False))
    st = d.set_index("column")["status"]
    assert st["x"] == "ok"
    assert st["y"] == "missing_in_comparison"
    d2 = drift_metrics(summary_stats(b, finalize=False),
                       summary_stats(a, finalize=False))
    assert d2.set_index("column")["status"]["y"] == "missing_in_reference"


def test_drift_rejects_finalized_summaries(ray_session):
    from chronon_ray.pipelines.stats import drift_metrics, summary_stats

    a = rd.from_arrow(pa.table({
        "ts": pa.array(np.zeros(10, dtype=np.int64)),
        "x": pa.array(np.arange(10, dtype=np.float64))}))
    fin = summary_stats(a, finalize=True)
    ir = summary_stats(a, finalize=False)
    with pytest.raises(ValueError, match="FINALIZED"):
        drift_metrics(fin, ir)
    with pytest.raises(ValueError, match="FINALIZED"):
        drift_metrics(ir, fin)


def test_consistency_start_partition_congruent(ray_session, tmp_path):
    """A left start_partition clips BOTH sides of the compare: no
    left_null dilution from pre-start logged rows."""
    import dataclasses

    from chronon_ray.api import (EventSource, GroupByConf, JoinConf,
                                 JoinPart, TQuery, agg, window)
    from chronon_ray.pipelines.joins import compute_join
    from chronon_ray.pipelines.stats import consistency_job

    rng = np.random.default_rng(53)
    events_path, ev = _write_events(tmp_path, rng, n=1000)
    events_src = EventSource(table=events_path, query=TQuery())
    start = sorted(ev["ds"].unique())[3]
    left_src = EventSource(
        table=events_path,
        query=TQuery.of(selects={"user_id": "user_id", "ts": "ts",
                                 "event_id": "event_id"},
                        start_partition=start))
    gb = GroupByConf(name="g", sources=(events_src,),
                     key_columns=("user_id",),
                     aggregations=(agg("value", "sum", [window(7, "d")]),))
    jc = JoinConf(name="cs", left=left_src, parts=(JoinPart(group_by=gb),),
                  row_ids=("user_id", "ts", "event_id"))
    # logged table covers EVERY day (pre-start rows included)
    jc_all = dataclasses.replace(
        jc, left=dataclasses.replace(
            left_src, query=dataclasses.replace(left_src.query,
                                                start_partition=None)))
    logged = compute_join(jc_all, num_partitions=8).to_pandas()
    logged_path = str(tmp_path / "logged_all.parquet")
    logged.to_parquet(logged_path, index=False)

    _, met_ds = consistency_job(jc, logged_path,
                                time_bucket_minutes=24 * 60)
    met = met_ds.to_pandas()
    col = "g_value_sum_7d"
    start_ms = int(np.datetime64(start, "ms").astype(np.int64))
    n_after = int((logged["ts"] >= start_ms).sum())
    assert met[f"{col}_total"].sum() == n_after
    assert met[f"{col}_left_null"].sum() == 0
    assert met[f"{col}_mismatch"].sum() == 0
    assert met["bucket_ts"].min() >= start_ms


def test_summary_ir_kv_round_trip(ray_session):
    """SummaryJob also writes an upload table for the stats store — the
    KV codec packs IR summaries (key = bucket_ts) and the restored table
    still drives drift, the fetcher-side-merge analog."""
    from chronon_ray.pipelines.stats import drift_metrics, summary_stats
    from chronon_ray.serving import kv_export, kv_import

    rng = np.random.default_rng(61)
    n = 1000
    mk = lambda loc: rd.from_arrow(pa.table({
        "ts": pa.array(rng.integers(0, 2 * HOUR, n).astype(np.int64)),
        "v": pa.array(rng.normal(loc, 1, n))}))
    base = summary_stats(mk(0.0), finalize=False)
    kv = kv_export(base, ["bucket_ts"])
    restored = kv_import(kv, [pa.field("bucket_ts", pa.int64())])
    shifted = summary_stats(mk(3.0), finalize=False)
    d_direct = drift_metrics(base, shifted)
    d_restored = drift_metrics(restored, shifted)
    pd.testing.assert_frame_equal(
        d_direct.sort_values(["bucket_ts", "column"]).reset_index(drop=True),
        d_restored.sort_values(["bucket_ts", "column"])
        .reset_index(drop=True))


def test_consistency_job_multi_part_join(ray_session, tmp_path):
    """consistency_job over a TWO-part join (temporal + snapshot
    accuracy, key mapping, prefix): the comparison join rebuilds both
    parts over the logged left; a perturbation planted in the SNAPSHOT
    part's column is localized to that column."""
    from chronon_ray.api import (Accuracy, EventSource, GroupByConf,
                                 JoinConf, JoinPart, TQuery, agg, window)
    from chronon_ray.pipelines.joins import compute_join
    from chronon_ray.pipelines.stats import consistency_job

    rng = np.random.default_rng(71)
    events_path, _ = _write_events(tmp_path, rng, n=1200)
    events_src = EventSource(table=events_path, query=TQuery())
    left_src = EventSource(
        table=events_path,
        query=TQuery.of(selects={"user_id": "user_id", "ts": "ts",
                                 "event_id": "event_id"}))
    gb_t = GroupByConf(name="gt", sources=(events_src,),
                       key_columns=("user_id",),
                       aggregations=(agg("value", "sum", [window(7, "d")]),))
    gb_s = GroupByConf(name="gs", sources=(events_src,),
                       key_columns=("user_id",),
                       aggregations=(agg("value", "count",
                                         [window(7, "d")]),),
                       accuracy=Accuracy.SNAPSHOT)
    jc = JoinConf(name="cm2", left=left_src,
                  parts=(JoinPart(group_by=gb_t),
                         JoinPart(group_by=gb_s, prefix="snap")),
                  row_ids=("user_id", "ts", "event_id"))
    truth = compute_join(jc, num_partitions=8).to_pandas()
    snap_col = next(c for c in truth.columns if c.startswith("snap_"))
    logged = truth.copy(deep=True)
    pert = logged["event_id"].to_numpy() % 5 == 0
    logged[snap_col] = logged[snap_col].astype("Int64")
    logged.loc[pert, snap_col] = logged.loc[pert, snap_col] + 1
    tcol = "gt_value_sum_7d"
    logged_path = str(tmp_path / "logged2.parquet")
    import pyarrow as pa2
    pa2.parquet.write_table(
        pa2.Table.from_pandas(logged, preserve_index=False), logged_path)

    _, met_ds = consistency_job(jc, logged_path,
                                time_bucket_minutes=24 * 60)
    met = met_ds.to_pandas()
    truth_nonnull = truth[snap_col].notna().to_numpy()
    assert met[f"{snap_col}_mismatch"].sum() == int(
        (pert & truth_nonnull).sum())
    assert met[f"{tcol}_mismatch"].sum() == 0
    assert met[f"{tcol}_total"].sum() == len(truth)
