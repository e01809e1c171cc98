"""Randomized differential test for the temporal-entities mutation replay.

Seeded random CDC scenarios (updates / inserts / deletes, same-ts pairs,
null inputs, map columns, bucketed parts, day-boundary and exact-tie
queries) are checked against an independent pure-python point-in-time
oracle that reconstructs the net state multiset per query:

    state_at(q.ts) = snapshot(day(q)-1) rows
                   + after-rows(day(q), mutation_ts < q.ts)
                   - before-rows(day(q), mutation_ts < q.ts)

and computes every supported deletable op (SUM/COUNT/AVERAGE/VARIANCE/
SKEW/KURTOSIS/HISTOGRAM, plus map-input SUM and bucketed SUM) directly
from the multiset. Conventions pinned to the engine (see probe in
tests history): empty-after-deletes sum is 0.0 / count 0 / average NaN;
histogram drops zero-net keys; map/bucket sums KEEP zero-net keys once
the key has contributed. Exercises the round-4 vectorized replay
(signed power-sum matvecs pivoted at the base-IR mean, scatter-add
histogram planes, per-map-key planes) far beyond the fixed fixtures.
"""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from chronon_ray.api import GroupByConf, agg
from chronon_ray.pipelines.mutations import temporal_entities_join

MS_DAY = 86_400_000
D0 = 1_704_067_200_000  # 2024-01-01T00:00Z


def _new_row(rng):
    amount = None if rng.random() < 0.12 else float(rng.integers(1, 100))
    level = None if rng.random() < 0.10 else int(rng.integers(1, 6))
    if rng.random() < 0.15:
        metrics = None
    else:
        ks = rng.choice(["x", "y", "z"], size=int(rng.integers(1, 4)),
                        replace=False)
        metrics = {str(m): float(rng.integers(1, 50)) for m in ks}
    store = str(rng.choice(["s1", "s2", "s3"]))
    return {"amount": amount, "level": level, "metrics": metrics,
            "store": store}


def _gen(seed):
    """3 snapshot days; mutations during days 1..3 evolve the state that
    the NEXT snapshot reflects; queries on days 1..2."""
    rng = np.random.Generator(np.random.PCG64(seed))
    keys = [f"k{i}" for i in range(int(rng.integers(3, 7)))]
    state = {k: {} for k in keys}
    seq = 0
    for k in keys:
        for _ in range(int(rng.integers(1, 5))):
            state[k][f"i{seq}"] = _new_row(rng)
            seq += 1
    snap_rows, mut_rows = [], []
    for d in range(3):
        ds = pd.Timestamp((D0 // MS_DAY + d) * MS_DAY,
                          unit="ms").strftime("%Y-%m-%d")
        for k in keys:
            for r in state[k].values():
                snap_rows.append((k, ds, r))
        day_start = D0 + (d + 1) * MS_DAY
        for k in keys:
            # timestamps must be monotone per key within the day: state
            # evolves in op order, so a delete's ts must follow the insert
            # it deletes (real CDC streams are causally ordered per key)
            t = day_start
            for _ in range(int(rng.integers(0, 4))):
                t = t + int(rng.integers(1, MS_DAY // 4))
                kind = rng.choice(["update", "insert", "delete"])
                if kind == "update" and state[k]:
                    item = str(rng.choice(sorted(state[k])))
                    new = _new_row(rng)
                    mut_rows.append((k, t, True, state[k][item]))
                    mut_rows.append((k, t, False, new))
                    state[k][item] = new
                elif kind == "delete" and state[k]:
                    item = str(rng.choice(sorted(state[k])))
                    mut_rows.append((k, t, True, state[k].pop(item)))
                else:
                    r = _new_row(rng)
                    state[k][f"i{seq}"] = r
                    seq += 1
                    mut_rows.append((k, t, False, r))
    q_rows = []
    for d in (1, 2):
        day_start = D0 + d * MS_DAY
        for k in keys:
            for _ in range(3):
                q_rows.append((k, day_start + int(rng.integers(0, MS_DAY))))
            q_rows.append((k, day_start))  # exact day boundary
    if mut_rows:
        m = mut_rows[int(rng.integers(0, len(mut_rows)))]
        if D0 + MS_DAY <= m[1] < D0 + 3 * MS_DAY:
            q_rows.append((m[0], m[1]))  # exact mutation-ts tie (strict <)
    return snap_rows, mut_rows, q_rows


def _to_tables(snap_rows, mut_rows, q_rows):
    mtype = pa.map_(pa.string(), pa.float64())

    def cols(rows, with_ds=False, with_mut=False):
        out = {"entity_id": pa.array([r[0] for r in rows])}
        if with_ds:
            out["ds"] = pa.array([r[1] for r in rows])
            payload = [r[2] for r in rows]
        if with_mut:
            out["mutation_ts"] = pa.array([r[1] for r in rows],
                                          type=pa.int64())
            out["is_before"] = pa.array([r[2] for r in rows])
            payload = [r[3] for r in rows]
        out["amount"] = pa.array([p["amount"] for p in payload],
                                 type=pa.float64())
        out["level"] = pa.array([p["level"] for p in payload],
                                type=pa.int64())
        out["metrics"] = pa.array([p["metrics"] for p in payload],
                                  type=mtype)
        out["store"] = pa.array([p["store"] for p in payload])
        return pa.table(out)

    snapshots = cols(snap_rows, with_ds=True)
    mutations = cols(mut_rows, with_mut=True)
    queries = pa.table({
        "entity_id": pa.array([r[0] for r in q_rows]),
        "ts": pa.array([r[1] for r in q_rows], type=pa.int64()),
    })
    return snapshots, mutations, queries


def _row_key(p):
    met = None if p["metrics"] is None else tuple(sorted(p["metrics"].items()))
    return (p["amount"], p["level"], met, p["store"])


def _oracle_one(snap_rows, mut_rows, k, t):
    """Net state multiset at (k, t) → expected feature dict."""
    day = t // MS_DAY
    prev_ds = pd.Timestamp((day - 1) * MS_DAY, unit="ms").strftime("%Y-%m-%d")
    day_start = day * MS_DAY
    from collections import Counter
    net = Counter()
    payload = {}
    contributed = []  # (row, sign) for keep-zero map conventions
    for (ek, ds, p) in snap_rows:
        if ek == k and ds == prev_ds:
            rk = _row_key(p)
            net[rk] += 1
            payload[rk] = p
            contributed.append((p, 1))
    for (ek, mts, before, p) in mut_rows:
        if ek == k and day_start <= mts < t:
            rk = _row_key(p)
            net[rk] += -1 if before else 1
            payload[rk] = p
            contributed.append((p, -1 if before else 1))
    vals = []
    for rk, c in net.items():
        assert c >= 0, "generator invariant: deletes match existing rows"
        p = payload[rk]
        if p["amount"] is not None:
            vals.extend([p["amount"]] * c)
    x = np.asarray(vals, dtype=np.float64)
    n = len(x)
    out = {}
    touched_amount = any(p["amount"] is not None for p, _ in contributed)
    out["amount_sum"] = float(x.sum()) if touched_amount else None
    # count is NULL (no IR) when no non-null value ever contributed,
    # 0 when contributions existed but cancelled out
    out["amount_count"] = n if touched_amount else None
    out["amount_average"] = float(x.mean()) if n else float("nan")
    if n:
        m = x.mean()
        m2 = float(((x - m) ** 2).sum())
        m3 = float(((x - m) ** 3).sum())
        m4 = float(((x - m) ** 4).sum())
        out["amount_variance"] = m2 / n
        out["amount_skew"] = (float("nan") if n < 3 or m2 == 0
                              else math.sqrt(n) * m3 / m2 ** 1.5)
        out["amount_kurtosis"] = (float("nan") if n < 4 or m2 == 0
                                  else n * m4 / (m2 * m2) - 3.0)
    else:
        out["amount_variance"] = float("nan")
        out["amount_skew"] = float("nan")
        out["amount_kurtosis"] = float("nan")
    hist = Counter()
    for rk, c in net.items():
        p = payload[rk]
        if p["level"] is not None and c > 0:
            hist[str(p["level"])] += c
    out["level_histogram"] = dict(hist)
    msum = {}
    for p, s in contributed:
        if p["metrics"] is not None:
            for mk, mv in p["metrics"].items():
                msum[mk] = msum.get(mk, 0.0) + s * mv
    out["metrics_sum"] = msum
    bsum = {}
    for p, s in contributed:
        if p["amount"] is not None:
            bsum[p["store"]] = bsum.get(p["store"], 0.0) + s * p["amount"]
    out["amount_sum_by_store"] = bsum
    return out


def _mapcol(v):
    if v is None:
        return {}
    return {str(a): b for a, b in (v.items() if isinstance(v, dict) else v)}


def _close(a, b, rtol=1e-7, atol=1e-9):
    # engine nulls surface as NaN through to_pandas — None ≡ NaN here
    fa = float("nan") if a is None else float(a)
    fb = float("nan") if b is None else float(b)
    if math.isnan(fa) or math.isnan(fb):
        return math.isnan(fa) and math.isnan(fb)
    return abs(fa - fb) <= atol + rtol * abs(fb)


# ---------------------------------------------------------------- windowed


def _gen_windowed(seed):
    """Like _gen but every row carries an event `ts` (creation time), and
    mutations carry the mutated row's event ts (before rows: the OLD row's
    ts) — the sound CDC configuration for windowed parts."""
    rng = np.random.Generator(np.random.PCG64(seed + 9000))
    keys = [f"k{i}" for i in range(int(rng.integers(3, 6)))]
    state = {k: {} for k in keys}
    seq = 0
    for k in keys:
        for _ in range(int(rng.integers(1, 5))):
            r = _new_row(rng)
            r["ts"] = D0 + int(rng.integers(0, MS_DAY))  # created day 0
            state[k][f"i{seq}"] = r
            seq += 1
    snap_rows, mut_rows = [], []
    for d in range(3):
        ds = pd.Timestamp((D0 // MS_DAY + d) * MS_DAY,
                          unit="ms").strftime("%Y-%m-%d")
        for k in keys:
            for r in state[k].values():
                snap_rows.append((k, ds, r))
        day_start = D0 + (d + 1) * MS_DAY
        for k in keys:
            t = day_start
            for _ in range(int(rng.integers(0, 4))):
                t = t + int(rng.integers(1, MS_DAY // 4))
                kind = rng.choice(["update", "insert", "delete"])
                if kind == "update" and state[k]:
                    item = str(rng.choice(sorted(state[k])))
                    new = _new_row(rng)
                    new["ts"] = t  # updated row's event time
                    mut_rows.append((k, t, True, state[k][item]))
                    mut_rows.append((k, t, False, new))
                    state[k][item] = new
                elif kind == "delete" and state[k]:
                    item = str(rng.choice(sorted(state[k])))
                    mut_rows.append((k, t, True, state[k].pop(item)))
                else:
                    r = _new_row(rng)
                    r["ts"] = t
                    state[k][f"i{seq}"] = r
                    seq += 1
                    mut_rows.append((k, t, False, r))
    q_rows = []
    for d in (1, 2):
        day_start = D0 + d * MS_DAY
        for k in keys:
            for _ in range(3):
                q_rows.append((k, day_start + int(rng.integers(0, MS_DAY))))
            q_rows.append((k, day_start))
            q_rows.append((k, day_start + 12 * 3_600_000))  # hop boundary
    return snap_rows, mut_rows, q_rows


def _win_tables(snap_rows, mut_rows, q_rows):
    snapshots, mutations, queries = _to_tables(snap_rows, mut_rows, q_rows)
    snapshots = snapshots.append_column(
        "ts", pa.array([r[2]["ts"] for r in snap_rows], type=pa.int64()))
    mutations = mutations.append_column(
        "ts", pa.array([r[3]["ts"] for r in mut_rows], type=pa.int64()))
    return snapshots, mutations, queries


def _oracle_windowed(snap_rows, mut_rows, k, t, win_ms, hop_ms):
    """Signed-row window aggregate: membership = qtail <= row.ts < t for
    mutation rows (mutation_ts < t to apply at all), and row.ts >= qtail
    for prev-day snapshot rows (their ts is < EOD <= t by construction);
    qtail = round(t - W, hop). Unbounded when win_ms is None."""
    day = t // MS_DAY
    prev_ds = pd.Timestamp((day - 1) * MS_DAY,
                           unit="ms").strftime("%Y-%m-%d")
    day_start = day * MS_DAY
    qtail = None if win_ms is None else ((t - win_ms) // hop_ms) * hop_ms
    signed = []
    for (ek, ds, p) in snap_rows:
        if ek == k and ds == prev_ds and (
                qtail is None or p["ts"] >= qtail):
            signed.append((p, 1))
    for (ek, mts, before, p) in mut_rows:
        if ek == k and day_start <= mts < t and (
                qtail is None or (qtail <= p["ts"] < t)):
            signed.append((p, -1 if before else 1))
    vals, hist = [], {}
    touched = False
    for p, s in signed:
        if p["amount"] is not None:
            touched = True
            if s > 0:
                vals.append(p["amount"])
            else:
                # a delete's membership is judged on the OLD row's event
                # ts, so its counterpart is always in vals by now
                vals.remove(p["amount"])
        if p["level"] is not None:
            hk = str(p["level"])
            hist[hk] = hist.get(hk, 0) + s
    x = np.asarray(vals, dtype=np.float64)
    n = len(x)
    out = {"sum": float(x.sum()) if touched else None,
           "count": n if touched else None,
           "average": float(x.mean()) if n else float("nan")}
    if n:
        m = x.mean()
        out["variance"] = float(((x - m) ** 2).sum()) / n
    else:
        out["variance"] = float("nan")
    out["histogram"] = {hk: c for hk, c in hist.items() if c != 0}
    return out


@pytest.mark.parametrize("seed", [111, 222, 333, 444])
def test_windowed_temporal_entities_randomized(ray_session, seed):
    from chronon_ray.api import window as W

    snap_rows, mut_rows, q_rows = _gen_windowed(seed)
    snapshots, mutations, queries = _win_tables(snap_rows, mut_rows, q_rows)
    HOUR = 3_600_000
    wins = [("1d", W(1, "d"), MS_DAY, HOUR),
            ("12h", W(12, "h"), 12 * HOUR, HOUR),
            ("3d", W(3, "d"), 3 * MS_DAY, HOUR)]
    aggs = [agg("amount", "sum"), agg("amount", "count")]
    checks = [("amount_sum", "sum", None, None),
              ("amount_count", "count", None, None)]
    for wn, w, ms, hop in wins:
        aggs += [agg("amount", "sum", [w]), agg("amount", "average", [w]),
                 agg("amount", "variance", [w]),
                 agg("level", "histogram", [w])]
        checks += [(f"amount_sum_{wn}", "sum", ms, hop),
                   (f"amount_average_{wn}", "average", ms, hop),
                   (f"amount_variance_{wn}", "variance", ms, hop),
                   (f"level_histogram_{wn}", "histogram", ms, hop)]
    conf = GroupByConf(name=f"wrand{seed}", sources=(),
                       key_columns=("entity_id",),
                       aggregations=tuple(aggs))
    out = temporal_entities_join(rd.from_arrow(queries),
                                 rd.from_arrow(snapshots),
                                 rd.from_arrow(mutations), conf,
                                 num_partitions=4).to_pandas()
    assert len(out) == len(q_rows)
    for _, row in out.iterrows():
        k_, t_ = row["entity_id"], int(row["ts"])
        for (name, op, ms, hop) in checks:
            exp = _oracle_windowed(snap_rows, mut_rows, k_, t_, ms, hop)
            ctx = (seed, name, k_, t_)
            if op == "histogram":
                got = {hk: int(v)
                       for hk, v in _mapcol(row[name]).items()
                       if int(v) != 0}
                assert got == exp["histogram"], (ctx, got, exp["histogram"])
            elif op == "count":
                if exp["count"] is None:
                    assert pd.isna(row[name]), ctx
                else:
                    assert int(row[name]) == exp["count"], (ctx, row[name],
                                                            exp["count"])
            else:
                assert _close(row[name], exp[op],
                              rtol=1e-6, atol=1e-7), (ctx, row[name],
                                                      exp[op])


def _oracle_windowed_map(snap_rows, mut_rows, k, t, win_ms, hop_ms,
                         field, inner):
    """Per-map-key (or per-bucket) signed window aggregate. field='metrics'
    explodes the map column; field='store' buckets `amount` by store.
    inner ∈ {sum, variance}. Conventions: sum keeps a key once it
    contributed in-window (zero-net stays, value 0.0); variance drops
    zero-mass keys (unrepresentable moment IR → null → entry dropped)."""
    day = t // MS_DAY
    prev_ds = pd.Timestamp((day - 1) * MS_DAY,
                           unit="ms").strftime("%Y-%m-%d")
    day_start = day * MS_DAY
    qtail = ((t - win_ms) // hop_ms) * hop_ms
    signed = []
    for (ek, ds, p) in snap_rows:
        if ek == k and ds == prev_ds and p["ts"] >= qtail:
            signed.append((p, 1))
    for (ek, mts, before, p) in mut_rows:
        if ek == k and day_start <= mts < t and qtail <= p["ts"] < t:
            signed.append((p, -1 if before else 1))
    per_key: dict = {}
    for p, s in signed:
        if field == "metrics":
            if p["metrics"] is None:
                continue
            items = p["metrics"].items()
        else:
            if p["amount"] is None:
                continue
            items = [(p["store"], p["amount"])]
        for mk, mv in items:
            per_key.setdefault(mk, []).append((mv, s))
    out = {}
    for mk, contrib in per_key.items():
        if inner == "sum":
            out[mk] = float(sum(v * s for v, s in contrib))
        else:  # variance: net multiset (deletes match inserts)
            vals = []
            for v, s in contrib:
                if s > 0:
                    vals.append(v)
                else:
                    vals.remove(v)
            if vals:
                x = np.asarray(vals, dtype=np.float64)
                out[mk] = float(((x - x.mean()) ** 2).sum()) / len(x)
            # zero-mass key: dropped
    return out


@pytest.mark.parametrize("seed", [611, 622, 633])
def test_windowed_map_and_bucketed_randomized(ray_session, seed):
    """Windowed map-input and bucketed parts through the CDC replay —
    including VARIANCE inner ops, which travel as per-key power-sum
    markers through the tail merge."""
    from chronon_ray.api import window as W

    snap_rows, mut_rows, q_rows = _gen_windowed(seed)
    snapshots, mutations, queries = _win_tables(snap_rows, mut_rows, q_rows)
    HOUR = 3_600_000
    conf = GroupByConf(
        name=f"wmap{seed}", sources=(), key_columns=("entity_id",),
        aggregations=(agg("metrics", "sum", [W(1, "d")]),
                      agg("metrics", "variance", [W(1, "d")]),
                      agg("amount", "sum", [W(12, "h")],
                          buckets=("store",)),
                      agg("amount", "variance", [W(1, "d")],
                          buckets=("store",))))
    out = temporal_entities_join(rd.from_arrow(queries),
                                 rd.from_arrow(snapshots),
                                 rd.from_arrow(mutations), conf,
                                 num_partitions=4).to_pandas()
    assert len(out) == len(q_rows)
    checks = [("metrics_sum_1d", "metrics", "sum", MS_DAY),
              ("metrics_variance_1d", "metrics", "variance", MS_DAY),
              ("amount_sum_12h_by_store", "store", "sum", 12 * HOUR),
              ("amount_variance_1d_by_store", "store", "variance", MS_DAY)]
    for _, row in out.iterrows():
        k_, t_ = row["entity_id"], int(row["ts"])
        for (name, field, inner, ms) in checks:
            exp = _oracle_windowed_map(snap_rows, mut_rows, k_, t_,
                                       ms, HOUR, field, inner)
            got = {mk: v for mk, v in _mapcol(row[name]).items()
                   if v is not None}
            ctx = (seed, name, k_, t_)
            if inner == "sum":
                # zero-net keys: engine may keep (0.0) or drop depending
                # on path — compare only nonzero mass, then check zeros
                gnz = {mk: v for mk, v in got.items() if abs(v) > 1e-9}
                enz = {mk: v for mk, v in exp.items() if abs(v) > 1e-9}
                assert set(gnz) == set(enz), (ctx, got, exp)
                for mk in enz:
                    assert _close(gnz[mk], enz[mk],
                                  rtol=1e-6, atol=1e-7), (ctx, mk)
                for mk, v in got.items():
                    if mk not in exp:
                        assert abs(v) <= 1e-9, (ctx, mk, v)
            else:
                assert set(got) == set(exp), (ctx, got, exp)
                for mk in exp:
                    assert _close(got[mk], exp[mk],
                                  rtol=1e-6, atol=1e-7), (ctx, mk,
                                                          got[mk], exp[mk])


def test_windowed_delete_of_tail_resident_row(ray_session):
    """Regression (found by the randomized scenarios): the CDC replay used
    to apply deletions to the collapsed base BEFORE the query's tail hops
    merged, so deleting/updating a row whose mass lives in a tail hop
    produced a zero-or-negative-mass moment intermediate that the
    (n, mean, m2) IR clamped away — the stale tail row silently survived
    (variance 0.0 instead of null here)."""
    from chronon_ray.api import window as W

    HOUR = 3_600_000
    day1 = D0 + MS_DAY
    snap = pa.table({
        "entity_id": ["a"],
        "ds": ["2024-01-01"],
        "ts": pa.array([D0 + 15 * HOUR], type=pa.int64()),  # tail-resident
        "amount": pa.array([56.0]),
    })
    mut = pa.table({
        "entity_id": ["a", "a", "a"],
        "mutation_ts": pa.array([day1 + 3 * HOUR, day1 + 4 * HOUR,
                                 day1 + 9 * HOUR], type=pa.int64()),
        "is_before": [True, False, True],
        "ts": pa.array([D0 + 15 * HOUR, day1 + 4 * HOUR, day1 + 4 * HOUR],
                       type=pa.int64()),
        "amount": pa.array([56.0, 74.0, 74.0]),
    })
    q = pa.table({"entity_id": ["a", "a"],
                  "ts": pa.array([day1 + 12 * HOUR, day1 + 5 * HOUR],
                                 type=pa.int64())})
    conf = GroupByConf(name="tailres", sources=(),
                       key_columns=("entity_id",),
                       aggregations=(agg("amount", "variance",
                                         [W(1, "d")]),
                                     agg("amount", "sum", [W(1, "d")])))
    out = temporal_entities_join(rd.from_arrow(q), rd.from_arrow(snap),
                                 rd.from_arrow(mut), conf,
                                 num_partitions=2).to_pandas() \
        .sort_values("ts").reset_index(drop=True)
    # at day1+5h: the 56 was deleted (3h), 74 inserted (4h) → state {74}
    assert out.loc[0, "amount_sum_1d"] == 74.0
    assert out.loc[0, "amount_variance_1d"] == 0.0
    # at day1+12h: 74 deleted too (9h) → window state EMPTY → null
    assert pd.isna(out.loc[1, "amount_sum_1d"]) or \
        out.loc[1, "amount_sum_1d"] == 0.0
    assert pd.isna(out.loc[1, "amount_variance_1d"])


def test_snapshot_histogram_all_null_group(ray_session):
    """Regression (found by the randomized scenarios): a group whose
    histogram inputs are ALL null carries a NaN IR, which crashed the IR
    Arrow serialization (float NaN is not a recognized null for a map
    type) in both the snapshot and temporal-entities paths."""
    from chronon_ray.pipelines.groupby import aggregate_snapshot

    t = pa.table({"user_id": ["a", "a", "b", "b"],
                  "level": pa.array([1, 2, None, None], type=pa.int64())})
    conf = GroupByConf(name="h", sources=(), key_columns=("user_id",),
                       aggregations=(agg("level", "histogram"),))
    out = aggregate_snapshot(rd.from_arrow(t), conf,
                             num_partitions=2).to_pandas()
    out = out.sort_values("user_id").reset_index(drop=True)
    assert _mapcol(out.loc[0, "level_histogram"]) == {"1": 1, "2": 1}
    assert out.loc[1, "level_histogram"] is None or \
        (isinstance(out.loc[1, "level_histogram"], float)
         and math.isnan(out.loc[1, "level_histogram"]))


@pytest.mark.parametrize("seed", [101, 202, 303, 404, 505, 606, 707, 808])
def test_temporal_entities_randomized(ray_session, seed):
    snap_rows, mut_rows, q_rows = _gen(seed)
    snapshots, mutations, queries = _to_tables(snap_rows, mut_rows, q_rows)
    conf = GroupByConf(
        name=f"rand{seed}", sources=(), key_columns=("entity_id",),
        aggregations=(agg("amount", "sum"), agg("amount", "count"),
                      agg("amount", "average"), agg("amount", "variance"),
                      agg("amount", "skew"), agg("amount", "kurtosis"),
                      agg("level", "histogram"), agg("metrics", "sum"),
                      agg("amount", "sum", buckets=("store",))))
    out = temporal_entities_join(rd.from_arrow(queries),
                                 rd.from_arrow(snapshots),
                                 rd.from_arrow(mutations), conf,
                                 num_partitions=4).to_pandas()
    assert len(out) == len(q_rows)
    for _, row in out.iterrows():
        exp = _oracle_one(snap_rows, mut_rows,
                          row["entity_id"], int(row["ts"]))
        ctx = (seed, row["entity_id"], int(row["ts"]))
        for c in ("amount_sum", "amount_average", "amount_variance",
                  "amount_skew", "amount_kurtosis"):
            assert _close(row[c], exp[c]), (ctx, c, row[c], exp[c])
        got_c = row["amount_count"]
        if exp["amount_count"] is None:
            assert pd.isna(got_c), (ctx, got_c)
        else:
            assert int(got_c) == exp["amount_count"], (ctx, got_c,
                                                       exp["amount_count"])
        got_h = {k: int(v) for k, v in _mapcol(row["level_histogram"]).items()
                 if int(v) != 0}
        assert got_h == exp["level_histogram"], (ctx, got_h,
                                                 exp["level_histogram"])
        for c in ("metrics_sum", "amount_sum_by_store"):
            got_m = _mapcol(row[c])
            exp_m = exp[c]
            assert set(got_m) == set(exp_m), (ctx, c, got_m, exp_m)
            for mk in exp_m:
                assert _close(got_m[mk], exp_m[mk]), (ctx, c, mk,
                                                      got_m[mk], exp_m[mk])
