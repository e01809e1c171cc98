"""Randomized differential for the flagship temporal (as-of) join.

Seeded random event/query sets are checked against an INDEPENDENT brute-
force per-query oracle that selects window members directly from the raw
events using only the engine's tiny pure helpers (round_ts /
tail_hop_millis — unit-tested separately) and recomputes every op from
first principles. Window membership per the reference semantics
(Resolution.scala / NaiveAggregator.scala):

    round(q - W, hop) <= event.ts < q     (strict head, hopped tail)
    unbounded:              event.ts < q

This is independent of the hop-tiling / two-stack / exact-head cumulate
machinery under test, and of the exchange + salting layout (queries at
hop boundaries, exactly at event ts, and with null inputs included).
"""

import math
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from chronon_ray.api import GroupByConf, UNBOUNDED, agg, window
from chronon_ray.pipelines.temporal import temporal_join
from chronon_ray.windowing.resolution import round_ts, tail_hop_millis

DAY = 86_400_000
BASE = pd.Timestamp("2024-03-01").value // 10**6


def _events(rng, n, keys, days):
    ts = BASE + rng.integers(0, days * DAY, size=n).astype(np.int64)
    key = rng.integers(0, keys, size=n).astype(np.int64)
    df = pd.DataFrame({"user_id": key, "ts": ts})
    df = df.drop_duplicates(["user_id", "ts"]).reset_index(drop=True)
    n = len(df)
    val = np.round(rng.normal(10, 3, size=n), 3)
    val[rng.random(n) < 0.08] = np.nan
    df["value"] = val
    df["item"] = rng.integers(0, 25, size=n).astype(np.int64)
    df["store"] = np.array(["s1", "s2", "s3"])[rng.integers(0, 3, size=n)]
    df["tokens"] = [rng.integers(0, 20,
                                 size=rng.integers(0, 5)).tolist()
                    for _ in range(n)]
    return df.sort_values(["user_id", "ts"]).reset_index(drop=True)


def _to_ds(df):
    t = pa.table({
        "user_id": pa.array(df["user_id"].to_numpy()),
        "ts": pa.array(df["ts"].to_numpy()),
        "value": pa.array(df["value"].to_numpy(), from_pandas=True),
        "item": pa.array(df["item"].to_numpy()),
        "store": pa.array(df["store"].tolist()),
        "tokens": pa.array(df["tokens"].tolist(),
                           type=pa.list_(pa.int64())),
    })
    return rd.from_arrow(t)


def _members(ev_k, qts, win):
    """Raw-event window membership for one (key, query)."""
    ts = ev_k["ts"].to_numpy()
    if win.unbounded:
        m = ts < qts
    else:
        hop = tail_hop_millis(win)
        m = (ts >= round_ts(qts - win.millis, hop)) & (ts < qts)
    return ev_k[m]


def _moments(x):
    n = len(x)
    if n == 0:
        return {"variance": None, "skew": None, "kurtosis": None}
    m = x.mean()
    m2 = float(((x - m) ** 2).sum())
    m3 = float(((x - m) ** 3).sum())
    m4 = float(((x - m) ** 4).sum())
    return {
        "variance": m2 / n,
        "skew": (None if n < 3 or m2 == 0
                 else math.sqrt(n) * m3 / m2 ** 1.5),
        "kurtosis": (None if n < 4 or m2 == 0
                     else n * m4 / (m2 * m2) - 3.0),
    }


def _oracle(sub, op, col, k=3):
    """Recompute one op over the member rows (nulls skipped, reference
    ColumnAggregator null guard)."""
    if col == "tokens":
        vals = [t for lst in sub["tokens"] for t in lst]
    else:
        s = sub[col]
        keep = s.notna()
        vals = s[keep].tolist()
        tss = sub["ts"][keep].tolist()
    if op == "sum":
        return float(np.sum(vals)) if vals else None
    if op == "count":
        return len(vals) if vals else None
    if op == "average":
        return float(np.mean(vals)) if vals else None
    if op in ("variance", "skew", "kurtosis"):
        return _moments(np.asarray(vals, dtype=np.float64))[op]
    if op == "min":
        return min(vals) if vals else None
    if op == "max":
        return max(vals) if vals else None
    if op == "first":
        return vals[int(np.argmin(tss))] if vals else None
    if op == "last":
        return vals[int(np.argmax(tss))] if vals else None
    if op == "first_k":  # ascending ts
        order = np.argsort(tss, kind="stable")[:k]
        return [vals[i] for i in order] if vals else None
    if op == "last_k":  # descending ts (most recent first)
        order = np.argsort(tss, kind="stable")[::-1][:k]
        return [vals[i] for i in order] if vals else None
    if op == "top_k":  # descending value
        return sorted(vals, reverse=True)[:k] if vals else None
    if op == "bottom_k":
        return sorted(vals)[:k] if vals else None
    if op == "unique_count":
        return len(set(vals)) if vals else None
    if op == "histogram":
        return dict(Counter(str(v) for v in vals)) if vals else None
    raise AssertionError(op)


_OPS = ["sum", "count", "average", "variance", "skew", "kurtosis", "min",
        "max", "first", "last", "first_k", "last_k", "top_k", "bottom_k"]


def _norm(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, dict):
        return {str(k): _norm(x) for k, x in v.items()}
    if isinstance(v, (list, np.ndarray)):
        lst = list(v)
        if lst and isinstance(lst[0], tuple) and len(lst[0]) == 2:
            return {str(k): _norm(x) for k, x in lst}
        return [_norm(x) for x in lst]
    if isinstance(v, (np.floating, float)):
        return round(float(v), 8)
    if isinstance(v, np.integer):
        return int(v)
    return v


@pytest.mark.parametrize("seed", [8, 18, 28])
def test_temporal_join_exact_windows_randomized(ray_session, seed):
    """exact_windows=True drops the sawtooth hop rounding: membership is
    the per-event exact [q.ts - W, q.ts). Same brute-force oracle, exact
    tail."""
    rng = np.random.default_rng(seed)
    ev = _events(rng, n=int(rng.integers(1000, 2000)),
                 keys=int(rng.integers(5, 15)), days=20)
    windows = {"7d": window(7, "d"), "1d": window(1, "d"),
               "12h": window(12, "h")}
    picks = [str(x) for x in rng.choice(_OPS, size=5, replace=False)]
    parts, aggs = [], []
    for op in picks:
        wn = str(rng.choice(list(windows)))
        win = windows[wn]
        kw = {"k": 3} if op.endswith("_k") else {}
        aggs.append(agg("value", op, [win], **kw))
        opname = f"{op[:-2]}3" if op.endswith("_k") else op
        parts.append((f"value_{opname}_{wn}", op, "value", win))
    wn = str(rng.choice(list(windows)))
    aggs.append(agg("item", "histogram", [windows[wn]]))
    parts.append((f"item_histogram_{wn}", "histogram", "item",
                  windows[wn]))
    conf = GroupByConf(name=f"tjx{seed}", sources=(),
                       key_columns=("user_id",), aggregations=tuple(aggs))
    nq = 150
    q = pd.DataFrame({
        "user_id": rng.choice(ev["user_id"].unique(),
                              size=nq).astype(np.int64),
        "ts": (BASE + rng.integers(DAY, 20 * DAY,
                                   size=nq)).astype(np.int64)})
    out = temporal_join(rd.from_pandas(q), _to_ds(ev), conf,
                        num_partitions=4, exact_windows=True).to_pandas()
    assert len(out) == nq
    by_key = dict(tuple(ev.groupby("user_id", sort=False)))
    empty = ev.iloc[0:0]
    for _, row in out.iterrows():
        k_, t_ = row["user_id"], int(row["ts"])
        ev_k = by_key.get(k_, empty)
        for (name, op, col, win) in parts:
            ts = ev_k["ts"].to_numpy()
            sub = ev_k[(ts >= t_ - win.millis) & (ts < t_)]  # exact tail
            exp = _norm(_oracle(sub, op, col))
            got = _norm(row[name])
            if isinstance(exp, float) and isinstance(got, float):
                loose = op in ("variance", "skew", "kurtosis")
                assert math.isclose(got, exp,
                                    rel_tol=1e-4 if loose else 1e-6,
                                    abs_tol=1e-6 if loose else 1e-8), \
                    (seed, name, k_, t_, got, exp)
            else:
                assert got == exp, (seed, name, k_, t_, got, exp)


@pytest.mark.parametrize("seed", [7, 17, 27, 37, 47, 57])
def test_temporal_join_randomized_vs_bruteforce(ray_session, seed):
    rng = np.random.default_rng(seed)
    ev = _events(rng, n=int(rng.integers(1200, 2500)),
                 keys=int(rng.integers(6, 20)), days=30)
    windows = {"uf": UNBOUNDED, "7d": window(7, "d"), "1d": window(1, "d"),
               "12h": window(12, "h"), "30d": window(30, "d")}
    picks = [str(x) for x in
             rng.choice(_OPS, size=6, replace=False)]
    parts = []  # (out_name, op, col, window)
    aggs = []
    for op in picks:
        wn = str(rng.choice(list(windows)))
        win = windows[wn]
        kw = {"k": 3} if op.endswith("_k") else {}
        aggs.append(agg("value", op, [win], **kw))
        suffix = "" if win.unbounded else f"_{wn}"
        # k-ops name as <root><k>: last_k/k=3 → last3 (reference naming)
        opname = f"{op[:-2]}3" if op.endswith("_k") else op
        parts.append((f"value_{opname}{suffix}", op, "value", win))
    # always include the non-scalar families
    wn = str(rng.choice(["7d", "1d", "12h"]))
    aggs.append(agg("item", "unique_count", [windows[wn]]))
    parts.append((f"item_unique_count_{wn}", "unique_count", "item",
                  windows[wn]))
    aggs.append(agg("item", "histogram", [windows[wn]]))
    parts.append((f"item_histogram_{wn}", "histogram", "item",
                  windows[wn]))
    aggs.append(agg("tokens", "unique_count", [windows[wn]]))
    parts.append((f"tokens_unique_count_{wn}", "unique_count", "tokens",
                  windows[wn]))
    conf = GroupByConf(name=f"tj{seed}", sources=(),
                       key_columns=("user_id",), aggregations=tuple(aggs))
    nq = 200
    keys = ev["user_id"].unique()
    qk = rng.choice(keys, size=nq)
    qts = BASE + rng.integers(DAY, 30 * DAY, size=nq).astype(np.int64)
    # adversarial cut points: exactly at an event ts (strict <), at a hop
    # boundary, and at a day boundary
    qts[0] = int(ev.loc[ev["user_id"] == qk[0], "ts"].iloc[-1])
    qts[1] = round_ts(qts[1], 3_600_000)
    qts[2] = round_ts(qts[2], DAY)
    q = pd.DataFrame({"user_id": qk.astype(np.int64),
                      "ts": qts.astype(np.int64)})
    out = temporal_join(rd.from_pandas(q), _to_ds(ev), conf,
                        num_partitions=4).to_pandas()
    assert len(out) == nq
    by_key = dict(tuple(ev.groupby("user_id", sort=False)))
    empty = ev.iloc[0:0]
    for _, row in out.iterrows():
        k_, t_ = row["user_id"], int(row["ts"])
        for (name, op, col, win) in parts:
            sub = _members(by_key.get(k_, empty), t_, win)
            exp = _oracle(sub, op, col)
            got = _norm(row[name])
            expn = _norm(exp)
            if isinstance(expn, float) and isinstance(got, float):
                # central-moment hop-IR merges (skew/kurt especially) carry
                # more float cancellation than single-pass oracle math
                loose = op in ("variance", "skew", "kurtosis")
                assert math.isclose(got, expn,
                                    rel_tol=1e-4 if loose else 1e-6,
                                    abs_tol=1e-6 if loose else 1e-8), \
                    (seed, name, k_, t_, got, expn)
            else:
                assert got == expn, (seed, name, k_, t_, got, expn)
