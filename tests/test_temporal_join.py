"""Temporal as-of join vs (a) a brute-force naive window oracle (port of the
reference's NaiveAggregator semantics — aggregator/test/NaiveAggregator.scala:
24-48: hop_round(q.ts − W) ≤ e.ts < q.ts, strict head) and (b) DuckDB SQL in
the JoinTest style (spark/test/JoinTest.scala:566-582)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from chronon_ray.api import GroupByConf, Operation, UNBOUNDED, agg, window
from chronon_ray.aggregators.ops import OPS
from chronon_ray.pipelines.temporal import temporal_join
from chronon_ray.windowing.resolution import tail_hop_millis, round_ts
from chronon_ray.testing.tokengen import gen_events, gen_queries


@pytest.fixture(scope="module")
def token_data():
    ev = gen_events(4000, n_keys=40, seed=42)
    q = gen_queries(400, ev, n_keys=40, seed=43)
    return ev, q


def naive_features(ev: pa.Table, q: pa.Table, parts, exact=False):
    """Brute-force rescan per (query, part) using the scalar op path."""
    epd = ev.to_pandas()
    qpd = q.to_pandas()
    out = {p.output_name: [] for p in parts}
    for _, qr in qpd.iterrows():
        sel = epd[epd["doc_id"] == qr["doc_id"]]
        for p in parts:
            w = p.window
            if w.unbounded:
                lo = None
            elif exact:
                lo = qr["ts"] - w.millis
            else:
                lo = round_ts(qr["ts"] - w.millis, tail_hop_millis(w))
            m = sel[sel["ts"] < qr["ts"]]
            if lo is not None:
                m = m[m["ts"] >= lo]
            m = m.sort_values("ts", kind="stable")
            from chronon_ray.pipelines.temporal import BucketedPyOp
            op = OPS[p.operation] if p.bucket is None else BucketedPyOp(OPS[p.operation])
            ir = None
            for _, er in m.iterrows():
                v = er[p.input_column]
                if v is None:
                    continue
                if p.bucket is not None:
                    if er[p.bucket] is None:
                        continue
                    v = (er[p.bucket], v)
                ir = op.py_update(ir, v, int(er["ts"]), p)
            out[p.output_name].append(None if ir is None else op.py_finalize(ir, p))
    return out


def test_temporal_vs_naive(ray_session, token_data):
    ev, q = token_data
    conf = GroupByConf(
        name="tok",
        sources=(),
        key_columns=("doc_id",),
        aggregations=(
            agg("n_tok", "sum", [window(1, "h"), window(1, "d"), window(7, "d"), UNBOUNDED]),
            agg("n_tok", "count", [window(1, "d")]),
            agg("n_tok", "average", [window(7, "d")]),
            agg("n_tok", "variance", [window(7, "d")]),
            agg("n_tok", "min", [window(7, "d")]),
            agg("n_tok", "max", [window(7, "d")]),
            agg("n_tok", "last", [window(7, "d")]),
            agg("n_tok", "first", [window(7, "d")]),
            agg("n_tok", "last_k", [window(7, "d")], k=4),
            agg("n_tok", "top_k", [window(7, "d")], k=4),
            agg("source", "unique_count", [window(7, "d"), UNBOUNDED]),
            agg("source", "histogram", [window(7, "d")]),
            agg("n_tok", "sum", [window(7, "d")], buckets=["source"]),
        ),
    )
    parts = conf.parts()
    left = ray.data.from_arrow(q)
    right = ray.data.from_arrow(ev)
    out = temporal_join(left, right, conf, num_partitions=4).to_pandas()
    # align on (doc_id, ts): naive computed in query order; dedupe by sorting both
    out = out.sort_values(["doc_id", "ts"], kind="stable").reset_index(drop=True)
    naive = naive_features(ev, q, parts)
    qpd = q.to_pandas()
    ndf = pd.DataFrame({"doc_id": qpd["doc_id"], "ts": qpd["ts"], **naive})
    ndf = ndf.sort_values(["doc_id", "ts"], kind="stable").reset_index(drop=True)
    assert len(out) == len(ndf)
    for p in parts:
        col = p.output_name
        got, want = out[col], ndf[col]
        if p.operation in (Operation.SUM, Operation.COUNT, Operation.AVERAGE,
                           Operation.VARIANCE, Operation.MIN, Operation.MAX,
                           Operation.LAST, Operation.FIRST):
            if p.bucket is None:
                g = got.astype(float).to_numpy()
                wv = want.astype(float).to_numpy()
                both_nan = np.isnan(g) & np.isnan(wv)
                np.testing.assert_allclose(g[~both_nan], wv[~both_nan], rtol=1e-9,
                                           err_msg=col)
                continue
        # list/map/object comparison
        def _none(x):
            return x is None or (isinstance(x, float) and np.isnan(x))

        for i, (a, b) in enumerate(zip(got, want)):
            if _none(a) and _none(b):
                continue
            if p.operation in (Operation.LAST_K, Operation.TOP_K):
                assert list(a) == list(b), f"{col} row {i}: {a} vs {b}"
            elif p.operation == Operation.HISTOGRAM or p.bucket is not None:
                assert [tuple(x) for x in a] == [tuple(x) for x in b], \
                    f"{col} row {i}: {a} vs {b}"
            else:
                assert a == b, f"{col} row {i}: {a} vs {b}"


def test_temporal_exact_windows_vs_naive(ray_session, token_data):
    """exact_windows=True: per-event window [q.ts - w, q.ts), no hop-rounded
    tail — every family (prefix, slice, sawtooth, bucketed) against the
    naive oracle with exact tails."""
    ev, q = token_data
    conf = GroupByConf(
        name="tok_exact",
        sources=(),
        key_columns=("doc_id",),
        aggregations=(
            agg("n_tok", "sum", [window(1, "h"), window(7, "d"), UNBOUNDED]),
            agg("n_tok", "average", [window(1, "d")]),
            agg("n_tok", "min", [window(1, "d")]),
            agg("n_tok", "last_k", [window(1, "d")], k=3),
            agg("source", "unique_count", [window(1, "d")]),
            agg("source", "histogram", [window(1, "d")]),
            agg("n_tok", "sum", [window(1, "d")], buckets=["source"]),
        ),
    )
    parts = conf.parts()
    left = ray.data.from_arrow(q)
    right = ray.data.from_arrow(ev)
    out = temporal_join(left, right, conf, num_partitions=4,
                        exact_windows=True).to_pandas()
    out = out.sort_values(["doc_id", "ts"], kind="stable").reset_index(drop=True)
    naive = naive_features(ev, q, parts, exact=True)
    qpd = q.to_pandas()
    ndf = pd.DataFrame({"doc_id": qpd["doc_id"], "ts": qpd["ts"], **naive})
    ndf = ndf.sort_values(["doc_id", "ts"], kind="stable").reset_index(drop=True)
    assert len(out) == len(ndf)

    def _none(x):
        return x is None or (isinstance(x, float) and np.isnan(x))

    for p in parts:
        col = p.output_name
        got, want = out[col], ndf[col]
        if p.operation in (Operation.SUM, Operation.AVERAGE, Operation.MIN) \
                and p.bucket is None:
            g = got.astype(float).to_numpy()
            wv = want.astype(float).to_numpy()
            both_nan = np.isnan(g) & np.isnan(wv)
            np.testing.assert_allclose(g[~both_nan], wv[~both_nan], rtol=1e-9,
                                       err_msg=col)
            continue
        for i, (a, b) in enumerate(zip(got, want)):
            if _none(a) and _none(b):
                continue
            if p.operation == Operation.LAST_K:
                assert list(a) == list(b), f"{col} row {i}: {a} vs {b}"
            elif p.operation == Operation.HISTOGRAM or p.bucket is not None:
                assert [tuple(x) for x in a] == [tuple(x) for x in b], \
                    f"{col} row {i}: {a} vs {b}"
            else:
                assert a == b, f"{col} row {i}: {a} vs {b}"


def test_temporal_token_arrays_exact(ray_session, token_data):
    """LAST(tokens)/LAST_K(tokens) must return bit-exact token arrays."""
    ev, q = token_data
    conf = GroupByConf(
        name="tok2", sources=(), key_columns=("doc_id",),
        aggregations=(agg("tokens", "last", [window(7, "d")]),
                      agg("tokens", "last_k", [window(7, "d")], k=2)),
    )
    out = temporal_join(ray.data.from_arrow(q), ray.data.from_arrow(ev), conf,
                        num_partitions=4).to_pandas()
    out = out.sort_values(["doc_id", "ts"], kind="stable").reset_index(drop=True)
    epd = ev.to_pandas()
    qpd = q.to_pandas().sort_values(["doc_id", "ts"], kind="stable").reset_index(drop=True)
    hop = tail_hop_millis(window(7, "d"))
    rng = np.random.Generator(np.random.PCG64(5))
    for i in rng.choice(len(qpd), size=60, replace=False):
        qr = qpd.iloc[i]
        lo = round_ts(qr["ts"] - window(7, "d").millis, hop)
        m = epd[(epd["doc_id"] == qr["doc_id"]) & (epd["ts"] < qr["ts"]) & (epd["ts"] >= lo)]
        m = m.sort_values("ts", kind="stable")
        if len(m) == 0:
            assert out["tokens_last_7d"].iloc[i] is None
            continue
        np.testing.assert_array_equal(
            np.asarray(out["tokens_last_7d"].iloc[i], dtype=np.int32),
            np.asarray(m["tokens"].iloc[-1], dtype=np.int32))
        exp_k = [np.asarray(t, dtype=np.int32) for t in m["tokens"].iloc[::-1].head(2)]
        got_k = [np.asarray(t, dtype=np.int32) for t in out["tokens_last2_7d"].iloc[i]]
        assert len(got_k) == len(exp_k)
        for a, b in zip(got_k, exp_k):
            np.testing.assert_array_equal(a, b)


def test_temporal_vs_duckdb(ray_session, sf_dir, duck):
    """JoinTest-style SQL oracle on the driver events table: left = purchase
    rows, features = windowed SUM/COUNT of value."""
    import chronon_ray.sources as src
    from chronon_ray.api import TQuery

    ev = src.scan_table(f"{sf_dir}/events.parquet", TQuery(time_column="ts"))
    left = src.scan_table(
        f"{sf_dir}/events.parquet",
        TQuery.of(selects={"user_id": "user_id", "ts": "ts"},
                  wheres=[lambda t: __import__("pyarrow").compute.equal(t["event_type"], "purchase")],
                  time_column="ts"),
    )
    conf = GroupByConf(
        name="ev_asof", sources=(), key_columns=("user_id",),
        aggregations=(agg("value", "sum", [window(1, "d"), window(7, "d"), UNBOUNDED]),
                      agg("value", "count", [window(7, "d")])),
    )
    out = temporal_join(left, ev, conf, num_partitions=8).to_pandas()
    out = out.sort_values(["user_id", "ts"], kind="stable").reset_index(drop=True)
    hop1d = tail_hop_millis(window(1, "d"))
    hop7d = tail_hop_millis(window(7, "d"))
    exp = duck.sql(f"""
        with q as (select user_id, epoch_ms(ts) as ts from events
                   where event_type = 'purchase'),
             e as (select user_id, epoch_ms(ts) as ts, value from events)
        select q.user_id, q.ts,
            sum(case when e.ts < q.ts
                 and e.ts >= ((q.ts - {86400000}) // {hop1d}) * {hop1d}
                 then e.value end) as value_sum_1d,
            sum(case when e.ts < q.ts
                 and e.ts >= ((q.ts - {7*86400000}) // {hop7d}) * {hop7d}
                 then e.value end) as value_sum_7d,
            sum(case when e.ts < q.ts then e.value end) as value_sum,
            count(case when e.ts < q.ts
                 and e.ts >= ((q.ts - {7*86400000}) // {hop7d}) * {hop7d}
                 then e.value end) as value_count_7d
        from q left join e on q.user_id = e.user_id
        group by q.user_id, q.ts
        order by q.user_id, q.ts
    """).df()
    assert len(out) == len(exp)
    np.testing.assert_array_equal(out["user_id"], exp["user_id"])
    np.testing.assert_array_equal(out["ts"], exp["ts"])
    for col in ["value_sum_1d", "value_sum_7d", "value_sum"]:
        g = out[col].astype(float).to_numpy()
        w = exp[col].astype(float).to_numpy()
        nan = np.isnan(g) & np.isnan(w)
        np.testing.assert_allclose(g[~nan], w[~nan], rtol=1e-9, err_msg=col)
    got_cnt = out["value_count_7d"].fillna(0).astype(int).to_numpy()
    np.testing.assert_array_equal(got_cnt, exp["value_count_7d"].astype(int))


def test_temporal_bucketed_unique_count_strings(ray_session, token_data):
    """Bucketed UNIQUE_COUNT over a STRING column: hop-prebuilt IRs and
    head/tail updates must share one value representation — mixing
    dictionary codes with raw strings double-counts values present in
    both regions."""
    ev, q = token_data
    conf = GroupByConf(
        name="bucuc", sources=(), key_columns=("doc_id",),
        aggregations=(
            agg("ds", "unique_count", [window(7, "d")], buckets=["source"]),
        ),
    )
    parts = conf.parts()
    out = temporal_join(ray.data.from_arrow(q), ray.data.from_arrow(ev),
                        conf, num_partitions=4).to_pandas()
    out = out.sort_values(["doc_id", "ts"], kind="stable") \
        .reset_index(drop=True)
    naive = naive_features(ev, q, parts)
    qpd = q.to_pandas()
    ndf = pd.DataFrame({"doc_id": qpd["doc_id"], "ts": qpd["ts"], **naive})
    ndf = ndf.sort_values(["doc_id", "ts"], kind="stable") \
        .reset_index(drop=True)
    col = parts[0].output_name

    def _none(x):
        return x is None or (isinstance(x, float) and np.isnan(x))

    for i, (a, b) in enumerate(zip(out[col], ndf[col])):
        if _none(a) and _none(b):
            continue
        assert [tuple(x) for x in a] == [tuple(x) for x in b], \
            f"row {i}: {a} vs {b}"
