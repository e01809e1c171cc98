"""Randomized differential for the comparison family: random schemas
(int/float/string/bool/list columns), random mappings, random block
layouts, null keys, duplicate keys, one-sided rows — engine metrics vs a
row-at-a-time first-principles oracle, and the CLI compare verb over the
same frames."""

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

HOUR = 3600_000

COL_KINDS = ("f64", "i64", "str", "bool", "list")


def _make_col(rng, kind, n):
    if kind == "f64":
        v = np.round(rng.normal(0, 10, n), 3)
        v[rng.random(n) < 0.15] = np.nan
        return v.tolist(), pa.float64()
    if kind == "i64":
        v = [None if rng.random() < 0.15 else int(rng.integers(-5, 5))
             for _ in range(n)]
        return v, pa.int64()
    if kind == "str":
        v = [None if rng.random() < 0.2
             else "s" + str(rng.integers(0, 4)) for _ in range(n)]
        return v, pa.string()
    if kind == "bool":
        v = [None if rng.random() < 0.1 else bool(rng.integers(0, 2))
             for _ in range(n)]
        return v, pa.bool_()
    v = [None if rng.random() < 0.15
         else rng.integers(0, 3, rng.integers(0, 4)).tolist()
         for _ in range(n)]
    return v, pa.list_(pa.int64())


def _gen(rng, n, kinds):
    ids = [None if rng.random() < 0.05 else int(i)
           for i in rng.integers(0, n // 2, n)]  # dup + null keys
    ts = (rng.integers(0, 3, n) * HOUR).astype(np.int64)
    data = {"id": (ids, pa.int64()), "ts": (ts.tolist(), pa.int64())}
    for i, kind in enumerate(kinds):
        data[f"c{i}"] = _make_col(rng, kind, n)
    return data


def _mutate(rng, data, n):
    out = {}
    for name, (vals, typ) in data.items():
        if name in ("id", "ts"):
            out[name] = (list(vals), typ)
            continue
        vals = list(vals)
        for i in range(n):
            r = rng.random()
            if r < 0.1:
                vals[i] = None
            elif r < 0.3 and vals[i] is not None:
                if typ == pa.float64():
                    vals[i] = float(vals[i]) + 1.0
                elif typ == pa.int64():
                    vals[i] = int(vals[i]) + 1
                elif typ == pa.string():
                    vals[i] = vals[i] + "x"
                elif typ == pa.bool_():
                    vals[i] = not vals[i]
                else:
                    vals[i] = list(vals[i]) + [9]
        out[name] = (vals, typ)
    return out


def _drop_rows(rng, data, frac):
    n = len(data["id"][0])
    keep = rng.random(n) > frac
    return {k: ([v for v, kp in zip(vals, keep) if kp], t)
            for k, (vals, t) in data.items()}


def _to_ds(rng, data, max_blocks=4):
    n = len(data["id"][0])
    order = rng.permutation(n)
    nb = int(rng.integers(1, max_blocks + 1))
    cuts = np.array_split(order, nb)
    ds = None
    for idx in cuts:
        t = pa.table({k: pa.array([vals[i] for i in idx], type=typ,
                                  from_pandas=True)
                      for k, (vals, typ) in data.items()})
        d = rd.from_arrow(t)
        ds = d if ds is None else ds.union(d)
    return ds


def _isnull(v):
    return v is None or (isinstance(v, float) and np.isnan(v))


def _oracle(left, right, kinds, bucket_ms=HOUR):
    """Row-at-a-time full outer join + metric sums (null keys never
    match; null-ts rows excluded from bucketed metrics)."""
    def rows(d):
        n = len(d["id"][0])
        return [{k: d[k][0][i] for k in d} for i in range(n)]

    lmap: dict = {}
    for r in rows(left):
        if _isnull(r["id"]) or _isnull(r["ts"]):
            continue
        lmap.setdefault((r["id"], r["ts"]), []).append(r)
    rmap: dict = {}
    for r in rows(right):
        if _isnull(r["id"]) or _isnull(r["ts"]):
            continue
        rmap.setdefault((r["id"], r["ts"]), []).append(r)
    pairs = []
    for k, ls in lmap.items():
        rs = rmap.get(k, [None])
        pairs += [(k[1], a, b) for a in ls for b in rs]
    for k, rs in rmap.items():
        if k not in lmap:
            pairs += [(k[1], None, b) for b in rs]
    # null-KEY rows with non-null ts still count (unmatched)
    for r in rows(left):
        if _isnull(r["id"]) and not _isnull(r["ts"]):
            pairs.append((r["ts"], r, None))
    for r in rows(right):
        if _isnull(r["id"]) and not _isnull(r["ts"]):
            pairs.append((r["ts"], None, r))

    acc: dict = {}
    for ts, a, b in pairs:
        bkt = (ts // bucket_ms) * bucket_ms
        m = acc.setdefault(bkt, {})
        for i, kind in enumerate(kinds):
            f = f"c{i}"
            av = a.get(f) if a else None
            bv = b.get(f) if b else None
            an, bn = _isnull(av), _isnull(bv)
            m[f"{f}_total"] = m.get(f"{f}_total", 0) + 1

            def bump(sfx):
                m[f"{f}_{sfx}"] = m.get(f"{f}_{sfx}", 0) + 1

            if an and bn:
                bump("both_null")
            elif an:
                bump("left_null")
            elif bn:
                bump("right_null")
            elif kind == "list":
                if list(av) != list(bv):
                    bump("mismatch")
                if len(av) != len(bv):
                    bump("mismatch_length")
            elif av != bv:
                bump("mismatch")
            if kind == "f64":
                denom = (0 if an else abs(av)) + (0 if bn else abs(bv))
                sm = (2 * abs(av - bv) / denom
                      if not an and not bn and denom != 0 else 0.0)
                m[f"{f}_smape_sum"] = m.get(f"{f}_smape_sum", 0.0) + sm
    return acc


@pytest.mark.parametrize("seed", [7, 19, 37])
def test_compare_randomized_vs_oracle(ray_session, seed):
    from chronon_ray.pipelines.stats import compare_tables

    rng = np.random.default_rng(seed)
    kinds = [COL_KINDS[i] for i in rng.integers(0, len(COL_KINDS), 3)]
    n = 250
    left = _gen(rng, n, kinds)
    right = _drop_rows(rng, _mutate(rng, left, n), 0.07)
    left = _drop_rows(rng, left, 0.07)
    lds, rds = _to_ds(rng, left), _to_ds(rng, right)
    _, met_ds = compare_tables(lds, rds, keys=["id", "ts"],
                               num_partitions=5)
    met = met_ds.to_pandas().set_index("bucket_ts")
    oracle = _oracle(left, right, kinds)
    assert set(met.index) == set(oracle)
    for bkt, m in oracle.items():
        row = met.loc[bkt]
        for i, kind in enumerate(kinds):
            f = f"c{i}"
            for sfx in ("total", "both_null", "left_null", "right_null",
                        "mismatch"):
                assert row[f"{f}_{sfx}"] == m.get(f"{f}_{sfx}", 0), \
                    (seed, bkt, f, kind, sfx)
            if kind == "list":
                assert row[f"{f}_mismatch_length"] == \
                    m.get(f"{f}_mismatch_length", 0)
            if kind == "f64":
                assert row[f"{f}_smape"] == pytest.approx(
                    m.get(f"{f}_smape_sum", 0.0) / m[f"{f}_total"])


def test_compare_cli_verb(ray_session, tmp_path):
    """The compare verb end-to-end: migration check with a mapping over
    two parquet tables."""
    from chronon_ray.cli import main

    n = 60
    ts = np.repeat(np.arange(3), 20).astype(np.int64) * HOUR
    old = pd.DataFrame({"id": np.arange(n, dtype=np.int64), "ts": ts,
                        "metric": np.arange(n, dtype=np.float64),
                        "legacy": np.ones(n, dtype=np.int64)})
    new = old.drop(columns=["legacy"]).rename(columns={"metric": "m2"})
    new.loc[new["id"] % 6 == 0, "m2"] += 1.0
    lp, rp = str(tmp_path / "old.parquet"), str(tmp_path / "new.parquet")
    old.to_parquet(lp, index=False)
    new.to_parquet(rp, index=False)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["compare", "--left-table", lp, "--right-table", rp,
                   "--keys", "id,ts", "--mapping", '{"metric": "m2"}',
                   "--migration-check",
                   "--out", str(tmp_path / "cmp_out")])
    assert rc == 0
    res = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert res["rows_compared"] == n
    assert res["mismatches"]["metric"] == n // 6
