"""Randomized differential for the source scan layer vs DuckDB: hive path
pruning under random ds ranges, select/where rendering (column refs, SQL
strings, callables), timestamp-unit normalization, EOD ts synthesis and the
cumulative latest-partition rule (reference: GroupBy.scala:565-652,
Source/Query rendering in api.thrift + GroupBy.scala:620-660)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from chronon_ray.api import EventSource, TQuery
from chronon_ray.expr import sql_expr, sql_where
from chronon_ray.sources import list_partitions, scan_source, scan_table


def _rand_table(rng: np.random.Generator, n: int, ts_kind: str) -> pa.Table:
    """Random table with nullable ints, floats, strings and a ts column of
    the given physical kind."""
    ival = rng.integers(0, 50, size=n).astype("int64")
    imask = rng.random(n) < 0.15
    fval = np.round(rng.normal(0, 10, size=n), 3)
    sval = np.array([f"s{int(x)}" for x in rng.integers(0, 8, size=n)])
    base_ms = 1_700_000_000_000
    ts_ms = base_ms + rng.integers(0, 12 * 86_400_000, size=n)
    cols = {
        "k": pa.array(sval),
        "v_int": pa.array(pd.array(ival, dtype="Int64").to_numpy(na_value=0),
                          mask=imask),
        "v_float": pa.array(fval),
    }
    if ts_kind == "int64":
        cols["ts"] = pa.array(ts_ms, type=pa.int64())
    else:
        unit = ts_kind
        mult = {"s": 0.001, "ms": 1, "us": 1000, "ns": 1_000_000}[unit]
        vals = (ts_ms * mult).astype("int64") if mult >= 1 \
            else (ts_ms // 1000).astype("int64")
        cols["ts"] = pa.array(vals).cast(pa.timestamp(unit))
    days = (ts_ms // 86_400_000).astype("datetime64[D]")
    cols["ds"] = pa.array(np.datetime_as_string(days, unit="D"))
    return pa.table(cols)


def _write_hive(tbl: pa.Table, out_dir: str) -> list[str]:
    ds_vals = tbl["ds"].to_numpy(zero_copy_only=False)
    for v in np.unique(ds_vals):
        sub = tbl.filter(pa.array(ds_vals == v)).drop_columns(["ds"])
        pdir = os.path.join(out_dir, f"ds={v}")
        os.makedirs(pdir, exist_ok=True)
        pq.write_table(sub, os.path.join(pdir, "part-0.parquet"))
    return sorted(np.unique(ds_vals).tolist())


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


@pytest.mark.parametrize("seed", [1, 2, 3, 4])
def test_scan_pruning_and_render_vs_duckdb(ray_session, tmp_path, seed):
    rng = np.random.default_rng(seed)
    ts_kind = ["int64", "s", "ms", "us", "ns"][seed % 5]
    tbl = _rand_table(rng, 4_000, ts_kind)
    tdir = str(tmp_path / "t")
    days = _write_hive(tbl, tdir)

    # random ds range: none / start-only / end-only / both
    lo = days[int(rng.integers(0, len(days)))] if rng.random() < 0.7 else None
    hi_pool = [d for d in days if lo is None or d >= lo]
    hi = hi_pool[int(rng.integers(0, len(hi_pool)))] \
        if rng.random() < 0.7 else None

    q = TQuery.of(
        selects={"k": "k",
                 "v2": sql_expr("v_int * 2 + 1"),
                 "vf": lambda t: pc.multiply(t["v_float"], -1.0),
                 "ts": "ts", "ds": "ds"},
        wheres=[sql_where("v_float > -5"),
                lambda t: pc.is_valid(t["v_int"])],
        start_partition=lo, end_partition=hi)
    got = scan_table(tdir, q).to_pandas()

    con = duckdb.connect()
    rng_pred = " and ".join(
        [x for x in (f"ds >= '{lo}'" if lo else None,
                     f"ds <= '{hi}'" if hi else None) if x]) or "true"
    ts_sql = "ts" if ts_kind == "int64" else "epoch_ms(ts)"
    exp = con.sql(f"""
        select k, v_int * 2 + 1 as v2, v_float * -1.0 as vf,
               {ts_sql} as ts, ds
        from read_parquet('{tdir}/*/*.parquet', hive_partitioning=1)
        where ({rng_pred}) and coalesce(v_float > -5, false)
          and v_int is not null
    """).df()
    exp["ds"] = exp["ds"].astype(str)
    assert len(got) == len(exp) and len(got) > 0
    pd.testing.assert_frame_equal(_norm(got), _norm(exp), check_dtype=False,
                                  rtol=1e-12)


@pytest.mark.parametrize("seed", [11, 12])
def test_cumulative_latest_partition(ray_session, tmp_path, seed):
    """is_cumulative: only the newest partition <= end_partition is read
    (it holds all history); EOD ts synthesized when no ts column."""
    rng = np.random.default_rng(seed)
    tbl = _rand_table(rng, 1_000, "int64").drop_columns(["ts"])
    tdir = str(tmp_path / "cum")
    days = _write_hive(tbl, tdir)
    end = days[int(rng.integers(1, len(days)))]
    src = EventSource(table=tdir, is_cumulative=True,
                      query=TQuery(end_partition=end))
    got = scan_source(src).to_pandas()

    latest = max(d for d in days if d <= end)
    con = duckdb.connect()
    exp = con.sql(f"""
        select *, epoch_ms(cast('{latest}' as timestamp)) + 86399999 as ts
        from read_parquet('{tdir}/ds={latest}/*.parquet',
                          hive_partitioning=1)
    """).df()
    exp["ds"] = exp["ds"].astype(str)
    assert sorted(got["ds"].unique()) == [latest]
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(_norm(got), _norm(exp), check_dtype=False)


@pytest.mark.parametrize("seed", [21, 22, 23])
def test_staging_query_randomized(ray_session, tmp_path, seed):
    """StagingQuery macro substitution + range fill vs a hand-rendered
    DuckDB run of the same SQL."""
    from chronon_ray.staging import run_staging_query

    rng = np.random.default_rng(seed)
    tbl = _rand_table(rng, 3_000, "int64")
    tdir = str(tmp_path / "src")
    days = _write_hive(tbl, tdir)
    lo_i = int(rng.integers(0, len(days) - 3))
    start, end = days[lo_i], days[lo_i + 2]

    sql = """
        select k, ds, sum(v_float) as vs, count(*) as n,
               max_tbl as latest_seen
        from (select *, {{ max_date(table=src) }} as max_tbl
              from src
              where ds between {{ start_date }} and {{ end_date }})
        group by k, ds, max_tbl
    """
    out_dir = str(tmp_path / "out")
    run_staging_query(sql, {"src": tdir}, out_dir, start, end)

    con = duckdb.connect()
    con.sql(f"""create view src as select * from
                read_parquet('{tdir}/*/*.parquet', hive_partitioning=1)""")
    rendered = (sql.replace("{{ start_date }}", f"'{start}'")
                   .replace("{{ end_date }}", f"'{end}'")
                   .replace("{{ max_date(table=src) }}", f"'{days[-1]}'"))
    exp = con.sql(rendered).df()
    exp["ds"] = exp["ds"].astype(str)

    frames = []
    for d in sorted(os.listdir(out_dir)):
        if d.startswith("ds="):
            pdir = os.path.join(out_dir, d)
            for f in os.listdir(pdir):
                if f.endswith(".parquet"):
                    x = pq.read_table(os.path.join(pdir, f)).to_pandas()
                    x["ds"] = d.split("=", 1)[1]
                    frames.append(x)
    got = pd.concat(frames, ignore_index=True)
    pd.testing.assert_frame_equal(_norm(got), _norm(exp), check_dtype=False,
                                  rtol=1e-12)
