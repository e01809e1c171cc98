"""`python -m chronon_ray` job CLI: conf compile/validate, driver dispatch,
lineage + resume through the command-line surface (reference launcher
analog: api/py/ai/chronon/repo/run.py)."""

import json
import os
import subprocess
import sys

import pytest

from chronon_ray.api import (
    EventSource,
    GroupByConf,
    JoinConf,
    JoinPart,
    TQuery,
    agg,
    window,
)
from chronon_ray.cli import main
from chronon_ray.compile import compile_to_json
from chronon_ray.testing.tokengen import (
    ensure_fixture,
    gen_events,
    gen_queries,
    write_partitioned as wp,
)


@pytest.fixture(scope="module")
def cli_env(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("cli")
    ev = gen_events(4_000, n_keys=200)
    q = gen_queries(800, ev, n_keys=200)
    left_dir, right_dir = str(base / "left"), str(base / "right")
    wp(q, left_dir)
    wp(ev, right_dir)

    gb = GroupByConf(
        name="cli_gb", sources=(), key_columns=("doc_id",),
        aggregations=(agg("n_tok", "sum", [window(7, "d")]),
                      agg("n_tok", "count", [window(7, "d")])))
    jc = JoinConf(
        name="cli_join",
        left=EventSource(table=left_dir, query=TQuery()),
        parts=(JoinPart(group_by=GroupByConf(
            name="cli_part", sources=(EventSource(table=right_dir,
                                                  query=TQuery()),),
            key_columns=("doc_id",),
            aggregations=(agg("n_tok", "sum", [window(7, "d")]),))),))

    gb_path, jc_path = str(base / "gb.json"), str(base / "join.json")
    with open(gb_path, "w") as f:
        f.write(compile_to_json(gb))
    with open(jc_path, "w") as f:
        f.write(compile_to_json(jc))
    from chronon_ray.sources import list_partitions

    parts = list_partitions(left_dir)
    return {"base": str(base), "left": left_dir, "right": right_dir,
            "gb_conf": gb_path, "join_conf": jc_path, "gb": gb,
            "start": parts[1], "end": parts[3]}


def _run(argv, capsys) -> dict:
    assert main(argv) == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_compile_subcommand_subprocess(cli_env):
    """The module entrypoint works as `python -m chronon_ray` in a fresh
    process (the `ray job submit` shape) — compile needs no Ray session."""
    r = subprocess.run(
        [sys.executable, "-m", "chronon_ray", "compile",
         "--conf", cli_env["gb_conf"]],
        capture_output=True, text=True, cwd="/root/repo", timeout=120)
    assert r.returncode == 0, r.stderr
    got = json.loads(r.stdout.strip().splitlines()[-1])
    assert got["kind"] == "group_by"
    assert got["semantic_hash"] == cli_env["gb"].semantic_hash()


def test_backfill_temporal_and_resume(cli_env, capsys):
    out_dir = os.path.join(cli_env["base"], "gb_out")
    argv = ["backfill", "--conf", cli_env["gb_conf"], "--out", out_dir,
            "--start", cli_env["start"], "--end", cli_env["end"],
            "--left-table", cli_env["left"],
            "--right-table", cli_env["right"],
            "--num-partitions", "4", "--step-days", "2"]
    got = _run(argv, capsys)
    assert got["kind"] == "temporal"
    days = got["partitions_written"]
    assert len(days) == 3
    for d in days:
        assert os.path.exists(os.path.join(out_dir, f"ds={d}",
                                           "_MANIFEST.json"))
    # second identical invocation resumes: nothing recomputed
    again = _run(argv, capsys)
    assert again["partitions_written"] == []
    assert sorted(again["skipped"]) == sorted(days)


def test_backfill_join_conf(cli_env, capsys):
    out_dir = os.path.join(cli_env["base"], "join_out")
    got = _run(["backfill", "--conf", cli_env["join_conf"],
                "--out", out_dir, "--start", cli_env["start"],
                "--end", cli_env["end"], "--num-partitions", "4"], capsys)
    assert got["kind"] == "join"
    assert len(got["partitions_written"]) == 3
    assert os.path.isdir(os.path.join(
        out_dir, "parts", "cli_part", f"ds={cli_env['start']}"))


def test_dispatch_errors(cli_env, capsys):
    # GroupBy conf without tables
    with pytest.raises(SystemExit):
        main(["backfill", "--conf", cli_env["gb_conf"], "--out", "/tmp/x",
              "--start", cli_env["start"], "--end", cli_env["end"]])
    # snapshot mode without --source-table
    with pytest.raises(SystemExit):
        main(["backfill", "--conf", cli_env["gb_conf"], "--out", "/tmp/x",
              "--start", cli_env["start"], "--end", cli_env["end"],
              "--mode", "snapshot"])
    # join mode on a group_by conf
    with pytest.raises(SystemExit):
        main(["backfill", "--conf", cli_env["gb_conf"], "--out", "/tmp/x",
              "--start", cli_env["start"], "--end", cli_env["end"],
              "--mode", "join"])
    capsys.readouterr()


def test_backfill_incremental_tiles_cli(cli_env, capsys):
    out_dir = os.path.join(cli_env["base"], "inc_tiles_out")
    ck_dir = os.path.join(cli_env["base"], "inc_tiles_ck")
    got = _run(["backfill", "--conf", cli_env["gb_conf"], "--out", out_dir,
                "--start", cli_env["start"], "--end", cli_env["end"],
                "--left-table", cli_env["left"],
                "--right-table", cli_env["right"],
                "--mode", "incremental", "--serve-mode", "tiles",
                "--checkpoint-dir", ck_dir, "--num-partitions", "4"],
               capsys)
    assert got["kind"] == "incremental"
    assert len(got["partitions_written"]) == 3
    for d in got["partitions_written"]:
        assert os.path.exists(os.path.join(out_dir, f"ds={d}",
                                           "_MANIFEST.json"))


def test_fetch_subcommand(cli_env, capsys):
    """fetch: newest rolling checkpoint + in-flight events answer point
    lookups that match the direct temporal join at the same ts."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from chronon_ray.api import TQuery
    from chronon_ray.pipelines.temporal import temporal_join
    from chronon_ray.sources import scan_table

    out_dir = os.path.join(cli_env["base"], "fetch_out")
    ck_dir = os.path.join(cli_env["base"], "fetch_ck")
    _run(["backfill", "--conf", cli_env["gb_conf"], "--out", out_dir,
          "--start", cli_env["start"], "--end", cli_env["end"],
          "--left-table", cli_env["left"],
          "--right-table", cli_env["right"],
          "--mode", "incremental", "--checkpoint-dir", ck_dir,
          "--num-partitions", "4"], capsys)
    at_ms = int(pd.Timestamp(cli_env["end"]).value // 10**6) + 7_200_000
    right0 = scan_table(cli_env["right"], TQuery())
    ids = sorted({r["doc_id"] for r in right0.take(50)})[:2]
    got = _run(["fetch", "--conf", cli_env["gb_conf"],
                "--checkpoint-dir", ck_dir,
                "--right-table", cli_env["right"],
                "--keys", json.dumps([{"doc_id": i} for i in ids]),
                "--at", str(at_ms), "--num-partitions", "4"], capsys)
    assert got["kind"] == "fetch" and len(got["rows"]) == 2
    assert [r["doc_id"] for r in got["rows"]] == ids
    q = pd.DataFrame({"doc_id": ids, "ts": np.int64(at_ms)})
    right = scan_table(cli_env["right"], TQuery())
    exp = temporal_join(rd.from_pandas(q), right, cli_env["gb"],
                        num_partitions=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    for i, r in enumerate(got["rows"]):
        for c in ("n_tok_sum_7d", "n_tok_count_7d"):
            e = exp.loc[i, c]
            if pd.isna(e):
                assert r[c] is None, (c, r)
            else:
                assert abs(r[c] - float(e)) < 1e-6, (c, r[c], e)
