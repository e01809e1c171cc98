"""Randomized differentials: connected-components label propagation vs a
pure-python union-find oracle on random graphs, and compile.py round-trips
on randomly-generated confs (load(compile(c)) must preserve the semantic
hash AND the computed result)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


# ---------------------------------------------------------------- graphs


def _union_find(n_nodes: int, edges: np.ndarray) -> dict[str, str]:
    parent = list(range(n_nodes))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict[int, list[int]] = {}
    for i in range(n_nodes):
        comp.setdefault(find(i), []).append(i)
    out = {}
    for members in comp.values():
        root = f"n{min(members):06d}"
        for m in members:
            out[f"n{m:06d}"] = root
    return out


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_connected_components_vs_union_find(ray_session, seed):
    from chronon_ray.functions.dedup import connected_components

    rng = np.random.default_rng(seed)
    n = int(rng.integers(50, 400))
    # mix of sparse random edges and a few long chains (propagation depth)
    m = int(rng.integers(0, n))
    edges = rng.integers(0, n, size=(m, 2))
    chain_len = int(rng.integers(2, 12))
    c0 = int(rng.integers(0, max(1, n - chain_len)))
    chain = np.array([[c0 + i, c0 + i + 1] for i in range(chain_len - 1)],
                     dtype="int64")
    edges = np.vstack([edges, chain]) if len(edges) else chain
    # drop self-loops (pair emitters never produce them)
    edges = edges[edges[:, 0] != edges[:, 1]]

    names = np.array([f"n{i:06d}" for i in range(n)])
    ids = rd.from_arrow(pa.table({"doc_id": names}))
    pairs = rd.from_arrow(pa.table({"a": names[edges[:, 0]],
                                    "b": names[edges[:, 1]]}))
    got = connected_components(pairs, ids, "doc_id",
                               max_iters=64, num_partitions=4).to_pandas()
    exp = _union_find(n, edges)
    got_map = dict(zip(got["doc_id"], got["cluster_id"]))
    assert len(got_map) == n
    assert got_map == exp


# ---------------------------------------------------------------- compile


def _rand_groupby(rng: np.random.Generator, name: str):
    from chronon_ray.api import GroupByConf, UNBOUNDED, agg, window
    from chronon_ray.expr import sql_expr, sql_where
    from chronon_ray.api import EventSource, TQuery

    ops = [("n_tok", "sum"), ("n_tok", "count"), ("n_tok", "average"),
           ("n_tok", "min"), ("n_tok", "max"),
           ("source", "unique_count"), ("n_tok", "variance")]
    wins_pool = [[window(1, "d")], [window(3, "d"), window(7, "d")],
                 [UNBOUNDED], [window(12, "h")]]
    take = rng.choice(len(ops), size=int(rng.integers(1, 4)), replace=False)
    aggs = tuple(
        agg(ops[i][0], ops[i][1],
            wins_pool[int(rng.integers(0, len(wins_pool)))])
        for i in sorted(take))
    q = TQuery.of(selects={"doc_id": "doc_id", "ts": "ts",
                           "n_tok": sql_expr("n_tok + 0"),
                           "source": "source"},
                  wheres=[sql_where("n_tok >= 0")]) \
        if rng.random() < 0.5 else TQuery()
    src = EventSource(table="<set at runtime>", query=q)
    return GroupByConf(name=name, sources=(src,), key_columns=("doc_id",),
                       aggregations=aggs)


@pytest.mark.parametrize("seed", [11, 12, 13, 14])
def test_compile_roundtrip_preserves_results(ray_session, seed, tmp_path):
    """compile→load must preserve the semantic hash and the actual computed
    feature rows, including sql_expr selects/wheres."""
    from dataclasses import replace

    from chronon_ray.compile import compile_to_json, load_json
    from chronon_ray.pipelines.temporal import temporal_join
    from chronon_ray.sources import scan_source
    from chronon_ray.api import EventSource, TQuery
    from chronon_ray.testing.tokengen import ensure_fixture

    rng = np.random.default_rng(seed)
    conf = _rand_groupby(rng, f"rt{seed}")
    paths = ensure_fixture("t1")
    src = replace(conf.sources[0], table=paths["events_dir"])
    conf = replace(conf, sources=(src,))

    conf2 = load_json(compile_to_json(conf))
    assert conf2.semantic_hash() == conf.semantic_hash()
    assert conf2 == conf

    left = rd.read_parquet(paths["queries_file"]).limit(500).materialize()
    right = scan_source(conf.sources[0])
    a = temporal_join(left, right, conf, num_partitions=4).to_pandas()
    right2 = scan_source(conf2.sources[0])
    b = temporal_join(left, right2, conf2, num_partitions=4).to_pandas()
    key = sorted(a.columns)
    pd.testing.assert_frame_equal(
        a[key].sort_values(key).reset_index(drop=True),
        b[key].sort_values(key).reset_index(drop=True),
        check_dtype=False)
