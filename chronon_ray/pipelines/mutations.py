"""Temporal entities: point-in-time-correct aggregation over mutating
entity tables (mutation replay with reversals).

Parity target: the reference's temporalEntities path (reference:
spark/GroupBy.scala:178-273 — three-way join of queries × EOD snapshot of
ds−1 × the day's mutations sorted by mutation_ts, replayed with `is_before`
reversal rows deleting prior state; aggregator/windowing/
SawtoothMutationAggregator.scala:40-216 update/delete routing).

Semantics: for a query (key, ts) on day D, the feature is the aggregate over
the entity rows **as of ts**: start from the merged IR of snapshot rows at
ds = D−1, then apply day-D mutations with ``mutation_ts < ts`` (strict — reference
SawtoothMutationAggregator.scala:197) in timestamp order — ``is_before=false`` rows update, ``is_before=true`` rows delete.

Physical plan: snapshot rows collapse to per-(key, ds) partial IRs at the map
side (RowAggregator grouped path — only IRs cross the shuffle, never raw
snapshot rows); mutations and queries are tagged and co-partitioned by
hash(key); the partition processor merges base IRs vectorized, converts each
query day's base IR to the scalar py-IR form once, and replays the (small,
CDC-sized) mutation stream per (key, day) over the sorted queries.

Round-1 scope: unbounded (as-of-state) aggregations of deletable ops
(SUM / COUNT / AVERAGE / VARIANCE / HISTOGRAM). Reserved columns follow the
reference: ``mutation_ts``, ``is_before`` (api/Constants.scala:22-28).
"""

from __future__ import annotations

from dataclasses import replace
from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..api import AggregationPart, GroupByConf, Operation
from ..aggregators.ops import OPS
from ..aggregators.row import RowAggregator
from ..state.partitions import shift_ds
from .groupby import _factorize_keys, stable_key_hash

MILLIS_DAY = 86_400_000
_SUPPORTED = {Operation.SUM, Operation.COUNT, Operation.AVERAGE,
              Operation.VARIANCE, Operation.HISTOGRAM}


def _ir_row_to_py(p: AggregationPart, row: pd.Series):
    """Grouped-path IR frame row → scalar py IR for the same op."""
    name = p.output_name
    op = p.operation
    if row.get(f"{name}__{_first_ir_col(p)}") is None or \
            (isinstance(row.get(f"{name}__{_first_ir_col(p)}"), float)
             and np.isnan(row[f"{name}__{_first_ir_col(p)}"])):
        return None
    if op == Operation.SUM:
        return float(row[f"{name}__s"])
    if op == Operation.COUNT:
        return int(row[f"{name}__n"])
    if op == Operation.AVERAGE:
        return (float(row[f"{name}__s"]), int(row[f"{name}__n"]))
    if op == Operation.VARIANCE:
        return (float(row[f"{name}__n"]), float(row[f"{name}__m1"]),
                float(row[f"{name}__m2"]))
    if op == Operation.HISTOGRAM:
        h = row[f"{name}__hist"]
        return dict(h) if not isinstance(h, dict) else dict(h)
    raise KeyError(op)


def _first_ir_col(p: AggregationPart) -> str:
    return OPS[p.operation].ir_columns()[0]


class _EntityPartition:
    """One hash partition of tagged rows: kind 0 = snapshot IR partials,
    kind 1 = mutations, kind 2 = queries."""

    def __init__(self, keys: Sequence[str], parts: list[AggregationPart],
                 snap_schema: pa.Schema, left_cols: list[str]):
        self.__name__ = type(self).__name__
        self.keys = list(keys)
        self.parts = parts
        self.agg = RowAggregator(parts, snap_schema)
        self.left_cols = left_cols
        self.out_fields = [
            pa.field(p.output_name,
                     OPS[p.operation].output_arrow_type(
                         snap_schema.field(p.input_column).type, p))
            for p in parts
        ]

    def __call__(self, pdf: pd.DataFrame) -> pa.Table:
        pdf = pdf.reset_index(drop=True)
        snaps = pdf[pdf["_kind"] == 0]
        muts = pdf[pdf["_kind"] == 1]
        queries = pdf[pdf["_kind"] == 2]
        out_cols: dict[str, list] = {c: [] for c in self.left_cols}
        feats: dict[str, list] = {f.name: [] for f in self.out_fields}
        if len(queries) == 0:
            arrays = {c: pa.array([]) for c in self.left_cols}
            arrays.update({f.name: pa.array([], type=f.type) for f in self.out_fields})
            return pa.table(arrays)

        # merge snapshot IR partials per (keys, ds) — vectorized
        base_by_kd: dict[tuple, pd.Series] = {}
        if len(snaps):
            codes, kdf = _factorize_keys(snaps, [*self.keys, "_snap_ds"])
            irf = self.agg.ir_frame_from_pandas(snaps)
            irf = irf.drop(columns=[c for c in (*self.keys, "_snap_ds", "_part",
                                                "_kind") if c in irf.columns],
                           errors="ignore")
            irf["g"] = codes
            merged = self.agg.merge_frame(irf).set_index("g")
            for g, row in merged.iterrows():
                kvals = tuple(kdf.iloc[int(g)])
                base_by_kd[kvals] = row

        # group mutations by (keys, day); sort by mutation_ts
        mut_groups: dict[tuple, pd.DataFrame] = {}
        if len(muts):
            m = muts.copy()
            m["_day"] = (m["ts"].astype(np.int64) // MILLIS_DAY)
            for kv, grp in m.groupby([*self.keys, "_day"], sort=False):
                mut_groups[tuple(kv)] = grp.sort_values("ts", kind="stable")

        # replay per query, grouped by (keys, day), queries sorted by ts so
        # the mutation prefix sweep is shared
        q = queries.copy()
        q["_day"] = (q["ts"].astype(np.int64) // MILLIS_DAY)
        for kv, grp in q.groupby([*self.keys, "_day"], sort=False):
            kv = tuple(kv) if isinstance(kv, tuple) else (kv,)
            key_vals, day = kv[:-1], int(kv[-1])
            day_ds = pd.Timestamp(day * MILLIS_DAY, unit="ms").strftime("%Y-%m-%d")
            prev_ds = shift_ds(day_ds, -1)
            base_row = base_by_kd.get((*key_vals, prev_ds))
            base_irs = {
                p.output_name: (None if base_row is None
                                else _ir_row_to_py(p, base_row))
                for p in self.parts
            }
            mg = mut_groups.get((*key_vals, day))
            grp = grp.sort_values("ts", kind="stable")
            mi = 0
            mrows = mg.to_dict("records") if mg is not None else []
            cur = dict(base_irs)
            for _, qr in grp.iterrows():
                qts = int(qr["ts"])
                while mi < len(mrows) and int(mrows[mi]["ts"]) < qts:
                    mr = mrows[mi]
                    for p in self.parts:
                        v = mr.get(p.input_column)
                        if v is None or (isinstance(v, float) and np.isnan(v)):
                            continue
                        op = OPS[p.operation]
                        if mr.get("is_before"):
                            cur[p.output_name] = op.py_delete(
                                cur[p.output_name], v, int(mr["ts"]), p)
                        else:
                            cur[p.output_name] = op.py_update(
                                cur[p.output_name], v, int(mr["ts"]), p)
                    mi += 1
                for c in self.left_cols:
                    out_cols[c].append(qr[c])
                for p in self.parts:
                    ir = cur[p.output_name]
                    op = OPS[p.operation]
                    val = None
                    if ir is not None:
                        if p.operation == Operation.COUNT and ir == 0:
                            val = 0
                        else:
                            val = op.py_finalize(ir, p)
                    feats[p.output_name].append(val)

        arrays = {c: pa.array(out_cols[c]) for c in self.left_cols}
        for f in self.out_fields:
            arrays[f.name] = pa.array(feats[f.name], type=f.type)
        return pa.table(arrays)


def temporal_entities_join(
    queries: ray.data.Dataset,
    snapshots: ray.data.Dataset,
    mutations: ray.data.Dataset,
    conf: GroupByConf,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """PITC features over a mutating entity table (see module docstring).

    queries: keys + ts (+ passthrough); snapshots: keys + ds + inputs;
    mutations: keys + mutation_ts + is_before + inputs."""
    from ..util import dataset_schema

    keys = list(conf.key_columns)
    parts = conf.parts()
    for p in parts:
        if p.operation not in _SUPPORTED or not p.window.unbounded:
            raise NotImplementedError(
                "temporal_entities_join round-1 scope: unbounded "
                "SUM/COUNT/AVERAGE/VARIANCE/HISTOGRAM")
    q_schema = dataset_schema(queries)
    s_schema = dataset_schema(snapshots)
    left_cols = list(q_schema.names)
    agg = RowAggregator(parts, s_schema)
    input_cols = sorted({p.input_column for p in parts})

    def snap_partials(batch: pa.Table) -> pa.Table:
        """Snapshot rows → per-(keys, ds) IR partials (only IRs shuffle)."""
        gran = [*keys, "ds"]
        kdf = batch.select(gran).to_pandas()
        codes, uniq = _factorize_keys(kdf, gran)
        irf = agg.partial_frame(batch, codes, len(uniq))
        sel = irf["g"].to_numpy()
        key_arrays = {}
        for k in keys:
            key_arrays[k] = pa.array(uniq[k].to_numpy(dtype=object)[sel],
                                     type=batch.schema.field(k).type)
        key_arrays["_snap_ds"] = pa.array(
            uniq["ds"].to_numpy(dtype=object)[sel], type=pa.string())
        part = (stable_key_hash(uniq.iloc[sel], keys) % num_partitions)
        key_arrays["_part"] = pa.array(part.astype(np.int64))
        out = agg.ir_frame_to_arrow(irf, key_arrays)
        return out.append_column("_kind", pa.array(np.zeros(len(out), dtype=np.int8)))

    # union schema across the three tagged branches (ray union needs it)
    union_fields: list[pa.Field] = []
    seen: set[str] = set()

    def _addf(f: pa.Field):
        if f.name not in seen:
            seen.add(f.name)
            union_fields.append(f)

    for k in keys:
        _addf(pa.field(k, q_schema.field(k).type))
    _addf(pa.field("ts", pa.int64()))
    _addf(pa.field("_snap_ds", pa.string()))
    for f in agg.ir_fields():
        _addf(f)
    _addf(pa.field("is_before", pa.bool_()))
    for c in input_cols:
        _addf(pa.field(c, s_schema.field(c).type))
    for c in left_cols:
        if c not in seen:
            _addf(pa.field(c, q_schema.field(c).type))
    _addf(pa.field("_part", pa.int64()))
    _addf(pa.field("_kind", pa.int8()))

    def _pad(t: pa.Table) -> pa.Table:
        cols = {}
        for f in union_fields:
            if f.name in t.column_names:
                c = t[f.name]
                cols[f.name] = c if c.type == f.type else pc.cast(c, f.type)
            else:
                cols[f.name] = pa.nulls(len(t), type=f.type)
        return pa.table(cols)

    snap_ds = snapshots.map_batches(
        lambda t: _pad(snap_partials(t)), batch_format="pyarrow")

    def tag(kind: int, ts_col: Optional[str] = None, keep: Optional[list] = None):
        def f(t: pa.Table) -> pa.Table:
            cols = {}
            for k in keys:
                cols[k] = t[k]
            if ts_col is not None:
                cols["ts"] = pc.cast(t[ts_col], pa.int64())
            for c in keep or []:
                if c not in cols and c in t.column_names:
                    cols[c] = t[c]
            kdf = t.select(keys).to_pandas()
            part = stable_key_hash(kdf, keys) % num_partitions
            cols["_part"] = pa.array(part.astype(np.int64))
            cols["_kind"] = pa.array(np.full(len(t), kind, dtype=np.int8))
            return _pad(pa.table(cols))
        f.__name__ = f"tag{kind}"
        return f

    mut_ds = mutations.map_batches(
        tag(1, ts_col="mutation_ts", keep=["is_before", *input_cols]),
        batch_format="pyarrow")
    q_ds = queries.map_batches(
        tag(2, ts_col="ts", keep=[c for c in left_cols if c != "ts"]),
        batch_format="pyarrow")

    unioned = snap_ds.union(mut_ds).union(q_ds)
    proc = _EntityPartition(keys, parts, s_schema, left_cols)
    return unioned.groupby("_part").map_groups(proc, batch_format="pandas")
