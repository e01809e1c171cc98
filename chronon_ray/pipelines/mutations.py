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

Windowed aggregations follow the reference's BatchIr = (collapsed,
tailHops) split (SawtoothMutationAggregator.scala:64-216): snapshot rows
whose event ts falls within ``tailBufferMillis`` (2 days) of the window
tail are kept as per-hop IRs instead of being collapsed, so each query can
trim its own hop-rounded tail (`mergeTailHops`); mutations apply per part
only when the mutated row's event ts is inside that query's window
(`updateIr` rowInWindow check). Supported ops are the deletable set
(SUM / COUNT / AVERAGE / VARIANCE / SKEW / KURTOSIS / HISTOGRAM —
higher moments delete via the exact signed-merge identity). Reserved columns follow the
reference: ``mutation_ts``, ``is_before`` (api/Constants.scala:22-28);
windowed parts additionally need an event-``ts`` column on snapshots (and
use it on mutations when present, falling back to mutation_ts).
"""

from __future__ import annotations

import pickle
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
from ..windowing.resolution import round_ts, tail_hop_millis
from .groupby import _factorize_keys, canon_key_hash

MILLIS_DAY = 86_400_000
TAIL_BUFFER_MS = 2 * MILLIS_DAY  # reference tailBufferMillis default
_SUPPORTED = {Operation.SUM, Operation.COUNT, Operation.AVERAGE,
              Operation.VARIANCE, Operation.SKEW, Operation.KURTOSIS,
              Operation.HISTOGRAM}


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
    if op == Operation.SKEW:
        return (float(row[f"{name}__n"]), float(row[f"{name}__m1"]),
                float(row[f"{name}__m2"]), float(row[f"{name}__m3"]))
    if op == Operation.KURTOSIS:
        return (float(row[f"{name}__n"]), float(row[f"{name}__m1"]),
                float(row[f"{name}__m2"]), float(row[f"{name}__m3"]),
                float(row[f"{name}__m4"]))
    if op == Operation.HISTOGRAM:
        h = row[f"{name}__hist"]
        return dict(h) if not isinstance(h, dict) else dict(h)
    raise KeyError(op)


def _first_ir_col(p: AggregationPart) -> str:
    return OPS[p.operation].ir_columns()[0]


def _ir_rec_to_py(p: AggregationPart, rec: dict):
    """op.partial() result row (unprefixed IR columns) → scalar py IR."""
    op = p.operation
    if op == Operation.SUM:
        return float(rec["s"])
    if op == Operation.COUNT:
        return int(rec["n"])
    if op == Operation.AVERAGE:
        return (float(rec["s"]), int(rec["n"]))
    if op == Operation.VARIANCE:
        return (float(rec["n"]), float(rec["m1"]), float(rec["m2"]))
    if op == Operation.SKEW:
        return (float(rec["n"]), float(rec["m1"]), float(rec["m2"]),
                float(rec["m3"]))
    if op == Operation.KURTOSIS:
        return (float(rec["n"]), float(rec["m1"]), float(rec["m2"]),
                float(rec["m3"]), float(rec["m4"]))
    if op == Operation.HISTOGRAM:
        return dict(rec["hist"])
    raise KeyError(op)


class _EntityPartition:
    """One hash partition of tagged rows: kind 0 = snapshot IR partials,
    kind 1 = mutations, kind 2 = queries."""

    def __init__(self, keys: Sequence[str], parts: list[AggregationPart],
                 snap_schema: pa.Schema, left_cols: list[str],
                 left_fields: Optional[list[pa.Field]] = None):
        self.__name__ = type(self).__name__
        self.keys = list(keys)
        self.parts = parts
        self.in_schema = snap_schema
        self.agg = RowAggregator(parts, snap_schema)
        self.left_cols = left_cols
        # declared left schema: the pandas union frame promotes int64→
        # float64 on null-padded columns; outputs must cast back
        self.left_fields = left_fields or []
        self.out_fields = [
            pa.field(p.output_name,
                     OPS[p.operation].output_arrow_type(
                         snap_schema.field(p.input_column).type, p))
            for p in parts
        ]

    def _apply_one(self, p: AggregationPart, ir, mr: dict, qts):
        """Apply one mutation row to a scalar py IR. qts=None skips the
        window check (unbounded parts); otherwise the reference's
        rowInWindow guard applies against THAT query's hop-rounded tail."""
        v = mr.get(p.input_column)
        if v is None or v is pd.NA or (isinstance(v, float) and np.isnan(v)):
            return ir
        if qts is not None and not p.window.unbounded:
            rts = mr.get("_row_ts")
            rts = int(mr["ts"]) if rts is None or \
                (isinstance(rts, float) and np.isnan(rts)) else int(rts)
            hop = tail_hop_millis(p.window)
            if not (rts >= round_ts(qts - p.window.millis, hop)
                    and rts < qts):
                return ir
        op = OPS[p.operation]
        if mr.get("is_before"):
            return op.py_delete(ir, v, int(mr["ts"]), p)
        return op.py_update(ir, v, int(mr["ts"]), p)

    def __call__(self, pdf: pd.DataFrame) -> pa.Table:
        pdf = pdf.reset_index(drop=True)
        snaps = pdf[pdf["_kind"] == 0]
        muts = pdf[pdf["_kind"] == 1]
        queries = pdf[pdf["_kind"] == 2]
        out_cols: dict[str, list] = {c: [] for c in self.left_cols}
        feats: dict[str, list] = {f.name: [] for f in self.out_fields}
        if len(queries) == 0:
            arrays = {c: pa.array([], type=self._left_type(c))
                      for c in self.left_cols}
            arrays.update({f.name: pa.array([], type=f.type) for f in self.out_fields})
            return pa.table(arrays)

        # merge snapshot IR partials per (keys, ds) — vectorized
        base_by_kd: dict[tuple, pd.Series] = {}
        tails_by_kd: dict[tuple, dict[str, dict]] = {}
        windowed = [p for p in self.parts if not p.window.unbounded]
        if len(snaps):
            codes, kdf = _factorize_keys(snaps, [*self.keys, "_snap_ds"])
            irf = self.agg.ir_frame_from_pandas(snaps)
            irf = irf.drop(columns=[c for c in (*self.keys, "_snap_ds", "_part",
                                                "_kind") if c in irf.columns],
                           errors="ignore")
            irf["g"] = codes
            merged = self.agg.merge_frame(irf)
            # column-wise row extraction (iterrows builds a Series per row)
            gvals = merged["g"].to_numpy()
            col_lists = {c: merged[c].tolist() for c in merged.columns
                         if c != "g"}
            key_rows = list(kdf.itertuples(index=False, name=None))
            for j in range(len(merged)):
                kvals = key_rows[int(gvals[j])]
                base_by_kd[kvals] = {c: lst[j]
                                     for c, lst in col_lists.items()}
            # merge pickled tail-hop dicts per group per windowed part
            for p in windowed:
                col = f"{p.output_name}__tailhops"
                if col not in snaps.columns:
                    continue
                op = OPS[p.operation]
                vals = snaps[col].to_numpy()
                for i, c in enumerate(codes):
                    b = vals[i]
                    if b is None or (isinstance(b, float) and np.isnan(b)):
                        continue
                    kvals = key_rows[int(c)]
                    slot = tails_by_kd.setdefault(kvals, {}) \
                        .setdefault(p.output_name, {})
                    for hopstart, hir in pickle.loads(b).items():
                        prev = slot.get(hopstart)
                        slot[hopstart] = hir if prev is None \
                            else op.py_merge(prev, hir, p)

        # group mutations by (keys, day); sort by mutation_ts
        mut_groups: dict[tuple, pd.DataFrame] = {}
        if len(muts):
            m = muts.copy()
            # restore declared INTEGER input dtypes (union promoted to
            # float64) so histogram keys match the snapshot IRs' str keys
            for c in {p.input_column for p in self.parts}:
                if c in m.columns and c in self.in_schema.names \
                        and pa.types.is_integer(self.in_schema.field(c).type):
                    m[c] = m[c].astype("Int64")
            m["_day"] = (m["ts"].astype(np.int64) // MILLIS_DAY)
            for kv, grp in m.groupby([*self.keys, "_day"], sort=False):
                mut_groups[tuple(kv)] = grp.sort_values("ts", kind="stable")

        def feats_for(cur: dict, tails: dict, qts: int, batch_end: int) -> list:
            """Finalized value per part for one query instant (tail-hop merge
            + finalize). Non-mutating: py_merge for the deletable set always
            returns fresh IRs."""
            vals = []
            for p in self.parts:
                ir = cur[p.output_name]
                op = OPS[p.operation]
                if not p.window.unbounded:
                    hop = tail_hop_millis(p.window)
                    qtail = round_ts(qts - p.window.millis, hop)
                    cut = batch_end - p.window.millis + TAIL_BUFFER_MS
                    for hopstart, hir in tails.get(p.output_name, {}).items():
                        if hopstart >= qtail and cut > hopstart:
                            ir = hir if ir is None else op.py_merge(ir, hir, p)
                val = None
                if ir is not None:
                    if p.operation == Operation.COUNT and ir == 0:
                        val = 0
                    else:
                        val = op.py_finalize(ir, p)
                vals.append(val)
            return vals

        windowed_parts = [p for p in self.parts if not p.window.unbounded]

        # replay per query, grouped by (keys, day), queries sorted by ts so
        # the mutation prefix sweep is shared
        q = queries.copy()
        q["_day"] = (q["ts"].astype(np.int64) // MILLIS_DAY)
        for kv, grp in q.groupby([*self.keys, "_day"], sort=False):
            kv = tuple(kv) if isinstance(kv, tuple) else (kv,)
            key_vals, day = kv[:-1], int(kv[-1])
            day_ds = pd.Timestamp(day * MILLIS_DAY, unit="ms").strftime("%Y-%m-%d")
            prev_ds = shift_ds(day_ds, -1)
            batch_end = day * MILLIS_DAY  # EOD of the ds-1 snapshot
            base_row = base_by_kd.get((*key_vals, prev_ds))
            base_irs = {
                p.output_name: (None if base_row is None
                                else _ir_row_to_py(p, base_row))
                for p in self.parts
            }
            tails = tails_by_kd.get((*key_vals, prev_ds), {})
            mg = mut_groups.get((*key_vals, day))
            if mg is None:
                # fast path (the common case — most key-days see no CDC):
                # features depend only on the base IR and each query's
                # hop-rounded tails, so compute once per distinct tail
                # signature instead of per query
                qts_arr = grp["ts"].astype(np.int64).to_numpy()
                if windowed_parts:
                    sig = np.stack([
                        round_ts(qts_arr - p.window.millis,
                                 tail_hop_millis(p.window))
                        for p in windowed_parts], axis=1)
                    _, rep, inv = np.unique(sig, axis=0, return_index=True,
                                            return_inverse=True)
                else:
                    rep = np.array([0])
                    inv = np.zeros(len(grp), dtype=np.int64)
                reps = [feats_for(base_irs, tails, int(qts_arr[i]), batch_end)
                        for i in rep]
                for c in self.left_cols:
                    out_cols[c].extend(grp[c].tolist())
                for pi, p in enumerate(self.parts):
                    feats[p.output_name].extend(
                        reps[ci][pi] for ci in inv)
                continue
            # CDC replay. Windowed parts must apply each mutation PER QUERY
            # (reference SawtoothMutationAggregator rowInWindow: the mutated
            # row's event ts must lie in THAT query's hop-rounded window — a
            # row can exit the window between two same-day queries, so a
            # shared running state over the mutation prefix is only exact
            # for unbounded parts). Windowed SUM/COUNT/AVERAGE use a dense
            # (query x mutation) signed mask — one matvec per part instead
            # of a per-row Python sweep; windowed VARIANCE/HISTOGRAM and
            # oversized groups fall back to per-query scalar replay.
            grp = grp.sort_values("ts", kind="stable")
            qts_arr = grp["ts"].astype(np.int64).to_numpy()
            nq, nm = len(grp), len(mg)
            mts = mg["ts"].astype(np.int64).to_numpy()
            if "_row_ts" in mg.columns:
                rts_arr = pd.to_numeric(mg["_row_ts"], errors="coerce") \
                    .fillna(pd.Series(mts, index=mg.index)) \
                    .to_numpy(dtype=np.int64)
            else:
                rts_arr = mts
            is_b = mg["is_before"].astype("boolean").fillna(False) \
                .to_numpy(dtype=bool) \
                if "is_before" in mg.columns else np.zeros(nm, dtype=bool)
            sign = np.where(is_b, -1.0, 1.0)
            cuts = np.searchsorted(mts, qts_arr, side="left")

            vec_ops = (Operation.SUM, Operation.COUNT, Operation.AVERAGE)
            per_q: dict[str, list] = {}
            seq_shared: list = []     # unbounded: running-prefix replay
            seq_per_query: list = []  # windowed scalar: replay per query
            before = None
            for p in self.parts:
                if p.operation not in vec_ops or nq * nm > 4_000_000:
                    (seq_shared if p.window.unbounded
                     else seq_per_query).append(p)
                    continue
                if before is None:
                    before = mts[None, :] < qts_arr[:, None]
                col = mg[p.input_column]
                valid = col.notna().to_numpy()
                v = pd.to_numeric(col, errors="coerce").fillna(0.0) \
                    .to_numpy(dtype=np.float64)
                m = before & valid[None, :]
                if not p.window.unbounded:
                    hop = tail_hop_millis(p.window)
                    qtail = round_ts(qts_arr - p.window.millis, hop)
                    m = m & (rts_arr[None, :] >= qtail[:, None]) \
                          & (rts_arr[None, :] < qts_arr[:, None])
                sm = np.where(m, sign[None, :], 0.0)
                applied = m.any(axis=1)
                base = base_irs[p.output_name]
                has = applied | (base is not None)
                if p.operation == Operation.SUM:
                    s = (0.0 if base is None else float(base)) + sm @ v
                    irs = [float(s[i]) if has[i] else None for i in range(nq)]
                elif p.operation == Operation.COUNT:
                    n = (0 if base is None else int(base)) + sm.sum(axis=1)
                    irs = [int(round(n[i])) if has[i] else None
                           for i in range(nq)]
                else:  # AVERAGE
                    bs, bn = (0.0, 0) if base is None \
                        else (float(base[0]), int(base[1]))
                    s = bs + sm @ v
                    n = bn + sm.sum(axis=1)
                    irs = [(float(s[i]), int(round(n[i]))) if has[i] else None
                           for i in range(nq)]
                per_q[p.output_name] = irs

            mrows = mg.to_dict("records") \
                if (seq_shared or seq_per_query) else None
            cur_shared = {p.output_name: base_irs[p.output_name]
                          for p in seq_shared}
            mi = 0
            for c in self.left_cols:
                out_cols[c].extend(grp[c].tolist())
            for qi in range(nq):
                qts = int(qts_arr[qi])
                while seq_shared and mi < cuts[qi]:
                    mr = mrows[mi]
                    for p in seq_shared:
                        cur_shared[p.output_name] = self._apply_one(
                            p, cur_shared[p.output_name], mr, None)
                    mi += 1
                cur = {}
                for p in self.parts:
                    name = p.output_name
                    if name in per_q:
                        cur[name] = per_q[name][qi]
                    elif p.window.unbounded:
                        cur[name] = cur_shared[name]
                    else:
                        # clone: py_update/py_delete mutate dict IRs and the
                        # base is shared across this group's queries
                        ir = OPS[p.operation].py_clone(base_irs[name], p)
                        for j in range(cuts[qi]):
                            ir = self._apply_one(p, ir, mrows[j], qts)
                        cur[name] = ir
                # mergeTailHops + finalize (shared with the fast path)
                vals = feats_for(cur, tails, qts, batch_end)
                for pi, p in enumerate(self.parts):
                    feats[p.output_name].append(vals[pi])

        arrays = {c: self._left_array(c, out_cols[c])
                  for c in self.left_cols}
        for f in self.out_fields:
            arrays[f.name] = pa.array(feats[f.name], type=f.type)
        return pa.table(arrays)

    def _left_type(self, name: str):
        from .groupby import left_field_type
        return left_field_type(self.left_fields, name)

    def _left_array(self, name: str, vals: list) -> pa.Array:
        from .groupby import left_column_array
        return left_column_array(self.left_fields, name, vals)


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
        if p.operation not in _SUPPORTED:
            raise NotImplementedError(
                "temporal_entities_join supports deletable ops only: "
                "SUM/COUNT/AVERAGE/VARIANCE/SKEW/KURTOSIS/HISTOGRAM")
    q_schema = dataset_schema(queries)
    s_schema = dataset_schema(snapshots)
    from ..aggregators.row import reject_map_inputs
    reject_map_inputs(parts, s_schema, "temporal_entities_join")
    windowed = [p for p in parts if not p.window.unbounded]
    if windowed and "ts" not in s_schema.names:
        raise ValueError(
            "windowed temporal-entities aggregations need an event 'ts' "
            "column on the snapshot table (the window is over row event "
            "time — reference SawtoothMutationAggregator.update)")
    left_cols = list(q_schema.names)
    agg = RowAggregator(parts, s_schema)
    input_cols = sorted({p.input_column for p in parts})
    # all three tagged branches MUST hash the same key representation —
    # canonicalize to the query schema's key types before partitioning
    key_types = {k: q_schema.field(k).type for k in keys}

    def snap_partials(batch: pa.Table) -> pa.Table:
        """Snapshot rows → per-(keys, ds) IR partials (only IRs shuffle).

        Windowed parts follow the reference BatchIr split: rows with event
        ts ≥ tail+buffer collapse into the regular IR columns; rows inside
        the 2-day tail buffer become per-hop py IRs, pickled per group."""
        gran = [*keys, "ds"]
        kdf = batch.select(gran).to_pandas()
        codes, uniq = _factorize_keys(kdf, gran)
        irf = agg.partial_frame(batch, codes, len(uniq))
        if windowed:
            ts_row = batch["ts"].to_numpy(zero_copy_only=False).astype(np.int64)
            # end-of-day instant per snapshot row (EOD of its ds partition)
            end_by_g = (pd.to_datetime(uniq["ds"]).astype("int64")
                        // 1_000_000 + MILLIS_DAY).to_numpy()
            end_row = end_by_g[codes]
            irf = irf.set_index("g")
            for p in windowed:
                op = OPS[p.operation]
                name = p.output_name
                W = p.window.millis
                hop = tail_hop_millis(p.window)
                col = batch[p.input_column]
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
                v = col.to_numpy(zero_copy_only=False)
                # hop-rounded retention, matching the sawtooth window
                # contract ts >= round(q - W, hop): a row at exactly
                # end - W (or inside the rounded tail band) is still in
                # the earliest query's window
                rel = valid & (ts_row < end_row) & \
                    (round_ts(ts_row, hop) >= round_ts(end_row - W, hop))
                coll = rel & (ts_row >= end_row - W + TAIL_BUFFER_MS)
                tail = rel & ~coll
                # overwrite this part's collapsed IR with the masked version
                for irc in op.ir_columns():
                    irf[f"{name}__{irc}"] = None
                if coll.any():
                    dfc = pd.DataFrame({"g": codes[coll], "v": v[coll]})
                    res = op.partial(dfc, len(uniq), p).set_index("g")
                    for irc in op.ir_columns():
                        irf.loc[res.index, f"{name}__{irc}"] = res[irc]
                # tail rows → per-(g, hopstart) py IRs, pickled per g
                tail_col = pd.Series([None] * len(irf), index=irf.index,
                                     dtype=object)
                if tail.any():
                    hs = round_ts(ts_row[tail], hop)
                    gt = codes[tail]
                    pairs = np.stack([gt, hs], axis=1)
                    puniq, pcodes = np.unique(pairs, axis=0,
                                              return_inverse=True)
                    dft = pd.DataFrame({"g": pcodes, "v": v[tail]})
                    rest = op.partial(dft, len(puniq), p).set_index("g")
                    per_g: dict[int, dict] = {}
                    for pc_, rec in rest.iterrows():
                        gg, hopstart = puniq[int(pc_)]
                        per_g.setdefault(int(gg), {})[int(hopstart)] = \
                            _ir_rec_to_py(p, rec)
                    for gg, d in per_g.items():
                        tail_col.loc[gg] = pickle.dumps(d)
                irf[f"{name}__tailhops"] = tail_col
            irf = irf.reset_index()
        sel = irf["g"].to_numpy()
        key_arrays = {}
        for k in keys:
            key_arrays[k] = pa.array(uniq[k].to_numpy(dtype=object)[sel],
                                     type=key_types[k])
        key_arrays["_snap_ds"] = pa.array(
            uniq["ds"].to_numpy(dtype=object)[sel], type=pa.string())
        part = canon_key_hash(pa.table({k: key_arrays[k] for k in keys}),
                              keys, key_types, num_partitions)
        key_arrays["_part"] = pa.array(part)
        out = agg.ir_frame_to_arrow(irf, key_arrays)
        for p in windowed:
            col = f"{p.output_name}__tailhops"
            out = out.append_column(
                col, pa.array(irf[col].tolist(), type=pa.binary()))
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
    for p in windowed:
        _addf(pa.field(f"{p.output_name}__tailhops", pa.binary()))
    _addf(pa.field("is_before", pa.bool_()))
    if windowed:
        _addf(pa.field("_row_ts", pa.int64()))
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
            part = canon_key_hash(t.select(keys), keys, key_types,
                                  num_partitions)
            cols["_part"] = pa.array(part)
            cols["_kind"] = pa.array(np.full(len(t), kind, dtype=np.int8))
            return _pad(pa.table(cols))
        f.__name__ = f"tag{kind}"
        return f

    def tag_mut(t: pa.Table) -> pa.Table:
        # ordering ts = mutation_ts; windowed parts also need the mutated
        # row's EVENT ts (falls back to mutation_ts when absent)
        if windowed:
            row_ts = t["ts"] if "ts" in t.column_names else t["mutation_ts"]
            t = t.append_column("_row_ts", pc.cast(row_ts, pa.int64())) \
                if "_row_ts" not in t.column_names else t
        return tag(1, ts_col="mutation_ts",
                   keep=["is_before", "_row_ts", *input_cols])(t)

    tag_mut.__name__ = "tag_mut"
    mut_ds = mutations.map_batches(tag_mut, batch_format="pyarrow")
    q_ds = queries.map_batches(
        tag(2, ts_col="ts", keep=[c for c in left_cols if c != "ts"]),
        batch_format="pyarrow")

    unioned = snap_ds.union(mut_ds).union(q_ds)
    proc = _EntityPartition(keys, parts, s_schema, left_cols,
                            left_fields=[q_schema.field(c)
                                         for c in left_cols])
    return unioned.groupby("_part").map_groups(proc, batch_format="pandas")
