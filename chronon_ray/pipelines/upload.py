"""GroupBy upload: per-key FinalBatchIr checkpoint tables + lambda merge.

Parity target: the reference's `group-by-upload` entry point
(spark/GroupByUpload.scala:65-105 — aggregateByKey with
SawtoothOnlineAggregator.init → normalizeBatchIr → FinalBatchIr(collapsed,
tailHops) written as a KV table) and the online query-time merge
(SawtoothOnlineAggregator.scala:83-126 — batch IR for rows `< batchEndTs`
merged with streaming events `≥ batchEndTs`, strictly `< queryTs`).

Offline uses here:

- **Incremental backfill checkpoints**: yesterday's checkpoint + today's
  events serve today's features without rescanning full history — at
  100 TB this replaces an O(history) scan per day with O(1 day).
- **Serving handoff**: the IR table is the exact payload a KV store would
  hold (IR columns are Arrow-native, tail hops a binary blob per part).

Layout per key row: the RowAggregator's IR columns (collapsed state —
windowed parts restricted to events in [round(batchEnd − W, hop),
batchEnd) minus the tail-buffer region), one pickled
``{output}__tailhops`` per windowed part (per-hop py IRs inside the 2-day
tail buffer, so any query in [batchEnd, batchEnd + buffer) can trim its
own hop-rounded tail), and ``_batch_end_ts``.

Bucketed aggregations are not supported here yet (their pivoted IR frame
needs a different tail layout) — callers get a clear error.
"""

from __future__ import annotations

import pickle
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..aggregators.ops import OPS
from ..aggregators.row import RowAggregator
from ..api import AggregationPart, GroupByConf, Operation
from ..windowing.resolution import round_ts, tail_hop_millis
from .groupby import _factorize_keys, canon_key_hash
from .mutations import TAIL_BUFFER_MS
from .temporal import ir_rec_to_py

_MS_DAY = 86_400_000


def _check_parts(parts: list[AggregationPart]):
    for p in parts:
        if p.bucket:
            raise NotImplementedError(
                "groupby_upload does not support bucketed aggregations yet")


def _rec_from_prefixed(p: AggregationPart, row) -> Optional[object]:
    """Prefixed IR frame row → scalar py IR (None when the key never saw a
    value for this part)."""
    op = OPS[p.operation]
    name = p.output_name
    first = row[f"{name}__{op.ir_columns()[0]}"]
    if first is None or (isinstance(first, float) and np.isnan(first)):
        return None
    rec = {irc: row[f"{name}__{irc}"] for irc in op.ir_columns()}
    return ir_rec_to_py(p, op, rec)


def groupby_upload(
    events: ray.data.Dataset,
    conf: GroupByConf,
    batch_end_ts: int,
    num_partitions: Optional[int] = None,
    full_hops: bool = False,
) -> ray.data.Dataset:
    """events (keys + ts + inputs) → one FinalBatchIr row per key (see
    module docstring). Only events with ``ts < batch_end_ts`` contribute.

    ``full_hops=True`` switches to the rolling layout: windowed parts keep
    their ENTIRE window as per-hop IRs (the HopsAggregator pattern —
    reference aggregator/windowing/HopsAggregator.scala) instead of
    collapsed + 2-day tail. Bigger rows (W/hop IRs per part), but the
    checkpoint can then be advanced day by day with ``roll_checkpoint``
    forever — no serving-horizon limit."""
    from ..util import auto_partitions, dataset_schema

    keys = list(conf.key_columns)
    parts = conf.parts()
    _check_parts(parts)
    schema = dataset_schema(events)
    from ..aggregators.row import reject_map_inputs
    reject_map_inputs(parts, schema, "groupby_upload")
    agg = RowAggregator(parts, schema)
    windowed = [p for p in parts if not p.window.unbounded]
    if num_partitions is None:
        num_partitions = auto_partitions(events)

    def partials(tbl: pa.Table) -> pa.Table:
        tbl = tbl.filter(pc.less(pc.cast(tbl["ts"], pa.int64()),
                                 batch_end_ts))
        kdf = tbl.select(keys).to_pandas()
        codes, uniq = _factorize_keys(kdf, keys)
        irf = agg.partial_frame(tbl, codes, len(uniq))
        ts_row = tbl["ts"].to_numpy(zero_copy_only=False).astype(np.int64)
        irf = irf.set_index("g")
        for p in windowed:
            op = OPS[p.operation]
            name = p.output_name
            W = p.window.millis
            hop = tail_hop_millis(p.window)
            wstart = round_ts(batch_end_ts - W, hop)
            cut = batch_end_ts + 1 if full_hops \
                else batch_end_ts - W + TAIL_BUFFER_MS
            rel = ts_row >= wstart
            coll = rel & (ts_row >= cut)
            tail = rel & ~coll
            # overwrite this part's full-range IR with the collapsed region
            for irc in op.ir_columns():
                irf[f"{name}__{irc}"] = None
            if coll.any():
                sub = tbl.filter(pa.array(coll))
                subf = agg.partial_frame(sub, codes[coll],
                                         len(uniq)).set_index("g")
                for irc in op.ir_columns():
                    irf.loc[subf.index, f"{name}__{irc}"] = \
                        subf[f"{name}__{irc}"]
            tail_col = pd.Series([None] * len(irf), index=irf.index,
                                 dtype=object)
            if tail.any():
                hs = round_ts(ts_row[tail], hop)
                gt = codes[tail]
                pairs = np.stack([gt, hs], axis=1)
                puniq, pcodes = np.unique(pairs, axis=0, return_inverse=True)
                sub = tbl.filter(pa.array(tail))
                subf = agg.partial_frame(sub, pcodes, len(puniq))
                per_g: dict[int, dict] = {}
                for _, prow in subf.iterrows():
                    gg, hopstart = puniq[int(prow["g"])]
                    rec = {irc: prow[f"{name}__{irc}"]
                           for irc in op.ir_columns()}
                    if rec[op.ir_columns()[0]] is None:
                        continue
                    per_g.setdefault(int(gg), {})[int(hopstart)] = \
                        ir_rec_to_py(p, op, rec)
                for gg, d in per_g.items():
                    tail_col.loc[gg] = pickle.dumps(d)
            irf[f"{name}__tailhops"] = tail_col
        irf = irf.reset_index()
        sel = irf["g"].to_numpy()
        key_arrays = {
            k: pa.array(uniq[k].to_numpy(dtype=object)[sel],
                        type=tbl.schema.field(k).type)
            for k in keys
        }
        # hash the canonical Arrow representation — a batch whose key col
        # picked up nulls converts to float64 in pandas and would hash
        # the SAME key differently from an all-valid batch
        part = canon_key_hash(
            pa.table({k: key_arrays[k] for k in keys}), keys,
            {k: schema.field(k).type for k in keys}, num_partitions)
        key_arrays["_part"] = pa.array(part)
        out = agg.ir_frame_to_arrow(irf, key_arrays)
        for p in windowed:
            col = f"{p.output_name}__tailhops"
            out = out.append_column(col,
                                    pa.array(irf[col].tolist(),
                                             type=pa.binary()))
        return out

    partials.__name__ = "upload_partials"
    shuffled = events.map_batches(partials, batch_format="pyarrow")

    def merge_part(pdf: pd.DataFrame) -> pa.Table:
        codes, kdf = _factorize_keys(pdf, keys)
        irf = agg.ir_frame_from_pandas(pdf)
        irf = irf.drop(columns=[c for c in (*keys, "_part") if c in irf],
                       errors="ignore")
        irf["g"] = codes
        # reindex to every present key: in full-hops mode a key's whole
        # windowed state lives in the tail hops and its collapsed IR
        # columns are all null — merge_frame alone would drop the row
        merged = agg.merge_frame(irf).set_index("g") \
            .reindex(np.unique(codes)).sort_index()
        # merge pickled tail dicts per key per part
        tails_out: dict[str, list] = {}
        for p in windowed:
            col = f"{p.output_name}__tailhops"
            op = OPS[p.operation]
            acc: dict[int, dict] = {}
            vals = pdf[col].to_numpy()
            floor = round_ts(batch_end_ts - p.window.millis,
                             tail_hop_millis(p.window))
            for i, c in enumerate(codes):
                b = vals[i]
                if b is None or (isinstance(b, float) and np.isnan(b)):
                    continue
                slot = acc.setdefault(int(c), {})
                for hopstart, hir in pickle.loads(b).items():
                    if hopstart < floor:  # slid out of the window
                        continue
                    prev = slot.get(hopstart)
                    slot[hopstart] = hir if prev is None \
                        else op.py_merge(prev, hir, p)
            tails_out[col] = [
                pickle.dumps(acc[g]) if g in acc else None
                for g in merged.index
            ]
        key_arrays = {
            k: pa.array(kdf[k].to_numpy(dtype=object)[merged.index],
                        type=schema.field(k).type)
            for k in keys
        }
        out = agg.ir_frame_to_arrow(merged.reset_index(), key_arrays)
        for col, vals in tails_out.items():
            out = out.append_column(col, pa.array(vals, type=pa.binary()))
        out = out.append_column(
            "_batch_end_ts",
            pa.array(np.full(len(out), batch_end_ts, dtype=np.int64)))
        return out.append_column(
            "_full_hops", pa.array(np.full(len(out), full_hops)))

    merge_part.__name__ = "upload_merge"
    return shuffled.groupby("_part").map_groups(merge_part,
                                                batch_format="pandas")


class _ServePartition:
    """One hash partition of tagged rows: 0 = IR checkpoint rows,
    1 = head events (ts ≥ batch_end), 2 = queries."""

    def __init__(self, keys, parts, schema: pa.Schema, left_cols,
                 batch_end_ts: int, full_hops: bool = False,
                 left_fields: Optional[list[pa.Field]] = None):
        self.__name__ = type(self).__name__
        self.keys, self.parts = list(keys), parts
        self.left_cols = left_cols
        # declared left schema: the pandas union frame promotes int64→
        # float64 on null-padded columns; outputs must cast back
        self.left_fields = left_fields or []
        self.in_schema = schema
        self.batch_end = batch_end_ts
        self.full_hops = full_hops
        self.agg = RowAggregator(parts, schema)
        self.out_fields = [
            pa.field(p.output_name,
                     OPS[p.operation].output_arrow_type(
                         schema.field(p.input_column).type, p))
            for p in parts
        ]

    def __call__(self, pdf: pd.DataFrame) -> pa.Table:
        pdf = pdf.reset_index(drop=True)
        irs = pdf[pdf["_kind"] == 0]
        heads = pdf[pdf["_kind"] == 1]
        queries = pdf[pdf["_kind"] == 2]
        out_cols: dict[str, list] = {c: [] for c in self.left_cols}
        feats: dict[str, list] = {f.name: [] for f in self.out_fields}
        if len(queries) == 0:
            arrays = {c: pa.array([], type=self._left_type(c))
                      for c in self.left_cols}
            arrays.update({f.name: pa.array([], type=f.type)
                           for f in self.out_fields})
            return pa.table(arrays)
        qts_all = queries["ts"].astype(np.int64)
        if (qts_all < self.batch_end).any() or (
                not self.full_hops
                and (qts_all >= self.batch_end + TAIL_BUFFER_MS).any()):
            raise ValueError(
                "serve_with_events queries must lie in [batch_end_ts, "
                "batch_end_ts + tail buffer) — outside that horizon the "
                "checkpoint's tail hops cannot trim the window (run a new "
                "groupby_upload at a later batch_end_ts)")

        base_by_key: dict[tuple, dict] = {}
        tails_by_key: dict[tuple, dict] = {}
        if len(irs):
            # rebuild composite IR columns (items __o/__p pairs, hist maps)
            # that the Arrow round-trip splits
            irs = self.agg.ir_frame_from_pandas(irs)
        for _, row in irs.iterrows():
            kv = tuple(row[k] for k in self.keys)
            base_by_key[kv] = {
                p.output_name: _rec_from_prefixed(p, row)
                for p in self.parts
            }
            td = {}
            for p in self.parts:
                col = f"{p.output_name}__tailhops"
                b = row.get(col)
                if b is not None and not (isinstance(b, float)
                                          and np.isnan(b)):
                    td[p.output_name] = pickle.loads(b)
            tails_by_key[kv] = td

        head_by_key: dict[tuple, pd.DataFrame] = {}
        if len(heads):
            # restore declared INTEGER input dtypes: the null-padded union
            # promoted them to float64, and a histogram py_update keyed on
            # str(5.0) would never merge with the checkpoint's "5"
            heads = heads.copy()
            for c in {p.input_column for p in self.parts}:
                if c in heads.columns and c in self.in_schema.names \
                        and pa.types.is_integer(self.in_schema.field(c).type):
                    heads[c] = heads[c].astype("Int64")
            for kv, grp in heads.groupby(self.keys, sort=False,
                                         dropna=False):
                kv = kv if isinstance(kv, tuple) else (kv,)
                head_by_key[kv] = grp.sort_values("ts", kind="stable")

        # dropna=False: null-key query rows must still be emitted (left-
        # outer row preservation — they match nothing, features stay null)
        for kv, grp in queries.groupby(self.keys, sort=False, dropna=False):
            kv = kv if isinstance(kv, tuple) else (kv,)
            base = base_by_key.get(kv, {p.output_name: None
                                        for p in self.parts})
            tails = tails_by_key.get(kv, {})
            hg = head_by_key.get(kv)
            hrows = hg.to_dict("records") if hg is not None else []
            hts = np.array([int(r["ts"]) for r in hrows], dtype=np.int64)
            grp = grp.sort_values("ts", kind="stable")
            for _, qr in grp.iterrows():
                qts = int(qr["ts"])
                cut_n = int(np.searchsorted(hts, qts, side="left"))
                vals = []
                for p in self.parts:
                    op = OPS[p.operation]
                    ir = base[p.output_name]
                    if not p.window.unbounded:
                        hop = tail_hop_millis(p.window)
                        qtail = round_ts(qts - p.window.millis, hop)
                        cut = qts + 1 if self.full_hops \
                            else self.batch_end - p.window.millis \
                            + TAIL_BUFFER_MS
                        for hopstart, hir in tails.get(p.output_name,
                                                       {}).items():
                            if hopstart >= qtail and cut > hopstart:
                                ir = hir if ir is None \
                                    else op.py_merge(ir, hir, p)
                    if cut_n:
                        # py_update MUTATES dict/set/list IRs — the base /
                        # tail-hop IRs are SHARED across this key's queries
                        # and must not absorb one query's head replay
                        ir = op.py_clone(ir, p)
                    for j in range(cut_n):
                        v = hrows[j].get(p.input_column)
                        if v is None or v is pd.NA or (isinstance(v, float)
                                                       and np.isnan(v)):
                            continue
                        ets = int(hrows[j]["ts"])
                        if not p.window.unbounded:
                            hop = tail_hop_millis(p.window)
                            if ets < round_ts(qts - p.window.millis, hop):
                                continue
                        ir = op.py_update(ir, v, ets, p)
                    val = None
                    if ir is not None:
                        if p.operation == Operation.COUNT and ir == 0:
                            val = 0
                        else:
                            val = op.py_finalize(ir, p)
                    vals.append(val)
                for c in self.left_cols:
                    out_cols[c].append(qr[c])
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


def serve_with_events(
    ir_table: ray.data.Dataset,
    head_events: ray.data.Dataset,
    queries: ray.data.Dataset,
    conf: GroupByConf,
    batch_end_ts: int,
    num_partitions: Optional[int] = None,
    full_hops: bool = False,
) -> ray.data.Dataset:
    """Lambda merge: FinalBatchIr checkpoint + head events in
    [batch_end_ts, query ts) → PITC features for queries in
    [batch_end_ts, batch_end_ts + tail buffer). Bit-equal to running
    temporal_join over the full event history (tested).

    ``full_hops=True`` serves a rolling-layout checkpoint (see
    groupby_upload); the 2-day horizon cap is lifted (head events must
    still cover [batch_end_ts, max query ts))."""
    from ..util import auto_partitions, dataset_schema

    keys = list(conf.key_columns)
    parts = conf.parts()
    _check_parts(parts)
    ev_schema = dataset_schema(head_events)
    q_schema = dataset_schema(queries)
    from ..aggregators.row import reject_map_inputs
    reject_map_inputs(parts, ev_schema, "serve_with_events")
    left_cols = list(q_schema.names)
    input_cols = sorted({p.input_column for p in parts})
    if num_partitions is None:
        num_partitions = auto_partitions(head_events)

    ir_schema = dataset_schema(ir_table)

    union_fields: list[pa.Field] = []
    seen: set[str] = set()

    def _addf(f: pa.Field):
        if f.name not in seen:
            seen.add(f.name)
            union_fields.append(f)

    for k in keys:
        _addf(pa.field(k, q_schema.field(k).type))
    _addf(pa.field("ts", pa.int64()))
    for f in ir_schema:
        if f.name not in ("_batch_end_ts", "_full_hops", "_part"):
            _addf(f)
    for c in input_cols:
        _addf(pa.field(c, ev_schema.field(c).type))
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

    # all three tagged branches MUST hash the same key representation —
    # an int32 IR-table key vs an int64 query key would otherwise land in
    # different partitions and silently produce all-null features
    key_types = {k: q_schema.field(k).type for k in keys}

    def tag(kind: int, ts_col: Optional[str], keep: list):
        def f(t: pa.Table) -> pa.Table:
            cols = {k: t[k] for k in keys}
            if ts_col is not None:
                cols["ts"] = pc.cast(t[ts_col], pa.int64())
            for c in keep:
                if c not in cols and c in t.column_names:
                    cols[c] = t[c]
            part = canon_key_hash(t.select(keys), keys, key_types,
                                  num_partitions)
            cols["_part"] = pa.array(part)
            cols["_kind"] = pa.array(np.full(len(t), kind, dtype=np.int8))
            return _pad(pa.table(cols))
        f.__name__ = f"tag{kind}"
        return f

    ir_cols = [f.name for f in ir_schema
               if f.name not in (*keys, "_batch_end_ts", "_full_hops",
                                 "_part")]
    tagged_ir = ir_table.map_batches(tag(0, None, ir_cols),
                                     batch_format="pyarrow")
    tagged_ev = head_events.map_batches(tag(1, "ts", input_cols),
                                        batch_format="pyarrow")
    tagged_q = queries.map_batches(
        tag(2, "ts", [c for c in left_cols if c != "ts"]),
        batch_format="pyarrow")

    proc = _ServePartition(keys, parts, ev_schema, left_cols, batch_end_ts,
                           full_hops=full_hops,
                           left_fields=[q_schema.field(c)
                                        for c in left_cols])
    return tagged_ir.union(tagged_ev).union(tagged_q) \
        .groupby("_part").map_groups(proc, batch_format="pandas")


def roll_checkpoint(
    ir_table: ray.data.Dataset,
    day_events: ray.data.Dataset,
    conf: GroupByConf,
    old_end_ts: int,
    new_end_ts: int,
    num_partitions: Optional[int] = None,
) -> ray.data.Dataset:
    """Advance a FULL-HOPS checkpoint from ``old_end_ts`` to ``new_end_ts``
    using only the events of [old_end_ts, new_end_ts): merge the old
    per-key row with the interval's new hop IRs, dropping hops that slid
    out of each part's window. Daily incremental backfill = one roll +
    one serve per day — O(one day of events), never a history rescan.

    The checkpoint must have been built with ``full_hops=True`` (a
    collapsed+tail-buffer checkpoint cannot un-collapse hops that the new
    window boundary needs separated)."""
    import pyarrow.compute as _pc

    from ..util import auto_partitions, dataset_schema

    if new_end_ts <= old_end_ts:
        raise ValueError("new_end_ts must be > old_end_ts")
    keys = list(conf.key_columns)
    parts = conf.parts()
    _check_parts(parts)
    windowed = [p for p in parts if not p.window.unbounded]
    if num_partitions is None:
        num_partitions = auto_partitions(day_events)

    def day_cut(t: pa.Table) -> pa.Table:
        ts = _pc.cast(t["ts"], pa.int64())
        return t.filter(_pc.and_(_pc.greater_equal(ts, old_end_ts),
                                 _pc.less(ts, new_end_ts)))

    day_cut.__name__ = "day_cut"
    day_ir = groupby_upload(day_events.map_batches(day_cut,
                                                   batch_format="pyarrow"),
                            conf, new_end_ts, num_partitions=num_partitions,
                            full_hops=True)

    schema = dataset_schema(ir_table)
    if "_full_hops" in schema.names:
        # rolling a collapsed checkpoint would merge windowed IRs that can
        # never slide out — fail loudly instead of compounding wrong
        # features day over day
        flag = ir_table.select_columns(["_full_hops"]).limit(1).take(1)
        if flag and not bool(flag[0]["_full_hops"]):
            raise ValueError(
                "roll_checkpoint requires a checkpoint built with "
                "groupby_upload(..., full_hops=True); this one is "
                "collapsed-only")
    agg = RowAggregator(parts, dataset_schema(day_events))

    ir_key_types = {k: dataset_schema(ir_table).field(k).type for k in keys}

    def strip(t: pa.Table) -> pa.Table:
        drop = [c for c in ("_batch_end_ts", "_full_hops", "_part")
                if c in t.column_names]
        t = t.drop(drop)
        # canonicalize so the old-checkpoint and day-IR branches hash
        # identical key representations even if their dtypes differ
        part = canon_key_hash(t.select(keys), keys, ir_key_types,
                              num_partitions)
        return t.append_column("_part", pa.array(part))

    strip.__name__ = "strip_ir"
    unioned = ir_table.map_batches(strip, batch_format="pyarrow") \
        .union(day_ir.map_batches(strip, batch_format="pyarrow"))

    def merge_part(pdf: pd.DataFrame) -> pa.Table:
        codes, kdf = _factorize_keys(pdf, keys)
        irf = agg.ir_frame_from_pandas(pdf)
        irf = irf.drop(columns=[c for c in (*keys, "_part") if c in irf],
                       errors="ignore")
        irf["g"] = codes
        # reindex to every present key: in full-hops mode a key's whole
        # windowed state lives in the tail hops and its collapsed IR
        # columns are all null — merge_frame alone would drop the row
        merged = agg.merge_frame(irf).set_index("g") \
            .reindex(np.unique(codes)).sort_index()
        tails_out: dict[str, list] = {}
        for p in windowed:
            col = f"{p.output_name}__tailhops"
            op = OPS[p.operation]
            floor = round_ts(new_end_ts - p.window.millis,
                             tail_hop_millis(p.window))
            acc: dict[int, dict] = {}
            vals = pdf[col].to_numpy() if col in pdf.columns \
                else np.full(len(pdf), None, dtype=object)
            for i, c in enumerate(codes):
                b = vals[i]
                if b is None or (isinstance(b, float) and np.isnan(b)):
                    continue
                slot = acc.setdefault(int(c), {})
                for hopstart, hir in pickle.loads(b).items():
                    if hopstart < floor:
                        continue
                    prev = slot.get(hopstart)
                    slot[hopstart] = hir if prev is None \
                        else op.py_merge(prev, hir, p)
            tails_out[col] = [
                pickle.dumps(acc[g]) if g in acc else None
                for g in merged.index
            ]
        ir_schema = dataset_schema(ir_table)
        key_arrays = {
            k: pa.array(kdf[k].to_numpy(dtype=object)[merged.index],
                        type=ir_schema.field(k).type)
            for k in keys
        }
        out = agg.ir_frame_to_arrow(merged.reset_index(), key_arrays)
        for col, vals in tails_out.items():
            out = out.append_column(col, pa.array(vals, type=pa.binary()))
        out = out.append_column(
            "_batch_end_ts",
            pa.array(np.full(len(out), new_end_ts, dtype=np.int64)))
        return out.append_column(
            "_full_hops", pa.array(np.full(len(out), True)))

    merge_part.__name__ = "roll_merge"
    return unioned.groupby("_part").map_groups(merge_part,
                                               batch_format="pandas")
