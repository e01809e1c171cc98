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

Bucketed aggregations are rewritten into map-input aggregations over a
synthesized single-entry ``map<string, value>`` column (`_prepare_parts`)
— the checkpoint then carries one map-IR layout per bucketed part, the
same tail-hop machinery applies per map key, and serve finalizes to the
bucketed map output (reference GroupByUpload.scala:65-105 handles all
part shapes uniformly via the same FinalBatchIr).
"""

from __future__ import annotations

import pickle
from dataclasses import replace as _dc_replace
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..aggregators.ops import OPS
from ..aggregators.row import BoundPart, RowAggregator
from ..api import AggregationPart, GroupByConf, Operation
from ..windowing.resolution import round_ts, tail_hop_millis
from .groupby import _factorize_keys, canon_key_hash
from .mutations import TAIL_BUFFER_MS
from .temporal import MapPyOp, VectorPyOp, ir_rec_to_py

_MS_DAY = 86_400_000


def _prepare_parts(conf: GroupByConf, in_schema: pa.Schema):
    """Rewrite bucketed parts into map-input parts over a synthesized
    single-entry map column. Returns (parts, synth, out_names, schema):
    ``synth`` maps synth column name → (bucket_col, value_col); ``out_names``
    is the user-facing output name per part (bucketed parts keep their
    ``*_by_bucket`` name); ``schema`` has the synth map fields appended."""
    from ..aggregators.row import _MAP_OPS

    parts, synth, out_names = [], {}, []
    fields = list(in_schema)
    for p in conf.parts():
        if p.bucket is None:
            parts.append(p)
            out_names.append(p.output_name)
            continue
        if p.operation not in _MAP_OPS:
            # fail BEFORE the map rewrite so the error names the user's
            # bucket, not the internal synthesized map column
            raise NotImplementedError(
                f"bucketed {p.operation.name} over "
                f"{p.input_column!r} (bucket {p.bucket!r}) is not supported "
                "in the upload/serve/mutation paths — bucketed parts ride "
                "the map rewrite, which covers "
                "SUM/COUNT/AVERAGE/VARIANCE/SKEW/KURTOSIS/MIN/MAX/"
                "UNIQUE_COUNT")
        col = f"_bmap__{p.bucket}__{p.input_column}"
        rp = _dc_replace(p, input_column=col, bucket=None)
        out_names.append(p.output_name)
        parts.append(rp)
        if col not in synth:
            synth[col] = (p.bucket, p.input_column)
            vt = in_schema.field(p.input_column).type
            fields.append(pa.field(col, pa.map_(pa.string(), vt)))
    return parts, synth, out_names, pa.schema(fields)


def _add_bucket_maps(synth: dict[str, tuple]):
    """Vectorized map_batches fn appending the synthesized single-entry map
    columns (entry present iff bucket AND value are non-null — matching the
    snapshot pivot's null-bucket drop and the inner op's null-value skip)."""
    def f(t: pa.Table) -> pa.Table:
        for col, (bcol, vcol) in synth.items():
            b, v = t[bcol], t[vcol]
            if isinstance(b, pa.ChunkedArray):
                b = b.combine_chunks()
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            mask = pc.and_(pc.is_valid(b), pc.is_valid(v))
            mnp = mask.to_numpy(zero_copy_only=False)
            offsets = np.zeros(len(t) + 1, dtype=np.int32)
            np.cumsum(mnp, out=offsets[1:])
            keys = pc.cast(b.filter(mask), pa.string())
            items = v.filter(mask)
            marr = pa.MapArray.from_arrays(pa.array(offsets), keys, items)
            t = t.append_column(col, marr)
        return t

    f.__name__ = "add_bucket_maps"
    return f


def _py_op(bp: BoundPart):
    """Scalar-replay op for a bound part: per-map-key / per-element
    dispatch wrappers mirroring the snapshot partial semantics."""
    if bp.is_map:
        return MapPyOp(bp.op)
    if bp.explode:
        return VectorPyOp(bp.op)
    return bp.op


def _invalid(v) -> bool:
    return v is None or v is pd.NA or (isinstance(v, float) and np.isnan(v))


def _py_ir_from_prefixed(bp: BoundPart, row) -> Optional[object]:
    """Prefixed IR frame row → py IR (None when the key never saw a value
    for this part). Map parts rebuild ``{map_key: inner py IR}``."""
    op, name = bp.op, bp.name
    if bp.is_map:
        mkeys = row[f"{name}__mkeys"]
        if _invalid(mkeys):
            return None
        cols = {irc: row[f"{name}__{irc}"] for irc in op.ir_columns()}
        out = {}
        for i, mk in enumerate(list(mkeys)):
            rec = {irc: cols[irc][i] for irc in cols}
            out[str(mk)] = ir_rec_to_py(bp.part, op, rec)
        return out
    first = row[f"{name}__{op.ir_columns()[0]}"]
    if _invalid(first):
        return None
    rec = {irc: row[f"{name}__{irc}"] for irc in op.ir_columns()}
    return ir_rec_to_py(bp.part, op, rec)


def _py_irs_from_frame(bp: BoundPart, subf: pd.DataFrame):
    """Bulk form of ``_py_ir_from_prefixed``: ``(g, py IR)`` pairs for
    every valid row of a prefixed IR frame. Column-extracted — iterrows
    builds a pandas Series per row (~90 µs each and coerces row dtypes);
    this reads each column once and never coerces."""
    op, name = bp.op, bp.name
    g_arr = subf["g"].to_numpy()
    out: list[tuple[int, object]] = []
    if bp.is_map:
        mkeys_arr = subf[f"{name}__mkeys"].to_numpy()
        cols = {irc: subf[f"{name}__{irc}"].to_numpy()
                for irc in op.ir_columns()}
        for i in range(len(subf)):
            mk = mkeys_arr[i]
            if _invalid(mk):
                continue
            d = {}
            for j, k in enumerate(list(mk)):
                rec = {irc: cols[irc][i][j] for irc in cols}
                d[str(k)] = ir_rec_to_py(bp.part, op, rec)
            out.append((int(g_arr[i]), d))
        return out
    ircs = op.ir_columns()
    col_arrs = [subf[f"{name}__{irc}"].to_numpy() for irc in ircs]
    first = col_arrs[0]
    for i in range(len(subf)):
        if _invalid(first[i]):
            continue
        rec = {irc: col_arrs[j][i] for j, irc in enumerate(ircs)}
        out.append((int(g_arr[i]), ir_rec_to_py(bp.part, op, rec)))
    return out


def empty_checkpoint_table(conf: GroupByConf, events_schema: pa.Schema,
                           full_hops: bool = True) -> pa.Table:
    """Zero-row table with the exact schema :func:`groupby_upload` emits —
    the persisted representation of "no events before this boundary"
    (e.g. an incremental-backfill bootstrap window that predates the
    first event day; found by the round-5 fresh-seed chaos sweep).
    ``ir_frame_to_arrow`` types every IR column from its declared Arrow
    field, so this schema is identical to a real checkpoint's."""
    keys = list(conf.key_columns)
    parts, synth, _out, schema = _prepare_parts(conf, events_schema)
    agg = RowAggregator(parts, schema)
    windowed = [bp for bp in agg.bound if not bp.part.window.unbounded]
    irf = agg.partial_frame(schema.empty_table(),
                            np.array([], dtype=np.int64), 0)
    key_arrays = {k: pa.array([], type=schema.field(k).type) for k in keys}
    out = agg.ir_frame_to_arrow(irf, key_arrays)
    for bp in windowed:
        out = out.append_column(f"{bp.name}__tailhops",
                                pa.array([], type=pa.binary()))
    out = out.append_column("_batch_end_ts", pa.array([], type=pa.int64()))
    return out.append_column("_full_hops", pa.array([], type=pa.bool_()))


def groupby_upload(
    events: ray.data.Dataset,
    conf: GroupByConf,
    batch_end_ts: int,
    num_partitions: Optional[int] = None,
    full_hops: bool = False,
    events_schema: Optional[pa.Schema] = None,
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
    # pass events_schema when `events` is a transform over a possibly
    # EMPTY scan (zero-row pipelines report schema None)
    schema = (events_schema if events_schema is not None
              else dataset_schema(events))
    parts, synth, _out_names, schema = _prepare_parts(conf, schema)
    if num_partitions is None:
        num_partitions = auto_partitions(events)
    if synth:
        events = events.map_batches(_add_bucket_maps(synth),
                                    batch_format="pyarrow")
    agg = RowAggregator(parts, schema)
    windowed = [bp for bp in agg.bound if not bp.part.window.unbounded]
    # single-part aggregators for the per-part masked re-partials below:
    # the full agg.partial_frame would recompute EVERY part's IRs per
    # windowed part (O(parts^2) work) just to keep one part's columns
    one_agg = {bp.name: RowAggregator([bp.part], schema) for bp in windowed}

    def partials(tbl: pa.Table) -> pa.Table:
        tbl = tbl.filter(pc.less(pc.cast(tbl["ts"], pa.int64()),
                                 batch_end_ts))
        kdf = tbl.select(keys).to_pandas()
        codes, uniq = _factorize_keys(kdf, keys)
        irf = agg.partial_frame(tbl, codes, len(uniq))
        ts_row = tbl["ts"].to_numpy(zero_copy_only=False).astype(np.int64)
        irf = irf.set_index("g")
        for bp in windowed:
            p, name = bp.part, bp.name
            ircs = agg._map_cols(bp) if bp.is_map \
                else [f"{name}__{c}" for c in agg._ircs(bp)]
            W = p.window.millis
            hop = tail_hop_millis(p.window)
            wstart = round_ts(batch_end_ts - W, hop)
            cut = batch_end_ts + 1 if full_hops \
                else batch_end_ts - W + TAIL_BUFFER_MS
            rel = ts_row >= wstart
            coll = rel & (ts_row >= cut)
            tail = rel & ~coll
            # overwrite this part's full-range IR with the collapsed region
            for irc in ircs:
                irf[irc] = None
            if coll.any():
                sub = tbl.filter(pa.array(coll))
                subf = one_agg[name].partial_frame(
                    sub, codes[coll], len(uniq)).set_index("g")
                for irc in ircs:
                    irf.loc[subf.index, irc] = subf[irc]
            tail_col = pd.Series([None] * len(irf), index=irf.index,
                                 dtype=object)
            if tail.any():
                hs = round_ts(ts_row[tail], hop)
                gt = codes[tail]
                pairs = np.stack([gt, hs], axis=1)
                puniq, pcodes = np.unique(pairs, axis=0, return_inverse=True)
                sub = tbl.filter(pa.array(tail))
                subf = one_agg[name].partial_frame(sub, pcodes, len(puniq))
                per_g: dict[int, dict] = {}
                for gcode, pir in _py_irs_from_frame(bp, subf):
                    gg, hopstart = puniq[gcode]
                    per_g.setdefault(int(gg), {})[int(hopstart)] = pir
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
        for bp in windowed:
            col = f"{bp.name}__tailhops"
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
        for bp in windowed:
            p = bp.part
            col = f"{bp.name}__tailhops"
            wop = _py_op(bp)
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
                        else wop.py_merge(prev, hir, p)
            tails_out[col] = [
                pickle.dumps(acc[g]) if acc.get(g) else None  # {} → None
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
    1 = head events (ts ≥ batch_end), 2 = queries.

    Head replay is LINEAR (the reference's cumulate pattern —
    SawtoothAggregator.scala:124-158): per key and part, head events are
    bucketed by tail hop once, and the ts-sorted query sweep maintains a
    running segment IR inside the query's current hop, merging
    base ∥ in-window checkpoint tail hops ∥ complete head-hop IRs ∥
    segment. O(H + Q·hops_in_window) per key instead of the old O(Q·H)
    per-query replay-from-scratch. Map / bucketed / list parts replay
    through MapPyOp / VectorPyOp wrappers (same dispatch as the snapshot
    partials — reference MapColumnAggregator / VectorDispatcher)."""

    def __init__(self, keys, parts, schema: pa.Schema, left_cols,
                 batch_end_ts: int, full_hops: Optional[bool] = None,
                 left_fields: Optional[list[pa.Field]] = None,
                 out_names: Optional[list[str]] = None):
        self.__name__ = type(self).__name__
        self.keys = list(keys)
        self.left_cols = left_cols
        # declared left schema: the pandas union frame promotes int64→
        # float64 on null-padded columns; outputs must cast back
        self.left_fields = left_fields or []
        self.in_schema = schema
        self.batch_end = batch_end_ts
        self.full_hops = full_hops
        self.agg = RowAggregator(parts, schema)
        self.bound = self.agg.bound
        self.wops = [_py_op(bp) for bp in self.bound]
        names = list(out_names) if out_names \
            else [bp.name for bp in self.bound]
        self.out_fields = []
        for i, bp in enumerate(self.bound):
            t = bp.op.output_arrow_type(bp.in_type, bp.part)
            if bp.is_map:
                t = pa.map_(pa.string(), t)
            self.out_fields.append(pa.field(names[i], t))

    @staticmethod
    def _fin(wop, p: AggregationPart, ir):
        # an empty dict IR (map/bucketed/histogram) means "no mass" in the
        # event-serve path (events never delete) — the direct join emits
        # null there, so serve must too (roll merges can surface {} where
        # a fresh upload has None)
        if ir is None or (isinstance(ir, dict) and not ir):
            return None
        if p.operation == Operation.COUNT and isinstance(ir, int) \
                and ir == 0:
            return 0
        return wop.py_finalize(ir, p)

    def _empty_out(self) -> pa.Table:
        arrays = {c: pa.array([], type=self._left_type(c))
                  for c in self.left_cols}
        arrays.update({f.name: pa.array([], type=f.type)
                       for f in self.out_fields})
        return pa.table(arrays)

    def _resolve_layout(self, pdf: pd.DataFrame,
                        irs: pd.DataFrame) -> Optional[bool]:
        """Resolve the checkpoint layout from this partition's IR rows:
        serving a rolling checkpoint with the collapsed-mode tail cut
        silently drops every hop older than the tail buffer, so an
        explicit flag that contradicts the rows fails loudly. With no IR
        rows in the partition the layout is moot (no tails to trim) —
        fh=None skips the horizon check and the cut is never consulted."""
        table_fh = None
        if len(irs):
            if "_full_hops" in pdf.columns:
                v = irs["_full_hops"].dropna()
                if len(v):
                    table_fh = bool(v.iloc[0])
            if table_fh is None:
                # IR rows present but no layout column: a pre-rolling
                # checkpoint — always collapsed. fh must resolve to False
                # here (None would skip the horizon guard AND take the
                # collapsed cut silently).
                table_fh = False
        if self.full_hops is None:
            return table_fh
        if table_fh is not None and table_fh != self.full_hops:
            raise ValueError(
                f"serve(full_hops={self.full_hops}) "
                f"contradicts the checkpoint layout "
                f"(_full_hops={table_fh}); pass full_hops=None to "
                f"auto-detect")
        return self.full_hops

    def _check_horizon(self, queries: pd.DataFrame,
                       fh: Optional[bool]) -> None:
        qts_all = queries["ts"].astype(np.int64)
        if (qts_all < self.batch_end).any() or (
                fh is False
                and (qts_all >= self.batch_end + TAIL_BUFFER_MS).any()):
            raise ValueError(
                "serve queries must lie in [batch_end_ts, "
                "batch_end_ts + tail buffer) — outside that horizon the "
                "checkpoint's tail hops cannot trim the window (run a new "
                "groupby_upload at a later batch_end_ts)")

    def _load_checkpoint(self, irs: pd.DataFrame):
        base_by_key: dict[tuple, dict] = {}
        tails_by_key: dict[tuple, dict] = {}
        if len(irs):
            # rebuild composite IR columns (items __o/__p pairs, hist maps)
            # that the Arrow round-trip splits
            irs = self.agg.ir_frame_from_pandas(irs)
        for _, row in irs.iterrows():
            kv = tuple(row[k] for k in self.keys)
            base_by_key[kv] = {bp.name: _py_ir_from_prefixed(bp, row)
                               for bp in self.bound}
            td = {}
            for bp in self.bound:
                b = row.get(f"{bp.name}__tailhops")
                if b is not None and not (isinstance(b, float)
                                          and np.isnan(b)):
                    td[bp.name] = pickle.loads(b)
            tails_by_key[kv] = td
        return base_by_key, tails_by_key

    def _group_events(self, heads: pd.DataFrame) -> dict:
        """ts-sorted per-key event frames with declared INTEGER input
        dtypes restored: the null-padded union promoted them to float64,
        and a histogram py_update keyed on str(5.0) would never merge
        with the checkpoint's "5"."""
        head_by_key: dict[tuple, pd.DataFrame] = {}
        if len(heads):
            heads = heads.copy()
            for c in {bp.part.input_column for bp in self.bound}:
                if c in heads.columns and c in self.in_schema.names \
                        and pa.types.is_integer(self.in_schema.field(c).type):
                    heads[c] = heads[c].astype("Int64")
            for kv, grp in heads.groupby(self.keys, sort=False,
                                         dropna=False):
                kv = kv if isinstance(kv, tuple) else (kv,)
                head_by_key[kv] = grp.sort_values("ts", kind="stable")
        return head_by_key

    def __call__(self, pdf: pd.DataFrame) -> pa.Table:
        pdf = pdf.reset_index(drop=True)
        irs = pdf[pdf["_kind"] == 0]
        heads = pdf[pdf["_kind"] == 1]
        queries = pdf[pdf["_kind"] == 2]
        out_cols: dict[str, list] = {c: [] for c in self.left_cols}
        feats: dict[str, list] = {f.name: [] for f in self.out_fields}
        if len(queries) == 0:
            return self._empty_out()
        fh = self._resolve_layout(pdf, irs)
        self._check_horizon(queries, fh)
        base_by_key, tails_by_key = self._load_checkpoint(irs)
        head_by_key = self._group_events(heads)

        # dropna=False: null-key query rows must still be emitted (left-
        # outer row preservation — they match nothing, features stay null)
        for kv, grp in queries.groupby(self.keys, sort=False, dropna=False):
            kv = kv if isinstance(kv, tuple) else (kv,)
            base = base_by_key.get(kv) or {}
            tails = tails_by_key.get(kv, {})
            hg = head_by_key.get(kv)
            grp = grp.sort_values("ts", kind="stable")
            qts_arr = grp["ts"].astype(np.int64).to_numpy()
            nq = len(grp)
            hts = hg["ts"].astype(np.int64).to_numpy() if hg is not None \
                else np.empty(0, dtype=np.int64)
            for c in self.left_cols:
                out_cols[c].extend(grp[c].tolist())
            for pi, bp in enumerate(self.bound):
                p, wop, name = bp.part, self.wops[pi], bp.name
                col_out = feats[self.out_fields[pi].name]
                hvals = hg[p.input_column].tolist() \
                    if hg is not None and p.input_column in hg.columns \
                    else None
                if p.window.unbounded:
                    # running prefix: each head event updates ONCE
                    ir, e = base.get(name), 0
                    for qi in range(nq):
                        qts = int(qts_arr[qi])
                        while e < len(hts) and hts[e] < qts:
                            if hvals is not None:
                                v = hvals[e]
                                if not _invalid(v):
                                    ir = wop.py_update(ir, v, int(hts[e]), p)
                            e += 1
                        col_out.append(self._fin(wop, p, ir))
                    continue
                W = p.window.millis
                hop = tail_hop_millis(p.window)
                ptails = sorted(tails.get(name, {}).items())
                if len(hts):
                    hop_ids = round_ts(hts, hop)
                    bnd = np.flatnonzero(np.diff(hop_ids)) + 1
                    bstarts = np.concatenate([[0], bnd]).astype(np.int64)
                    bends = np.concatenate([bnd, [len(hts)]]).astype(np.int64)
                    bhops = hop_ids[bstarts]
                else:
                    bstarts = bends = bhops = np.empty(0, dtype=np.int64)
                bucket_irs: list = [False] * len(bhops)  # False = unbuilt
                seg_hop, seg_ir, seg_ptr, seg_end = None, None, 0, 0
                for qi in range(nq):
                    qts = int(qts_arr[qi])
                    qtail = round_ts(qts - W, hop)
                    qhop = round_ts(qts, hop)
                    cut = qts + 1 if fh \
                        else self.batch_end - W + TAIL_BUFFER_MS
                    acc = base.get(name)
                    for hopstart, hir in ptails:
                        if hopstart >= qtail and hopstart < cut:
                            acc = hir if acc is None \
                                else wop.py_merge(acc, hir, p)
                    if len(bhops) and hvals is not None:
                        lo = int(np.searchsorted(bhops, qtail, side="left"))
                        hi = int(np.searchsorted(bhops, qhop, side="left"))
                        for bi in range(lo, hi):
                            if bucket_irs[bi] is False:
                                bir = None
                                for j in range(int(bstarts[bi]),
                                               int(bends[bi])):
                                    v = hvals[j]
                                    if not _invalid(v):
                                        bir = wop.py_update(
                                            bir, v, int(hts[j]), p)
                                bucket_irs[bi] = bir
                            bir = bucket_irs[bi]
                            if bir is not None:
                                acc = bir if acc is None \
                                    else wop.py_merge(acc, bir, p)
                        # running segment inside the query's current hop —
                        # resets when the sweep crosses a hop boundary, so
                        # each head event updates at most once per part
                        if hi < len(bhops) and bhops[hi] == qhop:
                            if seg_hop != qhop:
                                seg_hop, seg_ir = qhop, None
                                seg_ptr = int(bstarts[hi])
                                seg_end = int(bends[hi])
                            while seg_ptr < seg_end and hts[seg_ptr] < qts:
                                v = hvals[seg_ptr]
                                if not _invalid(v):
                                    seg_ir = wop.py_update(
                                        seg_ir, v, int(hts[seg_ptr]), p)
                                seg_ptr += 1
                            if seg_ir is not None:
                                acc = seg_ir if acc is None \
                                    else wop.py_merge(acc, seg_ir, p)
                    col_out.append(self._fin(wop, p, acc))

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
    full_hops: Optional[bool] = None,
) -> ray.data.Dataset:
    """Lambda merge: FinalBatchIr checkpoint + head events in
    [batch_end_ts, query ts) → PITC features for queries in
    [batch_end_ts, batch_end_ts + tail buffer). Bit-equal to running
    temporal_join over the full event history (tested).

    ``full_hops`` selects the checkpoint layout: rolling (full-hops) lifts
    the 2-day horizon cap (head events must still cover [batch_end_ts,
    max query ts)). Default None AUTO-DETECTS from the checkpoint's
    ``_full_hops`` column — serving a rolling checkpoint with the
    collapsed-mode tail cut would silently drop every hop older than the
    tail buffer, so an explicit flag that contradicts the checkpoint
    fails loudly instead."""
    from ..util import auto_partitions, dataset_schema

    keys = list(conf.key_columns)
    ev_schema = dataset_schema(head_events)
    q_schema = dataset_schema(queries)
    # full_hops=None auto-detects INSIDE each partition from the tagged IR
    # rows' _full_hops column — a driver-side take(1) here would execute
    # the (lazy, uncached) checkpoint pipeline a second time
    if num_partitions is None:
        num_partitions = auto_partitions(head_events)
    parts, synth, out_names, ev_schema = _prepare_parts(conf, ev_schema)
    if synth:
        head_events = head_events.map_batches(_add_bucket_maps(synth),
                                              batch_format="pyarrow")
    left_cols = list(q_schema.names)
    input_cols = sorted({p.input_column for p in parts})

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
        if f.name not in ("_batch_end_ts", "_part"):
            _addf(f)  # _full_hops rides along for in-partition detection
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
               if f.name not in (*keys, "_batch_end_ts", "_part")]
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
                                        for c in left_cols],
                           out_names=out_names)
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
    if num_partitions is None:
        num_partitions = auto_partitions(day_events)
    d_schema = dataset_schema(day_events)
    parts, _synth, _names, d_schema = _prepare_parts(conf, d_schema)

    def day_cut(t: pa.Table) -> pa.Table:
        ts = _pc.cast(t["ts"], pa.int64())
        return t.filter(_pc.and_(_pc.greater_equal(ts, old_end_ts),
                                 _pc.less(ts, new_end_ts)))

    day_cut.__name__ = "day_cut"
    day_ir = groupby_upload(day_events.map_batches(day_cut,
                                                   batch_format="pyarrow"),
                            conf, new_end_ts, num_partitions=num_partitions,
                            full_hops=True,
                            events_schema=dataset_schema(day_events))

    # materialize once: the flag take(1) below and the strip/union consumer
    # would otherwise each execute a lazy checkpoint pipeline (in the
    # day-over-day rolling loop that is the whole previous day's roll)
    _stash = getattr(ir_table, "_chronon_schema", None)
    ir_table = ir_table.materialize()
    if _stash is not None \
            and getattr(ir_table, "_chronon_schema", None) is None:
        # a ZERO-ROW checkpoint materializes to empty blocks with unknown
        # schema — carry the reader's stashed schema across
        ir_table._chronon_schema = _stash
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
    agg = RowAggregator(parts, d_schema)
    windowed = [bp for bp in agg.bound if not bp.part.window.unbounded]

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
        for bp in windowed:
            p = bp.part
            col = f"{bp.name}__tailhops"
            wop = _py_op(bp)
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
                        else wop.py_merge(prev, hir, p)
            tails_out[col] = [
                pickle.dumps(acc[g]) if acc.get(g) else None  # {} → None
                for g in merged.index
            ]
        # ir_key_types is captured from the DRIVER-computed schema — a
        # dataset_schema(ir_table) here would smuggle the driver Dataset
        # handle into the worker UDF and re-execute a schema pipeline per
        # group call (and crash outright on a zero-row checkpoint)
        key_arrays = {
            k: pa.array(kdf[k].to_numpy(dtype=object)[merged.index],
                        type=ir_key_types[k])
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
