"""Columnar RowAggregator: binds AggregationParts to batch columns.

Re-expression of the reference's ColumnAggregator dispatch + RowAggregator
(reference: aggregator/row/ColumnAggregator.scala:80-167, 220-417 — null
guard, type upcasting, list auto-explode "VectorDispatcher";
aggregator/row/RowAggregator.scala:27-172 — flat IR row over all parts) in a
vectorized layout: one pandas/Arrow **IR frame** with a group-code column `g`
and one IR column per (part × ir-slot), produced/merged/finalized whole-batch.

IR frames round-trip losslessly through Arrow (the normalize/denormalize
contract, RowAggregator.scala:126-148): tuple-lists become parallel
`__o`/`__p` list columns, dict histograms become Arrow maps, sketches are
binary.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..api import AggregationPart, Operation
from .ops import OPS, AggOp, _upcast_numeric

_K_LIST_OPS = {Operation.FIRST_K, Operation.LAST_K, Operation.TOP_K, Operation.BOTTOM_K}

#: ops supported over map<string, scalar> inputs (per-map-key dispatch —
#: reference aggregator/row/MapColumnAggregator.scala:1-75; the reference
#: wires maps through every SimpleAggregator, this engine starts with the
#: scalar-IR family + exact distinct)
_MAP_OPS = {
    Operation.SUM, Operation.COUNT, Operation.AVERAGE,
    Operation.VARIANCE, Operation.SKEW, Operation.KURTOSIS,
    Operation.MIN, Operation.MAX, Operation.UNIQUE_COUNT,
}


@dataclass
class BoundPart:
    part: AggregationPart
    op: AggOp
    name: str  # output column name
    in_type: pa.DataType  # element type after auto-explode
    explode: bool  # list input to a scalar op → per-element updates
    is_map: bool = False  # map input → per-map-key aggregation, map output

    @property
    def ir_names(self) -> list[str]:
        return [f"{self.name}__{c}" for c in self.op.ir_columns()]



class RowAggregator:
    def __init__(
        self,
        parts: list[AggregationPart],
        input_schema: pa.Schema,
        tie_break_column: Optional[str] = None,
        time_column: str = "ts",
    ):
        self.time_column = time_column
        self.tie_break_column = tie_break_column
        # FIRST/LAST IRs carry (ts, tb) ACROSS the IR shuffle when a
        # tie-break column is configured — a ts-only cross-block merge
        # would resolve equal-ts collisions by block order, not by tb
        self._tb_extend = bool(
            tie_break_column and tie_break_column in input_schema.names)
        self._tb_type = (input_schema.field(tie_break_column).type
                         if self._tb_extend else pa.float64())
        self.bound: list[BoundPart] = []
        for p in parts:
            if p.bucket is not None:
                raise ValueError(
                    "bucketed parts are handled by the pipeline layer (separate "
                    "groupby on keys+bucket, pivoted to a map column)"
                )
            field = input_schema.field(p.input_column)
            in_type = field.type
            explode = False
            is_map = False
            # map input → per-map-key dispatch producing a map output
            # (reference MapColumnAggregator.scala:29-75, dispatch at
            # ColumnAggregator.scala:178-190; bucketing over maps is
            # unsupported there too — :188)
            if pa.types.is_map(in_type):
                if p.operation not in _MAP_OPS:
                    raise NotImplementedError(
                        f"{p.operation.name} over a map input column is not "
                        "supported (map-key dispatch covers "
                        "SUM/COUNT/AVERAGE/VARIANCE/SKEW/KURTOSIS/MIN/MAX/"
                        "UNIQUE_COUNT)")
                if not (pa.types.is_string(in_type.key_type)
                        or pa.types.is_large_string(in_type.key_type)):
                    raise NotImplementedError(
                        "map aggregation requires string map keys "
                        f"(got {in_type.key_type})")
                in_type = in_type.item_type
                is_map = True
            # auto-explode: list input to a scalar-only op → element-wise updates
            # (reference ColumnAggregator.scala:80-117 VectorDispatcher)
            elif (pa.types.is_list(in_type) or pa.types.is_large_list(in_type)) and p.operation in (
                Operation.SUM,
                Operation.COUNT,
                Operation.AVERAGE,
                Operation.VARIANCE,
                Operation.SKEW,
                Operation.KURTOSIS,
                Operation.MIN,
                Operation.MAX,
                Operation.UNIQUE_COUNT,
                Operation.APPROX_UNIQUE_COUNT,
                Operation.APPROX_PERCENTILE,
                Operation.HISTOGRAM,
                Operation.APPROX_HISTOGRAM_K,
                Operation.TOP_K,
                Operation.BOTTOM_K,
            ):
                in_type = in_type.value_type
                explode = True
            self.bound.append(BoundPart(p, OPS[p.operation], p.output_name,
                                        in_type, explode, is_map))

    # ------------------------------------------------------------ schemas

    def _ircs(self, bp: BoundPart) -> list[str]:
        """IR slots for one part — FIRST/LAST gain a 'tb' slot when a
        tie-break column is configured so equal-ts winners are stable
        across the IR shuffle."""
        cols = bp.op.ir_columns()
        if self._tb_extend and bp.part.operation in (Operation.FIRST,
                                                     Operation.LAST):
            cols = [*cols, "tb"]
        return cols

    def ir_fields(self) -> list[pa.Field]:
        fields: list[pa.Field] = []
        for bp in self.bound:
            if bp.is_map:
                # per-map-key IRs serialize as parallel list columns:
                # one mkeys list + one list per IR slot, aligned by position
                fields.append(pa.field(f"{bp.name}__mkeys",
                                       pa.list_(pa.string())))
                for irc in bp.op.ir_columns():
                    full = f"{bp.name}__{irc}"
                    elem = self._ir_arrow_fields(bp, irc, full)[0]
                    fields.append(pa.field(full, pa.list_(elem.type)))
                continue
            for irc in self._ircs(bp):
                full = f"{bp.name}__{irc}"
                fields.extend(self._ir_arrow_fields(bp, irc, full))
        return fields

    def _ir_arrow_fields(self, bp: BoundPart, irc: str, full: str) -> list[pa.Field]:
        t = bp.in_type
        if irc == "s":
            return [pa.field(full, pa.float64())]
        if irc == "n":
            return [pa.field(full, pa.float64())]  # nullable partial counts
        if irc in ("m1", "m2", "m3", "m4"):
            return [pa.field(full, pa.float64())]
        if irc == "x":
            return [pa.field(full, t)]
        if irc == "ts":
            return [pa.field(full, pa.float64())]
        if irc == "tb":
            return [pa.field(full, self._tb_type)]
        if irc == "payload":
            return [pa.field(full, t)]
        if irc == "items":
            o_t = pa.int64() if bp.part.operation in (Operation.FIRST_K, Operation.LAST_K) else t
            return [pa.field(f"{full}__o", pa.list_(o_t)), pa.field(f"{full}__p", pa.list_(t))]
        if irc == "uniq":
            return [pa.field(full, pa.list_(t))]
        if irc == "sketch":
            return [pa.field(full, pa.binary())]
        if irc == "hist":
            return [pa.field(full, pa.map_(pa.string(), pa.int64()))]
        raise KeyError(irc)

    def output_fields(self) -> list[pa.Field]:
        out = []
        for bp in self.bound:
            t = bp.op.output_arrow_type(bp.in_type, bp.part)
            if bp.is_map:
                t = pa.map_(pa.string(), t)
            out.append(pa.field(bp.name, t))
        return out

    # ------------------------------------------------------------ partial

    def _extract(self, tbl: pa.Table, codes: np.ndarray, bp: BoundPart):
        """Return df with columns g, v [, ts, tb] for non-null rows of this
        part's input column, with list auto-explode applied."""
        col = tbl[bp.part.input_column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        ts = tb = None
        if bp.op.needs_ts:
            ts = tbl[self.time_column].to_numpy(zero_copy_only=False).astype(np.int64)
            if self.tie_break_column and self.tie_break_column in tbl.column_names:
                tb = tbl[self.tie_break_column].to_numpy(zero_copy_only=False)
        if bp.explode:
            lengths = pc.list_value_length(col)
            lengths = pc.fill_null(lengths, 0).to_numpy(zero_copy_only=False).astype(np.int64)
            lengths = np.where(valid, lengths, 0)
            flat = pc.list_flatten(col)
            # inner nulls on an integer list would promote the whole numpy
            # conversion to float64 ('5' vs '5.0' key split in HISTOGRAM-
            # family stringification); placeholder-fill first — the rows are
            # dropped below via inner_valid anyway
            inner_valid = pc.is_valid(flat).to_numpy(zero_copy_only=False)
            if pa.types.is_integer(flat.type) and flat.null_count:
                flat = pc.fill_null(flat, 0)
            v = flat.to_numpy(zero_copy_only=False)
            g = np.repeat(codes, lengths)
            df = pd.DataFrame({"g": g, "v": v})
            if ts is not None:
                df["ts"] = np.repeat(ts, lengths)
                if tb is not None:
                    df["tb"] = np.repeat(tb, lengths)
            # element-level nulls inside lists are dropped too
            if not inner_valid.all():
                df = df[inner_valid]
            return df
        if pa.types.is_list(bp.in_type) or pa.types.is_large_list(bp.in_type) or pa.types.is_struct(
            bp.in_type
        ):
            v = col.to_pandas()  # object series of arrays — payload carried opaquely
        elif pa.types.is_integer(bp.in_type) and col.null_count:
            # keep the declared integer dtype: nulls would promote to_numpy
            # to float64, splitting HISTOGRAM-family keys ('5' vs '5.0');
            # the filled rows are invalid and dropped below
            v = pc.fill_null(col, 0).to_numpy(zero_copy_only=False)
        else:
            v = col.to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"g": codes})
        df["v"] = v
        if ts is not None:
            df["ts"] = ts
            if tb is not None:
                df["tb"] = tb
        if not valid.all():
            df = df[valid]
        return df

    def partial_frame(self, tbl: pa.Table, codes: np.ndarray, n_groups: int) -> pd.DataFrame:
        present = np.unique(codes)
        out = pd.DataFrame(index=pd.Index(present, name="g"))
        map_cache: dict = {}  # per input column: one flatten+factorize
        for bp in self.bound:
            if bp.is_map:
                series = self._partial_map(tbl, codes, bp, map_cache)
                for c in self._map_cols(bp):
                    out[c] = series[c] if series is not None else None
                continue
            df = self._extract(tbl, codes, bp)
            if len(df) == 0:
                for irc in self._ircs(bp):
                    out[f"{bp.name}__{irc}"] = None
                continue
            res = bp.op.partial(df, n_groups, bp.part).set_index("g")
            for irc in self._ircs(bp):
                out[f"{bp.name}__{irc}"] = res[irc]
        return out.reset_index()

    # ------------------------------------------------- map-input dispatch

    def _map_cols(self, bp: BoundPart) -> list[str]:
        return [f"{bp.name}__mkeys"] + bp.ir_names

    @staticmethod
    def _subgroup(g: np.ndarray, mk: np.ndarray):
        """Composite (group, map-key) codes. Returns (pcodes, parents, mks)
        where subgroup i has parent group parents[i] and map key mks[i],
        ordered by (parent, key code)."""
        kcodes, kuniq = pd.factorize(pd.Series(mk))
        pairs = np.stack([g, kcodes], axis=1)
        puniq, pcodes = np.unique(pairs, axis=0, return_inverse=True)
        return (pcodes.astype(np.int64), puniq[:, 0],
                kuniq.to_numpy(dtype=object)[puniq[:, 1]])

    @staticmethod
    def _regroup_lists(parents: np.ndarray, arrays: dict[str, np.ndarray]):
        """Split subgroup-aligned arrays into per-parent lists. parents is
        non-decreasing. Returns dict of pd.Series indexed by parent code."""
        bounds = np.flatnonzero(np.diff(parents)) + 1
        pvals = parents[np.concatenate([[0], bounds])]
        out = {}
        for name, vals in arrays.items():
            out[name] = pd.Series([list(x) for x in np.split(vals, bounds)],
                                  index=pvals, dtype=object)
        return out

    def _decompose_map(self, tbl: pa.Table, codes: np.ndarray,
                       bp: BoundPart):
        """Flatten + composite-factorize one map column once; multiple
        parts over the same column share the result."""
        col = tbl[bp.part.input_column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # zero-copy view as list<struct<key,value>> — map arrays lack
        # list_* kernels in pyarrow 16
        col = col.cast(pa.list_(pa.struct([
            pa.field("key", col.type.key_type, nullable=False),
            pa.field("value", col.type.item_type)])))
        lengths = pc.fill_null(pc.list_value_length(col), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        entries = pc.list_flatten(col)  # struct<key,value>; null rows skipped
        mk = entries.field(0).to_numpy(zero_copy_only=False)
        mv_arr = entries.field(1)
        g_sub = np.repeat(codes, lengths)
        # null map VALUES are skipped (reference mapIterator filters
        # _.getValue != null)
        item_valid = pc.is_valid(mv_arr).to_numpy(zero_copy_only=False)
        mv = mv_arr.to_numpy(zero_copy_only=False)
        if not item_valid.all():
            g_sub, mk, mv = g_sub[item_valid], mk[item_valid], mv[item_valid]
        if len(g_sub) == 0:
            return None
        pcodes, parents, mks = self._subgroup(g_sub, mk)
        return pcodes, parents, mks, mv

    def _partial_map(self, tbl: pa.Table, codes: np.ndarray, bp: BoundPart,
                     cache: Optional[dict] = None
                     ) -> Optional[dict[str, pd.Series]]:
        """Map column → per-(group, map-key) partial IRs, reassembled as
        per-group parallel lists (mkeys + one list per IR slot). This is the
        vectorized analog of the reference's per-entry guardedApply
        (MapColumnAggregator.scala:47-71)."""
        ckey = bp.part.input_column
        if cache is not None and ckey in cache:
            dec = cache[ckey]
        else:
            dec = self._decompose_map(tbl, codes, bp)
            if cache is not None:
                cache[ckey] = dec
        if dec is None:
            return None
        pcodes, parents, mks, mv = dec
        res = bp.op.partial(pd.DataFrame({"g": pcodes, "v": mv}),
                            len(parents), bp.part)
        res = res.sort_values("g", ignore_index=True)
        sel = res["g"].to_numpy()
        arrays = {f"{bp.name}__mkeys": mks[sel]}
        for irc in bp.op.ir_columns():
            arrays[f"{bp.name}__{irc}"] = res[irc].to_numpy(dtype=object)
        return self._regroup_lists(parents[sel], arrays)

    def _explode_map_rows(self, df: pd.DataFrame, bp: BoundPart):
        """Rows holding per-group parallel lists → flat (g, mk, {irc: flat}).
        Returns None when no row has map state."""
        mcol = f"{bp.name}__mkeys"
        present = df[mcol].map(
            lambda v: v is not None
            and not (isinstance(v, float) and np.isnan(v)))
        sub = df[present.to_numpy(dtype=bool)]
        if len(sub) == 0:
            return None
        lens = sub[mcol].map(len).to_numpy(dtype=np.int64)
        g_rep = np.repeat(sub["g"].to_numpy(), lens)
        mk_flat = np.concatenate(
            [np.asarray(_aslist(v), dtype=object) for v in sub[mcol]])
        flats = {}
        for irc in bp.op.ir_columns():
            s = pd.Series(
                [x for lst in sub[f"{bp.name}__{irc}"]
                 for x in _aslist(lst)], dtype=object)
            # numeric IR slots must be numeric for the vectorized merges
            # (bincount etc.); list-valued slots (uniq) stay object
            flats[irc] = s.infer_objects()
        return g_rep, mk_flat, flats

    def _merge_map(self, df: pd.DataFrame, bp: BoundPart):
        """Multiple IR rows per g → one merged row of per-group lists."""
        ex = self._explode_map_rows(df, bp)
        if ex is None:
            return {c: pd.Series(dtype=object) for c in self._map_cols(bp)}
        g_rep, mk_flat, flats = ex
        pcodes, parents, mks = self._subgroup(g_rep, mk_flat)
        merged = bp.op.merge(pd.DataFrame({"g": pcodes, **flats}), bp.part) \
            .sort_values("g", ignore_index=True)
        sel = merged["g"].to_numpy()
        arrays = {f"{bp.name}__mkeys": mks[sel]}
        for irc in bp.op.ir_columns():
            arrays[f"{bp.name}__{irc}"] = merged[irc].to_numpy(dtype=object)
        return self._regroup_lists(parents[sel], arrays)

    def _finalize_map(self, df: pd.DataFrame, bp: BoundPart) -> pd.Series:
        """One IR row per g → map output values (sorted entry tuples)."""
        vals = pd.Series([None] * len(df), index=df.index, dtype=object)
        ex = self._explode_map_rows(df.assign(g=np.arange(len(df))), bp)
        if ex is None:
            return vals
        row_rep, mk_flat, flats = ex
        fin = bp.op.finalize(
            pd.DataFrame(flats).reset_index(drop=True), bp.part)
        fin = pd.Series(fin).to_numpy(dtype=object)
        bounds = np.flatnonzero(np.diff(row_rep)) + 1
        rows = row_rep[np.concatenate([[0], bounds])]
        mk_seg = np.split(mk_flat, bounds)
        fin_seg = np.split(fin, bounds)
        for r, mkv, fv in zip(rows, mk_seg, fin_seg):
            vals.iloc[int(r)] = sorted(zip(mkv.tolist(), fv.tolist()),
                                       key=lambda t: t[0])
        return vals

    # ------------------------------------------------------------- merge

    def merge_frame(self, df: pd.DataFrame) -> pd.DataFrame:
        """df: 'g' + prefixed IR columns, multiple rows per g → one per g."""
        pieces = []
        for bp in self.bound:
            if bp.is_map:
                series = self._merge_map(df, bp)
                piece = pd.DataFrame(series)
                piece.index.name = "g"
                pieces.append(piece)
                continue
            cols = {f"{bp.name}__{irc}": irc for irc in self._ircs(bp)}
            sub = df[["g", *cols]].rename(columns=cols)
            first_ir = bp.op.ir_columns()[0]
            sub = sub[sub[first_ir].notna()]
            if len(sub) == 0:
                merged = pd.DataFrame({"g": np.array([], dtype=np.int64), **{c: [] for c in cols.values()}})
            else:
                merged = bp.op.merge(sub, bp.part)
            merged = merged.set_index("g").rename(columns={v: k for k, v in cols.items()})
            pieces.append(merged)
        out = pd.concat(pieces, axis=1)
        out.index.name = "g"
        return out.reset_index()

    # ----------------------------------------------------------- finalize

    def finalize_frame(self, df: pd.DataFrame) -> pd.DataFrame:
        """df: one row per g with prefixed IR columns → output columns."""
        out = pd.DataFrame({"g": df["g"].to_numpy()})
        for bp in self.bound:
            if bp.is_map:
                out[bp.name] = self._finalize_map(
                    df.reset_index(drop=True), bp).to_numpy(dtype=object)
                continue
            cols = {f"{bp.name}__{irc}": irc for irc in self._ircs(bp)}
            sub = df[list(cols)].rename(columns=cols)
            first_ir = bp.op.ir_columns()[0]
            mask = sub[first_ir].notna()
            vals = pd.Series([None] * len(df), index=df.index, dtype=object)
            if mask.any():
                fin = bp.op.finalize(sub[mask], bp.part)
                vals[mask] = pd.Series(fin).to_numpy(dtype=object)
            out[bp.name] = vals
        return out

    # ------------------------------------------------- arrow round-trip

    def ir_frame_to_arrow(self, df: pd.DataFrame, key_arrays: dict[str, pa.Array]) -> pa.Table:
        """Serialize an IR frame (+ key columns) to Arrow for the shuffle."""
        arrays: dict[str, pa.Array] = dict(key_arrays)
        for bp in self.bound:
            if bp.is_map:
                def _isnull(v):
                    return v is None or (isinstance(v, float)
                                         and np.isnan(v))

                mcol = f"{bp.name}__mkeys"
                arrays[mcol] = pa.array(
                    [None if _isnull(v) else [str(x) for x in _aslist(v)]
                     for v in df[mcol]], type=pa.list_(pa.string()))
                for irc in bp.op.ir_columns():
                    full = f"{bp.name}__{irc}"
                    elem = self._ir_arrow_fields(bp, irc, full)[0]
                    nested = irc == "uniq"
                    arrays[full] = pa.array(
                        [None if _isnull(v)
                         else ([_aslist(x) for x in _aslist(v)] if nested
                               else [_np_to_py(x) for x in _aslist(v)])
                         for v in df[full]], type=pa.list_(elem.type))
                continue
            for irc in self._ircs(bp):
                full = f"{bp.name}__{irc}"
                fields = self._ir_arrow_fields(bp, irc, full)
                if irc == "items":
                    def _isnull(v):
                        return v is None or (isinstance(v, float)
                                             and np.isnan(v))
                    col = df[full]
                    o_vals = col.map(lambda lst: None if _isnull(lst)
                                     else [t[0] for t in lst])
                    p_vals = col.map(lambda lst: None if _isnull(lst)
                                     else [t[1] for t in lst])
                    arrays[fields[0].name] = pa.array(o_vals.tolist(), type=fields[0].type)
                    arrays[fields[1].name] = pa.array(p_vals.tolist(), type=fields[1].type)
                elif irc == "hist":
                    # str keys: the IR map is map<string,int64>; int-valued
                    # histogram inputs count under their string form
                    # (reference outputs Map[String, Long]). Groups whose
                    # inputs were all null carry a NaN IR — a float NaN is
                    # NOT a recognized Arrow null for a map type, so map it
                    # to None explicitly (same guard as the uniq branch).
                    col = df[full].map(
                        lambda d: sorted((str(k), v) for k, v in d.items())
                        if isinstance(d, dict)
                        else (None if d is None
                              or (isinstance(d, float) and np.isnan(d))
                              else d)
                    )
                    arrays[full] = pa.array(col.tolist(), type=fields[0].type)
                elif irc == "uniq":
                    arrays[full] = pa.array(
                        [None if v is None
                         or (isinstance(v, float) and np.isnan(v))
                         else list(v) for v in df[full]],
                        type=fields[0].type
                    )
                elif irc == "payload" or irc == "x":
                    arrays[full] = pa.array(
                        [None if v is None or (isinstance(v, float) and np.isnan(v)) else v
                         for v in df[full].map(_np_to_py)],
                        type=fields[0].type,
                    )
                else:
                    arrays[full] = pa.array(df[full].astype(object).where(df[full].notna(), None),
                                            type=fields[0].type)
        return pa.table(arrays)

    def ir_frame_from_pandas(self, pdf: pd.DataFrame) -> pd.DataFrame:
        """Normalize an IR frame that came back from Arrow via pandas:
        rebuild tuple-lists from parallel __o/__p columns; map→dict."""
        out = pdf.copy()
        for bp in self.bound:
            for irc in self._ircs(bp):
                full = f"{bp.name}__{irc}"
                if irc == "items":
                    o, p = out[f"{full}__o"], out[f"{full}__p"]
                    out[full] = [
                        None if ov is None or (isinstance(ov, float) and np.isnan(ov))
                        else list(zip(_aslist(ov), _aslist(pv)))
                        for ov, pv in zip(o, p)
                    ]
                    out = out.drop(columns=[f"{full}__o", f"{full}__p"])
                elif irc == "hist":
                    out[full] = out[full].map(
                        lambda v: dict(v) if isinstance(v, (list, np.ndarray)) else v
                    )
        return out


def _np_to_py(v):
    if isinstance(v, np.ndarray):
        return v.tolist()
    return v


def _aslist(v):
    if isinstance(v, np.ndarray):
        return v.tolist()
    return list(v)
