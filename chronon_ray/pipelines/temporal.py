"""Point-in-time-correct temporal as-of join (the flagship pipeline).

Semantics parity with the reference's temporalEvents path (reference:
spark/GroupBy.scala:278-357; oracle SQL in spark/test/JoinTest.scala:566-582:
``AGG(IF(q.ts > e.ts AND e.ts >= round(q.ts - W, hop), v, NULL)) GROUP BY
key, q.ts``): for every left row (key, ts) and every AggregationPart, the
aggregate over events with ``hop_round(q.ts − W) ≤ e.ts < q.ts`` (strict
head, hop-rounded tail per Resolution policy; unbounded → all ``e.ts <
q.ts``).

Physical plan (canonical, SURVEY.md §7.1 — replaces the reference's Spark
groupByKey+leftOuterJoin chain with one co-partitioned pass):

1. queries and events are tagged, schema-aligned, unioned;
2. one hash shuffle on ``_part = hash(entity_key) % P`` co-locates every
   key's queries and events (groupby("_part"));
3. each partition is processed as a whole, **vectorized across keys**:
   events sorted by (key, ts, tie_break) once; per-query window boundaries
   found with a single composite searchsorted (key-code × relative-ts
   encoding); then per aggregation family:

   - prefix family (SUM/COUNT/AVERAGE/VARIANCE/SKEW/KURTOSIS, incl. list
     auto-explode): running power-sum prefixes, feature = prefix[head] −
     prefix[tail] — O(E + Q) per partition, no python loop;
   - slice family (FIRST/LAST/FIRST_K/LAST_K): non-null event positions +
     searchsorted → direct index arithmetic; payloads (e.g. token arrays)
     are gathered with Arrow ``take`` — zero-copy, bit-exact;
   - sawtooth family (UNIQUE_COUNT/APPROX_*/HISTOGRAM/TOP_K/BOTTOM_K/MIN/
     MAX and all bucketed parts): per-key hop-tiled two-stack engine
     (windowing/sawtooth.py) with hop-IR caching across windows.

No stage materializes the dataset; the output streams out of the groupby.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Any, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..api import AggregationPart, GroupByConf, Operation, Window
from ..aggregators.ops import OPS, AggOp
from ..windowing.resolution import tail_hop_millis, window_tail
from ..windowing.sawtooth import sawtooth_one_key
from .groupby import canon_key_table as _canon_key_table
from .groupby import stable_key_hash

DEFAULT_NUM_PARTITIONS = 200

_PREFIX_OPS = {Operation.SUM, Operation.COUNT, Operation.AVERAGE, Operation.VARIANCE,
               Operation.SKEW, Operation.KURTOSIS}
_SLICE_OPS = {Operation.FIRST, Operation.LAST, Operation.FIRST_K, Operation.LAST_K}
#: sawtooth-family ops that auto-explode list inputs to per-element updates
#: (reference VectorDispatcher, ColumnAggregator.scala:80-117); the prefix
#: family explodes separately via its vectorized moments path
_SAW_EXPLODE_OPS = {Operation.MIN, Operation.MAX, Operation.UNIQUE_COUNT,
                    Operation.APPROX_UNIQUE_COUNT,
                    Operation.APPROX_PERCENTILE, Operation.HISTOGRAM,
                    Operation.APPROX_HISTOGRAM_K,
                    Operation.TOP_K, Operation.BOTTOM_K}
_MOMENTS_NEEDED = {Operation.COUNT: 0, Operation.SUM: 1, Operation.AVERAGE: 1,
                   Operation.VARIANCE: 2, Operation.SKEW: 3, Operation.KURTOSIS: 4}


class BucketedPyOp(AggOp):
    """Scalar-path adapter: IR = {bucket: inner IR}; values are (bucket, v)
    pairs. Mirrors BucketedColumnAggregator's map output (reference:
    aggregator/row/BucketedColumnAggregator.scala:1-94)."""

    def __init__(self, inner: AggOp):
        self.inner = inner
        self.needs_ts = inner.needs_ts

    def py_update(self, ir, v, ts, part):
        bucket, value = v
        if ir is None:
            ir = {}
        ir[bucket] = self.inner.py_update(ir.get(bucket), value, ts, part)
        return ir

    def py_merge(self, a, b, part):
        if a is None:
            return b
        if b is None:
            return a
        out = dict(a)
        for k, v in b.items():
            out[k] = self.inner.py_merge(out.get(k), v, part)
        return out

    def py_clone(self, ir, part):
        if ir is None:
            return None
        return {k: self.inner.py_clone(v, part) for k, v in ir.items()}

    def py_finalize(self, ir, part):
        return sorted((k, self.inner.py_finalize(v, part)) for k, v in ir.items())


def _tb_key(ts, tb) -> tuple:
    """Total-order key over (ts, tie_break) where tb may be null/NaN:
    missing tb sorts AFTER any real value at equal ts (the nulls-last
    convention of pandas sort_values / np.lexsort that every other
    tie-break path uses). None is incomparable in py3 and NaN comparisons
    are order-inconsistent, so the missing flag does the ordering and the
    raw tb is only compared when both sides have one."""
    missing = tb is None or (isinstance(tb, float) and tb != tb)
    return (ts, missing, None if missing else tb)


class TieBreakSliceOp(AggOp):
    """Slice-family py adapter carrying the tie-break value through the IR.

    Values are ``(payload, tb)`` pairs. FIRST/LAST IR = ``(key, payload)``
    and FIRST_K/LAST_K IR = ``[(key, payload), ...]`` with ``key =
    _tb_key(ts, tb)``, so every comparison — including CROSS-SHARD merges in
    the salted path — resolves equal-ts collisions by the configured
    tie_break column, matching the vectorized unbucketed slice contract
    (reference TimedAggregators.scala:74-112). The temporal engine applies
    this wrapper to BUCKETED slice parts whenever tie_break is configured,
    in both finalized and partial modes, so salted and unsalted runs
    bit-match."""

    needs_ts = True

    def __init__(self, inner: AggOp):
        self.inner = inner
        self.op = inner.op
        # LAST/LAST_K keep the max (ts, tb); FIRST/FIRST_K the min
        self.keep_max = inner.op in (Operation.LAST, Operation.LAST_K)
        self.is_k = inner.op in (Operation.FIRST_K, Operation.LAST_K)

    def py_update(self, ir, v, ts, part):
        payload, tb = v
        key = _tb_key(ts, tb)
        if self.is_k:
            item = (key, payload)
            if ir is None:
                return [item]
            ir = list(ir)
            ir.append(item)
            k = part.get_int("k")
            if len(ir) > 4 * k:
                ir.sort(key=lambda t: t[0], reverse=self.keep_max)
                del ir[k:]
            return ir
        if ir is None:
            return (key, payload)
        if self.keep_max:
            return (key, payload) if key >= ir[0] else ir
        return (key, payload) if key < ir[0] else ir

    def py_clone(self, ir, part):
        if ir is None:
            return None
        return list(ir) if self.is_k else ir

    def py_merge(self, a, b, part):
        if a is None:
            return b
        if b is None:
            return a
        if self.is_k:
            k = part.get_int("k")
            out = list(a) + list(b)
            out.sort(key=lambda t: t[0], reverse=self.keep_max)
            return out[:k]
        if self.keep_max:
            return b if b[0] >= a[0] else a
        return a if a[0] <= b[0] else b

    def py_finalize(self, ir, part):
        if self.is_k:
            k = part.get_int("k")
            out = sorted(ir, key=lambda t: t[0], reverse=self.keep_max)
            return [t[1] for t in out[:k]]
        return ir[1]


class VectorPyOp(AggOp):
    """Scalar-path adapter for LIST inputs: one inner update per element,
    null elements skipped (reference VectorDispatcher / guardedApplyVector,
    ColumnAggregator.scala:80-117)."""

    def __init__(self, inner: AggOp):
        self.inner = inner
        self.needs_ts = inner.needs_ts

    def py_update(self, ir, v, ts, part):
        if v is None:
            return ir
        for e in v:
            if e is None or (isinstance(e, float) and np.isnan(e)):
                continue
            ir = self.inner.py_update(ir, e, ts, part)
        return ir

    def py_merge(self, a, b, part):
        return self.inner.py_merge(a, b, part)

    def py_clone(self, ir, part):
        return self.inner.py_clone(ir, part)

    def py_finalize(self, ir, part):
        return self.inner.py_finalize(ir, part)


class MapPyOp(AggOp):
    """Scalar-path adapter for MAP inputs: IR = {map_key: inner IR}; each
    event value is a list of (key, value) entries, null entry values
    skipped (reference MapColumnAggregator.scala:29-75). Map keys are
    str-canonical, matching the snapshot path."""

    def __init__(self, inner: AggOp):
        self.inner = inner
        self.needs_ts = inner.needs_ts

    def py_update(self, ir, v, ts, part):
        if v is None:
            return ir
        if ir is None:
            ir = {}
        for mk, mv in v:
            if mv is None or (isinstance(mv, float) and np.isnan(mv)):
                continue
            k = str(mk)
            ir[k] = self.inner.py_update(ir.get(k), mv, ts, part)
        return ir

    def py_merge(self, a, b, part):
        if a is None:
            return b
        if b is None:
            return a
        out = dict(a)
        for k, v in b.items():
            out[k] = self.inner.py_merge(out.get(k), v, part)
        return out

    def py_clone(self, ir, part):
        if ir is None:
            return None
        return {k: self.inner.py_clone(v, part) for k, v in ir.items()}

    def py_finalize(self, ir, part):
        return sorted((k, self.inner.py_finalize(v, part))
                      for k, v in ir.items())


def _family(part: AggregationPart) -> str:
    if part.bucket is not None:
        return "sawtooth"
    if part.operation in _PREFIX_OPS:
        return "prefix"
    if part.operation in _SLICE_OPS:
        return "slice"
    return "sawtooth"


class TemporalPartition:
    """Processes one co-partitioned group of tagged query+event rows."""

    def __init__(self, keys: Sequence[str], parts: list[AggregationPart],
                 right_schema: pa.Schema, left_cols: list[str],
                 tie_break: Optional[str] = None, daily: bool = False,
                 emit_partials: bool = False, exact: bool = False):
        self.__name__ = type(self).__name__
        self.daily = daily  # SNAPSHOT accuracy → DailyResolution hops
        self.exact = exact  # per-event windows, no sawtooth tail rounding
        if exact and daily:
            raise ValueError("exact windows and daily (snapshot) accuracy "
                             "are mutually exclusive")
        self.emit_partials = emit_partials  # salted path: mergeable IR columns
        self.keys = list(keys)
        self.parts = parts
        self.right_schema = right_schema
        self.left_cols = left_cols  # passthrough output columns incl. keys+ts
        self.tie_break = tie_break
        self.out_fields = []
        self._map_part_idx: set = set()  # map-input parts → sawtooth family
        for i, p in enumerate(parts):
            in_type = right_schema.field(p.input_column).type
            if pa.types.is_map(in_type):
                if p.bucket is not None:
                    raise NotImplementedError(
                        "bucketing over map columns is unsupported "
                        "(reference ColumnAggregator.scala:188)")
                self._map_part_idx.add(i)
                base = OPS[p.operation].output_arrow_type(in_type.item_type, p)
                self.out_fields.append(
                    pa.field(p.output_name, pa.map_(pa.string(), base)))
                continue
            explode = (pa.types.is_list(in_type) or pa.types.is_large_list(in_type)) \
                and (p.operation in _PREFIX_OPS
                     or (p.bucket is None and p.operation in _SAW_EXPLODE_OPS))
            el_type = in_type.value_type if explode else in_type
            base = OPS[p.operation].output_arrow_type(el_type, replace(p, bucket=None))
            t = pa.map_(pa.string(), base) if p.bucket is not None else base
            self.out_fields.append(pa.field(p.output_name, t))
        self._fams = ["sawtooth" if i in self._map_part_idx else _family(p)
                      for i, p in enumerate(parts)]
        if emit_partials:
            from .salting import partial_fields

            self.partial_out_fields = partial_fields(
                parts, right_schema,
                tie_break=tie_break if tie_break
                and tie_break in right_schema.names else None)

    # ------------------------------------------------------------------

    def __call__(self, tbl: pa.Table) -> pa.Table:
        is_q = tbl["_is_q"].to_numpy(zero_copy_only=False).astype(bool)
        q_keep = list(dict.fromkeys([*self.left_cols,
                                     *[k for k in self.keys
                                       if k in tbl.column_names]]))
        q_tbl = tbl.filter(pa.array(is_q)).select(q_keep)
        e_tbl = tbl.filter(pa.array(~is_q))
        nq = len(q_tbl)
        if nq == 0:
            fields = self.partial_out_fields if self.emit_partials else self.out_fields
            return pa.table({
                **{c: q_tbl[c] for c in self.left_cols},
                **{f.name: pa.nulls(0, f.type) for f in fields},
            })

        # ---- unified key codes over queries + events
        if len(self.keys) == 1:
            kq = q_tbl[self.keys[0]].to_pandas()
            ke = e_tbl[self.keys[0]].to_pandas()
            codes_all, _ = pd.factorize(pd.concat([kq, ke], ignore_index=True),
                                        use_na_sentinel=False)
        else:
            kq = q_tbl.select(self.keys).to_pandas()
            ke = e_tbl.select(self.keys).to_pandas()
            idx = pd.MultiIndex.from_frame(pd.concat([kq, ke], ignore_index=True))
            codes_all, _ = idx.factorize(use_na_sentinel=False)
        codes_all = codes_all.astype(np.int64)
        q_key = codes_all[:nq]
        e_key = codes_all[nq:]

        q_ts = q_tbl["ts"].to_numpy(zero_copy_only=False).astype(np.int64)
        e_ts = e_tbl["ts"].to_numpy(zero_copy_only=False).astype(np.int64)

        # ---- sort events by (key, ts, tie_break); queries by (key, ts)
        if self.tie_break and self.tie_break in e_tbl.column_names:
            tb = e_tbl[self.tie_break].to_numpy(zero_copy_only=False)
            e_perm = np.lexsort((tb, e_ts, e_key))
        else:
            e_perm = np.lexsort((e_ts, e_key))
        e_key = e_key[e_perm]
        e_ts = e_ts[e_perm]
        e_tbl = e_tbl.take(pa.array(e_perm))
        q_perm = np.lexsort((q_ts, q_key))
        q_key = q_key[q_perm]
        q_ts = q_ts[q_perm]
        q_tbl = q_tbl.take(pa.array(q_perm))

        # ---- composite (key, ts) encoding for one-shot searchsorted
        base_ts = int(min(e_ts.min() if len(e_ts) else q_ts.min(), q_ts.min()))
        max_rel = int(max((e_ts.max() if len(e_ts) else base_ts), q_ts.max())) - base_ts
        shift = 1 << (max_rel + 2).bit_length()
        n_keys = int(codes_all.max()) + 1
        if n_keys * shift >= (1 << 63):
            raise ValueError(
                "partition too wide for composite encoding; raise num_partitions"
            )
        comp_e = e_key * shift + (e_ts - base_ts)
        head_idx = np.searchsorted(comp_e, q_key * shift + (q_ts - base_ts), side="left")

        def tail_index(window: Window) -> np.ndarray:
            if window.unbounded:
                return np.searchsorted(comp_e, q_key * shift, side="left")
            if self.exact:  # per-event window start, no hop rounding
                tail_ts = q_ts - window.millis
            else:
                tail_ts = window_tail(q_ts, window, self.daily)
            rel = np.clip(tail_ts - base_ts, 0, None)
            return np.searchsorted(comp_e, q_key * shift + rel, side="left")

        # ---- per-part feature computation
        feature_arrays: dict[str, pa.Array] = {}
        saw_parts = [(i, p) for i, p in enumerate(self.parts)
                     if self._fams[i] == "sawtooth"]
        if self.emit_partials:
            for i, p in enumerate(self.parts):
                fam = self._fams[i]
                if fam == "prefix":
                    feature_arrays.update(self._prefix_partial(
                        p, e_tbl, head_idx, tail_index))
                elif fam == "slice":
                    feature_arrays.update(self._slice_partial(
                        p, e_tbl, e_ts, head_idx, tail_index))
            if saw_parts:
                import pickle as _pkl

                saw = self._sawtooth_features(saw_parts, e_tbl, e_key, e_ts,
                                              q_key, q_ts,
                                              transform=_pkl.dumps)
                for name, arr in saw.items():
                    feature_arrays[f"{name}__pkl"] = arr
            cols = {c: q_tbl[c] for c in self.left_cols}
            for f in self.partial_out_fields:
                cols[f.name] = feature_arrays[f.name]
            return pa.table(cols)
        for i, p in enumerate(self.parts):
            fam = self._fams[i]
            if fam == "prefix":
                feature_arrays[p.output_name] = self._prefix_feature(
                    p, e_tbl, head_idx, tail_index, self.out_fields[i].type)
            elif fam == "slice":
                feature_arrays[p.output_name] = self._slice_feature(
                    p, e_tbl, head_idx, tail_index, self.out_fields[i].type)
        if saw_parts:
            saw = self._sawtooth_features(saw_parts, e_tbl, e_key, e_ts, q_key, q_ts)
            feature_arrays.update(saw)

        cols = {c: q_tbl[c] for c in self.left_cols}
        for f in self.out_fields:
            cols[f.name] = feature_arrays[f.name]
        return pa.table(cols)

    # ------------------------------------------------------------ prefix

    def _event_moments(self, p: AggregationPart, e_tbl: pa.Table, n_moments: int):
        """Per-event contributions (n_i, s1_i..sk_i) with list auto-explode."""
        col = e_tbl[p.input_column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ne = len(col)
        if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            lengths = pc.fill_null(pc.list_value_length(col), 0) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            flat = col.flatten()
            fv = flat.to_numpy(zero_copy_only=False).astype(np.float64)
            fnull = ~pc.is_valid(flat).to_numpy(zero_copy_only=False)
            fv = np.where(fnull, 0.0, fv)
            offs = np.zeros(ne + 1, dtype=np.int64)
            np.cumsum(lengths, out=offs[1:])
            cs_null = np.concatenate([[0], np.cumsum(fnull.astype(np.int64))])
            n_i = lengths - (cs_null[offs[1:]] - cs_null[offs[:-1]])
            moments = []
            powv = np.ones_like(fv)
            for k in range(1, n_moments + 1):
                powv = powv * fv
                cs = np.concatenate([[0.0], np.cumsum(powv)])
                moments.append(cs[offs[1:]] - cs[offs[:-1]])
            return n_i.astype(np.float64), moments
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        v = col.to_numpy(zero_copy_only=False).astype(np.float64)
        v = np.where(valid, v, 0.0)
        n_i = valid.astype(np.float64)
        moments = []
        powv = np.ones_like(v)
        for k in range(1, n_moments + 1):
            powv = powv * v
            moments.append(np.where(valid, powv, 0.0))
        return n_i, moments

    def _prefix_moments(self, p: AggregationPart, e_tbl, head_idx, tail_index):
        nm = _MOMENTS_NEEDED[p.operation]
        n_i, moments = self._event_moments(p, e_tbl, nm)
        l = tail_index(p.window)
        r = head_idx
        cn = np.concatenate([[0.0], np.cumsum(n_i)])
        n = cn[r] - cn[l]
        s = []
        for m in moments:
            cs = np.concatenate([[0.0], np.cumsum(m)])
            s.append(cs[r] - cs[l])
        return n, s

    def _prefix_partial(self, p: AggregationPart, e_tbl, head_idx, tail_index):
        n, s = self._prefix_moments(p, e_tbl, head_idx, tail_index)
        name = p.output_name
        out = {f"{name}__n": pa.array(n, type=pa.float64())}
        for k, sk in enumerate(s, start=1):
            out[f"{name}__s{k}"] = pa.array(sk, type=pa.float64())
        return out

    def _slice_partial(self, p: AggregationPart, e_tbl, e_ts, head_idx, tail_index):
        col = e_tbl[p.input_column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        nn_pos = np.flatnonzero(valid)
        l = tail_index(p.window)
        r = head_idx
        j_l = np.searchsorted(nn_pos, l, side="left")
        j_r = np.searchsorted(nn_pos, r, side="left")
        have = j_r > j_l
        name = p.output_name
        # tie-break slot: events are (ts, tb)-sorted within the shard, so
        # the picked rows are shard-correct; emitting their tb lets the
        # cross-shard merge resolve equal-ts collisions by (ts, tb) too
        tb_col = None
        if self.tie_break and self.tie_break in e_tbl.column_names:
            tb_col = e_tbl[self.tie_break]
            if isinstance(tb_col, pa.ChunkedArray):
                tb_col = tb_col.combine_chunks()
        if p.operation in (Operation.FIRST, Operation.LAST):
            if len(nn_pos) == 0:
                out = {f"{name}__ts": pa.nulls(len(have), pa.float64()),
                       f"{name}__payload": pa.nulls(len(have), col.type)}
                if tb_col is not None:
                    out[f"{name}__tb"] = pa.nulls(len(have), tb_col.type)
                return out
            if p.operation == Operation.FIRST:
                pos = nn_pos[np.minimum(j_l, len(nn_pos) - 1)]
            else:
                pos = nn_pos[np.clip(j_r - 1, 0, len(nn_pos) - 1)]
            ts_out = np.where(have, e_ts[pos].astype(np.float64), np.nan)
            idx_arr = pa.array(np.where(have, pos, 0).astype(np.int64))
            taken = col.take(idx_arr)
            if (~have).any():
                taken = pc.if_else(pa.array(have), taken,
                                   pa.nulls(len(have), col.type))
            out = {f"{name}__ts": pa.array(ts_out, from_pandas=True),
                   f"{name}__payload": taken}
            if tb_col is not None:
                tb_taken = tb_col.take(idx_arr)
                if (~have).any():
                    tb_taken = pc.if_else(pa.array(have), tb_taken,
                                          pa.nulls(len(have), tb_col.type))
                out[f"{name}__tb"] = tb_taken
            return out
        # FIRST_K / LAST_K: per-shard top-k candidates with their ts order keys
        k = p.get_int("k")
        lens = np.minimum(j_r - j_l, k)
        lens = np.where(have, lens, 0)
        offs = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        total = int(offs[-1])
        within = np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], lens)
        if p.operation == Operation.LAST_K:
            j = np.repeat(j_r - 1, lens) - within
        else:
            j = np.repeat(j_l, lens) + within
        flat_idx = nn_pos[j] if len(nn_pos) else np.array([], dtype=np.int64)
        o_inner = pa.array(e_ts[flat_idx].astype(np.int64)) if len(flat_idx) else             pa.array([], type=pa.int64())
        p_inner = col.take(pa.array(flat_idx))
        mask = ~have
        o_arr = pa.LargeListArray.from_arrays(
            pa.array(offs, type=pa.int64()), o_inner,
            mask=pa.array(mask) if mask.any() else None).cast(pa.list_(pa.int64()))
        p_arr = pa.LargeListArray.from_arrays(
            pa.array(offs, type=pa.int64()), p_inner,
            mask=pa.array(mask) if mask.any() else None)
        out = {f"{name}__o": o_arr, f"{name}__p": p_arr}
        if tb_col is not None:
            tb_inner = tb_col.take(pa.array(flat_idx))
            out[f"{name}__otb"] = pa.LargeListArray.from_arrays(
                pa.array(offs, type=pa.int64()), tb_inner,
                mask=pa.array(mask) if mask.any() else None) \
                .cast(pa.list_(tb_col.type))
        return out

    def _prefix_feature(self, p: AggregationPart, e_tbl, head_idx, tail_index,
                        out_type) -> pa.Array:
        n, s = self._prefix_moments(p, e_tbl, head_idx, tail_index)
        empty = n == 0
        with np.errstate(invalid="ignore", divide="ignore"):
            if p.operation == Operation.COUNT:
                out = n
            elif p.operation == Operation.SUM:
                out = s[0]
            elif p.operation == Operation.AVERAGE:
                out = s[0] / n
            elif p.operation == Operation.VARIANCE:
                out = (s[1] - s[0] * s[0] / n) / n
                out = np.maximum(out, 0.0)
            elif p.operation == Operation.SKEW:
                mean = s[0] / n
                m2 = s[1] - n * mean**2
                m3 = s[2] - 3 * mean * s[1] + 2 * n * mean**3
                out = np.sqrt(n) * m3 / np.power(m2, 1.5)
                out = np.where((n < 3) | (m2 <= 0), np.nan, out)
                empty = empty | (n < 3)
            elif p.operation == Operation.KURTOSIS:
                mean = s[0] / n
                m2 = s[1] - n * mean**2
                m4 = s[3] - 4 * mean * s[2] + 6 * mean**2 * s[1] - 3 * n * mean**4
                out = n * m4 / (m2 * m2) - 3.0
                out = np.where((n < 4) | (m2 <= 0), np.nan, out)
                empty = empty | (n < 4)
            else:  # pragma: no cover
                raise KeyError(p.operation)
        mask = empty
        arr = pa.array(np.where(mask, 0, out), mask=mask)
        return arr.cast(out_type, safe=False)

    # ------------------------------------------------------------- slice

    def _slice_feature(self, p: AggregationPart, e_tbl, head_idx, tail_index,
                       out_type) -> pa.Array:
        col = e_tbl[p.input_column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        nn_pos = np.flatnonzero(valid)
        l = tail_index(p.window)
        r = head_idx
        j_l = np.searchsorted(nn_pos, l, side="left")
        j_r = np.searchsorted(nn_pos, r, side="left")
        have = j_r > j_l
        op = p.operation
        if op in (Operation.FIRST, Operation.LAST):
            if len(nn_pos) == 0:
                return pa.nulls(len(have), col.type).cast(out_type, safe=False)
            if op == Operation.FIRST:
                pos = nn_pos[np.minimum(j_l, len(nn_pos) - 1)]
            else:
                pos = nn_pos[np.clip(j_r - 1, 0, len(nn_pos) - 1)]
            taken = col.take(pa.array(np.where(have, pos, 0).astype(np.int64)))
            if (~have).any():
                taken = pc.if_else(pa.array(have), taken, pa.nulls(len(have), col.type))
            return taken
        # FIRST_K / LAST_K
        k = p.get_int("k")
        lens = np.minimum(j_r - j_l, k)
        lens = np.where(have, lens, 0)
        offs = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        total = int(offs[-1])
        within = np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], lens)
        if op == Operation.LAST_K:
            # most-recent first (reference LastK finalize: ts-descending)
            j = np.repeat(j_r - 1, lens) - within
        else:
            j = np.repeat(j_l, lens) + within
        flat_idx = nn_pos[j] if len(nn_pos) else np.array([], dtype=np.int64)
        inner = col.take(pa.array(flat_idx))
        mask = ~have
        list_arr = pa.LargeListArray.from_arrays(
            pa.array(offs, type=pa.int64()), inner,
            mask=pa.array(mask) if mask.any() else None)
        return list_arr.cast(out_type, safe=False) if list_arr.type != out_type else list_arr

    # ---------------------------------------------------------- sawtooth

    def _hop_ir_to_py(self, p: AggregationPart, op: AggOp, row):
        return ir_rec_to_py(p, op, row)



    def _prebuild_hops(self, saw_parts, e_tbl, e_key, e_ts, col_values):
        """Vectorized per-(key, hop) partial IRs for eligible sawtooth parts
        — replaces the per-event python loop in _build_hops with one grouped
        partial() call per part (the HopsAggregator partial+final pattern,
        reference HopsAggregator.scala:33-165, done columnar)."""
        prebuilt: dict[int, dict] = {}  # part index -> key_code -> (starts, irs)
        _PREBUILDABLE = (Operation.MIN, Operation.MAX,
                         Operation.UNIQUE_COUNT, Operation.HISTOGRAM,
                         Operation.APPROX_HISTOGRAM_K,
                         Operation.APPROX_UNIQUE_COUNT,
                         Operation.APPROX_PERCENTILE,
                         Operation.TOP_K, Operation.BOTTOM_K,
                         Operation.SUM, Operation.COUNT, Operation.AVERAGE,
                         Operation.VARIANCE, Operation.SKEW,
                         Operation.KURTOSIS,
                         Operation.FIRST, Operation.LAST,
                         Operation.FIRST_K, Operation.LAST_K)
        for i, p in saw_parts:
            if p.window.unbounded:
                continue
            if p.operation not in _PREBUILDABLE:
                continue
            op = OPS[p.operation]
            if op.needs_ts and self.tie_break:
                # prebuilt hop IRs can't carry the tie-break ordering
                continue
            from ..windowing.resolution import tail_hop_millis as _thm

            hop = _thm(p.window, self.daily)
            if p.input_column in e_tbl.column_names and pa.types.is_map(
                    e_tbl.schema.field(p.input_column).type):
                # map parts build hops in the py path (MapPyOp per event) —
                # the grouped partial has no per-map-key dispatch here
                continue
            bcodes = buniq = None
            exploded = False
            if p.bucket is None:
                vals, valid, exploded = col_values(p)
            else:
                # raw values + factorized bucket labels — the grouped
                # partial runs at (key, hop, bucket) granularity and the
                # dicts are reassembled per (key, hop). force_raw: the
                # tail/head updates feed RAW values for bucketed parts, so
                # hop IRs must hold the same representation (codes here
                # would double-count values seen in both regions)
                vals, valid, _ = col_values(replace(p, bucket=None),
                                            force_raw=True,
                                            allow_explode=False)
                bcol = e_tbl[p.bucket]
                if isinstance(bcol, pa.ChunkedArray):
                    bcol = bcol.combine_chunks()
                valid = valid & pc.is_valid(bcol).to_numpy(zero_copy_only=False)
                bser = bcol.to_pandas()
                bcodes_all, buniq = pd.factorize(bser, use_na_sentinel=False)
                bcodes = bcodes_all.astype(np.int64)
            if not valid.any():
                prebuilt[i] = {}
                continue
            ek = e_key[valid]
            ets = e_ts[valid]
            v = vals[valid]
            if exploded:
                # list input → per-element rows (null elements dropped),
                # repeating the key/ts of the carrying event
                lens = np.fromiter(
                    (0 if lst is None else len(lst) for lst in v),
                    dtype=np.int64, count=len(v))
                rep = np.repeat(np.arange(len(v)), lens)
                flat: list = [e for lst in v if lst is not None for e in lst]
                el_ok = np.fromiter(
                    (e is not None
                     and not (isinstance(e, float) and np.isnan(e))
                     for e in flat), dtype=bool, count=len(flat))
                fv = np.empty(len(flat), dtype=object)
                fv[:] = flat
                ek, ets, v = ek[rep][el_ok], ets[rep][el_ok], fv[el_ok]
                if len(ek) == 0:
                    prebuilt[i] = {}
                    continue
            hop_id = ets // hop
            mn = int(hop_id.min())
            span = int(hop_id.max()) - mn + 1
            comp = ek * span + (hop_id - mn)
            if p.bucket is not None:
                nb = len(buniq)
                comp = comp * nb + bcodes[valid]
            uniq, inv = np.unique(comp, return_inverse=True)
            df = pd.DataFrame({"g": inv, "v": v})
            if op.needs_ts:
                df["ts"] = ets
            frame = op.partial(df, len(uniq), replace(p, bucket=None))
            irs_all = [None] * len(uniq)
            # column-wise IR extraction — iterrows builds a Series per row
            # and dominated this loop's profile
            gcol = frame["g"].to_numpy()
            ir_lists = {c: frame[c].tolist()
                        for c in frame.columns if c != "g"}
            for j in range(len(frame)):
                rec = {c: lst[j] for c, lst in ir_lists.items()}
                irs_all[int(gcol[j])] = self._hop_ir_to_py(p, op, rec)
            if p.bucket is not None:
                # collapse (key, hop, bucket) rows → per-(key, hop) dicts
                nb = len(buniq)
                kh_of = (uniq // nb).astype(np.int64)
                b_of = (uniq % nb).astype(np.int64)
                kh_uniq, kh_inv = np.unique(kh_of, return_inverse=True)
                dicts: list[dict] = [dict() for _ in range(len(kh_uniq))]
                for j in range(len(uniq)):
                    dicts[int(kh_inv[j])][buniq[b_of[j]]] = irs_all[j]
                uniq = kh_uniq
                irs_all = dicts
            keys_of = (uniq // span).astype(np.int64)
            starts_of = ((uniq % span) + mn) * hop
            by_key: dict[int, tuple] = {}
            kb = np.flatnonzero(np.diff(keys_of)) + 1
            bounds = np.concatenate([[0], kb, [len(uniq)]])
            for bi in range(len(bounds) - 1):
                a, b = int(bounds[bi]), int(bounds[bi + 1])
                by_key[int(keys_of[a])] = (starts_of[a:b],
                                           [irs_all[j] for j in range(a, b)])
            prebuilt[i] = by_key
        return prebuilt

    def _sawtooth_features(self, saw_parts, e_tbl: pa.Table, e_key, e_ts, q_key,
                           q_ts, transform=None):
        nq = len(q_key)
        results: dict[str, list] = {self.parts[i].output_name: [None] * nq
                                    for i, _ in saw_parts}
        # prepare per-part value accessors (nulls filtered per key slice later)
        col_cache: dict[str, Any] = {}

        def col_values(p: AggregationPart, force_raw: bool = False,
                       allow_explode: bool = True, with_tb: bool = False):
            """Returns (vals, valid, exploded). exploded=True means vals is
            an object array of per-row element lists — consumers must apply
            per-element updates (VectorPyOp / exploded hop partials).
            with_tb=True (bucketed slice parts under tie_break) zips each
            value with its tie-break cell: (bucket, (value, tb)) pairs for
            TieBreakSliceOp."""
            # exact UNIQUE_COUNT only needs distinctness, not the values —
            # dictionary codes stand in for strings (partition-local codes,
            # so only in finalized mode: partial IRs merge across shards)
            use_codes = (not force_raw
                         and p.operation == Operation.UNIQUE_COUNT
                         and p.bucket is None and not self.emit_partials)
            key = (p.input_column, p.bucket, use_codes, with_tb)
            if key in col_cache:
                return col_cache[key]
            col = e_tbl[p.input_column]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if pa.types.is_map(col.type):
                # per-row entry lists; MapPyOp applies per-map-key updates
                # (reference MapColumnAggregator) — mode marker "map"
                valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
                pylist = col.to_pylist()
                vals = np.empty(len(pylist), dtype=object)
                vals[:] = pylist
                col_cache[key] = (vals, valid, "map")
                return col_cache[key]
            if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
                if (allow_explode and p.bucket is None
                        and p.operation in _SAW_EXPLODE_OPS):
                    valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
                    pylist = col.to_pylist()
                    vals = np.empty(len(pylist), dtype=object)
                    vals[:] = pylist
                    col_cache[key] = (vals, valid, True)
                    return col_cache[key]
                raise NotImplementedError(
                    f"temporal sawtooth aggregation over list column "
                    f"{p.input_column!r} ({p.operation.name}): list "
                    "auto-explode covers un-bucketed "
                    "MIN/MAX/UNIQUE_COUNT/HISTOGRAM/TOP_K/sketch ops — "
                    "pre-explode the column or aggregate at snapshot "
                    "granularity")
            valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
            if pa.types.is_floating(col.type) or pa.types.is_integer(col.type):
                if pa.types.is_integer(col.type) and col.null_count:
                    # nulls promote to_numpy to float64, splitting the
                    # HISTOGRAM-family stringified key space ('5' vs '5.0')
                    # and changing MIN/MAX output dtype; fill-then-convert —
                    # consumers mask by `valid` so the filler is never read
                    col = pc.fill_null(col, 0)
                vals = col.to_numpy(zero_copy_only=False)
            elif use_codes and (pa.types.is_string(col.type)
                                or pa.types.is_large_string(col.type)):
                idx = col.dictionary_encode().indices
                vals = pc.fill_null(idx, -1).to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
            else:
                vals = np.asarray(col.to_pylist(), dtype=object)
            if with_tb:
                tbvals = e_tbl[self.tie_break].to_pylist()
                pairs = np.empty(len(tbvals), dtype=object)
                pairs[:] = list(zip(vals, tbvals))
                vals = pairs
            if p.bucket is not None:
                bcol = e_tbl[p.bucket]
                bvalid = pc.is_valid(bcol).to_numpy(zero_copy_only=False)
                valid = valid & bvalid
                bvals = np.asarray(bcol.to_pylist(), dtype=object)
                vals = np.array(list(zip(bvals, vals)), dtype=object)
            col_cache[key] = (vals, valid, False)
            return col_cache[key]

        prebuilt = {} if self.exact else self._prebuild_hops(
            saw_parts, e_tbl, e_key, e_ts, col_values)

        # iterate keys that have queries
        q_bounds = np.flatnonzero(np.diff(q_key)) + 1
        q_starts = np.concatenate([[0], q_bounds, [nq]])
        ne = len(e_key)
        from ..windowing.resolution import tail_hop_millis as _thm

        for s_i in range(len(q_starts) - 1):
            a, b = q_starts[s_i], q_starts[s_i + 1]
            kcode = q_key[a]
            e_a = np.searchsorted(e_key, kcode, side="left")
            e_b = np.searchsorted(e_key, kcode, side="right")
            qts = q_ts[a:b]
            for i, p in saw_parts:
                use_tb = bool(self.tie_break
                              and self.tie_break in e_tbl.column_names
                              and p.bucket is not None
                              and p.operation in _SLICE_OPS)
                vals, valid, exploded = col_values(p, with_tb=use_tb)
                vmask = valid[e_a:e_b]
                ets = e_ts[e_a:e_b][vmask]
                evs = vals[e_a:e_b][vmask]
                inner = OPS[p.operation]
                if use_tb:
                    op = BucketedPyOp(TieBreakSliceOp(inner))
                elif p.bucket is not None:
                    op = BucketedPyOp(inner)
                elif exploded == "map":
                    op = MapPyOp(inner)
                elif exploded:
                    op = VectorPyOp(inner)
                else:
                    op = inner
                cache: dict = {}
                if i in prebuilt:
                    pre = prebuilt[i].get(int(kcode))
                    if pre is not None:
                        cache[_thm(p.window, self.daily)] = pre
                    elif len(ets) == 0:
                        cache[_thm(p.window, self.daily)] = (
                            np.array([], dtype=np.int64), [])
                res = sawtooth_one_key(op, replace(p, bucket=None), p.window,
                                       ets, evs, qts, hops_cache=cache,
                                       daily=self.daily, transform=transform,
                                       exact=self.exact)
                out_list = results[p.output_name]
                for t, v in enumerate(res):
                    out_list[a + t] = v
        out: dict[str, pa.Array] = {}
        for i, p in saw_parts:
            t = pa.binary() if transform is not None else self.out_fields[i].type
            out[p.output_name] = pa.array(results[p.output_name], type=t)
        return out




class _TagAlign:
    """Pad queries/events to the union schema + tag + partition id."""

    def __init__(self, is_q: bool, union_fields: list[pa.Field], keys: Sequence[str],
                 num_partitions: int):
        self.is_q = is_q
        self.union_fields = union_fields
        self.keys = list(keys)
        self.num_partitions = num_partitions

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.is_q:
            # drop null-key EVENTS (reference removeNulls, GroupBy.scala:181)
            # — otherwise a null-key event would "match" a null-key left row
            # through factorization. Null-key left rows stay (left-outer, null
            # features).
            mask = None
            for k in self.keys:
                if k in batch.column_names:
                    m = pc.is_valid(batch[k])
                    mask = m if mask is None else pc.and_(mask, m)
            if mask is not None:
                batch = batch.filter(mask)
        n = len(batch)
        cols = {}
        for f in self.union_fields:
            if f.name in batch.column_names:
                c = batch[f.name]
                cols[f.name] = c if c.type == f.type else pc.cast(c, f.type)
            else:
                cols[f.name] = pa.nulls(n, type=f.type)
        ftypes = {f.name: f.type for f in self.union_fields}
        kdf = _canon_key_table(pa.table(cols), self.keys, ftypes).to_pandas()
        part = (stable_key_hash(kdf, self.keys) % self.num_partitions).astype(np.int64)
        cols["_part"] = pa.array(part)
        cols["_is_q"] = pa.array(np.full(n, 1 if self.is_q else 0, dtype=np.int8))
        return pa.table(cols)


def _union_fields(*schemas: pa.Schema) -> list[pa.Field]:
    out: list[pa.Field] = []
    seen: set[str] = set()
    for sch in schemas:
        for f in sch:
            if f.name not in seen:
                seen.add(f.name)
                out.append(f)
    return out


def _tagged_union(left_ds, right_ds, left_schema, right_schema, part_keys,
                  num_partitions):
    fields = _union_fields(left_schema, right_schema)
    tq = left_ds.map_batches(
        _TagAlign(True, fields, part_keys, num_partitions), batch_format="pyarrow")
    te = right_ds.map_batches(
        _TagAlign(False, fields, part_keys, num_partitions), batch_format="pyarrow")
    return tq.union(te)


def auto_num_partitions(
    left_ds: ray.data.Dataset,
    right_ds: ray.data.Dataset,
    target_bytes: int = 256 << 20,
) -> int:
    """Size the hash exchange from the data, not a constant: enough
    partitions that one partition's events+queries (≈ target_bytes) fit a
    worker's heap at 100-TB inputs, floored at 2 tasks per CPU so the
    straggler tail can pack. ``size_bytes`` comes from parquet/block
    metadata — no data is read."""
    import math

    import ray as _ray

    total = 0
    for d in (left_ds, right_ds):
        try:
            total += d.size_bytes() or 0
        except Exception:
            pass
    cpus = int(_ray.cluster_resources().get("CPU", 8)) \
        if _ray.is_initialized() else 8
    return max(2 * cpus, math.ceil(total / target_bytes))


def temporal_join(
    left_ds: ray.data.Dataset,
    right_ds: ray.data.Dataset,
    conf: GroupByConf,
    num_partitions: Optional[int] = DEFAULT_NUM_PARTITIONS,
    left_schema: Optional[pa.Schema] = None,
    right_schema: Optional[pa.Schema] = None,
    daily: bool = False,
    hot_keys=None,
    salt_shards: Optional[int] = None,
    broadcast_left_keys: bool = False,
    exact_windows: bool = False,
) -> ray.data.Dataset:
    """left (key, ts, ...) ⟕ windowed aggregates of right events, PITC.

    ``daily=True`` switches tail hops to DailyResolution (SNAPSHOT accuracy —
    windows must be whole days).

    ``num_partitions=None`` auto-sizes the exchange from input bytes
    (``auto_num_partitions``) so partition memory stays bounded at any
    input scale.

    ``hot_keys``: None (no salting), "auto" (sample the event stream and salt
    keys that would dominate a partition), or an explicit key list — scalars
    for single-key confs, tuples for composite keys (matched on the stable
    composite key hash). Hot keys take the salted two-stage path
    (pipelines/salting.py); cold keys the single-pass path; outputs are
    unioned.

    ``exact_windows=True`` computes per-event exact windows [q.ts - w, q.ts)
    instead of the reference's sawtooth (hop-rounded tail) semantics —
    prefix/slice families are exact via raw-ts searchsorted, the rest via a
    per-event TwoStack sweep (TwoStackLiteAggregator at event granularity).
    Strictly more work than sawtooth; incompatible with daily accuracy."""
    keys = list(conf.key_columns)
    parts = conf.parts()
    from ..util import dataset_schema

    if num_partitions is None:
        num_partitions = auto_num_partitions(left_ds, right_ds)
    left_schema = left_schema or dataset_schema(left_ds)
    right_schema = right_schema or dataset_schema(right_ds)
    from ..aggregators.row import _MAP_OPS
    map_parts = [p for p in parts
                 if p.input_column in right_schema.names
                 and pa.types.is_map(
                     right_schema.field(p.input_column).type)]
    for p in map_parts:
        if p.operation not in _MAP_OPS:
            raise NotImplementedError(
                f"{p.operation.name} over a map input column is not "
                "supported in temporal_join (map-key dispatch covers "
                "SUM/COUNT/AVERAGE/VARIANCE/SKEW/KURTOSIS/MIN/MAX/"
                "UNIQUE_COUNT)")
        if p.bucket is not None:
            raise NotImplementedError(
                "bucketing over map columns is unsupported "
                "(reference ColumnAggregator.scala:188)")
    left_cols = list(left_schema.names)
    # prune the right side to what the aggregation actually reads — only these
    # columns pay the shuffle (a 'tokens' payload not referenced by any part
    # must not cross the exchange)
    needed = set(keys) | {"ts"}
    for p in parts:
        needed.add(p.input_column)
        if p.bucket is not None:
            needed.add(p.bucket)
    if conf.tie_break_column:
        needed.add(conf.tie_break_column)
    right_keep = [n for n in right_schema.names if n in needed]
    right_schema = pa.schema([right_schema.field(n) for n in right_keep])
    right_ds = right_ds.map_batches(
        lambda t, cols=tuple(right_keep): t.select(list(cols)),
        batch_format="pyarrow")

    if broadcast_left_keys == "bloom":
        # bloom tier (reference spark/JoinBase.scala:304-339 +
        # Extensions.scala:182-223: bloom semi-join for 5k–1M left rows):
        # per-block bitmaps are OR-reduced — the left KEY SET is never
        # collected anywhere, only a fixed-size bit array. False positives
        # just let some extra events through the shuffle; they match no
        # query and are harmless to the left-outer result. Materialize the
        # left once: count() (bit sizing), the bitmap build, and the join
        # itself would otherwise each re-execute a lazy left pipeline.
        left_ds = left_ds.materialize()
        right_ds = _bloom_filter_events(
            left_ds, right_ds, keys,
            {k: left_schema.field(k).type for k in keys})
    elif broadcast_left_keys:
        # small-left mode: the left key set is broadcast and events of other
        # keys never enter the shuffle (reference small-mode semi-join —
        # spark/TableUtils.scala:296-305). The left pipeline is executed an
        # extra time to collect the keys — only opt in when the left is
        # genuinely small.
        import ray as _ray

        key_pdf = left_ds.map_batches(
            lambda t: t.select(keys), batch_format="pyarrow").to_pandas()
        key_pdf = key_pdf.drop_duplicates()
        key_ref = _ray.put(key_pdf)

        class _KeyFilter:
            def __init__(self):
                self._set = None

            def __call__(self, t: pa.Table) -> pa.Table:
                if self._set is None:
                    kp = _ray.get(key_ref)
                    if len(keys) == 1:
                        self._set = pa.array(kp[keys[0]].unique())
                    else:
                        self._set = set(map(tuple, kp.itertuples(index=False)))
                if len(keys) == 1:
                    return t.filter(pc.is_in(t[keys[0]],
                                             value_set=self._set.cast(
                                                 t[keys[0]].type)))
                rows = t.select(keys).to_pandas()
                mask = [tuple(r) in self._set
                        for r in rows.itertuples(index=False)]
                return t.filter(pa.array(mask))

        right_ds = right_ds.map_batches(_KeyFilter(), batch_format="pyarrow")

    if hot_keys == "auto":
        from .salting import detect_hot_keys

        hot_keys = detect_hot_keys(right_ds, keys, num_partitions)
    # tie_break no longer disables salting for ANY part family:
    # - plain slice parts carry a (ts, tb) slot through the salted exchange
    #   (salting.partial_fields);
    # - bucketed slice parts wrap in TieBreakSliceOp so pickled IRs merge
    #   by (ts, tb) across shards;
    # - TOP_K/BOTTOM_K need no carve-out: their payload IS the ordering
    #   value, so equal-value winners across shards are observationally
    #   identical and the pickled heap merge is output-deterministic.
    # map-input parts salt too: their pickled {map_key: IR} partials merge
    # through MapPyOp in SaltedMerge (partial_fields routes them to the
    # pkl family), so no carve-out is needed.
    if hot_keys:
        if salt_shards is None:
            # hot-side parallelism = n_hot × shards distinct (key, salt)
            # groups — size it so the hot work can occupy ~2 tasks/cpu on
            # the cluster, floor 8 (the r1-measured break-even)
            import math as _math

            import ray as _ray

            cpus = int(_ray.cluster_resources().get("CPU", 8)) \
                if _ray.is_initialized() else 8
            salt_shards = max(8, _math.ceil(2 * cpus / max(1, len(hot_keys))))
        return _salted_temporal_join(
            left_ds, right_ds, conf, keys, parts, left_schema, right_schema,
            left_cols, num_partitions, daily, list(hot_keys), salt_shards,
            exact=exact_windows)

    unioned = _tagged_union(left_ds, right_ds, left_schema, right_schema,
                            keys, num_partitions)
    proc = TemporalPartition(keys, parts, right_schema, left_cols,
                             tie_break=conf.tie_break_column, daily=daily,
                             exact=exact_windows)
    return unioned.groupby("_part").map_groups(proc, batch_format="pyarrow")


def _bloom_hashes(t: pa.Table, keys: list, n_bits: int, key_types: dict):
    """(h1, h2) double-hash bases per row from the CANONICAL key hash —
    build and probe must hash identical representations: a null-bearing
    block float-promotes int keys in pandas (hash(5.0) != hash(5)), and a
    left/right dtype mismatch would likewise turn into bloom false
    NEGATIVES that silently drop matching events."""
    kdf = _canon_key_table(t, keys, key_types).to_pandas()
    h = stable_key_hash(kdf, keys).astype(np.uint64)
    h1 = h % np.uint64(n_bits)
    h2 = ((h >> np.uint64(33)) | np.uint64(1)) % np.uint64(n_bits)
    return h1, h2


def _bloom_filter_events(left_ds, right_ds, keys, key_types: dict,
                         bits_per_key: int = 12,
                         n_hashes: int = 6):
    """Semi-join filter on the event stream via a bloom filter of the left
    key set. Distributed build: each left block emits one fixed-size bitmap
    (never the keys), OR-reduced on the driver, broadcast once via ray.put.
    FP rate ≈ 0.5^(n_hashes) ≈ 1.5% at 12 bits/key."""
    import ray as _ray

    n_rows = max(left_ds.count(), 1)
    n_bits = 1 << max(20, int(np.ceil(np.log2(n_rows * bits_per_key))))
    n_words = n_bits // 64

    def block_bitmap(t: pa.Table) -> pa.Table:
        bm = np.zeros(n_words, dtype=np.uint64)
        if len(t):
            h1, h2 = _bloom_hashes(t, keys, n_bits, key_types)
            for i in range(n_hashes):
                pos = (h1 + np.uint64(i) * h2) % np.uint64(n_bits)
                np.bitwise_or.at(bm, (pos >> np.uint64(6)).astype(np.int64),
                                 np.uint64(1) << (pos & np.uint64(63)))
        return pa.table({"bm": pa.array([bm.tobytes()], type=pa.binary())})

    bits = np.zeros(n_words, dtype=np.uint64)
    for b in left_ds.map_batches(block_bitmap,
                                 batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        for buf in b["bm"]:
            bits |= np.frombuffer(buf.as_py(), dtype=np.uint64)
    bits_ref = _ray.put(bits)

    class _BloomFilter:
        def __init__(self):
            self._bits = None

        def __call__(self, t: pa.Table) -> pa.Table:
            if self._bits is None:
                self._bits = _ray.get(bits_ref)
            if len(t) == 0:
                return t
            h1, h2 = _bloom_hashes(t, keys, n_bits, key_types)
            mask = np.ones(len(t), dtype=bool)
            for i in range(n_hashes):
                pos = (h1 + np.uint64(i) * h2) % np.uint64(n_bits)
                word = self._bits[(pos >> np.uint64(6)).astype(np.int64)]
                mask &= ((word >> (pos & np.uint64(63)))
                         & np.uint64(1)).astype(bool)
            return t.filter(pa.array(mask))

    return right_ds.map_batches(_BloomFilter(), batch_format="pyarrow")


def _salted_temporal_join(left_ds, right_ds, conf, keys, parts, left_schema,
                          right_schema, left_cols, num_partitions, daily,
                          hot_keys: list, salt_shards: int,
                          exact: bool = False):
    """Single-pass salted plan: ONE scan of each input, ONE sort exchange.

    Cold rows hash into partitions [0, num_partitions); each hot
    (key, salt) pair gets its OWN dedicated partition id >= num_partitions
    (deterministic — hot work never shares a task with cold keys). The
    partition processor dispatches on the partition id: cold partitions
    emit finalized rows, hot partitions emit mergeable per-query partials;
    both come out of the same shuffle padded to one output schema, split by
    a flag column after a cheap materialize (output-sized), and the hot
    partials take the small second merge shuffle. The previous two-branch
    plan scanned, tagged and sorted the full event stream twice."""
    import uuid

    from .salting import SaltedMerge, partial_fields

    S = salt_shards

    fields = _union_fields(left_schema, right_schema)
    _ftypes = {f.name: f.type for f in fields}
    # the hot-key probe and all partition hashing run on the UNION key
    # types so cross-dtype left/right keys classify and partition alike.
    # Multi-key confs match on the stable COMPOSITE key hash: a cold key
    # whose hash collides with a hot one merely takes the salted path too
    # (the per-shard processor still groups by the real key columns, so
    # collisions cost routing, never correctness).
    hot_tuples = [k if isinstance(k, tuple) else (k,) for k in hot_keys]
    hot_tbl = pa.table({
        k: pa.array([tup[j] for tup in hot_tuples]).cast(_ftypes[k])
        for j, k in enumerate(keys)})
    hot_hash_arr = pa.array(stable_key_hash(
        _canon_key_table(hot_tbl, keys, _ftypes).to_pandas(), keys)
        .view(np.int64))
    fields = fields + [pa.field("_qid_hi", pa.int64()),
                       pa.field("_qid_lo", pa.int64()),
                       pa.field("_salt", pa.int8())]

    def _hot_idx(t: pa.Table) -> np.ndarray:
        kdf = _canon_key_table(t, keys, _ftypes).to_pandas()
        h = stable_key_hash(kdf, keys).view(np.int64)
        return pc.index_in(pa.array(h), value_set=hot_hash_arr) \
            .to_numpy(zero_copy_only=False)

    def _pad(t: pa.Table, extra: dict, is_q: int) -> pa.Table:
        n = len(t)
        cols = {}
        for f in fields:
            if f.name in extra:
                cols[f.name] = extra[f.name]
            elif f.name in t.column_names:
                c = t[f.name]
                cols[f.name] = c if c.type == f.type else pc.cast(c, f.type)
            else:
                cols[f.name] = pa.nulls(n, type=f.type)
        cols["_part"] = extra["_part"]
        cols["_is_q"] = pa.array(np.full(n, is_q, dtype=np.int8))
        return pa.table(cols)

    def tag_left(t: pa.Table) -> pa.Table:
        hi = _hot_idx(t)
        hot_mask = ~pd.isna(hi)
        cold_t = t.filter(pa.array(~hot_mask))
        hot_t = t.filter(pa.array(hot_mask))
        outs = []
        if len(cold_t):
            kdf = _canon_key_table(cold_t, keys, _ftypes).to_pandas()
            part = (stable_key_hash(kdf, keys)
                    % num_partitions).astype(np.int64)
            outs.append(_pad(cold_t, {
                "_part": pa.array(part),
                "_salt": pa.array(np.full(len(cold_t), -1, dtype=np.int8)),
            }, is_q=1))
        if len(hot_t):
            # replicate hot queries to every salt shard with collision-free
            # (_qid_hi random-63-bit batch id, _qid_lo dense ordinal) ids
            n = len(hot_t)
            idx = hi[hot_mask].astype(np.int64)
            base = uuid.uuid4().int & ((1 << 63) - 1)
            rep = pa.table({
                c: pa.concat_arrays(
                    [hot_t[c].combine_chunks()
                     if isinstance(hot_t[c], pa.ChunkedArray)
                     else hot_t[c]] * S)
                for c in hot_t.column_names})
            salt = np.repeat(np.arange(S, dtype=np.int64), n)
            part = num_partitions + np.tile(idx, S) * S + salt
            outs.append(_pad(rep, {
                "_part": pa.array(part),
                "_salt": pa.array(salt.astype(np.int8)),
                "_qid_hi": pa.array(
                    np.full(n * S, base, dtype=np.uint64).view(np.int64)),
                "_qid_lo": pa.array(np.tile(np.arange(n, dtype=np.int64), S)),
            }, is_q=1))
        if not outs:
            return _pad(t.slice(0, 0),
                        {"_part": pa.array([], type=pa.int64())}, is_q=1)
        return pa.concat_tables(outs)

    tag_left.__name__ = "salt_tag_left"

    def tag_events(t: pa.Table) -> pa.Table:
        # drop null-key events (reference removeNulls)
        m = pc.is_valid(t[keys[0]])
        for k2 in keys[1:]:
            m = pc.and_(m, pc.is_valid(t[k2]))
        t = t.filter(m)
        hi = _hot_idx(t)
        hot_mask = ~pd.isna(hi)
        cold_t = t.filter(pa.array(~hot_mask))
        hot_t = t.filter(pa.array(hot_mask))
        outs = []
        if len(cold_t):
            kdf = _canon_key_table(cold_t, keys, _ftypes).to_pandas()
            part = (stable_key_hash(kdf, keys)
                    % num_partitions).astype(np.int64)
            outs.append(_pad(cold_t, {
                "_part": pa.array(part),
                "_salt": pa.array(np.full(len(cold_t), -1, dtype=np.int8)),
            }, is_q=0))
        if len(hot_t):
            n = len(hot_t)
            idx = hi[hot_mask].astype(np.int64)
            salt = (np.arange(n, dtype=np.int64) % S)
            part = num_partitions + idx * S + salt
            outs.append(_pad(hot_t, {
                "_part": pa.array(part),
                "_salt": pa.array(salt.astype(np.int8)),
            }, is_q=0))
        if not outs:
            return _pad(t.slice(0, 0),
                        {"_part": pa.array([], type=pa.int64())}, is_q=0)
        return pa.concat_tables(outs)

    tag_events.__name__ = "salt_tag_events"

    unioned = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_events, batch_format="pyarrow"))

    cold_proc = TemporalPartition(keys, parts, right_schema, left_cols,
                                  tie_break=conf.tie_break_column, daily=daily,
                                  exact=exact)
    hot_proc = TemporalPartition([*keys, "_salt"], parts, right_schema,
                                 [*left_cols, "_qid_hi", "_qid_lo"],
                                 tie_break=conf.tie_break_column, daily=daily,
                                 emit_partials=True, exact=exact)
    final_fields = cold_proc.out_fields
    part_fields = partial_fields(
        parts, right_schema,
        tie_break=conf.tie_break_column if conf.tie_break_column
        and conf.tie_break_column in right_schema.names else None)
    out_schema = pa.schema(
        [left_schema.field(c) for c in left_cols]
        + final_fields
        + [f for f in part_fields
           if f.name not in {g.name for g in final_fields}]
        + [pa.field("_qid_hi", pa.int64()), pa.field("_qid_lo", pa.int64()),
           pa.field("_partial", pa.int8())])

    class _Dispatch:
        __name__ = "SaltedDispatch"

        def __call__(self, tbl: pa.Table) -> pa.Table:
            if len(tbl) == 0:
                return pa.table({f.name: pa.nulls(0, f.type)
                                 for f in out_schema})
            hot = int(tbl["_part"][0].as_py()) >= num_partitions
            res = (hot_proc if hot else cold_proc)(tbl)
            n = len(res)
            cols = {}
            for f in out_schema:
                if f.name == "_partial":
                    cols[f.name] = pa.array(
                        np.full(n, 1 if hot else 0, dtype=np.int8))
                elif f.name in res.column_names:
                    c = res[f.name]
                    cols[f.name] = c if c.type == f.type \
                        else pc.cast(c, f.type)
                else:
                    cols[f.name] = pa.nulls(n, type=f.type)
            return pa.table(cols)

    results = unioned.groupby("_part").map_groups(
        _Dispatch(), batch_format="pyarrow").materialize()

    final_order = [*left_cols, *[f.name for f in final_fields]]
    cold_rows = results.filter(expr="_partial == 0").map_batches(
        lambda t: t.select(final_order), batch_format="pyarrow")

    merge_parts = max(8, num_partitions // 8)

    def qid_part(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["_partial"], 1))
        hi = t["_qid_hi"].to_numpy(zero_copy_only=False).view(np.uint64)
        lo = t["_qid_lo"].to_numpy(zero_copy_only=False).view(np.uint64)
        mixed = (hi * np.uint64(0x9E3779B97F4A7C15)) ^ lo
        return t.append_column(
            "_part2",
            pa.array((mixed % np.uint64(merge_parts)).astype(np.int64)))

    merged = results.map_batches(qid_part, batch_format="pyarrow") \
        .groupby("_part2").map_groups(
            SaltedMerge(parts, left_cols, final_fields,
                        left_types={c: left_schema.field(c).type
                                    for c in left_cols
                                    if left_schema.get_field_index(c) >= 0},
                        tb_slice=bool(
                            conf.tie_break_column
                            and conf.tie_break_column in right_schema.names),
                        map_parts=frozenset(
                            p.output_name for p in parts
                            if p.input_column in right_schema.names
                            and pa.types.is_map(
                                right_schema.field(p.input_column).type))),
            batch_format="pandas")

    return cold_rows.union(
        merged.map_batches(lambda t: t.select(final_order),
                           batch_format="pyarrow"))


def ir_rec_to_py(p: AggregationPart, op: AggOp, row):
    """Grouped-path partial IR row (dict/rec of this op's unprefixed IR
    columns) → scalar py IR. Generic over every op — shared by the hop
    prebuild and the FinalBatchIr upload/serve path."""
    o = p.operation
    if o in (Operation.MIN, Operation.MAX):
        return row["x"]
    if o == Operation.UNIQUE_COUNT:
        u = row["uniq"]
        return set(u.tolist() if isinstance(u, np.ndarray) else u)
    if o == Operation.HISTOGRAM:
        h = row["hist"]
        return dict(h)
    if o == Operation.APPROX_HISTOGRAM_K:
        from ..aggregators.sketches import MG

        return MG.deserialize(row["sketch"])
    if o == Operation.APPROX_UNIQUE_COUNT:
        from ..aggregators.sketches import HLL

        return HLL.deserialize(row["sketch"])
    if o == Operation.APPROX_PERCENTILE:
        from ..aggregators.sketches import KLL

        return KLL.deserialize(row["sketch"])
    if o in (Operation.TOP_K, Operation.BOTTOM_K):
        return [tuple(t) for t in row["items"]]
    # prefix-family inner ops reach here only via BUCKETED parts (plain
    # prefix parts take the vectorized moments path)
    if o == Operation.SUM:
        return float(row["s"])
    if o == Operation.COUNT:
        return int(row["n"])
    if o == Operation.AVERAGE:
        return (float(row["s"]), int(row["n"]))
    if o in (Operation.VARIANCE, Operation.SKEW, Operation.KURTOSIS):
        nm = {Operation.VARIANCE: 2, Operation.SKEW: 3,
              Operation.KURTOSIS: 4}[o]
        return (float(row["n"]), float(row["m1"]),
                *[float(row[f"m{k}"]) for k in range(2, nm + 1)])
    if o in (Operation.FIRST, Operation.LAST):
        return (row["ts"], row["payload"])
    if o in (Operation.FIRST_K, Operation.LAST_K):
        return [tuple(t) for t in row["items"]]
    raise KeyError(o)
