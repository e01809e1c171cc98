"""Join orchestration: multi-part PITC joins, snapshot unrolling, derivations.

Re-expression of the reference's Join lifecycle (reference: spark/Join.scala
computeJoin; spark/JoinBase.scala:70-130 joinWithLeft; spark/GroupBy.scala:
143-168 snapshotEvents multi-day unrolling; api/Extensions.scala:1069-1120
derivations), Ray-Data-first:

- each joinPart's features are computed on the DEDUPED (key, ts) set
  (duplicate left rows ask the same question — compute once, fan out at
  assembly), via the temporal engine;
- assembly is ONE hash shuffle: left + every part's features co-partitioned
  on (keys, ts) and merged per partition (assembly.key_partitioned_join);
- SNAPSHOT accuracy reuses the same engine with DailyResolution hops and
  end-of-day query timestamps — no separate daily codepath.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..api import Accuracy, EventSource, GroupByConf, JoinConf, TQuery
from ..sources import read_parquet as _read_parquet, scan_source
from ..util import dataset_schema
from .assembly import key_partitioned_join
from .groupby import block_part_hash, stable_key_hash
from .temporal import temporal_join

MILLIS_DAY = 86_400_000
DEFAULT_NUM_PARTITIONS = 64


def apply_derivations(ds: ray.data.Dataset, derivations: Sequence[tuple],
                      base_columns: Optional[Sequence[str]] = None) -> ray.data.Dataset:
    """Post-agg projection (reference derivationProjection, Extensions.scala:
    1069-1120): entries are (out_name, expr) with expr ∈ {"*" passthrough,
    source column name, callable(batch)->Array}."""
    if not derivations:
        return ds

    def derive(batch: pa.Table) -> pa.Table:
        out: dict[str, pa.Array] = {}
        for name, expr in derivations:
            if name == "*" or expr == "*":
                for c in batch.column_names:
                    out.setdefault(c, batch[c])
            elif isinstance(expr, str):
                out[name] = batch[expr]
            else:
                arr = expr(batch)
                if isinstance(arr, np.ndarray):
                    arr = pa.array(arr)
                out[name] = arr
        return pa.table(out)

    return ds.map_batches(derive, batch_format="pyarrow")


def skew_filter(ds: ray.data.Dataset, skew_keys: Sequence[tuple]) -> ray.data.Dataset:
    """Drop rows whose key is a declared hot key (reference skewFilter,
    api/Extensions.scala:950-1000) — those keys are served by a dedicated
    salted path or excluded outright."""
    if not skew_keys:
        return ds

    def f(batch: pa.Table) -> pa.Table:
        mask = None
        for col, values in skew_keys:
            if col not in batch.column_names:
                continue
            m = pc.invert(pc.is_in(batch[col], value_set=pa.array(list(values))))
            mask = m if mask is None else pc.and_(mask, m)
        return batch.filter(mask) if mask is not None else batch

    return ds.map_batches(f, batch_format="pyarrow")


def distinct_rows(ds: ray.data.Dataset, cols: Sequence[str],
                  num_partitions: int = DEFAULT_NUM_PARTITIONS) -> ray.data.Dataset:
    """Distinct over `cols`: per-batch unique → hash shuffle → per-partition
    unique. Only the already-deduped rows cross the exchange."""
    cols = list(cols)
    col_schema = pa.schema([dataset_schema(ds).field(c) for c in cols])

    def local(batch: pa.Table) -> pa.Table:
        sub = batch.select(cols)
        pdf = sub.to_pandas().drop_duplicates()
        # rebuild with the DECLARED schema: a null-bearing block's pandas
        # float promotion would otherwise hash (and emit) a different key
        # representation than null-free blocks — splitting one key's rows
        # across partitions so the global dedup misses duplicates
        t = pa.Table.from_pandas(pdf, schema=col_schema,
                                 preserve_index=False)
        t = t.replace_schema_metadata(None)
        part = block_part_hash(t, cols, num_partitions)
        return t.append_column("_part", pa.array(part))

    def global_(pdf: pd.DataFrame) -> pa.Table:
        out = pdf.drop_duplicates(cols)[cols]
        return pa.Table.from_pandas(out, schema=col_schema,
                                    preserve_index=False).replace_schema_metadata(None)

    global_.__name__ = "distinct_merge"
    return ds.map_batches(local, batch_format="pyarrow") \
        .groupby("_part").map_groups(global_, batch_format="pandas")


def snapshot_events_unrolled(
    events: ray.data.Dataset,
    conf: GroupByConf,
    ds_values: Sequence[str],
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    events_schema: Optional[pa.Schema] = None,
) -> ray.data.Dataset:
    """Multi-day snapshot GroupBy: one row per (key, ds) with end-of-day
    accuracy — the reference's snapshotEventsBase unrolling (GroupBy.scala:
    143-168) expressed as a temporal join against a synthesized left grid of
    (distinct keys × requested days) with EOD query timestamps and
    DailyResolution tails."""
    keys = list(conf.key_columns)
    schema = events_schema or dataset_schema(events)
    keys_ds = distinct_rows(events, keys, num_partitions)
    eods = {ds_val: (int(pd.Timestamp(ds_val).timestamp()) // 86400 + 1) * MILLIS_DAY
            for ds_val in ds_values}

    def explode_days(batch: pa.Table) -> pa.Table:
        n = len(batch)
        reps = len(eods)
        cols = {k: pa.concat_arrays([batch[k].combine_chunks()
                                     if isinstance(batch[k], pa.ChunkedArray)
                                     else batch[k]] * reps)
                for k in keys}
        ds_arr, ts_arr = [], []
        for ds_val, eod in sorted(eods.items()):
            ds_arr.extend([ds_val] * n)
            ts_arr.extend([eod] * n)
        cols["ds"] = pa.array(ds_arr, type=pa.string())
        cols["ts"] = pa.array(ts_arr, type=pa.int64())
        return pa.table(cols)

    grid = keys_ds.map_batches(explode_days, batch_format="pyarrow")
    return temporal_join(grid, events, conf, num_partitions=num_partitions,
                         right_schema=schema, daily=True)


def compute_join(
    jc: JoinConf,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> ray.data.Dataset:
    """Full multi-part join: left ⟕ features of every joinPart, PITC."""
    left = scan_source(jc.left)
    left = skew_filter(left, jc.skew_keys)
    feats = []
    feat_keys: list[list[str]] = []
    part_left_keys: Optional[list[str]] = None
    any_snapshot = any((p.group_by.accuracy or Accuracy.TEMPORAL)
                       == Accuracy.SNAPSHOT for p in jc.parts)
    if any_snapshot:
        # SNAPSHOT-accuracy parts are "features as of end of ds-1": the
        # query instant is the row's day boundary floor(ts/1d)*1d, so every
        # left row in a day shares one feature row and same-day events are
        # excluded (reference: spark/JoinBase.scala:142-156 snapshotEvents).
        def add_ts_d(t: pa.Table) -> pa.Table:
            ts = t["ts"].to_numpy(zero_copy_only=False).astype(np.int64)
            return t.append_column(
                "_ts_d", pa.array((ts // MILLIS_DAY) * MILLIS_DAY))

        left = left.map_batches(add_ts_d, batch_format="pyarrow")
    for part in jc.parts:
        gb = part.group_by
        right = None
        right_schema = None
        for src in gb.sources:
            s = scan_source(src)
            if right is None:
                right, right_schema = s, dataset_schema(s)
            else:
                right = right.union(s)
        # left column for each right key (keyMapping, JoinBase.scala:87-101)
        r2l = part.right_to_left()
        left_key_cols = [r2l.get(k, k) for k in gb.key_columns]
        if part_left_keys is None:
            part_left_keys = left_key_cols
        elif part_left_keys != left_key_cols:
            raise NotImplementedError(
                "parts with different left key sets need per-part assembly "
                "keys; split the join")
        accuracy = gb.accuracy or Accuracy.TEMPORAL
        snapshot = accuracy == Accuracy.SNAPSHOT
        ts_col = "_ts_d" if snapshot else "ts"
        kt = left.map_batches(
            lambda t, cols=tuple([*left_key_cols, ts_col]),
            names=tuple([*gb.key_columns, "ts"]):
                t.select(list(cols)).rename_columns(list(names)),
            batch_format="pyarrow")
        kt = distinct_rows(kt, [*gb.key_columns, "ts"], num_partitions)
        f = temporal_join(kt, right, gb, num_partitions=num_partitions,
                          right_schema=right_schema, daily=snapshot)
        prefix = part.full_prefix
        rename = {p.output_name: f"{prefix}_{p.output_name}" for p in gb.parts()}
        rename.update(dict(zip(gb.key_columns, left_key_cols)))
        if snapshot:
            rename["ts"] = "_ts_d"

        def fix_names(t: pa.Table, r=tuple(rename.items())):
            m = dict(r)
            return t.rename_columns([m.get(c, c) for c in t.column_names])

        f = f.map_batches(fix_names, batch_format="pyarrow")
        feats.append(f)
        feat_keys.append([*left_key_cols, ts_col])
    join_keys = [*(part_left_keys or []), "ts"]
    if any_snapshot:
        out = key_partitioned_join(
            left, feats, keys=join_keys, how="left",
            num_partitions=num_partitions, right_keys=feat_keys,
            hash_keys=part_left_keys or [])
        out = out.map_batches(lambda t: t.drop_columns(["_ts_d"]),
                              batch_format="pyarrow")
    else:
        out = key_partitioned_join(left, feats, keys=join_keys, how="left",
                                   num_partitions=num_partitions)
    return apply_derivations(out, jc.derivations)


def entity_snapshot_join(
    left: ray.data.Dataset,
    snapshots: ray.data.Dataset,
    keys: Sequence[str],
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    snapshot_lag_days: int = 1,
) -> ray.data.Dataset:
    """Events × daily entity snapshots: each left row (key, ts) joins the
    snapshot row of ``date(ts) − lag`` — "features as of yesterday end-of-day"
    (reference: spark/JoinBase.scala:70-130 joinWithLeft key matrix — events ×
    SNAPSHOT entities join on keys + ts_ds with the right shifted one day;
    spark/Extensions.scala:249-274 ts_ds derivation).

    Null-key contract: snapshot rows with a null key (or null ds) never
    match — SQL equality — while null-keyed LEFT rows survive with null
    features. The assembly primitive underneath matches null-to-null
    (fan-out semantics), so the snapshot side is pruned here."""
    from functools import partial

    from ..util import drop_null_key_rows

    lag_ms = snapshot_lag_days * MILLIS_DAY
    snapshots = snapshots.map_batches(
        partial(drop_null_key_rows, keys=[*keys, "ds"]),
        batch_format="pyarrow")

    def add_join_ds(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype(np.int64)
        days = ((ts - lag_ms) // MILLIS_DAY).astype("datetime64[D]")
        return t.append_column("_join_ds",
                               pa.array(np.datetime_as_string(days, unit="D")))

    left2 = left.map_batches(add_join_ds, batch_format="pyarrow")

    def rename_ds(t: pa.Table) -> pa.Table:
        return t.rename_columns(["_join_ds" if c == "ds" else c
                                 for c in t.column_names])

    right2 = snapshots.map_batches(rename_ds, batch_format="pyarrow")
    out = key_partitioned_join(left2, [right2], keys=[*keys, "_join_ds"],
                               how="left", num_partitions=num_partitions)
    return out.map_batches(lambda t: t.drop_columns(["_join_ds"]),
                           batch_format="pyarrow")


def label_join(
    features: ray.data.Dataset,
    label_events: ray.data.Dataset,
    conf: GroupByConf,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    features_schema: Optional[pa.Schema] = None,
    labels_schema: Optional[pa.Schema] = None,
) -> ray.data.Dataset:
    """Forward-looking label attachment (reference: spark/LabelJoin.scala:
    35-284 — label GroupBys joined back to feature rows over a future
    window): for each feature row (key, ts) and each AggregationPart with
    window W, aggregate label events with ``ts < e.ts ≤ hop_round_up(ts+W)``.

    Implemented by **time reversal** of the PITC engine: negate both sides'
    timestamps and run the strict as-of join — "strictly before" in negated
    time is "strictly after" in real time, and the hop-rounded tail becomes
    the hop-rounded end of the label window. No second engine.

    Order-dependent ops are **mirrored** before running the negated engine
    (FIRST↔LAST, FIRST_K↔LAST_K): "latest label" = smallest negated ts =
    FIRST in negated time. The mirrored K-list ordering also comes out
    right: FIRST_K ascending on −ts == LAST_K descending on ts. Numeric
    tie-break columns are negated alongside ts; TOP_K/BOTTOM_K order by
    value and are unaffected.
    """
    from dataclasses import replace

    from ..api import Operation
    from ..util import dataset_schema as _ds

    features_schema = features_schema or _ds(features)
    labels_schema = labels_schema or _ds(label_events)

    _MIRROR = {Operation.FIRST: Operation.LAST,
               Operation.LAST: Operation.FIRST,
               Operation.FIRST_K: Operation.LAST_K,
               Operation.LAST_K: Operation.FIRST_K}
    order_dep = any(a.operation in _MIRROR for a in conf.aggregations)
    rename_back: dict[str, str] = {}
    neg_cols = ["ts"]
    if order_dep:
        new_aggs = []
        for a in conf.aggregations:
            if a.operation in _MIRROR:
                m = replace(a, operation=_MIRROR[a.operation])
                for orig_p, mir_p in zip(a.unpack(), m.unpack()):
                    rename_back[mir_p.output_name] = orig_p.output_name
                new_aggs.append(m)
            else:
                new_aggs.append(a)
        conf = replace(conf, aggregations=tuple(new_aggs))
        tb = conf.tie_break_column
        if tb is not None:
            f = labels_schema.field(tb)
            if not (pa.types.is_integer(f.type) or pa.types.is_floating(f.type)):
                raise NotImplementedError(
                    "label_join with FIRST/LAST parts needs a numeric "
                    f"tie_break_column to mirror ordering (got {f.type})")
            if any(a.input_column == tb for a in conf.aggregations):
                raise NotImplementedError(
                    "label_join: aggregating the tie_break column itself is "
                    "not supported with FIRST/LAST parts (its values are "
                    "negated to mirror ordering)")
            neg_cols.append(tb)

    def negate(t: pa.Table, cols=tuple(neg_cols)) -> pa.Table:
        for c in cols:
            if c not in t.column_names:
                continue
            v = t[c].to_numpy(zero_copy_only=False)
            idx = t.column_names.index(c)
            t = t.set_column(idx, c, pa.array(-v))
        return t

    # the tie-break column is only mirrored on the label (event) side —
    # a same-named passthrough column on the left must come out untouched
    f_neg = features.map_batches(
        lambda t: negate(t, cols=("ts",)), batch_format="pyarrow")
    l_neg = label_events.map_batches(negate, batch_format="pyarrow")
    out = temporal_join(f_neg, l_neg, conf, num_partitions=num_partitions,
                        left_schema=features_schema,
                        right_schema=labels_schema)

    def unnegate(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = t.column_names.index("ts")
        t = t.set_column(idx, "ts", pa.array(-ts))
        if rename_back:
            t = t.rename_columns([rename_back.get(c, c)
                                  for c in t.column_names])
        return t

    return out.map_batches(unnegate, batch_format="pyarrow")


def pad_external_parts(ds: ray.data.Dataset,
                       fields: Sequence[pa.Field]) -> ray.data.Dataset:
    """Offline stand-in for online-only external/contextual parts: append the
    declared fields as typed NULL columns (reference: spark/Join.scala:93-123
    — external parts are fetch-time lookups; offline output pads them)."""

    def pad(t: pa.Table) -> pa.Table:
        for f in fields:
            if f.name not in t.column_names:
                t = t.append_column(f.name, pa.nulls(len(t), type=f.type))
        return t

    return ds.map_batches(pad, batch_format="pyarrow")


class _CoalescedMerge:
    """Per-partition left⟕right merge that COALESCES same-named value
    columns (left value wins when present) and records which bootstrap rows
    matched — the reference's coalescedJoin + matched_hashes lineage
    (spark/JoinUtils.scala:137-172; spark/Join.scala:588-593)."""

    __name__ = "CoalescedMerge"

    def __init__(self, keys: Sequence[str], left_cols: list[str],
                 right_cols: list[str], types: dict, part_hash: str):
        self.keys = list(keys)
        self.left_cols = left_cols
        self.right_cols = right_cols
        self.types = types
        self.part_hash = part_hash

    def __call__(self, pdf: pd.DataFrame) -> pa.Table:
        import pandas as _pd

        from .assembly import pandas_to_arrow

        left = pdf[pdf["_src"] == 0][self.left_cols].reset_index(drop=True)
        right = pdf[pdf["_src"] == 1][self.right_cols].reset_index(drop=True)
        right = right.drop_duplicates(self.keys)
        shared = [c for c in self.right_cols
                  if c in self.left_cols and c not in self.keys]
        merged = left.merge(right, on=self.keys, how="left",
                            suffixes=("", "__bs"), indicator="_matched")
        hit = (merged["_matched"] == "both").to_numpy()
        for c in shared:
            bs = merged[f"{c}__bs"]
            merged[c] = merged[c].combine_first(bs)
            merged = merged.drop(columns=[f"{c}__bs"])
        merged = merged.drop(columns=["_matched"])
        # matched_hashes: accumulate this bootstrap's hash on covered rows
        prev = merged["matched_hashes"] if "matched_hashes" in merged else             _pd.Series([None] * len(merged))
        merged["matched_hashes"] = [
            ((list(p) if isinstance(p, (list, np.ndarray)) else [])
             + ([self.part_hash] if h else [])) or None
            for p, h in zip(prev, hit)
        ]
        types = dict(self.types)
        types["matched_hashes"] = pa.list_(pa.string())
        return pandas_to_arrow(merged, types)


def bootstrap_join(
    left: ray.data.Dataset,
    bootstrap: ray.data.Dataset,
    row_ids: Sequence[str],
    part_hash: str,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> ray.data.Dataset:
    """left ⟕ one bootstrap table on row_ids, coalescing shared columns and
    recording ``matched_hashes`` lineage (reference Join.scala:517-609)."""
    from .assembly import _TagPad
    from ..util import dataset_schema

    ls, rs = dataset_schema(left), dataset_schema(bootstrap)
    union_fields: list[pa.Field] = []
    seen: set[str] = set()
    for sch in (ls, rs):
        for f in sch:
            if f.name not in seen:
                seen.add(f.name)
                union_fields.append(f)
    types = {f.name: f.type for f in union_fields}
    tl = left.map_batches(_TagPad(0, union_fields, num_partitions, row_ids),
                          batch_format="pyarrow")
    tr = bootstrap.map_batches(_TagPad(1, union_fields, num_partitions, row_ids),
                               batch_format="pyarrow")
    merge = _CoalescedMerge(row_ids, list(ls.names), list(rs.names), types,
                            part_hash)
    return tl.union(tr).groupby("_part").map_groups(merge, batch_format="pandas")


def covering_sets(
    bootstrapped: ray.data.Dataset,
    part_columns: dict[str, Sequence[str]],
) -> dict[str, ray.data.Dataset]:
    """Which left rows still need each part computed: a row is COVERED for a
    part when every one of the part's output columns is non-null after
    bootstrap (reference CoveringSet analysis, Join.scala:135-216). Returns
    {part_name: dataset of rows needing backfill}."""
    out = {}
    for name, cols in part_columns.items():
        cols = [c for c in cols]

        def need(t: pa.Table, cs=tuple(cols)) -> pa.Table:
            mask = None
            for c in cs:
                m = pc.is_null(t[c]) if c in t.column_names else None
                if m is None:
                    return t  # column absent → everything needs compute
                mask = m if mask is None else pc.or_(mask, m)
            return t.filter(mask) if mask is not None else t

        need.__name__ = f"need_{name}"
        out[name] = bootstrapped.map_batches(need, batch_format="pyarrow")
    return out


def compute_join_bootstrapped(
    jc: JoinConf,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> ray.data.Dataset:
    """compute_join with the bootstrap lifecycle (reference Join.computeJoin
    steps 4-6, Join.scala:48-63, 135-216, 517-635):

    1. left ⟕ each bootstrap table on row_ids (coalesce + matched_hashes);
    2. covering-set analysis: a part is computed only for left rows whose
       bootstrap columns are incomplete;
    3. computed features coalesce INTO the bootstrap columns (bootstrap wins
       where present) at a single co-partitioned assembly.
    """
    import hashlib

    if not jc.bootstrap_parts:
        return compute_join(jc, num_partitions)
    assert jc.row_ids, "bootstrap joins need JoinConf.row_ids"
    left = scan_source(jc.left)
    left = skew_filter(left, jc.skew_keys)

    # declared feature columns of every part (bootstrap may cover a subset)
    part_cols = {
        part.full_prefix: [f"{part.full_prefix}_{p.output_name}"
                           for p in part.group_by.parts()]
        for part in jc.parts
    }
    all_feat_cols = [c for cols in part_cols.values() for c in cols]

    # left must carry typed columns for every feature so coalescing is
    # well-defined even for rows no bootstrap covers
    proto_fields = []
    for part in jc.parts:
        gb = part.group_by
        src_schema = dataset_schema(scan_source(gb.sources[0]))
        for p in gb.parts():
            in_type = src_schema.field(p.input_column).type
            from ..aggregators.ops import OPS as _OPS

            explode = (pa.types.is_list(in_type) or pa.types.is_large_list(in_type))
            el = in_type.value_type if explode and p.operation.name in (
                "SUM", "COUNT", "AVERAGE") else in_type
            proto_fields.append(
                pa.field(f"{part.full_prefix}_{p.output_name}",
                         _OPS[p.operation].output_arrow_type(el, p)))
    left = pad_external_parts(left, proto_fields)

    booted = left
    for bp in jc.bootstrap_parts:
        bds = bp.table if isinstance(bp.table, ray.data.Dataset) else             _read_parquet(bp.table)
        h = hashlib.md5(repr(bp).encode()).hexdigest()[:12]
        booted = bootstrap_join(booted, bds,
                                row_ids=list(bp.row_ids or jc.row_ids),
                                part_hash=h, num_partitions=num_partitions)
    booted = booted.materialize()  # reused by every part's covering set

    need = covering_sets(booted, part_cols)
    feats = []
    part_left_keys = None
    for part in jc.parts:
        gb = part.group_by
        right = None
        right_schema = None
        for src in gb.sources:
            sds = scan_source(src)
            if right is None:
                right, right_schema = sds, dataset_schema(sds)
            else:
                right = right.union(sds)
        r2l = part.right_to_left()
        left_key_cols = [r2l.get(k, k) for k in gb.key_columns]
        part_left_keys = part_left_keys or left_key_cols
        needed = need[part.full_prefix]
        kt = needed.map_batches(
            lambda t, cols=tuple([*left_key_cols, "ts"]),
            names=tuple([*gb.key_columns, "ts"]):
                t.select(list(cols)).rename_columns(list(names)),
            batch_format="pyarrow")
        kt = distinct_rows(kt, [*gb.key_columns, "ts"], num_partitions)
        f = temporal_join(kt, right, gb, num_partitions=num_partitions,
                          right_schema=right_schema)
        prefix = part.full_prefix
        # computed columns land under __c and coalesce in the final pass
        rename = {p.output_name: f"{prefix}_{p.output_name}__c"
                  for p in gb.parts()}
        rename.update(dict(zip(gb.key_columns, left_key_cols)))

        def fix_names(t: pa.Table, r=tuple(rename.items())):
            m = dict(r)
            return t.rename_columns([m.get(c, c) for c in t.column_names])

        feats.append(f.map_batches(fix_names, batch_format="pyarrow"))

    join_keys = [*(part_left_keys or []), "ts"]
    out = key_partitioned_join(booted, feats, keys=join_keys, how="left",
                               num_partitions=num_partitions)

    def coalesce(t: pa.Table) -> pa.Table:
        for c in all_feat_cols:
            cc = f"{c}__c"
            if cc in t.column_names:
                base = t[c] if not isinstance(t[c], pa.ChunkedArray) else t[c].combine_chunks()
                comp = t[cc] if not isinstance(t[cc], pa.ChunkedArray) else t[cc].combine_chunks()
                if comp.type != base.type:
                    comp = pc.cast(comp, base.type, safe=False)
                merged = pc.if_else(pc.is_valid(base), base, comp)
                t = t.set_column(t.column_names.index(c), c, merged)
                t = t.drop_columns([cc])
        return t

    out = out.map_batches(coalesce, batch_format="pyarrow")
    return apply_derivations(out, jc.derivations)


# ------------------------------------------------- label lifecycle


def label_join_versioned(
    features: ray.data.Dataset,
    label_events: ray.data.Dataset,
    conf: GroupByConf,
    label_ds: str,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    **kw,
) -> ray.data.Dataset:
    """One label-table VERSION (reference spark/LabelJoin.scala:35-120 —
    labels computed as of a label_ds land in a label_ds-stamped partition):
    label events are truncated to those visible by end of ``label_ds`` and
    the output rows are stamped with the version column, so successive
    label_ds runs materialize side by side and can be compared/upgraded."""
    eod = (int(pd.Timestamp(label_ds).timestamp()) // 86_400 + 1) * 86_400_000

    def visible(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(ts < eod))

    labels_cut = label_events.map_batches(visible, batch_format="pyarrow")
    out = label_join(features, labels_cut, conf,
                     num_partitions=num_partitions, **kw)
    return out.map_batches(
        lambda t: t.append_column("label_ds",
                                  pa.array([label_ds] * len(t))),
        batch_format="pyarrow")


def latest_label_view(
    versions: Sequence[ray.data.Dataset],
    keys: Sequence[str],
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> ray.data.Dataset:
    """The LATEST label per feature row across label_ds versions
    (reference LabelJoin's labeled-latest view): union the version tables,
    hash-partition on the row identity (keys + ts) and keep the row with
    the max label_ds. One shuffle; versions can be lazily-read partitions."""
    ident = [*keys, "ts"]
    unioned = versions[0].union(*versions[1:]) if len(versions) > 1 \
        else versions[0]

    # hash UNIFIED identity types: independently-persisted versions may
    # disagree on declared dtypes for the same column (e.g. one written
    # from a null-padded pandas frame as double) — without this, the same
    # identity lands in different partitions and keep_latest never
    # compares the versions
    ident_types = {c: dataset_schema(versions[0]).field(c).type
                   for c in ident}

    def tag(t: pa.Table) -> pa.Table:
        # canonical block hash: a null-bearing block must not split an
        # identity across partitions (keep_latest would emit duplicates)
        part = block_part_hash(t, ident, num_partitions,
                               types_by_name=ident_types)
        return t.append_column("_part", pa.array(part))

    def keep_latest(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("label_ds", kind="stable")
        # dropna=False: a null-keyed feature identity is still an identity
        # — the default pandas groupby would silently drop the row from
        # the latest view entirely
        out = pdf.groupby(ident, sort=False, as_index=False,
                          dropna=False).tail(1)
        return out.drop(columns=["_part"])

    keep_latest.__name__ = "keep_latest"
    return unioned.map_batches(tag, batch_format="pyarrow") \
        .groupby("_part").map_groups(keep_latest, batch_format="pandas")
