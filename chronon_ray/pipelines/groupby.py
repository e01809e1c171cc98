"""Snapshot GroupBy: partial-aggregate per batch, shuffle partials, merge+finalize.

The physical pattern mirrors the reference's `aggregateByKey(init)(seqOp,
combOp)` (reference: spark/GroupBy.scala:128-133, 364-378) as the classic Ray
Data combiner: a stateless `map_batches` stage computes one IR row per key per
batch (vectorized pandas/numpy via RowAggregator), keyed by
``_part = hash(keys) % P``; a `groupby("_part").map_groups` stage merges all
partials of a hash partition **vectorized across keys** (no per-key python
call) and finalizes. Only the small partial-IR rows cross the shuffle — the
raw input never does.

Bucketed aggregations (map output per bucket value — reference
aggregator/row/BucketedColumnAggregator.scala:1-94) run the same pipeline at
(keys + bucket) granularity, partitioned by hash(keys) only, so the pivot to a
map column happens inside the same merge task with no extra shuffle.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..api import AggregationPart, GroupByConf
from ..aggregators.row import RowAggregator

DEFAULT_NUM_PARTITIONS = 200


def stable_key_hash(df: pd.DataFrame, keys: Sequence[str]) -> np.ndarray:
    """Deterministic 64-bit hash of the key columns (process-independent —
    pandas hash_pandas_object uses a fixed siphash key). The explicit analog
    of the reference's murmur3 KeyWithHash (spark/FastHashing.scala:44-119)."""
    h = pd.util.hash_pandas_object(df[list(keys)], index=False).to_numpy()
    return h


def canon_key_table(t: pa.Table, keys, types_by_name) -> pa.Table:
    """Key columns cast to the UNION field types, with int nulls parked on
    a sentinel so the pandas conversion keeps a stable int64 dtype — both
    sides of a co-partition MUST hash identical representations (a raw
    float64 left key vs int64 event key would land in different
    partitions and silently produce all-null features)."""
    import pyarrow.compute as pc

    cols = {}
    for k in keys:
        c = t[k]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        ft = types_by_name[k]
        if c.type != ft:
            c = pc.cast(c, ft)
        if pa.types.is_integer(c.type) and c.null_count:
            sent = np.iinfo(c.type.to_pandas_dtype()).min + 1
            c = pc.fill_null(c, pa.scalar(sent, type=c.type))
        elif pa.types.is_boolean(c.type) and c.null_count:
            # bool-with-null promotes to object dtype in pandas and
            # hash(True as object) != hash(True as bool) — fill so every
            # block hashes the same dtype (null routes like False; a
            # routing collision is harmless)
            c = pc.fill_null(c, False)
        cols[k] = c
    return pa.table(cols)


def canon_key_hash(t: pa.Table, keys, types_by_name,
                   num_partitions: int) -> np.ndarray:
    """Partition ids from canonicalized key columns (see canon_key_table)."""
    kdf = canon_key_table(t, keys, types_by_name).to_pandas()
    return (stable_key_hash(kdf, keys) % num_partitions).astype(np.int64)


def block_part_hash(t: pa.Table, keys, num_partitions: int,
                    types_by_name=None) -> np.ndarray:
    """Partition ids from a raw Arrow block, canonicalized so the SAME key
    hashes identically in EVERY block: to_pandas float-promotes an int key
    column whenever the block carries any null, and hash(5.0) != hash(5)
    would split one key's rows across partitions (duplicate groups, missed
    joins, bloom false negatives). Pass ``types_by_name`` when blocks from
    multiple sources may disagree on declared key dtypes."""
    types = types_by_name or {k: t.schema.field(k).type for k in keys}
    return canon_key_hash(t, keys, types, num_partitions)


def left_field_type(left_fields, name: str):
    for f in left_fields:
        if f.name == name:
            return f.type
    return None


def left_column_array(left_fields, name: str, vals: list) -> pa.Array:
    """Left/passthrough column values → Arrow, cast back to the declared
    query schema (NaN→null via from_pandas; integral float64 — the pandas
    null-padded-union promotion — casts back safely). Shared by the serve
    and mutation-replay partitions."""
    import pyarrow.compute as pc

    arr = pa.array(vals, from_pandas=True)
    ft = left_field_type(left_fields, name)
    if ft is not None and arr.type != ft:
        arr = pc.cast(arr, ft)
    return arr


def _factorize_keys(pdf: pd.DataFrame, keys: Sequence[str]):
    if len(keys) == 1:
        codes, uniques = pd.factorize(pdf[keys[0]], use_na_sentinel=False)
        kdf = pd.DataFrame({keys[0]: uniques})
    else:
        idx = pd.MultiIndex.from_frame(pdf[list(keys)])
        codes, uniques = idx.factorize(use_na_sentinel=False)
        kdf = uniques.to_frame(index=False)
        kdf.columns = list(keys)
    return codes.astype(np.int64), kdf


class PartialAgg:
    """Stage-1 callable: Arrow batch in → Arrow IR-partials out."""

    def __init__(self, conf_keys: Sequence[str], parts: list[AggregationPart],
                 input_schema: pa.Schema, num_partitions: int,
                 tie_break: Optional[str] = None, part_keys: Optional[Sequence[str]] = None):
        self.keys = list(conf_keys)  # granularity of aggregation (may incl. bucket)
        self.part_keys = list(part_keys or conf_keys)  # granularity of partitioning
        self.num_partitions = num_partitions
        self.agg = RowAggregator(parts, input_schema, tie_break_column=tie_break)

    def __call__(self, batch: pa.Table) -> pa.Table:
        key_cols = batch.select(self.keys).to_pandas()
        # drop rows where ALL conf keys are null (reference
        # GroupBy.scala:510-512) — judged over part_keys, i.e. the conf key
        # columns: in the bucketed pipeline self.keys additionally carries
        # the bucket column, which must NOT rescue a null-keyed row
        valid = ~key_cols[self.part_keys].isna().all(axis=1)
        if not valid.all():
            batch = batch.filter(pa.array(valid.to_numpy()))
            key_cols = key_cols[valid.to_numpy()].reset_index(drop=True)
        if len(batch) == 0:
            fields = ([pa.field(k, batch.schema.field(k).type) for k in self.keys]
                      + [pa.field("_part", pa.int64())] + self.agg.ir_fields())
            return pa.Table.from_arrays(
                [pa.array([], type=f.type) for f in fields], schema=pa.schema(fields))
        codes, kdf = _factorize_keys(key_cols, self.keys)
        irf = self.agg.partial_frame(batch, codes, len(kdf))
        # irf 'g' indexes into kdf rows
        sel = irf["g"].to_numpy()
        key_arrays = {}
        for k in self.keys:
            # from_pandas: factorize renders a null key as float NaN in its
            # uniques, which must serialize as an Arrow null (a partially-
            # null multi-key or null-key-in-bucketed group is kept)
            key_arrays[k] = pa.array(kdf[k].to_numpy(dtype=object)[sel],
                                     type=batch.schema.field(k).type,
                                     from_pandas=True)
        # hash the CANONICAL Arrow representation, never the pandas frame:
        # to_pandas float-promotes an int key column whenever the batch has
        # any null, and hash(5.0) != hash(5) would split one key's partials
        # across partitions → duplicate output rows per key
        key_tbl = pa.table({k: key_arrays[k] for k in self.part_keys})
        types = {k: batch.schema.field(k).type for k in self.part_keys}
        part_hash = canon_key_hash(key_tbl, self.part_keys, types,
                                   self.num_partitions)
        key_arrays["_part"] = pa.array(part_hash.astype(np.int64))
        return self.agg.ir_frame_to_arrow(irf, key_arrays)


class MergeFinalize:
    """Stage-2 callable: all partial rows of one hash partition (pandas) →
    finalized feature rows. Vectorized across every key in the partition."""

    def __init__(self, keys: Sequence[str], parts: list[AggregationPart],
                 input_schema: pa.Schema, tie_break: Optional[str] = None,
                 pivot_bucket: Optional[str] = None, out_keys: Optional[Sequence[str]] = None):
        self.__name__ = type(self).__name__  # ray map_groups wraps fn.__name__
        self.keys = list(keys)
        self.agg = RowAggregator(parts, input_schema, tie_break_column=tie_break)
        self.pivot_bucket = pivot_bucket  # bucket column to pivot into map outputs
        self.out_keys = list(out_keys or self.keys)
        self.input_schema = input_schema

    def __call__(self, pdf: pd.DataFrame) -> pa.Table:
        pdf = pdf.reset_index(drop=True)
        codes, kdf = _factorize_keys(pdf, self.keys)
        irf = self.agg.ir_frame_from_pandas(pdf)
        irf = irf.drop(columns=[c for c in (*self.keys, "_part") if c in irf.columns])
        irf["g"] = codes
        # reindex to EVERY key present in the input: a key whose inputs are
        # all null still gets an output row with null features (SQL GROUP BY
        # / Spark aggregateByKey semantics) — merge_frame alone would drop it
        merged = self.agg.merge_frame(irf).set_index("g") \
            .reindex(np.unique(codes)).reset_index()
        fin = self.agg.finalize_frame(merged)
        sel = fin["g"].to_numpy()
        out_cols: dict[str, pa.Array] = {}
        if self.pivot_bucket is None:
            for k in self.keys:
                out_cols[k] = pa.array(kdf[k].to_numpy(dtype=object)[sel],
                                       type=self.input_schema.field(k).type,
                                       from_pandas=True)
            for f in self.agg.output_fields():
                out_cols[f.name] = pa.array(fin[f.name].tolist(), type=f.type)
            return pa.table(out_cols)
        # pivot: keys = out_keys + [bucket]; one output row per out_keys combo,
        # each part becomes map<bucket, value>
        fin_keys = kdf.iloc[sel].reset_index(drop=True)
        fin = pd.concat([fin_keys, fin.drop(columns="g").reset_index(drop=True)], axis=1)
        grouped = fin.groupby(self.out_keys, dropna=False, sort=True)
        out_rows = {k: [] for k in self.out_keys}
        maps: dict[str, list] = {f.name: [] for f in self.agg.output_fields()}
        for gk, gdf in grouped:
            if not isinstance(gk, tuple):
                gk = (gk,)
            for k, v in zip(self.out_keys, gk):
                out_rows[k].append(v)
            for f in self.agg.output_fields():
                # null bucket values can't be map keys — drop them, matching
                # the temporal path's valid &= is_valid(bucket) semantics
                entries = [
                    (b, v) for b, v in zip(gdf[self.pivot_bucket], gdf[f.name])
                    if v is not None and b is not None
                    and not (isinstance(b, float) and np.isnan(b))
                ]
                entries.sort(key=lambda t: str(t[0]))
                maps[f.name].append(entries if entries else None)
        for k in self.out_keys:
            out_cols[k] = pa.array(out_rows[k],
                                   type=self.input_schema.field(k).type,
                                   from_pandas=True)
        for f in self.agg.output_fields():
            # bucketed output name carries the _by_ suffix
            out_cols[f.name] = pa.array(maps[f.name], type=pa.map_(pa.string(), f.type))
        return pa.table(out_cols)


def _strip_bucket(parts: list[AggregationPart]) -> list[AggregationPart]:
    """Compute bucketed parts as plain parts at keys+bucket granularity; keep
    the _by_ output name."""
    return [replace(p, bucket=None) for p in parts]


def aggregate_snapshot(
    ds: ray.data.Dataset,
    conf: GroupByConf,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    input_schema: Optional[pa.Schema] = None,
) -> ray.data.Dataset:
    """GroupBy with no windows/time dimension: one output row per key.

    Returns one Dataset per bucket-granularity merged into one (outer join on
    keys) when bucketed parts exist; plain single pipeline otherwise.
    """
    from ..util import dataset_schema

    schema = input_schema or dataset_schema(ds)
    keys = list(conf.key_columns)
    tie_break = getattr(conf, "tie_break_column", None)
    parts = conf.parts()
    plain = [p for p in parts if p.bucket is None]
    bucket_cols = sorted({p.bucket for p in parts if p.bucket is not None})

    outputs = []
    if plain:
        stage1 = ds.map_batches(
            PartialAgg(keys, plain, schema, num_partitions,
                       tie_break=tie_break),
            batch_format="pyarrow",
        )
        # tie_break crosses the IR shuffle: FIRST/LAST IRs carry a tb slot
        # (RowAggregator._ircs) so equal-ts rows split across blocks merge
        # by (ts, tb), matching the temporal path
        out = stage1.groupby("_part").map_groups(
            MergeFinalize(keys, plain, schema, tie_break=tie_break),
            batch_format="pandas"
        )
        outputs.append(out)
    for bcol in bucket_cols:
        bparts = [p for p in parts if p.bucket == bcol]
        cparts = _strip_bucket(bparts)
        # rename outputs to carry the bucket suffix: RowAggregator is built on
        # bucket-stripped parts; the pivot writes map columns under the
        # stripped names, renamed after.
        gran_keys = keys + [bcol]

        def _drop_null_bucket(t: pa.Table, _b=bcol) -> pa.Table:
            # null bucket values can't become map keys (and would form a
            # NaN group at keys+bucket granularity) — drop them, matching
            # the temporal path's valid &= is_valid(bucket)
            import pyarrow.compute as _pc
            return t.filter(_pc.is_valid(t[_b]))

        _drop_null_bucket.__name__ = f"drop_null_{bcol}"
        stage1 = ds.map_batches(_drop_null_bucket, batch_format="pyarrow") \
            .map_batches(
            PartialAgg(gran_keys, cparts, schema, num_partitions,
                       part_keys=keys, tie_break=tie_break),
            batch_format="pyarrow",
        )
        out = stage1.groupby("_part").map_groups(
            MergeFinalize(gran_keys, cparts, schema, tie_break=tie_break,
                          pivot_bucket=bcol, out_keys=keys),
            batch_format="pandas",
        )
        rename = {p_c.output_name: p_b.output_name for p_c, p_b in zip(cparts, bparts)}
        out = out.map_batches(
            lambda t, r=rename: t.rename_columns([r.get(c, c) for c in t.column_names]),
            batch_format="pyarrow",
        )
        outputs.append(out)
    if len(outputs) == 1:
        return outputs[0]
    from .assembly import key_partitioned_join

    return key_partitioned_join(outputs[0], outputs[1:], keys, num_partitions=num_partitions)
