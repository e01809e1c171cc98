"""Source scanning: Parquet → ray.data.Dataset with query rendering.

Analog of the reference's rendered source query (reference:
spark/src/main/scala/ai/chronon/spark/GroupBy.scala:608-680
renderDataSourceQuery; api/QueryUtils.scala:20-57) re-expressed as: partition
pruning by path selection → `ray.data.read_parquet(columns=...)` → vectorized
`map_batches` projection/filter. For SNAPSHOT event sources without a time
column the end-of-day timestamp `(epoch(ds)+1d)*1000-1` is synthesized
(GroupBy.scala:640-652).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .api import EntitySource, EventSource, Source, TQuery

#: reserved column names (reference api/Constants.scala:22-28)
TS_COL = "ts"
DS_COL = "ds"

MILLIS_DAY = 86_400_000


def _strip_schema_metadata(t: pa.Table) -> pa.Table:
    """Drop schema-level metadata (zero-copy). Parquet written by pandas
    carries a `pandas` metadata blob that makes `hash(pa.Schema)` raise in
    this pyarrow version, which defeats Ray Data's schema-dedup fast path
    on EVERY block unify (and spams 'Failed to hash the schemas' from sort
    reduce workers where no driver-side logging filter can reach)."""
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def read_parquet(*args, **kwargs) -> ray.data.Dataset:
    """`ray.data.read_parquet` + schema-metadata strip (fuses with the
    read task; ~free). Use this everywhere instead of the raw reader so
    downstream exchanges unify hashable schemas.

    The stripped schema is also stashed on the returned Dataset
    (``_chronon_schema``): a ZERO-ROW parquet input produces zero blocks
    through the map, Ray then reports schema None, and
    ``util.dataset_schema`` falls back to the stash — an empty
    checkpoint / empty day-range read keeps its real schema."""
    raw = ray.data.read_parquet(*args, **kwargs)
    out = raw.map_batches(_strip_schema_metadata, batch_format="pyarrow")
    try:
        rs = raw.schema()
        base = getattr(rs, "base_schema", None)
        if isinstance(base, pa.Schema):
            out._chronon_schema = base.remove_metadata()
    except Exception:
        pass
    return out


def clip_ds_range(ds: ray.data.Dataset,
                  start: Optional[str],
                  end: Optional[str]) -> ray.data.Dataset:
    """Row-level [start, end] day clip: by the ``ds`` column if present,
    else by the ``ts`` day.  Hive-partitioned scans already prune at the
    path level — this makes the same bounds hold for FLAT parquet files,
    where ``scan_table`` has no path to prune (a no-op when both bounds
    are None or neither column exists)."""
    if start is None and end is None:
        return ds
    from .util import dataset_schema

    names = dataset_schema(ds).names
    lo_ms = (None if start is None
             else int(np.datetime64(start, "ms").astype(np.int64)))
    hi_ms = (None if end is None
             else int(np.datetime64(end, "ms").astype(np.int64)) + MILLIS_DAY)

    if "ds" in names:
        def clip(t: pa.Table, _s=start, _e=end) -> pa.Table:
            vals = t["ds"].to_pylist()
            mask = [(v is not None
                     and (_s is None or v >= _s)
                     and (_e is None or v <= _e)) for v in vals]
            return t.filter(pa.array(mask))
    elif TS_COL in names:
        def clip(t: pa.Table, _l=lo_ms, _h=hi_ms) -> pa.Table:
            import pyarrow.compute as pc
            col = t[TS_COL]
            if pa.types.is_timestamp(col.type) or pa.types.is_date(col.type):
                # datetime64[ns] → astype(int64) would be NANOseconds and
                # the millis bounds would silently keep everything (or
                # nothing) — canonicalize through timestamp('ms') first,
                # as consistency_job.after_start does
                col = pc.cast(pc.cast(col, pa.timestamp("ms")), pa.int64())
            ts = col.to_numpy(zero_copy_only=False).astype(np.int64)
            mask = np.ones(len(t), dtype=bool)
            if _l is not None:
                mask &= ts >= _l
            if _h is not None:
                mask &= ts < _h
            return t.filter(pa.array(mask))
    else:
        return ds
    clip.__name__ = "clip_ds_range"
    return ds.map_batches(clip, batch_format="pyarrow")


def partition_paths(
    table: str,
    start: Optional[str] = None,
    end: Optional[str] = None,
    partition_col: str = DS_COL,
) -> list[str]:
    """Resolve a table path to concrete parquet paths with ds-range pruning.

    A table is either a single parquet file or a directory of
    ``ds=YYYY-MM-DD/`` subdirs (the Hive-partitioned layout the reference
    assumes everywhere — spark/TableUtils.scala:291-295). Pruning == path
    selection; no footer is touched for out-of-range days.
    """
    if os.path.isfile(table) or table.endswith(".parquet"):
        return [table]
    subdirs = sorted(d for d in os.listdir(table) if d.startswith(f"{partition_col}="))
    if not subdirs:
        return [table]
    picked = []
    for d in subdirs:
        ds_val = d.split("=", 1)[1]
        if start is not None and ds_val < start:
            continue
        if end is not None and ds_val > end:
            continue
        picked.append(os.path.join(table, d))
    return picked


def _any_partition_schema(table: str, partition_col: str):
    """Arrow schema from the FIRST parquet footer of any partition of a
    hive-layout table dir — used to type empty-range scans."""
    import pyarrow.parquet as pq
    for d in sorted(os.listdir(table)):
        if d.startswith(f"{partition_col}="):
            sub = os.path.join(table, d)
            for f in sorted(os.listdir(sub)):
                if f.endswith(".parquet"):
                    return pq.read_schema(os.path.join(sub, f))
    return None


def list_partitions(table: str, partition_col: str = DS_COL) -> list[str]:
    if os.path.isfile(table) or table.endswith(".parquet"):
        return []
    return sorted(
        d.split("=", 1)[1] for d in os.listdir(table) if d.startswith(f"{partition_col}=")
    )


class _Render:
    """Vectorized select/where application, one call per Arrow batch."""

    def __init__(self, query: TQuery, keep_columns: Optional[Sequence[str]] = None,
                 synthesize_eod_ts: bool = False):
        self.query = query
        self.keep = list(keep_columns) if keep_columns else None
        self.synthesize_eod_ts = synthesize_eod_ts

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = _strip_schema_metadata(batch)
        q = self.query
        if getattr(q, "setups", ()):
            from .expr import ensure_setups

            ensure_setups(q.setups)
        for where in q.wheres:
            mask = where(batch)
            if isinstance(mask, np.ndarray):
                mask = pa.array(mask)
            batch = batch.filter(mask)
        if q.selects is not None:
            arrays, names = [], []
            for out_name, expr in q.selects:
                if isinstance(expr, str):
                    arr = batch[expr]
                else:
                    arr = expr(batch)
                    if isinstance(arr, np.ndarray):
                        arr = pa.array(arr)
                arrays.append(arr)
                names.append(out_name)
            batch = pa.table(dict(zip(names, arrays)))
        if q.time_column != TS_COL and q.time_column in batch.column_names:
            idx = batch.column_names.index(q.time_column)
            batch = batch.set_column(idx, TS_COL, batch.column(idx))
        if TS_COL in batch.column_names:
            ts = batch[TS_COL]
            if pa.types.is_timestamp(ts.type):
                ts = pc.cast(pc.cast(ts, pa.int64()), pa.int64())
                unit = batch[TS_COL].type.unit
                div = {"s": 0.001, "ms": 1, "us": 1000, "ns": 1_000_000}[unit]
                if div != 1:
                    ts = pc.cast(pc.divide(ts, int(div)) if div > 1 else pc.multiply(ts, 1000),
                                 pa.int64())
                batch = batch.set_column(batch.column_names.index(TS_COL), TS_COL, ts)
        elif self.synthesize_eod_ts and DS_COL in batch.column_names:
            # EOD ts for snapshot/cumulative event tables (GroupBy.scala:640-652)
            days = pc.cast(pc.strptime(batch[DS_COL], format="%Y-%m-%d", unit="ms"), pa.int64())
            eod = pc.add(days, MILLIS_DAY - 1)
            batch = batch.append_column(TS_COL, eod)
        if self.keep:
            keep = [c for c in self.keep if c in batch.column_names]
            batch = batch.select(keep)
        return batch


TARGET_BLOCK_BYTES = 32 << 20  # ~32 MiB input per block


def _estimate_blocks(paths: Sequence[str]) -> int:
    """Block count sized to data volume. Ray's default parallelism creates
    ~200 blocks even for tiny files, and each downstream sort/groupby task
    then pays fixed overhead per near-empty block — measurably dominating
    small-to-medium scans. One block per ~32 MiB, capped."""
    total = 0
    for p in paths:
        if os.path.isfile(p):
            total += os.path.getsize(p)
        else:
            for root, _dirs, files in os.walk(p):
                total += sum(os.path.getsize(os.path.join(root, f))
                             for f in files if f.endswith(".parquet"))
    return max(1, min(1000, total // TARGET_BLOCK_BYTES + 1))


def scan_table(
    table: str,
    query: TQuery = TQuery(),
    columns: Optional[Sequence[str]] = None,
    keep_columns: Optional[Sequence[str]] = None,
    synthesize_eod_ts: bool = False,
    override_num_blocks: Optional[int] = None,
) -> ray.data.Dataset:
    """read_parquet with partition pruning + column pruning, then render.

    ds-partitioned dirs are read with a hive PathPartitionFilter (prunes at
    the path level, no out-of-range footer is touched) and the partition
    column is injected by Ray's hive partitioning."""
    paths = partition_paths(table, query.start_partition, query.end_partition,
                            query.partition_column)
    read_cols = list(columns) if columns else None
    blocks = override_num_blocks or _estimate_blocks(paths)
    is_partitioned_dir = not (os.path.isfile(table) or table.endswith(".parquet")) \
        and any(d.startswith(f"{query.partition_column}=")
                for d in os.listdir(table))
    if is_partitioned_dir and not paths:
        # the range matched NO partitions: read_parquet over zero files
        # yields a dataset with UNKNOWN schema, and every downstream
        # dataset_schema() / union crashes. Return an empty dataset with
        # the table's real schema (one footer read) so an empty day range
        # behaves like any other empty-but-typed scan — e.g. an
        # incremental-backfill bootstrap window before the first event
        # day, found by the round-5 fresh-seed chaos sweep.
        sch = _any_partition_schema(table, query.partition_column)
        if sch is not None:
            fields = {f.name: f for f in sch}
            fields.setdefault(query.partition_column,
                              pa.field(query.partition_column, pa.string()))
            names = (read_cols if read_cols
                     else [f.name for f in sch] + (
                         [] if query.partition_column in sch.names
                         else [query.partition_column]))
            empty = pa.schema([fields[n] for n in names
                               if n in fields]).empty_table()
            # render EAGERLY: a lazy map_batches over a zero-row dataset
            # reports Unknown schema (no block ever reaches the UDF), so
            # downstream dataset_schema() would still crash
            rendered = _Render(query, keep_columns, synthesize_eod_ts)(empty)
            return ray.data.from_arrow(rendered)
    if is_partitioned_dir:
        from ray.data.datasource.partitioning import PathPartitionFilter

        start, end, col = query.start_partition, query.end_partition, \
            query.partition_column

        def keep(kv, _s=start, _e=end, _c=col):
            v = kv.get(_c)
            return (_s is None or v >= _s) and (_e is None or v <= _e)

        flt = PathPartitionFilter.of(keep, style="hive")
        # file_extensions: the partition-filtered listing does NOT apply
        # pyarrow's "_"-prefix ignore rule, so lineage _MANIFEST.json
        # files inside ds= dirs would be read as parquet and crash
        ds = ray.data.read_parquet(table, columns=read_cols,
                                   partition_filter=flt,
                                   file_extensions=["parquet"],
                                   override_num_blocks=blocks)
    else:
        ds = ray.data.read_parquet(paths, columns=read_cols,
                                   override_num_blocks=blocks)
    return ds.map_batches(
        _Render(query, keep_columns, synthesize_eod_ts), batch_format="pyarrow"
    )


def scan_source(
    source: Source,
    columns: Optional[Sequence[str]] = None,
    keep_columns: Optional[Sequence[str]] = None,
) -> ray.data.Dataset:
    if isinstance(source, EventSource):
        query = source.query
        if source.is_cumulative:
            # cumulative/snapshot-style event table: the latest partition
            # holds all history — scan only it (reference GroupBy.scala:
            # 565-606 getIntersectedRange cumulative branch)
            parts = list_partitions(source.table, query.partition_column)
            if parts:
                latest = parts[-1] if query.end_partition is None else \
                    max(p for p in parts if p <= query.end_partition)
                query = TQuery(selects=query.selects, wheres=query.wheres,
                               time_column=query.time_column,
                               start_partition=latest, end_partition=latest,
                               partition_column=query.partition_column)
        return scan_table(source.table, query, columns, keep_columns,
                          synthesize_eod_ts=True)
    from .api import JoinSource

    if isinstance(source, JoinSource):
        # chained join: the upstream Join computes lazily and its output
        # streams through this source's select/where rendering
        from .pipelines.joins import compute_join

        ds = compute_join(source.join)
        return ds.map_batches(_Render(source.query, keep_columns),
                              batch_format="pyarrow")
    return scan_table(source.snapshot_table, source.query, columns, keep_columns)


def required_columns(query: TQuery, needed: Sequence[str]) -> Optional[list[str]]:
    """Columns to push into read_parquet: source columns referenced by simple
    selects plus ``needed`` physical columns. Returns None (= all) when any
    select is a callable (unknown inputs)."""
    if query.selects is None:
        return None
    cols = set()
    for _out, expr in query.selects:
        if isinstance(expr, str):
            cols.add(expr)
        else:
            return None
    if query.wheres:
        return None
    cols.update(needed)
    return sorted(cols)
