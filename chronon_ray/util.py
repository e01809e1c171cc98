"""Small shared helpers."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def drop_null_key_rows(t: pa.Table, keys) -> pa.Table:
    """Data-side removeNulls (reference GroupBy.scala:181): drop rows
    where ANY key column is null. Shared by every operator with the
    engine-wide join contract — data-side null keys never match, while
    LEFT rows with null keys survive with null features."""
    import pyarrow.compute as pc

    mask = None
    for k in keys:
        if k in t.column_names:
            m = pc.is_valid(t[k])
            mask = m if mask is None else pc.and_(mask, m)
    return t.filter(mask) if mask is not None else t


def dataset_schema(ds: ray.data.Dataset) -> pa.Schema:
    """Arrow schema of a Dataset regardless of block type (Arrow or pandas).

    A ZERO-ROW pipeline reports schema None after any map (no block ever
    reaches the UDF); `sources.read_parquet` stashes the input schema on
    the Dataset for exactly this case, so empty checkpoint / empty
    day-range reads keep their real schema instead of crashing here."""
    sch = ds.schema()
    if sch is None:
        stash = getattr(ds, "_chronon_schema", None)
        if isinstance(stash, pa.Schema):
            return stash
        raise ValueError(
            "dataset has unknown schema (a zero-row pipeline?) — read "
            "inputs through chronon_ray.sources.read_parquet / scan_table "
            "so empty ranges stay typed")
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    # PandasBlockSchema — reconstruct from names/types
    fields = []
    for name, typ in zip(sch.names, sch.types):
        if isinstance(typ, pa.DataType):
            fields.append(pa.field(name, typ))
        else:
            try:
                fields.append(pa.field(name, pa.from_numpy_dtype(typ)))
            except (pa.ArrowNotImplementedError, TypeError):
                fields.append(pa.field(name, pa.string()))
    return pa.schema(fields)


def auto_partitions(ds: ray.data.Dataset, expansion: float = 1.0,
                    target_bytes: int = 256 << 20,
                    floor_per_cpu: int = 2) -> int:
    """Size a hash exchange from the input's byte size (parquet/block
    metadata — no data read): enough partitions that one partition
    (~target_bytes after an `expansion`-fold blowup from the map stage)
    fits a worker heap at any input scale, floored at a multiple of the
    cluster CPU count so the straggler tail can pack."""
    import math

    import ray as _ray

    try:
        total = int((ds.size_bytes() or 0) * expansion)
    except Exception:
        total = 0
    cpus = int(_ray.cluster_resources().get("CPU", 8)) \
        if _ray.is_initialized() else 8
    return max(floor_per_cpu * cpus, math.ceil(total / target_bytes))


def arrow_type_of(t) -> pa.DataType:
    """Coerce a ray Schema type entry (arrow DataType for arrow-backed
    datasets, numpy dtype / python type for pandas-backed ones) to an
    arrow DataType; object-ish types fall back to string."""
    if isinstance(t, pa.DataType):
        return t
    try:
        return pa.from_numpy_dtype(t)
    except (pa.ArrowNotImplementedError, TypeError):
        return pa.string()
