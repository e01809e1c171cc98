"""Small shared helpers."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def dataset_schema(ds: ray.data.Dataset) -> pa.Schema:
    """Arrow schema of a Dataset regardless of block type (Arrow or pandas)."""
    sch = ds.schema()
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
