"""Log flattening: serialized online request logs → flat offline table.

Parity target: spark/LogFlattenerJob.scala:39-260 and
spark/LoggingSchema.scala — the reference's online fetcher logs each
request as (key_base64, value_base64, ts_millis, ds, schema_hash) Avro
rows keyed by a schema registry; the flattener unpacks every field into
individual columns under a schema MERGED across all schema versions seen
in the logs (dedupeFields: first-appearance order, same-name +
different-type is an error).  The flattened table is what log-based
bootstrap consumes (LogBootstrapTest semantics): its row_ids + feature
columns feed ``compute_join_bootstrapped`` so already-served rows skip
offline recompute.

This engine's wire format is the serving codec (serving.py): a pickled
canonical key tuple + a self-describing one-row Arrow IPC value stream —
the registry therefore only needs the KEY field names/types and the value
schema for merged-schema construction (the Avro analog would need both
payload schemas).

Execution shape: ``encode_log`` and ``flatten_logs`` are per-batch map
transforms (no exchange); the registry is collected once on the driver —
it is schema-version-cardinality small by construction.
"""

from __future__ import annotations

import hashlib
import io
import pickle
from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..serving import _canon_key
from ..util import dataset_schema

MILLIS_DAY = 86_400_000

LOG_COLUMNS = ("name", "ds", "ts_millis", "schema_hash",
               "key_bytes", "value_bytes")


def _schema_payload(key_fields: list[pa.Field],
                    value_schema: pa.Schema) -> bytes:
    return pickle.dumps({
        "keys": [(f.name, str(f.type)) for f in key_fields],
        "value_schema": value_schema.serialize().to_pybytes(),
    })


def log_schema_hash(key_fields: list[pa.Field],
                    value_schema: pa.Schema) -> str:
    """Deterministic hash identifying one logged schema version (the
    reference's Constants.SchemaHash, computed over the Avro schema
    string)."""
    blob = repr([(f.name, str(f.type)) for f in key_fields]).encode() \
        + b"|" + repr([(f.name, str(f.type)) for f in value_schema]).encode()
    return hashlib.md5(blob).hexdigest()[:16]


def encode_log(
    served: ray.data.Dataset,
    key_cols: Sequence[str],
    name: str,
    ts_col: str = "ts",
) -> tuple[ray.data.Dataset, pa.Table]:
    """Feature rows → request-log rows, the fetcher-side logging analog:
    each row becomes (name, ds, ts_millis, schema_hash, key_bytes,
    value_bytes) with the serving codec's pickled key tuple + one-row IPC
    value stream.  Returns ``(log_ds, registry_table)`` where the registry
    is ONE row per schema version (here: one) mapping schema_hash to the
    key/value schemas — the LoggingSchema/schemaTable analog."""
    key_cols = list(key_cols)
    sch = dataset_schema(served)
    key_fields = [sch.field(k) for k in key_cols]
    # fail at ENCODE time if a key type can't round-trip the registry —
    # otherwise unreadable logs would accumulate until the first flatten
    for f in key_fields:
        if str(f.type) not in _TYPE_BY_STR:
            raise ValueError(
                f"key column '{f.name}' has unsupported log key type "
                f"{f.type}; cast it to one of {sorted(_TYPE_BY_STR)} "
                "before logging")
    value_fields = [f for f in sch if f.name not in key_cols
                    and f.name != ts_col]
    value_schema = pa.schema(value_fields)
    shash = log_schema_hash(key_fields, value_schema)
    registry = pa.table({
        "schema_hash": pa.array([shash], type=pa.string()),
        "schema_value": pa.array(
            [_schema_payload(key_fields, value_schema)], type=pa.binary()),
    })

    def pack(t: pa.Table) -> pa.Table:
        ts = t[ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
        days = (ts // MILLIS_DAY).astype("datetime64[D]")
        ds_strs = np.datetime_as_string(days, unit="D")
        kcols = [t[k].to_pylist() for k in key_cols]
        vals = t.select([f.name for f in value_fields]) \
            .cast(value_schema)
        keys_b, vals_b = [], []
        for i in range(len(t)):
            keys_b.append(pickle.dumps(
                tuple(_canon_key(c[i]) for c in kcols), protocol=4))
            buf = io.BytesIO()
            with pa.ipc.new_stream(buf, value_schema) as w:
                w.write_table(vals.slice(i, 1))
            vals_b.append(buf.getvalue())
        return pa.table({
            "name": pa.array([name] * len(t), type=pa.string()),
            "ds": pa.array(ds_strs.tolist(), type=pa.string()),
            "ts_millis": pa.array(ts),
            "schema_hash": pa.array([shash] * len(t), type=pa.string()),
            "key_bytes": pa.array(keys_b, type=pa.binary()),
            "value_bytes": pa.array(vals_b, type=pa.binary()),
        })

    pack.__name__ = "log_encode"
    return served.map_batches(pack, batch_format="pyarrow"), registry


def dedupe_fields(fields) -> list[pa.Field]:
    """Merged-schema field list: first-appearance order, duplicate names
    collapse, same name with a DIFFERENT type raises
    (LogFlattenerJob.dedupeFields)."""
    out: dict[str, pa.DataType] = {}
    for f in fields:
        if f.name in out:
            if out[f.name] != f.type:
                raise ValueError(
                    f"field '{f.name}' logged with conflicting types: "
                    f"{out[f.name]} vs {f.type}")
        else:
            out[f.name] = f.type
    return [pa.field(n, t) for n, t in out.items()]


def _load_registry(registry) -> dict[str, tuple[list[pa.Field], pa.Schema]]:
    if isinstance(registry, ray.data.Dataset):
        rows = registry.to_pandas()
    elif isinstance(registry, pa.Table):
        rows = registry.to_pandas()
    else:
        rows = registry
    out = {}
    for h, blob in zip(rows["schema_hash"], rows["schema_value"]):
        p = pickle.loads(blob)
        key_fields = [pa.field(n, _type_from_str(ts)) for n, ts in p["keys"]]
        value_schema = pa.ipc.read_schema(pa.py_buffer(p["value_schema"]))
        out[h] = (key_fields, value_schema)
    return out


_TYPE_BY_STR = {
    "int8": pa.int8(), "int16": pa.int16(), "int32": pa.int32(),
    "int64": pa.int64(), "uint8": pa.uint8(), "uint16": pa.uint16(),
    "uint32": pa.uint32(), "uint64": pa.uint64(), "float": pa.float32(),
    "double": pa.float64(), "string": pa.string(),
    "large_string": pa.large_string(), "bool": pa.bool_(),
    "binary": pa.binary(), "date32[day]": pa.date32(),
}


def _type_from_str(s: str) -> pa.DataType:
    try:
        return _TYPE_BY_STR[s]
    except KeyError:
        raise ValueError(f"unsupported logged key type '{s}'") from None


def flatten_logs(
    log_ds: ray.data.Dataset,
    registry,
    name: Optional[str] = None,
) -> ray.data.Dataset:
    """Request-log rows → flat table under the merged schema
    (LogFlattenerJob.flattenKeyValueBytes): metadata columns
    (schema_hash, ts, ds) followed by the deduped union of every schema
    version's key fields then value fields.  Fields missing from a row's
    version come back as typed NULLs, so old and new log days coexist in
    one output table."""
    schemas = _load_registry(registry)
    if not schemas:
        raise ValueError("empty schema registry")
    merged = dedupe_fields(
        [f for kf, _ in schemas.values() for f in kf]
        + [f for _, vs in schemas.values() for f in vs])
    # ts/ds/schema_hash are reserved metadata (the reference's
    # SchemaHash + timeFields); a key field named ts IS the request ts,
    # so the metadata column carries it and the duplicate drops
    meta_names = ("schema_hash", "ts", "ds")
    merged = [f for f in merged if f.name not in meta_names]
    meta_fields = [pa.field("schema_hash", pa.string()),
                   pa.field("ts", pa.int64()), pa.field("ds", pa.string())]
    out_schema = pa.schema(meta_fields + merged)

    def unpack(t: pa.Table) -> pa.Table:
        if name is not None:
            t = t.filter(pa.compute.equal(t["name"], name))
        hashes = t["schema_hash"].to_pylist()
        ts = t["ts_millis"].to_pylist()
        ds_vals = t["ds"].to_pylist()
        kb = t["key_bytes"].to_pylist()
        vb = t["value_bytes"].to_pylist()
        pieces = []
        # group rows by schema version: each group vectorizes its decode
        order = np.argsort(np.array(hashes, dtype=object), kind="stable") \
            if len(hashes) else np.array([], dtype=np.int64)
        i = 0
        idx = order.tolist()
        while i < len(idx):
            j = i
            h = hashes[idx[i]]
            while j < len(idx) and hashes[idx[j]] == h:
                j += 1
            rows = idx[i:j]
            i = j
            if h not in schemas:
                raise ValueError(f"schema_hash '{h}' missing from registry")
            key_fields, value_schema = schemas[h]
            ktuples = [pickle.loads(kb[r]) for r in rows]
            vtables = [pa.ipc.open_stream(vb[r]).read_all() for r in rows]
            vals = (pa.concat_tables(vtables) if vtables
                    else value_schema.empty_table())
            cols = {
                "schema_hash": pa.array([h] * len(rows), type=pa.string()),
                "ts": pa.array(np.array([ts[r] for r in rows],
                                        dtype=np.int64)),
                "ds": pa.array([ds_vals[r] for r in rows],
                               type=pa.string()),
            }
            for ki, f in enumerate(key_fields):
                cols[f.name] = pa.array([kt[ki] for kt in ktuples],
                                        type=f.type)
            for f in value_schema:
                cols[f.name] = vals[f.name]
            arrays = []
            for f in out_schema:
                if f.name in cols:
                    col = cols[f.name]
                    if col.type != f.type:
                        col = col.cast(f.type)
                    arrays.append(col)
                else:
                    arrays.append(pa.nulls(len(rows), type=f.type))
            pieces.append(pa.Table.from_arrays(arrays, schema=out_schema))
        if not pieces:
            return out_schema.empty_table()
        return pa.concat_tables(pieces)

    unpack.__name__ = "log_flatten"
    return log_ds.map_batches(unpack, batch_format="pyarrow")


def log_flatten_job(
    log_table: str,
    registry_table: str,
    output_table: str,
    name: Optional[str] = None,
    end_ds: Optional[str] = None,
    step_days: Optional[int] = None,
) -> dict:
    """Resumable flattening backfill (LogFlattenerJob.run): flatten every
    log day not yet in the output table, ``step_days`` at a time, one
    atomic output partition per day.  Returns ``{ds: manifest}`` written
    this run."""
    import hashlib

    import pyarrow.parquet as pq

    from ..api import TQuery
    from ..sources import list_partitions, scan_table
    from ..state.lineage import completed_partitions, write_partitioned
    from ..state.partitions import PartitionRange, unfilled_ranges

    registry = pq.read_table(registry_table)
    cfg = hashlib.md5(
        (repr(sorted(registry["schema_hash"].to_pylist())) + repr(name))
        .encode()).hexdigest()[:16]
    in_parts = list_partitions(log_table)
    hive = bool(in_parts)
    if not hive:
        # single-column distinct scan: never pull key/value payloads
        # just to learn the day set
        probe = scan_table(log_table, TQuery(), columns=["ds"])
        in_parts = sorted(probe.unique("ds"))
    if end_ds is not None:
        in_parts = [p for p in in_parts if p <= end_ds]
    if not in_parts:
        return {}
    requested = PartitionRange(in_parts[0], end_ds or in_parts[-1])
    have = completed_partitions(output_table, cfg)
    ranges = unfilled_ranges(requested, have, input_partitions=in_parts)
    written: dict = {}
    for rng in ranges:
        for step in (rng.steps(step_days) if step_days else [rng]):
            lo, hi = step.start, step.end
            ds = scan_table(log_table, TQuery(start_partition=lo,
                                              end_partition=hi))
            if not hive:
                def in_step(t: pa.Table, _l=lo, _h=hi) -> pa.Table:
                    dsv = t["ds"].to_pylist()
                    return t.filter(pa.array(
                        [v is not None and _l <= v <= _h for v in dsv]))

                in_step.__name__ = "logflat_step_filter"
                ds = ds.map_batches(in_step, batch_format="pyarrow")
            flat = flatten_logs(ds, registry, name=name)
            written.update(write_partitioned(flat, output_table, cfg,
                                             input_range=(lo, hi)))
    return written
