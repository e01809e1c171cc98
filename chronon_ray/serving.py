"""KV handoff + point-fetch surface: the online edge of the lambda split.

Parity target: the reference's KV bulk upload — IR rows packed into
key/value byte pairs for the online store (spark/KvRdd.scala:44-177,
GroupByUpload.scala:37-105; there the value codec is Avro with the schema
held in a registry) — and the online Fetcher's point lookups
(online/FetcherBase.scala). There is no KV store or Avro in this engine,
so the codec is Arrow IPC: each row's non-key columns serialize to ONE
self-contained IPC stream (``value_bytes``), and the key columns to a
canonical pickled tuple (``key_bytes``). Self-describing values trade
bytes for zero registry plumbing; a production store would hold the
schema once and strip it per row, exactly like the Avro registry.

``kv_export`` works for ANY keyed handoff table — FinalBatchIr
checkpoints (key = conf keys) and tile stores (key = conf keys + _tile,
the reference's tiled KV layout) — and ``kv_import`` restores a Dataset
that serves bit-equal to the original (tested).
"""

from __future__ import annotations

import io
import pickle
from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _canon_key(v):
    """Stable python-native key value: Arrow/numpy scalars → python, so
    the same logical key always pickles to the same bytes regardless of
    which block dtype it rode in on."""
    if v is None or v is pd.NA:
        return None
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, (np.bool_,)):
        return bool(v)
    if isinstance(v, bytes):
        return v
    return v


def kv_export(table: ray.data.Dataset,
              key_cols: Sequence[str]) -> ray.data.Dataset:
    """Keyed handoff table → ``(key_bytes, value_bytes)`` rows — the KV
    bulk-upload payload (KvRdd.scala:44-177). ``key_bytes`` is the pickled
    canonical key tuple; ``value_bytes`` is a one-row Arrow IPC stream of
    every non-key column (IR columns, tail-hop blobs, _batch_end_ts /
    _tile_ms all ride along)."""
    key_cols = list(key_cols)

    def pack(t: pa.Table) -> pa.Table:
        vals = t.drop([c for c in key_cols if c in t.column_names])
        kcols = [t[k].to_pylist() for k in key_cols]
        keys_b, vals_b = [], []
        for i in range(len(t)):
            kb = pickle.dumps(tuple(_canon_key(c[i]) for c in kcols),
                              protocol=4)
            buf = io.BytesIO()
            with pa.ipc.new_stream(buf, vals.schema) as w:
                w.write_table(vals.slice(i, 1))
            keys_b.append(kb)
            vals_b.append(buf.getvalue())
        return pa.table({
            "key_bytes": pa.array(keys_b, type=pa.binary()),
            "value_bytes": pa.array(vals_b, type=pa.binary()),
        })

    pack.__name__ = "kv_pack"
    return table.map_batches(pack, batch_format="pyarrow")


def kv_import(kv: ray.data.Dataset,
              key_fields: Sequence[pa.Field]) -> ray.data.Dataset:
    """Inverse of ``kv_export``: key/value byte pairs → the original
    keyed table (key columns restored with the DECLARED types — the
    canonical tuple is dtype-free by design)."""
    key_fields = list(key_fields)

    def unpack(t: pa.Table) -> pa.Table:
        kb = t["key_bytes"].to_pylist()
        vb = t["value_bytes"].to_pylist()
        if not kb:
            return pa.table({f.name: pa.array([], type=f.type)
                             for f in key_fields})
        vtabs = [pa.ipc.open_stream(b).read_all() for b in vb]
        vals = pa.concat_tables(vtabs, promote_options="default")
        ktuples = [pickle.loads(b) for b in kb]
        cols = {}
        for j, f in enumerate(key_fields):
            cols[f.name] = pa.array([kt[j] for kt in ktuples], type=f.type)
        for name in vals.column_names:
            cols[name] = vals[name]
        return pa.table(cols)

    unpack.__name__ = "kv_unpack"
    return kv.map_batches(unpack, batch_format="pyarrow")


def fetch_features(
    ir_table: ray.data.Dataset,
    conf,
    batch_end_ts: int,
    keys: Sequence[dict],
    at_ts: int,
    tiles: Optional[ray.data.Dataset] = None,
    recent_events: Optional[ray.data.Dataset] = None,
    events_schema: Optional[pa.Schema] = None,
    num_partitions: int = 8,
    full_hops: Optional[bool] = None,
) -> pd.DataFrame:
    """Point fetch (online/FetcherBase.scala surface): features for a
    small batch of key dicts as of ``at_ts``. With ``tiles`` it takes the
    tiled lambda fetch; ``recent_events`` is the in-flight buffer. When
    every event is already tiled or checkpointed pass
    ``recent_events=None`` WITH the event table's ``events_schema`` — op
    binding (list auto-explode, map dispatch, output types) reads the
    declared input types, so they cannot be guessed from the conf.
    Returns a pandas frame, one row per requested key, request order."""
    import ray.data as rd

    from .pipelines.streaming import serve_with_tiles
    from .pipelines.upload import serve_with_events

    kcols = list(conf.key_columns)
    q = pd.DataFrame([{**{k: d.get(k) for k in kcols}, "ts": at_ts,
                       "_req": i} for i, d in enumerate(keys)])
    qds = rd.from_pandas(q)
    if recent_events is None:
        if events_schema is None:
            raise ValueError(
                "fetch_features(recent_events=None) needs events_schema= "
                "(the event table's schema) — input dtypes drive op "
                "binding and output types")
        recent_events = rd.from_arrow(
            pa.table({f.name: pa.array([], type=f.type)
                      for f in events_schema}))
    if tiles is not None:
        out = serve_with_tiles(ir_table, tiles, recent_events, qds, conf,
                               batch_end_ts, num_partitions=num_partitions,
                               full_hops=full_hops)
    else:
        out = serve_with_events(ir_table, recent_events, qds, conf,
                                batch_end_ts,
                                num_partitions=num_partitions,
                                full_hops=full_hops)
    res = out.to_pandas().sort_values("_req").reset_index(drop=True)
    return res.drop(columns=["_req"])
