"""Config compilation: authoring dataclasses ↔ portable JSON.

Parity target: the reference's `compile.py` (api/py/ai/chronon/repo/
compile.py — Python authoring DSL compiled to Thrift JSON, validated by
repo/validator.py). Here the authoring objects ARE the runtime configs, so
"compilation" is a validated, versioned JSON round-trip: check a config in
next to the pipelines that use it, diff it in code review, reload it
anywhere (a driver, a scheduled backfill, another language).

SQL-string expressions (`sql_expr` / `sql_where`) serialize as their SQL;
arbitrary Python callables in selects/wheres/derivations are rejected with
a clear error — write them as SQL strings if the config must travel.
"""

from __future__ import annotations

import json
from typing import Any

from .api import (Accuracy, Aggregation, BootstrapPart, EntitySource,
                  EventSource, GroupByConf, JoinConf, JoinPart, JoinSource,
                  Operation, TimeUnit, TQuery, Window)
from .expr import SqlExpr

_FORMAT_VERSION = 1


class CompileError(ValueError):
    pass


# ------------------------------------------------------------- encoding


def _enc_expr(v: Any) -> Any:
    if isinstance(v, str):
        return v
    if isinstance(v, SqlExpr):
        return {"$sql": v.expression}
    raise CompileError(
        f"cannot serialize expression {v!r}: only column-name strings and "
        f"sql_expr()/sql_where() SQL strings are portable — rewrite python "
        f"callables as SQL to compile this config")


def _enc_query(q: TQuery) -> dict:
    return {
        "selects": None if q.selects is None
        else [[k, _enc_expr(v)] for k, v in q.selects],
        "wheres": [_enc_expr(w) for w in q.wheres],
        "time_column": q.time_column,
        "start_partition": q.start_partition,
        "end_partition": q.end_partition,
        "partition_column": q.partition_column,
    }


def _enc_source(s: Any) -> dict:
    if isinstance(s, EventSource):
        return {"kind": "events", "table": s.table,
                "query": _enc_query(s.query),
                "is_cumulative": s.is_cumulative}
    if isinstance(s, EntitySource):
        return {"kind": "entities", "snapshot_table": s.snapshot_table,
                "query": _enc_query(s.query)}
    if isinstance(s, JoinSource):
        return {"kind": "join", "join": _enc_join(s.join),
                "query": _enc_query(s.query)}
    raise CompileError(f"unknown source type {type(s).__name__}")


def _enc_agg(a: Aggregation) -> dict:
    return {
        "input_column": a.input_column,
        "operation": a.operation.name,
        "windows": None if a.windows is None
        else [[w.length, w.unit.name] for w in a.windows],
        "buckets": list(a.buckets) if a.buckets else None,
        "arg_map": [list(kv) for kv in a.arg_map],
    }


def _enc_groupby(g: GroupByConf) -> dict:
    return {
        "kind": "group_by",
        "name": g.name,
        "sources": [_enc_source(s) for s in g.sources],
        "key_columns": list(g.key_columns),
        "aggregations": [_enc_agg(a) for a in g.aggregations],
        "accuracy": g.accuracy.name if g.accuracy else None,
        "backfill_start_date": g.backfill_start_date,
        "derivations": [[k, _enc_expr(v)] for k, v in g.derivations],
        "tie_break_column": g.tie_break_column,
    }


def _enc_join(j: JoinConf) -> dict:
    for bp in j.bootstrap_parts:
        if not isinstance(bp.table, str):
            raise CompileError(
                "bootstrap_parts with in-memory tables cannot be compiled "
                "— point them at a parquet path")
    return {
        "kind": "join",
        "name": j.name,
        "left": _enc_source(j.left),
        "parts": [{
            "group_by": _enc_groupby(p.group_by),
            "key_mapping": [list(kv) for kv in p.key_mapping],
            "prefix": p.prefix,
        } for p in j.parts],
        "skew_keys": [[c, list(vals)] for c, vals in j.skew_keys],
        "derivations": [[k, _enc_expr(v)] for k, v in j.derivations],
        "row_ids": list(j.row_ids),
        "bootstrap_parts": [{"table": bp.table,
                             "row_ids": list(bp.row_ids)}
                            for bp in j.bootstrap_parts],
    }


# ------------------------------------------------------------- decoding


def _dec_expr(v: Any) -> Any:
    if isinstance(v, dict) and "$sql" in v:
        return SqlExpr(v["$sql"])
    return v


def _dec_query(d: dict) -> TQuery:
    return TQuery(
        selects=None if d["selects"] is None
        else tuple((k, _dec_expr(v)) for k, v in d["selects"]),
        wheres=tuple(_dec_expr(w) for w in d["wheres"]),
        time_column=d["time_column"],
        start_partition=d["start_partition"],
        end_partition=d["end_partition"],
        partition_column=d["partition_column"],
    )


def _dec_source(d: dict):
    if d["kind"] == "events":
        return EventSource(table=d["table"], query=_dec_query(d["query"]),
                           is_cumulative=d["is_cumulative"])
    if d["kind"] == "entities":
        return EntitySource(snapshot_table=d["snapshot_table"],
                            query=_dec_query(d["query"]))
    if d["kind"] == "join":
        return JoinSource(join=_dec_join(d["join"]),
                          query=_dec_query(d["query"]))
    raise CompileError(f"unknown source kind {d.get('kind')!r}")


def _dec_agg(d: dict) -> Aggregation:
    return Aggregation(
        input_column=d["input_column"],
        operation=Operation[d["operation"]],
        windows=None if d["windows"] is None
        else tuple(Window(w[0], TimeUnit[w[1]]) for w in d["windows"]),
        buckets=tuple(d["buckets"]) if d["buckets"] else None,
        arg_map=tuple(tuple(kv) for kv in d["arg_map"]),
    )


def _dec_groupby(d: dict) -> GroupByConf:
    return GroupByConf(
        name=d["name"],
        sources=tuple(_dec_source(s) for s in d["sources"]),
        key_columns=tuple(d["key_columns"]),
        aggregations=tuple(_dec_agg(a) for a in d["aggregations"]),
        accuracy=Accuracy[d["accuracy"]] if d["accuracy"] else None,
        backfill_start_date=d["backfill_start_date"],
        derivations=tuple((k, _dec_expr(v)) for k, v in d["derivations"]),
        tie_break_column=d["tie_break_column"],
    )


def _dec_join(d: dict) -> JoinConf:
    return JoinConf(
        name=d["name"],
        left=_dec_source(d["left"]),
        parts=tuple(JoinPart(group_by=_dec_groupby(p["group_by"]),
                             key_mapping=tuple(tuple(kv)
                                               for kv in p["key_mapping"]),
                             prefix=p["prefix"])
                    for p in d["parts"]),
        skew_keys=tuple((c, tuple(vals)) for c, vals in d["skew_keys"]),
        derivations=tuple((k, _dec_expr(v)) for k, v in d["derivations"]),
        row_ids=tuple(d["row_ids"]),
        bootstrap_parts=tuple(BootstrapPart(table=bp["table"],
                                            row_ids=tuple(bp["row_ids"]))
                              for bp in d["bootstrap_parts"]),
    )


# ----------------------------------------------------------- public API


def _validate(conf) -> None:
    """Structural validation (the dataset-aware checks live in
    analyzer.py and run at plan time)."""
    if isinstance(conf, GroupByConf):
        if not conf.name:
            raise CompileError("GroupByConf.name must be non-empty")
        if not conf.key_columns:
            raise CompileError(f"{conf.name}: key_columns must be non-empty")
        seen: set[str] = set()
        for p in conf.parts():
            if p.output_name in seen:
                raise CompileError(
                    f"{conf.name}: duplicate output column "
                    f"{p.output_name!r}")
            seen.add(p.output_name)
    elif isinstance(conf, JoinConf):
        if not conf.name:
            raise CompileError("JoinConf.name must be non-empty")
        if not conf.parts:
            raise CompileError(f"{conf.name}: a Join needs >=1 JoinPart")
        for p in conf.parts:
            _validate(p.group_by)
    else:
        raise CompileError(f"cannot compile {type(conf).__name__}")


def compile_to_json(conf, indent: int = 2) -> str:
    """GroupByConf / JoinConf → validated, versioned JSON (with the
    semantic hash embedded so staleness is detectable on load)."""
    _validate(conf)
    body = _enc_groupby(conf) if isinstance(conf, GroupByConf) \
        else _enc_join(conf)
    return json.dumps({"format_version": _FORMAT_VERSION,
                       "semantic_hash": conf.semantic_hash(),
                       "conf": body}, indent=indent)


def load_json(blob: str):
    """JSON → GroupByConf / JoinConf (inverse of compile_to_json)."""
    d = json.loads(blob)
    if d.get("format_version") != _FORMAT_VERSION:
        raise CompileError(
            f"unsupported config format_version {d.get('format_version')!r}")
    body = d["conf"]
    conf = _dec_groupby(body) if body["kind"] == "group_by" \
        else _dec_join(body)
    _validate(conf)
    return conf
