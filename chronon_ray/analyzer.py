"""Plan-time validation of GroupBy/Join configs — Analyzer parity.

Re-expression of the reference's Analyzer (reference:
spark/Analyzer.scala:279-661 — analyzeGroupBy / analyzeJoin: key schema
compatibility across sources and against the left, timestamp presence for
temporal accuracy, aggregation input/op type checks, output-name collisions,
and input-partition availability against the max window). A mis-configured
join fails HERE with a readable error instead of mid-pipeline inside a
shuffle task.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa

from .api import Accuracy, GroupByConf, JoinConf, Operation

#: ops that need a numeric input column
_NUMERIC_OPS = {Operation.SUM, Operation.AVERAGE, Operation.VARIANCE,
                Operation.SKEW, Operation.KURTOSIS, Operation.MIN,
                Operation.MAX, Operation.APPROX_PERCENTILE,
                Operation.TOP_K, Operation.BOTTOM_K}
#: ops whose arg_map must carry k
_K_REQUIRED = {Operation.FIRST_K, Operation.LAST_K, Operation.TOP_K,
               Operation.BOTTOM_K}


class AnalyzerError(ValueError):
    """Config problems found before any compute is launched."""

    def __init__(self, issues: list[str]):
        self.issues = issues
        super().__init__(
            "config validation failed:\n  - " + "\n  - ".join(issues))


def _is_numericish(t: pa.DataType) -> bool:
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return _is_numericish(t.value_type)
    return pa.types.is_integer(t) or pa.types.is_floating(t) \
        or pa.types.is_boolean(t)


def _source_schema(src) -> Optional[pa.Schema]:
    from .sources import scan_source
    from .util import dataset_schema

    try:
        return dataset_schema(scan_source(src))
    except Exception as e:  # unreadable source is itself a finding
        raise AnalyzerError([f"source {getattr(src, 'table', src)!r} "
                             f"unreadable: {e}"])


def analyze_group_by(conf: GroupByConf,
                     schema: Optional[pa.Schema] = None,
                     temporal: bool = True) -> list[str]:
    """Validate one GroupBy against its (first) source schema. Returns the
    issue list (empty = clean); raise with ``check_group_by``."""
    issues: list[str] = []
    schemas: list[tuple[str, pa.Schema]] = []
    if schema is not None:
        schemas.append(("<given>", schema))
    else:
        for src in conf.sources:
            schemas.append((str(getattr(src, "table", src)),
                            _source_schema(src)))
    if not schemas:
        return [f"group_by {conf.name}: no sources and no schema provided"]

    # key columns present + consistent dtypes across sources
    key_types: dict[str, pa.DataType] = {}
    for label, sch in schemas:
        for k in conf.key_columns:
            if k not in sch.names:
                issues.append(
                    f"group_by {conf.name}: key column {k!r} missing from "
                    f"source {label} (has {list(sch.names)})")
            else:
                t = sch.field(k).type
                if k in key_types and key_types[k] != t:
                    issues.append(
                        f"group_by {conf.name}: key {k!r} type differs "
                        f"across sources: {key_types[k]} vs {t}")
                key_types[k] = t

    label, sch = schemas[0]
    needs_ts = temporal or any(not p.window.unbounded for p in conf.parts())
    if needs_ts and "ts" not in sch.names:
        issues.append(
            f"group_by {conf.name}: temporal/windowed aggregation needs a "
            f"'ts' column on source {label} (reference Analyzer "
            f"timestamp check)")
    elif needs_ts:
        t = sch.field("ts").type
        if not (pa.types.is_integer(t) or pa.types.is_timestamp(t)):
            issues.append(
                f"group_by {conf.name}: 'ts' must be epoch-millis int or "
                f"timestamp, got {t}")

    for p in conf.parts():
        if p.input_column not in sch.names:
            issues.append(
                f"group_by {conf.name}: aggregation input "
                f"{p.input_column!r} missing from source {label}")
            continue
        t = sch.field(p.input_column).type
        if p.operation in _NUMERIC_OPS and not _is_numericish(t):
            issues.append(
                f"group_by {conf.name}: {p.operation.value} needs a numeric "
                f"input; {p.input_column!r} is {t}")
        if p.operation in _K_REQUIRED and "k" not in p.args:
            issues.append(
                f"group_by {conf.name}: {p.operation.value} on "
                f"{p.input_column!r} needs k in arg_map")
        if p.bucket is not None and p.bucket not in sch.names:
            issues.append(
                f"group_by {conf.name}: bucket column {p.bucket!r} missing "
                f"from source {label}")
    # output-name collisions
    names = [p.output_name for p in conf.parts()]
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        issues.append(
            f"group_by {conf.name}: duplicate output columns {sorted(dupes)}")
    return issues


def analyze_join(jc: JoinConf) -> list[str]:
    """Validate a multi-part Join: left schema, per-part key mappings, and
    cross-part output prefix collisions."""
    issues: list[str] = []
    left_schema = _source_schema(jc.left)
    if "ts" not in left_schema.names:
        issues.append(f"join {jc.name}: left source needs a 'ts' column")
    out_names: dict[str, str] = {}
    for part in jc.parts:
        gb = part.group_by
        r2l = part.right_to_left()
        for right_key, left_col in ((k, r2l.get(k, k))
                                    for k in gb.key_columns):
            if left_col not in left_schema.names:
                issues.append(
                    f"join {jc.name}/{part.full_prefix}: left column "
                    f"{left_col!r} (for right key {right_key!r}) missing "
                    f"from the left source (has {list(left_schema.names)})")
        issues.extend(analyze_group_by(
            gb, temporal=(gb.accuracy or Accuracy.TEMPORAL)
            == Accuracy.TEMPORAL))
        # key dtype compatibility left vs right
        for src in gb.sources[:1]:
            rsch = _source_schema(src)
            for right_key in gb.key_columns:
                left_col = r2l.get(right_key, right_key)
                if left_col in left_schema.names and right_key in rsch.names:
                    lt = left_schema.field(left_col).type
                    rt = rsch.field(right_key).type
                    if lt != rt:
                        issues.append(
                            f"join {jc.name}/{part.full_prefix}: key dtype "
                            f"mismatch {left_col!r}:{lt} (left) vs "
                            f"{right_key!r}:{rt} (right)")
        for p in gb.parts():
            full = f"{part.full_prefix}_{p.output_name}"
            if full in out_names:
                issues.append(
                    f"join {jc.name}: output column {full!r} produced by "
                    f"both {out_names[full]} and {part.full_prefix} "
                    f"(set JoinPart.prefix)")
            out_names[full] = part.full_prefix
    return issues


def check_availability(table: str, start: str, end: str,
                       max_window_days: Optional[int],
                       partition_col: str = "ds") -> list[str]:
    """Input partitions must cover [start − max_window, end] (reference
    Analyzer dataAvailability check). ``max_window_days=None`` (unbounded)
    only requires any partition ≤ start to exist."""
    from .sources import list_partitions
    from .state.partitions import shift_ds

    parts = list_partitions(table, partition_col)
    if not parts:
        return []  # unpartitioned file — nothing to check
    issues = []
    need_start = start if max_window_days is None \
        else shift_ds(start, -max_window_days)
    if max_window_days is not None and parts[0] > need_start:
        issues.append(
            f"table {table}: earliest partition {parts[0]} is after the "
            f"required window start {need_start} (= {start} − "
            f"{max_window_days}d); features near {start} would silently "
            f"miss history")
    if parts[-1] < end:
        issues.append(
            f"table {table}: latest partition {parts[-1]} is before the "
            f"requested end {end}")
    return issues


def check_group_by(conf: GroupByConf, **kw) -> None:
    issues = analyze_group_by(conf, **kw)
    if issues:
        raise AnalyzerError(issues)


def check_join(jc: JoinConf) -> None:
    issues = analyze_join(jc)
    if issues:
        raise AnalyzerError(issues)


def profile_table(ds, columns: Optional[list[str]] = None):
    """One-streaming-pass column profile (the Analyzer's data-quality
    side): per column — row count, null count, and min/max for
    numeric/temporal columns. Per-batch partials (one tiny row per column
    per batch) combine on the driver; the table itself never leaves the
    workers.

    Returns a pandas frame (column, n_rows, n_nulls, min_val, max_val) —
    min/max as float64, NaN for non-numeric columns."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    sch = ds.schema()
    names = columns or sch.names

    def partial(t: pa.Table) -> pa.Table:
        rows = []
        for c in names:
            col = t[c]
            n = len(col)
            nn = col.null_count
            lo = hi = float("nan")
            # flat numeric/temporal only — _is_numericish recurses into
            # list value types, but min_max has no list kernel
            flat_numeric = (pa.types.is_integer(col.type)
                            or pa.types.is_floating(col.type)
                            or pa.types.is_decimal(col.type))
            if flat_numeric or pa.types.is_timestamp(col.type):
                if pa.types.is_timestamp(col.type):
                    # epoch seconds, TZ-independent (naive datetime
                    # .timestamp() would use the worker's local zone)
                    col = pc.cast(pc.cast(col, pa.timestamp("us")),
                                  pa.int64())
                    mm = pc.min_max(col)
                    lov, hiv = mm["min"].as_py(), mm["max"].as_py()
                    if lov is not None:
                        lo, hi = lov / 1e6, hiv / 1e6
                else:
                    mm = pc.min_max(col)
                    lov, hiv = mm["min"].as_py(), mm["max"].as_py()
                    if lov is not None:
                        lo, hi = float(lov), float(hiv)
            rows.append((c, n, nn, lo, hi))
        cols = list(zip(*rows))
        # min/max as NULL (not NaN) so the distributed Min/Max skip them
        return pa.table({
            "column": pa.array(cols[0]),
            "n_rows": pa.array(np.array(cols[1], dtype=np.int64)),
            "n_nulls": pa.array(np.array(cols[2], dtype=np.int64)),
            "min_val": pa.array([None if np.isnan(v) else float(v)
                                 for v in cols[3]], type=pa.float64()),
            "max_val": pa.array([None if np.isnan(v) else float(v)
                                 for v in cols[4]], type=pa.float64()),
        })

    partial.__name__ = "profile_partial"
    import pandas as pd

    from ray.data.aggregate import Max, Min, Sum

    # distributed reduce: per-block partials collapse to one row per COLUMN
    # inside the cluster (never n_blocks × n_cols raw rows on the driver —
    # at 10⁶ blocks that would be tens of millions of driver rows)
    parts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("column") \
        .aggregate(Sum("n_rows"), Sum("n_nulls"),
                   Min("min_val"), Max("max_val")) \
        .to_pandas()
    out = parts.rename(columns={
        "sum(n_rows)": "n_rows", "sum(n_nulls)": "n_nulls",
        "min(min_val)": "min_val", "max(max_val)": "max_val"})
    for c in ("min_val", "max_val"):
        out[c] = out[c].astype(np.float64)
    # preserve requested column order
    order = {c: i for i, c in enumerate(names)}
    return out.sort_values("column", key=lambda s: s.map(order)) \
        .reset_index(drop=True)
