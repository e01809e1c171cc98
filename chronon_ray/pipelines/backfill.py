"""Historical backfill driver: range planning → per-step compute → atomic
partitioned write with lineage; resumable by partition diff.

The offline lifecycle of the reference's GroupBy/Join backfill (reference:
spark/GroupBy.scala:682-767 computeBackfill; spark/JoinBase.scala:478-549
computeJoin range planning; TableUtils.scala:779-858 unfilledRanges):

1. requested range ∩ available input partitions − already-written output
   partitions (same semantic hash) → contiguous unfilled chunks;
2. chunks sliced to ``step_days``;
3. per step: window-aware input scan ([step.start − max_window, step.end] —
   GroupBy.scala:565-606 getIntersectedRange), pipeline, atomic write with
   per-partition manifests (state/lineage.py);
4. a re-run recomputes nothing that is already complete; a config change
   (semantic hash) archives stale partitions first.
"""

from __future__ import annotations

import math
import time
from typing import Callable, Optional

import ray.data

from ..api import GroupByConf, UNBOUNDED
from ..sources import list_partitions, scan_table
from ..state.lineage import archive_mismatched, completed_partitions, write_partitioned
from ..state.partitions import PartitionRange, shift_ds, unfilled_ranges

MILLIS_DAY = 86_400_000


def max_window_days(conf: GroupByConf) -> Optional[int]:
    """None = some window unbounded → scan all history (Extensions.scala
    WindowOps; GroupBy.scala:565-580)."""
    days = 0
    for p in conf.parts():
        if p.window.unbounded:
            return None
        days = max(days, math.ceil(p.window.millis / MILLIS_DAY))
    return days


def backfill_temporal_join(
    left_table: str,
    right_table: str,
    conf: GroupByConf,
    out_dir: str,
    start: str,
    end: str,
    step_days: int = 30,
    num_partitions: int = 64,
    write_fn: Optional[Callable] = None,
) -> dict:
    """Backfill PITC features for left rows with ds in [start, end].

    Returns a summary dict {steps, partitions_written, skipped, metrics}.
    """
    from .temporal import temporal_join

    config_hash = conf.semantic_hash()
    archived = archive_mismatched(out_dir, config_hash)
    done = completed_partitions(out_dir, config_hash)
    left_parts = list_partitions(left_table)
    requested = PartitionRange(start, end)
    chunks = unfilled_ranges(requested, done,
                             input_partitions=left_parts or None,
                             skip_first_hole=False)
    steps = [s for c in chunks for s in c.steps(step_days)]
    summary = {"steps": len(steps), "partitions_written": [], "archived": archived,
               "skipped": sorted(set(done) & set(requested.partitions())),
               "metrics": {}}
    w_days = max_window_days(conf)
    for step in steps:
        t0 = time.perf_counter()
        from ..api import TQuery
        from dataclasses import replace as _rep

        left = scan_table(left_table, TQuery(start_partition=step.start,
                                             end_partition=step.end))
        right_start = None if w_days is None else shift_ds(step.start, -w_days)
        right = scan_table(right_table, TQuery(start_partition=right_start,
                                               end_partition=step.end))
        out = temporal_join(left, right, conf, num_partitions=num_partitions)
        writer = write_fn or write_partitioned
        manifests = writer(out, out_dir, config_hash,
                           input_range=(step.start, step.end),
                           metrics={"step_wall_sec": round(time.perf_counter() - t0, 3)})
        summary["partitions_written"].extend(sorted(manifests))
        summary["metrics"][f"{step.start}..{step.end}"] = {
            "wall_sec": round(time.perf_counter() - t0, 3),
            "rows": sum(m["rows"] for m in manifests.values()),
        }
    return summary


def backfill_snapshot_groupby(
    source_table: str,
    conf: GroupByConf,
    out_dir: str,
    start: str,
    end: str,
    step_days: int = 30,
    num_partitions: int = 64,
) -> dict:
    """Daily-snapshot GroupBy backfill: for each output ds, aggregate all
    source rows with event ds ≤ that day within the window (end-of-day
    accuracy — reference GroupBy.scala:143-168 snapshotEvents). One output
    row per (key, ds)."""
    import pyarrow as pa

    from .groupby import aggregate_snapshot

    config_hash = conf.semantic_hash()
    archive_mismatched(out_dir, config_hash)
    done = completed_partitions(out_dir, config_hash)
    requested = PartitionRange(start, end)
    chunks = unfilled_ranges(requested, done, skip_first_hole=False)
    w_days = max_window_days(conf)
    summary = {"partitions_written": [], "skipped": sorted(done)}
    for chunk in chunks:
        for ds_val in chunk.partitions():
            from ..api import TQuery

            t0 = time.perf_counter()
            src_start = None if w_days is None else shift_ds(ds_val, -(w_days - 1))
            src = scan_table(source_table, TQuery(start_partition=src_start,
                                                  end_partition=ds_val))
            out = aggregate_snapshot(src, conf, num_partitions=num_partitions)
            tbl = pa.concat_tables([b for b in out.iter_batches(batch_format="pyarrow")]) \
                if out.count() else None
            if tbl is None:
                continue
            tbl = tbl.append_column("ds", pa.array([ds_val] * len(tbl)))
            manifests = write_partitioned(
                tbl, out_dir, config_hash, input_range=(src_start, ds_val),
                metrics={"step_wall_sec": round(time.perf_counter() - t0, 3)})
            summary["partitions_written"].extend(sorted(manifests))
    return summary
