"""Partition-range arithmetic: the resume/checkpoint calculus.

Re-expression of the reference's PartitionRange/unfilledRanges machinery
(reference: spark/src/main/scala/ai/chronon/spark/DataRange.scala:45-208;
spark/TableUtils.scala:779-858 unfilledRanges + skipFirstHole;
spark/JoinBase.scala:535-549 stepDays slicing): everything incremental —
what to compute, what to skip on re-run, how to chunk — is expressed as
arithmetic over inclusive [start, end] ranges of `ds` date strings.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import date, timedelta
from typing import Iterable, Optional, Sequence

DS_FMT = "%Y-%m-%d"


def ds_to_date(ds: str) -> date:
    return date.fromisoformat(ds)


def date_to_ds(d: date) -> str:
    return d.isoformat()


def shift_ds(ds: str, days: int) -> str:
    return date_to_ds(ds_to_date(ds) + timedelta(days=days))


@dataclass(frozen=True)
class PartitionRange:
    """Inclusive [start, end] of ds strings; None = unbounded side."""

    start: Optional[str]
    end: Optional[str]

    def valid(self) -> bool:
        return self.start is None or self.end is None or self.start <= self.end

    def partitions(self) -> list[str]:
        assert self.start is not None and self.end is not None, "unbounded range"
        out, d, e = [], ds_to_date(self.start), ds_to_date(self.end)
        while d <= e:
            out.append(date_to_ds(d))
            d += timedelta(days=1)
        return out

    def intersect(self, other: "PartitionRange") -> "PartitionRange":
        start = max(filter(None, [self.start, other.start]), default=None)
        end = min(filter(None, [self.end, other.end]), default=None)
        return PartitionRange(start, end)

    def shift(self, days: int) -> "PartitionRange":
        return PartitionRange(
            shift_ds(self.start, days) if self.start else None,
            shift_ds(self.end, days) if self.end else None,
        )

    def steps(self, step_days: int) -> list["PartitionRange"]:
        """Chunk into contiguous ranges of at most step_days (JoinBase.scala:
        535-549; default 30 in the reference runner)."""
        assert self.start and self.end
        out = []
        cur = ds_to_date(self.start)
        e = ds_to_date(self.end)
        while cur <= e:
            nxt = min(cur + timedelta(days=step_days - 1), e)
            out.append(PartitionRange(date_to_ds(cur), date_to_ds(nxt)))
            cur = nxt + timedelta(days=1)
        return out


def collapse_to_ranges(partitions: Iterable[str]) -> list[PartitionRange]:
    """Sorted distinct ds values → maximal contiguous ranges."""
    parts = sorted(set(partitions))
    out: list[PartitionRange] = []
    run_start = prev = None
    for p in parts:
        if prev is not None and ds_to_date(p) == ds_to_date(prev) + timedelta(days=1):
            prev = p
            continue
        if run_start is not None:
            out.append(PartitionRange(run_start, prev))
        run_start = prev = p
    if run_start is not None:
        out.append(PartitionRange(run_start, prev))
    return out


def unfilled_ranges(
    requested: PartitionRange,
    existing_output: Sequence[str],
    input_partitions: Optional[Sequence[str]] = None,
    skip_first_hole: bool = True,
) -> list[PartitionRange]:
    """requested − existing (∩ available inputs), as contiguous chunks.

    ``skip_first_hole``: holes before the last filled output partition are
    assumed intentional (e.g. retention-deleted) and not refilled — matching
    the reference's resume semantics (TableUtils.scala:824-841)."""
    want = set(requested.partitions())
    have = set(existing_output)
    if input_partitions is not None:
        want &= set(input_partitions)
    missing = want - have
    if skip_first_hole and have:
        last_filled = max(have & set(requested.partitions()), default=None)
        if last_filled is not None:
            missing = {p for p in missing if p > last_filled}
    return collapse_to_ranges(missing)
