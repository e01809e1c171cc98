"""User-facing configuration model.

A from-scratch, Python-native re-expression of the reference's Thrift config
surface (reference: api/thrift/api.thrift — Query :7-17, EventSource :51-71,
EntitySource :81-101, Operation :136-165, Window :168-176, Aggregation
:182-208, GroupBy :266-282, Join :304-336). Plain dataclasses; no Thrift.

Output-column naming parity (reference api/src/main/scala/ai/chronon/api/
Extensions.scala:154-179):
    ``{input}_{op}{_k}{_window}{_by_bucket}``  e.g. ``value_sum_7d_by_source``
with window suffix ``_{length}{unit-char}`` and no suffix for unbounded.
"""

from __future__ import annotations

import enum
import hashlib
import json
from dataclasses import dataclass, field
from typing import Any, Callable, Optional, Sequence, Union

MILLIS_HOUR = 3_600_000
MILLIS_DAY = 86_400_000
MILLIS_MINUTE = 60_000


class TimeUnit(enum.Enum):
    HOURS = MILLIS_HOUR
    DAYS = MILLIS_DAY
    MINUTES = MILLIS_MINUTE

    @property
    def short(self) -> str:
        return {"HOURS": "h", "DAYS": "d", "MINUTES": "m"}[self.name]


@dataclass(frozen=True)
class Window:
    """Reference: api.thrift:168-176; Extensions.scala:62-71 (WindowOps)."""

    length: int
    unit: TimeUnit = TimeUnit.DAYS

    @property
    def millis(self) -> int:
        return self.length * self.unit.value

    @property
    def unbounded(self) -> bool:
        return self.length <= 0 or self.length == (1 << 31) - 1

    @property
    def suffix(self) -> str:
        return "" if self.unbounded else f"_{self.length}{self.unit.short}"

    @property
    def str(self) -> str:
        return "unbounded" if self.unbounded else f"{self.length}{self.unit.short}"


#: sentinel for "no window" == all history (Extensions.scala WindowUtils.Unbounded)
UNBOUNDED = Window((1 << 31) - 1, TimeUnit.DAYS)


class Operation(enum.Enum):
    """Reference: api.thrift:136-165 (19 operations)."""

    COUNT = "count"
    SUM = "sum"
    AVERAGE = "average"
    VARIANCE = "variance"
    SKEW = "skew"
    KURTOSIS = "kurtosis"
    MIN = "min"
    MAX = "max"
    UNIQUE_COUNT = "unique_count"
    APPROX_UNIQUE_COUNT = "approx_unique_count"
    APPROX_PERCENTILE = "approx_percentile"
    HISTOGRAM = "histogram"
    APPROX_HISTOGRAM_K = "approx_histogram_k"
    FIRST = "first"
    LAST = "last"
    FIRST_K = "first_k"
    LAST_K = "last_k"
    TOP_K = "top_k"
    BOTTOM_K = "bottom_k"


#: ops whose op-suffix embeds k (Extensions.scala:167-174)
_K_OPS = {
    Operation.LAST_K: "last",
    Operation.FIRST_K: "first",
    Operation.TOP_K: "top",
    Operation.BOTTOM_K: "bottom",
}

#: ops that need the event timestamp alongside the value
TIMED_OPS = {Operation.FIRST, Operation.LAST, Operation.FIRST_K, Operation.LAST_K}


@dataclass(frozen=True)
class AggregationPart:
    """One (column, op, window, bucket) unit == one output column.

    Reference: api.thrift:211-217; Extensions.scala:154-179 (AggregationPartOps).
    """

    input_column: str
    operation: Operation
    window: Window = UNBOUNDED
    arg_map: tuple = ()  # tuple of (k, v) pairs so the part stays hashable
    bucket: Optional[str] = None

    @property
    def args(self) -> dict:
        return dict(self.arg_map)

    def get_int(self, key: str, default: Optional[int] = None) -> int:
        v = self.args.get(key, default)
        if v is None:
            raise ValueError(f"{key} must be set in arg_map for {self.operation}")
        return int(v)

    @property
    def op_suffix(self) -> str:
        if self.operation in _K_OPS:
            return f"{_K_OPS[self.operation]}{self.get_int('k')}"
        return self.operation.value

    @property
    def output_name(self) -> str:
        bucket_suffix = f"_by_{self.bucket}" if self.bucket else ""
        return f"{self.input_column}_{self.op_suffix}{self.window.suffix}{bucket_suffix}"


@dataclass(frozen=True)
class Aggregation:
    """Declared agg; explodes into one AggregationPart per window × bucket.

    Reference: api.thrift:182-208; Extensions.scala:181-210 (unpack).
    """

    input_column: str
    operation: Operation
    arg_map: tuple = ()
    windows: Optional[Sequence[Window]] = None
    buckets: Optional[Sequence[str]] = None

    def unpack(self) -> list[AggregationPart]:
        windows = list(self.windows) if self.windows else [UNBOUNDED]
        buckets = list(self.buckets) if self.buckets else [None]
        return [
            AggregationPart(self.input_column, self.operation, w, tuple(self.arg_map), b)
            for b in buckets
            for w in windows
        ]


def unpack_aggregations(aggs: Sequence[Aggregation]) -> list[AggregationPart]:
    parts: list[AggregationPart] = []
    for a in aggs:
        parts.extend(a.unpack())
    return parts


class Accuracy(enum.Enum):
    """api.thrift:219-222. TEMPORAL = millisecond-accurate sawtooth windows;
    SNAPSHOT = end-of-day accurate."""

    TEMPORAL = "temporal"
    SNAPSHOT = "snapshot"


# A select expression: a source column name, or a callable over a pyarrow
# Table returning an Array (the vectorized escape hatch for arbitrary exprs).
SelectExpr = Union[str, Callable]


@dataclass(frozen=True)
class TQuery:
    """Per-source row transform (reference Query, api.thrift:7-17).

    ``selects`` maps output column -> SelectExpr; None = passthrough all.
    ``wheres`` is a list of vectorized predicates (callable(table) -> bool mask)
    or pyarrow.dataset filter expressions AND-ed together.
    """

    selects: Optional[tuple] = None  # tuple of (out_name, SelectExpr)
    wheres: tuple = ()
    time_column: str = "ts"
    start_partition: Optional[str] = None
    end_partition: Optional[str] = None
    partition_column: str = "ds"
    #: setup DDL statements (UDF/macro definitions) run once per worker
    #: before selects/wheres evaluate (reference Query.setups,
    #: api.thrift:46-48)
    setups: tuple = ()

    @staticmethod
    def of(selects: Optional[dict] = None, wheres: Sequence = (), **kw) -> "TQuery":
        return TQuery(
            selects=tuple(selects.items()) if selects is not None else None,
            wheres=tuple(wheres),
            **kw,
        )


@dataclass(frozen=True)
class EventSource:
    """Immutable timestamped event log (api.thrift:51-71)."""

    table: str  # parquet file or ds-partitioned directory
    query: TQuery = TQuery()
    is_cumulative: bool = False


@dataclass(frozen=True)
class EntitySource:
    """Daily snapshot table of a mutating entity (api.thrift:81-101)."""

    snapshot_table: str
    query: TQuery = TQuery()


@dataclass(frozen=True)
class JoinSource:
    """A Join's output used as a source — chained joins (reference:
    api.thrift:125-128 JoinSource). ``join`` is resolved lazily by
    scan_source (its output feeds the downstream GroupBy/Join), with
    ``query``'s selects/wheres applied on top."""

    join: "JoinConf"
    query: TQuery = TQuery()


Source = Union[EventSource, EntitySource, "JoinSource"]


@dataclass(frozen=True)
class GroupByConf:
    """api.thrift:266-282. When ``aggregations`` is empty the source is assumed
    pre-grouped by keys (passthrough)."""

    name: str
    sources: tuple  # tuple[Source, ...]
    key_columns: tuple  # tuple[str, ...]
    aggregations: tuple = ()  # tuple[Aggregation, ...]
    accuracy: Optional[Accuracy] = None
    backfill_start_date: Optional[str] = None
    derivations: tuple = ()  # tuple[(out_name, SelectExpr)]
    #: event-order tie-break column for FIRST/LAST-style ops (engine extension:
    #: the reference breaks ts ties arbitrarily; we allow a deterministic one)
    tie_break_column: Optional[str] = None

    def parts(self) -> list[AggregationPart]:
        return unpack_aggregations(self.aggregations)

    def output_columns(self) -> list[str]:
        return [p.output_name for p in self.parts()]

    def semantic_hash(self) -> str:
        """md5 of the logical config — drives cache invalidation
        (reference: spark/SemanticHashUtils.scala)."""
        blob = repr(self).encode()
        return hashlib.md5(blob).hexdigest()[:16]


@dataclass(frozen=True)
class JoinPart:
    """api.thrift:~290; one right-side GroupBy of a Join."""

    group_by: GroupByConf
    key_mapping: tuple = ()  # tuple[(left_col, right_key)]
    prefix: Optional[str] = None

    @property
    def full_prefix(self) -> str:
        gb = self.group_by.name.replace(".", "_")
        return f"{self.prefix}_{gb}" if self.prefix else gb

    def right_to_left(self) -> dict:
        return {r: l for l, r in self.key_mapping}

    def left_to_right(self) -> dict:
        return dict(self.key_mapping)


@dataclass(frozen=True)
class BootstrapPart:
    """Precomputed-values table joined to the left to skip backfill
    (api.thrift:338-347). ``table`` is a parquet path (or, in tests, a
    ray Dataset); columns = row_ids + already-computed feature columns."""

    table: Any
    row_ids: tuple = ()


@dataclass(frozen=True)
class JoinConf:
    """api.thrift:304-336 — left source + joinParts."""

    name: str
    left: Source
    parts: tuple  # tuple[JoinPart, ...]
    skew_keys: tuple = ()  # tuple[(column, tuple(values))]
    derivations: tuple = ()
    row_ids: tuple = ()
    bootstrap_parts: tuple = ()  # tuple[BootstrapPart, ...]

    def semantic_hash(self) -> str:
        return hashlib.md5(repr(self).encode()).hexdigest()[:16]


def window(length: int, unit: str = "d") -> Window:
    u = {"h": TimeUnit.HOURS, "d": TimeUnit.DAYS, "m": TimeUnit.MINUTES}[unit]
    return Window(length, u)


def agg(
    col: str,
    op: Union[Operation, str],
    windows: Optional[Sequence[Window]] = None,
    buckets: Optional[Sequence[str]] = None,
    **args: Any,
) -> Aggregation:
    """Terse authoring helper: ``agg("value", "sum", [window(7)])``.

    ``bucket="col"`` is accepted as an alias for ``buckets=["col"]``; other
    unknown keyword args raise rather than silently landing in arg_map
    (only ``k`` and ``percentiles`` are read by any operation).
    """
    if isinstance(op, str):
        op = Operation(op.lower())
    if "bucket" in args:
        if buckets is not None:
            raise ValueError("pass either bucket= or buckets=, not both")
        buckets = [args.pop("bucket")]
    unknown = set(args) - {"k", "percentiles"}
    if unknown:
        raise ValueError(
            f"agg() got unknown arg(s) {sorted(unknown)}; "
            f"known arg_map keys are 'k' and 'percentiles' "
            f"(use Aggregation(...) directly for custom arg_map entries)")
    return Aggregation(
        input_column=col,
        operation=op,
        arg_map=tuple(sorted(args.items())),
        windows=tuple(windows) if windows else None,
        buckets=tuple(buckets) if buckets else None,
    )
