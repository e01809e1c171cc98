"""chronon_ray — a from-scratch Ray-Data-native offline feature engine with
the query/data-processing capabilities of the reference feature platform
(kambstreat/chronon batch side). See SURVEY.md for the blueprint."""

import logging as _logging


class _DropSchemaHashWarning(_logging.Filter):
    """Ray 2.49's block-concat schema-dedup emits a harmless
    "Failed to hash the schemas (for deduplication): unhashable type: 'dict'"
    warning for every map-typed batch (pa.Schema with map fields isn't
    hashable); it's pure noise at our volume and would bury real warnings.
    Installed here so it applies in every Ray worker that unpickles our
    stages (importing chronon_ray is what triggers it)."""

    def filter(self, record: _logging.LogRecord) -> bool:  # pragma: no cover
        return "Failed to hash the schemas" not in record.getMessage()


_logging.getLogger("ray.data._internal.arrow_ops.transform_pyarrow").addFilter(
    _DropSchemaHashWarning())


class _DropEmptyBundleSchemaWarning(_logging.Filter):
    """Ray's streaming executor warns "Operator produced a RefBundle with a
    different schema than the previous one" whenever a groupby partition
    comes back EMPTY (the empty block carries no schema — 'new schema: .'),
    which is routine for hash-partitioned reduces with more partitions than
    groups (e.g. the kNN per-query top-k). Only that benign empty-new-schema
    shape is dropped; a real schema mismatch (both schemas non-empty) still
    surfaces."""

    def filter(self, record: _logging.LogRecord) -> bool:  # pragma: no cover
        msg = record.getMessage()
        return not ("Operator produced a RefBundle with a different schema"
                    in msg and "new schema: ." in msg)


_logging.getLogger(
    "ray.data._internal.execution.streaming_executor_state").addFilter(
    _DropEmptyBundleSchemaWarning())

from .api import (  # noqa: F401,E402
    Accuracy,
    BootstrapPart,
    Aggregation,
    AggregationPart,
    EntitySource,
    EventSource,
    GroupByConf,
    JoinConf,
    JoinPart,
    Operation,
    TimeUnit,
    TQuery,
    UNBOUNDED,
    Window,
    agg,
    window,
)
from .expr import SqlExpr, sql_expr, sql_where  # noqa: F401,E402

__version__ = "0.1.0"
