"""chronon_ray — a from-scratch Ray-Data-native offline feature engine with
the query/data-processing capabilities of the reference feature platform
(kambstreat/chronon batch side). See SURVEY.md for the blueprint."""

from .api import (  # noqa: F401
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
from .expr import SqlExpr, sql_expr, sql_where  # noqa: F401

__version__ = "0.1.0"
