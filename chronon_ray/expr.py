"""SQL-string expressions as vectorized batch callables.

The reference delegates select/derivation expression strings to Spark SQL
(reference: api/Extensions.scala:1069-1120 derivationProjection;
spark/GroupBy.scala renderDataSourceQuery). Here a SQL string compiles to a
callable(table) -> Array evaluated per Arrow batch by DuckDB — zero-copy in
(``register`` on the Arrow table), vectorized C++ execution, full ANSI-SQL
expression surface (CASE, string functions, arithmetic, casts) with no
custom parser to maintain.

Usage — anywhere a SelectExpr callable is accepted:

    TQuery.of(selects={"price_ratio": sql_expr("a / nullif(b, 0)")})
    JoinConf(..., derivations=(("ratio", sql_expr("x_sum / y_count")),))

The connection is cached per process (one per Ray worker), so per-batch
overhead is a catalog register + one relation execution.
"""

from __future__ import annotations

import re
import threading

import pyarrow as pa

_LOCAL = threading.local()

#: bare column name / simple identifier — no SQL engine needed
_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _con():
    con = getattr(_LOCAL, "con", None)
    if con is None:
        import duckdb

        con = duckdb.connect()
        _LOCAL.con = con
    return con


class SqlExpr:
    """Callable(table) -> Array for one scalar SQL expression."""

    def __init__(self, expression: str):
        self.expression = expression
        self.__name__ = f"sql({expression})"

    def __call__(self, t: pa.Table) -> pa.Array:
        if _IDENT.match(self.expression) \
                and self.expression in t.column_names:
            col = t[self.expression]
            return col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
                else col
        con = _con()
        con.register("__batch", t)
        out = con.sql(
            f"select {self.expression} as __e from __batch").arrow()
        con.unregister("__batch")
        col = out["__e"]
        return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col

    def __repr__(self):
        return f"SqlExpr({self.expression!r})"

    def __eq__(self, other):
        return isinstance(other, SqlExpr) \
            and other.expression == self.expression

    def __hash__(self):
        return hash(("SqlExpr", self.expression))


def sql_expr(expression: str) -> SqlExpr:
    return SqlExpr(expression)


def sql_where(predicate: str):
    """Predicate string -> callable(table) -> BooleanArray for TQuery.wheres."""
    return SqlExpr(f"coalesce(({predicate}), false)")
