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
        _LOCAL.setups_done = set()
    return con


def ensure_setups(setups) -> None:
    """Run setup DDL statements (UDF/macro definitions — the analog of the
    reference's Query.setups, api.thrift:46-48) once per worker process on
    the cached DuckDB connection, before any SqlExpr evaluates. Idempotent:
    each distinct statement executes at most once per connection."""
    if not setups:
        return
    con = _con()
    done = _LOCAL.setups_done
    for stmt in setups:
        if stmt not in done:
            con.execute(stmt)
            done.add(stmt)


class SqlExpr:
    """Callable(table) -> Array for one scalar SQL expression.

    ``setups``: DDL statements (e.g. ``CREATE MACRO``) executed on the
    worker's DuckDB connection before the expression — the reference's
    Query.setups surface."""

    def __init__(self, expression: str, setups=()):
        self.expression = expression
        self.setups = tuple(setups)
        self.__name__ = f"sql({expression})"

    def __call__(self, t: pa.Table) -> pa.Array:
        if not self.setups and _IDENT.match(self.expression) \
                and self.expression in t.column_names:
            col = t[self.expression]
            return col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
                else col
        ensure_setups(self.setups)
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
            and other.expression == self.expression \
            and other.setups == self.setups

    def __hash__(self):
        return hash(("SqlExpr", self.expression, self.setups))


def sql_expr(expression: str, setups=()) -> SqlExpr:
    return SqlExpr(expression, setups=setups)


def sql_where(predicate: str, setups=()):
    """Predicate string -> callable(table) -> BooleanArray for TQuery.wheres."""
    return SqlExpr(f"coalesce(({predicate}), false)", setups=setups)
