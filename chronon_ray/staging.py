"""StagingQuery: arbitrary SQL with date macros, filled per partition range.

Parity with the reference's StagingQuery (reference: api/thrift/api.thrift:
25-49; spark/StagingQuery.scala:69-126 — macro substitution of
``{{ start_date }} / {{ end_date }} / {{ latest_date }} /
{{ max_date(table=ns.tbl) }}`` and fill-what's-missing semantics). The
reference delegates execution to the warehouse's SQL engine; here DuckDB
plays that role over the same parquet tables — the result lands as a
ds-partitioned parquet table that every Ray pipeline can scan. This is a
warehouse-side utility, not a Ray hot path.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import duckdb
import pyarrow as pa

from .sources import list_partitions
from .state.lineage import completed_partitions, write_partitioned
from .state.partitions import PartitionRange, unfilled_ranges

_MAX_DATE_RE = re.compile(r"\{\{\s*max_date\(table=([\w./-]+)\)\s*\}\}")


def render_macros(sql: str, start: str, end: str, latest: Optional[str],
                  tables: dict[str, str]) -> str:
    """Substitute the reference's parametric macros (ParametricMacro —
    api/ParametricMacro.scala)."""
    out = sql.replace("{{ start_date }}", f"'{start}'")
    out = out.replace("{{ end_date }}", f"'{end}'")
    if latest is not None:
        out = out.replace("{{ latest_date }}", f"'{latest}'")

    def max_date(m: re.Match) -> str:
        table = m.group(1)
        parts = list_partitions(tables[table])
        if not parts:
            raise ValueError(f"max_date: no partitions in {table}")
        return f"'{parts[-1]}'"

    return _MAX_DATE_RE.sub(max_date, out)


def run_staging_query(
    sql: str,
    tables: dict[str, str],
    out_dir: str,
    start: str,
    end: str,
    step_days: int = 30,
    partition_col: str = "ds",
) -> dict:
    """Execute the query per unfilled step range and write ds-partitioned
    output with lineage manifests (same resume semantics as backfills).
    The query must produce a ``ds`` column."""
    import hashlib

    config_hash = hashlib.md5(sql.encode()).hexdigest()[:16]
    done = completed_partitions(out_dir, config_hash)
    chunks = unfilled_ranges(PartitionRange(start, end), done,
                             skip_first_hole=False)
    written: list[str] = []
    for chunk in chunks:
        for step in chunk.steps(step_days):
            con = duckdb.connect()
            for name, path in tables.items():
                if os.path.isdir(path):
                    con.sql(f"create view {name} as select * from "
                            f"read_parquet('{path}/*/*.parquet', "
                            f"hive_partitioning=true)")
                else:
                    con.sql(f"create view {name} as select * from "
                            f"read_parquet('{path}')")
            latest = list_partitions(next(iter(tables.values()))) or [end]
            rendered = render_macros(sql, step.start, step.end,
                                     latest[-1], tables)
            tbl: pa.Table = con.sql(rendered).arrow()
            con.close()
            if partition_col not in tbl.column_names:
                raise ValueError("staging query output must include a ds column")
            manifests = write_partitioned(tbl, out_dir, config_hash,
                                          input_range=(step.start, step.end))
            written.extend(sorted(manifests))
    return {"partitions_written": written, "skipped": done}
