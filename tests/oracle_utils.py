"""Local replica of the driver's correctness gate: run the engine query and
its DuckDB oracle side-by-side, compare row count + column names +
order-insensitive values (exact, including floats — the engine is built to
be bit-identical, see functions/__init__.py)."""

from __future__ import annotations

import datetime
import math
from typing import Any

import duckdb

from tiny_mapreduce_rpc_server_spark.sources import TABLES, table_path


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _canon(v: Any) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def _rowset(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def compare(spark_df, oracle_sql: str, sf_dir: str, max_diff: int = 5) -> None:
    """Assert engine result == oracle result (order-insensitive)."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    con = duckdb_connect(sf_dir)
    cur = con.execute(oracle_sql)
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()

    assert sorted(s_cols) == sorted(o_cols), (
        f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), (
        f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    )
    s_set = _rowset(s_cols, s_rows)
    o_set = _rowset(o_cols, o_rows)
    if s_set != o_set:
        diffs = []
        for a, b in zip(s_set, o_set):
            if a != b:
                diffs.append(f"  spark : {a}\n  oracle: {b}")
                if len(diffs) >= max_diff:
                    break
        raise AssertionError(
            "value mismatch (first diffs):\n" + "\n".join(diffs)
        )
