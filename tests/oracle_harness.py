"""Local replica of the driver's t2 oracle-differential check.

Runs a registered Spark query and its DuckDB oracle SQL over the same
parquet lake, then compares row count, column names, and an
order-insensitive value fingerprint. Used by tests/test_queries_oracle.py
so oracle drift is caught before the driver sees it.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb

from parquet_export_spark.sources.lake import STAR_TABLES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in STAR_TABLES:
        path = table_path(sf_dir, name)
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Full precision: queries are designed to be bit-deterministic.
        return repr(v)
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray, memoryview)):
        return bytes(v).hex()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def fingerprint(rows: list[tuple], columns: list[str]) -> tuple:
    """(row_count, sorted column names, order-insensitive multiset of rows
    with columns sorted by name)."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    normed = sorted(
        tuple(str(_norm(row[i])) for i in order) for row in rows
    )
    return len(rows), tuple(sorted(columns)), normed


def compare(spark, sf_dir: str, fn, sql: str) -> tuple[bool, str]:
    sdf = fn(spark, sf_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols = sdf.columns
    con = duckdb_connection(sf_dir)
    try:
        res = con.execute(sql)
        d_cols = [d[0] for d in res.description]
        d_rows = res.fetchall()
    finally:
        con.close()
    sn, scols, srows = fingerprint(s_rows, s_cols)
    dn, dcols, drows = fingerprint(d_rows, d_cols)
    if sn != dn:
        return False, f"row count: spark={sn} duckdb={dn}"
    if scols != dcols:
        return False, f"columns: spark={scols} duckdb={dcols}"
    if srows != drows:
        diffs = [
            f"  spark={a}\n  duck ={b}"
            for a, b in zip(srows, drows)
            if a != b
        ][:3]
        return False, "value mismatch (first diffs):\n" + "\n".join(diffs)
    return True, "ok"
