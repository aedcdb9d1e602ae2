"""Scalar/aggregate expression helpers.

Deterministic double aggregation: summing IEEE doubles is
order-dependent, and Spark's shuffle order differs run-to-run and from
any oracle engine. For oracle-comparable results we cast each term to
an exact decimal first (per-row cast is order-independent), sum the
decimals exactly, then cast back to double. The oracle SQL mirrors the
same casts, so both engines produce bit-identical doubles.

At scale this costs one widening cast per row — JVM-side, codegen'd,
no Python involved.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: int = 4, precision: int = 30) -> Column:
    """Order-independent SUM over doubles via exact decimal accumulation."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def davg(col: Column | str, scale: int = 4, precision: int = 30) -> Column:
    """Order-independent AVG: exact decimal sum, then IEEE double division.

    Division happens in double (not decimal) because decimal division
    scale rules differ across engines; double division of identical
    operands is bit-deterministic everywhere.
    """
    c = F.col(col) if isinstance(col, str) else col
    dec = c.cast(f"decimal({precision},{scale})")
    return F.sum(dec).cast("double") / F.count(dec).cast("double")


def dsum_sql(expr: str, scale: int = 4, precision: int = 30) -> str:
    """DuckDB oracle twin of :func:`dsum`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL({precision},{scale}))) AS DOUBLE)"


def davg_sql(expr: str, scale: int = 4, precision: int = 30) -> str:
    """DuckDB oracle twin of :func:`davg`."""
    d = f"CAST(({expr}) AS DECIMAL({precision},{scale}))"
    return f"CAST(SUM({d}) AS DOUBLE) / CAST(COUNT({d}) AS DOUBLE)"
