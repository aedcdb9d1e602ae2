"""Oracle-differential test for every registered query (driver t2 replica)."""

from __future__ import annotations

import pytest

from parquet_export_spark.queries import REGISTRY
from tests.oracle_harness import compare

ORACLE_CASES = [(n, s) for n, s in REGISTRY.items() if s.oracle]
ROWS_ONLY_CASES = [(n, s) for n, s in REGISTRY.items() if not s.oracle]


@pytest.mark.parametrize("name,spec", ORACLE_CASES, ids=[n for n, _ in ORACLE_CASES])
def test_oracle_match(spark, sf_dir, name, spec):
    ok, msg = compare(spark, sf_dir, spec.fn, spec.oracle)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize(
    "name,spec", ROWS_ONLY_CASES, ids=[n for n, _ in ROWS_ONLY_CASES]
)
def test_rows_only_runs(spark, sf_dir, name, spec):
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
