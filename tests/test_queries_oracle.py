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


@pytest.mark.parametrize(
    "name,spec", list(REGISTRY.items()), ids=list(REGISTRY)
)
def test_registry_no_array_outputs(spark, sf_dir, name, spec):
    """Registration rule: no top-level array/map columns in any
    registered query output. The driver canonicalizes results via
    pandas ``sort_values``, which raises "unhashable type: 'list'" on
    list cells — array-valued results must be registered through a
    stringified (to_json/array_join) projection; the array-typed
    functions stay library API. Schema-only check: builds the plan,
    never executes it."""
    from pyspark.sql import types as T

    schema = spec.fn(spark, sf_dir).schema
    bad = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType))
    ]
    assert not bad, (
        f"{name}: top-level array/map columns {bad} would crash the "
        "driver's pandas canonicalizer — serialize them (array_join/"
        "to_json) in the registered projection"
    )


def test_approx_distinct_within_rel_sd(spark, sf_dir):
    """HLL has no DuckDB oracle, but it DOES have a quantitative bound:
    approx_count_distinct(rsd=0.01) must land within a few rel-sd of
    the exact distinct count per group (5x slack over the 1% rsd)."""
    from parquet_export_spark.operators.relational import agg_approx_distinct
    from parquet_export_spark.sources.lake import load_tables

    t = load_tables(spark, sf_dir)
    approx = {
        r["l_returnflag"]: r["approx_orders"]
        for r in agg_approx_distinct(t).collect()
    }
    exact = {
        r["l_returnflag"]: r["n"]
        for r in t["lineitem"]
        .groupBy("l_returnflag")
        .agg(__import__("pyspark.sql.functions", fromlist=["countDistinct"])
             .countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, n in exact.items():
        assert abs(approx[flag] - n) <= max(5, 0.05 * n), (flag, approx[flag], n)


def test_sample_fraction_binomial_bound(spark, sf_dir):
    """Bernoulli sample size is Binomial(n, p): assert the observed
    size within 6 standard deviations of n*p (false-positive rate
    ~1e-9, deterministic given the fixed seed anyway)."""
    import math

    from parquet_export_spark.operators.relational import sample_fraction
    from parquet_export_spark.sources.lake import load_tables

    t = load_tables(spark, sf_dir)
    n = t["lineitem"].count()
    p = 0.1
    got = sample_fraction(t).count()
    sd = math.sqrt(n * p * (1 - p))
    assert abs(got - n * p) <= 6 * sd, (got, n * p, sd)


def test_train_split_fraction_and_stability(spark, sf_dir):
    """Hash-split must be ~80/20 and a pure function of doc_id: the
    assignment for any subset equals the full-corpus assignment."""
    from parquet_export_spark.operators.curation import train_eval_split
    from parquet_export_spark.sources.lake import load_tables

    t = load_tables(spark, sf_dir)
    full = train_eval_split(t)
    n = full.count()
    n_train = full.filter("split = 'train'").count()
    assert abs(n_train / n - 0.8) < 0.08  # binomial slack at 500 docs
    # subset invariance: splitting half the corpus assigns identically
    sub = {"documents": t["documents"].filter("doc_id % 2 = 0")}
    sub_map = {r.doc_id: r.split for r in train_eval_split(sub).collect()}
    full_map = {r.doc_id: r.split for r in full.collect()}
    assert all(full_map[d] == s for d, s in sub_map.items())
