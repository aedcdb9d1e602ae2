"""Round-7 additions: the loud HITS overflow envelope (r6 verdict #3)
and the exact-decimal assortativity sums.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet_export_spark.operators import graph as G
from parquet_export_spark.sources.lake import load_tables


def _small_tables(spark):
    return load_tables(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# HITS int64 overflow envelope: loud guard (round-7 verdict #3 — the
# hole PageRank closed in round 6, applied to the other iterative op)
# ---------------------------------------------------------------------------


def test_hits_envelope_formula():
    """The guard's envelope is the docstring proof's bound: the
    normalization multiply degree * SCALE^2 must stay under 2^63."""
    mx = G._hits_max_degree()
    assert mx * G.HITS_SCALE * G.HITS_SCALE < 2**63
    assert (mx + 1) * G.HITS_SCALE * G.HITS_SCALE >= 2**63
    # with the shipped constants the envelope covers ~9e6 max degree
    assert mx > 9 * 10**6


def test_hits_over_envelope_raises(spark, monkeypatch):
    """Adversarial over-envelope graph: shrink SCALE so the envelope
    falls below a 2-degree synthetic bipartite graph and assert the
    operator RAISES before iterating — under ansi=false the
    normalization multiply would otherwise wrap silently."""
    monkeypatch.setattr(G, "HITS_SCALE", 2**31)
    assert G._hits_max_degree() == 1  # any degree-2 node is over
    t = {
        "orders": spark.createDataFrame(
            [(1, 10), (2, 11)], "o_orderkey long, o_custkey long"
        ),
        "lineitem": spark.createDataFrame(
            # supplier 7 ships both orders: in-degree 2 > envelope 1
            [(1, 7), (2, 7)],
            "l_orderkey long, l_suppkey long",
        ),
    }
    with pytest.raises(ValueError, match="overflow envelope"):
        G.hits_trade_graph(t, n_iter=1)


def test_hits_under_envelope_still_runs(spark):
    """The guard must not reject the ordinary case: the sf0.001 trade
    graph is far inside the shipped envelope and HITS completes."""
    out = G.hits_trade_graph(_small_tables(spark), n_iter=1)
    rows = out.limit(5).collect()
    assert rows and all(r.authority >= 0 for r in rows)


# ---------------------------------------------------------------------------
# Assortativity: exact-decimal sufficient statistics (no envelope)
# ---------------------------------------------------------------------------


def test_assortativity_sums_are_decimal_exact(spark, sf_dir):
    """The five sufficient statistics accumulate in exact decimal
    (operands cast to decimal(19,0); Spark widens the quadratic sums
    to decimal(38,0) and the linear ones to decimal(29,0)) — the plan
    must carry the decimal casts of the degree columns, so no int64
    partial sum exists to wrap at lake scale."""
    from parquet_export_spark.plans import inspect as P

    df = G.assortativity_trade_graph(load_tables(spark, sf_dir))
    plan = P.plan_string(df)
    assert "decimal(19,0)" in plan, plan[:2000]
    # and the known sf-value stays correct (oracle parity is pinned
    # every pytest pass by the registry harness; this is the cheap
    # structural half)
    row = df.first()
    assert row.n_edges > 0
    assert -1.0 <= row.assortativity <= 1.0
