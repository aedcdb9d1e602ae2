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


# ---------------------------------------------------------------------------
# ks_drift_stream int64 overflow envelope: loud guard (r7 ADVICE medium)
# ---------------------------------------------------------------------------


def test_ks_drift_envelope_formula():
    from parquet_export_spark.streaming import incremental as I

    mx = I._ks_envelope()
    assert mx * I.KS_PPM_SCALE < 2**63
    assert (mx + 1) * I.KS_PPM_SCALE >= 2**63
    # with the shipped scale the envelope covers ~9.2e12 sample-pairs
    assert mx > 9 * 10**12


def test_ks_drift_over_envelope_raises(spark, tmp_path, monkeypatch):
    """Shrink the ppm scale so the envelope falls below a tiny
    stream x reference product and assert the monitor's batch RAISES
    (surfaced through the streaming query) instead of emitting a
    silently-wrapped ks_ppm."""
    from datetime import datetime, timedelta

    from parquet_export_spark.streaming import incremental as I

    monkeypatch.setattr(I, "KS_PPM_SCALE", 2**61)
    assert I._ks_envelope() == 3  # na*nb = 4*4 = 16 is over

    land = str(tmp_path / "land")
    ref_dir = str(tmp_path / "ref")
    art = str(tmp_path / "art")
    ckpt = str(tmp_path / "ckpt")
    schema = (
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string"
    )
    t0 = datetime(2024, 5, 1)

    def rows(vals, base_id):
        return [
            (base_id + i, t0 + timedelta(minutes=i), 1, "probe", v, "{}")
            for i, v in enumerate(vals)
        ]

    I.write_ks_reference(
        spark.createDataFrame(rows([1.0, 2.0, 3.0, 4.0], 100), schema),
        ref_dir,
    )
    spark.createDataFrame(rows([1.0, 2.0, 3.0, 4.0], 0), schema).coalesce(
        1
    ).write.mode("append").parquet(land)
    stream = spark.readStream.schema(schema).parquet(land)
    q = I.ks_drift_stream(stream, ref_dir, art, ckpt)
    with pytest.raises(Exception, match="overflow envelope"):
        q.awaitTermination()


# ---------------------------------------------------------------------------
# write_text fallback gate: only a missing AbstractFileSystem binding
# licenses the non-atomic path (r7 ADVICE low)
# ---------------------------------------------------------------------------


class _FakeJavaCls:
    def __init__(self, name):
        self._n = name

    def getName(self):
        return self._n


class _FakeJavaExc:
    def __init__(self, name):
        self._c = _FakeJavaCls(name)

    def getClass(self):
        return self._c


def test_missing_binding_licenses_fallback_with_warning():
    import warnings as W

    from parquet_export_spark.export import fs

    exc = Exception("py4j wrapper")
    exc.java_exception = _FakeJavaExc(
        "org.apache.hadoop.fs.UnsupportedFileSystemException"
    )
    with W.catch_warnings(record=True) as rec:
        W.simplefilter("always")
        fs._require_missing_binding(exc, "s3x://bucket/m.json")
    assert any("non-atomic" in str(w.message) for w in rec)


def test_other_jvm_failure_refuses_fallback():
    from parquet_export_spark.export import fs

    exc = Exception("py4j wrapper")
    exc.java_exception = _FakeJavaExc("java.io.IOException")
    with pytest.raises(IOError, match="refusing the non-atomic"):
        fs._require_missing_binding(exc, "s3x://bucket/m.json")


def test_plain_python_failure_refuses_fallback():
    from parquet_export_spark.export import fs

    with pytest.raises(IOError, match="refusing the non-atomic"):
        fs._require_missing_binding(
            RuntimeError("gateway down"), "s3x://bucket/m.json"
        )


# ---------------------------------------------------------------------------
# bench emit: durable slowest-20 line before the total (r6 verdict #6)
# ---------------------------------------------------------------------------


def test_bench_emit_slowest20_then_total(capsys):
    import json
    import sys

    sys.path.insert(0, "/root/repo")
    import bench

    timings = {f"q{i:03d}": (i % 37) / 10.0 for i in range(200)}
    bench._emit(timings, 0.1)
    lines = [
        json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
    ]
    # total is LAST (driver-tail contract), slowest20 immediately before
    assert lines[-1]["metric"] == "headline_queries_total_sec"
    s20 = lines[-2]
    assert s20["metric"] == "slowest20"
    assert len(s20["queries"]) == 20
    assert min(s20["queries"].values()) >= max(
        v for k, v in timings.items() if k not in s20["queries"]
    )
    # the two trailer lines always fit the driver's 2000-byte tail,
    # independent of registry size
    assert len(json.dumps(s20)) + len(json.dumps(lines[-1])) < 1800
    # chunks reassemble to the full map
    chunks = [l for l in lines if l["metric"] == "headline_queries_chunk"]
    merged = {}
    for c in chunks:
        merged.update(c["queries"])
    assert merged == {k: v for k, v in timings.items()}


# ---------------------------------------------------------------------------
# Persisted IVF index artifact (r6 verdict #4): probe-vs-refit parity
# ---------------------------------------------------------------------------


def test_ivf_probe_matches_refit_on_static_data(spark, sf_dir):
    """On static data the stored-index probe must reproduce the refit
    path exactly: the centers fit is deterministic (bounded hash-
    ordered sample + seeded numpy k-means), the assignment and
    routing share the same argmin/tie-break rules, so
    (query_id, neighbor_id, sim, rank) must be identical."""
    from parquet_export_spark.operators import similarity as S

    t = load_tables(spark, sf_dir)
    refit = [
        tuple(r) for r in S.ivf_topk(t).collect()
    ]
    probe = [
        tuple(r) for r in S.ivf_probe_incremental(t).collect()
    ]
    assert probe == refit and len(probe) > 0


def test_pq_probe_matches_refit_on_static_data(spark, sf_dir):
    """Stored-PQ probe == refit path on static data: deterministic
    codebook fit, same stored codes, same ADC ranking and tie-breaks."""
    from parquet_export_spark.operators import similarity as S

    t = load_tables(spark, sf_dir)
    refit = [tuple(r) for r in S.pq_topk(t).collect()]
    probe = [tuple(r) for r in S.pq_probe_incremental(t).collect()]
    assert probe == refit and len(probe) > 0
