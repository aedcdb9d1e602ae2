"""Round-9 additions: loud in-plan overflow guards on the batch drift
operators (r8 verdict "What's wrong" #1) and the shared Apdex ppm
expression (ADVICE item).

The guards are expressed INSIDE the returned plan via ``raise_error``
(not a driver-side pre-count): zero extra jobs, they run distributed,
and — unlike the documentation-only envelopes they replace — a
production session with the pinned ``ansi.enabled=false`` fails loudly
past the envelope instead of wrapping int64 into garbage ppm/cents.
Each predicate is the envelope inequality rearranged into divisions
(``nb > floor(K/na)`` <=> ``na*nb > K`` for positive ints), so the
guard expression itself can never wrap.
"""

from __future__ import annotations

import pathlib

import pytest
from pyspark.sql import functions as F

from parquet_export_spark.operators import stats as ST

PKG = pathlib.Path(__file__).resolve().parents[1] / "parquet_export_spark"


# ---------------------------------------------------------------------------
# Guard predicate algebra: the division rearrangement is exact
# ---------------------------------------------------------------------------


def test_guard_rearrangement_is_exact():
    """For positive ints, nb > (K div r) div na  <=>  na*nb*r > r*floor
    bounds of K — conservative by strictly less than one r-unit, and
    never a false negative (the dangerous direction)."""
    K = 2**63 - 1
    for r in (1, 3, 33_000, 2**50):
        L = K // r
        for na in (1, 2, 97, 3_000_000):
            boundary = L // na
            # at the boundary the product is provably safe ...
            assert na * boundary * r <= K
            # ... and one past it the guard fires while the true
            # product may exceed K (never: guard silent AND product
            # overflows)
            assert na * (boundary + 1) > L


# ---------------------------------------------------------------------------
# ks_distance_pairs: ppm envelope fires past ~3e6 samples/type
# ---------------------------------------------------------------------------


def test_ks_over_envelope_raises(spark):
    """3.1e6 samples in each of two types puts n_a*n_b at 9.61e12 —
    past the 9223372036854 ppm-multiply envelope. The plan must RAISE
    the remediation message, not return wrapped ppm. (Values are all
    equal, so every upstream product stays far inside int64: only the
    guarded ppm tier is at stake.)"""
    events = spark.range(6_200_000).select(
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("event_type"),
        F.lit(1.0).alias("value"),
    )
    with pytest.raises(Exception, match="overflow envelope exceeded"):
        ST.ks_distance_pairs({"events": events}).collect()


# ---------------------------------------------------------------------------
# wasserstein_distance_pairs: range-aware envelope, tested under the
# PRODUCTION ansi=false (the test session pins ansi=true, under which
# the upstream segment multiply would error first and mask the guard)
# ---------------------------------------------------------------------------


def test_w1_over_envelope_raises(spark):
    """100 samples/type across a 2^50-cent support range puts
    n_a*n_b*range at ~1.13e19 > 2^63-1. Under ansi=false (the
    production session default this guard exists for) the segment
    sum wraps SILENTLY — the guard must still raise, because its
    division-form predicate reads only the exact, unwrapped inputs
    (na, nb, cents, gap)."""
    big = float(2**50) / 100.0  # quantizes to ~2^50 cents
    a = spark.range(100).select(
        F.lit("a").alias("event_type"), F.lit(0.0).alias("value")
    )
    b = spark.range(100).select(
        F.lit("b").alias("event_type"),
        F.when(F.col("id") == 0, big).otherwise(0.0).alias("value"),
    )
    events = a.unionByName(b)
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        with pytest.raises(Exception, match="overflow envelope exceeded"):
            ST.wasserstein_distance_pairs({"events": events}).collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_w1_under_envelope_unaffected_by_guard(spark):
    """Same shape inside the envelope: the guard must be transparent
    (the sweep gate proves oracle parity on the lake tables; this
    pins the synthetic boundary shape the adversarial test uses)."""
    a = spark.range(10).select(
        F.lit("a").alias("event_type"), F.lit(0.0).alias("value")
    )
    b = spark.range(10).select(
        F.lit("b").alias("event_type"),
        F.when(F.col("id") == 0, 100.0).otherwise(0.0).alias("value"),
    )
    [row] = ST.wasserstein_distance_pairs(
        {"events": a.unionByName(b)}
    ).collect()
    # one of ten b-samples sits 10_000 cents above the shared mass:
    # W1 = |F_a - F_b| integrated = (1/10) * 10_000 = 1_000 cents
    assert row.n_a == 10 and row.n_b == 10
    assert row.w1_num == 10 * 10_000  # |cum_a*nb - cum_b*na| * gap
    assert row.w1_cents == pytest.approx(1000.0)


# ---------------------------------------------------------------------------
# fano_burstiness: corrected envelope claim is now a loud guard
# ---------------------------------------------------------------------------


def test_fano_over_envelope_raises(spark):
    """A 1.5e6-event single-minute burst inside a ten-year span puts
    n_minutes*S2 at ~1.2e19 > 2^63-1. The old docstring claimed ANSI
    would error here — the session pins ansi=false, so without the
    guard the product would wrap silently into a garbage dispersion."""
    burst = spark.range(1_500_000).select(
        F.lit("x").alias("event_type"),
        F.lit("2020-01-01 00:00:00").cast("timestamp").alias("ts"),
    )
    tail = spark.range(1).select(
        F.lit("x").alias("event_type"),
        F.lit("2030-01-01 00:00:00").cast("timestamp").alias("ts"),
    )
    with pytest.raises(Exception, match="overflow envelope exceeded"):
        ST.fano_burstiness({"events": burst.unionByName(tail)}).collect()


def test_fano_under_envelope_value(spark):
    """Three active minutes over a 5-minute span, counts 2/1/3:
    n=5, S1=6, S2=14 -> fano = (5*14 - 36) / (5*6) = 34/30."""
    rows = [
        ("x", "2020-01-01 00:00:00"),
        ("x", "2020-01-01 00:00:30"),
        ("x", "2020-01-01 00:02:00"),
        ("x", "2020-01-01 00:04:00"),
        ("x", "2020-01-01 00:04:10"),
        ("x", "2020-01-01 00:04:20"),
    ]
    events = spark.createDataFrame(rows, "event_type string, ts string").select(
        "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    [row] = ST.fano_burstiness({"events": events}).collect()
    assert (row.n_minutes, row.n_active_minutes, row.n_events) == (5, 3, 6)
    assert row.fano == pytest.approx(34.0 / 30.0, abs=1e-9)


# ---------------------------------------------------------------------------
# Apdex: ONE definition of the ppm arithmetic (ADVICE item — the
# streaming twin's docstring promised the import; now the source does)
# ---------------------------------------------------------------------------


def test_apdex_ppm_expression_defined_once():
    """The folded-numerator ppm string literal lives ONLY in
    operators/stats.py (as APDEX_PPM_EXPR); the streaming twin
    imports it, so batch/stream score drift is structurally
    impossible."""
    literal = "(2 * n_satisfied + n_tolerating) * 1000000"
    hits = {
        p.relative_to(PKG).as_posix(): p.read_text().count(literal)
        for p in PKG.rglob("*.py")
        if literal in p.read_text()
    }
    assert hits == {"operators/stats.py": 1}, hits
    inc = (PKG / "streaming" / "incremental.py").read_text()
    assert "APDEX_PPM_EXPR" in inc


# ---------------------------------------------------------------------------
# Supplier-projection artifact: fit-once / probe-many (r8 verdict #2)
# ---------------------------------------------------------------------------

_GRAPH_PROBE_OPS = [
    "degree_distribution_suppliers",
    "link_prediction_suppliers",
    "lpa_communities_suppliers",
    "community_modularity_suppliers",
    "kcore_suppliers",
    "triangle_count_suppliers",
]


@pytest.fixture(scope="module")
def stored_strong(spark, tmp_path_factory):
    """The exact-gear projection artifact, written to and read back
    from parquet — the stored table a lake's ingest job maintains."""
    from parquet_export_spark.operators import graph as G
    from parquet_export_spark.sources.lake import load_tables

    t = load_tables(spark, "/root/testdata/sf0.001")
    path = str(tmp_path_factory.mktemp("artifact") / "supplier_strong")
    G.supplier_projection_artifact(t, exact_quantile=True).write.mode(
        "overwrite"
    ).parquet(path)
    return t, path


@pytest.mark.parametrize("op_name", _GRAPH_PROBE_OPS)
def test_graph_probe_matches_rebuild(spark, stored_strong, op_name):
    """probe ≡ rebuild: every projected-graph operator fed the
    PARQUET-STORED artifact returns exactly what the self-deriving
    path returns (the projection is deterministic, so the stored
    frame IS the in-query frame)."""
    from parquet_export_spark.operators import graph as G

    t, path = stored_strong
    op = getattr(G, op_name)
    probe = op(t, strong=spark.read.parquet(path)).collect()
    rebuild = op(t).collect()
    assert probe == rebuild
    assert len(probe) > 0


@pytest.mark.parametrize("op_name", _GRAPH_PROBE_OPS)
def test_graph_probe_never_refits_projection(
    spark, stored_strong, op_name, monkeypatch
):
    """The stored-artifact probe contract (the
    neardup_incremental_check discipline), functionally: with
    ``strong=`` supplied, NO code path may re-derive the projection
    — the builder is replaced with a tripwire that fails the test if
    anything calls it. (Stronger than a plan-string check: the
    iterative ops truncate lineage with localCheckpoint, so their
    final plans cannot show sources at all.)"""
    from parquet_export_spark.operators import graph as G

    t, path = stored_strong

    def _boom(*a, **k):  # pragma: no cover - firing IS the failure
        raise AssertionError(
            f"{op_name} re-derived the projection despite strong="
        )

    monkeypatch.setattr(G, "_supplier_strong_pairs", _boom)
    rows = getattr(G, op_name)(
        t, strong=spark.read.parquet(path)
    ).collect()
    assert len(rows) > 0


@pytest.mark.parametrize(
    "op_name",
    [
        # the join-only ops keep full lineage: their plans must show
        # the stored parquet and no base-table scan (the iterative
        # ops are covered by the tripwire test above instead)
        "degree_distribution_suppliers",
        "link_prediction_suppliers",
        "community_modularity_suppliers",
    ],
)
def test_graph_probe_plan_reads_artifact_not_base_tables(
    spark, stored_strong, op_name
):
    from parquet_export_spark.operators import graph as G
    from parquet_export_spark.plans import inspect as P

    t, path = stored_strong
    df = getattr(G, op_name)(t, strong=spark.read.parquet(path))
    plan = P.plan_string(df)
    assert "supplier_strong" in plan
    assert "orders.parquet" not in plan
    assert "lineitem.parquet" not in plan


def test_registry_graph_singles_share_one_artifact(spark):
    """The registry layer fits the projection ONCE per (session,
    lake, gear) and hands the same checkpointed frame to every
    projected-graph entry — the per-query rebuild the r8 bench
    flagged is structurally gone."""
    from parquet_export_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    a = Q._supplier_projection(spark, sf, exact_quantile=True)
    b = Q._supplier_projection(spark, sf, exact_quantile=True)
    assert a is b
    # gears are distinct artifacts (exact for oracle entries,
    # sketch-threshold for the production gear)
    c = Q._supplier_projection(spark, sf, exact_quantile=False)
    assert c is not a
    # and the registered probe answers match the oracle-verified
    # direct path (lpa exercises the full edge-cache chain)
    from parquet_export_spark.operators import graph as G
    from parquet_export_spark.sources.lake import load_tables

    got = Q.REGISTRY["lpa_communities_suppliers"].fn(spark, sf).collect()
    want = G.lpa_communities_suppliers(load_tables(spark, sf)).collect()
    assert got == want


# ---------------------------------------------------------------------------
# PNG codec: the "PIL-class real format" (r8 verdict #7) as a REAL
# stdlib-zlib decoder — no imaging library, no skip gate
# ---------------------------------------------------------------------------


def _png_mod():
    from parquet_export_spark.operators import multimodal as M

    return M


def test_png_roundtrip_all_channel_counts():
    """encode -> decode is the identity for every supported color
    type: gray (h,w), gray+alpha, RGB, RGBA."""
    import numpy as np

    M = _png_mod()
    rng = np.random.RandomState(0x9A17)
    for shape, color in [((5, 7), 0), ((5, 7, 2), 4), ((5, 7, 3), 2),
                         ((5, 7, 4), 6)]:
        px = rng.randint(0, 256, size=shape, dtype=np.uint8)
        d = M.decode_png(M.encode_png(px))
        assert (d["width"], d["height"], d["color_type"]) == (7, 5, color)
        assert np.array_equal(d["pixels"], px)


def test_png_all_five_filters_decode():
    """A hand-assembled PNG whose five rows use filter types 0..4 must
    reconstruct the reference raster exactly — the forward filters are
    applied here in plain Python straight from the RFC 2083 formulas,
    so the decoder's unfilter path is checked against the spec, not
    against itself."""
    import struct
    import zlib

    import numpy as np

    M = _png_mod()
    rng = np.random.RandomState(7)
    h, w, ch = 5, 4, 3
    px = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
    rows = px.reshape(h, w * ch).astype(int)
    bpp = ch

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    raw = bytearray()
    for y, f in enumerate([0, 1, 2, 3, 4]):
        prior = rows[y - 1] if y else np.zeros(w * ch, int)
        line = bytearray([f])
        for x in range(w * ch):
            cur = int(rows[y][x])
            a = int(rows[y][x - bpp]) if x >= bpp else 0
            b = int(prior[x])
            c = int(prior[x - bpp]) if x >= bpp else 0
            pred = [0, a, b, (a + b) >> 1, paeth(a, b, c)][f]
            line.append((cur - pred) & 0xFF)
        raw += line

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    payload = (
        M._PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    d = M.decode_png(payload)
    assert np.array_equal(d["pixels"], px)


def test_png_rejects_corruption_and_unsupported():
    """Loud failures: flipped payload byte (CRC), 16-bit depth,
    Adam7 interlace, truncation — never silent garbage."""
    import numpy as np

    M = _png_mod()
    px = np.arange(12, dtype=np.uint8).reshape(3, 4)
    good = M.encode_png(px)
    # corrupt one IDAT byte -> CRC mismatch
    bad = bytearray(good)
    bad[-20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch|raster|zlib|Error"):
        M.decode_png(bytes(bad))
    # 16-bit depth / interlace flags inside IHDR -> named rejection
    for offset, val in [(24, 16), (28, 1)]:  # depth byte, interlace byte
        hdr = bytearray(good)
        hdr[offset] = val
        import struct
        import zlib as _z

        data = bytes(hdr[16:29])
        hdr[29:33] = struct.pack(
            ">I", _z.crc32(b"IHDR" + data) & 0xFFFFFFFF
        )
        with pytest.raises(ValueError, match="unsupported PNG"):
            M.decode_png(bytes(hdr))
    with pytest.raises(ValueError, match="truncated|missing"):
        M.decode_png(good[:40])


def test_png_sniff_and_spark_plumbing(spark):
    """End-to-end through the registered decoder: payloads sniff as
    image/png, decoded_features returns true dimensions via
    mapInPandas, and resize_images re-encodes an 8x8 PNG whose decode
    matches the nearest-neighbor kernel."""
    import numpy as np

    M = _png_mod()
    rng = np.random.RandomState(3)
    imgs = {
        int(i): rng.randint(0, 256, size=(6 + i, 9, 3), dtype=np.uint8)
        for i in range(3)
    }
    payloads = spark.createDataFrame(
        [(i, bytearray(M.encode_png(px))) for i, px in imgs.items()],
        "doc_id long, payload binary",
    )
    assert M.sniff_media_type(M.encode_png(imgs[0])) == "image/png"
    feats = {
        r.doc_id: (r.width, r.height)
        for r in M.decoded_features(payloads, "image/png").collect()
    }
    assert feats == {i: (9, 6 + i) for i in imgs}
    resized = {
        r.doc_id: bytes(r.payload)
        for r in M.resize_images(payloads, 8, 8, "image/png").collect()
    }
    for i, px in imgs.items():
        want = M.resize_nearest(px, 8, 8)
        got = M.decode_png(resized[i])["pixels"]
        assert np.array_equal(got, want)


# ---------------------------------------------------------------------------
# Trade-graph edge artifact: the same fit-once/probe-many contract for
# the OTHER shared graph input (orders |><| lineitem distinct pairs)
# ---------------------------------------------------------------------------

_TRADE_PROBE_OPS = [
    "butterfly_pairs_trade",
    "pagerank_orders_graph",
    "cc_trade_graph",
    "cc_doubling_trade_graph",
    "sssp_trade_graph",
    "graph_all_metrics",
    "hits_trade_graph",
    "random_walks_suppliers",
    "assortativity_trade_graph",
]


@pytest.fixture(scope="module")
def stored_trade_edges(spark, tmp_path_factory):
    from parquet_export_spark.operators import graph as G
    from parquet_export_spark.sources.lake import load_tables

    t = load_tables(spark, "/root/testdata/sf0.001")
    path = str(tmp_path_factory.mktemp("artifact") / "trade_edges")
    G.trade_edges_artifact(t).write.mode("overwrite").parquet(path)
    return t, path


@pytest.mark.parametrize("op_name", _TRADE_PROBE_OPS)
def test_trade_probe_matches_rebuild_and_never_rederives(
    spark, stored_trade_edges, op_name, monkeypatch
):
    """probe ≡ rebuild for every trade-graph operator fed the stored
    edge artifact, with the derivation tripwired: after the rebuild
    baseline is captured, _trade_edges is replaced so any probe path
    that re-joins orders/lineitem fails the test (hits decodes the
    node-encoded artifact back to bipartite pairs — covered by the
    same parity assertion)."""
    from parquet_export_spark.operators import graph as G

    t, path = stored_trade_edges
    op = getattr(G, op_name)
    rebuild = op(t).collect()

    def _boom(*a, **k):  # pragma: no cover - firing IS the failure
        raise AssertionError(
            f"{op_name} re-derived trade edges despite edges="
        )

    monkeypatch.setattr(G, "_trade_edges", _boom)
    probe = op(t, edges=spark.read.parquet(path)).collect()
    assert probe == rebuild
    assert len(probe) > 0


def test_trade_probe_plan_reads_artifact_not_base_tables(
    spark, stored_trade_edges
):
    """assortativity is join-only (no checkpoint truncation): its
    probe plan must show the stored artifact and no orders/lineitem
    scan."""
    from parquet_export_spark.operators import graph as G
    from parquet_export_spark.plans import inspect as P

    t, path = stored_trade_edges
    df = G.assortativity_trade_graph(t, edges=spark.read.parquet(path))
    plan = P.plan_string(df)
    assert "trade_edges" in plan
    assert "orders.parquet" not in plan
    assert "lineitem.parquet" not in plan


def test_registry_trade_entries_share_one_edge_artifact(spark):
    from parquet_export_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    a = Q._trade_edges_cached(spark, sf)
    assert Q._trade_edges_cached(spark, sf) is a
    from parquet_export_spark.operators import graph as G
    from parquet_export_spark.sources.lake import load_tables

    got = Q.REGISTRY["assortativity_trade_graph"].fn(spark, sf).collect()
    want = G.assortativity_trade_graph(load_tables(spark, sf)).collect()
    assert got == want


# ---------------------------------------------------------------------------
# Round-9 new operators: tv_distance_pairs / markov_stationary_types /
# zipf_slope_unigrams — independent Python differentials (the oracle
# harness proves DuckDB parity; these prove BOTH engines implement the
# intended math)
# ---------------------------------------------------------------------------


def _lake_tables(spark):
    from parquet_export_spark.sources.lake import load_tables

    return load_tables(spark, "/root/testdata/sf0.001")


def test_tv_distance_matches_bruteforce(spark):
    from collections import Counter, defaultdict

    t = _lake_tables(spark)
    rows = t["events"].select("event_type", "value").collect()
    by_type = defaultdict(Counter)
    for r in rows:
        import math

        by_type[r.event_type][math.floor(r.value * 100 + 0.5)] += 1
    got = {
        (r.type_a, r.type_b): (r.n_a, r.n_b, r.tv_num, r.tv_ppm)
        for r in ST.tv_distance_pairs(t).collect()
    }
    types = sorted(by_type)
    assert len(got) == len(types) * (len(types) - 1) // 2
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            ca, cb = by_type[a], by_type[b]
            na, nb = sum(ca.values()), sum(cb.values())
            num = sum(
                abs(ca.get(x, 0) * nb - cb.get(x, 0) * na)
                for x in set(ca) | set(cb)
            )
            assert got[(a, b)] == (na, nb, num, num * 10**6 // (2 * na * nb))
            # TV is a metric bounded by [0, 1]: ppm inside the range
            assert 0 <= got[(a, b)][3] <= 10**6


def test_tv_over_envelope_raises(spark):
    """2.2e6 samples/type puts n_a*n_b past the 4611686018427
    half-ppm envelope — the plan must raise, not wrap."""
    events = spark.range(4_400_000).select(
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("event_type"),
        F.lit(1.0).alias("value"),
    )
    with pytest.raises(Exception, match="overflow envelope exceeded"):
        ST.tv_distance_pairs({"events": events}).collect()


def test_tv_plan_has_no_window(spark):
    """TV needs no cumulative state — unlike its KS/W1 siblings the
    plan must carry NO Window operator at all; every scan prunes to
    (event_type, value) and nothing funnels to one partition (the
    family's shared pins; the repeated pre-AQE scan blocks collapse
    to a ReusedExchange at runtime, as with KS/W1)."""
    from parquet_export_spark.plans import inspect as P

    t = _lake_tables(spark)
    df = ST.tv_distance_pairs(t)
    plan = P.plan_string(df)
    assert "Window" not in plan
    assert "Exchange SinglePartition" not in plan
    assert all(s <= {"event_type", "value"} for s in P.read_schemas(df))


def test_markov_stationary_matches_sequential_python(spark):
    from collections import Counter, defaultdict

    from parquet_export_spark.operators import advanced as A

    t = _lake_tables(spark)
    rows = t["events"].select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    seqs = defaultdict(list)
    for r in rows:
        seqs[r.user_id].append((r.ts, r.event_id, r.event_type))
    trans = Counter()
    for evs in seqs.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            trans[(a, b)] += 1
    rowtot = Counter()
    for (a, _), c in trans.items():
        rowtot[a] += c
    states = sorted({r.event_type for r in rows})
    SCALE, ITERS = A.MARKOV_SCALE, A.MARKOV_ITERS
    r = {s: SCALE // len(states) for s in states}
    for _ in range(ITERS):
        nxt = defaultdict(int)
        for (a, b), c in trans.items():
            if a in r:
                nxt[b] += r[a] * c // rowtot[a]
        r = dict(nxt)
    got = {
        row.event_type: (row.out_transitions, row.stationary_ppm)
        for row in A.markov_stationary_types(t).collect()
    }
    want = {
        s: (rowtot.get(s, 0), r.get(s, 0) // 10**6) for s in states
    }
    assert got == want
    # the chain is irreducible on this lake: mass survives the floor
    # leaks (sums close to 1e6) and every state has outgoing edges
    assert sum(p for _, p in got.values()) > 900_000
    assert all(o > 0 for o, _ in got.values())


def test_markov_over_envelope_raises(spark):
    """A single (i, j) cell past (2^63-1) div SCALE transitions must
    raise through the guard embedded in the transition frame."""
    from parquet_export_spark.operators import advanced as A

    t = _lake_tables(spark)
    with pytest.raises(Exception, match="overflow envelope exceeded"):
        # shrink the envelope via a huge scale instead of building
        # 9.2e6 rows: guard_max = (2^63-1) div scale falls below any
        # real cell count
        A.markov_stationary_types(t, n_iter=1, scale=2**62).collect()


def test_zipf_slope_matches_python(spark):
    from collections import Counter

    t = _lake_tables(spark)
    words = Counter()
    for r in t["documents"].select("text").collect():
        words.update(r.text.split(" "))
    ranked = sorted(words.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [(i + 1).bit_length() - 1 for i in range(len(ranked))]
    ys = [c.bit_length() - 1 for _, c in ranked]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    den = n * sxx - sx * sx
    [row] = ST_zipf(t).collect()
    assert row.n_terms == n
    assert row.slope == pytest.approx(
        round((n * sxy - sx * sy) / den, 9), abs=1e-12
    )
    assert row.intercept == pytest.approx(
        round((sy * sxx - sx * sxy) / den, 9), abs=1e-12
    )
    # natural-ish text: the rank/frequency line must slope DOWN
    assert row.slope < 0


def ST_zipf(t):
    from parquet_export_spark.operators import text as X

    return X.zipf_slope_unigrams(t)


def test_cc_incremental_label_artifact_probe(spark, monkeypatch):
    """cc_incremental_trade fed the stored lake-label artifact must
    equal the self-deriving path BIT-FOR-BIT, with the lake edge
    build tripwired: the lake path is the only _edge_cache consumer
    in this operator (the contracted merge runs doubling-CC over the
    slim label graph WITHOUT an edge cache), so with lake_labels=
    supplied the probe must never build one — its plan is batch
    carve + contracted merge only, the nightly cost the incremental
    algebra promises."""
    from parquet_export_spark.operators import graph as G

    t = _lake_tables(spark)
    rebuild = G.cc_incremental_trade(t).collect()
    lab = G.cc_lake_labels_artifact(t).localCheckpoint()

    def _boom(*a, **k):  # pragma: no cover - firing IS the failure
        raise AssertionError("probe re-derived the lake edge set")

    monkeypatch.setattr(G, "_edge_cache", _boom)
    probe = G.cc_incremental_trade(t, lake_labels=lab).collect()
    assert probe == rebuild and len(probe) > 0


def test_lorenz_curve_matches_bruteforce(spark):
    """Independent Python differential: per segment, sort customers by
    revenue cents ascending and take exact prefix sums at
    floor(i*n/10) — the support-collapsed closed-form cut must equal
    the naive per-customer prefix. Plus the curve invariants: shares
    non-decreasing in the decile, convex (below the diagonal), decile
    10 = 100% of revenue."""
    import math
    from collections import defaultdict

    t = _lake_tables(spark)
    orders = t["orders"].select("o_custkey", "o_totalprice").collect()
    segs = {
        r.c_custkey: r.c_mktsegment
        for r in t["customer"].select("c_custkey", "c_mktsegment").collect()
    }
    rev = defaultdict(int)
    for r in orders:
        rev[r.o_custkey] += math.floor(float(r.o_totalprice) * 100 + 0.5)
    by_seg = defaultdict(list)
    for ck, cents in rev.items():
        by_seg[segs[ck]].append(cents)
    want = {}
    for seg, vals in by_seg.items():
        vals.sort()
        n, total = len(vals), sum(vals)
        prefix = 0
        cums = []
        for v in vals:
            prefix += v
            cums.append(prefix)
        for i in range(1, 11):
            k = i * n // 10
            if k >= 1:
                want[(seg, i)] = (k, cums[k - 1], cums[k - 1] * 10**6 // total)
    got = {
        (r.segment, r.decile): (r.n_cum_customers, r.cum_cents, r.cum_share_ppm)
        for r in ST.lorenz_curve_deciles(t).collect()
    }
    assert got == want
    for seg in by_seg:
        shares = [got[(seg, i)][2] for i in range(1, 11) if (seg, i) in got]
        assert shares == sorted(shares)  # non-decreasing
        assert got[(seg, 10)][2] == 10**6  # full mass at decile 10
        # below the diagonal: bottom 50% holds < 50% of revenue
        if (seg, 5) in got:
            assert got[(seg, 5)][2] < 500_000


def test_session_duration_histogram_matches_bruteforce(spark):
    """Independent Python differential: replay gap sessionization
    sequentially per user, bin exact second durations by bit length,
    and compare counts; conservation — sessions and events both sum
    to the sessionize_batch totals."""
    from collections import defaultdict

    from parquet_export_spark.operators import advanced as A

    t = _lake_tables(spark)
    rows = t["events"].select(
        "user_id", "ts", "event_id"
    ).collect()
    seqs = defaultdict(list)
    for r in rows:
        seqs[r.user_id].append((r.ts, r.event_id))
    gap_us = 30 * 60 * 1_000_000
    want = defaultdict(lambda: [0, 0])
    n_sessions = 0
    for evs in seqs.values():
        evs.sort()
        sessions = []
        for ts, _ in evs:
            if sessions and (
                (ts - sessions[-1][-1]).total_seconds() * 1e6 <= gap_us
            ):
                sessions[-1].append(ts)
            else:
                sessions.append([ts])
        for sess in sessions:
            n_sessions += 1
            dur_sec = int(
                (sess[-1] - sess[0]).total_seconds() * 1e6
            ) // 1_000_000
            b = (dur_sec + 1).bit_length() - 1
            want[b][0] += 1
            want[b][1] += len(sess)
    got = {
        r.duration_bin: (r.n_sessions, r.n_events, r.lo_sec)
        for r in A.session_duration_histogram(t).collect()
    }
    assert {b: (v[0], v[1]) for b, v in want.items()} == {
        b: (n, e) for b, (n, e, _) in got.items()
    }
    assert sum(n for n, _, _ in got.values()) == n_sessions
    assert sum(e for _, e, _ in got.values()) == len(rows)
    for b, (_, _, lo) in got.items():
        assert lo == (1 << b) - 1


def _dup_diag_want(rows):
    """Brute-force replay of both per-source diagnostics."""
    import hashlib
    import re
    from collections import Counter, defaultdict

    def canon(text):
        s = re.sub(r"[^a-z0-9 ]", " ", text.lower())
        return re.sub(r" +", " ", s).strip()

    h_of = {
        r[0]: hashlib.md5(canon(r[2]).encode()).hexdigest() for r in rows
    }
    fam = Counter(h_of.values())
    per_src = defaultdict(lambda: [0, set(), 0])
    src_hash = Counter()
    for doc_id, source, _ in rows:
        h = h_of[doc_id]
        e = per_src[source]
        e[0] += 1
        e[1].add(h)
        if fam[h] > 1:
            e[2] += 1
        src_hash[(source, h)] += 1
    want_rate = {
        s: (n, len(hs), d, d * 10**6 // n)
        for s, (n, hs, d) in per_src.items()
    }
    by_hash = defaultdict(list)
    for (s, h), c in src_hash.items():
        by_hash[h].append((s, c))
    want_ov = defaultdict(lambda: [0, 0, 0])
    for members in by_hash.values():
        members.sort()
        for i, (sa, ca) in enumerate(members):
            for sb, cb in members[i + 1 :]:
                e = want_ov[(sa, sb)]
                e[0] += 1
                e[1] += ca
                e[2] += cb
    return want_rate, {k: tuple(v) for k, v in want_ov.items()}


def test_source_dup_diagnostics_engineered_fixture(spark):
    """The synthetic lake has NO canonical duplicates below sf0.1 (and
    only 8, all cross-source, there) — so the differential drives an
    ENGINEERED corpus exercising every path: byte-exact cross-source
    copies, case/punctuation variants that only canonicalization
    collapses, a within-source dup, and unique docs."""
    from parquet_export_spark.operators import dedup as D

    rows = [
        (1, "feedA", "The quick brown fox."),
        (2, "feedB", "the QUICK  brown fox!!"),  # canon-dup of 1
        (3, "feedC", "The quick brown fox."),    # byte-dup of 1
        (4, "feedA", "totally unique alpha document"),
        (5, "feedA", "repeated inside feed a"),
        (6, "feedA", "repeated INSIDE feed a"),   # within-source canon-dup
        (7, "feedB", "only in feed b"),
        (8, "feedC", "only in feed c"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    want_rate, want_ov = _dup_diag_want(rows)
    t = {"documents": docs}
    got_rate = {
        r.source: (r.n_docs, r.n_canonical, r.n_dup_docs, r.dup_ppm)
        for r in D.dup_rate_by_source(t).collect()
    }
    assert got_rate == want_rate
    # feedA: 4 docs, 3 canonical; dups = doc 1 (cross-source fox
    # family) + the 5/6 within-feed pair -> 3 of 4 = 750000 ppm
    assert got_rate["feedA"] == (4, 3, 3, 750_000)
    got_ov = {
        (r.source_a, r.source_b): (
            r.shared_hashes,
            r.docs_a_shared,
            r.docs_b_shared,
        )
        for r in D.cross_source_overlap(t).collect()
    }
    assert got_ov == want_ov
    # the fox family spans all three feeds -> all three pairs present
    assert set(got_ov) == {
        ("feedA", "feedB"), ("feedA", "feedC"), ("feedB", "feedC"),
    }


def test_source_dup_diagnostics_match_bruteforce(spark):
    """Lake-level parity of both diagnostics against the brute-force
    replay (the corpus happens to be duplicate-free at this SF — the
    engineered-fixture test above carries the duplicate paths; the
    sf0.1 sweep leg carries the real cross-source families)."""
    from parquet_export_spark.operators import dedup as D

    t = _lake_tables(spark)
    rows = [
        (r.doc_id, r.source, r.text)
        for r in t["documents"].select("doc_id", "source", "text").collect()
    ]
    want_rate, want_ov = _dup_diag_want(rows)
    got_rate = {
        r.source: (r.n_docs, r.n_canonical, r.n_dup_docs, r.dup_ppm)
        for r in D.dup_rate_by_source(t).collect()
    }
    assert got_rate == want_rate
    assert len(got_rate) > 1  # the per-source grain is real
    got_ov = {
        (r.source_a, r.source_b): (
            r.shared_hashes,
            r.docs_a_shared,
            r.docs_b_shared,
        )
        for r in D.cross_source_overlap(t).collect()
    }
    assert got_ov == want_ov


# ---------------------------------------------------------------------------
# dau_mau_stickiness / new_returning_weekly: engineered calendars where
# the expected split is hand-checkable, plus lake-level brute force
# ---------------------------------------------------------------------------


def _mk_events(spark, rows):
    """rows: (event_id, 'YYYY-MM-DD HH:MM:SS', user_id)."""
    return spark.createDataFrame(
        [(i, ts, u, "click", 1.0, "{}") for i, ts, u in rows],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_dau_mau_engineered_months(spark):
    """Jan-2024: user 1 active 3 of 3 observed days, user 2 active 1 —
    MAU 2, active-user-days 4, stickiness 4/(3*2) = 666666 ppm.
    Feb-2024: one user one day — the degenerate perfect-stickiness
    month. A second event on an already-counted (user, day) must NOT
    move anything (the distinct-collapse grain)."""
    from parquet_export_spark.operators import advanced as A

    ev = _mk_events(
        spark,
        [
            (1, "2024-01-01 10:00:00", 1),
            (2, "2024-01-02 11:00:00", 1),
            (3, "2024-01-15 12:00:00", 1),
            (4, "2024-01-15 13:00:00", 2),
            (5, "2024-01-15 13:30:00", 2),  # same (user, day): no-op
            (6, "2024-02-03 09:00:00", 7),
        ],
    )
    got = {
        r.month_idx: (
            r.mau,
            r.n_active_days,
            r.active_user_days,
            r.stickiness_ppm,
        )
        for r in A.dau_mau_stickiness({"events": ev}).collect()
    }
    jan = (2024 - 1970) * 12 + 0
    feb = jan + 1
    assert got == {
        jan: (2, 3, 4, 666_666),
        feb: (1, 1, 1, 1_000_000),
    }


def test_new_returning_engineered_weeks(spark):
    """User 1 appears in weeks w and w+2 (new then returning); user 2
    only in w+2 (new there). Week w: 1 active / 1 new; week w+2:
    2 active, 1 new, 1 returning -> 500000 ppm."""
    from parquet_export_spark.operators import advanced as A

    # 2024-01-01 is a Monday; days-since-epoch 19723 -> week 2817
    ev = _mk_events(
        spark,
        [
            (1, "2024-01-01 10:00:00", 1),
            (2, "2024-01-02 10:00:00", 1),  # same week, same user: no-op
            (3, "2024-01-15 10:00:00", 1),
            (4, "2024-01-16 10:00:00", 2),
        ],
    )
    rows = A.new_returning_weekly({"events": ev}).collect()
    got = {
        r.week: (r.n_active, r.n_new, r.n_returning, r.new_ppm)
        for r in rows
    }
    weeks = sorted(got)
    assert len(weeks) == 2 and weeks[1] == weeks[0] + 2
    assert got[weeks[0]] == (1, 1, 0, 1_000_000)
    assert got[weeks[1]] == (2, 1, 1, 500_000)


def test_engagement_ops_match_bruteforce(spark):
    """Lake-level parity of both engagement splits against a pure-
    Python replay of the calendar/grain algebra."""
    from collections import defaultdict

    from parquet_export_spark.operators import advanced as A

    t = _lake_tables(spark)
    rows = t["events"].select("ts", "user_id").collect()
    epoch = __import__("datetime").date(1970, 1, 1)
    grain = {
        (
            (r.ts.year - 1970) * 12 + r.ts.month - 1,
            (r.ts.date() - epoch).days,
            r.user_id,
        )
        for r in rows
    }
    months = defaultdict(lambda: [set(), set(), 0])
    for m, d, u in grain:
        months[m][0].add(u)
        months[m][1].add(d)
        months[m][2] += 1
    want = {
        m: (
            len(us),
            len(ds),
            aud,
            aud * 10**6 // (len(ds) * len(us)),
        )
        for m, (us, ds, aud) in months.items()
    }
    got = {
        r.month_idx: (
            r.mau,
            r.n_active_days,
            r.active_user_days,
            r.stickiness_ppm,
        )
        for r in A.dau_mau_stickiness(t).collect()
    }
    assert got == want

    uw = {((r.ts.date() - epoch).days // 7, r.user_id) for r in rows}
    first = {}
    for w, u in sorted(uw):
        first.setdefault(u, w)
    weeks = defaultdict(lambda: [0, 0])
    for w, u in uw:
        weeks[w][0] += 1
        if first[u] == w:
            weeks[w][1] += 1
    want_w = {
        w: (a, n, a - n, n * 10**6 // a) for w, (a, n) in weeks.items()
    }
    got_w = {
        r.week: (r.n_active, r.n_new, r.n_returning, r.new_ppm)
        for r in A.new_returning_weekly(t).collect()
    }
    assert got_w == want_w


# ---------------------------------------------------------------------------
# cramers_v_type_decile: brute-force dense-grid chi2 replay + the
# degenerate-table NULL contract
# ---------------------------------------------------------------------------


def test_cramers_v_matches_dense_grid_bruteforce(spark):
    """Independent Python replay: same global decile boundaries, then
    the TEXTBOOK dense-grid chi2 (every (type, decile) cell, absent
    ones as observed=0) — the operator's present-cells-plus-exact-
    correction decomposition must equal it to float tolerance, and V
    must match sqrt(chi2/(n*min(r-1,c-1)))."""
    import math
    from collections import Counter

    t = _lake_tables(spark)
    rows = t["events"].select("event_type", "value").collect()
    cents = [math.floor(r.value * 100 + 0.5) for r in rows]
    n = len(cents)
    hist = Counter(cents)
    support = sorted(hist)
    bounds = []
    for i in range(1, 10):
        cum, target = 0, -(-i * n // 10)  # ceil(i*n/10)
        for c in support:
            cum += hist[c]
            if cum >= target:
                bounds.append(c)
                break
    decile = lambda c: 1 + sum(1 for b in bounds if c > b)
    obs = Counter(
        (r.event_type, decile(math.floor(r.value * 100 + 0.5)))
        for r in rows
    )
    types = sorted({ty for ty, _ in obs})
    decs = sorted({d for _, d in obs})
    rt = Counter()
    ct = Counter()
    for (ty, d), o in obs.items():
        rt[ty] += o
        ct[d] += o
    chi2 = 0.0
    for ty in types:
        for d in decs:
            e = rt[ty] * ct[d] / n
            o = obs.get((ty, d), 0)
            chi2 += (o - e) * (o - e) / e
    v = math.sqrt(chi2 / (n * min(len(types) - 1, len(decs) - 1)))

    [row] = ST.cramers_v_type_decile(t).collect()
    assert row.n == n
    assert row.n_types == len(types)
    assert row.n_deciles == len(decs)
    assert row.n_cells == len(obs)
    assert row.dof == (len(types) - 1) * (len(decs) - 1)
    assert abs(row.chi2 - chi2) < 1e-6 * max(1.0, chi2)
    assert abs(row.cramers_v - v) < 1e-9
    assert 0.0 <= row.cramers_v <= 1.0


def test_cramers_v_degenerate_table_is_null(spark):
    """One event type -> min(r-1, c-1) = 0: V must be NULL (the
    NULLIF guard), never a division error or an inf/NaN."""
    ev = _mk_events(
        spark,
        [(i, f"2024-01-{1 + i % 9:02d} 10:00:00", i % 3) for i in range(30)],
    ).withColumn("value", (F.col("event_id") % 7).cast("double"))
    [row] = ST.cramers_v_type_decile({"events": ev}).collect()
    assert row.n_types == 1
    assert row.cramers_v is None
    # chi2 of a single-row table is exactly 0 (every cell IS its
    # expectation: E = 1*ct/n * n-row margin)
    assert row.chi2 == 0.0


# ---------------------------------------------------------------------------
# kaplan_meier_interorder: hand-checkable censored fixture + lake-level
# textbook-KM replay
# ---------------------------------------------------------------------------


def _mk_orders(spark, rows):
    """rows: (orderkey, custkey, 'YYYY-MM-DD')."""
    return spark.createDataFrame(
        [(k, c, "O", 100.0, d, "1-URGENT") for k, c, d in rows],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string,"
        " o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("date"))


def test_kaplan_meier_engineered_censoring(spark):
    """Three customers, global max day = Jan 21:
      c1: orders on 1, 6, 21  -> events dur 5, 15; censored 0
      c2: orders on 1, 11     -> event dur 10;     censored 10
      c3: orders on 1         -> censored 20 only (never reorders)
    Death times 5/10/15; censored-at-10 subject IS at risk at 10
    (standard KM convention: censoring after deaths at the tie), the
    c3 censored-20 subject leaves the risk set before 15's... no —
    20 > 15, so it is still at risk at 15. Hand curve:
      t=5:  at risk 6 (durs 5,15,10,10,20,0 -> >=5: 5,15,10,10,20)=5, d=1 -> S=4/5
      t=10: at risk {15,10,10,20}=4, d=1 -> S=4/5*3/4=3/5
      t=15: at risk {15,20}=2, d=1 -> S=3/5*1/2=3/10
    """
    from parquet_export_spark.operators import advanced as A

    orders = _mk_orders(
        spark,
        [
            (1, 1, "2024-01-01"),
            (2, 1, "2024-01-06"),
            (3, 1, "2024-01-21"),
            (4, 2, "2024-01-01"),
            (5, 2, "2024-01-11"),
            (6, 3, "2024-01-01"),
        ],
    )
    rows = A.kaplan_meier_interorder({"orders": orders}).collect()
    got = {
        r.dur_days: (r.n_at_risk, r.d_events, r.censored_here, r.survival)
        for r in rows
    }
    assert got == {
        5: (5, 1, 0, 0.8),
        10: (4, 1, 1, 0.6),
        15: (2, 1, 0, 0.3),
    }


def test_kaplan_meier_matches_textbook_bruteforce(spark):
    """Lake-level parity against an independent pure-Python KM
    (duration list built the same way, then the classic product-limit
    recurrence over death times)."""
    from collections import Counter, defaultdict

    from parquet_export_spark.operators import advanced as A

    t = _lake_tables(spark)
    o = [
        (r.o_custkey, r.o_orderdate)
        for r in t["orders"].select("o_custkey", "o_orderdate").collect()
    ]
    by_cust = defaultdict(set)
    for c, d in o:
        by_cust[c].add(d)
    maxd = max(d for _, d in o)
    durs = []  # (duration_days, observed)
    for c, ds in by_cust.items():
        ds = sorted(ds)
        for a, b in zip(ds, ds[1:]):
            durs.append(((b - a).days, 1))
        durs.append(((maxd - ds[-1]).days, 0))
    deaths = Counter(d for d, obs in durs if obs == 1)
    cens = Counter(d for d, obs in durs if obs == 0)
    s = 1.0
    want = {}
    for td in sorted(deaths):
        n = sum(c for d, c in deaths.items() if d >= td) + sum(
            c for d, c in cens.items() if d >= td
        )
        s = s * (1.0 - deaths[td] / n)
        want[td] = (n, deaths[td], cens.get(td, 0))
    rows = A.kaplan_meier_interorder(t).collect()
    got = {
        r.dur_days: (r.n_at_risk, r.d_events, r.censored_here)
        for r in rows
    }
    assert got == want
    # survival is a non-increasing step function in (0, 1]
    surv = [r.survival for r in sorted(rows, key=lambda r: r.dur_days)]
    assert all(a >= b for a, b in zip(surv, surv[1:]))
    assert all(0.0 <= x <= 1.0 for x in surv)
    # spot-check the product-limit values to float tolerance (the
    # operator folds in a fixed order; math.prod order here differs,
    # hence tolerance, not equality)
    s = 1.0
    for td in sorted(deaths):
        n, d, _ = want[td]
        s *= 1.0 - d / n
        assert abs(got_surv := next(
            r.survival for r in rows if r.dur_days == td
        ) - s) < 1e-9, (td, got_surv, s)


# ---------------------------------------------------------------------------
# atkinson_index_by_segment: integer replay + ordering sanity
# ---------------------------------------------------------------------------


def test_atkinson_matches_integer_bruteforce(spark):
    from collections import defaultdict
    from decimal import Decimal

    t = _lake_tables(spark)
    rev = defaultdict(int)
    for r in t["orders"].select("o_custkey", "o_totalprice").collect():
        rev[r.o_custkey] += int(
            (Decimal(str(r.o_totalprice)) * 100).to_integral_value()
        )
    seg = {
        r.c_custkey: r.c_mktsegment
        for r in t["customer"].select("c_custkey", "c_mktsegment").collect()
    }
    by_seg = defaultdict(list)
    for c, cents in rev.items():
        by_seg[seg[c]].append(cents)
    S = 10**15
    want = {}
    for sname, xs in by_seg.items():
        n = len(xs)
        sx = sum(xs)
        sr = sum(S // x for x in xs)
        a = round(1.0 - float(n) * float(n) * 1.0e15 / (float(sx) * float(sr)), 9)
        want[sname] = (n, sx, sr, a)
    got = {
        r.c_mktsegment: (
            r.n_customers,
            r.revenue_cents,
            r.sum_recip_femto,
            r.atkinson2,
        )
        for r in ST.atkinson_index_by_segment(t).collect()
    }
    assert got == want
    assert all(0.0 <= v[3] < 1.0 for v in got.values())


def test_atkinson_orders_equal_vs_skewed(spark):
    """Equal incomes -> A ~ 0 (exactly 0 up to reciprocal
    quantization); a segment with one near-zero earner scores far
    higher — the bottom-sensitivity the docstring claims."""
    equal = _mk_orders(
        spark, [(i, i, "2024-01-01") for i in range(1, 11)]
    )
    cust = spark.createDataFrame(
        [(i, f"c{i}", 0, 0.0, "SEG") for i in range(1, 11)],
        "c_custkey long, c_name string, c_nationkey long,"
        " c_acctbal double, c_mktsegment string",
    )
    [r_eq] = ST.atkinson_index_by_segment(
        {"orders": equal, "customer": cust}
    ).collect()
    assert abs(r_eq.atkinson2) < 1e-9

    skewed = _mk_orders(
        spark, [(i, i, "2024-01-01") for i in range(1, 10)]
    ).union(
        _mk_orders(spark, [(100, 10, "2024-01-01")]).withColumn(
            "o_totalprice", F.lit(0.01)
        )
    )
    [r_sk] = ST.atkinson_index_by_segment(
        {"orders": skewed, "customer": cust}
    ).collect()
    assert r_sk.atkinson2 > 0.8  # one 1-cent earner dominates 1/H


# ---------------------------------------------------------------------------
# spearman_corr_by_flag: textbook average-rank Pearson replay, exact
# endpoints, and the through-int64 presentation guard
# ---------------------------------------------------------------------------


def _avg_ranks(vals):
    order = sorted(range(len(vals)), key=lambda i: vals[i])
    ranks = [0.0] * len(vals)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
            j += 1
        r = (i + j) / 2 + 1
        for k in range(i, j + 1):
            ranks[order[k]] = r
        i = j + 1
    return ranks


def test_spearman_matches_avg_rank_pearson(spark):
    """Lake-level parity: the tie-corrected closed form must equal
    Pearson computed directly on textbook average ranks (the
    scipy.stats.spearmanr definition), per flag."""
    import math
    from collections import defaultdict

    t = _lake_tables(spark)
    by_flag = defaultdict(lambda: ([], []))
    for r in (
        t["lineitem"]
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .collect()
    ):
        xs, ys = by_flag[r.l_returnflag]
        xs.append(math.floor(r.l_quantity * 100 + 0.5))
        ys.append(math.floor(r.l_extendedprice * 100 + 0.5))
    rows = {r.l_returnflag: r for r in ST.spearman_corr_by_flag(t).collect()}
    assert set(rows) == set(by_flag)
    for flag, (xs, ys) in by_flag.items():
        rx, ry = _avg_ranks(xs), _avg_ranks(ys)
        n = len(xs)
        mx, my = sum(rx) / n, sum(ry) / n
        num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
        den = math.sqrt(
            sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
        )
        want = num / den
        got = rows[flag]
        assert got.n_rows == n
        assert abs(got.spearman_rho - want) < 1e-9, (flag, got, want)
        # the exact integer piece agrees with its definition
        # (doubled average ranks keep every d integral)
        d2 = sum(round(2 * (a - b)) ** 2 for a, b in zip(rx, ry))
        assert got.d2_sum == d2


def test_spearman_exact_endpoints(spark):
    """Distinct monotone pairs -> rho exactly 1.0; reversed -> exactly
    -1.0; identical tie structure on both sides keeps rho at 1.0."""
    def li(rows):
        return spark.createDataFrame(
            [("A", q, p) for q, p in rows],
            "l_returnflag string, l_quantity double,"
            " l_extendedprice double",
        )

    up = [(float(i), float(i * i)) for i in range(1, 40)]
    [r] = ST.spearman_corr_by_flag({"lineitem": li(up)}).collect()
    assert r.spearman_rho == 1.0 and r.d2_sum == 0

    down = [(float(i), float(1000 - i)) for i in range(1, 40)]
    [r] = ST.spearman_corr_by_flag({"lineitem": li(down)}).collect()
    assert r.spearman_rho == -1.0

    tied = [(float(i // 3), float((i // 3) * 2)) for i in range(30)]
    [r] = ST.spearman_corr_by_flag({"lineitem": li(tied)}).collect()
    assert r.spearman_rho == 1.0 and r.tie_term_x == r.tie_term_y > 0

    const = [(1.0, float(i)) for i in range(10)]
    [r] = ST.spearman_corr_by_flag({"lineitem": li(const)}).collect()
    assert r.spearman_rho is None  # AX = 0: undefined, not an error


def test_spearman_over_envelope_raises(spark):
    """1.7e6 all-distinct rows in one flag puts ax + ay ~ 2n^3 ~
    9.8e18 past int64: the presentation guard must RAISE the
    remediation (the exact decimal sums upstream are fine — only the
    through-int64 cast lane is at stake)."""
    n = 1_700_000
    li = spark.range(n).select(
        F.lit("A").alias("l_returnflag"),
        (F.col("id") + 1).cast("double").alias("l_quantity"),
        (F.col("id") + 1).cast("double").alias("l_extendedprice"),
    )
    with pytest.raises(Exception, match="presentation envelope exceeded"):
        ST.spearman_corr_by_flag({"lineitem": li}).collect()


# ---------------------------------------------------------------------------
# churn_retention_monthly / session_concurrency_hourly
# ---------------------------------------------------------------------------


def test_churn_retention_engineered_ledger(spark):
    """Users: A active m0,m1,m2 (retained twice); B active m0 only
    (churns into m1); C active m0,m2 (churns into m1, resurrects m2);
    D first appears m2 (new). Hand ledger:
      m0: active 3, new 3
      m1: active 1 (A), retained 1, churned_prev 2, retention 333333
      m2: active 3 (A,C,D), new 1 (D), retained 1 (A), resurrected 1
          (C), churned_prev 0, retention 1000000
    """
    from parquet_export_spark.operators import advanced as A

    ev = _mk_events(
        spark,
        [
            (1, "2024-01-05 10:00:00", 1),   # A m0
            (2, "2024-02-05 10:00:00", 1),   # A m1
            (3, "2024-03-05 10:00:00", 1),   # A m2
            (4, "2024-01-06 10:00:00", 2),   # B m0
            (5, "2024-01-07 10:00:00", 3),   # C m0
            (6, "2024-03-07 10:00:00", 3),   # C m2
            (7, "2024-03-08 10:00:00", 4),   # D m2
        ],
    )
    rows = A.churn_retention_monthly({"events": ev}).collect()
    m0 = (2024 - 1970) * 12
    got = {
        r.month_idx: (
            r.n_active,
            r.n_new,
            r.n_retained,
            r.n_resurrected,
            r.n_churned_prev,
            r.retention_ppm,
            r.churn_ppm,
        )
        for r in rows
    }
    assert got == {
        m0: (3, 3, 0, 0, None, None, None),
        m0 + 1: (1, 0, 1, 0, 2, 333_333, 666_666),
        m0 + 2: (3, 1, 1, 1, 0, 1_000_000, 0),
    }
    # the decomposition identity holds on every row
    for r in rows:
        assert r.n_active == r.n_new + r.n_retained + r.n_resurrected


def test_churn_retention_matches_bruteforce(spark):
    from collections import defaultdict

    from parquet_export_spark.operators import advanced as A

    t = _lake_tables(spark)
    um = {
        ((r.ts.year - 1970) * 12 + r.ts.month - 1, r.user_id)
        for r in t["events"].select("ts", "user_id").collect()
    }
    first = {}
    for m, u in sorted(um):
        first.setdefault(u, m)
    actives = defaultdict(set)
    for m, u in um:
        actives[m].add(u)
    want = {}
    for m in sorted(actives):
        cur, prev = actives[m], actives.get(m - 1)
        new = sum(1 for u in cur if first[u] == m)
        ret = len(cur & prev) if prev else 0
        res = sum(
            1
            for u in cur
            if first[u] < m and (not prev or u not in prev)
        )
        if prev:
            want[m] = (
                len(cur), new, ret, res, len(prev) - ret,
                ret * 10**6 // len(prev),
                (len(prev) - ret) * 10**6 // len(prev),
            )
        else:
            want[m] = (len(cur), new, ret, res, None, None, None)
    got = {
        r.month_idx: (
            r.n_active, r.n_new, r.n_retained, r.n_resurrected,
            r.n_churned_prev, r.retention_ppm, r.churn_ppm,
        )
        for r in A.churn_retention_monthly(t).collect()
    }
    assert got == want


def test_session_concurrency_engineered_hours(spark):
    """User 1: one session 10:50->12:10 (events 40 min apart chain it)
    covering hours 10,11,12; user 2: one event at 11:05 (hour 11
    only). Hour 11 must report 2 sessions / 2 users."""
    from parquet_export_spark.operators import advanced as A

    ev = _mk_events(
        spark,
        [
            (1, "2024-01-01 10:50:00", 1),
            (2, "2024-01-01 11:15:00", 1),
            (3, "2024-01-01 11:40:00", 1),
            (4, "2024-01-01 12:05:00", 1),
            (5, "2024-01-01 12:10:00", 1),
            (6, "2024-01-01 11:05:00", 2),
        ],
    )
    h = ((__import__("datetime").date(2024, 1, 1)
          - __import__("datetime").date(1970, 1, 1)).days) * 24
    got = {
        r.hour_idx: (r.n_sessions, r.n_users)
        for r in A.session_concurrency_hourly({"events": ev}).collect()
    }
    assert got == {
        h + 10: (1, 1),
        h + 11: (2, 2),
        h + 12: (1, 1),
    }


def test_session_concurrency_matches_bruteforce(spark):
    """Independent Python sessionization (sorted events, 30-min gap)
    exploded to covered hours."""
    from collections import defaultdict

    from parquet_export_spark.operators import advanced as A

    t = _lake_tables(spark)
    rows = t["events"].select("user_id", "ts", "event_id").collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append((r.ts, r.event_id))
    epoch = __import__("datetime").date(1970, 1, 1)
    hours = defaultdict(set)  # hour -> set of (user, session_no)
    for u, evs in by_user.items():
        evs.sort()
        sid, prev = 0, None
        spans = {}
        for ts, _ in evs:
            if prev is None or (ts - prev).total_seconds() > 1800:
                sid += 1
                spans[sid] = [ts, ts]
            else:
                spans[sid][1] = ts
            prev = ts
        for s, (a, b) in spans.items():
            h0 = (a.date() - epoch).days * 24 + a.hour
            h1 = (b.date() - epoch).days * 24 + b.hour
            for h in range(h0, h1 + 1):
                hours[h].add((u, s))
    want = {
        h: (len(ss), len({u for u, _ in ss})) for h, ss in hours.items()
    }
    got = {
        r.hour_idx: (r.n_sessions, r.n_users)
        for r in A.session_concurrency_hourly(t).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# readability_scores: hand-counted fixture + textbook replay
# ---------------------------------------------------------------------------


def test_readability_engineered_counts(spark):
    """'Hello world. It works!' -> 4 words, 2 sentences, syllables
    hel-lo(2) world(1) it(1) works(1) = 5 by the vowel-group rule;
    'xyz' -> the per-word 1-syllable floor; a punctuation-free doc
    -> the 1-sentence floor (the synthetic-corpus degeneracy)."""
    from parquet_export_spark.operators import text as X

    docs = spark.createDataFrame(
        [
            (1, "hello world. it works!", "en", "s", 22),
            (2, "xyz", "en", "s", 3),
            (3, "no punctuation here at all", "en", "s", 26),
        ],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    got = {
        r.doc_id: (r.n_words, r.n_sentences, r.n_syllables)
        for r in X.readability_scores({"documents": docs}).collect()
    }
    # doc 3: no(1) punc-tu-a-tion(u/ua/io = 3) here(2) at(1) all(1) = 8
    assert got == {1: (4, 2, 5), 2: (1, 1, 1), 3: (5, 1, 8)}


def test_readability_matches_textbook_bruteforce(spark):
    import re

    from parquet_export_spark.operators import text as X

    t = _lake_tables(spark)
    want = {}
    for r in t["documents"].select("doc_id", "text").collect():
        words = r.text.lower().split(" ")
        w = len(words)
        s = max(1, len(re.findall(r"[.!?]+", r.text)))
        syl = sum(
            max(1, len(re.findall(r"[aeiouy]+", word))) for word in words
        )
        flesch = round(206.835 - 1.015 * (w / s) - 84.6 * (syl / w), 6)
        fk = round(0.39 * (w / s) + 11.8 * (syl / w) - 15.59, 6)
        want[r.doc_id] = (w, s, syl, flesch, fk)
    got = {
        r.doc_id: (
            r.n_words, r.n_sentences, r.n_syllables, r.flesch, r.fk_grade
        )
        for r in X.readability_scores(t).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# mann_whitney_auc_pairs: brute-force pairwise replay + the U_a + U_b
# identity + the shared-envelope guard
# ---------------------------------------------------------------------------


def test_mann_whitney_matches_pairwise_bruteforce(spark):
    """Lake parity against the literal O(n_a*n_b) definition:
    U2 = Σ over all cross pairs of 2·[x_a > x_b] + 1·[x_a = x_b]
    (computed from value histograms, not actual pairs, but WITHOUT
    the cumulative trick — an independent code path)."""
    import math
    from collections import Counter, defaultdict

    t = _lake_tables(spark)
    by_type = defaultdict(Counter)
    for r in t["events"].select("event_type", "value").collect():
        by_type[r.event_type][math.floor(r.value * 100 + 0.5)] += 1
    types = sorted(by_type)
    got = {
        (r.type_a, r.type_b): (r.n_a, r.n_b, r.u2, r.auc_ppm)
        for r in ST.mann_whitney_auc_pairs(t).collect()
    }
    assert len(got) == len(types) * (len(types) - 1) // 2
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            ha, hb = by_type[a], by_type[b]
            na, nb = sum(ha.values()), sum(hb.values())
            u2 = 0
            for ca_val, ca_n in ha.items():
                for cb_val, cb_n in hb.items():
                    if ca_val > cb_val:
                        u2 += 2 * ca_n * cb_n
                    elif ca_val == cb_val:
                        u2 += ca_n * cb_n
            want = (na, nb, u2, u2 * 500_000 // (na * nb))
            assert got[(a, b)] == want, (a, b, got[(a, b)], want)
            # the classic identity: U_a + U_b = n_a * n_b  (doubled)
            u2_b = 2 * na * nb - u2
            assert 0 <= u2_b <= 2 * na * nb


def test_mann_whitney_engineered_direction(spark):
    """All of b strictly above all of a -> AUC(a over b) = 0; equal
    singletons -> exactly 500000 ppm (the ½-tie credit)."""
    rows = [("a", 1.0)] * 5 + [("b", 9.0)] * 3
    ev = spark.createDataFrame(rows, "event_type string, value double")
    [r] = ST.mann_whitney_auc_pairs({"events": ev}).collect()
    assert (r.u2, r.auc_ppm) == (0, 0)

    rows = [("a", 5.0), ("b", 5.0)]
    ev = spark.createDataFrame(rows, "event_type string, value double")
    [r] = ST.mann_whitney_auc_pairs({"events": ev}).collect()
    assert (r.u2, r.auc_ppm) == (1, 500_000)


def test_mann_whitney_over_envelope_raises(spark):
    """Same 3.1e6-per-type shape as the KS guard test — the shared
    envelope constant must fire here too."""
    events = spark.range(6_200_000).select(
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("event_type"),
        F.lit(1.0).alias("value"),
    )
    with pytest.raises(Exception, match="overflow envelope exceeded"):
        ST.mann_whitney_auc_pairs({"events": events}).collect()


# ---------------------------------------------------------------------------
# weekly_mix_drift: engineered mix shift + lake brute force
# ---------------------------------------------------------------------------


def test_weekly_mix_drift_engineered(spark):
    """Week w: 3 clicks / 1 signup; week w+1: 1 click / 3 errors.
    p = (3/4, 1/4, 0), q = (1/4, 0, 3/4) -> TV = ½(2/4 + 1/4 + 3/4)
    = 0.75; cross-multiplied num = Σ|cc*4 - cp*4| = 4*(2+1+3) = 24,
    ppm = 24*5e5 // 16 = 750000. A third week two weeks later must
    NOT pair with w+1 (calendar adjacency)."""
    from parquet_export_spark.operators import stats as S

    # Epoch weeks start on THURSDAYS (day 0 = Thu 1970-01-01), so the
    # fixture pins to epoch-week-aligned dates: week 2820 = Jan 18-24,
    # week 2821 = Jan 25-31, week 2823 = Feb 8-14 (2822 silent).
    ev = _mk_events(
        spark,
        [
            (1, "2024-01-18 10:00:00", 1),
            (2, "2024-01-19 10:00:00", 2),
            (3, "2024-01-20 10:00:00", 3),
            (4, "2024-01-21 10:00:00", 4),
            (5, "2024-01-25 10:00:00", 1),
            (6, "2024-01-26 10:00:00", 2),
            (7, "2024-01-27 10:00:00", 3),
            (8, "2024-01-28 10:00:00", 4),
            (9, "2024-02-08 10:00:00", 1),  # one silent week after
        ],
    ).withColumn(
        "event_type",
        F.expr(
            "CASE WHEN event_id <= 3 THEN 'click'"
            " WHEN event_id = 4 THEN 'signup'"
            " WHEN event_id = 5 THEN 'click'"
            " WHEN event_id <= 8 THEN 'error'"
            " ELSE 'click' END"
        ),
    )
    rows = S.weekly_mix_drift({"events": ev}).collect()
    assert len(rows) == 1  # only the adjacent pair
    [r] = rows
    assert (r.n_prev, r.n_cur, r.n_types_union) == (4, 4, 3)
    assert r.tv_num == 24
    assert r.tv_ppm == 750_000


def test_weekly_mix_drift_matches_bruteforce(spark):
    from collections import Counter, defaultdict
    from fractions import Fraction

    from parquet_export_spark.operators import stats as S

    t = _lake_tables(spark)
    epoch = __import__("datetime").date(1970, 1, 1)
    weeks = defaultdict(Counter)
    for r in t["events"].select("ts", "event_type").collect():
        weeks[(r.ts.date() - epoch).days // 7][r.event_type] += 1
    want = {}
    for w in sorted(weeks):
        if w - 1 not in weeks:
            continue
        p, q = weeks[w - 1], weeks[w]
        np_, nq = sum(p.values()), sum(q.values())
        types = set(p) | set(q)
        tv_num = sum(
            abs(q.get(ty, 0) * np_ - p.get(ty, 0) * nq) for ty in types
        )
        want[w] = (np_, nq, len(types), tv_num, tv_num * 500_000 // (np_ * nq))
        # sanity: the integer form equals the Fraction TV definition
        tv = Fraction(1, 2) * sum(
            abs(Fraction(q.get(ty, 0), nq) - Fraction(p.get(ty, 0), np_))
            for ty in types
        )
        assert Fraction(tv_num, 2 * np_ * nq) == tv
    got = {
        r.week: (r.n_prev, r.n_cur, r.n_types_union, r.tv_num, r.tv_ppm)
        for r in S.weekly_mix_drift(t).collect()
    }
    assert got == want and len(got) > 0


# ---------------------------------------------------------------------------
# forecast_backtest_mase: sequential replay + the DuckDB branched-fold
# bug documentation test
# ---------------------------------------------------------------------------


def test_mase_matches_sequential_replay(spark):
    """Lake parity against a pure-Python replay: dense series, the
    integer Holt recurrence over the train prefix, holt test errors,
    seasonal-naive in-sample denominator, the exact ppm ratio."""
    from collections import defaultdict
    import math

    from parquet_export_spark.operators import advanced as A

    t = _lake_tables(spark)
    daily = defaultdict(lambda: defaultdict(int))
    for r in t["events"].select("ts", "event_type", "value").collect():
        daily[r.event_type][r.ts.date()] += math.floor(r.value * 100 + 0.5)
    m = A.MASE_SEASON_DAYS
    want = {}
    for ty, dd in daily.items():
        lo, hi = min(dd), max(dd)
        n = (hi - lo).days + 1
        ys = [dd.get(lo + __import__("datetime").timedelta(days=i), 0)
              for i in range(n)]
        n_train = (n * 4) // 5
        n_test = n - n_train
        if n_train <= m or n_test < 1:
            continue
        l = b = None
        for y in ys[:n_train]:
            if l is None:
                l, b = y, 0
            else:
                l2 = (y + l + b) >> 1
                b = (l2 - l + b) >> 1
                l = l2
        err = sum(
            abs(ys[n_train + h - 1] - (l + h * b))
            for h in range(1, n_test + 1)
        )
        den = sum(
            abs(ys[i] - ys[i - m]) for i in range(m, n_train)
        )
        mase = (
            err * (n_train - m) * 10**6 // (n_test * den) if den else None
        )
        want[ty] = (n, n_train, n_test, l, b, err, den, mase)
    got = {
        r.event_type: (
            r.n_days, r.n_train, r.n_test, r.level_cents, r.trend_cents,
            r.err_sum_cents, r.den_sum_cents, r.mase_ppm,
        )
        for r in A.forecast_backtest_mase(t).collect()
    }
    assert got == want and len(got) > 0


def test_duckdb_branched_list_reduce_is_wrong():
    """Pin the MEASURED DuckDB 1.0 defect the mase/holt oracles route
    around (recursive CTE instead of a list fold): list_reduce with a
    CASE/IF branch inside the lambda returns wrong values, while the
    identical single step evaluates correctly. If a DuckDB upgrade
    fixes this, this test fails and the oracles may simplify."""
    import duckdb

    fold = """
      SELECT list_reduce(
        [{'l': CAST(0 AS BIGINT), 'b': CAST(0 AS BIGINT), 'k': CAST(0 AS BIGINT)},
         {'l': CAST(10 AS BIGINT), 'b': CAST(0 AS BIGINT), 'k': CAST(0 AS BIGINT)},
         {'l': CAST(14 AS BIGINT), 'b': CAST(0 AS BIGINT), 'k': CAST(0 AS BIGINT)},
         {'l': CAST(6 AS BIGINT), 'b': CAST(0 AS BIGINT), 'k': CAST(0 AS BIGINT)}],
        (acc, x) -> CASE WHEN acc.k = 0
          THEN {'l': x.l, 'b': CAST(0 AS BIGINT), 'k': CAST(1 AS BIGINT)}
          ELSE {'l': (x.l + acc.l + acc.b) >> 1,
                'b': (((x.l + acc.l + acc.b) >> 1) - acc.l + acc.b) >> 1,
                'k': acc.k + 1} END)
    """
    [st] = duckdb.sql(fold).fetchone()
    # correct sequential value: l=9, b=-1, k=3
    assert (st["l"], st["k"]) == (9, 3)
    if st["b"] == -1:
        raise AssertionError(
            "DuckDB fixed branched list_reduce — oracles can simplify"
        )
    assert st["b"] == 0  # the measured wrong value this pin documents


# ---------------------------------------------------------------------------
# sessions_artifact: probe == rebuild parity for all four consumers
# ---------------------------------------------------------------------------


def test_session_probes_equal_rebuild(spark):
    """Every session consumer must return IDENTICAL rows through the
    fit-once artifact (sessions=) and through its own in-query
    sessionization — including entry/exit, whose extraction moved
    from two row_number windows to min_by/max_by over the same
    (ts, event_id) total order."""
    from parquet_export_spark.operators import advanced as A

    t = _lake_tables(spark)
    art = A.sessions_artifact(t).localCheckpoint()
    for op in (
        A.sessionize_batch,
        A.session_entry_exit,
        A.session_duration_histogram,
        A.session_concurrency_hourly,
    ):
        rebuild = [tuple(r) for r in op(t).collect()]
        probe = [tuple(r) for r in op({}, sessions=art).collect()]
        assert probe == rebuild and len(probe) > 0, op.__name__


# ---------------------------------------------------------------------------
# Baseline JPEG codec (operators/jpeg.py): round trips, exact flats,
# quality monotonicity, loud rejections, Spark plumbing
# ---------------------------------------------------------------------------


def _jpeg_mod():
    from parquet_export_spark.operators import jpeg as J

    return J


def test_jpeg_flat_blocks_exact():
    """A flat image is DC-only; the level-shifted DC (8·(g−128)) is an
    exact multiple of nothing in particular, but quant/dequant of the
    single coefficient reconstructs the flat value exactly after the
    round: every flat gray and flat RGB must round-trip exactly."""
    import numpy as np

    J = _jpeg_mod()
    for g in (0, 7, 55, 128, 200, 255):
        img = np.full((16, 24), g, np.uint8)
        d = J.decode_jpeg(J.encode_jpeg(img, 90))
        assert (d["width"], d["height"], d["channels"]) == (24, 16, 1)
        assert np.array_equal(d["pixels"], img), g
    rgb = np.zeros((8, 8, 3), np.uint8)
    rgb[..., 0], rgb[..., 1], rgb[..., 2] = 30, 144, 255
    d = J.decode_jpeg(J.encode_jpeg(rgb, 95))
    assert d["channels"] == 3
    assert np.abs(d["pixels"].astype(int) - rgb.astype(int)).max() <= 2


def test_jpeg_roundtrip_error_bounds_and_monotone_quality():
    """White noise (the worst case for a DCT codec) at q95 must stay
    within a small per-pixel error; error must be non-increasing in
    quality; non-multiple-of-8 shapes exercise the edge padding."""
    import numpy as np

    J = _jpeg_mod()
    rng = np.random.RandomState(42)
    gray = rng.randint(0, 256, (33, 47), dtype=np.uint8)
    d = J.decode_jpeg(J.encode_jpeg(gray, 95))
    diff = np.abs(d["pixels"].astype(int) - gray.astype(int))
    assert diff.max() <= 12 and diff.mean() < 3.0
    rgb = rng.randint(0, 256, (29, 31, 3), dtype=np.uint8)
    d = J.decode_jpeg(J.encode_jpeg(rgb, 95))
    diff = np.abs(d["pixels"].astype(int) - rgb.astype(int))
    assert d["pixels"].shape == rgb.shape
    assert diff.mean() < 5.0
    errs = [
        np.abs(
            J.decode_jpeg(J.encode_jpeg(gray, q))["pixels"].astype(int)
            - gray.astype(int)
        ).mean()
        for q in (50, 75, 90, 99)
    ]
    assert all(a >= b for a, b in zip(errs, errs[1:])), errs
    # deterministic bytes + stable second generation (band-limited)
    assert J.encode_jpeg(gray, 90) == J.encode_jpeg(gray, 90)
    g1 = J.decode_jpeg(J.encode_jpeg(gray, 90))["pixels"]
    g2 = J.decode_jpeg(J.encode_jpeg(g1, 90))["pixels"]
    assert np.abs(g2.astype(int) - g1.astype(int)).mean() < 0.5


def test_jpeg_entropy_path_is_exact():
    """Decode must reproduce the encoder's quantized coefficients
    BIT-FOR-BIT: the decoded pixels equal a direct dequantize+IDCT of
    the encoder's own coefficient tensor (isolates the Huffman/bit
    layer from quantization loss)."""
    import numpy as np

    J = _jpeg_mod()
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (19, 22), dtype=np.uint8)
    q = 85
    ql, _ = J.quality_tables(q)
    zz = J._quantize_plane(img.astype(np.float64), ql)
    dez = np.zeros_like(zz, dtype=np.float64)
    dez[:, J.ZIGZAG] = zz
    dez *= ql[None, :]
    tiles = dez.reshape(-1, 8, 8)
    spat = np.einsum("ji,njk,kl->nil", J.DCT_T, tiles, J.DCT_T) + 128.0
    bh, bw = -(-19 // 8), -(-22 // 8)
    plane = (
        spat.reshape(bh, bw, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(bh * 8, bw * 8)[:19, :22]
    )
    ref = np.clip(np.round(plane), 0, 255).astype(np.uint8)
    got = J.decode_jpeg(J.encode_jpeg(img, q))["pixels"]
    assert np.array_equal(got, ref)


def test_jpeg_rejects_unsupported_and_corrupt():
    import numpy as np

    J = _jpeg_mod()
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    good = J.encode_jpeg(img, 90)

    with pytest.raises(ValueError, match="missing SOI"):
        J.decode_jpeg(b"not a jpeg")
    # flip SOF0 (0xC0) to progressive SOF2 (0xC2)
    sof = good.find(b"\xff\xc0")
    prog = good[:sof + 1] + b"\xc2" + good[sof + 2:]
    with pytest.raises(ValueError, match="non-baseline"):
        J.decode_jpeg(prog)
    # claim 2x2 luma sampling in SOF -> named rejection
    sub = bytearray(good)
    sub[sof + 11] = 0x22  # component 1 sampling byte
    with pytest.raises(ValueError, match="subsampled"):
        J.decode_jpeg(bytes(sub))
    # truncated entropy stream
    with pytest.raises(ValueError, match="truncated"):
        J.decode_jpeg(good[:len(good) - 12])
    # 16-bit DQT flag
    dqt = good.find(b"\xff\xdb")
    bad = bytearray(good)
    bad[dqt + 4] = 0x10
    with pytest.raises(ValueError, match="16-bit"):
        J.decode_jpeg(bytes(bad))


def test_jpeg_scanner_tolerates_fill_bytes_and_standalone_markers():
    """B.1.1.2 latitude other encoders use (r9 advice): 0xFF fill
    bytes may pad any marker, and standalone length-less markers (TEM
    0x01, RSTn 0xD0-0xD7) may appear between segments. Both must parse
    to the identical image; pathological all-FF tails stay loud."""
    import numpy as np

    J = _jpeg_mod()
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    good = J.encode_jpeg(img, 90)
    base = J.decode_jpeg(good)["pixels"]

    # fill bytes before the DQT marker: FF DB -> FF FF FF DB
    dqt = good.find(b"\xff\xdb")
    padded = good[:dqt] + b"\xff\xff" + good[dqt:]
    assert np.array_equal(J.decode_jpeg(padded)["pixels"], base)

    # a standalone TEM marker between SOI and DQT
    tem = good[:2] + b"\xff\x01" + good[2:]
    assert np.array_equal(J.decode_jpeg(tem)["pixels"], base)

    # both at once, plus an RST0 standalone marker
    both = good[:2] + b"\xff\xd0" + good[2:dqt] + b"\xff" + good[dqt:]
    assert np.array_equal(J.decode_jpeg(both)["pixels"], base)

    # fill bytes running off the end must raise, not IndexError
    with pytest.raises(ValueError, match="truncated|corrupt|marker"):
        J.decode_jpeg(good[:2] + b"\xff\xff\xff")


def test_jpeg_extend_matches_spec_table():
    """F.2.2.1 EXTEND on every size 1..10: the low-bit codes map to
    the two signed ranges the spec tabulates."""
    J = _jpeg_mod()
    for size in range(1, 11):
        lo, hi = 1 << (size - 1), (1 << size) - 1
        # positive branch: raw in [2^(s-1), 2^s-1] -> itself
        assert J._extend(lo, size) == lo
        assert J._extend(hi, size) == hi
        # negative branch: raw in [0, 2^(s-1)-1] -> raw - 2^s + 1
        assert J._extend(0, size) == -hi
        assert J._extend(lo - 1, size) == -lo
    assert J._extend(0, 0) == 0


def test_jpeg_sniff_and_spark_plumbing(spark):
    """End-to-end through the registered decoder: payloads sniff as
    image/jpeg, decoded_features returns true dimensions via
    mapInPandas, and resize_images re-encodes an 8x8 JPEG whose
    decode approximates the nearest-neighbor kernel (lossy format:
    tolerance, not equality — the PNG twin asserts exact)."""
    import numpy as np

    from parquet_export_spark.operators import multimodal as M

    J = _jpeg_mod()
    rng = np.random.RandomState(3)
    imgs = {
        int(i): (rng.randint(0, 32, size=(6 + i, 9, 3)) * 8).astype(
            np.uint8
        )
        for i in range(3)
    }
    payloads = spark.createDataFrame(
        [(i, bytearray(J.encode_jpeg(px, 95))) for i, px in imgs.items()],
        "doc_id long, payload binary",
    )
    assert M.sniff_media_type(J.encode_jpeg(imgs[0])) == "image/jpeg"
    feats = {
        r.doc_id: (r.width, r.height)
        for r in M.decoded_features(payloads, "image/jpeg").collect()
    }
    assert feats == {i: (9, 6 + i) for i in imgs}
    resized = {
        r.doc_id: bytes(r.payload)
        for r in M.resize_images(payloads, 8, 8, "image/jpeg").collect()
    }
    for i, px in imgs.items():
        want = M.resize_nearest(
            J.decode_jpeg(J.encode_jpeg(px, 95))["pixels"], 8, 8
        )
        got = J.decode_jpeg(resized[i])["pixels"]
        assert got.shape == want.shape
        # the 8x8 thumb is pure noise re-encoded at the adapter's
        # default quality: plumbing tolerance, not a fidelity claim
        assert np.abs(got.astype(int) - want.astype(int)).mean() < 10.0


# ---------------------------------------------------------------------------
# textrank_keywords: star-graph differentiation + numpy PageRank parity
# ---------------------------------------------------------------------------


def test_textrank_star_graph_ranks_hub_first(spark):
    """An engineered corpus where 'hub' co-occurs with every spoke but
    spokes never touch each other: the hub must out-rank every spoke,
    and spokes (symmetric roles) must tie exactly — the integer core
    has no float noise to break symmetry."""
    from parquet_export_spark.operators import text as X

    docs = spark.createDataFrame(
        [
            (i, f"hub spoke{i}", "en", "s", 10)
            for i in range(1, 7)
        ],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    rows = X.textrank_keywords({"documents": docs}).collect()
    ranks = {r.word: r.rank_scaled for r in rows}
    assert len(ranks) == 7
    spokes = {v for w, v in ranks.items() if w != "hub"}
    assert len(spokes) == 1  # exact symmetric tie
    assert ranks["hub"] > next(iter(spokes))
    # deterministic order: rank desc then word asc
    assert [r.word for r in rows][:1] == ["hub"]
    assert [r.word for r in rows][1:] == sorted(
        w for w in ranks if w != "hub"
    )


def test_textrank_matches_numpy_pagerank(spark):
    """Lake parity vs an independent numpy integer-PageRank replay on
    the same deduplicated symmetric word graph."""
    from collections import defaultdict

    import numpy as np

    from parquet_export_spark.operators import text as X
    from parquet_export_spark.operators.graph import (
        PAGERANK_ITERS,
        PAGERANK_SCALE,
    )

    t = _lake_tables(spark)
    edges = set()
    for r in t["documents"].select("text").collect():
        ws = r.text.split(" ")
        for a, b in zip(ws, ws[1:]):
            if a != b:
                edges.add((a, b))
                edges.add((b, a))
    nodes = sorted({a for a, _ in edges})
    idx = {w: i for i, w in enumerate(nodes)}
    out = defaultdict(list)
    deg = defaultdict(int)
    for a, b in edges:
        out[a].append(b)
        deg[a] += 1
    r = {w: PAGERANK_SCALE for w in nodes}
    base = 15 * PAGERANK_SCALE // 100
    for _ in range(PAGERANK_ITERS):
        contrib = defaultdict(int)
        for a in nodes:
            c = r[a] // deg[a]
            for b in out[a]:
                contrib[b] += c
        r = {w: base + 85 * contrib[w] // 100 for w in nodes}
    want = sorted(
        ((w, rv) for w, rv in r.items()), key=lambda x: (-x[1], x[0])
    )[:50]
    got = [
        (row.word, row.rank_scaled)
        for row in X.textrank_keywords(t).collect()
    ]
    assert got == want


# ---------------------------------------------------------------------------
# quantile_transform_values: midrank algebra + monotone-invariance
# ---------------------------------------------------------------------------


def test_quantile_transform_midrank_algebra(spark):
    """Hand-checkable: values [10, 10, 20, 30] -> midranks 1.5, 1.5,
    3, 4 of n=4 -> ppm 375000, 375000, 750000, 1000000; a second type
    ranks independently."""
    from parquet_export_spark.operators import stats as S

    ev = spark.createDataFrame(
        [
            (1, "a", 0.10), (2, "a", 0.10), (3, "a", 0.20), (4, "a", 0.30),
            (5, "b", 9.99),
        ],
        "event_id long, event_type string, value double",
    )
    got = {
        r.event_id: r.pct_ppm
        for r in S.quantile_transform_values({"events": ev}).collect()
    }
    assert got == {
        1: 375_000, 2: 375_000, 3: 750_000, 4: 1_000_000,
        5: 1_000_000,  # singleton: midrank 1 of 1
    }


def test_quantile_transform_monotone_invariant_and_bruteforce(spark):
    """The transform must be invariant under any monotone value map
    (rank-only), and must equal the textbook midrank/n on the lake."""
    import math
    from collections import defaultdict

    from parquet_export_spark.operators import stats as S

    t = _lake_tables(spark)
    rows = t["events"].select("event_id", "event_type", "value").collect()
    by_type = defaultdict(list)
    for r in rows:
        by_type[r.event_type].append(
            (math.floor(r.value * 100 + 0.5), r.event_id)
        )
    want = {}
    for ty, vs in by_type.items():
        n = len(vs)
        cnt = defaultdict(int)
        for c, _ in vs:
            cnt[c] += 1
        cum, midrank2 = 0, {}
        for c in sorted(cnt):
            cum += cnt[c]
            midrank2[c] = 2 * cum - cnt[c] + 1
        for c, eid in vs:
            want[eid] = midrank2[c] * 500_000 // n
    got = {
        r.event_id: r.pct_ppm
        for r in S.quantile_transform_values(t).collect()
    }
    assert got == want
    # monotone invariance: cube the values (order-preserving on
    # non-negatives) -> identical ppm column
    cubed = t["events"].withColumn(
        "value", F.col("value") * F.col("value") * F.col("value")
    )
    got_cubed = {
        r.event_id: r.pct_ppm
        for r in S.quantile_transform_values(
            {"events": cubed}
        ).collect()
    }
    assert got_cubed == got


# ---------------------------------------------------------------------------
# lift_curve / roc_auc on the clicks->purchase propensity split
# ---------------------------------------------------------------------------


def test_lift_and_auc_engineered_separable(spark):
    """Engineered perfect separation: buyers click 10x, non-buyers 1x.
    Top tier captures 100% of buyers at 50% of users -> lift 2.0;
    AUC = 1.0 (every buyer out-clicks every non-buyer)."""
    from parquet_export_spark.operators import advanced as A

    rows = []
    eid = 0
    for u in range(4):  # buyers: 10 clicks + 1 purchase
        for k in range(10):
            rows.append((eid, f"2024-01-01 0{k}:00:00", u)); eid += 1
        rows.append((eid, "2024-01-01 11:00:00", u)); eid += 1
    for u in range(4, 8):  # non-buyers: 1 click
        rows.append((eid, "2024-01-01 01:00:00", u)); eid += 1
    # purchases are each buyer's 11:00 event; everything else clicks
    ev = _mk_events(spark, rows).withColumn(
        "event_type",
        F.expr(
            "CASE WHEN user_id < 4 AND hour(ts) = 11"
            " THEN 'purchase' ELSE 'click' END"
        ),
    )
    lift = {
        r.n_clicks: (
            r.cum_users, r.cum_buyers, r.users_share_ppm,
            r.gains_ppm, r.lift_ppm,
        )
        for r in A.lift_curve_clicks_to_purchase({"events": ev}).collect()
    }
    assert lift == {
        10: (4, 4, 500_000, 1_000_000, 2_000_000),
        1: (8, 4, 1_000_000, 1_000_000, 1_000_000),
    }
    [auc] = A.roc_auc_clicks_to_purchase({"events": ev}).collect()
    assert (auc.n_pos, auc.n_neg, auc.auc_ppm) == (4, 4, 1_000_000)


def test_lift_and_auc_match_bruteforce(spark):
    """Lake parity vs a sklearn-free Python replay; AUC additionally
    equals the trapezoid area under the (fpr, tpr) staircase built
    from the same tiers (two independent definitions agreeing)."""
    from collections import defaultdict
    from fractions import Fraction

    from parquet_export_spark.operators import advanced as A

    t = _lake_tables(spark)
    users = defaultdict(lambda: [0, 0])
    for r in t["events"].select("user_id", "event_type").collect():
        if r.event_type == "click":
            users[r.user_id][0] += 1
        elif r.event_type == "purchase":
            users[r.user_id][1] = 1
        else:
            users.setdefault(r.user_id, [0, 0])
    tiers = defaultdict(lambda: [0, 0])
    for c, b in users.values():
        tiers[c][0] += 1
        tiers[c][1] += b
    tot_u = sum(v[0] for v in tiers.values())
    tot_b = sum(v[1] for v in tiers.values())
    cu = cb = 0
    want = {}
    for c in sorted(tiers, reverse=True):
        nu, nb = tiers[c]
        cu += nu
        cb += nb
        want[c] = (
            nu, nb, cu, cb,
            cu * 10**6 // tot_u,
            cb * 10**6 // tot_b,
            cb * tot_u * 10**6 // (tot_b * cu),
        )
    got = {
        r.n_clicks: (
            r.n_users, r.n_buyers, r.cum_users, r.cum_buyers,
            r.users_share_ppm, r.gains_ppm, r.lift_ppm,
        )
        for r in A.lift_curve_clicks_to_purchase(t).collect()
    }
    assert got == want

    # MWU-style AUC replay + trapezoid cross-check. The small lakes
    # are DEGENERATE here (every user eventually purchases -> no
    # negative class): the operator must report NULL, and the full
    # math cross-check runs only when both classes exist (the
    # engineered-separation test always carries it).
    pos = sorted(c for c, b in users.values() if b)
    neg = sorted(c for c, b in users.values() if not b)
    [row] = A.roc_auc_clicks_to_purchase(t).collect()
    assert (row.n_pos, row.n_neg) == (len(pos), len(neg))
    if not pos or not neg:
        assert row.auc_ppm is None
        return
    u2 = 0
    for p in pos:
        for ng in neg:
            if p > ng:
                u2 += 2
            elif p == ng:
                u2 += 1
    assert row.u2 == u2
    assert row.auc_ppm == u2 * 500_000 // (len(pos) * len(neg))
    auc_frac = Fraction(u2, 2 * len(pos) * len(neg))
    # trapezoid over the tier staircase (ascending threshold)
    area = Fraction(0)
    tp = fp = 0
    last_tp = last_fp = 0
    for c in sorted(tiers, reverse=True):
        nu, nb = tiers[c]
        tp += nb
        fp += nu - nb
        area += Fraction(fp - last_fp, len(neg)) * Fraction(
            tp + last_tp, 2 * len(pos)
        )
        last_tp, last_fp = tp, fp
    assert area == auc_frac


def test_quantile_transform_incremental_engineered(spark):
    """Reference (ids 1,2,3 -> not % 10): values 10, 20, 30 for type
    'a'. Batch (id 10): value 20 -> below=1, ties=1 -> midrank2=4 ->
    4*5e5//4 = 500000; (id 20): value 25, UNSEEN -> below=2, ties=0
    -> midrank2=5 -> 625000; (id 30): value 99 above all -> 875000
    (< 1e6: the new-observation headroom); (id 40): type 'z' with NO
    reference at all -> n_ref 0, pct 500000 (the only honest prior)."""
    from parquet_export_spark.operators import stats as S

    ev = spark.createDataFrame(
        [
            (1, "a", 0.10), (2, "a", 0.20), (3, "a", 0.30),
            (10, "a", 0.20), (20, "a", 0.25), (30, "a", 0.99),
            (40, "z", 5.0),
        ],
        "event_id long, event_type string, value double",
    )
    got = {
        r.event_id: (r.n_ref, r.seen_in_ref, r.pct_ppm)
        for r in S.quantile_transform_incremental({"events": ev}).collect()
    }
    assert got == {
        10: (3, True, 500_000),
        20: (3, False, 625_000),
        30: (3, False, 875_000),
        40: (0, False, 500_000),
    }


def test_quantile_transform_incremental_matches_bruteforce(spark):
    import math
    from collections import defaultdict

    from parquet_export_spark.operators import stats as S

    t = _lake_tables(spark)
    rows = [
        (r.event_id, r.event_type, math.floor(r.value * 100 + 0.5))
        for r in t["events"].select("event_id", "event_type", "value").collect()
    ]
    hist = defaultdict(list)
    for eid, ty, c in rows:
        if eid % S.QT_BATCH_MOD != 0:
            hist[ty].append(c)
    want = {}
    for eid, ty, c in rows:
        if eid % S.QT_BATCH_MOD != 0:
            continue
        ref = hist.get(ty, [])
        below = sum(1 for x in ref if x < c)
        ties = sum(1 for x in ref if x == c)
        want[eid] = (
            len(ref),
            ties > 0,
            (2 * below + ties + 1) * 500_000 // (len(ref) + 1),
        )
    got = {
        r.event_id: (r.n_ref, r.seen_in_ref, r.pct_ppm)
        for r in S.quantile_transform_incremental(t).collect()
    }
    assert got == want and len(got) > 0
    assert all(0 < p < 1_000_000 for _, _, p in got.values())


def test_hourly_percentiles_rank_definition(spark):
    """Hand-checkable hour: values 1..10 in one (type, hour) ->
    p50 = 5th (ceil(.5*10)), p90 = 9th, p99 = min cents with
    cum >= ceil(9.9) = 10th; a 1-event hour reports all three equal."""
    from parquet_export_spark.operators import stats as S

    rows = [
        (i, f"2024-01-01 10:{i:02d}:00", 1) for i in range(10)
    ] + [(99, "2024-01-01 11:00:00", 2)]
    ev = _mk_events(spark, rows).withColumn(
        "value",
        F.expr(
            "CASE WHEN event_id = 99 THEN 7.77"
            " ELSE CAST(event_id + 1 AS DOUBLE) END"
        ),
    )
    got = {
        (r.event_type, r.hour_idx % 24): (
            r.n_events, r.p50_cents, r.p90_cents, r.p99_cents
        )
        for r in S.hourly_value_percentiles({"events": ev}).collect()
    }
    assert got[("click", 10)] == (10, 500, 900, 1000)
    assert got[("click", 11)] == (1, 777, 777, 777)


def test_hourly_percentiles_match_bruteforce(spark):
    import math
    from collections import defaultdict

    from parquet_export_spark.operators import stats as S

    t = _lake_tables(spark)
    epoch = __import__("datetime").date(1970, 1, 1)
    groups = defaultdict(list)
    for r in t["events"].select("event_type", "ts", "value").collect():
        h = (r.ts.date() - epoch).days * 24 + r.ts.hour
        groups[(r.event_type, h)].append(math.floor(r.value * 100 + 0.5))
    want = {}
    for k, vs in groups.items():
        vs.sort()
        n = len(vs)
        def q(p):
            return vs[-(-p * n // 100) - 1]  # ceil(p*n/100)-th, 1-based
        want[k] = (n, q(50), q(90), q(99))
    got = {
        (r.event_type, r.hour_idx): (
            r.n_events, r.p50_cents, r.p90_cents, r.p99_cents
        )
        for r in S.hourly_value_percentiles(t).collect()
    }
    assert got == want and len(got) > 100
    # monotone by construction
    assert all(
        a <= b <= c for _, a, b, c in got.values()
    )


def test_seasonal_loo_engineered_peers(spark):
    """Three Mondays 10:00 with totals 100/200/300 (cents 10000/20000/
    30000): LOO ranks among the other two -> 166666 / 500000 / 833333
    ppm (n=3 midranks 1, 3, 5 of 2·3). A peerless hour scores the
    500000 prior."""
    from parquet_export_spark.operators import stats as S

    rows = [
        (1, "2024-01-01 10:00:00", 1),
        (2, "2024-01-08 10:00:00", 1),
        (3, "2024-01-15 10:00:00", 1),
        (4, "2024-01-02 09:00:00", 1),  # lone Tuesday 9:00
    ]
    ev = _mk_events(spark, rows).withColumn(
        "value", F.expr("CAST(event_id * 100 AS DOUBLE)")
    )
    got = {
        r.hour_idx: (r.n_peers, r.pct_ppm)
        for r in S.seasonal_hour_baseline_loo({"events": ev}).collect()
    }
    vals = sorted(got.items())
    # the three Mondays share an hour-of-week; the Tuesday is alone
    peers = [v for v in got.values() if v[0] == 2]
    assert sorted(p for _, p in peers) == [166_666, 500_000, 833_333]
    assert (0, 500_000) in got.values()


def test_seasonal_loo_matches_bruteforce(spark):
    import math
    from collections import defaultdict

    from parquet_export_spark.operators import stats as S

    t = _lake_tables(spark)
    epoch = __import__("datetime").date(1970, 1, 1)
    hourly = defaultdict(int)
    for r in t["events"].select("event_type", "ts", "value").collect():
        h = (r.ts.date() - epoch).days * 24 + r.ts.hour
        hourly[(r.event_type, h)] += math.floor(r.value * 100 + 0.5)
    groups = defaultdict(list)
    for (ty, h), tot in hourly.items():
        groups[(ty, h % 168)].append(tot)
    want = {}
    for (ty, h), tot in hourly.items():
        peers = groups[(ty, h % 168)]
        n = len(peers)
        below = sum(1 for x in peers if x < tot)
        ties_excl = sum(1 for x in peers if x == tot) - 1
        want[(ty, h)] = (
            n - 1,
            (2 * below + ties_excl + 1) * 500_000 // n,
        )
    got = {
        (r.event_type, r.hour_idx): (r.n_peers, r.pct_ppm)
        for r in S.seasonal_hour_baseline_loo(t).collect()
    }
    assert got == want and len(got) > 100
    assert all(0 < p < 1_000_000 for _, p in got.values())


# ---------------------------------------------------------------------------
# harmonic_closeness_suppliers: BFS ground truth + star-graph shape
# ---------------------------------------------------------------------------


def test_harmonic_closeness_star_graph(spark):
    """Star with hub 0 and spokes 1..5, sources = 8 smallest ids =
    all 6 nodes: hub harmonic = 5 sources at d=1 -> 5e6; each spoke =
    hub at d=1 + 4 spokes at d=2 -> 1e6 + 4*5e5 = 3e6."""
    from parquet_export_spark.operators import graph as G

    strong = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "s1 long, s2 long"
    )
    got = {
        r.node: (r.n_sources_reached, r.harmonic_scaled)
        for r in G.harmonic_closeness_suppliers({}, strong=strong).collect()
    }
    assert got[0] == (5, 5_000_000)
    for spoke in range(1, 6):
        assert got[spoke] == (5, 3_000_000)


def test_harmonic_closeness_matches_python_bfs(spark):
    """Lake parity vs a plain-Python BFS from the same k smallest
    sources over the same projected pairs, horizon-capped identically
    (including the nodes-absent-when-unreached contract)."""
    from collections import defaultdict, deque

    from parquet_export_spark.operators import graph as G
    from parquet_export_spark.sources.lake import load_tables

    t = load_tables(spark, "/root/testdata/sf0.001")
    strong = G._supplier_strong_pairs(
        t, G.SUPPLIER_COMMUNITY_PCTL, G.BUTTERFLY_MAX_DEGREE
    ).localCheckpoint()
    adj = defaultdict(set)
    for r in strong.collect():
        adj[r.s1].add(r.s2)
        adj[r.s2].add(r.s1)
    sources = sorted(adj)[: G.HARMONIC_SOURCES]
    acc = defaultdict(lambda: [0, 0])
    for s in sources:
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            if dist[u] >= G.HARMONIC_HOPS:
                continue
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        for v, d in dist.items():
            if v != s:
                acc[v][0] += 1
                acc[v][1] += G.HARMONIC_SCALE // d
    want = {v: tuple(x) for v, x in acc.items()}
    got = {
        r.node: (r.n_sources_reached, r.harmonic_scaled)
        for r in G.harmonic_closeness_suppliers(
            {}, strong=strong
        ).collect()
    }
    # the sf0.001 projection is tiny (6 strong-pair nodes) — the
    # triple-SF sweep gate carries the sf0.1-scale oracle leg
    assert got == want and len(got) >= 3
