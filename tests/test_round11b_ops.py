"""Round-11 second batch: independent Python differentials for the
distribution-distance / effect-size / survival / grouped-regression /
tree-split / graph-topology / sequence-information operators.

Same evidence class as tests/test_round11_ops.py: every reference here
recomputes the operator's answer from raw rows in plain Python
(Fraction / math where exactness is claimed), independently of both
the Spark plan and the DuckDB oracle text, so a shared misreading of a
definition cannot pass both gates.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from fractions import Fraction

from parquet_export_spark.operators import advanced as A
from parquet_export_spark.operators import graph as G
from parquet_export_spark.operators import stats as ST
from parquet_export_spark.sources.lake import load_tables


def _tables(spark, sf_dir):
    return load_tables(spark, sf_dir)


def _cents_by_type(t):
    rows = (
        t["events"].selectExpr(
            "event_type", "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c"
        )
    ).collect()
    by_type: dict[str, Counter] = defaultdict(Counter)
    for r in rows:
        by_type[r.event_type][r.c] += 1
    return by_type


# ---------------------------------------------------------------------------
# hellinger_pairs / jensen_shannon_pairs: brute-force pmf replay
# ---------------------------------------------------------------------------


def test_hellinger_matches_python_replay(spark, sf_dir):
    t = _tables(spark, sf_dir)
    by_type = _cents_by_type(t)
    out = {
        (r.type_a, r.type_b): r
        for r in ST.hellinger_pairs(t).collect()
    }
    types = sorted(by_type)
    assert len(out) == len(types) * (len(types) - 1) // 2
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            ca, cb = by_type[ta], by_type[tb]
            na, nb = sum(ca.values()), sum(cb.values())
            common = set(ca) & set(cb)
            bc = sum(
                math.sqrt(ca[x] * cb[x]) for x in sorted(common)
            ) / math.sqrt(na * nb)
            r = out[(ta, tb)]
            assert r.n_a == na and r.n_b == nb
            assert r.common_buckets == len(common)
            assert abs(r.bc_coeff - bc) < 1e-12
            assert abs(r.hellinger - math.sqrt(max(0.0, 1.0 - bc))) < 1e-12
            assert 0.0 <= r.bc_coeff <= 1.0 + 1e-12
            assert -1e-12 <= r.hellinger <= 1.0 + 1e-12


def test_jensen_shannon_matches_python_replay(spark, sf_dir):
    t = _tables(spark, sf_dir)
    by_type = _cents_by_type(t)
    out = {
        (r.type_a, r.type_b): r
        for r in ST.jensen_shannon_pairs(t).collect()
    }
    types = sorted(by_type)
    ln2 = math.log(2.0)
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            ca, cb = by_type[ta], by_type[tb]
            na, nb = sum(ca.values()), sum(cb.values())
            support = set(ca) | set(cb)
            s = 0.0
            for x in sorted(support):
                p, q = ca.get(x, 0) / na, cb.get(x, 0) / nb
                if p > 0:
                    s += p * math.log(2 * p / (p + q))
                if q > 0:
                    s += q * math.log(2 * q / (p + q))
            jsd = s / 2
            r = out[(ta, tb)]
            assert r.support_buckets == len(support)
            assert abs(r.jsd_nats - jsd) < 1e-8
            assert abs(r.js_distance - math.sqrt(max(0.0, jsd))) < 1e-8
            # the divergence bound that makes JS the bounded KL fix
            assert -1e-9 <= r.jsd_nats <= ln2 + 1e-9


def test_hellinger_identical_and_disjoint_limits(spark):
    """Engineered limits: identical pmfs -> BC 1 / H 0; disjoint
    pmfs -> no common support row shape (BC term absent entirely)."""
    rows = [("a", 1.00, i) for i in range(6)] + [
        ("b", 1.00, i) for i in range(6)
    ] + [("c", 9.99, i) for i in range(4)]
    df = spark.createDataFrame(
        [(ty, v, f"u{i}") for ty, v, i in rows],
        "event_type string, value double, user_id string",
    )
    out = {
        (r.type_a, r.type_b): r
        for r in ST.hellinger_pairs({"events": df}).collect()
    }
    ab = out[("a", "b")]
    assert abs(ab.bc_coeff - 1.0) < 1e-15 and abs(ab.hellinger) < 1e-7
    # a vs c share no bucket: inner common support drops the pair row
    assert ("a", "c") not in out and ("b", "c") not in out


# ---------------------------------------------------------------------------
# cohens_d_pairs: textbook replay + invariants
# ---------------------------------------------------------------------------


def test_cohens_d_matches_python_replay(spark, sf_dir):
    t = _tables(spark, sf_dir)
    by_type = _cents_by_type(t)
    out = {
        (r.type_a, r.type_b): r for r in ST.cohens_d_pairs(t).collect()
    }
    types = sorted(by_type)
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            ca, cb = by_type[ta], by_type[tb]
            xs = [c for c, k in ca.items() for _ in range(k)]
            ys = [c for c, k in cb.items() for _ in range(k)]
            na, nb = len(xs), len(ys)
            ma, mb = sum(xs) / na, sum(ys) / nb
            ssa = sum((x - ma) ** 2 for x in xs)
            ssb = sum((y - mb) ** 2 for y in ys)
            sp = math.sqrt((ssa + ssb) / (na + nb - 2))
            d = (ma - mb) / sp
            jf = 1 - 3 / (4 * (na + nb) - 9)
            r = out[(ta, tb)]
            assert abs(r.sd_pooled - sp) < 1e-6 * sp
            assert abs(r.cohens_d - d) < 1e-9 + 1e-9 * abs(d)
            assert abs(r.hedges_g - d * jf) < 1e-9 + 1e-9 * abs(d)
            # |g| < |d| always (J < 1): the correction shrinks
            assert abs(r.hedges_g) < abs(r.cohens_d) or r.cohens_d == 0


# ---------------------------------------------------------------------------
# grubbs_test_daily: brute-force replay
# ---------------------------------------------------------------------------


def test_grubbs_matches_python_replay(spark, sf_dir):
    t = _tables(spark, sf_dir)
    rows = ST._daily_type_counts(t).collect()
    series: dict[str, dict[int, int]] = defaultdict(dict)
    for r in rows:
        series[r.event_type][r.day] = r.c
    out = {r.event_type: r for r in ST.grubbs_test_daily(t).collect()}
    assert set(out) == set(series)
    for ty, days in series.items():
        cs = list(days.values())
        n = len(cs)
        mean = sum(cs) / n
        var = sum((c - mean) ** 2 for c in cs) / (n - 1)
        maxdev = max(abs(c - mean) for c in cs)
        # min day achieving the max deviation (the operator tie-break)
        best_day = min(
            d for d, c in days.items() if abs(c - mean) == maxdev
        )
        r = out[ty]
        assert r.n_days == n
        assert abs(r.mean_c - mean) < 1e-9
        assert abs(r.sd_c - math.sqrt(var)) < 1e-9
        assert abs(r.grubbs_g - maxdev / math.sqrt(var)) < 1e-9
        assert r.outlier_day == best_day
        assert r.outlier_count == days[best_day]


def test_grubbs_flags_engineered_spike(spark):
    """A flat series with one engineered spike day must flag exactly
    that day with a large G."""
    rows = []
    for d in range(1, 31):
        n = 50 if d != 17 else 500
        rows += [
            ("click", f"2024-01-{d:02d} 00:00:{s % 60:02d}", f"u{s}", 1.0)
            for s in range(n)
        ]
    df = spark.createDataFrame(
        rows, "event_type string, ts_s string, user_id string, value double"
    ).selectExpr(
        "event_type",
        "CAST(ts_s AS TIMESTAMP) AS ts",
        "user_id",
        "value",
    )
    out = ST.grubbs_test_daily({"events": df}).collect()
    assert len(out) == 1
    r = out[0]
    spike_day = (
        df.selectExpr(
            "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') AS BIGINT)"
            " AS day"
        )
        .groupBy("day")
        .count()
        .orderBy("count", ascending=False)
        .first()
        .day
    )
    assert r.outlier_day == spike_day and r.outlier_count == 500
    assert r.grubbs_g > 5.0


# ---------------------------------------------------------------------------
# nelson_aalen / logrank: textbook survival replays
# ---------------------------------------------------------------------------


def test_nelson_aalen_matches_python_replay(spark, sf_dir):
    t = _tables(spark, sf_dir)
    km = {r.dur_days: r for r in A.kaplan_meier_interorder(t).collect()}
    na = {r.dur_days: r for r in A.nelson_aalen_interorder(t).collect()}
    # same subjects -> same death times, risk sets, death counts
    assert set(km) == set(na)
    h = 0.0
    v = 0.0
    for dur in sorted(na):
        r = na[dur]
        assert r.n_at_risk == km[dur].n_at_risk
        assert r.d_events == km[dur].d_events
        h += r.d_events / r.n_at_risk
        v += r.d_events / (r.n_at_risk * r.n_at_risk)
        assert abs(r.na_cum_hazard - h) < 1e-9
        assert abs(r.na_var - v) < 1e-12
    # exp(-H) >= KM survival pointwise (standard estimator inequality,
    # strict once any d > 1/n step occurred) — a cross-operator sanity
    # tie between the two implementations
    for dur in sorted(na):
        assert math.exp(-na[dur].na_cum_hazard) >= km[dur].survival - 1e-6


def test_logrank_matches_python_replay(spark, sf_dir):
    t = _tables(spark, sf_dir)
    out = A.logrank_test_segments(t).collect()
    assert len(out) == 1
    r = out[0]
    # rebuild subjects in Python
    seg = {
        x.c_custkey: (1 if x.c_mktsegment == "BUILDING" else 0)
        for x in t["customer"].select("c_custkey", "c_mktsegment").collect()
    }
    days = defaultdict(set)
    for x in (
        t["orders"].select("o_custkey", "o_orderdate").distinct().collect()
    ):
        days[x.o_custkey].add(x.o_orderdate)
    maxd = max(d for s in days.values() for d in s)
    subj = []  # (group, dur, observed)
    for ck, ds in days.items():
        ordered = sorted(ds)
        g = seg[ck]
        for a, b in zip(ordered, ordered[1:]):
            subj.append((g, (b - a).days, 1))
        subj.append((g, (maxd - ordered[-1]).days, 0))
    assert r.subjects_a == sum(1 for g, _, _ in subj if g == 1)
    assert r.subjects_b == sum(1 for g, _, _ in subj if g == 0)
    # risk sets / death counts per duration
    durs = sorted({d for _, d, o in subj if o == 1})
    ome = Fraction(0)
    e_tot = Fraction(0)
    var = Fraction(0)
    for dt in durs:
        na_ = sum(1 for g, d, _ in subj if g == 1 and d >= dt)
        nb_ = sum(1 for g, d, _ in subj if g == 0 and d >= dt)
        da = sum(1 for g, d, o in subj if g == 1 and d == dt and o == 1)
        db = sum(1 for g, d, o in subj if g == 0 and d == dt and o == 1)
        n, dd = na_ + nb_, da + db
        e = Fraction(dd * na_, n)
        ome += da - e
        e_tot += e
        if n > 1:
            var += (
                Fraction(dd)
                * Fraction(na_, n)
                * Fraction(nb_, n)
                * Fraction(n - dd, n - 1)
            )
    assert r.n_death_times == len(durs)
    assert abs(r.o_minus_e_a - float(ome)) < 1e-6
    assert abs(r.expected_a - float(e_tot)) < 1e-6
    assert abs(r.var_sum - float(var)) < 1e-6
    assert abs(r.logrank_chi2 - float(ome) ** 2 / float(var)) < 1e-6


# ---------------------------------------------------------------------------
# ols_discount_qty_by_brand: Fraction replay
# ---------------------------------------------------------------------------


def test_grouped_ols_matches_fraction_replay(spark, sf_dir):
    t = _tables(spark, sf_dir)
    li = (
        t["lineitem"]
        .join(
            t["part"].selectExpr("p_partkey AS l_partkey", "p_brand"),
            "l_partkey",
        )
        .selectExpr(
            "p_brand",
            "CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS x",
            "CAST(l_quantity AS BIGINT) AS y",
        )
        .collect()
    )
    agg: dict[str, list] = defaultdict(lambda: [0, 0, 0, 0, 0])
    for r in li:
        a = agg[r.p_brand]
        a[0] += 1
        a[1] += r.x
        a[2] += r.y
        a[3] += r.x * r.y
        a[4] += r.x * r.x
    out = {r.p_brand: r for r in ST.ols_discount_qty_by_brand(t).collect()}
    assert set(out) == set(agg)
    for brand, (n, sx, sy, sxy, sxx) in agg.items():
        r = out[brand]
        assert (r.n, r.sx, r.sy, r.sxy, r.sxx) == (n, sx, sy, sxy, sxx)
        den = n * sxx - sx * sx
        if den > 0:
            slope = Fraction(n * sxy - sx * sy, den)
            intercept = (Fraction(sy) - slope * sx) / n
            assert abs(r.slope - float(slope)) < 1e-9 + 1e-9 * abs(
                float(slope)
            )
            assert abs(r.intercept - float(intercept)) < 1e-9
        else:
            assert r.slope is None and r.intercept is None


# ---------------------------------------------------------------------------
# decision_stump_purchase: exhaustive Fraction argmin replay
# ---------------------------------------------------------------------------


def test_stump_matches_exhaustive_fraction_argmin(spark, sf_dir):
    t = _tables(spark, sf_dir)
    rows = (
        t["events"]
        .selectExpr(
            "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents",
            "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos",
        )
        .collect()
    )
    support = Counter()
    posc = Counter()
    for r in rows:
        support[r.cents] += 1
        posc[r.cents] += r.pos
    n = sum(support.values())
    n_pos = sum(posc.values())

    def gini(nn, pp):
        if nn == 0:
            return Fraction(0)
        p = Fraction(pp, nn)
        q = Fraction(nn - pp, nn)
        return Fraction(nn) * (1 - p * p - q * q)

    best = None
    nl = pl = 0
    for c in sorted(support):
        nl += support[c]
        pl += posc[c]
        if 0 < nl < n:
            imp = (gini(nl, pl) + gini(n - nl, n_pos - pl)) / n
            if best is None or imp < best[0] or (
                imp == best[0] and c < best[1]
            ):
                best = (imp, c, nl, pl)
    out = ST.decision_stump_purchase(t).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n, r.n_pos) == (n, n_pos)
    assert r.best_threshold_cents == best[1]
    assert (r.n_left, r.pos_left) == (best[2], best[3])
    assert abs(r.split_gini - float(best[0])) < 1e-12
    base = float(gini(n, n_pos) / n)
    assert abs(r.base_gini - base) < 1e-12
    assert abs(r.gini_gain - (base - float(best[0]))) < 1e-12
    assert r.gini_gain >= -1e-12


def test_stump_perfectly_separable_fixture(spark):
    """Engineered perfect split: all purchases below 5.00, all clicks
    above — the stump must find the boundary and reach zero impurity."""
    rows = [("purchase", 1.00 + i * 0.5, f"a{i}") for i in range(8)] + [
        ("click", 9.00 + i * 0.5, f"b{i}") for i in range(8)
    ]
    df = spark.createDataFrame(
        rows, "event_type string, value double, user_id string"
    )
    r = ST.decision_stump_purchase({"events": df}).collect()[0]
    assert r.best_threshold_cents == 450  # last purchase bucket
    assert r.split_gini == 0.0
    assert abs(r.gini_gain - r.base_gini) < 1e-15


# ---------------------------------------------------------------------------
# rich_club_suppliers: brute-force replay over the projection
# ---------------------------------------------------------------------------


def test_rich_club_matches_python_replay(spark, sf_dir):
    t = _tables(spark, sf_dir)
    strong = G._supplier_strong_pairs(t).collect()
    deg = Counter()
    for e in strong:
        deg[e.s1] += 1
        deg[e.s2] += 1
    out = {r.k_degree: r for r in G.rich_club_suppliers(t).collect()}
    for k in G.RICH_CLUB_GRID:
        nodes = {v for v, d in deg.items() if d > k}
        if len(nodes) < 2:
            assert k not in out
            continue
        ek = sum(1 for e in strong if e.s1 in nodes and e.s2 in nodes)
        r = out[k]
        assert r.n_nodes == len(nodes) and r.n_edges == ek
        phi = 2 * ek / (len(nodes) * (len(nodes) - 1))
        assert abs(r.rich_club_phi - phi) < 1e-12


# ---------------------------------------------------------------------------
# transition_entropy_types: brute-force replay + information bounds
# ---------------------------------------------------------------------------


def test_transition_entropy_matches_python_replay(spark, sf_dir):
    t = _tables(spark, sf_dir)
    pairs = (
        t["events"]
        .selectExpr("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    byu = defaultdict(list)
    for r in pairs:
        byu[r.user_id].append((r.ts, r.event_id, r.event_type))
    cells = Counter()
    for seq in byu.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            cells[(a, b)] += 1
    n = sum(cells.values())
    row = Counter()
    col = Counter()
    for (a, b), c in cells.items():
        row[a] += c
        col[b] += c
    hc = -sum(
        (c / n) * math.log(c / row[a]) for (a, _), c in cells.items()
    )
    hm = -sum((c / n) * math.log(c / n) for c in col.values())
    out = A.transition_entropy_types(t).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_transitions == n and r.n_states == len(cells)
    assert abs(r.h_next - hm) < 1e-8
    assert abs(r.h_next_given_current - hc) < 1e-8
    assert abs(r.mutual_info - (hm - hc)) < 1e-8
    # information-theory invariants: 0 <= H(next|cur) <= H(next),
    # MI >= 0, H(next) <= ln(k)
    assert -1e-9 <= r.mutual_info
    assert r.h_next_given_current <= r.h_next + 1e-9
    assert r.h_next <= math.log(max(len(col), 1)) + 1e-9


# ---------------------------------------------------------------------------
# kruskal_wallis_types: scipy-free textbook replay
# ---------------------------------------------------------------------------


def test_kruskal_wallis_matches_python_replay(spark, sf_dir):
    t = _tables(spark, sf_dir)
    by_type = _cents_by_type(t)
    pooled = Counter()
    for c in by_type.values():
        pooled.update(c)
    n = sum(pooled.values())
    # average rank per value (1-based, midrank for ties)
    avg_rank = {}
    cum = 0
    for v in sorted(pooled):
        tot = pooled[v]
        avg_rank[v] = cum + (tot + 1) / 2
        cum += tot
    sum_terms = 0.0
    for ty in sorted(by_type):
        rg = sum(c * avg_rank[v] for v, c in by_type[ty].items())
        ng = sum(by_type[ty].values())
        sum_terms += rg * rg / ng
    h = 12 / (n * (n + 1)) * sum_terms - 3 * (n + 1)
    tie = sum(c**3 - c for c in pooled.values())
    corr = 1 - tie / (n**3 - n)
    out = ST.kruskal_wallis_types(t).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_total == n and r.k == len(by_type)
    assert r.tie_num == tie
    assert abs(r.h_stat - h) < 1e-6
    assert abs(r.h_corrected - h / corr) < 1e-6
    # tie correction inflates H (corr < 1 whenever ties exist)
    if tie > 0:
        assert r.h_corrected > r.h_stat - 1e-12


def test_kruskal_wallis_identical_groups_near_zero(spark):
    """Two identical distributions -> H == 0 exactly (every rank sum
    is the expected one)."""
    rows = [("a", float(v), f"u{i}") for i, v in enumerate([1, 2, 3] * 4)]
    rows += [("b", float(v), f"v{i}") for i, v in enumerate([1, 2, 3] * 4)]
    df = spark.createDataFrame(
        rows, "event_type string, value double, user_id string"
    )
    r = ST.kruskal_wallis_types({"events": df}).collect()[0]
    assert abs(r.h_stat) < 1e-9


# ---------------------------------------------------------------------------
# permutation_entropy_daily: brute-force ordinal replay
# ---------------------------------------------------------------------------


def _ordinal_pattern(c1, c2, c3):
    cs = [c1, c2, c3]
    ranks = []
    for i, ci in enumerate(cs):
        r = sum(1 for cj in cs if cj < ci) + sum(
            1 for j in range(i) if cs[j] == ci
        )
        ranks.append(r)
    return ranks[0] * 100 + ranks[1] * 10 + ranks[2]


def test_permutation_entropy_matches_python_replay(spark, sf_dir):
    t = _tables(spark, sf_dir)
    rows = ST._daily_type_counts(t).collect()
    series = defaultdict(dict)
    for r in rows:
        series[r.event_type][r.day] = r.c
    out = {r.event_type: r for r in ST.permutation_entropy_daily(t).collect()}
    for ty, days in series.items():
        cs = [days[d] for d in sorted(days)]
        pats = Counter(
            _ordinal_pattern(a, b, c) for a, b, c in zip(cs, cs[1:], cs[2:])
        )
        n = sum(pats.values())
        if n == 0:
            assert ty not in out
            continue
        h = -sum((c / n) * math.log(c / n) for c in pats.values())
        r = out[ty]
        assert r.n_triples == n and r.n_patterns == len(pats)
        assert abs(r.perm_entropy - h) < 1e-8
        assert abs(r.pe_normalized - h / math.log(6)) < 1e-8
        # entropy of <=6 patterns is bounded by ln 6
        assert -1e-9 <= r.perm_entropy <= math.log(6) + 1e-9


def test_permutation_entropy_monotone_vs_noise(spark):
    """A strictly increasing series has ONE ordinal pattern (PE = 0);
    an engineered alternating series has two."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)

    def mk(ty, counts):
        rows = []
        eid = 0
        for d, k in enumerate(counts):
            for _ in range(k):
                rows.append((eid, t0 + timedelta(days=d), 1, ty, 1.0, "{}"))
                eid += 1
        return rows

    ramp = mk("ramp", [1, 2, 3, 4, 5, 6, 7, 8])
    saw = mk("saw", [1, 5, 1, 5, 1, 5, 1, 5])
    df = spark.createDataFrame(
        ramp + saw,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = {
        r.event_type: r
        for r in ST.permutation_entropy_daily({"events": df}).collect()
    }
    assert out["ramp"].n_patterns == 1
    assert out["ramp"].perm_entropy == 0.0
    assert out["saw"].n_patterns == 2
    assert out["saw"].perm_entropy > 0.5


# ---------------------------------------------------------------------------
# brown_forsythe_types: scipy-free replay off the median deviations
# ---------------------------------------------------------------------------


def test_brown_forsythe_matches_python_replay(spark, sf_dir):
    t = _tables(spark, sf_dir)
    by_type = _cents_by_type(t)
    # per-type lower median by the weighted_median rule
    devs = {}
    for ty, cnt in by_type.items():
        n = sum(cnt.values())
        cum = 0
        med = None
        for v in sorted(cnt):
            cum += cnt[v]
            if 2 * cum >= n:
                med = v
                break
        devs[ty] = Counter(
            {abs(v - med): 0 for v in cnt}
        )
        for v, c in cnt.items():
            devs[ty][abs(v - med)] += c
    k = len(devs)
    n_total = sum(sum(c.values()) for c in devs.values())
    s_tot = sum(z * c for d in devs.values() for z, c in d.items())
    s2_tot = sum(z * z * c for d in devs.values() for z, c in d.items())
    sum_terms = 0.0
    for ty in sorted(devs):
        ng = sum(devs[ty].values())
        sg = sum(z * c for z, c in devs[ty].items())
        sum_terms += sg * (sg / ng)
    ssb = sum_terms - s_tot * (s_tot / n_total)
    ssw = s2_tot - sum_terms
    w = (ssb / (k - 1)) / (ssw / (n_total - k))
    out = ST.brown_forsythe_types(t).collect()
    assert len(out) == 1
    r = out[0]
    assert r.k == k and r.n_total == n_total
    assert abs(r.ss_between - ssb) < 1e-6 * max(1.0, abs(ssb))
    assert abs(r.ss_within - ssw) < 1e-6 * max(1.0, abs(ssw))
    assert abs(r.w_stat - w) < 1e-9 + 1e-9 * abs(w)
    assert r.ss_within >= 0 and r.ss_between >= -1e-6


# ---------------------------------------------------------------------------
# goertzel_weekly_power: DFT-bin replay + engineered sine fixture
# ---------------------------------------------------------------------------


def test_goertzel_matches_python_recurrence(spark, sf_dir):
    t = _tables(spark, sf_dir)
    rows = ST._daily_type_counts(t).collect()
    series = defaultdict(dict)
    for r in rows:
        series[r.event_type][r.day] = r.c
    out = {r.event_type: r for r in ST.goertzel_weekly_power(t).collect()}
    C = 2 * math.cos(2 * math.pi / 7)
    for ty, days in series.items():
        d0, d1 = min(days), max(days)
        n = d1 - d0 + 1
        s = sum(days.values())
        mean = s / n
        s1 = s2 = 0.0
        for d in range(d0, d1 + 1):
            x = days.get(d, 0) - mean
            s1, s2 = x + C * s1 - s2, s1
        power = s1 * s1 + s2 * s2 - C * s1 * s2
        r = out[ty]
        assert r.n_days == n
        assert abs(r.mean_c - mean) < 1e-9
        assert abs(r.weekly_power - power) < 1e-6 * max(1.0, power)
        assert r.weekly_power >= -1e-9
        assert abs(
            r.weekly_amplitude - 2 * math.sqrt(max(0.0, power)) / n
        ) < 1e-9


def test_goertzel_detects_engineered_weekly_cycle(spark):
    """A pure 7-day cycle over 10 weeks must recover its amplitude
    (~2 sin events/day) while a flat series reads ~0."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for d in range(70):
        k_cyc = 10 + round(5 * math.sin(2 * math.pi * d / 7))
        for ty, k in (("cyc", k_cyc), ("flat", 10)):
            for _ in range(k):
                rows.append(
                    (eid, t0 + timedelta(days=d), 1, ty, 1.0, "{}")
                )
                eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = {
        r.event_type: r
        for r in ST.goertzel_weekly_power({"events": df}).collect()
    }
    # N=70 is an exact multiple of 7, so the bin is leakage-free:
    # amplitude ~ the constructed 5 (rounded sine loses a little)
    assert 4.0 < out["cyc"].weekly_amplitude < 6.0
    assert out["flat"].weekly_amplitude < 1e-6


# ---------------------------------------------------------------------------
# cochran_armitage_trend: Fraction replay + engineered monotone fixture
# ---------------------------------------------------------------------------


def test_cochran_armitage_matches_fraction_replay(spark, sf_dir):
    t = _tables(spark, sf_dir)
    users = {}
    for r in t["events"].select("user_id", "event_type").collect():
        x, b = users.get(r.user_id, (0, 0))
        users[r.user_id] = (
            x + (1 if r.event_type == "click" else 0),
            max(b, 1 if r.event_type == "purchase" else 0),
        )
    n = len(users)
    bb = sum(b for _, b in users.values())
    sum_nx = sum(x for x, _ in users.values())
    sum_nx2 = sum(x * x for x, _ in users.values())
    sum_bx = sum(x * b for x, b in users.values())
    tt = Fraction(sum_bx) - Fraction(bb * sum_nx, n)
    var = (
        Fraction(bb, n)
        * (1 - Fraction(bb, n))
        * (Fraction(sum_nx2) - Fraction(sum_nx * sum_nx, n))
    )
    out = A.cochran_armitage_trend(t).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_users, r.buyers, r.sum_nx, r.sum_nx2, r.sum_bx) == (
        n, bb, sum_nx, sum_nx2, sum_bx,
    )
    assert abs(r.ca_t - float(tt)) < 1e-9 * max(1.0, abs(float(tt)))
    assert abs(r.ca_var - float(var)) < 1e-9 * max(1.0, float(var))
    if var > 0:
        z = float(tt) / math.sqrt(float(var))
        assert abs(r.ca_z - z) < 1e-9 + 1e-9 * abs(z)
    else:
        # degenerate pool (every user a buyer, or none): z must be
        # NULL, not a division blow-up
        assert r.ca_z is None


def test_cochran_armitage_engineered_monotone_trend(spark):
    """Conversion engineered to rise with click count -> strongly
    positive z; flat conversion -> |z| small."""
    rows = []
    eid = 0
    for uid in range(300):
        clicks = uid % 3  # tiers 0,1,2
        buys = 1 if (uid % 10) < 2 + 3 * clicks else 0  # 20/50/80%
        for _ in range(clicks):
            rows.append((eid, "2024-01-01 00:00:00", f"u{uid}", "click", 1.0))
            eid += 1
        if buys:
            rows.append(
                (eid, "2024-01-01 00:00:01", f"u{uid}", "purchase", 1.0)
            )
            eid += 1
        rows.append((eid, "2024-01-01 00:00:02", f"u{uid}", "view", 1.0))
        eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts_s string, user_id string, event_type string,"
        " value double",
    ).selectExpr(
        "event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value",
    )
    r = A.cochran_armitage_trend({"events": df}).collect()[0]
    assert r.ca_z > 5.0


# ---------------------------------------------------------------------------
# variance_ratio_daily: Fraction replay + engineered persistence fixtures
# ---------------------------------------------------------------------------


def test_variance_ratio_matches_python_replay(spark, sf_dir):
    t = _tables(spark, sf_dir)
    rows = ST._daily_type_counts(t).collect()
    series = defaultdict(dict)
    for r in rows:
        series[r.event_type][r.day] = r.c
    out = {
        (r.event_type, r.q): r
        for r in ST.variance_ratio_daily(t).collect()
    }
    for ty, days in series.items():
        d0, d1 = min(days), max(days)
        xs = [days.get(d, 0) for d in range(d0, d1 + 1)]
        n = len(xs)

        def var(v):
            m = sum(v) / len(v)
            return sum((x - m) ** 2 for x in v) / (len(v) - 1)

        for q in ST.VR_HORIZONS:
            blocks = [
                sum(xs[i : i + q])
                for i in range(0, len(xs) - q + 1, q)
                if len(xs[i : i + q]) == q
            ]
            r = out[(ty, q)]
            assert r.n_days == n
            assert r.n_blocks == len(blocks)
            if n >= 2:
                assert abs(r.var_1 - var(xs)) < 1e-9 * max(1.0, var(xs))
            if len(blocks) >= 2 and var(xs) > 0:
                vq = var(blocks)
                assert abs(r.var_q - vq) < 1e-9 * max(1.0, vq)
                assert abs(r.vr - vq / (q * var(xs))) < 1e-9


def test_variance_ratio_engineered_persistence(spark):
    """Per-day-iid-vs-trending fixtures: an alternating series mean-
    reverts (VR(2) << 1); a two-regime series has persistent shocks
    (VR(2) >> 1)."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)

    def mk(ty, counts):
        rows = []
        eid = 0
        for d, k in enumerate(counts):
            for _ in range(k):
                rows.append(
                    (hash((ty, eid)) % (1 << 40), t0 + timedelta(days=d),
                     1, ty, 1.0, "{}")
                )
                eid += 1
        return rows

    revert = mk("revert", [2, 18] * 16)          # alternating
    trend = mk("trend", [2] * 16 + [18] * 16)    # regime shift
    df = spark.createDataFrame(
        revert + trend,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = {
        (r.event_type, r.q): r
        for r in ST.variance_ratio_daily({"events": df}).collect()
    }
    assert out[("revert", 2)].vr < 0.1      # adjacent days cancel
    assert out[("trend", 2)].vr > 1.5       # adjacent days reinforce


# ---------------------------------------------------------------------------
# mcnemar_weekly_conversion: paired replay + engineered discordance
# ---------------------------------------------------------------------------


def test_mcnemar_matches_python_replay(spark, sf_dir):
    t = _tables(spark, sf_dir)
    uw = {}
    for r in t["events"].select("user_id", "ts", "event_type").collect():
        week = (r.ts.date() - __import__("datetime").date(1970, 1, 1)).days // 7
        k = (r.user_id, week)
        uw[k] = max(uw.get(k, 0), 1 if r.event_type == "purchase" else 0)
    agg = defaultdict(lambda: [0, 0, 0, 0])  # n, both, b, c
    for (u, w), conv in uw.items():
        nxt = uw.get((u, w + 1))
        if nxt is None:
            continue
        a = agg[w]
        a[0] += 1
        if conv and nxt:
            a[1] += 1
        elif conv and not nxt:
            a[2] += 1
        elif not conv and nxt:
            a[3] += 1
    out = {r.week: r for r in A.mcnemar_weekly_conversion(t).collect()}
    assert set(out) == set(agg)
    for w, (n, both, b, c) in agg.items():
        r = out[w]
        assert (r.n_paired, r.n_both_conv, r.b_lost, r.c_gained) == (
            n, both, b, c,
        )
        if b + c > 0:
            chi2 = (abs(b - c) - 1) ** 2 / (b + c)
            assert abs(r.mcnemar_chi2 - chi2) < 1e-12
        else:
            assert r.mcnemar_chi2 is None


def test_mcnemar_engineered_oneway_loss(spark):
    """Everyone converts in week 0, nobody in week 1 -> b = n, c = 0,
    chi2 = (n-1)^2/n; and a stable cohort yields no discordance."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 5)  # inside one epoch week
    rows = []
    eid = 0
    for uid in range(20):
        rows.append((eid, t0, uid, "purchase", 1.0, "{}")); eid += 1
        rows.append((eid, t0 + timedelta(days=7), uid, "view", 1.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = A.mcnemar_weekly_conversion({"events": df}).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_paired, r.b_lost, r.c_gained) == (20, 20, 0)
    assert abs(r.mcnemar_chi2 - (19 * 19) / 20) < 1e-12


# ---------------------------------------------------------------------------
# mantel_haenszel_click_purchase: Fraction replay of strata + pooled OR
# ---------------------------------------------------------------------------


def test_mantel_haenszel_matches_fraction_replay(spark, sf_dir):
    t = _tables(spark, sf_dir)
    users = {}
    for r in t["events"].select("user_id", "event_type", "value").collect():
        v, ck, by = users.get(r.user_id, (0, 0, 0))
        users[r.user_id] = (
            v + int(math.floor(r.value * 100 + 0.5)),
            max(ck, 1 if r.event_type == "click" else 0),
            max(by, 1 if r.event_type == "purchase" else 0),
        )
    n = len(users)
    vals = sorted(v for v, _, _ in users.values())
    # rank-based boundaries: min v with cum >= ceil(q*n/5)
    bounds = []
    for q in (1, 2, 3, 4):
        k = math.ceil(q * n / 5)
        bounds.append(vals[k - 1])
    cells = defaultdict(lambda: [0, 0, 0, 0])
    for v, ck, by in users.values():
        s = 1 + sum(1 for b in bounds if v > b)
        i = (1 - ck) * 2 + (1 - by)  # a=0, b=1, c=2, d=3
        cells[s][i] += 1
    num = Fraction(0)
    den = Fraction(0)
    for s in sorted(cells):
        a, b, c, d = cells[s]
        tot = a + b + c + d
        num += Fraction(a * d, tot)
        den += Fraction(b * c, tot)
    out = A.mantel_haenszel_click_purchase(t).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_users == n and r.n_strata == len(cells)
    a_tot = sum(c[0] for c in cells.values())
    b_tot = sum(c[1] for c in cells.values())
    c_tot = sum(c[2] for c in cells.values())
    d_tot = sum(c[3] for c in cells.values())
    assert (r.a_tot, r.b_tot, r.c_tot, r.d_tot) == (
        a_tot, b_tot, c_tot, d_tot,
    )
    assert abs(r.mh_num - float(num)) < 1e-9 * max(1.0, float(num))
    assert abs(r.mh_den - float(den)) < 1e-9 * max(1.0, float(den))
    if den > 0:
        assert abs(r.or_mh - float(num / den)) < 1e-6
    if b_tot > 0 and c_tot > 0:
        crude = a_tot * d_tot / (b_tot * c_tot)
        assert abs(r.or_crude - crude) < 1e-9 * max(1.0, crude)


# ---------------------------------------------------------------------------
# friedman_types_weekly: scipy-free blocked-rank replay
# ---------------------------------------------------------------------------


def test_friedman_matches_python_replay(spark, sf_dir):
    t = _tables(spark, sf_dir)
    wk = defaultdict(dict)
    for r in t["events"].select("event_type", "ts").collect():
        week = (
            r.ts.date() - __import__("datetime").date(1970, 1, 1)
        ).days // 7
        wk[week][r.event_type] = wk[week].get(r.event_type, 0) + 1
    k_all = len({ty for d in wk.values() for ty in d})
    blocks = {w: d for w, d in wk.items() if len(d) == k_all}
    b = len(blocks)
    rsum = Counter()
    for d in blocks.values():
        vals = sorted(d.values())
        for ty, c in d.items():
            minrank = vals.index(c) + 1
            ties = vals.count(c)
            rsum[ty] += minrank + (ties - 1) / 2
    k = k_all
    sum_sq = sum(v * v for v in rsum.values())
    chi2 = 12 / (b * k * (k + 1)) * sum_sq - 3 * b * (k + 1)
    w_stat = chi2 / (b * (k - 1))
    out = ST.friedman_types_weekly(t).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.b_weeks, r.k_types) == (b, k)
    assert abs(r.friedman_chi2 - chi2) < 1e-9 * max(1.0, abs(chi2))
    assert abs(r.kendalls_w - w_stat) < 1e-9
    assert -1e-9 <= r.kendalls_w <= 1.0 + 1e-9


def test_friedman_locked_vs_shuffled_ranking(spark):
    """A fixture where type volumes keep the same strict order every
    week must reach W = 1 exactly; Friedman chi2 = b(k-1)."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 5)
    rows = []
    eid = 0
    for w in range(6):
        for ty, k in (("a", 2), ("b", 5), ("c", 9)):
            for _ in range(k):
                rows.append(
                    (eid, t0 + timedelta(weeks=w), 1, ty, 1.0, "{}")
                )
                eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    r = ST.friedman_types_weekly({"events": df}).collect()[0]
    assert (r.b_weeks, r.k_types) == (6, 3)
    assert abs(r.kendalls_w - 1.0) < 1e-12
    assert abs(r.friedman_chi2 - 6 * 2) < 1e-12


# ---------------------------------------------------------------------------
# uncertainty_coeff_type_decile: MI/entropy replay off the same cells
# ---------------------------------------------------------------------------


def test_uncertainty_coeff_matches_python_replay(spark, sf_dir):
    t = _tables(spark, sf_dir)
    cells = {
        (r.event_type, r.decile): (r.observed, r.rt, r.ct, r.n)
        for r in ST._type_decile_cells(t).collect()
    }
    n = next(iter(cells.values()))[3]
    mi = sum(
        (o / n) * math.log(o * n / (rt * ct))
        for (o, rt, ct, _) in cells.values()
    )
    row = {ty: rt for (ty, _), (_, rt, _, _) in cells.items()}
    col = {de: ct for (_, de), (_, _, ct, _) in cells.items()}
    ht = -sum((v / n) * math.log(v / n) for v in row.values())
    hd = -sum((v / n) * math.log(v / n) for v in col.values())
    out = ST.uncertainty_coeff_type_decile(t).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n == n and r.n_cells == len(cells)
    assert abs(r.h_type - ht) < 1e-8
    assert abs(r.h_decile - hd) < 1e-8
    assert abs(r.mutual_info - mi) < 1e-8
    assert abs(r.u_type_given_decile - mi / ht) < 1e-8
    assert abs(r.u_decile_given_type - mi / hd) < 1e-8
    # information bounds: 0 <= MI <= min(H); U in [0, 1]
    assert -1e-9 <= r.mutual_info <= min(ht, hd) + 1e-9
    assert -1e-9 <= r.u_type_given_decile <= 1.0 + 1e-9
    assert -1e-9 <= r.u_decile_given_type <= 1.0 + 1e-9


# ---------------------------------------------------------------------------
# ktruss_suppliers: Python peel-to-fixpoint replay
# ---------------------------------------------------------------------------


def test_ktruss_matches_python_fixpoint(spark, sf_dir):
    t = _tables(spark, sf_dir)
    edges = {
        (r.s1, r.s2) for r in G._supplier_strong_pairs(t).collect()
    }

    def supports(es):
        adj = defaultdict(set)
        for a, b in es:
            adj[a].add(b)
            adj[b].add(a)
        sup = Counter()
        for a, b in es:
            sup[(a, b)] = len(adj[a] & adj[b])
        return sup

    cur = set(edges)
    while True:
        sup = supports(cur)
        keep = {e for e in cur if sup[e] >= G.TRUSS_MIN_SUPPORT}
        if keep == cur:
            break
        cur = keep
    out = {(r.s1, r.s2): r.truss_support
           for r in G.ktruss_suppliers(t).collect()}
    assert set(out) == cur
    final_sup = supports(cur)
    for e, s in out.items():
        assert s == final_sup[e]
        # the truss property itself
        assert s >= G.TRUSS_MIN_SUPPORT


# ---------------------------------------------------------------------------
# holt_winters_weekly: sequential-Python smoother replay
# ---------------------------------------------------------------------------


def test_holt_winters_matches_python_recurrence(spark, sf_dir):
    t = _tables(spark, sf_dir)
    rows = ST._daily_type_counts(t).collect()
    series = defaultdict(dict)
    for r in rows:
        series[r.event_type][r.day] = r.c
    out = defaultdict(dict)
    for r in ST.holt_winters_weekly(t).collect():
        out[r.event_type][r.horizon] = r
    A, B, GG = 0.3, 0.05, 0.2
    for ty, days in series.items():
        d0, d1 = min(days), max(days)
        n = d1 - d0 + 1
        mean = sum(days.values()) / n
        lvl, tr = mean, 0.0
        s = [0.0] * 7
        for d in range(d0, d1 + 1):
            x = float(days.get(d, 0))
            i = (d - d0) % 7
            lvl_new = A * (x - s[i]) + (1 - A) * (lvl + tr)
            tr_new = B * (lvl_new - lvl) + (1 - B) * tr
            s[i] = GG * (x - lvl_new) + (1 - GG) * s[i]
            lvl, tr = lvl_new, tr_new
        for h in range(1, 8):
            f = lvl + h * tr + s[((d1 - d0) % 7 + h) % 7]
            r = out[ty][h]
            assert r.n_days == n
            assert abs(r.level - lvl) < 1e-9 * max(1.0, abs(lvl))
            assert abs(r.trend - tr) < 1e-9 * max(1.0, abs(tr))
            assert abs(r.forecast - f) < 1e-9 * max(1.0, abs(f))


def test_holt_winters_locks_onto_pure_weekly_cycle(spark):
    """A long pure 7-day cycle: the fitted seasonal forecasts must
    track the cycle shape (high day forecast > low day forecast by
    roughly the constructed gap), trend ~ 0."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for d in range(98):  # 14 weeks
        k = 20 if d % 7 == 3 else 5
        for _ in range(k):
            rows.append((eid, t0 + timedelta(days=d), 1, "cyc", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = {r.horizon: r for r in
           ST.holt_winters_weekly({"events": df}).collect()}
    assert abs(out[1].trend) < 0.2
    fcasts = [out[h].forecast for h in range(1, 8)]
    # exactly one peak day, roughly 15 above the floor
    peak, floor = max(fcasts), min(fcasts)
    assert 10 < peak - floor < 20
    assert sum(1 for f in fcasts if f > (peak + floor) / 2) == 1
