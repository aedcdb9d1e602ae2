"""Differential tests for the round-5 operator batch: kNN
classification, TWAP, rolling features, salted skew join.

Each checks against an INDEPENDENT reference (engineered-geometry
fixture, exact-integer Python loop, pandas rolling, unsalted plan) —
not the DuckDB oracle the driver already runs.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from parquet_export_spark.operators import advanced as A
from parquet_export_spark.operators import scale as SC
from parquet_export_spark.operators import similarity as S
from parquet_export_spark.sources.lake import load_tables
from tests.oracle_harness import compare, fixture_lake
from parquet_export_spark.queries import REGISTRY


def _small_tables(spark):
    return load_tables(spark, "/root/testdata/sf0.001")


def test_knn_classify_engineered_clusters(spark, sf_dir, tmp_path):
    """On three mutually-orthogonal unit clusters, every probe's
    neighborhood is its own cluster, so the prediction must equal the
    cluster label; a probe placed exactly between two clusters
    resolves by the documented (votes DESC, label ASC) tie-break.
    Run as an operator check AND a full oracle differential."""
    dim = 64
    rows = []

    def vec(axis, eps_axis=None, eps=0.0):
        v = [0.0] * dim
        v[axis] = 1.0
        if eps_axis is not None:
            v[eps_axis] = eps
        return v

    # clusters on axes 0/1/2; labels a/b/c. 8 members each with tiny
    # distinct perturbations on a private axis (keeps vectors unequal).
    for ci, label in enumerate(["a", "b", "c"]):
        for j in range(8):
            rows.append(
                (ci * 100 + j + 1, label, vec(ci, 10 + j, 0.001 * (j + 1)))
            )
    # probes (vec_id % KNN_PROBE_MOD == 0): id 20 in cluster a's cone,
    # id 40 exactly between clusters b (axis 1) and c (axis 2) — the
    # vote over k=15 neighbors splits 8/8 minus itself; label 'b' wins
    # the ASC tie-break if votes tie, else the larger side wins.
    rows.append((20, "a", vec(0, 11, 0.0005)))
    between = [0.0] * dim
    between[1] = 1.0
    between[2] = 1.0
    rows.append((40, "z", between))
    emb = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )
    fixture_dir = fixture_lake(
        spark, sf_dir, str(tmp_path / "knn"), {"embeddings": emb}
    )
    spec = REGISTRY["knn_classify"]
    ok, msg = compare(spark, fixture_dir, spec.fn, spec.oracle)
    assert ok, msg

    got = {
        r.query_id: (r.predicted_label, r.agrees)
        for r in S.knn_classify(load_tables(spark, fixture_dir)).collect()
    }
    assert got[20] == ("a", True)
    # k=15 neighbors of the midpoint: all of b and c (8+8=16 -> 15
    # closest after tie-break by id: cluster b ids 101.. < c ids 201..,
    # so b gets 8 votes, c gets 7) -> 'b', and it mismatches the stored
    # 'z' label — the label-error-detection use case.
    assert got[40] == ("b", False)


def test_twap_matches_integer_reference(spark):
    """TWAP must equal a sequential exact-integer Python loop (value
    micros x duration micros summed in unbounded ints) on sf0.001."""
    t = _small_tables(spark)
    got = {
        r.event_type: (
            r.twap_micros,
            r.total_duration_us,
            r.n_segments,
        )
        for r in A.twap_by_type(t).collect()
    }

    from decimal import Decimal

    events = sorted(
        (
            (r.event_type, r.ts, r.event_id, r.value)
            for r in t["events"]
            .select("event_type", "ts", "event_id", "value")
            .collect()
        ),
        key=lambda x: (x[0], x[1], x[2]),
    )
    by_type: dict[str, list] = {}
    for et, ts, eid, val in events:
        by_type.setdefault(et, []).append((ts, eid, val))
    for et, seq in by_type.items():
        num = 0
        den = 0
        n = 0
        for (ts, _, val), (nts, _, _) in zip(seq, seq[1:]):
            v_us = int(
                (Decimal(repr(val)).quantize(Decimal("0.000001")))
                * 1_000_000
            )
            dur = int((nts - ts) / timedelta(microseconds=1))
            num += v_us * dur
            den += dur
            n += 1
        want_twap = round(float(num) / float(den), 6)
        assert got[et][1] == den and got[et][2] == n
        assert abs(got[et][0] - want_twap) < 1e-6, (et, got[et][0], want_twap)


def test_rolling_features_match_pandas(spark):
    """Rolling mean / lag / gap features must equal pandas rolling on
    the same ordering (ts, event_id) at sf0.001."""
    import pandas as pd

    t = _small_tables(spark)
    got = A.rolling_user_features(t).toPandas()

    raw = (
        t["events"]
        .select("user_id", "event_id", "ts", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )
    for uid, g in raw.groupby("user_id"):
        mine = got[got.user_id == uid].sort_values("seq").reset_index(drop=True)
        assert list(mine.event_id) == list(g.event_id)
        roll = g.value.rolling(5, min_periods=1).mean().round(9)
        assert (
            (mine.roll_mean_value - roll.reset_index(drop=True)).abs() < 1e-8
        ).all()
        prev = g.value.shift(1).reset_index(drop=True)
        assert (
            mine.prev_value.fillna(-1).reset_index(drop=True)
            == prev.fillna(-1)
        ).all()
        gaps = (
            (g.ts - g.ts.shift(1)).dt.total_seconds() * 1_000_000
        ).reset_index(drop=True)
        mine_gaps = mine.us_since_prev.astype("float64")
        assert (
            (mine_gaps.fillna(-1) - gaps.fillna(-1)).abs() < 0.5
        ).all()


def test_salted_join_equals_plain_and_salts_shuffle(spark):
    """Salting must not change the answer (equality vs the plain
    join+agg) and MUST change the shuffle: the join's hash
    partitioning carries the salt column."""
    from parquet_export_spark.plans import inspect as P

    t = _small_tables(spark)
    got = {
        r.c_mktsegment: (r.n_events, r.total_value)
        for r in SC.salted_skew_join(t).collect()
    }
    plain = (
        t["events"]
        .join(
            t["customer"],
            t["events"].user_id == t["customer"].c_custkey,
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(30,6)"))
            .cast("double")
            .alias("v"),
        )
    )
    want = {r.c_mktsegment: (r.n, r.v) for r in plain.collect()}
    assert got == want

    plan = P.plan_string(SC.salted_skew_join(t))
    import re

    salted_exchanges = [
        m.group(1)
        for m in re.finditer(r"hashpartitioning\(([^)]*)\)", plan)
        if "_salt" in m.group(1)
    ]
    assert salted_exchanges, plan[:1500]


def test_curate_pipeline_equals_stage_intersection(spark):
    """The composed pipeline's survivor set must be EXACTLY the
    intersection of its stages run as standalone operators: dedup
    keepers ∩ quality survivors ∩ decontamination survivors (same
    eval slice), with shard positions forming dense ranks per shard
    over the final set — stage-boundary bugs (wrong order, rank over
    the wrong set) break one of these."""
    from parquet_export_spark.operators import curation as CU
    from parquet_export_spark.operators import dedup as D

    t = _small_tables(spark)
    got = {
        r.doc_id: (r.shard, r.shard_pos)
        for r in CU.curate_corpus_pipeline(t).collect()
    }

    keepers = {
        r.doc_id
        for r in D.dedup_exact_keep_first(t).collect()
    }
    quality = {r.doc_id for r in CU.corpus_quality_filter(t).collect()}
    decontam = {r.doc_id for r in CU.decontaminate_train(t).collect()}
    want_ids = keepers & quality & decontam
    assert set(got) == want_ids
    assert want_ids, "pipeline must keep something at sf0.001"

    # dense, hash-ordered positions per shard over the final set
    import hashlib

    by_shard: dict[int, list] = {}
    for d in want_ids:
        h = hashlib.md5(str(d).encode()).hexdigest()
        by_shard.setdefault("0123456789abcdef".index(h[0]), []).append((h, d))
    for shard, members in by_shard.items():
        members.sort()
        for pos, (_, d) in enumerate(members, start=1):
            assert got[d] == (shard, pos), (d, got[d], (shard, pos))


def test_balance_classes_contract(spark):
    """Every label capped at exactly the minority size; kept rows are
    the md5-first members of each class; the pick is rerun-stable."""
    from parquet_export_spark.operators import curation as CU

    t = _small_tables(spark)
    got = [
        (r.vec_id, r.label, r.pick_order)
        for r in CU.balance_classes(t).collect()
    ]
    import hashlib
    from collections import Counter

    labels = [
        (r.vec_id, r.label)
        for r in t["embeddings"].select("vec_id", "label").collect()
    ]
    counts = Counter(l for _, l in labels)
    mn = min(counts.values())
    per_label = Counter(l for _, l, _ in got)
    assert all(v == mn for v in per_label.values())
    assert set(per_label) == set(counts)
    # md5-first membership
    for label in counts:
        members = sorted(
            (hashlib.md5(str(v).encode()).hexdigest(), v)
            for v, l in labels
            if l == label
        )
        want = [v for _, v in members[:mn]]
        mine = [v for v, l, _ in got if l == label]
        assert mine == want
    # rerun-stable
    again = [
        (r.vec_id, r.label, r.pick_order)
        for r in CU.balance_classes(t).collect()
    ]
    assert again == got


def test_remove_dup_spans_engineered(spark, sf_dir, tmp_path):
    """Detect->act contract on engineered docs: the shared 10-gram
    region disappears from both carriers (and exactly that region),
    an untouched doc passes through verbatim, and a fully-shared doc
    empties. Also run as a full oracle differential."""
    from parquet_export_spark.operators import dedup as D

    shared = " ".join(f"s{i}" for i in range(12))  # 12 shared words
    docs = [
        (1, f"alpha beta {shared} gamma delta", "en", "web"),
        (2, f"one two three {shared} four", "en", "web"),
        (3, "totally unique words nobody else ever wrote here at all",
         "en", "web"),
        (4, shared, "en", "web"),
        (5, shared, "en", "web"),
    ]
    df = spark.createDataFrame(
        [(i, t_, l, s_, len(t_)) for i, t_, l, s_ in docs],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    fixture_dir = fixture_lake(
        spark, sf_dir, str(tmp_path / "spanrm"), {"documents": df}
    )
    spec = REGISTRY["remove_dup_spans"]
    ok, msg = compare(spark, fixture_dir, spec.fn, spec.oracle)
    assert ok, msg

    got = {
        r.doc_id: (r.n_words, r.n_kept, r.cleaned_text)
        for r in D.remove_dup_spans(load_tables(spark, fixture_dir)).collect()
    }
    # doc 1: 2 + 12 + 2 words; the span covers the 12 shared words
    assert got[1] == (16, 4, "alpha beta gamma delta")
    assert got[2] == (16, 4, "one two three four")
    assert got[3][1] == got[3][0] and got[3][2].startswith("totally unique")
    assert got[4] == (12, 0, "") and got[5] == (12, 0, "")


def test_self_retrieval_ranks_brute_force(spark, sf_dir, tmp_path):
    """Self-retrieval ranks must equal a Python brute-force over the
    same integer overlap scoring at sf0.001, and an engineered
    exact-duplicate probe must rank BELOW its smaller-id twin (the
    tie-break making rr=0.5 — the metric detecting duplicated
    content)."""
    from parquet_export_spark.operators import text as X

    t = _small_tables(spark)
    got = {
        r.query_id: (r.self_rank, r.n_query_terms_hit)
        for r in X.self_retrieval_ranks(t).collect()
    }
    docs = {
        r.doc_id: r.text.split(" ")
        for r in t["documents"].select("doc_id", "text").collect()
    }
    term_sets = {d: set(ws) for d, ws in docs.items()}
    for qid in docs:
        if qid % X.RETRIEVAL_QUERY_MOD != 0:
            continue
        qterms = set(docs[qid][: X.RETRIEVAL_QUERY_TERMS])
        scored = sorted(
            (
                (-len(qterms & ts), d)
                for d, ts in term_sets.items()
                if qterms & ts
            )
        )
        rank = [d for _, d in scored].index(qid) + 1
        assert got[qid] == (rank, len(qterms & term_sets[qid])), qid

    # engineered: probe 100 duplicates doc 7 exactly -> rank 2
    base = "unique retrieval words nobody else uses here today ok fine"
    other = "completely different vocabulary for the second document x"
    df = spark.createDataFrame(
        [
            (7, base, "en", "web", len(base)),
            (100, base, "en", "web", len(base)),
            (3, other, "en", "web", len(other)),
            (150, other, "en", "web", len(other)),
        ],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    fixture_dir = fixture_lake(
        spark, sf_dir, str(tmp_path / "sr"), {"documents": df}
    )
    spec = REGISTRY["self_retrieval_ranks"]
    ok, msg = compare(spark, fixture_dir, spec.fn, spec.oracle)
    assert ok, msg
    got2 = {
        r.query_id: (r.self_rank, r.reciprocal_rank)
        for r in X.self_retrieval_ranks(
            load_tables(spark, fixture_dir)
        ).collect()
    }
    assert got2[100] == (2, 0.5)  # its twin doc 7 outranks it
    assert got2[150] == (2, 0.5)


def test_simjoin_prefix_brute_force(spark):
    """simjoin_prefix vs a Python brute-force all-pairs scan over an
    engineered corpus: template docs with small edits (pairs that must
    match at J >= 4/5), unrelated docs (must not), a doc pair whose
    Jaccard is EXACTLY 4/5 (boundary kept), and short docs (< 3 words
    -> single whole-doc shingle). Independent reference: set algebra
    in Python over string shingles — no Spark, no DuckDB, no prefix
    filter."""
    from parquet_export_spark.operators import dedup as D

    base = "the quick brown fox jumps over the lazy dog again and again"
    texts = {
        1: base,
        2: base,                                   # exact dup of 1
        3: base + " tail",                         # near dup of 1/2
        4: "completely different words appear in this one here",
        5: "completely different words appear in this one there",
        6: "a b",                                  # < 3 words
        7: "a b",                                  # exact short dup
        # exactly J = 4/5: shingle sets sized 8 vs 10 sharing 8
        8: "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10",
        9: "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12",
    }

    def shingles(s):
        ws = s.split(" ")
        n = max(len(ws) - 2, 1)
        return {" ".join(ws[i : i + 3]) for i in range(n)}

    expect = {}
    ids = sorted(texts)
    for i in ids:
        for j in ids:
            if i < j:
                a, b = shingles(texts[i]), shingles(texts[j])
                inter, union = len(a & b), len(a | b)
                if 5 * inter >= 4 * union:
                    expect[(i, j)] = (inter, union)
    # the fixture exercises all four designed cases
    assert (1, 2) in expect and (6, 7) in expect
    assert (8, 9) in expect and expect[(8, 9)][0] * 5 == expect[(8, 9)][1] * 4
    assert (4, 5) not in expect  # one word flips 3 trailing shingles

    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): (r.inter_n, r.union_n)
        for r in D.simjoin_prefix({"documents": docs}).collect()
    }
    assert got == expect


def test_cusum_closed_form_matches_textbook_recursion(spark):
    """cusum_alarms' windowed closed form
    (s_i = P_i - min(0, min_{k<=i} P_k)) vs the textbook sequential
    recursion (s_i = max(0, s_{i-1} + y_i)) run in plain Python over
    an engineered series: a below-drift stretch where the raw prefix
    sum goes NEGATIVE but CUSUM must clamp at zero (the max(0, .)
    part a plain cumulative sum gets wrong), then a level shift that
    must alarm."""
    from datetime import datetime, timedelta

    from parquet_export_spark.operators import stats as ST

    # values in dollars; drift d derives from the per-type mean
    vals = [10.0] * 20 + [200.0] * 10 + [1.0] * 20
    t0 = datetime(2024, 1, 1)
    rows = [
        (i, t0 + timedelta(minutes=i), 1, "shift", v, "{}")
        for i, v in enumerate(vals)
    ]
    e = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string",
    )
    h = 50_000  # cents
    got = ST.cusum_alarms({"events": e}, h=h).collect()[0]

    cents = [int(v * 100 + 0.5) for v in vals]
    c = sum(cents) // len(cents)
    d = c - c // 10
    s, path = 0, []
    for x in cents:
        s = max(0, s + (x - d))
        path.append(s)
    alarms = [i for i, v in enumerate(path) if v >= h]
    # the clamp is live: during the below-drift stretch the RAW
    # prefix sum is negative while CUSUM sits exactly at zero
    raw19 = sum(x - d for x in cents[:20])
    assert raw19 < 0 and path[19] == 0
    assert alarms  # the level shift actually alarmed
    assert got.n_events == len(vals)
    assert got.max_cusum == max(path)
    assert got.n_alarms == len(alarms)
    assert got.first_alarm_event_id == alarms[0]


def test_assoc_rules_brute_force(spark):
    """assoc_rules_parts vs a plain-Python Apriori-style scan over
    engineered baskets: known co-occurrence counts, both rule
    directions with ASYMMETRIC confidences, a pair below min_support
    that must be absent, and integer ppm arithmetic."""
    from parquet_export_spark.operators import advanced as A

    baskets = {
        1: [10, 20, 30],
        2: [10, 20],
        3: [10, 20],
        4: [10, 30],
        5: [40, 50],   # co-occurs once -> below min_support
        6: [10],
        7: [20, 30],
    }
    rows = [
        (ok * 100 + i, ok, p)
        for ok, ps in baskets.items()
        for i, p in enumerate(ps)
    ]
    li = spark.createDataFrame(
        rows, "l_linenumber long, l_orderkey long, l_partkey long"
    )
    got = {
        (r.antecedent, r.consequent): (r.support, r.conf_ppm, r.lift_ppm)
        for r in A.assoc_rules_parts({"lineitem": li}).collect()
    }

    from collections import Counter
    from itertools import combinations

    item = Counter(p for ps in baskets.values() for p in set(ps))
    pair = Counter(
        c for ps in baskets.values() for c in combinations(sorted(set(ps)), 2)
    )
    n = len(baskets)
    expect = {}
    for (a, b), s in pair.items():
        if s >= 2:
            for x, y in ((a, b), (b, a)):
                expect[(x, y)] = (
                    s,
                    1_000_000 * s // item[x],
                    1_000_000 * s * n // (item[x] * item[y]),
                )
    assert (40, 50) not in got and (50, 40) not in got
    # asymmetry is actually exercised: conf(30->10) != conf(10->30)
    assert expect[(30, 10)][1] != expect[(10, 30)][1]
    assert got == expect
