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
