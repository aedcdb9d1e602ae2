"""The triple-SF oracle sweep, codified as a harness gate (round-6
verdict #5).

Why three scale factors: the decile_features_events incident — an
interpolated-percentile oracle agreed with DuckDB at sf0.001 AND
sf0.01 and diverged only at sf0.1, where a data value finally landed
within one ulp of an engine-divergent interpolated boundary
(pitfall 17). Two SFs are demonstrably not enough for value-sensitive
operators, and builder discipline alone is exactly what lapses under
deadline pressure — so the sweep is a TEST: every registry oracle
marked new-or-changed this round runs through the driver-style
compare at sf0.001, sf0.01 and sf0.1 on every pytest pass.

Maintenance contract (part of the new-operator checklist): when a
round adds or semantically changes an oracle-bearing registry entry,
its name goes into ROUND_CHANGED below; at the next round's rotation
the previous round's names are cleared (their verdicts take over).
The companion invariant test keeps the list honest against the
registry. sf0.1 legs skip cleanly where that data is absent (CI
without the big fixture), mirroring the harness's other sf-gated
suites.
"""

from __future__ import annotations

import os

import pytest

from parquet_export_spark.queries import REGISTRY
from tests.oracle_harness import compare

#: registry entries whose Spark plan or oracle text is new or changed
#: in the CURRENT round — each swept at all three SFs every pytest run.
ROUND_CHANGED = [
    # round 14: populated as this round's work lands. Every entry added
    # below is triple-SF-swept on each pytest run.
    #
    # r13 verdict #1: label_pca's group cap moved BEFORE the
    # grouped-map shuffle (row_number window + filter upstream of
    # FlatMapGroupsInPandas; n_vectors from a separate count join) —
    # a PLAN change, oracle unchanged:
    "label_pca",
    # r13 advice (medium): the twin's slice spine now drawn from ALL
    # embeddings (the oracle's population), cell-dependent contracts
    # vacuously TRUE for slice vectors in over-cap cells:
    "semdedup_embedding",
    # r13 verdict #3: the hot-group fix implemented — exact
    # (micro-value, count) pre-aggregation before the UDAF, Gini over
    # run-lengths (support-bounded kernel input, identical ppb):
    "value_gini_by_type",
    # r13 verdict #4: n_buckets derived from a bounded count action
    # (ceil(relevant/100k), parallelism floor) instead of fixed 64;
    # output invariant under bucketing, oracle unchanged:
    "cogroup_user_funnel",
    # r13 advice: the exact-max_iter convergence boundary in the CC
    # loop no longer raises a false positive (one extra no-change
    # probe before the require_converged RuntimeError):
    "fuzzy_dedup_keep",
    # r14 perf: the twin's half-table pass now encodes against the
    # learned table's first-half SLICE instead of re-running the
    # iterative learner at n/2 (licensed by the pytest-pinned
    # prefix-stability property; 15.0 s -> 10.3 s at sf0.1). Plan
    # change on the registered twin; already holds window slot 2:
    "bpe_encode_corpus",
    # r14 perf: the twin's two n_queries*k-row input frames are
    # localCheckpointed — each fed 2-3 plan branches, so every
    # consumer re-ran the full corpus ADC/top-k kernels (12
    # ArrowEvalPython nodes / 20 parquet scans -> 0 downstream).
    # Plan change; already holds window slot 1:
    "pq_topk",
    # r14 perf, same class, found by the registry-wide plan-node
    # audit: the ann twin's slice frame fed both self-join sides
    # (14 kernel nodes -> 10), and the minhash twin's joined pair
    # frame fed the recall aggregate AND the final select — each
    # branch re-ran BOTH corpus pipelines (19 parquet scans -> 0
    # downstream). Both checkpoint a bounded frame; plan changes on
    # non-window entries, so both enter PENDING_VERDICT (r15 window
    # priority):
    "ann_lsh_neighbors",
    "neardup_minhash_lsh",
    # r14 optimization phase, guide §2.4 (remove passes): the removal-
    # attribution channel list now derives from the checkpointed trans
    # frame (its i-values are {__start__} ∪ channels by the journey
    # grammar) instead of a second user-window fact pass, and the tiny
    # conv frame is checkpointed so its two consumer branches stop
    # re-running the n_iter sweep chain. Plan change, oracle unchanged:
    "markov_removal_attribution",
    # r14 optimization phase, same class: states checkpointed (fed r0
    # AND the final join — two corpus-wide distincts), out_transitions
    # re-read from the checkpointed trans instead of re-running the
    # lead-window fact pass behind rowtot. Plan change, oracle
    # unchanged:
    "markov_stationary_types",
    # r14 optimization phase, guide §2.3 (shuffle fewer bytes): the
    # _cc_doubling_core hop and the _sssp_core relaxation switched from
    # union-then-aggregate to aggregate-then-join — only the neighbor
    # min-aggregate exchanges per round; identical values (min over
    # {l(n)} ∪ {l(m)} == least(l, min_m l(m)), left/full join per
    # frontier semantics). A/B'd twice: graph_all_metrics (the two
    # cores run concurrently there) 12.2-13.3 s -> 8.1-8.5 s at sf0.1;
    # solo gears band-flat. _cc_minlabel_core deliberately KEPT on the
    # union shape (solo A/B regressed 4.4 -> 5.0-5.7 s), so
    # cc_trade_graph is NOT plan-changed. Changed entries — every
    # registry consumer of the two cores:
    "cc_doubling_trade_graph",
    "sssp_trade_graph",
    "graph_all_metrics",
    "supplier_communities",
    "supplier_communities_approx",
    "community_modularity_suppliers",
    "supplier_graph_suite",
    "cc_incremental_trade",
    # r14 optimization phase, guide §2.4 (remove passes): the k-truss
    # adaptive peel now carries each round's per-edge supports on the
    # checkpointed surviving set; at the fixpoint those ARE the final
    # values (set-equality), so the post-loop support re-derivation —
    # a full extra wedge join + expansion aggregate — runs only on the
    # round-cap path. Plan change, oracle unchanged (the unrolled
    # replay is hash-identical by the same monotonicity):
    "ktruss_suppliers",
    # r14 optimization phase, guide §2.3: the link-prediction wedge
    # pipeline attaches deg_z to the node-sized b side before the
    # explosion (was: a wedge-row probe join) and anti-joins adjacency
    # AFTER the (s1, s2) aggregate (the anti key IS the group key, so
    # filtering groups == filtering rows). 12 exchanges -> 10, the
    # removed pair wedge-sized. Values identical; unfrozen to change:
    "link_prediction_suppliers",
    # r14 session-1 bookkeeping GAP, repaired by session 4:
    # kcore_suppliers' plan changed in commit 4388379 (the 1-row
    # degree-quantile threshold became a localCheckpoint instead of
    # re-running the degree aggregate + percentile inside every peel
    # round's alive filter) but the entry never entered this list. It
    # rides the sweep now and sits in PENDING_VERDICT(14). (Session
    # 4's projection-builder rewrite — _supplier_pair_weights' single
    # c-clustered exchange — changes NO registered plan: every
    # projected-graph entry probes the per-lake checkpointed artifact
    # via _graph_probe, so the builder is upstream of every plan; its
    # output is xxhash64-identical and the consumers were spot-swept
    # once, not booked.)
    "kcore_suppliers",
    # r14 optimization phase, session 5, guide §2.4 (remove redundant
    # passes): the twin signs the corpus ONCE into a localCheckpointed
    # (doc_id, sig) frame; the batch signatures, the lake artifact and
    # the from-scratch reference are all filter slices of it (pure
    # per-document hashing makes slice == re-sign). The old plan
    # re-instantiated the signing subtree per consumer branch — 40
    # parquet scans / ~15 signing expressions / 76 exchanges at sf0.1
    # -> 8 / 0 / 52 plus one signing job at the checkpoint. Plan
    # change, oracle unchanged:
    "neardup_incremental",
]

#: Previous round's list (r13), kept for the PENDING-tier bookkeeping in
#: tests/test_freshness.py. Deduplicated AT DEFINITION via dict.fromkeys
#: (r10 advice: a doubled name re-runs sweep legs for nothing and
#: corrupts bookkeeping counts) — the companion invariant test enforces
#: no-duplicates on both lists every run.
PREV_ROUND_CHANGED = list(dict.fromkeys([
    # r12-verdict #1/#3/#4 work, all r13-verdicted green:
    "neardup_simhash", "ann_lsh_neighbors", "semdedup_embedding",
    "label_pca",
    # post-r13-window oracle births — r13 triple-SF-swept, r14 window
    # priority slots (their first post-oracle verdicts land now):
    "pq_topk", "bpe_encode_corpus",
]))

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def test_round_changed_names_are_registered_oracles():
    """The list must track real, oracle-bearing registry entries —
    a renamed operator cannot silently drop out of the sweep — and
    carry no duplicates (r9 advice: a doubled name re-runs its three
    sweep legs for nothing and inflates the pass count)."""
    assert len(ROUND_CHANGED) == len(set(ROUND_CHANGED)), sorted(
        n for n in set(ROUND_CHANGED) if ROUND_CHANGED.count(n) > 1
    )
    for name in ROUND_CHANGED:
        assert name in REGISTRY, name
        assert REGISTRY[name].oracle, f"{name} is rows-only"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("name", ROUND_CHANGED)
def test_changed_oracle_sweeps_all_sfs(spark, name, sf_dir):
    if not os.path.isdir(sf_dir):
        pytest.skip(f"{sf_dir} absent")
    spec = REGISTRY[name]
    ok, msg = compare(spark, sf_dir, spec.fn, spec.oracle)
    assert ok, f"{name} @ {sf_dir}: {msg}"
