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
    # round 12: populated as this round's work lands. Every entry added
    # below is triple-SF-swept on each pytest run.
    #
    # r11 verdict #3: the k-truss peel now exits at the detected
    # fixpoint instead of running all 6 capped rounds — a PLAN change
    # (same result by peel monotonicity; the oracle still replays the
    # full cap). Also holds an r12 first-verdict window slot, so the
    # verdict lands post-change as the rotation rule requires:
    "ktruss_suppliers",
    # rows-only gears converted to _checked twins with oracles (r11
    # verdict #4) — new oracle text + output shape; all three also
    # hold r12 window slots:
    "neardup_minhash_lsh",
    "neardup_simhash",
    "sample_fraction",
    # left the rows-only tier with a FULL-replay oracle (no twin
    # needed — the pipeline was already deterministic): unrolled
    # min-label CC over the exact blocked-Jaccard pair graph. Born
    # after the r12 window was finalized, so it rides the sweep now
    # and takes window priority in r13:
    "neardup_clusters",
    # checked-twin conversion of the composed fuzzy-dedup pipeline
    # (keep/drop contract in-plan over the md5 group spine); same
    # post-window-finalization timing — sweeps now, r13 window slot:
    "fuzzy_dedup_keep",
]

#: Previous round's list (r11), kept for the PENDING-tier bookkeeping in
#: tests/test_freshness.py. Deduplicated AT DEFINITION via dict.fromkeys
#: (r10 advice: a doubled name re-runs sweep legs for nothing and
#: corrupts bookkeeping counts) — the companion invariant test enforces
#: no-duplicates on both lists every run.
PREV_ROUND_CHANGED = list(dict.fromkeys([
    # r10-verdict twin conversions + the bucket-spine fix (all
    # verdicted green in r11):
    "neardup_incremental", "supplier_communities_approx",
    "ivf_probe_incremental", "pq_probe_incremental",
    "histogram_equidepth_approx",
    # early-r11 new-operator batch (verdicted green in r11):
    "changepoint_scan_daily", "weighted_median_price_by_segment",
    "wow_mix_rate_decomposition", "share_of_parent_rollup",
    "clamped_running_balance", "prorate_discount_cents",
    "markov_removal_attribution", "interval_overlap_join",
    "key_skew_report", "ann_lsh_buckets",
    "welch_ttest_pairs", "anova_oneway_types",
    # late-r11 classical-stats/graph batch (r12 window slots — their
    # first verdicts land this round):
    "hellinger_pairs", "jensen_shannon_pairs", "cohens_d_pairs",
    "grubbs_test_daily", "nelson_aalen_interorder",
    "logrank_test_segments", "ols_discount_qty_by_brand",
    "decision_stump_purchase", "rich_club_suppliers",
    "transition_entropy_types", "kruskal_wallis_types",
    "permutation_entropy_daily", "brown_forsythe_types",
    "goertzel_weekly_power", "cochran_armitage_trend",
    "variance_ratio_daily", "mcnemar_weekly_conversion",
    "mantel_haenszel_click_purchase", "friedman_types_weekly",
    "uncertainty_coeff_type_decile", "ktruss_suppliers",
    "holt_winters_weekly",
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
