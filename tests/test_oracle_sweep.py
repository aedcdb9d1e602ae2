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
    # round 11: populated as this round's work lands. Every entry added
    # below is triple-SF-swept on each pytest run and front-loaded for
    # the r12 verdict window.
    #
    # rows-only gears converted to _checked twins with oracles (r10
    # verdict #4/#5) — new oracle text + output shape; all four also
    # hold r11 window slots:
    "neardup_incremental",
    "supplier_communities_approx",
    "ivf_probe_incremental",
    "pq_probe_incremental",
    # r10 advice: the checked twin now left-joins a 1..K bucket spine
    # so duplicate sketch boundaries can never drop an oracle row —
    # plan change, so the full triple-SF sweep applies (the entry also
    # holds an r11 first-verdict window slot):
    "histogram_equidepth_approx",
    # round-11 new-operator batch (exact-lane analytics):
    "changepoint_scan_daily",
    "weighted_median_price_by_segment",
    "wow_mix_rate_decomposition",
    "share_of_parent_rollup",
    "clamped_running_balance",
    "prorate_discount_cents",
    "markov_removal_attribution",
    "interval_overlap_join",
    "key_skew_report",
    # rows-only gear converted in r11: the LSH bucket ids are
    # bit-identical cross-engine (plan-literal planes, ordered fold),
    # so the gear now carries a verbatim DuckDB replay oracle:
    "ann_lsh_buckets",
    # classical mean-comparison members (exact-moment collapse, raw
    # IEEE statistic lanes):
    "welch_ttest_pairs",
    "anova_oneway_types",
    # pmf-distance completions of the drift family: Hellinger /
    # Bhattacharyya (RAW-double, sqrt-only chain) and Jensen-Shannon
    # (ROUND(9), libm-ln lane):
    "hellinger_pairs",
    "jensen_shannon_pairs",
    # effect-size + single-point-outlier members of the mean/anomaly
    # families (exact-moment collapses, RAW-double statistic lanes):
    "cohens_d_pairs",
    "grubbs_test_daily",
    # survival-family completions over the KM subjects construction:
    "nelson_aalen_interorder",
    "logrank_test_segments",
    # grouped regression + tree-split primitive (exact moment lanes):
    "ols_discount_qty_by_brand",
    "decision_stump_purchase",
    # graph topology + sequence-information members:
    "rich_club_suppliers",
    "transition_entropy_types",
    # rank-based k-group test + series-complexity members:
    "kruskal_wallis_types",
    "permutation_entropy_daily",
    # variance-homogeneity check + frequency-domain seasonality probe:
    "brown_forsythe_types",
    "goertzel_weekly_power",
    # dose-response funnel member:
    "cochran_armitage_trend",
    # shock-persistence member of the time-series bench:
    "variance_ratio_daily",
    # the PAIRED-sample test member (week-over-week conversion):
    "mcnemar_weekly_conversion",
    # the confounding-control member (stratified pooled odds ratio):
    "mantel_haenszel_click_purchase",
    # the repeated-measures member (weekly blocks):
    "friedman_types_weekly",
    # asymmetric categorical association (third contingency consumer):
    "uncertainty_coeff_type_decile",
    # edge-cohesion graph member (kcore contract on triangle support):
    "ktruss_suppliers",
    # seasonal forecast capstone (one relational fold, list state):
    "holt_winters_weekly",
]

#: Previous round's list (r10), kept for the PENDING-tier bookkeeping in
#: tests/test_freshness.py. Deduplicated AT DEFINITION via dict.fromkeys
#: (r10 advice: a doubled name re-runs sweep legs for nothing and
#: corrupts bookkeeping counts) — the companion invariant test enforces
#: no-duplicates on both lists every run.
PREV_ROUND_CHANGED = list(dict.fromkeys([
    # broadcast-hint scoping family (r10 plan change; q3/q5/q7/q8/q9/
    # q10/q17 verdicted in r10, the rest hold r11 window slots):
    "q2_min_balance_supplier", "q3_shipping_priority",
    "q5_revenue_by_nation", "q7_nation_pair_volume", "q8_market_share",
    "q9_product_profit", "q10_returned_items", "q14_promo_revenue_share",
    "q15_top_supplier", "q16_supplier_counts",
    "q17_small_quantity_revenue", "q18_large_orders_having",
    "q19_disjunctive_predicates", "q20_heavy_suppliers",
    "q21_exclusive_return_suppliers", "join_range",
    # sketch-twin conversions + r10-born operators (all hold r11
    # window slots):
    "agg_approx_distinct", "approx_percentiles",
    "histogram_equidepth_approx", "hll_rollup_users",
    "harmonic_closeness_exact2_suppliers", "kendall_tau_qty_discount",
    "mann_kendall_trend_daily", "leadlag_corr_types",
    "wow_audience_overlap", "conversion_ztest_by_click_tier",
    "theil_sen_slope_daily", "runs_test_daily",
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
