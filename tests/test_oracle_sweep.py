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
    # round 9, changed (the round-7 block cleared at this rotation —
    # all 35 of its oracle entries hold r9 verdict-window slots):
    "ks_distance_pairs",  # loud in-plan ppm overflow guard (raise_error tier)
    "wasserstein_distance_pairs",  # loud range-aware overflow guard
    "fano_burstiness",  # loud overflow guard + corrected ansi claim
    "apdex_by_type",  # ppm expression hoisted to shared APDEX_PPM_EXPR
    # round 9: the projected-graph singles now PROBE the per-lake
    # projection artifact instead of re-deriving it per call
    # (supplier_communities_approx changed too, but is rows-only):
    "supplier_communities",
    "triangle_count_suppliers",
    "clustering_coeff_suppliers",
    "community_modularity_suppliers",
    "degree_distribution_suppliers",
    "link_prediction_suppliers",
    "kcore_suppliers",
    "supplier_graph_suite",
    "lpa_communities_suppliers",
    # round 9: the trade-graph family now probes the per-lake edge
    # artifact (trade_edges_artifact) instead of re-joining
    # orders |><| lineitem per call:
    "pagerank_trade_graph",
    "cc_trade_graph",
    "cc_doubling_trade_graph",
    "sssp_trade_graph",
    "graph_all_metrics",
    "hits_trade_graph",
    "random_walks_suppliers",
    "assortativity_trade_graph",
    # round 9, new:
    "tv_distance_pairs",
    "markov_stationary_types",
    "zipf_slope_unigrams",
    "lorenz_curve_deciles",
    "session_duration_histogram",
    "dup_rate_by_source",
    "cross_source_overlap",
    "cc_incremental_trade",  # probes the stored lake-label artifact
    "butterfly_pairs_trade",  # probes the stored trade-edge artifact
    "dau_mau_stickiness",
    "new_returning_weekly",
    "cramers_v_type_decile",
    "kaplan_meier_interorder",
    "atkinson_index_by_segment",
    "spearman_corr_by_flag",
    "churn_retention_monthly",
    "session_concurrency_hourly",
    "readability_scores",
    "mann_whitney_auc_pairs",
    "weekly_mix_drift",
    "forecast_backtest_mase",
    # round 9: the four session consumers now PROBE the per-lake
    # sessions_artifact instead of re-paying the sessionization
    # windows per call (entry/exit moved from double row_number to
    # min_by/max_by inside the artifact aggregate):
    "sessionize_batch",
    "session_entry_exit",
    "session_duration_histogram",
    "session_concurrency_hourly",
    "textrank_keywords",
    "quantile_transform_values",
    "lift_curve_clicks_to_purchase",
    "roc_auc_clicks_to_purchase",
    "quantile_transform_incremental",
    "hourly_value_percentiles",
    "seasonal_hour_baseline_loo",
    "harmonic_closeness_suppliers",
    # refactored onto the shared _type_decile_cells core /
    # TYPE_DECILE_CELLS_CTES_SQL constant (same expressions; re-swept
    # because the oracle text moved):
    "chi2_type_decile",
]

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def test_round_changed_names_are_registered_oracles():
    """The list must track real, oracle-bearing registry entries —
    a renamed operator cannot silently drop out of the sweep."""
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
