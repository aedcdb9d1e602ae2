"""Regenerate PLANS.md: physical-plan evidence for headline queries.

Usage: ``python -m parquet_export_spark.plans [out_path]``

Documents, for each representative query, the plan properties the
100 TB design depends on (pushed filters, pruned read schemas,
broadcast joins, shuffle count) plus the formatted physical plan.
Run after any plan-affecting change; tests/test_plans.py pins the same
properties as assertions.
"""

from __future__ import annotations

import sys

from parquet_export_spark.plans import inspect as P
from parquet_export_spark.queries import REGISTRY
from parquet_export_spark.session import get_spark

#: One per plan family: scan+agg, broadcast star join, pushdown-only,
#: blocked self-join, band-bucket join, digest dedup, vector math,
#: HOF-projection pipeline.
SHOWCASE = [
    "q5_revenue_by_nation",
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "neardup_jaccard_blocked",
    "neardup_minhash_lsh",
    "dedup_exact",
    "dedup_exact_keep_first",
    "cosine_topk",
    "neardup_embedding",
    "winnowing_fingerprints",
    # round-3 additions: distributed prefix sum, shingle semi/anti join,
    # two-pass frequency join, cohort matrix, Arrow kernel pipeline
    "pack_sequences",
    "decontaminate_train",
    "unigram_freq_quality",
    "retention_cohorts",
    "pgm_image_features",
    # exchange-reused gram pipeline, lead-window sequence aggregate
    "dup_spans",
    "event_transition_matrix",
    # round-4 additions: corpus-LM explode+count+join shape, pure
    # regex scan pipeline, TakeOrdered + bounded window, lag-window
    # dataset construction
    "bigram_lm_scores",
    "pii_scan",
    "vocab_coverage",
    "next_event_examples",
    # round-4b additions: no-window OHLC aggregate, JVM sliding-window
    # fan-out, single full-outer CDC diff, MV partial-merge,
    # broadcast-bounds clip, cogrouped pandas kernel
    "event_ohlc",
    "sliding_rollup",
    "snapshot_diff",
    "incremental_rollup",
    "winsorize_values",
    "cogroup_user_funnel",
    # round-4c additions: persisted-edge iterative join (no
    # per-iteration edge exchange), blocked+banded Levenshtein join,
    # union-then-carry-forward PIT, full-outer CDC apply, unioned
    # constraint aggregates, digest-only incremental dedup
    "pagerank_trade_graph",
    "fuzzy_join_parts",
    "scd2_point_in_time",
    "apply_changefeed",
    "validate_lake",
    "dedup_incremental",
    "ols_value_by_hour",
    # round-5 additions: pointer-doubling CC (hop + node-sized jump
    # self-join per round), artifact-backed incremental near-dup
    # (batch-only signing), spine-window interpolation, tie-broken
    # ntile histogram, broadcast median/MAD scan
    "cc_doubling_trade_graph",
    "neardup_incremental",
    "interpolate_hourly_values",
    "histogram_equidepth",
    "value_mad_outliers",
    # round-5 batch 2: salted (key,salt) exchange, one-dot-per-pair
    # broadcast kNN, lead-window integral, end-to-end curation chain
    "salted_skew_join",
    "knn_classify",
    "twap_by_type",
    "curate_corpus_pipeline",
    # round-5 batch 3: df-ordered prefix-filter similarity join (one
    # shared tokenize exchange, no cartesian), closed-form CUSUM
    # double-window, degree-oriented wedge-closing triangle joins
    "simjoin_prefix",
    "cusum_alarms",
    "triangle_count_suppliers",
    # round-5 batch 4: shrinking-edge peel loop, checkpoint-per-round
    # normalized HITS, composed three-core projection suite
    "kcore_suppliers",
    "hits_trade_graph",
    "supplier_graph_suite",
    # round-6: sketch-boundary histogram (no ntile/Window — contrast
    # with histogram_equidepth above), one-sided prefix-filter
    # containment join, lossless band-join perceptual-hash dedup,
    # pre-aggregated skyline window, K-lag integer EWMA
    "histogram_equidepth_approx",
    "containment_join",
    "phash_pgm_dedup",
    "pareto_frontier_orders",
    "ewma_halflife_values",
    # round-7: rank-based robust scaling (boundary window over the
    # cents support, never fact rows), single-window multi-lag
    # autocorrelation over the dense hourly spine, union-then-carry
    # nearest temporal join (one user exchange, no range join),
    # TakeOrdered-pruned path mining
    "robust_scale_features",
    "autocorr_hourly_counts",
    "nearest_event_join",
    "user_path_topk",
    # round-7 batch 3: neighbor-keyed wedge join + anti-join +
    # TakeOrdered link scoring, one-scan RFM with boundary window
    # over the metric support, typed-pruned-band attribution join,
    # windowless/spineless dispersion aggregate
    "link_prediction_suppliers",
    "rfm_segments",
    "multitouch_attribution",
    "fano_burstiness",
    # round-7 batch 4/5: support-bounded W1 integral, HOF-folded
    # integer recurrence (no fact window), per-period boundary reuse,
    # dense-spine peak window
    "wasserstein_distance_pairs",
    "holt_linear_forecast",
    "value_migration_matrix",
    "local_peaks_hourly",
    # round-7 final batch: islands window over user-days, one
    # distinct-collapse contingency join, checkpointed shared gap
    # frame with an order-statistic median
    "user_activity_streaks",
    "odds_ratio_type_pairs",
    "order_cadence_by_customer",
    # round-9 late batch: one-collapse engagement aggregates, the
    # support-window survival curve with its single-array prefix
    # fold, support-rank Spearman (no fact windows), the non-sweep
    # session concurrency explode, and the train-prefix MASE fold
    "dau_mau_stickiness",
    "churn_retention_monthly",
    "kaplan_meier_interorder",
    "spearman_corr_by_flag",
    "session_concurrency_hourly",
    "mann_whitney_auc_pairs",
    "weekly_mix_drift",
    "forecast_backtest_mase",
    "cramers_v_type_decile",
    "atkinson_index_by_segment",
    "readability_scores",
    # round-11 batch: dedup-free grid interval join (one equi-shuffle,
    # checkpointed post-explode stats), two-stacked-window clamped
    # scan (no UDF), channel-vectorized integer fixed-point (nothing
    # fact-sized re-joins), prefix-window change-point profile (no
    # pair join), per-order-partitioned largest-remainder allocation
    "interval_overlap_join",
    "clamped_running_balance",
    "markov_removal_attribution",
    "changepoint_scan_daily",
    "prorate_discount_cents",
    # round-11b: inner common-support pair distance (cheapest member
    # of the drift family — no union, no window), quintile-boundary
    # broadcast stratification (one support cumulative, never a fact
    # window), constant-grid block aggregation (3-horizon fan-out of
    # a calendar-bounded frame), degree-thresholded grid density over
    # existing projected edges
    "hellinger_pairs",
    "mantel_haenszel_click_purchase",
    "variance_ratio_daily",
    "rich_club_suppliers",
    # round-12: the checked twins — certificate plans that join an
    # oracle-replayable ground truth against the approximate gear's
    # own output inside one plan. (neardup_minhash_lsh is already a
    # SHOWCASE member above; its section now shows the twin — blocked
    # exact-Jaccard vs LSH with a broadcast recall constant.)
    # neardup_simhash: key-addressed slice pairs vs the banded gear
    # via one BroadcastNestedLoopJoin — the sanctioned bounded cross
    # join. sample_fraction: md5-prefix membership as a pure pushed
    # filter-projection whose only exchange is the presentation sort.
    "neardup_simhash",
    "sample_fraction",
    # round-13: the two new checked twins. ann_lsh_neighbors: the
    # fold-lane per-table buckets as replayable payload + dual-lane
    # parity + gear membership, all inside one certificate plan
    # (slice all-pairs via the sanctioned BroadcastNestedLoopJoin).
    # semdedup_embedding: quantizer assignment parity against center
    # LITERALS + the keep/drop contract joined from the gear's own
    # assigned/dropped frames. (neardup_simhash's section now shows
    # the r13 cap-aware twin over the Manku block-pair gear.)
    "ann_lsh_neighbors",
    "semdedup_embedding",
    # label_pca twin: the grouped-map eigensolver certified
    # variationally — Var(x . pc1) vs probe literals via one broadcast
    # of the 10-row gear output, trace via posexplode + var_samp.
    "label_pca",
]

HEADER = """\
# PLANS — physical plans of representative queries

Auto-generated (`python -m parquet_export_spark.plans`). The
properties pinned by tests/test_plans.py are visible here:
PushedFilters on every scan, pruned ReadSchema, broadcast dimensions,
minimal shuffle counts. Regenerate after plan-affecting changes.
"""


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "PLANS.md"
    sf_dir = "/root/testdata/sf0.001"
    spark = get_spark(app_name="plans", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    sections = [HEADER]
    for name in SHOWCASE:
        df = REGISTRY[name].fn(spark, sf_dir)
        scans = [sorted(s) for s in P.read_schemas(df)]
        filters = [f for f in P.pushed_filters(df) if f and f != "[]"]
        plan = P.plan_string(df)
        note = ""
        if "Scan ExistingRDD" in plan:
            note = (
                "- note: reads localCheckpointed frame(s) — the upstream "
                "corpus pipeline is materialized ONCE at checkpoint time "
                "(round-14 once-only contract, pinned by "
                "test_certificate_frames_materialize_once); the visible "
                "plan is only the post-materialization consumer\n"
            )
        sections.append(
            f"## {name}\n\n"
            f"- broadcast joins: {P.count_broadcast_joins(df)},"
            f" shuffle exchanges: {P.count_shuffles(df)}\n"
            f"- scan column sets: {scans}\n"
            f"- pushed filters: {filters[:3]}{' …' if len(filters) > 3 else ''}\n"
            f"{note}\n"
            f"```\n{plan.strip()}\n```\n"
        )
    with open(out_path, "w") as fh:
        fh.write("\n".join(sections))
    print(f"wrote {out_path} ({len(SHOWCASE)} queries)")


if __name__ == "__main__":
    main()
