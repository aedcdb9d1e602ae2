"""Plan-shape tests: the 100 TB design rules as assertions.

Pins, for each headline query family: predicate pushdown reaches the
scan, column pruning holds (no reading 11 columns for a 3-column
query), small dimensions broadcast, and the shuffle count is the
expected minimum. A regression that silently de-optimizes a plan
fails here even though results stay correct.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from parquet_export_spark.plans import inspect as P
from parquet_export_spark.queries import REGISTRY


def q(name, spark, sf_dir):
    return REGISTRY[name].fn(spark, sf_dir)


def test_q6_pushdown_and_pruning(spark, sf_dir):
    df = q("q6_forecast_revenue", spark, sf_dir)
    pushed = " ".join(P.pushed_filters(df))
    assert "GreaterThanOrEqual(l_shipdate" in pushed
    assert "LessThan(l_quantity,24.0)" in pushed
    [schema] = P.read_schemas(df)
    # 4 of lineitem's 11 columns — pruning is working
    assert schema == {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}


def test_filter_project_prunes(spark, sf_dir):
    df = q("filter_project", spark, sf_dir)
    [schema] = P.read_schemas(df)
    assert schema == {"l_orderkey", "l_linenumber", "l_quantity", "l_discount"}
    assert any("GreaterThan(l_quantity,45.0)" in f for f in P.pushed_filters(df))


def test_q5_broadcasts_all_dimensions(spark, sf_dir):
    df = q("q5_revenue_by_nation", spark, sf_dir)
    # customer, supplier, nation, region broadcast; only the
    # lineitem-orders join + final agg/sort shuffle.
    assert P.count_broadcast_joins(df) >= 4
    # orders-side date filter reaches its scan
    assert any("o_orderdate,1996-01-01" in f for f in P.pushed_filters(df))
    # every scan is pruned: no scan reads more than 4 columns
    assert all(len(s) <= 4 for s in P.read_schemas(df))


def test_q5_shuffle_budget(spark, sf_dir):
    df = q("q5_revenue_by_nation", spark, sf_dir)
    # SMJ(lineitem, orders): 2 exchanges; aggregate: 1; sort: 1.
    assert P.count_shuffles(df) <= 4


def test_dedup_exact_reads_minimum(spark, sf_dir):
    df = q("dedup_exact", spark, sf_dir)
    [schema] = P.read_schemas(df)
    # digest groupBy needs only the key source and the kept id
    assert schema == {"doc_id", "text"}


def test_join_semi_broadcasts(spark, sf_dir):
    df = q("join_semi", spark, sf_dir)
    assert P.count_broadcast_joins(df) == 1
    assert P.count_shuffles(df) <= 1  # sort only
    assert any("EqualTo(o_orderpriority,1-URGENT)" in f for f in P.pushed_filters(df))


def test_q1_single_agg_shuffle(spark, sf_dir):
    df = q("q1_pricing_summary", spark, sf_dir)
    # partial agg map-side, one exchange for final agg, one for sort,
    # plus (locally only) the maybe_fanout round-robin that spreads a
    # single-split scan — absent on real multi-file lakes.
    assert P.count_shuffles(df) <= 3
    assert any("l_shipdate" in f for f in P.pushed_filters(df))


def test_neardup_blocked_is_hash_join(spark, sf_dir):
    df = q("neardup_jaccard_blocked", spark, sf_dir)
    plan = P.plan_string(df)
    # blocked on equality keys -> hash join, never nested-loop cartesian
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cosine_topk_broadcasts_queries(spark, sf_dir):
    df = q("cosine_topk", spark, sf_dir)
    plan = P.plan_string(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # the full-table side is never shuffled for the join itself
    assert any("vec_id" in s and "embedding" in s for s in P.read_schemas(df))


@pytest.mark.parametrize(
    "name",
    ["q1_pricing_summary", "q5_revenue_by_nation", "window_topk_per_group"],
)
def test_wholestage_codegen_present(spark, sf_dir, name):
    # post-AQE executed plan: '*(n)' prefixes mark codegen'd stages
    plan = P.executed_plan_string(q(name, spark, sf_dir))
    assert "*(1)" in plan


def test_dedup_keep_first_shuffles_on_digest(spark, sf_dir):
    """The group-by shuffle key must be the md5 digest of the text,
    never the full document (wide-key shuffle is the 100 TB killer
    this operator was re-keyed to avoid)."""
    df = q("dedup_exact_keep_first", spark, sf_dir)
    plan = P.plan_string(df)
    import re

    for m in re.finditer(r"hashpartitioning\(([^)]*)\)", plan):
        keys = m.group(1)
        if "content_hash" in keys or "md5" in keys:
            continue
        # any other hash partitioning must not carry the raw text
        assert "text" not in keys, keys
    assert "md5" in plan or "content_hash" in plan


def test_minhash_signature_exchange_reused(spark, sf_dir):
    """The minhash signature branch must be computed once and REUSED
    across the band/verify self-join branches, not recomputed 4x.

    Pinned on the RAW gear (the composed production path): since the
    round-14 sweep the REGISTERED entry is the checked twin, whose
    final plan reads only checkpointed certificate frames — the
    registry-side once-only guarantee is the stronger
    test_certificate_frames_materialize_once /
    test_no_duplicate_hot_nodes_in_sweep_twins pair."""
    from parquet_export_spark.operators.dedup import neardup_minhash_lsh
    from parquet_export_spark.sources.lake import load_tables

    df = neardup_minhash_lsh(load_tables(spark, sf_dir))
    df.write.format("noop").mode("overwrite").save()
    plan = P.executed_plan_string(df)
    assert "ReusedExchange" in plan


def test_winnowing_is_shuffle_minimal(spark, sf_dir):
    """Winnowing is a pure projection: one fan-out repartition of the
    input, one presentation sort — nothing else may shuffle."""
    df = q("winnowing_fingerprints", spark, sf_dir)
    assert P.count_shuffles(df) <= 2


def test_dup_spans_gram_exchange_reused(spark, sf_dir):
    """The exploded-grams exchange must be materialized once and REUSED
    by the duplicate-gram aggregate and the semi-join probe (the 2.7x
    restaging win) — and nothing in the plan may be a cartesian."""
    df = q("dup_spans", spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    plan = P.executed_plan_string(df)
    assert "ReusedExchange" in plan
    assert "Cartesian" not in plan


def test_pii_scan_reads_minimum(spark, sf_dir):
    """The PII scrub is a pure regex scan: the documents read must
    prune to exactly (doc_id, text) — at 100 TB an unpruned scan here
    would read the whole table width for a 2-column operator."""
    df = q("pii_scan", spark, sf_dir)
    [schema] = P.read_schemas(df)
    assert schema == {"doc_id", "text"}


def test_bpe_token_counts_reads_minimum(spark, sf_dir):
    df = q("bpe_token_counts", spark, sf_dir)
    [schema] = P.read_schemas(df)
    assert schema == {"doc_id", "text", "n_chars"}


def test_next_event_examples_reads_minimum(spark, sf_dir):
    """Lag-window dataset build reads only the four columns it emits
    or orders by — props/value never leave the scan."""
    df = q("next_event_examples", spark, sf_dir)
    [schema] = P.read_schemas(df)
    assert schema == {"user_id", "event_id", "event_type", "ts"}


def test_winsorize_broadcasts_bounds(spark, sf_dir):
    # the per-group percentile bounds (group-count rows) must broadcast;
    # the fact side is clipped map-side with no per-group shuffle
    df = q("winsorize_values", spark, sf_dir)
    assert P.count_broadcast_joins(df) >= 1
    assert "CartesianProduct" not in P.plan_string(df)


def test_snapshot_diff_no_cartesian_one_join(spark, sf_dir):
    # the diff is ONE full-outer join on the key — never a cartesian,
    # never a per-row comparison structure
    df = q("snapshot_diff", spark, sf_dir)
    s = P.plan_string(df)
    assert "CartesianProduct" not in s
    assert s.count("SortMergeJoin FullOuter") + s.count("ShuffledHashJoin FullOuter") == 1


def test_event_ohlc_single_agg_no_window(spark, sf_dir):
    # OHLC via min_by/max_by: one partial+final aggregate, no Window
    # operator (the naive first/last-per-group plan would sort-window
    # the whole fact table)
    df = q("event_ohlc", spark, sf_dir)
    s = P.plan_string(df)
    assert "Window" not in s
    assert P.count_shuffles(df) <= 2  # agg exchange + final orderBy range


def test_incremental_rollup_scans_delta_with_pushdown(spark, sf_dir):
    # both branches' time-split predicates reach the parquet scans: the
    # "stored MV" side would be a tiny aggregate table at scale, and
    # the delta side reads only rows past the cutoff
    df = q("incremental_rollup", spark, sf_dir)
    pushed = " ".join(P.pushed_filters(df))
    assert "ts" in pushed


def test_sliding_rollup_window_fanout_jvm_side(spark, sf_dir):
    # the 4-way window fan-out is an Expand/Generate inside the scan
    # stage (JVM generator) feeding ONE partial+final aggregate — not a
    # join against a window spine and not a per-window pass
    df = q("sliding_rollup", spark, sf_dir)
    s = P.plan_string(df)
    assert "Join" not in s
    assert P.count_shuffles(df) <= 2  # agg exchange + final orderBy range


def test_fuzzy_join_is_blocked_hash_join(spark, sf_dir):
    """The Levenshtein join must candidate-generate through the
    blocking-key equi-join — never a cartesian with a distance filter
    (the plan that melts at corpus scale)."""
    plan = P.plan_string(q("fuzzy_join_parts", spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_scd2_point_in_time_single_user_shuffle(spark, sf_dir):
    """PIT reconstruction must stay on the union-then-carry-forward
    shape: no range join (non-equi BroadcastNestedLoop/cartesian)."""
    plan = P.plan_string(q("scd2_point_in_time", spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pagerank_edge_build_reads_minimum(spark, sf_dir):
    """The edge build must prune to the two key columns per fact —
    an 11-column lineitem read for a 2-key edge list is wrong. (The
    full operator's plan starts at the checkpointed edge RDD, so the
    scans are only visible on the edge-derivation subplan.)"""
    from parquet_export_spark.operators import graph as G
    from parquet_export_spark.sources.lake import load_tables

    plan = P.plan_string(G._trade_edges(load_tables(spark, sf_dir)))
    import re

    li_schemas = re.findall(
        r"ReadSchema: struct<([^>]*)>", plan
    )
    li = [s for s in li_schemas if "l_suppkey" in s]
    assert li and all(
        set(c.split(":")[0] for c in s.split(",")) <= {"l_orderkey", "l_suppkey"}
        for s in li
    ), li_schemas
    o = [s for s in li_schemas if "o_custkey" in s]
    assert o and all(
        set(c.split(":")[0] for c in s.split(",")) <= {"o_orderkey", "o_custkey"}
        for s in o
    ), li_schemas


def test_dedup_incremental_shuffles_digests_only(spark, sf_dir):
    """History reduces to (digest -> min id) before any join: the text
    column must not appear past the scan/hash projection — the join
    keys are 32-hex-char digests, never documents."""
    plan = P.plan_string(q("dedup_incremental", spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange") > 0
    # The stated digests-only property, actually asserted: no Exchange
    # or Join operator block may carry the text column — text dies at
    # the scan-side projection where the digest is computed, so only
    # 16-byte digests (plus ids) ever move.
    import re

    blocks = re.split(r"\n\s*\n", plan)
    movers = [
        b
        for b in blocks
        if re.match(r"\(\d+\) (Exchange|\w*Join)", b.strip())
        and "text#" in b
    ]
    assert not movers, movers


def test_neardup_incremental_check_never_reads_history_text(
    spark, sf_dir, tmp_path
):
    """The production incremental near-dup contract: against a
    PARQUET-BACKED artifact (the real nightly shape), the check plan
    reads document text exactly once — the batch scan. History
    contributes only its stored (doc_id, sig) and (doc_id, band,
    bucket) tables; no scan re-reads lake text and no signing branch
    exists for it."""
    from parquet_export_spark.operators import dedup as D
    from parquet_export_spark.sources.lake import load_tables

    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    lake = docs.filter(F.col("doc_id") % D.INCR_BATCH_MOD != 0)
    sigs, bands = D.lake_minhash_artifact(lake)
    sigs.write.mode("overwrite").parquet(str(tmp_path / "sigs"))
    bands.write.mode("overwrite").parquet(str(tmp_path / "bands"))
    # today's crawl arrives as its own file — the real nightly shape
    docs.filter(F.col("doc_id") % D.INCR_BATCH_MOD == 0).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "batch"))

    out = D.neardup_incremental_check(
        spark.read.parquet(str(tmp_path / "batch")),
        spark.read.parquet(str(tmp_path / "sigs")),
        spark.read.parquet(str(tmp_path / "bands")),
    )
    plan = P.plan_string(out)
    # history is represented ONLY by its stored artifact: the lake
    # documents file must not appear anywhere in the plan, so no
    # branch can re-read or re-sign historical text.
    assert "documents.parquet" not in plan, plan[:2000]
    assert str(tmp_path / "batch") in plan
    # every text-bearing scan is a batch scan (same single file)
    for s in P.read_schemas(out):
        if "text" in s:
            assert s == {"doc_id", "text"}
    assert "CartesianProduct" not in plan


def test_interpolate_reads_minimum_no_cartesian(spark, sf_dir):
    """The interpolation grid is spine x types — the only nested-loop
    allowed is the broadcast of the tiny type dim; the events scans
    prune to the three columns the hourly aggregate and bounds need."""
    df = q("interpolate_hourly_values", spark, sf_dir)
    plan = P.plan_string(df)
    assert "CartesianProduct" not in plan
    for s in P.read_schemas(df):
        assert s <= {"event_type", "ts", "value"}, s


def test_histogram_equidepth_reads_minimum(spark, sf_dir):
    df = q("histogram_equidepth", spark, sf_dir)
    [schema] = P.read_schemas(df)
    assert schema == {"o_orderkey", "o_totalprice"}


def test_value_mad_outliers_broadcasts_stats(spark, sf_dir):
    """Both percentile passes come back as broadcast joins onto the
    fact scan — no fact-side window/sort, no cartesian; the events
    scans prune to (event_id, event_type, value)."""
    df = q("value_mad_outliers", spark, sf_dir)
    plan = P.plan_string(df)
    assert "CartesianProduct" not in plan
    assert P.count_broadcast_joins(df) >= 2
    for s in P.read_schemas(df):
        assert s <= {"event_id", "event_type", "value"}, s


def test_cc_apply_edge_batch_never_reads_lake_edges(spark, sf_dir, tmp_path):
    """The incremental-CC production contract: against a PARQUET-BACKED
    label table, the merge step's plan contains the label file and the
    batch derivation ONLY — the lake's edge set (orders x lineitem
    history) appears nowhere, so no history ever re-joins."""
    from parquet_export_spark.operators import graph as G
    from parquet_export_spark.sources.lake import load_tables

    t = load_tables(spark, sf_dir)
    lake_pairs = (
        t["orders"]
        .filter(F.col("o_orderkey") % G.CC_INCR_BATCH_MOD != 0)
        .select(F.col("o_orderkey").alias("ok"), "o_custkey")
        .join(
            t["lineitem"].select(F.col("l_orderkey").alias("ok"), "l_suppkey"),
            "ok",
        )
        .select(
            (F.col("o_custkey") * 2).alias("cust_node"),
            (F.col("l_suppkey") * 2 + 1).alias("supp_node"),
        )
        .distinct()
    )
    sym = lake_pairs.select(
        F.col("cust_node").alias("src"), F.col("supp_node").alias("dst")
    ).unionByName(
        lake_pairs.select(
            F.col("supp_node").alias("src"), F.col("cust_node").alias("dst")
        )
    )
    lab = G._cc_doubling_core(sym, G.CC_DOUBLE_ITERS)
    lab.write.mode("overwrite").parquet(str(tmp_path / "labels"))
    # today's pairs arrive as their own file (the nightly shape)
    t["orders"].filter(
        F.col("o_orderkey") % G.CC_INCR_BATCH_MOD == 0
    ).select(F.col("o_orderkey").alias("ok"), "o_custkey").join(
        t["lineitem"].select(F.col("l_orderkey").alias("ok"), "l_suppkey"),
        "ok",
    ).select(
        (F.col("o_custkey") * 2).alias("cust_node"),
        (F.col("l_suppkey") * 2 + 1).alias("supp_node"),
    ).distinct().write.mode("overwrite").parquet(str(tmp_path / "batch"))

    # materialize=False: the production checkpoints would truncate the
    # very scans this audit needs to see
    out = G.cc_apply_edge_batch(
        spark.read.parquet(str(tmp_path / "labels")),
        spark.read.parquet(str(tmp_path / "batch")),
        materialize=False,
    )
    plan = P.plan_string(out)
    assert "orders.parquet" not in plan
    assert "lineitem.parquet" not in plan
    assert str(tmp_path / "labels") in plan
    assert str(tmp_path / "batch") in plan


def test_simjoin_prefix_no_cartesian_text_never_moves(spark, sf_dir):
    """The prefix-filter similarity join must stay an equi-join on
    shingle hashes (no CartesianProduct anywhere — the whole point of
    the prefix filter), and document text must die at the scan-side
    shingle projection: every Exchange/Join block moves int64 hashes
    and ids, never the text column."""
    import re

    plan = P.plan_string(q("simjoin_prefix", spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange") > 0
    blocks = re.split(r"\n\s*\n", plan)
    movers = [
        b
        for b in blocks
        if re.match(r"\(\d+\) (Exchange|\w*Join)", b.strip())
        and "text#" in b
    ]
    assert not movers, movers


# ---------------------------------------------------------------------------
# round-6 additions
# ---------------------------------------------------------------------------


def test_containment_join_no_cartesian(spark, sf_dir):
    """Prefix-filtered containment must never degrade to a cartesian /
    nested-loop plan — candidates come from the band-style equi-join."""
    df = q("containment_join", spark, sf_dir)
    plan = P.plan_string(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_phash_dedup_no_cartesian_and_slim_verify(spark, sf_dir):
    """The band equi-join carries only (doc_id, band, val) longs; the
    verification join pulls four band ints per side — never payloads,
    never a cartesian."""
    df = q("phash_pgm_dedup", spark, sf_dir)
    plan = P.plan_string(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_benford_single_fact_scan(spark, sf_dir):
    """One digit-extraction scan + one 9-group aggregate + a 1-row
    broadcast total — the fact table must appear in exactly two scans
    (counts + total), each pruned to the single price column."""
    df = q("benford_first_digit", spark, sf_dir)
    schemas = P.read_schemas(df)
    # counts scan reads only the price; the total-count scan reads
    # ZERO columns (count(*) metadata-only projection)
    assert all(s <= {"o_totalprice"} for s in schemas)
    assert len(schemas) <= 2


def test_seasonal_decompose_fact_touched_once(spark, sf_dir):
    """Both aggregates are time-bounded AFTER the first collapse: only
    ONE scan may read the events fact table (hourly); the profile
    derives from the hourly aggregate, not from a second fact scan."""
    df = q("seasonal_decompose_hourly", spark, sf_dir)
    schemas = P.read_schemas(df)
    fact_scans = [s for s in schemas if "value" in s]
    assert len(fact_scans) <= 2  # hourly is branched, never re-scanned wider
    assert all(s <= {"event_type", "ts", "value"} for s in schemas)


def test_ks_window_input_is_bounded(spark, sf_dir):
    """The cumulative window runs over (type-pair x distinct cents)
    rows — the fact table collapses to (type, cents) counts FIRST, so
    the Window's child must contain the pre-aggregation, and the scan
    reads only (event_type, value)."""
    df = q("ks_distance_pairs", spark, sf_dir)
    plan = P.plan_string(df)
    assert "Window" in plan
    schemas = P.read_schemas(df)
    assert all(s <= {"event_type", "value"} for s in schemas)
    # the window sorts within (ta, tb) partitions — never a global
    # single-partition sort of raw events
    import re

    assert not re.search(r"Exchange SinglePartition", plan)


# --- round-7 pins: the six late-round-6 operators (r6 verdict #2) ---


def _physical_blocks(plan: str) -> list[str]:
    """Split a formatted plan into numbered physical-operator blocks."""
    import re

    return re.split(r"\n\s*\n", plan)


def test_decile_features_window_never_sees_fact_rows(spark, sf_dir):
    """The decile boundaries derive from the CENTS-BOUNDED support:
    the cumulative Window's input is the (type, cents) aggregate, so
    no Window block may carry event_id (fact rows are never windowed
    or sorted for boundary derivation); the boundary array reaches the
    assignment scan via broadcast and the O(9) fold is the in-codegen
    `aggregate` HOF, not a join per boundary."""
    df = q("decile_features_events", spark, sf_dir)
    plan = P.plan_string(df)
    import re

    win_blocks = [
        b
        for b in _physical_blocks(plan)
        if re.match(r"\(\d+\) Window", b.strip())
    ]
    assert win_blocks, "expected the cumulative boundary Window"
    assert not any("event_id#" in b for b in win_blocks), win_blocks
    # boundary fold is the aggregate() HOF inside a projection
    assert "aggregate(bs#" in plan, plan[:1500]
    # 9-row index frame + 45-row bounds both broadcast
    assert P.count_broadcast_joins(df) >= 2
    # scans: assignment + counts (+ totals reuse), all pruned
    schemas = P.read_schemas(df)
    assert len(schemas) <= 3
    assert all(s <= {"event_id", "event_type", "value"} for s in schemas)
    assert P.count_shuffles(df) <= 5
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_anomaly_suite_composition_stays_bounded(spark, sf_dir):
    """The composed suite is the three registered singles joined on
    type-sized aggregates: every fact scan stays pruned to the four
    event columns, the per-type joins broadcast, and composing adds
    no cartesian, no single-partition exchange, and no extra
    fact-side scans beyond the singles' own (<= 8 total)."""
    df = q("anomaly_suite_events", spark, sf_dir)
    plan = P.plan_string(df)
    schemas = P.read_schemas(df)
    assert len(schemas) <= 8
    assert all(
        s <= {"event_id", "event_type", "ts", "value"} for s in schemas
    )
    assert P.count_broadcast_joins(df) >= 3  # per-type joins are tiny
    assert P.count_shuffles(df) <= 9
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_target_encode_loo_broadcasts_sums_no_fact_shuffle(spark, sf_dir):
    """The category (sum, count) aggregate broadcasts back onto the
    fact scan: exactly one broadcast join, no Window, and the only
    exchanges are the bounded aggregate plus the presentation sort —
    the fact table itself is never hash-shuffled for the join."""
    df = q("target_encode_loo", spark, sf_dir)
    plan = P.plan_string(df)
    assert P.count_broadcast_joins(df) == 1
    assert P.count_shuffles(df) <= 2  # type-agg + presentation sort
    import re

    assert not re.search(r"\(\d+\) Window", plan)
    schemas = P.read_schemas(df)
    assert len(schemas) <= 2
    assert all(s <= {"event_id", "event_type", "value"} for s in schemas)
    assert "CartesianProduct" not in plan


def test_interarrival_single_window_pass_pruned_scan(spark, sf_dir):
    """One per-type window pass over one pruned scan: the events fact
    is read exactly once (event_type, ts, event_id — value is never
    read), exactly one physical Window block, and the only exchanges
    are the window's hash partition plus the grouped-count/sort."""
    df = q("interarrival_gap_histogram", spark, sf_dir)
    plan = P.plan_string(df)
    [schema] = P.read_schemas(df)
    assert schema == {"event_type", "ts", "event_id"}
    import re

    win_blocks = [
        b
        for b in _physical_blocks(plan)
        if re.match(r"\(\d+\) Window", b.strip())
    ]
    assert len(win_blocks) == 1, [b.splitlines()[0] for b in win_blocks]
    assert P.count_shuffles(df) <= 2
    assert "Exchange SinglePartition" not in plan


def test_random_walks_hop_join_probes_cached_edges_in_place(spark, sf_dir):
    """The per-hop contract: the frontier (node-sized) broadcasts and
    the persisted src-partitioned edge cache is probed IN PLACE via
    InMemoryTableScan — no hop may re-exchange the edge side. (The
    full operator checkpoints per hop, so the shape is pinned on a
    representative single-hop join against the same cache.)"""
    from pyspark.sql import functions as F2

    from parquet_export_spark.operators import graph as G
    from parquet_export_spark.sources.lake import load_tables

    e = G._edge_cache(G._trade_edges(load_tables(spark, sf_dir)))
    try:
        frontier = (
            e.select(F2.col("src").alias("start"))
            .filter(F2.col("start") % 2 == 1)
            .distinct()
            .withColumn("cur", F2.col("start"))
        )
        hop = frontier.join(e, frontier["cur"] == e["src"])
        plan = P.executed_plan_string(hop)
        assert "InMemoryTableScan" in plan
        # everything above the cached relation's own (one-time) build
        # plan must be exchange-free apart from the frontier broadcast
        above_cache = plan.split("InMemoryRelation")[0]
        assert "BroadcastExchange" in above_cache
        assert "Exchange hashpartitioning" not in above_cache, above_cache
    finally:
        e.unpersist(blocking=False)


def test_sql_cohort_ltv_pruned_scans_one_exchange_per_level(spark, sf_dir):
    """The verbatim-ANSI cohort query: both orders scans prune to the
    three needed columns (first-order scan reads only custkey+date),
    and the exchanges stay at one per aggregation level (firsts agg,
    distinct-customer expand, final agg, presentation sort)."""
    df = q("sql_cohort_ltv", spark, sf_dir)
    plan = P.plan_string(df)
    schemas = P.read_schemas(df)
    assert len(schemas) == 2
    assert all(
        s <= {"o_custkey", "o_orderdate", "o_totalprice"} for s in schemas
    )
    assert {"o_custkey", "o_orderdate"} in schemas  # firsts branch pruned
    assert P.count_shuffles(df) <= 4
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan


def test_ivf_probe_never_refits_reads_artifact(spark, sf_dir, tmp_path):
    """The production stored-index contract (the neardup_incremental
    pattern for ANN): against a PARQUET-BACKED artifact, the probe
    plan reads the stored centers and assignment tables, scans the
    corpus embeddings exactly once (the candidate gather join on
    vec_id, pruned to vec_id+embedding), and contains no quantizer
    fit — history is never re-assigned or re-fit."""
    from parquet_export_spark.operators import similarity as S
    from parquet_export_spark.sources.lake import load_tables

    emb = load_tables(spark, sf_dir)["embeddings"]
    centers, assigned = S.ivf_index_artifact(emb)
    centers.write.mode("overwrite").parquet(str(tmp_path / "centers"))
    assigned.write.mode("overwrite").parquet(str(tmp_path / "assigned"))
    queries = (
        emb.filter(F.col("vec_id") < 5)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
        )
    )
    queries.write.mode("overwrite").parquet(str(tmp_path / "queries"))

    out = S.ivf_probe_index(
        spark.read.parquet(str(tmp_path / "queries")),
        spark.read.parquet(str(tmp_path / "centers")),
        spark.read.parquet(str(tmp_path / "assigned")),
        emb,
    )
    plan = P.plan_string(out)
    assert str(tmp_path / "centers") in plan
    assert str(tmp_path / "assigned") in plan
    # corpus appears in exactly one scan: the gather join, pruned
    emb_scans = [
        s for s in P.read_schemas(out) if "embedding" in s and "q_emb" not in s
    ]
    assert emb_scans == [{"vec_id", "embedding"}], emb_scans
    assert plan.count("embeddings.parquet") == 1, plan.count(
        "embeddings.parquet"
    )
    assert "CartesianProduct" not in plan  # centers ride a broadcast


# --- round-7 pins: the new operator batch ---


def test_robust_scale_window_never_sees_fact_rows(spark, sf_dir):
    """Same contract as the decile pin: quartile boundaries derive
    from the cents-bounded support (no Window block carries event_id),
    the 15-row boundary table broadcasts onto the single fact-side
    assignment scan, and every scan is pruned."""
    df = q("robust_scale_features", spark, sf_dir)
    plan = P.plan_string(df)
    import re

    win_blocks = [
        b
        for b in _physical_blocks(plan)
        if re.match(r"\(\d+\) Window", b.strip())
    ]
    assert win_blocks and not any("event_id#" in b for b in win_blocks)
    assert P.count_broadcast_joins(df) >= 2
    schemas = P.read_schemas(df)
    assert len(schemas) <= 3
    assert all(s <= {"event_id", "event_type", "value"} for s in schemas)
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_value_clusters_windows_over_support_only(spark, sf_dir):
    """Gaps-and-islands runs over the (type, cents) support: one
    pruned fact scan, and no Window block may carry event_id."""
    df = q("value_clusters_1d", spark, sf_dir)
    plan = P.plan_string(df)
    import re

    [schema] = P.read_schemas(df)
    assert schema == {"event_type", "value"}
    win_blocks = [
        b
        for b in _physical_blocks(plan)
        if re.match(r"\(\d+\) Window", b.strip())
    ]
    assert win_blocks and not any("event_id#" in b for b in win_blocks)
    assert "Exchange SinglePartition" not in plan


def test_chi2_checkpointed_aggregates_bound_the_plan(spark, sf_dir):
    """The support histogram and the contingency table are each
    materialized ONCE (the first cut re-derived every branch from the
    fact scan: 10 scans, 20 exchanges) — the assembled plan joins the
    tiny checkpointed frames with at most 4 exchanges and only
    broadcast joins."""
    df = q("chi2_type_decile", spark, sf_dir)
    plan = P.plan_string(df)
    assert P.count_shuffles(df) <= 4
    assert P.count_broadcast_joins(df) >= 2
    assert "CartesianProduct" not in plan


def test_type_affinity_single_distinct_materialization(spark, sf_dir):
    """The distinct (type, user) frame feeds both self-join sides and
    the totals from ONE materialization — the assembled plan carries
    at most 4 exchanges and the type totals ride broadcasts."""
    df = q("type_affinity_jaccard", spark, sf_dir)
    plan = P.plan_string(df)
    assert P.count_shuffles(df) <= 4
    assert P.count_broadcast_joins(df) >= 2
    assert "CartesianProduct" not in plan


def test_autocorr_single_fact_scan_one_window(spark, sf_dir):
    """The hourly histogram is materialized once (one fact scan at
    checkpoint time), all four lag leads share ONE window pass, and
    the assembled plan needs at most 2 exchanges."""
    df = q("autocorr_hourly_counts", spark, sf_dir)
    plan = P.plan_string(df)
    import re

    win_blocks = [
        b
        for b in _physical_blocks(plan)
        if re.match(r"\(\d+\) Window", b.strip())
    ]
    assert len(win_blocks) == 1
    # all four leads in the single window block
    assert all(f"lead(x#" in b.replace(" ", "").lower() or "lead" in b
               for b in win_blocks)
    assert P.count_shuffles(df) <= 2
    assert "Exchange SinglePartition" not in plan


def test_user_path_takeordered_before_rank_window(spark, sf_dir):
    """One pruned fact scan; the global rank window runs only over
    the TakeOrdered K-row prune (vocab_coverage discipline), so the
    single-partition stage holds K rows, not the path universe."""
    df = q("user_path_topk", spark, sf_dir)
    plan = P.plan_string(df)
    [schema] = P.read_schemas(df)
    assert schema == {"user_id", "ts", "event_id", "event_type"}
    assert "TakeOrdered" in plan
    assert P.count_shuffles(df) <= 3


def test_nearest_event_one_user_shuffle(spark, sf_dir):
    """Union-then-carry: both type branches scan pruned to the four
    needed columns and the whole join costs ONE user_id exchange
    (both carry windows share it) plus the presentation sort — no
    range join, no cartesian."""
    df = q("nearest_event_join", spark, sf_dir)
    plan = P.plan_string(df)
    schemas = P.read_schemas(df)
    assert len(schemas) == 2
    assert all(
        s == {"user_id", "ts", "event_id", "event_type"} for s in schemas
    )
    assert P.count_shuffles(df) <= 2
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan


def test_fano_no_window_no_spine_two_exchanges(spark, sf_dir):
    """Zeros enter through the SPAN, so no dense spine and no window
    exist anywhere in the plan; one pruned fact scan feeds a
    (type, minute) partial-aggregate chain — two exchanges, never a
    single-partition stage."""
    df = q("fano_burstiness", spark, sf_dir)
    plan = P.plan_string(df)
    assert "Window" not in plan
    assert "sequence(" not in plan  # no generated spine
    [schema] = P.read_schemas(df)
    assert schema == {"event_type", "ts"}
    assert P.count_shuffles(df) <= 3  # (type,m) agg + type agg + sort
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_rfm_boundary_window_over_support_only(spark, sf_dir):
    """The quintile boundaries derive from the VALUE-BOUNDED long
    support (metric x distinct values): no Window block may carry
    o_custkey (customers are never windowed), boundaries and the
    1-row gmax reach assignment via broadcast, and the fold is the
    in-codegen aggregate() HOF."""
    df = q("rfm_segments", spark, sf_dir)
    plan = P.plan_string(df)
    import re

    win_blocks = [
        b
        for b in _physical_blocks(plan)
        if re.match(r"\(\d+\) Window", b.strip())
    ]
    assert win_blocks, "expected the cumulative boundary Window"
    assert not any("o_custkey#" in b for b in win_blocks), win_blocks
    assert "aggregate(bs#" in plan
    assert P.count_broadcast_joins(df) >= 2  # gmax + index + bounds
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_session_entry_exit_shares_one_user_exchange(spark, sf_dir):
    """All four windows (session core lag/sum + the two edge ranks)
    run under ONE user_id exchange — hashpartitioning(user_id)
    satisfies the (user, session) clustering — and the fact scan is
    pruned to the four behavioral columns."""
    df = q("session_entry_exit", spark, sf_dir)
    plan = P.plan_string(df)
    schemas = P.read_schemas(df)
    assert all(
        s <= {"user_id", "ts", "event_id", "event_type"} for s in schemas
    )
    # user exchange + grid aggregate + presentation sort
    assert P.count_shuffles(df) <= 4
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_multitouch_pruned_typed_scans_no_cartesian(spark, sf_dir):
    """Both join sides are type-filtered AT THE SCAN (pushed
    EqualTo on event_type) and pruned — the click side never reads
    value; the band join is an equi-join on user_id (no cartesian,
    no range-join explosion), and the credit windows ride the
    purchase-id partitioning."""
    df = q("multitouch_attribution", spark, sf_dir)
    plan = P.plan_string(df)
    pushed = " ".join(P.pushed_filters(df))
    assert "EqualTo(event_type,purchase)" in pushed
    assert "EqualTo(event_type,click)" in pushed
    schemas = P.read_schemas(df)
    assert len(schemas) == 2
    assert {"event_id", "user_id", "ts"} <= set.union(*schemas)
    assert not all("value" in s for s in schemas)  # click side pruned
    assert P.count_shuffles(df) <= 5
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan


def test_link_prediction_topk_prunes_before_driver(spark, sf_dir):
    """The ranked shortlist is a TakeOrdered prune (never a global
    sort of the candidate set), the wedge join is an equi-join on the
    shared neighbor (no cartesian), and existing edges leave by a
    LeftAnti join."""
    df = q("link_prediction_suppliers", spark, sf_dir)
    plan = P.plan_string(df)
    assert "TakeOrdered" in plan
    assert "CartesianProduct" not in plan
    assert "LeftAnti" in plan
    assert "Exchange SinglePartition" not in plan


def test_apdex_one_scan_one_aggregate(spark, sf_dir):
    """One pruned scan, one conditional aggregate — no window, no
    joins, types rows out."""
    df = q("apdex_by_type", spark, sf_dir)
    plan = P.plan_string(df)
    assert "Window" not in plan
    [schema] = P.read_schemas(df)
    assert schema == {"event_type", "value"}
    assert P.count_shuffles(df) <= 2  # type agg + presentation sort
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_ngram_novelty_no_pair_term(spark, sf_dir):
    """First-occurrence attribution is gram-keyed aggregate + join —
    documents never join documents, so no cartesian and no doc-pair
    exchange; both scans pruned to (doc_id, text)."""
    df = q("ngram_novelty_scores", spark, sf_dir)
    plan = P.plan_string(df)
    schemas = P.read_schemas(df)
    assert all(s == {"doc_id", "text"} for s in schemas)
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan
    assert P.count_shuffles(df) <= 6


def test_holt_fold_inside_projection_no_fact_window(spark, sf_dir):
    """The recurrence is ONE aggregate() HOF fold over the per-type
    span-bounded array — no fact-side window, the spine generated by
    sequence(), and the only windowless exchanges are the daily
    collapse and the per-type collect."""
    df = q("holt_linear_forecast", spark, sf_dir)
    plan = P.plan_string(df)
    # the fold collapses onto the collect_list aggregate result
    assert "aggregate(sort_array(collect_list" in plan
    assert "shiftright" in plan
    assert "sequence(" in plan
    assert "Window" not in plan
    schemas = P.read_schemas(df)
    assert all(s <= {"event_type", "ts", "value"} for s in schemas)
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_novelty_incremental_digest_join_no_pair_term(spark, sf_dir):
    """The lake side collapses to distinct gram digests before the
    batch-side LEFT join — documents never join documents; scans
    pruned to (doc_id, text)."""
    df = q("novelty_incremental", spark, sf_dir)
    plan = P.plan_string(df)
    schemas = P.read_schemas(df)
    assert all(s == {"doc_id", "text"} for s in schemas)
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan
    assert P.count_shuffles(df) <= 7


def test_degree_distribution_bounded_aggregates(spark, sf_dir):
    """Node-sized degree aggregate then a ~60-row bin aggregate — no
    window, no cartesian, no single-partition stage."""
    df = q("degree_distribution_suppliers", spark, sf_dir)
    plan = P.plan_string(df)
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan


def test_feature_hash_no_joins_doc_bounded_window(spark, sf_dir):
    """Pure scan -> explode -> count -> doc-keyed window: no joins of
    any kind, scan pruned to (doc_id, text), and the only window is
    doc-partitioned (never a global rank)."""
    df = q("feature_hash_vectors", spark, sf_dir)
    plan = P.plan_string(df)
    assert "Join" not in plan
    [schema] = P.read_schemas(df)
    assert schema == {"doc_id", "text"}
    assert "Exchange SinglePartition" not in plan
    assert P.count_shuffles(df) <= 3


def test_seasonality_strength_composition_stays_bounded(spark, sf_dir):
    """The strength is one aggregate OVER the decompose operator: fact
    scans stay pruned to the three event columns, both decompose
    aggregates remain time-bounded, and no single-partition stage or
    cartesian appears."""
    df = q("seasonality_strength_hourly", spark, sf_dir)
    plan = P.plan_string(df)
    schemas = P.read_schemas(df)
    assert all(s <= {"event_type", "ts", "value"} for s in schemas)
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan
    # decimal-exact quadratic sums are in the plan (the overflow-proof
    # accumulation the docstring claims)
    assert "decimal(19,0)" in plan


def test_community_modularity_no_cartesian_bounded(spark, sf_dir):
    """Labels join edges on node keys; the 1-row m total broadcasts;
    nothing is quadratic in communities or nodes."""
    df = q("community_modularity_suppliers", spark, sf_dir)
    plan = P.plan_string(df)
    assert "CartesianProduct" not in plan
    # 1-row broadcasts only: the m total here plus the label run's own
    # threshold join — both single-row by construction
    assert plan.count("BroadcastNestedLoopJoin") <= 2
    assert "Exchange SinglePartition" not in plan


def test_wasserstein_windows_over_support_only(spark, sf_dir):
    """The cumulative/lead windows run over the DEDUPED (pair, cents)
    support — no window block may carry event_id, the pair frame is
    types²-bounded, and the fact table is scanned once."""
    df = q("wasserstein_distance_pairs", spark, sf_dir)
    plan = P.plan_string(df)
    import re

    win_blocks = [
        b
        for b in _physical_blocks(plan)
        if re.match(r"\(\d+\) Window", b.strip())
    ]
    assert win_blocks
    assert not any("event_id#" in b for b in win_blocks)
    schemas = P.read_schemas(df)
    assert all(s == {"event_type", "value"} for s in schemas)
    assert "Exchange SinglePartition" not in plan


def test_hhi_customer_grain_then_segment(spark, sf_dir):
    """Orders collapse to customer grain before the dimension join;
    decimal-exact quadratic sums in the plan; no window."""
    df = q("hhi_concentration_by_segment", spark, sf_dir)
    plan = P.plan_string(df)
    assert "decimal(19,0)" in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan


def test_local_peaks_one_window_dense_spine(spark, sf_dir):
    """One lag/lead window over the span-bounded dense grid; fact
    pruned to three columns; spine generated by sequence()."""
    df = q("local_peaks_hourly", spark, sf_dir)
    plan = P.plan_string(df)
    import re

    win_blocks = [
        b
        for b in _physical_blocks(plan)
        if re.match(r"\(\d+\) Window", b.strip())
    ]
    assert len(win_blocks) == 1
    assert "sequence(" in plan
    schemas = P.read_schemas(df)
    assert all(s <= {"event_type", "ts", "value"} for s in schemas)
    assert "Exchange SinglePartition" not in plan


def test_value_migration_windows_over_support(spark, sf_dir):
    """Boundary windows run over (period x distinct cents) — no
    Window block may carry o_custkey; boundaries and midpoint reach
    the fact side via broadcast; the HOF fold is in the plan."""
    df = q("value_migration_matrix", spark, sf_dir)
    plan = P.plan_string(df)
    import re

    win_blocks = [
        b
        for b in _physical_blocks(plan)
        if re.match(r"\(\d+\) Window", b.strip())
    ]
    assert win_blocks
    assert not any("o_custkey#" in b for b in win_blocks), win_blocks
    assert "aggregate(bs#" in plan
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_streaks_window_over_user_days(spark, sf_dir):
    """The islands window runs over DISTINCT (user, day) rows — no
    Window block may carry event_id; fact pruned to two columns."""
    df = q("user_activity_streaks", spark, sf_dir)
    plan = P.plan_string(df)
    import re

    win_blocks = [
        b
        for b in _physical_blocks(plan)
        if re.match(r"\(\d+\) Window", b.strip())
    ]
    assert win_blocks
    assert not any("event_id#" in b for b in win_blocks)
    [schema] = P.read_schemas(df)
    assert schema == {"user_id", "ts"}
    assert "Exchange SinglePartition" not in plan


def test_simpson_two_aggregates_no_window(spark, sf_dir):
    df = q("simpson_diversity_by_user", spark, sf_dir)
    plan = P.plan_string(df)
    assert "Window" not in plan
    [schema] = P.read_schemas(df)
    assert schema == {"user_id", "event_type"}
    assert P.count_shuffles(df) <= 3
    assert "Exchange SinglePartition" not in plan


def test_higher_moments_decimal_sums_single_agg(spark, sf_dir):
    """All four power sums ride ONE grouped aggregate with
    decimal(38,0) accumulation — no window, no join, no second
    fact scan."""
    df = q("stats_higher_moments", spark, sf_dir)
    plan = P.plan_string(df)
    assert "decimal(38,0)" in plan
    assert "Window" not in plan
    assert "Join" not in plan
    assert "Exchange SinglePartition" not in plan


def test_pareto_share_boundary_window_over_support(spark, sf_dir):
    """The quintile boundary derives from the (segment x distinct
    cents) support — no Window block carries o_custkey — and reaches
    the customer frame via broadcast."""
    df = q("pareto_share_by_segment", spark, sf_dir)
    plan = P.plan_string(df)
    import re

    win_blocks = [
        b
        for b in _physical_blocks(plan)
        if re.match(r"\(\d+\) Window", b.strip())
    ]
    assert win_blocks
    assert not any("o_custkey#" in b for b in win_blocks)
    assert P.count_broadcast_joins(df) >= 1
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_cadence_one_customer_exchange(spark, sf_dir):
    """The lag and rank windows both ride customer-keyed
    partitioning; the fact scan prunes to two columns; no window
    carries order keys."""
    df = q("order_cadence_by_customer", spark, sf_dir)
    plan = P.plan_string(df)
    # the gap frame is checkpointed, so the visible plan is the
    # post-checkpoint consumers; any remaining scan must stay pruned
    schemas = P.read_schemas(df)
    assert all(s <= {"o_custkey", "o_orderdate"} for s in schemas)
    import re

    win_blocks = [
        b
        for b in _physical_blocks(plan)
        if re.match(r"\(\d+\) Window", b.strip())
    ]
    assert win_blocks
    assert not any("o_orderkey#" in b for b in win_blocks)
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# Round-9 late additions: the engagement/association/survival batch
# ---------------------------------------------------------------------------


def test_dau_mau_one_collapse_no_joins(spark, sf_dir):
    """One distinct collapse of (month, day, user) feeds a
    month-sized aggregate: no joins, no windows, pruned scan."""
    df = q("dau_mau_stickiness", spark, sf_dir)
    plan = P.plan_string(df)
    assert "Window" not in plan
    assert "Join" not in plan
    [schema] = P.read_schemas(df)
    assert schema == {"ts", "user_id"}
    assert "Exchange SinglePartition" not in plan


def test_new_returning_collapsed_grain_join(spark, sf_dir):
    """The first-week min-table joins the (user, week) grain —
    post-checkpoint the visible plan carries no fact scan, no
    windows, and the join keys are user-side."""
    df = q("new_returning_weekly", spark, sf_dir)
    plan = P.plan_string(df)
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan


def test_churn_retention_collapsed_self_join(spark, sf_dir):
    """All three consumers (month-1 self-join, first-month table,
    rollup) ride the ONE checkpointed (user, month) grain: no
    windows, no fact re-scan, no single-partition exchange."""
    df = q("churn_retention_monthly", spark, sf_dir)
    plan = P.plan_string(df)
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan


def test_cramers_v_single_row_off_shared_core(spark, sf_dir):
    """The effect-size fold adds NO fact re-scan on top of the shared
    contingency core: post-checkpoint the plan aggregates the
    types x 10 cell table once; the collected fold array never
    explodes back out."""
    df = q("cramers_v_type_decile", spark, sf_dir)
    plan = P.plan_string(df)
    assert "Generate" not in plan  # no explode anywhere
    assert "CartesianProduct" not in plan


def test_kaplan_meier_windows_stay_off_orders(spark, sf_dir):
    """The lag window is customer-keyed; the risk cumulative runs
    over the duration SUPPORT (no o_orderkey in any window block);
    scans prune to (custkey, orderdate)."""
    import re

    df = q("kaplan_meier_interorder", spark, sf_dir)
    plan = P.plan_string(df)
    schemas = P.read_schemas(df)
    assert all(s <= {"o_custkey", "o_orderdate"} for s in schemas)
    win_blocks = [
        b
        for b in plan.split("\n\n")
        if re.search(r"\(\d+\) Window", b)
    ]
    assert not any("o_orderkey#" in b for b in win_blocks)
    assert "CartesianProduct" not in plan


def test_spearman_no_fact_windows(spark, sf_dir):
    """Ranks come from support-level cumulative counts: every window
    block is flag-partitioned over the grouped (value, cnt) support —
    no single-partition exchange, no cartesian, pruned scan."""
    df = q("spearman_corr_by_flag", spark, sf_dir)
    plan = P.plan_string(df)
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan
    schemas = P.read_schemas(df)
    assert all(
        s <= {"l_returnflag", "l_quantity", "l_extendedprice"}
        for s in schemas
    )


def test_session_concurrency_no_global_sweep(spark, sf_dir):
    """The deliberate NON-sweep-line shape: the only windows are the
    user-keyed sessionization core's; the hour fan-out is a bounded
    sequence explode; no totally-ordered cumulative pass anywhere.
    Asserted on the REBUILD path (direct operator call) — the registry
    probe hides the windows entirely behind the checkpointed session
    artifact (test_session_probes_never_rewindow pins that)."""
    import re

    from parquet_export_spark.operators import advanced as A
    from parquet_export_spark.sources.lake import load_tables

    df = A.session_concurrency_hourly(load_tables(spark, sf_dir))
    plan = P.plan_string(df)
    assert "Exchange SinglePartition" not in plan
    win_blocks = [
        b for b in plan.split("\n\n") if re.search(r"\(\d+\) Window", b)
    ]
    assert win_blocks  # the sessionization lag/cumsum windows
    assert all("user_id#" in b for b in win_blocks)
    assert "Generate" in plan  # the bounded sequence explode


def test_readability_shuffle_free(spark, sf_dir):
    """Scan -> project, nothing else: no join, no window, no
    aggregate exchange; the only shuffle is the presentation sort."""
    df = q("readability_scores", spark, sf_dir)
    plan = P.plan_string(df)
    assert "Join" not in plan
    assert "Window" not in plan
    assert P.count_shuffles(df) <= 1
    [schema] = P.read_schemas(df)
    assert schema == {"doc_id", "text"}


def test_atkinson_customer_grain_then_segment(spark, sf_dir):
    """Same altitude ladder as HHI: custkey revenue aggregate ->
    dimension join -> segment aggregate; no windows; scans pruned to
    the three needed columns."""
    df = q("atkinson_index_by_segment", spark, sf_dir)
    plan = P.plan_string(df)
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    schemas = P.read_schemas(df)
    assert all(
        s <= {"o_custkey", "o_totalprice"}
        or s <= {"c_custkey", "c_mktsegment"}
        for s in schemas
    )


def test_session_probes_never_rewindow(spark, sf_dir):
    """The registry's session consumers probe the checkpointed
    per-lake session artifact: their visible plans must contain NO
    window operator and NO events scan — the sessionization windows
    were paid once, at artifact build."""
    from parquet_export_spark.queries import REGISTRY

    for name in (
        "sessionize_batch",
        "session_entry_exit",
        "session_duration_histogram",
        "session_concurrency_hourly",
    ):
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = P.plan_string(df)
        assert "Window" not in plan, name
        assert P.read_schemas(df) == [], name  # no file scan at all


def test_textrank_reuses_persisted_edge_cache(spark, sf_dir):
    """The word graph rides the SAME iteration discipline as the trade
    graph: a persisted edge cache (InMemoryRelation in the plan), no
    cartesian products, and a TakeOrdered cut before the driver."""
    from parquet_export_spark.queries import REGISTRY

    df = REGISTRY["textrank_keywords"].fn(spark, sf_dir)
    plan = P.plan_string(df)
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# 100 TB broadcast rule (round-10, VERDICT r9 "What's wrong #1"): a FORCED
# broadcast hint is allowed only on frames that provably stay small at any
# SF — fixed-cardinality dims (nation=25, region=5 rows at EVERY scale
# factor) or globally-aggregated (ungrouped) frames. customer / supplier /
# part / keyed fact aggregates grow linearly with the data: a forced hint
# there bypasses both the 64 MB threshold and AQE's size check, turning a
# graceful SMJ fallback into a guaranteed executor OOM at the 100 TB
# design point. Catalyst/AQE already broadcasts those frames at test SFs
# without any hint — so this rule costs nothing locally.
# ---------------------------------------------------------------------------

_TPCH_FAMILY = sorted(
    [k for k in REGISTRY if re.match(r"q\d+_", k)]
    + ["join_range", "join_inner", "join_semi", "join_anti",
       "bloom_prune_orders", "filter_project", "sort_limit_offset"]
)


@pytest.mark.parametrize("name", _TPCH_FAMILY)
def test_no_forced_broadcast_of_sf_scaling_frames(name, spark, sf_dir):
    df = q(name, spark, sf_dir)
    for tables, global_agg in P.broadcast_hint_subtrees(df):
        assert global_agg or tables <= P.FIXED_CARDINALITY_TABLES, (
            f"{name}: forced broadcast hint over SF-scaling frame "
            f"(leaf tables {sorted(tables)}) — drop the hint and let "
            f"Catalyst/AQE decide (OOM at 100 TB otherwise)"
        )


def test_unhinted_dimensions_still_broadcast_locally(spark, sf_dir):
    """The flip side of the rule above: dropping the hints must NOT
    de-optimize the local plan. Catalyst's static size estimate still
    broadcasts customer and supplier at test SFs (their parquet
    footprint is far below the 64 MB threshold), so q5 keeps all four
    dimension joins as BroadcastHashJoin with zero forced hints on
    SF-scaling frames."""
    df = q("q5_revenue_by_nation", spark, sf_dir)
    assert P.count_broadcast_joins(df) >= 4


def test_partitioned_export_read_back_prunes(spark, tmp_path):
    """The partitioned-lake posture's pruning contract, suite-side
    (round 14, r13 verdict #5 — promoted from bench.py's export
    assertion so a layout/filter regression fails pytest too): a
    day-partitioned export read back with a day predicate must carry
    that predicate as a PartitionFilter on the scan — the executed
    plan's segment, not inputFiles(), is the authoritative signal —
    while a non-partitioned scan reports '' (the helper's 'absent'
    path, r13 advice: no bare ValueError on missing brackets)."""
    from parquet_export_spark.export.writer import write_table
    from parquet_export_spark.tables import TableSpec

    ev = spark.range(200).select(
        F.col("id").alias("event_id"),
        F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 4).cast("int")).alias("day"),
        (F.col("id") * 2).alias("value"),
    )
    spec = TableSpec(name="events_p", datatypes={}, rows_per_file=1000)
    write_table(ev, str(tmp_path), spec, partition_by=["day"])
    pruned = spark.read.parquet(str(tmp_path) + "/events_p").filter(
        F.col("day") == F.lit("2024-01-02").cast("date")
    )
    assert pruned.count() == 50
    seg = P.partition_filters(pruned)
    assert seg.startswith("PartitionFilters: [") and "day" in seg, seg
    # the 'absent' lane: an unpartitioned scan of the same data
    flat = spark.read.parquet(str(tmp_path) + "/events_p")
    flat.count()
    assert "day" not in P.partition_filters(
        flat.filter(F.col("value") > 100)
    )


def test_certificate_frames_materialize_once(spark, sf_dir):
    """Round-14 regression pins for the branch-recompute class: a
    bounded certificate frame consumed by several plan branches must
    be checkpoint-materialized, so the executed plan DOWNSTREAM of the
    checkpoints carries none of the upstream corpus work. Each pin is
    a hard zero — the corpus kernels/scans run exactly once, at
    materialization time, regardless of how many branches consume the
    frame (the defect was invisible at test SF and linear-in-corpus
    at scale)."""
    cases = {
        # twin: (pattern that must NOT appear downstream)
        "pq_topk": r"ArrowEvalPython|Scan parquet",
        "neardup_minhash_lsh": r"Scan parquet",
        "label_pca": r"FlatMapGroupsInPandas",
    }
    for name, pat in cases.items():
        df = REGISTRY[name].fn(spark, sf_dir)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        hits = len(re.findall(pat, plan))
        assert hits == 0, (
            f"{name}: {hits} upstream node(s) re-appear downstream of "
            f"the certificate checkpoint — a consumer branch is "
            f"re-running the corpus pipeline"
        )


def test_no_duplicate_hot_nodes_in_sweep_twins(spark, sf_dir):
    """Round-14 generalized branch-recompute detector: exact-duplicate
    kernel/scan node lines in the executed FINAL plan mean the same
    logical frame was instantiated twice — a consumer branch re-running
    its upstream pipeline. Swept here over the seven twins the r14
    audit fixed (the fleet-wide sweep is `python -m parquet_export_spark
    plan-audit`, run per-round; this pin keeps the fixed class fixed)."""
    names = [
        "pq_topk", "label_pca", "ann_lsh_neighbors",
        "neardup_minhash_lsh", "semdedup_embedding",
        "bpe_encode_corpus", "fuzzy_dedup_keep",
    ]
    bad = {}
    for name in names:
        dups = P.duplicate_hot_nodes(REGISTRY[name].fn(spark, sf_dir))
        if dups:
            bad[name] = dups
    assert not bad, bad
