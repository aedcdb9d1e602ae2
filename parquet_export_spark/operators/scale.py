"""Scale patterns as first-class operators (SURVEY.md §7.4 rules).

- **Salted aggregation**: two-phase groupBy for skewed keys — phase 1
  aggregates (key, salt) partials, phase 2 merges per key. Results are
  identical to a plain groupBy (so it carries a DuckDB oracle); the
  point is the shuffle histogram: no single reducer owns a hot key.
- **Bucketed co-located join**: persist both join sides bucketed by
  the join key; subsequent joins read bucket-aligned partitions and
  skip the shuffle entirely (verified by plan assertion in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_export_spark.functions.scalar import dsum

N_SALTS = 16


def salted_agg_user_value(t: dict[str, DataFrame], n_salts: int = N_SALTS) -> DataFrame:
    """Per-user event totals via salt -> partial -> merge.

    A plain ``groupBy(user_id)`` sends every row of a hot user to one
    reducer; salting spreads each key over ``n_salts`` partials first.
    Counts and exact-decimal sums re-aggregate losslessly.
    """
    ev = t["events"]
    salted = ev.withColumn("_salt", F.pmod(F.col("event_id"), F.lit(n_salts)))
    partial = salted.groupBy("user_id", "_salt").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("value").cast("decimal(30,6)")).alias("_v"),
    )
    return (
        partial.groupBy("user_id")
        .agg(
            F.sum("_n").alias("n_events"),
            F.sum("_v").cast("double").alias("total_value"),
        )
        .orderBy("user_id")
    )


def write_bucketed(
    spark: SparkSession,
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
) -> None:
    """Persist a bucketed managed table (bucket pruning + shuffle-free
    joins on the bucket column)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_join_revenue(spark: SparkSession) -> DataFrame:
    """Join two pre-bucketed tables on the bucket key.

    With both sides bucketed by the key into the same bucket count,
    Catalyst plans a SortMergeJoin with NO Exchange on either side —
    at 100 TB this removes the dominant shuffle of fact-fact joins.
    Requires ``write_bucketed`` to have materialized
    ``bkt_lineitem`` / ``bkt_orders``.
    """
    li = spark.table("bkt_lineitem")
    o = spark.table("bkt_orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=6).alias(
                "revenue"
            )
        )
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# Bloom-filter semi-join pruning (runtime-filter pattern, made explicit)
# --------------------------------------------------------------------------

BLOOM_BITS = 4096  #: 64 longs — a few KB broadcast regardless of fact size
BLOOM_HASHES = 3


def _bloom_member_expr(key: str, bf_col: str = "bf") -> str:
    """SQL predicate: all BLOOM_HASHES positions of ``key`` are set in
    the broadcast bloom word-array ``bf_col`` (1-indexed element_at).

    The key is cast to bigint before hashing — Spark's xxhash64 is
    TYPE-sensitive (xxhash64(5::int) != xxhash64(5::bigint)), so
    without the normalization an int/bigint drift between the fact and
    dimension key columns would silently produce false NEGATIVES,
    which the exact join downstream cannot recover."""
    tests = []
    for i in range(BLOOM_HASHES):
        p = f"pmod(xxhash64(cast({key} as bigint), {i}), {BLOOM_BITS})"
        tests.append(
            f"(element_at({bf_col}, cast({p} / 64 as int) + 1)"
            f" & shiftleft(1L, cast({p} % 64 as int))) != 0"
        )
    return " AND ".join(tests)


def _bloom_build_expr(key: str) -> str:
    """SQL expression: the per-key bloom word-array (BLOOM_HASHES bits
    set across BLOOM_BITS/64 longs). Shares the cast-to-bigint key
    normalization with :func:`_bloom_member_expr` — build and probe
    MUST hash identically or members go missing."""
    words = BLOOM_BITS // 64
    k = f"cast({key} as bigint)"
    return (
        f"transform(sequence(0, {words - 1}), w -> aggregate("
        f" sequence(0, {BLOOM_HASHES - 1}), 0L,"
        f" (acc, i) -> IF(cast(pmod(xxhash64({k}, i),"
        f" {BLOOM_BITS}) / 64 as int) = w,"
        f" acc | shiftleft(1L, cast(pmod(xxhash64({k}, i),"
        f" {BLOOM_BITS}) % 64 as int)), acc)))"
    )


def bloom_prune_orders(
    t: dict[str, DataFrame], min_acctbal: float = 5000.0
) -> DataFrame:
    """Revenue of orders placed by high-balance BUILDING-segment
    customers, with the fact side pruned by a hand-built Bloom filter
    BEFORE the join shuffle — the runtime-filter pattern (Spark's
    row-level runtime filtering / DPP sibling) made explicit and
    testable.

    Why this matters at 100 TB: the selective dimension predicate
    lives on ``customer``; without a runtime filter every orders row
    shuffles into the join. The Bloom build is two map-side-combinable
    aggregations (``bit_or`` per word — never a driver collect), its
    ~KB word-array broadcasts to the fact scan, and the membership
    test drops non-matching orders AT THE SCAN, so shuffle volume is
    proportional to the segment, not the fact table. False positives
    are removed by the exact join that follows — the result is EXACT
    (oracle = plain join), false negatives are impossible by
    construction (every inserted key sets exactly the bits the probe
    tests).

    Determinism: xxhash64 positions, integer bit ops, exact-decimal
    revenue sum.
    """
    from parquet_export_spark.functions.scalar import dsum

    words = BLOOM_BITS // 64
    seg = t["customer"].filter(
        (F.col("c_mktsegment") == "BUILDING")
        & (F.col("c_acctbal") > min_acctbal)
    )
    sig = F.expr(_bloom_build_expr("c_custkey"))
    bloom = (
        seg.select(sig.alias("sig"))
        .agg(
            F.array(
                *[F.bit_or(F.col("sig")[w]) for w in range(words)]
            ).alias("bf")
        )
    )
    pruned = (
        t["orders"]
        .crossJoin(F.broadcast(bloom))
        .filter(F.expr(_bloom_member_expr("o_custkey")))
    )
    return (
        pruned.join(
            seg.select("c_custkey", "c_acctbal"),
            pruned.o_custkey == F.col("c_custkey"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


def salted_skew_join(t: dict[str, DataFrame], n_salts: int = N_SALTS) -> DataFrame:
    """Salted shuffle join for a skewed fact key: the JOIN-side twin of
    :func:`salted_agg_user_value` (that one salts an aggregation; this
    salts a join), i.e. the manual version of what AQE skew-join
    splitting does at runtime — kept explicit because a static salt
    works on any Spark and on engines without AQE, and the plan is
    testable.

    Fact rows (events) get a deterministic salt from a NON-KEY column
    (pmod(event_id, n_salts) — salting must not depend on the join key
    or hot keys land on one salt again); the dimension (customer) is
    REPLICATED n_salts times via a generated salt array + explode, and
    the join key becomes (user_id = c_custkey AND salt = salt). Every
    reducer then owns 1/n_salts of any hot user. Results are identical
    to the plain join (the oracle IS the plain join + aggregate);
    replication cost is n_salts * |dim| rows — the technique for dims
    too large to broadcast but small enough to replicate, the gap AQE
    covers adaptively and this covers deterministically.
    """
    ev = t["events"].withColumn(
        "_salt", F.pmod(F.col("event_id"), F.lit(n_salts))
    )
    # shuffle_hash hint: salting only matters when the dim CANNOT
    # broadcast — at test scale Spark would broadcast the replicated
    # dim and no salted exchange would exist to demonstrate or pin.
    # The hint forces the real big-dim plan: both sides hash-exchange
    # on (key, salt), which is the shuffle histogram the salt fixes.
    dim = t["customer"].select(
        "c_custkey",
        "c_mktsegment",
        F.explode(
            F.array(*[F.lit(i) for i in range(n_salts)])
        ).alias("_salt"),
    ).hint("shuffle_hash")
    return (
        ev.join(
            dim,
            (ev["user_id"] == dim["c_custkey"])
            & (ev["_salt"] == dim["_salt"]),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", scale=6).alias("total_value"),
        )
        .orderBy("c_mktsegment")
    )
