"""Iterative graph analytics over the lake tables (SURVEY.md §2C).

The reference exports flat relational snapshots only (reference
main.py:200); graph-shaped questions over those snapshots — influence /
centrality of entities in the order graph — need an iterative
distributed algorithm, a class the registry otherwise pins only through
connected components (dedup.neardup_clusters).

``pagerank_orders_graph`` is the oracle-checked representative of that
class: PageRank over the customer<->supplier trade graph computed in
FIXED-POINT INTEGER arithmetic, so every iteration is exact,
order-independent, and bit-identical across engines — the DuckDB oracle
replays the same iterations as unrolled CTEs and the driver hash-matches
the result. (Float PageRank would differ in the last ulp depending on
partition-sum order; scaled-integer mass with floor division removes
the ambiguity entirely.)

Scale design (100 TB): the edge list is built once from one
orders |><| lineitem join, de-duplicated, hash-partitioned by ``src``
and PERSISTED (sorted within partitions) — the in-memory relation
keeps partitioning and ordering metadata, unlike localCheckpoint, so
the per-iteration contribution join never re-exchanges or re-sorts
the edge side; only the node-sized rank table and the ``dst``
aggregation shuffle. Lineage is truncated
every other iteration so the plan stays constant-depth regardless of
iteration count. Rank mass is conserved (sum_r <= n_nodes * SCALE), so
with SCALE = 10^9 the 85 * sum multiply stays inside int64 up to
~10^8 nodes even if a single hub absorbed ALL mass. That envelope is
the ONLY guard: this package runs with spark.sql.ansi.enabled=false
(session.py), so beyond ~10^8 nodes int64 would wrap SILENTLY — past
that, lower SCALE or lift the accumulator to decimal(38,0) before
running.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: fixed-point scale: rank 1.0 == 10^9 units.
PAGERANK_SCALE = 1_000_000_000
#: damping factor 0.85 as an exact integer pair.
PAGERANK_DAMP_NUM = 85
PAGERANK_DAMP_DEN = 100
PAGERANK_ITERS = 8


def _trade_edges(t: dict[str, DataFrame]) -> DataFrame:
    """Directed edge list of the customer<->supplier trade graph.

    Node encoding keeps one integer id space: customer c -> 2c,
    supplier s -> 2s+1. Each distinct (customer, supplier) trading
    pair contributes both directions, so the random walk alternates
    sides and no node is a sink.
    """
    o = t["orders"].select(F.col("o_orderkey").alias("ok"), "o_custkey")
    li = t["lineitem"].select(F.col("l_orderkey").alias("ok"), "l_suppkey")
    pairs = (
        o.join(li, "ok")
        .select(
            (F.col("o_custkey") * 2).alias("cust_node"),
            (F.col("l_suppkey") * 2 + 1).alias("supp_node"),
        )
        .distinct()
    )
    return pairs.select(
        F.col("cust_node").alias("src"), F.col("supp_node").alias("dst")
    ).unionByName(
        pairs.select(
            F.col("supp_node").alias("src"), F.col("cust_node").alias("dst")
        )
    )




def _edge_parallelism(df: DataFrame) -> int:
    """Edge-cache width: the cluster's core count (defaultParallelism),
    not spark.sql.shuffle.partitions — the cache is iterated 8+ times,
    so its layout should match available slots, and a plain session's
    200-partition default would schedule 200-task stages per iteration
    over any input size."""
    return max(df.sparkSession.sparkContext.defaultParallelism, 4)


def pagerank_orders_graph(
    t: dict[str, DataFrame], n_iter: int = PAGERANK_ITERS
) -> DataFrame:
    """Fixed-point PageRank over the customer<->supplier trade graph.

    r_{k+1}(n) = BASE + (85 * sum_{(m,n) in E} (r_k(m) div outdeg(m)))
                 div 100
    with BASE = (15 * SCALE) div 100 and r_0 = SCALE — all integer ops
    (floor division on non-negative values), hence exact and identical
    in any engine / any partition order. Per iteration: one src-hash
    join edge |><| rank (edge side pre-partitioned + checkpointed, so
    only the slim rank table moves) and one dst aggregation, summed in
    int64 (see the in-loop comment for the overflow proof).
    """
    # (src, dst, outdeg) in ONE materialization: outdeg folds in via a
    # src-partitioned window (one shuffle, which also leaves the edge
    # list hash-laid-out on src), then sorted within partitions and
    # PERSISTED — unlike localCheckpoint, the in-memory relation keeps
    # its partitioning AND ordering metadata, so no iteration ever
    # re-exchanges or re-sorts the (at scale: multi-TB) edge side;
    # only the node-sized rank table moves. Measured: the checkpoint
    # variant re-shuffled 1.17M edge rows EVERY iteration (plan
    # audit); this is the GraphX-style iterative edge cache.
    edges = _trade_edges(t)
    e2 = (
        edges.repartition(_edge_parallelism(edges), "src")
        .withColumn("outdeg", F.count(F.lit(1)).over(Window.partitionBy("src")))
        .sortWithinPartitions("src")
        .persist()
    )
    nodes = e2.select(F.col("src").alias("node")).distinct()

    base = (15 * PAGERANK_SCALE) // PAGERANK_DAMP_DEN
    ranks = nodes.select(
        "node", F.lit(PAGERANK_SCALE).cast("long").alias("r")
    )
    for i in range(n_iter):
        contrib = e2.join(
            ranks, e2["src"] == ranks["node"]
        ).select(
            F.col("dst"),
            F.expr("r div outdeg").alias("c"),
        )
        # the symmetrized graph gives EVERY node an in-edge (each edge
        # is mirrored), so the dst aggregate already covers the full
        # node set — no nodes-side left join per iteration (the oracle
        # keeps the defensive LEFT JOIN + COALESCE; equivalent here).
        #
        # int64 accumulation, not decimal(38,0): the whole-stage-
        # codegen long sum measured 5.5x faster than the BigDecimal
        # path, and it is provably safe — mass is conserved
        # (sum_r <= n_nodes * SCALE; floor division only sheds), so
        # 85 * sum(c) <= 85 * 1e8 * 1e9 < 2^63 up to ~1e8 nodes even
        # with every unit of mass on one hub. The envelope is the ONLY
        # guard: the session runs ansi.enabled=false, so beyond it the
        # sum wraps SILENTLY — at >1e8 nodes, lower SCALE or lift the
        # accumulator to decimal(38,0) first.
        ranks = contrib.groupBy("dst").agg(
            (
                F.lit(base)
                + F.expr(
                    f"{PAGERANK_DAMP_NUM} * sum(c) div {PAGERANK_DAMP_DEN}"
                )
            ).cast("long").alias("r")
        ).withColumnRenamed("dst", "node")
        if (i + 1) % 2 == 0 and i + 1 < n_iter:
            # constant-depth lineage across iterations
            ranks = ranks.localCheckpoint()
    # Materialize the node-sized result (eager, like the in-loop
    # checkpoints), then release the edge cache — otherwise every
    # invocation in a long-lived session pins the (at scale: multi-TB)
    # edge blocks until session end.
    ranks = ranks.localCheckpoint()
    e2.unpersist(blocking=False)
    return ranks.select(
        F.col("node").alias("node_id"),
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_kind"),
        F.expr("node div 2").alias("entity_key"),
        F.col("r").alias("rank_scaled"),
    ).orderBy(F.desc("rank_scaled"), "node_id")


def pagerank_oracle_sql(n_iter: int = PAGERANK_ITERS) -> str:
    """DuckDB oracle: the SAME fixed-point iterations, unrolled as
    chained CTEs (pr0..pr{n}) — aggregation inside a recursive CTE term
    is not portable, and unrolling keeps the arithmetic literally
    side-by-side with the Spark loop above. `//` (floor div) on
    non-negative values == Spark's `div`; DuckDB's SUM over BIGINT widens
    to int128 while Spark sums in int64 — identical values inside the
    proven no-overflow envelope (see pagerank_orders_graph)."""
    base = (15 * PAGERANK_SCALE) // PAGERANK_DAMP_DEN
    ctes = [
        """
        edges_d AS (
          SELECT DISTINCT o_custkey * 2 AS cust_node,
                          l_suppkey * 2 + 1 AS supp_node
          FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        edges AS (
          SELECT cust_node AS src, supp_node AS dst FROM edges_d
          UNION ALL
          SELECT supp_node AS src, cust_node AS dst FROM edges_d),
        nodes AS (SELECT DISTINCT src AS node FROM edges),
        deg AS (SELECT src AS node, COUNT(*) AS outdeg
                FROM edges GROUP BY src),
        pr0 AS (SELECT node, CAST({scale} AS BIGINT) AS r FROM nodes)
        """.format(scale=PAGERANK_SCALE)
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            """
        pr{i} AS (
          SELECT n.node,
                 CAST({base} + COALESCE(SUM(p.r // d.outdeg), 0)
                      * {num} // {den} AS BIGINT) AS r
          FROM nodes n
          LEFT JOIN edges e ON e.dst = n.node
          LEFT JOIN pr{prev} p ON p.node = e.src
          LEFT JOIN deg d ON d.node = e.src
          GROUP BY n.node)
            """.format(
                i=i,
                prev=i - 1,
                base=base,
                num=PAGERANK_DAMP_NUM,
                den=PAGERANK_DAMP_DEN,
            )
        )
    return (
        "WITH "
        + ",".join(ctes)
        + """
        SELECT node AS node_id,
               CASE WHEN node % 2 = 0 THEN 'customer'
                    ELSE 'supplier' END AS node_kind,
               node // 2 AS entity_key,
               r AS rank_scaled
        FROM pr{n}
        ORDER BY rank_scaled DESC, node_id
        """.format(n=n_iter)
    )


CC_ITERS = 8


def cc_trade_graph(
    t: dict[str, DataFrame], n_iter: int = CC_ITERS
) -> DataFrame:
    """Fixed-iteration connected components (min-label propagation)
    over the trade graph — the second oracle-checked iterative
    algorithm (PageRank propagates mass; this propagates a min, the
    semiring the to-convergence variant in dedup.neardup_clusters
    runs, here with a FIXED iteration count so the result is a pure
    function of the input and the DuckDB oracle can replay it).

    label_k(n) = min(label_{k-1}(n), min over neighbors m of
    label_{k-1}(m)); label_0(n) = n. After k iterations every node
    holds the minimum node id within k hops — on this graph (dense
    bipartite, small diameter) 8 iterations reach the true components;
    on an adversarial path graph the same code is simply run with a
    larger ``n_iter`` (doubling via pointer-jumping is the next gear,
    at the cost of mutating the edge set per round).

    Per iteration: one src-hash join against the pinned edge layout +
    one min-aggregate — same constant-depth, checkpoint-truncated
    shape as :func:`pagerank_orders_graph`.
    """
    # same iterative edge cache as pagerank_orders_graph: partitioning
    # + ordering survive persist, so iterations never re-exchange edges
    edges = _trade_edges(t)
    e = (
        edges.repartition(_edge_parallelism(edges), "src")
        .sortWithinPartitions("src")
        .persist()
    )
    labels = e.select(F.col("src").alias("node")).distinct().withColumn(
        "l", F.col("node")
    )
    for i in range(n_iter):
        neigh = e.join(labels, e["src"] == labels["node"]).select(
            F.col("dst").alias("node"), "l"
        )
        labels = (
            neigh.unionByName(labels.select("node", "l"))
            .groupBy("node")
            .agg(F.min("l").alias("l"))
        )
        if (i + 1) % 2 == 0 and i + 1 < n_iter:
            labels = labels.localCheckpoint()
    # eager materialize + release the edge cache (see pagerank)
    labels = labels.localCheckpoint()
    e.unpersist(blocking=False)
    return (
        labels.select(
            F.col("node").alias("node_id"),
            F.when(F.col("node") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("node_kind"),
            F.col("l").alias("component"),
        )
        .orderBy("node_id")
    )


def cc_oracle_sql(n_iter: int = CC_ITERS) -> str:
    """DuckDB oracle for :func:`cc_trade_graph`: the same min-label
    iterations unrolled as chained CTEs over the same edge list."""
    ctes = [
        """
        edges_d AS (
          SELECT DISTINCT o_custkey * 2 AS cust_node,
                          l_suppkey * 2 + 1 AS supp_node
          FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        edges AS (
          SELECT cust_node AS src, supp_node AS dst FROM edges_d
          UNION ALL
          SELECT supp_node AS src, cust_node AS dst FROM edges_d),
        cc0 AS (SELECT DISTINCT src AS node, src AS l FROM edges)
        """
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            """
        cc{i} AS (
          SELECT node, MIN(l) AS l FROM (
            SELECT e.dst AS node, p.l
            FROM edges e JOIN cc{prev} p ON p.node = e.src
            UNION ALL
            SELECT node, l FROM cc{prev})
          GROUP BY node)
            """.format(i=i, prev=i - 1)
        )
    return (
        "WITH "
        + ",".join(ctes)
        + """
        SELECT node AS node_id,
               CASE WHEN node % 2 = 0 THEN 'customer'
                    ELSE 'supplier' END AS node_kind,
               l AS component
        FROM cc{n}
        ORDER BY node_id
        """.format(n=n_iter)
    )


SSSP_ITERS = 8


def sssp_trade_graph(
    t: dict[str, DataFrame], n_iter: int = SSSP_ITERS
) -> DataFrame:
    """Fixed-iteration single-source shortest paths (hop counts) from
    the minimum supplier node — the min-plus semiring completing the
    graph suite (PageRank: weighted mass; CC: min-label; SSSP:
    min-distance — the recursive-query/BFS family of an analytics
    engine, expressed as the same bounded iteration).

    Frontier-growth formulation: dist starts as the single source row
    (hop 0) and each iteration extends it one hop — dist_{k+1} =
    min-by-node(dist_k union (edges |><| dist_k).dst + 1). Nodes not
    yet reached are simply ABSENT (no INF sentinel rows), so early
    iterations join a tiny reached-set (broadcastable frontier) rather
    than the full node table, and unreachable nodes never materialize
    at all — the reached table IS the result. After k iterations every
    node within k hops holds its true hop count; all-integer, exact on
    both engines, oracle replays the iterations as unrolled CTEs. The
    source (min supplier node) is derived IN the plan via a 1-row
    broadcast — no driver collect.

    Same pinned-edge / constant-depth-lineage shape as the other two.
    """
    edges = _trade_edges(t)
    e = (
        edges.repartition(_edge_parallelism(edges), "src")
        .sortWithinPartitions("src")
        .persist()
    )
    src_row = e.filter(F.col("src") % 2 == 1).agg(
        F.min("src").alias("node")
    )
    dist = src_row.select("node", F.lit(0).cast("long").alias("d"))
    for i in range(n_iter):
        neigh = e.join(dist, e["src"] == dist["node"]).select(
            F.col("dst").alias("node"),
            (F.col("d") + 1).alias("d"),
        )
        dist = (
            neigh.unionByName(dist)
            .groupBy("node")
            .agg(F.min("d").alias("d"))
        )
        if (i + 1) % 2 == 0 and i + 1 < n_iter:
            dist = dist.localCheckpoint()
    # eager materialize + release the edge cache (see pagerank)
    dist = dist.localCheckpoint()
    e.unpersist(blocking=False)
    return (
        dist.select(
            F.col("node").alias("node_id"),
            F.when(F.col("node") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("node_kind"),
            F.col("d").alias("hops"),
        )
        .orderBy("node_id")
    )


def sssp_oracle_sql(n_iter: int = SSSP_ITERS) -> str:
    """DuckDB oracle for :func:`sssp_trade_graph`: identical min-plus
    iterations, unrolled."""
    ctes = [
        """
        edges_d AS (
          SELECT DISTINCT o_custkey * 2 AS cust_node,
                          l_suppkey * 2 + 1 AS supp_node
          FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        edges AS (
          SELECT cust_node AS src, supp_node AS dst FROM edges_d
          UNION ALL
          SELECT supp_node AS src, cust_node AS dst FROM edges_d),
        d0 AS (SELECT MIN(src) AS node, CAST(0 AS BIGINT) AS d
               FROM edges WHERE src % 2 = 1)
        """
    ]
    for i in range(1, n_iter + 1):
        ctes.append(
            """
        d{i} AS (
          SELECT node, MIN(d) AS d FROM (
            SELECT e.dst AS node, p.d + 1 AS d
            FROM edges e JOIN d{prev} p ON p.node = e.src
            UNION ALL
            SELECT node, d FROM d{prev})
          GROUP BY node)
            """.format(i=i, prev=i - 1)
        )
    return (
        "WITH "
        + ",".join(ctes)
        + """
        SELECT node AS node_id,
               CASE WHEN node % 2 = 0 THEN 'customer'
                    ELSE 'supplier' END AS node_kind,
               d AS hops
        FROM d{n}
        ORDER BY node_id
        """.format(n=n_iter)
    )
