"""Similarity search over embedding columns (SURVEY.md §2C).

- **Brute-force cosine top-k** (the correctness baseline): broadcast
  the query vectors, compute cosine with JVM array expressions
  (zip_with/aggregate — no Python in the loop), take top-k per query
  with a window. Oracle-checkable: both engines evaluate the same
  cast-to-double-then-multiply-accumulate expression left-to-right, so
  the doubles are bit-identical.
- **LSH-bucketed ANN** (the scale path): sign-random-projection
  bucketing; only same-bucket pairs are compared. Hash-derived
  projection vectors keep it deterministic without storing a model.
  Approximate -> rows-only check.

At 100 TB: brute force is O(n·q) per query batch — fine for small q
with a broadcast; the LSH variant turns it into a bucket equi-join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: cosine over float arrays, computed in double with explicit casts so
#: any engine reproduces the exact IEEE result (see module docstring).
_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
    " 0D, (acc, v) -> acc + v)"
)

#: per-label block cap for the exact all-pairs near-dup join: bounds the
#: worst case at O(cap²) pairs per label. Matches JACCARD_MAX_BLOCK —
#: same contract, same routing story (oversized blocks -> LSH/IVF).
EMBED_MAX_BLOCK = 100_000


def _cosine(a: str, b: str):
    dot = F.expr(_DOT.format(a=a, b=b))
    na = F.sqrt(F.expr(_DOT.format(a=a, b=a)))
    nb = F.sqrt(F.expr(_DOT.format(a=b, b=b)))
    return dot / (na * nb)


def _bucket_kernel(n_tables: int, planes_per_table: int):
    """pandas UDF: embedding -> one packed sign-bucket per LSH table."""
    from pyspark.sql.functions import pandas_udf

    planes = np.array(
        _planes(n_tables * planes_per_table), dtype="float64"
    )  # (T*P, dim)
    powers = 1 << np.arange(planes_per_table, dtype="int64")

    @pandas_udf("array<long>")
    def kernel(x: pd.Series) -> pd.Series:
        m = np.stack(x.to_numpy()).astype("float64")  # (n, dim)
        signs = (m @ planes.T) >= 0  # (n, T*P)
        per_table = signs.reshape(len(m), n_tables, planes_per_table)
        buckets = (per_table * powers).sum(axis=2)  # (n, T)
        return pd.Series(list(buckets))

    return kernel


def _cosine_batch(a: str, b: str):
    """Arrow-batched numpy cosine — for high-cardinality verification
    loops where interpreted HOF lambdas dominate. (Not used for
    oracle-checked queries: numpy's pairwise summation differs from
    sequential fold at the last ulp.)"""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def kernel(xa: pd.Series, xb: pd.Series) -> pd.Series:
        ma = np.stack(xa.to_numpy()).astype("float64")
        mb = np.stack(xb.to_numpy()).astype("float64")
        dots = np.einsum("ij,ij->i", ma, mb)
        return pd.Series(
            dots / (np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1))
        )

    return kernel(F.col(a), F.col(b))


def cosine_topk(t: dict[str, DataFrame], n_queries: int = 5, k: int = 10) -> DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries`` vectors.

    Rounded to 9 decimals before ranking so rank boundaries are stable
    across engines; ties broken by neighbor id.
    """
    emb = t["embeddings"]
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    pairs = emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    sim = F.round(_cosine("q_emb", "embedding"), 9)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        pairs.select(
            "query_id", F.col("vec_id").alias("neighbor_id"), sim.alias("sim")
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def embedding_norms(t: dict[str, DataFrame]) -> DataFrame:
    """Per-vector L2 norm + dimension — cheap full-scan vector op."""
    norm = F.sqrt(F.expr(_DOT.format(a="embedding", b="embedding")))
    return (
        t["embeddings"]
        .select(
            "vec_id",
            "label",
            F.size("embedding").alias("dim"),
            F.round(norm, 9).alias("l2_norm"),
        )
        .orderBy("vec_id")
    )


def label_centroid_sim(t: dict[str, DataFrame]) -> DataFrame:
    """Average pairwise-ish structure: cosine of each vector against its
    label centroid. Exercises groupBy over vector columns (per-dim
    aggregation via posexplode) — all JVM.

    Deterministic: centroid components are exact-decimal means.
    """
    emb = t["embeddings"]
    exploded = emb.select("vec_id", "label", F.posexplode("embedding").alias("pos", "v"))
    centroids = (
        exploded.groupBy("label", "pos")
        .agg(
            # float -> double first: engines disagree on float->decimal
            # directly; the double's exact binary expansion rounded at
            # scale 20 is engine-independent (no dyadic half-way cases).
            (
                F.sum(F.col("v").cast("double").cast("decimal(38,20)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("c")
        )
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select("label", F.expr("transform(pc, x -> x.c)").alias("centroid"))
    )
    joined = emb.join(F.broadcast(centroids), "label")
    sim = F.round(_cosine("embedding", "centroid"), 9)
    return (
        joined.select("vec_id", "label", sim.alias("centroid_sim"))
        .orderBy("vec_id")
    )


def neardup_embedding(
    t: dict[str, DataFrame], max_block_size: int = EMBED_MAX_BLOCK
) -> DataFrame:
    """Embedding-cosine near-duplicate candidates: every vector's
    nearest same-label neighbor with its exact cosine score.

    The embedding analog of the text near-dup detectors: a curation
    pipeline thresholds ``cosine`` downstream to drop semantic
    duplicates. Blocked on ``label`` (the coarse partition an upstream
    clusterer or classifier provides), so the self-join is bounded per
    block — the same exact-baseline role ``neardup_jaccard_blocked``
    plays for token sets.

    **Hard per-block bound**: labels with more than ``max_block_size``
    vectors are dropped BEFORE the self-join (count window over the
    join's own ``label`` partitioning — no extra scan/exchange, the
    `_capped_blocks` pattern from the jaccard family). The worst case
    is therefore O(max_block_size²) pairs per label regardless of the
    corpus: a hot label at 100 TB cannot go quadratic here by
    contract. Oversized labels belong to the scale path — the LSH
    bucket join (``ann_lsh_neighbors``) or IVF cells (``ivf_topk``).
    The oracle mirrors the cap with a HAVING-count block filter.

    Exact, deterministic (left-fold double dot products, round 9,
    ties on neighbor id) -> full DuckDB oracle.
    """
    from parquet_export_spark.operators.dedup import _fanout_partitions

    emb = t["embeddings"]
    emb = emb.repartition(_fanout_partitions(emb), "label")
    block_n = F.count(F.lit(1)).over(Window.partitionBy("label"))
    emb = (
        emb.withColumn("block_n", block_n)
        .filter(F.col("block_n") <= max_block_size)
        .drop("block_n")
    )
    # Norms are computed ONCE per vector before the self-join — each of
    # the O(block^2) pairs then folds only the 64-element dot product
    # instead of three folds (same IEEE doubles as the oracle: it also
    # multiplies the two sqrt'd self-dots).
    emb = emb.withColumn(
        "nrm", F.sqrt(F.expr(_DOT.format(a="embedding", b="embedding")))
    )
    # Probe side round-robin across all cores: the pair stage is
    # quadratic per label while the partitioning above is sized for the
    # linear norm stage, and the build side broadcasts (no co-location
    # needed) — same starvation fix as the jaccard pair-scan.
    cores = emb.sparkSession.sparkContext.defaultParallelism
    a = emb.repartition(max(cores, 2)).select(
        "label",
        F.col("vec_id").alias("va"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = emb.select(
        "label",
        F.col("vec_id").alias("vb"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    dot = F.expr(_DOT.format(a="ea", b="eb"))
    sim = F.round(dot / (F.col("na") * F.col("nb")), 9)
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        a.join(b, "label")
        .filter(F.col("va") != F.col("vb"))
        .select(
            F.col("va").alias("vec_id"),
            "label",
            F.col("vb").alias("neighbor_id"),
            sim.alias("cosine"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .orderBy("vec_id")
    )


def ivf_topk(
    t: dict[str, DataFrame],
    n_queries: int = 5,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
) -> DataFrame:
    """IVF-style ANN: KMeans coarse quantizer -> probe the n_probe
    nearest cells per query -> exact cosine within probed cells.

    The scale path for ANN when LSH recall is insufficient: the index
    is a cell assignment (one int per vector); a query touches
    n_probe/n_cells of the corpus. KMeans seed fixed for determinism.
    Approximate (cell boundaries) -> rows-only driver check.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    emb = t["embeddings"].withColumn(
        "features", array_to_vector(F.col("embedding").cast("array<double>"))
    )
    km = KMeans(k=n_cells, seed=42, featuresCol="features", predictionCol="cell")
    model = km.fit(emb)
    assigned = model.transform(emb).select("vec_id", "embedding", "cell")
    centers = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    spark = emb.sparkSession
    centers_df = spark.createDataFrame(centers, ["cell", "center"])
    queries = assigned.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    # rank cells per query by centroid similarity, keep n_probe
    qc = queries.crossJoin(F.broadcast(centers_df))
    cell_sim = _cosine("q_emb", "center")
    w = Window.partitionBy("query_id").orderBy(F.desc("cell_sim"), "cell")
    probed = (
        qc.select("query_id", "q_emb", "cell", cell_sim.alias("cell_sim"))
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= n_probe)
        .select("query_id", "q_emb", "cell")
    )
    # exact cosine within probed cells only
    pairs = probed.join(assigned, "cell").filter(
        F.col("vec_id") != F.col("query_id")
    )
    sim = F.round(_cosine("q_emb", "embedding"), 9)
    w2 = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        pairs.select("query_id", F.col("vec_id").alias("neighbor_id"), sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


# --------------------------------------------------------------------------
# LSH ANN (scale path; rows-only)
# --------------------------------------------------------------------------

N_PLANES = 12


import random as _random

_DIM = 64  # embeddings table dimension (TESTDATA.md fixture)


def _planes(n: int) -> list[list[float]]:
    """First ``n`` seeded projection planes. Generated on demand from a
    fixed seed so any (n_tables, planes_per_table) config gets exactly
    the planes it asks for — a fixed pool silently truncates larger
    configs (reshape crash). Prefix-stable: plane i is identical for
    every n, so growing the config never rehashes existing buckets."""
    rng = _random.Random(0x9A17)
    return [
        [rng.uniform(-0.5, 0.5) for _ in range(_DIM)] for _ in range(n)
    ]


_PLANES: list[list[float]] = _planes(16)


def ann_lsh_buckets(t: dict[str, DataFrame], n_planes: int = N_PLANES) -> DataFrame:
    """Sign-random-projection bucket id per vector.

    Projection vectors are fixed pseudo-random constants (seeded) baked
    into the plan as array literals — the per-element lambda is a bare
    multiply, nothing recomputed per row. Bucket = packed sign bits.
    """
    emb = t["embeddings"]
    plane_exprs = []
    for p in range(n_planes):
        weights = ", ".join(f"{w}D" for w in _PLANES[p])
        dot = (
            f"aggregate(zip_with(embedding, array({weights}), "
            f"(x, w) -> CAST(x AS DOUBLE) * w), 0D, (acc, v) -> acc + v)"
        )
        plane_exprs.append(f"(CASE WHEN ({dot}) >= 0 THEN {1 << p} ELSE 0 END)")
    bucket = F.expr(" + ".join(plane_exprs)).cast("long")
    return emb.select("vec_id", "label", bucket.alias("bucket")).orderBy("vec_id")


def ann_lsh_neighbors(
    t: dict[str, DataFrame],
    threshold: float = 0.4,
    n_tables: int = 2,
    planes_per_table: int = 6,
) -> DataFrame:
    """Approximate similar pairs: same bucket in ANY of ``n_tables``
    LSH tables (OR-amplification), verified by exact cosine.

    Each table uses its own ``planes_per_table`` sign-projection bits;
    a candidate pair needs a full bucket match in at least one table —
    recall amplifies with n_tables while each table's equi-join stays
    selective. The exact-cosine verification keeps precision at 1.
    """
    emb = t["embeddings"]
    # All n_tables × planes_per_table projections in ONE numpy matmul
    # per Arrow batch (the per-element JVM lambda alternative is ~10×
    # slower at this fan-in), then explode to (vec_id, tbl, bucket).
    # The repartition boundary materializes bucketing once for both
    # self-join branches (ReusedExchange).
    kernel = _bucket_kernel(n_tables, planes_per_table)
    bucketed = (
        emb.select("vec_id", kernel(F.col("embedding")).alias("buckets"))
        .select("vec_id", F.posexplode("buckets").alias("tbl", "bucket"))
        .repartition("tbl", "bucket")
    )
    cand = (
        bucketed.alias("x")
        .join(
            bucketed.alias("y"),
            (F.col("x.tbl") == F.col("y.tbl"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(F.col("x.vec_id").alias("vec_a"), F.col("y.vec_id").alias("vec_b"))
        .distinct()
    )
    # Verification over the candidate set is the hot loop (tens of
    # thousands of 64-dim dots): Arrow-batched numpy beats interpreted
    # higher-order-function lambdas by an order of magnitude here —
    # exactly the "vectorized Python at the edge" case. Norms are
    # folded into the same kernel.
    ea = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    eb = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select("vec_a", "vec_b", F.round(_cosine_batch("emb_a", "emb_b"), 9).alias("sim"))
        .filter(F.col("sim") >= threshold)
        .orderBy("vec_a", "vec_b")
    )


# --------------------------------------------------------------------------
# SemDeDup: cluster-then-prune semantic dedup (scale path; rows-only)
# --------------------------------------------------------------------------


def semdedup_embedding(
    t: dict[str, DataFrame],
    n_cells: int = 16,
    threshold: float = 0.95,
    max_block_size: int = 10_000,
) -> DataFrame:
    """Semantic dedup in the published SemDeDup shape: KMeans-cluster
    the embeddings, then inside each cluster drop every vector whose
    cosine to a LOWER-id cluster-mate reaches the threshold (the
    deterministic stand-in for "keep one per duplicate pair").

    Clustering makes the quadratic step local: pairwise cosine runs
    within a cell, never across the corpus, and cells beyond
    ``max_block_size`` are excluded from the exact scan (the same
    routing contract as the jaccard family — a corpus whose cells
    outgrow the cap belongs to ``ann_lsh_neighbors`` pre-filtering).
    KMeans seed fixed; approximate (cell boundaries) -> rows-only
    driver check; the keep/drop contract is pinned by a pytest
    property instead (every dropped vector has a kept lower-id
    near-neighbor; every kept vector has none).

    Returns survivors: (vec_id, cell, n_cell_mates).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import Window

    emb = t["embeddings"].withColumn(
        "features", array_to_vector(F.col("embedding").cast("array<double>"))
    )
    km = KMeans(k=n_cells, seed=42, featuresCol="features", predictionCol="cell")
    assigned = (
        km.fit(emb)
        .transform(emb)
        .select("vec_id", "embedding", "cell")
        .withColumn(
            "nrm", F.sqrt(F.expr(_DOT.format(a="embedding", b="embedding")))
        )
    )
    cell_n = F.count(F.lit(1)).over(Window.partitionBy("cell"))
    assigned = (
        assigned.repartition("cell")
        .withColumn("n_cell_mates", cell_n)
        .filter(F.col("n_cell_mates") <= max_block_size)
    )
    a = assigned.select(
        "cell",
        F.col("vec_id").alias("va"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = assigned.select(
        "cell",
        F.col("vec_id").alias("vb"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    dot = F.expr(_DOT.format(a="ea", b="eb"))
    sim = dot / (F.col("na") * F.col("nb"))
    dropped = (
        a.join(b, "cell")
        .filter(F.col("vb") < F.col("va"))  # only lower-id mates matter
        .filter(sim >= threshold)
        .select(F.col("va").alias("vec_id"))
        .distinct()
    )
    return (
        assigned.join(dropped, "vec_id", "left_anti")
        .select("vec_id", "cell", "n_cell_mates")
        .orderBy("vec_id")
    )
