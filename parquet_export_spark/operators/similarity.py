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


#: rows the coarse-quantizer fit sees at most; SemDeDup/IVF practice —
#: centroids from a bounded sample, assignment over everything.
KMEANS_FIT_CAP = 200_000


def _collect_fit_sample(
    emb: DataFrame, emb_col: str, fit_cap: int
) -> np.ndarray:
    """Bounded, deterministic fit sample in ONE distributed job.

    ``orderBy(xxhash64(vec)).limit(cap)`` plans as
    TakeOrderedAndProject — each partition keeps its local top-``cap``
    by the hash and the driver merges, so there is no full-sort shuffle
    and no separate ``count()`` scan (the previous two-scan shape paid
    a whole extra pass over the corpus lineage per fit). The hash order
    is a fixed uniform shuffle of the rows, so the prefix is an
    unbiased sample; identical input -> identical sample every run
    (the determinism the recall/parity tests pin). Driver memory is
    bounded by ``fit_cap`` rows regardless of corpus size.
    """
    rows = (
        emb.select(F.col(emb_col).cast("array<double>").alias("v"))
        .orderBy(F.xxhash64("v"))
        .limit(fit_cap)
        .collect()
    )
    return np.array([r[0] for r in rows])


def _fit_coarse_quantizer(
    emb: DataFrame, k: int, emb_col: str = "embedding", fit_cap: int = KMEANS_FIT_CAP
) -> np.ndarray:
    """Fit a KMeans coarse quantizer on a bounded sample; return the
    ``(k, dim)`` center matrix. Callers assign cells with
    :func:`_assign_cells` (one broadcast matmul pass, no model object).

    Two scale problems with ``pyspark.ml.KMeans().fit(full_corpus)``:

    - cost: Lloyd's is iterative (~20 passes). At 100 TB that is 20
      full-corpus scans for centroids that a 200k-row sample estimates
      just as well — the published IVF/SemDeDup recipe is sample-fit,
      full-assign, which bounds fit cost by ``fit_cap`` REGARDLESS of
      corpus size.
    - overhead: each k-means|| init round and each Lloyd iteration is
      a separate Spark job over the scan's partitioning. Measured at
      sf0.1/local[32]: 5.2 s to fit 2000 vectors — scheduling latency,
      not compute; coalescing the input still left 2.1 s of per-job
      floor. The fit input is bounded (≤ ``fit_cap`` rows ≈ 100 MB at
      dim 64), so the fit itself is NOT distributed work — collect the
      sample once and run seeded k-means++ / Lloyd's in numpy
      (~25 ms/iteration at the cap). Distributed cost is exactly one
      sample-scan (:func:`_collect_fit_sample` — the hash-ordered
      top-k, no separate count job); the iterative phase touches no
      executor.

    Deterministic sample + seeded numpy init on a deterministic
    lineage -> the same centers every run (the rows-only driver check
    and the pytest recall/keep-drop properties rely on run-to-run
    stability, not on specific center values).
    """
    x = _collect_fit_sample(emb, emb_col, fit_cap)
    return _kmeans_numpy(x, k, seed=42)


def _kmeans_numpy(x: np.ndarray, k: int, seed: int = 42) -> np.ndarray:
    """Seeded k-means++ / Lloyd's over an in-memory ``(n, dim)`` sample;
    returns the ``(k, dim)`` centers. The driver-side fit kernel shared
    by the coarse quantizer (IVF/SemDeDup) and the PQ codebooks."""
    rng = np.random.RandomState(seed)
    k = min(k, len(x))
    # k-means++ seeding, incremental min-distance form: O(n·dim) per
    # center, never materializing an (n, k, dim) broadcast.
    x_sq = (x**2).sum(axis=1)
    centers = x[[rng.randint(len(x))]]
    d2 = np.maximum(x_sq - 2 * x @ centers[0] + (centers[0] ** 2).sum(), 0)
    for _ in range(1, k):
        p = d2 / d2.sum() if d2.sum() > 0 else None
        c_new = x[rng.choice(len(x), p=p)]
        centers = np.vstack([centers, c_new])
        d2 = np.minimum(
            d2, np.maximum(x_sq - 2 * x @ c_new + (c_new**2).sum(), 0)
        )
    # Lloyd's
    for _ in range(20):
        d2 = (
            (x**2).sum(axis=1, keepdims=True)
            - 2 * x @ centers.T
            + (centers**2).sum(axis=1)[None, :]
        )
        lab = d2.argmin(axis=1)
        new = np.vstack(
            [x[lab == j].mean(axis=0) if (lab == j).any() else centers[j] for j in range(k)]
        )
        if np.allclose(new, centers):
            break
        centers = new
    return centers


def _assign_cells(df: DataFrame, centers: np.ndarray, emb_col: str = "embedding"):
    """Column: nearest-center index for ``emb_col``, one Arrow-batched
    matmul per batch against the broadcast ``(k, dim)`` center matrix
    (ties -> lowest cell id, matching euclidean argmin)."""
    from pyspark.sql.functions import pandas_udf

    c = centers.astype("float64")
    c_sq = (c**2).sum(axis=1)

    @pandas_udf("int")
    def kernel(x: pd.Series) -> pd.Series:
        m = np.stack(x.to_numpy()).astype("float64")
        d2 = -2 * (m @ c.T) + c_sq[None, :]  # ||x||² constant per row
        return pd.Series(d2.argmin(axis=1).astype("int32"))

    return kernel(F.col(emb_col))


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
    emb = t["embeddings"]
    centers = _fit_coarse_quantizer(emb, n_cells)
    assigned = emb.select(
        "vec_id", "embedding", _assign_cells(emb, centers).alias("cell")
    )
    spark = emb.sparkSession
    centers_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        ["cell", "center"],
    )
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
# persisted IVF index (fit-once / probe-many; rows-only)
# --------------------------------------------------------------------------


def ivf_index_artifact(
    emb: DataFrame, n_cells: int = 8, emb_col: str = "embedding"
) -> tuple[DataFrame, DataFrame]:
    """The persisted ANN index a production lake maintains — the
    fit-once/probe-many shape :func:`lake_minhash_artifact
    <parquet_export_spark.operators.dedup.lake_minhash_artifact>`
    already gives near-dup, applied to IVF (round-6 verdict #4:
    ``ivf_topk``/``pq_topk`` re-fit their quantizer per call — correct,
    but the production per-query cost must not include a corpus
    sample-fit): returns ``(centers, assigned)`` where ``centers`` is
    the (cell, center) coarse-quantizer table fit ONCE at index-build
    time from the bounded deterministic sample, and ``assigned`` the
    slim (vec_id, cell) corpus assignment computed once at ingest.
    Every later probe (:func:`ivf_probe_index`) reads these two
    tables and never touches the fit path again; new vectors are
    assigned against the STORED centers (one broadcast matmul), never
    re-fitting — history is never re-embedded or re-assigned, the
    ``neardup_incremental`` contract."""
    centers = _fit_coarse_quantizer(emb, n_cells, emb_col)
    spark = emb.sparkSession
    centers_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        ["cell", "center"],
    )
    assigned = emb.select(
        "vec_id", _assign_cells(emb, centers, emb_col).alias("cell")
    )
    return centers_df, assigned


def ivf_probe_index(
    queries: DataFrame,
    centers_df: DataFrame,
    assigned: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    emb_col: str = "embedding",
) -> DataFrame:
    """Answer top-k cosine ANN queries against a STORED IVF index —
    no quantizer fit anywhere in the plan. ``queries`` is
    (query_id, q_emb); ``centers_df``/``assigned`` are the artifact
    tables from :func:`ivf_index_artifact` (typically read back from
    parquet); ``corpus`` supplies (vec_id, embedding) for the exact
    re-rank.

    Plan contract (pinned in tests/test_plans.py against a
    parquet-backed artifact): the coarse quantizer is the stored
    ``centers`` table, broadcast (n_cells rows); cell routing is a
    per-query top-``n_probe`` window over that broadcast; the corpus
    embeddings appear in exactly ONE scan — the candidate gather join
    on vec_id — and are never re-assigned or re-fit. Per query the
    exact-cosine work touches ~n_probe/n_cells of the corpus, the IVF
    contract."""
    qc = queries.crossJoin(F.broadcast(centers_df))
    cell_sim = _cosine("q_emb", "center")
    w = Window.partitionBy("query_id").orderBy(F.desc("cell_sim"), "cell")
    probed = (
        qc.select("query_id", "q_emb", "cell", cell_sim.alias("cell_sim"))
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= n_probe)
        .select("query_id", "q_emb", "cell")
    )
    cand = probed.join(assigned, "cell").filter(
        F.col("vec_id") != F.col("query_id")
    )
    pairs = cand.join(
        corpus.select("vec_id", F.col(emb_col).alias("embedding")), "vec_id"
    )
    sim = F.round(_cosine("q_emb", "embedding"), 9)
    w2 = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        pairs.select(
            "query_id", F.col("vec_id").alias("neighbor_id"), sim.alias("sim")
        )
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def ivf_probe_incremental(
    t: dict[str, DataFrame],
    n_queries: int = 5,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
) -> DataFrame:
    """Registry entry for the stored-index probe: the artifact is
    derived in-query from the embeddings table (standing in for the
    persisted parquet a real lake maintains — the
    ``neardup_incremental`` convention; the index build is the
    once-per-vector ingest cost, and :func:`ivf_probe_index` is the
    API a query service calls against the stored tables). Probe
    results are pinned equal to the refit path (``ivf_topk``) on
    static data in pytest — same deterministic centers, same routing,
    same tie-breaks. Approximate (cell boundaries) -> rows-only
    driver check."""
    emb = t["embeddings"]
    centers_df, assigned = ivf_index_artifact(emb, n_cells)
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
    )
    return ivf_probe_index(
        queries, centers_df, assigned, emb, k=k, n_probe=n_probe
    )


def _probe_refit_parity(
    spine: DataFrame, probe: DataFrame, refit: DataFrame
) -> DataFrame:
    """Shared parity check for the stored-index probe twins (round-11,
    r10 verdict #5): per query, the probe frame must equal the refit
    frame row for row — same neighbor, same rounded similarity, same
    rank, no extra and no missing rows (full-outer on (query_id, rank)
    so a surplus on EITHER side counts as a mismatch). Returns one row
    per spine query: (query_id, probe_matches_refit)."""
    p = probe.select(
        "query_id",
        "rank",
        F.col("neighbor_id").alias("p_n"),
        F.col("sim").alias("p_s"),
    )
    r = refit.select(
        "query_id",
        "rank",
        F.col("neighbor_id").alias("r_n"),
        F.col("sim").alias("r_s"),
    )
    mism = (
        p.join(r, ["query_id", "rank"], "full")
        .groupBy("query_id")
        .agg(
            F.sum(
                F.when(
                    F.col("p_n").eqNullSafe(F.col("r_n"))
                    & F.col("p_s").eqNullSafe(F.col("r_s")),
                    0,
                ).otherwise(1)
            ).alias("n_mismatch")
        )
    )
    return (
        spine.join(mism, "query_id", "left")
        .select(
            "query_id",
            (F.coalesce(F.col("n_mismatch"), F.lit(0)) == 0).alias(
                "probe_matches_refit"
            ),
        )
        .orderBy("query_id")
    )


def ivf_probe_incremental_checked(
    t: dict[str, DataFrame],
    n_queries: int = 5,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
) -> DataFrame:
    """Driver-checkable twin of :func:`ivf_probe_incremental` (round-11,
    r10 verdict #5): the probe gear's DETERMINISTIC static-data
    contract — probe against the stored index == the refit path
    (:func:`ivf_topk`) EXACTLY, because the centers fit is
    deterministic (bounded hash-ordered sample + seeded k-means) and
    assignment/routing share one set of argmin/tie-break rules — is
    asserted IN-PLAN per query, so the driver's DuckDB hash covers the
    ANN gear class every round. The query spine (vec_id < n_queries)
    is SQL-expressible, so the oracle replays the rows and asserts the
    boolean TRUE. Neighbor ids/sims stay out of the hash
    (quantizer-dependent); their quality bounds stay in pytest."""
    emb = t["embeddings"]
    spine = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id")
    )
    return _probe_refit_parity(
        spine,
        ivf_probe_incremental(t, n_queries, k, n_cells, n_probe),
        ivf_topk(t, n_queries, k, n_cells, n_probe),
    )


def ivf_probe_incremental_checked_oracle_sql(n_queries: int = 5) -> str:
    return f"""
        SELECT vec_id AS query_id, TRUE AS probe_matches_refit
        FROM embeddings WHERE vec_id < {n_queries} ORDER BY query_id
        """


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

    Rows-only BY CHOICE (contrast ``ann_lsh_buckets``, which the r11
    oracle replays verbatim): the multi-table bucketing runs in the
    Arrow-batched numpy kernel whose matmul uses pairwise summation —
    deliberately NOT the left-fold IEEE lane the oracles require,
    because this gear's pair volume is where interpreted HOF lambdas
    stop being free. Candidate-recall and precision-1 bounds are
    pytest evidence.
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


#: Target size of the ANN certificate slices (LSH + SemDeDup twins):
#: the sample mod is derived from the corpus count — exact integer
#: ceil, same rule in both engines — so the slice holds ~320 vectors
#: (<= ~51k reference pairs) at ANY corpus size. Same recipe as the
#: simhash certificate (dedup.SIMHASH_CHECK_TARGET).
ANN_CHECK_TARGET = 320

#: Sign-certainty margin for the dual-lane bucket parity contract: the
#: numpy kernel sums plane dots pairwise, the JVM fold sequentially —
#: for 64 doubles of ~unit magnitude the lanes differ by <~1e-13, so a
#: fold dot at least 1e-9 from zero PROVES both lanes agree on the
#: sign. A plane dot inside the margin excuses the doc's parity bit
#: (measure-zero on real embeddings) instead of hash-flapping on it.
ANN_SIGN_MARGIN = 1e-9

#: Value-agreement tolerance between the gear's numpy cosine (pairwise
#: summation) and the fold-lane cosine both engines replay; same
#: error-bound argument as the sign margin, applied after round-to-9.
ANN_SIM_TOL = 1e-9


def _ann_check_mod(n_vecs: int) -> int:
    return max(1, -(-n_vecs // ANN_CHECK_TARGET))


def _and_all(*cols):
    out = cols[0]
    for c in cols[1:]:
        out = out & c
    return out


def _or_any(*cols):
    out = cols[0]
    for c in cols[1:]:
        out = out | c
    return out


def _fold_table_bucket(emb_col: str, table: int, planes_per_table: int):
    """JVM fold-lane bucket id for ONE LSH table — the
    :func:`ann_lsh_buckets` expression restricted to the table's plane
    slice (planes ``table*P .. table*P+P-1``, matching the kernel's
    row-major reshape). Bit-identical cross-engine (the r11
    ann_lsh_buckets oracle proved the lane), so the twin's
    ``same_bucket_*`` columns are REPLAYABLE payload, not constants."""
    exprs = []
    for b in range(planes_per_table):
        weights = ", ".join(f"{w}D" for w in _PLANES[table * planes_per_table + b])
        dot = (
            f"aggregate(zip_with({emb_col}, array({weights}), "
            f"(x, w) -> CAST(x AS DOUBLE) * w), 0D, (acc, v) -> acc + v)"
        )
        exprs.append(f"(CASE WHEN ({dot}) >= 0 THEN {1 << b} ELSE 0 END)")
    return F.expr(" + ".join(exprs)).cast("long")


def _fold_min_abs_dot(emb_col: str, n_planes: int):
    """min over the first ``n_planes`` planes of |fold dot| — the
    sign-certainty witness for :data:`ANN_SIGN_MARGIN`."""
    dots = []
    for p in range(n_planes):
        weights = ", ".join(f"{w}D" for w in _PLANES[p])
        dots.append(
            f"abs(aggregate(zip_with({emb_col}, array({weights}), "
            f"(x, w) -> CAST(x AS DOUBLE) * w), 0D, (acc, v) -> acc + v))"
        )
    return F.expr("least(" + ", ".join(dots) + ")")


def ann_lsh_neighbors_checked(
    t: dict[str, DataFrame],
    threshold: float = 0.4,
    n_tables: int = 2,
    planes_per_table: int = 6,
    sample_mod: int | None = None,
) -> DataFrame:
    """Driver-checkable twin of :func:`ann_lsh_neighbors` (round 13,
    r12 verdict #4 — the checked-twin recipe): the gear's determinism
    and within-bucket completeness/precision contracts, promoted into
    the plan so the driver's DuckDB hash re-verifies them every round.

    Why NOT a recall-floor certificate (the minhash twin's shape): the
    fixture corpus has no high-cosine pairs (max ~0.6 at sf0.1), and
    sign-LSH catch probability at the gear's 0.4 verify threshold is
    ~0.14 by design — a floor there would be coin-flip bookkeeping,
    exactly what the minhash twin's docstring warns against. What IS
    deterministic about this gear: the bucket bits themselves (fold
    lane — proven bit-identical cross-engine by the r11
    ann_lsh_buckets oracle), and membership/precision GIVEN the
    buckets. So the twin certifies those, per pair over a
    key-addressed slice (vec_id % sample_mod == 0; mod derived from
    the corpus count exactly like the simhash certificate, constant
    ~51k-pair budget at any scale):

    - ``sim`` — fold-lane cosine (round 9), the replayable payload.
    - ``same_bucket_any`` — the pair shares a fold-lane bucket in at
      least one table: REPLAYABLE (DuckDB recomputes the plane dots
      from literals), so the hash pins the actual banding geometry,
      not a constant.
    - ``kernel_matches_fold`` — the gear's numpy-kernel buckets equal
      the fold-lane buckets for both endpoints (sign-margin guarded):
      the two independent computational lanes agree, which is what
      makes ``same_bucket_any`` a faithful model of the gear's
      candidate rule.
    - ``lsh_complete`` — a certain, same-fold-bucket pair with sim >=
      threshold + tol MUST be in the gear's output (completeness
      within buckets is deterministic — only cross-bucket recall is
      probabilistic).
    - ``lsh_precise`` — every gear pair on the slice shares a bucket
      (when certain), carries sim >= threshold - tol, and its reported
      value agrees with the fold recomputation within tol (numpy
      pairwise vs sequential fold).

    The gear runs on the FULL corpus (the twin certifies the shipped
    operator); only the reference enumeration is slice-bounded.

    The slice frame (``docs``, ~constant rows by the derived mod)
    feeds both sides of the pair self-join, so it is materialized
    once (round 14 — the _semdedup_parts precedent): without the
    checkpoint each side re-scanned the corpus and re-ran the numpy
    bucket kernel + fold lanes (14 Arrow/kernel nodes, 10 parquet
    scans in the executed plan)."""
    emb = t["embeddings"]
    if sample_mod is None:
        # bounded metadata action — same budget class as the index fits
        sample_mod = _ann_check_mod(emb.count())
    n_planes = n_tables * planes_per_table
    kernel = _bucket_kernel(n_tables, planes_per_table)
    docs = (
        emb.filter(F.col("vec_id") % sample_mod == 0)
        .select(
            "vec_id",
            "embedding",
            kernel(F.col("embedding")).alias("kb"),
            *[
                _fold_table_bucket("embedding", k, planes_per_table).alias(
                    f"fb{k}"
                )
                for k in range(n_tables)
            ],
            _fold_min_abs_dot("embedding", n_planes).alias("margin"),
        )
        .withColumn(
            "lane_ok",
            (F.col("margin") < ANN_SIGN_MARGIN)
            | _and_all(
                *[F.col("kb")[k] == F.col(f"fb{k}") for k in range(n_tables)]
            ),
        )
        .withColumn("certain", F.col("margin") >= ANN_SIGN_MARGIN)
    ).localCheckpoint()
    a = docs.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("lane_ok").alias("lane_a"),
        F.col("certain").alias("cert_a"),
        *[F.col(f"fb{k}").alias(f"fa{k}") for k in range(n_tables)],
    )
    b = docs.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("lane_ok").alias("lane_b"),
        F.col("certain").alias("cert_b"),
        *[F.col(f"fb{k}").alias(f"fb{k}") for k in range(n_tables)],
    )
    pairs = a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
    sim = F.round(_cosine("emb_a", "emb_b"), 9)
    same_bucket = _or_any(
        *[F.col(f"fa{k}") == F.col(f"fb{k}") for k in range(n_tables)]
    )
    gear = ann_lsh_neighbors(
        t, threshold, n_tables, planes_per_table
    ).withColumnRenamed("sim", "gear_sim")
    both_certain = F.col("cert_a") & F.col("cert_b")
    caught = F.col("gear_sim").isNotNull()
    return (
        pairs.withColumn("sim", sim)
        .withColumn("same_bucket_any", same_bucket)
        .join(gear, ["vec_a", "vec_b"], "left")
        .select(
            "vec_a",
            "vec_b",
            "sim",
            "same_bucket_any",
            (F.col("lane_a") & F.col("lane_b")).alias("kernel_matches_fold"),
            (
                ~(
                    both_certain
                    & F.col("same_bucket_any")
                    & (F.col("sim") >= F.lit(threshold) + F.lit(ANN_SIM_TOL))
                )
                | caught
            ).alias("lsh_complete"),
            (
                ~caught
                | (
                    (F.abs(F.col("gear_sim") - F.col("sim")) <= ANN_SIM_TOL)
                    & (F.col("sim") >= F.lit(threshold) - F.lit(ANN_SIM_TOL))
                    & (F.col("same_bucket_any") | ~both_certain)
                )
            ).alias("lsh_precise"),
        )
        .orderBy("vec_a", "vec_b")
    )


def _table_bucket_sql(emb: str, table: int, planes_per_table: int) -> str:
    """DuckDB replay of :func:`_fold_table_bucket` — the
    ann_lsh_buckets oracle's ordered list_reduce + string-parsed
    double literals, restricted to one table's plane slice."""
    terms = []
    for b in range(planes_per_table):
        ws = ", ".join(
            f"CAST('{w!r}' AS DOUBLE)"
            for w in _PLANES[table * planes_per_table + b]
        )
        dot = (
            "list_reduce(list_prepend(0.0, list_transform("
            f"list_zip({emb}, [{ws}]), "
            "s -> CAST(s[1] AS DOUBLE) * s[2])), "
            "(acc, v) -> acc + v)"
        )
        terms.append(f"(CASE WHEN ({dot}) >= 0 THEN {1 << b} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


#: DuckDB twin of ``_DOT`` / the registry's _DOT_SQL — duplicated here
#: (oracle builders live beside their gears; importing the registry
#: module from an operators module would be a cycle).
_DOT_SQL_S = (
    "list_sum(list_transform(range(1, 65), i ->"
    " CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


def _cos_sql_s(a: str, b: str) -> str:
    return (
        f"ROUND({_DOT_SQL_S.format(a=a, b=b)} / "
        f"(sqrt({_DOT_SQL_S.format(a=a, b=a)}) * sqrt({_DOT_SQL_S.format(a=b, b=b)})), 9)"
    )


def ann_lsh_neighbors_checked_oracle_sql(
    n_tables: int = 2, planes_per_table: int = 6
) -> str:
    """DuckDB side: derive the same slice mod from the same count,
    replay the fold-lane cosine AND the fold-lane per-table buckets
    (plane literals — the ann_lsh_buckets lane), assert the three
    in-plan contracts TRUE."""
    buckets = ", ".join(
        f"{_table_bucket_sql('embedding', k, planes_per_table)} AS fb{k}"
        for k in range(n_tables)
    )
    same = " OR ".join(f"a.fb{k} = b.fb{k}" for k in range(n_tables))
    return f"""
        WITH m AS (
          SELECT GREATEST(1, (COUNT(*) + {ANN_CHECK_TARGET - 1})
                             // {ANN_CHECK_TARGET}) AS md
          FROM embeddings),
        s AS (
          SELECT vec_id, embedding, {buckets}
          FROM embeddings, m WHERE vec_id % m.md = 0)
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               {_cos_sql_s('a.embedding', 'b.embedding')} AS sim,
               ({same}) AS same_bucket_any,
               TRUE AS kernel_matches_fold,
               TRUE AS lsh_complete,
               TRUE AS lsh_precise
        FROM s a JOIN s b ON a.vec_id < b.vec_id
        ORDER BY vec_a, vec_b
        """


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
    _centers, assigned, dropped = _semdedup_parts(
        t, n_cells, threshold, max_block_size
    )
    return (
        assigned.join(dropped, "vec_id", "left_anti")
        .select("vec_id", "cell", "n_cell_mates")
        .orderBy("vec_id")
    )


def _semdedup_parts(
    t: dict[str, DataFrame],
    n_cells: int,
    threshold: float,
    max_block_size: int,
) -> tuple[np.ndarray, DataFrame, DataFrame]:
    """The SemDeDup pipeline's intermediates, shared by the gear and
    its checked twin (round 13): the fitted ``(k, dim)`` centers, the
    capped assigned frame (vec_id, embedding, cell, nrm,
    n_cell_mates), and the dropped-vec frame (vec_id). Splitting these
    out lets the twin assert its contracts against the EXACT frames
    the gear ships, not a re-derivation."""
    from pyspark.sql import Window

    emb = t["embeddings"]
    centers = _fit_coarse_quantizer(emb, n_cells)
    assigned = emb.select(
        "vec_id", "embedding", _assign_cells(emb, centers).alias("cell")
    ).withColumn("nrm", F.sqrt(F.expr(_DOT.format(a="embedding", b="embedding"))))
    cell_n = F.count(F.lit(1)).over(Window.partitionBy("cell"))
    # materialize the capped assignment once: it feeds BOTH self-join
    # branches plus the survivor anti-join, and the cell-count window
    # above the exchange defeats ReusedExchange (the simhash-gear plan
    # audit, round 13) — without this the Arrow kernel and the window
    # would re-run per consumer.
    assigned = (
        assigned.repartition("cell")
        .withColumn("n_cell_mates", cell_n)
        .filter(F.col("n_cell_mates") <= max_block_size)
    ).localCheckpoint()
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
    return centers, assigned, dropped


def _fold_cell_scores(emb_col: str, centers: np.ndarray):
    """JVM fold-lane euclidean-argmin scores against center LITERALS —
    the independent second lane for the assignment-parity contract.
    Per cell j the score is -2*(x . c_j) + ||c_j||^2 (the ||x||^2 term
    is constant per row, exactly as the numpy kernel drops it); the
    dot folds sequentially over plan literals, so any disagreement
    with the kernel's pairwise matmul is bounded by a few ulps —
    outside :data:`ANN_SIGN_MARGIN`-sized argmin gaps the two lanes
    MUST pick the same cell."""
    scores = []
    for j in range(len(centers)):
        c = centers[j].astype("float64")
        c_sq = repr(float((c**2).sum()))
        ws = ", ".join(f"{float(w)!r}D" for w in c)
        dot = (
            f"aggregate(zip_with({emb_col}, array({ws}), "
            f"(x, w) -> CAST(x AS DOUBLE) * w), 0D, (acc, v) -> acc + v)"
        )
        scores.append(f"(-2D * ({dot}) + {c_sq}D)")
    return F.expr("array(" + ", ".join(scores) + ")")


def semdedup_embedding_checked(
    t: dict[str, DataFrame],
    n_cells: int = 16,
    threshold: float = 0.95,
    max_block_size: int = 10_000,
    sample_mod: int | None = None,
) -> DataFrame:
    """Driver-checkable twin of :func:`semdedup_embedding` (round 13,
    r12 verdict #4 — the cluster-assignment / keep-drop contract): the
    gear's pytest keep/drop property and its quantizer plumbing,
    promoted into the plan so the driver's DuckDB hash re-verifies
    them every round.

    One row per vector of a key-addressed slice (vec_id % sample_mod
    == 0; mod derived from the corpus count — exact integer ceil, same
    rule in the oracle text — so the reference stays ~320 rows at any
    scale):

    - ``n_near_lower_slice`` — how many LOWER-id slice vectors sit at
      fold-cosine >= threshold (round 9): the replayable payload,
      recomputed by DuckDB over the same slice, pinning the actual
      similarity geometry rather than a constant.
    - ``assign_parity`` — the gear's numpy argmin cell equals an
      independent JVM fold-lane argmin over center literals
      (:func:`_fold_cell_scores`; first-index tie-break both sides),
      unless the two best cells sit within :data:`ANN_SIGN_MARGIN` of
      each other (lane-difference headroom, measure-zero in practice).
      This is the quantizer contract: probe-style assignment is a pure
      deterministic function of the fitted centers.
    - ``dropped_justified`` — a slice vector the gear dropped has at
      least one lower-id SAME-CELL mate at sim >= threshold, verified
      against the gear's own assigned frame with the gear's own exact
      sim expression (same fold lane, no tolerance needed).
    - ``kept_consistent`` — the converse: a surviving slice vector has
      NO such mate. Together they pin the keep/drop rule from both
      sides (the pytest property, now hash-checked each round).
    - ``mass_partitioned`` — constant: #survivors + #dropped equals
      the capped population (no vector lost or double-counted between
      the anti-join and the dropped set).

    Spine population (round 14, advice fix): the slice is drawn from
    ALL embeddings — the exact population the oracle's
    ``vec_id % md = 0`` CTE enumerates — NOT from the gear's capped
    assigned frame. A cell that exceeds ``max_block_size`` is excluded
    from the gear's exact scan by contract, so its slice vectors carry
    no cell assignment; for those rows the three cell-dependent
    contracts (``assign_parity``, ``dropped_justified``,
    ``kept_consistent``) are vacuously TRUE via the left-join null
    guards below (the capped-vs-oracle row sets previously diverged
    exactly in that over-cap regime — a guaranteed driver false
    alarm at the scale the certificate exists to cover). The
    ``n_near_lower_slice`` payload is population-independent (pure
    slice geometry) and stays replayable either way.

    WHICH vectors survive stays engine-specific (the k-means centers
    come from a numpy fit); this twin bounds the pipeline from the
    replayable side. Cost: the gear itself + one slice-vs-cell-mates
    join, bounded by max_block_size per slice row by contract."""
    emb = t["embeddings"]
    if sample_mod is None:
        sample_mod = _ann_check_mod(emb.count())
    centers, assigned, dropped = _semdedup_parts(
        t, n_cells, threshold, max_block_size
    )  # assigned arrives checkpointed (see _semdedup_parts)
    dropped_marked = dropped.withColumn("is_dropped", F.lit(True))
    # slice spine from the FULL corpus (the oracle's population);
    # cell/nrm arrive by left join from the gear's capped frame and
    # are NULL for slice vectors in over-cap cells
    gap_guard = F.expr(
        "sorted_scores[1] - sorted_scores[0]"
    ) < ANN_SIGN_MARGIN
    # the right side is pre-filtered to the SAME slice and broadcast:
    # joining the ~constant-size spine against the corpus-sized
    # assigned frame directly would shuffle the corpus to serve a few
    # hundred rows (assigned is checkpointed, so the slice filter is a
    # cheap scan, never a recompute of the assignment kernel)
    spine = (
        emb.select("vec_id", "embedding")
        .filter(F.col("vec_id") % sample_mod == 0)
        .join(
            F.broadcast(
                assigned.filter(F.col("vec_id") % sample_mod == 0)
                .select("vec_id", "cell", "nrm")
            ),
            "vec_id",
            "left",
        )
        .withColumn("fold_scores", _fold_cell_scores("embedding", centers))
        .withColumn("sorted_scores", F.array_sort("fold_scores"))
        .withColumn(
            "fold_cell",
            F.expr(
                "array_position(fold_scores, array_min(fold_scores)) - 1"
            ).cast("int"),
        )
        .withColumn(
            "assign_parity",
            F.col("cell").isNull()
            | (F.col("cell") == F.col("fold_cell"))
            | gap_guard,
        )
        .select(
            "vec_id", "embedding", "cell", "nrm", "assign_parity"
        )
    )
    # replayable payload: lower-id slice mates at fold sim >= threshold
    sa = spine.select(
        F.col("vec_id").alias("va"), F.col("embedding").alias("ea")
    )
    sb = spine.select(
        F.col("vec_id").alias("vb"), F.col("embedding").alias("eb")
    )
    near_counts = (
        sa.join(F.broadcast(sb), F.col("vb") < F.col("va"))
        .filter(F.round(_cosine("ea", "eb"), 9) >= threshold)
        .groupBy(F.col("va").alias("vec_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_near_lower_slice"))
    )
    # keep/drop contract: lower-id same-cell mates at the gear's own
    # exact sim expression (cell blocks are <= max_block_size rows by
    # the gear's cap, so this join is bounded per slice row)
    mates = assigned.select(
        "cell",
        F.col("vec_id").alias("mb"),
        F.col("embedding").alias("emb_m"),
        F.col("nrm").alias("nrm_m"),
    )
    mate_sim = F.expr(_DOT.format(a="embedding", b="emb_m")) / (
        F.col("nrm") * F.col("nrm_m")
    )
    has_near_mate = (
        spine.join(mates, "cell")
        .filter(F.col("mb") < F.col("vec_id"))
        .filter(mate_sim >= threshold)
        .select("vec_id")
        .distinct()
        .withColumn("near_mate", F.lit(True))
    )
    # the gear's OWN survivor construction (anti-join) against the
    # independent dropped count: catches a dropped id outside the
    # capped population or a double-count between the two frames
    n_surv = (
        assigned.join(dropped, "vec_id", "left_anti")
        .agg(F.count(F.lit(1)).alias("n_surv"))
    )
    mass = (
        assigned.agg(F.count(F.lit(1)).alias("n_pop"))
        .crossJoin(F.broadcast(n_surv))
        .crossJoin(
            F.broadcast(dropped.agg(F.count(F.lit(1)).alias("n_drop")))
        )
        .select(
            (F.col("n_surv") + F.col("n_drop") == F.col("n_pop")).alias(
                "mass_partitioned"
            )
        )
    )
    return (
        spine.join(near_counts, "vec_id", "left")
        .join(dropped_marked, "vec_id", "left")
        .join(has_near_mate, "vec_id", "left")
        .crossJoin(F.broadcast(mass))
        .select(
            "vec_id",
            F.coalesce("n_near_lower_slice", F.lit(0).cast("long")).alias(
                "n_near_lower_slice"
            ),
            "assign_parity",
            (
                F.col("is_dropped").isNull() | F.col("near_mate").isNotNull()
            ).alias("dropped_justified"),
            (
                F.col("is_dropped").isNotNull() | F.col("near_mate").isNull()
            ).alias("kept_consistent"),
            "mass_partitioned",
        )
        .orderBy("vec_id")
    )


def semdedup_embedding_checked_oracle_sql(threshold: float = 0.95) -> str:
    """DuckDB side: derive the same slice mod from the same count,
    replay the lower-id near-mate counts over the fold-lane cosine,
    assert the four in-plan contracts TRUE."""
    return f"""
        WITH m AS (
          SELECT GREATEST(1, (COUNT(*) + {ANN_CHECK_TARGET - 1})
                             // {ANN_CHECK_TARGET}) AS md
          FROM embeddings),
        s AS (
          SELECT vec_id, embedding FROM embeddings, m
          WHERE vec_id % m.md = 0),
        near AS (
          SELECT a.vec_id, CAST(COUNT(*) AS BIGINT) AS n_near_lower_slice
          FROM s a JOIN s b ON b.vec_id < a.vec_id
          WHERE {_cos_sql_s('a.embedding', 'b.embedding')} >= {threshold}
          GROUP BY a.vec_id)
        SELECT s.vec_id,
               COALESCE(near.n_near_lower_slice, 0) AS n_near_lower_slice,
               TRUE AS assign_parity,
               TRUE AS dropped_justified,
               TRUE AS kept_consistent,
               TRUE AS mass_partitioned
        FROM s LEFT JOIN near ON near.vec_id = s.vec_id
        ORDER BY s.vec_id
        """


# --------------------------------------------------------------------------
# Product quantization (ADC top-k; the compressed-corpus scale path)
# --------------------------------------------------------------------------

PQ_SUBSPACES = 8  #: 64-dim embedding -> 8 subvectors of 8 dims
PQ_CODEBOOK = 16  #: centroids per subspace -> 4-bit codes


def _fit_pq_codebooks(
    emb: DataFrame,
    m: int = PQ_SUBSPACES,
    kc: int = PQ_CODEBOOK,
    emb_col: str = "embedding",
    fit_cap: int = KMEANS_FIT_CAP,
) -> np.ndarray:
    """Fit per-subspace PQ codebooks on a bounded L2-normalized sample;
    returns the ``(m, kc, dim/m)`` center tensor. Same sample-fit,
    full-assign, single-scan contract as :func:`_fit_coarse_quantizer`
    (via :func:`_collect_fit_sample`) — the fit never scales with the
    corpus."""
    x = _collect_fit_sample(emb, emb_col, fit_cap)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    d = x.shape[1] // m
    return np.stack(
        [_kmeans_numpy(x[:, j * d : (j + 1) * d], kc, seed=42 + j) for j in range(m)]
    )


def _pq_encode(books: np.ndarray):
    """Column: PQ code array (``m`` small ints) for the L2-normalized
    embedding — one argmin matmul per subspace per Arrow batch against
    the broadcast codebook tensor."""
    from pyspark.sql.functions import pandas_udf

    b = books.astype("float64")  # (m, kc, d)
    m, _, d = b.shape
    b_sq = (b**2).sum(axis=2)  # (m, kc)

    @pandas_udf("array<int>")
    def kernel(col: pd.Series) -> pd.Series:
        x = np.stack(col.to_numpy()).astype("float64")
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        codes = np.empty((len(x), m), dtype="int32")
        for j in range(m):
            sub = x[:, j * d : (j + 1) * d]
            d2 = -2 * (sub @ b[j].T) + b_sq[j][None, :]
            codes[:, j] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    return kernel


def pq_topk(
    t: dict[str, DataFrame],
    n_queries: int = 5,
    k: int = 10,
    rerank: int = 48,
) -> DataFrame:
    """Product-quantization ANN: encode every vector as ``m`` 4-bit
    codes, score candidates with an asymmetric-distance (ADC) lookup
    table, exact-cosine re-rank the top ``rerank * k``, return top-k.

    ``rerank`` is the recall knob, and it must scale with corpus size:
    a fixed candidate budget covers a shrinking fraction of a growing
    corpus (measured: recall@10 at rerank=16 is 1.0 on 500 vectors but
    0.72 on 5 000; rerank=48 restores 0.92 at the same wall-clock —
    ADC scoring, not the rerank fetch, dominates). At real scale the
    production shape prepends IVF probing so the ADC scan itself
    touches a corpus fraction; this operator is the PQ stage of that
    pipeline.

    THE way 100 TB of embeddings becomes searchable in memory: PQ8x4
    stores 8 code nibbles per vector — 64x smaller than 64 float32
    dims — and query scoring never touches the original vectors, only
    a per-query (m, kc) table of subvector dot products (sum of m
    lookups per candidate). Exact cosine runs only on the tiny re-rank
    set, which is the fetch-from-cold-storage step in a production
    serving tier. Codebooks are sample-fit driver-side (bounded, like
    the IVF quantizer); queries are a bounded driver-side collect
    (n_queries rows) that becomes a broadcast LUT inside the scoring
    kernel.

    Approximate (code granularity) -> rows-only driver check; recall
    floor vs the exact ``cosine_topk`` baseline pinned in pytest.
    """
    from pyspark.sql.functions import pandas_udf

    emb = t["embeddings"]
    books = _fit_pq_codebooks(emb)
    m, kc, d = books.shape

    q_rows = sorted(
        emb.filter(F.col("vec_id") < n_queries)
        .select("vec_id", F.col("embedding").cast("array<double>"))
        .collect()
    )
    q_ids = [r[0] for r in q_rows]
    q = np.array([r[1] for r in q_rows])
    q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    # LUT[qi, j, c] = <q_sub, centroid>: ADC score = sum_j LUT[qi, j, code_j]
    lut = np.einsum(
        "qjd,jcd->qjc", q.reshape(len(q), m, d), books.astype("float64")
    )

    @pandas_udf("array<double>")
    def adc_scores(codes: pd.Series) -> pd.Series:
        c = np.stack(codes.to_numpy())  # (n, m)
        scores = np.zeros((len(c), len(q)))
        for j in range(m):
            scores += lut[:, j, c[:, j]].T  # (n, q)
        return pd.Series(list(scores))

    encoded = emb.select(
        "vec_id", "embedding", _pq_encode(books)(F.col("embedding")).alias("codes")
    )
    scored = encoded.select(
        "vec_id",
        F.posexplode(adc_scores(F.col("codes"))).alias("q_pos", "adc_sim"),
    )
    spark = emb.sparkSession
    qmap = spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(q_ids)], ["q_pos", "query_id"]
    )
    cand_w = Window.partitionBy("q_pos").orderBy(F.desc("adc_sim"), "vec_id")
    cands = (
        scored.withColumn("r", F.row_number().over(cand_w))
        .filter(F.col("r") <= rerank * k + 1)  # +1 absorbs the self row
        .join(F.broadcast(qmap), "q_pos")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    # exact-cosine re-rank of the candidate set only; the broadcast
    # query side is bounded to the n_queries rows that can match on
    # query_id (a full-table broadcast here would OOM executors at
    # corpus scale — same bounded contract as cosine_topk's query side)
    qe = emb.filter(F.col("vec_id").isin(q_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    ne = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("n_emb")
    )
    sim = F.round(_cosine_batch("q_emb", "n_emb"), 9)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        cands.join(F.broadcast(qe), "query_id")
        .join(ne, "neighbor_id")
        .select("query_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


#: Recall floor for the pq_topk certificate: per query, the PQ+rerank
#: pipeline must recover at least this fraction of the exact top-k.
#: The pipeline is fully deterministic per fixture (seeded sample-fit
#: codebooks, tie-broken ranks), so the measured recall is a FIXED
#: number per SF — 1.0 at sf0.001/0.01 and min 0.8 across the 5
#: queries at sf0.1 (rerank=48) — and a 0.7 floor has a full
#: neighbor of headroom with zero run-to-run variance; it fails only
#: on a real quantizer/rerank defect.
PQ_CHECK_RECALL_FLOOR = 0.7


def pq_topk_checked(
    t: dict[str, DataFrame],
    n_queries: int = 5,
    k: int = 10,
    rerank: int = 48,
    recall_floor: float = PQ_CHECK_RECALL_FLOOR,
) -> DataFrame:
    """Driver-checkable twin of :func:`pq_topk` (round 13 — fourth
    rows-only conversion): the gear's pytest recall evidence, promoted
    into the plan so the driver's DuckDB hash re-verifies it every
    round.

    One row per EXACT top-k member — the :func:`cosine_topk`
    construction, whose (query_id, neighbor_id, sim, rank) the DuckDB
    oracle replays verbatim (the oracle-proven IEEE fold lane), so the
    certificate's payload is the full exact ground truth, not a
    constant — with three contracts:

    - ``recall_meets_floor`` — per query: the PQ pipeline recovered at
      least ``recall_floor`` of the exact top-k. Meaningful because
      the whole pipeline is deterministic (seeded codebooks on a
      hash-ordered fit sample): the measured recall per fixture is a
      fixed number with headroom above the floor, not a random
      variable.
    - ``pq_value_agrees`` — when the gear did emit this neighbor, its
      reported sim equals the exact fold cosine within 1e-9 (the
      gear's rerank computes exact cosine in the Arrow kernel —
      pairwise summation vs the fold differs only in the last ulps).
    - ``pq_count_ok`` — the gear returned exactly ``k`` rows for this
      query (the top-k contract itself).

    WHICH neighbors PQ recovers stays rows-only (4-bit code
    granularity); this twin bounds the pipeline against the exact
    baseline every round. ``ivf_topk`` deliberately gets NO such
    floor: probing 2 of 8 cells makes its recall 0.3-0.9 BY DESIGN
    (measured), so a floor would be either vacuous or flappy — its
    determinism is pinned by the probe-==-refit twin instead.

    Both input frames are n_queries*k rows and feed MULTIPLE plan
    branches (j twice, gear three times counting the recall and
    count aggregates), so each is materialized once (round 14 — the
    r13 _semdedup_parts precedent): without the checkpoint every
    consumer branch re-ran the full corpus ADC/top-k kernels (12
    ArrowEvalPython nodes, 20 parquet scans in the executed plan; 0
    corpus re-scans after)."""
    exact = cosine_topk(t, n_queries, k).localCheckpoint()
    gear = pq_topk(t, n_queries, k, rerank).select(
        "query_id",
        "neighbor_id",
        F.col("sim").alias("pq_sim"),
    ).localCheckpoint()
    j = exact.join(gear, ["query_id", "neighbor_id"], "left").withColumn(
        "caught", F.col("pq_sim").isNotNull()
    )
    recall = j.groupBy("query_id").agg(
        (
            F.sum(F.col("caught").cast("int")).cast("double") / F.lit(k)
            >= F.lit(recall_floor)
        ).alias("recall_meets_floor")
    )
    counts = gear.groupBy("query_id").agg(
        (F.count(F.lit(1)) == k).alias("pq_count_ok")
    )
    return (
        j.join(F.broadcast(recall), "query_id")
        .join(F.broadcast(counts), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            "sim",
            "rank",
            "recall_meets_floor",
            (
                ~F.col("caught")
                | (F.abs(F.col("pq_sim") - F.col("sim")) <= 1e-9)
            ).alias("pq_value_agrees"),
            "pq_count_ok",
        )
        .orderBy("query_id", "rank")
    )


def pq_topk_checked_oracle_sql(n_queries: int = 5, k: int = 10) -> str:
    """DuckDB side: replay the exact top-k spine (the cosine_topk
    oracle shape — fold-lane cosine, rank ties on neighbor id), assert
    the three in-plan contracts TRUE."""
    return f"""
        SELECT query_id, neighbor_id, sim, rank,
               TRUE AS recall_meets_floor,
               TRUE AS pq_value_agrees,
               TRUE AS pq_count_ok
        FROM (
            SELECT query_id, neighbor_id, sim,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rank
            FROM (
                SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                       {_cos_sql_s('q.embedding', 'e.embedding')} AS sim
                FROM embeddings e
                JOIN (SELECT * FROM embeddings
                      WHERE vec_id < {n_queries}) q
                  ON e.vec_id != q.vec_id))
        WHERE rank <= {k} ORDER BY query_id, rank
        """


# --------------------------------------------------------------------------
# Grouped-map analytics (applyInPandas)
# --------------------------------------------------------------------------

#: rows a single label-group fit sees at most (the grouped-map kernel
#: materializes one group per Python worker; the cap bounds that memory
#: the same way the quantizer's fit_cap bounds the driver).
LABEL_PCA_CAP = 100_000


def label_pca(t: dict[str, DataFrame], cap: int = LABEL_PCA_CAP) -> DataFrame:
    """Per-label top principal direction of the embedding cloud —
    the grouped-map (``applyInPandas``) instance: eigendecomposition is
    genuinely inexpressible in SQL/DataFrame algebra, so each label
    group lands in one Arrow batch and numpy does the math.

    The curation use: a label (cluster/domain) whose top component
    explains most of the variance is a near-degenerate direction —
    embeddings collapsed onto a line mark template-generated or
    mode-collapsed content, the vector-space analog of the repetition
    gates.

    Scale contract: the cap is applied BEFORE the grouped map (round
    14, r13 verdict #1 — an in-kernel ``.head(cap)`` would bound the
    covariance math but not the materialization: ``applyInPandas``
    loads the whole group into one Arrow batch first, so a hot label
    with 10^8 vectors would OOM its worker). Instead a ``row_number``
    window on (label, vec_id) — the SAME shuffle key the grouped map
    needs, and WindowExec streams its running frame with external-sort
    spill, never buffering the group — filters to the ``cap``
    smallest-vec_id rows per label, so the Arrow batch the kernel sees
    is <= ``cap`` rows BY PLAN. ``n_vectors`` (the uncapped group
    size) comes from a separate map-side-combinable
    ``groupBy(label).count()`` joined onto the one-row-per-label fit
    output. Output is scalars + a stringified unit vector
    (registration rule: no array columns). Deterministic: the window
    order and the kernel's sort agree (vec_id), the eigenvector sign
    is fixed by its largest-magnitude component, and values are
    rounded. The cap location is pinned by a plan test (the window +
    filter must sit UPSTREAM of FlatMapGroupsInPandas).
    """
    from pyspark.sql import Window
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("label", T.IntegerType()),
            T.StructField("n_fit", T.LongType()),
            T.StructField("explained_var_ratio", T.DoubleType()),
            T.StructField("pc1", T.StringType()),
        ]
    )

    def fit(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")
        x = np.stack(pdf["embedding"].to_numpy()).astype("float64")
        x = x - x.mean(axis=0)
        cov = (x.T @ x) / max(len(x) - 1, 1)
        w, v = np.linalg.eigh(cov)
        pc = v[:, -1]
        i = int(np.abs(pc).argmax())
        if pc[i] < 0:
            pc = -pc
        tot = float(w.sum())
        evr = float(w[-1]) / tot if tot > 0 else 0.0
        return pd.DataFrame(
            [
                {
                    "label": int(key[0]),
                    "n_fit": len(pdf),
                    "explained_var_ratio": round(evr, 6),
                    "pc1": " ".join(f"{c:.6f}" for c in pc),
                }
            ]
        )

    emb = t["embeddings"].select("label", "vec_id", "embedding")
    counts = emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors")
    )
    capped = (
        emb.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("label").orderBy("vec_id")
            ),
        )
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )
    return (
        capped.groupBy("label")
        .applyInPandas(fit, schema)
        .join(counts, "label")
        .select(
            "label", "n_vectors", "n_fit", "explained_var_ratio", "pc1"
        )
        .orderBy("label")
    )


#: Tolerance for the label_pca twin's parsed-vector contracts: pc1 is
#: serialized at 6 decimals, so the unit-norm residual of the parsed
#: components is <= ~2e-5 and directional variances move by <= ~2e-5
#: relative — 1e-4 (norm) / 1e-3 (variance ratios) leave an order of
#: magnitude of headroom while still failing loudly on any real defect
#: (a non-eigenvector direction loses to a probe by >> 1e-3 on this
#: geometry).
LABEL_PCA_TOL = 1e-4
LABEL_PCA_VAR_TOL = 1e-3


def label_pca_checked(
    t: dict[str, DataFrame],
    cap: int = LABEL_PCA_CAP,
    tol: float = LABEL_PCA_TOL,
    var_tol: float = LABEL_PCA_VAR_TOL,
) -> DataFrame:
    """Driver-checkable twin of :func:`label_pca` (round 13 — the
    checked-twin recipe): eigendecomposition itself is not
    SQL-expressible, but the OPTIMALITY of its output is testable
    in-plan without any eigensolver, so the certificate asserts the
    math the gear exists to compute:

    - ``n_vectors`` / ``n_fit`` — the gear's own reported group sizes,
      hashed against DuckDB's COUNT(*) / LEAST(COUNT(*), cap): the
      replayable payload (a miscounted or dropped group mismatches).
    - ``unit_norm`` — the serialized pc1 parses back to a unit vector
      (|sum of squares - 1| <= tol).
    - ``sign_positive`` — the largest-magnitude component is positive
      (the gear's documented sign convention — determinism depends on
      it).
    - ``pc1_dominates_probes`` — sample variance of the data projected
      on pc1 is >= its variance along each of 3 fixed unit probe
      directions (plan literals): the defining property of the top
      eigenvector, checked variationally. Var(x . d) needs no
      centering join (shifting by a constant leaves variance alone),
      so this is one broadcast join + var_samp per direction.
    - ``evr_consistent`` — the gear's explained_var_ratio equals
      Var(x . pc1) / trace(cov) within var_tol, where the trace is
      recomputed in-plan as the sum of per-dimension sample variances
      (posexplode + var_samp): pins the reported ratio to the data,
      not to the kernel's internal eigenvalues.

    Contracts that depend on the fit sample are guarded to groups
    where n_vectors <= cap (the fixture always is; an over-cap group
    fits on a subsample the full-group variance cannot judge).
    WHICH direction pc1 is stays rows-only (numpy eigh); this twin
    bounds it by its optimality certificate instead.

    The gear output (one row per label) feeds THREE plan branches
    (the dots broadcast, the final join spine, and the contracts'
    column sources), so it is materialized once (round 14 — the
    _semdedup_parts precedent): without the checkpoint each branch
    re-ran the whole grouped-map PCA pass over the corpus (4
    FlatMapGroupsInPandas nodes in the executed plan; 1 after)."""
    gear = label_pca(t, cap).withColumn(
        "pc", F.expr("transform(split(pc1, ' '), x -> CAST(x AS DOUBLE))")
    ).localCheckpoint()
    emb = t["embeddings"]
    # three fixed unit probe directions from the shared plane pool
    probes = []
    for p in range(3):
        v = np.array(_PLANES[p], dtype="float64")
        v = v / np.linalg.norm(v)
        probes.append("array(" + ", ".join(f"{float(c)!r}D" for c in v) + ")")
    dots = emb.join(
        F.broadcast(gear.select("label", "pc")), "label"
    ).select(
        "label",
        F.expr(_DOT.format(a="embedding", b="pc")).alias("dp"),
        *[
            F.expr(_DOT.format(a="embedding", b=probes[i])).alias(f"dq{i}")
            for i in range(3)
        ],
    )
    dir_var = dots.groupBy("label").agg(
        F.var_samp("dp").alias("vp"),
        *[F.var_samp(f"dq{i}").alias(f"vq{i}") for i in range(3)],
    )
    trace = (
        emb.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.var_samp(F.col("v").cast("double")).alias("dv"))
        .groupBy("label")
        .agg(F.sum("dv").alias("tv"))
    )
    sq = F.expr("aggregate(pc, 0D, (a, x) -> a + x * x)")
    sign_ok = F.expr(
        "exists(pc, x -> abs(x) = array_max(transform(pc, y -> abs(y)))"
        " AND x > 0)"
    )
    fit_is_whole_group = F.col("n_vectors") <= F.lit(cap)
    small = F.col("n_vectors") < 2
    dominates = _and_all(
        *[
            F.col("vp") + F.lit(var_tol) * F.col("tv") >= F.col(f"vq{i}")
            for i in range(3)
        ]
    )
    evr_ok = (
        F.abs(F.col("explained_var_ratio") - F.col("vp") / F.col("tv"))
        <= var_tol
    )
    return (
        gear.join(dir_var, "label")
        .join(trace, "label")
        .select(
            "label",
            "n_vectors",
            "n_fit",
            (F.abs(sq - 1) <= tol).alias("unit_norm"),
            sign_ok.alias("sign_positive"),
            (
                ~fit_is_whole_group | small | (F.col("tv") <= 0) | dominates
            ).alias("pc1_dominates_probes"),
            (
                ~fit_is_whole_group | small | (F.col("tv") <= 0) | evr_ok
            ).alias("evr_consistent"),
        )
        .orderBy("label")
    )


def label_pca_checked_oracle_sql(cap: int = LABEL_PCA_CAP) -> str:
    """DuckDB side: replay the per-label group sizes and the cap rule;
    assert the four in-plan contracts TRUE."""
    return f"""
        SELECT label,
               CAST(COUNT(*) AS BIGINT) AS n_vectors,
               CAST(LEAST(COUNT(*), {cap}) AS BIGINT) AS n_fit,
               TRUE AS unit_norm,
               TRUE AS sign_positive,
               TRUE AS pc1_dominates_probes,
               TRUE AS evr_consistent
        FROM embeddings GROUP BY label ORDER BY label
        """


#: deterministic probe slice + neighborhood size for knn_classify.
KNN_PROBE_MOD = 20
KNN_K = 15


def knn_classify(
    t: dict[str, DataFrame], k: int = KNN_K, probe_mod: int = KNN_PROBE_MOD
) -> DataFrame:
    """k-NN label prediction: classify each probe vector by majority
    vote over its ``k`` nearest neighbors (leave-one-out) — the
    CLASSIFICATION application of the similarity stack (auto-labeling
    / label-error detection in a training-data pipeline: a probe whose
    neighborhood disagrees with its stored label is a labeling
    suspect).

    Probes are a deterministic slice (vec_id % probe_mod == 0) and
    BROADCAST against the full corpus — the bounded-query contract of
    ``cosine_topk`` (at scale the probe side is the batch being
    labeled, the corpus side streams). Every ambiguity is tie-broken:
    neighbor ranking by (sim rounded to 9 DESC, neighbor id), vote by
    (count DESC, label ASC) — so the prediction is a pure function of
    the input and the DuckDB oracle replays it exactly.
    """
    emb = t["embeddings"]
    # norms are precomputed ONCE PER ROW on each side (corpus scan +
    # probe build), not once per pair — cosine per pair then costs one
    # dot product instead of three. sqrt-then-multiply is the exact
    # operation sequence _cosine performs, so the doubles (and the
    # 9-decimal rounding the ranking uses) are bit-identical.
    probes = (
        emb.filter(F.col("vec_id") % probe_mod == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("true_label"),
            F.col("embedding").alias("q_emb"),
        )
        .withColumn(
            "q_norm", F.sqrt(F.expr(_DOT.format(a="q_emb", b="q_emb")))
        )
    )
    corpus = emb.withColumn(
        "e_norm",
        F.sqrt(F.expr(_DOT.format(a="embedding", b="embedding"))),
    )
    pairs = corpus.join(
        F.broadcast(probes), F.col("vec_id") != F.col("query_id")
    )
    sim = F.round(
        F.expr(_DOT.format(a="q_emb", b="embedding"))
        / (F.col("q_norm") * F.col("e_norm")),
        9,
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), "neighbor_id"
    )
    neighbors = (
        pairs.select(
            "query_id",
            "true_label",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("neighbor_label"),
            sim.alias("sim"),
        )
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
    )
    votes = neighbors.groupBy("query_id", "true_label", "neighbor_label").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    w_vote = Window.partitionBy("query_id").orderBy(
        F.desc("n_votes"), "neighbor_label"
    )
    return (
        votes.withColumn("vr", F.row_number().over(w_vote))
        .filter(F.col("vr") == 1)
        .select(
            "query_id",
            "true_label",
            F.col("neighbor_label").alias("predicted_label"),
            "n_votes",
            (F.col("neighbor_label") == F.col("true_label")).alias("agrees"),
        )
        .orderBy("query_id")
    )


def pq_index_artifact(
    emb: DataFrame, emb_col: str = "embedding"
) -> tuple[DataFrame, DataFrame]:
    """The PQ half of the persisted ANN index (the optional codebook
    extension the round-6 verdict named next to `ivf_index_artifact`):
    returns ``(codebooks, codes)`` — the sample-fit per-subspace
    centroid table (subspace, centroid, center), m*kc rows of
    vocabulary-sized metadata, and the slim (vec_id, codes) corpus
    encoding computed once at ingest (8 nibbles per vector — the 64x
    compression that makes 100 TB of embeddings memory-resident).
    Probes (:func:`pq_probe_index`) read both tables and never re-fit
    or re-encode; new vectors encode against the STORED books."""
    books = _fit_pq_codebooks(emb)
    m, kc, d = books.shape
    spark = emb.sparkSession
    books_df = spark.createDataFrame(
        [
            (j, c, [float(x) for x in books[j, c]])
            for j in range(m)
            for c in range(kc)
        ],
        ["subspace", "centroid", "center"],
    )
    codes = emb.select(
        "vec_id", _pq_encode(books)(F.col(emb_col)).alias("codes")
    )
    return books_df, codes


def pq_probe_index(
    queries: DataFrame,
    books_df: DataFrame,
    codes_df: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    rerank: int = 48,
    emb_col: str = "embedding",
) -> DataFrame:
    """Answer top-k ANN queries against the STORED PQ index: ADC
    scoring runs over the persisted (vec_id, codes) table — the
    corpus is never re-encoded and no codebook fit appears anywhere —
    and the original embeddings are touched only for the exact-cosine
    re-rank of the tiny candidate set (the fetch-from-cold-storage
    step). The stored codebook table is a WHITELISTED BOUNDED collect
    (m*kc rows of index metadata — the bpe merge-table convention)
    rebuilt into the scoring LUT; queries are the same bounded
    collect-to-broadcast as ``pq_topk``.

    Contract (pytest): on static data the probe reproduces the refit
    path (``pq_topk``) exactly — deterministic fit, same codes, same
    ADC ranking, same tie-breaks."""
    from pyspark.sql.functions import pandas_udf

    brows = books_df.collect()  # bounded: m*kc index-metadata rows
    m = 1 + max(r["subspace"] for r in brows)
    kc = 1 + max(r["centroid"] for r in brows)
    d = len(brows[0]["center"])
    books = np.zeros((m, kc, d))
    for r in brows:
        books[r["subspace"], r["centroid"]] = r["center"]

    q_rows = sorted(
        queries.select(
            "query_id", F.col("q_emb").cast("array<double>")
        ).collect()
    )
    q_ids = [r[0] for r in q_rows]
    q = np.array([r[1] for r in q_rows])
    q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    lut = np.einsum(
        "qjd,jcd->qjc", q.reshape(len(q), m, d), books.astype("float64")
    )

    @pandas_udf("array<double>")
    def adc_scores(codes: pd.Series) -> pd.Series:
        c = np.stack(codes.to_numpy())
        scores = np.zeros((len(c), len(q)))
        for j in range(m):
            scores += lut[:, j, c[:, j]].T
        return pd.Series(list(scores))

    scored = codes_df.select(
        "vec_id",
        F.posexplode(adc_scores(F.col("codes"))).alias("q_pos", "adc_sim"),
    )
    spark = codes_df.sparkSession
    qmap = spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(q_ids)], ["q_pos", "query_id"]
    )
    cand_w = Window.partitionBy("q_pos").orderBy(F.desc("adc_sim"), "vec_id")
    cands = (
        scored.withColumn("r", F.row_number().over(cand_w))
        .filter(F.col("r") <= rerank * k + 1)
        .join(F.broadcast(qmap), "q_pos")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    qe = corpus.filter(F.col("vec_id").isin(q_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col(emb_col).alias("q_emb"),
    )
    ne = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col(emb_col).alias("n_emb"),
    )
    sim = F.round(_cosine_batch("q_emb", "n_emb"), 9)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        cands.join(F.broadcast(qe), "query_id")
        .join(ne, "neighbor_id")
        .select("query_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def pq_probe_incremental(
    t: dict[str, DataFrame], n_queries: int = 5, k: int = 10
) -> DataFrame:
    """Registry entry for the stored-PQ probe (the
    ``ivf_probe_incremental`` convention): artifact derived in-query
    from the embeddings table, probe answered purely from the stored
    books+codes with exact re-rank against the lake. Approximate ->
    rows-only driver check; probe-vs-refit parity vs ``pq_topk``
    pinned in pytest."""
    emb = t["embeddings"]
    books_df, codes = pq_index_artifact(emb)
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
    )
    return pq_probe_index(queries, books_df, codes, emb, k=k)


def pq_probe_incremental_checked(
    t: dict[str, DataFrame], n_queries: int = 5, k: int = 10
) -> DataFrame:
    """Driver-checkable twin of :func:`pq_probe_incremental` (round-11,
    r10 verdict #5 — the :func:`ivf_probe_incremental_checked` recipe):
    stored-PQ probe == refit path (:func:`pq_topk`) exactly on static
    data (deterministic codebook fit, same stored codes, same ADC
    ranking and tie-breaks), asserted in-plan per query over the
    SQL-expressible query spine."""
    emb = t["embeddings"]
    spine = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id")
    )
    return _probe_refit_parity(
        spine,
        pq_probe_incremental(t, n_queries, k),
        pq_topk(t, n_queries, k),
    )


def pq_probe_incremental_checked_oracle_sql(n_queries: int = 5) -> str:
    return f"""
        SELECT vec_id AS query_id, TRUE AS probe_matches_refit
        FROM embeddings WHERE vec_id < {n_queries} ORDER BY query_id
        """


def ann_lsh_buckets_oracle_sql(n_planes: int = N_PLANES) -> str:
    """DuckDB replay of the sign-random-projection buckets (round-11:
    this gear LEFT the rows-only tier): the projection planes are
    fixed PLAN LITERALS, and the whole computation is IEEE-basic —
    float->double widening (exact), per-element multiply, and a
    left fold in ARRAY ORDER — so both engines produce bit-identical
    dot products and therefore identical sign bits. Order parity:
    Spark's ``aggregate(zip_with(...), 0D, +)`` folds
    0.0 + p_0 + p_1 + ...; DuckDB's ``list_reduce`` seeds from the
    FIRST element, so the 0.0 is prepended — same sequence of
    additions. Weight literals go through CAST('<repr>' AS DOUBLE)
    (string parse, correctly rounded, repr round-trips) rather than
    bare decimal literals, whose DECIMAL->DOUBLE path is the
    not-correctly-rounded-past-64-bits lane the spearman entry
    documented."""
    terms = []
    for p in range(n_planes):
        ws = ", ".join(f"CAST('{w!r}' AS DOUBLE)" for w in _PLANES[p])
        dot = (
            "list_reduce(list_prepend(0.0, list_transform("
            f"list_zip(embedding, [{ws}]), "
            "s -> CAST(s[1] AS DOUBLE) * s[2])), "
            "(acc, v) -> acc + v)"
        )
        terms.append(f"(CASE WHEN ({dot}) >= 0 THEN {1 << p} ELSE 0 END)")
    return (
        "SELECT vec_id, label, CAST("
        + " + ".join(terms)
        + " AS BIGINT) AS bucket FROM embeddings ORDER BY vec_id"
    )
