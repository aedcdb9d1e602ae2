"""Deduplication operators (SURVEY.md §2C; driver-mandated extensions).

Exact and near-duplicate detection over the ``documents`` table,
designed for 100 TB:

- **exact**: group by content hash — never ``distinct()`` over wide
  rows; the shuffle key is the 16-byte digest, not the document.
- **near-dup (exact Jaccard)**: blocked self-join (cheap blocking key
  caps pair count) + JVM-side set intersection. SQL-expressible, so it
  carries a DuckDB oracle.
- **MinHash + LSH**: shingle -> minhash signature -> band buckets ->
  bucket-join for candidates -> exact-Jaccard verification. Candidate
  generation never compares all pairs; cost is O(n · bands). This is
  the unblocked scale path (approximate recall -> rows-only check).
- **SimHash**: 64-bit signature, banded for Hamming-distance
  candidates; same scale shape as MinHash.

All hashing is xxhash64/md5 inside the JVM (no Python in the hot
path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------


def dedup_exact(t: dict[str, DataFrame]) -> DataFrame:
    """One row per distinct document text: content hash, copy count,
    the keeper (min doc_id). Scale: shuffle on the digest only."""
    return (
        t["documents"]
        .groupBy(F.md5("text").alias("content_hash"))
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .orderBy("content_hash")
    )


def dedup_exact_keep_first(t: dict[str, DataFrame]) -> DataFrame:
    """The deduplicated table itself: keep the min-doc_id row per text.

    groupBy + join-back instead of dropDuplicates so the kept row is
    deterministic (dropDuplicates keeps an arbitrary row).
    """
    docs = t["documents"]
    keepers = docs.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    return (
        docs.join(keepers, ["doc_id", "text"], "left_semi")
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Exact near-dup: blocked Jaccard self-join (oracle-checkable)
# --------------------------------------------------------------------------


def neardup_jaccard_blocked(t: dict[str, DataFrame], threshold: float = 0.8) -> DataFrame:
    """Document pairs with word-set Jaccard >= threshold, blocked on
    (lang, source).

    The blocking key bounds each join group; within a block the
    intersection runs as a JVM ``array_intersect`` over pre-distinct
    token arrays. Jaccard is an exact ratio of ints -> deterministic
    double, so DuckDB hash-matches.
    """
    toks = t["documents"].select(
        "doc_id",
        "lang",
        "source",
        F.array_distinct(F.split("text", " ")).alias("toks"),
    )
    a, b = toks.alias("a"), toks.alias("b")
    inter = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
    sa, sb = F.size("a.toks"), F.size("b.toks")
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (inter.cast("double") / (sa + sb - inter).cast("double")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


# --------------------------------------------------------------------------
# MinHash + LSH (scale path; approximate recall -> rows-only check)
# --------------------------------------------------------------------------

N_HASHES = 32
N_BANDS = 8  # 8 bands x 4 rows: catches jaccard ~>= 0.7 with high prob.


def _shingles(df: DataFrame, k: int = 3) -> DataFrame:
    """Word k-gram shingles per doc (JVM: transform over token index)."""
    return df.select(
        "doc_id",
        F.array_distinct(
            F.expr(
                f"transform(sequence(0, greatest(size(split(text, ' ')) - {k}, 0)),"
                f" i -> concat_ws(' ', slice(split(text, ' '), i + 1, {k})))"
            )
        ).alias("shingles"),
    )


def minhash_signatures(docs: DataFrame, n_hashes: int = N_HASHES) -> DataFrame:
    """doc_id -> array of minhash values, one per hash function.

    Hash family: xxhash64(shingle, seed=j). min() per seed is computed
    in one pass over exploded shingles — a single groupBy(doc_id), all
    JVM-side.
    """
    sh = _shingles(docs).select("doc_id", F.explode("shingles").alias("sh"))
    mins = [
        F.min(F.xxhash64(F.col("sh"), F.lit(j))).alias(f"h{j}") for j in range(n_hashes)
    ]
    sig = sh.groupBy("doc_id").agg(*mins)
    return sig.select(
        "doc_id", F.array(*[f"h{j}" for j in range(n_hashes)]).alias("sig")
    )


def neardup_minhash_lsh(
    t: dict[str, DataFrame],
    threshold: float = 0.5,
    n_bands: int = N_BANDS,
) -> DataFrame:
    """Shingle-Jaccard near-dup pairs via MinHash banding.

    candidates: docs sharing any band bucket (hash of the band's
    signature slice). Verification: exact shingle Jaccard on the
    candidate pairs only. Output columns match
    ``neardup_jaccard_blocked`` (doc_a, doc_b, jaccard).
    """
    docs = t["documents"]
    sig = minhash_signatures(docs)
    rows_per_band = N_HASHES // n_bands
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)]
                        ).alias("bucket"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sh = _shingles(docs)
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


# --------------------------------------------------------------------------
# SimHash (rows-only)
# --------------------------------------------------------------------------


def simhash_signatures(docs: DataFrame, bits: int = 64) -> DataFrame:
    """64-bit SimHash per doc: sign of per-bit weighted sums of token
    hashes. Entirely JVM expressions: explode tokens -> per-bit ±1
    contributions -> groupBy sum -> pack bits."""
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    h = F.xxhash64("tok")
    sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    packed = sums.select(
        "doc_id",
        sum(
            [
                F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long") * (2**i)).otherwise(0)
                for i in range(bits - 1)  # bit 63 excluded: keep positive long
            ],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    return packed


def neardup_simhash(t: dict[str, DataFrame], max_hamming: int = 8) -> DataFrame:
    """Candidate pairs by SimHash banding (4 x 16-bit chunks: any equal
    chunk -> candidate; guaranteed to catch hamming <= 3, probabilistic
    above), verified by exact Hamming distance <= max_hamming."""
    sig = simhash_signatures(t["documents"])
    chunks = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright("simhash", c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cc"),
    ).select("doc_id", "simhash", "cc.chunk", "cc.val")
    cand = (
        chunks.alias("x")
        .join(
            chunks.alias("y"),
            (F.col("x.chunk") == F.col("y.chunk"))
            & (F.col("x.val") == F.col("y.val"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.simhash").alias("sig_a"),
            F.col("y.simhash").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.select("doc_a", "doc_b", hamming.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("doc_a", "doc_b")
    )
