"""End-to-end curation pipeline: the operators composed the way a
training-data pipeline would chain them — filter -> dedup -> split ->
export shards -> manifest-consistent read-back."""

from __future__ import annotations

import pyspark.sql.functions as F

from parquet_export_spark.export.manifest import write_manifest
from parquet_export_spark.export.writer import write_table
from parquet_export_spark.operators.curation import corpus_quality_filter, train_eval_split
from parquet_export_spark.sources.lake import load_manifest_table, load_tables
from parquet_export_spark.tables import TableSpec


def test_curation_pipeline_end_to_end(spark, sf_dir, tmp_path):
    t = load_tables(spark, sf_dir)
    docs = t["documents"]

    # 1. quality gate
    kept = corpus_quality_filter(t).select("doc_id")
    # 2. exact dedup among survivors (digest-keyed keep-first)
    survivors = docs.join(kept, "doc_id", "left_semi")
    digests = survivors.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    deduped = survivors.join(digests.select("doc_id"), "doc_id", "left_semi")
    # 3. deterministic split
    split = train_eval_split({"documents": deduped})
    sharded = deduped.join(split.select("doc_id", "split"), "doc_id")

    # 4. export one shard table per split via the committed-files writer
    out = str(tmp_path / "shards")
    files = {}
    for part in ("train", "eval"):
        spec = TableSpec(
            name=f"docs_{part}",
            datatypes={},
            rows_per_file=200,
        )
        files[spec.name] = write_table(
            sharded.filter(F.col("split") == part).drop("split"), out, spec
        )
    write_manifest(out, files, spark=spark)

    # 5. manifest-consistent read-back: totals reconcile exactly
    n_train = load_manifest_table(spark, out, "docs_train").count()
    n_eval = load_manifest_table(spark, out, "docs_eval").count()
    assert n_train + n_eval == deduped.count()
    assert n_train > n_eval > 0
    # split is the pure hash function — re-derivable from the shard
    back = load_manifest_table(spark, out, "docs_train")
    re_split = train_eval_split({"documents": back})
    assert re_split.filter("split != 'train'").count() == 0


def test_training_shard_pipeline_end_to_end(spark, sf_dir):
    """Round-4 composition: quality gate -> PII scrub accounting ->
    train split -> deterministic shard assignment. Invariants: every
    surviving train doc lands in exactly one shard at a contiguous
    1..n position, shard totals reconcile with the split totals, and
    re-sharding any subset reproduces the same (shard, relative
    order) — the append-stability the content-addressed design buys.
    """
    from pyspark.sql import functions as F

    from parquet_export_spark.operators.curation import (
        corpus_quality_filter,
        shard_for_training,
        train_eval_split,
    )
    from parquet_export_spark.operators.text import pii_scan
    from parquet_export_spark.sources.lake import load_tables

    t = load_tables(spark, sf_dir)
    kept = corpus_quality_filter(t).select("doc_id")  # already gated
    # PII accounting joins cleanly onto the kept set (scrub stage)
    pii = pii_scan(t).select("doc_id", "n_pii")
    staged = kept.join(pii, "doc_id")
    train = (
        train_eval_split({"documents": t["documents"]})
        .filter("split = 'train'")
        .select("doc_id")
        .join(staged, "doc_id")
    )
    shards = shard_for_training(
        {"documents": train.join(t["documents"], "doc_id")}
    )
    n_train = train.count()
    assert shards.count() == n_train  # exactly one row per doc
    per = {r.shard: r.n for r in shards.groupBy("shard").agg(F.count("*").alias("n")).collect()}
    assert sum(per.values()) == n_train
    # positions are 1..n contiguous within each shard
    mx = {
        r.shard: r.mx
        for r in shards.groupBy("shard").agg(F.max("shard_pos").alias("mx")).collect()
    }
    assert mx == per
    # subset stability: sharding only the even docs preserves shard id
    # and relative order
    sub = shard_for_training(
        {"documents": train.filter("doc_id % 2 = 0").join(t["documents"], "doc_id")}
    )
    full = {r.doc_id: (r.shard, r.shard_pos) for r in shards.collect()}
    sub_rows = sorted(
        ((r.shard, r.shard_pos, r.doc_id) for r in sub.collect())
    )
    for shard in set(s for s, _, _ in sub_rows):
        sub_order = [d for s, _, d in sub_rows if s == shard]
        full_order = [
            d
            for d, (s, _) in sorted(full.items(), key=lambda kv: kv[1])
            if s == shard and d % 2 == 0
        ]
        assert sub_order == full_order, shard
