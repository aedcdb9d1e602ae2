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
