"""Corpus curation operators: deterministic splits and the end-to-end
quality filter (SURVEY.md §2C — the stages between raw ingest and
training shards).

Both are single-scan projections/filters — embarrassingly parallel,
no shuffle except the presentation sort — and fully oracle-checkable:
the split uses content-addressed md5 bucketing (identical hex in every
engine), the filter pure integer/double arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: 4-hex-digit threshold: docs whose md5(doc_id) prefix sorts below
#: this go to train — 0xcccd / 0x10000 = 80.0% expected.
TRAIN_THRESHOLD_HEX = "cccd"


def train_eval_split(t: dict[str, DataFrame]) -> DataFrame:
    """Hash-based train/eval assignment per document.

    The reproducibility-critical split operator: assignment is a pure
    function of the KEY (md5 of doc_id, first 4 hex digits compared
    against a constant), so it is stable across engines, partitionings,
    reruns, and incremental arrivals — new documents join a side
    without reshuffling old ones. Seeded-RNG splits (``randomSplit``)
    guarantee none of that: their assignment depends on partition
    layout. ~80% train by hash-prefix threshold (0xcccd/0x10000).

    At 100 TB: one projection, no shuffle, no state; the same
    expression works as a filter pushed into any downstream read.
    """
    h4 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    split = F.when(h4 < F.lit(TRAIN_THRESHOLD_HEX), "train").otherwise("eval")
    return (
        t["documents"]
        .select(
            "doc_id",
            h4.alias("hash_prefix"),
            split.alias("split"),
        )
        .orderBy("doc_id")
    )


def corpus_quality_filter(t: dict[str, DataFrame]) -> DataFrame:
    """The composed curation gate: length bounds + lexical-diversity
    floor + mean-word-length band, applied in one pass; survivors come
    out with their metrics (the rows a training shard would keep).

    Composition of the individual text metrics (operators/text.py) into
    the actual filter stage — demonstrates that the metric queries are
    not demos but operators a pipeline chains. All integer/double
    arithmetic on counts -> bit-identical across engines.
    """
    docs = t["documents"]
    toks = F.split("text", " ")
    n_toks = F.size(toks)
    n_chars = F.length("text")
    n_distinct = F.size(F.array_distinct(toks))
    ttr = n_distinct.cast("double") / n_toks.cast("double")
    mean_word_len = (n_chars - n_toks + 1).cast("double") / n_toks.cast("double")
    keep = (
        (n_chars >= 50)
        & (n_chars <= 10_000)
        & (n_toks >= 10)
        & (ttr >= 0.3)
        & (mean_word_len >= 3.0)
        & (mean_word_len <= 10.0)
    )
    return (
        docs.filter(keep)
        .select(
            "doc_id",
            "lang",
            "source",
            n_toks.alias("n_tokens"),
            F.round(ttr, 9).alias("ttr"),
            F.round(mean_word_len, 9).alias("mean_word_len"),
        )
        .orderBy("doc_id")
    )
