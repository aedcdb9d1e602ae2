"""Multimodal (binary payload) column operators (SURVEY.md §2C).

Treats image/audio/video as opaque ``binary`` columns with typed
metadata. The Spark-side plumbing — schema, Arrow batch shape,
``mapInPandas`` signature, partition behavior — is real and tested;
the actual media decoding is stubbed (no image/audio libs in this
container) behind ``register_decoder`` / a deterministic fake.

Pattern at 100 TB: binary payloads ride in their own column so column
pruning skips them unless a stage needs bytes; feature extraction is
``mapInPandas`` over Arrow batches (one Python hop, vectorized), with
``spark.sql.files.maxPartitionBytes`` sizing partitions by payload
weight rather than row count.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Feature schema produced by extract_features.
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("media_type", T.StringType()),
    ]
)

#: Magic-number sniffing over the payload prefix (pure bytes logic —
#: real, not stubbed).
_MAGIC = [
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"RIFF", "audio/wav"),
    (b"ID3", "audio/mpeg"),
]


def sniff_media_type(payload: bytes | None) -> str:
    if not payload:
        return "empty"
    for magic, mtype in _MAGIC:
        if payload.startswith(magic):
            return mtype
    if all(32 <= b < 127 or b in (9, 10, 13) for b in payload[:64]):
        return "text/plain"
    return "application/octet-stream"


def decode_image(payload: bytes) -> "object":
    """STUB: real image decode requires PIL/cv2, not in this container.

    The Spark plumbing calls decoders through ``register_decoder``;
    tests install a deterministic fake.
    """
    raise NotImplementedError(
        "image decode requires an imaging library; register a decoder via "
        "register_decoder('image/png', fn)"
    )


_DECODERS: dict[str, Callable[[bytes], object]] = {}


def register_decoder(media_type: str, fn: Callable[[bytes], object]) -> None:
    _DECODERS[media_type] = fn


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Adapter for the testdata lake: materialize a binary payload
    column from text (the documents table has no media blobs). Real
    deployments read a true ``binary`` column instead.

    Repartitioned so mapInPandas fans out across Python workers
    instead of inheriting a single input split.
    """
    cores = docs.sparkSession.sparkContext.defaultParallelism
    n = max(docs.rdd.getNumPartitions(), max(cores // 4, 2))
    return docs.repartition(n, "doc_id").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )


def extract_features(payloads: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, payload) batches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payload.map(lambda b: 0 if b is None else len(b)).astype(
                        "int32"
                    ),
                    "first_byte": payload.map(
                        lambda b: -1 if b is None or len(b) == 0 else b[0]
                    ).astype("int32"),
                    "media_type": payload.map(
                        lambda b: sniff_media_type(None if b is None else bytes(b))
                    ),
                }
            )

    return payloads.mapInPandas(run, FEATURE_SCHEMA)


def multimodal_features(t: dict[str, DataFrame]) -> DataFrame:
    """Registry entry: binary plumbing end-to-end over the documents
    table (encode -> mapInPandas -> typed features). Oracle-checkable
    because every feature is reproducible in SQL over the text."""
    return extract_features(with_binary_payload(t["documents"])).orderBy("doc_id")


def byte_histograms(payloads: DataFrame, n_bins: int = 16) -> DataFrame:
    """Per-payload byte-value histogram via ``mapInArrow`` — the
    zero-copy Arrow path for numeric kernels over binary columns
    (opcode histograms over EVM bytecode are this exact shape against
    the reference's ``code.code`` column, reference config.py:9).

    Bins cover [0, 256) in ``n_bins`` equal ranges; counts are int64.
    """
    import pyarrow as pa

    width = 256 // n_bins

    def run(batches):
        import numpy as np

        for batch in batches:
            ids = batch.column("doc_id")
            hists = []
            for buf in batch.column("payload"):
                b = buf.as_py()
                if b is None or len(b) == 0:
                    hists.append([0] * n_bins)
                else:
                    arr = np.frombuffer(b, dtype=np.uint8)
                    hists.append(
                        np.bincount(arr // width, minlength=n_bins)[:n_bins].tolist()
                    )
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(hists, type=pa.list_(pa.int64()))],
                names=["doc_id", "hist"],
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("hist", T.ArrayType(T.LongType())),
        ]
    )
    return payloads.mapInArrow(run, schema)


def byte_histograms_query(t: dict[str, DataFrame]) -> DataFrame:
    """Registry entry: Arrow-native (mapInArrow, zero-copy) byte
    histograms over the utf-8 payloads, 16 bins.

    Oracle-checkable because this corpus is pure ASCII (max codepoint
    121, verified at every SF), so utf-8 bytes == codepoints and
    DuckDB can recompute the histogram from characters. The operator
    itself is byte-general — on real media blobs there is no SQL
    twin, which is exactly why the kernel is an Arrow batch pass.

    The registered output serializes ``hist`` to a space-joined
    string (driver-canon rule: no top-level array columns — the
    harness's pandas canonicalizer cannot hash list cells). The
    array-typed :func:`byte_histograms` remains the library API.
    """
    hists = byte_histograms(with_binary_payload(t["documents"]))
    return hists.select(
        "doc_id",
        F.array_join(F.col("hist").cast("array<string>"), " ").alias("hist"),
    ).orderBy("doc_id")


def resize_images(
    payloads: DataFrame, width: int, height: int, media_type: str = "image/png"
) -> DataFrame:
    """Resize plumbing: decode -> resize -> re-encode inside one
    mapInPandas pass. The resize kernel itself is the registered
    decoder's concern (STUB here — no imaging libs); the Spark-side
    batch shape, schema, and payload round-trip are real."""
    if media_type not in _DECODERS:
        raise NotImplementedError(f"no decoder registered for {media_type!r}")
    decoder = _DECODERS[media_type]
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["payload"].map(lambda b: decoder(bytes(b)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": decoded.map(
                        lambda d: d.get("resized_bytes", b"")
                    ),
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                }
            ).astype({"width": "int32", "height": "int32"})

    return payloads.mapInPandas(run, schema)


def sample_frames(
    payloads: DataFrame, every_n: int = 10, media_type: str = "video/mp4"
) -> DataFrame:
    """Frame-sampling plumbing: one input video row -> many frame rows
    (fan-out inside mapInPandas; output cardinality > input is the
    shape that matters). Frame extraction is decoder-provided (STUB)."""
    if media_type not in _DECODERS:
        raise NotImplementedError(f"no decoder registered for {media_type!r}")
    decoder = _DECODERS[media_type]
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_index", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = decoder(bytes(payload)).get("frames", [])
                for i, frame in enumerate(frames):
                    if i % every_n == 0:
                        out_ids.append(doc_id)
                        out_idx.append(i)
                        out_frames.append(frame)
            yield pd.DataFrame(
                {"doc_id": out_ids, "frame_index": out_idx, "frame": out_frames}
            ).astype({"frame_index": "int32"}, errors="ignore")

    return payloads.mapInPandas(run, schema)


def decoded_features(payloads: DataFrame, media_type: str) -> DataFrame:
    """Decode via a registered decoder inside mapInPandas; the decoder
    output is reduced to a stable (doc_id, width, height) shape.

    Raises at plan-build time if no decoder is registered — fail fast
    like the reference's unknown-dtype path (main.py:149-150).
    """
    if media_type not in _DECODERS:
        raise NotImplementedError(f"no decoder registered for {media_type!r}")
    decoder = _DECODERS[media_type]
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["payload"].map(lambda b: decoder(bytes(b)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": decoded.map(lambda d: d["width"]).astype("int32"),
                    "height": decoded.map(lambda d: d["height"]).astype("int32"),
                }
            )

    return payloads.mapInPandas(run, schema)
