"""Snapshot-versioned lake: immutable exports, pinned reads, vacuum.

The reference republishes into a fixed prefix and consumers poll the
latest manifest (reference README.md:5, main.py:266-282); a reader
racing a republish can see a half-landed snapshot, and yesterday's
snapshot is simply gone. Versioning makes each export an IMMUTABLE
snapshot — the manifest half of an Iceberg/Delta-style table format,
built from the export engine's existing committed-files manifest:

- files land under ``{out}/v{N}/{table}/`` — a version directory is
  itself a complete lake prefix, never modified after commit;
- ``manifest-v{N}.json`` lists exactly that version's files (plus the
  observe()-collected quality metrics);
- a single tiny ``latest`` pointer is the only mutable object, updated
  by one atomic temp+rename AFTER everything else is committed.

Reader contract: resolve a version once, read consistently forever —
concurrent exports never touch a committed version's files, and vacuum
only drops versions older than the retention window. Time travel is
``load_versioned_table(..., version=K)``; a crash mid-export leaves at
worst an orphaned, unreferenced ``v{N}`` directory that the next
export of the same number overwrites and vacuum never counts, because
versions exist only once their manifest + pointer land.

At 100 TB the version directory costs nothing extra (the data was
being rewritten anyway — this is the reference's own full-republish
model, just retained); incremental use pairs it with
``overwrite_partitions`` inside a version or delta manifests.
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from parquet_export_spark.export import fs
from parquet_export_spark.export.manifest import build_manifest
from parquet_export_spark.export.pipeline import export_table_with_metrics
from parquet_export_spark.tables import TABLES, TableSpec

LATEST = "latest"


def _vdir(version: int) -> str:
    return f"v{version:06d}"


def _manifest_name(version: int) -> str:
    return f"manifest-{_vdir(version)}.json"


def current_version(spark: SparkSession, out_dir: str) -> int | None:
    """Version the ``latest`` pointer names, or None before any export."""
    pointer = fs.join(out_dir, LATEST)
    if not fs.exists(spark, pointer):
        return None
    return int(fs.read_text(spark, pointer).strip())


def export_snapshot(
    spark: SparkSession,
    source: Callable[[SparkSession, TableSpec], DataFrame],
    out_dir: str,
    tables: dict[str, TableSpec] | None = None,
    canonical_json: bool = False,
) -> int:
    """Export every table as the next immutable snapshot; returns its
    version number. Commit order is the correctness story: data files
    -> version manifest -> pointer (atomic rename). A reader following
    the pointer can only ever observe fully committed snapshots.
    """
    tables = tables if tables is not None else TABLES
    prev = current_version(spark, out_dir)
    version = 1 if prev is None else prev + 1
    vdir = fs.join(out_dir, _vdir(version))
    files: dict[str, list[str]] = {}
    metrics: dict[str, dict] = {}
    for name, spec in tables.items():
        df = source(spark, spec)
        files[name], metrics[name] = export_table_with_metrics(
            df, vdir, spec, canonical_json=canonical_json
        )
    manifest = build_manifest(files, metrics=metrics)
    # paths are version-qualified so every manifest is self-contained
    # relative to out_dir (a pinned reader never consults the pointer)
    manifest["version"] = version
    manifest["files"] = {
        t: [f"{_vdir(version)}/{p}" for p in paths]
        for t, paths in manifest["files"].items()
    }
    fs.write_text(
        spark, fs.join(out_dir, _manifest_name(version)), json.dumps(manifest, indent=2)
    )
    fs.write_text(spark, fs.join(out_dir, LATEST), str(version))
    return version


def load_versioned_table(
    spark: SparkSession,
    out_dir: str,
    name: str,
    version: int | None = None,
    schema=None,
) -> DataFrame:
    """Read one table at a pinned snapshot (None = resolve latest ONCE;
    the returned DataFrame stays on that version regardless of later
    exports). Paths are passed explicitly, so Catalyst scans exactly
    the snapshot's committed files with normal pushdown/pruning."""
    if version is None:
        version = current_version(spark, out_dir)
        if version is None:
            raise FileNotFoundError(f"no snapshot exported under {out_dir}")
    manifest = json.loads(
        fs.read_text(spark, fs.join(out_dir, _manifest_name(version)))
    )
    paths = [fs.join(out_dir, p) for p in manifest["files"][name]]
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(*paths)


def vacuum(spark: SparkSession, out_dir: str, keep_last: int = 2) -> list[int]:
    """Drop snapshots older than the ``keep_last`` most recent; returns
    the removed version numbers. Never touches the pointed-to latest
    (``keep_last`` is floored at 1), so pinned readers inside the
    retention window are safe by construction — the reference's model
    (one mutable prefix) is the degenerate ``keep_last=1`` case."""
    keep_last = max(1, keep_last)
    latest = current_version(spark, out_dir)
    if latest is None:
        return []
    versions = sorted(
        int(n[len("manifest-v") : -len(".json")])
        for n in fs.list_names(spark, out_dir)
        if n.startswith("manifest-v") and n.endswith(".json")
    )
    doomed = [v for v in versions if v <= latest - keep_last]
    for v in doomed:
        fs.delete(spark, fs.join(out_dir, _vdir(v)), recursive=True)
        fs.delete(spark, fs.join(out_dir, _manifest_name(v)))
    return doomed
