"""Sharded-JSONL sink (Python DataSource WRITER API).

``df.write.format("jsonl_shards").option("path", dir).save()`` — the
writer half of the custom-connector surface (sources/datagen.py covers
the batch/stream READER half). Spark 4's Python DataSource writer is
a two-phase commit protocol, and this sink implements it the same way
the export engine's parquet writer earns its committed-files-only
manifest guarantee (export/manifest.py):

- each task streams its partition to a HIDDEN temp file (dot-prefixed
  — invisible to readers) and returns a commit message naming it;
- ``commit`` runs on the driver only after EVERY task succeeded:
  temps are renamed to ``shard-{i:05d}-{rows}.jsonl`` in partition
  order and a ``_manifest.json`` (shard list + row counts) is written
  last — a reader that trusts the manifest can never observe a
  half-written load;
- ``abort`` removes the temps, so a failed job leaves no visible
  shards and no manifest.

Scale + portability notes: rows stream through the task (O(1) memory);
shard count = partition count, so ``repartition(n)`` sizes shards.
Paths use plain ``os`` I/O — correct wherever executors and driver
share a filesystem (local mode, NFS; the contract the tests pin). An
object-store variant would swap ``os`` for the Hadoop FS shim
(export/fs.py) exactly as the parquet writer does; the COMMIT PROTOCOL
— the part the DataSource API is demonstrating — is storage-agnostic.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _ShardCommit(WriterCommitMessage):
    tmp_name: str
    n_rows: int


class _ShardBatchWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        path = options.get("path")
        if not path:
            raise ValueError("jsonl_shards requires .option('path', <dir>)")
        self.path = path
        self.overwrite = overwrite

    # executor-side: one call per partition, rows streamed
    def write(self, iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        tmp = f".tmp-shard-{pid:05d}-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, tmp), "w") as fh:
            for row in iterator:
                # recursive: nested structs must serialize as JSON
                # objects, not positional arrays of a pickled Row
                fh.write(json.dumps(row.asDict(recursive=True), default=str) + "\n")
                n += 1
        return _ShardCommit(tmp_name=tmp, n_rows=n)

    # driver-side: runs only after every task returned a message.
    # Crash-window ordering: (1) new shards land via os.replace (a
    # same-named survivor is atomically superseded, never missing),
    # (2) the manifest swaps, (3) ONLY THEN do stale shards retire —
    # at every intermediate point the surviving manifest (old or new)
    # references only files that exist. Append mode continues the
    # previous manifest's numbering and carries its shards forward, so
    # committed data is never renamed over or dropped from the index.
    def commit(self, messages):
        mpath = os.path.join(self.path, "_manifest.json")
        prev: list[dict] = []
        if not self.overwrite and os.path.exists(mpath):
            with open(mpath) as fh:
                prev = json.load(fh)["shards"]
        new = []
        for i, m in enumerate(messages):
            name = f"shard-{len(prev) + i:05d}-{m.n_rows}.jsonl"
            if os.path.exists(os.path.join(self.path, name)):
                # overwrite-mode name collision with a COMMITTED shard
                # (same index and row count): os.replace would put new
                # bytes under a name the OLD manifest still references
                # until step (2) — a crash in between would leave the
                # surviving manifest pointing at mixed content. A
                # unique suffix keeps the old file untouched until the
                # post-swap retire step; the manifest, not the name,
                # is the index.
                name = (
                    f"shard-{len(prev) + i:05d}-{m.n_rows}"
                    f"-{uuid.uuid4().hex[:8]}.jsonl"
                )
            os.replace(
                os.path.join(self.path, m.tmp_name),
                os.path.join(self.path, name),
            )
            new.append({"name": name, "rows": m.n_rows})
        shards = prev + new
        manifest = {"shards": shards, "total_rows": sum(s["rows"] for s in shards)}
        tmp = os.path.join(self.path, ".tmp-manifest.json")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=2)
        os.replace(tmp, mpath)
        keep = {s["name"] for s in shards}
        for name in os.listdir(self.path):
            # retire superseded shards (overwrite) and sweep orphaned
            # temps from failed/speculative attempts — every temp of
            # THIS job was consumed by the renames above, and the sink
            # is single-writer (same contract as the versioned lake)
            stale_shard = name.startswith("shard-") and name not in keep
            orphan_tmp = name.startswith(".tmp-shard-")
            if stale_shard or orphan_tmp:
                os.remove(os.path.join(self.path, name))

    def abort(self, messages):
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.tmp_name))
            except FileNotFoundError:
                pass


class JsonlShardsSink(DataSource):
    """Options: path (required). Modes: append (default) numbers new
    shards after the committed set and carries the previous manifest's
    shards forward; overwrite replaces the committed set, swapping the
    manifest before any old file is removed."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_shards"

    def writer(self, schema, overwrite: bool):
        return _ShardBatchWriter(self.options, overwrite)


def register_jsonl_sink(spark) -> None:
    """Register the sink for this session (same module-importability
    contract as sources/datagen.py::register_datagen)."""
    spark.dataSource.register(JsonlShardsSink)
