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
                fh.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _ShardCommit(tmp_name=tmp, n_rows=n)

    # driver-side: runs only after every task returned a message.
    # Order matters for crash windows: new shards land FIRST
    # (os.replace — same-named survivors from a previous commit are
    # atomically superseded, never missing), stale shards retire
    # after, and the manifest swaps last — a manifest-trusting reader
    # never references a file that does not exist.
    def commit(self, messages):
        shards = []
        for i, m in enumerate(messages):
            name = f"shard-{i:05d}-{m.n_rows}.jsonl"
            os.replace(
                os.path.join(self.path, m.tmp_name),
                os.path.join(self.path, name),
            )
            shards.append({"name": name, "rows": m.n_rows})
        if self.overwrite:
            keep = {s["name"] for s in shards}
            for name in os.listdir(self.path):
                if name.startswith("shard-") and name not in keep:
                    os.remove(os.path.join(self.path, name))
        manifest = {"shards": shards, "total_rows": sum(s["rows"] for s in shards)}
        tmp = os.path.join(self.path, ".tmp-manifest.json")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh, indent=2)
        os.replace(tmp, os.path.join(self.path, "_manifest.json"))

    def abort(self, messages):
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.tmp_name))
            except FileNotFoundError:
                pass


class JsonlShardsSink(DataSource):
    """Options: path (required). Modes: append (default) adds shards
    beside existing ones under fresh names only if none clash —
    overwrite replaces all committed shards atomically at commit."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_shards"

    def writer(self, schema, overwrite: bool):
        return _ShardBatchWriter(self.options, overwrite)


def register_jsonl_sink(spark) -> None:
    """Register the sink for this session (same module-importability
    contract as sources/datagen.py::register_datagen)."""
    spark.dataSource.register(JsonlShardsSink)
