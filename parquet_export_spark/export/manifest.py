"""Manifest generation (reference main.py:103-113; shape README.md:79-99).

``manifest.json``::

    {
      "timestamp": <epoch millis>,
      "dateStr": "<ISO-8601 UTC>",
      "files": {"<table>": ["<table>/<file>", ...], ...}
    }

Deliberate divergence from the reference (SURVEY.md §4.3): the manifest
lists only files that were actually committed — the reference appended
names even when the upload failed (main.py:171-176, 240-243).
"""

from __future__ import annotations

import json
import os
import time
from datetime import datetime, timezone


def build_manifest(files_per_table: dict[str, list[str]], now_ms: int | None = None) -> dict:
    ts = int(time.time() * 1000) if now_ms is None else now_ms
    return {
        "timestamp": ts,
        "dateStr": datetime.fromtimestamp(ts / 1000, tz=timezone.utc).isoformat(),
        "files": {
            table: [f"{table}/{name}" for name in names]
            for table, names in files_per_table.items()
        },
    }


def write_manifest(out_dir: str, files_per_table: dict[str, list[str]]) -> str:
    path = os.path.join(out_dir, "manifest.json")
    with open(path, "w") as fh:
        json.dump(build_manifest(files_per_table), fh, indent=2)
    return path
