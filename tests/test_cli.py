"""CLI export entrypoint test (reference `python main.py` parity)."""

from __future__ import annotations

import json
import os

import pytest

from parquet_export_spark.__main__ import main
from tests.vera_fixtures import fixture_dataframes


@pytest.fixture(scope="module")
def vera_source(spark, tmp_path_factory):
    src = tmp_path_factory.mktemp("vera_src")
    for name, df in fixture_dataframes(spark, 30).items():
        df.coalesce(1).write.mode("overwrite").parquet(str(src / name))
    return str(src)


def test_cli_export_full(spark, vera_source, tmp_path):
    out = str(tmp_path / "lake")
    assert main(["export", "--source", f"parquet:{vera_source}", "--out", out]) == 0
    manifest = json.load(open(os.path.join(out, "manifest.json")))
    assert len(manifest["files"]) == 7
    for objs in manifest["files"].values():
        assert objs, "every table produced files"
        for obj in objs:
            assert os.path.exists(os.path.join(out, obj))
            assert obj.endswith("_zstd.parquet")


def test_cli_export_single_table_with_limit(spark, vera_source, tmp_path, monkeypatch):
    out = str(tmp_path / "lake1")
    monkeypatch.setenv("DEBUG_TABLE", "code")
    monkeypatch.setenv("DEBUG", "true")
    assert main(["export", "--source", f"parquet:{vera_source}", "--out", out]) == 0
    manifest = json.load(open(os.path.join(out, "manifest.json")))
    assert list(manifest["files"]) == ["code"]
