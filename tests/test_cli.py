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


def test_cli_snapshot_and_vacuum(spark, vera_source, tmp_path, capsys):
    out = str(tmp_path / "vlake")
    assert main(["snapshot", "--source", f"parquet:{vera_source}", "--out", out]) == 0
    assert capsys.readouterr().out.strip() == "1"
    # second snapshot: only `code` changed; everything else metadata-only
    assert (
        main([
            "snapshot", "--source", f"parquet:{vera_source}",
            "--out", out, "--changed", "code",
        ]) == 0
    )
    assert capsys.readouterr().out.strip() == "2"
    m2 = json.load(open(os.path.join(out, "manifest-v000002.json")))
    assert all(p.startswith("v000001/") for p in m2["files"]["contracts"])
    assert all(p.startswith("v000002/") for p in m2["files"]["code"])
    assert main(["vacuum", "--out", out, "--keep-last", "1"]) == 0
    assert not os.path.exists(os.path.join(out, "manifest-v000001.json"))
    # v1's directory survives: v2 still references its unchanged tables
    assert os.path.exists(os.path.join(out, "v000001"))


def test_cli_validate_clean_and_corrupt(spark, sf_dir, tmp_path, capsys):
    """`validate --lake` exits 0 on the clean testdata lake, 1 on a
    lake with a genuine PK violation, printing the per-constraint
    report either way."""
    from pyspark.sql import functions as F

    from parquet_export_spark.sources.lake import load_tables
    from tests.oracle_harness import fixture_lake

    assert main(["validate", "--lake", sf_dir]) == 0
    out = capsys.readouterr().out
    assert "pk_orders\t0" in out and "fk_lineitem_orders\t0" in out

    orders = load_tables(spark, sf_dir)["orders"]
    dup = orders.unionByName(orders.limit(5))  # 5 duplicated keys
    bad_dir = fixture_lake(
        spark, sf_dir, str(tmp_path / "badlake"), {"orders": dup}
    )
    assert main(["validate", "--lake", bad_dir]) == 1
    out = capsys.readouterr().out
    assert "pk_orders\t5" in out
