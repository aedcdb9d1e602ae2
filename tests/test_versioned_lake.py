"""Snapshot-versioned lake (export/versioned.py): immutable versions,
pointer resolution, time travel, reader isolation, vacuum retention."""

from __future__ import annotations

import dataclasses
import os

import pytest
from pyspark.sql import functions as F

from parquet_export_spark.export import versioned as V
from parquet_export_spark.tables import TABLES
from tests.vera_fixtures import fixture_dataframes

N = 60


@pytest.fixture(scope="module")
def vlake(spark, tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("vlake"))
    dfs = fixture_dataframes(spark, N)
    tables = {
        "contracts": dataclasses.replace(TABLES["contracts"], rows_per_file=25)
    }
    src_full = lambda s, spec: dfs[spec.name]  # noqa: E731
    v1 = V.export_snapshot(spark, src_full, out_dir, tables=tables)
    # v2 exports a CHANGED snapshot (half the rows) — the republish case
    src_half = lambda s, spec: dfs[spec.name].limit(N // 2)  # noqa: E731
    v2 = V.export_snapshot(spark, src_half, out_dir, tables=tables)
    return out_dir, dfs, tables, v1, v2


def test_versions_and_pointer(spark, vlake):
    out_dir, _, _, v1, v2 = vlake
    assert (v1, v2) == (1, 2)
    assert V.current_version(spark, out_dir) == 2


def test_time_travel_reads(spark, vlake):
    out_dir, dfs, _, v1, v2 = vlake
    old = V.load_versioned_table(spark, out_dir, "contracts", version=v1)
    new = V.load_versioned_table(spark, out_dir, "contracts", version=v2)
    latest = V.load_versioned_table(spark, out_dir, "contracts")
    assert old.count() == N
    assert new.count() == N // 2
    assert latest.count() == N // 2  # pointer resolves to v2


def test_committed_version_files_untouched(spark, vlake):
    """v2's export must not have modified a single committed v1 file —
    the immutability contract pinned readers rely on."""
    out_dir, _, _, v1, _ = vlake
    import json

    from parquet_export_spark.export import fs

    manifest = json.loads(
        fs.read_text(spark, fs.join(out_dir, V._manifest_name(v1)))
    )
    for rel in manifest["files"]["contracts"]:
        assert os.path.exists(os.path.join(out_dir, rel)), rel


def test_manifest_carries_metrics_and_version(spark, vlake):
    out_dir, _, _, v1, _ = vlake
    import json

    from parquet_export_spark.export import fs

    m = json.loads(fs.read_text(spark, fs.join(out_dir, V._manifest_name(v1))))
    assert m["version"] == v1
    assert m["metrics"]["contracts"]["n_rows"] == N


def test_vacuum_retention(spark, vlake):
    out_dir, dfs, tables, v1, v2 = vlake
    # a third version, then keep only the last two
    src = lambda s, spec: dfs[spec.name].limit(10)  # noqa: E731
    v3 = V.export_snapshot(spark, src, out_dir, tables=tables)
    removed = V.vacuum(spark, out_dir, keep_last=2)
    assert removed == [v1]
    assert not os.path.exists(os.path.join(out_dir, V._vdir(v1)))
    # survivors still read
    assert V.load_versioned_table(spark, out_dir, "contracts", version=v2).count() == N // 2
    assert V.load_versioned_table(spark, out_dir, "contracts", version=v3).count() == 10
    # keep_last floors at 1: latest can never be vacuumed
    assert V.vacuum(spark, out_dir, keep_last=0) == [v2]
    assert V.load_versioned_table(spark, out_dir, "contracts").count() == 10


def test_metadata_only_republish_and_reference_aware_vacuum(
    spark, tmp_path_factory
):
    """Unchanged tables republish as manifest entries only (zero data
    writes); vacuum follows the reference graph, keeping an old version
    directory alive while any retained manifest points into it."""
    out_dir = str(tmp_path_factory.mktemp("vlake_inc"))
    dfs = fixture_dataframes(spark, N)
    tables = {
        "contracts": dataclasses.replace(TABLES["contracts"], rows_per_file=25),
        "code": dataclasses.replace(TABLES["code"], rows_per_file=25),
    }
    src = lambda s, spec: dfs[spec.name]  # noqa: E731
    v1 = V.export_snapshot(spark, src, out_dir, tables=tables)
    # v2: only contracts changed; code must NOT be rewritten
    src2 = lambda s, spec: dfs[spec.name].limit(N // 2)  # noqa: E731
    v2 = V.export_snapshot(
        spark, src2, out_dir, tables=tables, changed_tables={"contracts"}
    )
    assert not os.path.exists(
        os.path.join(out_dir, V._vdir(v2), "code")
    ), "unchanged table wrote data files"
    code_v2 = V.load_versioned_table(spark, out_dir, "code", version=v2)
    assert code_v2.count() == N  # reads v1's files through v2's manifest
    assert (
        V.load_versioned_table(spark, out_dir, "contracts", version=v2).count()
        == N // 2
    )
    # retention keeps only v2's manifest; v1's DIRECTORY must survive
    # because v2 references its code files
    removed = V.vacuum(spark, out_dir, keep_last=1)
    assert removed == [v1]
    assert not os.path.exists(os.path.join(out_dir, V._manifest_name(v1)))
    assert os.path.exists(os.path.join(out_dir, V._vdir(v1), "code"))
    assert V.load_versioned_table(spark, out_dir, "code").count() == N


def test_pointer_loss_falls_back_to_manifest_listing(spark, tmp_path_factory):
    """The latest pointer is a cache: deleting it (simulating the
    delete+rename replacement window) must not produce a spurious
    'no snapshot' — resolution falls back to the manifest listing."""
    out_dir = str(tmp_path_factory.mktemp("vlake_ptr"))
    dfs = fixture_dataframes(spark, N)
    tables = {"code": dataclasses.replace(TABLES["code"], rows_per_file=25)}
    src = lambda s, spec: dfs[spec.name]  # noqa: E731
    V.export_snapshot(spark, src, out_dir, tables=tables)
    os.remove(os.path.join(out_dir, V.LATEST))
    assert V.current_version(spark, out_dir) == 1
    assert V.load_versioned_table(spark, out_dir, "code").count() == N


def test_unknown_changed_table_rejected(spark, tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("vlake_bad"))
    dfs = fixture_dataframes(spark, N)
    tables = {"code": dataclasses.replace(TABLES["code"], rows_per_file=25)}
    src = lambda s, spec: dfs[spec.name]  # noqa: E731
    V.export_snapshot(spark, src, out_dir, tables=tables)
    with pytest.raises(ValueError, match="unknown tables"):
        V.export_snapshot(
            spark, src, out_dir, tables=tables, changed_tables={" code"}
        )


def test_vacuum_reclaims_orphaned_version_dirs(spark, tmp_path_factory):
    """A version directory kept alive only by a cross-version reference
    must be reclaimed by a LATER vacuum once the referencing manifest
    itself retires — the two-stage leak case."""
    out_dir = str(tmp_path_factory.mktemp("vlake_orphan"))
    dfs = fixture_dataframes(spark, N)
    tables = {
        "contracts": dataclasses.replace(TABLES["contracts"], rows_per_file=25),
        "code": dataclasses.replace(TABLES["code"], rows_per_file=25),
    }
    src = lambda s, spec: dfs[spec.name]  # noqa: E731
    v1 = V.export_snapshot(spark, src, out_dir, tables=tables)
    v2 = V.export_snapshot(
        spark, src, out_dir, tables=tables, changed_tables={"contracts"}
    )
    assert V.vacuum(spark, out_dir, keep_last=1) == [v1]
    # v1's dir survives: v2 references its code files
    assert os.path.exists(os.path.join(out_dir, V._vdir(v1)))
    # v3 rewrites everything; v2's manifest retires -> nothing points at
    # v1 OR v2 any more, and BOTH dirs must now be reclaimed
    v3 = V.export_snapshot(spark, src, out_dir, tables=tables)
    assert V.vacuum(spark, out_dir, keep_last=1) == [v2]
    assert not os.path.exists(os.path.join(out_dir, V._vdir(v1)))
    assert not os.path.exists(os.path.join(out_dir, V._vdir(v2)))
    assert V.load_versioned_table(spark, out_dir, "code", version=v3).count() == N


def test_stale_pointer_never_reuses_committed_version(
    spark, tmp_path_factory
):
    """Crash between manifest write and pointer refresh leaves the
    pointer one behind; resolution must take the manifest listing's
    max so the next export cannot reuse (and overwrite) a committed
    version number."""
    out_dir = str(tmp_path_factory.mktemp("vlake_stale"))
    dfs = fixture_dataframes(spark, N)
    tables = {"code": dataclasses.replace(TABLES["code"], rows_per_file=25)}
    src = lambda s, spec: dfs[spec.name]  # noqa: E731
    V.export_snapshot(spark, src, out_dir, tables=tables)
    V.export_snapshot(spark, src, out_dir, tables=tables)
    # simulate the crash window: pointer rolled back to 1
    with open(os.path.join(out_dir, V.LATEST), "w") as fh:
        fh.write("1")
    assert V.current_version(spark, out_dir) == 2
    assert V.export_snapshot(spark, src, out_dir, tables=tables) == 3


def test_schema_evolution_across_versions(spark, tmp_path_factory):
    """Republish with an added column: pinned readers keep each
    version's own schema; a cross-version scan reconciles via
    mergeSchema (old rows NULL in the new column). The immutable-
    version layout is what makes additive evolution safe — no file is
    ever rewritten under a reader holding the old schema."""
    from pyspark.sql import functions as F

    from parquet_export_spark.tables import TableSpec

    out_dir = str(tmp_path_factory.mktemp("vlake_schema"))
    dfs = fixture_dataframes(spark, N)
    bare = {"code": TableSpec(name="code", datatypes={}, rows_per_file=25)}
    V.export_snapshot(spark, lambda s, spec: dfs["code"], out_dir, tables=bare)
    V.export_snapshot(
        spark,
        lambda s, spec: dfs["code"].withColumn("audited", F.lit(True)),
        out_dir,
        tables=bare,
    )
    old = V.load_versioned_table(spark, out_dir, "code", version=1)
    new = V.load_versioned_table(spark, out_dir, "code", version=2)
    assert "audited" not in old.columns
    assert "audited" in new.columns
    merged = (
        spark.read.option("mergeSchema", "true")
        .parquet(
            os.path.join(out_dir, "v000001", "code"),
            os.path.join(out_dir, "v000002", "code"),
        )
    )
    assert "audited" in merged.columns
    assert merged.count() == 2 * N
    assert merged.filter(F.col("audited").isNull()).count() == N
