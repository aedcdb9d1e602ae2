"""Export-parity golden tests (SURVEY.md §5.3.2).

Round-trip VerA-shaped fixtures through the export pipeline and assert:
schema per SURVEY.md §1.3, rows-per-file bound, row-range naming,
manifest shape (reference README.md:79-99), JSON semantic equality,
timestamps naive-UTC.
"""

from __future__ import annotations

import json
import os
import re

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parquet_export_spark.export.pipeline import export_lake
from parquet_export_spark.tables import TABLES
from tests.vera_fixtures import fixture_dataframes, make_fixture_rows

N = 50


@pytest.fixture(scope="module")
def exported(spark, tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("lake"))
    dfs = fixture_dataframes(spark, N)
    # Tight rows_per_file to force file rotation (the main.py:232 path)
    # plus a final partial file (the main.py:252-263 path).
    tables = {
        name: __import__("dataclasses").replace(spec, rows_per_file=20)
        for name, spec in TABLES.items()
    }
    files = export_lake(spark, lambda s, spec: dfs[spec.name], out_dir, tables=tables)
    return out_dir, files, dfs


def test_manifest_shape(exported):
    out_dir, files, _ = exported
    with open(os.path.join(out_dir, "manifest.json")) as fh:
        manifest = json.load(fh)
    # reference shape (README.md:79-99) + the additive metrics block
    assert set(manifest) == {"timestamp", "dateStr", "files", "metrics"}
    assert isinstance(manifest["timestamp"], int)
    assert set(manifest["files"]) == set(TABLES)
    for table, objs in manifest["files"].items():
        assert objs == [f"{table}/{n}" for n in files[table]]
        # every listed object exists (committed-files-only guarantee)
        for obj in objs:
            assert os.path.exists(os.path.join(out_dir, obj))


def test_manifest_metrics_observed_during_write(exported, spark):
    """The manifest's per-table metrics (observed inside the write job,
    zero extra scans) must equal what a separate count pass sees."""
    out_dir, _, dfs = exported
    with open(os.path.join(out_dir, "manifest.json")) as fh:
        manifest = json.load(fh)
    assert set(manifest["metrics"]) == set(TABLES)
    for table, m in manifest["metrics"].items():
        assert m["n_rows"] == dfs[table].count()
        for col, n_null in m.get("null_counts", {}).items():
            want = dfs[table].filter(F.col(col).isNull()).count()
            assert n_null == want, (table, col)


def test_row_range_naming_and_bound(exported):
    out_dir, files, _ = exported
    import pyarrow.parquet as pq

    pat = re.compile(r"^(\w+)_(\d+)_(\d+)_zstd\.parquet$")
    for table, names in files.items():
        prev_end = 0
        for name in names:
            m = pat.match(name)
            assert m, name
            start, end = int(m.group(2)), int(m.group(3))
            assert start == prev_end
            meta = pq.read_metadata(os.path.join(out_dir, table, name))
            # range reflects ACTUAL rows (fix of reference main.py:222)
            assert end - start == meta.num_rows
            assert meta.num_rows <= 20  # rows_per_file bound
            prev_end = end
        expected_rows = N // 2 if table == "sources" else N
        assert prev_end == expected_rows


def test_declared_schema(exported, spark):
    out_dir, files, _ = exported
    for table, spec in TABLES.items():
        df = spark.read.parquet(os.path.join(out_dir, table))
        got = {f.name: f.dataType for f in df.schema.fields}
        want = {f.name: f.dataType for f in spec.schema.fields}
        assert got == want, table
        # column order preserved
        assert [f.name for f in df.schema.fields] == spec.columns


def test_timestamps_naive_utc(exported, spark):
    out_dir, _, _ = exported
    df = spark.read.parquet(os.path.join(out_dir, "code"))
    field = dict((f.name, f.dataType) for f in df.schema.fields)["created_at"]
    assert isinstance(field, T.TimestampNTZType)
    rows = {r["code_hash"]: r for r in df.collect()}
    for src in make_fixture_rows(N)["code"]:
        got = rows[src["code_hash"]]["created_at"]
        assert got.tzinfo is None
        # wall clock equals the UTC wall clock of the tz-aware input
        assert got == src["created_at"].replace(tzinfo=None)


def test_json_semantic_fidelity(exported, spark):
    out_dir, _, _ = exported
    df = spark.read.parquet(os.path.join(out_dir, "compiled_contracts"))
    rows = {r["id"]: r for r in df.collect()}
    for src in make_fixture_rows(N)["compiled_contracts"]:
        got = rows[src["id"]]
        for col in TABLES["compiled_contracts"].json_columns:
            if src[col] is None:
                assert got[col] is None
            else:
                assert json.loads(got[col]) == json.loads(src[col])


def test_unknown_dtype_fails_fast():
    from parquet_export_spark.tables import spark_type

    with pytest.raises(ValueError, match="Type not supported"):
        spark_type("complex128")


def test_s3_conf_helper(spark):
    from parquet_export_spark.session import configure_s3

    configure_s3(spark, "http://localhost:9000", "ak", "sk")
    conf = spark._jsc.hadoopConfiguration()
    assert conf.get("fs.s3a.endpoint") == "http://localhost:9000"
    assert conf.get("fs.s3a.path.style.access") == "true"
    assert conf.get("fs.s3a.committer.name") == "magic"


def test_jdbc_plan_construction():
    from parquet_export_spark.sources.jdbc import JdbcSource
    from parquet_export_spark.tables import TableSpec

    src = JdbcSource(url="jdbc:postgresql://localhost:5432/vera", user="u", password="p")
    spec = TABLES["compiled_contracts"]
    opts = src.reader_options(spec)
    assert '"compiler_settings"::text' in opts["dbtable"]  # verbatim jsonb pushdown
    assert opts["fetchsize"] == "10000"
    dep_opts = src.reader_options(TABLES["contract_deployments"])
    assert dep_opts["partitionColumn"] == "block_number"
    preds = src.predicates(TABLES["contracts"])
    assert len(preds) == 16 and preds[0].endswith("= 0")
    off = src.dbtable(TABLES["contract_deployments"], offset=100)
    assert "ORDER BY" in off and "OFFSET 100" in off


def test_export_to_file_scheme_uri(spark, tmp_path):
    """The committed-files path must work on explicit Hadoop URIs, not
    just bare local paths — this drives list/rename/manifest through
    the FileSystem API exactly as an s3a:// out_dir would."""
    out_dir = f"file://{tmp_path}/lake"
    dfs = fixture_dataframes(spark, 30)
    tables = {
        name: __import__("dataclasses").replace(spec, rows_per_file=10)
        for name, spec in TABLES.items()
    }
    files = export_lake(spark, lambda s, spec: dfs[spec.name], out_dir, tables=tables)
    local = str(tmp_path / "lake")
    for table, names in files.items():
        assert names, table
        for n in names:
            assert re.match(rf"^{table}_\d+_\d+_zstd\.parquet$", n)
            assert os.path.exists(os.path.join(local, table, n))
        # no leftover part- files; any checksum sidecar must match a
        # live data file (Hadoop LocalFS renames move sidecars along —
        # consistent ones are fine, orphans are not)
        listing = os.listdir(os.path.join(local, table))
        assert not [f for f in listing if f.startswith("part-")]
        orphans = [
            f
            for f in listing
            if f.startswith(".") and f.endswith(".crc")
            and f[1:-4] not in listing
        ]
        assert orphans == [], orphans
        back = spark.read.parquet(f"{out_dir}/{table}")
        assert back.count() == dfs[table].count()
    manifest = json.loads(
        open(os.path.join(local, "manifest.json")).read()
    )
    assert set(manifest["files"]) == set(TABLES)


def test_fs_shim_roundtrip(spark, tmp_path):
    from parquet_export_spark.export import fs

    base = f"file://{tmp_path}"
    p = fs.join(base, "a", "b.txt")
    assert p == f"file://{tmp_path}/a/b.txt"
    fs.write_text(spark, p, '{"k": 1}')
    assert fs.exists(spark, p)
    assert fs.read_text(spark, p) == '{"k": 1}'
    fs.rename(spark, p, fs.join(base, "a", "c.txt"))
    assert not fs.exists(spark, p)
    assert fs.list_names(spark, fs.join(base, "a")) == ["c.txt"]
    assert fs.list_names(spark, base, recursive=True) == ["a/c.txt"]
    assert fs.delete(spark, fs.join(base, "a"), recursive=True)
    assert not fs.exists(spark, fs.join(base, "a"))


def test_fs_shim_nonlocal_scheme(spark, tmp_path, sf_dir):
    """The FS shim must work off the default filesystem: mount a
    Hadoop ViewFileSystem (viewfs://shimtest/) over a local directory
    and drive every helper through it — a scheme+authority resolved
    through the same FileSystem registry lookup s3a uses, with real
    path virtualization (viewfs paths never equal the backing file:
    paths), including the parquet footer read, which takes the
    parquet-hadoop branch for any non-file scheme. This is the closest
    an offline sandbox gets to object-store evidence; only the
    concrete impl behind the registry differs."""
    from parquet_export_spark.export import fs

    hconf = spark._jsc.hadoopConfiguration()
    hconf.set(
        "fs.viewfs.mounttable.shimtest.link./data", f"file://{tmp_path}/backing"
    )
    base = "viewfs://shimtest/data"
    p = fs.join(base, "m", "manifest.json")
    fs.write_text(spark, p, '{"files": []}')
    assert fs.exists(spark, p)
    assert fs.read_text(spark, p) == '{"files": []}'
    # overwrite goes through the temp+rename path, never truncates in place
    fs.write_text(spark, p, '{"files": ["a"]}')
    assert fs.read_text(spark, p) == '{"files": ["a"]}'
    assert fs.list_names(spark, fs.join(base, "m")) == ["manifest.json"]
    fs.rename(spark, p, fs.join(base, "m", "manifest.v2.json"))
    assert fs.list_names(spark, fs.join(base, "m")) == ["manifest.v2.json"]
    # footer row-count via parquet-hadoop (non-local branch)
    from parquet_export_spark.sources.lake import load_tables

    region = load_tables(spark, sf_dir)["region"]
    region.coalesce(1).write.mode("overwrite").parquet(
        f"file://{tmp_path}/backing/pq"
    )
    name = [
        f
        for f in fs.list_names(spark, fs.join(base, "pq"))
        if f.endswith(".parquet")
    ][0]
    n = fs.parquet_row_count(spark, fs.join(base, "pq", name))
    assert n == region.count()
    assert fs.delete(spark, fs.join(base, "m"), recursive=True)


def test_export_concurrent_equals_sequential(spark, tmp_path):
    """The driver thread pool must not change WHAT is exported — file
    sets (names carry row ranges) and manifest listings are identical
    between max_concurrency=1 (reference-sequential) and the default
    concurrent submission."""
    dfs = fixture_dataframes(spark, 40)
    seq = export_lake(
        spark,
        lambda s, spec: dfs[spec.name],
        str(tmp_path / "seq"),
        max_concurrency=1,
    )
    par = export_lake(
        spark,
        lambda s, spec: dfs[spec.name],
        str(tmp_path / "par"),
        max_concurrency=4,
    )
    assert set(seq) == set(par)
    for name in seq:
        assert sorted(seq[name]) == sorted(par[name]), name
    m_seq = json.load(open(tmp_path / "seq" / "manifest.json"))
    m_par = json.load(open(tmp_path / "par" / "manifest.json"))
    assert m_seq["files"] == m_par["files"]


def test_live_jdbc_partitioned_roundtrip(spark, tmp_path):
    """LIVE JDBC evidence (no Postgres in this sandbox, but Spark
    ships embedded Derby): write a table over JDBC, read it back with
    the exact partitioned-read option shape JdbcSource emits
    (partitionColumn/bounds/numPartitions/fetchsize) and verify rows
    and parallelism. This proves the engine's JDBC machinery end to
    end; the Postgres dialect specifics (::text jsonb pushdown,
    driver class) remain covered by the option-construction test."""
    url = f"jdbc:derby:{tmp_path}/testdb;create=true"
    props = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}
    src = spark.range(500).selectExpr(
        "id AS k", "cast(id * 2 as double) AS v", "concat('r', id) AS name"
    )
    src.write.jdbc(url, "roundtrip", mode="overwrite", properties=props)
    back = spark.read.jdbc(
        url,
        "roundtrip",
        column="k",
        lowerBound=0,
        upperBound=500,
        numPartitions=4,
        properties={**props, "fetchsize": "100"},
    )
    assert back.rdd.getNumPartitions() == 4  # one cursor per partition
    got = {(r.k, r.v, r.name) for r in back.collect()}
    want = {(r.k, r.v, r.name) for r in src.collect()}
    assert got == want

    # and OUR source class end-to-end on the same live database: the
    # partitioned read() path (bounds discovery subquery + range
    # partitioning) with the driver/partition-column overrides.
    from parquet_export_spark.sources.jdbc import JdbcSource
    from parquet_export_spark.tables import TableSpec

    jsrc = JdbcSource(
        url=url,
        user="app",
        password="app",
        schema="APP",
        num_partitions=4,
        driver="org.apache.derby.iapi.jdbc.AutoloadedDriver",
        partition_column="k",
    )
    # Stored-name case rules: Spark's JDBC writer leaves the TABLE
    # name unquoted (Derby uppercases it) but quotes COLUMN names
    # (case preserved) — the spec uses the names as stored.
    spec = TableSpec(
        name="ROUNDTRIP",
        datatypes={"k": "Int64", "v": "float64", "name": "string"},
        rows_per_file=1000,
    )
    live = jsrc.read(spark, spec)
    assert live.rdd.getNumPartitions() == 4
    assert {tuple(r) for r in live.collect()} == {tuple(r) for r in src.collect()}


def test_live_jdbc_to_lake_export(spark, tmp_path):
    """The reference's whole production flow, LIVE: a JDBC database
    (embedded Derby) -> JdbcSource partitioned read -> export_lake
    (declared schema, size-bounded zstd parquet, row-range names,
    committed-files manifest). Also pins JDBC filter pushdown for the
    incremental-export path: the updated_at predicate must reach the
    JDBC scan, not filter in Spark."""
    from parquet_export_spark.sources.jdbc import JdbcSource
    from parquet_export_spark.tables import TableSpec

    url = f"jdbc:derby:{tmp_path}/lakedb;create=true"
    props = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}
    src_df = spark.range(60).selectExpr(
        "id AS k",
        "concat('name', id) AS name",
        "timestamp_ntz'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id) AS updated_at",
    )
    src_df.write.jdbc(url, "items", mode="overwrite", properties=props)
    jsrc = JdbcSource(
        url=url,
        user="app",
        password="app",
        schema="APP",
        num_partitions=3,
        driver="org.apache.derby.iapi.jdbc.AutoloadedDriver",
        partition_column="k",
    )
    spec = TableSpec(
        name="ITEMS",
        datatypes={
            "k": "Int64",
            "name": "string",
            "updated_at": "datetime64[ns]",
        },
        rows_per_file=25,
    )
    out = str(tmp_path / "lake")
    files = export_lake(
        spark,
        lambda s, sp: jsrc.read(s, sp),
        out,
        tables={"ITEMS": spec},
    )
    assert files["ITEMS"]
    assert all(
        n.startswith("ITEMS_") and n.endswith("_zstd.parquet")
        for n in files["ITEMS"]
    )
    back = spark.read.parquet(os.path.join(out, "ITEMS"))
    assert back.count() == 60
    manifest = json.load(open(os.path.join(out, "manifest.json")))
    assert manifest["files"]["ITEMS"] == [f"ITEMS/{n}" for n in files["ITEMS"]]

    # incremental export: the watermark predicate pushes INTO the JDBC
    # scan (PushedFilters on the JDBCRelation), so a delta run reads
    # the delta, not the table
    from parquet_export_spark.streaming.incremental import incremental_export

    delta = incremental_export(
        jsrc.read(spark, spec), "2024-01-01 00:00:30", updated_col="updated_at"
    )
    assert delta.count() == 29  # ids 31..59
    plan = delta._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "updated_at" in plan.split("PushedFilters", 1)[1][:200]


def test_zero_row_export_roundtrips(spark, tmp_path):
    """An empty source table must export to ONE schema-bearing empty
    parquet (named with the 0_0 range) that the manifest reader can
    load back — not an empty file list that breaks every reader."""
    from parquet_export_spark.export.manifest import write_manifest
    from parquet_export_spark.export.writer import write_table
    from parquet_export_spark.sources.lake import load_manifest_table
    from parquet_export_spark.tables import TableSpec

    df = spark.createDataFrame([], "id long, name string")
    out = str(tmp_path / "lake")
    spec = TableSpec(name="emptytbl", datatypes={}, rows_per_file=100)
    files = write_table(df, out, spec)
    assert files == ["emptytbl_0_0_zstd.parquet"]
    write_manifest(out, {"emptytbl": files})
    back = load_manifest_table(spark, out, "emptytbl")
    assert back.count() == 0
    assert back.schema.fieldNames() == ["id", "name"]
