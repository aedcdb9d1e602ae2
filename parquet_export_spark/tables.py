"""Declared table specs and the dtype -> Spark type factory.

Re-expresses the data model of the reference's ``config.py`` (the seven
Verifier Alliance tables, reference config.py:4-122) and its schema
factory (reference main.py:133-153) on Spark types.

Design notes (SURVEY.md §1.3):
- Schemas are declared, never inferred; an unknown dtype string raises
  ``ValueError`` — fail-fast parity with reference main.py:149-150.
- ``'object'`` means PG bytea -> BinaryType.
- ``'datetime64[ns]'`` -> TimestampNTZType (wall-clock UTC, no zone;
  µs precision — the ns->µs truncation vs the reference's
  ``pa.timestamp('ns')`` is a documented divergence, SURVEY.md §7.4).
- ``'json'`` -> StringType holding canonical JSON text.
- ``rows_per_file`` = chunk_size × num_chunks_per_file in the reference
  (main.py:189-190); here it is declared directly per table.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

#: dtype-string -> Spark type. Mirrors the match in reference
#: main.py:133-150 including the latent 'UInt16' case (main.py:130),
#: which we support properly instead of leaving dead.
_DTYPE_TO_SPARK: dict[str, T.DataType] = {
    "string": T.StringType(),
    "object": T.BinaryType(),  # PG bytea (hashes, bytecode, addresses)
    "bytes": T.BinaryType(),  # reference's dead memoryview branch (main.py:123-124)
    "Int64": T.LongType(),
    "Int32": T.IntegerType(),
    "UInt16": T.IntegerType(),  # no unsigned 16-bit in Spark; widen
    "bool": T.BooleanType(),
    "datetime64[ns]": T.TimestampNTZType(),
    "json": T.StringType(),  # canonical JSON text (reference main.py:125-127)
}


def spark_type(dtype: str) -> T.DataType:
    """dtype string -> Spark type; unknown -> ValueError.

    Fail-fast parity with reference main.py:149-150.
    """
    try:
        return _DTYPE_TO_SPARK[dtype]
    except KeyError:
        raise ValueError(f"Type not supported: {dtype!r}") from None


def spark_schema(datatypes: dict[str, str]) -> T.StructType:
    """Ordered column->dtype map -> StructType.

    Counterpart of reference ``get_pyarrow_schema`` (main.py:152-153).
    All columns nullable, matching the reference's Arrow schemas.
    """
    return T.StructType(
        [T.StructField(col, spark_type(dt), nullable=True) for col, dt in datatypes.items()]
    )


@dataclass(frozen=True)
class TableSpec:
    """One exported table: name, declared dtypes, output sizing.

    ``rows_per_file`` bounds output file size (reference
    main.py:189-190); ``json_columns``/``timestamp_columns`` drive
    normalization (reference main.py:117-127).
    """

    name: str
    datatypes: dict[str, str]
    rows_per_file: int
    compression: str = "zstd"  # reference *intent* (main.py:24); the
    # reference's per-table lookup was inert (SURVEY.md §2A.11) — here
    # it is a real default.

    @property
    def schema(self) -> T.StructType:
        return spark_schema(self.datatypes)

    @property
    def columns(self) -> list[str]:
        return list(self.datatypes)

    @property
    def json_columns(self) -> list[str]:
        return [c for c, dt in self.datatypes.items() if dt == "json"]

    @property
    def timestamp_columns(self) -> list[str]:
        return [c for c, dt in self.datatypes.items() if dt == "datetime64[ns]"]

    @property
    def binary_columns(self) -> list[str]:
        return [c for c, dt in self.datatypes.items() if dt in ("object", "bytes")]


def _ts_audit() -> dict[str, str]:
    return {
        "created_at": "datetime64[ns]",
        "updated_at": "datetime64[ns]",
        "created_by": "string",
        "updated_by": "string",
    }


#: The seven Verifier Alliance tables (reference config.py:4-122).
#: rows_per_file values are chunk_size × num_chunks_per_file from the
#: reference (SURVEY.md §6 / BASELINE.md).
TABLES: dict[str, TableSpec] = {
    spec.name: spec
    for spec in [
        TableSpec(
            name="code",
            datatypes={
                "code_hash": "object",
                "code": "object",
                "code_hash_keccak": "object",
                **_ts_audit(),
            },
            rows_per_file=100_000,
        ),
        TableSpec(
            name="contracts",
            datatypes={
                "id": "string",
                "creation_code_hash": "object",
                "runtime_code_hash": "object",
                **_ts_audit(),
            },
            rows_per_file=1_000_000,
        ),
        TableSpec(
            name="contract_deployments",
            datatypes={
                "id": "string",
                "chain_id": "Int64",
                "address": "object",
                "transaction_hash": "object",
                "block_number": "Int64",
                "transaction_index": "Int32",
                "deployer": "object",
                "contract_id": "string",
                **_ts_audit(),
            },
            rows_per_file=1_000_000,
        ),
        TableSpec(
            name="compiled_contracts",
            datatypes={
                "id": "string",
                **_ts_audit(),
                "compiler": "string",
                "version": "string",
                "language": "string",
                "name": "string",
                "fully_qualified_name": "string",
                "compiler_settings": "json",
                "compilation_artifacts": "json",
                "creation_code_hash": "object",
                "creation_code_artifacts": "json",
                "runtime_code_hash": "object",
                "runtime_code_artifacts": "json",
            },
            rows_per_file=10_000,  # wide JSON rows -> small files
        ),
        TableSpec(
            name="compiled_contracts_sources",
            datatypes={
                "id": "string",
                "compilation_id": "string",
                "source_hash": "object",
                "path": "string",
            },
            rows_per_file=1_000_000,
        ),
        TableSpec(
            name="sources",
            datatypes={
                "source_hash": "object",
                "source_hash_keccak": "object",
                "content": "string",
                **_ts_audit(),
            },
            rows_per_file=10_000,  # full source text -> small files
        ),
        TableSpec(
            name="verified_contracts",
            datatypes={
                "id": "Int64",
                **_ts_audit(),
                "deployment_id": "string",
                "compilation_id": "string",
                "creation_match": "bool",
                "creation_values": "json",
                "creation_transformations": "json",
                "runtime_match": "bool",
                "runtime_values": "json",
                "runtime_transformations": "json",
                "runtime_metadata_match": "bool",
                "creation_metadata_match": "bool",
            },
            rows_per_file=1_000_000,
        ),
    ]
}
