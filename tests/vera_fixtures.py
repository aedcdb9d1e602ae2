"""Deterministic VerA-shaped fixture data (FIXTURES.md §2).

Small synthetic rows for the seven reference tables, for export-parity
golden tests (SURVEY.md §5.3.2). Built driver-side as Python rows —
fixture scale only.
"""

from __future__ import annotations

import hashlib
import json
import uuid
from datetime import datetime, timezone

from parquet_export_spark.tables import TABLES


def _h(seed: str, n: int = 32) -> bytes:
    out = b""
    i = 0
    while len(out) < n:
        out += hashlib.sha256(f"{seed}:{i}".encode()).digest()
        i += 1
    return out[:n]


def _uuid(seed: str) -> str:
    return str(uuid.UUID(bytes=_h(seed, 16)))


def _ts(i: int) -> datetime:
    # tz-aware on purpose: exercises the UTC-NTZ normalization path.
    return datetime(2024, 1, 1 + (i % 27), (i * 7) % 24, (i * 13) % 60, tzinfo=timezone.utc)


def make_fixture_rows(n: int = 50) -> dict[str, list[dict]]:
    code = [
        {
            "code_hash": _h(f"code{i}"),
            "code": _h(f"bytecode{i}", 64 + (i % 100)) if i % 10 else None,
            "code_hash_keccak": _h(f"keccak{i}"),
            "created_at": _ts(i),
            "updated_at": _ts(i + 1),
            "created_by": "sourcify" if i % 2 else "blockscout",
            "updated_by": None if i % 20 == 0 else "sourcify",
        }
        for i in range(n)
    ]
    contracts = [
        {
            "id": _uuid(f"contract{i}"),
            "creation_code_hash": _h(f"code{i % n}"),
            "runtime_code_hash": _h(f"code{(i + 1) % n}"),
            "created_at": _ts(i),
            "updated_at": _ts(i),
            "created_by": "sourcify",
            "updated_by": "sourcify",
        }
        for i in range(n)
    ]
    deployments = [
        {
            "id": _uuid(f"deploy{i}"),
            "chain_id": [1, 10, 56, 137, 8453, 42161][i % 6],
            "address": _h(f"addr{i}", 20),
            "transaction_hash": _h(f"tx{i}"),
            "block_number": i * 1000,
            "transaction_index": i % 500,
            "deployer": _h(f"deployer{i % 5}", 20),
            "contract_id": _uuid(f"contract{i % n}"),
            "created_at": _ts(i),
            "updated_at": _ts(i),
            "created_by": "sourcify",
            "updated_by": "sourcify",
        }
        for i in range(n)
    ]
    compiled = [
        {
            "id": _uuid(f"comp{i}"),
            "created_at": _ts(i),
            "updated_at": _ts(i),
            "created_by": "sourcify",
            "updated_by": "sourcify",
            "compiler": "solc" if i % 3 else "vyper",
            "version": f"0.8.{i % 25}+commit.{i:08x}",
            "language": ["solidity", "vyper", "yul"][i % 3],
            "name": f"Contract{i}",
            "fully_qualified_name": f"contracts/C{i}.sol:Contract{i}",
            # Mixed spacing/bool/null: canonicalization must preserve
            # JSON semantics, not bytes (SURVEY.md §1.4.3).
            "compiler_settings": json.dumps({"optimizer": {"enabled": i % 2 == 0, "runs": 200}}),
            "compilation_artifacts": json.dumps({"abi": [], "sources": None}) if i % 7 else None,
            "creation_code_hash": _h(f"code{i % n}"),
            "creation_code_artifacts": json.dumps({"sourceMap": f"{i}:0:0"}),
            "runtime_code_hash": _h(f"code{(i + 1) % n}"),
            "runtime_code_artifacts": json.dumps({"immutableReferences": {}}),
        }
        for i in range(n)
    ]
    ccs = [
        {
            "id": _uuid(f"ccs{i}"),
            "compilation_id": _uuid(f"comp{i % n}"),
            "source_hash": _h(f"source{i % (n // 2)}"),
            "path": f"contracts/C{i}.sol",
        }
        for i in range(n)
    ]
    sources = [
        {
            "source_hash": _h(f"source{i}"),
            "source_hash_keccak": _h(f"skeccak{i}"),
            "content": f"// SPDX-License-Identifier: MIT\ncontract C{i} {{ uint x = {i}; }}",
            "created_at": _ts(i),
            "updated_at": _ts(i),
            "created_by": "sourcify",
            "updated_by": "sourcify",
        }
        for i in range(n // 2)
    ]
    verified = [
        {
            "id": i + 1,
            "created_at": _ts(i),
            "updated_at": _ts(i),
            "created_by": "sourcify",
            "updated_by": "sourcify",
            "deployment_id": _uuid(f"deploy{i}"),
            "compilation_id": _uuid(f"comp{i}"),
            "creation_match": i % 2 == 0,
            "creation_values": json.dumps({"constructorArguments": f"0x{i:04x}"}),
            "creation_transformations": json.dumps([{"type": "insert", "offset": i}]),
            "runtime_match": i % 3 == 0,
            "runtime_values": json.dumps({"libraries": {}}) if i % 5 else None,
            "runtime_transformations": json.dumps([]),
            "runtime_metadata_match": i % 2 == 1,
            "creation_metadata_match": i % 4 == 0,
        }
        for i in range(n)
    ]
    return {
        "code": code,
        "contracts": contracts,
        "contract_deployments": deployments,
        "compiled_contracts": compiled,
        "compiled_contracts_sources": ccs,
        "sources": sources,
        "verified_contracts": verified,
    }


def fixture_dataframes(spark, n: int = 50):
    """Materialize fixtures as DataFrames with *pre-normalization* types
    (tz-aware timestamps) so the export pipeline has real work to do."""
    from pyspark.sql import types as T

    rows = make_fixture_rows(n)
    out = {}
    for name, data in rows.items():
        spec = TABLES[name]
        fields = []
        for col, dt in spec.datatypes.items():
            if dt == "datetime64[ns]":
                fields.append(T.StructField(col, T.TimestampType()))  # tz-aware input
            elif dt in ("object", "bytes"):
                fields.append(T.StructField(col, T.BinaryType()))
            elif dt == "Int64":
                fields.append(T.StructField(col, T.LongType()))
            elif dt == "Int32":
                fields.append(T.StructField(col, T.IntegerType()))
            elif dt == "bool":
                fields.append(T.StructField(col, T.BooleanType()))
            else:
                fields.append(T.StructField(col, T.StringType()))
        schema = T.StructType(fields)
        out[name] = spark.createDataFrame(
            [tuple(r[c] for c in spec.columns) for r in data], schema
        )
    return out
