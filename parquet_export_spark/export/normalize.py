"""Schema enforcement and semantic normalization (SURVEY.md §1.4).

Spark-first re-expression of the reference's ``process_df``
(reference main.py:116-131):

- declared-schema cast per column (reference main.py:128-130) — here a
  single ``select`` of JVM-side casts, fully codegen'd;
- timestamp normalization to wall-clock UTC without zone (reference
  main.py:117-119) — tz-aware inputs are converted to UTC then the
  zone is dropped (TimestampNTZ);
- JSON canonicalization (reference main.py:125-127) — optional
  re-serialization so semantic JSON (lowercase ``true``/``null``)
  is guaranteed; vectorized Arrow batches, not per-row Python.

Unknown dtype strings raise ``ValueError`` before any job runs
(fail-fast parity with reference main.py:149-150).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from parquet_export_spark.tables import TableSpec, spark_type


def enforce_schema(df: DataFrame, spec: TableSpec) -> DataFrame:
    """Cast every declared column to its declared type, in declared order.

    Missing columns fail analysis (declared schema is authoritative);
    extra columns are dropped (the reference reads ``SELECT *`` from a
    schema-matching table so the cases coincide there).
    """
    if not spec.datatypes:
        # bare spec (write-tuning only, e.g. bench/maintenance paths):
        # the frame is already typed; nothing to enforce
        return df
    cols = []
    for name, dtype in spec.datatypes.items():
        target = spark_type(dtype)  # ValueError on unknown dtype
        cols.append(normalize_timestamp(F.col(name), df, name, target).alias(name))
    return df.select(cols)


def normalize_timestamp(col, df: DataFrame, name: str, target: T.DataType):
    """tz-aware -> wall-clock UTC NTZ; everything else is a plain cast.

    A TimestampType column holds an instant; rendering it as NTZ uses
    the session zone, so we pin the conversion to UTC explicitly with
    ``to_utc_timestamp`` semantics (reference main.py:117-119).
    """
    if isinstance(target, T.TimestampNTZType):
        source = next((f.dataType for f in df.schema.fields if f.name == name), None)
        if isinstance(source, T.TimestampType):
            # convert_timezone(target_tz=UTC) is session-tz-independent.
            return F.expr(f"convert_timezone('UTC', `{name}`)")
    return col.cast(target)


@pandas_udf(T.StringType())
def canonicalize_json(s: pd.Series) -> pd.Series:
    """Re-serialize JSON text canonically (semantic, not byte, fidelity).

    Arrow-vectorized; None stays None; invalid JSON raises (fail fast,
    matching the reference's json.dumps behavior at main.py:125-127).
    """
    return s.map(lambda v: None if v is None else json.dumps(json.loads(v), separators=(",", ":")))


def normalize_json_columns(df: DataFrame, spec: TableSpec, canonical: bool = False) -> DataFrame:
    """Optionally rewrite JSON columns through canonical serialization.

    Default off: when the source already provides JSON text (parquet
    lake, or ``::text`` pushed into the JDBC subquery — see
    sources/jdbc.py) the text is kept verbatim, which is a stronger
    guarantee than the reference's parse/re-serialize round-trip.
    """
    if not canonical:
        return df
    for c in spec.json_columns:
        df = df.withColumn(c, canonicalize_json(F.col(c)))
    return df
