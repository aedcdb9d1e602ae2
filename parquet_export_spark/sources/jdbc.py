"""Partitioned JDBC source for PostgreSQL ingest.

Spark-first replacement for the reference's single-threaded
server-side-cursor scan (reference main.py:178-207): one JDBC read per
table, split into ``num_partitions`` parallel range scans on a numeric
partition column where one exists — on a cluster each executor holds
its own cursor, so ingest parallelism scales with the cluster instead
of being pinned to one connection.

Key semantics carried over:
- ``SELECT *`` per table with an explicit column list so jsonb columns
  are pushed down as ``col::text`` — *verbatim* database JSON text, a
  strictly stronger guarantee than the reference's pg8000-parse +
  json.dumps round-trip (reference main.py:125-127; SURVEY.md §1.4.3).
- ``fetchsize`` plays the reference's ``chunk_size`` role
  (reference config.py / main.py:207) for per-partition streaming.
- Debug OFFSET (reference main.py:201-202) is supported but gets an
  ORDER BY on the partition column when one exists — the reference's
  unordered OFFSET was nondeterministic (deliberate fix, SURVEY.md §4.3).

This module only *builds* the read plan; it needs a live database +
JDBC driver jar to execute, so tests cover option construction.

Managed-Postgres (Cloud SQL-style) connectivity (reference
main.py:43-92 builds a socket-factory connector when INSTANCE_NAME is
set): the JDBC equivalent is configuration, not code — add the vendor's
socket-factory jar to ``spark.jars`` and pass its properties through
``url`` query params (e.g. ``?socketFactory=<factory-class>&
cloudSqlInstance=<instance>``), or run the vendor's auth-proxy sidecar
and point ``url`` at localhost. Either way `JdbcSource` is unchanged;
credentials flow through the same url/user/password triple.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from parquet_export_spark.tables import TableSpec

#: Numeric/temporal columns usable for range partitioning, per table.
#: UUID-keyed tables fall back to a hash-of-key modulus predicate set.
PARTITION_COLUMNS: dict[str, str] = {
    "contract_deployments": "block_number",
    "verified_contracts": "id",
}


@dataclass(frozen=True)
class JdbcSource:
    url: str  # jdbc:postgresql://host:port/db (any JDBC url works)
    user: str
    password: str
    schema: str = "public"
    fetchsize: int = 10_000
    num_partitions: int = 16
    #: JDBC driver class; any driver on the Spark classpath. The
    #: Postgres default matches the reference deployment; the live
    #: round-trip test drives the same code against embedded Derby.
    driver: str = "org.postgresql.Driver"
    #: fallback partition column for AD-HOC tables absent from the
    #: PARTITION_COLUMNS registry. The registry wins for known tables
    #: — a source built for one ad-hoc table and then reused across
    #: the VerA set must not range-partition every table on the
    #: ad-hoc column (wrong or missing there).
    partition_column: str | None = None

    def select_list(self, spec: TableSpec) -> str:
        """Explicit column list; jsonb pushed down as text."""
        cols = []
        for name, dtype in spec.datatypes.items():
            cols.append(f'"{name}"::text AS "{name}"' if dtype == "json" else f'"{name}"')
        return ", ".join(cols)

    def _partition_column(self, spec: TableSpec) -> str | None:
        return PARTITION_COLUMNS.get(spec.name) or self.partition_column

    def dbtable(self, spec: TableSpec, offset: int | None = None) -> str:
        """Pushdown subquery used as the JDBC ``dbtable``."""
        sql = f'SELECT {self.select_list(spec)} FROM {self.schema}."{spec.name}"'
        if offset is not None:
            part = self._partition_column(spec)
            order = f' ORDER BY "{part}"' if part else ""
            sql += f"{order} OFFSET {offset}"
        return f"({sql}) AS src"

    def reader_options(self, spec: TableSpec, offset: int | None = None) -> dict[str, str]:
        opts = {
            "url": self.url,
            "user": self.user,
            "password": self.password,
            "driver": self.driver,
            "dbtable": self.dbtable(spec, offset=offset),
            "fetchsize": str(self.fetchsize),
        }
        part = self._partition_column(spec)
        if part and offset is None:
            # Bounds are discovered with one cheap MIN/MAX roundtrip at
            # plan time by read(); declared here as the partition spec.
            opts["partitionColumn"] = part
            opts["numPartitions"] = str(self.num_partitions)
        return opts

    def predicates(self, spec: TableSpec, key: str | None = None) -> list[str] | None:
        """Hash-modulus predicates for UUID-keyed tables (no numeric PK).

        Each predicate becomes one parallel partition scan:
        ``(hashtext(id::text)::bigint & 2147483647) % N = i``. Complete
        and disjoint. The mask (not ``abs``) makes it wrap-safe:
        Postgres ``abs(-2147483648)`` raises integer-out-of-range, so a
        key hashing to INT_MIN would fail its whole partition's scan.
        """
        key = key or next(iter(spec.datatypes))
        n = self.num_partitions
        return [
            f'(hashtext("{key}"::text)::bigint & 2147483647) % {n} = {i}'
            for i in range(n)
        ]

    def read(self, spark: SparkSession, spec: TableSpec, offset: int | None = None) -> DataFrame:
        """Execute the partitioned read (requires live DB + driver jar)."""
        opts = self.reader_options(spec, offset=offset)
        part = opts.pop("partitionColumn", None)
        if part is not None:
            bounds = (
                spark.read.format("jdbc")
                .options(
                    **{k: v for k, v in opts.items() if k != "dbtable"},
                    # aliases quoted so every engine returns them
                    # verbatim (unquoted aliases are case-folded
                    # engine-specifically: lower in Postgres, upper in
                    # Derby-class databases)
                    dbtable=f'(SELECT MIN("{part}") AS "lo", MAX("{part}") AS "hi" '
                    f"FROM {self.schema}.\"{spec.name}\") AS b",
                )
                .load()
                .collect()[0]
            )
            lo = bounds["lo"] if bounds["lo"] is not None else 0
            hi = bounds["hi"] if bounds["hi"] is not None else 1
            return (
                spark.read.format("jdbc")
                .options(**opts)
                .option("partitionColumn", part)
                .option("lowerBound", str(lo))
                .option("upperBound", str(max(hi, lo + 1)))
                .option("numPartitions", str(self.num_partitions))
                .load()
            )
        reader = spark.read.format("jdbc").options(**opts)
        # hashtext() is Postgres-only — on any other engine the
        # hash-modulus predicates would fail every partition's scan
        # with an unknown-function error; fall back to one cursor
        # (correct everywhere, just unparallelized) and leave the
        # parallel path to engines that support it or to tables with
        # a declared numeric partition column.
        is_postgres = self.url.startswith("jdbc:postgresql")
        preds = self.predicates(spec) if is_postgres else None
        if preds and offset is None:
            # jdbc(predicates=...) path for UUID-keyed tables.
            props = {
                "user": opts["user"],
                "password": opts["password"],
                "driver": opts["driver"],
                "fetchsize": opts["fetchsize"],
            }
            return spark.read.jdbc(
                url=opts["url"],
                table=opts["dbtable"],
                predicates=preds,
                properties=props,
            )
        return reader.load()
