"""External-warehouse DDL dialects + JDBC DDL execution.

Reference parity: agent-schema/app.py:204-218 emits warehouse-native DDL
when evolving an external database — ``CREATE SCHEMA`` + qualified
``CREATE TABLE`` for Postgres, ``CREATE DATABASE`` + ``USE`` for MySQL —
while the Spark-catalog path (schema/evolve.py) covers the lakehouse
target. This module renders the SAME additive EvolutionPlan decisions
into those dialects and executes them over a plain JDBC connection
(Spark's DataFrame JDBC writer cannot run arbitrary DDL; the JVM's
``java.sql.DriverManager`` can, via the py4j gateway — driver-side
metadata work only, nothing touches executors).

Supported dialects: ``postgres``, ``mysql``, ``derby`` (Derby ships with
Spark, giving the test suite a real embedded server to execute against —
the same role it plays for the JDBC sink tests).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from .infer import sanitize_identifier

_DIALECTS = ("postgres", "mysql", "derby")

# Spark SQL type -> warehouse column type, per dialect. Only types the
# 5-type inference vocabulary (schema/infer.py) plus common extras can
# produce; anything else falls back to the dialect's text type.
_TYPE_MAP: dict[str, dict[str, str]] = {
    "postgres": {
        "string": "TEXT",
        "bigint": "BIGINT",
        "int": "INTEGER",
        "double": "DOUBLE PRECISION",
        "float": "REAL",
        "boolean": "BOOLEAN",
        "date": "DATE",
        "timestamp": "TIMESTAMP",
        "timestamp_ntz": "TIMESTAMP",
        "binary": "BYTEA",
    },
    "mysql": {
        "string": "TEXT",
        "bigint": "BIGINT",
        "int": "INT",
        "double": "DOUBLE",
        "float": "FLOAT",
        "boolean": "TINYINT(1)",
        "date": "DATE",
        "timestamp": "DATETIME(6)",
        "timestamp_ntz": "DATETIME(6)",
        "binary": "BLOB",
    },
    "derby": {
        "string": "VARCHAR(4000)",
        "bigint": "BIGINT",
        "int": "INTEGER",
        "double": "DOUBLE",
        "float": "REAL",
        "boolean": "BOOLEAN",
        "date": "DATE",
        "timestamp": "TIMESTAMP",
        "timestamp_ntz": "TIMESTAMP",
        "binary": "BLOB",
    },
}


def sql_type(dt: T.DataType, dialect: str) -> str:
    """Map a Spark type to the dialect's column type (decimal handled
    structurally; unknowns land on the text type)."""
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    table = _TYPE_MAP[dialect]
    return table.get(dt.simpleString(), table["string"])


def warehouse_ddl(
    inferred: T.StructType,
    table: str,
    zone: str,
    dialect: str,
    existing: dict[str, str] | None = None,
) -> list[str]:
    """Render the additive evolution decision as warehouse-native DDL.

    Same policy as the Spark-catalog path (additive-only, sanitized,
    case-insensitive diff); only the surface syntax differs per dialect:

    * postgres: ``CREATE SCHEMA IF NOT EXISTS zone`` + ``zone.table``
      qualification (app.py:213-218 shape).
    * mysql: ``CREATE DATABASE IF NOT EXISTS zone`` + ``USE zone`` +
      unqualified table (app.py:206-212 shape).
    * derby: ``CREATE SCHEMA zone`` + qualification (no IF NOT EXISTS in
      Derby — callers tolerate the already-exists SQLSTATE, see
      ``run_jdbc_ddl``).

    ``existing`` is the ``{lower_name: type}`` map of current columns
    (empty/None => create). Returns the statement list, nothing executed.
    """
    if dialect not in _DIALECTS:
        raise ValueError(f"unknown dialect {dialect!r}; expected one of {_DIALECTS}")
    zone = sanitize_identifier(zone).lower()
    table = sanitize_identifier(table).lower()
    qualified = table if dialect == "mysql" else f"{zone}.{table}"

    stmts: list[str] = []
    if dialect == "postgres":
        stmts.append(f"CREATE SCHEMA IF NOT EXISTS {zone}")
    elif dialect == "mysql":
        stmts.append(f"CREATE DATABASE IF NOT EXISTS {zone}")
        stmts.append(f"USE {zone}")
    else:  # derby
        stmts.append(f"CREATE SCHEMA {zone}")

    def col_ddl(fields) -> str:
        return ", ".join(
            f"{sanitize_identifier(f.name).lower()} {sql_type(f.dataType, dialect)}"
            for f in fields
        )

    if not existing:
        suffix = "" if dialect == "derby" else " IF NOT EXISTS"
        stmts.append(f"CREATE TABLE{suffix} {qualified} ({col_ddl(inferred.fields)})")
        return stmts

    have = {name.lower() for name in existing}
    missing = [f for f in inferred.fields if f.name.lower() not in have]
    if missing:
        if dialect == "mysql":
            adds = ", ".join(f"ADD COLUMN {c}" for c in
                             (col_ddl([f]) for f in missing))
            stmts.append(f"ALTER TABLE {qualified} {adds}")
        else:
            # postgres/derby: one ADD COLUMN per statement (portable)
            for f in missing:
                stmts.append(f"ALTER TABLE {qualified} ADD COLUMN {col_ddl([f])}")
    return stmts


# SQLSTATEs meaning "object already exists" — additive evolution treats
# these as success for dialects lacking IF NOT EXISTS (Derby: X0Y32 for
# schema/table, X0Y68 schema).
_EXISTS_STATES = {"X0Y32", "X0Y68", "42P06", "42P07"}


def run_jdbc_ddl(
    spark: SparkSession,
    url: str,
    statements: list[str],
    driver: str | None = None,
    tolerate_exists: bool = True,
) -> int:
    """Execute DDL over a plain JDBC connection via the JVM gateway
    (java.sql.DriverManager). Driver-side only. Returns statements run;
    already-exists errors count as run when ``tolerate_exists``."""
    jvm = spark._jvm
    if driver:
        jvm.java.lang.Class.forName(driver)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    n = 0
    try:
        stmt = conn.createStatement()
        for s in statements:
            s = s.strip()
            if not s:
                continue
            try:
                stmt.execute(s)
                n += 1
            except Exception as ex:  # py4j wraps SQLException
                state = _sql_state(ex)
                if tolerate_exists and state in _EXISTS_STATES:
                    n += 1
                    continue
                raise
        stmt.close()
    finally:
        conn.close()
    return n


def _sql_state(ex: Exception) -> str | None:
    j = getattr(ex, "java_exception", None)
    while j is not None:
        try:
            state = j.getSQLState()
            if state:
                return state
        except Exception:
            pass
        j = j.getCause() if hasattr(j, "getCause") else None
    return None


def jdbc_existing_columns(
    spark: SparkSession, url: str, table: str, zone: str | None = None,
    driver: str | None = None,
) -> dict[str, str]:
    """D2 for an external warehouse: ``{lower_name: type_name}`` via JDBC
    DatabaseMetaData (the dialect-portable equivalent of the reference's
    information_schema read, app.py:61-73).

    With ``zone=None`` the connection's current schema is resolved and
    used — a null schema pattern in ``getColumns`` would match same-named
    tables in EVERY schema and merge their columns, making additive
    evolution skip columns that only exist in an unrelated table."""
    jvm = spark._jvm
    if driver:
        jvm.java.lang.Class.forName(driver)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        if zone is None:
            try:
                zone = conn.getSchema()  # JDBC 4.1; None if driver can't say
            except Exception:
                zone = None
        md = conn.getMetaData()
        out: dict[str, str] = {}
        # JDBC metadata stores unquoted identifiers per-db case (Derby:
        # upper); probe both cases like a case-insensitive resolver.
        for tbl in {table, table.upper(), table.lower()}:
            for sch in {zone, zone.upper() if zone else None,
                        zone.lower() if zone else None}:
                rs = md.getColumns(None, sch, tbl, None)
                while rs.next():
                    out[rs.getString("COLUMN_NAME").lower()] = rs.getString(
                        "TYPE_NAME"
                    )
                rs.close()
            if out:
                break
        return out
    finally:
        conn.close()
