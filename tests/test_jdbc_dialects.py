"""JDBC dialect-variance contract (r5 verdict item 7, the sandbox
version): no network and no second embedded-engine jar ship in this
container (only Derby rides inside Spark's distribution), so live
PostgreSQL/MySQL parity stays environment-bound — but the DIALECT
layer our catalog and read_jdbc path rely on is pure JVM and testable
offline. These pin, per target RDBMS URL, exactly the three behaviors
that differ across engines and would silently corrupt a catalog
round-trip if Spark's dialect resolution drifted or we built SQL by
hand instead of through it:

- identifier quoting (PostgreSQL/Derby double-quote, MySQL backticks
  — a hand-quoted mixed-case column works on one and breaks the other),
- the zero-row DESCRIBE-shape schema probe (``getSchemaQuery`` — what
  our typed-catalog introspection executes remotely),
- the LIMIT clause shape pushed with the A9 LIMIT-injection contract.

The Derby tests in test_jdbc.py prove the options actually execute
against a live (embedded) engine; this module proves the SAME option
shape resolves to the right dialect for the two reference RDBMSes
(db_utils.py:119-153's postgres/mysql branches).
"""

from __future__ import annotations

import pytest

_URLS = {
    "postgresql": "jdbc:postgresql://host:5432/db",
    "mysql": "jdbc:mysql://host:3306/db",
    "derby": "jdbc:derby:memory:db",
}


def _dialect(spark, url):
    return spark._jvm.org.apache.spark.sql.jdbc.JdbcDialects.get(url)


def test_dialect_resolution_covers_reference_engines(spark):
    """Every URL scheme the reference connects to (plus our embedded
    proof engine) must resolve to a dedicated dialect, not the NOOP
    fallback — canCreateTable/quote behavior differs per engine."""
    names = {
        kind: _dialect(spark, url).getClass().getSimpleName()
        for kind, url in _URLS.items()
    }
    assert "Postgres" in names["postgresql"]
    assert "MySQL" in names["mysql"]
    assert "Derby" in names["derby"]


def test_identifier_quoting_differs_by_engine(spark):
    """The dialect variance that bites first: MySQL quotes identifiers
    with backticks, PostgreSQL/Derby with double quotes. Our catalog
    never hand-quotes — it routes through the dialect — and this pins
    why that matters for a mixed-case column."""
    col = "mixedCase"
    assert _dialect(spark, _URLS["postgresql"]).quoteIdentifier(col) == '"mixedCase"'
    assert _dialect(spark, _URLS["derby"]).quoteIdentifier(col) == '"mixedCase"'
    assert _dialect(spark, _URLS["mysql"]).quoteIdentifier(col) == "`mixedCase`"


def test_schema_probe_is_zero_row_describe_shape(spark):
    """Typed-catalog introspection over JDBC executes the dialect's
    schema query — it must be the zero-row WHERE 1=0 probe (never a
    data-bearing SELECT) on every engine, which is what makes remote
    introspection O(1) instead of a table scan."""
    for kind, url in _URLS.items():
        q = _dialect(spark, url).getSchemaQuery("sch.tbl")
        assert "WHERE 1=0" in q, (kind, q)
        assert "sch.tbl" in q


def test_limit_clause_shape_per_engine(spark):
    """The A9 LIMIT-injection contract meets real dialect variance at
    pushdown: PostgreSQL/MySQL take a trailing `LIMIT n`, while Derby
    has NO limit clause at all (SQL-standard FETCH FIRST only) — its
    dialect returns the empty string, meaning Spark does NOT push the
    limit and applies it engine-side instead. Hand-appending LIMIT for
    every engine (what a naive port of the reference's string-built
    SQL would do) breaks on exactly this case."""
    for kind in ("postgresql", "mysql"):
        clause = _dialect(spark, _URLS[kind]).getLimitClause(7)
        assert clause.strip() == "LIMIT 7", (kind, clause)
    assert _dialect(spark, _URLS["derby"]).getLimitClause(7) == ""


def test_partition_option_shape_parses_for_remote_engines(spark):
    """The partitioned-read option shape read_jdbc emits (the only
    JDBC shape that scales past one executor) must be accepted by
    Spark's JDBC source resolution for the remote-engine URLs, not
    just Derby. Proven by building the reader plan: resolution fails
    fast on malformed options BEFORE any connection is attempted —
    a missing driver class is the expected (and asserted) failure,
    malformed options would raise IllegalArgumentException instead."""
    from py4j.protocol import Py4JJavaError

    for kind in ("postgresql", "mysql"):
        reader = (
            spark.read.format("jdbc")
            .option("url", _URLS[kind])
            .option("dbtable", "t")
            .option("user", "u")
            .option("password", "p")
            .option("partitionColumn", "id")
            .option("lowerBound", "0")
            .option("upperBound", "1000")
            .option("numPartitions", "8")
        )
        with pytest.raises(Py4JJavaError) as exc:
            reader.load()
        msg = str(exc.value)
        # driver jar absent in this container — the failure must be the
        # missing-driver class (options parsed fine), never an
        # IllegalArgumentException about the partition options
        assert (
            "ClassNotFoundException" in msg
            or "No suitable driver" in msg
            or "CANNOT_FIND_JDBC_DRIVER" in msg
        ), msg
        assert "IllegalArgumentException" not in msg.split("Caused by")[0]
