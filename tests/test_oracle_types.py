"""No-HUGEINT gate over every oracle string.

DuckDB widens integer SUM()/count_if()/integer-division chains to
HUGEINT (int128); Spark tops out at bigint (int64).  The driver's value
hasher compares byte representations, so a value-equal result still
hash-mismatches when the oracle column comes back HUGEINT — the exact
trap that cost round 1 (json_extract, sessionize) and round 2
(pagerank_bipartite, via a *string-generated* CTE the hand sweep
missed).  This test runs every registered oracle through DuckDB's
binder and asserts no output column is HUGEINT/UHUGEINT, catching
hand-written and generated SQL alike — and every future oracle for
free.
"""

from __future__ import annotations

import duckdb
import pytest

from ai_etl_studio_spark.operators import load_all

_, ORACLES = load_all()

FORBIDDEN = {"HUGEINT", "UHUGEINT", "INT128", "UINT128"}


@pytest.fixture(scope="module")
def ddb_types():
    from ai_etl_studio_spark.catalog import TABLES

    con = duckdb.connect()
    sf_dir = "/root/testdata/sf0.001"
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_has_no_hugeint_columns(ddb_types, name):
    rel = ddb_types.sql(ORACLES[name])
    bad = [
        (col, str(typ))
        for col, typ in zip(rel.columns, rel.types)
        if str(typ).upper() in FORBIDDEN
    ]
    assert not bad, (
        f"{name}: oracle returns int128-typed columns {bad}; "
        "wrap the offending aggregate in CAST(... AS BIGINT) so the "
        "driver's value hash can match Spark's int64"
    )
