"""The t2 gate, pre-run locally: every registered query with an oracle is
hash-equivalent to DuckDB at sf0.001 (the driver repeats this at sf0.01).
One parametrized test per operator so failures name the operator."""

from __future__ import annotations

import pytest

from ai_etl_studio_spark.operators import load_all
from tests.conftest import assert_matches_oracle

QUERIES, ORACLES = load_all()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, ddb, name):
    assert_matches_oracle(spark, ddb, name, QUERIES[name], ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    """Operators without an oracle must still run and be deterministic
    across two invocations (the driver's weaker rows-only check)."""
    from tests.conftest import assert_plan_contract

    df1 = QUERIES[name](spark, "/root/testdata/sf0.001")
    assert_plan_contract(name, df1)
    rows1 = sorted(map(str, df1.collect()))
    df2 = QUERIES[name](spark, "/root/testdata/sf0.001")
    rows2 = sorted(map(str, df2.collect()))
    assert rows1 == rows2
    assert len(rows1) >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) == 10
    assert df.columns == ["p_name", "revenue"]
