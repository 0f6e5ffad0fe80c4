"""Property-based cross-engine exactness for the hashing primitives
every dedup/text oracle depends on: md5_hash32 must agree bit-for-bit
between Spark and DuckDB on arbitrary strings, and the MinHash
universal-hash family must stay inside int64 in both engines."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from ai_etl_studio_spark.functions.texthash import (
    MERSENNE31,
    md5_hash32,
    minhash_params,
    sql_md5_hash32,
)

# printable-ish strings incl. unicode, no NULs (parquet/cell-safe)
texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    min_size=0,
    max_size=64,
)


@pytest.fixture(scope="module")
def hash_rig(spark):
    con = duckdb.connect()
    return spark, con


@settings(max_examples=20, deadline=None)
@given(st.lists(texts, min_size=1, max_size=20, unique=True))
def test_md5_hash32_cross_engine_bit_exact(hash_rig, strings):
    spark, con = hash_rig
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = {r.s: r.h for r in df.select("s", md5_hash32("s").alias("h")).collect()}
    for s in strings:
        (want,) = con.execute(f"SELECT {sql_md5_hash32('?')}", [s]).fetchone()
        assert got[s] == want, s


def test_minhash_family_bounds():
    """Every (a, b) keeps a*h + b below int64 max for any 32-bit h, so
    neither engine overflows or promotes to int128 — the invariant the
    oracle generation relies on."""
    params = minhash_params(64)
    h_max = (1 << 32) - 1
    for a, b in params:
        assert 1 <= a <= 1 << 30
        assert 0 <= b < MERSENNE31
        assert a * h_max + b < (1 << 63)
    # deterministic: same seed, same constants
    assert params == minhash_params(64)


def test_minhash_values_in_range(spark):
    """All k signature components land in [0, MERSENNE31)."""
    from ai_etl_studio_spark.operators.dedup import MINHASH_K, dedup_minhash_signatures

    df = dedup_minhash_signatures(spark, "/root/testdata/sf0.001")
    mins = df.select(*[F.min(f"mh_{i}") for i in range(MINHASH_K)]).collect()[0]
    maxs = df.select(*[F.max(f"mh_{i}") for i in range(MINHASH_K)]).collect()[0]
    assert all(v >= 0 for v in mins)
    assert all(v < MERSENNE31 for v in maxs)
