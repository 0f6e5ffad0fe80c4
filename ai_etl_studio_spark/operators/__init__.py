"""Operator registry: every named query + its DuckDB oracle SQL.

Importing the submodules populates ``QUERIES`` / ``ORACLES``, which
``__spark_entry__.py`` re-exports to the verify driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is the DuckDB-runnable ANSI-SQL
    twin (omit only for genuinely non-SQL-expressible operators — the
    driver then records a weaker rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        import functools

        @functools.wraps(fn)
        def wrapped(
            spark: SparkSession, sf_dir: str, *args, **kwargs
        ) -> DataFrame:
            # The caller (verify driver, notebook user) may hand us a
            # default-config session; apply the runtime-settable engine
            # defaults (UTC timezone, nanos-as-long parquet reads, AQE)
            # before planning the query. Extra keyword-only knobs (e.g.
            # a composite op handing its member models a shared
            # checkpointed base) pass through untouched.
            from ai_etl_studio_spark.session import configure_existing

            configure_existing(spark)
            return fn(spark, sf_dir, *args, **kwargs)

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return wrapped

    return deco


def load_all() -> tuple[dict[str, QueryFn], dict[str, str]]:
    """Import every operator module (side effect: registration)."""
    from ai_etl_studio_spark.operators import (  # noqa: F401
        analytics,
        arrays,
        audit,
        dedup,
        drift,
        extended,
        insights,
        multimodal,
        quality,
        relational,
        search,
        similarity,
        text,
        training,
    )
    from ai_etl_studio_spark.streaming import windows  # noqa: F401

    return QUERIES, ORACLES
