"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query at sf0.001 (smoke).
``queries()`` — every implemented operator (SURVEY.md §2 + extensions),
one callable (spark, sf_dir) -> DataFrame each.
``oracle_sql()`` — DuckDB-runnable ANSI-SQL twins for the hash-match gate
(operators without an entry here are rows-only checked: Spark-side LSH
hyperplanes and the Pandas-UDF media decode, which are intentionally not
re-expressed in SQL).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query ('top 10 products by sales', the reference's own
    canonical example app.py:281) on /root/testdata/sf0.001."""
    from ai_etl_studio_spark.session import configure_existing
    from ai_etl_studio_spark.operators import load_all

    configure_existing(spark)
    queries_map, _ = load_all()
    return queries_map["top_products"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ai_etl_studio_spark.operators import load_all

    q, _ = load_all()
    return dict(q)


def oracle_sql() -> dict[str, str]:
    from ai_etl_studio_spark.operators import load_all

    _, o = load_all()
    return dict(o)
