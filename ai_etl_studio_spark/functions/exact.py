"""Deterministic, cross-engine-exact money/metric arithmetic.

Problem 1: ``SUM(double)`` depends on accumulation order — not
reproducible across engines, AQE re-plans, or even retries at 100 TB.

Problem 2 (subtler): ``CAST(decimal AS DOUBLE)`` is *not* identical
across engines once the scaled significand exceeds 2^53 — DuckDB converts
int128 -> double and multiplies by 10^-scale (two roundings) while Spark's
BigDecimal cast is correctly rounded once. Observed live: a scale-8
decimal sum of 60k lineitem rows differed in the last ulp.

Solution — integer cents end to end:

    per row:   cents = CAST(round(x * 100, 0) AS BIGINT)
    aggregate: SUM(cents)                      -- exact int64, order-free
    surface:   CAST(SUM(cents) AS DOUBLE)/100  -- identical IEEE ops

Why the per-row step is bit-identical in both engines: the double
multiply chain is evaluated in the same order (IEEE ops on identical
inputs), and round(double, 0) can only disagree at an exact ``y.5`` —
which IS representable, and both engines round it up (HALF_UP ==
half-away-from-zero for positives). Int64 headroom: ~9.2e18 cents.

Every helper has a DuckDB-SQL twin so oracle strings embed the exact
same arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 100  # cents


def _col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def cents(col: Column | str) -> Column:
    """Per-row integer cents of a double column/expression."""
    return F.round(_col(col) * SCALE, 0).cast("bigint")


def net_cents(price: str = "l_extendedprice", discount: str = "l_discount") -> Column:
    """Cents of ``price * (1 - discount)`` — evaluation order fixed as
    ``(price * (1 - discount)) * 100`` to mirror the SQL twin exactly."""
    return F.round(_col(price) * (1 - _col(discount)) * SCALE, 0).cast("bigint")


def dsum(col: Column | str) -> Column:
    """Order-insensitive exact sum surfaced as a double (2dp)."""
    return F.sum(cents(col)).cast("double") / SCALE


def csum(cents_col: Column) -> Column:
    """Exact sum of a prepared cents column, surfaced as double."""
    return F.sum(cents_col).cast("double") / SCALE


def davg(col: Column | str) -> Column:
    """Exact average: (cents-sum as double / 100) / count — both
    divisions in IEEE double, left-assoc, mirrored in the twin."""
    return F.sum(cents(col)).cast("double") / SCALE / F.count(F.lit(1))


# --------------------------- DuckDB-SQL twins ---------------------------

#: per-row cents of an expression
def sql_cents(expr: str) -> str:
    return f"CAST(round(({expr}) * 100, 0) AS BIGINT)"


#: cents of lineitem net price, matching net_cents() evaluation order
SQL_NET_CENTS = "CAST(round(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)"


def sql_dsum(expr: str) -> str:
    return f"CAST(SUM({sql_cents(expr)}) AS DOUBLE) / 100"


def sql_csum(cents_expr: str) -> str:
    return f"CAST(SUM({cents_expr}) AS DOUBLE) / 100"


def sql_davg(expr: str) -> str:
    return f"CAST(SUM({sql_cents(expr)}) AS DOUBLE) / 100 / COUNT(*)"
