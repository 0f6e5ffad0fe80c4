"""Data-quality audit operators (deequ-style constraint suites).

A production ETL engine validates what it moves. These operators compute
a whole constraint suite — completeness, uniqueness, value bounds,
accepted values, referential integrity — as a handful of single-pass
aggregations, emitting one row per constraint in a uniform
(constraint, scope, value, pass) shape a pipeline can gate on.

The reference engine (balyuv/ai-etl-studio) validates only reactively —
a failed query becomes an error relation (app.py error path); this module
is the proactive, driver-directed extension surface.

Scale design:
- every per-table metric group is ONE aggregation over ONE scan of that
  table (Spark computes all the conditional sums in a single
  HashAggregate; no per-constraint passes).
- count(DISTINCT) rides the same shuffle via expand; at 100 TB swap to
  approx_count_distinct per the documented `uniqueness_approx` note.
- referential checks are LEFT ANTI joins that shuffle only the key
  columns; the fact side is projected to its key before the join.
- the final result is a UNION of a dozen 1-row frames — driver-size.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_etl_studio_spark.catalog import load_table
from ai_etl_studio_spark.functions.exact import cents
from ai_etl_studio_spark.operators import register

#: Accepted o_orderstatus values (TPC-H domain).
_STATUS = ("O", "F", "P")

_DQ_ORACLE = f"""
WITH li AS (
  SELECT COUNT(*) AS n,
         COUNT(l_orderkey) AS nn_ok,
         COUNT(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 1 END) AS qty_in,
         COUNT(CASE WHEN l_discount BETWEEN 0 AND 0.1 THEN 1 END) AS disc_in
  FROM lineitem),
o AS (
  SELECT COUNT(*) AS n,
         COUNT(o_custkey) AS nn_ck,
         COUNT(DISTINCT o_orderkey) AS d_ok,
         COUNT(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 END) AS st_in
  FROM orders),
orph_li AS (
  SELECT COUNT(*) AS n FROM lineitem l
  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
orph_o AS (
  SELECT COUNT(*) AS n FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
SELECT * FROM (
  SELECT 'completeness' AS check_name, 'lineitem.l_orderkey' AS scope,
         CAST(nn_ok AS DOUBLE) / n AS value,
         CASE WHEN nn_ok = n THEN 1 ELSE 0 END AS pass FROM li
  UNION ALL
  SELECT 'completeness', 'orders.o_custkey',
         CAST(nn_ck AS DOUBLE) / n, CASE WHEN nn_ck = n THEN 1 ELSE 0 END FROM o
  UNION ALL
  SELECT 'uniqueness', 'orders.o_orderkey',
         CAST(d_ok AS DOUBLE) / n, CASE WHEN d_ok = n THEN 1 ELSE 0 END FROM o
  UNION ALL
  SELECT 'bounds[1,50]', 'lineitem.l_quantity',
         CAST(qty_in AS DOUBLE) / n, CASE WHEN qty_in = n THEN 1 ELSE 0 END FROM li
  UNION ALL
  SELECT 'bounds[0,0.1]', 'lineitem.l_discount',
         CAST(disc_in AS DOUBLE) / n, CASE WHEN disc_in = n THEN 1 ELSE 0 END FROM li
  UNION ALL
  SELECT 'accepted_values(O,F,P)', 'orders.o_orderstatus',
         CAST(st_in AS DOUBLE) / n, CASE WHEN st_in = n THEN 1 ELSE 0 END FROM o
  UNION ALL
  SELECT 'row_count>0', 'lineitem',
         CAST(n AS DOUBLE), CASE WHEN n > 0 THEN 1 ELSE 0 END FROM li
  UNION ALL
  SELECT 'ref_integrity', 'lineitem.l_orderkey->orders',
         CAST(n AS DOUBLE), CASE WHEN n = 0 THEN 1 ELSE 0 END FROM orph_li
  UNION ALL
  SELECT 'ref_integrity', 'orders.o_custkey->customer',
         CAST(n AS DOUBLE), CASE WHEN n = 0 THEN 1 ELSE 0 END FROM orph_o
) s
ORDER BY check_name, scope
"""


def _row(constraint: str, scope: str, value, ok) -> F.Column:
    return F.struct(
        F.lit(constraint).alias("check_name"),
        F.lit(scope).alias("scope"),
        value.cast("double").alias("value"),
        F.when(ok, 1).otherwise(0).alias("pass"),
    )


@register("dq_audit", oracle=_DQ_ORACLE)
def dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style data-quality suite over orders/lineitem/customer:
    completeness, key uniqueness, numeric bounds, accepted values,
    row-count floor, and two referential-integrity checks — one row per
    check with its measured value and pass flag.

    Scale: the lineitem constraints are ONE HashAggregate over one scan
    (all conditional counts fused); likewise orders. The two orphan
    checks are LEFT ANTI joins carrying only key columns. Nine
    constraint rows come back; data never leaves the executors until the
    final 9-row union. At 100 TB, COUNT(DISTINCT o_orderkey) is the one
    expensive term — swap to approx_count_distinct (documented
    tolerance) or run it on the bucketed key layout.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    li_m = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("l_orderkey").alias("nn_ok"),
        F.count(F.when(F.col("l_quantity").between(1, 50), 1)).alias("qty_in"),
        F.count(F.when(F.col("l_discount").between(0, 0.1), 1)).alias("disc_in"),
    )
    o_m = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_custkey").alias("nn_ck"),
        F.countDistinct("o_orderkey").alias("d_ok"),
        F.count(F.when(F.col("o_orderstatus").isin(*_STATUS), 1)).alias("st_in"),
    )
    orph_li = (
        li.select("l_orderkey")
        .join(o.select("o_orderkey"), li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    orph_o = (
        o.select("o_custkey")
        .join(c.select("c_custkey"), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
    )

    n = F.col("n")
    li_rows = li_m.select(
        F.explode(
            F.array(
                _row("completeness", "lineitem.l_orderkey",
                     F.col("nn_ok") / n, F.col("nn_ok") == n),
                _row("bounds[1,50]", "lineitem.l_quantity",
                     F.col("qty_in") / n, F.col("qty_in") == n),
                _row("bounds[0,0.1]", "lineitem.l_discount",
                     F.col("disc_in") / n, F.col("disc_in") == n),
                _row("row_count>0", "lineitem", n, n > 0),
            )
        ).alias("r")
    )
    o_rows = o_m.select(
        F.explode(
            F.array(
                _row("completeness", "orders.o_custkey",
                     F.col("nn_ck") / n, F.col("nn_ck") == n),
                _row("uniqueness", "orders.o_orderkey",
                     F.col("d_ok") / n, F.col("d_ok") == n),
                _row("accepted_values(O,F,P)", "orders.o_orderstatus",
                     F.col("st_in") / n, F.col("st_in") == n),
            )
        ).alias("r")
    )
    oli_rows = orph_li.select(
        F.explode(
            F.array(_row("ref_integrity", "lineitem.l_orderkey->orders", n, n == 0))
        ).alias("r")
    )
    oo_rows = orph_o.select(
        F.explode(
            F.array(_row("ref_integrity", "orders.o_custkey->customer", n, n == 0))
        ).alias("r")
    )
    frames = [li_rows, o_rows, oli_rows, oo_rows]
    return (
        reduce(DataFrame.unionAll, frames)
        .select("r.*")
        .orderBy("check_name", "scope")
    )


# ---------------------------------------------------------------------------
# Table snapshot diff (the ETL regression primitive)
# ---------------------------------------------------------------------------

#: Deterministic synthetic "new snapshot" of orders: every 50th order is
#: deleted, every 37th surviving order has its total bumped by 1.00.
_DIFF_DEL_MOD = 50
_DIFF_CHG_MOD = 37

_DIFF_ORACLE = f"""
WITH b AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % {_DIFF_CHG_MOD} = 0
              THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) + 100
              ELSE CAST(ROUND(o_totalprice * 100) AS BIGINT) END AS cents,
         o_orderstatus
  FROM orders WHERE o_orderkey % {_DIFF_DEL_MOD} <> 0),
a AS (
  SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderstatus
  FROM orders),
j AS (
  SELECT a.o_orderkey AS a_key, b.o_orderkey AS b_key,
         CASE
           WHEN a.o_orderkey IS NULL THEN 'added'
           WHEN b.o_orderkey IS NULL THEN 'removed'
           WHEN a.cents <> b.cents OR a.o_orderstatus <> b.o_orderstatus
             THEN 'changed'
           ELSE 'unchanged'
         END AS change
  FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey)
SELECT change, COUNT(*) AS n FROM j GROUP BY change ORDER BY change
"""


@register("snapshot_diff", oracle=_DIFF_ORACLE)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level diff between two snapshots of a table (added / removed /
    changed / unchanged counts) — the regression gate run after every
    pipeline backfill. The "new" snapshot is derived deterministically
    from orders (every 50th key deleted, every 37th total bumped) so the
    diff exercises all four classes.

    Scale: a FULL OUTER join keyed on the primary key, carrying only the
    key + a compact comparison payload (integer cents + status, not the
    whole row — at 100 TB compare md5 row-hashes instead, same plan).
    The classification is a row-local CASE; the rollup is a 4-group
    aggregation. One shuffle each side, both already key-partitioned if
    the snapshots are bucketed by key (then zero shuffles).
    """
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    a = o.select(
        F.col("o_orderkey").alias("a_key"),
        cents.alias("a_cents"),
        F.col("o_orderstatus").alias("a_status"),
    )
    b = (
        o.filter(F.col("o_orderkey") % _DIFF_DEL_MOD != 0)
        .select(
            F.col("o_orderkey").alias("b_key"),
            F.when(
                F.col("o_orderkey") % _DIFF_CHG_MOD == 0, cents + 100
            ).otherwise(cents).alias("b_cents"),
            F.col("o_orderstatus").alias("b_status"),
        )
    )
    j = a.join(b, a.a_key == b.b_key, "full_outer")
    change = (
        F.when(F.col("a_key").isNull(), "added")
        .when(F.col("b_key").isNull(), "removed")
        .when(
            (F.col("a_cents") != F.col("b_cents"))
            | (F.col("a_status") != F.col("b_status")),
            "changed",
        )
        .otherwise("unchanged")
    )
    return (
        j.select(change.alias("change"))
        .groupBy("change")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("change")
    )


# ---------------------------------------------------------------------------
# Right-to-be-forgotten blast-radius audit
# ---------------------------------------------------------------------------

#: Deterministic erasure cohort: every 97th customer key.
_ERASE_MOD = 97

_ERASE_ORACLE = f"""
WITH victims AS (
  SELECT c_custkey FROM customer WHERE c_custkey % {_ERASE_MOD} = 0),
co AS (SELECT COUNT(*) AS n FROM victims),
oo AS (
  SELECT COUNT(*) AS n FROM orders o
  WHERE EXISTS (SELECT 1 FROM victims v WHERE v.c_custkey = o.o_custkey)),
ll AS (
  SELECT COUNT(*) AS n FROM lineitem l
  WHERE EXISTS (
    SELECT 1 FROM orders o JOIN victims v ON v.c_custkey = o.o_custkey
    WHERE o.o_orderkey = l.l_orderkey))
SELECT 'customer' AS table_name, n AS n_rows FROM co
UNION ALL SELECT 'orders', n FROM oo
UNION ALL SELECT 'lineitem', n FROM ll
ORDER BY table_name
"""


@register("user_erasure_audit", oracle=_ERASE_ORACLE)
def user_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blast-radius audit for a user-erasure (GDPR / right-to-be-
    forgotten) request: for a cohort of customer keys, how many rows in
    each downstream table would be deleted — the dry-run every
    compliance pipeline executes before the destructive pass.

    Scale: semi-joins down the foreign-key chain (customer → orders →
    lineitem), hint-free — an erasure cohort is usually tiny (AQE
    broadcasts it at runtime) but is proportional to the customer table
    in the worst case (bulk-erasure backfills), so the plan must not
    FORCE a broadcast; keys-only frames ride the semi-joins either way.
    The lineitem count reuses the orders-side semi-join result's keys,
    so the fact table is touched once, with only its FK column in
    flight. Counts only — no row payload ever moves.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    victims = c.filter(F.col("c_custkey") % _ERASE_MOD == 0).select("c_custkey")
    hit_orders = o.join(
        victims, o.o_custkey == victims.c_custkey, "left_semi"
    )
    n_c = victims.agg(F.count(F.lit(1)).alias("n_rows")).select(
        F.lit("customer").alias("table_name"), "n_rows"
    )
    n_o = hit_orders.agg(F.count(F.lit(1)).alias("n_rows")).select(
        F.lit("orders").alias("table_name"), "n_rows"
    )
    n_l = (
        li.join(
            hit_orders.select("o_orderkey"),
            li.l_orderkey == F.col("o_orderkey"),
            "left_semi",
        )
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(F.lit("lineitem").alias("table_name"), "n_rows")
    )
    return n_c.unionAll(n_o).unionAll(n_l).orderBy("table_name")


#: Columns profiled by table_profile: (table, column, numeric?). A
#: production catalog would derive this from the schema; the fixed list
#: keeps the oracle twin literal.
_PROFILE_COLS = (
    ("orders", "o_orderkey", True),
    ("orders", "o_custkey", True),
    ("orders", "o_totalprice", True),
    ("orders", "o_orderstatus", False),
    ("customer", "c_custkey", True),
    ("customer", "c_acctbal", True),
    ("customer", "c_nationkey", True),
    ("customer", "c_mktsegment", False),
)


def _profile_oracle() -> str:
    parts = []
    for tbl, col, numeric in _PROFILE_COLS:
        mn = f"CAST(MIN({col}) AS DOUBLE)" if numeric else "CAST(NULL AS DOUBLE)"
        mx = f"CAST(MAX({col}) AS DOUBLE)" if numeric else "CAST(NULL AS DOUBLE)"
        parts.append(
            f"SELECT '{tbl}' AS table_name, '{col}' AS column_name,"
            f" COUNT(*) AS n_rows, COUNT({col}) AS n_nonnull,"
            f" COUNT(DISTINCT {col}) AS n_distinct,"
            f" {mn} AS min_value, {mx} AS max_value FROM {tbl}"
        )
    return (
        " UNION ALL ".join(parts) + " ORDER BY table_name, column_name"
    )


@register("table_profile", oracle=_profile_oracle())
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile: per (table, column) row count,
    non-null count, exact distinct count, and numeric min/max — the
    statistics pass every warehouse runs to feed optimizers, data
    contracts, and drift monitors (complementing dq_audit, which gates
    on EXPECTED values; this op DISCOVERS them).

    Scale: ONE aggregation pass per table — all per-column metrics fuse
    into a single HashAggregate over a single scan (count(DISTINCT) for
    k columns rides one shuffle via Expand ×k; at 100 TB swap in
    approx_count_distinct, same plan minus the expand — documented
    trade, exact here for the oracle gate). The wide 1-row result
    explodes to long format driver-side-free (inline array of structs),
    so no second scan and no union of per-column subplans.
    """
    frames = []
    for tbl in ("orders", "customer"):
        cols = [(c, num) for t, c, num in _PROFILE_COLS if t == tbl]
        d = load_table(spark, sf_dir, tbl)
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        for c, numeric in cols:
            aggs.append(F.count(F.col(c)).alias(f"nn_{c}"))
            aggs.append(F.countDistinct(F.col(c)).alias(f"nd_{c}"))
            if numeric:
                aggs.append(F.min(c).cast("double").alias(f"mn_{c}"))
                aggs.append(F.max(c).cast("double").alias(f"mx_{c}"))
        wide = d.agg(*aggs)
        null_d = F.lit(None).cast("double")
        structs = [
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"nn_{c}").alias("n_nonnull"),
                F.col(f"nd_{c}").alias("n_distinct"),
                (F.col(f"mn_{c}") if numeric else null_d).alias("min_value"),
                (F.col(f"mx_{c}") if numeric else null_d).alias("max_value"),
            )
            for c, numeric in cols
        ]
        frames.append(
            wide.select(
                F.lit(tbl).alias("table_name"),
                F.explode(F.array(*structs)).alias("m"),
            ).select("table_name", "m.*")
        )
    return reduce(DataFrame.unionAll, frames).orderBy("table_name", "column_name")


#: Freshness SLA: a stream is stale if nothing arrived in the last 6 h
#: before the fixed audit anchor (no-current_date rule, SCALE.md).
_FRESH_ANCHOR = "2024-01-31 00:00:00"
_FRESH_SLA_US = 6 * 3600 * 1_000_000
_DAY_US = 24 * 3600 * 1_000_000


@register(
    "freshness_audit",
    oracle=f"""
    SELECT event_type AS stream,
           MAX(ts) AS last_ts,
           CAST(epoch_us(TIMESTAMP '{_FRESH_ANCHOR}') - epoch_us(MAX(ts))
                AS BIGINT) AS staleness_us,
           COUNT(CASE WHEN epoch_us(TIMESTAMP '{_FRESH_ANCHOR}')
                           - epoch_us(ts) <= {_DAY_US} THEN 1 END)
             AS n_last_24h,
           CASE WHEN epoch_us(TIMESTAMP '{_FRESH_ANCHOR}') - epoch_us(MAX(ts))
                > {_FRESH_SLA_US} THEN 1 ELSE 0 END AS is_stale
    FROM events
    GROUP BY event_type
    ORDER BY stream
    """,
)
def freshness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-freshness SLA audit per event stream: last-arrival
    timestamp, staleness vs the audit anchor, last-24 h volume, and the
    stale flag — the landing-zone health check every ingestion pipeline
    gates on (complements dq_audit's value checks and table_profile's
    shape stats with ARRIVAL semantics).

    Scale: ONE aggregation over one scan — max(ts) and the windowed
    conditional count fuse into the same HashAggregate with map-side
    combine, so the audit costs a single pass regardless of stream
    count; output is |streams| rows. Timestamps compare as exact
    integer microseconds against a FIXED anchor (reproducible across
    retries — never current_timestamp in an audit).
    """
    e = load_table(spark, sf_dir, "events")
    anchor_us = F.unix_micros(F.lit(_FRESH_ANCHOR).cast("timestamp"))
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    return (
        e.groupBy(F.col("event_type").alias("stream"))
        .agg(
            F.max("ts").alias("last_ts"),
            (anchor_us - F.unix_micros(F.max("ts").cast("timestamp")))
            .cast("bigint")
            .alias("staleness_us"),
            F.count(F.when(anchor_us - ts_us <= _DAY_US, 1)).alias("n_last_24h"),
            F.when(
                anchor_us - F.unix_micros(F.max("ts").cast("timestamp"))
                > _FRESH_SLA_US,
                1,
            )
            .otherwise(0)
            .alias("is_stale"),
        )
        .orderBy("stream")
    )


#: Benford deviation quantization (nano-ticks for the expected share,
#: micro-ticks for the chi-square-style deviation).
_BENFORD_TICK = 1_000_000_000
_BENFORD_DEV_TICK = 1_000_000


@register(
    "benford_audit",
    oracle=f"""
    WITH c AS (
      SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
                         AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders),
    obs AS (SELECT digit, COUNT(*) AS observed FROM c GROUP BY digit),
    tot AS (SELECT COUNT(*) AS n FROM c),
    d AS (SELECT CAST(u.d AS INT) AS digit FROM UNNEST(range(1, 10)) u(d)),
    e AS (
      SELECT d.digit, COALESCE(o.observed, 0) AS observed, t.n,
             CAST(round(log10(1.0 + 1.0 / d.digit) * {_BENFORD_TICK}, 0)
                  AS BIGINT) AS benford_ticks
      FROM d LEFT JOIN obs o ON d.digit = o.digit CROSS JOIN tot t)
    SELECT digit, observed, benford_ticks,
           CAST(round(pow(CAST(observed AS DOUBLE) * {_BENFORD_TICK}
                          - CAST(n AS DOUBLE) * benford_ticks, 2)
                      / (CAST(n AS DOUBLE) * benford_ticks * {_BENFORD_TICK})
                      * {_BENFORD_DEV_TICK}, 0) AS BIGINT) AS dev_ticks
    FROM e
    ORDER BY digit
    """,
)
def benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals: observed count
    per leading digit vs the log10(1+1/d) expectation, with a
    chi-square-style deviation per digit — the classic
    fabricated-numbers / fraud screen over any monetary column.

    Scale: ONE aggregation reduces the table to ≤9 digit counts (the
    leading digit comes from integer-cents → string, identical in both
    engines — never float log on the value itself); the Benford
    expectation and deviations are computed on that 9-row frame joined
    to the literal digit spine. Deviation arithmetic runs on exact
    integers scaled to ticks, with the one pow()/division mirrored
    token-for-token in the oracle.
    """
    o = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").cast("string"),
        1,
        1,
    ).cast("int")
    obs = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("observed")
    )
    tot = o.agg(F.count(F.lit(1)).alias("n"))
    digits = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    benford = F.round(
        F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")) * _BENFORD_TICK, 0
    ).cast("bigint")
    e = (
        digits.join(obs, "digit", "left")
        .withColumn("observed", F.coalesce(F.col("observed"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
        .withColumn("benford_ticks", benford)
    )
    dev = F.round(
        F.pow(
            F.col("observed").cast("double") * _BENFORD_TICK
            - F.col("n").cast("double") * F.col("benford_ticks"),
            2,
        )
        / (
            F.col("n").cast("double")
            * F.col("benford_ticks")
            * _BENFORD_TICK
        )
        * _BENFORD_DEV_TICK,
        0,
    ).cast("bigint")
    return (
        e.select("digit", "observed", "benford_ticks", dev.alias("dev_ticks"))
        .orderBy("digit")
    )


@register(
    "json_props_profile",
    oracle="""
    WITH kv AS (
      SELECT k, CAST(json_extract(props, '$.' || k) AS VARCHAR) AS raw
      FROM (SELECT props, unnest(json_keys(props)) AS k FROM events)),
    typed AS (
      SELECT k,
             CASE WHEN regexp_matches(raw, '^-?[0-9]+$') THEN 'integer'
                  WHEN regexp_matches(raw, '^-?[0-9]*\\.[0-9]+([eE][+-]?[0-9]+)?$')
                    THEN 'number'
                  WHEN raw IN ('true', 'false') THEN 'boolean'
                  WHEN raw = 'null' THEN 'null'
                  WHEN raw LIKE '"%' THEN 'string'
                  ELSE 'object' END AS vtype,
             CASE WHEN regexp_matches(raw, '^-?[0-9]+$')
                  THEN CAST(raw AS BIGINT) END AS num
      FROM kv)
    SELECT k AS key, vtype, COUNT(*) AS n,
           CAST(MIN(num) AS BIGINT) AS min_int,
           CAST(MAX(num) AS BIGINT) AS max_int
    FROM typed
    GROUP BY k, vtype
    ORDER BY key, vtype
    """,
)
def json_props_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema inference over the semi-structured ``events.props`` JSON
    column: every key's observed value type(s), occurrence count, and
    integer range — the discovery pass that turns a schemaless landing
    zone into typed columns (the generic machinery matters; this
    dataset's props happen to carry one integer key).

    Scale: ONE pass — ``from_json`` to ``map<string,string>`` then a
    map explode keeps parsing JVM-side (no per-key re-parse, no dynamic
    get_json_object path evaluation per key); type classification is a
    codegen'd regex CASE, and the rollup is |keys × types| rows. The
    oracle reaches the same classification through DuckDB's json_keys /
    json_extract — two independent JSON stacks agreeing on the profile.
    """
    e = load_table(spark, sf_dir, "events")
    kv = e.select(
        F.explode(F.from_json("props", "map<string,string>")).alias("k", "v")
    )
    is_int = F.col("v").rlike(r"^-?[0-9]+$")
    is_num = F.col("v").rlike(r"^-?[0-9]*\.[0-9]+([eE][+-]?[0-9]+)?$")
    # from_json(map<string,string>) strips quotes from JSON strings, so
    # classify strings LAST (anything not parsing as a JSON scalar)
    vtype = (
        F.when(is_int, "integer")
        .when(is_num, "number")
        .when(F.col("v").isin("true", "false"), "boolean")
        .when(F.col("v").isNull() | (F.col("v") == "null"), "null")
        .when(F.col("v").startswith("{") | F.col("v").startswith("["), "object")
        .otherwise("string")
    )
    typed = kv.select(
        F.col("k").alias("key"),
        vtype.alias("vtype"),
        F.when(is_int, F.col("v").cast("bigint")).alias("num"),
    )
    return (
        typed.groupBy("key", "vtype")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("num").cast("bigint").alias("min_int"),
            F.max("num").cast("bigint").alias("max_int"),
        )
        .orderBy("key", "vtype")
    )


@register(
    "props_variant_profile",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(CAST(json_extract(props, '$.k') AS BIGINT))
             AS BIGINT) AS n_with_k,
           CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT))
             AS BIGINT) AS min_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT))
             AS BIGINT) AS max_k,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT))
             AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
)
def props_variant_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT twin of json_props_profile's extraction path (r9 verdict
    item 4): ``parse_json`` turns ``events.props`` into Spark 4's
    binary-encoded, shredded VARIANT ONCE, and every subsequent typed
    access is ``variant_get(v, '$.k', 'bigint')`` — an offset lookup
    into the encoded value, not a string re-parse.

    Efficiency vs the string-parse path (json_props_profile,
    get_json_object): each ``get_json_object``/``from_json`` call
    re-tokenizes the JSON text per row per call — k extractions cost k
    parses; VARIANT pays one parse per row and O(log fields) binary
    navigation per access, and when the column is STORED as VARIANT
    (Parquet shredding writes typed subcolumns + min/max footers),
    predicates on ``$.k`` prune row groups like any typed column —
    the property that makes semi-structured predicates scan-efficient
    at 100 TB, where a JSON-text column forces full-string reads.
    The aggregated shape is pinned in pytest via schema_of_variant_agg
    ('OBJECT<k: BIGINT>'); the DuckDB oracle reaches the same numbers
    through its native JSON ops — two independent semi-structured
    stacks agreeing.

    Scale: one parse pass, |event_type| output rows, single rollup
    shuffle."""
    e = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.col("v"), "$.k", "bigint")
    return (
        e.select("event_type", F.parse_json(F.col("props")).alias("v"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.count(k).cast("bigint").alias("n_with_k"),
            F.min(k).cast("bigint").alias("min_k"),
            F.max(k).cast("bigint").alias("max_k"),
            F.sum(k).cast("bigint").alias("sum_k"),
        )
        .orderBy("event_type")
    )


@register(
    "table_checksums",
    oracle="""
    WITH o AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(concat('0x', substr(md5(
               CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)
               || '|' || CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS VARCHAR)
             ), 1, 8)) AS BIGINT)) AS BIGINT) AS checksum
      FROM orders),
    c AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(concat('0x', substr(md5(
               CAST(c_custkey AS VARCHAR) || '|' || c_mktsegment
             ), 1, 8)) AS BIGINT)) AS BIGINT) AS checksum
      FROM customer)
    SELECT * FROM (
      SELECT 'orders' AS table_name, n, checksum FROM o
      UNION ALL
      SELECT 'customer', n, checksum FROM c) t
    ORDER BY table_name
    """,
)
def table_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive content checksums per table (row count + sum of
    per-row 32-bit md5 hashes over the business-key columns) — the
    cross-system reconciliation primitive: two engines, two clusters, or
    a before/after migration agree iff the (n, checksum) pairs agree,
    with no row-by-row compare and no ordering requirement.

    Scale: one pass per table, everything map-side until the single-row
    SUM (addition commutes, so partitioning/retries can't change the
    checksum); per-row hashing is the md5 family shared with the dedup
    ladder (functions/texthash.py — identical in DuckDB, so the oracle
    IS the cross-system reconciliation it demonstrates). Money enters
    the hash as exact integer cents, never a float rendering.
    """
    from ai_etl_studio_spark.functions.texthash import md5_hash32

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    o_sum = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            md5_hash32(
                F.concat_ws(
                    "|",
                    F.col("o_orderkey").cast("string"),
                    F.col("o_custkey").cast("string"),
                    F.round(F.col("o_totalprice") * 100, 0)
                    .cast("bigint")
                    .cast("string"),
                )
            )
        )
        .cast("bigint")
        .alias("checksum"),
    ).select(F.lit("orders").alias("table_name"), "n", "checksum")
    c_sum = c.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            md5_hash32(
                F.concat_ws(
                    "|", F.col("c_custkey").cast("string"), F.col("c_mktsegment")
                )
            )
        )
        .cast("bigint")
        .alias("checksum"),
    ).select(F.lit("customer").alias("table_name"), "n", "checksum")
    return o_sum.unionAll(c_sum).orderBy("table_name")


#: k-anonymity threshold for the quasi-identifier audit.
K_ANON = 5


@register(
    "k_anonymity_audit",
    oracle=f"""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM customer GROUP BY 1, 2, 3)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN cnt < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_below_k,
           CAST(SUM(CASE WHEN cnt < {K_ANON} THEN cnt ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           CAST(MIN(cnt) AS BIGINT) AS min_group_size
    FROM g
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier triple (nation,
    market segment, $1k balance band): how many QI groups fall below
    k=5 and how many customer rows are re-identifiable through them —
    the privacy gate run before releasing an "anonymized" extract.

    Scale: one map-side-combinable count reduces customers to their QI
    groups, then a 1-row summary aggregate. The balance band uses
    explicit floor() (not an int cast) so negative balances band
    identically in both engines.
    """
    c = load_table(spark, sf_dir, "customer")
    g = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    return g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(F.when(F.col("cnt") < K_ANON, 1).otherwise(0))
        .cast("bigint")
        .alias("n_below_k"),
        F.sum(F.when(F.col("cnt") < K_ANON, F.col("cnt")).otherwise(0))
        .cast("bigint")
        .alias("rows_at_risk"),
        F.min("cnt").cast("bigint").alias("min_group_size"),
    )


@register(
    "partition_skew_advisor",
    oracle="""
    WITH base AS (
      SELECT date_trunc('month', o_orderdate) AS pmonth, o_orderpriority
      FROM orders),
    m AS (
      SELECT 'month(o_orderdate)' AS candidate,
             CAST(COUNT(*) AS BIGINT) AS n_rows, pmonth AS pkey
      FROM base GROUP BY pmonth),
    p AS (
      SELECT 'o_orderpriority' AS candidate,
             CAST(COUNT(*) AS BIGINT) AS n_rows, CAST(NULL AS TIMESTAMP)
               AS pkey
      FROM base GROUP BY o_orderpriority),
    u AS (
      SELECT candidate, n_rows FROM m
      UNION ALL SELECT candidate, n_rows FROM p)
    SELECT candidate,
           CAST(COUNT(*) AS BIGINT) AS n_partitions,
           CAST(SUM(n_rows) AS BIGINT) AS total_rows,
           CAST(MAX(n_rows) AS BIGINT) AS max_rows,
           CAST(round(CAST(MAX(n_rows) AS DOUBLE)
             / (CAST(SUM(n_rows) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
             * 1000000, 0) AS BIGINT) AS skew_ratio_micro
    FROM u GROUP BY candidate ORDER BY candidate
    """,
)
def partition_skew_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-layout advisor: for each candidate partition column,
    the partition count, max-partition size, and max/mean skew ratio —
    the write-layout decision ("partition by month or by priority?")
    that at 100 TB separates balanced scans from one straggler file
    per write.

    Scale: the candidate cardinalities are what make this safe — each
    candidate reduces to its partition-count table map-side (calendar
    months, 5 priorities); the checkpointed 2-column projection feeds
    both candidate aggregations without re-scanning orders. skew→1e6
    means perfectly balanced.
    """
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.date_trunc("month", "o_orderdate").alias("pmonth"), "o_orderpriority"
    ).localCheckpoint()  # 2 candidate groupings, one scan
    m = base.groupBy("pmonth").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    ).select(F.lit("month(o_orderdate)").alias("candidate"), "n_rows")
    p = base.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    ).select(F.lit("o_orderpriority").alias("candidate"), "n_rows")
    u = m.unionByName(p)
    mean = F.sum("n_rows").cast("double") / F.count(F.lit(1)).cast("double")
    return (
        u.groupBy("candidate")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_partitions"),
            F.sum("n_rows").cast("bigint").alias("total_rows"),
            F.max("n_rows").cast("bigint").alias("max_rows"),
            F.round(F.max("n_rows").cast("double") / mean * 1_000_000, 0)
            .cast("bigint")
            .alias("skew_ratio_micro"),
        )
        .orderBy("candidate")
    )


#: l-diversity floor for the sensitive-attribute audit.
L_DIV = 3


@register(
    "l_diversity_audit",
    oracle=f"""
    WITH g AS (
      SELECT c_nationkey, CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS l_div
      FROM customer GROUP BY 1, 2)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(MIN(l_div) AS BIGINT) AS min_l,
           CAST(SUM(CASE WHEN l_div < {L_DIV} THEN 1 ELSE 0 END) AS BIGINT)
             AS groups_below_l,
           CAST(SUM(CASE WHEN l_div < {L_DIV} THEN cnt ELSE 0 END) AS BIGINT)
             AS rows_at_risk
    FROM g
    """,
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit: k_anonymity_audit's companion — a QI group can
    be ≥k rows yet still leak if every member shares the SAME sensitive
    value (here: market segment within (nation, balance-band) groups).
    Counts groups whose sensitive-attribute diversity falls below
    l={L_DIV} and the rows exposed by them.

    Scale: one (QI, sensitive)-bounded aggregation with map-side
    combine (distinct-count state is ≤|segments| per group), then a
    1-row rollup; explicit floor() banding so negative balances band
    identically in both engines.
    """
    c = load_table(spark, sf_dir, "customer")
    g = c.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.countDistinct("c_mktsegment").cast("bigint").alias("l_div"),
    )
    return g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.min("l_div").cast("bigint").alias("min_l"),
        F.sum(F.when(F.col("l_div") < L_DIV, 1).otherwise(0))
        .cast("bigint")
        .alias("groups_below_l"),
        F.sum(F.when(F.col("l_div") < L_DIV, F.col("cnt")).otherwise(0))
        .cast("bigint")
        .alias("rows_at_risk"),
    )


# ---------------------------------------------------------------------------
# Cross-table order/line status consistency audit
# ---------------------------------------------------------------------------

@register(
    "orderstatus_consistency_audit",
    oracle="""
    WITH lo AS (
      SELECT l_orderkey,
             CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END)
               AS BIGINT) AS nf,
             CAST(COUNT(*) AS BIGINT) AS nl
      FROM lineitem GROUP BY 1),
    j AS (
      SELECT o.o_orderstatus AS status,
             CASE WHEN lo.l_orderkey IS NULL THEN 'no_lines'
                  WHEN lo.nf = lo.nl THEN 'all_F'
                  WHEN lo.nf = 0 THEN 'all_O' ELSE 'mixed' END AS line_mix
      FROM orders o LEFT JOIN lo ON o.o_orderkey = lo.l_orderkey)
    SELECT status, line_mix, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(CASE WHEN (status = 'F' AND line_mix = 'all_F')
                       OR (status = 'O' AND line_mix = 'all_O')
                       OR (status = 'P' AND line_mix = 'mixed')
                THEN 0 ELSE 1 END AS BIGINT) AS is_violation
    FROM j GROUP BY status, line_mix ORDER BY status, line_mix
    """,
)
def orderstatus_consistency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table referential-SEMANTICS audit: does each order's header
    status agree with its lines (TPC-H invariant: F iff every line
    finished, O iff none, P otherwise)? The contingency table of
    header-status x line-mix with the violating cells flagged — the
    header/detail drift check every warehouse needs after a partial
    load, and one a single-table dq_audit constraint cannot see.

    Scale: lineitem reduces per-order map-side (nf, nl) before the
    key-on-key LEFT join with orders — one shuffle each side on the
    natural key; the result then collapses to the <=|status|x4 cell
    table. Orders with NO lines surface as their own mix class instead
    of vanishing (the left join is the audit).
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    lo = li.groupBy("l_orderkey").agg(
        F.sum(F.when(F.col("l_linestatus") == "F", 1).otherwise(0))
        .cast("bigint")
        .alias("nf"),
        F.count(F.lit(1)).cast("bigint").alias("nl"),
    )
    j = o.join(lo, o.o_orderkey == lo.l_orderkey, "left").select(
        F.col("o_orderstatus").alias("status"),
        F.when(F.col("l_orderkey").isNull(), "no_lines")
        .when(F.col("nf") == F.col("nl"), "all_F")
        .when(F.col("nf") == 0, "all_O")
        .otherwise("mixed")
        .alias("line_mix"),
    )
    ok = (
        ((F.col("status") == "F") & (F.col("line_mix") == "all_F"))
        | ((F.col("status") == "O") & (F.col("line_mix") == "all_O"))
        | ((F.col("status") == "P") & (F.col("line_mix") == "mixed"))
    )
    return (
        j.groupBy("status", "line_mix")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
        .select(
            "status",
            "line_mix",
            "n_orders",
            F.when(ok, 0).otherwise(1).cast("bigint").alias("is_violation"),
        )
        .orderBy("status", "line_mix")
    )


# ---------------------------------------------------------------------------
# Catalog name-collision audit (duplicate product names)
# ---------------------------------------------------------------------------

_COLL_TOPK = 20


@register(
    "catalog_name_collision_audit",
    oracle=f"""
    WITH g AS (
      SELECT p_name, CAST(COUNT(*) AS BIGINT) AS n_parts,
             CAST(COUNT(DISTINCT p_brand) AS BIGINT) AS n_brands,
             CAST(MIN(CAST(round(p_retailprice * 100, 0) AS BIGINT))
               AS BIGINT) AS min_price_cents,
             CAST(MAX(CAST(round(p_retailprice * 100, 0) AS BIGINT))
               AS BIGINT) AS max_price_cents,
             CAST(MIN(p_partkey) AS BIGINT) AS min_partkey
      FROM part GROUP BY 1 HAVING COUNT(*) > 1)
    SELECT p_name, n_parts, n_brands, min_price_cents, max_price_cents,
           max_price_cents - min_price_cents AS price_spread_cents,
           min_partkey
    FROM g ORDER BY n_parts DESC, p_name LIMIT {_COLL_TOPK}
    """,
)
def catalog_name_collision_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Products sharing the SAME display name: how many part keys hide
    behind each duplicated name, across how many brands, and how wide
    the price spread runs — the master-data dedup worklist (a name with
    40 keys and a 100x price range is either a catalog bug or a
    variant family that needs structure). The ER complement to
    er_blocked_pairs, at name-exact grain.

    Scale: one reduction keyed on p_name with map-side combine; the
    distinct-brand count runs on the already-grouped name grain;
    deterministic sample key via MIN(p_partkey); top-k is a heap.
    Exact integer cents throughout.
    """
    p = load_table(spark, sf_dir, "part")
    g = (
        p.groupBy("p_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.countDistinct("p_brand").cast("bigint").alias("n_brands"),
            F.min(cents("p_retailprice")).cast("bigint").alias("min_price_cents"),
            F.max(cents("p_retailprice")).cast("bigint").alias("max_price_cents"),
            F.min("p_partkey").cast("bigint").alias("min_partkey"),
        )
        .filter(F.col("n_parts") > 1)
    )
    return (
        g.select(
            "p_name",
            "n_parts",
            "n_brands",
            "min_price_cents",
            "max_price_cents",
            (F.col("max_price_cents") - F.col("min_price_cents")).alias(
                "price_spread_cents"
            ),
            "min_partkey",
        )
        .orderBy(F.desc("n_parts"), "p_name")
        .limit(_COLL_TOPK)
    )


# ---------------------------------------------------------------------------
# Temporal referential-integrity audit (ship-before-order)
# ---------------------------------------------------------------------------

@register(
    "temporal_integrity_by_year",
    oracle="""
    WITH j AS (
      SELECT CAST(year(CAST(l.l_shipdate AS DATE)) AS BIGINT) AS yr,
             CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE)
               AS delta
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
    SELECT yr, CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN delta < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violations,
           CAST(SUM(CASE WHEN delta < 0 THEN 1 ELSE 0 END) * 1000000
             // COUNT(*) AS BIGINT) AS violation_ppm,
           CAST(MIN(delta) AS BIGINT) AS worst_delta_days
    FROM j GROUP BY yr ORDER BY yr
    """,
)
def temporal_integrity_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAUSALITY audit across the header/detail pair: lines that SHIP
    before their order exists, by ship year — the temporal cousin of
    orderstatus_consistency_audit (key-valid rows can still be
    time-impossible, and neither dq_audit's single-table bounds nor the
    orphan checks can see it). The per-year trend localizes which load
    windows the corruption entered through.

    Scale: the one key-on-key fact join carries only the two date
    columns; everything reduces map-side to one row per year. Exact
    integer day deltas and ppm.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.year(F.col("l_shipdate").cast("date")).cast("bigint").alias("yr"),
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("delta"),
    )
    viol = F.sum(F.when(F.col("delta") < 0, 1).otherwise(0)).cast("bigint")
    return (
        j.groupBy("yr")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            viol.alias("n_violations"),
            F.min("delta").cast("bigint").alias("worst_delta_days"),
        )
        .select(
            "yr",
            "n_lines",
            "n_violations",
            F.expr("CAST(n_violations * 1000000 DIV n_lines AS BIGINT)").alias(
                "violation_ppm"
            ),
            "worst_delta_days",
        )
        .orderBy("yr")
    )


# ---------------------------------------------------------------------------
# Header-vs-lines revenue reconciliation audit
# ---------------------------------------------------------------------------

@register(
    "order_total_reconciliation",
    oracle="""
    WITH ls AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount)
               * (1 + l_tax) * 100, 0) AS BIGINT)) AS BIGINT) AS lines_cents
      FROM lineitem GROUP BY 1),
    j AS (
      SELECT CAST(year(CAST(o.o_orderdate AS DATE)) AS BIGINT) AS yr,
             CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS header_cents,
             COALESCE(ls.lines_cents, 0) AS lines_cents
      FROM orders o LEFT JOIN ls ON o.o_orderkey = ls.l_orderkey),
    f AS (
      SELECT yr, header_cents, lines_cents,
             abs(header_cents - lines_cents) AS gap,
             CASE WHEN abs(header_cents - lines_cents) * 100 > header_cents
               THEN 1 ELSE 0 END AS off_1pct
      FROM j)
    SELECT yr, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(off_1pct) AS BIGINT) AS n_mismatched,
           CAST(SUM(off_1pct) * 1000000 // COUNT(*) AS BIGINT)
             AS mismatch_ppm,
           CAST(MAX(gap) AS BIGINT) AS max_gap_cents
    FROM f GROUP BY yr ORDER BY yr
    """,
)
def order_total_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The books-balance audit: does each order's HEADER total equal
    the sum of its lines priced out (extendedprice x (1-discount) x
    (1+tax))? Orders off by more than 1% counted per year with the
    worst absolute gap — the reconciliation any finance close runs
    before trusting either table (a lineless order reconciles against
    zero, so orphan headers surface too, not vanish).

    Scale: lines reduce per order map-side (one exact-cents sum), the
    LEFT join is key-on-key carrying two integers, and the yearly
    rollup reduces map-side. The 1% test is exact integer
    cross-multiplication — no float threshold.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    line_val = F.round(
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax"))
        * 100,
        0,
    ).cast("bigint")
    ls = li.groupBy("l_orderkey").agg(
        F.sum(line_val).cast("bigint").alias("lines_cents")
    )
    j = o.join(ls, o.o_orderkey == ls.l_orderkey, "left").select(
        F.year(F.col("o_orderdate").cast("date")).cast("bigint").alias("yr"),
        cents("o_totalprice").alias("header_cents"),
        F.coalesce(F.col("lines_cents"), F.lit(0)).alias("lines_cents"),
    )
    gap = F.abs(F.col("header_cents") - F.col("lines_cents"))
    off = F.when(gap * 100 > F.col("header_cents"), 1).otherwise(0)
    return (
        j.select("yr", gap.alias("gap"), off.alias("off_1pct"))
        .groupBy("yr")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("off_1pct").cast("bigint").alias("n_mismatched"),
            F.max("gap").cast("bigint").alias("max_gap_cents"),
        )
        .select(
            "yr",
            "n_orders",
            "n_mismatched",
            F.expr("CAST(n_mismatched * 1000000 DIV n_orders AS BIGINT)").alias(
                "mismatch_ppm"
            ),
            "max_gap_cents",
        )
        .orderBy("yr")
    )


# ---------------------------------------------------------------------------
# Benford second-digit forensic audit
# ---------------------------------------------------------------------------

#: Benford second-digit probabilities in exact ppm — Σ_k log10(1+1/(10k+d))
#: computed ONCE and inlined as literals, so neither engine ever sums the
#: nine log terms at runtime (a 9-element double sum is order-dependent).
_BENFORD2_PPM = {
    0: 119679, 1: 113890, 2: 108821, 3: 104330, 4: 100308,
    5: 96677, 6: 93375, 7: 90352, 8: 87570, 9: 84997,
}
_BENFORD2_VALUES = ", ".join(
    f"({d}, {p})" for d, p in _BENFORD2_PPM.items()
)


@register(
    "benford_second_digit_audit",
    oracle=f"""
    WITH d2 AS (
      SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100, 0)
        AS BIGINT) AS VARCHAR), 2, 1) AS BIGINT) AS digit
      FROM orders WHERE round(o_totalprice * 100, 0) >= 10),
    c AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d2 GROUP BY 1),
    exp2(digit, expected_ppm) AS (VALUES {_BENFORD2_VALUES}),
    t AS (
      SELECT c.digit, c.n, CAST(exp2.expected_ppm AS BIGINT)
               AS expected_ppm,
             CAST(SUM(c.n) OVER () AS BIGINT) AS tot
      FROM c JOIN exp2 ON c.digit = exp2.digit)
    SELECT digit, n,
           CAST(n * 1000000 // tot AS BIGINT) AS observed_ppm,
           expected_ppm,
           CAST(n * 1000000 // tot - expected_ppm AS BIGINT)
             AS deviation_ppm
    FROM t ORDER BY digit
    """,
)
def benford_second_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SECOND-digit Benford test — the forensic accountant's
    sharper blade: fabricators who know to fake a first-digit Benford
    curve almost never fake the second digit's gentler 12.0%→8.5%
    slope, and rounding-to-psychological-prices shows up here first.
    (Synthetic uniform prices deviate on BOTH digits — also a finding.)
    Complements benford_audit's first-digit screen.

    Scale: one projection extracts the digit (string slice of the
    exact integer cents — no float log), one map-side reduction to ten
    rows, expected values joined from INLINED constants (the nine-term
    log sums are precomputed literals, not runtime float sums).
    """
    o = load_table(spark, sf_dir, "orders")
    v = cents("o_totalprice")
    d2 = o.filter(v >= 10).select(
        F.substring(v.cast("string"), 2, 1).cast("bigint").alias("digit")
    )
    c = d2.groupBy("digit").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    exp_rows = [(d, p) for d, p in _BENFORD2_PPM.items()]
    exp2 = spark.createDataFrame(exp_rows, "digit bigint, expected_ppm bigint")
    t = c.join(F.broadcast(exp2), "digit").withColumn(
        "tot",
        F.sum("n")
        .over(Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .cast("bigint"),
    )
    return t.select(
        "digit",
        "n",
        F.expr("CAST(n * 1000000 DIV tot AS BIGINT)").alias("observed_ppm"),
        "expected_ppm",
        F.expr(
            "CAST(n * 1000000 DIV tot - expected_ppm AS BIGINT)"
        ).alias("deviation_ppm"),
    ).orderBy("digit")


# ---------------------------------------------------------------------------
# Key-vs-time monotonicity audit (append-order forensics)
# ---------------------------------------------------------------------------

@register(
    "key_time_correlation",
    oracle="""
    WITH j AS (
      SELECT CAST(o_orderkey AS BIGINT) AS k,
             CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
               AS d
      FROM orders),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(k) AS BIGINT) AS sa,
             CAST(SUM(d) AS BIGINT) AS sb,
             CAST(SUM(CAST(k AS HUGEINT) * d) AS DOUBLE) AS sab,
             CAST(SUM(CAST(k AS HUGEINT) * k) AS DOUBLE) AS saa,
             CAST(SUM(CAST(d AS HUGEINT) * d) AS DOUBLE) AS sbb
      FROM j)
    SELECT n AS n_orders,
           CAST(round((n * sab - CAST(sa AS DOUBLE) * sb)
             / sqrt((n * saa - CAST(sa AS DOUBLE) * sa)
               * (n * sbb - CAST(sb AS DOUBLE) * sb)) * 1000000, 0)
             AS BIGINT) AS key_time_corr_micro
    FROM m
    """,
)
def key_time_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do surrogate keys follow TIME? The correlation between order key
    and order date — in an append-only system it should approach 1 (and
    then key ranges prune time predicates for free); near 0 means keys
    were bulk-assigned, shuffled, or backfilled, and every
    key-range-as-time assumption downstream is wrong. A one-number
    physical-layout audit to run before min/max-skipping designs
    (zorder_write, candidate_files) assume key-time locality.

    Scale: one pass to a sufficient-statistics row; products ride the
    wide-integer rule and the Pearson is a mirrored final expression.
    """
    o = load_table(spark, sf_dir, "orders")
    j = o.select(
        F.col("o_orderkey").cast("bigint").alias("k"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("d"),
    )
    kd = F.col("k").cast("decimal(38,0)")
    dd = F.col("d").cast("decimal(38,0)")
    m = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("k").cast("bigint").alias("sa"),
        F.sum("d").cast("bigint").alias("sb"),
        F.sum(kd * dd).cast("double").alias("sab"),
        F.sum(kd * kd).cast("double").alias("saa"),
        F.sum(dd * dd).cast("double").alias("sbb"),
    )
    corr = (
        (F.col("n") * F.col("sab") - F.col("sa").cast("double") * F.col("sb"))
        / F.sqrt(
            (F.col("n") * F.col("saa") - F.col("sa").cast("double") * F.col("sa"))
            * (F.col("n") * F.col("sbb") - F.col("sb").cast("double") * F.col("sb"))
        )
    )
    return m.select(
        F.col("n").alias("n_orders"),
        F.round(corr * 1_000_000, 0).cast("bigint").alias(
            "key_time_corr_micro"
        ),
    )


# ---------------------------------------------------------------------------
# Price-ending digit forensics (psychological pricing / fabrication)
# ---------------------------------------------------------------------------

_ENDING_TOPK = 10


@register(
    "price_ending_digits_topk",
    oracle=f"""
    WITH e AS (
      SELECT CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) % 100
        AS BIGINT) AS ending
      FROM orders),
    c AS (
      SELECT ending, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY 1),
    t AS (SELECT c.*, CAST(SUM(n) OVER () AS BIGINT) AS tot FROM c)
    SELECT ending, n,
           CAST(n * 1000000 // tot AS BIGINT) AS observed_ppm,
           CAST(n * 1000000 // tot - 10000 AS BIGINT) AS deviation_ppm
    FROM t ORDER BY n DESC, ending LIMIT {_ENDING_TOPK}
    """,
)
def price_ending_digits_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CENTS-ending census: the most common last-two-digit endings
    of order totals against the uniform 1% baseline — real commerce
    piles up on .99/.95/.00 (psychological pricing and round-number
    invoicing); a synthetic or laundered ledger is flat. The third leg
    of the digit-forensics set (benford_audit leads, second-digit
    refines, endings close the other end of the number).

    Scale: the ending is integer modulo on exact cents; one map-side
    reduction to <=100 rows; the baseline comparison is exact ppm
    arithmetic; heap top-k.
    """
    o = load_table(spark, sf_dir, "orders")
    e = o.select((cents("o_totalprice") % 100).cast("bigint").alias("ending"))
    c = e.groupBy("ending").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    t = c.withColumn(
        "tot",
        F.sum("n")
        .over(Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .cast("bigint"),
    )
    return (
        t.select(
            "ending",
            "n",
            F.expr("CAST(n * 1000000 DIV tot AS BIGINT)").alias(
                "observed_ppm"
            ),
            F.expr("CAST(n * 1000000 DIV tot - 10000 AS BIGINT)").alias(
                "deviation_ppm"
            ),
        )
        .orderBy(F.desc("n"), "ending")
        .limit(_ENDING_TOPK)
    )


# ---------------------------------------------------------------------------
# Horizon edge audit (partial-period coverage at the data boundaries)
# ---------------------------------------------------------------------------

@register(
    "horizon_edge_audit",
    oracle="""
    WITH d AS (
      SELECT CAST(l_shipdate AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY 1),
    mx AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM d),
    c AS (
      SELECT CASE WHEN d.day < mx.lo + 30 THEN 'head_30d'
                  WHEN d.day > mx.hi - 30 THEN 'tail_30d'
                  ELSE 'interior' END AS zone,
             d.n
      FROM d CROSS JOIN mx),
    g AS (
      SELECT zone, CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(n) AS BIGINT) AS n_lines
      FROM c GROUP BY 1),
    t AS (
      SELECT g.*,
             CAST(SUM(CASE WHEN zone = 'interior' THEN n_lines END)
               OVER () AS BIGINT) AS int_lines,
             CAST(SUM(CASE WHEN zone = 'interior' THEN n_days END)
               OVER () AS BIGINT) AS int_days
      FROM g)
    SELECT zone, n_days, n_lines,
           CAST(n_lines * 1000 // n_days AS BIGINT) AS lines_per_day_milli,
           CAST(round(CAST(n_lines AS DOUBLE) * int_days
             / (CAST(n_days AS DOUBLE) * int_lines) * 1000, 0) AS BIGINT)
             AS vs_interior_milli
    FROM t ORDER BY zone
    """,
)
def horizon_edge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The partial-period trap, measured: daily line volume in the
    FIRST and LAST 30 days of the data horizon against the interior
    norm — an edge well below 1000 milli means that window is
    incomplete (orders in flight at snapshot time, ramp-up at genesis)
    and every trend fitted across it inherits a fake cliff. Run this
    before believing any first/last-period number in the time-series
    suite.

    Scale: one reduction to the daily table; the horizon bounds are a
    1-row broadcast; zones roll up to three rows and both ratios are
    bounded-table arithmetic.
    """
    li = load_table(spark, sf_dir, "lineitem")
    d = li.groupBy(F.col("l_shipdate").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    d = d.localCheckpoint()
    mx = d.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    c = d.crossJoin(F.broadcast(mx)).select(
        F.when(F.col("day") < F.date_add(F.col("lo"), 30), "head_30d")
        .when(F.col("day") > F.date_sub(F.col("hi"), 30), "tail_30d")
        .otherwise("interior")
        .alias("zone"),
        "n",
    )
    g = c.groupBy("zone").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("n").cast("bigint").alias("n_lines"),
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = g.select(
        "*",
        F.sum(F.when(F.col("zone") == "interior", F.col("n_lines")))
        .over(w_all)
        .cast("bigint")
        .alias("int_lines"),
        F.sum(F.when(F.col("zone") == "interior", F.col("n_days")))
        .over(w_all)
        .cast("bigint")
        .alias("int_days"),
    )
    return t.select(
        "zone",
        "n_days",
        "n_lines",
        F.expr("CAST(n_lines * 1000 DIV n_days AS BIGINT)").alias(
            "lines_per_day_milli"
        ),
        F.round(
            F.col("n_lines").cast("double")
            * F.col("int_days")
            / (F.col("n_days").cast("double") * F.col("int_lines"))
            * 1000,
            0,
        )
        .cast("bigint")
        .alias("vs_interior_milli"),
    ).orderBy("zone")


# ---------------------------------------------------------------------------
# Shuffle-partition advisor (size spark.sql.shuffle.partitions from data)
# ---------------------------------------------------------------------------

#: Target post-shuffle partition size (the 128 MB parquet-block rule of
#: thumb) and the fixed per-type width proxies used to estimate row
#: bytes without reading file footers (mirrorable in SQL).
_SPA_TARGET_BYTES = 128 * 1024 * 1024
_SPA_FIXED = {  # fixed-width column bytes: 8 per number/timestamp
    "orders": 8 * 4,      # orderkey, custkey, totalprice, orderdate
    "lineitem": 8 * 9,    # 3 keys + linenumber + 5 measures/date
    "events": 8 * 4,      # event_id, ts, user_id, value
    "documents": 8 * 2,   # doc_id, n_chars
}


@register(
    "shuffle_partition_advisor",
    oracle=f"""
    WITH b AS (
      SELECT 'orders' AS tbl,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM({_SPA_FIXED["orders"]}
               + strlen(o_orderstatus)
               + strlen(o_orderpriority)) AS BIGINT) AS est_bytes
      FROM orders
      UNION ALL
      SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
             CAST(SUM({_SPA_FIXED["lineitem"]}
               + strlen(l_returnflag)
               + strlen(l_linestatus)) AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'events', CAST(COUNT(*) AS BIGINT),
             CAST(SUM({_SPA_FIXED["events"]}
               + strlen(event_type)
               + strlen(COALESCE(props, ''))) AS BIGINT)
      FROM events
      UNION ALL
      SELECT 'documents', CAST(COUNT(*) AS BIGINT),
             CAST(SUM({_SPA_FIXED["documents"]}
               + strlen(COALESCE(text, ''))
               + strlen(lang) + strlen(source)) AS BIGINT)
      FROM documents)
    SELECT tbl, n_rows, est_bytes,
           CAST(est_bytes // n_rows AS BIGINT) AS est_row_bytes,
           CAST(greatest(1, (est_bytes + {_SPA_TARGET_BYTES} - 1)
             // {_SPA_TARGET_BYTES}) AS BIGINT) AS recommended_partitions
    FROM b ORDER BY tbl
    """,
)
def shuffle_partition_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sizing advisor for `spark.sql.shuffle.partitions` /
    `repartition()` per fact table: estimated UNCOMPRESSED row bytes
    (fixed 8-byte widths per numeric/timestamp column + exact string
    octet lengths), total bytes, and the partition count that puts
    ~{_SPA_TARGET_BYTES >> 20} MB in each post-shuffle partition — the
    number AQE coalesces TOWARD, and the explicit setting for engines
    without AQE. The companion of partition_skew_advisor (which finds
    the skewed KEYS; this sizes the COUNT).

    Exactness: string bytes are exact octet lengths, widths are fixed
    constants, the recommendation is an integer ceiling division —
    nothing estimated beyond the stated width proxy (the honest
    alternative to reading engine-private footer statistics).

    Scale: one narrow aggregate per table (4 scans, no joins); at
    100 TB this is the query you run once per snapshot and cache.
    """
    branches = []
    o = load_table(spark, sf_dir, "orders")
    branches.append(
        o.agg(
            F.lit("orders").alias("tbl"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(
                F.lit(_SPA_FIXED["orders"])
                + F.octet_length("o_orderstatus")
                + F.octet_length("o_orderpriority")
            )
            .cast("bigint")
            .alias("est_bytes"),
        )
    )
    li = load_table(spark, sf_dir, "lineitem")
    branches.append(
        li.agg(
            F.lit("lineitem").alias("tbl"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(
                F.lit(_SPA_FIXED["lineitem"])
                + F.octet_length("l_returnflag")
                + F.octet_length("l_linestatus")
            )
            .cast("bigint")
            .alias("est_bytes"),
        )
    )
    e = load_table(spark, sf_dir, "events")
    branches.append(
        e.agg(
            F.lit("events").alias("tbl"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(
                F.lit(_SPA_FIXED["events"])
                + F.octet_length("event_type")
                + F.octet_length(F.coalesce(F.col("props"), F.lit("")))
            )
            .cast("bigint")
            .alias("est_bytes"),
        )
    )
    d = load_table(spark, sf_dir, "documents")
    branches.append(
        d.agg(
            F.lit("documents").alias("tbl"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(
                F.lit(_SPA_FIXED["documents"])
                + F.octet_length(F.coalesce(F.col("text"), F.lit("")))
                + F.octet_length("lang")
                + F.octet_length("source")
            )
            .cast("bigint")
            .alias("est_bytes"),
        )
    )
    b = branches[0]
    for x in branches[1:]:
        b = b.unionAll(x)
    return b.select(
        "tbl",
        "n_rows",
        "est_bytes",
        F.expr("est_bytes DIV n_rows").alias("est_row_bytes"),
        F.greatest(
            F.lit(1).cast("bigint"),
            F.expr(
                f"(est_bytes + {_SPA_TARGET_BYTES - 1}) DIV {_SPA_TARGET_BYTES}"
            ),
        )
        .cast("bigint")
        .alias("recommended_partitions"),
    ).orderBy("tbl")


@register(
    "functional_dependency_audit",
    oracle="""
    WITH fd1 AS (
      SELECT 'l_orderkey->l_shipdate' AS fd,
             CAST(COUNT(*) AS BIGINT) AS n_lhs,
             CAST(SUM(d - 1) AS BIGINT) AS violations
      FROM (SELECT l_orderkey, COUNT(DISTINCT l_shipdate) AS d
            FROM lineitem GROUP BY 1) t),
    fd2 AS (
      SELECT 'l_partkey->unit_price' AS fd,
             CAST(COUNT(*) AS BIGINT) AS n_lhs,
             CAST(SUM(d - 1) AS BIGINT) AS violations
      FROM (SELECT l_partkey,
              COUNT(DISTINCT CAST(round(l_extendedprice * 100, 0)
                AS BIGINT) * 100
                // CAST(round(l_quantity, 0) AS BIGINT)) AS d
            FROM lineitem
            WHERE CAST(round(l_quantity, 0) AS BIGINT) >= 1
            GROUP BY 1) t),
    fd3 AS (
      SELECT 'p_partkey->p_brand' AS fd,
             CAST(COUNT(*) AS BIGINT) AS n_lhs,
             CAST(SUM(d - 1) AS BIGINT) AS violations
      FROM (SELECT p_partkey, COUNT(DISTINCT p_brand) AS d
            FROM part GROUP BY 1) t),
    fd4 AS (
      SELECT 'o_custkey->o_orderpriority' AS fd,
             CAST(COUNT(*) AS BIGINT) AS n_lhs,
             CAST(SUM(d - 1) AS BIGINT) AS violations
      FROM (SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS d
            FROM orders GROUP BY 1) t),
    u AS (
      SELECT * FROM fd1 UNION ALL SELECT * FROM fd2
      UNION ALL SELECT * FROM fd3 UNION ALL SELECT * FROM fd4)
    SELECT fd, n_lhs, violations,
           CASE WHEN violations = 0 THEN 1 ELSE 0 END AS holds
    FROM u ORDER BY fd
    """,
)
def functional_dependency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit over four candidate FDs the schema
    documentation IMPLIES but only the data can confirm: orders
    shipping on one date (violated — lines ship separately, by
    design), parts having one unit price (violated ~29× per part — the
    noisy-pricing finding behind the chain-drift and price-dispersion
    ops, here as a countable DQ fact), partkey→brand (holds exactly —
    safe to denormalize), and customers having a fixed priority
    (violated — priority is per-order). Violations = Σ(|distinct RHS|
    − 1) over LHS groups: 0 iff the FD holds, and the magnitude prices
    the denormalization risk.

    Exactness: pure integer distinct-counting; unit price is the
    floor-divided integer cents-per-unit (both engines integer-//).

    Scale: each FD is one exact groupBy-countDistinct reduction at its
    LHS grain — no joins, no windows; the four candidates scan three
    tables once each.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")

    def fd(name: str, df: DataFrame, lhs, rhs) -> DataFrame:
        g = df.groupBy(lhs.alias("lhs")).agg(
            F.countDistinct(rhs).cast("bigint").alias("d")
        )
        return g.agg(
            F.lit(name).alias("fd"),
            F.count(F.lit(1)).cast("bigint").alias("n_lhs"),
            F.sum(F.col("d") - 1).cast("bigint").alias("violations"),
        )

    unit_price = F.expr(
        "CAST(round(l_extendedprice * 100, 0) AS BIGINT) * 100"
        " DIV CAST(round(l_quantity, 0) AS BIGINT)"
    )
    parts = [
        fd("l_orderkey->l_shipdate", li, F.col("l_orderkey"), F.col("l_shipdate")),
        fd(
            "l_partkey->unit_price",
            li.filter(F.expr("CAST(round(l_quantity, 0) AS BIGINT) >= 1")),
            F.col("l_partkey"),
            unit_price,
        ),
        fd("p_partkey->p_brand", p, F.col("p_partkey"), F.col("p_brand")),
        fd(
            "o_custkey->o_orderpriority",
            o,
            F.col("o_custkey"),
            F.col("o_orderpriority"),
        ),
    ]
    u = parts[0]
    for more in parts[1:]:
        u = u.unionAll(more)
    return u.select(
        "fd",
        "n_lhs",
        "violations",
        F.when(F.col("violations") == 0, 1).otherwise(0).alias("holds"),
    ).orderBy("fd")
