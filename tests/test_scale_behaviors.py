"""Scale-behavior evidence: AQE skew-join splitting actually triggers on
a skewed key, and the sketch operators' estimates stay within their
documented error bounds vs exact answers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_etl_studio_spark.operators import load_all
from tests.conftest import SF_DIR

QUERIES, _ = load_all()


@pytest.fixture()
def aqe_skew_confs(spark):
    """Force sort-merge + hair-trigger skew thresholds, restore after."""
    keys = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(aqe_skew_confs):
    """One key owning ~90% of a fact table: AQE's skew-join rule must
    split that partition (the executed plan's sort-merge join is marked
    skew=true) and the join result must stay correct."""
    spark = aqe_skew_confs
    n = 200_000
    fact = spark.range(n).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        (F.col("id") % 97).alias("v"),
        # pad so the hot partition crosses the byte threshold
        F.repeat(F.lit("x"), 64).alias("pad"),
    )
    dim = spark.range(100).select(F.col("id").alias("k"), F.lit("d").alias("tag"))
    joined = fact.join(dim, "k").groupBy("tag").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("sum_v")
    )
    [row] = joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, plan[:2000]
    # correctness unaffected: every fact row with k < 100 joins once
    expected = fact.filter(F.col("k") < 100).count()
    assert row["n_rows"] == expected


def test_approx_distinct_within_documented_error(spark):
    """approx_count_distinct(rsd=0.02): each group's estimate lands
    within 3·rsd of the exact count it carries alongside."""
    rows = QUERIES["approx_distinct"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert abs(r.approx_customers - r.exact_customers) <= max(
            0.06 * r.exact_customers, 2
        )


def test_percentile_sketch_tracks_exact(spark):
    """Greenwald-Khanna quartiles stay within 1% relative error of the
    exact percentiles on the same groups."""
    sketch = {
        r.l_returnflag: (
            [r.price_q25, r.price_q50, r.price_q75, r.price_q95],
            r.qty_median,
        )
        for r in QUERIES["percentile_approx_sketch"](spark, SF_DIR).collect()
    }
    from ai_etl_studio_spark.catalog import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    exact = {
        r.l_returnflag: (list(r.q), r.m)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.95))"
            ).alias("q"),
            F.expr("percentile(l_quantity, 0.5)").alias("m"),
        )
        .collect()
    }
    assert set(sketch) == set(exact)
    for flag, (qs, med) in sketch.items():
        eqs, emed = exact[flag]
        for got, want in zip(qs, eqs):
            assert abs(got - want) <= 0.01 * abs(want) + 1e-9
        assert abs(med - emed) <= 0.01 * abs(emed) + 1e-9


def test_scalable_ntile_matches_window_ntile(spark):
    """The distributed NTILE (value-bucket ranks) must agree with
    WindowExec's single-partition NTILE row for row — the regression
    that caught the AQE-vs-spark_partition_id bug at sf0.1."""
    a = {
        r.o_custkey: (r.r_score, r.f_score, r.m_score)
        for r in QUERIES["ntile_rfm"](spark, SF_DIR).collect()
    }
    b = {
        r.o_custkey: (r.r_score, r.f_score, r.m_score)
        for r in QUERIES["ntile_rfm_scalable"](spark, SF_DIR).collect()
    }
    assert a == b


def test_bloom_prune_is_real_and_lossless(spark):
    """decontaminate_bloom's pre-filter must (a) actually shrink the
    corpus shingle stream and (b) never drop a true benchmark hit
    (Bloom guarantee: zero false negatives)."""
    from pyspark.sql import functions as F

    from ai_etl_studio_spark.operators.quality import (
        _decon_shingles,
        bloom_prune,
        decon_bloom_bitmap,
    )

    sh = _decon_shingles(spark, SF_DIR)
    bench = sh.filter(F.col("source") == "src0").select("h").distinct()
    cand = sh.filter(F.col("source") != "src0")
    pruned = bloom_prune(cand, decon_bloom_bitmap(bench))

    n_cand, n_pruned = cand.count(), pruned.count()
    assert n_pruned < n_cand * 0.2  # the prune does real work

    true_hits = cand.join(bench, "h", "left_semi")
    missed = true_hits.join(pruned, ["doc_id", "h"], "left_anti").count()
    assert missed == 0  # no false negatives


def test_misra_gries_candidates_are_superset(spark):
    """Pass-1 MG candidates must contain every true heavy hitter and
    stay bounded per partition, on an adversarially skewed stream."""
    from pyspark.sql import functions as F

    from ai_etl_studio_spark.operators.text import HH_COUNTERS, HH_K

    # 100k rows: token 'hot0'..'hot2' own ~60%, a 50k-wide tail owns the rest
    df = (
        spark.range(100_000)
        .select(
            F.when(F.col("id") % 10 < 6, F.concat(F.lit("hot"), (F.col("id") % 3)))
            .otherwise(F.concat(F.lit("t"), (F.col("id") % 50_000)))
            .alias("tok")
        )
        .repartition(8)
    )
    from ai_etl_studio_spark.operators import text as T

    # reuse the registered operator's inner MG by re-deriving it here:
    # run the same two-pass shape on this frame
    def mg(batches):
        import pandas as pd

        counters, n = {}, 0
        for pdf in batches:
            n += len(pdf)
            for tok, c in pdf["tok"].value_counts().items():
                counters[tok] = counters.get(tok, 0) + int(c)
            if len(counters) > HH_COUNTERS:
                m = sorted(counters.values())[len(counters) - HH_COUNTERS - 1]
                counters = {t: c - m for t, c in counters.items() if c > m}
        yield pd.DataFrame({"tok": list(counters), "n": [n] * len(counters)})

    p1 = df.mapInPandas(mg, "tok string, n long")
    per_part = p1.groupBy().count().collect()[0][0]
    assert per_part <= 8 * HH_COUNTERS  # bounded summary size
    cands = {r.tok for r in p1.select("tok").distinct().collect()}
    true_hh = {
        r.tok
        for r in df.groupBy("tok").count().filter(F.col("count") * HH_K > 100_000).collect()
    }
    assert true_hh  # non-vacuous: the hot tokens really are heavy
    assert true_hh <= cands
