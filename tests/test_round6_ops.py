"""Behavior tests for the round-6 fixes: pure-Python replays on the
real corpus, independent of the DuckDB twins — the r5 ADVICE findings
were cases where BOTH engines mirrored the same wrong arithmetic and
the hash gate could not catch it, so these replays pin the intended
SEMANTICS, not just cross-engine agreement."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

from tests.conftest import SF_DIR


def test_substring_coverage_is_exact_window_union(spark):
    """Replay substring_dup_share_by_source's covered-token count as a
    literal interval union over the duplicated windows (set-of-positions
    — no fold, no lag arithmetic). The r5 fold added a full W per new
    island and double-counted islands whose windows overlap (gap in
    2..W−1); the union replay rejects that and also enforces
    coverage_ppm ≤ 1,000,000 by construction."""
    from ai_etl_studio_spark.operators.dedup import (
        SUBSTR_DF,
        SUBSTR_W,
        substring_dup_share_by_source,
    )

    got = {
        r["source"]: (r["n_docs"], r["total_tokens"], r["covered_tokens"],
                      r["coverage_ppm"])
        for r in substring_dup_share_by_source(spark, SF_DIR).collect()
    }
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "source", "text")
        .collect()
    )
    toks = {}
    for r in docs:
        if r.text is None:
            continue
        ts = [t for t in re.split(r"\s+", r.text.lower()) if t]
        if len(ts) >= SUBSTR_W:
            toks[r.doc_id] = (r.source, ts)
    winsets = defaultdict(set)  # window text -> docs containing it
    for doc_id, (_, ts) in toks.items():
        for i in range(len(ts) - SUBSTR_W + 1):
            winsets[" ".join(ts[i : i + SUBSTR_W])].add(doc_id)
    per_source = defaultdict(lambda: [0, 0, 0])  # n_docs, total, covered
    for doc_id, (source, ts) in toks.items():
        covered_positions: set[int] = set()
        for i in range(len(ts) - SUBSTR_W + 1):
            if len(winsets[" ".join(ts[i : i + SUBSTR_W])]) >= SUBSTR_DF:
                covered_positions.update(range(i, i + SUBSTR_W))
        agg = per_source[source]
        agg[0] += 1
        agg[1] += len(ts)
        agg[2] += len(covered_positions)
    assert set(got) == set(per_source)
    for source, (n_docs, total, covered) in per_source.items():
        g = got[source]
        assert g[0] == n_docs
        assert g[1] == total
        assert g[2] == covered, (
            f"{source}: operator covered_tokens {g[2]} != exact window "
            f"union {covered}"
        )
        assert g[3] == covered * 1_000_000 // total
        assert g[3] <= 1_000_000


def test_exp_gof_ks_d_takes_both_branches(spark):
    """Replay the KS statistic against the fitted exponential with an
    explicit two-branch sup: D⁺ at each jump top AND D⁻ just below it.
    The r5 operator evaluated only D⁺ and was biased low by up to the
    largest jump mass (both engines mirrored it)."""
    from ai_etl_studio_spark.operators.drift import exp_gof_interarrival

    row = exp_gof_interarrival(spark, SF_DIR).collect()[0]
    e = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", "ts", "event_id")
        .collect()
    )
    by_user = defaultdict(list)
    for r in e:
        by_user[r.user_id].append((r.ts, r.event_id))
    gaps = []
    for evts in by_user.values():
        evts.sort()
        for (t0, _), (t1, _) in zip(evts, evts[1:]):
            td = t1 - t0
            gap = (td.days * 86_400 + td.seconds) * 1_000_000 + td.microseconds
            if gap > 0:
                gaps.append(gap)
    n, sum_gap = len(gaps), sum(gaps)
    assert (row["n"], row["sum_gap"]) == (n, sum_gap)
    lam = n / sum_gap
    counts = sorted(Counter(gaps).items())
    cum, d_micro = 0, 0
    for gap, c in counts:
        f = 1 - math.exp(-lam * gap)
        d_plus = round(abs((cum + c) / n - f) * 1_000_000)
        d_minus = round(abs(f - cum / n) * 1_000_000)
        d_micro = max(d_micro, d_plus, d_minus)
        cum += c
    assert row["ks_d_micro"] == d_micro


def test_histogram_bin_advisor_degenerate_iqr_is_null(spark):
    """A measure whose exact IQR is 0 must report NULL fd_width/fd_bins
    — not Long.MAX from Spark's saturating +Inf cast (and not a DuckDB
    CAST(inf AS BIGINT) error killing the oracle run). Proven on a
    constant column routed through the same expressions."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    # replicate the operator's qs -> advisor expressions on a constant
    # measure (q1 == q3) — the guard must yield NULLs
    df = spark.createDataFrame([(i, 42) for i in range(100)], "i int, v int")
    g = df.groupBy("v").agg(F.count("*").alias("c"))
    qs = g.agg(
        F.lit(100).alias("n"),
        F.min("v").alias("q1"),
        F.min("v").alias("q3"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )
    fd_width_d = (
        F.lit(2.0)
        * (F.col("q3") - F.col("q1"))
        / F.pow(F.col("n").cast("double"), F.lit(1.0 / 3))
    )
    out = qs.select(
        F.when(
            F.col("q3") > F.col("q1"), F.round(fd_width_d, 0).cast("bigint")
        ).alias("fd_width"),
        F.when(
            F.col("q3") > F.col("q1"),
            F.ceil(
                (F.col("hi") - F.col("lo")).cast("double") / fd_width_d
            ).cast("bigint"),
        ).alias("fd_bins"),
    ).collect()[0]
    assert out["fd_width"] is None and out["fd_bins"] is None
    # and the real operator still produces non-degenerate advice
    from ai_etl_studio_spark.operators.analytics import histogram_bin_advisor

    rows = histogram_bin_advisor(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["fd_bins"] is None or 0 < r["fd_bins"] < 2**40


def test_quadratic_audit_samples_are_hard_capped(spark):
    """The three r5 perf-weak evals must bound their quadratic stage
    with the MOD **and** hard-id-cap predicate (a bare MOD fraction is
    corpus-proportional: (N/MOD)² pairs). Checked structurally: the
    cap literal must appear in both the registered oracle text and the
    operator's pushed filters."""
    from ai_etl_studio_spark.operators import load_all
    from ai_etl_studio_spark.operators.dedup import _BQ_CAP
    from ai_etl_studio_spark.operators.similarity import _ID_SAMPLE_CAP

    queries, oracles = load_all()
    for name, cap, col in (
        ("pairwise_distance_histogram", _ID_SAMPLE_CAP, "vec_id"),
        ("label_pair_similarity_split", _ID_SAMPLE_CAP, "vec_id"),
        ("blocking_quality_eval", _BQ_CAP, "p_partkey"),
    ):
        assert f"{col} < {cap}" in oracles[name], f"{name} oracle lost the cap"
    for name, cap in (
        ("label_pair_similarity_split", _ID_SAMPLE_CAP),
        ("blocking_quality_eval", _BQ_CAP),
    ):
        plan = (
            queries[name](spark, SF_DIR)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert str(cap) in plan, f"{name} physical plan lost the id cap"
    # pairwise_distance_histogram checkpoints its bounded sample, so
    # the cap filter runs BEFORE the visible plan (it scans the
    # checkpoint RDD) — pin the cap at the source level instead
    import inspect

    from ai_etl_studio_spark.operators.similarity import (
        pairwise_distance_histogram,
    )

    src = inspect.getsource(pairwise_distance_histogram)
    assert "_ID_SAMPLE_CAP" in src
