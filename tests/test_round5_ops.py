"""Behavior tests for the round-5 statistical operators: pure-Python
replays on the real corpus (independent of the DuckDB twin, so a shared
misunderstanding of the statistic cannot pass both sides), plus
structural assertions where the synthetic data pins the answer."""

from __future__ import annotations

from collections import Counter, defaultdict

import pyspark.sql.functions as F

from tests.conftest import SF_DIR


def test_shapley_is_exact_and_efficient(spark):
    """Shapley axioms on the real output: efficiency (Σφ = v(N) − v(∅),
    and v(∅)=0 here since mask-0 sessions are excluded), and a replay
    of φ from the coalition table."""
    from ai_etl_studio_spark.operators.insights import (
        _SHAPLEY_CHANNELS,
        shapley_channel_attribution,
    )

    rows = {
        r["channel"]: r["phi24_ppm"]
        for r in shapley_channel_attribution(spark, SF_DIR).collect()
    }
    assert set(rows) == {ch for ch, _ in _SHAPLEY_CHANNELS}
    # rebuild v() from raw events with an independent sessionizer
    e = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user = defaultdict(list)
    for r in e:
        by_user[r.user_id].append(r)
    bit = dict(_SHAPLEY_CHANNELS)
    cells = Counter()
    conv = Counter()
    for rs in by_user.values():
        rs.sort(key=lambda r: (r.ts, r.event_id))
        prev = None
        groups = []
        for r in rs:
            if prev is None or (r.ts - prev).total_seconds() > 1800:
                groups.append([])
            groups[-1].append(r)
            prev = r.ts
        for g in groups:
            mask = 0
            c = 0
            for r in g:
                if r.event_type == "purchase":
                    c = 1
                else:
                    mask |= bit[r.event_type]
            if mask > 0:
                cells[mask] += 1
                conv[mask] += c
    r_ppm = {m: conv[m] * 1_000_000 // cells[m] for m in cells}
    v = {
        s: sum(r for m, r in r_ppm.items() if m & s == m)
        for s in range(16)
    }
    w24 = {0: 6, 1: 2, 2: 2, 3: 6}
    for ch, b in _SHAPLEY_CHANNELS:
        phi = sum(
            w24[bin(s).count("1")] * (v[s | b] - v[s])
            for s in range(16)
            if not s & b
        )
        assert rows[ch] == phi, ch
    # efficiency: Σ over all 4 channels of (unscaled) φ = v(full) − v(∅);
    # with the ×24 scaling: Σφ24 = 24·v(15)
    assert sum(rows.values()) == 24 * v[15]


def test_kruskal_wallis_replay(spark):
    """H replayed with textbook midranks over the raw joined data."""
    from ai_etl_studio_spark.operators.drift import (
        kruskal_wallis_delay_by_priority,
    )

    got = kruskal_wallis_delay_by_priority(spark, SF_DIR).collect()[0]
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_shipdate"
    )
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    rows = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "o_orderpriority",
            F.datediff(
                F.col("l_shipdate").cast("date"),
                F.col("o_orderdate").cast("date"),
            ).alias("v"),
        )
        .collect()
    )
    vals = sorted(r.v for r in rows)
    cnt = Counter(vals)
    cum = 0
    mid = {}
    for v in sorted(cnt):
        mid[v] = cum + (cnt[v] + 1) / 2
        cum += cnt[v]
    n = len(vals)
    groups = defaultdict(list)
    for r in rows:
        groups[r.o_orderpriority].append(mid[r.v])
    h = 12 / (n * (n + 1)) * sum(
        sum(g) ** 2 / len(g) for g in groups.values()
    ) - 3 * (n + 1)
    assert abs(got["h_micro"] / 1e6 - h) < 1e-3
    t3 = sum(c**3 - c for c in cnt.values())
    h_corr = h / (1 - t3 / (n**3 - n))
    assert abs(got["h_tie_corrected_micro"] / 1e6 - h_corr) < 1e-3
    assert got["n"] == n


def test_mcnemar_replay(spark):
    from ai_etl_studio_spark.operators import load_all

    queries, _ = load_all()  # quality.py needs dedup.py's oracles loaded
    got = queries["mcnemar_quality_gates"](spark, SF_DIR).collect()[0]
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("text").collect()
    cells = Counter()
    for r in docs:
        if r.text is None:
            continue
        ts = [t for t in r.text.lower().split() if t]
        if not ts:
            continue
        a = int(len(ts) >= 40)
        b = int(100 * len(set(ts)) >= 55 * len(ts))
        cells[(a, b)] += 1
    assert (got["n00"], got["n01"], got["n10"], got["n11"]) == (
        cells[(0, 0)],
        cells[(0, 1)],
        cells[(1, 0)],
        cells[(1, 1)],
    )
    chi2 = (abs(cells[(0, 1)] - cells[(1, 0)]) - 1) ** 2 / (
        cells[(0, 1)] + cells[(1, 0)]
    )
    assert abs(got["chi2_micro"] / 1e6 - chi2) < 1e-3


def test_theil_decomposition_structure(spark):
    """Decomposition identity + non-negativity (Jensen) on real data."""
    from ai_etl_studio_spark.operators.analytics import (
        theil_decomposition_by_nation,
    )

    r = theil_decomposition_by_nation(spark, SF_DIR).collect()[0]
    assert (
        r["theil_total_micro"]
        - r["theil_between_micro"]
        - r["theil_within_micro"]
    ) in (0, 1)  # floor-division of the two tick sums can split a unit
    assert r["theil_total_micro"] > 0
    assert 0 <= r["theil_between_micro"] <= r["theil_total_micro"]


def test_auc_bounds_and_replay(spark):
    from ai_etl_studio_spark.operators import load_all

    queries, _ = load_all()  # quality.py needs dedup.py's oracles loaded
    r = queries["quality_score_auc"](spark, SF_DIR).collect()[0]
    assert 0 <= r["auc_micro"] <= 1_000_000
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("text").collect()
    from ai_etl_studio_spark.operators.text import STOPWORDS

    pts = []
    for row in docs:
        if row.text is None:
            continue
        ts = [t for t in row.text.lower().split() if t]
        if not ts:
            continue
        score = sum(t in STOPWORDS for t in ts) * 1_000_000 // len(ts)
        y = int(100 * len(set(ts)) >= 55 * len(ts))
        pts.append((score, y))
    pos = [s for s, y in pts if y == 1]
    neg = [s for s, y in pts if y == 0]
    # exact AUC by pair counting (ties count half)
    wins = sum(
        (p > q) + 0.5 * (p == q) for p in pos for q in neg
    )
    auc = wins / (len(pos) * len(neg))
    assert abs(r["auc_micro"] / 1e6 - auc) < 2e-6
    assert (r["n_pos"], r["n_neg"]) == (len(pos), len(neg))


def test_weibull_shape_near_one_for_memoryless_gaps(spark):
    """The synthetic reorder process is near-Poisson: the fitted shape
    must sit in a loose band around 1 (structure, not direction)."""
    from ai_etl_studio_spark.operators.analytics import weibull_shape_reorder

    r = weibull_shape_reorder(spark, SF_DIR).collect()[0]
    assert 600_000 <= r["shape_micro"] <= 1_400_000
    assert r["n_gaps"] > 0 and r["n_points"] > 0


def test_ivfpq_and_int8_recall_floors(spark):
    """The refined hybrid and the int8 path must both keep recall@10
    above a floor on this corpus (regression tripwire for the refine
    factor and the quantizer)."""
    from ai_etl_studio_spark.operators.similarity import (
        ann_ivfpq_recall_eval,
        int8_recall_eval,
    )

    for r in ann_ivfpq_recall_eval(spark, SF_DIR).collect():
        assert r["recall_micro"] >= 700_000, r
    for r in int8_recall_eval(spark, SF_DIR).collect():
        assert r["recall_micro"] >= 700_000, r
