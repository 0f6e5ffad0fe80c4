"""Behavior tests for the insight/sketch/PQ operators — semantic
properties beyond oracle parity: Markov rows sum to 1, the Welch z
matches a NumPy replay, triangle counts match brute force, CMS
estimates are one-sided, PQ recall beats chance by a wide margin."""

from __future__ import annotations

import itertools

import pytest

from ai_etl_studio_spark.operators import load_all

QUERIES, ORACLES = load_all()
SF_DIR = "/root/testdata/sf0.001"


def _round_half_up(x: float) -> int:
    """Spark/DuckDB round() semantics (half away from zero); Python's
    built-in round is banker's and diverges on exact .5 ties."""
    import math

    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_path_transitions_rows_are_distributions(spark):
    rows = QUERIES["path_transitions"](spark, SF_DIR).collect()
    assert rows
    by_src: dict[str, float] = {}
    for r in rows:
        assert r.n > 0 and 0.0 < r.prob <= 1.0
        by_src[r.src] = by_src.get(r.src, 0.0) + r.prob
    for src, total in by_src.items():
        assert total == pytest.approx(1.0, abs=1e-12), src


def test_ab_test_ztest_matches_numpy_replay(spark):
    import numpy as np

    [r] = QUERIES["ab_test_ztest"](spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    cents = {0: [], 1: []}
    for e in ev:
        if e.event_type == "purchase":
            cents[e.user_id % 2].append(round(e.value * 100))
    a = np.array(cents[0], dtype=np.float64)
    b = np.array(cents[1], dtype=np.float64)
    assert r.n_a == len(a) and r.n_b == len(b)
    assert r.mean_a_cents == pytest.approx(a.mean(), rel=1e-12)
    z = (a.mean() - b.mean()) / np.sqrt(
        a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
    )
    assert r.z == pytest.approx(float(z), rel=1e-9)
    assert r.significant == int(abs(z) > 1.96)


def test_seasonal_naive_mape_shape(spark):
    rows = QUERIES["seasonal_naive_mape"](spark, SF_DIR).collect()
    assert {r.weekday for r in rows} <= set(range(1, 8))
    assert all(r.mape_ticks >= 0 and r.n_days > 0 for r in rows)


def test_triangle_count_matches_bruteforce(spark):
    from ai_etl_studio_spark.operators.insights import _TRI_MOD

    [r] = QUERIES["triangle_count"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    by_order: dict[int, set[int]] = {}
    for row in li:
        if row.l_partkey % _TRI_MOD == 0:
            by_order.setdefault(row.l_orderkey, set()).add(row.l_partkey)
    edges = set()
    for parts in by_order.values():
        for u, v in itertools.combinations(sorted(parts), 2):
            edges.add((u, v))
    nodes = {n for e in edges for n in e}
    tri = sum(
        1
        for (u, v), w in itertools.product(edges, nodes)
        if w > v and (v, w) in edges and (u, w) in edges
    )
    assert (r.n_triangles, r.n_nodes, r.n_edges) == (tri, len(nodes), len(edges))


def test_countmin_estimates_are_one_sided(spark):
    rows = QUERIES["countmin_heavy_hitters"](spark, SF_DIR).collect()
    assert rows
    # CMS guarantee: never under-counts
    assert all(r.est_cnt >= r.true_cnt for r in rows)
    # the true heaviest token must rank first on estimates too (its
    # estimate >= its true count >= every other true count)
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    from collections import Counter

    c = Counter(t for row in d for t in row.text.lower().split() if t)
    top_true, _ = c.most_common(1)[0]
    assert rows[0].true_cnt == c[rows[0].tok]
    assert max(r.true_cnt for r in rows) == c[top_true]


def test_pq_recall_beats_chance(spark):
    import numpy as np

    from ai_etl_studio_spark.operators.similarity import (
        PQ_QUERIES,
        PQ_TOPK,
    )

    out = QUERIES["ann_pq_topk"](spark, SF_DIR).collect()
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }
    n = len(emb)
    hits = total = 0
    for q in range(PQ_QUERIES):
        qv = emb[q]
        d2 = sorted(
            (float(np.sum((qv - v) ** 2)), vid)
            for vid, v in emb.items()
            if vid != q
        )
        exact = {vid for _, vid in d2[:PQ_TOPK]}
        got = {r.neighbor_id for r in out if r.query_id == q}
        assert len(got) == PQ_TOPK
        hits += len(exact & got)
        total += PQ_TOPK
    recall = hits / total
    # chance recall would be PQ_TOPK/(n-1) ≈ 0.02; the untrained-codebook
    # PQ reaches ~0.34 here — assert an order of magnitude over chance
    # plus an absolute floor with headroom under the observed value
    assert recall >= 0.25, recall
    assert recall > 10 * PQ_TOPK / n


def test_trend_forecast_is_linear_extension(spark):
    rows = QUERIES["trend_forecast_linreg"](spark, SF_DIR).collect()
    assert [r.day_index for r in rows] == list(range(366, 373))
    slope, intercept = rows[0].slope, rows[0].intercept
    for r in rows:
        assert r.forecast_cents == pytest.approx(
            intercept + slope * r.day_index, rel=1e-12
        )
        assert r.slope == slope and r.intercept == intercept


def test_join_cardinality_probe_is_close(spark):
    [r] = QUERIES["join_cardinality_probe"](spark, SF_DIR).collect()
    assert r.actual > 0 and r.estimated > 0
    # key-stratified sampling at 1/20 should land well within 2x
    assert r.rel_err < 1.0
    assert r.rel_err == pytest.approx(
        abs(r.estimated - r.actual) / r.actual, rel=1e-12
    )


def test_ngram_novelty_first_doc_is_fully_novel(spark):
    rows = QUERIES["ngram_novelty_rate"](spark, SF_DIR).collect()
    assert rows[0].doc_id == min(r.doc_id for r in rows)
    # the earliest document can only contain never-seen-before 8-grams
    assert rows[0].novelty == 1.0
    assert all(0.0 <= r.novelty <= 1.0 for r in rows)
    # near-duplicate seeding guarantees some non-novel docs exist
    assert any(r.novelty < 1.0 for r in rows)


def test_contamination_fraction_bounds_and_subset(spark):
    frac = QUERIES["contamination_fraction"](spark, SF_DIR).collect()
    assert frac  # seeded cross-source duplicates contaminate someone
    assert all(0.0 < r.contamination <= 1.0 for r in frac)
    assert all(r.source != "src0" for r in frac)
    # every binary-flagged contaminated count matches the graded op's
    # per-source doc counts
    binary = QUERIES["decontaminate_ngrams"](spark, SF_DIR).collect()
    flagged = {r.source: r.n_contaminated for r in binary}
    from collections import Counter

    graded = Counter(r.source for r in frac)
    for src, n in flagged.items():
        assert graded.get(src, 0) == n, src


def test_tpch_q3_q5_shapes(spark):
    q3 = QUERIES["tpch_q3"](spark, SF_DIR).collect()
    assert 0 < len(q3) <= 10
    revs = [r.revenue for r in q3]
    assert revs == sorted(revs, reverse=True)
    q5 = QUERIES["tpch_q5"](spark, SF_DIR).collect()
    assert len(q5) > 0 and all(r.revenue > 0 for r in q5)


def test_mad_outliers_robustness_vs_zscore(spark):
    rows = QUERIES["mad_outliers"](spark, SF_DIR).collect()
    assert rows and all(r.mad_cents >= 0 and r.n > 0 for r in rows)
    # replay one group in pure python
    import statistics

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    for want in rows[:2]:
        cents = [round(e.value * 100) for e in ev if e.event_type == want.event_type]
        med = statistics.median(cents)
        adev = [abs(c - med) for c in cents]
        mad = statistics.median(adev)
        assert want.med_cents == med and want.mad_cents == mad
        n_out = sum(1 for a in adev if a > 3.5 * (1.4826 * mad))
        assert want.n_outliers == n_out


def test_crosslingual_pairs_langs_differ(spark):
    rows = QUERIES["crosslingual_pairs"](spark, SF_DIR).collect()
    assert rows  # seeded near-dups cross language tags
    assert all(r.lang_1 != r.lang_2 for r in rows)
    # subset of the full LSH candidate set
    full = {
        (r.doc_id_1, r.doc_id_2)
        for r in QUERIES["dedup_minhash_lsh_pairs"](spark, SF_DIR).collect()
    }
    assert {(r.doc_id_1, r.doc_id_2) for r in rows} <= full


def test_crosslingual_pairs_uses_capped_candidates(spark):
    """r4 fix (VERDICT r3 item 3): candidates come from the hot-bucket-
    capped band join, so a boilerplate bucket can never explode the pair
    count — the crosslingual set must equal (capped pairs ⋈ langs,
    lang_1 ≠ lang_2), and the lang map must ride a hint-free join."""
    from ai_etl_studio_spark.plans.tripwire import broadcast_violations

    df = QUERIES["crosslingual_pairs"](spark, SF_DIR)
    assert broadcast_violations(df) == []  # no forced corpus broadcast
    capped = {
        (r.doc_id_1, r.doc_id_2)
        for r in QUERIES["dedup_minhash_lsh_pairs_capped"](spark, SF_DIR).collect()
    }
    got = {(r.doc_id_1, r.doc_id_2) for r in df.collect()}
    assert got <= capped
    # exactly the cross-language subset of the capped candidates
    langs = {
        r.doc_id: r.lang
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "lang").collect()
    }
    want = {(a, b) for a, b in capped if langs[a] != langs[b]}
    assert got == want


def test_time_to_convert_stats_replay(spark):
    [r] = QUERIES["time_to_convert"](spark, SF_DIR).collect()
    import statistics

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    clicks = [(e.user_id, e.event_id, e.ts) for e in ev if e.event_type == "click"]
    purch = [(e.user_id, e.ts) for e in ev if e.event_type == "purchase"]
    gaps = []
    for u, _cid, cts in clicks:
        cands = [
            (pts - cts).total_seconds()
            for pu, pts in purch
            if pu == u and pts >= cts and (pts - cts).total_seconds() <= 1800
        ]
        if cands:
            gaps.append(int(min(cands)))
    assert r.n_converting_clicks == len(gaps)
    assert r.min_gap_s == min(gaps) and r.max_gap_s == max(gaps)
    assert r.med_gap_s == statistics.median(gaps)


def test_window_rolling_corr_bounds(spark):
    rows = QUERIES["window_rolling_corr"](spark, SF_DIR).collect()
    assert rows
    assert all(-1.0 - 1e-9 <= r.corr_rev_cnt <= 1.0 + 1e-9 for r in rows)
    assert all(r.n >= 10 for r in rows)
    # replay one window in pure python
    import numpy as np

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    from collections import defaultdict

    cents, cnt = defaultdict(int), defaultdict(int)
    for o in orders:
        d = o.o_orderdate.date()
        cents[d] += round(o.o_totalprice * 100)
        cnt[d] += 1
    # the operator correlates in hundred-dollar units (cents DIV 10000)
    rev = {d: c // 10000 for d, c in cents.items()}
    probe = rows[len(rows) // 2]
    lo = probe.d - __import__("datetime").timedelta(days=29)
    xs = [rev[d] for d in rev if lo <= d <= probe.d]
    ys = [cnt[d] for d in rev if lo <= d <= probe.d]
    want = float(np.corrcoef(xs, ys)[0, 1])
    assert probe.corr_rev_cnt == pytest.approx(want, rel=1e-9)


def test_geo_grid_join_matches_bruteforce(spark):
    """Grid-bucketed candidate generation loses no pairs: vectorized
    brute-force haversine over all same-nation pairs equals the
    operator's counts. Run at sf0.01 (sf0.001 has no close pairs) —
    this is the RECALL check the oracle cannot provide, since the
    oracle shares the grid (a too-narrow lon cell would match the
    oracle and still drop far-north pairs)."""
    import hashlib

    import numpy as np

    sf = "/root/testdata/sf0.01"
    rows = {
        r.n_name: r.n_close_pairs
        for r in QUERIES["geo_grid_join"](spark, sf).collect()
    }
    cust = spark.read.parquet(f"{sf}/customer.parquet").collect()
    nations = {
        r.n_nationkey: r.n_name
        for r in spark.read.parquet(f"{sf}/nation.parquet").collect()
    }

    def h32(t: str) -> int:
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16)

    from collections import Counter, defaultdict

    by_nat = defaultdict(list)
    for c in cust:
        by_nat[c.c_nationkey].append(
            (
                -60.0 + (h32(str(c.c_custkey)) % 12000) / 100.0,
                -180.0 + (h32("lon:" + str(c.c_custkey)) % 36000) / 100.0,
            )
        )
    want: Counter = Counter()
    for nat, pts in by_nat.items():
        lat = np.radians(np.array([p[0] for p in pts]))
        lon = np.radians(np.array([p[1] for p in pts]))
        dlat = (lat[:, None] - lat[None, :]) / 2
        dlon = (lon[:, None] - lon[None, :]) / 2
        a = (
            np.sin(dlat) ** 2
            + np.cos(lat[:, None]) * np.cos(lat[None, :]) * np.sin(dlon) ** 2
        )
        d = 2 * 6371.0 * np.arcsin(np.sqrt(a))
        n_close = int((np.triu(d <= 500.0, k=1)).sum())
        if n_close:
            want[nations[nat]] += n_close
    assert rows == dict(want)
    assert sum(want.values()) > 0


def test_geo_grid_join_antimeridian_pair(spark, tmp_path):
    """r4 fix (ADVICE r3): the longitude grid wraps modulo the cell
    count, so a pair straddling ±180° is a candidate. Custkeys 164716
    and 283426 hash to (45.79, -179.98) and (45.77, +179.99) — 3.2 km
    apart across the antimeridian; before the wrap their cells were
    cy=-18 vs +17 (non-adjacent) and the pair was silently dropped."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([164716, 283426], pa.int64()),
                "c_name": ["west-of-line", "east-of-line"],
                "c_nationkey": pa.array([0, 0], pa.int32()),
                "c_acctbal": [1.0, 2.0],
                "c_mktsegment": ["BUILDING", "BUILDING"],
            }
        ),
        f"{d}/customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([0], pa.int32()),
                "n_name": ["MERIDIANIA"],
                "n_regionkey": pa.array([0], pa.int32()),
            }
        ),
        f"{d}/nation.parquet",
    )
    rows = QUERIES["geo_grid_join"](spark, d).collect()
    assert [(r.n_name, r.n_close_pairs) for r in rows] == [("MERIDIANIA", 1)]
    # the oracle twin wraps identically
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW customer AS SELECT * FROM '{d}/customer.parquet'")
    con.execute(f"CREATE VIEW nation AS SELECT * FROM '{d}/nation.parquet'")
    assert con.execute(ORACLES["geo_grid_join"]).fetchall() == [("MERIDIANIA", 1)]


def test_skyline_pareto_matches_bruteforce(spark):
    rows = QUERIES["skyline_pareto"](spark, SF_DIR).collect()
    assert rows
    parts = [
        (p.p_partkey, round(p.p_retailprice * 100), p.p_size)
        for p in spark.read.parquet(f"{SF_DIR}/part.parquet").collect()
    ]
    def dominated(a):
        return any(
            b[1] <= a[1] and b[2] >= a[2] and (b[1] < a[1] or b[2] > a[2])
            for b in parts
        )
    want = {k for k, pc, sz in parts if not dominated((k, pc, sz))}
    assert {r.p_partkey for r in rows} == want
    # frontier property: sorted by price, sizes strictly... non-dominated
    # means along increasing price the max size seen so far never reaches
    # a later point's size
    best = -1
    for r in sorted(rows, key=lambda r: (r.price_cents, -r.p_size)):
        assert r.p_size > best or (r.p_size == best and True)
        best = max(best, r.p_size)


def test_chi_square_matches_numpy_replay(spark):
    import numpy as np

    from ai_etl_studio_spark.operators.insights import _CHI2_TICK

    [r] = QUERIES["chi_square_independence"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    from collections import Counter

    obs = Counter((d.lang, d.source) for d in docs)
    langs = sorted({k[0] for k in obs})
    srcs = sorted({k[1] for k in obs})
    o = np.array([[obs.get((l, s), 0) for s in srcs] for l in langs], float)
    n = o.sum()
    e = o.sum(1)[:, None] * o.sum(0)[None, :] / n
    chi2 = ((o - e) ** 2 / e).sum()
    assert r.dof == (len(langs) - 1) * (len(srcs) - 1)
    assert r.n == int(n)
    # tick-quantized engine value within one tick per cell of the float
    assert abs(r.chi2_ticks / _CHI2_TICK - chi2) < len(langs) * len(srcs) / _CHI2_TICK * 2


def test_pq_append_delta_is_exact_and_merged(spark):
    import numpy as np

    from ai_etl_studio_spark.operators.similarity import (
        _PQ_DELTA_MOD,
        _PQ_DELTA_RESIDUE,
        _PQ_SCALE,
        PQ_TOPK,
    )

    rows = QUERIES["ann_pq_append_topk"](spark, SF_DIR).collect()
    emb = {
        r.vec_id: np.round(np.array(r.embedding, np.float64) * _PQ_SCALE)
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        assert len(rs) == PQ_TOPK
        assert [r.rn for r in sorted(rs, key=lambda r: r.rn)] == list(
            range(1, PQ_TOPK + 1)
        )
        for r in rs:
            in_delta = r.neighbor_id % _PQ_DELTA_MOD == _PQ_DELTA_RESIDUE
            assert bool(r.is_delta) == in_delta
            if in_delta:  # delta side must be the EXACT int64 distance
                d = emb[q] - emb[r.neighbor_id]
                assert r.d2 == int((d * d).sum())
    # ranking is deterministic: re-running yields identical rows
    again = QUERIES["ann_pq_append_topk"](spark, SF_DIR).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_time_weighted_avg_replay(spark):
    rows = QUERIES["time_weighted_avg"](spark, SF_DIR).collect()
    assert rows and all(r.n_intervals >= 5 for r in rows)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    from collections import defaultdict

    by_u = defaultdict(list)
    for e in ev:
        by_u[e.user_id].append((e.ts, e.event_id, round(e.value * 100)))
    probe = rows[len(rows) // 2]
    seq = sorted(by_u[probe.user_id])
    num = den = 0
    for (t0, _, c), (t1, _, _) in zip(seq, seq[1:]):
        w = int((t1 - t0).total_seconds() * 1_000_000)
        num += c * w
        den += w
    assert probe.n_intervals == len(seq) - 1
    assert probe.held_us == den
    assert probe.twap_cents == pytest.approx(num / den, rel=1e-12)


def test_attribution_conserves_conversions_and_revenue(spark):
    rows = QUERIES["attribution_last_touch"](spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    purchases = [e for e in ev if e.event_type == "purchase"]
    # conservation: every purchase is attributed exactly once
    assert sum(r.n_conversions for r in rows) == len(purchases)
    assert sum(r.revenue_cents for r in rows) == sum(
        round(p.value * 100) for p in purchases
    )
    channels = {r.channel for r in rows}
    assert channels <= {"click", "view", "direct"}
    # replay one purchase end to end
    from ai_etl_studio_spark.operators.insights import (
        _ATTR_LOOKBACK_US,
        _ATTR_TOUCHES,
    )

    p = sorted(purchases, key=lambda e: (e.ts, e.event_id))[len(purchases) // 2]
    touches = [
        t
        for t in ev
        if t.event_type in _ATTR_TOUCHES
        and t.user_id == p.user_id
        and t.ts <= p.ts
        and (p.ts - t.ts).total_seconds() * 1e6 <= _ATTR_LOOKBACK_US
    ]
    want = (
        max(touches, key=lambda t: (t.ts, t.event_id)).event_type
        if touches
        else "direct"
    )
    got = {r.channel: r for r in rows}
    assert want in got  # the replayed channel exists in the rollup


def test_survival_km_invariants_and_replay(spark):
    import math

    from ai_etl_studio_spark.operators.insights import (
        _KM_TICK,
        _KM_ZERO_TICKS,
    )

    rows = QUERIES["survival_km"](spark, SF_DIR).collect()
    assert rows
    by_c = {}
    for r in rows:
        by_c.setdefault(r.cohort, []).append(r)
    for cohort, rs in by_c.items():
        rs = sorted(rs, key=lambda r: r.day)
        # at-risk is the walking balance: monotone decreasing by d+c
        for a, b in zip(rs, rs[1:]):
            assert b.n_at_risk == a.n_at_risk - a.n_events - a.n_censored
        # ln-survival is non-increasing, 0 at most
        lns = [r.ln_surv_ticks for r in rs]
        assert all(x <= 0 for x in lns)
        assert lns == sorted(lns, reverse=True)
        # replay the curve
        cum = 0
        for r in rs:
            if r.n_events == 0:
                step = 0
            elif r.n_events < r.n_at_risk:
                step = round(
                    math.log(1.0 - r.n_events / r.n_at_risk) * _KM_TICK
                )
            else:
                step = _KM_ZERO_TICKS
            cum += step
            assert r.ln_surv_ticks == cum


def test_freshness_audit_shape(spark):
    rows = QUERIES["freshness_audit"](spark, SF_DIR).collect()
    streams = {r.stream for r in rows}
    assert streams == {"click", "view", "purchase", "signup", "error"}
    for r in rows:
        assert r.staleness_us >= 0
        assert r.n_last_24h >= 0
        assert r.is_stale == int(r.staleness_us > 6 * 3600 * 1_000_000)


def test_groupwise_linreg_numpy_replay(spark):
    import numpy as np

    rows = QUERIES["groupwise_linreg"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    from collections import defaultdict

    pts = defaultdict(list)
    for r in li:
        pts[r.l_returnflag].append(
            (round(r.l_quantity), round(r.l_extendedprice * 100))
        )
    assert {r.grp for r in rows} == set(pts)
    for r in rows:
        x = np.array([p[0] for p in pts[r.grp]], float)
        y = np.array([p[1] for p in pts[r.grp]], float)
        slope, intercept = np.polyfit(x, y, 1)
        assert r.n == len(x)
        assert r.slope_cents_per_unit == pytest.approx(float(slope), rel=1e-9)
        assert r.intercept_cents == pytest.approx(float(intercept), rel=1e-9)


def test_revenue_changepoints_replay(spark):
    rows = QUERIES["revenue_changepoints"](spark, SF_DIR).collect()
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    from collections import defaultdict

    daily = defaultdict(int)
    for r in o:
        daily[r.o_orderdate.date()] += round(r.o_totalprice * 100)
    days = sorted(daily)
    deltas = [
        (d, daily[d], daily[p], daily[d] - daily[p])
        for p, d in zip(days, days[1:])
    ]
    want = sorted(deltas, key=lambda t: (-abs(t[3]), t[0]))[: len(rows)]
    got = [(r.d, r.rev_cents, r.prev_cents, r.delta_cents) for r in rows]
    assert got == want


def test_holt_level_trend_python_replay(spark):
    [r] = QUERIES["holt_level_trend"](spark, SF_DIR).collect()
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    from collections import defaultdict

    daily = defaultdict(int)
    for row in o:
        d = row.o_orderdate.date()
        if d.year == 1996:
            daily[d] += round(row.o_totalprice * 100)
    ys = [float(daily[d]) for d in sorted(daily)]
    l, b = ys[0], ys[1] - ys[0]
    for y in ys[1:]:
        l_new = 0.5 * y + 0.5 * (l + b)
        b = 0.3 * ((0.5 * y + 0.5 * (l + b)) - l) + 0.7 * b
        l = l_new
    assert r.n_days == len(ys)
    assert r.level_cents == pytest.approx(l, rel=1e-12)
    assert r.trend_cents == pytest.approx(b, rel=1e-12)
    assert r.forecast_7d_cents == pytest.approx(l + 7 * b, rel=1e-12)


def test_skyline_pareto_edge_cases(spark, tmp_path):
    """Crafted part table hitting the grid seams: prices exactly on
    bucket multiples, equal-price/equal-size duplicates (neither
    dominates -> both kept), an equal-price larger-size victim, and a
    cross-bucket domination."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ai_etl_studio_spark.operators.analytics import _SKY_BUCKET_CENTS

    b = _SKY_BUCKET_CENTS  # 500 cents
    rows = [
        # (key, price_cents, size)
        (1, 2 * b, 10),   # on a bucket boundary
        (2, 2 * b, 10),   # exact duplicate of 1 — both kept
        (3, 2 * b, 7),    # equal price, smaller size — dominated by 1/2
        (4, 3 * b + 1, 12),  # pricier but bigger — kept
        (5, 5 * b, 12),   # same size as 4, strictly pricier — dominated
        (6, 1, 1),        # cheapest overall — kept
        (7, 5 * b + 3, 11),  # dominated by 4 (cheaper AND bigger)
    ]
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([r[0] for r in rows], pa.int64()),
                "p_name": [f"p{r[0]}" for r in rows],
                "p_brand": ["B"] * len(rows),
                "p_type": ["T"] * len(rows),
                "p_size": pa.array([r[2] for r in rows], pa.int32()),
                "p_retailprice": [r[1] / 100.0 for r in rows],
            }
        ),
        f"{tmp_path}/part.parquet",
    )
    got = {
        r.p_partkey
        for r in QUERIES["skyline_pareto"](spark, str(tmp_path)).collect()
    }
    assert got == {1, 2, 4, 6}
    # oracle twin agrees on the same crafted table
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW part AS SELECT * FROM '{tmp_path}/part.parquet'"
    )
    oracle_keys = {
        r[0] for r in con.execute(ORACLES["skyline_pareto"]).fetchall()
    }
    assert oracle_keys == {1, 2, 4, 6}


def test_gini_concentration_replay_and_bounds(spark):
    [r] = QUERIES["gini_concentration"](spark, SF_DIR).collect()
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    from collections import defaultdict

    spend = defaultdict(int)
    for row in o:
        spend[row.o_custkey] += round(row.o_totalprice * 100)
    xs = sorted(spend.values())
    n, total = len(xs), sum(xs)
    rank_weighted = sum((i + 1) * x for i, x in enumerate(xs))
    assert (r.n_customers, r.total_cents) == (n, total)
    want = (2 * rank_weighted - (n + 1) * total) / (n * total)
    assert r.gini == pytest.approx(want, rel=1e-12)
    assert 0.0 <= r.gini < 1.0


def test_cusum_level_shift_replay(spark):
    from collections import defaultdict

    rows = QUERIES["cusum_level_shift"](spark, SF_DIR).collect()
    assert len(rows) == 10
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    daily = defaultdict(int)
    for r in o:
        daily[str(r.o_orderdate)[:10]] += round(r.o_totalprice * 100)
    days = sorted(daily)
    n, total = len(days), sum(daily.values())
    prefix, cus = 0, {}
    for t, d in enumerate(days, start=1):
        prefix += daily[d]
        cus[d] = n * prefix - t * total
    want = sorted(cus.items(), key=lambda kv: (-abs(kv[1]), kv[0]))[:10]
    got = [(str(r.d), r.cusum_scaled) for r in rows]
    assert got == [(d, v) for d, v in want]
    # the last day's CUSUM is exactly 0 by construction — never in top-k
    assert cus[days[-1]] == 0


def test_stl_decompose_weekly_identity_and_seasonal_mean(spark):
    from collections import defaultdict

    rows = QUERIES["stl_decompose_weekly"](spark, SF_DIR).collect()
    assert rows
    by_dow = defaultdict(list)
    for r in rows:
        # decomposition identity at 7× scale: det7 = seas7 + resid7
        assert r.det7_cents == r.seas7_cents + r.resid7_cents
        assert r.det7_cents == 7 * r.rev_cents - r.trend7_cents
        assert 0 <= r.dow <= 6
        by_dow[r.dow].append((r.det7_cents, r.seas7_cents))
    for dow, vals in by_dow.items():
        # one seasonal value per weekday, equal to the rounded mean
        seas = {s for _, s in vals}
        assert len(seas) == 1, dow
        dets = [d for d, _ in vals]
        assert seas.pop() == round(sum(dets) / len(dets)), dow
    # residual-of-seasonal-mean sums to ~0 per dow (within rounding)
    for dow, vals in by_dow.items():
        resid_sum = sum(d - s for d, s in vals)
        assert abs(resid_sum) <= len(vals), dow


def test_supplier_overlap_jaccard_replay(spark):
    from collections import defaultdict
    from itertools import combinations

    rows = QUERIES["supplier_overlap_jaccard"](spark, SF_DIR).collect()
    assert rows
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    edges = {(r.l_partkey, r.l_suppkey) for r in li}
    by_part, deg = defaultdict(set), defaultdict(int)
    for p, s in edges:
        by_part[p].add(s)
        deg[s] += 1
    co = defaultdict(int)
    for p, ss in by_part.items():
        for s1, s2 in combinations(sorted(ss)[:50], 2):
            co[(s1, s2)] += 1
    ranked = sorted(co.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [((r.s1, r.s2), r.co) for r in rows]
    assert got == ranked
    for r in rows:
        union = r.deg_1 + r.deg_2 - r.co
        assert r.co <= min(r.deg_1, r.deg_2)
        assert r.jaccard_micro == round(r.co / union * 1e6)


def test_quality_calibration_bands_partition_of_corpus(spark):
    rows = QUERIES["quality_calibration_bands"](spark, SF_DIR).collect()
    assert rows
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    import re

    n_tokenizable = sum(
        1
        for d in docs
        if d.text is not None
        and [w for w in re.split(r"\s+", d.text.lower()) if w]
    )
    assert sum(r.n_docs for r in rows) == n_tokenizable
    for r in rows:
        assert 0 <= r.band <= 9
        assert 0 <= r.n_pass <= r.n_docs


def test_cohort_ltv_curve_replay(spark):
    from collections import defaultdict

    rows = QUERIES["cohort_ltv_curve"](spark, SF_DIR).collect()
    assert rows
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    first = {}
    rev = defaultdict(int)
    for r in o:
        m = (r.o_orderdate.year, r.o_orderdate.month)
        c = r.o_custkey
        first[c] = min(first.get(c, m), m)
        rev[(c, m)] += round(r.o_totalprice * 100)
    sizes = defaultdict(int)
    for c, f in first.items():
        sizes[f] += 1
    ca = defaultdict(int)
    for (c, m), cents in rev.items():
        f = first[c]
        age = (m[0] - f[0]) * 12 + (m[1] - f[1])
        ca[(f, age)] += cents
    got = {(r.cohort_month, r.age): (r.rev_cents, r.cum_cents, r.cohort_size) for r in rows}
    assert len(got) == len(ca)
    cum = defaultdict(int)
    for (f, age) in sorted(ca):
        cum[f] += ca[(f, age)]
        key = (f"{f[0]:04d}-{f[1]:02d}", age)
        assert got[key] == (ca[(f, age)], cum[f], sizes[f]), key
    # LTV is the rounded per-customer cumulative and never decreases
    by_cohort = defaultdict(list)
    import math

    for r in rows:
        # half-away-from-zero (Spark/DuckDB round), not Python banker's
        assert r.ltv_cents == math.floor(r.cum_cents / r.cohort_size + 0.5)
        by_cohort[r.cohort_month].append((r.age, r.cum_cents))
    for ages in by_cohort.values():
        seq = [c for _, c in sorted(ages)]
        assert seq == sorted(seq)


def test_supplier_return_z_replay(spark):
    from collections import defaultdict

    rows = QUERIES["supplier_return_z"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    st = defaultdict(lambda: [0, 0])
    for r in li:
        s = st[r.l_suppkey]
        s[0] += 1
        s[1] += r.l_returnflag == "R"
    tn = sum(v[0] for v in st.values())
    tr = sum(v[1] for v in st.values())
    p = tr / tn
    z = {
        k: round((v[1] - v[0] * p) / (v[0] * p * (1 - p)) ** 0.5 * 1e6)
        for k, v in st.items()
    }
    want = sorted(z.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    got = [(r.l_suppkey, r.z_micro) for r in rows]
    assert len(rows) == min(15, len(st))
    assert got == want[: len(got)]


def test_rising_terms_replay(spark):
    import re
    from collections import Counter

    rows = QUERIES["rising_terms"](spark, SF_DIR).collect()
    assert len(rows) == 25
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    a, b = Counter(), Counter()
    for d in docs:
        if d.text is None:
            continue
        side = b if d.doc_id % 2 else a
        for t in re.split(r"\s+", d.text.lower()):
            if t:
                side[t] += 1
    ta, tb = sum(a.values()), sum(b.values())
    delta = {
        t: round((b[t] / tb - a[t] / ta) * 1e9) for t in set(a) | set(b)
    }
    want = sorted(delta.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    got = [(r.token, r.share_delta_ticks) for r in rows]
    assert got == want
    # share deltas over the whole vocabulary cancel to ~0 by definition
    assert abs(sum(delta.values())) <= len(delta)


def test_embedding_outlier_mahalanobis_replay(spark):
    import numpy as np

    rows = QUERIES["embedding_outlier_mahalanobis"](spark, SF_DIR).collect()
    assert len(rows) == 15
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    from collections import defaultdict

    by_label = defaultdict(list)
    for r in emb:
        xm = np.round(np.array(r.embedding, dtype=np.float64) * 1e6)
        by_label[r.label].append((r.vec_id, xm))
    scores = {}
    for lab, vecs in by_label.items():
        m = np.stack([x for _, x in vecs])
        n = len(vecs)
        mu = m.sum(axis=0) / n
        var = np.maximum((m * m).sum(axis=0) / n - mu * mu, 1.0)
        for vid, x in vecs:
            scores[(vid, lab)] = int(
                np.round((x - mu) ** 2 / var * 1e6).sum()
            )
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0][0]))[:15]
    got = [((r.vec_id, r.label), r.maha2_ticks) for r in rows]
    assert got == want
    assert all(v >= 0 for _, v in got)


def test_ab_power_sample_size_replay(spark):
    import math

    rows = QUERIES["ab_power_sample_size"](spark, SF_DIR).collect()
    assert [r.mde_pm for r in rows] == [10, 20, 50, 100]
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    n = len(ev)
    conv = sum(1 for r in ev if r.event_type == "purchase")
    p1 = conv / n
    prev = None
    for r in rows:
        assert (r.n_events, r.n_conv) == (n, conv)
        p2 = p1 * (1 + r.mde_pm / 1000.0)
        want = math.ceil(
            (1.959964 + 0.841621) ** 2
            * (p1 * (1 - p1) + p2 * (1 - p2))
            / (p2 - p1) ** 2
        )
        assert r.n_per_arm == want
        # smaller detectable lifts need more samples
        if prev is not None:
            assert r.n_per_arm < prev
        prev = r.n_per_arm


def test_l_diversity_audit_replay(spark):
    import math
    from collections import defaultdict

    [r] = QUERIES["l_diversity_audit"](spark, SF_DIR).collect()
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    groups = defaultdict(lambda: [0, set()])
    for row in c:
        g = groups[(row.c_nationkey, math.floor(row.c_acctbal / 1000))]
        g[0] += 1
        g[1].add(row.c_mktsegment)
    below = [(cnt, len(s)) for cnt, s in groups.values() if len(s) < 3]
    assert r.n_groups == len(groups)
    assert r.min_l == min(len(s) for _, s in groups.values())
    assert r.groups_below_l == len(below)
    assert r.rows_at_risk == sum(cnt for cnt, _ in below)


def test_attribution_u_shaped_conservation(spark):
    """Credit mass is conserved: total credit across channels + direct
    equals 1e6 per purchase, and revenue allocation sums to total
    purchase revenue within per-purchase rounding."""
    rows = QUERIES["attribution_u_shaped"](spark, SF_DIR).collect()
    chans = {r.channel: r for r in rows}
    assert set(chans) == {"click", "view", "direct"}
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    purchases = [r for r in ev if r.event_type == "purchase"]
    total_credit = sum(r.credit_micro for r in rows)
    # every purchase hands out exactly 1.0 of credit (up to the
    # per-(purchase, channel) micro rounding: ≤1 micro per pair)
    assert abs(total_credit - len(purchases) * 1_000_000) <= 2 * len(purchases)
    total_rev = sum(
        round(r.value * 100) for r in purchases if r.value is not None
    )
    got_rev = sum(r.revenue_cents for r in rows)
    assert abs(got_rev - total_rev) <= 2 * len(purchases)


def test_event_trigram_paths_replay(spark):
    import calendar
    from collections import Counter, defaultdict

    rows = QUERIES["event_trigram_paths"](spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    seqs = defaultdict(list)
    for r in ev:
        seqs[r.user_id].append(
            (calendar.timegm(r.ts.timetuple()), r.ts.microsecond, r.event_id, r.event_type)
        )
    tri = Counter()
    for s in seqs.values():
        s.sort()
        for i in range(len(s) - 2):
            tri[(s[i][3], s[i + 1][3], s[i + 2][3])] += 1
    want = sorted(tri.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [((r.e1, r.e2, r.e3), r.n) for r in rows]
    assert got == want


def test_order_backlog_monthly_replay(spark):
    from collections import defaultdict

    rows = QUERIES["order_backlog_monthly"](spark, SF_DIR).collect()
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    opened = defaultdict(int)
    for r in o:
        opened[f"{r.o_orderdate.year:04d}-{r.o_orderdate.month:02d}"] += 1
    last_ship = {}
    for r in li:
        last_ship[r.l_orderkey] = max(
            last_ship.get(r.l_orderkey, r.l_shipdate), r.l_shipdate
        )
    closed = defaultdict(int)
    for d in last_ship.values():
        closed[f"{d.year:04d}-{d.month:02d}"] += 1
    months = sorted(set(opened) | set(closed))
    run = 0
    want = []
    for m in months:
        run += opened.get(m, 0) - closed.get(m, 0)
        want.append((m, opened.get(m, 0), closed.get(m, 0), run))
    got = [(r.month, r.opened, r.closed, r.backlog) for r in rows]
    assert got == want
    # every opened order eventually closes or stays in terminal backlog
    assert want[-1][3] == sum(opened.values()) - sum(closed.values())


def test_weighted_deciles_price_replay(spark):
    from collections import defaultdict

    rows = QUERIES["weighted_deciles_price"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    agg = defaultdict(lambda: defaultdict(int))
    for r in li:
        agg[r.l_returnflag][round(r.l_extendedprice * 100)] += round(
            r.l_quantity * 100
        )
    got = defaultdict(dict)
    for r in rows:
        got[r.l_returnflag][r.decile] = r.v_cents
    for flag, wmap in agg.items():
        total = sum(wmap.values())
        items = sorted(wmap.items())
        for d in range(1, 10):
            cum = 0
            for v, w in items:
                cum += w
                if cum * 10 >= d * total:
                    assert got[flag][d] == v, (flag, d)
                    break
        # deciles are monotone and d5 equals the weighted median op
        seq = [got[flag][d] for d in range(1, 10)]
        assert seq == sorted(seq)
    med = {
        r.l_returnflag: r.median_cents
        for r in QUERIES["weighted_median_price"](spark, SF_DIR).collect()
    }
    for flag, m in med.items():
        assert got[flag][5] == m


def test_stl_residual_outliers_consistency(spark):
    rows = QUERIES["stl_residual_outliers"](spark, SF_DIR).collect()
    assert rows
    stl = {r.d: r.resid7_cents for r in QUERIES["stl_decompose_weekly"](spark, SF_DIR).collect()}
    resid = sorted(stl.values())
    n = len(resid)
    m = resid[(n + 1) // 2 - 1]  # lower median: min r with 2·rank ≥ n
    devs = sorted(abs(r - m) for r in resid)
    mad = devs[(n + 1) // 2 - 1]
    want = sorted(
        ((abs(r - m), d) for d, r in stl.items()), key=lambda t: (-t[0], t[1])
    )[:10]
    got = [(r.abs_dev_cents, r.d) for r in rows]
    assert got == want
    for r in rows:
        assert r.abs_dev_cents == abs(r.resid7_cents - m)
        assert r.robust_z_micro == round(r.abs_dev_cents / max(mad, 1.0) * 1e6)


def test_quantile_norm_map_consistency(spark):
    rows = QUERIES["quantile_norm_map"](spark, SF_DIR).collect()
    assert rows
    src = {
        (r.source, r.decile): r.chars_at
        for r in QUERIES["doc_length_deciles_by_source"](spark, SF_DIR).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    lens = sorted(d.n_chars for d in docs if d.n_chars is not None)
    n = len(lens)
    for r in rows:
        assert r.source_chars == src[(r.source, r.decile)]
        thr = -(-r.decile * n // 10)
        assert r.global_chars == lens[thr - 1]
        assert r.shift_chars == r.global_chars - r.source_chars
    # 9 deciles per source, every source present
    from collections import Counter

    assert set(Counter(r.source for r in rows).values()) == {9}


def test_label_centroid_distances_replay(spark):
    import numpy as np
    from collections import defaultdict
    from itertools import combinations

    rows = QUERIES["label_centroid_distances"](spark, SF_DIR).collect()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    by_label = defaultdict(list)
    for r in emb:
        by_label[r.label].append(
            np.round(np.array(r.embedding, dtype=np.float64) * 1e6)
        )
    mu = {l: np.stack(v).sum(axis=0) / len(v) for l, v in by_label.items()}
    got = {(r.label_1, r.label_2): r.d2_micro2 for r in rows}
    for a, b in combinations(sorted(mu), 2):
        want = int(np.round((mu[a] - mu[b]) ** 2).sum())
        assert got[(a, b)] == want, (a, b)
    assert len(got) == len(mu) * (len(mu) - 1) // 2
    assert all(v >= 0 for v in got.values())


def test_range_split_points_balance(spark):
    rows = QUERIES["range_split_points"](spark, SF_DIR).collect()
    assert len(rows) == 31
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    vals = sorted(round(r.o_totalprice * 100) for r in o)
    n = len(vals)
    bounds = [r.boundary_cents for r in rows]
    assert bounds == sorted(bounds)
    for r in rows:
        thr = -(-r.split_idx * n // 32)
        assert r.boundary_cents == vals[thr - 1]
    # the resulting 32 ranges are balanced within one distinct-value run
    import bisect

    sizes = []
    prev = 0
    for b in bounds + [vals[-1]]:
        idx = bisect.bisect_right(vals, b)
        sizes.append(idx - prev)
        prev = idx
    assert min(sizes) > 0 and max(sizes) <= 2 * (n // 32 + 1)


def test_dow_hour_value_heatmap_replay(spark):
    import calendar
    from collections import defaultdict

    rows = QUERIES["dow_hour_value_heatmap"](spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    agg = defaultdict(lambda: [0, 0])
    for r in ev:
        dow = (r.ts.date() - __import__("datetime").date(1970, 1, 1)).days % 7
        cell = agg[(dow, r.ts.hour)]
        cell[0] += 1
        cell[1] += round((r.value or 0) * 100)
    got = {(r.dow, r.hr): (r.n_events, r.value_cents) for r in rows}
    assert got == {k: tuple(v) for k, v in agg.items()}
    assert len(got) <= 168


def test_personalized_pagerank_seed_locality(spark):
    """PPR mass concentrates near the seed set: every positive-rank
    node is within PR_ITERS hops of a seed, and seeds hold restart
    mass; the global rank's uniform floor is absent."""
    rows = QUERIES["personalized_pagerank_seeded"](spark, SF_DIR).collect()
    assert rows
    assert all(r.rank_tick > 0 for r in rows)
    # seeds are customers with key % 10 == 0; with 3 iterations over a
    # bipartite graph, odd hops land on suppliers — both sides present
    kinds = {r.node[0] for r in rows}
    assert kinds <= {"c", "s"}
    # deterministic ordering: strictly non-increasing ticks
    ticks = [r.rank_tick for r in rows]
    assert ticks == sorted(ticks, reverse=True)


def test_ivm_join_delta_all_consistent(spark):
    """The join-delta law holds on every key: merged partials equal the
    full recompute — the flag the driver hash-checks is all-1."""
    rows = QUERIES["ivm_join_delta"](spark, SF_DIR).collect()
    assert rows
    assert all(r.consistent == 1 for r in rows)
    for r in rows:
        assert r.pre_n + r.delta_n == r.full_n
        assert r.merged_cents == r.full_cents
    # the delta batch is genuinely non-empty (the cutoff splits data)
    assert sum(r.delta_n for r in rows) > 0
    assert sum(r.pre_n for r in rows) > 0


def test_media_sequence_fingerprint_invariants(spark):
    """Set groups can never exceed sequence groups (sorting is a
    many-to-one map), and identical payloads share both fingerprints."""
    rows = QUERIES["media_sequence_fingerprint"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_set_groups <= r.n_seq_groups <= r.n_items
        assert r.reordered_groups == r.n_seq_groups - r.n_set_groups
        assert r.reordered_groups >= 0
    assert {r.media_type for r in rows} == {
        "image/png", "audio/wav", "video/mp4"
    }


def test_value_skewness_replay(spark):
    import numpy as np
    from collections import defaultdict

    rows = QUERIES["value_skewness_by_nation"](spark, SF_DIR).collect()
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    nat = {r.c_custkey: r.c_nationkey for r in c}
    by_n = defaultdict(list)
    for r in o:
        by_n[nat[r.o_custkey]].append(round(r.o_totalprice))
    got = {r.c_nationkey: r for r in rows}
    for k, xs in by_n.items():
        a = np.array(xs, dtype=np.float64)
        mu, var = a.mean(), a.var()
        skew = ((a - mu) ** 3).mean() / var**1.5
        kurt = ((a - mu) ** 4).mean() / var**2
        r = got[k]
        assert r.n == len(xs)
        # central-moment replay vs raw-moment expansion: agree to ~1e-6
        assert abs(r.skew_micro / 1e6 - skew) < 1e-4
        assert abs(r.kurtosis_micro / 1e6 - kurt) < 1e-3
        assert r.kurtosis_micro > 0


def test_hybrid_skew_join_equals_plain_join(spark):
    rows = QUERIES["hybrid_skew_join"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    p = spark.read.parquet(f"{SF_DIR}/part.parquet").collect()
    pkeys = {r.p_partkey for r in p}
    from collections import Counter

    cnt = Counter(r.l_partkey for r in li)
    hot = {
        k
        for k, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    }
    tot = {0: [0, 0], 1: [0, 0]}
    for r in li:
        if r.l_partkey not in pkeys:
            continue
        b = tot[1 if r.l_partkey in hot else 0]
        b[0] += 1
        b[1] += round(r.l_extendedprice * 100)
    got = {r.is_hot: (r.n_lines, r.cents) for r in rows}
    assert got == {k: tuple(v) for k, v in tot.items()}
    # union of both paths covers every joined line exactly once
    assert sum(v[0] for v in got.values()) == sum(
        1 for r in li if r.l_partkey in pkeys
    )


def test_heldout_perplexity_oov_gt_insample(spark):
    """Held-out surprisal is a proper eval: every score is positive,
    and scoring the TRAIN half with its own model gives a lower
    average than the held-out half (in-sample optimism exists) —
    computed with a pure-python replay."""
    import math
    import re
    from collections import Counter, defaultdict

    rows = QUERIES["heldout_perplexity"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    train, held = Counter(), defaultdict(list)
    for d in docs:
        if d.text is None:
            continue
        ws = [w for w in re.split(r"\s+", d.text.lower()) if w]
        if d.doc_id % 2 == 0:
            train.update(ws)
        else:
            held[d.source].extend(ws)
    n, v = sum(train.values()), len(train)
    got = {r.source: r for r in rows}
    for src, ws in held.items():
        ticks = sum(
            round(math.log((n + v + 1) / (train.get(w, 0) + 1)) * 1e9)
            for w in ws
        )
        r = got[src]
        assert (r.n_tokens, r.surprisal_ticks) == (len(ws), ticks)
        assert r.avg_ticks == ticks // len(ws)
        assert r.avg_ticks > 0


def test_vocab_coverage_topk_replay(spark):
    import re
    from collections import Counter

    rows = QUERIES["vocab_coverage_topk"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    cnt = Counter()
    for d in docs:
        if d.text is not None:
            cnt.update(w for w in re.split(r"\s+", d.text.lower()) if w)
    ordered = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(cnt.values())
    got = {r.k: r for r in rows}
    prev = -1
    for k in (1, 10, 100, 1_000, 10_000, 100_000):
        top = ordered[:k]
        cov = sum(c for _, c in top)
        r = got[k]
        assert (r.n_words, r.covered_tokens, r.total_tokens) == (
            len(top), cov, total
        )
        assert r.coverage_ppb == cov * 1_000_000_000 // total
        assert r.coverage_ppb >= prev  # curve is monotone
        prev = r.coverage_ppb
    assert got[100_000].n_words == len(ordered)  # sf0.001 vocab < 100k


def test_new_returning_revenue_replay(spark):
    from collections import defaultdict

    rows = QUERIES["new_returning_revenue_monthly"](spark, SF_DIR).collect()
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    first = {}
    for r in o:
        m = (r.o_orderdate.year, r.o_orderdate.month)
        if r.o_custkey not in first or m < first[r.o_custkey]:
            first[r.o_custkey] = m
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for r in o:
        m = (r.o_orderdate.year, r.o_orderdate.month)
        b = agg[m]
        c = round(r.o_totalprice * 100)
        if m == first[r.o_custkey]:
            b[0] += 1
            b[1] += c
        else:
            b[2] += 1
            b[3] += c
    got = {
        (r.month.year, r.month.month): (
            r.new_orders, r.new_cents, r.returning_orders, r.returning_cents
        )
        for r in rows
    }
    assert got == {m: tuple(v) for m, v in agg.items()}
    # the globally earliest month has zero returning revenue
    assert got[min(got)][2] == 0


def test_abc_classification_replay(spark):
    from collections import defaultdict

    rows = QUERIES["abc_classification_parts"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    rev = defaultdict(int)
    for r in li:
        rev[r.l_partkey] += round(r.l_extendedprice * 100)
    ordered = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(rev.values())
    agg = defaultdict(lambda: [0, 0])
    cum = 0
    for pk, c in ordered:
        cum += c
        cls = "A" if 5 * cum <= 4 * total else ("B" if 20 * cum <= 19 * total else "C")
        agg[cls][0] += 1
        agg[cls][1] += c
    got = {r.cls: (r.n_parts, r.cents, r.share_ppb) for r in rows}
    assert got == {
        k: (v[0], v[1], v[1] * 1_000_000_000 // total) for k, v in agg.items()
    }
    # by construction A carries ~80% of revenue vs C's ~5% tail; the
    # classes partition the part dimension exactly
    if "A" in got and "C" in got:
        assert got["A"][1] > got["C"][1]
    assert sum(v[0] for v in got.values()) == len(rev)
    assert sum(v[1] for v in got.values()) == total


def test_embedding_dim_stats_replay(spark):
    import numpy as np

    rows = QUERIES["embedding_dim_stats"](spark, SF_DIR).collect()
    vecs = [
        r.embedding
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    ]
    ticks = np.array(
        [[_round_half_up(float(x) * 1e6) for x in v] for v in vecs],
        dtype=np.int64,
    )
    assert len(rows) == ticks.shape[1]
    for r in rows:
        col = ticks[:, r.dim - 1]
        assert r.n_vecs == len(col)
        assert (r.min_micro, r.max_micro) == (col.min(), col.max())
        mu = col.sum() / len(col)
        assert r.mean_nano == _round_half_up(mu * 1000)
        var = float((col.astype(object) ** 2).sum()) / len(col) - mu * mu
        assert abs(r.var_microsq - var) <= 1
        assert r.var_microsq > 0  # no dead dims in the synthetic data


def test_pairwise_distance_histogram_replay(spark):
    from itertools import combinations

    rows = QUERIES["pairwise_distance_histogram"](spark, SF_DIR).collect()
    sample = [
        [_round_half_up(float(x) * 1e6) for x in r.embedding]
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
        if r.vec_id % 11 == 0
    ]
    from collections import defaultdict

    agg = defaultdict(lambda: [0, None, None])
    for a, b in combinations(sample, 2):
        d2 = sum((x - y) ** 2 for x, y in zip(a, b))
        bkt = max(d2, 1).bit_length() - 1
        e = agg[bkt]
        e[0] += 1
        e[1] = d2 if e[1] is None else min(e[1], d2)
        e[2] = d2 if e[2] is None else max(e[2], d2)
    got = {r.log2_bucket: (r.n_pairs, r.min_d2, r.max_d2) for r in rows}
    assert got == {k: tuple(v) for k, v in agg.items()}
    assert sum(v[0] for v in got.values()) == len(sample) * (len(sample) - 1) // 2


def test_readability_scores_replay(spark):
    import re
    from collections import defaultdict

    rows = QUERIES["readability_scores_by_source"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    agg = defaultdict(lambda: [0, 0, 0, 0, 0])  # n, words, sents, syls, chars
    for d in docs:
        if d.text is None:
            continue
        w = len([x for x in re.split(r"\s+", d.text) if x])
        s = len([x for x in re.split(r"[.!?]+", d.text) if re.search(r"\S", x)])
        if w < 1 or s < 1:
            continue
        y = len(re.findall(r"[aeiouy]+", d.text.lower()))
        b = agg[d.source]
        b[0] += 1
        b[1] += w
        b[2] += s
        b[3] += y
        b[4] += len(d.text)
    got = {r.source: r for r in rows}
    assert set(got) == set(agg)
    for src, (n, w, s, y, c) in agg.items():
        r = got[src]
        assert (r.n_docs, r.words, r.sentences) == (n, w, s)
        assert r.words_per_sentence_micro == _round_half_up(w / s * 1e6)
        assert r.chars_per_word_micro == _round_half_up(c / w * 1e6)
        assert r.fk_grade_milli == _round_half_up(
            (0.39 * (w / s) + 11.8 * (y / w) - 15.59) * 1000
        )


def test_markov_stationary_replay(spark):
    from collections import Counter, defaultdict

    rows = QUERIES["markov_stationary_profile"](spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    by_user = defaultdict(list)
    for e in ev:
        by_user[e.user_id].append((e.ts, e.event_id, e.event_type))
    m, deg = Counter(), Counter()
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            m[(a, b)] += 1
            deg[a] += 1
    pi = {s: 1_000_000_000_000 // len(deg) for s in deg}
    for _ in range(3):
        nxt = defaultdict(int)
        for (a, b), n in m.items():
            nxt[b] += pi[a] * n // deg[a]
        pi = dict(nxt)
    freq = Counter(e.event_type for e in ev)
    total = sum(freq.values())
    got = {r.event_type: r for r in rows}
    assert set(got) == set(pi)
    for s, r in got.items():
        ft = freq[s] * 1_000_000_000_000 // total
        assert (r.freq_ticks, r.stationary_ticks) == (ft, pi[s])
        assert r.delta_ticks == pi[s] - ft
    # power iteration conserves mass up to floor-division bleed
    assert 0 <= 1_000_000_000_000 - sum(pi.values()) < 10_000


def test_attribution_time_decay_replay(spark):
    import math
    from collections import defaultdict

    rows = QUERIES["attribution_time_decay"](spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    LOOK, HALF = 72 * 3600 * 10**6, 24 * 3600 * 10**6
    import calendar

    def to_us(ts):
        return calendar.timegm(ts.timetuple()) * 10**6 + ts.microsecond

    touches = defaultdict(list)
    for e in ev:
        if e.event_type in ("click", "view"):
            touches[e.user_id].append((to_us(e.ts), e.event_type))
    chan = defaultdict(lambda: [0, 0])
    for e in ev:
        if e.event_type != "purchase":
            continue
        p_us, cents = to_us(e.ts), _round_half_up(e.value * 100)
        s_ch = defaultdict(int)
        for t_us, ch in touches[e.user_id]:
            if t_us <= p_us and p_us - t_us <= LOOK:
                s_ch[ch] += _round_half_up(
                    math.pow(0.5, (p_us - t_us) / HALF) * 1e9
                )
        if not s_ch:
            chan["direct"][0] += 1_000_000
            chan["direct"][1] += cents
            continue
        s_all = sum(s_ch.values())
        for ch, v in s_ch.items():
            chan[ch][0] += _round_half_up(v / s_all * 1_000_000)
            chan[ch][1] += _round_half_up(v / s_all * cents)
    got = {r.channel: (r.credit_micro, r.revenue_cents) for r in rows}
    assert got == {k: tuple(v) for k, v in chan.items()}
    # per-purchase normalization: total credit ≈ 1e6 per purchase
    n_purch = sum(1 for e in ev if e.event_type == "purchase")
    assert abs(sum(v[0] for v in got.values()) - n_purch * 1_000_000) < n_purch * 2


def test_basket_size_profile_replay(spark):
    from collections import defaultdict

    rows = QUERIES["basket_size_profile"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    per_o = defaultdict(lambda: [0, 0])
    for r in li:
        b = per_o[r.l_orderkey]
        b[0] += 1
        b[1] += _round_half_up(r.l_extendedprice * 100)
    agg = defaultdict(lambda: [0, 0])
    for n, c in per_o.values():
        agg[n][0] += 1
        agg[n][1] += c
    total = sum(v[1] for v in agg.values())
    got = {r.n_lines: r for r in rows}
    assert set(got) == set(agg)
    for n, (cnt, rev) in agg.items():
        r = got[n]
        assert (r.n_orders, r.revenue_cents) == (cnt, rev)
        assert r.avg_order_cents == rev // cnt
        assert r.share_ppb == rev * 1_000_000_000 // total
    assert sum(r.n_orders for r in rows) == len(per_o)


def test_gini_by_nation_replay(spark):
    from collections import defaultdict

    rows = QUERIES["gini_by_nation"](spark, SF_DIR).collect()
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    nat = {r.c_custkey: r.c_nationkey for r in c}
    spend = defaultdict(int)
    for r in o:
        spend[(nat[r.o_custkey], r.o_custkey)] += _round_half_up(
            r.o_totalprice * 100
        )
    by_n = defaultdict(list)
    for (n, ck), v in spend.items():
        by_n[n].append((v, ck))
    got = {r.c_nationkey: r for r in rows}
    assert set(got) == set(by_n)
    for nk, vals in by_n.items():
        vals.sort()
        n, total = len(vals), sum(v for v, _ in vals)
        rw = sum((i + 1) * v for i, (v, _) in enumerate(vals))
        gini = (2 * float(rw) - (n + 1) * total) / (n * total)
        r = got[nk]
        assert (r.n_customers, r.total_cents) == (n, total)
        assert r.gini_nano == _round_half_up(gini * 1e9)
        assert 0 <= r.gini_nano < 1_000_000_000


def test_single_source_risk_replay(spark):
    from collections import defaultdict

    rows = QUERIES["single_source_risk"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    per_part = defaultdict(lambda: [set(), 0])
    for r in li:
        b = per_part[r.l_partkey]
        b[0].add(r.l_suppkey)
        b[1] += _round_half_up(r.l_extendedprice * 100)
    agg = defaultdict(lambda: [0, 0])
    for sups, cents in per_part.values():
        band = min(len(sups), 4)
        agg[band][0] += 1
        agg[band][1] += cents
    total = sum(v[1] for v in agg.values())
    got = {r.supplier_band: r for r in rows}
    assert set(got) == set(agg)
    for band, (np_, rev) in agg.items():
        r = got[band]
        assert (r.n_parts, r.revenue_cents) == (np_, rev)
        assert r.share_ppb == rev * 1_000_000_000 // total


def test_shipping_delay_percentiles_replay(spark):
    from collections import defaultdict

    rows = QUERIES["shipping_delay_percentiles_by_priority"](
        spark, SF_DIR
    ).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    od = {r.o_orderkey: (r.o_orderpriority, r.o_orderdate.date()) for r in o}
    delays = defaultdict(list)
    for r in li:
        pr, odate = od[r.l_orderkey]
        delays[pr].append((r.l_shipdate.date() - odate).days)
    got = {r.priority: r for r in rows}
    assert set(got) == set(delays)
    for pr, ds in delays.items():
        ds.sort()
        n = len(ds)
        r = got[pr]
        assert r.n_lines == n
        for p, v in ((50, r.p50_days), (90, r.p90_days), (99, r.p99_days)):
            assert v == ds[-(-p * n // 100) - 1]  # ceil-rank percentile
        assert r.p50_days <= r.p90_days <= r.p99_days


def test_trade_flow_matrix_replay(spark):
    from collections import defaultdict

    rows = QUERIES["trade_flow_matrix"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    o = {r.o_orderkey: r.o_custkey
         for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()}
    cn = {r.c_custkey: r.c_nationkey
          for r in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()}
    sn = {r.s_suppkey: r.s_nationkey
          for r in spark.read.parquet(f"{SF_DIR}/supplier.parquet").collect()}
    nm = {r.n_nationkey: r.n_name
          for r in spark.read.parquet(f"{SF_DIR}/nation.parquet").collect()}
    agg = defaultdict(lambda: [0, 0])
    for r in li:
        key = (nm[sn[r.l_suppkey]], nm[cn[o[r.l_orderkey]]])
        agg[key][0] += 1
        agg[key][1] += _round_half_up(
            r.l_extendedprice * (1 - r.l_discount) * 100
        )
    got = {(r.supp_nation, r.cust_nation): (r.n_lines, r.revenue_cents)
           for r in rows}
    assert got == {k: tuple(v) for k, v in agg.items()}
    # the matrix accounts for every lineitem exactly once
    assert sum(v[0] for v in got.values()) == len(li)


def test_return_rate_by_discount_band_replay(spark):
    from collections import defaultdict

    rows = QUERIES["return_rate_by_discount_band"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for r in li:
        b = agg[_round_half_up(r.l_discount * 100)]
        c = _round_half_up(r.l_extendedprice * 100)
        ret = 1 if r.l_returnflag == "R" else 0
        b[0] += 1
        b[1] += ret
        b[2] += c
        b[3] += ret * c
    got = {r.discount_pct: r for r in rows}
    assert set(got) == set(agg)
    for pct, (n, nr, rev, rrev) in agg.items():
        r = got[pct]
        assert (r.n_lines, r.n_returned, r.revenue_cents, r.returned_cents) == (
            n, nr, rev, rrev
        )
        assert r.return_rate_ppm == nr * 1_000_000 // n


def test_price_dispersion_replay(spark):
    from collections import defaultdict
    import math

    rows = QUERIES["price_dispersion_by_part_type"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    pt = {r.p_partkey: r.p_type
          for r in spark.read.parquet(f"{SF_DIR}/part.parquet").collect()}
    vals = defaultdict(list)
    for r in li:
        vals[pt[r.l_partkey]].append(
            _round_half_up(r.l_extendedprice * 100 / r.l_quantity)
        )
    got = {r.p_type: r for r in rows}
    assert set(got) == set(vals)
    for t, xs in vals.items():
        n, s1 = len(xs), sum(xs)
        s2 = float(sum(x * x for x in xs))
        mu = s1 / n
        cv = math.sqrt(s2 / n - mu * mu) / mu
        r = got[t]
        assert (r.n_lines, r.mean_cents) == (n, _round_half_up(mu))
        assert r.cv_micro == _round_half_up(cv * 1e6)
        assert r.cv_micro > 0


def test_engagement_frequency_replay(spark):
    from collections import defaultdict

    rows = QUERIES["engagement_frequency_histogram"](spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    days = defaultdict(set)
    for e in ev:
        days[((e.ts.year, e.ts.month), e.user_id)].add(e.ts.date())
    agg = defaultdict(int)
    for (m, _), ds in days.items():
        agg[(m, len(ds))] += 1
    got = {((r.month.year, r.month.month), r.n_active_days): r.n_users
           for r in rows}
    assert got == dict(agg)
    # every (month, user) lands in exactly one histogram cell
    assert sum(got.values()) == len(days)


def test_error_recovery_replay(spark):
    from collections import defaultdict

    rows = QUERIES["error_recovery_histogram"](spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    import calendar

    def to_us(ts):
        return calendar.timegm(ts.timetuple()) * 10**6 + ts.microsecond

    by_user = defaultdict(list)
    for e in ev:
        by_user[e.user_id].append((to_us(e.ts), e.event_id, e.event_type))
    agg = defaultdict(lambda: [0, None, None])
    n_errors_total = 0
    for seq in by_user.values():
        seq.sort()
        for i, (us, _, et) in enumerate(seq):
            if et != "error":
                continue
            n_errors_total += 1
            rec = next(
                (u for u, _, t in seq[i + 1:] if t != "error"), None
            )
            if rec is None:
                b, secs = -1, None
            else:
                secs = (rec - us) // 10**6
                b = max(secs, 1).bit_length() - 1
            e_ = agg[b]
            e_[0] += 1
            if secs is not None:
                e_[1] = secs if e_[1] is None else min(e_[1], secs)
                e_[2] = secs if e_[2] is None else max(e_[2], secs)
    got = {r.log2_bucket: (r.n_errors, r.min_s, r.max_s) for r in rows}
    assert got == {k: tuple(v) for k, v in agg.items()}
    assert sum(v[0] for v in got.values()) == n_errors_total


def test_session_depth_conversion_replay(spark):
    from collections import defaultdict

    rows = QUERIES["session_depth_conversion"](spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    import calendar

    def to_us(ts):
        return calendar.timegm(ts.timetuple()) * 10**6 + ts.microsecond

    by_user = defaultdict(list)
    for e in ev:
        by_user[e.user_id].append((to_us(e.ts), e.event_id, e.event_type))
    agg = defaultdict(lambda: [0, 0])
    n_sessions_total = 0
    for seq in by_user.values():
        seq.sort()
        sessions, cur, last = [], [], None
        for us, _, et in seq:
            if last is not None and us - last > 1_800_000_000:
                sessions.append(cur)
                cur = []
            cur.append(et)
            last = us
        sessions.append(cur)
        for s_ in sessions:
            n_sessions_total += 1
            band = min(len(s_), 10)
            agg[band][0] += 1
            agg[band][1] += int("purchase" in s_)
    got = {r.depth_band: r for r in rows}
    assert set(got) == set(agg)
    for band, (n, conv) in agg.items():
        r = got[band]
        assert (r.n_sessions, r.n_converted) == (n, conv)
        assert r.conversion_ppm == conv * 1_000_000 // n
    assert sum(r.n_sessions for r in rows) == n_sessions_total


def test_brand_price_realization_replay(spark):
    from collections import defaultdict

    rows = QUERIES["brand_price_realization"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    part = {
        r.p_partkey: (r.p_brand, r.p_retailprice)
        for r in spark.read.parquet(f"{SF_DIR}/part.parquet").collect()
    }
    agg = defaultdict(lambda: [0, 0, 0])
    for r in li:
        brand, retail = part[r.l_partkey]
        b = agg[brand]
        b[0] += 1
        b[1] += _round_half_up(r.l_extendedprice * (1 - r.l_discount) * 100)
        b[2] += _round_half_up(retail * r.l_quantity * 100)
    got = {r.p_brand: r for r in rows}
    assert set(got) == set(agg)
    for brand, (n, realized, retail) in agg.items():
        r = got[brand]
        assert (r.n_lines, r.realized_cents, r.retail_cents) == (
            n, realized, retail
        )
        assert r.realization_ppm == realized * 1_000_000 // retail
        assert r.realization_ppm > 0


def test_doc_feature_correlation_replay(spark):
    import math
    import re

    rows = QUERIES["doc_feature_correlation"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    SW = {"the", "a", "an", "of", "to", "and", "in", "is"}
    feats = []
    for d in docs:
        if d.text is None:
            continue
        ws = [w for w in re.split(r"\s+", d.text.lower()) if w]
        feats.append({
            "chars": len(d.text),
            "words": len(ws),
            "uniq": len(set(ws)),
            "stops": sum(w in SW for w in ws),
        })
    n = len(feats)

    def pearson(x, y):
        sx = sum(f[x] for f in feats)
        sy = sum(f[y] for f in feats)
        sxy = float(sum(f[x] * f[y] for f in feats))
        sxx = float(sum(f[x] ** 2 for f in feats))
        syy = float(sum(f[y] ** 2 for f in feats))
        return (n * sxy - sx * sy) / math.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )

    got = {(r.feature_x, r.feature_y): r for r in rows}
    assert set(got) == {("chars", "words"), ("chars", "uniq"),
                        ("words", "stops")}
    for (x, y), r in got.items():
        assert r.n_docs == n
        assert r.r_nano == _round_half_up(pearson(x, y) * 1e9)
        assert -1_000_000_000 <= r.r_nano <= 1_000_000_000
    # chars and words measure the same thing: near-perfect correlation
    assert got[("chars", "words")].r_nano > 900_000_000


def test_attribution_comparison_consistent_with_parts(spark):
    rows = QUERIES["attribution_model_comparison"](spark, SF_DIR).collect()
    lt = {r.channel: r for r in
          QUERIES["attribution_last_touch"](spark, SF_DIR).collect()}
    us = {r.channel: r for r in
          QUERIES["attribution_u_shaped"](spark, SF_DIR).collect()}
    td = {r.channel: r for r in
          QUERIES["attribution_time_decay"](spark, SF_DIR).collect()}
    got = {r.channel: r for r in rows}
    assert set(got) == set(lt) | set(us) | set(td)
    for ch, r in got.items():
        assert r.lt_micro == (lt[ch].n_conversions * 1_000_000 if ch in lt else 0)
        assert r.us_micro == (us[ch].credit_micro if ch in us else 0)
        assert r.td_micro == (td[ch].credit_micro if ch in td else 0)
        cents = [r.lt_cents, r.us_cents, r.td_cents]
        assert r.revenue_spread_cents == max(cents) - min(cents)
    # conservation up to per-conversion credit rounding: each model
    # allocates the same revenue within a cent per purchase
    n_purch = sum(
        1
        for e in spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
        if e.event_type == "purchase"
    )
    lt_t = sum(r.lt_cents for r in rows)
    for other in (sum(r.us_cents for r in rows), sum(r.td_cents for r in rows)):
        assert abs(lt_t - other) <= n_purch


def test_ivm_topk_delta_consistent_here(spark):
    rows = QUERIES["ivm_topk_delta"](spark, SF_DIR).collect()
    assert len(rows) == 10
    assert [r.rank for r in rows] == list(range(1, 11))
    # the flag is honest: it equals the rank-wise comparison it claims
    for r in rows:
        assert r.consistent == int(
            r.pk_delta == r.pk_full and r.cents_delta == r.cents_full
        )
    # merged values only ever UNDER-estimate (state may drop pre mass),
    # so the full leg dominates rank-for-rank
    assert all(r.cents_delta <= r.cents_full for r in rows)
    cents = [r.cents_delta for r in rows]
    assert cents == sorted(cents, reverse=True)


def test_type_seasonality_replay(spark):
    from collections import defaultdict

    rows = QUERIES["type_seasonality_index"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    om = {r.o_orderkey: r.o_orderdate.month
          for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()}
    pt = {r.p_partkey: r.p_type
          for r in spark.read.parquet(f"{SF_DIR}/part.parquet").collect()}
    agg = defaultdict(int)
    for r in li:
        agg[(pt[r.l_partkey], om[r.l_orderkey])] += _round_half_up(
            r.l_extendedprice * 100
        )
    tot = defaultdict(int)
    for (t, _), c in agg.items():
        tot[t] += c
    got = {(r.p_type, r.month): r for r in rows}
    assert set(got) == set(agg)
    for (t, m), c in agg.items():
        r = got[(t, m)]
        assert r.cents == c
        assert r.seasonality_ppm == c * 12_000_000 // tot[t]


def test_term_burstiness_replay(spark):
    import math
    import re
    from collections import Counter

    rows = QUERIES["term_burstiness_topk"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    cf, df = Counter(), Counter()
    n_docs = 0
    for d in docs:
        if d.text is None:
            continue
        n_docs += 1
        ws = [w for w in re.split(r"\s+", d.text.lower()) if w]
        cf.update(ws)
        df.update(set(ws))
    top = sorted(cf.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    assert [(r.term, r.cf) for r in rows] == top
    for r in rows:
        assert r.df == df[r.term]
        assert r.burst_micro == r.cf * 1_000_000 // r.df
        assert r.poisson_df == _round_half_up(
            n_docs * (1 - math.exp(-r.cf / n_docs))
        )
        # burstiness is ≥ 1 by construction (cf ≥ df)
        assert r.burst_micro >= 1_000_000


def test_media_byte_entropy_replay(spark):
    import math
    from collections import Counter, defaultdict

    rows = QUERIES["media_byte_entropy"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    hists = defaultdict(Counter)
    for d in docs:
        if d.text is None:
            continue
        mt = ("image/png", "audio/wav", "video/mp4")[d.doc_id % 3]
        hists[mt].update(d.text.encode("utf-8"))
    got = {r.media_type: r for r in rows}
    assert set(got) == set(hists)
    for mt, hist in hists.items():
        n = sum(hist.values())
        ent = sum(
            _round_half_up((c / n) * math.log2(n / c) * 1e9)
            for c in hist.values()
        )
        r = got[mt]
        assert (r.n_bytes, r.n_distinct_bytes) == (n, len(hist))
        assert r.entropy_bits_nano == ent
        # utf-8 text payloads: well under the 8-bit random ceiling
        assert 2_000_000_000 < r.entropy_bits_nano < 6_500_000_000


def test_supplier_delivery_consistency_replay(spark):
    import math
    from collections import defaultdict

    rows = QUERIES["supplier_delivery_consistency"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    od = {r.o_orderkey: r.o_orderdate.date()
          for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()}
    delays = defaultdict(list)
    for r in li:
        delays[r.l_suppkey].append(
            (r.l_shipdate.date() - od[r.l_orderkey]).days
        )
    scored = []
    for sk, ds in delays.items():
        if len(ds) < 30:
            continue
        n, s1 = len(ds), sum(ds)
        s2 = float(sum(x * x for x in ds))
        mu = s1 / n
        std = math.sqrt(s2 / n - mu * mu)
        scored.append(
            (sk, n, _round_half_up(mu * 1000), _round_half_up(std * 1e6))
        )
    scored.sort(key=lambda t: (-t[3], t[0]))
    assert [(r.l_suppkey, r.n_lines, r.mean_delay_milli, r.std_micro)
            for r in rows] == scored[:20]


def test_yoy_growth_replay(spark):
    from collections import defaultdict

    rows = QUERIES["yoy_growth_by_type"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    ptype = {
        p.p_partkey: p.p_type
        for p in spark.read.parquet(f"{SF_DIR}/part.parquet").collect()
    }
    rev = defaultdict(int)
    for x in li:
        rev[(ptype[x.l_partkey], x.l_shipdate.year)] += round(
            x.l_extendedprice * 100
        )
    want = []
    for t in sorted({k[0] for k in rev}):
        yrs = sorted(y for tt, y in rev if tt == t)
        # LAG pairs consecutive PRESENT years (a missing year shifts
        # the comparison base, it does not produce a NULL row)
        for y0, y1 in zip(yrs, yrs[1:]):
            prev, cur = rev[(t, y0)], rev[(t, y1)]
            want.append((t, y1, cur, prev, ((cur - prev) * 1_000_000) // prev))
    got = [
        (r.ptype, r.yr, r.rev_cents, r.prev_cents, r.growth_ppm) for r in rows
    ]
    assert got == want


def test_customer_reactivation_replay(spark):
    from collections import defaultdict

    rows = QUERIES["customer_reactivation_monthly"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    by_cust = defaultdict(list)
    for o in orders:
        by_cust[o.o_custkey].append((o.o_orderdate.date(), o.o_orderkey))
    stats = defaultdict(lambda: [0, 0, 0])  # n_orders, n_first, n_react
    for ds in by_cust.values():
        ds.sort()
        for i, (d, _) in enumerate(ds):
            key = (d.year, d.month)
            stats[key][0] += 1
            if i == 0:
                stats[key][1] += 1
            elif (d - ds[i - 1][0]).days > 180:
                stats[key][2] += 1
    for r in rows:
        n, nf, nr = stats[(r.month.year, r.month.month)]
        assert (r.n_orders, r.n_first, r.n_reactivated) == (n, nf, nr)
        assert r.reactivation_ppm == nr * 1_000_000 // n
    assert len(rows) == len(stats)
    # conservation: every order is classified at most once each way
    assert all(r.n_first + r.n_reactivated <= r.n_orders for r in rows)


def test_funnel_stage_latency_replay(spark):
    from collections import defaultdict

    rows = QUERIES["funnel_stage_latency"](spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    firsts = {}
    for e in ev:
        if e.event_type in ("signup", "view", "click", "purchase"):
            k = (e.user_id, e.event_type)
            us = e.ts  # nanos int64 in raw parquet
            us = us // 1000 if isinstance(us, int) else int(
                e.ts.timestamp() * 1e6
            )
            firsts[k] = min(firsts.get(k, us), us)
    hist = defaultdict(lambda: [0, None, None])
    for s0, s1 in (("signup", "view"), ("view", "click"), ("click", "purchase")):
        for (u, t), us in firsts.items():
            if t != s0 or (u, s1) not in firsts:
                continue
            lat = firsts[(u, s1)] - us
            if lat < 0:
                continue
            b = (s0 + "->" + s1, max(lat.bit_length() - 1, 0))
            h = hist[b]
            h[0] += 1
            h[1] = lat if h[1] is None else min(h[1], lat)
            h[2] = lat if h[2] is None else max(h[2], lat)
    got = {
        (r.stage_pair, r.log2_bucket): [r.n_users, r.min_us, r.max_us]
        for r in rows
    }
    assert got == dict(hist)


def test_orderstatus_consistency_replay(spark):
    from collections import defaultdict

    rows = QUERIES["orderstatus_consistency_audit"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    per_order = defaultdict(lambda: [0, 0])
    for x in li:
        a = per_order[x.l_orderkey]
        a[0] += x.l_linestatus == "F"
        a[1] += 1
    cells = defaultdict(int)
    for o in orders:
        if o.o_orderkey not in per_order:
            mix = "no_lines"
        else:
            nf, nl = per_order[o.o_orderkey]
            mix = "all_F" if nf == nl else ("all_O" if nf == 0 else "mixed")
        cells[(o.o_orderstatus, mix)] += 1
    ok_pairs = {("F", "all_F"), ("O", "all_O"), ("P", "mixed")}
    got = {(r.status, r.line_mix): (r.n_orders, r.is_violation) for r in rows}
    want = {
        k: (v, 0 if k in ok_pairs else 1) for k, v in cells.items()
    }
    assert got == want
    # conservation: cells partition the order set
    assert sum(v for v, _ in got.values()) == len(orders)


def test_mktsegment_mix_replay(spark):
    from collections import defaultdict

    rows = QUERIES["mktsegment_nation_mix"](spark, SF_DIR).collect()
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    cells = defaultdict(int)
    for c in cust:
        cells[(f"NATION_{c.c_nationkey}", c.c_mktsegment)] += 1
    tot_nation = defaultdict(int)
    tot_seg = defaultdict(int)
    for (n, s), v in cells.items():
        tot_nation[n] += v
        tot_seg[s] += v
    tot_all = sum(cells.values())
    assert len(rows) == len(cells)
    for r in rows:
        v = cells[(r.nation, r.segment)]
        assert r.n_cust == v
        assert r.nation_share_ppm == v * 1_000_000 // tot_nation[r.nation]
        lift = v * tot_all / (tot_nation[r.nation] * tot_seg[r.segment])
        import math

        assert r.lift_milli == math.floor(lift * 1000 + 0.5)
    # per-nation shares sum to ~1e6
    by_nation = defaultdict(int)
    for r in rows:
        by_nation[r.nation] += r.nation_share_ppm
    for n, s in by_nation.items():
        assert 1_000_000 - 10 <= s <= 1_000_000


def test_activity_streak_replay(spark):
    from collections import defaultdict

    rows = QUERIES["activity_streak_histogram"](spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    days = defaultdict(set)
    for e in ev:
        ts = e.ts
        d = (
            __import__("datetime").datetime.utcfromtimestamp(ts / 1e9).date()
            if isinstance(ts, int)
            else ts.date()
        )
        days[e.user_id].add(d)
    hist = defaultdict(lambda: [0, set()])
    for u, ds in days.items():
        ds = sorted(ds)
        run = 1
        for a, b in zip(ds, ds[1:]):
            if (b - a).days == 1:
                run += 1
            else:
                hist[run][0] += 1
                hist[run][1].add(u)
                run = 1
        hist[run][0] += 1
        hist[run][1].add(u)
    got = {r.streak_len: (r.n_streaks, r.n_users) for r in rows}
    assert got == {k: (v[0], len(v[1])) for k, v in hist.items()}
    # conservation: total streak-days == total active user-days
    assert sum(k * v[0] for k, v in hist.items()) == sum(
        len(d) for d in days.values()
    )


def test_customer_value_drift_replay(spark):
    from collections import defaultdict

    rows = QUERIES["customer_value_drift_by_tenure"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    by_cust = defaultdict(list)
    for o in orders:
        by_cust[o.o_custkey].append(
            (o.o_orderdate.date(), o.o_orderkey, round(o.o_totalprice * 100))
        )
    bands = defaultdict(lambda: [0, 0, 0])
    for ds in by_cust.values():
        if len(ds) < 2:
            continue
        ds.sort()
        first, last = ds[0][2], ds[-1][2]
        d0, d1 = ds[0][0], ds[-1][0]
        tm = (d1.year * 12 + d1.month) - (d0.year * 12 + d0.month)
        b = bands[tm // 12]
        b[0] += 1
        b[1] += last > first
        b[2] += last - first
    got = {
        r.tenure_years: (r.n_customers, r.n_grew, r.grew_ppm, r.mean_delta_cents)
        for r in rows
    }
    want = {
        k: (n, g, g * 1_000_000 // n, sd // n) for k, (n, g, sd) in bands.items()
    }
    assert got == want


def test_lang_source_interaction_replay(spark):
    from collections import defaultdict

    rows = QUERIES["lang_source_interaction_scan"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    cells = defaultdict(lambda: [0, 0])
    for d in docs:
        if d.lang is None or d.source is None:
            continue
        c = cells[(d.lang, d.source)]
        c[0] += 1
        c[1] += d.n_chars
    sl, nl, ss, ns = (
        defaultdict(int),
        defaultdict(int),
        defaultdict(int),
        defaultdict(int),
    )
    for (l, s), (n, tot) in cells.items():
        sl[l] += tot
        nl[l] += n
        ss[s] += tot
        ns[s] += n
    s_all = sum(sl.values())
    n_all = sum(nl.values())
    import math

    def resid(l, s):
        n, tot = cells[(l, s)]
        x = tot / n - sl[l] / nl[l] - ss[s] / ns[s] + s_all / n_all
        return math.floor(x * 1000 + 0.5)

    scored = sorted(
        ((l, s, cells[(l, s)][0], resid(l, s)) for l, s in cells),
        key=lambda t: (-abs(t[3]), t[0], t[1]),
    )[:15]
    got = [(r.lang, r.source, r.n, r.interaction_milli) for r in rows]
    for g, w in zip(got, scored):
        assert g[:3] == w[:3]
        assert abs(g[3] - w[3]) <= 1


def test_catalog_collision_replay(spark):
    from collections import defaultdict

    rows = QUERIES["catalog_name_collision_audit"](spark, SF_DIR).collect()
    parts = spark.read.parquet(f"{SF_DIR}/part.parquet").collect()
    g = defaultdict(list)
    for p in parts:
        g[p.p_name].append(p)
    scored = []
    for name, ps in g.items():
        if len(ps) < 2:
            continue
        prices = [round(p.p_retailprice * 100) for p in ps]
        scored.append(
            (
                name,
                len(ps),
                len({p.p_brand for p in ps}),
                min(prices),
                max(prices),
                max(prices) - min(prices),
                min(p.p_partkey for p in ps),
            )
        )
    scored.sort(key=lambda t: (-t[1], t[0]))
    got = [
        (
            r.p_name,
            r.n_parts,
            r.n_brands,
            r.min_price_cents,
            r.max_price_cents,
            r.price_spread_cents,
            r.min_partkey,
        )
        for r in rows
    ]
    assert got == scored[:20]


def test_supplier_peak_ratio_replay(spark):
    from collections import defaultdict

    rows = QUERIES["supplier_month_peak_ratio"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    sm = defaultdict(lambda: defaultdict(int))
    for x in li:
        sm[x.l_suppkey][(x.l_shipdate.year, x.l_shipdate.month)] += 1
    scored = []
    for sk, months in sm.items():
        tot = sum(months.values())
        if tot < 60:
            continue
        scored.append(
            (sk, len(months), tot, max(months.values()),
             max(months.values()) * len(months) * 1000 // tot)
        )
    scored.sort(key=lambda t: (-t[4], t[0]))
    got = [
        (r.l_suppkey, r.n_months, r.total_lines, r.peak_lines,
         r.peak_to_mean_milli)
        for r in rows
    ]
    assert got == scored[:20]
    # ratio is >= 1000 by construction (peak >= mean)
    assert all(r.peak_to_mean_milli >= 1000 for r in rows)


def test_brand_pareto_replay(spark):
    from collections import defaultdict

    rows = QUERIES["brand_pareto_curve"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    brand = {
        p.p_partkey: p.p_brand
        for p in spark.read.parquet(f"{SF_DIR}/part.parquet").collect()
    }
    rev = defaultdict(int)
    for x in li:
        rev[brand[x.l_partkey]] += round(x.l_extendedprice * 100)
    order = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    tot = sum(rev.values())
    cum = 0
    want = []
    for i, (b, r) in enumerate(order, 1):
        cum += r
        want.append((i, b, r, cum * 1_000_000 // tot))
    got = [(r.brand_rank, r.brand, r.rev_cents, r.cum_share_ppm) for r in rows]
    assert got == want
    # curve is monotone and ends at ~100%
    shares = [r.cum_share_ppm for r in rows]
    assert shares == sorted(shares)
    assert shares[-1] in (999_999, 1_000_000)


def test_session_entry_value_replay(spark):
    from collections import defaultdict

    rows = QUERIES["session_value_by_entry_type"](spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    by_user = defaultdict(list)
    for e in ev:
        ts_us = e.ts // 1000 if isinstance(e.ts, int) else int(
            e.ts.timestamp() * 1e6
        )
        by_user[e.user_id].append(
            (ts_us, e.event_id, e.event_type, round(e.value * 100))
        )
    agg = defaultdict(lambda: [0, 0, 0])
    for u, evs in by_user.items():
        evs.sort()
        sessions = []
        for i, (us, eid, et, v) in enumerate(evs):
            if i == 0 or us - evs[i - 1][0] > 1_800_000_000:
                sessions.append([et, 0, 0])
            sessions[-1][1] += v
            sessions[-1][2] += 1
        for et, val, n in sessions:
            a = agg[et]
            a[0] += 1
            a[1] += n
            a[2] += val
    got = {
        r.entry_type: (
            r.n_sessions,
            r.n_events,
            r.total_value_cents,
            r.avg_session_value_cents,
        )
        for r in rows
    }
    want = {
        et: (ns, ne, tv, tv // ns) for et, (ns, ne, tv) in agg.items()
    }
    assert got == want


def test_doc_cooccurrence_replay(spark):
    import re
    from collections import Counter, defaultdict
    from itertools import combinations

    rows = QUERIES["doc_cooccurrence_lift_topk"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    df, c_ab = Counter(), Counter()
    n_docs = 0
    for d in docs:
        if d.text is None:
            continue
        n_docs += 1
        terms = sorted({w for w in re.split(r"\s+", d.text.lower()) if w})
        df.update(terms)
        c_ab.update(combinations(terms, 2))
    import math

    scored = [
        (a, b, c, df[a], df[b],
         math.floor(c * n_docs / (df[a] * df[b]) * 1000 + 0.5))
        for (a, b), c in c_ab.items()
        if c >= 5
    ]
    scored.sort(key=lambda t: (-t[5], t[0], t[1]))
    got = [
        (r.term_a, r.term_b, r.c_ab, r.df_a, r.df_b, r.lift_milli)
        for r in rows
    ]
    assert got == scored[:20]


def test_centroid_classifier_replay(spark):
    import math
    from collections import defaultdict

    rows = QUERIES["centroid_classifier_eval"](spark, SF_DIR).collect()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    vecs = [
        (e.vec_id, e.label,
         [int(round(float(x) * 1_000_000)) for x in e.embedding])
        for e in emb
    ]
    sums = defaultdict(lambda: None)
    for _, l, v in vecs:
        if sums[l] is None:
            sums[l] = list(v)
        else:
            sums[l] = [a + b for a, b in zip(sums[l], v)]
    nrm = {l: float(sum(x * x for x in s)) for l, s in sums.items()}
    conf = defaultdict(int)
    for _, true_l, v in vecs:
        best = min(
            sorted(sums),
            key=lambda l: (
                -sum(a * b for a, b in zip(v, sums[l])) / math.sqrt(nrm[l]),
                l,
            ),
        )
        conf[(true_l, best)] += 1
    got = {(r.true_label, r.predicted_label): r.n for r in rows}
    assert got == dict(conf)
    # the classifier must beat chance on the diagonal
    diag = sum(v for (a, b), v in conf.items() if a == b)
    assert diag * len(sums) > sum(conf.values())


def test_temporal_integrity_replay(spark):
    from collections import defaultdict

    rows = QUERIES["temporal_integrity_by_year"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    od = {
        o.o_orderkey: o.o_orderdate.date()
        for o in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    }
    agg = defaultdict(lambda: [0, 0, None])
    for x in li:
        delta = (x.l_shipdate.date() - od[x.l_orderkey]).days
        a = agg[x.l_shipdate.year]
        a[0] += 1
        a[1] += delta < 0
        a[2] = delta if a[2] is None else min(a[2], delta)
    got = {
        r.yr: (r.n_lines, r.n_violations, r.violation_ppm, r.worst_delta_days)
        for r in rows
    }
    want = {
        y: (n, v, v * 1_000_000 // n, w) for y, (n, v, w) in agg.items()
    }
    assert got == want


def test_month_end_loading_replay(spark):
    import calendar
    from collections import defaultdict

    rows = QUERIES["month_end_loading_audit"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    agg = defaultdict(lambda: [0, 0])
    for o in orders:
        d = o.o_orderdate.date()
        dim = calendar.monthrange(d.year, d.month)[1]
        a = agg[(d.year, d.month)]
        a[0] += 1
        a[1] += (dim - d.day) < 3
    import math

    for r in rows:
        n, tail = agg[(r.month.year, r.month.month)]
        dim = calendar.monthrange(r.month.year, r.month.month)[1]
        assert (r.n_orders, r.n_tail) == (n, tail)
        assert r.tail_share_ppm == tail * 1_000_000 // n
        assert r.loading_lift_milli == math.floor(
            tail * dim / (n * 3) * 1000 + 0.5
        )
    assert len(rows) == len(agg)


def test_part_price_consistency_replay(spark):
    from collections import defaultdict

    rows = QUERIES["part_price_consistency_topk"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    units = defaultdict(list)
    for x in li:
        q = round(x.l_quantity)
        if q >= 1:
            units[x.l_partkey].append(round(x.l_extendedprice * 100) * 1000 // q)
    scored = []
    for pk, us in units.items():
        if len(us) < 10:
            continue
        lo, hi = min(us), max(us)
        scored.append((pk, len(us), lo, hi, (hi - lo) * 1000 // lo))
    scored.sort(key=lambda t: (-t[4], t[0]))
    got = [
        (r.l_partkey, r.n_lines, r.min_unit_milli, r.max_unit_milli,
         r.spread_milli)
        for r in rows
    ]
    assert got == scored[:20]


def test_t_closeness_replay(spark):
    import math
    from collections import defaultdict

    rows = QUERIES["t_closeness_audit"](spark, SF_DIR).collect()
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    cells = defaultdict(int)
    for c in cust:
        cells[(c.c_nationkey, c.c_mktsegment)] += 1
    nks = {k for k, _ in cells}
    segs = {s for _, s in cells}
    n_g = defaultdict(int)
    n_s = defaultdict(int)
    for (k, s), v in cells.items():
        n_g[k] += v
        n_s[s] += v
    n_all = sum(cells.values())
    want = {}
    for k in nks:
        t = sum(
            math.floor(
                abs(cells.get((k, s), 0) / n_g[k] - n_s[s] / n_all) * 1e9 + 0.5
            )
            for s in segs
        )
        want[k] = (n_g[k], t // 2)
    got = {r.nationkey: (r.n_customers, r.tvd_nano) for r in rows}
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) <= len(segs)  # nano slack per term
    # TVD is a distance: in [0, 1e9]
    assert all(0 <= r.tvd_nano <= 1_000_000_000 for r in rows)


def test_ivm_distinct_delta_replay(spark):
    from collections import defaultdict

    rows = QUERIES["ivm_distinct_delta"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    first = {}
    for o in orders:
        d = o.o_orderdate.date()
        k = o.o_custkey
        first[k] = min(first.get(k, d), d)
    months = defaultdict(int)
    for d in first.values():
        months[(d.year, d.month)] += 1
    assert len(rows) == len(months)
    for r in rows:
        assert r.n_full == months[(r.month.year, r.month.month)]
        # the WHOLE POINT: incremental equals recompute everywhere
        assert r.n_inc == r.n_full
        assert r.consistent == 1


def test_part_launch_velocity_replay(spark):
    from collections import defaultdict

    rows = QUERIES["part_launch_velocity_topk"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    ships = defaultdict(list)
    for x in li:
        ships[x.l_partkey].append(x.l_shipdate.date())
    scored = []
    for pk, ds in ships.items():
        if len(ds) < 20:
            continue
        launch = min(ds)
        nl = sum((d - launch).days < 90 for d in ds)
        scored.append((pk, len(ds), nl, nl * 1_000_000 // len(ds)))
    scored.sort(key=lambda t: (-t[3], t[0]))
    got = [(r.l_partkey, r.n_lines, r.n_launch, r.launch_share_ppm)
           for r in rows]
    assert got == scored[:20]


def test_debt_quadrant_replay(spark):
    from collections import defaultdict

    rows = QUERIES["debt_activity_quadrant"](spark, SF_DIR).collect()
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    active = {
        o.o_custkey
        for o in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
        if o.o_orderdate.year >= 1998
    }
    cells = defaultdict(lambda: [0, 0])
    for c in cust:
        k = (
            "in_debt" if c.c_acctbal < 0 else "solvent",
            "active_1998" if c.c_custkey in active else "inactive",
        )
        cells[k][0] += 1
        cells[k][1] += round(c.c_acctbal * 100)
    got = {
        (r.balance_band, r.activity_band): (r.n_customers,
                                            r.total_balance_cents)
        for r in rows
    }
    assert got == {k: tuple(v) for k, v in cells.items()}
    # quadrants partition the customer base
    assert sum(v[0] for v in got.values()) == len(cust)


def test_hill_tail_replay(spark):
    import math

    [r] = QUERIES["hill_tail_index"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    vals = sorted(
        (round(o.o_totalprice * 100) for o in orders), reverse=True
    )[:101]
    vmin = vals[-1]
    lnrs = [
        math.floor(math.log(v / vmin) * 1e9 + 0.5) for v in vals[:-1]
    ]
    assert r.k_order_stats == 100
    assert abs(r.sum_ln_ratio_nano - sum(lnrs)) <= 100
    alpha = 100 / (sum(lnrs) / 1e9) * 1e6
    assert abs(r.hill_alpha_micro - alpha) <= abs(alpha) * 1e-5 + 2
    # alpha is positive and, for bounded synthetic prices, large
    assert r.hill_alpha_micro > 1_000_000


def test_bass_fit_replay(spark):
    import math
    from collections import defaultdict

    [r] = QUERIES["bass_diffusion_fit"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    first = {}
    for o in orders:
        d = o.o_orderdate.date()
        first[o.o_custkey] = min(first.get(o.o_custkey, d), d)
    months = defaultdict(int)
    for d in first.values():
        months[d.year * 12 + d.month] += 1
    mis = sorted(months)
    pts = []
    cum = 0
    for mi in mis:
        pts.append((cum, months[mi]))
        cum += months[mi]
    n = len(pts)
    sx1 = sum(x for x, _ in pts)
    sx2 = sum(x * x for x, _ in pts)
    sx3 = sum(x**3 for x, _ in pts)
    sx4 = sum(x**4 for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sx2y = sum(x * x * y for x, y in pts)
    import numpy as np

    A = np.array([[n, sx1, sx2], [sx1, sx2, sx3], [sx2, sx3, sx4]], float)
    b = np.array([sy, sxy, sx2y], float)
    a_, b_, c_ = np.linalg.solve(A, b)
    assert r.n_months == n
    assert abs(r.a_milli - a_ * 1000) <= max(2, abs(a_ * 1000) * 1e-6)
    assert abs(r.b_nano - b_ * 1e9) <= max(2, abs(b_ * 1e9) * 1e-6)
    assert abs(r.c_pico - c_ * 1e12) <= max(2, abs(c_ * 1e12) * 1e-6)


def test_newsvendor_replay(spark):
    from collections import defaultdict

    rows = QUERIES["newsvendor_quantile_by_type"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    ptype = {
        p.p_partkey: p.p_type
        for p in spark.read.parquet(f"{SF_DIR}/part.parquet").collect()
    }
    md = defaultdict(lambda: defaultdict(int))
    for x in li:
        md[ptype[x.l_partkey]][
            (x.l_shipdate.year, x.l_shipdate.month)
        ] += round(x.l_quantity)
    for r in rows:
        demands = sorted(md[r.ptype].values())
        nm = len(demands)
        assert r.n_months == nm
        assert r.mean_demand == sum(demands) // nm
        assert r.q80_stock == demands[(nm * 8 + 9) // 10 - 1]
        # the quantile stock covers the mean-stocker's shortfall
        assert r.q80_stock >= r.mean_demand
    assert len(rows) == len(md)


def test_order_dispersion_replay(spark):
    import math
    from collections import Counter

    [r] = QUERIES["order_count_dispersion"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    k = Counter(o.o_custkey for o in orders)
    n = len(k)
    s1 = sum(k.values())
    s2 = sum(v * v for v in k.values())
    mu = s1 / n
    vmr = (s2 / n - mu * mu) / mu
    assert (r.n_customers, r.n_orders) == (n, s1)
    assert abs(r.vmr_micro - vmr * 1e6) <= 1
    assert abs(
        r.z_overdisp_micro - (vmr - 1) * math.sqrt((n - 1) / 2) * 1e6
    ) <= 2


def test_order_reconciliation_replay(spark):
    from collections import defaultdict

    rows = QUERIES["order_total_reconciliation"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    lines = defaultdict(int)
    for x in li:
        lines[x.l_orderkey] += round(
            x.l_extendedprice * (1 - x.l_discount) * (1 + x.l_tax) * 100
        )
    agg = defaultdict(lambda: [0, 0, 0])
    for o in orders:
        h = round(o.o_totalprice * 100)
        gap = abs(h - lines.get(o.o_orderkey, 0))
        a = agg[o.o_orderdate.year]
        a[0] += 1
        a[1] += gap * 100 > h
        a[2] = max(a[2], gap)
    got = {
        r.yr: (r.n_orders, r.n_mismatched, r.mismatch_ppm, r.max_gap_cents)
        for r in rows
    }
    want = {
        y: (n, m, m * 1_000_000 // n, g) for y, (n, m, g) in agg.items()
    }
    assert got == want


def test_discount_response_replay(spark):
    from collections import defaultdict

    rows = QUERIES["discount_demand_response"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    g = defaultdict(lambda: [0, 0])
    for x in li:
        a = g[round(x.l_discount * 100)]
        a[0] += 1
        a[1] += round(x.l_quantity)
    base = g[0][1] * 1000 // g[0][0]
    assert len(rows) == len(g)
    for r in rows:
        n, q = g[r.disc_pct]
        assert (r.n_lines, r.mean_qty_milli) == (n, q * 1000 // n)
        assert r.lift_vs_base_milli == (q * 1000 // n) * 1000 // base
    # the zero-discount row is its own baseline
    assert next(
        r.lift_vs_base_milli for r in rows if r.disc_pct == 0
    ) == 1000


def test_suppliers_per_order_replay(spark):
    from collections import defaultdict

    rows = QUERIES["suppliers_per_order_profile"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    supp, rev = defaultdict(set), defaultdict(int)
    for x in li:
        supp[x.l_orderkey].add(x.l_suppkey)
        rev[x.l_orderkey] += round(x.l_extendedprice * 100)
    hist = defaultdict(lambda: [0, 0])
    for k in supp:
        h = hist[len(supp[k])]
        h[0] += 1
        h[1] += rev[k]
    got = {r.suppliers_per_order: (r.n_orders, r.rev_cents) for r in rows}
    assert got == {k: tuple(v) for k, v in hist.items()}


def test_key_account_replay(spark):
    from collections import defaultdict

    rows = QUERIES["key_account_concentration_by_type"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    ocust = {
        o.o_orderkey: o.o_custkey
        for o in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    }
    ptype = {
        p.p_partkey: p.p_type
        for p in spark.read.parquet(f"{SF_DIR}/part.parquet").collect()
    }
    tc = defaultdict(lambda: defaultdict(int))
    for x in li:
        tc[ptype[x.l_partkey]][ocust[x.l_orderkey]] += round(
            x.l_extendedprice * 100
        )
    for r in rows:
        cust = tc[r.ptype]
        order = sorted(cust.items(), key=lambda kv: (-kv[1], kv[0]))
        total = sum(cust.values())
        (k1, v1), (_, v2) = order[0], order[1]
        assert (r.n_customers, r.top_custkey) == (len(cust), k1)
        assert r.top_share_ppm == v1 * 1_000_000 // total
        assert r.second_share_ppm == v2 * 1_000_000 // total
        assert r.top_gap_milli == v1 * 1000 // v2
        assert r.top_gap_milli >= 1000  # #1 >= #2 by construction
    assert len(rows) == len(tc)


def test_weekpart_lift_replay(spark):
    import math
    from collections import defaultdict

    rows = QUERIES["weekpart_nation_lift"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    cust = {
        c.c_custkey: c.c_nationkey
        for c in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    g = defaultdict(lambda: [0, 0, 0, 0])
    for o in orders:
        nk = cust[o.o_custkey]
        wk = o.o_orderdate.date().isoweekday() in (6, 7)
        v = round(o.o_totalprice * 100)
        a = g[f"NATION_{nk}"]
        a[0] += 1
        a[1] += wk
        a[2] += v
        a[3] += v if wk else 0
    tw = sum(a[3] for a in g.values())
    tr = sum(a[2] for a in g.values())
    assert len(rows) == len(g)
    for r in rows:
        n, nw, rev, wrev = g[r.nation]
        assert (r.n_orders, r.n_weekend) == (n, nw)
        assert r.weekend_share_ppm == wrev * 1_000_000 // rev
        assert r.weekend_lift_milli == math.floor(
            wrev * tr / (rev * tw) * 1000 + 0.5
        )


def test_purchase_acceleration_replay(spark):
    from collections import defaultdict

    rows = QUERIES["purchase_acceleration_share"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    by_cust = defaultdict(list)
    for o in orders:
        by_cust[o.o_custkey].append((o.o_orderdate.date(), o.o_orderkey))
    bands = defaultdict(int)
    for ds in by_cust.values():
        ds.sort()
        gaps = [(b[0] - a[0]).days for a, b in zip(ds, ds[1:])]
        if len(gaps) < 4:
            continue
        n = len(gaps)
        sx = sum(range(1, n + 1))
        sy = sum(gaps)
        sxy = sum((i + 1) * g for i, g in enumerate(gaps))
        num = n * sxy - sx * sy
        bands[
            "accelerating" if num < 0 else
            ("decelerating" if num > 0 else "flat")
        ] += 1
    got = {r.band: r.n_customers for r in rows}
    assert got == dict(bands)


def test_first_order_dow_replay(spark):
    from collections import Counter, defaultdict

    rows = QUERIES["first_order_dow_profile"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    first = {}
    alld = Counter()
    for o in orders:
        d = o.o_orderdate.date()
        alld[d.isoweekday() % 7 + 1] += 1
        k = o.o_custkey
        first[k] = min(first.get(k, d), d)
    fd = Counter(d.isoweekday() % 7 + 1 for d in first.values())
    tf, ta = sum(fd.values()), sum(alld.values())
    import math

    assert len(rows) == len(fd)
    for r in rows:
        assert (r.n_first, r.n_all) == (fd[r.dow], alld[r.dow])
        assert r.first_share_ppm == fd[r.dow] * 1_000_000 // tf
        assert r.acquisition_lift_milli == math.floor(
            fd[r.dow] * ta / (alld[r.dow] * tf) * 1000 + 0.5
        )
    # every customer acquired exactly once
    assert sum(r.n_first for r in rows) == len(first)


def test_part_lifecycle_replay(spark):
    from collections import defaultdict

    rows = QUERIES["part_lifecycle_span"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    pl = {}
    for x in li:
        d = x.l_shipdate.date()
        if x.l_partkey not in pl:
            pl[x.l_partkey] = [d, d, 0]
        p = pl[x.l_partkey]
        p[0] = min(p[0], d)
        p[1] = max(p[1], d)
        p[2] += 1
    horizon = max(p[1] for p in pl.values())
    cells = defaultdict(lambda: [0, 0, 0])
    for first_d, last_d, n in pl.values():
        c = cells[(last_d - first_d).days // 90]
        c[0] += 1
        c[1] += (horizon - last_d).days <= 90
        c[2] += n
    got = {
        r.span_quarters: (r.n_parts, r.n_still_active, r.n_lines)
        for r in rows
    }
    assert got == {k: tuple(v) for k, v in cells.items()}
    # spans partition the catalog
    assert sum(v[0] for v in got.values()) == len(pl)


def test_catalog_expansion_replay(spark):
    from collections import defaultdict

    rows = QUERIES["catalog_expansion_curve"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    first = {}
    for x in li:
        d = x.l_shipdate.date()
        first[x.l_partkey] = min(first.get(x.l_partkey, d), d)
    months = defaultdict(int)
    for d in first.values():
        months[(d.year, d.month)] += 1
    cum = 0
    assert len(rows) == len(months)
    for r in rows:
        n = months[(r.month.year, r.month.month)]
        cum += n
        assert (r.n_new, r.cum_catalog) == (n, cum)
    # the curve ends at the full catalog
    assert rows[-1].cum_catalog == len(first)


def test_regional_parity_replay(spark):
    from collections import defaultdict

    rows = QUERIES["regional_price_parity_index"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    ocust = {
        o.o_orderkey: o.o_custkey
        for o in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    }
    cn = {
        c.c_custkey: c.c_nationkey
        for c in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    nr = {
        n.n_nationkey: n.n_regionkey
        for n in spark.read.parquet(f"{SF_DIR}/nation.parquet").collect()
    }
    rn = {
        r.r_regionkey: r.r_name
        for r in spark.read.parquet(f"{SF_DIR}/region.parquet").collect()
    }
    lp = defaultdict(lambda: [0, 0])
    for x in li:
        reg = rn[nr[cn[ocust[x.l_orderkey]]]]
        a = lp[(x.l_partkey, reg)]
        a[0] += round(x.l_extendedprice * 100)
        a[1] += round(x.l_quantity)
    gp = defaultdict(lambda: [0, 0])
    for (pk, _), (rev, qty) in lp.items():
        gp[pk][0] += rev
        gp[pk][1] += qty
    agg = defaultdict(lambda: [0, 0, 0])
    for (pk, reg), (rev, qty) in lp.items():
        if qty <= 0:
            continue
        a = agg[reg]
        a[0] += (rev * 1000 // qty) * qty
        a[1] += (gp[pk][0] * 1000 // gp[pk][1]) * qty
        a[2] += 1
    got = {r.region: (r.n_parts, r.price_parity_milli) for r in rows}
    want = {
        reg: (n, num * 1000 // den) for reg, (num, den, n) in agg.items()
    }
    assert got == want


def test_brand_comovement_replay(spark):
    import math
    from collections import defaultdict
    from itertools import combinations

    rows = QUERIES["brand_price_comovement_topk"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    brand = {
        p.p_partkey: p.p_brand
        for p in spark.read.parquet(f"{SF_DIR}/part.parquet").collect()
    }
    bm = defaultdict(lambda: [0, 0])
    for x in li:
        k = (brand[x.l_partkey], x.l_shipdate.year * 12 + x.l_shipdate.month)
        bm[k][0] += round(x.l_extendedprice * 100)
        bm[k][1] += round(x.l_quantity)
    up = {
        k: rev * 1000 // qty for k, (rev, qty) in bm.items() if qty > 0
    }
    series = defaultdict(dict)
    for (b, mi), u in up.items():
        series[b][mi] = u
    scored = []
    for ba, bb in combinations(sorted(series), 2):
        common = sorted(set(series[ba]) & set(series[bb]))
        if len(common) < 24:
            continue
        xs = [series[ba][m] for m in common]
        ys = [series[bb][m] for m in common]
        n = len(common)
        sa, sb = sum(xs), sum(ys)
        sab = sum(x * y for x, y in zip(xs, ys))
        saa = sum(x * x for x in xs)
        sbb = sum(y * y for y in ys)
        corr = (n * sab - sa * sb) / math.sqrt(
            (n * saa - sa * sa) * (n * sbb - sb * sb)
        )
        scored.append((ba, bb, n, math.floor(corr * 1e6 + 0.5)))
    scored.sort(key=lambda t: (-t[3], t[0], t[1]))
    got = [(r.brand_a, r.brand_b, r.n, r.price_corr_micro) for r in rows]
    for g, w in zip(got, scored[:15]):
        assert g[:3] == w[:3]
        assert abs(g[3] - w[3]) <= 1


def test_lead_time_by_nation_replay(spark):
    import math
    from collections import defaultdict

    rows = QUERIES["lead_time_by_supplier_nation"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    od = {
        o.o_orderkey: o.o_orderdate.date()
        for o in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    }
    snat = {
        s.s_suppkey: s.s_nationkey
        for s in spark.read.parquet(f"{SF_DIR}/supplier.parquet").collect()
    }
    delays = defaultdict(list)
    for x in li:
        delays[snat[x.l_suppkey]].append(
            (x.l_shipdate.date() - od[x.l_orderkey]).days
        )
    assert len(rows) == len(delays)
    for r in rows:
        nk = int(r.supplier_nation.split("_")[1])
        ds = delays[nk]
        n, s1 = len(ds), sum(ds)
        assert r.n_lines == n
        assert r.mean_delay_milli == (s1 * 1000) // n  # python // IS floor
        std = math.sqrt(sum(d * d for d in ds) / n - (s1 / n) ** 2)
        assert abs(r.std_micro - std * 1e6) <= 2


def test_error_concentration_replay(spark):
    from collections import Counter

    [r] = QUERIES["error_concentration_dispersion"](spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    users = {e.user_id for e in ev}
    errs = Counter(e.user_id for e in ev if e.event_type == "error")
    n = len(users)
    s1 = sum(errs.values())
    s2 = sum(v * v for v in errs.values())
    mu = s1 / n
    vmr = (s2 / n - mu * mu) / mu
    assert (r.n_users, r.n_errors) == (n, s1)
    assert r.n_error_free == n - len(errs)
    assert r.max_errors == max(errs.values())
    import math

    assert abs(r.vmr_micro - vmr * 1e6) <= 1


def test_median_price_by_qty_replay(spark):
    from collections import defaultdict

    rows = QUERIES["median_price_by_quantity"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    prices = defaultdict(list)
    for x in li:
        prices[round(x.l_quantity)].append(round(x.l_extendedprice * 100))
    assert len(rows) == len(prices)
    for r in rows:
        ps = sorted(prices[r.qty])
        assert r.n_lines == len(ps)
        # lower median: smallest value whose inclusive ECDF >= 1/2
        assert r.median_price_cents == ps[(len(ps) + 1) // 2 - 1]


def test_second_order_latency_replay(spark):
    from collections import defaultdict

    rows = QUERIES["second_order_latency_by_cohort"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    by_cust = defaultdict(list)
    for o in orders:
        by_cust[o.o_custkey].append((o.o_orderdate.date(), o.o_orderkey))
    lats = defaultdict(list)
    for ds in by_cust.values():
        if len(ds) < 2:
            continue
        ds.sort()
        cohort = (ds[0][0].year, ds[0][0].month)
        lats[cohort].append((ds[1][0] - ds[0][0]).days)
    assert len(rows) == len(lats)
    for r in rows:
        ls = sorted(lats[(r.cohort_month.year, r.cohort_month.month)])
        assert r.n_customers == len(ls)
        assert r.median_latency_days == ls[(len(ls) + 1) // 2 - 1]


def test_basket_value_interaction_replay(spark):
    from collections import defaultdict

    rows = QUERIES["basket_size_value_interaction"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    po = defaultdict(lambda: [0, 0])
    for x in li:
        a = po[x.l_orderkey]
        a[0] += 1
        a[1] += round(x.l_extendedprice * 100)
    bands = defaultdict(lambda: [0, 0, 0])
    for n, rev in po.values():
        b = bands[n]
        b[0] += 1
        b[1] += rev
        b[2] += n
    got = {
        r.basket_lines: (r.n_orders, r.mean_line_cents, r.mean_order_cents)
        for r in rows
    }
    assert got == {
        k: (c, sr // sl, sr // c) for k, (c, sr, sl) in bands.items()
    }


def test_multinational_rate_replay(spark):
    from collections import defaultdict

    rows = QUERIES["multinational_fulfillment_rate"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    snat = {
        s.s_suppkey: s.s_nationkey
        for s in spark.read.parquet(f"{SF_DIR}/supplier.parquet").collect()
    }
    oyear = {
        o.o_orderkey: o.o_orderdate.year
        for o in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    }
    nations = defaultdict(set)
    for x in li:
        nations[x.l_orderkey].add(snat[x.l_suppkey])
    agg = defaultdict(lambda: [0, 0, 0])
    for ok, ns in nations.items():
        a = agg[oyear[ok]]
        a[0] += 1
        a[1] += len(ns) > 1
        a[2] += len(ns)
    got = {
        r.yr: (r.n_orders, r.multi_nation_ppm, r.mean_nations_milli)
        for r in rows
    }
    assert got == {
        y: (n, m * 1_000_000 // n, sn * 1000 // n)
        for y, (n, m, sn) in agg.items()
    }


def test_key_time_correlation_replay(spark):
    import math

    [r] = QUERIES["key_time_correlation"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    import datetime

    epoch = datetime.date(1970, 1, 1)
    pts = [
        (o.o_orderkey, (o.o_orderdate.date() - epoch).days) for o in orders
    ]
    n = len(pts)
    sa = sum(a for a, _ in pts)
    sb = sum(b for _, b in pts)
    sab = sum(a * b for a, b in pts)
    saa = sum(a * a for a, _ in pts)
    sbb = sum(b * b for _, b in pts)
    corr = (n * sab - sa * sb) / math.sqrt(
        (n * saa - sa * sa) * (n * sbb - sb * sb)
    )
    assert r.n_orders == n
    assert abs(r.key_time_corr_micro - corr * 1e6) <= 2


def test_price_endings_replay(spark):
    from collections import Counter

    rows = QUERIES["price_ending_digits_topk"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    c = Counter(round(o.o_totalprice * 100) % 100 for o in orders)
    tot = sum(c.values())
    scored = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [(r.ending, r.n, r.observed_ppm, r.deviation_ppm) for r in rows]
    want = [
        (e, n, n * 1_000_000 // tot, n * 1_000_000 // tot - 10_000)
        for e, n in scored
    ]
    assert got == want


def test_dow_consistency_replay(spark):
    from collections import Counter, defaultdict

    rows = QUERIES["dow_consistency_histogram"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    per_cust = defaultdict(Counter)
    for o in orders:
        per_cust[o.o_custkey][o.o_orderdate.date().isoweekday() % 7 + 1] += 1
    hist = Counter()
    for c in per_cust.values():
        n = sum(c.values())
        if n < 5:
            continue
        hist[max(c.values()) * 10 // n] += 1
    got = {r.modal_share_decile: r.n_customers for r in rows}
    assert got == dict(hist)
    # a modal share is at least 1/7 and at most 1: deciles 1..10
    assert all(1 <= d <= 10 for d in got)


def test_event_run_histogram_replay(spark):
    from collections import Counter, defaultdict

    rows = QUERIES["event_type_run_histogram"](spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    by_user = defaultdict(list)
    for e in ev:
        us = e.ts if isinstance(e.ts, int) else int(e.ts.timestamp() * 1e9)
        by_user[e.user_id].append((us, e.event_id, e.event_type))
    hist = Counter()
    for evs in by_user.values():
        evs.sort()
        run_type, run_len = None, 0
        for _, _, t in evs:
            if t == run_type:
                run_len += 1
            else:
                if run_type is not None:
                    hist[(run_type, run_len)] += 1
                run_type, run_len = t, 1
        hist[(run_type, run_len)] += 1
    got = {(r.event_type, r.run_len): r.n_runs for r in rows}
    assert got == dict(hist)
    # conservation: total run-lengths cover every event once
    assert sum(l * n for (_, l), n in hist.items()) == len(ev)


def test_linestatus_quarter_replay(spark):
    from collections import defaultdict

    rows = QUERIES["linestatus_share_by_quarter"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    agg = defaultdict(lambda: [0, 0])
    for x in li:
        yq = x.l_shipdate.year * 10 + (x.l_shipdate.month + 2) // 3
        a = agg[yq]
        a[0] += 1
        a[1] += x.l_linestatus == "F"
    got = {r.year_quarter: (r.n_lines, r.finished_ppm) for r in rows}
    assert got == {
        q: (n, f * 1_000_000 // n) for q, (n, f) in agg.items()
    }


def test_revenue_volatility_replay(spark):
    import math
    from collections import defaultdict

    rows = QUERIES["revenue_volatility_by_nation"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    cust = {
        c.c_custkey: c.c_nationkey
        for c in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    nm = defaultdict(int)
    for o in orders:
        nm[(cust[o.o_custkey],
            o.o_orderdate.year * 12 + o.o_orderdate.month)] += round(
            o.o_totalprice * 100
        )
    series = defaultdict(list)
    for (nk, _), rev in nm.items():
        series[nk].append(rev)
    assert len(rows) == len(series)
    for r in rows:
        nk = int(r.nation.split("_")[1])
        xs = series[nk]
        n, s1 = len(xs), sum(xs)
        mu = s1 / n
        cv = math.sqrt(sum(x * x for x in xs) / n - mu * mu) / mu
        assert r.n_months == n
        assert abs(r.cv_micro - cv * 1e6) <= 2
    # league is sorted most turbulent first
    cvs = [r.cv_micro for r in rows]
    assert cvs == sorted(cvs, reverse=True)


def test_portfolio_quadrant_replay(spark):
    rows = QUERIES["market_portfolio_quadrant"](spark, SF_DIR).collect()
    cagr = {
        r.nation: r.cagr_micro
        for r in QUERIES["nation_revenue_cagr"](spark, SF_DIR).collect()
    }
    vol = {
        r.nation: r.cv_micro
        for r in QUERIES["revenue_volatility_by_nation"](
            spark, SF_DIR
        ).collect()
    }
    nations = sorted(set(cagr) & set(vol))

    def lower_median(vals):
        s = sorted(vals)
        return s[(len(s) + 1) // 2 - 1]

    mg = lower_median([(cagr[n], n) for n in nations])[0]
    mv = lower_median([(vol[n], n) for n in nations])[0]
    from collections import defaultdict

    cells = defaultdict(list)
    for n in nations:
        if cagr[n] > mg and vol[n] <= mv:
            q = "star_growth_stable"
        elif cagr[n] > mg:
            q = "question_growth_volatile"
        elif vol[n] <= mv:
            q = "cashcow_slow_stable"
        else:
            q = "dog_slow_volatile"
        cells[q].append(n)
    got = {r.quadrant: (r.n_nations, r.example_nation) for r in rows}
    assert got == {q: (len(v), min(v)) for q, v in cells.items()}
    # quadrants partition the markets
    assert sum(v[0] for v in got.values()) == len(nations)


def test_delay_discount_replay(spark):
    from collections import defaultdict

    rows = QUERIES["delay_by_discount_grid"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    od = {
        o.o_orderkey: o.o_orderdate.date()
        for o in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    }
    agg = defaultdict(lambda: [0, 0])
    for x in li:
        a = agg[round(x.l_discount * 100)]
        a[0] += 1
        a[1] += (x.l_shipdate.date() - od[x.l_orderkey]).days
    got = {r.disc_pct: (r.n_lines, r.mean_delay_milli) for r in rows}
    assert got == {
        d: (n, (s * 1000) // n) for d, (n, s) in agg.items()
    }


def test_type_movers_replay(spark):
    from collections import defaultdict

    rows = QUERIES["type_mom_movers_topk"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    ptype = {
        p.p_partkey: p.p_type
        for p in spark.read.parquet(f"{SF_DIR}/part.parquet").collect()
    }
    tm = defaultdict(int)
    for x in li:
        tm[(ptype[x.l_partkey],
            x.l_shipdate.year * 12 + x.l_shipdate.month)] += round(
            x.l_extendedprice * 100
        )
    series = defaultdict(dict)
    for (t, mi), rev in tm.items():
        series[t][mi] = rev
    scored = []
    for t, ms in series.items():
        mis = sorted(ms)
        for a, b in zip(mis, mis[1:]):
            scored.append((t, b, ms[b], ms[b] - ms[a]))
    scored.sort(key=lambda r: (-abs(r[3]), r[0], r[1]))
    got = [(r.ptype, r.month_index, r.rev_cents, r.delta_cents) for r in rows]
    assert got == scored[:15]


def test_volume_value_divergence_replay(spark):
    from collections import defaultdict

    rows = QUERIES["volume_value_divergence_by_year"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    m = defaultdict(lambda: [0, 0])
    for o in orders:
        k = o.o_orderdate.year * 12 + o.o_orderdate.month
        m[k][0] += 1
        m[k][1] += round(o.o_totalprice * 100)
    mis = sorted(m)
    agg = defaultdict(lambda: [0, 0])
    for a, b in zip(mis, mis[1:]):
        dv = m[b][0] - m[a][0]
        dr = m[b][1] - m[a][1]
        y = agg[b // 12]
        y[0] += 1
        y[1] += (dv > 0 and dr < 0) or (dv < 0 and dr > 0)
    got = {
        r.yr_index: (r.n_months, r.n_diverging, r.divergence_ppm)
        for r in rows
    }
    assert got == {
        y: (n, d, d * 1_000_000 // n) for y, (n, d) in agg.items()
    }


def test_brand_peak_month_replay(spark):
    from collections import defaultdict

    rows = QUERIES["brand_peak_month"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    brand = {
        p.p_partkey: p.p_brand
        for p in spark.read.parquet(f"{SF_DIR}/part.parquet").collect()
    }
    bm = defaultdict(lambda: defaultdict(int))
    for x in li:
        bm[brand[x.l_partkey]][x.l_shipdate.month] += round(
            x.l_extendedprice * 100
        )
    assert len(rows) == len(bm)
    for r in rows:
        ms = bm[r.brand]
        tot = sum(ms.values())
        peak_mo, peak_rev = max(ms.items(), key=lambda kv: (kv[1], -kv[0]))
        assert (r.peak_month, r.peak_rev_cents) == (peak_mo, peak_rev)
        assert r.peak_share_ppm == peak_rev * 1_000_000 // tot
        # a peak month carries at least 1/12 of the year
        assert r.peak_share_ppm >= 1_000_000 // 12


def test_wilson_rank_replay(spark):
    import math
    from collections import defaultdict

    rows = QUERIES["return_rate_wilson_rank"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    sup = defaultdict(lambda: [0, 0])
    for x in li:
        a = sup[x.l_suppkey]
        a[0] += 1
        a[1] += x.l_returnflag == "R"
    z = 1.959964
    scored = []
    for sk, (n, x) in sup.items():
        p = x / n
        w = (
            p + z * z / (2 * n)
            - z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
        ) / (1 + z * z / n)
        scored.append((sk, n, x, x * 1_000_000 // n,
                       math.floor(w * 1e6 + 0.5)))
    scored.sort(key=lambda t: (-t[4], t[0]))
    got = [(r.l_suppkey, r.n, r.x, r.raw_rate_ppm, r.wilson_lower_ppm)
           for r in rows]
    for g, w in zip(got, scored[:15]):
        assert g[:4] == w[:4]
        assert abs(g[4] - w[4]) <= 1
    # the lower bound never exceeds the raw rate
    assert all(r.wilson_lower_ppm <= r.raw_rate_ppm for r in rows)


def test_route_delay_replay(spark):
    from collections import defaultdict

    rows = QUERIES["route_delay_topk"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    od = {
        o.o_orderkey: (o.o_custkey, o.o_orderdate.date())
        for o in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    }
    cn = {
        c.c_custkey: c.c_nationkey
        for c in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    sn = {
        s.s_suppkey: s.s_nationkey
        for s in spark.read.parquet(f"{SF_DIR}/supplier.parquet").collect()
    }
    agg = defaultdict(lambda: [0, 0])
    for x in li:
        ck, odate = od[x.l_orderkey]
        key = (sn[x.l_suppkey], cn[ck])
        a = agg[key]
        a[0] += 1
        a[1] += (x.l_shipdate.date() - odate).days
    scored = [
        (f"NATION_{f}", f"NATION_{t}", n, (s * 1000) // n)
        for (f, t), (n, s) in agg.items()
        if n >= 30
    ]
    scored.sort(key=lambda r: (-r[3], r[0], r[1]))
    got = [(r.from_nation, r.to_nation, r.n_lines, r.mean_delay_milli)
           for r in rows]
    assert got == scored[:20]


def test_source_mix_drift_replay(spark):
    from collections import defaultdict

    rows = QUERIES["source_mix_by_ingest_decile"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    m = max(d.doc_id for d in docs)
    cells = defaultdict(lambda: defaultdict(int))
    for d in docs:
        if d.source is None:
            continue
        cells[d.doc_id * 10 // (m + 1)][d.source] += 1
    shares = defaultdict(list)
    for dec, srcs in cells.items():
        dt = sum(srcs.values())
        for s, n in srcs.items():
            shares[s].append(n * 1_000_000 // dt)
    scored = sorted(
        ((s, min(v), max(v), max(v) - min(v)) for s, v in shares.items()),
        key=lambda t: (-t[3], t[0]),
    )[:10]
    got = [(r.source, r.min_share_ppm, r.max_share_ppm, r.drift_ppm)
           for r in rows]
    assert got == scored


def test_priority_value_quartile_replay(spark):
    from collections import Counter

    rows = QUERIES["priority_mix_by_value_quartile"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    vals = sorted(round(o.o_totalprice * 100) for o in orders)
    n = len(vals)

    def cut(mult, num):
        # smallest v with inclusive ECDF*mult >= num*n
        import bisect

        target = -(-num * n // mult)
        return vals[target - 1]

    q1, q2, q3 = cut(4, 1), cut(2, 1), cut(4, 3)
    cells = Counter()
    for o in orders:
        v = round(o.o_totalprice * 100)
        q = 1 if v <= q1 else (2 if v <= q2 else (3 if v <= q3 else 4))
        cells[(q, o.o_orderpriority)] += 1
    got = {(r.value_quartile, r.priority): r.n_orders for r in rows}
    assert got == dict(cells)
    # quartiles are quarters: each band holds ~n/4 orders
    from collections import defaultdict

    per_q = defaultdict(int)
    for (q, _), c in cells.items():
        per_q[q] += c
    for q, c in per_q.items():
        assert abs(c - n / 4) < n * 0.05


def test_brand_discovery_replay(spark):
    from collections import defaultdict

    rows = QUERIES["brand_discovery_curve"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    ocust = {
        o.o_orderkey: o.o_custkey
        for o in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    }
    brand = {
        p.p_partkey: p.p_brand
        for p in spark.read.parquet(f"{SF_DIR}/part.parquet").collect()
    }
    ords, brands = defaultdict(set), defaultdict(set)
    for x in li:
        ck = ocust[x.l_orderkey]
        ords[ck].add(x.l_orderkey)
        brands[ck].add(brand[x.l_partkey])
    bands = defaultdict(lambda: [0, 0])
    for ck in ords:
        b = bands[len(ords[ck])]
        b[0] += 1
        b[1] += len(brands[ck])
    got = {r.n_orders: (r.n_customers, r.mean_brands_milli) for r in rows}
    assert got == {
        k: (c, sb * 1000 // c) for k, (c, sb) in bands.items()
    }
    # discovery is monotone-ish: the curve's last band sees more brands
    # than the first
    ks = sorted(got)
    assert got[ks[-1]][1] > got[ks[0]][1]


def test_size_type_interaction_replay(spark):
    import math
    from collections import defaultdict

    rows = QUERIES["size_type_price_interaction"](spark, SF_DIR).collect()
    parts = spark.read.parquet(f"{SF_DIR}/part.parquet").collect()
    cells = defaultdict(lambda: [0, 0])
    for p in parts:
        c = cells[(p.p_type, p.p_size // 10)]
        c[0] += 1
        c[1] += round(p.p_retailprice * 100)
    st, nt, sb, nb = (
        defaultdict(int),
        defaultdict(int),
        defaultdict(int),
        defaultdict(int),
    )
    for (t, b), (n, s) in cells.items():
        st[t] += s
        nt[t] += n
        sb[b] += s
        nb[b] += n
    s_all = sum(st.values())
    n_all = sum(nt.values())

    def resid(t, b):
        n, s = cells[(t, b)]
        x = s / n - st[t] / nt[t] - sb[b] / nb[b] + s_all / n_all
        return math.floor(x * 10 + 0.5)

    scored = sorted(
        ((t, b, cells[(t, b)][0], resid(t, b)) for t, b in cells),
        key=lambda r: (-abs(r[3]), r[0], r[1]),
    )[:12]
    got = [
        (r.ptype, r.size_band, r.n, r.interaction_millidollar) for r in rows
    ]
    for g, w in zip(got, scored):
        assert g[:3] == w[:3]
        assert abs(g[3] - w[3]) <= 1


def test_user_entropy_histogram_replay(spark):
    import math
    from collections import Counter, defaultdict

    rows = QUERIES["user_type_entropy_histogram"](spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    per_user = defaultdict(Counter)
    for e in ev:
        per_user[e.user_id][e.event_type] += 1
    hist = Counter()
    for c in per_user.values():
        n = sum(c.values())
        if n < 5:
            continue
        clnc = sum(
            math.floor(v * math.log(v) * 1000 + 0.5) for v in c.values()
        )
        ent = math.floor(
            (math.log(n) - (clnc / 1000) / n) * 100 + 0.5
        )
        hist[ent] += 1
    got = {r.entropy_centinat: r.n_users for r in rows}
    assert got == dict(hist)
    # entropies sit in [0, 100*ln(5)] for five event types
    assert all(0 <= k <= 161 for k in got)


def test_delay_value_quartile_replay(spark):
    from collections import defaultdict

    rows = QUERIES["delay_by_value_quartile"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    vals = sorted(round(o.o_totalprice * 100) for o in orders)
    n = len(vals)

    def cut(mult, num):
        target = -(-num * n // mult)
        return vals[target - 1]

    q1, q2, q3 = cut(4, 1), cut(2, 1), cut(4, 3)
    info = {
        o.o_orderkey: (round(o.o_totalprice * 100), o.o_orderdate.date())
        for o in orders
    }
    agg = defaultdict(lambda: [0, 0])
    for x in li:
        v, odate = info[x.l_orderkey]
        q = 1 if v <= q1 else (2 if v <= q2 else (3 if v <= q3 else 4))
        a = agg[q]
        a[0] += 1
        a[1] += (x.l_shipdate.date() - odate).days
    got = {r.value_quartile: (r.n_lines, r.mean_delay_milli) for r in rows}
    assert got == {
        q: (c, (s * 1000) // c) for q, (c, s) in agg.items()
    }


def test_user_value_concentration_replay(spark):
    from collections import defaultdict

    [r] = QUERIES["user_value_concentration"](spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    uv = defaultdict(int)
    for e in ev:
        uv[e.user_id] += round(e.value * 100)
    vals = sorted(uv.values(), reverse=True)
    n, tot = len(vals), sum(vals)
    # smallest prefix (by distinct value groups descending) covering
    # >= 10% of users
    cc = cum_v = 0
    i = 0
    while i < n:
        v = vals[i]
        j = i
        while j < n and vals[j] == v:
            cum_v += vals[j]
            cc += 1
            j += 1
        if cc * 10 >= n:
            break
        i = j
    assert (r.n_users, r.n_top_decile) == (n, cc)
    assert r.top_decile_share_ppm == cum_v * 1_000_000 // tot
    # the top decile holds at least its proportional share
    assert r.top_decile_share_ppm >= 100_000 - 1


def test_order_span_histogram_replay(spark):
    from collections import defaultdict

    rows = QUERIES["order_span_histogram"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    od = {
        o.o_orderkey: o.o_orderdate.date()
        for o in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    }
    last = {}
    for x in li:
        d = x.l_shipdate.date()
        last[x.l_orderkey] = max(last.get(x.l_orderkey, d), d)
    hist = defaultdict(lambda: [0, None, None])
    for ok, ld in last.items():
        span = (ld - od[ok]).days
        b = -1 if span < 0 else max((span + 1).bit_length() - 1, 0)
        h = hist[b]
        h[0] += 1
        h[1] = span if h[1] is None else min(h[1], span)
        h[2] = span if h[2] is None else max(h[2], span)
    got = {
        r.log2_span_bucket: (r.n_orders, r.min_span_days, r.max_span_days)
        for r in rows
    }
    assert got == {k: tuple(v) for k, v in hist.items()}
    # orders with lines partition across buckets
    assert sum(v[0] for v in got.values()) == len(last)


def test_horizon_edge_replay(spark):
    from collections import defaultdict

    rows = QUERIES["horizon_edge_audit"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    daily = defaultdict(int)
    for x in li:
        daily[x.l_shipdate.date()] += 1
    import datetime
    import math

    lo, hi = min(daily), max(daily)
    zones = defaultdict(lambda: [0, 0])
    for d, n in daily.items():
        z = (
            "head_30d"
            if d < lo + datetime.timedelta(days=30)
            else ("tail_30d" if d > hi - datetime.timedelta(days=30)
                  else "interior")
        )
        zones[z][0] += 1
        zones[z][1] += n
    il, idn = zones["interior"][1], zones["interior"][0]
    got = {
        r.zone: (r.n_days, r.n_lines, r.lines_per_day_milli,
                 r.vs_interior_milli)
        for r in rows
    }
    for z, (nd, nl) in zones.items():
        assert got[z][:3] == (nd, nl, nl * 1000 // nd)
        assert abs(
            got[z][3] - math.floor(nl * idn / (nd * il) * 1000 + 0.5)
        ) <= 1
    # interior compares to itself at exactly 1000 milli
    assert got["interior"][3] == 1000
