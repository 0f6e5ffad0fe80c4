"""Round-7 behavior tests: pure-Python replays on the real corpus for
the two recursive round-6 series ops (r6 verdict item 1 — the house
rule that recursions get an engine-independent replay, because BOTH
engines share the same fixed-order expression text and the hash gate
cannot catch a wrong recursion mirrored twice)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from tests.conftest import SF_DIR


def _daily_cents(spark):
    """day-sorted exact daily revenue in integer cents, straight off the
    parquet rows — no Spark aggregation in the replay path."""
    rows = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_orderdate", "o_totalprice")
        .collect()
    )
    per_day: dict = defaultdict(int)
    for r in rows:
        # mirror cents(): round-half-up of price*100 on positive values
        per_day[r.o_orderdate] += int(
            math.floor(float(r.o_totalprice) * 100 + 0.5)
        )
    return [v for _, v in sorted(per_day.items())]


def _half_up_micro(x: float) -> int:
    return int(math.floor(x * 1_000_000 + 0.5)) if x >= 0 else -int(
        math.floor(-x * 1_000_000 + 0.5)
    )


def test_pacf_durbin_levinson_replay(spark):
    """Replay pacf_daily_revenue end to end: the $1k-tick daily series,
    the lag-1/2/3 mean-centered ACF from literal pair sums (NOT the
    operator's sufficient-statistic rearrangement), then the textbook
    Durbin-Levinson order-2/3 recursion in plain floats. The operator's
    micro-rounded r's bound the allowed drift: |Δr| ≤ 1e-6 each, and
    the φ recursions are smooth away from |r1|→1, so ±100 micro is a
    semantics-pinning tolerance (a wrong recursion is off by 1000s)."""
    from ai_etl_studio_spark.operators.drift import pacf_daily_revenue

    got = pacf_daily_revenue(spark, SF_DIR).collect()[0]
    cents = _daily_cents(spark)
    # the operator's daily x is round-half-up(sum_cents / 100000)
    x = [int(math.floor(c / 100000 + 0.5)) for c in cents]
    n = len(x)
    assert got["n_days"] == n
    mu = sum(x) / n
    den = sum((v - mu) ** 2 for v in x)
    r = {}
    for k in (1, 2, 3):
        num = sum((x[t] - mu) * (x[t - k] - mu) for t in range(k, n))
        r[k] = num / den
    for k in (1, 2, 3):
        assert abs(got[f"r{k}_micro"] - _half_up_micro(r[k])) <= 2
    # Durbin-Levinson: φ11 = r1; φ22 = (r2 − r1²)/(1 − r1²);
    # φ21 = r1(1 − φ22); φ33 = (r3 − φ21 r2 − φ22 r1)/(1 − φ21 r1 − φ22 r2)
    phi11 = r[1]
    phi22 = (r[2] - r[1] ** 2) / (1 - r[1] ** 2)
    phi21 = r[1] * (1 - phi22)
    phi33 = (r[3] - phi21 * r[2] - phi22 * r[1]) / (
        1 - phi21 * r[1] - phi22 * r[2]
    )
    assert abs(got["pacf1_micro"] - _half_up_micro(phi11)) <= 2
    assert abs(got["pacf2_micro"] - _half_up_micro(phi22)) <= 100
    assert abs(got["pacf3_micro"] - _half_up_micro(phi33)) <= 100


def test_hurst_rescaled_range_replay(spark):
    """Replay hurst_rs_daily_revenue as the literal textbook R/S: per
    full segment, the range of the mean-adjusted cumulative deviation
    over the population σ (floats on exact ints — magnitudes < 2^53 at
    test SF), mean R/S per window, H = ln(RS₂₅₆/RS₁₆)/ln 16. Pins that
    the operator's scaled integer device devw = w·prefix − (i+1)·S is
    really w·(classic deviation) and m = w·Σx² − S² really w²·σ²."""
    from ai_etl_studio_spark.operators.drift import (
        _HURST_WINDOWS,
        hurst_rs_daily_revenue,
    )

    got = hurst_rs_daily_revenue(spark, SF_DIR).collect()[0]
    x = _daily_cents(spark)
    rs_mean = {}
    for w in _HURST_WINDOWS:
        rs_vals = []
        for s in range(len(x) // w):
            seg = x[s * w : (s + 1) * w]
            mu = sum(seg) / w
            var = sum(v * v for v in seg) / w - mu * mu
            if var <= 0:
                continue
            dev, run = [], 0.0
            for v in seg:
                run += v - mu
                dev.append(run)
            rng = max(dev) - min(dev)
            rs_vals.append(rng / math.sqrt(var))
        if rs_vals:
            # operator quantizes each segment's R/S to micro first
            q = [_half_up_micro(v / 1.0) for v in rs_vals]
            assert got[f"n_seg{w}"] == len(q)
            mean_micro = int(math.floor(sum(q) / len(q) + 0.5))
            assert abs(got[f"rs{w}_micro"] - mean_micro) <= len(q) + 1
            rs_mean[w] = got[f"rs{w}_micro"]
    # two-point ln-ln slope over the operator's own per-w means
    h = math.log(rs_mean[256] / rs_mean[16]) / math.log(16.0)
    assert abs(got["hurst_micro"] - _half_up_micro(h)) <= 2
    # a revenue series of iid-ish order flow must land in (0, 1)
    assert 0 < got["hurst_micro"] < 1_000_000


def _daily_1k_ticks(spark):
    return [
        int(math.floor(c / 100000 + 0.5)) for c in _daily_cents(spark)
    ]


def test_jarque_bera_replay(spark):
    """Replay JB from the raw daily series via the literal central
    moments (no power-sum rearrangement)."""
    from ai_etl_studio_spark.operators.drift import jarque_bera_daily_revenue

    got = jarque_bera_daily_revenue(spark, SF_DIR).collect()[0]
    x = _daily_1k_ticks(spark)
    n = len(x)
    assert got["n_days"] == n
    mu = sum(x) / n
    m2 = sum((v - mu) ** 2 for v in x) / n
    m3 = sum((v - mu) ** 3 for v in x) / n
    m4 = sum((v - mu) ** 4 for v in x) / n
    skew = m3 / m2**1.5
    exk = m4 / m2**2 - 3
    jb = n / 6 * (skew**2 + exk**2 / 4)
    assert abs(got["skew_micro"] - _half_up_micro(skew)) <= 2
    assert abs(got["exkurt_micro"] - _half_up_micro(exk)) <= 2
    # JB scales with n; allow the micro-rounding of S/K to propagate
    assert abs(got["jb_micro"] - _half_up_micro(jb)) <= 10 * n


def test_variance_ratio_replay(spark):
    """Replay VR(5) from literal overlapping differences."""
    from ai_etl_studio_spark.operators.drift import (
        variance_ratio_daily_revenue,
    )

    got = variance_ratio_daily_revenue(spark, SF_DIR).collect()[0]
    x = _daily_1k_ticks(spark)
    d1 = [x[t] - x[t - 1] for t in range(1, len(x))]
    d5 = [x[t] - x[t - 5] for t in range(5, len(x))]
    T = len(d1)
    assert got["n_diffs"] == T
    mu = sum(d1) / T
    s1 = sum((d - mu) ** 2 for d in d1) / T
    sq = sum((d - 5 * mu) ** 2 for d in d5) / (len(d5) * 5)
    vr = sq / s1
    z = math.sqrt(T) * (vr - 1) / math.sqrt(2 * (2 * 5 - 1) * (5 - 1) / (3 * 5))
    assert abs(got["vr_micro"] - _half_up_micro(vr)) <= 2
    assert abs(got["z_micro"] - _half_up_micro(z)) <= 60


def test_cox_stuart_and_turning_point_replay(spark):
    """Literal pairing / extrema counting replays for the two sign
    tests."""
    from ai_etl_studio_spark.operators.drift import (
        cox_stuart_trend_daily,
        turning_point_test_daily,
    )

    x = _daily_1k_ticks(spark)
    n = len(x)
    got = cox_stuart_trend_daily(spark, SF_DIR).collect()[0]
    c = (n + 1) // 2
    pos = sum(1 for i in range(n - c) if x[i + c] > x[i])
    neg = sum(1 for i in range(n - c) if x[i + c] < x[i])
    assert (got["n_days"], got["pos"], got["neg"]) == (n, pos, neg)
    m = pos + neg
    assert abs(
        got["z_micro"] - _half_up_micro((2 * pos - m) / math.sqrt(m))
    ) <= 2

    got = turning_point_test_daily(spark, SF_DIR).collect()[0]
    tp = sum(
        1
        for t in range(1, n - 1)
        if (x[t] - x[t - 1]) * (x[t + 1] - x[t]) < 0
    )
    assert (got["n_days"], got["tp"]) == (n, tp)
    z = (tp - 2 * (n - 2) / 3) / math.sqrt((16 * n - 29) / 90)
    assert abs(got["z_micro"] - _half_up_micro(z)) <= 2


def test_levene_bartlett_replay(spark):
    """Replay Brown-Forsythe W and Bartlett χ² from the raw joined
    delays (textbook formulas on python floats, no value-grain
    rearrangement, lower medians by literal sorting)."""
    from ai_etl_studio_spark.operators.drift import (
        bartlett_variance_by_priority,
        levene_bf_delay_by_priority,
    )

    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_shipdate")
        .collect()
    )
    od = {
        r.o_orderkey: (r.o_orderpriority, r.o_orderdate)
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_orderkey", "o_orderpriority", "o_orderdate")
        .collect()
    }
    groups = defaultdict(list)
    for r in li:
        pr, odate = od[r.l_orderkey]
        delta = (r.l_shipdate.date() if hasattr(r.l_shipdate, "date")
                 else r.l_shipdate) - (
            odate.date() if hasattr(odate, "date") else odate
        )
        if delta.days >= 0:
            groups[pr].append(delta.days)
    k = len(groups)
    N = sum(len(v) for v in groups.values())

    # Brown-Forsythe
    zs = {}
    for pr, vals in groups.items():
        vals = sorted(vals)
        med = vals[(len(vals) - 1) // 2]  # lower median: min v, 2cum>=n
        zs[pr] = [abs(v - med) for v in vals]
    zbar = {pr: sum(z) / len(z) for pr, z in zs.items()}
    zall = sum(sum(z) for z in zs.values()) / N
    num = sum(len(z) * (zbar[pr] - zall) ** 2 for pr, z in zs.items()) / (
        k - 1
    )
    den = sum(
        sum((v - zbar[pr]) ** 2 for v in z) for pr, z in zs.items()
    ) / (N - k)
    w = num / den
    got = levene_bf_delay_by_priority(spark, SF_DIR).collect()[0]
    assert (got["k"], got["n"]) == (k, N)
    assert abs(got["w_micro"] - _half_up_micro(w)) <= 100

    # Bartlett
    s2 = {
        pr: sum((v - sum(vals) / len(vals)) ** 2 for v in vals)
        / (len(vals) - 1)
        for pr, vals in groups.items()
    }
    sp2 = sum((len(v) - 1) * s2[pr] for pr, v in groups.items()) / (N - k)
    chi = (N - k) * math.log(sp2) - sum(
        (len(v) - 1) * math.log(s2[pr]) for pr, v in groups.items()
    )
    corr = 1 + (
        sum(1 / (len(v) - 1) for v in groups.values()) - 1 / (N - k)
    ) / (3 * (k - 1))
    got = bartlett_variance_by_priority(spark, SF_DIR).collect()[0]
    assert (got["k"], got["n"]) == (k, N)
    assert abs(got["chi2_micro"] - _half_up_micro(chi / corr)) <= 200


def _score_gate_rows(spark):
    """Literal (score_ppm, y) pairs from the raw corpus — replays the
    stopword-ppm score and diversity gate with python ints."""
    import re

    from ai_etl_studio_spark.operators.text import STOPWORDS

    sw = set(STOPWORDS)
    out = []
    for r in (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("text")
        .collect()
    ):
        if r.text is None:
            continue
        ts = [t for t in re.split(r"\s+", r.text.lower()) if t]
        if not ts:
            continue
        n_tok = len(ts)
        n_stop = sum(1 for t in ts if t in sw)
        nd = len(set(ts))
        out.append((n_stop * 1_000_000 // n_tok, 1 if 100 * nd >= 55 * n_tok else 0))
    return out


def test_brier_decomposition_identity_and_replay(spark):
    """Literal per-doc Brier with bin-midpoint forecasts + the Murphy
    identity Brier = reliability − resolution + uncertainty (exact in
    binned form up to the committed milli/micro quantization)."""
    from ai_etl_studio_spark.operators import load_all

    brier_decomposition_quality = load_all()[0]["brier_decomposition_quality"]

    got = brier_decomposition_quality(spark, SF_DIR).collect()[0]
    rows = _score_gate_rows(spark)
    n = len(rows)
    assert got["n_docs"] == n
    binned = [(min(s * 10 // 1_000_000, 9), y) for s, y in rows]
    brier = sum(((2 * b + 1) / 20 - y) ** 2 for b, y in binned) / n
    obar = sum(y for _, y in binned) / n
    per = defaultdict(lambda: [0, 0])
    for b, y in binned:
        per[b][0] += 1
        per[b][1] += y
    rel = sum(
        nk * ((2 * b + 1) / 20 - sk / nk) ** 2 for b, (nk, sk) in per.items()
    ) / n
    res = sum(nk * (sk / nk - obar) ** 2 for b, (nk, sk) in per.items()) / n
    unc = obar * (1 - obar)
    assert abs(got["brier_micro"] - _half_up_micro(brier)) <= 2
    assert abs(got["reliability_micro"] - _half_up_micro(rel)) <= 2
    assert abs(got["resolution_micro"] - _half_up_micro(res)) <= 2
    assert abs(got["uncertainty_micro"] - _half_up_micro(unc)) <= 2
    # the Murphy identity, on the op's own quantized outputs
    assert abs(
        got["brier_micro"]
        - (
            got["reliability_micro"]
            - got["resolution_micro"]
            + got["uncertainty_micro"]
        )
    ) <= 4


def test_pr_auc_replay(spark):
    """Literal tie-grouped average precision, descending score."""
    from ai_etl_studio_spark.operators import load_all

    pr_auc_quality_score = load_all()[0]["pr_auc_quality_score"]

    got = pr_auc_quality_score(spark, SF_DIR).collect()[0]
    rows = _score_gate_rows(spark)
    per = defaultdict(lambda: [0, 0])
    for s, y in rows:
        per[s][0] += 1
        per[s][1] += y
    cumpos = cumall = 0
    ap_sum = 0.0
    for s in sorted(per, reverse=True):
        cnt, pos = per[s]
        cumpos += pos
        cumall += cnt
        ap_sum += pos * cumpos / cumall
    n_pos = sum(y for _, y in rows)
    assert (got["n_pos"], got["n_docs"]) == (n_pos, len(rows))
    assert abs(got["ap_micro"] - _half_up_micro(ap_sum / n_pos)) <= 2
    assert got["prevalence_micro"] == _half_up_micro(n_pos / len(rows))


def test_mcc_replay(spark):
    """Literal confusion cells + sklearn-definition MCC."""
    import re

    from ai_etl_studio_spark.operators import load_all

    matthews_corrcoef_gates = load_all()[0]["matthews_corrcoef_gates"]

    got = matthews_corrcoef_gates(spark, SF_DIR).collect()[0]
    tp = fp = fn = tn = 0
    for r in (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("text")
        .collect()
    ):
        if r.text is None:
            continue
        ts = [t for t in re.split(r"\s+", r.text.lower()) if t]
        if not ts:
            continue
        a = 1 if len(ts) >= 40 else 0
        b = 1 if 100 * len(set(ts)) >= 55 * len(ts) else 0
        tp += a and b
        fp += a and not b
        fn += (not a) and b
        tn += (not a) and (not b)
    assert (got["tp"], got["fp"], got["fn"], got["tn"]) == (tp, fp, fn, tn)
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    assert abs(got["mcc_micro"] - _half_up_micro(mcc)) <= 2
    prec, rec = tp / (tp + fp), tp / (tp + fn)
    assert abs(got["f1_micro"] - _half_up_micro(2 * prec * rec / (prec + rec))) <= 2


def test_page_l_replay(spark):
    """Literal within-year ranks and Page's L over the raw orders."""
    from ai_etl_studio_spark.operators.drift import (
        _KW_GROUPS,
        page_trend_test_priority,
    )

    got = page_trend_test_priority(spark, SF_DIR).collect()[0]
    rev = defaultdict(int)
    for r in (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_orderdate", "o_orderpriority", "o_totalprice")
        .collect()
    ):
        yr = r.o_orderdate.year
        rev[(yr, r.o_orderpriority)] += int(
            math.floor(float(r.o_totalprice) * 100 + 0.5)
        )
    years = sorted({y for y, _ in rev})
    assert got["b"] == len(years)
    L = 0
    for yr in years:
        cells = sorted(
            (rev[(yr, p)], p) for p in _KW_GROUPS if (yr, p) in rev
        )
        for rank, (_, p) in enumerate(cells, start=1):
            L += (_KW_GROUPS.index(p) + 1) * rank
    assert got["page_l"] == L
    k, b = len(_KW_GROUPS), len(years)
    z = (L - b * k * (k + 1) ** 2 / 4) / math.sqrt(
        b * k * k * (k + 1) * (k * k - 1) / 144
    )
    assert abs(got["z_micro"] - _half_up_micro(z)) <= 2


def test_copurchase_graph_replay(spark):
    """Literal triangle/wedge census + Adamic-Adar scores on the real
    corpus: build the capped graph in pure python sets and compare."""
    from itertools import combinations

    from ai_etl_studio_spark.operators.insights import (
        _CP_DCAP,
        _CP_MINSUP,
        adamic_adar_link_topk,
        copurchase_triangle_census,
    )

    rows = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    per_order = defaultdict(set)
    for r in rows:
        per_order[r.l_orderkey].add(r.l_partkey)
    sup = Counter()
    for parts in per_order.values():
        for a, b in combinations(sorted(parts), 2):
            sup[(a, b)] += 1
    e0 = {p for p, s in sup.items() if s >= _CP_MINSUP}
    deg0 = Counter()
    for a, b in e0:
        deg0[a] += 1
        deg0[b] += 1
    keep = {u for u, d in deg0.items() if d <= _CP_DCAP}
    e = {(a, b) for a, b in e0 if a in keep and b in keep}
    nbrs = defaultdict(set)
    for a, b in e:
        nbrs[a].add(b)
        nbrs[b].add(a)
    wedges = sum(
        len(v) * (len(v) - 1) // 2 for v in nbrs.values()
    )
    closed = sum(
        1
        for m, v in nbrs.items()
        for a, b in combinations(sorted(v), 2)
        if (a, b) in e
    )
    got = copurchase_triangle_census(spark, SF_DIR).collect()[0]
    assert got["n_nodes"] == len(nbrs)
    assert got["n_edges"] == len(e)
    assert got["n_dropped_hubs"] == sum(
        1 for d in deg0.values() if d > _CP_DCAP
    )
    assert got["wedges"] == wedges
    assert got["triangles"] == closed // 3
    assert closed % 3 == 0
    assert got["global_cc_micro"] == _half_up_micro(closed / wedges)

    # Adamic-Adar: literal scoring with the SAME per-term quantization
    aa = Counter()
    common = Counter()
    for m, v in nbrs.items():
        w = round(1_000_000 / math.log(len(v)))
        for a, b in combinations(sorted(v), 2):
            if (a, b) not in e:
                aa[(a, b)] += w
                common[(a, b)] += 1
    top = sorted(aa.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got_rows = adamic_adar_link_topk(spark, SF_DIR).collect()
    assert len(got_rows) == 20
    for row, ((a, b), score) in zip(got_rows, top):
        assert (row["part_a"], row["part_b"]) == (a, b)
        assert abs(row["aa_micro"] - score) <= len(nbrs)  # ±1 per term
        assert row["n_common"] == common[(a, b)]


def test_ewma_and_theil_u2_replay(spark):
    """Literal EWMA fold + breach count and the U₂ ratio in python."""
    from ai_etl_studio_spark.operators.drift import (
        _EWMA_YEAR,
        ewma_control_chart_daily,
        theil_u2_daily_forecast,
    )

    rows = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_orderdate", "o_totalprice")
        .collect()
    )
    per_day = defaultdict(int)
    for r in rows:
        if str(r.o_orderdate).startswith(_EWMA_YEAR):
            per_day[r.o_orderdate] += int(
                math.floor(float(r.o_totalprice) * 100 + 0.5)
            )
    ys = [v for _, v in sorted(per_day.items())]
    n = len(ys)
    mu = sum(ys) / n
    sigma = math.sqrt(sum(v * v for v in ys) / n - mu * mu)
    hw = 3 * sigma * math.sqrt(0.2 / 1.8)
    e, br = float(ys[0]), 0
    for y in ys[1:]:
        e = 0.2 * y + 0.8 * e
        if abs(e - mu) > hw:
            br += 1
    got = ewma_control_chart_daily(spark, SF_DIR).collect()[0]
    assert got["n_days"] == n
    assert got["n_breaches"] == br
    assert abs(got["ewma_final_cents"] - e) <= 1
    assert abs(got["ucl_cents"] - (mu + hw)) <= 1
    assert abs(got["lcl_cents"] - (mu - hw)) <= 1

    x = _daily_1k_ticks(spark)
    e7 = sum((x[t] - x[t - 7]) ** 2 for t in range(7, len(x)))
    e1 = sum((x[t] - x[t - 1]) ** 2 for t in range(7, len(x)))
    got = theil_u2_daily_forecast(spark, SF_DIR).collect()[0]
    assert got["n_terms"] == len(x) - 7
    assert abs(got["u2_micro"] - _half_up_micro(math.sqrt(e7 / e1))) <= 2


def test_gumbel_fit_replay(spark):
    """Literal monthly block maxima + method-of-moments Gumbel fit."""
    from ai_etl_studio_spark.operators.drift import gumbel_block_maxima_fit

    rows = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_orderdate", "o_totalprice")
        .collect()
    )
    per_day = defaultdict(int)
    for r in rows:
        per_day[r.o_orderdate] += int(
            math.floor(float(r.o_totalprice) * 100 + 0.5)
        )
    per_month = defaultdict(int)
    for d, v in per_day.items():
        per_month[(d.year, d.month)] = max(per_month[(d.year, d.month)], v)
    mx = list(per_month.values())
    nb = len(mx)
    mean = sum(mx) / nb
    var = sum(v * v for v in mx) / nb - mean * mean
    beta = math.sqrt(6 * var) / math.pi
    mu = mean - 0.5772156649015329 * beta
    rl = mu - beta * math.log(-math.log(1 - 1 / 12))
    got = gumbel_block_maxima_fit(spark, SF_DIR).collect()[0]
    assert got["n_blocks"] == nb
    assert abs(got["beta_cents"] - beta) <= 1
    assert abs(got["mu_cents"] - mu) <= 1
    assert abs(got["return_level_12mo_cents"] - rl) <= 1


def test_palma_replay(spark):
    """Literal Palma: sort each nation's customer spends, take exact
    integer head-counts n//10 and 4n//10 off the top/bottom."""
    from ai_etl_studio_spark.operators.analytics import palma_ratio_by_nation

    o = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_custkey", "o_totalprice")
        .collect()
    )
    cn = {
        r.c_custkey: r.c_nationkey
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet")
        .select("c_custkey", "c_nationkey")
        .collect()
    }
    spend = defaultdict(int)
    for r in o:
        spend[(cn[r.o_custkey], r.o_custkey)] += int(
            math.floor(float(r.o_totalprice) * 100 + 0.5)
        )
    by_nk = defaultdict(list)
    for (nk, _), v in spend.items():
        by_nk[nk].append(v)
    got = {
        r["nationkey"]: r for r in palma_ratio_by_nation(spark, SF_DIR).collect()
    }
    assert set(got) == set(by_nk)
    for nk, vals in by_nk.items():
        vals.sort()
        n = len(vals)
        k10, k40 = n // 10, (4 * n) // 10
        top = sum(vals[n - k10 :])
        bot = sum(vals[:k40])
        r = got[nk]
        assert r["n_customers"] == n
        assert r["top10_cents"] == top
        assert r["bot40_cents"] == bot
        assert r["palma_micro"] == _half_up_micro(top / bot)


def test_walsh_between_laspeyres_and_paasche(spark):
    """A superlative index must land between the two one-sided indexes
    on the same matched basket (the index-number squeeze)."""
    from ai_etl_studio_spark.operators.analytics import (
        _WALSH_Y0,
        _WALSH_Y1,
        walsh_price_index,
    )

    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_partkey", "l_shipdate", "l_quantity", "l_extendedprice")
        .collect()
    )
    agg = defaultdict(lambda: [0, 0, 0, 0])  # q0, r0, q1, r1
    for r in li:
        y = r.l_shipdate.year
        if y not in (_WALSH_Y0, _WALSH_Y1):
            continue
        a = agg[r.l_partkey]
        q = round(float(r.l_quantity))
        c = int(math.floor(float(r.l_extendedprice) * 100 + 0.5))
        if y == _WALSH_Y0:
            a[0] += q
            a[1] += c
        else:
            a[2] += q
            a[3] += c
    num_l = den_l = num_p = den_p = num_w = den_w = 0.0
    n_matched = 0
    for q0, r0, q1, r1 in agg.values():
        if q0 <= 0 or q1 <= 0:
            continue
        n_matched += 1
        p0, p1 = r0 * 1000 // q0, r1 * 1000 // q1
        w = math.sqrt(q0 * q1)
        num_l += p1 * q0
        den_l += p0 * q0
        num_p += p1 * q1
        den_p += p0 * q1
        num_w += round(p1 * w)
        den_w += round(p0 * w)
    got = walsh_price_index(spark, SF_DIR).collect()[0]
    assert got["n_parts_matched"] == n_matched
    walsh = got["walsh_index_milli"] / 1000
    assert abs(walsh - num_w / den_w) < 0.002
    lasp, paasche = num_l / den_l, num_p / den_p
    lo_b, hi_b = min(lasp, paasche), max(lasp, paasche)
    assert lo_b - 0.01 <= walsh <= hi_b + 0.01


def test_poisson_bootstrap_and_ht_replay(spark):
    """Literal hash-weight bootstrap + HT estimator replays, plus the
    calibration claim: the bootstrap SE is within 3x of analytic (a
    loose but wrong-by-construction-catching band at 32 resamples)."""
    import hashlib

    from ai_etl_studio_spark.operators.insights import (
        _HT_CAP_CENTS,
        _PB_B,
        _PB_CDF,
        horvitz_thompson_total,
        poisson_bootstrap_se_daily,
    )

    rows = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .collect()
    )
    per_day = defaultdict(int)
    for r in rows:
        # o_orderdate is a midnight timestamp; the op casts to DATE and
        # the hash input is the 'YYYY-MM-DD' string
        per_day[r.o_orderdate.date()] += int(
            math.floor(float(r.o_totalprice) * 100 + 0.5)
        )

    def u32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) / 2**32

    thresholds = [float(t) for t in _PB_CDF]

    def pweight(u):
        for k, t in enumerate(thresholds):
            if u < t:
                return k
        return 8

    means = []
    for b in range(_PB_B):
        nb = sb = 0
        for d, yc in per_day.items():
            w = pweight(u32(f"pb:{d}:{b}"))
            nb += w
            sb += w * yc
        if nb > 0:
            means.append(round(sb / nb))
    beff = len(means)
    mbar = sum(means) / beff
    se_boot = math.sqrt(
        sum((m - mbar) ** 2 for m in means) / (beff - 1)
    )
    got = poisson_bootstrap_se_daily(spark, SF_DIR).collect()[0]
    assert got["n_days"] == len(per_day)
    assert got["b_resamples"] == beff
    assert abs(got["se_boot_cents"] - se_boot) <= 2
    assert 0 < got["se_boot_cents"] < 3 * got["se_analytic_cents"]
    assert got["se_analytic_cents"] < 3 * got["se_boot_cents"]

    ht = n_s = 0
    true_total = 0
    for r in rows:
        vc = int(math.floor(float(r.o_totalprice) * 100 + 0.5))
        true_total += vc
        pi = min(1.0, vc / _HT_CAP_CENTS)
        if u32(f"ht:{r.o_orderkey}") < pi:
            n_s += 1
            ht += round(vc / pi)
    got = horvitz_thompson_total(spark, SF_DIR).collect()[0]
    assert (got["n_sampled"], got["n_total"]) == (n_s, len(rows))
    assert abs(got["ht_total_cents"] - ht) <= n_s
    assert got["true_total_cents"] == true_total
    # the estimator must be in the right ballpark (PPS keeps variance low)
    assert abs(got["err_ppm"]) < 300_000


def test_embedding_clip_and_jl_replay(spark):
    """Literal numpy-free replays: per-dim percentile thresholds by
    sorting, and the JL distortion on a couple of sampled pairs."""
    import hashlib

    from ai_etl_studio_spark.operators.similarity import (
        _ID_SAMPLE_CAP,
        _JL_K,
        _JL_MOD,
        embedding_clip_bounds_int8,
        jl_projection_distortion_eval,
    )

    rows = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    dim_vals = defaultdict(list)
    for r in rows:
        for i, x in enumerate(r.embedding, start=1):
            dim_vals[i].append(
                int(math.floor(float(x) * 1_000_000 + 0.5))
                if x >= 0
                else -int(math.floor(-float(x) * 1_000_000 + 0.5))
            )
    got = {r["dim"]: r for r in embedding_clip_bounds_int8(spark, SF_DIR).collect()}
    assert set(got) == set(dim_vals)
    for d, vals in dim_vals.items():
        vals.sort()
        n = len(vals)
        # min v with cum*100 >= k*n — cum of the sorted list is its index+1
        def thresh(k):
            import bisect
            target = (k * n + 99) // 100  # first cum with cum*100 >= k*n
            return vals[target - 1]
        r = got[d]
        assert r["n_vecs"] == n
        assert r["p01_micro"] == thresh(1)
        assert r["p99_micro"] == thresh(99)
        assert r["int8_scale_micro"] == max(
            abs(r["p01_micro"]), abs(r["p99_micro"])
        ) // 127

    # JL: replay the projection + ratio for the sampled ids
    sample = {
        r.vec_id: [
            int(math.floor(float(x) * 1_000_000 + 0.5))
            if x >= 0
            else -int(math.floor(-float(x) * 1_000_000 + 0.5))
            for x in r.embedding
        ]
        for r in rows
        if r.vec_id % _JL_MOD == 0 and r.vec_id < _ID_SAMPLE_CAP
    }

    def sign(dim, j):
        h = int(
            hashlib.md5(f"jl:{dim}:{j}".encode()).hexdigest()[:8], 16
        )
        return (h % 2) * 2 - 1

    def project(v):
        return [
            sum(sign(i + 1, j) * x for i, x in enumerate(v))
            for j in range(1, _JL_K + 1)
        ]

    bands = Counter()
    ids = sorted(sample)
    for a_i in range(len(ids)):
        for b_i in range(a_i + 1, len(ids)):
            xa, xb = sample[ids[a_i]], sample[ids[b_i]]
            dx2 = sum((p - q) ** 2 for p, q in zip(xa, xb))
            if dx2 == 0:
                continue
            za, zb = project(xa), project(xb)
            dz2 = sum((p - q) ** 2 for p, q in zip(za, zb))
            bands[_half_up_micro(dz2 / (_JL_K * dx2) / 1.0) // 100_000] += 1
    got_rows = {
        r["band"]: r["n_pairs"]
        for r in jl_projection_distortion_eval(spark, SF_DIR).collect()
    }
    assert got_rows == dict(bands)
    # JL sanity: most mass concentrated near ratio 1 (bands 0.5..1.5)
    near = sum(c for b, c in bands.items() if 5 <= b <= 14)
    assert near >= 0.8 * sum(bands.values())


def test_wilcoxon_mood_dispersion_replay(spark):
    """Literal textbook replays for the three batch-8 tests."""
    from ai_etl_studio_spark.operators.drift import (
        _WSR_Y0,
        _WSR_Y1,
        mood_median_test_delay,
        poisson_dispersion_daily_orders,
        wilcoxon_signed_rank_types,
    )

    # --- Wilcoxon signed-rank over part types
    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_partkey", "l_shipdate", "l_extendedprice")
        .collect()
    )
    ptype = {
        r.p_partkey: r.p_type
        for r in spark.read.parquet(f"{SF_DIR}/part.parquet")
        .select("p_partkey", "p_type")
        .collect()
    }
    rev = defaultdict(lambda: [0, 0])
    for r in li:
        y = r.l_shipdate.year
        if y == _WSR_Y0:
            rev[ptype[r.l_partkey]][0] += int(
                math.floor(float(r.l_extendedprice) * 100 + 0.5)
            )
        elif y == _WSR_Y1:
            rev[ptype[r.l_partkey]][1] += int(
                math.floor(float(r.l_extendedprice) * 100 + 0.5)
            )
    ds = [(abs(r1 - r0), r1 > r0) for r0, r1 in rev.values() if r1 != r0]
    ds.sort()
    n = len(ds)
    # midranks over |d| (exact values, so compute rank runs)
    wp = 0.0
    i = 0
    while i < n:
        j = i
        while j < n and ds[j][0] == ds[i][0]:
            j += 1
        mid = (i + 1 + j) / 2  # average of ranks i+1..j
        wp += mid * sum(1 for k in range(i, j) if ds[k][1])
        i = j
    tie3 = 0
    from itertools import groupby

    for _, grp in groupby(ds, key=lambda t: t[0]):
        t = len(list(grp))
        tie3 += t**3 - t
    z = (wp - n * (n + 1) / 4) / math.sqrt(
        n * (n + 1) * (2 * n + 1) / 24 - tie3 / 48
    )
    got = wilcoxon_signed_rank_types(spark, SF_DIR).collect()[0]
    assert got["n_pairs"] == n
    assert got["w_plus_x2"] == round(2 * wp)
    assert abs(got["z_micro"] - _half_up_micro(z)) <= 2

    # --- Mood median test on delays
    od = {
        r.o_orderkey: (r.o_orderpriority, r.o_orderdate)
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_orderkey", "o_orderpriority", "o_orderdate")
        .collect()
    }
    li2 = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_shipdate")
        .collect()
    )
    delays = []
    for r in li2:
        pr, odate = od[r.l_orderkey]
        dd = (r.l_shipdate - odate).days
        if dd >= 0:
            delays.append((pr, dd))
    vals = sorted(d for _, d in delays)
    med = vals[(len(vals) - 1) // 2]
    cells = defaultdict(lambda: [0, 0])
    for pr, d in delays:
        cells[pr][0 if d > med else 1] += 1
    ta = sum(a for a, _ in cells.values())
    tb = sum(b for _, b in cells.values())
    N = ta + tb
    chi = 0.0
    for a, b in cells.values():
        ra = a + b
        ea, eb = ra * ta / N, ra * tb / N
        chi += (a - ea) ** 2 / ea + (b - eb) ** 2 / eb
    got = mood_median_test_delay(spark, SF_DIR).collect()[0]
    assert (got["k"], got["n"], got["grand_median"]) == (len(cells), N, med)
    assert abs(got["chi2_micro"] - _half_up_micro(chi)) <= 20

    # --- Poisson dispersion on daily order counts
    counts = Counter()
    for _, (pr, odate) in od.items():
        counts[odate] += 1
    cs = list(counts.values())
    nd = len(cs)
    mean = sum(cs) / nd
    s2 = sum((c - mean) ** 2 for c in cs) / (nd - 1)
    got = poisson_dispersion_daily_orders(spark, SF_DIR).collect()[0]
    assert (got["n_days"], got["n_orders"]) == (nd, sum(cs))
    assert abs(got["dispersion_micro"] - _half_up_micro(s2 / mean)) <= 2
    assert abs(got["chi2_stat"] - (nd - 1) * s2 / mean) <= 1


def test_periodogram_and_cohens_h_replay(spark):
    """Literal DFT power shares (python math.cos on the same phases)
    and the arcsine effect size."""
    from ai_etl_studio_spark.operators.drift import (
        _GRP_A,
        _GRP_B,
        _PGRAM_PERIODS,
        cohens_h_return_priorities,
        spectral_periodogram_weekly,
    )

    x = _daily_1k_ticks(spark)
    n = len(x)
    mu = sum(x) / n
    var = sum(v * v for v in x) / n - mu * mu
    got = {
        r["period"]: r["power_share_micro"]
        for r in spectral_periodogram_weekly(spark, SF_DIR).collect()
    }
    assert set(got) == set(_PGRAM_PERIODS)
    for p in _PGRAM_PERIODS:
        sc = sum(
            (v - mu) * math.cos(2 * math.pi * (t % p) / p)
            for t, v in enumerate(x)
        )
        ss = sum(
            (v - mu) * math.sin(2 * math.pi * (t % p) / p)
            for t, v in enumerate(x)
        )
        share = 2 * (sc * sc + ss * ss) / (n * n * var)
        # milli per-term quantization drifts the sums by ≤ n·5e-4 each
        assert abs(got[p] - _half_up_micro(share)) <= 50
        assert 0 <= got[p] <= 1_000_000

    od = {
        r.o_orderkey: r.o_orderpriority
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_orderkey", "o_orderpriority")
        .collect()
    }
    n1 = r1 = n2 = r2 = 0
    for r in (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_returnflag")
        .collect()
    ):
        pr = od[r.l_orderkey]
        if pr == _GRP_A:
            n1 += 1
            r1 += r.l_returnflag == "R"
        elif pr == _GRP_B:
            n2 += 1
            r2 += r.l_returnflag == "R"
    h = 2 * math.asin(math.sqrt(r1 / n1)) - 2 * math.asin(math.sqrt(r2 / n2))
    got = cohens_h_return_priorities(spark, SF_DIR).collect()[0]
    assert (got["n1"], got["r1"], got["n2"], got["r2"]) == (n1, r1, n2, r2)
    assert abs(got["cohens_h_micro"] - _half_up_micro(h)) <= 2


def test_durbin_watson_and_log_rank_replay(spark):
    """Literal OLS-residual DW and a from-scratch log-rank replay
    (lifelines-style event loop over sorted times)."""
    from ai_etl_studio_spark.operators.drift import (
        _LR_SEG_A,
        _LR_SEG_B,
        durbin_watson_daily,
        log_rank_reorder_segments,
    )

    x = _daily_1k_ticks(spark)
    n = len(x)
    st = sum(range(n))
    sx = sum(x)
    stx = sum(t * v for t, v in enumerate(x))
    stt = sum(t * t for t in range(n))
    b = (n * stx - st * sx) / (n * stt - st * st)
    a = (sx - b * st) / n
    e = [round((v - (a + b * t)) * 1000) for t, v in enumerate(x)]
    dw = sum((e[t] - e[t - 1]) ** 2 for t in range(1, n)) / sum(
        v * v for v in e
    )
    got = durbin_watson_daily(spark, SF_DIR).collect()[0]
    assert got["n_days"] == n
    assert abs(got["dw_micro"] - _half_up_micro(dw)) <= 2
    # detrended daily revenue should be near-memoryless: DW in (1.3, 2.7)
    assert 1_300_000 < got["dw_micro"] < 2_700_000

    seg = {
        r.c_custkey: r.c_mktsegment
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet")
        .select("c_custkey", "c_mktsegment")
        .collect()
        if r.c_mktsegment in (_LR_SEG_A, _LR_SEG_B)
    }
    days = defaultdict(set)
    anchor = None
    for r in (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_custkey", "o_orderdate")
        .collect()
    ):
        d = r.o_orderdate.date()
        anchor = d if anchor is None or d > anchor else anchor
        if r.o_custkey in seg:
            days[r.o_custkey].add(d)
    subjects = []  # (group1?, time, event?)
    for ck, ds in days.items():
        ds = sorted(ds)
        g1 = seg[ck] == _LR_SEG_A
        if len(ds) >= 2:
            subjects.append((g1, (ds[1] - ds[0]).days, 1))
        else:
            subjects.append((g1, (anchor - ds[0]).days, 0))
    evt_times = sorted({t for _, t, ev in subjects if ev})
    oe = var = 0.0
    n_events = n_times = 0
    for t in evt_times:
        n1 = sum(1 for g, tt, _ in subjects if g and tt >= t)
        n2 = sum(1 for g, tt, _ in subjects if not g and tt >= t)
        if n1 + n2 <= 1:
            continue
        d1 = sum(1 for g, tt, ev in subjects if g and tt == t and ev)
        d2 = sum(1 for g, tt, ev in subjects if not g and tt == t and ev)
        d = d1 + d2
        nn = n1 + n2
        oe += d1 - d * n1 / nn
        var += d * (n1 / nn) * (n2 / nn) * (nn - d) / (nn - 1)
        n_events += d
        n_times += 1
    z = oe / math.sqrt(var)
    got = log_rank_reorder_segments(spark, SF_DIR).collect()[0]
    assert (got["n_times"], got["n_events"]) == (n_times, n_events)
    assert abs(got["z_micro"] - _half_up_micro(z)) <= 20


def test_welch_hl_hoover_replay(spark):
    """From-scratch replays: Welch t/df off literal per-segment moment
    sums, the Hodges-Lehmann pairwise-difference median via a Counter
    convolution, and the Hoover index for one nation."""
    from ai_etl_studio_spark.operators.analytics import (
        hoover_index_by_nation,
    )
    from ai_etl_studio_spark.operators.drift import (
        _HL_PR_A,
        _HL_PR_B,
        _WT_SEG_A,
        _WT_SEG_B,
        hodges_lehmann_delay_shift,
        welch_ttest_segments,
    )

    seg = {
        r.c_custkey: r.c_mktsegment
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet")
        .select("c_custkey", "c_mktsegment")
        .collect()
    }
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()

    # --- Welch ---
    va = [
        int(math.floor(r.o_totalprice * 100 + 0.5))
        for r in orders
        if seg.get(r.o_custkey) == _WT_SEG_A
    ]
    vb = [
        int(math.floor(r.o_totalprice * 100 + 0.5))
        for r in orders
        if seg.get(r.o_custkey) == _WT_SEG_B
    ]
    n1, n2 = len(va), len(vb)
    se1 = (sum(v * v for v in va) - sum(va) ** 2 / n1) / (n1 - 1) / n1
    se2 = (sum(v * v for v in vb) - sum(vb) ** 2 / n2) / (n2 - 1) / n2
    t = (sum(va) / n1 - sum(vb) / n2) / math.sqrt(se1 + se2)
    df = (se1 + se2) ** 2 / (se1**2 / (n1 - 1) + se2**2 / (n2 - 1))
    got = welch_ttest_segments(spark, SF_DIR).collect()[0]
    assert (got["n1"], got["n2"]) == (n1, n2)
    assert abs(got["t_micro"] - _half_up_micro(t)) <= 2
    assert abs(got["df_milli"] - _half_up_micro(df) / 1000) <= 2
    # the synthetic segments are iid draws: |t| should be small
    assert abs(got["t_micro"]) < 4_000_000

    # --- Hodges-Lehmann ---
    odate = {r.o_orderkey: (r.o_orderdate.date(), r.o_orderpriority)
             for r in orders}
    ca, cb = Counter(), Counter()
    for r in (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_shipdate")
        .collect()
    ):
        od, pr = odate[r.l_orderkey]
        d = (r.l_shipdate.date() - od).days
        if d < 0:
            continue
        if pr == _HL_PR_A:
            ca[d] += 1
        elif pr == _HL_PR_B:
            cb[d] += 1
    diffs = Counter()
    for v1, c1 in ca.items():
        for v2, c2 in cb.items():
            diffs[v1 - v2] += c1 * c2
    np_ = sum(diffs.values())
    cum = 0
    hl = None
    for d in sorted(diffs):
        cum += diffs[d]
        if cum * 2 >= np_:
            hl = d
            break
    got = hodges_lehmann_delay_shift(spark, SF_DIR).collect()[0]
    assert (got["n1"], got["n2"]) == (
        sum(ca.values()),
        sum(cb.values()),
    )
    assert got["hl_shift_days"] == hl

    # --- Hoover (one nation) ---
    nk = {
        r.c_custkey: r.c_nationkey
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    nname = {
        r.n_nationkey: r.n_name
        for r in spark.read.parquet(f"{SF_DIR}/nation.parquet").collect()
    }
    rev = defaultdict(int)
    for r in orders:
        rev[r.o_custkey] += int(math.floor(r.o_totalprice * 100 + 0.5))
    target = nname[0]
    xs = [v for ck, v in rev.items() if nk[ck] == 0]
    n, tot = len(xs), sum(xs)
    hoover = sum(abs(n * x - tot) for x in xs) / (2 * n * tot)
    got = {
        r["nation"]: r
        for r in hoover_index_by_nation(spark, SF_DIR).collect()
    }[target]
    assert got["n_customers"] == n
    assert abs(got["hoover_micro"] - _half_up_micro(hoover)) <= 2
    # a Hoover index is a share: strictly inside (0, 1)
    assert 0 < got["hoover_micro"] < 1_000_000


def test_breusch_pagan_and_newey_west_replay(spark):
    """From-scratch replays of the BP auxiliary regression (unit-grain
    squared residuals) and the Bartlett-weighted HAC variance."""
    from ai_etl_studio_spark.operators.drift import (
        breusch_pagan_daily,
        newey_west_se_daily,
    )

    x = _daily_1k_ticks(spark)
    n = len(x)

    # --- Breusch-Pagan ---
    st = sum(range(n))
    sx = sum(x)
    stx = sum(t * v for t, v in enumerate(x))
    stt = sum(t * t for t in range(n))
    b = (n * stx - st * sx) / (n * stt - st * st)
    a = (sx - b * st) / n
    eu = [
        int(math.floor(abs(v - (a + b * t)) + 0.5))
        * (1 if v - (a + b * t) >= 0 else -1)
        for t, v in enumerate(x)
    ]
    y2 = [e * e for e in eu]
    sy = sum(y2)
    sxy = sum(t * y for t, y in enumerate(y2))
    syy = sum(y * y for y in y2)
    num = n * sxy - st * sy
    den = (n * stt - st * st) * (n * syy - sy * sy)
    lm = n * num * num / den
    r = num / math.sqrt(den)
    got = breusch_pagan_daily(spark, SF_DIR).collect()[0]
    assert got["n_days"] == n
    assert abs(got["lm_micro"] - _half_up_micro(lm)) <= 2
    assert abs(got["r_micro"] - _half_up_micro(r)) <= 2

    # --- Newey-West ---
    s1 = sum(x)
    e = [n * v - s1 for v in x]
    gam = [
        sum(e[t] * e[t + k] for t in range(n - k)) for k in range(8)
    ]
    nw8 = 8 * gam[0] + 2 * sum((8 - k) * gam[k] for k in range(1, 8))
    nw_se = math.sqrt(nw8 / 8) / n / n
    infl = math.sqrt(nw8 / 8 / gam[0])
    got = newey_west_se_daily(spark, SF_DIR).collect()[0]
    assert got["n_days"] == n
    assert abs(got["nw_se_micro"] - _half_up_micro(nw_se)) <= 2
    assert abs(got["hac_inflation_micro"] - _half_up_micro(infl)) <= 2
    # the HAC inflation factor is a positive ratio near 1 on this
    # near-memoryless series; assert structure, not direction
    assert 300_000 < got["hac_inflation_micro"] < 3_000_000


def test_wasserstein_js_replay(spark):
    """From-scratch W₁ (sorted-sample transport cost) and JSD (direct
    probability-space formula) replays for one source pair each."""
    from ai_etl_studio_spark.operators.text import (
        js_divergence_source_pairs,
        wasserstein_length_by_source,
    )

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("source", "text")
        .collect()
    )
    toks = defaultdict(list)
    for r in docs:
        if r.text is not None and r.source is not None:
            toks[r.source].append(r.text.split())

    # --- W1 via the dual (quantile) form on raw samples ---
    a = sorted(len(t) for t in toks["src0"])
    b = sorted(len(t) for t in toks["src1"])
    # integer-support W1 = mean |F1^-1(u) - F2^-1(u)| on the lcm grid
    na, nb = len(a), len(b)
    lcm = na * nb // math.gcd(na, nb)
    w1 = sum(
        abs(a[i * na // lcm] - b[i * nb // lcm]) for i in range(lcm)
    ) / lcm
    got = {
        (r["source_a"], r["source_b"]): r["w1_tokens_ppm"]
        for r in wasserstein_length_by_source(spark, SF_DIR).collect()
    }
    assert abs(got[("src0", "src1")] - int(w1 * 1_000_000)) <= 2
    # every pair distance is a nonnegative number of tokens < support
    assert all(0 <= v < 90_000_000 for v in got.values())

    # --- JSD ---
    ca, cb = Counter(), Counter()
    for t in toks["src0"]:
        ca.update(w for w in t if w)
    for t in toks["src1"]:
        cb.update(w for w in t if w)
    n1, n2 = sum(ca.values()), sum(cb.values())
    jsd = 0.0
    for w in set(ca) | set(cb):
        p, q = ca[w] / n1, cb[w] / n2
        m = (p + q) / 2
        if p:
            jsd += p * math.log(p / m) / 2
        if q:
            jsd += q * math.log(q / m) / 2
    got = {
        (r["source_a"], r["source_b"]): r["jsd_micro_nats"]
        for r in js_divergence_source_pairs(spark, SF_DIR).collect()
    }
    assert abs(got[("src0", "src1")] - _half_up_micro(jsd)) <= 3
    # JSD is bounded by ln 2 and strictly positive on distinct corpora
    assert all(0 < v < 693_148 for v in got.values())


def test_cochran_armitage_and_mh_replay(spark):
    """From-scratch CA trend z and MH OR / CMH chi2 replays."""
    from ai_etl_studio_spark.operators.drift import (
        cochran_armitage_discount_trend,
        mantel_haenszel_return_discount,
    )

    oyr = {
        r.o_orderkey: r.o_orderdate.year
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_orderkey", "o_orderdate")
        .collect()
    }
    lines = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_discount", "l_returnflag")
        .collect()
    )

    # --- Cochran-Armitage ---
    lv = defaultdict(lambda: [0, 0])
    for r in lines:
        w = int(math.floor(r.l_discount * 100 + 0.5))
        lv[w][0] += 1
        lv[w][1] += r.l_returnflag == "R"
    nn = sum(v[0] for v in lv.values())
    rr = sum(v[1] for v in lv.values())
    swr = sum(w * v[1] for w, v in lv.items())
    swn = sum(w * v[0] for w, v in lv.items())
    swwn = sum(w * w * v[0] for w, v in lv.items())
    z = (nn * swr - rr * swn) / math.sqrt(
        rr * (nn - rr) * (nn * swwn - swn * swn)
    )
    got = cochran_armitage_discount_trend(spark, SF_DIR).collect()[0]
    assert (got["n_levels"], got["n_lines"]) == (len(lv), nn)
    assert abs(got["z_micro"] - _half_up_micro(z)) <= 2
    # iid flags: the dose-response z stays well inside +-4 sigma
    assert abs(got["z_micro"]) < 4_000_000

    # --- Mantel-Haenszel ---
    strata = defaultdict(lambda: [0, 0, 0, 0])
    for r in lines:
        yr = oyr[r.l_orderkey]
        ex = r.l_discount >= 0.06
        ret = r.l_returnflag == "R"
        strata[yr][0 if ex and ret else 1 if ex else 2 if ret else 3] += 1
    sad = sbc = se = sv = sa = 0
    for a, b, c, d in strata.values():
        n = a + b + c + d
        sa += a
        sad += _half_up_micro(a * d / n)
        sbc += _half_up_micro(b * c / n)
        se += _half_up_micro((a + b) * (a + c) / n)
        sv += _half_up_micro(
            (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
        )
    mh = sad / sbc
    cmh = (sa * 1_000_000 - se) ** 2 / (sv * 1e6)
    got = mantel_haenszel_return_discount(spark, SF_DIR).collect()[0]
    assert got["n_strata"] == len(strata)
    assert abs(got["mh_or_micro"] - _half_up_micro(mh)) <= 2
    assert abs(got["cmh_chi2_micro"] - _half_up_micro(cmh)) <= 2
    # iid exposure: MH OR should sit near 1 (within a generous band)
    assert 500_000 < got["mh_or_micro"] < 2_000_000


def test_kmv_and_nelson_aalen_replay(spark):
    """From-scratch KMV estimate off hashlib md5 and a literal
    Nelson-Aalen event loop."""
    import hashlib

    from ai_etl_studio_spark.operators.analytics import (
        _KMV_K,
        _KMV_SPACE,
        kmv_distinct_eval,
    )
    from ai_etl_studio_spark.operators.drift import nelson_aalen_reorder

    orders = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_orderdate")
        .collect()
    )

    # --- KMV ---
    hashes = sorted(
        {
            hashlib.md5(str(r.o_orderkey).encode()).hexdigest()
            for r in orders
        }
    )
    ndv = len(hashes)
    kth_int = int(hashes[_KMV_K - 1][:12], 16)
    est = (_KMV_K - 1) * _KMV_SPACE / kth_int
    got = kmv_distinct_eval(spark, SF_DIR).collect()[0]
    assert got["ndv_exact"] == ndv
    assert abs(got["kmv_estimate"] - est) <= 1
    # k=256 gives ~6% SE; 5 sigma guard
    assert abs(got["err_ppm"]) < 320_000

    # --- Nelson-Aalen ---
    days = defaultdict(set)
    anchor = None
    for r in orders:
        d = r.o_orderdate.date()
        anchor = d if anchor is None or d > anchor else anchor
        days[r.o_custkey].add(d)
    subj = []
    for ds in days.values():
        ds = sorted(ds)
        if len(ds) >= 2:
            subj.append(((ds[1] - ds[0]).days, 1))
        else:
            subj.append(((anchor - ds[0]).days, 0))
    n = len(subj)
    rows = {}
    cum_h = cum_v = 0
    seen = 0
    for t in sorted({t for t, _ in subj}):
        n_at = n - seen
        d = sum(1 for tt, ev in subj if tt == t and ev)
        if d > 0:
            cum_h += _half_up_micro(d / n_at)
            cum_v += _half_up_micro(d / (n_at * n_at) * 1000)
            rows[t] = (n_at, d, cum_h, cum_v)
        seen += sum(1 for tt, _ in subj if tt == t)
    got_rows = {
        r["t_days"]: (
            r["n_at"],
            r["d_events"],
            r["na_cumhaz_micro"],
            r["na_var_nano"],
        )
        for r in nelson_aalen_reorder(spark, SF_DIR).collect()
    }
    assert got_rows == rows
    # the cumulative hazard is nondecreasing and ends positive
    assert max(v[2] for v in rows.values()) > 0


def test_granger_and_knn_reciprocity_replay(spark):
    """From-scratch replays: Granger F via numpy lstsq-free normal
    equations, and kNN reciprocity via a literal O(m²) loop."""
    from ai_etl_studio_spark.operators.drift import (
        granger_orders_to_revenue,
    )
    from ai_etl_studio_spark.operators.similarity import (
        _ID_SAMPLE_CAP,
        _ID_SAMPLE_MOD,
        _RECIP_K,
        knn_reciprocity_rate,
    )

    # --- Granger ---
    daily = defaultdict(lambda: [0, 0])
    for r in (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_orderdate", "o_totalprice")
        .collect()
    ):
        d = r.o_orderdate.date()
        daily[d][0] += int(math.floor(r.o_totalprice * 100 + 0.5))
        daily[d][1] += 1
    series = [daily[d] for d in sorted(daily)]
    xs = [int(math.floor(abs(v[0]) / 100000 + 0.5)) for v in series]
    cs = [v[1] for v in series]
    y = xs[1:]
    yl = xs[:-1]
    cl = cs[:-1]
    n = len(y)
    sy, syl, scl = sum(y), sum(yl), sum(cl)
    syyl = sum(a * b for a, b in zip(y, yl))
    sycl = sum(a * b for a, b in zip(y, cl))
    syl2 = sum(a * a for a in yl)
    scl2 = sum(a * a for a in cl)
    sylcl = sum(a * b for a, b in zip(yl, cl))
    syy = sum(a * a for a in y)
    a11 = n * syl2 - syl * syl
    a12 = n * sylcl - syl * scl
    a22 = n * scl2 - scl * scl
    b1 = n * syyl - sy * syl
    b2 = n * sycl - sy * scl
    syyc = n * syy - sy * sy
    det = a11 * a22 - a12 * a12
    regss = (b1 * (a22 * b1 - a12 * b2) + b2 * (a11 * b2 - a12 * b1)) / det
    rss_u = syyc - regss
    rss_r = syyc - b1 * b1 / a11
    f = (rss_r - rss_u) * (n - 3) / rss_u
    beta2 = (a11 * b2 - a12 * b1) / det
    got = granger_orders_to_revenue(spark, SF_DIR).collect()[0]
    assert got["n_days_used"] == n
    assert abs(got["f_micro"] - _half_up_micro(f)) <= 2
    assert abs(got["beta_orders_micro"] - _half_up_micro(beta2)) <= 2
    # F is nonnegative by construction
    assert got["f_micro"] >= 0

    # --- kNN reciprocity ---
    vecs = {
        r.vec_id: [
            int(math.floor(abs(x) * 1_000_000 + 0.5))
            * (1 if x >= 0 else -1)
            for x in r.embedding
        ]
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
        if r.vec_id % _ID_SAMPLE_MOD == 0 and r.vec_id < _ID_SAMPLE_CAP
    }
    ids = sorted(vecs)
    nnsets = {}
    for i in ids:
        ds = sorted(
            (
                sum((a - b) ** 2 for a, b in zip(vecs[i], vecs[j])),
                j,
            )
            for j in ids
            if j != i
        )[:_RECIP_K]
        nnsets[i] = {j for _, j in ds}
    n_edges = sum(len(s) for s in nnsets.values())
    n_mutual = sum(
        1 for i in ids for j in nnsets[i] if i in nnsets[j]
    )
    got = knn_reciprocity_rate(spark, SF_DIR).collect()[0]
    assert (got["n_sample"], got["n_edges"], got["n_mutual"]) == (
        len(ids),
        n_edges,
        n_mutual,
    )
    assert got["reciprocity_ppm"] == n_mutual * 1_000_000 // n_edges


def test_cusumsq_and_participation_ratio_replay(spark):
    """From-scratch CUSUM-of-squares scan and a numpy eigenvalue
    cross-check of the participation ratio."""
    import numpy as np

    from ai_etl_studio_spark.operators.drift import (
        cusumsq_variance_break_daily,
    )
    from ai_etl_studio_spark.operators.similarity import (
        embedding_participation_ratio,
    )

    # --- CUSUMSQ ---
    x = _daily_1k_ticks(spark)
    n = len(x)
    st = sum(range(n))
    sx = sum(x)
    stx = sum(t * v for t, v in enumerate(x))
    stt = sum(t * t for t in range(n))
    b = (n * stx - st * sx) / (n * stt - st * st)
    a = (sx - b * st) / n
    eu = [
        int(math.floor(abs(v - (a + b * t)) + 0.5))
        * (1 if v - (a + b * t) >= 0 else -1)
        for t, v in enumerate(x)
    ]
    y2 = [e * e for e in eu]
    tot = sum(y2)
    best = (-1, None)
    s_t = 0
    for i, v in enumerate(y2, start=1):
        s_t += v
        dev = abs(s_t * n - tot * i)
        if dev > best[0]:
            best = (dev, i - 1)  # t is the 0-based day index
    got = cusumsq_variance_break_daily(spark, SF_DIR).collect()[0]
    assert got["n_days"] == n
    assert got["break_t"] == best[1]
    assert (
        abs(got["cusumsq_micro"] - _half_up_micro(best[0] / (tot * n))) <= 2
    )
    # stationary synthetic noise: the stat stays under ~3x the 5% band
    assert got["cusumsq_micro"] < int(3 * 0.948 / math.sqrt(n) * 1e6)

    # --- participation ratio ---
    m = np.array(
        [
            [
                int(math.floor(abs(v) * 1e6 + 0.5)) * (1 if v >= 0 else -1)
                for v in r.embedding
            ]
            for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
            .select("embedding")
            .collect()
        ],
        dtype=np.int64,
    )
    nvec = m.shape[0]
    g = (m.T @ m).astype(object)  # python ints: exact floor division
    gn = np.vectorize(lambda v: int(v) // nvec, otypes=[object])(g)
    tr = sum(int(gn[i, i]) for i in range(gn.shape[0]))
    trg2 = sum(
        int(gn[i, j]) * int(gn[i, j])
        for i in range(gn.shape[0])
        for j in range(gn.shape[1])
    )
    got = embedding_participation_ratio(spark, SF_DIR).collect()[0]
    assert got["n_vectors"] == nvec
    assert got["trace_g"] == tr
    assert abs(got["pr_micro"] - _half_up_micro(tr * tr / trg2)) <= 2
    # sanity vs the true eigen spectrum (float): PR within 0.1%
    lam = np.linalg.eigvalsh((m.astype(float).T @ m.astype(float)) / nvec)
    pr_eig = lam.sum() ** 2 / (lam**2).sum()
    assert abs(got["pr_micro"] / 1e6 - pr_eig) < pr_eig * 1e-3
    # effective rank is between 1 and dim
    assert 1_000_000 <= got["pr_micro"] <= 64_000_000


def test_anderson_darling_and_partial_corr_replay(spark):
    """From-scratch tie-grouped AD and textbook partial correlation."""
    from ai_etl_studio_spark.operators.drift import (
        _GRP_A,
        _GRP_B,
        anderson_darling_two_sample,
        partial_corr_value_delay_lines,
    )

    orders = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_orderkey", "o_orderpriority", "o_totalprice", "o_orderdate")
        .collect()
    )

    # --- AD ---
    va, vb = Counter(), Counter()
    for r in orders:
        v = int(math.floor(r.o_totalprice * 100 + 0.5))
        if r.o_orderpriority == _GRP_A:
            va[v] += 1
        elif r.o_orderpriority == _GRP_B:
            vb[v] += 1
    n1, n2 = sum(va.values()), sum(vb.values())
    nn = n1 + n2
    cum_a = cum_b = 0
    s_milli = 0
    for v in sorted(set(va) | set(vb)):
        cum_a += va[v]
        cum_b += vb[v]
        b = cum_a + cum_b
        if b >= nn:
            continue
        g = cum_a * nn - n1 * b
        s_milli += _half_up_micro(
            (va[v] + vb[v]) * float(g) * float(g) / (b * (nn - b)) / 1000
        )
    a2 = s_milli / 1000 / (n1 * n2)
    got = anderson_darling_two_sample(spark, SF_DIR).collect()[0]
    assert (got["n1"], got["n2"]) == (n1, n2)
    assert abs(got["ad_a2_micro"] - _half_up_micro(a2)) <= 2
    # same-distribution synthetic samples: A2 stays small
    assert got["ad_a2_micro"] < 6_000_000

    # --- partial correlation ---
    odata = {
        r.o_orderkey: (
            int(math.floor(r.o_totalprice * 100 + 0.5)),
            r.o_orderdate.date(),
        )
        for r in orders
    }
    per = defaultdict(lambda: [0, None, 0])
    for r in (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_shipdate")
        .collect()
    ):
        x, od = odata[r.l_orderkey]
        d = (r.l_shipdate.date() - od).days  # can be NEGATIVE here
        e = per[r.l_orderkey]
        e[0] = x
        e[1] = d if e[1] is None else max(e[1], d)
        e[2] += 1
    xs = [v[0] for v in per.values()]
    ys = [v[1] for v in per.values()]
    zs = [v[2] for v in per.values()]
    n = len(xs)

    def pear(a, b):
        sa, sb = sum(a), sum(b)
        sab = sum(i * j for i, j in zip(a, b))
        saa = sum(i * i for i in a)
        sbb = sum(j * j for j in b)
        return (n * sab - sa * sb) / (
            math.sqrt(n * saa - sa * sa) * math.sqrt(n * sbb - sb * sb)
        )

    rxy, rxz, ryz = pear(xs, ys), pear(xs, zs), pear(ys, zs)
    part = (rxy - rxz * ryz) / math.sqrt((1 - rxz**2) * (1 - ryz**2))
    got = partial_corr_value_delay_lines(spark, SF_DIR).collect()[0]
    assert got["n_orders"] == n
    assert abs(got["r_xy_micro"] - _half_up_micro(rxy)) <= 2
    assert abs(got["r_xy_given_z_micro"] - _half_up_micro(part)) <= 2
    # structure only: the partial is a valid correlation (direction can
    # AMPLIFY under suppression — it does on this corpus, where the
    # line-count channel masks part of the value-delay relation)
    assert -1_000_000 <= got["r_xy_given_z_micro"] <= 1_000_000


def test_cronbach_kendallw_gpd_replay(spark):
    """From-scratch replays: Cronbach alpha on the completed grid,
    Kendall's W rank sums, and the GPD moment fit."""
    from ai_etl_studio_spark.operators.analytics import (
        cronbach_alpha_nation_months,
        kendalls_w_nation_rank_stability,
    )
    from ai_etl_studio_spark.operators.drift import gpd_tail_fit_daily

    nk = {
        r.c_custkey: r.c_nationkey
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    orders = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_custkey", "o_orderdate", "o_totalprice")
        .collect()
    )

    # --- Cronbach ---
    X = defaultdict(lambda: defaultdict(int))
    for r in orders:
        X[nk[r.o_custkey]][r.o_orderdate.month] += int(
            math.floor(r.o_totalprice * 100 + 0.5)
        )
    nats = sorted(X)
    n, k = len(nats), 12

    def nvar(vals):
        return len(vals) * sum(v * v for v in vals) - sum(vals) ** 2

    svi = sum(
        nvar([X[na].get(m, 0) for na in nats]) for m in range(1, 13)
    )
    vt = nvar([sum(X[na].get(m, 0) for m in range(1, 13)) for na in nats])
    alpha = k / (k - 1) * (1 - svi / vt)
    got = cronbach_alpha_nation_months(spark, SF_DIR).collect()[0]
    assert (got["n_nations"], got["n_items"]) == (n, k)
    assert abs(got["alpha_micro"] - _half_up_micro(alpha)) <= 2
    assert 0 < got["alpha_micro"] <= 1_000_000

    # --- Kendall's W ---
    Y = defaultdict(lambda: defaultdict(int))
    for r in orders:
        Y[r.o_orderdate.year][nk[r.o_custkey]] += int(
            math.floor(r.o_totalprice * 100 + 0.5)
        )
    years = sorted(Y)
    m = len(years)
    rsum = defaultdict(int)
    for y in years:
        vals = sorted(Y[y].items(), key=lambda kv: kv[1])
        for i, (na, _) in enumerate(vals, 1):
            rsum[na] += i
    nn = len(rsum)
    s4 = sum((2 * rsum[na] - m * (nn + 1)) ** 2 for na in rsum)
    w = 3 * s4 / (m * m * (nn**3 - nn))
    got = kendalls_w_nation_rank_stability(spark, SF_DIR).collect()[0]
    assert (got["n_nations"], got["n_years"]) == (nn, m)
    assert abs(got["w_micro"] - _half_up_micro(w)) <= 2
    # rankings of differently-sized nations are strongly concordant
    assert got["w_micro"] > 200_000

    # --- GPD ---
    x = sorted(_daily_1k_ticks(spark))
    nd = len(x)
    cut = math.ceil(0.95 * nd)
    u = x[cut - 1]
    exc = [v - u for v in x if v > u]
    ne = len(exc)
    mb = sum(exc) / ne
    s2 = sum(e * e for e in exc) / ne - mb * mb
    q = mb * mb / s2
    xi = (1 - q) / 2
    sig = mb * (q + 1) / 2
    got = gpd_tail_fit_daily(spark, SF_DIR).collect()[0]
    assert (got["threshold_1k"], got["n_exceedances"]) == (u, ne)
    assert abs(got["gpd_xi_micro"] - _half_up_micro(xi)) <= 2
    assert abs(got["gpd_sigma_milli"] - _half_up_micro(sig) / 1000) <= 2
    # aggregate daily revenue is not heavy-tailed: xi well below 0.5
    assert got["gpd_xi_micro"] < 500_000


def test_distance_correlation_replay(spark):
    """From-scratch V-statistic dCor over the literal bucket grid,
    plus a numpy double-centering cross-check of the same grid."""
    import numpy as np

    from ai_etl_studio_spark.operators.drift import (
        distance_correlation_delay_value,
    )

    odata = {
        r.o_orderkey: (
            int(math.floor(r.o_totalprice * 100 + 0.5)) // 1_000_000,
            r.o_orderdate.date(),
        )
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .collect()
    }
    cells = Counter()
    for r in (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_shipdate")
        .collect()
    ):
        dy, od = odata[r.l_orderkey]
        d = (r.l_shipdate.date() - od).days
        if d < 0:
            continue
        cells[(d // 14, dy)] += 1
    keys = sorted(cells)
    w = np.array([cells[k] for k in keys], dtype=float)
    dx = np.array([k[0] for k in keys], dtype=float)
    dy = np.array([k[1] for k in keys], dtype=float)
    n = w.sum()
    ax_m = np.abs(dx[:, None] - dx[None, :])
    ay_m = np.abs(dy[:, None] - dy[None, :])
    s1xy = w @ (ax_m * ay_m) @ w
    s1xx = w @ (ax_m * ax_m) @ w
    s1yy = w @ (ay_m * ay_m) @ w
    ax = ax_m @ w
    ay = ay_m @ w
    sx, sy = w @ ax, w @ ay
    s3xy = (w * ax * ay).sum()
    s3xx = (w * ax * ax).sum()
    s3yy = (w * ay * ay).sum()
    dcov2 = s1xy / n**2 + sx * sy / n**4 - 2 * s3xy / n**3
    dvarx = s1xx / n**2 + sx * sx / n**4 - 2 * s3xx / n**3
    dvary = s1yy / n**2 + sy * sy / n**4 - 2 * s3yy / n**3
    dcor = math.sqrt(max(dcov2, 0)) / math.sqrt(math.sqrt(dvarx * dvary))
    got = distance_correlation_delay_value(spark, SF_DIR).collect()[0]
    assert (got["n_lines"], got["n_cells"]) == (int(n), len(keys))
    assert abs(got["dcor_micro"] - _half_up_micro(dcor)) <= 5
    assert abs(got["dcov2_micro"] - _half_up_micro(dcov2)) <= 5
    # double-centering identity cross-check: dCov² from the centered
    # distance matrices (weighted V-statistic) matches the 3-sum form
    A = ax_m - (ax[:, None] / n) - (ax[None, :] / n) + sx / n**2
    B = ay_m - (ay[:, None] / n) - (ay[None, :] / n) + sy / n**2
    dcov2_c = (w @ (A * B) @ w) / n**2
    assert abs(dcov2_c - dcov2) < 1e-9 * max(1.0, abs(dcov2))
    # dCor is a correlation: in [0, 1]
    assert 0 <= got["dcor_micro"] <= 1_000_000


def test_littles_law_and_chained_index_replay(spark):
    """Little's law: the global identity sum(open_days) == sum(tot_w)
    must hold EXACTLY; chained index: literal link replay for one
    month plus monotone bookkeeping."""
    from ai_etl_studio_spark.operators.analytics import (
        chained_laspeyres_monthly,
        littles_law_monthly,
    )

    import datetime as dt

    odate = {
        r.o_orderkey: r.o_orderdate.date()
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_orderkey", "o_orderdate")
        .collect()
    }
    last_ship = {}
    for r in (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_shipdate")
        .collect()
    ):
        d = r.l_shipdate.date()
        if r.l_orderkey not in last_ship or d > last_ship[r.l_orderkey]:
            last_ship[r.l_orderkey] = d
    spans = [
        (odate[k], d2)
        for k, d2 in last_ship.items()
        if d2 >= odate[k]
    ]
    open_days = defaultdict(int)
    arr = defaultdict(lambda: [0, 0])
    for d1, d2 in spans:
        a = arr[d1.replace(day=1)]
        a[0] += 1
        a[1] += (d2 - d1).days + 1
        m = d1.replace(day=1)
        while m <= d2:
            nxt = (m + dt.timedelta(days=32)).replace(day=1)
            open_days[m] += (
                min(d2, nxt - dt.timedelta(days=1)) - max(d1, m)
            ).days + 1
            m = nxt
    # design identity: the WIP integral over ALL months equals the
    # arrivals' total residence exactly (every span fully partitioned)
    assert sum(open_days.values()) == sum(v[1] for v in arr.values())
    rows = littles_law_monthly(spark, SF_DIR).collect()
    # the op emits months having BOTH arrivals and WIP (inner join) —
    # replay every emitted row exactly
    for r in rows:
        m = r["month"]
        assert r["open_days"] == open_days[m]
        assert (r["arrivals"], r["tot_w"]) == tuple(arr[m])
        assert r["l_over_lw_ppm"] == open_days[m] * 1_000_000 // arr[m][1]
    # structure: positive ratios that RAMP (late months carry WIP from
    # years of older orders against thin fresh arrivals, so the ratio
    # legitimately passes 1 near the horizon end)
    assert all(r["l_over_lw_ppm"] >= 1 for r in rows)
    assert rows[-1]["l_over_lw_ppm"] > rows[0]["l_over_lw_ppm"]

    # --- chained Laspeyres: replay one month's link ---
    odate = {}
    pm = defaultdict(lambda: [0, 0])
    for r in (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_partkey", "l_shipdate", "l_extendedprice", "l_quantity")
        .collect()
    ):
        m = r.l_shipdate.date().replace(day=1)
        e = pm[(r.l_partkey, m)]
        e[0] += int(math.floor(r.l_extendedprice * 100 + 0.5))
        e[1] += int(math.floor(r.l_quantity + 0.5))
    got = chained_laspeyres_monthly(spark, SF_DIR).collect()
    target = got[len(got) // 2]
    m = target["month"]
    prev_m = (m.replace(day=1) - __import__("datetime").timedelta(days=1)).replace(day=1)
    num = den = cp = 0
    for (pk, mm), (rev, qty) in pm.items():
        if mm != m or qty < 1:
            continue
        pr = pm.get((pk, prev_m))
        if not pr or pr[1] < 1:
            continue
        cp += 1
        num += int(math.floor(rev * pr[1] / qty + 0.5))
        den += pr[0]
    assert target["common_parts"] == cp
    assert target["link_ppm"] == num * 1_000_000 // den
    lnl = _half_up_micro(math.log(num / den))
    # the chain is the running sum of per-month quantized ln links
    idx = [r for r in got]
    i = next(j for j, r in enumerate(idx) if r["month"] == m)
    assert (
        idx[i]["chain_log_micro"] - (idx[i - 1]["chain_log_micro"] if i else 0)
        == lnl
    )


def test_diebold_mariano_and_lorenz_asymmetry_replay(spark):
    """From-scratch DM on MAE loss and the discrete LAC for one
    nation."""
    from ai_etl_studio_spark.operators.analytics import (
        lorenz_asymmetry_by_nation,
    )
    from ai_etl_studio_spark.operators.drift import (
        diebold_mariano_naive_vs_ols,
    )

    # --- DM ---
    x = _daily_1k_ticks(spark)
    n = len(x)
    st = sum(range(n))
    sx = sum(x)
    stx = sum(t * v for t, v in enumerate(x))
    stt = sum(t * t for t in range(n))
    b = (n * stx - st * sx) / (n * stt - st * st)
    a = (sx - b * st) / n
    eu = [
        int(math.floor(abs(v - (a + b * t)) + 0.5))
        * (1 if v - (a + b * t) >= 0 else -1)
        for t, v in enumerate(x)
    ]
    d = [abs(x[t] - x[t - 7]) - abs(eu[t]) for t in range(7, n)]
    m = len(d)
    s1 = sum(d)
    e = [m * v - s1 for v in d]
    gam = [sum(e[t] * e[t + k] for t in range(m - k)) for k in range(8)]
    nw8 = 8 * gam[0] + 2 * sum((8 - k) * gam[k] for k in range(1, 8))
    dm = (s1 / m) / math.sqrt(nw8 / 8 / m**3 / m)
    got = diebold_mariano_naive_vs_ols(spark, SF_DIR).collect()[0]
    assert got["n_days_used"] == m
    assert abs(got["mean_loss_diff_milli"] - _half_up_micro(s1 / m) / 1000) <= 2
    assert abs(got["dm_micro"] - _half_up_micro(dm)) <= 2
    # the OLS trend should beat weekly persistence on this series
    assert got["dm_micro"] > 2_000_000

    # --- Lorenz asymmetry (one nation) ---
    nk = {
        r.c_custkey: r.c_nationkey
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    nname = {
        r.n_nationkey: r.n_name
        for r in spark.read.parquet(f"{SF_DIR}/nation.parquet").collect()
    }
    rev = defaultdict(int)
    for r in (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_custkey", "o_totalprice")
        .collect()
    ):
        rev[r.o_custkey] += int(math.floor(r.o_totalprice * 100 + 0.5))
    xs = [v for ck, v in rev.items() if nk[ck] == 0]
    nn, tot = len(xs), sum(xs)
    nb = sum(1 for v in xs if v * nn < tot)
    vb = sum(v for v in xs if v * nn < tot)
    lac = nb / nn + vb / tot
    got = {
        r["nation"]: r
        for r in lorenz_asymmetry_by_nation(spark, SF_DIR).collect()
    }[nname[0]]
    assert got["n_customers"] == nn
    assert abs(got["lac_micro"] - _half_up_micro(lac)) <= 2
    # an LAC is two sub-unit shares: inside (0, 2)
    assert 0 < got["lac_micro"] < 2_000_000


def test_pettitt_and_seasonal_mk_replay(spark):
    """From-scratch Pettitt (literal double loop over ranks) and
    seasonal MK (literal within-stratum pair loop)."""
    from ai_etl_studio_spark.operators.drift import (
        pettitt_changepoint_daily,
        seasonal_mann_kendall_dow,
    )

    daily = defaultdict(int)
    for r in (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_orderdate", "o_totalprice")
        .collect()
    ):
        daily[r.o_orderdate.date()] += int(
            math.floor(r.o_totalprice * 100 + 0.5)
        )
    days = sorted(daily)
    x = [int(math.floor(daily[d] / 100000 + 0.5)) for d in days]
    n = len(x)

    # --- Pettitt via doubled midranks ---
    from collections import Counter as _C

    cnt = _C(x)
    cum = 0
    r2v = {}
    for v in sorted(cnt):
        cum += cnt[v]
        r2v[v] = 2 * cum - cnt[v] + 1
    s = 0
    best = (-1, None)
    for t, v in enumerate(x):
        s += r2v[v]
        ut = s - (t + 1) * (n + 1)
        if t < n - 2 + 1 and t < n - 1:
            if abs(ut) > best[0]:
                best = (abs(ut), t)
    # cross-check U_t against the literal sign double-sum at one t
    t0 = n // 3
    u_lit = sum(
        (x[i] > x[j]) - (x[i] < x[j])
        for i in range(t0 + 1)
        for j in range(t0 + 1, n)
    )
    s0 = sum(r2v[v] for v in x[: t0 + 1]) - (t0 + 1) * (n + 1)
    assert s0 == u_lit
    got = pettitt_changepoint_daily(spark, SF_DIR).collect()[0]
    assert got["n_days"] == n
    assert got["pettitt_k"] == best[0]
    assert got["break_t"] == best[1]
    p = 2 * math.exp(-6 * best[0] ** 2 / (n * n * (n + 1)))
    assert abs(got["p_approx_micro"] - _half_up_micro(p)) <= 2

    # --- seasonal MK ---
    g = [d.isoweekday() for d in days]
    sm = 0
    var18 = 0
    for wd in set(g):
        idx = [i for i in range(n) if g[i] == wd]
        ng = len(idx)
        var18 += ng * (ng - 1) * (2 * ng + 5)
        for a in range(len(idx)):
            for b in range(a + 1, len(idx)):
                sm += (x[idx[b]] > x[idx[a]]) - (x[idx[b]] < x[idx[a]])
    z = (sm - (1 if sm > 0 else -1 if sm < 0 else 0)) / math.sqrt(
        var18 / 18
    )
    got = seasonal_mann_kendall_dow(spark, SF_DIR).collect()[0]
    assert got["n_days"] == n
    assert got["smk_s"] == sm
    assert abs(got["smk_z_micro"] - _half_up_micro(z)) <= 2


def test_james_stein_and_conformal_replay(spark):
    """From-scratch JS shrink factor and the conformal split replay."""
    from ai_etl_studio_spark.operators.analytics import (
        james_stein_nation_means,
    )
    from ai_etl_studio_spark.operators.drift import (
        conformal_interval_naive_daily,
    )

    nk = {
        r.c_custkey: r.c_nationkey
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    g = defaultdict(lambda: [0, 0, 0])
    for r in (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_custkey", "o_totalprice")
        .collect()
    ):
        v = int(math.floor(r.o_totalprice * 100 + 0.5))
        e = g[nk[r.o_custkey]]
        e[0] += 1
        e[1] += v
        e[2] += v * v
    k = len(g)
    ntot = sum(e[0] for e in g.values())
    stot = sum(e[1] for e in g.values())
    grand = stot / ntot
    ssw = sum(
        _half_up_micro((e[2] - e[1] ** 2 / e[0]) / 10000) / 1_000_000
        for e in g.values()
    )
    ssb = sum(
        _half_up_micro((e[1] / e[0] - grand) ** 2 / 10000) / 1_000_000
        for e in g.values()
    )
    shrink = max(0.0, 1 - (k - 3) * (ssw / (ntot - k)) / (ntot / k) / ssb)
    got = {r["nation"]: r for r in james_stein_nation_means(spark, SF_DIR).collect()}
    row = next(iter(got.values()))
    assert abs(row["shrink_micro"] - _half_up_micro(shrink)) <= 2
    # shrunk means must lie between each raw mean and the grand mean
    for r in got.values():
        lo, hi = sorted((r["raw_mean_cents"], int(round(grand))))
        assert lo - 2 <= r["js_mean_cents"] <= hi + 2

    # --- conformal ---
    x = _daily_1k_ticks(spark)
    e = [(t, abs(x[t] - x[t - 7])) for t in range(7, len(x))]
    cal = sorted(v for t, v in e if t % 2 == 0)
    tst = [v for t, v in e if t % 2 == 1]
    q = cal[math.ceil(0.9 * len(cal)) - 1]
    covered = sum(1 for v in tst if v <= q)
    got = conformal_interval_naive_daily(spark, SF_DIR).collect()[0]
    assert (got["n_cal"], got["n_test"]) == (len(cal), len(tst))
    assert got["q90_width_1k"] == q
    assert got["coverage_ppm"] == covered * 1_000_000 // len(tst)
    # the conformal guarantee: holdout coverage near the 90% target
    assert 800_000 <= got["coverage_ppm"] <= 980_000


def test_cluster_se_and_oaxaca_replay(spark):
    """From-scratch CR1 cluster SE / DEFF and the two-group
    Oaxaca-Blinder split."""
    from ai_etl_studio_spark.operators.analytics import (
        oaxaca_value_gap_segments,
    )
    from ai_etl_studio_spark.operators.drift import (
        cluster_robust_se_nation,
    )

    cust = {
        r.c_custkey: (r.c_nationkey, r.c_mktsegment)
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    orders = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .collect()
    )

    # --- cluster-robust SE ---
    g = defaultdict(lambda: [0, 0])
    q = 0
    for r in orders:
        v = int(math.floor(r.o_totalprice * 100 + 0.5))
        e = g[cust[r.o_custkey][0]]
        e[0] += 1
        e[1] += v
        q += v * v
    k = len(g)
    N = sum(e[0] for e in g.values())
    S = sum(e[1] for e in g.values())
    def hup(x):
        return int(math.floor(x + 0.5)) if x >= 0 else -int(
            math.floor(-x + 0.5)
        )

    num_m2 = sum(
        hup((N * e[1] - e[0] * S) / 1_000_000) ** 2 for e in g.values()
    )
    se_cl = math.sqrt(k / (k - 1) * num_m2) * 1_000_000 / N / N
    s2 = (q - S * S / N) / (N - 1)
    se_iid = math.sqrt(s2 / N)
    got = cluster_robust_se_nation(spark, SF_DIR).collect()[0]
    assert (got["n_clusters"], got["n_orders"]) == (k, N)
    assert abs(got["se_cluster_cents_micro"] - _half_up_micro(se_cl)) <= 3
    assert abs(got["se_iid_cents_micro"] - _half_up_micro(se_iid)) <= 3
    # no engineered intra-nation clustering: DEFF close to 1
    assert 500_000 < got["deff_micro"] < 2_000_000

    # --- Oaxaca ---
    lines = Counter()
    for r in (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey")
        .collect()
    ):
        lines[r.l_orderkey] += 1
    st = {1: [0, 0, 0, 0, 0], 0: [0, 0, 0, 0, 0]}
    for r in orders:
        seg = cust[r.o_custkey][1]
        if seg not in ("BUILDING", "MACHINERY") or r.o_orderkey not in lines:
            continue
        ga = 1 if seg == "BUILDING" else 0
        y = int(math.floor(r.o_totalprice * 100 + 0.5))
        z = lines[r.o_orderkey]
        e = st[ga]
        e[0] += 1
        e[1] += y
        e[2] += z
        e[3] += y * z
        e[4] += z * z
    na, sya, sza, syza, szza = st[1]
    nb, syb, szb, syzb, szzb = st[0]
    bb = (nb * syzb - szb * syb) / (nb * szzb - szb * szb)
    ba = (na * syza - sza * sya) / (na * szza - sza * sza)
    gap = sya / na - syb / nb
    expl = (sza / na - szb / nb) * bb
    got = oaxaca_value_gap_segments(spark, SF_DIR).collect()[0]
    assert (got["n_a"], got["n_b"]) == (na, nb)
    assert abs(got["gap_cents"] - round(gap)) <= 1
    assert abs(got["explained_cents"] - round(expl)) <= 1
    assert abs(got["unexplained_cents"] - round(gap - expl)) <= 2
    assert abs(got["slope_b_milli"] - _half_up_micro(bb) / 1000) <= 2
    # decomposition identity: explained + unexplained == gap (±1 tick)
    assert (
        abs(
            got["explained_cents"]
            + got["unexplained_cents"]
            - got["gap_cents"]
        )
        <= 2
    )


def test_sprt_and_raking_replay(spark):
    """From-scratch SPRT trace and a literal IPF loop replay."""
    from ai_etl_studio_spark.operators.analytics import (
        _IPF_ITERS,
        raking_ipf_nation_segment,
    )
    from ai_etl_studio_spark.operators.drift import (
        _SPRT_A,
        _SPRT_B,
        _SPRT_C0,
        _SPRT_C1,
        sprt_urgent_rate_monitor,
    )

    orders = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_custkey", "o_orderdate", "o_orderpriority")
        .collect()
    )

    # --- SPRT ---
    daily = defaultdict(lambda: [0, 0])
    for r in orders:
        e = daily[r.o_orderdate.date()]
        e[0] += 1
        e[1] += r.o_orderpriority == "1-URGENT"
    llr = 0
    t_h1 = t_h0 = None
    mx = mn = 0
    for t, d in enumerate(sorted(daily)):
        n, u = daily[d]
        llr += u * _SPRT_C1 + (n - u) * _SPRT_C0
        mx, mn = max(mx, llr), min(mn, llr)
        if t_h1 is None and llr >= _SPRT_A:
            t_h1 = t
        if t_h0 is None and llr <= _SPRT_B:
            t_h0 = t
    got = sprt_urgent_rate_monitor(spark, SF_DIR).collect()[0]
    assert got["n_days"] == len(daily)
    assert (got["t_accept_h1"], got["t_accept_h0"]) == (t_h1, t_h0)
    assert (got["max_llr_micro"], got["min_llr_micro"]) == (mx, mn)
    # the corpus rate is ~20%, not 21%: H1 must never win; at sf0.001
    # the trace legitimately ends still inside the Wald corridor
    assert got["decision"] in ("accept_h0", "continue")
    assert got["t_accept_h1"] is None

    # --- raking ---
    cust = {
        r.c_custkey: (r.c_nationkey, r.c_mktsegment)
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    pop = Counter(cust.values())
    smp_c = {
        cust[r.o_custkey]: None
        for r in orders
        if r.o_orderdate.year == 1998
    }
    smp = Counter()
    seen = set()
    for r in orders:
        if r.o_orderdate.year == 1998 and r.o_custkey not in seen:
            seen.add(r.o_custkey)
            smp[cust[r.o_custkey]] += 1
    cells = sorted(pop)
    pr = Counter()
    pc = Counter()
    for (nk, seg), p in pop.items():
        pr[nk] += p
        pc[seg] += p
    w = {c: smp.get(c, 0) * 1_000_000 for c in cells}

    def hup(x):
        return int(math.floor(x + 0.5))

    for _ in range(_IPF_ITERS):
        for axis, marg in ((0, pr), (1, pc)):
            tot = Counter()
            for c_, v in w.items():
                tot[c_[axis]] += v
            w = {
                c_: (
                    hup(v * marg[c_[axis]] * 1_000_000 / tot[c_[axis]])
                    if tot[c_[axis]] > 0
                    else 0
                )
                for c_, v in w.items()
            }
    got = {
        (r["nationkey"], r["segment"]): r
        for r in raking_ipf_nation_segment(spark, SF_DIR).collect()
    }
    assert set(got) == set(cells)
    for c_, r in got.items():
        assert r["rake_weight_micro"] == w[c_], c_
    # margins: where every sample cell in a nation is nonzero the
    # residual is tiny (quantization only)
    full = [
        nk
        for nk in pr
        if all(smp.get((nk, s), 0) > 0 for s in pc)
    ]
    for nk in full:
        rows = [r for c_, r in got.items() if c_[0] == nk]
        assert rows[0]["nation_margin_resid_micro"] <= len(rows) * 2_000_000


def test_var_backtest_and_tukey_hsd_replay(spark):
    """From-scratch Kupiec/Christoffersen LRs and the HSD half-width."""
    from ai_etl_studio_spark.operators.drift import (
        _HSD_Q_MICRO,
        tukey_hsd_delay_priorities,
        var_backtest_daily,
    )

    # --- VaR backtest ---
    x = _daily_1k_ticks(spark)
    n = len(x)
    cal = sorted(x[: n // 2])
    var5 = cal[math.ceil(0.05 * len(cal)) - 1]
    viol = [1 if v < var5 else 0 for v in x[n // 2:]]
    nt, n1 = len(viol), sum(viol)

    def ll(a, b):
        out = 0.0
        if b > 0:
            out += b * math.log(b / (a + b))
        if a > 0:
            out += a * math.log(a / (a + b))
        return out

    lr_pof = -2 * (
        (nt - n1) * math.log(0.95) + n1 * math.log(0.05) - ll(nt - n1, n1)
    )
    n00 = n01 = n10 = n11 = 0
    for a, b in zip(viol, viol[1:]):
        if a == 0 and b == 0:
            n00 += 1
        elif a == 0:
            n01 += 1
        elif b == 0:
            n10 += 1
        else:
            n11 += 1
    lr_ind = -2 * (
        ll(n00 + n10, n01 + n11) - (ll(n00, n01) + ll(n10, n11))
    )
    got = var_backtest_daily(spark, SF_DIR).collect()[0]
    assert (got["var5_1k"], got["n_test"], got["n_violations"]) == (
        var5,
        nt,
        n1,
    )
    assert abs(got["lr_pof_micro"] - _half_up_micro(lr_pof)) <= 2
    assert abs(got["lr_ind_micro"] - _half_up_micro(lr_ind)) <= 2
    # a threshold fitted on one half should transfer: LR_pof < 6.0
    assert got["lr_pof_micro"] < 6_000_000

    # --- Tukey HSD ---
    odata = {
        r.o_orderkey: (r.o_orderpriority, r.o_orderdate.date())
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_orderkey", "o_orderpriority", "o_orderdate")
        .collect()
    }
    g = defaultdict(lambda: [0, 0, 0])
    for r in (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_shipdate")
        .collect()
    ):
        pr, od = odata[r.l_orderkey]
        d = (r.l_shipdate.date() - od).days
        if d < 0:
            continue
        e = g[pr]
        e[0] += 1
        e[1] += d
        e[2] += d * d
    nn = sum(e[0] for e in g.values())
    k = len(g)
    ssw = sum(
        int(math.floor((e[2] - e[1] ** 2 / e[0]) * 1000 + 0.5)) / 1000
        for e in g.values()
    )
    prios = sorted(g)
    got = {
        (r["pr_a"], r["pr_b"]): r
        for r in tukey_hsd_delay_priorities(spark, SF_DIR).collect()
    }
    assert len(got) == k * (k - 1) // 2
    pa, pb = prios[0], prios[1]
    diff = g[pa][1] / g[pa][0] - g[pb][1] / g[pb][0]
    hw = (
        _HSD_Q_MICRO
        / 1e6
        * math.sqrt(
            ssw
            / (nn - k)
            * (1 / g[pa][0] + 1 / g[pb][0])
            / 2
        )
    )
    r = got[(pa, pb)]
    assert abs(r["diff_milli"] - _half_up_micro(diff) / 1000) <= 2
    assert abs(r["hsd_halfwidth_milli"] - _half_up_micro(hw) / 1000) <= 2
    assert r["significant"] == (
        1 if abs(r["diff_milli"]) > r["hsd_halfwidth_milli"] else 0
    )


def test_functional_dependency_audit_replay(spark):
    """Literal distinct-count replay of all four candidate FDs."""
    from ai_etl_studio_spark.operators.audit import (
        functional_dependency_audit,
    )

    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_partkey", "l_shipdate",
                "l_extendedprice", "l_quantity")
        .collect()
    )
    fd1 = defaultdict(set)
    fd2 = defaultdict(set)
    for r in li:
        fd1[r.l_orderkey].add(r.l_shipdate)
        q = int(math.floor(r.l_quantity + 0.5))
        if q >= 1:
            fd2[r.l_partkey].add(
                int(math.floor(r.l_extendedprice * 100 + 0.5)) * 100 // q
            )
    fd4 = defaultdict(set)
    for r in (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_custkey", "o_orderpriority")
        .collect()
    ):
        fd4[r.o_custkey].add(r.o_orderpriority)
    got = {
        r["fd"]: r
        for r in functional_dependency_audit(spark, SF_DIR).collect()
    }
    for name, m in (
        ("l_orderkey->l_shipdate", fd1),
        ("l_partkey->unit_price", fd2),
        ("o_custkey->o_orderpriority", fd4),
    ):
        r = got[name]
        assert r["n_lhs"] == len(m)
        assert r["violations"] == sum(len(v) - 1 for v in m.values())
        assert r["holds"] == (1 if r["violations"] == 0 else 0)
    # the brand FD is the one that must hold exactly
    assert got["p_partkey->p_brand"]["holds"] == 1
    # and the unit-price FD must be violated (the noisy-pricing fact)
    assert got["l_partkey->unit_price"]["violations"] > 0


def test_median_ci_replay(spark):
    """Order-statistic median CI replay plus a direct binomial
    coverage sanity check of the rank formula."""
    from ai_etl_studio_spark.operators.drift import (
        _MCI_Z_MICRO,
        median_ci_delay_by_priority,
    )

    odata = {
        r.o_orderkey: (r.o_orderpriority, r.o_orderdate.date())
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_orderkey", "o_orderpriority", "o_orderdate")
        .collect()
    }
    per = defaultdict(list)
    for r in (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_shipdate")
        .collect()
    ):
        pr, od = odata[r.l_orderkey]
        d = (r.l_shipdate.date() - od).days
        if d >= 0:
            per[pr].append(d)
    got = {
        r["priority"]: r
        for r in median_ci_delay_by_priority(spark, SF_DIR).collect()
    }
    z = _MCI_Z_MICRO / 1e6
    for pr, vals in per.items():
        vals.sort()
        n = len(vals)
        lo_rank = int(math.floor((n - z * math.sqrt(n)) / 2))
        hi_rank = n - lo_rank + 1
        cum = 0
        med = lo = hi = None
        last = None
        from collections import Counter as _C

        for v in sorted(set(vals)):
            cum += sum(1 for x in vals if x == v)
            if med is None and cum * 2 >= n:
                med = v
            if lo is None and cum >= lo_rank:
                lo = v
            if hi is None and cum >= hi_rank:
                hi = v
        r = got[pr]
        assert (r["n_lines"], r["median_days"]) == (n, med)
        assert (r["ci_lo_days"], r["ci_hi_days"]) == (lo, hi)
        assert r["ci_lo_days"] <= r["median_days"] <= r["ci_hi_days"]


def test_ansari_bradley_replay(spark):
    """Literal midrank Ansari-Bradley (positions sorted, ranks from
    both ends, tie-averaged) against the value-grain closed form, plus
    the finite-population z."""
    from ai_etl_studio_spark.operators.drift import (
        ansari_bradley_delay_scale,
    )

    odata = {
        r.o_orderkey: (r.o_orderpriority, r.o_orderdate.date())
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_orderkey", "o_orderpriority", "o_orderdate")
        .collect()
    }
    a, b = [], []
    for r in (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_shipdate")
        .collect()
    ):
        pr, od = odata[r.l_orderkey]
        d = (r.l_shipdate.date() - od).days
        if d < 0:
            continue
        if pr == "1-URGENT":
            a.append(d)
        elif pr == "5-LOW":
            b.append(d)
    pooled = sorted([(v, 0) for v in a] + [(v, 1) for v in b])
    n = len(pooled)
    ranks = [min(i, n + 1 - i) for i in range(1, n + 1)]
    vals = [v for v, _ in pooled]
    ab = 0.0
    scores = []
    i = 0
    while i < n:
        j = i
        while j < n and vals[j] == vals[i]:
            j += 1
        avg = sum(ranks[i:j]) / (j - i)
        # mirror the op: the group's AB contribution and squared-score
        # term are micro/milli-quantized per tie group
        ca = sum(1 for k in range(i, j) if pooled[k][1] == 0)
        rs = sum(ranks[i:j])
        ab += _half_up_micro(ca * rs / (j - i)) / 1_000_000
        scores.append((rs, j - i))
        i = j
    m = len(a)
    s1 = sum(rs for rs, _ in scores)
    s2 = sum(
        int(math.floor(rs * rs / c * 1000 + 0.5)) / 1000
        for rs, c in scores
    )
    mu = m * s1 / n
    var = m * (n - m) / (n - 1) * (s2 / n - (s1 / n) ** 2)
    z = (ab - mu) / math.sqrt(var)
    got = ansari_bradley_delay_scale(spark, SF_DIR).collect()[0]
    assert (got["n_urgent"], got["n_low"]) == (m, len(b))
    assert abs(got["ab_stat_micro"] - _half_up_micro(ab)) <= 3
    assert abs(got["ab_z_micro"] - _half_up_micro(z)) <= 3
    # same generating process for both priorities: |z| modest
    assert abs(got["ab_z_micro"]) < 5_000_000


def test_ab_runsum_closed_form_property():
    """Property test (no Spark): the piecewise-triangular closed form
    for the from-both-ends rank-run sum equals the literal midrank
    Ansari-Bradley over 200 random tie-heavy two-sample draws."""
    import random

    def run_sum(lo, hi, n):
        mid = (n + 1) // 2
        s = 0
        h1 = min(hi, mid)
        if lo <= h1:
            s += (lo + h1) * (h1 - lo + 1) // 2
        l2 = max(lo, mid + 1)
        if l2 <= hi:
            s += (n + 1) * (hi - l2 + 1) - (l2 + hi) * (hi - l2 + 1) // 2
        return s

    rng = random.Random(7)
    for _ in range(200):
        a = [rng.randint(0, 8) for _ in range(rng.randint(3, 30))]
        b = [rng.randint(0, 8) for _ in range(rng.randint(3, 30))]
        pooled = sorted([(v, 0) for v in a] + [(v, 1) for v in b])
        n = len(pooled)
        ranks = [min(i, n + 1 - i) for i in range(1, n + 1)]
        vals = [v for v, _ in pooled]
        lit = 0.0
        i = 0
        while i < n:
            j = i
            while j < n and vals[j] == vals[i]:
                j += 1
            avg = sum(ranks[i:j]) / (j - i)
            lit += avg * sum(1 for k in range(i, j) if pooled[k][1] == 0)
            i = j
        ca = Counter(a)
        call = Counter(a) + Counter(b)
        cum = 0
        got = 0.0
        for v in sorted(call):
            c = call[v]
            lo, hi = cum + 1, cum + c
            cum += c
            got += ca.get(v, 0) * run_sum(lo, hi, n) / c
        assert abs(got - lit) < 1e-9
