"""Behavior tests for the drift/statistical-audit operators — semantic
properties beyond oracle parity: PSI terms are non-negative and sum to
the reported total, KS and Mann-Whitney match exact pure-Python
replays, the one-pass correlation matrix matches numpy.corrcoef, the
seasonal anomaly top-k matches a brute-force replay, and entropies sit
in [0, ln(k)]."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

from ai_etl_studio_spark.operators import load_all

QUERIES, ORACLES = load_all()
SF_DIR = "/root/testdata/sf0.001"


def _two_sample_values(spark):
    rows = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    a = sorted(
        round(r.o_totalprice * 100) for r in rows if r.o_orderpriority == "1-URGENT"
    )
    b = sorted(
        round(r.o_totalprice * 100) for r in rows if r.o_orderpriority == "5-LOW"
    )
    return a, b


def test_psi_drift_terms_nonnegative_and_sum(spark):
    rows = QUERIES["psi_drift"](spark, SF_DIR).collect()
    assert rows
    contribs = [r.contrib_ticks for r in rows if r.contrib_ticks is not None]
    # every PSI term (p_a - p_e)·ln(p_a/p_e) has matching signs → ≥ 0
    # (ticks may round a tiny positive term down to 0)
    assert all(c >= 0 for c in contribs)
    assert {r.psi_ticks for r in rows} == {sum(contribs)}
    # replay one bin's contribution exactly
    n_e = sum(r.cnt_expected for r in rows)
    n_a = sum(r.cnt_actual for r in rows)
    r = next(r for r in rows if r.contrib_ticks is not None)
    pa, pe = r.cnt_actual / n_a, r.cnt_expected / n_e
    assert r.contrib_ticks == round((pa - pe) * math.log(pa / pe) * 1e9)


def test_ks_two_sample_exact_replay(spark):
    [r] = QUERIES["ks_two_sample"](spark, SF_DIR).collect()
    a, b = _two_sample_values(spark)
    assert (r.n1, r.n2) == (len(a), len(b))
    values = sorted(set(a) | set(b))
    ca = cb = 0
    ia = ib = 0
    d_num = 0
    for v in values:
        while ia < len(a) and a[ia] <= v:
            ia += 1
        while ib < len(b) and b[ib] <= v:
            ib += 1
        d_num = max(d_num, abs(ia * len(b) - ib * len(a)))
    assert r.d_num == d_num
    assert r.d_stat == pytest.approx(d_num / (len(a) * len(b)), rel=1e-12)


def test_mannwhitney_exact_replay(spark):
    [r] = QUERIES["mannwhitney_utest"](spark, SF_DIR).collect()
    a, b = _two_sample_values(spark)
    n1, n2 = len(a), len(b)
    assert (r.n1, r.n2) == (n1, n2)
    cnt = Counter(a + b)
    ca = Counter(a)
    cum = 0
    r1x2 = 0
    tie = 0
    for v in sorted(cnt):
        t = cnt[v]
        r1x2 += ca[v] * (2 * cum + t + 1)
        tie += t * t * t - t
        cum += t
    u1x2 = r1x2 - n1 * (n1 + 1)
    assert (r.u1_x2, r.tie_term) == (u1x2, tie)
    n = n1 + n2
    z = (u1x2 / 2 - n1 * n2 / 2) / math.sqrt(
        n1 * n2 / 12 * ((n + 1) - tie / (n * (n - 1)))
    )
    assert r.z_ticks == pytest.approx(round(z * 1e6), abs=1)


def test_correlation_matrix_matches_numpy(spark):
    import numpy as np

    rows = QUERIES["correlation_matrix"](spark, SF_DIR).collect()
    assert len(rows) == 6
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    cols = {
        "quantity": np.array([round(r.l_quantity * 100) for r in li], dtype=float),
        "price": np.array([round(r.l_extendedprice) for r in li], dtype=float),
        "discount": np.array([round(r.l_discount * 100) for r in li], dtype=float),
        "tax": np.array([round(r.l_tax * 100) for r in li], dtype=float),
    }
    for r in rows:
        assert r.n == len(li)
        want = np.corrcoef(cols[r.col_x], cols[r.col_y])[0, 1]
        assert r.corr_ticks / 1e9 == pytest.approx(want, abs=1e-6)
        assert -1_000_000_000 <= r.corr_ticks <= 1_000_000_000


def test_seasonal_anomaly_dow_replay(spark):
    rows = QUERIES["seasonal_anomaly_dow"](spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    daily = Counter()
    for e in ev:
        daily[e.ts.date().toordinal() - 719163] += 1  # days since epoch
    by_dow = defaultdict(list)
    for day in sorted(daily):
        by_dow[day % 7].append(day)
    want = {}
    for dow, days in by_dow.items():
        for i, day in enumerate(days):
            if i >= 2:
                base = daily[days[i - 1]] + daily[days[i - 2]]
                want[day] = (dow, daily[day], base, 2 * daily[day] - base)
    top = sorted(want.items(), key=lambda kv: (-abs(kv[1][3]), kv[0]))[:20]
    got = {
        (r.day.toordinal() - 719163): (r.dow, r.n_events, r.baseline2, r.dev_x2)
        for r in rows
    }
    assert got == dict(top)


def test_entropy_by_source_bounds_and_replay(spark):
    rows = QUERIES["entropy_by_source"](spark, SF_DIR).collect()
    assert rows
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    per = defaultdict(Counter)
    for d in docs:
        if d.lang is not None:
            per[d.source][d.lang] += 1
    for r in rows:
        langs = per[r.source]
        tot = sum(langs.values())
        assert (r.n_docs, r.n_langs) == (tot, len(langs))
        want = -sum(
            round((n / tot) * math.log(n / tot) * 1e9) for n in langs.values()
        )
        assert r.entropy_ticks == want
        assert 0 <= r.entropy_ticks <= math.log(max(len(langs), 2)) * 1e9 + 1


def test_hhi_concentration_replay(spark):
    rows = QUERIES["hhi_concentration"](spark, SF_DIR).collect()
    assert rows
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet").collect()
    nat = {c.c_custkey: c.c_nationkey for c in cust}
    name = {n.n_nationkey: n.n_name for n in nation}
    spend = defaultdict(int)
    for o in orders:
        spend[o.o_custkey] += round(o.o_totalprice * 100)
    per_nation = defaultdict(list)
    for ck, cents_ in spend.items():
        per_nation[name[nat[ck]]].append(cents_)
    want = {}
    for nm, vals in per_nation.items():
        tot = sum(vals)
        hhi = sum(round((v / tot) * (v / tot) * 1e9) for v in vals)
        want[nm] = (len(vals), tot, hhi)
    got = {r.n_name: (r.n_customers, r.total_cents, r.hhi_ticks) for r in rows}
    assert got == want
    # uniform lower bound: HHI ≥ 1/n
    for nm, (ncust, _tot, hhi) in got.items():
        assert hhi >= 1e9 / ncust - 1, nm


def test_mutual_information_nonnegative_and_entropy_bound(spark):
    [r] = QUERIES["mutual_information"](spark, SF_DIR).collect()
    # MI ≥ 0 (ticks may round individual terms, allow n_cells ulps)
    assert r.mi_ticks >= -r.n_cells
    # MI ≤ H(lang): 5 langs → ln(5)
    assert r.mi_ticks <= math.log(5) * 1e9 + r.n_cells
    assert r.n_docs > 0 and r.n_cells > 0


def test_autocorrelation_lags_replay(spark):
    rows = QUERIES["autocorrelation_lags"](spark, SF_DIR).collect()
    assert [r.lag_k for r in rows] == [1, 7, 14, 28]
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    daily = defaultdict(int)
    for o in orders:
        daily[o.o_orderdate.date()] += round(o.o_totalprice * 100)
    xs = [round(daily[d] / 100000) for d in sorted(daily)]
    n = len(xs)
    mu = sum(xs) / n
    den = sum((x - mu) ** 2 for x in xs)
    for r in rows:
        k = r.lag_k
        num = sum((xs[t] - mu) * (xs[t - k] - mu) for t in range(k, n))
        assert r.n_pairs == n - k
        assert r.acf_ticks == pytest.approx(round(num / den * 1e9), abs=2)
        assert -1_000_000_000 <= r.acf_ticks <= 1_000_000_000


def _doc_tokens(spark):
    import re

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    out = []
    for d in docs:
        if d.text is not None:
            out.append((d.doc_id, d.source, re.split(r"\s+", d.text.lower())))
    return out


def test_vocab_growth_curve_replay(spark):
    rows = QUERIES["vocab_growth_curve"](spark, SF_DIR).collect()
    docs = _doc_tokens(spark)
    m = max(i for i, _, _ in docs)
    seen = set()
    new = Counter()
    occ = Counter()
    for doc_id, _src, toks in sorted(docs):
        dec = doc_id * 10 // (m + 1)
        occ[dec] += len(toks)
        for t in toks:
            if t not in seen:
                seen.add(t)
                new[dec] += 1
    got = {r.decile: (r.n_tokens, r.n_new_types) for r in rows}
    assert got == {d: (occ[d], new[d]) for d in occ}
    # cumulative column is monotone and ends at |vocab|
    cums = [r.cum_vocab for r in sorted(rows, key=lambda r: r.decile)]
    assert cums == sorted(cums) and cums[-1] == len(seen)


def test_source_token_jaccard_replay(spark):
    rows = QUERIES["source_token_jaccard"](spark, SF_DIR).collect()
    docs = _doc_tokens(spark)
    vocab = defaultdict(set)
    for _id, src, toks in docs:
        vocab[src].update(toks)
    srcs = sorted(vocab)
    want = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            inter = len(vocab[a] & vocab[b])
            if inter:
                want[(a, b)] = (inter, len(vocab[a]), len(vocab[b]))
    got = {(r.src_a, r.src_b): (r.inter, r.size_a, r.size_b) for r in rows}
    assert got == want
    for r in rows:
        assert r.jaccard == pytest.approx(
            r.inter / (r.size_a + r.size_b - r.inter), rel=1e-12
        )
        assert 0.0 < r.jaccard <= 1.0


def test_power_law_alpha_replay(spark):
    [r] = QUERIES["power_law_alpha"](spark, SF_DIR).collect()
    tf = Counter()
    for _id, _src, toks in _doc_tokens(spark):
        tf.update(toks)
    tail = [c for c in tf.values() if c >= 5]
    assert (r.n_types_total, r.n_tail) == (len(tf), len(tail))
    ticks = sum(round(math.log(c / 5.0) * 1e9) for c in tail)
    assert r.sum_ln_ticks == ticks
    alpha = 1 + len(tail) / (ticks / 1e9)
    assert r.alpha_ticks == pytest.approx(round(alpha * 1e6), abs=1)
    assert r.alpha_ticks > 1_000_000  # alpha > 1 by construction


def test_quantile_drift_replay(spark):
    rows = QUERIES["quantile_drift"](spark, SF_DIR).collect()
    assert [r.decile for r in rows] == list(range(1, 10))
    a, b = _two_sample_values(spark)
    for r in rows:
        va = a[-(-r.decile * len(a) // 10) - 1]  # value at rank ceil(d·n/10)
        vb = b[-(-r.decile * len(b) // 10) - 1]
        assert (r.v_a, r.v_b, r.gap_cents) == (va, vb, va - vb)
    # deciles are monotone within each population
    for key in ("v_a", "v_b"):
        vals = [getattr(r, key) for r in rows]
        assert vals == sorted(vals)


def test_hourly_seasonality_profile_replay(spark):
    rows = QUERIES["hourly_seasonality_profile"](spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    cells = Counter((e.event_type, e.ts.hour) for e in ev)
    tot = Counter()
    for (t, _h), n in cells.items():
        tot[t] += n
    got = {(r.event_type, r.hr): (r.n, r.share_ticks) for r in rows}
    want = {
        (t, h): (n, round(n / tot[t] * 1e9)) for (t, h), n in cells.items()
    }
    assert got == want
    # shares per type sum to ~1e9 (rounding slack ≤ 24 ulps)
    per_type = Counter()
    for r in rows:
        per_type[r.event_type] += r.share_ticks
    for t, s in per_type.items():
        assert abs(s - 1_000_000_000) <= 24, t


def test_degree_distribution_replay(spark):
    rows = QUERIES["degree_distribution"](spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    deg = Counter(e.user_id for e in ev)
    buckets = defaultdict(list)
    for d in deg.values():
        buckets[d.bit_length() - 1].append(d)
    want = {
        b: (len(v), min(v), max(v)) for b, v in buckets.items()
    }
    got = {r.log2_bucket: (r.n_users, r.min_degree, r.max_degree) for r in rows}
    assert got == want
    for r in rows:  # bucket bounds honored
        assert 2**r.log2_bucket <= r.min_degree <= r.max_degree < 2 ** (
            r.log2_bucket + 1
        )


def test_langid_confusion_replay(spark):
    rows = QUERIES["langid_confusion"](spark, SF_DIR).collect()
    preds = QUERIES["text_langid"](spark, SF_DIR).collect()
    cells = Counter((p.labeled_lang, p.predicted_lang) for p in preds)
    tot = Counter()
    for (l, _p), n in cells.items():
        tot[l] += n
    got = {(r.labeled_lang, r.predicted_lang): (r.n, r.recall_ticks) for r in rows}
    want = {
        (l, p): (n, round(n / tot[l] * 1e9)) for (l, p), n in cells.items()
    }
    assert got == want


def test_lorenz_curve_replay(spark):
    rows = QUERIES["lorenz_curve"](spark, SF_DIR).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    spend = defaultdict(int)
    for row in o:
        spend[row.o_custkey] += round(row.o_totalprice * 100)
    ranked = sorted(spend.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(ranked)
    total = sum(v for _, v in ranked)
    dec = defaultdict(lambda: [0, 0])
    for i, (_ck, v) in enumerate(ranked):
        d = i * 10 // n + 1
        dec[d][0] += 1
        dec[d][1] += v
    got = {r.decile: (r.n_customers, r.cents) for r in rows}
    assert got == {d: tuple(v) for d, v in dec.items()}
    cum = 0
    for r in rows:
        cum += r.cents
        assert r.cum_share_ticks == round(cum / total * 1e9)
    assert rows[-1].cum_share_ticks == 1_000_000_000
    # Lorenz convexity: decile revenue is non-decreasing
    vals = [r.cents for r in rows]
    assert vals == sorted(vals)


def test_k_anonymity_audit_replay(spark):
    import math as _m

    [r] = QUERIES["k_anonymity_audit"](spark, SF_DIR).collect()
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    g = Counter(
        (c.c_nationkey, c.c_mktsegment, _m.floor(c.c_acctbal / 1000))
        for c in cust
    )
    below = [v for v in g.values() if v < 5]
    assert (r.n_groups, r.n_below_k, r.rows_at_risk, r.min_group_size) == (
        len(g),
        len(below),
        sum(below),
        min(g.values()),
    )


def test_dau_wau_stickiness_replay(spark):
    rows = QUERIES["dau_wau_stickiness"](spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    ud = {(e.user_id, e.ts.date()) for e in ev}
    days = sorted({d for _u, d in ud})
    assert [r.day for r in rows] == days
    import datetime

    for r in rows:
        dau = {u for u, d in ud if d == r.day}
        wau = {
            u
            for u, d in ud
            if r.day - datetime.timedelta(days=6) <= d <= r.day
        }
        assert (r.dau, r.wau) == (len(dau), len(wau))
        assert r.stickiness_ticks == round(len(dau) / len(wau) * 1e9)
        assert r.dau <= r.wau


def test_embedding_norm_audit_replay(spark):
    rows = QUERIES["embedding_norm_audit"](spark, SF_DIR).collect()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    bands = defaultdict(list)
    for e in emb:
        n2 = sum(round(float(x) * 1e6) ** 2 for x in e.embedding)
        bands[n2 // 100_000_000_000].append((n2, len(e.embedding)))
    got = {
        r.band: (r.n_vecs, r.min_norm2, r.max_norm2, r.min_dims, r.max_dims)
        for r in rows
    }
    want = {
        b: (
            len(v),
            min(n for n, _ in v),
            max(n for n, _ in v),
            min(d for _, d in v),
            max(d for _, d in v),
        )
        for b, v in bands.items()
    }
    assert got == want


def test_interevent_gap_histogram_replay(spark):
    rows = QUERIES["interevent_gap_histogram"](spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    per_user = defaultdict(list)
    for e in ev:
        per_user[e.user_id].append((e.ts, e.event_id))
    gaps = []
    for seq in per_user.values():
        seq.sort()
        for (a, _), (b, _) in zip(seq, seq[1:]):
            us = round((b - a).total_seconds() * 1e6)
            gaps.append(us)
    buckets = defaultdict(list)
    for g in gaps:
        buckets[max(g.bit_length() - 1, 0)].append(g)
    got = {r.log2_bucket: (r.n_gaps, r.min_gap_us, r.max_gap_us) for r in rows}
    want = {b: (len(v), min(v), max(v)) for b, v in buckets.items()}
    assert got == want


def test_growth_accounting_daily_invariants_and_replay(spark):
    rows = QUERIES["growth_accounting_daily"](spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    ud = {(e.user_id, e.ts.date()) for e in ev}
    days = sorted({d for _u, d in ud})
    active = {d: {u for u, dd in ud if dd == d} for d in days}
    first = {}
    for u, d in sorted(ud, key=lambda x: x[1]):
        first.setdefault(u, d)
    import datetime

    prev_active_day = {}
    want = {}
    for d in days:
        new = ret = res = 0
        for u in active[d]:
            if first[u] == d:
                new += 1
            elif prev_active_day[u] == d - datetime.timedelta(days=1):
                ret += 1
            else:
                res += 1
        want[d] = (len(active[d]), new, ret, res)
        for u in active[d]:
            prev_active_day[u] = d
    got = {r.day: (r.dau, r.n_new, r.n_retained, r.n_resurrected) for r in rows}
    assert got == want
    for r in rows:
        assert r.dau == r.n_new + r.n_retained + r.n_resurrected
    # churn: yesterday's actives minus today's retained
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_churned == prev.dau - cur.n_retained
    assert rows[0].n_churned is None


def test_reorder_interval_stats_replay(spark):
    rows = QUERIES["reorder_interval_stats"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    seg = {c.c_custkey: c.c_mktsegment for c in cust}
    per_cust = defaultdict(list)
    for o in orders:
        per_cust[o.o_custkey].append((o.o_orderdate.date(), o.o_orderkey))
    agg = defaultdict(lambda: [0, 0, None, None])
    for ck, seq in per_cust.items():
        seq.sort()
        s = agg[seg[ck]]
        for (a, _), (b, _) in zip(seq, seq[1:]):
            gap = (b - a).days
            s[0] += 1
            s[1] += gap
            s[2] = gap if s[2] is None else min(s[2], gap)
            s[3] = gap if s[3] is None else max(s[3], gap)
    got = {
        r.c_mktsegment: (r.n_gaps, r.sum_gap_days, r.min_gap, r.max_gap)
        for r in rows
    }
    assert got == {k: tuple(v) for k, v in agg.items()}
    for r in rows:
        assert r.avg_gap_microdays == round(r.sum_gap_days / r.n_gaps * 1e6)


def test_dup_rate_by_source_replay(spark):
    import re

    rows = QUERIES["dup_rate_by_source"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    fps = []
    for d in docs:
        if d.text is not None:
            norm = " ".join(re.split(r"\s+", d.text.lower().strip()))
            fps.append((d.source, norm))
    cnt = Counter(f for _s, f in fps)
    per_src = defaultdict(lambda: [0, 0])
    for s, f in fps:
        per_src[s][0] += 1
        if cnt[f] > 1:
            per_src[s][1] += 1
    got = {r.source: (r.n_docs, r.n_dup_docs) for r in rows}
    assert got == {s: tuple(v) for s, v in per_src.items()}
    for r in rows:
        assert r.dup_share_ticks == round(r.n_dup_docs / r.n_docs * 1e9)


def test_supplier_share_shift_replay(spark):
    rows = QUERIES["supplier_share_shift"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    sup = spark.read.parquet(f"{SF_DIR}/supplier.parquet").collect()
    nat = spark.read.parquet(f"{SF_DIR}/nation.parquet").collect()
    s2n = {s.s_suppkey: s.s_nationkey for s in sup}
    nname = {n.n_nationkey: n.n_name for n in nat}
    rev = defaultdict(int)
    for l in li:
        # HALF_UP like the engines (Python round() is banker's)
        cents_ = math.floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
        rev[(nname[s2n[l.l_suppkey]], l.l_shipdate.year)] += cents_
    year_tot = defaultdict(int)
    for (nm, yr), c in rev.items():
        year_tot[yr] += c
    got = {(r.n_name, r.yr): (r.revenue_cents, r.share_ticks) for r in rows}
    want = {
        (nm, yr): (c, round(c / year_tot[yr] * 1e9))
        for (nm, yr), c in rev.items()
    }
    assert got == want
    # deltas consistent with shares
    by_nation = defaultdict(dict)
    for r in rows:
        by_nation[r.n_name][r.yr] = r
    for nm, yrs in by_nation.items():
        ordered = sorted(yrs)
        assert yrs[ordered[0]].delta_ticks is None
        for a, b in zip(ordered, ordered[1:]):
            assert yrs[b].delta_ticks == yrs[b].share_ticks - yrs[a].share_ticks


def test_shipping_delay_monthly_replay(spark):
    rows = QUERIES["shipping_delay_monthly"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    odate = {o.o_orderkey: o.o_orderdate for o in orders}
    agg = defaultdict(lambda: [0, 0, None, None])
    for l in li:
        od = odate[l.l_orderkey]
        month = od.date().replace(day=1)
        delay = (l.l_shipdate.date() - od.date()).days
        s = agg[month]
        s[0] += 1
        s[1] += delay
        s[2] = delay if s[2] is None else min(s[2], delay)
        s[3] = delay if s[3] is None else max(s[3], delay)
    got = {
        r.month: (r.n_lines, r.sum_delay_days, r.min_delay, r.max_delay)
        for r in rows
    }
    assert got == {m: tuple(v) for m, v in agg.items()}
    for r in rows:
        assert r.avg_delay_microdays == round(r.sum_delay_days / r.n_lines * 1e6)
        assert r.min_delay <= r.max_delay  # synthetic data ships early too


def test_partition_skew_advisor_replay(spark):
    rows = QUERIES["partition_skew_advisor"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    month = Counter(o.o_orderdate.date().replace(day=1) for o in orders)
    prio = Counter(o.o_orderpriority for o in orders)
    got = {
        r.candidate: (r.n_partitions, r.total_rows, r.max_rows)
        for r in rows
    }
    assert got == {
        "month(o_orderdate)": (len(month), sum(month.values()), max(month.values())),
        "o_orderpriority": (len(prio), sum(prio.values()), max(prio.values())),
    }
    for r in rows:
        mean = r.total_rows / r.n_partitions
        assert r.skew_ratio_micro == round(r.max_rows / mean * 1e6)
        assert r.skew_ratio_micro >= 1_000_000


def test_watermark_lateness_advisor_replay(spark):
    rows = QUERIES["watermark_lateness_advisor"](spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    seq = sorted(
        (e.event_id, round(e.ts.timestamp() * 1e6)) for e in ev
    )
    buckets = defaultdict(lambda: [0, 0])
    run = None
    for _eid, ts in seq:
        if run is None or run <= ts:
            b, late = -1, 0
        else:
            late = run - ts
            b = late.bit_length() - 1
        buckets[b][0] += 1
        buckets[b][1] = max(buckets[b][1], late)
        run = ts if run is None else max(run, ts)
    got = {r.log2_bucket: (r.n_events, r.max_late_us) for r in rows}
    assert got == {b: tuple(v) for b, v in buckets.items()}
    # sanity: some events are out of order in this data, most are not
    assert got[-1][0] > sum(v[0] for b, v in buckets.items() if b != -1)


def test_open_order_aging_replay(spark):
    import datetime

    rows = QUERIES["open_order_aging"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    anchor = datetime.date(2001, 9, 1)
    agg = defaultdict(lambda: [0, 0, 0])
    for o in orders:
        if o.o_orderstatus != "O":
            continue
        age = (anchor - o.o_orderdate.date()).days
        band = (
            "0-365" if age <= 365
            else "366-730" if age <= 730
            else "731-1460" if age <= 1460
            else "1460+"
        )
        s = agg[band]
        s[0] += 1
        s[1] += math.floor(o.o_totalprice * 100 + 0.5)
        s[2] = max(s[2], age)
    got = {r.age_band: (r.n_orders, r.total_cents, r.oldest_days) for r in rows}
    assert got == {b: tuple(v) for b, v in agg.items()}
    assert all(r.oldest_days > 0 for r in rows)


def test_spend_tier_migration_replay(spark):
    rows = QUERIES["spend_tier_migration"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    spend = defaultdict(lambda: [0, 0, 0, 0])  # c99, n99, c00, n00
    for o in orders:
        y = o.o_orderdate.year
        if y not in (1999, 2000):
            continue
        s = spend[o.o_custkey]
        c = math.floor(o.o_totalprice * 100 + 0.5)
        if y == 1999:
            s[0] += c
            s[1] += 1
        else:
            s[2] += c
            s[3] += 1

    def tier(c, n):
        if n == 0:
            return "none"
        if c < 10_000_000:
            return "low"
        if c < 50_000_000:
            return "mid"
        return "high"

    mat = Counter(
        (tier(c99, n99), tier(c00, n00)) for c99, n99, c00, n00 in spend.values()
    )
    got = {(r.tier_from, r.tier_to): r.n_customers for r in rows}
    assert got == dict(mat)
    assert sum(got.values()) == len(spend)


def test_discount_by_quantity_band_replay(spark):
    rows = QUERIES["discount_by_quantity_band"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for l in li:
        band = math.floor((l.l_quantity - 1) / 10)
        s = agg[band]
        s[0] += 1
        s[1] += math.floor(l.l_discount * 100 + 0.5)
        s[2] += math.floor(l.l_extendedprice * 100 + 0.5)
        s[3] += math.floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
    got = {
        r.qty_band: (r.n_lines, r.sum_disc_pct, r.gross_cents, r.net_cents)
        for r in rows
    }
    assert got == {b: tuple(v) for b, v in agg.items()}
    for r in rows:
        assert r.net_cents <= r.gross_cents
        assert r.avg_disc_micro_pct == round(r.sum_disc_pct / r.n_lines * 1e6)


def test_char_class_profile_replay(spark):
    import re

    rows = QUERIES["char_class_profile"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    agg = defaultdict(lambda: [0, 0, 0, 0, 0])
    for d in docs:
        if d.text is None:
            continue
        s = agg[d.source]
        s[0] += 1
        s[1] += len(d.text)
        s[2] += len(re.sub(r"[^a-zA-Z]", "", d.text))
        s[3] += len(re.sub(r"[^0-9]", "", d.text))
        s[4] += len(re.sub(r"[^ ]", "", d.text))
    got = {
        r.source: (r.n_docs, r.n_chars, r.alpha_chars, r.digit_chars, r.space_chars)
        for r in rows
    }
    assert got == {s: tuple(v) for s, v in agg.items()}
    for r in rows:
        assert r.alpha_share_ticks == round(r.alpha_chars / r.n_chars * 1e9)
        assert r.alpha_chars + r.digit_chars + r.space_chars <= r.n_chars


def test_event_type_affinity_replay(spark):
    rows = QUERIES["event_type_affinity"](spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    ut = {(e.user_id, e.event_type) for e in ev}
    types = defaultdict(set)
    for u, t in ut:
        types[t].add(u)
    n_users = len({u for u, _t in ut})
    names = sorted(types)
    want = {}
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            co = len(types[a] & types[b])
            if co:
                want[(a, b)] = (co, len(types[a]), len(types[b]))
    got = {(r.type_a, r.type_b): (r.co_users, r.n_a, r.n_b) for r in rows}
    assert got == want
    for r in rows:
        assert r.lift_micro == round(
            r.co_users * n_users / (r.n_a * r.n_b) * 1e6
        )


def test_event_value_deciles_by_type_replay(spark):
    rows = QUERIES["event_value_deciles_by_type"](spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    per_type = defaultdict(list)
    for e in ev:
        if e.value is not None:
            per_type[e.event_type].append(math.floor(e.value * 100 + 0.5))
    want = {}
    for t, vals in per_type.items():
        vals.sort()
        n = len(vals)
        for d in range(1, 10):
            want[(t, d)] = vals[-(-d * n // 10) - 1]
    got = {(r.event_type, r.decile): r.v_cents for r in rows}
    assert got == want
    # monotone deciles per type
    for t in per_type:
        seq = [got[(t, d)] for d in range(1, 10)]
        assert seq == sorted(seq)


def test_revenue_bridge_monthly_replay(spark):
    rows = QUERIES["revenue_bridge_monthly"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    m = defaultdict(lambda: [0, 0])
    for o in orders:
        s = m[o.o_orderdate.date().replace(day=1)]
        s[0] += 1
        s[1] += math.floor(o.o_totalprice * 100 + 0.5)
    months = sorted(m)
    got = {r.month: r for r in rows}
    assert sorted(got) == months[1:]  # first month has no prior
    for prev, cur in zip(months, months[1:]):
        (np_, rp), (n, rev) = m[prev], m[cur]
        r = got[cur]
        assert (r.n_orders, r.revenue_cents, r.delta_cents) == (n, rev, rev - rp)

        def half_away(x):  # engine round(): half away from zero
            return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

        assert r.volume_effect_cents == half_away((n - np_) * (rp / np_))
        assert r.price_effect_cents == half_away(n * (rev / n - rp / np_))
        # the decomposition closes up to sub-cent rounding
        assert abs(r.delta_cents - r.volume_effect_cents - r.price_effect_cents) <= 1


def test_priority_sla_rate_replay(spark):
    rows = QUERIES["priority_sla_rate"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    first_ship = {}
    for l in li:
        d = l.l_shipdate.date()
        k = l.l_orderkey
        first_ship[k] = d if k not in first_ship else min(first_ship[k], d)
    agg = defaultdict(lambda: [0, 0])
    for o in orders:
        if o.o_orderkey not in first_ship:
            continue
        delay = (first_ship[o.o_orderkey] - o.o_orderdate.date()).days
        s = agg[o.o_orderpriority]
        s[0] += 1
        s[1] += delay <= 30
    got = {r.o_orderpriority: (r.n_orders, r.n_within_sla) for r in rows}
    assert got == {p: tuple(v) for p, v in agg.items()}
    for r in rows:
        assert r.sla_rate_ticks == round(r.n_within_sla / r.n_orders * 1e9)


def test_session_funnel_replay(spark):
    [r] = QUERIES["session_funnel"](spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    per_user = defaultdict(list)
    for e in ev:
        per_user[e.user_id].append((e.ts, e.event_id, e.event_type))
    n_sessions = n_v = n_c = n_p = 0
    for seq in per_user.values():
        seq.sort()
        sessions = []
        prev = None
        for ts, _eid, et in seq:
            if prev is None or (ts - prev).total_seconds() > 1800:
                sessions.append([])
            sessions[-1].append((ts, et))
            prev = ts
        for sess in sessions:
            n_sessions += 1
            v_ts = min((t for t, et in sess if et == "view"), default=None)
            c_ts = (
                min((t for t, et in sess if et == "click" and t >= v_ts), default=None)
                if v_ts
                else None
            )
            p_ts = (
                min(
                    (t for t, et in sess if et == "purchase" and t >= c_ts),
                    default=None,
                )
                if c_ts
                else None
            )
            n_v += v_ts is not None
            n_c += c_ts is not None
            n_p += p_ts is not None
    assert (r.n_sessions, r.n_view, r.n_view_click, r.n_full_funnel) == (
        n_sessions,
        n_v,
        n_c,
        n_p,
    )
    assert r.n_view >= r.n_view_click >= r.n_full_funnel
    assert r.view_to_purchase_ticks == round(n_p / n_v * 1e9)


def test_containment_catches_what_jaccard_misses(spark):
    # every verified-Jaccard pair is also containment-strong, and the
    # containment detector is a superset on candidates (asymmetric
    # inclusion scores ≥ symmetric Jaccard)
    jac = {
        (r.doc_id_1, r.doc_id_2)
        for r in QUERIES["dedup_lsh_verified_pairs"](spark, SF_DIR).collect()
    }
    cont_rows = QUERIES["dedup_containment_pairs"](spark, SF_DIR).collect()
    cont = {(r.doc_id_1, r.doc_id_2) for r in cont_rows}
    assert jac <= cont
    for r in cont_rows:
        assert r.containment_1_in_2 == pytest.approx(r.n_inter / r.n_1)
        assert r.containment_2_in_1 == pytest.approx(r.n_inter / r.n_2)
        assert max(r.containment_1_in_2, r.containment_2_in_1) >= 0.8


def test_priority_mix_shift_replay(spark):
    rows = QUERIES["priority_mix_shift_monthly"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    cells = Counter(
        (o.o_orderdate.date().replace(day=1), o.o_orderpriority) for o in orders
    )
    months = sorted({m for m, _p in cells})
    mtot = Counter()
    for (m, _p), n in cells.items():
        mtot[m] += n
    shares = defaultdict(dict)
    for (m, p), n in cells.items():
        shares[p][m] = round(n / mtot[m] * 1e9)
    want = {}
    for p, by_m in shares.items():
        ms = sorted(by_m)
        deltas = [abs(by_m[b] - by_m[a]) for a, b in zip(ms, ms[1:])]
        want[p] = (max(deltas), min(by_m.values()), max(by_m.values()))
    got = {
        r.o_orderpriority: (
            r.max_abs_swing_ticks,
            r.min_share_ticks,
            r.max_share_ticks,
        )
        for r in rows
    }
    assert got == want


def test_weighted_median_price_replay(spark):
    rows = QUERIES["weighted_median_price"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    per_flag = defaultdict(list)
    for l in li:
        per_flag[l.l_returnflag].append(
            (
                math.floor(l.l_extendedprice * 100 + 0.5),
                math.floor(l.l_quantity * 100 + 0.5),
            )
        )
    for r in rows:
        pairs = sorted(per_flag[r.l_returnflag])
        total = sum(w for _v, w in pairs)
        assert r.total_w == total
        cum = 0
        for v, w in pairs:
            cum += w
            if cum * 2 >= total:
                assert r.median_cents == v
                break
        # the weighted median is bracketed by the plain min/max
        assert pairs[0][0] <= r.median_cents <= pairs[-1][0]


def test_tokenizer_fertility_replay(spark):
    import re

    rows = QUERIES["tokenizer_fertility"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    pat = re.compile(
        r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|\s+"
    )
    agg = defaultdict(lambda: [0, 0, 0])
    for d in docs:
        if d.text is None or d.lang is None:
            continue
        s = agg[d.lang]
        s[0] += 1
        s[1] += len(re.split(r"\s+", d.text.lower()))
        s[2] += len(pat.findall(d.text))
    got = {r.lang: (r.n_docs, r.ws_tokens, r.bpe_tokens) for r in rows}
    assert got == {l: tuple(v) for l, v in agg.items()}
    for r in rows:
        assert r.fertility_micro == round(r.bpe_tokens / r.ws_tokens * 1e6)
        assert r.fertility_micro > 0


def test_context_window_fit_replay(spark):
    import re

    [r] = QUERIES["context_window_fit"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    pat = re.compile(
        r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|\s+"
    )
    counts = [len(pat.findall(d.text)) for d in docs if d.text is not None]
    assert (r.n_docs, r.total_tokens) == (len(counts), sum(counts))
    prev_docs = -1
    for w in (128, 512, 2048, 8192):
        docs_fit = sum(c <= w for c in counts)
        toks_fit = sum(c for c in counts if c <= w)
        assert getattr(r, f"docs_fit_{w}") == docs_fit
        assert getattr(r, f"tokens_fit_{w}") == toks_fit
        assert docs_fit >= prev_docs  # monotone in window size
        prev_docs = docs_fit


def test_pii_rate_by_source_replay(spark):
    import re

    rows = QUERIES["pii_rate_by_source"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    email = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    phone = re.compile(r"\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}")
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for d in docs:
        if d.text is None:
            continue
        s = agg[d.source]
        ne, np_ = len(email.findall(d.text)), len(phone.findall(d.text))
        s[0] += 1
        s[1] += ne
        s[2] += np_
        s[3] += (ne + np_) > 0
    got = {
        r.source: (r.n_docs, r.email_hits, r.phone_hits, r.docs_with_pii)
        for r in rows
    }
    assert got == {s: tuple(v) for s, v in agg.items()}


def test_dataset_card_summary_replay(spark):
    import re

    [r] = QUERIES["dataset_card_summary"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    with_text = [d for d in docs if d.text is not None]
    fps = {
        " ".join(re.split(r"\s+", d.text.lower().strip())) for d in with_text
    }
    assert r.n_docs == len(docs)
    assert r.n_with_text == len(with_text)
    assert r.n_langs == len({d.lang for d in docs if d.lang is not None})
    assert r.n_sources == len({d.source for d in docs if d.source is not None})
    assert r.total_chars == sum(len(d.text) for d in with_text)
    assert r.exact_dup_docs == len(with_text) - len(fps)
    en = sum(d.lang == "en" for d in docs)
    assert r.en_docs == en
    assert r.en_share_ticks == round(en / len(docs) * 1e9)


def test_split_leakage_audit_replay(spark):
    import hashlib
    import re

    [r] = QUERIES["split_leakage_audit"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    groups = defaultdict(lambda: [0, 0, 0])  # in_train, in_eval, copies
    for d in docs:
        if d.text is None:
            continue
        fp = " ".join(re.split(r"\s+", d.text.lower().strip()))
        b = int(hashlib.md5(f"split:{d.doc_id}".encode()).hexdigest()[:8], 16) % 100
        g = groups[fp]
        if b < 80:
            g[0] = 1
        else:
            g[1] = 1
        g[2] += 1
    leaked = [g for g in groups.values() if g[0] and g[1]]
    assert r.n_fingerprints == len(groups)
    assert r.leaked_fingerprints == len(leaked)
    assert r.leaked_docs == sum(g[2] for g in leaked)
    assert r.dup_fingerprints == sum(1 for g in groups.values() if g[2] > 1)
    # a leak requires a duplicate: leaked ⊆ dup
    assert r.leaked_fingerprints <= r.dup_fingerprints


def test_class_balance_weights_replay(spark):
    rows = QUERIES["class_balance_weights"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    cnt = Counter(d.lang for d in docs if d.lang is not None)
    total, k = sum(cnt.values()), len(cnt)
    got = {r.lang: (r.n, r.total, r.weight_micro) for r in rows}
    assert got == {
        l: (n, total, round(total / (k * n) * 1e6)) for l, n in cnt.items()
    }
    # weight·n_c ≈ constant N/k
    for r in rows:
        assert r.weight_micro * r.n == pytest.approx(total / k * 1e6, rel=1e-3)


def test_embedding_centroid_drift_replay(spark):
    import numpy as np

    rows = QUERIES["embedding_centroid_drift"](spark, SF_DIR).collect()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    by = defaultdict(lambda: ([], []))
    for e in emb:
        micro = [round(float(x) * 1e6) for x in e.embedding]
        by[e.label][e.vec_id % 2].append(micro)
    for r in rows:
        a, b = by[r.label]
        assert (r.n_a, r.n_b) == (len(a), len(b))
        ca = np.array(a, dtype=float).sum(axis=0)
        cb = np.array(b, dtype=float).sum(axis=0)
        diffs = ca / len(a) - cb / len(b)
        terms = [round(d * d) for d in diffs]
        assert r.dist2_micro2 == pytest.approx(sum(terms), abs=len(terms))
        assert r.l2_shift_micro == pytest.approx(
            round(math.sqrt(sum(terms))), abs=1
        )


def test_lsh_tuning_curve_properties(spark):
    rows = QUERIES["lsh_tuning_curve"](spark, SF_DIR).collect()
    assert len(rows) == 4 * 8
    by_layout = defaultdict(list)
    for r in rows:
        # replay the S-curve formula
        s = r.sim_pct / 100
        p = 1 - (1 - s**r.rows_per_band) ** r.bands
        assert r.p_candidate_micro == round(p * 1e6)
        by_layout[(r.bands, r.rows_per_band)].append((r.sim_pct, r.p_candidate_micro))
    for layout, pts in by_layout.items():
        probs = [p for _s, p in sorted(pts)]
        assert probs == sorted(probs), layout  # monotone in similarity
        assert probs[-1] > 990_000  # near-certain at s=0.95


def test_session_timeout_sensitivity_replay(spark):
    rows = QUERIES["session_timeout_sensitivity"](spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    per_user = defaultdict(list)
    for e in ev:
        per_user[e.user_id].append((e.ts, e.event_id))
    want = {}
    for m in (5, 15, 30, 60):
        n = 0
        for seq in per_user.values():
            seq.sort()
            prev = None
            for ts, _eid in seq:
                if prev is None or (ts - prev).total_seconds() * 1e6 > m * 60e6:
                    n += 1
                prev = ts
        want[m] = n
    got = {r.gap_minutes: r.n_sessions for r in rows}
    assert got == want
    # session count is non-increasing in the timeout
    seq = [got[m] for m in (5, 15, 30, 60)]
    assert seq == sorted(seq, reverse=True)


def test_ab_srm_check_replay(spark):
    [r] = QUERIES["ab_srm_check"](spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    users = {e.user_id for e in ev}
    n_a = sum(1 for u in users if u % 2 == 0)
    n_b = len(users) - n_a
    assert (r.n_a, r.n_b) == (n_a, n_b)
    chi2 = (n_a - n_b) ** 2 / (n_a + n_b)
    assert r.chi2_micro == round(chi2 * 1e6)
    assert r.srm_flag == (1 if chi2 > 3.841 else 0)


def test_order_fill_rate_replay(spark):
    rows = QUERIES["order_fill_rate"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    per_order = defaultdict(lambda: [0, 0])
    for l in li:
        s = per_order[l.l_orderkey]
        s[0] += 1
        s[1] += l.l_linestatus == "F"
    agg = defaultdict(lambda: [0, 0])
    for o in orders:
        if o.o_orderkey not in per_order:
            continue
        n_lines, n_final = per_order[o.o_orderkey]
        s = agg[o.o_orderdate.date().replace(day=1)]
        s[0] += 1
        s[1] += n_final == n_lines
    got = {r.month: (r.n_orders, r.n_fully_final) for r in rows}
    assert got == {m: tuple(v) for m, v in agg.items()}
    for r in rows:
        assert r.fill_rate_ticks == round(r.n_fully_final / r.n_orders * 1e9)


def test_perplexity_by_source_replay(spark):
    import re

    rows = QUERIES["perplexity_by_source"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    toks = []
    for d in docs:
        if d.text is not None:
            toks += [(d.source, t) for t in re.split(r"\s+", d.text.lower())]
    vocab = Counter(t for _s, t in toks)
    total = sum(vocab.values())
    ticks = {t: round(math.log(total / c) * 1e9) for t, c in vocab.items()}
    agg = defaultdict(lambda: [0, 0])
    for s, t in toks:
        agg[s][0] += 1
        agg[s][1] += ticks[t]
    got = {r.source: (r.n_tokens, r.sum_surprisal_ticks) for r in rows}
    assert got == {s: tuple(v) for s, v in agg.items()}
    for r in rows:
        # HALF_UP like the engines (Python round() is banker's)
        assert r.avg_surprisal_ticks == math.floor(
            r.sum_surprisal_ticks / r.n_tokens + 0.5
        )
        assert r.avg_surprisal_ticks > 0


def test_kl_divergence_by_source_replay(spark):
    rows = QUERIES["kl_divergence_by_source"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    cells = Counter((d.source, d.n_chars // 50) for d in docs)
    src_tot = Counter()
    bin_tot = Counter()
    for (s, b), n in cells.items():
        src_tot[s] += n
        bin_tot[b] += n
    corpus = sum(src_tot.values())
    want = {}
    for s in src_tot:
        kl = 0
        for (s2, b), n in cells.items():
            if s2 != s:
                continue
            p = n / src_tot[s]
            q = bin_tot[b] / corpus
            kl += round(p * math.log(p / q) * 1e9)
        want[s] = (src_tot[s], kl)
    got = {r.source: (r.n_docs, r.kl_ticks) for r in rows}
    assert got == want
    # KL ≥ 0 up to per-term rounding
    for r in rows:
        assert r.kl_ticks >= -50


def test_dup_cluster_histogram_replay(spark):
    import re

    rows = QUERIES["dup_cluster_histogram"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    fps = Counter(
        " ".join(re.split(r"\s+", d.text.lower().strip()))
        for d in docs
        if d.text is not None
    )
    buckets = defaultdict(lambda: [0, 0])
    for n in fps.values():
        b = n.bit_length() - 1
        buckets[b][0] += 1
        buckets[b][1] += n
    got = {r.log2_bucket: (r.n_clusters, r.n_docs) for r in rows}
    assert got == {b: tuple(v) for b, v in buckets.items()}
    # doc total across buckets = corpus with text
    assert sum(v[1] for v in got.values()) == sum(fps.values())


def test_near_dup_rate_consistency(spark):
    rows = QUERIES["near_dup_rate_by_source"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    pairs = QUERIES["dedup_lsh_verified_pairs"](spark, SF_DIR).collect()
    dup_ids = {r.doc_id_1 for r in pairs} | {r.doc_id_2 for r in pairs}
    src = defaultdict(lambda: [0, 0])
    for d in docs:
        src[d.source][0] += 1
        src[d.source][1] += d.doc_id in dup_ids
    got = {r.source: (r.n_docs, r.near_dup_docs) for r in rows}
    assert got == {s: tuple(v) for s, v in src.items()}
    for r in rows:
        assert r.near_dup_ticks == round(r.near_dup_docs / r.n_docs * 1e9)


def test_lexical_diversity_replay(spark):
    import re

    rows = QUERIES["lexical_diversity_by_source"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    agg = defaultdict(Counter)
    for d in docs:
        if d.text is None:
            continue
        for tok in re.split(r"\s+", d.text.lower()):
            if tok:
                agg[d.source][tok] += 1
    got = {r.source: (r.n_tokens, r.vocab_size, r.hapax_count) for r in rows}
    want = {
        s: (
            sum(c.values()),
            len(c),
            sum(1 for n in c.values() if n == 1),
        )
        for s, c in agg.items()
    }
    assert got == want
    for r in rows:
        assert r.hapax_count <= r.vocab_size <= r.n_tokens
        assert r.ttr_micro == round(r.vocab_size / r.n_tokens * 1e6)
        assert r.hapax_share_micro == round(r.hapax_count / r.vocab_size * 1e6)


def test_bigram_cond_entropy_replay(spark):
    import re

    rows = QUERIES["bigram_cond_entropy_by_lang"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    bc = defaultdict(Counter)
    for d in docs:
        if d.text is None or d.lang is None:
            continue
        toks = re.split(r"\s+", d.text.lower())
        if len(toks) < 2:
            continue
        for i in range(len(toks) - 1):
            bc[d.lang][(toks[i], toks[i + 1])] += 1
    got = {r.lang: (r.n_bigrams, r.cond_entropy_ticks) for r in rows}
    for lang, c in bc.items():
        tot = sum(c.values())
        n1 = Counter()
        for (w1, _), n in c.items():
            n1[w1] += n
        ticks = -sum(
            round((n / tot) * math.log(n / n1[w1]) * 1e9)
            for (w1, _), n in c.items()
        )
        assert got[lang] == (tot, ticks), lang
        # conditional entropy is non-negative and at most ln(contexts)
        assert 0 <= ticks <= math.log(len(c) + 1) * 1e9
    assert set(got) == set(bc)


def test_doc_length_deciles_replay(spark):
    rows = QUERIES["doc_length_deciles_by_source"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    by_src = defaultdict(list)
    for d in docs:
        if d.n_chars is not None:
            by_src[d.source].append(d.n_chars)
    got = defaultdict(dict)
    for r in rows:
        got[r.source][r.decile] = r.chars_at
    for s, vals in by_src.items():
        vals.sort()
        n = len(vals)
        for dec in range(1, 10):
            thr = -(-dec * n // 10)  # ceil(d·n/10), 1-indexed rank
            assert got[s][dec] == vals[thr - 1], (s, dec)
        # deciles are monotone non-decreasing
        seq = [got[s][dec] for dec in range(1, 10)]
        assert seq == sorted(seq)
    assert set(got) == set(by_src)


def test_mixed_lang_purity_replay(spark):
    import re

    MARKERS = {
        "en": ("the", "and", "of", "is"),
        "de": ("der", "und", "die", "ist"),
        "fr": ("le", "et", "les", "est"),
        "es": ("el", "y", "los", "es"),
        "zh": ("de5", "shi4", "le5", "he2"),
    }
    rows = QUERIES["mixed_lang_purity_by_source"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    agg = defaultdict(lambda: [0, 0])
    for d in docs:
        if d.text is None or d.lang is None:
            continue
        toks = re.split(r"\s+", d.text.lower())
        if not toks:
            continue
        for i in range(0, len(toks), 20):
            ck = toks[i : i + 20]
            scores = {
                l: sum(1 for t in ck if t in ws) for l, ws in MARKERS.items()
            }
            best = max(scores.values())
            pred = next(l for l in MARKERS if scores[l] == best)
            agg[d.source][0] += 1
            agg[d.source][1] += pred == d.lang
    got = {r.source: (r.n_chunks, r.n_agree) for r in rows}
    assert got == {s: tuple(v) for s, v in agg.items()}
    for r in rows:
        assert 0 <= r.n_agree <= r.n_chunks
        assert r.purity_micro == round(r.n_agree / r.n_chunks * 1e6)


def test_template_prefix_clusters_replay(spark):
    import hashlib
    import re

    rows = QUERIES["template_prefix_clusters"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    groups = defaultdict(set)
    counts = Counter()
    for d in docs:
        if d.text is None:
            continue
        pre = " ".join(re.split(r"\s+", d.text.strip().lower())[:8])
        h = hashlib.md5(pre.encode()).hexdigest()
        counts[h] += 1
        groups[h].add(d.source)
    want = sorted(
        ((n, h) for h, n in counts.items() if n >= 2),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    got = [(r.n_docs, r.prefix_hash) for r in rows]
    assert got == want
    for r in rows:
        assert 1 <= r.n_sources <= r.n_docs
        assert r.n_sources == len(groups[r.prefix_hash])


def test_burstiness_by_type_replay(spark):
    rows = QUERIES["burstiness_by_type"](spark, SF_DIR).collect()
    assert rows
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    import calendar

    # replay at whole-second resolution (timetuple drops the sub-second
    # part — the same floor the operator's µs // 1e6 applies)
    per_key = defaultdict(list)
    for r in ev:
        per_key[(r.user_id, r.event_type)].append(
            calendar.timegm(r.ts.timetuple())
        )
    stats = defaultdict(lambda: [0, 0, 0])
    for (_, et), ts_list in per_key.items():
        ts_list.sort()
        for a, b in zip(ts_list, ts_list[1:]):
            g = b - a
            s = stats[et]
            s[0] += 1
            s[1] += g
            s[2] += g * g
    for r in rows:
        n, sg, sgg = stats[r.event_type]
        assert (r.n, r.sum_gap_s) == (n, sg)
        mean = sg / n
        var = max(sgg / n - mean * mean, 0.0)
        sigma = var**0.5
        want = round((sigma - mean) / (sigma + mean) * 1e6)
        assert r.burstiness_micro == want
        assert -1_000_000 <= r.burstiness_micro < 1_000_000
    assert {r.event_type for r in rows} == set(stats)


def test_theil_sen_trend_replay(spark):
    from collections import defaultdict

    rows = QUERIES["theil_sen_trend_by_nation"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    cust = {
        r.c_custkey: r.c_nationkey
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    monthly = defaultdict(int)
    for o in orders:
        d = o.o_orderdate.date()
        monthly[(cust[o.o_custkey], d.year * 12 + d.month)] += round(
            o.o_totalprice * 100
        )
    by_nk = defaultdict(list)
    for (nk, mi), rev in monthly.items():
        by_nk[nk].append((mi, rev))
    want = {}
    for nk, pts in by_nk.items():
        pts.sort()
        slopes = []
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                dr, dm = (pts[j][1] - pts[i][1]) * 1000, pts[j][0] - pts[i][0]
                slopes.append(dr // dm)  # python // IS floor division
        slopes.sort()
        want[f"NATION_{nk}"] = (len(slopes), slopes[(len(slopes) + 1) // 2 - 1])
    assert {r.nation: (r.n_pairs, r.theil_slope_milli) for r in rows} == want


def test_spearman_rev_aov_replay(spark):
    from collections import defaultdict

    [r] = QUERIES["spearman_rev_aov_nations"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    cust = {
        c.c_custkey: c.c_nationkey
        for c in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    rev, cnt = defaultdict(int), defaultdict(int)
    for o in orders:
        nk = cust[o.o_custkey]
        rev[nk] += round(o.o_totalprice * 100)
        cnt[nk] += 1
    nks = sorted(rev)
    r_rev = {nk: i + 1 for i, nk in enumerate(sorted(nks, key=lambda k: (-rev[k], k)))}
    r_aov = {
        nk: i + 1
        for i, nk in enumerate(sorted(nks, key=lambda k: (-(rev[k] // cnt[k]), k)))
    }
    n = len(nks)
    sd2 = sum((r_rev[k] - r_aov[k]) ** 2 for k in nks)
    assert (r.n, r.sd2) == (n, sd2)
    assert r.rho_ppm == 1_000_000 - (6_000_000 * sd2) // (n * (n * n - 1))
    # permutation ranks bound: rho in [-1, 1] ppm
    assert -1_000_000 <= r.rho_ppm <= 1_000_000


def test_kendall_tau_replay(spark):
    from collections import defaultdict
    from itertools import combinations

    [r] = QUERIES["kendall_tau_brand_ranks"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    brand = {
        p.p_partkey: p.p_brand
        for p in spark.read.parquet(f"{SF_DIR}/part.parquet").collect()
    }
    rev, qty = defaultdict(int), defaultdict(int)
    for x in li:
        b = brand[x.l_partkey]
        rev[b] += round(x.l_extendedprice * 100)
        qty[b] += round(x.l_quantity)
    conc = disc = 0
    for a, b in combinations(sorted(rev), 2):
        s = (rev[a] - rev[b]) * (qty[a] - qty[b])
        conc += s > 0
        disc += s < 0
    n_pairs = len(rev) * (len(rev) - 1) // 2
    assert (r.n_pairs, r.concordant, r.discordant) == (n_pairs, conc, disc)
    assert r.ties == n_pairs - conc - disc
    assert r.tau_ppm == ((conc - disc) * 1_000_000) // n_pairs


def test_label_centroid_separation_replay(spark):
    import numpy as np

    rows = QUERIES["embedding_label_centroid_separation"](spark, SF_DIR).collect()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    by_label = defaultdict(list)
    for r in emb:
        by_label[r.label].append(
            [int(round(float(x) * 1_000_000)) for x in r.embedding]
        )
    labels = sorted(by_label)
    got = {(r.label_a, r.label_b): r for r in rows}
    assert set(got) == {
        (a, b) for i, a in enumerate(labels) for b in labels[i + 1 :]
    }
    for (a, b), r in got.items():
        sa = np.array(by_label[a], dtype=object).sum(axis=0)
        sb = np.array(by_label[b], dtype=object).sum(axis=0)
        dot = float(sum(int(x) * int(y) for x, y in zip(sa, sb)))
        naa = float(sum(int(x) * int(x) for x in sa))
        nbb = float(sum(int(y) * int(y) for y in sb))
        want = math.floor(dot / math.sqrt(naa * nbb) * 1e9 + 0.5)
        assert (r.n_a, r.n_b) == (len(by_label[a]), len(by_label[b]))
        assert abs(r.centroid_cos_nano - want) <= 1
        # cosine bound
        assert -1_000_000_000 <= r.centroid_cos_nano <= 1_000_000_000


def test_hapax_rate_replay(spark):
    import re

    rows = QUERIES["hapax_rate_by_source"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    cnt = defaultdict(Counter)
    for d in docs:
        if d.text is None or d.source is None:
            continue
        cnt[d.source].update(w for w in re.split(r"\s+", d.text.lower()) if w)
    assert {r.source for r in rows} == set(cnt)
    for r in rows:
        c = cnt[r.source]
        hap = sum(1 for v in c.values() if v == 1)
        assert (r.vocab, r.hapax, r.n_tokens) == (len(c), hap, sum(c.values()))
        assert r.hapax_ppm == hap * 1_000_000 // len(c)


def test_size_demand_curve_replay(spark):
    rows = QUERIES["size_demand_curve"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    size = {
        p.p_partkey: p.p_size
        for p in spark.read.parquet(f"{SF_DIR}/part.parquet").collect()
    }
    agg = defaultdict(lambda: [0, 0, 0])
    for x in li:
        a = agg[size[x.l_partkey]]
        a[0] += 1
        a[1] += round(x.l_quantity)
        a[2] += round(x.l_extendedprice * 100)
    tot = sum(a[2] for a in agg.values())
    assert [r.size for r in rows] == sorted(agg)
    for r in rows:
        n, q, rev = agg[r.size]
        assert (r.n_lines, r.qty, r.rev_cents) == (n, q, rev)
        assert r.unit_price_milli == rev * 1000 // q
        assert r.rev_share_ppm == rev * 1_000_000 // tot
    # shares sum to ~1e6 (floor rounding loses at most |sizes| ppm)
    s = sum(r.rev_share_ppm for r in rows)
    assert 1_000_000 - len(rows) <= s <= 1_000_000


def test_anova_dim1_replay(spark):
    [r] = QUERIES["anova_dim1_by_label"](spark, SF_DIR).collect()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    groups = defaultdict(list)
    for e in emb:
        groups[e.label].append(int(round(float(e.embedding[0]) * 1_000_000)))
    k = len(groups)
    n_tot = sum(len(v) for v in groups.values())
    s1_tot = sum(sum(v) for v in groups.values())
    s2_tot = float(sum(x * x for v in groups.values() for x in v))
    sb_raw = float(
        sum(math.floor(sum(v) * float(sum(v)) / len(v) + 0.5)
            for v in groups.values())
    )
    ssb = sb_raw - float(s1_tot) * s1_tot / n_tot
    msb = ssb / (k - 1)
    msw = (s2_tot - sb_raw) / (n_tot - k)
    assert (r.k, r.n_tot) == (k, n_tot)
    assert abs(r.msb_microsq - msb) <= 1
    assert abs(r.msw_microsq - msw) <= 1
    assert abs(r.f_stat_micro - msb / msw * 1e6) <= 1
    # sanity: unit-normalized vectors -> both variances well below 1
    assert 0 < r.msw_microsq < 10**12


def test_linenumber_position_replay(spark):
    rows = QUERIES["linenumber_position_effect"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    agg = defaultdict(lambda: [0, 0, 0])
    for x in li:
        a = agg[x.l_linenumber]
        a[0] += 1
        a[1] += round(x.l_quantity)
        a[2] += round(x.l_extendedprice * 100)
    assert [r.line_no for r in rows] == sorted(agg)
    for r in rows:
        n, q, rev = agg[r.line_no]
        assert r.n_lines == n
        assert r.avg_qty_milli == q * 1000 // n
        assert r.avg_line_cents == rev // n
    # line numbers are a prefix-closed sequence: count never rises
    counts = [r.n_lines for r in rows]
    assert counts == sorted(counts, reverse=True) or len(set(counts)) > 1


def test_positional_novelty_replay(spark):
    import re

    rows = QUERIES["positional_novelty_curve"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    cells = defaultdict(lambda: [0, 0])
    for d in docs:
        if d.text is None:
            continue
        ws = [w for w in re.split(r"\s+", d.text.lower()) if w]
        seen = set()
        for i, w in enumerate(ws):
            dec = i * 10 // len(ws)
            cells[dec][0] += 1
            if w not in seen:
                cells[dec][1] += 1
                seen.add(w)
    got = {r.pos_decile: (r.n_tokens, r.n_new, r.novelty_ppm) for r in rows}
    assert set(got) == set(cells)
    for dec, (n, new) in cells.items():
        assert got[dec] == (n, new, new * 1_000_000 // n)
    # novelty decays: decile 0 strictly above decile 9
    assert got[0][2] > got[9][2]


def test_fdr_bh_replay(spark):
    rows = QUERIES["fdr_bh_screening"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    cust = {
        c.c_custkey: c.c_nationkey
        for c in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    n, u = defaultdict(int), defaultdict(int)
    for o in orders:
        nk = cust[o.o_custkey]
        n[nk] += 1
        u[nk] += o.o_orderpriority == "1-URGENT"
    tn, tu = sum(n.values()), sum(u.values())
    p0 = tu / tn

    def p_nano(nk):
        az = abs((u[nk] / n[nk] - p0) / math.sqrt(p0 * (1 - p0) / n[nk]))
        t = 1 / (1 + 0.2316419 * az)
        tail = (
            math.exp(-az * az / 2)
            / math.sqrt(2 * math.pi)
            * (
                0.319381530 * t
                - 0.356563782 * t**2
                + 1.781477937 * t**3
                - 1.821255978 * t**4
                + 1.330274429 * t**5
            )
        )
        return math.floor(2 * tail * 1e9 + 0.5)

    ps = sorted(((p_nano(nk), nk) for nk in n))
    m = len(ps)
    cutoff = 0
    for i, (p, _) in enumerate(ps, 1):
        if p * m <= i * 50_000_000:
            cutoff = i
    got = [(r.nationkey, r.p_nano, r.p_rank, r.significant) for r in rows]
    want = [
        (nk, p, i, 1 if i <= cutoff else 0)
        for i, (p, nk) in enumerate(ps, 1)
    ]
    # allow 1-nano slack on the p-value itself; rank/sig must be exact
    for (gn, gp, gr, gs), (wn, wp, wr, ws) in zip(got, want):
        assert (gn, gr, gs) == (wn, wr, ws)
        assert abs(gp - wp) <= 1
    # BH step-up is monotone: significant rows form a prefix of ranks
    sig = [r.significant for r in rows]
    assert sig == sorted(sig, reverse=True)


def test_neyman_allocation_replay(spark):
    rows = QUERIES["neyman_allocation"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    cust = {
        c.c_custkey: c.c_nationkey
        for c in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    vals = defaultdict(list)
    for o in orders:
        vals[cust[o.o_custkey]].append(round(o.o_totalprice * 100))
    wt = {}
    for nk, xs in vals.items():
        nn = len(xs)
        s1, s2 = sum(xs), sum(x * x for x in xs)
        var = s2 / nn - (s1 / nn) ** 2
        wt[nk] = math.floor(nn * math.sqrt(var) + 0.5)
    tw = sum(wt.values())
    for r in rows:
        assert r.stratum_size == len(vals[r.nationkey])
        assert abs(r.weight_ticks - wt[r.nationkey]) <= 1
        assert r.alloc == 10_000 * r.weight_ticks // tw
    # allocation never exceeds budget; floor loses < |strata| samples
    total = sum(r.alloc for r in rows)
    assert 10_000 - len(rows) <= total <= 10_000


def test_runs_test_replay(spark):
    [r] = QUERIES["runs_test_daily_revenue"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    daily = defaultdict(int)
    for o in orders:
        daily[o.o_orderdate.date()] += round(o.o_totalprice * 100)
    by_rev = sorted(daily.items(), key=lambda kv: (kv[1], kv[0]))
    med = by_rev[(len(by_rev) + 1) // 2 - 1][1]
    seq = [1 if daily[d] > med else 0 for d in sorted(daily)]
    runs = 1 + sum(a != b for a, b in zip(seq, seq[1:]))
    n1, n2 = sum(seq), len(seq) - sum(seq)
    assert (r.n_days, r.n_above, r.n_below, r.runs) == (
        len(seq),
        n1,
        n2,
        runs,
    )
    mu = 2 * n1 * n2 / (n1 + n2) + 1
    var = (
        2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
        / ((n1 + n2) ** 2 * (n1 + n2 - 1))
    )
    assert abs(r.z_nano - (runs - mu) / math.sqrt(var) * 1e9) <= 1


def test_jackknife_se_replay(spark):
    [r] = QUERIES["jackknife_se_by_nation"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    cust = {
        c.c_custkey: c.c_nationkey
        for c in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    n, s = defaultdict(int), defaultdict(int)
    for o in orders:
        nk = cust[o.o_custkey]
        n[nk] += 1
        s[nk] += round(o.o_totalprice * 100)
    tn, ts, k = sum(n.values()), sum(s.values()), len(n)
    theta_all = ts / tn
    devs, thetas = [], []
    for nk in n:
        th = (ts - s[nk]) / (tn - n[nk])
        thetas.append(math.floor(th * 1000 + 0.5))
        devs.append(math.floor((th - theta_all) ** 2 * 1e6 + 0.5))
    assert r.n_groups == k
    assert abs(r.sum_theta_milli - sum(thetas)) <= k
    want_se = math.sqrt(sum(devs) / 1e6 * (k - 1) / k) * 1000
    assert abs(r.jackknife_se_milli - want_se) <= 2
    # delete-one replicates hug the global mean: SE well under theta
    assert r.jackknife_se_milli < r.sum_theta_milli // k


def test_capture_recapture_replay(spark):
    [r] = QUERIES["capture_recapture_customers"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    s1 = {
        o.o_custkey
        for o in orders
        if o.o_orderdate.year == 1996
    }
    s2 = {
        o.o_custkey
        for o in orders
        if o.o_orderdate.year == 1997
    }
    m = len(s1 & s2)
    assert (r.n1, r.n2, r.m) == (len(s1), len(s2), m)
    assert r.lincoln_petersen_estimate == len(s1) * len(s2) // m
    # the estimator should land within 20% of the true universe here
    assert abs(r.lincoln_petersen_estimate - r.true_universe) < (
        r.true_universe // 5
    )


def test_priority_transition_replay(spark):
    rows = QUERIES["priority_transition_matrix"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    by_cust = defaultdict(list)
    for o in orders:
        by_cust[o.o_custkey].append(
            (o.o_orderdate.date(), o.o_orderkey, o.o_orderpriority)
        )
    cells = defaultdict(int)
    for seq in by_cust.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            cells[(a, b)] += 1
    row_tot = defaultdict(int)
    for (a, _), v in cells.items():
        row_tot[a] += v
    got = {(r.prev_priority, r.next_priority): (r.n, r.row_share_ppm)
           for r in rows}
    assert got == {
        k: (v, v * 1_000_000 // row_tot[k[0]]) for k, v in cells.items()
    }
    # each row's shares sum to ~1e6
    shares = defaultdict(int)
    for r in rows:
        shares[r.prev_priority] += r.row_share_ppm
    for v in shares.values():
        assert 1_000_000 - 5 <= v <= 1_000_000


def test_chow_test_replay(spark):
    [r] = QUERIES["chow_test_break"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    monthly = defaultdict(int)
    for o in orders:
        d = o.o_orderdate.date()
        monthly[d.year * 12 + d.month] += round(o.o_totalprice * 100)

    def rss(pts):
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = float(sum(x * y for x, y in pts))
        sxx = float(sum(x * x for x, _ in pts))
        syy = float(sum(y * y for _, y in pts))
        return syy - sy * float(sy) / n - (sxy - sx * float(sy) / n) ** 2 / (
            sxx - sx * float(sx) / n
        )

    pts = sorted(monthly.items())
    left = [(x, y) for x, y in pts if x < 1997 * 12 + 1]
    right = [(x, y) for x, y in pts if x >= 1997 * 12 + 1]
    pooled, split = rss(pts), rss(left) + rss(right)
    assert r.n_months == len(pts)
    assert abs(r.rss_pooled_tera - pooled / 1e12) <= 1
    assert abs(r.rss_split_tera - split / 1e12) <= 1
    f = (pooled - split) / 2 / (split / (len(pts) - 4))
    assert abs(r.chow_f_micro - f * 1e6) <= 2
    # splitting can never raise RSS
    assert r.rss_split_tera <= r.rss_pooled_tera


def test_laspeyres_replay(spark):
    rows = QUERIES["laspeyres_price_index"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    base = defaultdict(lambda: [0, 0])
    cur = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for x in li:
        q, rv = round(x.l_quantity), round(x.l_extendedprice * 100)
        if x.l_shipdate.year == 1995:
            base[x.l_partkey][0] += q
            base[x.l_partkey][1] += rv
        m = (x.l_shipdate.year, x.l_shipdate.month)
        cur[m][x.l_partkey][0] += q
        cur[m][x.l_partkey][1] += rv
    for r in rows:
        m = (r.month.year, r.month.month)
        num = den = matched = 0
        for pk, (qt, rt) in cur[m].items():
            if pk not in base or base[pk][0] <= 0 or qt <= 0:
                continue
            q0, r0 = base[pk]
            num += (rt * 1000 // qt) * q0
            den += (r0 * 1000 // q0) * q0
            matched += 1
        assert (r.n_parts_matched, r.laspeyres_index_milli) == (
            matched,
            num * 1000 // den,
        )


def test_burrows_delta_replay(spark):
    import re

    rows = QUERIES["stylometry_burrows_delta"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    st = defaultdict(Counter)
    for d in docs:
        if d.text is None or d.source is None:
            continue
        st[d.source].update(w for w in re.split(r"\s+", d.text.lower()) if w)
    cf = Counter()
    for c in st.values():
        cf.update(c)
    top = [t for t, _ in sorted(cf.items(), key=lambda kv: (-kv[1], kv[0]))[:50]]
    tot = {s: sum(c.values()) for s, c in st.items()}
    fr = {
        (s, t): st[s][t] * 1_000_000_000 // tot[s] for s in st for t in top
    }
    k = len(st)
    want = {}
    for s in st:
        azs = []
        for t in top:
            vals = [fr[(s2, t)] for s2 in st]
            s1, s2m = sum(vals), sum(v * v for v in vals)
            if float(s2m) * k <= float(s1) * s1:
                continue
            mu = s1 / k
            sd = math.sqrt(s2m / k - mu * mu)
            azs.append(math.floor(abs(fr[(s, t)] - mu) / sd * 1000 + 0.5))
        want[s] = (len(azs), sum(azs) // len(azs))
    got = {r.source: (r.n_terms, r.burrows_delta_milli) for r in rows}
    assert set(got) == set(want)
    for s in want:
        assert got[s][0] == want[s][0]
        assert abs(got[s][1] - want[s][1]) <= 1


def test_fisher_index_replay(spark):
    rows = QUERIES["fisher_price_index"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    base = defaultdict(lambda: [0, 0])
    cur = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for x in li:
        q, rv = round(x.l_quantity), round(x.l_extendedprice * 100)
        if x.l_shipdate.year == 1995:
            base[x.l_partkey][0] += q
            base[x.l_partkey][1] += rv
        cur[(x.l_shipdate.year, x.l_shipdate.month)][x.l_partkey][0] += q
        cur[(x.l_shipdate.year, x.l_shipdate.month)][x.l_partkey][1] += rv
    for r in rows:
        m = (r.month.year, r.month.month)
        ln = ld = pn = pd_ = 0
        for pk, (qt, rt) in cur[m].items():
            if pk not in base or base[pk][0] <= 0 or qt <= 0:
                continue
            q0, r0 = base[pk]
            pt, p0 = rt * 1000 // qt, r0 * 1000 // q0
            ln += pt * q0
            ld += p0 * q0
            pn += pt * qt
            pd_ += p0 * qt
        assert r.laspeyres_milli == ln * 1000 // ld
        assert r.paasche_milli == pn * 1000 // pd_
        want_f = math.sqrt((ln / ld) * (pn / pd_)) * 1000
        assert abs(r.fisher_milli - want_f) <= 1
        # Fisher sits between its factors
        lo, hi = sorted((r.laspeyres_milli, r.paasche_milli))
        assert lo - 1 <= r.fisher_milli <= hi + 1


def test_type_transfer_replay(spark):
    rows = QUERIES["type_demand_transfer_topk"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    od = {
        o.o_orderkey: (o.o_custkey, o.o_orderdate.year)
        for o in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    }
    ptype = {
        p.p_partkey: p.p_type
        for p in spark.read.parquet(f"{SF_DIR}/part.parquet").collect()
    }
    cty = {(od[x.l_orderkey][0], ptype[x.l_partkey], od[x.l_orderkey][1])
           for x in li}
    flow = Counter()
    by_ck = defaultdict(list)
    for ck, ty, yr in cty:
        by_ck[ck].append((ty, yr))
    for ck, pairs in by_ck.items():
        for ta, ya in pairs:
            for tb, yb in pairs:
                if yb == ya + 1:
                    flow[(ta, tb)] += 1
    tot_from, tot_to = Counter(), Counter()
    for (a, b), v in flow.items():
        tot_from[a] += v
        tot_to[b] += v
    tot = sum(flow.values())
    scored = sorted(
        (
            (a, b, v,
             math.floor(v * tot / (tot_from[a] * tot_to[b]) * 1000 + 0.5))
            for (a, b), v in flow.items()
        ),
        key=lambda t: (-t[2], t[0], t[1]),
    )[:20]
    got = [(r.type_from, r.type_to, r.n, r.lift_milli) for r in rows]
    for g, w in zip(got, scored):
        assert g[:3] == w[:3]
        assert abs(g[3] - w[3]) <= 1


def test_dow_r2_replay(spark):
    [r] = QUERIES["dow_seasonality_strength"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    daily = defaultdict(int)
    for o in orders:
        daily[o.o_orderdate.date()] += round(o.o_totalprice * 100)
    groups = defaultdict(list)
    for d, rev in daily.items():
        groups[d.isoweekday() % 7 + 1].append(rev)  # Spark: Sunday=1
    n = len(daily)
    s1 = sum(daily.values())
    s2 = float(sum(v * v for v in daily.values()))
    sb = sum(sum(v) ** 2 / len(v) for v in groups.values())
    gm = s1 * s1 / n
    want = (sb - gm) / (s2 - gm) * 1e6
    assert r.n_days == n
    assert abs(r.dow_r2_micro - want) <= 2
    # R-squared bounds
    assert 0 <= r.dow_r2_micro <= 1_000_000


def test_yule_k_replay(spark):
    import re

    rows = QUERIES["yule_k_by_source"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    cnt = defaultdict(Counter)
    for d in docs:
        if d.text is None or d.source is None:
            continue
        cnt[d.source].update(w for w in re.split(r"\s+", d.text.lower()) if w)
    assert {r.source for r in rows} == set(cnt)
    for r in rows:
        c = cnt[r.source]
        n = sum(c.values())
        s2 = sum(v * v for v in c.values())
        assert (r.n_tokens, r.vocab) == (n, len(c))
        assert r.yule_k_micro == 10_000 * (s2 - n) * 1_000_000 // (n * n)
        # bounded-vocab synthetic text is HIGHLY repetitive: K >> 100
        assert r.yule_k_micro > 100_000_000


def test_eoq_replay(spark):
    rows = QUERIES["eoq_by_type"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    ptype = {
        p.p_partkey: p.p_type
        for p in spark.read.parquet(f"{SF_DIR}/part.parquet").collect()
    }
    units, years = defaultdict(int), defaultdict(set)
    for x in li:
        t = ptype[x.l_partkey]
        units[t] += round(x.l_quantity)
        years[t].add(x.l_shipdate.year)
    for r in rows:
        au, ny = units[r.ptype], len(years[r.ptype])
        assert (r.annual_units, r.n_years) == (au, ny)
        dy = au / ny
        eoq = math.sqrt(2 * dy * 50 / 2)
        assert abs(r.eoq_units - eoq) <= 1
        assert abs(r.orders_per_year - dy / eoq) <= 1
        # EOQ grows as sqrt of demand: the UNROUNDED frequency times
        # quantity reproduces demand (integer outputs round each side)
        assert abs(eoq * (dy / eoq) - dy) < 1e-6


def test_page_hinkley_replay(spark):
    [r] = QUERIES["page_hinkley_revenue"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    daily = defaultdict(int)
    for o in orders:
        daily[o.o_orderdate.date()] += round(o.o_totalprice * 100)
    ref = [v for d, v in daily.items() if d.year == 1995]
    mu = sum(ref) // len(ref)
    mt, mts = 0, []
    for d in sorted(daily):
        mt += daily[d] - mu
        mts.append(mt)
    assert r.n_days == len(daily)
    assert (r.max_mt, r.min_mt) == (max(mts), min(mts))
    assert r.ph_range_cents == max(mts) - min(mts)


def test_tukey_fences_replay(spark):
    [r] = QUERIES["tukey_fence_outlier_days"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    daily = defaultdict(int)
    for o in orders:
        daily[o.o_orderdate.date()] += round(o.o_totalprice * 100)
    vals = sorted(daily.values())
    n = len(vals)
    q1 = vals[(n + 3) // 4 - 1]
    q3 = vals[(3 * n + 3) // 4 - 1]
    iqr = q3 - q1
    hi = sum(2 * v > 2 * q3 + 3 * iqr for v in vals)
    lo = sum(2 * v < 2 * q1 - 3 * iqr for v in vals)
    assert (r.n_days, r.q1_cents, r.q3_cents) == (n, q1, q3)
    assert (r.n_high_outliers, r.n_low_outliers) == (hi, lo)
    # the quartiles bracket at least half the days
    inside = sum(q1 <= v <= q3 for v in vals)
    assert inside * 2 >= n


def test_nation_cagr_replay(spark):
    rows = QUERIES["nation_revenue_cagr"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    cust = {
        c.c_custkey: c.c_nationkey
        for c in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    ny = defaultdict(int)
    for o in orders:
        ny[(cust[o.o_custkey], o.o_orderdate.year)] += round(
            o.o_totalprice * 100
        )
    nations = {nk for nk, _ in ny}
    for r in rows:
        nk = int(r.nation.split("_")[1])
        yrs = sorted(y for k, y in ny if k == nk)
        y0, y1 = yrs[0], yrs[-1]
        rev0, rev1 = ny[(nk, y0)], ny[(nk, y1)]
        assert (r.y0, r.y1) == (y0, y1)
        assert (r.first_year_cents, r.last_year_cents) == (rev0, rev1)
        cagr = ((rev1 / rev0) ** (1 / (y1 - y0)) - 1) * 1e6
        assert abs(r.cagr_micro - cagr) <= 2
    assert len(rows) == len(nations)


def test_simpson_diversity_replay(spark):
    import re

    rows = QUERIES["simpson_diversity_by_lang"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    cnt = defaultdict(Counter)
    for d in docs:
        if d.text is None or d.lang is None:
            continue
        cnt[d.lang].update(w for w in re.split(r"\s+", d.text.lower()) if w)
    assert {r.lang for r in rows} == set(cnt)
    for r in rows:
        c = cnt[r.lang]
        n = sum(c.values())
        s2 = sum(v * (v - 1) for v in c.values())
        assert (r.n_tokens, r.vocab) == (n, len(c))
        assert r.simpson_repeat_nano == s2 * 1_000_000_000 // (n * (n - 1))
        assert r.effective_vocab_milli == n * (n - 1) * 1000 // s2
        # effective vocab never exceeds raw vocab
        assert r.effective_vocab_milli <= r.vocab * 1000


def test_quantile_shift_replay(spark):
    rows = QUERIES["quantile_shift_by_priority"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    a = sorted(
        round(o.o_totalprice * 100)
        for o in orders
        if o.o_orderpriority == "1-URGENT"
    )
    b = sorted(
        round(o.o_totalprice * 100)
        for o in orders
        if o.o_orderpriority == "5-LOW"
    )

    def q_at(xs, q):
        # smallest value whose inclusive ECDF reaches q/10
        import bisect

        target = -(-q * len(xs) // 10)  # ceil(q*n/10)
        return xs[target - 1]

    assert len(rows) == 9
    for r in rows:
        va, vb = q_at(a, r.decile), q_at(b, r.decile)
        assert (r.urgent_cents, r.low_cents) == (va, vb)
        assert r.shift_cents == va - vb
    # deciles are monotone within each sample
    for col in ("urgent_cents", "low_cents"):
        vals = [getattr(r, col) for r in rows]
        assert vals == sorted(vals)


def test_design_effect_replay(spark):
    rows = QUERIES["design_effect_by_nation"](spark, SF_DIR).collect()
    [r] = rows
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    cust = {
        c.c_custkey: c.c_nationkey
        for c in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    groups = defaultdict(list)
    for o in orders:
        groups[cust[o.o_custkey]].append(round(o.o_totalprice * 100))
    k = len(groups)
    n_tot = sum(len(v) for v in groups.values())
    s1_tot = sum(sum(v) for v in groups.values())
    s2_tot = float(sum(x * x for v in groups.values() for x in v))
    sb = (
        sum(
            math.floor(sum(v) * float(sum(v)) / len(v) / 1e6 + 0.5)
            for v in groups.values()
        )
        * 1e6
    )
    msb = (sb - float(s1_tot) * s1_tot / n_tot) / (k - 1)
    msw = (s2_tot - sb) / (n_tot - k)
    m_avg = n_tot / k
    icc = (msb - msw) / (msb + (m_avg - 1) * msw)
    deff = 1 + (m_avg - 1) * icc
    assert (r.n_clusters, r.n_orders) == (k, n_tot)
    assert abs(r.icc_micro - icc * 1e6) <= 2
    assert abs(r.deff_milli - deff * 1000) <= 2
    assert abs(r.effective_n - n_tot / deff) <= 2


def test_spc_ratio_replay(spark):
    [r] = QUERIES["spc_range_sigma_ratio"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    daily = defaultdict(int)
    for o in orders:
        daily[o.o_orderdate.date()] += round(o.o_totalprice * 100)
    import datetime

    epoch = datetime.date(1970, 1, 1)
    weeks = defaultdict(list)
    for d, v in daily.items():
        weeks[(d - epoch).days // 7].append(v)
    full = [vs for vs in weeks.values() if len(vs) == 7]
    mean_rng = sum(max(v) - min(v) for v in full) // len(full)
    n = len(daily)
    s1 = sum(daily.values())
    s2 = float(sum(v * v for v in daily.values()))
    sigma = math.sqrt(s2 / n - (s1 / n) ** 2)
    assert r.n_weeks == len(full)
    assert r.mean_range_cents == mean_rng
    assert abs(r.sigma_cents - sigma) <= 1
    ratio = (sum(max(v) - min(v) for v in full) / len(full)) / sigma * 1000
    assert abs(r.range_sigma_ratio_milli - ratio) <= 2
    # iid daily revenue: the ratio sits in the d2(7) = 2.704
    # neighborhood (small-SF discreteness pulls it low)
    assert 1_700 < r.range_sigma_ratio_milli < 3_400


def test_ljung_box_replay(spark):
    [r] = QUERIES["ljung_box_q"](spark, SF_DIR).collect()
    acf = QUERIES["autocorrelation_lags"](spark, SF_DIR).collect()
    n = acf[0].n_pairs + acf[0].lag_k
    terms = [
        math.floor(float(a.acf_ticks) * a.acf_ticks / a.n_pairs + 0.5)
        for a in acf
    ]
    q_milli = math.floor(n * (n + 2) * float(sum(terms)) / 1e15 + 0.5)
    assert r.n_days == n
    assert r.n_lags == len(acf)
    assert abs(r.ljung_box_q_milli - q_milli) <= 1
    # Q is a sum of squares: non-negative
    assert r.ljung_box_q_milli >= 0


def test_kpss_replay(spark):
    [r] = QUERIES["kpss_stationarity_proxy"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    daily = defaultdict(int)
    for o in orders:
        daily[o.o_orderdate.date()] += round(o.o_totalprice * 100)
    xs = [daily[d] for d in sorted(daily)]
    n, s = len(xs), sum(xs)
    q = sum(x * x for x in xs)
    sn, ss2 = 0, 0
    for x in xs:
        sn += x * n - s
        ss2 += sn * sn
    sigma2 = q / n - (s / n) ** 2
    eta = ss2 / (n * n) / (n * n) / sigma2
    assert r.n_days == n
    assert abs(r.kpss_eta_micro - eta * 1e6) <= 2
    # eta is positive; a wildly trending series would exceed ~1
    assert r.kpss_eta_micro > 0


def test_label_similarity_split_replay(spark):
    rows = QUERIES["label_pair_similarity_split"](spark, SF_DIR).collect()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    sub = [
        (e.vec_id, e.label, [float(x) for x in e.embedding])
        for e in emb
        if e.vec_id % 7 == 0
    ]
    stats = {0: [], 1: []}
    for i, (ida, la, ea) in enumerate(sub):
        for idb, lb, eb in sub[i + 1 :]:
            acc = 0.0
            for x, y in zip(ea, eb):
                acc += x * y
            stats[1 if la == lb else 0].append(
                math.floor(acc * 1e9 + 0.5)
            )
    got = {r.same_label: r for r in rows}
    for k, vals in stats.items():
        r = got[k]
        assert r.n_pairs == len(vals)
        assert abs(r.mean_cos_nano - sum(vals) // len(vals)) <= 1
        assert abs(r.min_cos_nano - min(vals)) <= 1
        assert abs(r.max_cos_nano - max(vals)) <= 1
    # both rows exist and cover every sampled pair exactly once
    n_sub = len(sub)
    assert got[0].n_pairs + got[1].n_pairs == n_sub * (n_sub - 1) // 2
    # (the within-vs-cross GAP is the op's finding, not an invariant:
    # at sf0.001 the sampled subset's labels are geometrically
    # invisible — gap < 0 — which is exactly what the check reports)


def test_effect_size_replay(spark):
    [r] = QUERIES["effect_size_priority"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    a = [round(o.o_totalprice * 100) for o in orders
         if o.o_orderpriority == "1-URGENT"]
    b = [round(o.o_totalprice * 100) for o in orders
         if o.o_orderpriority == "5-LOW"]
    na, nb = len(a), len(b)
    ssa = sum(x * x for x in a) - sum(a) ** 2 / na
    ssb = sum(x * x for x in b) - sum(b) ** 2 / nb
    pooled = math.sqrt((ssa + ssb) / (na + nb - 2))
    d = (sum(a) / na - sum(b) / nb) / pooled
    assert (r.n_urgent, r.n_low) == (na, nb)
    assert abs(r.cohens_d_micro - d * 1e6) <= 2
    # synthetic priorities are value-independent: |d| stays in the
    # small-effect band (sampling noise at sf0.001 reaches ~0.2)
    assert abs(r.cohens_d_micro) < 400_000


def test_mann_kendall_replay(spark):
    [r] = QUERIES["mann_kendall_trend"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    monthly = defaultdict(int)
    for o in orders:
        d = o.o_orderdate.date()
        monthly[d.year * 12 + d.month] += round(o.o_totalprice * 100)
    xs = [monthly[k] for k in sorted(monthly)]
    n = len(xs)
    s = sum(
        (xs[j] > xs[i]) - (xs[j] < xs[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    assert (r.n_months, r.mk_s, r.n_pairs) == (n, s, n * (n - 1) // 2)
    cc = 1 if s > 0 else (-1 if s < 0 else 0)
    z = (s - cc) / math.sqrt(n * (n - 1) * (2 * n + 5) / 18)
    assert abs(r.mk_z_micro - z * 1e6) <= 2


def test_benford_second_digit_replay(spark):
    rows = QUERIES["benford_second_digit_audit"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    c = Counter()
    for o in orders:
        v = round(o.o_totalprice * 100)
        if v >= 10:
            c[int(str(v)[1])] += 1
    tot = sum(c.values())
    exp = {
        0: 119679, 1: 113890, 2: 108821, 3: 104330, 4: 100308,
        5: 96677, 6: 93375, 7: 90352, 8: 87570, 9: 84997,
    }
    got = {r.digit: r for r in rows}
    assert set(got) == set(c)
    for d, n in c.items():
        r = got[d]
        obs = n * 1_000_000 // tot
        assert (r.n, r.observed_ppm) == (n, obs)
        assert r.expected_ppm == exp[d]
        assert r.deviation_ppm == obs - exp[d]
    # uniform synthetic prices: observed ~100k ppm per digit, so digit
    # 0 under-indexes and digit 9 over-indexes vs Benford
    assert got[0].deviation_ppm < 0 < got[9].deviation_ppm


def test_sampling_moe_replay(spark):
    rows = QUERIES["sampling_moe_table"](spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    xs = [round(o.o_totalprice * 100) for o in orders]
    n = len(xs)
    var = sum(x * x for x in xs) / n - (sum(xs) / n) ** 2
    assert [r.rate_ppm for r in rows] == [10_000, 50_000, 100_000, 500_000]
    for r in rows:
        assert r.sample_n == n * r.rate_ppm // 1_000_000
        moe = 1.959964 * math.sqrt(
            var / (n * r.rate_ppm / 1e6) * (1 - r.rate_ppm / 1e6)
        )
        assert abs(r.moe_cents_95 - moe) <= 1
    # more sample, less error: strictly decreasing
    moes = [r.moe_cents_95 for r in rows]
    assert moes == sorted(moes, reverse=True)


def test_revenue_waterfall_replay(spark):
    rows = QUERIES["revenue_waterfall_by_year"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    agg = defaultdict(lambda: [0, 0, 0, 0])
    # floor(x+0.5), not python round(): the engines round half AWAY,
    # python rounds half to even (the banker's-rounding gotcha)
    for x in li:
        a = agg[x.l_shipdate.year]
        a[0] += math.floor(x.l_extendedprice * 100 + 0.5)
        a[1] += math.floor(x.l_extendedprice * x.l_discount * 100 + 0.5)
        a[2] += math.floor(
            x.l_extendedprice * (1 - x.l_discount) * x.l_tax * 100 + 0.5
        )
        a[3] += math.floor(
            x.l_extendedprice * (1 - x.l_discount) * (1 + x.l_tax) * 100
            + 0.5
        )
    got = {
        r.yr: (r.gross_cents, r.discount_cents, r.tax_cents,
               r.net_collected_cents)
        for r in rows
    }
    assert got == {y: tuple(v) for y, v in agg.items()}
    # waterfall arithmetic holds to line-level rounding: net is within
    # a few cents-per-line of gross - discount + tax
    for r in rows:
        n_lines = sum(1 for x in li if x.l_shipdate.year == r.yr)
        approx = r.gross_cents - r.discount_cents + r.tax_cents
        assert abs(r.net_collected_cents - approx) <= n_lines


def test_token_length_histogram_replay(spark):
    import re

    rows = QUERIES["token_length_histogram"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    c = Counter()
    for d in docs:
        if d.text is None:
            continue
        c.update(w for w in re.split(r"\s+", d.text.lower()) if w)
    by_len = defaultdict(lambda: [0, 0])
    for term, n in c.items():
        b = by_len[len(term)]
        b[0] += n
        b[1] += 1
    tot = sum(v[0] for v in by_len.values())
    got = {
        r.token_len: (r.n_tokens, r.n_types, r.token_share_ppm)
        for r in rows
    }
    assert got == {
        k: (v[0], v[1], v[0] * 1_000_000 // tot) for k, v in by_len.items()
    }
    # types never exceed tokens
    assert all(r.n_types <= r.n_tokens for r in rows)


def test_supplier_balance_corr_replay(spark):
    [r] = QUERIES["supplier_balance_volume_corr"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    sup = spark.read.parquet(f"{SF_DIR}/supplier.parquet").collect()
    vol = Counter(x.l_suppkey for x in li)
    pts = [(round(s.s_acctbal * 100), vol.get(s.s_suppkey, 0)) for s in sup]
    n = len(pts)
    sa = sum(a for a, _ in pts)
    sb = sum(b for _, b in pts)
    sab = sum(a * b for a, b in pts)
    saa = sum(a * a for a, _ in pts)
    sbb = sum(b * b for _, b in pts)
    corr = (n * sab - sa * sb) / math.sqrt(
        (n * saa - sa * sa) * (n * sbb - sb * sb)
    )
    assert r.n_suppliers == n
    assert abs(r.corr_micro - corr * 1e6) <= 2
    assert -1_000_000 <= r.corr_micro <= 1_000_000


def test_weighted_jaccard_replay(spark):
    import re

    rows = QUERIES["weighted_jaccard_source_pairs"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    cnt = defaultdict(Counter)
    for d in docs:
        if d.text is None or d.source is None:
            continue
        cnt[d.source].update(w for w in re.split(r"\s+", d.text.lower()) if w)
    fr = {
        (s, t): c * 1_000_000_000 // sum(cs.values())
        for s, cs in cnt.items()
        for t, c in cs.items()
    }
    scored = []
    srcs = sorted(cnt)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            common = set(cnt[a]) & set(cnt[b])
            s_min = sum(min(fr[(a, t)], fr[(b, t)]) for t in common)
            s_max = sum(max(fr[(a, t)], fr[(b, t)]) for t in common)
            scored.append((a, b, s_min * 1_000_000 // s_max))
    scored.sort(key=lambda t: (-t[2], t[0], t[1]))
    got = [(r.source_a, r.source_b, r.weighted_jaccard_ppm) for r in rows]
    assert got == scored[:15]
    # weighted jaccard is a [0, 1] similarity
    assert all(0 <= g[2] <= 1_000_000 for g in got)


def test_interarrival_cv2_replay(spark):
    rows = QUERIES["interarrival_cv2_by_type"](spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    by_type = defaultdict(list)
    for e in ev:
        us = e.ts // 1000 if isinstance(e.ts, int) else int(
            e.ts.timestamp() * 1e6
        )
        by_type[e.event_type].append((us, e.event_id))
    got = {r.event_type: r for r in rows}
    assert set(got) == set(by_type)
    for t, evs in by_type.items():
        evs.sort()
        gaps = [b[0] - a[0] for a, b in zip(evs, evs[1:])]
        n, s1 = len(gaps), sum(gaps)
        s2 = sum(g * g for g in gaps)
        mu = s1 / n
        cv2 = (s2 / n - mu * mu) / (mu * mu)
        r = got[t]
        assert (r.n_gaps, r.mean_gap_us) == (n, s1 // n)
        assert abs(r.cv2_micro - cv2 * 1e6) <= 2


def test_renyi_spectrum_replay(spark):
    import re

    [r] = QUERIES["renyi_entropy_spectrum"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    c = Counter()
    for d in docs:
        if d.text is None:
            continue
        c.update(w for w in re.split(r"\s+", d.text.lower()) if w)
    vocab, n = len(c), sum(c.values())
    clnc = sum(math.floor(v * math.log(v) * 1000 + 0.5) for v in c.values())
    c2 = sum(v * v for v in c.values())
    cmax = max(c.values())
    assert (r.vocab, r.n) == (vocab, n)
    assert abs(r.h0_hartley_micro - math.log(vocab) * 1e6) <= 1
    assert abs(
        r.h1_shannon_micro - (math.log(n) - (clnc / 1000) / n) * 1e6
    ) <= 2
    assert abs(r.h2_collision_micro - (-math.log(c2 / n / n)) * 1e6) <= 2
    assert abs(r.hinf_minentropy_micro - (-math.log(cmax / n)) * 1e6) <= 2
    # the Renyi ordering is a theorem: H0 >= H1 >= H2 >= Hinf
    assert (
        r.h0_hartley_micro + 2
        >= r.h1_shannon_micro
        >= r.h2_collision_micro - 2
    )
    assert r.h2_collision_micro + 2 >= r.hinf_minentropy_micro


def test_supplier_hhi_by_type_replay(spark):
    rows = QUERIES["supplier_hhi_by_part_type"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    ptype = {
        p.p_partkey: p.p_type
        for p in spark.read.parquet(f"{SF_DIR}/part.parquet").collect()
    }
    ts = defaultdict(lambda: defaultdict(int))
    for x in li:
        ts[ptype[x.l_partkey]][x.l_suppkey] += round(x.l_extendedprice * 100)
    assert len(rows) == len(ts)
    for r in rows:
        revs = list(ts[r.ptype].values())
        tot = sum(revs)
        assert r.n_suppliers == len(revs)
        assert r.hhi_ppm == sum(v * v for v in revs) * 1_000_000 // (tot * tot)
        # HHI floor: 1e6 / n_suppliers
        assert r.hhi_ppm >= 1_000_000 // r.n_suppliers


def test_eb_shrinkage_replay(spark):
    rows = QUERIES["eb_shrunk_return_rates"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    sup = defaultdict(lambda: [0, 0])
    for x in li:
        a = sup[x.l_suppkey]
        a[0] += 1
        a[1] += x.l_returnflag == "R"
    k = len(sup)
    tn = sum(v[0] for v in sup.values())
    tx = sum(v[1] for v in sup.values())
    p0 = tx / tn
    ssr = sum(
        math.floor((v[1] / v[0] - p0) ** 2 * 1e9 + 0.5)
        for v in sup.values()
    )
    tau2 = max(ssr / 1e9 / k - p0 * (1 - p0) / (tn / k), 1e-9)
    m = p0 * (1 - p0) / tau2 - 1
    scored = sorted(
        (
            (sk, n, x, x * 1_000_000 // n,
             math.floor((x + m * p0) / (n + m) * 1e6 + 0.5))
            for sk, (n, x) in sup.items()
        ),
        key=lambda t: (-t[3], t[0]),
    )[:15]
    got = [(r.l_suppkey, r.n, r.x, r.raw_rate_ppm, r.shrunk_rate_ppm)
           for r in rows]
    for g, w in zip(got, scored):
        assert g[:4] == w[:4]
        assert abs(g[4] - w[4]) <= 1
    # shrinkage pulls every estimate BETWEEN its raw rate and the prior
    p0_ppm = tx * 1_000_000 // tn
    for _, _, _, raw, shrunk in got:
        lo, hi = sorted((raw, p0_ppm))
        assert lo - 1 <= shrunk <= hi + 1
