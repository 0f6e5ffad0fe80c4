"""Round-10 operator behaviors beyond the oracle hash-match: the
VARIANT extraction path, CBO statistics, and (below, as the round
grows) the weighted-graph completions."""

from __future__ import annotations

from collections import Counter, defaultdict
from itertools import combinations

from pyspark.sql import functions as F

from ai_etl_studio_spark.operators import load_all
from tests.conftest import SF_DIR

QUERIES, ORACLES = load_all()


class TestVariantProps:
    def test_props_variant_profile_matches_string_parse_path(self, spark):
        """The VARIANT path and the from_json string path must agree on
        the integer key's range — two extraction stacks, one truth."""
        got = {
            r.event_type: (r.n_events, r.n_with_k, r.min_k, r.max_k)
            for r in QUERIES["props_variant_profile"](spark, SF_DIR).collect()
        }
        assert len(got) == 5
        for et, (n, nk, lo, hi) in got.items():
            assert n == nk, et  # every event carries $.k in testdata
            assert 0 <= lo <= hi <= 99, et

    def test_variant_aggregated_schema_is_typed(self, spark):
        """schema_of_variant_agg proves the encoded values carry TYPED
        fields (BIGINT k), i.e. parse_json shredded the JSON into the
        binary form — not strings all the way down."""
        from ai_etl_studio_spark.catalog import load_table

        e = load_table(spark, SF_DIR, "events")
        s = e.select(
            F.schema_of_variant_agg(
                F.parse_json(F.col("props"))
            ).alias("s")
        ).collect()[0]["s"]
        assert s == "OBJECT<k: BIGINT>"

    def test_variant_get_is_null_safe_on_missing_path(self, spark):
        """variant_get on an absent path yields NULL (not an error) —
        the semi-structured contract downstream profiles rely on."""
        df = spark.createDataFrame([('{"k": 1}',), ("{}",)], "props string")
        vals = [
            r.x
            for r in df.select(
                F.variant_get(
                    F.parse_json(F.col("props")), "$.missing", "bigint"
                ).alias("x")
            ).collect()
        ]
        assert vals == [None, None]


from tests._roundlib import DCAP, MINSUP, capped_wgraph as _capped_wgraph  # noqa: E501 — shared round scaffolding


class TestWeightedGraphCompletion:
    def test_score_core_peeling_replay_and_convergence(self, spark):
        """Python s-core peeling to the TRUE fixpoint (no round cap)
        must equal the operator — which proves the 12-round oracle cap
        is past convergence at this SF — and the exact percentile_disc
        thresholds must match."""
        ew, adjw = _capped_wgraph(spark)
        st = {u: sum(nb.values()) for u, nb in adjw.items()}
        n = len(st)
        svals = sorted(st.values())
        t_of = {25: svals[(n + 3) // 4 - 1], 50: svals[(n + 1) // 2 - 1]}
        got = {
            r["q"]: (
                r["threshold_cents"],
                r["n_core_nodes"],
                r["n_core_edges"],
                r["core_strength_cents"],
            )
            for r in QUERIES["copurchase_weighted_score_summary"](
                spark, SF_DIR
            ).collect()
        }
        for q, t in t_of.items():
            alive = set(adjw)
            rounds = 0
            while True:
                rounds += 1
                nxt = {
                    u
                    for u in alive
                    if sum(
                        wt for v, wt in adjw[u].items() if v in alive
                    )
                    >= t
                }
                if nxt == alive:
                    break
                alive = nxt
            assert rounds <= 12, "oracle round cap too low for this corpus"
            core = {
                (a, b): wt
                for (a, b), wt in ew.items()
                if a in alive and b in alive
            }
            assert got[q] == (t, len(alive), len(core), sum(core.values())), q

    def test_community_label_propagation_replay(self, spark):
        """Re-walk the exact 4-round synchronous strength-weighted
        label propagation (argmax by total edge strength, ties to the
        smallest label) and compare the community summary."""
        ew, adjw = _capped_wgraph(spark)
        lab = {u: u for u in adjw}
        for _ in range(4):
            nxt = {}
            for u, nb in adjw.items():
                tw: Counter = Counter()
                for v, wt in nb.items():
                    tw[lab[v]] += wt
                nxt[u] = min(
                    (l for l in tw), key=lambda l: (-tw[l], l)
                )
            lab = nxt
        n_nodes: Counter = Counter(lab.values())
        n_edges: Counter = Counter()
        strength: Counter = Counter()
        for (a, b), wt in ew.items():
            if lab[a] == lab[b]:
                n_edges[lab[a]] += 1
                strength[lab[a]] += wt
        want = sorted(
            (
                (-n, l, n_edges.get(l, 0), strength.get(l, 0))
                for l, n in n_nodes.items()
            )
        )[:10]
        got = [
            (
                -r["n_nodes"],
                r["community_id"],
                r["n_internal_edges"],
                r["internal_strength_cents"],
            )
            for r in QUERIES["copurchase_community_labels_topk"](
                spark, SF_DIR
            ).collect()
        ]
        assert got == want

    def test_weighted_graph_ops_are_broadcast_safe(self, spark):
        from ai_etl_studio_spark.plans.tripwire import (
            broadcast_violations,
            checkpoint_audit,
        )

        for name in (
            "copurchase_weighted_score_summary",
            "copurchase_community_labels_topk",
        ):
            with checkpoint_audit() as audit:
                v = broadcast_violations(QUERIES[name](spark, SF_DIR))
            assert list(v) + audit.violations == [], name


class TestBradleyTerry:
    def test_mm_integer_trajectory_replay(self, spark):
        """Re-walk the 10-round integer-quantized MM update in pure
        Python: wins from exact-cents head-to-heads, nano-tick pair
        terms, half-up integer divisions, mean-1e6 renormalization."""
        rows = (
            spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
            .select("l_orderkey", "l_partkey", "l_extendedprice")
            .collect()
        )
        brand = {
            r.p_partkey: r.p_brand
            for r in spark.read.parquet(f"{SF_DIR}/part.parquet")
            .select("p_partkey", "p_brand")
            .collect()
        }
        ob: dict = defaultdict(int)
        for r in rows:
            ob[(r.l_orderkey, brand[r.l_partkey])] += int(
                r.l_extendedprice * 100 + 0.5
            )
        per_order: dict = defaultdict(dict)
        for (o, b), cents in ob.items():
            per_order[o][b] = cents
        w: Counter = Counter()
        for bs_ in per_order.values():
            items = list(bs_.items())
            for ai in range(len(items)):
                for bi in range(len(items)):
                    if ai != bi and items[ai][1] > items[bi][1]:
                        w[(items[ai][0], items[bi][0])] += 1
        n: Counter = Counter()
        for (i, j), wij in w.items():
            n[(i, j)] += wij
            n[(j, i)] += wij
        wtot: Counter = Counter()
        ntot: Counter = Counter()
        for (i, j), v in n.items():
            ntot[i] += v
        for (i, j), v in w.items():
            wtot[i] += v
        bs = sorted(
            b for b in ntot if wtot[b] > 0 and ntot[b] > wtot[b]
        )
        K = len(bs) * 1_000_000
        pi = {b: 1_000_000 for b in bs}

        def hdiv(a, b):
            return (2 * a + b) // (2 * b)

        for _ in range(10):
            pre = {}
            for i in bs:
                d = sum(
                    hdiv(n[(i, j)] * 1_000_000_000, pi[i] + pi[j])
                    for j in bs
                    if n[(i, j)] > 0
                )
                pre[i] = hdiv(wtot[i] * 10**15, d)
            s = sum(pre.values())
            pi = {i: hdiv(pre[i] * K, s) for i in bs}
        want = sorted(((-p, b) for b, p in pi.items()))[:10]
        got = [
            (-r["bt_score_micro"], r["brand"])
            for r in QUERIES["bradley_terry_brand_ranks"](
                spark, SF_DIR
            ).collect()
        ]
        assert got == want


class TestHitsBrandAuthority:
    def test_hits_integer_trajectory_replay(self, spark):
        """Re-walk the 10 double-steps of the reference-normalized
        integer power iteration on the customer-brand Gram operator."""
        li = (
            spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
            .select("l_orderkey", "l_partkey")
            .collect()
        )
        cust = {
            r.o_orderkey: r.o_custkey
            for r in spark.read.parquet(f"{SF_DIR}/orders.parquet")
            .select("o_orderkey", "o_custkey")
            .collect()
        }
        brand = {
            r.p_partkey: r.p_brand
            for r in spark.read.parquet(f"{SF_DIR}/part.parquet")
            .select("p_partkey", "p_brand")
            .collect()
        }
        ed = {(cust[r.l_orderkey], brand[r.l_partkey]) for r in li}
        by_c: dict = defaultdict(set)
        by_b: dict = defaultdict(set)
        for c, b in ed:
            by_c[c].add(b)
            by_b[b].add(c)
        ref = min(sorted(by_b), key=lambda b: (-len(by_b[b]), b))
        a = {b: 1_000_000 for b in by_b}
        for _ in range(10):
            h = {c: sum(a[b] for b in bs_) for c, bs_ in by_c.items()}
            raw = {b: sum(h[c] for c in cs) for b, cs in by_b.items()}
            rv = raw[ref]
            a = {b: (2 * v * 1_000_000 + rv) // (2 * rv) for b, v in raw.items()}
        want = sorted(((-v, b) for b, v in a.items()))[:10]
        got = [
            (-r["authority_micro"], r["brand"])
            for r in QUERIES["hits_brand_authority_topk"](
                spark, SF_DIR
            ).collect()
        ]
        assert got == want


class TestTwoSampleShelf:
    """r10: Cliff's delta / Lepage / ordinal-association — third-
    algorithm replays over the raw rows (no value-grain grouping, no
    SQL), pinning both engines from outside."""

    def _delays(self, spark):
        from ai_etl_studio_spark.operators.drift import _delay_grain

        rows = _delay_grain(spark, SF_DIR).collect()
        by_pr = defaultdict(list)
        for r in rows:
            by_pr[r.pr].extend([r.v] * r.c)
        return by_pr

    def test_cliffs_delta_brute_force_replay(self, spark):
        import bisect

        by_pr = self._delays(spark)
        x = sorted(by_pr["1-URGENT"])
        y = sorted(by_pr["5-LOW"])
        gt = sum(bisect.bisect_left(y, xi) for xi in x)
        lt = sum(len(y) - bisect.bisect_right(y, xi) for xi in x)
        tie = sum(
            bisect.bisect_right(y, xi) - bisect.bisect_left(y, xi)
            for xi in x
        )
        got = QUERIES["cliffs_delta_delay"](spark, SF_DIR).collect()[0]
        assert (got.gt_pairs, got.lt_pairs, got.tie_pairs) == (gt, lt, tie)
        assert got.n_urgent == len(x) and got.n_low == len(y)
        assert got.cliffs_delta_micro == round(
            (gt - lt) / (len(x) * len(y)) * 1e6
        )

    def test_lepage_components_replay_midranks(self, spark):
        """Literal midrank Wilcoxon + literal from-both-ends Ansari
        scores over the pooled sorted sample must reproduce both
        z-components (to the micro quantum)."""
        by_pr = self._delays(spark)
        x, y = by_pr["1-URGENT"], by_pr["5-LOW"]
        pooled = sorted([(v, 0) for v in x] + [(v, 1) for v in y])
        n = len(pooled)
        # midranks (1-based) per tie group; AB scores from both ends
        i = 0
        w2 = 0  # 2 * wilcoxon rank sum of group x
        ab = 0.0  # per-tie-group quantized AB sum for x (micro)
        s1 = 0
        s2_milli = 0
        ties3 = 0
        while i < n:
            j = i
            while j < n and pooled[j][0] == pooled[i][0]:
                j += 1
            lo, hi, c = i + 1, j, j - i
            ca = sum(1 for k in range(i, j) if pooled[k][1] == 0)
            w2 += ca * (lo + hi)
            rs = sum(min(r, n + 1 - r) for r in range(lo, hi + 1))
            ab += round(ca * rs / c * 1e6)
            s1 += rs
            s2_milli += round(rs * rs / c * 1e3)
            ties3 += c**3 - c
            i = j
        m = len(x)
        import math

        ew2 = m * (n + 1)
        var_w = m * (n - m) * (n + 1) / 12 - m * (n - m) * ties3 / (
            12 * n * (n - 1)
        )
        zw = (w2 - ew2) / (2 * math.sqrt(var_w))
        ab_f = ab / 1e6
        zab = (ab_f - m * s1 / n) / math.sqrt(
            m * (n - m) / (n - 1) * (s2_milli / 1e3 / n - s1 * s1 / n / n)
        )
        got = QUERIES["lepage_delay_location_scale"](spark, SF_DIR).collect()[
            0
        ]
        assert abs(got.zw_micro - round(zw * 1e6)) <= 1
        assert abs(got.zab_micro - round(zab * 1e6)) <= 1
        assert abs(got.lepage_milli - round((zw**2 + zab**2) * 1e3)) <= 1

    def test_ordinal_association_brute_force_replay(self, spark):
        """Enumerate concordant/discordant pairs from the literal 5x4
        grid (priority x exact pooled-delay quartile band)."""
        by_pr = self._delays(spark)
        pooled = sorted(v for vs in by_pr.values() for v in vs)
        n = len(pooled)
        import math

        def disc_quart(p):
            return pooled[math.ceil(p * n) - 1]

        t1, t2, t3 = disc_quart(0.25), disc_quart(0.5), disc_quart(0.75)
        grid = Counter()
        for pr, vs in by_pr.items():
            for v in vs:
                band = 1 + (v > t1) + (v > t2) + (v > t3)
                grid[(pr, band)] += 1
        cells = list(grid.items())
        C = D = 0
        for (pa, ba), na in cells:
            for (pb, bb), nb in cells:
                if pa < pb and ba < bb:
                    C += na * nb
                elif pa < pb and ba > bb:
                    D += na * nb
        got = QUERIES["ordinal_association_priority_delay"](
            spark, SF_DIR
        ).collect()[0]
        assert (got.concordant_pairs, got.discordant_pairs) == (C, D)
        r2 = sum(
            r * (r - 1)
            for r in Counter(
                {pr: len(vs) for pr, vs in by_pr.items()}
            ).values()
        )
        c2m_vals = Counter()
        for (pr, band), cnt in grid.items():
            c2m_vals[band] += cnt
        c2m = sum(cc * (cc - 1) for cc in c2m_vals.values())
        assert got.gamma_micro == round((C - D) / (C + D) * 1e6)
        assert got.tau_b_micro == round(
            2 * (C - D) / math.sqrt((n * (n - 1) - r2) * (n * (n - 1) - c2m)) * 1e6
        )
        assert got.tau_c_micro == round(
            2 * 4 * (C - D) / (n * n * 3) * 1e6
        )
        assert got.somers_d_micro == round(
            2 * (C - D) / (n * (n - 1) - r2) * 1e6
        )


class TestCalibrationShelf:
    """r10: HL / Spiegelhalter / Youden — brute-force replays from the
    raw (score_ppm, y) pairs."""

    def _pairs(self, spark):
        from ai_etl_studio_spark.operators.quality import _score_gate

        return [
            (r.score_ppm, r.y)
            for r in _score_gate(spark, SF_DIR).collect()
        ]

    def test_hosmer_lemeshow_replay(self, spark):
        pairs = sorted(self._pairs(spark))
        n = len(pairs)
        # same one-sided tie convention: a distinct score's whole group
        # goes to the bin of its inclusive cumulative position
        from collections import Counter

        vc = Counter(s for s, _ in pairs)
        cum, bin_of = 0, {}
        for s in sorted(vc):
            cum += vc[s]
            bin_of[s] = min((cum - 1) * 10 // n, 9)
        agg = defaultdict(lambda: [0, 0, 0])  # ng, og, e_ppm
        for s, y in pairs:
            g = agg[bin_of[s]]
            g[0] += 1
            g[1] += y
            g[2] += s
        hl = 0
        for ng, og, e_ppm in agg.values():
            if e_ppm in (0, ng * 1000000):
                continue
            e = e_ppm / 1e6
            hl += round((og - e) ** 2 / (e * (1 - e / ng)) * 1e3)
        got = QUERIES["hosmer_lemeshow_quality_score"](
            spark, SF_DIR
        ).collect()[0]
        assert got.n_docs == n and got.n_bins == len(agg)
        assert got.hl_milli == hl

    def test_spiegelhalter_z_replay(self, spark):
        import math

        pairs = self._pairs(spark)
        num = sum(
            (y * 10**6 - s) * (10**6 - 2 * s) for s, y in pairs
        )
        den = sum(
            (10**6 - 2 * s) ** 2 * s * (10**6 - s) for s, _ in pairs
        )
        z = (num / 1e12) / math.sqrt(den / 1e24)
        got = QUERIES["spiegelhalter_z_quality_score"](
            spark, SF_DIR
        ).collect()[0]
        assert got.n_docs == len(pairs)
        assert abs(got.spiegelhalter_z_micro - round(z * 1e6)) <= 1

    def test_youden_argmax_is_integer_exact(self, spark):
        pairs = self._pairs(spark)
        p = sum(y for _, y in pairs)
        neg = len(pairs) - p
        best = None
        for t in sorted({s for s, _ in pairs}):
            tp = sum(1 for s, y in pairs if s >= t and y == 1)
            fp = sum(1 for s, y in pairs if s >= t and y == 0)
            key = (tp * neg - fp * p, -t)
            if best is None or key > best[0]:
                best = (key, t, tp, fp)
        got = QUERIES["youden_threshold_quality_score"](
            spark, SF_DIR
        ).collect()[0]
        assert (got.threshold_ppm, got.tp, got.fp) == (
            best[1],
            best[2],
            best[3],
        )
        assert got.fn == p - best[2] and got.tn == neg - best[3]


class TestEconOpsShelf:
    """r10: elementary indices / Syntetos-Boylan / Taylor law."""

    def test_elementary_index_inequalities_and_replay(self, spark):
        """Carli >= Jevons (AM-GM over the same relatives), and all
        three match a brute-force replay from per-part unit prices."""
        import math

        from ai_etl_studio_spark.catalog import load_table
        from ai_etl_studio_spark.operators.analytics import (
            _WALSH_Y0,
            _WALSH_Y1,
        )

        li = load_table(spark, SF_DIR, "lineitem").select(
            F.year(F.col("l_shipdate").cast("date")).alias("y"),
            "l_partkey",
            F.round("l_quantity").cast("bigint").alias("q"),
            F.round(F.col("l_extendedprice") * 100, 0)
            .cast("bigint")
            .alias("r"),
        ).collect()
        agg = defaultdict(lambda: [0, 0])
        for row in li:
            if row.y in (_WALSH_Y0, _WALSH_Y1):
                a = agg[(row.y, row.l_partkey)]
                a[0] += row.q
                a[1] += row.r
        p0 = {
            k[1]: a[1] * 1000 // a[0]
            for k, a in agg.items()
            if k[0] == _WALSH_Y0 and a[0] > 0
        }
        p1 = {
            k[1]: a[1] * 1000 // a[0]
            for k, a in agg.items()
            if k[0] == _WALSH_Y1 and a[0] > 0
        }
        matched = sorted(set(p0) & set(p1))
        rels = [(2 * 10**6 * p1[k] + p0[k]) // (2 * p0[k]) for k in matched]
        n = len(matched)
        carli = (2 * sum(rels) + n) // (2 * n)
        sp1, sp0 = sum(p1[k] for k in matched), sum(p0[k] for k in matched)
        dutot = (2 * 10**6 * sp1 + sp0) // (2 * sp0)
        ln_sum = sum(
            round(math.log(p1[k] / p0[k]) * 1e9) for k in matched
        )
        jevons = round(math.exp(ln_sum / 1e9 / n) * 1e6)
        got = QUERIES["elementary_price_indices"](spark, SF_DIR).collect()[0]
        assert got.n_parts_matched == n
        assert got.carli_index_micro == carli
        assert got.dutot_index_micro == dutot
        assert abs(got.jevons_index_micro - jevons) <= 1
        assert got.carli_index_micro >= got.jevons_index_micro - 1

    def test_demand_classification_boundaries_are_integer(self, spark):
        """Every type's class must agree with a float recomputation
        AND with the integer cross-multiplied boundary forms."""
        rows = QUERIES["demand_classification_adi_cv2"](
            spark, SF_DIR
        ).collect()
        assert len(rows) >= 4  # the 6 part types, minus any no-demand
        for r in rows:
            adi = r.adi_micro / 1e6
            cv2 = r.cv2_micro / 1e6
            want = (
                "lumpy"
                if adi >= 1.32 and cv2 >= 0.49
                else "intermittent"
                if adi >= 1.32
                else "erratic"
                if cv2 >= 0.49
                else "smooth"
            )
            # micro-rounded floats can only disagree AT a knife edge;
            # away from one they must match the integer decision
            if abs(adi - 1.32) > 1e-5 and abs(cv2 - 0.49) > 1e-5:
                assert r.demand_class == want, r

    def test_taylor_law_slope_replay(self, spark):
        import math

        from ai_etl_studio_spark.catalog import load_table

        li = load_table(spark, SF_DIR, "lineitem")
        o = load_table(spark, SF_DIR, "orders")
        c = load_table(spark, SF_DIR, "customer")
        rows = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .groupBy(
                "c_nationkey",
                F.date_format(
                    F.col("o_orderdate").cast("date"), "yyyy-MM"
                ).alias("m"),
            )
            .agg(
                F.sum(F.round("l_quantity").cast("bigint")).alias("d")
            )
            .collect()
        )
        series = defaultdict(list)
        for r in rows:
            series[r.c_nationkey].append(r.d)
        pts = []
        for ds in series.values():
            nm, s, s2 = len(ds), sum(ds), sum(d * d for d in ds)
            if nm > 1 and nm * s2 > s * s:
                pts.append(
                    (
                        round(math.log(s / nm) * 1e6),
                        round(
                            math.log((nm * s2 - s * s) / (nm * nm)) * 1e6
                        ),
                    )
                )
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        got = QUERIES["taylors_power_law_nations"](spark, SF_DIR).collect()[
            0
        ]
        assert got.n_nations == n
        assert abs(got.slope_micro - round(slope * 1e6)) <= 1
        # demand aggregation is bursty, not Poisson: b should exceed 1
        assert got.slope_micro > 1_000_000


class TestWeibullMleScripting:
    def test_newton_trajectory_replay(self, spark):
        """Pure-Python replay of the 8 quantized Newton steps over the
        same (gap, count) grain — pins Spark scripting AND the
        unrolled-CTE oracle from outside SQL."""
        import math

        from ai_etl_studio_spark.catalog import load_table
        from pyspark.sql import Window

        o = load_table(spark, SF_DIR, "orders")
        w = Window.partitionBy("o_custkey").orderBy(
            "o_orderdate", "o_orderkey"
        )
        rows = (
            o.select(
                F.datediff(
                    F.col("o_orderdate").cast("date"),
                    F.lag(F.col("o_orderdate").cast("date")).over(w),
                ).alias("gap")
            )
            .filter(F.col("gap").isNotNull() & (F.col("gap") > 0))
            .groupBy("gap")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        vg = [(r.gap, r.c) for r in rows]
        n = sum(c for _, c in vg)
        sln = sum(round(c * math.log(v) * 1e6) for v, c in vg)
        k_micro = 1_000_000
        for _ in range(8):
            k = k_micro / 1e6
            t1 = sum(round(c * v**k * 1e6) for v, c in vg)
            t2 = sum(round(c * v**k * math.log(v) * 1e6) for v, c in vg)
            t3 = sum(
                round(c * v**k * math.log(v) ** 2 * 1e6) for v, c in vg
            )
            g = t2 / t1 - 1 / k - sln / 1e6 / n
            gp = (t3 / t1 - (t2 / t1) ** 2) + 1 / (k * k)
            k_micro = round((k - g / gp) * 1e6)
        k = k_micro / 1e6
        t1 = sum(round(c * v**k * 1e6) for v, c in vg)
        lam_milli = round((t1 / 1e6 / n) ** (1 / k) * 1e3)
        got = QUERIES["weibull_mle_scripting"](spark, SF_DIR).collect()[0]
        assert got.n_gaps == n
        assert got.shape_mle_micro == k_micro
        assert abs(got.scale_days_milli - lam_milli) <= 1
        # the MLE and the regression estimator must be in the same
        # ballpark (they estimate the same shape)
        reg = QUERIES["weibull_shape_reorder"](spark, SF_DIR).collect()[0]
        assert abs(reg.shape_micro - got.shape_mle_micro) < 500_000


class TestSurvivalAndBlockedRanks:
    def test_gehan_numerator_is_exact_and_early_weighted(self, spark):
        """The Gehan O-E numerator must equal the cells-level integer
        identity Sum((n1+n2)*d1 - (d1+d2)*n1), and weighting by risk-set
        size must differ from log-rank's unweighted z."""
        from ai_etl_studio_spark.operators.drift import _reorder_surv_cells

        cells = [
            r
            for r in _reorder_surv_cells(spark, SF_DIR).collect()
            if r.n1 + r.n2 > 1
        ]
        oe = sum((r.n1 + r.n2) * r.d1 - (r.d1 + r.d2) * r.n1 for r in cells)
        got = QUERIES["gehan_wilcoxon_reorder"](spark, SF_DIR).collect()[0]
        assert got.oe_exact == oe
        assert got.n_times == len(cells)
        lr = QUERIES["log_rank_reorder_segments"](spark, SF_DIR).collect()[0]
        assert got.z_micro != lr.z_micro  # different weightings

    def test_quade_replay(self, spark):
        """Brute-force Quade from the (year, priority, exact-cents)
        cells: within-year ranks, range-rank block weights, integer F."""
        from ai_etl_studio_spark.catalog import load_table

        rows = (
            load_table(spark, SF_DIR, "orders")
            .groupBy(
                F.year("o_orderdate").alias("yr"),
                F.col("o_orderpriority").alias("p"),
            )
            .agg(
                F.sum(
                    F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
                ).alias("rev")
            )
            .collect()
        )
        by_yr = defaultdict(dict)
        for r in rows:
            by_yr[r.yr][r.p] = r.rev
        qs = {
            yr: i + 1
            for i, (yr, _) in enumerate(
                sorted(
                    by_yr.items(),
                    key=lambda kv: (max(kv[1].values()) - min(kv[1].values()), kv[0]),
                )
            )
        }
        prios = sorted(next(iter(by_yr.values())))
        sij = {}
        for yr, cells in by_yr.items():
            ranked = sorted(cells.items(), key=lambda kv: (kv[1], kv[0]))
            for rk, (p, _) in enumerate(ranked, 1):
                sij[(yr, p)] = qs[yr] * (rk - 3)
        a2 = sum(v * v for v in sij.values())
        s_i = {
            p: sum(v for (yr, pp), v in sij.items() if pp == p)
            for p in prios
        }
        bnum = sum(v * v for v in s_i.values())
        b = len(by_yr)
        f_micro = (2 * (b - 1) * bnum * 10**6 + (b * a2 - bnum)) // (
            2 * (b * a2 - bnum)
        )
        got = QUERIES["quade_test_priority_by_year"](spark, SF_DIR).collect()[
            0
        ]
        assert got.b == b
        assert got.quade_f_micro == f_micro
        for i, p in enumerate(sorted(s_i)):
            assert got[f"s_{i}"] == s_i[p]


class TestForecastAndRetrieval:
    def test_damped_trend_trajectory_replay(self, spark):
        """Pure-Python walk of the quantized damped-trend recursion."""
        from ai_etl_studio_spark.catalog import load_table

        rows = (
            load_table(spark, SF_DIR, "orders")
            .groupBy(F.col("o_orderdate").cast("date").alias("d"))
            .agg(
                F.sum(
                    F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
                ).alias("x")
            )
            .orderBy("d")
            .collect()
        )
        ys = [r.x for r in rows]

        def rnd(v):  # HALF_UP like both engines' round(x, 0)
            import math

            return int(math.floor(v + 0.5)) if v >= 0 else int(
                math.ceil(v - 0.5)
            )

        l, b = ys[0], ys[1] - ys[0]
        for x in ys[2:]:
            pb = rnd(0.9 * b)
            lnew = rnd(0.3 * x + 0.7 * (l + pb))
            b = rnd(0.1 * (lnew - l) + 0.9 * pb)
            l = lnew
        got = QUERIES["damped_trend_forecast_daily"](spark, SF_DIR).collect()[
            0
        ]
        assert got.n_days == len(ys)
        assert (got.level_cents, got.trend_cents) == (l, b)
        assert got.forecast_1_cents == l + rnd(0.9 * b)
        phi7 = sum(0.9**i for i in range(1, 8))
        assert got.forecast_7_cents == l + rnd(phi7 * b)
        # damping: the 7-day extrapolation is strictly inside plain
        # Holt's l + 7b whenever b != 0
        if b != 0:
            assert abs(got.forecast_7_cents - l) < abs(7 * b)

    def test_dirichlet_lm_scores_every_doc_and_ranks_matches_first(
        self, spark
    ):
        """Smoothing scores zero-match docs too (by length); docs
        actually containing query terms must outrank same-length docs
        without them."""
        from ai_etl_studio_spark.operators.search import QUERY_TERMS

        top = QUERIES["dirichlet_lm_search"](spark, SF_DIR).collect()
        assert len(top) == 20
        assert all(
            top[i].score_ticks >= top[i + 1].score_ticks
            for i in range(len(top) - 1)
        )
        from ai_etl_studio_spark.catalog import load_table

        d = load_table(spark, SF_DIR, "documents")
        toks = F.split(F.lower("text"), r"\s+")
        hits = {
            r.doc_id
            for r in d.select(
                "doc_id",
                F.size(
                    F.filter(
                        toks, lambda x: x.isin(*QUERY_TERMS)
                    )
                ).alias("m"),
            )
            .filter(F.col("m") > 0)
            .collect()
        }
        # every top-5 doc contains at least one query term
        assert all(r.doc_id in hits for r in top[:5])


class TestAssociationAndEffects:
    def test_categorical_suite_invariants(self, spark):
        """Directional U's share a numerator (mutual information);
        both in [0,1]; corrected V <= plain V; G2 ~ chi2 ballpark."""
        r = QUERIES["categorical_association_lang_source"](
            spark, SF_DIR
        ).collect()[0]
        assert 0 <= r.theil_u_lang_micro <= 1_000_000
        assert 0 <= r.theil_u_source_micro <= 1_000_000
        assert 0 <= r.cramers_v_corrected_micro <= r.cramers_v_micro + 1
        # same MI numerator: U_lang * H(lang) == U_source * H(source)
        # only up to quantization; check the ratio relationship loosely
        assert r.g2_micro >= 0 and r.chi2_micro >= 0

    def test_variance_explained_replay(self, spark):
        from ai_etl_studio_spark.operators.drift import _delay_grain

        rows = _delay_grain(spark, SF_DIR).collect()
        by_pr = defaultdict(list)
        for r in rows:
            by_pr[r.pr].extend([r.v] * r.c)
        n = sum(len(v) for v in by_pr.values())
        k = len(by_pr)
        s = sum(sum(v) for v in by_pr.values())
        q = sum(x * x for v in by_pr.values() for x in v)
        ssb_part = sum(
            round(sum(v) ** 2 / len(v) * 1e3) for v in by_pr.values()
        )
        ssb = ssb_part / 1e3 - s * s / n
        ssw = q - ssb_part / 1e3
        sst = q - s * s / n
        got = QUERIES["variance_explained_priority_delay"](
            spark, SF_DIR
        ).collect()[0]
        assert (got.n, got.k) == (n, k)
        assert abs(got.eta2_micro - round(ssb / sst * 1e6)) <= 1
        msw = ssw / (n - k)
        assert (
            abs(got.epsilon2_micro - round((ssb - (k - 1) * msw) / sst * 1e6))
            <= 1
        )
        assert (
            abs(
                got.omega2_micro
                - round((ssb - (k - 1) * msw) / (sst + msw) * 1e6)
            )
            <= 1
        )
        # bias corrections shrink: omega2 <= epsilon2 <= eta2
        assert got.omega2_micro <= got.epsilon2_micro <= got.eta2_micro


class TestFanoFactor:
    def test_fano_replay_including_empty_windows(self, spark):
        from ai_etl_studio_spark.catalog import load_table

        ts = [
            r.t
            for r in load_table(spark, SF_DIR, "events")
            .select(
                F.unix_micros(F.col("ts").cast("timestamp")).alias("t")
            )
            .collect()
        ]
        t0, t1, n = min(ts), max(ts), len(ts)
        got = {
            r.window_seconds: r
            for r in QUERIES["fano_factor_event_windows"](
                spark, SF_DIR
            ).collect()
        }
        for w in (3600, 21600, 86400):
            width = w * 1_000_000
            counts = Counter((t - t0) // width for t in ts)
            nw = (t1 - t0) // width + 1
            q = sum(c * c for c in counts.values())
            fano = (q - n * n / nw) / n
            r = got[w]
            assert r.n_windows == nw and r.n_events == n
            assert abs(r.fano_micro - round(fano * 1e6)) <= 1
        # burst correlation grows with scale on this synthetic stream
        # (weaker claim: all three are positive and finite)
        assert all(r.fano_micro > 0 for r in got.values())


class TestSurvivalAreaAndChangepoints:
    def test_rmst_replay(self, spark):
        """Brute-force KM integral per group from the cells frame."""
        import math

        from ai_etl_studio_spark.operators.drift import (
            _RMST_TAU,
            _RMST_TICK,
            _reorder_surv_cells,
        )

        cells = sorted(
            _reorder_surv_cells(spark, SF_DIR).collect(),
            key=lambda r: r.tt,
        )
        got = {
            r.segment_group: r
            for r in QUERIES["rmst_reorder_segments"](
                spark, SF_DIR
            ).collect()
        }
        for g, nk, dk in ((1, "n1", "d1"), (0, "n2", "d2")):
            steps = [
                (r.tt, r[nk], r[dk]) for r in cells if r[dk] > 0
            ]
            cum = 0
            area = 10**6 * min(steps[0][0], _RMST_TAU)
            for j, (tt, n_at, d) in enumerate(steps):
                cum += (
                    round(math.log(1 - d / n_at) * _RMST_TICK)
                    if d < n_at
                    else -90 * _RMST_TICK
                )
                s_micro = round(math.exp(cum / _RMST_TICK) * 1e6)
                t_next = (
                    steps[j + 1][0] if j + 1 < len(steps) else _RMST_TAU
                )
                area += s_micro * (
                    min(t_next, _RMST_TAU) - min(tt, _RMST_TAU)
                )
            r = got[g]
            assert r[f"rmst{_RMST_TAU}_day_micro"] == area
            assert r.n_events == sum(d for _, _, d in steps)
        # both RMSTs are within (0, tau) days
        for r in got.values():
            assert 0 < r[f"rmst{_RMST_TAU}_day_micro"] < _RMST_TAU * 10**6

    def test_binary_segmentation_replay(self, spark):
        from ai_etl_studio_spark.catalog import load_table

        rows = (
            load_table(spark, SF_DIR, "orders")
            .groupBy(F.col("o_orderdate").cast("date").alias("day"))
            .agg(
                F.sum(
                    F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
                ).alias("x")
            )
            .orderBy("day")
            .collect()
        )
        xs = [r.x for r in rows]
        ps = [0]
        for x in xs:
            ps.append(ps[-1] + x)
        n = len(xs)

        def argmax(lo, hi):
            best = None
            slo, shi = ps[lo], ps[hi]
            for k in range(lo + 1, hi):
                t = round(
                    (
                        (ps[k] - slo) ** 2 / (k - lo)
                        + (shi - ps[k]) ** 2 / (hi - k)
                        - (shi - slo) ** 2 / (hi - lo)
                    )
                    / 1e6
                )
                key = (t, -k)
                if best is None or key > best[0]:
                    best = (key, k)
            return best[1], best[0][0]

        k0, t0 = argmax(0, n)
        k1, t1 = argmax(0, k0)
        k2, t2 = argmax(k0, n)
        got = {
            r.segment: r
            for r in QUERIES["binary_segmentation_daily_revenue"](
                spark, SF_DIR
            ).collect()
        }
        assert (got["root"].split_index, got["root"].t_milli) == (k0, t0)
        assert (got["left"].split_index, got["left"].t_milli) == (k1, t1)
        assert (got["right"].split_index, got["right"].t_milli) == (k2, t2)
        # greedy, not optimal: a child's within-half gain may exceed
        # the root's whole-series gain, so no cross-level bound holds —
        # the exact-argmax equalities above are the invariant.


class TestApportionment:
    def test_hamilton_and_dhondt_replay(self, spark):
        from fractions import Fraction

        from ai_etl_studio_spark.catalog import load_table
        from ai_etl_studio_spark.operators.training import (
            _APPORTION_SHARDS as S,
        )

        inv = {
            r.source: r.n
            for r in load_table(spark, SF_DIR, "documents")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        nn = sum(inv.values())
        base = {src: S * n // nn for src, n in inv.items()}
        rem = {src: S * n - base[src] * nn for src, n in inv.items()}
        left = S - sum(base.values())
        ham = dict(base)
        for src in sorted(inv, key=lambda s: (-rem[s], s))[:left]:
            ham[src] += 1
        quots = sorted(
            (
                (Fraction(n, k), src)
                for src, n in inv.items()
                for k in range(1, S + 1)
            ),
            key=lambda t: (-t[0], t[1]),
        )[:S]
        dh = Counter(src for _, src in quots)
        got = {
            r.source: r
            for r in QUERIES["shard_apportionment_sources"](
                spark, SF_DIR
            ).collect()
        }
        assert sum(r.hamilton_shards for r in got.values()) == S
        assert sum(r.dhondt_shards for r in got.values()) == S
        for src, n in inv.items():
            assert got[src].n_docs == n
            assert got[src].hamilton_shards == ham[src], src
            assert got[src].dhondt_shards == dh.get(src, 0), src


class TestMultiplicityLadder:
    def test_holm_subset_hochberg_subset_bh(self, spark):
        """Severity nesting: Holm rejections ⊆ Hochberg ⊆ BH, and the
        Holm/Hochberg decisions replay exactly from the p-values."""
        hh = {
            r.nationkey: r
            for r in QUERIES["holm_hochberg_screening"](
                spark, SF_DIR
            ).collect()
        }
        bh = {
            r.nationkey: r.significant
            for r in QUERIES["fdr_bh_screening"](spark, SF_DIR).collect()
        }
        holm = {k for k, r in hh.items() if r.holm_significant}
        hoch = {k for k, r in hh.items() if r.hochberg_significant}
        bhs = {k for k, s in bh.items() if s}
        assert holm <= hoch <= bhs
        # exact replay of both step rules from (p_nano, rank)
        rows = sorted(hh.values(), key=lambda r: r.p_rank)
        m = len(rows)
        alpha = 50_000_000
        first_fail = next(
            (
                r.p_rank
                for r in rows
                if r.p_nano * (m - r.p_rank + 1) > alpha
            ),
            m + 1,
        )
        last_ok = max(
            (
                r.p_rank
                for r in rows
                if r.p_nano * (m - r.p_rank + 1) <= alpha
            ),
            default=0,
        )
        for r in rows:
            assert r.holm_significant == int(r.p_rank < first_fail)
            assert r.hochberg_significant == int(r.p_rank <= last_ok)


class TestPreMeasures:
    def test_lambda_replay(self, spark):
        from ai_etl_studio_spark.catalog import load_table

        rows = (
            load_table(spark, SF_DIR, "documents")
            .groupBy("lang", "source")
            .agg(F.count(F.lit(1)).alias("o"))
            .collect()
        )
        grid = {(r.lang, r.source): r.o for r in rows}
        n = sum(grid.values())
        rowsum = Counter()
        colsum = Counter()
        for (l, s), o in grid.items():
            rowsum[l] += o
            colsum[s] += o
        mr, mc = max(rowsum.values()), max(colsum.values())
        sum_col_max = sum(
            max(o for (l, s2), o in grid.items() if s2 == s)
            for s in colsum
        )
        sum_row_max = sum(
            max(o for (l2, s), o in grid.items() if l2 == l)
            for l in rowsum
        )
        got = QUERIES["goodman_kruskal_lambda_lang_source"](
            spark, SF_DIR
        ).collect()[0]
        assert got.n == n
        lam_l = (2 * 10**6 * (sum_col_max - mr) + (n - mr)) // (
            2 * (n - mr)
        )
        lam_s = (2 * 10**6 * (sum_row_max - mc) + (n - mc)) // (
            2 * (n - mc)
        )
        assert got.lambda_lang_micro == lam_l
        assert got.lambda_source_micro == lam_s

    def test_woe_iv_identities(self, spark):
        rows = QUERIES["woe_iv_gate_by_source"](spark, SF_DIR).collect()
        import math

        tg = sum(r.n_pass for r in rows)
        tb = sum(r.n_fail for r in rows)
        total = rows[0].total_iv_nano
        acc = 0
        for r in rows:
            if r.n_pass > 0 and r.n_fail > 0:
                woe = math.log((r.n_pass / tg) / (r.n_fail / tb))
                assert abs(r.woe_micro - round(woe * 1e6)) <= 1
                iv = (r.n_pass / tg - r.n_fail / tb) * woe
                assert abs(r.iv_nano - round(iv * 1e9)) <= 1
                acc += r.iv_nano
                # IV terms are individually nonnegative
                assert r.iv_nano >= 0
            else:
                assert r.woe_micro is None and r.iv_nano is None
        assert acc == total


class TestCircularAndAllan:
    def test_kuiper_replay(self, spark):
        from ai_etl_studio_spark.catalog import load_table

        rows = (
            load_table(spark, SF_DIR, "orders")
            .select(
                F.dayofweek(F.col("o_orderdate").cast("date")).alias("dow")
            )
            .groupBy("dow")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy("dow")
            .collect()
        )
        n = sum(r.c for r in rows)
        cum = 0
        dplus7n = dminus7n = -(10**18)
        for i, r in enumerate(rows, 1):
            prev = cum
            cum += r.c
            dplus7n = max(dplus7n, 7 * cum - i * n)
            dminus7n = max(dminus7n, i * n - 7 * prev)
        got = QUERIES["kuiper_dow_uniformity"](spark, SF_DIR).collect()[0]
        assert got.n_orders == n
        v = (2 * 10**6 * (dplus7n + dminus7n) + 7 * n) // (2 * 7 * n)
        assert got.kuiper_v_micro == v
        # V >= KS's max(D+, D-) by construction
        assert dplus7n + dminus7n >= max(dplus7n, dminus7n)

    def test_allan_replay_and_fano_contrast(self, spark):
        from ai_etl_studio_spark.catalog import load_table

        ts = [
            r.t
            for r in load_table(spark, SF_DIR, "events")
            .select(
                F.unix_micros(F.col("ts").cast("timestamp")).alias("t")
            )
            .collect()
        ]
        t0, t1, n = min(ts), max(ts), len(ts)
        got = {
            r.window_seconds: r
            for r in QUERIES["allan_variance_event_counts"](
                spark, SF_DIR
            ).collect()
        }
        for w in (3600, 21600, 86400):
            width = w * 1_000_000
            nw = (t1 - t0) // width + 1
            counts = Counter((t - t0) // width for t in ts)
            series = [counts.get(b, 0) for b in range(nw)]
            q = sum(
                (series[i + 1] - series[i]) ** 2
                for i in range(len(series) - 1)
            )
            avar = q / 2 / (nw - 1)
            r = got[w]
            assert r.n_windows == nw and r.n_events == n
            assert abs(r.allan_var_milli - round(avar * 1e3)) <= 1
            assert abs(
                r.allan_factor_micro - round(avar / (n / nw) * 1e6)
            ) <= 1
