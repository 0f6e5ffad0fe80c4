"""Round-9 statistics: engine-independent validation of the closed
forms the new rank/trend tests rely on. The hash gate proves Spark ==
DuckDB; these prove the SHARED math is the textbook statistic (a wrong
closed form mirrored into both engines would hash-match) — the same
device as the Ansari-Bradley 200-trial property test."""

from __future__ import annotations

import math
import random
from collections import Counter
from itertools import permutations


def _st_ranks_literal(n):
    """Literal Siegel-Tukey process: ranks drawn in blocks bottom(1),
    top(2), bottom(2), top(2), ... from the ends inward."""
    ranks = {}
    lo, hi, r, take_bottom, k = 1, n, 1, True, 1
    while r <= n:
        for _ in range(min(k, n - r + 1)):
            if take_bottom:
                ranks[lo] = r
                lo += 1
            else:
                ranks[hi] = r
                hi -= 1
            r += 1
        take_bottom, k = not take_bottom, 2
    return [ranks[p] for p in range(1, n + 1)]


def _st_runsum_closed(lo, hi, nn):
    """Python mirror of drift._ST_RUNSUM_T (integer division)."""
    m = 2 * (nn // 4) + (0 if nn % 4 == 0 else 1)
    s = 0
    b = min(hi, m)
    if lo <= b:
        s += (lo + b) * (b - lo + 1) - ((b + 1) // 2 - lo // 2)
    t = max(lo, m + 1)
    if t <= hi:
        j1, j2 = nn + 1 - hi, nn + 1 - t
        s += (j1 + j2) * (j2 - j1 + 1) - (j2 // 2 - (j1 - 1) // 2)
    return s


def test_siegel_tukey_runsum_closed_form():
    rng = random.Random(9)
    for _ in range(5000):
        n = rng.randint(1, 60)
        lo = rng.randint(1, n)
        hi = rng.randint(lo, n)
        want = sum(_st_ranks_literal(n)[lo - 1 : hi])
        assert _st_runsum_closed(lo, hi, n) == want, (n, lo, hi)


def test_siegel_tukey_scores_are_permutation():
    for n in range(1, 120):
        assert sorted(_st_ranks_literal(n)) == list(range(1, n + 1))


def _jt2(groups):
    jt2 = 0
    for i in range(len(groups)):
        for j in range(i + 1, len(groups)):
            for a in groups[i]:
                for b in groups[j]:
                    jt2 += 2 if a < b else (1 if a == b else 0)
    return jt2


def _jt_moments(ns, tv, n):
    """Tie-corrected Hollander-Wolfe JT null moments — the exact text
    mirrored in the operator's SQL."""
    e = (n * n - sum(x * x for x in ns)) / 4
    a = (
        n * (n - 1) * (2 * n + 5)
        - sum(x * (x - 1) * (2 * x + 5) for x in ns)
        - sum(t * (t - 1) * (2 * t + 5) for t in tv.values())
    )
    b = sum(x * (x - 1) * (x - 2) for x in ns) * sum(
        t * (t - 1) * (t - 2) for t in tv.values()
    )
    c = sum(x * (x - 1) for x in ns) * sum(
        t * (t - 1) for t in tv.values()
    )
    var = (
        a / 72
        + b / (36 * n * (n - 1) * (n - 2))
        + c / (8 * n * (n - 1))
    )
    return e, var


def test_jonckheere_moments_exact_over_permutations():
    """E and Var formulas equal the exact permutation-null moments on
    random tie-heavy multisets (full enumeration, 3 groups of 2/2/3)."""
    rng = random.Random(5)
    for _ in range(15):
        vals = [rng.randint(1, 4) for _ in range(7)]
        stats = []
        for perm in permutations(range(7)):
            g = [
                [vals[i] for i in perm[:2]],
                [vals[i] for i in perm[2:4]],
                [vals[i] for i in perm[4:]],
            ]
            stats.append(_jt2(g) / 2)
        e, var = _jt_moments([2, 2, 3], Counter(vals), 7)
        em = sum(stats) / len(stats)
        ev = sum((s - em) ** 2 for s in stats) / len(stats)
        assert abs(e - em) < 1e-9
        assert abs(var - ev) < 1e-9


def _bm_literal(x, y):
    pooled = sorted(x + y)

    def midrank(v, arr):
        lo = sum(1 for a in arr if a < v)
        t = sum(1 for a in arr if a == v)
        return lo + (t + 1) / 2

    rx = [midrank(v, pooled) for v in x]
    ry = [midrank(v, pooled) for v in y]
    rxw = [midrank(v, x) for v in x]
    ryw = [midrank(v, y) for v in y]
    nx, ny = len(x), len(y)
    rbx, rby = sum(rx) / nx, sum(ry) / ny
    sx2 = sum(
        (rx[i] - rxw[i] - rbx + (nx + 1) / 2) ** 2 for i in range(nx)
    ) / (nx - 1)
    sy2 = sum(
        (ry[i] - ryw[i] - rby + (ny + 1) / 2) ** 2 for i in range(ny)
    ) / (ny - 1)
    den = (nx + ny) * math.sqrt(nx * sx2 + ny * sy2)
    w = nx * ny * (rby - rbx) / den if den else float("nan")
    return w, (rby - (ny + 1) / 2) / nx


def _bm_grain(x, y):
    """Count-grain integer rearrangement mirrored in the operator."""
    cx, cy = Counter(x), Counter(y)
    vals = sorted(set(x + y))
    nx, ny, n = len(x), len(y), len(x) + len(y)
    numx = numy = 0
    cum = 0
    for v in vals:
        tx, ty = cx.get(v, 0), cy.get(v, 0)
        r2 = 2 * cum + tx + ty + 1
        numx += tx * r2
        numy += ty * r2
        cum += tx + ty
    qx = qy = 0
    cumx = cumy = cum = 0
    for v in vals:
        tx, ty = cx.get(v, 0), cy.get(v, 0)
        r2 = 2 * cum + tx + ty + 1
        r2x = 2 * cumx + tx + 1
        r2y = 2 * cumy + ty + 1
        qx += tx * (nx * (r2 - r2x) - (numx - nx * (nx + 1))) ** 2
        qy += ty * (ny * (r2 - r2y) - (numy - ny * (ny + 1))) ** 2
        cum += tx + ty
        cumx += tx
        cumy += ty
    sx2 = qx / (4 * nx * nx * (nx - 1))
    sy2 = qy / (4 * ny * ny * (ny - 1))
    rbx, rby = numx / (2 * nx), numy / (2 * ny)
    den = n * math.sqrt(nx * sx2 + ny * sy2)
    w = nx * ny * (rby - rbx) / den if den else float("nan")
    return w, (rby - (ny + 1) / 2) / nx


def test_brunner_munzel_grain_matches_literal():
    rng = random.Random(11)
    checked = 0
    for _ in range(500):
        nx, ny = rng.randint(3, 12), rng.randint(3, 12)
        x = [rng.randint(0, 6) for _ in range(nx)]
        y = [rng.randint(0, 8) for _ in range(ny)]
        a, b = _bm_literal(x, y), _bm_grain(x, y)
        for u, v in zip(a, b):
            if math.isnan(u) and math.isnan(v):
                continue
            assert abs(u - v) < 1e-9, (x, y, a, b)
        checked += 1
    assert checked == 500


def test_st_runsum_sql_text_matches_python_mirror():
    """The SQL closed form (DuckDB dialect) evaluates identically to
    the Python mirror — catches a drift between the template string and
    the validated formula."""
    import duckdb

    from ai_etl_studio_spark.operators.drift import _ST_RUNSUM_DDB

    con = duckdb.connect()
    rng = random.Random(13)
    for _ in range(300):
        nn = rng.randint(1, 60)
        lo = rng.randint(1, nn)
        hi = rng.randint(lo, nn)
        got = con.execute(
            f"SELECT {_ST_RUNSUM_DDB} FROM (SELECT {lo} AS lo, {hi} AS hi,"
            f" {nn} AS nn)"
        ).fetchone()[0]
        assert got == _st_runsum_closed(lo, hi, nn), (nn, lo, hi)
