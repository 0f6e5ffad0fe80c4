"""Round-9 behavior tests: pure-Python replays of the WEIGHTED
co-purchase tier. Same rationale as test_round8_ops — the tier hangs
off one shared weighted-graph builder and the eigenvector op is
iterative, so each gets an engine-independent replay straight off the
parquet rows (the oracle hash gate alone cannot catch a wrong fixpoint
mirrored into both engines)."""

from __future__ import annotations

from collections import Counter, defaultdict
from itertools import combinations

from tests.conftest import SF_DIR

MINSUP = 2
DCAP = 48


def _capped_wgraph(spark):
    """The capped WEIGHTED co-purchase graph in pure Python: per
    (order, part) revenue cents, per-order pair fan-out with weight
    r_x + r_y, support >= MINSUP on pair count, then the UNWEIGHTED
    degree cap (same fence as the unweighted tier)."""
    rows = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_partkey", "l_extendedprice")
        .collect()
    )
    opr: dict = defaultdict(int)
    for r in rows:
        opr[(r.l_orderkey, r.l_partkey)] += int(
            r.l_extendedprice * 100 + 0.5
        )
    per_order: dict = defaultdict(dict)
    for (o, p), cents in opr.items():
        per_order[o][p] = cents
    sup: Counter = Counter()
    w: Counter = Counter()
    for parts in per_order.values():
        for a, b in combinations(sorted(parts), 2):
            sup[(a, b)] += 1
            w[(a, b)] += parts[a] + parts[b]
    e0 = {p for p, c in sup.items() if c >= MINSUP}
    deg0: Counter = Counter()
    for a, b in e0:
        deg0[a] += 1
        deg0[b] += 1
    keep = {u for u, d in deg0.items() if d <= DCAP}
    ew = {(a, b): w[(a, b)] for a, b in e0 if a in keep and b in keep}
    adjw: dict = defaultdict(dict)
    for (a, b), wt in ew.items():
        adjw[a][b] = wt
        adjw[b][a] = wt
    return ew, adjw


def test_strength_topk_replay(spark):
    from ai_etl_studio_spark.operators.insights import (
        copurchase_strength_topk,
    )

    _, adjw = _capped_wgraph(spark)
    st = {u: (len(nb), sum(nb.values())) for u, nb in adjw.items()}
    want = sorted(((-s, u, d) for u, (d, s) in st.items()))[:20]
    got = [
        (-r["strength_cents"], r["part_key"], r["degree"])
        for r in copurchase_strength_topk(spark, SF_DIR).collect()
    ]
    assert got == want


def test_strength_profile_replay(spark):
    from ai_etl_studio_spark.operators.insights import (
        copurchase_strength_profile,
    )

    _, adjw = _capped_wgraph(spark)
    per_k: dict = defaultdict(list)
    for u, nb in adjw.items():
        per_k[len(nb)].append(sum(nb.values()))
    want = {
        k: (len(v), sum(v), int(sum(v) / len(v) + 0.5))
        for k, v in per_k.items()
    }
    got = {
        r["degree"]: (
            r["n_nodes"],
            r["strength_cents"],
            r["avg_strength_cents"],
        )
        for r in copurchase_strength_profile(spark, SF_DIR).collect()
    }
    assert got == want


def test_weighted_eigenvector_trajectory_replay(spark):
    """Replay the 10-step quantized WEIGHTED power iteration: both
    engines and this replay must walk the same integer trajectory
    (per-step round-half-up micro renormalization with exact-cents
    edge weights)."""
    from ai_etl_studio_spark.operators.insights import (
        copurchase_weighted_eigenvector_topk,
    )

    _, adjw = _capped_wgraph(spark)
    x = {u: 1_000_000 for u in adjw}
    for _ in range(10):
        ns = {
            u: sum(wt * x[v] for v, wt in nb.items())
            for u, nb in adjw.items()
        }
        mx = max(ns.values())
        x = {u: int(1_000_000.0 * s / mx + 0.5) for u, s in ns.items()}
    want = sorted(((-s, u) for u, s in x.items()))[:20]
    got = [
        (-r["centrality_micro"], r["part_key"])
        for r in copurchase_weighted_eigenvector_topk(spark, SF_DIR).collect()
    ]
    assert got == want


def test_weighted_topology_equals_unweighted(spark):
    """The weight join must not add or drop edges: the weighted edge
    set's keys are exactly the unweighted capped edge set."""
    from ai_etl_studio_spark.operators.insights import (
        _copurchase_graph,
        _copurchase_wgraph,
    )

    e, _, _, _ = _copurchase_graph(spark, SF_DIR)
    ew, _, _ = _copurchase_wgraph(spark, SF_DIR)
    a = {(r.x, r.y) for r in e.collect()}
    b = {(r.x, r.y) for r in ew.select("x", "y").collect()}
    assert a == b
