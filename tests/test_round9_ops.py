"""Round-9 behavior tests: pure-Python replays of the WEIGHTED
co-purchase tier. Same rationale as test_round8_ops — the tier hangs
off one shared weighted-graph builder and the eigenvector op is
iterative, so each gets an engine-independent replay straight off the
parquet rows (the oracle hash gate alone cannot catch a wrong fixpoint
mirrored into both engines)."""

from __future__ import annotations

from collections import Counter, defaultdict
from itertools import combinations

from tests._roundlib import DCAP, MINSUP, SF_DIR, capped_wgraph as _capped_wgraph  # noqa: E501 — shared round scaffolding


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
