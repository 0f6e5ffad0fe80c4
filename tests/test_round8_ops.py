"""Round-8 behavior tests: pure-Python replays of the co-purchase
graph tier on the real corpus. The CC and k-core operators are
ITERATIVE (label propagation / peeling), so per the house rule they
get an engine-independent replay — both engines share the same graph
CTE text and the hash gate cannot catch a wrong fixpoint mirrored
twice. The closed-form ops (jaccard / local cc / bridges) get replays
too because the whole tier hangs off one shared graph builder: a bug
in the builder would mirror into every oracle."""

from __future__ import annotations

from collections import Counter, defaultdict

from itertools import combinations

from tests._roundlib import DCAP, MINSUP, SF_DIR, capped_graph as _capped_graph


def test_graph_constants_match_operator_module():
    from ai_etl_studio_spark.operators.insights import _CP_DCAP, _CP_MINSUP

    assert (_CP_MINSUP, _CP_DCAP) == (MINSUP, DCAP)


def test_connected_components_union_find_replay(spark):
    """Union-find (a third algorithm: not propagation, not closure)
    must produce the same component-size histogram."""
    from ai_etl_studio_spark.operators.insights import (
        copurchase_connected_components,
    )

    edges, adj = _capped_graph(spark)
    parent: dict = {u: u for u in adj}

    def find(u):
        while parent[u] != u:
            parent[u] = parent[parent[u]]
            u = parent[u]
        return u

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    sizes = Counter(find(u) for u in adj)
    hist = Counter(sizes.values())
    got = {
        r["component_size"]: (r["n_components"], r["n_nodes"])
        for r in copurchase_connected_components(spark, SF_DIR).collect()
    }
    assert got == {s: (c, s * c) for s, c in hist.items()}


def test_kcore_peeling_replay_and_convergence(spark):
    """Python peeling to the true fixpoint (no round cap) must equal
    the operator, which proves the 12-round oracle cap is past
    convergence at this SF; the loop also pins that ONE more peel
    round changes nothing."""
    from ai_etl_studio_spark.operators.insights import copurchase_kcore_summary

    edges, adj = _capped_graph(spark)
    got = {
        r["k"]: (r["n_core_nodes"], r["n_core_edges"])
        for r in copurchase_kcore_summary(spark, SF_DIR).collect()
    }
    for k in (2, 3):
        alive = set(adj)
        rounds = 0
        while True:
            rounds += 1
            nxt = {
                u
                for u in alive
                if sum(1 for v in adj[u] if v in alive) >= k
            }
            if nxt == alive:
                break
            alive = nxt
        assert rounds <= 12, "oracle round cap too low for this corpus"
        core_edges = sum(1 for a, b in edges if a in alive and b in alive)
        assert got[k] == (len(alive), core_edges)


def test_jaccard_topk_replay(spark):
    from ai_etl_studio_spark.operators.insights import copurchase_jaccard_topk

    edges, adj = _capped_graph(spark)
    common: Counter = Counter()
    for m in adj:
        for x, y in combinations(sorted(adj[m]), 2):
            common[(x, y)] += 1
    scored = []
    for (x, y), nc in common.items():
        nu = len(adj[x]) + len(adj[y]) - nc
        jac = int((1_000_000.0 * nc / nu) + 0.5)  # round-half-up >= 0
        scored.append((-jac, x, y, nc, nu, 1 if (x, y) in edges else 0))
    scored.sort()
    want = [
        (x, y, nc, nu, ie, -njac) for njac, x, y, nc, nu, ie in scored[:20]
    ]
    got = [
        (
            r["part_a"],
            r["part_b"],
            r["n_common"],
            r["n_union"],
            r["is_edge"],
            r["jaccard_micro"],
        )
        for r in copurchase_jaccard_topk(spark, SF_DIR).collect()
    ]
    assert got == want


def test_local_bridges_replay(spark):
    from ai_etl_studio_spark.operators.insights import copurchase_local_bridges

    edges, adj = _capped_graph(spark)
    bridges = sum(1 for a, b in edges if not (adj[a] & adj[b]))
    r = copurchase_local_bridges(spark, SF_DIR).collect()[0]
    assert (r["n_edges"], r["n_local_bridges"]) == (len(edges), bridges)
    assert r["bridge_share_micro"] == int(
        1_000_000.0 * bridges / len(edges) + 0.5
    )


def test_eigenvector_trajectory_replay(spark):
    """Replay the 10-step quantized power iteration in pure Python:
    both engines and this replay must walk the SAME integer trajectory
    (per-step round-half-up micro renormalization — the raking/EWMA
    device on a graph recursion)."""
    from ai_etl_studio_spark.operators.insights import (
        copurchase_eigenvector_topk,
    )

    _, adj = _capped_graph(spark)
    x = {u: 1_000_000 for u in adj}
    for _ in range(10):
        ns = {u: sum(x[v] for v in adj[u]) for u in adj}
        mx = max(ns.values())
        x = {u: int(1_000_000.0 * s / mx + 0.5) for u, s in ns.items()}
    want = sorted(((-s, u) for u, s in x.items()))[:20]
    got = [
        (-r["centrality_micro"], r["part_key"])
        for r in copurchase_eigenvector_topk(spark, SF_DIR).collect()
    ]
    assert got == want


def test_avg_neighbor_degree_replay(spark):
    from ai_etl_studio_spark.operators.insights import (
        copurchase_avg_neighbor_degree,
    )

    _, adj = _capped_graph(spark)
    per_k: dict = defaultdict(list)
    for u in adj:
        du = len(adj[u])
        mnd = int(1_000_000.0 * sum(len(adj[v]) for v in adj[u]) / du + 0.5)
        per_k[du].append(mnd)
    want = {
        k: (len(v), int(sum(v) / len(v) + 0.5)) for k, v in per_k.items()
    }
    got = {
        r["degree"]: (r["n_nodes"], r["avg_neighbor_degree_micro"])
        for r in copurchase_avg_neighbor_degree(spark, SF_DIR).collect()
    }
    assert got == want


def test_local_clustering_triangle_identity(spark):
    """Cross-op invariant: Σ closed wedges over ALL midpoints = 3 x the
    census's triangle count (each triangle closes one wedge at each of
    its three vertices) — ties the per-node op to the global census."""
    from ai_etl_studio_spark.operators.insights import (
        copurchase_triangle_census,
    )

    edges, adj = _capped_graph(spark)
    closed_total = 0
    for m in adj:
        for x, y in combinations(sorted(adj[m]), 2):
            if (x, y) in edges:
                closed_total += 1
    census = copurchase_triangle_census(spark, SF_DIR).collect()[0]
    assert census["triangles"] == closed_total // 3
    wedges_total = sum(
        len(adj[m]) * (len(adj[m]) - 1) // 2 for m in adj
    )
    assert census["wedges"] == wedges_total


def test_zorder_layout_skips_files_in_both_dimensions(spark):
    """Measure the Z-ORDER claim from the parquet footers directly:
    the 2-D box (custkey 100-199 x year 1996) must miss most files'
    min/max rectangles, and EACH dimension alone must exclude at least
    one file — proving two-dimensional locality, which no single-column
    sort can give."""
    import datetime
    import glob

    import pyarrow.parquet as pq

    from ai_etl_studio_spark.operators.extended import ensure_zorder_orders

    path = ensure_zorder_orders(spark, SF_DIR)
    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    assert len(files) >= 8
    lo_d = datetime.datetime(1996, 1, 1)
    hi_d = datetime.datetime(1997, 1, 1)
    n_hit = n_miss_cust = n_miss_date = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        cmin = cmax = dmin = dmax = None
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                st = col.statistics
                if st is None:
                    continue
                if name == "o_custkey":
                    cmin = st.min if cmin is None else min(cmin, st.min)
                    cmax = st.max if cmax is None else max(cmax, st.max)
                elif name == "o_orderdate":
                    dmin = st.min if dmin is None else min(dmin, st.min)
                    dmax = st.max if dmax is None else max(dmax, st.max)
        cust_hits = cmin is not None and not (cmax < 100 or cmin > 199)
        date_hits = dmin is not None and not (
            dmax < lo_d or dmin >= hi_d
        )
        if not cust_hits:
            n_miss_cust += 1
        if not date_hits:
            n_miss_date += 1
        if cust_hits and date_hits:
            n_hit += 1
    # 2-D locality: the box touches a minority of files, and BOTH
    # dimensions individually exclude files on their own
    assert n_hit / len(files) <= 0.5, (n_hit, len(files))
    assert n_miss_cust > 0
    assert n_miss_date > 0
    # and the query over the layout still returns rows (sanity)
    from ai_etl_studio_spark.operators.extended import zorder_boxed_rollup

    assert zorder_boxed_rollup(spark, SF_DIR).count() > 0
