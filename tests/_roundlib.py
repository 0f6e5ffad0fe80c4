"""Shared scaffolding for the per-round operator behavior tests
(r10 verdict item 6). Every round's test file previously re-declared
the same harness pieces — the registry load, the pure-Python capped
co-purchase graph builders, the corpus replay loaders, the half-up
quantizers — so a seventh round file would have meant a seventh copy.
Per-round files now import from here and stay data (op lists +
assertions), not scaffolding.

House rule restated: replays here are ENGINE-INDEPENDENT — pure Python
off the raw parquet rows, never a second Spark aggregation — because
the oracle hash gate alone cannot catch a wrong fixpoint or a builder
bug mirrored into both engines.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from functools import lru_cache
from itertools import combinations

from tests.conftest import SF_DIR

__all__ = [
    "SF_DIR",
    "MINSUP",
    "DCAP",
    "registry",
    "capped_graph",
    "capped_wgraph",
    "daily_cents",
    "daily_1k_ticks",
    "half_up_micro",
    "half_up_nano",
    "score_gate_rows",
]

#: co-purchase graph fences — must equal the operator module's
#: (_CP_MINSUP, _CP_DCAP); pinned by test_round8_ops.
MINSUP = 2
DCAP = 48


@lru_cache(maxsize=1)
def registry():
    """(QUERIES, ORACLES) — loaded once per test session."""
    from ai_etl_studio_spark.operators import load_all

    return load_all()


def capped_graph(spark):
    """The capped UNWEIGHTED co-purchase graph in pure Python, straight
    off the parquet rows: distinct (order, part), per-order sorted pair
    fan-out, support >= MINSUP, then drop nodes with degree > DCAP.
    Returns (edges, adj)."""
    rows = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    per_order: dict = defaultdict(set)
    for r in rows:
        per_order[r.l_orderkey].add(r.l_partkey)
    sup: Counter = Counter()
    for parts in per_order.values():
        for a, b in combinations(sorted(parts), 2):
            sup[(a, b)] += 1
    e0 = {p for p, c in sup.items() if c >= MINSUP}
    deg0: Counter = Counter()
    for a, b in e0:
        deg0[a] += 1
        deg0[b] += 1
    keep = {u for u, d in deg0.items() if d <= DCAP}
    edges = {(a, b) for a, b in e0 if a in keep and b in keep}
    adj: dict = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    return edges, adj


def capped_wgraph(spark):
    """The capped WEIGHTED co-purchase graph in pure Python: per
    (order, part) revenue cents, per-order pair fan-out with weight
    r_x + r_y, support >= MINSUP on pair count, then the UNWEIGHTED
    degree cap (same fence as the unweighted tier). Returns
    (edge_weights, adjw)."""
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


def daily_cents(spark):
    """day-sorted exact daily revenue in integer cents, straight off
    the parquet rows — no Spark aggregation in the replay path."""
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


def daily_1k_ticks(spark):
    return [
        int(math.floor(c / 100000 + 0.5)) for c in daily_cents(spark)
    ]


def half_up_micro(x: float) -> int:
    return int(math.floor(x * 1_000_000 + 0.5)) if x >= 0 else -int(
        math.floor(-x * 1_000_000 + 0.5)
    )


def half_up_nano(x: float) -> int:
    return (
        int(math.floor(x * 1_000_000_000 + 0.5))
        if x >= 0
        else -int(math.floor(-x * 1_000_000_000 + 0.5))
    )


def score_gate_rows(spark):
    """Literal (score_ppm, y) pairs from the raw corpus — replays the
    stopword-ppm score and diversity gate with python ints."""
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
        out.append(
            (n_stop * 1_000_000 // n_tok, 1 if 100 * nd >= 55 * n_tok else 0)
        )
    return out
