"""Broadcast-size tripwire: the class-level guard against forced
broadcasts of fact-scale frames.

Walks a query's *analyzed* logical plan (where ``ResolvedHint`` nodes
still exist — the optimizer folds them into join hints later) and, for
every broadcast hint, inspects the hinted subtree's leaf relations. A
leaf that belongs to an SF-linear table (orders, lineitem, customer,
documents, events, embeddings — all grow 1:1 with scale factor, so at
the 100 TB design point each is billions of rows) makes the hint a
scale bug UNLESS the path from the hint to that leaf passes through a
cardinality-reducing operator:

- ``Aggregate`` / ``Distinct`` / ``Deduplicate`` — output is group
  cardinality, not input rows;
- a ``LeftSemi`` / ``LeftAnti`` join — the hinted frame was pruned by a
  membership set (the classic TPC-H q18 qualified-orders shape);
- ``GlobalLimit`` / ``LocalLimit`` / ``Sample`` — explicitly bounded.

A plain ``Filter`` does NOT excuse: a date-slice of orders is still
SF-linear (a year of orders at 100 TB is hundreds of GB), which is
exactly the defect class this guard exists to kill. Genuinely-selective
filters are handled by AQE's dynamic join switch at runtime — the hint
is never needed for them. The one filter shape that IS excused is a
bounded comparison on a fact table's unique key (``vec_id = 7``,
``vec_id < 8``, ``c_custkey IN (…)``): a literal equality/IN keeps
O(#literals) rows and ``key < small-constant`` keeps at most that many
rows at ANY scale factor — the ANN query-vector pattern.

Dimension tables (region, nation, supplier, part) are exempt: they are
either constant-size or sub-linear enough that SCALE.md's broadcast
budget covers them (supplier = customer/15, part behind selective
filters).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

#: key column -> fact table it identifies. Leaf relations are recognized
#: by their full output schema (projection happens above the leaf in the
#: analyzed plan, so the leaf always carries the table's key column).
FACT_KEY_COLUMNS = {
    "l_orderkey": "lineitem",
    "o_orderkey": "orders",
    "c_custkey": "customer",
    "doc_id": "documents",
    "event_id": "events",
    "vec_id": "embeddings",
}

#: Node classes whose output cardinality no longer scales with the
#: fact-table leaf below them.
_REDUCING = {
    "Aggregate",
    "Distinct",
    "Deduplicate",
    "GlobalLimit",
    "LocalLimit",
    "Sample",
}


#: key-column comparison that bounds row count independent of SF:
#: equality / IN (O(#literals) rows on a unique key) or < / <= against a
#: small numeric literal (at most that many rows for non-negative keys).
_KEY_ALT = "|".join(FACT_KEY_COLUMNS)
_KEY_EQ_OR_IN = re.compile(rf"(?:{_KEY_ALT})#\d+L?\s*(?:=[^=]|IN\b)")
_KEY_LT_SMALL = re.compile(
    rf"(?:{_KEY_ALT})#\d+L?\s*<=?\s*(?:cast\()?(\d+)"
)
_BOUNDED_KEY_MAX = 65536


def _is_bounded_key_filter(cond: str) -> bool:
    if _KEY_EQ_OR_IN.search(cond):
        return True
    m = _KEY_LT_SMALL.search(cond)
    return bool(m) and int(m.group(1)) <= _BOUNDED_KEY_MAX


def _children(node):
    seq = node.children()
    return [seq.apply(i) for i in range(seq.length())]


def _cls(node) -> str:
    return node.getClass().getSimpleName()


def _is_broadcast_hint(node) -> bool:
    if _cls(node) not in ("ResolvedHint", "UnresolvedHint"):
        return False
    return "broadcast" in str(node.hints() if _cls(node) == "ResolvedHint"
                              else node.name()).lower()


def _leaf_fact_table(node) -> str | None:
    out = node.output()
    names = {out.apply(i).name() for i in range(out.length())}
    for key, table in FACT_KEY_COLUMNS.items():
        if key in names:
            return table
    return None


def _unexcused_fact_leaves(node, excused: bool) -> list[str]:
    """Fact-table leaves under ``node`` not behind a reducing operator."""
    if excused:
        return []
    cls = _cls(node)
    kids = _children(node)
    if not kids:
        table = _leaf_fact_table(node)
        return [table] if table else []
    child_excused = cls in _REDUCING
    if cls == "Filter" and _is_bounded_key_filter(str(node.condition())):
        child_excused = True
    if cls == "Join":
        jt = str(node.joinType())
        if jt in ("LeftSemi", "LeftAnti"):
            # result = pruned left side; right side only prunes, it is
            # never materialized into the broadcast hash table
            child_excused = True
    found: list[str] = []
    for k in kids:
        found.extend(_unexcused_fact_leaves(k, child_excused))
    return found


def broadcast_violations(df: DataFrame) -> list[str]:
    """Return ['<table> (under broadcast hint)'] for every fact-scale
    leaf reachable from a broadcast hint without cardinality reduction.
    Empty list = plan is broadcast-safe at the 100 TB design point."""
    analyzed = df._jdf.queryExecution().analyzed()
    violations: list[str] = []

    def walk(node):
        if _is_broadcast_hint(node):
            violations.extend(_unexcused_fact_leaves(node.child(), False))
        for k in _children(node):
            walk(k)

    walk(analyzed)
    return violations
