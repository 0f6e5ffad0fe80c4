"""Driver-contract ordering invariants: the correctness-sweep prefix
(__spark_entry__.PRIORITY) must stay exactly the first 50 registry keys
and fully oracle-twinned, so a prefix-sampling driver always lands on
hash-checkable extension operators."""

from __future__ import annotations

import importlib.util
import sys


def _entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("__spark_entry__", mod)
    spec.loader.exec_module(mod)
    return mod


#: the five sketch/iterative ops with no SQL oracle by design — the r5
#: prefix carried all five for their err:null rows-only rows; the r6
#: prefix re-slots only percentile_approx_sketch (its r5 row errored on
#: the array<double> output, now flattened); every OTHER prefix entry
#: must be fully hash-checkable
ROWS_ONLY = {
    "approx_distinct",
    "hll_sketch_rollup",
    "percentile_approx_sketch",
    "kmeans_embeddings",
    "embedding_pca_power",
}


def test_priority_prefix_invariants():
    m = _entry()
    q, o = m.queries(), m.oracle_sql()
    assert len(m.PRIORITY) == 50
    assert list(q)[: len(m.PRIORITY)] == list(m.PRIORITY)
    # every priority entry is oracle-twinned (full hash-check row)
    # except the deliberate rows-only five
    assert set(k for k in m.PRIORITY if k not in o) <= ROWS_ONLY
    # oracles never reference unregistered queries
    assert set(o) <= set(q)
