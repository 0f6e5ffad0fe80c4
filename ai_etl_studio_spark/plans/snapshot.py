"""Deterministic per-query plan profiles — the wall-clock-independent
performance signal (r9 verdict item 5).

Two rounds in a row the bench seal drifted ~1.1-1.25x with ambient
machine load and a human had to adjudicate "regression or noise" by
hand. Wall time is load-dependent; a query's PHYSICAL PLAN is not: the
number of wide (shuffle) exchanges, broadcast exchanges, join
strategies, parquet scans, and the presence of pushed/partition/runtime
filters are pure functions of (code, confs, data stats). ``tools/
plan_snapshot.py`` records these per HEADLINE query into
``PLANSNAP_r{N}.json`` at seal time; ``tests/test_plansnap.py`` gates on
them. A wall-clock move WITHOUT a profile change is ambient by
construction; a profile change is attributable to the commit that
regenerated the snapshot.

Counting is over the ``explain("formatted")`` text: node names are
stable public plan vocabulary, while expression IDs (#123) and plan ids
vary per session — so the profile counts node-type occurrences and
non-empty filter clauses only, never raw strings.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from ai_etl_studio_spark.plans.guard import explain_str

#: the profile keys, in artifact order (tests iterate this)
PROFILE_KEYS = (
    "wide_exchanges",
    "broadcast_exchanges",
    "reused_exchanges",
    "broadcast_hash_joins",
    "sort_merge_joins",
    "shuffled_hash_joins",
    "nested_loop_joins",
    "parquet_scans",
    "pushed_filter_scans",
    "partition_filter_scans",
    "runtime_bloom_filters",
    "dynamic_pruning_filters",
)


def profile_from_text(formatted: str) -> dict[str, int]:
    """Plan profile from a full ``explain('formatted')`` string."""
    tree = formatted.split("\n\n")[0]
    broadcast = tree.count("BroadcastExchange")
    reused = tree.count("ReusedExchange")
    return {
        # every Exchange that moves rows by key or range — the shuffle
        # count that dominates 100 TB cost
        "wide_exchanges": tree.count("Exchange") - broadcast - reused,
        "broadcast_exchanges": broadcast,
        "reused_exchanges": reused,
        "broadcast_hash_joins": tree.count("BroadcastHashJoin"),
        "sort_merge_joins": tree.count("SortMergeJoin"),
        "shuffled_hash_joins": tree.count("ShuffledHashJoin"),
        "nested_loop_joins": tree.count("NestedLoopJoin"),
        "parquet_scans": tree.count("Scan parquet"),
        # non-empty clause counts from the detail section: an empty
        # PushedFilters reads "PushedFilters: []"
        "pushed_filter_scans": len(
            re.findall(r"PushedFilters: \[(?!\])", formatted)
        ),
        "partition_filter_scans": len(
            re.findall(r"PartitionFilters: \[(?!\])", formatted)
        ),
        "runtime_bloom_filters": formatted.count("might_contain"),
        "dynamic_pruning_filters": formatted.lower().count(
            "dynamicpruningexpression"
        ),
    }


def plan_profile(df: DataFrame) -> dict[str, int]:
    """Deterministic plan profile of a DataFrame (pre-execution AQE
    plan — stable given code, confs, and source file stats)."""
    return profile_from_text(explain_str(df, "formatted"))
