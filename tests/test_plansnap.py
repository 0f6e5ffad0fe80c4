"""PLANSNAP gate (r9 verdict item 5): the wall-clock-independent perf
signal. The committed artifact records every HEADLINE query's
deterministic plan profile (shuffle/broadcast/join/scan/filter counts)
at the bench corpus; this gate (a) pins artifact freshness — keys must
equal HEADLINE exactly, no error rows — and (b) recomputes a sentinel
subset LIVE and requires equality, so a commit that changes any
sentinel's exchange/broadcast profile must regenerate the snapshot in
the same session (python tools/plan_snapshot.py [--only names]) —
which is exactly what makes a bench move attributable vs ambient."""

from __future__ import annotations

import json
from pathlib import Path

import bench
from ai_etl_studio_spark.operators import load_all
from ai_etl_studio_spark.plans.snapshot import (
    PROFILE_KEYS,
    STAGE_SOURCED,
    plan_profile,
    stage_profile,
)

REPO = Path(__file__).resolve().parent.parent

#: plan-shape-critical queries recomputed live per suite run: the
#: flagship, representative TPC-H stars, every storage-layout device,
#: the scale-path dedup/ANN shapes, and the round-10 additions. The
#: full sweep runs at seal time via tools/plan_snapshot.py.
SENTINELS = (
    "top_products",
    "agg_pricing_summary",
    "join_4way_dims",
    "tpch_q3",
    "tpch_q5",
    "tpch_q9",
    "dpp_quarter_star_join",
    "bucketed_colocated_join",
    "partition_pruned_rollup",
    "zorder_boxed_rollup",
    "dedup_minhash_lsh_pairs_capped",
    "ann_ivf_topk",
    "salted_agg",
    "topn_per_group",
    "props_variant_profile",
)


def _artifact() -> dict:
    return json.loads((REPO / "PLANSNAP_latest.json").read_text())


def test_plansnap_covers_headline_exactly():
    art = _artifact()
    prof = art["profiles"]
    missing = sorted(set(bench.HEADLINE) - set(prof))
    stale = sorted(set(prof) - set(bench.HEADLINE))
    assert not missing and not stale, (
        f"PLANSNAP_latest.json stale: missing {missing}, extra {stale} — "
        "regenerate with python tools/plan_snapshot.py [--only names]"
    )
    errors = sorted(k for k, v in prof.items() if "error" in v)
    assert not errors, f"PLANSNAP rows errored: {errors}"
    for name, p in prof.items():
        want = set(PROFILE_KEYS)
        if name in STAGE_SOURCED:
            want = want | {"stage_frames"}
        assert set(p) == want, name


def test_no_silent_all_zero_profiles():
    """r10 verdict item 2: every HEADLINE op costing > 1 s in the bench
    seal must have a non-zero plan profile (its heavy work is visible
    to the drift-attribution gate) or be an explicitly stage-sourced
    row. An all-zero row on an expensive op means its plan regressions
    would read as ambient — exactly the blind spot this closes."""
    art = _artifact()
    times = json.loads((REPO / "BENCH_full_latest.json").read_text())[
        "queries"
    ]
    offenders = []
    for name, p in art["profiles"].items():
        if times.get(name, 0.0) <= 1.0:
            continue
        visible = any(p[k] for k in PROFILE_KEYS) or name in STAGE_SOURCED
        if not visible:
            offenders.append(name)
    assert not offenders, (
        f"HEADLINE ops > 1 s with all-zero, non-stage-sourced profiles: "
        f"{sorted(offenders)} — wrap their materialization boundaries in "
        "plans.snapshot.capture_stage and regenerate the snapshot"
    )
    # every declared stage-sourced row is either genuinely staged or the
    # declared-zero degenerate (error_relation)
    for name in STAGE_SOURCED & set(art["profiles"]):
        p = art["profiles"][name]
        assert "stage_frames" in p, name
        if name != "error_relation":
            assert p["stage_frames"] > 0 and any(
                p[k] for k in PROFILE_KEYS
            ), name


def test_sentinel_profiles_match_artifact(spark):
    """Live recompute of the sentinel subset at the artifact's corpus:
    any divergence means a plan changed since the last snapshot — red
    until the changing commit re-runs the snapshot tool."""
    art = _artifact()
    sf_dir = art["sf_dir"]
    queries, _ = load_all()
    diffs = {}
    for name in SENTINELS:
        got = plan_profile(queries[name](spark, sf_dir))
        want = art["profiles"][name]
        if got != want:
            diffs[name] = {
                k: (want.get(k), got[k])
                for k in got
                if got[k] != want.get(k)
            }
    assert not diffs, (
        f"plan profiles drifted from PLANSNAP (want, got): {diffs} — "
        "if intentional, regenerate: python tools/plan_snapshot.py "
        f"--only {' '.join(diffs)}"
    )


#: stage-sourced sentinels recomputed live (these EXECUTE their heavy
#: stages during construction, so keep the list to the cheap members —
#: the Gram-collect op pins the capture seam, error_relation the
#: declared-zero degenerate).
STAGE_SENTINELS = ("hits_brand_authority_topk", "error_relation")


def test_stage_sentinel_profiles_match_artifact(spark):
    """Live recompute of the stage-sourced sentinel subset: pins both
    the capture_stage plumbing (a dropped wrapper shows up as a
    stage_frames decrement) and profile determinism across sessions."""
    art = _artifact()
    queries, _ = load_all()
    diffs = {}
    for name in STAGE_SENTINELS:
        got = stage_profile(queries[name], spark, art["sf_dir"])
        want = art["profiles"][name]
        if got != want:
            diffs[name] = {
                k: (want.get(k), got[k])
                for k in got
                if got[k] != want.get(k)
            }
    assert not diffs, (
        f"stage profiles drifted from PLANSNAP (want, got): {diffs} — "
        "if intentional, regenerate: python tools/plan_snapshot.py "
        f"--only {' '.join(diffs)}"
    )
