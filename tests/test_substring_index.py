"""Substring-level exact dedup (round-5 tier): the longest-run fold
replayed in pure Python on the real corpus, the persisted
duplicated-window index (build once, serve == scratch), and the plan
contracts (one narrow generate per corpus pass, no window function for
the run scan)."""

from __future__ import annotations

import os
import re

from ai_etl_studio_spark.operators.dedup import (
    SUBSTR_DF,
    SUBSTR_W,
    ensure_substring_index,
    substring_dedup_from_index,
    substring_dup_spans,
)
from ai_etl_studio_spark.plans.guard import explain_str
from tests.conftest import SF_DIR


def _py_report(texts: dict[int, str]) -> dict[int, tuple]:
    """Reference replay: per doc (n_windows, n_dup, max_span, ppm, drop)."""
    wins: dict[int, list[str]] = {}
    for doc_id, text in texts.items():
        ts = [t for t in re.split(r"\s+", text.lower()) if t]
        if len(ts) < SUBSTR_W:
            continue
        wins[doc_id] = [
            " ".join(ts[i : i + SUBSTR_W]) for i in range(len(ts) - SUBSTR_W + 1)
        ]
    df: dict[str, set[int]] = {}
    for doc_id, ws in wins.items():
        for w in ws:
            df.setdefault(w, set()).add(doc_id)
    out = {}
    for doc_id, ws in wins.items():
        dup = [len(df[w]) >= SUBSTR_DF for w in ws]
        n_dup = sum(dup)
        best = cur = 0
        for d in dup:
            cur = cur + 1 if d else 0
            best = max(best, cur)
        span = best + SUBSTR_W - 1 if best else 0
        ppm = n_dup * 1_000_000 // len(ws)
        out[doc_id] = (
            len(ws),
            n_dup,
            span,
            ppm,
            int(n_dup * 2 >= len(ws)),
        )
    return out


def test_span_report_matches_python_replay(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.select("doc_id", "text").collect()
        if r["text"] is not None
    }
    expected = _py_report(texts)
    got = {
        r["doc_id"]: (
            r["n_windows"],
            r["n_dup_windows"],
            r["max_dup_span_tokens"],
            r["dup_window_ppm"],
            r["drop_candidate"],
        )
        for r in substring_dup_spans(spark, SF_DIR).collect()
    }
    assert got == expected
    # the synthetic corpus DOES contain duplicated spans — the test
    # would be vacuous otherwise
    assert any(v[1] > 0 for v in got.values())


def test_longest_run_fold_edges(spark):
    # islands {0,1,2}, {5}, {7,8}: best run 3 -> span 3 + W - 1;
    # no dup -> span 0; all dup -> span n_windows + W - 1
    import pyspark.sql.functions as F

    from ai_etl_studio_spark.operators.dedup import _substring_span_report

    rows = (
        [(1, p, p in (0, 1, 2, 5, 7, 8)) for p in range(10)]
        + [(2, p, False) for p in range(4)]
        + [(3, p, True) for p in range(4)]
    )
    tagged = spark.createDataFrame(rows, "doc_id long, pos int, dup boolean")
    got = {
        r["doc_id"]: (r["max_dup_span_tokens"], r["n_dup_windows"])
        for r in _substring_span_report(tagged).collect()
    }
    assert got[1] == (3 + SUBSTR_W - 1, 6)
    assert got[2] == (0, 0)
    assert got[3] == (4 + SUBSTR_W - 1, 4)


def test_index_builds_once_and_serve_matches_scratch(spark, tmp_path):
    base = str(tmp_path / "substr_idx")
    tbl = ensure_substring_index(spark, SF_DIR, base_dir=base)
    success = os.path.join(base, tbl, "_SUCCESS")
    assert os.path.exists(success)
    built_at = os.path.getmtime(success)

    assert ensure_substring_index(spark, SF_DIR, base_dir=base) == tbl
    assert os.path.getmtime(success) == built_at
    assert spark.table(tbl).count() > 0

    scratch = {tuple(r) for r in substring_dup_spans(spark, SF_DIR).collect()}
    served = {
        tuple(r) for r in substring_dedup_from_index(spark, SF_DIR).collect()
    }
    assert served == scratch


def test_serve_plan_replaces_frequency_shuffle(spark):
    df = substring_dedup_from_index(spark, SF_DIR)
    tree = explain_str(df, "formatted").split("\n\n")[0]
    # the membership join rides a (AQE-chosen) broadcast at this SF and
    # the corpus-wide countDistinct exchange is gone: the only hash
    # exchange left is the doc_id report aggregation
    assert "BroadcastHashJoin" in tree
    assert tree.count("Exchange hashpartitioning") <= 1
    # no window function anywhere — the run scan is a fold
    assert "Window" not in tree


def test_scratch_plan_single_corpus_grain(spark):
    tree = explain_str(
        substring_dup_spans(spark, SF_DIR), "formatted"
    ).split("\n\n")[0]
    # two corpus scans (windows + frequency legs), each one Generate;
    # never a pair join, never a cartesian
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree
    assert tree.count("Scan parquet") == 2
