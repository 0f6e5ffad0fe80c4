"""Behavior tests for the round-3 curation/audit operators — semantics
beyond the auto-generated oracle-parity check (test_oracle_parity.py):
line-dedup actually removes cross-document boilerplate and preserves
order; gopher rules gate on each bound; dq_audit passes on the clean
TPC-H tables and fails when fed a broken relation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_etl_studio_spark.operators import load_all

QUERIES, _ = load_all()
SF_DIR = "/root/testdata/sf0.001"


def test_line_dedup_removes_shared_lines_and_keeps_order(spark):
    out = QUERIES["line_dedup_corpus"](spark, SF_DIR)
    rows = out.collect()
    assert len(rows) > 0
    # the synthetic corpus seeds near-duplicate docs -> some boilerplate
    # lines must actually be dropped somewhere
    assert sum(r.n_lines_dropped for r in rows) > 0
    # reassembled text is a subsequence of the original token stream
    docs = {
        r.doc_id: r.text.lower().split()
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    checked = 0
    for r in rows:
        if r.n_lines_dropped == 0 or not r.cleaned_text:
            continue
        kept = r.cleaned_text.split()
        orig = iter(docs[r.doc_id])
        assert all(tok in orig for tok in kept), r.doc_id  # subsequence
        checked += 1
        if checked >= 5:
            break
    assert checked > 0


def test_line_dedup_drops_lines_in_two_or_more_docs(spark):
    out = QUERIES["line_dedup_corpus"](spark, SF_DIR)
    # every dropped line must occur in >= LINE_DROP_DF distinct docs:
    # recompute the frequency table independently and cross-check totals
    from ai_etl_studio_spark.operators.dedup import LINE_DROP_DF, LINE_W

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    import collections

    freq: collections.Counter = collections.Counter()
    per_doc: dict[int, list[str]] = {}
    for r in d.collect():
        ts = [t for t in r.text.lower().split() if t]
        lines = [
            " ".join(ts[i : i + LINE_W]) for i in range(0, len(ts), LINE_W)
        ]
        per_doc[r.doc_id] = lines
        for ln in set(lines):
            freq[ln] += 1
    want_dropped = {
        doc: sum(1 for ln in lines if freq[ln] >= LINE_DROP_DF)
        for doc, lines in per_doc.items()
    }
    got = {r.doc_id: r.n_lines_dropped for r in out.collect()}
    assert got == want_dropped


def test_gopher_rules_bounds(spark):
    out = QUERIES["gopher_rules"](spark, SF_DIR).collect()
    assert len(out) > 0
    from ai_etl_studio_spark.operators.quality import (
        _G_MAX_MWL,
        _G_MAX_SYMBOL_RATIO,
        _G_MIN_ALPHA_FRAC,
        _G_MIN_MWL,
        _G_MIN_WORDS,
    )

    for r in out:
        want = (
            r.n_words >= _G_MIN_WORDS
            and _G_MIN_MWL <= r.mean_word_len <= _G_MAX_MWL
            and r.symbol_ratio <= _G_MAX_SYMBOL_RATIO
            and r.alpha_frac >= _G_MIN_ALPHA_FRAC
            and r.n_stop_distinct >= 2
        )
        assert r.pass_gopher == int(want)
    # the all-lowercase-word corpus is fully alphabetic
    assert all(r.alpha_frac == 1.0 for r in out)


def test_dq_audit_green_on_clean_tables(spark):
    out = QUERIES["dq_audit"](spark, SF_DIR)
    rows = {(r.check_name, r.scope): r for r in out.collect()}
    assert len(rows) == 9
    # generator guarantees: keys complete+unique, FKs resolve, bounds hold
    assert all(r[1]["pass"] == 1 for r in rows.items()), {
        k: (v.value, v["pass"]) for k, v in rows.items() if v["pass"] == 0
    }
    rc = rows[("row_count>0", "lineitem")]
    assert rc.value > 0


def test_dq_audit_detects_broken_data(spark, tmp_path):
    """Break referential integrity + bounds in a copied mini warehouse;
    the audit must flag exactly those constraints."""
    import shutil

    src = SF_DIR
    dst = str(tmp_path / "sf_broken")
    shutil.copytree(src, dst)
    li = spark.read.parquet(f"{src}/lineitem.parquet")
    broken = li.withColumn(
        "l_quantity",
        F.when(F.col("l_linenumber") == 1, F.lit(999.0)).otherwise(
            F.col("l_quantity")
        ),
    ).withColumn(
        "l_orderkey",
        F.when(F.col("l_linenumber") == 2, F.lit(10**12)).otherwise(
            F.col("l_orderkey")
        ),
    )
    import os

    if os.path.isfile(f"{dst}/lineitem.parquet"):
        os.remove(f"{dst}/lineitem.parquet")
    else:
        shutil.rmtree(f"{dst}/lineitem.parquet", ignore_errors=True)
    broken.coalesce(1).write.mode("overwrite").parquet(f"{dst}/lineitem.parquet")
    out = QUERIES["dq_audit"](spark, dst)
    rows = {(r.check_name, r.scope): r["pass"] for r in out.collect()}
    assert rows[("bounds[1,50]", "lineitem.l_quantity")] == 0
    assert rows[("ref_integrity", "lineitem.l_orderkey->orders")] == 0
    # untouched constraints stay green
    assert rows[("uniqueness", "orders.o_orderkey")] == 1
    assert rows[("completeness", "lineitem.l_orderkey")] == 1


def test_snapshot_diff_counts_reconcile(spark):
    from ai_etl_studio_spark.operators.audit import _DIFF_CHG_MOD, _DIFF_DEL_MOD

    rows = {r.change: r.n for r in QUERIES["snapshot_diff"](spark, SF_DIR).collect()}
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    n = orders.count()
    keys = [r.o_orderkey for r in orders.select("o_orderkey").collect()]
    removed = sum(1 for k in keys if k % _DIFF_DEL_MOD == 0)
    changed = sum(
        1 for k in keys if k % _DIFF_DEL_MOD != 0 and k % _DIFF_CHG_MOD == 0
    )
    assert rows.get("removed", 0) == removed
    assert rows.get("changed", 0) == changed
    assert rows.get("added", 0) == 0  # derived snapshot adds nothing
    assert rows.get("unchanged", 0) == n - removed - changed


def test_user_erasure_audit_counts(spark):
    from ai_etl_studio_spark.operators.audit import _ERASE_MOD

    rows = {
        r.table_name: r.n_rows
        for r in QUERIES["user_erasure_audit"](spark, SF_DIR).collect()
    }
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    victims = {
        r.c_custkey
        for r in c.collect()
        if r.c_custkey % _ERASE_MOD == 0
    }
    hit_orders = {r.o_orderkey for r in o.collect() if r.o_custkey in victims}
    n_li = sum(1 for r in li.collect() if r.l_orderkey in hit_orders)
    assert rows == {
        "customer": len(victims),
        "orders": len(hit_orders),
        "lineitem": n_li,
    }


def test_pretrain_pipeline_funnel_is_monotone(spark):
    rows = QUERIES["pretrain_corpus_pipeline"](spark, SF_DIR).collect()
    assert rows and all(r.source != "src0" for r in rows)
    for r in rows:
        assert (
            r.n_raw >= r.n_quality >= r.n_cleaned >= r.n_exact >= r.n_final >= 0
        ), r
        if r.n_final > 0:
            assert r.tokens_final > 0
            assert r.est_sequences == (r.tokens_final + 1023) // 1024
        else:
            assert r.tokens_final == 0 and r.est_sequences == 0
    # the pipeline must actually remove something somewhere
    assert sum(r.n_raw for r in rows) > sum(r.n_final for r in rows)


def test_weighted_sample_is_length_biased(spark):
    """A-ES with w = n_chars must overselect long documents: the mean
    length of the k sample exceeds the corpus mean (deterministic given
    the fixed testdata + md5 draws), ranks are exactly 1..K, and the
    draw replays in pure python."""
    import hashlib
    import math

    from ai_etl_studio_spark.operators.training import WS_K, WS_TICK

    rows = QUERIES["weighted_sample_topk"](spark, SF_DIR).collect()
    assert [r.rank for r in rows] == list(range(1, WS_K + 1))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    corpus_mean = sum(d.n_chars for d in docs) / len(docs)
    sample_mean = sum(r.n_chars for r in rows) / len(rows)
    assert sample_mean > corpus_mean
    # pure-python replay of the priority and the top-k membership
    def pri(doc_id, n_chars):
        h = int(hashlib.md5(f"ws:{doc_id}".encode()).hexdigest()[:8], 16)
        u = (h + 1) / 4294967296.0
        return round(math.log(u) / max(n_chars, 1) * WS_TICK)

    want = sorted(
        ((pri(d.doc_id, d.n_chars), -d.doc_id) for d in docs), reverse=True
    )[:WS_K]
    want_ids = {-negid for _, negid in want}
    assert {r.doc_id for r in rows} == want_ids


def test_table_profile_metrics_replay(spark):
    rows = {
        (r.table_name, r.column_name): r
        for r in QUERIES["table_profile"](spark, SF_DIR).collect()
    }
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    r = rows[("orders", "o_orderkey")]
    assert r.n_rows == o.count()
    assert r.n_distinct == o.count()  # primary key
    assert r.min_value == 0.0 and r.max_value == float(o.count() - 1)
    ck = rows[("customer", "c_custkey")]
    assert ck.n_distinct == c.count()
    seg = rows[("customer", "c_mktsegment")]
    assert seg.min_value is None and seg.max_value is None
    assert 1 <= seg.n_distinct <= 10


def test_basket_pairs_support_and_lift_replay(spark):
    from collections import defaultdict
    from itertools import combinations

    from ai_etl_studio_spark.operators.insights import _LIFT_TICK

    rows = QUERIES["basket_pairs"](spark, SF_DIR).collect()
    assert rows
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    baskets = defaultdict(set)
    for r in li:
        baskets[r.l_orderkey].add(r.l_partkey)
    support = defaultdict(int)
    cnt = defaultdict(int)
    for parts in baskets.values():
        for p in parts:
            cnt[p] += 1
        for a, b in combinations(sorted(parts), 2):
            support[(a, b)] += 1
    n_orders = len(baskets)
    top_support = sorted(support.values(), reverse=True)[: len(rows)]
    assert sorted((r.support for r in rows), reverse=True) == top_support
    for r in rows[:5]:
        a, b = r.part_1, r.part_2
        assert support[(a, b)] == r.support
        num = 2 * r.support * n_orders * _LIFT_TICK + cnt[a] * cnt[b]
        assert r.lift_ticks == num // (2 * cnt[a] * cnt[b])


def test_sequence_gaps_matches_bruteforce(spark):
    rows = QUERIES["sequence_gaps"](spark, SF_DIR).collect()
    keys = sorted(
        r.o_orderkey
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
        if r.o_orderstatus == "F"
    )
    gaps = [
        (a + 1, b - 1, b - 1 - a)
        for a, b in zip(keys, keys[1:])
        if b - a > 1
    ]
    want = sorted(gaps, key=lambda g: (-g[2], g[0]))[: len(rows)]
    assert [(r.gap_start, r.gap_end, r.gap_len) for r in rows] == want
    # every reported range is genuinely absent from the key set
    ks = set(keys)
    for r in rows[:10]:
        assert all(k not in ks for k in range(r.gap_start, r.gap_end + 1))


def test_benford_audit_replay(spark):
    import math
    from collections import Counter

    from ai_etl_studio_spark.operators.audit import (
        _BENFORD_DEV_TICK,
        _BENFORD_TICK,
    )

    rows = QUERIES["benford_audit"](spark, SF_DIR).collect()
    assert [r.digit for r in rows] == list(range(1, 10))
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    c = Counter(int(str(round(r.o_totalprice * 100))[0]) for r in o)
    n = len(o)
    assert sum(r.observed for r in rows) == n
    for r in rows:
        assert r.observed == c.get(r.digit, 0)
        bt = round(math.log10(1 + 1 / r.digit) * _BENFORD_TICK)
        assert r.benford_ticks == bt
        dev = round(
            (r.observed * _BENFORD_TICK - n * bt) ** 2
            / (n * bt * _BENFORD_TICK)
            * _BENFORD_DEV_TICK
        )
        assert r.dev_ticks == dev
    # expectation shares sum to ~1
    assert sum(r.benford_ticks for r in rows) == pytest.approx(
        _BENFORD_TICK, abs=5
    )


def test_json_props_profile_replay(spark):
    import json

    rows = QUERIES["json_props_profile"](spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    from collections import Counter, defaultdict

    counts = Counter()
    nums = defaultdict(list)
    for e in ev:
        for k, v in json.loads(e.props).items():
            if isinstance(v, bool):
                t = "boolean"
            elif isinstance(v, int):
                t = "integer"
            elif isinstance(v, float):
                t = "number"
            elif v is None:
                t = "null"
            elif isinstance(v, str):
                t = "string"
            else:
                t = "object"
            counts[(k, t)] += 1
            if t == "integer":
                nums[(k, t)].append(v)
    assert {(r.key, r.vtype): r.n for r in rows} == dict(counts)
    for r in rows:
        if (r.key, r.vtype) in nums:
            vals = nums[(r.key, r.vtype)]
            assert (r.min_int, r.max_int) == (min(vals), max(vals))


def test_table_checksums_detect_any_change(spark, tmp_path):
    """The reconciliation property: identical content → identical
    (n, checksum); ONE changed cell → different checksum."""
    import hashlib

    import pyarrow.parquet as pq

    rows = {
        r.table_name: (r.n, r.checksum)
        for r in QUERIES["table_checksums"](spark, SF_DIR).collect()
    }
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    want = sum(
        h(f"{r.o_orderkey}|{r.o_custkey}|{round(r.o_totalprice * 100)}")
        for r in o
    )
    assert rows["orders"] == (len(o), want)
    # single-cell sensitivity: bump one total by a cent → checksum moves
    tampered = want - h(
        f"{o[0].o_orderkey}|{o[0].o_custkey}|{round(o[0].o_totalprice * 100)}"
    ) + h(
        f"{o[0].o_orderkey}|{o[0].o_custkey}|{round(o[0].o_totalprice * 100) + 1}"
    )
    assert tampered != want


def test_media_chunk_dedup_replay(spark):
    import hashlib
    from collections import Counter, defaultdict

    rows = {
        r.media_type: r
        for r in QUERIES["media_chunk_dedup"](spark, SF_DIR).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    per_type = defaultdict(Counter)
    blen = defaultdict(dict)
    for d in docs:
        mt = ["image/png", "audio/wav", "video/mp4"][d.doc_id % 3]
        payload = d.text.encode("utf-8")
        for i in range(0, len(payload), 64):
            chunk = payload[i : i + 64]
            h = hashlib.md5(chunk.hex().upper().encode()).hexdigest()
            per_type[mt][h] += 1
            blen[mt][h] = len(chunk)
    for mt, c in per_type.items():
        r = rows[mt]
        assert r.n_chunks == sum(c.values())
        assert r.n_distinct_chunks == len(c)
        assert r.dedup_savings_bytes == sum(
            (n - 1) * blen[mt][h] for h, n in c.items()
        )
    # the seeded near-duplicate docs guarantee real savings somewhere
    assert any(r.dedup_savings_bytes > 0 for r in rows.values())


def test_dup_rate_by_quality_band_replay(spark):
    import math
    import re
    from collections import Counter, defaultdict

    from tests.test_insights_ops import QUERIES, SF_DIR

    rows = QUERIES["dup_rate_by_quality_band"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    SW = {"the", "a", "an", "of", "to", "and", "in", "is"}
    texts = [d.text for d in docs if d.text is not None]
    hc = Counter(texts)
    agg = defaultdict(lambda: [0, 0])
    for t in texts:
        ws = [w for w in re.split(r"\s+", t.lower()) if w]
        if not ws:
            continue
        band = min(9, math.floor(sum(w in SW for w in ws) / len(ws) * 10))
        agg[band][0] += 1
        agg[band][1] += int(hc[t] > 1)
    got = {r.band: (r.n_docs, r.n_dups, r.dup_ppm) for r in rows}
    assert got == {
        k: (n, d, d * 1_000_000 // n) for k, (n, d) in agg.items()
    }
    # rates are well-formed ppm (exact dups may be zero at tiny SF —
    # the seeded near-dups are not byte-identical)
    assert all(0 <= ppm <= 1_000_000 for _, _, ppm in got.values())
