"""Layout-cache hygiene (r8 verdict item 6): fingerprinted build-once
layouts get a source manifest at ident time, and stranded sibling
fingerprints — sources changed or vanished — are swept. No Spark
needed: ident functions only stat the source files."""

from __future__ import annotations

import json
import os
import time

from ai_etl_studio_spark.layout_cache import (
    gc_stale_siblings,
    manifest_and_gc,
    write_manifest,
)


def _mk_source(tmp_path, name, content=b"v1"):
    f = tmp_path / name
    f.write_bytes(content)
    return str(f)


def test_manifest_written_and_live_sibling_kept(tmp_path):
    src_a = _mk_source(tmp_path, "a.parquet")
    src_b = _mk_source(tmp_path, "b.parquet")
    base = tmp_path / "kind"
    removed = manifest_and_gc(str(base / "fp_a"), [src_a])
    assert removed == []
    assert json.load(open(base / "fp_a" / "_manifest.json"))["sources"]
    # a sibling whose source still matches is another live corpus: kept
    manifest_and_gc(str(base / "fp_b"), [src_b])
    removed = manifest_and_gc(str(base / "fp_a"), [src_a])
    assert removed == []
    assert (base / "fp_b").exists()


def test_stale_sibling_removed_on_source_change(tmp_path):
    src = _mk_source(tmp_path, "a.parquet", b"v1")
    base = tmp_path / "kind"
    manifest_and_gc(str(base / "fp_old"), [src])
    # regenerate the corpus: size changes -> fp_old is stranded
    time.sleep(0.01)
    open(src, "wb").write(b"v2-longer")
    removed = manifest_and_gc(str(base / "fp_new"), [src])
    assert removed == ["fp_old"]
    assert not (base / "fp_old").exists()
    assert (base / "fp_new").exists()


def test_vanished_source_and_manifestless_removed(tmp_path):
    src = _mk_source(tmp_path, "a.parquet")
    gone = _mk_source(tmp_path, "gone.parquet")
    base = tmp_path / "kind"
    manifest_and_gc(str(base / "fp_gone"), [gone])
    os.remove(gone)
    (base / "fp_orphan").mkdir(parents=True)  # pre-manifest strand
    removed = manifest_and_gc(str(base / "fp_live"), [src])
    assert sorted(removed) == ["fp_gone", "fp_orphan"]


def test_unreadable_manifest_treated_as_stranded(tmp_path):
    src = _mk_source(tmp_path, "a.parquet")
    base = tmp_path / "kind"
    bad = base / "fp_bad"
    bad.mkdir(parents=True)
    (bad / "_manifest.json").write_text("{not json")
    removed = manifest_and_gc(str(base / "fp_live"), [src])
    assert removed == ["fp_bad"]


def test_layout_ident_sweeps_regenerated_corpus(tmp_path):
    """End-to-end through extended._layout_ident: regenerating
    lineitem.parquet (the r8 ADVICE scenario) strands the old bucketed
    fingerprint and the next ident call removes it."""
    from ai_etl_studio_spark.operators.extended import _layout_ident

    sf = tmp_path / "sf"
    sf.mkdir()
    for t in ("lineitem", "orders"):
        (sf / f"{t}.parquet").write_bytes(b"v1")
    base = str(tmp_path / "bucketed_ok")
    _, root1 = _layout_ident(
        "bucketed_ok", str(sf), base, tables=("lineitem", "orders")
    )
    time.sleep(0.01)
    (sf / "lineitem.parquet").write_bytes(b"v2-regenerated")
    _, root2 = _layout_ident(
        "bucketed_ok", str(sf), base, tables=("lineitem", "orders")
    )
    assert root1 != root2
    assert not os.path.exists(root1)
    assert os.path.exists(root2)


def test_gc_missing_base_dir_is_noop(tmp_path):
    assert gc_stale_siblings(str(tmp_path / "absent"), "x") == []


def test_write_manifest_is_idempotent(tmp_path):
    src = _mk_source(tmp_path, "a.parquet")
    d = str(tmp_path / "kind" / "fp")
    write_manifest(d, [src])
    m1 = json.load(open(os.path.join(d, "_manifest.json")))
    write_manifest(d, [src])
    m2 = json.load(open(os.path.join(d, "_manifest.json")))
    assert m1 == m2
