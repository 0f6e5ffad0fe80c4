"""Fingerprinted-layout cache hygiene (r8 verdict item 6).

Every build-once artifact — bucketed tables, hive month partitions,
Z-ORDER files, PageRank edge buckets, boilerplate/substring line
indexes, PQ codes — lives under ``.cache/<kind>/<fingerprint>`` where
the fingerprint hashes the source file's (size, mtime). A regenerated
corpus therefore gets a fresh directory, which is correct but strands
the old fingerprint forever: nothing ever maps it back to a source to
notice the source changed.

The fix is a manifest: at ident time each fingerprint directory gets a
``_manifest.json`` recording the absolute source paths and their
(size, mtime); the same call then sweeps SIBLING fingerprints of the
same kind and removes any whose recorded sources are gone or have
changed stats — exactly the stranded class. Siblings whose sources
still match are other LIVE corpora (e.g. sf0.001 beside sf0.1) and are
kept. Directories without a manifest predate this scheme and are
removed too (they are rebuilt on next use; every directory created
from now on carries a manifest from birth, so the class is one-time).

Concurrency note: the sweep may delete a layout another Spark session
has registered in its catalog — that session's next read fails and its
ensure_* rebuilds. Single-machine scratch semantics; a shared cluster
cache would need a lease, which is out of scope for a local .cache.
"""

from __future__ import annotations

import json
import os
import shutil

_MANIFEST = "_manifest.json"


def _stat_entry(path: str) -> list:
    st = os.stat(path)
    return [st.st_size, int(st.st_mtime)]


def write_manifest(layout_dir: str, source_files: list[str]) -> None:
    """Record the layout's source files and their stats (idempotent —
    re-written on every ident call so a pre-manifest directory adopts
    one on its next touch)."""
    os.makedirs(layout_dir, exist_ok=True)
    manifest = {
        "sources": {
            os.path.abspath(f): _stat_entry(f) for f in source_files
        }
    }
    tmp = os.path.join(layout_dir, _MANIFEST + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(layout_dir, _MANIFEST))


def gc_stale_siblings(base_dir: str, keep_name: str) -> list[str]:
    """Remove sibling fingerprint directories of ``base_dir`` whose
    manifest sources are missing/changed, or which carry no manifest at
    all. Returns the removed directory names (for tests/logging)."""
    removed: list[str] = []
    try:
        names = os.listdir(base_dir)
    except FileNotFoundError:
        return removed
    for name in names:
        if name == keep_name:
            continue
        d = os.path.join(base_dir, name)
        if not os.path.isdir(d):
            continue
        mpath = os.path.join(d, _MANIFEST)
        stale = False
        if not os.path.exists(mpath):
            stale = True  # pre-manifest strand: rebuildable scratch
        else:
            try:
                with open(mpath) as fh:
                    sources = json.load(fh)["sources"]
                for f, st in sources.items():
                    if not os.path.exists(f) or _stat_entry(f) != st:
                        stale = True
                        break
            except (OSError, ValueError, KeyError):
                stale = True  # unreadable manifest: treat as stranded
        if stale:
            shutil.rmtree(d, ignore_errors=True)
            removed.append(name)
    return removed


def manifest_and_gc(
    layout_dir: str, source_files: list[str]
) -> list[str]:
    """The one-call form every ident function uses: write/refresh this
    layout's manifest, then sweep stale siblings of the same kind."""
    write_manifest(layout_dir, source_files)
    return gc_stale_siblings(
        os.path.dirname(layout_dir), os.path.basename(layout_dir)
    )
