"""Fingerprinted-layout cache hygiene (r8 verdict item 6; manifest
placement fixed per the r9 ADVICE).

Every build-once artifact — bucketed tables, hive month partitions,
Z-ORDER files, PageRank edge buckets, boilerplate/substring line
indexes, PQ codes — lives under ``.cache/<kind>/<fingerprint>`` where
the fingerprint hashes the source file's (size, mtime). A regenerated
corpus therefore gets a fresh directory, which is correct but strands
the old fingerprint forever: nothing ever maps it back to a source to
notice the source changed.

The fix is a manifest: at ident time each fingerprint gets a
``<fingerprint>.manifest.json`` recording the absolute source paths
and their (size, mtime); the same call then sweeps SIBLING
fingerprints of the same kind and removes any whose recorded sources
are gone or have changed stats — exactly the stranded class. Siblings
whose sources still match are other LIVE corpora (e.g. sf0.001 beside
sf0.1) and are kept.

Manifest placement (r9 ADVICE, medium): the manifest lives BESIDE the
layout directory (``base_dir/<fp>.manifest.json``), not inside it.
Several ensure_* builds write the layout with
``mode('overwrite').saveAsTable`` rooted at the fingerprint directory,
which deletes everything inside — an in-dir ``_manifest.json`` was
wiped by its own build, so the next ident call for a sibling corpus
saw a manifest-less LIVE layout and rmtree'd it, breaking build-once
caching and leaving registered catalog tables pointing at deleted
paths. The external file survives the overwrite. Legacy in-dir
``_manifest.json`` files are still read when no external one exists,
and a manifest-less directory that carries ``_SUCCESS`` is treated as
live (a completed build from a concurrent session or the pre-manifest
era), never swept; only manifest-less dirs with no ``_SUCCESS`` —
aborted partial builds — are removed.

Concurrency note: the sweep may delete a layout another Spark session
has registered in its catalog — that session's next read fails and its
ensure_* rebuilds. Single-machine scratch semantics; a shared cluster
cache would need a lease, which is out of scope for a local .cache.
"""

from __future__ import annotations

import json
import os
import shutil

_MANIFEST = "_manifest.json"  # legacy in-dir name (read-only compat)
_SUFFIX = ".manifest.json"  # external sibling-file name


def _stat_entry(path: str) -> list:
    st = os.stat(path)
    return [st.st_size, int(st.st_mtime)]


def _external_manifest_path(layout_dir: str) -> str:
    layout_dir = layout_dir.rstrip(os.sep)
    return os.path.join(
        os.path.dirname(layout_dir),
        os.path.basename(layout_dir) + _SUFFIX,
    )


def write_manifest(layout_dir: str, source_files: list[str]) -> None:
    """Record the layout's source files and their stats (idempotent —
    re-written on every ident call). Written OUTSIDE the layout dir so
    a ``mode('overwrite')`` build rooted there cannot delete it."""
    os.makedirs(layout_dir, exist_ok=True)
    manifest = {
        "sources": {
            os.path.abspath(f): _stat_entry(f) for f in source_files
        }
    }
    target = _external_manifest_path(layout_dir)
    tmp = target + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    os.replace(tmp, target)
    # Drop a stale legacy in-dir copy so it can never disagree.
    legacy = os.path.join(layout_dir, _MANIFEST)
    if os.path.exists(legacy):
        try:
            os.remove(legacy)
        except OSError:
            pass


def _read_sources(base_dir: str, name: str) -> dict | None:
    """The manifest sources for sibling ``name``, from the external
    file or (legacy) the in-dir copy; None when neither exists."""
    for mpath in (
        os.path.join(base_dir, name + _SUFFIX),
        os.path.join(base_dir, name, _MANIFEST),
    ):
        if os.path.exists(mpath):
            with open(mpath) as fh:
                return json.load(fh)["sources"]
    return None


def gc_stale_siblings(base_dir: str, keep_name: str) -> list[str]:
    """Remove sibling fingerprint directories of ``base_dir`` whose
    manifest sources are missing/changed, plus manifest-less partial
    builds (no ``_SUCCESS``). Manifest-less dirs WITH ``_SUCCESS`` are
    completed live layouts and are kept. Returns the removed directory
    names (for tests/logging)."""
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
        stale = False
        try:
            sources = _read_sources(base_dir, name)
        except (OSError, ValueError, KeyError):
            stale = True  # unreadable manifest: treat as stranded
        else:
            if sources is None:
                # No manifest at all: a completed build (_SUCCESS)
                # is live; anything else is an aborted partial.
                stale = not os.path.exists(
                    os.path.join(d, "_SUCCESS")
                )
            else:
                for f, st in sources.items():
                    if not os.path.exists(f) or _stat_entry(f) != st:
                        stale = True
                        break
        if stale:
            shutil.rmtree(d, ignore_errors=True)
            for mpath in (os.path.join(base_dir, name + _SUFFIX),):
                try:
                    os.remove(mpath)
                except OSError:
                    pass
            removed.append(name)
    return removed


def manifest_and_gc(
    layout_dir: str, source_files: list[str]
) -> list[str]:
    """The one-call form every ident function uses: write/refresh this
    layout's manifest, then sweep stale siblings of the same kind."""
    write_manifest(layout_dir, source_files)
    return gc_stale_siblings(
        os.path.dirname(layout_dir.rstrip(os.sep)),
        os.path.basename(layout_dir.rstrip(os.sep)),
    )
