"""Storage-layout maintenance: small-file compaction and Z-order
clustering, verified against the actual parquet footers — the same
min/max statistics a scan's file-skipping consults."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from ai_etl_studio_spark.catalog import load_table
from ai_etl_studio_spark.sources.maintenance import (
    candidate_files,
    compact_parquet,
    zorder_write,
)
from tests.conftest import SF_DIR


def test_compact_parquet_reduces_files_losslessly(spark, tmp_path):
    frag = str(tmp_path / "fragmented")
    out = str(tmp_path / "compacted")
    docs = load_table(spark, SF_DIR, "documents")
    docs.repartition(40).write.parquet(frag)  # simulate a drip-writer
    assert len(glob.glob(os.path.join(frag, "part-*"))) == 40

    audit = compact_parquet(spark, frag, out, target_mb=128)
    assert audit["files_in"] == 40
    assert audit["files_out"] == audit["target_files"] < 40
    assert spark.read.parquet(out).count() == docs.count()
    # content identical, not just counts
    assert (
        spark.read.parquet(out)
        .exceptAll(spark.read.parquet(frag))
        .count()
        == 0
    )


def test_zorder_prunes_on_the_second_dimension(spark, tmp_path):
    """A layout sorted by suppkey alone cannot skip files for a partkey
    predicate (every file spans the full partkey range); the Z-ordered
    layout must."""
    # sf0.01: enough rows (~600k) that every range partition is non-empty
    li = load_table(spark, "/root/testdata/sf0.01", "lineitem").select(
        "l_orderkey", "l_suppkey", "l_partkey", "l_quantity"
    )
    n_files = 16

    linear = str(tmp_path / "linear")
    (
        li.repartitionByRange(n_files, "l_suppkey")
        .sortWithinPartitions("l_suppkey")
        .write.parquet(linear)
    )
    zord = str(tmp_path / "zorder")
    zorder_write(li, ("l_suppkey", "l_partkey"), zord, n_files=n_files)

    # same data, different layout
    assert spark.read.parquet(zord).exceptAll(li).count() == 0
    assert spark.read.parquet(zord).count() == li.count()

    # a narrow partkey band (the NON-sorted dimension)
    pmax = li.agg(F.max("l_partkey")).collect()[0][0]
    lo, hi = 1, max(2, pmax // 16)

    lin_cand, lin_total = candidate_files(linear, "l_partkey", lo, hi)
    z_cand, z_total = candidate_files(zord, "l_partkey", lo, hi)
    assert lin_cand == lin_total  # linear layout: zero pruning on dim 2
    assert z_cand <= z_total // 2  # z-order: real file-skipping

    # and the z layout still prunes on the first dimension too
    smax = li.agg(F.max("l_suppkey")).collect()[0][0]
    zs_cand, zs_total = candidate_files(zord, "l_suppkey", 1, max(2, smax // 16))
    assert zs_cand < zs_total
