"""Write-side check of the hash-sharded training export: shard
directories exist, read-back is lossless, shard assignment matches the
manifest, and re-running is idempotent (overwrite, no stale parts)."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F

from ai_etl_studio_spark.catalog import load_table
from ai_etl_studio_spark.operators.training import (
    N_SHARDS,
    shard_of,
    write_training_shards,
)
from tests.conftest import SF_DIR


def test_write_training_shards_roundtrip(spark, tmp_path):
    out = str(tmp_path / "shards")
    manifest = write_training_shards(spark, SF_DIR, out)

    shard_dirs = sorted(glob.glob(os.path.join(out, "shard=*")))
    assert len(shard_dirs) == N_SHARDS  # every shard non-empty at this SF

    back = spark.read.parquet(out)
    corpus = load_table(spark, SF_DIR, "documents")
    assert back.count() == corpus.count()
    # partition value round-trips as the hash of the doc ids inside it
    bad = back.filter(
        F.col("shard").cast("long") != shard_of(F.col("doc_id"))
    ).count()
    assert bad == 0

    # manifest agrees with the files on disk
    mrows = {r["shard"]: r["n_docs"] for r in (json.loads(line) for line in open(
        glob.glob(os.path.join(out + "_manifest", "part-*.json"))[0]
    ))}
    disk = {
        r.shard: r.cnt
        for r in back.groupBy("shard").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert {int(k): v for k, v in disk.items()} == mrows

    # idempotent re-export: same counts, no stale files
    write_training_shards(spark, SF_DIR, out)
    assert spark.read.parquet(out).count() == corpus.count()


def test_shards_are_balanced(spark):
    """The multiplicative hash must spread clustered doc_ids: no shard
    holds more than 3x the mean."""
    from ai_etl_studio_spark.operators.training import export_shards

    rows = export_shards(spark, SF_DIR).collect()
    n = [r.n_docs for r in rows]
    assert max(n) <= 3 * (sum(n) / len(n))
