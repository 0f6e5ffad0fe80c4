"""The IVF write-side scale path, demonstrated for real: persist the
coarse-quantized corpus PARTITIONED BY centroid id, and show a probe
query (a) prunes the scan to its nprobe partitions (PartitionFilters,
not a post-scan filter) and (b) returns the same top-k as scanning
everything restricted to those lists."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_etl_studio_spark.catalog import load_table
from ai_etl_studio_spark.operators.similarity import cosine
from tests.conftest import SF_DIR

N_CENT = 16
NPROBE = 4
TOP_K = 5


def _assignments(spark):
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").alias("emb")
    )
    cent = emb.filter(F.col("vec_id") < N_CENT).select(
        F.col("vec_id").alias("centroid_id"), F.col("emb").alias("cemb")
    )
    scored = emb.crossJoin(F.broadcast(cent)).withColumn(
        "cos_c", cosine(F.col("emb"), F.col("cemb"))
    )
    order_key = F.struct(F.col("cos_c"), (-F.col("centroid_id")).alias("negid"))
    return (
        scored.groupBy("vec_id")
        .agg(F.max_by(F.struct("centroid_id", "emb"), order_key).alias("b"))
        .select("vec_id", F.col("b.centroid_id").alias("centroid_id"), F.col("b.emb").alias("emb")),
        scored,
    )


def test_partitioned_ivf_index_prunes_and_answers(spark, tmp_path):
    idx_path = str(tmp_path / "ivf_index")
    assign, scored = _assignments(spark)
    assign.write.mode("overwrite").partitionBy("centroid_id").parquet(idx_path)

    # probe lists for query vector 0: its NPROBE nearest centroids
    probe_ids = [
        r.centroid_id
        for r in scored.filter(F.col("vec_id") == 0)
        .orderBy(F.desc("cos_c"), F.asc("centroid_id"))
        .limit(NPROBE)
        .collect()
    ]
    q_emb = (
        load_table(spark, SF_DIR, "embeddings").filter(F.col("vec_id") == 0).collect()
    )[0].embedding

    index = spark.read.parquet(idx_path)
    probed = index.filter(F.col("centroid_id").isin(probe_ids))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    # pruning happened at the scan: partition filters present, and the
    # scan reads only the probed directories
    assert "PartitionFilters" in plan and "centroid_id" in plan.split(
        "PartitionFilters", 1
    )[1][:200]

    q_lit = F.array(*[F.lit(float(x)) for x in q_emb])
    got = (
        probed.filter(F.col("vec_id") != 0)
        .select("vec_id", cosine(F.col("emb"), q_lit).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(TOP_K)
        .collect()
    )
    # same answer as restricting the unpartitioned assignment frame
    want = (
        assign.filter(F.col("centroid_id").isin(probe_ids))
        .filter(F.col("vec_id") != 0)
        .select("vec_id", cosine(F.col("emb"), q_lit).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(TOP_K)
        .collect()
    )
    assert [(r.vec_id, round(r.cos, 9)) for r in got] == [
        (r.vec_id, round(r.cos, 9)) for r in want
    ]
    # the index really fans out into one directory per centroid
    import os

    dirs = [d for d in os.listdir(idx_path) if d.startswith("centroid_id=")]
    assert len(dirs) == N_CENT


def test_pq_code_index_builds_once_and_serves_identically(spark, tmp_path):
    """The PQ code table mirrors the IVF/PageRank/boilerplate build-once
    pattern: second ensure skips the build; serving from codes is
    row-identical to the from-scratch encode."""
    import os

    from ai_etl_studio_spark.operators.similarity import (
        PQ_K,
        PQ_M,
        ann_pq_from_index,
        ann_pq_topk,
        ensure_pq_code_index,
    )
    from tests.conftest import SF_DIR

    base = str(tmp_path / "pq_idx")
    tbl = ensure_pq_code_index(spark, SF_DIR, base_dir=base)
    success = os.path.join(base, tbl, "_SUCCESS")
    assert os.path.exists(success)
    built_at = os.path.getmtime(success)
    assert ensure_pq_code_index(spark, SF_DIR, base_dir=base) == tbl
    assert os.path.getmtime(success) == built_at

    codes = spark.table(tbl)
    n_vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert codes.count() == n_vecs * PQ_M
    assert codes.agg({"k": "max"}).first()[0] < PQ_K

    scratch = [tuple(r) for r in ann_pq_topk(spark, SF_DIR).collect()]
    served = [tuple(r) for r in ann_pq_from_index(spark, SF_DIR).collect()]
    assert served == scratch


# ---------------------------------------------------------------------------
# IVF-PQ combined serve (round 5)
# ---------------------------------------------------------------------------

def test_ivfpq_refined_recall_matches_ivf_path(spark):
    """The hybrid's acceptance bar (r4 verdict item 7): refined IVF-PQ
    recall@k must not lose to the IVF-only path on the same queries —
    PQ shortlists, the exact re-rank restores the ordering."""
    from ai_etl_studio_spark.operators.similarity import (
        ann_ivf_recall_eval,
        ann_ivfpq_recall_eval,
    )

    ivf = {
        r["query_id"]: r["recall_micro"]
        for r in ann_ivf_recall_eval(spark, SF_DIR).collect()
    }
    hybrid = {
        r["query_id"]: r["recall_micro"]
        for r in ann_ivfpq_recall_eval(spark, SF_DIR).collect()
    }
    assert set(hybrid) == set(ivf)
    for q in ivf:
        assert hybrid[q] >= ivf[q], (q, hybrid[q], ivf[q])


def test_ivfpq_topk_agrees_with_ivf_on_shared_neighbors(spark):
    """Where both paths return a neighbor for a query, the exact-cosine
    re-rank must give the hybrid the SAME rounded score the IVF path
    computed — the refine step scores with raw vectors, not codes."""
    from ai_etl_studio_spark.operators.similarity import (
        ann_ivf_topk,
        ann_ivfpq_topk,
    )

    ivf = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in ann_ivf_topk(spark, SF_DIR).collect()
    }
    hy = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in ann_ivfpq_topk(spark, SF_DIR).collect()
    }
    shared = set(ivf) & set(hy)
    assert shared  # the two paths overlap on this corpus
    for key in shared:
        assert abs(ivf[key] - hy[key]) < 1e-9


def test_ivfpq_plan_contracts(spark):
    from ai_etl_studio_spark.operators.similarity import ann_ivfpq_topk
    from ai_etl_studio_spark.plans.guard import explain_str
    from ai_etl_studio_spark.plans.tripwire import broadcast_violations

    df = ann_ivfpq_topk(spark, SF_DIR)
    assert broadcast_violations(df) == []
    tree = explain_str(df, "formatted").split("\n\n")[0]
    # candidate scoring reads the persisted code table, never re-encodes
    assert "pq_codes_" in tree
    # the only nested-loop joins are the broadcast centroid/query
    # crossJoins (bounded-key-filtered); no CartesianProduct ever
    assert "CartesianProduct" not in tree
