"""LSH hot-bucket cap behavior (VERDICT r1 item 4/5): the cap actually
bounds per-bucket participation, degrades to the uncapped pair set when
slack, and the verified-pairs pipeline returns only threshold-passing
candidate pairs."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_etl_studio_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    LSH_BUCKET_CAP,
    _band_df,
    _lsh_candidate_pairs,
    dedup_lsh_verified_pairs,
    dedup_ngram_jaccard,
)

SF_DIR = "/root/testdata/sf0.001"


def test_cap_bounds_bucket_participation(spark):
    cap = 2
    from pyspark.sql import Window

    bands = _band_df(spark, SF_DIR)
    w = Window.partitionBy("band", "band_key").orderBy("doc_id")
    capped = bands.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= cap)
    max_bucket = (
        capped.groupBy("band", "band_key").count().agg(F.max("count")).collect()[0][0]
    )
    assert max_bucket <= cap
    # and the raw bands DO have at least one bucket above the tiny cap,
    # otherwise this test proves nothing
    raw_max = bands.groupBy("band", "band_key").count().agg(F.max("count")).collect()[0][0]
    assert raw_max > cap


def test_slack_cap_equals_uncapped(spark):
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    uncapped = {tuple(r) for r in _lsh_candidate_pairs(spark, SF_DIR).collect()}
    slack = {
        tuple(r) for r in _lsh_candidate_pairs(spark, SF_DIR, cap=n_docs).collect()
    }
    assert uncapped == slack


def test_capped_pairs_subset_of_uncapped(spark):
    uncapped = {tuple(r) for r in _lsh_candidate_pairs(spark, SF_DIR).collect()}
    capped = {
        tuple(r)
        for r in _lsh_candidate_pairs(spark, SF_DIR, cap=LSH_BUCKET_CAP).collect()
    }
    assert capped <= uncapped


def test_verified_pairs_are_true_near_dups(spark):
    verified = {
        (r.doc_id_1, r.doc_id_2): r.jaccard
        for r in dedup_lsh_verified_pairs(spark, SF_DIR).collect()
    }
    exact = {
        (r.doc_id_1, r.doc_id_2): r.jaccard
        for r in dedup_ngram_jaccard(spark, SF_DIR).collect()
    }
    # every verified pair is a genuine >=threshold pair with the exact
    # all-pairs jaccard value
    for pair, j in verified.items():
        assert j >= JACCARD_THRESHOLD
        assert pair in exact
        assert abs(exact[pair] - j) < 1e-12


def test_simhash_drops_null_text_docs(spark, tmp_path):
    """NULL-text documents are dropped (matching the oracle's exploded
    form) rather than emitted as a spurious simhash-0 row."""
    from ai_etl_studio_spark.operators.dedup import dedup_simhash

    sf = str(tmp_path)
    spark.createDataFrame(
        [(1, "alpha beta gamma", "en", "web", 16),
         (2, None, "en", "web", 0),
         (3, "alpha beta gamma", "en", "web", 16)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(f"{sf}/documents.parquet")
    out = {r.doc_id: r.simhash for r in dedup_simhash(spark, sf).collect()}
    assert set(out) == {1, 3}
    assert out[1] == out[3]


def test_lsh_recall_by_band_truth_and_invariants(spark):
    """The truth side of the recall eval equals a pure-python exact
    Jaccard over the deterministic doc sample, and identical documents
    (j-band 9) are always caught by the banded join."""
    import re
    from collections import defaultdict

    from ai_etl_studio_spark.operators import load_all

    queries, _ = load_all()
    rows = queries["lsh_recall_by_band"](spark, "/root/testdata/sf0.001").collect()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").collect()
    sh = {}
    for d in docs:
        if d.doc_id % 2 or d.text is None:
            continue
        toks = re.split(r"\s+", d.text.lower())
        if len(toks) < 3:
            continue
        sh[d.doc_id] = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
    ids = sorted(sh)
    band_counts = defaultdict(int)
    for i, d1 in enumerate(ids):
        for d2 in ids[i + 1 :]:
            inter = len(sh[d1] & sh[d2])
            if not inter:
                continue
            j = inter / (len(sh[d1]) + len(sh[d2]) - inter)
            if j >= 0.2:
                band_counts[min(9, int(j * 10))] += 1
    got = {r.j_band: r.n_true for r in rows}
    assert got == dict(band_counts)
    for r in rows:
        assert 0 <= r.n_caught <= r.n_true
        assert r.recall_micro == round(r.n_caught / r.n_true * 1e6)
        if r.j_band == 9:
            # identical shingle sets collide on every band
            assert r.recall_micro == 1_000_000


def test_minhash_calibration_error_bound(spark):
    """The measured mean absolute error of the 16-component estimator
    stays within 3× the theoretical σ ≈ √(j(1−j)/16) per band, and the
    estimate mass is consistent with the band's true similarity."""
    from ai_etl_studio_spark.operators import load_all

    queries, _ = load_all()
    rows = queries["minhash_estimate_calibration"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert r.n_pairs > 0
        mean_est = r.sum_est_micro / r.n_pairs / 1e6
        mae = r.sum_abs_err_micro / r.n_pairs / 1e6
        assert 0.0 <= mean_est <= 1.0
        j_mid = min(r.j_band / 10 + 0.05, 1.0)
        sigma = (j_mid * (1 - j_mid) / 16) ** 0.5
        assert mae <= 3 * sigma + 0.1, (r.j_band, mae, sigma)
    # the exact-duplicate band estimates ~1.0 with ~zero error
    top = {r.j_band: r for r in rows}
    if 9 in top:
        assert top[9].sum_abs_err_micro / top[9].n_pairs <= 100_000


def test_ann_ivf_recall_eval_bounds(spark):
    """IVF recall per query is in [0, 1], denominators equal TOPK, and
    probing all lists would be exact — the eval's own sanity floor:
    recall must beat the NPROBE/N_CENTROIDS random-lists baseline."""
    from ai_etl_studio_spark.operators import load_all
    from ai_etl_studio_spark.operators.similarity import (
        N_QUERIES,
        TOPK,
    )

    queries, _ = load_all()
    rows = queries["ann_ivf_recall_eval"](spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == N_QUERIES
    rec = [r.recall_micro / 1e6 for r in rows]
    for r in rows:
        assert r.n_exact == TOPK
        assert 0 <= r.n_hit <= r.n_exact
        assert r.recall_micro == round(r.n_hit / r.n_exact * 1e6)
    # average recall across queries clears the random-probe baseline
    assert sum(rec) / len(rec) > 4 / 16
