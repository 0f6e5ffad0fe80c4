"""Keyword-search ranking over the ``documents`` table: BM25.

The retrieval half of a training-data pipeline (targeted corpus pulls,
contamination hunting, eval-set curation) — a full-corpus BM25 ranker
expressed as pure DataFrame ops: explode → two aggregations → broadcast
joins → scalar scoring expression. No UDFs; everything stays in
whole-stage codegen.

The reference (balyuv/ai-etl-studio) has no text search of any kind (its
only string predicate is equality, prompts.py:120); this module is
driver-directed extension surface, designed Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_etl_studio_spark.catalog import load_table
from ai_etl_studio_spark.operators import register

#: BM25 hyperparameters (the standard Robertson/Okapi defaults).
BM25_K1 = 1.2
BM25_B = 0.75

#: The fixed query (terms present in the synthetic corpus lexicon).
QUERY_TERMS = ("spark", "hash", "join", "stream")
_TERMS_SQL = "(" + ", ".join(f"'{t}'" for t in QUERY_TERMS) + ")"

#: Result-set size.
TOPK = 20


@register(
    "bm25_search",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term
      FROM documents),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_tokens FROM dl),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf
      FROM toks WHERE term IN {_TERMS_SQL}
      GROUP BY doc_id, term),
    idf AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
    contrib AS (
      SELECT t.doc_id,
             CAST(round(
               (ln(1.0 + (CAST(s.n_docs - i.df AS DOUBLE) + 0.5) / (CAST(i.df AS DOUBLE) + 0.5))
                * (CAST(t.tf AS DOUBLE) * {BM25_K1 + 1.0}))
               / (CAST(t.tf AS DOUBLE)
                  + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * CAST(d.dl AS DOUBLE)
                                 / (CAST(s.total_tokens AS DOUBLE) / s.n_docs)))
               * 1000000000, 0) AS BIGINT) AS score_ticks
      FROM tf t JOIN dl d ON t.doc_id = d.doc_id
      JOIN idf i ON t.term = i.term
      CROSS JOIN stats s),
    scored AS (
      SELECT doc_id, COUNT(*) AS n_terms_matched,
             SUM(score_ticks) AS score_ticks
      FROM contrib GROUP BY doc_id)
    SELECT doc_id, n_terms_matched,
           round(CAST(score_ticks AS DOUBLE) / 1000000000, 6) AS bm25
    FROM scored
    ORDER BY score_ticks DESC, doc_id
    LIMIT {TOPK}
    """,
)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-{TOPK} over the corpus for a fixed multi-term query.

    Shape: one explode pass feeds BOTH corpus stats (doc lengths,
    N, avgdl) and the query-term tf table (the term filter prunes the
    explode output to |query| terms before any shuffle). idf and the
    one-row corpus stats are broadcast back onto the tf table, so the
    only data-sized shuffles are the two groupBys on doc_id.

    Exactness: each (doc, term) contribution is quantized to integer
    nano-ticks BEFORE the per-doc sum (float addition order across
    terms is engine-dependent; integer sums are not — the repo's
    integer-cents discipline, functions/exact.py). The scalar
    expression itself is written with identical parenthesization in
    both engines, so IEEE-correctly-rounded ops produce bit-identical
    ticks. Top-k is made total by the (score, doc_id) tie-break.

    Scale: df/idf is |query|-rows, corpus stats is 1 row — both
    broadcast. The explode is the dominant cost and is narrow;
    at 100 TB you'd persist the (doc_id, dl) sidecar and the posting
    stats incrementally rather than recompute, but the query shape is
    unchanged.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("term")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_tokens")
    )
    tf = (
        toks.filter(F.col("term").isin(*QUERY_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))

    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    dfd = F.col("df").cast("double")
    avgdl = F.col("total_tokens").cast("double") / F.col("n_docs")
    idf_expr = F.log(
        F.lit(1.0) + ((F.col("n_docs") - F.col("df")).cast("double") + 0.5) / (dfd + 0.5)
    )
    contrib = (idf_expr * (tfd * (BM25_K1 + 1.0))) / (
        tfd + BM25_K1 * (1.0 - BM25_B + BM25_B * dld / avgdl)
    )
    ticks = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(contrib * 1_000_000_000, 0).cast("bigint").alias("score_ticks"),
        )
    )
    return (
        ticks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms_matched"),
            F.sum("score_ticks").alias("score_ticks"),
        )
        .orderBy(F.desc("score_ticks"), "doc_id")
        .limit(TOPK)
        .select(
            "doc_id",
            "n_terms_matched",
            F.round(F.col("score_ticks").cast("double") / 1_000_000_000, 6).alias(
                "bm25"
            ),
        )
    )
