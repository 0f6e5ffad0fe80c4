"""Keyword-search ranking over the ``documents`` table: BM25.

The retrieval half of a training-data pipeline (targeted corpus pulls,
contamination hunting, eval-set curation) — a full-corpus BM25 ranker
expressed as pure DataFrame ops. No UDFs; everything stays in
whole-stage codegen.

Design note (the plan that earned this shape): the naive explode →
tf/df/dl/stats formulation scans-and-explodes the corpus FOUR times
(Spark does not reuse identical subplans) and shuffles exploded tokens.
Because the query-term set is small and fixed, tf/dl are instead
per-row higher-order-function expressions — ``size(filter(split(...)))``
— so the per-doc profile is a narrow projection with ZERO shuffles, and
the only exchanged rows are one corpus-stats row broadcast back for
scoring. See PLANS.md.

The reference (balyuv/ai-etl-studio) has no text search of any kind (its
only string predicate is equality, prompts.py:120); this module is
driver-directed extension surface, designed Spark-first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_etl_studio_spark.catalog import load_table
from ai_etl_studio_spark.operators import ORACLES, register

#: BM25 hyperparameters (the standard Robertson/Okapi defaults).
BM25_K1 = 1.2
BM25_B = 0.75

#: The fixed query (terms present in the synthetic corpus lexicon).
QUERY_TERMS = ("spark", "hash", "join", "stream")

#: Result-set size.
TOPK = 20

#: Contributions are quantized to integer ticks of 1e-9 before the
#: cross-term sum so both engines add exactly (IEEE doubles added in a
#: fixed written order would also match, but integers are self-evident).
TICKS = 1_000_000_000


def _oracle() -> str:
    """Build the DuckDB twin with the SAME expression structure (term
    by term, identical parenthesization) as the Spark side."""
    split = r"string_split_regex(lower(text), '\s+')"
    tf_cols = ",\n             ".join(
        f"len(list_filter({split}, x -> x = '{t}')) AS tf_{i}"
        for i, t in enumerate(QUERY_TERMS)
    )
    df_cols = ",\n             ".join(
        f"count_if(tf_{i} > 0) AS df_{i}" for i in range(len(QUERY_TERMS))
    )
    matched = " + ".join(
        f"CAST(tf_{i} > 0 AS INT)" for i in range(len(QUERY_TERMS))
    )

    def tick(i: int) -> str:
        idf = (
            f"ln(1.0 + (CAST(n_docs - df_{i} AS DOUBLE) + 0.5)"
            f" / (CAST(df_{i} AS DOUBLE) + 0.5))"
        )
        denom = (
            f"CAST(tf_{i} AS DOUBLE) + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B}"
            f" * CAST(dl AS DOUBLE) / (CAST(total_tokens AS DOUBLE) / n_docs))"
        )
        return (
            f"CAST(round(({idf} * (CAST(tf_{i} AS DOUBLE) * {BM25_K1 + 1.0}))"
            f" / ({denom}) * {TICKS}, 0) AS BIGINT)"
        )

    ticks = " + ".join(tick(i) for i in range(len(QUERY_TERMS)))
    return f"""
    WITH profile AS (
      SELECT doc_id, len({split}) AS dl,
             {tf_cols}
      FROM documents),
    stats AS (
      SELECT COUNT(*) AS n_docs, SUM(dl) AS total_tokens,
             {df_cols}
      FROM profile),
    scored AS (
      SELECT doc_id, {matched} AS n_terms_matched,
             {ticks} AS score_ticks
      FROM profile, stats)
    SELECT doc_id, n_terms_matched,
           round(CAST(score_ticks AS DOUBLE) / {TICKS}, 6) AS bm25
    FROM scored WHERE n_terms_matched > 0
    ORDER BY score_ticks DESC, doc_id
    LIMIT {TOPK}
    """


@register("bm25_search", oracle=_oracle())
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-{TOPK} over the corpus for a fixed multi-term query.

    Shape: a narrow per-doc profile (doc length + one tf column per
    query term, all ``size(filter(tokens))`` expressions — no explode,
    no shuffle), one tiny corpus-stats aggregate (N, total tokens, per-
    term df) broadcast back, then a scalar scoring expression and a
    TakeOrderedAndProject top-k. The corpus is scanned twice (stats +
    scoring) but never exploded and never shuffled; the only exchanged
    rows are the 1-row stats and the per-task top-{TOPK} heaps. At
    100 TB you'd persist the profile as a sidecar table and keep stats
    incrementally — the query shape is unchanged.

    Exactness: each (doc, term) contribution is quantized to integer
    {TICKS}-ticks and summed in written term order; the scalar
    expression is built with identical parenthesization in both engines
    (IEEE ops are correctly rounded, so ticks match bit-for-bit).
    Top-k is total-ordered by the (score, doc_id) tie-break.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), r"\s+")

    def eq(term: str):
        return lambda x: x == F.lit(term)

    profile = d.select(
        "doc_id",
        F.size(toks).alias("dl"),
        *[
            F.size(F.filter(toks, eq(t))).alias(f"tf_{i}")
            for i, t in enumerate(QUERY_TERMS)
        ],
    )
    stats = profile.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_tokens"),
        *[
            F.count_if(F.col(f"tf_{i}") > 0).alias(f"df_{i}")
            for i in range(len(QUERY_TERMS))
        ],
    )

    def tick(i: int) -> Column:
        tfd = F.col(f"tf_{i}").cast("double")
        dfd = F.col(f"df_{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + ((F.col("n_docs") - F.col(f"df_{i}")).cast("double") + 0.5)
            / (dfd + 0.5)
        )
        denom = tfd + BM25_K1 * (
            1.0
            - BM25_B
            + BM25_B
            * F.col("dl").cast("double")
            / (F.col("total_tokens").cast("double") / F.col("n_docs"))
        )
        return F.round((idf * (tfd * (BM25_K1 + 1.0))) / denom * TICKS, 0).cast(
            "bigint"
        )

    matched = sum(
        (F.col(f"tf_{i}") > 0).cast("int") for i in range(len(QUERY_TERMS))
    )
    score_ticks = sum(tick(i) for i in range(len(QUERY_TERMS)))
    return (
        profile.crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            matched.alias("n_terms_matched"),
            score_ticks.alias("score_ticks"),
        )
        .filter(F.col("n_terms_matched") > 0)
        .orderBy(F.desc("score_ticks"), "doc_id")
        .limit(TOPK)
        .select(
            "doc_id",
            "n_terms_matched",
            F.round(F.col("score_ticks").cast("double") / TICKS, 6).alias("bm25"),
        )
    )



@register("dirichlet_lm_search", oracle="\n    WITH profile AS (\n      SELECT doc_id,\n             len(string_split_regex(lower(text), '\\s+')) AS dl,\n             len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x = 'spark')) AS tf_0,\n             len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x = 'hash')) AS tf_1,\n             len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x = 'join')) AS tf_2,\n             len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x = 'stream')) AS tf_3\n      FROM documents),\n    stats AS (\n      SELECT CAST(SUM(dl) AS BIGINT) AS total_tokens, CAST(SUM(tf_0) AS BIGINT) AS ctf_0,\n             CAST(SUM(tf_1) AS BIGINT) AS ctf_1,\n             CAST(SUM(tf_2) AS BIGINT) AS ctf_2,\n             CAST(SUM(tf_3) AS BIGINT) AS ctf_3\n      FROM profile),\n    scored AS (\n      SELECT doc_id, dl,\n             CAST(round(ln((CAST(tf_0 AS DOUBLE) + 2000E0 * ctf_0 / total_tokens) / (CAST(dl AS DOUBLE) + 2000E0)) * 1000000000E0, 0) AS BIGINT)\n           + CAST(round(ln((CAST(tf_1 AS DOUBLE) + 2000E0 * ctf_1 / total_tokens) / (CAST(dl AS DOUBLE) + 2000E0)) * 1000000000E0, 0) AS BIGINT)\n           + CAST(round(ln((CAST(tf_2 AS DOUBLE) + 2000E0 * ctf_2 / total_tokens) / (CAST(dl AS DOUBLE) + 2000E0)) * 1000000000E0, 0) AS BIGINT)\n           + CAST(round(ln((CAST(tf_3 AS DOUBLE) + 2000E0 * ctf_3 / total_tokens) / (CAST(dl AS DOUBLE) + 2000E0)) * 1000000000E0, 0) AS BIGINT) AS score_ticks\n      FROM profile, stats)\n    SELECT doc_id, dl, score_ticks\n    FROM scored ORDER BY score_ticks DESC, doc_id LIMIT 20\n")
def dirichlet_lm_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet-prior smoothing
    (mu=2000, the Zhai-Lafferty standard) for the same fixed query as
    bm25_search: score(d) = Sum_t ln((tf + mu*p(t|C)) / (dl + mu)).
    The language-modeling family is BM25's main rival in IR — it has
    an explicit length normalization (the mu denominator) and a
    principled back-off to collection statistics, and it scores EVERY
    document (smoothing means zero-match docs still rank, by length) —
    so running both and comparing top-k disagreement (rbo-style) is
    the standard ranker-sanity check before a targeted corpus pull.

    Shape: identical to bm25_search — narrow no-explode per-doc
    profile, one broadcast stats row (total tokens + per-term
    COLLECTION frequencies, where BM25 needs document frequencies),
    scalar scoring, TakeOrderedAndProject. Two corpus scans, zero
    shuffles of document rows.

    Exactness: each (doc, term) log-likelihood contribution quantizes
    to integer nano-ticks and sums in written term order; the
    expression template is ONE string shared between both engines;
    top-k is total-ordered by (score, doc_id).
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), r"\s+")

    def eq(term: str):
        return lambda x: x == F.lit(term)

    profile = d.select(
        "doc_id",
        F.size(toks).alias("dl"),
        *[
            F.size(F.filter(toks, eq(t))).alias(f"tf_{i}")
            for i, t in enumerate(QUERY_TERMS)
        ],
    )
    stats = profile.agg(
        F.sum("dl").cast("bigint").alias("total_tokens"),
        *[
            F.sum(f"tf_{i}").cast("bigint").alias(f"ctf_{i}")
            for i in range(len(QUERY_TERMS))
        ],
    )
    scored = profile.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        "dl",
        F.expr('CAST(round(ln((CAST(tf_0 AS DOUBLE) + 2000E0 * ctf_0 / total_tokens) / (CAST(dl AS DOUBLE) + 2000E0)) * 1000000000E0, 0) AS BIGINT)\n           + CAST(round(ln((CAST(tf_1 AS DOUBLE) + 2000E0 * ctf_1 / total_tokens) / (CAST(dl AS DOUBLE) + 2000E0)) * 1000000000E0, 0) AS BIGINT)\n           + CAST(round(ln((CAST(tf_2 AS DOUBLE) + 2000E0 * ctf_2 / total_tokens) / (CAST(dl AS DOUBLE) + 2000E0)) * 1000000000E0, 0) AS BIGINT)\n           + CAST(round(ln((CAST(tf_3 AS DOUBLE) + 2000E0 * ctf_3 / total_tokens) / (CAST(dl AS DOUBLE) + 2000E0)) * 1000000000E0, 0) AS BIGINT)').alias("score_ticks"),
    )
    return scored.orderBy(F.desc("score_ticks"), "doc_id").limit(20)


#: RRF constant (Cormack et al.'s k = 60) and fused-list size.
RRF_K = 60
RRF_TOPK = 15
#: integer RRF contribution: floor(1e9 / (k + rank)) — exact in both
#: engines, so fused scores sum as integers.
RRF_TICKS = 1_000_000_000


@register(
    "rrf_hybrid_search",
    oracle=f"""
    WITH lex AS ({ORACLES["bm25_search"]}),
    lrank AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r
      FROM lex),
    quant AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> CAST(round(x * 1000000, 0) AS BIGINT)) AS v
      FROM embeddings),
    q AS (SELECT v AS qv FROM quant WHERE vec_id = 0),
    sc AS (
      SELECT vec_id,
             list_sum(list_transform(range(1, len(v) + 1),
               i -> v[i] * qv[i])) AS dot_i,
             list_sum(list_transform(v, x -> x * x)) AS n1_i,
             list_sum(list_transform(qv, x -> x * x)) AS n2_i
      FROM quant, q WHERE vec_id > 0),
    srank AS (
      SELECT vec_id AS doc_id,
             ROW_NUMBER() OVER (ORDER BY round(CAST(dot_i AS DOUBLE)
               / (sqrt(CAST(n1_i AS DOUBLE)) * sqrt(CAST(n2_i AS DOUBLE))),
               6) DESC, vec_id) AS r
      FROM sc
      ORDER BY r LIMIT 20),
    fused AS (
      SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
             CAST(CASE WHEN l.r IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
               AS in_lexical,
             CAST(CASE WHEN s.r IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
               AS in_semantic,
             CAST(COALESCE({RRF_TICKS} // ({RRF_K} + l.r), 0)
               + COALESCE({RRF_TICKS} // ({RRF_K} + s.r), 0) AS BIGINT)
               AS rrf_ticks
      FROM lrank l FULL JOIN srank s ON s.doc_id = l.doc_id)
    SELECT doc_id, in_lexical, in_semantic, rrf_ticks
    FROM fused
    ORDER BY rrf_ticks DESC, doc_id
    LIMIT {RRF_TOPK}
    """,
)
def rrf_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the LEXICAL (BM25 top-20) and
    SEMANTIC (exact int-quantized cosine top-20 vs query vector 0)
    rankings — the standard hybrid-retrieval combiner (Cormack et al.,
    k = 60): rrf(d) = Sum_lists 1/(k + rank_d). RRF needs no score
    calibration between the legs (BM25 ticks and cosine live on
    incomparable scales — rank is the only shared currency), which is
    exactly why it is the default fuser in every hybrid-search stack;
    the in_lexical/in_semantic flags show which leg carried each hit.

    Exactness: each leg's ranking is the REGISTERED device (BM25's
    quantized ticks; the cosine oracle's exact integer dot/norm with
    6dp rounding + id tie-break), and each RRF contribution is the
    exact integer floor(1e9/(k + r)) — fused scores are integer sums,
    no float ever compares.

    Scale: both legs are top-k lists (broadcast-sized) regardless of
    corpus size; the fusion is a 20x20 full outer join. The legs
    themselves scan the corpus once each — at 100 TB they ride their
    own ops' scale designs (BM25's no-explode profile, the IVF index
    for the semantic leg).
    """
    lex = bm25_search(spark, sf_dir)
    wl = Window.orderBy(F.desc("bm25"), "doc_id")
    lrank = lex.select("doc_id", F.row_number().over(wl).alias("rl"))
    from ai_etl_studio_spark.catalog import spread_small_scan

    # corpus spread when the scan is under-split (r11, guide §2.5)
    emb = spread_small_scan(spark, load_table(spark, sf_dir, "embeddings"))
    quant = emb.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x.cast("double") * 1_000_000, 0).cast(
                "bigint"
            ),
        ).alias("v"),
    )
    q = quant.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    sc = quant.filter(F.col("vec_id") > 0).crossJoin(F.broadcast(q)).select(
        "vec_id",
        F.aggregate(
            F.zip_with(F.col("v"), F.col("qv"), lambda a, b: a * b),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("dot_i"),
        F.aggregate(
            F.transform(F.col("v"), lambda x: x * x),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("n1_i"),
        F.aggregate(
            F.transform(F.col("qv"), lambda x: x * x),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("n2_i"),
    )
    ws = Window.orderBy(
        F.desc(
            F.round(
                F.col("dot_i").cast("double")
                / (
                    F.sqrt(F.col("n1_i").cast("double"))
                    * F.sqrt(F.col("n2_i").cast("double"))
                ),
                6,
            )
        ),
        "vec_id",
    )
    srank = (
        sc.select(
            F.col("vec_id").alias("doc_id"),
            F.row_number().over(ws).alias("rs"),
        )
        .filter(F.col("rs") <= 20)
    )
    fused = lrank.join(srank, "doc_id", "full").select(
        "doc_id",
        F.when(F.col("rl").isNotNull(), 1).otherwise(0)
        .cast("bigint")
        .alias("in_lexical"),
        F.when(F.col("rs").isNotNull(), 1).otherwise(0)
        .cast("bigint")
        .alias("in_semantic"),
        (
            F.coalesce(
                F.expr(f"{RRF_TICKS} DIV ({RRF_K} + rl)"), F.lit(0)
            )
            + F.coalesce(
                F.expr(f"{RRF_TICKS} DIV ({RRF_K} + rs)"), F.lit(0)
            )
        )
        .cast("bigint")
        .alias("rrf_ticks"),
    )
    return fused.orderBy(F.desc("rrf_ticks"), "doc_id").limit(RRF_TOPK)
