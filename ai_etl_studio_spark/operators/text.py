"""Text-analysis operators over the ``documents`` table (driver-directed
extension: the ops a large-scale training-data pipeline needs).

All pure column expressions (JVM-side, codegen'd — no Python in the hot
path); each has an exact DuckDB oracle. The reference has no text
processing at all (its only string ops were equality predicates,
prompts.py:120), so this module is new capability, designed Spark-first.

Scale: every operator here is embarrassingly parallel (narrow, per-row),
so it scales linearly with input splits — the interesting part is keeping
it all in whole-stage codegen, which these expressions do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_etl_studio_spark.catalog import load_table
from ai_etl_studio_spark.functions.texthash import sql_md5_hash32
from ai_etl_studio_spark.operators import register

#: Tiny deterministic stopword list for quality/langid heuristics.
STOPWORDS = ("the", "a", "an", "of", "to", "and", "in", "is")
_SW_SQL = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"

#: Marker words per language for the n-gram/lexicon language-ID heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is"),
    "de": ("der", "und", "die", "ist"),
    "fr": ("le", "et", "les", "est"),
    "es": ("el", "y", "los", "es"),
    "zh": ("de5", "shi4", "le5", "he2"),  # pinyin-ish markers (latin corpus)
}


@register(
    "text_tokens",
    oracle=r"""
    SELECT doc_id,
           len(string_split_regex(lower(text), '\s+')) AS n_tokens,
           length(text) AS n_chars_computed,
           n_chars
    FROM documents
    ORDER BY doc_id
    """,
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace tokenizer) + char counts."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), r"\s+")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars_computed"),
        "n_chars",
    ).orderBy("doc_id")


@register(
    "text_quality",
    oracle=rf"""
    SELECT doc_id, n_tokens, stop_ratio, distinct_ratio,
           CASE WHEN n_tokens >= 20 AND distinct_ratio >= 0.2 THEN 1 ELSE 0 END AS quality_pass
    FROM (
      SELECT doc_id,
             len(toks) AS n_tokens,
             CAST(len(list_filter(toks, t -> t IN {_SW_SQL})) AS DOUBLE) / len(toks) AS stop_ratio,
             CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS distinct_ratio
      FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks FROM documents) t
      WHERE len(toks) > 0
    ) q
    ORDER BY doc_id
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword ratio + lexical diversity + length gate
    (the C4/Gopher-style filter family, reduced to deterministic
    components). Int/int division in double is exact cross-engine."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), r"\s+")
    q = (
        d.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") > 0)
        .select(
            "doc_id",
            F.size("toks").alias("n_tokens"),
            (
                F.size(F.filter(F.col("toks"), lambda t: t.isin(*STOPWORDS))).cast("double")
                / F.size("toks")
            ).alias("stop_ratio"),
            (F.size(F.array_distinct("toks")).cast("double") / F.size("toks")).alias(
                "distinct_ratio"
            ),
        )
    )
    return q.select(
        "doc_id",
        "n_tokens",
        "stop_ratio",
        "distinct_ratio",
        F.when((F.col("n_tokens") >= 20) & (F.col("distinct_ratio") >= 0.2), 1)
        .otherwise(0)
        .alias("quality_pass"),
    ).orderBy("doc_id")


def _langid_sql() -> str:
    score = {
        lang: f"len(list_filter(toks, t -> t IN ({', '.join(repr(w) for w in ws)})))"
        for lang, ws in LANG_MARKERS.items()
    }
    # precedence order en > de > fr > es > zh on ties (>= chain)
    cases = []
    langs = list(LANG_MARKERS)
    for i, lang in enumerate(langs):
        others = [score[o] for o in langs if o != lang]
        cond = " AND ".join(f"{score[lang]} >= {o}" for o in others)
        cases.append(f"WHEN {cond} THEN '{lang}'")
    case_sql = "CASE " + " ".join(cases) + " ELSE 'und' END"
    return rf"""
    SELECT doc_id, lang AS labeled_lang, {case_sql} AS predicted_lang
    FROM (SELECT doc_id, lang, string_split_regex(lower(text), '\s+') AS toks FROM documents) t
    ORDER BY doc_id
    """


def _langid_predictions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, labeled_lang, predicted_lang) via the marker-lexicon
    heuristic — shared by text_langid and langid_confusion."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), r"\s+")
    base = d.select("doc_id", F.col("lang").alias("labeled_lang"), toks.alias("toks"))
    def marker_counter(ws: tuple[str, ...]):
        # closure factory: a default-arg lambda would read as 2-parameter
        # and make PySpark pass the (value, index) higher-order form
        return lambda t: t.isin(*ws)

    scores = {
        lang: F.size(F.filter(F.col("toks"), marker_counter(ws)))
        for lang, ws in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    # build reversed so the first language wins ties (mirrors oracle order)
    expr = F.lit("und")
    for lang in reversed(langs):
        others = [scores[o] for o in langs if o != lang]
        cond = None
        for o in others:
            c = scores[lang] >= o
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, lang).otherwise(expr)
    return base.select("doc_id", "labeled_lang", expr.alias("predicted_lang"))


@register("text_langid", oracle=_langid_sql())
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID via a deterministic marker-lexicon heuristic (argmax of
    per-language marker-word counts with fixed precedence on ties).

    Scale: pure codegen'd expressions; a real fastText-style model would
    ride a Pandas UDF (see multimodal.py for that plumbing pattern)."""
    return _langid_predictions(spark, sf_dir).orderBy("doc_id")


@register(
    "langid_confusion",
    oracle=f"""
    WITH p AS ({_langid_sql()}),
    c AS (
      SELECT labeled_lang, predicted_lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM p GROUP BY labeled_lang, predicted_lang)
    SELECT labeled_lang, predicted_lang, n,
           CAST(round(CAST(n AS DOUBLE)
             / CAST(SUM(n) OVER (PARTITION BY labeled_lang) AS DOUBLE)
             * 1000000000, 0) AS BIGINT) AS recall_ticks
    FROM c ORDER BY labeled_lang, predicted_lang
    """,
)
def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the langid heuristic against the labeled
    lang column — the classifier-audit primitive (per-label recall on
    the diagonal, systematic confusions off it) run before trusting a
    language filter to gate a corpus.

    Scale: the per-document scoring is the same codegen'd projection as
    text_langid (no shuffle); the corpus then reduces to ≤ |langs|²
    cells in one map-side-combinable count, and per-label recall is a
    window over that tiny matrix, quantized to nanoticks.
    """
    p = _langid_predictions(spark, sf_dir)
    c = p.groupBy("labeled_lang", "predicted_lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = F.sum("n").over(Window.partitionBy("labeled_lang")).cast("double")
    return (
        c.select(
            "labeled_lang",
            "predicted_lang",
            "n",
            F.round(F.col("n").cast("double") / tot * 1_000_000_000, 0)
            .cast("bigint")
            .alias("recall_ticks"),
        )
        .orderBy("labeled_lang", "predicted_lang")
    )


@register(
    "text_fingerprint",
    oracle=r"""
    SELECT fingerprint, MIN(doc_id) AS canonical_doc_id, COUNT(*) AS n_docs
    FROM (
      SELECT doc_id,
             md5(array_to_string(string_split_regex(lower(trim(text)), '\s+'), ' ')) AS fingerprint
      FROM documents
    ) f
    GROUP BY fingerprint
    ORDER BY fingerprint
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: whitespace-normalized md5 content hash,
    grouped to find exact-content clusters (the cheap first pass of every
    dedup pipeline).

    Scale: fingerprint is 16 bytes/doc — groupBy shuffles fingerprints,
    not documents; at 100 TB this is the classic 'shuffle the hash, not
    the text' move.
    """
    d = load_table(spark, sf_dir, "documents")
    norm = F.concat_ws(" ", F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
    return (
        d.select("doc_id", F.md5(norm).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("canonical_doc_id"), F.count(F.lit(1)).alias("n_docs"))
        .orderBy("fingerprint")
    )


@register(
    "token_topk",
    oracle=r"""
    SELECT tok, COUNT(*) AS n
    FROM (
      SELECT unnest(string_split_regex(lower(text), '\s+')) AS tok
      FROM documents
    ) t
    GROUP BY tok
    ORDER BY n DESC, tok
    LIMIT 20
    """,
)
def token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 token frequencies (the vocabulary histogram every
    corpus pipeline starts with).

    Scale: explode -> groupBy(token) with map-side combine; shuffle
    carries (token, partial count), not token occurrences. Vocabulary
    skew ('the') is absorbed by the partial aggregation.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(20)
    )


@register(
    "tfidf_top_terms",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
      FROM documents
    ),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
    df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, tok,
             tf * CAST(round(ln(CAST(n_docs AS DOUBLE) / df) * 1000000, 0) AS BIGINT)
               AS score_micro
      FROM tf JOIN df USING (tok) CROSS JOIN n
    )
    SELECT doc_id, tok, CAST(score_micro AS DOUBLE) / 1000000 AS tfidf, rn
    FROM (
      SELECT doc_id, tok, score_micro,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score_micro DESC, tok) AS rn
      FROM scored
    ) r
    WHERE rn <= 3
    ORDER BY doc_id, rn
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document.

    Determinism: idf is quantized to integer micro-units
    (round(ln(N/df)*1e6)) so the tf*idf ranking is pure int64 arithmetic —
    a raw double tf*ln() score can differ by an ulp across engines and
    flip the top-k selection.

    Scale: two shuffles ((doc,tok) tf and (tok) df) + a broadcast-size
    df table joined back; the window runs over per-doc groups.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.count()  # driver-side scalar: one job, reused as a literal
    idf_micro = F.round(
        F.log(F.lit(float(n_docs)) / F.col("df")) * 1_000_000, 0
    ).cast("bigint")
    scored = tf.join(df, "tok").select(
        "doc_id", "tok", (F.col("tf") * idf_micro).alias("score_micro")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("score_micro"), "tok")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "doc_id",
            "tok",
            (F.col("score_micro").cast("double") / 1_000_000).alias("tfidf"),
            "rn",
        )
        .orderBy("doc_id", "rn")
    )


@register(
    "dataset_split",
    oracle="""
    SELECT split, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
    FROM (
      SELECT doc_id,
             CASE WHEN bucket < 80 THEN 'train'
                  WHEN bucket < 90 THEN 'validation'
                  ELSE 'test' END AS split
      FROM (
        SELECT doc_id,
               CAST(concat('0x', substr(md5(concat('split:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 100 AS bucket
        FROM documents
      ) b
    ) s
    GROUP BY split
    ORDER BY split
    """,
)
def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/validation/test split via salted
    content-key hashing — the reproducible alternative to randomSplit()
    (whose output depends on partitioning). Same doc always lands in the
    same split, on any cluster, at any scale.

    Scale: narrow, no shuffle until the tiny summary agg; the split
    column is usually written as a partition column for downstream
    pruning.
    """
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "validation").otherwise("test")
    )
    return (
        d.select("doc_id", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("split")
    )


@register(
    "stratified_sample",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN bucket < pct THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
    FROM (
      SELECT lang,
             CAST(concat('0x', substr(md5(concat('strat:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 100 AS bucket,
             CASE WHEN lang = 'en' THEN 80 ELSE 30 END AS pct
      FROM documents
    ) b
    GROUP BY lang
    ORDER BY lang
    """,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-language keep rates (80%
    for 'en', 30% otherwise) via salted md5 bucketing on the document
    key — how a training mix downsamples over-represented languages.
    Unlike df.sampleBy(), the same doc keeps/drops identically on any
    cluster, any partitioning, any rerun (seeded-RNG samples are only
    reproducible under identical partitioning).

    Scale: narrow (no shuffle until the per-language summary); the keep
    predicate pushes into the scan, so the dropped 70% of non-en docs
    never leave the parquet reader when the sample is materialized.
    """
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("strat:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    pct = F.when(F.col("lang") == "en", 80).otherwise(30)
    return (
        d.select("lang", bucket.alias("bucket"), pct.alias("pct"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("bucket") < F.col("pct"), 1).otherwise(0)).alias(
                "n_sampled"
            ),
        )
        .orderBy("lang")
    )


@register(
    "unigram_surprisal",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term
      FROM documents),
    vocab AS (SELECT term, COUNT(*) AS tc FROM toks GROUP BY term),
    tot AS (SELECT SUM(tc) AS total_tokens FROM vocab),
    vticks AS (
      SELECT term,
             CAST(round(ln(CAST(total_tokens AS DOUBLE) / tc) * 1000000000, 0)
                  AS BIGINT) AS tick
      FROM vocab, tot)
    SELECT t.doc_id, COUNT(*) AS n_tokens,
           round(CAST(SUM(v.tick) AS DOUBLE) / 1000000000 / COUNT(*), 6)
             AS avg_surprisal
    FROM toks t JOIN vticks v ON t.term = v.term
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
)
def unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality score: train token probabilities
    on the corpus itself (p = count/total), then score each doc by its
    mean token surprisal −ln p — low = repetitive/templated text, high
    = rare-token soup; the classic cheap LM filter between heuristics
    and a real perplexity model.

    Shape: train pass (explode → vocab agg) + score pass (explode →
    vocab join → per-doc agg) — two corpus passes are inherent to
    train-then-score. The vocab join broadcasts here; at 100 TB a
    whitespace vocab has a heavy tail, so the scale path shuffle-joins
    on term (both sides partial-agg'd first) or prunes the vocab to
    top-K + an OOV bucket — shape unchanged.

    Exactness: per-term surprisal is quantized to integer nano-ticks
    once (in the vocab table), so the per-doc sum is an integer sum in
    both engines; one double division at the end, rounded to 6dp.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("term")
    )
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("tc"))
    tot = vocab.agg(F.sum("tc").alias("total_tokens"))
    vticks = vocab.crossJoin(F.broadcast(tot)).select(
        "term",
        F.round(
            F.log(F.col("total_tokens").cast("double") / F.col("tc")) * 1_000_000_000,
            0,
        )
        .cast("bigint")
        .alias("tick"),
    )
    return (
        toks.join(F.broadcast(vticks), "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum("tick").cast("double") / 1_000_000_000 / F.count(F.lit(1)), 6
            ).alias("avg_surprisal"),
        )
        .orderBy("doc_id")
    )


@register(
    "bigram_surprisal",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, CAST(i.i - 1 AS INT) AS pos, t[i.i] AS term
      FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
            FROM documents) d,
           unnest(generate_series(1, len(d.t))) AS i(i)),
    bigrams AS (
      SELECT doc_id, term,
             LEAD(term) OVER (PARTITION BY doc_id ORDER BY pos) AS next_term
      FROM toks),
    bg AS (SELECT doc_id, term, next_term FROM bigrams WHERE next_term IS NOT NULL),
    uni AS (SELECT term, COUNT(*) AS cu FROM toks GROUP BY term),
    bic AS (SELECT term, next_term, COUNT(*) AS cb FROM bg GROUP BY term, next_term),
    vticks AS (
      SELECT b.term, b.next_term,
             CAST(round(ln(CAST(u.cu AS DOUBLE) / b.cb) * 1000000000, 0) AS BIGINT)
               AS tick
      FROM bic b JOIN uni u ON b.term = u.term)
    SELECT g.doc_id, COUNT(*) AS n_bigrams,
           round(CAST(SUM(v.tick) AS DOUBLE) / 1000000000 / COUNT(*), 6)
             AS avg_bigram_surprisal
    FROM bg g JOIN vticks v ON g.term = v.term AND g.next_term = v.next_term
    GROUP BY g.doc_id
    ORDER BY g.doc_id
    """,
)
def bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram conditional-surprisal scoring: −ln p(next|term) with MLE
    probabilities trained on the corpus (cb/cu), averaged per doc —
    one LM order above unigram_surprisal; low scores expose templated/
    machine-generated text that unigram stats miss (common words in
    common orders).

    Shape: posexplode → per-doc lead() window forms the bigram stream;
    unigram + bigram count tables train the model; a join scores the
    stream. The bigram table is the big one — the scoring join
    broadcasts here but shuffle-joins on (term, next_term) at corpus
    scale (both sides pre-aggregated). Window partitions on doc_id —
    parallelism = |docs|.

    Exactness: per-bigram surprisal quantized once to integer
    nano-ticks in the model table; per-doc sums are integer.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), r"\s+")).alias("pos", "term"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        toks.withColumn("next_term", F.lead("term").over(w))
        .filter(F.col("next_term").isNotNull())
        .select("doc_id", "term", "next_term")
    )
    uni = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cu"))
    bic = bg.groupBy("term", "next_term").agg(F.count(F.lit(1)).alias("cb"))
    vticks = bic.join(uni, "term").select(
        "term",
        "next_term",
        F.round(
            F.log(F.col("cu").cast("double") / F.col("cb")) * 1_000_000_000, 0
        )
        .cast("bigint")
        .alias("tick"),
    )
    return (
        bg.join(F.broadcast(vticks), ["term", "next_term"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum("tick").cast("double") / 1_000_000_000 / F.count(F.lit(1)), 6
            ).alias("avg_bigram_surprisal"),
        )
        .orderBy("doc_id")
    )


@register(
    "levenshtein_nearest",
    oracle="""
    SELECT name_a, name_b AS nearest, dist
    FROM (
        SELECT a.n_name AS name_a,
               b.n_name AS name_b,
               levenshtein(a.n_name, b.n_name) AS dist,
               ROW_NUMBER() OVER (
                   PARTITION BY a.n_name
                   ORDER BY levenshtein(a.n_name, b.n_name), b.n_name
               ) AS rn
        FROM nation a
        JOIN nation b ON a.n_name <> b.n_name
    ) t
    WHERE rn = 1
    ORDER BY name_a
    """,
)
def levenshtein_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching: for every nation name, the nearest other
    name by edit distance (tie-broken by name). The primitive under
    entity resolution / typo-tolerant joins — absent from the
    reference (string equality only, prompts.py:120), present in both
    engines as a built-in (F.levenshtein), so oracle-exact.

    Scale: self-join on a dimension table — broadcast the right side;
    for large entity tables you'd pre-block (first-letter / length
    band / phonetic bucket) before any pairwise distance, exactly as
    dedup_minhash_lsh_pairs blocks before Jaccard."""
    names = load_table(spark, sf_dir, "nation").select("n_name")
    a = names.select(F.col("n_name").alias("name_a"))
    b = names.select(F.col("n_name").alias("name_b"))
    pairs = a.join(
        F.broadcast(b), F.col("name_a") != F.col("name_b"), "inner"
    ).withColumn("dist", F.levenshtein("name_a", "name_b"))
    w = Window.partitionBy("name_a").orderBy("dist", "name_b")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("name_a", F.col("name_b").alias("nearest"), "dist")
        .orderBy("name_a")
    )


@register(
    "stopword_pruned_corpus",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
      FROM documents
    ),
    freq AS (
      SELECT tok, COUNT(*) AS c
      FROM (SELECT unnest(toks) AS tok FROM toks) u
      GROUP BY tok
      ORDER BY c DESC, tok
      LIMIT 10
    ),
    topk AS (SELECT list(tok ORDER BY tok) AS topk FROM freq)
    SELECT doc_id,
           array_to_string(list_filter(toks, t -> NOT list_contains(topk, t)), ' ') AS pruned_text,
           len(toks) - len(list_filter(toks, t -> NOT list_contains(topk, t))) AS n_removed
    FROM toks, topk
    ORDER BY doc_id
    """,
)
def stopword_pruned_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-driven stopword pruning: find the global top-10 most
    frequent tokens, remove them from every document, and reassemble
    the text in original token order (the data-driven variant of
    fixed-list stopword removal a training pipeline applies before
    n-gram dedup/fingerprinting). New capability vs the reference
    (string equality only, prompts.py:120).

    Scale: the corpus is NEVER shuffled and NEVER exploded into a
    (doc, pos, token) relation for reassembly. One aggregation reduces
    the corpus to a 10-token vocabulary (partial+final hash agg over
    exploded tokens — shuffle width = |vocab|), which collapses to a
    ONE-ROW array and broadcasts back over the scan (the
    broadcast-bounds pattern, cf. length_band_filter). Pruning +
    reassembly are then per-row codegen'd higher-order functions
    (filter + array_join) — embarrassingly parallel, order preserved
    for free because tokens never leave their row. The explode feeding
    the vocabulary agg carries only tokens, not documents.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.split(F.lower(F.col("text")), r"\s+").alias("toks")
    )
    topk = (
        toks.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "tok")
        .limit(10)
        .agg(F.array_sort(F.collect_list("tok")).alias("topk"))
    )
    kept = F.filter("toks", lambda t: ~F.array_contains(F.col("topk"), t))
    return (
        toks.crossJoin(F.broadcast(topk))
        .select("doc_id", kept.alias("kept"), F.size("toks").alias("n_toks"))
        .select(
            "doc_id",
            F.array_join("kept", " ").alias("pruned_text"),
            (F.col("n_toks") - F.size("kept")).cast("long").alias("n_removed"),
        )
        .orderBy("doc_id")
    )


@register(
    "collocation_pmi",
    oracle=r"""
    WITH toks AS (
      SELECT string_split_regex(lower(text), '\s+') AS toks
      FROM documents
      WHERE len(string_split_regex(lower(text), '\s+')) >= 2
    ),
    pos AS (
      SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i FROM toks
    ),
    bc AS (
      SELECT toks[i] AS w1, toks[i + 1] AS w2, COUNT(*) AS n_xy
      FROM pos GROUP BY w1, w2
    ),
    uni AS (
      SELECT tok, COUNT(*) AS c
      FROM (SELECT unnest(toks) AS tok FROM toks) u GROUP BY tok
    ),
    tot AS (SELECT CAST(SUM(n_xy) AS BIGINT) AS n FROM bc)
    SELECT w1 || ' ' || w2 AS bigram, n_xy, u1.c AS n_x, u2.c AS n_y,
           CAST(n_xy * n AS DOUBLE) / CAST(u1.c * u2.c AS DOUBLE) AS lift
    FROM bc, tot
    JOIN uni u1 ON bc.w1 = u1.tok
    JOIN uni u2 ON bc.w2 = u2.tok
    WHERE n_xy >= 3
    ORDER BY lift DESC, bigram
    LIMIT 50
    """,
)
def collocation_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top bigrams by association lift
    n(xy)·N / (n(x)·n(y)) — exp(PMI) — with a minimum-support gate.
    The phrase-discovery primitive (tokenizer vocab induction, quality
    signals for keyboard-mash detection). New vs the reference.

    Determinism: the score is ONE IEEE division of two exactly-known
    int64 products — no cross-row float accumulation, no log — so it is
    bit-identical across engines and partitionings (the SCALE.md
    integer-ticks discipline; log-PMI would hit libm rounding drift).
    At web scale n_xy·N can overflow int64 (~1e12 × 1e13): divide in
    double or rank by (log n_xy + log N − log n_x − log n_y) with a
    tolerance band there; at bench scale integers are exact and the
    oracle verifies them.

    Scale: bigrams are born per-row with a codegen'd index transform
    (no explode-and-self-join on position — that would shuffle the
    corpus on doc_id). Two token-width aggregations (bigram + unigram
    counts, both partial+final), then the unigram vocabulary —
    orders of magnitude smaller than the corpus — broadcasts onto the
    bigram counts twice; the 1-row total N broadcasts likewise. The
    final top-50 is TakeOrderedAndProject (per-task heaps).
    Skew note: hyper-frequent unigrams are fine (broadcast side), but a
    pathological single repeated bigram concentrates in one reducer —
    partial aggregation already combines it map-side.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.split(F.lower(F.col("text")), r"\s+").alias("toks")).filter(
        F.size("toks") >= 2
    )
    pairs = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2))"
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    bc = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_xy"))
    # uni feeds BOTH join sides (w1 and w2); without materialization
    # Spark replans the whole explode+shuffle subtree twice (SCALE.md:
    # subplan reuse is your job) — localCheckpoint computes the
    # vocabulary once and both broadcasts build from it.
    uni = (
        toks.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    # N = Σ n_xy, but summing bc would likewise replan the bigram
    # subtree; each doc contributes exactly size(toks)-1 bigrams, so N
    # falls out of one narrow scan-level aggregation instead.
    tot = toks.agg(F.sum(F.size("toks") - 1).alias("n"))
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c").alias("n_x"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c").alias("n_y"))
    return (
        bc.filter(F.col("n_xy") >= 3)
        .crossJoin(F.broadcast(tot))
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .select(
            F.concat_ws(" ", "w1", "w2").alias("bigram"),
            "n_xy",
            "n_x",
            "n_y",
            (
                (F.col("n_xy") * F.col("n")).cast("double")
                / (F.col("n_x") * F.col("n_y")).cast("double")
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "bigram")
        .limit(50)
    )


@register(
    "udtf_trigrams",
    oracle=r"""
    SELECT doc_id, i - 1 AS idx, array_to_string(toks[i:i+2], ' ') AS ngram
    FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
          FROM documents WHERE doc_id < 20) t,
         unnest(generate_series(1, len(toks) - 2)) AS u(i)
    ORDER BY doc_id, idx
    """,
)
def udtf_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    r"""Python UDTF (user-defined TABLE function, Spark 3.5+/4.x) in a
    LATERAL correlated position: one doc row in, (idx, trigram) rows
    out. Pins the UDTF extension seam — arbitrary Python fan-out logic
    as a first-class FROM-clause relation (the reference has no
    extension surface at all; its whole pipeline is fixed SQL text).

    The built-in fast path for THIS payload is
    posexplode(transform(sequence(...)))
    (cf. posexplode_ordinal / collocation_pmi — token transforms stay
    JVM-side); a UDTF is for fan-outs whose per-row logic built-ins
    can't express (real tokenizers, parsers, decoders). Python
    evaluation is the slow path — row-batched through the Python
    worker — so keep it OFF corpus-wide hot paths at 100 TB; the
    lateral join itself is narrow (no shuffle) and the doc_id filter
    is pushed below it to the scan.

    Exactness: pure token-string manipulation on regex-identical
    splits (re.split == Spark split == string_split_regex for \s+).
    """
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="idx bigint, ngram string")
    class Trigrams:
        def eval(self, text: str):
            toks = re.split(r"\s+", text)
            for i in range(len(toks) - 2):
                yield i, " ".join(toks[i : i + 3])

    from ai_etl_studio_spark.catalog import register_tables

    spark.udtf.register("trigrams_udtf", Trigrams)
    register_tables(spark, sf_dir, ("documents",))
    return spark.sql(
        """
        SELECT d.doc_id, t.idx, t.ngram
        FROM documents d, LATERAL trigrams_udtf(lower(d.text)) t
        WHERE d.doc_id < 20
        ORDER BY doc_id, idx
        """
    )


#: GPT-2-style pre-tokenizer, simplified to the lookahead-free subset
#: that Java regex (Spark) and RE2 (DuckDB) evaluate identically:
#: contractions, space-prefixed letter runs, digit runs, punctuation
#: runs, whitespace runs. Verified token-for-token identical across
#: engines on the full corpus.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|\s+"


@register(
    "token_count_bpe",
    oracle=rf"""
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_ws) AS BIGINT) AS ws_tokens,
           CAST(SUM(n_bpe) AS BIGINT) AS bpe_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_chars) AS DOUBLE) / SUM(n_bpe) AS chars_per_bpe_token
    FROM (
      SELECT source,
             len(string_split_regex(lower(text), '\s+')) AS n_ws,
             len(regexp_extract_all(text, '{BPE_PATTERN.replace("'", "''")}')) AS n_bpe,
             length(text) AS n_chars
      FROM documents
    ) t
    GROUP BY source
    ORDER BY source
    """,
)
def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways (SURVEY §2C text-analysis row): whitespace
    tokens and a BPE-ish pre-tokenizer regex (the GPT-2 pattern minus
    RE2-unsupported lookahead), aggregated per source with the
    chars-per-BPE-token compression proxy.

    Scale: pure narrow regexp work in JVM codegen; one small groupBy on
    source. The regex is the budget estimator for training-token counts —
    at 100 TB you run exactly this shape before any real tokenizer pass.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "source",
            F.size(F.split(F.lower(F.col("text")), r"\s+")).alias("n_ws"),
            F.size(F.regexp_extract_all("text", F.lit(BPE_PATTERN), 0)).alias("n_bpe"),
            F.length("text").alias("n_chars"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_ws").alias("ws_tokens"),
            F.sum("n_bpe").alias("bpe_tokens"),
            F.sum("n_chars").alias("total_chars"),
            (F.sum("n_chars").cast("double") / F.sum("n_bpe")).alias(
                "chars_per_bpe_token"
            ),
        )
        .orderBy("source")
    )


HH_K = 40  # heavy hitter: token with count*HH_K > total token count
HH_COUNTERS = 128  # per-partition Misra-Gries counters (must be >= HH_K)


@register(
    "heavy_hitters_twopass",
    oracle=rf"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                t -> t <> '')) AS tok
      FROM documents),
    tot AS (SELECT COUNT(*) AS n FROM toks),
    cnt AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok)
    SELECT tok, cnt FROM cnt CROSS JOIN tot
    WHERE cnt * {HH_K} > n
    ORDER BY cnt DESC, tok
    """,
)
def heavy_hitters_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT frequent tokens (count > 1/{HH_K} of the stream) without a
    full-vocabulary shuffle — the two-pass Misra-Gries shape used for
    heavy-hitter profiling on streams too wide to count exactly.

    Pass 1 (mapInPandas, Arrow-batched): each partition keeps at most
    {HH_COUNTERS} Misra-Gries counters — bounded memory no matter how
    large the vocabulary — and emits its surviving candidate tokens plus
    its token count. The mergeable-summaries guarantee (Agarwal et al.,
    PODS'12): any token with global share > 1/({HH_COUNTERS}+1) survives
    in at least one partition, so with {HH_COUNTERS} >= {HH_K} the
    candidate union is a SUPERSET of the true heavy hitters.

    Pass 2: exact counts restricted to the (tiny, broadcast) candidate
    set — a semi-join prunes the stream before the groupBy, so the only
    wide shuffle carries candidate tokens, not the whole vocabulary.
    False candidates fall to the final threshold filter; the result is
    exact (same oracle as a full count would have).

    A plain groupBy would also be exact but shuffles every distinct
    token; at 100 TB with a 10^9-token vocabulary that is the
    difference between a bounded and an unbounded aggregation state.
    """
    from ai_etl_studio_spark.functions.texthash import tokens

    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select(F.explode(tokens("text")).alias("tok"))
        .filter(F.col("tok") != "")
    )

    def mg(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        n = 0
        for pdf in batches:
            n += len(pdf)
            for tok, c in pdf["tok"].value_counts().items():
                counters[tok] = counters.get(tok, 0) + int(c)
            if len(counters) > HH_COUNTERS:
                # batched MG reduction: subtract the (len-C)th smallest
                # value from all counters, drop non-positives (== that
                # many decrement-all rounds at once)
                m = sorted(counters.values())[len(counters) - HH_COUNTERS - 1]
                counters = {t: c - m for t, c in counters.items() if c > m}
        yield pd.DataFrame(
            {"tok": list(counters) + [None], "n": [0] * len(counters) + [n]}
        )

    # tiny output (<= HH_COUNTERS+1 rows/partition); materialized once so
    # candidates + total don't rescan the corpus
    p1 = toks.mapInPandas(mg, "tok string, n long").localCheckpoint()
    cands = p1.filter(F.col("tok").isNotNull()).select("tok").distinct()
    total = p1.agg(F.sum("n").alias("n_total"))
    counts = (
        toks.join(F.broadcast(cands), "tok", "left_semi")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counts.join(F.broadcast(total))
        .filter(F.col("cnt") * HH_K > F.col("n_total"))
        .select("tok", "cnt")
        .orderBy(F.desc("cnt"), "tok")
    )


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------

#: Sketch geometry: depth (independent hash rows) × width (buckets/row).
CMS_D = 4
CMS_W = 64
CMS_TOPK = 20


def _cms_bucket_sql(j: str, tok: str) -> str:
    return (
        sql_md5_hash32(f"concat(CAST({j} AS VARCHAR), ':', {tok})")
        + f" % {CMS_W}"
    )


_CMS_ORACLE = f"""
WITH occ AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            t -> t <> '')) AS tok
  FROM documents),
cells AS (
  SELECT j, {_cms_bucket_sql('j', 'tok')} AS bucket, COUNT(*) AS cnt
  FROM occ, UNNEST(range({CMS_D})) AS u(j)
  GROUP BY 1, 2),
cand AS (SELECT tok, COUNT(*) AS true_cnt FROM occ GROUP BY tok),
probes AS (
  SELECT tok, true_cnt, j, {_cms_bucket_sql('j', 'tok')} AS bucket
  FROM cand, UNNEST(range({CMS_D})) AS u(j)),
est AS (
  SELECT p.tok, MAX(p.true_cnt) AS true_cnt, MIN(c.cnt) AS est_cnt
  FROM probes p JOIN cells c USING (j, bucket)
  GROUP BY p.tok)
SELECT tok, est_cnt, true_cnt FROM est
ORDER BY est_cnt DESC, tok
LIMIT {CMS_TOPK}
"""


@register("countmin_heavy_hitters", oracle=_CMS_ORACLE)
def countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate heavy hitters via a count-min sketch: CMS_D×CMS_W
    counters absorb the whole token stream, then candidate tokens are
    ranked by their sketch estimate (min over the CMS_D rows). The
    one-sided guarantee — estimate >= true count, over-counting bounded
    by 2N/CMS_W with prob 1-2^-CMS_D — is visible in the output, which
    carries the true count beside the estimate (the exact-counting twin
    is `heavy_hitters_twopass`; this is the mergeable-sketch flavor a
    streaming/partial-aggregation pipeline keeps instead).

    Scale: the sketch build is a groupBy over (j, bucket) — at most
    CMS_D×CMS_W cells no matter the corpus, so the shuffle
    collapses to a constant after map-side combine. The probe side joins
    the (broadcast) sketch; here the candidate set is the full
    vocabulary for oracle completeness — production probes only the
    tokens a Misra-Gries pass (or a sample) nominates.

    Hash rows use the shared md5 family (functions/texthash.py) so the
    DuckDB twin is bit-exact.
    """
    from ai_etl_studio_spark.functions.texthash import md5_hash32, tokens

    d = load_table(spark, sf_dir, "documents")
    occ = d.select(F.explode(tokens("text")).alias("tok")).filter(
        F.col("tok") != ""
    )
    jarr = F.explode(F.array(*[F.lit(j) for j in range(CMS_D)])).alias("j")

    def bucket(j: Column, tok: Column) -> Column:
        return (
            md5_hash32(F.concat(j.cast("string"), F.lit(":"), tok)) % CMS_W
        )

    cells = (
        occ.select("tok", jarr)
        .select("j", bucket(F.col("j"), F.col("tok")).alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cand = occ.groupBy("tok").agg(F.count(F.lit(1)).alias("true_cnt"))
    probes = cand.select("tok", "true_cnt", jarr).select(
        "tok", "true_cnt", "j", bucket(F.col("j"), F.col("tok")).alias("bucket")
    )
    return (
        probes.join(F.broadcast(cells), ["j", "bucket"])
        .groupBy("tok")
        .agg(
            F.max("true_cnt").alias("true_cnt"),
            F.min("cnt").alias("est_cnt"),
        )
        .select("tok", "est_cnt", "true_cnt")
        .orderBy(F.desc("est_cnt"), "tok")
        .limit(CMS_TOPK)
    )


# ---------------------------------------------------------------------------
# Vocabulary growth by corpus position
# ---------------------------------------------------------------------------

@register(
    "vocab_growth_curve",
    oracle=r"""
    WITH mx AS (SELECT MAX(doc_id) AS m FROM documents),
    tk AS (
      SELECT CAST(doc_id * 10 // (m + 1) AS BIGINT) AS decile,
             unnest(string_split_regex(lower(text), '\s+')) AS tok
      FROM documents, mx WHERE text IS NOT NULL),
    g AS (
      SELECT decile, tok, COUNT(*) AS c FROM tk GROUP BY decile, tok),
    occ AS (
      SELECT decile, CAST(SUM(c) AS BIGINT) AS n_tokens FROM g GROUP BY decile),
    fs AS (SELECT tok, MIN(decile) AS first_decile FROM g GROUP BY tok),
    nt AS (
      SELECT first_decile AS decile, CAST(COUNT(*) AS BIGINT) AS n_new_types
      FROM fs GROUP BY first_decile)
    SELECT o.decile, o.n_tokens,
           CAST(COALESCE(nt.n_new_types, 0) AS BIGINT) AS n_new_types,
           CAST(SUM(COALESCE(nt.n_new_types, 0)) OVER (ORDER BY o.decile)
             AS BIGINT) AS cum_vocab
    FROM occ o LEFT JOIN nt ON o.decile = nt.decile
    ORDER BY o.decile
    """,
)
def vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary saturation curve: new distinct token types per corpus
    decile (by doc_id ingest position) and the cumulative vocabulary —
    the Heaps-law diagnostic behind "is more crawl still adding new
    language or just repeating itself".

    Scale: ONE token explode feeds a (decile, token) count — the single
    vocabulary-keyed shuffle — and that checkpointed reduction serves
    both per-decile occurrence totals and token first-seen minima
    (cluster scale: persist; its size is bounded by vocabulary × 10,
    not corpus tokens). The decile spine, first-seen counts, and the
    cumulative window all run over ≤10 rows.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    mx = d.agg(F.max("doc_id").alias("m"))
    tk = d.crossJoin(F.broadcast(mx)).select(
        (F.col("doc_id") * 10 / (F.col("m") + 1)).cast("bigint").alias("decile"),
        F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"),
    )
    g = tk.groupBy("decile", "tok").agg(F.count(F.lit(1)).alias("c")).localCheckpoint()
    occ = g.groupBy("decile").agg(F.sum("c").cast("bigint").alias("n_tokens"))
    fs = g.groupBy("tok").agg(F.min("decile").alias("first_decile"))
    nt = fs.groupBy(F.col("first_decile").alias("decile")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new_types")
    )
    w = Window.orderBy("decile")  # ≤10 rows
    return (
        occ.join(nt, "decile", "left")
        .select(
            "decile",
            "n_tokens",
            F.coalesce(F.col("n_new_types"), F.lit(0)).cast("bigint").alias("n_new_types"),
        )
        .withColumn(
            "cum_vocab", F.sum("n_new_types").over(w).cast("bigint")
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# Pairwise source vocabulary overlap (Jaccard)
# ---------------------------------------------------------------------------

@register(
    "source_token_jaccard",
    oracle=r"""
    WITH st AS (
      SELECT DISTINCT source,
             unnest(string_split_regex(lower(text), '\s+')) AS tok
      FROM documents WHERE text IS NOT NULL),
    sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM st GROUP BY source),
    pr AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(COUNT(*) AS BIGINT) AS inter
      FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
      GROUP BY a.source, b.source)
    SELECT pr.src_a, pr.src_b, pr.inter,
           sa.n AS size_a, sb.n AS size_b,
           CAST(pr.inter AS DOUBLE)
             / CAST(sa.n + sb.n - pr.inter AS DOUBLE) AS jaccard
    FROM pr
    JOIN sz sa ON pr.src_a = sa.source
    JOIN sz sb ON pr.src_b = sb.source
    ORDER BY pr.src_a, pr.src_b
    """,
)
def source_token_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard similarity between crawl sources —
    the redundancy matrix behind "these two feeds are the same site
    mirrored" before paying for cross-source dedup.

    Scale: the corpus reduces once to DISTINCT (source, token) — the
    vocabulary-keyed shuffle — and is checkpointed for its three
    consumers. The token-key self-join fans out at most C(|sources|,2)
    pairs per token (sources², NOT corpus²) and reduces map-side; the
    per-pair division is the only double. Set sizes join back from the
    |sources|-row table.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    st = (
        d.select(
            "source", F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
        )
        .distinct()
        .localCheckpoint()  # vocabulary-bounded; cluster scale: persist
    )
    sz = st.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a = st.alias("a")
    b = st.alias("b")
    pr = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("inter"))
    )
    sa = sz.select(F.col("source").alias("src_a"), F.col("n").alias("size_a"))
    sb = sz.select(F.col("source").alias("src_b"), F.col("n").alias("size_b"))
    return (
        pr.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "inter",
            "size_a",
            "size_b",
            (
                F.col("inter").cast("double")
                / (F.col("size_a") + F.col("size_b") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
        .orderBy("src_a", "src_b")
    )


# ---------------------------------------------------------------------------
# Zipf tail exponent (discrete power-law MLE)
# ---------------------------------------------------------------------------

#: Minimum token frequency included in the power-law tail fit.
_ZIPF_XMIN = 5


@register(
    "power_law_alpha",
    oracle=rf"""
    WITH tf AS (
      SELECT tok, COUNT(*) AS c
      FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS tok
            FROM documents WHERE text IS NOT NULL) t
      GROUP BY tok),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_types_total FROM tf),
    tail AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_tail,
             CAST(SUM(CAST(round(ln(CAST(c AS DOUBLE) / {_ZIPF_XMIN}.0)
               * 1000000000, 0) AS BIGINT)) AS BIGINT) AS sum_ln_ticks
      FROM tf WHERE c >= {_ZIPF_XMIN})
    SELECT n_types_total, n_tail, sum_ln_ticks,
           CAST(round((1 + CAST(n_tail AS DOUBLE)
             / (CAST(sum_ln_ticks AS DOUBLE) / 1000000000))
             * 1000000, 0) AS BIGINT) AS alpha_ticks
    FROM s, tail
    """,
)
def power_law_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete power-law (Zipf) tail exponent of the token-frequency
    distribution via the Hill/Clauset MLE alpha = 1 + n/Σln(x/xmin) —
    the one-number check that a corpus has natural-language frequency
    statistics (alpha ≈ 2) rather than boilerplate spam.

    Scale: one token-keyed count (map-side combine) reduces the corpus
    to its vocabulary; the checkpointed frequency table serves the
    type count and the tail fit. Each ln(x/xmin) is quantized to
    nanoticks BEFORE the sum (exact int64, order-free); alpha is one
    mirrored compound double quantized to microticks.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tf = (
        d.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()  # vocabulary-bounded; 2 consumers
    )
    s = tf.agg(F.count(F.lit(1)).cast("bigint").alias("n_types_total"))
    ln_ticks = F.round(
        F.log(F.col("c").cast("double") / float(_ZIPF_XMIN)) * 1_000_000_000, 0
    ).cast("bigint")
    tail = tf.filter(F.col("c") >= _ZIPF_XMIN).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tail"),
        F.sum(ln_ticks).cast("bigint").alias("sum_ln_ticks"),
    )
    alpha = F.lit(1) + F.col("n_tail").cast("double") / (
        F.col("sum_ln_ticks").cast("double") / 1_000_000_000
    )
    return s.crossJoin(F.broadcast(tail)).select(
        "n_types_total",
        "n_tail",
        "sum_ln_ticks",
        F.round(alpha * 1_000_000, 0).cast("bigint").alias("alpha_ticks"),
    )


# ---------------------------------------------------------------------------
# Exact-duplicate rate per source
# ---------------------------------------------------------------------------

@register(
    "dup_rate_by_source",
    oracle=r"""
    WITH fp AS (
      SELECT doc_id, source,
             md5(array_to_string(
               string_split_regex(lower(trim(text)), '\s+'), ' '))
               AS fingerprint
      FROM documents WHERE text IS NOT NULL),
    cnt AS (
      SELECT fingerprint, CAST(COUNT(*) AS BIGINT) AS n
      FROM fp GROUP BY fingerprint)
    SELECT fp.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN cnt.n > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_docs,
           CAST(round(
             CAST(SUM(CASE WHEN cnt.n > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) * 1000000000, 0) AS BIGINT)
             AS dup_share_ticks
    FROM fp JOIN cnt USING (fingerprint)
    GROUP BY fp.source ORDER BY fp.source
    """,
)
def dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate exposure per crawl source: the share of each
    source's documents whose normalized-text fingerprint appears more
    than once ANYWHERE in the corpus — the per-feed score that decides
    which source pays for aggressive dedup.

    Scale: the fingerprint projection is per-row codegen (shared
    normalization with text_fingerprint); the corpus reduces once to
    fingerprint counts, joins back key-on-key on the fingerprint
    (hint-free — a duplicate-group table is corpus-scale), and rolls
    up to |sources| rows. The checkpointed fingerprint frame feeds
    both sides without re-scanning documents.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    norm = F.concat_ws(" ", F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
    fp = d.select(
        "doc_id", "source", F.md5(norm).alias("fingerprint")
    ).localCheckpoint()  # 2 consumers; cluster scale: persist
    cnt = fp.groupBy("fingerprint").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    dup = F.sum(F.when(F.col("n") > 1, 1).otherwise(0)).cast("bigint")
    return (
        fp.join(cnt, "fingerprint")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            dup.alias("n_dup_docs"),
            F.round(
                dup.cast("double")
                / F.count(F.lit(1)).cast("double")
                * 1_000_000_000,
                0,
            )
            .cast("bigint")
            .alias("dup_share_ticks"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Character-class composition per source
# ---------------------------------------------------------------------------

@register(
    "char_class_profile",
    oracle=r"""
    WITH c AS (
      SELECT source,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
               AS BIGINT) AS alpha_chars,
             CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
               AS BIGINT) AS digit_chars,
             CAST(length(regexp_replace(text, '[^ ]', '', 'g'))
               AS BIGINT) AS space_chars
      FROM documents WHERE text IS NOT NULL)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           CAST(SUM(alpha_chars) AS BIGINT) AS alpha_chars,
           CAST(SUM(digit_chars) AS BIGINT) AS digit_chars,
           CAST(SUM(space_chars) AS BIGINT) AS space_chars,
           CAST(round(CAST(SUM(alpha_chars) AS DOUBLE)
             / CAST(SUM(n_chars) AS DOUBLE) * 1000000000, 0) AS BIGINT)
             AS alpha_share_ticks
    FROM c GROUP BY source ORDER BY source
    """,
)
def char_class_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class composition per source (alpha / digit / space
    share of total characters) — the cheap structural screen that
    separates prose feeds from tables, code dumps, and serial-number
    spam before any tokenizer runs.

    Scale: four per-row codegen'd regexp lengths (Spark replaces all
    matches; the DuckDB twin passes the 'g' flag for the same
    semantics), then ONE map-side-combinable rollup to |sources| rows
    with exact integer character sums.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    c = d.select(
        "source",
        F.length("text").cast("bigint").alias("n_chars"),
        F.length(F.regexp_replace("text", "[^a-zA-Z]", "")).cast("bigint").alias(
            "alpha_chars"
        ),
        F.length(F.regexp_replace("text", "[^0-9]", "")).cast("bigint").alias(
            "digit_chars"
        ),
        F.length(F.regexp_replace("text", "[^ ]", "")).cast("bigint").alias(
            "space_chars"
        ),
    )
    return (
        c.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
            F.sum("alpha_chars").cast("bigint").alias("alpha_chars"),
            F.sum("digit_chars").cast("bigint").alias("digit_chars"),
            F.sum("space_chars").cast("bigint").alias("space_chars"),
            F.round(
                F.sum("alpha_chars").cast("double")
                / F.sum("n_chars").cast("double")
                * 1_000_000_000,
                0,
            )
            .cast("bigint")
            .alias("alpha_share_ticks"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility per language
# ---------------------------------------------------------------------------

@register(
    "tokenizer_fertility",
    oracle=rf"""
    WITH t AS (
      SELECT lang,
             CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT)
               AS n_ws,
             CAST(len(regexp_extract_all(text,
               '{BPE_PATTERN.replace("'", "''")}')) AS BIGINT) AS n_bpe
      FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL)
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_ws) AS BIGINT) AS ws_tokens,
           CAST(SUM(n_bpe) AS BIGINT) AS bpe_tokens,
           CAST(round(CAST(SUM(n_bpe) AS DOUBLE) / CAST(SUM(n_ws) AS DOUBLE)
             * 1000000, 0) AS BIGINT) AS fertility_micro
    FROM t GROUP BY lang ORDER BY lang
    """,
)
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: BPE-ish subword tokens per
    whitespace word — the cost-per-language planning number (a
    language at fertility 2.5 pays 2.5× the context budget of one at
    1.1, which skews both training mix and serving cost).

    Scale: two per-row codegen'd tokenizations (shared regexes with
    text_tokens / token_count_bpe), one |langs|-row rollup with exact
    integer token sums; the ratio is one mirrored division in
    microticks.
    """
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    t = d.select(
        "lang",
        F.size(F.split(F.lower("text"), r"\s+")).cast("bigint").alias("n_ws"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_PATTERN), 0))
        .cast("bigint")
        .alias("n_bpe"),
    )
    return (
        t.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_ws").cast("bigint").alias("ws_tokens"),
            F.sum("n_bpe").cast("bigint").alias("bpe_tokens"),
            F.round(
                F.sum("n_bpe").cast("double")
                / F.sum("n_ws").cast("double")
                * 1_000_000,
                0,
            )
            .cast("bigint")
            .alias("fertility_micro"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Context-window fit profile
# ---------------------------------------------------------------------------

#: Context windows (in BPE-ish tokens) the packing planner cares about.
_CTX_WINDOWS = [128, 512, 2048, 8192]


def _ctx_fit_oracle() -> str:
    fits = ", ".join(
        f"CAST(SUM(CASE WHEN n_bpe <= {w} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS docs_fit_{w}" for w in _CTX_WINDOWS
    )
    tok_fits = ", ".join(
        f"CAST(SUM(CASE WHEN n_bpe <= {w} THEN n_bpe ELSE 0 END) AS BIGINT)"
        f" AS tokens_fit_{w}" for w in _CTX_WINDOWS
    )
    return rf"""
    WITH t AS (
      SELECT CAST(len(regexp_extract_all(text,
               '{BPE_PATTERN.replace("'", "''")}')) AS BIGINT) AS n_bpe
      FROM documents WHERE text IS NOT NULL)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_bpe) AS BIGINT) AS total_tokens,
           {fits}, {tok_fits}
    FROM t
    """


@register("context_window_fit", oracle=_ctx_fit_oracle())
def context_window_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window fit profile: for each candidate window size, how
    many documents (and how many of the corpus' tokens) fit without
    truncation — the sequence-packing planning table that decides the
    training context length and predicts truncation loss.

    Scale: one per-row BPE count, ONE fused aggregate computing every
    window's doc/token tallies as conditional sums — the 100 TB cost
    is a single scan regardless of how many windows are probed.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    t = d.select(
        F.size(F.regexp_extract_all("text", F.lit(BPE_PATTERN), 0))
        .cast("bigint")
        .alias("n_bpe")
    )
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_bpe").cast("bigint").alias("total_tokens"),
    ]
    for w in _CTX_WINDOWS:
        aggs.append(
            F.sum(F.when(F.col("n_bpe") <= w, 1).otherwise(0))
            .cast("bigint")
            .alias(f"docs_fit_{w}")
        )
    for w in _CTX_WINDOWS:
        aggs.append(
            F.sum(F.when(F.col("n_bpe") <= w, F.col("n_bpe")).otherwise(0))
            .cast("bigint")
            .alias(f"tokens_fit_{w}")
        )
    return t.agg(*aggs)


# ---------------------------------------------------------------------------
# PII exposure rate per source
# ---------------------------------------------------------------------------

#: Conservative cross-engine-identical PII patterns (no lookarounds).
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"


@register(
    "pii_rate_by_source",
    oracle=rf"""
    WITH p AS (
      SELECT source,
             CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT)
               AS n_email,
             CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS BIGINT)
               AS n_phone
      FROM documents WHERE text IS NOT NULL)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_email) AS BIGINT) AS email_hits,
           CAST(SUM(n_phone) AS BIGINT) AS phone_hits,
           CAST(SUM(CASE WHEN n_email + n_phone > 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS docs_with_pii,
           CAST(round(
             CAST(SUM(CASE WHEN n_email + n_phone > 0 THEN 1 ELSE 0 END)
               AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) * 1000000000, 0)
             AS BIGINT) AS pii_doc_ticks
    FROM p GROUP BY source ORDER BY source
    """,
)
def pii_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII exposure per crawl source: email / phone pattern hits and
    the share of documents carrying any — the triage table that ranks
    sources by redaction burden BEFORE running pii_redact over the
    full corpus.

    Scale: two per-row codegen'd regexp_extract_all counts (patterns
    chosen lookaround-free so Spark's and DuckDB's regex engines agree
    token-for-token), one |sources|-row rollup.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    p = d.select(
        "source",
        F.size(F.regexp_extract_all("text", F.lit(_PII_EMAIL), 0))
        .cast("bigint")
        .alias("n_email"),
        F.size(F.regexp_extract_all("text", F.lit(_PII_PHONE), 0))
        .cast("bigint")
        .alias("n_phone"),
    )
    has = F.sum(
        F.when(F.col("n_email") + F.col("n_phone") > 0, 1).otherwise(0)
    ).cast("bigint")
    return (
        p.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_email").cast("bigint").alias("email_hits"),
            F.sum("n_phone").cast("bigint").alias("phone_hits"),
            has.alias("docs_with_pii"),
            F.round(
                has.cast("double") / F.count(F.lit(1)).cast("double") * 1_000_000_000,
                0,
            )
            .cast("bigint")
            .alias("pii_doc_ticks"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# One-row dataset card
# ---------------------------------------------------------------------------

@register(
    "dataset_card_summary",
    oracle=r"""
    WITH p AS (
      SELECT lang, source, text,
             CASE WHEN text IS NOT NULL
               THEN CAST(len(string_split_regex(lower(text), '\s+'))
                 AS BIGINT) END AS n_ws,
             CASE WHEN text IS NOT NULL
               THEN CAST(length(text) AS BIGINT) END AS n_chars,
             CASE WHEN text IS NOT NULL
               THEN md5(array_to_string(
                 string_split_regex(lower(trim(text)), '\s+'), ' ')) END
               AS fp
      FROM documents)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(text) AS BIGINT) AS n_with_text,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(SUM(n_ws) AS BIGINT) AS total_ws_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
             AS en_docs,
           CAST(COUNT(text) - COUNT(DISTINCT fp) AS BIGINT) AS exact_dup_docs,
           CAST(round(CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
             AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) * 1000000000, 0)
             AS BIGINT) AS en_share_ticks,
           CAST(round(CAST(SUM(n_chars) AS DOUBLE)
             / CAST(COUNT(text) AS DOUBLE) * 1000000, 0) AS BIGINT)
             AS mean_chars_micro
    FROM p
    """,
)
def dataset_card_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dataset card for the documents corpus: doc / language /
    source counts, token and character volume, English share, exact-
    duplicate count, mean length — the header block of a HuggingFace-
    style dataset card, computed in ONE pass.

    Scale: every statistic — including the duplicate count, via
    count(text) − count(DISTINCT fingerprint) — fuses into a single
    aggregation over one scan; the two COUNT(DISTINCT) terms are the
    expensive parts at 100 TB (swap to approx_count_distinct with a
    documented tolerance, or pre-bucket the fingerprint space).
    """
    d = load_table(spark, sf_dir, "documents")
    has_text = F.col("text").isNotNull()
    norm = F.concat_ws(" ", F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
    p = d.select(
        "lang",
        "source",
        "text",
        F.when(has_text, F.size(F.split(F.lower("text"), r"\s+")).cast("bigint")).alias(
            "n_ws"
        ),
        F.when(has_text, F.length("text").cast("bigint")).alias("n_chars"),
        F.when(has_text, F.md5(norm)).alias("fp"),
    )
    en = F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("bigint")
    return p.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.count("text").cast("bigint").alias("n_with_text"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.sum("n_ws").cast("bigint").alias("total_ws_tokens"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        en.alias("en_docs"),
        (F.count("text") - F.countDistinct("fp")).cast("bigint").alias(
            "exact_dup_docs"
        ),
        F.round(
            en.cast("double") / F.count(F.lit(1)).cast("double") * 1_000_000_000, 0
        )
        .cast("bigint")
        .alias("en_share_ticks"),
        F.round(
            F.sum("n_chars").cast("double")
            / F.count("text").cast("double")
            * 1_000_000,
            0,
        )
        .cast("bigint")
        .alias("mean_chars_micro"),
    )


# ---------------------------------------------------------------------------
# Train/test leakage audit over the hash split
# ---------------------------------------------------------------------------

@register(
    "split_leakage_audit",
    oracle=r"""
    WITH s AS (
      SELECT md5(array_to_string(
               string_split_regex(lower(trim(text)), '\s+'), ' ')) AS fp,
             CASE WHEN CAST(concat('0x', substr(md5(concat('split:',
                    CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 100 < 80
                  THEN 'train'
                  WHEN CAST(concat('0x', substr(md5(concat('split:',
                    CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 100 < 90
                  THEN 'validation'
                  ELSE 'test' END AS split
      FROM documents WHERE text IS NOT NULL),
    g AS (
      SELECT fp,
             CAST(MAX(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
               AS in_train,
             CAST(MAX(CASE WHEN split <> 'train' THEN 1 ELSE 0 END) AS BIGINT)
               AS in_eval,
             CAST(COUNT(*) AS BIGINT) AS n_copies
      FROM s GROUP BY fp)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_fingerprints,
           CAST(SUM(CASE WHEN in_train = 1 AND in_eval = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS leaked_fingerprints,
           CAST(SUM(CASE WHEN in_train = 1 AND in_eval = 1 THEN n_copies
             ELSE 0 END) AS BIGINT) AS leaked_docs,
           CAST(SUM(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS dup_fingerprints
    FROM g
    """,
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval leakage audit over the SAME md5 hash split
    dataset_split produces: fingerprints whose copies land on both
    sides of the train boundary — the contamination that silently
    inflates eval scores, because a random doc-level split leaks every
    duplicated document.

    Scale: one scan projects (fingerprint, split) per row; ONE
    fingerprint-keyed aggregation computes side membership with max
    flags; the verdict is a 1-row rollup. The leak count is exactly
    why dedup must precede splitting — this operator quantifies the
    damage of skipping it.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    norm = F.concat_ws(" ", F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "validation").otherwise("test")
    )
    s = d.select(F.md5(norm).alias("fp"), split.alias("split"))
    g = s.groupBy("fp").agg(
        F.max(F.when(F.col("split") == "train", 1).otherwise(0))
        .cast("bigint")
        .alias("in_train"),
        F.max(F.when(F.col("split") != "train", 1).otherwise(0))
        .cast("bigint")
        .alias("in_eval"),
        F.count(F.lit(1)).cast("bigint").alias("n_copies"),
    )
    leaked = (F.col("in_train") == 1) & (F.col("in_eval") == 1)
    return g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fingerprints"),
        F.sum(F.when(leaked, 1).otherwise(0)).cast("bigint").alias(
            "leaked_fingerprints"
        ),
        F.sum(F.when(leaked, F.col("n_copies")).otherwise(0))
        .cast("bigint")
        .alias("leaked_docs"),
        F.sum(F.when(F.col("n_copies") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("dup_fingerprints"),
    )


# ---------------------------------------------------------------------------
# Inverse-frequency class-balance weights
# ---------------------------------------------------------------------------

@register(
    "class_balance_weights",
    oracle="""
    WITH c AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents WHERE lang IS NOT NULL GROUP BY lang),
    t AS (
      SELECT CAST(SUM(n) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM c)
    SELECT c.lang, c.n, t.total,
           CAST(round(CAST(t.total AS DOUBLE)
             / (CAST(t.k AS DOUBLE) * CAST(c.n AS DOUBLE))
             * 1000000, 0) AS BIGINT) AS weight_micro
    FROM c, t ORDER BY c.lang
    """,
)
def class_balance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-frequency sampling weights per language (sklearn's
    'balanced' formula N/(k·n_c)) — the per-class multipliers that
    rebalance a skewed corpus at sampling time; weight·n_c is constant
    across classes by construction.

    Scale: one map-side-combinable count to |langs| rows; the N and k
    totals come from an all-rows window over that tiny reduction (a
    totals-frame cross-join would replan the scan subtree twice — a
    second corpus pass for a 1-row total), one mirrored division in
    microticks.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("lang").isNotNull())
    c = d.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wspec = Window.partitionBy()  # |langs| rows — single-partition safe
    t = c.withColumn("total", F.sum("n").over(wspec).cast("bigint")).withColumn(
        "k", F.count(F.lit(1)).over(wspec).cast("bigint")
    )
    w = F.round(
        F.col("total").cast("double")
        / (F.col("k").cast("double") * F.col("n").cast("double"))
        * 1_000_000,
        0,
    ).cast("bigint")
    return t.select("lang", "n", "total", w.alias("weight_micro")).orderBy("lang")


# ---------------------------------------------------------------------------
# Corpus-LM perplexity ranking per source
# ---------------------------------------------------------------------------

@register(
    "perplexity_by_source",
    oracle=r"""
    WITH toks AS (
      SELECT source, unnest(string_split_regex(lower(text), '\s+')) AS term
      FROM documents),
    vocab AS (SELECT term, COUNT(*) AS tc FROM toks GROUP BY term),
    tot AS (SELECT SUM(tc) AS total_tokens FROM vocab),
    vticks AS (
      SELECT term,
             CAST(round(ln(CAST(total_tokens AS DOUBLE) / tc) * 1000000000, 0)
               AS BIGINT) AS ticks
      FROM vocab, tot)
    SELECT t.source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(v.ticks) AS BIGINT) AS sum_surprisal_ticks,
           CAST(round(CAST(SUM(v.ticks) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 0) AS BIGINT)
             AS avg_surprisal_ticks
    FROM toks t JOIN vticks v ON t.term = v.term
    GROUP BY t.source ORDER BY t.source
    """,
)
def perplexity_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average unigram surprisal (log-perplexity) per source under the
    corpus's own language model — perplexity filtering at the feed
    level: a source whose text is far more "surprising" than the
    corpus average is usually spam, boilerplate, or the wrong
    language, and gets down-weighted before training.

    Scale: the vocabulary reduces once (token-keyed, map-side
    combine), surprisal ticks are quantized per TERM before any sum,
    and the token⋈vocabulary join is key-on-key and hint-free (the
    vocabulary is corpus-dependent — AQE broadcasts it while it fits,
    shuffles when it doesn't; cf. unigram_surprisal's per-doc form).
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.split(F.lower("text"), r"\s+")).alias("term")
    )
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("tc"))
    tot = vocab.agg(F.sum("tc").alias("total_tokens"))
    vticks = vocab.crossJoin(F.broadcast(tot)).select(
        "term",
        F.round(
            F.log(F.col("total_tokens").cast("double") / F.col("tc"))
            * 1_000_000_000,
            0,
        )
        .cast("bigint")
        .alias("ticks"),
    )
    return (
        toks.join(vticks, "term")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("ticks").cast("bigint").alias("sum_surprisal_ticks"),
            F.round(
                F.sum("ticks").cast("double") / F.count(F.lit(1)).cast("double"), 0
            )
            .cast("bigint")
            .alias("avg_surprisal_ticks"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# KL divergence of each source's length distribution from the corpus
# ---------------------------------------------------------------------------

@register(
    "kl_divergence_by_source",
    oracle="""
    WITH b AS (
      SELECT source, CAST(n_chars // 50 AS BIGINT) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY source, bin),
    t AS (
      SELECT source, bin, n,
             CAST(SUM(n) OVER (PARTITION BY source) AS BIGINT) AS src_tot,
             CAST(SUM(n) OVER (PARTITION BY bin) AS BIGINT) AS bin_tot,
             CAST(SUM(n) OVER () AS BIGINT) AS corpus_tot
      FROM b)
    SELECT source, CAST(MAX(src_tot) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(round(
             (CAST(n AS DOUBLE) / CAST(src_tot AS DOUBLE))
             * ln((CAST(n AS DOUBLE) / CAST(src_tot AS DOUBLE))
                  / (CAST(bin_tot AS DOUBLE) / CAST(corpus_tot AS DOUBLE)))
             * 1000000000, 0) AS BIGINT)) AS BIGINT) AS kl_ticks
    FROM t GROUP BY source ORDER BY source
    """,
)
def kl_divergence_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL divergence of each source's document-length distribution
    from the corpus-wide distribution — the "which feed looks least
    like the rest" ranking that complements psi_drift's two-sided
    gate (KL is per-source, directional, and zero only for a source
    shaped exactly like the corpus).

    Scale: documents reduce to |sources|×|bins| cells once; all three
    marginals are windows over that tiny table, and each p·ln(p/q)
    term is quantized to nanoticks before the per-source int64 sum.
    """
    d = load_table(spark, sf_dir, "documents")
    b = d.groupBy(
        "source", (F.col("n_chars") / 50).cast("bigint").alias("bin")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t = b.select(
        "source",
        "n",
        F.sum("n").over(Window.partitionBy("source")).cast("bigint").alias("src_tot"),
        F.sum("n").over(Window.partitionBy("bin")).cast("bigint").alias("bin_tot"),
        F.sum("n").over(w_all).cast("bigint").alias("corpus_tot"),
    )
    p = F.col("n").cast("double") / F.col("src_tot").cast("double")
    q = F.col("bin_tot").cast("double") / F.col("corpus_tot").cast("double")
    term = F.round(p * F.log(p / q) * 1_000_000_000, 0).cast("bigint")
    return (
        t.withColumn("term_ticks", term)
        .groupBy("source")
        .agg(
            F.max("src_tot").cast("bigint").alias("n_docs"),
            F.sum("term_ticks").cast("bigint").alias("kl_ticks"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Exact-duplicate cluster-size histogram
# ---------------------------------------------------------------------------

@register(
    "dup_cluster_histogram",
    oracle=r"""
    WITH fp AS (
      SELECT md5(array_to_string(
               string_split_regex(lower(trim(text)), '\s+'), ' ')) AS f,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM documents WHERE text IS NOT NULL GROUP BY f)
    SELECT CAST(length(bin(n)) - 1 AS BIGINT) AS log2_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(n) AS BIGINT) AS n_docs
    FROM fp GROUP BY log2_bucket ORDER BY log2_bucket
    """,
)
def dup_cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate cluster-size histogram (log2 buckets): how many
    fingerprint groups are singletons vs 2-3-copy vs mass-duplicated —
    the shape that decides dedup strategy (a fat head of mega-clusters
    wants the capped machinery; a long tail of pairs doesn't).

    Scale: one fingerprint-keyed count, then a ~16-row histogram with
    binary-length buckets (integer-exact log2).
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    norm = F.concat_ws(" ", F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
    fp = d.select(F.md5(norm).alias("f")).groupBy("f").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    return (
        fp.groupBy(
            (F.length(F.bin("n")) - 1).cast("bigint").alias("log2_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
            F.sum("n").cast("bigint").alias("n_docs"),
        )
        .orderBy("log2_bucket")
    )


# ---------------------------------------------------------------------------
# Lexical diversity per source (TTR + hapax)
# ---------------------------------------------------------------------------

@register(
    "lexical_diversity_by_source",
    oracle=r"""
    WITH tok AS (
      SELECT source, unnest(string_split_regex(lower(text), '\s+')) AS token
      FROM documents WHERE text IS NOT NULL),
    tc AS (
      SELECT source, token, CAST(COUNT(*) AS BIGINT) AS n
      FROM tok WHERE token <> '' GROUP BY source, token)
    SELECT source,
           CAST(SUM(n) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS vocab_size,
           CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS hapax_count,
           CAST(round(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(n) AS DOUBLE)
             * 1000000, 0) AS BIGINT) AS ttr_micro,
           CAST(round(CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) * 1000000, 0) AS BIGINT)
             AS hapax_share_micro
    FROM tc GROUP BY source ORDER BY source
    """,
)
def lexical_diversity_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity per source: type-token ratio and hapax-legomena
    share — the vocabulary-richness screen that separates natural prose
    (high TTR, fat hapax tail) from templated/boilerplate feeds (tiny
    closed vocabulary) before any model-based quality scoring runs.

    Scale: ONE (source, token)-keyed count with map-side combine (state
    bounded by per-source vocabulary, not corpus size), then a
    |sources|-row rollup; TTR and hapax share are mirrored divisions in
    microticks over exact int64 sums.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tok = d.select(
        "source", F.explode(F.split(F.lower("text"), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    tc = tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("n"))
    hapax = F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
    return (
        tc.groupBy("source")
        .agg(
            F.sum("n").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
            hapax.cast("bigint").alias("hapax_count"),
            F.round(
                F.count(F.lit(1)).cast("double") / F.sum("n").cast("double")
                * 1_000_000,
                0,
            ).cast("bigint").alias("ttr_micro"),
            F.round(
                hapax.cast("double") / F.count(F.lit(1)).cast("double")
                * 1_000_000,
                0,
            ).cast("bigint").alias("hapax_share_micro"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Bigram conditional entropy per language
# ---------------------------------------------------------------------------

@register(
    "bigram_cond_entropy_by_lang",
    oracle=r"""
    WITH toks AS (
      SELECT lang, string_split_regex(lower(text), '\s+') AS toks
      FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
        AND len(string_split_regex(lower(text), '\s+')) >= 2),
    pos AS (
      SELECT lang, toks, unnest(generate_series(1, len(toks) - 1)) AS i
      FROM toks),
    bc AS (
      SELECT lang, toks[i] AS w1, toks[i + 1] AS w2,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM pos GROUP BY lang, w1, w2),
    wt AS (
      SELECT lang, n,
             CAST(SUM(n) OVER (PARTITION BY lang, w1) AS BIGINT) AS n1,
             CAST(SUM(n) OVER (PARTITION BY lang) AS BIGINT) AS tot
      FROM bc),
    terms AS (
      SELECT lang, tot,
             CAST(round((CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))
               * ln(CAST(n AS DOUBLE) / CAST(n1 AS DOUBLE))
               * 1000000000, 0) AS BIGINT) AS term_ticks
      FROM wt)
    SELECT lang, CAST(MAX(tot) AS BIGINT) AS n_bigrams,
           CAST(-SUM(term_ticks) AS BIGINT) AS cond_entropy_ticks
    FROM terms GROUP BY lang ORDER BY lang
    """,
)
def bigram_cond_entropy_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram conditional entropy H(next|term) per language — the
    corpus-level redundancy rate (nats, in nanoticks). Low conditional
    entropy means word order is highly predictable: templated or
    machine-generated feeds score far below natural prose, making this
    the aggregate sibling of the per-doc bigram_surprisal screen.

    Scale: bigrams are born per-row with the codegen'd index transform
    (no position self-join), reduce once to the vocab²-bounded
    (lang, w1, w2) count table (checkpointed — it feeds both the
    context window and the per-lang totals), n(w1) contexts come from a
    per-(lang, w1) window over that table, and the per-lang total joins
    back as a broadcast |langs|-row aggregate instead of a
    single-partition lang window. Each p·ln term is quantized to
    nanoticks BEFORE the distributed sum (exact int64, order-free).
    """
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    toks = d.select(
        "lang", F.split(F.lower("text"), r"\s+").alias("toks")
    ).filter(F.size("toks") >= 2)
    pairs = toks.select(
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> struct(element_at(toks, i) AS w1,"
                " element_at(toks, i + 1) AS w2))"
            )
        ).alias("bg"),
    ).select("lang", "bg.w1", "bg.w2")
    bc = (
        pairs.groupBy("lang", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    tot = bc.groupBy("lang").agg(F.sum("n").cast("bigint").alias("tot"))
    wt = bc.withColumn(
        "n1", F.sum("n").over(Window.partitionBy("lang", "w1")).cast("bigint")
    ).join(F.broadcast(tot), "lang")
    term = F.round(
        (F.col("n").cast("double") / F.col("tot").cast("double"))
        * F.log(F.col("n").cast("double") / F.col("n1").cast("double"))
        * 1_000_000_000,
        0,
    ).cast("bigint")
    return (
        wt.withColumn("term_ticks", term)
        .groupBy("lang")
        .agg(
            F.max("tot").cast("bigint").alias("n_bigrams"),
            (-F.sum("term_ticks")).cast("bigint").alias("cond_entropy_ticks"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Exact document-length deciles per source
# ---------------------------------------------------------------------------

#: Value-bucket width (chars) for the grouped length-decile machinery.
_LEN_BUCKET_CHARS = 1_000


@register(
    "doc_length_deciles_by_source",
    oracle="""
    WITH pv AS (
      SELECT source, CAST(n_chars AS BIGINT) AS v, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents WHERE n_chars IS NOT NULL GROUP BY source, v),
    c AS (
      SELECT source, v,
             CAST(SUM(c) OVER (PARTITION BY source ORDER BY v) AS BIGINT)
               AS cum
      FROM pv),
    t AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM pv GROUP BY source),
    ds AS (SELECT unnest([1, 2, 3, 4, 5, 6, 7, 8, 9]) AS d),
    sp AS (SELECT source, d, (d * n + 9) // 10 AS thr FROM t, ds)
    SELECT sp.source, sp.d AS decile,
           CAST(MIN(CASE WHEN c.cum >= sp.thr THEN c.v END) AS BIGINT)
             AS chars_at
    FROM c JOIN sp ON c.source = sp.source
    GROUP BY sp.source, sp.d
    ORDER BY sp.source, sp.d
    """,
)
def doc_length_deciles_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact document-length deciles per source — the length-filter
    design table (where do p10/p90 sit per feed?) that sets gopher-style
    min/max-length gates and the packing planner's length priors,
    without percentile_approx error bars.

    Scale: the grouped bucketed-ECDF scaffold (cf.
    event_value_deciles_by_type): per-(source, n_chars) counts reduce
    once (checkpointed), cumulative counts run in per-(source,
    length-bucket) windows with per-source bucket offsets from the tiny
    occupied-bucket table, and each decile is a conditional MIN against
    the broadcast |sources|×9 integer-ceil threshold spine. No global
    sort, no driver collect.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars").isNotNull())
    pv = (
        d.select("source", F.col("n_chars").cast("bigint").alias("v"))
        .groupBy("source", "v")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("bkt", (F.col("v") / _LEN_BUCKET_CHARS).cast("bigint"))
        .localCheckpoint()
    )
    per_bkt = pv.groupBy("source", "bkt").agg(F.sum("c").alias("bc"))
    w_off = (
        Window.partitionBy("source")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_bkt.select(
        "source",
        "bkt",
        F.coalesce(F.sum("bc").over(w_off), F.lit(0)).alias("off"),
    )
    t = pv.groupBy("source").agg(F.sum("c").cast("bigint").alias("n"))
    w_in = (
        Window.partitionBy("source", "bkt")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = (
        pv.withColumn("loc", F.sum("c").over(w_in))
        .join(offsets, ["source", "bkt"])
        .select("source", "v", (F.col("off") + F.col("loc")).alias("cum"))
    )
    sp = t.select(
        "source",
        F.explode(F.array(*[F.lit(d_) for d_ in range(1, 10)])).alias("d"),
        "n",
    ).select(
        "source",
        "d",
        ((F.col("d") * F.col("n") + 9) / 10).cast("bigint").alias("thr"),
    )
    return (
        c.join(F.broadcast(sp), "source")
        .groupBy("source", F.col("d").alias("decile"))
        .agg(
            F.min(F.when(F.col("cum") >= F.col("thr"), F.col("v")))
            .cast("bigint")
            .alias("chars_at")
        )
        .orderBy("source", "decile")
    )


# ---------------------------------------------------------------------------
# Chunk-voting language purity per source
# ---------------------------------------------------------------------------

#: Chunk width (tokens) for the mixed-language vote.
_PURITY_CHUNK = 20


def _purity_oracle() -> str:
    score = {
        lang: f"len(list_filter(ck, t -> t IN ({', '.join(repr(w) for w in ws)})))"
        for lang, ws in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    cases = []
    for lang in langs:
        cond = " AND ".join(
            f"{score[lang]} >= {score[o]}" for o in langs if o != lang
        )
        cases.append(f"WHEN {cond} THEN '{lang}'")
    case_sql = "CASE " + " ".join(cases) + " ELSE 'und' END"
    return rf"""
    WITH t AS (
      SELECT source, lang, string_split_regex(lower(text), '\s+') AS toks
      FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL),
    pos AS (
      SELECT source, lang, toks,
             unnest(generate_series(1,
               CAST(ceil(len(toks) / {_PURITY_CHUNK}.0) AS BIGINT))) AS ci
      FROM t WHERE len(toks) > 0),
    ck AS (
      SELECT source, lang,
             toks[(ci-1)*{_PURITY_CHUNK}+1 :
                  LEAST(len(toks), ci*{_PURITY_CHUNK})] AS ck
      FROM pos),
    pred AS (SELECT source, lang, {case_sql} AS p FROM ck)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN p = lang THEN 1 ELSE 0 END) AS BIGINT)
             AS n_agree,
           CAST(round(CAST(SUM(CASE WHEN p = lang THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) * 1000000, 0) AS BIGINT)
             AS purity_micro
    FROM pred GROUP BY source ORDER BY source
    """


@register("mixed_lang_purity_by_source", oracle=_purity_oracle())
def mixed_lang_purity_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-voting language purity: split each document into
    {_PURITY_CHUNK}-token chunks, language-ID each chunk with the shared
    marker lexicon, and report per source the share of chunks agreeing
    with the document's label — the mixed-language/code-switch detector
    that a single doc-level language ID structurally cannot see.

    Scale: chunks are born per-row with a codegen'd sequence transform
    (fan-out = ceil(tokens/{_PURITY_CHUNK}) per doc, linear in corpus
    tokens); the marker scoring is the same JVM higher-order filter as
    text_langid (tie-break en>de>fr>es>zh mirrored in the oracle CASE
    chain), and everything reduces in ONE map-side-combinable rollup to
    |sources| rows.
    """
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    toks = F.split(F.lower("text"), r"\s+")
    base = d.select("source", "lang", toks.alias("toks")).filter(
        F.size("toks") > 0
    )
    chunks = F.expr(
        f"transform(sequence(1, CAST(ceil(size(toks) / {_PURITY_CHUNK}.0) AS INT)),"
        f" ci -> slice(toks, (ci-1)*{_PURITY_CHUNK}+1, {_PURITY_CHUNK}))"
    )
    ck = base.select(
        "source", "lang", F.explode(chunks).alias("ck")
    )

    def marker_counter(ws: tuple[str, ...]):
        return lambda t: t.isin(*ws)

    scores = {
        lang: F.size(F.filter(F.col("ck"), marker_counter(ws)))
        for lang, ws in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    pred = F.lit("und")
    for lang in reversed(langs):
        cond = None
        for o in langs:
            if o == lang:
                continue
            c = scores[lang] >= scores[o]
            cond = c if cond is None else (cond & c)
        pred = F.when(cond, lang).otherwise(pred)
    agree = F.sum(F.when(F.col("p") == F.col("lang"), 1).otherwise(0))
    return (
        ck.select("source", "lang", pred.alias("p"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            agree.cast("bigint").alias("n_agree"),
            F.round(
                agree.cast("double") / F.count(F.lit(1)).cast("double")
                * 1_000_000,
                0,
            ).cast("bigint").alias("purity_micro"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Template-prefix clusters (shared-opening boilerplate detector)
# ---------------------------------------------------------------------------

#: Prefix width (tokens) and result cap for the template detector.
_TMPL_PREFIX = 8
_TMPL_TOPK = 20


@register(
    "template_prefix_clusters",
    oracle=rf"""
    WITH fp AS (
      SELECT md5(array_to_string(
               string_split_regex(lower(trim(text)), '\s+')[1:{_TMPL_PREFIX}],
               ' ')) AS f,
             source
      FROM documents WHERE text IS NOT NULL),
    g AS (
      SELECT f, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
      FROM fp GROUP BY f)
    SELECT f AS prefix_hash, n_docs, n_sources
    FROM g WHERE n_docs >= 2
    ORDER BY n_docs DESC, prefix_hash
    LIMIT {_TMPL_TOPK}
    """,
)
def template_prefix_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template-opening detector: documents sharing their first
    {_TMPL_PREFIX} normalized tokens, ranked by cluster size with a
    cross-source spread count — catches boilerplate headers, scraped
    templates, and mirrored feeds that full-document fingerprints miss
    (the bodies differ) and near-dup LSH pays real work to find.

    Scale: ONE prefix-fingerprint-keyed count with map-side combine
    (the md5 normalization is shared with dup_cluster_histogram, cut to
    the token prefix); the n_docs ≥ 2 filter drops the singleton tail
    before the TakeOrderedAndProject heap.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    prefix = F.concat_ws(
        " ", F.slice(F.split(F.lower(F.trim(F.col("text"))), r"\s+"), 1, _TMPL_PREFIX)
    )
    g = (
        d.select(F.md5(prefix).alias("f"), "source")
        .groupBy("f")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
        )
    )
    return (
        g.filter(F.col("n_docs") >= 2)
        .select(F.col("f").alias("prefix_hash"), "n_docs", "n_sources")
        .orderBy(F.desc("n_docs"), "prefix_hash")
        .limit(_TMPL_TOPK)
    )


# ---------------------------------------------------------------------------
# Quantile-normalization map (per-source → global length quantiles)
# ---------------------------------------------------------------------------

def _qmap_oracle() -> str:
    from ai_etl_studio_spark.operators import ORACLES

    return f"""
    WITH src AS ({ORACLES["doc_length_deciles_by_source"]}),
    pv AS (
      SELECT CAST(n_chars AS BIGINT) AS v, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents WHERE n_chars IS NOT NULL GROUP BY v),
    cg AS (
      SELECT v, CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS cum FROM pv),
    tg AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM pv),
    ds AS (SELECT unnest([1, 2, 3, 4, 5, 6, 7, 8, 9]) AS d),
    gq AS (
      SELECT ds.d AS decile,
             CAST(MIN(CASE WHEN cg.cum >= (ds.d * tg.n + 9) // 10
                      THEN cg.v END) AS BIGINT) AS global_chars
      FROM cg, tg, ds GROUP BY ds.d)
    SELECT src.source, CAST(src.decile AS BIGINT) AS decile,
           src.chars_at AS source_chars, gq.global_chars,
           CAST(gq.global_chars - src.chars_at AS BIGINT) AS shift_chars
    FROM src JOIN gq ON src.decile = gq.decile
    ORDER BY src.source, decile
    """


@register("quantile_norm_map", oracle=_qmap_oracle())
def quantile_norm_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-normalization lookup table: each source's length
    deciles aligned with the corpus-global deciles — the broadcastable
    mapping that rank-normalizes per-feed score distributions onto one
    scale (how quantile normalization actually ships at 100 TB: build
    the tiny per-source map once, broadcast it, apply per row; never
    rank the corpus per query).

    Scale: composes the REGISTERED per-source decile scaffold (oracle
    text reused as a CTE) with a global bucketed ECDF over the
    |distinct lengths| reduction; the output is |sources|×9 rows — the
    artifact IS broadcast-sized by construction.
    """
    src = doc_length_deciles_by_source(spark, sf_dir).select(
        "source", "decile", F.col("chars_at").alias("source_chars")
    )
    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars").isNotNull())
    pv = (
        d.select(F.col("n_chars").cast("bigint").alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("bkt", (F.col("v") / _LEN_BUCKET_CHARS).cast("bigint"))
        .localCheckpoint()
    )
    per_bkt = pv.groupBy("bkt").agg(F.sum("c").alias("bc"))
    w_off = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_bkt.select(
        "bkt", F.coalesce(F.sum("bc").over(w_off), F.lit(0)).alias("off")
    )
    t = pv.agg(F.sum("c").cast("bigint").alias("n"))
    w_in = (
        Window.partitionBy("bkt")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cg = (
        pv.withColumn("loc", F.sum("c").over(w_in))
        .join(offsets, "bkt")
        .select("v", (F.col("off") + F.col("loc")).alias("cum"))
    )
    sp = t.select(
        F.explode(F.array(*[F.lit(x) for x in range(1, 10)])).alias("d"), "n"
    ).select("d", ((F.col("d") * F.col("n") + 9) / 10).cast("bigint").alias("thr"))
    glob = (
        cg.crossJoin(F.broadcast(sp))
        .groupBy(F.col("d").cast("bigint").alias("decile"))
        .agg(
            F.min(F.when(F.col("cum") >= F.col("thr"), F.col("v")))
            .cast("bigint")
            .alias("global_chars")
        )
    )
    return (
        src.join(F.broadcast(glob), "decile")
        .select(
            "source",
            "decile",
            "source_chars",
            "global_chars",
            (F.col("global_chars") - F.col("source_chars"))
            .cast("bigint")
            .alias("shift_chars"),
        )
        .orderBy("source", "decile")
    )


# ---------------------------------------------------------------------------
# Held-out unigram perplexity (proper LM eval split)
# ---------------------------------------------------------------------------

@register(
    "heldout_perplexity",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id % 2 AS half, source,
             unnest(string_split_regex(lower(text), '\s+')) AS w
      FROM documents WHERE text IS NOT NULL),
    train AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok WHERE half = 0 AND w <> '' GROUP BY w),
    tn AS (SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v
           FROM train),
    held AS (SELECT source, w FROM tok WHERE half = 1 AND w <> ''),
    scored AS (
      SELECT h.source,
             CAST(round(ln(CAST(tn.n + tn.v + 1 AS DOUBLE)
               / (COALESCE(t.c, 0) + 1)) * 1000000000, 0) AS BIGINT) AS ticks
      FROM held h LEFT JOIN train t ON h.w = t.w CROSS JOIN tn)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(ticks) AS BIGINT) AS surprisal_ticks,
           CAST(SUM(ticks) // COUNT(*) AS BIGINT) AS avg_ticks
    FROM scored GROUP BY source ORDER BY source
    """,
)
def heldout_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out perplexity: the unigram LM trains on the even-doc_id
    half and scores the ODD half (add-one smoothing, +1 OOV slot) —
    the in-sample bias check on perplexity_by_source (a memorized
    template scores deceptively well when it graded itself; held-out
    scoring is how LM quality filters are actually validated).

    Scale: the build/serve two-pass shape — the train half reduces to
    the vocabulary-bounded count table (checkpointed; its 1-row totals
    aggregate from the checkpoint and broadcast), the held half joins
    it hint-free (aggregate-reduced — AQE broadcasts a fitting vocab),
    and each token's smoothed surprisal quantizes to nanoticks before
    the per-source sum.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())

    def toks(half: int) -> DataFrame:
        return d.filter(F.col("doc_id") % 2 == half).select(
            "source", F.explode(F.split(F.lower("text"), r"\s+")).alias("w")
        ).filter(F.col("w") != "")

    train = (
        toks(0).groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint()
    )
    tn = train.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    held = toks(1)
    ticks = F.round(
        F.log(
            (F.col("n") + F.col("v") + 1).cast("double")
            / (F.coalesce(F.col("c"), F.lit(0)) + 1)
        )
        * 1_000_000_000,
        0,
    ).cast("bigint")
    return (
        held.join(train, "w", "left")
        .crossJoin(F.broadcast(tn))
        .select("source", ticks.alias("ticks"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("ticks").cast("bigint").alias("surprisal_ticks"),
            (F.sum("ticks") / F.count(F.lit(1)))
            .cast("bigint")
            .alias("avg_ticks"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Top-k vocabulary token coverage (tokenizer-budget curve)
# ---------------------------------------------------------------------------

#: Vocabulary sizes probed by the coverage curve.
_COVERAGE_KS = (1, 10, 100, 1_000, 10_000, 100_000)


@register(
    "vocab_coverage_topk",
    oracle=rf"""
    WITH tok AS (
      SELECT unnest(string_split_regex(lower(text), '\s+')) AS w
      FROM documents WHERE text IS NOT NULL),
    cnt AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok WHERE w <> '' GROUP BY w),
    rk AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, w) AS r FROM cnt),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM cnt),
    ks AS (SELECT unnest([{", ".join(map(str, _COVERAGE_KS))}]) AS k)
    SELECT CAST(ks.k AS BIGINT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(c) AS BIGINT) AS covered_tokens,
           CAST(MAX(total) AS BIGINT) AS total_tokens,
           CAST(SUM(c) * 1000000000 // MAX(total) AS BIGINT)
             AS coverage_ppb
    FROM rk JOIN ks ON rk.r <= ks.k CROSS JOIN tot
    GROUP BY ks.k ORDER BY k
    """,
)
def vocab_coverage_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token mass covered by the top-k most frequent words, for k in
    1..100 000 — the tokenizer-budget curve: how big a vocabulary must
    be before OOV/byte-fallback mass becomes negligible, and the
    headline behind "the top 100 words are X% of the corpus".

    Scale: the corpus reduces once to vocabulary-bounded word counts;
    the exact global frequency rank then comes from the bucketed-rank
    scaffold (log2(count) buckets via length(bin()) — per-bucket
    row_number windows plus a tiny ≤64-row offset table, never a
    global sort of the vocabulary). Each word fans out only to the
    ≤|ks| probe sizes at or above its rank (map-side explode), and the
    coverage share is exact 128-bit integer arithmetic (decimal(38,0)
    / HUGEINT) — float never touches a distributed sum.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    cnt = (
        d.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .withColumn("bkt", (F.length(F.bin("c")) - 1).cast("bigint"))
        .localCheckpoint()  # ranks + offsets + totals read once
    )
    per_bkt = cnt.groupBy("bkt").agg(F.count(F.lit(1)).alias("n_in"))
    w_off = Window.orderBy(F.desc("bkt")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = per_bkt.select(
        "bkt", F.coalesce(F.sum("n_in").over(w_off), F.lit(0)).alias("off")
    )
    tot = cnt.agg(F.sum("c").cast("bigint").alias("total"))
    w_in = Window.partitionBy("bkt").orderBy(F.desc("c"), "w")
    ks = F.array(*[F.lit(k) for k in _COVERAGE_KS])
    ranked = (
        cnt.withColumn("rn", F.row_number().over(w_in))
        .join(offsets, "bkt")
        .select("c", (F.col("off") + F.col("rn")).alias("r"))
    )
    return (
        ranked.select(
            "c", F.explode(F.filter(ks, lambda k: k >= F.col("r"))).alias("k")
        )
        .groupBy(F.col("k").cast("bigint").alias("k"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("c").cast("bigint").alias("covered_tokens"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "k",
            "n_words",
            "covered_tokens",
            F.col("total").cast("bigint").alias("total_tokens"),
            F.expr(
                "CAST(CAST(covered_tokens AS DECIMAL(38,0)) * 1000000000"
                " DIV total AS BIGINT)"
            ).alias("coverage_ppb"),
        )
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# Readability profile per source (Flesch-Kincaid-style)
# ---------------------------------------------------------------------------

@register(
    "readability_scores_by_source",
    oracle=r"""
    WITH d AS (
      SELECT source,
             CAST(len(list_filter(string_split_regex(text, '\s+'),
               w -> w <> '')) AS BIGINT) AS words,
             CAST(len(list_filter(string_split_regex(text, '[.!?]+'),
               x -> regexp_matches(x, '\S'))) AS BIGINT) AS sents,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
               AS BIGINT) AS syls,
             CAST(length(text) AS BIGINT) AS chars
      FROM documents WHERE text IS NOT NULL),
    f AS (SELECT * FROM d WHERE words >= 1 AND sents >= 1)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(words) AS BIGINT) AS words,
           CAST(SUM(sents) AS BIGINT) AS sentences,
           CAST(round(CAST(SUM(words) AS DOUBLE) / SUM(sents) * 1000000, 0)
             AS BIGINT) AS words_per_sentence_micro,
           CAST(round(CAST(SUM(chars) AS DOUBLE) / SUM(words) * 1000000, 0)
             AS BIGINT) AS chars_per_word_micro,
           CAST(round((0.39e0 * (CAST(SUM(words) AS DOUBLE) / SUM(sents))
             + 11.8e0 * (CAST(SUM(syls) AS DOUBLE) / SUM(words))
             - 15.59e0) * 1000, 0) AS BIGINT) AS fk_grade_milli
    FROM f GROUP BY source ORDER BY source
    """,
)
def readability_scores_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readability profile per source: words/sentence, chars/word, and
    a Flesch-Kincaid-style grade (vowel-group runs as the syllable
    proxy) — the quality dimension length/stopword filters miss: a feed
    of run-on machine text scores high words-per-sentence long before
    its token distribution drifts.

    Scale: all four per-doc counts are single-pass JVM regex/
    higher-order expressions (no Python, no shuffle of text); the
    corpus reduces to |sources| rows of exact integer sums, and the
    three ratios are final mirrored double expressions (float literals
    written 0.39e0-style so the oracle's arithmetic path is double,
    not DECIMAL).
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    words = F.size(
        F.filter(F.split("text", r"\s+"), lambda w: w != F.lit(""))
    ).cast("bigint")
    sents = F.size(
        F.filter(F.split("text", r"[.!?]+"), lambda x: x.rlike(r"\S"))
    ).cast("bigint")
    syls = F.size(
        F.regexp_extract_all(F.lower("text"), F.lit("[aeiouy]+"), 0)
    ).cast("bigint")
    f = d.select(
        "source",
        words.alias("words"),
        sents.alias("sents"),
        syls.alias("syls"),
        F.length("text").cast("bigint").alias("chars"),
    ).filter((F.col("words") >= 1) & (F.col("sents") >= 1))
    sw = F.sum("words").cast("double")
    ss = F.sum("sents").cast("double")
    sy = F.sum("syls").cast("double")
    sc = F.sum("chars").cast("double")
    return (
        f.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("words").cast("bigint").alias("words"),
            F.sum("sents").cast("bigint").alias("sentences"),
            F.round(sw / ss * 1_000_000, 0)
            .cast("bigint")
            .alias("words_per_sentence_micro"),
            F.round(sc / sw * 1_000_000, 0)
            .cast("bigint")
            .alias("chars_per_word_micro"),
            F.round(
                (0.39 * (sw / ss) + 11.8 * (sy / sw) - 15.59) * 1000, 0
            )
            .cast("bigint")
            .alias("fk_grade_milli"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Pairwise correlation of cheap document features
# ---------------------------------------------------------------------------

_DFC_PAIRS = (("chars", "words"), ("chars", "uniq"), ("words", "stops"))


def _dfc_oracle() -> str:
    stats = """
    WITH t AS (
      SELECT CAST(length(text) AS BIGINT) AS chars,
             CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
               w -> w <> '')) AS BIGINT) AS words,
             CAST(len(list_distinct(list_filter(
               string_split_regex(lower(text), '\\s+'), w -> w <> '')))
               AS BIGINT) AS uniq,
             CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
               w -> w IN ('the', 'a', 'an', 'of', 'to', 'and', 'in', 'is')))
               AS BIGINT) AS stops
      FROM documents WHERE text IS NOT NULL),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             {sums}
      FROM t)"""
    cols = ("chars", "words", "uniq", "stops")
    sums = []
    for c in cols:
        sums.append(f"CAST(SUM({c}) AS DOUBLE) AS s_{c}")
        sums.append(
            f"CAST(SUM(CAST({c} AS HUGEINT) * {c}) AS DOUBLE) AS q_{c}"
        )
    for x, y in _DFC_PAIRS:
        sums.append(
            f"CAST(SUM(CAST({x} AS HUGEINT) * {y}) AS DOUBLE) AS x_{x}_{y}"
        )
    body = stats.format(sums=",\n             ".join(sums))
    selects = []
    for x, y in _DFC_PAIRS:
        r = (
            f"(n * x_{x}_{y} - s_{x} * s_{y})"
            f" / sqrt((n * q_{x} - s_{x} * s_{x})"
            f" * (n * q_{y} - s_{y} * s_{y}))"
        )
        selects.append(
            f"SELECT '{x}' AS feature_x, '{y}' AS feature_y, n AS n_docs,"
            f" CAST(round({r} * 1000000000, 0) AS BIGINT) AS r_nano FROM s"
        )
    return body + "\n" + "\nUNION ALL\n".join(selects) + "\nORDER BY feature_x, feature_y"


@register("doc_feature_correlation", oracle=_dfc_oracle())
def doc_feature_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between cheap per-document features
    (chars↔words, chars↔distinct-tokens, words↔stopwords) — the feature-
    redundancy audit run before building a quality classifier: a 0.99
    chars↔words correlation says one of them is dead weight; a LOW
    words↔stopwords correlation flags non-prose contamination, and the
    chars↔uniq leg tracks how fast vocabulary saturates with length.

    Scale: the correlation_matrix discipline on the documents table —
    one narrow codegen projection per doc, ONE fused aggregate carrying
    all sufficient statistics (Σx, Σx², Σxy on the wide-integer rule),
    and the r values are final mirrored double expressions on the
    1-row stats frame, fanned out map-side to one row per pair.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    ts = F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
    t = d.select(
        F.length("text").cast("bigint").alias("chars"),
        F.size(ts).cast("bigint").alias("words"),
        F.size(F.array_distinct(ts)).cast("bigint").alias("uniq"),
        F.size(
            F.filter(ts, lambda w: w.isin(*STOPWORDS))
        )
        .cast("bigint")
        .alias("stops"),
    )
    cols = ("chars", "words", "uniq", "stops")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    for c in cols:
        cd = F.col(c).cast("decimal(38,0)")
        aggs.append(F.sum(c).cast("double").alias(f"s_{c}"))
        aggs.append(F.sum(cd * cd).cast("double").alias(f"q_{c}"))
    for x, y in _DFC_PAIRS:
        aggs.append(
            F.sum(F.col(x).cast("decimal(38,0)") * F.col(y))
            .cast("double")
            .alias(f"x_{x}_{y}")
        )
    s = t.agg(*aggs)
    rows = []
    for x, y in _DFC_PAIRS:
        r = (
            f"(n * x_{x}_{y} - s_{x} * s_{y})"
            f" / sqrt((n * q_{x} - s_{x} * s_{x})"
            f" * (n * q_{y} - s_{y} * s_{y}))"
        )
        rows.append(
            f"struct('{x}' AS feature_x, '{y}' AS feature_y,"
            f" n AS n_docs,"
            f" CAST(round({r} * 1000000000, 0) AS BIGINT) AS r_nano)"
        )
    return (
        s.select(F.explode(F.expr("array(" + ", ".join(rows) + ")")).alias("p"))
        .select("p.feature_x", "p.feature_y", "p.n_docs", "p.r_nano")
        .orderBy("feature_x", "feature_y")
    )


# ---------------------------------------------------------------------------
# Term burstiness (Church-Gale) for the top vocabulary
# ---------------------------------------------------------------------------

_BURST_TOPK = 50


@register(
    "term_burstiness_topk",
    oracle=rf"""
    WITH docs AS (
      SELECT doc_id,
             list_distinct(list_filter(string_split_regex(lower(text),
               '\s+'), w -> w <> '')) AS uniq,
             list_filter(string_split_regex(lower(text), '\s+'),
               w -> w <> '') AS ts
      FROM documents WHERE text IS NOT NULL),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS d FROM docs),
    cf AS (
      SELECT term, COUNT(*) AS c
      FROM (SELECT unnest(ts) AS term FROM docs) GROUP BY 1),
    df AS (
      SELECT term, COUNT(*) AS df
      FROM (SELECT unnest(uniq) AS term FROM docs) GROUP BY 1),
    j AS (
      SELECT cf.term, CAST(cf.c AS BIGINT) AS cf, CAST(df.df AS BIGINT)
               AS df, nd.d
      FROM cf JOIN df ON cf.term = df.term CROSS JOIN nd)
    SELECT term, cf, df,
           CAST(cf * 1000000 // df AS BIGINT) AS burst_micro,
           CAST(round(d * (1 - exp(-(CAST(cf AS DOUBLE) / d))), 0)
             AS BIGINT) AS poisson_df
    FROM j
    ORDER BY cf DESC, term LIMIT {_BURST_TOPK}
    """,
)
def term_burstiness_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Church-Gale burstiness for the top-50 (_BURST_TOPK) terms: mean
    occurrences per CONTAINING document (cf/df) next to the document
    frequency a Poisson scatter of the same mass would predict — bursty
    terms (cf/df ≫ 1, df ≪ poisson_df) are topical/templated content;
    terms matching Poisson are function words. The corpus-linguistics
    signal behind stopword discovery and boilerplate candidates.

    Scale: one pass builds both the collection-frequency and the
    document-frequency tables (the distinct leg explodes the per-doc
    UNIQUE token array — map-side dedup, so the df shuffle carries each
    (doc, term) once); they join vocabulary-to-vocabulary, the 1-row
    doc count broadcasts, burstiness is exact integer micro, and the
    Poisson leg is one mirrored double expression. Top-k is a heap.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    ts = F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
    docs = d.select(ts.alias("ts"), F.array_distinct(ts).alias("uniq")).localCheckpoint()
    nd = docs.agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    cf = (
        docs.select(F.explode("ts").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cf"))
    )
    df = (
        docs.select(F.explode("uniq").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    )
    return (
        cf.join(df, "term")
        .crossJoin(F.broadcast(nd))
        .select(
            "term",
            "cf",
            "df",
            F.expr("CAST(cf * 1000000 DIV df AS BIGINT)").alias("burst_micro"),
            F.round(
                F.col("d")
                * (1 - F.exp(-(F.col("cf").cast("double") / F.col("d")))),
                0,
            )
            .cast("bigint")
            .alias("poisson_df"),
        )
        .orderBy(F.desc("cf"), "term")
        .limit(_BURST_TOPK)
    )


# ---------------------------------------------------------------------------
# Hapax legomenon rate per source (vocabulary freshness)
# ---------------------------------------------------------------------------

@register(
    "hapax_rate_by_source",
    oracle=r"""
    WITH toks AS (
      SELECT source,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
               w -> w <> '')) AS term
      FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
    tc AS (
      SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks GROUP BY 1, 2)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000
             // COUNT(*) AS BIGINT) AS hapax_ppm
    FROM tc GROUP BY source ORDER BY source
    """,
)
def hapax_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax-legomenon rate per source: what fraction of each source's
    vocabulary occurs exactly ONCE there — the classic vocabulary-
    freshness signal (high hapax = productive/diverse text, near-zero
    hapax = templated or looped generation) read next to
    lexical_diversity_by_source's type-token ratio.

    Scale: one tokenize pass reduces to (source, term) counts with
    map-side combine — the only shuffle keys on the source x vocabulary
    grid, never on tokens; the hapax flag and the per-source rollup are
    arithmetic on that reduction. Exact integer ppm throughout.
    """
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("source").isNotNull()
    )
    toks = d.select(
        "source",
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
        ).alias("term"),
    )
    tc = toks.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    hap = F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("bigint")
    return (
        tc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("vocab"),
            hap.alias("hapax"),
            F.sum("c").cast("bigint").alias("n_tokens"),
        )
        .select(
            "source",
            "vocab",
            "hapax",
            "n_tokens",
            F.expr("CAST(hapax * 1000000 DIV vocab AS BIGINT)").alias(
                "hapax_ppm"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Positional vocabulary-novelty curve (within-document)
# ---------------------------------------------------------------------------

@register(
    "positional_novelty_curve",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
               w -> w <> '') AS ts
      FROM documents WHERE text IS NOT NULL),
    pt AS (
      SELECT doc_id, unnest(ts) AS term,
             generate_subscripts(ts, 1) AS pos, len(ts) AS n
      FROM toks),
    f AS (
      SELECT pos, n,
             CASE WHEN pos = MIN(pos) OVER (PARTITION BY doc_id, term)
               THEN 1 ELSE 0 END AS is_new
      FROM pt)
    SELECT CAST((pos - 1) * 10 // n AS BIGINT) AS pos_decile,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(is_new) AS BIGINT) AS n_new,
           CAST(SUM(is_new) * 1000000 // COUNT(*) AS BIGINT) AS novelty_ppm
    FROM f GROUP BY 1 ORDER BY 1
    """,
)
def positional_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE in a document new vocabulary appears: the fraction of
    tokens at each relative-position decile that are the document's
    FIRST occurrence of that word. Healthy prose decays smoothly from
    ~1.0; a curve that re-spikes mid-document marks templated sections,
    and one that crashes early marks looping degeneration — structure
    the document-level type-token ratio (lexical_diversity_by_source)
    averages away.

    Scale: tokens fan map-side with their positions; the only wide
    shuffle keys on (doc, term) for the first-occurrence window (small
    groups at any corpus size), then everything collapses to ten decile
    rows with map-side combine. Exact integer ppm.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    ts = F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
    pt = d.select(
        "doc_id", ts.alias("ts")
    ).select(
        "doc_id",
        F.posexplode("ts").alias("pos0", "term"),
        F.size("ts").alias("n"),
    ).select(
        "doc_id", "term", (F.col("pos0") + 1).alias("pos"), "n"
    )
    w = Window.partitionBy("doc_id", "term")
    f = pt.select(
        "pos",
        "n",
        F.when(F.col("pos") == F.min("pos").over(w), 1).otherwise(0).alias(
            "is_new"
        ),
    )
    return (
        f.groupBy(
            F.expr("CAST((pos - 1) * 10 DIV n AS BIGINT)").alias("pos_decile")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("is_new").cast("bigint").alias("n_new"),
        )
        .select(
            "pos_decile",
            "n_tokens",
            "n_new",
            F.expr("CAST(n_new * 1000000 DIV n_tokens AS BIGINT)").alias(
                "novelty_ppm"
            ),
        )
        .orderBy("pos_decile")
    )


# ---------------------------------------------------------------------------
# Document-level co-occurrence lift (non-adjacent association)
# ---------------------------------------------------------------------------

_COOC_MIN_SUPPORT = 5
_COOC_TOPK = 20


@register(
    "doc_cooccurrence_lift_topk",
    oracle=rf"""
    WITH dt AS (
      SELECT DISTINCT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
               w -> w <> '')) AS term
      FROM documents WHERE text IS NOT NULL),
    nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM dt),
    df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM dt GROUP BY 1),
    pairs AS (
      SELECT a.term AS term_a, b.term AS term_b,
             CAST(COUNT(*) AS BIGINT) AS c_ab
      FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.term < b.term
      GROUP BY 1, 2),
    l AS (
      SELECT p.term_a, p.term_b, p.c_ab, da.df AS df_a, db.df AS df_b,
             CAST(round(CAST(p.c_ab AS DOUBLE) * nd.n
               / (CAST(da.df AS DOUBLE) * db.df) * 1000, 0) AS BIGINT)
               AS lift_milli
      FROM pairs p JOIN df da ON p.term_a = da.term
      JOIN df db ON p.term_b = db.term CROSS JOIN nd
      WHERE p.c_ab >= {_COOC_MIN_SUPPORT})
    SELECT term_a, term_b, c_ab, df_a, df_b, lift_milli
    FROM l ORDER BY lift_milli DESC, term_a, term_b LIMIT {_COOC_TOPK}
    """,
)
def doc_cooccurrence_lift_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-LEVEL term association: which word pairs share documents
    far beyond independence (lift = P(a,b)/(P(a)P(b)))? The topical-
    affinity complement to collocation_pmi's ADJACENT bigrams — these
    pairs can sit paragraphs apart and still bind (the basket-analysis
    lift, applied to vocabulary).

    Scale: docs dedup to (doc, term) grain map-side; the pair join is
    key-on-key on doc_id with per-doc fanout bounded by unique-terms-
    per-doc, and reduces straight to the <=|vocab|^2 pair table; the
    lift joins are vocabulary-to-vocabulary with the 1-row doc count
    broadcast. Support-filtered, heap top-k.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    dt = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
            )
        ).alias("term"),
    )
    nd = dt.agg(F.countDistinct("doc_id").cast("bigint").alias("n"))
    df = dt.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    a, b = dt.alias("a"), dt.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.term") < F.col("b.term")),
        )
        .groupBy(
            F.col("a.term").alias("term_a"), F.col("b.term").alias("term_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_ab"))
        .filter(F.col("c_ab") >= _COOC_MIN_SUPPORT)
    )
    da = df.select(F.col("term").alias("term_a"), F.col("df").alias("df_a"))
    db = df.select(F.col("term").alias("term_b"), F.col("df").alias("df_b"))
    l = (
        pairs.join(da, "term_a")
        .join(db, "term_b")
        .crossJoin(F.broadcast(nd))
        .select(
            "term_a",
            "term_b",
            "c_ab",
            "df_a",
            "df_b",
            F.round(
                F.col("c_ab").cast("double")
                * F.col("n")
                / (F.col("df_a").cast("double") * F.col("df_b"))
                * 1000,
                0,
            )
            .cast("bigint")
            .alias("lift_milli"),
        )
    )
    return l.orderBy(F.desc("lift_milli"), "term_a", "term_b").limit(_COOC_TOPK)


# ---------------------------------------------------------------------------
# Burrows' delta stylometry (source-vs-corpus stylistic distance)
# ---------------------------------------------------------------------------

_BURROWS_TOP_TERMS = 50


@register(
    "stylometry_burrows_delta",
    oracle=rf"""
    WITH toks AS (
      SELECT source,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
               w -> w <> '')) AS term
      FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
    st AS (
      SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks GROUP BY 1, 2),
    stot AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS tot FROM st GROUP BY 1),
    top AS (
      SELECT term FROM (
        SELECT term, SUM(c) AS cf FROM st GROUP BY term
        ORDER BY cf DESC, term LIMIT {_BURROWS_TOP_TERMS})),
    grid AS (
      SELECT s.source, t.term FROM (SELECT DISTINCT source FROM st) s
      CROSS JOIN top t),
    f AS (
      SELECT g.source, g.term,
             CAST(COALESCE(st.c, 0) * 1000000000 // stot.tot AS BIGINT)
               AS fr
      FROM grid g
      LEFT JOIN st ON g.source = st.source AND g.term = st.term
      JOIN stot ON g.source = stot.source),
    mu AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(fr) AS BIGINT) AS s1,
             SUM(CAST(fr AS HUGEINT) * fr) AS s2
      FROM f GROUP BY term),
    z AS (
      SELECT f.source,
             CAST(round(abs(CAST(f.fr AS DOUBLE)
               - CAST(mu.s1 AS DOUBLE) / mu.k)
               / sqrt(CAST(mu.s2 AS DOUBLE) / mu.k
                 - (CAST(mu.s1 AS DOUBLE) / mu.k)
                 * (CAST(mu.s1 AS DOUBLE) / mu.k)) * 1000, 0) AS BIGINT)
               AS az_milli
      FROM f JOIN mu ON f.term = mu.term
      WHERE CAST(mu.s2 AS DOUBLE) * mu.k > CAST(mu.s1 AS DOUBLE) * mu.s1)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_terms,
           CAST(SUM(az_milli) // COUNT(*) AS BIGINT)
             AS burrows_delta_milli
    FROM z GROUP BY source ORDER BY burrows_delta_milli DESC, source
    """,
)
def stylometry_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' delta per source — the stylometry standard: z-score
    each source's relative frequency of the top-{_BURROWS_TOP_TERMS}
    corpus terms against the cross-source distribution, and average the
    |z|. High delta = a source whose FUNCTION-WORD profile deviates
    from the corpus (different register, different generator, different
    author) even when topic mixes look identical — the provenance
    check langid and length profiles miss.

    Scale: one tokenize pass to (source, term) counts; the top-term
    selection, the grid completion (zero cells are evidence, not
    absence), the per-term moments, and the z-scores all run on
    bounded source x term tables. Relative frequencies are exact ppb
    integers; |z| quantizes to milli per cell before the per-source
    mean; zero-variance terms drop by an exact comparison mirrored in
    both engines.
    """
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("source").isNotNull()
    )
    toks = d.select(
        "source",
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
        ).alias("term"),
    )
    st = toks.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    st = st.localCheckpoint()
    stot = st.groupBy("source").agg(F.sum("c").cast("bigint").alias("tot"))
    top = (
        st.groupBy("term")
        .agg(F.sum("c").alias("cf"))
        .orderBy(F.desc("cf"), "term")
        .limit(_BURROWS_TOP_TERMS)
        .select("term")
    )
    grid = st.select("source").distinct().crossJoin(F.broadcast(top))
    f = (
        grid.join(st, ["source", "term"], "left")
        .join(stot, "source")
        .select(
            "source",
            "term",
            F.expr(
                "CAST(COALESCE(c, 0) * 1000000000 DIV tot AS BIGINT)"
            ).alias("fr"),
        )
    )
    frd = F.col("fr").cast("decimal(38,0)")
    mu = f.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("fr").cast("bigint").alias("s1"),
        F.sum(frd * frd).alias("s2"),
    )
    muk = F.col("s1").cast("double") / F.col("k")
    sd = F.sqrt(F.col("s2").cast("double") / F.col("k") - muk * muk)
    z = (
        f.join(mu, "term")
        .filter(
            F.col("s2").cast("double") * F.col("k")
            > F.col("s1").cast("double") * F.col("s1")
        )
        .select(
            "source",
            F.round(F.abs(F.col("fr").cast("double") - muk) / sd * 1000, 0)
            .cast("bigint")
            .alias("az_milli"),
        )
    )
    return (
        z.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            F.sum("az_milli").alias("saz"),
        )
        .select(
            "source",
            "n_terms",
            F.expr("CAST(saz DIV n_terms AS BIGINT)").alias(
                "burrows_delta_milli"
            ),
        )
        .orderBy(F.desc("burrows_delta_milli"), "source")
    )


# ---------------------------------------------------------------------------
# Yule's K vocabulary-richness characteristic per source
# ---------------------------------------------------------------------------

@register(
    "yule_k_by_source",
    oracle=r"""
    WITH tc AS (
      SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT source,
              unnest(list_filter(string_split_regex(lower(text), '\s+'),
                w -> w <> '')) AS term
            FROM documents WHERE text IS NOT NULL AND source IS NOT NULL)
      GROUP BY 1, 2)
    SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS vocab,
           CAST((10000 * (SUM(CAST(c AS HUGEINT) * c) - SUM(c)) * 1000000)
             // (CAST(SUM(c) AS HUGEINT) * SUM(c)) AS BIGINT)
             AS yule_k_micro
    FROM tc GROUP BY source ORDER BY source
    """,
)
def yule_k_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's K characteristic per source — the classic repetitiveness
    constant K = 10^4 (Σc² − N)/N², INDEPENDENT of text length (unlike
    type-token ratios, which collapse as N grows): a source whose K
    jumps is recycling vocabulary regardless of how much it writes.
    The length-invariant leg of the richness triad next to
    hapax_rate_by_source and lexical_diversity_by_source.

    Scale: one tokenize pass to (source, term) counts; K is EXACT
    integer micro via wide-integer arithmetic (Σc² and N² through
    HUGEINT/decimal(38), one integral division whose quotient is
    bounded ~10^10) — no float anywhere in the statistic.
    """
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("source").isNotNull()
    )
    tc = (
        d.select(
            "source",
            F.explode(
                F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
            ).alias("term"),
        )
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    cd = F.col("c").cast("decimal(38,0)")
    return (
        tc.groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("vocab"),
            F.sum(cd * cd).alias("s2"),
        )
        .select(
            "source",
            "n_tokens",
            "vocab",
            F.expr(
                "CAST((10000 * (s2 - n_tokens) * 1000000)"
                " DIV (CAST(n_tokens AS DECIMAL(38,0)) * n_tokens)"
                " AS BIGINT)"
            ).alias("yule_k_micro"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Simpson diversity / effective vocabulary per language
# ---------------------------------------------------------------------------

@register(
    "simpson_diversity_by_lang",
    oracle=r"""
    WITH tc AS (
      SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT lang,
              unnest(list_filter(string_split_regex(lower(text), '\s+'),
                w -> w <> '')) AS term
            FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL)
      GROUP BY 1, 2)
    SELECT lang, CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS vocab,
           CAST((SUM(CAST(c AS HUGEINT) * (c - 1)) * 1000000000)
             // (CAST(SUM(c) AS HUGEINT) * (SUM(c) - 1)) AS BIGINT)
             AS simpson_repeat_nano,
           CAST((CAST(SUM(c) AS HUGEINT) * (SUM(c) - 1) * 1000)
             // SUM(CAST(c AS HUGEINT) * (c - 1)) AS BIGINT)
             AS effective_vocab_milli
    FROM tc GROUP BY lang ORDER BY lang
    """,
)
def simpson_diversity_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's unbiased repeat probability per language — the chance
    two tokens drawn WITHOUT replacement are the same word,
    Σc(c−1)/(N(N−1)) — and its inverse, the EFFECTIVE vocabulary (the
    number of equally-common words that would produce the same
    concentration). The ecology-standard diversity pair: effective
    vocab far below raw vocab means the tail types are decoration and
    the language's real lexicon in this corpus is tiny.

    Scale: one tokenize pass to (lang, term) counts; both statistics
    are EXACT wide-integer arithmetic (Σc(c−1) and N(N−1) through
    HUGEINT/decimal(38), integral divisions with bounded quotients) —
    like yule_k_by_source, no float in the statistic.
    """
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("lang").isNotNull()
    )
    tc = (
        d.select(
            "lang",
            F.explode(
                F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
            ).alias("term"),
        )
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    cd = F.col("c").cast("decimal(38,0)")
    return (
        tc.groupBy("lang")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("vocab"),
            F.sum(cd * (cd - 1)).alias("s2"),
        )
        .select(
            "lang",
            "n_tokens",
            "vocab",
            F.expr(
                "CAST((s2 * 1000000000) DIV (CAST(n_tokens AS DECIMAL(38,0))"
                " * (n_tokens - 1)) AS BIGINT)"
            ).alias("simpson_repeat_nano"),
            F.expr(
                "CAST((CAST(n_tokens AS DECIMAL(38,0)) * (n_tokens - 1)"
                " * 1000) DIV s2 AS BIGINT)"
            ).alias("effective_vocab_milli"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Token-length spectrum (corpus-wide)
# ---------------------------------------------------------------------------

@register(
    "token_length_histogram",
    oracle=r"""
    WITH tok AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
        w -> w <> '')) AS term
      FROM documents WHERE text IS NOT NULL),
    tc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1),
    g AS (
      SELECT CAST(length(term) AS BIGINT) AS token_len,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_types
      FROM tc GROUP BY 1),
    t AS (SELECT g.*, CAST(SUM(n_tokens) OVER () AS BIGINT) AS tot FROM g)
    SELECT token_len, n_tokens, n_types,
           CAST(n_tokens * 1000000 // tot AS BIGINT) AS token_share_ppm
    FROM t ORDER BY token_len
    """,
)
def token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The token-length spectrum with TYPE and TOKEN counts separated:
    how much of the stream is short function-ish words vs long content
    words — the length mix drives subword-tokenizer economics
    (tokenizer_fertility measures the outcome; this is the raw-material
    profile that predicts it), and a mass spike at extreme lengths is
    concatenation corruption.

    Scale: tokenize once to vocabulary grain (the only wide shuffle
    keys on terms), then the spectrum reduces to <=|max-length| rows;
    shares are exact integer ppm over the bounded table.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tc = (
        d.select(
            F.explode(
                F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    g = tc.groupBy(F.length("term").cast("bigint").alias("token_len")).agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
    )
    t = g.withColumn(
        "tot",
        F.sum("n_tokens")
        .over(Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .cast("bigint"),
    )
    return t.select(
        "token_len",
        "n_tokens",
        "n_types",
        F.expr("CAST(n_tokens * 1000000 DIV tot AS BIGINT)").alias(
            "token_share_ppm"
        ),
    ).orderBy("token_len")


# ---------------------------------------------------------------------------
# Weighted Jaccard between source term distributions
# ---------------------------------------------------------------------------

_WJACC_TOPK = 15


@register(
    "weighted_jaccard_source_pairs",
    oracle=rf"""
    WITH tc AS (
      SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT source,
              unnest(list_filter(string_split_regex(lower(text), '\s+'),
                w -> w <> '')) AS term
            FROM documents WHERE text IS NOT NULL AND source IS NOT NULL)
      GROUP BY 1, 2),
    stot AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS tot FROM tc GROUP BY 1),
    f AS (
      SELECT tc.source, tc.term,
             CAST(tc.c * 1000000000 // stot.tot AS BIGINT) AS fr
      FROM tc JOIN stot ON tc.source = stot.source),
    pr AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(SUM(LEAST(a.fr, b.fr)) AS BIGINT) AS s_min,
             CAST(SUM(GREATEST(a.fr, b.fr)) AS BIGINT) AS s_max
      FROM f a JOIN f b ON a.term = b.term AND a.source < b.source
      GROUP BY 1, 2)
    SELECT source_a, source_b,
           CAST(s_min * 1000000 // s_max AS BIGINT)
             AS weighted_jaccard_ppm
    FROM pr ORDER BY weighted_jaccard_ppm DESC, source_a, source_b
    LIMIT {_WJACC_TOPK}
    """,
)
def weighted_jaccard_source_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FREQUENCY-weighted Jaccard between source vocabularies:
    Σmin(f_a, f_b)/Σmax(f_a, f_b) over normalized term frequencies —
    two sources sharing the same word SET but at different RATES score
    low here and high on source_token_jaccard; the pair of numbers
    separates shared vocabulary from shared usage (near-identical
    usage = mirrored/proxied feeds).

    Scale: one tokenize pass to (source, term) counts, relative
    frequencies in exact ppb; the pair join runs term-to-term on the
    bounded source x vocabulary grid and reduces to <=|sources|² pairs.
    Exact integer throughout (min/max of integers, floor ppm).
    """
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("source").isNotNull()
    )
    tc = (
        d.select(
            "source",
            F.explode(
                F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
            ).alias("term"),
        )
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    stot = tc.groupBy("source").agg(F.sum("c").cast("bigint").alias("tot"))
    f = tc.join(stot, "source").select(
        "source",
        "term",
        F.expr("CAST(c * 1000000000 DIV tot AS BIGINT)").alias("fr"),
    )
    a = f.select(
        F.col("source").alias("source_a"), "term", F.col("fr").alias("fa")
    )
    b = f.select(
        F.col("source").alias("source_b"), "term", F.col("fr").alias("fb")
    )
    pr = (
        a.join(
            b,
            (a.term == b.term) & (F.col("source_a") < F.col("source_b")),
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.sum(F.least("fa", "fb")).cast("bigint").alias("s_min"),
            F.sum(F.greatest("fa", "fb")).cast("bigint").alias("s_max"),
        )
    )
    return (
        pr.select(
            "source_a",
            "source_b",
            F.expr("CAST(s_min * 1000000 DIV s_max AS BIGINT)").alias(
                "weighted_jaccard_ppm"
            ),
        )
        .orderBy(F.desc("weighted_jaccard_ppm"), "source_a", "source_b")
        .limit(_WJACC_TOPK)
    )


# ---------------------------------------------------------------------------
# Renyi entropy spectrum of the term distribution
# ---------------------------------------------------------------------------

@register(
    "renyi_entropy_spectrum",
    oracle=r"""
    WITH tc AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT unnest(list_filter(string_split_regex(lower(text),
        '\s+'), w -> w <> '')) AS term
        FROM documents WHERE text IS NOT NULL)
      GROUP BY 1),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS vocab,
             CAST(SUM(c) AS BIGINT) AS n,
             SUM(CAST(c AS HUGEINT) * c) AS c2,
             CAST(MAX(c) AS BIGINT) AS cmax,
             CAST(SUM(CAST(round(c * ln(CAST(c AS DOUBLE)) * 1000, 0)
               AS BIGINT)) AS BIGINT) AS clnc_milli
      FROM tc)
    SELECT vocab, n,
           CAST(round(ln(CAST(vocab AS DOUBLE)) * 1000000, 0) AS BIGINT)
             AS h0_hartley_micro,
           CAST(round((ln(CAST(n AS DOUBLE))
             - (CAST(clnc_milli AS DOUBLE) / 1000) / n) * 1000000, 0)
             AS BIGINT) AS h1_shannon_micro,
           CAST(round(-ln(CAST(c2 AS DOUBLE)
             / (CAST(n AS DOUBLE) * n)) * 1000000, 0) AS BIGINT)
             AS h2_collision_micro,
           CAST(round(-ln(CAST(cmax AS DOUBLE) / n) * 1000000, 0)
             AS BIGINT) AS hinf_minentropy_micro
    FROM s
    """,
)
def renyi_entropy_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Rényi spectrum of the corpus term distribution in one
    row: H0 (Hartley, log-vocabulary), H1 (Shannon), H2 (collision —
    the log of Simpson's repeat rate), and H∞ (min-entropy, set by the
    single most common word). The spectrum's SLOPE is the
    concentration story: H0 >> H∞ means a fat head carries the mass —
    with guaranteed ordering H0 >= H1 >= H2 >= H∞ as a built-in
    self-check.

    Scale: one tokenize pass to vocabulary grain; all four entropies
    come from one sufficient-statistics row (Σc·ln c quantized to
    milli-ticks per TERM before the distributed sum; Σc² wide-integer;
    max exact). No per-document work at all.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tc = (
        d.select(
            F.explode(
                F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    cd = F.col("c").cast("decimal(38,0)")
    clnc = F.round(
        F.col("c") * F.log(F.col("c").cast("double")) * 1000, 0
    ).cast("bigint")
    s = tc.agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.sum("c").cast("bigint").alias("n"),
        F.sum(cd * cd).alias("c2"),
        F.max("c").cast("bigint").alias("cmax"),
        F.sum(clnc).cast("bigint").alias("clnc_milli"),
    )
    nd = F.col("n").cast("double")
    return s.select(
        "vocab",
        "n",
        F.round(F.log(F.col("vocab").cast("double")) * 1_000_000, 0)
        .cast("bigint")
        .alias("h0_hartley_micro"),
        F.round(
            (F.log(nd) - (F.col("clnc_milli").cast("double") / 1000) / F.col("n"))
            * 1_000_000,
            0,
        )
        .cast("bigint")
        .alias("h1_shannon_micro"),
        F.round(-F.log(F.col("c2").cast("double") / (nd * F.col("n"))) * 1_000_000, 0)
        .cast("bigint")
        .alias("h2_collision_micro"),
        F.round(-F.log(F.col("cmax").cast("double") / F.col("n")) * 1_000_000, 0)
        .cast("bigint")
        .alias("hinf_minentropy_micro"),
    )


# ---------------------------------------------------------------------------
# Source-mix stability along the ingest axis
# ---------------------------------------------------------------------------

_MIX_DRIFT_TOPK = 10


@register(
    "source_mix_by_ingest_decile",
    oracle=f"""
    WITH mx AS (SELECT MAX(doc_id) AS m FROM documents),
    d AS (
      SELECT CAST(doc_id * 10 // (mx.m + 1) AS BIGINT) AS decile, source
      FROM documents, mx WHERE source IS NOT NULL),
    c AS (
      SELECT decile, source, CAST(COUNT(*) AS BIGINT) AS n
      FROM d GROUP BY 1, 2),
    t AS (
      SELECT c.*, CAST(SUM(n) OVER (PARTITION BY decile) AS BIGINT) AS dt
      FROM c),
    sh AS (
      SELECT source, decile, CAST(n * 1000000 // dt AS BIGINT) AS share_ppm
      FROM t)
    SELECT source,
           CAST(MIN(share_ppm) AS BIGINT) AS min_share_ppm,
           CAST(MAX(share_ppm) AS BIGINT) AS max_share_ppm,
           CAST(MAX(share_ppm) - MIN(share_ppm) AS BIGINT) AS drift_ppm
    FROM sh GROUP BY source ORDER BY drift_ppm DESC, source
    LIMIT {_MIX_DRIFT_TOPK}
    """,
)
def source_mix_by_ingest_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mix stability along the INGEST axis: each source's share
    of the corpus per doc_id decile, ranked by its min-to-max share
    swing — a source with a big drift turned on or off mid-ingest
    (pipeline change, feed outage, backfill), which poisons any
    time-split train/eval before content drift is even on the table
    (vocab_growth_curve tracks vocabulary along this axis; this tracks
    PROVENANCE).

    Scale: one reduction to the decile x source grid (deciles by exact
    integer key arithmetic against the broadcast max); shares are
    exact ppm; the drift rollup and top-k run on the bounded grid.
    """
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isNotNull()
    )
    mx = load_table(spark, sf_dir, "documents").agg(
        F.max("doc_id").alias("m")
    )
    dd = d.crossJoin(F.broadcast(mx)).select(
        F.expr("CAST(doc_id * 10 DIV (m + 1) AS BIGINT)").alias("decile"),
        "source",
    )
    c = dd.groupBy("decile", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    t = c.withColumn(
        "dt", F.sum("n").over(Window.partitionBy("decile")).cast("bigint")
    )
    sh = t.select(
        "source",
        F.expr("CAST(n * 1000000 DIV dt AS BIGINT)").alias("share_ppm"),
    )
    return (
        sh.groupBy("source")
        .agg(
            F.min("share_ppm").cast("bigint").alias("min_share_ppm"),
            F.max("share_ppm").cast("bigint").alias("max_share_ppm"),
        )
        .select(
            "source",
            "min_share_ppm",
            "max_share_ppm",
            (F.col("max_share_ppm") - F.col("min_share_ppm")).alias(
                "drift_ppm"
            ),
        )
        .orderBy(F.desc("drift_ppm"), "source")
        .limit(_MIX_DRIFT_TOPK)
    )


# ---------------------------------------------------------------------------
# Character-trigram Jensen-Shannon divergence between language feeds
# ---------------------------------------------------------------------------

@register(
    "lang_trigram_divergence",
    oracle="""
    WITH tg AS (
      SELECT lang, substring(lower(text), CAST(i AS INT), 3) AS g
      FROM documents,
           UNNEST(range(1, CAST(length(text) - 1 AS BIGINT))) AS u(i)
      WHERE text IS NOT NULL AND length(text) >= 3),
    c AS (SELECT lang, g, CAST(COUNT(*) AS BIGINT) AS c FROM tg GROUP BY 1, 2),
    n AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n FROM c GROUP BY 1),
    grid AS (
      SELECT a.lang AS la, b.lang AS lb, v.g
      FROM n a JOIN n b ON a.lang < b.lang
      CROSS JOIN (SELECT DISTINCT g FROM c) v),
    j AS (
      SELECT grid.la, grid.lb, grid.g,
             COALESCE(ca.c, 0) AS ca, COALESCE(cb.c, 0) AS cb
      FROM grid
      LEFT JOIN c ca ON ca.lang = grid.la AND ca.g = grid.g
      LEFT JOIN c cb ON cb.lang = grid.lb AND cb.g = grid.g
      WHERE COALESCE(ca.c, 0) + COALESCE(cb.c, 0) > 0),
    t AS (
      SELECT la, lb,
             CASE WHEN ca > 0 AND cb > 0 THEN 1 ELSE 0 END AS is_shared,
             CASE WHEN ca > 0 THEN CAST(round(
               0.5 * (CAST(ca AS DOUBLE) / na.n)
                   * ln(2 * (CAST(ca AS DOUBLE) / na.n)
                        / (CAST(ca AS DOUBLE) / na.n
                           + CAST(cb AS DOUBLE) / nb.n)) * 1000000000, 0)
               AS BIGINT) ELSE 0 END
             + CASE WHEN cb > 0 THEN CAST(round(
               0.5 * (CAST(cb AS DOUBLE) / nb.n)
                   * ln(2 * (CAST(cb AS DOUBLE) / nb.n)
                        / (CAST(ca AS DOUBLE) / na.n
                           + CAST(cb AS DOUBLE) / nb.n)) * 1000000000, 0)
               AS BIGINT) ELSE 0 END AS tick
      FROM j JOIN n na ON na.lang = j.la JOIN n nb ON nb.lang = j.lb)
    SELECT la AS lang_1, lb AS lang_2,
           CAST(SUM(is_shared) AS BIGINT) AS n_shared_grams,
           CAST(SUM(tick) AS BIGINT) AS jsd_nanonats
    FROM t GROUP BY la, lb ORDER BY la, lb
    """,
)
def lang_trigram_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between each language feed's
    CHARACTER-TRIGRAM distribution — the language-similarity matrix
    behind langid confidence (languages with low JSD will confuse the
    n-gram classifier; see langid_confusion for the realized errors)
    and behind multilingual sampling design (close languages share
    subword signal, distant ones need their own token budget). JSD is
    symmetric and bounded by ln 2, unlike the KL the per-source length
    screen uses.

    Exactness: trigram counts are exact integers; each gram's
    p·ln(2p/(p+q)) contribution quantizes to nanonat ticks BEFORE the
    distributed sum (the per-term tick rule — ln() agrees across
    engines on identical double inputs, proven by the entropy/PSI/PMI
    family); one-sided grams contribute their exact p·ln2 mass through
    the same CASE, never dropped.

    Scale: the corpus reduces ONCE to the (lang, gram) count table
    (vocabulary-bounded, not corpus-bounded); the pair stage is a
    |langs|²/2 × |gram-vocab| grid over that tiny table — no join ever
    touches documents again. Trigram construction is a narrow
    transform + one posexplode (no per-character explode).
    """
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length("text") >= 3)
    )
    # Trigram counting runs as a mapInArrow histogram pass (r11, guide
    # §4.2 — same device as media_byte_entropy): each partition's
    # lowercased text arrives as one contiguous Arrow buffer; trigram
    # CODES are three shifted uint8 views combined vectorized, windows
    # crossing row boundaries masked via a row-index compare, and only
    # (lang, gram, count) partials leave the task. UTF-8 guard (r12,
    # verdict item 8): byte-trigrams equal char-trigrams only on
    # pure-ASCII rows, so rows containing any byte >= 0x80 fall back
    # per row to exact code-point trigrams; both paths emit the gram
    # STRING (decoded from the vocabulary-bounded unique codes, so the
    # decode cost is |vocab| per batch, not |corpus|), sharing one key
    # space. The former plan bore one JVM row PER CHARACTER (explode +
    # substr), measured 4.5-7 s at sf0.1 for a 1,885-row count table.
    m = d.select("lang", F.lower(F.col("text")).alias("tl"))

    def _tri_hist(batches):
        from collections import Counter

        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        def code_gram(code: int) -> str:
            return bytes(
                (code >> 16 & 0xFF, code >> 8 & 0xFF, code & 0xFF)
            ).decode("ascii")

        for batch in batches:
            lang = batch.column("lang")
            txt = batch.column("tl")
            out_l: list[str] = []
            out_g: list[str] = []
            out_c: list[int] = []
            for val in pc.unique(lang).to_pylist():
                sub = pc.filter(txt, pc.equal(lang, val))
                if isinstance(sub, pa.ChunkedArray):
                    sub = sub.combine_chunks()
                if len(sub) == 0 or sub.buffers()[2] is None:
                    continue
                off_dt = (
                    np.int64
                    if pa.types.is_large_string(sub.type)
                    else np.int32
                )
                offs = np.frombuffer(sub.buffers()[1], dtype=off_dt)[
                    sub.offset : sub.offset + len(sub) + 1
                ]
                data = np.frombuffer(sub.buffers()[2], dtype=np.uint8)[
                    offs[0] : offs[-1]
                ]
                if data.size < 3:
                    continue
                lens = np.diff(offs)
                rowidx = np.repeat(np.arange(len(lens)), lens)
                same_row = rowidx[:-2] == rowidx[2:]
                hi = data >= 0x80
                if hi.any():
                    # exact code-point trigrams for the non-ASCII rows
                    bad_rows = np.unique(rowidx[hi])
                    bad = np.zeros(len(lens), dtype=bool)
                    bad[bad_rows] = True
                    cnt_py: Counter = Counter()
                    for s in sub.take(pa.array(bad_rows)).to_pylist():
                        cnt_py.update(
                            s[i : i + 3] for i in range(len(s) - 2)
                        )
                    out_l.extend([val] * len(cnt_py))
                    out_g.extend(cnt_py.keys())
                    out_c.extend(int(x) for x in cnt_py.values())
                    valid = same_row & ~bad[rowidx[:-2]]
                else:
                    valid = same_row
                codes = (
                    data[:-2].astype(np.int32) * 65536
                    + data[1:-1].astype(np.int32) * 256
                    + data[2:].astype(np.int32)
                )[valid]
                if codes.size == 0:
                    continue
                uniq, cnt = np.unique(codes, return_counts=True)
                out_l.extend([val] * len(uniq))
                out_g.extend(code_gram(int(x)) for x in uniq)
                out_c.extend(int(x) for x in cnt)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_l, pa.string()),
                    pa.array(out_g, pa.string()),
                    pa.array(out_c, pa.int64()),
                ],
                names=["lang", "g", "c"],
            )

    partials = m.mapInArrow(_tri_hist, "lang string, g string, c bigint")
    c = partials.groupBy("lang", "g").agg(
        F.sum("c").cast("bigint").alias("c")
    ).localCheckpoint()  # vocabulary-bounded; read by 4 legs below
    n = c.groupBy("lang").agg(F.sum("c").cast("bigint").alias("n"))
    # The |langs|²/2 pair frame and the distinct-gram vocab both
    # AQE-coalesce to one partition, so the |pairs|×|vocab| grid — and
    # the two count joins over it — ran as a SINGLE task (~6M rows at
    # sf0.1, measured as the dominant stage). Re-spreading the VOCAB
    # side before the cartesian keeps the grid cheap to build (the
    # 6M-row grid itself never shuffles; only ~|vocab| rows move) while
    # giving the grid full parallelism; the vocabulary-bounded count
    # table broadcasts to the probes (r11, guide §2.6/§3.1).
    par = int(spark.conf.get("spark.sql.shuffle.partitions"))
    vocab = c.select("g").distinct().repartition(par)
    pairs = (
        n.select(F.col("lang").alias("la"), F.col("n").alias("na"))
        .join(
            n.select(F.col("lang").alias("lb"), F.col("n").alias("nb")),
            F.col("la") < F.col("lb"),
        )
    )
    grid = pairs.crossJoin(vocab)
    ca = c.select(F.col("lang").alias("la"), "g", F.col("c").alias("ca"))
    cb = c.select(F.col("lang").alias("lb"), "g", F.col("c").alias("cb"))
    j = (
        grid.join(F.broadcast(ca), ["la", "g"], "left")
        .join(F.broadcast(cb), ["lb", "g"], "left")
        .select(
            "la",
            "lb",
            F.coalesce(F.col("ca"), F.lit(0)).alias("ca"),
            F.coalesce(F.col("cb"), F.lit(0)).alias("cb"),
            "na",
            "nb",
        )
        .filter(F.col("ca") + F.col("cb") > 0)
    )
    p = F.col("ca").cast("double") / F.col("na")
    q = F.col("cb").cast("double") / F.col("nb")
    tick = F.when(
        F.col("ca") > 0,
        F.round(F.lit(0.5) * p * F.log(F.lit(2) * p / (p + q)) * 1_000_000_000, 0)
        .cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint")) + F.when(
        F.col("cb") > 0,
        F.round(F.lit(0.5) * q * F.log(F.lit(2) * q / (p + q)) * 1_000_000_000, 0)
        .cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))
    both = F.when((F.col("ca") > 0) & (F.col("cb") > 0), 1).otherwise(0)
    return (
        j.select("la", "lb", both.alias("both"), tick.alias("tick"))
        .groupBy(F.col("la").alias("lang_1"), F.col("lb").alias("lang_2"))
        .agg(
            F.sum("both").cast("bigint").alias("n_shared_grams"),
            F.sum("tick").cast("bigint").alias("jsd_nanonats"),
        )
        .orderBy("lang_1", "lang_2")
    )


# ---------------------------------------------------------------------------
# Monroe log-odds enriched terms per language (informative Dirichlet prior)
# ---------------------------------------------------------------------------

_LO_PRIOR_A0 = 1000  # total prior mass, spread per the corpus distribution
_LO_TOPK = 5


@register(
    "log_odds_terms_by_lang",
    oracle=rf"""
    WITH toks AS (
      SELECT lang,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                w -> w <> '')) AS w
      FROM documents WHERE text IS NOT NULL),
    c AS (SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS y FROM toks GROUP BY 1, 2),
    gl AS (SELECT w, CAST(SUM(y) AS BIGINT) AS g FROM c GROUP BY w),
    nl AS (SELECT lang, CAST(SUM(y) AS BIGINT) AS n FROM c GROUP BY lang),
    tot AS (SELECT CAST(SUM(y) AS BIGINT) AS nn FROM c),
    z AS (
      SELECT c.lang, c.w, c.y,
             CAST(round((
               ln((c.y + {_LO_PRIOR_A0}.0 * gl.g / tot.nn)
                  / (nl.n + {_LO_PRIOR_A0} - c.y
                     - {_LO_PRIOR_A0}.0 * gl.g / tot.nn))
               - ln((gl.g - c.y + {_LO_PRIOR_A0}.0 * gl.g / tot.nn)
                    / (tot.nn - nl.n + {_LO_PRIOR_A0} - (gl.g - c.y)
                       - {_LO_PRIOR_A0}.0 * gl.g / tot.nn)))
               / sqrt(1.0 / (c.y + {_LO_PRIOR_A0}.0 * gl.g / tot.nn)
                      + 1.0 / (gl.g - c.y
                               + {_LO_PRIOR_A0}.0 * gl.g / tot.nn))
               * 1000000, 0) AS BIGINT) AS z_micro
      FROM c JOIN gl USING (w) JOIN nl USING (lang), tot)
    SELECT lang, w AS term, y, z_micro FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                                   ORDER BY z_micro DESC, w) AS rn
      FROM z) t
    WHERE rn <= {_LO_TOPK}
    ORDER BY lang, z_micro DESC, term
    """,
)
def log_odds_terms_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monroe et al. "Fightin' Words" log-odds with an informative
    Dirichlet prior: for each language, the {_LO_TOPK} terms most
    over-represented vs the REST of the corpus, z-scored — the
    statistically sound replacement for raw TF-IDF ranking when
    comparing feeds (the prior, spread per the corpus distribution,
    kills the low-count noise that dominates plain log-odds). The
    per-feed companion of rising_terms (which compares time halves).

    Exactness: all counts exact int64; each (lang, term) z is ONE
    mirrored double expression over them, quantized to microticks
    before the per-lang top-k ordering (deterministic term tiebreak).

    Scale: the corpus tokenizes once into the vocabulary-grain count
    table; every later join is (lang,term)- or term-keyed over that
    reduction; top-k per lang rides a WindowGroupLimit.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    from ai_etl_studio_spark.functions.texthash import tokens

    toks = d.select(
        "lang",
        F.explode(F.filter(tokens("text"), lambda w: w != "")).alias("w"),
    )
    c = toks.groupBy("lang", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("y")
    ).localCheckpoint()  # vocabulary-grain; feeds three marginal legs
    gl = c.groupBy("w").agg(F.sum("y").cast("bigint").alias("g"))
    nl = c.groupBy("lang").agg(F.sum("y").cast("bigint").alias("n"))
    tot = c.agg(F.sum("y").cast("bigint").alias("nn"))
    a0 = _LO_PRIOR_A0
    j = (
        c.join(gl, "w")
        .join(nl, "lang")
        .crossJoin(F.broadcast(tot))
    )
    alpha = F.lit(float(a0)) * F.col("g") / F.col("nn")
    delta = F.log(
        (F.col("y") + alpha)
        / (F.col("n") + a0 - F.col("y") - alpha)
    ) - F.log(
        (F.col("g") - F.col("y") + alpha)
        / (
            F.col("nn")
            - F.col("n")
            + a0
            - (F.col("g") - F.col("y"))
            - alpha
        )
    )
    var = F.lit(1.0) / (F.col("y") + alpha) + F.lit(1.0) / (
        F.col("g") - F.col("y") + alpha
    )
    z = j.select(
        "lang",
        F.col("w").alias("term"),
        "y",
        F.round(delta / F.sqrt(var) * 1_000_000, 0).cast("bigint").alias(
            "z_micro"
        ),
    )
    w_rank = Window.partitionBy("lang").orderBy(F.desc("z_micro"), "term")
    return (
        z.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= _LO_TOPK)
        .select("lang", "term", "y", "z_micro")
        .orderBy("lang", F.desc("z_micro"), "term")
    )


# ---------------------------------------------------------------------------
# Cohen's kappa of the langid heuristic vs the gold labels
# ---------------------------------------------------------------------------

def _kappa_oracle() -> str:
    return f"""
    WITH p AS ({_langid_sql()}),
    cm AS (
      SELECT labeled_lang AS gold, predicted_lang AS pred,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM p GROUP BY 1, 2),
    n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cm),
    agree AS (SELECT CAST(SUM(CASE WHEN gold = pred THEN c ELSE 0 END)
                AS BIGINT) AS a FROM cm),
    marg AS (
      SELECT COALESCE(g.gold, pr.pred) AS lab,
             COALESCE(g.cg, 0) AS cg, COALESCE(pr.cp, 0) AS cp
      FROM (SELECT gold, SUM(c) AS cg FROM cm GROUP BY gold) g
      FULL JOIN (SELECT pred, SUM(c) AS cp FROM cm GROUP BY pred) pr
        ON pr.pred = g.gold),
    e AS (SELECT CAST(SUM(cg * cp) AS BIGINT) AS exp_agree FROM marg)
    SELECT n.n, agree.a AS n_agree,
           CAST(round((CAST(agree.a AS DOUBLE) / n.n
                - CAST(e.exp_agree AS DOUBLE) / (CAST(n.n AS DOUBLE) * n.n))
              / (1 - CAST(e.exp_agree AS DOUBLE)
                 / (CAST(n.n AS DOUBLE) * n.n)) * 1000000, 0) AS BIGINT)
             AS kappa_micro
    FROM n, agree, e
    """


@register("langid_cohens_kappa", oracle=_kappa_oracle())
def langid_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa of the langid heuristic against the gold language
    labels — chance-corrected agreement, the single number
    langid_confusion's matrix summarizes to (raw accuracy flatters a
    classifier whenever the label distribution is skewed; kappa
    subtracts the agreement the marginals produce by chance). Shares
    the REGISTERED langid scoring, so the two views can never diverge.

    Exactness: the confusion matrix, its marginals and the expected
    agreement Σ(row·col) are exact int64; kappa is one single-row
    mirrored double, quantized to microticks.

    Scale: one scoring pass (the shared narrow projection) reduces to
    ≤|langs|² cells; everything else is arithmetic on that.
    """
    p = _langid_predictions(spark, sf_dir)
    cm = p.groupBy(
        F.col("labeled_lang").alias("gold"),
        F.col("predicted_lang").alias("pred"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c")).localCheckpoint()
    n = cm.agg(F.sum("c").cast("bigint").alias("n"))
    agree = cm.agg(
        F.sum(F.when(F.col("gold") == F.col("pred"), F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("a")
    )
    g = cm.groupBy("gold").agg(F.sum("c").alias("cg"))
    pr = cm.groupBy("pred").agg(F.sum("c").alias("cp"))
    marg = (
        g.join(pr, g.gold == pr.pred, "full")
        .select(
            F.coalesce(F.col("cg"), F.lit(0)).alias("cg"),
            F.coalesce(F.col("cp"), F.lit(0)).alias("cp"),
        )
    )
    e = marg.agg(F.sum(F.col("cg") * F.col("cp")).cast("bigint").alias("exp_agree"))
    po = F.col("a").cast("double") / F.col("n")
    pe = F.col("exp_agree").cast("double") / (
        F.col("n").cast("double") * F.col("n")
    )
    return (
        n.crossJoin(F.broadcast(agree))
        .crossJoin(F.broadcast(e))
        .select(
            "n",
            F.col("a").alias("n_agree"),
            F.round((po - pe) / (F.lit(1) - pe) * 1_000_000, 0)
            .cast("bigint")
            .alias("kappa_micro"),
        )
    )


@register(
    "wasserstein_length_by_source",
    oracle="""
    WITH d AS (
      SELECT source,
             CAST(length(text) - length(replace(text, ' ', '')) + 1
               AS BIGINT) AS tl
      FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
    vg AS (
      SELECT source, tl, CAST(COUNT(*) AS BIGINT) AS c
      FROM d GROUP BY 1, 2),
    n AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM vg GROUP BY 1),
    grid AS (
      SELECT a.source AS s1, b.source AS s2, v.tl
      FROM (SELECT DISTINCT source FROM vg) a
      JOIN (SELECT DISTINCT source FROM vg) b ON a.source < b.source
      CROSS JOIN (SELECT DISTINCT tl FROM vg) v),
    cg AS (
      SELECT g.s1, g.s2, g.tl,
             CAST(SUM(COALESCE(v1.c, 0)) OVER (PARTITION BY g.s1, g.s2
               ORDER BY g.tl) AS BIGINT) AS cum1,
             CAST(SUM(COALESCE(v2.c, 0)) OVER (PARTITION BY g.s1, g.s2
               ORDER BY g.tl) AS BIGINT) AS cum2,
             LEAD(g.tl) OVER (PARTITION BY g.s1, g.s2 ORDER BY g.tl)
               AS nxt
      FROM grid g
      LEFT JOIN vg v1 ON v1.source = g.s1 AND v1.tl = g.tl
      LEFT JOIN vg v2 ON v2.source = g.s2 AND v2.tl = g.tl),
    agg AS (
      SELECT cg.s1 AS source_a, cg.s2 AS source_b,
             CAST(SUM(abs(CAST(cum1 AS HUGEINT) * n2.n
                 - CAST(cum2 AS HUGEINT) * n1.n) * (nxt - cg.tl))
               AS HUGEINT) AS num,
             CAST(n1.n AS HUGEINT) * n2.n AS den
      FROM cg JOIN n n1 ON n1.source = cg.s1
              JOIN n n2 ON n2.source = cg.s2
      WHERE nxt IS NOT NULL
      GROUP BY 1, 2, n1.n, n2.n)
    SELECT source_a, source_b,
           CAST(num * 1000000 // den AS BIGINT) AS w1_tokens_ppm
    FROM agg ORDER BY w1_tokens_ppm DESC, source_a, source_b
    """,
)
def wasserstein_length_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wasserstein-1 (earth-mover) distance between the TOKEN-LENGTH
    distributions of every source pair, in token units: on a 1-D
    integer support W₁ = Σ|F₁(v) − F₂(v)|·Δv — the metric that says
    "source A's docs run ~5.7 tokens longer in distribution" where a
    KS/CvM p-value only says "different". The curation use: pick
    mixing weights so the training batch's length profile stays put
    when swapping sources (doc_length_deciles reads one source;
    this reads every PAIR).

    Exactness: the ECDF gap is the integer cross-multiplication
    |cum₁·n₂ − cum₂·n₁| on HUGEINT/decimal128, weighted by the integer
    support gap; the per-pair sum is exact integer and the final ppm
    is floor division — no doubles anywhere.

    Scale: one doc scan → (source, length) value grain (≤ |sources|
    × ~90 rows at ANY SF); the completed pair×support grid (the
    t_closeness lesson: a length absent from one source still carries
    its cumulative mass) is |sources|²/2 × ~90 rows — bounded by the
    SOURCE CATALOG, not the corpus; the op's contract is a bounded
    source count, like every *_source_pairs entry.
    """
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("source").isNotNull()
    )
    vg = (
        d.select(
            "source",
            (
                F.length("text")
                - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
                + 1
            )
            .cast("bigint")
            .alias("tl"),
        )
        .groupBy("source", "tl")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint()  # bounded value grain, read by 4 branches
    )
    n = vg.groupBy("source").agg(F.sum("c").cast("bigint").alias("n"))
    srcs = vg.select("source").distinct()
    pairs = (
        srcs.select(F.col("source").alias("s1"))
        .join(
            F.broadcast(srcs.select(F.col("source").alias("s2"))),
            F.col("s1") < F.col("s2"),
        )
    )
    grid = pairs.join(
        F.broadcast(vg.select("tl").distinct()), F.lit(True)
    )
    v1 = vg.select(
        F.col("source").alias("s1"), F.col("tl"), F.col("c").alias("c1")
    )
    v2 = vg.select(
        F.col("source").alias("s2"), F.col("tl"), F.col("c").alias("c2")
    )
    w = (
        Window.partitionBy("s1", "s2")
        .orderBy("tl")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wl = Window.partitionBy("s1", "s2").orderBy("tl")
    cg = (
        grid.join(F.broadcast(v1), ["s1", "tl"], "left")
        .join(F.broadcast(v2), ["s2", "tl"], "left")
        .select(
            "s1",
            "s2",
            "tl",
            F.sum(F.coalesce("c1", F.lit(0))).over(w).cast("bigint").alias("cum1"),
            F.sum(F.coalesce("c2", F.lit(0))).over(w).cast("bigint").alias("cum2"),
            F.lead("tl").over(wl).alias("nxt"),
        )
    )
    n1 = n.select(F.col("source").alias("s1"), F.col("n").alias("n1"))
    n2 = n.select(F.col("source").alias("s2"), F.col("n").alias("n2"))
    agg = (
        cg.filter(F.col("nxt").isNotNull())
        .join(F.broadcast(n1), "s1")
        .join(F.broadcast(n2), "s2")
        .groupBy(
            F.col("s1").alias("source_a"),
            F.col("s2").alias("source_b"),
            "n1",
            "n2",
        )
        .agg(
            F.sum(
                F.abs(
                    F.col("cum1").cast("decimal(19,0)")
                    * F.col("n2").cast("decimal(19,0)")
                    - F.col("cum2").cast("decimal(19,0)")
                    * F.col("n1").cast("decimal(19,0)")
                )
                * (F.col("nxt") - F.col("tl")).cast("decimal(19,0)")
            )
            .cast("decimal(38,0)")
            .alias("num")
        )
    )
    return (
        agg.select(
            "source_a",
            "source_b",
            F.expr(
                "CAST(num * 1000000 DIV (CAST(n1 AS DECIMAL(19,0))"
                " * CAST(n2 AS DECIMAL(19,0))) AS BIGINT)"
            ).alias("w1_tokens_ppm"),
        )
        .orderBy(F.desc("w1_tokens_ppm"), "source_a", "source_b")
    )


#: JS per-side term: p·ln(2p/(p+q)) nano-quantized — ONE token stream
#: shared by both engines (c1/c2/n1/n2 are exact integers).
_JSD_T1 = (
    "CASE WHEN c1 > 0 THEN CAST(round(CAST(c1 AS DOUBLE)"
    " / CAST(n1 AS DOUBLE)"
    " * ln(2E0 * (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))"
    "      / (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
    "         + CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE)))"
    " * 1000000000E0, 0) AS BIGINT) ELSE 0 END"
)
_JSD_T2 = (
    "CASE WHEN c2 > 0 THEN CAST(round(CAST(c2 AS DOUBLE)"
    " / CAST(n2 AS DOUBLE)"
    " * ln(2E0 * (CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE))"
    "      / (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
    "         + CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE)))"
    " * 1000000000E0, 0) AS BIGINT) ELSE 0 END"
)


@register(
    "js_divergence_source_pairs",
    oracle=rf"""
    WITH w AS (
      SELECT source,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
               x -> x <> '')) AS tok
      FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
    vg AS (
      SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM w GROUP BY 1, 2),
    n AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM vg GROUP BY 1),
    grid AS (
      SELECT a.source AS s1, b.source AS s2, v.tok,
             COALESCE(v1.c, 0) AS c1, COALESCE(v2.c, 0) AS c2,
             na.n AS n1, nb.n AS n2
      FROM n a JOIN n b ON a.source < b.source
      CROSS JOIN (SELECT DISTINCT tok FROM vg) v
      LEFT JOIN vg v1 ON v1.source = a.source AND v1.tok = v.tok
      LEFT JOIN vg v2 ON v2.source = b.source AND v2.tok = v.tok
      JOIN n na ON na.source = a.source
      JOIN n nb ON nb.source = b.source
      WHERE COALESCE(v1.c, 0) + COALESCE(v2.c, 0) > 0)
    SELECT s1 AS source_a, s2 AS source_b,
           CAST(round((CAST(SUM({_JSD_T1}) AS DOUBLE)
               + CAST(SUM({_JSD_T2}) AS DOUBLE)) / 2E0 / 1000E0, 0)
             AS BIGINT) AS jsd_micro_nats
    FROM grid GROUP BY 1, 2
    ORDER BY jsd_micro_nats DESC, source_a, source_b
    """,
)
def js_divergence_source_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between the unigram distributions of
    every source pair — the SYMMETRIC, always-finite companion of
    kl_divergence_by_source (KL needs a smoothing floor the moment one
    source misses a term; JS's mixture midpoint never divides by zero,
    so pairs are comparable with NO Laplace constant to tune). √JSD is
    a metric: these numbers can feed the dedup/mixing clustering
    directly.

    Exactness: both directed terms p·ln(2p/(p+q)) quantize to nano
    per (pair, term) BEFORE the distributed sum (ln is the canonical
    order-divergent reduction); counts and totals are exact integers,
    and the final halving is one mirrored expression.

    Scale: one tokenize pass → (source, term) counts; the completed
    pair×vocab grid is |sources|²/2 × |vocab| — bounded by catalog
    and vocabulary, not corpus size; the zero-zero grid rows are
    dropped (they contribute no mass, unlike t_closeness's prior).
    """
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("source").isNotNull()
    )
    vg = (
        d.select(
            "source",
            F.explode(
                F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
            ).alias("tok"),
        )
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint()  # bounded source×vocab grain, read 4×
    )
    n = vg.groupBy("source").agg(F.sum("c").cast("bigint").alias("n"))
    na = n.select(F.col("source").alias("s1"), F.col("n").alias("n1"))
    nb = n.select(F.col("source").alias("s2"), F.col("n").alias("n2"))
    pairs = na.join(F.broadcast(nb), F.col("s1") < F.col("s2"))
    grid = (
        pairs.join(F.broadcast(vg.select("tok").distinct()), F.lit(True))
        .join(
            F.broadcast(
                vg.select(
                    F.col("source").alias("s1"), "tok", F.col("c").alias("c1")
                )
            ),
            ["s1", "tok"],
            "left",
        )
        .join(
            F.broadcast(
                vg.select(
                    F.col("source").alias("s2"), "tok", F.col("c").alias("c2")
                )
            ),
            ["s2", "tok"],
            "left",
        )
        .select(
            "s1",
            "s2",
            "n1",
            "n2",
            F.coalesce("c1", F.lit(0)).alias("c1"),
            F.coalesce("c2", F.lit(0)).alias("c2"),
        )
        .filter(F.col("c1") + F.col("c2") > 0)
    )
    return (
        grid.groupBy(
            F.col("s1").alias("source_a"), F.col("s2").alias("source_b")
        )
        .agg(
            F.sum(F.expr(_JSD_T1)).cast("bigint").alias("t1"),
            F.sum(F.expr(_JSD_T2)).cast("bigint").alias("t2"),
        )
        .select(
            "source_a",
            "source_b",
            F.expr(
                "CAST(round((CAST(t1 AS DOUBLE) + CAST(t2 AS DOUBLE))"
                " / 2E0 / 1000E0, 0) AS BIGINT)"
            ).alias("jsd_micro_nats"),
        )
        .orderBy(F.desc("jsd_micro_nats"), "source_a", "source_b")
    )


@register(
    "kneser_ney_bigram_topk",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, CAST(i.i - 1 AS INT) AS pos, t[i.i] AS term
      FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
            FROM documents) d,
           LATERAL unnest(generate_series(1, len(t))) AS i(i)
      WHERE t[i.i] <> ''),
    bg AS (
      SELECT term, lead(term) OVER (PARTITION BY doc_id ORDER BY pos)
               AS next_term
      FROM toks),
    bic AS (
      SELECT term, next_term, CAST(COUNT(*) AS BIGINT) AS cb
      FROM bg WHERE next_term IS NOT NULL GROUP BY 1, 2),
    fw AS (
      SELECT term, CAST(SUM(cb) AS BIGINT) AS c1,
             CAST(COUNT(*) AS BIGINT) AS n1p_fw
      FROM bic GROUP BY term),
    bw AS (
      SELECT next_term, CAST(COUNT(*) AS BIGINT) AS n1p_bw
      FROM bic GROUP BY next_term),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n1p_all FROM bic)
    SELECT bic.term, bic.next_term, bic.cb,
           CAST(round(((CAST(bic.cb AS DOUBLE) - 0.75E0) / fw.c1
             + 0.75E0 * fw.n1p_fw / fw.c1
               * (CAST(bw.n1p_bw AS DOUBLE) / tot.n1p_all))
             * 1000000E0, 0) AS BIGINT) AS pkn_micro
    FROM bic JOIN fw USING (term)
    JOIN bw USING (next_term) CROSS JOIN tot
    ORDER BY pkn_micro DESC, bic.term, bic.next_term
    LIMIT 20
    """,
)
def kneser_ney_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney smoothed bigram probabilities (absolute discount
    D = 0.75, the standard value), top-20 by P_KN(next|term): the
    interpolation backs off not to raw unigram frequency but to
    CONTINUATION probability — how many distinct left-contexts a word
    completes — the insight that makes KN the strongest classical
    n-gram smoother ('francisco' is frequent but completes only 'san',
    so it gets almost no backoff mass). The LM-quality companion to
    the MLE surprisal ops: this is the model you'd actually ship.

    Exactness: all four count tables (bigram, forward marginal +
    distinct-continuation, backward distinct-context, total distinct
    bigrams) are exact integers; P_KN is one mirrored double
    expression micro-rounded before the deterministic (pkn, term,
    next) ordering.

    Scale: the token explode is one pass; everything after lives at
    the bigram-type grain (pre-aggregated counts join counts); no
    model table ever re-touches the token stream."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), r"\s+")).alias(
            "pos", "term"
        ),
    ).filter(F.col("term") != "")
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        toks.withColumn("next_term", F.lead("term").over(w))
        .filter(F.col("next_term").isNotNull())
        .select("term", "next_term")
    )
    bic = bg.groupBy("term", "next_term").agg(
        F.count(F.lit(1)).cast("bigint").alias("cb")
    )
    fw = bic.groupBy("term").agg(
        F.sum("cb").cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("n1p_fw"),
    )
    bw = bic.groupBy("next_term").agg(
        F.count(F.lit(1)).cast("bigint").alias("n1p_bw")
    )
    tot = bic.agg(F.count(F.lit(1)).cast("bigint").alias("n1p_all"))
    return (
        bic.join(fw, "term")
        .join(bw, "next_term")
        .crossJoin(F.broadcast(tot))
        .select(
            "term",
            "next_term",
            "cb",
            F.expr(
                "CAST(round(((CAST(cb AS DOUBLE) - 0.75E0) / c1"
                " + 0.75E0 * n1p_fw / c1"
                "   * (CAST(n1p_bw AS DOUBLE) / n1p_all))"
                " * 1000000E0, 0) AS BIGINT)"
            ).alias("pkn_micro"),
        )
        .orderBy(F.desc("pkn_micro"), "term", "next_term")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Round-10: vocabulary-estimation shelf — the corpus questions a 100 TB
# crawl actually poses ("how much of the language have we NOT seen?",
# "how big is the true vocabulary?") answered from the same one-pass
# (source, term) count reduction every other lexical op rides.
# ---------------------------------------------------------------------------

_TOKS_CTE = r"""
    WITH toks AS (
      SELECT source,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
               w -> w <> '')) AS term
      FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
    tc AS (
      SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks GROUP BY 1, 2),
    fr AS (
      SELECT source,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS vocab,
             CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
      FROM tc GROUP BY source)
"""


def _source_freq_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of ``_TOKS_CTE``'s ``fr``: per-source (n_tokens,
    vocab, n1, n2) — the frequency-of-frequencies head that both
    Good-Turing and Chao1 consume. One tokenize pass, reduction keyed
    on source x vocabulary (map-side combine), never on raw tokens."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("source").isNotNull()
    )
    tc = (
        d.select(
            "source",
            F.explode(
                F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
            ).alias("term"),
        )
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    return tc.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n2"),
    )


@register(
    "good_turing_unseen_mass",
    oracle=_TOKS_CTE
    + """
    SELECT source, n_tokens, vocab, n1, n2,
           CAST(n1 * 1000000 // n_tokens AS BIGINT) AS unseen_mass_ppm,
           CASE WHEN n1 > 0
                THEN CAST(2 * n2 * 1000000 // n1 AS BIGINT) END
             AS r1_star_micro
    FROM fr ORDER BY source
    """,
)
def good_turing_unseen_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing unseen-probability mass per source: p₀ = N₁/N — the
    total probability a NEW document from this source contains a token
    never seen in it, estimated from the singleton count alone (Good
    1953). Beside it, the GT-adjusted count for singletons r₁* = 2N₂/N₁
    (how much a count-of-1 should really 'weigh'; NULL when the source
    has no singletons). The pretraining question this answers at 100 TB:
    a source whose unseen mass stays high after ingesting millions of
    documents is still yielding novel text — keep crawling it; one near
    zero is exhausted. Kneser-Ney's discounting (kneser_ney_bigram_topk)
    is the same idea applied per-ngram; this is the corpus-level budget.

    Exactness: pure integer arithmetic — ppm/micro values via integer
    floor division, mirrored in both engines.

    Scale: rides the (source, term) count reduction; output |sources|
    rows."""
    fr = _source_freq_frame(spark, sf_dir)
    return fr.select(
        "source",
        "n_tokens",
        "vocab",
        "n1",
        "n2",
        F.expr("CAST(n1 * 1000000 DIV n_tokens AS BIGINT)").alias(
            "unseen_mass_ppm"
        ),
        F.expr(
            "CASE WHEN n1 > 0 THEN"
            " CAST(2 * n2 * 1000000 DIV n1 AS BIGINT) END"
        ).alias("r1_star_micro"),
    ).orderBy("source")


@register(
    "chao1_vocab_richness",
    oracle=_TOKS_CTE
    + """
    SELECT source, vocab, n1, n2,
           CAST(n1 * (n1 - 1) * 1000000 // (2 * (n2 + 1)) AS BIGINT)
             AS chao1_extra_micro,
           CAST(vocab * 1000000
             + n1 * (n1 - 1) * 1000000 // (2 * (n2 + 1)) AS BIGINT)
             AS chao1_micro,
           CAST(1000000 - n1 * 1000000 // n_tokens AS BIGINT)
             AS coverage_ppm
    FROM fr ORDER BY source
    """,
)
def chao1_vocab_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 richness estimator per source: the TRUE vocabulary size
    the observed sample implies — V̂ = V + N₁(N₁−1)/(2(N₂+1)), the
    bias-corrected form of Chao's lower bound built from singletons and
    doubletons (species-richness estimation applied to types). Beside
    it, Turing's sample coverage Ĉ = 1 − N₁/N. Read with
    vocab_growth_curve (Heaps trajectory): Heaps says how fast vocab
    grows with more data, Chao1 says where it's headed — the gap
    between V and V̂ is the vocabulary a tokenizer trained on this
    source hasn't met yet.

    Exactness: integer micro/ppm via floor division, exact in both
    engines (N₁(N₁−1)·10⁶ stays well under 2⁶³ at any realistic
    per-source vocabulary).

    Scale: same (source, term) reduction, |sources| output rows."""
    fr = _source_freq_frame(spark, sf_dir)
    return fr.select(
        "source",
        "vocab",
        "n1",
        "n2",
        F.expr(
            "CAST(n1 * (n1 - 1) * 1000000 DIV (2 * (n2 + 1)) AS BIGINT)"
        ).alias("chao1_extra_micro"),
        F.expr(
            "CAST(vocab * 1000000 + n1 * (n1 - 1) * 1000000"
            " DIV (2 * (n2 + 1)) AS BIGINT)"
        ).alias("chao1_micro"),
        F.expr(
            "CAST(1000000 - n1 * 1000000 DIV n_tokens AS BIGINT)"
        ).alias("coverage_ppm"),
    ).orderBy("source")


@register(
    "hellinger_lang_divergence_by_source",
    oracle="""
    WITH sl AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents WHERE source IS NOT NULL AND lang IS NOT NULL
      GROUP BY 1, 2),
    ns AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM sl GROUP BY 1),
    g AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS gc FROM sl GROUP BY 1),
    ng AS (SELECT CAST(SUM(gc) AS BIGINT) AS m FROM g),
    terms AS (
      SELECT sl.source,
             CAST(round(sqrt(CAST(sl.c * g.gc AS DOUBLE)) * 1000000, 0)
               AS BIGINT) AS t_micro
      FROM sl JOIN g ON sl.lang = g.lang),
    bc AS (
      SELECT t.source, ns.n,
             CAST(round(CAST(SUM(t.t_micro) AS DOUBLE)
               / sqrt(CAST(ns.n AS DOUBLE) * m.m), 0) AS BIGINT)
               AS bc_micro
      FROM terms t JOIN ns ON t.source = ns.source CROSS JOIN ng m
      GROUP BY t.source, ns.n, m.m)
    SELECT source, n AS n_docs, bc_micro,
           CAST(round(1000000E0 * sqrt(
             CASE WHEN bc_micro >= 1000000 THEN 0E0
                  ELSE 1E0 - bc_micro / 1000000E0 END), 0) AS BIGINT)
             AS hellinger_micro,
           CAST(round(-1000000E0 * ln(bc_micro / 1000000E0), 0) AS BIGINT)
             AS bhattacharyya_micro
    FROM bc ORDER BY source
    """,
)
def hellinger_lang_divergence_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """How far each source's LANGUAGE MIX sits from the corpus-wide
    mix, in three equivalent currencies: the Bhattacharyya coefficient
    BC = Σ√(pᵢqᵢ) (1 = identical mixes), the Hellinger distance
    √(1−BC) (a proper bounded metric — the right thing to threshold in
    a data-mix monitor), and the Bhattacharyya distance −ln BC
    (additive over independent partitions). Complements
    js_divergence_source_pairs (pairwise, KL-family) with a
    source-vs-corpus view in the √-family, which is less dominated by
    rare-language tails than KL.

    Exactness: counts are exact integers; each per-language √(c·g)
    term is quantized to integer micro BEFORE the sum (the tick-
    quantization rule — integer sums are order-independent where a
    float Σ√ would be reduction-order-dependent), then ONE mirrored
    double expression per output column.

    Scale: |sources × langs| grain end-to-end; the global lang mix is
    a tiny broadcast."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("source").isNotNull() & F.col("lang").isNotNull()
    )
    sl = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    ns = sl.groupBy("source").agg(F.sum("c").cast("bigint").alias("n"))
    g = sl.groupBy("lang").agg(F.sum("c").cast("bigint").alias("gc"))
    ng = g.agg(F.sum("gc").cast("bigint").alias("m"))
    terms = sl.join(F.broadcast(g), "lang").select(
        "source",
        F.round(
            F.sqrt((F.col("c") * F.col("gc")).cast("double")) * 1_000_000,
            0,
        )
        .cast("bigint")
        .alias("t_micro"),
    )
    bc = (
        terms.groupBy("source")
        .agg(F.sum("t_micro").cast("bigint").alias("ts"))
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(ng))
        .select(
            "source",
            F.col("n").alias("n_docs"),
            F.round(
                F.col("ts").cast("double")
                / F.sqrt(F.col("n").cast("double") * F.col("m")),
                0,
            )
            .cast("bigint")
            .alias("bc_micro"),
        )
    )
    return bc.select(
        "source",
        "n_docs",
        "bc_micro",
        F.round(
            F.lit(1_000_000.0)
            * F.sqrt(
                F.when(F.col("bc_micro") >= 1_000_000, F.lit(0.0)).otherwise(
                    F.lit(1.0) - F.col("bc_micro") / F.lit(1_000_000.0)
                )
            ),
            0,
        )
        .cast("bigint")
        .alias("hellinger_micro"),
        F.round(
            F.lit(-1_000_000.0)
            * F.log(F.col("bc_micro") / F.lit(1_000_000.0)),
            0,
        )
        .cast("bigint")
        .alias("bhattacharyya_micro"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# Round-10: corpus-linguistics keyness shelf (short vs long documents).
# ---------------------------------------------------------------------------

#: shared oracle CTE: docs split at the exact median n_chars into
#: 'short'/'long' halves, tokenized — the two-corpus frame the keyness
#: family compares.
_SHORTLONG_CTE = r"""
    WITH d0 AS (
      SELECT doc_id, n_chars, lower(text) AS text
      FROM documents WHERE text IS NOT NULL),
    vc AS (SELECT n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
           FROM d0 GROUP BY 1),
    cum AS (SELECT v, CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS cum,
                   CAST(SUM(c) OVER () AS BIGINT) AS n FROM vc),
    med AS (SELECT MIN(CASE WHEN cum * 2 >= n THEN v END) AS t FROM cum),
    d AS (
      SELECT doc_id,
             CASE WHEN n_chars <= (SELECT t FROM med)
               THEN 'short' ELSE 'long' END AS g,
             list_filter(string_split_regex(text, '\s+'), w -> w <> '')
               AS ts
      FROM d0)
"""

_KEYNESS_TOPK = 15


def _shortlong_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of ``_SHORTLONG_CTE``: (doc_id, g, ts) with g the
    exact-median n_chars split — percentile_disc semantics via the
    integer cumulative window, so a tie AT the median lands 'short' in
    both engines."""
    d0 = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    vc = d0.groupBy(F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    med = (
        vc.select(
            "v",
            F.sum("c").over(wv).alias("cum"),
            F.sum("c").over(wall).alias("n"),
        )
        .agg(
            F.min(
                F.when(F.col("cum") * 2 >= F.col("n"), F.col("v"))
            ).alias("t")
        )
    )
    return d0.crossJoin(F.broadcast(med)).select(
        "doc_id",
        F.when(F.col("n_chars") <= F.col("t"), F.lit("short"))
        .otherwise(F.lit("long"))
        .alias("g"),
        F.filter(
            F.split(F.lower("text"), r"\s+"), lambda w: w != ""
        ).alias("ts"),
    )


@register(
    "keyness_g2_short_vs_long",
    oracle=_SHORTLONG_CTE
    + f"""
    , toks AS (SELECT g, unnest(ts) AS w FROM d),
    c AS (
      SELECT w,
             CAST(SUM(CASE WHEN g = 'short' THEN 1 ELSE 0 END) AS BIGINT)
               AS a,
             CAST(SUM(CASE WHEN g = 'long' THEN 1 ELSE 0 END) AS BIGINT)
               AS b
      FROM toks GROUP BY w),
    tot AS (
      SELECT CAST(SUM(a) AS BIGINT) AS na, CAST(SUM(b) AS BIGINT) AS nb
      FROM c),
    z AS (
      SELECT c.w, c.a, c.b,
             CASE WHEN c.a * t.nb > c.b * t.na THEN 1 ELSE -1 END AS sgn,
             CAST(round(2E0 * (
               CASE WHEN c.a > 0 THEN CAST(c.a AS DOUBLE)
                 * ln(CAST(c.a AS DOUBLE) / ((CAST(c.a AS DOUBLE) + c.b)
                     * t.na / (CAST(t.na AS DOUBLE) + t.nb)))
                 ELSE 0E0 END
               + CASE WHEN c.b > 0 THEN CAST(c.b AS DOUBLE)
                 * ln(CAST(c.b AS DOUBLE) / ((CAST(c.a AS DOUBLE) + c.b)
                     * t.nb / (CAST(t.na AS DOUBLE) + t.nb)))
                 ELSE 0E0 END) * 1000000E0, 0) AS BIGINT) AS g2_micro
      FROM c, tot t)
    SELECT w AS term, a AS short_count, b AS long_count, sgn AS direction,
           g2_micro
    FROM z ORDER BY g2_micro DESC, w LIMIT {_KEYNESS_TOPK}
    """,
)
def keyness_g2_short_vs_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunning log-likelihood (G²) keyness of every term between the
    SHORT and LONG halves of the corpus (exact-median n_chars split):
    the corpus-linguistics standard for "which words characterize this
    subcorpus", preferred over chi-square exactly where curation needs
    it — rare words and skewed subcorpus sizes. Direction (+1 = marks
    short docs) comes from the integer cross-multiplied rate
    comparison, never a double. The log-odds shelf
    (log_odds_terms_by_lang) answers the same question with a
    Bayesian prior; G² is the frequentist twin reviewers expect, and
    disagreement between the two rankings flags prior-sensitive terms.

    Exactness: all four cell counts exact int64; each term's G² is ONE
    mirrored double expression quantized to micro before the
    deterministic (g2, term) top-k; zero cells contribute their exact
    limit (0) via the same CASE in both engines.

    Scale: one tokenize pass to the vocabulary grain; the two totals
    broadcast; top-k is a TakeOrderedAndProject.
    """
    toks = _shortlong_docs(spark, sf_dir).select(
        "g", F.explode("ts").alias("w")
    )
    c = toks.groupBy("w").agg(
        F.sum(F.when(F.col("g") == "short", 1).otherwise(0))
        .cast("bigint")
        .alias("a"),
        F.sum(F.when(F.col("g") == "long", 1).otherwise(0))
        .cast("bigint")
        .alias("b"),
    )
    tot = c.agg(
        F.sum("a").cast("bigint").alias("na"),
        F.sum("b").cast("bigint").alias("nb"),
    )
    z = c.crossJoin(F.broadcast(tot)).select(
        "w",
        "a",
        "b",
        F.when(
            F.col("a") * F.col("nb") > F.col("b") * F.col("na"), F.lit(1)
        )
        .otherwise(F.lit(-1))
        .alias("sgn"),
        F.expr(
            "CAST(round(2E0 * ("
            " CASE WHEN a > 0 THEN CAST(a AS DOUBLE)"
            "   * ln(CAST(a AS DOUBLE) / ((CAST(a AS DOUBLE) + b)"
            "       * na / (CAST(na AS DOUBLE) + nb)))"
            "   ELSE 0E0 END"
            " + CASE WHEN b > 0 THEN CAST(b AS DOUBLE)"
            "   * ln(CAST(b AS DOUBLE) / ((CAST(a AS DOUBLE) + b)"
            "       * nb / (CAST(na AS DOUBLE) + nb)))"
            "   ELSE 0E0 END) * 1000000E0, 0) AS BIGINT)"
        ).alias("g2_micro"),
    )
    return (
        z.orderBy(F.desc("g2_micro"), "w")
        .limit(_KEYNESS_TOPK)
        .select(
            F.col("w").alias("term"),
            F.col("a").alias("short_count"),
            F.col("b").alias("long_count"),
            F.col("sgn").alias("direction"),
            "g2_micro",
        )
    )


@register(
    "craigs_zeta_short_vs_long",
    oracle=_SHORTLONG_CTE
    + """
    , df AS (
      SELECT w,
             CAST(SUM(CASE WHEN g = 'short' THEN 1 ELSE 0 END) AS BIGINT)
               AS dfa,
             CAST(SUM(CASE WHEN g = 'long' THEN 1 ELSE 0 END) AS BIGINT)
               AS dfb
      FROM (SELECT DISTINCT doc_id, g, unnest(ts) AS w FROM d)
      GROUP BY w),
    nd AS (
      SELECT CAST(SUM(CASE WHEN g = 'short' THEN 1 ELSE 0 END) AS BIGINT)
               AS na,
             CAST(SUM(CASE WHEN g = 'long' THEN 1 ELSE 0 END) AS BIGINT)
               AS nb
      FROM d)
    SELECT w AS term, dfa AS short_doc_freq, dfb AS long_doc_freq,
           CAST(round((CAST(dfa AS DOUBLE) / na - CAST(dfb AS DOUBLE) / nb)
             * 1000000E0, 0) AS BIGINT) AS zeta_micro
    FROM df, nd
    ORDER BY dfa * nb - dfb * na DESC, w LIMIT 10
    """,
)
def craigs_zeta_short_vs_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Craig's Zeta marker words for the SHORT half of the corpus:
    zeta(w) = docfreq_short(w)/|short| - docfreq_long(w)/|long| — the
    stylometry workhorse for "consistently present here, consistently
    absent there". Unlike G² (token counts — one obsessive document
    can crown a term), Zeta counts DOCUMENTS, so a marker must recur
    across the subcorpus; the two rankings disagreeing is itself the
    burstiness signal (term_burstiness_topk quantifies it).

    Exactness: document frequencies and corpus sizes are exact int64;
    the top-k ORDERS on the integer cross-multiplied form
    dfa*nb - dfb*na (never the double ratio) with the term tiebreak;
    only the reported zeta quantizes to micro.

    Scale: per-doc DISTINCT terms then a vocabulary-grain rollup — the
    same one-shuffle shape as every df-based op; top-10 is a
    TakeOrderedAndProject.
    """
    d = _shortlong_docs(spark, sf_dir)
    docterms = d.select(
        "doc_id", "g", F.explode(F.array_distinct("ts")).alias("w")
    )
    df = docterms.groupBy("w").agg(
        F.sum(F.when(F.col("g") == "short", 1).otherwise(0))
        .cast("bigint")
        .alias("dfa"),
        F.sum(F.when(F.col("g") == "long", 1).otherwise(0))
        .cast("bigint")
        .alias("dfb"),
    )
    nd = d.agg(
        F.sum(F.when(F.col("g") == "short", 1).otherwise(0))
        .cast("bigint")
        .alias("na"),
        F.sum(F.when(F.col("g") == "long", 1).otherwise(0))
        .cast("bigint")
        .alias("nb"),
    )
    j = df.crossJoin(F.broadcast(nd))
    return (
        j.orderBy(
            F.desc(F.col("dfa") * F.col("nb") - F.col("dfb") * F.col("na")),
            "w",
        )
        .limit(10)
        .select(
            F.col("w").alias("term"),
            F.col("dfa").alias("short_doc_freq"),
            F.col("dfb").alias("long_doc_freq"),
            F.expr(
                "CAST(round((CAST(dfa AS DOUBLE) / na"
                " - CAST(dfb AS DOUBLE) / nb) * 1000000E0, 0) AS BIGINT)"
            ).alias("zeta_micro"),
        )
    )


# ---------------------------------------------------------------------------
# Round-11: the inter-rater agreement shelf beyond Cohen's kappa —
# Scott's pi, Gwet's AC1, Krippendorff's alpha — on the same
# (gold language, predicted language) confusion grain, sharing the
# registered langid scoring. Kappa is marginal-sensitive (the "kappa
# paradox": skewed marginals crush it even at high raw agreement);
# pi assumes a COMMON chance distribution, AC1 models chance as
# classification of the genuinely-uncertain fraction only, and alpha
# generalizes to the reliability-theory coincidence form — reading all
# four tells you whether a low kappa is disagreement or distribution.
# ---------------------------------------------------------------------------


def _agree_cte() -> str:
    """Shared confusion-marginal CTE head for the agreement family."""
    return f"""
    WITH p AS ({_langid_sql()}),
    cm AS (
      SELECT labeled_lang AS gold, predicted_lang AS pred,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM p GROUP BY 1, 2),
    n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cm),
    agree AS (SELECT CAST(SUM(CASE WHEN gold = pred THEN c ELSE 0 END)
                AS BIGINT) AS a FROM cm),
    marg AS (
      SELECT COALESCE(g.gold, pr.pred) AS lab,
             COALESCE(g.cg, 0) AS cg, COALESCE(pr.cp, 0) AS cp
      FROM (SELECT gold, SUM(c) AS cg FROM cm GROUP BY gold) g
      FULL JOIN (SELECT pred, SUM(c) AS cp FROM cm GROUP BY pred) pr
        ON pr.pred = g.gold),
    s AS (SELECT CAST(SUM((cg + cp) * (cg + cp)) AS BIGINT) AS s2,
                 CAST(COUNT(*) AS BIGINT) AS k
          FROM marg)
    """


def _agree_frames(spark: SparkSession, sf_dir: str):
    """(n, agree, s) 1-row frames shared by the Spark twins."""
    p = _langid_predictions(spark, sf_dir)
    cm = (
        p.groupBy(
            F.col("labeled_lang").alias("gold"),
            F.col("predicted_lang").alias("pred"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint()
    )
    n = cm.agg(F.sum("c").cast("bigint").alias("n"))
    agree = cm.agg(
        F.sum(F.when(F.col("gold") == F.col("pred"), F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("a")
    )
    g = cm.groupBy("gold").agg(F.sum("c").alias("cg"))
    pr = cm.groupBy("pred").agg(F.sum("c").alias("cp"))
    marg = g.join(pr, g.gold == pr.pred, "full").select(
        F.coalesce(F.col("cg"), F.lit(0)).alias("cg"),
        F.coalesce(F.col("cp"), F.lit(0)).alias("cp"),
    )
    s = marg.agg(
        F.sum(F.expr("(cg + cp) * (cg + cp)")).cast("bigint").alias("s2"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    return n, agree, s


@register(
    "langid_scott_pi",
    oracle=_agree_cte()
    + """
    SELECT n.n, agree.a AS n_agree,
           CAST(round((CAST(agree.a AS DOUBLE) / n.n
                - CAST(s.s2 AS DOUBLE) / (4E0 * n.n * n.n))
              / (1 - CAST(s.s2 AS DOUBLE) / (4E0 * n.n * n.n))
              * 1000000, 0) AS BIGINT) AS pi_micro
    FROM n, agree, s
    """,
)
def langid_scott_pi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scott's pi for the langid heuristic vs gold labels: chance
    agreement from the POOLED marginal ((cg+cp)/2n)^2 per category
    rather than kappa's product of per-rater marginals — the right
    correction when both "raters" are assumed to draw from one common
    category distribution, and the 2-rater base case of Fleiss' kappa.
    pi < kappa on this grid exactly when the heuristic's marginal
    drifts from the gold marginal — the size of that gap is itself the
    marginal-bias diagnostic.

    Exactness: S2 = Sum (cg+cp)^2 is an exact int64; pi is one
    mirrored single-row double, quantized to microticks.

    Scale: the shared scoring pass reduces to <= |langs|^2 cells;
    everything downstream is arithmetic on 1-row frames.
    """
    n, agree, s = _agree_frames(spark, sf_dir)
    return (
        n.crossJoin(F.broadcast(agree))
        .crossJoin(F.broadcast(s))
        .select(
            "n",
            F.col("a").alias("n_agree"),
            F.expr(
                "CAST(round((CAST(a AS DOUBLE) / n"
                " - CAST(s2 AS DOUBLE) / (4E0 * n * n))"
                " / (1 - CAST(s2 AS DOUBLE) / (4E0 * n * n))"
                " * 1000000, 0) AS BIGINT)"
            ).alias("pi_micro"),
        )
    )


@register(
    "langid_gwet_ac1",
    oracle=_agree_cte()
    + """
    , pe AS (
      SELECT CAST(SUM(CAST(cg + cp AS HUGEINT)
               * (2 * n.n - cg - cp)) AS HUGEINT) AS num,
             MAX(s.k) AS k, MAX(n.n) AS n
      FROM marg, n, s)
    SELECT n AS n_docs, k AS n_labels,
           CAST(round((CAST((SELECT a FROM agree) AS DOUBLE) / n
                - CAST(num AS DOUBLE) / (4E0 * n * n * (k - 1)))
              / (1 - CAST(num AS DOUBLE) / (4E0 * n * n * (k - 1)))
              * 1000000, 0) AS BIGINT) AS ac1_micro
    FROM pe
    """,
)
def langid_gwet_ac1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gwet's AC1 for the langid heuristic vs gold labels — the
    paradox-resistant agreement coefficient: chance agreement is
    modeled as random classification of only the genuinely-ambiguous
    units, pe = (1/(K-1)) * Sum pi_k (1 - pi_k) with pooled marginals
    pi_k — so AC1 stays calibrated where kappa/pi collapse under
    prevalence skew (one dominant language, exactly this corpus).
    AC1 >> kappa here reads "high agreement, skewed base rates", not
    "paradoxically unreliable rater".

    Exactness: the pe numerator Sum (cg+cp)(2n-cg-cp) rides HUGEINT /
    decimal(38,0) (products reach 4n^2 per category); one mirrored
    double division at the end.

    Scale: |langs|-row arithmetic after the shared scoring pass.
    """
    n, agree, s = _agree_frames(spark, sf_dir)
    p = _langid_predictions(spark, sf_dir)
    cm = p.groupBy(
        F.col("labeled_lang").alias("gold"),
        F.col("predicted_lang").alias("pred"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    g = cm.groupBy("gold").agg(F.sum("c").alias("cg"))
    pr = cm.groupBy("pred").agg(F.sum("c").alias("cp"))
    marg = g.join(pr, g.gold == pr.pred, "full").select(
        F.coalesce(F.col("cg"), F.lit(0)).alias("cg"),
        F.coalesce(F.col("cp"), F.lit(0)).alias("cp"),
    )
    pe = marg.crossJoin(F.broadcast(n)).agg(
        F.sum(
            F.expr("CAST(cg + cp AS DECIMAL(38,0)) * (2 * n - cg - cp)")
        ).alias("num"),
        F.max("n").alias("n"),
    )
    return (
        pe.crossJoin(F.broadcast(agree))
        .crossJoin(F.broadcast(s.select("k")))
        .select(
            F.col("n").alias("n_docs"),
            F.col("k").alias("n_labels"),
            F.expr(
                "CAST(round((CAST(a AS DOUBLE) / n"
                " - CAST(num AS DOUBLE) / (4E0 * n * n * (k - 1)))"
                " / (1 - CAST(num AS DOUBLE) / (4E0 * n * n * (k - 1)))"
                " * 1000000, 0) AS BIGINT)"
            ).alias("ac1_micro"),
        )
    )


@register(
    "langid_krippendorff_alpha",
    oracle=_agree_cte()
    + """
    SELECT n.n, agree.a AS n_agree,
           CAST(round((1 - (CAST(n.n - agree.a AS DOUBLE) / n.n)
                / ((4E0 * n.n * n.n - s.s2)
                   / (2E0 * n.n * (2 * n.n - 1))))
              * 1000000, 0) AS BIGINT) AS alpha_micro
    FROM n, agree, s
    """,
)
def langid_krippendorff_alpha(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Krippendorff's alpha (nominal metric, 2 raters, complete data)
    for the langid heuristic vs gold labels — the reliability-theory
    member of the family: alpha = 1 - Do/De over the COINCIDENCE
    matrix (each document contributes both orderings), with expected
    disagreement De drawn WITHOUT replacement from the pooled values
    ((2n)(2n-1) pairs). The finite-sample correction is what separates
    alpha from pi: alpha -> pi as n -> infinity, and the gap reads as
    small-sample uncertainty. Nominal here; the interval/ordinal
    generalizations change only the distance kernel.

    Exactness: Do = (n - a)/n and De = (4n^2 - S2)/(2n(2n-1)) assemble
    from the SAME exact integers as pi (a, S2, n); one mirrored double.

    Scale: |langs|-row arithmetic after the shared scoring pass.
    """
    n, agree, s = _agree_frames(spark, sf_dir)
    return (
        n.crossJoin(F.broadcast(agree))
        .crossJoin(F.broadcast(s))
        .select(
            "n",
            F.col("a").alias("n_agree"),
            F.expr(
                "CAST(round((1 - (CAST(n - a AS DOUBLE) / n)"
                " / ((4E0 * n * n - s2) / (2E0 * n * (2 * n - 1))))"
                " * 1000000, 0) AS BIGINT)"
            ).alias("alpha_micro"),
        )
    )
