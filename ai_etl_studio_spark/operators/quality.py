"""Training-data pipeline quality / scale operators.

The north-star directive (BASELINE.json) asks for the operations a
large-scale LLM training-data pipeline needs beyond the reference's
query surface. This module adds:

- PII redaction (regexp_replace, the e-mail/phone scrub every corpus
  pass runs) — synthesized PII so the check is non-vacuous;
- repetition / quality scoring (distinct-token ratio — the classic
  boilerplate detector);
- skew-safe two-phase salted aggregation and a salt-replicated join —
  the 100 TB answer to hot keys, oracle-checked against their
  unsalted equivalents (same result, skew-proof plan);
- near-duplicate CLUSTER formation (connected components by iterative
  min-label propagation over the MinHash-LSH pair graph) — turning
  pairs into keep/drop decisions, which is what a dedup pass actually
  ships. Iterative => rows-only check (SURVEY §7 'what's hard' #4).

Reference tie-in: the reference has no data-cleaning surface at all
(SURVEY §2A — its pipeline ops are catalog/sanitize/execute only), so
these are extensions, cited as such.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_etl_studio_spark.catalog import load_table
from ai_etl_studio_spark.functions.exact import cents
from ai_etl_studio_spark.operators import ORACLES, register
from ai_etl_studio_spark.operators.text import _SW_SQL

N_SALTS = 8
PII_ID_CAP = 500

_EMAIL_RE = r"[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}"
_PHONE_RE = r"\b555-[0-9]{4}\b"


@register(
    "pii_redact",
    oracle=f"""
    WITH synth AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or 555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
      FROM documents WHERE doc_id < {PII_ID_CAP}
    )
    SELECT doc_id,
           length(text) - length(
             regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                            '{_PHONE_RE}', '<PHONE>', 'g')) AS chars_removed,
           CAST(length(regexp_replace(text, '{_EMAIL_RE}', '', 'g')) < length(text)
                AS BOOLEAN) AS had_email,
           CAST(length(regexp_replace(text, '{_PHONE_RE}', '', 'g')) < length(text)
                AS BOOLEAN) AS had_phone
    FROM synth
    ORDER BY doc_id
    """,
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: regexp_replace e-mail + phone patterns with typed
    placeholders. The corpus is synthetic (no real PII), so the PII is
    injected deterministically per doc first — the redaction math
    (chars removed, per-pattern hit flags) is then non-vacuous.

    Scale: narrow, codegen'd, no shuffle; in production this is a
    mapInPandas stage only when the patterns need an NER model.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < PII_ID_CAP)
    synth = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(synth, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return (
        d.select("doc_id", synth.alias("text"))
        .select(
            "doc_id",
            (F.length("text") - F.length(
                F.regexp_replace(
                    F.regexp_replace("text", _EMAIL_RE, "<EMAIL>"),
                    _PHONE_RE,
                    "<PHONE>",
                )
            )).alias("chars_removed"),
            (
                F.length(F.regexp_replace("text", _EMAIL_RE, "")) < F.length("text")
            ).alias("had_email"),
            (
                F.length(F.regexp_replace("text", _PHONE_RE, "")) < F.length("text")
            ).alias("had_phone"),
        )
        .orderBy("doc_id")
    )


@register(
    "repetition_quality",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct,
           ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')), 4) AS distinct_ratio,
           CAST(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                / len(string_split(text, ' ')) < 0.3 AS BOOLEAN) AS is_repetitive
    FROM documents
    ORDER BY doc_id
    """,
)
def repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition filter: distinct-token ratio per document — low ratio
    flags boilerplate/spam (the standard corpus-quality gate next to
    text_quality's length/punct heuristics).

    Scale: narrow per-row array ops; the flag usually becomes a
    partition-pruning column for the keep-set write.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    ratio = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    return (
        d.select(
            "doc_id",
            F.size(toks).alias("n_tokens"),
            F.size(F.array_distinct(toks)).alias("n_distinct"),
            F.round(ratio, 4).alias("distinct_ratio"),
            (ratio < 0.3).alias("is_repetitive"),
        )
        .orderBy("doc_id")
    )


@register(
    "salted_agg",
    oracle="""
    SELECT l_suppkey,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100
             AS revenue
    FROM lineitem
    GROUP BY l_suppkey
    ORDER BY l_suppkey
    """,
)
def salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation: groupBy(key, salt) partial →
    groupBy(key) final. The oracle is the PLAIN single-phase GROUP BY —
    proving the salted plan computes the identical result.

    Scale: when one key owns 20% of 100 TB, single-phase hash agg puts
    20 TB through one reducer. Salting bounds any reducer's share to
    1/N_SALTS of the hot key. (Spark's partial aggregation already
    map-side-combines; explicit salting additionally splits the FINAL
    aggregation of the hot key, which partial-agg alone cannot.)
    The cents discipline makes the two accumulation orders bit-identical.
    """
    li = load_table(spark, sf_dir, "lineitem")
    salt = (F.col("l_orderkey") % N_SALTS).alias("salt")
    partial = (
        li.select("l_suppkey", salt, "l_extendedprice")
        .groupBy("l_suppkey", "salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(cents("l_extendedprice")).alias("pcents"),
        )
    )
    return (
        partial.groupBy("l_suppkey")
        .agg(
            F.sum("pn").alias("n_items"),
            (F.sum("pcents").cast("double") / 100).alias("revenue"),
        )
        .orderBy("l_suppkey")
    )


@register(
    "skew_join_salted",
    oracle="""
    SELECT s_name,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE) / 100
             AS revenue
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
    ORDER BY s_name
    """,
)
def skew_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salt-replicated join: the small side is exploded ×N_SALTS, the
    big side picks a deterministic salt, and the join key becomes
    (key, salt) — so a hot key's rows spread over N_SALTS reducers.
    Oracle = the plain unsalted join, proving result equivalence.

    Scale: this is the manual form of AQE's skew-join split, needed when
    the skew is known ahead of time (fact-to-dim joins on hot entities)
    or the engine's threshold heuristics miss it. The replicated side
    grows ×N_SALTS — only ever salt the SMALL side. The join is
    HINT-FREE: salting only matters when the join actually shuffles
    (supplier is SF-linear; a forced broadcast would both defeat the
    demonstration and OOM at scale) — AQE broadcasts at small SFs,
    and past that the salt spreads each hot key over N_SALTS reducers.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    s_rep = s.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(N_SALTS - 1)))
    )
    li_s = li.withColumn("salt", (F.col("l_orderkey") % N_SALTS).cast("int"))
    return (
        li_s.join(
            s_rep,
            (li_s.l_suppkey == s_rep.s_suppkey) & (li_s.salt == s_rep.salt),
        )
        .groupBy("s_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (F.sum(cents("l_extendedprice")).cast("double") / 100).alias("revenue"),
        )
        .orderBy("s_name")
    )


# Oracle: DuckDB recursive-CTE transitive closure over the SAME LSH pair
# graph (pair SQL reused verbatim from dedup_minhash_lsh_pairs, trailing
# ORDER BY stripped) — each node's cluster id is the MIN reachable node,
# exactly what min-label propagation converges to. The closure is
# O(nodes x component-size): fine for an oracle at sf0.01, which is why
# the distributed side uses propagation instead.
_CLUSTERS_ORACLE = f"""
WITH RECURSIVE pairs AS ({ORACLES["dedup_minhash_lsh_pairs"].rsplit(" ORDER BY ", 1)[0]}),
edges AS (SELECT doc_id_1 AS src, doc_id_2 AS dst FROM pairs
          UNION SELECT doc_id_2, doc_id_1 FROM pairs),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.node
),
labels AS (SELECT node, MIN(r) AS label FROM reach GROUP BY node)
SELECT label AS cluster_id, COUNT(*) AS n_docs,
       MIN(node) AS canonical_doc, MAX(node) AS max_doc
FROM labels GROUP BY label HAVING COUNT(*) > 1
ORDER BY cluster_id
"""


def _cc_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-component labels (node, label) over the MinHash-LSH
    candidate-pair graph via iterative min-label propagation — shared by
    dedup_clusters (cluster summary) and dedup_kept_corpus (the actual
    keep/drop set)."""
    from ai_etl_studio_spark.operators.dedup import _lsh_candidate_pairs

    # the pair DEVICE, not the registered query: the query's trailing
    # ORDER BY is presentation-only and the CC edge set is order-free,
    # so routing through it paid a global sort for nothing (r11).
    pairs = _lsh_candidate_pairs(spark, sf_dir).select(
        F.col("doc_id_1").alias("src"), F.col("doc_id_2").alias("dst")
    )
    # Undirected edges both ways — via ONE explode of both directions,
    # not a two-leg union (which re-ran the whole LSH pair pipeline
    # once per leg; r11, plan-verified). localCheckpoint materializes
    # and TRUNCATES LINEAGE — without it round k replays rounds 1..k-1
    # (O(k²) work) and the convergence check replays the whole chain.
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("src"), F.col("dst")),
                    F.struct(
                        F.col("dst").alias("src"), F.col("src").alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    # Each round = RELAX (take min over neighbors' labels) + POINTER
    # JUMP (label := label's own label — every label value is a node id,
    # so the hop is a self-lookup). Relax alone needs diameter rounds;
    # the jump makes label chains collapse geometrically, so rounds ~
    # log2(diameter). Convergence is detected from the `old` column
    # carried INSIDE the checkpointed frame — a narrow scan of the
    # cached partition, not a join job.
    for _ in range(8):
        neigh = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        relaxed = (
            labels.join(neigh, labels.node == neigh.src, "left")
            .select(
                "node",
                F.col("label").alias("old"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("mid"),
            )
            .localCheckpoint()  # feeds BOTH jump sides: compute once
        )
        rep = relaxed.select(
            F.col("node").alias("rnode"), F.col("mid").alias("rlabel")
        )
        labels = (
            relaxed.join(rep, relaxed.mid == rep.rnode, "left")
            .select(
                "node",
                "old",
                F.least(
                    F.col("mid"), F.coalesce(F.col("rlabel"), F.col("mid"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        if labels.filter(F.col("label") != F.col("old")).limit(1).count() == 0:
            break
    return labels.select("node", "label")


@register("dedup_clusters", oracle=_CLUSTERS_ORACLE)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate cluster formation: connected components over the
    MinHash-LSH candidate-pair graph via iterative min-label
    propagation, then a per-cluster summary (canonical doc = min id —
    the keep/drop decision a dedup pass actually emits).

    Algorithm: labels start as each node's own id; each round every
    node takes min(own, neighbors' labels); converged when no label
    changes. Rounds ≤ graph diameter ≤ log₂(n) for LSH graphs in
    practice; each round is one shuffle (join + groupBy-min).

    Oracle-checked (upgraded from rows-only): the DuckDB twin computes
    the transitive closure with a recursive CTE and takes MIN over the
    reachable set — a different algorithm arriving at the same fixpoint,
    so the check proves the propagation loop's convergence, not just
    its shape.

    Scale: this is the standard Spark connected-components shape
    (large-star/small-star simplification); per-round checkpointing
    breaks lineage growth on big graphs.
    """
    labels = _cc_labels(spark, sf_dir)
    return (
        labels.groupBy(F.col("label").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("node").alias("canonical_doc"),
            F.max("node").alias("max_doc"),
        )
        .filter(F.col("n_docs") > 1)
        .orderBy("cluster_id")
    )


_KEPT_ORACLE = f"""
WITH RECURSIVE pairs AS ({{pairs}}),
edges AS (SELECT doc_id_1 AS src, doc_id_2 AS dst FROM pairs
          UNION SELECT doc_id_2, doc_id_1 FROM pairs),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.node
),
drops AS (SELECT node FROM reach GROUP BY node HAVING MIN(r) <> node)
SELECT d.lang, d.source,
       COUNT(*) AS kept_docs,
       CAST(SUM(len(string_split_regex(lower(d.text), '\\s+'))) AS BIGINT) AS kept_tokens
FROM documents d ANTI JOIN drops ON d.doc_id = drops.node
GROUP BY d.lang, d.source
ORDER BY d.lang, d.source
"""


@register("dedup_kept_corpus")
def dedup_kept_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fuzzy-dedup pipeline END TO END: shingle → MinHash → LSH
    candidate pairs → connected components → drop every non-canonical
    cluster member → per-(lang, source) inventory of the KEPT corpus —
    i.e. the dataset a training run would actually consume, not just
    the intermediate pair/cluster artifacts (which dedup_minhash_*/
    dedup_clusters pin individually).

    Oracle: registered at import time below (the oracle composes the
    pair-generation SQL, which registers after this module loads).
    The DuckDB twin recomputes the drop set via a recursive-CTE
    transitive closure — a different CC algorithm reaching the same
    fixpoint.

    Scale: the anti join is hint-free — the drop set is usually tiny
    (|near-dups| ≪ |corpus|; AQE broadcasts it at runtime) but is
    corpus-PROPORTIONAL in the worst case (a 30% dup rate at 10^10 docs
    is ~48 GB of keys — no broadcast survives that), so the plan must
    not force it; AQE's dynamic switch picks broadcast vs shuffle
    anti-join from the materialized size (SCALE.md "Broadcast budget").
    Everything upstream is the documented LSH/CC pipeline. The final
    inventory is one partial-agg'd groupBy.
    """
    labels = _cc_labels(spark, sf_dir)
    drops = labels.filter(F.col("label") != F.col("node")).select("node")
    d = load_table(spark, sf_dir, "documents")
    return (
        d.join(drops, d.doc_id == drops.node, "left_anti")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("kept_docs"),
            F.sum(F.size(F.split(F.lower(F.col("text")), r"\s+"))).alias(
                "kept_tokens"
            ),
        )
        .orderBy("lang", "source")
    )


def _register_kept_oracle() -> None:
    from ai_etl_studio_spark.operators import ORACLES

    ORACLES["dedup_kept_corpus"] = " ".join(
        _KEPT_ORACLE.format(
            pairs=ORACLES["dedup_minhash_lsh_pairs"].rsplit(" ORDER BY ", 1)[0]
        ).split()
    )


_register_kept_oracle()


DECON_N = 8  # contamination n-gram width (industry range 8-13)

#: shared by decontaminate_ngrams and decontaminate_bloom — the Bloom
#: variant is an execution strategy, not a semantics change, so both
#: must match the same exact oracle.
DECON_ORACLE = rf"""
    WITH sh AS (
      SELECT doc_id, source,
             unnest(list_distinct(
               [md5(array_to_string(toks[i:i+{DECON_N - 1}], ' '))
                for i in range(1, len(toks) - {DECON_N} + 2)])) AS h
      FROM (SELECT doc_id, source, string_split_regex(lower(text), '\s+') AS toks
            FROM documents) t
      WHERE len(toks) >= {DECON_N}
    ),
    bench AS (SELECT DISTINCT h FROM sh WHERE source = 'src0'),
    cand AS (SELECT DISTINCT doc_id, source FROM sh WHERE source <> 'src0'),
    cont AS (
      SELECT DISTINCT s.doc_id FROM sh s JOIN bench b USING (h)
      WHERE s.source <> 'src0'
    )
    SELECT c.source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN cont.doc_id IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_contaminated
    FROM cand c LEFT JOIN cont ON c.doc_id = cont.doc_id
    GROUP BY c.source
    ORDER BY c.source
    """


@register("decontaminate_ngrams", oracle=DECON_ORACLE)
def decontaminate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test decontamination: flag training docs sharing any
    {DECON_N}-gram with the benchmark set (here: source='src0' plays
    the held-out benchmark). The standard pre-training hygiene pass —
    a doc that contains an eval question verbatim inflates scores.

    Scale: shingles are md5-hashed BEFORE the join (16-byte keys, never
    text); the benchmark side is tiny after distinct → broadcast
    LEFT SEMI join, so the corpus-side shingle stream never shuffles.
    The per-source rollup shuffles #docs rows of (source, flag).
    """
    sh = _decon_shingles(spark, sf_dir)
    bench = sh.filter(F.col("source") == "src0").select("h").distinct()
    cand = sh.filter(F.col("source") != "src0")
    contaminated = cand.join(F.broadcast(bench), "h", "left_semi")
    return _decon_rollup(cand, contaminated)


def _decon_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, h): md5-hashed {DECON_N}-gram shingle stream."""
    from ai_etl_studio_spark.functions.texthash import tokens, word_shingles

    from ai_etl_studio_spark.catalog import spread_small_scan

    # corpus spread when the scan is under-split (r11, guide §2.5): the
    # tokenize -> 8-gram -> md5 chain otherwise runs in one scan task
    d = spread_small_scan(spark, load_table(spark, sf_dir, "documents"))
    return (
        d.select("doc_id", "source", tokens("text").alias("toks"))
        .filter(F.size("toks") >= DECON_N)
        .select(
            "doc_id",
            "source",
            F.explode(word_shingles(F.col("toks"), DECON_N)).alias("shingle"),
        )
        .select("doc_id", "source", F.md5("shingle").alias("h"))
    )


def _decon_rollup(cand: DataFrame, contaminated_shingles: DataFrame) -> DataFrame:
    """Per-source (n_docs, n_contaminated) from the candidate shingle
    stream and the subset of it that hit the benchmark set."""
    contaminated = (
        contaminated_shingles.select("doc_id").distinct().withColumn("is_cont", F.lit(1))
    )
    docs = cand.select("doc_id", "source").distinct()
    return (
        docs.join(contaminated, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce("is_cont", F.lit(0))).alias("n_contaminated"),
        )
        .orderBy("source")
    )


#: Bloom sizing: a CONSTANT bit budget — the whole point is that the
#: broadcast stays this size no matter how big the benchmark set gets.
#: 2^21 bits / 64 = at most 32,768 (word_idx, mask) rows ≈ 0.5 MB.
DECON_BLOOM_BITS = 1 << 21
DECON_BLOOM_SEEDS = ("b0", "b1", "b2")  # k=3 hash functions


def _bloom_pos(h, seed: str) -> "F.Column":
    """Bit position of shingle-hash ``h`` under hash function ``seed``."""
    return F.pmod(F.xxhash64(F.concat(h, F.lit(seed))), F.lit(DECON_BLOOM_BITS))


def decon_bloom_bitmap(bench: DataFrame) -> DataFrame:
    """Fold the benchmark shingle set into a Bloom bitmap DataFrame
    (word_idx, mask): k bit positions per shingle, OR-combined into
    64-bit words. ≤ {DECON_BLOOM_BITS}/64 rows regardless of input size
    — map-side bit_or makes the shuffle constant-bounded too."""
    pos = bench.select(
        F.explode(
            F.array(*[_bloom_pos(F.col("h"), s) for s in DECON_BLOOM_SEEDS])
        ).alias("pos")
    )
    return pos.groupBy((F.col("pos") / 64).cast("long").alias("word_idx")).agg(
        F.bit_or(F.expr("shiftleft(1L, cast(pos % 64 AS int))")).alias("mask")
    )


def bloom_prune(cand: DataFrame, bitmap: DataFrame, h_col: str = "h") -> DataFrame:
    """Keep only rows whose ``h_col`` MIGHT be in the Bloom bitmap: k
    chained broadcast joins, each testing one hash's bit. No shuffle of
    ``cand``, no Python — every probe is a JVM-side broadcast hash join
    + bit test, and each one shrinks the stream for the next.
    Bloom guarantee: zero false negatives (a member's bits are all set);
    false positives are whoever the caller's exact confirm removes."""
    out = cand
    for i, s in enumerate(DECON_BLOOM_SEEDS):
        pos = _bloom_pos(F.col(h_col), s)
        bm = bitmap.select(
            F.col("word_idx").alias(f"_w{i}"), F.col("mask").alias(f"_m{i}")
        )
        out = (
            out.withColumn(f"_p{i}", pos)
            .join(
                F.broadcast(bm),
                (F.col(f"_p{i}") / 64).cast("long") == F.col(f"_w{i}"),
            )
            .filter(
                F.expr(f"shiftright(_m{i}, cast(_p{i} % 64 AS int)) & 1L") == 1
            )
            .drop(f"_p{i}", f"_w{i}", f"_m{i}")
        )
    return out


@register("decontaminate_bloom", oracle=DECON_ORACLE)
def decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decontaminate_ngrams with a Bloom-filter pre-prune — the 100 TB
    execution strategy, bit-identical results (same oracle).

    Why: at full scale the benchmark shingle set may be 10⁸ rows —
    broadcastable only as a *sketch*. The Bloom bitmap is a
    constant-size frame (≤32 K (word_idx, mask) rows ≈ 0.5 MB however
    large the benchmark grows); `bloom_prune` drops non-matching corpus
    shingles JVM-side via chained broadcast bit-test joins BEFORE the
    expensive exact join. No false negatives, so every truly
    contaminated shingle survives the prune; the exact semi-join on the
    ~1%-FP survivors — now a tiny fraction of the corpus stream —
    restores exactness. (Spark's `bloom_filter_agg` is not exposed to
    the SQL/DataFrame surface, so the bitmap is built declaratively:
    explode k positions → map-side-combined bit_or per 64-bit word.)
    """
    sh = _decon_shingles(spark, sf_dir)
    # the benchmark shingle set feeds the bitmap build AND the exact
    # confirm — materialize it (benchmark-sized, small by definition)
    # so the src0 explode pipeline runs once; the corpus-side stream is
    # NOT materialized: its two passes (prune chain, rollup totals) are
    # the honest cost at 100 TB, cheaper than spilling every shingle
    bench = (
        sh.filter(F.col("source") == "src0").select("h").distinct()
        .localCheckpoint()
    )
    bitmap = decon_bloom_bitmap(bench)
    cand = sh.filter(F.col("source") != "src0")
    pruned = bloom_prune(cand, bitmap)
    contaminated = pruned.join(F.broadcast(bench), "h", "left_semi")
    return _decon_rollup(cand, contaminated)


@register(
    "length_band_filter",
    oracle="""
    WITH b AS (
        SELECT quantile_cont(n_chars, 0.05) AS lo,
               quantile_cont(n_chars, 0.95) AS hi
        FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN n_chars >= lo AND n_chars <= hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           ROUND(AVG(CASE WHEN n_chars >= lo AND n_chars <= hi
                          THEN 1.0 ELSE 0.0 END), 6) AS kept_share
    FROM documents, b
    GROUP BY source
    ORDER BY source
    """,
)
def length_band_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-band length filter: drop the shortest 5% and longest
    5% of documents (exact interpolated percentiles), report kept
    share per source — the standard outlier-length gate in a corpus
    cleaning pass.

    Exactness: Spark ``percentile`` and DuckDB ``quantile_cont`` both
    linearly interpolate at rank (n-1)*q over integer n_chars, so the
    band edges agree bit-for-bit (cf. percentile_exact).

    Scale: one global agg reduced to a 1-row bounds relation,
    broadcast back over the corpus (no sort of the full data, no
    second shuffle); the per-source rollup is the only exchange."""
    d = load_table(spark, sf_dir, "documents")
    bounds = d.agg(
        F.percentile("n_chars", 0.05).alias("lo"),
        F.percentile("n_chars", 0.95).alias("hi"),
    )
    in_band = (F.col("n_chars") >= F.col("lo")) & (F.col("n_chars") <= F.col("hi"))
    return (
        d.join(F.broadcast(bounds))
        .withColumn("keep", in_band.cast("int"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("keep").alias("n_kept"),
            F.round(F.avg(F.col("keep").cast("double")), 6).alias("kept_share"),
        )
        .orderBy("source")
    )


_SQL_CONT_CTE = rf"""sh AS (
      SELECT doc_id, source,
             unnest(list_distinct(
               [md5(array_to_string(toks[i:i+{DECON_N - 1}], ' '))
                for i in range(1, len(toks) - {DECON_N} + 2)])) AS h
      FROM (SELECT doc_id, source, string_split_regex(lower(text), '\s+') AS toks
            FROM documents) t
      WHERE len(toks) >= {DECON_N}
    ),
    bench AS (SELECT DISTINCT h FROM sh WHERE source = 'src0'),
    cont AS (
      SELECT DISTINCT s.doc_id FROM sh s JOIN bench b USING (h)
      WHERE s.source <> 'src0'
    )"""


def _contaminated_docs(spark: SparkSession, sf_dir: str):
    """(doc_id) of non-benchmark docs sharing any DECON_N-gram with the
    src0 benchmark — the drop set shared by decontaminate_ngrams and
    clean_dataset_split."""
    from ai_etl_studio_spark.functions.texthash import tokens, word_shingles

    d = load_table(spark, sf_dir, "documents")
    sh = (
        d.select("doc_id", "source", tokens("text").alias("toks"))
        .filter(F.size("toks") >= DECON_N)
        .select(
            "doc_id",
            "source",
            F.explode(word_shingles(F.col("toks"), DECON_N)).alias("shingle"),
        )
        .select("doc_id", "source", F.md5("shingle").alias("h"))
    )
    bench = sh.filter(F.col("source") == "src0").select("h").distinct()
    return (
        sh.filter(F.col("source") != "src0")
        .join(F.broadcast(bench), "h", "left_semi")
        .select("doc_id")
        .distinct()
    )


@register(
    "clean_dataset_split",
    oracle=rf"""
    WITH {_SQL_CONT_CTE}
    SELECT split, source, COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS clean_tokens
    FROM (
      SELECT d.doc_id, d.source,
             len(string_split_regex(lower(d.text), '\s+')) AS n_tok,
             CASE WHEN CAST(concat('0x', substr(md5(concat('split:',
                       CAST(d.doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 100 < 80
                    THEN 'train'
                  WHEN CAST(concat('0x', substr(md5(concat('split:',
                       CAST(d.doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 100 < 90
                    THEN 'validation'
                  ELSE 'test' END AS split
      FROM documents d
      WHERE d.source <> 'src0'
    ) s ANTI JOIN cont ON s.doc_id = cont.doc_id
    GROUP BY split, source
    ORDER BY split, source
    """,
)
def clean_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-training data-prep endgame composed end to end:
    benchmark decontamination (drop every training doc sharing an
    8-gram with the src0 benchmark) THEN the deterministic 80/10/10
    hash split, reported as per-(split, source) doc and token budgets —
    the inventory a run actually trains on.

    Scale: the contaminated-doc set is benchmark-sized in practice but
    corpus-proportional in the worst case (every training doc could
    share an 8-gram with some benchmark), so the anti join is hint-free
    — AQE broadcasts the materialized set while it fits and falls back
    to a shuffle anti-join beyond (SCALE.md "Broadcast budget"). The
    split key is a narrow md5 on doc_id; one final small groupBy.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("source") != "src0")
    kept = d.join(_contaminated_docs(spark, sf_dir), "doc_id", "left_anti")
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
    return (
        kept.select(
            split.alias("split"),
            "source",
            F.size(F.split(F.lower(F.col("text")), r"\s+")).alias("n_tok"),
        )
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("clean_tokens"),
        )
        .orderBy("split", "source")
    )


_KEEP_BEST_ORACLE = f"""
WITH RECURSIVE pairs AS ({{pairs}}),
edges AS (SELECT doc_id_1 AS src, doc_id_2 AS dst FROM pairs
          UNION SELECT doc_id_2, doc_id_1 FROM pairs),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.node
),
labels AS (SELECT node, MIN(r) AS label FROM reach GROUP BY node),
scored AS (
  SELECT l.node, l.label,
         len(list_distinct(string_split_regex(lower(d.text), '\\s+'))) AS q
  FROM labels l JOIN documents d ON l.node = d.doc_id),
best AS (
  SELECT label, CAST(MAX(q) AS BIGINT) AS keep_quality,
         COUNT(*) AS n_docs
  FROM scored GROUP BY label)
SELECT s.label AS cluster_id, b.n_docs, b.keep_quality,
       MIN(CASE WHEN s.q = b.keep_quality THEN s.node END) AS keep_doc_id
FROM scored s JOIN best b USING (label)
GROUP BY s.label, b.n_docs, b.keep_quality
HAVING b.n_docs > 1
ORDER BY cluster_id
"""


@register("dedup_keep_best")
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production keep-policy for near-dup clusters: instead of the
    arbitrary min-doc_id canonical, keep the member with the HIGHEST
    quality (distinct-token count — an integer, so the argmax is exact),
    ties broken by lowest doc_id. This is what a curation pass actually
    ships: the best copy survives, the rest drop.

    Oracle (registered below at import end, composing the LSH-pairs SQL
    like dedup_kept_corpus): recursive-CTE transitive closure + the same
    max-quality-then-min-id selection.

    Scale: quality is a narrow per-doc expression; the per-cluster argmax
    is two small groupBys over (node, label, q) triples — document text
    never rides the cluster join.
    """
    from ai_etl_studio_spark.functions.texthash import tokens

    labels = _cc_labels(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    q = F.size(F.array_distinct(tokens("text")))
    scored = labels.join(
        d.select(F.col("doc_id").alias("node"), q.alias("q")), "node"
    )
    # ONE aggregation: the (max quality, min doc_id) argmax is the max
    # of the orderable struct (q, -node) — lexicographic max picks the
    # highest q, then the most-negative -node = the LOWEST doc_id, so
    # the kept row is identical to the former two-pass join-back form
    # (r11: the scored join — including the document scan and the
    # quality tokenization — previously ran twice).
    best = scored.groupBy(F.col("label").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("q").cast("bigint").alias("keep_quality"),
        (-F.max(F.struct(F.col("q"), (-F.col("node")).alias("mn"))).getField("mn"))
        .cast("bigint")
        .alias("keep_doc_id"),
    )
    return (
        best.filter(F.col("n_docs") > 1)
        .select("cluster_id", "n_docs", "keep_quality", "keep_doc_id")
        .orderBy("cluster_id")
    )


# oracle composes the LSH pair SQL (registered when dedup.py loaded)
ORACLES["dedup_keep_best"] = " ".join(
    _KEEP_BEST_ORACLE.format(
        pairs=ORACLES["dedup_minhash_lsh_pairs"].rsplit(" ORDER BY ", 1)[0]
    ).split()
)


@register(
    "curation_funnel",
    oracle=rf"""
    WITH {_SQL_CONT_CTE},
    b AS (
      SELECT quantile_cont(n_chars, 0.05) AS lo,
             quantile_cont(n_chars, 0.95) AS hi
      FROM documents),
    gated AS (
      SELECT d.source,
             CASE WHEN d.n_chars >= b.lo AND d.n_chars <= b.hi THEN 1 ELSE 0 END AS len_ok,
             CASE WHEN len(toks) >= 20
                   AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) >= 0.2
                  THEN 1 ELSE 0 END AS quality_ok,
             CASE WHEN cont.doc_id IS NULL THEN 1 ELSE 0 END AS clean_ok
      FROM (SELECT *, string_split_regex(lower(text), '\s+') AS toks
            FROM documents WHERE source <> 'src0') d
      CROSS JOIN b
      LEFT JOIN cont ON d.doc_id = cont.doc_id)
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(len_ok) AS BIGINT) AS pass_length,
           CAST(SUM(len_ok * quality_ok) AS BIGINT) AS pass_quality,
           CAST(SUM(len_ok * quality_ok * clean_ok) AS BIGINT) AS pass_decontam
    FROM gated
    GROUP BY source
    ORDER BY source
    """,
)
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-curation funnel as ONE declarative query: per source,
    how many docs survive each successive gate — length band (5th-95th
    percentile), quality (>=20 tokens, distinct ratio >= 0.2), benchmark
    decontamination. The report a data-curation review actually reads.

    Scale: composes three proven fragments — broadcast 1-row percentile
    bounds, narrow quality expressions, and the contaminated doc set —
    into a single pass plus one small per-source rollup. The
    contaminated set is DOC-GRAIN (worst case corpus-proportional), so
    its left join is hint-free: AQE broadcasts it while it fits and
    shuffles on doc_id past that. Every gate flag is computed in the
    same projection, so the corpus is read once.
    """
    from ai_etl_studio_spark.functions.texthash import tokens

    d = load_table(spark, sf_dir, "documents").filter(F.col("source") != "src0")
    all_docs = load_table(spark, sf_dir, "documents")
    bounds = all_docs.agg(
        F.expr("percentile(n_chars, 0.05D)").alias("lo"),
        F.expr("percentile(n_chars, 0.95D)").alias("hi"),
    )
    cont = _contaminated_docs(spark, sf_dir).withColumn("is_cont", F.lit(1))
    toks = tokens("text")
    n_tok = F.size(toks)
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n_tok
    gated = (
        d.crossJoin(F.broadcast(bounds))
        .join(cont, "doc_id", "left")
        .select(
            "source",
            ((F.col("n_chars") >= F.col("lo")) & (F.col("n_chars") <= F.col("hi")))
            .cast("int")
            .alias("len_ok"),
            ((n_tok >= 20) & (distinct_ratio >= 0.2)).cast("int").alias("quality_ok"),
            F.when(F.col("is_cont").isNull(), 1).otherwise(0).alias("clean_ok"),
        )
    )
    return (
        gated.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("len_ok").cast("bigint").alias("pass_length"),
            F.sum(F.col("len_ok") * F.col("quality_ok"))
            .cast("bigint")
            .alias("pass_quality"),
            F.sum(F.col("len_ok") * F.col("quality_ok") * F.col("clean_ok"))
            .cast("bigint")
            .alias("pass_decontam"),
        )
        .orderBy("source")
    )


@register(
    "skew_profile",
    oracle="""
    WITH k AS (SELECT l_suppkey AS key, COUNT(*) AS cnt
               FROM lineitem GROUP BY l_suppkey),
    s AS (SELECT COUNT(*) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS n_rows,
                 MAX(cnt) AS max_cnt FROM k)
    SELECT k.key, k.cnt,
           ROUND(CAST(k.cnt AS DOUBLE) * s.n_keys / s.n_rows, 6)
             AS skew_ratio,
           s.n_keys, s.n_rows
    FROM k CROSS JOIN s
    ORDER BY k.cnt DESC, k.key
    LIMIT 20
    """,
)
def skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic: top-20 heaviest keys of a fact-table
    join column with their skew ratio (count ÷ mean count). This is the
    profiling query run BEFORE choosing a join strategy — ratio ≫ 1
    says 'salt this key or let AQE split it' (the operators at
    quality.py salted_agg / skew_join_salted are the remedies).

    Scale: one groupBy on the key (the aggregation you were going to
    pay anyway), a 1-row global stats frame broadcast via cross join,
    and a top-k — no sort of the full key set (TakeOrderedAndProject).
    """
    li = load_table(spark, sf_dir, "lineitem")
    k = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    s = k.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
    ).select("n_keys", "n_rows")
    return (
        k.crossJoin(F.broadcast(s))
        .select(
            "key",
            "cnt",
            F.round(
                F.col("cnt").cast("double") * F.col("n_keys") / F.col("n_rows"), 6
            ).alias("skew_ratio"),
            "n_keys",
            "n_rows",
        )
        .orderBy(F.desc("cnt"), "key")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Gopher-style quality rule bundle (Rae et al. 2021, arXiv:2112.11446 §A1.1)
# ---------------------------------------------------------------------------

#: Gopher's canonical "must contain >= 2 of these" stop words.
_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")

#: Rule bounds (word-count floor lowered from Gopher's 50 to 20 to suit
#: the synthetic corpus's 30-60-token documents; all other bounds are
#: the published ones).
_G_MIN_WORDS, _G_MAX_WORDS = 20, 100_000
_G_MIN_MWL, _G_MAX_MWL = 3.0, 10.0
_G_MAX_SYMBOL_RATIO = 0.1
_G_MIN_ALPHA_FRAC = 0.8

_GS_SQL = "(" + ", ".join(f"'{w}'" for w in _GOPHER_STOPS) + ")"


@register(
    "gopher_rules",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id,
             lower(text) AS lt,
             list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS ts
      FROM documents),
    m AS (
      SELECT doc_id,
             len(ts) AS n_words,
             CAST(len(array_to_string(ts, '')) AS DOUBLE) / len(ts) AS mean_word_len,
             CAST(len(regexp_replace(lt, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
               / len(lt) AS symbol_ratio,
             CAST(len(list_filter(ts, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE)
               / len(ts) AS alpha_frac,
             len(list_distinct(list_filter(ts, w -> w IN {_GS_SQL}))) AS n_stop_distinct
      FROM t WHERE len(ts) > 0)
    SELECT *,
           CASE WHEN n_words BETWEEN {_G_MIN_WORDS} AND {_G_MAX_WORDS}
                 AND mean_word_len BETWEEN {_G_MIN_MWL} AND {_G_MAX_MWL}
                 AND symbol_ratio <= {_G_MAX_SYMBOL_RATIO}
                 AND alpha_frac >= {_G_MIN_ALPHA_FRAC}
                 AND n_stop_distinct >= 2
                THEN 1 ELSE 0 END AS pass_gopher
    FROM m
    ORDER BY doc_id
    """,
)
def gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-filter rule bundle (Rae et al. 2021): word-count
    bounds, mean-word-length bounds, symbol-to-char ratio, alphabetic
    word fraction, and distinct-stopword floor — the standard pretraining
    heuristic gate, complementing ``text_quality``'s stopword/distinct
    ratios. (No counterpart in the reference engine; extension surface.)

    Honest corpus note: the synthetic lexicon contains only 'the' from
    the published stop list, so the >=2-distinct-stopwords rule fails
    EVERY document and pass_gopher is 0 across the corpus — exactly how
    the unmodified English rule behaves on non-English text. The
    composed pipeline (pretrain_corpus_pipeline) therefore gates on the
    corpus-applicable subset (word count + mean word length) and leaves
    this op as the per-rule diagnostic report.

    Scale: ONE narrow projection per document — every rule is a
    higher-order-function / regexp expression inside whole-stage codegen;
    zero shuffles before the presentation sort, zero Python. The ratios
    are exact int/int IEEE divisions, bit-identical in both engines.
    """
    d = load_table(spark, sf_dir, "documents")
    lt = F.lower("text")
    ts = F.filter(F.split(lt, r"\s+"), lambda w: w != "")
    base = d.select(
        "doc_id", lt.alias("lt"), ts.alias("ts")
    ).filter(F.size("ts") > 0)
    n_words = F.size("ts")
    mean_word_len = F.length(F.array_join("ts", "")).cast("double") / n_words
    symbol_ratio = (
        F.length(F.regexp_replace("lt", "[a-z0-9 ]", "")).cast("double")
        / F.length("lt")
    )
    alpha_frac = (
        F.size(F.filter("ts", lambda w: w.rlike("[a-z]"))).cast("double")
        / n_words
    )
    n_stop = F.size(
        F.array_distinct(
            F.filter("ts", lambda w: w.isin(*_GOPHER_STOPS))
        )
    )
    m = base.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_frac.alias("alpha_frac"),
        n_stop.alias("n_stop_distinct"),
    )
    passes = (
        F.col("n_words").between(_G_MIN_WORDS, _G_MAX_WORDS)
        & F.col("mean_word_len").between(_G_MIN_MWL, _G_MAX_MWL)
        & (F.col("symbol_ratio") <= _G_MAX_SYMBOL_RATIO)
        & (F.col("alpha_frac") >= _G_MIN_ALPHA_FRAC)
        & (F.col("n_stop_distinct") >= 2)
    )
    return m.withColumn(
        "pass_gopher", F.when(passes, 1).otherwise(0)
    ).orderBy("doc_id")


@register(
    "contamination_fraction",
    oracle=rf"""
    WITH sh AS (
      SELECT doc_id, source,
             unnest(list_distinct(
               [md5(array_to_string(toks[i:i+{DECON_N - 1}], ' '))
                for i in range(1, len(toks) - {DECON_N} + 2)])) AS h
      FROM (SELECT doc_id, source, string_split_regex(lower(text), '\s+') AS toks
            FROM documents) t
      WHERE len(toks) >= {DECON_N}),
    bench AS (SELECT DISTINCT h FROM sh WHERE source = 'src0'),
    scored AS (
      SELECT s.doc_id, s.source, COUNT(*) AS n_grams,
             COUNT(b.h) AS n_hit
      FROM sh s LEFT JOIN bench b ON s.h = b.h
      WHERE s.source <> 'src0'
      GROUP BY s.doc_id, s.source)
    SELECT doc_id, source, n_grams, n_hit,
           CAST(n_hit AS DOUBLE) / n_grams AS contamination
    FROM scored
    WHERE n_hit > 0
    ORDER BY doc_id
    """,
)
def contamination_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded decontamination: instead of the binary any-shared-8-gram
    flag (`decontaminate_ngrams`), score each training document by the
    FRACTION of its distinct 8-grams that appear in the benchmark —
    the signal pipelines threshold when near-verbatim quotes are fine
    but wholesale leakage is not.

    Scale: the same hashed-shingle stream as decontaminate_ngrams
    (16-byte digests, text never shuffles); the benchmark membership is
    a broadcast LEFT join and the per-doc rollup is one count/count
    aggregation; the fraction is an int/int IEEE division.
    """
    sh = _decon_shingles(spark, sf_dir)
    dedup = sh.distinct()
    bench = (
        dedup.filter(F.col("source") == "src0").select("h").distinct()
        .withColumn("hit", F.lit(1))
    )
    scored = (
        dedup.filter(F.col("source") != "src0")
        .join(F.broadcast(bench), "h", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("hit").alias("n_hit"),
        )
    )
    return (
        scored.filter(F.col("n_hit") > 0)
        .withColumn(
            "contamination",
            F.col("n_hit").cast("double") / F.col("n_grams"),
        )
        .orderBy("doc_id")
    )


@register(
    "ngram_novelty_rate",
    oracle=rf"""
    WITH sh AS (
      SELECT doc_id,
             unnest(list_distinct(
               [md5(array_to_string(toks[i:i+{DECON_N - 1}], ' '))
                for i in range(1, len(toks) - {DECON_N} + 2)])) AS h
      FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
            FROM documents) t
      WHERE len(toks) >= {DECON_N}),
    first_seen AS (SELECT h, MIN(doc_id) AS first_doc FROM sh GROUP BY h)
    SELECT s.doc_id, COUNT(*) AS n_grams,
           COUNT(CASE WHEN f.first_doc = s.doc_id THEN 1 END) AS n_novel,
           CAST(COUNT(CASE WHEN f.first_doc = s.doc_id THEN 1 END) AS DOUBLE)
             / COUNT(*) AS novelty
    FROM sh s JOIN first_seen f ON s.h = f.h
    GROUP BY s.doc_id
    ORDER BY s.doc_id
    """,
)
def ngram_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-growth diagnostic: for each document (in doc_id ingest
    order), the fraction of its distinct 8-grams never seen in any
    earlier document. A collapsing novelty curve tells a crawl it has
    saturated a source — the aggregate view of what line/minhash dedup
    handles pair-by-pair.

    Scale: first-occurrence is ONE groupBy(h) -> min(doc_id) over the
    hashed shingle stream (map-side combinable, 16-byte keys); the
    novelty tag rides a shuffle join on h back to the stream and rolls
    up per doc. Same two-exchange budget however large the corpus.
    """
    sh = _decon_shingles(spark, sf_dir).select("doc_id", "h").distinct()
    first_seen = sh.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    tagged = sh.join(first_seen, "h")
    novel = F.when(F.col("first_doc") == F.col("doc_id"), 1)
    return (
        tagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count(novel).alias("n_novel"),
            (F.count(novel).cast("double") / F.count(F.lit(1))).alias("novelty"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# The whole pretraining curation pipeline as ONE declarative query
# ---------------------------------------------------------------------------

#: Pipeline gate bounds (the corpus-applicable Gopher rules: word count
#: and mean word length; the stopword rule is REPORTED by gopher_rules
#: but not gated on here — the synthetic lexicon contains almost none of
#: the published stop list, exactly as real non-English text wouldn't).
_PL_MIN_W, _PL_MAX_W = 20, 100_000
_PL_MIN_MWL, _PL_MAX_MWL = 3.0, 10.0
_PL_SEQ_LEN = 1024

_PIPELINE_ORACLE = rf"""
WITH raw AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(lower(text), '\s+'), w -> w <> '') AS ts
  FROM documents WHERE source <> 'src0'),
gm AS (
  SELECT doc_id, source, ts FROM raw
  WHERE len(ts) BETWEEN {_PL_MIN_W} AND {_PL_MAX_W}
    AND CAST(len(array_to_string(ts, '')) AS DOUBLE) / len(ts)
        BETWEEN {_PL_MIN_MWL} AND {_PL_MAX_MWL}),
lines AS (
  SELECT doc_id, source, i AS line_no,
         array_to_string(ts[(i*8+1):(i*8+8)], ' ') AS line
  FROM gm, UNNEST(range(CAST(ceil(len(ts)/8.0) AS BIGINT))) AS u(i)),
freq AS (SELECT md5(line) AS h, COUNT(DISTINCT doc_id) AS df FROM lines GROUP BY 1),
cleaned AS (
  SELECT doc_id, source,
         COALESCE(string_agg(CASE WHEN f.df < 2 THEN line END,
                             ' ' ORDER BY line_no), '') AS ctext
  FROM lines l JOIN freq f ON md5(l.line) = f.h
  GROUP BY doc_id, source),
ne AS (SELECT doc_id, source, ctext, md5(ctext) AS ch FROM cleaned WHERE ctext <> ''),
keepers AS (SELECT MIN(doc_id) AS doc_id FROM ne GROUP BY ch),
ex AS (SELECT ne.* FROM ne JOIN keepers k ON ne.doc_id = k.doc_id),
bench AS (
  SELECT DISTINCT unnest(list_distinct(
           [md5(array_to_string(toks[i:i+{DECON_N - 1}], ' '))
            for i in range(1, len(toks) - {DECON_N} + 2)])) AS h
  FROM (SELECT string_split_regex(lower(text), '\s+') AS toks
        FROM documents WHERE source = 'src0') t
  WHERE len(toks) >= {DECON_N}),
exg AS (
  SELECT doc_id, source, ctext,
         list_distinct([md5(array_to_string(cts[i:i+{DECON_N - 1}], ' '))
                        for i in range(1, len(cts) - {DECON_N} + 2)]) AS ghs
  FROM (SELECT doc_id, source, ctext,
               string_split_regex(ctext, ' ') AS cts FROM ex) t),
hits AS (
  SELECT DISTINCT g.doc_id
  FROM (SELECT doc_id, unnest(ghs) AS h FROM exg) g
  JOIN bench b ON g.h = b.h),
fin AS (
  SELECT e.doc_id, e.source,
         len(string_split_regex(e.ctext, ' ')) AS n_toks
  FROM exg e WHERE e.doc_id NOT IN (SELECT doc_id FROM hits)),
stage AS (
  SELECT r.source,
         COUNT(DISTINCT r.doc_id) AS n_raw,
         COUNT(DISTINCT gm.doc_id) AS n_quality,
         COUNT(DISTINCT ne.doc_id) AS n_cleaned,
         COUNT(DISTINCT ex.doc_id) AS n_exact,
         COUNT(DISTINCT fin.doc_id) AS n_final
  FROM raw r
  LEFT JOIN gm ON gm.doc_id = r.doc_id
  LEFT JOIN ne ON ne.doc_id = r.doc_id
  LEFT JOIN ex ON ex.doc_id = r.doc_id
  LEFT JOIN fin ON fin.doc_id = r.doc_id
  GROUP BY r.source)
SELECT s.*, COALESCE(t.tokens_final, 0) AS tokens_final,
       COALESCE((t.tokens_final + {_PL_SEQ_LEN - 1}) // {_PL_SEQ_LEN}, 0)
         AS est_sequences
FROM stage s
LEFT JOIN (SELECT source, CAST(SUM(n_toks) AS BIGINT) AS tokens_final
           FROM fin GROUP BY source) t
  ON s.source = t.source
ORDER BY s.source
"""


@register("pretrain_corpus_pipeline", oracle=_PIPELINE_ORACLE)
def pretrain_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END pretraining curation pipeline as one declarative
    DAG — quality gate → cross-document line dedup → exact dedup →
    benchmark decontamination → token budget — reporting per-source
    survival at every stage plus the final token count and packed
    1024-token sequence estimate. One query; Catalyst sees the whole
    lineage and prunes/pushes across stage boundaries no orchestrator
    of separate jobs could.

    Scale anatomy (each stage is the already-audited operator's shape):
    quality = row-local codegen predicates; line dedup = digest groupBy
    + hash join; exact dedup = 16-byte-hash groupBy; decontamination =
    broadcast semi-join of hashed 8-grams (docs travel as digests, the
    cleaned TEXT only rides the per-doc reassembly); the stage rollup
    joins per-stage DOC-ID sets (bytes per doc), never documents.
    """
    d = load_table(spark, sf_dir, "documents")
    ts = F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
    raw = d.filter(F.col("source") != "src0").select(
        "doc_id", "source", ts.alias("ts")
    )
    n_w = F.size("ts")
    mwl = F.length(F.array_join("ts", "")).cast("double") / n_w
    gm = raw.filter(
        n_w.between(_PL_MIN_W, _PL_MAX_W) & mwl.between(_PL_MIN_MWL, _PL_MAX_MWL)
    )
    from ai_etl_studio_spark.operators.dedup import LINE_W

    n_lines = F.ceil(F.size("ts") / F.lit(float(LINE_W))).cast("int")
    line_arr = F.transform(
        F.sequence(F.lit(0), n_lines - F.lit(1)),
        lambda i: F.array_join(F.slice("ts", i * LINE_W + 1, LINE_W), " "),
    )
    lines = gm.select(
        "doc_id", "source", F.posexplode(line_arr).alias("line_no", "line")
    ).withColumn("h", F.md5("line"))
    freq = lines.groupBy("h").agg(F.countDistinct("doc_id").alias("df"))
    keep = F.col("df") < 2
    cleaned = (
        lines.join(freq, "h")
        .groupBy("doc_id", "source")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.when(keep, F.struct("line_no", "line")))
                    ),
                    lambda s: s["line"],
                ),
                " ",
            ).alias("ctext")
        )
    )
    # materialize the cleaned corpus ONCE: five downstream consumers
    # (exact-dedup keepers, the semi-join, gram explosion, the final
    # token count, and the stage rollup) would otherwise each re-run the
    # whole gate->explode->reassemble lineage — measured 26 scans/26
    # Generates in the un-checkpointed plan. At cluster scale this is a
    # persist() on the cleaned stage; locally localCheckpoint plays that
    # role (same trick as the PageRank edge list).
    ne = (
        cleaned.filter(F.col("ctext") != "")
        .withColumn("ch", F.md5("ctext"))
        .localCheckpoint()
    )
    keepers = ne.groupBy("ch").agg(F.min("doc_id").alias("doc_id"))
    ex = ne.join(keepers.select("doc_id"), "doc_id", "left_semi")

    from ai_etl_studio_spark.functions.texthash import tokens, word_shingles

    bench = (
        d.filter(F.col("source") == "src0")
        .select(tokens("text").alias("toks"))
        .filter(F.size("toks") >= DECON_N)
        .select(F.explode(word_shingles(F.col("toks"), DECON_N)).alias("g"))
        .select(F.md5("g").alias("h"))
        .distinct()
    )
    exg = ex.select(
        "doc_id", "source", "ctext", F.split("ctext", " ").alias("cts")
    )
    grams = exg.filter(F.size("cts") >= DECON_N).select(
        "doc_id", F.explode(word_shingles(F.col("cts"), DECON_N)).alias("g")
    ).select("doc_id", F.md5("g").alias("h"))
    hits = grams.join(F.broadcast(bench), "h", "left_semi").select(
        "doc_id"
    ).distinct()
    fin = (
        exg.join(hits, "doc_id", "left_anti")
        .select("doc_id", "source", F.size(F.split("ctext", " ")).alias("n_toks"))
        .localCheckpoint()  # reused by the rollup AND the token sum
    )

    r = raw.select("doc_id", "source")
    stage = (
        r.join(gm.select(F.col("doc_id").alias("g_id")), r.doc_id == F.col("g_id"), "left")
        .join(ne.select(F.col("doc_id").alias("n_id")), r.doc_id == F.col("n_id"), "left")
        .join(ex.select(F.col("doc_id").alias("e_id")), r.doc_id == F.col("e_id"), "left")
        .join(fin.select(F.col("doc_id").alias("f_id")), r.doc_id == F.col("f_id"), "left")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_raw"),
            F.countDistinct("g_id").alias("n_quality"),
            F.countDistinct("n_id").alias("n_cleaned"),
            F.countDistinct("e_id").alias("n_exact"),
            F.countDistinct("f_id").alias("n_final"),
        )
    )
    toks = fin.groupBy("source").agg(
        F.sum("n_toks").cast("bigint").alias("tokens_final")
    )
    return (
        stage.join(toks, "source", "left")
        .select(
            "source",
            "n_raw",
            "n_quality",
            "n_cleaned",
            "n_exact",
            "n_final",
            F.coalesce("tokens_final", F.lit(0)).alias("tokens_final"),
            F.coalesce(
                F.expr(f"(tokens_final + {_PL_SEQ_LEN - 1}) DIV {_PL_SEQ_LEN}"),
                F.lit(0),
            ).alias("est_sequences"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Quality-score calibration bands (reliability table)
# ---------------------------------------------------------------------------

def _calibration_oracle() -> str:
    from ai_etl_studio_spark.operators.text import STOPWORDS

    sw = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"
    return rf"""
    WITH base AS (
      SELECT list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS ts
      FROM documents WHERE text IS NOT NULL),
    m AS (
      SELECT len(ts) AS n_words,
             CAST(len(list_filter(ts, x -> x IN {sw})) AS BIGINT) AS n_stop,
             CAST(len(array_to_string(ts, '')) AS DOUBLE) / len(ts) AS mwl
      FROM base WHERE len(ts) > 0),
    b AS (
      SELECT LEAST(9, CAST(floor(CAST(n_stop AS DOUBLE) / n_words * 10)
               AS BIGINT)) AS band,
             n_words, mwl
      FROM m)
    SELECT band, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n_words BETWEEN {_G_MIN_WORDS} AND {_G_MAX_WORDS}
                          AND mwl BETWEEN {_G_MIN_MWL} AND {_G_MAX_MWL}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           CAST(SUM(n_words) AS BIGINT) AS total_words
    FROM b GROUP BY band ORDER BY band
    """


@register("quality_calibration_bands", oracle=_calibration_oracle())
def quality_calibration_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table for the cheap stopword-density quality score:
    docs bucketed into 10 fixed score bands × how often the
    corpus-applicable gopher gate (word count + mean word length)
    agrees. A calibrated cheap score lets the expensive gate run on a
    fraction of the corpus; a flat table says the cheap score is noise.

    Scale: ONE narrow codegen projection per document (shared
    tokenization with text_quality / gopher_rules), then a ≤10-row
    rollup with conditional sums — fixed-width bands need no global
    rank, which is the point: the calibration readout costs one scan at
    any corpus size.
    """
    from ai_etl_studio_spark.operators.text import STOPWORDS

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    ts = F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
    base = d.select(ts.alias("ts")).filter(F.size("ts") > 0)
    n_words = F.size("ts")
    n_stop = F.size(F.filter("ts", lambda w: w.isin(*STOPWORDS)))
    mwl = F.length(F.array_join("ts", "")).cast("double") / n_words
    m = base.select(
        n_words.alias("n_words"),
        n_stop.cast("bigint").alias("n_stop"),
        mwl.alias("mwl"),
    )
    band = F.least(
        F.lit(9),
        F.floor(F.col("n_stop").cast("double") / F.col("n_words") * 10).cast(
            "bigint"
        ),
    )
    gate = F.col("n_words").between(_G_MIN_WORDS, _G_MAX_WORDS) & F.col(
        "mwl"
    ).between(_G_MIN_MWL, _G_MAX_MWL)
    return (
        m.select(band.alias("band"), "n_words", "mwl")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(gate, 1).otherwise(0)).cast("bigint").alias("n_pass"),
            F.sum("n_words").cast("bigint").alias("total_words"),
        )
        .orderBy("band")
    )


# ---------------------------------------------------------------------------
# Duplicate rate by quality band (dedup x quality interaction)
# ---------------------------------------------------------------------------

@register(
    "dup_rate_by_quality_band",
    oracle=rf"""
    WITH t AS (
      SELECT md5(text) AS h,
             list_filter(string_split_regex(lower(text), '\s+'),
               w -> w <> '') AS ts
      FROM documents WHERE text IS NOT NULL),
    m AS (
      SELECT h, CAST(len(ts) AS BIGINT) AS n_words,
             CAST(len(list_filter(ts, w -> w IN {_SW_SQL}))
               AS BIGINT) AS n_stop
      FROM t WHERE len(ts) > 0),
    d AS (
      SELECT least(9, CAST(floor(CAST(n_stop AS DOUBLE) / n_words * 10)
               AS BIGINT)) AS band,
             CAST(COUNT(*) OVER (PARTITION BY h) > 1 AS BIGINT) AS is_dup
      FROM m)
    SELECT band, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(is_dup) AS BIGINT) AS n_dups,
           CAST(SUM(is_dup) * 1000000 // COUNT(*) AS BIGINT) AS dup_ppm
    FROM d GROUP BY band ORDER BY band
    """,
)
def dup_rate_by_quality_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate rate per cheap-quality band (stopword-density
    deciles, the quality_calibration_bands score) — the interaction
    audit behind dedup budgeting: if dups concentrate in the low-
    quality bands, a quality gate FIRST shrinks the dedup problem; if
    they're flat, dedup must run on everything.

    Scale: one scan computes the hash and the band in the same narrow
    projection; duplicate flags come from a COUNT window over the hash
    partition (one shuffle on the 32-hex digest — no join back, no
    second scan), and the rollup is ≤10 rows with integer-ppm rates.
    """
    from ai_etl_studio_spark.operators.text import STOPWORDS

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    ts = F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
    m = d.select(F.md5("text").alias("h"), ts.alias("ts")).filter(
        F.size("ts") > 0
    )
    band = F.least(
        F.lit(9),
        F.floor(
            F.size(F.filter("ts", lambda w: w.isin(*STOPWORDS))).cast("double")
            / F.size("ts")
            * 10
        ).cast("bigint"),
    )
    is_dup = (
        F.count(F.lit(1)).over(Window.partitionBy("h")) > 1
    ).cast("bigint")
    return (
        m.select(band.alias("band"), is_dup.alias("is_dup"))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("is_dup").cast("bigint").alias("n_dups"),
            F.expr("CAST(SUM(is_dup) * 1000000 DIV COUNT(*) AS BIGINT)").alias(
                "dup_ppm"
            ),
        )
        .orderBy("band")
    )


# ---------------------------------------------------------------------------
# t-closeness audit (privacy triad: k-anonymity, l-diversity, t-closeness)
# ---------------------------------------------------------------------------

@register(
    "t_closeness_audit",
    oracle="""
    WITH cell AS (
      SELECT c_nationkey AS nk, c_mktsegment AS seg,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM customer GROUP BY 1, 2),
    grid AS (
      SELECT nk, seg FROM (SELECT DISTINCT nk FROM cell)
      CROSS JOIN (SELECT DISTINCT seg FROM cell)),
    full_cell AS (
      SELECT g.nk, g.seg, COALESCE(cell.c, 0) AS c
      FROM grid g LEFT JOIN cell ON g.nk = cell.nk AND g.seg = cell.seg),
    m AS (
      SELECT full_cell.*,
             CAST(SUM(c) OVER (PARTITION BY nk) AS BIGINT) AS n_g,
             CAST(SUM(c) OVER (PARTITION BY seg) AS BIGINT) AS n_s,
             CAST(SUM(c) OVER () AS BIGINT) AS n_all
      FROM full_cell),
    t AS (
      SELECT nk, n_g,
             CAST(round(abs(CAST(c AS DOUBLE) / n_g
               - CAST(n_s AS DOUBLE) / n_all) * 1000000000, 0) AS BIGINT)
               AS term_nano
      FROM m)
    SELECT nk AS nationkey, CAST(MAX(n_g) AS BIGINT) AS n_customers,
           CAST(SUM(term_nano) // 2 AS BIGINT) AS tvd_nano
    FROM t GROUP BY nk ORDER BY tvd_nano DESC, nationkey
    """,
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness per quasi-identifier group: the total-variation
    distance between each nation's market-segment distribution and the
    global one — the release gate that k_anonymity_audit (group size)
    and l_diversity_audit (value count) both miss: a large, diverse
    group still leaks if its sensitive-value MIX deviates from the
    population (tvd > t means an attacker learns the segment better
    than the prior). Completes the engine's privacy triad.

    Scale: customers reduce to the |nation|x|segment| cell table; the
    grid CROSS JOIN of the two tiny distinct sets restores EMPTY cells
    (a missing segment contributes its full prior mass — dropping it
    understates the leak); margins are windows over the bounded grid;
    per-cell terms quantize to nano BEFORE the group sum and the final
    halving is integer floor.
    """
    c = load_table(spark, sf_dir, "customer")
    cell = c.groupBy(
        F.col("c_nationkey").alias("nk"), F.col("c_mktsegment").alias("seg")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    cell = cell.localCheckpoint()
    grid = cell.select("nk").distinct().crossJoin(
        cell.select("seg").distinct()
    )
    full_cell = grid.join(cell, ["nk", "seg"], "left").select(
        "nk", "seg", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    m = full_cell.select(
        "*",
        F.sum("c").over(Window.partitionBy("nk")).cast("bigint").alias("n_g"),
        F.sum("c").over(Window.partitionBy("seg")).cast("bigint").alias("n_s"),
        F.sum("c")
        .over(Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .cast("bigint")
        .alias("n_all"),
    )
    term = F.round(
        F.abs(
            F.col("c").cast("double") / F.col("n_g")
            - F.col("n_s").cast("double") / F.col("n_all")
        )
        * 1_000_000_000,
        0,
    ).cast("bigint")
    return (
        m.select("nk", "n_g", term.alias("term_nano"))
        .groupBy("nk")
        .agg(
            F.max("n_g").cast("bigint").alias("n_customers"),
            F.sum("term_nano").alias("st"),
        )
        .select(
            F.col("nk").alias("nationkey"),
            "n_customers",
            F.expr("CAST(st DIV 2 AS BIGINT)").alias("tvd_nano"),
        )
        .orderBy(F.desc("tvd_nano"), "nationkey")
    )


# ---------------------------------------------------------------------------
# McNemar paired test: do two curation gates disagree symmetrically?
# ---------------------------------------------------------------------------

@register(
    "mcnemar_quality_gates",
    oracle=r"""
    WITH t AS (
      SELECT list_filter(string_split_regex(lower(text), '\s+'),
                         w -> w <> '') AS ts
      FROM documents WHERE text IS NOT NULL),
    m AS (
      SELECT CAST(len(ts) AS BIGINT) AS n_tok,
             CAST(len(list_distinct(ts)) AS BIGINT) AS n_dist
      FROM t WHERE len(ts) > 0),
    f AS (
      SELECT CASE WHEN n_tok >= 40 THEN 1 ELSE 0 END AS a,
             CASE WHEN 100 * n_dist >= 55 * n_tok THEN 1 ELSE 0 END AS b
      FROM m),
    cells AS (
      SELECT CAST(SUM(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00,
             CAST(SUM(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
             CAST(SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
             CAST(SUM(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11
      FROM f)
    SELECT n00, n01, n10, n11,
           CAST(round((abs(CAST(n01 AS DOUBLE) - n10) - 1)
                * (abs(CAST(n01 AS DOUBLE) - n10) - 1)
                / (n01 + n10) * 1000000, 0) AS BIGINT) AS chi2_micro
    FROM cells
    """,
)
def mcnemar_quality_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar paired test on two curation gates over the SAME docs —
    gate A = length (≥40 tokens), gate B = lexical diversity (distinct
    ratio ≥ 0.55): the 2×2 agreement cells plus the
    continuity-corrected χ² on the DISCORDANT pair (n01 vs n10). A
    significant χ² says the gates disagree asymmetrically — they
    encode different quality notions and the curation funnel's gate
    ORDER matters; the paired test the two-proportion z (which ignores
    pairing) gets wrong. Companion of quality_calibration_bands (which
    grades one gate against another; this tests their symmetry).

    Exactness: both gates are INTEGER tests (the diversity threshold is
    the cross-multiplication 100·distinct ≥ 55·tokens — no double ever
    decides a cell); χ² is one single-row double over exact counts.

    Scale: one corpus pass computes both gate bits in the same narrow
    projection; the aggregate is four conditional sums.
    """
    from ai_etl_studio_spark.functions.texthash import tokens

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    ts = F.filter(tokens("text"), lambda w: w != "")
    m = d.select(
        F.size(ts).cast("bigint").alias("n_tok"),
        F.size(F.array_distinct(ts)).cast("bigint").alias("n_dist"),
    ).filter(F.col("n_tok") > 0)
    f = m.select(
        (F.col("n_tok") >= 40).cast("int").alias("a"),
        (100 * F.col("n_dist") >= 55 * F.col("n_tok")).cast("int").alias("b"),
    )
    cells = f.agg(
        F.sum(F.when((F.col("a") == 0) & (F.col("b") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("n00"),
        F.sum(F.when((F.col("a") == 0) & (F.col("b") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("n01"),
        F.sum(F.when((F.col("a") == 1) & (F.col("b") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("n10"),
        F.sum(F.when((F.col("a") == 1) & (F.col("b") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("n11"),
    )
    diff = F.abs(F.col("n01").cast("double") - F.col("n10")) - 1
    return cells.select(
        "n00",
        "n01",
        "n10",
        "n11",
        F.round(diff * diff / (F.col("n01") + F.col("n10")) * 1_000_000, 0)
        .cast("bigint")
        .alias("chi2_micro"),
    )


# ---------------------------------------------------------------------------
# Exact AUC of the cheap stopword score predicting the diversity gate
# ---------------------------------------------------------------------------

@register(
    "quality_score_auc",
    oracle=r"""
    WITH t AS (
      SELECT list_filter(string_split_regex(lower(text), '\s+'),
                         w -> w <> '') AS ts
      FROM documents WHERE text IS NOT NULL),
    m AS (
      SELECT CAST(len(ts) AS BIGINT) AS n_tok,
             CAST(len(list_filter(ts, w -> w IN """
    + _SW_SQL
    + r""")) AS BIGINT) AS n_stop,
             CAST(len(list_distinct(ts)) AS BIGINT) AS nd
      FROM t WHERE len(ts) > 0),
    sc AS (
      SELECT n_stop * 1000000 // n_tok AS score_ppm,
             CASE WHEN 100 * nd >= 55 * n_tok THEN 1 ELSE 0 END AS y
      FROM m),
    c AS (SELECT score_ppm, y, CAST(COUNT(*) AS BIGINT) AS c
          FROM sc GROUP BY 1, 2),
    vv AS (SELECT score_ppm, CAST(SUM(c) AS BIGINT) AS cv
           FROM c GROUP BY score_ppm),
    mid AS (
      SELECT score_ppm, cv,
             2 * (SUM(cv) OVER (ORDER BY score_ppm) - cv) + cv + 1
               AS midrank2
      FROM vv),
    s AS (
      SELECT CAST(SUM(CASE WHEN y = 1 THEN c ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN y = 0 THEN c ELSE 0 END) AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN y = 1 THEN c * midrank2 ELSE 0 END)
               AS BIGINT) AS r2_pos
      FROM c JOIN mid USING (score_ppm))
    SELECT n1 AS n_pos, n0 AS n_neg,
           CAST(round((CAST(r2_pos AS DOUBLE) / 2 - CAST(n1 AS DOUBLE)
                * (n1 + 1) / 2) / (CAST(n1 AS DOUBLE) * n0)
                * 1000000, 0) AS BIGINT) AS auc_micro
    FROM s
    """,
)
def quality_score_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact AUC (= the Mann-Whitney statistic normalized) of the cheap
    stopword-density score as a predictor of the lexical-diversity
    gate — the ranking-quality number behind any plan to use the cheap
    score as a pre-filter for the expensive gate (AUC ≈ 0.5 means the
    shortcut is worthless; quality_calibration_bands shows WHERE it
    fails, this says WHETHER it ranks at all).

    Exactness: the score is an INTEGER ppm floor division (never a
    double sort key), so the midrank machinery runs on exact integer
    values — 2·midranks are integers, the positive-class rank sum is
    exact int64, and AUC is one single-row mirrored double.

    Scale: one corpus pass to (score, outcome) counts; the midrank
    window runs over DISTINCT score values.
    """
    from ai_etl_studio_spark.operators.text import STOPWORDS

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    ts = F.filter(
        F.split(F.lower("text"), r"\s+"), lambda w: w != ""
    )
    m = d.select(ts.alias("ts")).filter(F.size("ts") > 0).select(
        F.size("ts").cast("bigint").alias("n_tok"),
        F.size(F.filter(F.col("ts"), lambda w: w.isin(*STOPWORDS)))
        .cast("bigint")
        .alias("n_stop"),
        F.size(F.array_distinct("ts")).cast("bigint").alias("nd"),
    )
    sc = m.select(
        F.expr("n_stop * 1000000 DIV n_tok").alias("score_ppm"),
        (100 * F.col("nd") >= 55 * F.col("n_tok")).cast("int").alias("y"),
    )
    c = sc.groupBy("score_ppm", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).localCheckpoint()  # (score, outcome)-grain; feeds vv AND the join
    vv = c.groupBy("score_ppm").agg(F.sum("c").cast("bigint").alias("cv"))
    w = Window.orderBy("score_ppm").rowsBetween(Window.unboundedPreceding, 0)
    mid = vv.select(
        "score_ppm",
        (2 * (F.sum("cv").over(w) - F.col("cv")) + F.col("cv") + 1).alias(
            "midrank2"
        ),
    )
    s = c.join(mid, "score_ppm").agg(
        F.sum(F.when(F.col("y") == 1, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("y") == 0, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("n0"),
        F.sum(
            F.when(F.col("y") == 1, F.col("c") * F.col("midrank2")).otherwise(0)
        )
        .cast("bigint")
        .alias("r2_pos"),
    )
    return s.select(
        F.col("n1").alias("n_pos"),
        F.col("n0").alias("n_neg"),
        F.round(
            (
                F.col("r2_pos").cast("double") / 2
                - F.col("n1").cast("double") * (F.col("n1") + 1) / 2
            )
            / (F.col("n1").cast("double") * F.col("n0"))
            * 1_000_000,
            0,
        )
        .cast("bigint")
        .alias("auc_micro"),
    )


# ---------------------------------------------------------------------------
# Gains / lift table of the cheap quality score (the deployment readout)
# ---------------------------------------------------------------------------

@register(
    "gains_table_quality_score",
    oracle=r"""
    WITH t AS (
      SELECT list_filter(string_split_regex(lower(text), '\s+'),
                         w -> w <> '') AS ts
      FROM documents WHERE text IS NOT NULL),
    m AS (
      SELECT CAST(len(ts) AS BIGINT) AS n_tok,
             CAST(len(list_filter(ts, w -> w IN """
    + _SW_SQL
    + r""")) AS BIGINT) AS n_stop,
             CAST(len(list_distinct(ts)) AS BIGINT) AS nd
      FROM t WHERE len(ts) > 0),
    sc AS (
      SELECT n_stop * 1000000 // n_tok AS score_ppm,
             CASE WHEN 100 * nd >= 55 * n_tok THEN 1 ELSE 0 END AS y
      FROM m),
    c AS (SELECT score_ppm, CAST(COUNT(*) AS BIGINT) AS c,
                 CAST(SUM(y) AS BIGINT) AS pos
          FROM sc GROUP BY 1),
    n AS (SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS p
          FROM c),
    cum AS (
      SELECT score_ppm, c, pos,
             SUM(c) OVER (ORDER BY score_ppm DESC, score_ppm) AS cumn
      FROM c),
    dec AS (
      SELECT least(9, CAST((cumn - 1) * 10 // n.n AS BIGINT)) AS decile,
             c, pos
      FROM cum, n),
    g AS (
      SELECT decile, CAST(SUM(c) AS BIGINT) AS n_docs,
             CAST(SUM(pos) AS BIGINT) AS n_pos
      FROM dec GROUP BY decile)
    SELECT decile, n_docs, n_pos,
           CAST(SUM(n_pos) OVER (ORDER BY decile) AS BIGINT) AS cum_pos,
           CAST(SUM(n_pos) OVER (ORDER BY decile) * 1000000
                // (SELECT p FROM n) AS BIGINT) AS cum_gain_ppm,
           CAST(n_pos * (SELECT n FROM n) * 1000000
                // (n_docs * (SELECT p FROM n)) AS BIGINT) AS lift_ppm
    FROM g ORDER BY decile
    """,
)
def gains_table_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deployment readout behind quality_score_auc: docs ranked by
    the cheap stopword score (DESCENDING) and cut into value-grain
    deciles — per decile the diversity-gate positives captured,
    cumulative gain (what share of all positives the top-k deciles
    catch) and lift vs random. AUC says the score ranks; THIS says
    what a "screen the top 30% with the cheap score" policy actually
    recovers. Ties share a score value and therefore a decile
    (value-grain cut — deterministic, no double sort keys).

    Exactness: the score is an integer ppm; decile assignment is the
    exact integer test (cum−1)·10 // n on the descending value-grain
    cumulative; gains and lifts are integer ppm floor divisions.

    Scale: one corpus pass to (score, outcome) counts; the cut and the
    rollup run at the distinct-score grain.
    """
    from ai_etl_studio_spark.operators.text import STOPWORDS

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    ts = F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
    m = d.select(ts.alias("ts")).filter(F.size("ts") > 0).select(
        F.size("ts").cast("bigint").alias("n_tok"),
        F.size(F.filter(F.col("ts"), lambda w: w.isin(*STOPWORDS)))
        .cast("bigint")
        .alias("n_stop"),
        F.size(F.array_distinct("ts")).cast("bigint").alias("nd"),
    )
    sc = m.select(
        F.expr("n_stop * 1000000 DIV n_tok").alias("score_ppm"),
        (100 * F.col("nd") >= 55 * F.col("n_tok")).cast("int").alias("y"),
    )
    c = sc.groupBy("score_ppm").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        F.sum("y").cast("bigint").alias("pos"),
    ).localCheckpoint()  # distinct-score grain; feeds totals AND the cut
    n = c.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("p"),
    )
    w_cum = Window.orderBy(F.desc("score_ppm")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = c.select("score_ppm", "c", "pos", F.sum("c").over(w_cum).alias("cumn"))
    dec = cum.crossJoin(F.broadcast(n)).select(
        F.least(F.lit(9), F.expr("(cumn - 1) * 10 DIV n")).alias("decile"),
        "c",
        "pos",
    )
    g = dec.groupBy("decile").agg(
        F.sum("c").cast("bigint").alias("n_docs"),
        F.sum("pos").cast("bigint").alias("n_pos"),
    )
    w_gain = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        g.crossJoin(F.broadcast(n))
        .select(
            "decile",
            "n_docs",
            "n_pos",
            F.sum("n_pos").over(w_gain).cast("bigint").alias("cum_pos"),
            F.expr(
                "CAST(SUM(n_pos) OVER (ORDER BY decile"
                " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
                " * 1000000 DIV p AS BIGINT)"
            ).alias("cum_gain_ppm"),
            F.expr("n_pos * n * 1000000 DIV (n_docs * p)").alias("lift_ppm"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# Round 7: scorecard-deployment evals of the cheap quality score
# ---------------------------------------------------------------------------

#: Shared oracle CTE: every doc's stopword-density score (integer ppm)
#: and the lexical-diversity gate bit — the (score, outcome) pair the
#: AUC / gains / PR-AUC / Brier family all grade.
_SCORE_GATE_CTE = (
    r"""
    WITH t AS (
      SELECT list_filter(string_split_regex(lower(text), '\s+'),
                         w -> w <> '') AS ts
      FROM documents WHERE text IS NOT NULL),
    m AS (
      SELECT CAST(len(ts) AS BIGINT) AS n_tok,
             CAST(len(list_filter(ts, w -> w IN """
    + _SW_SQL
    + r""")) AS BIGINT) AS n_stop,
             CAST(len(list_distinct(ts)) AS BIGINT) AS nd
      FROM t WHERE len(ts) > 0),
    sc AS (
      SELECT n_stop * 1000000 // n_tok AS score_ppm,
             CASE WHEN 100 * nd >= 55 * n_tok THEN 1 ELSE 0 END AS y
      FROM m)
"""
)


def _score_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of ``_SCORE_GATE_CTE``: one corpus pass to
    (score_ppm, y) rows — integer ppm floor-division score, integer
    cross-multiplied gate, shared with quality_score_auc."""
    from ai_etl_studio_spark.operators.text import STOPWORDS

    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    ts = F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
    m = d.select(ts.alias("ts")).filter(F.size("ts") > 0).select(
        F.size("ts").cast("bigint").alias("n_tok"),
        F.size(F.filter(F.col("ts"), lambda w: w.isin(*STOPWORDS)))
        .cast("bigint")
        .alias("n_stop"),
        F.size(F.array_distinct("ts")).cast("bigint").alias("nd"),
    )
    return m.select(
        F.expr("n_stop * 1000000 DIV n_tok").alias("score_ppm"),
        (100 * F.col("nd") >= 55 * F.col("n_tok")).cast("int").alias("y"),
    )


@register(
    "brier_decomposition_quality",
    oracle=_SCORE_GATE_CTE
    + """
    , b AS (
      SELECT LEAST(score_ppm * 10 // 1000000, 9) AS bin, y,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM sc GROUP BY 1, 2),
    g AS (
      SELECT bin, CAST(SUM(c) AS BIGINT) AS nk,
             CAST(SUM(CASE WHEN y = 1 THEN c ELSE 0 END) AS BIGINT) AS sk,
             CAST(SUM(CASE WHEN y = 1 THEN c * (2 * bin + 1 - 20)
                             * (2 * bin + 1 - 20)
                           ELSE c * (2 * bin + 1) * (2 * bin + 1) END)
               AS BIGINT) AS b400
      FROM b GROUP BY bin),
    tot AS (
      SELECT CAST(SUM(nk) AS BIGINT) AS n, CAST(SUM(sk) AS BIGINT) AS s,
             CAST(SUM(b400) AS BIGINT) AS b400
      FROM g),
    terms AS (
      SELECT CAST(SUM(CAST(round(CAST(nk AS DOUBLE)
               * (CAST(2 * bin + 1 AS DOUBLE) / 20E0
                  - CAST(sk AS DOUBLE) / CAST(nk AS DOUBLE))
               * (CAST(2 * bin + 1 AS DOUBLE) / 20E0
                  - CAST(sk AS DOUBLE) / CAST(nk AS DOUBLE))
               * 1000E0, 0) AS BIGINT)) AS BIGINT) AS rel_milli,
             CAST(SUM(CAST(round(CAST(nk AS DOUBLE)
               * (CAST(sk AS DOUBLE) / CAST(nk AS DOUBLE)
                  - (SELECT CAST(s AS DOUBLE) / n FROM tot))
               * (CAST(sk AS DOUBLE) / CAST(nk AS DOUBLE)
                  - (SELECT CAST(s AS DOUBLE) / n FROM tot))
               * 1000E0, 0) AS BIGINT)) AS BIGINT) AS res_milli
      FROM g)
    SELECT n AS n_docs,
           CAST(round(CAST(b400 AS DOUBLE) / 400E0 / CAST(n AS DOUBLE)
             * 1000000E0, 0) AS BIGINT) AS brier_micro,
           CAST(round(CAST(rel_milli AS DOUBLE) / 1000E0 / CAST(n AS DOUBLE)
             * 1000000E0, 0) AS BIGINT) AS reliability_micro,
           CAST(round(CAST(res_milli AS DOUBLE) / 1000E0 / CAST(n AS DOUBLE)
             * 1000000E0, 0) AS BIGINT) AS resolution_micro,
           CAST(round((CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             * (1E0 - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             * 1000000E0, 0) AS BIGINT) AS uncertainty_micro
    FROM terms, tot
    """,
)
def brier_decomposition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score of the (decile-binned)
    stopword-density score forecasting the lexical-diversity gate:
    Brier = reliability − resolution + uncertainty. Reliability ≈ 0
    says the score IS a calibrated probability (use it directly as a
    sampling weight); high resolution says it separates the classes
    (worth calibrating); uncertainty is the class-imbalance floor no
    forecaster can beat. The decomposition tells you whether to fix the
    score by RECALIBRATING (high reliability term) or by adding
    features (low resolution) — AUC alone can't distinguish the two.

    Exactness: the forecast is the bin MIDPOINT (2k+1)/20, so per-doc
    400·(p−y)² = ((2k+1)−20y)² is exact integer and Brier is an
    integer ratio; the per-bin reliability/resolution terms (the only
    fractions) quantize to milli per bin before the ≤10-term sums; the
    identity Brier = rel − res + unc holds exactly in binned form
    (pinned by the round-7 replay test).

    Scale: one corpus pass to (bin, y) counts — 20 cells; everything
    downstream is arithmetic on the 10-row bin table.
    """
    sc = _score_gate(spark, sf_dir)
    b = sc.groupBy(
        F.expr("LEAST(score_ppm * 10 DIV 1000000, 9)").alias("bin"), "y"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    g = b.groupBy("bin").agg(
        F.sum("c").cast("bigint").alias("nk"),
        F.sum(F.when(F.col("y") == 1, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("sk"),
        F.sum(
            F.when(
                F.col("y") == 1,
                F.col("c")
                * (2 * F.col("bin") + 1 - 20)
                * (2 * F.col("bin") + 1 - 20),
            ).otherwise(
                F.col("c") * (2 * F.col("bin") + 1) * (2 * F.col("bin") + 1)
            )
        )
        .cast("bigint")
        .alias("b400"),
    ).localCheckpoint()  # 10-row bin table; read by tot AND terms
    tot = g.agg(
        F.sum("nk").cast("bigint").alias("n"),
        F.sum("sk").cast("bigint").alias("s"),
        F.sum("b400").cast("bigint").alias("b400"),
    )
    gt = g.crossJoin(F.broadcast(tot))
    terms = gt.agg(
        F.sum(
            F.expr(
                "CAST(round(CAST(nk AS DOUBLE)"
                " * (CAST(2 * bin + 1 AS DOUBLE) / 20E0"
                "    - CAST(sk AS DOUBLE) / CAST(nk AS DOUBLE))"
                " * (CAST(2 * bin + 1 AS DOUBLE) / 20E0"
                "    - CAST(sk AS DOUBLE) / CAST(nk AS DOUBLE))"
                " * 1000E0, 0) AS BIGINT)"
            )
        )
        .cast("bigint")
        .alias("rel_milli"),
        F.sum(
            F.expr(
                "CAST(round(CAST(nk AS DOUBLE)"
                " * (CAST(sk AS DOUBLE) / CAST(nk AS DOUBLE)"
                "    - CAST(s AS DOUBLE) / n)"
                " * (CAST(sk AS DOUBLE) / CAST(nk AS DOUBLE)"
                "    - CAST(s AS DOUBLE) / n)"
                " * 1000E0, 0) AS BIGINT)"
            )
        )
        .cast("bigint")
        .alias("res_milli"),
    )
    return terms.crossJoin(F.broadcast(tot)).select(
        F.col("n").alias("n_docs"),
        F.expr(
            "CAST(round(CAST(b400 AS DOUBLE) / 400E0 / CAST(n AS DOUBLE)"
            " * 1000000E0, 0) AS BIGINT)"
        ).alias("brier_micro"),
        F.expr(
            "CAST(round(CAST(rel_milli AS DOUBLE) / 1000E0"
            " / CAST(n AS DOUBLE) * 1000000E0, 0) AS BIGINT)"
        ).alias("reliability_micro"),
        F.expr(
            "CAST(round(CAST(res_milli AS DOUBLE) / 1000E0"
            " / CAST(n AS DOUBLE) * 1000000E0, 0) AS BIGINT)"
        ).alias("resolution_micro"),
        F.expr(
            "CAST(round((CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
            " * (1E0 - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
            " * 1000000E0, 0) AS BIGINT)"
        ).alias("uncertainty_micro"),
    )


@register(
    "matthews_corrcoef_gates",
    oracle=r"""
    WITH t AS (
      SELECT list_filter(string_split_regex(lower(text), '\s+'),
                         w -> w <> '') AS ts
      FROM documents WHERE text IS NOT NULL),
    m AS (
      SELECT CAST(len(ts) AS BIGINT) AS n_tok,
             CAST(len(list_distinct(ts)) AS BIGINT) AS n_dist
      FROM t WHERE len(ts) > 0),
    f AS (
      SELECT CASE WHEN n_tok >= 40 THEN 1 ELSE 0 END AS a,
             CASE WHEN 100 * n_dist >= 55 * n_tok THEN 1 ELSE 0 END AS b
      FROM m),
    cells AS (
      SELECT CAST(SUM(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
             CAST(SUM(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             CAST(SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(SUM(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp
      FROM f)
    SELECT tp, fp, fn, tn,
           CAST(round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)
             * 1000000E0, 0) AS BIGINT) AS precision_micro,
           CAST(round(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)
             * 1000000E0, 0) AS BIGINT) AS recall_micro,
           CAST(round(2E0 * CAST(tp AS DOUBLE)
             / CAST(2 * tp + fp + fn AS DOUBLE) * 1000000E0, 0) AS BIGINT)
             AS f1_micro,
           CAST(round(
             CAST(CAST(tp AS HUGEINT) * tn - CAST(fp AS HUGEINT) * fn
               AS DOUBLE)
             / sqrt(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
                    * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE))
             * 1000000E0, 0) AS BIGINT) AS mcc_micro
    FROM cells
    """,
)
def matthews_corrcoef_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation + precision/recall/F1 of the cheap length
    gate (≥40 tokens) PREDICTING the lexical-diversity gate — the
    effect-size companion of mcnemar_quality_gates (McNemar says the
    gates disagree asymmetrically; MCC says how far the cheap gate is
    from a usable surrogate, robust to the class imbalance that
    inflates accuracy and F1). MCC ≈ 0 kills the "skip the expensive
    gate" plan even when F1 looks healthy.

    Exactness: the confusion cells are the same integer-test cells as
    McNemar's; the MCC numerator tp·tn − fp·fn rides HUGEINT/decimal128
    (cell products cross int64 once cells exceed ~3e9); each ratio is
    ONE mirrored fixed-order expression over the four exact counts.

    Scale: one corpus pass, four conditional sums, one-row output.
    """
    from ai_etl_studio_spark.functions.texthash import tokens

    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    ts = F.filter(tokens("text"), lambda w: w != "")
    m = d.select(
        F.size(ts).cast("bigint").alias("n_tok"),
        F.size(F.array_distinct(ts)).cast("bigint").alias("n_dist"),
    ).filter(F.col("n_tok") > 0)
    f = m.select(
        (F.col("n_tok") >= 40).cast("int").alias("a"),
        (100 * F.col("n_dist") >= 55 * F.col("n_tok")).cast("int").alias("b"),
    )
    cells = f.agg(
        F.sum(F.when((F.col("a") == 0) & (F.col("b") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("tn"),
        F.sum(F.when((F.col("a") == 0) & (F.col("b") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("fn"),
        F.sum(F.when((F.col("a") == 1) & (F.col("b") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("fp"),
        F.sum(F.when((F.col("a") == 1) & (F.col("b") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("tp"),
    )
    return cells.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.expr(
            "CAST(round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)"
            " * 1000000E0, 0) AS BIGINT)"
        ).alias("precision_micro"),
        F.expr(
            "CAST(round(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)"
            " * 1000000E0, 0) AS BIGINT)"
        ).alias("recall_micro"),
        F.expr(
            "CAST(round(2E0 * CAST(tp AS DOUBLE)"
            " / CAST(2 * tp + fp + fn AS DOUBLE) * 1000000E0, 0) AS BIGINT)"
        ).alias("f1_micro"),
        F.expr(
            "CAST(round("
            "CAST(CAST(tp AS DECIMAL(19,0)) * tn"
            " - CAST(fp AS DECIMAL(19,0)) * fn AS DOUBLE)"
            " / sqrt(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)"
            "        * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE))"
            " * 1000000E0, 0) AS BIGINT)"
        ).alias("mcc_micro"),
    )


@register(
    "pr_auc_quality_score",
    oracle=_SCORE_GATE_CTE
    + """
    , c AS (
      SELECT score_ppm, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(y) AS BIGINT) AS pos
      FROM sc GROUP BY score_ppm),
    cum AS (
      SELECT score_ppm, pos,
             CAST(SUM(pos) OVER (ORDER BY score_ppm DESC) AS BIGINT)
               AS cumpos,
             CAST(SUM(cnt) OVER (ORDER BY score_ppm DESC) AS BIGINT)
               AS cumall
      FROM c),
    s AS (
      SELECT CAST(SUM(CAST(round(CAST(pos AS DOUBLE) * cumpos
               / CAST(cumall AS DOUBLE) * 1000000000E0, 0) AS BIGINT))
               AS BIGINT) AS ap_nano_sum,
             CAST(SUM(pos) AS BIGINT) AS n_pos
      FROM cum),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM sc)
    SELECT n_pos, n AS n_docs,
           CAST(round(CAST(ap_nano_sum AS DOUBLE) / 1000000000E0
             / CAST(n_pos AS DOUBLE) * 1000000E0, 0) AS BIGINT) AS ap_micro,
           CAST(round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)
             * 1000000E0, 0) AS BIGINT) AS prevalence_micro
    FROM s, tot
    """,
)
def pr_auc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (PR-AUC) of the stopword-density score ranking
    docs for the lexical-diversity gate, scored DESCENDING with whole
    tie-groups entering together — the ranking readout that, unlike ROC
    AUC (quality_score_auc), does not get flattered by the easy
    negatives when the positive class is rare: compare ap against the
    prevalence baseline (random ranking scores AP = prevalence), not
    against 0.5.

    Exactness: the score is the same integer-ppm value grain as the
    AUC op; descending cumulatives are exact integers per distinct
    score; the only fraction — the tie-group term pos·(cumpos/cumall)
    — quantizes to NANO per value before the sum (per-term tick
    device), and AP is one mirrored final division chain.

    Scale: value-grain table, one window over distinct scores (no
    per-doc ranking), one-row output.
    """
    sc = _score_gate(spark, sf_dir)
    c = sc.groupBy("score_ppm").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    w = Window.orderBy(F.desc("score_ppm")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = c.select(
        "pos",
        F.sum("pos").over(w).cast("bigint").alias("cumpos"),
        F.sum("cnt").over(w).cast("bigint").alias("cumall"),
    )
    s = cum.agg(
        F.sum(
            F.expr(
                "CAST(round(CAST(pos AS DOUBLE) * cumpos"
                " / CAST(cumall AS DOUBLE) * 1000000000E0, 0) AS BIGINT)"
            )
        )
        .cast("bigint")
        .alias("ap_nano_sum"),
        F.sum("pos").cast("bigint").alias("n_pos"),
    )
    tot = sc.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return s.crossJoin(F.broadcast(tot)).select(
        "n_pos",
        F.col("n").alias("n_docs"),
        F.expr(
            "CAST(round(CAST(ap_nano_sum AS DOUBLE) / 1000000000E0"
            " / CAST(n_pos AS DOUBLE) * 1000000E0, 0) AS BIGINT)"
        ).alias("ap_micro"),
        F.expr(
            "CAST(round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)"
            " * 1000000E0, 0) AS BIGINT)"
        ).alias("prevalence_micro"),
    )


@register(
    "dp_sensitivity_by_nation",
    oracle="""
    WITH spend AS (
      SELECT n.n_name AS nation, o.o_custkey AS ck,
             CAST(SUM(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
               AS BIGINT) AS cents,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders o
      JOIN customer cu ON o.o_custkey = cu.c_custkey
      JOIN nation n ON cu.c_nationkey = n.n_nationkey
      GROUP BY 1, 2)
    SELECT nation,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(MAX(n_orders) AS BIGINT) AS count_sensitivity,
           CAST(MAX(cents) AS BIGINT) AS sum_sensitivity_cents,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           CAST(round(CAST(MAX(cents) AS DOUBLE)
             / CAST(SUM(cents) AS DOUBLE) * 1000000E0, 0) AS BIGINT)
             AS laplace_noise_ratio_micro
    FROM spend GROUP BY nation ORDER BY nation
    """,
)
def dp_sensitivity_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential-privacy sensitivity audit for per-nation release of
    order counts and revenue sums under USER-level adjacency (one
    customer added/removed): count sensitivity = the largest single
    customer's order count, sum sensitivity = their revenue cents —
    the Δ that calibrates Laplace noise b = Δ/ε. The ratio column is
    b/total at ε = 1: the relative noise a DP release of this exact
    rollup would carry, i.e. 'is this aggregate publishable?'. The
    deterministic HALF of a DP pipeline (the noise draw itself is
    runtime randomness and out of scope by design); pairs with the
    k-anonymity / l-diversity / t-closeness audits as the formal-
    privacy shelf.

    Exactness: integer cents throughout; one mirrored double ratio.

    Scale: reduces to (nation, customer) grain; bounded output. At
    100 TB the max-contribution scan is the same rollup every DP system
    (e.g. contribution bounding / clamping) runs before releasing."""
    o = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    spend = (
        o.join(cu, o.o_custkey == cu.c_custkey)
        .join(n, cu.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.col("o_custkey").alias("ck")
        )
        .agg(
            F.sum(cents("o_totalprice")).cast("bigint").alias("cents"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        )
    )
    return (
        spend.groupBy("nation")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.max("n_orders").cast("bigint").alias("count_sensitivity"),
            F.max("cents").cast("bigint").alias("sum_sensitivity_cents"),
            F.sum("cents").cast("bigint").alias("total_cents"),
            F.round(
                F.max("cents").cast("double")
                / F.sum("cents").cast("double")
                * 1e6,
                0,
            )
            .cast("bigint")
            .alias("laplace_noise_ratio_micro"),
        )
        .orderBy("nation")
    )


@register(
    "last_digit_uniformity_audit",
    oracle="""
    WITH d AS (
      SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) % 10 AS digit
      FROM orders),
    c AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM c)
    SELECT c.digit, c.n,
           CAST(round((CAST(c.n AS DOUBLE) - CAST(t.tot AS DOUBLE) / 10)
             * (CAST(c.n AS DOUBLE) - CAST(t.tot AS DOUBLE) / 10)
             / (CAST(t.tot AS DOUBLE) / 10)
             * 1000000E0, 0) AS BIGINT) AS chi2_term_micro
    FROM c CROSS JOIN t ORDER BY c.digit
    """,
)
def last_digit_uniformity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-digit uniformity audit of order totals (cents): unlike
    LEADING digits (Benford — benford_audit / second-digit), trailing
    digits of genuine transaction amounts are very nearly UNIFORM, so
    any spike (round-number anchoring at 0/5, fabricated values
    favoring 7) is a fraud/data-entry flag the Benford pair cannot see.
    Emits the per-digit χ² contribution so the offending digit is named,
    not just the omnibus number (Σ of the column ~ χ²₉ under
    uniformity).

    Exactness: digit counts exact; each χ² term is one mirrored double
    expression over (n, tot).

    Scale: one 10-row reduction off the fact scan."""
    o = load_table(spark, sf_dir, "orders")
    c = (
        o.select((cents("o_totalprice") % 10).alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    t = c.agg(F.sum("n").cast("bigint").alias("tot"))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "digit",
            "n",
            F.expr(
                "CAST(round((CAST(n AS DOUBLE) - CAST(tot AS DOUBLE) / 10)"
                " * (CAST(n AS DOUBLE) - CAST(tot AS DOUBLE) / 10)"
                " / (CAST(tot AS DOUBLE) / 10)"
                " * 1000000E0, 0) AS BIGINT)"
            ).alias("chi2_term_micro"),
        )
        .orderBy("digit")
    )


@register(
    "referential_integrity_audit",
    oracle="""
    SELECT 'lineitem.l_orderkey -> orders' AS fk,
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_rows,
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
             AS BIGINT) AS n_orphans
    UNION ALL
    SELECT 'lineitem.l_partkey -> part',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM part p
                              WHERE p.p_partkey = l.l_partkey))
    UNION ALL
    SELECT 'lineitem.l_suppkey -> supplier',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM supplier s
                              WHERE s.s_suppkey = l.l_suppkey))
    UNION ALL
    SELECT 'orders.o_custkey -> customer',
           (SELECT COUNT(*) FROM orders),
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'customer.c_nationkey -> nation',
           (SELECT COUNT(*) FROM customer),
           (SELECT COUNT(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = c.c_nationkey))
    UNION ALL
    SELECT 'supplier.s_nationkey -> nation',
           (SELECT COUNT(*) FROM supplier),
           (SELECT COUNT(*) FROM supplier s
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = s.s_nationkey))
    UNION ALL
    SELECT 'nation.n_regionkey -> region',
           (SELECT COUNT(*) FROM nation),
           (SELECT COUNT(*) FROM nation n
            WHERE NOT EXISTS (SELECT 1 FROM region r
                              WHERE r.r_regionkey = n.n_regionkey))
    ORDER BY fk
    """,
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity sweep of every foreign key in the star
    schema: orphan counts (child rows whose FK matches no parent) for
    all seven FK edges, as LEFT-ANTI joins — the ingest gate every
    warehouse load should run before analytics trust the joins (an
    inner join silently DROPS orphans; this op counts what would
    vanish). Zero everywhere on this corpus by construction; a nonzero
    row names the broken edge.

    Scale: each check is one anti-join that broadcasts the parent's
    key column where it fits (nation/region/supplier) and shuffle-
    anti-joins the fact keys otherwise; the seven checks are
    independent and union into a 7-row report."""
    edges = [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation", "n_regionkey", "region", "r_regionkey"),
    ]
    out = None
    for child, fk, parent, pk in edges:
        c = load_table(spark, sf_dir, child)
        p = load_table(spark, sf_dir, parent).select(pk)
        orphans = c.join(p, c[fk] == p[pk], "left_anti").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orphans")
        )
        rows = c.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        piece = (
            rows.crossJoin(orphans)
            .select(
                F.lit(f"{child}.{fk} -> {parent}").alias("fk"),
                "n_rows",
                "n_orphans",
            )
        )
        out = piece if out is None else out.unionAll(piece)
    return out.orderBy("fk")


@register(
    "best_split_information_gain",
    oracle="""
    WITH d AS (
      SELECT n_chars AS x,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents WHERE lang IS NOT NULL),
    vg AS (
      SELECT x, CAST(COUNT(*) AS BIGINT) AS c,
             CAST(SUM(y) AS BIGINT) AS cp
      FROM d GROUP BY x),
    cum AS (
      SELECT x,
             CAST(SUM(c) OVER (ORDER BY x) AS BIGINT) AS nl,
             CAST(SUM(cp) OVER (ORDER BY x) AS BIGINT) AS pl,
             CAST(SUM(c) OVER () AS BIGINT) AS n,
             CAST(SUM(cp) OVER () AS BIGINT) AS p
      FROM vg),
    ig AS (
      SELECT x AS threshold, nl AS n_left, n - nl AS n_right,
             CAST(round((
               (CASE WHEN p > 0 AND p < n THEN
                 -(CAST(p AS DOUBLE) / n) * ln(CAST(p AS DOUBLE) / n)
                 - (1 - CAST(p AS DOUBLE) / n)
                   * ln(1 - CAST(p AS DOUBLE) / n) ELSE 0 END)
               - CAST(nl AS DOUBLE) / n
                 * (CASE WHEN pl > 0 AND pl < nl THEN
                   -(CAST(pl AS DOUBLE) / nl) * ln(CAST(pl AS DOUBLE) / nl)
                   - (1 - CAST(pl AS DOUBLE) / nl)
                     * ln(1 - CAST(pl AS DOUBLE) / nl) ELSE 0 END)
               - (CAST(n - nl AS DOUBLE)) / n
                 * (CASE WHEN p - pl > 0 AND p - pl < n - nl THEN
                   -(CAST(p - pl AS DOUBLE) / (n - nl))
                     * ln(CAST(p - pl AS DOUBLE) / (n - nl))
                   - (1 - CAST(p - pl AS DOUBLE) / (n - nl))
                     * ln(1 - CAST(p - pl AS DOUBLE) / (n - nl))
                   ELSE 0 END))
               * 1000000000E0, 0) AS BIGINT) AS ig_nano
      FROM cum WHERE nl < n)
    SELECT threshold, n_left, n_right, ig_nano
    FROM ig ORDER BY ig_nano DESC, threshold LIMIT 5
    """,
)
def best_split_information_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump split search: the five document-length thresholds
    with the highest information gain for predicting lang = 'en'
    (split ≤ t vs > t) — the inner loop of every tree learner
    (CART/XGBoost evaluate exactly this at every node), exposed as a
    single declarative pass: ONE cumulative scan over the sorted value
    grain evaluates EVERY candidate threshold simultaneously, which is
    the reason histogram-based tree learners scale — no per-threshold
    re-aggregation.

    Exactness: class counts are exact cumulative integers; parent and
    child entropies are one mirrored guarded expression (pure-node
    branches pinned to 0 by integer CASE conditions, not by 0·ln(0)
    luck); gain quantized to nano before the deterministic
    (gain, threshold) top-5.

    Scale: |distinct lengths| grain after one rollup; the full
    candidate sweep is a single window pass."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("lang").isNotNull()
    )
    vg = d.select(
        F.col("n_chars").alias("x"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    ).groupBy("x").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        F.sum("y").cast("bigint").alias("cp"),
    )
    wv = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = vg.select(
        "x",
        F.sum("c").over(wv).cast("bigint").alias("nl"),
        F.sum("cp").over(wv).cast("bigint").alias("pl"),
        F.sum("c").over(wall).cast("bigint").alias("n"),
        F.sum("cp").over(wall).cast("bigint").alias("p"),
    )

    def ent(num: str, den: str) -> str:
        q = f"(CAST({num} AS DOUBLE) / ({den}))"
        return (
            f"(CASE WHEN {num} > 0 AND {num} < {den} THEN"
            f" -{q} * ln({q}) - (1 - {q}) * ln(1 - {q}) ELSE 0 END)"
        )

    ig_expr = (
        f"CAST(round(({ent('p', 'n')}"
        f" - CAST(nl AS DOUBLE) / n * {ent('pl', 'nl')}"
        f" - (CAST(n - nl AS DOUBLE)) / n * {ent('p - pl', 'n - nl')})"
        " * 1000000000E0, 0) AS BIGINT)"
    )
    ig = cum.filter(F.col("nl") < F.col("n")).select(
        F.col("x").alias("threshold"),
        F.col("nl").alias("n_left"),
        (F.col("n") - F.col("nl")).alias("n_right"),
        F.expr(ig_expr).alias("ig_nano"),
    )
    return ig.orderBy(F.desc("ig_nano"), "threshold").limit(5)


# ---------------------------------------------------------------------------
# Round-10: calibration / operating-point shelf over the score-gate pair.
# ---------------------------------------------------------------------------


@register(
    "hosmer_lemeshow_quality_score",
    oracle=_SCORE_GATE_CTE
    + """
    , vc AS (
      SELECT score_ppm AS s, CAST(SUM(y) AS BIGINT) AS cy,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM sc GROUP BY 1),
    cum AS (
      SELECT s, cy, c,
             CAST(SUM(c) OVER (ORDER BY s) AS BIGINT) AS cumc,
             CAST(SUM(c) OVER () AS BIGINT) AS n
      FROM vc),
    binned AS (
      SELECT LEAST((cumc - 1) * 10 // n, 9) AS g, cy, c, c * s AS e_ppm
      FROM cum),
    grp AS (
      SELECT g, CAST(SUM(c) AS BIGINT) AS ng,
             CAST(SUM(cy) AS BIGINT) AS og,
             CAST(SUM(e_ppm) AS BIGINT) AS e_ppm
      FROM binned GROUP BY g),
    terms AS (
      SELECT g, ng, og, e_ppm,
             CASE WHEN e_ppm = 0 OR e_ppm = ng * 1000000 THEN NULL
             ELSE CAST(round((CAST(og AS DOUBLE) - CAST(e_ppm AS DOUBLE)
                 / 1000000E0)
               * (CAST(og AS DOUBLE) - CAST(e_ppm AS DOUBLE) / 1000000E0)
               / (CAST(e_ppm AS DOUBLE) / 1000000E0
                  * (1E0 - CAST(e_ppm AS DOUBLE) / 1000000E0
                     / CAST(ng AS DOUBLE)))
               * 1000E0, 0) AS BIGINT) END AS t_milli
      FROM grp)
    SELECT CAST(SUM(ng) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(SUM(t_milli) AS BIGINT) AS hl_milli
    FROM terms
    """,
)
def hosmer_lemeshow_quality_score(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hosmer-Lemeshow calibration chi-square of the stopword-density
    score read AS a probability of passing the lexical-diversity gate:
    equal-count deciles of the score, observed gate passes vs the sum
    of the scores themselves, Sum (O-E)^2 / (E(1-E/n)) — the grouped
    goodness-of-fit companion to brier_decomposition_quality's
    reliability term (HL is the TESTABLE form: ~chi-square(bins-2)
    under calibration, so it yields a p-value where reliability yields
    a magnitude).

    Exactness: deciles assign each DISTINCT score's whole tie group by
    its inclusive cumulative position ((cum-1)*10 div n — documented
    one-sided tie convention, identical windows in both engines);
    O is an integer count, E is an exact integer ppm sum; each bin's
    chi-square term quantizes to milli before the <=10-term sum. A
    degenerate bin (E=0 or E=n, undefined chi-square mass) yields a
    NULL term skipped identically by both engines' SUM.

    Scale: one corpus pass to the score grain; everything after is a
    <=10-row table.
    """
    vc = _score_gate(spark, sf_dir).groupBy(
        F.col("score_ppm").alias("s")
    ).agg(
        F.sum("y").cast("bigint").alias("cy"),
        F.count(F.lit(1)).cast("bigint").alias("c"),
    )
    wv = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = vc.select(
        "s",
        "cy",
        "c",
        F.sum("c").over(wv).cast("bigint").alias("cumc"),
        F.sum("c").over(wall).cast("bigint").alias("n"),
    )
    binned = cum.select(
        F.least(
            F.expr("(cumc - 1) * 10 DIV n"), F.lit(9)
        ).alias("g"),
        "cy",
        "c",
        (F.col("c") * F.col("s")).alias("e_ppm"),
    )
    grp = binned.groupBy("g").agg(
        F.sum("c").cast("bigint").alias("ng"),
        F.sum("cy").cast("bigint").alias("og"),
        F.sum("e_ppm").cast("bigint").alias("e_ppm"),
    )
    terms = grp.select(
        F.expr(
            "CASE WHEN e_ppm = 0 OR e_ppm = ng * 1000000 THEN NULL"
            " ELSE CAST(round((CAST(og AS DOUBLE) - CAST(e_ppm AS DOUBLE)"
            "     / 1000000E0)"
            "   * (CAST(og AS DOUBLE) - CAST(e_ppm AS DOUBLE) / 1000000E0)"
            "   / (CAST(e_ppm AS DOUBLE) / 1000000E0"
            "      * (1E0 - CAST(e_ppm AS DOUBLE) / 1000000E0"
            "         / CAST(ng AS DOUBLE)))"
            "   * 1000E0, 0) AS BIGINT) END"
        ).alias("t_milli"),
        "ng",
    )
    return terms.agg(
        F.sum("ng").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.sum("t_milli").cast("bigint").alias("hl_milli"),
    )


@register(
    "spiegelhalter_z_quality_score",
    oracle=_SCORE_GATE_CTE
    + """
    , vc AS (
      SELECT score_ppm AS s, CAST(y AS BIGINT) AS y,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM sc GROUP BY 1, 2),
    s AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(c * (y * 1000000 - s) * (1000000 - 2 * s))
               AS HUGEINT) AS num_t12,
             CAST(SUM(CAST(c AS HUGEINT) * (1000000 - 2 * s)
               * (1000000 - 2 * s) * s * (1000000 - s)) AS HUGEINT)
               AS den_t24
      FROM vc)
    SELECT n AS n_docs,
           CAST(round(CAST(num_t12 AS DOUBLE) / 1000000000000E0
             / sqrt(CAST(den_t24 AS DOUBLE) / 1E24) * 1000000E0, 0)
             AS BIGINT) AS spiegelhalter_z_micro
    FROM s
    """,
)
def spiegelhalter_z_quality_score(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Spiegelhalter's z — the UNGROUPED calibration test: standardizes
    Sum (y - p)(1 - 2p) under the hypothesis that each doc's gate bit
    really is Bernoulli(score). Complements Hosmer-Lemeshow by using
    every doc individually (no binning convention to defend) and by
    isolating calibration from discrimination: a score can have
    perfect AUC and still fail this badly (systematic over-confidence)
    or vice versa.

    Exactness: with p in integer ppm, every product is exact —
    (y*1e6 - s)(1e6 - 2s) in units of 1e12 summed as HUGEINT/
    decimal(38,0); the variance term (1-2p)^2 p(1-p) in units of 1e24
    likewise; z is ONE mirrored double expression over two exact sums.

    Scale: one corpus pass to the (score, y) grain, one-row output —
    the whole test is two integer dot products.
    """
    vc = _score_gate(spark, sf_dir).groupBy(
        F.col("score_ppm").alias("s"), F.col("y").cast("bigint").alias("y")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    s = vc.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(
            F.expr(
                "CAST(c AS DECIMAL(38,0)) * (y * 1000000 - s)"
                " * (1000000 - 2 * s)"
            )
        ).alias("num_t12"),
        F.sum(
            F.expr(
                "CAST(c AS DECIMAL(38,0)) * (1000000 - 2 * s)"
                " * (1000000 - 2 * s) * s * (1000000 - s)"
            )
        ).alias("den_t24"),
    )
    return s.select(
        F.col("n").alias("n_docs"),
        F.expr(
            "CAST(round(CAST(num_t12 AS DOUBLE) / 1000000000000E0"
            " / sqrt(CAST(den_t24 AS DOUBLE) / 1E24) * 1000000E0, 0)"
            " AS BIGINT)"
        ).alias("spiegelhalter_z_micro"),
    )


@register(
    "youden_threshold_quality_score",
    oracle=_SCORE_GATE_CTE
    + """
    , vc AS (
      SELECT score_ppm AS s, CAST(SUM(y) AS BIGINT) AS cy,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM sc GROUP BY 1),
    cum AS (
      SELECT s,
             CAST(SUM(cy) OVER (ORDER BY s DESC) AS BIGINT) AS tp,
             CAST(SUM(c - cy) OVER (ORDER BY s DESC) AS BIGINT) AS fp,
             CAST(SUM(cy) OVER () AS BIGINT) AS p,
             CAST(SUM(c - cy) OVER () AS BIGINT) AS neg
      FROM vc),
    j AS (
      SELECT s, tp, fp, p, neg, tp * neg - fp * p AS j_num
      FROM cum)
    SELECT s AS threshold_ppm, tp, fp, p - tp AS fn, neg - fp AS tn,
           CAST(round(CAST(j_num AS DOUBLE) / (CAST(p AS DOUBLE) * neg)
             * 1000000E0, 0) AS BIGINT) AS youden_j_micro
    FROM j ORDER BY j_num DESC, s LIMIT 1
    """,
)
def youden_threshold_quality_score(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The optimal operating point of the stopword-density score as a
    gate classifier (predict pass when score >= t): the threshold
    maximizing Youden's J = TPR - FPR, with the full confusion matrix
    at that point. gains/PR-AUC grade the whole ranking; THIS is the
    number a pipeline actually deploys — the single cut that best
    separates, chosen without reference to class priors or costs.

    Exactness: the argmax runs on the INTEGER cross-multiplied form
    J_num = TP*N - FP*P (never on the double ratio — the ulp-tie
    lesson), with the deterministic lowest-threshold tie-break; only
    the reported J quantizes to micro.

    Scale: one descending cumulative window over the score grain;
    TOP-1 by (j_num, s) is a TakeOrderedAndProject, not a sort.
    """
    vc = _score_gate(spark, sf_dir).groupBy(
        F.col("score_ppm").alias("s")
    ).agg(
        F.sum("y").cast("bigint").alias("cy"),
        F.count(F.lit(1)).cast("bigint").alias("c"),
    )
    wd = Window.orderBy(F.desc("s")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = vc.select(
        "s",
        F.sum("cy").over(wd).cast("bigint").alias("tp"),
        F.sum(F.col("c") - F.col("cy")).over(wd).cast("bigint").alias("fp"),
        F.sum("cy").over(wall).cast("bigint").alias("p"),
        F.sum(F.col("c") - F.col("cy"))
        .over(wall)
        .cast("bigint")
        .alias("neg"),
    )
    j = cum.withColumn(
        "j_num", F.col("tp") * F.col("neg") - F.col("fp") * F.col("p")
    )
    return (
        j.orderBy(F.desc("j_num"), "s")
        .limit(1)
        .select(
            F.col("s").alias("threshold_ppm"),
            "tp",
            "fp",
            (F.col("p") - F.col("tp")).alias("fn"),
            (F.col("neg") - F.col("fp")).alias("tn"),
            F.expr(
                "CAST(round(CAST(j_num AS DOUBLE)"
                " / (CAST(p AS DOUBLE) * neg) * 1000000E0, 0) AS BIGINT)"
            ).alias("youden_j_micro"),
        )
    )


# ---------------------------------------------------------------------------
# Round-10: Weight-of-Evidence / Information Value for the gate by source.
# ---------------------------------------------------------------------------


@register(
    "woe_iv_gate_by_source",
    oracle=_SCORE_GATE_CTE.replace(
        """    WITH t AS (
      SELECT list_filter(string_split_regex(lower(text), '\\s+'),
                         w -> w <> '') AS ts
      FROM documents WHERE text IS NOT NULL),""",
        """    WITH t AS (
      SELECT source,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         w -> w <> '') AS ts
      FROM documents WHERE text IS NOT NULL),""",
    ).replace(
        """      SELECT CAST(len(ts) AS BIGINT) AS n_tok,""",
        """      SELECT source, CAST(len(ts) AS BIGINT) AS n_tok,""",
    ).replace(
        """      SELECT n_stop * 1000000 // n_tok AS score_ppm,""",
        """      SELECT source, n_stop * 1000000 // n_tok AS score_ppm,""",
    )
    + """
    , g AS (
      SELECT source,
             CAST(SUM(y) AS BIGINT) AS good,
             CAST(COUNT(*) - SUM(y) AS BIGINT) AS bad
      FROM sc GROUP BY source),
    tt AS (SELECT CAST(SUM(good) AS BIGINT) AS tg,
                  CAST(SUM(bad) AS BIGINT) AS tb FROM g),
    w AS (
      SELECT g.source, g.good, g.bad,
             CASE WHEN g.good > 0 AND g.bad > 0 THEN
               CAST(round(ln((CAST(g.good AS DOUBLE) / t.tg)
                 / (CAST(g.bad AS DOUBLE) / t.tb)) * 1000000E0, 0)
                 AS BIGINT)
             END AS woe_micro,
             CASE WHEN g.good > 0 AND g.bad > 0 THEN
               CAST(round((CAST(g.good AS DOUBLE) / t.tg
                   - CAST(g.bad AS DOUBLE) / t.tb)
                 * ln((CAST(g.good AS DOUBLE) / t.tg)
                   / (CAST(g.bad AS DOUBLE) / t.tb)) * 1000000000E0, 0)
                 AS BIGINT)
             END AS iv_nano
      FROM g, tt t)
    SELECT source, good AS n_pass, bad AS n_fail, woe_micro, iv_nano,
           CAST(SUM(iv_nano) OVER () AS BIGINT) AS total_iv_nano
    FROM w ORDER BY source
    """,
)
def woe_iv_gate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight of Evidence and Information Value of SOURCE as a
    predictor of the lexical-diversity gate — the credit-scoring
    standard for grading a categorical feature before it enters a
    model: WoE per source is the log-odds lift vs the corpus, IV sums
    the WoE weighted by the probability gap (the folk thresholds:
    IV < 0.02 useless, > 0.3 strong). The calibration shelf grades the
    stopword SCORE; this grades the source LABEL, which is the
    "should we even stratify by source" decision.

    Exactness: per-source pass/fail counts are exact integers off one
    corpus pass; WoE/IV are per-source mirrored doubles quantized to
    micro/nano; degenerate sources (zero pass or zero fail — infinite
    WoE) yield NULL in both engines and drop out of the total IV via
    SUM's NULL skip, the textbook treatment short of binning.

    Scale: |sources|-grain after one pass; the total IV is a window
    over ~20 rows.
    """
    from ai_etl_studio_spark.operators.text import STOPWORDS

    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    ts = F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
    m = d.select("source", ts.alias("ts")).filter(F.size("ts") > 0).select(
        "source",
        F.size("ts").cast("bigint").alias("n_tok"),
        F.size(F.filter(F.col("ts"), lambda w: w.isin(*STOPWORDS)))
        .cast("bigint")
        .alias("n_stop"),
        F.size(F.array_distinct("ts")).cast("bigint").alias("nd"),
    )
    sc = m.select(
        "source",
        (100 * F.col("nd") >= 55 * F.col("n_tok")).cast("int").alias("y"),
    )
    g = sc.groupBy("source").agg(
        F.sum("y").cast("bigint").alias("good"),
        (F.count(F.lit(1)) - F.sum("y")).cast("bigint").alias("bad"),
    )
    tt = g.agg(
        F.sum("good").cast("bigint").alias("tg"),
        F.sum("bad").cast("bigint").alias("tb"),
    )
    w = g.crossJoin(F.broadcast(tt)).select(
        "source",
        "good",
        "bad",
        F.expr(
            "CASE WHEN good > 0 AND bad > 0 THEN"
            " CAST(round(ln((CAST(good AS DOUBLE) / tg)"
            " / (CAST(bad AS DOUBLE) / tb)) * 1000000E0, 0) AS BIGINT)"
            " END"
        ).alias("woe_micro"),
        F.expr(
            "CASE WHEN good > 0 AND bad > 0 THEN"
            " CAST(round((CAST(good AS DOUBLE) / tg"
            "   - CAST(bad AS DOUBLE) / tb)"
            " * ln((CAST(good AS DOUBLE) / tg)"
            "   / (CAST(bad AS DOUBLE) / tb)) * 1000000000E0, 0)"
            " AS BIGINT) END"
        ).alias("iv_nano"),
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return w.select(
        "source",
        F.col("good").alias("n_pass"),
        F.col("bad").alias("n_fail"),
        "woe_micro",
        "iv_nano",
        F.sum("iv_nano").over(wall).cast("bigint").alias("total_iv_nano"),
    ).orderBy("source")
