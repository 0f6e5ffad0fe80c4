"""Training-data pipeline operators: sequence packing and data mixing.

The two batch-shaping steps every large-scale LM data pipeline runs after
cleaning/dedup (driver-directed extension surface, alongside dedup.py /
quality.py / text.py):

- **sequence packing** (concat-and-chunk): stream documents in a
  deterministic order and cut the stream into fixed token-budget bins —
  the step that turns a document corpus into fixed-length training
  sequences.
- **data-mix allocation**: given per-(lang, source) token inventories,
  compute temperature-scaled sampling rates that hit a global token
  budget — the "how much of each source goes into the run" step.

The reference (balyuv/ai-etl-studio) has no notion of these; they exist
because the rebuild targets a 100 TB training-data engine
(BASELINE.json north star). Both are pure DataFrame ops — no UDFs — so
they stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_etl_studio_spark.catalog import load_table
from ai_etl_studio_spark.operators import register

#: Token budget per packed bin (a small "context window" for the corpus
#: at hand; production would use 4096/8192).
PACK_BUDGET = 256

#: Packing shards per language — packing is order-dependent, so the unit
#: of parallelism must be explicit: each (lang, shard) packs
#: independently. More shards = more parallelism, zero cross-shard
#: coordination.
PACK_SHARDS = 8

#: Global token budget the mix allocation must hit.
MIX_TARGET_TOKENS = 30_000

#: Knuth multiplicative hash parameters for deterministic sampling: the
#: "random" uniform for a doc is (doc_id * KNUTH_A) % HASH_MOD, scaled
#: by 1/HASH_MOD. Both engines evaluate it with exact BIGINT arithmetic
#: (overflows int64 only past ~3.4e9 doc_ids; switch to a 128-bit or
#: split-multiply form beyond that).
KNUTH_A = 2_654_435_761
HASH_MOD = 1_000_003

#: Reservoir size per (lang, source) group.
RESERVOIR_K = 5


@register(
    "sequence_packing",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, lang, doc_id % {PACK_SHARDS} AS shard,
             len(string_split_regex(lower(text), '\s+')) AS n_tokens
      FROM documents),
    packed AS (
      SELECT lang, shard, doc_id, n_tokens,
             CAST(FLOOR(CAST(SUM(n_tokens) OVER (
               PARTITION BY lang, shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - n_tokens AS DOUBLE) / {PACK_BUDGET}) AS BIGINT) AS bin_id
      FROM toks)
    SELECT lang, shard, bin_id,
           COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM packed
    GROUP BY lang, shard, bin_id
    ORDER BY lang, shard, bin_id
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: documents stream in doc_id
    order within (lang, shard) and are cut into bins of ~{PACK_BUDGET}
    whitespace tokens (a doc lands in the bin its *prior* cumulative
    count falls in, so bins overflow by at most one document — the
    standard concat-then-chunk packing LM pipelines use, as opposed to
    first-fit bin packing which is order-sensitive and non-parallel).

    Determinism: packing depends on stream order, so the order is total
    (doc_id within (lang, shard)) and the shard key is content-derived
    (doc_id % {PACK_SHARDS}), never partition-derived.

    Scale: the window partitions on (lang, shard) — parallelism is
    langs x shards regardless of corpus size, and raising PACK_SHARDS
    raises it with zero semantic coupling across shards. One shuffle
    (the window), one partial-agg'd groupBy on the same key prefix.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        F.size(F.split(F.lower(F.col("text")), r"\s+")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.withColumn(
        "bin_id",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("double")
            / PACK_BUDGET
        ),
    )
    return (
        packed.groupBy("lang", "shard", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("lang", "shard", "bin_id")
    )


def _mix_rates(d: DataFrame) -> DataFrame:
    """Shared mix-rate pipeline: per-(lang, source) token inventory →
    temperature-0.5 weights → budget-normalized sampling rate (un-
    rounded, as a ``rate`` column alongside the inventory columns).
    """
    inv = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.lower(F.col("text")), r"\s+"))).alias("group_tokens"),
    )
    wts = inv.withColumn(
        "w",
        F.round(F.sqrt(F.col("group_tokens").cast("double")) * 1000, 0).cast("bigint"),
    )
    tot = wts.agg(F.sum("w").alias("total_w"))
    quota = F.lit(float(MIX_TARGET_TOKENS)) * F.col("w").cast("double") / F.col(
        "total_w"
    )
    return wts.crossJoin(F.broadcast(tot)).withColumn(
        "rate", F.least(F.lit(1.0), quota / F.col("group_tokens"))
    )


@register(
    "data_mix_allocation",
    oracle=rf"""
    WITH inv AS (
      SELECT lang, source, COUNT(*) AS n_docs,
             CAST(SUM(len(string_split_regex(lower(text), '\s+'))) AS BIGINT) AS group_tokens
      FROM documents GROUP BY lang, source),
    wts AS (
      SELECT *, CAST(round(sqrt(CAST(group_tokens AS DOUBLE)) * 1000, 0) AS BIGINT) AS w
      FROM inv),
    tot AS (SELECT SUM(w) AS total_w FROM wts)
    SELECT lang, source, n_docs, group_tokens,
           round(LEAST(1.0, ({MIX_TARGET_TOKENS} * CAST(w AS DOUBLE) / total_w)
                             / group_tokens), 9) AS sample_rate,
           CAST(round(LEAST(1.0, ({MIX_TARGET_TOKENS} * CAST(w AS DOUBLE) / total_w)
                             / group_tokens) * group_tokens, 0) AS BIGINT)
             AS expected_tokens
    FROM wts, tot
    ORDER BY lang, source
    """,
)
def data_mix_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled data-mix allocation: weight each (lang,
    source) inventory by sqrt(tokens) (temperature 0.5 — upweights
    small sources relative to proportional sampling), normalize to a
    global {MIX_TARGET_TOKENS}-token budget, and cap rates at 1.0
    (can't sample more than exists). `expected_tokens` is the audit
    column: what the mix actually yields.

    Exactness: weights are quantized to integer milliunits before the
    cross-group sum, so `total_w` is a BIGINT and every downstream
    double op has bit-identical operands in both engines (cross-group
    double accumulation order is engine-dependent; integer sums are
    not). Rate rounded to 9dp for the same reason as percentile ops.

    Scale: the inventory agg is the only data-sized pass (partial agg,
    shuffle width = |groups|); the weight normalization is a broadcast
    of one total row. At 100 TB the groups table is thousands of rows —
    driver-trivial.
    """
    d = load_table(spark, sf_dir, "documents")
    rate = F.col("rate")
    return (
        _mix_rates(d)
        .select(
            "lang",
            "source",
            "n_docs",
            "group_tokens",
            F.round(rate, 9).alias("sample_rate"),
            F.round(rate * F.col("group_tokens"), 0).cast("bigint").alias(
                "expected_tokens"
            ),
        )
        .orderBy("lang", "source")
    )


@register(
    "mix_sampled_corpus",
    oracle=rf"""
    WITH inv AS (
      SELECT lang, source, COUNT(*) AS n_docs,
             CAST(SUM(len(string_split_regex(lower(text), '\s+'))) AS BIGINT) AS group_tokens
      FROM documents GROUP BY lang, source),
    wts AS (
      SELECT *, CAST(round(sqrt(CAST(group_tokens AS DOUBLE)) * 1000, 0) AS BIGINT) AS w
      FROM inv),
    tot AS (SELECT SUM(w) AS total_w FROM wts),
    rates AS (
      SELECT lang, source, group_tokens,
             CAST(FLOOR(LEAST(1.0, ({MIX_TARGET_TOKENS} * CAST(w AS DOUBLE) / total_w)
                               / group_tokens) * {HASH_MOD}) AS BIGINT) AS rate_ticks
      FROM wts, tot),
    docs AS (
      SELECT doc_id, lang, source,
             len(string_split_regex(lower(text), '\s+')) AS n_tokens,
             (doc_id * {KNUTH_A}) % {HASH_MOD} AS u_ticks
      FROM documents)
    SELECT d.lang, d.source,
           COUNT(*) AS kept_docs, CAST(SUM(d.n_tokens) AS BIGINT) AS kept_tokens,
           r.rate_ticks
    FROM docs d JOIN rates r ON d.lang = r.lang AND d.source = r.source
    WHERE d.u_ticks < r.rate_ticks
    GROUP BY d.lang, d.source, r.rate_ticks
    ORDER BY d.lang, d.source
    """,
)
def mix_sampled_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Execute the data-mix allocation: Bernoulli-sample each (lang,
    source) group at its budget-normalized rate, deterministically —
    a doc is kept iff hash(doc_id) falls below the group's rate. The
    output is the per-group audit (docs/tokens actually kept).

    Determinism without RNG: the uniform is the Knuth multiplicative
    hash (doc_id * {KNUTH_A}) % {HASH_MOD}, and the rate is quantized
    to integer ticks of 1/{HASH_MOD} — the keep predicate compares two
    BIGINTs, so resampling with the same corpus reproduces the exact
    corpus (the property training-data lineage requires; rand(seed) is
    partition-order-dependent and does NOT have it).

    Scale: rates come from the broadcast allocation table (thousands of
    rows); the sample itself is a broadcast-join + narrow filter over
    the corpus — one data-sized pass, no shuffle of document rows.
    """
    d = load_table(spark, sf_dir, "documents")
    rates = _mix_rates(d).select(
        "lang",
        "source",
        F.floor(F.col("rate") * HASH_MOD).cast("bigint").alias("rate_ticks"),
    )
    docs = d.select(
        "doc_id",
        "lang",
        "source",
        F.size(F.split(F.lower(F.col("text")), r"\s+")).alias("n_tokens"),
        ((F.col("doc_id") * F.lit(KNUTH_A)) % HASH_MOD).alias("u_ticks"),
    )
    return (
        docs.join(F.broadcast(rates), ["lang", "source"])
        .filter(F.col("u_ticks") < F.col("rate_ticks"))
        .groupBy("lang", "source", "rate_ticks")
        .agg(
            F.count(F.lit(1)).alias("kept_docs"),
            F.sum("n_tokens").alias("kept_tokens"),
        )
        .select("lang", "source", "kept_docs", "kept_tokens", "rate_ticks")
        .orderBy("lang", "source")
    )


@register(
    "reservoir_sample_per_group",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, lang, source,
             ROW_NUMBER() OVER (
               PARTITION BY lang, source
               ORDER BY (doc_id * {KNUTH_A}) % {HASH_MOD}, doc_id
             ) AS rn
      FROM documents)
    SELECT lang, source, doc_id, rn
    FROM ranked WHERE rn <= {RESERVOIR_K}
    ORDER BY lang, source, rn
    """,
)
def reservoir_sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform k-without-replacement sample per (lang, source):
    rank docs by their Knuth hash within the group and keep the first
    {RESERVOIR_K} — the deterministic equivalent of per-group reservoir
    sampling (order by a uniform random key ≡ reservoir, but
    reproducible and oracle-checkable).

    Scale: one shuffle on the group key; the window sort is per-group.
    For groups far larger than memory, the same semantics run as
    groupBy(key).agg(min_by-style top-k) — but hash-rank + row_number
    keeps it whole-stage-codegen'd and AQE handles moderate skew.
    """
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy(
        (F.col("doc_id") * F.lit(KNUTH_A)) % HASH_MOD, "doc_id"
    )
    return (
        d.select("doc_id", "lang", "source", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= RESERVOIR_K)
        .select("lang", "source", "doc_id", "rn")
        .orderBy("lang", "source", "rn")
    )


#: Overlapping-chunk parameters (RAG/embedding-window chunking).
CHUNK_SIZE = 64
CHUNK_STRIDE = 48


@register(
    "chunk_overlapping",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(text), '\s+') AS t
      FROM documents WHERE doc_id < 100),
    chunks AS (
      SELECT doc_id,
             CAST(i.i AS INT) AS chunk_id,
             CAST(i.i * {CHUNK_STRIDE} AS BIGINT) AS start_tok,
             LEAST({CHUNK_SIZE}, len(t) - i.i * {CHUNK_STRIDE}) AS chunk_tokens,
             array_to_string(
               list_slice(t, i.i * {CHUNK_STRIDE} + 1,
                          i.i * {CHUNK_STRIDE} + LEAST({CHUNK_SIZE}, len(t) - i.i * {CHUNK_STRIDE})),
               ' ') AS chunk_text
      FROM toks,
           unnest(generate_series(0,
             CAST(CEIL(CAST(GREATEST(len(t) - {CHUNK_SIZE}, 0) AS DOUBLE)
                       / {CHUNK_STRIDE}) AS BIGINT))) AS i(i))
    SELECT doc_id, chunk_id, start_tok, chunk_tokens,
           md5(chunk_text) AS chunk_md5
    FROM chunks
    ORDER BY doc_id, chunk_id
    """,
)
def chunk_overlapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window document chunking ({CHUNK_SIZE}-token chunks,
    stride {CHUNK_STRIDE} → {CHUNK_SIZE - CHUNK_STRIDE}-token overlap) —
    the retrieval/embedding-prep step that turns documents into
    fixed-size passages. Chunk count per doc is
    1 + ceil(max(len-{CHUNK_SIZE},0)/{CHUNK_STRIDE}), so every token is
    covered and the final chunk is the only short one. Chunk text is
    reported as md5 (the driver compare stays width-bounded; the text
    itself would be the real output in production).

    Scale: sequence+explode is narrow (no shuffle) — the blow-up is
    len/stride per doc. Each chunk row re-slices the token array
    JVM-side; nothing leaves codegen until the presentation sort.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = d.select("doc_id", F.split(F.lower(F.col("text")), r"\s+").alias("t"))
    n_chunks_minus1 = F.ceil(
        F.greatest(F.size("t") - CHUNK_SIZE, F.lit(0)).cast("double") / CHUNK_STRIDE
    ).cast("bigint")
    chunks = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks_minus1)).alias("i"),
        "t",
    )
    start = F.col("i") * CHUNK_STRIDE
    chunk_len = F.least(F.lit(CHUNK_SIZE), F.size("t") - start.cast("int"))
    return (
        chunks.select(
            "doc_id",
            F.col("i").cast("int").alias("chunk_id"),
            start.alias("start_tok"),
            chunk_len.cast("bigint").alias("chunk_tokens"),
            F.md5(
                F.array_join(
                    F.slice(F.col("t"), (start + 1).cast("int"), chunk_len), " "
                )
            ).alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_id")
    )


@register(
    "curriculum_stages",
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
      FROM vocab, tot),
    scored AS (
      SELECT t.doc_id, COUNT(*) AS n_tokens,
             round(CAST(SUM(v.tick) AS DOUBLE) / 1000000000 / COUNT(*), 6)
               AS avg_surprisal
      FROM toks t JOIN vticks v ON t.term = v.term
      GROUP BY t.doc_id),
    b AS (
      SELECT list_transform(quantile_cont(avg_surprisal, [1.0/3, 2.0/3]),
                            x -> round(x, 6)) AS sb
      FROM scored)
    SELECT 1 + len(list_filter(sb, x -> avg_surprisal > x)) AS stage,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS stage_tokens,
           round(CAST(SUM(CAST(round(avg_surprisal * 1000000, 0) AS BIGINT)) AS DOUBLE)
                 / 1000000 / COUNT(*), 6) AS mean_surprisal
    FROM scored, b
    GROUP BY stage
    ORDER BY stage
    """,
)
def curriculum_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum staging: score every doc by mean unigram surprisal
    (easy = low-surprisal/templated, hard = rare-token-dense), split the
    corpus into 3 difficulty terciles via broadcast quantile boundaries,
    and report each stage's doc/token budget — the schedule a
    curriculum-ordered training run consumes.

    Scale: reuses the rfm_quantile_scores pattern — NO global NTILE
    sort; the only global object is the broadcast 2-double boundary row.
    Surprisal quantized to integer nano-ticks (cross-engine exact);
    boundaries rounded to 6dp before comparison so both engines bucket
    identically.
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
    # doc-level scores feed BOTH the tercile boundaries and the final
    # bucketing — materialize once (|docs| narrow rows) or the whole
    # explode+join+agg pipeline runs twice; cluster-scale: persist()
    scored = (
        toks.join(F.broadcast(vticks), "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum("tick").cast("double") / 1_000_000_000 / F.count(F.lit(1)), 6
            ).alias("avg_surprisal"),
        )
        .localCheckpoint()
    )
    bounds = scored.agg(
        F.expr(
            "transform(percentile(avg_surprisal, array(1.0D/3, 2.0D/3)), x -> round(x, 6))"
        ).alias("sb")
    )
    stage = 1 + F.size(F.filter(F.col("sb"), lambda b: F.col("avg_surprisal") > b))
    return (
        scored.crossJoin(F.broadcast(bounds))
        .select(stage.alias("stage"), "n_tokens", "avg_surprisal")
        .groupBy("stage")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("stage_tokens"),
            F.round(
                F.sum(F.round(F.col("avg_surprisal") * 1_000_000, 0).cast("bigint")).cast(
                    "double"
                )
                / 1_000_000
                / F.count(F.lit(1)),
                6,
            ).alias("mean_surprisal"),
        )
        .orderBy("stage")
    )


N_SHARDS = 16
#: Knuth multiplicative hash constant (2654435761 = 2^32 / phi) — plain
#: bigint arithmetic so both engines derive identical shard ids, unlike
#: engine-specific hash() builtins.
SHARD_MULT = 2_654_435_761


def shard_of(key) -> "F.Column":
    return F.pmod((key * F.lit(SHARD_MULT)) % F.lit(1 << 32), F.lit(N_SHARDS))


@register(
    "export_shards",
    oracle=f"""
    SELECT ((doc_id * {SHARD_MULT}) % 4294967296) % {N_SHARDS} AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           COUNT(DISTINCT source) AS n_sources
    FROM documents
    GROUP BY 1
    ORDER BY shard
    """,
)
def export_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-export sharding manifest: every document
    is assigned to one of {N_SHARDS} shards by a multiplicative hash of
    doc_id (stable across engines, runs, and cluster sizes — unlike
    spark_partition_id or round-robin), and the manifest reports
    per-shard document/char counts. This is the rollup a dataloader
    checks before streaming shards; the write side
    (``write_training_shards``) lays the corpus out partitionBy(shard).

    Scale: one hash-partitioned aggregation; the multiplicative hash
    decorrelates shard id from doc_id locality so shards stay balanced
    even when doc_ids arrive clustered (sequential ingest).
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(shard_of(F.col("doc_id")).alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
            F.countDistinct("source").alias("n_sources"),
        )
        .orderBy("shard")
    )


def write_training_shards(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> DataFrame:
    """Write the corpus as {N_SHARDS} hash-sharded parquet directories
    (shard=NN/...) plus the manifest the dataloader reads. Returns the
    manifest DataFrame. One shuffle: repartition by shard so each shard
    directory is written by the executors owning it, not appended
    driver-side."""
    d = load_table(spark, sf_dir, "documents").withColumn(
        "shard", shard_of(F.col("doc_id"))
    )
    d.repartition(N_SHARDS, "shard").write.mode("overwrite").partitionBy(
        "shard"
    ).parquet(out_dir)
    manifest = export_shards(spark, sf_dir)
    manifest.coalesce(1).write.mode("overwrite").json(out_dir.rstrip("/") + "_manifest")
    return manifest


#: A-ES weighted sample size.
WS_K = 100
#: Priority quantization: ln(u)/w in integer nano-ticks — the house
#: determinism pattern (cf. unigram_surprisal): both engines evaluate
#: ln() on the IDENTICAL md5-derived double and round to int64 before
#: any ordering, so a last-ulp libm divergence cannot flip a rank.
WS_TICK = 1_000_000_000


@register(
    "weighted_sample_topk",
    oracle=f"""
    WITH pri AS (
      SELECT doc_id, lang, source, n_chars,
             CAST(round(
               ln((CAST((CAST(concat('0x', substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)) AS DOUBLE) + 1)
                  / 4294967296.0)
               / greatest(n_chars, 1) * {WS_TICK}, 0) AS BIGINT)
               AS priority_ticks
      FROM documents),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
               ORDER BY priority_ticks DESC, doc_id) AS rank
      FROM pri)
    SELECT rank, doc_id, lang, source, n_chars, priority_ticks
    FROM ranked WHERE rank <= {WS_K}
    ORDER BY rank
    """,
)
def weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted k-without-replacement sample (Efraimidis–Spirakis A-ES):
    each doc draws a deterministic uniform u from md5 and gets priority
    u^(1/w) — equivalently ln(u)/w — with w = n_chars; the global top-k
    by priority IS a weighted sample without replacement. The curation
    move behind "sample 1M docs proportional to length/quality from a
    10B-doc corpus" — one pass, no per-group state, reproducible.

    Scale: the selection is ORDER BY + LIMIT over a derived column →
    TakeOrderedAndProject per-task k-row heaps; no shuffle of corpus
    rows, no global sort, and the only data movement is k rows per task
    to the driver-side merge. Priorities are integer nano-ticks
    (ln on the identical md5-derived double in both engines, quantized
    BEFORE ranking) with doc_id tie-break — rank is total-ordered and
    replayable across retries/partitionings.
    """
    from ai_etl_studio_spark.functions.texthash import md5_hash32

    d = load_table(spark, sf_dir, "documents")
    u = (
        md5_hash32(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))).cast(
            "double"
        )
        + 1
    ) / F.lit(4294967296.0)
    ticks = F.round(
        F.log(u) / F.greatest(F.col("n_chars"), F.lit(1)) * WS_TICK, 0
    ).cast("bigint")
    topk = (
        d.select("doc_id", "lang", "source", "n_chars", ticks.alias("priority_ticks"))
        .orderBy(F.desc("priority_ticks"), "doc_id")
        .limit(WS_K)
    )
    # rank the k survivors (bounded window: WS_K rows, one partition)
    w = Window.orderBy(F.desc("priority_ticks"), "doc_id")
    return topk.select(
        F.row_number().over(w).alias("rank"),
        "doc_id",
        "lang",
        "source",
        "n_chars",
        "priority_ticks",
    ).orderBy("rank")


# ---------------------------------------------------------------------------
# Round-10: exact shard apportionment (Hamilton vs D'Hondt).
# ---------------------------------------------------------------------------

#: fixed shard budget to apportion across sources.
_APPORTION_SHARDS = 64

#: lcm(1..64) — multiplying a quotient n/k by this makes EVERY D'Hondt
#: quotient an exact integer (k | LCM), so the cross-source quotient
#: ranking is a pure integer sort. 28 digits; n*LCM stays inside the
#: 38-digit HUGEINT/DECIMAL headroom for any realistic per-source count.
_LCM_1_64 = 1182266884102822267511361600


@register(
    "shard_apportionment_sources",
    oracle=f"""
    WITH inv AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY source),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
                   CAST(COUNT(*) AS BIGINT) AS k FROM inv),
    ham0 AS (
      SELECT source, n,
             CAST({_APPORTION_SHARDS} * n // t.nn AS BIGINT) AS base,
             CAST({_APPORTION_SHARDS} * n
               - ({_APPORTION_SHARDS} * n // t.nn) * t.nn AS BIGINT) AS rem
      FROM inv, tot t),
    hleft AS (
      SELECT CAST({_APPORTION_SHARDS} - SUM(base) AS BIGINT) AS l
      FROM ham0),
    ham AS (
      SELECT source, n,
             base + CASE WHEN ROW_NUMBER() OVER
               (ORDER BY rem DESC, source) <= (SELECT l FROM hleft)
               THEN 1 ELSE 0 END AS hamilton_shards
      FROM ham0),
    quo AS (
      SELECT inv.source,
             CAST(inv.n AS HUGEINT) * ({_LCM_1_64} // t.k2) AS q
      FROM inv CROSS JOIN (SELECT unnest(range(1, {_APPORTION_SHARDS
        + 1})) AS k2) t),
    dh AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS dhondt_shards
      FROM (SELECT source, ROW_NUMBER() OVER (ORDER BY q DESC, source)
              AS rk FROM quo) r
      WHERE rk <= {_APPORTION_SHARDS} GROUP BY source)
    SELECT ham.source, ham.n AS n_docs, ham.hamilton_shards,
           CAST(COALESCE(dh.dhondt_shards, 0) AS BIGINT) AS dhondt_shards
    FROM ham LEFT JOIN dh ON ham.source = dh.source
    ORDER BY ham.source
    """,
)
def shard_apportionment_sources(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Apportion a fixed 64-shard (_APPORTION_SHARDS) training budget
    across sources by BOTH classical methods — Hamilton largest
    remainder (exactly proportional bases + remainder-ranked top-ups)
    and D'Hondt highest averages (the divisor method that slightly
    favors large sources and is immune to the Alabama paradox). The
    two columns disagreeing on a source is the apportionment-theory
    fact every quota-based sampler eventually trips over; surfacing
    both makes the choice explicit instead of accidental.

    Exactness: FULLY integer — Hamilton remainders are exact modular
    arithmetic with a (remainder, source) ROW_NUMBER top-up; D'Hondt
    quotients n/k become n * (lcm(1..64) DIV k) (64 = _APPORTION_SHARDS)
    — k
    divides the lcm, so every quotient is an exact 128-bit integer and the global quotient
    ranking is a pure integer sort (no double ever compares).

    Scale: one corpus pass to the |sources| inventory; the quotient
    grid is |sources| x 64 (_APPORTION_SHARDS) rows.
    """
    d = load_table(spark, sf_dir, "documents")
    inv = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    ).localCheckpoint()  # read by both methods
    tot = inv.agg(F.sum("n").cast("bigint").alias("nn"))
    s = _APPORTION_SHARDS
    ham0 = inv.crossJoin(F.broadcast(tot)).select(
        "source",
        "n",
        F.expr(f"CAST({s} * n DIV nn AS BIGINT)").alias("base"),
        F.expr(
            f"CAST({s} * n - ({s} * n DIV nn) * nn AS BIGINT)"
        ).alias("rem"),
    )
    hleft = ham0.agg(
        (F.lit(s) - F.sum("base")).cast("bigint").alias("l")
    )
    wrem = Window.orderBy(F.desc("rem"), "source")
    ham = ham0.crossJoin(F.broadcast(hleft)).select(
        "source",
        "n",
        (
            F.col("base")
            + F.when(
                F.row_number().over(wrem) <= F.col("l"), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("hamilton_shards"),
    )
    # Spark's DIV returns LONG and the 28-digit lcm wraps it — the
    # per-k exact divisors are precomputed in Python and shipped as
    # decimal literals (k | lcm, so each is exact)
    ks = spark.createDataFrame(
        [(k, str(_LCM_1_64 // k)) for k in range(1, s + 1)],
        "k2 int, lcm_div_k string",
    ).select("k2", F.col("lcm_div_k").cast("decimal(38,0)").alias("w"))
    quo = inv.crossJoin(F.broadcast(ks)).select(
        "source",
        F.expr("CAST(n AS DECIMAL(38,0)) * w").alias("q"),
    )
    wq = Window.orderBy(F.desc("q"), "source")
    dh = (
        quo.select("source", F.row_number().over(wq).alias("rk"))
        .filter(F.col("rk") <= s)
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("dhondt_shards"))
    )
    return (
        ham.join(dh, "source", "left")
        .select(
            "source",
            F.col("n").alias("n_docs"),
            "hamilton_shards",
            F.coalesce("dhondt_shards", F.lit(0))
            .cast("bigint")
            .alias("dhondt_shards"),
        )
        .orderBy("source")
    )
