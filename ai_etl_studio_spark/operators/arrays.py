"""Array / higher-order / regex / null-handling scalar surface.

SURVEY §2B's scalar-function row records that the reference's spec uses
only string equality (prompts.py — no LIKE/CONCAT/SUBSTR/array/json
functions anywhere), and names Spark's full scalar library as the
extension surface. These operators exercise that surface — the pieces a
training-data pipeline leans on hardest: array manipulation over
embedding columns, higher-order lambdas, regex extraction, NULL
discipline, and multi-grain GROUPING SETS.

All JVM-side built-ins (whole-stage codegen) — no Python in the data
plane. All oracle-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_etl_studio_spark.catalog import load_table
from ai_etl_studio_spark.functions.exact import cents
from ai_etl_studio_spark.operators import register

ARR_ID_CAP = 500  # bound per-row array outputs for the oracle run


@register(
    "array_functions",
    oracle=f"""
    SELECT vec_id,
           len(embedding) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
           ROUND(CAST(embedding[len(embedding)] AS DOUBLE), 6) AS last_elem,
           ROUND(list_sum(CAST(list_slice(embedding, 1, 4) AS DOUBLE[])), 6)
             AS head4_sum
    FROM embeddings
    WHERE vec_id < {ARR_ID_CAP}
    ORDER BY vec_id
    """,
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core array ops over the embedding column: size, element_at
    (1-based, both engines), slice, element sum.

    Scale: all narrow, codegen'd, zero shuffle — the shape of any
    per-vector featurization pass.
    """
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < ARR_ID_CAP)
    head4 = F.slice("embedding", 1, 4)
    return (
        e.select(
            "vec_id",
            F.size("embedding").alias("dim"),
            F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_elem"),
            F.round(
                F.element_at("embedding", F.size("embedding")).cast("double"), 6
            ).alias("last_elem"),
            F.round(
                F.aggregate(
                    head4, F.lit(0.0), lambda acc, x: acc + x.cast("double")
                ),
                6,
            ).alias("head4_sum"),
        )
        .orderBy("vec_id")
    )


@register(
    "higher_order_functions",
    oracle=f"""
    SELECT vec_id,
           len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0)) AS n_pos,
           ROUND(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                         x -> x * x)), 6) AS sum_sq,
           ROUND(list_max(CAST(embedding AS DOUBLE[])), 6) AS max_elem,
           CAST(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                x -> CASE WHEN abs(x) > 1.0 THEN 1.0 ELSE 0.0 END)) > 0
                AS BOOLEAN) AS any_large
    FROM embeddings
    WHERE vec_id < {ARR_ID_CAP}
    ORDER BY vec_id
    """,
)
def higher_order_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order lambdas — filter / transform / aggregate / exists —
    the JVM-side alternative to a Python UDF for per-vector math.

    ``sum_sq`` uses the same sequential left-fold as DuckDB's list_sum
    over DOUBLE[] so the float accumulation is bit-identical; outputs
    rounded to 6dp regardless.
    """
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < ARR_ID_CAP)
    emb = F.transform("embedding", lambda x: x.cast("double"))
    return (
        e.select(
            "vec_id",
            F.size(F.filter(emb, lambda x: x > 0)).alias("n_pos"),
            F.round(
                F.aggregate(
                    F.transform(emb, lambda x: x * x),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("sum_sq"),
            F.round(F.array_max(emb), 6).alias("max_elem"),
            F.exists(emb, lambda x: F.abs(x) > 1.0).alias("any_large"),
        )
        .orderBy("vec_id")
    )


@register(
    "regex_functions",
    oracle="""
    SELECT source,
           CAST(regexp_extract(source, '([a-z]+)([0-9]+)', 2) AS BIGINT)
             AS source_num,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN regexp_matches(text, '\\bspark\\b') THEN 1 ELSE 0 END)
             AS BIGINT) AS n_mention_spark,
           MIN(regexp_extract(text, '^([a-z]+)', 1)) AS min_first_word
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def regex_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract / regexp_like over the documents table — group
    capture, word-boundary match, anchored extract.

    Scale: regex runs codegen'd per row; at 100 TB prefer anchored or
    literal-prefix patterns (no catastrophic backtracking) and push the
    cheap filters first.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("text").rlike(r"\bspark\b"), 1).otherwise(0)
            ).alias("n_mention_spark"),
            F.min(F.regexp_extract("text", r"^([a-z]+)", 1)).alias("min_first_word"),
        )
        .select(
            "source",
            F.regexp_extract("source", r"([a-z]+)([0-9]+)", 2)
            .cast("bigint")
            .alias("source_num"),
            "n_docs",
            "n_mention_spark",
            "min_first_word",
        )
        .orderBy("source")
    )


@register(
    "null_handling",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           COUNT(NULLIF(l_discount, 0.0)) AS n_discounted,
           CAST(SUM(CAST(round(COALESCE(NULLIF(l_discount, 0.0), 0.05) * 100, 0)
                         AS BIGINT)) AS DOUBLE) / 100 AS eff_discount_sum,
           CAST(SUM(CASE WHEN NULLIF(l_tax, 0.0) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_tax
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL discipline: NULLIF / COALESCE / IS NULL / COUNT's null-skip.

    NULLIF(discount, 0) models 'treat zero as missing'; COALESCE
    backfills a default; COUNT(expr) counts only non-nulls — semantics
    identical across engines and central to any cleaning pipeline.
    """
    li = load_table(spark, sf_dir, "lineitem")
    eff = F.coalesce(F.nullif(F.col("l_discount"), F.lit(0.0)), F.lit(0.05))
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.nullif(F.col("l_discount"), F.lit(0.0))).alias("n_discounted"),
            (F.sum(cents(eff)).cast("double") / 100).alias("eff_discount_sum"),
            F.sum(
                F.when(F.nullif(F.col("l_tax"), F.lit(0.0)).isNull(), 1).otherwise(0)
            ).alias("n_zero_tax"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "grouping_sets_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE) / 100
             AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind rollup/cube) via
    the SQL surface — (flag, status), (flag), and grand total in one
    pass.

    Scale: like rollup, the expansion happens after partial aggregation,
    so the shuffle carries #distinct-groups × #sets, not #rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               grouping(l_returnflag) * 2 + grouping(l_linestatus) AS gid,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE) / 100
                 AS sum_qty
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
        """
    )


@register(
    "posexplode_ordinal",
    oracle=r"""
    SELECT d.doc_id, CAST(i.i - 1 AS INT) AS pos, d.toks[i.i] AS term
    FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
          FROM documents WHERE doc_id < 20) d,
         unnest(generate_series(1, len(d.toks))) AS i(i)
    ORDER BY d.doc_id, pos
    """,
)
def posexplode_ordinal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-generating function with ordinal: posexplode ≡ SQL
    ``LATERAL ... WITH ORDINALITY`` — token stream with positions,
    the primitive under positional n-grams and sequence labeling.

    Scale: Generate is narrow (no shuffle); the blow-up factor is
    tokens-per-doc, so downstream ops should aggregate or filter
    before any exchange (cf. bm25_search, which avoids the explode
    entirely because its term set is fixed)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.filter(F.col("doc_id") < 20)
        .select(
            "doc_id",
            F.posexplode(F.split(F.lower(F.col("text")), r"\s+")).alias(
                "pos", "term"
            ),
        )
        .orderBy("doc_id", "pos")
    )


@register(
    "map_struct_functions",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(k_val) AS BIGINT) AS sum_k,
           CAST(SUM(n_keys) AS BIGINT) AS sum_nkeys,
           MAX(first_key) AS max_first_key,
           CAST(SUM(2 * k_val) AS BIGINT) AS sum_2k
    FROM (
        SELECT event_type,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
               1 AS n_keys,
               'k' AS first_key
        FROM events
    ) t
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def map_struct_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType / StructType surface: from_json to map<string,bigint>,
    element_at, size, map_keys, map_from_arrays, and struct field
    access — the semi-structured column toolkit (SURVEY §2B scalar row
    names json access as the extension; the reference never parses
    props, db_utils.py:165 ships rows opaque).

    The oracle computes the same final scalars via DuckDB json
    functions, so the hash verifies Spark's map path end to end.

    Scale: all narrow codegen'd expressions before one hash-agg
    shuffle on event_type — from_json runs once per row (Jackson,
    JVM-side), never a Python UDF."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.from_json("props", "map<string,bigint>").alias("m"),
    ).select(
        "event_type",
        F.element_at("m", F.lit("k")).alias("k_val"),
        F.size("m").alias("n_keys"),
        F.element_at(F.map_keys("m"), 1).alias("first_key"),
        F.struct(F.col("m").alias("inner")).alias("s"),
    )
    doubled = parsed.select(
        "event_type",
        "k_val",
        "n_keys",
        "first_key",
        F.map_from_arrays(
            F.array(F.lit("double_k")),
            F.array(F.element_at(F.col("s.inner"), F.lit("k")) * 2),
        ).alias("m2"),
    ).select(
        "event_type",
        "k_val",
        "n_keys",
        "first_key",
        F.element_at("m2", F.lit("double_k")).alias("k2"),
    )
    return (
        doubled.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k_val").alias("sum_k"),
            F.sum("n_keys").cast("bigint").alias("sum_nkeys"),
            F.max("first_key").alias("max_first_key"),
            F.sum("k2").alias("sum_2k"),
        )
        .orderBy("event_type")
    )
