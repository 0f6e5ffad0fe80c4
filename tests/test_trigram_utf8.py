"""UTF-8 guard for the lang_trigram_divergence Arrow kernel (r12,
verdict item 8): byte-trigram codes equal character trigrams only on
pure-ASCII rows, so rows carrying any byte >= 0x80 must fall back to
exact code-point trigrams — proven here by Spark-vs-DuckDB equality on
a corpus that mixes ASCII rows (the vectorized fast path) with
multibyte rows (accented Latin, CJK, and an emoji astral-plane code
point) inside the SAME language feeds."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from ai_etl_studio_spark.operators import load_all

QUERIES, ORACLES = load_all()


def test_lang_trigram_divergence_non_ascii_rows_match_oracle(spark, tmp_path):
    d = str(tmp_path)
    texts = [
        ("en", "the quick brown fox jumps over the lazy dog"),
        ("en", "plain ascii text only here"),
        ("fr", "le déjeuner est prêt à midi"),  # é ê à
        ("fr", "une phrase simple sans accent"),
        ("zh", "中文文本的三字组"),  # CJK
        ("de", "straße und größe"),  # ß ö
        ("de", "kurz"),
        ("emoji", "ab\U0001f600cd\U0001f600ef"),  # astral plane
        ("en", "sh"),  # < 3 chars: filtered in both engines
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "lang": [t[0] for t in texts],
                "text": [t[1] for t in texts],
            }
        ),
        f"{d}/documents.parquet",
    )
    got = sorted(
        (r.lang_1, r.lang_2, r.n_shared_grams, r.jsd_nanonats)
        for r in QUERIES["lang_trigram_divergence"](spark, d).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    want = sorted(tuple(r) for r in con.execute(
        ORACLES["lang_trigram_divergence"]
    ).fetchall())
    assert got == want
    # sanity: the multibyte rows actually contributed grams (the fr/zh
    # counts are not ASCII-only artifacts)
    assert any(r[0] == "en" and r[1] == "fr" for r in got)
    assert any("zh" in (r[0], r[1]) for r in got)
