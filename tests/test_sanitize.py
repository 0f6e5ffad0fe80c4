"""Unit + property tests for the sanitation pipeline (A6-A10) — pure
functions, no Spark. The fixture below reproduces the SHAPE of the
reference's captured failure (error_query.sql: an LLM response whose
surrounding prose got executed verbatim, MySQL error 1064) without
copying its text."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ai_etl_studio_spark.sqlgen.sanitize import (
    extract_sql,
    has_limit,
    inject_limit,
    is_read_only,
    sanitize,
    slice_from_select,
    strip_semicolons,
)

# Shape-replica of the reference failure artifact: prose + fenced SQL with
# user-variable emulation + trailing prose. (error_query.sql:1-47 shape.)
LLM_RESPONSE_WITH_PROSE = """Since window functions are unavailable, we can emulate
ranking with session variables as shown below:

```sql
SELECT store_id, customer_id, total_spent
FROM (
  SELECT s.store_id, s.customer_id, SUM(s.sold_price) AS total_spent,
         @rn := IF(@prev = s.store_id, @rn + 1, 1) AS rn,
         @prev := s.store_id
  FROM sales s
  GROUP BY s.store_id, s.customer_id
  ORDER BY s.store_id, total_spent DESC
) ranked
WHERE rn <= 3;
```

This approach works on older servers without window support."""


class TestFenceExtraction:
    def test_prefers_sql_fence(self):
        out = extract_sql(LLM_RESPONSE_WITH_PROSE)
        assert out.startswith("SELECT store_id")
        assert "older servers" not in out
        assert "emulate" not in out

    def test_any_fence_fallback(self):
        assert extract_sql("text\n```\nSELECT 1\n```\nmore") == "SELECT 1"

    def test_raw_text_fallback(self):
        assert extract_sql("  SELECT 2  ") == "SELECT 2"


class TestSemicolonAndSlice:
    def test_strip_semicolons_kills_stacking(self):
        assert ";" not in strip_semicolons("SELECT 1; DROP TABLE t;")

    def test_slice_from_select_drops_prose(self):
        s = slice_from_select("The best query is SELECT a FROM t")
        assert s == "SELECT a FROM t"

    def test_slice_keeps_with(self):
        s = "WITH x AS (SELECT 1) SELECT * FROM x"
        assert slice_from_select(s) == s

    def test_no_select_passthrough(self):
        assert slice_from_select("no sql here") == "no sql here"


class TestLimit:
    def test_injects_when_missing(self):
        assert inject_limit("SELECT a FROM t") == "SELECT a FROM t LIMIT 100"

    def test_respects_existing(self):
        assert inject_limit("SELECT a FROM t LIMIT 5") == "SELECT a FROM t LIMIT 5"


class TestReadOnly:
    def test_select_ok(self):
        assert is_read_only("SELECT 1")
        assert is_read_only("WITH x AS (SELECT 1) SELECT * FROM x")

    def test_ddl_dml_rejected(self):
        for sql in [
            "DROP TABLE t",
            "INSERT INTO t VALUES (1)",
            "DELETE FROM t",
            "CREATE TABLE t (a INT)",
            "UPDATE t SET a = 1",
            "TRUNCATE TABLE t",
        ]:
            assert not is_read_only(sql), sql

    def test_verb_inside_literal_ok(self):
        assert is_read_only("SELECT 'DROP TABLE t' AS msg")


class TestEndToEnd:
    def test_reference_failure_shape_now_sanitizes(self):
        s = sanitize(LLM_RESPONSE_WITH_PROSE)
        assert s.ok
        assert s.sql.startswith("SELECT store_id")
        assert ";" not in s.sql
        assert has_limit(s.sql)  # injected (fixture had none)

    def test_garbage_is_error(self):
        s = sanitize("I cannot help with that.")
        assert not s.ok and s.error

    def test_ddl_is_error(self):
        s = sanitize("```sql\nDROP TABLE customer\n```")
        assert not s.ok


# ------------------------- property-based (SURVEY §5.3) -------------------------

sql_ish = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=300
)


@settings(max_examples=200, deadline=None)
@given(sql_ish)
def test_sanitize_total_function(text):
    """sanitize never raises; ok=True implies LIMIT present and a
    read-only statement head."""
    s = sanitize(text)
    if s.ok:
        assert has_limit(s.sql)
        assert is_read_only(s.sql)
        assert ";" not in s.sql


@settings(max_examples=200, deadline=None)
@given(sql_ish, st.integers(min_value=1, max_value=10_000))
def test_limit_injection_idempotent(text, n):
    once = inject_limit(text, n)
    assert inject_limit(once, n) == once
    assert has_limit(once)
