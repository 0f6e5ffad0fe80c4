"""Engine lifecycle tests: run_query end-to-end against the Spark catalog
(the reference's app.py:288-302 path with Catalyst as the engine)."""

from __future__ import annotations

import pytest

from ai_etl_studio_spark.catalog import register_tables
from ai_etl_studio_spark.engine import dedupe_column_names, run_query
from tests.conftest import SF_DIR


@pytest.fixture(scope="module", autouse=True)
def _tables(spark):
    register_tables(spark, SF_DIR)


class TestRunQuery:
    def test_fenced_llm_output_executes(self, spark):
        r = run_query(
            spark,
            "Sure!\n```sql\nSELECT c_mktsegment, count(*) AS n FROM customer "
            "GROUP BY c_mktsegment ORDER BY n DESC;\n```\nEnjoy.",
        )
        assert r.ok
        assert r.sql.endswith("LIMIT 100")
        assert r.df.count() == 5

    def test_prose_leak_sliced(self, spark):
        r = run_query(
            spark, "We should SELECT c_name FROM customer ORDER BY c_acctbal DESC LIMIT 5"
        )
        assert r.ok and r.df.count() == 5

    def test_drop_rejected_and_table_intact(self, spark):
        r = run_query(spark, "```sql\nDROP TABLE customer;\n```")
        assert not r.ok
        assert spark.table("customer").count() > 0

    def test_stacked_statements_neutralized(self, spark):
        r = run_query(spark, "SELECT 1 AS x; DROP TABLE customer")
        assert not r.ok  # semicolon strip makes it a parse error, not a DROP
        assert spark.table("customer").count() > 0

    def test_create_sliced_to_inner_select(self, spark):
        # the A8 slice extracts the inner SELECT — CTAS never reaches the
        # engine; nothing is created
        r = run_query(spark, "CREATE TABLE pwned AS SELECT 1 AS x")
        assert r.ok and r.sql.startswith("SELECT 1")
        assert "pwned" not in [t.name for t in spark.catalog.listTables()]

    def test_plan_guard_rejects_command_without_sanitizer(self, spark):
        # bypass the textual pipeline: the parsed-plan gate must still
        # reject Command nodes before spark.sql executes them
        r = run_query(spark, "CREATE TABLE pwned AS SELECT 1 AS x", sanitize_input=False)
        assert not r.ok
        assert "pwned" not in [t.name for t in spark.catalog.listTables()]

    def test_error_relation_presentation(self, spark):
        r = run_query(spark, "complete gibberish")
        out = r.presentation(spark)
        assert out.columns == ["error_message"]
        assert out.count() == 1

    def test_analysis_error_to_error_relation(self, spark):
        r = run_query(spark, "SELECT not_a_column FROM customer")
        assert not r.ok and "AnalysisException" in r.error

    def test_limit_not_double_injected(self, spark):
        r = run_query(spark, "SELECT c_custkey FROM customer LIMIT 7")
        assert r.ok and r.df.count() == 7
        assert r.sql.count("LIMIT") == 1


class TestDedupeColumns:
    def test_rename_suffixes(self, spark):
        df = spark.sql("SELECT 1 AS a, 2 AS a, 3 AS a, 4 AS b")
        out = dedupe_column_names(df)
        assert out.columns == ["a", "a_1", "a_2", "b"]

    def test_noop_when_unique(self, spark):
        df = spark.sql("SELECT 1 AS a, 2 AS b")
        assert dedupe_column_names(df).columns == ["a", "b"]

    def test_idempotent(self, spark):
        df = spark.sql("SELECT 1 AS a, 2 AS a")
        once = dedupe_column_names(df)
        assert dedupe_column_names(once).columns == once.columns


class TestGenerator:
    def test_template_topn_products_end_to_end(self, spark):
        from ai_etl_studio_spark.sqlgen.generator import TemplateGenerator, generate_and_run

        r = generate_and_run(spark, TemplateGenerator(), "show me the top 10 products by sales")
        assert r.ok
        rows = r.df.collect()
        assert len(rows) == 10
        assert rows[0].revenue >= rows[-1].revenue

    def test_template_topn_per_nation_uses_window(self, spark):
        from ai_etl_studio_spark.sqlgen.generator import TemplateGenerator, generate_and_run

        r = generate_and_run(spark, TemplateGenerator(), "top 3 customers per nation")
        assert r.ok
        df = r.df
        assert "rn" in df.columns
        assert df.groupBy("n_name").count().agg({"count": "max"}).collect()[0][0] <= 3

    def test_no_template_is_error_relation(self, spark):
        from ai_etl_studio_spark.sqlgen.generator import TemplateGenerator, generate_and_run

        r = generate_and_run(spark, TemplateGenerator(), "what is the meaning of life")
        assert not r.ok
        assert r.presentation(spark).columns == ["error_message"]

    def test_llm_adapter_pipes_through_sanitizer(self, spark):
        from ai_etl_studio_spark.sqlgen.generator import LLMGenerator, generate_and_run

        def fake_llm(system_prompt: str, question: str) -> str:
            assert "Spark SQL" in system_prompt
            return "Here you go:\n```sql\nSELECT count(*) AS n FROM orders;\n```"

        gen = LLMGenerator(complete=fake_llm, schema_desc="TABLE orders (...)")
        r = generate_and_run(spark, gen, "how many orders?")
        assert r.ok and r.df.collect()[0].n > 0


class TestCatalogPromptRender:
    def test_schema_snapshot_and_render(self, spark):
        from ai_etl_studio_spark.catalog import render_schema_for_prompt, schema_snapshot

        snap = schema_snapshot(spark, ("customer", "orders"))
        assert snap["customer"][0] == ("c_custkey", "bigint")
        text = render_schema_for_prompt(snap)
        assert 'TABLE "customer" (columns: c_custkey bigint' in text


class TestSinks:
    def test_csv_bytes_bounded(self, spark):
        from ai_etl_studio_spark.sources.writers import to_csv_bytes

        data = to_csv_bytes(spark.table("customer"), limit=10)
        lines = data.decode().strip().splitlines()
        assert len(lines) == 11  # header + 10 rows
        assert lines[0].startswith("c_custkey")

    def test_csv_roundtrip(self, spark, tmp_path):
        from ai_etl_studio_spark.sources.readers import read_csv
        from ai_etl_studio_spark.sources.writers import write_csv

        out = str(tmp_path / "csv_out")
        write_csv(spark.table("nation"), out)
        back = read_csv(spark, out, "n_nationkey int, n_name string, n_regionkey int")
        assert back.count() == 25

    def test_partitioned_parquet_prunes(self, spark, tmp_path):
        from ai_etl_studio_spark.sources.writers import write_parquet

        out = str(tmp_path / "part_out")
        write_parquet(spark.table("customer"), out, partition_by=["c_mktsegment"])
        one = spark.read.parquet(out).filter("c_mktsegment = 'BUILDING'")
        plan = one._jdf.queryExecution().executedPlan().toString()
        assert one.count() > 0
        # partition pruning: only one partition dir read
        assert "PartitionFilters: [isnotnull(c_mktsegment" in plan


class TestObservedResult:
    def test_metrics_ride_the_result_action(self, spark):
        """observed_result returns single-pass QA counters: row_count +
        per-column non-null counts land in the Observation after the
        SAME action that materializes the result (CollectMetrics node,
        no second job over the plan)."""
        from ai_etl_studio_spark.engine import observed_result, run_query

        res = run_query(
            spark,
            "SELECT n_name, CASE WHEN n_nationkey < 5 THEN n_regionkey END AS r "
            "FROM nation",
        )
        assert res.ok
        df, ob = observed_result(res.df, "qa")
        rows = df.collect()
        m = ob.get
        assert m["row_count"] == len(rows) == 25
        assert m["nonnull_n_name"] == 25
        assert m["nonnull_r"] == 5
        assert "CollectMetrics" in df._jdf.queryExecution().executedPlan().toString()


def test_templates_reach_extension_surface(spark):
    """The NL front-end answers over the training-data tables too: the
    extension templates run end-to-end through sanitize + the read-only
    gate and return the expected shapes."""
    from ai_etl_studio_spark.catalog import register_tables
    from ai_etl_studio_spark.sqlgen.generator import (
        TemplateGenerator,
        generate_and_run,
    )

    register_tables(spark, "/root/testdata/sf0.001")
    g = TemplateGenerator()
    dup = generate_and_run(spark, g, "find duplicate documents")
    assert dup.ok and dup.df.columns == ["norm_text_hash", "keep_doc_id", "n_copies"]
    top = generate_and_run(spark, g, "top 7 tokens")
    assert top.ok and top.df.count() == 7
    lang = generate_and_run(spark, g, "documents per language")
    assert lang.ok
    rows = lang.df.collect()
    assert len(rows) == 5 and all(r.n_docs > 0 for r in rows)


def test_templates_reach_analytics_surface(spark):
    """Round-3 templates: cohort retention, conversion funnel, and the
    shard manifest all run end-to-end through sanitize + the read-only
    gate, and the funnel is monotonically narrowing."""
    from ai_etl_studio_spark.catalog import register_tables
    from ai_etl_studio_spark.sqlgen.generator import (
        TemplateGenerator,
        generate_and_run,
    )

    register_tables(spark, "/root/testdata/sf0.001")
    g = TemplateGenerator()

    ret = generate_and_run(spark, g, "show retention by first-order month")
    assert ret.ok and ret.df.columns == ["cohort_month", "month_offset", "n_active"]
    assert ret.df.count() > 0

    fun = generate_and_run(spark, g, "show me the conversion funnel")
    rows = {r.stage: r.n_users for r in fun.df.collect()}
    assert fun.ok and list(rows) == ["1_view", "2_click", "3_purchase"]
    assert rows["1_view"] >= rows["2_click"] >= rows["3_purchase"]

    sh = generate_and_run(spark, g, "documents per shard")
    assert sh.ok and sh.df.columns == ["shard", "n_docs", "n_chars"]


def test_templates_reach_curation_surface(spark):
    """Round-3 curation/insight templates: boilerplate lines, A/B
    readout, referential-integrity orphans, and event transitions run
    end-to-end through sanitize + the read-only gate."""
    from ai_etl_studio_spark.catalog import register_tables
    from ai_etl_studio_spark.sqlgen.generator import (
        TemplateGenerator,
        generate_and_run,
    )

    register_tables(spark, "/root/testdata/sf0.001")
    g = TemplateGenerator()

    bp = generate_and_run(spark, g, "which boilerplate lines repeat across documents")
    assert bp.ok and bp.df.columns == ["line", "n_docs"]
    assert all(r.n_docs >= 2 for r in bp.df.collect())

    ab = generate_and_run(spark, g, "show the a/b test result")
    rows = {r.variant: r for r in ab.df.collect()}
    assert ab.ok and set(rows) == {0, 1} and all(r.n > 0 for r in rows.values())

    ri = generate_and_run(spark, g, "check referential integrity")
    assert ri.ok
    orphans = {r.fk: r.n_orphans for r in ri.df.collect()}
    assert orphans == {"lineitem->orders": 0, "orders->customer": 0}

    tr = generate_and_run(spark, g, "show event transitions")
    assert tr.ok and tr.df.columns == ["src", "dst", "n"]
    assert tr.df.count() > 0


class TestRunParameterized:
    """r10: named-parameter binding (spark.sql args) — values can never
    alter statement structure, and the guard vets the TEMPLATE."""

    def test_binds_and_matches_literal_query(self, spark):
        from ai_etl_studio_spark.engine import run_parameterized

        register_tables(spark, "/root/testdata/sf0.001")
        r = run_parameterized(
            spark,
            "SELECT count(*) AS n FROM customer WHERE c_mktsegment = :seg",
            {"seg": "BUILDING"},
        )
        assert r.ok
        lit = spark.sql(
            "SELECT count(*) AS n FROM customer"
            " WHERE c_mktsegment = 'BUILDING'"
        ).collect()[0]["n"]
        assert r.df.collect()[0]["n"] == lit > 0

    def test_hostile_binding_stays_a_literal(self, spark):
        from ai_etl_studio_spark.engine import run_parameterized

        register_tables(spark, "/root/testdata/sf0.001")
        r = run_parameterized(
            spark,
            "SELECT count(*) AS n FROM customer WHERE c_mktsegment = :seg",
            {"seg": "BUILDING' OR '1'='1"},
        )
        # the whole injection string is one 19-char literal: no row has
        # that segment, and the statement structure is untouched
        assert r.ok and r.df.collect()[0]["n"] == 0

    def test_ddl_template_rejected_before_binding(self, spark):
        from ai_etl_studio_spark.engine import run_parameterized

        register_tables(spark, "/root/testdata/sf0.001")
        r = run_parameterized(
            spark, "DROP TABLE customer", {"seg": "x"}
        )
        assert not r.ok and "only SELECT" in r.error
        assert spark.sql("SELECT count(*) FROM customer").collect()[0][0] > 0

    def test_missing_binding_surfaces_as_error_relation(self, spark):
        from ai_etl_studio_spark.engine import run_parameterized

        register_tables(spark, "/root/testdata/sf0.001")
        r = run_parameterized(
            spark,
            "SELECT count(*) AS n FROM customer WHERE c_mktsegment = :seg",
            {},
        )
        assert not r.ok and r.df is None
        pres = r.presentation(spark)
        assert pres.columns == ["error_message"]


def test_templates_reach_round10_surface(spark):
    """r10: the NL path reaches the demand-classification and
    burstiness surfaces, and agrees with the registered operators."""
    from ai_etl_studio_spark.operators import load_all
    from ai_etl_studio_spark.sqlgen.generator import (
        TemplateGenerator,
        generate_and_run,
    )

    QUERIES, _ = load_all()
    register_tables(spark, "/root/testdata/sf0.001")
    g = TemplateGenerator()

    dc = generate_and_run(spark, g, "classify demand by part type")
    assert dc.ok and dc.df.columns == ["part_type", "demand_class"]
    want = {
        r.part_type: r.demand_class
        for r in QUERIES["demand_classification_adi_cv2"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    got = {r.part_type: r.demand_class for r in dc.df.collect()}
    assert got == want

    fano = generate_and_run(spark, g, "how bursty are the events?")
    assert fano.ok and fano.df.columns == [
        "n_windows",
        "n_events",
        "fano_micro",
    ]
    op = {
        r.window_seconds: r.fano_micro
        for r in QUERIES["fano_factor_event_windows"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert fano.df.collect()[0]["fano_micro"] == op[3600]
