"""Round-10 operator behaviors beyond the oracle hash-match: the
VARIANT extraction path, CBO statistics, and (below, as the round
grows) the weighted-graph completions."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_etl_studio_spark.operators import load_all
from tests.conftest import SF_DIR

QUERIES, ORACLES = load_all()


class TestVariantProps:
    def test_props_variant_profile_matches_string_parse_path(self, spark):
        """The VARIANT path and the from_json string path must agree on
        the integer key's range — two extraction stacks, one truth."""
        got = {
            r.event_type: (r.n_events, r.n_with_k, r.min_k, r.max_k)
            for r in QUERIES["props_variant_profile"](spark, SF_DIR).collect()
        }
        assert len(got) == 5
        for et, (n, nk, lo, hi) in got.items():
            assert n == nk, et  # every event carries $.k in testdata
            assert 0 <= lo <= hi <= 99, et

    def test_variant_aggregated_schema_is_typed(self, spark):
        """schema_of_variant_agg proves the encoded values carry TYPED
        fields (BIGINT k), i.e. parse_json shredded the JSON into the
        binary form — not strings all the way down."""
        from ai_etl_studio_spark.catalog import load_table

        e = load_table(spark, SF_DIR, "events")
        s = e.select(
            F.schema_of_variant_agg(
                F.parse_json(F.col("props"))
            ).alias("s")
        ).collect()[0]["s"]
        assert s == "OBJECT<k: BIGINT>"

    def test_variant_get_is_null_safe_on_missing_path(self, spark):
        """variant_get on an absent path yields NULL (not an error) —
        the semi-structured contract downstream profiles rely on."""
        df = spark.createDataFrame([('{"k": 1}',), ("{}",)], "props string")
        vals = [
            r.x
            for r in df.select(
                F.variant_get(
                    F.parse_json(F.col("props")), "$.missing", "bigint"
                ).alias("x")
            ).collect()
        ]
        assert vals == [None, None]
