"""Deterministic synthetic corpus generator for width-certification
runs above the driver testdata's largest SF (r10 verdict item 3).

The driver ships sf{0.001,0.01,0.1}; two 64-bit overflows passed
sf0.01 and were only caught at sf0.1 (SCALE.md round-10 notes), and
the decimal(38,0) power-sum family documents magnitudes within ~1e5 of
the 1e38 ceiling at sf0.1 — so the width-risk ops need a rung ABOVE
the shipped ladder. This tool synthesizes orders/lineitem/customer
(+ the tiny dims copied from the source corpus) at any SF into a
scratch directory, with the SAME schema and value RANGES as the
driver corpus (TPC-H-ish), so both engines of every registered op run
unchanged against it via ``tools/driver_sim.py <out_dir> <names>``.

Determinism: every column derives from ``xxhash64`` of the row id and
a column tag — no RNG state, no partitioning dependence; the same
(sf, out_dir) always writes byte-identical values.

Usage:
  python tools/gen_scale_corpus.py /tmp/sfX 1.0 [table ...]

Never writes under /root/testdata (TESTDATA.md forbids it).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/root/testdata/sf0.1"  # dims copied verbatim (nation/region)

PRIORITIES = (
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
)
SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")


def main() -> int:
    out = sys.argv[1]
    sf = float(sys.argv[2])
    only = set(sys.argv[3:])
    if os.path.realpath(out).startswith("/root/testdata"):
        raise SystemExit("refusing to write under /root/testdata")

    from pyspark.sql import functions as F

    from ai_etl_studio_spark.session import get_spark

    spark = get_spark(app_name="gen-scale-corpus")
    spark.sparkContext.setLogLevel("ERROR")

    n_cust = int(150_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_part = int(200_000 * sf)
    n_supp = int(10_000 * sf)
    os.makedirs(out, exist_ok=True)

    def h(tag: str, col: str = "id") -> str:
        # non-negative 64-bit hash of (row id, tag); pmod below keeps
        # every derivation in range
        return f"xxhash64(CAST({col} AS STRING), '{tag}')"

    def want(t: str) -> bool:
        return not only or t in only

    if want("customer"):
        spark.range(1, n_cust + 1).selectExpr(
            "id AS c_custkey",
            "concat('Customer#', lpad(CAST(id AS STRING), 9, '0')) AS c_name",
            f"CAST(pmod({h('cnat')}, 25) AS INT) AS c_nationkey",
            f"CAST((pmod({h('cbal')}, 1100000) - 100000) / 100.0"
            " AS DOUBLE) AS c_acctbal",
            "element_at(array"
            + str(SEGMENTS)
            + f", CAST(pmod({h('cseg')}, 5) + 1 AS INT)) AS c_mktsegment",
        ).coalesce(max(1, int(sf))).write.mode("overwrite").parquet(
            f"{out}/customer.parquet"
        )
        print(f"customer: {n_cust}")

    if want("orders"):
        spark.range(1, n_ord + 1).selectExpr(
            "id AS o_orderkey",
            f"CAST(pmod({h('ocust')}, {n_cust}) + 1 AS BIGINT) AS o_custkey",
            f"element_at(array('O','F','P'), CAST(pmod({h('ostat')}, 3) + 1"
            " AS INT)) AS o_orderstatus",
            f"CAST((pmod({h('oprice')}, 54910001) + 90000) / 100.0"
            " AS DOUBLE) AS o_totalprice",
            f"CAST(date_add(DATE '1992-01-01', CAST(pmod({h('odate')}, 2406)"
            " AS INT)) AS TIMESTAMP) AS o_orderdate",
            "element_at(array"
            + str(PRIORITIES)
            + f", CAST(pmod({h('oprio')}, 5) + 1 AS INT)) AS o_orderpriority",
        ).coalesce(max(1, int(4 * sf))).write.mode("overwrite").parquet(
            f"{out}/orders.parquet"
        )
        print(f"orders: {n_ord}")

    if want("lineitem"):
        # 1..7 lines per order (avg 4, matching the corpus ratio);
        # l_linenumber is the true within-order sequence
        spark.range(1, n_ord + 1).selectExpr(
            "id AS o_orderkey",
            f"CAST(date_add(DATE '1992-01-01', CAST(pmod({h('odate')}, 2406)"
            " AS INT)) AS TIMESTAMP) AS o_orderdate",
            f"CAST(pmod({h('lcnt')}, 7) + 1 AS INT) AS n_lines",
        ).selectExpr(
            "o_orderkey", "o_orderdate",
            "explode(sequence(1, n_lines)) AS l_linenumber",
        ).selectExpr(
            "o_orderkey AS l_orderkey",
            f"CAST(pmod(xxhash64(CAST(o_orderkey AS STRING),"
            f" CAST(l_linenumber AS STRING), 'lpart'), {n_part}) + 1"
            " AS BIGINT) AS l_partkey",
            f"CAST(pmod(xxhash64(CAST(o_orderkey AS STRING),"
            f" CAST(l_linenumber AS STRING), 'lsupp'), {n_supp}) + 1"
            " AS BIGINT) AS l_suppkey",
            "l_linenumber",
            "CAST(pmod(xxhash64(CAST(o_orderkey AS STRING),"
            " CAST(l_linenumber AS STRING), 'lqty'), 50) + 1 AS DOUBLE)"
            " AS l_quantity",
            "CAST(round((pmod(xxhash64(CAST(o_orderkey AS STRING),"
            " CAST(l_linenumber AS STRING), 'lprice'), 101001) + 90000)"
            " / 100.0 * (pmod(xxhash64(CAST(o_orderkey AS STRING),"
            " CAST(l_linenumber AS STRING), 'lqty'), 50) + 1), 2)"
            " AS DOUBLE) AS l_extendedprice",
            "CAST(pmod(xxhash64(CAST(o_orderkey AS STRING),"
            " CAST(l_linenumber AS STRING), 'ldisc'), 11) / 100.0"
            " AS DOUBLE) AS l_discount",
            "CAST(pmod(xxhash64(CAST(o_orderkey AS STRING),"
            " CAST(l_linenumber AS STRING), 'ltax'), 9) / 100.0"
            " AS DOUBLE) AS l_tax",
            "element_at(array('A','N','R'), CAST(pmod(xxhash64("
            "CAST(o_orderkey AS STRING), CAST(l_linenumber AS STRING),"
            " 'lret'), 3) + 1 AS INT)) AS l_returnflag",
            "element_at(array('F','O'), CAST(pmod(xxhash64("
            "CAST(o_orderkey AS STRING), CAST(l_linenumber AS STRING),"
            " 'lstat'), 2) + 1 AS INT)) AS l_linestatus",
            "CAST(date_add(CAST(o_orderdate AS DATE),"
            " CAST(pmod(xxhash64(CAST(o_orderkey AS STRING),"
            " CAST(l_linenumber AS STRING), 'lship'), 121) + 1 AS INT))"
            " AS TIMESTAMP) AS l_shipdate",
        ).coalesce(max(1, int(8 * sf))).write.mode("overwrite").parquet(
            f"{out}/lineitem.parquet"
        )
        print(f"lineitem: ~{4 * n_ord}")

    # remaining tables: copy verbatim from the shipped corpus so every
    # driver_sim view resolves (the width-cert ops only read the
    # synthesized fact tables; dims keep their keys/names, and the
    # text/embedding tables stay at the source SF)
    import shutil

    for t in (
        "nation", "region", "part", "supplier",
        "documents", "events", "embeddings",
    ):
        if want(t):
            shutil.copyfile(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
            print(f"{t}: copied from {SRC}")

    # DuckDB's side of driver_sim reads each table as ONE parquet file
    # (the shipped-corpus layout); consolidate Spark's directory output
    import pyarrow.parquet as pq

    for t in ("customer", "orders", "lineitem"):
        if want(t):
            d = f"{out}/{t}.parquet"
            if os.path.isdir(d):
                import pyarrow as pa

                tbl = pq.read_table(d)
                # match the shipped corpus layout: timestamps stored as
                # parquet TIMESTAMP(MICROS) (only events.ts is NANOS
                # there), and NO embedded Spark schema metadata — the
                # engine session runs with nanosAsLong, which would
                # misread a NANOS column whose footer metadata still
                # promises TimestampType
                fields = [
                    pa.field(
                        f.name,
                        pa.timestamp("us")
                        if pa.types.is_timestamp(f.type)
                        else f.type,
                    )
                    for f in tbl.schema
                ]
                tbl = tbl.cast(pa.schema(fields))
                tmp = f"{out}/.{t}.tmp.parquet"
                pq.write_table(tbl, tmp)
                shutil.rmtree(d)
                os.replace(tmp, d)
                print(f"{t}: consolidated to a single file")

    print(f"wrote {out} at sf={sf}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
