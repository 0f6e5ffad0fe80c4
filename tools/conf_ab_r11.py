"""A/B a config overlay against the stock engine session on a query
subset — round-11 optimization experiments (guide §1: measure first).

Usage: python tools/conf_ab_r11.py '<json-conf-overlay>' name [name ...]
Prints per-query medians and the subset total. Run once with '{}' for
the baseline, then once per overlay, in separate processes (static
confs like spark.driver.memory need a fresh JVM).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def main() -> None:
    overlay = json.loads(sys.argv[1])
    names = sys.argv[2:]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("AB_N", "3"))

    from ai_etl_studio_spark.session import get_spark
    from ai_etl_studio_spark.operators import load_all

    spark = get_spark(app_name="conf-ab-r11", extra_conf=overlay)
    queries, _ = load_all()
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    warm = "/root/testdata/sf0.001"
    for name in names:
        try:
            queries[name](spark, warm).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
    runs: dict[str, list[float]] = {k: [] for k in names}
    for _ in range(n):
        for name in names:
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs[name].append(time.perf_counter() - t0)
    meds = {k: round(statistics.median(v), 3) for k, v in runs.items()}
    print(json.dumps({"overlay": overlay, "queries": meds,
                      "total": round(sum(meds.values()), 3)}))


if __name__ == "__main__":
    main()
