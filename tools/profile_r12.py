"""Round-12 optimization profiler (bench-matching: clears the copurchase graph memo before every timed run, like bench.py r12).

Times named queries exactly like bench.py (noop sink, same session
factory, warmup pass at sf0.001), and additionally records per-query
job/stage/task counts from the status tracker plus the formatted plan.

Usage:
  python tools/profile_r12.py [--n N] [--plans-dir DIR] name [name ...]
  python tools/profile_r12.py --top K          # K most expensive from BENCH_full_latest.json

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
Prints one JSON line per query:
  {"name": ..., "secs": [..], "median": s, "jobs": n, "stages": n, "tasks": n}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def main() -> None:
    args = sys.argv[1:]
    n = 3
    plans_dir = None
    top = 0
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--n":
            n = int(args[i + 1]); i += 2
        elif args[i] == "--plans-dir":
            plans_dir = args[i + 1]; i += 2
        elif args[i] == "--top":
            top = int(args[i + 1]); i += 2
        else:
            names.append(args[i]); i += 1

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    if top:
        with open(os.path.join(repo, "BENCH_full_latest.json")) as fh:
            b = json.load(fh)
        names += [
            k for k, _ in sorted(b["queries"].items(), key=lambda kv: -kv[1])[:top]
        ]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from ai_etl_studio_spark.session import get_spark
    from ai_etl_studio_spark.operators import load_all

    spark = get_spark(app_name="profile-r11")
    queries, _ = load_all()
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # same warm protocol as bench.py
    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        try:
            queries[name](spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass

    from ai_etl_studio_spark.operators.insights import _CP_GRAPH_CACHE

    out = {}
    for name in names:
        fn = queries[name]
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            try:
                df = fn(spark, sf_dir)
                plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
                    df._jdf.queryExecution(), "formatted"
                )
            except Exception:
                plan = df._jdf.queryExecution().explainString("formatted")
            with open(os.path.join(plans_dir, f"{name}.txt"), "w") as fh:
                fh.write(plan)
        secs = []
        jobs0 = tracker.getJobIdsForGroup(None)
        sc.setJobDescription(f"profile:{name}")
        for _ in range(n):
            _CP_GRAPH_CACHE.clear()  # bench.py r12 parity: no cross-query memo
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            secs.append(round(time.perf_counter() - t0, 3))
        sc.setJobDescription(None)
        jobs1 = tracker.getJobIdsForGroup(None)
        new_jobs = [j for j in jobs1 if j not in jobs0]
        stages = tasks = 0
        for j in new_jobs:
            info = tracker.getJobInfo(j)
            if info:
                for s in info.stageIds:
                    si = tracker.getStageInfo(s)
                    if si:
                        stages += 1
                        tasks += si.numTasks
        rec = {
            "name": name,
            "secs": secs,
            "median": round(statistics.median(secs), 3),
            "jobs": len(new_jobs) // max(1, n),
            "stages": stages // max(1, n),
            "tasks": tasks // max(1, n),
        }
        out[name] = rec
        print(json.dumps(rec), flush=True)
    print(json.dumps({"total_median": round(sum(r["median"] for r in out.values()), 3)}))


if __name__ == "__main__":
    main()
