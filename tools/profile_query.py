"""Per-query profiler for the optimization rounds (guide §1).

For each selected query:
- times plan CONSTRUCTION (Python + analysis) separately from EXECUTION
  (noop sink, same timed action as bench.py),
- pulls per-stage metrics from the Spark UI REST API (executorRunTime,
  shuffle bytes, input bytes, task counts) for the stages the run
  created,
- counts Exchanges / join strategies / Python-eval nodes in the
  formatted plan.

Run: python tools/profile_query.py <substr> [<substr>...] [--runs N]
     [--plans-dir plans/r12] [--suffix before]

Writes <plans-dir>/<query>_<suffix>.txt when --plans-dir is given.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _rest(port: int, path: str):
    url = f"http://localhost:{port}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read().decode())


def _stages(port: int, app_id: str):
    try:
        return _rest(port, f"applications/{app_id}/stages?status=complete")
    except Exception:
        return []


def plan_summary(df) -> str:
    s = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    return s


def plan_counts(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "shj": len(re.findall(r"ShuffledHashJoin", plan)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
        "pyeval": len(re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas)", plan)),
        "sorts": len(re.findall(r"\bSort\b", plan)),
        "aqe": "AdaptiveSparkPlan" in plan,
    }


def main() -> int:
    args = sys.argv[1:]
    runs = 1
    plans_dir = None
    suffix = "profile"
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i:i + 2]
    if "--plans-dir" in args:
        i = args.index("--plans-dir")
        plans_dir = args[i + 1]
        del args[i:i + 2]
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i:i + 2]
    only = set(args)

    from data_migration_etl_scripts_spark import get_spark
    from data_migration_etl_scripts_spark import queries as q

    spark = get_spark(app_name="dmess_profile",
                      extra_conf={"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    app_id = sc.applicationId
    port = int(sc.uiWebUrl.rsplit(":", 1)[1]) if sc.uiWebUrl else 4040

    # warm exactly like bench.py
    tiny = spark.read.parquet(f"{SF_DIR}/region.parquet")
    for t in ("nation", "customer", "supplier", "part", "orders", "lineitem",
              "documents", "embeddings"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").limit(1).count()
    q.all_queries()["group_sizes_events"](spark, SF_DIR).limit(1).count()
    tiny.join(tiny.selectExpr("r_regionkey"), "r_regionkey").groupBy("r_name").count().collect()

    for name, fn in q.all_queries().items():
        if only and not any(f in name for f in only):
            continue
        for r in range(runs):
            pre_ids = {s["stageId"] for s in _stages(port, app_id)}
            sc.setJobDescription(f"profile:{name}:{r}")
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            sc.setJobDescription(None)
            build_s, exec_s = t1 - t0, t2 - t1
            stages = [s for s in _stages(port, app_id)
                      if s["stageId"] not in pre_ids]
            tot_run = sum(s.get("executorRunTime", 0) for s in stages)
            tot_cpu = sum(s.get("executorCpuTime", 0) for s in stages) / 1e6
            tot_gc = sum(s.get("jvmGcTime", 0) for s in stages)
            tot_fetch = sum(s.get("shuffleFetchWaitTime", 0) for s in stages)
            tot_tasks = sum(s.get("numCompleteTasks", 0) for s in stages)
            print(f"\n== {name} run {r}: build {build_s:.3f}s  exec {exec_s:.3f}s  "
                  f"stages {len(stages)}  tasks {tot_tasks}  "
                  f"executorRunTime {tot_run/1000.0:.2f}s  "
                  f"cpu {tot_cpu/1000.0:.2f}s  gc {tot_gc/1000.0:.2f}s  "
                  f"fetchWait {tot_fetch/1000.0:.2f}s")
            for s in sorted(stages, key=lambda s: -s.get("executorRunTime", 0))[:12]:
                print(f"   stage {s['stageId']:4d} tasks {s['numCompleteTasks']:3d} "
                      f"run {s.get('executorRunTime', 0)/1000.0:7.2f}s "
                      f"cpu {s.get('executorCpuTime', 0)/1e9:6.2f}s "
                      f"gc {s.get('jvmGcTime', 0)/1000.0:5.2f}s "
                      f"in {s.get('inputBytes', 0)/1e6:8.1f}MB "
                      f"sr {s.get('shuffleReadBytes', 0)/1e6:8.1f}MB "
                      f"sw {s.get('shuffleWriteBytes', 0)/1e6:8.1f}MB  "
                      f"{(s.get('name', ''))[:60]}")
            if r == 0:
                plan = plan_summary(df)
                pc = plan_counts(plan)
                print(f"   plan: {pc}")
                if plans_dir:
                    os.makedirs(plans_dir, exist_ok=True)
                    with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as f:
                        f.write(plan)
            spark.catalog.clearCache()
            from data_migration_etl_scripts_spark import stage_cache
            stage_cache.clear()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
