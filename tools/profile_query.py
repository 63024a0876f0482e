"""Per-job profiler for registry/bench queries (r15 optimization tooling).

Runs each named query through the noop sink on a UI-enabled session and
prints the per-Spark-job wall-time breakdown from the REST API, so the
cost of a query decomposes into its actions (eager probes, collects,
the final noop) instead of one opaque number. Also dumps
``explain("formatted")`` to ``plans/r15/<query>_<tag>.txt`` when
``--plans <tag>`` is passed.

Usage:
    python tools/profile_query.py [--plans before] [--repeats 2] q1 q2 ...
    python tools/profile_query.py --all          # whole headline list
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_pack_spark.session import get_spark  # noqa: E402
from etl_pack_spark import suite  # noqa: E402


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/{path}") as r:
        return json.load(r)


def profile(spark, name: str, fn, sf_dir: str, repeats: int, plans_tag: str | None):
    import bench as bench_mod  # noqa: F401  (for LIB_QUERIES symmetry)

    best = None
    best_jobs = None
    for rep in range(repeats):
        spark.catalog.clearCache()
        before_ids = {j["jobId"] for j in _rest(spark, "jobs")}
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t_build = time.perf_counter() - t0
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        jobs = [j for j in _rest(spark, "jobs") if j["jobId"] not in before_ids]
        jobs.sort(key=lambda j: j["jobId"])
        if best is None or wall < best[0]:
            best = (wall, t_build)
            best_jobs = jobs
        if plans_tag and rep == 0:
            out = Path(__file__).resolve().parent.parent / "plans" / (
                os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r16")
            )
            out.mkdir(parents=True, exist_ok=True)
            (out / f"{name}_{plans_tag}.txt").write_text(
                df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            )
    wall, t_build = best
    print(f"\n=== {name}: wall={wall:.3f}s (plan-build {t_build:.3f}s, "
          f"{len(best_jobs)} jobs, best of {repeats})")
    for j in best_jobs:
        sub = j.get("submissionTime", "")
        dur = ""
        if j.get("completionTime") and j.get("submissionTime"):
            from datetime import datetime

            f = "%Y-%m-%dT%H:%M:%S.%f%Z"
            try:
                d = (datetime.strptime(j["completionTime"], f)
                     - datetime.strptime(j["submissionTime"], f)).total_seconds()
                dur = f"{d:7.3f}s"
            except ValueError:
                dur = "?"
        desc = (j.get("description") or j.get("name") or "")[:100]
        print(f"  job {j['jobId']:>4} {dur:>9}  tasks={j['numTasks']:<5} {desc}")
    return wall


def main() -> None:
    args = sys.argv[1:]
    plans_tag = None
    repeats = 2
    if "--plans" in args:
        i = args.index("--plans")
        plans_tag = args[i + 1]
        del args[i:i + 2]
    if "--repeats" in args:
        i = args.index("--repeats")
        repeats = int(args[i + 1])
        del args[i:i + 2]
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import bench as bench_mod

    if args == ["--all"]:
        names = list(bench_mod.BENCH_QUERIES)
    else:
        names = args
    spark = get_spark("profile_query", extra_conf={"spark.ui.enabled": "true"})
    totals = {}
    for name in names:
        fn = (bench_mod.LIB_QUERIES.get(name) or suite.QUERIES.get(name)
              or suite.RETIRED_QUERIES[name])
        totals[name] = profile(spark, name, fn, sf_dir, repeats, plans_tag)
    print("\n--- totals ---")
    for k, v in sorted(totals.items(), key=lambda kv: -kv[1]):
        print(f"{v:8.3f}  {k}")
    print(f"{sum(totals.values()):8.3f}  TOTAL")


if __name__ == "__main__":
    main()
