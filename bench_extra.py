"""Per-query profiling harness for optimization work (guide §1).

NOT the official bench (bench.py is frozen): this tool times individual
declared queries exactly the way bench.py does (``.count()`` on the query
DataFrame, floor of N interleaved passes, cache cleared per rep), and
additionally reports the Spark job count per run (the per-round overhead
driver for iterative operators) and can dump ``explain("formatted")`` for
plan-diff evidence (plans/r06/).

Usage:
  python bench_extra.py q1 q2 ...            # floors of 3 passes
  PASSES=5 python bench_extra.py q1          # more passes
  PLAN_DIR=plans/r06 SUFFIX=_before python bench_extra.py q1
                                             # also dump explain output
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    passes = int(os.environ.get("PASSES", "3"))
    plan_dir = os.environ.get("PLAN_DIR")
    suffix = os.environ.get("SUFFIX", "")

    from plateau_gis_converter_spark.plans import entry_queries as eq
    from plateau_gis_converter_spark.session import get_spark

    spark = get_spark(app="bench_extra", master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus), 8))
    sc = spark.sparkContext
    names = sys.argv[1:]
    reps: dict[str, list[float]] = {}
    jobs: dict[str, int] = {}
    tracker = sc.statusTracker()

    for p in range(passes):
        for name in names:
            fn = eq.QUERIES[name]
            spark.catalog.clearCache()
            gid = f"bx:{name}:{p}"
            sc.setJobGroup(gid, f"bench_extra {name} pass {p}")
            t0 = time.time()
            fn(spark, sf_dir).count()
            dt = round(time.time() - t0, 3)
            sc.setJobGroup(None, None)
            reps.setdefault(name, []).append(dt)
            jobs[name] = len(tracker.getJobIdsForGroup(gid) or [])

    if plan_dir:
        os.makedirs(plan_dir, exist_ok=True)
        for name in names:
            df = eq.QUERIES[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(plan_dir, f"{name}{suffix}.txt"),
                      "w") as fh:
                fh.write(txt)

    out = {n: {"floor": min(rs), "reps": rs, "jobs": jobs.get(n)}
           for n, rs in reps.items()}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
