#!/usr/bin/env python
"""r14 optimization-round profiler: per headline query, capture
- wall seconds (min of RUNS noop materializations, bench methodology),
- Spark JOB count and STAGE count triggered by one construction+execution
  (the latency decomposition: at sf0.1 every input is <11 MB, so walls
  are dominated by sequential job/stage barriers, not bytes),
- the formatted physical plan -> plans/r14/<name>_<tag>.txt.

Usage: python tools/r14_profile.py <tag> [query ...]
  tag = 'before' / 'after' (plan file suffix). No query args = full
  HEADLINE list. Prints one JSON line per query and a JSON summary file
  /tmp/r14_profile_<tag>.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecommerce_data_pipeline_spark import plans  # noqa: E402
from ecommerce_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS = 3
PLANS_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14")


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(PLANS_DIR, exist_ok=True)
    spark = get_spark("r14-profile", cpus=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    registry = plans.REGISTRY
    if not names:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "bench",
            os.path.join(os.path.dirname(PLANS_DIR), "..", "bench.py"),
        )
        bench = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(bench)
        names = bench.HEADLINE

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    # warm-up the session (JVM, codegen, parquet footers)
    materialize(registry["q1_pricing_summary"].fn(spark, SF_DIR))

    out = {}
    for name in names:
        q = registry[name]
        sc.setJobDescription(name)
        # warm run (codegen compile) without instrumentation
        df = q.fn(spark, SF_DIR)
        materialize(df)
        spark.catalog.clearCache()
        # instrumented run: job group isolates this query's jobs
        group = f"r14prof-{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        df2 = q.fn(spark, SF_DIR)
        materialize(df2)
        wall_instr = time.perf_counter() - t0
        job_ids = tracker.getJobIdsForGroup(group)
        n_jobs = len(job_ids)
        n_stages = 0
        n_tasks = 0
        for jid in job_ids:
            ji = tracker.getJobInfo(jid)
            if ji is None:
                continue
            n_stages += len(ji.stageIds)
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None:
                    n_tasks += si.numTasks
        sc.setJobGroup("r14prof-timed", name)
        spark.catalog.clearCache()
        # timed runs, bench methodology (min of RUNS)
        times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            materialize(q.fn(spark, SF_DIR))
            times.append(time.perf_counter() - t0)
        wall = round(min(times), 3)
        spark.catalog.clearCache()
        # formatted plan (post-execution not available here; initial plan)
        try:
            plan_txt = df2._sc._jvm.PythonSQLUtils.explainString(
                df2._jdf.queryExecution(), "formatted"
            )
        except Exception:
            import io
            from contextlib import redirect_stdout

            buf = io.StringIO()
            with redirect_stdout(buf):
                df2.explain("formatted")
            plan_txt = buf.getvalue()
        with open(os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan_txt)
        n_exchange = plan_txt.count("Exchange")
        rec = {
            "wall": wall,
            "wall_instr": round(wall_instr, 3),
            "jobs": n_jobs,
            "stages": n_stages,
            "tasks": n_tasks,
            "exchanges": n_exchange,
        }
        out[name] = rec
        print(json.dumps({"q": name, **rec}), flush=True)

    with open(f"/tmp/r14_profile_{tag}.json", "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
