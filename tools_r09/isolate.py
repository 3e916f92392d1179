#!/usr/bin/env python
"""Round-9 measurement harness: isolate queries with the noop sink,
record wall (min-of-N), job/task counts (statusTracker deltas), and
dump explain("formatted") to plans/r09/<q>_<tag>.txt.

Usage: python tools_r09/isolate.py <tag> q_a q_b ...   [N=2 via env N]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_DIR)

from loan_etl_data_pipeline_spark import create_session  # noqa: E402
from loan_etl_data_pipeline_spark.queries import all_queries  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_samples = int(os.environ.get("N", "2"))
    dump_plans = os.environ.get("PLANS", "1") != "0"
    spark = create_session(
        "r09-isolate",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "16g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    # warm-up like bench.py
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    tracker = spark.sparkContext.statusTracker()
    os.makedirs(os.path.join(REPO_DIR, "plans", "r09"), exist_ok=True)
    results = {}
    for name in names:
        samples = []
        jobs_tasks = None
        for s in range(n_samples):
            jobs_before = set(tracker.getJobIdsForGroup(None) or [])
            spark.sparkContext.setJobDescription(f"{name} sample {s}")
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            nrows = len(df.collect())
            t = time.perf_counter() - t0
            samples.append(round(t, 4))
            jobs_after = set(tracker.getJobIdsForGroup(None) or [])
            new_jobs = sorted(jobs_after - jobs_before)
            ntasks = 0
            for j in new_jobs:
                ji = tracker.getJobInfo(j)
                if ji is None:
                    continue
                for sid in ji.stageIds:
                    si = tracker.getStageInfo(sid)
                    if si is not None:
                        ntasks += si.numTasks
            jobs_tasks = (len(new_jobs), ntasks)
            if s == 0 and dump_plans:
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
                with open(
                    os.path.join(REPO_DIR, "plans", "r09", f"{name}_{tag}.txt"),
                    "w",
                ) as f:
                    f.write(plan)
            spark.catalog.clearCache()
        results[name] = {
            "min": min(samples),
            "samples": samples,
            "rows": nrows,
            "jobs": jobs_tasks[0],
            "tasks": jobs_tasks[1],
        }
        print(
            f"{name}: min={min(samples)}s samples={samples} "
            f"jobs={jobs_tasks[0]} tasks={jobs_tasks[1]} rows={nrows}",
            flush=True,
        )
    print(json.dumps({"tag": tag, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
