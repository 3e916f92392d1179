#!/usr/bin/env python
"""Stage-level profile of one query: run it once with the UI on, then
dump per-stage (name, numTasks, executorRunTime, shuffle bytes) from
the REST API. Usage: python tools_r09/profile.py q_name
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_DIR)

from loan_etl_data_pipeline_spark import create_session  # noqa: E402
from loan_etl_data_pipeline_spark.queries import all_queries  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = create_session(
        "r09-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    t0 = time.perf_counter()
    df = queries[name](spark, sf_dir)
    n = len(df.collect())
    wall = time.perf_counter() - t0
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    stages = json.loads(urllib.request.urlopen(url).read())
    stages.sort(key=lambda s: -s.get("executorRunTime", 0))
    print(f"== {name}: wall={wall:.2f}s rows={n} stages={len(stages)}")
    tot = sum(s.get("executorRunTime", 0) for s in stages)
    print(f"total executorRunTime = {tot/1000:.2f}s")
    for s in stages[:18]:
        print(
            f"stage {s['stageId']:>4} tasks={s['numTasks']:>3} "
            f"run={s['executorRunTime']/1000:7.2f}s "
            f"cpu={s.get('executorCpuTime',0)/1e9:7.2f}s "
            f"sr={s.get('shuffleReadBytes',0)>>10:>8}K "
            f"sw={s.get('shuffleWriteBytes',0)>>10:>8}K  "
            f"{s['name'][:90]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
