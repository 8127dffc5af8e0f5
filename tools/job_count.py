"""Count Spark driver JOBS one catalog query submits (round-13 evidence
meter for the iterative-loop fusion: jobs/round is the wall time of a
driver-loop operator at local stage-latency scales, guide §5).

Usage:: python tools/job_count.py name [name ...] [--sf DIR]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spotify_etl_pipeline_spark.queries.catalog import full_catalog  # noqa: E402
from spotify_etl_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1
    spark = get_spark(app_name="job-count")
    spark.sparkContext.setLogLevel("ERROR")
    cat = full_catalog()
    out = {}
    for name in names:
        spark.catalog.clearCache()
        sc = spark.sparkContext
        sc.setJobGroup(name, name)
        cat[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        jobs = sc.statusTracker().getJobIdsForGroup(name)
        tracker = sc.statusTracker()
        n_stages = 0
        n_tasks = 0
        for j in jobs:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for s in ji.stageIds:
                si = tracker.getStageInfo(s)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        out[name] = {"jobs": len(jobs), "stages": n_stages, "tasks": n_tasks}
        sc.setJobGroup("", "")
    print(json.dumps({"sf_dir": sf_dir, "shape": out}))
    spark.stop()


if __name__ == "__main__":
    main()
