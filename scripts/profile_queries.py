#!/usr/bin/env python
"""Structural profile of registered queries: per query, the number of
Spark jobs (driver actions), stages and tasks the noop-forced run
schedules, plus wall time.

    python scripts/profile_queries.py [--sf DIR] [name ...] > profile.json

Job/stage/task counts are LOAD-INDEPENDENT: on a host with heavy CPU
steal the wall clock swings 3-15x run to run, but the scheduled work is
deterministic, so round-13 optimization targets (fewer actions, fewer
exchanges) are selected and verified on these counts, with wall time as
the corroborating signal when the box is calm.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from velox_hadoop_spark.plans import registry  # noqa: E402
from velox_hadoop_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = sys.argv[1:]
    sf_dir = SF_DIR
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]
    qs = registry.queries()
    names = args or sorted(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        sys.exit(f"unknown queries: {', '.join(unknown)}")
    spark = get_spark(app_name="profile")
    sc = spark.sparkContext
    _force(spark.read.parquet(f"{sf_dir}/region.parquet"))  # warmup
    tracker = sc.statusTracker()
    out: dict[str, dict] = {}
    for name in names:
        group = f"profile-{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        _force(qs[name](spark, sf_dir))
        wall = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        job_ids = tracker.getJobIdsForGroup(group)
        stage_ids: set[int] = set()
        for jid in job_ids:
            info = tracker.getJobInfo(jid)
            if info is not None:
                stage_ids.update(info.stageIds)
        n_tasks = 0
        for sid in stage_ids:
            sinfo = tracker.getStageInfo(sid)
            if sinfo is not None:
                n_tasks += sinfo.numTasks
        out[name] = {
            "wall_sec": round(wall, 3),
            "jobs": len(job_ids),
            "stages": len(stage_ids),
            "tasks": n_tasks,
        }
        print(
            f"{name}: {wall:.2f}s jobs={len(job_ids)} stages={len(stage_ids)} tasks={n_tasks}",
            file=sys.stderr,
        )
        spark.catalog.clearCache()
    json.dump(out, sys.stdout, indent=1, sort_keys=True)
    print()


if __name__ == "__main__":
    main()
