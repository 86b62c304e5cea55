#!/usr/bin/env python
"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Per-query timings go to BENCH_TIMINGS.json (and stderr progress lines);
stdout's FINAL line is one SHORT JSON summary the driver can always
parse even when it captures only the output tail:
{"metric": ..., "value": total_sec, "unit": "sec", "sf": ...,
 "queries": {<10 slowest>}, "n_queries": N}.

Each query is forced end-to-end with the noop sink (full computation,
no driver-side collect). One tiny warmup query amortizes JVM/codegen
startup so per-query numbers reflect steady-state execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from velox_hadoop_spark.plans import registry
from velox_hadoop_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="velox_hadoop_spark-bench")

    # warmup: JVM + codegen + parquet footer caches
    _force(spark.read.parquet(f"{SF_DIR}/region.parquet"))

    timings: dict[str, float] = {}
    for name, fn in sorted(registry.queries().items()):
        t0 = time.perf_counter()
        _force(fn(spark, SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"{name}: {timings[name]}s", file=sys.stderr)
        # queries own their persists for the duration of one run; the
        # harness releases them so 100+ queries can't evict each other
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(repo_dir, "BENCH_TIMINGS.json"), "w") as f:
        json.dump({"sf": sf, "total_sec": total, "queries": timings}, f, indent=1, sort_keys=True)

    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "queries": slowest,
                "n_queries": len(timings),
            }
        )
    )


if __name__ == "__main__":
    main()
