#!/usr/bin/env python
"""Dump the formatted physical plan of any registered query.

    python scripts/explain.py <query_name> [sf_dir] [mode]

mode: formatted (default) | simple | extended | cost | codegen.
The tool every plan claim in PLANS.md / README §scale came from —
regenerate after changing an operator and diff the tree.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from velox_hadoop_spark.plans import registry  # noqa: E402
from velox_hadoop_spark.session import get_spark  # noqa: E402


def main() -> None:
    if len(sys.argv) < 2:
        names = sorted(registry.queries())
        print(f"{len(names)} queries:")
        for n in names:
            print(" ", n)
        return
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    mode = sys.argv[3] if len(sys.argv) > 3 else "formatted"
    spark = get_spark(app_name="explain", cpus=8, shuffle_partitions=8)
    df = registry.queries()[name](spark, sf_dir)
    je = df._jdf.queryExecution()
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    print(je.explainString(jmode))


if __name__ == "__main__":
    main()
