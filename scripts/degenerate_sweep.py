#!/usr/bin/env python
"""Full-registry DEGENERATE-input cross-engine sweep.

Companion to scripts/empty_sweep.py: runs every oracled registry query
against its DuckDB oracle on a tiny but pathological corpus — all-ties
values (zero variance everywhere), a single calendar day, one-class
labels, singleton groups, same-timestamp event ties, a clickless
purchaser. Its first run found 4 ANSI DIVIDE_BY_ZERO crashes (Spark 4's
`corr` on zero variance, histogram zero bucket width, moment-skewness,
and `regression_functions`' Pearson r) and one pivot NULL-vs-0 parity
gap — all fixed with identical guards in both engines.

    python scripts/degenerate_sweep.py

Exits non-zero on any divergence outside KNOWN_DEGENERATE_DIVERGENT.
"""

from __future__ import annotations

import os
import sys

# Make `from sweep_common import ...` resolve under BOTH invocation
# styles (`python scripts/x.py` puts scripts/ first already;
# `python -m scripts.x` puts the repo root first). sweep_common then
# bootstraps the repo root for the velox_hadoop_spark import below.
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sweep_common import TABLE_SCHEMAS, fresh_dir, run_sweep  # noqa: E402

from velox_hadoop_spark.session import get_spark  # noqa: E402

# DOCUMENTED data-dependent contracts, not kernel bugs:
# - conditional_agg_flags: max_by/min_by ties are engine-arbitrary; the
#   query's docstring pins the no-ties data contract (o_totalprice
#   unique per status at every real SF — DuckDB itself returns
#   different winners run to run on the tied corpus).
# - pagerank_converged: the oracle is unrolled at the pass count the
#   REAL data converges in (5 at sf0.001/sf0.01, a documented scale
#   pin); the degenerate graph converges in 1.
KNOWN_DEGENERATE_DIVERGENT = {
    "conditional_agg_flags",
    "pagerank_converged",
}

ROWS = {
    "orders": [
        (i, 1, "F", 100.0, "2024-01-02 00:00:00", "1-URGENT") for i in range(1, 6)
    ],
    "lineitem": [
        (i, 1, 1, 1, 10.0, 100.0, 0.05, 0.02, "A", "F", "2024-01-02 00:00:00")
        for i in range(1, 6)
    ],
    "customer": [(1, "c1", 7, 100.0, "BUILDING")],
    "supplier": [(1, "s1", 7, 100.0)],
    "nation": [(7, "GERMANY", 1)],
    "region": [(1, "EUROPE",)],
    "part": [(i, f"p{i}", "Brand#1", "t", 1, 10.0) for i in range(1, 6)],
    "events": [
        (1, "2024-01-02 00:00:00", 1, "purchase", 5.0, "{}"),
        (2, "2024-01-02 00:00:00", 1, "click", 3.0, "{}"),
        (3, "2024-01-02 00:00:00", 1, "click", 4.0, "{}"),
        (4, "2024-01-02 12:00:00", 2, "view", 1.0, "{}"),
        (5, "2024-01-03 00:00:00", 3, "purchase", 2.0, "{}"),
    ],
    "documents": [(i, "the a of and to", "en", "web", 15) for i in range(1, 4)],
    "embeddings": [(1, [0.0, 0.0], 0)],
}
CASTS = {"orders": "o_orderdate", "lineitem": "l_shipdate", "events": "ts"}


def main() -> int:
    from pyspark.sql import functions as F

    spark = get_spark(app_name="degenerate-sweep", cpus=8, shuffle_partitions=8)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    d = fresh_dir("/tmp/velox_hadoop_spark_degenerate_sweep")
    for t, schema in TABLE_SCHEMAS.items():
        df = spark.createDataFrame(
            ROWS.get(t, []),
            schema.replace("timestamp_ntz", "string") if t in CASTS else schema,
        )
        if t in CASTS:
            df = df.withColumn(CASTS[t], F.col(CASTS[t]).cast("timestamp_ntz"))
        df.write.mode("overwrite").parquet(f"{d}/{t}.parquet")
    return run_sweep(spark, d, TABLE_SCHEMAS, KNOWN_DEGENERATE_DIVERGENT)


if __name__ == "__main__":
    sys.exit(main())
