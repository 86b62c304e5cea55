#!/usr/bin/env python
"""Paired A/B of a session-conf override over a representative query
subset. One process = one arm pass (every query once, noop-forced);
alternate arms across processes so host-load waves hit both arms:

    python scripts/ab_subset.py A [--sf DIR]            # arm A: repo defaults
    python scripts/ab_subset.py B [--sf DIR] k=v [k=v]   # arm B: defaults + overrides

Prints per-query seconds as one JSON line; pair the outputs offline.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from velox_hadoop_spark.plans import registry  # noqa: E402
from velox_hadoop_spark.session import get_spark  # noqa: E402

SF_DEFAULT = "/root/testdata/sf0.1"

SUBSET = [
    "wordcount", "grep", "tpch_q1_pricing_summary", "sort_rank",
    "join_orders_customer", "broadcast_region_rollup", "collect_orderkeys",
    "dedup_clusters", "dedup_threshold_sweep", "minhash_estimate_error_audit",
    "lsh_dedup_recall_gate", "simhash_near_dup_pairs",
    "intra_cluster_jaccard_audit", "ann_ivf_recall", "ann_multiprobe_recall",
    "ann_recall_budget_curve", "knn_top1_all", "pagerank_converged",
    "bfs_levels_from_min_supplier", "kcore_suppliers",
    "connected_components_lss", "doremi_resample_report",
    "doremi_mixture_shift_report", "supplier_triangle_counts",
    "clustering_coefficient_suppliers", "embedding_near_dup",
    "snapshot_novelty_rate", "acf_daily_revenue",
    "stateful_sessions_batch_twin", "oov_rate_by_source",
]


def main() -> None:
    arm = sys.argv[1]
    args = sys.argv[2:]
    sf = SF_DEFAULT
    if args and args[0] == "--sf":
        sf = args[1]
        args = args[2:]
    extra = dict(kv.split("=", 1) for kv in args)
    spark = get_spark(app_name=f"ab-{arm}", extra_conf=extra or None)
    def force(df):
        df.write.format("noop").mode("overwrite").save()
    force(spark.read.parquet(f"{sf}/region.parquet"))
    qs = registry.queries()
    out = {}
    for name in SUBSET:
        t0 = time.perf_counter()
        force(qs[name](spark, sf))
        out[name] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
    print(json.dumps({"arm": arm, "conf": extra, "total": round(sum(out.values()), 2), "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
