"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``velox_hadoop_spark.plans.registry`` — the engine's
named-query registry. Every operator family in SURVEY.md §2 registers
its queries (Spark plan + DuckDB oracle SQL) there.
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_DIR)

from velox_hadoop_spark.plans import registry  # noqa: E402


def _verified_names() -> set[str]:
    """Query names with a fully-green row in any committed CORRECTNESS_r*.json.

    The driver verifies a bounded prefix of ``queries()`` per round, so we
    order never-verified queries first: across rounds every query gets a
    hash-verified row without dropping already-green ones from the surface.
    """
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(_REPO_DIR, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("rows_match") and row.get("schema_match") and row.get("hash_match"):
                green.add(name)
    return green


# Front-of-queue rows within the never-verified group (entries already
# driver-green are skipped automatically). Round 9: empty — r8 left no
# backlog (every registry query carries a current green row), so the
# never-verified group is exactly this round's registrations plus the
# two perpetual rows-only approx_* rows.
_BOOST = ()


# Driver-green rows whose underlying code or oracle changed AFTER the
# green row was recorded. They re-enter the verification queue right
# behind the never-verified boost group so the driver refreshes their
# evidence. Round 9's 7 names all re-greened in CORRECTNESS_r09 and
# were dropped; repopulated with round 10's semantic/oracle rewrites:
_REVERIFY = (
    # deterministic-truncation caps on the last three uncapped dedup
    # pair generators, each mirrored in its oracle (cap-binding
    # fixtures in tests/test_round10_parity.py):
    "incremental_lsh_near_dup",
    "contained_doc_pairs",
    "similarity_join_prefix",
    # ANN_BUCKET_CAP neighbor truncation, mirrored in the oracle:
    "ann_lsh_topk",
    # hyperplane-bit oracles realigned from free-order GROUP BY sums
    # to literal left-to-right folds (the Brown-EMA cancellation
    # class, closed proactively) — values identical at test SFs:
    "embedding_lsh_buckets",
    "ann_lsh_recall_at_k",
    "ann_multiprobe_recall",
    # outlier ranking key rebuilt on exact 1e-12-grid BIGINT terms
    # against a 1e-9-pinned centroid (both engines):
    "embedding_outliers",
    # money-exactness remainder: avg/sd over money from exact
    # integer-cent moments (the Cohen's-d pattern):
    "stats_per_segment",
    # the last ROUND(sum(double)) money totals in the registry — the
    # streaming-family batch aggregates and the stateful batch twin —
    # converted to exact integer-cent sums (lossless on the 2-dp value
    # column, associative under any accumulation order incl. a
    # streaming state-store merge), with SQL-sum NULL semantics in the
    # pandas twin (an all-NULL-value user now reports NULL, not 0.00 —
    # the round-10 review's adversarial find, fixed in kernel + oracle):
    "events_tumbling_1h",
    "events_sliding_10m5m",
    "events_session_10m",
    "stateful_totals_batch_twin",
)


# Green rows whose kernels were HARDENED this round with provably
# value-neutral rewrites (decimal/HUGEINT widening of overflow-at-scale
# products, integer-cents ranking keys, −0.0 pins, the bounded
# posting-list top-k) — all re-gated at sf0.01 AND sf0.1 with identical
# results. They re-enter the queue BEHIND the never-verified group:
# fresh driver evidence is desirable but must not displace a
# new registration's FIRST row (the every-query-has-a-row invariant);
# whatever the ~50-slot budget doesn't reach this round re-queues in
# round 10.
_REVERIFY_TAIL = (
    # round-9 riders not reached by the r09 sample (the 4 reached —
    # customer_rfm_segments, spend_quartile_migration, cohort_ltv_curve,
    # inverted_index_tokens — re-greened and were dropped; the four ANN
    # names moved up to _REVERIFY with round-10 oracle changes):
    "embedding_random_projection",
    "cusum_changepoint_daily",
    "mann_whitney_u",
    "auc_quality_en_classifier",
    "ks_statistic_order_values",
    # money-exactness batch: exact fixed-point sums replace
    # ROUND(SUM(double)) where the double sum loses cent resolution or
    # feeds a ranking key at 100 TB scale (same re-gate evidence).
    # sqlbreadth2's _t -> read_table change is NOT re-queued: it only
    # alters the events read path under TIMESTAMP(NANOS) storage and
    # is a byte-identical no-op on every driver-visible corpus.
    "damped_rank_formula",
    "conditional_agg_flags",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_volume",
    "tpch_q6_forecast_revenue",
    "monthly_revenue_mom",
    "window_rank_in_nation",
    "nation_revenue_share",
    "time_weighted_avg_value",
    # money-exactness sweep part 2 (same class, same evidence):
    "broadcast_region_rollup",
    "range_join_ship_window",
    "override_join_balances",
    "cube_priority_status",
    "orders_by_weekday",
    "salted_join_lineitem_orders",
    "tpch_q17_small_quantity_revenue",
    "tpch_q10_returned_revenue",
    "tpch_q7_nation_volume",
    "tpch_q19_disjunctive_revenue",
    "tpch_q22_idle_rich_customers",
    "window_customer_orders",
    "window_trailing_30d_spend",
    # −0.0 pins on the shared cosine/centroid kernels (similarity.py)
    # and the A-ES zero-weight guard (sampling.py): results identical
    # on every driver corpus, re-gated green at sf0.01 + sf0.1.
    "embedding_near_dup",
    "ann_bruteforce_topk",
    "knn_top1_all",
    "embedding_label_centroids",
    "centroid_separation_matrix",
    "ann_ivf_recall",
    "ann_hard_negatives",
    "weighted_sample_docs",
    # round-10 value-neutral plan rewrites (staged windows, salted IVF
    # cogroup, persist riders) — outputs byte-identical, re-gated at
    # sf0.01 + sf0.1; queued BEHIND the older riders above (those have
    # waited a round longer for fresh driver evidence):
    "ann_ivf_topk",
    "pack_sequences",
    "pack_overflow_stats",
    "context_window_budget",
    "curation_pack_report",
    "capped_docs_per_source",
    "inverted_index_tokens",
    "key_skew_salting_plan",
    # money-exactness COMPLETION batch (the round-10 review found the
    # r9 "completed" claim had missed the streaming-family, sources,
    # and reshape modules): every remaining ROUND(sum(double)) money
    # total converted to the functions/money.py exact-cents/1e4 form,
    # mirrored in each oracle, value-identical at sf0.01 + sf0.1
    # (re-gated), now enforced registry-wide by lint_oracles class 3:
    "events_json_props",
    "events_segment_enriched",
    "events_gap_fill_daily",
    "jsonl_roundtrip_orders",
    "orc_roundtrip_customer",
    "partitioned_parquet_prune",
    "dynamic_partition_prune_join",
    "federated_format_union",
    "grouping_sets_revenue",
    "time_rollup_revenue",
    "sql_q8_market_share",
)


# Queries added in the current round: they go to the BACK of the
# never-verified group so each new registration extends the burn-down
# queue instead of displacing older queries out of the driver's
# per-round verification budget. Round 10: empty — registration order
# already queues the 10 additions (llmops9's doremi_mixture_reweight /
# retrieval_map_mrr_at_10 / kmeans_silhouette_lite /
# compaction_bin_execution / doremi_weighted_resample /
# silhouette_worst_members, the three REAL streaming-trigger runners
# streaming_tumbling_runner / streaming_dedup_runner /
# streaming_stateful_totals_runner, and
# retention_cohort_segment_matrix) last. Budget arithmetic: 13
# _REVERIFY (9 semantic/oracle rewrites + the 4 money/NULL
# conversions with a semantic NULL change) + 10 new + 3 perpetual
# rows-only = 26 front candidates vs ~50 driver slots, leaving ~24
# for the 55-name _REVERIFY_TAIL (36 round-9 riders + 8 round-10
# value-neutral plan rewrites + the 11-query money-exactness
# COMPLETION batch, all value-identical at test SFs) — ~31 tail
# names re-queue in round 11; registration stops at 10 this round.
# The tail's money batch is enforced going forward by lint_oracles
# class 3 (no free-order money sum can re-enter any oracle).
_DEFER = ()


def _priority_order(names: list[str]) -> list[str]:
    """Never-verified queries first (backlog rows boosted to the very
    front, stale-evidence rows re-queued right behind them, this
    round's new registrations after those, registration order
    preserved otherwise) so the driver's per-round verification budget
    lands on the queries that have waited longest for a current green
    CORRECTNESS row."""
    green = _verified_names()
    unverified = [n for n in names if n not in green]
    boosted = [n for n in _BOOST if n in unverified]
    reverify = [n for n in _REVERIFY if n in names]
    reverify_tail = [n for n in _REVERIFY_TAIL if n in names]
    deferred = [n for n in unverified if n in _DEFER]
    rest = [
        n
        for n in unverified
        if n not in _BOOST and n not in _DEFER and n not in _REVERIFY
    ]
    tail = [
        n
        for n in names
        if n in green and n not in _REVERIFY and n not in _REVERIFY_TAIL
    ]
    return boosted + reverify + rest + deferred + reverify_tail + tail


def _utc(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    """Pin the session to UTC: LTZ timestamps must render identically to
    DuckDB's naive (UTC-wall-clock) timestamps regardless of the host
    timezone of whatever session the driver passes in."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return fn(spark, sf_dir)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Grep-style pipeline (reference: Grep.java:62-100 semantics on table
    data): regex extract + grouped count + total-order sort.
    """
    return _utc(registry.queries()["grep"])(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    qs = registry.queries()
    return {name: _utc(qs[name]) for name in _priority_order(list(qs))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for
    non-SQL-expressible iterative/stateful ops)."""
    oracles = registry.oracles()
    return {name: oracles[name] for name in _priority_order(list(oracles))}
