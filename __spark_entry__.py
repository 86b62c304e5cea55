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
# evidence. Round 10's 13 names all re-greened in CORRECTNESS_r10 and
# were dropped; repopulated with round 11's semantic/oracle rewrites:
_REVERIFY = (
    # streaming dedup runner now emits per-key SINK ROW COUNTS (oracle
    # pins n_rows = 1 per key) instead of a post-sink distinct, so a
    # dropDuplicatesWithinWatermark regression that emits duplicates
    # fails the driver gate too (round-10 ADVICE item):
    "streaming_dedup_runner",
    # the broadened lint_oracles class 3 (CAST wrappers, avg, un-ROUNDed
    # money sums — round-10 ADVICE) caught 7 stragglers; all converted
    # to exact integer-cent / 1e4-grid / exact-moment folds, mirrored in
    # each oracle, value-identical at sf0.01 + sf0.1 (re-gated). The
    # 8th hit (window_customer_orders, a bounded 3-row frame) is
    # whitelisted with rationale in scripts/lint_oracles.py:
    "tpch_q14_promo_revenue",
    "stateful_sessions_batch_twin",
    "event_value_outliers",
    "winsorized_mean_value",
    "welch_z_by_event_type",
    "grouped_locf_daily_fill",
    "weekday_hour_heatmap",
)


# Green rows whose kernels were HARDENED with provably value-neutral
# rewrites — all re-gated at sf0.01 AND sf0.1 with identical results.
# They re-enter the queue BEHIND the never-verified group: fresh driver
# evidence is desirable but must not displace a new registration's
# FIRST row (the every-query-has-a-row invariant). Round-11 state: the
# r09 sample reached 24 of the 55 round-10 tail names (re-greened,
# dropped); the 31 names below re-queue at the FRONT of the tail, in
# the same wait-order. Round 11 registers few new queries so the
# ~50-slot budget reaches ALL of them (restoring the r8 invariant
# "every registry query has a current green row").
_REVERIFY_TAIL = (
    # round-9/10 riders not reached by the r10 sample, oldest first —
    # money-exactness conversions (exact integer-cent sums replacing
    # ROUND(SUM(double))), −0.0 pins on the shared cosine/centroid
    # kernels, and the A-ES zero-weight guard:
    "tpch_q19_disjunctive_revenue",
    "tpch_q22_idle_rich_customers",
    "window_customer_orders",
    "window_trailing_30d_spend",
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
    # sf0.01 + sf0.1:
    "ann_ivf_topk",
    "pack_sequences",
    "pack_overflow_stats",
    "context_window_budget",
    "curation_pack_report",
    "capped_docs_per_source",
    "inverted_index_tokens",
    "key_skew_salting_plan",
    # money-exactness COMPLETION batch (streaming-family, sources, and
    # reshape modules), value-identical at sf0.01 + sf0.1 (re-gated),
    # enforced registry-wide by lint_oracles class 3:
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
    # round-11 value-neutral plan rewrites: the grouped-array hot-bucket
    # OOM class closed at ALL FIVE sites (lsh_candidate_pairs,
    # jaccard_pairs, incremental_lsh_near_dup, simhash_near_dup_pairs,
    # fuzzy_pairs_blocked) with drop_hot_keys — a count pre-pass +
    # broadcast anti-join BEFORE the grouped collect_list; dropped
    # buckets unchanged, every oracle unchanged. The 22 names below are
    # the transitive riders of those shared helpers (AST call-graph
    # audit), re-gated value-identical at sf0.01 + sf0.1. They queue
    # BEHIND the 31 older riders above: the round-11 budget drains all
    # 31 old names first; riders the sample does not reach re-queue in
    # round 12 (the OOM-close brief item created more riders than the
    # ~50-slot budget holds alongside the old drain — resolved in favor
    # of closing the whole class, arithmetic in plans/ROUND12_NOTES.md).
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "incremental_lsh_near_dup",
    "simhash_near_dup_pairs",
    "fuzzy_part_name_pairs",
    "entity_resolution_parts",
    "minhash_jaccard_estimate",
    "minhash_containment_pairs",
    "minhash_estimate_error_audit",
    "minhash_band_tuning_report",
    "near_dup_verified_pairs",
    "near_dup_cluster_size_histogram",
    "lsh_dedup_recall_gate",
    "dedup_clusters",
    "dedup_cluster_source_span",
    "dedup_threshold_sweep",
    "dedup_survivorship_golden",
    "intra_cluster_jaccard_audit",
    "cluster_split_assign",
    "cross_source_neardup_matrix",
    "cross_snapshot_dedup_decay",
    "snapshot_novelty_rate",
    # round-11 streaming-runner hygiene (round-10 ADVICE): deterministic
    # per-sf stream-source dir + stale memory-sink drop via
    # drain_to_memory_sink — sink contents and oracles unchanged for
    # these two (the dedup runner's oracle DID change; it rides
    # _REVERIFY above):
    "streaming_tumbling_runner",
    "streaming_stateful_totals_runner",
    # round-11 shared recall ground truth (VERDICT item 4): the exact
    # baseline computes once per (session, sf_dir) and replays as a
    # ~3k-row local relation — values identical (re-gated sf0.01 +
    # sf0.1); ann_ivf_recall already rides the older batch above:
    "ann_lsh_recall_at_k",
    "ann_multiprobe_recall",
    "ann_recall_budget_curve",
)


# Queries added in the current round: they go to the BACK of the
# never-verified group so each new registration extends the burn-down
# queue instead of displacing older queries out of the driver's
# per-round verification budget. Round 11: empty — registration order
# queues the few additions last. Budget arithmetic: the 3 sketch
# queries converted from rows-only to hash-oracled bounds-audits are
# never-hash-green, so they sort into the never-verified front
# automatically; front = 3 sketch conversions + new registrations +
# 1 _REVERIFY (streaming_dedup_runner oracle change) ≈ 8 vs ~50 driver
# slots, leaving ~42 for the tail — ALL 31 old riders drain (the r8
# "every query has a current green row" invariant restored for the
# inherited debt), then ~11 of the 22 round-11 OOM-fix riders; the
# remainder re-queues in round 12.
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
