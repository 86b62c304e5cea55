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
    # ROUND-12 riders — plan/contract changes to green rows, all
    # re-gated value-identical at sf0.01 + sf0.1 before landing:
    #
    # (a) the streaming dedup runner now PINS a single-batch drain
    # (maxFilesPerTrigger far above the runner-owned source's file
    # count), making its n_rows = 1 oracle sound by construction
    # instead of by the current availableNow default (round-12 ADVICE
    # medium item; batching contract tests in
    # tests/test_round12_parity.py):
    "streaming_dedup_runner",
    # (b) the LAST buffer-before-filter aggregates (r11 verdict's one
    # weak finding) closed: co_supply_capped_edges routes its part cap
    # through drop_hot_keys BEFORE the grouped collect_set and merges
    # adjacency via a staged top-k instead of an unbounded
    # flatten(collect_list); the neighbor_jaccard wedge build guards
    # the same way (degrees now fold from the distinct edge frame —
    # no arrays on the uncapped path). Oracles unchanged; hot-part +
    # mega-hot fixtures and plan-shape tests added:
    "supplier_triangle_counts",
    "neighbor_jaccard_links",
    "degree_assortativity_suppliers",
    "clustering_coefficient_suppliers",
    # (c) IVF assignment rewritten as an in-row argmax over the
    # driver-local literal codebook (session-cached per corpus content
    # state, r11 verdict follow-on #3): same scoring expression and
    # tiebreak — bit-equal sims — but no crossJoin, no window, no
    # K x N-row shuffle; cold/warm parity pinned in
    # tests/test_round12_parity.py:
    "ann_ivf_topk",
    "ann_ivf_recall",
    "ann_hard_negatives",
    "ann_recall_budget_curve",
    # (d) the DoReMi |sources|-row base histogram is session-cached
    # driver-local (content-fingerprinted, MAX_SOURCES-guarded; r11
    # verdict follow-on #4) — the iteration arithmetic is the shared
    # _doremi_iterate either way, cold/warm parity pinned in tests:
    "doremi_mixture_reweight",
    "doremi_weighted_resample",
    "doremi_resample_report",
)


# Green rows whose kernels were HARDENED with provably value-neutral
# rewrites — all re-gated at sf0.01 AND sf0.1 with identical results.
# They re-enter the queue BEHIND the never-verified group: fresh driver
# evidence is desirable but must not displace a new registration's
# FIRST row (the every-query-has-a-row invariant). Round-12 state: the
# r11 sample re-greened all 31 old riders AND the first 6 round-11
# riders (dropped below); the 20 names here are the round-11 riders
# the sample did not reach (21 minus ann_recall_budget_curve, which
# re-rides _REVERIFY above for the round-12 IVF rewrite), in the same
# wait-order. Budget arithmetic: 12 _REVERIFY + 20 tail + 7 round-12
# registrations (never-verified, queued ahead of the tail) = 39 of
# ~50 slots -> every name below drains in round 12.
_REVERIFY_TAIL = (
    # round-11 drop_hot_keys riders (grouped-array hot-bucket OOM class
    # closed at all five dedup sites; dropped buckets and oracles
    # unchanged; re-gated value-identical at sf0.01 + sf0.1):
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
    # round-11 streaming-runner hygiene (deterministic content-keyed
    # stream-source dir + stale memory-sink drop; sink contents and
    # oracles unchanged for these two — and the round-12 publication
    # retry loop / GC age floor are value-neutral too):
    "streaming_tumbling_runner",
    "streaming_stateful_totals_runner",
    # round-11 shared recall ground truth (values identical, re-gated),
    # now content-fingerprint-keyed (round-12 ADVICE low item):
    "ann_lsh_recall_at_k",
    "ann_multiprobe_recall",
)


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
