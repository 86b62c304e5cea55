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
# driver-green are skipped automatically). Round 3 boosted the SURVEY §2
# source/sink rows — all green now. Round 4 boosts the relational surface
# users hit first: the 12 never-verified TPC-H queries plus the round-3
# red row (inverted_index_tokens, output shape fixed this round).
_BOOST = (
    "tsv_roundtrip_lineitem",
    "jsonl_roundtrip_orders",
    "orc_roundtrip_customer",
    "partitioned_parquet_prune",
    "schema_evolution_union",
    "dynamic_partition_prune_join",
    "federated_format_union",
    "inverted_index_tokens",
    "tpch_q7_nation_volume",
    "tpch_q9_profit_by_nation_year",
    "tpch_q11_important_parts",
    "tpch_q13_order_count_distribution",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_part_counts",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_volume_orders",
    "tpch_q19_disjunctive_revenue",
    "tpch_q20_bulk_shippers",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_idle_rich_customers",
    "sql_q8_market_share",
)


# Queries added in round 3+ (after the round-2 verification backlog was
# queued): they go to the BACK of the never-verified group so each new
# registration extends the burn-down queue instead of displacing older
# queries out of the driver's per-round verification budget.
_DEFER = (
    "near_dup_verified_pairs",
    "normalization_dedup_stats",
    "charclass_stats_by_lang",
    "table_checksum_buckets",
    "null_skew_left_join",
    "merge_upsert_orders",
    "ann_lsh_recall_at_k",
    "ann_multiprobe_recall",
    "ann_ivf_recall",
    "cascade_delete_audit",
    "entity_resolution_parts",
    "multimodal_frame_sample",
    "cdc_apply_orders",
)


def _priority_order(names: list[str]) -> list[str]:
    """Never-verified queries first (§2 source/sink rows boosted to the
    very front, this round's new registrations deferred to the back of
    the unverified group, registration order preserved otherwise) so
    the driver's per-round verification budget lands on the queries
    that have waited longest for a green CORRECTNESS row."""
    green = _verified_names()
    unverified = [n for n in names if n not in green]
    boosted = [n for n in _BOOST if n in unverified]
    deferred = [n for n in unverified if n in _DEFER]
    rest = [n for n in unverified if n not in _BOOST and n not in _DEFER]
    return boosted + rest + deferred + [n for n in names if n in green]


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
