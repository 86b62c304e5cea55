"""Oracle parity for the round-3 curation-funnel additions."""

import pytest

from tests.conftest import assert_parity

PARITY_QUERIES = [
    "minhash_jaccard_estimate",
    "incremental_dedup_new_docs",
    "length_band_filter",
    "incremental_lsh_near_dup",
    "date_functions",
    "argmax_order_extremes",
    "topk_parts_per_supplier_agg",
    "regression_functions",
    "dau_mau_stickiness",
    "degree_powerlaw_fit",
    "cross_lang_shingle_overlap",
    "multimodal_features",
    "attribution_last_touch",
    "constraint_violations_report",
    "centroid_separation_matrix",
    "cohort_ltv_curve",
    "udtf_word_bigrams",
    "funnel_view_click_purchase",
    "error_rate_burn",
    "discount_elasticity_by_brand",
    "spend_quartile_migration",
    "weighted_median_quantity",
    "longest_order_streak",
    "order_fill_latency",
    "supplier_concentration_hhi",
    "order_interarrival_histogram",
    "stateful_sessions_batch_twin",
    "nation_trade_flow_matrix",
    "nation_revenue_share",
]


@pytest.mark.parametrize("name", PARITY_QUERIES)
def test_oracle_parity(spark, duck, name):
    assert_parity(spark, duck, name)


def test_jaccard_estimate_covers_all_candidates(spark, duck):
    """Every LSH candidate pair gets exactly one estimate row, and the
    estimate is in [bands-collision floor, 1]: a pair can only become a
    candidate by agreeing on at least one full band (2 of 8 rows)."""
    from tests.conftest import SF_DIR
    from velox_hadoop_spark.operators.dedup import (
        q_lsh_candidate_pairs,
        q_minhash_jaccard_estimate,
    )

    est = q_minhash_jaccard_estimate(spark, SF_DIR)
    cand = q_lsh_candidate_pairs(spark, SF_DIR)
    assert est.count() == cand.count()
    from pyspark.sql import functions as F

    assert est.where((F.col("n_equal") < 2) | (F.col("n_equal") > 8)).count() == 0


def test_oracle_lint_no_hugeint_outputs():
    """Every registered oracle must type its integer aggregates: DuckDB
    HUGEINT (count_if, sum over ints) reaches the driver's Arrow hash
    as decimal128 while Spark emits int64 — value-identical rows would
    hash-mismatch. scripts/lint_oracles.py holds the class permanently."""
    import subprocess
    import sys as _sys

    res = subprocess.run(
        [_sys.executable, "scripts/lint_oracles.py"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert res.returncode == 0, res.stdout + res.stderr


def test_priority_order_invariants():
    """Driver-sample ordering contract: boosted source/sink rows first,
    deferred round-3 additions at the back of the unverified group,
    already-green queries last; every _BOOST/_DEFER name must exist in
    the registry (typo guard)."""
    import __spark_entry__ as entry

    names = list(entry.queries())
    registered = set(names)
    assert set(entry._BOOST) <= registered
    assert set(entry._DEFER) <= registered
    green = entry._verified_names()
    first_green = min(
        (names.index(n) for n in names if n in green), default=len(names)
    )
    # no unverified query may come after the first green one
    for n in names[first_green:]:
        assert n in green, n
    # deferred unverified names sit immediately before the green block
    # (in registration order, not _DEFER order)
    deferred_unverified = {n for n in entry._DEFER if n not in green}
    if deferred_unverified:
        block = names[first_green - len(deferred_unverified):first_green]
        assert set(block) == deferred_unverified


def test_new_registrations_must_be_deferred():
    """Burn-down discipline across rounds: any query registered AFTER
    the round-3 snapshot must appear in __spark_entry__._DEFER (so it
    queues behind the older never-driver-verified backlog instead of
    displacing it). When adding a query: add its name to _DEFER; once
    it earns a green CORRECTNESS row the deferral becomes a no-op."""
    import os

    import __spark_entry__ as entry
    from velox_hadoop_spark.plans import registry as reg

    snap_path = os.path.join(
        os.path.dirname(reg.__file__), "registry_snapshot_r03.txt"
    )
    with open(snap_path) as f:
        snapshot = {line.strip() for line in f if line.strip()}
    new = set(reg.specs()) - snapshot
    not_deferred = new - set(entry._DEFER)
    assert not not_deferred, (
        f"new queries missing from __spark_entry__._DEFER: {sorted(not_deferred)}"
    )
