"""Oracle parity for the late round-2 operator additions."""

import pytest

from tests.conftest import assert_parity

PARITY_QUERIES = [
    "similarity_join_prefix",
    "contained_doc_pairs",
    "time_rollup_revenue",
    "schema_evolution_union",
    "dynamic_partition_prune_join",
    "conditional_agg_flags",
    "bitmap_daily_active_users",
    "monthly_revenue_mom",
    "federated_format_union",
    "profile_drift_orders",
    "salted_agg_returnflag",
    "zorder_key_orders",
    "unigram_logprob_score",
    "token_pmi_pairs",
    "winsorized_mean_value",
    "chi2_priority_status",
    "welch_z_by_event_type",
]


@pytest.mark.parametrize("name", PARITY_QUERIES)
def test_oracle_parity(spark, duck, name):
    assert_parity(spark, duck, name)
