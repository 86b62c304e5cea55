"""Oracle parity for the round-6 continuation modules (stats2,
semistruct), plus semantics pins the mirrored oracles cannot see on
their own (known-answer synthetic series for the rank/changepoint
statistics, threshold edges for the map pipeline)."""

import datetime

import pytest

from tests.conftest import assert_parity

PARITY_QUERIES = [
    # stats2
    "spearman_rank_corr",
    "anova_f_priority",
    "acf_daily_revenue",
    "max_drawdown_daily_revenue",
    "cusum_changepoint_daily",
    "theil_index_spend",
    "mann_whitney_u",
    "bollinger_breakout_days",
    "rsi_14_daily",
    # semistruct
    "map_functions_orders",
    "str_to_map_roundtrip",
    "json_struct_roundtrip",
    "csv_line_roundtrip",
    "parse_url_events",
    # similarity / dedup gates
    "ann_hard_negatives",
    "lsh_dedup_recall_gate",
]


@pytest.mark.parametrize("name", PARITY_QUERIES)
def test_oracle_parity(spark, duck, name):
    assert_parity(spark, duck, name)


def _write_orders(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    d = str(tmp_path / "sf")
    df.write.parquet(f"{d}/orders.parquet")
    return d


def test_spearman_perfect_and_inverse(spark, tmp_path):
    """Known-answer pins the rank machinery end-to-end: a monotone
    month of lineitem gives rho = +1, an anti-monotone month gives
    rho = −1, and a duplicated value (tie) must not break ±1 since the
    tie is tied in BOTH variables (identical average ranks)."""
    rows = []
    for i in range(10):
        q = float(i // 2 + 1)  # ties: each quantity appears twice
        rows.append((1, 1, 1, i, q, 10.0 + i, 0.0, 0.0, "A", "F",
                     datetime.datetime(1995, 3, 5)))
        rows.append((2, 1, 1, i, q, 200.0 - i, 0.0, 0.0, "R", "F",
                     datetime.datetime(1995, 3, 5)))
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    d = str(tmp_path / "sf")
    df.write.parquet(f"{d}/lineitem.parquet")
    from velox_hadoop_spark.plans import registry

    out = {
        r.flag: r.spearman_rho
        for r in registry.queries()["spearman_rank_corr"](spark, d).collect()
    }
    # Price ties (pairs share a quantity but not a price) pull rho off
    # exactly 1; with 5 distinct quantities each duplicated, Spearman of
    # avg-ranks is still far above 0.9 — and symmetric for the inverse.
    assert out["A"] > 0.9
    assert out["R"] < -0.9
    assert out["A"] == -out["R"]


def test_cusum_finds_step_change(spark, tmp_path):
    """A flat series with one level shift must put the changepoint on
    the last day of the first regime (the |cusum| peak of a step)."""
    rows = []
    day0 = datetime.datetime(1994, 1, 1)
    for i in range(30):
        price = 100.0 if i < 12 else 300.0
        rows.append((i, 1, "O", price, day0 + datetime.timedelta(days=i), "3-MEDIUM"))
    d = _write_orders(spark, tmp_path, rows)
    from velox_hadoop_spark.plans import registry

    row = registry.queries()["cusum_changepoint_daily"](spark, d).first()
    assert row.change_day == (day0 + datetime.timedelta(days=11)).date()
    assert row.n_days == 30


def test_max_drawdown_known_series(spark, tmp_path):
    """Daily revenue 100, 500, 200, 400: worst drawdown is day 3 at
    (500−200)/500 = 0.6 — and a later, shallower dip must not win."""
    day0 = datetime.datetime(1994, 1, 1)
    vals = [100.0, 500.0, 200.0, 400.0]
    rows = [
        (i, 1, "O", v, day0 + datetime.timedelta(days=i), "3-MEDIUM")
        for i, v in enumerate(vals)
    ]
    d = _write_orders(spark, tmp_path, rows)
    from velox_hadoop_spark.plans import registry

    row = registry.queries()["max_drawdown_daily_revenue"](spark, d).first()
    assert row.day == (day0 + datetime.timedelta(days=2)).date()
    assert row.drawdown == 0.6
    assert row.peak_cents == 50000 and row.rev_cents == 20000


def test_mann_whitney_hand_computed(spark, tmp_path):
    """Hand-computed U on a 3-vs-3 sample WITH a cross-group tie:
    urgent {10, 20, 30}, low {20, 40, 50} (cents 1000/2000/3000 vs
    2000/4000/5000). Pooled avg ranks: 1, 2.5, 2.5, 4, 5, 6 →
    R1 = 1 + 2.5 + 4 = 7.5, U1 = 7.5 − 6 = 1.5, U2 = 9 − 1.5 = 7.5."""
    day = datetime.datetime(1995, 2, 1)
    rows = [
        (1, 1, "O", 10.0, day, "1-URGENT"),
        (2, 1, "O", 20.0, day, "1-URGENT"),
        (3, 1, "O", 30.0, day, "1-URGENT"),
        (4, 1, "O", 20.0, day, "5-LOW"),
        (5, 1, "O", 40.0, day, "5-LOW"),
        (6, 1, "O", 50.0, day, "5-LOW"),
        # outside the date window: must be ignored
        (7, 1, "O", 999.0, datetime.datetime(1996, 1, 1), "1-URGENT"),
    ]
    d = _write_orders(spark, tmp_path, rows)
    from velox_hadoop_spark.plans import registry

    row = registry.queries()["mann_whitney_u"](spark, d).first()
    assert (row.n1, row.n2) == (3, 3)
    assert row.u1 == 1.5 and row.u2 == 7.5


def test_map_filter_threshold_edge(spark, tmp_path):
    """map_filter keeps v >= 10 on DOUBLED counts: a 4-row cell
    (doubled 8) must drop, a 5-row cell (doubled 10) must stay — the
    boundary the oracle's HAVING mirrors."""
    day = datetime.datetime(1995, 2, 1)
    rows = [(i, 1, "O", 10.0, day, "2-HIGH") for i in range(5)]
    rows += [(10 + i, 1, "F", 10.0, day, "2-HIGH") for i in range(4)]
    d = _write_orders(spark, tmp_path, rows)
    from velox_hadoop_spark.plans import registry

    out = registry.queries()["map_functions_orders"](spark, d).collect()
    assert [(r.priority, r.status, r.n_doubled, r.n_statuses) for r in out] == [
        ("2-HIGH", "O", 10, 2)
    ]


def test_rsi_monotone_series_all_overbought(spark, tmp_path):
    """A strictly rising series has l = 0 in every window: every full
    window is overbought (3g > 0), none oversold/flat, avg RSI 100."""
    day0 = datetime.datetime(1994, 1, 1)
    rows = [
        (i, 1, "O", 100.0 + i, day0 + datetime.timedelta(days=i), "3-MEDIUM")
        for i in range(20)
    ]
    d = _write_orders(spark, tmp_path, rows)
    from velox_hadoop_spark.plans import registry

    row = registry.queries()["rsi_14_daily"](spark, d).first()
    # 19 deltas -> 6 full 14-delta windows
    assert row.n_days == 6
    assert row.n_overbought == 6
    assert row.n_oversold == 0 and row.n_flat == 0
    assert row.avg_rsi == 100.0


def test_hard_negatives_never_share_query_label(spark):
    """Every mined negative must carry a different label than its
    query, scores must be non-increasing within a query, and ranks
    must be a dense 1..k prefix."""
    from tests.conftest import SF_DIR
    from velox_hadoop_spark.plans import registry

    rows = registry.queries()["ann_hard_negatives"](spark, SF_DIR).collect()
    assert rows
    by_q = {}
    for r in rows:
        assert r.neighbor_label != r.query_label
        by_q.setdefault(r.query_id, []).append(r)
    for rs in by_q.values():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        cos = [r.cos for r in rs]
        assert cos == sorted(cos, reverse=True)


def test_dedup_recall_gate_bounds(spark):
    """The gate's counts must be consistent: caught ⊆ truth, recall in
    [0, 1], and recall exactly floor(caught/true·1e6+0.5)/1e6."""
    from tests.conftest import SF_DIR
    from velox_hadoop_spark.plans import registry

    row = registry.queries()["lsh_dedup_recall_gate"](spark, SF_DIR).first()
    assert 0 <= row.n_caught <= row.n_true
    if row.n_true:
        import math

        assert row.recall == math.floor(
            row.n_caught / row.n_true * 1e6 + 0.5
        ) / 1e6


def test_mann_whitney_single_group_z_is_null(spark, tmp_path):
    """With only URGENT rows in the window, n2 = 0: U statistics are
    NULL-propagated and z must be NULL (σ_U = 0) — under ANSI mode an
    unguarded division would raise DIVIDE_BY_ZERO instead."""
    day = datetime.datetime(1995, 2, 1)
    rows = [(i, 1, "O", 10.0 * (i + 1), day, "1-URGENT") for i in range(4)]
    d = _write_orders(spark, tmp_path, rows)
    from velox_hadoop_spark.plans import registry

    row = registry.queries()["mann_whitney_u"](spark, d).first()
    assert (row.n1, row.n2) == (4, 0)
    assert row.z is None


def test_dedup_recall_gate_empty_truth_is_null(spark, tmp_path):
    """A corpus with no Jaccard >= 0.5 pair (all-distinct texts) must
    report (0, 0, NULL), not crash on the zero division."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta", "en", "a", 30),
            (2, "one two three four five six", "en", "a", 25),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "sf")
    docs.write.parquet(f"{d}/documents.parquet")
    from velox_hadoop_spark.plans import registry

    row = registry.queries()["lsh_dedup_recall_gate"](spark, d).first()
    assert (row.n_true, row.n_caught) == (0, 0)
    assert row.recall is None


def test_acf_constant_series_is_null(spark, tmp_path):
    """corr against a zero-variance lag is NULL in both engines — the
    degenerate series must yield NULL acf, not crash or fake a 1.0."""
    day0 = datetime.datetime(1994, 1, 1)
    rows = [
        (i, 1, "O", 100.0, day0 + datetime.timedelta(days=i), "3-MEDIUM")
        for i in range(10)
    ]
    d = _write_orders(spark, tmp_path, rows)
    from velox_hadoop_spark.plans import registry

    out = registry.queries()["acf_daily_revenue"](spark, d).collect()
    assert len(out) == 7
    assert all(r.acf is None for r in out)
    assert [r.n_pairs for r in out] == [9, 8, 7, 6, 5, 4, 3]
