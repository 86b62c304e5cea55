"""Round-8 independent-verification tests.

The r7 program's rule, carried forward: every NEW registration whose
oracle mirrors the Spark formula ships a plain-Python brute-force
recompute or a conservation/bounds invariant in the same commit —
oracle parity cannot catch a formula error both engines share (the
vocab_growth_curve lesson). Kernels whose oracle is already an
independent formulation (correlated subqueries for the as-of joins)
need no recompute and are noted as such.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from velox_hadoop_spark.plans import registry

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _daily_rev(sf=SF_SMALL):
    """Independent daily (date, rev_cents, n_orders) via plain DuckDB scan."""
    return duckdb.sql(
        f"""
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c,
               count(*) AS n
        FROM '{sf}/orders.parquet' GROUP BY 1 ORDER BY 1
        """
    ).fetchall()


# ---------------------------------------------------------------------------
# MACD: brute-force truncated-EMA recompute (mirrored-oracle kernel)
# ---------------------------------------------------------------------------


def test_macd_brute_force_recompute(spark):
    from velox_hadoop_spark.operators.timeseries4 import (
        MACD_FAST,
        MACD_HORIZON,
        MACD_SIGNAL,
        MACD_SLOW,
    )

    daily = _daily_rev()
    days = [r[0] for r in daily]
    rev = {r[0]: r[1] / 100.0 for r in daily}

    def ema(series: dict, alpha: float) -> dict:
        out = {}
        for d in days:
            num = den = 0.0
            for b in days:
                age = (d - b).days
                if 0 <= age <= MACD_HORIZON - 1 and b in series:
                    w = (1.0 - alpha) ** age
                    num += series[b] * w
                    den += w
            out[d] = num / den
        return out

    r4 = lambda x: math.floor(x * 10000 + 0.5) / 10000  # noqa: E731
    fast, slow = ema(rev, MACD_FAST), ema(rev, MACD_SLOW)
    macd = {d: r4(fast[d] - slow[d]) for d in days}
    sig = {d: r4(v) for d, v in ema(macd, MACD_SIGNAL).items()}

    got = {
        r.d: r
        for r in registry.specs()["macd_daily_revenue"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(days)
    for d in days:
        assert got[d].macd == pytest.approx(macd[d], abs=2e-4), d
        assert got[d].signal == pytest.approx(sig[d], abs=2e-4), d
        assert got[d].histogram == pytest.approx(
            r4(macd[d] - sig[d]), abs=2e-4
        ), d


# ---------------------------------------------------------------------------
# Kendall tau-b: brute-force pair scan (mirrored-oracle kernel)
# ---------------------------------------------------------------------------


def test_kendall_tau_brute_force_recompute(spark):
    daily = _daily_rev()
    C = D = TX = TY = 0
    for i in range(len(daily)):
        for j in range(i + 1, len(daily)):
            dx = daily[i][1] - daily[j][1]
            dy = daily[i][2] - daily[j][2]
            if dx * dy > 0:
                C += 1
            elif dx * dy < 0:
                D += 1
            elif dx == 0 and dy != 0:
                TX += 1
            elif dx != 0 and dy == 0:
                TY += 1
    tau = (C - D) / math.sqrt((C + D + TX) * (C + D + TY))

    row = registry.specs()["kendall_tau_daily"].fn(spark, SF_SMALL).collect()[0]
    assert row.n_concordant == C and row.n_discordant == D
    assert row.tau_b == pytest.approx(round(tau, 6), abs=2e-6)
    assert -1.0 <= row.tau_b <= 1.0


# ---------------------------------------------------------------------------
# Grouped LOCF fill: conservation invariants (mirrored window formula)
# ---------------------------------------------------------------------------


def test_grouped_locf_fill_conservation(spark):
    """(1) Observed cells carry their own day average with gap_days=0;
    (2) filled cells carry EXACTLY the group's latest prior observed
    average and gap_days equals the day distance to it; (3) every
    group emits one row per spine day from its first observation on."""
    obs_rows = duckdb.sql(
        f"""
        SELECT event_type, CAST(ts AS DATE) AS d, ROUND(avg(value), 6) AS v
        FROM '{SF_SMALL}/events.parquet' GROUP BY 1, 2
        """
    ).fetchall()
    obs = {(r[0], r[1]): r[2] for r in obs_rows}
    all_days = sorted({d for _, d in obs})
    got = {
        (r.event_type, r.d): r
        for r in registry.specs()["grouped_locf_daily_fill"]
        .fn(spark, SF_SMALL)
        .collect()
    }

    types = {t for t, _ in obs}
    n_expected = 0
    for t in types:
        t_days = sorted(d for tt, d in obs if tt == t)
        first = t_days[0]
        last_obs = None
        for d in all_days:
            if d < first:
                assert (t, d) not in got
                continue
            n_expected += 1
            if (t, d) in obs:
                last_obs = d
            row = got[(t, d)]
            assert row.filled_avg == pytest.approx(obs[(t, last_obs)], abs=1e-9)
            assert row.gap_days == (d - last_obs).days
    assert len(got) == n_expected


# ---------------------------------------------------------------------------
# As-of joins: oracle is an independent correlated subquery — no
# recompute needed; pin the tolerance semantics on a synthetic frame.
# ---------------------------------------------------------------------------


def test_decontam_span_merge_brute_force(spark):
    """Interval-merge recompute, independent of both engines' window
    formula: rebuild the positioned 13-gram hits in plain Python (set
    intersection of tokenized grams), merge [pos, pos+12] intervals
    with a sort-and-sweep, and compare spans/coverage per doc. Also
    checks the hit-span query's extremes against the same ground
    truth."""
    from velox_hadoop_spark.operators.contamination import BENCH_SOURCE
    from velox_hadoop_spark.operators.contamination2 import DECONTAM13_K as K

    docs = duckdb.sql(
        f"SELECT doc_id, source, text FROM '{SF_SMALL}/documents.parquet'"
    ).fetchall()
    bench_grams = set()
    for _, source, text in docs:
        if source == BENCH_SOURCE:
            w = text.split()
            bench_grams.update(
                " ".join(w[i : i + K]) for i in range(len(w) - K + 1)
            )
    expected = {}
    for doc_id, source, text in docs:
        if source == BENCH_SOURCE:
            continue
        w = text.split()
        hits = sorted(
            i + 1
            for i in range(len(w) - K + 1)
            if " ".join(w[i : i + K]) in bench_grams
        )
        if not hits:
            continue
        spans = []
        for p in hits:  # sort-and-sweep merge of [p, p+K-1]
            if spans and p <= spans[-1][1] + 1:
                spans[-1][1] = max(spans[-1][1], p + K - 1)
            else:
                spans.append([p, p + K - 1])
        covered = sum(e - s + 1 for s, e in spans)
        expected[doc_id] = (hits, spans, covered, len(w))

    got_cov = {
        r.doc_id: r
        for r in registry.specs()["decontam_span_coverage"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    got_spans = {
        r.doc_id: r
        for r in registry.specs()["decontam_13gram_hit_spans"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    assert set(got_cov) == set(expected) and set(got_spans) == set(expected)
    for doc_id, (hits, spans, covered, n_tokens) in expected.items():
        c = got_cov[doc_id]
        assert c.n_spans == len(spans) and c.covered_tokens == covered
        assert c.coverage_frac == pytest.approx(round(covered / n_tokens, 6))
        s = got_spans[doc_id]
        assert s.n_hits == len(hits)
        assert s.first_hit_pos == hits[0] and s.last_hit_pos == hits[-1]
    assert expected, "corpus must contain at least one contaminated doc"


def test_asof_tolerance_synthetic_semantics(spark):
    """A click exactly AT the bound is fresh (inclusive); one second
    past is NULL; a later purchase reuses the same carried click while
    fresh. Built on a synthetic frame so the bound itself is exercised
    (real data rarely lands a pair exactly on the boundary)."""
    import datetime as dt

    from velox_hadoop_spark.operators import timeseries4

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = timeseries4.ASOF_TOLERANCE_S
    rows = [
        (1, t0, 7, "click", 5.0, None),
        (2, t0 + dt.timedelta(seconds=s), 7, "purchase", 1.0, None),
        (3, t0 + dt.timedelta(seconds=s + 1), 7, "purchase", 2.0, None),
        (4, t0 + dt.timedelta(seconds=10), 8, "purchase", 3.0, None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(f"{tmp}/events.parquet")
        out = {
            r.event_id: r.click_value_10m
            for r in timeseries4.q_asof_join_tolerance(spark, tmp).collect()
        }
    assert out[2] == 5.0  # exactly at the bound: fresh
    assert out[3] is None  # one second stale: expired
    assert out[4] is None  # user with no click at all
