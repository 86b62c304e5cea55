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


# ---------------------------------------------------------------------------
# dedup2: independent recomputes and conservation invariants
# ---------------------------------------------------------------------------


def _md5_60(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _bucket(key, seed: str, n: int = 100) -> int:
    return _md5_60(f"{seed}|{key}") % n


def test_epoch_sampling_brute_force(spark):
    """Recompute every epoch membership in plain-Python MD5 — all seven
    overlap counters and both quota plans must match exactly (the hash
    formula is mirrored in the oracle, so parity alone can't catch a
    shared seeding mistake)."""
    from velox_hadoop_spark.operators.dedup2 import (
        EPOCH_PCT,
        EPOCH_SEEDS,
        QUOTA_PER_SOURCE,
    )

    docs = duckdb.sql(
        f"SELECT doc_id, source FROM '{SF_SMALL}/documents.parquet'"
    ).fetchall()
    members = [
        {d for d, _ in docs if _bucket(d, s) < EPOCH_PCT} for s in EPOCH_SEEDS
    ]
    row = registry.specs()["epoch_sample_overlap"].fn(spark, SF_SMALL).collect()[0]
    assert (row.n_epoch0, row.n_epoch1, row.n_epoch2) == tuple(
        len(m) for m in members
    )
    assert row.n_overlap_01 == len(members[0] & members[1])
    assert row.n_overlap_12 == len(members[1] & members[2])
    assert row.n_overlap_02 == len(members[0] & members[2])
    assert row.n_never_sampled == len(
        {d for d, _ in docs} - members[0] - members[1] - members[2]
    )

    # exact quotas: the K smallest re-seeded hashes per source, per epoch
    expected = {}
    sources = {}
    for d, src in docs:
        sources.setdefault(src, []).append(d)
    for e, seed in enumerate(EPOCH_SEEDS[:2]):
        for src, ids in sources.items():
            pick = sorted(ids, key=lambda d: (_md5_60(f"{seed}|{d}"), d))[
                :QUOTA_PER_SOURCE
            ]
            expected[(e, src)] = (len(pick), sum(pick))
    got = {
        (r.epoch, r.source): (r.n_sampled, r.id_checksum)
        for r in registry.specs()["epoch_quota_exact_per_source"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    assert got == expected


def test_tablesample_nesting_and_fractions(spark):
    """The three samples are nested by construction and their counts
    match a plain-Python bucket recompute."""
    ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{SF_SMALL}/documents.parquet'"
        ).fetchall()
    ]
    buckets = {d: _bucket(d, "split42") for d in ids}
    got = {
        r.pct: r
        for r in registry.specs()["tablesample_parity_report"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    prev = set()
    for pct in (10, 20, 50):
        sample = {d for d in ids if buckets[d] < pct}
        assert got[pct].n_docs == len(sample)
        assert prev <= sample  # nesting
        assert got[pct].observed_frac == pytest.approx(
            round(len(sample) / len(ids), 6)
        )
        prev = sample


def test_cross_snapshot_decay_keeper_invariants(spark):
    """Conservation + keeper optimality, independent of the mirrored
    keeper SQL: Σ n_docs = corpus size, Σ n_kept = number of clusters,
    and for every cluster the keeper chosen by the Spark pipeline has
    the maximum decayed weight (tie → lowest id) among its members."""
    from velox_hadoop_spark.operators.dedup2 import (
        DECAY_MILLE,
        N_SNAPSHOTS,
        SNAP_SEED,
        _cluster_labels,
    )

    labels = {
        r.doc_id: r.cluster_id
        for r in _cluster_labels(spark, SF_SMALL).collect()
    }
    chars = dict(
        duckdb.sql(
            f"SELECT doc_id, n_chars FROM '{SF_SMALL}/documents.parquet'"
        ).fetchall()
    )
    clusters = {}
    for d, c in labels.items():
        clusters.setdefault(c, []).append(d)
    keepers = {}
    for c, ids in clusters.items():
        keepers[c] = max(
            ids,
            key=lambda d: (
                chars[d] * DECAY_MILLE[_bucket(d, SNAP_SEED, N_SNAPSHOTS)],
                -d,
            ),
        )
    per_snap_kept = {}
    per_snap_docs = {}
    per_snap_chars = {}
    for d in labels:
        s = _bucket(d, SNAP_SEED, N_SNAPSHOTS)
        per_snap_docs[s] = per_snap_docs.get(s, 0) + 1
        if d == keepers[labels[d]]:
            per_snap_kept[s] = per_snap_kept.get(s, 0) + 1
            per_snap_chars[s] = per_snap_chars.get(s, 0) + chars[d]
    got = {
        r.snapshot: r
        for r in registry.specs()["cross_snapshot_dedup_decay"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    assert sum(r.n_docs for r in got.values()) == len(labels)
    assert sum(r.n_kept for r in got.values()) == len(clusters)
    for s, r in got.items():
        assert r.n_docs == per_snap_docs.get(s, 0)
        assert r.n_kept == per_snap_kept.get(s, 0)
        assert r.n_dropped == r.n_docs - r.n_kept
        assert r.kept_chars == per_snap_chars.get(s, 0)


def test_intra_cluster_jaccard_brute_force(spark):
    """Exact 5-gram Jaccard recompute in plain-Python sets over the
    pipeline's own cluster assignment (cluster derivation is already
    cross-checked by dedup_clusters' recursive-CTE oracle); pins the
    shingle cap, the member cap, and the zero-overlap pairs the
    shared-shingle join must not drop."""
    from velox_hadoop_spark.operators.dedup import MAX_KEY_DOC_FREQ, SHINGLE_K
    from velox_hadoop_spark.operators.dedup2 import (
        CLUSTER_AUDIT_CAP,
        _cluster_labels,
    )

    texts = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM '{SF_SMALL}/documents.parquet'"
        ).fetchall()
    )
    shingles = {}
    for d, t in texts.items():
        w = t.split()
        shingles[d] = {
            " ".join(w[i : i + SHINGLE_K]) for i in range(len(w) - SHINGLE_K + 1)
        }
    freq = {}
    for s in shingles.values():
        for g in s:
            freq[g] = freq.get(g, 0) + 1
    hot = {g for g, c in freq.items() if c > MAX_KEY_DOC_FREQ}
    capped = {d: s - hot for d, s in shingles.items()}

    labels = {
        r.doc_id: r.cluster_id
        for r in _cluster_labels(spark, SF_SMALL).collect()
    }
    clusters = {}
    for d, c in labels.items():
        clusters.setdefault(c, []).append(d)

    expected = {}
    for c, ids in clusters.items():
        if len(ids) < 2:
            continue
        members = sorted(ids)[:CLUSTER_AUDIT_CAP]
        js = []
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                a, b = capped[members[i]], capped[members[j]]
                inter = len(a & b)
                js.append(inter / (len(a) + len(b) - inter))
        expected[c] = (
            len(ids),
            len(js),
            round(sum(js) / len(js), 6),
            round(min(js), 6),
        )

    got = {
        r.cluster_id: (r.n_members, r.n_pairs, r.avg_jaccard, r.min_jaccard)
        for r in registry.specs()["intra_cluster_jaccard_audit"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    assert set(got) == set(expected)
    for c in expected:
        assert got[c][:2] == expected[c][:2], c
        assert got[c][2] == pytest.approx(expected[c][2], abs=2e-6), c
        assert got[c][3] == pytest.approx(expected[c][3], abs=2e-6), c
    assert expected, "corpus must contain at least one multi-member cluster"


# ---------------------------------------------------------------------------
# Large-star/small-star CC: cross-implementation equivalence + depth
# ---------------------------------------------------------------------------


def test_lss_equals_union_find_on_lsh_graph(spark):
    """connected_components_lss and dedup.connected_components (driver
    union-find / label propagation) must assign IDENTICAL labels on the
    real LSH candidate-pair graph — two independent algorithms, one
    truth. This is the cross-implementation check the recursive-CTE
    oracle can't give (it mirrors only one edge derivation)."""
    from velox_hadoop_spark.operators.dedup import (
        connected_components,
        lsh_bands,
        lsh_candidate_pairs,
        minhash_signature_inline,
    )
    from velox_hadoop_spark.operators.graph import connected_components_lss

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    sig = minhash_signature_inline(docs, "doc_id", "text")
    pairs = lsh_candidate_pairs(lsh_bands(sig, "doc_id"), "doc_id").persist()
    try:
        a = {r.node: r.lbl for r in connected_components(pairs).collect()}
        b = {r.node: r.lbl for r in connected_components_lss(pairs).collect()}
    finally:
        pairs.unpersist()
    assert a == b
    assert a, "LSH graph must be non-empty at this SF"


def test_lss_collapses_long_chain(spark):
    """A 200-node chain — the adversarial topology for per-pass label
    propagation — must collapse to one component rooted at the min id
    within the default pass budget (LSS's O(log n) round bound is the
    100 TB story; this pins it on depth the real corpus never has)."""
    from velox_hadoop_spark.operators.graph import connected_components_lss

    n = 200
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "id_a long, id_b long"
    )
    labels = {r.node: r.lbl for r in connected_components_lss(chain).collect()}
    assert labels == {i: 1 for i in range(1, n + 1)}


# ---------------------------------------------------------------------------
# stats3: brute-force recomputes (no scipy — plain arithmetic)
# ---------------------------------------------------------------------------


def _priority_cents(sf=SF_SMALL):
    return duckdb.sql(
        f"""SELECT o_orderpriority, CAST(round(o_totalprice*100) AS BIGINT)
            FROM '{sf}/orders.parquet'"""
    ).fetchall()


def test_kruskal_wallis_brute_force(spark):
    rows = _priority_cents()
    vals = sorted(v for _, v in rows)
    # midranks per value
    rank_of = {}
    i = 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        rank_of[vals[i]] = (i + 1 + j) / 2.0  # avg of ranks i+1..j
        i = j
    groups = {}
    for g, v in rows:
        groups.setdefault(g, []).append(rank_of[v])
    n = len(rows)
    s = sum(sum(rs) ** 2 / len(rs) for rs in groups.values())
    h = 12.0 / (n * (n + 1)) * s - 3 * (n + 1)
    from collections import Counter

    tie3 = sum(t**3 - t for t in Counter(vals).values())
    hc = h / (1 - tie3 / (n**3 - n))

    row = registry.specs()["kruskal_wallis_priority"].fn(spark, SF_SMALL).collect()[0]
    assert row.n == n and row.k == len(groups)
    assert row.h == pytest.approx(round(h, 6), abs=2e-6)
    assert row.h_tie_corrected == pytest.approx(round(hc, 6), abs=2e-6)


def test_jarque_bera_brute_force(spark):
    rows = _priority_cents()
    groups = {}
    for g, v in rows:
        groups.setdefault(g, []).append(v)
    got = {
        r.g: r
        for r in registry.specs()["jarque_bera_order_values"]
        .fn(spark, SF_SMALL)
        .collect()
    }
    assert set(got) == set(groups)
    for g, vs in groups.items():
        n = len(vs)
        m = sum(vs) / n
        m2 = sum((x - m) ** 2 for x in vs) / n
        m3 = sum((x - m) ** 3 for x in vs) / n
        m4 = sum((x - m) ** 4 for x in vs) / n
        S, K = m3 / m2**1.5, m4 / m2**2
        jb = n / 6.0 * (S**2 + (K - 3) ** 2 / 4.0)
        assert got[g].skewness == pytest.approx(S, abs=2e-6)
        assert got[g].kurtosis == pytest.approx(K, abs=2e-6)
        assert got[g].jb == pytest.approx(jb, rel=1e-5)


def test_brown_forsythe_brute_force(spark):
    rows = _priority_cents()
    groups = {}
    for g, v in rows:
        groups.setdefault(g, []).append(v)

    def median(vs):
        vs = sorted(vs)
        n = len(vs)
        return (
            vs[n // 2] if n % 2 else (vs[n // 2 - 1] + vs[n // 2]) / 2.0
        )

    z = {g: [abs(x - median(vs)) for x in vs] for g, vs in groups.items()}
    n = sum(len(v) for v in z.values())
    k = len(z)
    zbar = sum(sum(v) for v in z.values()) / n
    ssb = sum(len(v) * (sum(v) / len(v) - zbar) ** 2 for v in z.values())
    ssw = sum(
        sum((x - sum(v) / len(v)) ** 2 for x in v) for v in z.values()
    )
    f = (ssb / (k - 1)) / (ssw / (n - k))
    row = registry.specs()["brown_forsythe_priority"].fn(spark, SF_SMALL).collect()[0]
    assert (row.n, row.k) == (n, k)
    assert row.f_stat == pytest.approx(round(f, 6), abs=2e-6)


def test_cramers_v_brute_force(spark):
    rows = duckdb.sql(
        f"SELECT o_orderstatus, o_orderpriority FROM '{SF_SMALL}/orders.parquet'"
    ).fetchall()
    from collections import Counter

    obs = Counter(rows)
    rt = Counter(r for r, _ in rows)
    ct = Counter(c for _, c in rows)
    n = len(rows)
    chi2 = 0.0
    for r in rt:
        for c in ct:
            e = rt[r] * ct[c] / n
            chi2 += (obs.get((r, c), 0) - e) ** 2 / e
    v = (chi2 / (n * (min(len(rt), len(ct)) - 1))) ** 0.5
    row = (
        registry.specs()["cramers_v_status_priority"].fn(spark, SF_SMALL).collect()[0]
    )
    assert (row.n, row.n_rows, row.n_cols) == (n, len(rt), len(ct))
    assert row.chi2 == pytest.approx(chi2, rel=1e-6)
    assert row.cramers_v == pytest.approx(round(v, 6), abs=2e-6)
    assert 0.0 <= row.cramers_v <= 1.0


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
