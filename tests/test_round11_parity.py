"""Round-11 parity and contract tests.

Covers the hot-key OOM close: every grouped-array pair generator now
drops over-cap keys with ``drop_hot_keys`` (count pre-pass + broadcast
anti-join) BEFORE the grouped ``collect_list``, so no aggregation
buffer ever materializes a hot bucket's id array. The tests here prove
(a) the guard is structurally in the plan — the anti-join sits below
the array-building aggregate, (b) the value semantics are unchanged on
a cap-binding fixture (over-cap keys dropped whole, cool keys intact),
and (c) a mega-hot key (50k rows on one key — the shape that OOMed the
old form at adversarial scale) streams through without building the
array.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from velox_hadoop_spark.operators.dedup import (
    drop_hot_keys,
    fuzzy_pairs_blocked,
    jaccard_pairs,
    lsh_candidate_pairs,
    simhash_near_dup_pairs,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _guard_below_collect(plan: str) -> bool:
    """The broadcast anti-join must appear BELOW (after, in the string —
    Spark prints the tree root-first) the array-building aggregate:
    plan text order is [... ObjectHashAggregate(collect_list) ...
    BroadcastHashJoin ... LeftAnti ...], i.e. the anti-join is an input
    of the aggregate, so rows are filtered before any buffer fills."""
    agg_at = plan.find("collect_list")
    anti_at = plan.find("LeftAnti")
    return anti_at != -1 and agg_at != -1 and anti_at > agg_at


def test_drop_hot_keys_drops_exactly_over_cap(spark):
    rows = [(k, i) for k in ("hot", "cool", "edge") for i in range(
        {"hot": 9, "cool": 3, "edge": 5}[k])]
    df = spark.createDataFrame(rows, "k string, v long")
    out = drop_hot_keys(df, ["k"], 5).groupBy("k").count().collect()
    got = {r["k"]: r["count"] for r in out}
    # cap = 5: "hot" (9 rows) dropped whole, "edge" (exactly 5) kept
    assert got == {"cool": 3, "edge": 5}


def test_drop_hot_keys_is_broadcast_anti_join(spark):
    df = spark.createDataFrame([("a", 1), ("a", 2), ("b", 3)], "k string, v long")
    plan = _plan(drop_hot_keys(df, ["k"], 1))
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_lsh_pairs_mega_hot_key_never_builds_array(spark):
    """50_000 rows on ONE band key — ~100× the cap. The round-10 shape
    buffered all 50k ids in one aggregation buffer before filtering;
    the guarded shape anti-joins them away first. Assertions: the plan
    has the anti-join below the collect aggregate, the hot bucket emits
    no pairs, and the cool bucket's pairs are intact."""
    hot = [(i, 0, "HOT") for i in range(50_000)]
    cool = [(100_000 + i, 0, "COOL") for i in range(4)]
    bands = spark.createDataFrame(
        hot + cool, "doc_id long, band_id int, band_key string"
    ).repartition(8)
    got = lsh_candidate_pairs(bands, "doc_id").collect()
    ids = {x for r in got for x in (r["id_a"], r["id_b"])}
    assert ids == {100_000, 100_001, 100_002, 100_003}
    assert len(got) == 6  # C(4,2)
    plan = _plan(lsh_candidate_pairs(bands, "doc_id"))
    assert _guard_below_collect(plan), plan


def test_jaccard_pairs_hot_shingle_guarded(spark):
    """A shingle carried by cap+… docs is dropped before the collect;
    Jaccard over the surviving shingle universe is self-consistent."""
    # 600 docs share shingle "X" (> cap 512); docs 1 and 2 also share "Y"
    rows = [(i, "X") for i in range(600)] + [(1, "Y"), (2, "Y"), (1, "Z"), (2, "Z")]
    sh = spark.createDataFrame(rows, "doc_id long, shingle string")
    got = {(r["id_a"], r["id_b"]): (r["n_shared"], r["jaccard"])
           for r in jaccard_pairs(sh, "doc_id").collect()}
    # capped universe: doc1 = {Y, Z}, doc2 = {Y, Z} -> jaccard 1.0
    assert got == {(1, 2): (2, 1.0)}
    assert _guard_below_collect(_plan(jaccard_pairs(sh, "doc_id")))


def test_simhash_and_fuzzy_blocked_guarded(spark):
    sigs = spark.createDataFrame(
        [(1, 7), (2, 7), (3, 6)], "doc_id long, simhash long"
    )
    assert _guard_below_collect(_plan(simhash_near_dup_pairs(sigs, "doc_id")))
    # block key is the LAST token — keep it equal so the pair blocks together
    names = spark.createDataFrame(
        [(1, "navy green box"), (2, "navy grean box")], "pid long, nm string"
    )
    plan = _plan(fuzzy_pairs_blocked(names, "pid", "nm"))
    assert _guard_below_collect(plan)
    got = fuzzy_pairs_blocked(names, "pid", "nm").collect()
    assert [(r["id_a"], r["id_b"], r["edit_dist"]) for r in got] == [(1, 2, 1)]


def test_simhash_hot_bucket_dropped_whole(spark):
    """cap+1 identical signatures in one band bucket: dropped by the
    guard in the Spark plan exactly as the oracle's HAVING mirror
    drops them — and two cool near-identical signatures still pair."""
    cap_plus = [(i, 0) for i in range(513)]  # band keys all 0
    cool = [(10_000, 1 << 16), (10_001, (1 << 16) | 1)]  # hamming 1
    sigs = spark.createDataFrame(cap_plus + cool, "doc_id long, simhash long")
    got = simhash_near_dup_pairs(sigs, "doc_id").collect()
    assert {(r["id_a"], r["id_b"]) for r in got} == {(10_000, 10_001)}


# ---------------------------------------------------------------------------
# Round-11 new queries: independent recomputes
# ---------------------------------------------------------------------------


def test_doremi_resample_report_matches_python_recompute(spark):
    """The report's cap/kept/share arithmetic recomputed in pure Python
    from the (independently-recomputed-in-r10) w2 weights and raw doc
    counts — the NEW logic this round is everything after w2."""
    import math

    from velox_hadoop_spark.operators.llmops9 import DOREMI_RESAMPLE_K
    from velox_hadoop_spark.plans.registry import queries

    sf = "/root/testdata/sf0.001"
    w2 = {
        r.source: r.w2
        for r in queries()["doremi_mixture_reweight"](spark, sf).collect()
    }
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    n_docs = {r.source: r.n for r in docs.groupBy("source").count()
              .withColumnRenamed("count", "n").collect()}
    kept = {
        s: min(math.floor(DOREMI_RESAMPLE_K * w2[s] + 0.5), n_docs[s])
        for s in w2
    }
    t = sum(kept.values())
    got = {
        r.source: (r.n_docs, r.target_cap, r.n_kept, r.kept_share,
                   r.target_share, r.share_gap)
        for r in queries()["doremi_resample_report"](spark, sf).collect()
    }
    assert set(got) == set(w2)
    for s in w2:
        ks = math.floor(kept[s] / t * 1e6 + 0.5) / 1e6
        want = (
            n_docs[s],
            math.floor(DOREMI_RESAMPLE_K * w2[s] + 0.5),
            kept[s],
            ks,
            round(w2[s], 6),
            round(ks - round(w2[s], 6), 6),
        )
        assert got[s] == want, (s, got[s], want)
    # conservation: realized shares sum to ~1 on the 1e-6 grid
    assert abs(sum(g[3] for g in got.values()) - 1.0) < 1e-4


def test_cluster_reassign_suggestions_match_numpy_recompute(spark):
    """The suggestion list recomputed in numpy from the kernel's own
    centroids: alt cluster = argmin other-centroid distance (min cid on
    ties), global top-25 by the exact 1e-6-grid silhouette integer."""
    import math

    import numpy as np

    from velox_hadoop_spark.operators.clustering import kmeans
    from velox_hadoop_spark.operators.llmops9 import REASSIGN_N
    from velox_hadoop_spark.operators.similarity import round_half_away
    from velox_hadoop_spark.plans.registry import queries

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    assigned, cents = kmeans(emb, return_centroids=True)
    arows = {r.vec_id: (r.cluster, r.dist) for r in assigned.collect()}
    crows = {r.cid: np.array(r.ce, dtype=np.float64) for r in cents.collect()}
    vrows = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    scored = []
    for vid, (cl, a) in arows.items():
        others = sorted(
            (float(round_half_away(((vrows[vid] - ce) ** 2).sum(), 6)), cid)
            for cid, ce in crows.items()
            if cid != cl
        )
        b, alt = others[0]
        s = (b - a) / max(a, b) if max(a, b) > 0 else 0.0
        scored.append((math.floor(s * 1e6 + 0.5), vid, cl, alt, a, b))
    want = {
        (cl, vid, alt, a, b, round(sq / 1e6, 6), rnk)
        for rnk, (sq, vid, cl, alt, a, b) in enumerate(
            sorted(scored)[:REASSIGN_N], start=1
        )
    }
    got = {
        (r.cluster, r.vec_id, r.alt_cluster, r.a_dist, r.b_dist,
         r.silhouette, r.rnk)
        for r in queries()["cluster_reassign_suggestions"](spark, sf).collect()
    }
    assert got == want
    assert len(got) == min(REASSIGN_N, len(scored))


def test_drop_hot_keys_null_keys_dropped_entirely(spark):
    """NULL-keyed rows participate in NO bucket, hot or cool — the
    oracles mirror the cap as [GROUP BY key HAVING count <= cap]
    REJOINED with an equi-join, which never matches a NULL key (the
    round-11 review's catch, both passes): a hot all-NULL block must
    not reach the collect buffer AND a cool NULL block must not emit
    pairs the oracle cannot."""
    rows = [(None, i) for i in range(7)] + [("k", 1), ("k", 2)]
    df = spark.createDataFrame(rows, "k string, v long")
    got = {
        (r["k"], r["count"])
        for r in drop_hot_keys(df, ["k"], 5).groupBy("k").count().collect()
    }
    assert got == {("k", 2)}
    cool = drop_hot_keys(df.where(F.col("v") < 3), ["k"], 5)
    got2 = {
        (r["k"], r["count"]) for r in cool.groupBy("k").count().collect()
    }
    assert got2 == {("k", 2)}


def test_session_kernel_null_values_sql_sum_semantics(spark):
    """NULL event values contribute nothing; an all-NULL session totals
    NULL (not 0, not a crash) — matching the oracle's SUM."""
    from velox_hadoop_spark.streaming.stateful import _walk_sessions

    closed, cur = _walk_sessions([0, 1, 2], [None, 1.25, float("nan")], None)
    assert closed == []
    assert cur == (0, 2, 3, 125)
    closed, cur = _walk_sessions([0, 1], [None, None], None)
    assert cur == (0, 1, 2, None)


def test_sketch_bounds_audits_oracle_parity(spark, duck):
    """The three converted bounds-audit queries (round 11: rows-only →
    hash-oracled) get the standard oracle-parity check so CI covers
    them between driver rounds — the registered query is now the audit
    twin, the sketch-only production plans are tested in
    test_tpch_more.py / test_round9_parity.py."""
    from tests.conftest import assert_parity

    for name in (
        "approx_distinct_parts_per_supplier",
        "approx_percentiles_price",
        "hll_weekly_merge_rollup",
    ):
        assert_parity(spark, duck, name)


def test_drop_hot_keys_unpersisted_form_value_identical(spark):
    """persist_input=False (the escape hatch for callers that cannot
    afford the materialization) yields the same rows through the same
    guarded plan, just without the InMemoryRelation."""
    rows = [("hot", i) for i in range(9)] + [("a", 1), ("a", 2), ("b", 3)]
    df = spark.createDataFrame(rows, "k string, v long")
    on = {(r["k"], r["v"]) for r in drop_hot_keys(df, ["k"], 5).collect()}
    # the True call above cached the keyed frame; Spark's cache manager
    # would substitute it into ANY matching later plan, so clear before
    # asserting the uncached shape
    spark.catalog.clearCache()
    off = drop_hot_keys(df, ["k"], 5, persist_input=False)
    assert {(r["k"], r["v"]) for r in off.collect()} == on
    tree = off._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in tree and "InMemoryTableScan" not in tree
