"""Round-9 independent-verification tests.

The standing rule (r7/r8 program): every NEW registration whose oracle
mirrors the Spark formula ships a plain-Python brute-force recompute or
a conservation/bounds invariant in the same commit — oracle parity
cannot catch a formula error both engines share. Rows-only
registrations (the HLL sketch rollup) get their tolerance and algebraic
properties pinned here instead.
"""

from __future__ import annotations

import math
import os
import re

import duckdb
import pytest

from velox_hadoop_spark.plans import registry

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# Repeated-span removal: plain-Python recompute + token conservation
# ---------------------------------------------------------------------------


def _py_span_removal(texts: dict[int, str], k: int, min_docs: int = 2):
    """Independent plain-Python reimplementation: returns
    {doc_id: (n_tokens, spans[(s,e)], kept_text)} for affected docs."""
    toks = {d: re.split(r"\s+", t) for d, t in texts.items()}
    gram_docs: dict[str, set[int]] = {}
    positions: dict[int, list[int]] = {d: [] for d in texts}
    grams: dict[tuple[int, int], str] = {}
    for d, w in toks.items():
        for i in range(len(w) - k + 1):
            g = " ".join(w[i : i + k])
            gram_docs.setdefault(g, set()).add(d)
            grams[(d, i)] = g
    out = {}
    for d, w in toks.items():
        hit = sorted(
            {i for i in range(len(w) - k + 1) if len(gram_docs[grams[(d, i)]]) >= min_docs}
        )
        if not hit:
            continue
        # interval merge of [i, i+k-1] covers (0-based)
        spans = []
        s = e = None
        for i in hit:
            if s is None:
                s, e = i, i + k - 1
            elif i <= e + 1:
                e = max(e, i + k - 1)
            else:
                spans.append((s, e))
                s, e = i, i + k - 1
        spans.append((s, e))
        removed = set()
        for a, b in spans:
            removed.update(range(a, b + 1))
        kept = [w[i] for i in range(len(w)) if i not in removed]
        out[d] = (len(w), spans, " ".join(kept))
    return out


def test_repeated_span_removal_python_recompute(spark):
    """Synthetic corpus with a known shared 13-token run (plus an
    intra-doc-only repeat that must NOT be removed) vs the kernel."""
    from velox_hadoop_spark.operators.spanremoval import (
        SPANREM_K,
        merged_removal_spans,
    )

    k = SPANREM_K
    shared = " ".join(f"s{i}" for i in range(k + 3))  # 16-token shared run
    texts = {
        1: f"a1 a2 a3 {shared} b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 b11 b12 b13",
        2: f"c1 c2 {shared} d1 d2 d3 d4 d5 d6 d7 d8 d9 d10 d11 d12 d13 d14",
        # doc 3: repeats ITS OWN run twice but shares nothing cross-doc
        3: " ".join(f"e{i}" for i in range(k)) + " x " + " ".join(f"e{i}" for i in range(k)),
        # doc 4: too short to shingle
        4: "f1 f2 f3",
    }
    docs = spark.createDataFrame(
        [(d, t, "srcT") for d, t in texts.items()], "doc_id long, text string, source string"
    )
    merged = merged_removal_spans(docs).collect()
    by_doc: dict[int, list[tuple[int, int]]] = {}
    for r in merged:
        by_doc.setdefault(r["doc_id"], []).append((r["s"], r["e"]))
    expect = _py_span_removal(texts, k)
    assert set(by_doc) == set(expect) == {1, 2}
    for d in by_doc:
        # kernel positions are 1-based; python recompute is 0-based
        got_spans = sorted((s - 1, e - 1) for s, e in by_doc[d])
        assert got_spans == expect[d][1], (d, got_spans, expect[d][1])


def test_repeated_span_removal_conservation(spark):
    """kept + removed = n_tokens on the real corpus, kept_text token
    count equals kept_tokens, and the by-source rollup conserves the
    same masses."""
    q = registry.queries()
    rows = q["repeated_span_removal"](spark, SF_SMALL).collect()
    assert rows, "expected affected docs at sf0.001"
    for r in rows:
        assert r["kept_tokens"] + r["removed_tokens"] == r["n_tokens"], r
        n_text_tokens = len(r["kept_text"].split()) if r["kept_text"] else 0
        assert n_text_tokens == r["kept_tokens"], r
        assert r["n_spans"] >= 1 and r["removed_tokens"] >= 13
    by_src = q["repeated_span_removal_by_source"](spark, SF_SMALL).collect()
    assert sum(r["n_affected"] for r in by_src) == len(rows)
    for r in by_src:
        assert r["kept_tokens"] + r["removed_tokens"] == r["total_tokens"], r
    assert sum(r["removed_tokens"] for r in by_src) == sum(
        r["removed_tokens"] for r in rows
    )


# ---------------------------------------------------------------------------
# DSIR: brute-force log-ratio recompute + selection-boundary gap
# ---------------------------------------------------------------------------


def _py_dsir_scores(sf=SF_SMALL, target="src1"):
    """Plain-Python add-1 bigram LM log2-ratio, independent of both
    engines' SQL."""
    rows = duckdb.sql(
        f"SELECT doc_id, source, text FROM '{sf}/documents.parquet'"
    ).fetchall()
    toks = {d: (src, re.split(r"\s+", t)) for d, src, t in rows}
    tc: dict[tuple[str, str], int] = {}
    rc: dict[tuple[str, str], int] = {}
    vocab = set()
    for _, (src, w) in toks.items():
        vocab.update(w)
        tgt = src == target
        for i in range(len(w) - 1):
            key = (w[i], w[i + 1])
            (tc if tgt else rc)[key] = (tc if tgt else rc).get(key, 0) + 1
    tu: dict[str, int] = {}
    ru: dict[str, int] = {}
    for (w1, _), c in tc.items():
        tu[w1] = tu.get(w1, 0) + c
    for (w1, _), c in rc.items():
        ru[w1] = ru.get(w1, 0) + c
    v = len(vocab)
    out = {}
    for d, (src, w) in toks.items():
        if src == target or len(w) < 2:
            continue
        terms = []
        for i in range(len(w) - 1):
            key = (w[i], w[i + 1])
            lt = math.log2((tc.get(key, 0) + 1.0) / (tu.get(w[i], 0) + v))
            lr = math.log2((rc[key] + 1.0) / (ru[w[i]] + v))
            terms.append(lt - lr)
        out[d] = (src, len(terms), sum(terms) / len(terms))
    return out


def test_dsir_logratio_brute_force(spark):
    got = {
        r["doc_id"]: r
        for r in registry.queries()["dsir_logratio_scores"](spark, SF_SMALL).collect()
    }
    expect = _py_dsir_scores()
    assert set(got) == set(expect)
    for d, (src, nb, lr) in expect.items():
        assert got[d]["source"] == src
        assert got[d]["n_bigrams"] == nb
        assert abs(got[d]["avg_logratio"] - lr) < 1e-6, (d, got[d]["avg_logratio"], lr)


def test_dsir_resample_selection_gap_and_weights(spark):
    """The A-ES selection boundary must sit orders of magnitude above
    cross-engine libm/accumulation noise, and the selected set must be
    exactly the K smallest keys recomputed from the score frame."""
    from velox_hadoop_spark.operators.llmops6 import DSIR_K, DSIR_MOD, DSIR_SEED, LN2

    import hashlib

    expect_scores = _py_dsir_scores()

    def key(d, lr):
        h = hashlib.md5(f"{DSIR_SEED}|{d}".encode()).hexdigest()
        u = (int(h[:15], 16) % DSIR_MOD + 1) / float(DSIR_MOD + 1)
        return math.log(-math.log(u)) - lr * LN2

    keys = sorted((key(d, lr), d) for d, (_, _, lr) in expect_scores.items())
    picked = registry.queries()["dsir_importance_resample"](spark, SF_SMALL).collect()
    assert len(picked) == DSIR_K
    assert {r["doc_id"] for r in picked} == {d for _, d in keys[:DSIR_K]}
    gap = keys[DSIR_K][0] - keys[DSIR_K - 1][0]
    assert gap > 1e-9, f"selection boundary gap {gap} too tight to be stable"


# ---------------------------------------------------------------------------
# SemDeDup: numpy recompute of the prune rule + partition invariants
# ---------------------------------------------------------------------------


def test_semdedup_prune_rule_numpy_recompute(spark):
    """Given the (already independently-oracled) kmeans assignment,
    recompute the dominance/prune rule with numpy cosines and compare
    the pruned set and dominators exactly."""
    import numpy as np

    from velox_hadoop_spark.operators.llmops6 import SEMDEDUP_TAU, semdedup_members, semdedup_pruned
    from velox_hadoop_spark.functions.vectors import round_half_away

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    members = semdedup_members(emb)
    mrows = members.select("vec_id", "cluster", "dist", "e").collect()
    vec = {r["vec_id"]: np.asarray(r["e"], dtype=np.float64) for r in mrows}
    meta = {r["vec_id"]: (r["cluster"], r["dist"]) for r in mrows}
    by_cell: dict[int, list[int]] = {}
    for vid, (cl, _) in meta.items():
        by_cell.setdefault(cl, []).append(vid)
    expect: dict[int, tuple[int, float]] = {}
    for cl, ids in by_cell.items():
        for b in ids:
            best = None
            for a in ids:
                if a == b:
                    continue
                da, db = meta[a][1], meta[b][1]
                if not (da > db or (da == db and a < b)):
                    continue
                va, vb = vec[a], vec[b]
                cs = float(
                    round_half_away(
                        np.cumsum(va * vb)[-1]
                        / (math.sqrt(np.cumsum(va * va)[-1]) * math.sqrt(np.cumsum(vb * vb)[-1])),
                        6,
                    )
                )
                if cs >= SEMDEDUP_TAU and (best is None or (-cs, a) < best):
                    best = (-cs, a)
            if best is not None:
                expect[b] = (best[1], -best[0])
    got = {
        r["vec_id"]: (r["pruned_by"], r["cos"])
        for r in semdedup_pruned(members, SEMDEDUP_TAU).collect()
    }
    assert got == expect


def test_semdedup_report_partitions_members(spark):
    q = registry.queries()
    report = q["semdedup_prune_report"](spark, SF_SMALL).collect()
    pruned = q["semdedup_pruned_docs"](spark, SF_SMALL).collect()
    from velox_hadoop_spark.operators.llmops6 import semdedup_members

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    n_members = semdedup_members(emb).count()
    assert sum(r["n_members"] for r in report) == n_members
    assert sum(r["n_pruned"] for r in report) == len(pruned)
    for r in report:
        assert r["n_pruned"] + r["n_kept"] == r["n_members"]
    # a pruned doc's dominator must itself be a member of the same cell
    ids = {r["vec_id"]: r["cluster"] for r in pruned}
    for r in pruned:
        assert r["cos"] >= 0.35
        assert r["pruned_by"] not in ids or ids[r["pruned_by"]] == r["cluster"]


# ---------------------------------------------------------------------------
# HLL mergeable sketches: tolerance, merge associativity, determinism
# ---------------------------------------------------------------------------


def test_hll_weekly_rollup_tolerance_and_merge(spark):
    from pyspark.sql import functions as F

    from velox_hadoop_spark.catalog import read_table
    from velox_hadoop_spark.operators.sketches import (
        HLL_LG_K,
        daily_user_sketches,
        weekly_rollup,
    )

    rows = registry.queries()["hll_weekly_merge_rollup"](spark, SF_SMALL).collect()
    assert rows
    events = read_table(spark, SF_SMALL, "events")
    n_days = events.select(F.to_date("ts")).distinct().count()
    assert sum(r["n_days"] for r in rows) == n_days
    for r in rows:
        assert r["rel_err"] <= 0.02, r  # lgK=12 on small cardinalities
    # merge associativity: union(day sketches) == one week-grain sketch
    direct = {
        r["week_start"]: r["est"]
        for r in events.groupBy(
            F.date_trunc("week", F.col("ts")).cast("date").alias("week_start")
        )
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("user_id"), F.lit(HLL_LG_K))
            ).alias("est")
        )
        .collect()
    }
    merged = {
        r["week_start"]: r["est_users"]
        for r in weekly_rollup(daily_user_sketches(events)).collect()
    }
    assert merged == direct
    # determinism across runs
    again = {
        r["week_start"]: r["est_users"]
        for r in registry.queries()["hll_weekly_merge_rollup"](spark, SF_SMALL).collect()
    }
    assert again == merged
