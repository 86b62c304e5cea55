"""Round-10 parity and contract tests.

Covers the deterministic-truncation caps added to the last three
uncapped pair generators (incremental LSH, containment blocks, prefix
join) with fixtures where the cap actually BINDS — the test corpora at
sf0.001/sf0.01 never exceed MAX_KEY_DOC_FREQ, so without these the cap
branch would ship untested (the span-adjacency lesson: boundary rules
need boundary-shape fixtures).
"""

from __future__ import annotations

import os
import tempfile

import duckdb as _duckdb
import pytest
from pyspark.sql import functions as F

from velox_hadoop_spark.operators.dedup import (
    MAX_KEY_DOC_FREQ,
    jaccard_pairs,
    prefix_filtered_jaccard,
    shingle_set,
)
from velox_hadoop_spark.plans.registry import oracles, queries

DOC_COLS = "doc_id long, text string, lang string, source string, n_chars long"


def _write_docs(spark, rows):
    d = tempfile.mkdtemp(prefix="vhs_r10_")
    spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in rows], DOC_COLS
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def _oracle_rows(d, name, table="documents"):
    # own connection — repointing a shared fixture's view would
    # corrupt later parity tests in the session
    con = _duckdb.connect()
    con.sql(
        f"CREATE VIEW {table} AS SELECT * FROM '{d}/{table}.parquet/*.parquet'"
    )
    got = con.sql(oracles()[name]).fetchall()
    con.close()
    return got


# ---------------------------------------------------------------------------
# contained_doc_pairs: hot-block cap
# ---------------------------------------------------------------------------


def test_contained_hot_block_cap_binds_and_matches_oracle(spark):
    """A block shared by cap+1 documents (each a prefix of the next —
    every pair IS a containment) must be dropped whole by both engines;
    a cool block's pairs survive."""
    hot_base = "shared boilerplate header block forty ch"  # 40 chars
    assert len(hot_base) == 40
    hot = [(i, hot_base + " body " + "x " * (i % 7)) for i in range(MAX_KEY_DOC_FREQ + 1)]
    cool_base = "zz unique cool prefix block here padded "  # 40 chars
    cool = [
        (10_000, cool_base + "tail one"),
        (10_001, cool_base + "tail one plus more"),
    ]
    d = _write_docs(spark, hot + cool)
    got = {
        (r.id_a, r.id_b, r.is_exact)
        for r in queries()["contained_doc_pairs"](spark, d).collect()
    }
    want = set(map(tuple, _oracle_rows(d, "contained_doc_pairs")))
    assert got == want
    # the cool containment pair survives; nothing from the hot block
    assert (10_000, 10_001, False) in got
    assert all(a >= 10_000 for a, _, _ in got)


# ---------------------------------------------------------------------------
# incremental_lsh_near_dup: hot band-bucket cap
# ---------------------------------------------------------------------------


def test_incremental_lsh_hot_bucket_cap_binds_and_matches_oracle(spark):
    """cap+1 identical documents share every band bucket — each bucket
    exceeds MAX_KEY_DOC_FREQ and is dropped, so the hot clones report
    NO corpus matches; an unrelated near-dup pair in a cool bucket
    still matches. Oracle agrees on the same frame."""
    clone = "alpha beta gamma delta epsilon zeta eta theta"
    hot = [(i, clone) for i in range(MAX_KEY_DOC_FREQ + 1)]
    near = "q1 q2 q3 q4 q5 q6 q7 q8 q9"
    cool = [(20_000, near), (20_001, near)]  # 20000 is batch (%10==0), 20001 corpus
    d = _write_docs(spark, hot + cool)
    got = {
        (r.doc_id, r.n_corpus_matches)
        for r in queries()["incremental_lsh_near_dup"](spark, d).collect()
    }
    want = set(map(tuple, _oracle_rows(d, "incremental_lsh_near_dup")))
    assert got == want
    assert (20_000, 1) in got
    # no batch doc from the hot clone group reports any match
    assert all(doc_id >= 20_000 for doc_id, _ in got)


# ---------------------------------------------------------------------------
# prefix_filtered_jaccard: hot-prefix bucket cap
# ---------------------------------------------------------------------------


def test_prefix_cap_drops_all_hot_corpus_pairs(spark):
    """On a corpus of identical docs every prefix shingle is hot: with
    a cap of 1 no candidates are generated (deterministic truncation);
    with the default cap the pairs come back — and equal brute force."""
    clone = "m1 m2 m3 m4 m5 m6 m7"
    df = spark.createDataFrame(
        [(i, clone) for i in range(3)], "doc_id long, text string"
    )
    sh = shingle_set(df, "doc_id", "text")
    capped = prefix_filtered_jaccard(sh, "doc_id", 0.8, max_prefix_bucket=1).collect()
    assert capped == []
    full = {
        (r.id_a, r.id_b, r.jaccard)
        for r in prefix_filtered_jaccard(sh, "doc_id", 0.8).collect()
    }
    brute = {
        (r.id_a, r.id_b, r.jaccard)
        for r in jaccard_pairs(sh, "doc_id").collect()
        if r.jaccard >= 0.8
    }
    assert full == brute == {(0, 1, 1.0), (0, 2, 1.0), (1, 2, 1.0)}


# ---------------------------------------------------------------------------
# ann_lsh_topk: per-bucket neighbor cap
# ---------------------------------------------------------------------------


def test_ann_lsh_bucket_cap_binds_and_matches_oracle(spark):
    """Vectors (1, c) with c in (0,1) share one hyperplane bucket (every
    plane's sign is c-independent there). With cap+3 of them, the
    neighbor side keeps only the ANN_BUCKET_CAP lowest vec_ids: the two
    high-id vectors — each other's TRUE nearest neighbor (closest c) —
    must instead rank neighbors from the capped set, identically in
    both engines."""
    from velox_hadoop_spark.operators.similarity import ANN_BUCKET_CAP

    rows = [(i, [1.0, 0.1 + 0.0001 * i]) for i in range(ANN_BUCKET_CAP + 1)]
    rows += [(9_999, [1.0, 0.985]), (10_000, [1.0, 0.99])]
    d = tempfile.mkdtemp(prefix="vhs_r10_emb_")
    spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in rows],
        "vec_id long, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    sdf = queries()["ann_lsh_topk"](spark, d)
    got = {(r.query_id, r.neighbor_id, r.cos, r.rnk) for r in sdf.collect()}
    want = {
        (q, n, c, r)
        for q, n, _, c, r in map(tuple, _oracle_rows(d, "ann_lsh_topk", "embeddings"))
    }
    assert got == want
    # all vectors landed in ONE bucket and the cap bound: the high-id
    # pair may not use each other — neighbors come from the capped set
    nbrs_of_hi = {n for q, n, _, _ in got if q == 10_000}
    assert nbrs_of_hi and all(n < ANN_BUCKET_CAP for n in nbrs_of_hi)
    # every vector (including beyond-cap ids) still queries
    assert {q for q, _, _, _ in got} == {i for i, _ in rows}


# ---------------------------------------------------------------------------
# Round-10 new families: independent plain-Python recomputes
# ---------------------------------------------------------------------------


def test_doremi_reweight_matches_python_recompute(spark):
    """Full numeric recompute of the 2-step excess-loss update from the
    spec (not the kernel), plus the directional property: the source
    whose mean surprisal exceeds the mixture average gains weight."""
    import math

    rows = [
        (0, "aa bb aa bb aa bb aa bb", "en", "common", 23),
        (1, "aa bb aa bb cc cc cc cc", "en", "common", 23),
        (2, "qq ww ee rr tt yy uu ii", "en", "rare", 23),
    ]
    d = tempfile.mkdtemp(prefix="vhs_r10_dm_")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    toks = [(s, t) for _, txt, _, s, _ in rows for t in txt.split() if t]
    N = len(toks)
    cnt = {}
    for _, t in toks:
        cnt[t] = cnt.get(t, 0) + 1
    per = {}
    for s, t in toks:
        q = math.floor(-math.log(cnt[t] / N) * 1e6 + 0.5)
        ns, ls = per.get(s, (0, 0))
        per[s] = (ns + 1, ls + q)
    state = {}
    for s, (ns, ls) in per.items():
        lq = math.floor(ls / ns + 0.5)
        w0 = math.floor(ns / N * 1e9 + 0.5) / 1e9
        state[s] = {"lq": lq, "l": lq / 1e6, "w": w0, "w0": w0, "ns": ns}
    hist = {s: [] for s in state}
    for _ in range(2):
        b = sum(math.floor(v["w"] * v["l"] * 1e9 + 0.5) for v in state.values()) / 1e9
        uq = {
            s: math.floor(
                v["w"]
                * (
                    math.floor(
                        math.exp(1.0 * min(max(v["l"] - b, 0.0), 10.0)) * 1e6 + 0.5
                    )
                    / 1e6
                )
                * 1e12
                + 0.5
            )
            for s, v in state.items()
        }
        z = float(sum(uq.values()))
        for s, v in state.items():
            v["w"] = math.floor(uq[s] / z * 1e9 + 0.5) / 1e9
            hist[s].append(v["w"])

    got = {
        r.source: (r.n_tokens, r.mean_surprisal, r.w0, r.w1, r.w2)
        for r in queries()["doremi_mixture_reweight"](spark, d).collect()
    }
    # resample composite on the same fixture: per-source caps from the
    # recomputed w2, keep-set by the seeded 60-bit md5 order
    import hashlib

    def h60(doc_id):
        return int(hashlib.md5(f"doremi|{doc_id}".encode()).hexdigest()[:15], 16)

    want_keep = set()
    for s2 in state:
        cap = math.floor(500 * state[s2]["w"] + 0.5)
        members = sorted(
            (i for i, _, _, src, _ in rows if src == s2),
            key=lambda i: (h60(i), i),
        )
        for rnk, i in enumerate(members[:cap], start=1):
            want_keep.add((i, s2, rnk))
    got_keep = {
        (r.doc_id, r.source, r.rnk)
        for r in queries()["doremi_weighted_resample"](spark, d).collect()
    }
    assert got_keep == want_keep and got_keep
    want = {
        s: (
            v["ns"],
            round(v["lq"] / 1e6, 6),
            round(v["w0"], 6),
            round(hist[s][0], 6),
            round(hist[s][1], 6),
        )
        for s, v in state.items()
    }
    assert got == want
    # "rare" has the higher surprisal: its weight strictly climbs
    assert got["rare"][4] > got["rare"][3] > got["rare"][2]
    assert got["common"][4] < got["common"][2]
    assert abs(got["rare"][4] + got["common"][4] - 1.0) < 2e-6


def test_map_mrr_matches_python_recompute(spark):
    """AP@10 / MRR@10 recomputed from the standard definitions over the
    kernel's own ranked candidates (numpy cosine, same ROUND-6 +
    tie-break), on the real sf0.001 embeddings."""
    import numpy as np

    from velox_hadoop_spark.operators.similarity import round_half_away

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").collect()
    ids = np.array([r.vec_id for r in emb])
    order = np.argsort(ids)
    ids = ids[order]
    labels = np.array([r.label for r in emb])[order]
    mat = np.array([r.embedding for r in emb], dtype=np.float64)[order]
    nrm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    want = {}
    for qi in np.where(ids < 10)[0]:
        cos = round_half_away(nrm[qi] @ nrm.T, 6)
        mask = np.arange(len(ids)) != qi
        cand = sorted(
            zip(-cos[mask], ids[mask], labels[mask] == labels[qi])
        )
        rel = [bool(r) for _, _, r in cand]
        n_rel_total = sum(rel)
        if n_rel_total < 1:
            continue
        top = rel[:10]
        hits = 0
        ap = 0.0
        first = None
        for i, r in enumerate(top, start=1):
            if r:
                hits += 1
                ap += hits / i
                if first is None:
                    first = i
        want[int(ids[qi])] = (
            n_rel_total,
            sum(top),
            round(ap / min(n_rel_total, 10), 6),
            round(1.0 / first, 6) if first else 0.0,
        )
    got = {
        r.query_id: (r.n_rel_total, r.n_rel_topk, r.ap_at_10, r.rr_at_10)
        for r in queries()["retrieval_map_mrr_at_10"](spark, sf).collect()
    }
    assert got == want and len(got) >= 5


def test_silhouette_lite_matches_numpy_recompute(spark):
    """Per-cluster a/b/s recomputed in numpy from the kernel's own
    centroids and the spec's 1e-6-grid means; a<=b always holds (the
    assignment is the argmin), so every silhouette is in [0,1]."""
    import math

    import numpy as np

    from velox_hadoop_spark.operators.clustering import kmeans
    from velox_hadoop_spark.operators.similarity import round_half_away

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    assigned, cents = kmeans(emb, return_centroids=True)
    arows = {r.vec_id: (r.cluster, r.dist) for r in assigned.collect()}
    crows = {r.cid: np.array(r.ce, dtype=np.float64) for r in cents.collect()}
    vrows = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    agg = {}
    for vid, (cl, a) in arows.items():
        others = [
            float(round_half_away(((vrows[vid] - ce) ** 2).sum(), 6))
            for cid, ce in crows.items()
            if cid != cl
        ]
        b = min(others)
        assert a <= b + 1e-9
        s = (b - a) / max(a, b) if max(a, b) > 0 else 0.0
        n, sa, sb, ss = agg.get(cl, (0, 0, 0, 0))
        agg[cl] = (
            n + 1,
            sa + math.floor(a * 1e6 + 0.5),
            sb + math.floor(b * 1e6 + 0.5),
            ss + math.floor(s * 1e6 + 0.5),
        )
    want = {
        cl: (n, round(sa / n / 1e6, 6), round(sb / n / 1e6, 6), round(ss / n / 1e6, 6))
        for cl, (n, sa, sb, ss) in agg.items()
    }
    got = {
        r.cluster: (r.n_members, r.mean_a, r.mean_b, r.mean_silhouette)
        for r in queries()["kmeans_silhouette_lite"](spark, sf).collect()
    }
    assert got == want
    assert all(0.0 <= s <= 1.0 for _, _, _, s in got.values())
    # drill-down: worst 3 per cluster by the exact integer grid key
    per_member = {}
    for vid, (cl, a) in arows.items():
        others = [
            float(round_half_away(((vrows[vid] - ce) ** 2).sum(), 6))
            for cid, ce in crows.items()
            if cid != cl
        ]
        b = min(others)
        s = (b - a) / max(a, b) if max(a, b) > 0 else 0.0
        per_member.setdefault(cl, []).append(
            (math.floor(s * 1e6 + 0.5), vid, a, b)
        )
    want_worst = set()
    for cl, ms in per_member.items():
        for rnk, (sq, vid, a, b) in enumerate(sorted(ms)[:3], start=1):
            want_worst.add((cl, vid, a, b, round(sq / 1e6, 6), rnk))
    got_worst = {
        (r.cluster, r.vec_id, r.a_dist, r.b_dist, r.silhouette, r.rnk)
        for r in queries()["silhouette_worst_members"](spark, sf).collect()
    }
    assert got_worst == want_worst
    assert len(got_worst) == sum(min(3, len(ms)) for ms in per_member.values())


def test_compaction_execution_twin_accounts_every_row(spark):
    """The executed per-bin counts must equal the plan's sums (pandas
    recompute of the greedy packing), and every lineitem row must land
    in exactly one bin."""
    import pandas as pd

    sf = "/root/testdata/sf0.001"
    li = pd.read_parquet(f"{sf}/lineitem.parquet", columns=["l_shipdate"])
    months = (
        pd.to_datetime(li["l_shipdate"]).dt.to_period("M").dt.to_timestamp().dt.date
    )
    counts = months.value_counts().sort_index()
    cum = counts.cumsum().shift(fill_value=0)
    bins = (cum // 100_000).astype(int)
    planned = counts.groupby(bins).sum()
    n_parts = counts.groupby(bins).size()
    got = {
        r.bin_id: (r.n_parts, r.planned_rows, r.executed_rows, r.row_accounting_ok)
        for r in queries()["compaction_bin_execution"](spark, sf).collect()
    }
    want = {
        int(b): (int(n_parts[b]), int(planned[b]), int(planned[b]), True)
        for b in planned.index
    }
    assert got == want
    assert sum(e for _, _, e, _ in got.values()) == len(li)


def test_retention_segment_matrix_matches_pandas_recompute(spark):
    """2-D cohort×segment retention recomputed with pandas from the
    definitions (dedup first, min-week cohort, segment via custkey)."""
    import pandas as pd

    sf = "/root/testdata/sf0.001"
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["user_id", "ts"])
    cust = pd.read_parquet(
        f"{sf}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    epoch = pd.Timestamp("2024-01-01").date()
    w = pd.to_datetime(ev["ts"]).dt.date.map(lambda d: (d - epoch).days // 7)
    wk = pd.DataFrame({"user_id": ev["user_id"], "w": w}).drop_duplicates()
    coh = wk.groupby("user_id")["w"].min().rename("cohort")
    j = wk.join(coh, on="user_id").merge(
        cust.rename(columns={"c_custkey": "user_id", "c_mktsegment": "segment"}),
        on="user_id",
    )
    j["week_offset"] = j["w"] - j["cohort"]
    want = {
        (int(c), s, int(o)): int(n)
        for (c, s, o), n in j.groupby(["cohort", "segment", "week_offset"])[
            "user_id"
        ].nunique().items()
    }
    got = {
        (r.cohort_week, r.segment, r.week_offset): r.n_users
        for r in queries()["retention_cohort_segment_matrix"](spark, sf).collect()
    }
    assert got == want and len(got) > 10


def test_similarity_join_prefix_oracle_mirrors_cap(spark):
    """The registered oracle now mirrors the capped candidate pipeline:
    on a corpus where every prefix bucket is hot (cap+1 clones), both
    engines return the empty set; a cool near-dup pair survives in
    both."""
    clone = "n1 n2 n3 n4 n5 n6 n7 n8"
    hot = [(i, clone) for i in range(MAX_KEY_DOC_FREQ + 1)]
    cool = [
        (30_000, "r1 r2 r3 r4 r5 r6 r7 r8 r9 r10"),
        (30_001, "r1 r2 r3 r4 r5 r6 r7 r8 r9 r10"),
    ]
    d = _write_docs(spark, hot + cool)
    got = {
        (r.id_a, r.id_b, r.n_shared, r.jaccard)
        for r in queries()["similarity_join_prefix"](spark, d).collect()
    }
    want = set(map(tuple, _oracle_rows(d, "similarity_join_prefix")))
    assert got == want
    assert (30_000, 30_001, 6, 1.0) in got
    assert all(a >= 30_000 for a, _, _, _ in got)
