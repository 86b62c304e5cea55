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
