"""Decontamination / TF-IDF / sequence packing / SimHash pairs."""

import pytest

from tests.conftest import assert_parity


@pytest.mark.parametrize(
    "name",
    [
        "benchmark_decontamination",
        "tfidf_top_terms",
        "pack_sequences",
        "simhash_near_dup_pairs",
        "embedding_label_centroids",
        "embedding_outliers",
        "fuzzy_part_name_pairs",
    ],
)
def test_oracle_parity(spark, duck, name):
    assert_parity(spark, duck, name)


def test_contamination_scan_hits_only_overlapping_docs(spark):
    from velox_hadoop_spark.operators.contamination import contamination_scan

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta")], ["doc_id", "text"]
    )
    train = spark.createDataFrame(
        [
            # contains the benchmark 8-gram verbatim -> contaminated
            (1, "intro alpha beta gamma delta epsilon zeta eta theta outro"),
            (2, "totally unrelated text with eight plus words in it"),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.n_hit_ngrams for r in contamination_scan(train, bench).collect()}
    assert got == {1: 1}


def test_pack_sequences_respects_budget_layout(spark):
    from velox_hadoop_spark.operators.contamination import pack_sequences

    # one source, docs of 3 tokens each, budget 6 -> 2 docs per sequence
    docs = spark.createDataFrame(
        [(i, "s", "a b c") for i in range(6)], ["doc_id", "source", "text"]
    )
    rows = sorted(
        pack_sequences(docs, budget=6).collect(), key=lambda r: r.seq_id
    )
    assert [(r.seq_id, r.n_docs, r.n_tokens) for r in rows] == [
        (0, 2, 6),
        (1, 2, 6),
        (2, 2, 6),
    ]
    # oversized doc spans its own sequence, following doc starts mid-budget
    docs2 = spark.createDataFrame(
        [(0, "s", " ".join(["w"] * 10)), (1, "s", "a b")], ["doc_id", "source", "text"]
    )
    rows2 = {r.seq_id: (r.n_docs, r.n_tokens) for r in pack_sequences(docs2, budget=6).collect()}
    assert rows2 == {0: (1, 10), 1: (1, 2)}


def test_simhash_near_dup_identical_docs_zero_hamming(spark):
    from velox_hadoop_spark.operators.dedup import simhash64, simhash_near_dup_pairs

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different content with other words entirely"),
        ],
        ["doc_id", "text"],
    )
    rows = simhash_near_dup_pairs(simhash64(docs, "doc_id", "text")).collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in rows] == [(0, 1, 0)]


def test_tfidf_stopword_scores_zero(spark):
    """A term present in every doc has idf = ln(1) = 0."""
    from velox_hadoop_spark.operators.contamination import tfidf_top_terms

    docs = spark.createDataFrame(
        [(0, "the cat"), (1, "the dog"), (2, "the bird")], ["doc_id", "text"]
    )
    rows = tfidf_top_terms(docs, top_k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.rnk, r.term, r.tfidf))
    for doc, terms in by_doc.items():
        terms.sort()
        # rank 1 is the rare term with positive score; "the" scores 0
        assert terms[0][2] > 0 and terms[0][1] != "the"
        assert terms[1] == (2, "the", 0.0)


def test_fuzzy_pairs_blocked_only_within_block(spark):
    from velox_hadoop_spark.operators.dedup import fuzzy_pairs_blocked

    df = spark.createDataFrame(
        [
            (1, "cold widget"),
            (2, "gold widget"),   # edit 1 from cold widget, same block
            (3, "cold bolt"),     # different block: never compared
            (4, "green widget"),  # edit 4 from cold widget: filtered
        ],
        ["rid", "nm"],
    )
    rows = fuzzy_pairs_blocked(df, "rid", "nm", max_edit=2).collect()
    assert [(r.id_a, r.id_b, r.edit_dist) for r in rows] == [(1, 2, 1)]


def test_embedding_outliers_topk_per_label(spark):
    from velox_hadoop_spark.plans import registry

    from tests.conftest import SF_DIR

    rows = registry.queries()["embedding_outliers"](spark, SF_DIR).collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(r.rnk)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in by_label.values())


@pytest.mark.parametrize(
    "name",
    ["repetition_quality", "source_mixing_weights", "embedding_quantize_int8"],
)
def test_round2b_parity(spark, duck, name):
    assert_parity(spark, duck, name)


def test_repetition_flags_looping_doc(spark):
    from velox_hadoop_spark.operators.textstats import repetition_stats

    docs = spark.createDataFrame(
        [(1, "spam ham " * 20), (2, "all twenty words here are completely distinct from one another")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert got[1].dup_bigram_frac > 0.9     # looping doc: ~all bigrams repeat
    assert got[2].dup_bigram_frac == 0.0    # distinct words: no repeats
    assert got[1].top_bigram_frac > got[2].top_bigram_frac


def test_quantization_error_bounded_by_scale(spark):
    """Reconstruction error can never exceed half a quantization step."""
    from velox_hadoop_spark.plans import registry

    from tests.conftest import SF_DIR

    rows = registry.queries()["embedding_quantize_int8"](spark, SF_DIR).collect()
    assert rows
    # embeddings are unit-ish floats: step = range/255, so errors are tiny
    assert all(r.max_abs_err <= 0.05 for r in rows)
    assert all(r.mean_abs_err <= r.max_abs_err for r in rows)


def test_kmeans_parity(spark, duck):
    assert_parity(spark, duck, "kmeans_2iter_embeddings")


def test_kmeans_assigns_every_vector_once(spark):
    from velox_hadoop_spark.operators.clustering import kmeans

    from tests.conftest import SF_DIR

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    rows = kmeans(emb).collect()
    assert len(rows) == emb.count()
    assert len({r.vec_id for r in rows}) == len(rows)
    assert {r.cluster for r in rows} <= {0, 1, 2, 3}
    assert all(r.dist >= 0 for r in rows)


def test_kmeans_separates_obvious_clusters(spark):
    from velox_hadoop_spark.operators.clustering import kmeans

    # two tight blobs around (0,0) and (10,10); k=2, init = ids 0 (blob A) and 1 (blob B)
    rows = [
        (0, [0.0, 0.1]), (2, [0.1, 0.0]), (4, [0.05, 0.05]),
        (1, [10.0, 10.1]), (3, [10.1, 10.0]), (5, [9.95, 10.05]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.vec_id: r.cluster for r in kmeans(emb, k=2, iters=2).collect()}
    assert got[0] == got[2] == got[4]
    assert got[1] == got[3] == got[5]
    assert got[0] != got[1]
