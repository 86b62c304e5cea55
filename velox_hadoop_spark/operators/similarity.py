"""Similarity search over embedding columns. [extension]

ANN over ``array<float>`` embeddings, pure DataFrame ops:

  * brute-force cosine top-k — the correctness baseline. Dot products
    via ``zip_with``/``aggregate`` builtins (JVM codegen, no Python).
  * random-hyperplane LSH buckets — the scale path: 8 sign-bits from
    MD5-derived ±1 hyperplanes bucket the vectors; at 100 TB you join
    within buckets (and their hamming-1 neighbors) instead of all-pairs.

Determinism: cosines are rounded to 6 dp BEFORE ranking in both the
Spark plan and the oracle, so float summation order can never reorder
the top-k; ties broken by neighbor id.

Scale notes: brute force is O(Q·N) — fine for a query batch against a
broadcast candidate set; the LSH variant replaces the all-pairs join
with per-bucket joins (bucket skew handled by AQE). The hyperplane
weights are hash-derived constants, so every executor computes them
locally — nothing is shipped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from velox_hadoop_spark.functions.vectors import cosine, round_half_away, to_double
from velox_hadoop_spark.plans.registry import register

N_PLANES = 8
# Deterministic neighbor-side truncation for the fixed-bucket LSH topk:
# per bucket, only the ANN_BUCKET_CAP lowest vec_ids serve as candidate
# neighbors (mirrored in the oracle). Bounds candidate volume linearly
# in N even when 2^N_PLANES buckets are mis-sized for the corpus.
ANN_BUCKET_CAP = 512
# Query-axis salting factor for the IVF grouped-map: each cell's
# queries split across this many cogroup tasks (neighbors replicated),
# so no single task owns a whole ~N/K cell. Value-neutral: every query
# still scores against its full cell.
IVF_QUERY_SALTS = 8

# Corpora at or below this row count may be collected and broadcast as a
# dense matrix (the fast single-dgemm path); larger corpora route through
# the distributed blocked kernel — never a full-corpus driver collect.
DRIVER_BROADCAST_ROWS = 500_000
BLOCK_ROWS = 250_000

# + 0.0 pins −0.0 → +0.0 on every rounded cosine/centroid output:
# near-orthogonal pairs land in (−5e-7, 0) where DuckDB ROUND keeps the
# sign bit and Spark normalizes (the degenerate-sweep class, applied
# module-wide in round 9)
_DUCK_COS = (
    "(ROUND(list_dot_product(q.v, n.v) / "
    "(sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(n.v, n.v))), 6)"
    " + 0.0)"
)


def drop_null_vectors(df: DataFrame, col: str = "embedding") -> DataFrame:
    """SQL null semantics for the vector kernels: a NULL embedding joins
    no similarity computation. The SQL-expression kernels get this for
    free (a null cosine fails every threshold), but the numpy/Arrow
    matrix kernels would crash mid-batch on the inhomogeneous column —
    and a real corpus at scale always carries a few nulls — so every
    kernel that materializes embeddings into a matrix filters here."""
    return df.where(F.col(col).isNotNull())


# Oracle twin of drop_degenerate_vectors: NULL > 0 is NULL (filtered),
# an empty list sums to NULL (filtered), a zero vector sums to 0.
DUCK_FINITE_VECTOR = (
    "list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) > 0"
)


def drop_degenerate_vectors(df: DataFrame, col: str = "embedding") -> DataFrame:
    """Cosine is undefined for NULL, empty, and all-zero embeddings —
    the COSINE kernels drop all three at entry. The zero case matters
    because the two engines disagree silently: normalizing a zero
    vector yields NaN cosines, which the numpy kernels drop (NaN fails
    every comparison) while DuckDB sorts NaN ABOVE every number, so an
    unguarded oracle crowns the zero vector as everyone's top neighbor.
    Norm/quantize kernels keep zero vectors (a zero L2 is well-defined)
    and use ``drop_null_vectors`` only."""
    sq = F.aggregate(
        to_double(F.col(col)), F.lit(0.0), lambda acc, x: acc + x * x
    )
    return df.where(F.col(col).isNotNull() & (sq > 0))


def cosine_pairs(queries: DataFrame, corpus: DataFrame) -> DataFrame:
    """All (query, candidate) cosine scores, candidate ≠ query.

    Norms are precomputed per vector (not per pair) — same arithmetic as
    dot/(√·√) per pair, 3× less work. The pairing is a broadcast
    nested-loop on the (small) query side; candidates stream.
    """
    from velox_hadoop_spark.functions.vectors import dot, norm

    q = queries.select(
        F.col("vec_id").alias("query_id"), to_double(F.col("embedding")).alias("qv")
    ).withColumn("qn", norm(F.col("qv")))
    n = corpus.select(
        F.col("vec_id").alias("neighbor_id"), to_double(F.col("embedding")).alias("nv")
    ).withColumn("nn", norm(F.col("nv")))
    return (
        F.broadcast(q).join(n, F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                F.round(
                    dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn")), 6
                )
                + F.lit(0.0)
            ).alias("cos"),
        )
    )


def broadcast_normalized_corpus(corpus: DataFrame):
    """Collect (vec_id, embedding) once, L2-normalize, and broadcast
    (ids, mat_n) — the shared scaffold of every broadcast-dgemm kernel
    (knn_numpy here, dedup._near_dup_broadcast). Only the normalized
    matrix ships; the raw matrix is never broadcast."""
    import numpy as np

    pdf = drop_degenerate_vectors(corpus).select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy()
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    if mat.ndim == 1:  # empty corpus (filter-to-zero upstream): keep 2-D
        mat = mat.reshape(0, 0)
    mat_n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    return corpus.sparkSession.sparkContext.broadcast((ids, mat_n))


def knn_numpy(
    corpus: DataFrame,
    k: int = 1,
    queries: DataFrame | None = None,
    bc=None,
) -> DataFrame:
    """All-pairs cosine top-k via Arrow-batched numpy (BLAS matmul).

    ``queries`` restricts the scored side to a query frame (defaults to
    the whole corpus) — the sample-vs-corpus shape the recall gates use.

    The corpus matrix is broadcast to every executor once (vectors are
    the *small* side here — at 100 TB you LSH-bucket first, see
    ``hyperplane_buckets``); each task scores its Arrow batch of
    queries against the matrix with one dgemm. ~50× faster than
    per-row lambda evaluation of zip_with/aggregate, identical output
    (cosines rounded to 6 dp before ranking, ties by neighbor id).

    ``bc`` accepts a prebuilt ``broadcast_normalized_corpus(corpus)``
    handle so a caller scoring the same corpus twice (the recall gates:
    exact baseline + candidate re-rank) collects and ships it once.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    queries = corpus if queries is None else queries
    if bc is None:
        bc = broadcast_normalized_corpus(corpus)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c_ids, c_mat_n = bc.value
        order = np.argsort(c_ids)  # neighbor-id tiebreak: scan in id order
        s_ids, s_n = c_ids[order], c_mat_n[order]
        if s_n.shape[0] == 0:  # empty corpus: no pairs, typed-empty result
            return
        for pdf_q in batches:
            q = np.array(pdf_q["embedding"].tolist(), dtype=np.float64)
            qn = q / np.linalg.norm(q, axis=1, keepdims=True)
            cos = round_half_away(qn @ s_n.T, 6)
            qids = pdf_q["vec_id"].to_numpy()
            self_mask = qids[:, None] == s_ids[None, :]
            cos[self_mask] = -np.inf
            # stable sort on -cos keeps id-order among ties
            top = np.argsort(-cos, axis=1, kind="stable")[:, :k]
            out = pd.DataFrame(
                {
                    "query_id": np.repeat(qids, top.shape[1]),
                    "neighbor_id": s_ids[top].ravel(),
                    "cos": np.take_along_axis(cos, top, axis=1).ravel(),
                    "rnk": np.tile(np.arange(1, top.shape[1] + 1), len(qids)),
                }
            )
            # k >= corpus size would otherwise emit the masked self-pair
            # (cos = -inf) as a phantom rank — same edge filter as
            # knn_blocked, so the two kernels agree for every (k, N)
            yield out[out["cos"] > -np.inf]

    out_schema = "query_id long, neighbor_id long, cos double, rnk long"
    return drop_degenerate_vectors(queries).select("vec_id", "embedding").mapInPandas(
        score, out_schema
    )


def _block_cogroup(
    corpus: DataFrame,
    n_blocks: int,
    queries: DataFrame | None = None,
    n_query_blocks: int | None = None,
):
    """Block-matrix cogroup for exact all-pairs scoring WITHOUT a driver
    collect: vectors get a block id (vec_id mod B); each side is
    replicated so cogroup key (qblk, nblk) holds exactly the
    (query-block, neighbor-block) pair. Shuffle volume is O(N·Bq + Q·B)
    rows — pick B ≈ N / BLOCK_ROWS so each block's matrix fits an
    executor — versus O(N²) for a pair join; every (q, n) pair is
    scored exactly once, so the result is EXACT, not approximate.

    ``queries`` (default: the corpus itself) restricts the scored side
    to a query frame, partitioned into ``n_query_blocks`` blocks
    (default ``n_blocks``). A small fixed-size query frame should pass
    ``n_query_blocks=1``: the corpus is then NOT replicated at all and
    only the tiny query side fans out B ways — the sample-vs-corpus
    shape the ANN recall gates use at scale."""
    e = drop_degenerate_vectors(corpus).select("vec_id", "embedding")
    qsrc = drop_degenerate_vectors(corpus if queries is None else queries).select(
        "vec_id", "embedding"
    )
    nq = n_blocks if n_query_blocks is None else n_query_blocks
    own_n = F.pmod(F.col("vec_id"), F.lit(n_blocks)).cast("int")
    own_q = F.pmod(F.col("vec_id"), F.lit(nq)).cast("int")
    nblks = F.array(*[F.lit(i) for i in range(n_blocks)])
    qblks = F.array(*[F.lit(i) for i in range(nq)])
    q_rep = qsrc.withColumn("qblk", own_q).withColumn("nblk", F.explode(nblks))
    n_rep = e.withColumn("nblk", own_n).withColumn("qblk", F.explode(qblks))
    return q_rep.groupBy("qblk", "nblk").cogroup(n_rep.groupBy("qblk", "nblk"))


def _mats(pdf):
    import numpy as np

    ids = pdf["vec_id"].to_numpy()
    order = np.argsort(ids)  # id order ⇒ deterministic tie-break
    ids = ids[order]
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)[order]
    return ids, mat / np.linalg.norm(mat, axis=1, keepdims=True)


def knn_blocked(
    corpus: DataFrame,
    k: int = 1,
    n_blocks: int = 4,
    queries: DataFrame | None = None,
    n_query_blocks: int | None = None,
) -> DataFrame:
    """Exact cosine top-k at cluster scale: per-block dgemm + tournament
    merge. Each cogroup task scores one (query-block × neighbor-block)
    tile with BLAS and emits its local top-k per query; the global
    window then merges B candidate sets per query. A candidate in the
    global top-k is necessarily in its tile's local top-k under the same
    (cos desc, id asc) order, so the merge loses nothing.

    ``queries``/``n_query_blocks`` restrict the scored side to a query
    frame (see ``_block_cogroup``) — with ``n_query_blocks=1`` the
    corpus streams un-replicated and nothing is broadcast, so a
    fixed-size query sample stays exact at any corpus size."""
    import numpy as np
    import pandas as pd

    def score(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "cos": []}).astype(
                {"query_id": "int64", "neighbor_id": "int64", "cos": "float64"}
            )
        qids, qn = _mats(left)
        nids, nn = _mats(right)
        cos = round_half_away(qn @ nn.T, 6)
        cos[qids[:, None] == nids[None, :]] = -np.inf  # mask self-pairs
        kk = min(k, cos.shape[1])
        top = np.argsort(-cos, axis=1, kind="stable")[:, :kk]
        out = pd.DataFrame(
            {
                "query_id": np.repeat(qids, kk),
                "neighbor_id": nids[top].ravel(),
                "cos": np.take_along_axis(cos, top, axis=1).ravel(),
            }
        )
        return out[out["cos"] > -np.inf]

    local = _block_cogroup(corpus, n_blocks, queries, n_query_blocks).applyInPandas(
        score, "query_id long, neighbor_id long, cos double"
    )
    return topk_per_query(local, k)


def cosine_pairs_blocked(
    corpus: DataFrame, threshold: float, n_blocks: int = 4
) -> DataFrame:
    """Exact (a < b, cos ≥ threshold) near-dup pairs at cluster scale:
    the same block-matrix cogroup, each tile emitting only its
    above-threshold upper-triangle entries. Each unordered pair lands in
    exactly one tile's upper triangle, so no dedup pass is needed."""
    import numpy as np
    import pandas as pd

    def score(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame({"a_id": [], "b_id": [], "cos": []}).astype(
                {"a_id": "int64", "b_id": "int64", "cos": "float64"}
            )
        aids, an = _mats(left)
        bids, bn = _mats(right)
        cos = round_half_away(an @ bn.T, 6)
        keep = (cos >= threshold) & (aids[:, None] < bids[None, :])
        ai, bi = np.nonzero(keep)
        return pd.DataFrame(
            {"a_id": aids[ai], "b_id": bids[bi], "cos": cos[ai, bi]}
        )

    return _block_cogroup(corpus, n_blocks).applyInPandas(
        score, "a_id long, b_id long, cos double"
    )


def knn_exact(
    corpus: DataFrame,
    k: int = 1,
    driver_broadcast_rows: int = DRIVER_BROADCAST_ROWS,
    block_rows: int = BLOCK_ROWS,
    queries: DataFrame | None = None,
    n_query_blocks: int | None = None,
    n: int | None = None,
    bc=None,
) -> DataFrame:
    """Exact cosine top-k with a physical-strategy guard.

    Small corpora (≤ ``driver_broadcast_rows``) take the single-dgemm
    broadcast path; anything larger routes through the distributed
    blocked kernel, so no input size can OOM the driver. The one
    row-count action here is the plan-choice probe (the same runtime-
    statistics trick AQE uses) — it reads parquet metadata, not data.

    ``queries``/``n_query_blocks`` restrict the scored side to a query
    frame on BOTH regimes (the recall gates pass their fixed-count
    sample with ``n_query_blocks=1``) — this is the single home of the
    broadcast-vs-blocked policy so the threshold can never drift
    between callers.

    ``n``/``bc`` let a caller that already probed the corpus size (and,
    below the budget, already built the normalized broadcast) share
    both with this kernel instead of re-running the count/collect jobs.
    """
    import math

    if n is None:
        n = corpus.count()
    if n <= driver_broadcast_rows:
        return knn_numpy(corpus, k, queries=queries, bc=bc)
    return knn_blocked(
        corpus,
        k,
        n_blocks=max(2, math.ceil(n / block_rows)),
        queries=queries,
        n_query_blocks=n_query_blocks,
    )


def topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
    )


def _plane_weights(n_planes: int, dims: int, offset: int = 0) -> list[list[float]]:
    """±1 hyperplane weights from MD5 parity of "plane|pos" — computed
    once on the driver with the exact same formula the DuckDB oracle
    evaluates (md5 hex → first 15 chars → int → parity). ``offset``
    shifts the global plane ids, giving independent tables for
    OR-amplified LSH."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"{p}|{d}".encode()).hexdigest()[:15], 16) % 2 == 1
            else -1.0
            for d in range(dims)
        ]
        for p in range(offset, offset + n_planes)
    ]


def hyperplane_buckets(
    emb: DataFrame, n_planes: int = N_PLANES, dims: int = 64, plane_offset: int = 0
) -> DataFrame:
    """Sign-random-projection LSH bucket per vector.

    Plane weights w(p,d) ∈ {±1} derive from MD5 parity of "p|d" — a
    deterministic constant baked into the plan as literal arrays, so
    the bucket is pure per-row math: for each plane a zip_with dot
    product, then Σₚ (proj ≥ 0) << p. Zero shuffles, zero joins — the
    corpus streams through whole-stage codegen once. (The previous
    shape — posexplode dims × cross-join planes — built 512 rows per
    vector and shuffled twice.)
    """
    w = _plane_weights(n_planes, dims, plane_offset)
    # null trips the width assert; an EMPTY array would bucket as
    # all-ones here while the oracle's UNNEST drops it — exclude both
    # (zero vectors stay: both engines bucket them identically)
    emb = drop_null_vectors(emb).where(F.size("embedding") > 0)
    # Fail LOUDLY if the data is wider than the literal weight vectors:
    # zip_with null-pads past len(wlit), the null poisons the projection
    # sum, and every plane's when() would silently fall to bucket bit 0
    # — all vectors in one bucket and a guaranteed oracle mismatch. The
    # assert_true rides in a WHERE clause (never pruned as unused).
    emb = emb.where(
        F.coalesce(
            F.assert_true(
                F.size("embedding") <= F.lit(dims),
                F.lit(f"embedding wider than hyperplane dims={dims}"),
            ).cast("boolean"),
            F.lit(True),
        )
    )
    v = to_double(F.col("embedding"))
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        wlit = F.array(*[F.lit(x) for x in w[p]])
        proj = F.aggregate(
            F.zip_with(F.slice(wlit, F.lit(1), F.size(F.col("embedding"))), v, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return emb.select("vec_id", bucket.cast("long").alias("bucket"))


# Session cache for the deterministic IVF codebook (r11 verdict
# follow-on #3: ann_ivf_topk / ann_ivf_recall / ann_hard_negatives /
# ann_recall_budget_curve each re-derived the centroid subquery).
# Holds DRIVER-LOCAL rows only — n_centroids × dims doubles, module
# constants at every call site, never SF-proportional — keyed like
# recall_ground_truth on (applicationId, sf_dir, corpus content
# fingerprint, k) so a rebuilt embeddings file at the same path gets a
# fresh codebook and superseded states evict.
_IVF_CODEBOOK_CACHE: dict = {}


def ivf_codebook(
    emb: DataFrame, n_centroids: int, sf_dir: str | None = None
) -> list:
    """The deterministic IVF codebook as driver-local rows:
    ``[(centroid_id, vector)]`` for the ``n_centroids`` lowest vec_ids.

    TRUE k-lowest ids, not ``vec_id < k`` (the shorthand under-fills
    the codebook on any non-dense id space — same fix as
    clustering.kmeans; the oracles mirror this rule with ORDER BY
    vec_id LIMIT k). At 100 TB you would train centroids offline and
    broadcast them identically — a codebook is driver-local by nature
    (K × dims doubles); collecting it here is the sanctioned
    constant-bounded class, and caching it per (session, sf_dir,
    content state) makes the whole IVF family derive it once.

    PRECONDITION when passing ``sf_dir``: ``emb`` must be the CANONICAL
    embeddings table of that directory (the cache key covers the file
    state, not the DataFrame — a filtered/derived frame with sf_dir set
    would be served the full corpus's codebook). Callers deriving from
    a subset pass ``sf_dir=None`` for the uncached per-call path."""
    spark = emb.sparkSession
    key = None
    if sf_dir is not None:
        key = (
            spark.sparkContext.applicationId,
            sf_dir,
            _embeddings_fingerprint(sf_dir),
            int(n_centroids),
        )
        hit = _IVF_CODEBOOK_CACHE.get(key)
        if hit is not None:
            return hit
    rows = (
        drop_degenerate_vectors(emb)
        .select("vec_id", to_double(F.col("embedding")).alias("v"))
        .orderBy("vec_id")
        .limit(n_centroids)
        .collect()
    )
    book = [(int(r.vec_id), list(r.v)) for r in rows]
    if key is not None:
        for stale in [
            k
            for k in _IVF_CODEBOOK_CACHE
            if (k[0], k[1], k[3]) == (key[0], key[1], key[3]) and k[2] != key[2]
        ]:
            _IVF_CODEBOOK_CACHE.pop(stale)
        _IVF_CODEBOOK_CACHE[key] = book
    return book


def _ivf_sorted_sims(book: list):
    """Per-row ascending-sorted array of (sim, -centroid_id,
    centroid_id) structs against the LITERAL codebook — the ONE home
    for the IVF scoring + tiebreak, shared by ``ivf_assign`` and
    ``ivf_assign_probes`` so the two sides of an IVF join cannot
    silently disagree. ``element_at(-1)`` of the sorted array IS the
    (desc sim, asc centroid_id) argmax the pre-round-12 window
    computed: ascending struct order ends at the highest sim, and the
    negated id breaks sim ties toward the SMALLEST centroid_id;
    NULL sims (dimension-mismatched vectors) sort to the FRONT exactly
    as desc-NULLS-LAST ranked them out of rn = 1.

    The scoring expression is the old one — round(dot/(n · cn), 6) +
    0.0 over the same doubles — so results are bit-equal; what changed
    is the PLAN: an in-row argmax over K literal vectors instead of
    [broadcast crossJoin ×K → row_number window], removing a K·N-row
    shuffle + sort from every IVF query at any scale. The centroid
    norm cn is a compile-time CONSTANT and ships as a literal: Catalyst
    does not constant-fold higher-order functions, so a norm(cv)
    expression would re-fold each literal array per corpus row
    (round-12 review) — the Python fold below is the identical
    left-to-right IEEE sequence (acc += x·x, then sqrt) the Spark
    ``norm`` fold executes, so the literal is the same double the old
    cents-frame cn column held."""
    import math

    from velox_hadoop_spark.functions.vectors import dot

    structs = []
    for cid, vec in book:
        cv = F.array(*[F.lit(float(x)) for x in vec])
        acc = 0.0
        for x in vec:
            acc += float(x) * float(x)
        cn = math.sqrt(acc)
        sim = F.round(
            dot(F.col("v"), cv) / (F.col("n") * F.lit(cn)), 6
        ) + F.lit(0.0)
        structs.append(
            F.struct(
                sim.alias("sim"),
                F.lit(-int(cid)).alias("neg"),
                F.lit(int(cid)).alias("cid"),
            )
        )
    return F.sort_array(F.array(*structs))


def _ivf_input(emb: DataFrame) -> DataFrame:
    from velox_hadoop_spark.functions.vectors import norm

    return (
        drop_degenerate_vectors(emb)
        .select("vec_id", to_double(F.col("embedding")).alias("v"))
        .withColumn("n", norm(F.col("v")))
    )


def ivf_assign(
    emb: DataFrame, n_centroids: int = 8, sf_dir: str | None = None
) -> DataFrame:
    """IVF coarse quantizer: assign every vector to its nearest centroid.

    The codebook is driver-local (``ivf_codebook`` — cached per
    session/corpus state when ``sf_dir`` is given), so assignment is a
    NARROW per-row argmax over K literal centroid vectors: no
    broadcast join, no window, no shuffle of the corpus at all. Same
    scoring/tiebreak as always (see ``_ivf_sorted_sims``)."""
    book = ivf_codebook(emb, n_centroids, sf_dir)
    e = _ivf_input(emb)
    if not book:
        return e.where(F.lit(False)).select(
            "vec_id", F.lit(None).cast("long").alias("centroid_id"), "v"
        )
    best = F.element_at(_ivf_sorted_sims(book), -1)
    return e.select(
        "vec_id", best["cid"].cast("long").alias("centroid_id"), "v"
    )


def ivf_assign_probes(
    emb: DataFrame,
    n_centroids: int = 8,
    nprobe: int = 1,
    sf_dir: str | None = None,
) -> DataFrame:
    """Multi-probe IVF query assignment: each vector's ``nprobe``
    nearest centroids with their probe rank (1 = nearest). Same
    literal-codebook scoring and tiebreak as ``ivf_assign`` — both are
    thin cuts of ``_ivf_sorted_sims``; this one reverses the sorted
    tail (best first) and explodes it with its 1-based position.
    Probing p cells multiplies the candidate set ~p×: the
    recall-vs-cost budget curve (``ann_recall_budget_curve``) measures
    what that buys."""
    book = ivf_codebook(emb, n_centroids, sf_dir)
    e = _ivf_input(emb)
    if not book:
        return e.where(F.lit(False)).select(
            "vec_id",
            F.lit(None).cast("long").alias("centroid_id"),
            F.lit(None).cast("int").alias("probe_rank"),
        )
    k = min(int(nprobe), len(book))
    top = F.reverse(F.slice(_ivf_sorted_sims(book), len(book) - k + 1, k))
    return e.select("vec_id", F.posexplode(top).alias("pos", "c")).select(
        "vec_id",
        F.col("c.cid").cast("long").alias("centroid_id"),
        (F.col("pos") + 1).cast("int").alias("probe_rank"),
    )


# ---------------------------------------------------------------------------
# Registered queries (embeddings table)
# ---------------------------------------------------------------------------


@register(
    "ann_bruteforce_topk",
    oracle=f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        pairs AS (
            SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                   {_DUCK_COS} AS cos
            FROM e q JOIN e n ON n.vec_id <> q.vec_id
            WHERE q.vec_id < 10
        ),
        ranked AS (
            SELECT *, CAST(row_number() OVER (
                PARTITION BY query_id ORDER BY cos DESC, neighbor_id
            ) AS BIGINT) AS rnk
            FROM pairs
        )
        SELECT query_id, neighbor_id, cos, rnk FROM ranked WHERE rnk <= 5
    """,
    tags=("similarity", "ann", "extension"),
)
def q_ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine top-5 neighbors for the first 10 vectors (brute force)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    scored = cosine_pairs(emb.where(F.col("vec_id") < 10), emb)
    return topk_per_query(scored, 5)


@register(
    "knn_top1_all",
    oracle=f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
              WHERE embedding IS NOT NULL AND list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) > 0),
        pairs AS (
            SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                   {_DUCK_COS} AS cos
            FROM e q JOIN e n ON n.vec_id <> q.vec_id
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cos DESC, neighbor_id
            ) AS rnk
            FROM pairs
        )
        SELECT query_id, neighbor_id, cos FROM ranked WHERE rnk = 1
    """,
    tags=("similarity", "knn", "extension"),
)
def q_knn_top1_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest neighbor for every vector (embedding-cosine near-dup scan).

    Physical strategy is size-guarded: broadcast single-dgemm below the
    driver budget, distributed block-matrix dgemm above it — exact
    either way (see ``knn_exact``)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return knn_exact(emb, k=1).drop("rnk")


def _duck_plane_fold(weights: list[float], col: str = "embedding") -> str:
    """Literal left-to-right projection sum for one hyperplane — the
    exact double-precision fold order the Spark in-row ``F.aggregate``
    uses (0.0 + w0·x0 + w1·x1 + …, left-associative), so the two
    engines agree bit-for-bit on the sign of a near-zero projection.
    The free-order GROUP-BY-sum oracle this replaces is the class the
    Brown-EMA flake came from: a ±1e-16 summation-order difference can
    flip ``proj >= 0`` and move a vector's bucket.

    Each term is length-guarded: Spark's fold zips the weight slice to
    the ACTUAL vector length, so on shorter-than-64 vectors (the
    degenerate-sweep corpus) the literal chain must contribute 0.0 —
    not a NULL-poisoning out-of-bounds index — past the end. Trailing
    ``+ 0.0`` terms cannot change the fold value or the ``>= 0`` sign
    (±0.0 both satisfy it), so the guard is exact."""
    return "0.0 + " + " + ".join(
        f"(CASE WHEN len({col}) >= {d + 1} "
        f"THEN {'' if w > 0 else '-'}CAST({col}[{d + 1}] AS DOUBLE) "
        "ELSE 0.0 END)"
        for d, w in enumerate(weights)
    )


def _duck_bucket_ctes() -> str:
    """CTE chain ``buckets(vec_id, bucket)`` shared by the bucket
    queries. Plane weights come from the SAME driver-side
    ``_plane_weights`` literals the Spark plan bakes in (md5 parity of
    "plane|pos"), and each plane's projection is a literal ordered
    fold (``_duck_plane_fold``); assumes the corpus's fixed 64-dim
    embeddings (as ``quality._rp_oracle`` already does)."""
    w = _plane_weights(N_PLANES, 64)
    bits = " + ".join(
        f"(CASE WHEN ({_duck_plane_fold(w[p])}) >= 0 "
        f"THEN CAST(1 AS BIGINT) << {p} ELSE CAST(0 AS BIGINT) END)"
        for p in range(N_PLANES)
    )
    return f"""
        buckets AS (
            SELECT vec_id, CAST({bits} AS BIGINT) AS bucket
            FROM embeddings
            WHERE embedding IS NOT NULL AND len(embedding) > 0
        )
    """


def _duck_bucket_sql() -> str:
    return f"WITH {_duck_bucket_ctes()} SELECT vec_id, bucket FROM buckets"


@register(
    "embedding_lsh_buckets",
    oracle=_duck_bucket_sql(),
    tags=("similarity", "lsh", "extension"),
)
def q_embedding_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-random-projection bucket id per vector (ANN scale path)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return hyperplane_buckets(emb)


@register(
    "ann_ivf_topk",
    oracle=f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
              WHERE embedding IS NOT NULL AND list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) > 0),
        cents AS (SELECT vec_id AS centroid_id, v AS cv FROM e ORDER BY vec_id LIMIT 8),
        scored AS (
            SELECT e.vec_id, c.centroid_id,
                   ROUND(list_dot_product(e.v, c.cv) /
                         (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))), 6) + 0.0 AS sim
            FROM e CROSS JOIN cents c
        ),
        assign AS (
            SELECT vec_id, centroid_id FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id ORDER BY sim DESC, centroid_id
                ) AS rn FROM scored
            ) WHERE rn = 1
        ),
        pairs AS (
            SELECT qa.vec_id AS query_id, na.vec_id AS neighbor_id,
                   qa.centroid_id AS centroid_id, {_DUCK_COS} AS cos
            FROM assign qa
            JOIN assign na ON na.centroid_id = qa.centroid_id AND na.vec_id <> qa.vec_id
            JOIN e q ON q.vec_id = qa.vec_id
            JOIN e n ON n.vec_id = na.vec_id
        ),
        ranked AS (
            SELECT *, CAST(row_number() OVER (
                PARTITION BY query_id ORDER BY cos DESC, neighbor_id
            ) AS BIGINT) AS rnk
            FROM pairs
        )
        SELECT query_id, neighbor_id, centroid_id, cos, rnk
        FROM ranked WHERE rnk <= 3
    """,
    tags=("similarity", "ann", "ivf", "extension"),
)
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (nprobe=1): coarse-quantize every vector to its nearest
    centroid cell, then exact cosine top-3 within the query's own cell.

    The 100 TB shape: centroid assignment is a broadcast of K centroids
    (never a corpus shuffle). Candidate generation is a SALTED cogroup
    — a grouped-map keyed on centroid_id alone hands one task the whole
    cell (~N/K rows: the single-task hazard), so queries are salted
    into ``IVF_QUERY_SALTS`` slices per cell while the neighbor side is
    replicated per salt. Each task then scores |cell|/S queries against
    the full cell with blocked dgemm: parallelism is K × S tasks, task
    memory is (1 + 1/S) × cell, and the result is EXACTLY the per-cell
    top-3 (the salt only partitions the query axis — every query still
    sees every cell member), so the oracle is unchanged. K (codebook
    size) and S are the two scale knobs; a real index trains K so cells
    fit a task and S soaks up what remains. Raising nprobe = unioning
    the next-nearest cells."""
    import numpy as np
    import pandas as pd

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assign = ivf_assign(emb, n_centroids=8, sf_dir=sf_dir)

    QUERY_BLOCK = 4096  # peak kernel memory = QUERY_BLOCK x |cell| doubles

    qry = assign.withColumn(
        "__salt", F.pmod(F.hash("vec_id"), F.lit(IVF_QUERY_SALTS))
    )
    # fresh aliases: both cogroup sides descend from `assign`, and
    # duplicate attribute ids across left/right are ambiguous to the
    # analyzer — renaming mints new ones
    nbr = assign.select(
        F.col("vec_id").alias("n_vec_id"),
        F.col("centroid_id").alias("n_centroid_id"),
        F.col("v").alias("n_v"),
    ).withColumn(
        "__nsalt", F.explode(F.array(*[F.lit(i) for i in range(IVF_QUERY_SALTS)]))
    )

    def cell_topk(qpdf: pd.DataFrame, npdf: pd.DataFrame) -> pd.DataFrame:
        # qpdf: this (cell, salt)'s query slice; npdf: the FULL cell.
        # Blocked dgemm: query rows stream in fixed blocks against the
        # (|cell| x dims) matrix, so memory is bounded by
        # QUERY_BLOCK x |cell| regardless of cell size.
        n_rows = len(npdf)
        k = min(3, n_rows - 1)
        if len(qpdf) == 0 or k < 1:
            return pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "centroid_id": [], "cos": [], "rnk": []}
            )
        order = np.argsort(npdf["n_vec_id"].to_numpy())  # id-order ⇒ tie-break
        nids = npdf["n_vec_id"].to_numpy()[order]
        nmat = np.array(npdf["n_v"].tolist(), dtype=np.float64)[order]
        nnrm = nmat / np.linalg.norm(nmat, axis=1, keepdims=True)
        qids = qpdf["vec_id"].to_numpy()
        qmat = np.array(qpdf["v"].tolist(), dtype=np.float64)
        qnrm = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
        cid = int(npdf["n_centroid_id"].iloc[0])
        outs = []
        for lo in range(0, len(qpdf), QUERY_BLOCK):
            hi = min(lo + QUERY_BLOCK, len(qpdf))
            cos = round_half_away(qnrm[lo:hi] @ nnrm.T, 6)
            # ids unique ⇒ a query's one self row masks out exactly
            cos[nids[None, :] == qids[lo:hi, None]] = -np.inf
            top = np.argsort(-cos, axis=1, kind="stable")[:, :k]
            outs.append(
                pd.DataFrame(
                    {
                        "query_id": np.repeat(qids[lo:hi], k),
                        "neighbor_id": nids[top].ravel(),
                        "centroid_id": cid,
                        "cos": np.take_along_axis(cos, top, axis=1).ravel(),
                        "rnk": np.tile(np.arange(1, k + 1), hi - lo),
                    }
                )
            )
        return pd.concat(outs, ignore_index=True)

    out_schema = "query_id long, neighbor_id long, centroid_id long, cos double, rnk long"
    return (
        qry.groupBy("centroid_id", "__salt")
        .cogroup(nbr.groupBy("n_centroid_id", "__nsalt"))
        .applyInPandas(cell_topk, out_schema)
    )


@register(
    "ann_lsh_topk",
    oracle=f"""
        WITH {_duck_bucket_ctes()},
        e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        nbrs AS (
            SELECT vec_id, bucket FROM (
                SELECT vec_id, bucket, row_number() OVER (
                    PARTITION BY bucket ORDER BY vec_id
                ) AS brn
                FROM buckets
            ) WHERE brn <= {ANN_BUCKET_CAP}
        ),
        pairs AS (
            SELECT qb.vec_id AS query_id, nb.vec_id AS neighbor_id,
                   qb.bucket AS bucket,
                   {_DUCK_COS} AS cos
            FROM buckets qb
            JOIN nbrs nb ON qb.bucket = nb.bucket AND nb.vec_id <> qb.vec_id
            JOIN e q ON q.vec_id = qb.vec_id
            JOIN e n ON n.vec_id = nb.vec_id
        ),
        ranked AS (
            SELECT *, CAST(row_number() OVER (
                PARTITION BY query_id ORDER BY cos DESC, neighbor_id
            ) AS BIGINT) AS rnk
            FROM pairs
        )
        SELECT query_id, neighbor_id, bucket, cos, rnk
        FROM ranked WHERE rnk <= 3
    """,
    tags=("similarity", "ann", "lsh", "extension"),
)
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path end-to-end: candidates restricted to the query's
    LSH bucket, then exact cosine re-ranking within the bucket.

    Hot-bucket cap: 8 hyperplanes give 2^8 = 256 fixed buckets, so
    the uncapped per-bucket join is Θ(N²/256)
    candidate pairs no matter how large N grows. The NEIGHBOR side of
    each bucket is therefore truncated to its first ``ANN_BUCKET_CAP``
    members by vec_id (deterministic truncation, mirrored in the
    oracle's ranked subquery) — every vector still queries, but
    per-query fanout is bounded by cap, making total candidate volume
    linear in N. The truncation rank itself is computed with the
    staged two-pass top-k (``staged_topk_per_group``) so no task ever
    sorts a whole hot bucket. N_PLANES is the recall/cost knob a real
    deployment scales with corpus size (documented parameter of
    ``hyperplane_buckets``); the cap is the hard bound that holds even
    when the planes are mis-sized for the corpus. At the test SFs
    (≤ 2k vectors / 256 buckets) the cap never binds, so results equal
    the uncapped form there; the cap-binding contract is pinned by a
    dedicated fixture test."""
    from velox_hadoop_spark.functions.staged import staged_topk_per_group

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    buckets = hyperplane_buckets(emb)
    qb = buckets.select(F.col("vec_id").alias("query_id"), "bucket")
    nb = staged_topk_per_group(
        buckets, ["bucket"], ["vec_id"], ANN_BUCKET_CAP
    ).select(F.col("vec_id").alias("neighbor_id"), "bucket")
    cand = qb.join(nb, "bucket").where(F.col("neighbor_id") != F.col("query_id"))
    e_q = emb.select(F.col("vec_id").alias("query_id"), to_double(F.col("embedding")).alias("qv"))
    e_n = emb.select(F.col("vec_id").alias("neighbor_id"), to_double(F.col("embedding")).alias("nv"))
    from velox_hadoop_spark.functions.vectors import dot, norm

    scored = (
        cand.join(e_q, "query_id")
        .join(e_n, "neighbor_id")
        .withColumn("qn", norm(F.col("qv")))
        .withColumn("nn", norm(F.col("nv")))
        .select(
            "query_id",
            "neighbor_id",
            "bucket",
            (
                F.round(
                    dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn")), 6
                )
                + F.lit(0.0)
            ).alias("cos"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 3)
    )


def label_centroids(emb: DataFrame) -> DataFrame:
    """Per-label mean vector as (label, pos, c) rows.

    posexplode → groupBy(label, pos) LOOKS like a 64× row blowup, but
    partial aggregation collapses each task's contribution to
    |labels|·dims rows before the exchange — shuffle volume is
    partitions × labels × dims regardless of corpus size."""
    dims = emb.select(
        "label",
        F.posexplode(to_double(F.col("embedding"))).alias("pos", "x"),
    )
    return dims.groupBy("label", "pos").agg(F.avg("x").alias("c"))


@register(
    "embedding_label_centroids",
    oracle="""
        WITH dims AS (
            SELECT label, CAST(i - 1 AS INTEGER) AS pos,
                   CAST(embedding[i] AS DOUBLE) AS x
            FROM embeddings
            CROSS JOIN UNNEST(generate_series(1, len(embedding))) AS t(i)
        )
        SELECT label, pos, ROUND(avg(x), 6) + 0.0 AS c
        FROM dims GROUP BY label, pos
    """,
    tags=("similarity", "profiling", "extension"),
)
def q_embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean embedding per class label (embedding-space class profile)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return label_centroids(emb).select(
        "label", "pos", (F.round("c", 6) + F.lit(0.0)).alias("c")
    )


@register(
    "embedding_outliers",
    oracle="""
        WITH dims AS (
            SELECT vec_id, label, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS x
            FROM embeddings
            CROSS JOIN UNNEST(generate_series(1, len(embedding))) AS t(i)
        ),
        cent AS (
            SELECT label, pos, floor(avg(x) * 1e9 + 0.5) / 1e9 AS c
            FROM dims GROUP BY label, pos
        ),
        dist AS (
            SELECT d.vec_id, d.label,
                   ROUND(sqrt(CAST(sum(CAST(floor(
                       (d.x - c.c) * (d.x - c.c) * 1e12 + 0.5
                   ) AS BIGINT)) AS DOUBLE) / 1e12), 6) AS dist
            FROM dims d JOIN cent c ON d.label = c.label AND d.pos = c.pos
            GROUP BY d.vec_id, d.label
        )
        SELECT vec_id, label, dist, rnk FROM (
            SELECT *, CAST(row_number() OVER (
                PARTITION BY label ORDER BY dist DESC, vec_id
            ) AS BIGINT) AS rnk
            FROM dist
        ) WHERE rnk <= 5
    """,
    tags=("similarity", "profiling", "outliers", "extension"),
)
def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-QA outlier scan: the 5 vectors farthest (L2) from their
    own label centroid, per label. Centroid table is labels × dims rows
    — broadcast back onto the per-dimension stream; the per-vector
    distance aggregate combines map-side (vector dims are co-located
    after posexplode), so one tiny shuffle row per vector.

    The ranking key is built from ORDER-INDEPENDENT integers: the
    centroid is pinned to a 1e-9 grid and each per-dimension squared
    term to a 1e-12 grid BEFORE the cross-dimension sum (exact BIGINT
    addition in both engines), so a ±1e-16 summation-order difference
    between Spark's partial aggregation and DuckDB's scan order can no
    longer flip the ROUND-6 top-5 membership — the free-order double
    sum this replaces was the last ranking key in the cancellation
    class the Brown-EMA flake came from. Terms are < 4e12 on unit-ish
    embeddings, so a 64-dim sum stays far inside BIGINT."""
    from pyspark.sql import Window

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dims = emb.select(
        "vec_id",
        "label",
        F.posexplode(to_double(F.col("embedding"))).alias("pos", "x"),
    )
    cent = label_centroids(emb).select(
        "label",
        "pos",
        (F.floor(F.col("c") * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)).alias("c"),
    )
    d2 = (F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))
    dist = (
        dims.join(F.broadcast(cent), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            F.round(
                F.sqrt(
                    F.sum(F.floor(d2 * F.lit(1e12) + F.lit(0.5))).cast("double")
                    / F.lit(1e12)
                ),
                6,
            ).alias("dist")
        )
    )
    w = Window.partitionBy("label").orderBy(F.desc("dist"), F.asc("vec_id"))
    return (
        dist.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 5)
    )


def embedding_norms_arrow(emb: DataFrame) -> DataFrame:
    """Per-vector L2 norm through ``mapInArrow`` — the zero-copy Arrow
    RecordBatch surface (the lowest-overhead Python boundary Spark
    offers: no pandas materialization, numpy views straight over Arrow
    buffers). The JVM builtins in ``functions/vectors.py`` stay the
    default for this math; this operator pins the mapInArrow plumbing
    (batch iteration, list-array handling, schema contract) for kernels
    that genuinely need Python, and the oracle cross-checks the
    boundary end-to-end.
    """
    import numpy as np
    import pyarrow as pa

    def kernel(batches):
        for batch in batches:
            tbl = pa.table(
                {
                    "vec_id": batch.column("vec_id"),
                    "l2_norm": [
                        float(round_half_away(np.sqrt(np.dot(v, v)), 4))
                        for v in batch.column("embedding").to_pylist()
                    ],
                }
            )
            for out in tbl.to_batches():
                yield out

    # empty arrays drop too: np gives norm([]) = 0.0 while DuckDB's
    # list_sum of an empty list is NULL — "norm of nothing" is undefined
    return drop_null_vectors(emb).where(F.size("embedding") > 0).select(
        "vec_id", to_double(F.col("embedding")).alias("embedding")
    ).mapInArrow(kernel, "vec_id long, l2_norm double")


@register(
    "embedding_norms_arrow",
    oracle="""
        SELECT vec_id,
               ROUND(sqrt(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm
        FROM embeddings
        WHERE embedding IS NOT NULL AND len(embedding) > 0
    """,
    tags=("similarity", "mapInArrow", "udf", "extension"),
)
def q_embedding_norms_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norm per embedding via the Arrow RecordBatch boundary."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_norms_arrow(emb)


@register(
    "embedding_quantize_int8",
    # Scalar int8 quantization QA: per-vector min/max-scaled uint8
    # codes, reconstructed in-plan; the emitted reconstruction-error
    # stats bound the storage-compression loss (4x smaller vectors at
    # 100 TB). All arithmetic is per-element and order-free, so the
    # two engines compute bit-identical doubles before rounding.
    oracle="""
        WITH v AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
            WHERE embedding IS NOT NULL AND len(embedding) > 0
        ),
        scaled AS (
            SELECT vec_id, e,
                   list_min(e) AS lo,
                   greatest((list_max(e) - list_min(e)) / 255.0, 1e-12) AS scale
            FROM v
        ),
        rec AS (
            SELECT vec_id,
                   list_transform(
                       list_zip(e, list_transform(e, x -> floor((x - lo) / scale + 0.5) * scale + lo)),
                       p -> abs(p[1] - p[2])
                   ) AS errs
            FROM scaled
        )
        SELECT vec_id,
               ROUND(list_max(errs), 6) AS max_abs_err,
               ROUND(list_sum(errs) / len(errs), 6) AS mean_abs_err
        FROM rec
    """,
    tags=("similarity", "quantization", "compression", "extension"),
)
def q_embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar-quantization reconstruction error per embedding.

    Numpy kernel over ``mapInPandas``: zero shuffles (each Arrow batch
    quantizes independently) and vectorized math. The pure-expression
    form (transform/aggregate HOFs) is also zero-shuffle but those
    lambdas evaluate interpreted with the array_min/max inlined per
    element — measured ~8× slower; per-element IEEE arithmetic is
    identical either way, so the oracle is unaffected."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            lo = mat.min(axis=1, keepdims=True)
            scale = np.maximum((mat.max(axis=1, keepdims=True) - lo) / 255.0, 1e-12)
            rec = np.floor((mat - lo) / scale + 0.5) * scale + lo
            err = np.abs(mat - rec)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "max_abs_err": round_half_away(err.max(axis=1), 6),
                    # cumsum, not sum: np.sum's PAIRWISE association can
                    # differ from DuckDB's sequential list_sum by ~1e-15
                    # — enough to flip the 6th decimal at a rounding
                    # boundary; cumsum accumulates left-to-right like
                    # the oracle (max is order-free)
                    "mean_abs_err": round_half_away(
                        err.cumsum(axis=1)[:, -1] / err.shape[1], 6
                    ),
                }
            )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # empty arrays drop: a zero-column matrix crashes max(axis=1)
    return drop_null_vectors(emb).where(F.size("embedding") > 0).select(
        "vec_id", to_double(F.col("embedding")).alias("embedding")
    ).mapInPandas(kernel, "vec_id long, max_abs_err double, mean_abs_err double")


@register(
    "centroid_separation_matrix",
    oracle="""
        WITH dims AS (
            SELECT label, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS x
            FROM embeddings
            CROSS JOIN UNNEST(generate_series(1, len(embedding))) AS t(i)
        ),
        cent AS (SELECT label, pos, avg(x) AS c FROM dims GROUP BY label, pos),
        norms AS (SELECT label, sqrt(sum(c * c)) AS n FROM cent GROUP BY label),
        dots AS (
            SELECT a.label AS label_a, b.label AS label_b, sum(a.c * b.c) AS dot
            FROM cent a JOIN cent b ON a.pos = b.pos AND a.label < b.label
            GROUP BY a.label, b.label
        )
        SELECT label_a, label_b,
               ROUND(dot / (na.n * nb.n), 6) + 0.0 AS cos
        FROM dots
        JOIN norms na ON dots.label_a = na.label
        JOIN norms nb ON dots.label_b = nb.label
    """,
    tags=("similarity", "profiling", "extension"),
)
def q_centroid_separation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine between class centroids — the embedding-space
    class-separability report (near-1 pairs flag label confusion or
    collapsed representations; the monitoring companion to the per-item
    outlier scan).

    Everything after the one centroid aggregate operates on
    |labels| × dims rows: the dimension-aligned self-join and both norm
    joins are broadcast-sized at any corpus scale.
    """
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cent = label_centroids(emb)
    norms = cent.groupBy("label").agg(F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("n"))
    a = cent.select(F.col("label").alias("label_a"), "pos", F.col("c").alias("ca"))
    b = cent.select(F.col("label").alias("label_b"), "pos", F.col("c").alias("cb"))
    dots = (
        a.join(b, "pos")
        .where(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("dot"))
    )
    na = norms.select(F.col("label").alias("label_a"), F.col("n").alias("na"))
    nb = norms.select(F.col("label").alias("label_b"), F.col("n").alias("nb"))
    return (
        dots.join(F.broadcast(na), "label_a")
        .join(F.broadcast(nb), "label_b")
        .select(
            "label_a",
            "label_b",
            (
                F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6) + F.lit(0.0)
            ).alias("cos"),
        )
    )


# ---------------------------------------------------------------------------
# ANN quality gate: recall@k of the LSH scale path vs exact top-k
# ---------------------------------------------------------------------------

_RECALL_K = 3
# Fixed-COUNT deterministic query sample: the first N vec_ids in md5
# order. A proportional sample (the old vec_id % 20) grows with the
# corpus — at 100 TB it outgrows any broadcast/driver budget and makes
# the exact baseline O(0.05·N²); a fixed count keeps the audit cost
# O(SAMPLE·N) forever. md5 order is corpus-order-independent and
# bias-free (ids may correlate with ingest time; their hashes don't).
_RECALL_SAMPLE_N = 1000
_DUCK_QS_CTE = (
    "qs AS (SELECT vec_id FROM embeddings "
    f"WHERE embedding IS NOT NULL AND {DUCK_FINITE_VECTOR} "
    f"ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {_RECALL_SAMPLE_N})"
)


def recall_query_sample(emb: DataFrame) -> DataFrame:
    """The shared fixed-count query sample of the three recall gates —
    identical derivation to the oracle's ``qs`` CTE (md5-of-decimal-id
    order, id tiebreak, LIMIT N)."""
    return drop_degenerate_vectors(emb).orderBy(
        F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
    ).limit(_RECALL_SAMPLE_N)


# Session cache for the recall audits' shared brute-force ground truth
# (round-11 VERDICT item 4: the four audits re-derived the exact top-k
# independently — the single most expensive corner of the registry).
# Keyed by (applicationId, sf_dir, corpus content fingerprint — see
# _embeddings_fingerprint); holds DRIVER-LOCAL data only —
# (corpus count, normalized-corpus broadcast handle, the exact-top id
# pairs, the ordered sample ids) — so it survives the harness's
# spark.catalog.clearCache() between queries/runs, unlike a persisted
# DataFrame. Boundedness: the collected rows are ≤ _RECALL_SAMPLE_N ×
# _RECALL_K id pairs + _RECALL_SAMPLE_N sample ids (module CONSTANTS —
# ~3k tuples at ANY corpus size, the sanctioned bounded-collect class;
# nothing SF-proportional is ever collected).
_RECALL_GT_CACHE: dict = {}


def _embeddings_fingerprint(sf_dir: str) -> str:
    """Content fingerprint of ``{sf_dir}/embeddings.parquet`` (per-file
    size/mtime over a recursive walk — the same scheme as
    ``streaming.events._stream_source_dir``): the degenerate/empty
    sweeps rewrite corpora at FIXED paths in-session, so a cache keyed
    on the path alone would serve stale ground truth and a stale
    normalized-corpus broadcast for the rebuilt file (round-12
    advice)."""
    import os

    from velox_hadoop_spark.catalog import content_fingerprint

    return content_fingerprint(os.path.join(sf_dir, "embeddings.parquet"))


def recall_ground_truth(spark: SparkSession, sf_dir: str, emb: DataFrame):
    """(n, bc, exact_top_local, sample_ids) for the shared recall-gate
    sample — the exact dgemm baseline runs ONCE per (session, sf_dir,
    corpus content state) and every later audit (and every later warm
    re-run in the same session) replays it as a ~3k-row local
    relation, which also turns the recall join into a broadcast
    probe. The content fingerprint in the key invalidates the cache
    when the embeddings file is rewritten at the same path; superseded
    entries for the same (app, sf_dir) are evicted so a sweep that
    rewrites the corpus repeatedly holds ONE ground truth + broadcast
    at a time."""
    fp = _embeddings_fingerprint(sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir, fp)
    for stale in [
        k for k in _RECALL_GT_CACHE if k[:2] == key[:2] and k[2] != fp
    ]:
        old = _RECALL_GT_CACHE.pop(stale)
        if old[1] is not None:
            old[1].unpersist()
    hit = _RECALL_GT_CACHE.get(key)
    if hit is None:
        sample = recall_query_sample(emb)
        n = emb.count()
        bc = broadcast_normalized_corpus(emb) if n <= DRIVER_BROADCAST_ROWS else None
        rows = [
            (r.query_id, r.neighbor_id)
            for r in knn_exact(
                emb, _RECALL_K, queries=sample, n_query_blocks=1, n=n, bc=bc
            )
            .select("query_id", "neighbor_id")
            .collect()
        ]
        ids = [r.vec_id for r in sample.select("vec_id").collect()]
        _RECALL_GT_CACHE[key] = (n, bc, rows, ids)
    n, bc, rows, ids = _RECALL_GT_CACHE[key]
    exact_top = spark.createDataFrame(
        rows, "query_id long, neighbor_id long"
    )
    return n, bc, exact_top, ids


def _score_candidates(emb, cand):
    """Exact cosine re-rank for a (query_id, neighbor_id) candidate
    frame via the expression join path — the over-budget fallback of
    ``score_pairs_exact``. Both vector sides are degenerate-filtered,
    mirroring the oracles' finite-vector ``e`` CTE (a NULL/empty/zero
    neighbor never reaches the ranking; unguarded it would cos as NaN,
    which Spark sorts ABOVE every number in the top-k window)."""
    from velox_hadoop_spark.functions.vectors import dot, norm

    e = drop_degenerate_vectors(emb)
    e_q = e.select(
        F.col("vec_id").alias("query_id"), to_double(F.col("embedding")).alias("qv")
    ).withColumn("qn", norm(F.col("qv")))
    e_n = e.select(
        F.col("vec_id").alias("neighbor_id"), to_double(F.col("embedding")).alias("nv")
    ).withColumn("nn", norm(F.col("nv")))
    return (
        cand.join(e_q, "query_id")
        .join(e_n, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (
                F.round(
                    dot(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn")), 6
                )
                + F.lit(0.0)
            ).alias("cos"),
        )
    )


def score_pairs_exact(
    corpus: DataFrame,
    cand: DataFrame,
    driver_broadcast_rows: int = DRIVER_BROADCAST_ROWS,
    n: int | None = None,
    bc=None,
) -> DataFrame:
    """Exact cosine for a bounded (query_id, neighbor_id) candidate
    frame, with the same physical-strategy guard as ``knn_exact``.

    Below the driver budget the normalized corpus matrix is broadcast
    once and each Arrow batch of id pairs resolves both sides by binary
    search into it — one vectorized row-wise dot per batch, no join, no
    per-pair lambda evaluation (the zip_with/aggregate expression dot is
    interpreted per element, ~10× slower on a dense candidate set).
    Past the budget it falls back to ``_score_candidates`` — a plain
    pair join that shuffles only the candidate frame, which every
    caller bounds by construction (sample × bucket). Pairs whose either
    side is degenerate (NULL/empty/zero vector) drop in BOTH regimes,
    matching the oracle's finite-vector CTE.

    ``n``/``bc`` share a caller's size probe / broadcast handle, as in
    ``knn_exact``."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    if n is None:
        n = corpus.count()
    if n > driver_broadcast_rows:
        return _score_candidates(corpus, cand)
    if bc is None:
        bc = broadcast_normalized_corpus(corpus)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat_n = bc.value
        order = np.argsort(ids)
        sids, smat = ids[order], mat_n[order]
        hi = len(sids)
        for pdf in batches:
            q = pdf["query_id"].to_numpy()
            m = pdf["neighbor_id"].to_numpy()
            qi = np.searchsorted(sids, q)
            ni = np.searchsorted(sids, m)
            valid = (qi < hi) & (ni < hi)
            qi_c = np.minimum(qi, max(hi - 1, 0))
            ni_c = np.minimum(ni, max(hi - 1, 0))
            if hi:
                valid &= (sids[qi_c] == q) & (sids[ni_c] == m)
            else:
                valid &= False
            qv = smat[qi_c[valid]]
            nv = smat[ni_c[valid]]
            cos = round_half_away(np.einsum("ij,ij->i", qv, nv), 6)
            yield pd.DataFrame(
                {"query_id": q[valid], "neighbor_id": m[valid], "cos": cos}
            )

    return cand.select("query_id", "neighbor_id").mapInPandas(
        score, "query_id long, neighbor_id long, cos double"
    )


def _recall_vs_exact(emb, cand, gt):
    """(n_queries, n_exact, n_hits, recall) of an approximate
    candidate-pair frame against the exact sample top-k — the shared
    tail of every recall gate. Recall is a ratio of integer counts,
    floor-rounded at 6 dp.

    ``gt`` is the (n, bc, exact_top_local, _ids) tuple from
    ``recall_ground_truth``: the exact baseline runs once per
    (session, sf_dir) and arrives here as a ~3k-row LOCAL relation, so
    the candidate re-rank shares the cached size probe and (below the
    driver budget) the ONE normalized-corpus broadcast, and the recall
    join is a broadcast probe. Past the broadcast budget the baseline
    streams the corpus through the cogroup un-replicated inside
    ``recall_ground_truth`` — NOTHING SF-proportional is ever broadcast
    or collected, so the audit stays exact at any scale."""
    n, bc, exact_top, _ids = gt
    approx_top = topk_per_query(
        score_pairs_exact(emb, cand, n=n, bc=bc), _RECALL_K
    ).select("query_id", "neighbor_id")
    hits = exact_top.join(approx_top, ["query_id", "neighbor_id"], "left_semi")
    stats = exact_top.agg(
        F.countDistinct("query_id").alias("n_queries"),
        F.count("*").alias("n_exact"),
    )
    nh = hits.agg(F.count("*").alias("n_hits"))
    return stats.crossJoin(F.broadcast(nh)).select(
        "n_queries",
        "n_exact",
        "n_hits",
        # empty exact baseline (empty/all-degenerate corpus) must report
        # NULL recall like the oracle — ANSI double division by zero
        # raises where DuckDB yields NULL
        F.when(
            F.col("n_exact") > 0,
            F.floor(
                F.col("n_hits") / F.col("n_exact").cast("double") * F.lit(1e6)
                + F.lit(0.5)
            )
            / F.lit(1e6),
        ).alias("recall"),
    )



@register(
    "ann_lsh_recall_at_k",
    oracle=f"""
        WITH {_duck_bucket_ctes()},
        e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
              WHERE embedding IS NOT NULL AND list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) > 0),
        {_DUCK_QS_CTE},
        exact_pairs AS (
            SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, {_DUCK_COS} AS cos
            FROM e q JOIN qs ON q.vec_id = qs.vec_id
            JOIN e n ON n.vec_id <> q.vec_id
        ),
        exact_top AS (
            SELECT query_id, neighbor_id FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY cos DESC, neighbor_id
                ) AS rnk FROM exact_pairs
            ) WHERE rnk <= {_RECALL_K}
        ),
        lsh_pairs AS (
            SELECT qb.vec_id AS query_id, nb.vec_id AS neighbor_id, {_DUCK_COS} AS cos
            FROM buckets qb
            JOIN qs ON qb.vec_id = qs.vec_id
            JOIN buckets nb ON qb.bucket = nb.bucket AND nb.vec_id <> qb.vec_id
            JOIN e q ON q.vec_id = qb.vec_id
            JOIN e n ON n.vec_id = nb.vec_id
        ),
        lsh_top AS (
            SELECT query_id, neighbor_id FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY cos DESC, neighbor_id
                ) AS rnk FROM lsh_pairs
            ) WHERE rnk <= {_RECALL_K}
        )
        SELECT CAST((SELECT count(DISTINCT query_id) FROM exact_top) AS BIGINT) AS n_queries,
               CAST((SELECT count(*) FROM exact_top) AS BIGINT) AS n_exact,
               CAST((SELECT count(*) FROM exact_top t
                     JOIN lsh_top l ON t.query_id = l.query_id
                                   AND t.neighbor_id = l.neighbor_id) AS BIGINT) AS n_hits,
               FLOOR((SELECT count(*) FROM exact_top t
                      JOIN lsh_top l ON t.query_id = l.query_id
                                    AND t.neighbor_id = l.neighbor_id)
                     / CAST((SELECT count(*) FROM exact_top) AS DOUBLE) * 1e6 + 0.5) / 1e6
                   AS recall
    """,
    tags=("similarity", "ann", "lsh", "quality-gate", "extension"),
)
def q_ann_lsh_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of the hyperplane-LSH ANN path against exact top-3 on
    the fixed-count md5-order query sample (``recall_query_sample``) —
    the measurable quality gate every approximate index needs before it
    replaces the exact path.

    Production shape: the exact side scores SAMPLE × corpus (a quality
    audit is always sample-based — never all-pairs) through the guarded
    dgemm kernels, so the audit stays O(sample·N) at any corpus size;
    the LSH side is the per-bucket equi-join the scale path already
    uses, filtered to the same sample; the recall join is
    sample-top-k-sized. Recall is a ratio of integer counts — one
    engine-order-independent division, floor-rounded in both engines.

    On this corpus the gate reads LOW (~2.5% at sf0.01) and that is the
    point: the synthetic embeddings are near-isotropic, so a single
    8-plane table slices the sphere into 256 cells whose occupants are
    barely correlated with cosine rank — exactly the failure mode a
    recall gate exists to expose before an index replaces the exact
    path. The standard fix is OR-amplification across tables
    (``ann_multiprobe_recall``), which trades candidate volume for
    recall."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sample = recall_query_sample(emb)
    buckets = hyperplane_buckets(emb)
    qb = (
        buckets.join(
            sample.select("vec_id"), "vec_id", "left_semi"
        ).select(F.col("vec_id").alias("query_id"), "bucket")
    )
    nb = buckets.select(F.col("vec_id").alias("neighbor_id"), "bucket")
    cand = qb.join(nb, "bucket").where(F.col("neighbor_id") != F.col("query_id"))
    return _recall_vs_exact(
        emb, cand, recall_ground_truth(spark, sf_dir, emb)
    )


_AMP_TABLES = 4        # OR-amplification: number of independent tables
_AMP_PLANES = 4        # planes per table (16 buckets each)
_AMP_STRIDE = 100      # global plane-id stride separating tables


def _duck_multitable_cte(tables: int, planes: int, stride: int) -> str:
    """CTE ``tbuckets(vec_id, tbl, bucket)`` — the OR-amplified twin of
    ``_duck_bucket_ctes`` (plane ids offset by ``tbl * stride`` so
    every table's hyperplanes are independent). Same literal ordered
    folds from the shared ``_plane_weights`` derivation, one UNION ALL
    branch per table."""
    branches = []
    for tbl in range(tables):
        w = _plane_weights(planes, 64, offset=tbl * stride)
        bits = " + ".join(
            f"(CASE WHEN ({_duck_plane_fold(w[j])}) >= 0 "
            f"THEN CAST(1 AS BIGINT) << {j} ELSE CAST(0 AS BIGINT) END)"
            for j in range(planes)
        )
        branches.append(
            f"SELECT vec_id, CAST({tbl} AS BIGINT) AS tbl, CAST({bits} AS BIGINT) AS bucket "
            "FROM embeddings "
            "WHERE embedding IS NOT NULL AND len(embedding) > 0"
        )
    body = " UNION ALL ".join(branches)
    return f"""
        tbuckets AS (
            {body}
        )
    """


@register(
    "ann_multiprobe_recall",
    oracle=f"""
        WITH {_duck_multitable_cte(_AMP_TABLES, _AMP_PLANES, _AMP_STRIDE)},
        e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
              WHERE embedding IS NOT NULL AND list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) > 0),
        {_DUCK_QS_CTE},
        exact_pairs AS (
            SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, {_DUCK_COS} AS cos
            FROM e q JOIN qs ON q.vec_id = qs.vec_id
            JOIN e n ON n.vec_id <> q.vec_id
        ),
        exact_top AS (
            SELECT query_id, neighbor_id FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY cos DESC, neighbor_id
                ) AS rnk FROM exact_pairs
            ) WHERE rnk <= {_RECALL_K}
        ),
        cand AS (
            SELECT DISTINCT qb.vec_id AS query_id, nb.vec_id AS neighbor_id
            FROM tbuckets qb
            JOIN qs ON qb.vec_id = qs.vec_id
            JOIN tbuckets nb ON qb.tbl = nb.tbl AND qb.bucket = nb.bucket
                            AND nb.vec_id <> qb.vec_id
        ),
        lsh_pairs AS (
            SELECT c.query_id, c.neighbor_id, {_DUCK_COS} AS cos
            FROM cand c
            JOIN e q ON q.vec_id = c.query_id
            JOIN e n ON n.vec_id = c.neighbor_id
        ),
        lsh_top AS (
            SELECT query_id, neighbor_id FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY cos DESC, neighbor_id
                ) AS rnk FROM lsh_pairs
            ) WHERE rnk <= {_RECALL_K}
        )
        SELECT CAST((SELECT count(DISTINCT query_id) FROM exact_top) AS BIGINT) AS n_queries,
               CAST((SELECT count(*) FROM exact_top) AS BIGINT) AS n_exact,
               CAST((SELECT count(*) FROM exact_top t
                     JOIN lsh_top l ON t.query_id = l.query_id
                                   AND t.neighbor_id = l.neighbor_id) AS BIGINT) AS n_hits,
               FLOOR((SELECT count(*) FROM exact_top t
                      JOIN lsh_top l ON t.query_id = l.query_id
                                    AND t.neighbor_id = l.neighbor_id)
                     / CAST((SELECT count(*) FROM exact_top) AS DOUBLE) * 1e6 + 0.5) / 1e6
                   AS recall
    """,
    tags=("similarity", "ann", "lsh", "amplification", "quality-gate", "extension"),
)
def q_ann_multiprobe_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of OR-amplified LSH (4 independent 4-plane tables,
    candidates = union of same-bucket pairs over tables) on the same
    fixed-count query sample as ``ann_lsh_recall_at_k`` — the standard
    recall lever:
    coarser tables raise per-table collision probability, the OR across
    tables compounds it, and the exact re-rank keeps precision. The
    amplified index trades ~T× candidate volume for recall, and this
    gate MEASURES the trade so the choice of (tables, planes) is
    data-driven, not vibes-driven.

    Plan shape per table is identical to the single-table scale path
    (in-row bucket computation, per-(table, bucket) equi-join); the
    union adds a branch per table over the same cached bucket frame,
    and everything downstream is candidate-bounded."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sample = recall_query_sample(emb)
    tbuckets = None
    for t in range(_AMP_TABLES):
        b = hyperplane_buckets(
            emb, n_planes=_AMP_PLANES, plane_offset=t * _AMP_STRIDE
        ).withColumn("tbl", F.lit(t))
        tbuckets = b if tbuckets is None else tbuckets.unionByName(b)
    # (measured round 11: persisting tbuckets here reads 3.4 -> 4.5 s
    # warm — the materialization barrier costs more than re-evaluating
    # the plane folds, which pipeline freely in both branches)
    qb = tbuckets.join(sample.select("vec_id"), "vec_id", "left_semi").select(
        F.col("vec_id").alias("query_id"), "tbl", "bucket"
    )
    nb = tbuckets.select(F.col("vec_id").alias("neighbor_id"), "tbl", "bucket")
    cand = (
        qb.join(nb, ["tbl", "bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    return _recall_vs_exact(
        emb, cand, recall_ground_truth(spark, sf_dir, emb)
    )


@register(
    "ann_ivf_recall",
    oracle=f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
              WHERE embedding IS NOT NULL AND list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) > 0),
        {_DUCK_QS_CTE},
        cents AS (SELECT vec_id AS centroid_id, v AS cv FROM e ORDER BY vec_id LIMIT 8),
        scored AS (
            SELECT e.vec_id, c.centroid_id,
                   ROUND(list_dot_product(e.v, c.cv) /
                         (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))), 6) + 0.0 AS sim
            FROM e CROSS JOIN cents c
        ),
        assign AS (
            SELECT vec_id, centroid_id FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id ORDER BY sim DESC, centroid_id
                ) AS rn FROM scored
            ) WHERE rn = 1
        ),
        exact_pairs AS (
            SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, {_DUCK_COS} AS cos
            FROM e q JOIN qs ON q.vec_id = qs.vec_id
            JOIN e n ON n.vec_id <> q.vec_id
        ),
        exact_top AS (
            SELECT query_id, neighbor_id FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY cos DESC, neighbor_id
                ) AS rnk FROM exact_pairs
            ) WHERE rnk <= {_RECALL_K}
        ),
        ivf_pairs AS (
            SELECT qa.vec_id AS query_id, na.vec_id AS neighbor_id, {_DUCK_COS} AS cos
            FROM assign qa
            JOIN qs ON qa.vec_id = qs.vec_id
            JOIN assign na ON na.centroid_id = qa.centroid_id AND na.vec_id <> qa.vec_id
            JOIN e q ON q.vec_id = qa.vec_id
            JOIN e n ON n.vec_id = na.vec_id
        ),
        ivf_top AS (
            SELECT query_id, neighbor_id FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY cos DESC, neighbor_id
                ) AS rnk FROM ivf_pairs
            ) WHERE rnk <= {_RECALL_K}
        )
        SELECT CAST((SELECT count(DISTINCT query_id) FROM exact_top) AS BIGINT) AS n_queries,
               CAST((SELECT count(*) FROM exact_top) AS BIGINT) AS n_exact,
               CAST((SELECT count(*) FROM exact_top t
                     JOIN ivf_top l ON t.query_id = l.query_id
                                   AND t.neighbor_id = l.neighbor_id) AS BIGINT) AS n_hits,
               FLOOR((SELECT count(*) FROM exact_top t
                      JOIN ivf_top l ON t.query_id = l.query_id
                                    AND t.neighbor_id = l.neighbor_id)
                     / CAST((SELECT count(*) FROM exact_top) AS DOUBLE) * 1e6 + 0.5) / 1e6
                   AS recall
    """,
    tags=("similarity", "ann", "ivf", "quality-gate", "extension"),
)
def q_ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of the IVF (nprobe=1) path on the same fixed-count query sample —
    completing the index quality dashboard (single-table LSH, amplified
    LSH, IVF): same exact baseline, same integer-ratio recall, so the
    three gates are directly comparable and the index choice is a
    measured decision. Candidate generation is the same-cell equi-join
    the production ``ann_ivf_topk`` path uses."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sample = recall_query_sample(emb)
    assign = ivf_assign(emb, sf_dir=sf_dir)
    qa = assign.join(sample.select("vec_id"), "vec_id", "left_semi").select(
        F.col("vec_id").alias("query_id"), "centroid_id"
    )
    na = assign.select(F.col("vec_id").alias("neighbor_id"), "centroid_id")
    cand = (
        qa.join(na, "centroid_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
    )
    return _recall_vs_exact(
        emb, cand, recall_ground_truth(spark, sf_dir, emb)
    )


_HARDNEG_K = 3


@register(
    "ann_hard_negatives",
    oracle=f"""
        WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
              WHERE embedding IS NOT NULL AND list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])) > 0),
        {_DUCK_QS_CTE},
        cents AS (SELECT vec_id AS centroid_id, v AS cv FROM e ORDER BY vec_id LIMIT 8),
        scored AS (
            SELECT e.vec_id, c.centroid_id,
                   ROUND(list_dot_product(e.v, c.cv) /
                         (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))), 6) + 0.0 AS sim
            FROM e CROSS JOIN cents c
        ),
        assign AS (
            SELECT vec_id, centroid_id FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id ORDER BY sim DESC, centroid_id
                ) AS rn FROM scored
            ) WHERE rn = 1
        ),
        pairs AS (
            SELECT qa.vec_id AS query_id, q.label AS query_label,
                   na.vec_id AS neighbor_id, n.label AS neighbor_label,
                   {_DUCK_COS} AS cos
            FROM assign qa
            JOIN qs ON qa.vec_id = qs.vec_id
            JOIN assign na ON na.centroid_id = qa.centroid_id
                          AND na.vec_id <> qa.vec_id
            JOIN e q ON q.vec_id = qa.vec_id
            JOIN e n ON n.vec_id = na.vec_id
            WHERE n.label IS DISTINCT FROM q.label
        )
        SELECT query_id, CAST(query_label AS BIGINT) AS query_label,
               neighbor_id, CAST(neighbor_label AS BIGINT) AS neighbor_label,
               cos, CAST(rnk AS BIGINT) AS rnk
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cos DESC, neighbor_id
            ) AS rnk FROM pairs
        ) WHERE rnk <= {_HARDNEG_K}
    """,
    tags=("similarity", "ann", "ivf", "training-data", "extension"),
)
def q_ann_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query in
    the fixed md5-order sample, the top-3 most-similar vectors carrying
    a DIFFERENT label, drawn from the query's IVF cell — the standard
    in-batch-negatives upgrade (high-similarity, wrong-label examples
    are the ones a contrastive loss learns most from).

    Same scale shape as ``ann_ivf_recall``: same-cell equi-join bounds
    the candidates, the label filter rides the join (no extra
    shuffle — label travels with the assignment frame), and the exact
    re-rank is the guarded Arrow scorer. A NULL-label neighbor counts
    as a different label (IS DISTINCT FROM semantics in both
    engines)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sample = recall_query_sample(emb)
    assign = ivf_assign(emb, sf_dir=sf_dir)
    labels = emb.select("vec_id", "label")
    qa = (
        assign.join(sample.select("vec_id"), "vec_id", "left_semi")
        .join(labels, "vec_id")
        .select(
            F.col("vec_id").alias("query_id"),
            "centroid_id",
            F.col("label").alias("query_label"),
        )
    )
    na = assign.join(labels, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"),
        "centroid_id",
        F.col("label").alias("neighbor_label"),
    )
    cand = (
        qa.join(na, "centroid_id")
        .where(
            (F.col("neighbor_id") != F.col("query_id"))
            & ~F.col("neighbor_label").eqNullSafe(F.col("query_label"))
        )
        .select("query_id", "query_label", "neighbor_id", "neighbor_label")
    )
    scored = score_pairs_exact(
        emb, cand.select("query_id", "neighbor_id")
    ).join(cand, ["query_id", "neighbor_id"])
    return topk_per_query(scored, _HARDNEG_K).select(
        "query_id",
        F.col("query_label").cast("long"),
        "neighbor_id",
        F.col("neighbor_label").cast("long"),
        "cos",
        "rnk",
    )
