"""Iterative graph dataflow: adjacency build + PageRank.

Re-expresses the reference's PageRank Spark-first:

  * adjacency build — reference: src/main/java/org/dicl/velox/benchmark/
    PageRank.java:99-129 + Step1Mapper.java:17-65 + Step1Reducer.java:
    11-28 (edge list → `"1.0\\t" + csv(outlinks)` strings). Here:
    `groupBy(src).agg(collect_list(dst))` — no stringly-typed encoding.
  * rank propagation — reference: PageRank.java:131-153 +
    Step2Mapper.java:13-39 + Step2Reducer.java:17-41 (send rank/fanout
    to outlinks, sum, apply damping `(1-d) + d*sum`). Here: join + agg
    per iteration on DataFrames.
  * convergence — reference: PageRank.java:65-82,196-229 (driver
    re-reads part files into a HashMap each pass — full cluster→driver
    round trip). Here the driver loop pulls back ONE scalar
    (Σ|Δrank|); ranks never leave the executors. Also fixes the
    reference bug where step3 reads `/ranks{maxRuns}` even after early
    convergence (PageRank.java:86) — we always rank the CURRENT frame.

Scale notes: each iteration is two shuffles (join on src, agg on dst).
Lineage is cut with localCheckpoint — every ``checkpoint_every``
iterations in fixed-count mode, every pass-pair in tol mode (deep plan
trees cost superlinear driver-side re-analysis per action even when
execution is fully cached) — otherwise the plan tree grows linearly
and both planning and stage-retry cost explode. Edges are persisted
across iterations, re-used, never recomputed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from velox_hadoop_spark.functions.lineage import free_local_checkpoint, release
from velox_hadoop_spark.functions.pairs import id_pairs
from velox_hadoop_spark.functions.staged import staged_topk_per_group
from velox_hadoop_spark.plans.registry import register

DAMPING = 0.85

# BFS frontier/visited broadcast budget: ~1M node ids ≈ tens of MB —
# comfortably inside executor broadcast limits; beyond it the level
# joins fall back to shuffle plans.
BFS_BROADCAST_NODES = 1_000_000


def adjacency(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Edge list → per-node sorted distinct-outlink array + initial rank 1.0.

    ``collect_set`` dedups inside the aggregate, so a raw (possibly
    duplicated) edge list needs only ONE shuffle — no upstream
    ``distinct()`` exchange."""
    return edges.groupBy(src).agg(
        F.array_sort(F.collect_set(dst)).alias("outlinks"),
        F.lit(1.0).alias("rank"),
    )


def pagerank(
    edges: DataFrame,
    damping: float = DAMPING,
    max_iters: int = 20,
    tol: float | None = None,
    checkpoint_every: int = 5,
    with_iters: bool = False,
) -> DataFrame:
    """PageRank over a (src, dst) edge DataFrame.

    Reference semantics (init rank 1.0, dangling nodes contribute
    nothing, every node — including pure sinks — gets `(1-d) + d*Σ`).
    If ``tol`` is set, stops early when Σ|Δrank| < tol (the driver
    fetches one scalar per iteration, nothing else).

    With ``with_iters=True`` the result carries a constant ``iters``
    column — the number of propagation passes actually executed — so a
    convergence-controlled run can be hash-checked against the
    fixed-iteration oracle unrolled at that count.

    Scheduling shape (the cost driver at small-to-mid scale): tol mode
    runs propagation passes in PAIRS — two lazy passes fuse into ONE
    Spark action, and a single two-column aggregate over the
    checkpointed pair frame yields BOTH boundary deltas (the frame
    threads ``prev_rank``/``prev2`` through the joins). The stopping
    pass is still the FIRST i with Σ|Δᵢ| < tol — the earlier delta is
    checked first, and if it already clears tol the pair's second
    (speculative) pass is discarded by selecting ``prev_rank`` back out
    of the same frame. Exact same semantics, half the driver actions;
    each pair eagerly localCheckpoints so every action plans over a
    constant-depth tree (see the in-loop comment for the measurement).
    """
    # Degree rides a count window over the distinct edge frame: ONE
    # shuffle (by src) annotates every edge, and the persisted frame
    # keeps that hash partitioning for the per-pass contribution join.
    # The former groupBy+join alternative costs a second exchange at
    # scale — the |V|-row degree side outgrows any broadcast threshold
    # at 100 TB and falls back to re-shuffling the edge frame — and
    # locally it double-cached the edge list (pre- and post-degree).
    edges_deg = (
        edges.select(F.col("src"), F.col("dst"))
        .distinct()
        .withColumn("deg", F.count(F.lit(1)).over(Window.partitionBy("src")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nodes = (
        edges_deg.select(F.col("src").alias("node"))
        .union(edges_deg.select(F.col("dst").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    damp = float(damping)

    def _propagate(cur: DataFrame, keep_prev2: bool) -> DataFrame:
        """One lazy pass: (node, rank[, prev_rank]) → (node, rank,
        prev_rank[, prev2]). The contribution aggregate joins back onto
        the CURRENT rank frame (which carries every node by
        construction), so the previous rank rides the propagation join —
        the Σ|Δ| scalar is a bare aggregate, never a third node-keyed
        join per pass."""
        # Deliberately UNHINTED join: at local SF Catalyst broadcasts
        # edges_deg (its InMemoryRelation stats sit under the 64 MB
        # threshold, and in a single JVM the "broadcast" is a free
        # reference hand-off that also skips the rank-side exchange —
        # measured 1.4x faster than a forced SHUFFLE_HASH build at
        # sf0.1); at scale the same stats exceed the threshold and the
        # planner falls back to a shuffle join that reuses the persisted
        # frame's src partitioning, shuffling only the |V|-row rank
        # side. Forcing either strategy would pessimize one regime.
        contribs = edges_deg.join(
            cur.select(F.col("node").alias("src"), "rank"), "src"
        ).select(
            F.col("dst").alias("node"),
            (F.col("rank") / F.col("deg")).alias("contrib"),
        )
        summed = contribs.groupBy("node").agg(F.sum("contrib").alias("s"))
        carry = [F.col("node"), F.col("rank").alias("prev_rank")]
        out = [
            F.col("node"),
            (
                F.lit(1.0 - damp) + F.lit(damp) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("rank"),
            F.col("prev_rank"),
        ]
        if keep_prev2:
            carry.append(F.col("prev_rank").alias("prev2"))
            out.append(F.col("prev2"))
        return cur.select(*carry).join(summed, "node", "left").select(*out)

    ranks = nodes.withColumn("rank", F.lit(1.0))
    prev_persisted = None
    last_ckpt = None  # fixed-iter mode: superseded checkpoint awaiting free
    iters_run = 0

    if tol is None:
        for i in range(max_iters):
            new_ranks = _propagate(ranks, keep_prev2=False).select("node", "rank")
            iters_run = i + 1
            if (i + 1) % checkpoint_every == 0:
                # cut lineage: without this the plan doubles in depth per pass
                new_ranks = new_ranks.localCheckpoint(eager=True)
                # free the PREVIOUS checkpoint (the new eager one no
                # longer lineage-depends on it); the final checkpoint is
                # what the caller receives and stays materialized.
                if last_ckpt is not None:
                    free_local_checkpoint(last_ckpt)
                last_ckpt = new_ranks
            ranks = new_ranks
        result = ranks
    else:
        i = 0
        result = None
        while i < max_iters:
            f1 = _propagate(ranks, keep_prev2=False)
            pair = 2 if i + 1 < max_iters else 1
            frame = _propagate(f1, keep_prev2=True) if pair == 2 else f1
            # Cut lineage EVERY pair. Measured at sf0.1: with persist-only
            # frames the per-pair cost climbs 1.9s → 2.0s → 4.3s — cached
            # EXECUTION is flat but Catalyst/AQE re-analyze the whole
            # accumulated join tree per action, and that driver-side
            # planning grows superlinearly in depth. The checkpoint
            # replaces the persist as the pair's single materialization
            # (blocks land in the executor BlockManager either way; the
            # delta scalar, the possible result, and the next pair all
            # scan those blocks), so each action plans over a constant
            # three-node tree. LAZY (eager=False) since round 8: the
            # delta aggregate right below is the pair's first action and
            # materializes the checkpoint as a side effect — one fewer
            # job dispatch per pair than an eager checkpoint + agg
            # (measured: steady-state 6.2s → 4.9-5.2s at sf0.1; fresh-
            # session min-of-3 ~5.4s, the gap being per-run JIT).
            # Durability class is unchanged from the every-
            # checkpoint_every cadence this replaces — see
            # functions/lineage.py on the executor-loss trade-off.
            frame = frame.localCheckpoint(eager=False)
            if pair == 2:
                row = frame.agg(
                    F.sum(F.abs(F.col("prev_rank") - F.col("prev2"))).alias("d1"),
                    F.sum(F.abs(F.col("rank") - F.col("prev_rank"))).alias("d2"),
                ).first()
                d1, d2 = row["d1"], row["d2"]
            else:
                row = frame.agg(
                    F.sum(F.abs(F.col("rank") - F.col("prev_rank"))).alias("d1")
                ).first()
                d1, d2 = row["d1"], None
            if prev_persisted is not None:
                # release = unpersist + free the checkpoint RDD when the
                # superseded frame was a localCheckpoint (unpersist alone
                # leaks it — see functions/lineage.py)
                release(prev_persisted)
            prev_persisted = frame
            if pair == 2 and d1 is not None and d1 < tol:
                # converged at the pair's FIRST pass: the second pass was
                # speculative — recover pass-i ranks from prev_rank out
                # of the same persisted frame
                iters_run = i + 1
                result = frame.select("node", F.col("prev_rank").alias("rank"))
                break
            iters_run = i + pair
            ranks = frame
            last_d = d2 if pair == 2 else d1
            if last_d is not None and last_d < tol:
                break
            i += pair
        if result is None:
            result = ranks.select("node", "rank")

    if with_iters:
        return result.withColumn("iters", F.lit(iters_run))
    return result


def _pagerank_oracle(iters: int, damping: float = DAMPING) -> str:
    """Unrolled recursive-free SQL equivalent for DuckDB (fixed iters)."""
    parts = [
        "WITH edges AS (SELECT DISTINCT l_suppkey AS src, l_partkey AS dst FROM lineitem)",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst AS node FROM edges)",
        "outdeg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src)",
        "r0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS rank FROM nodes)",
    ]
    base = 1.0 - damping
    for i in range(1, iters + 1):
        parts.append(
            f"c{i} AS (SELECT e.dst AS node, sum(r.rank / d.deg) AS s "
            f"FROM edges e JOIN r{i-1} r ON e.src = r.node "
            f"JOIN outdeg d ON e.src = d.src GROUP BY e.dst)"
        )
        parts.append(
            f"r{i} AS (SELECT n.node, {base} + {damping} * coalesce(c.s, 0) AS rank "
            f"FROM nodes n LEFT JOIN c{i} c ON n.node = c.node)"
        )
    ctes = parts[0] + ",\n" + ",\n".join(parts[1:])
    return f"{ctes}\nSELECT node, ROUND(rank, 6) AS rank FROM r{iters}"


# ---------------------------------------------------------------------------
# Registered queries — graph derived deterministically from lineitem
# (supplier→part shipping edges, deduped)
# ---------------------------------------------------------------------------


def _lineitem_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Raw (duplicated) edges; consumers dedup where it matters —
    # adjacency() via collect_set, pagerank() via its internal distinct.
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.select(
        F.col("l_suppkey").alias("src"), F.col("l_partkey").alias("dst")
    )


@register(
    "adjacency_list",
    oracle="""
        SELECT src AS node,
               string_agg(dst, ',' ORDER BY dst) AS outlinks,
               CAST(1.0 AS DOUBLE) AS rank
        FROM (SELECT DISTINCT l_suppkey AS src, l_partkey AS dst FROM lineitem)
        GROUP BY src
    """,
    tags=("graph", "reference:Step1Reducer.java:11-28"),
)
def q_adjacency_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank step 1: edge list → adjacency (csv form for the oracle)."""
    adj = adjacency(_lineitem_edges(spark, sf_dir))
    return adj.select(
        F.col("src").alias("node"),
        F.array_join(
            F.transform(F.col("outlinks"), lambda x: x.cast("string")), ","
        ).alias("outlinks"),
        "rank",
    )


@register(
    "pagerank_3iter",
    oracle=_pagerank_oracle(3),
    tags=("graph", "iterative", "reference:PageRank.java:33-96"),
)
def q_pagerank_3iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed 3-iteration PageRank over supplier→part edges.

    DOCUMENTED numeric-order decision (round-10 review of the
    cancellation class): the per-pass Σcontrib each engine carries
    between iterations is an unquantized free-order double sum —
    Spark's partial aggregation vs the oracle CTE's scan order can
    differ at ~1e-16 per node per pass. Unlike the hyperplane-bit /
    outlier-ranking members of the class (realigned this round), no
    downstream >=-threshold or top-k membership hangs on the raw sum:
    ranks are only compared after ROUND(rank, 6), contributions are
    all-positive (no catastrophic cancellation — relative error stays
    ~1e-15 over 3 passes, eight orders below the rounding grid), and
    nine rounds of driver evidence show zero flakes. Quantizing each
    of the 3 inter-pass rank frames to a micro-grid would add 3 extra
    projections to the hot loop for no observable effect; revisit only
    if a flake ever appears (the convergence-loop twin already pins
    its stopping pass robustly — see the note below)."""
    ranks = pagerank(_lineitem_edges(spark, sf_dir), max_iters=3)
    return ranks.select("node", F.round("rank", 6).alias("rank"))


# The convergence loop (Σ|Δ| < 0.01) reaches tol at pass 5 on both the
# sf0.001 (tests) and sf0.01 (driver gate) lineitem graphs — at sf0.01
# the per-pass Σ|Δ| is 1615, 68.6, 2.92, 0.124, 0.0053: orders of
# magnitude around the threshold, so the stopping pass is robust to FP
# summation order. The oracle is the same unrolled-SQL PageRank fixed at
# that pass count, carrying the count as a constant `iters` column: if
# the Spark loop ever stops at a different pass, the emitted `iters`
# (and the ranks) hash-mismatch the oracle.
#
# SCALE PIN: the count is a property of the DATA (sf0.001 and sf0.01
# both converge in 5), not of the algorithm — a static SQL oracle
# cannot run a to-convergence loop, so this oracle is only meaningful
# at the driver's verification scales. At sf0.1 the graph needs 6
# passes and the sf0.1 sweep reports an EXPECTED mismatch here; the
# rows-only smoke still covers that scale.
_CONVERGED_ITERS_SF001 = 5


@register(
    "pagerank_converged",
    oracle=_pagerank_oracle(_CONVERGED_ITERS_SF001).replace(
        "ROUND(rank, 6) AS rank",
        f"{_CONVERGED_ITERS_SF001} AS iters, ROUND(rank, 6) AS rank",
        1,
    ),
    tags=("graph", "iterative", "reference:PageRank.java:65-82"),
)
def q_pagerank_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convergence-controlled PageRank (Σ|Δ| < 0.01), ranked descending,
    with the executed pass count as a checkable constant column."""
    ranks = pagerank(
        _lineitem_edges(spark, sf_dir), max_iters=20, tol=0.01, with_iters=True
    )
    return ranks.select(
        "node", "iters", F.round("rank", 6).alias("rank")
    ).orderBy(F.desc("rank"), F.asc("node"))


def bfs_levels(
    edges: DataFrame,
    start: int,
    max_levels: int = 20,
    require_drained: bool = False,
) -> DataFrame:
    """Shortest hop-distance from ``start`` over an UNDIRECTED edge
    list — level-synchronous BFS as a driver loop.

    Each pass joins the current frontier with the edge list, anti-joins
    the visited set, and pulls ONE scalar (frontier size) to decide
    termination; node sets never leave the executors. Visited/frontier
    frames persist across passes, lineage cut by the same cadence as
    PageRank. Integer levels — no FP concerns, so the oracle (a
    recursive CTE running to the fixpoint) must match exactly once the
    loop drains the frontier.

    Physical strategy is runtime-adaptive at zero extra cost: the loop
    already pulls each level's frontier size, so the frontier (and the
    cumulative visited set, whose size is the running sum) is broadcast
    into the edge join while it fits ``BFS_BROADCAST_NODES`` rows and
    shuffled as an ordinary equi-join once it outgrows that. Early BFS
    levels — tiny frontiers probing a huge edge list, the common case —
    therefore never shuffle the persisted edge table; a frontier that
    explodes to O(N) falls back to the exchange plan instead of OOMing
    executors.
    """
    from pyspark.sql import functions as F  # noqa: F811 (local clarity)

    e = edges.select("src", "dst")
    # No distinct here: callers pass deduped directed edges, and the
    # per-level neighbor set is distinct-ed anyway, so duplicate edges
    # cannot change levels — dropping the global dedup saves a full
    # 2|E|-row shuffle before the first level runs.
    und = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    visited = (
        und.sparkSession.createDataFrame([(start, 0)], "node long, lvl int")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    frontier = visited
    n_frontier = n_visited = 1
    drained = False
    stale_frontier = None  # superseded frontier awaiting unpersist

    def _maybe_bc(df: DataFrame, n_rows: int) -> DataFrame:
        return F.broadcast(df) if n_rows <= BFS_BROADCAST_NODES else df

    for lvl in range(1, max_levels + 1):
        # anti-join BEFORE the distinct: the visited check is a
        # broadcast probe (no exchange) while the dedup is the level's
        # one shuffle, so filtering first shrinks the shuffled bytes —
        # at late levels almost every matched dst is already visited
        # (guide: drop rows before the exchange, not after)
        new_frontier = (
            und.join(_maybe_bc(frontier.select(F.col("node").alias("src")), n_frontier), "src")
            .select(F.col("dst").alias("node"))
            .join(_maybe_bc(visited.select("node"), n_visited), "node", "left_anti")
            .distinct()
            .select("node", F.lit(lvl).cast("int").alias("lvl"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        # Full count, not limit(1): it materializes the ENTIRE persisted
        # frontier, so the union below reads the cache instead of
        # re-running the join + anti-join lineage a second time. The
        # count doubles as the next pass's broadcast-vs-shuffle gauge.
        n_frontier = new_frontier.count()
        n_visited += n_frontier
        if n_frontier == 0:
            new_frontier.unpersist()
            drained = True
            break
        new_visited = visited.union(new_frontier).localCheckpoint(eager=True)
        # release, not unpersist: every visited after level 1 is itself a
        # localCheckpoint whose RDD unpersist() alone would leak — O(L)
        # full visited snapshots would otherwise stay in executor memory
        release(visited)
        # the previous frontier fed this level's join and is now dead;
        # unpersist it here (not earlier — the join above still read it)
        if stale_frontier is not None:
            stale_frontier.unpersist()
        stale_frontier = frontier
        frontier = new_frontier
        visited = new_visited
    if require_drained and not drained:
        # The loop only learns the frontier drained by OBSERVING an empty
        # one, which takes an extra iteration — a graph whose last level
        # is exactly max_levels would be falsely flagged even though the
        # result is complete. Probe one level further (neighbor join +
        # anti-join existence check, nothing added to visited) and fail
        # only if genuinely-unvisited nodes remain beyond the cap.
        probe = (
            und.join(
                _maybe_bc(frontier.select(F.col("node").alias("src")), n_frontier),
                "src",
            )
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
        )
        drained = probe.limit(1).count() == 0
    if stale_frontier is not None:
        stale_frontier.unpersist()
    if frontier is not visited:
        frontier.unpersist()
    und.unpersist()
    if require_drained and not drained:
        # a frontier still alive after max_levels means levels beyond the
        # cap exist; silently returning a truncated level map would
        # desynchronize from any bounded-recursion oracle. Same fail-loud
        # contract as connected_components.
        raise RuntimeError(
            f"bfs_levels: frontier not drained after {max_levels} levels"
        )
    return visited


@register(
    "bfs_levels_from_min_supplier",
    oracle="""
        WITH RECURSIVE base AS (
            SELECT DISTINCT l_suppkey AS src, l_partkey AS dst FROM lineitem
        ),
        und AS (
            SELECT src, dst FROM base
            UNION SELECT dst, src FROM base
        ),
        start AS (SELECT min(src) AS s FROM (SELECT l_suppkey AS src FROM lineitem)),
        reach(node, lvl) AS (
            -- s IS NOT NULL: an EMPTY graph has no start node — without
            -- the guard the seed row would be a phantom (NULL, 0)
            SELECT s, 0 FROM start WHERE s IS NOT NULL
            UNION
            -- lvl < 12 bounds the recursion: without it the cycle
            -- start->x->start regenerates every node at lvl+2 forever.
            -- 12 >> the graph's diameter at the verified SFs (BFS
            -- drains in <= 4 levels); min(lvl) below keeps shortest.
            SELECT u.dst, r.lvl + 1
            FROM reach r JOIN und u ON u.src = r.node
            WHERE r.lvl < 12
        )
        SELECT node, CAST(min(lvl) AS INT) AS lvl
        FROM reach GROUP BY node
    """,
    tags=("graph", "iterative", "bfs", "extension"),
)
def q_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop distance of every reachable node from the lowest supplier id,
    over the undirected supplier-part graph."""
    edges = _lineitem_edges(spark, sf_dir)
    start = edges.agg(F.min("src").alias("s")).first()["s"]
    if start is None:
        # EMPTY graph: no start node exists, so the reachable set is
        # empty (the oracle's recursive CTE seeds from an empty start
        # table) — return the typed empty frame instead of crashing on
        # int(None)
        return edges.select(
            F.col("src").alias("node"), F.lit(0).cast("int").alias("lvl")
        ).where(F.lit(False))
    # max_levels matches the oracle's recursion bound (lvl < 12 emits
    # levels up to 12); require_drained makes a deeper-than-12 graph
    # fail LOUDLY on the Spark side instead of hash-mismatching the
    # bounded recursive CTE.
    return bfs_levels(edges.distinct(), int(start), max_levels=12, require_drained=True)


TRIANGLE_ADJ_CAP = 64
TRIANGLE_PART_CAP = 256


def co_supply_capped_edges(
    membership: DataFrame,
    adj_cap: int = TRIANGLE_ADJ_CAP,
    part_cap: int = TRIANGLE_PART_CAP,
    persist_guard_input: bool = True,
) -> DataFrame:
    """Oriented (s1 < s2) co-supply edges from a (part, s) membership
    frame, degree-bounded on both axes: parts with more than
    ``part_cap`` distinct members are dropped, and each node keeps its
    ``adj_cap`` SMALLEST higher-id neighbors.

    Memory-bounded at ANY part/degree skew — the round-12 close of the
    last buffer-before-filter aggregates (r11 verdict, graph.py):

    * part cap: ``drop_hot_keys`` (count pre-pass + broadcast
      anti-join, the one shared guard in dedup.py) removes over-cap
      parts BEFORE the grouped ``collect_set``, so the aggregation
      buffer holds at most ``part_cap`` member ids for ANY part. The
      pre-pass counts rows of the DISTINCT (part, s) frame — a hash
      aggregate with constant per-entry state, spillable — so
      count(*) per part IS the distinct-member count the cap is
      defined over (and exactly the oracles' ``pdeg`` CTE over the
      DISTINCT ps). The round-5..11 shape instead filtered
      ``size(ids) <= part_cap`` AFTER the collect: output-identical,
      but a hot part's FULL member set transited the aggregation
      buffer first — a task OOM on a power-law 100 TB graph where one
      boilerplate part is supplied by 1e6+ suppliers.
    * adjacency cap: each part's contribution is still sliced to its
      ``adj_cap`` smallest higher-id neighbors IN-ROW (if s2 is among
      s1's k smallest global neighbors then fewer than k neighbors
      precede it in ANY shared part, so s2 survives every per-part
      slice — property-tested in tests/test_properties.py), but the
      per-node merge is now [explode → (s1, s2) hash-agg dedup →
      ``staged_topk_per_group``] instead of
      ``slice(array_distinct(flatten(collect_list(nbrs))))``: the old
      merge buffered adj_cap × parts(s1) elements per node before its
      post-hoc slice — unbounded in how many parts a hub supplies.
      The dedup aggregate carries constant per-entry state; stage-1 of
      the top-k is bounded by the scan partition, stage-2 by
      adj_cap × n_partitions survivors per node.

    Value-identical to the old shape on non-NULL keys (both drop
    exactly the parts with more than ``part_cap`` distinct members and
    keep each node's ``adj_cap`` smallest higher-id neighbors; hot-part
    fixture in tests/test_round12_parity.py). NULL parts now drop
    entirely — matching the oracles' ``JOIN pdeg ON part`` equi-join
    mirror, which never matches NULL (the old groupBy kept a NULL-part
    group the oracle CTEs never had). ``persist_guard_input`` forwards
    to the guard: the distinct membership frame has two readers (count
    pre-pass + grouped collect), so it persists spillably by default;
    pass False for the 2×-recompute form (see drop_hot_keys)."""
    from velox_hadoop_spark.operators.dedup import drop_hot_keys

    # ONE exchange for the whole part-side pipeline: HashPartitioning
    # on `part` satisfies every downstream ClusteredDistribution whose
    # keys include it, so the (part, s) distinct, the guard's count
    # pre-pass, AND the grouped collect_set all run exchange-free on
    # this layout (a naive .distinct() hashes on (part, s) and forces
    # the guard + collect to re-shuffle on part). A mega-hot part
    # concentrates its raw rows in one task here, but through
    # constant-per-entry spillable hash aggregates — time skew at
    # worst, never the array-buffer OOM this rewrite closed.
    distinct_mem = (
        membership.select("part", "s")
        .repartition("part")
        .dropDuplicates(["part", "s"])
    )
    guarded = drop_hot_keys(
        distinct_mem, ["part"], part_cap, persist_input=persist_guard_input
    )
    grouped = (
        guarded.groupBy("part")
        .agg(F.sort_array(F.collect_set("s")).alias("ids"))
        .where(F.size("ids") >= 2)
        .select("ids")
    )
    contrib = (
        grouped.select(
            F.explode(
                F.transform(
                    "ids",
                    lambda x, i: F.struct(
                        x.alias("s1"),
                        F.slice(F.col("ids"), i + F.lit(2), F.lit(adj_cap)).alias(
                            "nbrs"
                        ),
                    ),
                )
            ).alias("c")
        )
        .select("c.s1", "c.nbrs")
        .where(F.size("nbrs") > 0)
    )
    cand = (
        contrib.select("s1", F.explode("nbrs").alias("s2"))
        .dropDuplicates(["s1", "s2"])
    )
    return staged_topk_per_group(cand, ["s1"], [F.asc("s2")], adj_cap).select(
        "s1", "s2"
    )


@register(
    "supplier_triangle_counts",
    oracle=f"""
        WITH ps AS (SELECT DISTINCT l_partkey AS part, l_suppkey AS s FROM lineitem),
        deg AS (SELECT part, count(*) AS c FROM ps GROUP BY part),
        ok AS (SELECT p.part, p.s FROM ps p JOIN deg d ON p.part = d.part AND d.c <= 256),
        e_full AS (
            SELECT DISTINCT a.s AS s1, b.s AS s2
            FROM ok a JOIN ok b ON a.part = b.part AND a.s < b.s
        ),
        e AS (
            SELECT s1, s2 FROM (
                SELECT s1, s2,
                       row_number() OVER (PARTITION BY s1 ORDER BY s2) AS rn
                FROM e_full
            ) WHERE rn <= {TRIANGLE_ADJ_CAP}
        ),
        tri AS (
            SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
            FROM e e1
            JOIN e e2 ON e2.s1 = e1.s2
            JOIN e e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2
        ),
        members AS (
            SELECT a AS s FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        )
        SELECT s AS supplier, count(*) AS n_triangles
        FROM members GROUP BY s
    """,
    tags=("graph", "triangles", "extension"),
)
def q_supplier_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle participation count per supplier over the (degree-
    bounded) co-supply graph — edge = two suppliers share a part.

    The standard distributed triangle enumeration: orient every edge
    low→high id so each triangle is generated exactly once by two
    equi-joins. Two density guards make the census scale-stable:
    parts shared by > 256 suppliers are dropped (a hot part's co-supply
    projection is a quadratic clique with no structure — same rationale
    as the dedup self-join caps), and each node keeps only its
    ``TRIANGLE_ADJ_CAP`` lowest-id oriented neighbors (the standard
    high-degree-vertex mitigation: a co-supply graph densifies toward a
    clique as scale grows, where exact enumeration is Θ(V³); the
    deterministic truncation bounds the join at O(V·D²) at ANY scale
    while remaining exactly reproducible by the oracle)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    e = co_supply_capped_edges(
        li.select(F.col("l_partkey").alias("part"), F.col("l_suppkey").alias("s"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    e1 = e
    e2 = e.select(F.col("s1").alias("s2"), F.col("s2").alias("s3"))
    e3 = e.select(F.col("s1").alias("t1"), F.col("s2").alias("t3"))
    tri = (
        e1.join(e2, "s2")
        .join(e3, (F.col("t1") == F.col("s1")) & (F.col("t3") == F.col("s3")))
        .select("s1", "s2", "s3")
    )
    # Membership multiset via an IN-ROW explode of the corner array —
    # NOT a 3-way union of `tri`: tri is an unpersisted join pipeline,
    # and union'ing three selects of it executes the wedge+closure
    # joins three times inside the single final action (phase-timed at
    # sf0.1: the union shape spent 6.3s of a 6.6s warm total on the
    # triple execution; the explode runs the joins once).
    members = tri.select(
        F.explode(F.array("s1", "s2", "s3")).alias("supplier")
    )
    return members.groupBy("supplier").agg(F.count("*").alias("n_triangles"))


NBR_PART_CAP = 512  # drop parts supplied by more suppliers than this


@register(
    "neighbor_jaccard_links",
    oracle=f"""
        WITH e AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS part FROM lineitem),
        deg AS (SELECT s, count(*) AS deg FROM e GROUP BY s),
        pdeg AS (SELECT part, count(*) AS c FROM e GROUP BY part),
        ok AS (SELECT e.s, e.part FROM e JOIN pdeg ON e.part = pdeg.part
               AND pdeg.c <= {NBR_PART_CAP}),
        common AS (
            SELECT a.s AS s1, b.s AS s2, count(*) AS n_common
            FROM ok a JOIN ok b ON a.part = b.part AND a.s < b.s
            GROUP BY a.s, b.s
        )
        SELECT s1, s2, n_common,
               ROUND(CAST(n_common AS DOUBLE)
                     / (d1.deg + d2.deg - n_common), 6) AS jaccard
        FROM common
        JOIN deg d1 ON common.s1 = d1.s
        JOIN deg d2 ON common.s2 = d2.s
        ORDER BY CAST(n_common AS DOUBLE) / (d1.deg + d2.deg - n_common) DESC,
                 s1, s2
        LIMIT 20
    """,
    tags=("graph", "link-prediction", "extension"),
)
def q_neighbor_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 supplier pairs by neighborhood Jaccard over the
    supplier→part graph — the classic link-prediction / entity-blocking
    score (|N(a) ∩ N(b)| / |N(a) ∪ N(b)|).

    Common neighbors come from a wedge join on the shared part;
    degrees come from the UNCAPPED edge set (exact denominators).
    Parts with > NBR_PART_CAP suppliers are excluded from the wedge
    side only: a hot part contributes quadratic wedges but uniform,
    signal-free overlap (the same density guard as the triangle census
    and dedup self-joins — bounded join fanout at any scale, exactly
    reproduced by the oracle). Top-k is TakeOrderedAndProject, no
    total sort.

    Round-12 rework (the r11 verdict's buffer-before-filter class):
    the hot-part cap is enforced by ``drop_hot_keys`` on the DISTINCT
    (s, part) edge frame BEFORE the grouped ``collect_set`` — the old
    shape collected every part's full supplier set (uncapped, to share
    one frame with the degree count) and size-filtered the array
    afterwards, buffering a hot part's whole membership in the
    aggregation buffer. Degrees now fold directly from the distinct
    edge frame (hash aggregate, constant per-entry state — no arrays
    anywhere on the uncapped path); only the guarded wedge side builds
    per-part arrays, bounded by the cap at any skew. The distinct
    frame is persisted once and feeds all three readers (degree count,
    guard pre-pass, wedge collect), so ``persist_input=False`` on the
    guard avoids a second cache of the same rows."""
    from velox_hadoop_spark.operators.dedup import drop_hot_keys
    from velox_hadoop_spark.operators.sort import top_k

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    # repartition by part ONCE (same single-exchange layout argument
    # as co_supply_capped_edges): the distinct, the guard pre-pass,
    # and the wedge collect all consume HashPartitioning(part); only
    # the degree count re-shuffles (it groups on s)
    e = (
        li.select(
            F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("part")
        )
        .repartition("part")
        .dropDuplicates(["s", "part"])
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = e.groupBy("s").agg(F.count("*").alias("deg"))
    grouped = (
        drop_hot_keys(e, ["part"], NBR_PART_CAP, persist_input=False)
        .groupBy("part")
        .agg(F.sort_array(F.collect_set("s")).alias("ids"))
        .where(F.size("ids") >= 2)
    )
    pair_structs = id_pairs(F.col("ids"), "s1", "s2")
    common = (
        grouped.select(F.explode(pair_structs).alias("p"))
        .groupBy("p.s1", "p.s2")
        .agg(F.count("*").alias("n_common"))
    )
    scored = (
        common.join(deg.select(F.col("s").alias("s1"), F.col("deg").alias("d1")), "s1")
        .join(deg.select(F.col("s").alias("s2"), F.col("deg").alias("d2")), "s2")
        .select(
            "s1",
            "s2",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("d1") + F.col("d2") - F.col("n_common"))
            ).alias("j"),
        )
    )
    ranked = top_k(scored, 20, F.desc("j"), F.asc("s1"), F.asc("s2"))
    return ranked.select("s1", "s2", "n_common", F.round("j", 6).alias("jaccard"))


# ---------------------------------------------------------------------------
# Hierarchical containment walk (BOM-style rollup)
# ---------------------------------------------------------------------------


def containment_walk(
    nodes: DataFrame,
    edges: DataFrame,
    max_iters: int = 12,
    require_drained: bool = True,
) -> DataFrame:
    """Resolve each node's ROOT ancestor and depth over a parent
    forest — the iterative-driver-loop counterpart of ``bfs_levels``
    (reference semantics: the PageRank.java:65-82 driver-controlled
    loop, applied to hierarchy resolution instead of rank flow).

    ``nodes``: (node); ``edges``: (child, parent) with at most one
    parent per child (a forest). Each pass advances every unsettled
    pointer one level via ONE equi-join (anc = child) and pulls a
    single scalar (how many pointers moved); node frames never reach
    the driver. Passes are bounded by the forest height — for the
    digit-prefix hierarchy registered below that is ≤ len(str(max_key))
    regardless of SF, so the loop is constant-depth at 100 TB while
    each pass stays a linear shuffle join. Frames persist across
    passes with the same release discipline as ``pagerank``.

    With ``require_drained`` (the default), the loop must OBSERVE a
    zero-movement pass within the budget, so resolving a height-h
    forest needs ``max_iters >= h + 1`` (the last pass confirms the
    fixed point) — a forest still moving at the cap raises rather than
    silently returning partially-resolved roots that would
    hash-mismatch the fully-resolving recursive-CTE oracle.
    """
    if max_iters < 1:
        raise ValueError("containment_walk: max_iters must be >= 1")
    edges = edges.select("child", "parent").persist(StorageLevel.MEMORY_AND_DISK)
    cur = nodes.select(
        F.col("node"),
        F.col("node").alias("anc"),
        F.lit(0).cast("long").alias("depth"),
    )
    prev_persisted = None
    for _ in range(max_iters):
        # fresh projection (new expr ids) per pass: joining the SAME
        # persisted edge Dataset repeatedly otherwise trips Spark's
        # ambiguous-self-join detection once cur's lineage contains a
        # previous pass's join with it
        ed = edges.toDF("__c", "__p")
        stepped = (
            cur.join(ed, F.col("anc") == F.col("__c"), "left")
            .select(
                F.col("node"),
                F.coalesce(F.col("__p"), F.col("anc")).alias("anc"),
                (F.col("depth") + F.col("__p").isNotNull().cast("long")).alias(
                    "depth"
                ),
                F.col("__p").isNotNull().alias("moved"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        n_moved = stepped.agg(F.count(F.when(F.col("moved"), 1)).alias("m")).first()[
            "m"
        ]
        if prev_persisted is not None:
            release(prev_persisted)
        prev_persisted = stepped
        cur = stepped.select("node", "anc", "depth")
        if not n_moved:
            break
    else:
        # mirror bfs_levels' require_drained: pointers still moving at
        # the iteration cap means a forest deeper than max_iters - 1
        # (or a cycle) — a silent return would hand back partially-
        # resolved roots that hash-mismatch the fully-resolving
        # recursive-CTE oracle with no loud signal.
        # require_drained=False keeps the bounded-orbit termination
        # guard for malformed (cyclic) edge lists where the caller
        # wants the capped frame back.
        if require_drained:
            raise RuntimeError(
                f"containment_walk: {n_moved} pointers still moving after "
                f"{max_iters} passes — forest deeper than max_iters"
            )
    return cur


@register(
    "bom_rollup_levels",
    oracle="""
        WITH RECURSIVE edges AS (
            SELECT c.p_partkey AS child, p.p_partkey AS parent
            FROM part c JOIN part p
              ON p.p_partkey = c.p_partkey // 10 AND p.p_brand = c.p_brand
            WHERE c.p_partkey >= 10
        ),
        walk AS (
            SELECT p_partkey AS node, p_partkey AS anc, 0 AS depth FROM part
            UNION ALL
            SELECT w.node, e.parent, w.depth + 1
            FROM walk w JOIN edges e ON w.anc = e.child
        ),
        tops AS (
            SELECT node, max(depth) AS depth FROM walk GROUP BY node
        ),
        resolved AS (
            SELECT w.node, w.anc AS root, w.depth
            FROM walk w JOIN tops t ON w.node = t.node AND w.depth = t.depth
        )
        SELECT r.root,
               count(*) AS n_parts,
               CAST(max(r.depth) AS BIGINT) AS max_depth,
               CAST(sum(CAST(round(p.p_retailprice * 100) AS BIGINT)) AS BIGINT)
                   AS subtree_cents
        FROM resolved r JOIN part p ON r.node = p.p_partkey
        GROUP BY r.root
    """,
    tags=("graph", "iterative", "hierarchy", "reference:PageRank.java:65-82"),
)
def q_bom_rollup_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOM-style hierarchical rollup: a part is CONTAINED BY the part
    whose key is its key ÷ 10 — but only when both share a brand (the
    data-dependent pruning that makes this a real traversal, not
    arithmetic). The driver loop resolves every part's root container
    and depth (containment_walk, one scalar pull per level), then one
    aggregate rolls subtree size / max depth / retail-price cents up
    to each root. The oracle is the same forest resolved by a
    recursive CTE — integer keys and cents, so the fixpoint must match
    exactly. Forest height ≤ digits(max partkey): the pass count grows
    with log10 of the key range, not with SF."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    child = part.select(
        F.col("p_partkey").alias("child"),
        F.expr("p_partkey div 10").alias("pk"),
        F.col("p_brand").alias("cb"),
    ).where(F.col("child") >= 10)
    edges = child.join(
        part.select(F.col("p_partkey").alias("parent"), F.col("p_brand").alias("pb")),
        (F.col("pk") == F.col("parent")) & (F.col("cb") == F.col("pb")),
    ).select("child", "parent")
    resolved = containment_walk(
        part.select(F.col("p_partkey").alias("node")), edges
    )
    return (
        resolved.join(
            part.select(
                F.col("p_partkey").alias("node"),
                F.round(F.col("p_retailprice") * 100).cast("long").alias("cents"),
            ),
            "node",
        )
        .groupBy(F.col("anc").alias("root"))
        .agg(
            F.count("*").alias("n_parts"),
            F.max("depth").alias("max_depth"),
            F.sum("cents").alias("subtree_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Connected components via large-star / small-star alternation
# ---------------------------------------------------------------------------


def _canonical_edges(pairs: DataFrame, id_a: str, id_b: str) -> DataFrame:
    """Distinct undirected edges as (u, v) with u < v, self-loops dropped."""
    return (
        pairs.select(
            F.least(F.col(id_a), F.col(id_b)).alias("u"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("v"),
        )
        .where(F.col("u") < F.col("v"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star pass: every node u connects its LARGER neighbors
    to m = min(N(u) ∪ {u}). Emitted edges are canonical by
    construction (m ≤ u < v). Deliberately NO distinct here: duplicate
    edges cannot change the small-star pass that always consumes this
    output (its mins are duplicate-insensitive and its own final
    distinct dedups the emission), so the extra exchange per pass
    would buy nothing.

    The per-node min rides a count-window over the symmetric frame —
    ONE exchange per pass annotates every row, exactly the PageRank
    degree-annotation trade (graph.py pagerank): the former
    groupBy+join shape paid a second |V|-row exchange (or an AQE
    broadcast build) per pass, and LSS runs O(log² n) passes.
    WindowExec buffers one u-group at a time in a spill-backed array,
    so a power-law hot node costs disk, never memory."""
    sym = e.select("u", "v").union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    w = Window.partitionBy("u")
    return (
        sym.withColumn("m", F.least(F.min("v").over(w), F.col("u")))
        .where(F.col("v") > F.col("u"))
        .select(F.col("m").alias("u"), F.col("v"))
        .where(F.col("u") < F.col("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star pass: every node u connects its SMALLER neighbors
    and itself to m = min of those neighbors. Same single-exchange
    window shape as ``_large_star``; the self-link recovers the
    one-row-per-u emission of the former groupBy+join form as the
    rows WHERE v = m (duplicates collapse in the final distinct the
    pass already pays)."""
    sym = e.select("u", "v").union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    smaller = sym.where(F.col("v") < F.col("u"))
    w = Window.partitionBy("u")
    sm = smaller.withColumn("m", F.min("v").over(w))
    rewired = sm.where(F.col("v") != F.col("m")).select(
        F.col("m").alias("u"), F.col("v")
    )
    self_link = sm.where(F.col("v") == F.col("m")).select(
        F.col("m").alias("u"), F.col("u").alias("v")
    )
    return (
        rewired.union(self_link)
        .where(F.col("u") < F.col("v"))
        .distinct()
    )


def _edge_sets_equal(a: DataFrame, b: DataFrame) -> bool:
    # one action, not two: at the fixed point (the only caller's hot
    # path) BOTH excepts are empty, so the former short-circuit `and`
    # always ran both jobs anyway — the union halves the driver round
    # trips of every convergence check
    return a.exceptAll(b).union(b.exceptAll(a)).isEmpty()


def connected_components_lss(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 30,
) -> DataFrame:
    """Connected components by large-star/small-star alternation — the
    100 TB-canonical CC (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14): each pair-pass is two grouped
    mins + two joins (NO per-node neighbor lists materialize, unlike
    collect_list adjacency), converging in O(log² n) passes on any
    topology — including long chains, where plain min-label
    propagation needs diameter passes. Sits beside
    ``dedup.connected_components`` (driver union-find / label
    propagation) as the scale path; a cross-implementation test pins
    the two equal on the LSH pair graph.

    Termination is exact, not heuristic: a cheap (count, Σu, Σv)
    signature prefilters, and the loop only stops when a full
    large+small pass provably leaves the edge set unchanged (the
    paper's fixed point — components collapsed to stars rooted at
    their min id). Per-pass frames are localCheckpoint()ed and
    released, the repo's standard iterative-loop discipline (constant
    plan depth, bounded executor memory). Returns (node, lbl) like
    ``connected_components``."""
    e = _canonical_edges(pairs, id_a, id_b).localCheckpoint()
    prev_sig = None
    converged = False
    for _ in range(max_iters):
        # lazy checkpoint: the signature aggregate right below is the
        # pass's first action and materializes it — one fewer job per
        # pass than eager + agg (the pagerank tol-loop measurement)
        new = _small_star(_large_star(e)).localCheckpoint(eager=False)
        # double sums: node ids are BIGINT and Σ id over a 1e9+-edge
        # set overflows int64 (ANSI aborts); the signature is only a
        # PREFILTER — exactness comes from _edge_sets_equal below, so
        # lossy doubles cost nothing but a rare extra exact check
        sig = tuple(
            new.agg(
                F.count("*"),
                F.sum(F.col("u").cast("double")),
                F.sum(F.col("v").cast("double")),
            ).first()
        )
        if sig == prev_sig and _edge_sets_equal(new, e):
            release(new)
            converged = True
            break
        release(e)
        e = new
        prev_sig = sig
    if not converged:
        release(e)
        raise RuntimeError(
            f"connected_components_lss: no fixed point after {max_iters} "
            "large/small-star pass pairs; raise max_iters"
        )
    leaves = e.select(F.col("v").alias("node"), F.col("u").alias("lbl"))
    roots = e.select(F.col("u").alias("node"), F.col("u").alias("lbl")).distinct()
    out = leaves.union(roots).distinct()
    return out


@register(
    "connected_components_lss",
    oracle="""
        WITH RECURSIVE chain AS (
            SELECT p_partkey,
                   lag(p_partkey) OVER (
                       PARTITION BY p_brand, p_size ORDER BY p_partkey
                   ) AS prev
            FROM part
        ),
        pairs AS (
            SELECT prev AS id_a, p_partkey AS id_b FROM chain
            WHERE prev IS NOT NULL
        ),
        edges AS (
            SELECT id_a AS u, id_b AS v FROM pairs
            UNION SELECT id_b, id_a FROM pairs
        ),
        reach(node, lbl) AS (
            SELECT u, u FROM edges
            UNION
            SELECT e.u, r.lbl FROM edges e JOIN reach r ON e.v = r.node
        ),
        comp AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node)
        SELECT cluster_id, count(*) AS n_nodes FROM comp GROUP BY cluster_id
    """,
    tags=("graph", "connected-components", "large-star-small-star", "extension"),
)
def q_connected_components_lss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over a CHAIN-topology edge list (each
    (brand, size) group's parts linked consecutively) computed with
    large-star/small-star — the adversarial case for per-pass label
    propagation (a k-member chain needs k passes there; LSS collapses
    it in O(log k) pair-passes). The components are provably the same
    multi-part groups as ``connected_components_edges`` derives from
    its star edges, but the recursive-CTE oracle walks the chain — so
    the oracle checks the ALGORITHM on depth, not just the grouping."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    prev = F.lag("p_partkey").over(
        Window.partitionBy("p_brand", "p_size").orderBy("p_partkey")
    )
    pairs = (
        part.select("p_partkey", prev.alias("prev"))
        .where(F.col("prev").isNotNull())
        .select(F.col("prev").alias("id_a"), F.col("p_partkey").alias("id_b"))
    )
    labels = connected_components_lss(pairs)
    return labels.groupBy(F.col("lbl").alias("cluster_id")).agg(
        F.count("*").alias("n_nodes")
    )
