"""PageRank + adjacency: unit semantics and oracle parity."""

import pytest

from pyspark.sql import functions as F

from velox_hadoop_spark.operators.graph import adjacency, pagerank
from tests.conftest import assert_parity


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_adjacency_builds_sorted_outlinks(spark):
    adj = adjacency(_edges(spark, [(1, 3), (1, 2), (2, 3)]))
    got = {r.src: (list(r.outlinks), r.rank) for r in adj.collect()}
    assert got == {1: ([2, 3], 1.0), 2: ([3], 1.0)}


def test_pagerank_star_graph(spark):
    # 1,2,3 all point at 4; 4 points at 1. Hand-computed 1 iteration:
    # r(4) = 0.15 + 0.85*(1+1+1) = 2.7 ; r(1) = 0.15+0.85*1 = 1.0
    # r(2) = r(3) = 0.15 (no inlinks)
    ranks = pagerank(
        _edges(spark, [(1, 4), (2, 4), (3, 4), (4, 1)]), max_iters=1
    )
    got = {r.node: round(r.rank, 6) for r in ranks.collect()}
    assert got == {1: 1.0, 2: 0.15, 3: 0.15, 4: 2.7}


def test_pagerank_convergence_stops_early(spark):
    # cycle 1->2->1: already at fixed point (rank 1.0 each); delta after
    # one pass is 0 -> loop must exit on the first tolerance check
    ranks = pagerank(_edges(spark, [(1, 2), (2, 1)]), max_iters=50, tol=1e-6)
    got = {r.node: round(r.rank, 6) for r in ranks.collect()}
    assert got == {1: 1.0, 2: 1.0}


def test_dangling_nodes_get_base_rank(spark):
    # node 9 has no outlinks (pure sink) and must still appear
    ranks = pagerank(_edges(spark, [(1, 9)]), max_iters=2)
    got = {r.node for r in ranks.collect()}
    assert got == {1, 9}


@pytest.mark.parametrize(
    "name", ["adjacency_list", "pagerank_3iter", "pagerank_converged"]
)
def test_oracle_parity(spark, duck, name):
    assert_parity(spark, duck, name)


def test_pagerank_converged_emits_pass_count(spark):
    from velox_hadoop_spark.plans import registry

    df = registry.specs()["pagerank_converged"].fn(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["node", "iters", "rank"]
    assert {r.iters for r in rows} == {5}


def test_pagerank_converged_scale_pin_sf001(spark):
    """The pagerank_converged oracle is SCALE-PINNED: its unrolled SQL
    hard-codes _CONVERGED_ITERS_SF001 passes, which is a property of
    the sf0.001/sf0.01 graphs, not of the algorithm. This asserts the
    pin at sf0.01 — the driver's verification scale — so a testdata
    regen that shifts the convergence pass fails HERE, locally, instead
    of at the driver's hash gate."""
    from velox_hadoop_spark.operators.graph import _CONVERGED_ITERS_SF001
    from velox_hadoop_spark.plans import registry

    df = registry.specs()["pagerank_converged"].fn(spark, "/root/testdata/sf0.01")
    iters = {r.iters for r in df.select("iters").distinct().collect()}
    assert iters == {_CONVERGED_ITERS_SF001}, (
        f"sf0.01 graph now converges at pass {iters}, but the unrolled "
        f"oracle is pinned at {_CONVERGED_ITERS_SF001} — update "
        f"_CONVERGED_ITERS_SF001 and the oracle comment in operators/graph.py"
    )


@pytest.mark.parametrize(
    "name", ["bfs_levels_from_min_supplier", "supplier_triangle_counts"]
)
def test_graph_extras_parity(spark, duck, name):
    assert_parity(spark, duck, name)


def test_bfs_levels_on_path_graph(spark):
    from velox_hadoop_spark.operators.graph import bfs_levels

    # path 1-2-3-4 plus unreachable 10-11
    edges = _edges(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    got = {r.node: r.lvl for r in bfs_levels(edges, start=1).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}


def test_release_frees_local_checkpoint_rdd(spark):
    """DataFrame.unpersist() is a NO-OP on a localCheckpoint's internal
    RDD; functions/lineage.release must actually free it (this is what
    bounds iterative-loop memory at O(1) snapshots instead of O(L))."""
    from tests.test_mining import _persistent_rdd_ids
    from velox_hadoop_spark.functions.lineage import release

    before = _persistent_rdd_ids(spark)
    df = spark.range(100).localCheckpoint(eager=True)
    assert len(_persistent_rdd_ids(spark) - before) == 1
    df.unpersist()  # documented no-op on the checkpoint RDD
    assert len(_persistent_rdd_ids(spark) - before) == 1
    release(df)
    assert len(_persistent_rdd_ids(spark) - before) == 0


def test_bfs_releases_superseded_visited_snapshots(spark):
    """After a BFS run, exactly one new persistent RDD may remain (the
    returned visited frame's final checkpoint) — superseded per-level
    visited checkpoints and frontier persists must all be released."""
    from tests.test_mining import _persistent_rdd_ids
    from velox_hadoop_spark.operators.graph import bfs_levels

    edges = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)])
    before = _persistent_rdd_ids(spark)
    got = bfs_levels(edges, start=1).collect()
    assert len(got) == 6
    assert len(_persistent_rdd_ids(spark) - before) <= 1
    spark.catalog.clearCache()


def test_pagerank_tol_result_is_checkpoint_backed(spark):
    """tol mode must hand back a frame rooted at the final pair's
    localCheckpoint, not at the accumulated join lineage: constant-depth
    plans are what keeps per-action Catalyst/AQE re-analysis flat across
    passes (measured superlinear growth otherwise — see the loop
    comment in operators/graph.py)."""
    ranks = pagerank(
        _edges(spark, [(1, 2), (2, 3), (3, 1), (1, 3)]), max_iters=6, tol=1e-9
    )
    plan = ranks._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan or "ExistingRDD" in plan
    assert "Join" not in plan
    spark.catalog.clearCache()


def test_pagerank_tol_releases_superseded_pair_checkpoints(spark):
    """After a tol-mode run, the only persistent entries allowed to
    remain are the edge frame, the node frame, and the FINAL pair
    checkpoint — every superseded pair's checkpoint RDD must have been
    released, or a long convergence run accumulates O(passes) full rank
    snapshots in executor memory."""
    from tests.test_mining import _persistent_rdd_ids

    before = _persistent_rdd_ids(spark)
    # asymmetric graph (not at its fixed point) with a tolerance tight
    # enough that the loop runs to the max_iters cap: 5 pairs, 4 of
    # whose checkpoints are superseded and must be freed
    asym = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (4, 1)]
    ranks = pagerank(_edges(spark, asym), max_iters=10, tol=1e-12)
    ranks.collect()
    assert len(_persistent_rdd_ids(spark) - before) <= 3
    spark.catalog.clearCache()


def test_bfs_drained_probe_accepts_exact_cap(spark):
    """max_levels exactly equal to the graph's eccentricity: the result
    is complete, so require_drained must NOT raise — the final-level
    probe (one extra neighbor join, no 13th loop pass) distinguishes
    'last frontier landed on the cap' from 'levels exist beyond it'."""
    import pytest

    from velox_hadoop_spark.operators.graph import bfs_levels

    edges = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    got = {
        r.node: r.lvl
        for r in bfs_levels(edges, start=1, max_levels=3, require_drained=True).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}
    # one level short of the eccentricity must still fail loudly
    with pytest.raises(RuntimeError, match="not drained"):
        bfs_levels(edges, start=1, max_levels=2, require_drained=True).collect()


def test_triangle_adjacency_cap_slice_equals_global_topk(spark, tmp_path):
    """The triangle census caps each node at its TRIANGLE_ADJ_CAP
    smallest higher-id neighbors by slicing each PART's sorted
    contribution to the cap BEFORE the shuffle (operators/graph.py).
    That per-part slice is lossless for the global top-k — if s2 is in
    s1's global k-smallest, fewer than k neighbors precede it in any
    shared part — but only a corpus with parts ABOVE the cap exercises
    the argument; sf0.01/sf0.1 never slice. This corpus does: one
    150-supplier part (slice drops 85 of supplier 0's neighbors), a
    high-id part whose contribution is entirely cut by lower-id
    neighbors elsewhere, and a low-id part that reorders the global
    top-64. The DuckDB oracle computes the cap with the brute-force
    row_number window over ALL distinct pairs, so parity here IS the
    equivalence proof, engine-run."""
    from tests.test_round7_parity import TABLE_SCHEMAS, _compare

    rows = []

    def part_rows(pk, supps):
        for i, s in enumerate(supps):
            rows.append(
                (
                    pk * 10_000 + i,  # l_orderkey (unused)
                    pk,
                    s,
                    1,
                    1.0,
                    1.0,
                    0.0,
                    0.0,
                    "N",
                    "O",
                    None,
                )
            )

    part_rows(1, list(range(0, 150)))  # giant part: slice active for low ids
    part_rows(2, [0, 1] + list(range(200, 260)))  # high ids cut by part 1's 64
    part_rows(3, [0, 40, 41, 42, 300])  # small part, mixed contribution
    part_rows(4, list(range(140, 155)))  # overlaps part 1's sliced-out tail
    df = spark.createDataFrame(rows, TABLE_SCHEMAS["lineitem"])
    df.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    _compare(spark, str(tmp_path), "supplier_triangle_counts")
