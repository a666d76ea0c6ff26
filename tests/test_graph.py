"""PageRank (operators/graph.py): hand-checkable goldens, dangling
redistribution, edge multiplicity, partitioning determinism, and the
conservation invariant.

Reference parity note: graph analytics are LLM-data-pipeline addendum
surface (entity importance / link authority); the dedup family's
connected components (operators/curation.py) is the sibling
operator."""

from __future__ import annotations

from data_migration_etl_scripts_spark.operators.graph import pagerank


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r.node: r.rank for r in pagerank(df, **kw).collect()}


def test_symmetric_cycle_is_uniform(spark):
    # a 3-cycle is perfectly symmetric: every node keeps rank 1/3
    got = _ranks(spark, [("a", "b"), ("b", "c"), ("c", "a")], iterations=10)
    assert all(abs(v - 1 / 3) < 1e-6 for v in got.values()), got


def test_star_concentrates_rank(spark):
    # everyone points at hub; hub passes everything back to s1 — the
    # hub and its sole beneficiary both dominate the other spokes
    edges = [("s1", "hub"), ("s2", "hub"), ("s3", "hub"), ("hub", "s1")]
    got = _ranks(spark, edges, iterations=10)
    assert got["hub"] > 2 * got["s2"]
    assert got["s1"] > 2 * got["s2"]
    assert abs(got["s2"] - got["s3"]) < 1e-9  # symmetric spokes


def test_dangling_mass_redistributes(spark):
    # b has no out-edges: its rank must recycle, ranks still sum ~1
    got = _ranks(spark, [("a", "b"), ("c", "b")], iterations=8)
    assert abs(sum(got.values()) - 1.0) < 1e-6
    assert got["b"] > got["a"]
    assert abs(got["a"] - got["c"]) < 1e-9


def test_parallel_edges_carry_multiplicity(spark):
    # a splits 3 ways: two edges to b, one to c -> b draws 2x c's inflow
    single = _ranks(spark, [("a", "b"), ("a", "c")], iterations=1)
    double = _ranks(spark, [("a", "b"), ("a", "b"), ("a", "c")],
                    iterations=1)
    assert abs(single["b"] - single["c"]) < 1e-9
    assert double["b"] > double["c"]


def test_rank_conservation(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c")]
    got = _ranks(spark, edges, iterations=6)
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_deterministic_across_partitioning(spark):
    edges = [(f"n{i}", f"n{(i * 7 + 3) % 23}") for i in range(60)]
    df1 = spark.createDataFrame(edges, "src string, dst string").repartition(1)
    df9 = spark.createDataFrame(edges, "src string, dst string").repartition(9)
    r1 = {r.node: r.rank for r in pagerank(df1, iterations=4).collect()}
    r9 = {r.node: r.rank for r in pagerank(df9, iterations=4).collect()}
    assert r1 == r9


def test_early_exit_on_exact_fixpoint(spark, monkeypatch):
    """r8: a symmetric 2-cycle hits its 9-dp fixpoint (0.5, 0.5) after
    round 1 — the L1-delta check must stop the loop there, and the
    early-exited result must equal the full K-round run bit-exactly
    (the losslessness argument: delta == 0 means every further round
    is a no-op)."""
    from data_migration_etl_scripts_spark.operators import graph as g

    calls = []
    orig = g.planhook.capture
    monkeypatch.setattr(
        g.planhook, "capture",
        lambda name, df: (calls.append(name), orig(name, df))[-1],
    )
    df = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    got = {r.node: r.rank for r in pagerank(df, iterations=5).collect()}
    assert got == {"a": 0.5, "b": 0.5}
    # exits after round 2 at the latest (round 1 moves nothing here,
    # the delta check needs one round to observe it)
    assert len([c for c in calls if c == "pagerank_iteration"]) <= 2

    calls.clear()
    full = {r.node: r.rank
            for r in pagerank(df, iterations=5, tol=None).collect()}
    assert len([c for c in calls if c == "pagerank_iteration"]) == 5
    assert full == got


def test_early_exit_never_fires_mid_convergence(spark, monkeypatch):
    """On a graph still moving at round 5, the delta check must NOT
    change the result or the round count (the entity_pagerank hash
    contract)."""
    from data_migration_etl_scripts_spark.operators import graph as g

    calls = []
    orig = g.planhook.capture
    monkeypatch.setattr(
        g.planhook, "capture",
        lambda name, df: (calls.append(name), orig(name, df))[-1],
    )
    edges = [(f"n{i}", f"n{(i * 7 + 3) % 23}") for i in range(60)]
    df = spark.createDataFrame(edges, "src string, dst string")
    with_tol = {r.node: r.rank for r in pagerank(df, iterations=4).collect()}
    assert len([c for c in calls if c == "pagerank_iteration"]) == 4
    without = {r.node: r.rank
               for r in pagerank(df, iterations=4, tol=None).collect()}
    assert with_tol == without


def test_iteration_reuses_edge_partitioning(spark):
    """BIG-GRAPH path (broadcast_nodes_max=0 forces it): the
    per-iteration contribution join must read the persisted edge
    relation IN PLACE: the cached (repartition+sort by src) plan
    preserves outputPartitioning/ordering, so the join's edge side is
    an InMemoryTableScan with NO exchange or sort above it — a
    checkpointed edge scan reported UnknownPartitioning and
    re-shuffled the FULL edge set every round (r11 fix; the piece
    that breaks at 100x edges)."""
    from data_migration_etl_scripts_spark import planhook

    edges = [(f"n{i}", f"n{(i * 7 + 3) % 23}") for i in range(60)]
    df = spark.createDataFrame(edges, "src string, dst string")
    planhook.enable()
    try:
        pagerank(df, iterations=2, tol=None,
                 broadcast_nodes_max=0).collect()
        plan = planhook._CAPTURES["pagerank_iteration"]
    finally:
        planhook.disable()
    tree = plan.split("(1) ")[0]
    lines = [ln for ln in tree.splitlines() if ln.strip()]
    scans = [i for i, ln in enumerate(lines)
             if "InMemoryTableScan" in ln]
    assert scans, tree
    # between the cached edge scan and its join there must be no
    # shuffle Exchange and no Sort re-doing the persisted layout
    # (a Filter/Project or — at toy scale, where AQE broadcasts the
    # edge side — a BroadcastExchange is fine)
    for ln in lines[max(0, scans[0] - 4): scans[0]]:
        stripped = ln.replace("BroadcastExchange", "")
        assert "Exchange (" not in stripped, tree
        assert "Sort (" not in ln, tree


def test_small_path_never_shuffles_edges(spark):
    """SMALL-GRAPH path (r12): the rank relation broadcasts into the
    contribution join, so the captured per-iteration plan must
    contain NO sort-merge join, no Sort, and no exchange other than
    broadcast exchanges and the single contribution aggregation
    exchange — the edge checkpoint is scanned in place."""
    import re

    from data_migration_etl_scripts_spark import planhook

    edges = [(f"n{i}", f"n{(i * 7 + 3) % 23}") for i in range(60)]
    df = spark.createDataFrame(edges, "src string, dst string")
    planhook.enable()
    try:
        pagerank(df, iterations=2, tol=None).collect()
        plan = planhook._CAPTURES["pagerank_iteration"]
    finally:
        planhook.disable()
    tree = plan.split("(1) ")[0]
    assert "SortMergeJoin" not in tree, tree
    assert "Sort (" not in tree, tree
    non_bcast = [
        ln for ln in tree.splitlines()
        if re.search(r"\bExchange \(", ln) and "Broadcast" not in ln
    ]
    assert len(non_bcast) <= 1, tree


def test_paths_agree_bit_exactly(spark):
    """The broadcast-ranks plan and the partitioned-edge plan must
    produce IDENTICAL doubles (the per-edge quantized contributions
    and exact DECIMAL sums are plan-independent) — the contract that
    lets the threshold be a pure performance knob."""
    edges = [(f"n{i}", f"n{(i * 11 + 5) % 37}") for i in range(80)]
    edges += [("dangling_src", "n0"), ("n1", "sink")]
    df = spark.createDataFrame(edges, "src string, dst string")
    small = {r.node: r.rank for r in pagerank(df, iterations=4).collect()}
    big = {r.node: r.rank
           for r in pagerank(df, iterations=4,
                             broadcast_nodes_max=0).collect()}
    assert small == big


def test_numpy_and_join_loop_paths_agree(spark, monkeypatch):
    """r12 second stage: the fully-driver numpy fixpoint (pair-
    aggregated edges, exact int64 numerators) must equal the per-round
    broadcast-join loop bit for bit — forced apart via the pair cap."""
    edges = [(f"n{i}", f"n{(i * 11 + 5) % 37}") for i in range(80)]
    edges += [("dangling_src", "n0"), ("n1", "sink"),
              ("n1", "n2"), ("n1", "n2"), ("n1", "n2")]  # multiplicity
    df = spark.createDataFrame(edges, "src string, dst string")
    vec = {r.node: r.rank for r in pagerank(df, iterations=4).collect()}
    monkeypatch.setenv("SPARK_GRAFT_PAGERANK_DRIVER_EDGES", "0")
    loop = {r.node: r.rank for r in pagerank(df, iterations=4).collect()}
    assert vec == loop


def test_initial_dangling_mass_matches_spark_aggregate(spark):
    """_initial_dangling_mass must reproduce the engines' DECIMAL
    aggregate bit for bit for assorted (n, n_dang)."""
    from pyspark.sql import functions as F

    from data_migration_etl_scripts_spark.operators.graph import (
        _initial_dangling_mass,
        _q9,
    )

    for n, n_dang in [(1, 1), (3, 2), (7, 7), (23, 5), (16500, 999),
                      (1000000, 123456), (999983, 1)]:
        expected = (
            spark.range(n_dang)
            .select(_q9(F.lit(1.0) / F.lit(float(n))).alias("rank"))
            .agg(
                F.coalesce(
                    F.sum(F.col("rank").cast("decimal(20,10)"))
                    .cast("double"),
                    F.lit(0.0),
                )
            )
            .collect()[0][0]
        )
        got = _initial_dangling_mass(n, n_dang)
        assert got == expected, (n, n_dang, got, expected)


def test_null_endpoints_fall_back_and_agree(spark):
    """ADVICE r12 (low): a null endpoint must not be indexed as an
    ordinary node by the driver-resident paths (the Spark equi-joins
    never match null keys) — both collapse to the distributed plan,
    so the default path must equal the forced-distributed answer."""
    edges = [("a", "b"), (None, "b"), ("b", None), ("b", "c"),
             ("c", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.rank for r in pagerank(df, iterations=3).collect()}
    big = {r.node: r.rank
           for r in pagerank(df, iterations=3,
                             broadcast_nodes_max=0).collect()}
    assert got == big
