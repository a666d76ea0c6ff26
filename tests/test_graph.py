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
