"""stage_cache: the documented session-scoped build-once surface —
key isolation across source tokens, dead-session eviction, and the
shared seeded-PQ-index consumers agreeing with the unshared path."""

from __future__ import annotations

from data_migration_etl_scripts_spark import stage_cache as sc


def test_memo_stage_cross_token_isolation(spark):
    """Two source tokens (e.g. two sf_dirs) must never share an entry
    (invalidation contract #2)."""
    calls = []

    def builder_for(token, n):
        def build():
            calls.append(token)
            return spark.range(n).selectExpr("id", f"'{token}' AS src")
        return build

    a1 = sc.memo_stage(spark, ("t", "dirA", 3), builder_for("dirA", 3))
    b1 = sc.memo_stage(spark, ("t", "dirB", 5), builder_for("dirB", 5))
    a2 = sc.memo_stage(spark, ("t", "dirA", 3), builder_for("dirA", 3))
    assert calls == ["dirA", "dirB"]  # second dirA call was a hit
    assert a1 is a2
    assert a2.count() == 3 and b1.count() == 5
    assert {r.src for r in a2.collect()} == {"dirA"}


def test_memo_evicts_dead_session_entries(spark):
    """Entries keyed by a dead applicationId are dropped on access
    (ADVICE r5: no unbounded growth in multi-session processes)."""
    app = spark.sparkContext.applicationId
    sc._VALUES[("dead-app-id-1", "x")] = "stale"
    sc._VALUES[("dead-app-id-2", "__stage__", "y")] = "stale"
    sc._EXPRS[("dead-app-id-3", "1 + 1")] = object()
    got = sc.memo(spark, ("live",), lambda: 42)
    assert got == 42
    assert all(k[0] == app for k in sc._VALUES)
    _ = sc.cached_expr(spark, "2 + 2")
    assert all(k[0] == app for k in sc._EXPRS)
    # live entries survived the eviction pass
    assert sc.memo(spark, ("live",), lambda: -1) == 42


def test_cached_expr_parses_once_and_is_reusable(spark):
    sql = "aggregate(array(1.0d, 2.0d, 3.0d), 0.0d, (a, x) -> a + x)"
    c1 = sc.cached_expr(spark, sql)
    c2 = sc.cached_expr(spark, sql)
    assert c1 is c2
    row = spark.range(1).select(c1.alias("s")).first()
    assert row.s == 6.0


def test_seeded_pq_index_shared_equals_unshared(spark):
    """The session-shared PQ index must produce byte-identical
    reconstruction output to the uncached path."""
    from data_migration_etl_scripts_spark.operators import embed as em
    from pyspark.sql import functions as F

    df = spark.range(40).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 8), i -> CAST(pmod(id * 31 + i * 17, 19) - 9 AS DOUBLE))"
        ).alias("embedding"),
    ).localCheckpoint()
    books_u = em.pq_seed_codebooks(df, m_sub=4, n_codes=4)
    plain = em.pq_reconstruction_error(df, books_u).collect()
    books_s, codes = em.seeded_pq_index(df, m_sub=4, n_codes=4, cache="tok1")
    shared = em.pq_reconstruction_error(df, books_s, codes=codes).collect()
    assert books_u == books_s
    assert sorted(map(tuple, plain)) == sorted(map(tuple, shared))
    # and the memo actually hit on re-request
    books_s2, codes2 = em.seeded_pq_index(df, m_sub=4, n_codes=4, cache="tok1")
    assert codes2 is codes and books_s2 is books_s
