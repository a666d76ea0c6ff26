"""Iterative graph analytics — PageRank with the engine's
deterministic-iteration discipline, extending the graph family beyond
the connected-components labeler in `operators/curation.py` (dedup
clusters) to importance scoring: entity ranking over relationship
graphs (who are the load-bearing suppliers/customers), link-graph
authority for web corpora (the `operators/html.py` front end yields
anchors), influence weighting for sampling.

Standard damped PageRank with dangling-mass redistribution:

    PR_{i+1}(v) = (1-d)/N + d * (sum_{u->v} PR_i(u)/out(u)
                                 + dangling_i/N)

DETERMINISM: per-edge contributions round to 9 dp and sum as
DECIMAL(20,10); each iteration's rank re-rounds — so K iterations
are bit-reproducible across partitionings and across engines, and
the SQL twin (:func:`pagerank_sql`) unrolls the same K rounds as
chained CTEs for a hash-matched oracle. (The same unrolled-iteration
oracle pattern as the trained classifier's gradient descent.)

Scale shape (r11): the edge relation is shuffled and sorted by src
ONCE and persisted — every iteration's contribution join reads it in
place (InMemoryRelation preserves partitioning/ordering where a
checkpoint scan reports UnknownPartitioning and would re-exchange the
full edge set per round). Per iteration only node-sized data moves:
the rank relation to the join key and the map-side-combined
contributions to dst. The dangling mass and the convergence delta
ride each round's checkpoint action as observed metrics — ONE job
per iteration, nothing collected but those two scalars; ranks
localCheckpoint per round so lineage stays flat at K iterations —
the Lloyd's/label-propagation discipline every iterative operator
here follows."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_migration_etl_scripts_spark import planhook

_DEC = "decimal(20,10)"


def _q9(col: F.Column) -> F.Column:
    """Quantize to 9 dp via floor(x*1e9 + 0.5)/1e9 — every step an
    exactly-rounded IEEE op, so BOTH engines compute the identical
    double. round(x, 9) is NOT cross-engine safe here: iterated
    PageRank keeps landing decimal-aligned ranks on exact .5
    boundaries at the 10th digit, where Spark (HALF_UP on the
    shortest decimal repr) and DuckDB (half-away on the binary
    value) disagree."""
    return F.floor(col * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)


def _q9_sql(expr: str) -> str:
    return f"floor(({expr}) * 1e9 + 0.5) / 1e9"


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    tol: float | None = 0.0,
) -> DataFrame:
    """(src, dst) edges -> (node, rank) after ``iterations`` rounds.
    Nodes = union of both endpoint sets; parallel edges count with
    multiplicity (a supplier filling 3 of a customer's orders pulls
    3 shares of that customer's rank). Ranks sum to ~1 (9-dp
    quantization wobble only).

    Convergence early-exit (r8): each round's projection carries the
    previous rank alongside the new one, and the L1 delta rides the
    round's OWN checkpoint action as an ``observe()`` metric (the
    gates.py observe-fused pattern) — zero extra jobs, zero extra
    shuffles. The loop stops when delta <= ``tol``. The default
    ``tol=0.0`` is PROVABLY lossless against the fixed-K oracle:
    ranks are 9-dp quantized, so delta == 0 means the vector is a
    bit-exact fixpoint and every remaining iteration would reproduce
    it unchanged — converged graphs pay only the rounds they need
    while the K-round hash contract holds. ``tol=None`` disables the
    check; a positive tol is an approximation knob whose output may
    diverge from the unrolled oracle."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out"))
    # STATIC structure, computed once: edges carry their source's
    # out-degree, and the dangling-node SET (no out-edges) never
    # changes across iterations — only its rank mass does. This keeps
    # each iteration to ONE action (the checkpoint) instead of a
    # dangling-collect job + an update job, and drops the per-round
    # ranks->out_deg join.
    #
    # PERSIST, not localCheckpoint (r11): a checkpointed RDD scan
    # reports UnknownPartitioning, so every iteration re-exchanged
    # AND re-sorted the FULL edge relation for the contrib join — the
    # dominant per-round cost, and the piece that breaks at 100x
    # edges. An InMemoryRelation preserves the child plan's
    # outputPartitioning/ordering, so shuffling+sorting by src ONCE
    # here lets all K per-round sort-merge joins reuse it: only the
    # (|nodes|-sized) rank relation moves per iteration.
    from pyspark.storagelevel import StorageLevel

    e_out = (
        e.join(out_deg, "src")
        .select("src", "dst", "out")
        .repartition("src")
        .sortWithinPartitions("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    e_out.count()   # eager, like the checkpoints around it
    # the dangling SET is static: fold it into the rank relation as a
    # boolean ONCE (r7) — each iteration's dangling-mass aggregate is
    # then a FILTER over the checkpointed ranks instead of a per-round
    # ranks-vs-dangling semi-join (one less shuffle join per
    # iteration; local wall is checkpoint-overhead-bound so the gain
    # shows in the plan, not the sf0.1 number)
    flagged = nodes.join(
        out_deg.select(F.col("src").alias("node"), F.lit(False).alias("dang")),
        "node",
        "left",
    ).select(
        "node", F.coalesce("dang", F.lit(True)).alias("dang")
    ).localCheckpoint(eager=True)
    # IEEE division itself is exactly rounded in both engines, so the
    # (1-d)/N and dangling/N terms need no defensive quantization.
    ranks = flagged.withColumn("rank", _q9(F.lit(1.0) / F.lit(float(n))))
    # Each round's dangling mass is an aggregate over the PREVIOUS
    # round's output — so it rides the previous round's checkpoint
    # action as a second observed metric and feeds the next update as
    # a plain literal (bit-identical: the same DECIMAL sum, the same
    # double division). Only the INITIAL mass needs its own (tiny)
    # aggregate job. This halves the per-iteration job count versus
    # the old per-round broadcast-subquery aggregate (r11; the bench
    # line's spread was dominated by scheduler overhead, not math).
    from pyspark.sql import Observation

    dangm = ranks.where("dang").agg(
        F.coalesce(
            F.sum(F.col("rank").cast(_DEC)).cast("double"), F.lit(0.0)
        )
    ).collect()[0][0]
    for it in range(iterations):
        contrib = (
            e_out.join(ranks, e_out["src"] == ranks["node"])
            .select(
                "dst",
                _q9(F.col("rank") / F.col("out")).cast(_DEC).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").cast("double").alias("inflow"))
        )
        # the previous round's relation (every node) is ALSO the left
        # side of the update join, so the new projection can carry the
        # old rank; the convergence delta AND the next round's
        # dangling mass both ride the checkpoint action as observed
        # metrics — one job per iteration, no separate aggregates
        new = (
            ranks.join(contrib, ranks["node"] == contrib["dst"], "left")
            .select(
                ranks["node"].alias("node"),
                ranks["dang"].alias("dang"),
                _q9(
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce("inflow", F.lit(0.0))
                       + F.lit(dangm) / F.lit(float(n)))
                ).alias("rank"),
                ranks["rank"].alias("_prev"),
            )
        )
        obs = None
        last = it == iterations - 1
        if not last:
            obs = Observation(f"pagerank_obs_{it}_{id(new)}")
            metrics = [
                F.coalesce(
                    F.sum(F.when(F.col("dang"), F.col("rank"))
                          .cast(_DEC)).cast("double"),
                    F.lit(0.0),
                ).alias("dangm")
            ]
            if tol is not None:
                metrics.append(
                    F.coalesce(
                        F.sum(F.abs(F.col("rank") - F.col("_prev"))
                              .cast(_DEC)).cast("double"),
                        F.lit(0.0),
                    ).alias("d")
                )
            new = new.observe(obs, *metrics)
        new = new.select("node", "dang", "rank")
        planhook.capture("pagerank_iteration", new)
        ranks = new.localCheckpoint(eager=True)
        if obs is not None:
            m = obs.get
            if tol is not None and m["d"] <= tol:
                break
            dangm = m["dangm"]
    # ranks is checkpointed (no lineage into e_out): safe to release
    e_out.unpersist()
    return ranks.select("node", "rank")


def pagerank_sql(
    edges_sql: str,
    iterations: int = 5,
    damping: float = 0.85,
) -> str:
    """DuckDB twin of :func:`pagerank`: the K iterations unroll as
    chained CTEs with the identical 9-dp + DECIMAL discipline.
    ``edges_sql`` must expose (src, dst).

    Literal discipline: damping constants are precomputed in Python
    and emitted in e-notation — DuckDB parses bare decimals as exact
    DECIMALs (1.0 - 0.85 = 0.15 exactly), which diverges from the
    IEEE double 0.15000000000000002 the Spark side computes; an
    e-notation literal forces DOUBLE parsing."""
    dd = f"{damping:.17e}"
    one_minus_d = f"{1.0 - damping:.17e}"
    ctes = [
        f"e AS ({edges_sql})",
        "nodes AS (SELECT src AS node FROM e UNION "
        "SELECT dst AS node FROM e)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        "outd AS (SELECT src, count(*) AS \"out\" FROM e GROUP BY src)",
        f"pr0 AS (SELECT node, "
        f"{_q9_sql('CAST(1.0 AS DOUBLE) / (SELECT n FROM nn)')} "
        "AS rank FROM nodes)",
    ]
    for i in range(iterations):
        prev, cur = f"pr{i}", f"pr{i + 1}"
        ctes.append(f"""dang{i} AS (
            SELECT CAST(COALESCE(sum(CAST(p.rank AS DECIMAL(20,10))), 0)
                        AS DOUBLE) AS m
            FROM {prev} p LEFT JOIN outd o ON p.node = o.src
            WHERE o."out" IS NULL)""")
        ctes.append(f"""con{i} AS (
            SELECT e.dst,
                   CAST(sum(CAST({_q9_sql('p.rank / o."out"')}
                                 AS DECIMAL(20,10))) AS DOUBLE) AS inflow
            FROM e
            JOIN {prev} p ON e.src = p.node
            JOIN outd o ON e.src = o.src
            GROUP BY e.dst)""")
        inner = (f"{one_minus_d} / (SELECT n FROM nn) "
                 f"+ {dd} * (COALESCE(c.inflow, CAST(0.0 AS DOUBLE)) "
                 f"+ (SELECT m FROM dang{i}) / (SELECT n FROM nn))")
        ctes.append(f"""{cur} AS (
            SELECT n.node, {_q9_sql(inner)} AS rank
            FROM nodes n LEFT JOIN con{i} c ON n.node = c.dst)""")
    return ("WITH " + ",\n".join(ctes)
            + f" SELECT node, rank FROM pr{iterations}")
