"""ANN operating-point sweep: recall@5 vs wall-clock for the sign-LSH
bucketed and IVF approximate top-k operators at sf0.1, against the
brute-force exact top-k as ground truth.

    python tools/ann_sweep.py            # prints a markdown table

The output table is committed to SCALE.md so users picking
``bucket_bits`` / ``n_centroids`` / ``n_probe`` have measured guidance
instead of folklore. Timings are noop-sink forced, same protocol as
bench.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 5
N_QUERIES = 32


def main() -> int:
    from pyspark.sql import functions as F

    from data_migration_etl_scripts_spark import get_spark
    from data_migration_etl_scripts_spark.operators import similarity as sim

    spark = get_spark(app_name="ann_sweep")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_corpus = emb.count()
    queries = emb.where(F.col("vec_id") < N_QUERIES)

    def timed(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def mean_recall(approx, exact) -> float:
        r = sim.recall_at_k(approx, exact, k=K).agg(
            F.avg("recall_at_k").alias("r")
        ).collect()[0]["r"]
        return float(r)

    exact = sim.cosine_topk_bruteforce(emb, queries, k=K)
    exact.persist()
    t_exact = timed(exact)
    print(f"corpus={n_corpus} vectors, {N_QUERIES} queries, k={K}, "
          f"exact brute-force wall={t_exact:.2f}s\n")

    rows = [("exact brute-force", "—", 1.0, t_exact)]
    for bits, tables in ((4, 1), (6, 1), (8, 1), (10, 1),
                         (6, 2), (6, 4), (6, 8), (8, 4), (8, 8)):
        approx = sim.cosine_topk_bucketed(
            emb, queries, k=K, bucket_bits=bits, n_tables=tables
        )
        wall = timed(approx)
        rows.append((f"sign-LSH bucketed", f"bits={bits}, tables={tables}",
                     mean_recall(approx, exact), wall))
    for n_cent, probes in ((8, (1, 2, 4)), (16, (1, 2, 4, 8))):
        for np_ in probes:
            approx = sim.cosine_topk_ivf(
                emb, queries, k=K, n_centroids=n_cent, n_probe=np_
            )
            wall = timed(approx)
            rows.append((f"IVF (seeded)", f"cells={n_cent}, n_probe={np_}",
                         mean_recall(approx, exact), wall))
    cent = sim.train_kmeans_centroids(emb, n_centroids=16, n_iter=5)
    cent.persist().count()
    for np_ in (1, 2, 4):
        approx = sim.cosine_topk_ivf(
            emb, queries, k=K, centroids=cent, n_probe=np_
        )
        wall = timed(approx)
        rows.append((f"IVF (trained k-means)", f"cells=16, n_probe={np_}",
                     mean_recall(approx, exact), wall))
    for m, nc, rr in ((8, 16, 64), (8, 16, 128), (8, 32, 64)):
        approx = sim.cosine_topk_ivf_pq(
            emb, queries, k=K, n_centroids=8, n_probe=4,
            m_sub=m, n_codes=nc, rerank=rr,
        )
        wall = timed(approx)
        rows.append((
            "IVF+PQ (ADC, exact re-rank)",
            f"cells=8, probe=4, m={m}, codes={nc}, rerank={rr}",
            mean_recall(approx, exact), wall,
        ))
    for k1, k2, p1, p2 in (
        (8, 8, 2, 4), (8, 8, 4, 4), (8, 8, 4, 6), (8, 8, 6, 6),
        (16, 8, 4, 4), (16, 8, 6, 4), (16, 8, 8, 4), (16, 8, 8, 6),
    ):
        approx = sim.cosine_topk_ivf2(
            emb, queries, k=K, n_coarse=k1, n_sub=k2,
            n_probe_coarse=p1, n_probe_sub=p2,
        )
        wall = timed(approx)
        rows.append((
            "two-level IVF",
            f"coarse={k1}, sub={k2}, probe={p1}x{p2}",
            mean_recall(approx, exact), wall,
        ))

    print("| method | operating point | recall@5 | wall (s) |")
    print("|---|---|---|---|")
    for m, op, r, w in rows:
        print(f"| {m} | {op} | {r:.3f} | {w:.2f} |")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
