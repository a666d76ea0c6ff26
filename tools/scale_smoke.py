"""Nx relational scaling smoke: replicate the sf0.1 TPC-H-ish tables
N times with key offsets that PRESERVE join relationships (copy i
shifts every join key by i * (max_key + 1)), write to a scratch dir,
and time the headline queries at 1x vs Nx on the same session.

The point is catching plans that only look fine at sf0.1 — superlinear
blowups from shuffles, windows, or joins that stop fitting. Run:

    python tools/scale_smoke.py                   # 10x, all queries
    python tools/scale_smoke.py --copies 30 dedup_clusters
    python tools/scale_smoke.py --copies 30 --salt-docs 0.8 dedup_remove_runs

``--salt-docs FRAC`` perturbs the replicated documents' text (every
10th token of FRAC of the copies becomes a copy-specific marker), so
the corpus-wide duplication rate is realistic (~1-FRAC exact copies)
instead of the pathological (N-1)/N of exact replication — the honest
operating point for dedup/rewrite operators whose cost is
output-volume-bound.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: join keys to shift per table (columns sharing a domain shift together)
KEYED = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
}
#: key domains so offsets line up across tables: domain -> (table, col)
DOMAINS = {
    "orderkey": [("lineitem", "l_orderkey"), ("orders", "o_orderkey")],
    "custkey": [("orders", "o_custkey"), ("customer", "c_custkey")],
    "suppkey": [("lineitem", "l_suppkey"), ("supplier", "s_suppkey")],
    "partkey": [("lineitem", "l_partkey"), ("part", "p_partkey")],
    "docid": [("documents", "doc_id")],
    "vecid": [("embeddings", "vec_id")],
    "eventid": [("events", "event_id")],
    "userid": [("events", "user_id")],
}

#: scale-invariant queries (synthetic inputs generated in-session, or
#: fixed-size seed tables) — timing them at "10x" measures nothing
SKIP = {
    "multimodal_features",
    "multimodal_real_decode",
    "cross_join_seed",
    "video_frame_extract",  # synthetic media table, fixed size
}


def default_queries() -> list[str]:
    from data_migration_etl_scripts_spark import queries as q

    return [n for n in q.all_queries() if n not in SKIP]


def build_nx(spark, dst: str, copies: int, salt_docs: float = 0.0) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(dst, "_DONE")):
        return
    os.makedirs(dst, exist_ok=True)
    # one offset per key domain, shared by every table using it
    offsets = {}
    for dom, sites in DOMAINS.items():
        t, c = sites[0]
        mx = spark.read.parquet(f"{SRC}/{t}.parquet").agg(F.max(c)).collect()[0][0]
        offsets[dom] = int(mx) + 1
    col_off = {
        (t, c): offsets[dom] for dom, sites in DOMAINS.items() for (t, c) in sites
    }
    for t in ("lineitem", "orders", "customer", "supplier", "part",
              "nation", "region", "documents", "embeddings", "events"):
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        if t in KEYED:
            parts = []
            for i in range(copies):
                shifted = df
                for c in KEYED[t]:
                    shifted = shifted.withColumn(
                        c, F.col(c) + F.lit(i * col_off[(t, c)])
                    )
                if t == "documents" and salt_docs > 0 and i > 0:
                    # perturb every 10th token of salt_docs of this
                    # copy's docs, breaking window/shingle duplication
                    # for them — realistic dup rate instead of (N-1)/N
                    marker = F.lit(f"uqcpy{i}x")
                    salted = F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda x, idx: F.when(idx % 10 == 9, marker).otherwise(x),
                        ),
                        " ",
                    )
                    shifted = shifted.withColumn(
                        "text",
                        F.when(
                            (F.col("doc_id") % 100) < int(salt_docs * 100), salted
                        ).otherwise(F.col("text")),
                    )
                parts.append(shifted)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        else:
            out = df  # dims stay dims
        out.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
    open(os.path.join(dst, "_DONE"), "w").write("ok")


def main() -> int:
    from data_migration_etl_scripts_spark import get_spark
    from data_migration_etl_scripts_spark import queries as q

    args = sys.argv[1:]
    copies, salt = 10, 0.0
    if "--copies" in args:
        i = args.index("--copies")
        copies = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    if "--salt-docs" in args:
        i = args.index("--salt-docs")
        salt = float(args[i + 1])
        args = args[:i] + args[i + 2:]
    tag = f"{copies}" + (f"_salt{int(salt * 100)}" if salt else "")
    dst = f"/tmp/dmess_scale{tag}"

    spark = get_spark(app_name="scale_smoke")
    build_nx(spark, dst, copies, salt)
    all_q = q.all_queries()
    names = [n for n in args if n in all_q] or default_queries()
    nx = f"{copies}x"
    rows = []
    for name in names:
        times = {}
        for label, sf_dir in (("1x", SRC), (nx, dst)):
            spark.catalog.clearCache()
            t0 = time.time()
            all_q[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[label] = time.time() - t0
        ratio = times[nx] / times["1x"]
        rows.append((name, times["1x"], times[nx], ratio))
        print(f"{name:32s} 1x={times['1x']:6.2f}s {nx}={times[nx]:6.2f}s "
              f"ratio={ratio:5.2f}")
    bad = [r for r in rows if r[3] > 2 * copies]
    print(f"\n{len(rows)} queries; superlinear (>{2 * copies}x at {nx} data): "
          f"{[r[0] for r in bad] or 'none'}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
