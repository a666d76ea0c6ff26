"""Count-Min-Sketch as DataFrame ops — the mergeable frequency sketch.

Counters merge by ADDITION, the property exact counts lack at stream
scale: 1000 executors (or 1000 micro-batches) each build a depth x
width grid over their slice and the union groupBy-sums into the exact
same sketch one pass over the whole corpus would build. Point
estimates are min-over-depth with one-sided error (estimate >= exact,
within e*N/width w.h.p.).

Bucket hashes are deterministic md5 derivations shared character-for-
character with the DuckDB oracle (queries.cms_heavy_hitters), so every
counter is hash-matchable cross-engine.

Reference parity: the reference ETL has no sketches; this is
LLM-addendum profiling infrastructure (`queries.cms_heavy_hitters`
pins the batch form; `streaming/sketch_stream.py` folds it per
micro-batch).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_bucket(col: Column, d: int, width: int) -> Column:
    """md5-derived CMS bucket for depth row ``d`` — same value as the
    oracle's hex-cast form (queries._cms_bucket_sql)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(col, F.lit(f":cms{d}"))), 1, 13), 16, 10
        ).cast("long")
        % width
    )


def cms_sketch(
    df: DataFrame, key_col: str = "tok", depth: int = 4, width: int = 512
) -> DataFrame:
    """One grouped pass over keys -> (d, bucket, c) counter rows
    (depth*width rows max), map-side combined."""
    buckets = [
        F.struct(F.lit(d).alias("d"),
                 cms_bucket(F.col(key_col), d, width).alias("bucket"))
        for d in range(depth)
    ]
    return (
        df.select(F.explode(F.array(*buckets)).alias("p"))
        .groupBy(F.col("p.d").alias("d"), F.col("p.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Sketches add: union + sum per (d, bucket)."""
    return (
        a.unionByName(b)
        .groupBy("d", "bucket")
        .agg(F.sum("c").alias("c"))
    )


def cms_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    key_col: str = "tok",
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Attach ``est`` = min-over-depth counter to each key row (other
    columns pass through). The sketch side is counter-grid-sized, so
    it broadcasts; the probe is an equi-join on (d, bucket).

    Left join + coalesce(c, 0): an absent (d, bucket) counter means
    that depth never saw the key, so its contribution to the min is 0
    — the CMS definition. (An inner join would instead DROP the row
    from the min — overestimating — and a key missing at every depth
    would vanish from the output entirely.)"""
    probe = keys.select(
        "*",
        F.explode(F.array(*[
            F.struct(F.lit(d).alias("d"),
                     cms_bucket(F.col(key_col), d, width).alias("bucket"))
            for d in range(depth)
        ])).alias("p"),
    ).select(*keys.columns, F.col("p.d").alias("d"),
             F.col("p.bucket").alias("bucket"))
    return (
        probe.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(*keys.columns)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0).cast("long")))
             .alias("est"))
    )
