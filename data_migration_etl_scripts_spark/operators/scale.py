"""Scale-shaping operators: skew-salted joins and bucketed co-location.

These change the physical data layout, not the logical result. They
matter only past the laptop: at 100 TB, a single hot key (the
boilerplate shingle, the mega-customer, the default location) turns a
hash-join shuffle into one straggler task, and repeated fact-fact
joins on the same key pay a full shuffle each time unless the tables
are bucketed to agree on partitioning.

AQE's skew-join handling (on in session.py) splits oversized
partitions automatically for sort-merge joins; explicit salting is
for when the skew is on the BUILD side of a broadcast-unfriendly join
or you need deterministic layout (e.g. writing).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
    salt: int = 8,
) -> DataFrame:
    """Equi-join with key salting: facts get a random salt in [0, salt),
    the (smaller) right side is replicated `salt` times, and the join
    key becomes (key, salt) — one hot key now spreads over `salt`
    tasks instead of one.

    Result == plain ``facts.join(dim, on, how)``; tested for equality.
    Use when `dim` is too big to broadcast and `facts` has hot keys.
    """
    salted_facts = facts.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    exploded_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return salted_facts.join(exploded_dim, on=[on, "__salt"], how=how).drop("__salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 8,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a table bucketed (and optionally sorted) on its join key.

    Two tables bucketed identically on the join key sort-merge-join
    with ZERO exchange — the pre-paid shuffle. This is the right
    layout for fact tables that join each other repeatedly on the same
    key (orders x lineitem here; OrderCheckout x Orders in the
    reference's domain). Requires a metastore table (saveAsTable), not
    a bare path — Spark stores the bucketing metadata in the catalog.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
