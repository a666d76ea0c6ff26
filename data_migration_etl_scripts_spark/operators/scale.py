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


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: Sequence[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-partition + sort-within-partitions before writing parquet:
    every output file covers a disjoint range of ``cluster_cols``, so
    parquet column min/max stats let later range/point predicates skip
    whole files and row groups (poor-man's clustering — same idea as
    Delta OPTIMIZE ZORDER for a single-dimension key).

    ``repartitionByRange`` samples the key distribution, so files come
    out balanced even under skew (quantile cuts, not hash). One shuffle
    to pay at write time; every selective read afterwards scans only
    the matching files instead of all of them.
    """
    cols = [F.col(c) for c in cluster_cols]
    parted = (
        df.repartitionByRange(num_files, *cols)
        if num_files
        else df.repartitionByRange(*cols)
    )
    parted.sortWithinPartitions(*cols).write.mode(mode).parquet(path)


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int,
    cluster_cols: Sequence[str] | None = None,
) -> int:
    """Rewrite a parquet directory into ~``ceil(n/target)`` files —
    the maintenance pass that keeps a streaming/incremental sink from
    accumulating thousands of tiny appended files (each file is a scan
    task + a NameNode/listing entry; small-file sprawl is a classic
    100 TB operational failure). Preserves range clustering when
    ``cluster_cols`` given. Returns the new file count.

    Uses overwrite-via-staging: read, coalesce/range-cluster, write to
    `path + '.compact'`, then swap — callers on object stores should
    swap via their catalog instead of a rename.
    """
    import math
    import os
    import shutil

    df = spark.read.parquet(path)
    n = df.count()
    n_files = max(1, math.ceil(n / target_rows_per_file))
    staged = path.rstrip("/") + ".compact"
    if cluster_cols:
        cols = [F.col(c) for c in cluster_cols]
        out = df.repartitionByRange(n_files, *cols).sortWithinPartitions(*cols)
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(staged)
    shutil.rmtree(path)
    os.rename(staged, path)
    return n_files


def _zorder_rank_expr(col: str, cmin: int, cmax: int, bits: int) -> str:
    """Exact-integer rank of ``col`` into [0, 2^bits): all-BIGINT math
    (``div``, never double division) so any engine reproduces the same
    rank bit-for-bit. NULLs rank at the minimum (cluster together at
    the front) instead of poisoning the whole key to NULL."""
    span = max(1, cmax - cmin)
    scale = (1 << bits) - 1
    if span > (1 << 63) // scale:
        # (col - cmin) * scale would exceed 2^63: non-ANSI Spark wraps
        # silently, mis-sorting Z-keys (the DuckDB twin errors instead).
        # Refuse loudly — callers can lower bits or pre-bucket the column.
        raise ValueError(
            f"zorder column {col!r} span {span} * {scale} overflows BIGINT; "
            f"lower bits (max span at bits={bits} is {(1 << 63) // scale})"
        )
    return (
        f"((coalesce(cast({col} as bigint), {cmin}) - {cmin})"
        f" * {scale}) div {span}"
    )


def zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    out_col: str = "_zval",
) -> DataFrame:
    """Append a Morton (Z-order) key interleaving the bits of ``cols``.

    Multi-dimensional clustering: sorting by the Z-key keeps rows close
    in EVERY listed dimension close in the file order, so parquet
    min/max stats prune files for predicates on ANY of the columns —
    single-key range clustering only prunes on its leading key. Same
    idea as Delta/Iceberg OPTIMIZE ZORDER.

    Plan shape: one tiny min/max aggregate per call (a single row,
    collected like a watermark — O(#cols), not data), then the key is
    pure codegen bit math (shiftleft/shiftright/AND folded over
    ``bits`` positions) — no UDF, no extra shuffle beyond the write's
    own range partition. Integer ranks use exact BIGINT ``div`` so the
    key is engine-reproducible (the DuckDB twin hash-matches).
    """
    k = len(cols)
    if k < 2:
        raise ValueError("zorder needs >= 2 columns (use range clustering for 1)")
    if bits * k > 63:
        raise ValueError(
            f"bits*len(cols) = {bits * k} exceeds 63: the Morton key would "
            "overflow into the BIGINT sign bit and silently mis-sort; "
            "lower bits (e.g. bits=63//len(cols))"
        )
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    stats = df.agg(*aggs).collect()[0].asDict()
    terms = []
    for j, c in enumerate(cols):
        cmin = int(stats[f"min_{c}"] or 0)  # all-NULL column -> rank 0
        cmax = int(stats[f"max_{c}"] or 0)
        rank = _zorder_rank_expr(c, cmin, cmax, bits)
        for i in range(bits):
            terms.append(f"shiftleft(shiftright(({rank}), {i}) & 1, {i * k + j})")
    return df.withColumn(out_col, F.expr(" + ".join(terms)).cast("bigint"))


def zorder_key_sql(
    inner_sql: str,
    cols: Sequence[str],
    bits: int = 16,
    out_col: str = "zval",
) -> str:
    """DuckDB twin of :func:`zorder_key` (min/max via window over the
    same relation; ``//`` == Spark's ``div`` on BIGINTs)."""
    k = len(cols)
    mm = ", ".join(
        f"min({c}) OVER () AS min_{c}, max({c}) OVER () AS max_{c}" for c in cols
    )
    terms = []
    for j, c in enumerate(cols):
        rank = (
            f"((coalesce(CAST({c} AS BIGINT), min_{c}) - min_{c})"
            f" * {(1 << bits) - 1}) "
            f"// (CASE WHEN max_{c} = min_{c} THEN 1 ELSE max_{c} - min_{c} END)"
        )
        for i in range(bits):
            # fully parenthesized: SQL << binds LOOSER than +, so a bare
            # `a << p + b << q` in the sum would parse as a << (p+b) << q
            terms.append(f"(((({rank}) >> {i}) & 1) << {i * k + j})")
    drop = ", ".join(f"min_{c}, max_{c}" for c in cols)
    return f"""
        SELECT * EXCLUDE ({drop}),
               CAST({" + ".join(terms)} AS BIGINT) AS {out_col}
        FROM (SELECT *, {mm} FROM ({inner_sql}))
    """


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    num_files: int,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered on the Morton key of ``cols``: range
    partition + sort by the Z-key (ONE shuffle), then drop it — the
    payoff is that every file's min/max box is tight in ALL clustered
    dimensions, so selective predicates on any of them skip files.
    The multi-dimensional sibling of :func:`write_range_clustered`."""
    keyed = zorder_key(df, cols, bits=bits)
    (
        keyed.repartitionByRange(num_files, F.col("_zval"))
        .sortWithinPartitions("_zval")
        .drop("_zval")
        .write.mode(mode)
        .parquet(path)
    )


def write_hive_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
    max_partitions: int = 10000,
) -> None:
    """Persist hive-style partitioned parquet (``col=value/``
    directories) — the bread-and-butter 100 TB fact layout: a
    partition-column predicate prunes whole DIRECTORIES at planning
    time (PartitionFilters in the scan node), before any file or
    row-group statistic is consulted. Complements range clustering
    (intra-file ordering) and Z-order (multi-dim file skipping):
    partitioning handles the coarse axis every query filters on
    (ingest date, source), clustering handles the rest.

    Guards the classic operational failure: more than
    ``max_partitions`` distinct partition values (e.g. partitioning by
    a near-unique key) would create millions of tiny directories and
    melt the file listing — refuse loudly instead. The check is one
    distinct-count aggregate, not a listing."""
    n = df.select(*partition_cols).distinct().limit(max_partitions + 1).count()
    if n > max_partitions:
        raise ValueError(
            f"write_hive_partitioned: > {max_partitions} distinct "
            f"partition values for {list(partition_cols)}; partition by a "
            "coarser column (date, source) and range-cluster the rest"
        )
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


# ----------------------------------------------- bloom prefilter (r6)


def bloom_bitmap(
    dim: DataFrame,
    key_col: str,
    n_bits: int = 8192,
    n_hashes: int = 3,
) -> list[int]:
    """Build a Bloom-filter bitmap (``n_bits`` bits as n_bits/64
    longs) over a dim-side key column, entirely with column bit math:
    per (key, seed) probe -> word index + mask, one bit_or group-by on
    the word index, and a BOUNDED collect of n_bits/64 rows.

    This is the manual runtime-filter for the case Spark's own
    broadcast/DPP machinery can't cover: the filtered dim key set is
    too big for an IN-list but the FACT scan is the cost center. A
    bitmap of any practical size (1 MB covers ~1M keys at 1% fp)
    broadcasts as a literal; the fact side drops definite-nonmembers
    BEFORE the shuffle. False positives only — the exact join after
    the prefilter keeps semantics identical (the oracle is the plain
    join)."""
    # round UP to whole words so the probe side's 64*len(bitmap)
    # modulus is ALWAYS the build modulus — a ragged n_bits would make
    # the two sides hash into different rings and silently drop
    # members (false negatives), violating the contract below
    n_words = (n_bits + 63) // 64
    n_bits = 64 * n_words
    probes = []
    for s in range(n_hashes):
        pos = f"pmod(xxhash64({key_col}, {s}), {n_bits})"
        probes.append(F.expr(
            f"struct(cast({pos} div 64 as int) as w, "
            f"shiftleft(cast(1 as bigint), cast({pos} % 64 as int)) as m)"
        ))
    words = (
        dim.select(F.explode(F.array(*probes)).alias("p"))
        .groupBy(F.col("p.w").alias("w"))
        .agg(F.bit_or("p.m").alias("m"))
        .collect()
    )
    bitmap = [0] * n_words
    for r in words:
        bitmap[r["w"]] = r["m"]
    return bitmap


def bloom_might_contain(
    key_col: str,
    bitmap: list[int],
    n_hashes: int = 3,
) -> Column:
    """Probe column: AND over the ``n_hashes`` bit tests against the
    literal bitmap — pure codegen (element_at + shifts), no UDF, no
    join. Compose as fact.where(bloom_might_contain(...)) ahead of the
    exact join. The bitmap literal parses once (array of longs); every
    shift term is fully parenthesized (`<<` binds looser than `+`)."""
    n_bits = 64 * len(bitmap)
    arr = "array(" + ", ".join(f"{w}L" for w in bitmap) + ")"
    tests = []
    for s in range(n_hashes):
        pos = f"pmod(xxhash64({key_col}, {s}), {n_bits})"
        tests.append(
            f"(element_at({arr}, cast({pos} div 64 as int) + 1) & "
            f"(shiftleft(cast(1 as bigint), cast({pos} % 64 as int)))) != 0"
        )
    return F.expr(" AND ".join(f"({t})" for t in tests))
