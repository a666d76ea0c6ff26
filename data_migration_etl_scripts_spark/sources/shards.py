"""WebDataset-style tar-shard export/import for training corpora.

Training dataloaders (WebDataset/torchdata convention) stream corpora
as size-bounded ``.tar`` shards whose members are named ``{key}.{ext}``
— sequential reads, no per-sample metadata service, shard-level
shuffling. The reference pipeline ends at SQL tables; an LLM-data
engine has to end at shards, so this sink is part of the engine's
contract, not an afterthought.

Scale shape (holds at 100 TB / 1000 executors):
- shard assignment is a DETERMINISTIC function of the key
  (``key % n_shards``), so re-runs and retries land every row in the
  same shard — no sampled range boundaries, no run-to-run drift;
- ONE shuffle (``repartition(n_shards_cols)``) co-locates each shard's
  rows, ``sortWithinPartitions(shard, key)`` makes member order
  deterministic; each task then STREAMS its rows into tars, holding one
  open tar and one Arrow batch in memory, never the whole partition;
- tars are written to a temp name and promoted with ``os.replace`` so a
  task retry can never publish a torn shard (same staged-rename
  discipline as ``cdc.py``'s transactional load);
- the manifest (one row per tar: items, bytes, key range) is the SAME
  pass's output — ``mapInPandas`` yields manifest rows while writing
  tars as the side effect, exactly how table formats collect per-file
  stats at commit time.

Tar bytes are deterministic: USTAR format, mtime=0, uid=gid=0,
mode=0o644, members in sorted (shard, key) order. That makes the
manifest — including the exact on-disk byte size — reproducible pure
math (512-byte block headers + 10240-byte record padding), which the
DuckDB oracle for ``export_tar_manifest`` recomputes in SQL and
hash-matches against the measured files.
"""

from __future__ import annotations

import io
import os
import tarfile
from collections.abc import Iterator

from data_migration_etl_scripts_spark.localdata import local_df
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST_SCHEMA = (
    "shard int, seq int, file string, n_items long, n_bytes long, "
    "key_min long, key_max long"
)


def _tar_member_bytes(payload_len: int) -> int:
    """On-disk cost of one USTAR member: 512-byte header + data padded
    to 512-byte blocks."""
    return 512 + ((payload_len + 511) // 512) * 512


def tar_file_bytes(payload_lens: list[int]) -> int:
    """Exact size of a USTAR tar holding the given payloads: members +
    1024 zero-byte end-of-archive marker, padded up to the 10240-byte
    record size (Python tarfile's default blocking factor)."""
    body = sum(_tar_member_bytes(n) for n in payload_lens) + 1024
    return ((body + 10239) // 10240) * 10240


def write_tar_shards(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    members: dict[str, str],
    n_shards: int = 8,
    max_items: int | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Plan a tar-shard export; materializing the returned manifest
    DataFrame performs the write.

    ``members`` maps member extension -> column, e.g.
    ``{"txt": "text", "json": "meta"}``; string columns are UTF-8
    encoded, binary columns are written as-is. Member names are
    ``{key}.{ext}`` (WebDataset sample grouping). Each output tar is
    ``shard-{shard:05d}-{seq:04d}.tar``; ``seq`` rolls when a tar
    reaches ``max_items`` members-per-extension or ``max_bytes``.

    The manifest row per tar carries (shard, seq, file, n_items,
    n_bytes, key_min, key_max) — n_bytes is measured from the written
    file, not computed, so downstream checks catch torn writes.
    """
    if not members:
        raise ValueError("members must map at least one extension to a column")
    exts = sorted(members)
    os.makedirs(out_dir, exist_ok=True)

    # pmod, not %: Spark % returns negative remainders for negative
    # keys, which would mint shard ids like -3 and malformed filenames
    shard = F.pmod(F.col(key_col), F.lit(n_shards)).cast("int").alias("_shard")
    cols = [F.col(key_col).cast("long").alias("_key")] + [
        F.col(members[e]).alias(f"_m_{e}") for e in exts
    ]
    planned = (
        df.select(shard, *cols)
        .repartition(n_shards, "_shard")
        .sortWithinPartitions("_shard", "_key")
    )

    def kernel(batches) -> Iterator:
        import pandas as pd

        state: dict[str, object] = {}
        out_rows: list[tuple] = []

        def open_tar(sh: int, seq: int) -> None:
            final = os.path.join(out_dir, f"shard-{sh:05d}-{seq:04d}.tar")
            tmp = final + f".inprogress-{os.getpid()}"
            state.update(
                shard=sh, seq=seq, final=final, tmp=tmp,
                fh=open(tmp, "wb"), items=0, bytes=1024 + 10239,
                kmin=None, kmax=None,
            )
            state["tar"] = tarfile.open(
                fileobj=state["fh"], mode="w", format=tarfile.USTAR_FORMAT
            )

        def close_tar() -> None:
            if "tar" not in state:
                return
            state["tar"].close()
            state["fh"].close()
            os.replace(state["tmp"], state["final"])
            out_rows.append(
                (
                    state["shard"], state["seq"],
                    os.path.basename(state["final"]), state["items"],
                    os.path.getsize(state["final"]),
                    state["kmin"], state["kmax"],
                )
            )
            for k in ("tar", "fh"):
                state.pop(k)

        def add_row(sh: int, key: int, payloads: list[bytes]) -> None:
            row_bytes = sum(_tar_member_bytes(len(p)) for p in payloads)
            rolled = "tar" in state and (
                state["shard"] != sh
                or (max_items is not None and state["items"] >= max_items)
                or (max_bytes is not None and state["bytes"] + row_bytes > max_bytes
                    and state["items"] > 0)
            )
            if rolled:
                nxt = state["seq"] + 1 if state["shard"] == sh else 0
                close_tar()
                open_tar(sh, nxt)
            elif "tar" not in state:
                open_tar(sh, 0)
            for ext, payload in zip(exts, payloads):
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(payload)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                info.mode = 0o644
                state["tar"].addfile(info, io.BytesIO(payload))
            state["items"] += 1
            state["bytes"] += row_bytes
            state["kmin"] = key if state["kmin"] is None else min(state["kmin"], key)
            state["kmax"] = key if state["kmax"] is None else max(state["kmax"], key)

        for pdf in batches:
            # not itertuples: pandas renames _-prefixed fields positionally
            for tup in zip(
                pdf["_shard"], pdf["_key"], *(pdf[f"_m_{e}"] for e in exts)
            ):
                payloads = []
                for v in tup[2:]:
                    if v is None:
                        # refuse loudly: a dataloader silently training
                        # on the 4-byte string "None" is far worse than
                        # a failed job — filter/fill nulls upstream
                        raise ValueError(
                            f"null member payload for key {tup[1]}; "
                            "filter or fill null member columns upstream"
                        )
                    payloads.append(
                        v if isinstance(v, bytes) else str(v).encode("utf-8")
                    )
                add_row(int(tup[0]), int(tup[1]), payloads)
        close_tar()
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=["shard", "seq", "file", "n_items", "n_bytes",
                         "key_min", "key_max"],
            )

    return planned.mapInPandas(kernel, schema=_MANIFEST_SCHEMA)


def export_tar_shards(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    members: dict[str, str],
    **kwargs,
) -> DataFrame:
    """Run the export and persist the manifest next to the shards
    (``_manifest`` parquet — the index a dataloader or a later
    incremental job reads instead of listing tars).

    Re-export discipline: the previous dataset stays readable until the
    new one succeeds. Before the action, only leaked ``.inprogress``
    temp files are swept; published tars are replaced file-by-file via
    ``os.replace`` during the write, and only AFTER the action commits
    are published tars not listed in the fresh manifest removed (a
    shrunken re-export would otherwise leave phantom high-seq tars the
    manifest doesn't list). A crash mid-export therefore leaves the old
    manifest plus a mix of old and already-replaced tars — detectable
    (manifest n_bytes won't match) but not transactional; on object
    stores, swap via a catalog instead (same caveat as
    ``compact_small_files``).
    """
    import glob as _glob

    for stale in _glob.glob(os.path.join(out_dir, "*.inprogress-*")):
        try:
            os.remove(stale)
        except OSError:
            pass
    manifest = write_tar_shards(df, out_dir, key_col, members, **kwargs)
    spark = manifest.sparkSession
    # Run the export ONCE at full parallelism (collect triggers the
    # mapInPandas kernel across all n_shards tasks) and write the tiny
    # one-row-per-tar manifest driver-side. A coalesce(1) before the
    # write would collapse the kernel itself into a single task,
    # serializing every tar write through one executor.
    rows = manifest.collect()
    (
        # one part file: the manifest is one row per tar by
        # construction; the default-parallelism local relation wrote
        # 32 near-empty part files (32 writer inits + commits, and 32
        # scan tasks for every later reader — guide §6 small files)
        local_df(spark, sorted(rows), _MANIFEST_SCHEMA)
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "_manifest"))
    )
    fresh = spark.read.parquet(os.path.join(out_dir, "_manifest"))
    listed = {r.file for r in rows}
    for tar in _glob.glob(os.path.join(out_dir, "shard-*.tar")):
        if os.path.basename(tar) not in listed:
            try:
                os.remove(tar)
            except OSError:
                pass
    return fresh


def read_tar_shards(spark: SparkSession, shard_dir: str) -> DataFrame:
    """Read shards back as one row per member: (shard_file, key, ext,
    content binary, n_bytes).

    ``binaryFile`` lists and reads whole tars per task — shards are
    size-bounded by construction, so a task holds one shard (not one
    corpus) in memory; at 1000 executors each reads its own slice of
    the shard listing. Extraction is in-memory tarfile over the
    ``content`` column via ``mapInPandas`` (Arrow-batched)."""
    raw = spark.read.format("binaryFile").load(os.path.join(shard_dir, "shard-*.tar"))

    def kernel(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                with tarfile.open(fileobj=io.BytesIO(blob), mode="r") as tf:
                    for info in tf.getmembers():
                        key, _, ext = info.name.rpartition(".")
                        rows.append(
                            (
                                os.path.basename(path), int(key), ext,
                                tf.extractfile(info).read(), info.size,
                            )
                        )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["shard_file", "key", "ext", "content", "n_bytes"],
                )

    return raw.select("path", "content").mapInPandas(
        kernel, schema="shard_file string, key long, ext string, content binary, n_bytes long"
    )


def tar_manifest_sql(
    inner_sql: str,
    key_col: str,
    member_len_exprs: list[str],
    n_shards: int = 8,
    max_items: int | None = None,
) -> str:
    """DuckDB twin of the ``write_tar_shards`` manifest (items-bounded
    rolling): recomputes per-tar item counts, key ranges, and the EXACT
    on-disk byte size from pure 512/10240-block arithmetic over the
    member payload lengths — the written tars are deterministic USTAR,
    so measured size == computed size or the sink is broken.

    ``member_len_exprs``: SQL expressions for each member's payload
    byte length (e.g. ``octet_length(text)``), matching the sorted-ext
    member order used by the writer.
    """
    row_bytes = " + ".join(
        f"(512 + ((({e}) + 511) // 512) * 512)" for e in member_len_exprs
    )
    seq = (
        f"CAST((row_number() OVER (PARTITION BY shard ORDER BY key) - 1) "
        f"// {max_items} AS INT)"
        if max_items is not None
        else "0"
    )
    return f"""
        WITH rows_in AS (
            SELECT CAST(((({key_col}) % {n_shards}) + {n_shards}) % {n_shards} AS INT) AS shard,
                   CAST({key_col} AS BIGINT) AS key,
                   CAST({row_bytes} AS BIGINT) AS row_bytes
            FROM ({inner_sql})
        ),
        seqd AS (
            SELECT shard, key, row_bytes, {seq} AS seq FROM rows_in
        )
        SELECT shard, seq,
               'shard-' || lpad(CAST(shard AS VARCHAR), 5, '0') || '-'
                       || lpad(CAST(seq AS VARCHAR), 4, '0') || '.tar' AS file,
               count(*) AS n_items,
               ((sum(row_bytes) + 1024 + 10239) // 10240) * 10240 AS n_bytes,
               min(key) AS key_min, max(key) AS key_max
        FROM seqd GROUP BY shard, seq
    """


def shards_to_table(spark: SparkSession, shard_dir: str) -> DataFrame:
    """Members regrouped one row per sample: (key, <ext> columns...) —
    the inverse of ``write_tar_shards`` for relational consumers.
    One groupBy on key; extensions become binary columns via max(CASE)
    (each (key, ext) appears once by construction)."""
    # persist across the two jobs: the distinct-ext probe and the
    # groupBy would otherwise each re-read and re-untar every shard
    members = read_tar_shards(spark, shard_dir).persist()
    exts = sorted(r.ext for r in members.select("ext").distinct().collect())
    aggs = [
        F.max(F.when(F.col("ext") == e, F.col("content"))).alias(e) for e in exts
    ]
    return members.groupBy("key").agg(*aggs)


def export_tar_shards_incremental(
    df: DataFrame,
    root_dir: str,
    key_col: str,
    members: dict[str, str],
    **kwargs,
) -> DataFrame:
    """Append-only export: keys already shipped by ANY previous batch
    are skipped; genuinely new rows export into the next
    ``batch-{n:06d}/`` directory (same layout the streaming admit loop
    emits). Returns the new batch's manifest — empty if nothing new.

    Each batch dir carries a ``_keys`` parquet alongside ``_manifest``:
    the exact-membership index the anti-join runs against (manifest key
    RANGES can't answer membership). History cost is O(shipped keys),
    read once per increment — the same persisted-index pattern as
    ``operators/ingest``'s content-hash table; the corpus payload is
    never re-read.
    """
    import glob as _glob

    spark = df.sparkSession
    batches = sorted(_glob.glob(os.path.join(root_dir, "batch-*")))
    key_paths = [p for p in (os.path.join(b, "_keys") for b in batches)
                 if os.path.isdir(p)]
    fresh = df
    if key_paths:
        shipped = spark.read.parquet(*key_paths)
        fresh = df.join(
            shipped.withColumnRenamed("key", key_col), key_col, "left_anti"
        )
    fresh = fresh.localCheckpoint()  # pin the set: used by export AND _keys
    if fresh.rdd.isEmpty():
        return spark.createDataFrame([], _MANIFEST_SCHEMA)
    nxt = 0
    if batches:
        nxt = max(int(os.path.basename(b).split("-")[1]) for b in batches) + 1
    batch_dir = os.path.join(root_dir, f"batch-{nxt:06d}")
    manifest = export_tar_shards(fresh, batch_dir, key_col, members, **kwargs)
    (
        fresh.select(F.col(key_col).cast("long").alias("key"))
        .write.mode("overwrite")
        .parquet(os.path.join(batch_dir, "_keys"))
    )
    return manifest
