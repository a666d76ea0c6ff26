"""Table catalog: name -> DataFrame over a directory of parquet tables.

The reference's dataflow graph is two databases (source ``dbo.*`` V1 and
target ``app.*`` V2) where the target is both sink and mid-pipeline lookup
source (reference: ``utils/fks_mapper.py:8-111``). Here a Catalog is a thin
named-table layer over a directory of parquet files (one per table) plus a
writable area for engine outputs (entity tables, sync crosswalks, the
watermark table).

Scale note: on a real deployment this maps 1:1 onto a metastore / Delta
catalog; nothing below assumes local paths beyond ``os.path`` joins.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: Tables the driver-provided testdata ships (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


class Catalog:
    """Named parquet tables under a base directory.

    ``read(name)`` resolves ``<base>/<name>.parquet`` first, then
    ``<base>/<name>`` (directory-style output of ``write``).
    """

    def __init__(self, spark: SparkSession, base_dir: str, scratch_dir: str | None = None):
        self.spark = spark
        self.base_dir = base_dir
        self.scratch_dir = scratch_dir or os.path.join("/tmp", "dmess_spark_scratch")

    def path(self, name: str) -> str:
        file_style = os.path.join(self.base_dir, f"{name}.parquet")
        if os.path.exists(file_style):
            return file_style
        dir_style = os.path.join(self.base_dir, name)
        if os.path.exists(dir_style):
            return dir_style
        scratch = os.path.join(self.scratch_dir, name)
        if os.path.exists(scratch):
            return scratch
        raise KeyError(f"table not found in catalog: {name!r} under {self.base_dir}")

    def read(self, name: str, merge_schema: bool = False) -> DataFrame:
        """``merge_schema=True`` unions column sets across the table's
        files — the parquet equivalent of the reference's idempotent
        ``ALTER TABLE ADD Old<X>ID`` guards (S10): a batch appended
        with a new column widens the table, earlier files read it as
        null."""
        reader = self.spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        # Idempotent sinks nest per-batch subdirectories (batch-<wm>),
        # which need recursiveFileLookup — but that option DISABLES
        # hive partition discovery, so apply it only when non-hive
        # (no '=') subdirectories are present.
        p = self.path(name)
        if os.path.isdir(p) and any(
            "=" not in e and os.path.isdir(os.path.join(p, e))
            for e in os.listdir(p)
        ):
            reader = reader.option("recursiveFileLookup", "true")
        return reader.parquet(p)

    def register_all(self, names: tuple[str, ...] = TESTDATA_TABLES) -> None:
        """Register every table as a temp view for spark.sql()."""
        for name in names:
            try:
                self.read(name).createOrReplaceTempView(name)
            except KeyError:
                continue

    def write(
        self,
        df: DataFrame,
        name: str,
        mode: str = "overwrite",
        partition_by: tuple[str, ...] | list[str] = (),
        sort_within_partitions: tuple[str, ...] | list[str] = (),
    ) -> str:
        """Write an engine output table into the scratch area.

        Append mode is how the reference's JDBC ``if_exists='append'``
        sink is expressed (reference: ``Template_Tables/makes.py:97``);
        parquet append is a new-files-only commit so it is atomic per
        batch at the file level.

        Scale knobs:
        - ``partition_by``: hive-style directory partitioning — readers
          filtering on the partition column skip whole directories
          (partition pruning), the first-order I/O lever for a 100 TB
          fact table (partition by ingest date / tenant).
        - ``sort_within_partitions``: clusters rows so parquet row-group
          min/max stats become selective — point/range predicates on
          the sort key skip row groups inside each file.
        """
        out = os.path.join(self.scratch_dir, name)
        if sort_within_partitions:
            df = df.sortWithinPartitions(*sort_within_partitions)
        writer = df.write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*list(partition_by))
        writer.parquet(out)
        return out

    def exists(self, name: str) -> bool:
        try:
            self.path(name)
            return True
        except KeyError:
            return False
