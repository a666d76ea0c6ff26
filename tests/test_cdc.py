"""CDC watermark runner: the reference's extract->transform->load loop
semantics (full drain, resume no-op, RI-gate abort before write,
monotone watermark, dual-output sinks)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_migration_etl_scripts_spark.catalog import Catalog
from data_migration_etl_scripts_spark.cdc import (
    IncrementalPipeline,
    WatermarkStore,
    run_incremental,
)
from data_migration_etl_scripts_spark.gates import (
    IncrementalDependencyError,
    require_no_nulls,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, base_dir=SF_DIR, scratch_dir=str(tmp_path))


def orders_pipeline(cat, **kw):
    return IncrementalPipeline(
        name="orders",
        source=lambda: cat.read("orders"),
        watermark_col="o_orderkey",
        sink_table="orders_v2",
        **kw,
    )


def test_full_load_then_resume_noop(cat):
    r1 = run_incremental(cat, orders_pipeline(cat), batch_size=600)
    assert r1.rows == 1500 and r1.batches == 3
    assert r1.final_watermark == 1499
    assert cat.read("orders_v2").count() == 1500

    r2 = run_incremental(cat, orders_pipeline(cat), batch_size=600)
    assert r2.rows == 0 and r2.batches == 0
    assert cat.read("orders_v2").count() == 1500  # no double-insert


def test_batch_size_none_single_drain(cat):
    r = run_incremental(cat, orders_pipeline(cat), batch_size=None)
    assert r.batches == 1 and r.rows == 1500


def test_incremental_picks_up_only_new_rows(cat, spark):
    run_incremental(cat, orders_pipeline(cat), batch_size=None)
    # simulate new source rows arriving beyond the watermark
    newer = cat.read("orders").withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(10_000)
    )
    pipe = IncrementalPipeline(
        name="orders",
        source=lambda: cat.read("orders").unionByName(newer),
        watermark_col="o_orderkey",
        sink_table="orders_v2",
    )
    r = run_incremental(cat, pipe, batch_size=1000)
    assert r.rows == 1500  # only the new keys
    assert r.final_watermark == 11_499


def test_gate_aborts_without_write_or_advance(cat):
    def gated(df, ts):
        out = df.withColumn("new_id", F.lit(None).cast("long"))
        return require_no_nulls(out, "new_id", context="orders->dim")

    pipe = IncrementalPipeline(
        name="orders_gated",
        source=lambda: cat.read("orders"),
        watermark_col="o_orderkey",
        sink_table="orders_gated_v2",
        transform=gated,
    )
    with pytest.raises(IncrementalDependencyError):
        run_incremental(cat, pipe, batch_size=500)
    assert not cat.exists("orders_gated_v2")
    store = WatermarkStore(cat.spark, os.path.join(cat.scratch_dir, "_etl_cdc"))
    assert store.get("orders_gated") is None


def test_dual_output_sink(cat):
    pipe = IncrementalPipeline(
        name="orders_dual",
        source=lambda: cat.read("orders"),
        watermark_col="o_orderkey",
        sink_table="orders_entity",
        transform=lambda df, ts: df.select("o_orderkey", "o_custkey"),
        extra_sinks=(
            ("orders_sync", lambda df: df.select(F.col("o_orderkey").alias("old_id"))),
        ),
    )
    run_incremental(cat, pipe, batch_size=None)
    assert cat.read("orders_entity").count() == 1500
    assert cat.read("orders_sync").columns == ["old_id"]
    assert cat.read("orders_sync").count() == 1500


def test_watermark_monotonicity_enforced(cat):
    store = WatermarkStore(cat.spark, os.path.join(cat.scratch_dir, "_etl_cdc"))
    store.advance("t", 100)
    store.advance("t", 150)
    with pytest.raises(ValueError):
        store.advance("t", 99)
    assert store.get("t") == 150


def test_watermark_zero_key_not_skipped(cat, spark):
    """Keys starting at 0 must load (never treat missing watermark as 0)."""
    src = spark.range(0, 5).withColumnRenamed("id", "k")
    pipe = IncrementalPipeline(
        name="zero_keys", source=lambda: src, watermark_col="k", sink_table="zk"
    )
    r = run_incremental(cat, pipe, batch_size=None)
    assert r.rows == 5


def test_observed_gate_staged_write_aborts_clean(cat, spark):
    """observe()-fused gate: one scan per batch, staged files promoted
    only on a clean gate."""
    import os

    def with_null_fk(df, ts):
        return df.withColumn("new_id", F.lit(None).cast("long"))

    pipe = IncrementalPipeline(
        name="orders_obs_bad",
        source=lambda: cat.read("orders"),
        watermark_col="o_orderkey",
        sink_table="orders_obs_v2",
        transform=with_null_fk,
    )
    with pytest.raises(IncrementalDependencyError):
        run_incremental(cat, pipe, batch_size=None, observe_gates=["new_id"])
    assert not cat.exists("orders_obs_v2")
    assert not os.path.exists(os.path.join(cat.scratch_dir, "_staging", "orders_obs_bad"))
    store = WatermarkStore(cat.spark, os.path.join(cat.scratch_dir, "_etl_cdc"))
    assert store.get("orders_obs_bad") is None


def test_observed_gate_staged_write_promotes(cat):
    pipe = IncrementalPipeline(
        name="orders_obs_ok",
        source=lambda: cat.read("orders"),
        watermark_col="o_orderkey",
        sink_table="orders_obs_v2",
        transform=lambda df, ts: df.select("o_orderkey", "o_custkey"),
        extra_sinks=(
            ("orders_obs_sync", lambda df: df.select(F.col("o_orderkey").alias("old_id"))),
        ),
    )
    r = run_incremental(cat, pipe, batch_size=700, observe_gates=["o_custkey"])
    assert r.rows == 1500 and r.batches == 3
    assert cat.read("orders_obs_v2").count() == 1500
    assert cat.read("orders_obs_sync").count() == 1500


def test_run_scoped_ignores_watermark(cat, spark):
    from data_migration_etl_scripts_spark.cdc import run_scoped

    pipe = orders_pipeline(cat, transform=lambda df, ts: df.select("o_orderkey", "o_custkey"))
    run_incremental(cat, pipe, batch_size=None)
    assert cat.read("orders_v2").count() == 1500

    # scoped repair re-run for one customer: appends again (idempotency
    # is the transform's anti-join job, as in the reference's zTEST)
    n = run_scoped(cat, pipe, F.col("o_custkey") == 7)
    per_cust = cat.read("orders_v2").where(F.col("o_custkey") == 7).count()
    assert n > 0 and per_cust == 2 * n
    # watermark untouched
    store = WatermarkStore(cat.spark, os.path.join(cat.scratch_dir, "_etl_cdc"))
    assert store.get("orders") == 1499


def test_schema_evolution_merge_read(cat, spark):
    """S10 analog: a later batch adds Old*ID; merge-read widens."""
    cat.write(spark.createDataFrame([(1, "a")], "id long, name string"), "evo")
    cat.write(
        spark.createDataFrame([(2, "b", 99)], "id long, name string, OldID long"),
        "evo",
        mode="append",
    )
    merged = cat.read("evo", merge_schema=True)
    assert set(merged.columns) == {"id", "name", "OldID"}
    got = {r.id: r.OldID for r in merged.collect()}
    assert got == {1: None, 2: 99}


def test_idempotent_batches_survive_crash_replay(cat, spark):
    """idempotent=True: a crash between batch write and watermark
    advance replays the SAME batch into the SAME deterministic
    directory — no duplicates."""
    pipe = orders_pipeline(cat, transform=lambda df, ts: df.select("o_orderkey", "o_custkey"))
    r = run_incremental(cat, pipe, batch_size=600, idempotent=True)
    assert r.rows == 1500 and r.batches == 3
    assert cat.read("orders_v2").count() == 1500

    # simulate crash-after-write-before-advance: the watermark still
    # holds the PREVIOUS batch boundary (1199) while the last batch's
    # directory (batch-1499) is already on disk; replay re-extracts the
    # identical batch and overwrites the same directory
    store = WatermarkStore(cat.spark, os.path.join(cat.scratch_dir, "_etl_cdc"))
    others = store._read().where(F.col("table_name") != "orders").collect()
    rows = [(r2.table_name, int(r2.max_index)) for r2 in others] + [("orders", 1199)]
    cat.spark.createDataFrame(rows, store.SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(store.path)

    r2 = run_incremental(cat, pipe, batch_size=600, idempotent=True)
    assert r2.rows == 300  # the replayed final batch (keys 1200-1499)
    assert cat.read("orders_v2").count() == 1500  # still no duplicates


def test_expectations_gate_aborts_batch_before_write(cat):
    from data_migration_etl_scripts_spark.operators import expectations as ex

    # 'P' statuses exist in the data -> the domain check must trip
    pipe = orders_pipeline(
        cat,
        expectations=lambda df: ex.expectation_report(
            df, row_checks={"status_domain": ex.accepted_values("o_orderstatus", ["O", "F"])}
        ),
    )
    with pytest.raises(ex.ExpectationError, match="status_domain"):
        run_incremental(cat, pipe, batch_size=None)
    # nothing written, watermark never advanced
    assert not os.path.isdir(os.path.join(cat.scratch_dir, "orders_v2"))
    assert WatermarkStore(cat.spark, os.path.join(cat.scratch_dir, "_etl_cdc")).get("orders") is None


def test_expectations_gate_clean_batch_loads(cat):
    from data_migration_etl_scripts_spark.operators import expectations as ex

    pipe = orders_pipeline(
        cat,
        expectations=lambda df: ex.expectation_report(
            df,
            row_checks={"custkey_not_null": ex.not_null("o_custkey")},
            unique_keys={"pk_unique": ["o_orderkey"]},
        ),
    )
    r = run_incremental(cat, pipe, batch_size=None)
    assert r.rows == 1500
    assert cat.read("orders_v2").count() == 1500


def test_batching_never_cuts_a_non_unique_watermark_group(cat, spark):
    """Watermark-aligned batching: with a NON-unique watermark column
    (e.g. roles' GroupID), a batch boundary landing mid-group must pull
    the whole group in — a plain limit would skip the tied rows forever
    once the watermark advanced past their value."""
    rows = [(g, f"form{j}") for g in range(1, 6) for j in range(4)]  # 5 groups x 4
    cat.write(
        spark.createDataFrame(rows, "GroupID long, FormName string"),
        "GroupedSource",
    )
    pipe = IncrementalPipeline(
        name="grouped",
        source=lambda: cat.read("GroupedSource"),
        watermark_col="GroupID",
        sink_table="GroupedV2",
    )
    # batch_size=3 would cut group 1 (4 rows) mid-group under plain limit
    r = run_incremental(cat, pipe, batch_size=3)
    assert r.rows == 20  # every row of every group landed
    out = cat.read("GroupedV2")
    got = {(x.GroupID, x.FormName) for x in out.collect()}
    assert got == set(rows)
    assert out.count() == 20  # and nothing duplicated


def test_null_watermark_rows_fail_loudly(cat, spark):
    """NULL-watermark rows sort FIRST under orderBy, so the boundary
    filter (`wm <= head_mx`, null-safe-false) would silently drop them
    and the advanced watermark (`wm > stored`) would exclude them
    FOREVER. The runner must refuse the batch instead."""
    rows = [(None, "lost"), (1, "a"), (2, "b")]
    cat.write(
        spark.createDataFrame(rows, "EventID long, Payload string"),
        "NullWmSource",
    )
    pipe = IncrementalPipeline(
        name="nullwm",
        source=lambda: cat.read("NullWmSource"),
        watermark_col="EventID",
        sink_table="NullWmV2",
    )
    with pytest.raises(ValueError, match="NULL"):
        run_incremental(cat, pipe, batch_size=2)
    # nothing written, watermark not advanced
    assert not cat.exists("NullWmV2")
    store = WatermarkStore(spark, os.path.join(cat.scratch_dir, "_etl_cdc"))
    assert store.get("nullwm") is None
