"""As-of and binned range joins: tie, no-match, duplicate-ts, and
boundary semantics."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from data_migration_etl_scripts_spark.operators import temporal as tmp


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 12:00:00")), (2, 10, _ts("2024-01-01 09:00:00"))],
        "lid long, k long, lts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts("2024-01-01 10:00:00"), 1.0),
            (101, 10, _ts("2024-01-01 11:30:00"), 2.0),
            (102, 10, _ts("2024-01-01 13:00:00"), 3.0),  # after both lefts
        ],
        "rid long, k long, rts timestamp, v double",
    )
    out = {r.lid: r for r in tmp.asof_join(
        left, right, key="k", left_ts="lts", right_ts="rts",
        right_cols=["rid", "v"], tiebreak="rid",
    ).collect()}
    assert out[1].asof_rid == 101 and out[1].asof_v == 2.0
    assert out[2].asof_rid is None  # nothing at or before 09:00


def test_asof_equal_timestamp_is_visible_and_tiebreak_latest_wins(spark):
    t = _ts("2024-01-01 10:00:00")
    left = spark.createDataFrame([(1, 5, t)], "lid long, k long, lts timestamp")
    right = spark.createDataFrame(
        [(7, 5, t, 1.0), (9, 5, t, 2.0)],
        "rid long, k long, rts timestamp, v double",
    )
    out = tmp.asof_join(
        left, right, key="k", left_ts="lts", right_ts="rts",
        right_cols=["rid", "v"], tiebreak="rid",
    ).collect()[0]
    assert out.asof_rid == 9  # simultaneous row visible; max tiebreak wins


def test_range_join_boundaries_inclusive_start_exclusive_end(spark):
    left = spark.createDataFrame(
        [(1, 5, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"))],
        "lid long, k long, s timestamp, e timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 5, _ts("2024-01-01 10:00:00")),   # == start: in
            (101, 5, _ts("2024-01-01 10:59:59.5")), # sub-second before end: in
            (102, 5, _ts("2024-01-01 11:00:00")),   # == end: out
            (103, 5, _ts("2024-01-01 09:59:59")),   # before start: out
            (104, 6, _ts("2024-01-01 10:30:00")),   # wrong key: out
        ],
        "rid long, k long, rts timestamp",
    )
    out = tmp.range_join_binned(
        left, right, key="k", left_start="s", left_end="e",
        right_ts="rts", bin_seconds=600,
    )
    assert sorted(r.rid for r in out.collect()) == [100, 101]


def test_range_join_is_hash_join_not_nested_loop(spark):
    left = spark.createDataFrame(
        [(1, 5, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"))],
        "lid long, k long, s timestamp, e timestamp",
    )
    right = spark.createDataFrame(
        [(100, 5, _ts("2024-01-01 10:30:00"))], "rid long, k long, rts timestamp"
    )
    plan = tmp.range_join_binned(
        left, right, key="k", left_start="s", left_end="e",
        right_ts="rts", bin_seconds=600,
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_asof_is_single_key_shuffle_no_join_op(spark):
    left = spark.createDataFrame(
        [(1, 5, _ts("2024-01-01 10:00:00"))], "lid long, k long, lts timestamp"
    )
    right = spark.createDataFrame(
        [(9, 5, _ts("2024-01-01 09:00:00"), 1.0)],
        "rid long, k long, rts timestamp, v double",
    )
    plan = tmp.asof_join(
        left, right, key="k", left_ts="lts", right_ts="rts",
        right_cols=["rid", "v"], tiebreak="rid",
    )._jdf.queryExecution().executedPlan().toString()
    # union + window: no join operator at all in the physical plan
    assert "Join" not in plan
    assert "Window" in plan
