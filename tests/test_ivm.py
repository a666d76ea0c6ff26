"""Join-IVM delta algebra: quadrant coverage, late dims, empty and
uneven batch lists, and no-duplicate guarantees on tiny frames where
every case is enumerable by hand."""

from __future__ import annotations

from data_migration_etl_scripts_spark.operators import ivm


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_all_quadrants_exactly_once(spark):
    # facts f1..f4 and dims d1..d2 split so every (old, new) pairing occurs
    f1 = spark.createDataFrame([(1, 10), (2, 20)], "k int, fv int")
    f2 = spark.createDataFrame([(1, 11), (3, 30)], "k int, fv int")
    d1 = spark.createDataFrame([(1, "a")], "k int, dv string")
    d2 = spark.createDataFrame([(2, "b"), (3, "c")], "k int, dv string")
    view = ivm.maintain_join([f1, f2], [d1, d2], on="k")
    full = f1.unionByName(f2).join(d1.unionByName(d2), "k")
    assert _rows(view) == _rows(full)


def test_fact_before_its_dim_arrives(spark):
    # order for customer 5 lands in batch 1; customer 5 in batch 3
    f1 = spark.createDataFrame([(5, 100)], "k int, fv int")
    f2 = spark.createDataFrame([], "k int, fv int")
    d1 = spark.createDataFrame([], "k int, dv string")
    d3 = spark.createDataFrame([(5, "late")], "k int, dv string")
    view = ivm.maintain_join([f1, f2, f2], [d1, d1, d3], on="k")
    assert _rows(view) == [(5, 100, "late")]


def test_uneven_batch_lists_pad_with_empty(spark):
    f = [spark.createDataFrame([(i, i)], "k int, fv int") for i in (1, 2, 3)]
    d = [spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], "k int, dv string")]
    view = ivm.maintain_join(f, d, on="k")
    assert _rows(view) == [(1, 1, "x"), (2, 2, "y"), (3, 3, "z")]


def test_no_phantom_duplicates_on_repeated_keys(spark):
    # two facts sharing a key + dim split across batches: each fact
    # joins its dim exactly once
    f1 = spark.createDataFrame([(7, 1), (7, 2)], "k int, fv int")
    f2 = spark.createDataFrame([(7, 3)], "k int, fv int")
    d1 = spark.createDataFrame([(7, "d")], "k int, dv string")
    d2 = spark.createDataFrame([], "k int, dv string")
    view = ivm.maintain_join([f1, f2], [d1, d2], on="k")
    assert _rows(view) == [(7, 1, "d"), (7, 2, "d"), (7, 3, "d")]


def test_delta_form_uses_broadcast(spark):
    f1 = spark.createDataFrame([(1, 10)], "k int, fv int")
    f2 = spark.createDataFrame([(2, 20)], "k int, fv int")
    d1 = spark.createDataFrame([(1, "a")], "k int, dv string")
    d2 = spark.createDataFrame([(2, "b")], "k int, dv string")
    view = ivm.maintain_join([f1, f2], [d1, d2], on="k")
    p = view._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_cdc_delete_then_reinsert_same_key(spark):
    f1 = spark.createDataFrame([(1, 10)], "k int, fv int")
    d1 = spark.createDataFrame([(1, "a")], "k int, dv string")
    batches = [
        {"f_ins": f1, "d_ins": d1},
        {"f_del": spark.createDataFrame([(1,)], "k int")},
        {"f_ins": spark.createDataFrame([(1, 99)], "k int, fv int")},
    ]
    view = ivm.maintain_join_cdc(batches, on="k", fact_key="k", dim_key="k")
    assert _rows(view) == [(1, 99, "a")]


def test_cdc_dim_delete_cascades(spark):
    f1 = spark.createDataFrame([(1, 10), (2, 20)], "k int, fv int")
    d1 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, dv string")
    batches = [
        {"f_ins": f1, "d_ins": d1},
        {"d_del": spark.createDataFrame([(1,)], "k int")},
    ]
    view = ivm.maintain_join_cdc(batches, on="k", fact_key="k", dim_key="k")
    # every view row of the deleted dim key retracts
    assert _rows(view) == [(2, 20, "b")]


def test_cdc_delete_before_insert_within_batch(spark):
    f1 = spark.createDataFrame([(1, 10)], "k int, fv int")
    d1 = spark.createDataFrame([(1, "a")], "k int, dv string")
    batches = [
        {"f_ins": f1, "d_ins": d1},
        # replace = delete + insert in ONE batch
        {"f_del": spark.createDataFrame([(1,)], "k int"),
         "f_ins": spark.createDataFrame([(1, 42)], "k int, fv int")},
    ]
    view = ivm.maintain_join_cdc(batches, on="k", fact_key="k", dim_key="k")
    assert _rows(view) == [(1, 42, "a")]


def test_first_batch_must_seed_both_sides(spark):
    import pytest

    f1 = spark.createDataFrame([(1, 10)], "k int, fv int")
    with pytest.raises(ValueError, match="FIRST batch"):
        ivm.maintain_join_cdc([{"f_ins": f1}], on="k", fact_key="k", dim_key="k")
    with pytest.raises(ValueError, match="at least one batch"):
        ivm.maintain_join([], [f1], on="k")


def test_cdc_delete_before_any_insert_raises(spark):
    import pytest

    f1 = spark.createDataFrame([(1, 10)], "k int, fv int")
    d1 = spark.createDataFrame([(1, "a")], "k int, dv string")
    dels = spark.createDataFrame([(1,)], "k int")
    # a delete leading the feed has nothing to retract: malformed CDC,
    # must raise rather than be silently dropped
    with pytest.raises(ValueError, match="f_del arrived before any f_ins"):
        ivm.maintain_join_cdc(
            [{"f_del": dels, "f_ins": f1, "d_ins": d1}],
            on="k", fact_key="k", dim_key="k",
        )
    with pytest.raises(ValueError, match="d_del arrived before any d_ins"):
        ivm.maintain_join_cdc(
            [{"d_del": dels, "f_ins": f1, "d_ins": d1}],
            on="k", fact_key="k", dim_key="k",
        )
