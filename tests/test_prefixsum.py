"""Distributed prefix scan: parity with the single-task window form,
partition-count invariance, tie handling, and the no-global-window plan
contract."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from wagtail_vector_index_spark.operators.prefixsum import (
    assign_dense_ids,
    prefix_sum,
)


@pytest.fixture(scope="module")
def frame(spark):
    # values chosen so several order keys repeat (tie coverage) and the
    # range partitioner has real split points at 8 shuffle partitions
    rows = [(i, i % 37, float((i * 7) % 11)) for i in range(500)]
    return spark.createDataFrame(rows, "id long, k long, v double")


def test_prefix_sum_matches_global_window(spark, frame):
    got = {
        r["id"]: (r["v_cum"], r["k_cum"])
        for r in prefix_sum(
            frame, order_cols=["k", "id"], value_cols=["v", "k"]
        ).collect()
    }
    w = (
        Window.orderBy("k", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        r["id"]: (r["cv"], r["ck"])
        for r in frame.select(
            "id",
            F.sum("v").over(w).alias("cv"),
            F.sum("k").over(w).alias("ck"),
        ).collect()
    }
    assert got == want


def test_prefix_sum_partition_count_invariant(spark, frame):
    a = {
        r["id"]: r["v_cum"]
        for r in prefix_sum(
            frame, order_cols=["k", "id"], value_cols=["v"], num_partitions=1
        ).collect()
    }
    b = {
        r["id"]: r["v_cum"]
        for r in prefix_sum(
            frame, order_cols=["k", "id"], value_cols=["v"], num_partitions=13
        ).collect()
    }
    assert a == b


def test_dense_ids_match_row_number(spark, frame):
    got = {
        r["id"]: r["rn"]
        for r in assign_dense_ids(
            frame, order_cols=["v", "id"], out_col="rn"
        ).collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in frame.select(
            "id",
            F.row_number().over(Window.orderBy("v", "id")).alias("rn"),
        ).collect()
    }
    assert got == want


def test_dense_ids_descending_and_start(spark, frame):
    out = assign_dense_ids(
        frame,
        order_cols=["v", "id"],
        out_col="rn",
        descending=True,
        start=100,
        num_partitions=5,
    ).collect()
    ranked = sorted(out, key=lambda r: (-r["v"], -r["id"]))
    assert [r["rn"] for r in ranked] == list(range(100, 100 + len(ranked)))


def test_dense_ids_gapless_unique(spark, frame):
    ids = [
        r["dense_id"]
        for r in assign_dense_ids(frame, order_cols=["k", "id"]).collect()
    ]
    assert sorted(ids) == list(range(1, len(ids) + 1))


def test_empty_frame(spark):
    empty = spark.createDataFrame([], "id long, v double")
    assert prefix_sum(
        empty, order_cols=["id"], value_cols=["v"]
    ).count() == 0
    assert assign_dense_ids(empty, order_cols=["id"]).count() == 0


def test_no_single_task_window_in_plan(spark, frame):
    """The whole point: the scan never plans a global (empty-partition)
    Window — only a range exchange + the Arrow stage."""
    plan = (
        prefix_sum(frame, order_cols=["k", "id"], value_cols=["v"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the localCheckpoint cuts lineage, so the visible plan is the
    # checkpoint scan + the Arrow stage; a global Window would appear
    # here if the scan were implemented the banned way
    assert "Window" not in plan


def test_prefix_sum_with_totals_returns_grand_totals(spark, frame):
    from wagtail_vector_index_spark.operators.prefixsum import (
        prefix_sum_with_totals,
    )

    out, totals = prefix_sum_with_totals(
        frame, order_cols=["k", "id"], value_cols=["v", "k"]
    )
    agg = frame.agg(F.sum("v"), F.sum("k")).collect()[0]
    assert totals["v"] == agg[0]
    assert totals["k"] == agg[1]
    # and the scan's last row agrees with the totals
    last = max(out.collect(), key=lambda r: (r["k"], r["id"]))
    assert last["v_cum"] == totals["v"]
    assert last["k_cum"] == totals["k"]


def test_prefix_max_matches_global_window(spark, frame):
    from wagtail_vector_index_spark.operators.prefixsum import prefix_max

    got = {
        r["id"]: r["v_cummax"]
        for r in prefix_max(
            frame, order_cols=["k", "id"], value_cols=["v"]
        ).collect()
    }
    w = (
        Window.orderBy("k", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        r["id"]: r["cv"]
        for r in frame.select("id", F.max("v").over(w).alias("cv")).collect()
    }
    assert got == want


def test_prefix_max_exclusive_and_descending(spark, frame):
    from wagtail_vector_index_spark.operators.prefixsum import prefix_max

    got = {
        r["id"]: r["v_cummax"]
        for r in prefix_max(
            frame,
            order_cols=["k", "id"],
            value_cols=["v"],
            descending=True,
            exclusive=True,
            num_partitions=7,
        ).collect()
    }
    w = (
        Window.orderBy(F.col("k").desc(), F.col("id").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = {
        r["id"]: r["cv"]
        for r in frame.select("id", F.max("v").over(w).alias("cv")).collect()
    }
    assert got == want  # includes the NULL first row


def test_prefix_max_timestamps_partition_invariant(spark):
    from datetime import datetime

    from wagtail_vector_index_spark.operators.prefixsum import prefix_max

    rows = [
        (float(i), datetime(2024, 1, 1 + (i * 13) % 28)) for i in range(80)
    ]
    df = spark.createDataFrame(rows, "price double, d timestamp")
    outs = []
    for n in (1, 9):
        outs.append(
            {
                r["price"]: r["d_cummax"]
                for r in prefix_max(
                    df,
                    order_cols=["price"],
                    value_cols=["d"],
                    descending=True,
                    exclusive=True,
                    num_partitions=n,
                ).collect()
            }
        )
    assert outs[0] == outs[1]
    # highest price has no strictly-higher-price predecessor
    assert outs[0][79.0] is None
