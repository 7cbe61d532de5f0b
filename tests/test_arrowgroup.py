"""streamed_group_apply must be a drop-in for groupBy().applyInPandas —
including groups that span Arrow batch boundaries."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from wagtail_vector_index_spark.operators.arrowgroup import (
    streamed_group_apply,
)

SCHEMA = "g int, h string, n long, s double"


def _make_summarize():
    # nested so cloudpickle ships it by value (the tests module isn't
    # importable on executors)
    def _summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "g": [int(pdf["g"].iloc[0])],
                "h": [str(pdf["h"].iloc[0])],
                "n": [len(pdf)],
                "s": [float(pdf["v"].sum())],
            }
        )

    return _summarize


_summarize = _make_summarize()


@pytest.fixture()
def grouped_df(spark):
    rows = [
        (i % 17, "ab"[i % 2], float(i) * 0.5 - 3.0) for i in range(400)
    ]
    return spark.createDataFrame(rows, "g int, h string, v double")


def _as_dict(rows):
    return {(r["g"], r["h"]): (r["n"], round(r["s"], 9)) for r in rows}


def test_matches_apply_in_pandas(spark, grouped_df):
    want = _as_dict(
        grouped_df.groupBy("g", "h")
        .applyInPandas(_summarize, schema=SCHEMA)
        .collect()
    )
    got = _as_dict(
        streamed_group_apply(
            grouped_df, ["g", "h"], _summarize, SCHEMA
        ).collect()
    )
    assert got == want
    assert len(got) == 34  # 17 g-values x 2 h-values


def test_groups_spanning_batch_boundaries(spark, grouped_df):
    """With a tiny Arrow batch size every group spans several batches;
    the trailing-run carry buffer must reassemble them exactly."""
    want = _as_dict(
        grouped_df.groupBy("g", "h")
        .applyInPandas(_summarize, schema=SCHEMA)
        .collect()
    )
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        got = _as_dict(
            streamed_group_apply(
                grouped_df, ["g", "h"], _summarize, SCHEMA,
                num_partitions=3,
            ).collect()
        )
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old
        )
    assert got == want


def test_single_giant_group_and_empty_frames(spark):
    df = spark.createDataFrame(
        [(1, "x", float(i)) for i in range(50)], "g int, h string, v double"
    )
    out = streamed_group_apply(df, ["g", "h"], _summarize, SCHEMA).collect()
    assert len(out) == 1 and out[0]["n"] == 50
    empty = streamed_group_apply(
        df.where(F.col("g") == 99), ["g", "h"], _summarize, SCHEMA
    )
    assert empty.count() == 0


def test_null_keys_group_whole_across_batches(spark):
    """A null-keyed group must assemble as ONE group even when it spans
    Arrow batch boundaries — null==null in the trailing-run carry
    (matches applyInPandas / groupby(dropna=False) semantics)."""

    def summarize_nullable(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf["g"].iloc[0]
        return pd.DataFrame(
            {
                "g": [None if pd.isna(g) else int(g)],
                "n": [len(pdf)],
                "s": [float(pdf["v"].sum())],
            }
        )

    rows = [(None if i % 3 == 0 else i % 5, float(i)) for i in range(60)]
    df = spark.createDataFrame(rows, "g int, v double")
    want = {
        (r["g"],): (r["n"], round(r["s"], 9))
        for r in df.groupBy("g")
        .applyInPandas(summarize_nullable, schema="g int, n long, s double")
        .collect()
    }
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "4")
    try:
        got = {
            (r["g"],): (r["n"], round(r["s"], 9))
            for r in streamed_group_apply(
                df, ["g"], summarize_nullable, "g int, n long, s double",
                num_partitions=2,
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert got == want
    assert (None,) in got and got[(None,)][0] == 20


def test_fn_may_return_none_or_empty(spark, grouped_df):
    def only_even(pdf):
        g = int(pdf["g"].iloc[0])
        if g % 2:
            return None
        if g % 4 == 2:
            return pd.DataFrame({"g": [], "h": [], "n": [], "s": []})
        return _summarize(pdf)

    out = streamed_group_apply(
        grouped_df, ["g", "h"], only_even, SCHEMA
    ).collect()
    assert {r["g"] for r in out} == {0, 4, 8, 12, 16}
