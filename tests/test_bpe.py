"""BPE merge learning: classic fold semantics + inference twin."""

import pytest
from pyspark.sql import functions as F

from wagtail_vector_index_spark.operators.bpe import (
    bpe_segment_col,
    learn_bpe_merges,
)


def test_learn_bpe_merges_classic_example(spark):
    """'low lower lowest' family: the first merges must assemble the
    shared stem, counts weighted by word frequency."""
    docs = spark.createDataFrame(
        [(1, " ".join(["low"] * 5 + ["lower"] * 2 + ["lowest"] * 1))],
        "doc_id long, text string",
    )
    merges = learn_bpe_merges(docs, num_merges=3)
    assert [m[0] for m in merges] == [1, 2, 3]
    # (l, o) and (lo, w) appear in every word: counts 8 then 8
    assert (merges[0][1], merges[0][2]) == ("l", "o")
    assert merges[0][3] == 8
    assert (merges[1][1], merges[1][2]) == ("lo", "w")
    assert merges[1][3] == 8


def test_apply_merge_adjacent_repeats_fold_semantics(spark):
    """'aaaa' under merge (a,a) must become [aa, aa] (left-to-right
    non-overlapping — the fixpoint replace must equal the classic
    fold, including the consumed-delimiter corner)."""
    df = spark.createDataFrame([("aaaa",), ("aaa",), ("a",)], "w string")
    segs = {
        r["w"]: r["t"]
        for r in df.select(
            "w",
            bpe_segment_col(F.col("w"), [(1, "a", "a", 0)]).alias("t"),
        ).collect()
    }
    assert segs["aaaa"] == ["aa", "aa"]
    assert segs["aaa"] == ["aa", "a"]
    assert segs["a"] == ["a"]


def test_bpe_segment_col_roundtrip(spark):
    """Segmenting with the learned merges reproduces each word when
    re-joined, and the shared stem becomes one token."""
    docs = spark.createDataFrame(
        [(1, " ".join(["low"] * 5 + ["lower"] * 2))],
        "doc_id long, text string",
    )
    merges = learn_bpe_merges(docs, num_merges=2)  # (l,o) then (lo,w)
    df = spark.createDataFrame([("low",), ("lower",), ("slow",)], "w string")
    segs = {
        r["w"]: r["t"]
        for r in df.select(
            "w", bpe_segment_col(F.col("w"), merges).alias("t")
        ).collect()
    }
    assert segs["low"] == ["low"]
    assert segs["lower"] == ["low", "e", "r"]
    assert segs["slow"] == ["s", "low"]
    for w, t in segs.items():
        assert "".join(t) == w
