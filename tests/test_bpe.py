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
    """Runs of a self-merged symbol must follow the classic
    left-to-right fold — including length >= 5, where the naive
    space-delimited fixpoint replace diverges (the consumed-delimiter
    corner the sentinel representation exists to fix)."""
    words = ["a", "aa", "aaa", "aaaa", "aaaaa", "aaaaaa", "aaaaaaa", "baaaaa"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    segs = {
        r["w"]: r["t"]
        for r in df.select(
            "w",
            bpe_segment_col(F.col("w"), [(1, "a", "a", 0)]).alias("t"),
        ).collect()
    }

    def fold(syms):
        acc = []
        for s in syms:
            if acc and acc[-1] == "a" and s == "a":
                acc[-1] = "aa"
            else:
                acc.append(s)
        return acc

    for w in words:
        assert segs[w] == fold(list(w)), w
    assert segs["aaaaa"] == ["aa", "aa", "a"]  # the >=5 corner explicitly


def test_bpe_fold_parity_random(spark):
    """Differential: bpe_segment_col under a random merge sequence
    equals the classic Python fold applied merge-by-merge."""
    import random

    rng = random.Random(7)
    words = [
        "".join(rng.choice("ab") for _ in range(rng.randint(1, 12)))
        for _ in range(60)
    ]
    merges = [(1, "a", "a", 0), (2, "b", "b", 0), (3, "aa", "b", 0),
              (4, "a", "bb", 0)]
    df = spark.createDataFrame([(w,) for w in set(words)], "w string")
    segs = {
        r["w"]: r["t"]
        for r in df.select(
            "w", bpe_segment_col(F.col("w"), merges).alias("t")
        ).collect()
    }

    def fold(syms, a, b):
        acc = []
        for s in syms:
            if acc and acc[-1] == a and s == b:
                acc[-1] = a + b
            else:
                acc.append(s)
        return acc

    for w in set(words):
        expect = list(w)
        for _r, a, b, _c in merges:
            expect = fold(expect, a, b)
        assert segs[w] == expect, w


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
