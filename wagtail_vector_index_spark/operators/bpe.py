"""Distributed BPE merge learning (Sennrich et al. 2016, arXiv:1508.07909).

Learn the top-N byte-pair-encoding merges over a corpus — the
tokenizer-training step of an LLM data pipeline — as DataFrame rounds:

1. vocabulary: (word, count) — classic BPE trains on word frequencies,
   so the working set collapses from the corpus to its vocabulary.
2. per round: count adjacent symbol pairs weighted by word count (an
   explode + sum — map-side combinable), pick the argmax pair (ties ->
   lexicographically smallest; ONE driver-side row per round, the same
   class as a k-means centroid collect), and merge it everywhere.

Every count is an integer sum — no float order-dependence — so the
whole training is exactly replayable by a chained-CTE oracle. The merge
*application* is the one subtle step: classic BPE merges left-to-right
non-overlapping occurrences (Sennrich's reference uses a lookbehind
regex, which RE2/DuckDB lacks). Both engines therefore hold the symbol
sequence as a SENTINEL-PREFIXED string — ``\\x01sym␣`` per symbol — on
which ONE plain ``replace('\\x01a \\x01b ', '\\x01ab ')`` pass equals
the classic fold exactly: every match starts at a sentinel (symbols
contain neither the sentinel nor spaces, so no mid-symbol or partial-
symbol match is possible) and consumes both symbols *with their
trailing delimiters*, so the scan resumes at the next symbol — the
fold's "continue from i+2" — even across runs of a self-merged symbol
(verified exhaustively against the fold in tests/test_bpe.py; the naive
space-delimited form diverges there by consuming the shared delimiter).
Parity between Spark and the oracle is structural: both evaluate the
identical construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Symbol prefix sentinel. Symbols (characters of whitespace-split words,
# and their concatenations) must not contain it — enforced by a
# vocabulary filter — nor spaces (guaranteed: words are split on \s+).
SENTINEL = "\x01"


def _delimited(word: Column) -> Column:
    """word -> '\\x01w \\x01o \\x01r \\x01d ' (sentinel-prefixed,
    space-suffixed characters)."""
    return F.regexp_replace(word, "(.)", SENTINEL + "$1 ")


def _apply_merge(sym_str: Column, a: str, b: str) -> Column:
    """ONE replace pass == the classic left-to-right fold (module doc)."""
    return F.replace(
        sym_str,
        F.lit(f"{SENTINEL}{a} {SENTINEL}{b} "),
        F.lit(f"{SENTINEL}{a}{b} "),
    )


def _symbols(sym_str: Column) -> Column:
    """Delimited string -> array<string> of symbols (sentinel stripped)."""
    return F.transform(
        F.filter(F.split(sym_str, " "), lambda s: s != ""),
        lambda s: F.substring(s, 2, 1_000_000),
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(a, b, cnt): adjacent-symbol pair frequencies over the delimited
    vocabulary, weighted by word count."""
    syms = _symbols(F.col("syms"))
    # guard: Spark's sequence(1, 0) DESCENDS, so single-symbol words
    # must short-circuit to an empty pair list
    pairs = F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda j: F.struct(
                F.element_at(syms, j).alias("a"),
                F.element_at(syms, j + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    return (
        vocab.select(F.explode(pairs).alias("p"), "n")
        .groupBy("p.a", "p.b")
        .agg(F.sum("n").alias("cnt"))
    )


def learn_bpe_merges(
    df: DataFrame,
    *,
    text_col: str = "text",
    num_merges: int = 10,
) -> list[tuple[int, str, str, int]]:
    """Learn ``num_merges`` BPE merges over the corpus; returns
    [(rank, left, right, pair_count), ...] in merge order. The corpus
    collapses to its (word, count) vocabulary first, so each round's
    work is O(vocab), not O(corpus). Words containing the sentinel
    character are excluded (they would break symbol-boundary matching;
    natural-language corpora never contain \\x01)."""
    from wagtail_vector_index_spark.functions.text_analysis import tokens_col

    vocab = (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("w"))
        .where(~F.col("w").contains(SENTINEL))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(_delimited(F.col("w")).alias("syms"), "n")
        .cache()
    )
    merges: list[tuple[int, str, str, int]] = []
    cached = [vocab]
    try:
        for rank in range(1, int(num_merges) + 1):
            top = (
                _pair_counts(vocab)
                .orderBy(
                    F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc()
                )
                .limit(1)
                .collect()  # this action also materializes vocab's cache
            )
            # the previous round's cache is no longer needed once the
            # current one is materialized — unpersist to keep exactly
            # two frames pinned instead of accumulating one per round
            if len(cached) >= 2:
                cached.pop(0).unpersist()
            if not top or top[0]["cnt"] is None:
                break
            a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
            merges.append((rank, a, b, cnt))
            vocab = vocab.select(
                _apply_merge(F.col("syms"), a, b).alias("syms"), "n"
            ).cache()
            cached.append(vocab)
        return merges
    finally:
        for frame in cached:
            frame.unpersist()


def bpe_segment_col(word: Column, merges: list[tuple[int, str, str, int]]) -> Column:
    """Apply a learned merge list to a word column -> array<string> of
    BPE tokens (the inference-side twin of the training fold)."""
    s = _delimited(word)
    for _rank, a, b, _cnt in merges:
        s = _apply_merge(s, a, b)
    return _symbols(s)
