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
*application* is the one subtle step: classic BPE replaces left-to-right
non-overlapping occurrences, which a single SQL ``replace()`` pass gets
wrong for immediately-adjacent repeats (the consumed delimiter problem).
Both engines therefore apply the SAME fixpoint construction — the
symbols held as a space-delimited string and ``replace(' a b ', ' ab ')``
nested a fixed number of times — which converges to the classic
left-to-right fold (each pass merges the leftmost remaining occurrence
chain; symbols never contain spaces, so matches can't cross symbol
boundaries). Parity between Spark and the oracle is structural: both
evaluate the identical expression tree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Fixed replace-chain depth: one pass merges at least the leftmost of
# each run of adjacent occurrences, so depth d handles runs up to ~2^d
# pattern repeats — far beyond any natural word at depth 12.
REPLACE_DEPTH = 12


def _delimited(word: Column) -> Column:
    """word -> ' w o r d ' (space-delimited characters, outer guards)."""
    return F.concat(F.regexp_replace(word, "(.)", " $1"), F.lit(" "))


def _apply_merge(sym_str: Column, a: str, b: str) -> Column:
    """Nested fixpoint replace of ' a b ' -> ' ab ' (see module doc)."""
    pat = F.lit(f" {a} {b} ")
    rep = F.lit(f" {a}{b} ")
    out = sym_str
    for _ in range(REPLACE_DEPTH):
        out = F.replace(out, pat, rep)
    return out


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(a, b, cnt): adjacent-symbol pair frequencies over the delimited
    vocabulary, weighted by word count."""
    syms = F.filter(F.split(F.col("syms"), " "), lambda s: s != "")
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
    work is O(vocab), not O(corpus)."""
    from wagtail_vector_index_spark.functions.text_analysis import tokens_col

    vocab = (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(_delimited(F.col("w")).alias("syms"), "n")
        .cache()  # 10 rounds re-read the (small) vocabulary
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, int(num_merges) + 1):
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] is None:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append((rank, a, b, cnt))
        vocab = vocab.select(
            _apply_merge(F.col("syms"), a, b).alias("syms"), "n"
        ).cache()
    return merges


def bpe_segment_col(word: Column, merges: list[tuple[int, str, str, int]]) -> Column:
    """Apply a learned merge list to a word column -> array<string> of
    BPE tokens (the inference-side twin of the training fold)."""
    s = _delimited(word)
    for _rank, a, b, _cnt in merges:
        s = _apply_merge(s, a, b)
    return F.filter(F.split(s, " "), lambda x: x != "")
