"""Interpolated bigram LM scoring + CCNet perplexity buckets
(operators/lm.py)."""

from pyspark.sql import functions as F

from wagtail_vector_index_spark.operators.lm import (
    bigram_lm_scores,
    perplexity_buckets,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bigram_scores_are_order_sensitive(spark):
    """The whole point over the unigram signal: a document whose word
    ORDER follows the corpus scores higher than the same bag of words
    scrambled (identical unigram distribution)."""
    base = "the cat sat on the mat and the dog sat on the rug"
    rows = [(i, base) for i in range(10)] + [
        (100, "the cat sat on the mat and the dog sat on the rug"),
        (101, "rug the on and mat sat the dog the cat on sat the"),
    ]
    out = {
        r["doc_id"]: r["logprob"]
        for r in bigram_lm_scores(_docs(spark, rows)).collect()
    }
    assert out[100] > out[101]


def test_bigram_scores_exclude_sub_bigram_docs(spark):
    rows = [(1, "hello world again"), (2, "solo"), (3, "")]
    out = bigram_lm_scores(_docs(spark, rows)).collect()
    assert {r["doc_id"] for r in out} == {1}
    assert out[0]["n_bigrams"] == 2


def test_bigram_score_value_closed_form(spark):
    """One two-doc corpus small enough to hand-compute: every count,
    interpolation, and log checked against the closed form."""
    import math

    rows = [(1, "a b"), (2, "a b")]
    out = bigram_lm_scores(_docs(spark, rows), lam=0.5).collect()
    # counts: c(a)=2, c(b)=2, N=4, c(a,b)=2
    # p = 0.5 * (2/2) + 0.5 * (2/4) = 0.75 for the single bigram
    want = round(math.log(0.75), 4)
    assert {r["logprob"] for r in out} == {want}
    assert all(r["n_bigrams"] == 1 for r in out)


def test_perplexity_buckets_partition_the_corpus(spark):
    """head/middle/tail cover every scorable doc exactly once, and the
    bucket sums order correctly (head holds the highest scores)."""
    import random

    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(30)]
    # random draws of varying length: a near-continuous score
    # distribution, so all three tertile buckets are nonempty
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(8, 24))))
        for i in range(40)
    ]
    df = _docs(spark, rows)
    buckets = {
        r["bucket"]: r for r in perplexity_buckets(df).collect()
    }
    assert set(buckets) <= {"head", "middle", "tail"}
    assert sum(r["n_docs"] for r in buckets.values()) == 40
    # head must be nonempty and hold the highest mean score of any
    # nonempty bucket (ties can legitimately empty middle or tail)
    assert buckets["head"]["n_docs"] >= 1
    head_mean = buckets["head"]["sum_logprob"] / buckets["head"]["n_docs"]
    for name, r in buckets.items():
        assert head_mean >= r["sum_logprob"] / r["n_docs"] - 1e-9, name


def test_unigram_table_broadcasts_and_bigram_join_shuffles(spark):
    """Plan contract: the vocabulary joins broadcast; nothing turns the
    scoring pass into a cartesian product."""
    rows = [(i, "a b c d e f g h") for i in range(50)]
    plan = (
        bigram_lm_scores(_docs(spark, rows))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_collocations_pmi_hand_computed(spark):
    """PMI on a corpus tiny enough to verify by hand: 'x y' always
    co-occurs (high PMI), 'a b' is one of many pairings of frequent
    singles (low PMI); min_count drops rare pairs; ties rank by
    (prev, tok)."""
    import math

    from wagtail_vector_index_spark.operators.lm import collocations_pmi

    # 6 docs of "x y" (x,y appear ONLY together) + filler where a..d mix
    rows = [(i, "x y") for i in range(6)] + [
        (10, "a b a c a d"),
        (11, "b a c a d a"),
        (12, "a b c d a b"),
    ]
    df = _docs(spark, rows)
    out = collocations_pmi(df, min_count=2, k=5).collect()
    got = {(r["prev"], r["tok"]): r for r in out}
    # corpus: Nu = 12 + 18 = 30 tokens; Nb = 6 + 15 = 21 bigrams
    # c(x)=c(y)=6, c(x,y)=6 -> pmi = ln(6*30*30/(21*6*6))
    assert ("x", "y") in got
    expect = round(math.log((6 * 30.0 * 30.0) / (21.0 * 6.0 * 6.0)), 6)
    assert got[("x", "y")]["pmi"] == expect
    assert got[("x", "y")]["pair_freq"] == 6
    # every returned pair clears min_count and the list is PMI-sorted
    assert all(r["pair_freq"] >= 2 for r in out)
    pmis = [r["pmi"] for r in out]
    assert pmis == sorted(pmis, reverse=True)
    # (x,y) has the maximal PMI (exclusive co-occurrence)
    assert out[0]["prev"] == "x" and out[0]["tok"] == "y"
