"""Corpus n-gram language-model scoring and perplexity bucketing (EXT).

The CCNet pipeline's defining quality split (Wenzek et al. 2019,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
Data"): score every document under a language model trained on the
corpus, then bucket the corpus into head / middle / tail by perplexity
tertiles — head feeds training, tail gets dropped or down-sampled.
CCNet uses a KenLM 5-gram; the replayable stand-in here is an
interpolated bigram model (Jelinek-Mercer smoothing,
``lambda * P(tok | prev) + (1 - lambda) * P(tok)``) — every count,
probability, and threshold is a pure function of the token stream, so
a DuckDB oracle reproduces the buckets value for value, which a KenLM
binary never could. ``text_unigram_logprob`` (queries_text.py) is the
single-token version of the same signal; the bigram interpolation adds
local word-order sensitivity — scrambled text scores like tail, not
head.

Scale shape (the part that matters at 100 TB):

- the UNIGRAM table collapses to vocabulary size under map-side
  partial aggregation and broadcasts (~1e6 rows for natural
  language);
- the BIGRAM table does NOT reliably broadcast (observed bigrams grow
  with the corpus until saturating at vocab²), so the scoring join is
  a shuffle hash join keyed on (prev, tok) — both sides partially
  aggregated / exploded to the same key, no skew beyond the Zipf head
  a hash join already handles;
- per-document scores are one map-side-combinable agg; the tertile
  thresholds are a 1-row percentile agg broadcast back, with the
  doc-grain score frame lazily localCheckpointed so the
  threshold pass and the bucket pass share one materialization
  instead of re-running the scoring joins.

Determinism pins: per-document mean log-probability is rounded to 4 dp
(transcendental summands — engine summation order cannot land on a
rounding boundary), and the tertile thresholds interpolate between
rounded scores with the same ``lo + frac * (hi - lo)`` formula in both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wagtail_vector_index_spark.functions.text_analysis import tokens_col


def bigram_lm_scores(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.7,
    round_decimals: int = 4,
) -> DataFrame:
    """Per-document mean log-probability under the corpus-trained
    interpolated bigram model. Returns (``id_col``, ``n_bigrams``,
    ``logprob``); documents with fewer than two tokens have no bigram
    and are excluded (CCNet drops them as unscorable).

    ``P(tok | prev) = c(prev, tok) / c(prev)`` with ``c(prev)`` the
    corpus unigram count, interpolated with the unigram
    ``P(tok) = c(tok) / N`` at weight ``lam``.
    """
    lam = float(lam)
    toks = df.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("__tk")
    )
    uni = (
        toks.select(F.explode("__tk").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    total = uni.agg(F.sum("__c").alias("__n"))
    pairs = toks.where(F.size("__tk") >= 2).select(
        id_col,
        F.explode(
            F.arrays_zip(
                F.slice(F.col("__tk"), 1, F.size("__tk") - 1).alias("prev"),
                F.slice(F.col("__tk"), 2, F.size("__tk") - 1).alias("tok"),
            )
        ).alias("__bg"),
    ).select(id_col, F.col("__bg.prev").alias("prev"), F.col("__bg.tok").alias("tok"))
    bi = pairs.groupBy("prev", "tok").agg(F.count(F.lit(1)).alias("__cb"))
    cprev = uni.select(F.col("tok").alias("prev"), F.col("__c").alias("__cp"))
    ctok = uni.select("tok", F.col("__c").alias("__ct"))
    p = (
        F.lit(lam) * (F.col("__cb") / F.col("__cp"))
        + F.lit(1.0 - lam) * (F.col("__ct") / F.col("__n"))
    )
    return (
        pairs.join(bi, ["prev", "tok"])
        .join(F.broadcast(cprev), "prev")
        .join(F.broadcast(ctok), "tok")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(F.log(p)), int(round_decimals)).alias("logprob"),
        )
    )


def collocations_pmi(
    df: DataFrame,
    *,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 20,
    round_decimals: int = 6,
) -> DataFrame:
    """Top-k word collocations by pointwise mutual information (Church
    & Hanks 1990) — the classic phrase-discovery signal ("new york",
    "machine learning") a tokenizer-training or phrase-merging pipeline
    runs before building its vocab. Returns (``prev``, ``tok``,
    ``pair_freq``, ``pmi``) for the ``k`` highest-PMI adjacent bigrams
    with ``pair_freq >= min_count`` (the standard guard against the
    1/c(a)c(b) noise of rare pairs).

    ``pmi = ln( P(a,b) / (P(a) P(b)) )`` computed as the single
    left-associated expression ``ln(cb*Nu*Nu / (Nb*ca*cb2))`` so an
    external oracle writing the same expression text performs the
    identical IEEE operation sequence — the ln of a ratio of integer
    products is then bit-identical across engines and the
    ``round_decimals`` pin is belt-and-braces, not load-bearing.

    Scale shape: bigram/unigram tables collapse under map-side partial
    agg (bounded by observed-bigram count, not corpus size); the
    unigram side broadcasts twice (vocab-sized); the totals are 1-row
    broadcast scalars; top-k is a TakeOrdered, never a global sort.
    """
    toks = df.select(tokens_col(F.col(text_col)).alias("__tk"))
    uni = (
        toks.select(F.explode("__tk").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    nu = uni.agg(F.sum("__c").cast("double").alias("__nu"))
    pairs = toks.where(F.size("__tk") >= 2).select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("__tk"), 1, F.size("__tk") - 1).alias("prev"),
                F.slice(F.col("__tk"), 2, F.size("__tk") - 1).alias("tok"),
            )
        ).alias("__bg")
    ).select(F.col("__bg.prev").alias("prev"), F.col("__bg.tok").alias("tok"))
    bi = pairs.groupBy("prev", "tok").agg(F.count(F.lit(1)).alias("pair_freq"))
    nb = bi.agg(F.sum("pair_freq").cast("double").alias("__nb"))
    ca = uni.select(F.col("tok").alias("prev"), F.col("__c").alias("__ca"))
    cb2 = uni.select("tok", F.col("__c").alias("__cb2"))
    pmi = F.log(
        F.col("pair_freq").cast("double") * F.col("__nu") * F.col("__nu")
        / (
            F.col("__nb")
            * F.col("__ca").cast("double")
            * F.col("__cb2").cast("double")
        )
    )
    return (
        bi.where(F.col("pair_freq") >= int(min_count))
        .join(F.broadcast(ca), "prev")
        .join(F.broadcast(cb2), "tok")
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nb))
        .select(
            "prev",
            "tok",
            "pair_freq",
            F.round(pmi, int(round_decimals)).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), F.col("prev").asc(), F.col("tok").asc())
        .limit(int(k))
    )


def perplexity_buckets(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.7,
    round_decimals: int = 4,
) -> DataFrame:
    """CCNet head/middle/tail split: bucket documents by corpus-wide
    tertiles of the bigram-LM score (HIGHER logprob = LOWER perplexity
    = head). Returns one row per bucket: (``bucket``, ``n_docs``,
    ``avg_logprob``) — the corpus-curation dashboard grain; join the
    per-document frame from :func:`bigram_lm_scores` against the same
    thresholds to materialize assignments."""
    scores = bigram_lm_scores(
        df,
        id_col=id_col,
        text_col=text_col,
        lam=lam,
        round_decimals=round_decimals,
    ).localCheckpoint(eager=False)
    # thresholds are rounded onto the SAME grid as the scores before
    # comparing: interpolated tertiles of 4dp-grid scores sit at least
    # grid/6 from any rounding boundary (frac in {1/3, 2/3} times a
    # grid-multiple gap never lands on a half-grid point), so the
    # rounded thresholds are bit-identical across engines and the `>`
    # comparisons against grid scores cannot flip. The per-bucket
    # aggregate is round(SUM) rather than round(AVG): a sum of
    # grid-rounded values stays on the grid (never near a rounding
    # boundary), while dividing by the bucket count can land the true
    # average exactly on one.
    rd = int(round_decimals)
    th = scores.agg(
        F.round(F.percentile(F.col("logprob"), F.lit(1 / 3)), rd).alias("__t1"),
        F.round(F.percentile(F.col("logprob"), F.lit(2 / 3)), rd).alias("__t2"),
    )
    bucket = (
        F.when(F.col("logprob") > F.col("__t2"), F.lit("head"))
        .when(F.col("logprob") > F.col("__t1"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        scores.crossJoin(F.broadcast(th))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.sum("logprob"), rd).alias("sum_logprob"),
        )
    )
