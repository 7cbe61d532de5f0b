"""BM25 keyword scoring over a document column — EXT text-retrieval
operator (the lexical complement to the vector search surface; reference
retrieval is embedding-only, SURVEY §2.3).

Scale discipline: document length rides along the token explode so the
per-(doc, term) frequency aggregation needs NO join back to the corpus;
document frequencies and the (N, avgdl) corpus stats are tiny aggregates
that broadcast. Two shuffles total, both keyed on doc id (AQE can reuse
the partitioning), plus one broadcast each for df and stats — no driver
collect anywhere.

Okapi BM25 with the +1 idf smoothing (Robertson/Sparck Jones as used by
Lucene): idf = ln(1 + (N - df + 0.5)/(df + 0.5)), contribution =
idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)). The `text_bm25`
catalog oracle re-derives the identical expression in DuckDB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wagtail_vector_index_spark.functions.text_analysis import tokens_col


def bm25_scores(
    df: DataFrame,
    query_terms: Sequence[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score every document containing at least one query term.

    Returns (id_col, score) — docs matching no term are absent (their
    score is 0); callers wanting top-k apply orderBy(score desc).limit(k)
    which Catalyst plans as TakeOrderedAndProject.
    """
    terms = [t.lower() for t in query_terms]
    toks = df.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("__toks")
    ).withColumn("__dl", F.size("__toks").cast("double"))

    # corpus stats: one tiny row, broadcast-crossed onto every score row
    stats = F.broadcast(
        toks.agg(
            F.count(F.lit(1)).cast("double").alias("__n"),
            F.avg("__dl").alias("__avgdl"),
        )
    )

    # dl rides the explode -> no join back to the corpus for lengths
    tf = (
        toks.select(id_col, "__dl", F.explode("__toks").alias("__term"))
        .where(F.col("__term").isin(terms))
        .groupBy(id_col, "__dl", "__term")
        .agg(F.count(F.lit(1)).cast("double").alias("__tf"))
    )
    dfreq = F.broadcast(
        tf.groupBy("__term").agg(
            F.count(F.lit(1)).cast("double").alias("__df")
        )
    )

    contrib = (
        F.log(
            F.lit(1.0)
            + (F.col("__n") - F.col("__df") + F.lit(0.5))
            / (F.col("__df") + F.lit(0.5))
        )
        * (F.col("__tf") * F.lit(k1 + 1))
        / (
            F.col("__tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl"))
        )
    )
    return (
        tf.join(dfreq, "__term")
        .crossJoin(stats)
        .withColumn("__contrib", contrib)
        .groupBy(id_col)
        .agg(F.sum("__contrib").alias("score"))
    )


def tfidf_keywords(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    round_decimals: int = 6,
) -> DataFrame:
    """Per-document keyword extraction: the top-``k`` tokens by
    tf-idf (``tf * ln(N / df)``) — the scale path for tagging,
    faceting, and routing a 100 TB corpus without a model.

    One explode feeds both aggregates: term frequencies shuffle on
    (doc, token) with map-side combine; document frequencies derive
    from the tf frame (already one row per (doc, token), so a plain
    count on token IS the df) and shuffle on token. The tf x df join
    is token-keyed — the df side is vocabulary-sized, much smaller
    than the corpus but potentially too large to force-broadcast, so
    the strategy is left to AQE. Top-k per doc is a WindowGroupLimit
    (rank pushed before the sort), ties broken by token asc. Rounding
    pins the float product for cross-engine replay."""
    toks = docs.select(
        F.col(id_col).alias("__doc"),
        F.explode(tokens_col(F.col(text_col))).alias("__tok"),
    )
    tf = toks.groupBy("__doc", "__tok").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("__tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(
        F.count(F.lit(1)).alias("__n")
    )
    scored = (
        tf.join(df_t, "__tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "__doc",
            "__tok",
            "tf",
            F.round(
                F.col("tf") * F.log(F.col("__n") / F.col("df")),
                round_decimals,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("__doc").orderBy(
        F.col("score").desc(), F.col("__tok").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= int(k))
        .select(
            F.col("__doc").alias(id_col),
            F.col("__tok").alias("keyword"),
            "tf",
            "score",
        )
    )
