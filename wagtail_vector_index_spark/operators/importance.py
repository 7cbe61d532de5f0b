"""DSIR-style importance selection (Xie et al. 2023, arXiv:2302.03169,
"Data Selection for Language Models via Importance Resampling").

Select raw-corpus documents that look like a small target corpus:
hashed-unigram bucket distributions are fit for target (p) and raw (q)
with Laplace smoothing, each document scores
``log w(d) = sum_tokens (ln p[bucket(tok)] - ln q[bucket(tok)])``, and
the top fraction by weight is kept (deterministic rank selection — the
paper's Gumbel resampling swaps in trivially where nondeterminism is
acceptable; rank selection keeps the oracle exact).

Scale shape: both bucket distributions are B-row aggregates
(map-side-combinable counts over the token explode); their log-ratio
table broadcasts to every executor; the per-document score is one more
map-side-combinable sum; selection is a rank over (score, id). Nothing
quadratic, nothing driver-side, two narrow shuffles (bucket agg + doc
agg) + one for the rank. Bucketing is sha256-based
(functions/text_analysis.sha_hash64), so the DuckDB oracle reproduces
every hash bit for bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wagtail_vector_index_spark.functions.text_analysis import (
    sha_hash64,
    tokens_col,
)


def _bucket_counts(
    df: DataFrame, *, text_col: str, buckets: int
) -> DataFrame:
    toks = df.select(
        F.explode(tokens_col(F.col(text_col))).alias("__tok")
    )
    return toks.select(
        F.pmod(sha_hash64(F.col("__tok")), F.lit(buckets)).alias("bucket")
    ).groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 256,
    keep_fraction: float = 0.2,
) -> DataFrame:
    """Rows of ``raw`` whose hashed-ngram distribution best matches
    ``target``, as (id_col, log_w): the top ``keep_fraction`` by
    importance weight (ties -> lowest id). Raw docs with zero tokens
    score 0 (an empty sum) and compete at that weight."""
    b = int(buckets)
    tc = _bucket_counts(target, text_col=text_col, buckets=b)
    # r12: ONE tokenize+hash pass over ``raw``. The per-doc bucket
    # histogram (id, bucket, cnt) — at most ``b`` rows per document,
    # three narrow columns — feeds BOTH the corpus-level bucket counts
    # (for the weight table) and the per-doc scores; the old shape ran
    # the explode + sha per token twice (_bucket_counts(raw) AND
    # doc_tokens). Lazily materialized because its two consumers prune
    # different columns, which defeats exchange reuse.
    dh = (
        raw.select(
            F.col(id_col),
            F.explode(tokens_col(F.col(text_col))).alias("__tok"),
        )
        .select(
            id_col,
            F.pmod(sha_hash64(F.col("__tok")), F.lit(b)).alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .localCheckpoint(eager=False)
    )
    rc = dh.groupBy("bucket").agg(F.sum("__cnt").alias("n"))
    totals = tc.agg(F.sum("n").alias("tt")).crossJoin(
        rc.agg(F.sum("n").alias("tr"))
    )
    # log((tc+1)/(Tt+B)) - log((rc+1)/(Tr+B)) per bucket, <= B rows
    weights = (
        tc.withColumnRenamed("n", "tn")
        .join(rc.withColumnRenamed("n", "rn"), "bucket", "full_outer")
        .na.fill({"tn": 0, "rn": 0})
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.log((F.col("tn") + 1) / (F.col("tt") + F.lit(b)))
                - F.log((F.col("rn") + 1) / (F.col("tr") + F.lit(b)))
            ).alias("w"),
        )
    )
    # per-doc score from the histogram: sum of cnt * w — the same sum
    # the oracle computes per token, grouped; the join probe is
    # (doc x distinct-bucket)-grain instead of token-grain
    scores = (
        dh.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("__cnt") * F.col("w")).alias("log_w"))
    )
    # docs with no tokens score 0
    scores = (
        raw.select(id_col)
        .join(scores, id_col, "left")
        .na.fill({"log_w": 0.0})
    )
    # Selection as orderBy().limit(k): for k under
    # spark.sql.execution.topKSortFallbackThreshold Catalyst plans
    # TakeOrdered (per-partition partial top-k); beyond it, a
    # DISTRIBUTED range-partitioned sort + GlobalLimit — both scale out,
    # unlike the unpartitioned row_number window this replaced, which
    # funneled every score through ONE task. The limit needs a literal,
    # so the raw count is the one driver-side scalar this operator reads
    # (an eager job at call time, same class as a codebook collect).
    import math

    n_raw = raw.count()
    k_keep = int(math.ceil(n_raw * float(keep_fraction)))
    return (
        scores.orderBy(F.col("log_w").desc(), F.col(id_col).asc())
        .limit(k_keep)
        .select(id_col, "log_w")
    )
