"""Feature-hashing term-frequency embedder (the "hashing trick",
Weinberger et al. 2009): token -> sha-derived bucket, vector = bucket
counts.

Unlike :class:`~wagtail_vector_index_spark.embedding.hash_backend.
HashEmbeddingBackend` (a deterministic test double whose vectors carry no
semantics), this is a real lexical embedding: documents sharing tokens
have correlated vectors, so cosine top-k gives term-overlap retrieval
with no external model and no vocabulary build — the cheap first-tier
embedding a 100 TB pipeline can afford on every document.

Vectors are raw counts (float64), NOT l2-normalized: cosine is
scale-invariant, and skipping the norm keeps the JVM column twin exact
(normalizing inside one Column expression would re-evaluate the O(k*n)
count construction per element — no common-subexpression elimination
inside HOF lambdas).

Bucketing is sha256-based (functions/text_analysis.sha_hash64), so the
DuckDB oracle reproduces the vectors bit for bit.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

# ASCII whitespace only (re.ASCII \s == Java regex \s == [ \t\n\r\f\v]):
# the Python path must tokenize exactly like the JVM twin's tokens_col
# (split on \s+), or the two paths diverge on Unicode whitespace like
#   — str.split() would split there, Java \s+ does not.
_TOKEN_SPLIT = re.compile(r"\s+", re.ASCII)


class FeatureHashEmbeddingBackend:
    model_id = "feature-hash-tf"
    token_limit = 1 << 20

    def __init__(self, dimensions: int = 64):
        self.dimensions = dimensions

    def _bucket(self, token: str) -> int:
        h = hashlib.sha256(token.encode("utf-8")).hexdigest()
        return int(h[:8], 16) % self.dimensions

    def embed_one(self, text: str) -> np.ndarray:
        out = np.zeros(self.dimensions, dtype=np.float64)
        for tok in _TOKEN_SPLIT.split(text.lower()):
            if tok:
                out[self._bucket(tok)] += 1.0
        return out

    def embed_batch(self, texts: list[str]) -> np.ndarray:
        if not texts:
            return np.empty((0, self.dimensions), dtype=np.float64)
        return np.stack([self.embed_one(t) for t in texts])

    def as_column(self, text):
        """Catalyst twin of :meth:`embed_one` — exact (counts are ints;
        float64 holds them exactly). Buckets are computed once per token
        in their own ``transform`` pass; the k-bucket histogram is then
        one O(k*n) filter-count per dimension, all inside whole-stage
        codegen. Subclasses overriding ``embed_batch`` must override this
        too (returns None automatically, forcing the Arrow path)."""
        from pyspark.sql import functions as F

        from wagtail_vector_index_spark.functions.text_analysis import (
            sha_hash64,
            tokens_col,
        )

        # any overridden embedding method invalidates the twin —
        # embed_batch delegates to embed_one which delegates to _bucket,
        # so a subclass may override any of the three
        cls = FeatureHashEmbeddingBackend
        if (
            type(self).embed_batch is not cls.embed_batch
            or type(self).embed_one is not cls.embed_one
            or type(self)._bucket is not cls._bucket
        ):
            return None
        k = self.dimensions
        toks = tokens_col(F.coalesce(text, F.lit("")))
        # one sha per token (aggregate evaluates its input exactly once —
        # counting per-dimension with filter(buckets, ...) instead would
        # re-evaluate the sha pass per dimension, the HOF-CSE trap)
        buckets = F.transform(toks, lambda t: F.pmod(sha_hash64(t), F.lit(k)))
        positions = F.sequence(F.lit(0), F.lit(k - 1))  # foldable literal
        return F.aggregate(
            buckets,
            F.array_repeat(F.lit(0.0), k),
            lambda acc, b: F.zip_with(
                acc,
                positions,
                lambda x, i: x + F.when(i == b, F.lit(1.0)).otherwise(F.lit(0.0)),
            ),
        )
