"""The distributed embed stage: text column -> vector column.

Reference semantics: one batched ``embed()`` call per window of objects
(src/wagtail_vector_index/storage/django.py:351-360, batch_size=100 at
django.py:394). In Spark the batching is Arrow's: ``mapInPandas`` hands each
worker an iterator of record batches (sized by
``spark.sql.execution.arrow.maxRecordsPerBatch``) and the backend embeds one
batch per call — same external-call batching shape, but parallel across
executors and with no driver-side loop.
"""

from __future__ import annotations

import random
import time
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from wagtail_vector_index_spark.embedding.base import EmbeddingBackend


def _embed_with_retries(
    backend: EmbeddingBackend,
    texts: list[str],
    *,
    max_retries: int,
    backoff_base_s: float,
    rng: random.Random,
    sleep=time.sleep,
):
    """One embedding request with bounded retries and full-jitter
    exponential backoff (the standard client discipline for a rate-limited
    external service: jitter decorrelates the retry storms of hundreds of
    workers hitting the same 429 window). Raises the last error after
    ``max_retries`` failed attempts — at that point the Spark task retry
    takes over, which is the right escalation for a persistent outage."""
    attempt = 0
    while True:
        try:
            return backend.embed_batch(texts)
        except Exception:
            if attempt >= max_retries:
                raise
            sleep(rng.uniform(0.0, backoff_base_s * (2.0**attempt)))
            attempt += 1


def embed_dataframe(
    df: DataFrame,
    *,
    backend: EmbeddingBackend,
    text_col: str = "content",
    vector_col: str = "vector",
    request_batch_size: int | None = None,
    max_retries: int = 4,
    backoff_base_s: float = 0.5,
) -> DataFrame:
    """Append ``vector_col`` (array<double>) by embedding ``text_col``.

    The backend is pickled to the workers; each Arrow batch becomes one
    ``embed_batch`` call. Column pruning still applies upstream — only the
    columns of ``df`` are shipped.

    Fast path: a backend may provide ``as_column(text: Column) -> Column``
    (a Catalyst twin of its embedding math — e.g. the hash embedder, or
    any deterministic featurizer). When it returns a Column, the stage is
    pure JVM expressions: no Arrow round-trip, no Python workers, column
    pruning and whole-stage codegen see straight through it. External-model
    backends return ``None`` (or omit the hook) and take the Arrow path.

    External-service discipline on the Arrow path (reference batches 100
    objects per embed() call, django.py:394; real APIs also rate-limit):
    ``request_batch_size`` splits each Arrow batch into bounded requests
    (None = one request per Arrow batch, sized by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``); transient request
    failures retry up to ``max_retries`` times with full-jitter
    exponential backoff from ``backoff_base_s`` before the error
    propagates to Spark's task retry. Rows are emitted only after their
    request succeeds, so output stays exactly-once per input row.
    """
    from pyspark.sql import functions as F

    as_column = getattr(backend, "as_column", None)
    if callable(as_column):
        expr = as_column(F.col(text_col))
        if expr is not None:
            return df.withColumn(vector_col, expr)

    from wagtail_vector_index_spark._workerenv import ensure_worker_imports

    ensure_worker_imports(df)
    schema = T.StructType(
        df.schema.fields
        + [T.StructField(vector_col, T.ArrayType(T.DoubleType()), False)]
    )

    def _embed(batches: Iterator) -> Iterator:
        rng = random.Random()
        for pdf in batches:
            texts = pdf[text_col].fillna("").tolist()
            vectors: list = []
            step = request_batch_size or max(len(texts), 1)
            for lo in range(0, len(texts), step):
                vectors.extend(
                    _embed_with_retries(
                        backend,
                        texts[lo : lo + step],
                        max_retries=max_retries,
                        backoff_base_s=backoff_base_s,
                        rng=rng,
                    )
                )
            pdf = pdf.copy()
            pdf[vector_col] = vectors
            yield pdf

    return df.mapInPandas(_embed, schema=schema)
