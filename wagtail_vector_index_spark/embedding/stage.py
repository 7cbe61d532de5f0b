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

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from wagtail_vector_index_spark.embedding.base import EmbeddingBackend


def embed_dataframe(
    df: DataFrame,
    *,
    backend: EmbeddingBackend,
    text_col: str = "content",
    vector_col: str = "vector",
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
        for pdf in batches:
            vectors = backend.embed_batch(pdf[text_col].fillna("").tolist())
            pdf = pdf.copy()
            pdf[vector_col] = list(vectors)
            yield pdf

    return df.mapInPandas(_embed, schema=schema)
