"""wagtail_vector_index_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of wagtail/wagtail-vector-index.

The reference (/root/reference, read-only) is a Django library that chunks
application objects, embeds the chunks, stores them in a pluggable vector
store, and answers RAG / semantic-search / find-similar queries. This
package re-expresses that dataflow — plus the LLM-data-pipeline operators a
100 TB training-data pipeline needs (dedup, similarity search, multimodal
columns, text analysis) — as idiomatic Spark DataFrame/SQL programs.

Layout:
    functions/   column-level building blocks (text splitting, vector math,
                 text analysis) — all JVM-side expressions where possible
    embedding/   pluggable embedding backends + the Arrow-batched embed stage
    chat/        pluggable chat backends (echo/deterministic for tests)
    operators/   k-NN top-k, similarity join, dedup family, fetch-back join
    sources/     document-store read/write (parquet-backed upsert/delete/
                 clear/rebuild; Delta-style semantics on plain parquet)
    plans/       the indexing pipeline (chunk → staleness → embed → write)
    streaming/   incremental index maintenance via Structured Streaming
    index.py     the VectorIndex user API (search / find_similar / query)
"""

__version__ = "0.1.0"

from wagtail_vector_index_spark.config import (
    EMBEDDING_DIMENSIONS,
    TOKEN_LIMITS,
    ChatConfig,
    EmbeddingConfig,
    IndexConfig,
)

__all__ = [
    "EMBEDDING_DIMENSIONS",
    "TOKEN_LIMITS",
    "ChatConfig",
    "Corpus",
    "DocumentStore",
    "EmbeddingConfig",
    "EventLog",
    "IndexConfig",
    "ManifestLog",
    "QueryResponse",
    "VectorIndex",
    "__version__",
]


def __getattr__(name):
    # lazy: importing the package shouldn't require a SparkSession-capable
    # environment just to read config constants
    if name in ("VectorIndex", "QueryResponse"):
        from wagtail_vector_index_spark import index

        return getattr(index, name)
    if name == "DocumentStore":
        from wagtail_vector_index_spark.sources.tables import DocumentStore

        return DocumentStore
    if name == "ManifestLog":
        from wagtail_vector_index_spark.sources.manifest import ManifestLog

        return ManifestLog
    if name == "Corpus":
        from wagtail_vector_index_spark.operators.corpus import Corpus

        return Corpus
    if name == "EventLog":
        from wagtail_vector_index_spark.operators.events import EventLog

        return EventLog
    raise AttributeError(name)
