from wagtail_vector_index_spark.embedding.base import (
    EmbeddingBackend,
    get_embedding_backend,
    register_embedding_backend,
)
from wagtail_vector_index_spark.embedding.hash_backend import HashEmbeddingBackend
from wagtail_vector_index_spark.embedding.stage import embed_dataframe

__all__ = [
    "EmbeddingBackend",
    "HashEmbeddingBackend",
    "embed_dataframe",
    "get_embedding_backend",
    "register_embedding_backend",
]
