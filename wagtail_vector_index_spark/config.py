"""Model registries and engine configuration.

Mirrors the reference's plain config dicts:
- token limits per chat/embedding model   (reference:
  src/wagtail_vector_index/ai_utils/tokens.py:12-28)
- embedding output dimensions per model   (reference:
  src/wagtail_vector_index/ai_utils/embeddings.py:5-10)
- pipeline constants                       (reference:
  src/wagtail_vector_index/storage/django.py:394,439;
  src/wagtail_vector_index/storage/pgvector/provider.py:44-58;
  src/wagtail_vector_index/storage/base.py:198,200,346-347)
"""

from __future__ import annotations

from dataclasses import dataclass, field

# Known context-window sizes (estimated tokens) per model.
TOKEN_LIMITS: dict[str, int] = {
    "gpt-3.5-turbo": 4096,
    "gpt-3.5-turbo-16k": 16385,
    "gpt-4": 8192,
    "gpt-4-32k": 32768,
    "text-embedding-ada-002": 8191,
}
DEFAULT_TOKEN_LIMIT = 4096

# Known embedding output dimensionalities per model.
EMBEDDING_DIMENSIONS: dict[str, int] = {
    "text-embedding-ada-002": 1536,
}

# Batching constants. In Spark these inform Arrow batch sizing rather than
# explicit Python-loop batches (mapInPandas handles the batching), but we
# keep them for API fidelity and for the external-call stages.
EMBEDDING_OBJECT_BATCH_SIZE = 100  # objects per bulk-embed window
UPSERT_BATCH_SIZE = 500  # rows per store write batch

# Retrieval defaults.
DEFAULT_RETRIEVAL_LIMIT = 5
DEFAULT_SIMILARITY_THRESHOLD = 0.0  # 0.0 == disabled

# Chunking defaults.
CHUNK_OVERLAP_TOKENS = 100  # hard-coded in the reference indexing path


@dataclass(frozen=True)
class EmbeddingConfig:
    """Config for one embedding backend alias.

    Shape mirrors the reference's WAGTAIL_VECTOR_INDEX settings dict
    (src/wagtail_vector_index/ai_utils/ai.py:13-48).
    """

    model_id: str = "hash-embedder"
    dimensions: int = 8
    token_limit: int = TOKEN_LIMITS["text-embedding-ada-002"]
    backend_class: str = "wagtail_vector_index_spark.embedding.hash_backend.HashEmbeddingBackend"


@dataclass(frozen=True)
class ChatConfig:
    model_id: str = "echo"
    token_limit: int = DEFAULT_TOKEN_LIMIT
    default_parameters: dict = field(default_factory=dict)
    backend_class: str = "wagtail_vector_index_spark.chat.EchoChatBackend"


@dataclass(frozen=True)
class IndexConfig:
    """Identity + knobs for one vector index (a named set of documents)."""

    index_name: str
    key_column: str = "object_key"
    content_column: str = "content"
    chunk_size: int | None = None  # None -> embedding token_limit
    chunk_overlap: int = CHUNK_OVERLAP_TOKENS
    distance: str = "cosine"  # cosine | euclidean | max_inner_product
    embedding: EmbeddingConfig = field(default_factory=EmbeddingConfig)
    chat: ChatConfig = field(default_factory=ChatConfig)

    def check_columns(
        self,
        df,
        *,
        text_col: str = "text",
        important_col: str | None = None,
    ) -> None:
        """Fail fast when a configured column doesn't exist on the source
        frame — the Spark analog of the reference's
        ``EmbeddingField._check_embedding_fields`` model check
        (src/wagtail_vector_index/storage/django.py:144-156), which warns
        when ``embedding_fields`` names a non-existent field. Raising at
        pipeline entry gives a column-level message instead of a deep
        Catalyst UNRESOLVED_COLUMN at plan analysis."""
        wanted = [self.key_column, text_col]
        if important_col is not None:
            wanted.append(important_col)
        missing = [c for c in wanted if c not in df.columns]
        if missing:
            raise ValueError(
                f"IndexConfig({self.index_name!r}) references non-existent "
                f"column(s) {missing} on the source frame "
                f"(available: {df.columns})"
            )
