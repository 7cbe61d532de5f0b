"""Optional passthrough to real embedding APIs via litellm.

Mirrors the reference's LiteLLMEmbeddingBackend
(src/wagtail_vector_index/ai_utils/backends/litellm.py:171-186): one
batched API call per input window. Import-gated — litellm is not in this
container; the backend raises a clear error at construction if missing.
Inside the engine it slots into the same ``mapInPandas`` stage as the hash
embedder: each Arrow batch becomes one API call per worker, which is the
reference's batch_size=100 driver loop distributed across executors.
"""

from __future__ import annotations

import numpy as np


class LiteLLMEmbeddingBackend:
    def __init__(
        self,
        model_id: str = "text-embedding-ada-002",
        dimensions: int = 1536,
        token_limit: int = 8191,
        **params,
    ):
        try:
            import litellm  # noqa: F401
        except ImportError as e:  # pragma: no cover - not installed here
            raise ImportError(
                "litellm is not installed; use HashEmbeddingBackend for "
                "deterministic/offline runs or install litellm for API calls"
            ) from e
        self.model_id = model_id
        self.dimensions = dimensions
        self.token_limit = token_limit
        self.params = params

    def embed_batch(self, texts: list[str]) -> np.ndarray:
        import litellm

        response = litellm.embedding(
            model=self.model_id, input=list(texts), **self.params
        )
        return np.array([d["embedding"] for d in response["data"]], dtype=np.float64)

    async def aembed_batch(self, texts: list[str]) -> np.ndarray:
        """Async twin (reference aembed,
        /root/reference/src/wagtail_vector_index/ai_utils/backends/litellm.py:181-186)
        for driver-side online callers; the Spark embed stage stays on
        the sync path (worker concurrency comes from partitions, not an
        event loop)."""
        import litellm

        response = await litellm.aembedding(
            model=self.model_id, input=list(texts), **self.params
        )
        return np.array([d["embedding"] for d in response["data"]], dtype=np.float64)
