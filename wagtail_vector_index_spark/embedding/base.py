"""Pluggable embedding backends.

Mirrors the reference's backend protocol + alias registry
(src/wagtail_vector_index/ai_utils/backends/base.py:216-229,
ai_utils/backends/__init__.py:61-101): an embedding backend maps an
iterable of strings to vectors, carries its model's token limit and output
dimensionality, and is looked up by alias. In Spark the backend's
``embed_batch`` runs inside Arrow-batched ``mapInPandas`` workers, so it
must be picklable and must not capture a SparkSession.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

import numpy as np


@runtime_checkable
class EmbeddingBackend(Protocol):
    model_id: str
    dimensions: int
    token_limit: int

    def embed_batch(self, texts: list[str]) -> np.ndarray:
        """Return an (len(texts), dimensions) float64 matrix."""
        ...


def load_backend_from_config(cfg) -> EmbeddingBackend:
    """Instantiate the backend class named by an EmbeddingConfig's dotted
    path — the reference's swappable-settings mechanism
    (storage/__init__.py:29-49, ai_utils/backends/__init__.py:61-101)."""
    import importlib

    module_path, _, class_name = cfg.backend_class.rpartition(".")
    cls = getattr(importlib.import_module(module_path), class_name)
    return cls(dimensions=cfg.dimensions)


_REGISTRY: dict[str, EmbeddingBackend] = {}


def register_embedding_backend(alias: str, backend: EmbeddingBackend) -> None:
    _REGISTRY[alias] = backend


def get_embedding_backend(alias: str = "default") -> EmbeddingBackend:
    if alias not in _REGISTRY:
        if alias == "default":
            from wagtail_vector_index_spark.embedding.hash_backend import (
                HashEmbeddingBackend,
            )

            _REGISTRY["default"] = HashEmbeddingBackend()
        else:
            raise KeyError(f"no embedding backend registered under alias {alias!r}")
    return _REGISTRY[alias]
