"""Deterministic hash embedder — the engine's test/oracle embedding backend.

Replaces the reference's mock/echo backends
(tests/conftest.py:33-42, ai_utils/backends/echo.py:106-113 — the echo
backend is *random*, which breaks hash-matched correctness runs). Spec from
/root/repo/FIXTURES.md §6:

    embedding[i] = int(sha256(content).hex()[8i : 8i+8], 16) / 2**32

Values are float64 in [0, 1). Vectors are NOT pre-normalized: cosine is
scale-invariant, and skipping normalization keeps the value bit-identical
to the DuckDB oracle expression

    ('0x' || substr(sha256(content), 8*i + 1, 8))::UBIGINT / 4294967296.0

For dimensions > 8 (a sha256 hex digest yields 8 blocks of 8 hex chars),
additional blocks hash ``content || '|' || block_index``.
"""

from __future__ import annotations

import hashlib

import numpy as np


class HashEmbeddingBackend:
    model_id = "hash-embedder"
    token_limit = 8191

    def __init__(self, dimensions: int = 8):
        self.dimensions = dimensions

    def _digest_hex(self, text: str, block: int) -> str:
        payload = text if block == 0 else f"{text}|{block}"
        return hashlib.sha256(payload.encode("utf-8")).hexdigest()

    def embed_one(self, text: str) -> np.ndarray:
        dims = self.dimensions
        out = np.empty(dims, dtype=np.float64)
        hexdig = self._digest_hex(text, 0)
        for i in range(dims):
            block, j = divmod(i, 8)
            if block > 0 and j == 0:
                hexdig = self._digest_hex(text, block)
            out[i] = int(hexdig[8 * j : 8 * j + 8], 16) / 4294967296.0
        return out

    def embed_batch(self, texts: list[str]) -> np.ndarray:
        if not texts:
            return np.empty((0, self.dimensions), dtype=np.float64)
        return np.stack([self.embed_one(t) for t in texts])

    def as_column(self, text):
        """Catalyst column twin of :meth:`embed_one` — bit-identical.

        A deterministic featurizer (feature hashing, random projection by
        fixed seed, ...) can be expressed as JVM expressions, and then the
        embed stage stays inside whole-stage codegen with no Arrow
        round-trip — the same design as the T3 token estimator's column
        twin (functions/text_splitting.py). ``embed_dataframe`` picks this
        path automatically when a backend provides it; external-model
        backends (litellm) have no twin and use the ``mapInPandas`` path.

        Exactness: each 8-hex-char block is an integer < 2**32, exactly
        representable in float64, and dividing by 2**32 is a power-of-two
        scale (exact), so the JVM values equal the Python path bit for bit.
        Subclasses that override ``embed_batch`` (instrumentation, real
        models) must override ``as_column`` too — set it to ``None`` or
        return ``None`` to force the Arrow path.
        """
        from pyspark.sql import functions as F

        # any overridden embedding method invalidates the twin (embed_batch
        # delegates to embed_one which delegates to _digest_hex)
        cls = HashEmbeddingBackend
        if (
            type(self).embed_batch is not cls.embed_batch
            or type(self).embed_one is not cls.embed_one
            or type(self)._digest_hex is not cls._digest_hex
        ):
            return None
        t = F.coalesce(text, F.lit(""))
        cols = []
        digests: dict[int, object] = {}
        for i in range(self.dimensions):
            block, j = divmod(i, 8)
            if block not in digests:
                payload = t if block == 0 else F.concat(t, F.lit(f"|{block}"))
                digests[block] = F.sha2(payload, 256)
            cols.append(
                (
                    F.conv(F.substring(digests[block], 8 * j + 1, 8), 16, 10).cast(
                        "double"
                    )
                    / F.lit(4294967296.0)
                )
            )
        return F.array(*cols)
