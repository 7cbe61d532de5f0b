"""Multimodal columns: opaque binary payloads + typed metadata (EXT).

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages so the bytes never round-trip through
Python row-at-a-time. The actual codec work is STUBBED — image/audio
libraries are not in this container — behind ``decode_stub``: it produces
*deterministic* pseudo-metadata derived from sha256 of the payload, so the
Spark-side plumbing (schema, partitioning, UDF signature, Arrow batch
shape) is real and testable, and the driver's DuckDB oracle can reproduce
the exact values in SQL. Swap ``decode_stub`` for a real decoder
(PIL/ffmpeg) in production; the stage contract doesn't change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

DECODED_FIELDS = [
    T.StructField("byte_len", T.LongType()),
    T.StructField("content_sha", T.StringType()),
    T.StructField("width", T.LongType()),
    T.StructField("height", T.LongType()),
]


def decode_stub(payload: bytes) -> dict:
    """Deterministic fake decode: sha256-derived dimensions.

    width  = first 8 hex chars of sha256 as int, mod 1920
    height = next 8 hex chars as int, mod 1080
    A real decoder would parse the container header instead; everything
    else in the stage is production-shaped.
    """
    hexdig = hashlib.sha256(payload).hexdigest()
    return {
        "byte_len": len(payload),
        "content_sha": hexdig,
        "width": int(hexdig[0:8], 16) % 1920,
        "height": int(hexdig[8:16], 16) % 1080,
    }


def decode_binary_column(
    df: DataFrame, *, binary_col: str = "payload", out_prefix: str = ""
) -> DataFrame:
    """Append decoded-metadata columns for a binary column.

    ``mapInPandas`` so each worker sees Arrow record batches of raw bytes —
    the shape a real image/audio decode stage needs (batch the codec calls,
    keep bytes off the driver).
    """
    from wagtail_vector_index_spark._workerenv import ensure_worker_imports

    ensure_worker_imports(df)
    fields = [
        T.StructField(out_prefix + f.name, f.dataType) for f in DECODED_FIELDS
    ]
    schema = T.StructType(df.schema.fields + fields)

    def _decode(batches: Iterator) -> Iterator:
        for pdf in batches:
            metas = [decode_stub(b) for b in pdf[binary_col]]
            pdf = pdf.copy()
            for f in DECODED_FIELDS:
                pdf[out_prefix + f.name] = [m[f.name] for m in metas]
            yield pdf

    return df.mapInPandas(_decode, schema=schema)


def frame_sample_stub(
    df: DataFrame,
    *,
    binary_col: str = "payload",
    every_n_bytes: int = 1024,
    max_frames: int = 8,
) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled "frame"
    (here: per every_n_bytes offset — a real impl would demux). Shows the
    explode shape: partition-local fan-out, no shuffle."""
    raise NotImplementedError(
        "frame sampling requires a real demuxer; plumbing contract: "
        "input (key, payload) -> output (key, frame_no, frame_bytes)"
    )
