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


def decode_image_pil(payload: bytes) -> dict:
    """Real image decode via PIL — import-gated (PIL is not in this
    container). Same output contract as :func:`decode_stub`: the stage
    schema, batching and partitioning do not change when swapping the
    decoder, which is the point of the contract. Unparseable payloads
    yield width/height -1 rather than failing the whole Arrow batch."""
    from io import BytesIO

    from PIL import Image  # gated: raises ImportError where PIL is absent

    hexdig = hashlib.sha256(payload).hexdigest()
    try:
        with Image.open(BytesIO(payload)) as img:
            width, height = img.size
    except Exception:
        width, height = -1, -1
    return {
        "byte_len": len(payload),
        "content_sha": hexdig,
        "width": width,
        "height": height,
    }


def decode_binary_column(
    df: DataFrame,
    *,
    binary_col: str = "payload",
    out_prefix: str = "",
    decoder=decode_stub,
) -> DataFrame:
    """Append decoded-metadata columns for a binary column.

    ``mapInPandas`` so each worker sees Arrow record batches of raw bytes —
    the shape a real image/audio decode stage needs (batch the codec calls,
    keep bytes off the driver). ``decoder`` is any ``bytes -> dict``
    producing the DECODED_FIELDS keys: ``decode_stub`` (deterministic,
    oracle-reproducible) by default, :func:`decode_image_pil` for real
    image headers where PIL is installed.
    """
    from wagtail_vector_index_spark._workerenv import ensure_worker_imports

    ensure_worker_imports(df)
    fields = [
        T.StructField(out_prefix + f.name, f.dataType) for f in DECODED_FIELDS
    ]
    schema = T.StructType(df.schema.fields + fields)

    def _decode(batches: Iterator) -> Iterator:
        for pdf in batches:
            metas = [decoder(b) for b in pdf[binary_col]]
            pdf = pdf.copy()
            for f in DECODED_FIELDS:
                pdf[out_prefix + f.name] = [m[f.name] for m in metas]
            yield pdf

    return df.mapInPandas(_decode, schema=schema)


def byte_slice_demux(
    payload: bytes, *, every_n_bytes: int, max_frames: int
) -> list[bytes]:
    """Deterministic demuxer stand-in: one "frame" per every_n_bytes
    offset (a real implementation would parse the container and decode
    I-frames — ffmpeg is not in this container). Keeps the fan-out
    plumbing honest: variable frames-per-row, bytes in, bytes out."""
    return [
        payload[off : off + every_n_bytes]
        for off in range(
            0, min(len(payload), every_n_bytes * max_frames), every_n_bytes
        )
    ]


def frame_sample(
    df: DataFrame,
    *,
    key_col: str = "doc_id",
    binary_col: str = "payload",
    every_n_bytes: int = 1024,
    max_frames: int = 8,
    demux=byte_slice_demux,
) -> DataFrame:
    """Video frame-sampling plumbing: (key, payload) -> one row per
    sampled frame (key, frame_no, frame_bytes). Partition-local fan-out
    inside ``mapInPandas`` — no shuffle, no driver round-trip; frames
    stream out in Arrow batches. ``demux`` is any ``bytes -> list[bytes]``;
    the default :func:`byte_slice_demux` is the deterministic stand-in,
    a real ffmpeg-backed demuxer plugs into the same contract."""
    import pandas as pd

    from wagtail_vector_index_spark._workerenv import ensure_worker_imports

    ensure_worker_imports(df)
    schema = T.StructType(
        [
            df.schema[key_col],
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("frame_bytes", T.BinaryType()),
        ]
    )

    def _sample(batches: Iterator) -> Iterator:
        for pdf in batches:
            keys, nos, frames = [], [], []
            for key, payload in zip(pdf[key_col], pdf[binary_col]):
                for i, fr in enumerate(
                    demux(
                        payload,
                        every_n_bytes=every_n_bytes,
                        max_frames=max_frames,
                    )
                ):
                    keys.append(key)
                    nos.append(i)
                    frames.append(fr)
            yield pd.DataFrame(
                {key_col: keys, "frame_no": nos, "frame_bytes": frames}
            )

    return df.select(key_col, binary_col).mapInPandas(_sample, schema=schema)


def frame_sample_stub(
    df: DataFrame,
    *,
    binary_col: str = "payload",
    every_n_bytes: int = 1024,
    max_frames: int = 8,
) -> DataFrame:
    """Deprecated name — the plumbing is now real, see
    :func:`frame_sample` (the demux step remains a deterministic
    stand-in)."""
    return frame_sample(
        df,
        binary_col=binary_col,
        every_n_bytes=every_n_bytes,
        max_frames=max_frames,
    )


def window_fingerprints(
    df: DataFrame,
    *,
    key_col: str = "doc_id",
    binary_col: str = "payload",
    window_bytes: int = 256,
    hop_bytes: int = 128,
    max_windows: int = 8,
) -> DataFrame:
    """Audio-segment fingerprinting plumbing: (key, payload) -> one row
    per overlapping byte window (key, win_no, win_sha) where ``win_sha``
    is the sha256 of the window's UPPERCASE-HEX encoding (hex rather
    than raw bytes so a SQL oracle can replay it — DuckDB cannot slice
    blobs, and hex is a bijection, so the fingerprint is just as
    content-addressed).

    This is the shared-segment detector for audio corpora: identical
    clips embedded in different containers produce identical window
    fingerprints wherever the hop grid aligns, so a groupBy(win_sha)
    finds repeated jingles/silence/boilerplate audio the way
    dedup_shared_passages finds boilerplate text. Partition-local
    fan-out inside mapInPandas, no shuffle; a real resampling
    fingerprinter (chromaprint-style) plugs into the same contract."""
    import pandas as pd

    from wagtail_vector_index_spark._workerenv import ensure_worker_imports

    ensure_worker_imports(df)
    schema = T.StructType(
        [
            df.schema[key_col],
            T.StructField("win_no", T.IntegerType()),
            T.StructField("win_sha", T.StringType()),
        ]
    )
    cap = hop_bytes * max_windows

    def _windows(batches: Iterator) -> Iterator:
        for pdf in batches:
            keys, nos, shas = [], [], []
            for key, payload in zip(pdf[key_col], pdf[binary_col]):
                data = bytes(payload or b"")
                off, win_no = 0, 0
                while off + window_bytes <= len(data) and off < cap:
                    w = data[off : off + window_bytes]
                    shas.append(
                        hashlib.sha256(w.hex().upper().encode()).hexdigest()
                    )
                    keys.append(key)
                    nos.append(win_no)
                    off += hop_bytes
                    win_no += 1
            yield pd.DataFrame(
                {key_col: keys, "win_no": nos, "win_sha": shas}
            )

    return df.select(key_col, binary_col).mapInPandas(_windows, schema=schema)


def resize_stub(payload: bytes, *, width: int, height: int) -> bytes:
    """Deterministic fake resize: strided byte sampling down to a
    (width*height//64)-byte thumbnail payload — content-dependent and
    shape-correct, so the Spark-side plumbing (batch shape, binary
    in/out, metadata) is real while the pixel math is a stand-in. The
    PIL twin below does the real thing when the library exists."""
    data = bytes(payload or b"")
    target = max(width * height // 64, 1)
    if not data:
        return b""
    if len(data) <= target:
        return data
    stride = len(data) / target
    return bytes(data[int(i * stride)] for i in range(target))


def resize_image_pil(payload: bytes, *, width: int, height: int) -> bytes:
    """Real resize (import-gated): decode with PIL, LANCZOS-resample to
    (width, height), re-encode PNG."""
    import io

    from PIL import Image  # noqa: F401

    img = Image.open(io.BytesIO(bytes(payload)))
    out = io.BytesIO()
    img.resize((width, height), Image.LANCZOS).save(out, format="PNG")
    return out.getvalue()


def resize_binary_column(
    df: DataFrame,
    *,
    binary_col: str = "payload",
    width: int = 64,
    height: int = 64,
    out_col: str = "resized",
    resizer=resize_stub,
) -> DataFrame:
    """Image-resize plumbing: binary in, binary out, one row per input
    row, Arrow-batched. ``resizer`` is any ``(bytes, width, height) ->
    bytes``; pass :func:`resize_image_pil` where PIL exists."""
    import pandas as pd

    from wagtail_vector_index_spark._workerenv import ensure_worker_imports

    ensure_worker_imports(df)
    schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.BinaryType())]
    )

    def _resize(batches: Iterator) -> Iterator:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [
                resizer(p, width=width, height=height)
                for p in pdf[binary_col]
            ]
            yield pdf

    return df.mapInPandas(_resize, schema=schema)


def extract_feature_col(
    df: DataFrame,
    *,
    binary_col: str = "payload",
    dim: int = 8,
    out_col: str = "features",
) -> DataFrame:
    """Deterministic feature extraction for opaque payloads: ``dim``
    floats in [0, 1) from sha256 of the payload's uppercase hex (the
    hash-embedder derivation, so the DuckDB oracle replays it exactly
    and the output plugs straight into the knn / ANN / near-dup
    operators as an ``array<double>`` column). A real extractor (CLIP,
    mel-spectrogram pooling) replaces the hash with model inference
    behind the same Arrow batch contract — this pins the dataflow."""
    import pandas as pd

    from wagtail_vector_index_spark._workerenv import ensure_worker_imports

    ensure_worker_imports(df)
    schema = T.StructType(
        df.schema.fields
        + [T.StructField(out_col, T.ArrayType(T.DoubleType()), False)]
    )
    assert dim <= 8, "one sha256 digest yields 8 4-byte words"

    def _features(batches: Iterator) -> Iterator:
        for pdf in batches:
            feats = []
            for p in pdf[binary_col]:
                h = hashlib.sha256(
                    bytes(p or b"").hex().upper().encode()
                ).hexdigest()
                feats.append(
                    [
                        int(h[8 * i : 8 * i + 8], 16) / 4294967296.0
                        for i in range(dim)
                    ]
                )
            pdf = pdf.copy()
            pdf[out_col] = feats
            yield pdf

    return df.mapInPandas(_features, schema=schema)
