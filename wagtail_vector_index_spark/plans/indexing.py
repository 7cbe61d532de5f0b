"""The indexing pipeline: source rows -> chunked, embedded documents.

Reference lifecycle (SURVEY §3.2, src/wagtail_vector_index/storage/
django.py:320-402): per batch of 100 objects — fetch existing docs, chunk,
compare chunk-set vs stored content-set, embed only stale chunks in one
batched call, delete+recreate stale docs. The positional ``chunk_mapping``
bookkeeping (django.py:333-360) disappears in Spark: rows carry their keys.

Spark plan (one job, no driver loop):

    sources.select(key, text)
      -> chunk UDF + posexplode            (T1+T2: ordinal-stamped chunks)
      -> [incremental] anti-join on (doc_key, sha2(content))
         against the stored index          (staleness, django.py:267-277)
      -> mapInPandas embed                 (T5, Arrow-batched)
      -> write partitioned by (index_name, dim)

The staleness anti-join replaces per-object content-set comparison with an
exact hash equality — same semantics (chunk text defines identity), but
map-side and scalable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wagtail_vector_index_spark.config import IndexConfig
from wagtail_vector_index_spark.embedding.base import EmbeddingBackend
from wagtail_vector_index_spark.embedding.stage import embed_dataframe
from wagtail_vector_index_spark.functions.text_splitting import split_text_udf


def chunk_sources(
    sources: DataFrame,
    cfg: IndexConfig,
    *,
    text_col: str = "text",
    important_col: str | None = None,
    chunk_size: int,
) -> DataFrame:
    """source rows -> one row per chunk: (doc_key, object_keys, chunk_no,
    content). ``important_col`` text is prefixed onto every chunk at full
    chunk_size (reference T1 semantics, django.py:405-432). Conscious
    deviation: with no important column we emit the bare chunk, where the
    reference's f-string prefixes a lone "\\n" even for models without
    important fields."""
    from wagtail_vector_index_spark._workerenv import ensure_worker_imports

    ensure_worker_imports(sources)
    splitter = split_text_udf(chunk_size, cfg.chunk_overlap)
    chunks = sources.select(
        F.col(cfg.key_column).alias("doc_key"),
        F.col("object_keys"),
        F.posexplode(splitter(F.col(text_col))).alias("chunk_no", "chunk"),
        *( [F.col(important_col)] if important_col else [] ),
    )
    if important_col:
        content = F.concat(F.col(important_col), F.lit("\n"), F.col("chunk"))
    else:
        content = F.col("chunk")
    return chunks.select(
        "doc_key",
        "object_keys",
        "chunk_no",
        content.alias("content"),
    )


def build_documents(
    sources: DataFrame,
    cfg: IndexConfig,
    backend: EmbeddingBackend,
    *,
    text_col: str = "text",
    important_col: str | None = None,
) -> DataFrame:
    """Full (non-incremental) chunk + embed: the rebuild_index path (S8)."""
    cfg.check_columns(sources, text_col=text_col, important_col=important_col)
    chunk_size = cfg.chunk_size or backend.token_limit
    chunked = chunk_sources(
        sources,
        cfg,
        text_col=text_col,
        important_col=important_col,
        chunk_size=chunk_size,
    )
    embedded = embed_dataframe(chunked, backend=backend, text_col="content")
    return embedded.select(
        "doc_key",
        "object_keys",
        "chunk_no",
        "content",
        "vector",
        F.create_map().cast("map<string,string>").alias("metadata"),
        F.lit(cfg.index_name).alias("index_name"),
    )


def incremental_build_documents(
    sources: DataFrame,
    stored: DataFrame,
    cfg: IndexConfig,
    backend: EmbeddingBackend,
    *,
    text_col: str = "text",
    important_col: str | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Incremental T7: returns (stale_documents_to_write, stale_doc_keys,
    fresh_doc_keys).

    A source object is *stale* iff its current chunk-content multiset
    differs from what's stored (django.py:267-277). We compare per-chunk
    content hashes with a full-outer set compare at (doc_key, content_hash)
    granularity: any unmatched row on either side marks the doc_key stale.
    Only stale objects' chunks are embedded — the reference's
    skip-if-unchanged fast path, as one anti-join instead of N queries.

    ``stale_doc_keys`` comes from the full-outer compare itself, so it
    includes objects *removed* from ``sources`` (present only on the stored
    side) — the delete set a caller must tombstone. Deriving it from the
    returned documents would both miss removals and force the embed stage
    to run just to list keys (mapInPandas is opaque to column pruning).
    """
    cfg.check_columns(sources, text_col=text_col, important_col=important_col)
    chunk_size = cfg.chunk_size or backend.token_limit
    # lazy localCheckpoint: the chunk UDF output feeds three consumers
    # (mismatch compare, stale selection, fresh-key anti-join) — without
    # a materialization barrier the splitter would run three times over
    # the corpus. Checkpoint, not cache(): blocks release with the frame
    # via the ContextCleaner instead of pinning a fresh copy per call
    # for the session lifetime.
    chunked = (
        chunk_sources(
            sources,
            cfg,
            text_col=text_col,
            important_col=important_col,
            chunk_size=chunk_size,
        )
        .withColumn("content_hash", F.sha2(F.col("content"), 256))
        .localCheckpoint(eager=False)
    )

    stored_hashes = stored.select(
        "doc_key", F.sha2(F.col("content"), 256).alias("content_hash")
    )

    new_side = chunked.select("doc_key", "content_hash").withColumn(
        "in_new", F.lit(True)
    )
    old_side = stored_hashes.withColumn("in_old", F.lit(True))
    mismatched = (
        new_side.join(
            old_side,
            ["doc_key", "content_hash"],
            "full_outer",
        )
        .where(F.col("in_new").isNull() | F.col("in_old").isNull())
        .select("doc_key")
        .distinct()
    )

    stale_chunks = chunked.join(mismatched, "doc_key", "left_semi").drop(
        "content_hash"
    )
    fresh_keys = chunked.select("doc_key").distinct().join(
        mismatched, "doc_key", "left_anti"
    )

    embedded = embed_dataframe(stale_chunks, backend=backend, text_col="content")
    documents = embedded.select(
        "doc_key",
        "object_keys",
        "chunk_no",
        "content",
        "vector",
        F.create_map().cast("map<string,string>").alias("metadata"),
        F.lit(cfg.index_name).alias("index_name"),
    )
    return documents, mismatched, fresh_keys
