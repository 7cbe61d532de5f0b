"""VectorIndex — the user-facing API.

Mirrors the reference's VectorIndex surface
(src/wagtail_vector_index/storage/base.py:174-354): ``query`` (RAG),
``search`` (retrieve only), ``find_similar`` (object-to-object), plus
storage ops ``rebuild_index`` / ``upsert`` / ``clear`` / ``delete`` /
``get_similar_documents``. Differences made consciously (SURVEY §7 risk
register):

- ``sources_limit`` is honored (dead parameter in the reference,
  base.py:198 vs :208-212)
- cosine is true cosine (numpy provider bug, numpy/provider.py:46-51)
- ``delete`` works uniformly (weaviate raises NotImplementedError,
  weaviate/provider.py:61-63)

Single-query calls stay driver-light: embed the probe once driver-side,
then one DataFrame program (filter → similarity → threshold → top-k →
fetch-back). Batch variants take a DataFrame of queries and run the same
plan shape with the probe side as a broadcast table.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wagtail_vector_index_spark.chat import ChatBackend, get_chat_backend
from wagtail_vector_index_spark.config import (
    DEFAULT_RETRIEVAL_LIMIT,
    DEFAULT_SIMILARITY_THRESHOLD,
    IndexConfig,
)
from wagtail_vector_index_spark.embedding.base import (
    EmbeddingBackend,
    get_embedding_backend,
)
from wagtail_vector_index_spark.operators.fetchback import dedup_keep_best
from wagtail_vector_index_spark.operators.knn import similarity_join, topk_similar
from wagtail_vector_index_spark.plans.indexing import (
    build_documents,
    incremental_build_documents,
)
from wagtail_vector_index_spark.sources.tables import DocumentStore

# Verbatim reference default (base.py:219) — chunk of the prompt surface
# SURVEY §7 pledges byte-parity on.
DEFAULT_QUERY_PROMPT = (
    "You are a helpful assistant. Use the following context to answer the "
    "question. Don't mention the context in your answer."
)


@dataclass
class QueryResponse:
    """RAG result (reference base.py:156-171)."""

    response: str
    sources: list


@dataclass
class AsyncQueryResponse:
    """Async RAG result: ``response`` is an async generator of content
    chunks (reference base.py:156-171 AsyncQueryResponse)."""

    response: object
    sources: list


class VectorIndex:
    """A named, queryable set of documents backed by a DocumentStore."""

    def __init__(
        self,
        spark: SparkSession,
        cfg: IndexConfig,
        store: DocumentStore,
        *,
        embedding_backend: EmbeddingBackend | None = None,
        chat_backend: ChatBackend | None = None,
    ):
        self.spark = spark
        self.cfg = cfg
        self.store = store
        self.embedding_backend = embedding_backend or get_embedding_backend()
        self.chat_backend = chat_backend or get_chat_backend()
        self._sources_df: DataFrame | None = None
        self._ann = None  # attached by build_ann_index

    # -- storage ops --------------------------------------------------------

    def rebuild_index(self, sources: DataFrame, *, text_col: str = "text") -> None:
        docs = build_documents(
            sources, self.cfg, self.embedding_backend, text_col=text_col
        )
        self.store.overwrite_index(self.cfg.index_name, docs)
        self._sources_df = sources
        self._ann = None  # derived artifact is stale: re-run build_ann_index

    def update_index(self, sources: DataFrame, *, text_col: str = "text") -> None:
        """Incremental rebuild: embed only stale objects (reference T7)."""
        try:
            stored = self.store.read(self.cfg.index_name)
        except FileNotFoundError:
            return self.rebuild_index(sources, text_col=text_col)
        docs, stale_keys, _fresh = incremental_build_documents(
            sources, stored, self.cfg, self.embedding_backend, text_col=text_col
        )
        # stale keys stay distributed — at 100 TB the stale set after a
        # crawl refresh can itself be huge; never collect it to the driver.
        # The set comes from the content-hash compare (NOT from the embedded
        # docs): it therefore covers sources *removed* since the last build,
        # and listing it doesn't force the embed stage, which runs exactly
        # once inside upsert().
        stale_keys = stale_keys.cache()
        try:
            if not stale_keys.isEmpty():
                self.store.delete_keys_df(self.cfg.index_name, stale_keys)
                self.store.upsert(docs)
        finally:
            stale_keys.unpersist()
        self._sources_df = sources
        self._ann = None  # derived artifact is stale: re-run build_ann_index

    def upsert(self, documents: DataFrame) -> None:
        self.store.upsert(documents)
        self._ann = None

    def delete(self, doc_keys: list[str]) -> None:
        self.store.delete(self.cfg.index_name, doc_keys)
        self._ann = None

    def clear(self) -> None:
        self.store.clear(self.cfg.index_name)
        self._ann = None

    def documents(self) -> DataFrame:
        return self.store.read(self.cfg.index_name)

    def compact(self) -> None:
        """Collapse this index's upsert/tombstone layers into one
        generation (read cost drops to a single clean scan; history stays
        time-travelable until the store is vacuumed). The ANN copy is a
        derived artifact of row CONTENT, which compaction preserves, so
        it stays attached."""
        self.store.compact(self.cfg.index_name)

    def vacuum(self, *, min_age_s: float = 3600.0) -> None:
        """Physically reclaim dead rows and superseded generations across
        the whole store (storage-level op — affects every index sharing
        the store; see DocumentStore.vacuum)."""
        self.store.vacuum(min_age_s=min_age_s)

    # -- ANN serving tier ---------------------------------------------------

    def build_ann_index(
        self,
        path: str,
        *,
        kind: str = "ivf",
        k: int = 16,
        iterations: int = 5,
        m: int = 8,
        ksub: int = 16,
        num_planes: int = 12,
        prefix_bits: int = 6,
    ) -> None:
        """Materialize an ANN serving tier over this index's document
        vectors. Afterwards ``search(..., ann=True)`` /
        ``get_similar_documents(..., ann=True)`` read only the probed
        posting lists / buckets — file-listing pruning instead of a full
        vector scan, the serving path when the index outgrows per-query
        scans.

        ``kind`` selects the tier (all three share the manifest-committed
        layout and maintenance surface of operators/ann_index):
        - ``"ivf"``: coarse posting lists, exact cosine over probed cells
          (``k`` centroids, Lloyd ``iterations``).
        - ``"ivfpq"``: IVF + product-quantized codes — the ADC scan reads
          M bytes per vector instead of dim×8, with exact-cosine rerank of
          the shortlist (``m`` subspaces × ``ksub`` centroids).
        - ``"lsh"``: hyperplane sign-buckets with multiprobe
          (``num_planes`` bits, ``prefix_bits`` directory prefix).

        Cosine only (every tier partitions by a cosine-geometry
        assignment). The ANN copy is a *derived* artifact: rebuild after
        update_index bursts, or attach
        streaming/maintenance.incremental_ann_stream for continuous
        maintenance.
        """
        if self.cfg.distance != "cosine":
            raise ValueError(
                f"ANN tier requires cosine distance, got {self.cfg.distance!r}"
            )
        from wagtail_vector_index_spark.operators.ann_index import (
            IvfIndex,
            IvfPqIndex,
            LshIndex,
        )

        # key at CHUNK granularity (documents are one row per
        # (doc_key, chunk_no)): keying doc_key alone would fan hits out
        # across sibling chunks on fetch-back and stamp them with the
        # wrong similarity — the doc_key-collapse trap DocumentStore.read
        # already guards against
        docs = self.documents().select(
            F.concat_ws("#", "doc_key", "chunk_no").alias("__ann_key"), "vector"
        )
        if kind == "ivf":
            self._ann = IvfIndex.build(
                docs, path=path, id_col="__ann_key", k=k, iterations=iterations
            )
        elif kind == "ivfpq":
            self._ann = IvfPqIndex.build(
                docs,
                path=path,
                id_col="__ann_key",
                k=k,
                iterations=iterations,
                m=m,
                ksub=ksub,
            )
        elif kind == "lsh":
            self._ann = LshIndex.build(
                docs,
                path=path,
                id_col="__ann_key",
                num_planes=num_planes,
                prefix_bits=prefix_bits,
            )
        else:
            raise ValueError(
                f"unknown ANN kind {kind!r}; expected ivf | ivfpq | lsh"
            )

    # -- retrieval ----------------------------------------------------------

    def get_similar_documents(
        self,
        query_vector,
        *,
        limit: int = DEFAULT_RETRIEVAL_LIMIT,
        similarity_threshold: float = DEFAULT_SIMILARITY_THRESHOLD,
        ann: bool = False,
        nprobe: int = 2,
        max_probe_hamming: int = 2,
        rerank: int | None = None,
    ) -> DataFrame:
        if ann:
            if self._ann is None:
                raise ValueError(
                    "no ANN index attached — call build_ann_index(path) first"
                )
            from wagtail_vector_index_spark.operators.ann_index import (
                IvfPqIndex,
                LshIndex,
            )

            q = [float(x) for x in query_vector]
            # dispatch on the attached tier: IVF probes clusters, LSH
            # probes hamming-adjacent buckets, PQ reranks its ADC
            # shortlist with exact cosine so served similarities stay
            # exact for every kind (isinstance order matters: IvfPqIndex
            # subclasses IvfIndex)
            if isinstance(self._ann, LshIndex):
                hits = self._ann.topk(
                    q, max_probe_hamming=max_probe_hamming, limit=limit
                )
            elif isinstance(self._ann, IvfPqIndex):
                r = rerank if rerank is not None else max(4 * limit, 32)
                hits = self._ann.topk(q, nprobe=nprobe, limit=limit, rerank=r)
            else:
                hits = self._ann.topk(q, nprobe=nprobe, limit=limit)
            if similarity_threshold:
                hits = hits.where(
                    F.col("similarity") >= F.lit(float(similarity_threshold))
                )
            # fetch the full document rows back at chunk granularity; keep
            # only (key, similarity) from the hits so the result schema
            # matches the brute path (no duplicate vector column)
            keyed = self.documents().withColumn(
                "__ann_key", F.concat_ws("#", "doc_key", "chunk_no")
            )
            return keyed.join(
                F.broadcast(hits.select("__ann_key", "similarity")), "__ann_key"
            ).drop("__ann_key")
        return topk_similar(
            self.documents(),
            query_vector,
            vector_col="vector",
            id_col="doc_key",
            limit=limit,
            similarity_threshold=similarity_threshold,
            method=self.cfg.distance,
        )

    def search(
        self,
        query: str,
        *,
        limit: int = DEFAULT_RETRIEVAL_LIMIT,
        similarity_threshold: float = DEFAULT_SIMILARITY_THRESHOLD,
        ann: bool = False,
        nprobe: int = 2,
        max_probe_hamming: int = 2,
        rerank: int | None = None,
        diversify_lambda: float | None = None,
        shortlist: int | None = None,
    ) -> DataFrame:
        """Semantic search: query text -> ranked source-document rows
        (reference base.py:303-316). One driver-side embed, then one job.
        With ``ann=True`` (after :meth:`build_ann_index`) the vector scan
        is replaced by the partition/bucket-pruned read of the attached
        tier (IVF, IVF-PQ with exact rerank, or LSH multiprobe).

        ``diversify_lambda`` switches the final ranking to MMR
        (operators/mmr.py, EXT): retrieve a ``shortlist`` (default
        4 x limit) of best-chunk-per-document hits, then greedily pick
        ``limit`` results trading relevance (lambda) against redundancy
        (1 - lambda). Works with both the brute and ANN paths."""
        if diversify_lambda is not None and self.cfg.distance != "cosine":
            # MMR trades the relevance score against cosine pairwise
            # similarity; for euclidean/max_inner_product the two terms
            # are on incomparable scales and lambda silently loses its
            # meaning — same cosine-only contract as build_ann_index
            raise ValueError(
                "diversify_lambda (MMR) requires cosine distance, got "
                f"{self.cfg.distance!r}"
            )
        qvec = self.embedding_backend.embed_batch([query])[0].tolist()
        retrieve = (
            limit
            if diversify_lambda is None
            else (shortlist or max(4 * limit, 20))
        )
        hits = self.get_similar_documents(
            qvec,
            limit=retrieve,
            similarity_threshold=similarity_threshold,
            ann=ann,
            nprobe=nprobe,
            max_probe_hamming=max_probe_hamming,
            rerank=rerank,
        )
        best = dedup_keep_best(hits, key_col="doc_key", rank_col="similarity")
        if diversify_lambda is None:
            return best.orderBy(
                F.col("similarity").desc(), F.col("doc_key").asc()
            )
        from wagtail_vector_index_spark.operators.mmr import mmr_rerank

        picked = mmr_rerank(
            best.select(
                F.lit(0).alias("__probe"), "doc_key", "vector", "similarity"
            ),
            probe_col="__probe",
            id_col="doc_key",
            vec_col="vector",
            sim_col="similarity",
            k=limit,
            lam=diversify_lambda,
        )
        return best.join(
            picked.select("doc_key", "mmr_rank"), "doc_key"
        ).orderBy(F.col("mmr_rank").asc())

    def find_similar(
        self,
        object_key: str,
        *,
        include_self: bool = False,
        limit: int = DEFAULT_RETRIEVAL_LIMIT,
        similarity_threshold: float = DEFAULT_SIMILARITY_THRESHOLD,
    ) -> DataFrame:
        """Object-to-object similarity (reference base.py:278-301): use the
        object's stored chunk vectors as probes, k-NN each (limit per
        chunk, accumulated), dedup keeping best, drop self unless asked."""
        docs = self.documents()
        probes = docs.where(F.col("doc_key") == object_key).select(
            F.col("doc_key").alias("probe_id"),
            F.col("chunk_no").alias("probe_chunk"),
            F.col("vector").alias("probe_vec"),
        )
        hits = similarity_join(
            probes.withColumn(
                "probe_id", F.concat_ws("#", "probe_id", "probe_chunk")
            ).drop("probe_chunk"),
            docs,
            probe_id="probe_id",
            probe_vec="probe_vec",
            index_id="doc_key",
            index_vec="vector",
            limit=limit,
            similarity_threshold=similarity_threshold,
            method=self.cfg.distance,
        )
        if not include_self:
            hits = hits.where(F.col("doc_key") != object_key)
        return dedup_keep_best(
            hits, key_col="doc_key", rank_col="similarity"
        ).orderBy(F.col("similarity").desc(), F.col("doc_key").asc())

    # -- RAG ----------------------------------------------------------------

    def query(
        self,
        query: str,
        *,
        sources_limit: int = DEFAULT_RETRIEVAL_LIMIT,
        similarity_threshold: float = DEFAULT_SIMILARITY_THRESHOLD,
        system_prompt: str = DEFAULT_QUERY_PROMPT,
    ) -> QueryResponse:
        """RAG (reference base.py:194-228): retrieve -> merge contexts with
        '\\n' -> 3-message prompt -> chat. ``sources_limit`` is honored."""
        hits = self.search(
            query, limit=sources_limit, similarity_threshold=similarity_threshold
        )
        rows = hits.select("content", "doc_key").collect()
        context = "\n".join(r["content"] for r in rows)
        messages = [
            {"role": "system", "content": system_prompt},
            {"role": "system", "content": context},
            {"role": "user", "content": query},
        ]
        response = self.chat_backend.chat(messages=messages)
        return QueryResponse(
            response=response.text(), sources=[r["doc_key"] for r in rows]
        )

    async def aquery(
        self,
        query: str,
        *,
        sources_limit: int = DEFAULT_RETRIEVAL_LIMIT,
        similarity_threshold: float = DEFAULT_SIMILARITY_THRESHOLD,
        system_prompt: str = DEFAULT_QUERY_PROMPT,
    ) -> "AsyncQueryResponse":
        """Async streaming RAG (reference base.py:230-276): retrieval runs
        in a thread (Spark jobs are blocking), generation streams chunk by
        chunk. The single-query online path stays driver-side by design
        (SURVEY non-goal: Spark is the batch plane); batch workloads use
        ``batch_query``."""
        import asyncio

        def _retrieve():
            hits = self.search(
                query,
                limit=sources_limit,
                similarity_threshold=similarity_threshold,
            )
            return hits.select("content", "doc_key").collect()

        rows = await asyncio.to_thread(_retrieve)
        context = "\n".join(r["content"] for r in rows)
        messages = [
            {"role": "system", "content": system_prompt},
            {"role": "system", "content": context},
            {"role": "user", "content": query},
        ]

        async def _stream():
            stream_fn = getattr(self.chat_backend, "chat_stream", None)
            if stream_fn is None:
                yield self.chat_backend.chat(messages=messages).text()
                return
            for chunk in stream_fn(messages=messages):
                yield chunk

        return AsyncQueryResponse(
            response=_stream(), sources=[r["doc_key"] for r in rows]
        )

    def batch_query(
        self,
        queries: DataFrame,
        *,
        query_col: str = "query",
        sources_limit: int = DEFAULT_RETRIEVAL_LIMIT,
        similarity_threshold: float = DEFAULT_SIMILARITY_THRESHOLD,
        system_prompt: str = DEFAULT_QUERY_PROMPT,
    ) -> DataFrame:
        """Batch RAG: a DataFrame of queries in, responses + sources out —
        all five lifecycle steps as stages of one job (SURVEY §3.1)."""
        from wagtail_vector_index_spark.chat import chat_dataframe
        from wagtail_vector_index_spark.embedding.stage import embed_dataframe

        embedded = embed_dataframe(
            queries.select(F.col(query_col).alias("query")),
            backend=self.embedding_backend,
            text_col="query",
            vector_col="probe_vec",
        ).withColumn("probe_id", F.col("query"))

        hits = similarity_join(
            embedded.select("probe_id", "probe_vec"),
            self.documents(),
            probe_id="probe_id",
            probe_vec="probe_vec",
            index_id="doc_key",
            index_vec="vector",
            limit=sources_limit,
            similarity_threshold=similarity_threshold,
            method=self.cfg.distance,
        )
        # collect_list order is nondeterministic: gather (sim, key, content)
        # structs and sort_array for a deterministic best-first context.
        ranked = F.sort_array(
            F.collect_list(
                F.struct(
                    (-F.col("similarity")).alias("neg_sim"),
                    F.col("doc_key").alias("doc_key"),
                    F.col("content").alias("content"),
                )
            )
        )
        contexts = hits.groupBy("probe_id").agg(
            F.concat_ws(
                "\n", F.transform(ranked, lambda r: r["content"])
            ).alias("context"),
            F.transform(ranked, lambda r: r["doc_key"]).alias("sources"),
        )
        prompts = contexts.select(
            F.col("probe_id").alias("query"),
            F.concat(F.lit(system_prompt + "\n"), F.col("context")).alias("system"),
            F.col("probe_id").alias("prompt"),
            "sources",
        )
        return chat_dataframe(prompts, backend=self.chat_backend)
