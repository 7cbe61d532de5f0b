"""Materialized ANN indexes: build once, prune at the file level per query.

The in-flight variants (operators/knn.py::ivf_topk / lsh_topk) re-derive
cluster/bucket assignments over the full index on every query — the right
shape for ad-hoc exploration, the wrong one for a served index: at 100 TB
an "approximate" query that still scans (and re-assigns) 100% of the
vectors does strictly more work than brute force. These classes split the
work the way a real ANN index does:

- **build time** (once per corpus version): assign every vector to its
  IVF cluster (broadcast-codebook argmax) or LSH sign-bucket, then write
  the table *partitioned by* ``cid`` / ``bucket`` — one file per posting
  list after an explicit repartition on the partition key.
- **query time**: pick the probed clusters/buckets driver-side from the
  tiny codebook/plane metadata, and read the vectors table with a
  partition-column ``isin`` filter. Catalyst turns that into
  PartitionFilters — the non-probed posting lists never leave the file
  listing, let alone the scan (evidence: tests/test_ann_index.py).

The reference ships no ANN at all (pgvector models.py:86-87 leaves index
creation as a TODO and brute-forces `<=>`); this is the north-star EXT
scale path, so the semantics are pinned by our own DuckDB oracles
(`ann_ivf_cosine`, `ann_lsh_cosine`) instead of reference parity: given
the same codebook/planes, the materialized path returns byte-identical
results to the in-flight operators.
"""

from __future__ import annotations

import math
from collections.abc import Sequence
from functools import reduce
from itertools import combinations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wagtail_vector_index_spark.operators.knn import (
    hyperplane_lsh_planes,
    ivf_assign,
    lsh_bucket_col,
    topk_similar,
)
from wagtail_vector_index_spark.sources.manifest import (
    Manifest,
    ManifestLog,
    has_data_files,
)

# One DataFrame per (vectors path, manifest version), reused across
# queries: each fresh spark.read.parquet() rebuilds the InMemoryFileIndex,
# and with thousands of bucket partitions that listing job costs more than
# the pruned scan itself. A real deployment gets this for free from the
# metastore (the catalog caches the partition listing); this dict is the
# local stand-in. Keying on the manifest version makes invalidation
# automatic: any committed write bumps the version and the stale entry is
# simply never hit again.
_VECTORS_DF_CACHE: dict[tuple[str, int], DataFrame] = {}


def _read_live(spark: SparkSession, log: ManifestLog) -> DataFrame:
    """The live vectors table: union of the committed generation scans
    (sources/manifest.py protocol — partition pruning applies per scan)."""
    m = log.current()
    if m is None or not m.live:
        raise FileNotFoundError(f"no committed index at {log.root}")
    key = (log.root, m.version)
    if key not in _VECTORS_DF_CACHE:
        frames = [spark.read.parquet(p) for p in log.live_paths(m)]
        _VECTORS_DF_CACHE[key] = reduce(DataFrame.unionByName, frames)
    return _VECTORS_DF_CACHE[key]


def _commit_append(
    log: ManifestLog, gen: str, *, dedup_token: str | None = None
) -> Manifest | None:
    import shutil

    if not has_data_files(log.gen_path(gen)):
        shutil.rmtree(log.gen_path(gen), ignore_errors=True)
        return None

    def up(cur):
        live = list(cur.live) if cur else []
        tokens = list(cur.tokens) if cur else []
        if dedup_token is not None and dedup_token in tokens:
            # a racing replay committed first — keep the state unchanged
            # (the commit becomes a no-op version bump)
            return live, {}, tokens
        # idempotent for deterministic (dedup-token) generation names:
        # a replayed commit must not list the same generation twice
        if gen not in live:
            live.append(gen)
        if dedup_token is not None:
            tokens.append(dedup_token)
        return live, {}, tokens

    return log.commit(up)


def _append_gen(log: ManifestLog, dedup_token: str | None) -> str | None:
    """Generation name for an append. With ``dedup_token`` the token is
    checked against the manifest's processed-token window (exactly-once
    for stream replays): already applied — return None, skip. The token
    memory lives IN the manifest, so it survives compaction/GC of the
    generation that carried the batch (a replay after compact must stay
    a no-op). The generation name is a deterministic function of the
    token so a crash between data write and commit leaves a directory
    the replay safely overwrites."""
    if dedup_token is None:
        return log.new_generation()
    import hashlib

    cur = log.current()
    gen = f"gen-tok-{hashlib.sha256(dedup_token.encode()).hexdigest()[:24]}"
    if cur is not None and (dedup_token in cur.tokens or gen in cur.live):
        # Already applied. The gen-in-live check matters when the token
        # is absent from the window (pre-tokens-field manifests, or a
        # MAX_TOKENS eviction): without it a replay would OVERWRITE a
        # live, serving generation directory in place.
        return None
    return gen


def _gen_write_path(log: ManifestLog, gen: str, dedup_token: str | None) -> str:
    """Where an append batch should be WRITTEN. Token-deduped appends
    use deterministic generation names, so a racing replay of the same
    batch could target a directory that is already live and serving —
    those write to a unique staging directory first and are swapped
    into place by :func:`_publish_gen_dir`. Tokenless appends get fresh
    generation names (no collision possible) and write directly."""
    if dedup_token is None:
        return log.gen_path(gen)
    import uuid

    return log.gen_path(f"{gen}.stage-{uuid.uuid4().hex[:12]}")


def _publish_gen_dir(log: ManifestLog, written: str, gen: str) -> None:
    """Atomically move a staged generation directory into its final
    name (no-op when the batch wrote directly). Closes the r4 TOCTOU:
    the pre-write token/liveness check in :func:`_append_gen` could
    pass for BOTH of two racing replays, and the loser's
    ``mode('overwrite')`` write would transiently delete files under a
    directory the winner had just committed as live. With a staged
    write the loser's rename simply fails (POSIX rename won't clobber
    a non-empty directory) and its identical copy is discarded; the
    live directory is never rewritten in place. A crash leftover — the
    directory exists but was never committed — is replaced only after
    re-checking the manifest immediately before the swap, which
    narrows (not eliminates: this is a local-FS stand-in for an
    object-store conditional put) the remaining window to
    rmtree-vs-concurrent-commit of byte-identical data."""
    import os
    import shutil

    final = log.gen_path(gen)
    if written == final:
        return
    try:
        os.rename(written, final)
        return
    except OSError:
        pass
    cur = log.current()
    if cur is not None and gen in cur.live:
        # a racing replay won and its (identical) data is serving
        shutil.rmtree(written, ignore_errors=True)
        return
    # uncommitted leftover from a crashed writer: replace it
    shutil.rmtree(final, ignore_errors=True)
    try:
        os.rename(written, final)
    except OSError:
        shutil.rmtree(written, ignore_errors=True)


def _commit_rewrite(log: ManifestLog, gen: str, base: Manifest | None) -> Manifest:
    """Publish ``gen`` as a rewrite of the state read at ``base``;
    generations appended by concurrent writers since ``base`` are carried
    over instead of silently dropped. An empty rewrite (all rows deleted
    — Spark wrote no data files) publishes without the generation."""
    import shutil

    base_live = set(base.live) if base else set()
    if not has_data_files(log.gen_path(gen)):
        shutil.rmtree(log.gen_path(gen), ignore_errors=True)
        gen = None

    def up(cur):
        cur_live = list(cur.live) if cur else []
        return ([gen] if gen is not None else []) + [
            g for g in cur_live if g not in base_live
        ], {}

    return log.commit(up)


def _seq_dot(a: Sequence[float], b: Sequence[float]) -> float:
    # sequential fold, matching Spark's aggregate() and DuckDB's
    # list_inner_product summation order (oracle determinism invariant)
    total = 0.0
    for x, y in zip(a, b):
        total += x * y
    return total


class IvfIndex:
    """IVF index persisted as ``{path}/vectors`` (partitioned by ``cid``)
    plus ``{path}/codebook`` (k rows)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        id_col: str = "vec_id",
        vec_col: str = "vector",
    ):
        self.spark = spark
        self.path = path
        self.id_col = id_col
        self.vec_col = vec_col
        # Codebooks are immutable after build() (append/delete/compact
        # touch only the vectors log), so the k-row driver-side collect
        # is memoized per instance, KEYED ON THE MANIFEST VERSION (r5):
        # build() always commits the vectors log after writing the
        # codebook, so a same-path rebuild bumps the version and the
        # memo self-invalidates — a long-lived served instance can never
        # answer from stale centroids. The stamp check is one local
        # manifest-JSON read per query; appends bump the version too,
        # costing one redundant k-row re-collect, which is noise.
        self._codebook_rows_cache: tuple[int, list] | None = None

    def _manifest_stamp(self) -> int:
        cur = self.vectors_log.current()
        return -1 if cur is None else cur.version

    def _codebook_rows(self) -> list:
        stamp = self._manifest_stamp()
        if (
            self._codebook_rows_cache is None
            or self._codebook_rows_cache[0] != stamp
        ):
            self._codebook_rows_cache = (
                stamp,
                self.spark.read.parquet(self.codebook_path).collect(),
            )
        return self._codebook_rows_cache[1]

    def refresh(self) -> None:
        """Drop memoized codebooks so the next query re-reads them from
        storage. Since r5 the memos are keyed on the manifest version
        and self-invalidate on any committed write (including a
        same-path rebuild), so this is only needed for out-of-band
        edits that bypass the manifest protocol entirely."""
        self._codebook_rows_cache = None
        if hasattr(self, "_pq_cb_cache"):
            self._pq_cb_cache = None

    @property
    def vectors_path(self) -> str:
        return f"{self.path}/vectors"

    @property
    def codebook_path(self) -> str:
        return f"{self.path}/codebook"

    @property
    def vectors_log(self) -> ManifestLog:
        return ManifestLog(self.vectors_path)

    def _vectors(self) -> DataFrame:
        return _read_live(self.spark, self.vectors_log)

    def live_partition_dirs(self) -> list[str]:
        """Absolute paths of the live ``<key>=<value>`` partition dirs
        across the committed generations (test/inspection helper)."""
        import os

        out = []
        for gen in self.vectors_log.live_paths():
            for d in os.listdir(gen):
                if "=" in d:
                    out.append(os.path.join(gen, d))
        return out

    @classmethod
    def build(
        cls,
        df: DataFrame,
        *,
        path: str,
        id_col: str = "vec_id",
        vec_col: str = "vector",
        centroids_df: DataFrame | None = None,
        k: int = 16,
        iterations: int = 5,
    ) -> "IvfIndex":
        """Assign every row to its cosine-nearest centroid and persist the
        table partitioned by cluster id.

        ``centroids_df`` (columns ``cid``, ``cv``) pins an explicit
        codebook; otherwise one is trained with Lloyd's iterations
        (operators/kmeans.py). The pre-write repartition on ``cid``
        co-locates each posting list into one file — the layout that makes
        ``nprobe`` pruning a file-listing operation at any scale.

        Every input column beyond (id, vector) is preserved in the
        stored layout, so metadata predicates compose with the pruned
        scan at query time (``topk(..., where=...)`` — filtered ANN);
        ``cid`` is reserved for the partition column.
        """
        spark = df.sparkSession
        if "cid" in df.columns:
            raise ValueError("'cid' is reserved for the partition column")
        if centroids_df is None:
            from wagtail_vector_index_spark.operators.kmeans import train_codebook

            centroids, _ = train_codebook(
                df, k=k, iterations=iterations, id_col=id_col, vec_col=vec_col
            )
            centroids_df = spark.createDataFrame(
                centroids, "cid int, cv array<double>"
            )
        assigned = ivf_assign(
            df,
            centroids_df,
            index_id=id_col,
            index_vec=vec_col,
        )
        log = ManifestLog(f"{path}/vectors")
        base = log.current()
        gen = log.new_generation()
        (
            assigned.repartition("cid")
            .write.mode("overwrite")
            .partitionBy("cid")
            .parquet(log.gen_path(gen))
        )
        centroids_df.write.mode("overwrite").parquet(f"{path}/codebook")
        _commit_rewrite(log, gen, base)
        return cls(spark, path, id_col=id_col, vec_col=vec_col)

    def append(self, df: DataFrame, *, dedup_token: str | None = None) -> None:
        """Incremental maintenance: assign NEW vectors against the stored
        codebook and append them as a new generation (fresh parquet files
        — no rewrite of standing data, published by one manifest commit).
        Ids must be new; replacing an id is ``delete_ids`` + ``append``.
        After a burst of appends, ``compact`` restores the
        one-file-per-posting-list layout. ``dedup_token`` makes the
        append exactly-once per token (see :func:`_append_gen`) — the
        streaming maintenance path passes its batch identity here."""
        log = self.vectors_log
        gen = _append_gen(log, dedup_token)
        if gen is None:
            return  # replayed batch: this token's generation is live
        self._check_append_schema(df, computed={"cid"})
        codebook = self.spark.read.parquet(self.codebook_path)
        assigned = ivf_assign(
            df,  # extra columns preserved (checked against stored schema)
            codebook,
            index_id=self.id_col,
            index_vec=self.vec_col,
        )
        written = _gen_write_path(log, gen, dedup_token)
        (
            assigned.repartition("cid")
            .write.mode("overwrite")
            .partitionBy("cid")
            .parquet(written)
        )
        _publish_gen_dir(log, written, gen)
        _commit_append(log, gen, dedup_token=dedup_token)

    def _check_append_schema(self, df: DataFrame, *, computed: set) -> None:
        """Fail fast when an append batch's columns don't match the
        stored layout (minus the columns append itself computes) — names
        AND types: a mismatched generation would commit fine but break
        every subsequent read with a deep unionByName
        AnalysisException (or silently coerce types), with no repair
        path short of editing the manifest."""
        stored = {
            c: t
            for c, t in self._vectors().dtypes
            if c not in computed
        }
        got = dict(df.dtypes)
        if got != stored:
            raise ValueError(
                f"append schema mismatch: batch schema {sorted(got.items())}"
                f" != stored layout {sorted(stored.items())} (+computed "
                f"{sorted(computed)})"
            )

    def delete_ids(self, ids_df: DataFrame) -> None:
        """Remove vectors by id (distributed anti-join — ids never
        collect to the driver). The survivor set is written as a new
        generation and published by one manifest commit; the old
        generations stay intact until GC, so a crash mid-rewrite leaves
        the old index state, never a half-written one."""
        ids = ids_df.select(F.col(ids_df.columns[0]).alias(self.id_col))
        log = self.vectors_log
        base = log.current()
        survivors = self._vectors().join(ids, self.id_col, "left_anti")
        gen = log.new_generation()
        survivors.repartition("cid").write.mode("overwrite").partitionBy(
            "cid"
        ).parquet(log.gen_path(gen))
        _commit_rewrite(log, gen, base)

    def compact(self) -> None:
        """Merge appended generations back to one generation with one
        file per posting list, then GC the superseded ones (min_age_s=0:
        compact is explicit maintenance run from the index owner, the
        local analog of a retention-expired VACUUM)."""
        log = self.vectors_log
        base = log.current()
        vec = self._vectors()
        gen = log.new_generation()
        vec.repartition("cid").write.mode("overwrite").partitionBy(
            "cid"
        ).parquet(log.gen_path(gen))
        _commit_rewrite(log, gen, base)
        log.gc(keep_manifests=1, min_age_s=0.0)

    def probed_cids(self, query_vector: Sequence[float], nprobe: int) -> list[int]:
        """The ``nprobe`` cluster ids cosine-closest to the query — picked
        driver-side from the k-row codebook (k × dim doubles, tiny by
        construction), so probing costs zero Spark jobs."""
        q = [float(x) for x in query_vector]
        qn = math.sqrt(_seq_dot(q, q))
        scored = []
        for r in self._codebook_rows():
            cv = [float(x) for x in r["cv"]]
            sim = _seq_dot(cv, q) / (math.sqrt(_seq_dot(cv, cv)) * qn)
            scored.append((-sim, int(r["cid"])))
        return [cid for _, cid in sorted(scored)[:nprobe]]

    def candidates(
        self, query_vector: Sequence[float], *, nprobe: int = 2, where=None
    ) -> DataFrame:
        """The probed posting lists as a DataFrame — a partition-pruned
        scan (``cid`` is the partition column, so non-probed clusters are
        eliminated during file listing). ``where`` (a Column or SQL
        string over the stored columns) composes a metadata filter INTO
        the pruned scan — with extra columns kept at build time
        (``build(df)`` preserves every input column), the predicate
        reaches the parquet reader as a pushed filter, so filtered ANN
        costs the filtered fraction of the probed cells, not a
        post-rank drop."""
        probed = self.probed_cids(query_vector, nprobe)
        df = self._vectors().where(F.col("cid").isin(probed))
        if where is not None:
            df = df.where(where)
        return df

    def topk(
        self,
        query_vector: Sequence[float],
        *,
        nprobe: int = 2,
        limit: int = 10,
        sim_alias: str = "similarity",
        where=None,
    ) -> DataFrame:
        """IVF ANN top-k: exact cosine rank over the probed clusters only.
        Identical results to knn.ivf_topk given the same codebook, at
        ~nprobe/k of the scan. ``where`` filters candidates inside the
        pruned scan (filtered ANN — see :meth:`candidates`)."""
        cand = self.candidates(
            query_vector, nprobe=nprobe, where=where
        ).drop("cid")
        return topk_similar(
            cand,
            query_vector,
            vector_col=self.vec_col,
            id_col=self.id_col,
            limit=limit,
            sim_alias=sim_alias,
        )


def _normalized_col(vec: F.Column) -> F.Column:
    """Unit-normalize an array<double> column element-wise (sequential-
    fold norm, matching DuckDB ``list_inner_product``)."""
    nrm = F.sqrt(
        F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return F.transform(vec, lambda x: x / nrm)


def pq_encode_udf(codebook: Sequence[Sequence[Sequence[float]]]):
    """Arrow-batched PQ encoder (normalize + encode in one numpy kernel)
    — the build/append fast path.

    :func:`pq_encode_col` expresses the same arithmetic as Catalyst
    higher-order folds, which evaluate interpreted at ~90 ms/row for
    m=8 × ksub=16 (measured: a 2k-row build spent 180 s in the encode) —
    fine for replaying a handful of rows in tests, catastrophic for a
    build. This kernel does the identical math as batched float64 matmuls
    (~µs/row), the textbook "drop to a Pandas UDF when the built-in
    expression can't execute efficiently" case.

    fp note: numpy's summation order (pairwise/SIMD) differs from the
    sequential fold by ≤ a few ulp, which can flip an argmin only when
    two codewords are equidistant to ~1e-15 relative — bit-identical
    codewords still tie-break identically (np.argmin takes the first,
    i.e. lowest j, same as the fold form and the SQL oracle). The
    ann_ivfpq_adc / ann_recall_pq gates verify the parity empirically on
    every run."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(codebook, dtype=np.float64)  # (m, ksub, sub)
    csq = np.einsum("mks,mks->mk", C, C)
    n_m, _, sub = C.shape

    def _enc(col):
        if len(col) == 0:
            return pd.Series([], dtype=object)
        X = np.asarray(col.tolist(), dtype=np.float64)
        nrm = np.sqrt((X * X).sum(axis=1, keepdims=True))
        S = (X / nrm).reshape(len(X), n_m, sub)
        ssq = np.einsum("nms,nms->nm", S, S)
        cross = np.einsum("nms,mks->nmk", S, C)
        d = ssq[:, :, None] - 2.0 * cross + csq[None, :, :]
        codes = d.argmin(axis=2).astype(np.int32)
        return pd.Series([c.tolist() for c in codes])

    # real type objects, not "from __future__ import annotations" strings
    # — pyspark resolves pandas_udf signatures from the annotation values
    _enc.__annotations__ = {"col": pd.Series, "return": pd.Series}
    return pandas_udf(_enc, "array<int>")


def pq_encode_col(
    vec: F.Column, codebook: Sequence[Sequence[Sequence[float]]]
) -> F.Column:
    """PQ-encode a *unit-normalized* array<double> column against a
    driver-side codebook ``codebook[m][j] -> sub-vector`` (M subspaces ×
    ksub centroids each): ``codes[m] = argmin_j ||v_m - c[m][j]||²``,
    ties to the lowest ``j``.

    The distance is ``<a,a> - 2<a,b> + <b,b>`` (sequential-fold inner
    products — the exact fp ops a DuckDB oracle replays via
    list_inner_product) and the argmin is ``array_min`` over (dist, j)
    structs, whose lexicographic ordering breaks ties on j.

    The codebook enters the plan as ONE 3-D array literal (plus a 2-D
    literal of precomputed ||c||², the same Python floats as before)
    iterated with higher-order functions. The earlier unrolled form
    built M·ksub fold subtrees — ~256 aggregate nodes whose py4j
    construction, Catalyst re-optimization, and codegen made an index
    BUILD pay ~2 minutes of pure plan overhead at 8×16; the fold form
    is interpreted per row but runs once per vector at build time, so
    tree size dominates wall-clock, not row math. Values are
    bit-identical (same fold order per dot, same argmin).
    """
    n_m = len(codebook)
    sub = len(codebook[0][0])
    cb_lit = F.lit(
        [[[float(x) for x in cv] for cv in sub_cb] for sub_cb in codebook]
    ).cast("array<array<array<double>>>")
    csq_lit = F.lit(
        [[float(_seq_dot(cv, cv)) for cv in sub_cb] for sub_cb in codebook]
    ).cast("array<array<double>>")

    def dot(a: F.Column, b: F.Column) -> F.Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def code_for(m: F.Column) -> F.Column:
        sv = F.slice(vec, m * sub + 1, F.lit(sub))
        sv_sq = dot(sv, sv)
        sub_cb = F.element_at(cb_lit, m + 1)
        sub_csq = F.element_at(csq_lit, m + 1)
        cands = F.transform(
            F.sequence(F.lit(0), F.lit(len(codebook[0]) - 1)),
            lambda j: F.struct(
                (
                    sv_sq
                    - F.lit(2.0) * dot(sv, F.element_at(sub_cb, j + 1))
                    + F.element_at(sub_csq, j + 1)
                ).alias("d"),
                j.cast("int").alias("j"),
            ),
        )
        return F.array_min(cands).getField("j")

    return F.transform(F.sequence(F.lit(0), F.lit(n_m - 1)), code_for)


class IvfPqIndex(IvfIndex):
    """IVF-PQ: the coarse IVF partitioning of :class:`IvfIndex` plus a
    product-quantized code per vector, persisted in ONE table
    ``{path}/vectors`` (partitioned by ``cid``; columns id, vector,
    codes) with the sub-space codebook at ``{path}/pq_codebook``
    (rows m, j, cv).

    The billion-scale serving layout (Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011): the ADC scan
    touches only the ``codes`` column — M bytes of information per
    vector instead of dim × 8 — and parquet's columnar pruning delivers
    that for free from the combined table (the scan's ReadSchema simply
    omits ``vector``; evidence in tests/test_ann_index.py). Reranking
    re-reads the ``vector`` column of the probed partitions only, for
    the ADC shortlist.

    Query cost model at scale: file listing prunes to ``nprobe/k`` of
    the corpus (PartitionFilters), the surviving scan reads codes-only
    (~M bytes/row), scoring is a table lookup per subspace inside
    whole-stage codegen, and the optional rerank is a broadcast
    semi-join against a shortlist of ``rerank`` ids. No stage touches
    the full-precision vectors of non-candidates.

    Cosine semantics via normalized vectors: build-time normalization
    makes inner product = cosine, so ``adc score = Σ_m <q̂_m,
    c[m][code_m]>`` approximates cosine similarity directly.
    """

    @property
    def pq_codebook_path(self) -> str:
        return f"{self.path}/pq_codebook"

    @classmethod
    def build(
        cls,
        df: DataFrame,
        *,
        path: str,
        id_col: str = "vec_id",
        vec_col: str = "vector",
        centroids_df: DataFrame | None = None,
        k: int = 16,
        iterations: int = 5,
        m: int = 8,
        ksub: int = 16,
        pq_codebook_df: DataFrame | None = None,
    ) -> "IvfPqIndex":
        """Coarse-assign + PQ-encode every row and persist partitioned
        by ``cid``.

        ``pq_codebook_df`` (columns ``m``, ``j``, ``cv``) pins an
        explicit sub-space codebook; otherwise one is derived
        deterministically from the ``ksub`` lowest-id vectors' normalized
        sub-vectors (the sampling initializer of per-subspace k-means —
        a production build would run Lloyd refinement per subspace, which
        changes only the codebook table, not the layout or query path).
        """
        spark = df.sparkSession
        if centroids_df is None:
            from wagtail_vector_index_spark.operators.kmeans import train_codebook

            centroids, _ = train_codebook(
                df, k=k, iterations=iterations, id_col=id_col, vec_col=vec_col
            )
            centroids_df = spark.createDataFrame(
                centroids, "cid int, cv array<double>"
            )
        if pq_codebook_df is None:
            pq_codebook_df = cls._sampled_pq_codebook(
                df, id_col=id_col, vec_col=vec_col, m=m, ksub=ksub
            )
        cb_rows = pq_codebook_df.collect()
        n_m = 1 + max(r["m"] for r in cb_rows)
        codebook: list[list[list[float]]] = [[] for _ in range(n_m)]
        for r in sorted(cb_rows, key=lambda r: (r["m"], r["j"])):
            codebook[r["m"]].append([float(x) for x in r["cv"]])

        assigned = ivf_assign(
            df.select(id_col, vec_col),
            centroids_df,
            index_id=id_col,
            index_vec=vec_col,
        )
        # repartition BEFORE encoding (spread the kernel across the
        # cluster, not the source's file count), then encode with the
        # Arrow-batched numpy kernel — the fold-expression twin
        # (pq_encode_col) evaluates interpreted at ~90 ms/row and exists
        # for SQL-replay documentation/tests, not for builds.
        encoded = assigned.repartition("cid").withColumn(
            "codes", pq_encode_udf(codebook)(F.col(vec_col))
        )
        log = ManifestLog(f"{path}/vectors")
        base = log.current()
        gen = log.new_generation()
        (
            encoded
            .write.mode("overwrite")
            .partitionBy("cid")
            .parquet(log.gen_path(gen))
        )
        centroids_df.write.mode("overwrite").parquet(f"{path}/codebook")
        pq_codebook_df.write.mode("overwrite").parquet(f"{path}/pq_codebook")
        _commit_rewrite(log, gen, base)
        return cls(spark, path, id_col=id_col, vec_col=vec_col)

    @staticmethod
    def _sampled_pq_codebook(
        df: DataFrame, *, id_col: str, vec_col: str, m: int, ksub: int
    ) -> DataFrame:
        """Deterministic codebook: normalized sub-vectors of the ``ksub``
        lowest-id rows (j = rank of the row among them)."""
        spark = df.sparkSession
        rows = (
            df.orderBy(F.col(id_col).asc())
            .limit(ksub)
            .select(vec_col)
            .collect()
        )
        out = []
        for j, r in enumerate(rows):
            v = [float(x) for x in r[0]]
            nrm = math.sqrt(_seq_dot(v, v))
            nv = [x / nrm for x in v]
            sub = len(nv) // m
            for mi in range(m):
                out.append((mi, j, nv[mi * sub : (mi + 1) * sub]))
        return spark.createDataFrame(out, "m int, j int, cv array<double>")

    _pq_cb_cache: tuple[int, list[list[list[float]]]] | None = None

    def _pq_codebook(self) -> list[list[list[float]]]:
        # manifest-version stamp, same invalidation contract as
        # IvfIndex._codebook_rows: a same-path rebuild bumps the vectors
        # log and the memo self-invalidates
        stamp = self._manifest_stamp()
        if self._pq_cb_cache is not None and self._pq_cb_cache[0] == stamp:
            return self._pq_cb_cache[1]
        rows = self.spark.read.parquet(self.pq_codebook_path).collect()
        n_m = 1 + max(r["m"] for r in rows)
        cb: list[list[list[float]]] = [[] for _ in range(n_m)]
        for r in sorted(rows, key=lambda r: (r["m"], r["j"])):
            cb[r["m"]].append([float(x) for x in r["cv"]])
        self._pq_cb_cache = (stamp, cb)
        return cb

    def append(self, df: DataFrame, *, dedup_token: str | None = None) -> None:
        """Incremental maintenance: coarse-assign + PQ-encode NEW
        vectors against the stored codebooks and append to their
        posting lists (same contract as IvfIndex.append, incl. the
        exactly-once ``dedup_token``)."""
        extra = set(df.columns) - {self.id_col, self.vec_col}
        if extra:
            raise ValueError(
                f"IvfPqIndex stores only (id, vector, codes) — unexpected "
                f"batch columns {sorted(extra)} would be silently dropped; "
                f"payload columns are an IvfIndex feature"
            )
        log = self.vectors_log
        gen = _append_gen(log, dedup_token)
        if gen is None:
            return
        codebook = self.spark.read.parquet(self.codebook_path)
        cb = self._pq_codebook()
        assigned = ivf_assign(
            df.select(self.id_col, self.vec_col),
            codebook,
            index_id=self.id_col,
            index_vec=self.vec_col,
        ).repartition("cid").withColumn(
            "codes", pq_encode_udf(cb)(F.col(self.vec_col))
        )
        written = _gen_write_path(log, gen, dedup_token)
        (
            assigned
            .write.mode("overwrite")
            .partitionBy("cid")
            .parquet(written)
        )
        _publish_gen_dir(log, written, gen)
        _commit_append(log, gen, dedup_token=dedup_token)

    def adc_topk(
        self,
        query_vector: Sequence[float],
        *,
        nprobe: int = 2,
        limit: int = 10,
        sim_alias: str = "adc_sim",
    ) -> DataFrame:
        """Asymmetric-distance top-k: rank the probed posting lists by
        the PQ lookup-table score WITHOUT reading the vector column.

        The per-subspace lookup table ``lut[m][j] = <q̂_m, c[m][j]>`` is
        computed driver-side from the (M × ksub)-row codebook and enters
        the plan as array literals; the score is an explicitly
        left-associated sum of M ``element_at`` terms, so the fp
        addition order is pinned for the DuckDB oracle."""
        cb = self._pq_codebook()
        q = [float(x) for x in query_vector]
        qn = math.sqrt(_seq_dot(q, q))
        qhat = [x / qn for x in q]
        sub = len(cb[0][0])
        lut = [
            [_seq_dot(qhat[m * sub : (m + 1) * sub], cv) for cv in cb[m]]
            for m in range(len(cb))
        ]
        probed = self.probed_cids(query_vector, nprobe)
        cand = self._vectors().where(F.col("cid").isin(probed))
        score = None
        for m, row in enumerate(lut):
            lut_m = F.array(*[F.lit(float(v)) for v in row]).cast(
                "array<double>"
            )
            term = F.element_at(lut_m, F.element_at("codes", m + 1) + F.lit(1))
            score = term if score is None else score + term
        scored = cand.select(
            self.id_col, score.alias(sim_alias)
        )
        return scored.orderBy(
            F.col(sim_alias).desc(), F.col(self.id_col).asc()
        ).limit(limit)

    def topk(
        self,
        query_vector: Sequence[float],
        *,
        nprobe: int = 2,
        limit: int = 10,
        rerank: int = 0,
        sim_alias: str = "similarity",
    ) -> DataFrame:
        """IVF-PQ top-k. ``rerank=0`` returns the pure ADC ranking;
        ``rerank=R`` takes the ADC top-R shortlist, re-reads the
        ``vector`` column of the probed partitions for those ids only
        (broadcast semi-join), and re-ranks by exact cosine — the
        standard two-stage serving pattern."""
        if rerank <= 0:
            return self.adc_topk(
                query_vector, nprobe=nprobe, limit=limit, sim_alias=sim_alias
            )
        shortlist = self.adc_topk(
            query_vector, nprobe=nprobe, limit=rerank
        ).select(self.id_col)
        probed = self.probed_cids(query_vector, nprobe)
        cand = (
            self._vectors()
            .where(F.col("cid").isin(probed))
            .join(F.broadcast(shortlist), self.id_col, "left_semi")
            .select(self.id_col, self.vec_col)
        )
        return topk_similar(
            cand,
            query_vector,
            vector_col=self.vec_col,
            id_col=self.id_col,
            limit=limit,
            sim_alias=sim_alias,
        )


class LshIndex:
    """Hyperplane-LSH index persisted as ``{path}/vectors`` (partitioned
    by ``bucket_pfx``, the top bits of the sign-bucket; the full
    ``bucket`` rides as an ordinary sorted column) plus ``{path}/meta``
    (plane count + dim + prefix width; the planes themselves are
    re-derived deterministically from sha256).

    Partitioning by the raw bucket would shatter the table into up to
    2^num_planes directories of tiny files — slow to write, slow to
    list, and the classic small-files failure at scale. The prefix keeps
    the directory count at 2^prefix_bits while queries still skip
    non-probed data twice: PartitionFilters eliminate whole prefix
    directories at file listing, and because each file is sorted by
    ``bucket``, the pushed ``bucket IN (...)`` filter prunes row groups
    via parquet min/max stats inside the surviving files."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        *,
        id_col: str = "vec_id",
        vec_col: str = "vector",
    ):
        self.spark = spark
        self.path = path
        self.id_col = id_col
        self.vec_col = vec_col
        self._meta = None

    @property
    def vectors_path(self) -> str:
        return f"{self.path}/vectors"

    @property
    def meta_path(self) -> str:
        return f"{self.path}/meta"

    @property
    def meta(self):
        if self._meta is None:
            self._meta = self.spark.read.parquet(self.meta_path).first()
        return self._meta

    @property
    def vectors_log(self) -> ManifestLog:
        return ManifestLog(self.vectors_path)

    def _vectors(self) -> DataFrame:
        return _read_live(self.spark, self.vectors_log)

    def live_partition_dirs(self) -> list[str]:
        """Absolute paths of the live ``<key>=<value>`` partition dirs
        across the committed generations (test/inspection helper)."""
        import os

        out = []
        for gen in self.vectors_log.live_paths():
            for d in os.listdir(gen):
                if "=" in d:
                    out.append(os.path.join(gen, d))
        return out

    def _bucketize(self, df: DataFrame) -> DataFrame:
        """Stamp (bucket, bucket_pfx) on new rows using the stored meta —
        the same deterministic planes the build used."""
        meta = self.meta
        planes = hyperplane_lsh_planes(meta["num_planes"], meta["dim"])
        shift = meta["num_planes"] - meta["prefix_bits"]
        return (
            df.select(self.id_col, self.vec_col)
            .withColumn("bucket", lsh_bucket_col(F.col(self.vec_col), planes))
            .withColumn("bucket_pfx", F.shiftright("bucket", shift))
        )

    def _write_gen(self, bucketed: DataFrame, gen_path: str) -> None:
        (
            bucketed.repartition("bucket_pfx")
            .sortWithinPartitions("bucket")
            .write.mode("overwrite")
            .partitionBy("bucket_pfx")
            .parquet(gen_path)
        )

    @classmethod
    def build(
        cls,
        df: DataFrame,
        *,
        path: str,
        id_col: str = "vec_id",
        vec_col: str = "vector",
        num_planes: int = 12,
        dim: int | None = None,
        prefix_bits: int = 6,
    ) -> "LshIndex":
        """Stamp every row's sign-bucket and persist partitioned by the
        bucket's top ``prefix_bits`` bits, sorted by full bucket within
        each partition (one file per prefix). The planes are sha256-derived
        (knn.hyperplane_lsh_planes), so rebuilding the index — or an
        oracle — from (num_planes, dim) alone reproduces them exactly.
        """
        spark = df.sparkSession
        if dim is None:
            dim = len(df.select(vec_col).first()[0])
        prefix_bits = min(prefix_bits, num_planes)
        shift = num_planes - prefix_bits
        planes = hyperplane_lsh_planes(num_planes, dim)
        bucketed = df.select(id_col, vec_col).withColumn(
            "bucket", lsh_bucket_col(F.col(vec_col), planes)
        )
        log = ManifestLog(f"{path}/vectors")
        base = log.current()
        gen = log.new_generation()
        (
            bucketed.withColumn("bucket_pfx", F.shiftright("bucket", shift))
            .repartition("bucket_pfx")
            .sortWithinPartitions("bucket")
            .write.mode("overwrite")
            .partitionBy("bucket_pfx")
            .parquet(log.gen_path(gen))
        )
        spark.createDataFrame(
            [(num_planes, dim, prefix_bits)],
            "num_planes int, dim int, prefix_bits int",
        ).write.mode("overwrite").parquet(f"{path}/meta")
        _commit_rewrite(log, gen, base)
        return cls(spark, path, id_col=id_col, vec_col=vec_col)

    def append(self, df: DataFrame, *, dedup_token: str | None = None) -> None:
        """Incremental maintenance (parity with IvfIndex.append, incl.
        the exactly-once ``dedup_token``): bucket NEW vectors with the
        stored planes and publish them as a new generation — no rewrite
        of standing data. Ids must be new."""
        extra = set(df.columns) - {self.id_col, self.vec_col}
        if extra:
            raise ValueError(
                f"LshIndex stores only (id, vector, bucket) — unexpected "
                f"batch columns {sorted(extra)} would be silently dropped; "
                f"payload columns are an IvfIndex feature"
            )
        log = self.vectors_log
        gen = _append_gen(log, dedup_token)
        if gen is None:
            return
        written = _gen_write_path(log, gen, dedup_token)
        self._write_gen(self._bucketize(df), written)
        _publish_gen_dir(log, written, gen)
        _commit_append(log, gen, dedup_token=dedup_token)

    def delete_ids(self, ids_df: DataFrame) -> None:
        """Remove vectors by id (distributed anti-join; survivor set
        published as a rewrite commit — parity with IvfIndex.delete_ids)."""
        ids = ids_df.select(F.col(ids_df.columns[0]).alias(self.id_col))
        log = self.vectors_log
        base = log.current()
        survivors = self._vectors().join(ids, self.id_col, "left_anti")
        gen = log.new_generation()
        self._write_gen(survivors, log.gen_path(gen))
        _commit_rewrite(log, gen, base)

    def compact(self) -> None:
        """Merge appended generations back to one sorted file per prefix
        partition, then GC superseded generations (parity with
        IvfIndex.compact)."""
        log = self.vectors_log
        base = log.current()
        vec = self._vectors()
        gen = log.new_generation()
        self._write_gen(vec, log.gen_path(gen))
        _commit_rewrite(log, gen, base)
        log.gc(keep_manifests=1, min_age_s=0.0)

    def probed_buckets(
        self, query_vector: Sequence[float], max_probe_hamming: int
    ) -> list[int]:
        """Multiprobe bucket set: the query's own bucket plus every bucket
        within ``max_probe_hamming`` bit flips — sum(C(planes, 0..h))
        values, enumerated driver-side."""
        meta = self.meta
        planes = hyperplane_lsh_planes(meta["num_planes"], meta["dim"])
        q = [float(x) for x in query_vector]
        q_bucket = 0
        for j, p in enumerate(planes):
            if _seq_dot(q, p) > 0:
                q_bucket |= 1 << j
        buckets = []
        for h in range(max_probe_hamming + 1):
            for flips in combinations(range(meta["num_planes"]), h):
                mask = 0
                for j in flips:
                    mask |= 1 << j
                buckets.append(q_bucket ^ mask)
        return buckets

    def candidates(
        self, query_vector: Sequence[float], *, max_probe_hamming: int = 2
    ) -> DataFrame:
        probed = self.probed_buckets(query_vector, max_probe_hamming)
        shift = self.meta["num_planes"] - self.meta["prefix_bits"]
        prefixes = sorted({b >> shift for b in probed})
        return self._vectors().where(
            F.col("bucket_pfx").isin(prefixes) & F.col("bucket").isin(probed)
        )

    def topk(
        self,
        query_vector: Sequence[float],
        *,
        max_probe_hamming: int = 2,
        limit: int = 10,
        sim_alias: str = "similarity",
    ) -> DataFrame:
        """LSH ANN top-k: exact cosine rank over the probed buckets only.
        Identical results to knn.lsh_topk given the same planes."""
        cand = self.candidates(
            query_vector, max_probe_hamming=max_probe_hamming
        ).drop("bucket", "bucket_pfx")
        return topk_similar(
            cand,
            query_vector,
            vector_col=self.vec_col,
            id_col=self.id_col,
            limit=limit,
            sim_alias=sim_alias,
        )
