"""Shared operator utilities.

``ensure_parallelism`` started as ``dedup._ensure_parallelism`` and was
being imported privately by three modules (corpus, queries_text,
kmeans' probe was a fourth, inconsistent, variant) — promoted here as
the one public width guard (r13, ADVICE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ensure_parallelism(df: DataFrame, key_col: str) -> DataFrame:
    """Repartition up to the cluster's parallelism when the source
    arrived in fewer partitions (e.g. one small parquet file) — the
    CPU-bound per-row kernels downstream (sha/shingle/trigram/argmax
    passes) must not serialize onto one core because the input happens
    to be one file. No-op when the input is already wide (the 100 TB
    case), so no extra shuffle at scale.

    Width probe (r13): file-backed sources are probed by their input
    FILE COUNT, but the count is read JVM-side (``len`` of the py4j
    array proxy is one round trip) so a million-file table never ships
    a million path strings through py4j — the JVM listing itself is
    computed by the scan's FileIndex at planning time regardless and
    is cached per relation. A NON-file-backed frame (checkpointed
    LogicalRDD, local relation, derived in-memory frame) reports zero
    input files; it falls back to the physical partition count instead
    of being blindly shuffled (the pre-r13 behavior hash-repartitioned
    every such frame even when already wide — ADVICE r12). ``df.rdd``
    is only touched on that fallback path, so file-scan plans never
    pay the RDD-conversion analysis.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    n_files = len(df._jdf.inputFiles())
    if n_files >= target:
        return df
    if n_files == 0 and df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, F.col(key_col))
