"""Sharded training-data export: the sink side of the corpus pipeline.

A training job wants its corpus as N deterministic shards of bounded
files (a data loader maps shards to workers, files to read tasks), with
membership that is a pure function of the record key — so a re-run after
an upstream fix rewrites the same record into the same shard, and two
exports of the same data are byte-comparable.

The reference engine has no export surface (its stores ARE the sink);
this completes the pipeline the EXT operators build: dedup -> quality ->
mix -> pack -> **export**.

Scale shape: shard assignment is a narrow projection (sha256 of the key,
same content-addressing as operators/skew.deterministic_keep_col);
``partitionBy(shard)`` + ``maxRecordsPerFile`` bounds every file without
a global sort; the single ``repartition(shard)`` shuffle is what gives
one writer task per shard (without it, every upstream task writes a
sliver of every shard — tiny-file shatter at 1000 executors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wagtail_vector_index_spark.functions.text_analysis import sha_hash64

SHARD_COL = "shard"


def with_shard(df: DataFrame, key, *, num_shards: int) -> DataFrame:
    """Append the deterministic shard id: sha256(key) mod num_shards.

    Content-addressed (not ``spark_partition_id`` or RNG): stable across
    runs, partitionings, and engines.
    """
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")
    return df.withColumn(
        SHARD_COL, (sha_hash64(key.cast("string")) % num_shards).cast("int")
    )


def export_jsonl_shards(
    df: DataFrame,
    path: str,
    *,
    key_col: str = "doc_id",
    num_shards: int = 8,
    max_records_per_file: int = 100_000,
) -> None:
    """Write ``df`` as ``path/shard=N/*.json`` with every file capped at
    ``max_records_per_file`` records.

    JSONL (one JSON object per line) is the lingua franca of training
    corpora; parquet callers can use the same sharding via
    :func:`with_shard` + their own writer.
    """
    sharded = with_shard(df, F.col(key_col), num_shards=num_shards)
    (
        sharded.repartition(num_shards, F.col(SHARD_COL))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(SHARD_COL)
        .json(path)
    )


def shard_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Per-file manifest of an exported corpus: (shard, file, records).

    Computed distributed (group by ``input_file_name``) so it works
    against object storage the same as a local dir; a data loader uses it
    to size read tasks without listing-then-opening every file.
    """
    return (
        spark.read.json(path)
        .groupBy(
            F.col(SHARD_COL).cast("int").alias(SHARD_COL),
            F.input_file_name().alias("file"),
        )
        .agg(F.count(F.lit(1)).alias("records"))
    )
