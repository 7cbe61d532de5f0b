"""Sources & sinks: table readers + the parquet-backed DocumentStore.

Reference surface (SURVEY §2.1 S1-S10): queryset scans in, four vector
stores out, with upsert / delete-by-id / clear / rebuild per index. Spark
is the single storage provider: a canonical ``documents`` table partitioned
by ``(index_name, dim)`` — the pgvector dual-table pattern
(src/wagtail_vector_index/storage/pgvector/models.py:65-88) collapses into
partition layout, and the dimension filter at query time
(pgvector/provider.py:112) becomes static partition pruning.

Write semantics on plain parquet (no Delta in this container):
- upsert  = append + last-write-wins on read (dedup by key, max batch_id),
  mirroring ``ignore_conflicts=True`` bulk inserts
  (pgvector/provider.py:65-75)
- delete/clear = partition-scoped anti-join rewrite
- rebuild = INSERT OVERWRITE of the index partition
  (pgvector/provider.py:61-63)

``spark.sql.sources.partitionOverwriteMode=dynamic`` keeps overwrites
scoped to the touched partitions — at 100 TB a rebuild of one index never
rewrites its neighbors.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DOCUMENT_COLUMNS = ("object_keys", "content", "vector", "metadata", "index_name")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-generated parquet table."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def read_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    return {n: read_table(spark, sf_dir, n) for n in names}


class DocumentStore:
    """Parquet-backed document store partitioned by (index_name, dim)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    def _exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            not f.startswith(("_", ".")) for f in os.listdir(self.path)
        )

    def read(self, index_name: str | None = None) -> DataFrame:
        return self.read_at(None, index_name)

    def read_at(
        self, batch_id: int | None, index_name: str | None = None
    ) -> DataFrame:
        """Snapshot read: the store as of generation ``batch_id``
        (inclusive); ``None`` reads the latest state.

        Append-only generations make time travel a filter, not a feature:
        later batches are simply invisible to the last-write-wins window,
        so a pipeline can pin the exact index state a model was trained
        against. List snapshot points with :meth:`generations`; note
        :meth:`compact`/:meth:`clear` rewrite history away.
        """
        if not self._exists():
            raise FileNotFoundError(f"document store at {self.path} is empty")
        df = self.spark.read.parquet(self.path)
        if index_name is not None:
            df = df.where(F.col("index_name") == index_name)
        if batch_id is not None:
            df = df.where(F.col("batch_id") <= int(batch_id))
        # last-write-wins over upsert generations, per chunk — keying on
        # doc_key alone would collapse multi-chunk documents to one row
        w = Window.partitionBy("doc_key", "chunk_no", "index_name").orderBy(
            F.col("batch_id").desc()
        )
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .where((F.col("__rn") == 1) & (~F.col("deleted")))
            .drop("__rn", "batch_id", "deleted")
        )

    def generations(self, index_name: str | None = None) -> DataFrame:
        """The store's snapshot points: one row per write generation —
        (batch_id, n_rows, n_tombstones). Pass a ``batch_id`` from here
        to :meth:`read_at`."""
        if not self._exists():
            raise FileNotFoundError(f"document store at {self.path} is empty")
        df = self.spark.read.parquet(self.path)
        if index_name is not None:
            df = df.where(F.col("index_name") == index_name)
        return (
            df.groupBy("batch_id")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("deleted").cast("long")).alias("n_tombstones"),
            )
            .orderBy("batch_id")
        )

    def _stamp(self, documents: DataFrame, deleted: bool = False) -> DataFrame:
        return documents.withColumn(
            "batch_id", F.lit(time.time_ns()).cast("long")
        ).withColumn("deleted", F.lit(deleted))

    def upsert(self, documents: DataFrame) -> None:
        """Append a new generation; conflicts resolve at read (S3-S5)."""
        (
            self._stamp(documents)
            .withColumn("dim", F.array_size("vector"))
            .write.mode("append")
            .partitionBy("index_name", "dim")
            .parquet(self.path)
        )

    def delete(self, index_name: str, doc_keys: list[str]) -> None:
        """Tombstone the given doc keys (S6) — append-only delete.

        For key sets too large for a driver-side list, use
        :meth:`delete_keys_df` — same tombstone mechanics, keys stay
        distributed."""
        existing = self.read(index_name).where(F.col("doc_key").isin(doc_keys))
        self._write_tombstones(existing)

    def delete_keys_df(self, index_name: str, keys_df: DataFrame) -> None:
        """Tombstone every key in ``keys_df`` (single column ``doc_key``)
        without materializing the key set on the driver — a semi join
        against the resolved store, broadcast when small."""
        existing = self.read(index_name).join(
            keys_df.select("doc_key"), "doc_key", "left_semi"
        )
        self._write_tombstones(existing)

    def _write_tombstones(self, existing: DataFrame) -> None:
        (
            self._stamp(existing, deleted=True)
            .withColumn("dim", F.array_size("vector"))
            .write.mode("append")
            .partitionBy("index_name", "dim")
            .parquet(self.path)
        )

    def _swap_rewrite(self, df: DataFrame) -> None:
        """Rewrite the whole store from ``df`` safely: write to a staging
        directory first, then atomically swap it into place.

        Never overwrite the path being read via a cache barrier — cached
        partitions can be evicted (memory pressure, executor loss) and
        Spark would recompute from the path mid-overwrite, corrupting the
        store. The staging write reads only from the intact original; the
        two renames are filesystem-atomic, so a crash leaves either the old
        or the new store, never a half-written one."""
        staging = f"{self.path}.staging-{time.time_ns()}"
        df.write.mode("overwrite").partitionBy("index_name", "dim").parquet(staging)
        trash = f"{self.path}.trash-{time.time_ns()}"
        os.rename(self.path, trash)
        os.rename(staging, self.path)
        shutil.rmtree(trash, ignore_errors=True)

    def clear(self, index_name: str) -> None:
        """Drop the whole index partition (S7)."""
        if not self._exists():
            return
        df = self.spark.read.parquet(self.path)
        self._swap_rewrite(df.where(F.col("index_name") != index_name))

    def compact(self, index_name: str) -> None:
        """Rewrite the index partition to its resolved state (one row per
        key, tombstones dropped). ``read`` pays a window shuffle per
        generation layer; at scale, compact after a burst of upserts so
        subsequent reads scan a single clean generation."""
        raw = self.spark.read.parquet(self.path)
        others = raw.where(F.col("index_name") != index_name)
        resolved = (
            self._stamp(self.read(index_name))
            .withColumn("dim", F.array_size("vector"))
            .select(*others.columns)
        )
        self._swap_rewrite(others.unionByName(resolved))

    def overwrite_index(self, index_name: str, documents: DataFrame) -> None:
        """Rebuild (S8): INSERT OVERWRITE the index's partitions only."""
        (
            self._stamp(documents)
            .withColumn("dim", F.array_size("vector"))
            .write.mode("overwrite")
            .partitionBy("index_name", "dim")
            .parquet(self.path)
        )
