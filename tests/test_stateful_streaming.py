"""applyInPandasWithState: cross-batch streaming dedup (state persists in
the checkpoint's state store between runs)."""

import pytest
from pyspark.sql import functions as F

from wagtail_vector_index_spark.functions.text_analysis import fingerprint_col
from wagtail_vector_index_spark.streaming.stateful import streaming_dedup


def test_streaming_dedup_across_batches(spark, tmp_path, documents_df):
    src = str(tmp_path / "dedup_src")
    out = str(tmp_path / "dedup_out")
    ckpt = str(tmp_path / "ckpt")
    schema = documents_df.schema

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .parquet(src)
            .select(
                fingerprint_col(F.col("text")).alias("fingerprint"),
                F.col("doc_id"),
            )
        )
        q = (
            streaming_dedup(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return spark.read.parquet(out)

    # batch 1: docs 0..19
    documents_df.where(F.col("doc_id") < 20).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    first = run_once().collect()
    assert len(first) == 20

    # batch 2 repeats batch 1's content (same fingerprints) + 20 new docs;
    # the state store must pass only the genuinely-new ones
    documents_df.where(F.col("doc_id") < 40).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    all_out = run_once().collect()
    assert len(all_out) == 40
    new_ids = sorted(r["doc_id"] for r in all_out)
    assert new_ids == list(range(40))
