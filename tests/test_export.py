"""Sharded JSONL export: deterministic membership, bounded files,
distributed manifest."""

from pyspark.sql import functions as F

from wagtail_vector_index_spark.operators.export import (
    SHARD_COL,
    export_jsonl_shards,
    shard_manifest,
    with_shard,
)


def test_export_roundtrip_and_file_caps(spark, documents_df, tmp_path):
    docs = documents_df.select("doc_id", "source", "text").limit(200)
    out = str(tmp_path / "corpus")
    export_jsonl_shards(
        docs, out, key_col="doc_id", num_shards=4, max_records_per_file=20
    )
    back = spark.read.json(out)
    assert back.count() == 200
    # every record text survives the roundtrip
    orig = {r["doc_id"] for r in docs.select("doc_id").collect()}
    got = {r["doc_id"] for r in back.select("doc_id").collect()}
    assert got == orig

    man = shard_manifest(spark, out)
    rows = man.collect()
    assert sum(r["records"] for r in rows) == 200
    assert all(r["records"] <= 20 for r in rows)
    assert {r[SHARD_COL] for r in rows} <= set(range(4))


def test_shard_assignment_is_content_addressed(spark, documents_df):
    """Same key -> same shard regardless of upstream partitioning."""
    docs = documents_df.select("doc_id").limit(100)
    a = with_shard(docs, F.col("doc_id"), num_shards=8)
    b = with_shard(docs.repartition(13), F.col("doc_id"), num_shards=8)
    am = {r["doc_id"]: r[SHARD_COL] for r in a.collect()}
    bm = {r["doc_id"]: r[SHARD_COL] for r in b.collect()}
    assert am == bm
    assert len(set(am.values())) > 1  # actually spreads


def test_export_rerun_is_stable(spark, documents_df, tmp_path):
    docs = documents_df.select("doc_id", "text").limit(120)
    p1, p2 = str(tmp_path / "one"), str(tmp_path / "two")
    export_jsonl_shards(docs, p1, num_shards=4, max_records_per_file=50)
    export_jsonl_shards(docs, p2, num_shards=4, max_records_per_file=50)
    m1 = {
        (r["doc_id"], r[SHARD_COL])
        for r in spark.read.json(p1).select("doc_id", SHARD_COL).collect()
    }
    m2 = {
        (r["doc_id"], r[SHARD_COL])
        for r in spark.read.json(p2).select("doc_id", SHARD_COL).collect()
    }
    assert m1 == m2
