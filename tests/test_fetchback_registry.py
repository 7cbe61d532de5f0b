"""Unit tests for the fetch-back join (Q6/Q7: group-by-label key join +
order-preserving dedup, reference django.py:201-240), the JSON source
(S10), and the index registry."""

import pytest
from pyspark.sql import functions as F

from wagtail_vector_index_spark.operators.fetchback import (
    dedup_keep_best,
    fetch_back,
)


@pytest.fixture()
def retrieval_results(spark):
    # multi-model retrieval hits: "<label>:<pk>" keys, best-first sims
    rows = [
        ("pages:1", 0.99),
        ("pages:2", 0.95),
        ("articles:7", 0.93),
        ("pages:1", 0.90),  # duplicate object, worse rank
        ("articles:9", 0.85),
        ("ghosts:3", 0.80),  # label with no source table -> dropped
    ]
    return spark.createDataFrame(rows, "object_key string, similarity double")


@pytest.fixture()
def source_tables(spark):
    pages = spark.createDataFrame(
        [(1, "Page One"), (2, "Page Two"), (3, "Page Three")], "pk long, title string"
    )
    articles = spark.createDataFrame(
        [(7, "Article Seven"), (9, "Article Nine")], "pk long, title string"
    )
    return {"pages": pages, "articles": articles}


def test_fetch_back_joins_per_label(retrieval_results, source_tables):
    out = fetch_back(retrieval_results, source_tables).collect()
    by_key = {r["object_key"]: r for r in out}
    assert set(by_key) == {"pages:1", "pages:2", "articles:7", "articles:9"}
    assert by_key["pages:1"]["title"] == "Page One"
    assert by_key["articles:7"]["title"] == "Article Seven"


def test_fetch_back_dedups_keeping_best(retrieval_results, source_tables):
    out = fetch_back(retrieval_results, source_tables).collect()
    dup = [r for r in out if r["object_key"] == "pages:1"]
    assert len(dup) == 1
    assert dup[0]["similarity"] == pytest.approx(0.99)


def test_fetch_back_requires_sources(retrieval_results):
    with pytest.raises(ValueError):
        fetch_back(retrieval_results, {})


def test_dedup_keep_best_ascending(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 5.0)], "object_key string, dist double"
    )
    out = dedup_keep_best(df, key_col="object_key", rank_col="dist", ascending=True)
    vals = {r["object_key"]: r["dist"] for r in out.collect()}
    assert vals == {"a": 1.0, "b": 5.0}


def test_json_source_roundtrip(spark, tmp_path):
    """S10: JSON source import (reference import_sources command)."""
    path = str(tmp_path / "sources.json")
    with open(path, "w") as f:
        f.write('{"source": "s1", "content": "hello world"}\n')
        f.write('{"source": "s2", "content": "goodbye world"}\n')
    df = spark.read.json(path)
    assert df.count() == 2
    assert set(df.columns) == {"source", "content"}


def test_orc_source_roundtrip(spark, tmp_path, documents_df):
    """S10 extension: ORC import/export — Spark-native columnar format
    beyond parquet/JSON/CSV, same reader surface."""
    path = str(tmp_path / "docs_orc")
    documents_df.limit(25).select("doc_id", "source", "text").write.orc(path)
    back = spark.read.orc(path)
    assert back.count() == 25
    assert set(back.columns) == {"doc_id", "source", "text"}
    orig = {r["doc_id"] for r in documents_df.limit(25).collect()}
    assert {r["doc_id"] for r in back.collect()} == orig


def test_registry_roundtrip(spark, tmp_path, documents_df):
    from wagtail_vector_index_spark.config import IndexConfig
    from wagtail_vector_index_spark.index import VectorIndex
    from wagtail_vector_index_spark.registry import (
        all_indexes,
        get_index,
        register_index,
    )
    from wagtail_vector_index_spark.sources.tables import DocumentStore

    store = DocumentStore(spark, str(tmp_path / "reg_store"))
    idx = VectorIndex(spark, IndexConfig(index_name="reg_test"), store)
    register_index(idx)
    assert get_index("reg_test") is idx
    assert "reg_test" in all_indexes()


def test_csv_source_roundtrip(spark, tmp_path):
    """CSV source (SURVEY §2.4 scans EXT): header + schema inference."""
    path = str(tmp_path / "src_csv")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.select("doc_id", "lang", "source").write.option("header", True).csv(path)
    back = spark.read.option("header", True).option("inferSchema", True).csv(path)
    assert back.count() == docs.count()
    assert set(back.columns) == {"doc_id", "lang", "source"}
    assert dict(back.dtypes)["doc_id"] == "int"  # inferred numeric


def test_approx_count_distinct_within_tolerance(spark):
    """approx_count_distinct (HLL) must land within its rsd of exact —
    the sketch path for cardinalities too large to count exactly."""
    from pyspark.sql import functions as F

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    row = orders.agg(
        F.countDistinct("o_custkey").alias("exact"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
    ).first()
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.1


def test_metadata_map_column_roundtrip(spark, tmp_path):
    """Document metadata is map<string,string> (reference JSONField dict,
    models.py:40): store it, read it, filter on a key."""
    from pyspark.sql import functions as F

    from wagtail_vector_index_spark.sources.tables import DocumentStore

    docs = spark.createDataFrame(
        [
            ("k1", ["k1"], 0, "text a", [0.1, 0.2], {"lang": "en", "tier": "hi"}, "m"),
            ("k2", ["k2"], 0, "text b", [0.3, 0.4], {"lang": "de"}, "m"),
        ],
        "doc_key string, object_keys array<string>, chunk_no int, content string, "
        "vector array<double>, metadata map<string,string>, index_name string",
    )
    store = DocumentStore(spark, str(tmp_path / "meta_store"))
    store.upsert(docs)
    back = store.read("m")
    en = back.where(F.col("metadata")["lang"] == "en").collect()
    assert len(en) == 1 and en[0]["doc_key"] == "k1"
    assert en[0]["metadata"]["tier"] == "hi"
    keys = back.select(F.explode(F.map_keys("metadata")).alias("k"))
    assert {r["k"] for r in keys.collect()} == {"lang", "tier"}
