"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship end-to-end semantic-search pipeline
(chunk -> hash-embed -> cosine top-k -> fetch-back) on sf0.001.
``queries()`` / ``oracle_sql()`` expose the full catalog from
wagtail_vector_index_spark.queries — one entry per implemented operator
from SURVEY.md §2 plus the north-star EXT operators, each with a DuckDB
oracle computing identical values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from wagtail_vector_index_spark.queries import QUERY_FNS

    return QUERY_FNS["search_hash_knn"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from wagtail_vector_index_spark.queries import QUERY_FNS

    return dict(QUERY_FNS)


def oracle_sql() -> dict[str, str]:
    from wagtail_vector_index_spark.queries import ORACLE

    return dict(ORACLE)
