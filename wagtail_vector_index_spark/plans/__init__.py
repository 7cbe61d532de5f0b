from wagtail_vector_index_spark.plans.indexing import (
    build_documents,
    incremental_build_documents,
)

__all__ = ["build_documents", "incremental_build_documents"]
