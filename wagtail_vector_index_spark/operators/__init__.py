from wagtail_vector_index_spark.operators import dedup, fetchback, knn

__all__ = ["dedup", "fetchback", "knn"]
