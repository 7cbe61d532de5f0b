from wagtail_vector_index_spark.functions import text_analysis, text_splitting, vector

__all__ = ["text_analysis", "text_splitting", "vector"]
