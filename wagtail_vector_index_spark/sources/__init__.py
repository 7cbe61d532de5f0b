from wagtail_vector_index_spark.sources.tables import DocumentStore, read_table

__all__ = ["DocumentStore", "read_table"]
