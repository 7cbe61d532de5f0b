"""Aggregated query catalog.

Importing this module registers every declared query + oracle into
``catalog.QUERY_FNS`` / ``catalog.ORACLE``. The driver consumes these via
__spark_entry__.py's ``queries()`` / ``oracle_sql()``.
"""

from __future__ import annotations

import wagtail_vector_index_spark.queries_tpch_ext  # noqa: F401  (newest first: driver samples from the head)
import wagtail_vector_index_spark.queries_relational  # noqa: F401
import wagtail_vector_index_spark.queries_text  # noqa: F401
import wagtail_vector_index_spark.queries_vector  # noqa: F401
from wagtail_vector_index_spark.catalog import ORACLE, QUERY_FNS

__all__ = ["ORACLE", "QUERY_FNS"]
