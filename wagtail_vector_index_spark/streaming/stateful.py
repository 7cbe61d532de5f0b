"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no streaming at all; at 100 TB/day ingest, exact
cross-batch dedup is the canonical stateful need: a document seen in any
earlier micro-batch must not re-enter the index. State = the set of seen
content fingerprints per key-group, kept in the state store (RocksDB on a
real cluster), with optional TTL via timeout timestamps.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T


def streaming_dedup(
    stream: DataFrame,
    *,
    key_col: str = "fingerprint",
    id_col: str = "doc_id",
) -> DataFrame:
    """Emit only first-seen rows per fingerprint across micro-batches.

    Grouped by fingerprint; state is a single boolean "seen". Output rows
    carry (fingerprint, doc_id) of the first arrival only. Grouping by the
    fingerprint itself keeps state per group tiny and the shuffle key
    uniform — the same skew-free property as the LSH band keys.
    """
    from wagtail_vector_index_spark._workerenv import ensure_worker_imports

    ensure_worker_imports(stream)

    out_schema = T.StructType(
        [
            T.StructField(key_col, T.StringType()),
            T.StructField(id_col, T.LongType()),
        ]
    )
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])

    def _dedup(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        first_id = None
        for pdf in pdfs:
            if len(pdf):
                cand = int(pdf[id_col].min())
                first_id = cand if first_id is None else min(first_id, cand)
        if first_id is None:
            return
        state.update((True,))
        yield pd.DataFrame({key_col: [key[0]], id_col: [first_id]})

    return stream.groupBy(key_col).applyInPandasWithState(
        _dedup,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
